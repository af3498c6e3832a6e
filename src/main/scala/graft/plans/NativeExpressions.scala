package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths (SURVEY §2c): tight
  * primitive loops in whole-stage codegen instead of `zip_with`/`aggregate`
  * expression trees. Same math, ~10× less per-row overhead — this is the
  * difference between a pairwise scorer that survives 100 TB and one that
  * doesn't.
  */

/** Cosine similarity over two `array<float>` columns, accumulated in double
  * in element order — bit-identical to the `zip_with`+`aggregate`
  * formulation in [[graft.functions.VecFns.cosine]] (so oracle-checked
  * results are unchanged), but a single primitive loop.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullable: Boolean = true

  // zero-norm (or empty) vectors have no defined cosine: return NULL, which
  // matches SQL division semantics in oracle engines (0/0 → NULL) — a NaN
  // would compare greater than everything in Spark and pollute top-k results.
  // Length-mismatched arrays also return NULL (corrupt/ragged embedding data
  // must surface, not silently score as the truncated prefix) — same result
  // as the zip_with formulation, whose null padding nulls the aggregate.
  // A NULL ELEMENT nulls the result too (the zip_with twin's product is
  // null, nulling the aggregate) — reading it as 0.0 would silently score.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double xi = (double) $a.getFloat($i);
         |    double yi = (double) $b.getFloat($i);
         |    $dot += xi * yi; $nx += xi * xi; $ny += yi * yi;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($nx == 0.0 || $ny == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** MinHash signature over an `array<string>` shingle set in ONE pass:
  * two base XXH64 hashes per element, per-permutation hashes derived as
  * h1 + p*h2 (Kirsch–Mitzenmacher double hashing) — vs. numPerms full
  * array traversals in the composed formulation.
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  // a non-positive perm count would surface as a per-row
  // NegativeArraySizeException at execution time
  require(numPerms >= 1, s"graft_minhash needs numPerms >= 1, got $numPerms")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  // NULL for an empty shingle set: the all-MaxValue sentinel signature would
  // otherwise make every empty/too-short document a perfect near-duplicate
  // of every other — an O(n²) false clique from SQL callers that don't
  // pre-filter (Dedup.minhashLshPairs filters size > 0, but graft_minhash
  // is registered for arbitrary SQL use)
  override def nullable: Boolean = true

  // a NULL ELEMENT nulls the whole signature: hashing it would NPE, and
  // skipping it would silently sign a different shingle set than the
  // caller passed — surface the corrupt input instead
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) return null
      val s = arr.getUTF8String(i)
      val h1 = XXH64.hashUTF8String(s, 42L)
      val h2 = XXH64.hashUTF8String(s, 77L)
      var p = 0
      while (p < numPerms) {
        val h = h1 + p * h2
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numPerms];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    org.apache.spark.unsafe.types.UTF8String s = $a.getUTF8String($i);
         |    long h1 = $xxh.hashUTF8String(s, 42L);
         |    long h2 = $xxh.hashUTF8String(s, 77L);
         |    for (int $p = 0; $p < $numPerms; $p++) {
         |      long h = h1 + $p * h2;
         |      if (h < $mins[$p]) $mins[$p] = h;
         |    }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over an `array<string>` token multiset in one pass with a
  * local counter array (vs. a 64-wide `zip_with` per token).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"
  // a NULL element nulls the signature (hashing it would NPE; skipping it
  // would silently sign a different token multiset)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) return null
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val sim = ctx.freshName("sim")
      val xxh = classOf[XXH64].getName
      s"""
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long h = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if (((h >>> $b) & 1L) == 1L) $cnt[$b]++; else $cnt[$b]--;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $sim = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($cnt[$b] > 0) $sim |= (1L << $b);
         |  }
         |  ${ev.value} = $sim;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane LSH bucket key over an `array<float>` embedding:
  * bit p of the result is the sign of the dot product with pseudo-random
  * plane p (components hash-derived in [-0.5, 0.5), salted by `seed` so
  * multiple tables probe independent planes). One codegen'd pass.
  */
case class LshBucketKey(child: Expression, numPlanes: Int, seed: Long)
    extends UnaryExpression {

  // planes map to bits of one long; numPlanes > 64 would wrap `1L << p`
  // mod 64 and silently alias planes (bucket keys lose discriminating power).
  // numPlanes = 0 is the knob's exhaustive endpoint: every vector keys to
  // bucket 0, so LSH probing degenerates to brute force — the provably-exact
  // configuration q69_ann_lsh_exact runs under the driver oracle.
  require(numPlanes >= 0 && numPlanes <= 64,
    s"graft_lsh_key supports 0..64 planes, got $numPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_key expects array<float>, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_lsh_key"
  // a NULL element nulls the key (reading it as 0.0 would silently bucket
  // a corrupt vector as if the component were zero)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var i0 = 0
    while (i0 < v.numElements()) {
      if (v.isNullAt(i0)) return null
      i0 += 1
    }
    var key = 0L
    var p = 0
    while (p < numPlanes) {
      var proj = 0.0
      var i = 0
      while (i < v.numElements()) {
        val h = XXH64.hashLong(i.toLong * 1315423911L + p, seed)
        val comp = (java.lang.Math.floorMod(h, 1000000L).toDouble / 1000000.0) - 0.5
        proj += v.getFloat(i).toDouble * comp
        i += 1
      }
      if (proj >= 0) key |= (1L << p)
      p += 1
    }
    key
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val key = ctx.freshName("key")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val i0 = ctx.freshName("i0")
      val proj = ctx.freshName("proj")
      val xxh = classOf[XXH64].getName
      s"""
         |for (int $i0 = 0; $i0 < $a.numElements(); $i0++) {
         |  if ($a.isNullAt($i0)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  long $key = 0L;
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    double $proj = 0.0;
         |    for (int $i = 0; $i < $a.numElements(); $i++) {
         |      long h = $xxh.hashLong(((long) $i) * 1315423911L + $p, ${seed}L);
         |      double comp = (((double) java.lang.Math.floorMod(h, 1000000L)) / 1000000.0) - 0.5;
         |      $proj += ((double) $a.getFloat($i)) * comp;
         |    }
         |    if ($proj >= 0) $key |= (1L << $p);
         |  }
         |  ${ev.value} = $key;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 0-based index of the best-scoring candidate for `left` (an `array<float>`
  * vector) among `right` (an `array<array<float>>` of candidates), in ONE
  * codegen'd pass. This is the map-side argmax that lets nearest-centroid
  * assignment (IVF cells, PQ codes) run as a pure projection over a
  * broadcast codebook row — the composed formulation (explode × candidates →
  * `max_by` groupBy) expands the corpus `numCandidates`× and re-shuffles it,
  * incl. the full vector payload, once per assignment.
  *
  * Metrics: `cosine` (max cosine similarity) and `dot_adj`
  * (max of dot(x,c) − |c|²/2, which is argmin squared-L2 — the k-means /
  * PQ-encode scoring). Parity contract with the `max_by` formulations this
  * replaces (spec-asserted via IVF probe-all / PQ uncapped == brute force):
  *  - ties → LOWEST index (callers order candidates by cell_id/code, matching
  *    max_by's `(score, -id)` ordering);
  *  - a candidate is SKIPPED when its score is undefined — length mismatch
  *    (zip_with's null padding nulls the composed score) or, for cosine,
  *    zero-norm on either side;
  *  - no candidate scores (or the candidate array is empty) → NULL;
  *  - score comparison via Double.compare, matching Spark's double ordering
  *    (NaN greatest) in max_by.
  */
case class NearestIndex(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {

  require(metric == "cosine" || metric == "dot_adj",
    s"graft_nearest metric must be 'cosine' or 'dot_adj', got '$metric'")
  private def isCosine: Boolean = metric == "cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_nearest expects (array<float>, array<array<float>>), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // a NULL element in the QUERY vector makes every score undefined
    // (the composed max_by's products are null) — NULL result, not a
    // silent 0.0 read
    var i0 = 0
    while (i0 < n) {
      if (x.isNullAt(i0)) return null
      i0 += 1
    }
    var best = -1
    var bestScore = 0.0
    var j = 0
    while (j < cs.numElements()) {
      if (!cs.isNullAt(j)) {
        val c = cs.getArray(j)
        if (c.numElements() == n) {
          var dot = 0.0; var nx = 0.0; var nc = 0.0
          var nullElem = false
          var i = 0
          while (i < n && !nullElem) {
            if (c.isNullAt(i)) nullElem = true
            else {
              val xi = x.getFloat(i).toDouble
              val ci = c.getFloat(i).toDouble
              dot += xi * ci; nx += xi * xi; nc += ci * ci
            }
            i += 1
          }
          // a candidate with a NULL element has an undefined score:
          // SKIPPED, like the length-mismatch case (max_by ignores nulls)
          if (!nullElem && (!isCosine || (nx != 0.0 && nc != 0.0))) {
            val s =
              if (isCosine) dot / (math.sqrt(nx) * math.sqrt(nc))
              else dot - nc / 2
            if (best < 0 || java.lang.Double.compare(s, bestScore) > 0) {
              best = j; bestScore = s
            }
          }
        }
      }
      j += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val nc = ctx.freshName("nc")
      val s = ctx.freshName("s")
      val i0 = ctx.freshName("i0")
      val nullElem = ctx.freshName("nullElem")
      val scoreOk =
        if (isCosine) s"!$nullElem && $nx != 0.0 && $nc != 0.0" else s"!$nullElem"
      val score =
        if (isCosine) s"$dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($nc))"
        else s"$dot - $nc / 2"
      s"""
         |int $n = $a.numElements();
         |for (int $i0 = 0; $i0 < $n; $i0++) {
         |  if ($a.isNullAt($i0)) { ${ev.isNull} = true; break; }
         |}
         |int $best = -1;
         |double $bestScore = 0.0;
         |if (!${ev.isNull}) {
         |  for (int $j = 0; $j < $b.numElements(); $j++) {
         |    if (!$b.isNullAt($j)) {
         |      org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($j);
         |      if ($c.numElements() == $n) {
         |        double $dot = 0.0, $nx = 0.0, $nc = 0.0;
         |        boolean $nullElem = false;
         |        for (int $i = 0; $i < $n && !$nullElem; $i++) {
         |          if ($c.isNullAt($i)) { $nullElem = true; }
         |          else {
         |            double xi = (double) $a.getFloat($i);
         |            double ci = (double) $c.getFloat($i);
         |            $dot += xi * ci; $nx += xi * xi; $nc += ci * ci;
         |          }
         |        }
         |        if ($scoreOk) {
         |          double $s = $score;
         |          if ($best < 0 || java.lang.Double.compare($s, $bestScore) > 0) {
         |            $best = $j; $bestScore = $s;
         |          }
         |        }
         |      }
         |    }
         |  }
         |}
         |if ($best < 0) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ approximate score Σ_s lut[s][codes[s]] over (`array<int>` codes,
  * `array<array<double>>` lut) in ONE codegen'd pass — the per-row scoring
  * loop of a product-quantization code scan, i.e. the hottest corpus-sized
  * expression in the PQ search path. The composed formulation
  * (`aggregate(sequence(...), acc + element_at(element_at(lut, s+1),
  * codes[s]+1))`) is a higher-order function, which Spark evaluates
  * interpreted per row per subspace.
  *
  * Parity with that formulation: any NULL slot (missing code, missing
  * sub-LUT) nulls the whole sum; an out-of-range code yields NULL rather
  * than an error (by construction codes index the LUT that was built from
  * the same codebook, so this is defensive only).
  */
case class PqApproxScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_score expects (array<int>, array<array<double>>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_score"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    var sum = 0.0
    var s = 0
    val n = codes.numElements()
    while (s < n) {
      if (s >= lut.numElements() || codes.isNullAt(s) || lut.isNullAt(s)) return null
      val lutS = lut.getArray(s)
      val code = codes.getInt(s)
      if (code < 0 || code >= lutS.numElements() || lutS.isNullAt(code)) return null
      sum += lutS.getDouble(code)
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val lutS = ctx.freshName("lutS")
      val code = ctx.freshName("code")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |boolean $bad = false;
         |for (int $s = 0; $s < $n && !$bad; $s++) {
         |  if ($s >= $b.numElements() || $a.isNullAt($s) || $b.isNullAt($s)) {
         |    $bad = true;
         |  } else {
         |    org.apache.spark.sql.catalyst.util.ArrayData $lutS = $b.getArray($s);
         |    int $code = $a.getInt($s);
         |    if ($code < 0 || $code >= $lutS.numElements() || $lutS.isNullAt($code)) {
         |      $bad = true;
         |    } else {
         |      $sum += $lutS.getDouble($code);
         |    }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Rolling polynomial fingerprint fp = fold(acc·31 + codepoint) mod 1e9+7
  * over a string's Unicode codepoints, in ONE pass over the UTF-8 bytes.
  * Matches the composed `aggregate(split(text, ''), ...)` formulation
  * bit-for-bit (spec-asserted: `ascii()` yields the full codepoint,
  * surrogate pairs included, and the empty string folds to 0) — without
  * materializing a one-string-per-character array and evaluating an
  * interpreted lambda per character on the corpus-sized linear pass.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0) { len = 2; cp = b0 & 0x1F }
      else if ((b0 & 0xF0) == 0xE0) { len = 3; cp = b0 & 0x0F }
      else { len = 4; cp = b0 & 0x07 }
      var j = 1
      while (j < len && i + j < bytes.length) {
        cp = (cp << 6) | (bytes(i + j) & 0x3F)
        j += 1
      }
      acc = (acc * 31 + cp) % 1000000007L
      i += len
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b0 = ctx.freshName("b0")
      val cp = ctx.freshName("cp")
      val len = ctx.freshName("len")
      s"""
         |byte[] $bytes = $a.getBytes();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $bytes.length) {
         |  int $b0 = $bytes[$i] & 0xFF;
         |  int $cp; int $len;
         |  if ($b0 < 0x80) { $cp = $b0; $len = 1; }
         |  else if (($b0 & 0xE0) == 0xC0) { $cp = $b0 & 0x1F; $len = 2; }
         |  else if (($b0 & 0xF0) == 0xE0) { $cp = $b0 & 0x0F; $len = 3; }
         |  else { $cp = $b0 & 0x07; $len = 4; }
         |  for (int $j = 1; $j < $len && $i + $j < $bytes.length; $j++) {
         |    $cp = ($cp << 6) | ($bytes[$i + $j] & 0x3F);
         |  }
         |  $acc = ($acc * 31 + $cp) % 1000000007L;
         |  $i += $len;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature fused from raw text: tokenize + shingle + hash in one
  * pass over the document bytes ([[ShingleOps.minhash]]) instead of
  * materializing an `array<string>` of shingles first. Bit-identical to
  * `MinHashSignature(TextFns.shingles(text, n), numPerms)` — shingle
  * strings ARE contiguous byte ranges of the trimmed text, and min over
  * the shingle multiset equals min over the distinct set — but with zero
  * per-shingle allocation, and no interpreted higher-order functions
  * (`slice`/`zip_with`/`array_distinct` all break whole-stage codegen).
  * NULL below n tokens, matching the composed path's empty-shingle NULL.
  */
case class ShingleMinHash(child: Expression, shingleN: Int, numPerms: Int)
    extends UnaryExpression {

  require(shingleN >= 1, s"graft_minhash_text needs shingleN >= 1, got $shingleN")
  require(numPerms >= 1, s"graft_minhash_text needs numPerms >= 1, got $numPerms")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_text expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_text"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val sig = ShingleOps.minhash(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], shingleN, numPerms)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val sig = ctx.freshName("sig")
      val ops = ShingleOps.getClass.getName.stripSuffix("$") // Java-callable: ShingleOps.MODULE$
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $sig = $ops.minhash($t, $shingleN, $numPerms);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new $gad($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word-shingle hashes fused from raw text ([[ShingleOps
  * .distinctHashes]]): the per-document inverted-index keys that the
  * jaccard family explodes, produced in one pass with no shingle-string
  * allocation. Bit-identical to `xxhash64(shingle)` over
  * `array_distinct(TextFns.shingles(text, n))` in first-occurrence order.
  * Empty array below n tokens (callers explode, so empty = no rows).
  */
case class ShingleHashes(child: Expression, shingleN: Int)
    extends UnaryExpression {

  require(shingleN >= 1, s"graft_shingle_hashes needs shingleN >= 1, got $shingleN")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleOps.distinctHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], shingleN))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ops = ShingleOps.getClass.getName.stripSuffix("$")
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($ops.distinctHashes($t, $shingleN));"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct character n-gram hashes fused from raw text
  * ([[ShingleOps.charGramHashes]]): the exact-substring duplication unit —
  * codepoint-indexed so each gram is `substr(text, i, n)` under
  * character-counting engines, hashed in place from the UTF-8 bytes.
  * Empty array below n codepoints.
  */
case class CharGramHashes(child: Expression, gramN: Int)
    extends UnaryExpression {

  require(gramN >= 1, s"graft_chargram_hashes needs gramN >= 1, got $gramN")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_chargram_hashes expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_chargram_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleOps.charGramHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], gramN))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ops = ShingleOps.getClass.getName.stripSuffix("$")
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($ops.charGramHashes($t, $gramN));"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Position-ordered character n-gram hashes
  * ([[ShingleOps.charGramHashSeq]]): element i = hash of the gram starting
  * at codepoint i, one entry PER INSTANCE (no dedup) — `posexplode`
  * recovers (start, hash) pairs for duplicated-span interval merging.
  * Hash-compatible with [[CharGramHashes]] (same walk, same seed). Empty
  * array below n codepoints.
  */
case class CharGramHashSeq(child: Expression, gramN: Int)
    extends UnaryExpression {

  require(gramN >= 1, s"graft_chargram_hash_seq needs gramN >= 1, got $gramN")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_chargram_hash_seq expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_chargram_hash_seq"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleOps.charGramHashSeq(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], gramN))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ops = ShingleOps.getClass.getName.stripSuffix("$")
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($ops.charGramHashSeq($t, $gramN));"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-script codepoint counts ([[ShingleOps.scriptCounts]]): a 9-long
  * array (latin, cyrillic, greek, arabic, hebrew, cjk, hangul, digit,
  * space) from ONE UTF-8 walk — the pre-langid script gate. The range
  * table is fixed and engine-portable (no JDK Unicode-version dependence);
  * "other" = `length(text) − sum` by the shared-walk contract.
  */
case class ScriptCounts(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_script_counts expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_script_counts"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleOps.scriptCounts(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ops = ShingleOps.getClass.getName.stripSuffix("$")
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($ops.scriptCounts($t));"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All unordered pairs (a(i), a(j)), i < j, of an `array<long>` as an
  * `array<struct<doc_a, doc_b>>` — the intra-bucket candidate expansion of
  * blocked dedup (safe ONLY under a bucket-size cap; the caller bounds
  * |a|). One allocation and a primitive double loop vs the composed
  * nested-`transform` + `flatten` formulation, which is interpreted (no
  * codegen for higher-order functions) and re-evaluates a `slice` per
  * element. Order matches the composed form: for each i ascending, all j >
  * i ascending — so results are drop-in identical.
  */
case class PairCombos(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull must be false: eval reads elements with getLong, which
    // would silently turn a null element into 0 and fabricate pair ids.
    // Callers build the array with sort_array(collect_list(...)), which is
    // containsNull=false by construction.
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pair_combos expects array<bigint> with non-null elements, got $t")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pair_combos"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    // n*(n-1)/2 wraps Int at n >= 65537 — fail with the actionable message,
    // not a NegativeArraySizeException from the wrapped allocation (callers
    // reach this only by setting a bucket cap above 65536)
    require(n <= 65536,
      s"graft_pair_combos: bucket of $n ids would expand to ${n.toLong * (n - 1) / 2} " +
        "pairs — cap the blocking key (maxDocFreq / maxBucketSize <= 65536) first")
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(x, a.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  // no doGenCode: the row-building loop gains nothing from inlining (it
  // allocates per pair either way); eval is the loop. CodegenFallback keeps
  // the surrounding stage in codegen.
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fraction of equal positions between two `array<long>` MinHash signatures
  * — the unbiased Jaccard estimate — as one primitive loop. The composed
  * `zip_with`+`aggregate` twin (HashFns.signatureAgreement) is interpreted
  * per candidate pair; this runs inside whole-stage codegen, which matters
  * because candidate-pair volume, not corpus size, dominates LSH cost at
  * scale. NULL on length mismatch (signatures from different numPerms are
  * incomparable — surface it, don't score the prefix).
  */
case class SignatureAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sig_agree expects (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sig_agree"
  override def nullable: Boolean = true

  // a NULL slot in either signature nulls the estimate (reading it as 0
  // would fabricate agreement between corrupt signatures)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    var eq = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $eq = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = ((double) $eq) / $n;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API front door for the native expressions. */
/** Fused char-bigram LM document score ([[ShingleOps.charLmScore]]): the
  * trained model rides INSIDE the expression as two parallel primitive
  * arrays (sorted bigram-hash keys + per-mille weights — the
  * broadcast-a-sketch pattern at expression grain; the model is
  * ≤ |charset|² entries by construction), so scoring is one codegen'd
  * walk per document instead of a per-position explode + broadcast join +
  * re-aggregation. Returns `array<long>` [matched_bigrams, permille_sum];
  * [[graft.operators.Scoring.scoreCharBigramLmFused]] proves bit-parity
  * with the composed pipeline (spec). Not SQL-registered: the model
  * arrays come from a collected DataFrame, not SQL literals.
  */
case class CharLmScore(child: Expression, sortedKeys: Array[Long],
                       permille: Array[Int])
    extends UnaryExpression {

  require(sortedKeys.length == permille.length,
    "charLmScore needs parallel key/weight arrays")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_charlm_score expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_charlm_score"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleOps.charLmScore(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      sortedKeys, permille))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("lmKeys", sortedKeys, "long[]")
    val pRef = ctx.addReferenceObj("lmPermille", permille, "int[]")
    nullSafeCodeGen(ctx, ev, t => {
      val ops = ShingleOps.getClass.getName.stripSuffix("$")
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($ops.charLmScore($t, $keysRef, $pRef));"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-document adjacent-codepoint bigram counts fused from raw text
  * ([[ShingleOps.charBigramCounts]]): `array<struct<bg, cnt>>`, one entry
  * per DISTINCT bigram with the within-document multiplicity already
  * folded — the char-LM TRAINING unit. The composed formulation explodes
  * one row per character position; this drops the Generate fan-out to the
  * per-doc bigram vocabulary and allocates one string per distinct bigram
  * instead of per position. Within-doc counting is exact (byte-compare on
  * hash hit); emitted strings are byte-identical to `substr(text, i, 2)`,
  * so the corpus-wide group-by is unchanged.
  */
case class CharBigramCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_bigram_counts expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bg", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_char_bigram_counts"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.charBigramCountsData(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ops = ShingleOps.getClass.getName.stripSuffix("$")
      s"${ev.value} = $ops.charBigramCountsData($t);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused hashed-linear (fastText-shape) document score
  * ([[ShingleOps.hashedLinearScore]]): the ≤ numBuckets-entry model rides
  * in the expression as a DENSE weight array (−1 = bucket absent → the
  * inner-join semantics: such tokens count nothing), and the whole
  * tokenize → fingerprint → bucket → join → per-doc aggregate pipeline
  * collapses to one walk per document. Returns `array<long>`
  * [matched_tokens, weight_sum]; bit-parity with the composed
  * [[graft.operators.Scoring.scoreHashedLinear]] is spec-asserted
  * (incl. empty-token and all-space-document hashing to bucket 0).
  * Not SQL-registered: the weight array comes from a collected model.
  */
case class HashedLinearScore(child: Expression, weights: Array[Int])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_linear_score expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hashed_linear_score"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleOps.hashedLinearScore(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], weights))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hlWeights", weights, "int[]")
    nullSafeCodeGen(ctx, ev, t => {
      val ops = ShingleOps.getClass.getName.stripSuffix("$")
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($ops.hashedLinearScore($t, $wRef));"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused blocklist scan ([[ShingleOps.blocklistHits]]): the ≤-blocklist-size
  * model (parallel hash/word arrays, hash-sorted) rides in the expression —
  * the broadcast-a-sketch pattern at expression grain — and the whole
  * tokenize → hash → membership-confirm → per-doc aggregate pipeline
  * collapses to one walk per document. Returns `array<long>`
  * [n_tokens, n_hits, n_terms]; matches are byte-confirmed, so the counts
  * are exact (no hash-collision class). Bit-parity with the composed
  * explode + array_contains formulation is spec-asserted. Not
  * SQL-registered: the word arrays come from a driver-side blocklist.
  */
case class BlocklistHits(child: Expression, sortedHashes: Array[Long],
                         words: Array[UTF8String])
    extends UnaryExpression {

  require(sortedHashes.length == words.length,
    "blocklistHits needs parallel hash/word arrays")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_blocklist_hits expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_blocklist_hits"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleOps.blocklistHits(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      sortedHashes, words))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hRef = ctx.addReferenceObj("blHashes", sortedHashes, "long[]")
    val wRef = ctx.addReferenceObj("blWords", words,
      classOf[UTF8String].getName + "[]")
    nullSafeCodeGen(ctx, ev, t => {
      val ops = ShingleOps.getClass.getName.stripSuffix("$")
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($ops.blocklistHits($t, $hRef, $wRef));"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Banded threshold edit distance over pre-decoded codepoint arrays
  * ([[ShingleOps.editDistance]]): `levenshtein(l, r, threshold)` semantics
  * (the distance, or -1 above `maxDist`; codepoint edit units — identical
  * results on valid UTF-8, property-spec'd), but O(len·maxDist) with O(1)
  * cell access where the builtin re-seeks the UTF-8 byte stream per DP
  * cell (measured ~100× on ~300-char near-dup confirms, SURVEY §5). The
  * fuzzy-dedup confirm stage's hot loop.
  */
case class EditDistance(left: Expression, right: Expression, maxDist: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_edit_distance expects (string, string), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_edit_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleOps.editDistance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ops = ShingleOps.getClass.getName.stripSuffix("$")
      s"${ev.value} = $ops.editDistance($a, $b, $maxDist);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Duplicated-span coverage ([[ShingleOps.coveredSpanLength]]): merged
  * codepoint length of the duplicated-gram intervals of one document,
  * given the document's shared-gram hash set — the q98 ExactSubstr
  * criterion as a single map-side fold (no per-position explode, no
  * per-position shuffle; r12 sf10 fix).
  */
case class CoveredSpanLength(left: Expression, right: Expression, gramN: Int)
    extends BinaryExpression {

  require(gramN >= 1, s"graft_covered_span needs gramN >= 1, got $gramN")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_covered_span expects (string, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_covered_span"

  override def nullSafeEval(t: Any, s: Any): Any =
    ShingleOps.coveredSpanLength(t.asInstanceOf[UTF8String],
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], gramN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) => {
      val ops = ShingleOps.getClass.getName.stripSuffix("$")
      s"${ev.value} = $ops.coveredSpanLength($t, $s, $gramN);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NativeFns {
  private def ex(c: Column): Expression = ColumnBridge.expression(c)
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ex(a), ex(b)))
  def minhashSig(shingles: Column, numPerms: Int): Column =
    ColumnBridge.column(MinHashSignature(ex(shingles), numPerms))
  def simhash(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ex(tokens)))
  def lshKey(vec: Column, numPlanes: Int, seed: Long): Column =
    ColumnBridge.column(LshBucketKey(ex(vec), numPlanes, seed))
  def nearestIndex(vec: Column, candidates: Column, metric: String): Column =
    ColumnBridge.column(NearestIndex(ex(vec), ex(candidates), metric))
  def pqScore(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqApproxScore(ex(codes), ex(lut)))
  def fingerprint(text: Column): Column =
    ColumnBridge.column(RollingFingerprint(ex(text)))
  def minhashText(text: Column, shingleN: Int, numPerms: Int): Column =
    ColumnBridge.column(ShingleMinHash(ex(text), shingleN, numPerms))
  def shingleHashes(text: Column, shingleN: Int): Column =
    ColumnBridge.column(ShingleHashes(ex(text), shingleN))
  def sigAgree(a: Column, b: Column): Column =
    ColumnBridge.column(SignatureAgreement(ex(a), ex(b)))
  def pairCombos(sortedIds: Column): Column =
    ColumnBridge.column(PairCombos(ex(sortedIds)))
  def charGramHashes(text: Column, gramN: Int): Column =
    ColumnBridge.column(CharGramHashes(ex(text), gramN))
  def charGramHashSeq(text: Column, gramN: Int): Column =
    ColumnBridge.column(CharGramHashSeq(ex(text), gramN))
  def scriptCounts(text: Column): Column =
    ColumnBridge.column(ScriptCounts(ex(text)))
  def charLmScore(text: Column, sortedKeys: Array[Long],
                  permille: Array[Int]): Column =
    ColumnBridge.column(CharLmScore(ex(text), sortedKeys, permille))
  def charBigramCounts(text: Column): Column =
    ColumnBridge.column(CharBigramCounts(ex(text)))
  def hashedLinearScore(text: Column, weights: Array[Int]): Column =
    ColumnBridge.column(HashedLinearScore(ex(text), weights))
  def blocklistHits(text: Column, sortedHashes: Array[Long],
                    words: Array[UTF8String]): Column =
    ColumnBridge.column(BlocklistHits(ex(text), sortedHashes, words))
  def editDistance(a: Column, b: Column, maxDist: Int): Column =
    ColumnBridge.column(EditDistance(ex(a), ex(b), maxDist))
  def coveredSpan(text: Column, sharedHashes: Column, gramN: Int): Column =
    ColumnBridge.column(CoveredSpanLength(ex(text), ex(sharedHashes), gramN))
}
