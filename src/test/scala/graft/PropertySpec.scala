package graft

import graft.functions.{HashFns, TextFns}
import graft.operators.{Dedup, TimeSeries}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over generated corpora — the behaviors that
  * must hold for ANY input, not just the fixtures. (Generators driven
  * directly with fixed seeds: the scalatest-scalacheck bridge isn't in the
  * offline dependency set.)
  */
class PropertySpec extends GraftSuite {
  import spark.implicits._

  private val word = Gen.oneOf("join", "scan", "sort", "data", "row", "the", "a", "key")
  private val doc = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val docs = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, doc))

  private def forAll[T](g: Gen[T], runs: Int = 5)(f: T => Unit): Unit =
    (0 until runs).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  test("jaccard is symmetric-by-construction, bounded, and 1.0 for identical docs") {
    forAll(docs) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(df, $"doc_id", $"text", 3, 0.0)
        .as[(Long, Long, Double)].collect()
      assert(pairs.forall { case (a, b, j) => a < b && j >= 0.0 && j <= 1.0 })
      // identical texts must appear with jaccard exactly 1.0
      val dupIdx = texts.zipWithIndex.groupBy(_._1).values.filter(_.size > 1)
      for (grp <- dupIdx; Seq(i, j) <- grp.map(_._2.toLong).sorted.sliding(2)
           if texts(i.toInt).trim.split(" ").length >= 3) {
        assert(pairs.exists { case (a, b, v) => a == i && b == j && v == 1.0 },
          s"identical docs $i,$j not at 1.0 in ${pairs.toSeq}")
      }
    }
  }

  test("simhash hamming: 0 iff same signature; bounded by 64") {
    forAll(docs) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = Dedup.simhashPairs(df, $"doc_id", $"text", 64)
        .as[(Long, Long, Long)].collect()
      assert(pairs.forall { case (_, _, h) => h >= 0 && h <= 64 })
      for ((t, i) <- texts.zipWithIndex; (u, j) <- texts.zipWithIndex if i < j && t == u) {
        // identical token sequences must collide at hamming 0 (if banded together)
        val found = pairs.find { case (a, b, _) => a == i && b == j }
        assert(found.forall(_._3 == 0L), s"identical docs at hamming ${found}")
      }
    }
  }

  test("sessionize: session ids are contiguous from 1 and non-decreasing in time") {
    val tsGen = Gen.listOfN(10, Gen.chooseNum(0L, 8L * 3600 * 1000))
    forAll(tsGen) { offsets: List[Long] =>
      val rows = offsets.zipWithIndex.map { case (off, i) =>
        (i.toLong, 1L, new java.sql.Timestamp(1704067200000L + off))
      }
      val df = rows.toDF("event_id", "user_id", "ts")
      val got = TimeSeries.sessionize(df, $"user_id", $"ts", 1800000L)
        .orderBy("ts", "event_id")
        .select($"session_id").as[Long].collect()
      assert(got.head == 1L)
      assert(got.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == 0 || p(1) - p(0) == 1))
    }
  }

  test("prefixSum equals the plain window for any data, widths, and NULL groups") {
    val rowGen = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        grp <- Gen.oneOf(Some("a"), Some("b"), None)
        w <- Gen.chooseNum(0L, 50L)
      } yield (grp, w))
    } yield rows
    forAll(Gen.zip(rowGen, Gen.oneOf(1L, 3L, 17L, 1000L))) { case (rows, width) =>
      val df = rows.zipWithIndex.map { case ((g, w), i) => (i.toLong, g, w) }
        .toDF("ord", "grp", "w")
      val got = graft.operators.Relational.prefixSum(df, $"grp", $"ord", $"w", width)
      val expected = df.withColumn("cum",
        sum($"w").over(org.apache.spark.sql.expressions.Window
          .partitionBy($"grp").orderBy($"ord")))
      assert(got.count() == df.count(), s"width $width lost rows (NULL grp?)")
      assert(got.exceptAll(expected.select(got.columns.map(col).toIndexedSeq: _*)).count() == 0,
        s"width $width diverges from the window")
    }
  }

  test("firstOccurrenceFlags: one keeper per distinct content, any corpus") {
    forAll(docs) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val flagged = Dedup.firstOccurrenceFlags(df, $"text", Seq($"doc_id"))
      assert(flagged.count() == texts.size)
      assertOneKeeperPerContent(flagged, "text", "doc_id")
    }
  }

  test("minhash signature agreement estimates true jaccard within tolerance for identical/disjoint") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).toDF("doc_id", "text")
    val sig = df.select($"doc_id",
      graft.plans.NativeFns.minhashSig(TextFns.shingles($"text", 3), 64).as("sig"))
    val agree = sig.as("a").join(sig.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        HashFns.signatureAgreement($"a.sig", $"b.sig").as("est"))
      .as[(Long, Long, Double)].collect().map { case (a, b, e) => (a, b) -> e }.toMap
    assert(agree((1L, 2L)) == 1.0)           // identical sets
    assert(agree((1L, 3L)) < 0.3)            // disjoint sets ≈ 0
    assert(agree((2L, 3L)) < 0.3)
  }

  test("nearestIndex equals a reference argmax for any vectors (ties, zero-norm, ragged)") {
    // small integer components force EXACT score ties (the tiebreak path),
    // zero vectors exercise the undefined-cosine skip, dim-3 candidates the
    // ragged-skip; both metrics share the loop so both are checked
    val comp = Gen.chooseNum(-2, 2).map(_.toFloat)
    val v4 = Gen.listOfN(4, comp)
    val cand = Gen.oneOf(3, 4).flatMap(d => Gen.listOfN(d, comp))
    val genRow = for {
      v <- v4
      k <- Gen.chooseNum(0, 6)
      cs <- Gen.listOfN(k, cand)
    } yield (v, cs)
    def ref(v: Seq[Float], cs: Seq[Seq[Float]], cosine: Boolean): Option[Int] = {
      var best = -1; var bs = 0.0
      for ((c, j) <- cs.zipWithIndex if c.length == v.length) {
        var dot = 0.0; var nx = 0.0; var nc = 0.0
        for (i <- v.indices) {
          val xi = v(i).toDouble; val ci = c(i).toDouble
          dot += xi * ci; nx += xi * xi; nc += ci * ci
        }
        if (!cosine || (nx != 0.0 && nc != 0.0)) {
          val s = if (cosine) dot / (math.sqrt(nx) * math.sqrt(nc)) else dot - nc / 2
          if (best < 0 || java.lang.Double.compare(s, bs) > 0) { best = j; bs = s }
        }
      }
      if (best < 0) None else Some(best)
    }
    forAll(Gen.listOfN(20, genRow), runs = 3) { rows =>
      val df = rows.toDF("v", "cs")
      for (metric <- Seq("cosine", "dot_adj")) {
        val got = df.select(graft.plans.NativeFns.nearestIndex($"v", $"cs", metric))
          .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
        val want = rows.map { case (v, cs) => ref(v, cs, metric == "cosine") }
        assert(got.toSeq == want, s"metric=$metric rows=$rows")
      }
    }
  }

  test("pqScore equals the reference lookup sum for any in-range codes") {
    // integer-valued doubles sum exactly, so equality is bitwise
    val lutVal = Gen.chooseNum(-5, 5).map(_.toDouble)
    val genRow = for {
      m <- Gen.chooseNum(1, 4)
      luts <- Gen.listOfN(m, Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, lutVal)))
      codes <- Gen.sequence[List[Int], Int](luts.map(l => Gen.chooseNum(0, l.size - 1)))
    } yield (codes.toSeq, luts)
    forAll(Gen.listOfN(25, genRow), runs = 3) { rows =>
      val df = rows.toDF("codes", "lut")
      val got = df.select(graft.plans.NativeFns.pqScore($"codes", $"lut"))
        .collect().map(_.getDouble(0))
      val want = rows.map { case (codes, luts) =>
        codes.zip(luts).map { case (c, l) => l(c) }.sum
      }
      assert(got.toSeq == want, s"rows=$rows")
    }
  }

  // fuzz generator for the byte-level shingle kernels: arbitrary runs of
  // unicode words, multi-space gaps, leading/trailing space, zero-width and
  // multibyte codepoints — the shapes where an off-by-one in byte-offset
  // arithmetic would silently ship wrong hashes
  private val fuzzWord = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("héllo", "wörld", "日本語", "emoji😀x", "ß", "​", ""))
  private val fuzzDoc: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    ws <- Gen.listOfN(n, fuzzWord)
    gaps <- Gen.listOfN(n + 1, Gen.oneOf("", " ", "  ", "   "))
  } yield gaps.zipAll(ws.map(_ + ""), "", "").map { case (g, w) => g + w }.mkString

  test("fuzz: fused word-shingle kernels match the composed path on arbitrary unicode/whitespace") {
    forAll(Gen.listOfN(30, fuzzDoc), runs = 4) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      for (n <- Seq(2, 3)) {
        val diff = df.select(
            graft.plans.NativeFns.minhashText($"text", n, 16).as("fused"),
            graft.plans.NativeFns.minhashSig(TextFns.shingles($"text", n), 16).as("composed"))
          .filter(($"fused".isNull =!= $"composed".isNull) ||
            ($"fused".isNotNull && $"fused" =!= $"composed"))
          .count()
        assert(diff == 0L, s"minhash fuzz diverged at n=$n over $texts")
        val fused = df.select($"doc_id",
          explode(graft.plans.NativeFns.shingleHashes($"text", n)).as("h"))
        val composed = df.select($"doc_id",
            explode(TextFns.shingles($"text", n)).as("sh"))
          .select($"doc_id", xxhash64($"sh").as("h"))
        assert(fused.exceptAll(composed).count() == 0 &&
          composed.exceptAll(fused).count() == 0,
          s"shingle-hash fuzz diverged at n=$n over $texts")
      }
    }
  }

  test("fuzz: fused char-gram kernel matches codepoint substring hashing on arbitrary unicode") {
    forAll(Gen.listOfN(30, fuzzDoc), runs = 4) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val n = 5
      val fused = df.select($"doc_id",
        explode(graft.plans.NativeFns.charGramHashes($"text", n)).as("h"))
      val composed = df.select($"doc_id", explode(expr(
          s"CASE WHEN length(text) >= $n THEN " +
            s"transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n)) " +
            s"ELSE array() END")).as("g"))
        .select($"doc_id", xxhash64($"g").as("h")).distinct()
      assert(fused.exceptAll(composed).count() == 0 &&
        composed.exceptAll(fused).count() == 0,
        s"char-gram fuzz diverged over $texts")
    }
  }

  // Spark strings are not guaranteed valid UTF-8 (cast(binary as string)
  // passes bytes through): bare continuation bytes (0x80–0xBF), disallowed
  // leads (0xF8–0xFF), and truncated multi-byte tails all occur.
  private val invalidUtf8Byte = Gen.oneOf(
    Gen.chooseNum(0x80, 0xBF), // bare continuation
    Gen.chooseNum(0xF8, 0xFF), // disallowed leads (walk advances 1)
    Gen.oneOf(0xC2, 0xE0, 0xF0, 0xF5), // multi-byte leads, often truncated
    Gen.chooseNum('a'.toInt, 'z'.toInt))
  private val invalidUtf8Bytes = Gen.chooseNum(0, 24).flatMap(n =>
    Gen.listOfN(n, invalidUtf8Byte).map(_.map(_.toByte).toArray))

  test("fuzz: fused char-gram kernel matches the substring walk on invalid UTF-8 (padded tail)") {
    // Parity vs the composed substring path needs a well-defined composed
    // side: UTF8String.substring itself overshoots a truncated multi-byte
    // TAIL (its copy length can exceed numBytes, reading undefined heap
    // bytes into the last gram), so the composed twin is nondeterministic
    // exactly there. A 4-ASCII-byte pad pins every multi-byte advance
    // inside the payload while still fuzzing the invalid-lead/continuation
    // walk; the unpadded tail case is covered by the bounds test below.
    forAll(Gen.listOfN(20, invalidUtf8Bytes), runs = 6) { arrays =>
      val padded = arrays.map(_ ++ "wxyz".getBytes("UTF-8"))
      val df = padded.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDF("doc_id", "raw")
        .select($"doc_id", $"raw".cast("string").as("text"))
      val n = 3
      val fused = df.select($"doc_id",
        explode(graft.plans.NativeFns.charGramHashes($"text", n)).as("h"))
      val composed = df.select($"doc_id", explode(expr(
          s"CASE WHEN length(text) >= $n THEN " +
            s"transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n)) " +
            s"ELSE array() END")).as("g"))
        .select($"doc_id", xxhash64($"g").as("h")).distinct()
      assert(fused.exceptAll(composed).count() == 0 &&
        composed.exceptAll(fused).count() == 0,
        s"char-gram invalid-UTF-8 fuzz diverged over ${padded.map(_.toSeq)}")
    }
  }

  test("fused charLM train+score equals the composed pipeline for arbitrary unicode corpora") {
    import graft.operators.Scoring
    val fragment = Gen.oneOf("a", "b", "z", "0", " ", "  ", "é", "ß", "汉",
      "字", "𐍈", "α", "\t", "\n", "ab", "ba")
    val anyDoc = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, fragment).map(_.mkString))
    val corpus = Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, anyDoc))
    forAll(corpus, runs = 6) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val m1 = Scoring.trainCharBigramLm(df, $"text")
        .as[(String, Long)].collect().toSeq.sortBy(_._1)
      val m2 = Scoring.trainCharBigramLmFused(df, $"text")
        .as[(String, Long)].collect().toSeq.sortBy(_._1)
      assert(m2 == m1, s"model diverged on $texts")
      val model = Scoring.trainCharBigramLmFused(df, $"text")
      val s1 = Scoring.scoreCharBigramLm(df, $"doc_id", $"text", model)
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val s2 = Scoring.scoreCharBigramLmFused(df, $"doc_id", $"text", model)
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(s2 == s1, s"scores diverged on $texts")
      // conservation: per-doc bigram multiplicities total numChars - 1
      for (t <- texts) {
        val (_, cnts) = graft.plans.ShingleOps.charBigramCounts(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
        val expect = math.max(0, t.codePointCount(0, t.length) - 1)
        assert(cnts.sum == expect, s"count conservation broke on '$t'")
      }
      // and the hashed-linear pair on the same corpus: fused == composed
      // under a corpus model AND a mostly-absent-bucket foreign model
      val labeled = df.withColumn("y", length($"text") % 2 === 0)
      for (model <- Seq(
          Scoring.trainHashedLinear(labeled, $"text", $"y", 64),
          Scoring.trainHashedLinear(
            Seq((0L, "qq", true)).toDF("doc_id", "text", "y"), $"text", $"y", 64))) {
        val c = Scoring.scoreHashedLinear(df, $"doc_id", $"text", model, 64)
          .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
        val f = Scoring.scoreHashedLinearFused(df, $"doc_id", $"text", model, 64)
          .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
        assert(f == c, s"hashed-linear diverged on $texts")
      }
    }
  }

  test("fuzz: charLM kernels never read past the payload on truncated multi-byte tails") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.plans.ShingleOps
    forAll(Gen.listOfN(40, invalidUtf8Bytes), runs = 6) { arrays =>
      for (a <- arrays) {
        val framed = new Array[Byte](a.length + 8)
        java.util.Arrays.fill(framed, 0x55.toByte)
        System.arraycopy(a, 0, framed, 0, a.length)
        val view = UTF8String.fromBytes(framed, 0, a.length)
        val exact = UTF8String.fromBytes(a.clone())
        val (bgV, cntV) = ShingleOps.charBigramCounts(view)
        val (bgE, cntE) = ShingleOps.charBigramCounts(exact)
        assert(bgV.toSeq == bgE.toSeq && cntV.toSeq == cntE.toSeq,
          s"bigram-count kernel read past payload for bytes=${a.toSeq}")
        val keys = bgE.map(ShingleOps.modelKey).sorted
        val w = Array.fill(keys.length)(1)
        assert(ShingleOps.charLmScore(view, keys, w).toSeq ==
          ShingleOps.charLmScore(exact, keys, w).toSeq,
          s"LM-score kernel read past payload for bytes=${a.toSeq}")
        // hashed-linear walk: bucket-dependent sums expose any byte
        // misread; weights = bucket index for maximum signal
        val hw = Array.tabulate(64)(identity)
        assert(ShingleOps.hashedLinearScore(view, hw).toSeq ==
          ShingleOps.hashedLinearScore(exact, hw).toSeq,
          s"hashed-linear kernel read past payload for bytes=${a.toSeq}")
      }
    }
  }

  test("fuzz: banded editDistance equals the levenshtein builtin for arbitrary unicode and thresholds") {
    val uniChar = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("é"),
      Gen.const("汉"), Gen.const("𐍈"), // non-BMP surrogate pair
      Gen.const("ß"))
    val uniStr = Gen.chooseNum(0, 18).flatMap(n =>
      Gen.listOfN(n, uniChar).map(_.mkString))
    val pairGen = for { a <- uniStr; b <- uniStr; k <- Gen.chooseNum(0, 25) }
      yield (a, b, k)
    forAll(Gen.listOfN(60, pairGen), runs = 6) { triples =>
      val df = triples.zipWithIndex
        .map { case ((a, b, k), i) => (i.toLong, a, b, k) }
        .toDF("id", "a", "b", "k")
      // group by threshold so each EditDistance literal matches its rows
      triples.map(_._3).distinct.foreach { k =>
        val slice = df.filter($"k" === k)
        val got = slice.select($"id",
            graft.plans.NativeFns.editDistance($"a", $"b", k).as("d"),
            levenshtein($"a", $"b", k).as("want"))
          .as[(Long, Int, Int)].collect()
        for ((id, d, want) <- got)
          assert(d == want, s"id=$id k=$k: native $d != builtin $want " +
            s"for ${triples(id.toInt)}")
      }
      // and unbounded parity through a generous threshold
      val loose = df.select(
          graft.plans.NativeFns.editDistance($"a", $"b", 100).as("d"),
          levenshtein($"a", $"b").as("want"))
        .as[(Int, Int)].collect()
      for ((d, want) <- loose) assert(d == want)
    }
  }

  test("fuzz: editDistance never reads past the payload and is total on invalid UTF-8") {
    // sentinel-framed bounds proof (the charGram pattern): a view of the
    // payload inside a larger sentinel-filled array must decode exactly
    // like an exact-size copy — any out-of-band read sees different bytes.
    // Also pins totality: arbitrary invalid bytes must never throw or
    // overflow the decode buffer (the numChars-vs-own-walk sizing trap).
    import org.apache.spark.unsafe.types.UTF8String
    forAll(Gen.listOfN(24, Gen.zip(invalidUtf8Bytes, invalidUtf8Bytes)), runs = 6) { pairs =>
      for ((a, b) <- pairs; k <- Seq(0, 3, 50)) {
        val framedA = new Array[Byte](a.length + 8)
        java.util.Arrays.fill(framedA, 0xF5.toByte)
        System.arraycopy(a, 0, framedA, 0, a.length)
        val viewA = UTF8String.fromBytes(framedA, 0, a.length)
        val exactA = UTF8String.fromBytes(a.clone())
        val eB = UTF8String.fromBytes(b.clone())
        val dView = graft.plans.ShingleOps.editDistance(viewA, eB, k)
        val dExact = graft.plans.ShingleOps.editDistance(exactA, eB, k)
        assert(dView == dExact,
          s"kernel read past payload: k=$k a=${a.toSeq} b=${b.toSeq}")
        assert(dExact >= -1 && dExact <= k,
          s"out-of-contract distance $dExact for k=$k")
        assert(graft.plans.ShingleOps.editDistance(exactA, exactA, 0) == 0,
          "self distance must be 0 even on invalid bytes")
        // same frame proves the blocklist walk's bounds (it token-splits
        // and range-hashes the identical payload view)
        val words = Array("slow", "x").map(UTF8String.fromString)
        val hashes = words.map(graft.plans.ShingleOps.modelKey)
        val idx = hashes.zip(words).sortBy(_._1)
        assert(graft.plans.ShingleOps.blocklistHits(viewA, idx.map(_._1), idx.map(_._2)).toSeq ==
          graft.plans.ShingleOps.blocklistHits(exactA, idx.map(_._1), idx.map(_._2)).toSeq,
          s"blocklist kernel read past payload for bytes=${a.toSeq}")
      }
    }
  }

  test("fuzz: fused char-gram kernel never reads past the payload on truncated multi-byte tails") {
    // Sentinel proof of bounds safety: hash a view of the payload embedded
    // in a larger array whose following bytes are sentinels, and an
    // exact-size copy. An out-of-bounds read hashes sentinel bytes in one
    // and undefined heap bytes in the other — only an in-bounds kernel
    // gives identical output for every gram width.
    import org.apache.spark.unsafe.types.UTF8String
    forAll(Gen.listOfN(40, invalidUtf8Bytes), runs = 6) { arrays =>
      for (a <- arrays; n <- Seq(1, 2, 3, 5)) {
        val framed = new Array[Byte](a.length + 8)
        java.util.Arrays.fill(framed, 0x55.toByte)
        System.arraycopy(a, 0, framed, 0, a.length)
        val view = UTF8String.fromBytes(framed, 0, a.length)
        val exact = UTF8String.fromBytes(a.clone())
        val hv = graft.plans.ShingleOps.charGramHashes(view, n)
        val he = graft.plans.ShingleOps.charGramHashes(exact, n)
        assert(java.util.Arrays.equals(hv, he),
          s"char-gram kernel read past payload for n=$n bytes=${a.toSeq}")
        // the position-ordered twin under the same sentinel proof, plus the
        // hash-compat contract (its distinct set == the deduping kernel's)
        val sv = graft.plans.ShingleOps.charGramHashSeq(view, n)
        val se = graft.plans.ShingleOps.charGramHashSeq(exact, n)
        assert(java.util.Arrays.equals(sv, se),
          s"seq kernel read past payload for n=$n bytes=${a.toSeq}")
        assert(se.toSet == he.toSet,
          s"seq kernel hashes diverged from the deduping kernel for n=$n")
        // scriptCounts under the same proof: bounds-safe and step-capped
        val scv = graft.plans.ShingleOps.scriptCounts(view)
        val sce = graft.plans.ShingleOps.scriptCounts(exact)
        assert(java.util.Arrays.equals(scv, sce),
          s"script kernel read past payload for bytes=${a.toSeq}")
        assert(sce.sum <= exact.numChars(),
          "script kernel classified more steps than numChars")
      }
    }
  }

  test("charGramHashSeq instance count and dupSpanCoverage bounds hold for any unicode text") {
    val frag = Gen.oneOf("a", "b", "я", "ы", "日", "本", " ", "\t", "0",
      "ß", "€", "😀") // incl. a 4-byte (surrogate-pair) codepoint
    val text = Gen.chooseNum(0, 50).flatMap(k => Gen.listOfN(k, frag).map(_.mkString))
    val corpus = Gen.chooseNum(2, 6).flatMap(k => Gen.listOfN(k, text))
    val n = 3
    forAll(corpus) { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = df.select(length($"text").as("len"),
          graft.plans.NativeFns.charGramHashSeq($"text", n).as("seq"),
          graft.plans.NativeFns.charGramHashes($"text", n).as("ded"))
        .collect()
      rows.foreach { r =>
        val len = r.getInt(0)
        val seq = r.getSeq[Long](1)
        val ded = r.getSeq[Long](2)
        assert(seq.length == math.max(0, len - n + 1),
          s"instance count must be codepoints−n+1 (len=$len got=${seq.length})")
        assert(seq.toSet == ded.toSet, "distinct(seq) must equal the deduped kernel")
        assert(ded.distinct.length == ded.length, "deduped kernel must be duplicate-free")
      }
      val cov = Dedup.dupSpanCoverage(df, $"doc_id", $"text", n).collect()
      assert(cov.length == ts.length, "every doc emitted")
      cov.foreach { r =>
        val ncp = r.getLong(1); val c = r.getLong(2); val ratio = r.getDouble(3)
        assert(c >= 0L && c <= ncp, s"covered $c out of bounds for n_cp $ncp")
        assert(ratio >= 0.0 && ratio <= 1.0, s"ratio $ratio out of [0,1]")
      }
    }
  }

  test("CMS slice bucket: Java and Catalyst agree on arbitrary unicode tokens") {
    // the engine-portability contract behind q101: the aggregate's
    // MessageDigest slice and the probe side's conv/substring/md5 must be
    // the same function on ANY token, or est < true becomes possible
    val anyTok = Gen.listOfN(6, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)), Gen.oneOf("日本語", "naïve:0", "", " ",
        "tag", "γλώσσα", "emoji😀")))
    forAll(anyTok) { toks =>
      val width = 64
      val rows = toks.distinct.toDF("tok").select(col("tok") +:
          (0 until 4).map(r =>
            (conv(substring(md5(col("tok")), 1 + 8 * r, 8), 16, 10)
              .cast("long") % width).as(s"b$r")): _*)
        .collect()
      rows.foreach { row =>
        (0 until 4).foreach { r =>
          assert(row.getLong(r + 1) ==
            graft.plans.CountMin.md5Bucket(row.getString(0), r, width))
        }
      }
    }
  }

  test("CMS never underestimates on arbitrary corpora, any partitioning") {
    forAll(docs) { texts =>
      val toks = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      if (toks.nonEmpty) {
        val width = 16 // tiny width: collisions guaranteed, bound still holds
        val grid = toks.toDF("tok").repartition(5)
          .agg(graft.plans.CountMin.countMin(col("tok"), 4, width))
          .as[Seq[Long]].head()
        assert(grid.sum == 4L * toks.size, "every instance hits once per row")
        toks.groupBy(identity).foreach { case (t, is) =>
          val est = (0 until 4)
            .map(r => grid(r * width + graft.plans.CountMin.md5Bucket(t, r, width)))
            .min
          assert(est >= is.size, s"underestimated '$t'")
        }
      }
    }
  }
}
