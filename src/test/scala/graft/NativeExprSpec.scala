package graft

import graft.functions.{HashFns, TextFns, VecFns}
import graft.plans.NativeFns
import org.apache.spark.sql.functions._

class NativeExprSpec extends GraftSuite {
  import spark.implicits._

  test("native cosine is bit-identical to the composed formulation") {
    val embs = graft.sources.Readers.table(spark, sf, "embeddings").limit(50)
    val diff = embs.as("a").join(embs.as("b"), $"a.vec_id" < $"b.vec_id")
      .select(
        NativeFns.cosineSim($"a.embedding", $"b.embedding").as("native"),
        VecFns.cosine($"a.embedding", $"b.embedding").as("composed"))
      .filter($"native" =!= $"composed")
      .count()
    assert(diff == 0L)
  }

  test("native simhash equals the composed simhash (same xxhash64 seed)") {
    val docs = graft.sources.Readers.table(spark, sf, "documents").limit(50)
    val diff = docs.select(
        NativeFns.simhash(TextFns.tokens($"text")).as("native"),
        HashFns.simhash64(TextFns.tokens($"text")).as("composed"))
      .filter($"native" =!= $"composed")
      .count()
    assert(diff == 0L)
  }

  test("native minhash: identical inputs → identical signature, agreement 1") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f")).toDF("id", "text")
    val sigs = df.select(NativeFns.minhashSig(TextFns.shingles($"text", 3), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 16)
  }

  test("cosine of a zero-norm vector is NULL (never NaN) in both impls") {
    val df = Seq(
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)),
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    val native = df.select(NativeFns.cosineSim($"a", $"b")).collect().map(r => Option(r.get(0)))
    val composed = df.select(VecFns.cosine($"a", $"b")).collect().map(r => Option(r.get(0)))
    assert(native(0).isEmpty && composed(0).isEmpty)
    assert(native(1).contains(1.0) && composed(1).contains(1.0))
  }

  test("native cosine of length-mismatched arrays is NULL, matching the composed form") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f))).toDF("a", "b")
    val row = df.select(
      NativeFns.cosineSim($"a", $"b").as("native"),
      VecFns.cosine($"a", $"b").as("composed")).collect().head
    assert(row.isNullAt(0), "native cosine scored a truncated prefix instead of NULL")
    assert(row.isNullAt(1))
  }

  test("native minhash of an empty shingle set is NULL (no all-MaxValue clique)") {
    val df = Seq(Tuple1(Array.empty[String]), Tuple1(Array("a b c"))).toDF("sh")
    val rows = df.select(NativeFns.minhashSig($"sh", 8).as("sig")).collect()
    assert(rows.head.isNullAt(0), "empty input produced a sentinel signature")
    assert(!rows(1).isNullAt(0))
  }

  test("lsh key rejects numPlanes outside 1..64 (bit wrap would alias planes)") {
    val df = Seq(Tuple1(Array(1.0f))).toDF("v")
    intercept[IllegalArgumentException] {
      df.select(NativeFns.lshKey($"v", 65, 42L)).collect()
    }
  }

  test("native lsh key: deterministic, bounded by numPlanes, similar vectors collide") {
    val embs = graft.sources.Readers.table(spark, sf, "embeddings").limit(20)
    val keys = embs.select(NativeFns.lshKey($"embedding", 8, 42L).as("k"))
      .as[Long].collect()
    val keys2 = embs.select(NativeFns.lshKey($"embedding", 8, 42L).as("k"))
      .as[Long].collect()
    assert(keys.toSeq == keys2.toSeq)
    assert(keys.forall(k => k >= 0 && k < 256))
    // identical vector → identical key (trivial collision property)
    val self = embs.as("a").join(embs.as("b"), $"a.vec_id" === $"b.vec_id")
      .select(NativeFns.lshKey($"a.embedding", 8, 42L) ===
        NativeFns.lshKey($"b.embedding", 8, 42L))
      .as[Boolean].collect()
    assert(self.forall(identity))
  }

  test("extensions register graft_* SQL functions") {
    val cos = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
    val sim = spark.sql("SELECT graft_simhash(array('a','b')) AS s").as[Long].head()
    val sim2 = spark.sql("SELECT graft_simhash(array('a','b')) AS s").as[Long].head()
    assert(sim == sim2)
    val sig = spark.sql("SELECT graft_minhash(array('a','b','c'), 8) AS s")
      .as[Seq[Long]].head()
    assert(sig.length == 8)
    val nearest = spark.sql(
      """SELECT graft_nearest(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)),
        |        array(CAST(2.0 AS FLOAT), CAST(0.0 AS FLOAT)))) AS n""".stripMargin)
      .as[Int].head()
    assert(nearest == 1)
    val ed = spark.sql(
      "SELECT graft_edit_distance('kitten', 'sitting', 5) AS d").as[Int].head()
    assert(ed == 3)
    val edOver = spark.sql(
      "SELECT graft_edit_distance('kitten', 'sitting', 2) AS d").as[Int].head()
    assert(edOver == -1)
  }

  test("null ARRAY ELEMENTS null the result (never a silent 0-read or NPE), both eval paths") {
    // SQL-registered expressions take arbitrary arrays: a null slot must
    // surface as a NULL result (cosine/minhash/simhash/lsh_key/sig_agree)
    // or skip the candidate (nearest), exactly like the composed
    // formulations whose null products null the aggregate / drop from
    // max_by. One corrupt row among clean ones exercises BOTH the
    // codegen'd batch path and per-row nulls.
    val rows = spark.sql(
      """SELECT
        | graft_cosine(array(CAST(NULL AS FLOAT), CAST(1.0 AS FLOAT)),
        |              array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS cos_null,
        | graft_cosine(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS cos_ok,
        | graft_minhash(array('a', CAST(NULL AS STRING)), 4) AS mh_null,
        | graft_simhash(array('a', CAST(NULL AS STRING))) AS sh_null,
        | graft_lsh_key(array(CAST(NULL AS FLOAT)), 4) AS lsh_null,
        | graft_sig_agree(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        |                 array(CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS agree_null,
        | graft_nearest(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |   array(array(CAST(NULL AS FLOAT), CAST(1.0 AS FLOAT)),
        |         array(CAST(2.0 AS FLOAT), CAST(0.0 AS FLOAT)))) AS nearest_skip,
        | graft_nearest(array(CAST(NULL AS FLOAT)),
        |   array(array(CAST(1.0 AS FLOAT)))) AS nearest_null
        |""".stripMargin).collect().head
    assert(rows.isNullAt(0), "null query element must null cosine")
    assert(rows.getDouble(1) == 1.0)
    assert(rows.isNullAt(2), "null shingle must null minhash")
    assert(rows.isNullAt(3), "null token must null simhash")
    assert(rows.isNullAt(4), "null component must null lsh key")
    assert(rows.isNullAt(5), "null signature slot must null agreement")
    assert(rows.getInt(6) == 1, "null-element candidate must be SKIPPED, not scored")
    assert(rows.isNullAt(7), "null query element must null nearest")
  }

  test("native nearestIndex matches the max_by-over-cosine formulation on real embeddings") {
    val embs = graft.sources.Readers.table(spark, sf, "embeddings")
      .filter($"vec_id" < 80)
    // ONE deterministic centroid selection for both formulations — two
    // independent unordered limit(7) calls need not return the same rows
    val cents = embs.orderBy($"vec_id").limit(7)
    val cands = cents
      .agg(array_sort(collect_list(struct($"vec_id", $"embedding"))).as("cs"))
      .select($"cs.vec_id".as("cids"), $"cs.embedding".as("cvecs"))
    val native = embs.join(broadcast(cands))
      .select($"vec_id",
        get($"cids", NativeFns.nearestIndex($"embedding", $"cvecs", "cosine"))
          .as("cell_id"))
    val composed = embs.as("c").join(broadcast(cents
        .select($"vec_id".as("cell_id"), $"embedding".as("cvec"))))
      .groupBy($"c.vec_id".as("vec_id"))
      .agg(max_by(struct($"cell_id"),
        struct(NativeFns.cosineSim($"c.embedding", $"cvec").as("sim"),
          (-$"cell_id").as("tb"))).as("best"))
      .select($"vec_id", $"best.cell_id".as("cell_id"))
    assert(native.except(composed).count() == 0 &&
      composed.except(native).count() == 0)
  }

  test("nearestIndex: ties → lowest index, undefined candidates skipped, none defined → NULL") {
    val df = Seq(
      // duplicate best candidate: index 0 must win the tie
      (Seq(1.0f, 0.0f), Seq(Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))),
      // zero-norm + length-mismatch candidates skipped; only index 2 scores
      (Seq(1.0f, 0.0f), Seq(Seq(0.0f, 0.0f), Seq(1.0f), Seq(0.5f, 0.5f))),
      // nothing scores → NULL
      (Seq(1.0f, 0.0f), Seq(Seq(0.0f, 0.0f), Seq(1.0f)))).toDF("v", "cs")
    val got = df.select(NativeFns.nearestIndex($"v", $"cs", "cosine"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq == Seq(Some(0), Some(1 + 1), None))
  }

  test("native pqScore equals the composed aggregate/element_at formulation, incl. null slots") {
    val df = Seq(
      // clean: lut[0][1] + lut[1][0] = 2.5 + 10.0
      (Seq(Option(1), Option(0)), Seq(Option(Seq(1.5, 2.5)), Option(Seq(10.0, 20.0)))),
      // out-of-range code → NULL (composed: element_at past end)
      (Seq(Option(5), Option(0)), Seq(Option(Seq(1.5, 2.5)), Option(Seq(10.0, 20.0)))),
      // NULL code slot → NULL sum (a partial sum would silently mis-rank)
      (Seq(Option(1), None), Seq(Option(Seq(1.5, 2.5)), Option(Seq(10.0, 20.0)))),
      // NULL sub-LUT slot → NULL sum
      (Seq(Option(1), Option(0)), Seq(Option(Seq(1.5, 2.5)), None))).toDF("codes", "lut")
    val composed = df.select(
      aggregate(sequence(lit(0), size($"codes") - 1), lit(0.0),
        (acc, s) => acc + get(get($"lut", s.cast("int")), get($"codes", s.cast("int")))))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val native = df.select(NativeFns.pqScore($"codes", $"lut"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(native.toSeq == Seq(Some(12.5), None, None, None))
    assert(composed.toSeq == native.toSeq)
    val sql = spark.sql(
      "SELECT graft_pq_score(array(1, 0), array(array(1.5D, 2.5D), array(10.0D, 20.0D))) AS v")
      .as[Double].head()
    assert(sql == 12.5)
  }

  test("native fingerprint is bit-identical to the composed rolling hash (unicode, empty, null)") {
    val docs = graft.sources.Readers.table(spark, sf, "documents")
    val diff = docs.select(
        NativeFns.fingerprint($"text").as("native"),
        TextFns.fingerprint($"text").as("composed"))
      .filter($"native" =!= $"composed")
      .count()
    assert(diff == 0L)
    // edge cases pinned by value: empty folds to 0 (split('') → one empty
    // element, ascii('') = 0), ascii() yields full codepoints (é = 233,
    // U+1D54F = 120143 via surrogate pair), null stays null
    val edge = Seq(Some(""), Some("a"), Some("héllo"), Some("a𝕏b"), None).toDF("t")
    val rows = edge.select(NativeFns.fingerprint($"t").as("n"), TextFns.fingerprint($"t").as("c"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(rows.forall { case (n, c) => n == c }, s"native != composed: ${rows.toSeq}")
    assert(rows.map(_._1).toSeq == Seq(Some(0L), Some(97L), Some(103094734L),
      Some(3817748L), None))
    val sql = spark.sql("SELECT graft_fingerprint('ab') AS v").as[Long].head()
    assert(sql == 97L * 31 + 98)
  }

  test("nearestIndex dot_adj is argmin L2 (dot − |c|²/2 ordering)") {
    // v = (1,1): L2-nearest of (3,3), (1,0), (0,2) is (1,0)
    val df = Seq((Seq(1.0f, 1.0f),
      Seq(Seq(3.0f, 3.0f), Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)))).toDF("v", "cs")
    val got = df.select(NativeFns.nearestIndex($"v", $"cs", "dot_adj")).as[Int].head()
    assert(got == 1)
    // interpreted eval agrees with codegen (HOF contexts eval this path)
    val e = graft.plans.NearestIndex(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 1.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(Seq(3.0f, 3.0f), Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))), "dot_adj")
    assert(e.eval(null) == 1)
  }

  test("fused text minhash is bit-identical to the composed shingle path") {
    // real corpus rows PLUS adversarial whitespace shapes: doubled/tripled
    // interior spaces (empty tokens), leading/trailing runs, exactly-n and
    // below-n token counts, unicode multibyte — the fused kernel hashes
    // byte ranges of the trimmed text, so any tokenization divergence from
    // split(trim(text), " ") shows up here as a signature mismatch
    val corpus = graft.sources.Readers.table(spark, sf, "documents")
      .limit(200).select($"text")
    val edges = Seq(
      "a  b c d", "  lead", "trail   ", "a b c", "a b", "", "   ",
      "a  b  c", "héllo wörld ünïcode tøkens", "x " * 40 + "y",
      "single").toDF("text")
    for (n <- Seq(1, 2, 3)) {
      // at n=1, blank docs diverge BY DESIGN (see ShingleOps.minhash doc):
      // restrict the parity claim to docs with content
      val base = if (n == 1) corpus.union(edges).filter(trim($"text") =!= "")
                 else corpus.union(edges)
      val diff = base
        .select(
          NativeFns.minhashText($"text", n, 32).as("fused"),
          NativeFns.minhashSig(TextFns.shingles($"text", n), 32).as("composed"))
        .filter(
          ($"fused".isNull =!= $"composed".isNull) ||
            ($"fused".isNotNull && $"fused" =!= $"composed"))
        .count()
      assert(diff == 0L, s"fused minhash diverged from the composed path at n=$n")
    }
    // the documented n=1 blank-doc divergence: fused refuses the
    // empty-string signature the composed path would emit
    val blank = Seq("", "   ").toDF("text")
      .select(NativeFns.minhashText($"text", 1, 8).as("sig"))
      .collect()
    assert(blank.forall(_.isNullAt(0)),
      "fused n=1 must NULL blank docs, not sign the empty string")
  }

  test("fused shingle hashes equal xxhash64 over distinct composed shingles") {
    val corpus = graft.sources.Readers.table(spark, sf, "documents")
      .limit(200).select($"doc_id", $"text")
    val edges = Seq((9001L, "a  b c d"), (9002L, " x y "), (9003L, "a b"),
      (9004L, "héllo wörld ünïcode tøkens extra words here")).toDF("doc_id", "text")
    val docs = corpus.union(edges)
    val fused = docs.select($"doc_id",
        explode(NativeFns.shingleHashes($"text", 3)).as("h"))
    val composed = docs.select($"doc_id",
        explode(TextFns.shingles($"text", 3)).as("sh"))
      .select($"doc_id", xxhash64($"sh").as("h"))
    assert(fused.exceptAll(composed).count() == 0L &&
      composed.exceptAll(fused).count() == 0L,
      "fused shingle hash multiset diverged from composed xxhash64(shingle)")
  }

  test("native signature agreement equals the composed zip_with form") {
    val docs = graft.sources.Readers.table(spark, sf, "documents").limit(100)
    val sigs = docs.select($"doc_id", NativeFns.minhashText($"text", 2, 16).as("sig"))
      .filter($"sig".isNotNull)
    val diff = sigs.as("a").join(sigs.as("b"), $"a.doc_id" < $"b.doc_id")
      .select(
        NativeFns.sigAgree($"a.sig", $"b.sig").as("native"),
        HashFns.signatureAgreement($"a.sig", $"b.sig").as("composed"))
      .filter($"native" =!= $"composed")
      .count()
    assert(diff == 0L)
  }

  test("fused char-gram hashes equal xxhash64 over distinct codepoint substrings") {
    // composed twin built from substring over a codepoint index — the
    // definition DuckDB's substr uses — including multibyte UTF-8 where
    // codepoint != byte offsets
    val corpus = graft.sources.Readers.table(spark, sf, "documents")
      .limit(100).select($"doc_id", $"text")
    val edges = Seq((9001L, "héllo wörld — ünïcode tøkens ærø ßharp çedilla ñye"),
      (9002L, "x" * 19), (9003L, "y" * 20), (9004L, ""),
      (9005L, "abcabcabcabcabcabcabcabcabc")).toDF("doc_id", "text")
    val docs = corpus.union(edges)
    val n = 20
    val fused = docs.select($"doc_id",
      explode(graft.plans.NativeFns.charGramHashes($"text", n)).as("h"))
    val composed = docs
      .select($"doc_id", explode(expr(
        // sequence(1, 0) would count DOWN — guard short docs to an empty array
        s"CASE WHEN length(text) >= $n THEN " +
          s"transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n)) " +
          s"ELSE array() END")).as("g"))
      .select($"doc_id", xxhash64($"g").as("h")).distinct()
    assert(fused.exceptAll(composed).count() == 0L &&
      composed.exceptAll(fused).count() == 0L,
      "fused char-gram hashes diverged from codepoint substring hashing")
  }

  test("charGramHashSeq is the position-ordered instance twin of charGramHashes") {
    val corpus = graft.sources.Readers.table(spark, sf, "documents")
      .limit(100).select($"doc_id", $"text")
    val edges = Seq((9001L, "héllo wörld — ünïcode tøkens ærø ßharp çedilla ñye"),
      (9002L, "x" * 19), (9003L, "y" * 20), (9004L, ""),
      (9005L, "abcabcabcabcabcabcabcabcabc")).toDF("doc_id", "text")
    val docs = corpus.union(edges)
    val n = 20
    // (pos, hash) instances from the fused kernel
    val fused = docs.select($"doc_id",
      posexplode(graft.plans.NativeFns.charGramHashSeq($"text", n)).as(Seq("pos", "h")))
    // composed twin: hash of substring(text, pos+1, n) at every 0-based pos
    val composed = docs
      .select($"doc_id", explode(expr(
        s"CASE WHEN length(text) >= $n THEN " +
          s"transform(sequence(1, length(text) - ${n - 1}), i -> " +
          s"struct(i - 1 AS pos, substring(text, i, $n) AS g)) " +
          s"ELSE array() END")).as("pg"))
      .select($"doc_id", $"pg.pos".cast("int").as("pos"), xxhash64($"pg.g").as("h"))
    assert(fused.exceptAll(composed).count() == 0L &&
      composed.exceptAll(fused).count() == 0L,
      "position-ordered gram hashes diverged from codepoint substring hashing")
    // dedup of the seq == the deduped kernel (hash-compatible by construction)
    val dedupSeq = docs.select($"doc_id",
      explode(graft.plans.NativeFns.charGramHashSeq($"text", n)).as("h")).distinct()
    val dedupK = docs.select($"doc_id",
      explode(graft.plans.NativeFns.charGramHashes($"text", n)).as("h"))
    assert(dedupSeq.exceptAll(dedupK).count() == 0L &&
      dedupK.exceptAll(dedupSeq).count() == 0L,
      "seq kernel's distinct hashes diverged from the deduping kernel")
  }

  test("native pair combos equal the composed nested-transform expansion") {
    val df = Seq(
      Seq(1L, 2L, 3L, 4L), Seq(7L, 9L), Seq(5L), Seq.empty[Long]).toDF("ds")
    val fused = df.select(explode(NativeFns.pairCombos($"ds")).as("p"))
      .select($"p.doc_a", $"p.doc_b")
    val composed = df.select(explode(expr(
        "flatten(transform(ds, (x, i) -> " +
          "transform(slice(ds, i + 2, size(ds) - i - 1), " +
          "y -> struct(x AS doc_a, y AS doc_b))))")).as("p"))
      .select($"p.doc_a", $"p.doc_b")
    assert(fused.collect().toSeq == composed.collect().toSeq,
      "pair expansion order or content diverged")
    assert(fused.count() == 4 * 3 / 2 + 1)
  }

  test("SQL registration: graft_minhash_text / graft_shingle_hashes / graft_sig_agree") {
    val row = spark.sql(
      """SELECT graft_sig_agree(graft_minhash_text('a b c d e', 2, 8),
        |                       graft_minhash_text('a b c d e', 2, 8)) AS agree,
        |       size(graft_shingle_hashes('a b c d e', 2)) AS n
        |""".stripMargin).collect().head
    assert(row.getDouble(0) == 1.0)
    assert(row.getInt(1) == 4)
  }

  test("SQL registration: graft_chargram_hash_seq / graft_script_counts") {
    val row = spark.sql(
      """SELECT size(graft_chargram_hash_seq('abcabc', 3)) AS n_seq,
        |       graft_chargram_hash_seq('abcabc', 3)[0] =
        |         graft_chargram_hash_seq('abcabc', 3)[3] AS rep,
        |       graft_script_counts('ab я 1')[0] AS lat,
        |       graft_script_counts('ab я 1')[1] AS cyr,
        |       graft_script_counts('ab я 1')[7] AS dig
        |""".stripMargin).collect().head
    assert(row.getInt(0) == 4, "position-ordered: one entry per instance")
    assert(row.getBoolean(1), "repeated gram hashes equal at both positions")
    assert(row.getLong(2) == 2L && row.getLong(3) == 1L && row.getLong(4) == 1L)
  }
}
