package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** q107's contract: the integer-quantized sign-LSH ANN (the APPROXIMATE
  * configuration, directly oracle-checked — the q96/q106 algorithm-oracle
  * move applied to the float-cosine ANN family). The driver oracle proves
  * stage-for-stage DuckDB equality at sf0.01; this spec pins the three
  * properties the oracle can't see:
  *
  *   1. the geometry primitives behave as documented (round-half-up
  *      quantization incl. negatives; md5 weights in [-span, span] with
  *      both signs represented — a one-sided weight table would make every
  *      sign bit constant and the banding vacuous);
  *   2. the configuration is GENUINELY approximate — bucketing splits the
  *      corpus (distinct keys >> tables) and the candidate set is
  *      sub-exhaustive, so the oracle checks real banding, not probe-all
  *      in disguise;
  *   3. quantization + banding still FIND the float-truth neighbors:
  *      recall@5 vs the q26 float brute-force truth, floored at the same
  *      0.8 bar as the float LSH contract (q27).
  *
  * Measured (this corpus, r12): recall 0.92 @ sf0.01 AND @ sf0.1 — int8
  * quantization costs ≈nothing vs q27's float recall (0.88/0.94) at the
  * same 4-plane × 16-table knobs.
  */
class IntAnnSpec extends GraftSuite {

  private val dims = 64

  test("intQuantize is round-half-up fixed-point, exact on negatives") {
    val df = spark.createDataFrame(Seq(
      Tuple1(Seq(0.5f, -0.5f, 0.0037f, -0.0037f, 1.0f, -1.0f)))).toDF("v")
    val got = df.select(Similarity.intQuantize(col("v"), 127).as("q"))
      .collect()(0).getSeq[Long](0)
    // 0.5·127 = 63.5 → 64 (half up); -63.5 → floor(-63) = -63 (half toward
    // +inf — the ONE tie rule both engines share via floor(x + 0.5));
    // 0.0037·127 = 0.4699 → 0; ±1 → ±127
    assert(got == Seq(64L, -63L, 0L, 0L, 127L, -127L))
  }

  test("md5 plane weights: bounded, both signs, engine-portable derivation") {
    val span = 1000
    val ws = for (p <- 0 until 64; d <- 0 until dims)
      yield Similarity.md5PlaneWeight(p, d, span)
    assert(ws.forall(w => w >= -span && w <= span), "weight out of [-span, span]")
    assert(ws.exists(_ < 0) && ws.exists(_ > 0), "weights must carry both signs")
    assert(ws.distinct.size > 1000, "md5 weights must not collapse")
    // the derivation DuckDB reproduces: md5("0:0") = d8612c4... →
    // 0xd8612c40-ish first 8 hex chars % 2001 - 1000; recompute via an
    // independent path (java MessageDigest full-digest hex formatting)
    val md = java.security.MessageDigest.getInstance("MD5")
    val fullHex = md.digest("0:0".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val expect = java.lang.Long.parseLong(fullHex.substring(0, 8), 16) % 2001L - 1000L
    assert(Similarity.md5PlaneWeight(0, 0, span) == expect)
  }

  test("bucketing is real banding: corpus split across keys, candidates sub-exhaustive") {
    // sf0.01 — the driver-oracle corpus, so the fraction measured here is
    // the fraction the oracle actually exercises
    val embs = graft.sources.Readers.table(spark, sf.replace("0.001", "0.01"), "embeddings")
    val n = embs.count()
    val b = Similarity.intLshBuckets(embs, "vec_id", "embedding", 4, 16, dims, 127, 1000)
    // every vector lands in exactly one bucket per table
    val fanout = b.groupBy("vec_id").count().agg(min("count"), max("count")).collect()(0)
    assert(fanout.getLong(0) == 16 && fanout.getLong(1) == 16,
      "each vector must hash into exactly numTables buckets")
    val nBk = b.select("bk").distinct().count()
    assert(nBk > 16 * 4,
      s"banding must split the corpus (got $nBk distinct keys for 16 tables)")
    // candidate set strictly smaller than exhaustive: the oracle is
    // checking an approximate algorithm, not probe-all in disguise
    val keys = b.select(col("vec_id"), col("bk"))
    val cand = keys.filter(col("vec_id") < 10).withColumnRenamed("vec_id", "qid")
      .join(keys.withColumnRenamed("vec_id", "nid"), Seq("bk"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct().count()
    val exhaustive = 10L * (n - 1)
    info(f"candidates $cand of exhaustive $exhaustive (${cand.toDouble / exhaustive}%.2f)")
    // measured 0.64 at sf0.01: sign-LSH candidate
    // fractions on weakly-correlated embeddings are HIGH at recall-held
    // knobs — exactly q27's documented scale posture. The bar here is
    // structural, not a compression claim: strictly below exhaustive means
    // some pairs were EXCLUDED by banding, i.e. the oracle adjudicates a
    // genuinely approximate pipeline (and did: recall 0.92, not 1.0).
    assert(cand < (exhaustive * 9) / 10,
      s"candidate set must be sub-exhaustive ($cand vs $exhaustive pairs)")
  }

  test("recall@5 vs float brute-force truth >= 0.8 at sf0.01 and sf0.1") {
    for (sfDir <- Seq(sf.replace("0.001", "0.01"), sf.replace("0.001", "0.1"))) {
      val embs = graft.sources.Readers.table(spark, sfDir, "embeddings")
      val queries = embs.filter(col("vec_id") < 10)
      def top5(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = top5(Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", 5))
      assert(truth.size == 50)
      val got = top5(Similarity.intLshTopK(embs, queries, "vec_id", "embedding",
        5, 4, 16, dims))
      val recall = (got & truth).size.toDouble / truth.size
      info(f"$sfDir recall@5 = $recall%.3f")
      assert(recall >= 0.8, f"int-LSH recall $recall%.3f < 0.8 at $sfDir")
    }
  }
}
