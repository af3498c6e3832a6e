package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Df-cap recall on a LONG-TAILED-df corpus (judge r9 task 4).
  *
  * The r9 sf10 sweep proved the df-cap family bounds COST, but on that
  * corpus's degenerate 31-token vocabulary every shingle's df is in the
  * thousands, so the cap drops ALL evidence — which left the family's
  * actual design claim unmeasured: on realistic text, where shingle
  * document frequency is zipf-distributed, near-dup pairs share many RARE
  * shingles, so capping the popular ones bounds the quadratic join while
  * the rare-shingle evidence keeps recall.
  *
  * Fixture: a deterministic 20k-doc corpus over a 10k-token zipf(s≈1)
  * vocabulary (rank = ceil(V^u) over a hashed uniform u — P(rank k) ∝ ~1/k,
  * fully codegen'd, no RNG), with two planted near-dup families per base
  * doc sample:
  *  - STRONG twins: 6 of 60 tokens replaced in one end block —
  *    trigram jaccard ≈ 0.76, far above the 0.5 threshold;
  *  - WEAK twins: 14 of 60 tokens replaced mid-doc — jaccard ≈ 0.55,
  *    sitting just above the threshold, where any evidence loss
  *    (cap-dropped shingles, minhash estimation noise) can push a pair
  *    under it. Chance cross-doc jaccard ≥ 0.5 between independent zipf
  *    docs is ≈ 0, so the uncapped operator's own output IS the ground
  *    truth each variant is measured against.
  *
  * Measured (this spec's info lines; quiet local[4]; table in SURVEY §5):
  * recall of q52 (capped jaccard), q57 (capped standing-index ingest) and
  * q87 (capped containment) at caps 50 and 200 vs their uncapped truths,
  * against q23-knob LSH recall on the same truth. The asserted floors pin
  * the design claim: on long-tailed text the cap keeps ≥95% of true pairs
  * at BOTH settings (the popular shingles it drops are exactly the ones
  * carrying no pair-discriminating evidence) while costing a bounded join;
  * LSH's banding estimate loses weak pairs the caps keep.
  *
  * Corpus-shape rule (documented in §5): choose the df CAP when shingle
  * df is long-tailed (real text — evidence survives, exact lower-bound
  * scores, no estimation noise); choose LSH banding when the vocabulary
  * is degenerate/templated (df uniformly huge — caps drop everything,
  * banding still buckets by signature), or compose them (q23's
  * exact-first + bucket cap) when both shapes coexist.
  */
class ZipfDfCapSpec extends GraftSuite {
  import spark.implicits._

  private val V = 10000   // vocabulary size
  private val L = 60      // tokens per document
  private val N = 20000L  // base documents
  private val TwinOff = 1000000L

  /** rank = ceil(V^u), u ∈ [0,1) hashed from (docId, pos, salt):
    * P(rank = k) = (ln k − ln(k−1)) / ln V ∝ ~1/k — the zipf(s≈1) sampler
    * as one codegen'd expression.
    */
  private def zipfToken(docId: org.apache.spark.sql.Column,
                        pos: org.apache.spark.sql.Column,
                        salt: String): org.apache.spark.sql.Column = {
    // sign-cleared 63-bit hash / 2^63 — a clean uniform in [0, 1)
    val u = (abs(xxhash64(docId, pos, lit(salt))) % lit(1000000007L))
      .cast("double") / lit(1000000007.0)
    concat(lit("t"), least(lit(V), greatest(lit(1),
      ceil(pow(lit(V.toDouble), u)))).cast("long"))
  }

  /** The corpus: N base docs; twins of every 40th base doc — strong twins
    * (replace the final 6-token block) under even twin ids, weak twins
    * (replace a middle 14-token block) under odd twin ids.
    */
  private lazy val corpus: DataFrame = {
    val base = spark.range(1, N + 1).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), lit(L)),
          p => zipfToken(col("doc_id"), p, "base"))))
    def twin(idOff: Long, replaceFrom: Int, replaceTo: Int) =
      spark.range(1, N + 1, 40).toDF("base_id")
        .select((col("base_id") + lit(idOff)).as("doc_id"), col("base_id"))
        .withColumn("text", concat_ws(" ",
          transform(sequence(lit(1), lit(L)), p =>
            when(p.between(replaceFrom, replaceTo),
              zipfToken(col("base_id"), p, s"twin$idOff"))
            .otherwise(zipfToken(col("base_id"), p, "base")))))
        .drop("base_id")
    base
      .unionByName(twin(TwinOff, 55, 60))      // strong: j ≈ 0.76
      .unionByName(twin(TwinOff + 1, 24, 37))  // weak:   j ≈ 0.55
  }

  private def pairSet(df: DataFrame, a: String = "doc_a", b: String = "doc_b") =
    df.select(col(a), col(b)).as[(Long, Long)].collect().toSet

  private def recall(got: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    if (truth.isEmpty) 0.0 else (got & truth).size.toDouble / truth.size

  test("df-cap keeps near-dup recall on a long-tailed corpus; LSH loses the weak tail") {
    val docs = corpus.persist()
    try {
      // the cap must actually ENGAGE: the zipf head's shingles exceed both
      // settings (else the measurement is vacuous — nothing was dropped)
      val dfHist = docs
        .select(explode(graft.plans.NativeFns.shingleHashes(col("text"), 3)).as("sh_h"))
        .groupBy(col("sh_h")).agg(count(lit(1)).as("df"))
        .agg(sum(when(col("df") > 200, 1L).otherwise(0L)),
          sum(when(col("df") > 50, 1L).otherwise(0L)), max(col("df"))).head()
      info(s"shingles over df 200: ${dfHist.getLong(0)}, over 50: ${dfHist.getLong(1)}, max df: ${dfHist.getLong(2)}")
      assert(dfHist.getLong(0) > 0, "zipf head too weak: no shingle exceeds df 200")

      // ---- q52 family: within-set jaccard ----
      val truth = pairSet(Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", 3, 0.5,
        persistIndex = true))
      val strong = truth.filter { case (a, b) => b == a + TwinOff }
      val weak = truth.filter { case (a, b) => b == a + TwinOff + 1 }
      info(s"uncapped truth: ${truth.size} pairs (${strong.size} strong, ${weak.size} weak, ${truth.size - strong.size - weak.size} other)")
      // the fixture only works if both families are really in the truth
      assert(strong.size >= 400 && weak.size >= 200,
        "planted twins missing from uncapped truth — fixture drifted")

      val r50 = recall(pairSet(Dedup.ngramJaccardPairsCapped(docs, $"doc_id", $"text",
        3, 0.5, maxDocFreq = 50L, persistIndex = true)), truth)
      val r200 = recall(pairSet(Dedup.ngramJaccardPairsCapped(docs, $"doc_id", $"text",
        3, 0.5, maxDocFreq = 200L, persistIndex = true)), truth)
      val lshPairs = pairSet(Dedup.minhashLshPairs(docs, $"doc_id", $"text",
        3, 32, 4, 0.5, persistIndex = true))
      val rLsh = recall(lshPairs, truth)
      val rLshWeak = recall(lshPairs, weak)
      info(f"q52 recall: cap50 $r50%.3f, cap200 $r200%.3f, LSH(32,4) $rLsh%.3f (weak-only $rLshWeak%.3f)")
      assert(r200 >= 0.95, f"cap 200 lost real-text evidence: recall $r200%.3f")
      assert(r50 >= 0.95, f"cap 50 lost real-text evidence: recall $r50%.3f")

      // ---- q57 family: cross-set standing-index ingest ----
      // twins arrive as the batch, everything else is the standing corpus:
      // every planted pair is a cross-set pair
      val isBatch = col("doc_id") >= TwinOff
      val index = Dedup.shingleIndex(docs.filter(!isBatch), $"doc_id", $"text",
        3, idName = "corpus_id")
      val batch = docs.filter(isBatch)
      def ingest(cap: Long) = pairSet(Dedup.ngramJaccardAgainstIndex(index, batch,
        $"doc_id", $"text", 3, 0.5, persistIndex = true, maxDocFreq = cap),
        "batch_id", "corpus_id")
      val truthX = ingest(Long.MaxValue)
      assert(truthX.size >= 600, "cross-set truth lost the planted twins")
      val rx50 = recall(ingest(50L), truthX)
      val rx200 = recall(ingest(200L), truthX)
      info(f"q57 recall: cap50 $rx50%.3f, cap200 $rx200%.3f (truth ${truthX.size} pairs)")
      assert(rx200 >= 0.95 && rx50 >= 0.95,
        f"standing-index cap lost real-text evidence: $rx50%.3f / $rx200%.3f")

      // ---- q87 family: containment ----
      def containment(cap: Long) = pairSet(Dedup.ngramContainmentPairs(docs,
        $"doc_id", $"text", 3, 0.6, maxDocFreq = cap))
      val truthC = containment(Long.MaxValue)
      assert(truthC.size >= 600, "containment truth lost the planted twins")
      val rc50 = recall(containment(50L), truthC)
      val rc200 = recall(containment(200L), truthC)
      info(f"q87 recall: cap50 $rc50%.3f, cap200 $rc200%.3f (truth ${truthC.size} pairs)")
      assert(rc200 >= 0.95 && rc50 >= 0.95,
        f"containment cap lost real-text evidence: $rc50%.3f / $rc200%.3f")
    } finally docs.unpersist()
  }
}
