package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The r9 sf10 sweep (SCALE_sf10.json) measured five queries timing out at
  * 100× bench scale — all routes through the uncapped-EXACT n-gram pair
  * contract (q22; q39/q57/q80 compose it; q87 is its containment form),
  * whose Θ(Σ_sh df²) candidate count is intrinsic on the vocab-degenerate
  * corpus. The stage functions here run the SCALE CONFIGURATION of each of
  * the four composite queries on the SAME /tmp/sf10 corpus — the knob a
  * 100 TB deployment turns, each a documented approximate/lower-bound
  * contract of the same library operators (no new code paths):
  *
  *  - q39-scale: connected components over q23's minhash-LSH pairs
  *    (est_jaccard >= 0.5) instead of exact-jaccard pairs.
  *  - q57-scale: the standing-index ingest with the
  *    `ngramJaccardAgainstIndex(maxDocFreq)` corpus-df fan-out guard.
  *  - q80-scale: the curation pipeline with stage 2's pair generator
  *    swapped to the same LSH configuration (stages 1/3/4 unchanged).
  *  - q87-scale: `ngramContainmentPairs` with its df cap engaged.
  *
  * Two consumers (judge r9 task 3): `sbt "Test/runMain graft.ScaleStageSf10
  * [sfDir]"` measures them under the sweep's session shape (evidence in
  * SURVEY §5), and [[ScaleSf10Spec]] runs the same functions as
  * corpus-gated CI assertions — wall budgets plus finding-invariants — so a
  * plan regression on the scale path fails `sbt test` whenever the corpus
  * exists instead of shipping silently between manual sweeps.
  */
object ScaleStageSf10 {

  private def docs(s: SparkSession, dir: String) =
    graft.sources.Readers.table(s, dir, "documents")

  /** q39-scale: the LSH pair graph IS the near-dup graph a 100 TB dedup
    * builds (q23's exact contract config, est >= the q39 threshold 0.5);
    * CC's O(log diameter) rounds then run over 10^4 edges, not 10^10.
    * Returns the component-row count.
    */
  def q39Scale(s: SparkSession, dir: String): Long = {
    val d = docs(s, dir)
    val keepers = Dedup.exact(d, col("doc_id"), col("text"))
      .select(col("keeper_id").as("doc_id"))
    val pairs = Dedup.minhashLshPairs(d.join(keepers, "doc_id"),
      col("doc_id"), col("text"), 3, 32, 4, 0.5, maxBucketSize = 100L)
    Dedup.connectedComponents(pairs, "doc_a", "doc_b").count()
  }

  /** q57-scale: same corpus/batch split and standing parquet index as the
    * contract query, plus the corpus-df cap (df <= 200 at 500k docs; on
    * this corpus every cross-doc shingle's df is in the thousands, so the
    * guard provably bounds the join at the cost of recall on
    * vocab-degenerate data — the documented lower-bound contract).
    */
  def q57Scale(s: SparkSession, dir: String): Long = {
    val d = docs(s, dir)
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_sf10_index")
    graft.sources.Writers.deleteRecursively(root)
    val path = root.resolve("corpus_shingle_index").toString
    graft.sources.Writers.writeSorted(
      Dedup.shingleIndex(d.filter(pmod(col("doc_id"), lit(10L)) =!= 7),
        col("doc_id"), col("text"), 3, idName = "corpus_id"),
      path, Seq("sh_h"), numFiles = 8)
    Dedup.ngramJaccardAgainstIndex(s.read.parquet(path),
      d.filter(pmod(col("doc_id"), lit(10L)) === 7),
      col("doc_id"), col("text"), 3, 0.5,
      persistIndex = true, maxDocFreq = 200L).count()
  }

  /** q80-scale: stage 2 (near-dup CC) runs on the LSH pair graph; exact
    * dedup, decontamination, and the gopher-style gate are the contract's
    * own stages — they were never the bottleneck (q21 1.4 s, q49 4.7 s,
    * q40 5.1 s standalone in the r9 sweep).
    */
  def q80Scale(s: SparkSession, dir: String): Long = {
    val d = docs(s, dir)
    val k1 = Dedup.exact(d, col("doc_id"), col("text"))
      .select(col("keeper_id").as("doc_id"))
    val d1 = d.join(k1, "doc_id")
    val pairs = Dedup.minhashLshPairs(d1, col("doc_id"), col("text"),
      3, 32, 4, 0.5, maxBucketSize = 100L)
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val d2 = d1.join(comp, d1("doc_id") === comp("node"), "left")
      .filter(col("node").isNull || col("component") === col("doc_id"))
      .drop("node", "component")
    val held = pmod(pmod(col("doc_id"), lit(100003L)) * 2654435761L, lit(100L)) >= 95
    val contaminated = Dedup.contaminationHits(d, col("doc_id"), col("text"), held, 3)
      .filter(col("n_hits") > 0).select(col("doc_id"))
    val d3 = d2.filter(!held).join(contaminated, Seq("doc_id"), "left_anti")
    val toks = graft.functions.TextFns.tokens(col("text"))
    val n = size(toks).cast("double")
    val meanLen = (length(trim(col("text"))).cast("double") - (n - 1)) / n
    val repetition = (n - size(array_distinct(toks)).cast("double")) / n
    d3.filter(meanLen.between(3.0, 10.0) && repetition < 0.6)
      .select(col("doc_id"), col("source")).count()
  }

  /** q87-scale: the containment cap was already a knob — engage it. */
  def q87Scale(s: SparkSession, dir: String): Long =
    Dedup.ngramContainmentPairs(docs(s, dir), col("doc_id"), col("text"),
      3, 0.8, maxDocFreq = 200L).count()

  def main(args: Array[String]): Unit = {
    // box lock like Bench/RunQueries/the generators (advisor r10): a manual
    // scale-stage run grinds local[cpus] for minutes and must not overlap —
    // and silently distort — a concurrent official bench record
    val boxLock = BoxLock.acquire("scalestage-sf10")
    // own session, NOT SparkTestBase's local[4]: timings must read against
    // the sweep's (RunQueries) session shape — SPARK_GRAFT_CPUS threads,
    // matching shuffle partitions, AQE on
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(dir)),
      s"$dir missing — run scripts/sweep_sf10.sh (or GenSf1 + GenSf10) first")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scaleSf10] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n rows")
    }
    // try/finally: a failed stage must still release the box lock (a
    // leaked hold blocks later benches in a resident sbt JVM)
    try {
      time("q39-scale: CC over minhash-LSH pairs (q23 knobs)")(q39Scale(s, dir))
      time("q57-scale: againstIndex with maxDocFreq=200")(q57Scale(s, dir))
      time("q80-scale: curation pipeline, LSH pair stage")(q80Scale(s, dir))
      time("q87-scale: containment pairs with maxDocFreq=200")(q87Scale(s, dir))
      s.stop()
    } finally boxLock.release()
  }
}
