package graft

import graft.operators.Scoring
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of q112's two tv-reuse postures at scale (judge r13 #2): the pair
  * self-join consumes the `tv` (term ⋈ vocab) subtree on BOTH sides.
  * `persistIndex = false` relies on the sides sharing one exchange
  * (Catalyst reuse — the q22/q23 measured posture at bench scale, where
  * persist's checkpoint barrier jobs cost more than they save);
  * `persistIndex = true` materializes tv once (bounded: ≤ maxDf rows per
  * vocab term at ANY corpus size) and checkpoints it before the self-join,
  * so the corpus is shingled exactly once regardless of what the planner
  * does. This stage times BOTH on the same corpus with the contract knobs
  * (maxDf 50, the capped config) and asserts the top-100 agrees; the
  * winner is recorded in §5/§6 and becomes the contract posture.
  *
  * Run: `sbt "Test/runMain graft.PmiAbSf10 [sfDir] [reps]"` (box-locked).
  */
object PmiAbSf10 {
  def main(args: Array[String]): Unit = {
    val boxLock = BoxLock.acquire("pmi-ab-sf10")
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
    val reps = if (args.length > 1) args(1).toInt else 2
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(dir)),
      s"corpus dir $dir missing")
    val docs = graft.sources.Readers.table(s, dir, "documents")
    val nd = docs.count()
    def run(persist: Boolean): (Double, Set[String]) = {
      def once(): (Double, Set[String]) = {
        s.catalog.clearCache()
        s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        val t0 = System.nanoTime()
        val rows = Scoring.pmiPairs(docs, col("doc_id"), col("text"),
            n = 3, minDf = 3L, maxDf = 50L, minSupport = 2L, topK = 100,
            nDocs = Some(nd), persistIndex = persist)
          .collect()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, rows.map(r => r.mkString("|")).toSet)
      }
      val runs = (1 to reps).map(_ => once())
      (runs.map(_._1).min, runs.head._2)
    }
    val (tReuse, rReuse) = run(persist = false)
    val (tPersist, rPersist) = run(persist = true)
    require(rReuse == rPersist,
      s"A/B results disagree: ${rReuse.size} vs ${rPersist.size} rows")
    println(f"PMIAB dir=$dir n_docs=$nd reps=$reps reuse_min_s=$tReuse%.2f persist_min_s=$tPersist%.2f rows=${rReuse.size}")
    boxLock.release()
    s.stop()
  }
}
