package graft

import graft.operators.Dedup
import graft.functions.HashFns
import graft.plans.NativeFns
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the two bucket-cap formulations at sf10 (judge r10 #4): the
  * window cap (`count() OVER (PARTITION BY bk)`) rides the band self-join's
  * own exchange but buffers each partition on one task — on the sf10 clone
  * corpus the largest band bucket is ~60,500 rows, exactly the adversarial
  * shape the cap guards against. The two-level form (hash-agg partial
  * counts → over-cap key set → LEFT ANTI join) never buffers a bucket but
  * pays one extra aggregate exchange. This stage times the FULL capped
  * pair pipeline (q23 contract knobs, cap 100 — the q39/q80 scale config)
  * under both forms on /tmp/sf10 and asserts the pair counts agree; the
  * winner is recorded in §5 and becomes the operator default.
  *
  * Run: `sbt "Test/runMain graft.CapAbSf10 [sf10Dir]"` (box-locked).
  */
object CapAbSf10 {

  /** The minhashLshPairs pipeline with the cap formulation pinned —
    * mirrors Dedup.minhashLshPairs(…, maxBucketSize = cap) stage for stage
    * so the timing difference is the cap form, nothing else.
    */
  private def cappedPairCount(docs: org.apache.spark.sql.DataFrame,
                              cap: Long, twoLevel: Boolean): Long = {
    val signed = docs
      .select(col("doc_id"), NativeFns.minhashText(col("text"), 3, 32).as("sig"))
      .filter(col("sig").isNotNull)
    val bandedRaw = signed
      .select(col("doc_id"), col("sig"),
        explode(HashFns.bandKeys(col("sig"), 32, 4)).as("bk"))
    val banded = Dedup.dropOverCapBuckets(bandedRaw, col("bk"), cap, twoLevel)
    banded.as("a")
      .join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(NativeFns.sigAgree(col("a.sig"), col("b.sig")), 4).as("est"))
      .filter(col("est") >= 0.5)
      .groupBy(col("doc_a"), col("doc_b")).agg(max(col("est")))
      .count()
  }

  def main(args: Array[String]): Unit = {
    val boxLock = BoxLock.acquire("cap-ab-sf10")
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
    val docs = graft.sources.Readers.table(s, dir, "documents")
    // keepers-first like the q39/q80 scale configs: exact dedup collapses
    // the clone families, the cap then guards what remains
    val keepers = Dedup.exact(docs, col("doc_id"), col("text"))
      .select(col("keeper_id").as("doc_id"))
    val d = docs.join(keepers, "doc_id")
    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[cap-ab] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n pairs")
      n
    }
    // try/finally: a failing equality require (or any stage failure) must
    // still release the box lock — a leaked hold blocks every later
    // bench/sweep in a resident sbt JVM for the full wait timeout
    try {
      // interleaved reps so one box-noise window cannot poison a form
      for (rep <- 1 to 3) {
        val w = time(s"rep $rep window   cap")(cappedPairCount(d, 100L, twoLevel = false))
        val t = time(s"rep $rep twoLevel cap")(cappedPairCount(d, 100L, twoLevel = true))
        require(w == t, s"formulations disagree: window=$w twoLevel=$t")
      }
      // the ADVERSARIAL shape (judge r10 #4's scenario): NO exact-first
      // collapse, so the clone families band into buckets up to ~60,500 wide
      // — the window form must buffer the widest bucket on one task before
      // its filter drops it; the two-level form never buffers
      for (rep <- 1 to 3) {
        val w = time(s"rep $rep RAW window   cap")(cappedPairCount(docs, 100L, twoLevel = false))
        val t = time(s"rep $rep RAW twoLevel cap")(cappedPairCount(docs, 100L, twoLevel = true))
        require(w == t, s"raw formulations disagree: window=$w twoLevel=$t")
      }
      s.stop()
    } finally boxLock.release()
  }
}
