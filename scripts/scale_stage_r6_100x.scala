import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Scoring}
val s = graft.SparkTestBase.spark
import s.implicits._
s.sparkContext.setLogLevel("ERROR")
val base = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "documents").select($"doc_id", $"text", $"source", $"n_chars")
val staged = (0 until 100).map(i => base.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text", $"source", $"n_chars")).reduce(_ unionByName _).repartition(64).localCheckpoint()
println(s"staged docs: ${staged.count()}")
def time(name: String)(f: => Unit): Unit = { val t0 = System.nanoTime(); f; println(f"[scale100x] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s") }
def noop(df: org.apache.spark.sql.DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
time("exact-first + LSH cap 100 (q23 contract shape)") {
  val keepers = Dedup.exact(staged, $"doc_id", $"text").select($"keeper_id".as("doc_id"))
  noop(Dedup.minhashLshPairs(staged.join(keepers, "doc_id"), $"doc_id", $"text", 3, 32, 4, 0.5, maxBucketSize = 100L))
}
time("LSH cap 99 (cap prunes the 100-wide cliques)") { noop(Dedup.minhashLshPairs(staged, $"doc_id", $"text", 3, 32, 4, 0.5, maxBucketSize = 99L)) }
time("chargram dup profile n=20") { noop(Dedup.charGramDupProfile(staged, $"doc_id", $"text", 20)) }
time("heavy hitters k=30") { noop(Scoring.heavyHitters(staged, $"text", 30)) }
time("per-source dup stats") { noop(Dedup.corpusDupStats(staged, $"source", $"doc_id", $"text")) }
sys.exit(0)
