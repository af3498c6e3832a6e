import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational, Scoring}
val s = graft.SparkTestBase.spark
import s.implicits._
s.sparkContext.setLogLevel("ERROR")
val base = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "documents").select($"doc_id", $"text", $"source", $"n_chars")
val staged = (0 until 10).map(i => base.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text", $"source", $"n_chars")).reduce(_ unionByName _).repartition(32).localCheckpoint()
println(s"staged docs: ${staged.count()}")
def time(name: String)(f: => Unit): Unit = { val t0 = System.nanoTime(); f; println(f"[scale10x] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s") }
def noop(df: org.apache.spark.sql.DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
time("minhash LSH single-job plan, cap 100 (q23 path)") { noop(Dedup.minhashLshPairs(staged, $"doc_id", $"text", 3, 32, 4, 0.5, maxBucketSize = 100L)) }
time("BM25 top-20 (q75 path)") { noop(Scoring.bm25TopK(staged, $"doc_id", $"text", Seq("hash", "join", "vector"), 20)) }
time("chargram dup profile n=20 (q76 path)") { noop(Dedup.charGramDupProfile(staged, $"doc_id", $"text", 20)) }
time("heavy hitters k=30 (q78 path)") { noop(Scoring.heavyHitters(staged, $"text", 30)) }
time("grouped length deciles (q79 path)") { noop(Relational.groupedQuantiles(staged, $"source", length($"text").cast("long"), (1 to 9).map(_ * 10))) }
time("per-source dup stats (q77 path)") { noop(Dedup.corpusDupStats(staged, $"source", $"doc_id", $"text")) }
sys.exit(0)
