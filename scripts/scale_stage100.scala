// 100×-scale staged measurement (run: sbt Test/console < scripts/scale_stage100.scala)
// 500k docs as 100 id-shifted copies of sf0.1 — every doc in a 100-wide
// exact-dup clique. The point: the shipped q23 path (exact-dedup-first +
// band-bucket cap) collapses the cliques LINEARLY before any pairwise work,
// so the quadratic stage only ever sees unique docs. Keep statements
// one-line where fluent (piped REPL parses leading-dot lines as new
// statements).
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational}

val s = graft.SparkTestBase.spark
import s.implicits._
s.sparkContext.setLogLevel("ERROR")

val base = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "documents").select($"doc_id", $"text", $"source", $"n_chars")
val staged = (0 until 100).map(i => base.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text", $"source", $"n_chars")).reduce(_ unionByName _).repartition(64).localCheckpoint()
println(s"staged docs: ${staged.count()}")

def time(name: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime()
  f
  println(f"[scale100x] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

time("exact dedup (500k docs, 100-wide cliques)") { noop(Dedup.exact(staged, $"doc_id", $"text")) }

time("q23 path end-to-end: exact-first + capped LSH (maxBucketSize=1000)") {
  val keepers = Dedup.exact(staged, $"doc_id", $"text").select($"keeper_id".as("doc_id"))
  val uniq = staged.join(keepers, "doc_id")
  noop(Dedup.minhashLshPairs(uniq, $"doc_id", $"text", 3, 32, 4, 0.5, persistIndex = true, maxBucketSize = 1000L))
}

time("prefixSum running total (500k rows, bucketWidth=4096)") {
  noop(Relational.prefixSum(staged.select($"doc_id", $"source", $"n_chars"), $"source", $"doc_id", $"n_chars", 4096L, "cum"))
}

time("token-budget cap (q55 shape) on 500k rows") {
  val docs = staged.select($"doc_id", $"source", size(graft.functions.TextFns.tokens($"text")).cast("long").as("n_tok"))
  noop(Relational.prefixSum(docs, $"source", $"doc_id", $"n_tok", 4096L, "cum_tok").filter($"cum_tok" <= 80000L))
}

// 100 copies ⇒ every chunk's df is 100× its base df: with minDf=200 only
// chunks repeated >= 2× in the BASE corpus are boilerplate — the df
// groupBy and rebuild run over all 10M+ chunks either way
time("boilerplate strip (q72 shape, 10-token chunks, minDf=200) on 500k docs") {
  noop(Dedup.boilerplateStrip(staged, $"doc_id", $"text", 10, 200L))
}
sys.exit(0)
