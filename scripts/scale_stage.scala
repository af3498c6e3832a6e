// 10×-scale staged measurement (run: sbt Test/console < scripts/scale_stage.scala)
// Stages a dup-heavy 50k-doc corpus (10 id-shifted copies of sf0.1 documents —
// every doc sits in a 10-wide exact-dup clique, worst-case pair fan-out) and
// times the round-2 scale paths end-to-end with a noop sink (full column
// evaluation). Evidence recorded in SURVEY §5.
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational}

val s = graft.SparkTestBase.spark
import s.implicits._
s.sparkContext.setLogLevel("ERROR")

val base = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "documents").select($"doc_id", $"text", $"source", $"n_chars")
// NOTE: single line — the piped REPL treats a leading-dot line as a new statement
val staged = (0 until 10).map(i => base.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text", $"source", $"n_chars")).reduce(_ unionByName _).repartition(32).localCheckpoint()
println(s"staged docs: ${staged.count()}")

def time(name: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime()
  f
  println(f"[scale10x] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

time("exact dedup") { noop(Dedup.exact(staged, $"doc_id", $"text")) }

time("chunk-level firstOccurrence + rollup (q54 path)") {
  val chunk = 20; val stride = 10
  val toks = graft.functions.TextFns.tokens($"text")
  val nChunks = ceil(size(toks).cast("double") / stride).cast("long")
  val chunks = staged.select($"doc_id",
      explode(transform(sequence(lit(0L), nChunks - 1),
        i => struct(i.as("chunk_idx"),
          concat_ws(" ", slice(toks, (i * stride + 1).cast("int"), lit(chunk)))
            .as("chunk_text")))).as("c"))
    .select($"doc_id", $"c.chunk_idx", $"c.chunk_text")
  noop(Dedup.firstOccurrenceFlags(chunks, $"chunk_text", Seq($"doc_id", $"chunk_idx"))
    .groupBy($"doc_id").agg(count(lit(1)).as("n_chunks"),
      sum($"is_first".cast("long")).as("n_kept")))
}

time("prefixSum running total (q55 path, bucketWidth=4096)") {
  noop(Relational.prefixSum(
    staged.select($"doc_id", $"source", $"n_chars"),
    $"source", $"doc_id", $"n_chars", 4096L, "cum"))
}

time("capped LSH pairs (exact-first + maxBucketSize=1000, q23 path)") {
  val keepers = Dedup.exact(staged, $"doc_id", $"text")
    .select($"keeper_id".as("doc_id"))
  val uniq = staged.join(keepers, "doc_id")
  noop(Dedup.minhashLshPairs(uniq, $"doc_id", $"text", 3, 32, 4, 0.5,
    persistIndex = true, maxBucketSize = 1000L))
}

time("connectedComponents over sf0.1 near-dup pair graph (q39 core)") {
  val pairs = Dedup.ngramJaccardPairsCapped(base, $"doc_id", $"text", 3, 0.5,
    maxDocFreq = 50L, persistIndex = true)
  noop(Dedup.connectedComponents(pairs, "doc_a", "doc_b"))
}
sys.exit(0)
