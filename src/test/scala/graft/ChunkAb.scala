package graft

import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B (round 11): inlined-split chunking vs materialized-tokens
  * chunking, interleaved in one session — decides whether the review-pass
  * "O(tokens²) re-tokenization" fix actually measures.
  */
object ChunkAb {
  private def chunksInline(docs: DataFrame, chunkTokens: Int): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val nChunks = ceil(size(toks).cast("double") / chunkTokens).cast("long")
    docs.select(col("doc_id"),
        explode(transform(sequence(lit(0L), nChunks - 1),
          i => struct(i.as("chunk_idx"),
            concat_ws(" ", slice(toks, (i * chunkTokens + 1).cast("int"),
              lit(chunkTokens))).as("chunk_text")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_text"))
  }

  private def chunksMat(docs: DataFrame, chunkTokens: Int): DataFrame = {
    val base = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("_toks"))
    val nChunks = ceil(size(col("_toks")).cast("double") / chunkTokens).cast("long")
    base.select(col("doc_id"),
        explode(transform(
          when(nChunks >= 1L, sequence(lit(0L), nChunks - 1))
            .otherwise(array().cast("array<bigint>")),
          i => struct(i.as("chunk_idx"),
            concat_ws(" ", slice(col("_toks"), (i * chunkTokens + 1).cast("int"),
              lit(chunkTokens))).as("chunk_text")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_text"))
  }

  def main(args: Array[String]): Unit = {
    val boxLock = BoxLock.acquire("chunk-ab")
    val s = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
      val docs = graft.sources.Readers.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      def time(name: String)(df: DataFrame): Long = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[chunk-ab] $name: $dt%.2f s")
        0L
      }
      // counts must agree (sanity)
      val a = chunksInline(docs, 10).count(); val b = chunksMat(docs, 10).count()
      require(a == b, s"row counts diverge: $a vs $b")
      println(s"[chunk-ab] rows: $a")
      for (rep <- 1 to 3) {
        time(s"rep $rep inline      ")(chunksInline(docs, 10))
        time(s"rep $rep materialized")(chunksMat(docs, 10))
      }
    } finally { s.stop(); boxLock.release() }
  }
}
