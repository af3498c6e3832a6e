package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** BPE merge training (Sennrich et al. 2016, arXiv:1508.07909) as a
  * distributed iterative operator — the learn-the-vocabulary step a
  * training-data pipeline runs corpus-wide (q45's pair counts are its
  * first iteration; this completes the loop).
  *
  * Scale shape: the CORPUS is read exactly once, to build the
  * word-frequency table (one hash-groupBy, the q37 exchange); every merge
  * iteration after that runs on the VOCABULARY table only — |distinct
  * words| rows regardless of corpus size, the reason BPE training is
  * tractable at 100 TB. Per round: one pair-explode + groupBy over the
  * vocab, one single-row TakeOrdered to the driver (the same
  * collect-the-tiny-model pattern as kmeansCentroids), one symbol-rewrite
  * projection (a fold over each word's symbol array — greedy left-to-right
  * merge, textbook semantics), and a localCheckpoint with explicit block
  * release to keep lineage flat across rounds.
  *
  * The merge-application (encode) side is deliberately NOT a corpus
  * operator here: applying N merge rules per document is a CPU-bound
  * per-row transform that production pipelines run in the data loader /
  * tokenizer; the distributed-value part is the corpus-scale counting this
  * operator does.
  */
object Bpe {

  /** Word-frequency vocabulary: one corpus pass, one hash-groupBy. */
  def wordFreq(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextFns.tokens(text)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right application of ONE merge (l, r) → l+r to a
    * symbol array, as a Catalyst fold (no UDF): walk the array keeping the
    * built prefix; when the prefix ends with `l` and the next symbol is
    * `r`, replace the tail with the merged symbol. A freshly merged symbol
    * is never reconsidered as a LEFT partner (acc's tail is then l+r,
    * which cannot equal l) — exactly the textbook non-overlapping scan.
    */
  private def applyMerge(symbols: Column, l: String, r: String): Column =
    when(size(symbols) < 2, symbols).otherwise(
      aggregate(
        slice(symbols, lit(2), size(symbols) - 1),
        slice(symbols, lit(1), lit(1)),
        (acc, x) =>
          when(element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(x)))))

  /** Learn up to `numMerges` merge rules from the corpus. Returns the
    * merge table (merge_rank, left, right, merged), rank 0 first — fewer
    * rows than `numMerges` when the vocabulary runs out of adjacent pairs.
    * Ties (equal pair count) resolve to the lexicographically smallest
    * (left, right), so training is deterministic across runs and
    * partitionings. Words are split to single characters plus the
    * conventional `</w>` end-of-word marker before the first round.
    */
  def bpeTrain(docs: DataFrame, text: Column, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    var vocab = wordFreq(docs, text)
      .select(col("freq"),
        concat(split(col("word"), ""), array(lit("</w>"))).as("symbols"))
      .localCheckpoint()
    var blocks: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String)]
    var exhausted = false
    for (rank <- 0 until numMerges if !exhausted) {
      // adjacent pairs with multiplicity, weighted by word frequency
      val pairs = vocab
        .select(col("freq"), explode(arrays_zip(
          slice(col("symbols"), lit(1), size(col("symbols")) - 1),
          slice(col("symbols"), lit(2), size(col("symbols")) - 1))).as("p"))
        .select(col("p.0").as("l"), col("p.1").as("r"), col("freq"))
        .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("cnt"))
      // TakeOrdered: one row reaches the driver, the vocab never moves
      val top = pairs.orderBy(col("cnt").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((rank, l, r, l + r))
        val (next, nextBlocks) = Checkpoints.tracked(
          vocab.withColumn("symbols", applyMerge(col("symbols"), l, r)))
        vocab = next
        Checkpoints.release(blocks)
        blocks = nextBlocks
      }
    }
    Checkpoints.release(blocks)
    // explicit schema (not Seq-of-tuple reflection): runtime ScalaReflection
    // breaks under REPL/spark-shell classloaders, and the merge table is the
    // operator's public result
    val schema = StructType(Seq(
      StructField("merge_rank", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false)))
    val rows = merges.toSeq.map { case (k, l, r, m) => Row(k, l, r, m) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
