package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}

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
  * The merge-application (encode) side runs at the VOCABULARY grain too
  * ([[encodeVocab]] / [[bpeEncode]]): each distinct word is encoded once
  * against the broadcast merge table and the result joins back to the
  * corpus on the word — per-document re-encoding would repeat the same
  * CPU-bound scan for every instance of "the". Applying N ranked merge
  * rules is an inherently iterative per-row transform with no Catalyst
  * builtin (the training-side fold works for ONE rule; chaining hundreds
  * explodes the expression tree past codegen limits), so encodeVocab is a
  * `mapPartitions` over the distinct-word table — the Multimodal rule:
  * imperative per-row logic only where no Expression can express it, and
  * never over the raw corpus.
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
    // tracked like the per-round checkpoints so round 0's release drops
    // the INITIAL vocab blocks too (previously left to the ContextCleaner)
    val (vocab0, blocks0) = Checkpoints.tracked(
      wordFreq(docs, text)
        .select(col("freq"),
          concat(split(col("word"), ""), array(lit("</w>"))).as("symbols")))
    var vocab = vocab0
    var blocks: Seq[org.apache.spark.rdd.RDD[_]] = blocks0
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

  /** [[applyMerge]]'s exact in-memory twin — one greedy left-to-right scan
    * applying the single merge (l, r) → l+r; a freshly merged symbol is
    * never reconsidered as a LEFT partner, same as the Catalyst fold.
    */
  private def applyMergeLocal(symbols: Array[String], l: String,
                              r: String): Array[String] = {
    if (symbols.length < 2) return symbols
    val out = scala.collection.mutable.ArrayBuffer[String](symbols(0))
    var i = 1
    while (i < symbols.length) {
      val x = symbols(i)
      if (out(out.length - 1) == l && x == r) out(out.length - 1) = l + r
      else out += x
      i += 1
    }
    out.toArray
  }

  /** Encode ONE word against ranked merge rules — the per-word kernel
    * [[encodeVocab]] applies at vocabulary grain, public so the streaming
    * ingest tokenizer can run the SAME scan per word instance (one
    * definition, so batch and stream cannot drift). Splits by CODEPOINT
    * (training's `split(word, "")` yields whole codepoints; a UTF-16
    * code-unit split would start non-BMP words from lone surrogates and
    * trained merges would never apply), appends `</w>`, then applies every
    * rule in rank order with the greedy left-to-right scan.
    */
  def encodeWord(word: String, rules: Array[(String, String)]): Array[String] = {
    var syms = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))) :+ "</w>"
    var i = 0
    while (i < rules.length) {
      syms = applyMergeLocal(syms, rules(i)._1, rules(i)._2)
      i += 1
    }
    syms
  }

  /** The ranked (left, right) rule array of a merge table — the ≤ numMerges
    * rows collected in rank order (the kmeansCentroids tiny-model pattern),
    * ready for [[encodeWord]] / broadcast.
    */
  def rankedRules(merges: DataFrame): Array[(String, String)] = merges
    .orderBy(col("merge_rank"))
    .select(col("left"), col("right"))
    .collect().map(r => (r.getString(0), r.getString(1)))

  private val encodedSchema = StructType(Seq(
    StructField("word", StringType, nullable = true),
    StructField("symbols", ArrayType(StringType, containsNull = false),
      nullable = true)))

  /** Encode each distinct word of `words` (column `word`) with a trained
    * merge table: split to characters + `</w>`, then apply every merge in
    * rank order with the same greedy left-to-right scan training used —
    * so for any word the TRAINING corpus contained, encode reproduces the
    * final training-vocabulary symbols exactly (spec-asserted). The merge
    * table collects to the driver and broadcasts: it is ≤ numMerges rows
    * by construction (the kmeansCentroids tiny-model pattern). Returns
    * (word, symbols).
    */
  def encodeVocab(words: DataFrame, merges: DataFrame): DataFrame = {
    val bc = words.sparkSession.sparkContext.broadcast(rankedRules(merges))
    val enc = org.apache.spark.sql.Encoders.row(encodedSchema)
    words.select(col("word").cast(StringType).as("word"))
      .filter(col("word").isNotNull).distinct()
      .mapPartitions { rows =>
        val ms = bc.value
        rows.map(row => Row(row.getString(0), encodeWord(row.getString(0), ms).toSeq))
      }(enc)
  }

  /** Corpus BPE tokenization profile under a trained merge table: per
    * document, whitespace words, BPE tokens, and the per-doc fertility
    * (tokens/word, the tokenizer-efficiency metric corpus audits track —
    * a language whose fertility is 2× pays 2× the context budget).
    * Returns (doc_id, n_words, n_tokens, fertility); empty documents get
    * (0, 0, NULL).
    *
    * Scale shape: the corpus explodes to (doc_id, word) and aggregates per
    * doc — the q37 exchange; the ENCODING work happens once per distinct
    * word in [[encodeVocab]] (vocab-sized, corpus-size-independent) and
    * joins back on the word, which AQE broadcasts when the vocabulary is
    * small.
    */
  def bpeEncode(docs: DataFrame, id: Column, text: Column,
                merges: DataFrame): DataFrame = {
    val words = docs.select(id.as("doc_id"),
        explode(TextFns.tokens(text)).as("word"))
      .filter(length(col("word")) > 0)
    val encoded = encodeVocab(words.select(col("word")), merges)
      .select(col("word"), size(col("symbols")).cast("long").as("_n_sym"))
    val perDoc = words.join(encoded, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("_n_sym")).as("n_tokens"))
    docs.select(id.as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(col("n_words") > 0, graft.functions.NumFns.roundHalfUp(
          col("n_tokens").cast("double") / col("n_words").cast("double"), 4))
          .as("fertility"))
  }
}
