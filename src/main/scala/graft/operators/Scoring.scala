package graft.operators

import graft.functions.TextFns
import graft.plans.NativeFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based corpus filters — the two scoring stages a modern
  * training-data pipeline runs after the rule-based cleaners: a hashed
  * bag-of-words linear classifier (the fastText-style quality/topic filter
  * popularized by DCLM and FineWeb-Edu: train on a labeled seed, score and
  * threshold the whole corpus) and a character-bigram language-model score
  * (the KenLM-perplexity filter shape from CCNet: score each document by
  * how probable its character sequence is under a corpus-trained model).
  *
  * Both are deliberately ALL-INTEGER pipelines: weights and probabilities
  * are per-mille integers (floor division), scores are integer sums, so
  * results are bit-exact under any partitioning / aggregation order and
  * hash-checkable against an independent SQL oracle (double summation is
  * order-dependent — see SURVEY §6 exactAvg).
  *
  * Scale shape: the MODEL in both cases is aggregate-sized (≤ numBuckets
  * rows / ≤ |charset|² rows), so scoring is one corpus pass with a
  * broadcast join — no corpus-sized shuffle beyond the training
  * count-aggregation itself, which is the q37 vocab exchange. At 100 TB
  * the train pass runs on a sample (pass a sampled `docs` to train);
  * scoring streams.
  */
object Scoring {

  /** Feature-hash a token to a bucket in [0, numBuckets): the native
    * rolling fingerprint (*31 mod 1e9+7, non-negative) mod numBuckets —
    * the hashing trick, reproducible in any engine from codepoints alone
    * (no dependence on an engine-private hash).
    */
  def tokenBucket(tok: Column, numBuckets: Int): Column =
    NativeFns.fingerprint(tok) % numBuckets

  /** Train per-bucket integer weights from a labeled corpus: weight =
    * (1000 * positives) div (total + 1) ∈ [0, 1000) — an add-one-smoothed
    * per-mille estimate of P(label | token hashes to bucket). One
    * explode + hash-groupBy over the training corpus; the result is the
    * model: at most `numBuckets` rows.
    */
  def trainHashedLinear(docs: DataFrame, text: Column, label: Column,
                        numBuckets: Int): DataFrame =
    docs
      .select(label.cast("long").as("y"),
        explode(TextFns.tokens(text)).as("tok"))
      .select(col("y"), tokenBucket(col("tok"), numBuckets).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(col("y")).as("pos"), count(lit(1)).as("tot"))
      // integer `div`, not `/`: exact at any count magnitude (a double
      // quotient loses integer exactness past 2^53 — reachable per-bucket
      // at 100 TB token counts)
      .selectExpr("bucket", "(1000 * pos) div (tot + 1) as weight")

  /** Score every document against a trained model: mean per-mille weight
    * of the document's hashed tokens, predicted positive when the mean
    * clears 500. One corpus pass; the model side of the join is
    * aggregate-sized and broadcast. Output: (id, n_tok, score_sum,
    * pred) — integer score so downstream thresholds are reproducible.
    *
    * The model join is INNER: scoring the training corpus (or any corpus
    * whose buckets the model covers — with numBuckets ≪ distinct tokens
    * every bucket is populated) drops nothing. For a model trained on a
    * disjoint sample, missing buckets mean zero evidence either way;
    * callers wanting explicit neutral smoothing can union the model with
    * default-weight rows.
    */
  def scoreHashedLinear(docs: DataFrame, id: Column, text: Column,
                        model: DataFrame, numBuckets: Int): DataFrame =
    docs
      .select(id.as("_sid"), explode(TextFns.tokens(text)).as("tok"))
      .select(col("_sid"), tokenBucket(col("tok"), numBuckets).as("bucket"))
      .join(broadcast(model), "bucket")
      .groupBy(col("_sid"))
      .agg(count(lit(1)).as("n_tok"), sum(col("weight")).as("score_sum"))
      .select(col("_sid"), col("n_tok"), col("score_sum"),
        (col("score_sum") * 2 > col("n_tok") * 1000).as("pred"))

  /** Character-bigram counts with positions exploded arithmetically
    * (sequence + substr — one corpus pass, no UDF, no per-char array
    * materialization). Documents shorter than 2 chars have no bigrams and
    * are excluded up front on both engine and oracle sides.
    */
  private def bigrams(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs
      .filter(length(text) >= 2)
      .select(id.as("_sid"), text.as("_t"))
      .select(col("_sid"), col("_t"),
        explode(sequence(lit(1), length(col("_t")) - 1)).as("_i"))
      .select(col("_sid"), substr(col("_t"), col("_i"), lit(2)).as("bg"))

  /** Train a character-bigram model: per-mille conditional probability
    * p(b | a) = (1000 * count(ab)) div (count(a·) + 1) for every observed
    * bigram. The model is ≤ |charset|² rows — aggregate-sized at any
    * corpus scale.
    */
  def trainCharBigramLm(docs: DataFrame, text: Column): DataFrame = {
    val counts = bigrams(docs, lit(0L), text)
      .groupBy(col("bg")).agg(count(lit(1)).as("c"))
    val prefix = counts
      .groupBy(substring(col("bg"), 1, 1).as("a")).agg(sum(col("c")).as("pc"))
    counts
      .join(broadcast(prefix), substring(col("bg"), 1, 1) === col("a"))
      .selectExpr("bg", "(1000 * c) div (pc + 1) as p_permille")
  }

  /** Score each document under a bigram model: integer sum and floor-mean
    * of the per-mille bigram probabilities — low means = improbable
    * character sequences, the rows a perplexity filter drops. Model side
    * broadcast; one corpus pass.
    */
  def scoreCharBigramLm(docs: DataFrame, id: Column, text: Column,
                        model: DataFrame): DataFrame =
    bigrams(docs, id, text)
      .join(broadcast(model), "bg")
      .groupBy(col("_sid"))
      .agg(count(lit(1)).as("n_big"), sum(col("p_permille")).as("lm_sum"))
      .selectExpr("_sid", "n_big", "lm_sum",
        "lm_sum div n_big as avg_permille")
}
