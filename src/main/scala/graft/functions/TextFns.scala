package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for the LLM-data-pipeline operators (SURVEY §2b):
  * tokenization, shingling, quality ratios, language-ID heuristic,
  * rolling-hash fingerprint. All pure `functions._` composition (codegen'd) —
  * no UDFs in the hot path.
  */
object TextFns {

  /** Whitespace tokens of a single-spaced, trimmed document. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Regex tokens: alpha runs or digit runs (BPE-ish pre-tokenizer shape). */
  def regexTokens(text: Column): Column = regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0))

  /** Distinct word n-gram shingles ("a b c" strings). Empty array when the
    * document is shorter than n tokens.
    *
    * Built as n shifted `slice`s zipped together rather than a
    * `transform(sequence(...), i => slice(toks, i, n))` lambda: higher-order
    * lambdas are interpreted (no codegen) and re-evaluate any inlined
    * subexpression — including the tokenizing `split` — once per element,
    * turning shingling O(tokens²). The zip form evaluates `split` n times
    * per row and the lambda only concatenates scalars.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val m = size(toks) - (n - 1) // shingle count when size >= n
    val shifted = (0 until n).map(j => slice(toks, lit(j + 1), m))
    val joined = shifted.reduce((acc, p) => zip_with(acc, p, (x, y) => concat(x, lit(" "), y)))
    when(size(toks) >= n, array_distinct(joined))
      .otherwise(array().cast("array<string>"))
  }

  /** Adjacent-token bigram MULTISET ("a b" strings, one per position —
    * repeats kept, unlike the distinct [[shingles]]): the unit of BPE pair
    * counting and of repetition scoring. Empty array below 2 tokens.
    * Same shifted-slice zip as [[shingles]] (codegen-friendly, O(tokens)).
    */
  def bigrams(text: Column): Column = {
    val toks = tokens(text)
    val m = size(toks) - 1
    zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (x, y) => concat(x, lit(" "), y))
  }

  /** Ratio of non [a-z0-9 space] characters to total length. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double") / length(text).cast("double"))
      .otherwise(lit(0.0))

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(Stopwords.map(lit(_)): _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Tiny deterministic language-ID heuristic: marker-token voting.
    * Reproduced verbatim in the DuckDB oracle (q28).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    def hits(markers: Seq[String]): Column =
      size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))
    val en = hits(Seq("the", "a", "of"))
    val sqlish = hits(Seq("join", "filter", "window", "sort"))
    val dataish = hits(Seq("data", "row", "batch", "stream"))
    when(en >= sqlish && en >= dataish && en > 0, lit("en"))
      .when(sqlish >= dataish && sqlish > 0, lit("sqlish"))
      .when(dataish > 0, lit("dataish"))
      .otherwise(lit("unknown"))
  }

  /** Rolling polynomial hash fingerprint over characters:
    * fp = fold(acc * 31 + ascii(c)) mod 1e9+7. Composed REFERENCE
    * implementation (like `VecFns.cosine`): `aggregate` is a higher-order
    * function, interpreted per character over a one-string-per-character
    * array — the hot path is the bit-identical native
    * [[graft.plans.NativeFns.fingerprint]].
    */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, c) => pmod(acc * 31 + ascii(c).cast("long"), lit(1000000007L)))
}
