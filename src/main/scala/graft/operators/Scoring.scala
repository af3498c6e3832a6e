package graft.operators

import graft.functions.TextFns
import graft.plans.NativeFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** [[scoreHashedLinear]] fused into one codegen'd walk per document
    * (native [[graft.plans.HashedLinearScore]]): the ≤ `numBuckets`-row
    * model collects to a DENSE weight array riding inside the expression
    * (−1 = absent bucket, preserving the inner-join semantics), replacing
    * the token explode + broadcast join + per-doc re-aggregation. Output
    * is column-for-column [[scoreHashedLinear]] (docs whose every token
    * falls in an absent bucket are absent; empty/all-space documents hash
    * their single empty token to bucket 0, as `split(trim, " ")` does) —
    * bit-parity spec-asserted on corpus + adversarial strings.
    */
  def scoreHashedLinearFused(docs: DataFrame, id: Column, text: Column,
                             model: DataFrame, numBuckets: Int): DataFrame = {
    val weights = Array.fill(numBuckets)(-1)
    model.select(col("bucket").cast("int"), col("weight").cast("int"))
      .collect().foreach { r =>
        val b = r.getInt(0)
        require(b >= 0 && b < numBuckets,
          s"model bucket $b outside [0, $numBuckets)")
        val w = r.getInt(1)
        // -1 is the absent-bucket sentinel inside the kernel: a negative
        // caller weight would silently become "bucket absent" and diverge
        // from the composed scorer — reject it loudly (trainHashedLinear
        // emits [0, 1000) by construction)
        require(w >= 0, s"fused scorer needs non-negative weights, bucket $b has $w")
        weights(b) = w
      }
    docs
      .select(id.as("_sid"),
        NativeFns.hashedLinearScore(text, weights).as("_s"))
      .select(col("_sid"), col("_s").getItem(0).as("n_tok"),
        col("_s").getItem(1).as("score_sum"))
      .filter(col("n_tok") > 0)
      .select(col("_sid"), col("n_tok"), col("score_sum"),
        (col("score_sum") * 2 > col("n_tok") * 1000).as("pred"))
  }

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

  /** [[trainCharBigramLm]] with the fused per-document bigram-count
    * kernel (native [[graft.plans.CharBigramCounts]]): the composed
    * trainer explodes one row per character position before its group-by;
    * the kernel folds within-document multiplicity in one UTF-8 walk, so
    * the Generate fan-out is the per-doc bigram VOCABULARY (and the
    * partial aggregation the group-by already does starts from
    * pre-collapsed rows). Emitted bigram strings are byte-identical to
    * `substr(text, i, 2)`, within-doc counts are exact (byte-compare on
    * hash hit) — the model table equals [[trainCharBigramLm]]'s row for
    * row, spec-asserted. Same aggregate-sized model, same oracle.
    */
  def trainCharBigramLmFused(docs: DataFrame, text: Column): DataFrame = {
    val counts = docs
      .select(explode(NativeFns.charBigramCounts(text)).as("bc"))
      .select(col("bc.bg").as("bg"), col("bc.cnt").as("c0"))
      .groupBy(col("bg")).agg(sum(col("c0")).as("c"))
    val prefix = counts
      .groupBy(substring(col("bg"), 1, 1).as("a")).agg(sum(col("c")).as("pc"))
    counts
      .join(broadcast(prefix), substring(col("bg"), 1, 1) === col("a"))
      .selectExpr("bg", "(1000 * c) div (pc + 1) as p_permille")
  }

  /** [[scoreCharBigramLm]] fused into ONE codegen'd corpus pass (native
    * [[graft.plans.CharLmScore]]): the composed pipeline explodes a row
    * per character position, broadcast-joins each bigram string to the
    * model, and re-aggregates per document — ~|text| rows of amplification
    * that the kernel replaces with a single UTF-8 walk per document,
    * binary-searching each bigram's in-place byte-range hash in the
    * broadcast model arrays. The model (≤ |charset|² rows by construction)
    * collects to the driver and rides inside the expression — the
    * routeToCells/kmeansCentroids tiny-model pattern at expression grain.
    * Output is column-for-column [[scoreCharBigramLm]] (docs with no
    * matched bigram absent, integer sum + floor-mean) — bit-parity
    * spec-asserted on the corpus and on adversarial unicode/whitespace
    * strings; the hash-keyed lookup carries the dedup family's documented
    * 2⁻⁶⁴ collision class. Measured 8.6× at 500k docs (227 s → 26.5 s
    * train+score, SURVEY §5).
    */
  def scoreCharBigramLmFused(docs: DataFrame, id: Column, text: Column,
                             model: DataFrame): DataFrame = {
    val rows = model.select(col("bg"), col("p_permille").cast("int")).collect()
    val pairs = rows.map { r =>
      val bg = org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))
      (graft.plans.ShingleOps.modelKey(bg), r.getInt(1))
    }.sortBy(_._1)
    require(pairs.map(_._1).distinct.length == pairs.length,
      "charLM model bigram hash collision (2^-64 class) — fall back to scoreCharBigramLm")
    val keys = pairs.map(_._1)
    val weights = pairs.map(_._2)
    docs
      .select(id.as("_sid"),
        graft.plans.NativeFns.charLmScore(text, keys, weights).as("_s"))
      .select(col("_sid"), col("_s").getItem(0).as("n_big"),
        col("_s").getItem(1).as("lm_sum"))
      .filter(col("n_big") > 0)
      .selectExpr("_sid", "n_big", "lm_sum", "lm_sum div n_big as avg_permille")
  }

  /** BM25 retrieval: global top-k documents for a bag of query terms —
    * the relevance-ranked corpus search a curation pipeline uses to pull
    * topic-targeted training slices ("find me the docs about X").
    *
    * Scale shape: the corpus is tokenized ONCE; non-query tokens are
    * filtered out BEFORE any aggregation, so the per-(doc, term) frequency
    * shuffle carries only matching rows. Corpus statistics (N, Σdl) and
    * per-term document frequencies are aggregate-sized and broadcast. The
    * final top-k is `TakeOrderedAndProject` — per-partition heaps, no
    * global sort.
    *
    * Exactness: with `logIdf = false` (the oracle-checked default) the
    * idf is the raw Robertson ratio (N − df + ½)/(df + ½) WITHOUT the
    * log — every quantity is derived from integers by exactly-rounded
    * IEEE +,−,×,÷ in a FIXED left-to-right term order, so the score is
    * bit-identical across engines and partitionings (transcendentals are
    * the one thing libms disagree on — see the all-integer house rule
    * above). `logIdf = true` gives the textbook BM25 idf
    * ln(1 + (N − df + ½)/(df + ½)) for production ranking quality, at the
    * cost of oracle exactness. Per-term contributions with tf = 0 vanish
    * arithmetically (0 numerator), so only matching docs rank.
    */
  def bm25TopK(docs: DataFrame, id: Column, text: Column, terms: Seq[String],
               k: Int, k1: Double = 1.2, b: Double = 0.75,
               logIdf: Boolean = false): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(terms.distinct.size == terms.size, "duplicate query terms would double-count")
    val toks = docs.select(id.as("doc_id"), TextFns.tokens(text).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val ex = toks.select(col("doc_id"), explode(col("toks")).as("token"))
      .filter(col("token").isin(terms: _*))
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      count_distinct(when(col("token") === t, col("doc_id"))).as(s"df_$i")
    }
    val dfs = ex.agg(dfAggs.head, dfAggs.tail: _*)
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, 1L).otherwise(0L)).as(s"tf_$i")
    }
    val tfs = ex.groupBy(col("doc_id")).agg(tfAggs.head, tfAggs.tail: _*)
    val scored = tfs.join(dl, "doc_id")
      .crossJoin(broadcast(stats)).crossJoin(broadcast(dfs))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i").cast("double")
      val dfd = col(s"df_$i").cast("double")
      val idfRaw = (col("n_docs").cast("double") - dfd + lit(0.5)) / (dfd + lit(0.5))
      val idf = if (logIdf) log(idfRaw + lit(1.0)) else idfRaw
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    val score = terms.indices.map(contrib).reduce(_ + _) // fixed left-to-right order
    scored
      .select(col("doc_id"), graft.functions.NumFns.roundHalfUp(score, 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Exact heavy hitters above the Misra–Gries threshold WITHOUT a
    * full-vocabulary shuffle — the two-pass sketch-then-recount pipeline:
    *
    * Pass 1: ONE aggregation computes the total token count and a
    * [[graft.plans.MisraGriesAgg]] candidate summary (≤ k entries per
    * partial — the only state that moves; a vocab groupBy would shuffle
    * every distinct token, which at 100 TB is itself corpus-scale).
    * Pass 2: a broadcast semi-join recounts ONLY the ≤ k candidates
    * exactly. The MG guarantee (every token with true frequency
    * > n/(k+1) survives any merge tree) plus the integer threshold
    * `cnt·(k+1) > n` make the output EXACTLY the set of tokens above the
    * threshold — partitioning-independent, hence oracle-checkable even
    * though the intermediate candidate set is not deterministic.
    */
  def heavyHitters(docs: DataFrame, text: Column, k: Int): DataFrame = {
    val toks = docs.select(explode(TextFns.tokens(text)).as("token"))
    val sketch = toks.agg(count(lit(1)).as("n"),
      graft.plans.HeavyHitters.misraGries(col("token"), k).as("cands"))
    val cands = sketch.select(col("n"), explode(col("cands")).as("token"))
    toks.join(broadcast(cands), "token")
      .groupBy(col("token"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit((k + 1).toLong) > col("n"))
      .select(col("token"), col("cnt"))
  }

  /** The fused [n_tokens, n_hits, n_terms] blocklist scan as a COLUMN —
    * the building block [[blocklistFilter]] projects and
    * [[blocklistKeep]] predicates over.
    */
  def blocklistHitsCol(text: Column, blocked: Seq[String]): Column = {
    require(blocked.nonEmpty, "empty blocklist filters nothing")
    require(blocked.forall(_.nonEmpty), "empty-string blocklist entry would match split()'s empty tokens")
    val words = blocked.distinct
      .map(org.apache.spark.unsafe.types.UTF8String.fromString)
      .map(w => (graft.plans.ShingleOps.modelKey(w), w))
      .sortBy(_._1).toArray
    NativeFns.blocklistHits(text, words.map(_._1), words.map(_._2))
  }

  /** The keep PREDICATE form of [[blocklistFilter]] — for pipelines (incl.
    * streaming ingest) that filter in place instead of materializing the
    * per-doc count table: one fused walk, stateless, usable directly in
    * `df.filter(...)` on a batch or streaming DataFrame.
    */
  def blocklistKeep(text: Column, blocked: Seq[String],
                    maxHitsPerMille: Int): Column = {
    val b = blocklistHitsCol(text, blocked)
    b.getItem(1) * 1000 <= lit(maxHitsPerMille.toLong) * b.getItem(0)
  }

  /** Blocklist (bad-word) document filter — the C4-style list-based
    * cleaner every web-corpus pipeline runs before model-based scoring:
    * per document, total whitespace tokens, blocked-token occurrences,
    * DISTINCT blocked terms matched, and a keep flag under an integer
    * per-mille rate threshold (`maxHitsPerMille = 0` is C4's drop-on-any-
    * occurrence rule; a rate lets common-word lists keep borderline docs).
    * All-integer, so the flag is bit-exact under any partitioning.
    *
    * Scale shape: the blocklist (hundreds of words) collects ONCE into the
    * fused [[graft.plans.BlocklistHits]] expression — hash-sorted parallel
    * arrays, binary-searched per token with byte-confirm — so scoring is
    * one codegen'd walk per document: no token explode, no join, no
    * shuffle at all beyond the scan itself. A 100 TB corpus filters in one
    * embarrassingly-parallel map pass.
    */
  def blocklistFilter(docs: DataFrame, id: Column, text: Column,
                      blocked: Seq[String], maxHitsPerMille: Int): DataFrame = {
    docs
      .select(id.as("doc_id"), blocklistHitsCol(text, blocked).as("_b"))
      .select(col("doc_id"),
        col("_b").getItem(0).as("n_tokens"),
        col("_b").getItem(1).as("n_hits"),
        col("_b").getItem(2).as("n_terms"))
      .withColumn("keep",
        col("n_hits") * 1000 <= lit(maxHitsPerMille.toLong) * col("n_tokens"))
  }

  /** Composed reference formulation of [[blocklistFilter]] (spec twin):
    * split + higher-order filter + array_distinct. Interpreted lambdas —
    * the fused kernel exists precisely to keep this off the hot path.
    */
  def blocklistFilterComposed(docs: DataFrame, id: Column, text: Column,
                              blocked: Seq[String],
                              maxHitsPerMille: Int): DataFrame = {
    val list = array(blocked.distinct.map(lit): _*)
    val toks = TextFns.tokens(text)
    val hits = filter(toks, t => array_contains(list, t))
    docs
      .select(id.as("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(hits).cast("long").as("n_hits"),
        size(array_distinct(hits)).cast("long").as("n_terms"))
      .withColumn("keep",
        col("n_hits") * 1000 <= lit(maxHitsPerMille.toLong) * col("n_tokens"))
  }

  /** The assembled quality gate — every filter family in ONE per-doc
    * verdict table: the q29 heuristic (length/punct/stopword product),
    * the q40 Gopher rules (mean word length + repetition), the q73
    * hashed-linear classifier (trained on `label`), and the q74
    * char-bigram LM — plus the conjunction `keep`. This is the table a
    * curation run actually materializes: per-filter flags make the
    * rejection REASON queryable (which gate fired), not just the verdict
    * (the q80 composition pattern applied to the scoring family).
    *
    * Documents a MODEL half cannot score (all-absent classifier buckets;
    * <2-char docs with no bigram) fail that gate conservatively — a
    * filter that cannot assess a doc must not pass it. Thresholds are a
    * rounded-double cut for the heuristic (its rounded score is
    * engine-exact) and integer per-mille cuts for both models, so every
    * flag is bit-exact under any partitioning.
    *
    * Scale shape: one rule-half map pass; two aggregate-sized models
    * (trained here — at 100 TB pass a sampled `docs` per the class doc)
    * each scoring in one fused corpus walk; two doc_id-keyed left joins.
    */
  def filterEnsemble(docs: DataFrame, id: Column, text: Column, label: Column,
                     minQuality: Double, clfMinPermille: Int,
                     lmMinPermille: Int): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("_t"), label.as("_y"))
    val toks = TextFns.tokens(col("_t"))
    val n = size(toks).cast("double")
    val punct = TextFns.punctRatio(col("_t"))
    val stopr = TextFns.stopwordRatio(col("_t"))
    val quality = graft.functions.NumFns.roundHalfUp(
      least(lit(1.0), n / 100.0) * (lit(1.0) - punct) * (lit(1.0) - lit(0.5) * stopr), 4)
    val meanLen = (length(trim(col("_t"))).cast("double") - (n - lit(1.0))) / n
    val repetition = (n - size(array_distinct(toks)).cast("double")) / n
    val rules = base.select(col("doc_id"),
      (quality >= minQuality).as("heur_pass"),
      (meanLen.between(3.0, 10.0) && repetition < 0.6).as("gopher_pass"))
    val clfModel = trainHashedLinear(base, col("_t"), col("_y"), numBuckets = 4096)
    val clf = scoreHashedLinearFused(base, col("doc_id"), col("_t"), clfModel, 4096)
      .select(col("_sid").as("doc_id"),
        (col("score_sum") >= lit(clfMinPermille.toLong) * col("n_tok")).as("clf_pass"))
    val lmModel = trainCharBigramLmFused(base, col("_t"))
    val lm = scoreCharBigramLmFused(base, col("doc_id"), col("_t"), lmModel)
      .select(col("_sid").as("doc_id"),
        (col("avg_permille") >= lmMinPermille).as("lm_pass"))
    rules
      .join(clf, Seq("doc_id"), "left")
      .join(lm, Seq("doc_id"), "left")
      .select(col("doc_id"), col("heur_pass"), col("gopher_pass"),
        coalesce(col("clf_pass"), lit(false)).as("clf_pass"),
        coalesce(col("lm_pass"), lit(false)).as("lm_pass"))
      .withColumn("keep",
        col("heur_pass") && col("gopher_pass") && col("clf_pass") && col("lm_pass"))
  }

  /** Per-source token-distribution DRIFT vs the whole corpus, as total
    * variation distance — the off-distribution-source detector a mix
    * audit runs (a source whose unigram distribution sits far from the
    * corpus is translated text, spam, or format garbage). TV is the
    * log-free divergence: TV(s) = ½·Σ_t |p_s(t) − p(t)| ∈ [0, 1] — unlike
    * KL it needs no smoothing for absent tokens and, crucially, its
    * numerator is INTEGER-EXACT: with counts c_st, c_t and totals n_s, N,
    *
    *   Σ_t |c_st·N − c_t·n_s|
    *     = Σ_{t∈s} |c_st·N − c_t·n_s| + (N·n_s − Σ_{t∈s} c_t·n_s)
    *
    * so the sum runs over PRESENT (source, token) pairs only — the
    * absent-token tail folds into two scalars — and accumulates in
    * DECIMAL (products reach c_t·n_s ~ 10²⁵ at 100 TB token counts, past
    * Long). One exact integer numerator and one exact integer denominator
    * (2·n_s·N) meet in a single double division + half-up round: bit-exact
    * under any partitioning, oracle-checkable.
    *
    * Scale shape: one corpus tokenize → (source, token) hash aggregation;
    * everything after runs on vocab-sized tables (per-token totals derive
    * from the pair counts — the corpus is scanned once).
    */
  def sourceDriftTV(docs: DataFrame, source: Column, text: Column): DataFrame =
    groupDriftTV(
      docs.select(source.as("src"), explode(TextFns.tokens(text)).as("tok")),
      col("src"), col("tok"))
      .select(col("grp").as("source"), col("n_items").as("n_tokens"), col("tv"))

  /** The TV-drift core over ANY (group, item) event table — the
    * [[sourceDriftTV]] arithmetic with the tokenize step factored out, so
    * the same integer-exact divergence audits any categorical
    * decomposition (per-cluster label balance — q95 — per-shard source
    * mix, ...). Output: (grp, n_items, tv).
    */
  def groupDriftTV(events: DataFrame, group: Column, item: Column): DataFrame =
    groupDriftTVFromCounts(
      events
        .select(lit(0L).as("part"), group.as("grp"), item.as("item"))
        .groupBy(col("part"), col("grp"), col("item"))
        .agg(count(lit(1)).as("c_st")))
      .drop("part")

  /** The TV core over PRE-AGGREGATED (part, grp, item, c_st) counts — one
    * independent drift table per `part` value. `part` is the seam the
    * STREAMING twin needs: a watermarked `groupBy(window, grp, item)`
    * count is the only stateful aggregation Structured Streaming allows in
    * one query, so the stream emits this exact counts relation (part =
    * window start) and this batch finisher turns each completed window
    * into its drift rows
    * ([[graft.streaming.DocsStream.windowedSourceTokenCounts]] →
    * [[graft.streaming.DocsStream.sourceDriftFromCounts]]; spec-asserted
    * equal to per-window [[groupDriftTV]] — exact DECIMAL arithmetic makes
    * the micro-batched and one-shot paths bit-identical).
    * Batch callers use [[groupDriftTV]], which runs everything as one part.
    */
  def groupDriftTVFromCounts(counts: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val st = counts.select(col("part"), col("grp"), col("item"), col("c_st"))
    // each aggregate branch re-aliases every column (fresh expression ids):
    // the three branches self-join st, and over some leaf plans (e.g. a
    // streaming memory-sink view) the analyzer cannot deduplicate the
    // conflicting references itself
    def fresh = st.select(col("part").as("part"), col("grp").as("grp"),
      col("item").as("item"), col("c_st").as("c_st"))
    val t = fresh.groupBy(col("part"), col("item")).agg(sum(col("c_st")).as("c_t"))
    val ns = fresh.groupBy(col("part"), col("grp")).agg(sum(col("c_st")).as("n_s"))
    val g = fresh.groupBy(col("part")).agg(sum(col("c_st")).as("n"))
    val parts = st
      .join(t, Seq("part", "item"))
      .join(broadcast(ns), Seq("part", "grp"))
      .join(broadcast(g), Seq("part"))
      .groupBy(col("part"), col("grp"), col("n_s"), col("n"))
      .agg(
        sum(abs(col("c_st").cast(dec) * col("n").cast(dec)
          - col("c_t").cast(dec) * col("n_s").cast(dec))).as("core"),
        sum(col("c_t").cast(dec) * col("n_s").cast(dec)).as("cover"))
    parts
      .select(col("part"), col("grp"), col("n_s").as("n_items"),
        graft.functions.NumFns.roundHalfUp(
          (col("core") + (col("n").cast(dec) * col("n_s").cast(dec) - col("cover")))
            .cast("double")
            / (lit(2L).cast(dec) * col("n_s").cast(dec) * col("n").cast(dec))
              .cast("double"),
          6).as("tv"))
  }

  /** Filter-threshold calibration curve: for every OBSERVED score value s,
    * how much survives the filter "keep docs with score >= s" — docs kept
    * and weight (tokens/chars/bytes) kept. Choosing a quality-filter
    * cutoff is a budget decision ("the 1.1T-token slice above X"); this is
    * the whole menu in one pass, for any integer-scored filter (q29
    * heuristic, q73 classifier, q74 LM — anything with a score column).
    * Output: (score, n_docs_at, n_docs_kept, weight_kept), one row per
    * distinct score; n_docs_kept/weight_kept are the >=-threshold
    * cumulative totals.
    *
    * Scale shape: the corpus collapses map-side into a (score, count,
    * weight-sum) histogram — one shuffle of |score domain| aggregate rows
    * (an integer per-mille filter has <= ~2000 of them). The descending
    * cumulative runs as a window over that HISTOGRAM, partitioned by the
    * [[Relational]] global-window-key idiom: bounded by the score domain,
    * not the corpus — the same aggregate-sized-window rule as q79/q82.
    * NULL scores (e.g. an LM score on an empty doc) are excluded — a
    * threshold filter can't keep them.
    */
  def thresholdSweep(scored: DataFrame, score: Column,
                     weight: Column): DataFrame = {
    val hist = scored.filter(score.isNotNull)
      .groupBy(score.as("score"))
      .agg(count(lit(1)).as("n_docs_at"), sum(weight).as("_w_at"))
    val w = Window.partitionBy(pmod(xxhash64(col("score")), lit(1L)))
      .orderBy(col("score").desc)
    hist
      .select(col("score"), col("n_docs_at"),
        sum(col("n_docs_at")).over(w).as("n_docs_kept"),
        sum(col("_w_at")).over(w).as("weight_kept"))
  }

  /** Unicode-script profile per document — the gate BEFORE language ID
    * (CCNet/ROOTS shape: a CJK or Cyrillic document must never reach a
    * Latin-ngram langid model, and mixed-script text is its own quality
    * signal). Counts per fixed script class (latin, cyrillic, greek,
    * arabic, hebrew, cjk incl. kana, hangul, digit, space) from ONE fused
    * codepoint walk ([[graft.plans.NativeExpressions.ScriptCounts]] — no
    * per-class regex passes, no JDK-Unicode-version dependence), "other"
    * by subtraction from the shared-walk `length(text)` contract, and
    * `dominant_script` = the first letter-class (fixed order above)
    * attaining the letter-class maximum, `'none'` when all are zero.
    * All-integer + a deterministic argmax ⇒ bit-exact under any
    * partitioning; one codegen'd map pass, no shuffle at all.
    */
  def scriptProfile(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val names = Seq("latin", "cyrillic", "greek", "arabic", "hebrew",
      "cjk", "hangul", "digit", "space")
    val sc = NativeFns.scriptCounts(coalesce(text, lit("")))
    val withCounts = docs
      .select(id.as("doc_id"), sc.as("_sc"),
        coalesce(length(text).cast("long"), lit(0L)).as("n_cp"))
      .select(col("doc_id") +: col("n_cp") +:
        names.zipWithIndex.map { case (nm, i) =>
          col("_sc").getItem(i).as(nm) }: _*)
    val letters = names.take(7)
    val maxL = greatest(letters.map(col): _*)
    withCounts
      .withColumn("other",
        col("n_cp") - names.map(col).reduce(_ + _))
      .withColumn("dominant_script",
        when(maxL === 0L, lit("none"))
          .otherwise(letters.foldRight(lit("none")) { (nm, rest) =>
            when(col(nm) === maxL, lit(nm)).otherwise(rest)
          }))
  }

  /** Phrase-pair association mining (q112): which word-`n`-gram phrases
    * co-occur in the same document far above chance — the collocation /
    * topic-seed statistic a curation run derives next to the per-source
    * distinctive terms (q61). Scored by INTEGER-EXACT lift
    * `floor(c_ab·N·10⁴ / (c_a·c_b))` rather than `log` PMI: BIGINT
    * arithmetic is bit-identical across engines (libm log differs at the
    * ulp and a rounding cut could flip top-k membership) and log is
    * monotone, so the lift ORDER is the PMI order.
    *
    * Scale posture: the df window [minDf, min(maxDf, N/2)] is the
    * load-bearing bound — sub-`minDf` terms are support noise, the head is
    * boilerplate, and the ABSOLUTE `maxDf` cap bounds every document's
    * pair fan-out by its genuinely-distinctive terms at ANY corpus size
    * (the q52 df-cap posture applied to pair mining; the relative N/2
    * guard alone stops binding as N grows — the first sf10 sweep measured
    * the uncapped window at 570 s where the 50-cap config runs in
    * seconds). `minSupport` prunes post-aggregation; the `topK` cut is
    * planned as TakeOrdered on the TOTAL order (lift, term_a, term_b) —
    * deterministic, no global sort. BIGINT headroom: c_ab·N·10⁴ stays
    * under 2⁶³ through N ≈ 10⁹ docs; a larger corpus upgrades lift to
    * DECIMAL(38,0).
    *
    * N (document count) enters the plan as a LITERAL, not a 1-row
    * broadcast relation: both its uses — the relative df guard and the
    * lift numerator — are scalar, so joining a 1-row aggregate (the r13
    * shape) planned two BroadcastNestedLoopJoins that tripped PlanSpec's
    * nested-loop gate for zero benefit. Pass `nDocs` (e.g. a memoized
    * corpus count — SparkEntry.docsCount) to keep the builder lazy;
    * otherwise the builder runs one count job up front (parquet
    * metadata-only at any scale).
    */
  def pmiPairs(docs: DataFrame, id: Column, text: Column, n: Int = 3,
               minDf: Long = 3L, maxDf: Long = 50L, minSupport: Long = 2L,
               topK: Int = 100, nDocs: Option[Long] = None,
               persistIndex: Boolean = false): DataFrame = {
    val nd = nDocs.getOrElse(docs.agg(count(lit(1))).head.getLong(0))
    val dfHi = math.min(maxDf, nd / 2)
    val term = docs.select(id.as("doc_id"),
      explode(TextFns.shingles(text, n)).as("term"))
    val vocab = term.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= dfHi)
    // tv is df-capped — at most dfHi rows per vocab term — so persisting it
    // is bounded at ANY corpus size. persistIndex=true shingles the corpus
    // ONCE and checkpoints tv before the self-join (the q23
    // persist-when-capped posture); false relies on the self-join's two
    // sides sharing one exchange (reuse) when both shuffle on doc_id — the
    // measured winner is recorded at the contract call site.
    val tvRaw = term.join(vocab, "term")
    val tv = if (persistIndex) tvRaw.persist() else tvRaw
    val result = tv.as("a").join(tv.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
      // df is functionally determined by term — max() reads it through
      // the aggregate without a second join against the df relation
      .agg(count(lit(1)).as("c_ab"),
        max(col("a.df")).as("c_a"), max(col("b.df")).as("c_b"))
      .filter(col("c_ab") >= minSupport)
      .select(col("term_a"), col("term_b"), col("c_ab"), col("c_a"), col("c_b"),
        expr(s"c_ab * ${nd}L * 10000L div (c_a * c_b)").as("lift"))
      .orderBy(col("lift").desc, col("term_a"), col("term_b"))
      .limit(topK)
    if (persistIndex) Dedup.materializeAndRelease(result, tv) else result
  }
}
