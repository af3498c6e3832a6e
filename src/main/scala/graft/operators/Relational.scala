package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-derived relational operators (SURVEY §2a), expressed as
  * DataFrame → DataFrame transforms. Every operator is a declarative logical
  * plan: Catalyst handles pushdown/pruning; AQE handles runtime re-planning.
  */
object Relational {

  /** A single-partition window key for windows that are global BY DESIGN and
    * run on aggregate-sized input (#groups / #buckets / #keys rows, never the
    * corpus). Semantically identical to an empty partition spec — every row
    * hashes to the one partition the empty spec would also use — but it keeps
    * `partitionSpec` non-empty so WindowExec does not emit its
    * "No Partition Defined" warning (162 of them per bench run drowned the
    * round-4 output tail). A plain `lit(1)` would not survive: Spark 4's
    * `EliminateWindowPartitions` strips foldable partition keys — and
    * arithmetic zeros (`x * 0`, two-branch-equal CASE) get simplified to
    * literals first and stripped too (verified against 4.1.2). This uses
    * `pmod(xxhash64(c), 1)`: always 0 (pmod is non-negative), never null
    * (xxhash64 hashes NULL to the seed), and opaque to the simplifier — one
    * codegen'd hash per row of an already-tiny table.
    */
  private def globalWindowKey(c: Column): Column =
    pmod(xxhash64(c), lit(1L))

  /** Corpus-mix rebalancing by repeat factor ("epochs"): under-represented
    * groups (source/domain/language) are repeated up to `maxRepeat` times so
    * the training mix approaches uniform. Emits one row per (doc, epoch) via
    * `explode(sequence(...))` — deliberate row amplification, the inverse of
    * sampling.
    *
    * The group-count table has #groups rows: the max-share lookup is a
    * single-partition window over it (not over the corpus), and the weight
    * table is broadcast back onto the fact side — the corpus itself is
    * never shuffled.
    *
    * Docs with a NULL group are excluded by the equi-join — deliberate:
    * matches SQL join semantics (the oracle) and pandas dropna groupby;
    * assign a sentinel source upstream if NULL groups must participate.
    */
  def mixEpochs(docs: DataFrame, id: Column, grp: Column, maxRepeat: Int): DataFrame = {
    // maxRepeat = 0 would make n_rep 0 and sequence(1, 0) silently emit a
    // DESCENDING [1, 0] (Spark defaults the step to -1), i.e. a bogus epoch 0
    require(maxRepeat >= 1, s"maxRepeat must be >= 1, got $maxRepeat")
    val counts = docs.groupBy(grp.as("grp")).agg(count(lit(1)).as("n_grp"))
    val weights = counts
      .withColumn("max_n",
        max(col("n_grp")).over(Window.partitionBy(globalWindowKey(col("n_grp")))))
      .select(col("grp"),
        least(lit(maxRepeat.toLong), floor(col("max_n") / col("n_grp"))).cast("long")
          .as("n_rep"))
    docs.join(broadcast(weights), grp === weights("grp"))
      .select(id.as("doc_id"), col("grp"),
        explode(sequence(lit(1L), col("n_rep"))).as("epoch"))
  }

  /** "Interesting keys" — the reference's Reducing-Complexity CTE
    * (README.md:230-290): per-key aggregates → ntile(100) percentiles →
    * score + rank per group → keep rank 1 → semi-join back to the fact table.
    *
    * Scale note: the ntile windows are unpartitioned by construction (global
    * percentiles) but run on the *per-key aggregate* (cardinality = #keys,
    * not #facts), which fits one partition up to tens of millions of keys.
    * The join back broadcasts the tiny winner set.
    */
  def interestingKeys(
      facts: DataFrame, factKey: Column,
      perKeyAggs: DataFrame, // must contain: key, grp, m1, m2, m3
      minPct1: Int, minPct2: Int, minPct3: Int): DataFrame = {
    val byM1 = Window.partitionBy(globalWindowKey(col("key"))).orderBy(col("m1"), col("key"))
    val byM2 = Window.partitionBy(globalWindowKey(col("key"))).orderBy(col("m2"), col("key"))
    val byM3 = Window.partitionBy(globalWindowKey(col("key"))).orderBy(col("m3"), col("key"))
    val pct = perKeyAggs
      .withColumn("pct1", ntile(100).over(byM1).cast("long"))
      .withColumn("pct2", ntile(100).over(byM2).cast("long"))
      .withColumn("pct3", ntile(100).over(byM3).cast("long"))
    val ranked = pct
      .filter(col("pct1") > minPct1 && col("pct2") > minPct2 && col("pct3") > minPct3)
      .withColumn("score", col("pct1") + col("pct2") + col("pct3"))
      .withColumn("rnk",
        rank().over(Window.partitionBy(col("grp")).orderBy(col("score").desc, col("key")))
          .cast("long"))
      .filter(col("rnk") === 1)
    facts.join(broadcast(ranked.select(col("key"), col("score"), col("rnk"))),
      factKey === col("key"))
  }

  /** First-row-per-group lookup (reference zip→coordinate table,
    * README.md:560-580: `groupby('zip').latitude.rank(method='min')` keep
    * order==1): deterministic representative row per group via row_number.
    */
  def firstPerGroup(df: DataFrame, group: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("_rn", row_number().over(Window.partitionBy(group: _*).orderBy(order: _*)))
      .filter(col("_rn") === 1)
      .drop("_rn")

  /** Top-N per group (reference: rank=1 station per hood; min-bike ranking in
    * citibike_ck.ipynb). Emits `rn` 1..n.
    */
  def topNPerGroup(df: DataFrame, group: Seq[Column], order: Seq[Column], n: Int): DataFrame =
    df.withColumn("rn", row_number().over(Window.partitionBy(group: _*).orderBy(order: _*)).cast("long"))
      .filter(col("rn") <= n)

  /** [[topNPerGroup]] for LOW-CARDINALITY groups — the 100 TB variant.
    * With a handful of groups (sources, languages, splits), a single window
    * sorts corpus/|groups| rows per partition: group count, not data size,
    * bounds the parallelism. Pre-pruning per (group, salt) first keeps only
    * salt-bucket top-n survivors, so the final per-group sort sees at most
    * `buckets`·n rows. Results are IDENTICAL to [[topNPerGroup]]
    * (spec-asserted): a group-wide top-n row is top-n within its salt
    * bucket, so the prune can never drop one. `saltBy` must be a
    * deterministic per-row expression (e.g. a key column) so reruns agree.
    */
  def topNPerGroupSalted(df: DataFrame, group: Seq[Column], order: Seq[Column],
                         n: Int, saltBy: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val pruned = topNPerGroup(df.withColumn("_salt", pmod(saltBy, lit(buckets.toLong))),
        group :+ col("_salt"), order, n)
      .drop("rn", "_salt")
    topNPerGroup(pruned, group, order, n)
  }

  /** Missing-data repair (reference "Fixing the missing weather issue",
    * README.md:440-905): split facts into clean/broken on a predicate, strip
    * the broken measure, left-join a fix table on the repair key, union back,
    * de-duplicate. The fix table is small (per-hour aggregates) → broadcast.
    */
  def repairUnion(
      facts: DataFrame, broken: Column,
      fixTable: DataFrame, joinKeys: Seq[String],
      measure: String, fixedMeasure: String): DataFrame = {
    // a NULL predicate must not lose the row (filter(p) and filter(!p) would
    // BOTH exclude it): treat undecidable as not-broken and keep it observed
    val isBroken = coalesce(broken, lit(false))
    val clean = facts.filter(!isBroken)
      .withColumn("src", lit("observed"))
    val repaired = facts.filter(isBroken)
      .drop(measure)
      .join(broadcast(fixTable), joinKeys, "left")
      .withColumn(measure, col(fixedMeasure))
      .drop(fixedMeasure)
      .withColumn("src", lit("fixed"))
    clean.select(repaired.columns.map(col).toIndexedSeq: _*)
      .unionByName(repaired)
      .dropDuplicates()
  }

  /** Per-(key, date) flag rollup joined back to facts (reference rainy_day:
    * README.md:1640-1700 `groupby(['station_id','date'])['is_raining'].max()`
    * then merge). The rollup shuffles once on (key, date); the join reuses
    * that partitioning.
    *
    * NULL-key/date rows are excluded by the equi-join — deliberate: this
    * matches SQL join semantics (the DuckDB oracle) and the reference's
    * pandas groupby, which drops NaN groups by default.
    */
  def flagRollupJoin(facts: DataFrame, key: Column, date: Column, flag: Column,
                     flagName: String): DataFrame = {
    val rollup = facts
      .groupBy(key.as("k"), date.as("d"))
      // null flags (null measure) count as false, matching SQL CASE semantics
      .agg(max(coalesce(flag.cast("long"), lit(0L))).as(flagName))
    facts.join(rollup, key === col("k") && date === col("d")).drop("k", "d")
  }

  /** SCD-latest / upsert collapse (reference stations_static insert-or-update:
    * README.md "Stations-Static"): keep the most recent version per key.
    */
  def latestPerKey(df: DataFrame, key: Seq[Column], version: Seq[Column]): DataFrame =
    firstPerGroup(df, key, version.map(_.desc))

  /** Skew-mitigating equi-join: the fact side's hot keys are split across
    * `salts` sub-keys (deterministic hash of `saltSource`), and the dim side
    * is replicated once per salt — so a key with 10⁹ fact rows lands on
    * `salts` reducers instead of one. Result rows are identical to the plain
    * join. (AQE's skew handling covers sort-merge joins; explicit salting is
    * the portable fallback and the classic 100 TB recipe.)
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    // salts=0 would be SILENTLY empty: pmod-by-zero NULLs every fact salt
    // while sequence(0, -1) emits a descending dim range (the
    // sequence-default-step trap mixEpochs documents)
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedFacts = facts.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)))
    val saltedDim = dim
      .withColumn("_salt", explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedFacts.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Scale fallback for [[interestingKeys]] when the per-key aggregate is too
    * large for a single-partition ntile window (≳10⁷ keys): selection via
    * distributed `approx_percentile` thresholds (one tiny broadcast) instead
    * of exact global percentile ranks, then the same rank-1-per-group pick.
    */
  def interestingKeysApprox(perKeyAggs: DataFrame,
                            q1: Double, q2: Double, q3: Double): DataFrame = {
    val th = perKeyAggs.agg(
      expr(s"approx_percentile(m1, $q1)").as("t1"),
      expr(s"approx_percentile(m2, $q2)").as("t2"),
      expr(s"approx_percentile(m3, $q3)").as("t3"))
    perKeyAggs.crossJoin(broadcast(th))
      .filter(col("m1") > col("t1") && col("m2") > col("t2") && col("m3") > col("t3"))
      .withColumn("rnk",
        rank().over(Window.partitionBy(col("grp"))
          .orderBy(col("m1").desc, col("key"))).cast("long"))
      .filter(col("rnk") === 1)
      .drop("t1", "t2", "t3")
  }

  /** Distributed running total (prefix scan) per `part` group, ordered by a
    * numeric `ord` — the scale-correct form of
    * `sum(w) OVER (PARTITION BY part ORDER BY ord)`.
    *
    * A plain window puts each group in ONE sorted partition, so a dominant
    * group (one source holding half a 100 TB corpus) serializes on a single
    * task. This runs the classic two-level scan instead: (1) per-(part,
    * bucket) sums, bucket = floor(ord / bucketWidth) — one balanced
    * shuffle; (2) exclusive cumulative offsets across buckets — a window
    * over the tiny #buckets×#parts table; (3) join the offsets back and
    * run the intra-bucket running sum — a window whose partitions are
    * bounded by bucketWidth rows, regardless of group skew.
    *
    * Rows are unchanged; `cumName` holds the inclusive running total.
    * `ord` must be unique within `part` for a well-defined total order
    * (same requirement the plain window has).
    */
  def prefixSum(df: DataFrame, part: Column, ord: Column, weight: Column,
                bucketWidth: Long, cumName: String = "cum"): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    // the scheme is exact only for INTEGRAL weights (a double weight would
    // also make the two-level sum order-sensitive); the long cast below
    // would silently truncate 0.7 -> 0 — reject fractional types loudly
    val wType = df.select(weight).schema.head.dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(wType),
      s"prefixSum needs an integral weight column, got $wType — " +
        "pre-scale fractional weights to integers (e.g. per-mille)")
    val b = df.withColumn("_bkt", floor(ord / lit(bucketWidth)).cast("long"))
    val bucketSums = b.groupBy(part.as("_p"), col("_bkt").as("_obkt"))
      .agg(sum(weight.cast("long")).as("_bsum"))
    val offsets = bucketSums
      .withColumn("_off",
        sum(col("_bsum")).over(Window.partitionBy(col("_p")).orderBy(col("_obkt")))
          - col("_bsum"))
      .select(col("_p"), col("_obkt"), col("_off"))
    // null-SAFE equality: the plain window groups NULL part values together,
    // and `===` would silently drop every NULL-part row from the inner join
    b.join(offsets, part <=> col("_p") && col("_bkt") <=> col("_obkt"))
      .withColumn(cumName,
        col("_off") + sum(weight.cast("long"))
          .over(Window.partitionBy(part, col("_bkt")).orderBy(ord)))
      .drop("_bkt", "_p", "_obkt", "_off")
  }

  /** Deterministic global order index — the distributed form of
    * `row_number() OVER (ORDER BY primary, tiebreak*) - 1`, the "shuffle the
    * corpus into a reproducible training order" primitive. A plain
    * unpartitioned window moves the whole corpus to ONE sorted task; this
    * runs the two-level scheme instead: (1) bucket rows on
    * `floor(primary / bucketWidth)` — bucket ranges partition the order
    * space monotonically; (2) per-bucket row counts → exclusive offsets, a
    * window over the tiny #buckets table; (3) intra-bucket row_number
    * (partitions bounded by the rows per `bucketWidth` of primary-key
    * space) plus the bucket offset. `primary` must be a non-negative
    * numeric expression (e.g. a hash — hashing gives the pseudo-random
    * training order); (primary, tiebreak*) must be unique per row for a
    * well-defined order. Result column `name` is 0-based.
    */
  def globalOrderIndex(df: DataFrame, primary: Column, tiebreak: Seq[Column],
                       bucketWidth: Long, name: String = "seq"): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val b = df.withColumn("_bkt", floor(primary / lit(bucketWidth)).cast("long"))
    val counts = b.groupBy(col("_bkt").as("_obkt")).agg(count(lit(1)).as("_c"))
    val offsets = counts
      .withColumn("_off",
        sum(col("_c")).over(
          Window.partitionBy(globalWindowKey(col("_obkt"))).orderBy(col("_obkt")))
          - col("_c"))
      .select(col("_obkt"), col("_off"))
    b.join(offsets, col("_bkt") === col("_obkt"))
      .withColumn(name,
        col("_off") - 1L + row_number()
          .over(Window.partitionBy(col("_bkt")).orderBy(primary +: tiebreak: _*))
          .cast("long"))
      .drop("_bkt", "_obkt", "_off")
  }

  /** Null-rate / distinct profile per column (reference df.info() checks).
    * One pass over the data: all per-column aggregates in a single projection,
    * then unpivoted via stack — never one job per column.
    */
  def qualityProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nonnull"),
        count_distinct(col(c)).as(s"${c}__distinct"))
    }
    val total = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // stack() is assembled from raw column names: backtick-quote the
    // identifiers (spaces/dots would fail analysis) and escape quotes in
    // the label literal (a name containing ' would break out of it)
    def ident(c: String): String = "`" + c.replace("`", "``") + "`"
    def strLit(c: String): String = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stackExpr = cols
      .map(c => s"${strLit(c)}, ${ident(c + "__nonnull")}, ${ident(c + "__distinct")}")
      .mkString(", ")
    total.selectExpr("__n",
        s"stack(${cols.size}, $stackExpr) as (column_name, n_nonnull, n_distinct)")
      .select(col("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col("n_nonnull")).as("n_null"),
        col("n_distinct"))
  }

  /** EXACT per-group quantiles of a numeric column, as a value histogram —
    * the distributed shape that needs no per-group sort: the corpus
    * collapses to an aggregate-sized (group, value, count) table in ONE
    * shuffle, cumulative counts run over that table, and the pct-quantile
    * is the least value whose cumulative count reaches rank
    * ceil(pct·n/100). All-integer rank arithmetic ((pct·n + 99) div 100),
    * so results are engine-exact — unlike interpolated `percentile`, whose
    * lerp is a libm-shaped portability trap.
    *
    * The cumulative count is TWO-LEVEL (round 7): a single per-group
    * window would sort a group's whole distinct-value histogram on one
    * task — fine for q79's token lengths (~10³ distinct), a serial
    * bottleneck for near-continuous measures (a price column at sf0.1
    * already holds ~10⁵ distinct doubles; at 100 TB, billions). Instead:
    * (1) each distinct value gets an ORDER-PRESERVING range bucket
    * (`numBuckets` equal value-spans between the group's min and max —
    * the bucketing only has to be monotone, never exact, because the
    * final answer is still the exact least-value-reaching-rank); (2)
    * per-(group, bucket) count sums → exclusive offsets, a window over
    * ≤ numBuckets rows per group; (3) the intra-bucket cumulative window,
    * whose partitions hold only that bucket's distinct values. Bucket
    * population is bounded under roughly-uniform value spread (outlier-
    * stretched ranges degrade toward fewer effective buckets, never
    * toward wrong answers; raise numBuckets for heavy-tailed measures).
    *
    * `pcts` are integer percents (e.g. 10..90 by 10 for deciles).
    */
  def groupedQuantiles(df: DataFrame, group: Column, value: Column,
                       pcts: Seq[Int], numBuckets: Int = 1024): DataFrame = {
    // NULL values carry no rank: without this filter a null `value` row
    // survives the histogram groupBy, the window's orderBy sorts nulls
    // FIRST, and every cumulative count (hence every quantile) for that
    // group shifts down. Matches SQL percentile functions, which ignore
    // nulls. NaN is excluded for the same reason PLUS a scale hazard: a
    // NaN max makes the bucket span NaN, collapsing the whole group's
    // histogram into bucket 0 — the single-task window the scheme exists
    // to avoid (pandas quantile drops NaN too; the double cast makes the
    // check a no-op for integral values).
    val hist = df.filter(value.isNotNull && !isnan(value.cast("double")))
      .groupBy(group.as("g"), value.as("v"))
      .agg(count(lit(1)).as("cnt"))
    groupedQuantilesFromHist(hist, pcts, numBuckets)
  }

  /** [[groupedQuantiles]] over a PRE-AGGREGATED value histogram — columns
    * (g, v, cnt), one row per (group, distinct value), non-null values.
    * Callers that already hold the histogram (e.g. [[describeProfile]],
    * which derives its moments from the same relation) skip the second
    * corpus pass.
    */
  def groupedQuantilesFromHist(hist: DataFrame, pcts: Seq[Int],
                               numBuckets: Int = 1024): DataFrame =
    groupedQuantilesFromHist(hist,
      hist.groupBy(col("g"))
        .agg(sum(col("cnt")).as("n"),
          min(col("v")).as("_vmin"), max(col("v")).as("_vmax")),
      pcts, numBuckets)

  /** Same, with the per-group (n, _vmin, _vmax) stats PRECOMPUTED — for
    * callers whose own aggregate already holds them ([[describeProfile]]'s
    * moment rollup): the histogram then feeds one fewer aggregation.
    */
  def groupedQuantilesFromHist(hist: DataFrame, stats: DataFrame,
                               pcts: Seq[Int], numBuckets: Int): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in 1..100, got $pcts")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val span = col("_vmax").cast("double") - col("_vmin").cast("double")
    val withB = hist.join(broadcast(stats.select(col("g").as("_sg"),
        col("_vmin"), col("_vmax"))), col("g") <=> col("_sg"))
      .withColumn("_bkt",
        when(span <= 0.0, lit(0L)).otherwise(least(
          floor((col("v").cast("double") - col("_vmin").cast("double"))
            / (span / numBuckets)).cast("long"),
          lit(numBuckets - 1L))))
      .select(col("g"), col("v"), col("cnt"), col("_bkt"))
    val bucketSums = withB.groupBy(col("g").as("_og"), col("_bkt").as("_obkt"))
      .agg(sum(col("cnt")).as("_bsum"))
    val offsets = bucketSums
      .withColumn("_off",
        sum(col("_bsum")).over(Window.partitionBy(col("_og")).orderBy(col("_obkt")))
          - col("_bsum"))
      .select(col("_og"), col("_obkt"), col("_bsum"), col("_off"))
    val targets = stats.select(col("g").as("_tg"), col("n"),
      explode(array(pcts.map(lit(_)): _*)).as("pct"))
      .withColumn("r", expr("(CAST(pct AS BIGINT) * n + 99) DIV 100"))
    // r14 (guide §2.3/§1.2): the old chain ran the cumulative window over
    // the WHOLE histogram (every (g, bucket) partition sorted) and only
    // then filtered to the target ranks. The rank's bucket is already
    // decided by the aggregate-sized offsets table — _off < r <= _off +
    // _bsum picks exactly one non-empty bucket per (g, pct) — so locate it
    // there, then sort ONLY the target buckets' histogram rows (≤ #pcts
    // buckets per group instead of all of them; the histogram-wide sort
    // disappears). Exact type-1 quantile semantics are unchanged: least v
    // with global cumulative count ≥ r, ties and duplicates included.
    val tbkt = targets
      .join(offsets, col("_tg") <=> col("_og")
        && col("r") > col("_off") && col("r") <= col("_off") + col("_bsum"))
      .select(col("_tg"), col("pct"), col("r"), col("_obkt").as("_tbkt"),
        col("_off").as("_toff"))
    // null-SAFE like every join above it: a NULL group key is a real
    // group (SQL GROUP BY semantics) — a plain equality join here would
    // silently drop it after the whole bucketing chain carried it
    withB
      .join(tbkt, col("g") <=> col("_tg") && col("_bkt") === col("_tbkt"))
      .withColumn("_cum",
        col("_toff") + sum(col("cnt")).over(
          Window.partitionBy(col("g"), col("pct")).orderBy(col("v"))))
      .filter(col("_cum") >= col("r"))
      .groupBy(col("g"), col("pct"))
      .agg(min(col("v")).as("value"))
  }

  /** pandas `describe()`-parity numeric profile: one row per named column
    * with (n, mean, stddev, min, q25, median, q75, max) — the per-column EDA
    * summary the reference notebooks open with (CitiBike-1.ipynb
    * `df.describe()`). Engine-exact by construction:
    *
    *   - n counts NON-NULL values (pandas parity), so nulls influence
    *     nothing downstream;
    *   - mean and stddev derive from DECIMAL(18,`scale`) sum and
    *     sum-of-squares — exact, hence partitioning/order-independent (the
    *     §5 exactSum rule); the one cast of each exact sum to double and
    *     every double op after it are IEEE-deterministic, so any engine
    *     computing the same formula gets bit-identical output. stddev is
    *     the SAMPLE deviation sqrt((Σx² − (Σx)²/n)/(n−1)) (pandas ddof=1);
    *     NULL at n = 1, like pandas;
    *   - quartiles are exact order statistics (least value with cumulative
    *     count ≥ ceil(pct·n/100)) via the [[groupedQuantiles]] value
    *     histogram — no interpolation (pandas lerps between neighbors; a
    *     lerp is a libm-free but grain-hostile divergence surface, and the
    *     engine's exactness rule trades it for the type-1 quantile).
    *
    * Scale shape: the melt explodes each row into #cols (column, value)
    * pairs, which collapse map-side into a (column, value)-histogram — ONE
    * corpus shuffle keyed on (column, value) feeds the quantiles and one
    * aggregate-sized rollup per column feeds the moments; no sort, no
    * per-column pass. `scale` must cover the decimal grain of every
    * profiled column (2 for the .01-grained testdata measures).
    */
  def describeProfile(df: DataFrame, cols: Seq[(String, Column)],
                      scale: Int = 2): DataFrame = {
    require(cols.nonEmpty, "describeProfile needs at least one column")
    val melted = df
      .select(explode(array(cols.map { case (name, c) =>
        struct(lit(name).as("c"), c.cast("double").as("v")) }: _*)).as("m"))
      .select(col("m.c").as("c"), col("m.v").as("v"))
      // drop NaN alongside NULL (the groupedQuantiles policy): a NaN cell
      // would reach max(v) — NaN sorts above every double in Spark — and
      // abs(NaN) < bound is false, so the range guard below would abort
      // the whole profile with a misleading "exceeds 1e10" message
      .filter(col("v").isNotNull && !isnan(col("v")))
    // ONE corpus pass: the (column, value) histogram — the same relation
    // the quantile scheme needs — carries everything else too: n = Σcnt,
    // Σx = Σ cnt·v, Σx² = Σ cnt·v², min/max are histogram min/max. The
    // moments stay exact in decimal; precisions are chosen so every
    // product fits Spark's 38-digit cap WITHOUT precision loss:
    // v as DECIMAL(12,scale) (|v| < 10^(12-scale)), v² = (25, 2·scale),
    // × cnt as DECIMAL(12,0) (< 10^12 rows per distinct value) = (38,
    // 2·scale) — at the cap, never over it.
    val hist = melted.groupBy(col("c"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val dec = col("v").cast(org.apache.spark.sql.types.DecimalType(12, scale))
    val cntDec = col("cnt").cast(org.apache.spark.sql.types.DecimalType(12, 0))
    // ONE aggregate serves both the output moments and the quantile
    // scheme's per-group stats (n, min, max) — the histogram feeds exactly
    // two consumers: this rollup and the bucketed cumulative chain
    val moments = hist.groupBy(col("c"))
      .agg(sum(col("cnt")).as("n"),
        sum(dec * cntDec).cast("double").as("s"),
        sum(dec * dec * cntDec).cast("double").as("ss"),
        min(col("v")).as("min_value"),
        max(col("v")).as("max_value"))
      // fail LOUDLY on out-of-range columns: under non-ANSI semantics the
      // DECIMAL(12,scale) cast silently NULLs |v| >= 10^(12-scale), which
      // would drop those rows from the sums while n/min/max still count
      // them — an internally inconsistent profile. min/max are already
      // here; the assert rides the aggregate-sized table (filter keeps
      // every row: assert_true is NULL on success, throws on failure)
      .filter(assert_true(
        abs(col("min_value")) < math.pow(10, 12 - scale) &&
          abs(col("max_value")) < math.pow(10, 12 - scale),
        concat(lit(s"describeProfile(scale=$scale) supports |v| < 1e${12 - scale}; column "),
          col("c"), lit(" exceeds it — widen the decimal or profile a scaled column")))
        .isNull)
    val quart = groupedQuantilesFromHist(
        hist.select(col("c").as("g"), col("v"), col("cnt")),
        moments.select(col("c").as("g"), col("n"),
          col("min_value").as("_vmin"), col("max_value").as("_vmax")),
        Seq(25, 50, 75), 1024)
      .groupBy(col("g").as("c"))
      .agg(max(when(col("pct") === 25, col("value"))).as("q25"),
        max(when(col("pct") === 50, col("value"))).as("median"),
        max(when(col("pct") === 75, col("value"))).as("q75"))
    val result = moments.join(quart, "c")
      .select(col("c").as("column_name"), col("n"),
        graft.functions.NumFns.roundHalfUp(col("s") / col("n"), 4).as("mean"),
        when(col("n") > 1,
          graft.functions.NumFns.roundHalfUp(
            sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)), 4))
          .as("stddev"),
        col("min_value"), col("q25"), col("median"), col("q75"), col("max_value"))
    // the histogram feeds the moment rollup AND (twice) the bucketed
    // cumulative chain -- persist it so the corpus melt+shuffle runs once,
    // then cut lineage and release the blocks before returning (the q80
    // pattern: multi-consumer aggregates keep their persist; measured
    // min-of-3 at sf0.1: 2.75 s persisted vs 3.38 s recomputed).
    // try/finally: the checkpoint EXECUTES the plan, and the range guard
    // above may throw mid-run — the persist must not outlive the failure
    // (a leaked CacheManager entry poisons the whole session)
    try result.localCheckpoint()
    finally hist.unpersist(false)
  }

  /** pandas `describe(include='object')` parity — the categorical half of
    * [[describeProfile]]: one row per named string column with (n,
    * n_unique, top, top_freq). `n` counts non-null values and `n_unique`
    * distinct non-null values (pandas parity: NaN influences neither);
    * `top` is the most frequent value with DETERMINISTIC tie-breaking
    * (lexicographically smallest among the tied — pandas' top under ties
    * is arbitrary, which an oracle-checked engine cannot be).
    *
    * Scale shape: melt → ONE (column, value) histogram shuffle with
    * map-side collapse (high-cardinality columns degrade to the q21
    * exact-dedup shape, still one linear shuffle); everything after runs
    * on the histogram — a per-column rollup, then a filter to the max
    * count and a min over the tied values. NO windows at all, so a
    * dominant column can't single-task (the two-level alternative to
    * `row_number() OVER (PARTITION BY column ORDER BY cnt DESC)`).
    */
  def describeObjectProfile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "describeObjectProfile needs at least one column")
    val melted = df
      .select(explode(array(cols.map { case (name, c) =>
        struct(lit(name).as("c"), c.cast("string").as("v")) }: _*)).as("m"))
      .select(col("m.c").as("c"), col("m.v").as("v"))
      .filter(col("v").isNotNull)
    val hist = melted.groupBy(col("c"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hist.groupBy(col("c"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_unique"),
        max(col("cnt")).as("_mx"))
    // stats is #cols rows — broadcast by size; only tied-at-max histogram
    // rows survive into the final min
    hist.join(broadcast(stats), "c")
      .filter(col("cnt") === col("_mx"))
      .groupBy(col("c"), col("n"), col("n_unique"), col("_mx"))
      .agg(min(col("v")).as("top"))
      .select(col("c").as("column_name"), col("n"), col("n_unique"),
        col("top"), col("_mx").as("top_freq"))
  }

  /** Pairwise Pearson correlation matrix over named numeric columns — the
    * other half of the pandas EDA opener ([[describeProfile]] is
    * `df.describe()`; this is `df.corr()`). One row per unordered column
    * pair (i < j): (x_col, y_col, n, corr), with pandas' pairwise deletion
    * (a row counts for a pair only when BOTH values are non-null).
    *
    * Engine-exact by the same §5 rule as describe: the five sufficient
    * moments (Σx, Σy, Σxy, Σx², Σy²) accumulate in DECIMAL(18,`scale`)
    * products — exact, hence partitioning/order-independent — and are cast
    * to double ONCE; the correlation
    *   r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))
    * is then a fixed tree of IEEE double ops any engine reproduces
    * bit-for-bit. NULL when a side is constant (zero variance — pandas
    * emits NaN there; NULL is this engine's SQL-portable spelling).
    * `scale` must cover every profiled column's decimal grain.
    *
    * Scale shape: ONE corpus pass, NO row amplification — all pairs'
    * conditional sums are expressions in a single global HashAggregate
    * (partials collapse per partition; the shuffle carries ONE aggregate
    * row), and that row then explodes into #pairs output rows. An earlier
    * melt formulation (#pairs structs per input row) measured 29.5 s at
    * 6M rows × 4 columns; this shape measures ~4× faster on the same
    * staged input — the Generate and its 6× row traffic were the cost,
    * not the decimal arithmetic. The pandas formulation is a
    * column-quadratic driver loop.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[(String, Column)],
                        scale: Int = 2): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val pairIdx = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    val pairs = pairIdx.map { case (i, j) => (cols(i), cols(j)) }
    // r15 (judge-r14 item 5): the five sufficient moments accumulate on the
    // LONG fast path — each column's scale-s integer is projected ONCE
    // (DoubleToScaledLong, bit-identical to the old DECIMAL(18,s) cast;
    // property-checked) and each pair's (n, Σx, Σy, Σxy, Σx², Σy²) runs as
    // ONE fused codegen'd 128-bit aggregate (graft.plans.PairMomentsAgg;
    // pairwise deletion gated inside, branch-free) instead of six separate
    // decimal sums with per-row BigDecimal casts and multiplies. The fused
    // form also keeps the aggregation buffer at 12 fields per pair — the
    // unfused 30-aggregate spelling tripped spark.sql.codegen.maxFields
    // (100) and silently lost whole-stage codegen. Values and null
    // semantics are unchanged (ExactSum128's equality + overflow argument,
    // ExactSum128Spec); out-of-range values now throw inside the rounding
    // expression where the decimal cast silently NULLed them — the same
    // queries abort (the max-abs assert below covered them), the message
    // just moves earlier.
    val vals = df.select(cols.zipWithIndex.map { case ((_, c), i) =>
      c.cast("double").as(s"_v_$i") }: _*)
    val withL = vals.select(cols.indices.flatMap { i =>
      Seq(col(s"_v_$i"),
        graft.plans.ExactSum128.toScaledLong(col(s"_v_$i"), scale).as(s"_l_$i"))
    }: _*)
    val aggs = pairIdx.zipWithIndex.map { case ((xi, yi), i) =>
      graft.plans.ExactSum128.pairMoments(col(s"_l_$xi"), col(s"_l_$yi"), scale)
        .as(s"_pm_$i")
    }
    // fail LOUDLY on out-of-range columns (describeProfile's guard, same
    // failure class) — kept as the operator-level message even though the
    // rounding expression now throws first for the same inputs. One
    // max-abs per column rides the same single aggregate.
    val rangeAggs = cols.indices.map { i =>
      max(abs(col(s"_v_$i"))).as(s"_mx_$i")
    }
    val row0 = withL.agg((aggs ++ rangeAggs).head, (aggs ++ rangeAggs).tail: _*)
    val bound = math.pow(10, 18 - scale)
    val row = cols.zipWithIndex.foldLeft(row0) { case (d, ((name, _), i)) =>
      d.filter(assert_true(col(s"_mx_$i").isNull || col(s"_mx_$i") < bound,
        lit(s"correlationMatrix(scale=$scale) supports |v| < 1e${18 - scale}; " +
          s"column $name exceeds it — widen the decimal or profile a scaled column"))
        .isNull)
    }
    val perPair = row.select(explode(array(pairs.zipWithIndex.map {
      case (((xn, _), (yn, _)), i) =>
        struct(lit(xn).as("x_col"), lit(yn).as("y_col"),
          col(s"_pm_$i.n").as("n"),
          col(s"_pm_$i.sx").cast("double").as("sx"),
          col(s"_pm_$i.sy").cast("double").as("sy"),
          col(s"_pm_$i.sxy").cast("double").as("sxy"),
          col(s"_pm_$i.sxx").cast("double").as("sxx"),
          col(s"_pm_$i.syy").cast("double").as("syy"))
    }: _*)).as("p")).select(col("p.*"))
    val nD = col("n").cast("double")
    val den2 = (nD * col("sxx") - col("sx") * col("sx")) *
      (nD * col("syy") - col("sy") * col("sy"))
    perPair.select(col("x_col"), col("y_col"), col("n"),
      when(den2 > 0.0, graft.functions.NumFns.roundHalfUp(
        (nD * col("sxy") - col("sx") * col("sy")) / sqrt(den2), 4)).as("corr"))
      // a pair with ZERO jointly-non-null rows has no correlation row at
      // all (matches the melt-and-group SQL formulation the oracle uses)
      .filter(col("n") > 0)
  }

  /** Context chunking (the q41 operator, promoted from the contract lambda
    * for the typed facade — judge r9 task 6): `chunkTokens`-token windows
    * with `strideTokens` stride, one row (doc_id, chunk_idx, chunk_text)
    * per chunk. A pure per-row explode — no shuffle; each consumer applies
    * its own ordering.
    */
  def chunkDocuments(docs: DataFrame, id: Column, text: Column,
                     chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1,
      s"chunkTokens/strideTokens must be >= 1, got $chunkTokens/$strideTokens")
    // tokens materialized + guarded sequence: see Dedup.boilerplateStrip
    // (review r11) — an inlined split re-evaluates per chunk (O(tokens²)),
    // and under legacy non-ANSI confs sequence(0, -1) steps DOWN, emitting
    // phantom chunks for null-text docs
    val base = docs.select(id.as("doc_id"),
      graft.functions.TextFns.tokens(text).as("_toks"))
    val nChunks =
      ceil(size(col("_toks")).cast("double") / strideTokens).cast("long")
    base.select(col("doc_id"),
        explode(transform(
          when(nChunks >= 1L, sequence(lit(0L), nChunks - 1))
            .otherwise(array().cast("array<bigint>")),
          i => struct(i.as("chunk_idx"),
            concat_ws(" ", slice(col("_toks"), (i * strideTokens + 1).cast("int"),
              lit(chunkTokens))).as("chunk_text")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_text"))
  }

  /** Contiguous sequence packing (the q44 operator, promoted like
    * [[chunkDocuments]]): assign chunks to fixed `packTokens`-token context
    * packs via a running token total. Packing is PER SHARD — the window
    * partitions on deterministic key arithmetic, so the sort is distributed
    * (no single-partition WindowExec) and each shard packs independently,
    * exactly how a 1000-executor run would. Pack ids are globally unique
    * via shard · 2^40 + local pack — 2^40 local packs ≈ 10^14 tokens per
    * shard before collision, comfortably past the 100 TB design point.
    * Output: (doc_id, chunk_idx, n_tok, shard, pack_id).
    */
  def sequencePack(chunks: DataFrame, docId: Column, chunkIdx: Column,
                   chunkText: Column, packTokens: Int,
                   numShards: Long): DataFrame = {
    require(packTokens >= 1, s"packTokens must be >= 1, got $packTokens")
    require(numShards >= 1 && numShards <= (1L << 23),
      s"numShards must be in [1, 2^23] (pack-id headroom), got $numShards")
    val sharded = chunks.select(docId.as("doc_id"), chunkIdx.as("chunk_idx"),
        chunkText.as("chunk_text"))
      .withColumn("shard", pmod(col("doc_id"), lit(numShards)).cast("long"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    sharded
      .withColumn("n_tok", size(split(col("chunk_text"), " ")).cast("long"))
      .withColumn("pack_id",
        (col("shard") * (1L << 40) +
          floor((sum(col("n_tok")).over(w) - col("n_tok")) / packTokens.toDouble))
          .cast("long"))
      .select(col("doc_id"), col("chunk_idx"), col("n_tok"), col("shard"),
        col("pack_id"))
  }

  /** Keyed snapshot diff (round 11): classify every key of two corpus
    * versions as `added` / `removed` / `changed`, dropping the unchanged
    * majority — the audit primitive behind "what did last night's crawl
    * merge actually do" (the read-side complement of
    * [[graft.sources.Writers.upsert]]).
    *
    * Scale shape: each side is pre-projected to `(keys, row signature)`
    * BEFORE the join, so the full-outer shuffle carries a 32-char md5 per
    * row instead of document payloads — at 100 TB the exchange is keys +
    * 32 bytes, and AQE plans the join on that reduced width. The signature
    * is [[rowSignature]] — engine-portable md5 over an injective
    * null-tagged, length-prefixed encoding (advisor r11 closed the old
    * U+0001-delimiter aliasing caveat), so `changed` means payload
    * difference, never null-vs-empty or delimiter ambiguity. The
    * contract-query oracle compares payload columns directly (`IS DISTINCT
    * FROM`), so the driver hash-check pins signature-diff ≡ semantic-diff
    * on real data; SnapshotDiffSpec pins it on crafted null/empty edges.
    */
  def snapshotDiff(v0: DataFrame, v1: DataFrame, keys: Seq[String],
                   payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(payload.nonEmpty, "snapshotDiff needs at least one payload column")
    def sig(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+ rowSignature(payload).as(as): _*)
    sig(v0, "_sig0").join(sig(v1, "_sig1"), keys, "full_outer")
      .withColumn("status",
        when(col("_sig0").isNull, lit("added"))
          .when(col("_sig1").isNull, lit("removed"))
          .when(col("_sig0") =!= col("_sig1"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(keys.map(col) :+ col("status"): _*)
  }

  /** The ONE row-signature encoding [[snapshotDiff]] and its streaming twin
    * ([[graft.streaming.DocsStream.snapshotDiffStream]]) hash — INJECTIVE
    * over payload values (advisor r11: the previous '1'-prefix +
    * U+0001-join encoding could alias two semantically different rows when
    * a value itself contained U+0001, and real crawl text does): NULL
    * encodes as the bare tag 'n', a value as `<length>:<value>`. Each field
    * self-delimits — 'n' is not a digit, a length is digits up to the ':' —
    * so no value content can shift field boundaries, and signature equality
    * is payload equality up to md5 collision (the standard 2^-128-class
    * bound).
    */
  private[graft] def rowSignature(payload: Seq[String]): Column =
    md5(concat_ws("", payload.map(c =>
      when(col(c).isNull, lit("n"))
        .otherwise(concat(length(col(c).cast("string")).cast("string"),
          lit(":"), col(c).cast("string")))): _*))
}
