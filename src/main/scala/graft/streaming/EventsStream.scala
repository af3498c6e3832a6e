package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Per-user session tracking state carried across micro-batches. */
case class SessionState(lastMs: Long, sessionId: Long)

/** Structured Streaming twin of the batch windowed aggregation (q34):
  * the reference's collectors were cron jobs appending 3-minute samples
  * (README.md "Cron Jobs"); the Spark-native shape is a streaming source →
  * watermark → tumbling-window aggregate. Same logical aggregation as
  * `TimeSeries.windowedAgg`, so batch and streaming results line up.
  */
object EventsStream {

  // ts is TIMESTAMP_NTZ to match the batch tables (plain un-adjusted parquet
  // micros): the streaming twin of a batch query must produce type-identical
  // rows or stream/batch unions and comparisons silently diverge
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window aggregation over a streaming events frame.
    *
    * Spark's event-time machinery (watermark + window state) only accepts
    * TIMESTAMP, never TIMESTAMP_NTZ — so an NTZ `ts` is routed through
    * TIMESTAMP for the stateful part (a wall-clock identity under this
    * engine's pinned UTC session zone) and the window bound is cast back, so
    * the output type matches the batch twin whatever the source type was.
    */
  def windowedCounts(events: DataFrame, windowDuration: String,
                     watermark: String): DataFrame = {
    val ntzIn = events.schema("ts").dataType == TimestampNTZType
    val start =
      if (ntzIn) col("window.start").cast("timestamp_ntz") else col("window.start")
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.NumFns.roundHalfUp(sum(col("value")), 2).as("total_value"))
      .select(start.as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Stateful streaming sessionization: the custom-state twin of
    * `TimeSeries.sessionize` (gap > gapMs ⇒ new session), via
    * `flatMapGroupsWithState` — per-key state survives across micro-batches,
    * which is how the reference's 3-minute cron feed would sessionize live.
    */
  def sessionizeStream(events: DataFrame, gapMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // NULL event times are dropped: they have no watermark position and no
    // place in the gap ordering (Spark's own event-time operators drop them
    // too); without the filter one null row would NPE the micro-batch task
    events.filter(col("ts").isNotNull)
      .selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[SessionState, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, rows, state) =>
        val sorted = rows.toSeq.sortBy(r => (r._3.getTime, r._1))
        var (lastMs, sid) =
          state.getOption.map(s => (s.lastMs, s.sessionId)).getOrElse((Long.MinValue, 0L))
        val out = sorted.map { case (eid, uid, ts) =>
          val ms = ts.getTime
          if (lastMs == Long.MinValue || ms - lastMs > gapMs) sid += 1
          // never move the frontier backward: a late event joining an old
          // session must not make the next on-time event look gapped
          lastMs = math.max(lastMs, ms)
          (eid, uid, sid)
        }
        state.update(SessionState(lastMs, sid))
        out.iterator
      }
      .toDF("event_id", "user_id", "session_id")
  }

  /** Streaming exact dedup (the streaming twin of Dedup.exact): keep the
    * first occurrence of each content hash, with state bounded by the
    * watermark — the shape of a live training-data ingest that must not
    * re-admit documents seen within the retention window.
    */
  def dedupStream(docsWithTs: DataFrame, contentCol: String, watermark: String): DataFrame = {
    // same NTZ shim as every other event-time helper here: watermarks
    // reject TIMESTAMP_NTZ, so cast through TIMESTAMP (a wall-clock
    // identity under the pinned UTC session zone) and cast back on output
    val ntzIn = docsWithTs.schema("ts").dataType == TimestampNTZType
    val deduped = docsWithTs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("content_hash", xxhash64(col(contentCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
    if (ntzIn) deduped.withColumn("ts", col("ts").cast("timestamp_ntz")) else deduped
  }

  /** Stream-stream interval join: enrich each event with the reference rows
    * (e.g. hourly weather) whose timestamp falls within `tolerance` before
    * the event — both sides unbounded streams, state bounded by watermarks.
    * The range predicate is what lets Spark expire join state.
    */
  def enrichStreamStream(events: DataFrame, reference: DataFrame,
                         key: String, tolerance: String,
                         lateness: String = "2 hours"): DataFrame = {
    // `lateness` governs how late either side may arrive before being
    // dropped — previously a hard-coded "2 hours" that silently overrode
    // callers whose join tolerance exceeded it
    //
    // Event-time join state requires TIMESTAMP columns (watermarks reject
    // NTZ): NTZ inputs are cast through TIMESTAMP for the join — identity
    // under the pinned UTC session zone — and cast back on the way out so
    // callers see the source's own types.
    val evNtz = events.schema("ts").dataType == TimestampNTZType
    val refNtz = reference.schema("ts").dataType == TimestampNTZType
    val ev = events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", lateness)
    val ref = reference
      .withColumnRenamed(key, s"${key}_ref")
      .withColumnRenamed("ts", "ref_ts")
      .withColumn("ref_ts", col("ref_ts").cast("timestamp"))
      .withWatermark("ref_ts", lateness)
    val joined = ev.join(ref,
      col(key) === col(s"${key}_ref") &&
        col("ref_ts") <= col("ts") &&
        col("ref_ts") >= col("ts") - expr(s"INTERVAL $tolerance"))
    val outEv =
      if (evNtz) joined.withColumn("ts", col("ts").cast("timestamp_ntz")) else joined
    if (refNtz) outEv.withColumn("ref_ts", col("ref_ts").cast("timestamp_ntz")) else outEv
  }

  /** Stream-static enrichment join: each streaming event picks up its
    * dimension row (the reference's geocode lookup joined onto the live
    * feed). The static side is re-planned per micro-batch (so a dim refresh
    * is picked up) and broadcast when small; unlike the stream-stream
    * variant this keeps NO join state — the right shape whenever the
    * enrichment source is a table, not a feed.
    */
  def enrichStreamStatic(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Drive a parquet directory through the streaming engine into a memory
    * sink (synchronously, for tests): returns the finished query's table name.
    */
  def runOnce(spark: SparkSession, parquetPath: String, queryName: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(eventSchema)
      .parquet(parquetPath)
    val q = windowedCounts(stream, "1 hour", "2 hours")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q
  }

  /** Per-window frequent-key monitor: the streaming face of the
    * Misra–Gries candidate sketch ([[graft.plans.MisraGriesAgg]]). Each
    * tumbling window aggregates a ≤ k-entry candidate summary in streaming
    * state — constant state per window regardless of key cardinality,
    * which is the whole point: a full per-key count in state grows with
    * the live key universe; the sketch never does. Downstream alerting
    * recounts candidates exactly if it needs true frequencies (same
    * two-pass contract as `Scoring.heavyHitters`); the candidate array is
    * guaranteed to contain every key with in-window frequency >
    * n_window/(k+1) under any merge order of the partials.
    *
    * Same NTZ handling as [[windowedCounts]]: event-time state requires
    * TIMESTAMP, so NTZ inputs are cast through it and the window bound is
    * cast back.
    */
  /** Streaming twin of q82's moment half: per tumbling window, the
    * count / mean / sample-stddev / min / max of a measure — the live EDA
    * dashboard over an arriving stream. Moments use the identical
    * DECIMAL sum/sum-of-squares formulation as
    * [[graft.operators.Relational.describeProfile]] (exact, hence
    * micro-batch-order-independent), so a window's row equals the batch
    * profile of that window's rows bit-for-bit (spec-asserted). The sums
    * are plain streaming-aggregatable state — each window holds five
    * scalars regardless of event volume. Quantiles are deliberately
    * absent: an exact type-1 quantile needs the window's full value
    * histogram in state; run the batch profile for those.
    */
  def windowedMomentProfile(events: DataFrame, valueExpr: Column,
                            windowDuration: String, watermark: String,
                            scale: Int = 2): DataFrame = {
    val ntzIn = events.schema("ts").dataType == TimestampNTZType
    val start =
      if (ntzIn) col("window.start").cast("timestamp_ntz") else col("window.start")
    val v = valueExpr.cast("double")
    val dec = v.cast(DecimalType(18, scale))
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration))
      .agg(count(v).as("n"),
        sum(dec).cast("double").as("_s"),
        sum(dec * dec).cast("double").as("_ss"),
        min(v).as("min_value"), max(v).as("max_value"))
      // the describeProfile range guard, streaming edition: an
      // out-of-range value silently NULLs out of the decimal sums while
      // n/min/max still count it — fail the micro-batch loudly instead of
      // emitting an internally inconsistent window profile. All-NULL
      // windows (min/max aggregate to NULL) pass through as the n=0 row —
      // assert_true(NULL) would raise, so escape NULLs first via
      // when()/otherwise(): CaseWhen's conditional evaluation is the
      // documented construct for guarding a side-effecting expression
      // (Or's operand laziness is an implementation detail). NaN compares
      // false on both < checks, so a NaN value still trips the assert
      // (deliberate: NaN would NULL out of the decimal sums the same way).
      .filter(
        when(col("min_value").isNull, lit(true)).otherwise(
          assert_true(
            abs(col("min_value")) < math.pow(10, 18 - scale) &&
              abs(col("max_value")) < math.pow(10, 18 - scale),
            lit(s"windowedMomentProfile(scale=$scale) supports finite |v| < 1e${18 - scale}; " +
              "widen the decimal, drop NaN, or profile a scaled measure")).isNull))
      .select(start.as("window_start"), col("n"),
        graft.functions.NumFns.roundHalfUp(col("_s") / col("n"), 4).as("mean"),
        when(col("n") > 1,
          graft.functions.NumFns.roundHalfUp(
            sqrt((col("_ss") - col("_s") * col("_s") / col("n")) / (col("n") - 1)), 4))
          .as("stddev"),
        col("min_value"), col("max_value"))
  }

  def windowedHeavyHitters(events: DataFrame, keyExpr: Column,
                           windowDuration: String, watermark: String,
                           k: Int): DataFrame = {
    val ntzIn = events.schema("ts").dataType == TimestampNTZType
    val start =
      if (ntzIn) col("window.start").cast("timestamp_ntz") else col("window.start")
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration))
      .agg(count(lit(1)).as("n_events"),
        graft.plans.HeavyHitters.misraGries(keyExpr, k).as("candidates"))
      .select(start.as("window_start"), col("n_events"), col("candidates"))
  }

  /** Per-window Count-Min sketch over a key expression — the CMS sibling of
    * [[windowedHeavyHitters]] (MG proposes a candidate SET per window, this
    * keeps a fixed-size per-window frequency summary answering "roughly how
    * often did key X occur in window W" for ANY X after the fact). State
    * per window is `depth·width` longs regardless of key cardinality, and
    * the watermark finalizes and evicts each window's grid exactly like any
    * other windowed aggregate — bounded state on an unbounded stream.
    * Probe finalized grids with [[graft.plans.CountMin.md5Bucket]] or the
    * q101 `least(element_at(...))` column form.
    */
  def windowedTokenSketch(events: DataFrame, keyExpr: Column,
                          windowDuration: String, watermark: String,
                          depth: Int, width: Int): DataFrame = {
    val ntzIn = events.schema("ts").dataType == TimestampNTZType
    val start =
      if (ntzIn) col("window.start").cast("timestamp_ntz") else col("window.start")
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration))
      .agg(count(lit(1)).as("n_events"),
        graft.plans.CountMin.countMin(keyExpr, depth, width).as("cms"))
      .select(start.as("window_start"), col("n_events"), col("cms"))
  }
}
