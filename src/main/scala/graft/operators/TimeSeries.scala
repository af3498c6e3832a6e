package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over event streams (reference: 3-min samples →
  * 15-min availability intervals, rolling views in the EDA; generalized to
  * sessionization and as-of joins a weather-by-hour join implies).
  */
object TimeSeries {

  /** Sessionize: a new session starts when the gap to the previous event of
    * the same key exceeds `gapMs`. lag + running sum — one shuffle on the key,
    * both windows reuse the same partitioning.
    */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapMs: Long): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(ts)
    val ms = graft.functions.TimeFns.epochMs(ts)
    val prevMs = lag(ms, 1).over(byKey)
    df.withColumn("_new_session",
        when(prevMs.isNull || (ms - prevMs) > gapMs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("_new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, 0))
          .cast("long"))
      .drop("_new_session")
  }

  /** As-of join: attach to each left row the most recent right row with
    * rightTs <= leftTs for the same key. Implemented as the union-and-carry
    * pattern: tag both sides, sort within key, carry the last reference value
    * forward with `last(ignoreNulls)` — a single shuffle on the key, no
    * per-row range probe, no cross product. (Reference semantics: the
    * weather-by-nearest-hour enrichment, README.md:860-880.)
    *
    * `carry` columns must exist on the right side; left rows get them filled.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               carry: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("_is_ref", lit(0))
    // a reference row with a NULL key or NULL timestamp can match nothing
    // (no order position, no key group) — drop it, matching the native
    // AsOfJoinExec, which discards such rows; without this filter a NULL ts
    // sorts FIRST in the window and leaks its values into every event row
    // of its (possibly NULL) key group
    val rTagged = right.filter(col(key).isNotNull && col(tsCol).isNotNull)
      .withColumn("_is_ref", lit(1))
    val all = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // refs sort before events at identical timestamps (inclusive <= semantics)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("_is_ref").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // carry the whole ref row as ONE struct: a matched ref whose carry value
    // is genuinely NULL must still count as the match (last+ignoreNulls on
    // the bare column would skip it and leak an older non-null value)
    val packed = when(col("_is_ref") === 1, struct(carry.map(col): _*))
    val carried = all.withColumn("_carry", last(packed, ignoreNulls = true).over(w))
    val unpacked = carry.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("_carry").getField(c))
    }
    unpacked.filter(col("_is_ref") === 0).drop("_is_ref", "_carry")
  }

  /** Running total + moving average per key (reference rolling views). */
  def runningWindow(df: DataFrame, key: Column, order: Seq[Column], value: Column,
                    movingRows: Int): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(order: _*)
    // roundHalfUp is floor(x·p + 0.5)/p — on NEGATIVE sums this rounds
    // halves toward +∞ (−2.005 → −2.00), not away from zero. That is the
    // CONTRACT here: the q13 oracle computes the identical floor formula,
    // so both engines agree on negative data; callers wanting
    // away-from-zero halves should round in their own grain.
    df.withColumn("running_sum",
        graft.functions.NumFns.roundHalfUp(
          sum(value).over(byKey.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("moving_avg",
        graft.functions.NumFns.roundHalfUp(
          avg(value).over(byKey.rowsBetween(-(movingRows - 1), 0)), 4))
  }

  /** Range (interval) join: left rows matched to right intervals with
    * rStart <= lTs < rEnd on the same key. Spark plans a raw inequality join
    * as a nested loop; here each interval explodes into the fixed-size time
    * buckets it covers and the join becomes a hash equi-join on
    * (key, bucket) + a residual filter. Bucket width should approximate the
    * typical interval length (fan-out = interval/bucket).
    */
  def rangeJoin(left: DataFrame, lTs: Column,
                right: DataFrame, rStart: Column, rEnd: Column,
                key: String, bucketMinutes: Int): DataFrame = {
    val b = bucketMinutes * 60L
    val sec = graft.functions.TimeFns.epochSec(_)
    val bucketed = right.withColumn("_bucket",
      explode(sequence(floor(sec(rStart) / b).cast("long"),
        floor(sec(rEnd) / b).cast("long"))))
    val lb = left.withColumn("_bucket", floor(sec(lTs) / b).cast("long"))
    lb.join(bucketed, Seq(key, "_bucket"))
      .filter(rStart <= lTs && lTs < rEnd)
      .drop("_bucket")
  }

  /** Tumbling-window aggregation (batch twin of the Structured Streaming
    * path in graft.streaming.EventsStream — same logical aggregation).
    */
  def windowedAgg(df: DataFrame, ts: Column, windowDuration: String,
                  groupCols: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(ts, windowDuration).getField("start").as("window_start") +: groupCols): _*)
      .agg(aggs.head, aggs.tail: _*)
}
