package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-feature columns (reference: README.md "EDA" — `hour`, `day`,
  * `day_type`, `time_hour`, 15-minute `time_interval` buckets;
  * /root/reference/README.md:1040-1120, notebooks/citibike_ck.ipynb
  * `day_of_week`). Pure Column composition — stays in whole-stage codegen.
  */
object TimeFns {

  /** Epoch seconds for both TIMESTAMP and TIMESTAMP_NTZ inputs. NTZ has no
    * direct numeric cast; routing through TIMESTAMP interprets the wall time
    * in the session zone (this engine pins UTC), which is exactly DuckDB's
    * `epoch()` semantics on a naive timestamp.
    */
  def epochSec(ts: Column): Column = ts.cast("timestamp").cast("long")

  /** Epoch milliseconds, NTZ-safe (see [[epochSec]]). */
  def epochMs(ts: Column): Column = unix_millis(ts.cast("timestamp"))

  /** A wall-clock timestamp as stored in plain (un-adjusted) parquet.
    * Reconstructed timestamps are normalized to TIMESTAMP_NTZ so outputs
    * match the source tables' type whatever the session zone.
    */
  private def ntz(ts: Column): Column = ts.cast("timestamp_ntz")

  /** Floor a timestamp to an n-minute bucket, epoch-aligned (same alignment
    * as `window(ts, "n minutes")` and DuckDB `time_bucket`).
    */
  def bucket(ts: Column, minutes: Int): Column =
    ntz(timestamp_seconds(floor(epochSec(ts) / (minutes * 60)).cast("long") * (minutes * 60)))

  /** Truncate to hour — reference's `time_hour` (README.md:447). */
  def hourTrunc(ts: Column): Column = ntz(date_trunc("hour", ts))

  /** Hour-of-day as long (BIGINT parity with DuckDB `hour()`). */
  def hourOfDay(ts: Column): Column = hour(ts).cast("long")

  /** English day name — reference's `df['day']` (README.md:1079). */
  def dayName(ts: Column): Column = date_format(ts, "EEEE")

  /** 'weekend' / 'weekday' — reference's `get_day_type` (README.md:1090). */
  def dayType(ts: Column): Column =
    when(dayofweek(ts).isin(1, 7), lit("weekend")).otherwise(lit("weekday"))
}
