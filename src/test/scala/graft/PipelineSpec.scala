package graft

import graft.operators.{Relational, TimeSeries}
import graft.sources.{Readers, Writers}
import org.apache.spark.sql.functions._

/** End-to-end composition: the reference's whole ETL arc — ingest → repair
  * missing measures → enrich per-day flags → sessionize → windowed rollup →
  * partitioned sink → pruned read-back — as one library pipeline.
  */
class PipelineSpec extends GraftSuite {

  test("full ETL pipeline composes and round-trips through a partitioned sink") {
    val ev = Readers.table(spark, sf, "events")

    // 1. repair: error rows get the hour's min observed value
    val facts = ev.select(col("event_id"), col("user_id"), col("event_type"),
      date_trunc("hour", col("ts")).as("hour_ts"), col("ts"), col("value"))
    val fix = ev.filter(col("event_type") =!= "error")
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(min(col("value")).as("fixed_value"))
    val repairedRaw = Relational.repairUnion(facts, col("event_type") === "error",
      fix, Seq("hour_ts"), "value", "fixed_value")
    // hours with zero clean observations can't be imputed from the fix table
    // (left-join null) — fall back to the global minimum, as a real repair would
    val globalMin = ev.filter(col("event_type") =!= "error")
      .agg(min(col("value"))).head().getDouble(0)
    val repaired = repairedRaw.withColumn("value", coalesce(col("value"), lit(globalMin)))
    assert(repaired.count() == ev.count())
    assert(repaired.filter(col("value").isNull).count() == 0)

    // 2. enrich: per-(user, day) high-activity flag joined back
    val enriched = Relational.flagRollupJoin(
      repaired.withColumn("d_date", to_date(col("ts"))),
      col("user_id"), col("d_date"), col("value") > 150, "high_day")

    // 3. sessionize
    val sessioned = TimeSeries.sessionize(enriched, col("user_id"), col("ts"), 1800000L)
    assert(sessioned.filter(col("session_id") < 1).count() == 0)

    // 4. windowed rollup per session flag
    val rollup = TimeSeries.windowedAgg(sessioned, col("ts"), "1 hour",
      Seq(col("high_day")),
      Seq(count(lit(1)).as("n"), graft.functions.NumFns.roundHalfUp(sum(col("value")), 2).as("total")))
    assert(rollup.count() > 0)

    // 5. partitioned sink + pruned read-back
    val out = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    Writers.writePartitioned(sessioned.withColumn("src2", col("src")), out, Seq("src2"))
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    val fixedOnly = back.filter(col("src2") === "fixed")
    assert(fixedOnly.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(src2"))
    assert(fixedOnly.count() == ev.filter(col("event_type") === "error").count())
  }

  test("local scan fan-out: multi-split leaf, no injected exchange, same rows") {
    val cores = spark.sparkContext.defaultParallelism
    val li = Readers.table(spark, sf, "lineitem")
    // leaf parallelism comes from the copy's file splits, not a shuffle:
    // the plan between scan and first aggregation must be exchange-free
    assert(li.rdd.getNumPartitions >= cores / 2,
      s"fan-out defeated: ${li.rdd.getNumPartitions} splits for $cores cores")
    assert(!li.queryExecution.executedPlan.toString.contains("Exchange"),
      "fan-out must widen the SCAN, not inject a repartition Exchange")
    // the copy is the same table: identical multiset of rows as the source
    val direct = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(li.exceptAll(direct).isEmpty && direct.exceptAll(li).isEmpty)
    // second read reuses the cached copy (same scan location both times)
    val files1 = li.inputFiles.toSet
    val files2 = Readers.table(spark, sf, "lineitem").inputFiles.toSet
    assert(files1 == files2 && files1.size >= cores / 2)
  }
}
