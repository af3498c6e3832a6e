package graft

import graft.sources.{Readers, Writers}
import org.apache.spark.sql.functions._

class SinksSpec extends GraftSuite {

  test("partitioned write enables partition pruning on read") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = Readers.table(spark, sf, "events")
    Writers.writePartitioned(ev, out, Seq("event_type"))

    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())

    val pruned = back.filter(col("event_type") === "error")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter:\n$plan")
    assert(pruned.count() == ev.filter(col("event_type") === "error").count())
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val ev = Readers.table(spark, sf, "events").select("event_id", "user_id", "value")
    Writers.writeBucketed(ev, "ev_bucketed_a", "user_id", 4)
    Writers.writeBucketed(
      ev.groupBy("user_id").agg(count(lit(1)).as("n")), "ev_bucketed_b", "user_id", 4)

    val joined = spark.table("ev_bucketed_a")
      .join(spark.table("ev_bucketed_b"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    // SortMergeJoin over two bucketed scans: no Exchange on either side
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == ev.count())
  }

  test("csv and json round-trip") {
    val out1 = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft-json").toString
    val df = Readers.table(spark, sf, "nation")
    Writers.writeCsv(df, out1)
    Writers.writeJson(df, out2)
    assert(spark.read.option("header", "true").csv(out1).count() == df.count())
    assert(spark.read.json(out2).count() == df.count())
  }
}
