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

  test("upsert: re-ingest of changed keys reproduces the SCD-latest collapse; idempotent") {
    import graft.operators.Relational
    val path = java.nio.file.Files.createTempDirectory("graft-upsert")
      .resolve("events_current").toString
    val ev = Readers.table(spark, sf, "events")
      .select("user_id", "event_id", "event_type", "ts")
    val version = Seq(col("ts"), col("event_id"))
    Writers.upsert(spark, path, ev.filter(pmod(col("event_id"), lit(2)) === 0),
      Seq("user_id"), version)
    Writers.upsert(spark, path, ev.filter(pmod(col("event_id"), lit(2)) === 1),
      Seq("user_id"), version)
    val expected = Relational.latestPerKey(ev, Seq(col("user_id")), version)
      .select("user_id", "event_id", "event_type")
    val got = spark.read.parquet(path).select("user_id", "event_id", "event_type")
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).count() == 0,
      "upserted table diverges from the q20 read-side SCD collapse")
    // idempotence: replaying the same batch must not change the table
    Writers.upsert(spark, path, ev.filter(pmod(col("event_id"), lit(2)) === 1),
      Seq("user_id"), version)
    val again = spark.read.parquet(path).select("user_id", "event_id", "event_type")
    assert(again.count() == expected.count() && again.exceptAll(expected).count() == 0)
  }

  test("upsertPartitioned rewrites only the partitions the batch touches") {
    import graft.operators.Relational
    val path = java.nio.file.Files.createTempDirectory("graft-upsert-part")
      .resolve("events_by_type").toString
    val ev = Readers.table(spark, sf, "events")
      .select("user_id", "event_id", "event_type", "ts")
    val version = Seq(col("ts"), col("event_id"))
    Writers.upsertPartitioned(spark, path, ev.filter(col("event_type") =!= "purchase"),
      Seq("user_id"), version, "event_type")
    // snapshot an untouched partition's file listing
    def listing(part: String): Seq[String] = {
      val d = java.nio.file.Paths.get(path, s"event_type=$part")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(d).iterator().asScala.map(_.getFileName.toString).toSeq.sorted
    }
    val clickBefore = listing("click")
    Writers.upsertPartitioned(spark, path, ev.filter(col("event_type") === "purchase"),
      Seq("user_id"), version, "event_type")
    assert(listing("click") == clickBefore,
      "a batch touching only 'purchase' must not rewrite the 'click' partition")
    // per-partition collapse: latest per (key) within each touched partition
    val expected = Relational.latestPerKey(ev.filter(col("event_type") === "purchase"),
      Seq(col("user_id")), version).select("user_id", "event_id")
    val got = spark.read.parquet(path).filter(col("event_type") === "purchase")
      .select("user_id", "event_id")
    assert(got.count() == expected.count() && got.exceptAll(expected).count() == 0)
  }

  test("upsert recovers the table from a crash between the two swap moves") {
    val base = java.nio.file.Files.createTempDirectory("graft-upsert-crash")
    val path = base.resolve("t").toString
    val ev = Readers.table(spark, sf, "events")
      .select("user_id", "event_id", "event_type", "ts")
    val version = Seq(col("ts"), col("event_id"))
    Writers.upsert(spark, path, ev.filter(pmod(col("event_id"), lit(2)) === 0),
      Seq("user_id"), version)
    // simulate a crash after `dir -> .old` but before `staging -> dir`:
    // the live table sits at .old and `path` is absent
    java.nio.file.Files.move(java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(path + ".old"))
    Writers.upsert(spark, path, ev.filter(pmod(col("event_id"), lit(2)) === 1),
      Seq("user_id"), version)
    val expected = graft.operators.Relational.latestPerKey(ev, Seq(col("user_id")), version)
      .select("user_id", "event_id")
    val got = spark.read.parquet(path).select("user_id", "event_id")
    assert(got.count() == expected.count() && got.exceptAll(expected).count() == 0,
      "post-crash upsert lost the displaced generation")
  }

  test("upsertPartitioned keeps a key that legally exists in several partitions") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-upsert-multi")
      .resolve("t").toString
    // uniqueness is per (partition, key): user 7 in two partitions is legal
    val seed = Seq((7L, 1L, "click", 10L), (7L, 2L, "purchase", 11L))
      .toDF("user_id", "event_id", "event_type", "ts")
    val version = Seq(col("ts"), col("event_id"))
    Writers.upsertPartitioned(spark, path, seed, Seq("user_id"), version, "event_type")
    assert(spark.read.parquet(path).count() == 2,
      "seed collapsed per key globally instead of per (partition, key)")
    // a batch touching BOTH partitions must not delete either row
    val batch = Seq((7L, 3L, "click", 12L), (7L, 4L, "purchase", 13L))
      .toDF("user_id", "event_id", "event_type", "ts")
    Writers.upsertPartitioned(spark, path, batch, Seq("user_id"), version, "event_type")
    val got = spark.read.parquet(path).select("user_id", "event_id", "event_type")
    assert(got.count() == 2)
    assert(got.filter($"event_type" === "click").select("event_id").as[Long].head() == 3L)
    assert(got.filter($"event_type" === "purchase").select("event_id").as[Long].head() == 4L)
  }

  test("upsertPartitioned does not delete existing rows in the NULL partition") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-upsert-null")
      .resolve("t").toString
    // partition col NULL holds key 1; the update batch touches the NULL
    // partition with key 2 — dynamic overwrite rewrites that partition, so
    // a non-null-safe touched-join would silently drop key 1's row
    val seed = Seq((1L, 1L, Option("a"), 10L), (9L, 2L, None: Option[String], 10L))
      .toDF("user_id", "event_id", "event_type", "ts")
    val version = Seq(col("ts"), col("event_id"))
    Writers.upsertPartitioned(spark, path, seed, Seq("user_id"), version, "event_type")
    val batch = Seq((8L, 3L, None: Option[String], 11L))
      .toDF("user_id", "event_id", "event_type", "ts")
    Writers.upsertPartitioned(spark, path, batch, Seq("user_id"), version, "event_type")
    val got = spark.read.parquet(path).select($"user_id").as[Long].collect().toSet
    assert(got == Set(1L, 9L, 8L),
      s"NULL-partition merge lost rows: got $got")
  }

  test("writeSorted produces disjoint, internally-sorted files covering all rows") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    val ev = Readers.table(spark, sf, "events").select("event_id", "user_id")
    Writers.writeSorted(ev, out, Seq("event_id"), 4)
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    // per-file: sorted within, and file ranges must not overlap
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "expected multiple range files")
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f.getPath).select("event_id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), s"${f.getName} not sorted within file")
      (ids.min, ids.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, "file key ranges overlap")
      case _ =>
    }
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
