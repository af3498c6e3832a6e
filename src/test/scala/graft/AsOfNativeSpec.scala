package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

class AsOfNativeSpec extends GraftSuite {
  import spark.implicits._

  test("native as-of join semantics on crafted rows") {
    val left = Seq((10L, 1L, "2024-01-01 02:00:00"), (11L, 1L, "2024-01-01 00:30:00"),
      (12L, 2L, "2024-01-01 00:10:00"), (13L, 3L, "2024-01-01 09:00:00"))
      .toDF("event_id", "user_id", "s")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"))
    val right = Seq((1L, "2024-01-01 00:00:00", 100.0), (1L, "2024-01-01 01:00:00", 200.0),
      (2L, "2024-01-01 00:20:00", 300.0))
      .toDF("user_id", "s", "v")
      .select($"user_id", to_timestamp($"s").as("ts"), $"v")
    val got = AsOf.join(left, right, "user_id", "ts", Seq("v"))
      .select($"event_id", $"v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(10L).contains(200.0)) // latest <= 02:00
    assert(got(11L).contains(100.0)) // only 00:00 qualifies
    assert(got(12L).isEmpty)         // right row later than left ts
    assert(got(13L).isEmpty)         // key has no right rows at all
  }

  test("matched ref with NULL carry value yields NULL (not an older non-null) — both impls") {
    val left = Seq((10L, 1L, "2024-01-01 03:00:00"))
      .toDF("event_id", "user_id", "s")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"))
    val right = Seq((1L, "2024-01-01 01:00:00", Some(5.0)), (1L, "2024-01-01 02:00:00", None))
      .toDF("user_id", "s", "v")
      .select($"user_id", to_timestamp($"s").as("ts"), $"v")
    val native = AsOf.join(left, right, "user_id", "ts", Seq("v"))
      .select($"v").collect().map(r => Option(r.get(0))).toSeq
    val composed = graft.operators.TimeSeries.asofJoin(left, right, "user_id", "ts", Seq("v"))
      .select($"v").collect().map(r => Option(r.get(0))).toSeq
    assert(native == Seq(None), s"native carried $native")
    assert(composed == Seq(None), s"composed carried $composed")
  }

  test("NULL-ts/NULL-key reference rows match nothing — both impls agree") {
    val left = Seq((10L, 1L, "2024-01-01 02:00:00"))
      .toDF("event_id", "user_id", "s")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"))
    // the only refs for user 1 have NULL ts or NULL key: a match is undefined
    // (NULL inequality is false), so the event must carry NULL — a naive
    // union+window would sort NULL ts first and leak v=9.0 forward
    val right = Seq((Some(1L), None: Option[String], 9.0),
        (None: Option[Long], Some("2024-01-01 01:00:00"), 8.0))
      .toDF("user_id", "s", "v")
      .select($"user_id", to_timestamp($"s").as("ts"), $"v")
    val native = AsOf.join(left, right, "user_id", "ts", Seq("v"))
      .select($"v").collect().map(r => Option(r.get(0))).toSeq
    val windowed = graft.operators.TimeSeries.asofJoin(left, right, "user_id", "ts", Seq("v"))
      .select($"v").collect().map(r => Option(r.get(0))).toSeq
    assert(native == Seq(None), s"native leaked a NULL-ts ref: $native")
    assert(windowed == Seq(None), s"union+window leaked a NULL-ts ref: $windowed")
  }

  test("as-of join rejects key/ts type drift between sides at plan time") {
    val left = Seq((1L, 1L)).toDF("user_id", "tsv")
      .select($"user_id".cast("int").as("user_id"), to_timestamp(lit("2024-01-01")).as("ts"))
    val right = Seq((1L, 1.0)).toDF("user_id", "v")
      .select($"user_id", to_timestamp(lit("2024-01-01")).as("ts"), $"v")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(left, right, "user_id", "ts", Seq("v"))
    }
    assert(e.getMessage.contains("key type mismatch"))
  }

  test("native as-of join handles string keys (buffer-backed key copies)") {
    val left = Seq((1L, "alice", "2024-01-01 02:00:00"), (2L, "alice", "2024-01-01 03:00:00"),
      (3L, "bob", "2024-01-01 02:00:00"), (4L, "carol", "2024-01-01 02:00:00"))
      .toDF("event_id", "k", "s")
      .select($"event_id", $"k", to_timestamp($"s").as("ts"))
    val right = Seq(("alice", "2024-01-01 01:00:00", 1.0), ("bob", "2024-01-01 01:30:00", 2.0))
      .toDF("k", "s", "v")
      .select($"k", to_timestamp($"s").as("ts"), $"v")
    val got = AsOf.join(left, right, "k", "ts", Seq("v"))
      .select($"event_id", $"v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> Some(1.0), 2L -> Some(1.0), 3L -> Some(2.0), 4L -> None))
  }

  test("native as-of join equals the union+window formulation on testdata") {
    val ev = graft.sources.Readers.table(spark, sf, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"value".as("signup_value"))
    val native = AsOf.join(purchases, signups, "user_id", "ts", Seq("signup_value"))
      .select($"event_id", $"user_id", $"signup_value")
      .orderBy("event_id").collect().toSeq
    val composed = graft.operators.TimeSeries
      .asofJoin(purchases, signups, "user_id", "ts", Seq("signup_value"))
      .select($"event_id", $"user_id", $"signup_value")
      .orderBy("event_id").collect().toSeq
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("native as-of join plans as AsOfJoinExec with shuffle+sort, no nested loop") {
    val ev = graft.sources.Readers.table(spark, sf, "events")
    val l = ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"value".as("signup_value"))
    val plan = AsOf.join(l, r, "user_id", "ts", Seq("signup_value"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"no AsOfJoin node:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    assert(plan.contains("Exchange hashpartitioning(user_id"), s"no co-partitioning:\n$plan")
  }
}
