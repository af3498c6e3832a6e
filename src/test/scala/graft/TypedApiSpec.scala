package graft

import graft.api.Typed
import org.apache.spark.sql.functions._

class TypedApiSpec extends GraftSuite {
  import spark.implicits._

  test("typed events dataset round-trips the schema") {
    val ds = Typed.events(spark, sf)
    val one = ds.head()
    assert(one.event_id >= 0 && one.user_id >= 0)
    assert(ds.count() == graft.sources.Readers.table(spark, sf, "events").count())
  }

  test("typed userActivity agrees with the relational aggregation") {
    val ds = Typed.events(spark, sf)
    val typed = Typed.userActivity(ds)
      .select($"user_id", $"n_events", $"n_errors")
      .orderBy("user_id").collect().toSeq
    val relational = graft.sources.Readers.table(spark, sf, "events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_errors"))
      .select($"user_id", $"n_events", $"n_errors")
      .orderBy("user_id").collect().toSeq
    assert(typed == relational)
  }

  test("typed userActivity survives NaN/Infinite event values (r8 ADVICE fix)") {
    import graft.api.Event
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ds = Seq(
      Event(1L, ts, 7L, "view", 1.5, "{}"),
      Event(2L, ts, 7L, "view", Double.NaN, "{}"),
      Event(3L, ts, 8L, "view", Double.PositiveInfinity, "{}"),
      Event(4L, ts, 8L, "view", 2.0, "{}"),
      Event(5L, ts, 9L, "view", 3.0, "{}")).toDS()
    val got = Typed.userActivity(ds).collect().map(u => u.user_id -> u.total_value).toMap
    // BigDecimal can't hold NaN/Inf — the fix accumulates finite values
    // exactly and lets non-finite ones poison the total IEEE-style
    assert(got(7L).isNaN, "NaN value must propagate, not crash the task")
    assert(got(8L).isPosInfinity)
    assert(got(9L) == 3.0)
  }

  test("typed document filter+map") {
    val got = Typed.longDocTokenCounts(Typed.documents(spark, sf), 300L).collect()
    assert(got.nonEmpty)
    assert(got.forall(_._2 >= 10))
  }

  test("typed embeddings expose Array[Float] vectors") {
    val e = Typed.embeddings(spark, sf).head()
    assert(e.embedding.length == 64)
  }
}
