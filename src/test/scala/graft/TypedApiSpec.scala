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
