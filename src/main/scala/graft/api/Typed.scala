package graft.api

import graft.sources.Readers
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` façade over the core tables — compile-time field
  * checks for pipeline code that touches individual records (the DataFrame
  * operators remain the right tool for schema-generic relational work).
  */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double, props: String)

case class Document(doc_id: Long, text: String, lang: String,
                    source: String, n_chars: Long)

case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

case class UserActivity(user_id: Long, n_events: Long, n_errors: Long,
                        first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp,
                        total_value: Double)

object Typed {

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Readers.table(spark, dir, "events").as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Readers.table(spark, dir, "documents").as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    implicit val enc = Encoders.product[Embedding]
    Readers.table(spark, dir, "embeddings").as[Embedding]
  }

  /** Typed per-user activity profile via groupByKey + mapGroups — the shape
    * for per-entity logic that genuinely needs record-level code. Note the
    * trade-off vs the relational form: mapGroups materializes each group and
    * skips partial aggregation, so for pure aggregates the `groupBy().agg()`
    * relational path scales better; this is for logic Catalyst can't express.
    */
  def userActivity(ds: Dataset[Event]): Dataset[UserActivity] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id).mapGroups { (uid, it) =>
      var n = 0L; var nErr = 0L
      // exact accumulation (the NumFns.exactSum rule at record grain):
      // double `+=` over shuffle-arrival order differs by ±1 ulp across
      // runs — BigDecimal sums are order-independent, cast to double once
      var total = java.math.BigDecimal.ZERO
      // BigDecimal can't represent NaN/Inf (NumberFormatException) — track
      // non-finite values separately and emit IEEE semantics (NaN/Inf
      // poison the sum), matching what double accumulation would produce
      var nonFinite = 0.0
      var first: java.sql.Timestamp = null
      var last: java.sql.Timestamp = null
      it.foreach { e =>
        n += 1
        if (e.event_type == "error") nErr += 1
        if (java.lang.Double.isFinite(e.value))
          total = total.add(new java.math.BigDecimal(e.value))
        else nonFinite += e.value
        // a NULL ts must not NPE the task once a non-null one set `first`
        if (e.ts != null) {
          if (first == null || e.ts.before(first)) first = e.ts
          if (last == null || e.ts.after(last)) last = e.ts
        }
      }
      val totalOut =
        if (nonFinite == 0.0) total.doubleValue() else total.doubleValue() + nonFinite
      UserActivity(uid, n, nErr, first, last, totalOut)
    }
  }

  /** Typed filter+map example: documents over a length threshold projected
    * to (id, token count) with compile-time field access.
    */
  def longDocTokenCounts(ds: Dataset[Document], minChars: Long): Dataset[(Long, Int)] = {
    import ds.sparkSession.implicits._
    ds.filter(_.n_chars >= minChars)
      // a NULL text must not NPE the task (the userActivity ts rule):
      // no text, zero tokens
      .map(d => (d.doc_id,
        if (d.text == null) 0 else d.text.trim.split(" ").length))
  }
}
