package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends GraftSuite {
  import spark.implicits._

  private def diff(v0: Seq[(Long, String, String)],
                   v1: Seq[(Long, String, String)]): Map[Long, String] =
    Relational.snapshotDiff(
        v0.toDF("id", "a", "b"), v1.toDF("id", "a", "b"),
        Seq("id"), Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("added / removed / changed / unchanged classification") {
    val v0 = Seq((1L, "x", "y"), (2L, "x", "y"), (3L, "x", "y"))
    val v1 = Seq((1L, "x", "y"), (2L, "x", "z"), (4L, "n", "n"))
    assert(diff(v0, v1) == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("null payloads: null≠empty, null==null, value '0' ≠ null") {
    val v0 = Seq((1L, null, "y"), (2L, null, "y"), (3L, "0", "y"))
    val v1 = Seq((1L, "", "y"), (2L, null, "y"), (3L, null, "y"))
    assert(diff(v0, v1) == Map(1L -> "changed", 3L -> "changed"))
  }

  test("field-boundary shifts do not collide: (ab, c) ≠ (a, bc)") {
    val v0 = Seq((1L, "ab", "c"))
    val v1 = Seq((1L, "a", "bc"))
    assert(diff(v0, v1) == Map(1L -> "changed"))
  }

  test("signature diff equals a direct null-safe column compare on q102's corpus") {
    val v0 = graft.sources.Readers.table(spark, sf, "documents")
    val m = pmod(col("doc_id"), lit(17L))
    val v1 = v0.filter(m =!= 3 && m =!= 5)
      .unionByName(v0.filter(m === 5)
        .withColumn("text", concat(col("text"), lit(" v2")))
        .withColumn("n_chars", col("n_chars") + 3L))
      .unionByName(v0.filter(m === 7)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L)))
    val viaSig = Relational.snapshotDiff(v0, v1, Seq("doc_id"),
        Seq("text", "lang", "source", "n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val direct = v0.as("a")
      .join(v1.as("b"), col("a.doc_id") === col("b.doc_id"), "full_outer")
      .select(coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
        col("a.text").as("t0"), col("b.text").as("t1"),
        col("a.lang").as("l0"), col("b.lang").as("l1"),
        col("a.source").as("s0"), col("b.source").as("s1"),
        col("a.n_chars").as("n0"), col("b.n_chars").as("n1"),
        col("a.doc_id").isNotNull.as("in0"), col("b.doc_id").isNotNull.as("in1"))
      .collect().flatMap { r =>
        val id = r.getLong(0)
        val in0 = r.getBoolean(r.fieldIndex("in0"))
        val in1 = r.getBoolean(r.fieldIndex("in1"))
        if (!in0) Some(id -> "added")
        else if (!in1) Some(id -> "removed")
        else {
          val changed = r.get(1) != r.get(2) || r.get(3) != r.get(4) ||
            r.get(5) != r.get(6) || r.get(7) != r.get(8)
          if (changed) Some(id -> "changed") else None
        }
      }.sorted
    assert(viaSig.toSeq == direct.toSeq)
    assert(viaSig.nonEmpty)
  }
}
