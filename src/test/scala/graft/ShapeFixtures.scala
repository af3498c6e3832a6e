package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The three reference corpus shapes of the §5 table, shared by the
  * router specs (NearDupAutoSpec: batch dispatch + recall; RoutedIngestSpec:
  * streaming routed ingest parity). Deterministic generators — xxhash64 of
  * (doc_id, pos, salt) — so reruns and the two suites see identical corpora.
  */
trait ShapeFixtures { self: GraftSuite =>

  protected val V = 4000
  protected def zipfToken(docId: org.apache.spark.sql.Column,
                          pos: org.apache.spark.sql.Column,
                          salt: String): org.apache.spark.sql.Column = {
    val u = (abs(xxhash64(docId, pos, lit(salt))) % lit(1000000007L))
      .cast("double") / lit(1000000007.0)
    concat(lit("t"), least(lit(V), greatest(lit(1),
      ceil(pow(lit(V.toDouble), u)))).cast("long"))
  }

  /** Long-tailed realistic shape: 400 zipf docs + strong twins of every
    * 40th (the ZipfDfCapSpec construction, smaller).
    */
  protected lazy val zipfCorpus: DataFrame = {
    val base = spark.range(1, 401).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), lit(60)),
          p => zipfToken(col("doc_id"), p, "base"))))
    val twins = spark.range(1, 401, 40).toDF("base_id")
      .select((col("base_id") + lit(100000L)).as("doc_id"), col("base_id"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), lit(60)), p =>
          when(p.between(55, 60), zipfToken(col("base_id"), p, "twin"))
            .otherwise(zipfToken(col("base_id"), p, "base")))))
      .drop("base_id")
    base.unionByName(twins)
  }

  /** Degenerate clone shape: 40 distinct zipf texts, 10 ids each. */
  protected lazy val cloneCorpus: DataFrame =
    spark.range(0, 400).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), lit(60)),
          p => zipfToken(pmod(col("doc_id"), lit(40L)), p, "clone"))))

  /** Template shape: 5 templates, 80 docs each, ONE position perturbed
    * per doc — normalized texts all distinct (cloneRate 0) but almost
    * every shingle is shared template content (dfHeadShare ≈ 1).
    */
  protected lazy val templateCorpus: DataFrame =
    spark.range(0, 400).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), lit(60)), p =>
          when(p === (pmod(col("doc_id"), lit(50L)) + 5).cast("int"),
            concat(lit("u"), col("doc_id")))
            .otherwise(zipfToken(pmod(col("doc_id"), lit(5L)), p, "tmpl")))))
}
