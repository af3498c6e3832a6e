package graft.operators

import graft.plans.NativeFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2b). Brute-force is the correctness baseline; the LSH-bucketed
  * variant is the scale path (candidates only within matching buckets).
  */
object Similarity {

  /** Brute-force cosine top-k: queries × corpus scored pairwise, then
    * row_number per query. The query set is small and broadcast; the corpus
    * is never collected. Ranking is over the *rounded* score with the
    * neighbor id as tiebreaker so results are deterministic across engines.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(queries.as("q")),
        col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(col(s"q.$idCol").as("query_id"), col(s"c.$idCol").as("neighbor_id"),
        round(NativeFns.cosineSim(col(s"q.$vecCol"), col(s"c.$vecCol")), 4).as("cos"))
    scored
      .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("neighbor_id")))
          .cast("long"))
      .filter(col("rnk") <= k)
  }

  /** IVF (inverted-file) ANN: partition the corpus into cells around coarse
    * centroids; a query probes only its `nProbe` nearest cells. The classic
    * FAISS-style scale path: assignment is one broadcast pass over the corpus
    * (centroid count is small by construction), search touches
    * ~nProbe/numCells of the corpus instead of all of it.
    *
    * The coarse quantizer here is deterministic — the first `numCells` corpus
    * vectors by id — so specs and reruns are stable with no RNG and no
    * training loop. A k-means quantizer would balance cells better at equal
    * recall; the operator shape (assign → invert → probe → score) is
    * unchanged by that substitution.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numCells: Int, nProbe: Int): DataFrame = {
    val centroids = corpus.orderBy(col(idCol)).limit(numCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("cvec"))
    // assignment: nearest centroid per corpus vector. Broadcast nested-loop
    // against the tiny centroid table, then a map-side-combinable max_by —
    // the corpus is never shuffled on anything wider than its own id.
    val cells = corpus.as("c")
      .join(broadcast(centroids))
      .groupBy(col(s"c.$idCol").as("nid"))
      .agg(max_by(col("cell_id"),
        struct(NativeFns.cosineSim(col(s"c.$vecCol"), col("cvec")).as("sim"),
          (-col("cell_id")).as("tb"))).as("cell_id"))
    val inverted = corpus.join(cells, col(idCol) === col("nid"))
      .select(col("cell_id"), col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    // probe list: nProbe nearest cells per query (queries are small)
    val probes = queries.as("q")
      .join(broadcast(centroids))
      .select(col(s"q.$idCol").as("query_id"), col(s"q.$vecCol").as("qv"),
        col("cell_id"),
        NativeFns.cosineSim(col(s"q.$vecCol"), col("cvec")).as("csim"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("csim").desc, col("cell_id"))))
      .filter(col("crnk") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell_id"))
    probes.join(inverted, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(NativeFns.cosineSim(col("qv"), col("nvec")), 4).as("cos"))
      .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("neighbor_id")))
          .cast("long"))
      .filter(col("rnk") <= k)
  }

  /** LSH-bucketed ANN: hash corpus and queries into random-hyperplane
    * buckets; score only within the query's bucket. Probing multiple band
    * tables (numTables) trades recall for fan-out. Returns top-k per query
    * among candidates.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int, numTables: Int): DataFrame = {
    def bucketed(df: DataFrame): DataFrame =
      df.select(col(idCol), col(vecCol),
        explode(array((0 until numTables).map(t =>
          struct(lit(t).as("table"),
            NativeFns.lshKey(col(vecCol), numPlanes, seed = 42L + t).as("key"))): _*))
          .as("bucket"))
    val c = bucketed(corpus).as("c")
    val q = bucketed(queries).as("q")
    val cand = q.join(c,
        col("q.bucket") === col("c.bucket") && col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(col(s"q.$idCol").as("query_id"), col(s"c.$idCol").as("neighbor_id"),
        col(s"q.$vecCol").as("qv"), col(s"c.$vecCol").as("cv"))
      .dropDuplicates("query_id", "neighbor_id")
    cand
      .select(col("query_id"), col("neighbor_id"),
        round(NativeFns.cosineSim(col("qv"), col("cv")), 4).as("cos"))
      .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("neighbor_id")))
          .cast("long"))
      .filter(col("rnk") <= k)
  }
}
