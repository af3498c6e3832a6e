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

  /** Deterministic top-k per query over a (query_id, neighbor_id, cos)
    * frame: rank over the ROUNDED score with neighbor_id as tiebreaker so
    * the exact baseline and every ANN variant rank identically (and match
    * the DuckDB oracle). This contract lives in exactly one place — the
    * recall specs compare these operators against each other.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("neighbor_id")))
          .cast("long"))
      .filter(col("rnk") <= k)

  /** Nearest-centroid cell per corpus vector: broadcast the (small) centroid
    * table, score, keep the arg-max cell with the lower cell_id winning
    * ties. Shared by the k-means trainer and the IVF index build so the
    * quantizer and the index can never disagree on cell membership.
    * Emits (nid, cell_id[, v] — vector kept when `carryVec`).
    */
  private def assignCells(corpus: DataFrame, centroids: DataFrame,
                          idCol: String, vecCol: String,
                          carryVec: Boolean): DataFrame = {
    val best =
      if (carryVec)
        max_by(struct(col("cell_id"), col(s"c.$vecCol").as("v")),
          struct(NativeFns.cosineSim(col(s"c.$vecCol"), col("cvec")).as("sim"),
            (-col("cell_id")).as("tb"))).as("best")
      else
        max_by(struct(col("cell_id")),
          struct(NativeFns.cosineSim(col(s"c.$vecCol"), col("cvec")).as("sim"),
            (-col("cell_id")).as("tb"))).as("best")
    val assigned = corpus.as("c")
      .join(broadcast(centroids))
      .groupBy(col(s"c.$idCol").as("nid"))
      .agg(best)
    if (carryVec)
      assigned.select(col("nid"), col("best.cell_id").as("cell_id"), col("best.v").as("v"))
    else
      assigned.select(col("nid"), col("best.cell_id").as("cell_id"))
  }

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
    topKPerQuery(scored, k)
  }

  /** Coarse quantizer for [[ivfTopK]]: Lloyd k-means with deterministic
    * seeding (first `k` corpus vectors by id — no RNG, so specs and reruns
    * are stable). Each iteration is one broadcast assignment pass over the
    * corpus plus one element-wise mean (posexplode → groupBy (cell, dim) —
    * a corpus×dim shuffle, but of scalars, and at 100 TB the quantizer is
    * trained on a fixed-size sample, not the full corpus). Cells that end an
    * iteration empty simply drop out (standard Lloyd behavior); intermediate
    * centroid tables are checkpointed per iteration and released.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): DataFrame = {
    var (cent, centBlocks) = Checkpoints.tracked(
      corpus.orderBy(col(idCol)).limit(k)
        .select(col(idCol).cast("long").as("cell_id"),
          col(vecCol).cast("array<float>").as("cvec")))
    for (_ <- 0 until iters) {
      val assigned = assignCells(corpus, cent, idCol, vecCol, carryVec = true)
      val (next, nextBlocks) = Checkpoints.tracked(
        assigned
          .select(col("cell_id"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("cell_id"), col("pos"))
          .agg(avg(col("x")).as("m"))
          .groupBy(col("cell_id"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            e => e("m").cast("float")).as("cvec")))
      cent = next
      // RDD-level release: Dataset.unpersist is a no-op for localCheckpoints
      Checkpoints.release(centBlocks)
      centBlocks = nextBlocks
    }
    cent
  }

  /** IVF (inverted-file) ANN: partition the corpus into cells around coarse
    * centroids; a query probes only its `nProbe` nearest cells. The classic
    * FAISS-style scale path: assignment is one broadcast pass over the corpus
    * (centroid count is small by construction), search touches
    * ~nProbe/numCells of the corpus instead of all of it.
    *
    * The coarse quantizer is [[kmeansCentroids]] — deterministic first-N
    * seeding refined by `kmeansIters` Lloyd iterations (0 keeps the raw
    * seeds). The operator shape (assign → invert → probe → score) is
    * independent of the quantizer quality; index build and quantizer share
    * [[assignCells]], so cell membership is decided by one code path.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numCells: Int, nProbe: Int, kmeansIters: Int = 0): DataFrame = {
    val centroids = kmeansCentroids(corpus, idCol, vecCol, numCells, kmeansIters)
    val cells = assignCells(corpus, centroids, idCol, vecCol, carryVec = false)
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
    val scored = probes.join(inverted, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(NativeFns.cosineSim(col("qv"), col("nvec")), 4).as("cos"))
    topKPerQuery(scored, k)
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
    // score BEFORE the pair dedup: a pair surfacing in several tables has
    // the identical score in each, so results are unchanged, and the
    // dropDuplicates exchange then shuffles three scalars per row instead
    // of two full embedding vectors (which would dominate the exchange
    // payload at scale); the duplicate cosine evaluations are map-side
    val scored = q.join(c,
        col("q.bucket") === col("c.bucket") && col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(col(s"q.$idCol").as("query_id"), col(s"c.$idCol").as("neighbor_id"),
        round(NativeFns.cosineSim(col(s"q.$vecCol"), col(s"c.$vecCol")), 4).as("cos"))
      .dropDuplicates("query_id", "neighbor_id")
    topKPerQuery(scored, k)
  }
}
