package graft

/** One-off measurement harness for the r8 recall-floor pinning: recall@5 of
  * each approximate contract configuration vs the q26 brute-force truth.
  * `Test/runMain graft.RecallMeasureR8 [sfDir...]`.
  */
object RecallMeasureR8 {
  def main(args: Array[String]): Unit = {
    // the SAME session config the pinning spec (RecallFloorSpec) runs
    // under — measured numbers and asserted floors must not come from
    // differently-configured sessions
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      def res(name: String): Set[(Long, Long)] =
        SparkEntry.queries(name)(s, dir)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = res("q26_ann_bruteforce")
      for (q <- Seq("q27_ann_lsh", "q48_ann_ivf", "q63_ann_pq", "q65_ann_ivfpq")) {
        val got = res(q)
        println(f"[recall] $dir $q recall@5 = ${(got & truth).size.toDouble / truth.size}%.3f")
      }
      // LSH parameter sweep: planes x tables
      import org.apache.spark.sql.functions.col
      val embs = graft.sources.Readers.table(s, dir, "embeddings")
      val queries = embs.filter(col("vec_id") < 10)
      for ((planes, tables) <- Seq((8, 1), (6, 4), (4, 8), (4, 16), (3, 12))) {
        val got = graft.operators.Similarity
          .lshTopK(embs, queries, "vec_id", "embedding", 5, planes, tables)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[recall] $dir lsh planes=$planes tables=$tables recall@5 = ${(got & truth).size.toDouble / truth.size}%.3f")
      }
      for (cand <- Seq(50, 100, 200)) {
        val got = graft.operators.Similarity
          .pqTopK(embs, queries, "vec_id", "embedding", k = 5, numSub = 8,
            numCentroids = 16, candidates = cand, kmeansIters = 1, trainSample = 2048)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[recall] $dir pq cand=$cand recall@5 = ${(got & truth).size.toDouble / truth.size}%.3f")
      }
      for ((nProbe, cand) <- Seq((4, 50), (4, 100), (6, 100), (8, 100))) {
        val got = graft.operators.Similarity
          .ivfPqTopK(embs, queries, "vec_id", "embedding", k = 5, numCells = 16,
            nProbe = nProbe, numSub = 8, numCentroids = 16, candidates = cand,
            kmeansIters = 1, trainSample = 2048)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[recall] $dir ivfpq probe=$nProbe cand=$cand recall@5 = ${(got & truth).size.toDouble / truth.size}%.3f")
      }
    }
    s.stop()
  }
}
