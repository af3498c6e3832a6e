package graft

import graft.operators.{Dedup, Scoring, Similarity}
import org.apache.spark.sql.functions._

/** Staged 100× measurements for the round-7c audit operators that shipped
  * without one (judge r7 #4): q93 leaked-grams, q94 source-drift TV, and
  * q95 cluster-balance TV. Same method as the earlier stages — id-shifted
  * copies of sf0.1 documents to 500k docs (100-wide exact-dup cliques) /
  * sf0.1 embeddings to 200k vectors, noop sink, wall-clock printed.
  * Run: `sbt "Test/runMain graft.ScaleStageR8"`. Evidence in SURVEY §5.
  */
object ScaleStageR8 {
  def main(args: Array[String]): Unit = {
    val s = SparkTestBase.spark
    import s.implicits._
    s.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scaleR8] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "documents")
      .select($"doc_id", $"text", $"lang", $"source")
    val docsStaged = (0 until 100).map(i => docs.select(
        ($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text", $"lang", $"source"))
      .reduce(_ unionByName _).repartition(64).localCheckpoint()
    println(s"staged docs: ${docsStaged.count()}")

    // q93 at 500k: hash-grain counting on both sides means the wide dup
    // cliques inflate ROW COUNTS linearly (100× the gram postings), not
    // pair counts — the distinct-doc aggregation is the only corpus-sized
    // shuffle; string grams resolve only for the top-k held-side leaks.
    // Held split rule matches the q93 contract (≈5% of docs).
    time("contaminationGramReport (3-grams, top-50) on 500k docs") {
      noop(Dedup.contaminationGramReport(docsStaged, $"doc_id", $"text",
        pmod(pmod($"doc_id", lit(100003L)) * 2654435761L, lit(100L)) >= 95,
        3, 50))
    }

    // q94 at 500k: one tokenize pass into a (source, token)-histogram
    // map-side collapse; everything after is vocab-sized DECIMAL math.
    time("sourceDriftTV on 500k docs") {
      noop(Scoring.sourceDriftTV(docsStaged, $"source", $"text"))
    }

    // q95 at 200k vectors: the zero-shuffle broadcast argmax assignment
    // feeding the TV core; label join is on the staged table itself
    val embs = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "embeddings")
    val embsStaged = (0 until 100).map(i => embs.select(
        ($"vec_id" + lit(i * 1000000L)).as("vec_id"), $"embedding", $"label"))
      .reduce(_ unionByName _).repartition(64).localCheckpoint()
    println(s"staged vectors: ${embsStaged.count()}")
    time("kmeansAssign(16) -> groupDriftTV(label) on 200k vectors") {
      val assigned = Similarity.kmeansAssign(embsStaged, "vec_id", "embedding",
        k = 16, iters = 0)
      noop(Scoring.groupDriftTV(
        assigned.filter($"cell_id".isNotNull)
          .join(embsStaged.select($"vec_id", $"label"), "vec_id"),
        $"cell_id", $"label"))
    }

    s.stop()
  }
}
