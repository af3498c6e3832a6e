// 100×-scale ANN staged measurement (run: sbt Test/console < scripts/scale_stage_ann.scala)
// Stages a 200k-vector corpus (100 id-shifted copies of sf0.1 embeddings,
// 64-dim float) and times the ANN family end-to-end with a noop sink. The
// point: after the round-4 zero-shuffle rewrite, index build (IVF cell
// assignment, PQ encode) is a pure projection against a broadcast codebook
// row — cost scales with the scan, the corpus is never shuffled, and the
// only corpus-sized exchange anywhere is the salted ranking prune. Evidence
// recorded in SURVEY §6. Keep statements one-line where fluent (the piped
// REPL parses leading-dot lines as new statements).
import org.apache.spark.sql.functions._
import graft.operators.Similarity

val s = graft.SparkTestBase.spark
import s.implicits._
s.sparkContext.setLogLevel("ERROR")

val base = graft.sources.Readers.table(s, "/root/testdata/sf0.1", "embeddings").select($"vec_id", $"embedding")
val staged = (0 until 100).map(i => base.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"), $"embedding")).reduce(_ unionByName _).repartition(32).localCheckpoint()
println(s"staged vectors: ${staged.count()}")
val queries = staged.filter($"vec_id" < 10)

def time(name: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime()
  f
  println(f"[scaleANN] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

time("brute force top-5 (200k x 10)") { noop(Similarity.bruteForceTopK(staged, queries, "vec_id", "embedding", 5)) }

time("IVF build+search (64 cells, probe 8, 1 Lloyd round)") { noop(Similarity.ivfTopK(staged, queries, "vec_id", "embedding", 5, 64, 8, kmeansIters = 1)) }

time("PQ encode+prescreen+rerank (8 sub x 16 cent, cand 200)") { noop(Similarity.pqTopK(staged, queries, "vec_id", "embedding", 5, 8, 16, 200, kmeansIters = 1, trainSample = 2048)) }

time("IVFPQ composed (64 cells, probe 8, cand 200)") { noop(Similarity.ivfPqTopK(staged, queries, "vec_id", "embedding", 5, 64, 8, 8, 16, 200, kmeansIters = 1, trainSample = 2048)) }

// 100 id-shifted copies ⇒ every vector has 99 exact twins: semantic dedup
// must keep ~1% (lowest-id copy per clique, modulo cell splits)
time("semantic dedup (SemDeDup, 256 cells, 1 Lloyd round, minCos 0.999)") {
  val v = graft.operators.Dedup.semanticDedup(staged, "vec_id", "embedding", 256, 1, 0.999)
  val kept = v.filter($"is_kept").count()
  println(s"[scaleANN] semantic dedup kept $kept of 200000")
}

sys.exit(0)
