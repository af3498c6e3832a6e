// 100×-scale ANN staged measurement (run: sbt Test/console < scripts/scale_stage_ann.scala)
// Stages a 500k-vector corpus (250 id-shifted copies of sf0.1 embeddings,
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
val staged = (0 until 250).map(i => base.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"), $"embedding")).reduce(_ unionByName _).repartition(32).localCheckpoint()
println(s"staged vectors: ${staged.count()}")
val queries = staged.filter($"vec_id" < 10)

def time(name: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime()
  f
  println(f"[scaleANN] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

time("brute force top-5 (500k x 10)") { noop(Similarity.bruteForceTopK(staged, queries, "vec_id", "embedding", 5)) }

time("IVF build+search (64 cells, probe 8, 1 Lloyd round)") { noop(Similarity.ivfTopK(staged, queries, "vec_id", "embedding", 5, 64, 8, kmeansIters = 1)) }

time("PQ encode+prescreen+rerank (8 sub x 16 cent, cand 200)") { noop(Similarity.pqTopK(staged, queries, "vec_id", "embedding", 5, 8, 16, 200, kmeansIters = 1, trainSample = 2048)) }

time("IVFPQ composed (64 cells, probe 8, cand 200)") { noop(Similarity.ivfPqTopK(staged, queries, "vec_id", "embedding", 5, 64, 8, 8, 16, 200, kmeansIters = 1, trainSample = 2048)) }

// 250 id-shifted copies ⇒ every vector has 249 exact twins: semantic dedup
// must keep ~0.4% (lowest-id copy per clique, modulo cell splits)
time("semantic dedup (SemDeDup, 256 cells, 1 Lloyd round, minCos 0.999)") {
  val v = graft.operators.Dedup.semanticDedup(staged, "vec_id", "embedding", 256, 1, 0.999)
  val kept = v.filter($"is_kept").count()
  println(s"[scaleANN] semantic dedup kept $kept of 500000")
}

// SemDeDup's own scale regime: hold CELL SIZE constant by raising k with
// the corpus (500k/640 ≈ the ~780/cell the 200k/256 measurement had) —
// within-cell pair cost is quadratic in cell size, so fixed k degrades
// quadratically while constant-size cells stay linear
time("semantic dedup (SemDeDup, 640 cells — constant cell size, 1 Lloyd round, minCos 0.999)") {
  val v = graft.operators.Dedup.semanticDedup(staged, "vec_id", "embedding", 640, 1, 0.999)
  val kept = v.filter($"is_kept").count()
  println(s"[scaleANN] semantic dedup (640 cells) kept $kept of 500000")
}

// The adversarial structure here is the EXACT-TWIN clique: identical
// vectors land in the same cell by construction, so a w-wide clique costs
// w(w-1)/2 within-cell pairs NO MATTER how many cells — at 250 copies
// that is ~6.2e7 pairs from the cliques alone, and raising k cannot
// remove it. The engine's own guard is the same one q23 ships for text:
// collapse exact duplicates FIRST (a linear hash-groupBy on the vector
// bytes), then run the quadratic stage on uniques only.
time("semantic dedup, exact-vector-collapse FIRST (the q23 composition)") {
  val uniq = staged.groupBy(xxhash64($"embedding").as("_vh")).agg(min($"vec_id").as("vec_id"))
  val kept = graft.operators.Dedup.semanticDedup(
      staged.join(uniq.select($"vec_id"), "vec_id"), "vec_id", "embedding", 640, 1, 0.999)
    .filter($"is_kept").count()
  println(s"[scaleANN] exact-first semantic dedup kept $kept uniques of 500000")
}

sys.exit(0)
