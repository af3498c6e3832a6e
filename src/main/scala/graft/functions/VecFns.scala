package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY §2b: near-dup
  * and ANN operators). Composed from `zip_with`/`aggregate` so Catalyst
  * codegens the loop; math is done in double for oracle parity.
  */
object VecFns {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign bit of the dot product with a deterministic pseudo-random
    * hyperplane (seeded per plane) — random-hyperplane LSH for q27. The
    * "plane" components are hash-derived in [-0.5, 0.5).
    */
  def hyperplaneBit(vec: Column, planeSeed: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
        val h = pmod(xxhash64(i, lit(planeSeed)), lit(1000000L)).cast("double") / 1000000.0 - 0.5
        x.cast("double") * h
      }),
      lit(0.0), (acc, v) => acc + v)
    when(proj >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** Pack k hyperplane bits into a single long LSH bucket key. */
  def lshKey(vec: Column, numPlanes: Int): Column =
    (0 until numPlanes).map(p => hyperplaneBit(vec, p) * (1L << p)).reduce(_ + _)
}
