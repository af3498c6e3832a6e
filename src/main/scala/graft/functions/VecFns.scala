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

  /** NULL for zero-norm vectors (mirrors SQL 0/0 → NULL; never NaN). */
  def cosine(a: Column, b: Column): Column =
    when(norm(a) > 0 && norm(b) > 0, dot(a, b) / (norm(a) * norm(b)))

  // NOTE: LSH bucket keys live only in graft.plans.LshBucketKey (native,
  // codegen'd). A composed twin existed here but used a different hash
  // derivation, so keeping it as a "reference impl" would be misleading.
}
