package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers with engine-independent semantics. */
object NumFns {

  /** Round-half-up on the exact binary double: floor(x·10ⁿ + 0.5)/10ⁿ
    * (non-negative x). Unlike Spark's `round`, which rounds the *shortest
    * decimal representation* of the double (BigDecimal.valueOf), this is a
    * pure IEEE formula — any engine computing the same input double gets the
    * same output, which is what an external oracle needs.
    */
  def roundHalfUp(x: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(x * p + 0.5) / p
  }
}
