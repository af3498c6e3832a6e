package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal `private[sql]` bridge: convert between public `Column` and
  * Catalyst `Expression` (the Spark 4 Column is a ColumnNode wrapper; the
  * conversion helpers live behind `private[sql]`). This is the standard
  * extension-library pattern — no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
