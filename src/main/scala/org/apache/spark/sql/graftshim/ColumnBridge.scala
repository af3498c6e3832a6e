package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** Minimal `private[sql]` bridge: convert between public `Column` and
  * Catalyst `Expression` (the Spark 4 Column is a ColumnNode wrapper; the
  * conversion helpers live behind `private[sql]`), build a DataFrame from a
  * custom LogicalPlan, and fetch interpreted orderings. This is the standard
  * extension-library pattern — no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def orderingFor(dt: DataType): Ordering[Any] =
    TypeUtils.getInterpretedOrdering(dt).asInstanceOf[Ordering[Any]]
}
