package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column↔Expression converters
  * (Spark 4 moved Column onto ColumnNode; custom Catalyst expressions
  * still need the classic conversion). Same pattern public Spark
  * extension libraries use for package-private factory access.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a raw logical plan (classic Dataset.ofRows is
    * package-private) — needed to surface custom logical operators
    * like graft.plans.AsOfJoin as ordinary DataFrames.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
