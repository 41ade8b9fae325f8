package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessors for `private[sql]` Column↔Expression plumbing — the
  * standard pattern for a library that ships custom Catalyst expressions
  * on Spark 4 (the classic Column constructor moved behind
  * `classic.ExpressionUtils`). Nothing else from the private surface is
  * touched.
  */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom LogicalPlan (classic sessions). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
