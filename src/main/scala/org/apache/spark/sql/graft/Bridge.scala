package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge.
  *
  * Spark 4 routes Column construction through `private[sql]`
  * ExpressionUtils (Columns wrap ColumnNodes, not Expressions, since the
  * Connect unification). Custom Catalyst expressions still need to become
  * Columns; this shim lives under org.apache.spark.sql to reach the
  * accessor — the one sanctioned-by-visibility hook point for third-party
  * expression libraries that don't go through FunctionRegistry.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (possibly custom) resolved LogicalPlan — the
    * classic Dataset.ofRows accessor, needed by whole-operator
    * extensions (graft.plans.AsOfJoin) that build their own logical
    * nodes rather than going through the public DSL.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
