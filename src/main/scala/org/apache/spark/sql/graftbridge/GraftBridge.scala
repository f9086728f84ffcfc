package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Minimal bridge to the `private[sql]` Column ⇄ Expression converters —
  * the supported way for third-party Catalyst expressions to expose a
  * Column API since the Spark 4 connect/classic split.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a catalyst Expression (the wrapper
    * `ExpressionUtils.expression` returns stays a lazy ColumnNode shell
    * that only the classic Dataset builders unwrap — a custom logical
    * node needs the real UnresolvedAttribute/Cast tree so the analyzer
    * can resolve it).
    */
  def catalystExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)

  /** DataFrame from a (resolved) logical plan — `Dataset.ofRows` is
    * `private[sql]`; custom logical operators need this to return to the
    * public Column/DataFrame world.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
