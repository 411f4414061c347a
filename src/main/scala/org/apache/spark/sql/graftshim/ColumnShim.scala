package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between raw Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 marks the Expression↔Column converters `private[sql]`
  * (columnNodeSupport.scala), so a library defining its own native
  * expressions (graft.functions.FloatVecDot) needs an accessor compiled
  * inside the `org.apache.spark.sql` package tree. This is the standard
  * pattern used by expression-defining Spark libraries; no Spark internals
  * are modified.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Run a hand-built logical plan (`Dataset.ofRows` is `private[sql]`).
    * Used to exercise the GraftSqlParser lowering on sessions that were
    * built without the extension installed (e.g. the driver's Verify
    * session). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session's SQL parser (`sessionState` is `private[sql]`). */
  def parsePlan(spark: org.apache.spark.sql.SparkSession, sql: String)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parsePlan(sql)
}
