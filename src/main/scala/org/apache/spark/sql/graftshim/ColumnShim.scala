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
}
