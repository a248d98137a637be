package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft's native Catalyst
  * expressions. Spark 4 made the direct constructors `private[sql]`
  * (Columns wrap ColumnNodes, not Expressions); this shim lives in the
  * sql package to use the supported internal converter — the same
  * technique extension libraries (frameless, sedona, ...) use.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
