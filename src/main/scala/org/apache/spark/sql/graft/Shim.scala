package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst [[Expression]]s and the public
  * [[Column]] API. Spark 4 removed `new Column(expr)` in favor of
  * connect-compatible `ColumnNode`s; the classic bridge lives in
  * `org.apache.spark.sql.classic.ExpressionUtils` (`private[sql]`), so this
  * one-file subpackage exposes exactly the two conversions graft needs.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
