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

  /** Register a named SQL function backed by a `Column => Column` composition
    * of built-in (codegen'd) expressions — unlike `spark.udf.register` this
    * adds no black-box UDF call: the function inlines into the caller's plan
    * and stays inside whole-stage codegen. `sessionState` is `private[sql]`,
    * hence this lives in the shim package.
    */
  def registerColumnFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      arity: Int,
      f: Seq[Column] => Column): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity, s"$name expects $arity argument(s), got ${exprs.length}")
        expression(f(exprs.map(column)))
      },
      "built-in")
  }
}
