package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> Expression converters, the
  * standard pattern for libraries that ship native Catalyst expressions
  * (Spark 4 removed the public `Column(expr)` constructor in favor of
  * ColumnNode; `classic.ExpressionUtils` is the supported classic-mode
  * conversion).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
