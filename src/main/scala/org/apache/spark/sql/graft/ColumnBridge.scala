package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column <-> Expression conversion, so
  * custom Catalyst expressions (graft.expressions.*) can be exposed as
  * user-facing Columns. Lives under org.apache.spark.sql by necessity —
  * the standard pattern for Catalyst extension libraries on Spark 4 where
  * `new Column(expr)` is no longer public API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
