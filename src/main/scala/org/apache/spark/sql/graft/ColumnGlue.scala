package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is private[sql] in Spark 4
  * (Column is ColumnNode-backed, no public expression constructor), so — the
  * standard practice for Spark extension libraries — this one-file shim
  * lives inside the org.apache.spark.sql package to expose the two
  * conversions our DSL needs.
  */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
