package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. Spark 4 routes Columns through
  * ColumnNodes and keeps the converters private[sql]; living in a
  * subpackage of org.apache.spark.sql grants graft's custom expressions
  * (e.g. [[DotProductDouble]]) access without reflection. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
