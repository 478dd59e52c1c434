package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's private[sql] Column ↔ Catalyst Expression
  * converters, needed to expose custom Catalyst expressions (e.g.
  * graft.functions.RollingHash) through the public Column API. */
object GraftColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
