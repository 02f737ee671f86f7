package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression↔Column bridge for custom Catalyst expressions. The classic
  * converters are `private[sql]` in Spark 4, so this lives inside the sql
  * package — the standard pattern used by Spark extension libraries. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
