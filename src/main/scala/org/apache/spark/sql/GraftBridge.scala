package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression↔Column bridge for custom Catalyst expressions. The classic
  * converters are `private[sql]` in Spark 4, so this lives inside the sql
  * package — the standard pattern used by Spark extension libraries. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function into an EXISTING session's FunctionRegistry.
    * `sessionState` is `private[sql]` in Spark 4, hence bridged here;
    * new sessions should prefer `spark.sql.extensions=graft.GraftExtensions`. */
  def registerFunction(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
