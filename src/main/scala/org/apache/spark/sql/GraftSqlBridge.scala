package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge to `private[sql]` Column↔Expression converters, so the engine's
 * custom Catalyst expressions (e.g. graft.functions.Murmur3Positive) can be
 * exposed as user-facing Columns in Spark 4's classic runtime.
 */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
