package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression↔Column conversion for custom Catalyst expressions.
  * `ExpressionUtils` is `private[sql]` in Spark 4, so this one-liner lives
  * in a child package of `org.apache.spark.sql` — the standard technique
  * Spark extension libraries use to reach the classic-session internals.
  * Works with any session; no function-registry registration required. */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
