package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made Column↔catalyst-Expression conversion `private[sql]`
  * (classic.ExpressionUtils). Libraries providing native expressions need
  * exactly those two calls, so this bridge lives in the org.apache.spark
  * .sql package — the standard extension pattern; no other internals are
  * touched. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
