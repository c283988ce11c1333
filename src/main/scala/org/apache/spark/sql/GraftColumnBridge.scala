package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private bridge to `classic.ExpressionUtils` (Column ⇄
  * catalyst Expression), the supported-but-`private[sql]` seam for
  * wiring native expressions like `graft.expressions.PolyHashFP` into
  * the DataFrame DSL without an SQL-registry round trip. Same
  * justified-bridge pattern as `org.apache.spark.GraftListenerBus`. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
