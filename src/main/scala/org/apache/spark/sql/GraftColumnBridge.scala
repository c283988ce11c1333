package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-private bridge to `classic.ExpressionUtils` (Column ⇄
  * catalyst Expression), the supported-but-`private[sql]` seam for
  * wiring native expressions like `graft.expressions.PolyHashFP` into
  * the DataFrame DSL without an SQL-registry round trip. Same
  * justified-bridge pattern as `org.apache.spark.GraftListenerBus`.
  * `ofRows` is the matching seam for LOGICAL-PLAN-level operators
  * (`graft.plans.AsofJoinNode`): wrap a custom node over analyzed
  * children back into a DataFrame. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Batch DataFrame over already-computed InternalRows — the V1
    * streaming Sink seam: `addBatch`'s incoming frame carries a
    * streaming-tagged plan that batch writers refuse, so sinks
    * re-wrap `queryExecution.toRdd` as a LogicalRDD (the same
    * public-knowledge pattern Delta's V1 DeltaSink uses). */
  def ofInternalRows(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow]): DataFrame = {
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(schema)
    ofRows(spark, org.apache.spark.sql.execution.LogicalRDD(attrs, rdd)(
      spark.asInstanceOf[classic.SparkSession]))
  }
}
