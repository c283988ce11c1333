package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (dominance frontier): rows not dominated by any
  * other row, where `a` dominates `b` iff `a.x <= b.x && a.y <= b.y`
  * and at least one is strict (smaller-is-better on both axes).
  *
  * Shape at scale — the naive formulation is an O(n²) self-join
  * (`NOT EXISTS (SELECT 1 ... WHERE dominates)`), which is exactly what
  * the DuckDB oracle runs at sf0.01. This operator exploits that a row
  * is dominated iff
  *
  *   (some strictly-smaller x has y' <= y)  OR
  *   (some equal x has y' < y)
  *
  * and both conditions depend only on per-x minimums of y. So:
  *
  *   1. `groupBy(x).agg(min(y))` — a fully parallel map-side-combined
  *      aggregation that collapses n rows to |distinct x| rows;
  *   2. a prefix-min window over that TINY per-x relation (the only
  *      single-partition step, on |distinct x| rows — for a continuous
  *      x at extreme cardinality swap in the range-repartition fold of
  *      [[DistributedRank]]; for real skyline axes like `p_size` the
  *      per-x relation is thousands of rows at 100 TB);
  *   3. broadcast the per-x thresholds back and filter map-side.
  *
  * Total cost: one shuffle of (x, y) pairs + a broadcast — no pair
  * blowup, no full-data global sort, survives a 100× scale-up.
  */
object Skyline {

  /** Keep the Pareto frontier of `df` on (xCol asc-better, yCol
    * asc-better). Ties on both axes all survive (mutual non-strict
    * dominance keeps every copy, matching the NOT EXISTS semantics). */
  def frontier2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(col(xCol))
      .agg(min(col(yCol)).as("min_y_same"))
    val wBelow = Window.orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val thresholds = perX
      .withColumn("min_y_below", min(col("min_y_same")).over(wBelow))
    df.join(broadcast(thresholds), xCol)
      // dominated iff (exists x' < x with y' <= y) or
      //               (exists x' = x with y' <  y)
      .filter(
        (col("min_y_below").isNull || col("min_y_below") > col(yCol)) &&
          col("min_y_same") >= col(yCol))
      .drop("min_y_below", "min_y_same")
  }
}
