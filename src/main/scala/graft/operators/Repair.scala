package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value repair over keyed time series — forward-fill (LOCF,
  * last observation carried forward) and backward-fill, the standard
  * sensor/telemetry gap-repair pass before feature extraction.
  *
  * Scale shape: one hash shuffle on the series key, then per-key
  * running `last(..., ignoreNulls)` / `first(..., ignoreNulls)` window
  * frames — Spark evaluates the UNBOUNDED PRECEDING frame as a running
  * accumulator (no per-row rescan) and the UNBOUNDED FOLLOWING frame
  * as its reverse. No self-joins, no driver state; values pass through
  * untouched (no arithmetic), so filled outputs are bit-identical to
  * their source observations.
  */
object Repair {

  /** Add `<valueCol>_ffill` / `<valueCol>_bfill` columns.
    *
    * @param ord total per-key ordering (pass tiebreak columns for
    *            determinism when event times can collide)
    */
  def fillGaps(df: DataFrame, key: String, ord: Seq[Column],
      valueCol: String): DataFrame = {
    val back = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn(s"${valueCol}_ffill",
        last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn(s"${valueCol}_bfill",
        first(col(valueCol), ignoreNulls = true).over(fwd))
  }
}
