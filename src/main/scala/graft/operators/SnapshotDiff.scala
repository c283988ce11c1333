package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lakehouse snapshot diff: classify every key of two table versions
  * as `added` / `removed` / `changed` (and name the changed columns)
  * — the table-history / CDC-derivation operator behind OPTIMIZE-era
  * maintenance, replication audits, and incremental-load validation.
  *
  * Shape: ONE full-outer equi-join on the key (the minimum possible —
  * both sides must meet once); column comparison is a null-safe
  * codegen'd expression per compared column, no per-row driver work.
  * Unchanged keys are dropped BEFORE the join output materializes
  * anything wide, so the result is proportional to the churn, not the
  * table. At 100 TB both sides would be bucketed on the key to make
  * this join shuffle-free across daily runs.
  */
object SnapshotDiff {

  /** (key cols…, change_type, changed_cols) — `changed_cols` is the
    * comma-joined sorted list of differing columns (empty for
    * added/removed). `compareCols` must exist in both frames. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("_present", lit(1))
      .toDF((keys ++ compareCols).map("o_" + _) :+ "_o_present": _*)
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("_present", lit(1))
      .toDF((keys ++ compareCols).map("n_" + _) :+ "_n_present": _*)
    val joinCond = keys.map(k => col("o_" + k) === col("n_" + k))
      .reduce(_ && _)
    val inOld = col("_o_present").isNotNull
    val inNew = col("_n_present").isNotNull
    // null-safe per-column difference flags (codegen'd)
    val diffs: Seq[Column] = compareCols.sorted.map(c =>
      when(!(col("o_" + c) <=> col("n_" + c)), lit(c)))
    val changedCols = concat_ws(",", diffs: _*)
    val keyOut = keys.map(k =>
      coalesce(col("o_" + k), col("n_" + k)).as(k))
    o.join(n, joinCond, "full_outer")
      .withColumn("change_type",
        when(inOld && !inNew, lit("removed"))
          .when(!inOld && inNew, lit("added"))
          .otherwise(lit("changed")))
      .withColumn("changed_cols",
        when(col("change_type") === "changed", changedCols)
          .otherwise(lit("")))
      // unchanged rows (both present, no differing column) drop out
      .filter(col("change_type") =!= "changed" ||
        col("changed_cols") =!= "")
      .select(keyOut :+ col("change_type") :+ col("changed_cols"): _*)
  }
}
