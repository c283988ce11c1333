package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key exponentially weighted moving average — the canonical
  * "sequential recurrence the window grammar cannot express"
  * (s_i = α·v_i + (1−α)·s_{i−1} needs the previous OUTPUT, not a
  * frame over inputs), so it runs as a per-partition streaming fold
  * after a repartition + secondary sort:
  *
  *   repartition(key) → sortWithinPartitions(key, ts, tiebreak) →
  *   mapPartitions fold (O(1) state: current key + running average)
  *
  * Scale shape: exactly one shuffle keyed on `key`; within a
  * partition the kernel streams rows in order holding constant
  * state, so a key's history never materializes in memory (unlike
  * collect_list folds) — the same layout Structured Streaming's
  * mapGroupsWithState would use, here as a batch operator. Skew is
  * bounded by the hottest single key, the floor for any per-key
  * recurrence.
  */
object Ewma {

  /** @param tsCol   epoch-microsecond ordering column (long)
    * @param tiebreak unique long column breaking ts ties (exact replay)
    * @param alpha   smoothing factor; s_0 = v_0 */
  def ewma(df: DataFrame, keyCol: String, tsCol: Column, tiebreak: Column,
      valueCol: Column, alpha: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(col(keyCol).cast("long"),
        tsCol.cast("long").as("us"), tiebreak.cast("long").as("tb"),
        valueCol.cast("double").as("v"))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col("us"), col("tb"))
      .as[(Long, Long, Long, Double)]
    prepared.mapPartitions { it =>
      var curKey = Long.MinValue
      var haveKey = false
      var s = 0.0
      it.map { case (k, us, tb, v) =>
        if (!haveKey || k != curKey) { curKey = k; haveKey = true; s = v }
        else s = alpha * v + (1.0 - alpha) * s
        (k, tb, us, v, s)
      }
    }.toDF(keyCol, "tb", "us", "v", "ewma")
  }
}
