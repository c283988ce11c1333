package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (batch form): events of
  * one key belong to the same session while consecutive gaps stay
  * ≤ `gapMicros`; a larger gap opens a new session. The classic
  * clickstream/telemetry operator (north-star scope; the streaming
  * twin is `session_window` in streaming/Streaming).
  *
  * Shape: ONE shuffle (hash on the key), one in-partition sort —
  * the lag + running-sum windows share the same (key, ts, tiebreak)
  * ordering so Catalyst plans a single Window exchange/sort. Session
  * index = running count of gap-breaks, deterministic given a total
  * in-key order (pass a unique `tiebreak` for equal timestamps).
  */
object Sessionize {

  /** Input rows + (session_idx, is_session_start). */
  def assign(events: DataFrame, keyCol: String, tsCol: String,
      gapMicros: Long, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, tiebreak.asc)
    val us = unix_micros(col(tsCol))
    val gap = us - lag(us, 1).over(w)
    val isStart = when(gap.isNull || gap > gapMicros, 1L).otherwise(0L)
    events
      .withColumn("is_session_start", isStart)
      .withColumn("session_idx",
        sum(col("is_session_start"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per (key, session): start/end, event count, an exact
    * (decimal-routed) sum of `valueCol`. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      gapMicros: Long, tiebreak: Column, valueCol: Column): DataFrame =
    assign(events, keyCol, tsCol, gapMicros, tiebreak)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        min(unix_micros(col(tsCol))).as("session_start_us"),
        max(unix_micros(col(tsCol))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(valueCol.cast("decimal(30,2)")).cast("double").as("sum_value"))
}
