package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-log compaction: reduce an append-only CDC log of
  * (key, seq, op, payload…) rows to the live snapshot — the
  * last-writer-wins state per key, with keys whose latest op is a
  * delete dropped. The Kafka-log-compaction / merge-on-read-collapse
  * primitive that turns an event-sourced table back into a queryable
  * relation.
  *
  * Shape at scale: ONE hash-agg shuffle on the key. Every payload
  * column rides through `max_by(col, seq)` inside the same aggregate,
  * so there is no self-join back to the log and no window sort — the
  * partial aggregation collapses each key's history map-side first,
  * which is what makes this survive a log with billions of rows per
  * day. `seq` must be totally ordered per key (CDC LSN, Kafka offset,
  * commit timestamp + tiebreak); ties would make last-writer-wins
  * nondeterministic, so callers fold the tiebreak into `seq`.
  *
  * Contrast with [[Scd2]] (which KEEPS history as validity intervals)
  * and [[SnapshotDiff]] (which compares two already-compacted
  * snapshots); `Streaming.mergeParquetSink` is the incremental
  * micro-batch form of the same fold.
  */
object Compaction {

  /** Compact `log` to live rows. Output: key columns, every payload
    * column at its latest value, `last_seq`, and `n_versions` (how
    * many log rows the key folded). Rows whose latest `op` equals
    * `deleteOp` are dropped. */
  def compact(log: DataFrame, keyCols: Seq[String], seqCol: Column,
      opCol: Column, payloadCols: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    val aggs =
      max_by(opCol, seqCol).as("last_op") +:
      max(seqCol).as("last_seq") +:
      count(lit(1)).as("n_versions") +:
      payloadCols.map(c => max_by(col(c), seqCol).as(c))
    log.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("last_op") =!= deleteOp)
      .drop("last_op")
  }
}
