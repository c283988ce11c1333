package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Global ROW_NUMBER without a single-reducer window.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY collapses the
  * whole relation into ONE task (Spark plans an empty-partition window
  * — the textbook 100 TB bottleneck: fine at 600k rows, dead at 600B).
  * The scalable shape is the two-phase rank every distributed engine
  * uses internally:
  *
  *   1. range-repartition + local sort on the order key (parallel
  *      TeraSort shape — every partition holds a contiguous key range);
  *   2. count rows per partition (tiny job over already-sorted data);
  *   3. driver folds the counts into per-partition start offsets
  *      (numPartitions longs — microscopic);
  *   4. one map pass assigns rank = offset + local position.
  *
  * Total cost: one range shuffle + one scan — identical shuffle bytes
  * to the window plan, but rank assignment is fully parallel.
  *
  * Determinism: `ord` must be a TOTAL order (extend with tiebreak
  * columns); range partitioning splits only BETWEEN distinct key
  * values of the sort prefix it samples, and the local sort enforces
  * the full ordering within each partition, so ranks equal the
  * single-task window's exactly (law pinned in Pipeline4Spec).
  */
object DistributedRank {

  /** Append a 1-based BIGINT `outCol` ranking every row by `ord`. */
  def globalRowNumber(df: DataFrame, ord: Seq[Column], outCol: String,
      partitions: Int = 0): DataFrame =
    globalRowNumberCounted(df, ord, outCol, partitions)._1

  /** [[globalRowNumber]] plus the TOTAL row count. The offset fold
    * already knows it (offsets.last), so callers needing rank AND
    * total — the equal-depth bucketing every clustered OPTIMIZE does
    * — skip a separate count() job, which would pay one more full
    * shuffle-read + sort pass over the ranked relation. */
  def globalRowNumberCounted(df: DataFrame, ord: Seq[Column],
      outCol: String, partitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // ONE sorted RDD object: the count job materializes its shuffle,
    // and the rank pass reuses the same shuffle files (map stage
    // skipped) — the data is range-sorted exactly once.
    val sortedRdd = df.repartitionByRange(n, ord: _*)
      .sortWithinPartitions(ord: _*)
      .rdd
    // per-partition row counts → start offsets (driver folds N longs)
    val counts = sortedRdd
      .mapPartitionsWithIndex { case (pid, it) =>
        Iterator.single((pid, it.size.toLong))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = df.schema
      .add(outCol, org.apache.spark.sql.types.LongType, nullable = false)
    val rowRdd = sortedRdd.mapPartitionsWithIndex { case (pid, it) =>
      var i = bc.value(pid)
      it.map { r =>
        i += 1
        Row.fromSeq(r.toSeq :+ i)
      }
    }
    (spark.createDataFrame(rowRdd, outSchema), offsets.last)
  }
}
