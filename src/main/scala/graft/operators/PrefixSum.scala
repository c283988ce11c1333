package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Global running (prefix) sum without a single-reducer window.
  *
  * `SUM(v) OVER (ORDER BY …)` with no PARTITION BY plans an
  * empty-partition window — the whole relation through ONE task.
  * Same TeraSort-shape fix as [[DistributedRank.globalRowNumber]]:
  *
  *   1. range-repartition + local sort on the order key;
  *   2. per-partition TOTALS of the summand (tiny job over the
  *      already-materialized shuffle — the map stage is reused);
  *   3. driver folds numPartitions longs into start offsets;
  *   4. one parallel map pass emits offset + local running sum.
  *
  * The summand is LONG (exact, overflow for |sum| < 2^63 — callers
  * sum deltas or fixed-point values, not raw doubles), so the fold is
  * associative bit-for-bit and the result equals the window plan's
  * exactly (law pinned in Pipeline7Spec).
  *
  * Determinism: `ord` must be a TOTAL order over the relation (the
  * sweep-line caller nets deltas per timestamp first, making the
  * timestamp unique).
  */
object PrefixSum {

  /** Append `outCol` = running sum of LONG column `valueCol` in `ord`
    * order (inclusive of the current row). */
  def runningSum(df: DataFrame, ord: Seq[Column], valueCol: String,
      outCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val vIdx = df.schema.fieldIndex(valueCol)
    require(df.schema(vIdx).dataType ==
        org.apache.spark.sql.types.LongType,
      s"$valueCol must be LONG (exact associative fold); " +
        s"got ${df.schema(vIdx).dataType}")
    val sortedRdd = df.repartitionByRange(n, ord: _*)
      .sortWithinPartitions(ord: _*)
      .rdd
    val totals = sortedRdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L
        it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
        Iterator.single((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = df.schema
      .add(outCol, org.apache.spark.sql.types.LongType, nullable = false)
    val rowRdd = sortedRdd.mapPartitionsWithIndex { case (pid, it) =>
      var s = bc.value(pid)
      it.map { r =>
        if (!r.isNullAt(vIdx)) s += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ s)
      }
    }
    spark.createDataFrame(rowRdd, outSchema)
  }
}
