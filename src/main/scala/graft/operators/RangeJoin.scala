package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join and skew-salted equi-join — §2.4 join-type
  * surface with explicit 100 TB execution shapes.
  */
object RangeJoin {

  /** Join rows of `left` to rows of `right` with the same `key` and
    * `right.on` in `[left.on, left.on + windowMicros]` (timestamps).
    *
    * Naive form is a non-equi theta join → BroadcastNestedLoopJoin →
    * O(|L|·|R|) comparisons. This implementation buckets both sides by
    * `on div windowMicros`, replicates the left side into its own and
    * the NEXT bucket, and equi-joins on (key, bucket) before applying
    * the exact range predicate — every candidate pair is within one
    * bucket width, so the join is a hash join with ≤2× replication,
    * never a cross product. */
  def within(left: DataFrame, right: DataFrame, key: Seq[String],
      on: String, windowMicros: Long, rightPrefix: String = "r_")
      : DataFrame = {
    val lOn = unix_micros(col(on))
    val rCols = right.columns.map(c =>
      if (key.contains(c)) col(c) else col(c).as(rightPrefix + c))
    val r = right.select(rCols.toSeq: _*)
    val rOn = unix_micros(col(rightPrefix + on))

    val lb = left
      .withColumn("__bucket_base", expr(s"unix_micros($on) div $windowMicros"))
      .withColumn("__bucket", explode(array(col("__bucket_base"),
        col("__bucket_base") + 1)))
      .drop("__bucket_base")
    val rb = r.withColumn("__bucket",
      expr(s"unix_micros(${rightPrefix + on}) div $windowMicros"))

    lb.join(rb, key :+ "__bucket")
      .filter(rOn >= lOn && rOn <= lOn + windowMicros)
      .drop("__bucket")
  }

  /** Salted equi-join for skewed keys: the left (large, skewed) side
    * gets a random-free deterministic salt derived from a row hash; the
    * right side is replicated `salt` ways. Breaks a hot key's single
    * reducer into `salt` parallel ones. AQE's skew-join handles the
    * common cases automatically — this is the explicit operator for
    * pathological keys or non-AQE contexts. Results are identical to
    * the plain join (salt columns never escape). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // right/full outer would emit every unmatched RIGHT row once per
    // replica — the replication trick only preserves semantics when
    // unmatched right rows are dropped (inner/semi/anti) or the left
    // side drives the output (left outer)
    val ok = Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin does not preserve '$joinType' semantics " +
        "(right side is replicated); use inner/left/semi/anti")
    val lSalted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(salt)).cast("int"))
    val rSalted = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    lSalted.join(rSalted, key :+ "__salt", joinType).drop("__salt")
  }
}
