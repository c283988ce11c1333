package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-wise dedup combinators (SURVEY R5 + §2.4 top-k).
  *
  * The reference's only analytic operator is
  * `ROW_NUMBER() OVER (PARTITION BY nr_CIOT ORDER BY id_Manifesto DESC)`
  * filtered to `rn = 1` (`SELECT.py:49,69`) — "latest manifest per CIOT".
  * Generalized here to latest-per-key and top-k-per-key.
  *
  * Scale notes: `WindowExec` = one shuffle on the partition key + an
  * in-partition sort; no driver involvement, skew handled by AQE.
  * For top-1 a `max_by`-style aggregation can avoid the full sort, but
  * the window form preserves ALL columns without struct-packing and
  * keeps exact reference tie semantics (ties impossible when the order
  * key is unique, as `id_Manifesto` is).
  */
object Dedup {

  /** One row per key: the first under `order` (SURVEY R5).
    * Deterministic iff `order` is total (include a unique tiebreak). */
  def latestPerKey(df: DataFrame, partition: Seq[Column], order: Seq[Column])
      : DataFrame =
    topKPerGroup(df, partition, order, 1)

  /** Top-k rows per group under `order` (SURVEY §2.4 limits/top-k). */
  def topKPerGroup(df: DataFrame, partition: Seq[Column],
      order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    val rn = "__graft_rn"
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Exact whole-row (or key-subset) dedup. With `keys` given, keeps an
    * arbitrary row per key (hash-shuffle on the keys; map-side partial
    * dedup makes this scan-bound at 100 TB). */
  def exact(df: DataFrame, keys: Seq[String] = Nil): DataFrame =
    if (keys.isEmpty) df.distinct() else df.dropDuplicates(keys)
}
