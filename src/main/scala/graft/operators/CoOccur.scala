package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted co-occurrence edges over a (key, item) relation: the edge
  * (a, b), a < b, with weight w = the number of distinct keys both
  * items occur under, thresholded at `minShared` — the building block
  * of co-trade / co-purchase / co-citation graphs (q77 builds its
  * supplier triangle graph on it).
  *
  * The naive plan self-joins the relation on `key`, which enumerates
  * degree² item pairs PER KEY in a single task: on power-law real data
  * one hub key (a customer buying from every supplier) makes that
  * task quadratic — a genuine 100×-scale straggler. Two exact
  * hardenings:
  *
  *  1. '''Frequency prefilter''' (exact): w(a,b) ≤ min(deg(a), deg(b)),
  *     so items occurring under fewer than `minShared` distinct keys
  *     can never form a qualifying edge and are dropped BEFORE pair
  *     enumeration. On long-tailed item distributions this removes
  *     most of the relation.
  *  2. '''Salted (blocked) self-join''' (exact): the b-side is
  *     bucketed by hash(item) into `buckets` groups and the a-side is
  *     replicated once per bucket, so the join key becomes
  *     (key, bucket) and a hub key's degree² fan-out lands on
  *     `buckets` parallel tasks of degree²/buckets rows each instead
  *     of one straggler. Every unordered pair is still produced
  *     exactly once (b's bucket is a function of b alone). The cost is
  *     an a-side shuffle `buckets`× larger — linear, cheap insurance
  *     against a quadratic straggler.
  *
  * Total work stays Σ deg² over surviving items — inherent to exact
  * co-occurrence counting; what the salting buys is that no single
  * task ever owns a full hub. For corpora where even that is too much,
  * cap or sample per-key degree upstream (no longer exact) or switch
  * to [[SetSimJoin]]'s prefix-filtered similarity semantics.
  */
object CoOccur {

  /** Pair enumeration stage, exposed for the skew spec: one row per
    * (key, item_a < item_b) with both hardenings applied; partitioned
    * by (key, bucket) so per-task fan-out is bounded by
    * max-degree²/buckets. */
  def saltedPairs(pairs: DataFrame, key: String, item: String,
      minShared: Long, buckets: Int): DataFrame =
    saltedFrom(prefilter(pairs, key, item, minShared), key, item, buckets)

  /** Degree prefilter (exact): drop items under fewer than `minShared`
    * distinct keys — they can never reach an edge of weight ≥
    * minShared. */
  private def prefilter(pairs: DataFrame, key: String, item: String,
      minShared: Long): DataFrame = {
    val heavy = pairs.groupBy(col(item))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= minShared)
      .select(col(item))
    pairs.select(col(key), col(item))
      .join(heavy, Seq(item), "left_semi")
  }

  /** Salted pair enumeration over an already-prefiltered relation `p`;
    * `p` is read twice (a-side and b-side) — callers that compute it
    * from an expensive upstream should persist it ([[edges]] does). */
  private def saltedFrom(p: DataFrame, key: String, item: String,
      buckets: Int): DataFrame = {
    val ia = item + "_a"; val ib = item + "_b"
    val b = p.select(col(key), col(item).as(ib))
      .withColumn("g", pmod(xxhash64(col(ib)), lit(buckets.toLong)))
    val a = p.select(col(key), col(item).as(ia))
      .withColumn("g",
        explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    a.join(b, Seq(key, "g"))
      .filter(col(ia) < col(ib))
      .select(col(key), col(ia), col(ib))
  }

  /** Thresholded co-occurrence edges: (item_a, item_b, w) with
    * item_a < item_b and w ≥ minShared. `pairs` must be DISTINCT on
    * (key, item) for w to count distinct keys. */
  def edges(pairs: DataFrame, key: String, item: String,
      minShared: Long, buckets: Int = 8): DataFrame = {
    // The prefiltered relation feeds BOTH join sides; without a persist
    // the upstream of `pairs` (q77: an orders⋈lineitem join + distinct)
    // recomputes once per side plus once for the degree aggregate. Pin
    // it, materialize the (small, thresholded) edge aggregate eagerly
    // while the pin is live, then release — callers inherit a compact
    // lineage-truncated edge relation, never corpus-sized cache.
    val p = prefilter(pairs, key, item, minShared)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      saltedFrom(p, key, item, buckets)
        .groupBy(col(item + "_a"), col(item + "_b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= minShared)
        .localCheckpoint(true)
    } finally p.unpersist()
  }
}
