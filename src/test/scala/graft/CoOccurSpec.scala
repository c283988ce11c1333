package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoOccur

/** Laws for the skew-hardened co-occurrence operator (q77's edge
  * builder): exactness vs the naive self-join on a synthetic
  * hub-skewed graph, the degree-prefilter pruning guarantee, and the
  * bounded-per-task fan-out claim of the salted enumeration.
  */
class CoOccurSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Hub-skewed (key, item) graph: key 0 is a hub touching ALL 40
    * items; keys 1..60 each touch a deterministic 4-item slice; items
    * 100..139. Distinct by construction. */
  private def hubGraph = {
    import spark.implicits._
    val hub = (100 until 140).map(i => (0L, i.toLong))
    val tail = (1 to 60).flatMap { k =>
      (0 until 4).map(j => (k.toLong, 100L + (k * 7 + j * 11) % 40))
    }.distinct
    (hub ++ tail).toDF("key", "item")
  }

  /** Naive reference: ungated per-key self-join. */
  private def naiveEdges(minShared: Long) = {
    val p = hubGraph
    p.toDF("key", "ia").join(p.toDF("key", "ib"), "key")
      .filter(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("w"))
      .filter(col("w") >= minShared)
  }

  test("edges == naive self-join on a hub-skewed graph (exactness)") {
    for (minShared <- Seq(1L, 2L, 5L)) {
      val got = CoOccur.edges(hubGraph, "key", "item", minShared)
        .select(col("item_a").as("ia"), col("item_b").as("ib"), col("w"))
      val want = naiveEdges(minShared)
      assert(got.exceptAll(want).count() === 0, s"extra at $minShared")
      assert(want.exceptAll(got).count() === 0, s"missing at $minShared")
    }
  }

  test("degree prefilter prunes rare items before enumeration (exact)") {
    import spark.implicits._
    // 1000 degree-1 items + 3 items sharing 5 keys: only the 3 heavy
    // items survive the prefilter, so enumeration sees 3 pairs per
    // shared key, not 1003×1002/2 per hub.
    val rare = (0 until 1000).map(i => (i.toLong % 5, 10000L + i))
    val heavy = (0L until 5L).flatMap(k => Seq((k, 1L), (k, 2L), (k, 3L)))
    val df = (rare ++ heavy).toDF("key", "item")
    val enumerated = CoOccur.saltedPairs(df, "key", "item",
      minShared = 5, buckets = 8)
    // 5 keys × C(3,2) pairs — the 1000 rare items never enter the join
    assert(enumerated.count() === 15)
    val e = CoOccur.edges(df, "key", "item", minShared = 5)
    assert(e.count() === 3) // (1,2),(1,3),(2,3) each w=5
    assert(e.filter(col("w") =!= 5).count() === 0)
  }

  test("salting bounds per-join-key fan-out on the hub key") {
    // Unsalted, the hub key's C(40,2)=780 pairs share ONE join key
    // (key=0) and so land in one task. Salted, the join key is
    // (key, g) with g = hash(item_b) % buckets: the hub's pairs must
    // spread over several groups, none holding the bulk. The group
    // split is a pure function of xxhash64, so this is deterministic
    // (unlike asserting on physical partition sizes, which AQE
    // coalescing would merge on data this small).
    val buckets = 8
    val enumerated = CoOccur
      .saltedPairs(hubGraph, "key", "item", minShared = 1, buckets)
      .filter(col("key") === 0L)
    val groups = enumerated
      .groupBy(pmod(xxhash64(col("item_b")), lit(buckets)).as("g"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1))
    val hubPairs = 40L * 39 / 2
    assert(groups.sum === hubPairs) // hub fully enumerated, exactly once
    assert(groups.length >= 4, s"hub spread over only ${groups.length} groups")
    assert(groups.max < hubPairs * 6 / 10,
      s"straggler group: max=${groups.max} of total=$hubPairs")
  }
}
