package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK
import graft.sources.Catalog

/** Bounded-heap top-k aggregation (graft.operators.TopK): law-pinned
  * equal to the window ROW_NUMBER twin on real data, plus unit laws
  * on the Aggregator itself (bounded state, merge = merged order,
  * tie-break by smaller tiebreak, groups smaller than k).
  */
class TopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("topkPerKey equals the window ROW_NUMBER twin on orders") {
    val o = Catalog.table(spark, sfDir, "orders")
    val viaAgg = TopK.topkPerKey(o, Seq("o_custkey"), "o_totalprice",
        "o_orderkey", k = 3)
      .select(col("o_custkey"), col("rank").cast("long").as("rnk"),
        col("o_totalprice"), col("o_orderkey"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = o
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk").cast("long").as("rnk"),
        col("o_totalprice"), col("o_orderkey"))
    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("aggregator laws: bounded state, sorted output, deterministic " +
      "ties, merge equivalence") {
    val agg = new TopK.TopKPairs(3)
    // reduce keeps at most k, best first
    val fed = Seq((5.0, 10L), (7.0, 2L), (5.0, 3L), (9.0, 9L), (1.0, 1L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(fed == List((9.0, 9L), (7.0, 2L), (5.0, 3L)))
    assert(fed.size <= 3)
    // ties: equal value → smaller tiebreak wins placement
    val tied = Seq((4.0, 8L), (4.0, 2L), (4.0, 5L), (4.0, 1L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(tied == List((4.0, 1L), (4.0, 2L), (4.0, 5L)))
    // merge(xs, ys) == feeding the concatenation through reduce
    val xs = Seq((3.0, 1L), (2.0, 2L)).foldLeft(agg.zero)(agg.reduce)
    val ys = Seq((5.0, 5L), (2.5, 4L)).foldLeft(agg.zero)(agg.reduce)
    val together = (Seq((3.0, 1L), (2.0, 2L)) ++ Seq((5.0, 5L), (2.5, 4L)))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(xs, ys) == together)
    // a group smaller than k yields all its rows
    assert(Seq((1.0, 1L)).foldLeft(agg.zero)(agg.reduce).size == 1)
  }
}
