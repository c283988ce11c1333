package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audit, Bfs, PrefixSum, SnapshotDiff}

/** Unit contracts for the q89–q98 block: distributed prefix sum,
  * snapshot diff, bounded-depth BFS, and the constraint audit. */
class Pipeline7Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("prefix-sum law: runningSum equals the window plan, on >1 partition") {
    import spark.implicits._
    // keys deliberately unsorted + negative deltas
    val df = (1 to 5000).map { i =>
      val k = (i * 2654435761L) % 10007
      (k, if (k % 3 == 0) -1L else 2L)
    }.toDF("k", "v")
    val got = PrefixSum.runningSum(df, Seq(col("k"), col("v")), "v", "rs")
    // the point of the operator: the fold is NOT one reducer
    assert(got.rdd.getNumPartitions > 1)
    val w = Window.orderBy(col("k"), col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("rs", sum(col("v")).over(w))
    assert(got.orderBy("k", "v").collect().toSeq ==
      want.orderBy("k", "v").collect().toSeq)
  }

  test("snapshot diff: identity diff is empty; classes partition correctly") {
    import spark.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "x")
    assert(SnapshotDiff.diff(old, old, Seq("k"), Seq("s", "x")).count() == 0)
    val nw = Seq((2L, "b", 25.0), (3L, "z", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "x")
    val got = SnapshotDiff.diff(old, nw, Seq("k"), Seq("s", "x"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, "removed", ""),
      (2L, "changed", "x"),
      (3L, "changed", "s"),
      (4L, "added", "")))
  }

  test("snapshot diff: null-safe compare (null→value and value→null both flag)") {
    import spark.implicits._
    val old = Seq((1L, Option("a")), (2L, None: Option[String]))
      .toDF("k", "s")
    val nw = Seq((1L, None: Option[String]), (2L, Option("b")))
      .toDF("k", "s")
    val got = SnapshotDiff.diff(old, nw, Seq("k"), Seq("s"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1L, "changed", "s"), (2L, "changed", "s")))
  }

  test("bfs law: reach equals brute-force shortest hops on a known graph") {
    import spark.implicits._
    //   1 - 2 - 3 - 4   and isolated 5; undirected
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("id")
    val got = Bfs.reach(edges, seeds, "id", hops = 2)
      .orderBy("seed", "node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // seed 1: node 2 at hop 1, node 3 at hop 2 (node 1 itself not
    // re-emitted via 1→2→1); seed 5: nothing
    assert(got == Seq((1L, 2L, 1), (1L, 3L, 2)))
  }

  test("bfs: min-hop wins when a node is reachable two ways") {
    import spark.implicits._
    // diamond: 1→2, 1→3, 2→4, 3→4, plus direct 1→4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = Bfs.reach(edges, seeds, "id", hops = 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((2L, 1), (3L, 1), (4L, 1)))
  }

  test("audit: crafted violations are counted per check") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 9L), (13L, 9L))
      .toDF("ck", "fk")
    val dup = Seq(1L, 1L, 2L).toDF("k")
    val got = Audit.run(spark, Seq(
        "orphans" -> Audit.orphans(child, "fk", parent, "pk"),
        "dup_keys" -> Audit.duplicateKeys(dup, Seq("k")),
        "neg" -> child.filter(col("ck") < 0)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("dup_keys", 1L), ("neg", 0L), ("orphans", 2L)))
  }
}
