package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bfs, Components, PageRank}

/** The iterative loop operators (PageRank / BFS / connected
  * components) truncate lineage on a cadence (`checkpointInterval`)
  * so plan depth stays bounded when iteration counts leave the
  * testdata's 2-3-round regime. These laws pin that the cadence is a
  * materialization boundary ONLY: results are bit-identical across
  * intervals, and a long-diameter graph (many truncations) still
  * converges to the right answer.
  */
class LineageCadenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("components: 30-node path (diameter 29, multiple truncations) converges to min label") {
    import spark.implicits._
    val pairs = (0L until 29L).map(i => (i, i + 1)).toDF("a", "b")
    val nodes = (0L to 29L).toDF("id")
    val comp = Components.connectedComponents(nodes, "id", pairs,
      "a", "b", maxIter = 50, checkpointInterval = 5)
    assert(comp.count() === 30)
    assert(comp.filter($"component" =!= 0L).count() === 0,
      "every path node must fold to the min id")
  }

  test("pagerank: 12 supersteps bit-identical across checkpoint intervals") {
    // PageRank's plan grows LINEARLY per superstep (ranks referenced
    // once), so an untruncated 12-superstep run is a safe comparator.
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    def rows(interval: Int) =
      PageRank.run(edges, "src", "dst", iters = 12,
          checkpointInterval = interval)
        .orderBy("node").collect().toSeq
    assert(rows(3) === rows(100),
      "cadence must not change a single fixed-point rank")
  }

  test("bfs: 8-hop chain bit-identical across checkpoint intervals") {
    // BFS references the previous state TWICE per hop (union +
    // anti-join), so plan size is 2^(hops since last truncation) —
    // an untruncated deep run is a Catalyst heap bomb BY DESIGN of
    // this law's subject. Compare two small intervals only; both
    // truncate, plans stay bounded, and any cadence-dependence of the
    // VALUES would still show.
    import spark.implicits._
    val edges = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("s")
    def rows(interval: Int) =
      Bfs.reach(edges, seeds, "s", hops = 8,
          checkpointInterval = interval)
        .orderBy("seed", "node").collect().toSeq
    val deep = rows(2)
    assert(deep === rows(3))
    assert(deep.size === 8, "hop h reaches exactly node h on a chain")
  }

  test("label propagation: 9 rounds bit-identical across checkpoint " +
      "intervals") {
    // Like PageRank, the plan grows linearly per round (labels
    // referenced once), so an effectively-untruncated run is a safe
    // comparator; the law pins the cadence as value-neutral.
    import spark.implicits._
    val cliqueA = for (a <- 0L to 3L; b <- 0L to 3L if a != b)
      yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- 10L to 13L if a != b)
      yield (a, b)
    val edges = (cliqueA ++ cliqueB ++ Seq((3L, 10L), (10L, 3L)))
      .toDF("src", "dst")
    def rows(interval: Int) =
      graft.operators.LabelPropagation.run(edges, "src", "dst",
          iters = 9, checkpointInterval = interval)
        .orderBy("node").collect().toSeq
    val got = rows(3)
    assert(got === rows(100),
      "cadence must not change a single label")
    assert(got.size === 8, "two 4-cliques = 8 labeled nodes")
  }
}
