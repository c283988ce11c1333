package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth BFS over an edge relation: for every seed node, the
  * set of nodes reachable in ≤ k hops with the MINIMUM hop count —
  * the k-hop neighborhood / reachability primitive (fraud rings,
  * citation spheres, graph feature extraction).
  *
  * Relational Pregel shape (same family as [[PageRank]]): each
  * superstep is ONE equi-join of the frontier against the edge
  * relation plus ONE (seed, node) min-aggregation; the edge relation
  * is persisted once and re-read per superstep. Nothing driver-side
  * grows with the graph — state is the (seed, node, hop) relation,
  * sharded by seed. At 100 TB the edge relation would be bucketed on
  * `src` so every superstep's join is shuffle-free on the edge side.
  *
  * `hops` is small and fixed (2–4 in practice); per-superstep work is
  * bounded by the true neighborhood size, not n², because visited
  * nodes are min-folded before the next expansion.
  */
object Bfs {

  /** (seed, node, hop) for every node reachable from a seed in
    * 1..hops steps, hop = shortest distance; seeds themselves
    * (hop 0) are not emitted. Columns `src`/`dst` name the edge
    * endpoints; edges are used as given (pass both directions for an
    * undirected graph).
    *
    * @param checkpointInterval every this-many hops the state and
    *        frontier relations are eagerly local-checkpointed; values
    *        are unchanged. This bound is LOAD-BEARING: each hop
    *        references the previous state twice (the anti-join and the
    *        union), so the logical plan grows as 2^(hops since last
    *        truncation) — at interval 4 that is ≤ 16 subtree copies,
    *        while an untruncated 10-hop run is a million-node Catalyst
    *        tree that stalls the driver in analysis and GC
    *        (LineageCadenceSpec documents the law). Keep it small. */
  def reach(edges: DataFrame, seeds: DataFrame, seedCol: String,
      hops: Int, checkpointInterval: Int = 4): DataFrame = {
    require(hops >= 1, s"hops must be >= 1, got $hops")
    require(checkpointInterval >= 1)
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // state: minimal hop per (seed, node) discovered so far;
    // frontier: nodes first reached in the latest superstep
    var state = seeds.select(col(seedCol).as("seed"))
      .withColumn("node", col("seed"))
      .withColumn("hop", lit(0))
    var frontier = state
    for (h <- 1 to hops) {
      val expanded = frontier.join(e, frontier("node") === e("src"))
        .select(col("seed"), col("dst").as("node"))
        .distinct()
      // drop nodes already reached at a smaller hop
      frontier = expanded.join(state.select(col("seed"), col("node")),
          Seq("seed", "node"), "left_anti")
        .withColumn("hop", lit(h))
      state = state.union(frontier)
      if (h % checkpointInterval == 0 && h < hops) {
        frontier = frontier.localCheckpoint(true)
        state = state.localCheckpoint(true)
      }
    }
    // pin the small result, release the superstep lineage + edge cache
    val out = state.filter(col("hop") > 0).localCheckpoint(true)
    e.unpersist()
    out
  }
}
