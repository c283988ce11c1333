package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank over an edge relation — the canonical iterative
  * (Pregel-shape) graph workload, expressed relationally so Catalyst
  * plans every superstep: per iteration ONE join (ranks ⋈ edges on
  * src) and ONE aggregation shuffle (sum of contributions on dst).
  * Edges are persisted once and re-used across supersteps; rank
  * relations are tiny (one row per node). At 100 TB the edge relation
  * partitions by src and AQE handles the power-law hub skew — the
  * same shuffle topology GraphX/Pregel would produce, without leaving
  * the DataFrame planner.
  *
  * Determinism (oracle-replayable): ranks are scaled integers
  * (Q = 1e6). Each superstep:
  *   contrib(u) = pr(u) div outdeg(u)            (truncating int div)
  *   pr'(v) = (15·Q) div 100
  *          + (85 · Σ_{u→v} contrib(u)) div 100  (exact int ops)
  * All arithmetic is order-independent integer math, so the result is
  * bit-identical run-to-run and engine-to-engine (DuckDB replays the
  * identical unrolled iterations — q69). Nodes without in-edges hold
  * the base rank; sink-node mass leaks (no dangling redistribution) —
  * both engines implement the SAME recurrence, which is the contract
  * under test.
  *
  * Cost profile (measured at sf0.1): the one-time edge
  * materialization (source join + columnar cache build) dominates;
  * a warm superstep is ~0.1 s. Iteration count therefore scales
  * gently — exactly the profile an iterative engine wants, since
  * production PageRank runs tens of supersteps over one cached edge
  * relation.
  */
object PageRank {

  val Scale = 1000000L

  /** `iters` supersteps over `edges` (src, dst). Returns
    * (node, pr_fp) for every node appearing as src or dst.
    *
    * @param dedup pass false when the edge relation is already
    *              distinct (skips one full-width shuffle over the
    *              edges — at scale the edge dedup is a one-time
    *              layout cost, not a per-run cost) */
  /** @param checkpointInterval every this-many supersteps the rank
    *        relation is eagerly local-checkpointed, truncating lineage:
    *        without it the logical plan deepens by a join+agg per
    *        superstep, so analyzer/optimizer time and driver plan
    *        memory grow with iteration count — a silent cost once
    *        production runs leave the testdata's 2-superstep regime.
    *        Ranks are one row per node, so each truncation is cheap. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dedup: Boolean = true,
      checkpointInterval: Int = 8): DataFrame = {
    require(iters >= 0)
    require(checkpointInterval >= 1)
    // node ids keep their input type — at scale use integral ids
    // (narrow shuffle keys), not strings
    val projected = edges.select(col(srcCol).as("src"),
      col(dstCol).as("dst"))
    val e = (if (dedup) projected.distinct() else projected).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()
    // out-degrees are superstep-invariant: persist them once (node-
    // sized) instead of re-aggregating the edge relation inside every
    // superstep's plan — unpinned, each superstep re-ran the edge-wide
    // groupBy (guide §5: cache what is reused and expensive)
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
      .persist()
    var ranks = nodes.withColumn("pr_fp", lit(Scale))
    var it = 0
    while (it < iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"),
          expr("pr_fp div outdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("inflow"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"),
          "left")
        .select(col("node"),
          (lit(15L * Scale / 100L) +
            expr("85 * coalesce(inflow, 0L) div 100")).as("pr_fp"))
      it += 1
      // cadence: pin + truncate mid-loop (the final superstep is
      // pinned below anyway); values are unchanged — checkpointing is
      // a materialization boundary, not a semantic one (LawsSpec)
      if (it % checkpointInterval == 0 && it < iters)
        ranks = ranks.localCheckpoint(true)
    }
    // materialize the small result, release the iteration lineage +
    // cached edge relations (cache-discipline: no leaks across calls)
    val out = ranks.localCheckpoint(true)
    e.unpersist()
    nodes.unpersist()
    outdeg.unpersist()
    out
  }
}
