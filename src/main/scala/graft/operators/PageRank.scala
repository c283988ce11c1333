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
  */
object PageRank {

  val Scale = 1000000L

  /** `iters` supersteps over `edges` (src, dst). Returns
    * (node, pr_fp) for every node appearing as src or dst. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 0)
    val e = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .distinct()
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
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
    }
    // materialize the small result, release the iteration lineage +
    // cached edge relations (cache-discipline: no leaks across calls)
    val out = ranks.localCheckpoint(true)
    e.unpersist()
    nodes.unpersist()
    out
  }
}
