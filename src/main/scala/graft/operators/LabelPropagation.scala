package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label propagation (Raghavan et al. 2007, "Near linear
  * time algorithm to detect community structures in large-scale
  * networks") made DETERMINISTIC: every node starts labeled with its
  * own id; each round every node simultaneously adopts the most
  * frequent label among its neighbors, ties broken by the SMALLEST
  * label (the paper breaks ties uniformly at random — a fixed
  * tie-break makes the fixture exactly reproducible, so the DuckDB
  * oracle replays the rounds bit-for-bit). A fixed iteration budget
  * replaces the paper's convergence test, the same bounded-superstep
  * discipline as [[PageRank]].
  *
  * Relational shape per round — the part that must survive 100 TB:
  *
  *  1. `edges ⋈ labels` on src  — ONE shuffle on the edge relation
  *     (or zero for labels when AQE broadcasts the small side);
  *  2. `groupBy(dst, lbl).count` — hash aggregation with map-side
  *     partial aggregation;
  *  3. per-dst arg-max via `max(struct(cnt, -lbl))` — a SECOND hash
  *     aggregation, NOT a window: no per-group sort, no skew-prone
  *     `row_number`, and partial aggregation keeps hot nodes cheap
  *     (a celebrity node's millions of (dst,lbl) rows collapse
  *     map-side before the exchange).
  *
  * The edge relation is persisted once and reused by every round;
  * the label relation is node-sized, not edge-sized. Undirected
  * graphs must materialize both directions in `edges` (the operator
  * propagates along src→dst only), exactly like [[PageRank.run]].
  *
  * Labels must be non-negative: the arg-max encodes "smallest label
  * wins ties" as `max(struct(cnt, -lbl))`, which needs `-lbl` to
  * order opposite to `lbl` without overflow.
  */
object LabelPropagation {

  /** Run `iters` synchronous rounds over `edges(srcCol, dstCol)`.
    * Returns (node, lbl). Nodes = every endpoint of `edges`; isolated
    * nodes (absent from edges) are out of scope, as in the paper.
    *
    * @param checkpointInterval every this-many rounds the label
    *        relation is eagerly local-checkpointed, truncating
    *        lineage — the same cadence [[PageRank.run]] has, for the
    *        same reason: each round appends a join + two aggregations
    *        to ONE logical plan, so analyzer/optimizer time and
    *        driver plan memory grow per round; production community
    *        detection runs tens of rounds. Labels are one row per
    *        node, so each truncation is cheap, and checkpointing is a
    *        materialization boundary, not a semantic one — values
    *        are unchanged at any cadence (LawsSpec). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, checkpointInterval: Int = 8): DataFrame = {
    require(iters >= 1, s"LabelPropagation: iters must be >= 1, got $iters")
    require(checkpointInterval >= 1,
      s"LabelPropagation: checkpointInterval must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
      var labels = nodes.withColumn("lbl", col("node"))
      for (it <- 1 to iters) {
        labels = e.join(labels, e("src") === labels("node"))
          .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("dst"))
          .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
          .select(col("dst").as("node"), (-col("m.neg")).as("lbl"))
        if (it % checkpointInterval == 0 && it < iters)
          labels = labels.localCheckpoint(eager = true)
      }
      // materialize before unpersisting the edge cache the plan feeds on
      labels.localCheckpoint(eager = true)
    } finally e.unpersist(): Unit
  }
}
