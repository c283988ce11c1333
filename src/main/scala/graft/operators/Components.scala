package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the "assign every document
  * to its duplicate cluster" step that turns near-dup PAIRS (MinHash /
  * SimHash / embedding output) into a canonical-representative mapping
  * a dedup pipeline can act on (keep component == node, drop the
  * rest). No reference counterpart (north-star scope).
  *
  * Algorithm: iterative min-label propagation (hash-to-min). Each
  * round is one equi-join + one min-aggregation — both plain shuffles
  * on the node id — and the loop stops when no label improves, checked
  * with a count on the improving set only. Rounds needed = graph
  * diameter; duplicate clusters are near-cliques of tiny diameter, so
  * 2-3 rounds in practice. For adversarial long-chain graphs at 100 TB
  * the escalation path is the large-star/small-star contraction of
  * Kiveris et al. ("Connected Components in MapReduce and Beyond",
  * SoCC'14), which converges in O(log²) rounds — same join/agg
  * primitives, different edge rewriting; not needed for dedup-shaped
  * graphs. Labels persist per round and the previous round is
  * unpersisted, so lineage depth equals round count (bounded by
  * `maxIter`).
  */
object Components {

  /** (node, component) for every node, where component = the minimum
    * node id reachable through `pairs` (nodes absent from any pair map
    * to themselves). Deterministic for any partitioning.
    *
    * Scale shape: the iteration runs ONLY over nodes that occur in
    * some pair — in a dedup pipeline that is the duplicate subgraph, a
    * small fraction of the corpus — and the (typically huge) singleton
    * remainder is attached with one final left join. Iterating the
    * full corpus through every round would make each round a
    * corpus-sized shuffle for no information. */
  /** @param checkpointInterval every this-many rounds the label
    *        relation is local-checkpointed, truncating lineage. Each
    *        round's plan references the previous labels twice (the
    *        neighbor-min join and the update join), so plan size grows
    *        as 2^(rounds since last truncation) — the per-round
    *        persist hides this from EXECUTION but not from the
    *        analyzer, and before this cadence existed a diameter-40
    *        graph would have built a 2^40-subtree logical plan and
    *        stalled the driver. At interval 6 the tree stays ≤ 64
    *        copies of a checkpoint leaf. Dedup graphs converge in 2-3
    *        rounds and never hit it. */
  def connectedComponents(nodes: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 50,
      checkpointInterval: Int = 6): DataFrame = {
    require(checkpointInterval >= 1)
    val edges = pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .persist()
    // only pair-involved nodes can ever receive a foreign label
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .persist()
    // materialize the (possibly expensive) pair graph FULLY before the
    // loop: the loop's isEmpty convergence probe evaluates only a few
    // partitions, and a partially-populated cache makes every later
    // action re-run the upstream pair pipeline for the rest
    labels.count()
    var iter = 0
    var converged = false
    // true while `labels` is persist()-pinned (safe to unpersist);
    // false after a cadence truncation — a local checkpoint's blocks
    // are its ONLY copy (lineage is gone), so it is never unpersisted
    // and is reclaimed by the context cleaner once unreferenced
    var labelsPinned = true
    while (!converged && iter < maxIter) {
      // best neighbor label per node — persisted so the convergence
      // probe and the label update share ONE evaluation of the
      // join + min-aggregation per round
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("label")).as("nmin"))
        .persist()
      val improving = labels.join(neighborMin, "node")
        .filter(col("nmin") < col("label"))
      if (improving.isEmpty) converged = true
      else {
        val next = labels.join(neighborMin, Seq("node"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nmin"), col("label")))
              .as("label"))
          .persist()
        next.count() // materialize before dropping the parent
        if (labelsPinned) labels.unpersist()
        if ((iter + 1) % checkpointInterval == 0) {
          // truncate lineage from the already-materialized `next`
          val snap = next.localCheckpoint(true)
          next.unpersist()
          labels = snap; labelsPinned = false
        } else { labels = next; labelsPinned = true }
      }
      neighborMin.unpersist()
      iter += 1
    }
    edges.unpersist()
    // an unconverged result is WRONG (one cluster split across labels)
    // — fail loudly rather than hand a dedup pipeline silent dupes
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds " +
        "(graph diameter exceeds maxIter — raise it, or use " +
        "star-contraction for adversarial long-chain graphs)")
    // snapshot the (duplicate-subgraph-sized) label relation and
    // release the loop's persist, so the session cache holds nothing
    // after the call; checkpoint blocks are freed when the result is
    // garbage-collected
    val finalLabels =
      if (labelsPinned) {
        val snap = labels.localCheckpoint(true)
        labels.unpersist()
        snap
      } else labels // already checkpointed by the cadence
    // singletons (no pair) are their own component, attached once
    nodes.select(col(idCol).cast("long").as("node"))
      .join(finalLabels, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("label"), col("node")).as("component"))
  }
}
