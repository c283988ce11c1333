package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact heavy hitters (frequent items) via per-partition
  * Misra–Gries summaries + exact candidate recount — the
  * candidate-generate-then-verify shape this engine uses everywhere
  * (MinHash → Jaccard verify, LSH → dot verify).
  *
  * Stage 1 (map-side, no shuffle): each partition folds its items
  * through a Misra–Gries summary with `capacity` counters. MG
  * guarantees any item with LOCAL count > n_p/(capacity+1) survives
  * the partition's summary. Pigeonhole across partitions: if a token's
  * GLOBAL count ≥ N/(capacity+1) then in at least one partition its
  * local count exceeds n_p/(capacity+1), so every global heavy hitter
  * at threshold θ ≥ 1/(capacity+1) appears in the candidate union —
  * the summary union is a guaranteed SUPERSET of the answer.
  *
  * Stage 2 (exact verify): candidates (a few × capacity rows — tiny)
  * are broadcast; one filtered groupBy recounts them EXACTLY, and the
  * threshold filter runs on true counts. Result: exact answer, one
  * shuffle whose input is only candidate-matching rows.
  *
  * At 100 TB this is the only viable exact-frequent-items plan: the
  * naive full groupBy shuffles every distinct token (billions); this
  * shuffles only tokens that are plausibly ≥θ-frequent.
  */
object HeavyHitters {

  /** Exact tokens with global frequency ≥ numer/denom of all tokens.
    *
    * @param items    single string-column input (one row per item)
    * @param capacity MG counters per partition; must satisfy
    *                 capacity + 1 ≥ denom/numer for the superset
    *                 guarantee — enforced
    * @return (item, cnt) for every item with cnt·denom ≥ N·numer
    */
  def frequentItems(items: DataFrame, itemCol: String,
      numer: Long, denom: Long, capacity: Int): DataFrame = {
    require(numer > 0 && denom > 0 && numer <= denom)
    require((capacity + 1).toLong * numer >= denom,
      s"capacity $capacity too small for threshold $numer/$denom " +
        "(superset guarantee needs capacity+1 >= denom/numer)")
    val spark = items.sparkSession
    import spark.implicits._
    val col0 = col(itemCol).cast("string")

    val ds = items.select(col0.as("item")).filter(col("item").isNotNull)
      .as[String]
    // Stage 1: per-partition Misra-Gries — one pass, O(capacity) space
    val candidates = ds.mapPartitions { it =>
      val counters = new java.util.HashMap[String, Long]()
      it.foreach { x =>
        val c = counters.getOrDefault(x, 0L)
        if (c != 0L) counters.put(x, c + 1L)
        else if (counters.size < capacity) counters.put(x, 1L)
        else {
          // decrement-all step; drop zeroed counters
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) e.remove()
            else kv.setValue(kv.getValue - 1L)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      counters.keySet().iterator().asScala
    }.distinct()
      .withColumnRenamed("value", "item")

    // Stage 2: exact recount of candidates only; threshold on N
    val n = ds.count()
    items.select(col0.as("item"))
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(denom) >= lit(n * numer))
  }
}
