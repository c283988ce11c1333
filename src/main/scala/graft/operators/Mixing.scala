package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix construction — combine data sources with per-stratum
  * epoch weights, including UPsampling (weights > 1 epoch), the way a
  * pretraining data recipe repeats high-quality sources fractionally
  * ("2.3 epochs of wiki, 0.5 of web", cf. the public LLaMA/Pile data
  * recipes). No reference counterpart (north-star scope).
  *
  * Weights are integer PERCENT of an epoch (230 = 2.3 epochs). A doc
  * with weight w emits `w div 100` full copies plus one extra copy
  * with probability (w mod 100)/100 — decided by a DETERMINISTIC
  * per-key hash, not RNG, so the mix is stable across re-runs,
  * machines and partitionings, and the oracle replays it exactly.
  *
  * Scale shape: pure map-side — a CASE lookup, one integer hash, and
  * an explode over at most ceil(w/100) copies. No shuffle, no driver
  * state; composes with a downstream global shuffle-for-training pass.
  */
object Mixing {

  /** (original columns) + `epoch` (0-based copy index), one row per
    * kept copy. Strata absent from `weightsPct` get `defaultPct`. */
  def epochMix(df: DataFrame, keyCol: String, stratumCol: String,
      weightsPct: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require(weightsPct.values.forall(_ >= 0) && defaultPct >= 0,
      "epoch weights must be non-negative")
    val wExpr = weightsPct.foldLeft(when(lit(false), lit(0))) {
      case (acc, (stratum, pct)) => acc.when(col(stratumCol) === stratum, pct)
    }.otherwise(lit(defaultPct))
    // u ∈ [0, 100): portable LCG-style hash of the key, replayable in
    // any SQL engine. The key is reduced mod p FIRST (pmod — defined
    // for negative keys too), so the product stays < p·1103515245 ≈
    // 1.1e18 < 2^63 for EVERY long key — no ANSI overflow, ever.
    val p = 1000000007L
    val u = (pmod(col(keyCol).cast("long"), lit(p)) * lit(1103515245L) +
      lit(12345L)) % lit(p) % lit(100L)
    df.withColumn("w_pct", wExpr)
      .withColumn("n_copies",
        expr("w_pct div 100") + (u < col("w_pct") % 100).cast("long"))
      .filter(col("n_copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("n_copies") - 1L)))
      .drop("w_pct", "n_copies")
  }
}
