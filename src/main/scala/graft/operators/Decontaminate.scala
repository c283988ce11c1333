package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share long
  * n-grams with a held-out benchmark/eval corpus. The standard
  * contamination check a pretraining pipeline runs before training
  * (n-gram overlap against eval sets, as popularized by the GPT-3 and
  * PaLM appendices). No reference counterpart (north-star scope).
  *
  * Scale shape: both sides shingle MAP-SIDE (FuzzyDedup.shingles'
  * typed kernel, per-doc local dedup); the only shuffle is the
  * equi-join on the shingle — and the benchmark side is tiny by
  * definition (eval sets are thousands of docs, not billions), so
  * Catalyst/AQE broadcasts it and the check costs ONE pass over the
  * training corpus with a map-side hash probe. At 100 TB, swap the
  * join key to `xxhash64(shingle)` to shrink the broadcast and probe
  * width (kept as the raw string here so the DuckDB oracle can replay
  * the join exactly).
  */
object Decontaminate {

  /** Per contaminated training doc: how many distinct k-gram shingles
    * it shares with the benchmark corpus, and with how many distinct
    * benchmark docs. Training docs with zero overlap are absent (the
    * clean majority — at scale you anti-join this output against the
    * corpus to drop or flag the hits). */
  def overlap(train: DataFrame, bench: DataFrame, docId: String,
      text: Column, k: Int = 8): DataFrame = {
    val trainSh = FuzzyDedup.shingles(train, docId, text, k, cache = false)
    val benchSh = FuzzyDedup.shingles(bench, docId, text, k, cache = false)
      .withColumnRenamed(docId, "bench_id")
    trainSh.join(benchSh, Seq("shingle"))
      .groupBy(col(docId))
      .agg(
        countDistinct(col("shingle")).as("n_hit_ngrams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }
}
