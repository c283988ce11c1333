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

  /** [[overlap]] behind a Bloom-filter pre-gate — the at-scale shape
    * when even the benchmark shingle set is too wide to hash-probe for
    * EVERY training shingle: a distributed-built Bloom filter over the
    * benchmark shingles rides the closure to every task, and only
    * training shingles the filter might-contain reach the exact join.
    *
    * EXACT output, identical to [[overlap]] (spec-pinned): Bloom
    * filters have no false negatives, so no true hit is dropped, and
    * every false positive is eliminated by the exact equi-join verify
    * — the engine's standard candidate-generate-then-verify shape.
    * The filter costs `~1.44·log2(1/fpp)` bits per benchmark shingle
    * (~14 bits at fpp=1e-4 vs the full string in a broadcast hash
    * table), and the join's shuffle shrinks from every training
    * shingle to ~(hits + fpp·|train shingles|) rows. */
  def overlapBloom(train: DataFrame, bench: DataFrame, docId: String,
      text: Column, k: Int = 8, fpp: Double = 1e-4): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val trainSh = FuzzyDedup.shingles(train, docId, text, k, cache = false)
    val benchSh = FuzzyDedup.shingles(bench, docId, text, k, cache = false)
      .withColumnRenamed(docId, "bench_id")
    val nBench = benchSh.count()
    val bloom = benchSh.stat.bloomFilter("shingle",
      math.max(nBench, 1L), fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val candidates = trainSh
      .select(col(docId).cast("long").as("id"), col("shingle"))
      .as[(Long, String)]
      .filter(t => bc.value.mightContainString(t._2))
      .toDF("id", "shingle")
      .withColumnRenamed("id", docId)
    candidates.join(benchSh, Seq("shingle"))
      .groupBy(col(docId))
      .agg(
        countDistinct(col("shingle")).as("n_hit_ngrams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }
}
