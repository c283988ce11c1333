package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-curation operators for a training-data pipeline: measure
  * cross-document boilerplate, pick one canonical document per
  * near-duplicate cluster, and fill a per-group token budget with the
  * best documents. These compose with the dedup/quality operators into
  * the end-to-end curation flagship (q73).
  *
  * The reference has no analogue (its scope is RDBMS transfer,
  * `Select de Importação de Dados.py:34-99`); these are the SURVEY
  * §2.4 training-pipeline extensions.
  */
object Curation {

  /** Per-document boilerplate fraction: the share of a document's
    * DISTINCT k-gram shingles that fall in the corpus-wide boilerplate
    * dictionary (shingles occurring in ≥ minDf distinct documents) —
    * the cross-document repetition signal CCNet-style pipelines gate
    * on (within-document repetition is q57's dup_frac).
    *
    * Scale shape: one shuffle keyed on shingle builds document
    * frequencies; the df-thresholded dictionary is orders of magnitude
    * smaller than the corpus (151 of 16k shingles at sf0.01) and AQE
    * broadcasts it at runtime when it is actually small — no forced
    * hint, so a web-scale multi-GB dictionary degrades to a shuffle
    * join instead of an executor OOM. The shingle relation feeds two consumers, so it is
    * persisted, and released once the thin per-doc output is pinned
    * (localCheckpoint) — callers never inherit corpus-sized cache.
    */
  def boilerplateStats(docs: DataFrame, docId: String, text: Column,
      k: Int = 3, minDf: Int = 5): DataFrame = {
    val sh = FuzzyDedup.shingles(docs, docId, text, k) // distinct per doc; persisted
    val pinned = boilerplateFromShingles(docs, docId, sh, minDf)
      .localCheckpoint(true)
    sh.unpersist()
    pinned
  }

  /** [[boilerplateStats]] over a PRE-BUILT distinct (docId, shingle)
    * relation — lazy, no cache management; the caller owns `sh`. Lets
    * the composed curate pipeline share one shingle relation between
    * the dedup and boilerplate stages instead of recomputing it. */
  def boilerplateFromShingles(docs: DataFrame, docId: String,
      sh: DataFrame, minDf: Int = 5): DataFrame = {
    val dict = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("shingle"), lit(1).as("is_common"))
    // NO forced broadcast hint on the dictionary: at sf0.01 it is tiny
    // (151 of 16k shingles) and AQE's runtime join-strategy switch
    // broadcasts it for free, but at web scale the boilerplate
    // dictionary grows with corpus breadth — a forced hint would
    // override autoBroadcastJoinThreshold and OOM every executor.
    // AQE sees the dict's true post-aggregation size and picks
    // broadcast vs shuffle correctly at any scale (fallback path
    // pinned by CurationSpec's broadcast-disabled law).
    val perDoc = sh.join(dict, Seq("shingle"), "left")
      .groupBy(col(docId))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("is_common")).as("n_common"))
    docs.select(col(docId))
      .join(perDoc, Seq(docId), "left")
      .select(col(docId),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        // < k tokens → no shingles → fraction undefined, not 0/0
        (col("n_common").cast("double") / col("n_shingles").cast("double"))
          .as("boilerplate_frac"))
  }

  /** Canonical-document selection: connected components over the
    * verified MinHash-LSH near-dup pair graph, then keep exactly one
    * document per component — the highest quality score, doc-id
    * ascending as the tiebreak. `quality` is a (docId, quality)
    * relation (typically [[TextFunctions.textStats]]), passed in so a
    * composed pipeline computes stats once.
    *
    * Scale shape: pair building is the sub-quadratic LSH path
    * (banded candidates + exact verify); components iterate only the
    * duplicate subgraph; the final window partitions by component —
    * components are near-dup clusters, bounded and tiny, so the
    * window shuffle is skew-free.
    */
  def canonicalDocs(docs: DataFrame, docId: String, text: Column,
      quality: DataFrame, tau: Double = 0.5): DataFrame = {
    val pairs = FuzzyDedup.minhashDedupPairs(docs, docId, text,
      tau = tau, k = 3, numHashes = 64, bandRows = 4)
    canonicalFromPairs(docs, docId, pairs, quality)
  }

  /** [[canonicalDocs]] from a PRE-BUILT verified near-dup pair relation
    * (docId_a, docId_b) — components + per-component best-quality
    * window only; no shingling. */
  def canonicalFromPairs(docs: DataFrame, docId: String,
      pairs: DataFrame, quality: DataFrame): DataFrame = {
    val comp = Components.connectedComponents(
      docs.select(col(docId)), docId, pairs, docId + "_a", docId + "_b")
    val w = Window.partitionBy(col("component"))
      .orderBy(col("quality").desc_nulls_last, col(docId))
    comp.select(col("node").as(docId), col("component"))
      .join(quality.select(col(docId), col("quality")), Seq(docId))
      .withColumn("is_kept", row_number().over(w) === 1)
      .select(col(docId), col("component"), col("quality"), col("is_kept"))
  }

  /** Token-budget sampling: within each group (source/domain/lang),
    * rank documents by quality descending (doc-id tiebreak) and keep
    * the prefix whose RUNNING token total fits the budget — how a
    * mixture spec ("at most N tokens from this domain, best first")
    * is materialized. `members` must carry (docId, groupCol,
    * n_tokens, quality).
    *
    * Scale shape: one window shuffle keyed on the group column;
    * groups are independent, so parallelism is the group count and
    * skew is bounded by the largest single group (a per-group window,
    * not a global sort).
    */
  def budgetSample(members: DataFrame, docId: String, groupCol: String,
      budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("quality").desc_nulls_last, col(docId))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    members
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(w).cast("long"))
      .withColumn("is_kept", col("cum_tokens") <= budgetTokens)
      .select(col(groupCol), col(docId), col("n_tokens"), col("quality"),
        col("cum_tokens"), col("is_kept"))
  }

  /** End-to-end curation flagship: near-dup canonical selection on the
    * full corpus → boilerplate gate (fraction ≤ maxBoilerplate; docs
    * too short to shingle pass) → per-source token-budget fill, best
    * quality first. Returns only the kept rows: the curated corpus a
    * tokenizer run would consume.
    */
  def curate(docs: DataFrame, docId: String, text: Column,
      groupCol: String, stopwords: Seq[String], tau: Double = 0.5,
      k: Int = 3, minDf: Int = 5, maxBoilerplate: Double = 0.10,
      budgetTokens: Long = 800L): DataFrame = {
    val stats = TextFunctions.textStats(docs, docId, text, stopwords)
      .select(col(docId), col("n_tokens"), col("quality"))
      .persist()
    // ONE shingle relation feeds both the near-dup pair stage and the
    // boilerplate dictionary — previously each stage rebuilt it
    // (tokenize + shingle the whole corpus twice; the q73 flagship
    // cost ~2× the sum of its parts). `k` now governs both stages.
    val sh = FuzzyDedup.shingles(docs, docId, text, k)
    val pairs = FuzzyDedup.minhashDedupPairsFromShingles(sh, docId,
      tau, numHashes = 64, bandRows = 4).localCheckpoint(true)
    val canon = canonicalFromPairs(docs, docId, pairs, stats)
      .filter(col("is_kept"))
      .select(col(docId))
    val bp = boilerplateFromShingles(docs, docId, sh, minDf)
      .filter(coalesce(col("boilerplate_frac"), lit(0.0)) <= maxBoilerplate)
      .select(col(docId))
    val members = docs.select(col(docId), col(groupCol))
      .join(canon, Seq(docId), "left_semi")
      .join(bp, Seq(docId), "left_semi")
      .join(stats, Seq(docId))
    val out = budgetSample(members, docId, groupCol, budgetTokens)
      .filter(col("is_kept"))
      .select(col(groupCol), col(docId), col("n_tokens"), col("quality"),
        col("cum_tokens"))
    val pinned = out.localCheckpoint(true)
    sh.unpersist()
    stats.unpersist()
    pinned
  }
}
