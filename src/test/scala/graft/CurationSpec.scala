package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.Curation

/** Laws for the corpus-curation operators (q70–q73): boilerplate
  * bounds, one-canonical-per-component, budget prefix-closure, and
  * the flagship's subset/budget invariants; plus the q70 plan claim
  * (the df-thresholded dictionary joins broadcast, never shuffled).
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"
  private val stop = TextFunctions.langMarkers.head._2

  private def docs = graft.sources.Catalog.table(spark, sf, "documents")

  test("boilerplateStats: every doc present, counts bounded, frac in [0,1]") {
    val bp = Curation.boilerplateStats(docs, "doc_id", col("text")).cache()
    assert(bp.count() === docs.count())
    assert(bp.filter(col("n_common") > col("n_shingles")).count() === 0)
    assert(bp.filter(col("boilerplate_frac") < 0.0 ||
      col("boilerplate_frac") > 1.0).count() === 0)
    // frac is NULL exactly when the doc has no shingles
    assert(bp.filter(col("boilerplate_frac").isNull &&
      col("n_shingles") > 0).count() === 0)
    bp.unpersist()
  }

  test("canonicalDocs: exactly one kept per component, and it is the argmax") {
    val stats = TextFunctions.textStats(docs, "doc_id", col("text"), stop)
    val canon = Curation
      .canonicalDocs(docs, "doc_id", col("text"), stats).cache()
    val perComp = canon.groupBy("component")
      .agg(sum(when(col("is_kept"), 1).otherwise(0)).as("n_kept"),
        max(col("quality")).as("max_q"))
    assert(perComp.filter(col("n_kept") =!= 1).count() === 0)
    // the kept doc carries the component's max quality
    val kept = canon.filter(col("is_kept"))
      .join(perComp, "component")
      .filter(col("quality") < col("max_q"))
    assert(kept.count() === 0)
    canon.unpersist()
  }

  test("budgetSample: kept set is the maximal quality-desc prefix within budget") {
    val budget = 800L
    val stats = TextFunctions.textStats(docs, "doc_id", col("text"), stop)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val members = docs.select(col("doc_id"), col("source"))
      .join(stats, "doc_id")
    val s = Curation.budgetSample(members, "doc_id", "source", budget).cache()
    // kept tokens never exceed the budget per group
    val sums = s.filter(col("is_kept")).groupBy("source")
      .agg(sum("n_tokens").as("t"))
    assert(sums.filter(col("t") > budget).count() === 0)
    // prefix-closed: a kept doc never ranks below a dropped one
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("quality").desc_nulls_last, col("doc_id"))
    val rk = s.withColumn("rk", row_number().over(w))
    val maxKept = rk.filter(col("is_kept")).groupBy("source")
      .agg(max("rk").as("mk"))
    val holes = rk.join(maxKept, "source")
      .filter(!col("is_kept") && col("rk") < col("mk"))
    assert(holes.count() === 0)
    s.unpersist()
  }

  test("curate: flagship rows are canonical, gated, and within budget") {
    val out = Curation.curate(docs, "doc_id", col("text"), "source", stop)
      .cache()
    assert(out.count() > 0)
    val stats = TextFunctions.textStats(docs, "doc_id", col("text"), stop)
    val keptIds = Curation.canonicalDocs(docs, "doc_id", col("text"), stats)
      .filter(col("is_kept")).select("doc_id")
    assert(out.join(keptIds, Seq("doc_id"), "left_anti").count() === 0,
      "every curated row must be its cluster's canonical doc")
    val gated = Curation.boilerplateStats(docs, "doc_id", col("text"))
      .filter(coalesce(col("boilerplate_frac"), lit(0.0)) <= 0.10)
      .select("doc_id")
    assert(out.join(gated, Seq("doc_id"), "left_anti").count() === 0,
      "every curated row must pass the boilerplate gate")
    assert(out.groupBy("source").agg(sum("n_tokens").as("t"))
      .filter(col("t") > 800L).count() === 0)
    out.unpersist()
  }

  test("q70 plan: dict join broadcasts via AQE when small; forced-shuffle " +
      "fallback (the web-scale multi-GB-dict regime) stays exact") {
    // No forced broadcast() hint on the dictionary (a hint would
    // override autoBroadcastJoinThreshold and OOM executors once the
    // dictionary outgrows memory). Law 1: with AQE free to choose, the
    // tiny sf0.01 dictionary still lands as a broadcast join. Law 2:
    // with broadcasting disabled entirely — how a multi-GB dictionary
    // plans — the operator degrades to a shuffle join with identical
    // results.
    val sh = graft.operators.FuzzyDedup
      .shingles(docs, "doc_id", col("text"), 3)
    val default = Curation.boilerplateFromShingles(docs, "doc_id", sh, 5)
    val defaultRows = default.collect().toSet // execute → AQE final plan
    assert(default.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
      "AQE must broadcast the small dictionary at runtime")
    val conf = spark.conf
    val k1 = "spark.sql.autoBroadcastJoinThreshold"
    val k2 = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prev1 = conf.get(k1)
    val prev2 = conf.getOption(k2)
    try {
      conf.set(k1, "-1"); conf.set(k2, "-1")
      val fallback = Curation.boilerplateFromShingles(docs, "doc_id", sh, 5)
      val fallbackRows = fallback.collect().toSet
      assert(!fallback.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
        "with broadcast disabled the plan must not contain a broadcast join")
      assert(fallbackRows === defaultRows,
        "shuffle-join fallback must produce identical results")
    } finally {
      conf.set(k1, prev1)
      prev2 match { case Some(v) => conf.set(k2, v); case None => conf.unset(k2) }
    }
    sh.unpersist()
  }
}
