package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the event-analytics block (q78–q80). */
class EventAnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("q78: flagged rows satisfy the MAD inequality and dev identity") {
    val out = SparkEntry.queries("q78_mad_outliers")(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("dev") <= lit(2.0) * col("mad")).count() === 0)
    assert(out.filter(col("dev") =!= abs(col("value") - col("med")))
      .count() === 0)
    out.unpersist()
  }

  test("q79: stages consistent with timestamps, strictly ordered") {
    val out = SparkEntry.queries("q79_funnel")(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(!col("stage").isin(1, 2, 3)).count() === 0)
    // stage k ⟺ exactly the first k timestamps non-null, increasing
    assert(out.filter(col("stage") >= 2 &&
      (col("t_view_us").isNull ||
        col("t_view_us") <= col("t_signup_us"))).count() === 0)
    assert(out.filter(col("stage") === 3 &&
      (col("t_purchase_us").isNull ||
        col("t_purchase_us") <= col("t_view_us"))).count() === 0)
    assert(out.filter(col("stage") === 1 && col("t_view_us").isNotNull)
      .count() === 0)
    out.unpersist()
  }

  test("q78/q79/q80 plan: no forced broadcast of user-cardinality " +
      "relations; broadcast-disabled fallback stays exact") {
    // The per-user median/stage/cohort relations grow with |users| —
    // a forced broadcast() hint would override
    // autoBroadcastJoinThreshold and OOM the build side at 100×
    // (round-5 curation-dict lesson, applied here in round 6).
    // Law: with broadcasting disabled entirely — how the multi-GB
    // per-user relations plan at web scale — each query degrades to
    // shuffle joins with identical results.
    val names = Seq("q78_mad_outliers", "q79_funnel",
      "q80_retention_cohorts")
    val defaults = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().toSeq
    }.toMap
    val conf = spark.conf
    val k1 = "spark.sql.autoBroadcastJoinThreshold"
    val k2 = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prev1 = conf.get(k1)
    val prev2 = conf.getOption(k2)
    try {
      conf.set(k1, "-1"); conf.set(k2, "-1")
      names.foreach { n =>
        val fallback = SparkEntry.queries(n)(spark, sf)
        val rows = fallback.collect().toSeq
        // "no Broadcast exchange at all" — tighter than just
        // BroadcastHashJoin; a nested-loop variant would also violate
        // the no-forced-broadcast law
        assert(!fallback.queryExecution.executedPlan.toString
            .contains("BroadcastExchange"),
          s"$n must carry no broadcast exchange once broadcasting is " +
            "off (i.e. no forced hint survives)")
        // multiset compare: row ORDER is not part of the contract
        // across different physical plans (broadcast vs shuffle join
        // partitionings tie-break differently)
        assert(rows.sortBy(_.toString) === defaults(n).sortBy(_.toString),
          s"$n shuffle-join fallback must produce identical results")
      }
    } finally {
      conf.set(k1, prev1)
      prev2 match { case Some(v) => conf.set(k2, v); case None => conf.unset(k2) }
    }
  }

  test("q80: offset-0 diagonal partitions every user exactly once") {
    val out = SparkEntry.queries("q80_retention_cohorts")(spark, sf).cache()
    val users = graft.sources.Catalog.table(spark, sf, "events")
      .select(countDistinct(col("user_id"))).first().getLong(0)
    val diag = out.filter(col("day_offset") === 0)
      .agg(sum("n_users")).first().getLong(0)
    assert(diag === users, "every user appears in its cohort at offset 0")
    assert(out.filter(col("day_offset") < 0).count() === 0)
    out.unpersist()
  }
}
