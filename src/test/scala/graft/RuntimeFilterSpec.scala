package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (bloom) filter injection — the row-level sibling of q137's
  * partition-level dynamic pruning.
  *
  * When the fact table is NOT partitioned by the join key (the common
  * case — a 100 TB event log is laid out by time, joined by entity),
  * DPP has nothing to prune. Catalyst's InjectRuntimeFilter instead
  * builds a bloom filter from the FILTERED dim side's join keys and
  * pushes `might_contain` onto the fact scan, discarding
  * never-joinable rows before the shuffle — at scale that converts a
  * full-fact shuffle into a selectivity-proportional one.
  *
  * The thresholds that gate injection are sized for clusters
  * (creation side ≤ 10 MB plan-size AND application side ≥ 10 GB
  * scan-size by stats), so spec-sized data can never trip them
  * naturally; the spec lowers the application-side floor to zero and
  * pins (1) the bloom build + probe in the optimized plan and (2)
  * digest equality with the filter disabled — the same
  * mechanism-plus-value contract as SkewJoinSpec.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withConfs[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** fact (events-shaped, unpartitioned by the join key) ⋈ filtered
    * dim — written to parquet so the application side is a real file
    * scan the filter can push onto. */
  private def fixture(): (String, DataFrame => (Long, Long)) = {
    val stage = java.nio.file.Files
      .createTempDirectory("graft_spec_rbf_").toString
    spark.range(200000)
      .select((col("id") % 5000).as("entity_id"), col("id").as("event_id"),
        (col("id") % 97).as("v"))
      .write.mode("overwrite").parquet(s"$stage/fact")
    // dim: 5000 entities, the filter keeps 50 — selective enough that
    // a bloom on dim keys discards ~99% of fact rows pre-shuffle
    spark.range(5000)
      .select(col("id").as("entity_id"), (col("id") % 100).as("segment"))
      .write.mode("overwrite").parquet(s"$stage/dim")
    val digest = (joined: DataFrame) => {
      val r = joined.agg(count(lit(1)).as("n"),
        sum(col("v") + col("segment")).as("s")).first()
      (r.getLong(0), r.getLong(1))
    }
    (stage, digest)
  }

  private def joinPlan(stage: String): DataFrame = {
    val fact = spark.read.parquet(s"$stage/fact")
    val dim = spark.read.parquet(s"$stage/dim")
      .filter(col("segment") === 7)
    fact.join(dim, Seq("entity_id"))
  }

  test("selective dim join injects a bloom filter on the fact side; " +
      "values identical with the filter off") {
    val (stage, digest) = fixture()
    try {
      val confs = Seq(
        // force the shuffle-join shape the filter exists for
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        // cluster-sized floor (10 GB) → 0 so spec-sized data qualifies
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
      val (withFilter, plan) = withConfs(confs: _*) {
        val j = joinPlan(stage)
        val d = digest(j)
        (d, j.queryExecution.optimizedPlan.toString)
      }
      assert(plan.contains("might_contain"),
        s"optimized plan must probe a runtime bloom filter:\n$plan")
      assert(plan.contains("bloom_filter_agg"),
        s"optimized plan must build the bloom from the dim side:\n$plan")
      val without = withConfs(
        (confs.toMap + ("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")).toSeq: _*) {
        digest(joinPlan(stage))
      }
      assert(withFilter === without,
        "bloom filter must discard only never-joinable rows")
      assert(withFilter._1 > 0)
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    }
  }
}
