package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level laws for the storage-layout block (q117–q119). The
  * value-level gate is the DuckDB oracle; these pin the properties the
  * oracle can't see — that the partition predicate actually prunes
  * directories, and that the bucketed join actually skips the shuffle.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_spec_${tag}_").toString

  private def rm(p: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
  }

  test("q117: CSV round-trip preserves a quoting-hostile column exactly") {
    val d = queries.Layouts.hostileDocs(spark, dir)
      .select(col("doc_id"), col("hostile"))
    val stage = tempDir("csv")
    try {
      d.write.mode(SaveMode.Overwrite)
        .option("header", "true").option("quote", "\"").option("escape", "\"")
        .csv(stage)
      val back = spark.read.schema(d.schema)
        .option("header", "true").option("quote", "\"").option("escape", "\"")
        .option("multiLine", "true")
        .csv(stage)
      // row-for-row equality, not just a checksum: anti-join both ways
      assert(back.count() === d.count())
      assert(back.exceptAll(d).count() === 0)
      assert(d.exceptAll(back).count() === 0)
      // the hostile column genuinely contains every CSV-hostile char
      val h = d.select(col("hostile")).first().getString(0)
      assert(h.contains(",") && h.contains("\"") && h.contains("\n")
        && h.contains("\t"))
    } finally rm(stage)
  }

  test("q118: the year predicate is a planning-time partition filter") {
    val stage = tempDir("part")
    try {
      sources.Catalog.table(spark, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(stage)
      val all = spark.read.parquet(stage)
      val years = all.select(col("o_year")).distinct().count()
      assert(years > 2, s"need >2 year partitions to prove pruning, got $years")

      val pruned = all.filter(col("o_year") >= 1996)
      val scan = pruned.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec in plan"))
      assert(scan.partitionFilters.nonEmpty,
        "o_year >= 1996 must become a partition filter, not a data filter")
      // pruning is real: the scan's selected partitions < total partitions
      val selected = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters).length
      assert(selected < years,
        s"expected pruned partition count < $years, got $selected")
    } finally rm(stage)
  }

  test("q119: bucketed-by-key tables sort-merge join with zero exchanges") {
    val stage = tempDir("bkt")
    val oTab = "graft_spec_bkt_orders"
    val lTab = "graft_spec_bkt_lineitem"
    // disable broadcast so the bucketing (not a broadcast) is what
    // removes the exchange — this is the 100 TB fact⋈fact shape
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      sources.Catalog.table(spark, dir, "orders").select("o_orderkey", "o_custkey")
        .write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$stage/orders").saveAsTable(oTab)
      sources.Catalog.table(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
        .write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$stage/lineitem").saveAsTable(lTab)

      val j = spark.table(oTab)
        .join(spark.table(lTab), col("o_orderkey") === col("l_orderkey"))
      val exec = j.queryExecution.executedPlan
      val inner = exec match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val exchanges = inner.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"bucketed join must not shuffle; found: ${exchanges.map(_.nodeName)}")

      // and it is still the RIGHT answer vs the plain (shuffling) join
      val plain = sources.Catalog.table(spark, dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(sources.Catalog.table(spark, dir, "lineitem")
          .select("l_orderkey", "l_quantity"),
          col("o_orderkey") === col("l_orderkey"))
      assert(j.count() === plain.count())
      assert(j.exceptAll(plain).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql(s"DROP TABLE IF EXISTS $oTab")
      spark.sql(s"DROP TABLE IF EXISTS $lTab")
      rm(stage)
    }
  }
}
