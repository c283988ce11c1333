package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Catalog, Formats}

/** Format round-trips and partition-pruning evidence. */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("csv and json round-trip the nation table with explicit schema") {
    val nation = Catalog.table(spark, sfDir, "nation")
    val base = Files.createTempDirectory("graft_fmt").toString
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("n_nationkey").collect().map(_.toString).toSeq

    Formats.writeCsv(nation, s"$base/csv")
    val fromCsv = Formats.readCsv(spark, s"$base/csv", nation.schema)
    assert(canon(fromCsv) == canon(nation))

    Formats.writeJsonLines(nation, s"$base/json")
    val fromJson = Formats.readJsonLines(spark, s"$base/json", nation.schema)
    assert(canon(fromJson) == canon(nation))
  }

  test("partitioned write prunes partitions at the scan") {
    val li = Catalog.table(spark, sfDir, "lineitem")
    val base = Files.createTempDirectory("graft_part").toString + "/li"
    Formats.writePartitioned(li, base, Seq("l_returnflag"))
    val flags = li.select("l_returnflag").distinct().count()
    assert(flags > 1)

    val pruned = spark.read.parquet(base)
      .filter(col("l_returnflag") === "R")
    val scan = pruned.queryExecution.executedPlan.toString
    // predicate must land in PartitionFilters (directory pruning),
    // not as a post-scan data filter
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*l_returnflag[^\\]]*\\].*"),
      scan)
    val expected = li.filter(col("l_returnflag") === "R").count()
    assert(pruned.count() == expected)
  }
}
