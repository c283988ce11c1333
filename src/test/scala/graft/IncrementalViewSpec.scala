package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalView

/** The incremental-maintenance law: for a key-preserving view,
  * build(view(facts)) then refresh(view(delta)) equals a full rebuild
  * over the merged fact state — on the real q26-shaped view (lineitem
  * × part × supplier) over driver testdata. */
class IncrementalViewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def t(name: String): DataFrame =
    graft.sources.Catalog.table(spark, dir, name)

  /** q26-shaped key-preserving view: one output row per
    * (l_orderkey, l_linenumber) fact row + dimension lookups. */
  private def view(facts: DataFrame): DataFrame =
    facts
      .join(t("part"), col("l_partkey") === col("p_partkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_name"),
        col("s_name"), col("l_quantity"), col("l_extendedprice"))

  test("refresh(view(delta)) == full rebuild over merged facts") {
    val keys = Seq("l_orderkey", "l_linenumber")
    // the synthetic lineitem is NOT key-unique on (orderkey,
    // linenumber) (dup pairs by construction) — the incremental
    // contract requires a keyed fact relation, so dedup first
    val facts = t("lineitem").dropDuplicates(keys)
    val path = java.nio.file.Files.createTempDirectory("graft_iv")
      .toString + "/v"

    val n0 = IncrementalView.build(spark, view(facts), path)
    assert(n0 == facts.count())

    // changefeed: 50 updated fact rows (quantity bumped) + 20 new
    // fact rows under fresh keys
    val updated = facts.orderBy("l_orderkey", "l_linenumber").limit(50)
      .withColumn("l_quantity", col("l_quantity") + 100.0)
    val inserted = facts.orderBy(col("l_orderkey").desc,
        col("l_linenumber")).limit(20)
      .withColumn("l_orderkey", col("l_orderkey") + 10000000L)
    val delta = updated.unionByName(inserted)

    val (ins, refreshed) =
      IncrementalView.refresh(spark, view(delta), path, keys)
    assert(ins == 20L, s"inserted $ins")
    assert(refreshed == 50L, s"refreshed $refreshed")

    // law: target state == full rebuild over the merged fact relation
    val mergedFacts = facts
      .join(delta.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(delta)
    val expect = view(mergedFacts).collect().toSet
    val got = spark.read.parquet(path).collect().toSet
    assert(got.size == expect.size && got == expect)

    // idempotence: replaying the same delta changes nothing
    val (ins2, refreshed2) =
      IncrementalView.refresh(spark, view(delta), path, keys)
    assert(ins2 == 0L && refreshed2 == 70L)
    assert(spark.read.parquet(path).collect().toSet == expect)
  }
}
