package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization demonstration (VERDICT r8 gap #4): table and
  * column statistics computed via ANALYZE TABLE actually CHANGE the
  * join order of a multi-join chain when `spark.sql.cbo.joinReorder`
  * is on — the stats-driven planning layer that complements AQE's
  * runtime re-planning (AQE fixes exchange sizes DURING execution; CBO
  * picks the join ORDER before any exchange exists, which AQE cannot
  * undo).
  *
  * Shape under test: the chain  lineitem ⋈ orders ⋈ customer(filtered
  * tiny)  written SYNTACTICALLY as (lineitem ⋈ orders) ⋈ customer.
  * Cost-based reorder should instead join the two SMALL relations
  * first — (orders ⋈ customer) — because column stats estimate that
  * intermediate at a fraction of lineitem's row count, then join
  * lineitem once against the reduced set. At 100 TB this is the
  * difference between shuffling the fact table into a join that later
  * discards 98% of it and pre-shrinking with the dimension first.
  */
class CboSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // CBO reads catalog stats; both flags are also toggled per-test
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .getOrCreate()
    s
  }

  private val dir = "/root/testdata/sf0.001"

  /** Innermost joins: Join nodes with no Join beneath them. */
  private def innermostJoinTables(plan: LogicalPlan): Seq[Set[String]] = {
    def leaves(p: LogicalPlan): Seq[String] = p.collectLeaves().flatMap {
      case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        Seq(r.tableMeta.identifier.table)
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.map(_.identifier.table).toSeq
      case _ => Seq.empty
    }
    plan.collect {
      case j: Join if j.collect { case c: Join => c }.size == 1 =>
        leaves(j).toSet
    }
  }

  test("ANALYZE stats drive join reorder: dims join first under CBO") {
    val stage = java.nio.file.Files
      .createTempDirectory("graft_cbo_").toString
    val tabs = Seq("graft_cbo_lineitem", "graft_cbo_orders",
      "graft_cbo_customer")
    try {
      val li = sources.Catalog.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_quantity")
      val ord = sources.Catalog.table(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = sources.Catalog.table(spark, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
      Seq((li, tabs(0)), (ord, tabs(1)), (cust, tabs(2))).foreach {
        case (df, t) =>
          df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .option("path", s"$stage/$t").format("parquet").saveAsTable(t)
          spark.sql(
            s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      // stats landed in the catalog (rowCount is the CBO entry ticket)
      val cat = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst
          .TableIdentifier(tabs(0)))
      assert(cat.stats.flatMap(_.rowCount).exists(_.toLong > 0L),
        "ANALYZE must record a row count")

      // written syntactically fact-first: (lineitem ⋈ orders) ⋈ customer
      val q =
        s"""SELECT c_name, SUM(l_extendedprice) AS rev
           |FROM ${tabs(0)}
           |JOIN ${tabs(1)} ON l_orderkey = o_orderkey
           |JOIN ${tabs(2)} ON o_custkey = c_custkey
           |WHERE c_custkey < 8
           |GROUP BY c_name""".stripMargin

      def innermost(): Seq[Set[String]] =
        innermostJoinTables(spark.sql(q).queryExecution.optimizedPlan)

      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val without = innermost()
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val withCbo = innermost()

      // without CBO the optimizer keeps the syntactic fact-first order
      assert(without === Seq(Set("graft_cbo_lineitem", "graft_cbo_orders")),
        s"syntactic order expected without CBO, got $without")
      // with stats the reorder joins the two SMALL relations first
      assert(withCbo ===
        Seq(Set("graft_cbo_orders", "graft_cbo_customer")),
        s"stats-driven order expected with CBO, got $withCbo")

      // and the reorder is result-neutral (same rows either way)
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val a = spark.sql(q).orderBy(col("c_name")).collect().toSeq
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val b = spark.sql(q).orderBy(col("c_name")).collect().toSeq
      assert(a === b)
    } finally {
      tabs.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(stage))
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    }
  }

  /** V2 twin of [[innermostJoinTables]]: leaves are
    * DataSourceV2ScanRelations whose table name carries the
    * commit-log directory — match on its last path segment. */
  private def innermostJoinTablesV2(plan: LogicalPlan)
      : Seq[Set[String]] =
    plan.collect {
      case j: Join if j.collect { case c: Join => c }.size == 1 =>
        j.collectLeaves().flatMap {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation =>
            Seq(r.relation.table.name()
              .split('@').head.split('/').last)
          case _ => Seq.empty
        }.toSet
    }

  test("commit-log tables drive join reorder WITHOUT ANALYZE: the " +
      "DSv2 scan reports sidecar row counts, so CBO sees " +
      "cardinalities no catalog stats ever recorded") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cbov2_").toString
    try {
      spark.conf.set("spark.sql.catalog.gcbo",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.gcbo.root", root)
      val li = sources.Catalog.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_quantity")
      val ord = sources.Catalog.table(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // the tiny side is tiny ON DISK (no Filter node: join reorder
      // needs rowCount on every join item, and without column stats
      // a Filter would erase it)
      val cust = sources.Catalog.table(spark, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
        .filter(col("c_custkey") < 8)
      // stats-carrying appends: the sidecar rows ARE the CBO stats
      graft.sources.CommitLogStats.appendWithStats(spark,
        s"$root/ns/li", li, Seq("l_orderkey"))
      graft.sources.CommitLogStats.appendWithStats(spark,
        s"$root/ns/ord", ord, Seq("o_orderkey"))
      graft.sources.CommitLogStats.appendWithStats(spark,
        s"$root/ns/cust", cust, Seq("c_custkey"))
      // NO ANALYZE anywhere — the scan itself must report the counts
      // DECIMAL sum: exact and add-order-independent, so the
      // result-neutrality check below cannot trip on the reorder's
      // different floating-point accumulation order
      val q =
        """SELECT c_name,
          |  SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS rev
          |FROM gcbo.ns.li
          |JOIN gcbo.ns.ord ON l_orderkey = o_orderkey
          |JOIN gcbo.ns.cust ON o_custkey = c_custkey
          |GROUP BY c_name""".stripMargin
      def innermost(): Seq[Set[String]] =
        innermostJoinTablesV2(spark.sql(q).queryExecution.optimizedPlan)
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val without = innermost()
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val withCbo = innermost()
      assert(without === Seq(Set("li", "ord")),
        s"syntactic order expected without CBO, got $without")
      assert(withCbo === Seq(Set("ord", "cust")),
        s"sidecar-stats-driven order expected with CBO, got $withCbo")
      // result-neutral
      val b = spark.sql(q).orderBy(col("c_name")).collect().toSeq
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val a = spark.sql(q).orderBy(col("c_name")).collect().toSeq
      assert(a === b && b.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.catalog.gcbo")
      spark.conf.unset("spark.sql.catalog.gcbo.root")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(root))
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    }
  }
}
