package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from SURVEY §2;
  * [[oracleSql]] carries the DuckDB-equivalent SQL for the hash compare.
  * Output discipline for oracle parity:
  *   - every computed column aliased identically on both sides;
  *   - double aggregations routed through DecimalType so the sum is
  *     exact (order-independent) then cast back to double → bit-equal;
  *   - deterministic total ORDER BY on a unique key in both engines.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  /** Exact (order-independent) sum of a double column: route through
    * DecimalType, then back to double for a stable oracle compare. */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 6) =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val modules = Seq(
      baseQueries,
      graft.queries.Relational.queries,
      graft.queries.Text.queries,
      graft.queries.DedupQueries.queries,
      graft.queries.SimilarityQueries.queries,
      graft.queries.MultimodalQueries.queries,
      graft.queries.ViewQueries.queries,
      graft.queries.Relational2.queries,
      graft.queries.TextPipeline.queries,
      graft.queries.Pipeline2.queries,
      graft.queries.Pipeline3.queries,
      graft.queries.Pipeline4.queries,
      graft.queries.Analytics.queries,
      graft.queries.CurationQueries.queries,
      graft.queries.Pipeline5.queries,
      graft.queries.EventAnalytics.queries,
      graft.queries.Pipeline6.queries,
      graft.queries.Pipeline7.queries,
      graft.queries.Pipeline8.queries,
      graft.queries.Pipeline9.queries,
      graft.queries.Formats.queries,
      graft.queries.Layouts.queries,
      graft.queries.Pipeline10.queries,
      graft.queries.Pipeline11.queries,
      graft.queries.Pipeline12.queries,
      graft.queries.Pipeline13.queries,
      graft.queries.Pipeline14.queries,
      graft.queries.Pipeline15.queries,
      graft.queries.Pipeline16.queries,
      graft.queries.Pipeline17.queries,
      graft.queries.Pipeline18.queries,
      graft.queries.Pipeline19.queries,
      graft.queries.Pipeline20.queries,
      graft.queries.Pipeline21.queries,
      graft.queries.StreamingReplay.queries)
    val merged = modules.reduce(_ ++ _)
    // a duplicate name across modules would silently shadow a query —
    // fail loudly instead
    require(merged.size == modules.map(_.size).sum,
      s"duplicate query names across modules: " +
        modules.flatMap(_.keys).groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => k
        }.mkString(", "))
    require(oracleSql.keySet.subsetOf(merged.keySet),
      s"oracle entries without a query: ${oracleSql.keySet -- merged.keySet}")
    merged
  }

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R-series gap table: aggregation (hash agg, partial+final) — SURVEY §2.4
    "q01_agg_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Flagship: the reference's whole parcela_CIOT query, R1-R15
    // (SURVEY §7.2) on the FIXTURES.md §4 TPC-H mapping.
    "q02_parcela_ciot_pipeline" -> ((s, dir) =>
      graft.pipelines.ParcelaCiot.build(s, dir)),

    // S4 idempotent upsert through the gate: key pairs a second run
    // would insert = incoming ANTI existing-keys (left_anti join).
    // Keys only — (l_orderkey, l_linenumber) is non-unique in this
    // synthetic data, so any payload pick would be nondeterministic.
    "q03_idempotent_upsert_delta" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val keys = Seq("l_orderkey", "l_linenumber")
      val existing = li
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      graft.operators.IdempotentInsert
        .newRows(li.select(keys.map(col): _*), existing, keys)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  lazy val oracleSql: Map[String, String] = baseOracleSql ++
    graft.queries.Relational.oracleSql ++
    graft.queries.Text.oracleSql ++
    graft.queries.DedupQueries.oracleSql ++
    graft.queries.SimilarityQueries.oracleSql ++
    graft.queries.MultimodalQueries.oracleSql ++
    graft.queries.ViewQueries.oracleSql ++
    graft.queries.Relational2.oracleSql ++
    graft.queries.TextPipeline.oracleSql ++
    graft.queries.Pipeline2.oracleSql ++
    graft.queries.Pipeline3.oracleSql ++
    graft.queries.Pipeline4.oracleSql ++
    graft.queries.Analytics.oracleSql ++
    graft.queries.CurationQueries.oracleSql ++
    graft.queries.Pipeline5.oracleSql ++
    graft.queries.EventAnalytics.oracleSql ++
    graft.queries.Pipeline6.oracleSql ++
    graft.queries.Pipeline7.oracleSql ++
    graft.queries.Pipeline8.oracleSql ++
    graft.queries.Pipeline9.oracleSql ++
    graft.queries.Formats.oracleSql ++
    graft.queries.Layouts.oracleSql ++
    graft.queries.Pipeline10.oracleSql ++
    graft.queries.Pipeline11.oracleSql ++
    graft.queries.Pipeline12.oracleSql ++
    graft.queries.Pipeline13.oracleSql ++
    graft.queries.Pipeline14.oracleSql ++
    graft.queries.Pipeline15.oracleSql ++
    graft.queries.Pipeline16.oracleSql ++
    graft.queries.Pipeline17.oracleSql ++
    graft.queries.Pipeline18.oracleSql ++
    graft.queries.Pipeline19.oracleSql ++
    graft.queries.Pipeline20.oracleSql ++
    graft.queries.Pipeline21.oracleSql ++
    graft.queries.StreamingReplay.oracleSql

  private def baseOracleSql: Map[String, String] = Map(
    "q01_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_parcela_ciot_pipeline" -> graft.pipelines.ParcelaCiot.oracle,

    "q03_idempotent_upsert_delta" ->
      """SELECT DISTINCT l_orderkey, l_linenumber
        |FROM lineitem l
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem e
        |  WHERE e.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |    AND e.l_orderkey = l.l_orderkey
        |    AND e.l_linenumber = l.l_linenumber)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
