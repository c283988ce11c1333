package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** Classic warehouse-analytics flagships in the TPC-H query shapes
  * (Q3 shipping priority, Q5 local supplier volume, Q10 returned
  * items) over the synthetic star schema — the multi-join +
  * aggregate + top-k plans a complete analytics engine must run
  * well. Plan intent, verified via explain in AnalyticsSpec:
  * dimension filters pushed to the scans, small dims broadcast, ONE
  * sort-merge join on the fact key, partial aggregation before the
  * group-key shuffle, and a TakeOrderedAndProject (never a global
  * sort) for the top-k.
  */
object Analytics {

  /** Exact order-independent revenue sum: product in double (both
    * engines'), then decimal-routed summation, then back to double. */
  private def revenue: Column =
    sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(30,6)")).cast("double").as("revenue")

  /** The star-schema date columns are TIMESTAMP_NTZ; compare against
    * an NTZ literal directly. (A TIMESTAMP literal also works — under
    * the UTC session Catalyst inverts the implicit column cast and
    * still pushes the fence to the scan, verified via explain — but
    * the NTZ form needs no such rewrite.) The oracle's TIMESTAMP
    * literals agree because the session TZ is UTC. */
  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3 shape: shipping-priority revenue of BUILDING-segment orders
    // not yet shipped at the pivot date; top 10 by revenue.
    "q65_shipping_priority" -> ((s, dir) => {
      val cust = Catalog.table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Catalog.table(s, dir, "orders")
        .filter(col("o_orderdate") < ts("1997-06-01"))
      val li = Catalog.table(s, dir, "lineitem")
        .filter(col("l_shipdate") > ts("1997-06-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(revenue)
        .select(col("l_orderkey"), col("revenue"),
          unix_micros(col("o_orderdate").cast("timestamp"))
            .as("o_orderdate_us"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q5 shape: revenue by nation where customer and supplier share
    // the nation, one region, two-year window.
    "q66_local_supplier_volume" -> ((s, dir) => {
      val ord = Catalog.table(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01"))
      val li = Catalog.table(s, dir, "lineitem")
      val cust = Catalog.table(s, dir, "customer")
      val supp = Catalog.table(s, dir, "supplier")
      val nat = Catalog.table(s, dir, "nation")
      val reg = Catalog.table(s, dir, "region")
        .filter(col("r_name") === "ASIA")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(revenue)
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q10 shape: customers ranked by revenue of their returned items.
    "q67_returned_items" -> ((s, dir) => {
      val li = Catalog.table(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
      val ord = Catalog.table(s, dir, "orders")
      val cust = Catalog.table(s, dir, "customer")
      val nat = Catalog.table(s, dir, "nation")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          col("n_name").as("nation"))
        .agg(revenue, count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    })
  )

  private val RevSql =
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) " +
      "AS DECIMAL(30,6))) AS DOUBLE)"

  val oracleSql: Map[String, String] = Map(
    "q65_shipping_priority" ->
      s"""SELECT l_orderkey, $RevSql AS revenue,
         |  epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING'
         |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1997-06-01'
         |  AND l_shipdate > TIMESTAMP '1997-06-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q66_local_supplier_volume" ->
      s"""SELECT n_name, $RevSql AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q67_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name AS nation, $RevSql AS revenue,
         |  COUNT(*) AS n_items
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  )
}
