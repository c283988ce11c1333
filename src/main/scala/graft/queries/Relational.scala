package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Dedup}
import graft.sources.Catalog

/** SURVEY §2.4 gap-table coverage: the standard relational categories
  * the reference never exercises (its only analytic is ROW_NUMBER, R5)
  * but the engine must provide as first-class, oracle-checked surface.
  *
  * Output discipline (shared with SparkEntry): every computed column
  * aliased identically in Spark and oracle SQL; double aggregations
  * routed through DecimalType for order-independent exactness; every
  * query ends in a deterministic total ORDER BY. Sorts avoid NULLable
  * keys except where pinned NULLS FIRST on both sides (Spark's asc
  * default; explicit in DuckDB).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  private def dsum(c: Column, scale: Int = 6) =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 windows beyond ROW_NUMBER: rank (with real tie semantics),
    // lag/lead, and a running-sum frame — one shuffle per window key.
    "q04_window_rank_lag_frames" -> ((s, dir) => {
      val seq = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").cast("decimal(18,2)").desc)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(seq).as("rn"),
        rank().over(byPrice).as("price_rank"),
        lag(col("o_totalprice"), 1).over(seq).as("prev_price"),
        // epoch micros, not raw timestamps: exact BIGINT on both engines
        // (timestamp parquet logical types differ duck↔spark in pandas)
        unix_micros(lead(col("o_orderdate"), 1).over(seq).cast("timestamp"))
          .as("next_order_us"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(seq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("run_spend"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.4 aggregations: ROLLUP + grouping_id over lineitem.
    "q05_rollup_grouping" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().as("gid"),
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // §2.4 aggregations: CUBE over orders (priority × year bucket).
    "q06_cube_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("order_year", year(col("o_orderdate")))
        .cube(col("o_orderpriority"), col("order_year"))
        .agg(
          grouping_id().as("gid"),
          count(lit(1)).as("n"),
          dsum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
          col("order_year").asc_nulls_first)),

    // §2.4 set ops: EXCEPT + INTERSECT (both DISTINCT forms) on the
    // customer sets active in 1996 vs 1997.
    "q07_set_ops" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      def active(lo: String, hi: String) = orders
        .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
          col("o_orderdate") < lit(hi).cast("timestamp"))
        .select(col("o_custkey"))
      val a = active("1996-01-01", "1997-01-01")
      val b = active("1997-01-01", "1998-01-01")
      a.except(b).withColumn("tag", lit("only_1996"))
        .unionAll(a.intersect(b).withColumn("tag", lit("both_years")))
        .orderBy(col("tag"), col("o_custkey"))
    }),

    // §2.4 join types: LEFT SEMI (orders with a >45-qty item) and
    // LEFT ANTI (parts never ordered) — no fan-out, key-only shuffle.
    "q08_semi_anti_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val semi = t(s, dir, "orders")
        .join(li.filter(col("l_quantity") > 45), // sf-independent fence
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey").as("key"))
        .withColumn("tag", lit("has_big_item"))
      val anti = t(s, dir, "part")
        .join(li, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey").as("key"))
        .withColumn("tag", lit("never_ordered"))
      semi.unionAll(anti).orderBy(col("tag"), col("key"))
    }),

    // §2.4 limits/top-k: top-3 orders per customer (R5 generalized).
    "q09_topk_per_group" -> ((s, dir) =>
      Dedup.topKPerGroup(
        t(s, dir, "orders"),
        partition = Seq(col("o_custkey")),
        order = Seq(col("o_totalprice").cast("decimal(18,2)").desc,
          col("o_orderkey").asc),
        k = 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc,
          col("o_orderkey"))),

    // §2.4 as-of join (union-window implementation, one shuffle): each
    // event matched to the user's latest signup at-or-before it.
    "q10_asof_join_events" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val signups = events.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"),
          col("event_id").as("signup_id"), col("value").as("signup_value"))
      AsofJoin.backward(
        events.select("event_id", "user_id", "ts", "event_type"),
        signups, key = Seq("user_id"), on = "ts",
        payload = Seq("signup_id", "signup_value"),
        rightTiebreak = Some(col("signup_id")))
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .orderBy(col("event_id"))
    }),

    // §2.4 JSON: parse the events.props JSON payload, aggregate on the
    // extracted field (from_json → codegen'd JsonToStructs, no UDF).
    "q11_json_extract_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("k", from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("bigint"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"),
          dsum(col("value"), 2).as("sum_value"))
        .orderBy(col("event_type"))),

    // §2.4 arrays: split → explode → re-aggregate (token frequencies
    // over the documents corpus; generative path for text pipelines).
    "q12_explode_token_freq" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("token"))),

    // §2.4 range join (bucketed — hash join with ≤2× replication, no
    // cross product): events followed by ≥1 same-user event within 5
    // minutes, with the follower count.
    "q24_range_join_followers" -> ((s, dir) => {
      val ev = t(s, dir, "events").select("event_id", "user_id", "ts")
      val counts = graft.operators.RangeJoin
        .within(ev, ev, Seq("user_id"), "ts", 5L * 60 * 1000000)
        .filter(col("r_event_id") =!= col("event_id"))
        .groupBy(col("event_id")).agg(count(lit(1)).as("cnt"))
      ev.join(counts, Seq("event_id"), "left")
        .select(col("event_id"),
          coalesce(col("cnt"), lit(0L)).as("n_within"))
        .orderBy(col("event_id"))
    }),

    // Streaming-shaped batch: tumbling 1-hour windows over events —
    // the exact aggregation Streaming.scala runs incrementally; here
    // executed batch-side so the oracle can check it.
    "q13_tumbling_window_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start_us"), col("event_type")))
  )

  val oracleSql: Map[String, String] = Map(
    "q04_window_rank_lag_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER seq AS INT) AS rn,
        |  CAST(RANK() OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC) AS INT) AS price_rank,
        |  LAG(o_totalprice, 1) OVER seq AS prev_price,
        |  epoch_us(LEAD(o_orderdate, 1) OVER seq) AS next_order_us,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS run_spend
        |FROM orders
        |WINDOW seq AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,

    "q05_rollup_grouping" ->
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag, l_linestatus) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q06_cube_orders" ->
      """SELECT o_orderpriority, order_year,
        |  GROUPING(o_orderpriority, order_year) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        |FROM (SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS order_year,
        |        o_totalprice FROM orders)
        |GROUP BY CUBE(o_orderpriority, order_year)
        |ORDER BY gid, o_orderpriority ASC NULLS FIRST,
        |  order_year ASC NULLS FIRST""".stripMargin,

    "q07_set_ops" ->
      """WITH a AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |b AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_custkey, 'only_1996' AS tag FROM (
        |  SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT o_custkey, 'both_years' AS tag FROM (
        |  SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        |ORDER BY tag, o_custkey""".stripMargin,

    "q08_semi_anti_join" ->
      """SELECT o_orderkey AS key, 'has_big_item' AS tag FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |UNION ALL
        |SELECT p_partkey AS key, 'never_ordered' AS tag FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY tag, key""".stripMargin,

    "q09_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
        |  ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey ASC) <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q10_asof_join_events" ->
      """WITH signups AS (
        |  SELECT user_id, ts, event_id AS signup_id, value AS signup_value
        |  FROM events WHERE event_type = 'signup'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.event_type,
        |  s.signup_id AS asof_signup_id, s.signup_value AS asof_signup_value
        |FROM events e ASOF LEFT JOIN signups s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.event_id""".stripMargin,

    "q11_json_extract_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(props->>'k' AS BIGINT)) AS max_k,
        |  CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q12_explode_token_freq" ->
      """SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY token""".stripMargin,

    "q24_range_join_followers" ->
      """SELECT e.event_id, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS n_within
        |FROM events e LEFT JOIN (
        |  SELECT a.event_id, COUNT(*) AS cnt
        |  FROM events a JOIN events b ON a.user_id = b.user_id
        |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |    AND b.event_id <> a.event_id
        |  GROUP BY a.event_id) c ON e.event_id = c.event_id
        |ORDER BY e.event_id""".stripMargin,

    "q13_tumbling_window_agg" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start_us, event_type""".stripMargin
  )
}
