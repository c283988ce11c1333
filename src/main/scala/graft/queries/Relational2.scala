package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** Second relational coverage batch (SURVEY §2.4 continued): RANGE
  * window frames, GROUPING SETS, pivot, scalar string functions,
  * multiset (ALL) set operations. Same oracle-parity discipline as
  * queries/Relational.scala. */
object Relational2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  private val Day30Us = 30L * 24 * 3600 * 1000000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RANGE frame (value-based, unlike q04's ROWS frame): orders per
    // customer within ±30 days of each order.
    "q31_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
        .rangeBetween(-Day30Us, Day30Us)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_nearby"))
        .orderBy(col("o_orderkey"))
    }),

    // Arbitrary GROUPING SETS (neither rollup nor cube) via the SQL
    // entry point over the registered catalog.
    "q32_grouping_sets" -> ((s, dir) => {
      Catalog.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag, l_linestatus, grouping_id() AS gid,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY gid, l_returnflag ASC NULLS FIRST,
          |  l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // Pivot: event counts per user across the five event types.
    "q33_pivot_events" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))),

    // Scalar string-function pack over documents metadata.
    "q34_string_funcs" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        upper(col("source")).as("up_source"),
        substring(col("text"), 1, 12).as("text_prefix"),
        lpad(col("source"), 8, "0").as("padded"),
        levenshtein(col("lang"), lit("en")).as("lev_en"),
        regexp_replace(col("source"), "src", "s#").as("renamed"),
        length(col("text")).cast("bigint").as("text_len"))
        .orderBy(col("doc_id"))),

    // Unpivot/melt: wide moment columns back to (metric, value) rows.
    "q40_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("decimal(30,6)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(30,6)")).cast("double")
            .as("sum_price"),
          sum(col("l_discount").cast("decimal(30,6)")).cast("double")
            .as("sum_disc"))
      wide.unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        variableColumnName = "metric", valueColumnName = "value")
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // Array function pack: sort/distinct/slice/contains over the token
    // arrays (the corpus-side array surface in one scan).
    "q41_array_ops" -> ((s, dir) => {
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        array_join(slice(array_sort(array_distinct(toks)), 1, 5), ",")
          .as("first5_sorted_uniq"),
        size(array_distinct(toks)).cast("bigint").as("n_uniq"),
        array_contains(toks, "spark").as("has_spark"),
        element_at(toks, 1).as("first_token"),
        element_at(toks, -1).as("last_token"))
        .orderBy(col("doc_id"))
    }),

    // Multiset set ops: EXCEPT ALL / INTERSECT ALL preserve
    // multiplicities (the DISTINCT forms are q07).
    "q35_set_ops_all" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      def active(lo: String, hi: String) = orders
        .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
          col("o_orderdate") < lit(hi).cast("timestamp"))
        .select(col("o_custkey"))
      val a = active("1996-01-01", "1997-01-01")
      val b = active("1997-01-01", "1998-01-01")
      a.exceptAll(b).withColumn("tag", lit("except_all"))
        .unionAll(a.intersectAll(b).withColumn("tag", lit("intersect_all")))
        .orderBy(col("tag"), col("o_custkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q31_range_frame" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(COUNT(*) OVER (PARTITION BY o_custkey
         |    ORDER BY epoch_us(o_orderdate)
         |    RANGE BETWEEN $Day30Us PRECEDING AND $Day30Us FOLLOWING)
         |    AS BIGINT) AS n_nearby
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q32_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag, l_linestatus) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q33_pivot_events" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q34_string_funcs" ->
      """SELECT doc_id,
        |  upper(source) AS up_source,
        |  substring(text, 1, 12) AS text_prefix,
        |  lpad(source, 8, '0') AS padded,
        |  CAST(levenshtein(lang, 'en') AS INT) AS lev_en,
        |  regexp_replace(source, 'src', 's#') AS renamed,
        |  CAST(length(text) AS BIGINT) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q40_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price', sum_price FROM w
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_disc', sum_disc FROM w)
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q41_array_ops" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t_ -> t_ <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 5), ',')
        |    AS first5_sorted_uniq,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
        |  list_contains(toks, 'spark') AS has_spark,
        |  toks[1] AS first_token,
        |  toks[-1] AS last_token
        |FROM d ORDER BY doc_id""".stripMargin,

    "q35_set_ops_all" ->
      """WITH a AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |b AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_custkey, 'except_all' AS tag FROM (
        |  SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT o_custkey, 'intersect_all' AS tag FROM (
        |  SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
        |ORDER BY tag, o_custkey""".stripMargin
  )
}
