package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Catalog

/** Round-3 block (q81–q88): BM25 retrieval scoring, blocked fuzzy
  * record linkage, Pareto skyline, time-grid linear interpolation,
  * prefix-filtered set-similarity join, equi-width histograms, column
  * profiling, and full-outer reconciliation — warehouse/curation
  * shapes the earlier blocks don't cover.
  *
  * Parity discipline (q47's rule): no transcendental calls in anything
  * hash-compared — BM25's idf/saturation is re-derived as engine-defined
  * fixed-point integer arithmetic (`div` ≡ DuckDB `//` on positive
  * longs); interpolation stays in IEEE double with the identical
  * expression tree on both engines (`+ * /` are correctly rounded, so
  * bit-equality holds); edit distance is exact integers.
  */
object Pipeline6 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  /** Fixed-point scale for BM25 (10^5). Long-bound note: terms of the
    * score product are ≤ S²·n_docs·dl — safe through ~10^7 docs; a
    * 100 TB corpus would move `S` down or the product to DECIMAL(38). */
  private val S = 100000L
  private val B = 75000L // 0.75 · S
  private val K1 = 120000L // 1.2 · S
  private val QueryTerms = Seq("window", "hash", "stream")

  private val DayUs = 86400000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BM25 top-k retrieval for a fixed query-term set. Scale shape:
    // the tokenizer explode is map-side; tf filters to the query terms
    // BEFORE the (doc,term) aggregation so the shuffled relation is
    // |matching docs|·|query terms|, not the full posting list; dl is
    // one parallel count per doc; corpus stats and per-term df are
    // single-row/3-row broadcasts; top-k is TakeOrdered (no global
    // sort materialization).
    "q81_bm25_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_tokens"))
      val tf = tok.filter(col("term").isin(QueryTerms: _*))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("idf_fp",
          expr(s"($S * (n_docs - df + 1)) div (df + 1)"))
        .withColumn("dlr_fp",
          expr(s"($S * dl * n_docs) div total_tokens"))
        .withColumn("norm_fp",
          expr(s"${S - B} + (($B * dlr_fp) div $S)"))
        .withColumn("k_fp", expr(s"($K1 * norm_fp) div $S"))
        .withColumn("score_term_fp",
          expr(s"(idf_fp * tf * ${K1 + S}) div (tf * $S + k_fp)"))
      scored.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("score_term_fp")).as("score_fp"))
        .orderBy(col("score_fp").desc, col("doc_id"))
        .limit(20)
        .orderBy(col("score_fp").desc, col("doc_id"))
    }),

    // Blocked fuzzy record linkage: candidate pairs share a blocking
    // key (nation — the classic attribute block), verified by exact
    // Levenshtein ≤ 2. Scale shape: the pair space is n²/|blocks|, not
    // n² — block-key choice bounds the quadratic term, and a skewed
    // block would take the salted-join path (RangeJoin.saltedJoin).
    // Positional-segment pigeonhole banding (the sound sub-quadratic
    // candidate scheme for edit distance) is the q43 simhash family;
    // this query pins the verify-side semantics.
    "q82_fuzzy_linkage" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey").as("nat"))
      // blocked in-memory comparator kernel (operators/EditJoin):
      // prefix/suffix-stripped banded levenshtein inside each nation
      // block — the relational block-join + levenshtein(a,b,2) twin
      // shuffles every candidate pair (measured 7× slower; law-pinned
      // equal in Pipeline8Spec)
      graft.operators.EditJoin.blockedSelfJoin(
          c, "nat", "c_custkey", col("c_name"), maxDist = 2)
        // kernel widens the block key to long; restore the source type
        .withColumn("nat", col("nat").cast("int"))
        .orderBy(col("k1"), col("k2"))
    }),

    // Pareto skyline of part on (p_size asc, p_retailprice asc):
    // sort-free frontier via per-x minimums — see operators/Skyline
    // for the scale argument (one parallel groupBy + tiny broadcast
    // vs the oracle's O(n²) NOT EXISTS).
    "q83_skyline" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      graft.operators.Skyline.frontier2d(p, "p_size", "p_retailprice")
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),

    // Daily time-grid linear interpolation per user: exact decimal
    // day sums, then each absent grid day gets
    //   pv + (nv - pv) * (day - pd) / (nd - pd)
    // between its bracketing present days. Scale shape: the grid
    // explode is linear in output; both IGNORE NULLS gap windows share
    // one (user_id, day) shuffle; no collect, no global sort until
    // the final presentation ORDER BY.
    "q84_interpolate_daily" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("user_id"),
          expr(s"unix_micros(ts) div $DayUs").as("day"), col("value"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("value").cast("decimal(30,6)")).cast("double")
          .as("v"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val wUpTo = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wFrom = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(0, Window.unboundedFollowing)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wUpTo))
        .withColumn("pd", last(when(col("v").isNotNull, col("day")),
          ignoreNulls = true).over(wUpTo))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wFrom))
        .withColumn("nd", first(when(col("v").isNotNull, col("day")),
          ignoreNulls = true).over(wFrom))
        .withColumn("value_interp", when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") +
            (col("nv") - col("pv")) * (col("day") - col("pd")) /
              (col("nd") - col("pd"))))
        .withColumn("is_interp", col("v").isNull)
        .select(col("user_id"), col("day"), col("value_interp"),
          col("is_interp"))
        .orderBy(col("user_id"), col("day"))
    }),

    // Exact set-similarity join (PPJoin-family prefix filter + exact
    // verify) over supplier part-sets: all supplier pairs with
    // Jaccard ≥ 1/8. The oracle runs the naive inverted-index join
    // over ALL tokens; the operator joins on rarest-first prefixes
    // only — identical output, sub-quadratic candidates (see
    // operators/SetSimJoin for the theorem and scale shape).
    "q85_setsim_suppliers" -> ((s, dir) => {
      val sets = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("supp"), col("l_partkey").as("part"))
      graft.operators.SetSimJoin.jaccardJoin(sets, "supp", "part", 1, 8)
        .orderBy(col("k1"), col("k2"))
    }),

    // Per-type equi-width histogram (10 bins over the observed
    // [min, max]): one broadcast of per-type extents + one aggregation
    // — two parallel shuffles on event_type, no sort of the raw data.
    // Bin arithmetic is the identical IEEE double expression in both
    // engines; bin ids are exact longs.
    "q86_value_histogram" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"), col("value"))
      val mm = e.groupBy(col("event_type"))
        .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      e.join(broadcast(mm), "event_type")
        .withColumn("bin",
          when(col("vmax") === col("vmin"), lit(0L))
            .otherwise(least(lit(9L), floor(
              (col("value") - col("vmin")) * lit(10) /
                (col("vmax") - col("vmin"))))))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(30,6)")).cast("double")
            .as("sum_value"))
        .orderBy(col("event_type"), col("bin"))
    }),

    // Column profiling (data-quality surface): row/null/distinct
    // counts and min/max per profiled column. One per-column TWO-LEVEL
    // aggregate (partial hash-agg on the value, then a scalar fold),
    // unioned — NOT 4 countDistinct in one aggregate, which compiles
    // to an Expand ×4 (every input row quadrupled before the distinct,
    // a 4× scan-width amplification). Here each branch scans parquet
    // pruned to its single column, map-side combines, and only the
    // distinct values shuffle. Numeric columns min/max numerically
    // then format; string columns compare lexicographically (binary
    // collation in both engines).
    "q87_column_profile" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def profile(name: String, v: Column, fmt: Column => Column) =
        o.select(v.as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
          .agg(
            // coalesce: zero groups (empty input) must profile as 0
            // rows, matching the count(*) contract, not NULL
            coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
            coalesce(sum(when(col("v").isNotNull, col("cnt"))), lit(0L))
              .as("n_notnull"),
            count(col("v")).as("n_distinct"),
            fmt(min(col("v"))).as("min_str"),
            fmt(max(col("v"))).as("max_str"))
          .select(lit(name).as("col_name"), col("n_rows"),
            col("n_notnull"), col("n_distinct"), col("min_str"),
            col("max_str"))
      profile("o_orderstatus", col("o_orderstatus"), _.cast("string"))
        .unionAll(profile("o_orderpriority", col("o_orderpriority"),
          _.cast("string")))
        .unionAll(profile("o_custkey", col("o_custkey"), _.cast("string")))
        .unionAll(profile("o_totalprice", col("o_totalprice"),
          _.cast("decimal(18,2)").cast("string")))
        .orderBy(col("col_name"))
    }),

    // Ledger reconciliation via FULL OUTER equi-join (the one join
    // type no earlier query exercises): BUILDING-segment customers vs
    // per-customer order aggregates — emits matched rows, ledger-only
    // customers (no orders), and orders-only customers (other
    // segments). Scale shape: pre-aggregated right side, one
    // sort-merge full-outer on custkey, exact decimal totals.
    "q88_full_outer_reconcile" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_acctbal"))
      val o = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(30,6)")).cast("double")
            .as("order_total"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_custkey").isNotNull.as("in_ledger"),
          col("o_custkey").isNotNull.as("has_orders"),
          col("c_acctbal"), col("n_orders"), col("order_total"))
        .orderBy(col("custkey"))
    })
  )

  private val sqlToks =
    "list_filter(string_split(text, ' '), t_ -> t_ <> '')"

  val oracleSql: Map[String, String] = Map(
    "q81_bm25_topk" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($sqlToks) AS term FROM documents),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
         |stats AS (SELECT COUNT(*) AS n_docs,
         |  CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
         |tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
         |  WHERE term IN ('window', 'hash', 'stream') GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT tf.doc_id, tf.tf,
         |    ($S * (stats.n_docs - dfreq.df + 1)) // (dfreq.df + 1)
         |      AS idf_fp,
         |    ${S - B} + (($B * (($S * dl.dl * stats.n_docs)
         |      // stats.total_tokens)) // $S) AS norm_fp
         |  FROM tf
         |  JOIN dfreq USING (term)
         |  JOIN dl USING (doc_id)
         |  CROSS JOIN stats),
         |terms AS (
         |  SELECT doc_id,
         |    (idf_fp * tf * ${K1 + S})
         |      // (tf * $S + (($K1 * norm_fp) // $S)) AS score_term_fp
         |  FROM scored)
         |SELECT doc_id, COUNT(*) AS n_terms,
         |  CAST(SUM(score_term_fp) AS BIGINT) AS score_fp
         |FROM terms GROUP BY doc_id
         |ORDER BY score_fp DESC, doc_id
         |LIMIT 20""".stripMargin,

    "q82_fuzzy_linkage" ->
      """SELECT a.c_nationkey AS nat, a.c_custkey AS k1,
        |  b.c_custkey AS k2,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a
        |JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY k1, k2""".stripMargin,

    "q83_skyline" ->
      """SELECT p_partkey, p_size, p_retailprice FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_size <= p.p_size
        |    AND q.p_retailprice <= p.p_retailprice
        |    AND (q.p_size < p.p_size
        |      OR q.p_retailprice < p.p_retailprice))
        |ORDER BY p_partkey""".stripMargin,

    "q84_interpolate_daily" ->
      s"""WITH daily AS (
         |  SELECT user_id, epoch_us(ts) // $DayUs AS day,
         |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
         |  FROM events GROUP BY 1, 2),
         |span AS (
         |  SELECT user_id, min(day) AS d0, max(day) AS d1
         |  FROM daily GROUP BY 1),
         |grid AS (
         |  SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM span),
         |j AS (
         |  SELECT g.user_id, g.day, daily.v
         |  FROM grid g
         |  LEFT JOIN daily
         |    ON g.user_id = daily.user_id AND g.day = daily.day),
         |x AS (
         |  SELECT user_id, day, v,
         |    last_value(v IGNORE NULLS) OVER wu AS pv,
         |    last_value(CASE WHEN v IS NOT NULL THEN day END
         |      IGNORE NULLS) OVER wu AS pd,
         |    first_value(v IGNORE NULLS) OVER wf AS nv,
         |    first_value(CASE WHEN v IS NOT NULL THEN day END
         |      IGNORE NULLS) OVER wf AS nd
         |  FROM j
         |  WINDOW wu AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wf AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, day,
         |  CASE WHEN v IS NOT NULL THEN v
         |       ELSE pv + (nv - pv) * (day - pd) / (nd - pd) END
         |    AS value_interp,
         |  v IS NULL AS is_interp
         |FROM x ORDER BY user_id, day""".stripMargin,

    "q85_setsim_suppliers" ->
      """WITH s AS (
        |  SELECT DISTINCT l_suppkey AS k, l_partkey AS tok
        |  FROM lineitem),
        |sz AS (SELECT k, COUNT(*) AS n FROM s GROUP BY 1),
        |i AS (
        |  SELECT a.k AS k1, b.k AS k2, COUNT(*) AS inter
        |  FROM s a JOIN s b ON a.tok = b.tok AND a.k < b.k
        |  GROUP BY 1, 2)
        |SELECT i.k1, i.k2, i.inter, x.n AS n1, y.n AS n2,
        |  CAST(i.inter AS DOUBLE) / (x.n + y.n - i.inter) AS jaccard
        |FROM i
        |JOIN sz x ON i.k1 = x.k
        |JOIN sz y ON i.k2 = y.k
        |WHERE 8 * i.inter >= 1 * (x.n + y.n - i.inter)
        |ORDER BY k1, k2""".stripMargin,

    "q86_value_histogram" ->
      """WITH mm AS (
        |  SELECT event_type, min(value) AS vmin, max(value) AS vmax
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT e.event_type, e.value,
        |    CASE WHEN mm.vmax = mm.vmin THEN 0
        |         ELSE least(9, CAST(floor(
        |           (e.value - mm.vmin) * 10 / (mm.vmax - mm.vmin))
        |           AS BIGINT)) END AS bin
        |  FROM events e JOIN mm USING (event_type))
        |SELECT event_type, bin, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM b GROUP BY event_type, bin
        |ORDER BY event_type, bin""".stripMargin,

    "q87_column_profile" ->
      """WITH a AS (
        |  SELECT COUNT(*) AS n_rows,
        |    COUNT(o_orderstatus) AS nn1,
        |    COUNT(DISTINCT o_orderstatus) AS nd1,
        |    min(CAST(o_orderstatus AS VARCHAR)) AS mn1,
        |    max(CAST(o_orderstatus AS VARCHAR)) AS mx1,
        |    COUNT(o_orderpriority) AS nn2,
        |    COUNT(DISTINCT o_orderpriority) AS nd2,
        |    min(CAST(o_orderpriority AS VARCHAR)) AS mn2,
        |    max(CAST(o_orderpriority AS VARCHAR)) AS mx2,
        |    COUNT(o_custkey) AS nn3,
        |    COUNT(DISTINCT o_custkey) AS nd3,
        |    CAST(min(o_custkey) AS VARCHAR) AS mn3,
        |    CAST(max(o_custkey) AS VARCHAR) AS mx3,
        |    COUNT(o_totalprice) AS nn4,
        |    COUNT(DISTINCT o_totalprice) AS nd4,
        |    CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
        |      AS mn4,
        |    CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
        |      AS mx4
        |  FROM orders)
        |SELECT u.col_name, a.n_rows, u.n_notnull, u.n_distinct,
        |  u.min_str, u.max_str
        |FROM a, LATERAL (
        |  SELECT 'o_orderstatus' AS col_name, nn1 AS n_notnull,
        |    nd1 AS n_distinct, mn1 AS min_str, mx1 AS max_str
        |  UNION ALL SELECT 'o_orderpriority', nn2, nd2, mn2, mx2
        |  UNION ALL SELECT 'o_custkey', nn3, nd3, mn3, mx3
        |  UNION ALL SELECT 'o_totalprice', nn4, nd4, mn4, mx4) u
        |ORDER BY u.col_name""".stripMargin,

    "q88_full_outer_reconcile" ->
      """WITH c AS (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_mktsegment = 'BUILDING'),
        |o AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
        |      AS order_total
        |  FROM orders GROUP BY 1)
        |SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
        |  c.c_custkey IS NOT NULL AS in_ledger,
        |  o.o_custkey IS NOT NULL AS has_orders,
        |  c.c_acctbal, o.n_orders, o.order_total
        |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin
  )
}
