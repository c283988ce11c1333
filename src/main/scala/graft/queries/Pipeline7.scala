package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Audit, Bfs, PrefixSum, Sessionize, SnapshotDiff}
import graft.sources.Catalog

/** Round-3 block (q89–q98): relational division, FILTER-style
  * conditional aggregation, correlated-subquery semantics, sweep-line
  * max concurrency (distributed prefix sum), one BPE merge step, PII
  * redaction, a bigram language model, a dbt-style constraint audit,
  * bounded-depth BFS reachability, and a lakehouse snapshot diff.
  *
  * Parity discipline unchanged: exact integers / decimal routing for
  * anything aggregated, fixed-point `div` for ratios, identical
  * regexes on both engines (patterns restricted to the RE2 ∩ java.util
  * .regex common subset — no lookaround, ASCII classes only), and a
  * deterministic total ORDER BY per query.
  */
object Pipeline7 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  private val GapMicros = 1800000000L // 30 min session gap
  private val DayUs = 86400000000L

  /** Divisor predicate for q89 (see oracle note there). */
  private val DivisorPred = "p_partkey % 999 = 0 AND p_partkey > 0"

  private val EmailRe = "user[0-9]+@example\\.com"
  private val PhoneRe = "555-[0-9]{4}"

  /** Co-trade edge threshold (shared customers) — q77's graph. */
  private val MinShared = 190

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational division — "suppliers that supply EVERY part in the
    // divisor set" — the one classic algebra operator SQL has no
    // keyword for. Scale shape: the divisor is tiny by construction
    // (a filtered dim) → broadcast semi-join restricts the fact scan
    // BEFORE the distinct; the count-match runs on |suppliers| rows;
    // the oracle proves this plan ≡ the double-NOT-EXISTS form.
    "q89_relational_division" -> ((s, dir) => {
      val divisor = t(s, dir, "part")
        .filter(expr(DivisorPred))
        .select(col("p_partkey"))
      val nParts = divisor.agg(count(lit(1)).as("n_parts"))
      val sp = t(s, dir, "lineitem")
        .join(broadcast(divisor), col("l_partkey") === col("p_partkey"))
        .select(col("l_suppkey"), col("l_partkey"))
        .distinct()
      sp.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_supplied"))
        .crossJoin(broadcast(nParts))
        .filter(col("n_supplied") === col("n_parts"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // Conditional aggregation family: FILTER-style counts, subset
    // sums, bool_and/bool_or, and a deterministic arg-max (max_by on
    // a composite cents·K + key argument so ties cannot occur).
    // One hash-agg shuffle; nation dim broadcast.
    "q90_conditional_agg" -> ((s, dir) => {
      val cents = col("c_acctbal").cast("decimal(18,2)")
        .multiply(lit(100)).cast("long")
      val argKey = cents * lit(1000000L) + col("c_custkey")
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_cust"),
          count(when(col("c_acctbal") < 0, 1)).as("n_neg"),
          sum(when(col("c_mktsegment") === "BUILDING",
            col("c_acctbal").cast("decimal(30,2)")))
            .cast("double").as("sum_building"),
          bool_or(col("c_acctbal") < 0).as("any_neg"),
          bool_and(col("c_acctbal") > -950).as("all_above"),
          max_by(col("c_custkey"), argKey).as("richest_custkey"))
        .orderBy(col("n_name"))
    }),

    // Correlated-subquery semantics: customers above their nation's
    // mean balance. Decision by exact decimal CROSS-MULTIPLY
    // (bal·n > Σbal) — no division, no rounding-mode dependence.
    // Spark plans the decorrelated form every engine rewrites to
    // (per-key aggregate + broadcast join); the oracle runs the
    // genuinely correlated subquery, pinning the equivalence.
    "q91_above_nation_avg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .withColumn("bal_dec", col("c_acctbal").cast("decimal(12,2)"))
      val stats = c.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("bal_dec")).as("sum_bal"))
      c.join(broadcast(stats), Seq("c_nationkey"))
        .filter(col("bal_dec") * col("n_cust").cast("decimal(8,0)")
          > col("sum_bal"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_acctbal"), col("n_name"))
        .orderBy(col("c_custkey"))
    }),

    // Sweep-line max concurrency: sessions → ±1 boundary deltas →
    // running sum over the time line → per-day peak. The running sum
    // is the distributed prefix-sum operator (range repartition +
    // offset fold), NOT a single-reducer global window — this is the
    // 100 TB shape for "peak concurrent X over time". Deltas are
    // netted per timestamp first, so the sweep order is unique and
    // the fold deterministic.
    "q92_max_concurrency" -> ((s, dir) => {
      val sess = Sessionize.sessions(t(s, dir, "events"), "user_id",
        "ts", GapMicros, tiebreak = col("event_id"),
        valueCol = col("value"))
      val deltas = sess.select(explode(array(
          struct(col("session_start_us").as("us"), lit(1L).as("delta")),
          struct((col("session_end_us") + lit(1L)).as("us"),
            lit(-1L).as("delta")))).as("d"))
        .select(col("d.us").as("us"), col("d.delta").as("delta"))
        .groupBy(col("us")).agg(sum(col("delta")).as("net"))
      PrefixSum.runningSum(deltas, Seq(col("us")), "net", "conc")
        .withColumn("day", expr(s"us div $DayUs"))
        .groupBy(col("day"))
        .agg(max(col("conc")).as("max_concurrency"),
          count(lit(1)).as("n_points"))
        .orderBy(col("day"))
    }),

    // One BPE merge step over the corpus: count adjacent token pairs,
    // pick the most frequent (the merge), apply it corpus-wide, and
    // re-count — the inner loop of byte-pair-encoding vocabulary
    // learning. Scale shape: pair extraction is a codegen'd
    // slice/transform (map-side); the only shuffles are the two pair
    // aggregations; the chosen merge is ONE driver row (the same
    // bounded sync point as a k-means centroid step — k merges cost k
    // passes, each this plan). Merge application is left-to-right
    // non-overlapping, exactly regexp_replace's global semantics on
    // both engines (\b is ASCII word boundary in RE2 and Java alike).
    "q93_bpe_merge_step" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      def pairsOf(df: DataFrame, textCol: String): DataFrame =
        df.select(TextFunctions.tokens(col(textCol)).as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(toks)-1)," +
              " i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val best = pairsOf(docs, "text")
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w1"), col("w2"))
        .limit(1).collect()(0)
      val (bw1, bw2) = (best.getString(0), best.getString(1))
      val merged = docs.select(col("doc_id"),
        regexp_replace(col("text"),
          lit(s"\\b$bw1 $bw2\\b"), lit(s"${bw1}_$bw2")).as("mtext"))
      pairsOf(merged, "mtext")
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w1"), col("w2"))
        .limit(20)
        .withColumn("merged_pair", lit(s"${bw1}_$bw2"))
        .orderBy(col("cnt").desc, col("w1"), col("w2"))
    }),

    // PII redaction: synthesize a deterministic contact string per
    // customer (the corpus has no PII — both engines build the SAME
    // text), scrub emails then phones, report per-nation redaction
    // counts and removed characters. Pure map-side except the final
    // small aggregation; the patterns live in the RE2 ∩ Java subset.
    "q94_pii_redaction" -> ((s, dir) => {
      val txt = concat(lit("contact "), col("c_name"), lit(" at user"),
        col("c_custkey").cast("string"), lit("@example.com or 555-"),
        lpad(expr("CAST(c_custkey % 10000 AS STRING)"), 4, "0"))
      val red = regexp_replace(
        regexp_replace(col("txt"), lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>"))
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .withColumn("txt", txt)
        .withColumn("red", red)
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(regexp_count(col("txt"), lit(EmailRe))).as("n_emails"),
          sum(regexp_count(col("txt"), lit(PhoneRe))).as("n_phones"),
          sum(length(col("txt")) - length(col("red")))
            .as("chars_removed"))
        .orderBy(col("n_name"))
    }),

    // Count-based bigram language model: P(w2 | w1) as fixed-point
    // integer probability, top-3 continuations per head word. The
    // (head) totals reuse the pair counts (one shuffle on the pair,
    // one on the head); the per-head top-k is a bounded window.
    "q95_bigram_lm" -> ((s, dir) => {
      val pairs = t(s, dir, "documents")
        .select(TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks)-1)," +
            " i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val cnt = pairs.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt"))
      val heads = cnt.groupBy(col("w1")).agg(sum(col("cnt")).as("total"))
      val w = Window.partitionBy(col("w1"))
        .orderBy(col("cnt").desc, col("w2").asc)
      cnt.join(heads, "w1")
        .withColumn("prob_fp", expr("(cnt * 1000000) div total"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("w1"), col("w2"), col("cnt"), col("total"),
          col("prob_fp"), col("rnk"))
        .orderBy(col("w1"), col("rnk"))
    }),

    // Declarative data-quality audit (dbt-test / Deequ shape): each
    // check is a violations relation — uniqueness via HAVING, FK via
    // LEFT ANTI, domain rules via scans — reported as one count row
    // per check. Every check stays a pushdown-friendly plan; the
    // audit output is O(#checks).
    "q96_constraint_audit" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val lineitem = t(s, dir, "lineitem")
      Audit.run(s, Seq(
        "customer_acctbal_negative" ->
          customer.filter(col("c_acctbal") < 0),
        "customer_pk_duplicate" ->
          Audit.duplicateKeys(customer, Seq("c_custkey")),
        "lineitem_orphan_order" ->
          Audit.orphans(lineitem, "l_orderkey", orders, "o_orderkey"),
        "lineitem_qty_out_of_range" ->
          lineitem.filter(col("l_quantity") < 1 || col("l_quantity") > 50),
        "orders_null_priority" ->
          orders.filter(col("o_orderpriority").isNull),
        "orders_totalprice_nonpositive" ->
          orders.filter(col("o_totalprice") <= 0)))
    }),

    // Bounded-depth BFS: 2-hop reachability counts per seed supplier
    // over the thresholded co-trade graph (q77's edges, both
    // directions). Relational Pregel — one frontier⋈edges join + one
    // min-fold per superstep; see operators/Bfs for the scale notes.
    "q97_khop_reach" -> ((s, dir) => {
      val pairs = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
      val a = pairs.toDF("ck", "sa")
      val b = pairs.toDF("ck", "sb")
      val e0 = a.join(b, "ck").filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= MinShared)
      val edges = e0.select(col("sa").as("src"), col("sb").as("dst"))
        .union(e0.select(col("sb").as("src"), col("sa").as("dst")))
      val seeds = t(s, dir, "supplier")
        .filter(col("s_nationkey") === 0).select(col("s_suppkey"))
      Bfs.reach(edges, seeds, "s_suppkey", hops = 2)
        .groupBy(col("seed"))
        .agg(count(when(col("hop") === 1, 1)).as("n_hop1"),
          count(when(col("hop") === 2, 1)).as("n_hop2"))
        .orderBy(col("seed"))
    }),

    // Lakehouse snapshot diff: old/new table versions derived from
    // orders by deterministic rules (deletes %97, updates %31, adds
    // %89 — disjoint enough to exercise all three classes), classified
    // in ONE full-outer key join with null-safe column compare. See
    // operators/SnapshotDiff for the churn-proportional argument.
    "q98_snapshot_diff" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_custkey"))
      val oldV = orders.filter(expr("o_orderkey % 89 <> 0"))
      val newV = orders.filter(expr("o_orderkey % 97 <> 0"))
        .withColumn("o_orderstatus",
          when(expr("o_orderkey % 31 = 0"), lit("X"))
            .otherwise(col("o_orderstatus")))
      SnapshotDiff.diff(oldV, newV, Seq("o_orderkey"),
          Seq("o_orderstatus", "o_totalprice", "o_custkey"))
        .orderBy(col("o_orderkey"))
    })
  )

  private val sqlToks =
    "list_filter(string_split(text, ' '), t_ -> t_ <> '')"

  /** Shared oracle CTE: adjacent token pairs of `documents.text`
    * (DuckDB zips equal-length unnests positionally). */
  private val sqlPairs =
    s"""d AS (SELECT $sqlToks AS toks FROM documents),
       |pairs AS (
       |  SELECT unnest(list_slice(toks, 1, len(toks)-1)) AS w1,
       |         unnest(list_slice(toks, 2, len(toks))) AS w2
       |  FROM d WHERE len(toks) >= 2)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // The classic double-NOT-EXISTS form (plus the non-empty guard
    // that makes it equal the count-match form when the divisor is
    // empty) — proves the broadcast count-match plan computes
    // division.
    "q89_relational_division" ->
      s"""SELECT s_suppkey, s_name FROM supplier s
         |WHERE NOT EXISTS (
         |    SELECT 1 FROM part p
         |    WHERE $DivisorPred
         |      AND NOT EXISTS (
         |        SELECT 1 FROM lineitem l
         |        WHERE l.l_suppkey = s.s_suppkey
         |          AND l.l_partkey = p.p_partkey))
         |  AND EXISTS (
         |    SELECT 1 FROM part p JOIN lineitem l
         |      ON l.l_partkey = p.p_partkey
         |    WHERE $DivisorPred AND l.l_suppkey = s.s_suppkey)
         |ORDER BY s_suppkey""".stripMargin,

    "q90_conditional_agg" ->
      """SELECT n_name,
        |  COUNT(*) AS n_cust,
        |  COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_neg,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2)))
        |    FILTER (WHERE c_mktsegment = 'BUILDING') AS DOUBLE)
        |    AS sum_building,
        |  bool_or(c_acctbal < 0) AS any_neg,
        |  bool_and(c_acctbal > -950) AS all_above,
        |  arg_max(c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * 1000000 + c_custkey) AS richest_custkey
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // Genuinely correlated scalar subqueries; decision by exact
    // decimal cross-multiply, same as the decorrelated Spark plan.
    "q91_above_nation_avg" ->
      """SELECT c.c_custkey, c.c_acctbal, n.n_name
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE CAST(c.c_acctbal AS DECIMAL(12,2))
        |    * (SELECT COUNT(*) FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |  > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(12,2)))
        |     FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)
        |ORDER BY c.c_custkey""".stripMargin,

    "q92_max_concurrency" ->
      s"""WITH s AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us,
         |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
         |         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > $GapMicros
         |      THEN 1 ELSE 0 END AS is_start
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |x AS (
         |  SELECT user_id,
         |    CAST(SUM(is_start) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS session_idx,
         |    us
         |  FROM s),
         |sess AS (
         |  SELECT MIN(us) AS s_us, MAX(us) AS e_us
         |  FROM x GROUP BY user_id, session_idx),
         |deltas AS (
         |  SELECT s_us AS us, 1 AS delta FROM sess
         |  UNION ALL SELECT e_us + 1, -1 FROM sess),
         |net AS (
         |  SELECT us, CAST(SUM(delta) AS BIGINT) AS net
         |  FROM deltas GROUP BY us),
         |r AS (
         |  SELECT us, CAST(SUM(net) OVER (ORDER BY us
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
         |  FROM net)
         |SELECT us // $DayUs AS day,
         |  MAX(conc) AS max_concurrency, COUNT(*) AS n_points
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q93_bpe_merge_step" ->
      s"""WITH $sqlPairs,
         |best AS (
         |  SELECT w1, w2 FROM (
         |    SELECT w1, w2, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2)
         |  ORDER BY cnt DESC, w1, w2 LIMIT 1),
         |m AS (
         |  SELECT regexp_replace(text,
         |      '\\b' || w1 || ' ' || w2 || '\\b',
         |      w1 || '_' || w2, 'g') AS mtext
         |  FROM documents, best),
         |md AS (SELECT list_filter(string_split(mtext, ' '),
         |    t_ -> t_ <> '') AS toks FROM m),
         |mpairs AS (
         |  SELECT unnest(list_slice(toks, 1, len(toks)-1)) AS w1,
         |         unnest(list_slice(toks, 2, len(toks))) AS w2
         |  FROM md WHERE len(toks) >= 2)
         |SELECT w1, w2, COUNT(*) AS cnt,
         |  (SELECT w1 || '_' || w2 FROM best) AS merged_pair
         |FROM mpairs GROUP BY 1, 2
         |ORDER BY cnt DESC, w1, w2 LIMIT 20""".stripMargin,

    "q94_pii_redaction" ->
      s"""WITH d AS (
         |  SELECT n_name,
         |    'contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
         |      || '@example.com or 555-'
         |      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS txt
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
         |r AS (
         |  SELECT n_name, txt,
         |    regexp_replace(regexp_replace(txt,
         |      '$EmailRe', '<EMAIL>', 'g'),
         |      '$PhoneRe', '<PHONE>', 'g') AS red
         |  FROM d)
         |SELECT n_name, COUNT(*) AS n_docs,
         |  CAST(SUM(len(regexp_extract_all(txt, '$EmailRe'))) AS BIGINT)
         |    AS n_emails,
         |  CAST(SUM(len(regexp_extract_all(txt, '$PhoneRe'))) AS BIGINT)
         |    AS n_phones,
         |  CAST(SUM(len(txt) - len(red)) AS BIGINT) AS chars_removed
         |FROM r GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q95_bigram_lm" ->
      s"""WITH $sqlPairs,
         |cnt AS (
         |  SELECT w1, w2, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2),
         |heads AS (
         |  SELECT w1, CAST(SUM(cnt) AS BIGINT) AS total
         |  FROM cnt GROUP BY 1),
         |scored AS (
         |  SELECT cnt.w1, cnt.w2, cnt.cnt, heads.total,
         |    (cnt.cnt * 1000000) // heads.total AS prob_fp,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY cnt.w1
         |      ORDER BY cnt.cnt DESC, cnt.w2 ASC) AS INT) AS rnk
         |  FROM cnt JOIN heads USING (w1))
         |SELECT w1, w2, cnt, total, prob_fp, rnk
         |FROM scored WHERE rnk <= 3
         |ORDER BY w1, rnk""".stripMargin,

    "q96_constraint_audit" ->
      """SELECT check_name, n_violations FROM (
        |  SELECT 'customer_acctbal_negative' AS check_name,
        |    (SELECT COUNT(*) FROM customer WHERE c_acctbal < 0)
        |      AS n_violations
        |  UNION ALL SELECT 'customer_pk_duplicate',
        |    (SELECT COUNT(*) FROM (
        |       SELECT c_custkey FROM customer
        |       GROUP BY 1 HAVING COUNT(*) > 1))
        |  UNION ALL SELECT 'lineitem_orphan_order',
        |    (SELECT COUNT(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |       WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL SELECT 'lineitem_qty_out_of_range',
        |    (SELECT COUNT(*) FROM lineitem
        |     WHERE l_quantity < 1 OR l_quantity > 50)
        |  UNION ALL SELECT 'orders_null_priority',
        |    (SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL)
        |  UNION ALL SELECT 'orders_totalprice_nonpositive',
        |    (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0))
        |ORDER BY check_name""".stripMargin,

    // Unrolled 2-superstep BFS with the min-hop exclusion made
    // explicit (hop-2 nodes must not be hop-1 nodes or the seed).
    // The multiply-referenced CTEs carry MATERIALIZED hints: DuckDB
    // otherwise inlines them per reference, and the pairs self-join
    // behind e0 is re-evaluated for every one of its ~6 transitive
    // uses CONCURRENTLY — at x10 those parallel evaluations spilled
    // >75 GB and filled the disk. Compute-once is the same contract
    // Spark gets from the BFS operator's localCheckpoint cadence.
    "q97_khop_reach" ->
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e0 AS MATERIALIZED (
         |  SELECT a.sk AS sa, b.sk AS sb
         |  FROM pairs a JOIN pairs b ON a.ck = b.ck AND a.sk < b.sk
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinShared),
         |e AS MATERIALIZED (SELECT sa AS src, sb AS dst FROM e0
         |      UNION ALL SELECT sb, sa FROM e0),
         |seeds AS (SELECT s_suppkey AS seed FROM supplier
         |          WHERE s_nationkey = 0),
         |h1 AS MATERIALIZED (SELECT DISTINCT seed, dst AS node
         |       FROM seeds JOIN e ON seed = src),
         |h2 AS (SELECT DISTINCT h1.seed, e.dst AS node
         |       FROM h1 JOIN e ON h1.node = e.src
         |       WHERE e.dst <> h1.seed
         |         AND NOT EXISTS (SELECT 1 FROM h1 i
         |           WHERE i.seed = h1.seed AND i.node = e.dst)),
         |r AS (SELECT seed, node, 1 AS hop FROM h1
         |      UNION ALL SELECT seed, node, 2 FROM h2)
         |SELECT seed,
         |  COUNT(CASE WHEN hop = 1 THEN 1 END) AS n_hop1,
         |  COUNT(CASE WHEN hop = 2 THEN 1 END) AS n_hop2
         |FROM r GROUP BY seed ORDER BY seed""".stripMargin,

    "q98_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_custkey
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |n AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 31 = 0 THEN 'X'
        |      ELSE o_orderstatus END AS o_orderstatus,
        |    o_totalprice, o_custkey
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |j AS (
        |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    o.o_orderkey IS NOT NULL AS in_old,
        |    n.o_orderkey IS NOT NULL AS in_new,
        |    concat_ws(',',
        |      CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
        |        THEN 'o_custkey' END,
        |      CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |        THEN 'o_orderstatus' END,
        |      CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |        THEN 'o_totalprice' END) AS diffs
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN in_old AND NOT in_new THEN 'removed'
        |       WHEN in_new AND NOT in_old THEN 'added'
        |       ELSE 'changed' END AS change_type,
        |  CASE WHEN in_old AND in_new THEN diffs ELSE '' END
        |    AS changed_cols
        |FROM j
        |WHERE NOT (in_old AND in_new) OR diffs <> ''
        |ORDER BY o_orderkey""".stripMargin
  )
}
