package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.TextFunctions
import graft.operators.FuzzyDedup

/** Round-8 block: three corpus-curation capabilities the suite still
  * lacked, each a first-class training-data-pipeline operator.
  *
  *  - q141 duplicate-SPAN removal: q17/q19 drop whole near-duplicate
  *    documents; the finer-grained pass real pretraining pipelines run
  *    (Lee et al. 2022, "Deduplicating Training Data Makes Language
  *    Models Better") removes the duplicated SUBSTRING and keeps the
  *    rest of the document. Token-level here: every positional k-gram
  *    (k=8) occurring in ≥2 distinct docs marks its token span;
  *    overlapping/adjacent spans merge per doc (gaps-and-islands over
  *    a per-doc window); the output is the per-doc removal audit
  *    (span count, tokens removed, exact fixed-point fraction).
  *    Scale shape: the positional-gram kernel is map-side; the only
  *    wide shuffles are the gram-frequency count (swap the join key
  *    for xxhash64(gram) at 100 TB — same note as Decontaminate) and
  *    the per-doc window, which partitions by doc_id and is skew-free
  *    (marked spans per doc ≪ doc length).
  *
  *  - q142 count-min sketch: the point-frequency sibling of q125's
  *    HLL (cardinality) and q54's KLL (quantiles) — a fixed d×w
  *    integer grid estimating any item's count with one-sided error
  *    (est ≥ true, law-pinned in Pipeline12Spec). Cells are plain
  *    SUMs, so the sketch is mergeable across partitions/batches by
  *    addition — the property that makes it a streaming/100 TB
  *    structure (4×512 longs regardless of vocabulary). All hashing
  *    is the repo's portable polynomial hash composed with 4 affine
  *    maps mod 1e9+7 — pure BIGINT, bit-replayable by the oracle.
  *
  *  - q143 greedy max-coverage selection (facility-location greedy,
  *    k=5): the coreset/diversity selector — pick the document with
  *    the largest marginal distinct-BIGRAM coverage, fold its bigrams
  *    into the covered set, repeat. Classic (1−1/e) submodular
  *    greedy; the driver loop is k=5 bounded iterations, each a
  *    distributed anti-join + count — the one .collect() per
  *    iteration moves exactly one (doc_id, gain) row. The oracle
  *    unrolls the same 5 stages as CTEs, so both engines replay the
  *    identical deterministic tie-break (gain DESC, doc_id ASC).
  *
  *  - q144/q146/q147 native as-of join: the
  *    [[graft.plans.AsofJoinNative]] whole-operator path (custom
  *    LogicalPlan + SparkStrategy + SparkPlan via
  *    SparkSessionExtensions) over the same events shape as q10's
  *    composed union-window form — one exchange per side, O(1) merge
  *    state, oracle-checked against DuckDB's native ASOF LEFT JOIN.
  *    q146 adds the merge_asof tolerance (max-lookback) variant; q147
  *    the forward (earliest-at-or-after) direction; q148 the nearest
  *    direction; q149 the strict (allow_exact_matches=false) mode —
  *    the leakage-safe point-in-time join.
  *
  * Reference anchor: the reference's pipeline dedups rows only via
  * its T-SQL DISTINCT/ROW_NUMBER idioms (Select de Importação de
  * Dados.py:34-99); these are the corpus-grade generalizations.
  */
object Pipeline12 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Catalog.table(s, dir, name)

  /** q141 span k-gram length (same n-gram order as decontamination). */
  private[graft] val SpanK = 8

  /** Fixed-point scale for exact fractions (6 decimal digits). */
  private val Fp = 1000000L

  /** q142 CMS geometry: d=4 rows × w=512 buckets; row hashes are
    * affine maps of the portable polyhash, mod 1e9+7 then mod w. */
  private[queries] val CmsW = 512L
  private[queries] val CmsParams: Seq[(Long, Long)] =
    Seq((131L, 17L), (137L, 29L), (139L, 41L), (149L, 53L))

  /** The d CMS bucket expressions for a polyhash column. */
  private def cmsBuckets(ph: Column): Column = array(
    CmsParams.map { case (a, b) =>
      ((ph * a + b) % TextFunctions.HashMod) % CmsW
    }: _*)

  /** q142's sketch-cells relation (j, bucket, cell) built from exact
    * per-token counts — exposed for Pipeline12Spec's merge law. */
  private[graft] def cmsCells(toks: DataFrame): DataFrame = {
    val cnt = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("true_cnt"))
      .withColumn("ph", TextFunctions.polyHash(col("token")))
    cnt.select(col("true_cnt"),
        posexplode(cmsBuckets(col("ph"))).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("true_cnt")).as("cell"))
  }

  /** One token row per occurrence across the corpus. */
  private[graft] def corpusTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))

  /** q143's greedy loop, parameterized for the spec's laws.
    * Returns (pick_rank, doc_id, gain, covered_total) — k rows. */
  private[graft] def greedyCoverage(s: SparkSession, dir: String,
      k: Int): DataFrame = {
    // coverage unit = distinct word BIGRAM, not unigram: the testdata
    // vocabulary is ~31 words, so one doc would cover every unigram
    // and the greedy would degenerate to a single pick; bigrams give a
    // ~900-unit universe with ≤~100 per doc, so all k rounds select
    val sh = FuzzyDedup
      .shingles(t(s, dir, "documents"), "doc_id", col("text"), k = 2,
        cache = false)
      .withColumnRenamed("shingle", "token")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var covered: DataFrame = null
    var pickedIds = List.empty[Long]
    var rows = Vector.empty[Row]
    var cum = 0L
    // unpersist in finally: a mid-loop failure must not strand the
    // shingle relation in the block-manager for the session's lifetime
    try {
      for (r <- 1 to k) {
        val remaining =
          if (covered == null) sh
          else sh.join(covered, Seq("token"), "left_anti")
        val notPicked =
          if (pickedIds.isEmpty) remaining
          else remaining.filter(!col("doc_id").isin(pickedIds: _*))
        // exactly one row crosses to the driver per iteration
        val top = notPicked.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val (id, gain) = (top(0).getLong(0), top(0).getLong(1))
          cum += gain
          rows :+= Row(r.toLong, id, gain, cum)
          pickedIds ::= id
          val picked = sh.filter(col("doc_id") === id).select(col("token"))
          // localCheckpoint truncates the k-step lineage; the covered
          // relation is the union of ≤k docs' token sets — tiny
          covered = (if (covered == null) picked
            else covered.union(picked)).localCheckpoint(true)
        }
      }
    } finally sh.unpersist()
    s.createDataFrame(s.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("pick_rank", LongType, nullable = false),
        StructField("doc_id", LongType, nullable = false),
        StructField("gain", LongType, nullable = false),
        StructField("covered_total", LongType, nullable = false))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_dup_span_removal" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val occ = FuzzyDedup.positionalShingles(d, "doc_id", col("text"),
        k = SpanK)
      // grams occurring in ≥2 distinct docs: the cross-doc duplication
      // signal (within-doc repeats alone don't mark a span)
      val dup = occ.groupBy(col("shingle"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("shingle"))
      val m = occ.join(dup, Seq("shingle"))
        .select(col("doc_id"), col("pos").as("s_"),
          (col("pos") + (SpanK - 1)).as("e_"))
      // gaps-and-islands: a new island starts when this span begins
      // past the furthest end seen so far (+1 merges adjacency: two
      // back-to-back removed ranges are one removal region)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("s_"))
      val isl = m
        .withColumn("pm", max(col("e_"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("island",
          sum(when(col("pm").isNull || col("s_") > col("pm") + 1, 1)
            .otherwise(0))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val per = isl.groupBy(col("doc_id"), col("island"))
        .agg(min(col("s_")).as("ss"), max(col("e_")).as("se"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("se") - col("ss") + 1).as("tokens_removed"))
      val dl = d.select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      dl.join(per, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"))
        .withColumn("removed_fp", expr(
          s"CASE WHEN n_tokens = 0 THEN 0 " +
            s"ELSE $Fp * tokens_removed div n_tokens END"))
        .orderBy(col("doc_id"))
    }),

    "q142_countmin_sketch" -> ((s, dir) => {
      val toks = corpusTokens(s, dir)
      val cnt = toks.groupBy(col("token"))
        .agg(count(lit(1)).as("true_cnt"))
        .withColumn("ph", TextFunctions.polyHash(col("token")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cells = cnt.select(col("true_cnt"),
          posexplode(cmsBuckets(col("ph"))).as(Seq("j", "bucket")))
        .groupBy(col("j"), col("bucket"))
        .agg(sum(col("true_cnt")).as("cell"))
      // probes: the 20 heaviest tokens (deterministic tie-break) —
      // point queries against the d×w grid; the grid (≤2048 rows)
      // broadcasts, the corpus is never rescanned
      val probes = cnt.orderBy(col("true_cnt").desc, col("token"))
        .limit(20)
      val out = probes
        .select(col("token"), col("true_cnt"),
          posexplode(cmsBuckets(col("ph"))).as(Seq("j", "bucket")))
        .join(broadcast(cells), Seq("j", "bucket"))
        .groupBy(col("token"), col("true_cnt"))
        .agg(min(col("cell")).as("est_cnt"))
        .withColumn("over_cnt", col("est_cnt") - col("true_cnt"))
        .orderBy(col("true_cnt").desc, col("token"))
        .localCheckpoint(true)
      cnt.unpersist()
      out
    }),

    "q143_greedy_coverage" -> ((s, dir) => greedyCoverage(s, dir, k = 5)),

    // Native whole-operator as-of join (graft.plans.AsofJoinExec —
    // custom LogicalPlan + SparkStrategy + SparkPlan through
    // SparkSessionExtensions): each event matched to the user's latest
    // purchase at-or-before it. Same semantics as q10's composed
    // union-window form, but executed as a single streaming merge per
    // co-partition with O(1) state — no union widening, no window
    // buffer. AsofNativeSpec pins plan shape + equality vs composed.
    "q144_asof_native" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      graft.plans.AsofJoinNative.backward(
        events.select(col("event_id"), col("user_id"), col("ts"),
          col("event_type")),
        purchases, key = Seq("user_id"), on = "ts",
        payload = Seq("purchase_id", "purchase_value"),
        rightTiebreak = Some(col("purchase_id")))
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .orderBy(col("event_id"))
    }),

    // q144's operator with a 1-hour TOLERANCE (pandas merge_asof
    // semantics): the latest purchase still matches only if within the
    // window. Inside the exec this is one extra long comparison at
    // emit; the oracle replays it as nullification of the plain as-of
    // result (any earlier right row is further away, so equivalent).
    "q146_asof_tolerance" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      graft.plans.AsofJoinNative.backward(
        events.select(col("event_id"), col("user_id"), col("ts"),
          col("event_type")),
        purchases, key = Seq("user_id"), on = "ts",
        payload = Seq("purchase_id", "purchase_value"),
        rightTiebreak = Some(col("purchase_id")),
        toleranceMicros = Some(3600L * 1000000L))
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .orderBy(col("event_id"))
    }),

    // FORWARD direction: each event matched to the user's EARLIEST
    // purchase at-or-after it (next-conversion attribution). Same
    // merge pass, but the candidate is the lookahead row — the
    // equal-time tie group is consumed keeping the max-tiebreak
    // winner, everything else stays unconsumed for later left rows.
    "q147_asof_forward" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      graft.plans.AsofJoinNative.backward(
        events.select(col("event_id"), col("user_id"), col("ts"),
          col("event_type")),
        purchases, key = Seq("user_id"), on = "ts",
        payload = Seq("purchase_id", "purchase_value"),
        rightTiebreak = Some(col("purchase_id")),
        direction = "forward")
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .orderBy(col("event_id"))
    }),

    // NEAREST direction (the third merge_asof mode): whichever of the
    // backward/forward candidates is closer in time, ties → backward.
    // One merge pass maintains both O(1) candidate slots; the oracle
    // replays it as two DuckDB ASOF joins + a CASE distance pick.
    "q148_asof_nearest" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      graft.plans.AsofJoinNative.backward(
        events.select(col("event_id"), col("user_id"), col("ts"),
          col("event_type")),
        purchases, key = Seq("user_id"), on = "ts",
        payload = Seq("purchase_id", "purchase_value"),
        rightTiebreak = Some(col("purchase_id")),
        direction = "nearest")
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .orderBy(col("event_id"))
    }),

    // STRICT as-of (pandas merge_asof allow_exact_matches=False): the
    // latest purchase STRICTLY before each event — the point-in-time-
    // correctness knob for leakage-safe feature joins (a label must
    // never see a feature stamped at its own instant). Visible here:
    // every purchase event matches the user's PREVIOUS purchase, not
    // itself (q144 matches it to itself). Oracle: DuckDB ASOF with the
    // strict `>` comparison.
    "q149_asof_strict" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      graft.plans.AsofJoinNative.backward(
        events.select(col("event_id"), col("user_id"), col("ts"),
          col("event_type")),
        purchases, key = Seq("user_id"), on = "ts",
        payload = Seq("purchase_id", "purchase_value"),
        rightTiebreak = Some(col("purchase_id")),
        allowExactMatches = false)
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
        .orderBy(col("event_id"))
    })
  )

  private val phToken = Pipeline3.sqlPolyHashNested("token")

  val oracleSql: Map[String, String] = Map(
    "q141_dup_span_removal" -> {
      val k = SpanK
      val kgram = Pipeline3.sqlKgram(k)
      s"""WITH d AS (SELECT doc_id, ${Pipeline3.sqlToks} AS tk FROM documents),
         |occ AS (
         |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(tk) >= $k THEN
         |        list_transform(range(1, len(tk) - ${k - 2}),
         |          i_ -> {'pos': i_, 'gram': $kgram})
         |      ELSE CAST([] AS STRUCT(pos BIGINT, gram VARCHAR)[]) END) AS u
         |    FROM d)),
         |dup AS (SELECT gram FROM occ GROUP BY gram
         |        HAVING COUNT(DISTINCT doc_id) >= 2),
         |m AS (SELECT doc_id, pos AS s_, pos + ${k - 1} AS e_
         |      FROM occ JOIN dup USING (gram)),
         |pm_ AS (SELECT doc_id, s_, e_,
         |    MAX(e_) OVER (PARTITION BY doc_id ORDER BY s_
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM m),
         |isl AS (SELECT doc_id, s_, e_,
         |    SUM(CASE WHEN pm IS NULL OR s_ > pm + 1 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY s_
         |        ROWS UNBOUNDED PRECEDING) AS island
         |  FROM pm_),
         |sp AS (SELECT doc_id, island, MIN(s_) AS ss, MAX(e_) AS se
         |       FROM isl GROUP BY doc_id, island),
         |per AS (SELECT doc_id, COUNT(*) AS n_spans,
         |        SUM(se - ss + 1) AS tokens_removed FROM sp GROUP BY doc_id),
         |dl AS (SELECT doc_id, len(tk) AS n_tokens FROM d)
         |SELECT dl.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(COALESCE(tokens_removed, 0) AS BIGINT) AS tokens_removed,
         |  CAST(CASE WHEN n_tokens = 0 THEN 0
         |    ELSE $Fp * COALESCE(tokens_removed, 0) // n_tokens END
         |    AS BIGINT) AS removed_fp
         |FROM dl LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "q142_countmin_sketch" -> {
      val hp = CmsParams.zipWithIndex
        .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
      s"""WITH tok AS (
         |  SELECT unnest(${Pipeline3.sqlToks}) AS token FROM documents),
         |cnt AS (SELECT token, COUNT(*) AS true_cnt FROM tok GROUP BY token),
         |ph_ AS (SELECT token, true_cnt, $phToken AS ph FROM cnt),
         |hp(j, a_, b_) AS (VALUES $hp),
         |cells AS (
         |  SELECT j, ((ph * a_ + b_) % ${TextFunctions.HashMod}) % $CmsW
         |      AS bucket, SUM(true_cnt) AS cell
         |  FROM ph_ CROSS JOIN hp GROUP BY 1, 2),
         |probes AS (SELECT token, true_cnt, ph FROM ph_
         |           ORDER BY true_cnt DESC, token LIMIT 20),
         |est AS (
         |  SELECT p.token, p.true_cnt, MIN(cell) AS est_cnt
         |  FROM probes p CROSS JOIN hp
         |  JOIN cells ON cells.j = hp.j AND cells.bucket =
         |    ((p.ph * hp.a_ + hp.b_) % ${TextFunctions.HashMod}) % $CmsW
         |  GROUP BY p.token, p.true_cnt)
         |SELECT token, true_cnt, CAST(est_cnt AS BIGINT) AS est_cnt,
         |  CAST(est_cnt - true_cnt AS BIGINT) AS over_cnt
         |FROM est ORDER BY true_cnt DESC, token""".stripMargin
    },

    "q143_greedy_coverage" -> {
      // every chained CTE is MATERIALIZED: without it DuckDB re-expands
      // the reference chain (g5→c4→c3→…, each referencing sh) into an
      // exponentially deep plan that spilled >75 GB at the x10 sweep
      val stages = (1 to 5).map { r =>
        s"""g$r AS MATERIALIZED (SELECT doc_id, COUNT(*) AS gain FROM sh
           |  WHERE token NOT IN (SELECT token FROM c${r - 1})
           |    AND doc_id NOT IN (SELECT doc_id FROM picked${r - 1})
           |  GROUP BY doc_id),
           |p$r AS MATERIALIZED (SELECT CAST($r AS BIGINT) AS pick_rank,
           |        doc_id, gain
           |        FROM g$r ORDER BY gain DESC, doc_id LIMIT 1),
           |picked$r AS MATERIALIZED (SELECT doc_id FROM picked${r - 1}
           |             UNION ALL SELECT doc_id FROM p$r),
           |c$r AS MATERIALIZED (SELECT token FROM c${r - 1}
           |        UNION SELECT token FROM sh JOIN p$r USING (doc_id))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT doc_id, ${Pipeline3.sqlToks} AS tk FROM documents),
         |sh AS MATERIALIZED (SELECT DISTINCT doc_id,
         |  unnest(list_transform(range(1, len(tk)),
         |    i_ -> ${Pipeline3.sqlKgram(2)})) AS token FROM d),
         |c0 AS (SELECT CAST(NULL AS VARCHAR) AS token WHERE false),
         |picked0 AS (SELECT CAST(NULL AS BIGINT) AS doc_id WHERE false),
         |$stages,
         |all_p AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
         |  UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
         |  UNION ALL SELECT * FROM p5)
         |SELECT pick_rank, doc_id, CAST(gain AS BIGINT) AS gain,
         |  CAST(SUM(gain) OVER (ORDER BY pick_rank) AS BIGINT)
         |    AS covered_total
         |FROM all_p ORDER BY pick_rank""".stripMargin
    },

    "q144_asof_native" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, event_id AS purchase_id,
        |    value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.event_type,
        |  p.purchase_id AS asof_purchase_id,
        |  p.purchase_value AS asof_purchase_value
        |FROM events e ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q146_asof_tolerance" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, event_id AS purchase_id,
        |    value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.event_type,
        |  CASE WHEN p.ts >= e.ts - INTERVAL 1 HOUR
        |    THEN p.purchase_id END AS asof_purchase_id,
        |  CASE WHEN p.ts >= e.ts - INTERVAL 1 HOUR
        |    THEN p.purchase_value END AS asof_purchase_value
        |FROM events e ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q147_asof_forward" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, event_id AS purchase_id,
        |    value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.event_type,
        |  p.purchase_id AS asof_purchase_id,
        |  p.purchase_value AS asof_purchase_value
        |FROM events e ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts <= p.ts
        |ORDER BY e.event_id""".stripMargin,

    "q148_asof_nearest" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, event_id AS purchase_id,
        |    value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1),
        |b AS (SELECT e.event_id, p.purchase_id AS bid,
        |    p.purchase_value AS bv, p.ts AS bts
        |  FROM events e ASOF LEFT JOIN purchases p
        |    ON e.user_id = p.user_id AND e.ts >= p.ts),
        |f AS (SELECT e.event_id, p.purchase_id AS fid,
        |    p.purchase_value AS fv, p.ts AS fts
        |  FROM events e ASOF LEFT JOIN purchases p
        |    ON e.user_id = p.user_id AND e.ts <= p.ts),
        |pick AS (SELECT event_id,
        |    (bid IS NOT NULL AND (fid IS NULL OR
        |      epoch_us(e2.ts) - epoch_us(bts) <=
        |      epoch_us(fts) - epoch_us(e2.ts))) AS use_b
        |  FROM events e2 JOIN b USING (event_id) JOIN f USING (event_id))
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.event_type,
        |  CASE WHEN use_b THEN bid ELSE fid END AS asof_purchase_id,
        |  CASE WHEN use_b THEN bv ELSE fv END AS asof_purchase_value
        |FROM events e JOIN b USING (event_id) JOIN f USING (event_id)
        |  JOIN pick USING (event_id)
        |ORDER BY e.event_id""".stripMargin,

    "q149_asof_strict" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, event_id AS purchase_id,
        |    value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, e.event_type,
        |  p.purchase_id AS asof_purchase_id,
        |  p.purchase_value AS asof_purchase_value
        |FROM events e ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts > p.ts
        |ORDER BY e.event_id""".stripMargin
  )
}
