package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Mixing, SequencePacker, Winnow}
import graft.sources.Catalog

/** Round-3 training-pipeline operators: benchmark decontamination,
  * epoch-weighted dataset mixing, sequence packing, winnowing
  * fingerprint matching, and exact discrete quantiles with an
  * approx-sketch witness. All cross-engine-compared values are exact
  * integer arithmetic or positional picks; sketch-dependent booleans
  * follow the q29 witness pattern (TRUE by accuracy contract).
  */
object Pipeline3 {

  private[queries] val DecontamK = 8 // n-gram length for contamination check
  private val MixWeights = Map( // percent-of-epoch per language
    "en" -> 230, "de" -> 150, "es" -> 100, "fr" -> 50, "zh" -> 25)
  private val SeqLen = 64
  private val NShards = 8
  private val WinnowK = 4
  private val WinnowW = 4
  private val MinShared = 2
  private val DfCap = 1000

  private def docs(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark decontamination: training docs (doc_id % 10 != 0)
    // sharing any 8-gram with the held-out set (doc_id % 10 == 0).
    // Benchmark side broadcasts; one corpus pass.
    "q50_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Decontaminate.overlap(
        d.filter(col("doc_id") % 10 =!= 0),
        d.filter(col("doc_id") % 10 === 0),
        "doc_id", col("text"), k = DecontamK)
        .orderBy(col("doc_id"))
    }),

    // Epoch-weighted training mix: en×2.3, de×1.5, es×1.0, fr×0.5,
    // zh×0.25 — full copies + deterministic-hash fractional copy,
    // pure map-side.
    "q51_epoch_mix" -> ((s, dir) =>
      Mixing.epochMix(docs(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang", MixWeights)
        .orderBy(col("doc_id"), col("epoch"))),

    // Sequence packing plan: 8 hash-shards, concat-and-chunk into
    // 64-token sequences; per-shard window cumsum (never one global
    // sort).
    "q52_sequence_pack" -> ((s, dir) =>
      SequencePacker.packPlan(docs(s, dir), "doc_id", col("text"),
        seqLen = SeqLen, nShards = NShards)
        .orderBy(col("doc_id"))),

    // Winnowing (MOSS) fingerprint matching: k=4-gram hashes, window
    // w=4 local minima, pairs sharing ≥2 fingerprints under a df-cap.
    "q53_winnow_pairs" -> ((s, dir) =>
      Winnow.sharedPairs(docs(s, dir), "doc_id", col("text"),
        k = WinnowK, w = WinnowW, minShared = MinShared, dfCap = DfCap)
        .orderBy(col("doc_id_a"), col("doc_id_b"))),

    // Distribution-rank window family (ntile / percent_rank /
    // cume_dist) — completes the §2.4 window coverage beyond q04/q31.
    // percent_rank/cume_dist are exact ratios of integers (≤ 2^53) so
    // the IEEE division is bit-equal across engines; ntile is ordered
    // by a unique key so the assignment is deterministic.
    "q55_window_rank_family" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
      Catalog.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_extendedprice"))
        .withColumn("bucket8", ntile(8).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // MATERIALIZED packed training sequences — the pipeline's end
    // artifact: per-shard concat-and-chunk into 64-token rows via a
    // streaming per-partition fold (O(seqLen) memory per shard).
    "q58_pack_sequences" -> ((s, dir) =>
      SequencePacker.packSequences(docs(s, dir), "doc_id", col("text"),
        seqLen = SeqLen, nShards = NShards)
        .orderBy(col("shard"), col("seq_id"))),

    // Within-doc repetition quality signals (the public Gopher/
    // MassiveText recipe): duplicated-trigram fraction + longest
    // repeated-token run, one map-side kernel pass.
    "q57_repetition_stats" -> ((s, dir) =>
      graft.functions.TextFunctions.repetitionStats(
        docs(s, dir), "doc_id", col("text"))
        .orderBy(col("doc_id"))),

    // Exact discrete quantiles (positional pick — engine-agnostic,
    // no interpolation) + approx_percentile sketch witness booleans
    // (q29 pattern: TRUE by the sketch's accuracy contract, asserted
    // in the Spark plan). Group sizes broadcast-joined.
    "q54_quantile_sketch" -> ((s, dir) => {
      val li = Catalog.table(s, dir, "lineitem")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
      val counts = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
      val picks = li
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(w))
        .join(broadcast(counts), Seq("l_returnflag"))
        .filter(col("rn") === expr("(cnt * 25 + 99) div 100") ||
          col("rn") === expr("(cnt * 50 + 99) div 100") ||
          col("rn") === expr("(cnt * 75 + 99) div 100") ||
          col("rn") === expr("(cnt * 95 + 99) div 100"))
        .groupBy(col("l_returnflag"))
        .agg(
          max(when(col("rn") === expr("(cnt * 25 + 99) div 100"),
            col("l_extendedprice"))).as("p25"),
          max(when(col("rn") === expr("(cnt * 50 + 99) div 100"),
            col("l_extendedprice"))).as("p50"),
          max(when(col("rn") === expr("(cnt * 75 + 99) div 100"),
            col("l_extendedprice"))).as("p75"),
          max(when(col("rn") === expr("(cnt * 95 + 99) div 100"),
            col("l_extendedprice"))).as("p95"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)),
          lit(10000)).as("ap"))
      def ok(exact: String, i: Int) =
        (abs(element_at(col("ap"), i).cast("double") -
          col(exact).cast("double")) /
          col(exact).cast("double") <= 0.01).as(exact + "_ok")
      picks.join(approx, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("p25"), col("p50"),
          col("p75"), col("p95"),
          ok("p25", 1), ok("p50", 2), ok("p75", 3), ok("p95", 4))
        .orderBy(col("l_returnflag"))
    })
  )

  private[queries] val sqlToks =
    "list_filter(string_split(text, ' '), t_ -> t_ <> '')"

  /** DuckDB k-gram join of `tk[i_] .. tk[i_+k-1]` with '_'. */
  private[queries] def sqlKgram(k: Int): String =
    (0 until k).map(o => if (o == 0) "tk[i_]" else s"tk[i_+$o]")
      .mkString(" || '_' || ")

  /** Portable polynomial hash of an arbitrary string expression; inner
    * lambda vars p_/hh_/cc_ so it can nest inside an i_ transform. */
  private[queries] def sqlPolyHashNested(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($s)+1), " +
      s"p_ -> CAST(ascii(($s)[p_]) AS BIGINT))), " +
      s"(hh_, cc_) -> (hh_ * 131 + cc_) % 1000000007)"

  val oracleSql: Map[String, String] = Map(
    "q50_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, unnest(
         |    CASE WHEN len(tk) >= $DecontamK THEN
         |      list_transform(range(1, len(tk) - ${DecontamK - 2}),
         |        i_ -> ${sqlKgram(DecontamK)})
         |    ELSE CAST([] AS VARCHAR[]) END) AS shingle
         |  FROM d),
         |bench AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
         |train AS (SELECT * FROM sh WHERE doc_id % 10 <> 0)
         |SELECT t.doc_id,
         |  CAST(COUNT(DISTINCT t.shingle) AS BIGINT) AS n_hit_ngrams,
         |  CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs
         |FROM train t JOIN bench b ON t.shingle = b.shingle
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q51_epoch_mix" -> {
      val caseW = MixWeights.toSeq.sortBy(_._1)
        .map { case (l, p) => s"WHEN '$l' THEN $p" }
        .mkString(" ")
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    (CAST(doc_id AS BIGINT) % 1000000007 * 1103515245 + 12345)
         |      % 1000000007 % 100 AS u,
         |    CASE lang $caseW ELSE 100 END AS w
         |  FROM documents),
         |n AS (
         |  SELECT doc_id, lang,
         |    CAST(w // 100 + CASE WHEN u < w % 100 THEN 1 ELSE 0 END
         |      AS BIGINT) AS nc
         |  FROM d)
         |SELECT doc_id, lang, unnest(range(0, nc)) AS epoch
         |FROM n WHERE nc > 0 ORDER BY doc_id, epoch""".stripMargin
    },

    "q52_sequence_pack" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST((CAST(doc_id AS BIGINT) % 1000000007 * 2654435761
         |      + 12345) % 1000000007 % $NShards AS BIGINT) AS shard,
         |    CAST(len($sqlToks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
         |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
         |      1 PRECEDING), 0) AS BIGINT) AS start_off
         |  FROM d WHERE n_tokens > 0)
         |SELECT doc_id, shard, n_tokens, start_off,
         |  start_off // $SeqLen AS seq_first,
         |  (start_off + n_tokens - 1) // $SeqLen AS seq_last
         |FROM p ORDER BY doc_id""".stripMargin,

    "q53_winnow_pairs" ->
      s"""WITH d AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |hs AS (
         |  SELECT doc_id,
         |    list_transform(range(1, len(tk) - ${WinnowK - 2}),
         |      i_ -> ${sqlPolyHashNested(sqlKgram(WinnowK))}) AS h
         |  FROM d WHERE len(tk) >= $WinnowK),
         |wins AS (
         |  SELECT doc_id,
         |    CASE WHEN len(h) >= $WinnowW THEN
         |      list_transform(range(1, len(h) - ${WinnowW - 2}),
         |        j_ -> list_min(list_slice(h, j_, j_ + ${WinnowW - 1})))
         |    ELSE [list_min(h)] END AS fps
         |  FROM hs WHERE len(h) > 0),
         |fp AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM wins),
         |capped AS (
         |  SELECT fp FROM (SELECT fp, COUNT(*) AS dfc FROM fp GROUP BY fp)
         |  WHERE dfc <= $DfCap),
         |f AS (SELECT doc_id, fp.fp FROM fp JOIN capped USING (fp))
         |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= $MinShared
         |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    // Positioned-token formulation: the earlier draft string_agg'd a
    // whole shard into ONE list and carried it per chunk row — a
    // quadratic DuckDB materialization that OOM'd the x10 scaled
    // sweep. Tokens get a global per-shard position instead (parallel
    // unnests zip in DuckDB), then pack by p div SeqLen; doc-level
    // arrays stay doc-sized and the token relation is linear.
    "q58_pack_sequences" ->
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |    CAST((CAST(doc_id AS BIGINT) % 1000000007 * 2654435761
         |      + 12345) % 1000000007 % $NShards AS BIGINT) AS shard
         |  FROM documents WHERE text IS NOT NULL),
         |dt AS (
         |  SELECT shard, doc_id,
         |    list_filter(string_split(text, ' '), t_ -> t_ <> '') AS tk
         |  FROM d),
         |tok AS (
         |  SELECT shard, doc_id, unnest(tk) AS token,
         |    unnest(range(1, len(tk) + 1)) AS j
         |  FROM dt WHERE len(tk) > 0),
         |pos AS (
         |  SELECT shard, token,
         |    row_number() OVER (PARTITION BY shard ORDER BY doc_id, j) - 1
         |      AS p
         |  FROM tok)
         |SELECT shard, CAST(p // $SeqLen AS BIGINT) AS seq_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  string_agg(token, ' ' ORDER BY p) AS seq_text
         |FROM pos GROUP BY shard, p // $SeqLen
         |ORDER BY shard, seq_id""".stripMargin,

    "q57_repetition_stats" ->
      s"""WITH d AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |tri AS (
         |  SELECT doc_id, tk,
         |    CASE WHEN len(tk) >= 3 THEN
         |      list_transform(range(1, len(tk) - 1),
         |        i_ -> tk[i_] || '_' || tk[i_+1] || '_' || tk[i_+2])
         |    ELSE CAST([] AS VARCHAR[]) END AS tg
         |  FROM d),
         |tok AS (
         |  SELECT doc_id, unnest(tk) AS token,
         |    unnest(range(1, len(tk) + 1)) AS pos
         |  FROM d),
         |isl AS (
         |  SELECT doc_id, token,
         |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id, token
         |      ORDER BY pos) AS g
         |  FROM tok),
         |runs AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS r
         |  FROM isl GROUP BY doc_id, token, g),
         |mx AS (SELECT doc_id, MAX(r) AS mr FROM runs GROUP BY doc_id)
         |SELECT tri.doc_id,
         |  CASE WHEN tk IS NULL THEN NULL
         |    ELSE CAST(len(tg) AS BIGINT) END AS n_trigrams,
         |  CASE WHEN tk IS NULL THEN NULL
         |    ELSE CAST(len(list_distinct(tg)) AS BIGINT) END
         |    AS distinct_trigrams,
         |  CASE WHEN len(tg) > 0 THEN
         |    CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
         |      / CAST(len(tg) AS DOUBLE) END AS dup_frac,
         |  CASE WHEN tk IS NULL THEN NULL
         |    ELSE CAST(COALESCE(mx.mr, 0) AS BIGINT) END AS max_token_run
         |FROM tri LEFT JOIN mx ON tri.doc_id = mx.doc_id
         |ORDER BY tri.doc_id""".stripMargin,

    "q55_window_rank_family" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
        |  CAST(NTILE(8) OVER w AS INT) AS bucket8,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // positional quantile picks replayed exactly; witness booleans
    // TRUE by the sketch accuracy contract (asserted in the Spark plan)
    "q54_quantile_sketch" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  MAX(CASE WHEN rn = (cnt * 25 + 99) // 100
        |      THEN l_extendedprice END) AS p25,
        |  MAX(CASE WHEN rn = (cnt * 50 + 99) // 100
        |      THEN l_extendedprice END) AS p50,
        |  MAX(CASE WHEN rn = (cnt * 75 + 99) // 100
        |      THEN l_extendedprice END) AS p75,
        |  MAX(CASE WHEN rn = (cnt * 95 + 99) // 100
        |      THEN l_extendedprice END) AS p95,
        |  TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok,
        |  TRUE AS p95_ok
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
