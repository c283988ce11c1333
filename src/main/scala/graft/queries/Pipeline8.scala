package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Compaction, Decontaminate, FuzzyDedup, Regression, Similarity}
import graft.sources.Catalog

/** Round-3 block (q99–q106): SemDeDup-style semantic dedup over
  * embedding clusters, C4-style URL/domain curation with per-domain
  * caps, distributed ridge-regression sufficient statistics, cross-doc
  * n-gram redundancy scoring, CDC log compaction, a linear quality
  * classifier, a cross-source duplication matrix, and the composed
  * curation-funnel flagship v2 (quality → exact dedup → decontaminate
  * → domain cap, with per-source stage accounting).
  *
  * Parity discipline unchanged: fixed-point integers for every score,
  * decimal routing for every aggregated double, `div`/`//` integer
  * division on both engines, deterministic total ORDER BY per query.
  */
object Pipeline8 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  // q99 — SemDeDup parameters
  private val SemSeeds = 8
  private val TauSemFp = 40000000000000L // cosine 0.40 at 1e7² fixed point

  // q100/q106 — domain curation parameters
  private val MaxPerDomain = 10
  private val BlockSuffix = "-2.example.com"

  // q102/q106 — decontamination shingle width
  private val RedK = 8

  // q104/q106 — quality classifier (integer weights over 1e6-scaled
  // feature ratios; mirrors q14's double `quality` formula exactly but
  // in overflow-safe exact integer arithmetic)
  private val QualityThreshold = 6500000L
  private val stop = TextFunctions.langMarkers.head._2 // en markers

  // q105 — near-dup pair threshold (same as q18/q19)
  private val Tau = 0.5

  /** Synthesized per-doc URL (both engines build the identical string;
    * the corpus has no URL column) and the domain extracted from it by
    * regex — the parse step a real crawl pipeline runs on `url`. */
  private def withDomain(d: DataFrame): DataFrame =
    d.withColumn("url",
        concat(lit("https://"), col("source"), lit("-"),
          (col("doc_id") % 3).cast("string"), lit(".example.com/p/"),
          col("doc_id").cast("string")))
      .withColumn("domain",
        regexp_extract(col("url"), "https://([a-z0-9-]+\\.example\\.com)/", 1))

  /** Integer quality score at 1e6 scale: 3·uniq_ratio + 4·(1−stop_ratio)
    * + 3·min(n,100)/100, each ratio as `x*1000000 div n_tokens`.
    * NULL when the document has no token (ANSI-safe, like q14). */
  private def withQuality(d: DataFrame): DataFrame =
    d.withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop",
        TextFunctions.wordListHits(col("toks"), stop).cast("long"))
      .withColumn("score_fp",
        when(col("n_tokens") > 0,
          expr("3 * ((n_uniq * 1000000) div n_tokens)" +
            " + 4 * (1000000 - (n_stop * 1000000) div n_tokens)" +
            " + 3 * least(n_tokens, 100L) * 10000")))
      .withColumn("keep_q",
        coalesce(col("score_fp") >= QualityThreshold, lit(false)))
      .drop("toks")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SemDeDup (Abbas et al. 2023, public): confine the quadratic
    // pair search to embedding clusters. Seeds here are the K lowest
    // vec_ids (deterministic, oracle-replayable); at 100 TB the seeds
    // come from the distributed k-means fit (q62) and clusters are
    // capped, so the per-cluster self-join is bounded — the corpus
    // never enters one n² pair space. Assignment is a broadcast-K
    // map-side argmax; scores are exact fixed-point dots (the
    // optimizer rule rewrites them to the codegen'd dot_fp).
    "q99_semantic_dedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.fixedPoint(col("embedding")).as("v"))
      val seeds = e.filter(col("vec_id") < SemSeeds)
        .select(col("vec_id").as("seed"), col("v").as("sv"))
      val wAsg = Window.partitionBy(col("vec_id"))
        .orderBy(col("d").desc, col("seed").asc)
      val asg = e.crossJoin(broadcast(seeds))
        .withColumn("d", Similarity.dotInt(col("v"), col("sv")))
        .withColumn("rn", row_number().over(wAsg))
        .filter(col("rn") === 1)
        .select(col("seed"), col("vec_id"), col("v"))
      val a = asg.select(col("seed"), col("vec_id").as("id_a"),
        col("v").as("va"))
      val b = asg.select(col("seed"), col("vec_id").as("id_b"),
        col("v").as("vb"))
      a.join(b, "seed")
        .filter(col("id_a") < col("id_b"))
        .withColumn("dot_fp", Similarity.dotInt(col("va"), col("vb")))
        .filter(col("dot_fp") >= TauSemFp)
        .select(col("seed").as("cluster"), col("id_a"), col("id_b"),
          col("dot_fp"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // C4-style URL/domain curation: synthesize the url, regex-extract
    // the registrable domain, drop blocklisted domains, cap survivors
    // per domain (crawl anti-spam). The cap window partitions by
    // domain — bounded state per key, the standard top-N shape. One
    // shuffle on domain total.
    "q100_domain_curation" -> ((s, dir) => {
      val d = withDomain(docs(s, dir))
        .withColumn("n_tokens",
          size(TextFunctions.tokens(col("text"))).cast("long"))
        .withColumn("blocked", col("domain").endsWith(BlockSuffix))
      val w = Window.partitionBy(col("domain")).orderBy(col("doc_id"))
      d.withColumn("rn", row_number().over(w))
        .withColumn("kept", !col("blocked") && col("rn") <= MaxPerDomain)
        .groupBy(col("domain"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("blocked"), 1)).as("n_blocked"),
          count(when(!col("blocked") && col("rn") > MaxPerDomain, 1))
            .as("n_capped"),
          count(when(col("kept"), 1)).as("n_kept"),
          sum(when(col("kept"), col("n_tokens"))).as("tokens_kept"))
        .orderBy(col("domain"))
    }),

    // Distributed ridge/OLS sufficient statistics: the D×D Gram matrix
    // and moment vector for l_extendedprice ~ (1, quantity, discount,
    // tax) in ONE map-side-combined aggregation — the cluster reduces
    // 100 TB to O(D²) numbers and the driver solves the tiny system
    // (operators/Regression.fit; solve law-pinned in RegressionSpec).
    // Every product routed through decimal → order-independent sums.
    "q101_ridge_stats" -> ((s, dir) =>
      Regression.sufficientStats(
        t(s, dir, "lineitem"),
        Seq(lit(1.0), col("l_quantity"), col("l_discount"), col("l_tax")),
        col("l_extendedprice"), scale = 6)),

    // Cross-doc n-gram redundancy: per document, the fraction of its
    // distinct 8-grams that appear in at least one OTHER document —
    // the corpus-level complement of q57's within-doc repetition and
    // the doc-granular view of q70's boilerplate. Two shuffles (one on
    // the shingle, one on doc_id); df counts collapse map-side.
    "q102_ngram_redundancy" -> ((s, dir) => {
      val sh = FuzzyDedup.shingles(docs(s, dir), "doc_id", col("text"),
        k = RedK)
      val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val out = sh.join(df, "shingle")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          count(when(col("df") >= 2, 1)).as("n_shared"))
        .withColumn("shared_fp",
          expr("(n_shared * 1000000) div n_grams"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true)
      sh.unpersist()
      out
    }),

    // CDC log compaction to a live snapshot: last-writer-wins per key
    // + latest-delete drops the key. The log is synthesized from
    // orders by deterministic rules (insert for all, update for %3,
    // delete for %11) so both engines fold the identical history.
    // One hash-agg shuffle, payloads ride max_by — see
    // operators/Compaction for the no-window no-self-join argument.
    "q103_log_compaction" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val ins = o.select(col("o_orderkey"), lit(1L).as("seq"),
        lit("I").as("op"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"))
      val upd = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit(2L).as("seq"), lit("U").as("op"),
          lit("P2").as("status"),
          (col("o_totalprice") + 10.0).as("price"))
      val del = o.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), lit(3L).as("seq"), lit("D").as("op"),
          lit(null).cast("string").as("status"),
          lit(null).cast("double").as("price"))
      Compaction.compact(ins.unionByName(upd).unionByName(del),
          Seq("o_orderkey"), col("seq"), col("op"),
          Seq("status", "price"))
        .orderBy(col("o_orderkey"))
    }),

    // Linear quality classifier (the integer-exact analog of a
    // fastText-style quality gate): thresholded linear score over
    // interpretable token features. Pure map-side scan — no shuffle
    // except the output sort; at 100 TB this is a free rider on any
    // corpus pass.
    "q104_quality_classifier" -> ((s, dir) =>
      withQuality(docs(s, dir))
        .select(col("doc_id"), col("n_tokens"), col("score_fp"),
          col("keep_q").as("keep"))
        .orderBy(col("doc_id"))),

    // Cross-source duplication matrix: which sources copy from which —
    // exact 3-gram Jaccard ≥ 0.5 pairs (q18's inverted index) rolled
    // up to unordered source pairs. The pair relation is tiny (near
    // dups only); the rollup is a broadcast join + one small agg.
    "q105_cross_source_dups" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = FuzzyDedup.jaccardPairs(
          FuzzyDedup.shingles(d, "doc_id", col("text"), k = 3), "doc_id")
        .filter(col("jaccard") >= Tau)
      // src has one row per DOCUMENT — at 100 TB that is billions of
      // rows, so it must never carry a forced broadcast hint (round-5
      // curation-dict lesson). The genuinely small side is `pairs`
      // (near-dup pairs only); leave both sides unhinted and AQE
      // broadcasts the pairs side into the map at runtime.
      val src = d.select(col("doc_id"), col("source"))
      pairs
        .join(src.toDF("doc_id_a", "src_a"), "doc_id_a")
        .join(src.toDF("doc_id_b", "src_b"), "doc_id_b")
        .select(least(col("src_a"), col("src_b")).as("source_a"),
          greatest(col("src_a"), col("src_b")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // Curation funnel v2 — the composed flagship: quality gate → exact
    // dedup (min doc_id per fingerprint) → benchmark decontamination
    // (8-gram overlap vs the %10 held-out set) → per-domain cap, with
    // per-source accounting at every stage. Every stage is the
    // sub-quadratic shape proved by its standalone query (q104, q17,
    // q50, q100); the funnel flags are computed once per doc and
    // aggregated in one pass.
    "q106_curation_funnel" -> ((s, dir) => {
      val bench = docs(s, dir).filter(col("doc_id") % 10 === 0)
      val corpus = withDomain(withQuality(
        docs(s, dir).filter(col("doc_id") % 10 =!= 0)))
      val q = corpus.withColumn("fp",
        TextFunctions.fingerprint(col("text")))
      // exact-dedup winner per fingerprint among quality survivors
      val staged = q.withColumn("rn_fp",
          when(col("keep_q"), row_number().over(
            Window.partitionBy(col("keep_q"), col("fp"))
              .orderBy(col("doc_id")))))
        .withColumn("is_unique", col("keep_q") && col("rn_fp") === 1)
      // contaminated = shares any 8-gram with the held-out set
      val contam = Decontaminate.overlap(
          staged.filter(col("is_unique"))
            .select(col("doc_id"), col("text")),
          bench.select(col("doc_id"), col("text")),
          "doc_id", col("text"), k = RedK)
        .select(col("doc_id"), lit(true).as("contaminated"))
      val clean = staged
        .join(contam, Seq("doc_id"), "left")
        .withColumn("is_clean",
          col("is_unique") && col("contaminated").isNull)
      // per-domain cap over clean survivors only
      val wDom = Window.partitionBy(col("is_clean"), col("domain"))
        .orderBy(col("doc_id"))
      val fin = clean.withColumn("rn_dom",
          when(col("is_clean"), row_number().over(wDom)))
        .withColumn("is_final",
          col("is_clean") && !col("domain").endsWith(BlockSuffix) &&
            col("rn_dom") <= MaxPerDomain)
      fin.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_total"),
          count(when(col("keep_q"), 1)).as("n_quality"),
          count(when(col("is_unique"), 1)).as("n_unique"),
          count(when(col("is_clean"), 1)).as("n_clean"),
          count(when(col("is_final"), 1)).as("n_final"),
          sum(when(col("is_final"), col("n_tokens"))).as("tokens_final"))
        .orderBy(col("source"))
    })
  )

  // ---------------------------------------------------------------
  // DuckDB oracles
  // ---------------------------------------------------------------

  private val sqlToks =
    "list_filter(string_split(text, ' '), t_ -> t_ <> '')"

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private val enList = sqlList(stop)

  /** DuckDB fragment: portable polynomial hash of a string expr. */
  private def sqlPolyHash(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($s)+1), i_ -> CAST(ascii($s[i_]) AS BIGINT))), " +
      s"(h_, c_) -> (h_ * 131 + c_) % 1000000007)"

  private def sqlKgram(k: Int): String =
    (0 until k).map(o => if (o == 0) "tk[i_]" else s"tk[i_+$o]")
      .mkString(" || '_' || ")

  /** Shared fragment: distinct k-gram shingles of documents.text
    * (expects a CTE `tk0` with (doc_id, tk) token lists). */
  private def sqlShingles(k: Int): String =
    s"""SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(tk) >= $k THEN
       |      list_transform(range(1, len(tk) - ${k - 2}),
       |        i_ -> ${sqlKgram(k)})
       |    ELSE CAST([] AS VARCHAR[]) END) AS shingle
       |  FROM tk0""".stripMargin

  private val sqlFixedEmb =
    """e AS (SELECT vec_id,
      |  list_transform(embedding,
      |    x_ -> CAST(floor(CAST(x_ AS DOUBLE) * 10000000.0) AS BIGINT)) AS v
      |  FROM embeddings)""".stripMargin

  private def sqlDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), i_ -> $a[i_] * $b[i_])) AS BIGINT)"

  /** Quality-score fragment (expects n_tokens/n_uniq/n_stop BIGINTs). */
  private val sqlScore =
    """CASE WHEN n_tokens > 0 THEN
      |      3 * ((n_uniq * 1000000) // n_tokens)
      |      + 4 * (1000000 - (n_stop * 1000000) // n_tokens)
      |      + 3 * least(n_tokens, 100) * 10000
      |    END""".stripMargin

  // single line on purpose: a margin-stripped continuation starting
  // with `||` would lose one pipe to stripMargin
  private val sqlUrlDomain =
    "'https://' || source || '-' || CAST(doc_id % 3 AS VARCHAR)" +
      " || '.example.com/p/' || CAST(doc_id AS VARCHAR)"

  val oracleSql: Map[String, String] = Map(
    "q99_semantic_dedup" ->
      s"""WITH $sqlFixedEmb,
         |seeds AS (SELECT vec_id AS seed, v AS sv FROM e
         |          WHERE vec_id < $SemSeeds),
         |asg AS (
         |  SELECT vec_id, seed, v FROM (
         |    SELECT e.vec_id, s.seed, e.v,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqlDot("e.v", "s.sv")} DESC, s.seed ASC) AS rn
         |    FROM e CROSS JOIN seeds s)
         |  WHERE rn = 1)
         |SELECT a.seed AS cluster, a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${sqlDot("a.v", "b.v")} AS dot_fp
         |FROM asg a JOIN asg b ON a.seed = b.seed AND a.vec_id < b.vec_id
         |WHERE ${sqlDot("a.v", "b.v")} >= $TauSemFp
         |ORDER BY id_a, id_b""".stripMargin,

    "q100_domain_curation" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tokens,
         |    regexp_extract($sqlUrlDomain,
         |      'https://([a-z0-9-]+\\.example\\.com)/', 1) AS domain
         |  FROM documents),
         |r AS (
         |  SELECT *, domain LIKE '%$BlockSuffix' AS blocked,
         |    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
         |  FROM d)
         |SELECT domain,
         |  COUNT(*) AS n_docs,
         |  COUNT(CASE WHEN blocked THEN 1 END) AS n_blocked,
         |  COUNT(CASE WHEN NOT blocked AND rn > $MaxPerDomain THEN 1 END)
         |    AS n_capped,
         |  COUNT(CASE WHEN NOT blocked AND rn <= $MaxPerDomain THEN 1 END)
         |    AS n_kept,
         |  CAST(SUM(CASE WHEN NOT blocked AND rn <= $MaxPerDomain
         |    THEN n_tokens END) AS BIGINT) AS tokens_kept
         |FROM r GROUP BY domain ORDER BY domain""".stripMargin,

    "q101_ridge_stats" -> {
      val feats = Seq("1.0", "l_quantity", "l_discount", "l_tax")
      val terms =
        (for {
          i <- feats.indices
          j <- feats.indices if i <= j
        } yield s"xtx_${i}_$j" ->
          s"CAST(SUM(CAST(${feats(i)} * ${feats(j)} AS DECIMAL(38,6))) AS DOUBLE)") ++
        feats.indices.map(i => s"xty_$i" ->
          s"CAST(SUM(CAST(${feats(i)} * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)")
      val aggs = terms.map { case (n, e) => s"$e AS $n" }.mkString(",\n    ")
      val un = terms.map { case (n, _) =>
        s"SELECT '$n' AS term, $n AS value FROM s" }.mkString("\n  UNION ALL ")
      s"""WITH s AS (
         |  SELECT $aggs
         |  FROM lineitem)
         |$un
         |ORDER BY term""".stripMargin
    },

    "q102_ngram_redundancy" ->
      s"""WITH tk0 AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |sh AS (${sqlShingles(RedK)}),
         |df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
         |SELECT sh.doc_id,
         |  COUNT(*) AS n_grams,
         |  COUNT(CASE WHEN df.df >= 2 THEN 1 END) AS n_shared,
         |  (COUNT(CASE WHEN df.df >= 2 THEN 1 END) * 1000000) // COUNT(*)
         |    AS shared_fp
         |FROM sh JOIN df ON sh.shingle = df.shingle
         |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    "q103_log_compaction" ->
      """WITH log AS (
        |  SELECT o_orderkey, CAST(1 AS BIGINT) AS seq, 'I' AS op,
        |    o_orderstatus AS status, o_totalprice AS price FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'U', 'P2', o_totalprice + 10.0
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'D', NULL, NULL
        |  FROM orders WHERE o_orderkey % 11 = 0)
        |SELECT o_orderkey, CAST(MAX(seq) AS BIGINT) AS last_seq,
        |  COUNT(*) AS n_versions,
        |  arg_max(status, seq) AS status,
        |  arg_max(price, seq) AS price
        |FROM log GROUP BY o_orderkey
        |HAVING arg_max(op, seq) <> 'D'
        |ORDER BY o_orderkey""".stripMargin,

    "q104_quality_classifier" ->
      s"""WITH d AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
         |    CAST(len(list_filter(tk, t_ -> list_contains($enList, t_)))
         |      AS BIGINT) AS n_stop
         |  FROM d),
         |sc AS (
         |  SELECT doc_id, n_tokens, $sqlScore AS score_fp
         |  FROM f)
         |SELECT doc_id, n_tokens, score_fp,
         |  COALESCE(score_fp >= $QualityThreshold, FALSE) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q105_cross_source_dups" ->
      s"""WITH tk0 AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |sh AS (${sqlShingles(3)}),
         |card AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |p AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |near AS (
         |  SELECT da, db FROM p
         |  JOIN card ca ON p.da = ca.doc_id
         |  JOIN card cb ON p.db = cb.doc_id
         |  WHERE CAST(inter AS DOUBLE)
         |      / CAST(ca.n + cb.n - inter AS DOUBLE) >= $Tau)
         |SELECT least(sa.source, sb.source) AS source_a,
         |  greatest(sa.source, sb.source) AS source_b,
         |  COUNT(*) AS n_pairs
         |FROM near
         |JOIN documents sa ON near.da = sa.doc_id
         |JOIN documents sb ON near.db = sb.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q106_curation_funnel" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, source, text, $sqlToks AS tk,
         |    regexp_extract($sqlUrlDomain,
         |      'https://([a-z0-9-]+\\.example\\.com)/', 1) AS domain
         |  FROM documents WHERE doc_id % 10 <> 0),
         |f AS (
         |  SELECT doc_id, source, text, domain,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
         |    CAST(len(list_filter(tk, t_ -> list_contains($enList, t_)))
         |      AS BIGINT) AS n_stop,
         |    ${sqlPolyHash("text")} AS fp
         |  FROM corpus),
         |q AS (
         |  SELECT *, COALESCE($sqlScore >= $QualityThreshold, FALSE)
         |    AS keep_q
         |  FROM f),
         |u AS (
         |  SELECT *, keep_q AND ROW_NUMBER() OVER (
         |      PARTITION BY keep_q, fp ORDER BY doc_id) = 1 AS is_unique
         |  FROM q),
         |tk0 AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |sh AS (${sqlShingles(RedK)}),
         |contam AS (
         |  SELECT DISTINCT t.doc_id
         |  FROM sh t JOIN sh b ON t.shingle = b.shingle
         |  WHERE t.doc_id % 10 <> 0 AND b.doc_id % 10 = 0),
         |cl AS (
         |  SELECT u.*, u.is_unique
         |      AND u.doc_id NOT IN (SELECT doc_id FROM contam) AS is_clean
         |  FROM u),
         |fin AS (
         |  SELECT *, is_clean
         |      AND NOT domain LIKE '%$BlockSuffix'
         |      AND ROW_NUMBER() OVER (PARTITION BY is_clean, domain
         |        ORDER BY doc_id) <= $MaxPerDomain AS is_final
         |  FROM cl)
         |SELECT source,
         |  COUNT(*) AS n_total,
         |  COUNT(CASE WHEN keep_q THEN 1 END) AS n_quality,
         |  COUNT(CASE WHEN is_unique THEN 1 END) AS n_unique,
         |  COUNT(CASE WHEN is_clean THEN 1 END) AS n_clean,
         |  COUNT(CASE WHEN is_final THEN 1 END) AS n_final,
         |  CAST(SUM(CASE WHEN is_final THEN n_tokens END) AS BIGINT)
         |    AS tokens_final
         |FROM fin GROUP BY source ORDER BY source""".stripMargin
  )
}
