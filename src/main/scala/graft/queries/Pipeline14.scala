package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.DistributedRank
import graft.sources.Catalog

/** Round-9 additions: model-based data SELECTION — the two standard
  * ways a pretraining pipeline picks which documents to keep, both
  * re-expressed in exact cross-engine arithmetic (north-star scope;
  * no reference counterpart — SURVEY §2.4 last row).
  *
  *  - q151 CCNet-style LM quality filter (Wenzek et al. 2019,
  *    arXiv:1911.00359): fit a bigram language model on an in-domain
  *    reference corpus (here: the `en` slice), score every document by
  *    its mean smoothed bigram probability (the monotone fixed-point
  *    stand-in for negative perplexity — higher = more reference-like),
  *    and cut the corpus into head/middle/tail terciles by rank, which
  *    is exactly CCNet's perplexity bucketing.
  *  - q152 DSIR importance selection (Xie et al. 2023,
  *    arXiv:2302.03169): hashed n-gram features (unigrams + adjacent
  *    bigrams → B=1024 buckets), a target feature distribution from the
  *    in-domain slice vs the raw-corpus distribution, per-document
  *    importance score = Σ over the document's features of the
  *    per-bucket smoothed-frequency difference, then top-k selection.
  *    (The paper scores with the log-likelihood ratio; the fixed-point
  *    frequency DIFFERENCE is used here so the oracle compares bit-for-
  *    bit — it ranks identically for the two-class decision direction
  *    and keeps every intermediate in exact BIGINT.)
  *
  * Scale design (the part that must survive 100 TB):
  *  - model state is bounded by VOCABULARY, not corpus: q151's bigram/
  *    head count relations are Zipf-small and joined (AQE picks
  *    broadcast when they fit); q152's distributions are ≤ B = 1024
  *    rows BY CONSTRUCTION — feature hashing is the paper's own device
  *    for exactly this — and are broadcast to a map-side score join.
  *  - scoring is one map pass + one groupBy(doc_id) shuffle; fitting is
  *    one groupBy(feature) shuffle with map-side partial aggregation.
  *    Two corpus passes total (fit, then score) — the paper's own
  *    shape.
  *  - no global single-reducer window: q151's corpus-wide tercile rank
  *    uses [[DistributedRank.globalRowNumber]] (range-partitioned
  *    two-phase rank); q152's top-k is a TakeOrdered, not a sort.
  *  - no RNG, no floats: probabilities are fixed-point BIGINTs
  *    (`(n*1000000) div d`), so re-runs, engines, and the DuckDB
  *    oracle agree exactly.
  */
object Pipeline14 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  /** Adjacent-bigram relation (doc_id, lang, w1, w2) — q95's shape
    * plus doc identity. */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(toks)-1)," +
          " i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).as("p"))
      .select(col("doc_id"), col("lang"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CCNet quality bucketing. Reference model = add-one-smoothed
    // bigram LM over the `en` slice: P(w2|w1) ≈ (c(w1,w2)+1)/(c(w1)+V).
    // Head counts reuse the pair counts (q95's trick: one shuffle on
    // the pair, one on the head); V rides a broadcast-scalar crossJoin.
    // Docs with < 2 tokens have no bigram evidence and are excluded
    // (CCNet likewise drops too-short lines before scoring).
    "q151_perplexity_filter" -> ((s, dir) => {
      val pairs = bigrams(t(s, dir, "documents"))
      val ref = pairs.filter(col("lang") === "en")
      val cb = ref.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cb"))
      val ch = cb.groupBy(col("w1")).agg(sum(col("cb")).as("ch"))
      val vocab = t(s, dir, "documents").filter(col("lang") === "en")
        .select(explode(TextFunctions.tokens(col("text"))).as("w"))
        .agg(countDistinct(col("w")).as("vocab"))
      val perDoc = pairs
        .join(cb, Seq("w1", "w2"), "left")
        .join(ch, Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        .withColumn("p_fp", expr(
          "((coalesce(cb, 0) + 1) * 1000000) div (coalesce(ch, 0) + vocab)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p_fp")).as("sum_fp"))
        .withColumn("score_fp", expr("sum_fp div n_bigrams"))
        .drop("sum_fp")
      // rank + total in ONE pass: the separate count() re-ran the
      // whole perplexity pipeline (bigram joins over documents) a
      // second time just to learn n_docs
      val (ranked, nDocs) = DistributedRank.globalRowNumberCounted(
        perDoc, Seq(col("score_fp").desc, col("doc_id").asc), "rn")
      ranked
        .withColumn("bucket", expr(
          s"CASE ((rn - 1) * 3) div ${nDocs}L WHEN 0 THEN 'head'" +
            " WHEN 1 THEN 'middle' ELSE 'tail' END"))
        .select(col("doc_id"), col("n_bigrams"), col("score_fp"),
          col("rn"), col("bucket"))
        .orderBy(col("doc_id"))
    }),

    // DSIR top-k selection. Features = unigrams + adjacent bigrams
    // hashed to B buckets with the portable polynomial hash; target
    // slice = sources src0–src3 (the "in-domain" corpus); one
    // aggregation fits BOTH distributions (count + filtered count per
    // bucket), the ≤B-row score table broadcasts into a map-side join.
    "q152_dsir_select" -> ((s, dir) => {
      val B = 1024
      val feats = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("source"), explode(expr(
          // slice(toks,1,0) = a typed empty ARRAY<STRING> (array()
          // would be ARRAY<NULL> and fail the concat)
          "concat(toks, CASE WHEN size(toks) >= 2 THEN" +
            " transform(sequence(1, size(toks)-1)," +
            "   i -> concat(toks[i-1], ' ', toks[i]))" +
            " ELSE slice(toks, 1, 0) END)")).as("f"))
        .withColumn("b", TextFunctions.polyHash(col("f")) % B)
        .withColumn("is_t",
          col("source").isin("src0", "src1", "src2", "src3"))
      val dist = feats.groupBy(col("b")).agg(
        count(lit(1)).as("cr"),
        count(when(col("is_t"), 1)).as("ct"))
      val totals = dist.agg(sum(col("cr")).as("tot_r"),
        sum(col("ct")).as("tot_t"))
      val score = dist.crossJoin(broadcast(totals))
        .withColumn("diff_fp", expr(
          s"((ct + 1) * 1000000) div (tot_t + $B)" +
            s" - ((cr + 1) * 1000000) div (tot_r + $B)"))
        .select(col("b"), col("diff_fp"))
      feats.join(broadcast(score), Seq("b"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_feats"), sum(col("diff_fp")).as("weight_fp"))
        .orderBy(col("weight_fp").desc, col("doc_id").asc)
        .limit(100)
    })
  )

  private val sqlToks =
    "list_filter(string_split(text, ' '), t_ -> t_ <> '')"

  /** DuckDB twin of the portable polynomial hash over a string column
    * expression `e` (q48's oracle form, parameterized). */
  private def sqlPolyHash(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, length($e)+1),
       |    i_ -> CAST(ascii($e[i_]) AS BIGINT))),
       |  (h_, c_) -> (h_ * 131 + c_) % 1000000007)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q151_perplexity_filter" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, $sqlToks AS toks FROM documents),
         |pairs AS (
         |  SELECT doc_id, lang,
         |    unnest(list_slice(toks, 1, len(toks)-1)) AS w1,
         |    unnest(list_slice(toks, 2, len(toks))) AS w2
         |  FROM d WHERE len(toks) >= 2),
         |cb AS (
         |  SELECT w1, w2, COUNT(*) AS cb FROM pairs
         |  WHERE lang = 'en' GROUP BY 1, 2),
         |ch AS (
         |  SELECT w1, CAST(SUM(cb) AS BIGINT) AS ch FROM cb GROUP BY 1),
         |v AS (
         |  SELECT COUNT(DISTINCT w) AS vocab FROM (
         |    SELECT unnest(toks) AS w FROM d WHERE lang = 'en')),
         |pd AS (
         |  SELECT p.doc_id, COUNT(*) AS n_bigrams,
         |    CAST(SUM(((COALESCE(cb.cb, 0) + 1) * 1000000)
         |      // (COALESCE(ch.ch, 0) + v.vocab)) AS BIGINT)
         |      // COUNT(*) AS score_fp
         |  FROM pairs p
         |  LEFT JOIN cb ON p.w1 = cb.w1 AND p.w2 = cb.w2
         |  LEFT JOIN ch ON p.w1 = ch.w1
         |  CROSS JOIN v
         |  GROUP BY p.doc_id),
         |rk AS (
         |  SELECT *, ROW_NUMBER() OVER
         |    (ORDER BY score_fp DESC, doc_id ASC) AS rn FROM pd),
         |n AS (SELECT COUNT(*) AS n_docs FROM pd)
         |SELECT doc_id, n_bigrams, score_fp, rn,
         |  CASE ((rn - 1) * 3) // n_docs WHEN 0 THEN 'head'
         |    WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM rk CROSS JOIN n ORDER BY doc_id""".stripMargin,

    "q152_dsir_select" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, $sqlToks AS toks FROM documents),
         |feats AS (
         |  SELECT doc_id, source, unnest(toks ||
         |    list_transform(range(2, len(toks)+1),
         |      i_ -> toks[i_-1] || ' ' || toks[i_])) AS f
         |  FROM d),
         |hashed AS (
         |  SELECT doc_id, source,
         |    ${sqlPolyHash("f")} % 1024 AS b,
         |    source IN ('src0','src1','src2','src3') AS is_t
         |  FROM feats),
         |dist AS (
         |  SELECT b, COUNT(*) AS cr,
         |    COUNT(*) FILTER (WHERE is_t) AS ct
         |  FROM hashed GROUP BY 1),
         |tot AS (
         |  SELECT CAST(SUM(cr) AS BIGINT) AS tot_r,
         |    CAST(SUM(ct) AS BIGINT) AS tot_t FROM dist),
         |score AS (
         |  SELECT b, ((ct + 1) * 1000000) // (tot_t + 1024)
         |    - ((cr + 1) * 1000000) // (tot_r + 1024) AS diff_fp
         |  FROM dist CROSS JOIN tot)
         |SELECT h.doc_id, h.source, COUNT(*) AS n_feats,
         |  CAST(SUM(s.diff_fp) AS BIGINT) AS weight_fp
         |FROM hashed h JOIN score s USING (b)
         |GROUP BY 1, 2
         |ORDER BY weight_fp DESC, doc_id ASC LIMIT 100""".stripMargin
  )
}
