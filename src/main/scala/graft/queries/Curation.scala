package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Curation
import graft.sources.Catalog

/** Corpus-curation query surface (q70–q73): cross-document boilerplate
  * measurement, canonical-doc selection per near-dup cluster,
  * per-source token-budget sampling, and the composed curation
  * flagship. All four hash-match DuckDB oracles; the near-dup pieces
  * reuse q18/q19's exact-Jaccard ground truth (recall argument in
  * [[DedupQueries]]'s Scaladoc).
  */
object CurationQueries {

  private val K = 3
  private val MinDf = 5
  private val MaxBp = 0.10
  private val Budget = 800L
  private val stop = TextFunctions.langMarkers.head._2 // en markers

  private def docs(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-document boilerplate fraction per doc (CCNet-style gate
    // signal; within-doc repetition is q57).
    "q70_boilerplate_frac" -> ((s, dir) =>
      Curation.boilerplateStats(docs(s, dir), "doc_id", col("text"),
        k = K, minDf = MinDf)
        .orderBy(col("doc_id"))),

    // One canonical doc per near-dup component: best quality, doc-id
    // tiebreak.
    "q71_canonical_docs" -> ((s, dir) => {
      val d = docs(s, dir)
      val stats = TextFunctions.textStats(d, "doc_id", col("text"), stop)
      Curation.canonicalDocs(d, "doc_id", col("text"), stats, tau = 0.5)
        .orderBy(col("doc_id"))
    }),

    // Per-source token budget filled best-quality-first (running-total
    // prefix, budget 800 tokens/source).
    "q72_token_budget_sample" -> ((s, dir) => {
      val d = docs(s, dir)
      val stats = TextFunctions.textStats(d, "doc_id", col("text"), stop)
        .select(col("doc_id"), col("n_tokens"), col("quality"))
      val members = d.select(col("doc_id"), col("source")).join(stats, "doc_id")
      Curation.budgetSample(members, "doc_id", "source", Budget)
        .orderBy(col("source"), col("doc_id"))
    }),

    // Flagship composition: canonical-per-cluster → boilerplate gate →
    // per-source budget fill; emits the curated corpus rows.
    "q73_curation_pipeline" -> ((s, dir) =>
      Curation.curate(docs(s, dir), "doc_id", col("text"), "source",
        stop, tau = 0.5, k = K, minDf = MinDf, maxBoilerplate = MaxBp,
        budgetTokens = Budget)
        .orderBy(col("source"), col("doc_id")))
  )

  // ---- oracle SQL ----------------------------------------------------

  private val sqlToks =
    "list_filter(string_split(text, ' '), t_ -> t_ <> '')"
  private val enList = stop.map(w => s"'$w'").mkString("[", ", ", "]")

  /** q14's quality formula verbatim (bit-equal across engines — q14
    * hash-matches). Expects a relation exposing `toks`. */
  private val qualityExpr =
    s"""(CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.3
       |    + (1.0 - CAST(len(list_filter(toks, t_ -> list_contains($enList, t_))) AS DOUBLE)
       |        / CAST(len(toks) AS DOUBLE)) * 0.4
       |    + (CAST(least(len(toks), 100) AS DOUBLE) / 100.0) * 0.3""".stripMargin

  /** Distinct k=3 shingles per doc — the same construction as the
    * jaccard ground truth in [[DedupQueries.jaccardOracle]]. */
  private val shingleCte =
    """sh3 AS (
      |  SELECT DISTINCT doc_id, unnest(
      |    CASE WHEN len(tk) >= 3 THEN
      |      list_transform(range(1, len(tk) - 1),
      |        i_ -> tk[i_] || '_' || tk[i_+1] || '_' || tk[i_+2])
      |    ELSE CAST([] AS VARCHAR[]) END) AS shingle
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), t_ -> t_ <> '') AS tk
      |        FROM documents))""".stripMargin

  private val boilerplateCtes =
    s"""$shingleCte,
       |dict AS (
       |  SELECT shingle FROM sh3 GROUP BY shingle HAVING count(*) >= $MinDf),
       |per AS (
       |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |    CAST(count(d.shingle) AS BIGINT) AS n_common
       |  FROM sh3 s LEFT JOIN dict d USING (shingle) GROUP BY s.doc_id)""".stripMargin

  /** Components + quality + canonical rank, shared by q71/q73. */
  private val canonCtes =
    s"""pairs AS (${DedupQueries.jaccardOracle}),
       |edges AS (
       |  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
       |  UNION SELECT doc_id_b, doc_id_a FROM pairs),
       |cc(node, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.b, cc.label FROM cc JOIN edges e ON cc.node = e.a),
       |comp AS (SELECT node AS doc_id, MIN(label) AS component
       |         FROM cc GROUP BY node),
       |q AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    $qualityExpr AS quality
       |  FROM (SELECT doc_id, $sqlToks AS toks FROM documents)),
       |ranked AS (
       |  SELECT comp.doc_id, comp.component, q.quality, q.n_tokens,
       |    ROW_NUMBER() OVER (PARTITION BY comp.component
       |      ORDER BY q.quality DESC NULLS LAST, comp.doc_id) AS rn
       |  FROM comp JOIN q ON comp.doc_id = q.doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q70_boilerplate_frac" ->
      s"""WITH $boilerplateCtes
         |SELECT doc.doc_id,
         |  COALESCE(per.n_shingles, CAST(0 AS BIGINT)) AS n_shingles,
         |  COALESCE(per.n_common, CAST(0 AS BIGINT)) AS n_common,
         |  CAST(per.n_common AS DOUBLE) / CAST(per.n_shingles AS DOUBLE)
         |    AS boilerplate_frac
         |FROM documents doc LEFT JOIN per ON doc.doc_id = per.doc_id
         |ORDER BY doc.doc_id""".stripMargin,

    "q71_canonical_docs" ->
      s"""WITH RECURSIVE $canonCtes
         |SELECT doc_id, component, quality, rn = 1 AS is_kept
         |FROM ranked ORDER BY doc_id""".stripMargin,

    "q72_token_budget_sample" ->
      s"""WITH q AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    $qualityExpr AS quality
         |  FROM (SELECT doc_id, $sqlToks AS toks FROM documents)),
         |w AS (
         |  SELECT d.source, q.doc_id, q.n_tokens, q.quality,
         |    CAST(SUM(q.n_tokens) OVER (PARTITION BY d.source
         |      ORDER BY q.quality DESC NULLS LAST, q.doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id)
         |SELECT source, doc_id, n_tokens, quality, cum_tokens,
         |  cum_tokens <= $Budget AS is_kept
         |FROM w ORDER BY source, doc_id""".stripMargin,

    "q73_curation_pipeline" ->
      s"""WITH RECURSIVE $canonCtes,
         |$boilerplateCtes,
         |gated AS (
         |  SELECT doc.doc_id FROM documents doc
         |  LEFT JOIN per ON doc.doc_id = per.doc_id
         |  WHERE COALESCE(CAST(per.n_common AS DOUBLE)
         |          / CAST(per.n_shingles AS DOUBLE), 0.0) <= $MaxBp),
         |members AS (
         |  SELECT d.source, r.doc_id, r.n_tokens, r.quality
         |  FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
         |  WHERE r.rn = 1
         |    AND r.doc_id IN (SELECT doc_id FROM gated)),
         |w AS (
         |  SELECT source, doc_id, n_tokens, quality,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY source
         |      ORDER BY quality DESC NULLS LAST, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM members)
         |SELECT source, doc_id, n_tokens, quality, cum_tokens
         |FROM w WHERE cum_tokens <= $Budget
         |ORDER BY source, doc_id""".stripMargin
  )
}
