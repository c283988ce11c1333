package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.FuzzyDedup
import graft.sources.Catalog

/** Deduplication surface over the `documents` corpus (north-star
  * scope): exact fingerprint dedup, inverted-index n-gram Jaccard,
  * MinHash+LSH with exact verification.
  *
  * Oracle notes: q17/q18 share one ground-truth SQL — all pairs with
  * exact 3-gram Jaccard ≥ 0.5. For q18 (MinHash-LSH) that is a RECALL
  * assertion: with 16 bands × 4 rows, a pair at J=0.9 (the corpus's
  * planted near-dups; background pairs sit ≤ 0.07) is missed with
  * probability (1−0.9⁴)¹⁶ ≈ 4e-8, so LSH candidates ⊇ true pairs and
  * the verified output equals the exact answer.
  */
object DedupQueries {

  private val Tau = 0.5

  private def docs(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: content-fingerprint groups (hash-groupBy; at scale
    // this is the first, cheapest dedup pass — one shuffle on a long).
    "q17_exact_dedup_groups" -> ((s, dir) =>
      TextFunctions.fingerprints(docs(s, dir), "doc_id", col("text"))
        .groupBy(col("fingerprint"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_doc"))
        .orderBy(col("fingerprint"))),

    // Exact n-gram Jaccard near-dup pairs via the shingle inverted
    // index (no candidate pruning — the correctness baseline).
    "q18_ngram_jaccard_pairs" -> ((s, dir) =>
      FuzzyDedup.jaccardPairs(
        FuzzyDedup.shingles(docs(s, dir), "doc_id", col("text"), k = 3),
        "doc_id")
        .filter(col("jaccard") >= Tau)
        .orderBy(col("doc_id_a"), col("doc_id_b"))),

    // MinHash(64) + LSH(16 bands × 4) + exact verification — the
    // sub-quadratic scale path; output identical to q18 by recall.
    "q19_minhash_lsh_dedup" -> ((s, dir) =>
      FuzzyDedup.minhashDedupPairs(docs(s, dir), "doc_id", col("text"),
        tau = Tau, k = 3, numHashes = 64, bandRows = 4)
        .orderBy(col("doc_id_a"), col("doc_id_b"))),

    // SimHash Hamming pairs, pigeonhole-banded (exact recall) — the
    // bit-level near-dup complement to shingle Jaccard.
    "q43_simhash_hamming_pairs" -> ((s, dir) =>
      FuzzyDedup.simhashPairs(docs(s, dir), "doc_id", col("text"),
        bits = 32, maxHamming = 2, bandBits = 8)
        .orderBy(col("doc_id_a"), col("doc_id_b"))),

    // Duplicate-cluster assignment: connected components over the
    // verified near-dup pair graph (min-label propagation, one
    // join+agg shuffle per round, rounds = cluster diameter). Every
    // document maps to the minimum doc_id it is transitively near-dup
    // with — the canonical representative a dedup pipeline keeps.
    "q45_neardup_components" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = FuzzyDedup.minhashDedupPairs(d, "doc_id", col("text"),
        tau = Tau, k = 3, numHashes = 64, bandRows = 4)
      graft.operators.Components.connectedComponents(
        d.select(col("doc_id")), "doc_id",
        pairs, "doc_id_a", "doc_id_b")
        .select(col("node").as("doc_id"), col("component"))
        .orderBy(col("doc_id"))
    })
  )

  /** Ground truth: exact 3-gram Jaccard pairs at tau (shared by q18 and
    * q19 — see the recall note in the object Scaladoc). */
  private[queries] val jaccardOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t_ -> t_ <> '') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(tk) >= 3 THEN
       |      list_transform(range(1, len(tk) - 1),
       |        i_ -> tk[i_] || '_' || tk[i_+1] || '_' || tk[i_+2])
       |    ELSE CAST([] AS VARCHAR[]) END) AS shingle
       |  FROM toks),
       |card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (
       |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_id_a, doc_id_b, inter, ca.n AS n_a, cb.n AS n_b,
       |  CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
       |FROM p
       |JOIN card ca ON doc_id_a = ca.doc_id
       |JOIN card cb ON doc_id_b = cb.doc_id
       |WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) >= $Tau
       |ORDER BY doc_id_a, doc_id_b""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q17_exact_dedup_groups" ->
      s"""SELECT fp AS fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS rep_doc
         |FROM (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, length(text)+1),
         |      i_ -> CAST(ascii(text[i_]) AS BIGINT))),
         |    (h_, c_) -> (h_ * 131 + c_) % 1000000007) AS fp
         |  FROM documents)
         |GROUP BY fp ORDER BY fingerprint""".stripMargin,
    "q18_ngram_jaccard_pairs" -> jaccardOracle,
    "q19_minhash_lsh_dedup" -> jaccardOracle,

    // brute-force ground truth; the banded Spark plan matches exactly
    // because Hamming ≤ 2 < 4 bands guarantees a shared band chunk
    "q43_simhash_hamming_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t_ -> t_ <> '')) AS token FROM documents),
        |h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(token)+1),
        |      i_ -> CAST(ascii(token[i_]) AS BIGINT))),
        |    (h_, c_) -> (h_ * 131 + c_) % 1000000007) AS h FROM tok),
        |bits AS (
        |  SELECT doc_id, j,
        |    SUM((((CAST(1103515245 AS BIGINT) * (j + 1) + 12345) % 1000000007
        |          * h
        |          + (CAST(22695477 AS BIGINT) * (j + 1) + 1) % 1000000007)
        |         % 1000000007) % 2 * 2 - 1) AS s
        |  FROM h CROSS JOIN (SELECT unnest(range(32)) AS j)
        |  GROUP BY doc_id, j),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j)
        |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,

    // ground truth: exact-Jaccard pairs (same as q18/q19), then
    // transitive min-label closure via a recursive CTE — every doc's
    // component is the minimum doc_id reachable through the pair graph
    "q45_neardup_components" ->
      s"""WITH RECURSIVE pairs AS ($jaccardOracle),
         |edges AS (
         |  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
         |  UNION SELECT doc_id_b, doc_id_a FROM pairs),
         |cc(node, label) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, cc.label FROM cc JOIN edges e ON cc.node = e.a)
         |SELECT node AS doc_id, MIN(label) AS component
         |FROM cc GROUP BY node ORDER BY doc_id""".stripMargin
  )
}
