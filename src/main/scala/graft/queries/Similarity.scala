package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Catalog

/** Similarity-search surface over the `embeddings` table (north-star
  * scope): exact k-NN baseline, hyperplane-LSH ANN, cosine near-dup
  * pairs. All scores are exact fixed-point integers (Similarity.scala)
  * so the DuckDB oracle replays the identical algorithm bit-for-bit —
  * including the LSH bucketing, which is pure integer math.
  */
object SimilarityQueries {

  private val K = 5
  private val LshK = 3
  private val Bits = 8
  private val Tables = 16
  private val PqM = 8      // subspaces (64 dims → 8×8)
  private val PqK = 16     // centroids per subspace codebook
  private val PqIters = 2  // Lloyd refinement rounds
  private val TauFp = 45000000000000L // cosine 0.45 at 1e7² fixed point
  private val TauLshFp = 95000000000000L // cosine 0.95 for the LSH path

  /** Corpus ∪ planted near-duplicates: one copy (id + 1 000 000) per
    * vec_id % 4 == 0 row with coordinate (vec_id % 64) scaled by
    * 15/16, all in double precision (exact — replayed identically by
    * the oracle SQL). */
  private def augmented(s: SparkSession, dir: String): DataFrame = {
    val base = emb(s, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val planted = emb(s, dir)
      .filter(col("vec_id") % 4 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === pmod(col("vec_id"), lit(64)), x.cast("double") * 0.9375)
            .otherwise(x.cast("double"))).as("embedding"))
    base.unionByName(planted)
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "embeddings")

  private def queriesSide(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") % 50 === 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact-recall baseline: brute-force top-5 by integer dot product,
    // query side broadcast.
    "q20_knn_brute_force" -> ((s, dir) =>
      Similarity.bruteForceTopK(queriesSide(s, dir), emb(s, dir),
        "vec_id", "embedding", K)
        .orderBy(col("query_id"), col("rn"))),

    // Hyperplane-LSH ANN (8 bits × 16 tables, exact rerank to top-3).
    "q21_ann_lsh" -> ((s, dir) =>
      Similarity.lshTopK(queriesSide(s, dir), emb(s, dir),
        "vec_id", "embedding", LshK, Bits, Tables)
        .orderBy(col("query_id"), col("rn"))),

    // Embedding-cosine near-dup pairs at cosine ≥ 0.45 — exhaustive,
    // via the distributed block self-join (no driver collect; see
    // Similarity.nearDupPairs scaladoc for why candidate pruning is
    // unsound at this margin-less threshold).
    "q22_embedding_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(emb(s, dir), "vec_id", "embedding", TauFp)
        .orderBy(col("id_a"), col("id_b"))),

    // LSH-candidates + exact-verify near-dup in the regime the
    // operator exists for: HIGH-cosine duplicates. The base corpus has
    // no near-dup pairs (smooth tail, max pair cosine ≈ 0.62), so the
    // query plants them deterministically: every vec_id % 4 == 0 row
    // gets a copy (id + 1e6) with ONE coordinate scaled by 15/16 —
    // both engines compute the perturbation in exact double arithmetic
    // (float → double is exact; ×0.9375 adds 4 mantissa bits). The
    // corpus is unit-norm with max |coordinate| 0.58 (measured), so
    // every planted pair has dot ≥ 1 − 0.0625·0.58² ≈ 0.979·10¹⁴
    // while every other pair stays ≤ ~0.7·10¹⁴: tau 0.95 separates
    // with wide margins. At 8 bits × 16 tables the per-pair miss at
    // cosine 0.985 is (1 − 0.945⁸)¹⁶ ≈ 10⁻⁷ and buckets are selective
    // (~n/256 rows each): the prune is real AND recall is exhaustive.
    "q44_embedding_neardup_lsh" -> ((s, dir) =>
      Similarity.nearDupPairsLsh(augmented(s, dir), "vec_id", "embedding",
        TauLshFp, bits = 8, tables = 16)
        .orderBy(col("id_a"), col("id_b"))),

    // Brute-force k-NN in the int8-QUANTIZED domain — the 4×-smaller
    // representation a 100 TB sweep actually moves; quantization is
    // exact floor/clamp arithmetic so the oracle replays scores
    // bit-for-bit. Recall vs full precision pinned in CorpusOpsSpec.
    "q56_quantized_knn" -> ((s, dir) =>
      Similarity.bruteForceTopKQuantized(queriesSide(s, dir), emb(s, dir),
        "vec_id", "embedding", K)
        .orderBy(col("query_id"), col("rn"))),

    // IVF cluster-pruned ANN under FULL probing (nProbe = nCells):
    // every inverted list is scanned, so the exact rerank provably
    // equals the brute-force top-k and the query is fully
    // oracle-checkable (q20-style SQL) — closing the round-1
    // rows-only hole while exercising the whole IVF path (centroid
    // build, cell assignment, probe, rerank). Pruned probing
    // (nProbe < nCells) is engine-internal by nature; its recall is
    // pinned by CorpusOpsSpec against the brute-force baseline.
    "q30_ann_ivf" -> ((s, dir) =>
      graft.operators.IvfIndex.topK(queriesSide(s, dir), emb(s, dir),
        "vec_id", "embedding", k = LshK, nCells = 16, nProbe = 16)
        .orderBy(col("query_id"), col("rn"))),

    // Product-quantization ADC scan (PqIndex): the corpus moves as
    // M=8 code bytes per vector (32× compression — the 100 TB
    // memory-bandwidth lever), queries stay exact and score via M×K
    // lookup tables. Every step is deterministic integer arithmetic
    // (seeded subspace Lloyd, strict-< tie-break, truncating mean),
    // so the oracle replays the ENTIRE fit→encode→ADC pipeline —
    // the approximation itself is hash-verified, not just its recall.
    "q168_pq_adc_knn" -> ((s, dir) => {
      val cb = graft.operators.PqIndex.fit(emb(s, dir), "vec_id",
        "embedding", m = PqM, k = PqK, iters = PqIters)
      graft.operators.PqIndex.adcTopK(queriesSide(s, dir), emb(s, dir),
        "vec_id", "embedding", cb, k = K)
        .orderBy(col("query_id"), col("rn"))
    })
  )

  /** DuckDB fragment: fixed-point vectors of the embeddings table. */
  private val sqlFixed =
    """e AS (SELECT vec_id,
      |  list_transform(embedding,
      |    x_ -> CAST(floor(CAST(x_ AS DOUBLE) * 10000000.0) AS BIGINT)) AS v
      |  FROM embeddings)""".stripMargin

  private def sqlDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), i_ -> $a[i_] * $b[i_])) AS BIGINT)"

  val oracleSql: Map[String, String] = Map(
    "q20_knn_brute_force" ->
      s"""WITH $sqlFixed,
         |q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
         |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${sqlDot("q.v", "c.v")} AS dot_fp
         |  FROM q JOIN e c ON q.vec_id <> c.vec_id)
         |SELECT query_id, neighbor_id, dot_fp,
         |  CAST(ROW_NUMBER() OVER w AS INT) AS rn
         |FROM s
         |WINDOW w AS (PARTITION BY query_id ORDER BY dot_fp DESC, neighbor_id ASC)
         |QUALIFY ROW_NUMBER() OVER w <= $K
         |ORDER BY query_id, rn""".stripMargin,

    "q21_ann_lsh" ->
      s"""WITH $sqlFixed,
         |planes AS (
         |  SELECT t, b, t * $Bits + b AS j
         |  FROM (SELECT unnest(range($Tables)) AS t)
         |  CROSS JOIN (SELECT unnest(range($Bits)) AS b)),
         |proj AS (
         |  SELECT e.vec_id, p.t, p.b,
         |    CAST(list_sum(list_transform(range(1, 65), i_ ->
         |      e.v[i_] * ((((CAST(1103515245 AS BIGINT) * (p.j * 64 + i_) + 12345)
         |                   % 2147483648) >> 10) % 2 * 2 - 1))) AS BIGINT) AS proj
         |  FROM e CROSS JOIN planes p),
         |buck AS (
         |  SELECT vec_id, t,
         |    CAST(SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << b)
         |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
         |  FROM proj GROUP BY vec_id, t),
         |cand AS (
         |  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
         |  FROM buck qb JOIN buck cb ON qb.t = cb.t AND qb.bucket = cb.bucket
         |  WHERE qb.vec_id % 50 = 0 AND qb.vec_id <> cb.vec_id),
         |scored AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    ${sqlDot("q.v", "c.v")} AS dot_fp
         |  FROM cand
         |  JOIN e q ON cand.query_id = q.vec_id
         |  JOIN e c ON cand.neighbor_id = c.vec_id)
         |SELECT query_id, neighbor_id, dot_fp,
         |  CAST(ROW_NUMBER() OVER w AS INT) AS rn
         |FROM scored
         |WINDOW w AS (PARTITION BY query_id ORDER BY dot_fp DESC, neighbor_id ASC)
         |QUALIFY ROW_NUMBER() OVER w <= $LshK
         |ORDER BY query_id, rn""".stripMargin,

    "q56_quantized_knn" ->
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x_ -> GREATEST(CAST(-127 AS BIGINT),
         |    LEAST(CAST(127 AS BIGINT),
         |      CAST(floor(CAST(x_ AS DOUBLE) * 127.0) AS BIGINT)))) AS v
         |  FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
         |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${sqlDot("q.v", "c.v")} AS dot_fp
         |  FROM q JOIN e c ON q.vec_id <> c.vec_id)
         |SELECT query_id, neighbor_id, dot_fp,
         |  CAST(ROW_NUMBER() OVER w AS INT) AS rn
         |FROM s
         |WINDOW w AS (PARTITION BY query_id ORDER BY dot_fp DESC, neighbor_id ASC)
         |QUALIFY ROW_NUMBER() OVER w <= $K
         |ORDER BY query_id, rn""".stripMargin,

    // full probing scans every cell ⇒ IVF top-k = exhaustive top-k
    "q30_ann_ivf" ->
      s"""WITH $sqlFixed,
         |q AS (SELECT * FROM e WHERE vec_id % 50 = 0),
         |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${sqlDot("q.v", "c.v")} AS dot_fp
         |  FROM q JOIN e c ON q.vec_id <> c.vec_id)
         |SELECT query_id, neighbor_id, dot_fp,
         |  CAST(ROW_NUMBER() OVER w AS INT) AS rn
         |FROM s
         |WINDOW w AS (PARTITION BY query_id ORDER BY dot_fp DESC, neighbor_id ASC)
         |QUALIFY ROW_NUMBER() OVER w <= $LshK
         |ORDER BY query_id, rn""".stripMargin,

    "q22_embedding_neardup" ->
      s"""WITH $sqlFixed
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${sqlDot("a.v", "b.v")} AS dot_fp
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ${sqlDot("a.v", "b.v")} >= $TauFp
         |ORDER BY id_a, id_b""".stripMargin,

    // exhaustive ground truth over the SAME augmented corpus the
    // Spark query builds (identical double-exact perturbation); the
    // planted/background similarity margins make LSH candidates ⊇
    // true pairs (see the query comment), and the exact verify removes
    // all false positives, so the sub-quadratic plan reproduces this
    "q44_embedding_neardup_lsh" ->
      s"""WITH aug AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x_ -> CAST(x_ AS DOUBLE)) AS emb
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_transform(range(1, 65), i_ ->
         |      CASE WHEN i_ - 1 = vec_id % 64
         |        THEN CAST(embedding[i_] AS DOUBLE) * 0.9375
         |        ELSE CAST(embedding[i_] AS DOUBLE) END)
         |  FROM embeddings WHERE vec_id % 4 = 0),
         |e AS (SELECT vec_id,
         |  list_transform(emb, x_ -> CAST(floor(x_ * 10000000.0) AS BIGINT)) AS v
         |  FROM aug)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${sqlDot("a.v", "b.v")} AS dot_fp
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ${sqlDot("a.v", "b.v")} >= $TauLshFp
         |ORDER BY id_a, id_b""".stripMargin,

    // full PQ replay: seeded subspace Lloyd (2 rounds), encode, LUT,
    // ADC top-k — every step the same integer arithmetic the engine
    // runs (truncating // mean, strict-< smallest-kk tie-break)
    "q168_pq_adc_knn" -> {
      def assign(prev: String, out: String): String =
        s"""$out AS MATERIALIZED (
           |  SELECT vec_id, m, kk FROM (
           |    SELECT s.vec_id, s.m, c.kk,
           |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
           |        ORDER BY SUM((s.x - c.x) * (s.x - c.x)), c.kk) AS rn
           |    FROM sub s JOIN $prev c ON c.m = s.m AND c.j = s.j
           |    GROUP BY s.vec_id, s.m, c.kk)
           |  WHERE rn = 1)""".stripMargin
      def update(a: String, prev: String, out: String): String =
        s"""$out AS MATERIALIZED (
           |  SELECT c.m, c.kk, c.j, COALESCE(u.cx, c.x) AS x
           |  FROM $prev c LEFT JOIN (
           |    SELECT a.m, a.kk, s.j,
           |      CAST(SUM(s.x) // COUNT(*) AS BIGINT) AS cx
           |    FROM $a a JOIN sub s
           |      ON s.vec_id = a.vec_id AND s.m = a.m
           |    GROUP BY a.m, a.kk, s.j) u
           |  ON u.m = c.m AND u.kk = c.kk AND u.j = c.j)""".stripMargin
      s"""WITH $sqlFixed,
         |sub AS MATERIALIZED (
         |  SELECT e.vec_id, mm.m, jj.j, e.v[mm.m * 8 + jj.j] AS x
         |  FROM e
         |  CROSS JOIN (SELECT unnest(range($PqM)) AS m) mm
         |  CROSS JOIN (SELECT unnest(range(1, 9)) AS j) jj),
         |c0 AS MATERIALIZED (
         |  SELECT m, kk, j, x FROM (
         |    SELECT sub.*, ROW_NUMBER() OVER (PARTITION BY m, j
         |      ORDER BY vec_id) - 1 AS kk
         |    FROM sub)
         |  WHERE kk < $PqK),
         |${assign("c0", "a1")},
         |${update("a1", "c0", "c1")},
         |${assign("c1", "a2")},
         |${update("a2", "c1", "c2")},
         |${assign("c2", "codes")},
         |q AS (SELECT * FROM sub WHERE vec_id % 50 = 0),
         |lut AS MATERIALIZED (
         |  SELECT q.vec_id AS query_id, c.m, c.kk,
         |    CAST(SUM(q.x * c.x) AS BIGINT) AS d
         |  FROM q JOIN c2 c ON c.m = q.m AND c.j = q.j
         |  GROUP BY q.vec_id, c.m, c.kk),
         |score AS MATERIALIZED (
         |  SELECT l.query_id, a.vec_id AS neighbor_id,
         |    CAST(SUM(l.d) AS BIGINT) AS dot_fp
         |  FROM codes a JOIN lut l ON l.m = a.m AND l.kk = a.kk
         |  WHERE a.vec_id <> l.query_id
         |  GROUP BY l.query_id, a.vec_id)
         |SELECT query_id, neighbor_id, dot_fp,
         |  CAST(ROW_NUMBER() OVER w AS INT) AS rn
         |FROM score
         |WINDOW w AS (PARTITION BY query_id
         |  ORDER BY dot_fp DESC, neighbor_id ASC)
         |QUALIFY ROW_NUMBER() OVER w <= $K
         |ORDER BY query_id, rn""".stripMargin
    }
  )
}
