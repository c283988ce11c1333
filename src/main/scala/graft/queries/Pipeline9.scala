package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.FuzzyDedup
import graft.sources.Catalog

/** Round-5 block (q108–q112): five more training-data-pipeline
  * operators, all exactly oracle-checkable (fixed-point integers, no
  * floats in the hashed output):
  *
  *  - q108 character-diversity quality signal — per-doc Simpson index
  *    (1 − Σp²) and top-character fraction in 1e6 fixed point; the
  *    log-free stand-in for character-entropy gibberish filters.
  *  - q109 per-doc LM score — mean bigram conditional probability
  *    under the corpus-derived count LM of q95; the log-free stand-in
  *    for perplexity filtering.
  *  - q110 incremental dedup — classify an incoming delta batch
  *    against the base corpus: exact duplicate (fingerprint match),
  *    near-duplicate (exact 3-gram Jaccard ≥ ½ vs ANY base doc via
  *    the inverted index, integer cross-multiply 3·|∩| ≥ |A|+|B|),
  *    else unique. The shape every nightly crawl ingest runs.
  *  - q111 deterministic stratified sampling — keep a doc iff the
  *    first 8 hex chars of md5(doc_id) are lexicographically below a
  *    per-stratum threshold; reproducible across engines, languages
  *    and reruns (no RNG state), and embarrassingly map-side.
  *  - q112 nucleus (top-p) selection — per source, order docs by an
  *    integer type-token-ratio score and keep the prefix holding
  *    ≤ 80% of the source's tokens (cumulative window, ROWS-equal
  *    frame via a unique sort key).
  *
  * Scale notes: q108/q109's heavy relations (per-doc chars, corpus
  * bigrams) grow linearly and aggregate with map-side combine; q110
  * touches only delta×base candidate pairs that share a shingle —
  * never the full cross product; q111 is a pure filter (no shuffle at
  * all); q112 shuffles once on source and keeps O(docs-per-source)
  * window state.
  */
object Pipeline9 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  private val Scale = 1000000L

  // q110 — delta batch predicate and Jaccard threshold (τ = 1/2 as an
  // exact integer law: J ≥ ½  ⇔  3·inter ≥ |A|+|B|)
  private val DeltaMod = 7
  private val ShingleK = 3

  // q111 — per-stratum md5-prefix thresholds, keyed by source number
  // mod 4 (src0..src19 → four sampling rates: 1/16, 1/4, 1/2, 3/4)
  private val RateThresholds =
    Seq("10000000", "40000000", "80000000", "c0000000")

  // q112 — keep the top-scoring prefix holding ≤ 80% of source tokens
  private val TopPNum = 8L
  private val TopPDen = 10L

  // q114 — repeated-span gram width
  private val SpanK = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-doc character histogram → Simpson diversity. The histogram
    // is doc-local, so it never needs a shuffle: one mapPartitions
    // kernel folds each document's code points into a local map and
    // emits a single stats row per doc (same hot-kernel shape as
    // minhash/simhash — an exploded char relation measured ~6× slower
    // at sf0.1). Docs with empty text emit no row, matching the
    // unnest-of-empty-list oracle.
    "q108_char_diversity" -> ((s, dir) => {
      import s.implicits._
      val stats = docs(s, dir)
        .select(col("doc_id").cast("long"), col("text").cast("string"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, txt) =>
            val t = if (txt == null) "" else txt
            val m = new java.util.HashMap[Integer, Long]()
            var i = 0
            while (i < t.length) {
              val cp = t.codePointAt(i)
              m.merge(cp, 1L, (a, b) => a + b)
              i += Character.charCount(cp)
            }
            var n = 0L; var maxc = 0L; var ss = 0L
            val vs = m.values().iterator()
            while (vs.hasNext) {
              val c = vs.next(); n += c; ss += c * c
              if (c > maxc) maxc = c
            }
            (id, n, m.size.toLong, maxc, ss)
          }
        }.toDF("doc_id", "n_ch", "distinct_ch", "maxc", "sumsq")
      stats.filter(col("n_ch") > 0)
        .select(col("doc_id"), col("n_ch"), col("distinct_ch"),
          expr(s"(maxc * $Scale) div n_ch").as("top_fp"),
          expr(s"((n_ch * n_ch - sumsq) * $Scale) div (n_ch * n_ch)")
            .as("simpson_fp"))
        .orderBy(col("doc_id"))
    }),

    // Mean bigram conditional probability per doc under the corpus
    // count-LM. One linear bigram relation feeds both the LM counts
    // and the per-doc multiplicities; the scoring join is a standard
    // shuffle equi-join on (w1,w2) — no driver-side LM, so the
    // vocabulary can be arbitrarily large.
    "q109_bigram_doc_score" -> ((s, dir) => {
      val dp = docs(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .withColumn("p", explode(expr(
          "transform(sequence(1, size(toks)-1)," +
            " i -> struct(toks[i-1] AS w1, toks[i] AS w2))")))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      val docPairs = dp.groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // LM counts derived from the deduped per-doc relation (sum of
      // multiplicities), not a second pass over the corpus
      val cnt = docPairs.groupBy(col("w1"), col("w2"))
        .agg(sum(col("m")).as("cnt"))
      val heads = cnt.groupBy(col("w1")).agg(sum(col("cnt")).as("total"))
      val out = docPairs
        .join(cnt, Seq("w1", "w2"))
        .join(heads, Seq("w1"))
        .withColumn("prob_fp", expr(s"(cnt * $Scale) div total"))
        .groupBy(col("doc_id"))
        .agg(sum(col("m")).as("n_bigrams"),
          expr("sum(m * prob_fp)").as("sp"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("sp div n_bigrams").as("score_fp"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true)
      docPairs.unpersist()
      out
    }),

    // Incremental dedup: delta batch (doc_id ≡ 0 mod 7) vs base.
    // Exact stage is a fingerprint semi-join; near stage touches only
    // delta×base pairs sharing ≥1 shingle (inverted index), with the
    // τ=½ test as a pure integer inequality. At 100 TB the base-side
    // shingle relation is the big one — it arrives pre-bucketed from
    // the previous ingest in a real deployment; nothing here is
    // quadratic in either side.
    "q110_incremental_dedup" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val delta = d.filter(col("doc_id") % DeltaMod === 0)
      val base = d.filter(col("doc_id") % DeltaMod =!= 0)
      val baseFp = base.select(
        TextFunctions.fingerprint(col("text")).as("fp")).distinct()
      val exact = delta
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .join(baseFp, Seq("fp"), "left_semi")
        .select(col("doc_id"), lit(true).as("is_exact"))
      val sh = FuzzyDedup.shingles(d, "doc_id", col("text"), k = ShingleK)
      val card = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = sh.filter(col("doc_id") % DeltaMod === 0)
        .toDF("id_a", "shingle")
      val b = sh.filter(col("doc_id") % DeltaMod =!= 0)
        .toDF("id_b", "shingle")
      val near = a.join(b, Seq("shingle"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("inter"))
        .join(card.toDF("id_a", "n_a"), "id_a")
        .join(card.toDF("id_b", "n_b"), "id_b")
        .filter(lit(3) * col("inter") >= col("n_a") + col("n_b"))
        .groupBy(col("id_a").as("doc_id"))
        .agg(count(lit(1)).as("n_near"))
      val out = delta.select(col("doc_id"))
        .join(exact, Seq("doc_id"), "left")
        .join(near, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("is_exact"), lit(false)).as("is_exact"),
          coalesce(col("n_near"), lit(0L)).as("n_near"))
        .withColumn("status",
          when(col("is_exact"), "exact_dup")
            .when(col("n_near") > 0, "near_dup")
            .otherwise("unique"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true)
      sh.unpersist()
      out
    }),

    // Deterministic md5-threshold sampling: a pure map-side filter —
    // no shuffle, no RNG state, identical sample on any engine or
    // rerun, and per-stratum rates changeable without re-hashing.
    "q111_hash_stratified_sample" -> ((s, dir) => {
      val n = regexp_extract(col("source"), "src(\\d+)", 1).cast("int")
      val thr = RateThresholds.zipWithIndex.foldLeft(lit(null).cast("string")) {
        case (acc, (hex, i)) => when(n % 4 === i, lit(hex)).otherwise(acc)
      }
      docs(s, dir)
        .withColumn("md5_8",
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8))
        .filter(col("md5_8") < thr)
        .select(col("doc_id"), col("source"), col("md5_8"))
        .orderBy(col("doc_id"))
    }),

    // Repeated-SPAN detection (the span-structure signal behind
    // substring-level training-data dedup): per doc, the longest
    // contiguous run of 8-gram positions whose gram also occurs in
    // some OTHER doc. Position-aware grams are linear in corpus
    // tokens; doc-frequency comes from the distinct (doc,gram)
    // projection of the same relation (one persist, two consumers);
    // the run length is a per-doc gaps-and-islands window — bounded
    // state per doc, no cross-doc pairs ever materialize.
    "q114_repeated_span" -> ((s, dir) => {
      val grams = docs(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= SpanK)
        .withColumn("g", explode(expr(
          s"transform(sequence(1, size(toks) - ${SpanK - 1})," +
            s" i -> struct(i AS pos, array_join(slice(toks, i, $SpanK), '_') AS gram))")))
        .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df_ = grams.select(col("doc_id"), col("gram")).distinct()
        .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      val shared = grams.join(df_, Seq("gram"))
        .withColumn("is_shared", col("df") >= 2)
      val wPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val runs = shared.filter(col("is_shared"))
        .withColumn("grp", col("pos") - row_number().over(wPos))
        .groupBy(col("doc_id"), col("grp"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("doc_id"))
        .agg(max(col("run_len")).as("max_run"),
          sum(col("run_len")).as("n_shared_pos"))
      val out = grams.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_positions"))
        .join(runs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_positions"),
          coalesce(col("n_shared_pos"), lit(0L)).as("n_shared_pos"),
          coalesce(col("max_run"), lit(0L)).as("max_run"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true)
      grams.unpersist()
      out
    }),

    // Nucleus (top-p) selection: one shuffle on source; the running
    // sum is bounded window state per stratum. The (score, doc_id)
    // sort key is unique, so the default RANGE frame equals ROWS on
    // both engines.
    "q112_nucleus_topp" -> ((s, dir) => {
      val scored = docs(s, dir)
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_uniq", size(array_distinct(col("toks"))).cast("long"))
        .withColumn("score_fp",
          when(col("n_tokens") > 0,
            expr(s"(n_uniq * $Scale) div n_tokens")).otherwise(lit(-1L)))
        .drop("toks")
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score_fp").desc, col("doc_id").asc)
      scored
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .withColumn("total_tokens",
          sum(col("n_tokens")).over(Window.partitionBy(col("source"))))
        .withColumn("kept",
          col("cum_tokens") * TopPDen <= col("total_tokens") * TopPNum)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("kept"), 1)).as("n_kept"),
          sum(col("n_tokens")).as("tokens_total"),
          coalesce(sum(when(col("kept"), col("n_tokens"))), lit(0L))
            .as("tokens_kept"))
        .orderBy(col("source"))
    })
  )

  // ---------------------------------------------------------------
  // DuckDB oracles
  // ---------------------------------------------------------------

  private val sqlToks =
    "list_filter(string_split(text, ' '), t_ -> t_ <> '')"

  /** DuckDB fragment: portable polynomial hash of a string expr
    * (mirrors TextFunctions.polyHash). */
  private def sqlPolyHash(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($s)+1), i_ -> CAST(ascii($s[i_]) AS BIGINT))), " +
      s"(h_, c_) -> (h_ * 131 + c_) % 1000000007)"

  private val sqlShingles3 =
    s"""SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(tk) >= 3 THEN
       |      list_transform(range(1, len(tk) - 1),
       |        i_ -> tk[i_] || '_' || tk[i_+1] || '_' || tk[i_+2])
       |    ELSE CAST([] AS VARCHAR[]) END) AS shingle
       |  FROM tk0""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q108_char_diversity" ->
      s"""WITH ch AS (
         |  SELECT doc_id, unnest(list_transform(
         |    range(1, length(text)+1), i_ -> text[i_])) AS ch
         |  FROM documents),
         |c AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
         |a AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ch,
         |    COUNT(*) AS distinct_ch, CAST(MAX(c) AS BIGINT) AS maxc,
         |    CAST(SUM(c * c) AS BIGINT) AS sumsq
         |  FROM c GROUP BY doc_id)
         |SELECT doc_id, n_ch, distinct_ch,
         |  (maxc * $Scale) // n_ch AS top_fp,
         |  ((n_ch * n_ch - sumsq) * $Scale) // (n_ch * n_ch) AS simpson_fp
         |FROM a ORDER BY doc_id""".stripMargin,

    "q109_bigram_doc_score" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS toks FROM documents),
         |dp AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |    i_ -> {'w1': toks[i_], 'w2': toks[i_+1]})) AS p
         |  FROM tk WHERE len(toks) >= 2),
         |pairs AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM dp),
         |doc_pairs AS (
         |  SELECT doc_id, w1, w2, COUNT(*) AS m
         |  FROM pairs GROUP BY 1, 2, 3),
         |cnt AS (SELECT w1, w2, CAST(SUM(m) AS BIGINT) AS cnt
         |        FROM doc_pairs GROUP BY 1, 2),
         |heads AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS total
         |          FROM cnt GROUP BY 1)
         |SELECT d.doc_id, CAST(SUM(d.m) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(d.m * ((c.cnt * $Scale) // h.total)) AS BIGINT)
         |    // CAST(SUM(d.m) AS BIGINT) AS score_fp
         |FROM doc_pairs d
         |JOIN cnt c ON d.w1 = c.w1 AND d.w2 = c.w2
         |JOIN heads h ON d.w1 = h.w1
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    "q110_incremental_dedup" ->
      s"""WITH fp AS (
         |  SELECT doc_id, ${sqlPolyHash("text")} AS fp FROM documents),
         |exact AS (
         |  SELECT d.doc_id, TRUE AS is_exact FROM fp d
         |  WHERE d.doc_id % $DeltaMod = 0 AND EXISTS (
         |    SELECT 1 FROM fp b
         |    WHERE b.doc_id % $DeltaMod <> 0 AND b.fp = d.fp)),
         |tk0 AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |sh AS ($sqlShingles3),
         |card AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |  WHERE a.doc_id % $DeltaMod = 0 AND b.doc_id % $DeltaMod <> 0
         |  GROUP BY 1, 2),
         |near AS (
         |  SELECT i.id_a AS doc_id, COUNT(*) AS n_near
         |  FROM inter i
         |  JOIN card ca ON ca.doc_id = i.id_a
         |  JOIN card cb ON cb.doc_id = i.id_b
         |  WHERE 3 * i.inter >= ca.n + cb.n
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(e.is_exact, FALSE) AS is_exact,
         |  COALESCE(n.n_near, CAST(0 AS BIGINT)) AS n_near,
         |  CASE WHEN COALESCE(e.is_exact, FALSE) THEN 'exact_dup'
         |       WHEN COALESCE(n.n_near, 0) > 0 THEN 'near_dup'
         |       ELSE 'unique' END AS status
         |FROM documents d
         |LEFT JOIN exact e ON e.doc_id = d.doc_id
         |LEFT JOIN near n ON n.doc_id = d.doc_id
         |WHERE d.doc_id % $DeltaMod = 0
         |ORDER BY d.doc_id""".stripMargin,

    "q111_hash_stratified_sample" -> {
      val cases = RateThresholds.zipWithIndex.map { case (hex, i) =>
        s"WHEN $i THEN '$hex'" }.mkString(" ")
      s"""SELECT doc_id, source,
         |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS md5_8
         |FROM documents
         |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
         |  (CASE CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER) % 4
         |   $cases END)
         |ORDER BY doc_id""".stripMargin
    },

    "q114_repeated_span" ->
      s"""WITH tk AS (
         |  SELECT doc_id, $sqlToks AS toks FROM documents),
         |grams AS (
         |  SELECT doc_id, unnest(list_transform(
         |    range(1, len(toks) - ${SpanK - 2}),
         |    i_ -> {'pos': i_,
         |      'gram': array_to_string(toks[i_:i_+${SpanK - 1}], '_')})) AS g
         |  FROM tk WHERE len(toks) >= $SpanK),
         |gp AS (SELECT doc_id, g.pos AS pos, g.gram AS gram FROM grams),
         |df AS (
         |  SELECT gram, COUNT(*) AS df FROM (
         |    SELECT DISTINCT doc_id, gram FROM gp) GROUP BY gram),
         |shared AS (
         |  SELECT gp.doc_id, gp.pos FROM gp
         |  JOIN df ON df.gram = gp.gram WHERE df.df >= 2),
         |runs AS (
         |  SELECT doc_id, pos - ROW_NUMBER() OVER (
         |      PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM shared),
         |rl AS (
         |  SELECT doc_id, COUNT(*) AS run_len
         |  FROM runs GROUP BY doc_id, grp),
         |agg AS (
         |  SELECT doc_id, CAST(MAX(run_len) AS BIGINT) AS max_run,
         |    CAST(SUM(run_len) AS BIGINT) AS n_shared_pos
         |  FROM rl GROUP BY doc_id),
         |np AS (SELECT doc_id, COUNT(*) AS n_positions FROM gp GROUP BY doc_id)
         |SELECT np.doc_id, np.n_positions,
         |  COALESCE(agg.n_shared_pos, CAST(0 AS BIGINT)) AS n_shared_pos,
         |  COALESCE(agg.max_run, CAST(0 AS BIGINT)) AS max_run
         |FROM np LEFT JOIN agg ON agg.doc_id = np.doc_id
         |ORDER BY np.doc_id""".stripMargin,

    "q112_nucleus_topp" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |    CAST(len($sqlToks) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct($sqlToks)) AS BIGINT) AS n_uniq
         |  FROM documents),
         |sc AS (
         |  SELECT *, CASE WHEN n_tokens > 0
         |      THEN (n_uniq * $Scale) // n_tokens
         |      ELSE CAST(-1 AS BIGINT) END AS score_fp
         |  FROM scored),
         |w AS (
         |  SELECT *,
         |    SUM(n_tokens) OVER (PARTITION BY source
         |      ORDER BY score_fp DESC, doc_id ASC) AS cum_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY source) AS total_tokens
         |  FROM sc)
         |SELECT source, COUNT(*) AS n_docs,
         |  COUNT(CASE WHEN cum_tokens * $TopPDen <= total_tokens * $TopPNum
         |    THEN 1 END) AS n_kept,
         |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
         |  CAST(COALESCE(SUM(CASE WHEN cum_tokens * $TopPDen
         |      <= total_tokens * $TopPNum THEN n_tokens END), 0) AS BIGINT)
         |    AS tokens_kept
         |FROM w GROUP BY source ORDER BY source""".stripMargin
  )
}
