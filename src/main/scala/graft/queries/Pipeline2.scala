package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Sessionize
import graft.sources.Catalog

/** Round-2 pipeline operators: gap sessionization over the event
  * stream and TF-IDF-style term scoring over the corpus — both classic
  * large-scale pipeline steps with exact cross-engine arithmetic
  * (integer micros, integer division, decimal-routed double sums).
  */
object Pipeline2 {

  private val GapMicros = 1800000000L // 30 min

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gap-based sessionization: one shuffle on user_id, shared
    // window sort (ts, event_id), running-sum session index, exact
    // per-session aggregates.
    "q46_sessionize" -> ((s, dir) =>
      Sessionize.sessions(t(s, dir, "events"), "user_id", "ts",
        GapMicros, tiebreak = col("event_id"), valueCol = col("value"))
        .withColumn("session_idx", col("session_idx").cast("long"))
        .orderBy(col("user_id"), col("session_idx"))),

    // Deterministic train/val/test split: bucket = content hash mod
    // 100 → train <80, val <90, test otherwise. Hash-based splitting
    // is how a large pipeline assigns examples stably across re-runs
    // and machines (no RNG, no global coordination: pure map-side);
    // the portable polynomial hash makes the assignment replayable by
    // the oracle. Output: per (split, lang) example counts + exact
    // mean quality-proxy (token count routed through decimal).
    "q48_hash_split" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      // hash + tokenize in one JVM kernel pass (the HOF polyHash form
      // is interpreted per character — the q14 lesson); shuffle only
      // the (split, lang) aggregation
      val perDoc = t(s, dir, "documents")
        .select(col("lang"), col("text").cast("string"))
        .as[(String, String)]
        .mapPartitions(_.map { case (lang, text) =>
          // NULL text: the oracle's CASE maps the NULL bucket to the
          // ELSE branch ('test') and SUM skips the NULL token count —
          // mirror both (the kernel must not NPE on nullable text)
          if (text == null) ("test", lang, None: Option[Long])
          else {
            val bucket = TextFunctions.polyHashJvm(text) % 100
            val split =
              if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
            (split, lang, Some(text.split(" ").count(_.nonEmpty).toLong))
          }
        }).toDF("split", "lang", "n_tokens")
      perDoc.groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"))
        .orderBy(col("split"), col("lang"))
    }),

    // Deterministic stratified sampling: fixed-size per-stratum
    // (language) samples chosen by ascending salted content-key hash —
    // the no-RNG way a pipeline pins eval sets that stay STABLE across
    // re-runs, machines and partitionings (rows don't move between
    // samples when unrelated data changes, unlike rand()-based
    // sampling). One window shuffle on the stratum; WindowGroupLimit
    // pushes the top-k below the exchange.
    "q49_stratified_sample" -> ((s, dir) => {
      val key = TextFunctions.polyHash(
        concat(col("doc_id").cast("string"), lit("#s42")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("sample_key").asc, col("doc_id").asc)
      t(s, dir, "documents")
        .select(col("lang"), col("doc_id"), key.as("sample_key"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .orderBy(col("lang"), col("rn"))
    }),

    // TF-IDF-style top terms per document. The score is engine-defined
    // EXACT integer arithmetic — score = tf · ((10⁶·N) div df) — so
    // both engines rank identically with no transcendental (ln) calls
    // whose last-ulp behavior differs across libm implementations;
    // the ordering is the classic rare-term-heavy ranking.
    "q47_tfidf_topterms" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val total = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "term")
        .crossJoin(total)
        .withColumn("score_fp",
          col("tf") * expr("(1000000 * n_docs) div df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score_fp").desc, col("term").asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("score_fp"), col("rn"))
        .orderBy(col("doc_id"), col("rn"))
    })
  )

  private val sqlToks = "list_filter(string_split(text, ' '), t_ -> t_ <> '')"

  val oracleSql: Map[String, String] = Map(
    "q46_sessionize" ->
      s"""WITH s AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
         |         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > $GapMicros
         |      THEN 1 ELSE 0 END AS is_start
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |x AS (
         |  SELECT user_id, event_id, us, value,
         |    CAST(SUM(is_start) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS session_idx
         |  FROM s)
         |SELECT user_id, session_idx,
         |  MIN(us) AS session_start_us, MAX(us) AS session_end_us,
         |  COUNT(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
         |FROM x GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,

    "q48_hash_split" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, $sqlToks AS toks,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, length(text)+1),
         |        i_ -> CAST(ascii(text[i_]) AS BIGINT))),
         |      (h_, c_) -> (h_ * 131 + c_) % 1000000007) % 100 AS bucket
         |  FROM documents)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(toks)) AS BIGINT) AS sum_tokens
         |FROM d GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    "q49_stratified_sample" ->
      """SELECT lang, doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(CAST(doc_id AS VARCHAR) || '#s42')+1),
        |      i_ -> CAST(ascii((CAST(doc_id AS VARCHAR) || '#s42')[i_]) AS BIGINT))),
        |    (h_, c_) -> (h_ * 131 + c_) % 1000000007) AS sample_key,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rn
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(CAST(doc_id AS VARCHAR) || '#s42')+1),
        |      i_ -> CAST(ascii((CAST(doc_id AS VARCHAR) || '#s42')[i_]) AS BIGINT))),
        |    (h_, c_) -> (h_ * 131 + c_) % 1000000007) ASC, doc_id ASC)
        |QUALIFY ROW_NUMBER() OVER w <= 20
        |ORDER BY lang, rn""".stripMargin,

    "q47_tfidf_topterms" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($sqlToks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |total AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         |    tf.tf * ((1000000 * total.n_docs) // dfreq.df) AS score_fp
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN total)
         |SELECT doc_id, term, tf, df, score_fp,
         |  CAST(ROW_NUMBER() OVER w AS INT) AS rn
         |FROM scored
         |WINDOW w AS (PARTITION BY doc_id ORDER BY score_fp DESC, term ASC)
         |QUALIFY ROW_NUMBER() OVER w <= 3
         |ORDER BY doc_id, rn""".stripMargin
  )
}
