package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.FuzzyDedup
import graft.sources.Catalog

/** Text-analysis surface over the `documents` corpus (north-star
  * scope): token statistics, quality scoring, language-ID heuristic,
  * content fingerprinting, SimHash. All scalar work is codegen'd
  * higher-order functions; all cross-engine-compared values are exact
  * integer or fixed-association double arithmetic (see TextFunctions).
  */
object Text {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "documents")

  /** DuckDB fragment: portable polynomial hash of string expression. */
  private def sqlPolyHash(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($s)+1), i_ -> CAST(ascii($s[i_]) AS BIGINT))), " +
      s"(h_, c_) -> (h_ * 131 + c_) % 1000000007)"

  private val sqlToks = "list_filter(string_split(text, ' '), t_ -> t_ <> '')"

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting + quality scoring + fingerprinting in one
    // map-side kernel scan (see TextFunctions.textStats; the BPE-ish
    // regex run-count uses the same simple character-class semantics
    // in Java and RE2, so the oracle replays it).
    "q14_text_stats" -> ((s, dir) =>
      TextFunctions.textStats(docs(s, dir), "doc_id", col("text"),
        TextFunctions.langMarkers.head._2)
        .orderBy(col("doc_id"))),

    // Stopword-partition language-ID heuristic with deterministic
    // argmax preference order en > de > es > fr > zh.
    "q15_langid" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      val sc = TextFunctions.langMarkers.map { case (l, ws) =>
        l -> TextFunctions.wordListHits(toks, ws).cast("bigint")
      }.toMap
      val pred =
        when(sc("en") >= sc("de") && sc("en") >= sc("es") &&
          sc("en") >= sc("fr") && sc("en") >= sc("zh"), "en")
          .when(sc("de") >= sc("es") && sc("de") >= sc("fr") &&
            sc("de") >= sc("zh"), "de")
          .when(sc("es") >= sc("fr") && sc("es") >= sc("zh"), "es")
          .when(sc("fr") >= sc("zh"), "fr")
          .otherwise("zh")
      docs(s, dir).select(
        col("doc_id"), col("lang"),
        sc("en").as("s_en"), sc("de").as("s_de"), sc("es").as("s_es"),
        sc("fr").as("s_fr"), sc("zh").as("s_zh"),
        pred.as("pred_lang"),
        (pred === col("lang")).as("match_ref"))
        .orderBy(col("doc_id"))
    }),

    // 32-bit SimHash per document (explode + two aggregations).
    "q16_simhash" -> ((s, dir) =>
      FuzzyDedup.simhash(docs(s, dir), "doc_id", col("text"), bits = 32)
        .orderBy(col("doc_id")))
  )

  private val enList = sqlList(TextFunctions.langMarkers.head._2)

  val oracleSql: Map[String, String] = Map(
    "q14_text_stats" ->
      s"""WITH d AS (SELECT doc_id, text, $sqlToks AS toks FROM documents)
         |SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-z]{3,}')) AS BIGINT) AS n_regex_tokens,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
         |  CAST(CAST(list_sum(list_transform(toks, t_ -> length(t_))) AS BIGINT) AS DOUBLE)
         |    / CAST(len(toks) AS DOUBLE) AS avg_token_len,
         |  CAST(len(list_filter(toks, t_ -> list_contains($enList, t_))) AS DOUBLE)
         |    / CAST(len(toks) AS DOUBLE) AS stop_ratio,
         |  (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.3
         |    + (1.0 - CAST(len(list_filter(toks, t_ -> list_contains($enList, t_))) AS DOUBLE)
         |        / CAST(len(toks) AS DOUBLE)) * 0.4
         |    + (CAST(least(len(toks), 100) AS DOUBLE) / 100.0) * 0.3 AS quality,
         |  ${sqlPolyHash("text")} AS fingerprint
         |FROM d ORDER BY doc_id""".stripMargin,

    "q15_langid" -> {
      val score = TextFunctions.langMarkers.map { case (l, ws) =>
        s"CAST(len(list_filter(toks, t_ -> list_contains(${sqlList(ws)}, t_))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      s"""WITH d AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents),
         |sc AS (SELECT doc_id, lang,
         |  $score
         |FROM d)
         |SELECT doc_id, lang, s_en, s_de, s_es, s_fr, s_zh,
         |  CASE
         |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |    WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |    WHEN s_fr >= s_zh THEN 'fr'
         |    ELSE 'zh' END AS pred_lang,
         |  (CASE
         |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |    WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |    WHEN s_fr >= s_zh THEN 'fr'
         |    ELSE 'zh' END) = lang AS match_ref
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "q16_simhash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($sqlToks) AS token FROM documents),
         |h AS (SELECT doc_id, ${sqlPolyHash("token")} AS h FROM tok),
         |bits AS (
         |  SELECT doc_id, j,
         |    SUM((((CAST(1103515245 AS BIGINT) * (j + 1) + 12345) % 1000000007
         |          * h
         |          + (CAST(22695477 AS BIGINT) * (j + 1) + 1) % 1000000007)
         |         % 1000000007) % 2 * 2 - 1) AS s
         |  FROM h CROSS JOIN (SELECT unnest(range(32)) AS j)
         |  GROUP BY doc_id, j)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
