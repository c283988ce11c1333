package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Catalog

/** Training-data text pipeline stages beyond analysis: stopword
  * cleaning and overlapping chunking (q36-q37), plus exact-formula
  * statistics and discrete median (q38-q39) — all oracle-checked.
  *
  * Statistics discipline: variance/correlation are computed from
  * DECIMAL moment sums (exact, order-independent) with the SAME
  * double-arithmetic formula on both engines — built-in `var_samp` /
  * `corr` stream different intermediate roundings per engine and can
  * never hash-match.
  */
object TextPipeline {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  private val stop = TextFunctions.langMarkers.head._2 // en markers

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Stopword removal + re-joined clean text.
    "q36_text_clean" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      val cleaned = filter(toks, t => !t.isInCollection(stop))
      t(s, dir, "documents").select(
        col("doc_id"),
        array_join(cleaned, " ").as("clean_text"),
        size(cleaned).cast("bigint").as("n_clean"))
        .orderBy(col("doc_id"))
    }),

    // Overlapping token chunks (size 32, stride 24 → 8-token overlap).
    "q37_chunking" -> ((s, dir) =>
      graft.operators.TextChunker.chunk(
        t(s, dir, "documents"), "doc_id", col("text"), size = 32,
        stride = 24)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Mean/variance/correlation from EXACT integer moments: the 2-dp
    // money/quantity columns are scaled ×100 to integers, every moment
    // sum is exact, and the closed-form double arithmetic is identical
    // text on both engines → bit-equal (built-in var_samp/corr stream
    // different intermediate roundings per engine; even decimal-cast
    // products round differently at the last digit, which corr's
    // cancellation amplifies).
    "q38_moment_stats" -> ((s, dir) => {
      val qi = round(col("l_quantity") * 100).cast("bigint")
      val pi = round(col("l_extendedprice") * 100).cast("bigint")
      val li = t(s, dir, "lineitem")
      val agg = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(qi).cast("double").as("sq"),
        sum(qi * qi).cast("double").as("sqq"),
        sum(pi).cast("double").as("sp"),
        // pi² ~1e14 each; the SUM needs headroom beyond int64
        sum((pi * pi).cast("decimal(38,0)")).cast("double").as("spp"),
        sum(qi * pi).cast("double").as("sqp"))
      agg.select(
        col("l_returnflag"),
        (col("sq") / col("n") / 100.0).as("mean_qty"),
        ((col("sqq") - col("sq") * col("sq") / col("n")) / (col("n") - 1.0)
          / 10000.0).as("var_qty"),
        ((col("sqp") - col("sq") * col("sp") / col("n")) /
          sqrt((col("sqq") - col("sq") * col("sq") / col("n")) *
            (col("spp") - col("sp") * col("sp") / col("n"))))
          .as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Discrete (lower) median by windowed position — exact and
    // engine-agnostic, unlike interpolated quantiles. Group sizes come
    // from a broadcast-joined aggregate, not a frameless count window
    // (which would buffer every partition twice).
    "q39_median_disc" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val li = t(s, dir, "lineitem")
      val counts = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
      li.select(col("l_returnflag"), col("l_quantity"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(w))
        .join(broadcast(counts), Seq("l_returnflag"))
        .filter(col("rn") === expr("(cnt + 1) div 2")) // integer div, not /
        .select(col("l_returnflag"), col("l_quantity").as("median_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Flagship composition: the full training-data prep chain
    // (language filter → quality gate → exact dedup → LSH near-dup
    // removal → chunking), oracle-checked end to end.
    "q42_training_data_prep" -> ((s, dir) =>
      graft.pipelines.TrainingPrep.prep(s, dir))
  )

  private val stopSql = stop.map(w => s"'$w'").mkString("[", ", ", "]")

  val oracleSql: Map[String, String] = Map(
    "q36_text_clean" ->
      s"""SELECT doc_id,
         |  array_to_string(list_filter(list_filter(string_split(text, ' '),
         |    t_ -> t_ <> ''), t_ -> NOT list_contains($stopSql, t_)), ' ')
         |    AS clean_text,
         |  CAST(len(list_filter(list_filter(string_split(text, ' '),
         |    t_ -> t_ <> ''), t_ -> NOT list_contains($stopSql, t_))) AS BIGINT)
         |    AS n_clean
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q37_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t_ -> t_ <> '') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS s
        |  FROM d WHERE len(toks) > 0)
        |SELECT doc_id, CAST(s // 24 AS INT) AS chunk_id,
        |  array_to_string(list_slice(toks, s + 1, least(s + 32, len(toks))), ' ')
        |    AS chunk_text,
        |  CAST(least(s + 32, len(toks)) - s AS BIGINT) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q38_moment_stats" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qi,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pi
        |  FROM lineitem),
        |a AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(qi) AS BIGINT) AS DOUBLE) AS sq,
        |    CAST(CAST(SUM(qi * qi) AS BIGINT) AS DOUBLE) AS sqq,
        |    CAST(CAST(SUM(pi) AS BIGINT) AS DOUBLE) AS sp,
        |    CAST(SUM(pi * pi) AS DOUBLE) AS spp,
        |    CAST(CAST(SUM(qi * pi) AS BIGINT) AS DOUBLE) AS sqp
        |  FROM s GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  sq / n / 100.0 AS mean_qty,
        |  (sqq - sq * sq / n) / (n - 1.0) / 10000.0 AS var_qty,
        |  (sqp - sq * sp / n) /
        |    sqrt((sqq - sq * sq / n) * (spp - sp * sp / n)) AS corr_qty_price
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "q42_training_data_prep" -> graft.pipelines.TrainingPrep.oracle,

    "q39_median_disc" ->
      """SELECT l_returnflag, l_quantity AS median_qty FROM (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem)
        |WHERE rn = (cnt + 1) // 2
        |ORDER BY l_returnflag""".stripMargin
  )
}
