package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{FuzzyDedup, TextChunker}
import graft.sources.Catalog

/** Flagship training-data preparation pipeline (north-star
  * composition): the standard corpus-cleaning chain a pretraining
  * dataset goes through, each stage an engine operator —
  *
  *   language filter (lang-ID heuristic = 'en')
  *     → quality gate (score ≥ 0.55)
  *     → exact dedup (content fingerprint, keep lowest doc_id)
  *     → near-dup removal (MinHash-LSH pairs at J ≥ 0.5, drop the
  *       higher doc_id of each pair)
  *     → overlapping chunking (size 32 / stride 24)
  *
  * Everything is one declarative flow: the filters are scan-time
  * predicates, dedup is a groupBy + semi/anti join, near-dup is the
  * sub-quadratic LSH path, chunking is map-side — no stage shuffles
  * more than its keys. Oracle-checked end to end (the DuckDB SQL
  * replays every stage, with exact Jaccard standing in for LSH under
  * the corpus's 0.07→0.9 similarity gap).
  */
object TrainingPrep {

  val QualityTau = 0.55
  val JaccardTau = 0.5

  def prep(s: SparkSession, dir: String): DataFrame = {
    val docs = Catalog.table(s, dir, "documents")
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
    val nt = size(toks).cast("bigint")
    val ntD = nt.cast("double")
    // Guarded for zero-token docs: the session runs ANSI (Spark 4
    // default), where a bare divide-by-zero ERRORS the whole query;
    // the oracle's divide yields NULL there, and NULL >= tau excludes
    // the doc — when(nt > 0, …) reproduces exactly that.
    val quality = when(nt > 0,
      (size(array_distinct(toks)).cast("double") / ntD) * 0.3 +
        (lit(1.0) - sc("en").cast("double") / ntD) * 0.4 +
        (least(nt, lit(100L)).cast("double") / lit(100.0)) * 0.3)

    val fps = TextFunctions.fingerprints(docs, "doc_id", col("text"))
      .withColumnRenamed("fingerprint", "fp")
    val kept = docs.select(col("doc_id"), col("text"), col("lang"),
        pred.as("pred"), quality.as("q"))
      .filter(col("pred") === "en" && col("q") >= QualityTau)
      .join(fps, Seq("doc_id"))

    // exact dedup: representative = lowest doc_id per fingerprint.
    // Persisted: every downstream stage (shingles, LSH, verification,
    // survivors, chunker, metadata join) re-reads this relation, and
    // its lineage carries the interpreted lang-ID scoring HOFs.
    val reps = kept.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val exactKept = kept.join(reps, Seq("fp", "doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // near-dup removal via the LSH path; drop the higher id of a pair
    val removed = FuzzyDedup
      .minhashDedupPairs(exactKept, "doc_id", col("text"), JaccardTau)
      .select(col("doc_id_b").as("doc_id")).distinct()
    val survivors = exactKept.join(removed, Seq("doc_id"), "left_anti")

    val out = TextChunker.chunk(survivors, "doc_id", col("text"),
        size = 32, stride = 24)
      .join(survivors.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
        col("n_tokens"), col("lang"))
      .orderBy(col("doc_id"), col("chunk_id"))
      // eager: materialize the chunk output and release the persisted
      // deduped relation — no cached corpus survives the call
      .localCheckpoint(true)
    exactKept.unpersist()
    out
  }

  private def listSql(ws: Seq[String]) =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  private val scoresSql = TextFunctions.langMarkers.map { case (l, ws) =>
    s"CAST(len(list_filter(toks, t_ -> list_contains(${listSql(ws)}, t_))) AS BIGINT) AS s_$l"
  }.mkString(",\n    ")

  val oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, lang,
       |    list_filter(string_split(text, ' '), t_ -> t_ <> '') AS toks
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id, text, lang, toks,
       |    $scoresSql,
       |    (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.3
       |      + (1.0 - CAST(len(list_filter(toks,
       |          t_ -> list_contains(${listSql(TextFunctions.langMarkers.head._2)}, t_))) AS DOUBLE)
       |            / CAST(len(toks) AS DOUBLE)) * 0.4
       |      + (CAST(least(len(toks), 100) AS DOUBLE) / 100.0) * 0.3 AS q,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(text)+1),
       |        i_ -> CAST(ascii(text[i_]) AS BIGINT))),
       |      (h_, c_) -> (h_ * 131 + c_) % 1000000007) AS fp
       |  FROM d),
       |kept AS (
       |  SELECT * FROM sc
       |  WHERE (CASE
       |      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       |      WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
       |      WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
       |      WHEN s_fr >= s_zh THEN 'fr'
       |      ELSE 'zh' END) = 'en'
       |    AND q >= $QualityTau),
       |reps AS (SELECT fp, MIN(doc_id) AS doc_id FROM kept GROUP BY fp),
       |ek AS (SELECT k.* FROM kept k JOIN reps r
       |       ON k.fp = r.fp AND k.doc_id = r.doc_id),
       |sh AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(toks) >= 3 THEN
       |      list_transform(range(1, len(toks) - 1),
       |        i_ -> toks[i_] || '_' || toks[i_+1] || '_' || toks[i_+2])
       |    ELSE CAST([] AS VARCHAR[]) END) AS shingle
       |  FROM ek),
       |card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |removed AS (
       |  SELECT DISTINCT db AS doc_id FROM pairs
       |  JOIN card ca ON da = ca.doc_id JOIN card cb ON db = cb.doc_id
       |  WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE)
       |        >= $JaccardTau),
       |surv AS (
       |  SELECT * FROM ek WHERE doc_id NOT IN (SELECT doc_id FROM removed)),
       |chunks AS (
       |  SELECT doc_id, lang, toks, unnest(range(0, len(toks), 24)) AS s
       |  FROM surv WHERE len(toks) > 0)
       |SELECT doc_id, CAST(s // 24 AS INT) AS chunk_id,
       |  array_to_string(list_slice(toks, s + 1, least(s + 32, len(toks))), ' ')
       |    AS chunk_text,
       |  CAST(least(s + 32, len(toks)) - s AS BIGINT) AS n_tokens,
       |  lang
       |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin
}
