package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing query: binary payload → batched fake decode →
  * typed metadata + feature vector (operators/Multimodal.scala). The
  * payloads are the documents' UTF-8 bytes, so the arithmetic stub is
  * replayable in SQL via ascii() — the oracle checks the whole decode
  * path including the per-partition batching. */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_multimodal_decode" -> ((s, dir) => {
      val meta = Multimodal.decodeMeta(
        Multimodal.assetsFromDocuments(s, dir), batchSize = 64)
      val feats = (0 until Multimodal.FakeCodec.FeatDims)
        .map(d => col("feat").getItem(d).as(s"feat_$d"))
      meta.toDF().select(
        Seq(col("asset_id"), col("kind"), col("n_bytes"), col("width"),
          col("height"), col("channels")) ++ feats: _*)
        .orderBy(col("asset_id"))
    })
  )

  private def featSql(d: Int): String =
    s"""CAST(COALESCE(list_sum(list_transform(
       |    list_filter(range(1, length(text) + 1), i_ -> (i_ - 1) % 8 = $d),
       |    i_ -> ascii(text[i_]))), 0) AS BIGINT) AS feat_$d""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q23_multimodal_decode" ->
      s"""SELECT doc_id AS asset_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  CAST((length(text) * 7) % 640 + 16 AS INT) AS width,
         |  CAST((ascii(text[1]) * 2) % 480 + 16 AS INT) AS height,
         |  CAST(3 AS INT) AS channels,
         |  ${(0 until 8).map(featSql).mkString(",\n  ")}
         |FROM documents ORDER BY asset_id""".stripMargin
  )
}
