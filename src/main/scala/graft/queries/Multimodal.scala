package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing queries: binary payload → batched decode →
  * typed metadata / per-frame statistics (operators/Multimodal.scala).
  * The payloads derive from the documents' ASCII text bytes, so the
  * decode arithmetic is replayable in SQL via ascii() — the oracle
  * checks the whole decode path including per-partition batching.
  *
  *  - q23: container-level fake decode (metadata + feature vector).
  *  - q189: REAL video container decode — each document's text bytes
  *    are wrapped as a genuine YUV4MPEG2 stream (8×4 C420, 1–3
  *    frames, Y planes cyclically filled from the text, chroma at
  *    128), then [[Multimodal.Y4mCodec]] parses the REAL format back
  *    to per-frame luma statistics. Construction and decode compose
  *    to pure byte arithmetic, so DuckDB re-derives every frame row
  *    from the text alone — the container round-trip is hash-gated.
  */
object MultimodalQueries {

  /** Wrap ASCII text bytes as a real YUV4MPEG2 stream: 8×4 C420,
    * `1 + len%3` frames, frame f's Y plane = text bytes cyclic from
    * offset f*32, both chroma planes constant 128. */
  private def y4mOfText(text: Array[Byte]): Array[Byte] = {
    val (w, h) = (8, 4)
    val nFrames = 1 + (text.length % 3)
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n"
      .getBytes("US-ASCII"))
    (0 until nFrames).foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      var j = 0
      while (j < w * h) {
        out.write(text((f * w * h + j) % text.length) & 0xff)
        j += 1
      }
      (0 until 2 * (w / 2) * (h / 2)).foreach(_ => out.write(128))
    }
    out.toByteArray
  }

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
    }),

    "q189_video_frame_decode" -> ((s, dir) => {
      import s.implicits._
      val assets = graft.sources.Catalog.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(length(col("text")) > 0)
        .as[(Long, String)]
        .map { case (id, text) =>
          Multimodal.MediaAsset(id, "video",
            y4mOfText(text.getBytes("UTF-8")))
        }
      val frames = Multimodal.decodeVideoFrames(assets,
        Multimodal.Y4mCodec)
      val hist = (0 until 4)
        .map(b => col("luma_hist").getItem(b).as(s"hist_$b"))
      frames.toDF().select(
        Seq(col("asset_id"), col("frame_no"), col("width"),
          col("height"), col("luma_sum")) ++ hist: _*)
        .orderBy(col("asset_id"), col("frame_no"))
    })
  )

  private def featSql(d: Int): String =
    s"""CAST(COALESCE(list_sum(list_transform(
       |    list_filter(range(1, length(text) + 1), i_ -> (i_ - 1) % 8 = $d),
       |    i_ -> ascii(text[i_]))), 0) AS BIGINT) AS feat_$d""".stripMargin

  /** Frame f's Y-plane byte j is text byte ((f*32 + j) mod len) —
    * 1-indexed for DuckDB's substring. */
  private def lumaAt = "ascii(text[((f*32 + i_) % length(text)) + 1])"

  private def histSql(b: Int): String =
    s"""CAST(list_sum(list_transform(range(0, 32),
       |    i_ -> CASE WHEN $lumaAt // 64 = $b
       |      THEN 1 ELSE 0 END)) AS BIGINT) AS hist_$b""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q23_multimodal_decode" ->
      s"""SELECT doc_id AS asset_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  CAST((length(text) * 7) % 640 + 16 AS INT) AS width,
         |  CAST((ascii(text[1]) * 2) % 480 + 16 AS INT) AS height,
         |  CAST(3 AS INT) AS channels,
         |  ${(0 until 8).map(featSql).mkString(",\n  ")}
         |FROM documents ORDER BY asset_id""".stripMargin,

    "q189_video_frame_decode" ->
      s"""SELECT doc_id AS asset_id,
         |  CAST(f AS INT) AS frame_no,
         |  CAST(8 AS INT) AS width,
         |  CAST(4 AS INT) AS height,
         |  CAST(list_sum(list_transform(range(0, 32),
         |    i_ -> $lumaAt)) AS BIGINT) AS luma_sum,
         |  ${(0 until 4).map(histSql).mkString(",\n  ")}
         |FROM documents, (VALUES (0), (1), (2)) AS fr(f)
         |WHERE length(text) > 0 AND f < 1 + length(text) % 3
         |ORDER BY asset_id, frame_no""".stripMargin
  )
}
