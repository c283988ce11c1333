package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training-data pipelines: fixed-size token
  * windows with overlap (stride < size), the standard shape for
  * context-window-bounded training examples and embedding inputs.
  *
  * Typed flatMap kernel (same rationale as FuzzyDedup.shingles — the
  * HOF form re-evaluates the tokenizer per element). Map-side only:
  * chunking never shuffles; downstream embedding/dedup stages see
  * (doc_id, chunk_id) keyed rows.
  */
object TextChunker {

  /** (docId, chunk_id, chunk_text, n_tokens) rows; chunk i covers
    * tokens [i·stride, i·stride + size). Last chunk may be short;
    * stride ≤ size gives overlap size − stride. */
  def chunk(df: DataFrame, docId: String, text: Column,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(docId).cast("long"), text.cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val toks = if (t == null) Array.empty[String]
          else t.split(" ").filter(_.nonEmpty)
        val n = toks.length
        (0 until n by stride).iterator.map { s =>
          val chunk = toks.slice(s, math.min(s + size, n))
          (id, s / stride, chunk.mkString(" "), chunk.length.toLong)
        }
      }.toDF(docId, "chunk_id", "chunk_text", "n_tokens")
  }
}
