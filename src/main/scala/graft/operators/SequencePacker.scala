package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing plan — assign documents to fixed-length training
  * sequences by concat-and-chunk: documents are laid head-to-tail in a
  * deterministic order and cut every `seqLen` tokens (the standard
  * packing a pretraining loader applies; GPT-style "documents joined
  * with EOD, split at block size"). No reference counterpart
  * (north-star scope).
  *
  * Scale shape: packing is computed PER SHARD — the corpus is
  * hash-sharded and each shard packs independently with a
  * window-partitioned running sum, exactly how N loader workers pack N
  * streams in parallel. A single global cumsum (one unpartitioned
  * window) would serialize the whole corpus through one task at 100 TB
  * — deliberately avoided; the price is that sequence ids are only
  * unique per (shard, seq), which is what a sharded loader has anyway.
  * The shard hash is the portable exact-BIGINT LCG so the oracle
  * replays the assignment.
  */
object SequencePacker {

  /** Per document (zero-token docs excluded): its shard, token count,
    * start offset in the shard's concatenated token stream, and the
    * first/last sequence index it lands in (`seqLen`-token sequences;
    * a doc straddling a cut spans seq_first..seq_last). */
  def packPlan(df: DataFrame, docId: String, text: Column,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be > 0")
    // key reduced mod p first (pmod: negative-safe) so the product is
    // < p·2654435761 ≈ 2.7e18 < 2^63 for every long id — no overflow
    val p = 1000000007L
    val shard = (pmod(col(docId).cast("long"), lit(p)) *
      lit(2654435761L) + lit(12345L)) % lit(p) % lit(nShards.toLong)
    val nt = size(filter(split(text, " "), t => t =!= "")).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(docId))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(docId), shard.as("shard"), nt.as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_first", expr(s"start_off div $seqLen"))
      .withColumn("seq_last",
        expr(s"(start_off + n_tokens - 1) div $seqLen"))
  }

  /** MATERIALIZED packed sequences — the training pipeline's actual
    * end artifact: per shard, documents are laid head-to-tail in
    * doc-id order and cut into `seqLen`-token rows (last sequence per
    * shard may be partial). Output: (shard, seq_id, n_tokens,
    * seq_text).
    *
    * Scale shape: repartition on shard + sortWithinPartitions, then a
    * STREAMING per-partition fold — the token buffer never holds more
    * than seqLen + one document's tokens, so a shard of any size
    * packs in O(seqLen) memory (no per-shard collect_list row). A
    * partition may hold several shards (hash co-location); the fold
    * flushes on shard change, so results are independent of the
    * partitioning. */
  def packSequences(df: DataFrame, docId: String, text: Column,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val p = 1000000007L
    val shard = (pmod(col(docId).cast("long"), lit(p)) *
      lit(2654435761L) + lit(12345L)) % lit(p) % lit(nShards.toLong)
    df.select(shard.as("shard"), col(docId).cast("long").as("id"),
        text.cast("string").as("t"))
      .filter(col("t").isNotNull)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Long, String)]
      .mapPartitions { it =>
        new Iterator[(Long, Long, Long, String)] {
          private val out = ArrayBuffer.empty[(Long, Long, Long, String)]
          private val buf = ArrayBuffer.empty[String]
          private var curShard = Long.MinValue
          private var seqIdx = 0L
          private def emit(): Unit = {
            val n = math.min(seqLen, buf.length)
            out += ((curShard, seqIdx, n.toLong,
              buf.take(n).mkString(" ")))
            buf.remove(0, n)
            seqIdx += 1
          }
          private def flushShard(): Unit = {
            while (buf.nonEmpty) emit()
          }
          private def fill(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val (s, _, t) = it.next()
              if (s != curShard) {
                if (curShard != Long.MinValue) flushShard()
                curShard = s
                seqIdx = 0L
              }
              buf ++= t.split(" ").filter(_.nonEmpty)
              while (buf.length >= seqLen) emit()
            }
            if (out.isEmpty && !it.hasNext &&
                curShard != Long.MinValue && buf.nonEmpty)
              flushShard()
          }
          override def hasNext: Boolean = { fill(); out.nonEmpty }
          override def next(): (Long, Long, Long, String) = {
            fill(); out.remove(0)
          }
        }
      }
      .toDF("shard", "seq_id", "n_tokens", "seq_text")
  }
}
