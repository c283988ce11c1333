package graft.operators

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
}
