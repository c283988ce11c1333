package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora (north-star scope:
  * exact, n-gram Jaccard, MinHash+LSH). No reference counterpart — the
  * reference dedups only by primary key (SURVEY R5/S4); these are the
  * operators a 100 TB training-data pipeline needs.
  *
  * Scale design:
  *  - n-gram inverted index (exact Jaccard): one explode + one
  *    equi-join on the shingle — correct but O(sum of posting-list²)
  *    on hot shingles; use for small/medium corpora or after LSH.
  *  - MinHash+LSH: signatures via one explode (|shingles| × numHashes
  *    rows, all map-side), band keys via one groupBy, candidates via an
  *    equi-join on (band, bandKey) — the classic sub-quadratic path.
  *    Candidates are then VERIFIED with exact Jaccard, so false
  *    positives never escape; recall is governed by (bands, rows).
  */
object FuzzyDedup {

  private val P = 1000000007L

  /** Distinct word k-shingles per document: (docId, shingle) rows.
    * Shingle = k consecutive tokens joined by '_'. */
  def shingles(df: DataFrame, docId: String, text: Column, k: Int = 3)
      : DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(text)
    val sh = when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws("_", (0 until k).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
    df.select(col(docId), explode(sh).as("shingle")).distinct()
  }

  /** Exact pairwise Jaccard over shingle sets via the inverted index:
    * every document pair sharing ≥1 shingle, with |∩|, set sizes and
    * similarity; filter with `jaccard >= tau` downstream. */
  def jaccardPairs(sh: DataFrame, docId: String): DataFrame = {
    val card = sh.groupBy(col(docId)).agg(count(lit(1)).as("n"))
    val a = sh.toDF(docId + "_a", "shingle")
    val b = sh.toDF(docId + "_b", "shingle")
    a.join(b, Seq("shingle"))
      .filter(col(docId + "_a") < col(docId + "_b"))
      .groupBy(col(docId + "_a"), col(docId + "_b"))
      .agg(count(lit(1)).as("inter"))
      .join(card.toDF(docId + "_a", "n_a"), docId + "_a")
      .join(card.toDF(docId + "_b", "n_b"), docId + "_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
  }

  /** LSH candidate pairs from MinHash signatures.
    *
    * Hash family: v_i(x) = (a_i·x + b_i) mod p over x = pmod(hash64(
    * shingle), p); signature = min over shingles per i; band key = the
    * weight-combined 4 minima of each band (weights 31^3..31^0 — an
    * order-independent injective-enough combine that avoids a sorted
    * string agg). All BIGINT arithmetic, no overflow (a,b,x < p ≈ 2^30).
    */
  def minhashCandidates(sh: DataFrame, docId: String,
      numHashes: Int = 64, bandRows: Int = 4,
      shingleHash: Column => Column = c => xxhash64(c)): DataFrame = {
    require(numHashes % bandRows == 0, "numHashes must divide into bands")
    val p = lit(P)
    val sig = sh
      .withColumn("x", pmod(shingleHash(col("shingle")), p))
      .withColumn("i", explode(sequence(lit(0), lit(numHashes - 1))))
      .withColumn("v",
        ((lit(1103515245L) * (col("i") + 1) + lit(12345L)) % p * col("x") +
          (lit(22695477L) * (col("i") + 1) + lit(1L)) % p) % p)
      .groupBy(col(docId), col("i")).agg(min(col("v")).as("m"))
    val weights = (0 until bandRows).map(r => math.pow(31, bandRows - 1 - r).toLong)
    val wCol = element_at(lit(weights.toArray), (col("i") % bandRows + 1).cast("int"))
    val bands = sig
      .withColumn("band", expr(s"i div $bandRows"))
      .groupBy(col(docId), col("band"))
      .agg(sum(col("m") * wCol).as("bk"))
    bands.toDF(docId + "_a", "band", "bk")
      .join(bands.toDF(docId + "_b", "band", "bk"), Seq("band", "bk"))
      .filter(col(docId + "_a") < col(docId + "_b"))
      .select(col(docId + "_a"), col(docId + "_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: candidates, then exact-Jaccard
    * verification (so the output contains no false positives). */
  def minhashDedupPairs(df: DataFrame, docId: String, text: Column,
      tau: Double, k: Int = 3, numHashes: Int = 64, bandRows: Int = 4)
      : DataFrame = {
    val sh = shingles(df, docId, text, k)
    val cand = minhashCandidates(sh, docId, numHashes, bandRows)
    jaccardPairs(sh, docId)
      .join(cand, Seq(docId + "_a", docId + "_b"), "left_semi")
      .filter(col("jaccard") >= tau)
  }

  /** SimHash over token multisets, b-bit (default 32): per token the
    * portable polynomial hash h, per bit j the derived bit of
    * (a_j·h + b_j) mod p, summed ±1 over tokens; sign → bit j.
    * Plainly relational (explode + two groupBys) so it scales as an
    * aggregation, and every step is exact integer math the oracle can
    * replay. Near-dup pairs = small Hamming distance on the result. */
  def simhash(df: DataFrame, docId: String, text: Column, bits: Int = 32)
      : DataFrame = {
    val p = lit(P)
    df.select(col(docId),
        explode(graft.functions.TextFunctions.tokens(text)).as("token"))
      .withColumn("h", graft.functions.TextFunctions.polyHash(col("token")))
      .withColumn("j", explode(sequence(lit(0), lit(bits - 1))))
      .withColumn("bit",
        ((lit(1103515245L) * (col("j") + 1) + lit(12345L)) % p * col("h") +
          (lit(22695477L) * (col("j") + 1) + lit(1L)) % p) % p % 2)
      .groupBy(col(docId), col("j"))
      .agg(sum(col("bit") * 2 - 1).as("s"))
      .groupBy(col(docId))
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(cast(1 as bigint), j)")).otherwise(lit(0L)))
        .as("simhash"))
  }
}
