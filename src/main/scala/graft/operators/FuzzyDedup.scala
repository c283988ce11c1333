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
    * Shingle = k consecutive tokens joined by '_'.
    *
    * Runs as a typed flatMap kernel: the equivalent higher-order-
    * function expression (`transform`+`element_at` over the token
    * array) is interpreted per lambda call and re-evaluates the
    * tokenizer inside each element access — measured ~50× slower.
    * Per-doc dedup via a local HashSet replaces a global distinct
    * shuffle (a (doc,shingle) pair can only repeat within its doc).
    *
    * Cached by default: every consumer (cardinalities, both sides of
    * the pair join, minhash signatures) re-reads this relation. */
  def shingles(df: DataFrame, docId: String, text: Column, k: Int = 3,
      cache: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(docId).cast("long"), text.cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val toks = if (t == null) Array.empty[String]
          else t.split(" ").filter(_.nonEmpty)
        if (toks.length < k) Iterator.empty
        else {
          val seen = new java.util.HashSet[String]()
          val sb = new StringBuilder
          (0 to toks.length - k).iterator.flatMap { i =>
            sb.clear()
            var o = 0
            while (o < k) {
              if (o > 0) sb.append('_')
              sb.append(toks(i + o)); o += 1
            }
            val s = sb.toString
            if (seen.add(s)) Iterator((id, s)) else Iterator.empty
          }
        }
      }.toDF(docId, "shingle")
    if (cache) out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else out
  }

  /** POSITIONAL word k-shingles: (docId, pos, shingle) with 1-based
    * token position, one row per occurrence (no per-doc dedup — span
    * detection needs every site). Same typed-flatMap kernel rationale
    * as [[shingles]]: the HOF `transform` form re-tokenizes per
    * element access. Map-side only; emits |tokens|-k+1 rows per doc. */
  def positionalShingles(df: DataFrame, docId: String, text: Column,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(docId).cast("long"), text.cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val toks = if (t == null) Array.empty[String]
          else t.split(" ").filter(_.nonEmpty)
        if (toks.length < k) Iterator.empty
        else {
          val sb = new StringBuilder
          (0 to toks.length - k).iterator.map { i =>
            sb.clear()
            var o = 0
            while (o < k) {
              if (o > 0) sb.append('_')
              sb.append(toks(i + o)); o += 1
            }
            (id, (i + 1).toLong, sb.toString)
          }
        }
      }.toDF(docId, "pos", "shingle")
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
    val bands = minhashBands(sh, docId, numHashes, bandRows, shingleHash)
    bands.toDF(docId + "_a", "band", "bk")
      .join(bands.toDF(docId + "_b", "band", "bk"), Seq("band", "bk"))
      .filter(col(docId + "_a") < col(docId + "_b"))
      .select(col(docId + "_a"), col(docId + "_b"))
      .distinct()
  }

  /** The (docId, band, bandKey) relation behind [[minhashCandidates]],
    * exposed so non-self-join blockers can reuse it — e.g. incremental
    * dedup equi-joins the NEW batch's bands against the EXISTING
    * corpus's bands only, never re-pairing old×old. */
  def minhashBands(sh: DataFrame, docId: String,
      numHashes: Int = 64, bandRows: Int = 4,
      shingleHash: Column => Column = c => xxhash64(c)): DataFrame = {
    require(numHashes % bandRows == 0, "numHashes must divide into bands")
    val spark = sh.sparkSession
    import spark.implicits._
    val p = P
    // shingle → reduced 64-bit hash, codegen'd (xxhash64 by default);
    // one shuffle groups a doc's hashes, then a JVM kernel folds them
    // into minima + band keys (the |shingles|×numHashes inner loop is
    // pure arithmetic — an exploded relational form shuffles nothing
    // more but pays row overhead per (shingle, i) pair).
    val bands = sh
      .withColumn("x", pmod(shingleHash(col("shingle")), lit(p)))
      .groupBy(col(docId)).agg(collect_list(col("x")).as("xs"))
      .as[(Long, Seq[Long])]
      .mapPartitions { it =>
        val as = Array.tabulate(numHashes)(i => (1103515245L * (i + 1) + 12345L) % p)
        val bs = Array.tabulate(numHashes)(i => (22695477L * (i + 1) + 1L) % p)
        val weights = Array.tabulate(bandRows)(r =>
          math.pow(31, bandRows - 1 - r).toLong)
        val nBands = numHashes / bandRows
        it.flatMap { case (id, xs) =>
          val minima = Array.fill(numHashes)(Long.MaxValue)
          xs.foreach { x =>
            var i = 0
            while (i < numHashes) {
              val v = (as(i) * x + bs(i)) % p
              if (v < minima(i)) minima(i) = v
              i += 1
            }
          }
          (0 until nBands).iterator.map { band =>
            var bk = 0L
            var r = 0
            while (r < bandRows) {
              bk += minima(band * bandRows + r) * weights(r); r += 1
            }
            (id, band, bk)
          }
        }
      }.toDF(docId, "band", "bk")
    bands
  }

  /** Full MinHash-LSH near-dup pipeline: candidates, then exact-Jaccard
    * verification (so the output contains no false positives).
    *
    * EAGER: the (small, by definition of "near-dup") verified pair set
    * is materialized via localCheckpoint and the corpus-sized shingle
    * cache is released before returning, so repeated calls in a
    * long-lived session don't accumulate cached relations. */
  def minhashDedupPairs(df: DataFrame, docId: String, text: Column,
      tau: Double, k: Int = 3, numHashes: Int = 64, bandRows: Int = 4)
      : DataFrame = {
    val sh = shingles(df, docId, text, k)
    val out = minhashDedupPairsFromShingles(sh, docId, tau, numHashes,
      bandRows).localCheckpoint(true)
    sh.unpersist()
    out
  }

  /** [[minhashDedupPairs]] over a PRE-BUILT (docId, shingle) relation —
    * lazy, no cache management; the caller owns `sh`'s lifecycle. Lets
    * a composed pipeline (q73 curate) build shingles once and share
    * them between the dedup and boilerplate stages. */
  def minhashDedupPairsFromShingles(sh: DataFrame, docId: String,
      tau: Double, numHashes: Int = 64, bandRows: Int = 4): DataFrame = {
    val cand = minhashCandidates(sh, docId, numHashes, bandRows)
    jaccardForCandidates(cand, sh, docId)
      .filter(col("jaccard") >= tau)
      .select(col(docId + "_a"), col(docId + "_b"), col("inter"),
        col("n_a"), col("n_b"), col("jaccard"))
  }

  /** Exact Jaccard for a GIVEN pair set only (candidates from LSH or
    * any blocker): restricts the posting-list join to candidate pairs,
    * so verification cost is O(candidates · shingles-per-doc), never
    * the full inverted-index pair expansion. */
  def jaccardForCandidates(cand: DataFrame, sh: DataFrame, docId: String)
      : DataFrame = {
    val a = docId + "_a"; val b = docId + "_b"
    val card = sh.groupBy(col(docId)).agg(count(lit(1)).as("n"))
    cand
      .join(sh.toDF(a, "shingle"), a)
      .join(sh.toDF(b, "shingle"), Seq(b, "shingle"))
      .groupBy(col(a), col(b)).agg(count(lit(1)).as("inter"))
      .join(card.toDF(a, "n_a"), a)
      .join(card.toDF(b, "n_b"), b)
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
  }

  /** SimHash near-dup pairs by Hamming distance, banded: split the
    * b-bit hash into `b / bandBits` chunks and equi-join on any shared
    * chunk — by pigeonhole, two hashes within Hamming distance
    * `< nBands` MUST agree on at least one untouched chunk, so recall
    * is EXACT (unlike probabilistic MinHash banding), while the join
    * never materializes the n² pair space. Candidates are verified
    * with the true bit_count(xor). */
  def simhashPairs(df: DataFrame, docId: String, text: Column,
      bits: Int = 32, maxHamming: Int = 2, bandBits: Int = 8)
      : DataFrame = {
    val nBands = bits / bandBits
    require(maxHamming < nBands,
      s"recall guarantee needs maxHamming < $nBands bands")
    val sh = simhash(df, docId, text, bits)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mask = (1 << bandBits) - 1
    val banded = sh
      .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("bk",
        expr(s"shiftright(simhash, band * $bandBits) & $mask"))
      .select(col(docId), col("band"), col("bk"))
    val cand = banded.toDF(docId + "_a", "band", "bk")
      .join(banded.toDF(docId + "_b", "band", "bk"), Seq("band", "bk"))
      .filter(col(docId + "_a") < col(docId + "_b"))
      .select(docId + "_a", docId + "_b").distinct()
    // eagerly materialize the (small) verified pair set and release the
    // signature cache — no corpus-sized relation outlives the call
    val out = cand
      .join(sh.toDF(docId + "_a", "sh_a"), docId + "_a")
      .join(sh.toDF(docId + "_b", "sh_b"), docId + "_b")
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col(docId + "_a"), col(docId + "_b"), col("hamming"))
      .localCheckpoint(true)
    sh.unpersist()
    out
  }

  /** SimHash over token multisets, b-bit (default 32): per token the
    * portable polynomial hash h, per bit j the derived bit of
    * (a_j·h + b_j) mod p, summed ±1 over tokens; sign → bit j.
    *
    * Runs as a single map-side `mapPartitions` kernel — tokenize, hash
    * and fold all `bits` counters per document in one JVM pass, no
    * shuffle at all (the relational form explodes tokens × bits rows
    * through two shuffled groupBys: measured 5-8× slower and fragile
    * under load). Identical integer math to the exploded form, so the
    * relational DuckDB oracle still replays it bit-for-bit; a document
    * with no tokens emits no row (= unnest of an empty list).
    * Near-dup pairs = small Hamming distance on the result. */
  def simhash(df: DataFrame, docId: String, text: Column, bits: Int = 32)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = P
    df.select(col(docId).cast("long"), text.cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val as = Array.tabulate(bits)(j => (1103515245L * (j + 1) + 12345L) % p)
        val bs = Array.tabulate(bits)(j => (22695477L * (j + 1) + 1L) % p)
        it.flatMap { case (id, t) =>
          val toks = if (t == null) Array.empty[String]
            else t.split(" ").filter(_.nonEmpty)
          if (toks.isEmpty) Iterator.empty
          else {
            val s = new Array[Long](bits)
            toks.foreach { tok =>
              val h = graft.functions.TextFunctions.polyHashJvm(tok)
              var j = 0
              while (j < bits) {
                // ((a_j·h + b_j) mod p) mod 2 → ±1 vote, as in the oracle
                s(j) += (as(j) * h + bs(j)) % p % 2 * 2 - 1
                j += 1
              }
            }
            var sim = 0L
            var j = 0
            while (j < bits) { if (s(j) > 0) sim |= (1L << j); j += 1 }
            Iterator((id, sim))
          }
        }
      }.toDF(docId, "simhash")
  }
}
