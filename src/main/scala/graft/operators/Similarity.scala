package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star scope): brute-force cosine
  * top-k as the exact baseline, random-hyperplane LSH bucketing as the
  * sub-quadratic scale path. Embeddings are `array<float>` columns.
  *
  * Fixed-point discipline: floats are mapped to BIGINT once via
  * floor(x·1e7) and ALL similarity math is exact integer arithmetic —
  *  - order-independent (a shuffled aggregation cannot change the sum),
  *  - overflow-safe (|x|≤1 ⇒ products ≤ 1e14, dims·1e14 ≪ 2^63),
  *  - reproducible bit-for-bit by any engine (the DuckDB oracle).
  * For unit-normalized embeddings dotInt/1e14 IS the cosine.
  *
  * Execution shape: the dot-product kernels run as primitive-array
  * loops inside `mapPartitions` with the SMALL side broadcast —
  * Spark's `transform`/`aggregate` higher-order functions are
  * interpreted (no whole-stage codegen), an order of magnitude slower
  * per row, so the hot numeric loop stays in plain JVM code while
  * candidate generation/rerank stay relational. The corpus side is
  * never collected: it streams partition-by-partition, so the pattern
  * scales to any corpus size as long as the broadcast side (queries /
  * LSH planes) stays small; all-pairs self-comparison broadcasts the
  * corpus and is for corpora that fit an executor (use LSH above that).
  */
object Similarity {

  final case class FP(id: Long, v: Array[Long])

  /** array<float> → array<bigint> fixed-point at 1e7 (floor — exact and
    * tie-free, unlike round, across engines). */
  def fixedPoint(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1e7)).cast("long"))

  /** Column-level exact integer dot product (declarative variant; the
    * hot paths below use the JVM kernel instead). */
  def dotInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, v) => s + v)

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** (id, fixed-point vector) typed view of an embedding table. */
  def fixedDS(df: DataFrame, idCol: String, vecCol: String): Dataset[FP] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("id"), fixedPoint(col(vecCol)).as("v")).as[FP]
  }

  /** Shared top-k ranking contract of every k-NN operator (brute
    * force, LSH, IVF): descending dot, ascending neighbor id tiebreak,
    * (query_id, neighbor_id, dot_fp, rn) output. */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("dot_fp").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dot_fp"), col("rn"))
  }

  /** int8 quantization: floor(x·127) clamped to [-127, 127] — the
    * classic 4×-smaller embedding representation (1 byte/dim). At
    * 100 TB this is the storage/shuffle-bandwidth lever: a scan or
    * candidate sweep moves a quarter of the bytes, and the integer
    * dot stays exact and engine-replayable (floor + clamp are the
    * same IEEE/integer ops everywhere). Values land as BIGINT columns
    * for arithmetic; a production layout would pack them to
    * `binary`/`tinyint` on disk. */
  def quantizeInt8(vec: Column): Column =
    transform(vec, x => greatest(lit(-127L),
      least(lit(127L), floor(x.cast("double") * lit(127.0)).cast("long"))))

  private def encDS(df: DataFrame, idCol: String, vecCol: String,
      enc: Column => Column): Dataset[FP] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("id"), enc(col(vecCol)).as("v")).as[FP]
  }

  private def topKWith(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, enc: Column => Column)
      : DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr = encDS(queries, idCol, vecCol, enc).collect().sortBy(_.id)
    val bc = spark.sparkContext.broadcast(qArr)
    val scored = encDS(corpus, idCol, vecCol, enc).mapPartitions { it =>
      val qs = bc.value
      it.flatMap { c =>
        qs.iterator.filter(_.id != c.id)
          .map(q => (q.id, c.id, dot(q.v, c.v)))
      }
    }.toDF("query_id", "neighbor_id", "dot_fp")
    rankTopK(scored, k)
  }

  /** Brute-force k-NN: for every row of `queries`, the top-k rows of
    * `corpus` by descending dot product (ties → ascending corpus id).
    * Queries are collected + broadcast (the small side by contract);
    * the corpus streams through one scan, emitting |queries| scored
    * rows per corpus row; one window ranks the candidates. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    topKWith(queries, corpus, idCol, vecCol, k, fixedPoint)

  /** Brute-force k-NN in the int8-quantized domain (same ranking
    * contract; scores are exact quantized-integer dots, |dims·127²| ≪
    * 2^63). Recall vs the full-precision ranking is pinned by
    * CorpusOpsSpec on the driver corpus. */
  def bruteForceTopKQuantized(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    topKWith(queries, corpus, idCol, vecCol, k, quantizeInt8)

  /** Deterministic ±1 pseudo-hyperplane component for (plane j, dim i):
    * a middle bit of an affine map over the flattened index — pure
    * integer math simple enough for the DuckDB oracle to replay
    * bit-for-bit (q21 does exactly that).
    *
    * QUALITY CAVEAT (measured): because the map is affine in the index
    * (an arithmetic progression, not an iterated generator), sign rows
    * of nearby planes are correlated — a concrete sf0.1 pair at cosine
    * 0.512 agreed on only 31% of these planes vs the theoretical
    * 1 − θ/π = 67% — so recall curves computed from the random-
    * hyperplane formula do NOT hold for this family. It is kept solely
    * for oracle-replayable bucketing; quality-bearing paths use
    * [[planeSignSplitmix]], which matches theory (66.4% on the same
    * pair). */
  def planeSignValue(j: Long, i: Long, dims: Int): Long = {
    val m = (1103515245L * (j * dims + i + 1) + 12345L) % 2147483648L
    (m >> 10) % 2L * 2L - 1L
  }

  /** splitmix64 finalizer — full-avalanche 64-bit mixing, so plane sign
    * rows are statistically independent and the standard hyperplane-LSH
    * recall formula applies. Deterministic, seedless, dependency-free. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** ±1 hyperplane component from splitmix64 — the production plane
    * family (see the caveat on [[planeSignValue]]). */
  def planeSignSplitmix(j: Long, i: Long, dims: Int): Long =
    (mix64(j * dims + i) & 1L) * 2L - 1L

  private def planes(bits: Int, tables: Int, dims: Int,
      signFn: (Long, Long, Int) => Long): Array[Array[Long]] =
    Array.tabulate(tables * bits)(j =>
      Array.tabulate(dims)(i => signFn(j.toLong, i.toLong, dims)))

  /** Random-hyperplane LSH bucket keys: `tables` independent hash
    * tables of `bits` hyperplanes each. Returns (id, table, bucket).
    * Sign matrix is precomputed once and broadcast; one map-side pass,
    * no shuffle. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
      bits: Int, tables: Int, dims: Int = 64,
      signFn: (Long, Long, Int) => Long = planeSignValue): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(planes(bits, tables, dims, signFn))
    fixedDS(df, idCol, vecCol).mapPartitions { it =>
      val ps = bc.value
      it.flatMap { r =>
        // a vector wider than the plane matrix would silently bucket
        // by its first `dims` components — fail loudly instead
        require(r.v.length == dims,
          s"lshBuckets: vector of ${r.v.length} dims, planes built for $dims")
        (0 until tables).iterator.map { t =>
          var bucket = 0L
          var b = 0
          while (b < bits) {
            if (dot(r.v, ps(t * bits + b)) >= 0L) bucket |= (1L << b)
            b += 1
          }
          (r.id, t, bucket)
        }
      }
    }.toDF(idCol, "t", "bucket")
  }

  /** LSH-accelerated k-NN: bucket-join candidates (any shared table
    * bucket), then exact fixed-point rerank to top-k. Sub-quadratic:
    * one shuffle on (table, bucket), candidate count governed by
    * bits/tables. Recall < 1 by construction — the exact top-k among
    * retrieved candidates is returned. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8, tables: Int = 16,
      dims: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qb = lshBuckets(queries, idCol, vecCol, bits, tables, dims)
      .toDF("query_id", "t", "bucket")
    val cb = lshBuckets(corpus, idCol, vecCol, bits, tables, dims)
      .toDF("neighbor_id", "t", "bucket")
    val cand = qb.join(cb, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qArr = fixedDS(queries, idCol, vecCol).collect()
      .map(r => r.id -> r.v).toMap
    val bc = spark.sparkContext.broadcast(qArr)
    val scored = cand
      .join(fixedDS(corpus, idCol, vecCol).toDF("neighbor_id", "cv"),
        "neighbor_id")
      .as[(Long, Long, Array[Long])]
      .mapPartitions { it =>
        val qs = bc.value
        it.map { case (nid, qid, cv) => (qid, nid, dot(qs(qid), cv)) }
      }.toDF("query_id", "neighbor_id", "dot_fp")
    rankTopK(scored, k)
  }

  /** All corpus pairs with dot ≥ tauFp (fixed-point threshold) — the
    * EXHAUSTIVE embedding-cosine near-dup operator, as a distributed
    * block self-join: every row is replicated to the B block-pair
    * tasks it participates in (shuffle volume n·B — size `blocks`
    * with that in mind), shuffled once on the
    * (blockA, blockB) key, and each of the B·(B+1)/2 tasks computes
    * its cross/within pairs in a JVM kernel. Nothing is ever collected
    * to the driver and per-task memory is 2·n/B vectors — pick
    * `blocks` so that fits an executor and the operator survives any
    * corpus size.
    *
    * Note on candidate pruning: this corpus's pair-similarity
    * distribution is a smooth tail with NO margin at the threshold
    * (measured at sf0.1: min-above 4.501e13 vs max-below 4.497e13
    * dot_fp, i.e. cosine 0.4501 vs 0.4497), so no LSH parameterization
    * can both guarantee this exhaustive output and prune (at cosine
    * 0.45 the per-bit collision rate is 1 − acos(0.45)/π ≈ 0.65, and
    * any (bits, tables) with near-1 recall admits ≳ all pairs as
    * candidates). Exhaustive-at-low-threshold is inherently O(n²)
    * work; what must NOT be O(n) is driver memory — and here it is
    * O(1). For the high-similarity regime (cosine ≥ ~0.8, the actual
    * near-dup use case) use [[nearDupPairsLsh]], which is
    * sub-quadratic. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      tauFp: Long, blocks: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val B = blocks
    fixedDS(df, idCol, vecCol)
      .flatMap { r =>
        val b = java.lang.Math.floorMod(r.id, B.toLong).toInt
        // as the lower block of pairs (b, j≥b) — includes (b, b) once —
        // and as the upper block of pairs (i<b, b)
        (b until B).iterator.map(j => (b, j, r.id, r.v)) ++
          (0 until b).iterator.map(i => (i, b, r.id, r.v))
      }
      .groupByKey { case (bi, bj, _, _) => (bi, bj) }
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Long, Array[Long])]) =>
        val (bi, bj) = key
        val rows = it.map { case (_, _, id, v) => (id, v) }.toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        if (bi == bj) {
          var i = 0
          while (i < rows.length) {
            var j = i + 1
            while (j < rows.length) {
              val d = dot(rows(i)._2, rows(j)._2)
              if (d >= tauFp) {
                val (lo, hi) = if (rows(i)._1 < rows(j)._1) (rows(i)._1, rows(j)._1)
                  else (rows(j)._1, rows(i)._1)
                out += ((lo, hi, d))
              }
              j += 1
            }
            i += 1
          }
        } else {
          val left = rows.filter(r => java.lang.Math.floorMod(r._1, B.toLong) == bi)
          val right = rows.filter(r => java.lang.Math.floorMod(r._1, B.toLong) == bj)
          left.foreach { a =>
            right.foreach { b =>
              val d = dot(a._2, b._2)
              if (d >= tauFp) {
                val (lo, hi) = if (a._1 < b._1) (a._1, b._1) else (b._1, a._1)
                out += ((lo, hi, d))
              }
            }
          }
        }
        out.iterator
      }.toDF("id_a", "id_b", "dot_fp")
  }

  /** Sub-quadratic near-dup pairs for the HIGH-similarity regime: LSH
    * bucket candidates (any shared (table, bucket)), then an exact
    * fixed-point dot verify of candidates only — so the output never
    * contains a false positive, and recall is governed by the LSH
    * parameters: a pair at cosine s collides per table with probability
    * (1 − acos(s)/π)^bits, and is missed by all tables with probability
    * (1 − (1 − acos(s)/π)^bits)^tables — e.g. ≈ 4·10⁻³ at s = 0.9 with
    * 8 bits × 16 tables, and vanishing as s → 1 (the duplicates an LLM
    * training pipeline prunes). No corpus collect anywhere: buckets are
    * map-side, candidates shuffle on (table, bucket), and the verify is
    * two equi-joins back to the vectors. */
  def nearDupPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      tauFp: Long, bits: Int = 8, tables: Int = 16, dims: Int = 64)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      planes(bits, tables, dims, planeSignSplitmix))
    // bucket rows CARRY the vector, so candidate verification streams
    // straight out of the bucket join — no candidate-pair distinct and
    // no id→vector re-joins on the (large) candidate relation; only
    // the verified above-threshold output (small by definition of
    // "near-dup") is deduped across tables. One shuffle total, on
    // (table, bucket).
    val bk = fixedDS(df, idCol, vecCol).mapPartitions { it =>
      val ps = bc.value
      it.flatMap { r =>
        require(r.v.length == dims,
          s"nearDupPairsLsh: vector of ${r.v.length} dims, planes built for $dims")
        (0 until tables).iterator.map { t =>
          var bucket = 0L
          var b = 0
          while (b < bits) {
            if (dot(r.v, ps(t * bits + b)) >= 0L) bucket |= (1L << b)
            b += 1
          }
          (t, bucket, r.id, r.v)
        }
      }
    }.toDF("t", "bucket", "id", "v")
      // both sides of the self-join read this relation — persist, or
      // the corpus scan + bits×tables bucketing kernel runs twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eagerly materialize the (small) verified pair set and release the
    // corpus-sized bucketed cache — repeated calls in a long-lived
    // session must not accumulate cached relations
    val out = bk.toDF("t", "bucket", "id_a", "va")
      .join(bk.toDF("t", "bucket", "id_b", "vb"), Seq("t", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("va"), col("vb"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions(_.flatMap { case (idA, idB, va, vb) =>
        val d = dot(va, vb)
        if (d >= tauFp) Iterator((idA, idB, d)) else Iterator.empty
      })
      .toDF("id_a", "id_b", "dot_fp")
      .distinct()
      .localCheckpoint(true)
    bk.unpersist()
    out
  }
}
