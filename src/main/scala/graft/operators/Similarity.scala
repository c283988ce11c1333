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

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("dot_fp").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dot_fp"), col("rn"))
  }

  /** Brute-force k-NN: for every row of `queries`, the top-k rows of
    * `corpus` by descending dot product (ties → ascending corpus id).
    * Queries are collected + broadcast (the small side by contract);
    * the corpus streams through one scan, emitting |queries| scored
    * rows per corpus row; one window ranks the candidates. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr = fixedDS(queries, idCol, vecCol).collect().sortBy(_.id)
    val bc = spark.sparkContext.broadcast(qArr)
    val scored = fixedDS(corpus, idCol, vecCol).mapPartitions { it =>
      val qs = bc.value
      it.flatMap { c =>
        qs.iterator.filter(_.id != c.id)
          .map(q => (q.id, c.id, dot(q.v, c.v)))
      }
    }.toDF("query_id", "neighbor_id", "dot_fp")
    rankTopK(scored, k)
  }

  /** Deterministic ±1 pseudo-hyperplane component for (plane j, dim i):
    * a middle bit of an LCG over the flattened index — pure integer
    * math, reproducible anywhere (the DuckDB oracle replays it). */
  def planeSignValue(j: Long, i: Long, dims: Int): Long = {
    val m = (1103515245L * (j * dims + i + 1) + 12345L) % 2147483648L
    (m >> 10) % 2L * 2L - 1L
  }

  private def planes(bits: Int, tables: Int, dims: Int)
      : Array[Array[Long]] =
    Array.tabulate(tables * bits)(j =>
      Array.tabulate(dims)(i => planeSignValue(j.toLong, i.toLong, dims)))

  /** Random-hyperplane LSH bucket keys: `tables` independent hash
    * tables of `bits` hyperplanes each. Returns (id, table, bucket).
    * Sign matrix is precomputed once and broadcast; one map-side pass,
    * no shuffle. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
      bits: Int, tables: Int, dims: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(planes(bits, tables, dims))
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
    * embedding-cosine near-dup operator. Corpus broadcast once, then a
    * single map-side pass emits only the above-threshold pairs (no n²
    * shuffle); use LSH candidates instead once the corpus outgrows a
    * broadcast. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      tauFp: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val all = fixedDS(df, idCol, vecCol).collect().sortBy(_.id)
    val bc = spark.sparkContext.broadcast(all)
    fixedDS(df, idCol, vecCol).mapPartitions { it =>
      val arr = bc.value
      it.flatMap { a =>
        // imperative inner loop: no per-pair allocation below threshold
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var i = 0
        while (i < arr.length) {
          val b = arr(i)
          if (b.id > a.id) {
            val d = dot(a.v, b.v)
            if (d >= tauFp) out += ((a.id, b.id, d))
          }
          i += 1
        }
        out
      }
    }.toDF("id_a", "id_b", "dot_fp")
  }
}
