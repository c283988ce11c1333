package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale notes: the query side of a k-NN join should be the small side
  * → broadcast it; the LSH variant shuffles once on (table, bucket) and
  * never materializes the n² pair space.
  */
object Similarity {

  /** array<float> → array<bigint> fixed-point at 1e7 (floor — exact and
    * tie-free, unlike round, across engines). */
  def fixedPoint(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1e7)).cast("long"))

  /** Exact integer dot product of two fixed-point vectors. */
  def dotInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, v) => s + v)

  /** Brute-force k-NN: for every row of `queries`, the top-k rows of
    * `corpus` by descending dot product (ties → ascending corpus id).
    * Join is a broadcast of the query side — corpus stays partitioned;
    * cost |corpus|·|queries| dot products, the exact-recall baseline. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      fixedPoint(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      fixedPoint(col(vecCol)).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot_fp", dotInt(col("qv"), col("cv")))
    Dedup.topKPerGroup(scored,
      partition = Seq(col("query_id")),
      order = Seq(col("dot_fp").desc, col("neighbor_id").asc), k = k)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("dot_fp").desc, col("neighbor_id").asc)))
      .select(col("query_id"), col("neighbor_id"), col("dot_fp"), col("rn"))
  }

  /** Deterministic ±1 pseudo-hyperplane component for (plane j, dim i):
    * a middle bit of an LCG over the flattened index — pure integer
    * math, reproducible anywhere. */
  private def planeSign(j: Column, i: Column, dims: Int): Column = {
    val m = (lit(1103515245L) * (j * dims + i + 1) + lit(12345L)) %
      lit(2147483648L)
    pmod(shiftright(m, 10), lit(2L)) * 2L - 1L
  }

  /** Random-hyperplane LSH bucket keys: `tables` independent hash
    * tables of `bits` hyperplanes each. Returns (id, table, bucket).
    * Two vectors share a bucket in table t iff all `bits` sign bits
    * agree — P[agree per bit] = 1 − θ/π. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
      bits: Int, tables: Int): DataFrame = {
    val dims = 64
    df.select(col(idCol), fixedPoint(col(vecCol)).as("fv"))
      .withColumn("t", explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("b", explode(sequence(lit(0), lit(bits - 1))))
      .withColumn("j", col("t") * bits + col("b"))
      .withColumn("proj",
        aggregate(
          zip_with(col("fv"),
            transform(sequence(lit(0), lit(dims - 1)),
              i => planeSign(col("j"), i, dims)),
            (x, s) => x * s),
          lit(0L), (acc, v) => acc + v))
      .withColumn("sbit", when(col("proj") >= 0, 1L).otherwise(0L))
      .groupBy(col(idCol), col("t"))
      .agg(sum(expr("shiftleft(sbit, b)")).as("bucket"))
  }

  /** LSH-accelerated k-NN: bucket-join candidates (any shared table
    * bucket), then exact fixed-point rerank to top-k. Sub-quadratic:
    * one shuffle on (table, bucket), candidate count governed by
    * bits/tables. Recall < 1 by construction — the exact top-k among
    * retrieved candidates is returned. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8, tables: Int = 16)
      : DataFrame = {
    val qb = lshBuckets(queries, idCol, vecCol, bits, tables)
      .toDF("query_id", "t", "bucket")
    val cb = lshBuckets(corpus, idCol, vecCol, bits, tables)
      .toDF("neighbor_id", "t", "bucket")
    val cand = qb.join(cb, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val q = queries.select(col(idCol).as("query_id"),
      fixedPoint(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      fixedPoint(col(vecCol)).as("cv"))
    val scored = cand.join(broadcast(q), "query_id").join(c, "neighbor_id")
      .withColumn("dot_fp", dotInt(col("qv"), col("cv")))
    Dedup.topKPerGroup(scored,
      partition = Seq(col("query_id")),
      order = Seq(col("dot_fp").desc, col("neighbor_id").asc), k = k)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("dot_fp").desc, col("neighbor_id").asc)))
      .select(col("query_id"), col("neighbor_id"), col("dot_fp"), col("rn"))
  }

  /** All corpus pairs with dot ≥ tauFp (fixed-point threshold) — the
    * embedding-cosine near-dup operator. Brute force n²/2; at scale,
    * feed LSH candidates in instead of the cross join. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      tauFp: Long): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), fixedPoint(col(vecCol)).as("va"))
    val b = df.select(col(idCol).as("id_b"), fixedPoint(col(vecCol)).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("dot_fp", dotInt(col("va"), col("vb")))
      .filter(col("dot_fp") >= tauFp)
      .select(col("id_a"), col("id_b"), col("dot_fp"))
  }
}
