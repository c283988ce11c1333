package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity.{FP, fixedDS}

/** IVF (inverted-file) approximate nearest neighbour — the
  * cluster-pruned alternative to hyperplane LSH (`Similarity.lshTopK`).
  *
  * Structure: a small set of centroids partitions the corpus into
  * cells ("inverted lists"); a query probes only its `nProbe` nearest
  * cells and reranks exactly inside them. Recall is governed by
  * nProbe/nCells; cost drops from |corpus| to ~|corpus|·nProbe/nCells
  * dot products per query.
  *
  * Determinism: centroids are seeded from the first `nCells` corpus
  * rows by id and refined with a fixed number of Lloyd iterations in
  * fixed-point integer arithmetic (sum div count — exact), so the
  * index is reproducible run-to-run. Centroid sets are tiny and ride
  * broadcasts; the corpus is assigned in one map-side pass and the
  * search shuffles only (cell, query) candidates — at 100 TB the
  * inverted lists are the partition layout (write the corpus bucketed
  * by cell id) and probing reads only the probed buckets.
  */
object IvfIndex {

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Squared L2 distance in fixed point (fits long for |x|≤1e7·1, but
    * summed in BigInt-free safe range: diffs ≤2e7, squares ≤4e14,
    * ×64 dims ≤ 2.6e16 ≪ 2^63). */
  private def dist2(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic centroids: seed = lowest-id rows, then `iters`
    * Lloyd steps computed driver-side over a sampled (or full, when
    * small) collected corpus. Returns nCells fixed-point centroids. */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int = 2, sampleLimit: Int = 10000)
      : Array[Array[Long]] = {
    val sample = fixedDS(corpus, idCol, vecCol)
      .orderBy(col("id")).limit(sampleLimit).collect()
    require(sample.length >= nCells, s"need ≥ $nCells vectors")
    var cents = sample.take(nCells).map(_.v)
    var it = 0
    while (it < iters) {
      val dims = cents(0).length
      val sums = Array.fill(nCells)(new Array[Long](dims))
      val counts = new Array[Long](nCells)
      sample.foreach { r =>
        val c = nearestCell(r.v, cents)
        counts(c) += 1
        var i = 0
        while (i < dims) { sums(c)(i) += r.v(i); i += 1 }
      }
      cents = Array.tabulate(nCells) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(dims)(i => sums(c)(i) / counts(c)) // exact div
      }
      it += 1
    }
    cents
  }

  /** Lloyd refinement over the FULL corpus, distributed — the at-scale
    * replacement for the sampled driver-side [[centroids]]: assignment
    * is one map-side pass with the centroid set broadcast, and the
    * per-cell sums are PARTIAL-AGGREGATED per partition (each task
    * emits at most nCells (cell, count, sums) rows — the map-side
    * combine), so the driver only ever folds numPartitions·nCells tiny
    * rows into the K×D centroid table. No corpus collect at any size.
    *
    * Exactness law (CorpusOpsSpec): because the fold is integer
    * arithmetic (order-independent sums, truncating division — both
    * exact), `fitDistributed(corpus)` equals `centroids(corpus)` with
    * a full-corpus sample, bit for bit.
    */
  def fitDistributed(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int = 2): Array[Array[Long]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val fixed = fixedDS(corpus, idCol, vecCol)
    var cents = fixed.orderBy(col("id")).limit(nCells).collect()
      .sortBy(_.id).map(_.v)
    require(cents.length >= nCells, s"need ≥ $nCells vectors")
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = fixed.mapPartitions { rows =>
        val cs = bc.value
        val dims = cs(0).length
        val sums = Array.fill(cs.length)(new Array[Long](dims))
        val counts = new Array[Long](cs.length)
        rows.foreach { r =>
          val c = nearestCell(r.v, cs)
          counts(c) += 1
          var i = 0
          while (i < dims) { sums(c)(i) += r.v(i); i += 1 }
        }
        Iterator.range(0, cs.length).filter(counts(_) > 0)
          .map(c => (c, counts(c), sums(c)))
      }.collect()
      val dims = cents(0).length
      val sums = Array.fill(nCells)(new Array[Long](dims))
      val counts = new Array[Long](nCells)
      partials.foreach { case (c, n, s) =>
        counts(c) += n
        var i = 0
        while (i < dims) { sums(c)(i) += s(i); i += 1 }
      }
      cents = Array.tabulate(nCells) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(dims)(i => sums(c)(i) / counts(c))
      }
      bc.destroy()
      it += 1
    }
    cents
  }

  /** Full-corpus cell assignment with the exact fixed-point distance:
    * (id, cell, d2) — one map-side pass, centroids broadcast. */
  def fitAssign(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Long]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    fixedDS(corpus, idCol, vecCol)
      .map { r =>
        val c = nearestCell(r.v, bc.value)
        (r.id, c, dist2(r.v, bc.value(c)))
      }
      .toDF(idCol, "cell", "d2")
  }

  private def nearestCell(v: Array[Long], cents: Array[Array[Long]]): Int = {
    var best = 0; var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = dist2(v, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def nearestCells(v: Array[Long], cents: Array[Array[Long]],
      n: Int): Array[Int] =
    cents.indices.sortBy(c => (dist2(v, cents(c)), c)).take(n).toArray

  /** Assign every corpus row to its cell: (id, cell) — one map-side
    * pass with the centroid set broadcast. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Long]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    fixedDS(corpus, idCol, vecCol)
      .map(r => (r.id, nearestCell(r.v, bc.value)))
      .toDF(idCol, "cell")
  }

  /** Persist the corpus as an ON-DISK IVF index: fixed-point vectors
    * written as Hive-style parquet partitioned by cell id, plus the
    * centroid set at `<path>.centroids`. A probe scan filters on the
    * cell column, so planning-time partition pruning reads ONLY the
    * probed cells' directories — zero I/O for every other inverted
    * list. This is the at-scale layout the in-memory [[topK]]
    * describes: the inverted lists ARE the partition layout. */
  def writeIndexed(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, nCells: Int = 16, iters: Int = 2,
      sampleLimit: Int = 10000): Array[Array[Long]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = centroids(corpus, idCol, vecCol, nCells, iters, sampleLimit)
    val bc = spark.sparkContext.broadcast(cents)
    val assigned = fixedDS(corpus, idCol, vecCol)
      .map(r => (r.id, r.v, nearestCell(r.v, bc.value)))
      .toDF(idCol, "v", "cell")
    graft.sources.Formats.writePartitioned(assigned, path, Seq("cell"))
    cents.zipWithIndex.map { case (v, c) => (c, v) }.toSeq
      .toDF("cell", "v").coalesce(1)
      .write.mode("overwrite").parquet(path + ".centroids")
    cents
  }

  /** Scan of the probed cells ONLY: the `cell IN (...)` predicate is a
    * partition filter, pruned at planning time (assert-able via the
    * scan's PartitionFilters metadata — see CorpusOpsSpec). */
  def probedScan(spark: org.apache.spark.sql.SparkSession, path: String,
      cells: Seq[Int]): DataFrame =
    spark.read.parquet(path).filter(col("cell").isin(cells: _*))

  /** Top-k search over an on-disk index written by [[writeIndexed]]:
    * queries (small side by contract) are collected, their probe cells
    * computed against the stored centroids, and the corpus scan is
    * pruned to the union of probed cells before the per-query
    * cell-membership check and exact rerank. */
  def topKIndexed(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, idCol: String, vecCol: String, path: String,
      k: Int, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(path + ".centroids")
      .orderBy(col("cell"))
      .as[(Int, Array[Long])].collect()
      .map(_._2)
    val qArr = fixedDS(queries, idCol, vecCol).collect()
    val probed = qArr.map(q => (q.id, q.v, nearestCells(q.v, cents, nProbe)))
    val allCells = probed.flatMap(_._3).distinct.toSeq
    val bcQ = spark.sparkContext.broadcast(probed)
    val scored = probedScan(spark, path, allCells)
      .select(col(idCol).cast("long"), col("v"), col("cell").cast("int"))
      .as[(Long, Array[Long], Int)]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.flatMap { case (nid, cv, cell) =>
          qs.iterator.collect {
            case (qid, qv, probes) if probes.contains(cell) && qid != nid =>
              (qid, nid, dot(qv, cv))
          }
        }
      }.toDF("query_id", "neighbor_id", "dot_fp")
    Similarity.rankTopK(scored, k)
  }

  /** IVF top-k search: probe `nProbe` cells per query, exact rerank by
    * descending dot product (ties → ascending id). Output matches the
    * (query_id, neighbor_id, dot_fp, rn) shape of the other k-NN ops. */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4)
      : DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = centroids(corpus, idCol, vecCol, nCells)
    val bcC = spark.sparkContext.broadcast(cents)
    val assigned = fixedDS(corpus, idCol, vecCol)
      .map(r => (r.id, nearestCell(r.v, bcC.value), r.v))
      .toDF("neighbor_id", "cell", "cv")
    val qArr = fixedDS(queries, idCol, vecCol).collect()
    val bcQ = spark.sparkContext.broadcast(
      qArr.map(q => (q.id, q.v, nearestCells(q.v, cents, nProbe))))
    val scored = assigned.as[(Long, Int, Array[Long])]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.flatMap { case (nid, cell, cv) =>
          qs.iterator.collect {
            case (qid, qv, probes)
                if probes.contains(cell) && qid != nid =>
              (qid, nid, dot(qv, cv))
          }
        }
      }.toDF("query_id", "neighbor_id", "dot_fp")
    Similarity.rankTopK(scored, k)
  }
}
