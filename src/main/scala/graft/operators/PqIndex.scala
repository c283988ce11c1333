package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Similarity.{FP, fixedDS}

/** Product quantization (PQ) for approximate nearest neighbour —
  * Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
  * Search" (TPAMI 2011): the COMPRESSED-DOMAIN scan that complements
  * IVF's candidate pruning ([[IvfIndex]]) and int8's uniform
  * quantization (`Similarity.bruteForceTopKQuantized`).
  *
  * The D-dim space is split into M subspaces of D/M dims; each
  * subspace learns its own K-centroid codebook; a corpus vector is
  * stored as M small code indices (M bytes at K≤256 — an 8×64-float
  * vector becomes 8 bytes, a 32× compression). A query is NOT
  * quantized (asymmetric distance computation, ADC): per subspace it
  * precomputes the K dot products against the codebook — an M×K
  * lookup table — and a corpus vector's approximate score is M table
  * lookups + adds, no multiplies.
  *
  * 100 TB posture: the scan state per query is the M×K LUT (tiny,
  * broadcast); the corpus moves as codes (32× fewer bytes than raw
  * floats — the scan becomes memory-bandwidth-bound on codes, which
  * is the whole point of PQ at scale); per-partition bounded heaps
  * keep the shuffle at queries×partitions×k candidate rows, never
  * queries×corpus. Codebook fitting is the [[IvfIndex.fitDistributed]]
  * partial-aggregation pattern run per subspace — each task emits at
  * most M×K (subspace, cell, count, sums) rows, no corpus collect.
  *
  * Determinism (the oracle replays every step): fixed-point vectors
  * (floor ×1e7), seeds = the M subvectors of the K lowest-id corpus
  * rows, a fixed number of Lloyd iterations, L2 assignment with
  * strict-< smallest-index tie-break, truncating integer mean
  * (Java `/` ≡ DuckDB `//` toward zero), empty cells keep their
  * previous centroid. ADC scores are exact integer arithmetic.
  */
object PqIndex {

  /** codebooks(m)(k) = fixed-point centroid of subspace m, cell k. */
  final case class Codebooks(dsub: Int, cents: Array[Array[Array[Long]]]) {
    def m: Int = cents.length
    def k: Int = cents(0).length
  }

  private def dist2(a: Array[Long], off: Int, c: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < c.length) { val d = a(off + i) - c(i); s += d * d; i += 1 }
    s
  }

  private def nearest(v: Array[Long], off: Int,
      cb: Array[Array[Long]]): Int = {
    var best = 0; var bestD = Long.MaxValue
    var c = 0
    while (c < cb.length) {
      val d = dist2(v, off, cb(c))
      if (d < bestD) { bestD = d; best = c } // strict <: lowest index wins ties
      c += 1
    }
    best
  }

  /** Distributed per-subspace Lloyd fit: one broadcast + one
    * partial-aggregated pass per iteration, all M subspaces in the
    * SAME pass (not M passes). */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 2): Codebooks = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val fixed = fixedDS(corpus, idCol, vecCol)
    val seeds = fixed.orderBy(col("id")).limit(k).collect()
      .sortBy(_.id).map(_.v)
    require(seeds.length >= k, s"need ≥ $k vectors to seed PQ")
    val dims = seeds(0).length
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val dsub = dims / m
    var cents: Array[Array[Array[Long]]] = Array.tabulate(m) { mm =>
      Array.tabulate(k)(kk =>
        java.util.Arrays.copyOfRange(seeds(kk), mm * dsub, (mm + 1) * dsub))
    }
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      // partial sums per (subspace, cell): each task emits ≤ m·k rows
      val partials = fixed.mapPartitions { rows =>
        val cs = bc.value
        val sums = Array.fill(m, k)(new Array[Long](dsub))
        val counts = Array.fill(m, k)(0L)
        rows.foreach { r =>
          var mm = 0
          while (mm < m) {
            val c = nearest(r.v, mm * dsub, cs(mm))
            counts(mm)(c) += 1
            var i = 0
            while (i < dsub) { sums(mm)(c)(i) += r.v(mm * dsub + i); i += 1 }
            mm += 1
          }
        }
        for (mm <- Iterator.range(0, m); c <- Iterator.range(0, k)
          if counts(mm)(c) > 0) yield (mm, c, counts(mm)(c), sums(mm)(c))
      }.collect()
      val sums = Array.fill(m, k)(new Array[Long](dsub))
      val counts = Array.fill(m, k)(0L)
      partials.foreach { case (mm, c, n, s) =>
        counts(mm)(c) += n
        var i = 0
        while (i < dsub) { sums(mm)(c)(i) += s(i); i += 1 }
      }
      cents = Array.tabulate(m) { mm =>
        Array.tabulate(k) { c =>
          if (counts(mm)(c) == 0) cents(mm)(c)
          else Array.tabulate(dsub)(i => sums(mm)(c)(i) / counts(mm)(c))
        }
      }
      bc.destroy()
      it += 1
    }
    Codebooks(dsub, cents)
  }

  /** Corpus → (id, codes): M small indices per vector — the 32×
    * compressed representation a 100 TB scan actually moves. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks): Dataset[(Long, Array[Int])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    fixedDS(corpus, idCol, vecCol).map { r =>
      val b = bc.value
      (r.id, Array.tabulate(b.m)(mm => nearest(r.v, mm * b.dsub, b.cents(mm))))
    }
  }

  /** ADC top-k: exact queries against the encoded corpus. Returns the
    * shared k-NN contract (query_id, neighbor_id, dot_fp, rn) where
    * dot_fp is the ADC APPROXIMATION of the fixed-point dot product
    * (sum over subspaces of dot(q_m, centroid[code_m])). Per-partition
    * bounded heaps (exact for top-k under merge) keep the shuffle at
    * |queries|·partitions·k rows. */
  def adcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, cb: Codebooks, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qs = fixedDS(queries, idCol, vecCol).collect().sortBy(_.id)
    // M×K LUT per query: dot(q_m, c_{m,kk}) — integer exact
    val luts: Array[(Long, Array[Array[Long]])] = qs.map { q =>
      val t = Array.tabulate(cb.m) { mm =>
        Array.tabulate(cb.k) { kk =>
          var s = 0L; var i = 0
          val c = cb.cents(mm)(kk)
          while (i < cb.dsub) { s += q.v(mm * cb.dsub + i) * c(i); i += 1 }
          s
        }
      }
      (q.id, t)
    }
    val bcLut = spark.sparkContext.broadcast(luts)
    val candidates = encode(corpus, idCol, vecCol, cb)
      .mapPartitions { rows =>
        val ls = bcLut.value
        // one bounded heap per query: worst (score, id) evicted first
        val ord = Ordering.by[(Long, Long), (Long, Long)] {
          case (score, id) => (-score, id)
        }
        val heaps = ls.map(_ => new scala.collection.mutable.PriorityQueue[
          (Long, Long)]()(ord))
        rows.foreach { case (id, codes) =>
          var qi = 0
          while (qi < ls.length) {
            val (qid, lut) = ls(qi)
            if (qid != id) {
              var s = 0L; var mm = 0
              while (mm < codes.length) { s += lut(mm)(codes(mm)); mm += 1 }
              heaps(qi).enqueue((s, id))
              if (heaps(qi).size > k) { heaps(qi).dequeue(): Unit }
            }
            qi += 1
          }
        }
        Iterator.range(0, ls.length).flatMap(qi =>
          heaps(qi).toSeq.map { case (s, id) => (ls(qi)._1, id, s) })
      }
      .toDF("query_id", "neighbor_id", "dot_fp")
    Similarity.rankTopK(candidates, k)
  }
}
