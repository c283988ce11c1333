package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity.fixedDS
import graft.sources.CommitLog

/** INCREMENTAL PQ (product-quantization) index maintenance over the
  * commit-log change feed — [[IvfIncremental]]'s twin for the
  * compressed-domain tier. The 100 TB argument is even stronger here:
  * the ADC scan's whole point is that the corpus moves as M code
  * bytes per vector (32× compression), so re-ENCODING the full corpus
  * on every change (q168's one-shot shape) wastes exactly the
  * bandwidth the codes exist to save. Instead:
  *
  *  - the CODES are a commit-log table `(id, codes, err)` and the
  *    CODEBOOKS a tiny `(m, kk, v, fit_n, fit_err)` table (fit_n /
  *    fit_err carry the fit-time quantization-error baseline,
  *    constant across rows — the table is M×K rows);
  *  - corpus APPENDS/UPDATES encode against the EXISTING codebooks
  *    (one map-side pass, broadcast M×K×dsub longs) and land as a
  *    keyed merge; DELETES tombstone via deletion vectors;
  *  - the applied-through corpus version rides the exactly-once
  *    (appId, batchId) txn stamp — crash-replayed runs skip;
  *  - DRIFT = mean per-vector quantization error of the newly-encoded
  *    delta over the fit-time mean; past a threshold [[maintain]]
  *    re-fits the codebooks and re-encodes (content-replacing
  *    commits) — the re-train-when-recall-decays loop.
  *
  * Laws (PqIncrementalSpec + q229): feed-applied codes are
  * CONTENT-EQUAL to one-shot encoding of the corpus' current snapshot
  * under the same codebooks, and the ADC search over the STORED codes
  * is hash-equal to q168's fit→encode→ADC replay over the final
  * corpus (the oracle reruns the whole pipeline in SQL).
  */
object PqIncremental {

  /** The maintenance loop's txn-stamp app id. */
  val AppId = "pq-maintain"

  /** (id, codes, err): codes = nearest centroid per subspace, err =
    * total squared quantization error (the drift signal), one
    * map-side pass with the codebooks broadcast. */
  private def encodeWithErr(corpus: DataFrame, idCol: String,
      vecCol: String, cb: PqIndex.Codebooks): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    fixedDS(corpus, idCol, vecCol).map { r =>
      val b = bc.value
      // err accumulates as DOUBLE: per-subspace d2 fits a long, but
      // far-off-distribution vectors (the drift case this column
      // exists to catch) can overflow the M-subspace SUM
      var err = 0.0
      val codes = Array.tabulate(b.m) { mm =>
        val cbm = b.cents(mm)
        var best = 0; var bestD = Long.MaxValue
        var c = 0
        while (c < cbm.length) {
          var s = 0L; var i = 0
          val cc = cbm(c)
          while (i < cc.length) {
            val d = r.v(mm * b.dsub + i) - cc(i); s += d * d; i += 1
          }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        err += bestD.toDouble
        best
      }
      (r.id, codes, err)
    }.toDF(idCol, "codes", "err")
  }

  private def loadCodebooks(spark: SparkSession, cbTable: String)
      : PqIndex.Codebooks = {
    import spark.implicits._
    val rows = CommitLog.read(spark, cbTable)
      .select(col("m"), col("kk"), col("v"))
      .as[(Int, Int, Array[Long])].collect()
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val cents = Array.ofDim[Array[Long]](m, k)
    rows.foreach { case (mm, kk, v) => cents(mm)(kk) = v }
    PqIndex.Codebooks(rows.head._3.length, cents.map(_.toArray))
  }

  private def codebookDf(spark: SparkSession, cb: PqIndex.Codebooks,
      codes: DataFrame): DataFrame = {
    import spark.implicits._
    val stats = codes.agg(count(lit(1)),
      sum(col("err"))).collect()(0)
    val n = stats.getLong(0)
    val errSum = if (stats.isNullAt(1)) 0.0 else stats.getDouble(1)
    val rows = for {
      mm <- 0 until cb.m; kk <- 0 until cb.k
    } yield (mm, kk, cb.cents(mm)(kk), n, errSum)
    rows.toDF("m", "kk", "v", "fit_n", "fit_err")
  }

  /** Build the codes + codebooks pair from the corpus table's CURRENT
    * snapshot: distributed per-subspace Lloyd fit, one encode pass,
    * codes committed with the (AppId, corpusVersion) txn stamp.
    * Returns the covered corpus version. */
  def build(spark: SparkSession, corpusTable: String,
      codesTable: String, cbTable: String, idCol: String,
      vecCol: String, m: Int = 8, k: Int = 16, iters: Int = 2): Long = {
    val corpusVersion = CommitLog.currentVersion(spark, corpusTable)
      .getOrElse(throw new IllegalStateException(
        s"PqIncremental.build: nothing committed at $corpusTable"))
    // pin the corpus across the fit + encode: the per-subspace Lloyd
    // fit scans it iters+1 times and the encode once more —
    // unpinned, each pass re-read the parquet
    val corpus = CommitLog.read(spark, corpusTable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cb = PqIndex.fit(corpus, idCol, vecCol, m, k, iters)
      val codes = encodeWithErr(corpus, idCol, vecCol, cb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try installCodes(spark, codesTable, cbTable, cb, codes,
        corpusVersion)
      finally codes.unpersist(): Unit
    } finally corpus.unpersist(): Unit
    corpusVersion
  }

  /** Content-replace (or create) the codes + codebooks pair and stamp
    * the watermark — a re-build over an EXISTING codes table must
    * replace, never append a duplicate encoding. Shared by [[build]]
    * and [[maintain]]'s re-fit. */
  private def installCodes(spark: SparkSession, codesTable: String,
      cbTable: String, cb: PqIndex.Codebooks, codes: DataFrame,
      corpusVersion: Long): Unit = {
    if (CommitLog.currentVersion(spark, codesTable).isDefined) {
      CommitLog.overwriteWhere(spark, codesTable, codes,
        lit(true)): Unit
      CommitLog.commitTxnMarker(spark, codesTable, AppId,
        corpusVersion): Unit
    } else CommitLog.appendTxn(spark, codesTable, codes, AppId,
      corpusVersion): Unit
    val cbDf = codebookDf(spark, cb, codes)
    if (CommitLog.currentVersion(spark, cbTable).isDefined)
      CommitLog.overwriteWhere(spark, cbTable, cbDf, lit(true)): Unit
    else CommitLog.append(spark, cbTable, cbDf): Unit
  }

  /** Apply the corpus change feed since the recorded watermark —
    * O(delta): deletes tombstone via deletion vectors, upserts encode
    * against the EXISTING codebooks and land as one keyed merge
    * stamped (AppId, endVersion). Returns (applied-through version,
    * drift = new mean err / fit mean err; 0 with no upserts). */
  def applyFeed(spark: SparkSession, corpusTable: String,
      codesTable: String, cbTable: String, idCol: String,
      vecCol: String): (Long, Double) = {
    val applied = CommitLog.lastTxn(spark, codesTable, AppId)
      .getOrElse(throw new IllegalStateException(
        s"PqIncremental.applyFeed: $codesTable carries no '$AppId' " +
          "watermark — build the index first"))
    val cur = CommitLog.currentVersion(spark, corpusTable)
      .getOrElse(throw new IllegalStateException(
        s"PqIncremental.applyFeed: nothing committed at $corpusTable"))
    if (cur <= applied) return (applied, 0.0)
    val last = IvfIncremental.feedNetEffect(spark, corpusTable,
      applied, cur, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val upserts = last.filter(col("_change_type")
        .isin("insert", "update_postimage"))
        .select(col(idCol), col(vecCol))
      val deletes = last.filter(col("_change_type")
        .isin("delete", "update_preimage")).select(col(idCol))
      // ONE presence probe instead of two limit(1) jobs — same
      // rationale as IvfIncremental.applyFeed
      val pres = last.agg(
        count(when(col("_change_type")
          .isin("delete", "update_preimage"), 1)).as("nd"),
        count(when(col("_change_type")
          .isin("insert", "update_postimage"), 1)).as("nu"))
        .collect()(0)
      if (pres.getLong(0) > 0L)
        CommitLog.deleteVectoredKeys(spark, codesTable, deletes,
          Seq(idCol)): Unit
      val drift =
        if (pres.getLong(1) == 0L) {
          // metadata-only stamped marker: an empty appendTxn would
          // grow a zero-row segment per delete-only cycle
          CommitLog.commitTxnMarker(spark, codesTable, AppId,
            cur): Unit
          0.0
        } else {
          // ONE codebook-table collect serves the codebooks AND the
          // fit-time drift baseline (fit_n/fit_err are constant across
          // rows) — previously a second limit(1) job over the table
          import spark.implicits._
          val rows = CommitLog.read(spark, cbTable)
            .select(col("m"), col("kk"), col("v"), col("fit_n"),
              col("fit_err"))
            .as[(Int, Int, Array[Long], Long, Double)].collect()
          val mN = rows.map(_._1).max + 1
          val kN = rows.map(_._2).max + 1
          val centArr = Array.ofDim[Array[Long]](mN, kN)
          rows.foreach { case (mm, kk, v, _, _) => centArr(mm)(kk) = v }
          val cb = PqIndex.Codebooks(rows.head._3.length,
            centArr.map(_.toArray))
          val encoded = encodeWithErr(upserts, idCol, vecCol, cb)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            CommitLog.mergeIntoClauses(spark, codesTable, encoded,
              Seq(idCol),
              matched = Seq(CommitLog.MergeUpdate(Map(
                "codes" -> CommitLog.src("codes"),
                "err" -> CommitLog.src("err")), None)),
              notMatchedInsert = true,
              txn = Some((AppId, cur))): Unit
            val s = encoded.agg(count(lit(1)).cast("double"),
              sum(col("err"))).collect()(0)
            val (fitN, fitErr) = (rows.head._4, rows.head._5)
            val newMean =
              if (s.getDouble(0) == 0) 0.0
              else s.getDouble(1) / s.getDouble(0)
            val fitMean =
              if (fitN == 0L) 0.0
              else fitErr / fitN
            if (fitMean <= 0.0) {
              if (newMean > 0.0) Double.MaxValue else 0.0
            } else newMean / fitMean
          } finally encoded.unpersist(): Unit
        }
      (cur, drift)
    } finally last.unpersist(): Unit
  }

  /** Apply the pending feed, then RE-FIT the codebooks and re-encode
    * when quantization drift exceeded `driftThreshold` — the
    * OPTIMIZE-class re-train. Returns (applied-through, refit?). */
  def maintain(spark: SparkSession, corpusTable: String,
      codesTable: String, cbTable: String, idCol: String,
      vecCol: String, driftThreshold: Double = 2.0, m: Int = 8,
      k: Int = 16, iters: Int = 2): (Long, Boolean) = {
    val (applied, drift) = applyFeed(spark, corpusTable, codesTable,
      cbTable, idCol, vecCol)
    if (drift <= driftThreshold) return (applied, false)
    // same corpus pin as [[build]]: fit scans it iters+1 times
    val corpus = CommitLog.read(spark, corpusTable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cb = PqIndex.fit(corpus, idCol, vecCol, m, k, iters)
      val codes = encodeWithErr(corpus, idCol, vecCol, cb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try installCodes(spark, codesTable, cbTable, cb, codes, applied)
      finally codes.unpersist(): Unit
    } finally corpus.unpersist(): Unit
    (applied, true)
  }

  /** ADC top-k over the STORED codes — the search never touches the
    * raw vectors: queries build M×K lookup tables against the stored
    * codebooks and score the (id, codes) table with per-partition
    * bounded heaps (exact for top-k under merge), exactly
    * [[PqIndex.adcTopK]]'s contract minus the re-encode. */
  def adcTopK(spark: SparkSession, queries: DataFrame, idCol: String,
      vecCol: String, codesTable: String, cbTable: String, k: Int)
      : DataFrame = {
    import spark.implicits._
    val cb = loadCodebooks(spark, cbTable)
    val qs = fixedDS(queries, idCol, vecCol).collect().sortBy(_.id)
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
    val candidates = CommitLog.read(spark, codesTable)
      .select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Array[Int])]
      .mapPartitions { rows =>
        val ls = bcLut.value
        val ord = Ordering.by[(Long, Long), (Long, Long)] {
          case (score, id) => (-score, id)
        }
        val heaps = ls.map(_ => new scala.collection.mutable
          .PriorityQueue[(Long, Long)]()(ord))
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
