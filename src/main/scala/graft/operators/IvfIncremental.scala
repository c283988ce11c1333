package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity.fixedDS
import graft.sources.CommitLog

/** INCREMENTAL IVF index maintenance over the commit-log change feed
  * — the 100 TB steady-state similarity-search story. A from-scratch
  * rebuild (q30 / [[IvfIndex.writeIndexed]]) re-reads the whole
  * corpus on every change; at scale the corpus changes by parts per
  * million per day, so the index must evolve O(delta):
  *
  *  - the index IS a commit-log table `(id, cell, d2, v)` plus a tiny
  *    `(cell, v, n, sum_d2)` centroids table — versioned, vacuumable,
  *    time-travelable like any other;
  *  - APPENDS route into the EXISTING cells (one map-side assignment
  *    pass against the broadcast centroid set — no refit) and land as
  *    a keyed MERGE;
  *  - DELETES tombstone through the deletion-vector mechanism
  *    ([[CommitLog.deleteVectoredKeys]] — a point delete never
  *    rewrites an inverted list);
  *  - UPDATES are their feed decomposition: the postimage re-assigns
  *    (possibly to a NEW cell) and merges over the old row;
  *  - the applied-through corpus version rides the index table's
  *    (appId, batchId) TXN STAMP — the same exactly-once watermark
  *    the streaming sink uses, so a crash-replayed maintenance run
  *    recognizes itself and skips;
  *  - QUANTIZATION DRIFT (mean d² of newly-routed vectors vs the mean
  *    at fit time) is measured during every application; past a
  *    threshold [[maintain]] triggers the OPTIMIZE-class REFIT
  *    (distributed Lloyd over the current snapshot, content-replacing
  *    commit) — the public design of every production vector store's
  *    "reindex when recall decays" loop (FAISS/Milvus re-train).
  *
  * Law (CorpusOpsSpec + q227): a feed-maintained index is CONTENT-
  * EQUAL to assigning the corpus' current snapshot from scratch
  * against the same centroids, and a full-probe search over it is
  * hash-equal to brute force over the current corpus.
  */
object IvfIncremental {

  /** The maintenance loop's txn-stamp app id. */
  val AppId = "ivf-maintain"

  private def assignFixed(corpus: DataFrame, idCol: String,
      vecCol: String, cents: Array[Array[Long]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    fixedDS(corpus, idCol, vecCol).map { r =>
      val cs = bc.value
      var best = 0; var bestD = Long.MaxValue
      var c = 0
      while (c < cs.length) {
        var s = 0L; var i = 0
        val n = math.min(r.v.length, cs(c).length)
        while (i < n) { val d = r.v(i) - cs(c)(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      (r.id, best, bestD, r.v)
    }.toDF(idCol, "cell", "d2", "v")
  }

  /** The ANN-index row of the maintenance-advisor pattern
    * (CommitLogMaintenance's recommend → run → go-quiet loop): an
    * index whose exactly-once watermark trails the corpus' current
    * version by ≥ `staleVersions` needs a feed application — at
    * 100 TB a scheduler asks every (corpus, index) registration this
    * question nightly, exactly like `maintenance_plan` asks tables.
    * Metadata-only: one version listing per table, one bounded
    * watermark probe; empty ⇒ the index is current. Shared by the
    * IVF ([[AppId]]) and PQ ([[PqIncremental.AppId]]) maintainers. */
  def maintenancePlan(spark: SparkSession, corpusTable: String,
      indexTable: String, appId: String = AppId,
      staleVersions: Int = 1): Seq[(String, String, String)] = {
    val watermark = CommitLog.lastTxn(spark, indexTable, appId)
    val cur = CommitLog.currentVersion(spark, corpusTable)
    (watermark, cur) match {
      case (None, _) => Seq(("ann_build",
        s"index $indexTable carries no '$appId' watermark — never " +
          "built from this corpus",
        "IvfIncremental.build / PqIncremental.build"))
      case (Some(w), Some(c)) if c - w >= staleVersions => Seq((
        "ann_apply_feed",
        s"index watermark at corpus version $w, corpus at $c " +
          s"(${c - w} version(s) behind) — searches serve stale " +
          "results until the feed applies",
        "IvfIncremental.maintain / PqIncremental.maintain"))
      case _ => Seq.empty
    }
  }

  /** The NET effect of the corpus feed over (applied, cur]: one row
    * per touched id — its LAST change wins (within a version the
    * postimage/insert outranks its paired preimage), so an
    * insert-then-delete nets to a delete row and repeated updates net
    * to the final postimage. Shared by the IVF and PQ maintainers. */
  private[operators] def feedNetEffect(spark: SparkSession,
      corpusTable: String, applied: Long, cur: Long,
      idCol: String): DataFrame = {
    val feed = CommitLog.changeFeed(spark, corpusTable, applied,
      toVersion = Some(cur))
    val rank = when(col("_change_type")
      .isin("insert", "update_postimage"), 1).otherwise(0)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_commit_version").desc, rank.desc)
    feed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
  }

  private def loadCents(spark: SparkSession, centroidsTable: String)
      : Array[Array[Long]] = {
    import spark.implicits._
    CommitLog.read(spark, centroidsTable)
      .select(col("cell"), col("v")).orderBy(col("cell"))
      .as[(Int, Array[Long])].collect().map(_._2)
  }

  /** `(cell, v, n, sum_d2)` centroid rows with per-cell fit stats
    * computed from the in-hand assignment (never a re-read of the
    * just-written index). */
  private def centroidsDf(spark: SparkSession,
      cents: Array[Array[Long]], assigned: DataFrame): DataFrame = {
    import spark.implicits._
    val stats = assigned.groupBy(col("cell")).agg(
      count(lit(1)).as("n"),
      sum(col("d2").cast("decimal(38,0)")).as("sum_d2"))
    cents.zipWithIndex
      .map { case (v, c) => (c, v) }.toSeq.toDF("cell", "v")
      .join(stats, Seq("cell"), "left")
      .na.fill(0L, Seq("n", "sum_d2"))
      .select(col("cell"), col("v"), col("n"), col("sum_d2"))
  }

  /** Content-replace (or create) the index pair from a fresh fit +
    * assignment, stamp the watermark at `corpusVersion`, and lay the
    * cell-clustered inverted-list layout. Shared by [[build]] and
    * [[maintain]]'s refit. */
  private def installIndex(spark: SparkSession, indexTable: String,
      centroidsTable: String, cents: Array[Array[Long]],
      assigned: DataFrame, corpusVersion: Long, nCells: Int): Unit = {
    if (CommitLog.currentVersion(spark, indexTable).isDefined) {
      // a REBUILD over an existing index must replace, not append —
      // an appended second assignment would duplicate every row;
      // the follow-up compact lays the inverted-list layout
      CommitLog.overwriteWhere(spark, indexTable, assigned,
        lit(true)): Unit
      CommitLog.commitTxnMarker(spark, indexTable, AppId,
        corpusVersion): Unit
      graft.sources.CommitLogStats.compactClustered(spark, indexTable,
        Seq("cell"), math.max(1, nCells / 2), Seq("cell")): Unit
    } else
      // FRESH build: write the cell-clustered inverted-list layout
      // DIRECTLY as one stamped commit (guide §6: never re-read what
      // you just wrote) — previously an appendTxn followed by a full
      // clustered rewrite of the bytes just written
      graft.sources.CommitLogStats.installClustered(spark, indexTable,
        assigned, Seq("cell"), math.max(1, nCells / 2), Seq("cell"),
        txn = Some((AppId, corpusVersion))): Unit
    // inverted lists as the physical layout: cell-sorted segments +
    // per-segment (cell) stats → a probe's cell filter skips every
    // unprobed list's files
    val centsDf = centroidsDf(spark, cents, assigned)
    if (CommitLog.currentVersion(spark, centroidsTable).isDefined)
      CommitLog.overwriteWhere(spark, centroidsTable, centsDf,
        lit(true)): Unit
    else CommitLog.append(spark, centroidsTable, centsDf): Unit
  }

  /** Build the index pair from the corpus table's CURRENT snapshot:
    * distributed Lloyd fit (no corpus collect), one map-side
    * assignment, index committed with the (AppId, corpusVersion) txn
    * stamp, cell-clustered so probed scans skip unprobed inverted
    * lists via the stats sidecars. Re-building over an EXISTING index
    * content-replaces it (never appends a duplicate assignment).
    * Returns the covered corpus version. */
  def build(spark: SparkSession, corpusTable: String,
      indexTable: String, centroidsTable: String, idCol: String,
      vecCol: String, nCells: Int = 16, iters: Int = 2): Long = {
    val corpusVersion = CommitLog.currentVersion(spark, corpusTable)
      .getOrElse(throw new IllegalStateException(
        s"IvfIncremental.build: nothing committed at $corpusTable"))
    // pin the corpus across the fit + assignment: the Lloyd fit scans
    // it iters+1 times (seed + per-iteration partials) and the final
    // assignment once more — unpinned, each pass re-read the parquet
    val corpus = CommitLog.read(spark, corpusTable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cents = IvfIndex.fitDistributed(corpus, idCol, vecCol,
        nCells, iters)
      val assigned = assignFixed(corpus, idCol, vecCol, cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try installIndex(spark, indexTable, centroidsTable, cents,
        assigned, corpusVersion, nCells)
      finally assigned.unpersist(): Unit
    } finally corpus.unpersist(): Unit
    corpusVersion
  }

  /** Apply the corpus change feed SINCE the index's recorded
    * watermark — O(delta), never a corpus rescan. Net effect per id
    * over the pinned range (last change wins; an insert-then-delete
    * nets to nothing): deletes tombstone via deletion vectors,
    * upserts assign map-side against the EXISTING centroids and land
    * as one keyed merge stamped (AppId, endVersion). Returns
    * (applied-through version, drift) where drift = mean d² of the
    * newly-routed vectors over the fit-time mean (0 when the range
    * held no upserts; the caller compares against its threshold). */
  def applyFeed(spark: SparkSession, corpusTable: String,
      indexTable: String, centroidsTable: String, idCol: String,
      vecCol: String): (Long, Double) = {
    val applied = CommitLog.lastTxn(spark, indexTable, AppId)
      .getOrElse(throw new IllegalStateException(
        s"IvfIncremental.applyFeed: $indexTable carries no " +
          s"'$AppId' watermark — build the index first"))
    val cur = CommitLog.currentVersion(spark, corpusTable)
      .getOrElse(throw new IllegalStateException(
        s"IvfIncremental.applyFeed: nothing committed at $corpusTable"))
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
      // ONE presence probe over the pinned net effect instead of two
      // limit(1) jobs (it doubles as the action that materializes the
      // persist, so later branches read cached rows)
      val pres = last.agg(
        count(when(col("_change_type")
          .isin("delete", "update_preimage"), 1)).as("nd"),
        count(when(col("_change_type")
          .isin("insert", "update_postimage"), 1)).as("nu"))
        .collect()(0)
      if (pres.getLong(0) > 0L)
        CommitLog.deleteVectoredKeys(spark, indexTable, deletes,
          Seq(idCol)): Unit
      val drift =
        if (pres.getLong(1) == 0L) {
          // nothing to merge — advance the watermark with a
          // METADATA-ONLY stamped marker (an empty appendTxn would
          // grow a zero-row segment per delete-only cycle)
          CommitLog.commitTxnMarker(spark, indexTable, AppId,
            cur): Unit
          0.0
        } else {
          // ONE centroid-table collect serves the centroid vectors AND
          // the fit-time drift baseline (previously a second
          // aggregation job over the same tiny table)
          import spark.implicits._
          val centRows = CommitLog.read(spark, centroidsTable)
            .select(col("cell"), col("v"), col("n"),
              col("sum_d2").cast("double").as("sum_d2"))
            .orderBy(col("cell"))
            .as[(Int, Array[Long], Long, Double)].collect()
          val cents = centRows.map(_._2)
          val assigned = assignFixed(upserts, idCol, vecCol, cents)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            CommitLog.mergeIntoClauses(spark, indexTable, assigned,
              Seq(idCol),
              matched = Seq(CommitLog.MergeUpdate(Map(
                "cell" -> CommitLog.src("cell"),
                "d2" -> CommitLog.src("d2"),
                "v" -> CommitLog.src("v")), None)),
              notMatchedInsert = true,
              txn = Some((AppId, cur))): Unit
            val newStats = assigned.agg(count(lit(1)).cast("double"),
              sum(col("d2").cast("double"))).collect()(0)
            val fitN = centRows.map(_._3).sum.toDouble
            val fitSum = centRows.map(_._4).sum
            val newMean =
              if (newStats.getDouble(0) == 0) 0.0
              else newStats.getDouble(1) / newStats.getDouble(0)
            val fitMean = if (fitN == 0) 0.0 else fitSum / fitN
            if (fitMean <= 0.0) { if (newMean > 0.0) Double.MaxValue else 0.0 }
            else newMean / fitMean
          } finally assigned.unpersist(): Unit
        }
      (cur, drift)
    } finally last.unpersist(): Unit
  }

  /** The maintenance verb a scheduler calls: apply the pending feed,
    * then REFIT from the current snapshot when quantization drift
    * exceeded `driftThreshold` (new vectors no longer fit the old
    * cells — recall decays until re-train). Returns (applied-through
    * version, refit happened). The refit is content-replacing
    * ([[CommitLog.overwriteWhere]] over the whole index) and the
    * watermark is already at the applied version, so a crash between
    * apply and refit loses only the refit — the next run re-measures
    * drift against the unchanged centroids and re-triggers it. */
  def maintain(spark: SparkSession, corpusTable: String,
      indexTable: String, centroidsTable: String, idCol: String,
      vecCol: String, driftThreshold: Double = 2.0,
      nCells: Int = 16, iters: Int = 2): (Long, Boolean) = {
    val (applied, drift) = applyFeed(spark, corpusTable, indexTable,
      centroidsTable, idCol, vecCol)
    if (drift <= driftThreshold) return (applied, false)
    // same corpus pin as [[build]]: fit scans it iters+1 times
    val corpus = CommitLog.read(spark, corpusTable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cents = IvfIndex.fitDistributed(corpus, idCol, vecCol,
        nCells, iters)
      val assigned = assignFixed(corpus, idCol, vecCol, cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try installIndex(spark, indexTable, centroidsTable, cents,
        assigned, applied, nCells)
      finally assigned.unpersist(): Unit
    } finally corpus.unpersist(): Unit
    (applied, true)
  }

  /** Top-k search over the MAINTAINED index: probe `nProbe` cells per
    * query against the stored centroids; the index scan's cell filter
    * skips unprobed inverted lists via the cell-clustered layout's
    * stats sidecars; exact rerank inside the probed cells. Full probe
    * (nProbe = nCells) is exhaustive — the oracle-checkable mode. */
  def topK(spark: SparkSession, queries: DataFrame, idCol: String,
      vecCol: String, indexTable: String, centroidsTable: String,
      k: Int, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val cents = loadCents(spark, centroidsTable)
    def nearestCells(v: Array[Long], n: Int): Array[Int] = {
      def d2(a: Array[Long], b: Array[Long]): Long = {
        var s = 0L; var i = 0
        val m = math.min(a.length, b.length)
        while (i < m) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      cents.indices.sortBy(c => (d2(v, cents(c)), c)).take(n).toArray
    }
    val qArr = fixedDS(queries, idCol, vecCol).collect()
    val probed = qArr.map(q => (q.id, q.v, nearestCells(q.v, nProbe)))
    val allCells = probed.flatMap(_._3).distinct.toSeq
    val bcQ = spark.sparkContext.broadcast(probed)
    val scored = CommitLog.read(spark, indexTable)
      .filter(col("cell").isin(allCells: _*))
      .select(col(idCol).cast("long"), col("v"), col("cell").cast("int"))
      .as[(Long, Array[Long], Int)]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.flatMap { case (nid, cv, cell) =>
          qs.iterator.collect {
            case (qid, qv, probes) if probes.contains(cell) && qid != nid =>
              var s = 0L; var i = 0
              val n = math.min(qv.length, cv.length)
              while (i < n) { s += qv(i) * cv(i); i += 1 }
              (qid, nid, s)
          }
        }
      }.toDF("query_id", "neighbor_id", "dot_fp")
    Similarity.rankTopK(scored, k)
  }
}
