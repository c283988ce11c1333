package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIncremental, IvfIndex, Similarity}
import graft.sources.CommitLog

/** Incremental IVF maintenance over the change feed: O(delta)
  * application, deletion-vector tombstones, exactly-once watermark,
  * and the drift-triggered OPTIMIZE-class refit. */
class IvfIncrementalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(go)); f.delete(): Unit
    }
    go(new java.io.File(path))
  }

  /** Deterministic 8-dim vector around one of two modes. */
  private def vec(id: Long, scale: Float): Seq[Float] = {
    val base = if (id % 2 == 0) 0.1f else 0.8f
    (0 until 8).map(i => scale * (base + 0.01f * ((id + i) % 7)))
  }

  private def df(ids: Seq[Long], scale: Float = 1.0f): DataFrame = {
    import spark.implicits._
    ids.map(id => (id, vec(id, scale))).toDF("vec_id", "embedding")
  }

  private def contentEqual(index: String, corpus: String,
      cents: String): Boolean = {
    import spark.implicits._
    val storedCents = CommitLog.read(spark, cents)
      .select(col("cell"), col("v")).orderBy(col("cell"))
      .as[(Int, Array[Long])].collect().map(_._2)
    val scratch = IvfIndex.assign(CommitLog.read(spark, corpus),
      "vec_id", "embedding", storedCents)
    val live = CommitLog.read(spark, index)
      .select(col("vec_id"), col("cell"))
    live.exceptAll(scratch).isEmpty && scratch.exceptAll(live).isEmpty
  }

  test("feed application is O(delta) and exact: appends route into " +
      "existing cells, deletes tombstone via DVs (no segment " +
      "rewrite), the watermark makes replays no-ops, and the index " +
      "stays content-equal to from-scratch assignment") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfinc_").toString
    val (corpus, index, cents) =
      (s"$root/c", s"$root/i", s"$root/k")
    try {
      CommitLog.append(spark, corpus, df(1L to 100L))
      val v0 = IvfIncremental.build(spark, corpus, index, cents,
        "vec_id", "embedding", nCells = 4)
      assert(v0 === 1L)
      assert(CommitLog.lastTxn(spark, index,
        IvfIncremental.AppId) === Some(1L))
      assert(contentEqual(index, corpus, cents))

      // appends + a delete; similar vectors -> low drift
      CommitLog.append(spark, corpus, df(101L to 130L))
      CommitLog.deleteVectored(spark, corpus,
        col("vec_id") % 10 === 3)
      val segsBefore = CommitLog.snapshot(spark, index).get.segments
      val (applied, drift) = IvfIncremental.applyFeed(spark, corpus,
        index, cents, "vec_id", "embedding")
      assert(applied === CommitLog.currentVersion(spark, corpus).get)
      assert(drift > 0.0 && drift < 2.0, s"similar-data drift: $drift")
      assert(contentEqual(index, corpus, cents))
      // the delete landed as a DV, not a rewrite: every pre-existing
      // segment survives
      val snapAfter = CommitLog.snapshot(spark, index).get
      assert(segsBefore.toSet.subsetOf(snapAfter.segments.toSet),
        "delete must tombstone via DV, not rewrite inverted lists")
      assert(snapAfter.dv.isDefined, "expected a deletion vector")
      // deleted ids are gone from reads
      assert(CommitLog.read(spark, index)
        .filter(col("vec_id") % 10 === 3).count() === 0L)

      // replay: watermark recognized, zero new commits
      val top = CommitLog.versions(spark, index).max
      val (applied2, drift2) = IvfIncremental.applyFeed(spark, corpus,
        index, cents, "vec_id", "embedding")
      assert(applied2 === applied && drift2 === 0.0)
      assert(CommitLog.versions(spark, index).max === top)

      // search parity: full probe over the maintained index == brute
      // force over the corpus' current state
      val queries = CommitLog.read(spark, corpus)
        .filter(col("vec_id") % 25 === 0)
      val viaIndex = IvfIncremental.topK(spark, queries, "vec_id",
        "embedding", index, cents, k = 5, nProbe = 4)
      val brute = Similarity.bruteForceTopK(queries,
        CommitLog.read(spark, corpus), "vec_id", "embedding", k = 5)
      assert(viaIndex.exceptAll(brute).isEmpty &&
        brute.exceptAll(viaIndex).isEmpty,
        "full-probe maintained-index search must equal brute force")
    } finally rm(root)
  }

  test("re-build over an existing index content-replaces (never a " +
      "duplicate assignment); a delete-only feed advances the " +
      "watermark with a metadata-only marker, not an empty segment") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfmk_").toString
    val (corpus, index, cents) =
      (s"$root/c", s"$root/i", s"$root/k")
    try {
      CommitLog.append(spark, corpus, df(1L to 80L))
      IvfIncremental.build(spark, corpus, index, cents,
        "vec_id", "embedding", nCells = 4): Unit
      val n0 = CommitLog.read(spark, index).count()
      // second build (e.g. a scheduler re-running ann_build after a
      // lost watermark): must REPLACE, not append duplicates
      IvfIncremental.build(spark, corpus, index, cents,
        "vec_id", "embedding", nCells = 4): Unit
      assert(CommitLog.read(spark, index).count() === n0,
        "re-build must not duplicate index rows")
      assert(contentEqual(index, corpus, cents))
      // delete-only delta: watermark advances, segment set unchanged
      CommitLog.deleteVectored(spark, corpus, col("vec_id") % 7 === 0)
      val segs0 = CommitLog.snapshot(spark, index).get.segments
      val (applied, drift) = IvfIncremental.applyFeed(spark, corpus,
        index, cents, "vec_id", "embedding")
      assert(applied ===
        CommitLog.currentVersion(spark, corpus).get && drift === 0.0)
      val snap = CommitLog.snapshot(spark, index).get
      assert(snap.segments === segs0,
        "delete-only watermark must not append segments")
      assert(snap.op === "txn_marker")
      assert(CommitLog.lastTxn(spark, index,
        IvfIncremental.AppId) === Some(applied))
    } finally rm(root)
  }

  test("advisor loop: a stale index is recommended for feed " +
      "application; after maintain the advisor goes quiet") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfadv_").toString
    val (corpus, index, cents) =
      (s"$root/c", s"$root/i", s"$root/k")
    try {
      CommitLog.append(spark, corpus, df(1L to 50L))
      // never built -> ann_build
      assert(IvfIncremental.maintenancePlan(spark, corpus, index)
        .map(_._1) === Seq("ann_build"))
      IvfIncremental.build(spark, corpus, index, cents,
        "vec_id", "embedding", nCells = 4): Unit
      assert(IvfIncremental.maintenancePlan(spark, corpus, index)
        .isEmpty, "fresh index must be quiet")
      CommitLog.append(spark, corpus, df(51L to 60L))
      val rec = IvfIncremental.maintenancePlan(spark, corpus, index)
      assert(rec.map(_._1) === Seq("ann_apply_feed"),
        s"stale index must recommend, got $rec")
      IvfIncremental.maintain(spark, corpus, index, cents,
        "vec_id", "embedding"): Unit
      assert(IvfIncremental.maintenancePlan(spark, corpus, index)
        .isEmpty, "maintained index must go quiet")
    } finally rm(root)
  }

  test("drift past the threshold triggers the refit: far-off-mode " +
      "vectors re-train the centroids; below it, maintain applies " +
      "the feed and leaves the fit alone") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfref_").toString
    val (corpus, index, cents) =
      (s"$root/c", s"$root/i", s"$root/k")
    try {
      CommitLog.append(spark, corpus, df(1L to 100L))
      IvfIncremental.build(spark, corpus, index, cents,
        "vec_id", "embedding", nCells = 4): Unit

      // similar data: no refit
      CommitLog.append(spark, corpus, df(101L to 120L))
      val (_, refit1) = IvfIncremental.maintain(spark, corpus, index,
        cents, "vec_id", "embedding", driftThreshold = 2.0, nCells = 4)
      assert(!refit1, "similar-distribution delta must not refit")
      val centsBefore = CommitLog.read(spark, cents)
        .select(col("cell"), col("v")).collect().toSet

      // FAR vectors (100x scale): quantization error explodes
      CommitLog.append(spark, corpus, df(201L to 260L, scale = 100.0f))
      val (_, refit2) = IvfIncremental.maintain(spark, corpus, index,
        cents, "vec_id", "embedding", driftThreshold = 2.0, nCells = 4)
      assert(refit2, "drifted delta must trigger the refit")
      val centsAfter = CommitLog.read(spark, cents)
        .select(col("cell"), col("v")).collect().toSet
      assert(centsAfter !== centsBefore, "refit must re-train")
      assert(contentEqual(index, corpus, cents),
        "refit index must equal from-scratch assignment of the " +
          "re-trained centroids")
      // search still exact at full probe after the refit
      val queries = CommitLog.read(spark, corpus)
        .filter(col("vec_id").isin(10L, 210L))
      val viaIndex = IvfIncremental.topK(spark, queries, "vec_id",
        "embedding", index, cents, k = 3, nProbe = 4)
      val brute = Similarity.bruteForceTopK(queries,
        CommitLog.read(spark, corpus), "vec_id", "embedding", k = 3)
      assert(viaIndex.exceptAll(brute).isEmpty &&
        brute.exceptAll(viaIndex).isEmpty)
    } finally rm(root)
  }
}
