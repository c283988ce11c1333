package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PqIncremental, PqIndex}
import graft.sources.CommitLog

/** Incremental PQ maintenance: O(delta) encode-against-existing-
  * codebooks, DV tombstones, exactly-once watermark, drift-triggered
  * re-fit — [[IvfIncrementalSpec]]'s compressed-domain twin. */
class PqIncrementalSpec extends AnyFunSuite {

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

  /** Deterministic 16-dim vector (m=4 subspaces x dsub=4). */
  private def vec(id: Long, scale: Float): Seq[Float] = {
    val base = if (id % 2 == 0) 0.1f else 0.8f
    (0 until 16).map(i => scale * (base + 0.01f * ((id + i) % 7)))
  }

  private def df(ids: Seq[Long], scale: Float = 1.0f): DataFrame = {
    import spark.implicits._
    ids.map(id => (id, vec(id, scale))).toDF("vec_id", "embedding")
  }

  private def contentEqual(codesT: String, corpus: String,
      cbT: String): Boolean = {
    import spark.implicits._
    val rows = CommitLog.read(spark, cbT)
      .select(col("m"), col("kk"), col("v"))
      .as[(Int, Int, Array[Long])].collect()
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val cents = Array.ofDim[Array[Long]](m, k)
    rows.foreach { case (mm, kk, v) => cents(mm)(kk) = v }
    val books = PqIndex.Codebooks(rows.head._3.length,
      cents.map(_.toArray))
    val scratch = PqIndex.encode(CommitLog.read(spark, corpus),
      "vec_id", "embedding", books).toDF("vec_id", "codes")
    val live = CommitLog.read(spark, codesT)
      .select(col("vec_id"), col("codes"))
    live.exceptAll(scratch).isEmpty && scratch.exceptAll(live).isEmpty
  }

  test("feed application: appends encode against the EXISTING " +
      "codebooks, deletes tombstone via DVs, replays are no-ops, " +
      "codes stay content-equal to one-shot encoding") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pqinc_").toString
    val (corpus, codes, cb) = (s"$root/c", s"$root/x", s"$root/b")
    try {
      CommitLog.append(spark, corpus, df(1L to 100L))
      val v0 = PqIncremental.build(spark, corpus, codes, cb,
        "vec_id", "embedding", m = 4, k = 8)
      assert(v0 === 1L)
      assert(contentEqual(codes, corpus, cb))
      val cbBefore = CommitLog.read(spark, cb)
        .select(col("m"), col("kk"), col("v")).collect().toSet

      CommitLog.append(spark, corpus, df(101L to 130L))
      CommitLog.deleteVectored(spark, corpus, col("vec_id") % 10 === 3)
      val segsBefore = CommitLog.snapshot(spark, codes).get.segments
      val (applied, drift) = PqIncremental.applyFeed(spark, corpus,
        codes, cb, "vec_id", "embedding")
      assert(applied === CommitLog.currentVersion(spark, corpus).get)
      assert(drift > 0.0 && drift < 2.0, s"similar-data drift: $drift")
      assert(contentEqual(codes, corpus, cb))
      // codebooks untouched by a plain application
      assert(CommitLog.read(spark, cb)
        .select(col("m"), col("kk"), col("v")).collect().toSet
        === cbBefore)
      // deletes landed as a DV — inverted content not rewritten
      val snapAfter = CommitLog.snapshot(spark, codes).get
      assert(segsBefore.toSet.subsetOf(snapAfter.segments.toSet))
      assert(snapAfter.dv.isDefined)
      assert(CommitLog.read(spark, codes)
        .filter(col("vec_id") % 10 === 3).count() === 0L)
      // replay: zero new commits
      val top = CommitLog.versions(spark, codes).max
      val (applied2, drift2) = PqIncremental.applyFeed(spark, corpus,
        codes, cb, "vec_id", "embedding")
      assert(applied2 === applied && drift2 === 0.0)
      assert(CommitLog.versions(spark, codes).max === top)
      // ADC over the stored codes == ADC re-encoded from scratch
      val queries = CommitLog.read(spark, corpus)
        .filter(col("vec_id") % 25 === 0)
      val viaTable = PqIncremental.adcTopK(spark, queries, "vec_id",
        "embedding", codes, cb, k = 5)
      val rows = CommitLog.read(spark, cb)
        .select(col("m"), col("kk"), col("v"))
        .collect().map(r => (r.getInt(0), r.getInt(1),
          r.getSeq[Long](2).toArray))
      val m = rows.map(_._1).max + 1
      val k = rows.map(_._2).max + 1
      val cents = Array.ofDim[Array[Long]](m, k)
      rows.foreach { case (mm, kk, v) => cents(mm)(kk) = v }
      val books = PqIndex.Codebooks(rows.head._3.length,
        cents.map(_.toArray))
      val oneShot = PqIndex.adcTopK(queries,
        CommitLog.read(spark, corpus), "vec_id", "embedding", books,
        k = 5)
      assert(viaTable.exceptAll(oneShot).isEmpty &&
        oneShot.exceptAll(viaTable).isEmpty)
    } finally rm(root)
  }

  test("drift past the threshold re-fits the codebooks and " +
      "re-encodes; below it, maintain leaves the fit alone") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pqref_").toString
    val (corpus, codes, cb) = (s"$root/c", s"$root/x", s"$root/b")
    try {
      CommitLog.append(spark, corpus, df(1L to 100L))
      PqIncremental.build(spark, corpus, codes, cb,
        "vec_id", "embedding", m = 4, k = 8): Unit
      CommitLog.append(spark, corpus, df(101L to 120L))
      val (_, refit1) = PqIncremental.maintain(spark, corpus, codes,
        cb, "vec_id", "embedding", driftThreshold = 2.0, m = 4, k = 8)
      assert(!refit1)
      val cbBefore = CommitLog.read(spark, cb)
        .select(col("m"), col("kk"), col("v")).collect().toSet
      CommitLog.append(spark, corpus, df(201L to 260L, scale = 100.0f))
      val (_, refit2) = PqIncremental.maintain(spark, corpus, codes,
        cb, "vec_id", "embedding", driftThreshold = 2.0, m = 4, k = 8)
      assert(refit2, "drifted delta must re-train")
      assert(CommitLog.read(spark, cb)
        .select(col("m"), col("kk"), col("v")).collect().toSet
        !== cbBefore)
      assert(contentEqual(codes, corpus, cb),
        "re-encoded codes must equal one-shot under the new books")
    } finally rm(root)
  }
}
