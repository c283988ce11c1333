package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CommitLog

/** The versioned-manifest commit protocol: write-write safety under
  * interleaved writers (the lost-update law), snapshot isolation for
  * readers mid-race, time travel, and the compaction/vacuum lifecycle.
  * This is the concurrency story the plain rename-swap sinks
  * (mergeIntoParquet / Formats.compact) do not have. */
class CommitLogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_commitlog_")
      .resolve("tbl").toString

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(go)); f.delete(): Unit
    }
    go(new java.io.File(path).getParentFile)
  }

  private def df(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name", "v")
  }

  private def sortedRows(d: DataFrame): Seq[(Long, String, Double)] =
    d.select(col("id"), col("name"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq.sorted

  test("DSv2 connector: format(\"commitlog\") reads the snapshot, " +
      "time-travels, pins versions against concurrent commits, and " +
      "pushes filters into the parquet scan") {
    val t = tmpTable()
    try {
      CommitLog.append(spark, t, df((1L, "a", 1.0), (2L, "b", 2.0)))
      CommitLog.append(spark, t, df((3L, "c", 3.0)))
      def byFormat(opts: (String, String)*): DataFrame =
        opts.foldLeft(spark.read.format("commitlog")
          .option("path", t))((r, kv) => r.option(kv._1, kv._2)).load()
      // current snapshot == CommitLog.read
      assert(sortedRows(byFormat()) ==
        sortedRows(CommitLog.read(spark, t)))
      // time travel by option
      assert(sortedRows(byFormat("versionAsOf" -> "1")) ==
        Seq((1L, "a", 1.0), (2L, "b", 2.0)))
      // version pinning: a DataFrame planned BEFORE a commit keeps its
      // snapshot (the segments were resolved at table construction)
      val pinned = byFormat()
      CommitLog.append(spark, t, df((4L, "d", 4.0)))
      assert(sortedRows(pinned).map(_._1) == Seq(1L, 2L, 3L))
      assert(sortedRows(byFormat()).map(_._1) == Seq(1L, 2L, 3L, 4L))
      // stock parquet pushdown through the connector: the v2 scan
      // carries the id predicate
      val filtered = byFormat().filter(col("id") === 3L)
      val scan = filtered.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec => b
      }
      assert(scan.nonEmpty, "no v2 BatchScan in the plan")
      assert(scan.get.scan.description.contains("id"),
        s"no pushed filter on id: ${scan.get.scan.description}")
      assert(filtered.collect().map(_.getLong(0)).toSeq == Seq(3L))
      // unknown version → loud error naming the ask
      val e = intercept[IllegalStateException](
        byFormat("versionAsOf" -> "99").collect())
      assert(e.getMessage.contains("versionAsOf=99"))
    } finally rm(t)
  }

  test("change feed: per-version append deltas, compact skipped, " +
      "merge refused unless opted in, vacuumed gap loud") {
    val t = tmpTable()
    try {
      CommitLog.append(spark, t, df((1L, "a", 1.0)))
      CommitLog.append(spark, t, df((2L, "b", 2.0), (3L, "c", 3.0)))
      val feed = CommitLog.changes(spark, t, afterVersion = 0L)
      assert(feed.map(_._1) == Seq(1L, 2L))
      assert(sortedRows(feed(0)._2) == Seq((1L, "a", 1.0)))
      assert(sortedRows(feed(1)._2) ==
        Seq((2L, "b", 2.0), (3L, "c", 3.0)))
      // from a mid watermark: only the tail
      assert(CommitLog.changes(spark, t, 1L).map(_._1) == Seq(2L))
      // compact is content-preserving → transparently skipped, and a
      // post-compact append still yields exactly its own rows
      CommitLog.compact(spark, t, targetRowsPerFile = 10)
      CommitLog.append(spark, t, df((4L, "d", 4.0)))
      val tail = CommitLog.changes(spark, t, 2L)
      assert(tail.map(_._1) == Seq(4L))
      assert(sortedRows(tail.head._2) == Seq((4L, "d", 4.0)))
      // merge rewrites row state → refused by default, skippable
      CommitLog.merge(spark, t, df((1L, "a2", 9.0)), Seq("id"))
      val e = intercept[IllegalStateException](
        CommitLog.changes(spark, t, 4L))
      assert(e.getMessage.contains("merge"))
      assert(CommitLog.changes(spark, t, 4L, skipRewrites = true).isEmpty)
      // vacuumed history below the watermark → loud, never silent skip
      CommitLog.append(spark, t, df((5L, "e", 5.0)))
      CommitLog.vacuum(spark, t, retainVersions = 1)
      val g = intercept[IllegalStateException](
        CommitLog.changes(spark, t, 1L))
      assert(g.getMessage.contains("vacuumed"))
    } finally rm(t)
  }

  test("consumeChanges: checkpointed at-least-once consumption, " +
      "re-run is a no-op, crash before watermark re-delivers") {
    val t = tmpTable()
    try {
      val cp = s"$t.checkpoint"
      CommitLog.append(spark, t, df((1L, "a", 1.0)))
      CommitLog.append(spark, t, df((2L, "b", 2.0)))
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      def run(): Int = CommitLog.consumeChanges(spark, t, cp) {
        (v, d) => seen += ((v, d.count())): Unit
      }
      assert(run() == 2 && seen.toSeq == Seq((1L, 1L), (2L, 1L)))
      assert(run() == 0) // watermark holds
      CommitLog.append(spark, t, df((3L, "c", 3.0)))
      assert(run() == 1 && seen.last == ((3L, 1L)))
      // crash between handler and watermark: rewind the watermark by
      // hand → the version is re-delivered (at-least-once contract)
      val f = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val out = f.create(new org.apache.hadoop.fs.Path(cp), true)
      try out.write("2".getBytes("UTF-8")) finally out.close()
      assert(run() == 1 && seen.last == ((3L, 1L)))
    } finally rm(t)
  }

  test("append commits monotonic versions; read is the union") {
    val t = tmpTable()
    try {
      val v1 = CommitLog.append(spark, t, df((1L, "a", 1.0)))
      val v2 = CommitLog.append(spark, t, df((2L, "b", 2.0)))
      assert((v1, v2) === (1L, 2L))
      assert(CommitLog.versions(spark, t) === Seq(1L, 2L))
      assert(sortedRows(CommitLog.read(spark, t)) ===
        Seq((1L, "a", 1.0), (2L, "b", 2.0)))
      // the append manifest carries BOTH segments
      assert(CommitLog.snapshot(spark, t).get.segments.length === 2)
    } finally rm(t)
  }

  test("merge: replace-on-key + insert counts match the upsert contract") {
    val t = tmpTable()
    try {
      val (v1, i1, r1) = CommitLog.merge(spark, t,
        df((1L, "a", 1.0), (2L, "b", 2.0)), keys = Seq("id"))
      assert((v1, i1, r1) === (1L, 2L, 0L))
      val (v2, i2, r2) = CommitLog.merge(spark, t,
        df((2L, "B", 20.0), (3L, "c", 3.0)), keys = Seq("id"))
      assert((v2, i2, r2) === (2L, 1L, 1L))
      assert(sortedRows(CommitLog.read(spark, t)) ===
        Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0)))
    } finally rm(t)
  }

  test("lost-update law: the version race has exactly one winner and the loser's retry keeps both writers' rows") {
    val t = tmpTable()
    try {
      CommitLog.merge(spark, t, df((1L, "a", 1.0), (2L, "b", 2.0)),
        keys = Seq("id"))
      // deterministic interleave of the publish primitive: A and B
      // both observe version 1, both stage their segment, both try to
      // commit version 2
      val base = CommitLog.snapshot(spark, t).get
      val segA = CommitLog.writeSegment(spark, t, df((1L, "A", 10.0)))
      val segB = CommitLog.writeSegment(spark, t, df((2L, "BB", 22.0)))
      val okA = CommitLog.tryPublish(spark, t,
        CommitLog.Snapshot(base.version + 1, Seq(segA), base.version,
          "merge"))
      val okB = CommitLog.tryPublish(spark, t,
        CommitLog.Snapshot(base.version + 1, Seq(segB), base.version,
          "merge"))
      assert(okA === true)
      assert(okB === false) // the filesystem arbitrated: B must rebase
      // B's real path: the public merge loop re-reads the winner's
      // state and recomputes — afterwards BOTH updates are present
      // (the plain rename-swap sink would have silently kept only B's)
      val (v3, _, _) = CommitLog.merge(spark, t, df((2L, "BB", 22.0)),
        keys = Seq("id"))
      assert(v3 === 3L)
      assert(sortedRows(CommitLog.read(spark, t)) ===
        Seq((1L, "A", 10.0), (2L, "BB", 22.0)))
    } finally rm(t)
  }

  test("two genuinely concurrent merge writers both commit (no lost update)") {
    val t = tmpTable()
    try {
      CommitLog.merge(spark, t, df((1L, "a", 1.0), (2L, "b", 2.0)),
        keys = Seq("id"))
      val gate = new java.util.concurrent.CountDownLatch(1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      def writer(rows: DataFrame) = scala.concurrent.Future {
        gate.await(); CommitLog.merge(spark, t, rows, keys = Seq("id"))
      }
      val fa = writer(df((1L, "A", 10.0)))
      val fb = writer(df((3L, "c", 3.0)))
      gate.countDown()
      scala.concurrent.Await.result(fa,
        scala.concurrent.duration.Duration("120s"))
      scala.concurrent.Await.result(fb,
        scala.concurrent.duration.Duration("120s"))
      pool.shutdown()
      assert(sortedRows(CommitLog.read(spark, t)) ===
        Seq((1L, "A", 10.0), (2L, "b", 2.0), (3L, "c", 3.0)))
      assert(CommitLog.currentVersion(spark, t) === Some(3L))
    } finally rm(t)
  }

  test("snapshot isolation: a reader resolved before a commit keeps seeing its version") {
    val t = tmpTable()
    try {
      CommitLog.merge(spark, t, df((1L, "a", 1.0)), keys = Seq("id"))
      val reader = CommitLog.read(spark, t) // resolves v1's segments
      CommitLog.merge(spark, t, df((1L, "A", 10.0)), keys = Seq("id"))
      // collect AFTER the overwrite committed: segments are immutable,
      // so the old plan still returns the old content (the rename-swap
      // sink deletes the directory out from under such a reader)
      assert(sortedRows(reader) === Seq((1L, "a", 1.0)))
      assert(sortedRows(CommitLog.read(spark, t)) ===
        Seq((1L, "A", 10.0)))
    } finally rm(t)
  }

  test("time travel: version N-1 read hash-matches the pre-commit state") {
    val t = tmpTable()
    try {
      CommitLog.merge(spark, t, df((1L, "a", 1.0), (2L, "b", 2.0)),
        keys = Seq("id"))
      val before = sortedRows(CommitLog.read(spark, t))
      CommitLog.merge(spark, t, df((2L, "B", 20.0), (3L, "c", 3.0)),
        keys = Seq("id"))
      assert(sortedRows(CommitLog.read(spark, t, asOfVersion = Some(1L)))
        === before)
      val snap = CommitLog.snapshot(spark, t, Some(2L)).get
      assert(snap.baseVersion === 1L && snap.op === "merge")
    } finally rm(t)
  }

  test("compact: content preserved, file count bounded, prior version intact") {
    val t = tmpTable()
    try {
      // 6 single-row appends → >= 6 little segments
      (1 to 6).foreach(i =>
        CommitLog.append(spark, t, df((i.toLong, s"n$i", i.toDouble))))
      val before = sortedRows(CommitLog.read(spark, t))
      val v = CommitLog.compact(spark, t, targetRowsPerFile = 6L)
      assert(v === 7L)
      assert(CommitLog.snapshot(spark, t).get.segments.length === 1)
      assert(sortedRows(CommitLog.read(spark, t)) === before)
      // old version still readable (segments immutable)
      assert(sortedRows(CommitLog.read(spark, t, Some(6L))) === before)
      val segFiles = new java.io.File(
        CommitLog.snapshot(spark, t).get.segments.head)
        .listFiles.count(_.getName.endsWith(".parquet"))
      assert(segFiles === 1)
    } finally rm(t)
  }

  test("vacuum: unreferenced segments and old manifests removed, current read intact") {
    val t = tmpTable()
    try {
      CommitLog.merge(spark, t, df((1L, "a", 1.0)), keys = Seq("id"))
      CommitLog.merge(spark, t, df((1L, "b", 2.0)), keys = Seq("id"))
      CommitLog.merge(spark, t, df((1L, "c", 3.0)), keys = Seq("id"))
      val cur = sortedRows(CommitLog.read(spark, t))
      CommitLog.vacuum(spark, t, retainVersions = 1)
      assert(CommitLog.versions(spark, t) === Seq(3L))
      assert(sortedRows(CommitLog.read(spark, t)) === cur)
      // the dropped versions' segments are physically gone
      val dataDirs = new java.io.File(s"$t/data").listFiles.length
      assert(dataDirs === 1)
      intercept[IllegalStateException] {
        CommitLog.read(spark, t, asOfVersion = Some(1L)).collect()
      }
    } finally rm(t)
  }

  test("crashed writer leaves no visible effect: uncommitted segment is invisible and vacuumable") {
    val t = tmpTable()
    try {
      CommitLog.merge(spark, t, df((1L, "a", 1.0)), keys = Seq("id"))
      // simulate a writer that staged data then died before publish
      CommitLog.writeSegment(spark, t, df((9L, "ghost", 9.0)))
      assert(sortedRows(CommitLog.read(spark, t)) ===
        Seq((1L, "a", 1.0)))
      CommitLog.vacuum(spark, t, retainVersions = 1)
      assert(new java.io.File(s"$t/data").listFiles.length === 1)
      assert(sortedRows(CommitLog.read(spark, t)) ===
        Seq((1L, "a", 1.0)))
    } finally rm(t)
  }

  // ---- exactly-once streaming appends (txn stamps) ---------------------

  test("appendTxn: a replayed micro-batch is recognized and skipped") {
    val t = tmpTable()
    try {
      assert(CommitLog.appendTxn(spark, t, df((1L, "a", 1.0)),
        appId = "q", batchId = 0L) === Some(1L))
      // crash-replay of batch 0: skipped, no new version, content same
      assert(CommitLog.appendTxn(spark, t, df((1L, "a", 1.0)),
        appId = "q", batchId = 0L) === None)
      assert(CommitLog.versions(spark, t) === Seq(1L))
      assert(sortedRows(CommitLog.read(spark, t)) === Seq((1L, "a", 1.0)))
      // the next batch commits normally
      assert(CommitLog.appendTxn(spark, t, df((2L, "b", 2.0)),
        appId = "q", batchId = 1L) === Some(2L))
      assert(CommitLog.lastTxn(spark, t, "q") === Some(1L))
    } finally rm(t)
  }

  test("appendTxn: replay dedup survives an interleaved foreign writer; other apps are independent") {
    val t = tmpTable()
    try {
      CommitLog.appendTxn(spark, t, df((1L, "a", 1.0)), "q", 0L)
      // a batch writer commits between the original run and the replay
      CommitLog.append(spark, t, df((5L, "x", 5.0)))
      assert(CommitLog.appendTxn(spark, t, df((1L, "a", 1.0)),
        "q", 0L) === None) // still recognized across the foreign commit
      // a DIFFERENT app's batch 0 is not confused with q's
      assert(CommitLog.appendTxn(spark, t, df((7L, "y", 7.0)),
        "other", 0L).isDefined)
      assert(sortedRows(CommitLog.read(spark, t)) ===
        Seq((1L, "a", 1.0), (5L, "x", 5.0), (7L, "y", 7.0)))
    } finally rm(t)
  }

  test("commitLogSink: end-to-end stream lands exactly-once; replayed last batch is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = tmpTable()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_clsink_ckpt_").toString
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      import spark.implicits._
      val mem = MemoryStream[Long](100, spark, None)
      val q = graft.streaming.Streaming.commitLogSink(
          mem.toDF().withColumnRenamed("value", "id"), t, appId = "sinkq")
        .option("checkpointLocation", ckpt).start()
      try {
        mem.addData(1L, 2L, 3L); q.processAllAvailable()
        mem.addData(4L, 5L); q.processAllAvailable()
      } finally q.stop()
      val got = CommitLog.read(spark, t).select(col("id"))
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(got === Seq(1L, 2L, 3L, 4L, 5L))
      // simulate the restart-replay of the LAST batch (Structured
      // Streaming re-runs it when the sink didn't record completion):
      val lastBatch = CommitLog.lastTxn(spark, t, "sinkq").get
      val before = CommitLog.currentVersion(spark, t)
      assert(CommitLog.appendTxn(spark, t, df((4L, "dup", 4.0)),
        "sinkq", lastBatch) === None)
      assert(CommitLog.currentVersion(spark, t) === before)
    } finally { rm(t); rm(ckpt + "/x") }
  }
}
