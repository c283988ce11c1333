package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming
import graft.streaming.Streaming.Event

/** Streaming semantics: batch/stream parity of the windowed
  * aggregations, watermark late-data handling, and custom stateful
  * sessionization. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  def fixture: Seq[Event] = Seq(
    Event(1, ts("2024-01-01 00:05:00"), 1, "click", 10.0),
    Event(2, ts("2024-01-01 00:20:00"), 1, "click", 5.0),
    Event(3, ts("2024-01-01 01:10:00"), 2, "view", 2.5),
    Event(4, ts("2024-01-01 01:40:00"), 1, "click", 1.0),
    Event(5, ts("2024-01-01 02:30:00"), 2, "view", 4.0))

  test("tumblingAgg: stream over MemoryStream == same transform on batch") {
    import spark.implicits._
    val mem = MemoryStream[Event](1, spark, None)
    mem.addData(fixture: _*)
    val q = Streaming.tumblingAgg(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("tumb")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumb")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val batch = Streaming.tumblingAgg(fixture.toDF(), "1 hour")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(streamed == batch)
    assert(batch.map(t => (t._1.toString, t._2, t._3)) == Seq(
      ("2024-01-01 00:00:00.0", "click", 2L),
      ("2024-01-01 01:00:00.0", "click", 1L),
      ("2024-01-01 01:00:00.0", "view", 1L),
      ("2024-01-01 02:00:00.0", "view", 1L)))
  }

  test("watermark drops late data in append mode") {
    import spark.implicits._
    val mem = MemoryStream[Event](2, spark, None)
    val q = Streaming.tumblingAgg(mem.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past the first window
      mem.addData(Event(2, ts("2024-01-01 03:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // this event is older than watermark (03:00 - 30min) → dropped
      mem.addData(Event(3, ts("2024-01-01 00:20:00"), 1, "click", 99.0))
      q.processAllAvailable()
      // close remaining windows
      mem.addData(Event(4, ts("2024-01-01 06:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("late").orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2),
        r.getDouble(3))).toSeq
    // first window emitted with ONLY the on-time event (99.0 dropped)
    assert(rows.contains(("2024-01-01 00:00:00.0", 1L, 1.0)))
    assert(!rows.exists(_._3 == 100.0))
  }

  test("session_window merges events within gap per user") {
    import spark.implicits._
    val got = Streaming.sessionAgg(fixture.toDF(), "30 minutes")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toString,
        r.getAs[Long]("n_events"))).toSeq
    // user 1: events at 00:05+00:20 merge (15min gap); 01:40 separate.
    // user 2: 01:10 and 02:30 separate.
    assert(got == Seq(
      (1L, "2024-01-01 00:05:00.0", 2L),
      (1L, "2024-01-01 01:40:00.0", 1L),
      (2L, "2024-01-01 01:10:00.0", 1L),
      (2L, "2024-01-01 02:30:00.0", 1L)))
  }

  test("stream-stream join matches within window, bounded by watermarks") {
    import spark.implicits._
    val clicks = MemoryStream[Event](10, spark, None)
    val buys = MemoryStream[Event](11, spark, None)
    val q = Streaming.streamStreamJoin(
      clicks.toDF().filter($"event_type" === "click"),
      buys.toDF().filter($"event_type" === "purchase"), "30 MINUTES")
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 02:00:00"), 2, "click", 1.0))
      buys.addData(
        Event(10, ts("2024-01-01 00:10:00"), 1, "purchase", 5.0), // in window
        Event(11, ts("2024-01-01 00:50:00"), 1, "purchase", 7.0), // too late
        Event(12, ts("2024-01-01 02:20:00"), 2, "purchase", 9.0)) // in window
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssj")
      .select("l_event_id", "r_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 12L)))
  }

  test("left-outer stream-stream join emits unmatched left with nulls") {
    import spark.implicits._
    val clicks = MemoryStream[Event](20, spark, None)
    val buys = MemoryStream[Event](21, spark, None)
    val q = Streaming.streamStreamJoinLeftOuter(
      clicks.toDF().filter($"event_type" === "click"),
      buys.toDF().filter($"event_type" === "purchase"),
      "30 MINUTES", watermark = "10 minutes")
      .writeStream.format("memory").queryName("ssjlo")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0), // will match
        Event(2, ts("2024-01-01 00:00:00"), 2, "click", 1.0)) // never matches
      buys.addData(
        Event(10, ts("2024-01-01 00:10:00"), 1, "purchase", 5.0))
      q.processAllAvailable()
      // advance both watermarks well past click 2's window end so the
      // unmatched left row is released with NULL right columns
      clicks.addData(Event(3, ts("2024-01-01 03:00:00"), 9, "click", 1.0))
      buys.addData(Event(11, ts("2024-01-01 03:00:00"), 9, "purchase", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssjlo")
      .select("l_event_id", "r_event_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got.contains((1L, 10L))) // matched pair intact
    assert(got.contains((2L, -1L))) // unmatched left released with NULLs
  }

  test("slidingAgg: overlapping windows count events multiply, == batch twin") {
    import spark.implicits._
    val mem = MemoryStream[Event](22, spark, None)
    val q = Streaming.slidingAgg(mem.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("slide")
      .outputMode("complete").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:10:00"), 1, "click", 2.0),
        Event(2, ts("2024-01-01 00:40:00"), 1, "click", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("slide")
      .select(col("window_start").cast("string"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // event 00:10 ∈ [23:30,00:30) and [00:00,01:00); event 00:40 ∈
    // [00:00,01:00) and [00:30,01:30) — the shared window holds both
    assert(got("2023-12-31 23:30:00") == 1L)
    assert(got("2024-01-01 00:00:00") == 2L)
    assert(got("2024-01-01 00:30:00") == 1L)
  }

  test("dedupStream drops in-horizon duplicates, first arrival wins") {
    import spark.implicits._
    val mem = MemoryStream[Event](12, spark, None)
    val q = Streaming.dedupStream(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 99.0), // dup in batch
        Event(2, ts("2024-01-01 00:05:00"), 1, "view", 2.0))
      q.processAllAvailable()
      mem.addData( // replay event 1 in a later batch → still dropped
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 77.0),
        Event(3, ts("2024-01-01 00:10:00"), 2, "click", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup").orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    assert(got.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("file-source stream over the real events table == batch result") {
    val sfDir = "/root/testdata/sf0.001"
    val batchDf = graft.sources.Catalog.table(spark, sfDir, "events")
    // raw file schema (ts may be a nanos LONG or TIMESTAMP_NTZ,
    // pre-normalization) — the Catalog-normalized schema would
    // mismatch the parquet footer; and the file source wants a
    // DIRECTORY, so stage the file into one
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = java.nio.file.Files.createTempDirectory("graft_fs").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    // normalize ts exactly as Catalog.table does, per raw encoding
    val normalized = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => stream.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
    val q = Streaming.tumblingAgg(normalized, "1 hour")
      .writeStream.format("memory").queryName("filestream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("filestream")
      .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    val batch = Streaming.tumblingAgg(batchDf, "1 hour")
      .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("idempotentParquetSink: overlapping micro-batches land exactly once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink")
      .toString + "/t"
    val mem = MemoryStream[Event](4, spark, None)
    val q = Streaming.idempotentParquetSink(
      mem.toDF(), dir, keys = Seq("event_id"))
      .outputMode("update").start()
    try {
      mem.addData(Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:01:00"), 1, "click", 2.0))
      q.processAllAvailable()
      // replay event 2 with a DIFFERENT value + a new event 3: the
      // first-writer-wins contract must keep the original value 2.0
      mem.addData(Event(2, ts("2024-01-01 00:01:00"), 1, "click", 99.0),
        Event(3, ts("2024-01-01 00:02:00"), 1, "view", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(dir)
      .orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    assert(rows.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("dedupAgainstCorpus: stream docs already in the static corpus are dropped") {
    import spark.implicits._
    case class Doc(doc_id: Long, text: String)
    val known = Seq("alpha beta gamma", "delta epsilon")
    val corpusFp = known.toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text"))
        .as("fingerprint"))
    val mem = MemoryStream[(Long, String)](6, spark, None)
    val q = Streaming.dedupAgainstCorpus(
      mem.toDF().toDF("doc_id", "text"), corpusFp)
      .writeStream.format("memory").queryName("fresh")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "alpha beta gamma"), // already in corpus → dropped
        (2L, "brand new document"), // fresh → kept
        (3L, "delta epsilon")) // already in corpus → dropped
      q.processAllAvailable()
      mem.addData((4L, "another new one"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("fresh").orderBy("doc_id")
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(got == Seq(2L, 4L))
  }

  test("scd2ParquetSink: micro-batched dimension equals one-shot build") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_sink")
      .toString + "/dim"
    val b1 = Seq(
      Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 00:10:00"), 1, "click", 1.0), // no change
      Event(3, ts("2024-01-01 00:05:00"), 2, "view", 1.0))
    val b2 = Seq(
      Event(4, ts("2024-01-01 01:00:00"), 1, "view", 1.0),  // change
      Event(5, ts("2024-01-01 01:30:00"), 2, "view", 1.0),  // no change
      Event(6, ts("2024-01-01 01:45:00"), 3, "error", 1.0)) // new key
    val mem = MemoryStream[Event](30, spark, None)
    val q = Streaming.scd2ParquetSink(mem.toDF(), dir, "user_id",
      ordNames = Seq("ts", "event_id"), attrs = Seq("event_type"))
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "version", "event_type", "valid_from",
          "valid_to", "is_current")
        .collect().map(_.toSeq).toSet
    val streamed = canon(spark.read.parquet(dir))
    val oneShot = canon(graft.operators.Scd2.fromHistory(
      (b1 ++ b2).toDF(), "user_id",
      Seq(col("ts"), col("event_id")), Seq("event_type")))
    assert(streamed == oneShot)
    // user 1 has two versions; the open one is 'view'
    assert(streamed.count(_.head == 1L) == 2)
  }

  test("mergeParquetSink: later micro-batches refresh existing keys (CDC apply)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_sink")
      .toString + "/t"
    val mem = MemoryStream[Event](5, spark, None)
    val q = Streaming.mergeParquetSink(
      mem.toDF(), dir, keys = Seq("event_id"))
      .outputMode("update").start()
    try {
      mem.addData(Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:01:00"), 1, "click", 2.0))
      q.processAllAvailable()
      // changefeed update for key 2 + insert of key 3: merge semantics
      // must REPLACE 2's payload (unlike the idempotent sink) and
      // keep untouched key 1
      mem.addData(Event(2, ts("2024-01-01 00:01:00"), 1, "click", 99.0),
        Event(3, ts("2024-01-01 00:02:00"), 1, "view", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(dir)
      .orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    assert(rows.toSeq == Seq((1L, 1.0), (2L, 99.0), (3L, 3.0)))
  }

  test("flatMapGroupsWithState sessionize emits closed sessions") {
    import spark.implicits._
    val mem = MemoryStream[Event](3, spark, None)
    val q = Streaming.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      // push watermark forward so open sessions time out
      mem.addData(Event(99, ts("2024-01-01 12:00:00"), 3, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toString,
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSeq
    assert(got == Seq(
      (1L, "2024-01-01 00:05:00.0", 2L, 15.0),
      (1L, "2024-01-01 01:40:00.0", 1L, 1.0),
      (2L, "2024-01-01 01:10:00.0", 1L, 2.5),
      (2L, "2024-01-01 02:30:00.0", 1L, 4.0)))
  }
}
