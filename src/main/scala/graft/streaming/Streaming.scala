package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.4 streaming row; the
  * reference is strictly batch, so this is north-star scope).
  *
  * Every transform here takes a DataFrame and works identically on a
  * batch frame or a `readStream` frame — the engine's batch/stream
  * parity contract (tested in StreamingSpec against the q13 batch
  * oracle query). Watermarks bound state: at 100 TB/day the windowed
  * aggregations are incremental with O(open windows) state per key,
  * and late data beyond the watermark is dropped deterministically.
  */
object Streaming {

  /** Tumbling-window counts/sums per event type — the streaming twin
    * of batch query q13 (same aggregation expressions). */
  def tumblingAgg(events: DataFrame, windowLen: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window event rate per type (overlapping windows). */
  def slidingAgg(events: DataFrame, windowLen: String, slide: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Session windows with a fixed inactivity gap (built-in
    * `session_window` — merges adjacent events per user). */
  def sessionAgg(events: DataFrame, gap: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Watermarked stream-stream inner join: left events matched to
    * right events of the same user within `[left.ts, left.ts + window]`
    * — both sides watermarked so join state is bounded (Spark drops a
    * buffered row once it can no longer match). */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      windowExpr: String, watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("l_event_id"), col("user_id"),
        col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowExpr"))
      .drop("r_user_id")
  }

  /** Left-outer variant of [[streamStreamJoin]]: a left event with no
    * right match inside its window is still emitted — with NULL right
    * columns — once the right watermark passes the window end, so no
    * left row waits forever and state stays bounded. The outer result
    * is what an enrichment pipeline needs when the enriching stream
    * may simply not have a row. */
  def streamStreamJoinLeftOuter(left: DataFrame, right: DataFrame,
      windowExpr: String, watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("l_event_id"), col("user_id"),
        col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowExpr"),
      "left_outer")
      .drop("r_user_id")
  }

  /** Streaming deduplication on a key set with watermark-bounded
    * state: the first arrival wins; later same-key arrivals within the
    * watermark horizon are dropped EVEN IF their event time differs
    * (a redelivered event re-stamped 1 ms later is still the same
    * event — keying on (keys, ts) would let it through). */
  def dedupStream(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming idempotent sink: every micro-batch lands through the
    * engine's first-writer-wins upsert (SURVEY S4) via foreachBatch —
    * replays, overlapping batches and at-least-once delivery all
    * collapse to exactly-once keyed state in the target, the streaming
    * twin of the reference's `ON CONFLICT DO NOTHING` loader. */
  def idempotentParquetSink(df: DataFrame, path: String, keys: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        graft.operators.IdempotentInsert
          .intoParquet(batch.sparkSession, batch, path, keys)
        ()
    }

  /** Streaming EXACTLY-ONCE append sink into a [[graft.sources.CommitLog]]
    * table: each micro-batch commits as one manifest version stamped
    * (appId, batchId), so the crash-replay of a micro-batch (Structured
    * Streaming re-runs the last uncommitted-at-the-SINK batch on
    * restart) is recognized by [[graft.sources.CommitLog.lastTxn]] and
    * skipped — no keys required, unlike [[idempotentParquetSink]],
    * which buys idempotence from the data's primary key. This is the
    * transactional-sink design Delta's streaming writer documents
    * (txn action + version watermark), re-expressed over the repo's
    * manifest log; concurrent BATCH writers interleave safely because
    * every commit still goes through the optimistic version race. */
  /** Streaming EXACTLY-ONCE UPSERT sink into a commit-log table —
    * Delta's foreachBatch-MERGE pattern with the txn stamp folded
    * into the merge commit itself: each micro-batch is ONE
    * (appId, batchId)-stamped merge version, so crash replay (and a
    * concurrent replica of the same query) recognizes an
    * already-applied batch at the watermark and skips — idempotence
    * without relying on the payload being idempotent. The first
    * batch creates the table (txn-stamped append); later batches
    * merge on `keys` — matched rows take `update` (default: every
    * non-key source column by name, i.e. last-writer-wins upsert;
    * pass e.g. `greatest(col(v), CommitLog.src(v))` for an
    * order-insensitive fold), unmatched rows insert. A batch with
    * duplicate keys refuses loudly (merge's own contract) —
    * aggregate the batch first. */
  def commitLogUpsertSink(df: DataFrame, table: String,
      keys: Seq[String], appId: String,
      update: Map[String, org.apache.spark.sql.Column] = Map.empty)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        if (graft.sources.CommitLog.snapshot(s, table).isEmpty)
          graft.sources.CommitLog.appendTxn(s, table, batch,
            appId, batchId): Unit
        else {
          val set =
            if (update.nonEmpty) update
            else batch.columns.filterNot(keys.contains).map(c =>
              c -> graft.sources.CommitLog.src(c)).toMap
          graft.sources.CommitLog.mergeIntoClauses(s, table, batch,
            keys,
            matched = Seq(graft.sources.CommitLog.MergeUpdate(set)),
            txn = Some((appId, batchId))): Unit
        }
    }

  def commitLogSink(df: DataFrame, table: String, appId: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        graft.sources.CommitLog.appendTxn(batch.sparkSession, table,
          batch, appId, batchId)
        ()
    }

  /** Streaming corpus-dedup gate: drop stream documents whose content
    * fingerprint already exists in a STATIC historical corpus — the
    * "is this crawl page already in the training set?" filter an
    * ingest pipeline runs before anything else. A stream-static LEFT
    * ANTI join: the static side is a (fingerprint) relation (broadcast
    * when small, shuffled otherwise), the stream side fingerprints
    * map-side. Compose with [[dedupStream]] for within-stream
    * duplicates and the batch near-dup operators downstream.
    * `docs` must carry a `text` column; emits the input columns plus
    * the computed `fingerprint`. */
  def dedupAgainstCorpus(docs: DataFrame, corpusFingerprints: DataFrame)
      : DataFrame = {
    // fingerprint via the JVM kernel (polyHashJvm), not the HOF
    // expression — the HOF form is interpreted per character and this
    // gate runs on every micro-batch; a NULL text gets a NULL
    // fingerprint, which never matches the anti-join key and passes
    // through (same as the expression form)
    val outSchema = docs.schema.add("fingerprint",
      org.apache.spark.sql.types.LongType)
    val idx = docs.schema.fieldIndex("text")
    val withFp = docs.mapPartitions { it =>
      it.map { r =>
        val t = if (r.isNullAt(idx)) null else r.getString(idx)
        val fp: java.lang.Long =
          if (t == null) null
          else java.lang.Long.valueOf(
            graft.functions.TextFunctions.polyHashJvm(t))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (fp: Any))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    withFp.join(corpusFingerprints.select("fingerprint"),
      Seq("fingerprint"), "left_anti")
  }

  /** Streaming CDC apply: every micro-batch MERGES into the target by
    * key (replace existing keys, insert new, keep the rest) via the
    * engine's rename-swap parquet merge — the streaming twin of a
    * changefeed applier materializing the LATEST row per key. Within a
    * micro-batch the greatest payload struct wins (deterministic, see
    * `mergeIntoParquet`); across batches the last batch wins. Use
    * [[idempotentParquetSink]] instead when the target must be
    * append-only first-writer-wins. */
  def mergeParquetSink(df: DataFrame, path: String, keys: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        graft.operators.IdempotentInsert
          .mergeIntoParquet(batch.sparkSession, batch, path, keys)
        ()
    }

  /** Streaming SCD Type 2 maintenance: each micro-batch of attribute
    * observations folds into the versioned dimension via
    * `Scd2.applyBatch` (first batch builds via `fromHistory`), and the
    * refreshed dimension swaps in with the engine's rename-swap
    * parquet commit (same recovery contract as `mergeIntoParquet`:
    * the fully-written .tmp is the recovery point). Streaming
    * micro-batches arrive in event-time order per key under a
    * watermark, which is exactly `applyBatch`'s append-only contract —
    * so N micro-batches produce the same dimension as one
    * `fromHistory` over the union (StreamingSpec pins this law on
    * MemoryStream batches). Only batch-touched keys are re-folded;
    * at 100 TB the dimension rewrite swaps per key-partition instead
    * of whole-table (the table-format commit a real lakehouse does). */
  def scd2ParquetSink(obs: DataFrame, path: String, key: String,
      ordNames: Seq[String], attrs: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    obs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val ord = ordNames.map(org.apache.spark.sql.functions.col)
      val existing =
        try Some(spark.read.parquet(path))
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getErrorClass == "PATH_NOT_FOUND" ||
                e.getErrorClass == "UNABLE_TO_INFER_SCHEMA" => None
        }
      val updated = existing match {
        case None => graft.operators.Scd2
          .fromHistory(batch, key, ord, attrs)
        case Some(dim) => graft.operators.Scd2
          .applyBatch(dim, batch, key, ord, ordNames, attrs)
      }
      val staged = updated.persist()
      staged.count() // materialize BEFORE touching the source it reads
      val fs = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
      val dst = new org.apache.hadoop.fs.Path(path)
      try staged.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(path + ".tmp")
      catch { case e: Throwable => fs.delete(tmp, true); throw e }
      finally staged.unpersist()
      fs.delete(dst, true)
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(
          s"scd2ParquetSink: rename $tmp -> $dst failed after target " +
            "delete; recover by renaming the .tmp directory to the target")
      ()
    }

  // ---- custom state: flatMapGroupsWithState sessionization ----------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState: emits a
    * session row when a user is inactive for `gapMs` (event-time
    * timeout). Demonstrates the arbitrary-state API the built-in
    * session_window can't express (e.g. per-session custom metrics). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastTs), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.lastTs), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
