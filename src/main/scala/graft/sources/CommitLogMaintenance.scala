package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `maintenance_plan` — the "what should I run on this table"
  * advisor. At 100 TB nobody eyeballs a table tree; the operational
  * loop is: a scheduler asks every table what maintenance it needs,
  * then runs exactly that (the public shape of Databricks' predictive
  * optimization and Iceberg's maintenance tooling). Each
  * recommendation is `(action, reason, command)` — the command is the
  * literal `CALL` to run — and an empty result means the table needs
  * nothing.
  *
  * All signals derive from metadata already on hand: ONE snapshot
  * resolution, the per-segment sidecar reads the skipping planner
  * does anyway, one `_commits/` listing, and [[CommitLog.vacuumPlan]]
  * (which plans, never deletes). The only data-proportional probe is
  * the deletion-vector row count, and that is read from parquet
  * footer stats and cached per immutable DV dir.
  *
  * Thresholds are parameters (defaults are the 100 TB-sensible ones)
  * so schedulers — and the specs — can tune when each signal fires.
  */
object CommitLogMaintenance {

  /** Inspect `table` and return recommended maintenance as
    * `(action, reason, command)` rows; empty ⇒ healthy.
    *
    * Signals, in severity order:
    *  1. segment count past the WARN bound → compact (planning and
    *     checkpoint bytes scale with the segment list);
    *  2. small-segment table (average rows per segment below
    *     `smallSegmentRows` across ≥ `minSegmentsForCompact`
    *     segments, all sidecar'd) → compact — the classic
    *     small-files problem;
    *  3. deletion vector covering ≥ `dvMaterializeFraction` of the
    *     rows → compact to materialize (every read pays the
    *     anti-join until then);
    *  4. segments missing stats sidecars → OPTIMIZE to restore
    *     pruning (lost sidecars cost scans, never rows);
    *  5. legacy-keyed sidecars on a column-mapped table → OPTIMIZE
    *     to upgrade to physical keys (hazard-filtered lookups prune
    *     less);
    *  6. checkpoint lag ≥ `checkpointLagIntervals` × cadence →
    *     CALL checkpoint (a crash left a cadence gap; every
    *     resolution replays the long tail);
    *  7. unreferenced segment/DV/CDC dirs → vacuum (crashed or
    *     race-losing writers' debris). */
  def maintenancePlan(spark: SparkSession, table: String,
      smallSegmentRows: Long = 1L << 20,
      minSegmentsForCompact: Int = 8,
      dvMaterializeFraction: Double = 0.10,
      checkpointLagIntervals: Int = 1): DataFrame = {
    import spark.implicits._
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val snapOpt = CommitLog.snapshot(spark, table)
    if (snapOpt.isEmpty)
      return out.toSeq.toDF("action", "reason", "command")
    val snap = snapOpt.get
    val ref = s"table => '<table>'"

    val sided = snap.segments.map(s =>
      s -> CommitLogStats.readSidecar(spark, s))
    val statsCovered = sided.count(_._2.isDefined)
    val rowsKnown = statsCovered == snap.segments.size
    val totalRows = sided.flatMap(_._2).map(_.rows).sum

    // 1 & 2: segment-count pressure / small segments
    val (warnSegs, maxSegs) = CommitLog.segmentBounds(spark)
    if (snap.segments.size > warnSegs)
      out += (("compact",
        s"${snap.segments.size} segments exceed the warn bound " +
          s"$warnSegs (hard bound $maxSegs) — checkpoint bytes and " +
          "every reader's planning scale with the segment list",
        s"CALL system.compact($ref)"))
    else if (rowsKnown && snap.segments.size >= minSegmentsForCompact &&
        totalRows / snap.segments.size < smallSegmentRows)
      out += (("compact",
        s"${snap.segments.size} segments average " +
          s"${totalRows / snap.segments.size} rows (< " +
          s"$smallSegmentRows) — the small-files problem: per-file " +
          "open/footer costs dominate the scan",
        s"CALL system.compact($ref)"))

    // 3: deletion-vector materialization
    snap.dv.foreach { d =>
      val dvRows =
        try spark.read.parquet(d).count()
        catch { case scala.util.control.NonFatal(_) => 0L }
      if (rowsKnown && totalRows > 0L &&
          dvRows.toDouble / totalRows >= dvMaterializeFraction)
        out += (("compact",
          f"the deletion vector covers $dvRows of $totalRows rows " +
            f"(${dvRows * 100.0 / totalRows}%.0f%% ≥ " +
            f"${dvMaterializeFraction * 100}%.0f%%) — every read " +
            "pays the subtraction anti-join until a rewrite " +
            "materializes it",
          s"CALL system.compact($ref)"))
    }

    // 4: stats-sidecar coverage (lost pruning, never rows)
    if (statsCovered < snap.segments.size)
      out += (("optimize_cluster",
        s"${snap.segments.size - statsCovered} of " +
          s"${snap.segments.size} segments carry no stats sidecar — " +
          "range probes must keep them; an OPTIMIZE rewrite restores " +
          "pruning",
        s"CALL system.optimize_cluster($ref, cluster_by => '<cols>', " +
          "segments => <n>)"))

    // 5: sidecar key era on mapped tables
    val mapped = snap.schema.map(CommitLog.decodeSchema)
      .exists(s => !CommitLog.isIdentityMapping(s))
    if (mapped) {
      val legacy = sided.count(_._2.exists(st => !st.physicalKeys))
      if (legacy > 0)
        out += (("optimize_cluster",
          s"$legacy sidecar(s) on this column-mapped table still " +
            "use write-time logical keys — lookups fall back to " +
            "hazard-filtered aliases (reduced pruning); a rewrite " +
            "re-keys them physically",
          s"CALL system.optimize_cluster($ref, cluster_by => " +
            "'<cols>', segments => <n>)"))
    }

    // 5b: fragmented bucket layout — DML on a bucketed table re-lands
    // its rewrites bucket-split (the SPJ claim survives), so buckets
    // accumulate segments over time; past ~2 segments per bucket the
    // per-file costs of the layout's own scans creep back — one
    // re-bucket OPTIMIZE consolidates to one segment per bucket
    snap.bucket.flatMap(CommitLog.decodeBucketSpec).foreach { bs =>
      if (snap.segments.size > 2 * bs.n)
        out += (("optimize_bucket",
          s"bucketed layout fragmented: ${snap.segments.size} " +
            s"segments over ${bs.n} buckets (DML re-splits " +
            "accumulate) — the SPJ claim still holds, but per-file " +
            "scan costs creep back; re-bucket to one segment each",
          s"CALL system.optimize_bucket($ref, keys => " +
            s"'${bs.keys.mkString(",")}', buckets => ${bs.n})"))
    }

    // 5c: LEGACY pre-grid multi-key bucket record — bounded DML
    // write amplification survives, but the layout can never claim a
    // storage-partitioned join (a composite bucket(n, k1, k2) can't
    // line up with the individual join keys under Spark's
    // single-reference transform rule), so every join over it
    // silently shuffles; one migration re-land upgrades the record
    snap.bucket.flatMap(CommitLog.decodeBucketSpec).foreach { bs =>
      if (bs.keys.size > 1 && !bs.gridClaimable)
        out += (("optimize_grid",
          s"legacy composite bucket record on keys " +
            s"(${bs.keys.mkString(", ")}): bounded DML holds, but " +
            "joins can never claim the storage-partitioned layout " +
            "(no per-key grid counts) and silently shuffle — " +
            "migrate to the per-key grid",
          s"CALL system.optimize_grid($ref)"))
    }

    // 6: checkpoint lag (a crash left a cadence gap)
    val interval = CommitLog.checkpointInterval(spark)
    val f = CommitLog.fs(spark, table)
    val cd = new org.apache.hadoop.fs.Path(CommitLog.commitsDir(table))
    val latestCp =
      if (!f.exists(cd)) None
      else f.listStatus(cd).toSeq.map(_.getPath.getName)
        .filter(_.endsWith(".checkpoint"))
        .map(_.stripSuffix(".checkpoint").toLong)
        .filter(_ <= snap.version).sorted.lastOption
    val vs = CommitLog.versions(spark, table)
    // replay anchors at the floor's self-contained record when no
    // checkpoint exists (v1, or the vacuum pin shape) — lag counts
    // records replayed past the best anchor
    val anchor = latestCp.getOrElse(vs.headOption.getOrElse(1L))
    val lag = snap.version - anchor
    if (lag >= checkpointLagIntervals.toLong * interval)
      out += (("checkpoint",
        s"resolution replays $lag delta records past the last " +
          s"full-state pin at v$anchor (cadence $interval — a crash " +
          "skipped a cadence write); one checkpoint restores " +
          "O(interval) reads",
        s"CALL system.checkpoint($ref)"))

    // 7: debris (plans only — vacuumPlan never deletes)
    val (deadSegs, deadChanges, deadDvs, _) =
      CommitLog.vacuumPlan(spark, table, retainVersions = 2)
    val dead = deadSegs.size + deadChanges.size + deadDvs.size
    if (dead > 0)
      out += (("vacuum",
        s"$dead unreferenced dir(s) (${deadSegs.size} segments, " +
          s"${deadChanges.size} CDC, ${deadDvs.size} DV) from " +
          "crashed/race-losing writers or dropped versions — dead " +
          "bytes until a vacuum sweeps them",
        s"CALL system.vacuum($ref, retain => 2)"))

    out.toSeq.toDF("action", "reason", "command")
  }
}
