package graft.sources

import org.apache.spark.sql.SparkSession

/** Deep-clone support for [[CommitLog.cloneTable]] — Delta Lake's
  * CLONE design (public docs: "Clone a table on Databricks" /
  * delta.io CLONE) has two modes:
  *
  *  - '''shallow''' (the default, implemented in
  *    [[CommitLog.cloneTable]] itself) — the clone's v1 manifest
  *    REFERENCES the source snapshot's segment/DV paths in place:
  *    zero data copy, O(metadata) cost regardless of table size (the
  *    100 TB dev/test-branch pattern). The clone owns only its own
  *    manifests; every subsequent write lands under the clone's
  *    root, and the clone's VACUUM can never delete source bytes
  *    ([[CommitLog.vacuumPlan]] sweeps only the table's OWN `data/`,
  *    `_changes/`, `_dv/` — an external reference is structurally
  *    not a candidate). The ONE documented hazard, same as Delta's:
  *    a VACUUM on the SOURCE can drop segments a shallow clone still
  *    references — `fsck` on the clone flags them
  *    (`segment_missing`; [[CommitLogFsck]] stats every referenced
  *    path with its own FileSystem, so the check works across roots).
  *
  *  - '''deep''' ([[deepCopy]] here) — segment directories (data
  *    files AND their `_stats.json`/bloom sidecars — skipping
  *    survives the copy) byte-copy under the clone's root, one
  *    executor task per segment batch (the driver never pumps bytes;
  *    at scale this is the distcp shape), and the deletion vector is
  *    REWRITTEN with its file paths remapped (it keys rows by full
  *    file path — a byte copy would still point at the source's
  *    files, subtract nothing, and silently resurrect deleted rows).
  *    Fully independent of the source afterwards.
  *
  * Either way the clone starts a FRESH history: version 1, carrying
  * the source snapshot's schema (with its column-mapping metadata),
  * partition spec and CHECK constraints — but NOT its change feed or
  * versions (Delta's rule: clone history does not include source
  * history). `asOfVersion` clones a historical snapshot —
  * branch-from-the-past. */
private[sources] object CommitLogClone {

  /** Executor-side byte copy of each segment directory (with its
    * sidecars) under `dst`, plus the path-remapped DV rewrite.
    * Segment uuids and file names are preserved verbatim, so nothing
    * about skipping or mapping needs rewriting — only the DV's
    * full-path keys do. Returns the clone's (segments, dv). */
  private[sources] def deepCopy(spark: SparkSession,
      s: CommitLog.Snapshot,
      dst: String): (Seq[String], Option[String]) = {
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    def copyAll(pairs: Seq[(String, String)]): Unit = {
      if (pairs.isEmpty) return
      val ds = spark.createDataset(pairs)(
        org.apache.spark.sql.Encoders.product[(String, String)])
        .repartition(math.min(pairs.size,
          spark.sparkContext.defaultParallelism).max(1))
      ds.foreachPartition {
        (it: Iterator[(String, String)]) =>
          val conf = confB.value.value
          it.foreach { case (from, to) =>
            val fp = new org.apache.hadoop.fs.Path(from)
            val tp = new org.apache.hadoop.fs.Path(to)
            val ffs = fp.getFileSystem(conf)
            val tfs = tp.getFileSystem(conf)
            if (!org.apache.hadoop.fs.FileUtil.copy(
                ffs, fp, tfs, tp, false, true, conf))
              throw new java.io.IOException(
                s"CommitLogClone: copy $from -> $to failed")
          }
      }
    }
    def tail(p: String): String = p.substring(p.lastIndexOf('/') + 1)
    val segPairs = s.segments.map(p => p -> s"$dst/data/${tail(p)}")
    copyAll(segPairs)
    val dv = s.dv.map { d =>
      val to = s"$dst/_dv/${tail(d)}"
      // Remap by SEGMENT-ROOT prefix, not by the file's parent
      // component: a segment adopted via convertParquet can be a
      // nested tree (Hive-partitioned `seg/year=2024/part-*.parquet`),
      // where the parent component is the leaf dir, not the segment
      // uuid — the old parent-keyed lookup would miss, keep the
      // SOURCE path, subtract nothing, and deleted rows would
      // resurrect in the clone. Fast path stays O(path-depth) per DV
      // row: try each component (deepest first) against a
      // tail-component map, then CONFIRM containment of the full
      // segment root (`from + "/"` — file paths carry a scheme
      // prefix the manifest paths lack, so contains, not prefix);
      // ties (two segments sharing a tail) resolve to the longest
      // matching root. A DV row matching NO cloned segment refuses
      // loudly — keeping it un-remapped would silently resurrect
      // rows. A UDF is fine here: a bounded one-shot maintenance
      // job, not a query hot path.
      val byTail: Map[String, Seq[(String, String)]] =
        segPairs.groupBy { case (f, _) => tail(f) }
      val remap = org.apache.spark.sql.functions.udf { (p: String) =>
        val comps = p.split('/')
        val hits = comps.indices.reverseIterator.flatMap(i =>
          byTail.getOrElse(comps(i), Nil)
            .filter { case (from, _) => p.contains(from + "/") })
          .toSeq
        hits.sortBy { case (from, _) => -from.length }.headOption match {
          case Some((from, t2)) => p.replace(from + "/", t2 + "/")
          case None => throw new IllegalStateException(
            s"CommitLogClone: deletion-vector row references $p, " +
              "which is under none of the cloned segments — the " +
              "clone cannot remap it (OPTIMIZE the source to " +
              "materialize the vector, then re-clone)")
        }
      }
      spark.read.parquet(d)
        .withColumn("_dv_file", remap(
          org.apache.spark.sql.functions.col("_dv_file")))
        .repartition(1)
        .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(to)
      to
    }
    (segPairs.map(_._2), dv)
  }
}
