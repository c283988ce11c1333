package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format surface beyond parquet (SURVEY S1 generalized):
  * CSV and JSON lines with explicit schemas (never inference in
  * production paths — inference is a full extra scan and a schema
  * drift hazard), and partitioned/bucketed parquet layout helpers.
  *
  * Scale notes: partition columns become directory pruning (zero I/O
  * for fenced-out partitions — the `PartitionFilters` entry in the
  * scan); bucketing pre-shuffles by join key at write time so
  * repeated joins/aggregations on that key skip their exchange.
  */
object Formats {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .schema(schema)
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet: one directory per value of
    * `partitionBy` — equality/fence predicates on those columns prune
    * whole directories at planning time. */
  def writePartitioned(df: DataFrame, path: String,
      partitionBy: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(path)

  /** Bucketed + sorted catalog table: pre-shuffles by the bucket key
    * at write time, so joins/aggregations between tables bucketed the
    * same way need NO exchange at read time — at 100 TB this turns the
    * recurring fact-fact join's dominant shuffle into a one-time write
    * cost. Requires `saveAsTable` (bucket metadata lives in the
    * catalog, not the files). */
  def writeBucketed(df: DataFrame, table: String, bucketBy: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
      .sortBy(bucketBy.head, bucketBy.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Compact a parquet directory's small files into
    * ceil(rows / targetRowsPerFile) files — the standard lakehouse
    * maintenance pass (Delta/Iceberg OPTIMIZE equivalent): streaming
    * sinks and fine-grained upserts accrete thousands of tiny files,
    * and at 100 TB the per-file open/footer cost dominates scans long
    * before the data does. Stages into `path + ".compact.tmp"` (the
    * source is never read-after-overwrite) then swaps via one
    * filesystem rename; the tmp copy is the recovery point during the
    * only non-atomic window. Returns the new file count. */
  def compact(spark: SparkSession, path: String,
      targetRowsPerFile: Long): Int = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be > 0")
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1L,
      (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact.tmp")
    val dst = new org.apache.hadoop.fs.Path(path)
    try df.repartition(files).write.mode("overwrite")
      .parquet(tmp.toString)
    catch { case e: Throwable => fs.delete(tmp, true); throw e }
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(
        s"compact: rename $tmp -> $dst failed after target delete; " +
          "recover by renaming the .compact.tmp directory to the target")
    files
  }

  /** Morton (Z-order) key of two non-negative integer columns: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Rows close in
    * BOTH dimensions are close in z — pure shifts/ands, fully
    * codegen'd. Inputs must fit `bits` bits (≤ 31); out-of-range rows
    * (negative, or ≥ 2^bits) FAIL LOUDLY via `raise_error` rather than
    * silently interleaving two's-complement bits — that would destroy
    * z-locality (and the pruning win) with no visible symptom. Callers
    * with signed/wide columns should pre-shift (`col - min`) or bucket
    * (`pmod`) into range first. The guard is two codegen'd comparisons
    * per row on a one-time layout write — negligible. */
  def zOrderKey(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, bits: Int)
      : org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    import org.apache.spark.sql.functions._
    val max = 1L << bits
    val av = a.cast("long")
    val bv = b.cast("long")
    val zkey = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(av, i)
          .bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bv, i)
          .bitwiseAND(lit(1L)), 2 * i + 1))
    }
    // one guard per row wrapping the whole key, not per bit
    when(av < 0L || av >= max || bv < 0L || bv >= max,
      raise_error(concat(
        lit(s"zOrderKey: input out of [0, $max) for bits=$bits: ("),
        av.cast("string"), lit(", "), bv.cast("string"), lit(")"))))
      .otherwise(zkey)
  }

  /** Z-ORDERED parquet layout: range-partition + sort by the Morton
    * key of two filter columns, so every file/row-group covers a
    * compact 2-D block and carries TIGHT min/max statistics on BOTH
    * columns — a conjunctive box filter then skips most row groups at
    * scan time (parquet pushdown), where a single-column sort order
    * leaves the second column's stats useless. At 100 TB this is the
    * layout lever for multi-dimension point/box lookups (the
    * Delta/Iceberg OPTIMIZE ZORDER equivalent, expressed with stock
    * Spark writes). `maxRecordsPerFile` bounds the pruning granule.
    * FormatsSpec MEASURES the effect (rows read, z vs linear). */
  /** FILE-LEVEL min/max data-skipping index — the Delta/Iceberg
    * stats-log idea expressed with stock Spark: write the data
    * range-clustered on the skip column (so per-file ranges are
    * tight), then record one (file, min, max) row per file per stats
    * column in a tiny side parquet. [[readSkipping]] consults the
    * index FIRST and hands Spark only the files whose [min,max]
    * intersects the predicate — pruning at the FILE LIST level,
    * before any footer is opened. This composes with (and sits above)
    * parquet row-group pushdown: at 100 TB the driver-side listing of
    * a million files is itself the bottleneck, and a stats index
    * turns "open every footer" into one small index scan.
    * FormatsSpec MEASURES the file-count reduction and pins result
    * equality against the full scan. */
  def writeWithStats(df: DataFrame, path: String, statsCols: Seq[String],
      partitions: Int = 8): Unit = {
    require(statsCols.nonEmpty)
    import org.apache.spark.sql.functions._
    df.repartitionByRange(partitions, col(statsCols.head))
      .sortWithinPartitions(statsCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(path + ".stats")
  }

  /** Range scan over a [[writeWithStats]] layout: prune the file list
    * via the stats index, then apply the exact predicate to the
    * surviving files. Files whose stats column is entirely NULL are
    * skipped too — NULL never satisfies a range predicate, so the
    * result still equals the full-scan filter exactly. */
  def readSkipping(spark: SparkSession, path: String, statsCol: String,
      lo: Any, hi: Any): DataFrame = {
    import org.apache.spark.sql.functions._
    val stats = spark.read.parquet(path + ".stats")
    val keep = stats
      .filter(col(s"${statsCol}_max") >= lit(lo) &&
        col(s"${statsCol}_min") <= lit(hi))
      .select("file").collect().map(_.getString(0))
    val pred = col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi)
    if (keep.isEmpty)
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.parquet(keep: _*).filter(pred)
  }

  /** FILE-LEVEL BLOOM-FILTER skipping index — the point-lookup
    * complement of [[writeWithStats]]. Min/max stats only prune when
    * the layout clusters the probe column; a high-cardinality key
    * scattered by an unrelated clustering (the usual case: data laid
    * out by ingest time, probed by entity id) has every file's
    * [min,max] covering every probe. A per-file Bloom filter answers
    * "might this file contain key x?" regardless of layout: k hash
    * bits per key, no false negatives, false positives only cost an
    * extra file read. This is Delta/Iceberg's bloom column index and
    * parquet's bloom_filter_enabled expressed engine-side, with the
    * index queryable as data (one row per file, sorted set-bit list).
    *
    * Determinism/portability: positions are Kirsch–Mitzenmacher
    * h1 + i·h2 over two 60-bit md5 slices of the key's string form —
    * the same md5-based family as [[graft.operators.KmvSketch]]
    * (mod-p polynomial mixes measurably fail uniformity on
    * translate-structured key sets; see Pipeline15's scaladoc).
    *
    * Sizing: `mBits` should be ≥ ~10–16 bits per distinct key per
    * file for ~1% fpp at k=3; the side table stores SET bits only, so
    * an oversized m costs nothing extra. */
  def writeBloomIndex(spark: SparkSession, path: String, keyCol: String,
      mBits: Int = 1 << 18, numHashes: Int = 3): Unit = {
    require(mBits > 0 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two: $mBits")
    require(numHashes >= 1 && numHashes <= 8,
      s"numHashes out of [1,8]: $numHashes")
    import org.apache.spark.sql.functions._
    val key = col(keyCol).cast("string")
    val h1 = conv(substring(md5(key), 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(md5(key), 17, 15), 16, 10).cast("long")
    val bits = explode(array((0 until numHashes).map(i =>
      pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong)).cast("int")): _*))
    spark.read.parquet(path)
      .select(input_file_name().as("file"), bits.as("bit"))
      .distinct()
      .groupBy(col("file"))
      .agg(sort_array(collect_set(col("bit"))).as("bits"))
      .coalesce(1)
      .write.mode("overwrite").parquet(path + ".bloom")
  }

  /** Driver-side twin of the index's hash — byte-identical to Spark's
    * `md5(cast(key as string))` (hex lowercase, slices [0,15) and
    * [16,31) parsed base 16). */
  private[graft] def bloomPositions(key: String, mBits: Int,
      numHashes: Int): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(16, 31), 16)
    (0 until numHashes).map(i =>
      java.lang.Math.floorMod(h1 + i.toLong * h2, mBits.toLong).toInt)
  }

  /** The bloom index rows that admit at least one probe key,
    * evaluated RELATIONALLY: the probe position lists ride along as
    * one literal (bounded by the caller's key list × numHashes ints)
    * and each file's membership test runs where its index row lives —
    * only the surviving file names ever reach the driver. At ~1M
    * files a driver-side Set filter over the collected index was the
    * bottleneck; this is the same survivors-only shape as the
    * commit-log bloom tier (`CommitLogStats.attachBlooms`). */
  private[graft] def bloomKeepFiles(spark: SparkSession, path: String,
      keys: Seq[Long], mBits: Int, numHashes: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val probes = keys.map(k =>
      bloomPositions(k.toString, mBits, numHashes).toArray)
    spark.read.parquet(path + ".bloom")
      .filter(exists(typedLit(probes),
        p => size(array_except(p, col("bits"))) === 0))
      .select("file")
  }

  /** Point-lookup over a [[writeBloomIndex]]ed layout: keep only the
    * files whose bloom admits at least one probe key (no false
    * negatives ⇒ exact equality with the full-scan filter), then
    * apply the exact IN predicate to the survivors. The index scan is
    * one tiny side table, filtered distributed ([[bloomKeepFiles]]);
    * at 100 TB the win is identical in shape to [[readSkipping]] but
    * holds on UNclustered keys. */
  def readBloomSkipping(spark: SparkSession, path: String, keyCol: String,
      keys: Seq[Long], mBits: Int = 1 << 18, numHashes: Int = 3)
      : DataFrame = {
    import org.apache.spark.sql.functions._
    val keep = bloomKeepFiles(spark, path, keys, mBits, numHashes)
      .collect().map(_.getString(0))
    val pred = col(keyCol).isin(keys: _*)
    if (keep.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(keep.toIndexedSeq: _*).filter(pred)
  }

  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, bits: Int, partitions: Int = 8,
      maxRecordsPerFile: Int = 0): Unit = {
    val z = zOrderKey(
      org.apache.spark.sql.functions.col(colA),
      org.apache.spark.sql.functions.col(colB), bits)
    val writer = df.withColumn("__z", z)
      .repartitionByRange(partitions, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
      writer.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    else writer).parquet(path)
  }
}
