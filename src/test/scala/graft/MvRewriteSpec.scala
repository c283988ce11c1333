package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{MvDef, MvRegistry}

/** Materialized-view rewrite (graft.plans.MvRewrite): the optimizer
  * answers grain-compatible aggregates from a registered summary
  * table. Laws pinned here:
  *   - the rewrite FIRES (optimized plan scans the MV path, not the
  *     base) and preserves results exactly vs the unregistered twin;
  *   - grain filters ride along; COUNT(*) rolls up to SUM(cnt);
  *   - every unsound shape is REFUSED: non-grain grouping, non-grain
  *     filter, uncovered measure, raw double sums (float addition
  *     order would change under regrouping), distinct aggregates;
  *   - unregistering restores the base scan.
  */
class MvRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.expressions.GraftExtensions.register(s)
    s
  }

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Seq.empty
      }
    }.flatten

  private lazy val stage = java.nio.file.Files
    .createTempDirectory("graft_mvspec_").toString
  private lazy val basePath = s"$stage/base"
  private lazy val mvPath = s"$stage/mv"

  private lazy val mv: MvDef = {
    import spark.implicits._
    val base = Seq(
      ("a", "x", 1L, 1.5), ("a", "x", 2L, 2.5), ("a", "y", 3L, 0.25),
      ("b", "x", 10L, 4.0), ("b", "y", 20L, 8.0), ("b", "y", 30L, 16.0),
      ("c", "z", 100L, 32.0))
      .toDF("g1", "g2", "v", "d")
    base.write.mode(SaveMode.Overwrite).parquet(basePath)
    spark.read.parquet(basePath)
      .groupBy(col("g1"), col("g2"))
      .agg(sum(col("v")).as("sum_v"),
        sum(col("d").cast("decimal(30,6)")).as("sum_d"),
        count(lit(1)).as("cnt"))
      .write.mode(SaveMode.Overwrite).parquet(mvPath)
    MvDef(basePath, mvPath, Seq("g1", "g2"),
      Map("v" -> "sum_v", "d" -> "sum_d"), "cnt")
  }

  private def rollup(): DataFrame = {
    mv // force the lazy base/MV write before the first read
    spark.read.parquet(basePath)
      .filter(col("g2") =!= "z")
      .groupBy(col("g1"))
      .agg(sum(col("v")).as("sv"),
        sum(col("d").cast("decimal(30,6)")).cast("double").as("sd"),
        count(lit(1)).as("n"))
      .orderBy(col("g1"))
  }

  test("rewrite fires, scans the MV, and preserves results exactly") {
    MvRegistry.clear()
    val expected = rollup().collect().toSeq
    MvRegistry.register(mv)
    try {
      val df = rollup()
      val paths = scanPaths(df)
      assert(paths.exists(_.endsWith("/mv")), s"no MV scan in $paths")
      assert(!paths.exists(_.endsWith("/base")),
        s"base still scanned: $paths")
      assert(df.collect().toSeq == expected)
    } finally MvRegistry.clear()
    // and the base scan comes back once unregistered
    assert(scanPaths(rollup()).exists(_.endsWith("/base")))
  }

  test("exact-grain grouping with no filter also rewrites") {
    MvRegistry.register(mv)
    try {
      val df = spark.read.parquet(basePath)
        .groupBy(col("g1"), col("g2"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .orderBy(col("g1"), col("g2"))
      assert(scanPaths(df).exists(_.endsWith("/mv")))
      assert(df.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq ==
        Seq(("a", "x", 2L, 3L), ("a", "y", 1L, 3L), ("b", "x", 1L, 10L),
          ("b", "y", 2L, 50L), ("c", "z", 1L, 100L)))
    } finally MvRegistry.clear()
  }

  test("unsound shapes are refused (base scan kept)") {
    MvRegistry.register(mv)
    try {
      val base = spark.read.parquet(basePath)
      // raw double sum: float addition order would change
      val rawDouble = base.groupBy(col("g1")).agg(sum(col("d")).as("sd"))
      assert(!scanPaths(rawDouble).exists(_.endsWith("/mv")))
      // non-grain grouping
      val offGrain = base.groupBy(col("v")).agg(count(lit(1)).as("n"))
      assert(!scanPaths(offGrain).exists(_.endsWith("/mv")))
      // filter on a non-grain column
      val offFilter = base.filter(col("v") > 1)
        .groupBy(col("g1")).agg(sum(col("v")).as("sv"))
      assert(!scanPaths(offFilter).exists(_.endsWith("/mv")))
      // distinct aggregate is not rollup-able from per-grain sums
      val distinctAgg = base.groupBy(col("g1"))
        .agg(countDistinct(col("g2")).as("n"))
      assert(!scanPaths(distinctAgg).exists(_.endsWith("/mv")))
      // measure the MV does not carry
      val uncovered = base.groupBy(col("g1"))
        .agg(sum(col("v") + col("v")).as("sv"))
      assert(!scanPaths(uncovered).exists(_.endsWith("/mv")))
    } finally MvRegistry.clear()
  }

  test("an incrementally maintained MV answers through the rewrite " +
      "(q136's partial-merge law composed with MvRewrite)") {
    import spark.implicits._
    MvRegistry.clear()
    val root = java.nio.file.Files
      .createTempDirectory("graft_mvmaint_").toString
    val basePath = s"$root/base"; val mvV1 = s"$root/mv_v1"
    val mvV2 = s"$root/mv_v2"
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("g1"), col("g2"))
        .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
    val day1 = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L))
      .toDF("g1", "g2", "v")
    val day2 = Seq(("a", "x", 10L), ("c", "z", 5L)).toDF("g1", "g2", "v")
    day1.write.parquet(basePath)
    partial(spark.read.parquet(basePath)).write.parquet(mvV1)
    // day-2 rows land in the base…
    day2.write.mode(SaveMode.Append).parquet(basePath)
    // …and the MV refreshes by MERGING delta partials (O(delta) work,
    // never a rebuild): sums add, counts add, new grains insert
    spark.read.parquet(mvV1).as("m")
      .join(partial(day2).as("d"), Seq("g1", "g2"), "full_outer")
      .select(col("g1"), col("g2"),
        (coalesce(col("m.sum_v"), lit(0L)) +
          coalesce(col("d.sum_v"), lit(0L))).as("sum_v"),
        (coalesce(col("m.cnt"), lit(0L)) +
          coalesce(col("d.cnt"), lit(0L))).as("cnt"))
      .write.parquet(mvV2)
    val mv2 = graft.plans.MvDef(basePath, mvV2, Seq("g1", "g2"),
      Map("v" -> "sum_v"), "cnt")
    val q = () => spark.read.parquet(basePath)
      .groupBy(col("g1"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .orderBy(col("g1"))
    val direct = q().collect().toSeq
    MvRegistry.register(mv2)
    try {
      val df = q()
      assert(scanPaths(df).exists(_.endsWith("/mv_v2")))
      assert(df.collect().toSeq == direct)
    } finally MvRegistry.clear()
  }

  test("capstone: commit-log ingestion -> change feed -> incremental " +
      "MV -> version-pinned rewrite, fresh at every version") {
    import spark.implicits._
    import graft.sources.CommitLog
    MvRegistry.clear()
    val root = java.nio.file.Files
      .createTempDirectory("graft_mvcap_").toString
    val tbl = s"$root/facts"; val cp = s"$root/cp"
    def batch(rows: (String, String, Long)*): DataFrame =
      rows.toDF("g1", "g2", "v")
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("g1"), col("g2"))
        .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
    var mvVersion = 0L
    def mvPath(v: Long) = s"$root/mv_v$v"
    // the standing consumer: each new append folds its partials into
    // the MV (O(delta)); nothing ever rescans the full history
    def maintain(): Unit =
      CommitLog.consumeChanges(spark, tbl, cp) { (v, delta) =>
        val fresh =
          if (mvVersion == 0L) partial(delta)
          else spark.read.parquet(mvPath(mvVersion)).as("m")
            .join(partial(delta).as("d"), Seq("g1", "g2"), "full_outer")
            .select(col("g1"), col("g2"),
              (coalesce(col("m.sum_v"), lit(0L)) +
                coalesce(col("d.sum_v"), lit(0L))).as("sum_v"),
              (coalesce(col("m.cnt"), lit(0L)) +
                coalesce(col("d.cnt"), lit(0L))).as("cnt"))
        fresh.write.parquet(mvPath(v))
        mvVersion = v
      }: Unit
    def check(): Unit = {
      val segs = CommitLog.snapshot(spark, tbl).get.segments
      val mv = MvDef(tbl, mvPath(mvVersion), Seq("g1", "g2"),
        Map("v" -> "sum_v"), "cnt", baseSegments = Some(segs))
      val q = () => CommitLog.read(spark, tbl)
        .groupBy(col("g1"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .orderBy(col("g1"))
      val direct = q().collect().toSeq
      MvRegistry.register(mv)
      try {
        val df = q()
        assert(scanPaths(df).exists(_.contains("/mv_v")),
          s"rewrite did not fire at version $mvVersion")
        assert(df.collect().toSeq == direct)
        // version pinning: a time-travel read of version 1 does NOT
        // match the current MV's segment set -> no rewrite, right data
        if (mvVersion > 1L) {
          val old = CommitLog.read(spark, tbl, Some(1L))
            .groupBy(col("g1")).agg(sum(col("v")).as("sv"))
          assert(!scanPaths(old).exists(_.contains("/mv_v")))
        }
      } finally MvRegistry.clear()
    }
    try {
      CommitLog.append(spark, tbl, batch(("a", "x", 1L), ("b", "y", 2L)))
      maintain(); check()
      CommitLog.append(spark, tbl, batch(("a", "x", 10L), ("c", "z", 5L)))
      maintain(); check()
      CommitLog.append(spark, tbl, batch(("b", "y", 100L)))
      maintain(); check()
    } finally {
      def go(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(go)); f.delete(): Unit
      }
      go(new java.io.File(root))
    }
  }

  test("results survive a parent projection over the rewritten agg") {
    MvRegistry.clear()
    val q = () => rollup().select(col("g1"), (col("sv") * 2).as("sv2"))
    val expected = q().collect().toSeq
    MvRegistry.register(mv)
    try assert(q().collect().toSeq == expected)
    finally MvRegistry.clear()
  }
}
