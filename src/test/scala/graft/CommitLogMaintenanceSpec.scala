package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CommitLog, CommitLogMaintenance, CommitLogStats}

/** The maintenance advisor: a healthy table recommends NOTHING, and
  * each degradation signal fires its action with the CALL to run —
  * the operational loop at 100 TB is "ask every table what it needs,
  * run exactly that". */
class CommitLogMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_maint_")
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

  private def actions(t: String): Seq[String] =
    CommitLogMaintenance.maintenancePlan(spark, t)
      .select("action").collect().map(_.getString(0)).toSeq.sorted

  test("a healthy table recommends nothing; CALL system." +
      "maintenance_plan composes in SQL") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_maint_sql_").toString
    try {
      spark.conf.set("spark.sql.catalog.gmx",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.gmx.root", root)
      val path = s"$root/ns/t"
      // three sidecar'd appends: few segments, stats covered, no DV,
      // no debris, checkpoint lag 2 < cadence
      (1 to 3).foreach(i => CommitLogStats.appendWithStats(spark, path,
        df((1 to 20).map(j => (i * 100L + j, s"n$j", j * 1.0)): _*),
        statsCols = Seq("id")))
      assert(CommitLogMaintenance.maintenancePlan(spark, path)
        .count() === 0L)
      spark.sql("CREATE TABLE gmx.ns.u (id BIGINT)") // catalog alive
      assert(spark.sql(
        "CALL gmx.system.maintenance_plan(table => 'ns.t')")
        .count() === 0L)
      spark.sql("DROP TABLE gmx.ns.u")
    } finally {
      spark.conf.unset("spark.sql.catalog.gmx")
      spark.conf.unset("spark.sql.catalog.gmx.root")
      rm(root + "/x")
    }
  }

  test("CALL system.detail returns the TYPED one-row summary; CALL " +
      "system.vacuum_plan names exactly what vacuum would sweep") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_maint_detail_").toString
    try {
      spark.conf.set("spark.sql.catalog.gdt",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.gdt.root", root)
      val path = s"$root/ns/t"
      (1 to 3).foreach(i => CommitLogStats.appendWithStats(spark, path,
        df((1 to 10).map(j => (i * 100L + j, s"n$j", j * 1.0)): _*),
        statsCols = Seq("id")))
      spark.sql("CREATE TABLE gdt.ns.u (id BIGINT)") // catalog alive
      val det = spark.sql("CALL gdt.system.detail(table => 'ns.t')")
      // typed columns survive the CALL bridge
      val r = det.collect()(0)
      assert(r.getAs[Long]("version") === 3L)
      assert(r.getAs[Int]("n_segments") === 3)
      assert(r.getAs[Boolean]("has_deletion_vector") === false)
      assert(r.getAs[Long]("total_bytes") > 0L)
      // 3 versions retained by default 2 → version 1 sweeps: its
      // manifest + the segment it solely references
      val plan = spark.sql(
        "CALL gdt.system.vacuum_plan(table => 'ns.t')")
        .collect().map(x => (x.getString(0), x.getString(1)))
      assert(plan.count(_._1 == "dropped_version") === 1)
      assert(plan.exists(_ == ("dropped_version", "1")))
      // content untouched by the dry run
      assert(CommitLog.versions(spark, path).size === 3)
      spark.sql("DROP TABLE gdt.ns.u")
    } finally {
      spark.conf.unset("spark.sql.catalog.gdt")
      spark.conf.unset("spark.sql.catalog.gdt.root")
      rm(root + "/x")
    }
  }

  test("small-segment pressure recommends compact (rows known via " +
      "sidecars, many tiny segments)") {
    val t = tmpTable()
    try {
      (1 to 9).foreach(i => CommitLogStats.appendWithStats(spark, t,
        df((i.toLong, s"n$i", i * 1.0)), statsCols = Seq("id")))
      val plan = CommitLogMaintenance.maintenancePlan(spark, t)
      val acts = plan.select("action").collect().map(_.getString(0))
      assert(acts.contains("compact"))
      assert(plan.filter(col("action") === "compact")
        .head().getString(2).contains("system.compact"))
    } finally rm(t)
  }

  test("a deletion vector past the materialize fraction recommends " +
      "compact; below it, nothing") {
    val t = tmpTable()
    try {
      CommitLogStats.appendWithStats(spark, t,
        df((1 to 4).map(i => (i.toLong, s"n$i", i * 1.0)): _*),
        statsCols = Seq("id"))
      CommitLog.deleteVectored(spark, t, col("id") === 1L): Unit
      // 1 of 4 rows = 25% >= the 10% default
      assert(actions(t) === Seq("compact"))
      // a tiny vector on a big table stays quiet
      assert(CommitLogMaintenance.maintenancePlan(spark, t,
        dvMaterializeFraction = 0.5).count() === 0L)
    } finally rm(t)
  }

  test("missing stats sidecars recommend an OPTIMIZE rewrite") {
    val t = tmpTable()
    try {
      (1 to 3).foreach(i =>
        CommitLog.append(spark, t, df((i.toLong, s"n$i", i * 1.0))))
      assert(actions(t) === Seq("optimize_cluster"))
    } finally rm(t)
  }

  test("legacy-keyed sidecars on a column-mapped table recommend " +
      "the re-keying rewrite") {
    val t = tmpTable()
    try {
      CommitLogStats.appendWithStats(spark, t,
        df((1L, "a", 1.0), (2L, "b", 2.0)), statsCols = Seq("v"))
      // age the sidecar back to the pre-hardening era (current
      // writers always mark physical keys — only old tables have
      // legacy sidecars)
      val seg = CommitLog.snapshot(spark, t).get.segments.head
      val sc = new java.io.File(s"$seg/_stats.json")
      val txt = new String(
        java.nio.file.Files.readAllBytes(sc.toPath), "UTF-8")
      java.nio.file.Files.write(sc.toPath,
        txt.replace("\"keys\":\"physical\",", "").getBytes("UTF-8"))
      val crc = new java.io.File(s"$seg/._stats.json.crc")
      if (crc.exists()) crc.delete(): Unit
      assert(CommitLogMaintenance.maintenancePlan(spark, t)
        .count() === 0L, "legacy keys alone are fine on an " +
        "identity-mapped table")
      CommitLog.renameColumn(spark, t, "v", "score"): Unit
      assert(actions(t) === Seq("optimize_cluster"))
    } finally rm(t)
  }

  test("a DML-fragmented bucket layout recommends a re-bucket once " +
      "segments pass 2x the bucket count; a freshly bucketed table " +
      "recommends nothing") {
    import spark.implicits._
    val t = tmpTable()
    try {
      CommitLog.append(spark, t,
        (1L to 400L).map(i => (i, s"n$i", i * 1.0))
          .toDF("id", "name", "v"))
      CommitLogStats.compactBucketed(spark, t, Seq("id"), 2, Seq("id"))
      assert(actions(t).isEmpty, "fresh bucket layout must be healthy")
      // delete/update replace their touched segments 1:1 (the
      // rewrite consolidates each touched bucket back to one new
      // segment), so THEY never fragment — merge INSERTS do: each
      // insert batch bucket-splits into fresh segments on buckets
      // whose existing segments were untouched
      (0 until 3).foreach { i =>
        CommitLog.mergeInto(spark, t,
          (1000L + i * 10 to 1009L + i * 10)
            .map(k => (k, s"m$k", k * 1.0)).toDF("id", "name", "v"),
          Seq("id"))
      }
      val snap = CommitLog.snapshot(spark, t).get
      assert(snap.bucket.isDefined && snap.segments.size > 4,
        s"expected fragmentation, got ${snap.segments.size} segments")
      val plan = CommitLogMaintenance.maintenancePlan(spark, t)
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
      assert(plan.contains("optimize_bucket"), s"plan: $plan")
      assert(plan("optimize_bucket").contains("keys => 'id'") &&
        plan("optimize_bucket").contains("buckets => 2"))
    } finally rm(t)
  }

  test("a cadence gap (checkpoint lag >= one interval) recommends " +
      "CALL checkpoint; debris recommends vacuum") {
    val t = tmpTable()
    try {
      (1 to 12).foreach(i => CommitLogStats.appendWithStats(spark, t,
        df((1 to 30).map(j => (i * 100L + j, s"n$j", j * 1.0)): _*),
        statsCols = Seq("id")))
      // suppress the small-file signal (12 segments of 30 rows) to
      // isolate the two signals under test
      def plan() = CommitLogMaintenance.maintenancePlan(spark, t,
        smallSegmentRows = 1L)
      assert(plan().count() === 0L)
      // crash shape: the v10 cadence checkpoint never landed
      assert(new java.io.File(
        f"$t/_commits/${10L}%020d.checkpoint").delete())
      assert(plan().select("action").collect()
        .map(_.getString(0)).toSeq === Seq("checkpoint"))
      // crashed-writer debris
      val orphan = new java.io.File(s"$t/data/deadbeef-orphan")
      assert(orphan.mkdirs())
      java.nio.file.Files.write(
        new java.io.File(orphan, "part-0.parquet").toPath,
        Array[Byte](1))
      assert(plan().select("action").collect()
        .map(_.getString(0)).toSeq.sorted ===
        Seq("checkpoint", "vacuum"))
    } finally rm(t)
  }
}
