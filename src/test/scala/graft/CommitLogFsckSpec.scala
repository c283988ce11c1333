package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CommitLog, CommitLogFsck}

/** The on-disk conformance validator (FORMAT.md §8): a clean table
  * reports nothing, spec-tolerated debris classifies as INFO, and
  * every corruption class an incident could leave behind surfaces as
  * a targeted ERROR — fsck sweeps the whole tree and never throws,
  * unlike the readers' first-hit loud guards. */
class CommitLogFsckSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_fsck_")
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

  private def codes(f: DataFrame): Map[String, String] =
    f.collect().map(r => r.getString(1) -> r.getString(0)).toMap

  private def manifestFile(t: String, v: Long) =
    new java.io.File(f"$t/_commits/$v%020d.manifest")

  /** Rewrite a control file in place (incident simulation — the
    * engine itself never mutates published files). */
  private def rewrite(f: java.io.File, fn: String => String): Unit = {
    val txt = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    java.nio.file.Files.write(f.toPath, fn(txt).getBytes("UTF-8")): Unit
  }

  test("a clean healthy table reports ZERO findings — through the " +
      "API, the summary, and CALL system.fsck") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_fsck_clean_").toString
    try {
      spark.conf.set("spark.sql.catalog.gfk",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.gfk.root", root)
      spark.sql("CREATE TABLE gfk.ns.t (id BIGINT, name STRING, " +
        "v DOUBLE)")
      val path = s"$root/ns/t"
      // cross the checkpoint cadence, add a DV and a constraint —
      // every control-file species present, all healthy
      (1 to 10).foreach(i => spark.sql(
        s"INSERT INTO gfk.ns.t VALUES ($i, 'n$i', $i.5)"))
      CommitLog.deleteVectored(spark, path, col("id") === 3L): Unit
      CommitLog.setConstraint(spark, path, "v_pos", "v > 0"): Unit
      assert(CommitLogFsck.fsck(spark, path).count() === 0L)
      val sm = CommitLogFsck.fsckSummary(spark, path).head()
      assert((sm.getLong(0), sm.getLong(1), sm.getLong(2),
        sm.getBoolean(3)) === (0L, 0L, 0L, true))
      assert(spark.sql(
        "CALL gfk.system.fsck(table => 'ns.t')").count() === 0L)
      spark.sql("DROP TABLE gfk.ns.t")
    } finally {
      spark.conf.unset("spark.sql.catalog.gfk")
      spark.conf.unset("spark.sql.catalog.gfk.root")
      rm(root + "/x")
    }
  }

  test("spec-tolerated debris classifies as INFO, never ERROR: " +
      "orphan segment, staging dir, cadence gap, orphan checkpoint " +
      "part, stale legacy constraints file") {
    val t = tmpTable()
    try {
      (1 to 12).foreach(i =>
        CommitLog.append(spark, t, df((i.toLong, s"n$i", i * 1.0))))
      CommitLog.setConstraint(spark, t, "v_pos", "v > 0"): Unit
      // orphan segment (crashed writer's published-but-unreferenced
      // dir) + staging debris + a dead legacy side file
      val orphan = new java.io.File(s"$t/data/deadbeef-orphan")
      assert(orphan.mkdirs())
      java.nio.file.Files.write(
        new java.io.File(orphan, "part-0.parquet").toPath,
        Array[Byte](1, 2, 3))
      assert(new java.io.File(s"$t/data/.staging-zzz").mkdirs())
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$t/_constraints.json"),
        """{"old":"v > 0"}""".getBytes("UTF-8"))
      // cadence gap: the crash-between-manifest-and-checkpoint shape
      assert(new java.io.File(
        f"$t/_commits/${10L}%020d.checkpoint").delete())
      // a part file whose marker never landed (crashed sharded write)
      java.nio.file.Files.write(java.nio.file.Paths.get(
        f"$t/_commits/${12L}%020d.checkpoint.part-1-of-2"),
        """{"version":12,"part":1,"segments":[]}""".getBytes("UTF-8"))
      val f = CommitLogFsck.fsck(spark, t)
      val byCode = codes(f)
      assert(byCode("orphan_segment") === "INFO")
      assert(byCode("staging_debris") === "INFO")
      assert(byCode("cadence_gap") === "INFO")
      assert(byCode("orphan_checkpoint_part") === "INFO")
      assert(byCode("stale_constraints_file") === "INFO")
      assert(f.filter(col("level") =!= "INFO").count() === 0L)
      // and the table still reads perfectly — debris is harmless
      assert(CommitLog.read(spark, t).count() === 12L)
    } finally rm(t)
  }

  test("storage corruption surfaces as targeted ERRORs: missing " +
      "segment, missing deletion vector, checkpoint/replay " +
      "disagreement, chain hole") {
    val t = tmpTable()
    try {
      (1 to 12).foreach(i =>
        CommitLog.append(spark, t, df((i.toLong, s"n$i", i * 1.0))))
      CommitLog.deleteVectored(spark, t, col("id") === 5L): Unit
      val snap = CommitLog.snapshot(spark, t).get
      // 1. a checkpoint that disagrees with manifest replay (a
      //    non-conforming second writer rendered the wrong state) —
      //    while the manifest chain is INTACT, so fsck has an
      //    independent replay to compare against
      rewrite(new java.io.File(f"$t/_commits/${10L}%020d.checkpoint"),
        _.replaceFirst("\"segments\":\\[[^\\]]*\\]",
          "\"segments\":[]"))
      assert(codes(CommitLogFsck.fsck(spark, t, deep = false))
        .get("checkpoint_mismatch") === Some("ERROR"))
      // 2. a referenced segment vanishes (deep, distributed check)
      val seg0 = new java.io.File(snap.segments.head)
      def nuke(d: java.io.File): Unit = {
        Option(d.listFiles).foreach(_.foreach(nuke)); d.delete(): Unit
      }
      nuke(seg0)
      // 3. the deletion vector vanishes
      nuke(new java.io.File(snap.dv.get))
      // 4. a mid-chain manifest vanishes (partial sweep / bit rot) —
      //    versions above it re-anchor through the (corrupt-but-
      //    parseable) checkpoint, so the hole itself is the finding
      assert(manifestFile(t, 6L).delete())
      val byCode = codes(CommitLogFsck.fsck(spark, t))
      assert(byCode("segment_missing") === "ERROR")
      assert(byCode("dv_missing") === "ERROR")
      assert(byCode("chain_hole") === "ERROR")
      // v7..v9 sit between the hole and the v10 pin: unresolvable
      assert(byCode("unresolvable") === "ERROR")
      // shallow mode skips the distributed pass but still sees the
      // metadata-level damage
      val shallow = codes(CommitLogFsck.fsck(spark, t, deep = false))
      assert(!shallow.contains("segment_missing"))
      assert(shallow.contains("chain_hole"))
    } finally rm(t)
  }

  test("metadata rot surfaces as targeted ERRORs: version/filename " +
      "mismatch, a dropped deletion-vector field (rows would " +
      "resurrect), an unparseable CHECK expression") {
    val t = tmpTable()
    try {
      // appendEvolve records the schema — the unresolvable-constraint
      // check compares against the RECORDED column set
      CommitLog.appendEvolve(spark, t,
        df((1L, "a", 1.0), (2L, "b", 2.0))): Unit
      CommitLog.deleteVectored(spark, t, col("id") === 1L): Unit
      CommitLog.append(spark, t, df((3L, "c", 3.0)))
      CommitLog.setConstraint(spark, t, "v_pos", "v > 0"): Unit
      // v3 carried v2's vector forward (publisher guard) — simulate
      // a non-conforming writer that dropped the field
      rewrite(manifestFile(t, 3L),
        _.replaceFirst("\"dv\":\"[^\"]*\",", ""))
      // v2 lies about its own version
      rewrite(manifestFile(t, 2L),
        _.replaceFirst("\"version\":2", "\"version\":9"))
      // the latest record's constraints decode to a non-SQL rule AND
      // a rule over a column the schema never had (only a
      // non-conforming writer can produce either)
      val badCons = java.util.Base64.getEncoder.encodeToString(
        """{"bad":"((( not sql","ghost":"nope_col > 0"}"""
          .getBytes("UTF-8"))
      rewrite(manifestFile(t, 4L),
        _.replaceFirst("\"constraints\":\"[^\"]*\"",
          s""""constraints":"$badCons""""))
      val byCode = codes(CommitLogFsck.fsck(spark, t))
      assert(byCode("dv_dropped") === "ERROR")
      assert(byCode("version_mismatch") === "ERROR")
      assert(byCode("constraint_unparseable") === "ERROR")
      assert(byCode("constraint_unresolvable") === "ERROR")
    } finally rm(t)
  }

  test("a future reader protocol is a FINDING, not a throw: fsck " +
      "reports protocol_unsupported where every read surface refuses") {
    val t = tmpTable()
    try {
      CommitLog.append(spark, t, df((1L, "a", 1.0)))
      val forged = manifestFile(t, 2L)
      java.nio.file.Files.write(forged.toPath,
        ("""{"version":2,"baseVersion":1,"protocol":99,""" +
          """"op":"append","segments":[]}""").getBytes("UTF-8")): Unit
      // the read surface refuses loudly...
      intercept[IllegalStateException] {
        CommitLog.read(spark, t).collect()
      }
      // ...fsck REPORTS instead (its contract: findings, not throws)
      val byCode = codes(CommitLogFsck.fsck(spark, t))
      assert(byCode.get("protocol_unsupported").contains("ERROR"),
        s"findings: $byCode")
    } finally rm(t)
  }

  test("bucket layout record conformance: a clean compactBucketed " +
      "table reports nothing; an undecodable or non-covering spec " +
      "is a WARN (readers suppress the SPJ claim)") {
    val t = tmpTable()
    try {
      CommitLog.append(spark, t, df((1L, "a", 1.0), (2L, "b", 2.0),
        (3L, "c", 3.0)))
      graft.sources.CommitLogStats.compactBucketed(spark, t,
        Seq("id"), 2, Seq("id"))
      assert(CommitLog.snapshot(spark, t).get.bucket.isDefined)
      assert(codes(CommitLogFsck.fsck(spark, t)).isEmpty,
        "a conforming bucket record must report nothing")
      // incident: a non-conforming writer mangles the spec
      val v = CommitLog.currentVersion(spark, t).get
      val mf = manifestFile(t, v)
      val txt = new String(
        java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
      val bogus = java.util.Base64.getEncoder
        .encodeToString("{}".getBytes("UTF-8"))
      java.nio.file.Files.write(mf.toPath,
        txt.replaceAll("\"bucket\":\"[^\"]*\"",
          s""""bucket":"$bogus"""").getBytes("UTF-8")): Unit
      val byCode = codes(CommitLogFsck.fsck(spark, t))
      assert(byCode.get("bucket_spec_undecodable").contains("WARN"),
        s"findings: $byCode")
      // ...and the scan suppresses the claim: reads still right
      assert(CommitLog.read(spark, t).count() === 3L)
    } finally rm(t)
  }

  test("FSCK REPAIR: one transactional commit drops references to " +
      "missing segments — the repaired table serves exactly the " +
      "surviving rows; dry_run commits nothing; a clean table is a " +
      "no-op; live data is never touched") {
    val t = tmpTable()
    try {
      CommitLog.append(spark, t, df((1L, "a", 1.0)))
      CommitLog.append(spark, t, df((2L, "b", 2.0)))
      CommitLog.append(spark, t, df((3L, "c", 3.0)))
      // clean table: no actions, NO commit
      assert(CommitLogFsck.repair(spark, t).count() === 0L)
      assert(CommitLog.currentVersion(spark, t).get === 3L)
      // incident: the v2 segment's bytes are lost
      val cur = CommitLog.snapshot(spark, t).get
      val lost = cur.segments(1)
      def rmTree(p: String): Unit = {
        def go(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(go)); f.delete(): Unit
        }
        go(new java.io.File(p))
      }
      rmTree(lost)
      // reads now fail...
      intercept[Exception] { CommitLog.read(spark, t).collect() }
      // ...dry_run reports the drop and commits NOTHING
      val dry = CommitLogFsck.repair(spark, t, dryRun = true).collect()
      assert(dry.length === 1 &&
        dry(0).getString(0) === "drop_segment_ref" &&
        dry(0).getString(1) === lost)
      assert(CommitLog.currentVersion(spark, t).get === 3L)
      // the repair: ONE fsck_repair commit, surviving rows only
      val acts = CommitLogFsck.repair(spark, t).collect()
      assert(acts.length === 1 &&
        acts(0).getString(0) === "drop_segment_ref")
      val post = CommitLog.snapshot(spark, t).get
      assert(post.version === 4L && post.op === "fsck_repair")
      assert(CommitLog.read(spark, t).select("id").collect()
        .map(_.getLong(0)).toSeq.sorted === Seq(1L, 3L))
      // live data untouched: the surviving segments are the SAME dirs
      assert(post.segments.toSet ===
        cur.segments.toSet - lost)
      // idempotent: a second repair finds nothing
      assert(CommitLogFsck.repair(spark, t).count() === 0L)
      // deep fsck on the repaired table: no current-version
      // segment_missing remains (the retained HISTORY still names the
      // lost segment — time travel to it fails until vacuum)
      val remaining = CommitLogFsck.fsck(spark, t).collect()
        .filter(r => r.getString(1) == "segment_missing")
      assert(remaining.forall(_.getString(3).contains("time travel")),
        s"current-version reference survived: ${remaining.toSeq}")
    } finally rm(t)
  }

  test("FSCK REPAIR: a missing deletion vector drops from the record " +
      "(subtracted rows return — documented trade), and " +
      "non-reference-droppable corruption REFUSES the repair") {
    val t = tmpTable()
    try {
      CommitLog.append(spark, t, df((1L, "a", 1.0), (2L, "b", 2.0)))
      CommitLog.deleteVectored(spark, t, col("id") === 2L)
      assert(CommitLog.read(spark, t).count() === 1L)
      val dv = CommitLog.snapshot(spark, t).get.dv.get
      def rmTree(p: String): Unit = {
        def go(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(go)); f.delete(): Unit
        }
        go(new java.io.File(p))
      }
      rmTree(dv)
      intercept[Exception] { CommitLog.read(spark, t).collect() }
      val acts = CommitLogFsck.repair(spark, t).collect()
      assert(acts.length === 1 && acts(0).getString(0) === "drop_dv_ref")
      // the vector's subtraction is gone WITH the vector: both rows
      // serve again, and the action row says so
      assert(CommitLog.read(spark, t).select("id").collect()
        .map(_.getLong(0)).toSeq.sorted === Seq(1L, 2L))
      assert(acts(0).getString(2).contains("return"))
      assert(CommitLog.snapshot(spark, t).get.dv.isEmpty)

      // refusal: a future-protocol record is NOT reference-droppable
      val t2 = tmpTable()
      try {
        CommitLog.append(spark, t2, df((1L, "a", 1.0)))
        java.nio.file.Files.write(
          new java.io.File(f"$t2/_commits/${2L}%020d.manifest").toPath,
          ("""{"version":2,"baseVersion":1,"protocol":99,""" +
            """"op":"append","segments":[]}""").getBytes("UTF-8")): Unit
        val e = intercept[IllegalStateException] {
          CommitLogFsck.repair(spark, t2)
        }
        assert(e.getMessage.contains("not reference-droppable") &&
          e.getMessage.contains("protocol_unsupported"))
      } finally rm(t2)
    } finally rm(t)
  }

  test("CALL system.fsck_repair: the SQL surface routes through " +
      "repair with dry_run") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_fsckrep_").toString
    try {
      spark.conf.set("spark.sql.catalog.gfr",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.gfr.root", root)
      val path = s"$root/ns/t"
      CommitLog.append(spark, path, df((1L, "a", 1.0)))
      CommitLog.append(spark, path, df((2L, "b", 2.0)))
      val lost = CommitLog.snapshot(spark, path).get.segments.head
      def rmTree(p: String): Unit = {
        def go(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(go)); f.delete(): Unit
        }
        go(new java.io.File(p))
      }
      rmTree(lost)
      val dry = spark.sql(
        "CALL gfr.system.fsck_repair(table => 'ns.t', " +
          "dry_run => true)").collect()
      assert(dry.length === 1 && dry(0).getString(0) === "drop_segment_ref")
      assert(CommitLog.currentVersion(spark, path).get === 2L)
      val acted = spark.sql(
        "CALL gfr.system.fsck_repair(table => 'ns.t')").collect()
      assert(acted.length === 1)
      assert(CommitLog.currentVersion(spark, path).get === 3L)
      assert(CommitLog.read(spark, path).select("id").collect()
        .map(_.getLong(0)).toSeq === Seq(2L))
    } finally {
      spark.conf.unset("spark.sql.catalog.gfr")
      spark.conf.unset("spark.sql.catalog.gfr.root")
      rm(root + "/x")
    }
  }
}
