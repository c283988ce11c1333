package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CommitLog

/** Round-15 DML surfaces: MERGE `WHEN NOT MATCHED BY SOURCE`
  * (programmatic + SQL) and DELETE/UPDATE predicates past the
  * V1-filter bridge (uncorrelated subqueries, arithmetic). */
class DmlRound15Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_dml15_")
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

  private def state(tbl: String): Set[(Long, String, Double)] =
    CommitLog.read(spark, tbl).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  // ---- programmatic WHEN NOT MATCHED BY SOURCE ----------------------

  test("NMBS delete: unmatched target rows satisfying the condition " +
      "delete; matched and non-satisfying unmatched rows survive") {
    val tbl = tmpTable()
    try {
      CommitLog.append(spark, tbl,
        df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
      val (_, nUpd, nDel, nIns) = CommitLog.mergeInto(spark, tbl,
        df((1L, "a2", 10.0)), Seq("id"),
        whenMatchedUpdate = Map("v" -> CommitLog.src("v")),
        whenNotMatchedInsert = false,
        whenNotMatchedBySourceDelete = Some(col("name") === "b"))
      assert((nUpd, nDel, nIns) === (1L, 1L, 0L))
      assert(state(tbl) === Set((1L, "a", 10.0), (3L, "c", 3.0)))
    } finally rm(tbl)
  }

  test("NMBS update: unconditional SET touches exactly the unmatched " +
      "target rows; matched rows follow the matched clause") {
    val tbl = tmpTable()
    try {
      CommitLog.append(spark, tbl,
        df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
      val (_, nUpd, nDel, nIns) = CommitLog.mergeInto(spark, tbl,
        df((2L, "src", 0.0)), Seq("id"),
        whenMatchedDelete = Some(lit(true)),
        whenNotMatchedInsert = false,
        whenNotMatchedBySourceUpdate = Map("v" -> (col("v") + 100.0)))
      assert((nUpd, nDel, nIns) === (2L, 1L, 0L))
      assert(state(tbl) === Set((1L, "a", 101.0), (3L, "c", 103.0)))
    } finally rm(tbl)
  }

  test("NMBS clause order: a row satisfying both BY-SOURCE conditions " +
      "deletes (executor tests DELETE first), update takes the rest") {
    val tbl = tmpTable()
    try {
      CommitLog.append(spark, tbl,
        df((1L, "x", 1.0), (2L, "x", 2.0), (3L, "y", 3.0)))
      CommitLog.mergeInto(spark, tbl,
        df((99L, "s", 0.0)), Seq("id"),
        whenNotMatchedInsert = false,
        whenNotMatchedBySourceUpdate = Map("v" -> lit(-1.0)),
        whenNotMatchedBySourceUpdateCondition = Some(col("name") === "x"),
        whenNotMatchedBySourceDelete = Some(col("id") === 1L))
      // id=1 satisfies both → deleted; id=2 updates; id=3 unmatched but
      // fails both conditions → survives byte-identical
      assert(state(tbl) === Set((2L, "x", -1.0), (3L, "y", 3.0)))
    } finally rm(tbl)
  }

  test("NMBS bounds the rewrite: a segment whose unmatched rows all " +
      "fail the BY-SOURCE condition is not rewritten") {
    val tbl = tmpTable()
    try {
      CommitLog.append(spark, tbl, df((1L, "a", 1.0), (2L, "b", 2.0)))
      CommitLog.append(spark, tbl, df((3L, "c", 3.0), (4L, "d", 4.0)))
      val pre = CommitLog.snapshot(spark, tbl).get.segments.toSet
      assert(pre.size === 2)
      // source matches nothing; condition hits only segment 1's rows
      CommitLog.mergeInto(spark, tbl,
        df((99L, "s", 0.0)), Seq("id"),
        whenNotMatchedInsert = false,
        whenNotMatchedBySourceDelete = Some(col("id") <= 2L))
      val post = CommitLog.snapshot(spark, tbl).get.segments.toSet
      assert((pre & post).size === 1,
        "the untouched segment must keep its identity")
      assert(state(tbl) === Set((3L, "c", 3.0), (4L, "d", 4.0)))
    } finally rm(tbl)
  }

  test("NMBS matching nothing commits NO version") {
    val tbl = tmpTable()
    try {
      CommitLog.append(spark, tbl, df((1L, "a", 1.0)))
      val v0 = CommitLog.versions(spark, tbl).max
      val (v, nUpd, nDel, nIns) = CommitLog.mergeInto(spark, tbl,
        df((1L, "a", 9.0)), Seq("id"),
        whenNotMatchedInsert = false,
        whenNotMatchedBySourceDelete = Some(lit(true)))
      // the lone target row IS matched — no clause fires anywhere
      assert((v, nUpd, nDel, nIns) === (v0, 0L, 0L, 0L))
      assert(CommitLog.versions(spark, tbl).max === v0)
    } finally rm(tbl)
  }

  test("NMBS CDC: BY-SOURCE deletes and updates record under the " +
      "uniform delete/update_pre+postimage vocabulary") {
    val tbl = tmpTable()
    try {
      CommitLog.append(spark, tbl,
        df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
      val v0 = CommitLog.versions(spark, tbl).max
      CommitLog.mergeInto(spark, tbl,
        df((1L, "s", 50.0)), Seq("id"),
        whenMatchedUpdate = Map("v" -> CommitLog.src("v")),
        whenNotMatchedInsert = false,
        whenNotMatchedBySourceUpdate = Map("v" -> lit(0.0)),
        whenNotMatchedBySourceUpdateCondition = Some(col("id") === 2L),
        whenNotMatchedBySourceDelete = Some(col("id") === 3L))
      val feed = CommitLog.changeFeed(spark, tbl, v0)
        .select(col("id"), col("_change_type")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(feed === Set(
        (1L, "update_preimage"), (1L, "update_postimage"),
        (2L, "update_preimage"), (2L, "update_postimage"),
        (3L, "delete")))
      assert(state(tbl) === Set((1L, "a", 50.0), (2L, "b", 0.0)))
    } finally rm(tbl)
  }

  // ---- N-clause MERGE (mergeIntoClauses) ------------------------------

  test("multi-clause MERGE: three matched clauses fire first-match-" +
      "wins in list order; each update clause writes its own " +
      "post-image; CDC types per clause") {
    import graft.sources.CommitLog.{MergeDelete, MergeUpdate}
    val tbl = tmpTable()
    try {
      CommitLog.append(spark, tbl,
        df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
          (4L, "d", 4.0)))
      val v0 = CommitLog.versions(spark, tbl).max
      val src = df((1L, "s", 0.0), (2L, "s", 0.0), (3L, "s", 0.0),
        (4L, "s", 0.0))
      val (_, nUpd, nDel, nIns) = CommitLog.mergeIntoClauses(spark,
        tbl, src, Seq("id"),
        matched = Seq(
          MergeUpdate(Map("v" -> lit(100.0)), Some(col("name") === "a")),
          MergeDelete(Some(col("id") === 2L)),
          // row 1 satisfies THIS too — but clause 1 already won
          MergeUpdate(Map("v" -> lit(-1.0)), Some(col("id") <= 3L))),
        notMatchedInsert = false)
      // 1 → clause 1 (v=100); 2 → clause 2 (delete); 3 → clause 3
      // (v=-1); 4 → no clause fires, survives byte-identical
      assert(state(tbl) === Set((1L, "a", 100.0), (3L, "c", -1.0),
        (4L, "d", 4.0)))
      assert((nUpd, nDel, nIns) === (2L, 1L, 0L))
      val feed = CommitLog.changeFeed(spark, tbl, v0)
        .filter(col("_change_type") === "update_postimage")
        .select(col("id"), col("v")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(feed === Set((1L, 100.0), (3L, -1.0)),
        "post-images carry each clause's own SET")
    } finally rm(tbl)
  }

  test("multi-clause MERGE: an unconditional clause shadows " +
      "everything listed after it") {
    import graft.sources.CommitLog.{MergeDelete, MergeUpdate}
    val tbl = tmpTable()
    try {
      CommitLog.append(spark, tbl, df((1L, "a", 1.0), (2L, "b", 2.0)))
      CommitLog.mergeIntoClauses(spark, tbl,
        df((1L, "s", 0.0), (2L, "s", 0.0)), Seq("id"),
        matched = Seq(
          MergeUpdate(Map("v" -> lit(9.0))), // unconditional
          MergeDelete(None)), // unreachable
        notMatchedInsert = false)
      assert(state(tbl) === Set((1L, "a", 9.0), (2L, "b", 9.0)))
    } finally rm(tbl)
  }

  test("SQL MERGE with multiple conditional UPDATE clauses per side " +
      "(previously refused) lands with first-match-wins semantics") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dml15_multi_").toString
    try {
      spark.conf.set("spark.sql.catalog.g15f",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.g15f.root", root)
      val tbl = s"$root/ns/t"
      CommitLog.append(spark, tbl,
        df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
          (4L, "d", 4.0), (5L, "e", 5.0)))
      df((1L, "x", 10.0), (2L, "x", 20.0), (3L, "x", 30.0))
        .createOrReplaceTempView("g15f_src")
      spark.sql(
        """MERGE INTO g15f.ns.t t USING g15f_src s ON t.id = s.id
          |WHEN MATCHED AND t.name = 'a' THEN UPDATE SET v = s.v
          |WHEN MATCHED AND t.id = 2 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = t.v * 100.0
          |WHEN NOT MATCHED BY SOURCE AND t.id = 4
          |  THEN UPDATE SET v = -4.0
          |WHEN NOT MATCHED BY SOURCE AND t.id = 5 THEN DELETE
          |""".stripMargin)
      assert(state(tbl) === Set((1L, "a", 10.0), (3L, "c", 300.0),
        (4L, "d", -4.0)))
    } finally {
      spark.catalog.dropTempView("g15f_src"): Unit
      spark.conf.unset("spark.sql.catalog.g15f")
      spark.conf.unset("spark.sql.catalog.g15f.root")
      rm(s"$root/ns/t")
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION: a source column absent from the " +
      "target evolves the schema (metadata-only commit), matched rows " +
      "take it, untouched rows read NULL, inserts carry it") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dml15_evo_").toString
    try {
      spark.conf.set("spark.sql.catalog.g15g",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.g15g.root", root)
      val tbl = s"$root/ns/t"
      CommitLog.append(spark, tbl, df((1L, "a", 1.0), (2L, "b", 2.0)))
      import spark.implicits._
      Seq((1L, "a2", 10.0, "X"), (3L, "c", 3.0, "Y"))
        .toDF("id", "name", "v", "extra")
        .createOrReplaceTempView("g15g_src")
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO g15g.ns.t t
          |USING g15g_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = spark.sql("SELECT id, name, v, extra FROM g15g.ns.t")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getDouble(2), Option(r.getString(3)).getOrElse("<null>")))
        .toSet
      assert(got === Set((1L, "a2", 10.0, "X"), (2L, "b", 2.0, "<null>"),
        (3L, "c", 3.0, "Y")))
      // the evolution landed as its own metadata commit ahead of the
      // merge commit
      val hist = CommitLog.history(spark, tbl)
        .select(col("op")).collect().map(_.getString(0)).toSeq
      assert(hist.containsSlice(Seq("evolve", "merge_into")) ||
        hist.containsSlice(Seq("append", "evolve", "merge_into")),
        s"expected evolve before merge_into, got $hist")
    } finally {
      spark.catalog.dropTempView("g15g_src"): Unit
      spark.conf.unset("spark.sql.catalog.g15g")
      spark.conf.unset("spark.sql.catalog.g15g.root")
      rm(s"$root/ns/t")
    }
  }

  test("streaming exactly-once upsert sink: per-batch txn-stamped " +
      "merges; a crash-replayed batch id is recognized and skipped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val tbl = tmpTable()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_dml15_upsert_ckpt_").toString
    try {
      val in = MemoryStream[(Long, String, Double)](77, spark, None)
      val q = graft.streaming.Streaming.commitLogUpsertSink(
          in.toDF().toDF("id", "name", "v"), tbl, Seq("id"), "ups")
        .option("checkpointLocation", ckpt).start()
      try {
        in.addData((1L, "a", 1.0), (2L, "b", 2.0))
        q.processAllAvailable()
        in.addData((1L, "a2", 10.0), (3L, "c", 3.0))
        q.processAllAvailable()
      } finally q.stop()
      assert(state(tbl) === Set((1L, "a2", 10.0), (2L, "b", 2.0),
        (3L, "c", 3.0)))
      val vPost = CommitLog.versions(spark, tbl).max
      // crash replay of the LAST batch (id 1): the watermark
      // recognizes it — zero counts, no new version, state unchanged
      val (v, nUpd, nDel, nIns) = CommitLog.mergeIntoClauses(spark,
        tbl, df((1L, "zz", 99.0), (3L, "zz", 99.0)), Seq("id"),
        matched = Seq(graft.sources.CommitLog.MergeUpdate(Map(
          "name" -> CommitLog.src("name"), "v" -> CommitLog.src("v")))),
        txn = Some(("ups", 1L)))
      assert((v, nUpd, nDel, nIns) === (vPost, 0L, 0L, 0L))
      assert(CommitLog.versions(spark, tbl).max === vPost)
      assert(state(tbl) === Set((1L, "a2", 10.0), (2L, "b", 2.0),
        (3L, "c", 3.0)))
      // a HIGHER batch id applies normally
      CommitLog.mergeIntoClauses(spark, tbl,
        df((2L, "b2", 20.0)), Seq("id"),
        matched = Seq(graft.sources.CommitLog.MergeUpdate(Map(
          "name" -> CommitLog.src("name"), "v" -> CommitLog.src("v")))),
        txn = Some(("ups", 2L)))
      assert(state(tbl) === Set((1L, "a2", 10.0), (2L, "b2", 20.0),
        (3L, "c", 3.0)))
    } finally { rm(tbl); rm(ckpt + "/x") }
  }

  // ---- SQL WHEN NOT MATCHED BY SOURCE --------------------------------

  test("SQL MERGE with NOT MATCHED BY SOURCE: five clauses land in " +
      "one commit; SQL clause order (UPDATE before DELETE) respected") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dml15_sql_").toString
    try {
      spark.conf.set("spark.sql.catalog.g15a",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.g15a.root", root)
      val tbl = s"$root/ns/t"
      CommitLog.append(spark, tbl,
        df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
          (4L, "d", 4.0)))
      df((1L, "src", 10.0)).createOrReplaceTempView("g15a_src")
      // BY SOURCE: UPDATE listed FIRST with cond id<=3 — row 2 and 3
      // must UPDATE (first match wins) even though the later DELETE's
      // condition (name <> 'zz', i.e. everything) also covers them;
      // row 4 falls through to DELETE
      spark.sql(
        """MERGE INTO g15a.ns.t t USING g15a_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED BY SOURCE AND t.id <= 3
          |  THEN UPDATE SET v = t.v * 10.0
          |WHEN NOT MATCHED BY SOURCE THEN DELETE
          |""".stripMargin)
      val got = spark.sql("SELECT id, name, v FROM g15a.ns.t")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getDouble(2))).toSet
      assert(got === Set((1L, "a", 10.0), (2L, "b", 20.0),
        (3L, "c", 30.0)))
    } finally {
      spark.catalog.dropTempView("g15a_src"): Unit
      spark.conf.unset("spark.sql.catalog.g15a")
      spark.conf.unset("spark.sql.catalog.g15a.root")
      rm(s"$root/ns/t")
    }
  }

  // ---- subquery / arithmetic DML predicates --------------------------

  test("SQL DELETE with uncorrelated IN-subquery routes through the " +
      "copy-on-write path: CDC recorded, untouched segments kept") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dml15_subq_").toString
    try {
      spark.conf.set("spark.sql.catalog.g15b",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.g15b.root", root)
      val tbl = s"$root/ns/t"
      CommitLog.append(spark, tbl, df((1L, "a", 1.0), (2L, "b", 2.0)))
      CommitLog.append(spark, tbl, df((3L, "c", 3.0), (4L, "d", 4.0)))
      val pre = CommitLog.snapshot(spark, tbl).get.segments.toSet
      val v0 = CommitLog.versions(spark, tbl).max
      df((1L, "x", 0.0), (2L, "x", 0.0))
        .createOrReplaceTempView("g15b_keys")
      spark.sql(
        """DELETE FROM g15b.ns.t
          |WHERE id IN (SELECT id FROM g15b_keys)""".stripMargin)
      assert(state(tbl) === Set((3L, "c", 3.0), (4L, "d", 4.0)))
      val post = CommitLog.snapshot(spark, tbl).get.segments.toSet
      assert((pre & post).size === 1,
        "segment 2 holds no matching keys — must keep its identity")
      val feed = CommitLog.changeFeed(spark, tbl, v0)
        .select(col("id"), col("_change_type")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(feed === Set((1L, "delete"), (2L, "delete")))
    } finally {
      spark.catalog.dropTempView("g15b_keys"): Unit
      spark.conf.unset("spark.sql.catalog.g15b")
      spark.conf.unset("spark.sql.catalog.g15b.root")
      rm(s"$root/ns/t")
    }
  }

  test("SQL DELETE with arithmetic predicate (no subquery, not " +
      "V1-filter-bridgeable) deletes correctly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dml15_arith_").toString
    try {
      spark.conf.set("spark.sql.catalog.g15c",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.g15c.root", root)
      val tbl = s"$root/ns/t"
      CommitLog.append(spark, tbl,
        df((0L, "z", 0.5), (1L, "a", 1.0), (2L, "b", 2.0),
          (3L, "c", 3.0)))
      spark.sql("DELETE FROM g15c.ns.t WHERE v * 2.0 > 3.0")
      assert(state(tbl) === Set((0L, "z", 0.5), (1L, "a", 1.0)))
      // and the plain translatable shape still works (filter-bridge
      // path unchanged)
      spark.sql("DELETE FROM g15c.ns.t WHERE id = 1")
      assert(state(tbl) === Set((0L, "z", 0.5)))
    } finally {
      spark.conf.unset("spark.sql.catalog.g15c")
      spark.conf.unset("spark.sql.catalog.g15c.root")
      rm(s"$root/ns/t")
    }
  }

  test("SQL UPDATE with uncorrelated IN-subquery in WHERE") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dml15_updsubq_").toString
    try {
      spark.conf.set("spark.sql.catalog.g15d",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.g15d.root", root)
      val tbl = s"$root/ns/t"
      CommitLog.append(spark, tbl,
        df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
      df((2L, "x", 0.0), (3L, "x", 0.0))
        .createOrReplaceTempView("g15d_keys")
      spark.sql(
        """UPDATE g15d.ns.t SET name = 'hit'
          |WHERE id IN (SELECT id FROM g15d_keys WHERE id <> 3)
          |""".stripMargin)
      assert(state(tbl) === Set((1L, "a", 1.0), (2L, "hit", 2.0),
        (3L, "c", 3.0)))
    } finally {
      spark.catalog.dropTempView("g15d_keys"): Unit
      spark.conf.unset("spark.sql.catalog.g15d")
      spark.conf.unset("spark.sql.catalog.g15d.root")
      rm(s"$root/ns/t")
    }
  }

  test("NON-equi correlated subquery in a DML condition refuses " +
      "LOUDLY (equi-key correlations are supported since round 16)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dml15_corr_").toString
    try {
      spark.conf.set("spark.sql.catalog.g15e",
        "graft.sources.CommitLogCatalog")
      spark.conf.set("spark.sql.catalog.g15e.root", root)
      val tbl = s"$root/ns/t"
      CommitLog.append(spark, tbl, df((1L, "a", 1.0)))
      df((1L, "a", 1.0)).createOrReplaceTempView("g15e_other")
      val e = intercept[Exception] {
        spark.sql(
          """DELETE FROM g15e.ns.t
            |WHERE EXISTS (SELECT 1 FROM g15e_other o
            |  WHERE o.id < g15e.ns.t.id AND o.v > 0.0)""".stripMargin)
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("correlated subquery shape")),
        s"expected the loud refusal, got: $e")
      assert(state(tbl) === Set((1L, "a", 1.0)), "nothing deleted")
    } finally {
      spark.catalog.dropTempView("g15e_other"): Unit
      spark.conf.unset("spark.sql.catalog.g15e")
      spark.conf.unset("spark.sql.catalog.g15e.root")
      rm(s"$root/ns/t")
    }
  }
}
