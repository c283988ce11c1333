package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CommitLog

/** Round-16 DML surfaces: CORRELATED subqueries in DELETE/UPDATE.
  *
  * Equi-key-correlated EXISTS / NOT EXISTS / IN predicates rewrite to
  * guarded uncorrelated INs (semi joins against the rewrite frame);
  * an equi-key-correlated SCALAR aggregate (in SET or WHERE) reroutes
  * the statement through the N-clause MERGE executor with the
  * optimizer's decorrelated key-grouped aggregate as source. The
  * tests pin SQL's exact three-valued/empty-group semantics: NULL
  * keys never equi-match, a row with no matching source rows sees
  * the aggregate's EMPTY-GROUP value (count → 0, max → NULL). */
class DmlRound16Spec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.g16", "graft.sources.CommitLogCatalog")
    s.conf.set("spark.sql.catalog.g16.root", root)
    import s.implicits._
    // source: key 1 twice (s='x','x2'), key 3 once (s='y')
    Seq((1L, "x"), (1L, "x2"), (3L, "y")).toDF("k", "s")
      .createOrReplaceTempView("g16_src")
    s
  }

  private lazy val root = java.nio.file.Files
    .createTempDirectory("graft_dml16_").toString

  private var n = 0
  /** Fresh catalog table g16.ns.<name> seeded with (id, name, v). */
  private def fresh(rows: Seq[(java.lang.Long, String, Double)])
      : (String, String) = {
    import spark.implicits._
    n += 1
    val name = s"t$n"
    val tbl = s"$root/ns/$name"
    CommitLog.append(spark, tbl, rows.toDF("id", "name", "v"))
    (s"g16.ns.$name", tbl)
  }

  private def state(tbl: String): Set[(Option[Long], String, Double)] =
    CommitLog.read(spark, tbl).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1), r.getDouble(2))).toSet

  test("correlated EXISTS delete: only equi-matched rows (with the " +
      "inner condition) delete; NULL target keys never match") {
    val (sql, tbl) = fresh(Seq(
      (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (null, "n", 9.0)))
    spark.sql(s"DELETE FROM $sql WHERE EXISTS " +
      s"(SELECT 1 FROM g16_src WHERE g16_src.k = $sql.id " +
      "AND g16_src.s = 'y')")
    assert(state(tbl) === Set((Some(1L), "a", 1.0),
      (Some(2L), "b", 2.0), (None, "n", 9.0)))
  }

  test("correlated NOT EXISTS delete: unmatched rows AND NULL-key " +
      "rows delete (NULL never equi-matches, so NOT EXISTS is TRUE)") {
    val (sql, tbl) = fresh(Seq(
      (1L, "a", 1.0), (2L, "b", 2.0), (null, "n", 9.0)))
    spark.sql(s"DELETE FROM $sql WHERE NOT EXISTS " +
      s"(SELECT 1 FROM g16_src WHERE g16_src.k = $sql.id)")
    assert(state(tbl) === Set((Some(1L), "a", 1.0)))
  }

  test("correlated IN in an UPDATE WHERE: membership tested against " +
      "exactly the matching key group") {
    val (sql, tbl) = fresh(Seq(
      (1L, "x", 0.0), (3L, "zz", 0.0), (3L, "y", 0.0)))
    // name IN (strings of the row's own key group): (1,'x') yes,
    // (3,'zz') no, (3,'y') yes
    spark.sql(s"UPDATE $sql SET v = 7.0 WHERE name IN " +
      s"(SELECT s FROM g16_src WHERE g16_src.k = $sql.id)")
    assert(state(tbl) === Set((Some(1L), "x", 7.0),
      (Some(3L), "zz", 0.0), (Some(3L), "y", 7.0)))
  }

  test("correlated scalar UPDATE (count): matched rows take the " +
      "per-key aggregate, unmatched take count's empty-group 0 — " +
      "the COUNT-bug semantics, exactly") {
    val (sql, tbl) = fresh(Seq(
      (1L, "a", -1.0), (2L, "b", -1.0), (3L, "c", -1.0)))
    spark.sql(s"UPDATE $sql SET v = " +
      s"(SELECT count(*) FROM g16_src WHERE g16_src.k = $sql.id)")
    assert(state(tbl) === Set((Some(1L), "a", 2.0),
      (Some(2L), "b", 0.0), (Some(3L), "c", 1.0)))
  }

  test("correlated scalar UPDATE (max) with WHERE: empty group gives " +
      "NULL; rows outside the WHERE fence stay untouched") {
    val (sql, tbl) = fresh(Seq(
      (1L, "a", -1.0), (2L, "b", -1.0), (3L, "c", -1.0)))
    // v := max matching k (as double); id=2 has no group -> NULL;
    // id=3 fenced out by WHERE
    spark.sql(s"UPDATE $sql SET name = concat('m', cast(" +
      s"(SELECT max(k) FROM g16_src WHERE g16_src.k = $sql.id) " +
      "AS string)) WHERE id <= 2")
    val got = CommitLog.read(spark, tbl).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got === Set((1L, Some("m1")), (2L, None), (3L, Some("c"))))
  }

  test("correlated scalar in a DELETE WHERE: comparison with the " +
      "per-key aggregate; empty group compares NULL -> not deleted") {
    val (sql, tbl) = fresh(Seq(
      (1L, "a", 0.0), (2L, "b", 0.0), (3L, "c", 0.0)))
    spark.sql(s"DELETE FROM $sql WHERE " +
      s"(SELECT count(*) FROM g16_src WHERE g16_src.k = $sql.id) >= 2")
    assert(state(tbl) === Set((Some(2L), "b", 0.0),
      (Some(3L), "c", 0.0)))
  }

  test("UNCORRELATED scalar subquery in SET (round-16 widening of " +
      "the SET surface)") {
    val (sql, tbl) = fresh(Seq((1L, "a", 0.0), (2L, "b", 0.0)))
    spark.sql(s"UPDATE $sql SET v = " +
      "(SELECT max(k) FROM g16_src) WHERE id = 1")
    assert(state(tbl) === Set((Some(1L), "a", 3.0),
      (Some(2L), "b", 0.0)))
  }

  test("correlated EXISTS delete composes with deletion vectors: " +
      "DV-deleted rows stay deleted through the copy-on-write " +
      "rewrite, never resurrect") {
    val (sql, tbl) = fresh(Seq(
      (1L, "dv", 1.0), (1L, "a", 2.0), (2L, "b", 3.0)))
    // point-delete via DV first (read-side subtraction, no rewrite)
    CommitLog.deleteVectored(spark, tbl, col("name") === "dv")
    assert(state(tbl) === Set((Some(1L), "a", 2.0), (Some(2L), "b", 3.0)))
    // now a correlated EXISTS delete rewrites the touched segment:
    // it must apply ON TOP of the DV subtraction
    spark.sql(s"DELETE FROM $sql WHERE EXISTS " +
      s"(SELECT 1 FROM g16_src WHERE g16_src.k = $sql.id " +
      "AND g16_src.s = 'x')")
    assert(state(tbl) === Set((Some(2L), "b", 3.0)))
  }

  test("MERGE WITH SCHEMA EVOLUTION x type widening: a source that " +
      "both widened a column (INT->LONG) and grew a new one lands in " +
      "one statement — widen commits + evolve commit, zero rewrites") {
    import spark.implicits._
    n += 1
    val tbl = s"$root/ns/we$n"
    CommitLog.append(spark, tbl,
      Seq((1L, 10), (2L, 20)).toDF("id", "v"))
    Seq((1L, 100L, "x"), (3L, 300L, "y")).toDF("id", "v", "extra")
      .createOrReplaceTempView("g16_we_src")
    try {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO g16.ns.we$n t
           |USING g16_we_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = CommitLog.read(spark, tbl)
      assert(got.schema.map(f => (f.name, f.dataType.simpleString)) ===
        Seq(("id", "bigint"), ("v", "bigint"), ("extra", "string")))
      assert(got.collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet ===
        Set((1L, 100L, Some("x")), (2L, 20L, None),
          (3L, 300L, Some("y"))))
      val ops = CommitLog.history(spark, tbl)
        .select(col("op")).collect().map(_.getString(0)).toSeq
      assert(ops === Seq("append", "widen_column", "evolve",
        "merge_into"))
    } finally spark.catalog.dropTempView("g16_we_src"): Unit
  }

  test("subqueries in MERGE clause conditions (round 16): an IN " +
      "gate on an UPDATE clause, first-match-wins over a plain " +
      "DELETE, and an IN-gated INSERT — previously refused") {
    import spark.implicits._
    n += 1
    val name = s"mc$n"
    val tbl = s"$root/ns/$name"
    CommitLog.append(spark, tbl, Seq[(java.lang.Long, String, Double)](
      (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "v"))
    Seq((1L, 10.0), (2L, 20.0), (4L, 40.0), (5L, 50.0))
      .toDF("id", "nv").createOrReplaceTempView("g16_mc_src")
    Seq(1L, 4L).toDF("k").createOrReplaceTempView("g16_mc_allow")
    try {
      spark.sql(
        s"""MERGE INTO g16.ns.$name t USING g16_mc_src s
           |ON t.id = s.id
           |WHEN MATCHED AND t.id IN (SELECT k FROM g16_mc_allow)
           |  THEN UPDATE SET v = s.nv
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED AND s.id IN (SELECT k FROM g16_mc_allow)
           |  THEN INSERT (id, name, v) VALUES (s.id, s.name, s.nv)
           |""".stripMargin)
      fail("name-aligned INSERT required — expected refusal above")
    } catch { case _: Exception => () } // INSERT s.name absent: loud
    spark.sql(
      s"""MERGE INTO g16.ns.$name t USING
         |  (SELECT id, 'src' AS name, nv AS v FROM g16_mc_src) s
         |ON t.id = s.id
         |WHEN MATCHED AND t.id IN (SELECT k FROM g16_mc_allow)
         |  THEN UPDATE SET v = s.v
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED AND s.id IN (SELECT k FROM g16_mc_allow)
         |  THEN INSERT *
         |""".stripMargin)
    // id=1: matched, allowed -> v=10; id=2: matched, not allowed ->
    // DELETE; id=3: untouched; id=4: unmatched, allowed -> insert;
    // id=5: unmatched, not allowed -> nothing
    assert(state(tbl) === Set((Some(1L), "a", 10.0),
      (Some(3L), "c", 3.0), (Some(4L), "src", 40.0)))
    spark.catalog.dropTempView("g16_mc_src"): Unit
    spark.catalog.dropTempView("g16_mc_allow"): Unit
  }

  test("two DISTINCT correlated scalar subqueries refuse LOUDLY") {
    val (sql, tbl) = fresh(Seq((1L, "a", 0.0)))
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $sql SET v = " +
        s"(SELECT count(*) FROM g16_src WHERE g16_src.k = $sql.id) + " +
        s"(SELECT max(k) FROM g16_src WHERE g16_src.k = $sql.id)")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains(
      "more than one correlated scalar")), s"got: $e")
    assert(state(tbl) === Set((Some(1L), "a", 0.0)), "nothing changed")
  }
}
