package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DerbyDialect, PostgresDialect}

/** Golden-SQL specs for the JDBC dialect seam (SURVEY S3–S5).
  *
  * The PostgreSQL branch is the reference's real target
  * (`Select de Importação de Dados.py:168,176-183,214-218`) but no PG
  * server exists in this sandbox, so — unlike the Derby branch, which
  * JdbcIntegrationSpec executes live — the PG strings would otherwise
  * be dead code in tests. These goldens pin the EXACT statement text a
  * PostgreSQL server would receive, so a blind edit to the dialect
  * (quoting, conflict clause, type mapping) fails a spec instead of
  * shipping silently.
  */
class SqlDialectGoldenSpec extends AnyFunSuite {

  // A schema that exercises the hazards: mixed case, a space, a
  // reserved word, an embedded double-quote, NOT NULL, and the full
  // range of mapped types.
  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("Valor Frete", DecimalType(18, 2), nullable = true),
    StructField("select", StringType, nullable = true),
    StructField("odd\"name", IntegerType, nullable = true),
    StructField("created_at", TimestampType, nullable = true)))

  test("PG: idempotent insert is native ON CONFLICT DO NOTHING, all idents quoted") {
    val got = PostgresDialect.insertDoNothing(
      "etl.parcela_ciot", schema, Seq("id"))
    val want =
      """INSERT INTO "etl"."parcela_ciot" ("id", "Valor Frete", "select", "odd""name", "created_at")
        |VALUES (?, ?, ?, ?, ?)
        |ON CONFLICT ("id") DO NOTHING""".stripMargin
    assert(got === want)
  }

  test("PG: composite-key conflict target lists every key, in order") {
    val two = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", IntegerType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    val got = PostgresDialect.insertDoNothing("t", two, Seq("a", "b"))
    val want =
      """INSERT INTO "t" ("a", "b", "v")
        |VALUES (?, ?, ?)
        |ON CONFLICT ("a", "b") DO NOTHING""".stripMargin
    assert(got === want)
  }

  test("PG: auto-DDL uses IF NOT EXISTS, NOT NULL, PK clause, PG type names") {
    val got = PostgresDialect.createTable("etl", "parcela_ciot", schema,
      primaryKey = Seq("id"))
    val want =
      """CREATE TABLE IF NOT EXISTS "etl"."parcela_ciot" (
        |  "id" BIGINT NOT NULL,
        |  "Valor Frete" NUMERIC(18,2),
        |  "select" TEXT,
        |  "odd""name" INTEGER,
        |  "created_at" TIMESTAMP,
        |  PRIMARY KEY ("id")
        |)""".stripMargin
    assert(got === want)
  }

  test("PG: no-PK table omits the PRIMARY KEY clause") {
    val one = StructType(Seq(StructField("x", IntegerType, nullable = true)))
    val got = PostgresDialect.createTable("s", "t", one, primaryKey = Nil)
    val want =
      """CREATE TABLE IF NOT EXISTS "s"."t" (
        |  "x" INTEGER
        |)""".stripMargin
    assert(got === want)
  }

  test("PG: schema creation is idempotent IF NOT EXISTS") {
    assert(PostgresDialect.createSchema("etl") ===
      """CREATE SCHEMA IF NOT EXISTS "etl"""")
  }

  test("PG: full type mapping (reference target types, SELECT.py:176-183)") {
    val want = Map[DataType, String](
      IntegerType -> "INTEGER", LongType -> "BIGINT",
      DecimalType(38, 8) -> "NUMERIC(38,8)",
      DoubleType -> "DOUBLE PRECISION", FloatType -> "REAL",
      StringType -> "TEXT", BooleanType -> "BOOLEAN",
      TimestampType -> "TIMESTAMP", TimestampNTZType -> "TIMESTAMP",
      DateType -> "DATE", BinaryType -> "BYTEA")
    want.foreach { case (dt, s) =>
      assert(PostgresDialect.typeName(dt) === s, dt.simpleString)
    }
    intercept[IllegalArgumentException] {
      PostgresDialect.typeName(ArrayType(IntegerType))
    }
  }

  test("Derby: emulated idempotent insert golden (the live-executed branch)") {
    val two = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val got = DerbyDialect.insertDoNothing("s.t", two, Seq("a"))
    val want =
      """INSERT INTO "s"."t" ("a", "v")
        |SELECT src."a", src."v"
        |FROM (SELECT CAST(? AS INTEGER) AS "a", CAST(? AS VARCHAR(32672)) AS "v" FROM SYSIBM.SYSDUMMY1) src
        |WHERE NOT EXISTS (SELECT 1 FROM "s"."t" tgt WHERE tgt."a" = src."a")""".stripMargin
    assert(got === want)
  }

  test("identifier quoting doubles embedded quotes (non-injectable DDL)") {
    assert(PostgresDialect.quote("a\"b; DROP TABLE x; --") ===
      "\"a\"\"b; DROP TABLE x; --\"")
    assert(PostgresDialect.quoteQualified("s.t") === "\"s\".\"t\"")
  }
}
