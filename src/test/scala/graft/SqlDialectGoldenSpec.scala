package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DerbyDialect, PostgresDialect, SqlServerDialect}

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

  // ---- T-SQL (SQL Server) — the reference's SOURCE system ----------

  test("T-SQL: idempotent insert is MERGE WITH (HOLDLOCK), bracket-quoted, typed params") {
    val got = SqlServerDialect.insertDoNothing(
      "etl.parcela_ciot", schema, Seq("id"))
    val want =
      """MERGE INTO [etl].[parcela_ciot] WITH (HOLDLOCK) AS tgt
        |USING (SELECT CAST(? AS BIGINT) AS [id], CAST(? AS DECIMAL(18,2)) AS [Valor Frete], CAST(? AS NVARCHAR(MAX)) AS [select], CAST(? AS INT) AS [odd"name], CAST(? AS DATETIME2) AS [created_at]) AS src
        |ON tgt.[id] = src.[id]
        |WHEN NOT MATCHED THEN INSERT ([id], [Valor Frete], [select], [odd"name], [created_at]) VALUES (src.[id], src.[Valor Frete], src.[select], src.[odd"name], src.[created_at]);""".stripMargin
    assert(got === want)
  }

  test("T-SQL: composite-key MERGE matches on every key") {
    val two = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", IntegerType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    val got = SqlServerDialect.insertDoNothing("t", two, Seq("a", "b"))
    val want =
      """MERGE INTO [t] WITH (HOLDLOCK) AS tgt
        |USING (SELECT CAST(? AS INT) AS [a], CAST(? AS INT) AS [b], CAST(? AS FLOAT) AS [v]) AS src
        |ON tgt.[a] = src.[a] AND tgt.[b] = src.[b]
        |WHEN NOT MATCHED THEN INSERT ([a], [b], [v]) VALUES (src.[a], src.[b], src.[v]);""".stripMargin
    assert(got === want)
  }

  test("T-SQL: auto-DDL guards with OBJECT_ID (no IF NOT EXISTS in T-SQL), bracket idents") {
    val got = SqlServerDialect.createTable("etl", "parcela_ciot", schema,
      primaryKey = Seq("id"))
    val want =
      """IF OBJECT_ID(N'[etl].[parcela_ciot]', N'U') IS NULL
        |CREATE TABLE [etl].[parcela_ciot] (
        |  [id] BIGINT NOT NULL,
        |  [Valor Frete] DECIMAL(18,2),
        |  [select] NVARCHAR(MAX),
        |  [odd"name] INT,
        |  [created_at] DATETIME2,
        |  PRIMARY KEY ([id])
        |)""".stripMargin
    assert(got === want)
  }

  test("T-SQL: schema creation guards with SCHEMA_ID and EXECs the quoted DDL") {
    assert(SqlServerDialect.createSchema("etl") ===
      "IF SCHEMA_ID(N'etl') IS NULL EXEC(N'CREATE SCHEMA [etl]')")
  }

  test("T-SQL: type map covers every Spark sink type; unmappable throws") {
    val want: Seq[(DataType, String)] = Seq(
      IntegerType -> "INT", LongType -> "BIGINT",
      DecimalType(12, 3) -> "DECIMAL(12,3)", DoubleType -> "FLOAT",
      FloatType -> "REAL", StringType -> "NVARCHAR(MAX)",
      BooleanType -> "BIT", TimestampType -> "DATETIME2",
      TimestampNTZType -> "DATETIME2", DateType -> "DATE",
      BinaryType -> "VARBINARY(MAX)")
    want.foreach { case (dt, s) =>
      assert(SqlServerDialect.typeName(dt) === s, dt.simpleString)
    }
    intercept[IllegalArgumentException] {
      SqlServerDialect.typeName(ArrayType(IntegerType))
    }
  }

  test("T-SQL: bracket quoting doubles embedded closing brackets; quote chars survive") {
    assert(SqlServerDialect.quote("a]b; DROP TABLE x; --") ===
      "[a]]b; DROP TABLE x; --]")
    assert(SqlServerDialect.quoteQualified("s.t") === "[s].[t]")
    // a schema name with a quote char must escape inside the EXEC literal
    assert(SqlServerDialect.createSchema("o'brien") ===
      "IF SCHEMA_ID(N'o''brien') IS NULL EXEC(N'CREATE SCHEMA [o''brien]')")
  }
}
