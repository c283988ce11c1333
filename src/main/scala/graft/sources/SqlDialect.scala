package graft.sources

import org.apache.spark.sql.types._

/** SQL dialect for the JDBC sink surface (SURVEY S3-S5): identifier
  * quoting, type mapping, auto-DDL and the idempotent-insert statement.
  *
  * The reference hardcodes PostgreSQL (`Select de Importação de
  * Dados.py:168,176-183,214-218`); the dialect seam exists so the SAME
  * connector code can be integration-tested against an embedded Apache
  * Derby (the only RDBMS available in this sandbox) — see
  * JdbcIntegrationSpec. Identifiers are always double-quoted with
  * embedded-quote doubling, so field names with spaces, mixed case or
  * reserved words generate correct (and non-injectable) DDL/DML.
  */
trait SqlDialect extends Serializable {

  /** ANSI double-quoting with embedded-quote doubling. */
  def quote(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** Quote a possibly schema-qualified name part by part. */
  def quoteQualified(name: String): String =
    name.split('.').map(quote).mkString(".")

  def typeName(dt: DataType): String

  def createSchema(schemaName: String): String

  def createTable(schemaName: String, table: String, schema: StructType,
      primaryKey: Seq[String]): String = {
    val cols = schema.fields.map { f =>
      val nullable = if (f.nullable) "" else " NOT NULL"
      s"  ${quote(f.name)} ${typeName(f.dataType)}$nullable"
    }
    val pk = if (primaryKey.isEmpty) Nil
      else Seq(s"  PRIMARY KEY (${primaryKey.map(quote).mkString(", ")})")
    (s"$createTablePrefix ${quote(schemaName)}.${quote(table)} (" +:
      (cols ++ pk).mkString(",\n") +: Seq(")")).mkString("\n")
  }

  protected def createTablePrefix: String

  /** Batched first-writer-wins insert with `?` markers in `schema`
    * field order: a re-run (or an intra-batch duplicate key) inserts
    * nothing and raises nothing. */
  def insertDoNothing(table: String, schema: StructType,
      keys: Seq[String]): String

  /** SQLStates a caller may treat as "already exists" when executing
    * [[createSchema]]/[[createTable]] on a dialect without
    * IF NOT EXISTS. */
  def alreadyExistsStates: Set[String] = Set.empty
}

/** The reference's target dialect (`SELECT.py:214-218`): native
  * `ON CONFLICT DO NOTHING`, `IF NOT EXISTS` DDL. */
object PostgresDialect extends SqlDialect {

  override def typeName(dt: DataType): String = dt match {
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case StringType => "TEXT"
    case BooleanType => "BOOLEAN"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case BinaryType => "BYTEA"
    case other => throw new IllegalArgumentException(
      s"no PostgreSQL mapping for ${other.simpleString}")
  }

  override def createSchema(schemaName: String): String =
    s"CREATE SCHEMA IF NOT EXISTS ${quote(schemaName)}"

  override protected def createTablePrefix: String =
    "CREATE TABLE IF NOT EXISTS"

  override def insertDoNothing(table: String, schema: StructType,
      keys: Seq[String]): String = {
    val cols = schema.fieldNames.toSeq
    val placeholders = cols.map(_ => "?").mkString(", ")
    s"""INSERT INTO ${quoteQualified(table)} (${cols.map(quote).mkString(", ")})
       |VALUES ($placeholders)
       |ON CONFLICT (${keys.map(quote).mkString(", ")}) DO NOTHING""".stripMargin
  }
}

/** Apache Derby — the embedded database the integration spec runs
  * against. No `IF NOT EXISTS` (callers ignore
  * [[alreadyExistsStates]]) and no `ON CONFLICT`, so the idempotent
  * insert is emulated with `INSERT … SELECT … WHERE NOT EXISTS` over
  * typed-cast parameters; within one connection the subquery sees the
  * transaction's own earlier inserts, so intra-batch duplicates are
  * suppressed too. Single-writer semantics (an embedded test database
  * has exactly one writer); the PG path keeps the native atomic form.
  */
object DerbyDialect extends SqlDialect {

  override def typeName(dt: DataType): String = dt match {
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case StringType => "VARCHAR(32672)"
    case BooleanType => "BOOLEAN"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case BinaryType => "BLOB"
    case other => throw new IllegalArgumentException(
      s"no Derby mapping for ${other.simpleString}")
  }

  override def createSchema(schemaName: String): String =
    s"CREATE SCHEMA ${quote(schemaName)}"

  override protected def createTablePrefix: String = "CREATE TABLE"

  // X0Y68 = schema exists, X0Y32 = table exists
  override def alreadyExistsStates: Set[String] = Set("X0Y68", "X0Y32")

  override def insertDoNothing(table: String, schema: StructType,
      keys: Seq[String]): String = {
    val t = quoteQualified(table)
    val srcCols = schema.fields.map(f =>
      s"CAST(? AS ${typeName(f.dataType)}) AS ${quote(f.name)}")
      .mkString(", ")
    val outCols = schema.fieldNames.map(quote).mkString(", ")
    val selCols = schema.fieldNames.map(c => s"src.${quote(c)}").mkString(", ")
    val keyMatch = keys.map(k => s"tgt.${quote(k)} = src.${quote(k)}")
      .mkString(" AND ")
    s"""INSERT INTO $t ($outCols)
       |SELECT $selCols
       |FROM (SELECT $srcCols FROM SYSIBM.SYSDUMMY1) src
       |WHERE NOT EXISTS (SELECT 1 FROM $t tgt WHERE $keyMatch)""".stripMargin
  }
}

/** Microsoft SQL Server (T-SQL) — the system the reference READS from
  * (`SELECT.py:161-164`; its sink is PostgreSQL). Spark's built-in
  * JDBC dialect covers the read side; this completes write-side
  * symmetry so the connector can also target the source system.
  * T-SQL notes: identifiers are bracket-quoted (`]` doubled); there is
  * no `IF NOT EXISTS` DDL form, so existence guards are native
  * `IF SCHEMA_ID/OBJECT_ID` wrappers (atomic enough for DDL — a lost
  * race surfaces as "already exists", which the caller treats as
  * success, same as the Derby SQLState path); the idempotent insert is
  * `MERGE … WITH (HOLDLOCK) … WHEN NOT MATCHED THEN INSERT` —
  * HOLDLOCK (= SERIALIZABLE range lock on the key probe) is what makes
  * concurrent first-writer-wins racers serialize instead of both
  * passing the NOT MATCHED check and one dying on the PK.
  */
object SqlServerDialect extends SqlDialect {

  /** T-SQL bracket quoting with embedded-bracket doubling. */
  override def quote(ident: String): String =
    "[" + ident.replace("]", "]]") + "]"

  /** Single-quoted N'literal' for OBJECT_ID/SCHEMA_ID probes. */
  private def nlit(s: String): String =
    "N'" + s.replace("'", "''") + "'"

  override def typeName(dt: DataType): String = dt match {
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case DoubleType => "FLOAT"
    case FloatType => "REAL"
    case StringType => "NVARCHAR(MAX)"
    case BooleanType => "BIT"
    case TimestampType | TimestampNTZType => "DATETIME2"
    case DateType => "DATE"
    case BinaryType => "VARBINARY(MAX)"
    case other => throw new IllegalArgumentException(
      s"no SQL Server mapping for ${other.simpleString}")
  }

  override def createSchema(schemaName: String): String =
    s"IF SCHEMA_ID(${nlit(schemaName)}) IS NULL " +
      s"EXEC(${nlit(s"CREATE SCHEMA ${quote(schemaName)}")})"

  override protected def createTablePrefix: String = "CREATE TABLE"

  override def createTable(schemaName: String, table: String,
      schema: StructType, primaryKey: Seq[String]): String = {
    val qualified = s"${quote(schemaName)}.${quote(table)}"
    s"IF OBJECT_ID(${nlit(qualified)}, N'U') IS NULL\n" +
      super.createTable(schemaName, table, schema, primaryKey)
  }

  // 2714 = "There is already an object named ..." surfaces as
  // SQLState S0001 via the MS JDBC driver; the guards above make this
  // reachable only through a DDL race, where it still means "exists".
  override def alreadyExistsStates: Set[String] = Set("S0001")

  override def insertDoNothing(table: String, schema: StructType,
      keys: Seq[String]): String = {
    val t = quoteQualified(table)
    val srcCols = schema.fields.map(f =>
      s"CAST(? AS ${typeName(f.dataType)}) AS ${quote(f.name)}")
      .mkString(", ")
    val outCols = schema.fieldNames.map(quote).mkString(", ")
    val srcVals = schema.fieldNames.map(c => s"src.${quote(c)}").mkString(", ")
    val keyMatch = keys.map(k => s"tgt.${quote(k)} = src.${quote(k)}")
      .mkString(" AND ")
    s"""MERGE INTO $t WITH (HOLDLOCK) AS tgt
       |USING (SELECT $srcCols) AS src
       |ON $keyMatch
       |WHEN NOT MATCHED THEN INSERT ($outCols) VALUES ($srcVals);""".stripMargin
  }
}
