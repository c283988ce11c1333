package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JDBC source/sink surface (SURVEY S1/S2/S5).
  *
  * The reference's extract is a single ODBC cursor pulling 50 000-row
  * pages one connection at a time (`SELECT.py:26,161-164,192-193`);
  * the Spark mapping upgrades it to a partitioned parallel scan —
  * `partitionColumn`/`numPartitions` splits the key range across
  * executors, `fetchsize` keeps per-connection memory bounded. The
  * sink counterpart (batched idempotent insert) lives in
  * `operators/Upsert.intoJdbc`.
  */
object Jdbc {

  /** Partitioned parallel JDBC scan. `bounds` = (lower, upper) of the
    * numeric partition column; pass None for a single-partition read
    * (the reference's shape). */
  def read(spark: SparkSession, url: String, table: String,
      props: java.util.Properties,
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 8,
      fetchSize: Int = 50000): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", fetchSize.toString)
    val withPartitioning = (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) => base
        .option("partitionColumn", c)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", numPartitions.toString)
      case _ => base
    }
    props.stringPropertyNames().forEach { k =>
      withPartitioning.option(k, props.getProperty(k))
    }
    withPartitioning.load()
  }

  /** S5 auto-DDL: `CREATE SCHEMA IF NOT EXISTS` + `CREATE TABLE IF NOT
    * EXISTS` statements for a Spark schema (PostgreSQL dialect — the
    * reference's target, `SELECT.py:168,176-183`). Pure string
    * generation so it is unit-testable without a database; execute
    * over a JDBC connection in the connector. */
  def ddlFor(schemaName: String, table: String, schema: StructType,
      primaryKey: Seq[String] = Nil): Seq[String] = {
    def pgType(dt: DataType): String = dt match {
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
    val cols = schema.fields.map { f =>
      val nullable = if (f.nullable) "" else " NOT NULL"
      s"  ${f.name} ${pgType(f.dataType)}$nullable"
    }
    val pk = if (primaryKey.isEmpty) Nil
      else Seq(s"  PRIMARY KEY (${primaryKey.mkString(", ")})")
    Seq(
      s"CREATE SCHEMA IF NOT EXISTS $schemaName",
      (s"CREATE TABLE IF NOT EXISTS $schemaName.$table (" +:
        (cols ++ pk).mkString(",\n") +: Seq(")")).mkString("\n"))
  }
}
