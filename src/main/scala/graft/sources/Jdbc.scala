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

  /** S5 auto-DDL: schema + table creation statements for a Spark
    * schema (PostgreSQL dialect by default — the reference's target,
    * `SELECT.py:168,176-183`). Pure string generation so it is
    * unit-testable without a database; execute via [[executeDdl]] (or
    * any JDBC connection) in the connector. Identifiers are quoted —
    * see [[SqlDialect.quote]]. */
  def ddlFor(schemaName: String, table: String, schema: StructType,
      primaryKey: Seq[String] = Nil,
      dialect: SqlDialect = PostgresDialect): Seq[String] =
    Seq(
      dialect.createSchema(schemaName),
      dialect.createTable(schemaName, table, schema, primaryKey))

  /** Run DDL statements on a live connection, tolerating only the
    * dialect's "already exists" SQLStates (for dialects without
    * IF NOT EXISTS) — any other failure propagates. */
  def executeDdl(conn: java.sql.Connection, statements: Seq[String],
      dialect: SqlDialect = PostgresDialect): Unit =
    statements.foreach { sql =>
      val st = conn.createStatement()
      try st.execute(sql)
      catch {
        case e: java.sql.SQLException
            if dialect.alreadyExistsStates.contains(e.getSQLState) => ()
      } finally st.close()
    }
}
