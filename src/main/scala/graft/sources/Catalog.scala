package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source catalog over the driver testdata (TESTDATA.md).
  *
  * Plays the role of the reference's source-table namespace (the SQL
  * Server tables named in `Select de Importação de Dados.py:50-55,91-96`):
  * N named pipelines share one catalog of named relations (SURVEY §0).
  *
  * Reads are plain `spark.read.parquet` so Catalyst's DSv2 pushdown
  * (PushedFilters / column pruning) applies — at 100 TB the scan is the
  * dominant cost and pruning at the source is the single biggest win.
  */
object Catalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from a scale-factor directory.
    *
    * The driver's `events` table carries TIMESTAMP(NANOS) — a parquet
    * type Spark does not accept natively (nanos don't fit TimestampType).
    * Sessions set `spark.sql.legacy.parquet.nanosAsLong=true`, so nano
    * columns surface as LongType; normalize them back to TimestampType
    * here via integer division (nanos since epoch exceed 2^53, so any
    * double-routed conversion would silently corrupt — `div` is exact). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    nanoLongColumns.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema.fields.exists(f =>
          f.name == c && f.dataType == org.apache.spark.sql.types.LongType))
        d.withColumn(c, org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr(s"$c div 1000")))
      else d
    }
  }

  /** Columns stored as TIMESTAMP(NANOS) in the driver parquet. */
  private val nanoLongColumns: Map[String, Seq[String]] =
    Map("events" -> Seq("ts"))

  /** Register every table as a temp view so `spark.sql` parity queries
    * (SURVEY §7.3 step 6) see the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { n =>
      table(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
