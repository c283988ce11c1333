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

  /** Load one table from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` parity queries
    * (SURVEY §7.3 step 6) see the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { n =>
      table(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
