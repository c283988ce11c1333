package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 read connector for [[CommitLog]] tables — the
  * engine's lakehouse format surfaced through Spark's standard
  * connector API:
  *
  * {{{
  *   spark.read.format("commitlog").option("path", tbl).load()
  *   spark.read.format("commitlog").option("path", tbl)
  *     .option("versionAsOf", "3").load()      // time travel
  * }}}
  *
  * The snapshot (manifest → segment list) is resolved ONCE, at table
  * construction: the returned DataFrame is pinned to that version's
  * segments, so writers committing concurrently can never change what
  * an already-planned read sees — the DSv2 twin of
  * [[CommitLog.read]]'s snapshot isolation, spec-pinned in
  * CommitLogSpec. Scan execution delegates to Spark's own
  * `ParquetTable` over the pinned segment directories, so filter
  * pushdown, column pruning, vectorized decode and partition planning
  * are all stock — the connector adds versioned-manifest resolution
  * and nothing else (the Delta/Iceberg layering, expressed minimally).
  *
  * Registered in META-INF/services so `format("commitlog")` resolves
  * by short name.
  */
class CommitLogSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "commitlog"

  private def resolve(options: CaseInsensitiveStringMap): ParquetTable = {
    val spark = SparkSession.active
    val path = Option(options.get("path")).getOrElse(throw
      new IllegalArgumentException(
        "commitlog source requires option 'path' (the table directory)"))
    val version = Option(options.get("versionAsOf")).map(_.toLong)
    val snap = CommitLog.snapshot(spark, path, version).getOrElse(throw
      new IllegalStateException(
        s"commitlog: no committed version at $path" +
          version.fold("")(v => s" (versionAsOf=$v — vacuumed or never " +
            "committed)")))
    if (snap.segments.isEmpty) throw new IllegalStateException(
      s"commitlog: version ${snap.version} of $path has no segments")
    ParquetTable(s"commitlog:$path@v${snap.version}", spark,
      options, snap.segments, None, classOf[ParquetFileFormat])
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    resolve(new CaseInsensitiveStringMap(properties))
}
