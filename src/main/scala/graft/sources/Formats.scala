package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format surface beyond parquet (SURVEY S1 generalized):
  * CSV and JSON lines with explicit schemas (never inference in
  * production paths — inference is a full extra scan and a schema
  * drift hazard), and partitioned/bucketed parquet layout helpers.
  *
  * Scale notes: partition columns become directory pruning (zero I/O
  * for fenced-out partitions — the `PartitionFilters` entry in the
  * scan); bucketing pre-shuffles by join key at write time so
  * repeated joins/aggregations on that key skip their exchange.
  */
object Formats {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .schema(schema)
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet: one directory per value of
    * `partitionBy` — equality/fence predicates on those columns prune
    * whole directories at planning time. */
  def writePartitioned(df: DataFrame, path: String,
      partitionBy: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(path)

  /** Bucketed + sorted catalog table: pre-shuffles by the bucket key
    * at write time, so joins/aggregations between tables bucketed the
    * same way need NO exchange at read time — at 100 TB this turns the
    * recurring fact-fact join's dominant shuffle into a one-time write
    * cost. Requires `saveAsTable` (bucket metadata lives in the
    * catalog, not the files). */
  def writeBucketed(df: DataFrame, table: String, bucketBy: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
      .sortBy(bucketBy.head, bucketBy.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
