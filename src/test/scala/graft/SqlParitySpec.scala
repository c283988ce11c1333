package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.ParcelaCiot
import graft.sources.{Catalog, SchemaAssert}

/** The `spark.sql` parity entry point (SURVEY §7.3 step 6) and the
  * schema-assert gate (O10). */
class SqlParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("WITH-form SQL via spark.sql == DataFrame pipeline, row for row") {
    Catalog.registerAll(spark, sfDir)
    val fromSql = spark.sql(ParcelaCiot.sparkSql)
    val fromDf = ParcelaCiot.build(spark, sfDir)
    assert(fromSql.columns.toSeq == fromDf.columns.toSeq)
    val a = fromSql.collect().map(_.toString).sorted
    val b = fromDf.collect().map(_.toString).sorted
    assert(a.length == b.length && a.sameElements(b))
  }

  test("SchemaAssert passes on exact match, rejects drift") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    val ok = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    assert(SchemaAssert.require(df, ok) eq df)
    // wrong type
    intercept[SchemaAssert.SchemaMismatch] {
      SchemaAssert.require(df, StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType))))
    }
    // wrong name
    intercept[SchemaAssert.SchemaMismatch] {
      SchemaAssert.require(df, StructType(Seq(
        StructField("id", LongType), StructField("nome", StringType))))
    }
    // wrong arity (the reference's weaker check, O10)
    intercept[SchemaAssert.SchemaMismatch] {
      SchemaAssert.requireArity(df, 3)
    }
    assert(SchemaAssert.requireArity(df, 2) eq df)
  }
}
