package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The native codegen'd dot_fp expression and its session-extension
  * registration: value parity with the HOF form and the JVM kernel,
  * null semantics, SQL-callable. */
class ExpressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.expressions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // under sbt the suites share one JVM-wide session that may have
    // been built without extensions — register on the live session too
    graft.expressions.GraftExtensions.register(s)
    s
  }

  test("dot_fp == declarative dotInt on fixed-point vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(0.5f, -0.25f, 0.125f), Array(1.0f, 0.5f, -1.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
      .select(Similarity.fixedPoint(col("a")).as("fa"),
        Similarity.fixedPoint(col("b")).as("fb"))
    val native = df.selectExpr("dot_fp(fa, fb) AS d")
      .collect().map(_.getLong(0)).toSeq
    val hof = df.select(Similarity.dotInt(col("fa"), col("fb")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(native == hof)
  }

  test("dot_fp null-propagates on NULL arrays, callable from SQL") {
    import spark.implicits._
    Seq((Some(Array(1L, 2L)), Some(Array(3L, 4L))),
      (None, Some(Array(3L, 4L))))
      .toDF("a", "b").createOrReplaceTempView("v")
    val got = spark.sql("SELECT dot_fp(a, b) FROM v ORDER BY 1 NULLS LAST")
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == Seq(11L, null))
  }

  test("dot_fp participates in whole-stage codegen on a parquet scan") {
    // a real scan (local Seqs constant-fold into LocalTableScan)
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(Similarity.fixedPoint(col("embedding")).as("fv"))
      .selectExpr("dot_fp(fv, fv) AS norm_fp")
    // codegen stages print with a `*(n)` prefix; dot_fp must be inside
    // one (note: the HOF `transform` Project prints WITHOUT `*` — it
    // cannot codegen, which is exactly why dot_fp exists)
    val plan = emb.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[dot_fp.*"), plan)
    // unit vectors: fixed-point self-dot ≈ 1e14 (within fp truncation)
    val norms = emb.collect().map(_.getLong(0))
    assert(norms.forall(n => math.abs(n - 1e14) < 1e10))
  }
}
