package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ewma

/** Laws for the per-key EWMA recurrence operator (q74) and the vocab
  * OOV query (q75). */
class EwmaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("ewma: hand-computed 3-step recurrence, keys isolated") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 1L, 4.0), (1L, 20L, 2L, 8.0), (1L, 30L, 3L, 2.0),
      (2L, 10L, 4L, 100.0))
      .toDF("k", "us", "id", "v")
    val out = Ewma.ewma(df, "k", col("us"), col("id"), col("v"), 0.5)
      .orderBy(col("k"), col("us"))
      .select(col("ewma")).as[Double].collect()
    // key 1: 4.0 → .5*8+.5*4 = 6.0 → .5*2+.5*6 = 4.0 ; key 2 restarts
    assert(out.toSeq === Seq(4.0, 6.0, 4.0, 100.0))
  }

  test("ewma on events: first-per-key equals value; all values convex-bounded") {
    val ev = graft.sources.Catalog.table(spark, sf, "events")
    val e = Ewma.ewma(ev, "user_id", unix_micros(col("ts")),
      col("event_id"), col("value"), 0.5).cache()
    assert(e.count() === ev.count())
    // convexity: every EWMA lies within the key's overall value range
    val rng = e.groupBy("user_id")
      .agg(min("v").as("lo"), max("v").as("hi"))
    assert(e.join(rng, "user_id")
      .filter(col("ewma") < col("lo") || col("ewma") > col("hi"))
      .count() === 0)
    // first event per key: ewma == value exactly
    val first = e.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("us"), col("tb"))))
      .filter(col("rn") === 1)
    assert(first.filter(col("ewma") =!= col("v")).count() === 0)
    e.unpersist()
  }

  test("q76 centroid cosine: full upper triangle, cosine bounded") {
    val out = SparkEntry.queries("q76_label_centroid_cos")(spark, sf).cache()
    assert(out.count() === 45) // C(10,2)
    assert(out.filter(abs(col("centroid_cos")) > 1.0 + 1e-12).count() === 0)
    assert(out.filter(col("n_a") <= 0 || col("n_b") <= 0).count() === 0)
    out.unpersist()
  }

  test("q77 triangles: participation counts sum to 3x triangle total") {
    val out = SparkEntry.queries("q77_triangle_count")(spark, sf).cache()
    val total = out.agg(sum("n_triangles")).first().getLong(0)
    assert(total > 0 && total % 3 === 0,
      "each triangle contributes exactly 3 participation rows")
    out.unpersist()
  }

  test("q75 vocab oov: all docs present, oov bounded by token count") {
    val out = SparkEntry.queries("q75_vocab_oov")(spark, sf).cache()
    assert(out.count() === 500)
    assert(out.filter(col("n_oov") > col("n_tokens")).count() === 0)
    assert(out.filter(col("oov_frac") < 0.0 || col("oov_frac") > 1.0)
      .count() === 0)
    out.unpersist()
  }
}
