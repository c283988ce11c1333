package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KmvSketch, LabelPropagation}

/** Laws for the round-9 sketch-set-ops / community block (q153–q154);
  * the value-level gate is the DuckDB oracle at sf0.01 (and the x10
  * sweep for the estimator-accuracy witnesses). */
class Pipeline15Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // ---- KMV sketch laws -------------------------------------------------

  test("kmv: sketch not full => estimate is the exact distinct count") {
    val s = spark
    import s.implicits._
    val df = (1L to 50L).toDF("k")
    val st = KmvSketch.stats(KmvSketch.sketch(df, col("k"), k = 64))
      .select(KmvSketch.estimate("n", "kth", 64).as("est"))
    assert(st.head().getLong(0) == 50L)
  }

  test("kmv: merge of sketches == sketch of the union (k-truncation law)") {
    val s = spark
    import s.implicits._
    val a = (1L to 400L).toDF("k")
    val b = (200L to 600L).toDF("k")
    val k = 32
    val merged = KmvSketch.merge(
      KmvSketch.sketch(a, col("k"), k), KmvSketch.sketch(b, col("k"), k), k)
    val direct = KmvSketch.sketch(a.union(b), col("k"), k)
    assert(merged.orderBy("h").collect().toSeq ==
      direct.orderBy("h").collect().toSeq)
  }

  test("kmv: uniform hash matches the oracle's md5 arithmetic on a known value") {
    val s = spark
    import s.implicits._
    // md5("12345") = 827ccb0eea8a706c4c34a16891f84e7b;
    // 0x827ccb0eea8a706 = 587663336685479686; % 1000000007 = 447632001
    val h = Seq(12345L).toDF("k")
      .select(KmvSketch.uniformHash(col("k")).as("h")).head().getLong(0)
    assert(h == 587663336685479686L % 1000000007L)
  }

  test("q153: estimates carry accuracy witnesses; whole-sketch path exact at sf0.001 scale") {
    val r = run("q153_theta_sketch_setops").head()
    val ea = r.getAs[Long]("exact_a")
    val ei = r.getAs[Long]("exact_inter")
    assert(ea > 0 && ei > 0 && ei <= ea)
    assert(r.getAs[Boolean]("a_within_10pct"))
    assert(r.getAs[Boolean]("b_within_10pct"))
    assert(r.getAs[Boolean]("union_within_10pct"))
    assert(r.getAs[Boolean]("inter_within_10pct"))
    // union never exceeds the sum, intersection never exceeds either side
    assert(r.getAs[Long]("est_union") <=
      r.getAs[Long]("est_a") + r.getAs[Long]("est_b"))
  }

  // ---- label propagation laws -----------------------------------------

  /** Two 4-cliques joined by one bridge edge: LPA must find the two
    * communities, each converging to its smallest member label. */
  private def twoCliques(): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    val c1 = for (i <- 0L to 3L; j <- 0L to 3L if i != j) yield (i, j)
    val c2 = for (i <- 10L to 13L; j <- 10L to 13L if i != j) yield (i, j)
    (c1 ++ c2 ++ Seq((3L, 10L), (10L, 3L))).toDF("src", "dst")
  }

  test("lpa: two bridged cliques converge to per-clique smallest labels") {
    val out = LabelPropagation.run(twoCliques(), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(out(_) == 0L), s"clique1 labels: $out")
    assert((10L to 13L).forall(out(_) == 10L), s"clique2 labels: $out")
  }

  test("lpa: deterministic — two runs agree row-for-row") {
    val a = LabelPropagation.run(twoCliques(), "src", "dst", iters = 3)
      .orderBy("node").collect().toSeq
    val b = LabelPropagation.run(twoCliques(), "src", "dst", iters = 3)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("lpa: tie-break picks the SMALLEST label (star with equal-count neighbors)") {
    val s = spark
    import s.implicits._
    // center 100 has neighbors 1,2,3 each seen once: round 1 must
    // label the center 1 (min), not 2 or 3
    val e = Seq((1L, 100L), (2L, 100L), (3L, 100L),
      (100L, 1L), (100L, 2L), (100L, 3L)).toDF("src", "dst")
    val out = LabelPropagation.run(e, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(100L) == 1L)
    // the leaves' only neighbor is the center → they all take 100
    assert(out(1L) == 100L && out(2L) == 100L && out(3L) == 100L)
  }

  test("q154: labels coarsen — at most as many communities as nodes, more than one") {
    val out = run("q154_label_propagation")
    val nNodes = out.count()
    val nComms = out.select("lbl").distinct().count()
    assert(nNodes > 0 && nComms >= 1 && nComms < nNodes)
  }
}
