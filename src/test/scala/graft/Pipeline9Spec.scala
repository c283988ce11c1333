package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-5 block (q108–q112) on sf0.001; the exact
  * value-level check is the DuckDB oracle at sf0.01. */
class Pipeline9Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q108: Simpson index and top-char fraction are valid fixed-point ratios") {
    val r = run("q108_char_diversity").cache()
    assert(r.count() > 0)
    assert(r.filter(col("simpson_fp") < 0 || col("simpson_fp") >= 1000000L)
      .count() === 0)
    assert(r.filter(col("top_fp") <= 0 || col("top_fp") > 1000000L)
      .count() === 0)
    // n_ch is exactly the character length of the text
    val d = sources.Catalog.table(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    assert(r.join(d, "doc_id").filter(col("n_ch") =!= col("len"))
      .count() === 0)
    r.unpersist()
  }

  test("q109: doc LM scores are probabilities in fixed point") {
    val r = run("q109_bigram_doc_score").cache()
    assert(r.count() > 0)
    assert(r.filter(col("score_fp") < 0 || col("score_fp") > 1000000L)
      .count() === 0)
    // a doc whose every bigram is unique corpus-wide with a unique head
    // would score exactly 1e6; all scores must be positive (every
    // observed bigram has cnt >= 1)
    assert(r.filter(col("score_fp") <= 0).count() === 0)
    r.unpersist()
  }

  test("q110: statuses partition the delta batch and exact implies fingerprint match") {
    val r = run("q110_incremental_dedup").cache()
    val delta = sources.Catalog.table(spark, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
    assert(r.count() === delta.count())
    assert(r.select(col("doc_id")).distinct().count() === r.count())
    // status is exactly the is_exact/n_near classification
    assert(r.filter(
      (col("status") === "exact_dup") =!= col("is_exact") ||
        ((col("status") === "near_dup") =!= (!col("is_exact") && col("n_near") > 0)) ||
        ((col("status") === "unique") =!= (!col("is_exact") && col("n_near") === 0)))
      .count() === 0)
    r.unpersist()
  }

  test("q111: sample is a deterministic subset honoring the md5 threshold") {
    val r1 = run("q111_hash_stratified_sample").collect()
    val r2 = run("q111_hash_stratified_sample").collect()
    assert(r1.nonEmpty)
    assert(r1.toSeq === r2.toSeq) // no RNG state — rerun-identical
    // every kept row's md5 prefix is below its stratum threshold
    val thr = Seq("10000000", "40000000", "80000000", "c0000000")
    r1.foreach { row =>
      val n = row.getString(1).stripPrefix("src").toInt % 4
      assert(row.getString(2) < thr(n),
        s"doc ${row.getLong(0)} md5_8 ${row.getString(2)} >= ${thr(n)}")
    }
  }

  test("q114: run structure is consistent — max_run <= n_shared_pos <= n_positions") {
    val r = run("q114_repeated_span").cache()
    assert(r.count() > 0)
    assert(r.filter(col("max_run") > col("n_shared_pos") ||
      col("n_shared_pos") > col("n_positions")).count() === 0)
    // a doc with zero shared positions has zero max_run and vice versa
    assert(r.filter((col("n_shared_pos") === 0) =!= (col("max_run") === 0))
      .count() === 0)
    r.unpersist()
  }

  test("q112: kept token mass never exceeds the 80% nucleus budget") {
    val r = run("q112_nucleus_topp").cache()
    assert(r.count() > 0)
    assert(r.filter(col("tokens_kept") * 10 > col("tokens_total") * 8)
      .count() === 0)
    assert(r.filter(col("n_kept") > col("n_docs")).count() === 0)
    r.unpersist()
  }
}
