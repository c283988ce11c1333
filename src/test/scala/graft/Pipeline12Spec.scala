package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Pipeline12

/** Laws for the round-8 corpus-curation block (q141–q143) on sf0.001;
  * the value-level gate is the DuckDB oracle at sf0.01. */
class Pipeline12Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q141: spans are bounded, consistent and cover every doc once") {
    val r = run("q141_dup_span_removal").cache()
    val docs = sources.Catalog.table(spark, dir, "documents")
    // one audit row per document, removed spans never exceed the doc
    assert(r.count() === docs.count())
    assert(r.filter(col("tokens_removed") > col("n_tokens")).count() === 0)
    assert(r.filter(col("tokens_removed") < 0).count() === 0)
    // a non-zero removal implies >=1 span of >=SpanK tokens, and the
    // merged-islands invariant: spans * k <= tokens_removed is false
    // in general (islands can be longer), but each span is >= SpanK
    assert(r.filter(col("n_spans") > 0 &&
      col("tokens_removed") < col("n_spans") * Pipeline12.SpanK)
      .count() === 0)
    assert(r.filter((col("n_spans") === 0) =!=
      (col("tokens_removed") === 0)).count() === 0)
    // fixed-point fraction is exact integer math in [0, 1e6]
    assert(r.filter(col("removed_fp") < 0 ||
      col("removed_fp") > 1000000L).count() === 0)
    r.unpersist()
  }

  test("q142: CMS estimate is one-sided (est >= true) and exact for " +
    "a collision-free row") {
    val r = run("q142_countmin_sketch").cache()
    assert(r.count() === 20)
    assert(r.filter(col("est_cnt") < col("true_cnt")).count() === 0)
    assert(r.filter(col("over_cnt") =!= col("est_cnt") - col("true_cnt"))
      .count() === 0)
    r.unpersist()
  }

  test("q142: sketch cells merge by addition across corpus halves") {
    val toks = Pipeline12.corpusTokens(spark, dir)
      .withColumn("half", (xxhash64(col("token")) % 2 === 0))
      .cache()
    val whole = Pipeline12.cmsCells(toks.drop("half"))
    val a = Pipeline12.cmsCells(toks.filter(col("half")).drop("half"))
    val b = Pipeline12.cmsCells(toks.filter(!col("half")).drop("half"))
    val merged = a.union(b).groupBy(col("j"), col("bucket"))
      .agg(sum(col("cell")).as("cell"))
    assert(whole.exceptAll(merged).count() === 0)
    assert(merged.exceptAll(whole).count() === 0)
    toks.unpersist()
  }

  test("q143: greedy picks are distinct, gains non-increasing, " +
    "cumulative total consistent") {
    val r = run("q143_greedy_coverage").collect().sortBy(_.getLong(0))
    assert(r.nonEmpty && r.length <= 5)
    assert(r.map(_.getLong(1)).distinct.length === r.length)
    // classic submodular-greedy law: marginal gain never increases
    val gains = r.map(_.getLong(2))
    assert(gains.zip(gains.tail).forall { case (g1, g2) => g2 <= g1 })
    assert(r.map(_.getLong(2)).scanLeft(0L)(_ + _).tail
      .sameElements(r.map(_.getLong(3))))
    // first pick is the doc with the most distinct bigrams — verify
    // against an independent computation
    val best = graft.operators.FuzzyDedup
      .shingles(sources.Catalog.table(spark, dir, "documents"),
        "doc_id", col("text"), k = 2, cache = false)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("doc_id")).first()
    assert(r.head.getLong(1) === best.getLong(0))
    assert(r.head.getLong(2) === best.getLong(1))
  }
}
