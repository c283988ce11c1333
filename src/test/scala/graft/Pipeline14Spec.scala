package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-9 model-based selection block (q151–q152) on
  * sf0.001 plus planted synthetic corpora; the value-level gate is the
  * DuckDB oracle at sf0.01. */
class Pipeline14Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  /** Write a synthetic `documents` table (the only table q151/q152
    * read) to a temp dir and return the dir. */
  private def corpus(rows: Seq[(Long, String, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_p14_").toString
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(go)); f.delete(): Unit
    }
    go(new java.io.File(path))
  }

  test("q151: one row per scoreable doc, rn a permutation, balanced " +
    "rank-monotone terciles, fixed-point score in (0, 1e6]") {
    val r = run("q151_perplexity_filter").cache()
    val docs = sources.Catalog.table(spark, dir, "documents")
      .filter(size(graft.functions.TextFunctions.tokens(col("text"))) >= 2)
    val n = r.count()
    assert(n === docs.count())
    // rn is exactly 1..n
    assert(r.agg(min("rn"), max("rn"), countDistinct("rn"))
      .first().toSeq === Seq(1L, n, n))
    // add-one smoothing keeps every bigram probability > 0; a mean of
    // values in (0, 1e6] stays in (0, 1e6]
    assert(r.filter(col("score_fp") <= 0 ||
      col("score_fp") > 1000000L).count() === 0)
    // terciles: sizes differ by <= 1 and ranks don't interleave
    val sizes = r.groupBy("bucket").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(sizes.keySet === Set("head", "middle", "tail"))
    assert(sizes.values.max - sizes.values.min <= 1)
    val bounds = r.groupBy("bucket")
      .agg(min("rn").as("lo"), max("rn").as("hi")).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(bounds("head")._2 < bounds("middle")._1)
    assert(bounds("middle")._2 < bounds("tail")._1)
    r.unpersist()
  }

  test("q151: a doc of reference-frequent bigrams outscores a doc of " +
    "unseen bigrams (planted corpus)") {
    val tmp = corpus(Seq(
      (1L, "a b a b a b a b", "en", "src0"), // the reference corpus
      (2L, "a b", "fr", "src1"),             // seen bigram
      (3L, "x y", "fr", "src1")))            // unseen bigram + heads
    try {
      val m = SparkEntry.queries("q151_perplexity_filter")(spark, tmp)
        .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
      assert(m(2) > m(3), s"seen-bigram doc must outscore unseen: $m")
    } finally rm(tmp)
  }

  test("q152: top-k bounded, ordered by (weight desc, doc_id), and a " +
    "target-like doc outweighs a raw-only-like doc (planted corpus)") {
    val r = run("q152_dsir_select").collect()
    assert(r.length <= 100)
    val pairs = r.map(x => (x.getLong(3), x.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy { case (w, id) => (-w, id) }))

    val tgt = (1L to 8L).map(i => (i, "t u t u t u", "en", "src0"))
    val raw = (11L to 18L).map(i => (i, "r s r s r s", "en", "src9"))
    val tmp = corpus(tgt ++ raw ++ Seq(
      (21L, "t u t u", "en", "src9"),  // target-like candidate
      (22L, "r s r s", "en", "src8"))) // raw-only-like candidate
    try {
      val m = SparkEntry.queries("q152_dsir_select")(spark, tmp)
        .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
      assert(m(21L) > m(22L),
        s"target-like doc must carry higher importance weight: $m")
    } finally rm(tmp)
  }
}
