package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Compaction, Regression}

/** Laws for the q99–q106 block: normal-equation regression (the
  * driver-side solve the q101 statistics feed), CDC log compaction
  * vs a window-based reference, and the SemDeDup within-cluster pair
  * guarantee. */
class Pipeline8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("regression: exact recovery of planted linear weights") {
    import spark.implicits._
    // y = 7 + 3·x1 − 0.5·x2, noise-free → OLS must recover exactly
    val rows = (1 to 200).map { i =>
      val x1 = (i % 13).toDouble
      val x2 = (i % 7).toDouble * 2.0
      (x1, x2, 7.0 + 3.0 * x1 - 0.5 * x2)
    }
    val df = rows.toDF("x1", "x2", "y")
    val stats = Regression.sufficientStats(df,
      Seq(lit(1.0), col("x1"), col("x2")), col("y"))
    val w = Regression.fit(stats, d = 3)
    assert(math.abs(w(0) - 7.0) < 1e-8)
    assert(math.abs(w(1) - 3.0) < 1e-8)
    assert(math.abs(w(2) + 0.5) < 1e-8)
  }

  test("regression: singular matrix rejected without ridge, solved with") {
    // x2 = 2·x1 → rank-deficient Gram matrix
    val xtx = Array(
      Array(4.0, 2.0, 4.0),
      Array(2.0, 2.0, 4.0),
      Array(4.0, 4.0, 8.0))
    val xty = Array(1.0, 2.0, 4.0)
    assertThrows[IllegalArgumentException] {
      Regression.solveRidge(xtx, xty)
    }
    val w = Regression.solveRidge(xtx, xty, lambda = 0.1)
    assert(w.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("compaction equals window-based last-writer-wins reference") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),
      (2L, 1L, "I", "x"), (2L, 2L, "D", null),
      (3L, 1L, "I", "p"), (3L, 2L, "D", null), (3L, 3L, "I", "q"),
      (4L, 5L, "I", "only"))
      .toDF("k", "seq", "op", "payload")
    val got = Compaction.compact(log, Seq("k"), col("seq"), col("op"),
        Seq("payload"))
      .select(col("k"), col("last_seq"), col("n_versions"), col("payload"))
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    // reference: latest row per key via window, drop latest-deletes
    val want = Seq(
      (1L, 2L, 2L, "b"), // updated
      // key 2: latest is D → dropped
      (3L, 3L, 3L, "q"), // delete then re-insert survives
      (4L, 5L, 1L, "only"))
    assert(got === want)
  }

  test("editjoin: boundedLev equals Spark levenshtein threshold form") {
    import spark.implicits._
    // deterministic pseudo-random strings over a small alphabet so
    // edits, shifts and prefix overlaps all arise
    def mk(seed: Long, len: Int): String = {
      val sb = new StringBuilder
      var h = seed
      (0 until len).foreach { _ =>
        h = h * 6364136223846793005L + 1442695040888963407L
        sb.append(('a' + ((h >>> 60) & 3)).toChar)
      }
      sb.toString
    }
    val strs = (1 to 40).map(i => mk(i.toLong, 4 + (i % 9)))
    val pairs = for { a <- strs; b <- strs } yield (a, b)
    val df = pairs.toDF("a", "b")
      .withColumn("want", levenshtein(col("a"), col("b"), 2))
    df.collect().foreach { r =>
      val got = graft.operators.EditJoin
        .boundedLev(r.getString(0), r.getString(1), 2)
      assert(got === r.getInt(2),
        s"boundedLev(${r.getString(0)}, ${r.getString(1)}, 2)")
    }
  }

  test("editjoin: blockedSelfJoin equals relational blocked join") {
    import spark.implicits._
    val rows = (1L to 120L).map { i =>
      (i % 4, i, s"name${i % 17}x${if (i % 5 == 0) "q" else ""}")
    }
    val df = rows.toDF("blk", "k", "s")
    val got = graft.operators.EditJoin
      .blockedSelfJoin(df, "blk", "k", col("s"), maxDist = 2)
      .select("blk", "k1", "k2", "dist")
      .as[(Long, Long, Long, Int)].collect().sorted.toSeq
    val a = df.toDF("blk", "k1", "s1")
    val b = df.toDF("blk", "k2", "s2")
    val want = a.join(b, "blk").filter(col("k1") < col("k2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2"), 2))
      .filter(col("dist") >= 0)
      .select("blk", "k1", "k2", "dist")
      .as[(Long, Long, Long, Int)].collect().sorted.toSeq
    assert(got === want)
  }

  test("q105 plan: no forced broadcast of the doc→source map; " +
      "broadcast-disabled fallback stays exact") {
    // src has one row per document — billions at 100 TB — so it must
    // never carry a forced broadcast() hint; the small side is the
    // near-dup pair relation and AQE broadcasts it when it fits.
    // Law: with broadcasting disabled (the plan a corpus-wide map
    // forces at scale) q105 degrades to shuffle joins, same results.
    val sf = "/root/testdata/sf0.001"
    val name = "q105_cross_source_dups"
    val default = SparkEntry.queries(name)(spark, sf).collect().toSeq
    val conf = spark.conf
    val k1 = "spark.sql.autoBroadcastJoinThreshold"
    val k2 = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prev1 = conf.get(k1)
    val prev2 = conf.getOption(k2)
    try {
      conf.set(k1, "-1"); conf.set(k2, "-1")
      val fallback = SparkEntry.queries(name)(spark, sf)
      val rows = fallback.collect().toSeq
      // no Broadcast exchange AT ALL (BroadcastHashJoin alone would
      // let a nested-loop broadcast variant slip through)
      assert(!fallback.queryExecution.executedPlan.toString
          .contains("BroadcastExchange"),
        "q105 must carry no broadcast exchange once broadcasting is off")
      // multiset compare — row order across different physical plans
      // is not part of the contract
      assert(rows.sortBy(_.toString) === default.sortBy(_.toString),
        "q105 shuffle-join fallback must produce identical results")
    } finally {
      conf.set(k1, prev1)
      prev2 match { case Some(v) => conf.set(k2, v); case None => conf.unset(k2) }
    }
  }

  test("semantic dedup: every pair is within one cluster and above tau") {
    val out = graft.queries.Pipeline8
      .queries("q99_semantic_dedup")(spark, "/root/testdata/sf0.001")
      .collect()
    // structural guarantees (the oracle pins exact content): pair
    // ordering, threshold, and cluster-confinement via the cluster col
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("id_a")) < r.getLong(r.fieldIndex("id_b")))
      assert(r.getLong(r.fieldIndex("dot_fp")) >= 40000000000000L)
      assert(r.getLong(r.fieldIndex("cluster")) < 8L)
    }
  }
}
