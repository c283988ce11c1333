package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HeavyHitters, Repair, Scd2}

/** Unit contracts for SCD2 maintenance, Misra–Gries heavy hitters,
  * and keyed gap repair. */
class Pipeline4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("scd2 fromHistory: versions open only on attribute change, null-safely") {
    import spark.implicits._
    val obs = Seq(
      (1L, ts(10), 100L, "a"),
      (1L, ts(20), 101L, "a"),  // no change — collapsed
      (1L, ts(30), 102L, "b"),  // change
      (1L, ts(40), 103L, null), // change to NULL
      (1L, ts(50), 104L, null), // no change — collapsed
      (1L, ts(60), 105L, "b"),  // change from NULL
      (2L, ts(10), 200L, "x")
    ).toDF("k", "t", "eid", "attr")
    val dim = Scd2.fromHistory(obs, "k", Seq(col("t"), col("eid")),
      Seq("attr"))
    val got = dim.orderBy("k", "version")
      .select("k", "version", "attr", "valid_from", "valid_to",
        "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        Option(r.getTimestamp(3)).map(_.getTime / 1000),
        Option(r.getTimestamp(4)).map(_.getTime / 1000),
        r.getBoolean(5))).toSeq
    assert(got == Seq(
      (1L, 1, "a", Some(10L), Some(30L), false),
      (1L, 2, "b", Some(30L), Some(40L), false),
      (1L, 3, null, Some(40L), Some(60L), false),
      (1L, 4, "b", Some(60L), None, true),
      (2L, 1, "x", Some(10L), None, true)))
  }

  test("scd2 applyBatch law: time-ordered batches equal one-shot build") {
    import spark.implicits._
    val h1 = Seq(
      (1L, ts(10), 1L, "a"), (1L, ts(20), 2L, "b"),
      (2L, ts(10), 3L, "x"), (3L, ts(15), 4L, "q")
    ).toDF("k", "t", "eid", "attr")
    val h2 = Seq(
      (1L, ts(30), 5L, "b"),  // no change vs current → absorbed
      (1L, ts(40), 6L, "c"),  // new version
      (2L, ts(35), 7L, "y"),  // new version
      (4L, ts(20), 8L, "n")   // brand-new key
    ).toDF("k", "t", "eid", "attr")
    val ord = Seq(col("t"), col("eid"))
    val oneShot = Scd2.fromHistory(h1.unionByName(h2), "k", ord,
      Seq("attr"))
    val merged = Scd2.applyBatch(
      Scd2.fromHistory(h1, "k", ord, Seq("attr")),
      h2, "k", ord, Seq("t", "eid"), Seq("attr"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "version", "attr", "valid_from", "valid_to",
          "is_current")
        .collect().map(_.toSeq).toSet
    assert(canon(merged) == canon(oneShot))
    // untouched key 3 passes through; key 1 has 3 versions
    assert(canon(merged).count(_.head == 3L) == 1)
    assert(canon(merged).count(_.head == 1L) == 3)
  }

  test("heavy hitters: exact answer with threshold guarantee under skew") {
    import spark.implicits._
    // 1000 'hot' (50%), 400 'warm' (20%), 600 spread over 600 uniques
    val rows = Seq.fill(1000)("hot") ++ Seq.fill(400)("warm") ++
      (0 until 600).map(i => s"cold_$i")
    // shuffle deterministically so partitions see mixed order
    val items = rows.sortBy(_.hashCode).toDF("item")
      .repartition(7) // more partitions than needed — MG per partition
    // threshold 10% with capacity 16 (capacity+1 >= 10)
    val got = HeavyHitters.frequentItems(items, "item", 1L, 10L, 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("hot" -> 1000L, "warm" -> 400L))
  }

  test("heavy hitters: capacity below the guarantee bound is rejected") {
    import spark.implicits._
    val items = Seq("a").toDF("item")
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(items, "item", 1L, 30L, 16)
    }
  }

  test("preTokenStats: run segmentation by character class") {
    import spark.implicits._
    val df = Seq(
      (1L, "ab12-cd  e,f"),      // runs: ab|12|-|cd|e|,|f → 4a 1n 2o
      (2L, "   "),               // spaces only → zero pre-tokens
      (3L, null.asInstanceOf[String]),
      (4L, "x9!")                // x|9|! → 1a 1n 1o
    ).toDF("doc_id", "text")
    val got = graft.functions.TextFunctions
      .preTokenStats(df, "doc_id", col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSeq
    assert(got == Seq(
      (1L, Some(7L), Some(4L), Some(1L), Some(2L), Some(12.0 / 7.0)),
      (2L, Some(0L), Some(0L), Some(0L), Some(0L), None),
      (3L, None, None, None, None, None),
      (4L, Some(3L), Some(1L), Some(1L), Some(1L), Some(1.0))))
  }

  test("pagerank: relational supersteps equal a local replay of the recurrence") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "c"),
      ("d", "a") // d has no in-edges → stays at base after step 1
    ).toDF("s", "d")
    val iters = 3
    val got = graft.operators.PageRank.run(edges, "s", "d", iters)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // local replay: identical integer recurrence
    val e = Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
      ("b", "c"), ("d", "a"))
    val nodes = e.flatMap(t => Seq(t._1, t._2))
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> graft.operators.PageRank.Scale).toMap
    (1 to iters).foreach { _ =>
      val inflow = e.toSeq
        .map { case (u, v) => v -> pr(u) / outdeg(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      pr = nodes.map(n =>
        n -> (150000L + 85L * inflow.getOrElse(n, 0L) / 100L)).toMap
    }
    assert(got == pr)
    assert(got("d") == 150000L) // no in-edges → base rank
  }

  test("globalRowNumber equals the single-reducer window row_number") {
    import spark.implicits._
    val df = (0 until 5000).map { i =>
      (i.toLong, (i * 2654435761L) % 997L) // duplicate sort keys exist
    }.toDF("id", "key").repartition(8)
    val got = graft.operators.DistributedRank
      .globalRowNumber(df, Seq(col("key"), col("id")), "rn",
        partitions = 6)
      .select("id", "key", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("key"), col("id"))
    val expect = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("bloom-gated decontamination equals the exact overlap") {
    import spark.implicits._
    val run = "a b c d e f g h"
    val train = Seq(
      (1L, s"x y $run z"),
      (2L, "a b c d e f g x"), // 7-token overlap only — clean
      (3L, s"$run $run tail"),
      (5L, "unrelated words only in this training document here")
    ).toDF("doc_id", "text")
    val bench = Seq((10L, s"header $run trailer")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val exact = graft.operators.Decontaminate
      .overlap(train, bench, "doc_id", col("text"), k = 8)
    val bloomed = graft.operators.Decontaminate
      .overlapBloom(train, bench, "doc_id", col("text"), k = 8)
    assert(canon(bloomed) == canon(exact))
    assert(canon(bloomed).nonEmpty)
  }

  test("gap fill: ffill carries last non-null forward, bfill backward") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, None: Option[Double]),
      (1L, 2L, Some(10.0)),
      (1L, 3L, None: Option[Double]),
      (1L, 4L, Some(20.0)),
      (1L, 5L, None: Option[Double]),
      (2L, 1L, None: Option[Double]) // key with no observation at all
    ).toDF("k", "seq", "v")
    val got = Repair.fillGaps(df, "k", Seq(col("seq")), "v")
      .orderBy("k", "seq")
      .select("k", "seq", "v_ffill", "v_bfill")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(got == Seq(
      (1L, 1L, None, Some(10.0)),
      (1L, 2L, Some(10.0), Some(10.0)),
      (1L, 3L, Some(10.0), Some(20.0)),
      (1L, 4L, Some(20.0), Some(20.0)),
      (1L, 5L, Some(20.0), None),
      (2L, 1L, None, None)))
  }
}
