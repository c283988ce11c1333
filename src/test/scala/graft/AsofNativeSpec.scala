package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin
import graft.plans.{AsofJoinExec, AsofJoinNative}

/** The native whole-operator as-of join (custom LogicalPlan +
  * SparkStrategy + SparkPlan): result parity with the composed
  * union-window operator, plan shape (one exchange per side, no more),
  * and the NULL-time contract. */
class AsofNativeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.expressions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.expressions.GraftExtensions.register(s)
    s
  }

  private val dir = "/root/testdata/sf0.001"

  private def eventsAsof(native: Boolean) = {
    val events = sources.Catalog.table(spark, dir, "events")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("event_id").as("signup_id"), col("value").as("signup_value"))
    val l = events.select("event_id", "user_id", "ts", "event_type")
    if (native)
      AsofJoinNative.backward(l, signups, key = Seq("user_id"), on = "ts",
        payload = Seq("signup_id", "signup_value"),
        rightTiebreak = Some(col("signup_id")))
    else
      AsofJoin.backward(l, signups, key = Seq("user_id"), on = "ts",
        payload = Seq("signup_id", "signup_value"),
        rightTiebreak = Some(col("signup_id")))
  }

  test("native == composed union-window operator on the events table") {
    val n = eventsAsof(native = true)
    val c = eventsAsof(native = false)
    assert(n.columns.toSeq === c.columns.toSeq)
    assert(n.count() === c.count())
    assert(n.exceptAll(c).count() === 0)
    assert(c.exceptAll(n).count() === 0)
  }

  // flatten an executed adaptive plan, descending into query stages
  private def nodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: nodes(q.plan)
    case _ => p +: p.children.flatMap(nodes)
  }

  test("plan: AsofJoinExec present, exactly one shuffle per side") {
    val df = eventsAsof(native = true)
    df.collect() // materialize so AQE finalizes the plan
    val exec = df.queryExecution.executedPlan
    val plan = exec match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val all = nodes(plan)
    val asof = all.collect { case e: AsofJoinExec => e }
    assert(asof.length === 1, s"expected AsofJoinExec in:\n$plan")
    // exactly one hash exchange per side — the tie-break rides the
    // demanded child sort, so NO dedup pre-pass exchange may appear
    val shuffles = all.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.length === 2,
      s"as-of must shuffle each side exactly once:\n$plan")
  }

  test("NULL-time contract: null left never matches, null right never matched") {
    import spark.implicits._
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, t("2024-01-01 00:00:05")),
      (2L, 1L, null.asInstanceOf[Timestamp]),
      (3L, 2L, t("2024-01-01 00:00:10"))
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("2024-01-01 00:00:01"), 10.0),
      (1L, null.asInstanceOf[Timestamp], 99.0),
      (2L, t("2024-01-01 00:00:10"), 20.0) // equal ts: <= matches
    ).toDF("k", "ts", "v")
    val r = AsofJoinNative.backward(left, right, key = Seq("k"), on = "ts",
      payload = Seq("v")).orderBy("id").collect()
    assert(r.map(x => Option(x.get(3))).toSeq ===
      Seq(Some(10.0), None, Some(20.0)))
  }

  test("bucketed-by-key sides as-of join with ZERO exchanges") {
    // the 100 TB feature-store shape: events and the feature table both
    // bucketed on the key — the native as-of needs no shuffle at all,
    // only the demanded in-partition sorts
    val stage = java.nio.file.Files
      .createTempDirectory("graft_asof_bkt_").toString
    val eTab = "graft_spec_asof_events"
    val sTab = "graft_spec_asof_signups"
    try {
      val events = sources.Catalog.table(spark, dir, "events")
      events.select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .bucketBy(8, "user_id").sortBy("user_id", "ts")
        .option("path", s"$stage/events").saveAsTable(eTab)
      events.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"),
          col("event_id").as("signup_id"), col("value").as("signup_value"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .bucketBy(8, "user_id").sortBy("user_id", "ts")
        .option("path", s"$stage/signups").saveAsTable(sTab)

      val j = AsofJoinNative.backward(
        spark.table(eTab), spark.table(sTab),
        key = Seq("user_id"), on = "ts",
        payload = Seq("signup_id", "signup_value"),
        rightTiebreak = Some(col("signup_id")))
      j.collect()
      val exec = j.queryExecution.executedPlan
      val plan = exec match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val all = nodes(plan)
      assert(all.collect { case e: AsofJoinExec => e }.length === 1)
      val shuffles = all.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"bucketed as-of must not shuffle:\n$plan")
      // and still the same answer as the shuffling composed form
      val c = eventsAsof(native = false)
      assert(j.count() === c.count())
      assert(j.exceptAll(c).count() === 0)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $eTab")
      spark.sql(s"DROP TABLE IF EXISTS $sTab")
      val d = new java.io.File(stage)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(d)
    }
  }

  test("downstream window reuses the as-of's partitioning AND ordering") {
    // outputPartitioning = hash(user_id), outputOrdering = (user_id, ts)
    // are declared by the exec — a window over the same clustering must
    // add NO exchange and NO sort beyond the two the as-of demanded
    val j = eventsAsof(native = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val out = j.withColumn("rn", row_number().over(w))
    out.collect()
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val all = nodes(plan)
    assert(all.collect { case e: AsofJoinExec => e }.length === 1)
    assert(all.collect { case e: ShuffleExchangeLike => e }.length === 2,
      s"window must reuse the as-of clustering:\n$plan")
    val sorts = all.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.length === 2,
      s"window must reuse the as-of output ordering (2 child sorts only):\n$plan")
  }

  test("equal-(key,on) right rows: max tiebreak wins; composite keys work") {
    import spark.implicits._
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, "a", t("2024-01-01 00:00:05")),
      (2L, 1L, "b", t("2024-01-01 00:00:05"))
    ).toDF("id", "k1", "k2", "ts")
    val right = Seq(
      (1L, "a", t("2024-01-01 00:00:03"), 7L, 1.0),
      (1L, "a", t("2024-01-01 00:00:03"), 9L, 2.0), // same (key, ts): id 9 wins
      (1L, "a", t("2024-01-01 00:00:03"), 8L, 3.0),
      (1L, "b", t("2024-01-01 00:00:03"), 5L, 4.0)
    ).toDF("k1", "k2", "ts", "rid", "v")
    val n = AsofJoinNative.backward(left, right, key = Seq("k1", "k2"),
      on = "ts", payload = Seq("rid", "v"),
      rightTiebreak = Some(col("rid"))).orderBy("id").collect()
    assert(n.map(r => (r.getAs[Long]("asof_rid"), r.getAs[Double]("asof_v")))
      .toSeq === Seq((9L, 2.0), (5L, 4.0)))
    // and the composed operator picks the identical winner
    val c = AsofJoin.backward(left, right, key = Seq("k1", "k2"),
      on = "ts", payload = Seq("rid", "v"),
      rightTiebreak = Some(col("rid"))).orderBy("id").collect()
    assert(c.map(r => (r.getAs[Long]("asof_rid"), r.getAs[Double]("asof_v")))
      .toSeq === Seq((9L, 2.0), (5L, 4.0)))
  }

  test("tolerance boundary: exactly-at-tolerance matches, one micro past is null") {
    import spark.implicits._
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, t("2024-01-01 00:00:10")), // right at :05 → lag 5s
      (2L, 2L, t("2024-01-01 00:00:10"))
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("2024-01-01 00:00:05"), 1.0),
      (2L, t("2024-01-01 00:00:05"), 2.0)
    ).toDF("k", "ts", "v")
    def run(tolUs: Long) = AsofJoinNative.backward(left, right,
      key = Seq("k"), on = "ts", payload = Seq("v"),
      toleranceMicros = Some(tolUs)).orderBy("id").collect()
      .map(x => Option(x.get(3))).toSeq
    assert(run(5000000L) === Seq(Some(1.0), Some(2.0)))   // == tol
    assert(run(4999999L) === Seq(None, None))             // one micro short
  }

  test("forward direction: earliest-at-or-after wins; tolerance bounds ahead") {
    import spark.implicits._
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, t("2024-01-01 00:00:00")), // rights at :02/:06 → :02 wins
      (2L, 1L, t("2024-01-01 00:00:02")), // equal ts matches (:02)
      (3L, 1L, t("2024-01-01 00:00:03")), // next is :06
      (4L, 1L, t("2024-01-01 00:00:07")), // nothing ahead → null
      (5L, 2L, t("2024-01-01 00:00:00")) // key with no right rows
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("2024-01-01 00:00:02"), 1.0),
      (1L, t("2024-01-01 00:00:02"), 1.5), // tie: max payload wins
      (1L, t("2024-01-01 00:00:06"), 2.0)
    ).toDF("k", "ts", "v")
    def run(tolUs: Option[Long]) = AsofJoinNative.backward(left, right,
      key = Seq("k"), on = "ts", payload = Seq("v"),
      toleranceMicros = tolUs, direction = "forward").orderBy("id").collect()
      .map(x => Option(x.get(3))).toSeq
    assert(run(None) ===
      Seq(Some(1.5), Some(1.5), Some(2.0), None, None))
    // 2s look-AHEAD: id 1 (:00→:02) in, id 3 (:03→:06) out
    assert(run(Some(2000000L)) ===
      Seq(Some(1.5), Some(1.5), None, None, None))
  }

  test("nearest direction: closer side wins, exact tie prefers backward") {
    import spark.implicits._
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, t("2024-01-01 00:00:04")), // :02 behind (2s) vs :10 ahead (6s) → behind
      (2L, 1L, t("2024-01-01 00:00:09")), // :02 behind (7s) vs :10 ahead (1s) → ahead
      (3L, 1L, t("2024-01-01 00:00:06")), // 4s both ways → tie → backward
      (4L, 1L, t("2024-01-01 00:00:00")), // before first → forward only
      (5L, 1L, t("2024-01-01 00:00:20")), // after last → backward only
      (6L, 2L, t("2024-01-01 00:00:00")) // no right rows at all
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("2024-01-01 00:00:02"), 1.0),
      (1L, t("2024-01-01 00:00:10"), 2.0)
    ).toDF("k", "ts", "v")
    val got = AsofJoinNative.backward(left, right, key = Seq("k"),
      on = "ts", payload = Seq("v"), direction = "nearest")
      .orderBy("id").collect().map(x => Option(x.get(3))).toSeq
    assert(got === Seq(Some(1.0), Some(2.0), Some(1.0), Some(1.0),
      Some(2.0), None))
    // tolerance bounds BOTH directions: 3s window keeps only rows
    // within 3s of a purchase
    val tol = AsofJoinNative.backward(left, right, key = Seq("k"),
      on = "ts", payload = Seq("v"), direction = "nearest",
      toleranceMicros = Some(3000000L))
      .orderBy("id").collect().map(x => Option(x.get(3))).toSeq
    assert(tol === Seq(Some(1.0), Some(2.0), None, Some(1.0), None, None))
  }

  test("real data: nearest's pick is always one of backward/forward picks") {
    val events = sources.Catalog.table(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("pid"), col("value").as("pv"))
    val l = events.select("event_id", "user_id", "ts")
    def run(d: String) = AsofJoinNative.backward(l, purchases,
      key = Seq("user_id"), on = "ts", payload = Seq("pid"),
      rightTiebreak = Some(col("pid")), direction = d)
      .select(col("event_id"), col("asof_pid").as(s"pid_$d"))
    val j = run("nearest")
      .join(run("backward"), "event_id").join(run("forward"), "event_id")
    assert(j.count() === events.count())
    // nearest == backward OR nearest == forward on every row (NULL
    // nearest only where both are NULL)
    val bad = j.filter(!(
      col("pid_nearest") <=> col("pid_backward") ||
        col("pid_nearest") <=> col("pid_forward")))
    assert(bad.count() === 0)
    // and nearest is NULL exactly where both directions are NULL
    assert(j.filter(col("pid_nearest").isNull &&
      (col("pid_backward").isNotNull || col("pid_forward").isNotNull))
      .count() === 0)
  }

  test("strict backward: equal-timestamp row excluded, strictly-earlier wins") {
    import spark.implicits._
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, t("2024-01-01 00:00:02")), // only :02 at-or-before → null
      (2L, 1L, t("2024-01-01 00:00:03")), // strict: :02, not :03
      (3L, 1L, t("2024-01-01 00:00:05")), // strict: :03, not :05
      (4L, 1L, t("2024-01-01 00:00:05")), // duplicate left time: same
      (5L, 1L, t("2024-01-01 00:00:06"))  // :05 now strictly earlier
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("2024-01-01 00:00:02"), 1.0),
      (1L, t("2024-01-01 00:00:03"), 2.0),
      (1L, t("2024-01-01 00:00:05"), 3.0)
    ).toDF("k", "ts", "v")
    def run(exact: Boolean) = AsofJoinNative.backward(left, right,
      key = Seq("k"), on = "ts", payload = Seq("v"),
      allowExactMatches = exact).orderBy("id").collect()
      .map(x => Option(x.get(3))).toSeq
    assert(run(false) ===
      Seq(None, Some(1.0), Some(2.0), Some(2.0), Some(3.0)))
    // and the default is unchanged
    assert(run(true) ===
      Seq(Some(1.0), Some(2.0), Some(3.0), Some(3.0), Some(3.0)))
  }

  test("strict forward: equal-timestamp row excluded, next-later wins") {
    import spark.implicits._
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, t("2024-01-01 00:00:01")), // :02 is strictly after
      (2L, 1L, t("2024-01-01 00:00:02")), // strict skips :02 → :05
      (3L, 1L, t("2024-01-01 00:00:05"))  // nothing strictly after → null
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("2024-01-01 00:00:02"), 1.0),
      (1L, t("2024-01-01 00:00:05"), 2.0)
    ).toDF("k", "ts", "v")
    val got = AsofJoinNative.backward(left, right, key = Seq("k"),
      on = "ts", payload = Seq("v"), direction = "forward",
      allowExactMatches = false).orderBy("id").collect()
      .map(x => Option(x.get(3))).toSeq
    assert(got === Seq(Some(1.0), Some(2.0), None))
  }

  test("strict nearest: exact row neither masks the forward side nor poisons backward") {
    import spark.implicits._
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, t("2024-01-01 00:00:04")), // forward-only: :05 (1s)
      (2L, 1L, t("2024-01-01 00:00:10")), // :10 excluded; :05 (5s back) vs :12 (2s ahead) → :12
      (3L, 1L, t("2024-01-01 00:00:11")), // the :10 row RE-ENTERS as backward (1s) vs :12 (1s) → tie → backward
      (4L, 1L, t("2024-01-01 00:00:20"))  // :12 (8s back)
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("2024-01-01 00:00:05"), 1.0),
      (1L, t("2024-01-01 00:00:10"), 2.0),
      (1L, t("2024-01-01 00:00:12"), 3.0)
    ).toDF("k", "ts", "v")
    def run(tolUs: Option[Long]) = AsofJoinNative.backward(left, right,
      key = Seq("k"), on = "ts", payload = Seq("v"),
      direction = "nearest", toleranceMicros = tolUs,
      allowExactMatches = false).orderBy("id").collect()
      .map(x => Option(x.get(3))).toSeq
    assert(run(None) === Seq(Some(1.0), Some(3.0), Some(2.0), Some(3.0)))
    // strict + tolerance compose: 1.5s window
    assert(run(Some(1500000L)) === Seq(Some(1.0), None, Some(2.0), None))
  }

  test("strict ≡ shift law on real data: strict(ts) == default(ts∓1µs)") {
    // on integer-micro timestamps, on < L ⟺ on <= L-1µs and
    // on > L ⟺ on >= L+1µs — so strict mode must equal the default
    // mode run with the left clock nudged one microsecond, on every
    // row of the real events table, in both directions
    val events = sources.Catalog.table(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("pid"), col("value").as("pv"))
    val l = events.select("event_id", "user_id", "ts")
    for ((d, shiftUs) <- Seq(("backward", -1L), ("forward", 1L))) {
      val strict = AsofJoinNative.backward(l, purchases,
        key = Seq("user_id"), on = "ts", payload = Seq("pid"),
        rightTiebreak = Some(col("pid")), direction = d,
        allowExactMatches = false)
        .select(col("event_id"), col("asof_pid"))
      val shifted = AsofJoinNative.backward(
        l.withColumn("ts", timestamp_micros(
          unix_micros(col("ts")) + lit(shiftUs))),
        purchases, key = Seq("user_id"), on = "ts", payload = Seq("pid"),
        rightTiebreak = Some(col("pid")), direction = d)
        .select(col("event_id"), col("asof_pid"))
      assert(strict.exceptAll(shifted).count() === 0, s"direction=$d")
      assert(shifted.exceptAll(strict).count() === 0, s"direction=$d")
    }
  }

  test("salted pre-split on a planted hot key is row-identical to the unsalted join") {
    // the documented AQE caveat: OptimizeSkewedJoin cannot split a
    // custom exec, so the hot key needs the explicit salt path. Plant
    // ~75% of left rows on ONE user (the SkewJoinSpec recipe) and pin
    // multiset equality across all three directions and strict mode.
    val events = sources.Catalog.table(spark, dir, "events")
    val hotId = 42L
    val skewedLeft = events.select("event_id", "user_id", "ts")
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(4)) < 3, lit(hotId))
          .otherwise(col("user_id")))
    val skewedRight = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("pid"), col("value").as("pv"))
      .withColumn("user_id",
        when(pmod(col("pid"), lit(4)) < 3, lit(hotId))
          .otherwise(col("user_id")))
    for ((d, exact) <- Seq(("backward", true), ("forward", true),
        ("nearest", true), ("backward", false))) {
      val plain = AsofJoinNative.backward(skewedLeft, skewedRight,
        key = Seq("user_id"), on = "ts", payload = Seq("pid", "pv"),
        rightTiebreak = Some(col("pid")), direction = d,
        allowExactMatches = exact)
      val salted = AsofJoinNative.saltedBackward(skewedLeft, skewedRight,
        key = Seq("user_id"), on = "ts", payload = Seq("pid", "pv"),
        rightTiebreak = Some(col("pid")), direction = d,
        allowExactMatches = exact, nSalts = 8,
        // ~750 of 1000 left rows land on the planted key at sf0.001;
        // every organic key carries ~17 — only the plant goes hot
        hotThreshold = 400L)
      assert(salted.count() === plain.count(), s"d=$d exact=$exact")
      assert(salted.exceptAll(plain).count() === 0, s"d=$d exact=$exact")
      assert(plain.exceptAll(salted).count() === 0, s"d=$d exact=$exact")
    }
    // and when nothing crosses the threshold the salted path IS the
    // plain path (cold branch only — still row-identical)
    val allCold = AsofJoinNative.saltedBackward(skewedLeft, skewedRight,
      key = Seq("user_id"), on = "ts", payload = Seq("pid", "pv"),
      rightTiebreak = Some(col("pid")), hotThreshold = Long.MaxValue)
    val plainB = AsofJoinNative.backward(skewedLeft, skewedRight,
      key = Seq("user_id"), on = "ts", payload = Seq("pid", "pv"),
      rightTiebreak = Some(col("pid")))
    assert(allCold.exceptAll(plainB).count() === 0)
    assert(plainB.exceptAll(allCold).count() === 0)
  }

  test("unmatched-before-first and latest-wins semantics") {
    import spark.implicits._
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, t("2024-01-01 00:00:00")), // before any right row
      (2L, 1L, t("2024-01-01 00:00:07")), // after two right rows: latest wins
      (3L, 3L, t("2024-01-01 00:00:07")) // key with no right rows at all
    ).toDF("id", "k", "ts")
    val right = Seq(
      (1L, t("2024-01-01 00:00:02"), 1.0),
      (1L, t("2024-01-01 00:00:06"), 2.0)
    ).toDF("k", "ts", "v")
    val r = AsofJoinNative.backward(left, right, key = Seq("k"), on = "ts",
      payload = Seq("v")).orderBy("id").collect()
    assert(r.map(x => Option(x.get(3))).toSeq ===
      Seq(None, Some(2.0), None))
  }

  test("key/on type mismatch between sides fails LOUDLY, never compares") {
    import spark.implicits._
    def t(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq((1L, t("2024-01-01 00:00:05")))
      .toDF("k", "ts") // k: LONG
    val rightIntKey = Seq((1, t("2024-01-01 00:00:02"), 1.0))
      .toDF("k", "ts", "v") // k: INT — different UnsafeRow layout
    val eKey = intercept[IllegalArgumentException] {
      AsofJoinNative.backward(left, rightIntKey, key = Seq("k"),
        on = "ts", payload = Seq("v"))
    }
    assert(eKey.getMessage.contains("type mismatch"))
    val rightLongOn = Seq((1L, 2L, 1.0)).toDF("k", "ts", "v") // ts: LONG
    val eOn = intercept[IllegalArgumentException] {
      AsofJoinNative.backward(left, rightLongOn, key = Seq("k"),
        on = "ts", payload = Seq("v"))
    }
    assert(eOn.getMessage.contains("type mismatch"))
  }
}
