package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** Event-log analytics block (q78–q80): robust per-key outlier
  * flagging (median/MAD), ordered funnel progression, and retention
  * cohorts — the product-analytics shapes a warehouse engine must
  * cover beyond plain windows.
  *
  * Parity discipline: discrete (lower) medians only (q39's rule —
  * interpolated quantiles never hash-match across engines), timestamps
  * as epoch microseconds, day buckets via exact integer division.
  */
object EventAnalytics {

  private val MadK = 2.0 // outlier threshold: dev > 2·MAD
  private val DayUs = 86400000000L

  private def ev(s: SparkSession, dir: String): DataFrame =
    Catalog.table(s, dir, "events")

  /** Discrete lower median of `valueCol` per key: rn == (cnt+1) div 2
    * under (value, tiebreak) order — q39's pattern, keyed.
    *
    * NO forced broadcast hint on the per-key count relation: it has
    * one row per key, so it grows linearly with |keys| — at web scale
    * a forced hint would override autoBroadcastJoinThreshold and OOM
    * the build side. AQE sees its true post-aggregation size and
    * broadcasts it only while it actually fits (fallback pinned by
    * EventAnalyticsSpec's broadcast-disabled law). */
  private def keyedMedian(df: DataFrame, key: String, valueCol: String,
      tiebreak: String, out: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(valueCol), col(tiebreak))
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    df.select(col(key), col(valueCol), col(tiebreak))
      .withColumn("rn", row_number().over(w))
      .join(counts, Seq(key))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col(key), col(valueCol).as(out))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Robust outliers: |v − median| > 2·MAD, both medians discrete.
    // Scale shape: two window shuffles on user_id + per-user median
    // joins — no global sort, no collect. The median relations have
    // one row per user, i.e. they grow with |users|: no forced
    // broadcast hint (round-5 curation-dict lesson — a hint OOMs the
    // build side at 100×); all joins share the user_id key so they
    // co-locate with the window shuffles, and AQE still broadcasts
    // whichever side is genuinely small at runtime.
    "q78_mad_outliers" -> ((s, dir) => {
      val e = ev(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      val med = keyedMedian(e, "user_id", "value", "event_id", "med")
      val withDev = e.join(med, "user_id")
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = keyedMedian(
        withDev.select(col("user_id"), col("dev"), col("event_id")),
        "user_id", "dev", "event_id", "mad")
      withDev.join(mad, "user_id")
        .filter(col("dev") > lit(MadK) * col("mad"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("med"), col("mad"), col("dev"))
        .orderBy(col("event_id"))
    }),

    // Ordered funnel signup → view → purchase: each stage's timestamp
    // is the EARLIEST strictly after the previous stage. Three
    // filtered min-aggregations + equi-joins on the per-user stage
    // relations; the event log is scanned, never re-shuffled whole.
    // The stage relations have one row per user — unbounded — so no
    // forced broadcast hint: every join keys on user_id, co-locating
    // with the stage aggregations' own shuffles, and AQE broadcasts
    // at runtime only when a side truly fits.
    "q79_funnel" -> ((s, dir) => {
      val e = ev(s, dir).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val su = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("us")).as("t_signup_us"))
      val vw = e.filter(col("event_type") === "view")
        .join(su, "user_id")
        .filter(col("us") > col("t_signup_us"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t_view_us"))
      val pu = e.filter(col("event_type") === "purchase")
        .join(vw, "user_id")
        .filter(col("us") > col("t_view_us"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t_purchase_us"))
      su.join(vw, Seq("user_id"), "left")
        .join(pu, Seq("user_id"), "left")
        .select(col("user_id"), col("t_signup_us"), col("t_view_us"),
          col("t_purchase_us"),
          (lit(1) +
            when(col("t_view_us").isNotNull, 1).otherwise(0) +
            when(col("t_purchase_us").isNotNull, 1).otherwise(0))
            .cast("int").as("stage"))
        .orderBy(col("user_id"))
    }),

    // Retention cohorts: cohort = first-activity day, cell = distinct
    // users from that cohort active at each day offset. Day buckets
    // by exact integer division of epoch-micros (no timezone/calendar
    // dependence to diverge across engines).
    // Lag-k AUTOCORRELATION per user — the seasonality/trend detector
    // of a monitoring pipeline: Pearson r between each user's value
    // sequence and its k-shifted self (k = 1, 2), computed from EXACT
    // integer moments (cents) with one identically-shaped double
    // expression at the end (IEEE correctly-rounded ÷ and sqrt — both
    // engines produce the same bits). Scale shape: ONE window shuffle
    // on user_id feeding both lags, then a same-key groupBy — the
    // window and the aggregate co-locate, nothing else moves.
    "q176_acf_per_user" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = ev(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          (col("value").cast("decimal(12,2)") * 100).cast("long")
            .as("vc"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val lagged = base
        .withColumn("lead_1", lead(col("vc"), 1).over(w))
        .withColumn("lead_2", lead(col("vc"), 2).over(w))
      val aggs = acfCols(1) ++ acfCols(2)
      lagged.groupBy(col("user_id"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("user_id"), col("n_1"), col("num_1"),
          acfRatio(1).as("acf_1"), col("n_2"), col("num_2"),
          acfRatio(2).as("acf_2"))
        .orderBy(col("user_id"))
    }),

    "q80_retention_cohorts" -> ((s, dir) => {
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division (q39's
      // lesson), and epoch-micros near 2^53 would round
      val e = ev(s, dir).select(col("user_id"),
        expr(s"unix_micros(ts) div $DayUs").as("day"))
      // cohort is one row per user — unbounded, so no forced broadcast
      // (AQE decides); the join keys on user_id like the agg before it.
      val cohort = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      e.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .distinct()
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    })
  )

  /** q176 shared arithmetic: Pearson autocorrelation at lag k from
    * EXACT integer moments (value in cents), with one final
    * IEEE-correctly-rounded double expression both engines evaluate
    * with the identical tree — the repo's fixed-point discipline
    * extended to a ratio statistic. */
  private def acfCols(k: Int): Seq[org.apache.spark.sql.Column] = {
    val x = col("vc"); val y = col(s"lead_$k")
    val n = sum(when(y.isNotNull, 1L).otherwise(0L))
    def s1(c: org.apache.spark.sql.Column) =
      sum(when(y.isNotNull, c).otherwise(0L))
    val (sx, sy) = (s1(x), s1(y))
    val (sxx, syy, sxy) = (s1(x * x), s1(y * y), s1(x * y))
    val num = n * sxy - sx * sy
    val d1 = n * sxx - sx * sx
    val d2 = n * syy - sy * sy
    // range: cents ≤ ~5e4 (fixture values < 500), so n·Σx² stays
    // under 2^63 through ~1e5 events per user — far past x100
    Seq(n.as(s"n_$k"), num.as(s"num_$k"),
      d1.as(s"d1_$k"), d2.as(s"d2_$k"))
  }

  private def acfRatio(k: Int): org.apache.spark.sql.Column =
    when(col(s"d1_$k") > 0L && col(s"d2_$k") > 0L,
      col(s"num_$k").cast("double") /
        (sqrt(col(s"d1_$k").cast("double")) *
          sqrt(col(s"d2_$k").cast("double"))))
      .otherwise(lit(null))

  private def acfSql(k: Int): String = {
    def s1(c: String) =
      s"CAST(SUM(CASE WHEN lead_$k IS NOT NULL THEN $c ELSE 0 END) AS BIGINT)"
    s"""CAST(SUM(CASE WHEN lead_$k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_$k,
       |  CAST(${s1("1")} * ${s1(s"vc * lead_$k")} -
       |    ${s1("vc")} * ${s1(s"lead_$k")} AS BIGINT) AS num_$k,
       |  CAST(${s1("1")} * ${s1("vc * vc")} -
       |    ${s1("vc")} * ${s1("vc")} AS BIGINT) AS d1_$k,
       |  CAST(${s1("1")} * ${s1(s"lead_$k * lead_$k")} -
       |    ${s1(s"lead_$k")} * ${s1(s"lead_$k")} AS BIGINT) AS d2_$k""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q176_acf_per_user" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
         |  FROM events),
         |l AS (SELECT user_id, vc,
         |    lead(vc, 1) OVER w AS lead_1, lead(vc, 2) OVER w AS lead_2
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |a AS (SELECT user_id, ${acfSql(1)},
         |  ${acfSql(2)}
         |  FROM l GROUP BY user_id)
         |SELECT user_id, n_1, num_1,
         |  CASE WHEN d1_1 > 0 AND d2_1 > 0 THEN CAST(num_1 AS DOUBLE) /
         |    (sqrt(CAST(d1_1 AS DOUBLE)) * sqrt(CAST(d2_1 AS DOUBLE)))
         |  END AS acf_1,
         |  n_2, num_2,
         |  CASE WHEN d1_2 > 0 AND d2_2 > 0 THEN CAST(num_2 AS DOUBLE) /
         |    (sqrt(CAST(d1_2 AS DOUBLE)) * sqrt(CAST(d2_2 AS DOUBLE)))
         |  END AS acf_2
         |FROM a
         |ORDER BY user_id""".stripMargin,

    "q78_mad_outliers" ->
      s"""WITH m AS (
         |  SELECT user_id, value AS med FROM (
         |    SELECT user_id, value,
         |      ROW_NUMBER() OVER (PARTITION BY user_id
         |        ORDER BY value, event_id) AS rn,
         |      COUNT(*) OVER (PARTITION BY user_id) AS cnt
         |    FROM events) WHERE rn = (cnt + 1) // 2),
         |d AS (
         |  SELECT e.event_id, e.user_id, e.value, m.med,
         |    abs(e.value - m.med) AS dev
         |  FROM events e JOIN m USING (user_id)),
         |md AS (
         |  SELECT user_id, dev AS mad FROM (
         |    SELECT user_id, dev, event_id,
         |      ROW_NUMBER() OVER (PARTITION BY user_id
         |        ORDER BY dev, event_id) AS rn,
         |      COUNT(*) OVER (PARTITION BY user_id) AS cnt
         |    FROM d) WHERE rn = (cnt + 1) // 2)
         |SELECT d.event_id, d.user_id, d.value, d.med, md.mad, d.dev
         |FROM d JOIN md USING (user_id)
         |WHERE d.dev > $MadK * md.mad
         |ORDER BY d.event_id""".stripMargin,

    "q79_funnel" ->
      """WITH su AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t_signup_us
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |vw AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_view_us
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'view' AND epoch_us(e.ts) > su.t_signup_us
        |  GROUP BY e.user_id),
        |pu AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase_us
        |  FROM events e JOIN vw ON e.user_id = vw.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > vw.t_view_us
        |  GROUP BY e.user_id)
        |SELECT su.user_id, su.t_signup_us, vw.t_view_us, pu.t_purchase_us,
        |  CAST(1 + CASE WHEN vw.t_view_us IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN pu.t_purchase_us IS NOT NULL THEN 1 ELSE 0 END
        |    AS INT) AS stage
        |FROM su
        |LEFT JOIN vw ON su.user_id = vw.user_id
        |LEFT JOIN pu ON su.user_id = pu.user_id
        |ORDER BY su.user_id""".stripMargin,

    "q80_retention_cohorts" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) // $DayUs AS day FROM events),
         |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
         |x AS (
         |  SELECT DISTINCT e.user_id, c.cohort_day,
         |    e.day - c.cohort_day AS day_offset
         |  FROM e JOIN c ON e.user_id = c.user_id)
         |SELECT cohort_day, day_offset, count(*) AS n_users
         |FROM x GROUP BY cohort_day, day_offset
         |ORDER BY cohort_day, day_offset""".stripMargin
  )
}
