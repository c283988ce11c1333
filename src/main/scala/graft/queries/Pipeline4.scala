package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{HeavyHitters, Repair, Scd2}
import graft.sources.Catalog

/** Round-3 additions past the training-pipeline set: warehouse
  * dimension maintenance (SCD2), exact distributed heavy hitters
  * (Misra–Gries candidates + exact verify), and keyed gap repair
  * (forward/backward fill) — all oracle-checked.
  */
object Pipeline4 {

  // heavy hitters: tokens with global frequency >= 1/30 of all tokens;
  // MG capacity 64 satisfies capacity+1 >= 30 with slack
  private val HhNumer = 1L
  private val HhDenom = 30L
  private val HhCapacity = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SCD Type 2 build from the event log: each user's event_type
    // timeline collapsed to versioned validity intervals. One shuffle
    // on the key, per-key windows — no history self-join.
    "q59_scd2_dimension" -> ((s, dir) => {
      val ev = Catalog.table(s, dir, "events")
      Scd2.fromHistory(ev, "user_id",
          Seq(col("ts"), col("event_id")), Seq("event_type"))
        .withColumn("valid_from_us", unix_micros(col("valid_from")))
        .withColumn("valid_to_us", unix_micros(col("valid_to")))
        .drop("valid_from", "valid_to")
        .orderBy(col("user_id"), col("version"))
    }),

    // Exact heavy hitters over the document token stream: per-partition
    // Misra-Gries candidate generation (map-side, superset-guaranteed),
    // then exact recount of candidates only.
    "q60_heavy_hitters" -> ((s, dir) => {
      val toks = Catalog.table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      HeavyHitters.frequentItems(toks, "tok", HhNumer, HhDenom,
          HhCapacity)
        .withColumnRenamed("item", "tok")
        .orderBy(col("tok"))
    }),

    // Keyed gap repair: value is only observed on purchase events;
    // forward/backward fill per user ordered by (ts, event_id).
    "q61_gap_fill" -> ((s, dir) => {
      val ev = Catalog.table(s, dir, "events")
        .withColumn("v",
          when(col("event_type") === "purchase", col("value")))
      Repair.fillGaps(ev, "user_id", Seq(col("ts"), col("event_id")), "v")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("v"),
          col("v_ffill"), col("v_bfill"))
        .orderBy(col("event_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q59_scd2_dimension" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    LAG(event_type) OVER w AS prev,
        |    ROW_NUMBER() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |chg AS (
        |  SELECT user_id, ts, event_id, event_type
        |  FROM o WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        |v AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER w2 AS version,
        |    epoch_us(ts) AS valid_from_us,
        |    LEAD(epoch_us(ts)) OVER w2 AS valid_to_us
        |  FROM chg
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(version AS INT) AS version, event_type,
        |  valid_to_us IS NULL AS is_current, valid_from_us, valid_to_us
        |FROM v ORDER BY user_id, version""".stripMargin,

    "q60_heavy_hitters" ->
      s"""WITH t AS (
         |  SELECT unnest(list_filter(string_split(text, ' '),
         |    t_ -> t_ <> '')) AS tok
         |  FROM documents)
         |SELECT tok, COUNT(*) AS cnt FROM t
         |GROUP BY tok
         |HAVING COUNT(*) * $HhDenom >= (SELECT COUNT(*) FROM t) * $HhNumer
         |ORDER BY tok""".stripMargin,

    "q61_gap_fill" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'purchase' THEN value END AS v
        |  FROM events)
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us, v,
        |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
        |  FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_bfill
        |FROM e ORDER BY event_id""".stripMargin
  )
}
