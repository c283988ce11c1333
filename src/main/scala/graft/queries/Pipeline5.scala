package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** Round-3 additions, block 2: per-key EWMA (the sequential
  * recurrence no window frame expresses — q74) and vocabulary
  * coverage / OOV rate against a frequency-built top-V vocab (q75).
  */
object Pipeline5 {

  private val Alpha = 0.5 // EWMA smoothing; 1-α == α is exact in binary
  private val VocabV = 16

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-user EWMA of event values over time: one shuffle + secondary
    // sort + O(1)-state streaming fold (see operators/Ewma).
    "q74_ewma_per_user" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Ewma.ewma(ev, "user_id",
        unix_micros(col("ts")), col("event_id"), col("value"), Alpha)
        .select(col("user_id"), col("tb").as("event_id"), col("us"),
          col("v").as("value"), col("ewma"))
        .orderBy(col("event_id"))
    }),

    // Vocabulary coverage: build the top-V token vocab by corpus
    // frequency (count desc, token asc — deterministic at the cut),
    // then per-doc out-of-vocabulary token fraction. The vocab is
    // fixed-V small BY CONSTRUCTION, so it collects to the driver and
    // rides into a map-side kernel: token counting never reshuffles
    // the corpus (one shuffle total, for the frequency build).
    "q75_vocab_oov" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val docs = t(s, dir, "documents")
      val vocab = docs
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(VocabV)
        .select(col("tok")).as[String].collect().toSet
      val bc = spark.sparkContext.broadcast(vocab)
      docs.select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val v = bc.value
          it.map { case (id, text) =>
            val toks = if (text == null) Array.empty[String]
              else text.split(" ").filter(_.nonEmpty)
            val nt = toks.length.toLong
            var oov = 0L
            toks.foreach { tk => if (!v.contains(tk)) oov += 1 }
            val frac = if (nt == 0L) None else Some(oov.toDouble / nt.toDouble)
            (id, nt, oov, frac)
          }
        }
        .toDF("doc_id", "n_tokens", "n_oov", "oov_frac")
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // Prefix folds replayed per position (O(n²) per key — oracle-side
    // only); list_reduce on a 1-slice yields s_0 = v_0, matching the
    // kernel's first-row branch.
    "q74_ewma_per_user" ->
      """WITH b AS (
        |  SELECT user_id,
        |    list(value ORDER BY ts, event_id) AS vs,
        |    list(event_id ORDER BY ts, event_id) AS ids,
        |    list(epoch_us(ts) ORDER BY ts, event_id) AS uss
        |  FROM events GROUP BY user_id),
        |e AS (
        |  SELECT user_id,
        |    unnest(ids) AS event_id,
        |    unnest(uss) AS us,
        |    unnest(vs) AS value,
        |    unnest(list_transform(range(1, len(vs) + 1),
        |      i_ -> list_reduce(list_slice(vs, 1, i_),
        |              (a_, x_) -> 0.5 * x_ + 0.5 * a_))) AS ewma
        |  FROM b)
        |SELECT user_id, event_id, us, value, ewma
        |FROM e ORDER BY event_id""".stripMargin,

    "q75_vocab_oov" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |    t_ -> t_ <> '')) AS t
         |  FROM documents),
         |freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
         |vocab AS (SELECT t FROM freq ORDER BY c DESC, t LIMIT $VocabV),
         |per AS (
         |  SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(count(*) - count(v.t) AS BIGINT) AS n_oov
         |  FROM tok LEFT JOIN vocab v USING (t) GROUP BY tok.doc_id)
         |SELECT d.doc_id,
         |  COALESCE(per.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
         |  COALESCE(per.n_oov, CAST(0 AS BIGINT)) AS n_oov,
         |  CAST(per.n_oov AS DOUBLE) / CAST(per.n_tokens AS DOUBLE) AS oov_frac
         |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
         |ORDER BY d.doc_id""".stripMargin
  )
}
