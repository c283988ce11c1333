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
  private val MinShared = 190 // co-trade edge threshold (shared customers)

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
    }),

    // Label-centroid cosine matrix over the embeddings: per-label
    // elementwise centroid SUMS in exact fixed-point (q20's 1e7
    // discipline — scale cancels in cosine, so sums stand in for
    // means), then the 10×10 upper-triangle pairwise cosine. Scale
    // shape: one shuffle on (label, dim) builds centroids; everything
    // after runs on labels×dims rows — constant-sized however large
    // the corpus grows.
    "q76_label_centroid_cos" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val fp = e.select(col("label"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("label"), col("pos"),
          floor(col("x").cast("double") * 1e7).cast("long").as("v"))
      val cents = fp.groupBy(col("label"), col("pos"))
        .agg(sum(col("v")).as("sv"))
      val n = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
      // decimal(12,0) elements → exact products/sums at any magnitude
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(12,0)")
      val n2 = cents.groupBy(col("label"))
        .agg(sum(dec(col("sv")) * dec(col("sv"))).cast("double").as("n2"))
      val a = cents.select(col("label").as("label_a"), col("pos"),
        col("sv").as("va"))
      val b = cents.select(col("label").as("label_b"), col("pos"),
        col("sv").as("vb"))
      val dots = a.join(b, "pos")
        .filter(col("label_a") < col("label_b"))
        .groupBy(col("label_a"), col("label_b"))
        .agg(sum(dec(col("va")) * dec(col("vb"))).cast("double").as("dot"))
      dots
        .join(n.select(col("label").as("label_a"), col("n").as("n_a")), "label_a")
        .join(n.select(col("label").as("label_b"), col("n").as("n_b")), "label_b")
        .join(n2.select(col("label").as("label_a"), col("n2").as("n2_a")), "label_a")
        .join(n2.select(col("label").as("label_b"), col("n2").as("n2_b")), "label_b")
        .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
          (col("dot") / (sqrt(col("n2_a")) * sqrt(col("n2_b"))))
            .as("centroid_cos"))
        .orderBy(col("label_a"), col("label_b"))
    }),

    // Triangle participation counts on the thresholded supplier
    // co-trade graph (edge a<b iff ≥ MinShared distinct customers buy
    // from both): the classic oriented-edge 3-way join — orientation
    // (a<b<c) counts each triangle once and caps the join fan-out.
    // Scale shape: the customer→supplier projection is the guarded
    // step — built on the skew-hardened [[graft.operators.CoOccur]]
    // (exact degree prefilter + salted blocked self-join, so a hub
    // customer's degree² fan-out spreads over `buckets` tasks instead
    // of one straggler); the w-threshold keeps the edge relation
    // sparse, and the triple join runs on edges only — suppliers grow
    // far slower than facts.
    "q77_triangle_count" -> ((s, dir) => {
      val pairs = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = graft.operators.CoOccur
        .edges(pairs, "ck", "sk", MinShared)
        .select(col("sk_a").as("sa"), col("sk_b").as("sb"))
        .persist()
      val tri = edges.toDF("a", "b")
        .join(edges.toDF("b", "c"), "b")
        .join(edges.toDF("a", "c"), Seq("a", "c"))
      val out = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("s_key"))
        .groupBy(col("s_key")).agg(count(lit(1)).as("n_triangles"))
        .orderBy(col("s_key"))
      val pinned = out.localCheckpoint(true)
      edges.unpersist()
      pinned.orderBy(col("s_key"))
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
         |ORDER BY d.doc_id""".stripMargin,

    // Same 1e7 fixed-point lattice as q20's embeddings oracle; decimal
    // products keep every sum exact, cosine is the one double step and
    // its expression shape is identical on both engines. The exact
    // sums route DECIMAL→VARCHAR→DOUBLE: DuckDB's direct
    // DECIMAL→DOUBLE cast is 1 ULP off correctly-rounded once values
    // pass 2^53 (bit at x10: dot ≈ 1e17), while Spark's
    // BigDecimal.doubleValue — and DuckDB's string parse — round to
    // nearest correctly.
    "q76_label_centroid_cos" ->
      """WITH f AS (
        |  SELECT label, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000000.0) AS BIGINT) AS v
        |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        |c AS (SELECT label, i, CAST(SUM(v) AS BIGINT) AS sv
        |      FROM f GROUP BY label, i),
        |n AS (SELECT label, CAST(count(*) AS BIGINT) AS n
        |      FROM embeddings GROUP BY label),
        |n2 AS (SELECT label,
        |    CAST(CAST(SUM(CAST(sv AS DECIMAL(12,0)) * CAST(sv AS DECIMAL(12,0))) AS VARCHAR) AS DOUBLE) AS n2
        |  FROM c GROUP BY label),
        |d AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |    CAST(CAST(SUM(CAST(a.sv AS DECIMAL(12,0)) * CAST(b.sv AS DECIMAL(12,0))) AS VARCHAR) AS DOUBLE) AS dot
        |  FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT d.label_a, d.label_b, na.n AS n_a, nb.n AS n_b,
        |  d.dot / (sqrt(n2a.n2) * sqrt(n2b.n2)) AS centroid_cos
        |FROM d
        |JOIN n na ON d.label_a = na.label
        |JOIN n nb ON d.label_b = nb.label
        |JOIN n2 n2a ON d.label_a = n2a.label
        |JOIN n2 n2b ON d.label_b = n2b.label
        |ORDER BY label_a, label_b""".stripMargin,

    "q77_triangle_count" ->
      s"""WITH p AS (
         |  SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |e AS (
         |  SELECT a.sk AS sa, b.sk AS sb
         |  FROM p a JOIN p b ON a.ck = b.ck AND a.sk < b.sk
         |  GROUP BY 1, 2 HAVING count(*) >= $MinShared),
         |tri AS (
         |  SELECT e1.sa AS a, e1.sb AS b, e2.sb AS c
         |  FROM e e1 JOIN e e2 ON e1.sb = e2.sa
         |  JOIN e e3 ON e3.sa = e1.sa AND e3.sb = e2.sb),
         |x AS (
         |  SELECT unnest([a, b, c]) AS s_key FROM tri)
         |SELECT s_key, count(*) AS n_triangles
         |FROM x GROUP BY s_key ORDER BY s_key""".stripMargin
  )
}
