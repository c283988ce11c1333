package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{KmvSketch, LabelPropagation}
import graft.sources.Catalog

/** Round-9 additions, part 2 — two operator families the suite lacked:
  *
  *  - q153 KMV/theta sketch SET OPERATIONS (Beyer et al., SIGMOD 2007;
  *    the DataSketches theta-sketch estimator family): the mergeable
  *    distinct sketch that, unlike HLL (q125), also estimates
  *    INTERSECTIONS from sketch contents alone. The query builds
  *    k=1024 sketches of two order-key sets, estimates |A|, |B|,
  *    |A∪B| (merged sketch), |A∩B| (θ-cut), reports them beside the
  *    exact counts, and pins q29-style accuracy witnesses. Every
  *    number is deterministic — the estimates themselves hash-match
  *    the oracle, not just the witnesses.
  *  - q154 label-propagation communities (Raghavan et al. 2007) over
  *    the bidirectional customer↔supplier trade graph (q69's graph):
  *    the community-detection sibling of PageRank — 4 fixed
  *    synchronous rounds, most-frequent-neighbor-label updates with
  *    smallest-label tie-break, exactly replayed by the oracle's
  *    unrolled CTE rounds.
  *
  * Hash-uniformity note (q153): the first cut used the repo's mod-p
  * polynomial hashes. On ScaleGen's translate-structured keys
  * (10 copies offset by 1e9 ≈ the modulus) EVERY polynomial-mod-p mix
  * tried — affine, affine+square, bijective cube, x^5 — read 28–89%
  * estimation error, while md5 read ≤ 2.5% at every scale; mod-p
  * polynomial maps have bad local discrepancy exactly in the bottom-k
  * window KMV samples. Hence [[KmvSketch.uniformHash]] is 60 bits of
  * md5 mod M — portable (bit-identical in DuckDB), codegen'd built-ins
  * on the Spark side, and actually uniform on adversarial key sets.
  */
object Pipeline15 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  private val K = 1024
  private val M = KmvSketch.M

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-predicate distinct-overlap report from sketches. A = order
    // keys shipping any line with quantity >= 25; B = order keys with
    // any discounted line (>= 0.05). The exact counts ride along both
    // to witness accuracy (<= 10% at every measured scale incl. x10)
    // and to give the oracle a fully deterministic row to hash.
    "q153_theta_sketch_setops" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val aKeys = li.filter(col("l_quantity") >= 25)
        .select(col("l_orderkey")).distinct()
      val bKeys = li.filter(col("l_discount") >= 0.05)
        .select(col("l_orderkey")).distinct()
      val skA = KmvSketch.sketch(aKeys, col("l_orderkey"), K)
      val skB = KmvSketch.sketch(bKeys, col("l_orderkey"), K)
      val stA = KmvSketch.stats(skA)
        .select(col("n").as("na"), col("kth").as("ka"))
      val stB = KmvSketch.stats(skB)
        .select(col("n").as("nb"), col("kth").as("kb"))
      val stU = KmvSketch.stats(KmvSketch.merge(skA, skB, K))
        .select(col("n").as("nu"), col("kth").as("ku"))
      // θ-cut common-hash count: sketch-only work (≤ k rows a side)
      val rho = skA.join(skB, "h")
        .crossJoin(broadcast(stA)).crossJoin(broadcast(stB))
        .filter(col("h") <= least(col("ka"), col("kb")))
        .agg(count(lit(1)).cast("long").as("rho"))
      val exact = aKeys.join(bKeys, "l_orderkey")
        .agg(count(lit(1)).cast("long").as("exact_inter"))
        .crossJoin(broadcast(aKeys.agg(
          count(lit(1)).cast("long").as("exact_a"))))
        .crossJoin(broadcast(bKeys.agg(
          count(lit(1)).cast("long").as("exact_b"))))
      exact.crossJoin(broadcast(stA)).crossJoin(broadcast(stB))
        .crossJoin(broadcast(stU)).crossJoin(broadcast(rho))
        .withColumn("exact_union",
          col("exact_a") + col("exact_b") - col("exact_inter"))
        .withColumn("est_a", KmvSketch.estimate("na", "ka", K))
        .withColumn("est_b", KmvSketch.estimate("nb", "kb", K))
        .withColumn("est_union", KmvSketch.estimate("nu", "ku", K))
        .withColumn("est_inter", expr(
          // both sketches whole → ρ IS the exact overlap; else θ-scale
          s"CASE WHEN na < $K AND nb < $K THEN rho" +
            s" ELSE rho * $M div least(ka, kb) END"))
        .select(
          col("exact_a"), col("exact_b"), col("exact_union"),
          col("exact_inter"),
          col("est_a"), col("est_b"), col("est_union"), col("est_inter"),
          (abs(col("est_a") - col("exact_a")) * 100 <=
            col("exact_a") * 10).as("a_within_10pct"),
          (abs(col("est_b") - col("exact_b")) * 100 <=
            col("exact_b") * 10).as("b_within_10pct"),
          (abs(col("est_union") - col("exact_union")) * 100 <=
            col("exact_union") * 10).as("union_within_10pct"),
          (abs(col("est_inter") - col("exact_inter")) * 100 <=
            col("exact_inter") * 10).as("inter_within_10pct"))
    }),

    // Deterministic LPA communities on the trade graph. Node encoding,
    // edge build, and the both-directions explode are exactly q69's
    // (one distinct fact-join pass, narrow LONG ids).
    "q154_label_propagation" -> ((s, dir) => {
      val pairs = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
      val c = col("ck") * 2L
      val sup = col("sk") * 2L + 1L
      val edges = pairs.select(explode(array(
          struct(c.as("src"), sup.as("dst")),
          struct(sup.as("src"), c.as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      LabelPropagation.run(edges, "src", "dst", iters = 4)
        .orderBy(col("node"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q153_theta_sketch_setops" -> {
      val h = s"(CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR))," +
        s" 1, 15)) AS BIGINT) % $M)"
      s"""WITH a AS (SELECT DISTINCT l_orderkey FROM lineitem
         |           WHERE l_quantity >= 25),
         |b AS (SELECT DISTINCT l_orderkey FROM lineitem
         |      WHERE l_discount >= 0.05),
         |ska AS (SELECT DISTINCT $h AS h FROM a ORDER BY h LIMIT $K),
         |skb AS (SELECT DISTINCT $h AS h FROM b ORDER BY h LIMIT $K),
         |sku AS (SELECT h FROM (SELECT h FROM ska UNION
         |                       SELECT h FROM skb)
         |        ORDER BY h LIMIT $K),
         |sta AS (SELECT CAST(COUNT(*) AS BIGINT) na, MAX(h) ka FROM ska),
         |stb AS (SELECT CAST(COUNT(*) AS BIGINT) nb, MAX(h) kb FROM skb),
         |stu AS (SELECT CAST(COUNT(*) AS BIGINT) nu, MAX(h) ku FROM sku),
         |rh AS (SELECT CAST(COUNT(*) AS BIGINT) rho
         |       FROM ska JOIN skb USING (h), sta, stb
         |       WHERE h <= LEAST(ka, kb)),
         |ex AS (SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a) exact_a,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM b) exact_b,
         |  (SELECT CAST(COUNT(*) AS BIGINT)
         |   FROM a JOIN b USING (l_orderkey)) exact_inter),
         |est AS (SELECT
         |  CASE WHEN na < $K THEN na
         |       ELSE ${(K - 1).toLong * M} // ka END est_a,
         |  CASE WHEN nb < $K THEN nb
         |       ELSE ${(K - 1).toLong * M} // kb END est_b,
         |  CASE WHEN nu < $K THEN nu
         |       ELSE ${(K - 1).toLong * M} // ku END est_union,
         |  CASE WHEN na < $K AND nb < $K THEN rho
         |       ELSE rho * $M // LEAST(ka, kb) END est_inter
         |  FROM sta, stb, stu, rh)
         |SELECT exact_a, exact_b,
         |  exact_a + exact_b - exact_inter AS exact_union, exact_inter,
         |  est_a, est_b, est_union, est_inter,
         |  abs(est_a - exact_a) * 100 <= exact_a * 10 AS a_within_10pct,
         |  abs(est_b - exact_b) * 100 <= exact_b * 10 AS b_within_10pct,
         |  abs(est_union - (exact_a + exact_b - exact_inter)) * 100
         |    <= (exact_a + exact_b - exact_inter) * 10
         |    AS union_within_10pct,
         |  abs(est_inter - exact_inter) * 100 <= exact_inter * 10
         |    AS inter_within_10pct
         |FROM ex, est""".stripMargin
    },

    "q154_label_propagation" -> {
      // one unrolled synchronous round: neighbor-label counts, then
      // per-dst arg-max (count DESC, label ASC) — the ROW_NUMBER pick
      // is the oracle twin of the engine's max(struct(cnt, -lbl))
      def round(prev: String, cnt: String, out: String): String =
        s"""$cnt AS (
           |  SELECT e.dst, l.lbl, COUNT(*) AS c
           |  FROM e JOIN $prev l ON e.src = l.node
           |  GROUP BY e.dst, l.lbl),
           |$out AS (
           |  SELECT dst AS node, lbl FROM (
           |    SELECT dst, lbl, ROW_NUMBER() OVER
           |      (PARTITION BY dst ORDER BY c DESC, lbl ASC) AS rn
           |    FROM $cnt) WHERE rn = 1)""".stripMargin
      s"""WITH eraw AS (
         |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
         |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS (SELECT src, dst FROM eraw
         |      UNION SELECT dst AS src, src AS dst FROM eraw),
         |l0 AS (SELECT node, node AS lbl FROM (
         |  SELECT src AS node FROM e UNION SELECT dst FROM e)),
         |${round("l0", "c1", "l1")},
         |${round("l1", "c2", "l2")},
         |${round("l2", "c3", "l3")},
         |${round("l3", "c4", "l4")}
         |SELECT node, lbl FROM l4 ORDER BY node""".stripMargin
    }
  )
}
