package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the retrieval + integrity block (q120–q122) on sf0.001;
  * the value-level gate is the DuckDB oracle at sf0.01. */
class Pipeline10Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q120: df equals posting-list length; tf >= df; postings sorted") {
    val r = run("q120_inverted_index").cache()
    assert(r.count() > 0)
    assert(r.filter(size(split(col("postings"), ",")) =!= col("df"))
      .count() === 0)
    assert(r.filter(col("tf") < col("df")).count() === 0)
    // joined string is ascending numerically
    val bad = r.select(col("token"),
      transform(split(col("postings"), ","), _.cast("long")).as("ids"))
      .filter(exists(
        zip_with(col("ids"), slice(col("ids"), 2, 1000000),
          (a, b) => b <= a),
        identity))
    assert(bad.count() === 0)
  }

  test("q121: block checksums cover every row and rerun bit-identically") {
    val r1 = run("q121_block_checksum").cache()
    val total = r1.agg(sum(col("n_rows"))).first().getLong(0)
    val liCount = sources.Catalog.table(spark, dir, "lineitem").count()
    assert(total === liCount)
    // deterministic: a second run produces the identical relation
    val r2 = run("q121_block_checksum")
    assert(r1.exceptAll(r2).count() === 0)
    assert(r2.exceptAll(r1).count() === 0)
    r1.unpersist()
  }

  test("q121: a single-row corruption flips exactly its block's hash") {
    val li = sources.Catalog.table(spark, dir, "lineitem")
    val row = li.orderBy(col("l_orderkey"), col("l_linenumber")).first()
    val (k, ln) = (row.getLong(row.fieldIndex("l_orderkey")),
      row.getInt(row.fieldIndex("l_linenumber")))
    val corrupted = li.withColumn("l_returnflag",
      when(col("l_orderkey") === k && col("l_linenumber") === ln, lit("Z"))
        .otherwise(col("l_returnflag")))
    val a = SparkEntry.queries("q121_block_checksum")(spark, dir)
    // rebuild the same aggregation over the corrupted relation
    val b = {
      import graft.functions.TextFunctions
      corrupted.groupBy(expr("l_orderkey div 1000").as("blk"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(TextFunctions.polyHash(concat_ws("|",
            col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_linestatus")))).as("row_hash_sum"))
        .select(col("blk"), col("n_rows"), col("row_hash_sum"))
    }
    val diff = a.select(col("blk"), col("n_rows"), col("row_hash_sum"))
      .exceptAll(b)
    assert(diff.count() === 1, "exactly one block must differ")
    assert(diff.first().getLong(0) === k / 1000L,
      "the differing block is the corrupted row's key range")
  }

  test("q125: union of partial HLL sketches tracks a direct sketch and the truth") {
    // datasketches unions are not bit-identical to a one-pass sketch
    // (the union operator carries its own target mode), but the rollup
    // must stay estimate-equivalent: within 1% of the direct sketch
    // and within 5% of the exact distinct count.
    val li = sources.Catalog.table(spark, dir, "lineitem")
    val viaUnion = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey")))
        .as("est_direct"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("truth"))
    val joined = viaUnion.join(direct, "l_returnflag").join(exact, "l_returnflag")
    assert(joined.count() > 0)
    assert(joined.filter(
      abs(col("est") - col("est_direct")).cast("double") /
        col("est_direct") > 0.01).count() === 0)
    assert(joined.filter(
      abs(col("est") - col("truth")).cast("double") /
        col("truth") > 0.05).count() === 0)
  }

  test("q128: surrogates are injective on the corpus and relabel the true aggregate") {
    val cust = sources.Catalog.table(spark, dir, "customer")
    def surrogate(key: org.apache.spark.sql.Column) =
      substring(md5(concat(lit("graft-pepper|"), key.cast("string"))), 1, 16)
    // injectivity: as many distinct surrogates as distinct keys
    val keys = cust.agg(countDistinct(col("c_custkey"))).first().getLong(0)
    val sids = cust.select(surrogate(col("c_custkey")).as("sid"))
      .agg(countDistinct(col("sid"))).first().getLong(0)
    assert(keys === sids)
    // the masked aggregate is the true per-customer aggregate, relabeled
    val masked = run("q128_pseudonymize")
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("n_orders")).as("n"), count(lit(1)).as("n_cust"))
    val truth = sources.Catalog.table(spark, dir, "orders")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), countDistinct(col("c_custkey")).as("n_cust"))
    assert(masked.exceptAll(truth).count() === 0)
    assert(truth.exceptAll(masked).count() === 0)
  }

  test("q129: weighted sample is ≤K, deterministic, and never skips a heavy item") {
    val r1 = run("q129_weighted_sample").cache()
    val n = r1.count()
    assert(n > 0 && n <= 100)
    // deterministic: bit-identical on rerun
    val r2 = run("q129_weighted_sample")
    assert(r1.exceptAll(r2).count() === 0)
    assert(r2.exceptAll(r1).count() === 0)
    r1.unpersist()
    // inclusion law on a synthetic line: any item with w > W/K spans
    // at least one full slot, so it MUST be selected
    import spark.implicits._
    val syn = (1L to 200L).map(i => (i, if (i == 137L) 5000L else 7L))
      .toDF("doc_id", "w")
    val cum = operators.PrefixSum.runningSum(syn, Seq(col("doc_id")), "w", "cum")
    val tot = syn.agg(sum(col("w")).as("wtot"))
    val picked = cum.crossJoin(broadcast(tot))
      .withColumn("lo", col("cum") - col("w"))
      .filter(expr("(cum * 100) div wtot") > expr("(lo * 100) div wtot"))
    assert(picked.filter(col("doc_id") === 137L).count() === 1,
      "an item heavier than W/K must always be in the sample")
  }

  test("q130: integral matches a driver-side fold; coverage and span laws") {
    val r = run("q130_time_weighted").cache()
    val ev = sources.Catalog.table(spark, dir, "events")
    assert(r.agg(sum(col("n_events"))).first().getLong(0) === ev.count())
    assert(r.filter(col("span_us") < 0).count() === 0)
    // recompute one user's integral with plain JVM arithmetic
    val uid = r.first().getLong(0)
    val rows = ev.filter(col("user_id") === uid)
      .select(unix_micros(col("ts").cast("timestamp")).as("us"),
        col("value"), col("event_id"))
      .orderBy(col("us"), col("event_id")).collect()
    val expected = rows.sliding(2).collect {
      case Array(a, b) =>
        val cents = new java.math.BigDecimal(a.getDouble(1))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()
        cents * ((b.getLong(0) - a.getLong(0)) / 1000L)
    }.sum
    val got = r.filter(col("user_id") === uid)
      .first().getAs[Long]("integral_c_ms")
    assert(got === expected)
    r.unpersist()
  }

  test("q131: proration conserves every interval exactly and never over-allocates a day") {
    val r = run("q131_interval_proration").cache()
    // conservation: Σ allocated µs per user == Σ raw interval lengths
    val ev = sources.Catalog.table(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val spans = ev.withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .filter(col("next_us").isNotNull && col("next_us") > col("ts_us"))
      .groupBy(col("user_id"))
      .agg(sum(col("next_us") - col("ts_us")).as("raw_us"))
    val alloc = r.groupBy(col("user_id"))
      .agg(sum(col("total_us")).as("alloc_us"))
    assert(alloc.join(spans, "user_id")
      .filter(col("alloc_us") =!= col("raw_us")).count() === 0)
    // no (user, day) cell exceeds a day
    assert(r.filter(col("total_us") > 86400000000L || col("total_us") <= 0)
      .count() === 0)
    r.unpersist()
  }

  test("q132: arg-extrema rows agree with the window-dedup formulation") {
    val r = run("q132_arg_extrema").cache()
    val ev = sources.Catalog.table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val latest = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"))
    assert(r.select(col("user_id"), col("last_type"))
      .exceptAll(latest).count() === 0)
    r.unpersist()
  }

  test("q132: tie-break contract raises on pre-1970 ts and oversized event_id") {
    // "%020d" renders negatives as "-00…1" which sorts wrong; rather
    // than silently mis-ordering (the oracle would replay the same
    // wrong order and mask it), the key expression raises in-plan.
    import spark.implicits._
    def keyOf(ts: Long, id: Long): Unit =
      Seq((ts, id)).toDF("ts_us", "event_id")
        .select(queries.Pipeline10.tieBreakKey(col("ts_us"), col("event_id")))
        .collect()
    keyOf(0L, 0L) // boundary of the valid domain — fine
    keyOf(253402300799999999L, 9999999999L) // year-9999 ts, max 10-digit id
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    val e1 = intercept[Exception] { keyOf(-1L, 42L) } // pre-1970
    assert(messages(e1).contains("q132 tie-break contract"))
    val e2 = intercept[Exception] { keyOf(1L, 10000000000L) } // 11-digit id
    assert(messages(e2).contains("q132 tie-break contract"))
  }

  test("q133: decile boundaries are exactly the ranked rows at each N/10 crossing") {
    val r = run("q133_equidepth_bounds").cache()
    assert(r.count() === 10)
    assert(r.select(col("decile")).collect().map(_.getLong(0)).toSeq
      === (0L to 9L))
    // boundary values are non-decreasing and rank-consistent
    val vals = r.orderBy(col("decile")).collect()
    assert(vals.sliding(2).forall { case Array(a, b) =>
      a.getAs[Double]("l_extendedprice") <= b.getAs[Double]("l_extendedprice")
    })
    // the decile-d row is the UPPER cut: rank = ceil((d+1)·N/10)
    // (so decile 9 is the maximum, rank N — p10..p100 cut points)
    val n = sources.Catalog.table(spark, dir, "lineitem").count()
    assert(vals.forall(v =>
      v.getAs[Long]("rnk") === ((v.getAs[Long]("decile") + 1) * n + 9) / 10))
    assert(vals.last.getAs[Long]("rnk") === n)
    r.unpersist()
  }

  test("q134: weighted median is the W/2 crossing — half the weight on each side") {
    val r = run("q134_weighted_median").cache()
    assert(r.count() > 0)
    // one row per group, and the crossing inequalities hold by construction
    val li = sources.Catalog.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), floor(col("l_quantity")).cast("long").as("w"))
    val groups = li.select(col("l_returnflag")).distinct().count()
    assert(r.count() === groups)
    // weight below the median value (strictly) is < W/2
    val below = li.join(r.select(col("l_returnflag"), col("w_median_price")),
      "l_returnflag")
    val liP = sources.Catalog.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        floor(col("l_quantity")).cast("long").as("w"))
      .join(r.select(col("l_returnflag"), col("w_median_price"), col("wtot")),
        "l_returnflag")
    val bad = liP.groupBy(col("l_returnflag"), col("wtot"))
      .agg(sum(when(col("l_extendedprice") < col("w_median_price"), col("w"))
        .otherwise(lit(0L))).as("below_w"))
      .filter(col("below_w") * 2 >= col("wtot"))
    assert(bad.count() === 0)
    r.unpersist()
  }

  test("q135: mode has the maximal count in its group, ties to the smallest value") {
    val r = run("q135_group_mode").cache()
    val counts = sources.Catalog.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), floor(col("l_quantity")).cast("long").as("qty"))
      .groupBy(col("l_returnflag"), col("qty")).agg(count(lit(1)).as("c"))
    val maxc = counts.groupBy(col("l_returnflag")).agg(max(col("c")).as("mx"))
    val joined = r.join(maxc, "l_returnflag")
    assert(joined.filter(col("cnt") =!= col("mx")).count() === 0)
    // no strictly-smaller qty shares the max count
    val tied = counts.join(maxc, "l_returnflag").filter(col("c") === col("mx"))
      .groupBy(col("l_returnflag")).agg(min(col("qty")).as("min_tied"))
    assert(r.join(tied, "l_returnflag")
      .filter(col("mode_qty") =!= col("min_tied")).count() === 0)
    r.unpersist()
  }

  test("q136: partial-merge equals one-shot for any split, including empty delta") {
    val li = sources.Catalog.table(spark, dir, "lineitem")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(30,6)")).as("qty"))
    def merge(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      a.as("b").join(b.as("d"), Seq("l_returnflag", "l_linestatus"),
          "full_outer")
        .select(col("l_returnflag"), col("l_linestatus"),
          (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
            .as("n"),
          (coalesce(col("b.qty"), lit(0).cast("decimal(30,6)")) +
            coalesce(col("d.qty"), lit(0).cast("decimal(30,6)"))).as("qty"))
    val oneShot = agg(li)
    // arbitrary 3-way split, merged pairwise
    val s1 = li.filter(col("l_orderkey") % 3 === 0)
    val s2 = li.filter(col("l_orderkey") % 3 === 1)
    val s3 = li.filter(col("l_orderkey") % 3 === 2)
    val merged = merge(merge(agg(s1), agg(s2)), agg(s3))
    assert(merged.exceptAll(oneShot).count() === 0)
    assert(oneShot.exceptAll(merged).count() === 0)
    // empty delta is the identity
    val withEmpty = merge(agg(li), agg(li.filter(lit(false))))
    assert(withEmpty.exceptAll(oneShot).count() === 0)
  }

  test("q122: fused ranks are a dense 1..K prefix and RRF arithmetic is exact") {
    val r = run("q122_rrf_hybrid").cache()
    val n = r.count()
    assert(n > 0 && n <= 50)
    assert(r.agg(min(col("fused_rank"))).first().getInt(0) === 1)
    assert(r.agg(max(col("fused_rank"))).first().getInt(0).toLong === n)
    // rrf_fp recomputes from the rank columns (integer div, k=60)
    val bad = r.withColumn("expect",
      coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
        coalesce(expr("1000000 div (60 + dense_rank)"), lit(0L)))
      .filter(col("expect") =!= col("rrf_fp"))
    assert(bad.count() === 0)
    // at least one doc is present in BOTH source rankings on this corpus
    assert(r.filter(col("lex_rank").isNotNull && col("dense_rank").isNotNull)
      .count() > 0)
    r.unpersist()
  }
}
