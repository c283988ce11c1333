package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Similarity
import graft.sources.Catalog

/** Round-5 retrieval + integrity + temporal block (q120–q131): the
  * inverted index and its RRF hybrid-retrieval consumer, block
  * checksums, z-order clustering, mergeable HLL rollups,
  * pseudonymization, weighted sampling, and the exact-integer
  * temporal aggregates (time-weighted integral, interval proration).
  * Everything here is either pure integer/decimal arithmetic or
  * carries a witness column — bit-stable across engines by design.
  *
  *  - q120 inverted index: the posting-list build — token → (df, tf,
  *    sorted distinct doc list). The postings column carries the FULL
  *    sorted posting list as a joined string, so the oracle hash pins
  *    membership AND order, not just counts. At 100 TB the shape is
  *    the same two hash-aggs; real deployments cap df (stop-word
  *    postings are dropped, exactly what the df column enables) and
  *    delta-encode the lists — both downstream of this relation.
  *  - q121 block checksums: the anti-entropy primitive for
  *    cross-system reconciliation (the 100 TB version of "did the
  *    copy arrive intact?"). Key-range blocks, each with an
  *    order-independent content hash (sum of per-row polynomial
  *    hashes) + exact decimal sums — two replicas compare ~60 block
  *    rows instead of re-reading 600 M rows, and a mismatched block
  *    localizes the diff to one key range. Pure map-side hash-agg.
  *  - q122 hybrid retrieval (RRF): lexical candidate set (distinct
  *    token overlap with the probe document's token set — exactly a
  *    probe-token posting-list intersection over q120's index) fused
  *    with dense retrieval (fixed-point inner-product top-k vs the
  *    probe embedding) by reciprocal-rank fusion in exact integer
  *    arithmetic (1e6 div (60+rank)). Both source rankings are
  *    bounded top-100 lists — at scale the dense side comes from the
  *    IVF index (q30) and the lexical side from pruned posting reads,
  *    so fusion cost is independent of corpus size. Ranking ties
  *    break on doc_id; every score is an integer → bit-stable.
  */
object Pipeline10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  private val RrfK = 60
  private val TopL = 100 // per-ranker candidate list length
  private val TopK = 50  // fused result size

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_inverted_index" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      tok.groupBy(col("token"))
        .agg(
          countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("tf"),
          array_join(
            transform(array_sort(collect_set(col("doc_id"))),
              _.cast("string")),
            ",").as("postings"))
        .orderBy(col("token"))
    }),

    "q121_block_checksum" -> ((s, dir) => {
      import s.implicits._
      // the row key is built by codegen'd concat_ws; the polynomial
      // hash runs in the JVM kernel (the HOF form is interpreted per
      // character and was 7× slower at sf0.1 — same arithmetic, same
      // oracle hash, see TextFunctions.polyHashJvm)
      val pre = t(s, dir, "lineitem")
        .select(
          expr("l_orderkey div 1000").as("blk"),
          concat_ws("|", col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_linestatus")).as("rk"),
          col("l_quantity"), col("l_extendedprice"),
          pmod(unix_micros(col("l_shipdate").cast("timestamp")),
            lit(1000000007L)).as("shipmod"))
        .as[(Long, String, Double, Double, Long)]
        .map { case (blk, rk, q, p, sm) =>
          (blk, TextFunctions.polyHashJvm(rk), q, p, sm)
        }
        .toDF("blk", "rh", "l_quantity", "l_extendedprice", "shipmod")
      pre.groupBy(col("blk"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("rh")).as("row_hash_sum"),
          sum(col("l_quantity").cast("decimal(30,6)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(30,6)")).cast("double")
            .as("sum_price"),
          sum(col("shipmod")).as("ship_hash_sum"))
        .orderBy(col("blk"))
    }),

    "q122_rrf_hybrid" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val embs = t(s, dir, "embeddings")

      // lexical side: distinct-token overlap with the probe document.
      // The probe token set is tiny by construction → broadcast; the
      // candidate relation is a posting-list intersection in disguise.
      val probeToks = docs.filter(col("doc_id") === 0)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "").distinct()
      val candToks = docs.filter(col("doc_id") =!= 0)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "").distinct()
      val overlap = candToks.join(broadcast(probeToks), "token")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("ov"))
      // distributed top-L via TakeOrderedAndProject, THEN a window
      // row_number over the ≤L survivors (never a global single-
      // partition sort over the corpus)
      val lexTop = overlap
        .orderBy(col("ov").desc, col("doc_id")).limit(TopL)
        .withColumn("lex_rank", row_number()
          .over(Window.orderBy(col("ov").desc, col("doc_id"))))
        .select(col("doc_id"), col("lex_rank"))

      // dense side: fixed-point inner-product top-L vs the probe
      // embedding (rn from the shared k-NN operator, self excluded)
      val probeVec = embs.filter(col("vec_id") === 0)
      val denseTop = Similarity
        .bruteForceTopK(probeVec, embs, "vec_id", "embedding", TopL)
        .select(col("neighbor_id").as("doc_id"), col("rn").as("dense_rank"))

      val fused = lexTop.join(denseTop, Seq("doc_id"), "full_outer")
        .withColumn("rrf_fp",
          coalesce(expr(s"$FpScale div ($RrfK + lex_rank)"), lit(0L)) +
            coalesce(expr(s"$FpScale div ($RrfK + dense_rank)"), lit(0L)))
      fused
        .orderBy(col("rrf_fp").desc, col("doc_id")).limit(TopK)
        .withColumn("fused_rank", row_number()
          .over(Window.orderBy(col("rrf_fp").desc, col("doc_id"))))
        .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
          col("rrf_fp"), col("fused_rank"))
        .orderBy(col("fused_rank"))
    }),

    // Time-weighted integration — the telemetry/billing aggregate:
    // each reading holds its value until the next one, so the mean is
    // ∫value·dt / span, not avg(value). The integral is EXACT INTEGER
    // arithmetic: value in centi-units (decimal(12,2) cast, then ×100
    // — both engines round the cast identically) × whole milliseconds
    // — no float products anywhere, so the oracle hash pins both the
    // window semantics and the arithmetic bit-for-bit. (A decimal or
    // double integral column is NOT comparable across engines: the
    // driver hashes decimals as floats, and wide decimal→double casts
    // drift by 1 ULP.) Per-user windows shuffle once on user_id; span
    // and integral ship separately — the final division is the
    // caller's rounding choice, not baked into the relation.
    "q130_time_weighted" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      ev.withColumn("next_us", lead(col("ts_us"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          (max(col("ts_us")) - min(col("ts_us"))).as("span_us"),
          sum((col("value").cast("decimal(12,2)") * 100).cast("long") *
            expr("(next_us - ts_us) div 1000"))
            .as("integral_c_ms"))
        .orderBy(col("user_id"))
    }),

    // Incremental view maintenance — the pre-aggregated-view refresh
    // path: the standing view holds per-key partial aggregates of the
    // base data; a delta batch is aggregated ALONE and merged into the
    // view state by key (full-outer + coalesced partial merge), never
    // re-reading the base. The oracle recomputes the view from the
    // whole table one-shot — the hash match IS the IVM correctness
    // proof (merge(agg(base), agg(delta)) == agg(base ∪ delta)),
    // exact because count/sum are commutative monoids and the sums
    // ride DECIMAL. At 100 TB this is the difference between a
    // delta-sized refresh and a full-table rescan.
    "q136_incremental_view" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cut = lit("1996-01-01").cast("timestamp")
      def partialAgg(df: DataFrame): DataFrame =
        df.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(30,6)")).as("qty"),
            sum(col("l_extendedprice").cast("decimal(30,6)")).as("price"))
      val base = partialAgg(
        li.filter(col("l_shipdate").cast("timestamp") < cut))
      val delta = partialAgg(
        li.filter(col("l_shipdate").cast("timestamp") >= cut))
      def z(c: String, side: DataFrame) = coalesce(side(c), lit(0))
      base.as("b").join(delta.as("d"),
          Seq("l_returnflag", "l_linestatus"), "full_outer")
        .select(col("l_returnflag"), col("l_linestatus"),
          (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
            .as("n_rows"),
          (coalesce(col("b.qty"), lit(0).cast("decimal(30,6)")) +
            coalesce(col("d.qty"), lit(0).cast("decimal(30,6)")))
            .cast("double").as("sum_qty"),
          (coalesce(col("b.price"), lit(0).cast("decimal(30,6)")) +
            coalesce(col("d.price"), lit(0).cast("decimal(30,6)")))
            .cast("double").as("sum_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Weighted median — the order statistic under a weight column
    // (the "typical price per unit SOLD", not per line): the first
    // row whose cumulative weight crosses W/2 in a total value order.
    // Per-group window cumsum (partitioned — no global reducer), the
    // crossing test is the q129 integer trick at K=2. Weights go
    // through an explicit floor() (DuckDB CAST rounds, Spark CAST
    // truncates — floor is the one form both engines agree on).
    "q134_weighted_median" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("long").as("w"))
      val wnd = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(col("l_returnflag"))
      li.withColumn("cum", sum(col("w")).over(wnd))
        .withColumn("wtot", sum(col("w")).over(tot))
        .filter(col("cum") * 2 >= col("wtot") &&
          (col("cum") - col("w")) * 2 < col("wtot"))
        .select(col("l_returnflag"),
          col("l_extendedprice").as("w_median_price"),
          col("cum"), col("wtot"))
        .orderBy(col("l_returnflag"))
    }),

    // Deterministic mode — most frequent value per group with a total
    // tie-break (highest count, then smallest value): two hash-aggs +
    // a per-group top-1 (WindowGroupLimit pushes the rank down). The
    // built-in `mode()` is tie-nondeterministic across engines; this
    // formulation is bit-stable by construction.
    "q135_group_mode" -> ((s, dir) => {
      val counts = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          floor(col("l_quantity")).cast("long").as("qty"))
        .groupBy(col("l_returnflag"), col("qty"))
        .agg(count(lit(1)).as("cnt"))
      val wnd = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("qty"))
      counts.withColumn("rn", row_number().over(wnd))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("qty").as("mode_qty"),
          col("cnt"))
        .orderBy(col("l_returnflag"))
    }),

    // Equi-depth histogram boundaries — the CBO/statistics primitive:
    // the exact value at each decile CUT of a fact column (what
    // ANALYZE stores, what range-partitioners and skew detectors
    // consume). Global rank rides DistributedRank (two-phase
    // range-partitioned rank, never an empty-partition window); a row
    // is a boundary iff its rank crosses a multiple of N/10 — the
    // same exact-integer slot-crossing trick as q129, so the 10-row
    // answer is bit-stable and the oracle replays it with a plain
    // window rank. Ties totally ordered by (price, orderkey, line).
    "q133_equidepth_bounds" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
      // rank + total in ONE pass (the separate count() paid another
      // scan of lineitem just to learn n)
      val (ranked, n) = graft.operators.DistributedRank
        .globalRowNumberCounted(li, Seq(col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber")), "rnk")
      ranked
        .filter(expr(s"(rnk * 10) div ${n}L") >
          expr(s"((rnk - 1) * 10) div ${n}L"))
        .select(expr(s"((rnk - 1) * 10) div ${n}L").as("decile"),
          col("rnk"), col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
        .orderBy(col("decile"))
    }),

    // Arg-extrema aggregates — SQL's max_by/min_by surface: the
    // attribute OF the latest/earliest row per group without a window
    // + filter round trip (one hash-agg, no row_number shuffle-sort).
    // Determinism: ties on ts are broken by event_id through a
    // zero-padded composite sort key (lexicographic == numeric for
    // fixed width). That equivalence holds ONLY for non-negative
    // inputs that fit the widths ("%020d" renders -1 as "-0000…1",
    // which sorts BELOW every positive — wrong order — and an
    // event_id >= 1e10 overflows its 10 digits): both engines would
    // replay the same wrong order, so the contract is enforced
    // in-plan — any pre-1970 ts or oversized id raises instead of
    // silently mis-sorting (Pipeline10Spec pins the failure).
    "q132_arg_extrema" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("k", tieBreakKey(col("ts_us"), col("event_id")))
      ev.groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          max_by(col("event_type"), col("k")).as("last_type"),
          max_by(col("value"), col("k")).as("last_value"),
          min_by(col("event_type"), col("k")).as("first_type"),
          min_by(col("ts_us"), col("k")).as("first_ts_us"))
        .orderBy(col("user_id"))
    }),

    // Interval proration — the usage-allocation op: each per-user
    // activity interval [ts, next) is SPLIT across the UTC day
    // boundaries it crosses and its microseconds attributed to each
    // day (billing, capacity, SLA accounting). The day fan-out is an
    // explode of a bounded integer sequence (one row per day the
    // interval touches — linear in total days spanned, never a
    // calendar cross join); the clamp is exact integer least/greatest.
    // Distinct from q61/q84 (grid filling / interpolation): this
    // allocates a measured quantity exactly, Σ day parts == interval.
    "q131_interval_proration" -> ((s, dir) => {
      val Day = 86400000000L
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val iv = ev.withColumn("next_us", lead(col("ts_us"), 1).over(w))
        .filter(col("next_us").isNotNull && col("next_us") > col("ts_us"))
      iv.withColumn("day_idx", explode(sequence(
          expr(s"ts_us div $Day"), expr(s"(next_us - 1) div $Day"))))
        .withColumn("seg_us",
          least(col("next_us"), (col("day_idx") + 1) * Day) -
            greatest(col("ts_us"), col("day_idx") * Day))
        .groupBy(col("user_id"), col("day_idx"))
        .agg(count(lit(1)).as("n_segs"), sum(col("seg_us")).as("total_us"))
        .orderBy(col("user_id"), col("day_idx"))
    }),

    // Systematic weighted sampling — the deterministic way to sample
    // documents ∝ weight (here: length) for a training mix. Lay the
    // corpus on a weight line in doc_id order; a document is selected
    // iff its [cum−w, cum) interval contains a multiple of W/K — every
    // selection probability is exactly w·K/W, the draw is exact
    // INTEGER arithmetic end-to-end (no RNG, no floats → rerun- and
    // engine-reproducible, same promise as q111's md5 thresholds but
    // weight-proportional). The global running sum rides the
    // distributed PrefixSum operator (range-partitioned two-phase
    // fold), NOT an empty-partition window — the single-reducer trap
    // at 100 TB; W joins back as a broadcast scalar seed.
    "q129_weighted_sample" -> ((s, dir) => {
      val K = 100L
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").as("w"))
      val cum = graft.operators.PrefixSum
        .runningSum(d, Seq(col("doc_id")), "w", "cum")
      val tot = d.agg(sum(col("w")).as("wtot"))
      cum.crossJoin(broadcast(tot))
        .withColumn("lo", col("cum") - col("w"))
        .filter(expr(s"(cum * $K) div wtot") > expr(s"(lo * $K) div wtot"))
        .select(col("doc_id"), col("w"), col("cum"),
          expr(s"(lo * $K) div wtot").as("slot"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic pseudonymization — privacy-preserving analytics at
    // scale: every customer key is replaced by a keyed-hash surrogate
    // (md5 with a pipeline pepper) BEFORE analytics, and the same
    // mapping applied to the fact side keeps every join working — the
    // aggregate over surrogates is exactly the aggregate over real
    // keys, relabeled. Pure map-side transform (no lookup table to
    // shuffle or leak); the oracle replays the same md5 on the raw
    // tables, so a hash match proves referential integrity survived
    // the masking. Surrogate collisions are structurally possible but
    // need ~2^32 keys at 16 hex chars; Pipeline10Spec pins injectivity
    // on the corpus.
    "q128_pseudonymize" -> ((s, dir) => {
      def surrogate(key: org.apache.spark.sql.Column) =
        substring(md5(concat(lit("graft-pepper|"), key.cast("string"))), 1, 16)
      val cust = t(s, dir, "customer")
        .select(surrogate(col("c_custkey")).as("cust_sid"),
          col("c_mktsegment"))
      val ords = t(s, dir, "orders")
        .select(surrogate(col("o_custkey")).as("cust_sid"),
          col("o_totalprice"))
      ords.join(cust, "cust_sid")
        .groupBy(col("c_mktsegment"), col("cust_sid"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(30,6)")).cast("double")
            .as("sum_price"))
        .orderBy(col("c_mktsegment"), col("cust_sid"))
    }),

    // Mergeable sketch columns — the 100 TB pre-aggregation pattern:
    // each fine-grained group keeps a ~KB HLL sketch of its key set;
    // any coarser rollup UNIONS the stored sketches without touching
    // the raw rows again (a daily-partition → monthly-report rollup
    // re-reads KBs, not TBs). The query materializes per-(flag,status)
    // sketches, merges them up to flag level, and the q29-style
    // witness pins the merged estimate within 5% of the exact distinct
    // count — TRUE is the deterministic oracle-checkable contract
    // (HLL binaries themselves are implementation-defined, so the
    // estimate rides a witness, not a hash).
    "q125_hll_sketch_merge" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val perGroup = li
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
      val merged = perGroup.groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      exact.join(merged, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("est") - col("exact_orders")).cast("double") /
            col("exact_orders") <= 0.05).as("merged_within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    // Z-order (Morton) clustering — the multi-dimensional data-skipping
    // layout: interleaving the bits of (l_partkey, l_suppkey) gives a
    // 1-D sort key whose contiguous ranges bound BOTH dimensions, so
    // per-file min/max stats prune scans for 2-D predicates (a sort on
    // either single key leaves the other dimension unconstrained —
    // LayoutSpec demonstrates the pruning win on a narrow-y box query).
    // The query reports per-z-bucket stats: the bucket column is what a
    // writer would range-partition files by; min/max of each dimension
    // per bucket IS the skipping metadata. Exact integer arithmetic
    // end-to-end — the oracle replays the interleave bit-for-bit.
    "q123_zorder_stats" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .withColumn("z", zOrder(col("l_partkey"), col("l_suppkey")))
        .groupBy(expr(s"z div $ZBucketShift").as("z_bucket"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("min_part"),
          max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"),
          max(col("l_suppkey")).as("max_supp"),
          sum(pmod(col("z"), lit(1000000007L))).as("z_hash_sum"))
        .orderBy(col("z_bucket"))
    })
  )

  private val FpScale = 1000000L

  /** q132's composite tie-break key. Zero-padded decimal is
    * order-preserving only on [0, 10^width): negative values render
    * with a leading '-' (lexicographically smallest, i.e. more-negative
    * sorts HIGHER among negatives — broken), and overflow widths break
    * alignment. Out-of-domain rows raise instead of silently
    * mis-ordering; the oracle never needs the guard because the same
    * contract is asserted here before the engines can diverge. */
  private[graft] def tieBreakKey(tsUs: org.apache.spark.sql.Column,
      eventId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bad = tsUs < 0 || eventId < 0 || eventId >= lit(10000000000L)
    when(bad, raise_error(concat(
      lit("q132 tie-break contract: need 0 <= ts_us and 0 <= event_id < 1e10, got ts_us="),
      tsUs.cast("string"), lit(" event_id="), eventId.cast("string"))))
      .otherwise(format_string("%020d|%010d", tsUs, eventId))
  }

  /** Bits interleaved per dimension. 31 covers the entire non-negative
    * signed-32 key domain (TPC-H keys, and ScaleGen's +1e9 remapped keys,
    * are all < 2^31), and the highest output bit is 2*30+1 = 61, so the
    * interleaved key always stays a positive Long. Round 5 shipped 16
    * here, which silently aliased any key >= 65,536 — distinct
    * (partkey, suppkey) pairs collapsed to one z-value past sf1 / any
    * remapped dataset. The oracle replays the same arithmetic so only a
    * bijection law (LayoutSpec) can catch that class of bug. */
  private[graft] val ZBits = 31
  private val ZBucketShift = 65536L // 2^16 z-range per bucket (256×256 Morton tile)

  /** Bit-interleaved Morton (Z-order) key of two non-negative ints —
    * pure integer arithmetic (shift/mask/multiply) so the DuckDB
    * oracle replays it bit-for-bit. Shared with LayoutSpec.
    * Domain: both keys non-negative and < 2^31 (negative keys would
    * interleave their sign-extension garbage; LayoutSpec pins the
    * bijection across the widened domain). */
  private[graft] def zOrder(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until ZBits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  private[graft] def zOrderSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** N-dimensional Morton interleave: bit i of dimension d lands at
    * output bit `n*i + d`, so [[zOrder]] (2-D, 31 bits) is exactly
    * the n=2 instance. `n * bits` must stay ≤ 62 to keep the key a
    * positive Long — the default budget is `62 / n` bits per
    * dimension (31 at n=2, 20 at n=3); keys at or above `2^bits`
    * alias deterministically, same documented domain rule as
    * [[zOrder]] (locality degrades, results never change — the exact
    * predicate refilters). Pure integer shift/mask arithmetic so the
    * DuckDB oracle replays it bit-for-bit ([[zOrderNSql]]). */
  private[graft] def zOrderN(cs: Seq[org.apache.spark.sql.Column],
      bits: Int): org.apache.spark.sql.Column = {
    val n = cs.size
    require(n >= 2, s"zOrderN: need >= 2 columns, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"zOrderN: $n dims x $bits bits/dim exceeds the positive-Long " +
        "key range (need n*bits <= 62)")
    (for (i <- 0 until bits; d <- 0 until n) yield
      shiftright(cs(d), i).bitwiseAND(lit(1L)) * lit(1L << (n * i + d)))
      .reduce(_ + _)
  }

  private[graft] def zOrderNSql(names: Seq[String], bits: Int): String = {
    val n = names.size
    (for (i <- 0 until bits; d <- 0 until n) yield
      s"(((${names(d)} >> $i) & 1) * ${1L << (n * i + d)})")
      .mkString("(", " + ", ")")
  }

  val oracleSql: Map[String, String] = Map(
    "q120_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents)
        |  WHERE token <> ''),
        |dist AS (SELECT DISTINCT token, doc_id FROM tok),
        |p AS (SELECT token, COUNT(*) AS df,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |  FROM dist GROUP BY token),
        |c AS (SELECT token, COUNT(*) AS tf FROM tok GROUP BY token)
        |SELECT p.token, p.df, c.tf, p.postings
        |FROM p JOIN c USING (token)
        |ORDER BY p.token""".stripMargin,

    "q121_block_checksum" -> {
      val ph =
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(range(1, length(rk)+1), i_ -> CAST(ascii(rk[i_]) AS BIGINT))), " +
          "(h_, c_) -> (h_ * 131 + c_) % 1000000007)"
      s"""SELECT blk, COUNT(*) AS n_rows,
         |  CAST(SUM($ph) AS BIGINT) AS row_hash_sum,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
         |  CAST(SUM(epoch_us(l_shipdate) % 1000000007) AS BIGINT) AS ship_hash_sum
         |FROM (SELECT l_orderkey // 1000 AS blk, l_quantity, l_extendedprice,
         |        l_shipdate,
         |        concat_ws('|', l_orderkey, l_linenumber, l_returnflag,
         |          l_linestatus) AS rk
         |      FROM lineitem)
         |GROUP BY blk ORDER BY blk""".stripMargin
    },

    "q122_rrf_hybrid" ->
      """WITH efix AS (SELECT vec_id,
        |    list_transform(embedding,
        |      x_ -> CAST(floor(CAST(x_ AS DOUBLE) * 10000000.0) AS BIGINT)) AS v
        |  FROM embeddings),
        |pv AS (SELECT v FROM efix WHERE vec_id = 0),
        |ds AS (SELECT c.vec_id AS doc_id,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i_ -> pv.v[i_] * c.v[i_])) AS BIGINT) AS dot_fp
        |  FROM efix c CROSS JOIN pv WHERE c.vec_id <> 0),
        |dr AS (SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY dot_fp DESC, doc_id) AS INT)
        |      AS dense_rank
        |  FROM ds
        |  QUALIFY ROW_NUMBER() OVER (ORDER BY dot_fp DESC, doc_id) <= 100),
        |pt AS (SELECT DISTINCT token FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token
        |    FROM documents WHERE doc_id = 0)
        |  WHERE token <> ''),
        |ct AS (SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents WHERE doc_id <> 0)
        |  WHERE token <> ''),
        |lx AS (SELECT ct.doc_id, COUNT(*) AS ov
        |  FROM ct JOIN pt USING (token) GROUP BY ct.doc_id),
        |lr AS (SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY ov DESC, doc_id) AS INT)
        |      AS lex_rank
        |  FROM lx
        |  QUALIFY ROW_NUMBER() OVER (ORDER BY ov DESC, doc_id) <= 100),
        |f AS (SELECT COALESCE(lr.doc_id, dr.doc_id) AS doc_id,
        |    lex_rank, dense_rank,
        |    CAST(COALESCE(1000000 // (60 + lex_rank), 0)
        |       + COALESCE(1000000 // (60 + dense_rank), 0) AS BIGINT) AS rrf_fp
        |  FROM lr FULL OUTER JOIN dr ON lr.doc_id = dr.doc_id)
        |SELECT doc_id, lex_rank, dense_rank, rrf_fp,
        |  CAST(ROW_NUMBER() OVER (ORDER BY rrf_fp DESC, doc_id) AS INT)
        |    AS fused_rank
        |FROM f
        |QUALIFY ROW_NUMBER() OVER (ORDER BY rrf_fp DESC, doc_id) <= 50
        |ORDER BY fused_rank""".stripMargin,

    // the oracle is the ONE-SHOT recompute — matching it proves the
    // partial-merge path
    "q136_incremental_view" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q134_weighted_median" ->
      """WITH x AS (SELECT l_returnflag, l_extendedprice, l_orderkey,
        |    l_linenumber, CAST(floor(l_quantity) AS BIGINT) AS w
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, l_extendedprice, w,
        |    SUM(w) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS wtot
        |  FROM x)
        |SELECT l_returnflag, l_extendedprice AS w_median_price,
        |  CAST(cum AS BIGINT) AS cum, CAST(wtot AS BIGINT) AS wtot
        |FROM c
        |WHERE cum * 2 >= wtot AND (cum - w) * 2 < wtot
        |ORDER BY l_returnflag""".stripMargin,

    "q135_group_mode" ->
      """WITH c AS (SELECT l_returnflag,
        |    CAST(floor(l_quantity) AS BIGINT) AS qty, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, qty, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY cnt DESC, qty) AS rn
        |  FROM c)
        |SELECT l_returnflag, qty AS mode_qty, cnt
        |FROM r WHERE rn = 1
        |ORDER BY l_returnflag""".stripMargin,

    "q133_equidepth_bounds" ->
      """WITH r AS (SELECT l_extendedprice, l_orderkey, l_linenumber,
        |    ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber) AS rnk,
        |    COUNT(*) OVER () AS n
        |  FROM lineitem)
        |SELECT CAST(((rnk - 1) * 10) // n AS BIGINT) AS decile,
        |  CAST(rnk AS BIGINT) AS rnk, l_extendedprice, l_orderkey,
        |  l_linenumber
        |FROM r
        |WHERE (rnk * 10) // n > ((rnk - 1) * 10) // n
        |ORDER BY decile""".stripMargin,

    "q132_arg_extrema" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |    epoch_us(ts) AS ts_us,
        |    printf('%020d|%010d', epoch_us(ts), event_id) AS k
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  max_by(event_type, k) AS last_type,
        |  max_by(value, k) AS last_value,
        |  min_by(event_type, k) AS first_type,
        |  CAST(min_by(ts_us, k) AS BIGINT) AS first_ts_us
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q131_interval_proration" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |x AS (SELECT user_id, ts_us,
        |    lead(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS next_us
        |  FROM e),
        |iv AS (SELECT user_id, ts_us, next_us FROM x
        |  WHERE next_us IS NOT NULL AND next_us > ts_us),
        |d AS (SELECT user_id, ts_us, next_us,
        |    unnest(range(ts_us // 86400000000,
        |      (next_us - 1) // 86400000000 + 1)) AS day_idx
        |  FROM iv)
        |SELECT user_id, CAST(day_idx AS BIGINT) AS day_idx,
        |  COUNT(*) AS n_segs,
        |  CAST(SUM(LEAST(next_us, (day_idx + 1) * 86400000000)
        |    - GREATEST(ts_us, day_idx * 86400000000)) AS BIGINT) AS total_us
        |FROM d GROUP BY user_id, day_idx
        |ORDER BY user_id, day_idx""".stripMargin,

    "q130_time_weighted" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
        |  FROM events),
        |x AS (SELECT user_id, ts_us, value,
        |    lead(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS next_us
        |  FROM e)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS span_us,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) *
        |    ((next_us - ts_us) // 1000)) AS BIGINT) AS integral_c_ms
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q129_weighted_sample" ->
      """WITH d AS (SELECT doc_id, n_chars AS w FROM documents),
        |c AS (SELECT doc_id, w,
        |    SUM(w) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(w) OVER () AS wtot
        |  FROM d)
        |SELECT doc_id, w, CAST(cum AS BIGINT) AS cum,
        |  CAST(((cum - w) * 100) // wtot AS BIGINT) AS slot
        |FROM c
        |WHERE (cum * 100) // wtot > ((cum - w) * 100) // wtot
        |ORDER BY doc_id""".stripMargin,

    "q128_pseudonymize" ->
      """WITH c AS (SELECT substr(md5('graft-pepper|' || CAST(c_custkey AS VARCHAR)), 1, 16)
        |    AS cust_sid, c_mktsegment FROM customer),
        |o AS (SELECT substr(md5('graft-pepper|' || CAST(o_custkey AS VARCHAR)), 1, 16)
        |    AS cust_sid, o_totalprice FROM orders)
        |SELECT c.c_mktsegment, o.cust_sid, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
        |FROM o JOIN c ON o.cust_sid = c.cust_sid
        |GROUP BY c.c_mktsegment, o.cust_sid
        |ORDER BY c.c_mktsegment, o.cust_sid""".stripMargin,

    "q125_hll_sketch_merge" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS merged_within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q123_zorder_stats" ->
      s"""SELECT z // $ZBucketShift AS z_bucket, COUNT(*) AS n_rows,
         |  MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
         |  MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp,
         |  CAST(SUM(z % 1000000007) AS BIGINT) AS z_hash_sum
         |FROM (SELECT l_partkey, l_suppkey,
         |        ${zOrderSql("l_partkey", "l_suppkey")} AS z
         |      FROM lineitem)
         |GROUP BY z_bucket ORDER BY z_bucket""".stripMargin
  )
}
