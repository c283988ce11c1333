package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The native codegen'd dot_fp expression and its session-extension
  * registration: value parity with the HOF form and the JVM kernel,
  * null semantics, SQL-callable. */
class ExpressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.expressions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // under sbt the suites share one JVM-wide session that may have
    // been built without extensions — register on the live session too
    graft.expressions.GraftExtensions.register(s)
    s
  }

  test("dot_fp == declarative dotInt on fixed-point vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(0.5f, -0.25f, 0.125f), Array(1.0f, 0.5f, -1.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
      .select(Similarity.fixedPoint(col("a")).as("fa"),
        Similarity.fixedPoint(col("b")).as("fb"))
    val native = df.selectExpr("dot_fp(fa, fb) AS d")
      .collect().map(_.getLong(0)).toSeq
    val hof = df.select(Similarity.dotInt(col("fa"), col("fb")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(native == hof)
  }

  test("dot_fp null-propagates on NULL arrays, callable from SQL") {
    import spark.implicits._
    Seq((Some(Array(1L, 2L)), Some(Array(3L, 4L))),
      (None, Some(Array(3L, 4L))))
      .toDF("a", "b").createOrReplaceTempView("v")
    val got = spark.sql("SELECT dot_fp(a, b) FROM v ORDER BY 1 NULLS LAST")
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == Seq(11L, null))
  }

  test("RewriteDotProduct: HOF dotInt optimizes to dot_fp, same results") {
    // parquet-backed so ConvertToLocalRelation can't fold the plan
    // away before the rewrite is observable
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), Similarity.fixedPoint(col("embedding")).as("fv"))
    val hofQuery = df.select(col("vec_id"),
      Similarity.dotInt(col("fv"), col("fv")).as("d"))
    // the optimizer must have substituted the codegen'd expression
    val opt = hofQuery.queryExecution.optimizedPlan.toString
    assert(opt.contains("dot_fp"), opt)
    assert(!opt.contains("aggregate("), opt)
    // and values equal the explicit native call, row by row
    val viaRule = hofQuery.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = df.selectExpr("vec_id", "dot_fp(fv, fv) AS d").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaRule == native && viaRule.nonEmpty)
  }

  test("rewrite soundness: edge semantics match the HOF exactly") {
    import spark.implicits._
    // length mismatch and a NULL element must stay NULL under the
    // rewrite (the semantics DotProductFP was aligned to)
    val df = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L)))),         // lengths differ
      (Some(Seq(Some(1L), None)), Some(Seq(Some(3L), Some(4L)))),   // null element
      (Some(Seq(Some(2L), Some(3L))), Some(Seq(Some(4L), Some(5L)))) // clean
    ).toDF("a", "b")
    val got = df.select(Similarity.dotInt(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.toSeq == Seq(null, null, 23L))
    val nat = df.selectExpr("dot_fp(a, b) AS d")
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(nat.toSeq == got.toSeq)
  }

  test("polyhash_fp: native == HOF == JVM kernel on the corpus; null/empty edges") {
    import graft.functions.TextFunctions
    val docs = sources.Catalog.table(spark, "/root/testdata/sf0.001", "documents")
    val tri = docs.select(
      TextFunctions.polyHash(col("text")).as("native"),
      TextFunctions.polyHashHof(col("text")).as("hof"))
    assert(tri.filter(col("native") =!= col("hof")).count() === 0)
    // JVM kernel parity on a driver sample
    val rows = docs.select(col("text")).limit(50).collect().map(_.getString(0))
    val viaExpr = docs.limit(50).select(TextFunctions.polyHash(col("text")))
      .collect().map(_.getLong(0))
    assert(rows.map(TextFunctions.polyHashJvm).toSeq === viaExpr.toSeq)
    // edges: NULL -> NULL, empty -> 0; SQL-callable via the registry
    import spark.implicits._
    val edge = Seq((1, null: String), (2, "")).toDF("id", "s")
      .select(col("id"), TextFunctions.polyHash(col("s")).as("h"))
      .orderBy(col("id")).collect()
    assert(edge(0).isNullAt(1))
    assert(edge(1).getLong(1) === 0L)
    edge.length // keep
    val sqlRes = spark.sql("SELECT polyhash_fp('ab')").first().getLong(0)
    assert(sqlRes === (97L * 131 + 98) % 1000000007L)
  }

  test("polyhash_fp folds Unicode code points: non-ASCII parity, " +
      "so RewritePolyHash is value-preserving on ALL inputs") {
    import graft.functions.TextFunctions
    import spark.implicits._
    // accents (2-byte UTF-8), CJK (3-byte), emoji (4-byte, surrogate
    // pair in UTF-16) — every decode width, plus a pure-ASCII control
    val samples = Seq("héllo wörld", "日本語のテキスト", "emoji 🚀 pair",
      "mixed Ω≈ç√ señor", "plain ascii control")
    // independent reference: the declarative spec's arithmetic
    // (ascii == code point) folded via the JDK's own codePoints()
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, cp) => (h * 131 + cp) % 1000000007L)
    val got = samples.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("id", "s")
      .select(col("id"), TextFunctions.polyHash(col("s")).as("native"),
        TextFunctions.polyHashHof(col("s")).as("hof"))
      .orderBy(col("id")).collect()
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i).getLong(1) === ref(s), s"native on '$s'")
      assert(got(i).getLong(2) === ref(s), s"HOF path on '$s'")
      assert(TextFunctions.polyHashJvm(s) === ref(s), s"JVM kernel on '$s'")
    }
  }

  test("polyhash_fp: native == HOF on malformed UTF-8 (replacement-char fold)") {
    // cast(binary as string) wraps raw bytes as UTF8String without
    // validation — the one route by which invalid byte sequences reach
    // string expressions. The native kernel must fold exactly what
    // ascii(substr(s,i,1)) yields per segmented char (U+FFFD on any
    // malformation), or RewritePolyHash is value-changing on such rows.
    import graft.functions.TextFunctions
    import spark.implicits._
    val cases: Seq[(Int, Array[Byte])] = Seq(
      1 -> Array(0x80), // stray continuation byte as lead
      2 -> Array(0x41, 0x80, 0x42), // ...embedded mid-string
      3 -> Array(0xC3, 0x28), // 2-byte lead, bad continuation
      4 -> Array(0xC0, 0x80), // overlong NUL (CESU)
      5 -> Array(0xE2, 0x82), // truncated 3-byte char at end
      6 -> Array(0xE0, 0x80, 0x80), // overlong 3-byte
      7 -> Array(0xED, 0xA0, 0x80), // UTF-16 surrogate half
      8 -> Array(0xF0, 0x28, 0x8C, 0x28), // 4-byte lead, bad continuations
      9 -> Array(0xF5, 0x80, 0x80, 0x80), // > U+10FFFF lead
      10 -> Array(0xFF, 0x41), // invalid lead byte, then ASCII
      11 -> Array(0xC3, 0xA9, 0x80, 0xE6, 0x97, 0xA5) // valid é, stray cont, valid 日
    ).map { case (id, a) => (id, a.map(_.toByte)) }
    val got = cases.toDF("id", "b")
      .select(col("id"), col("b").cast("string").as("s"))
      .select(col("id"),
        TextFunctions.polyHash(col("s")).as("native"),
        TextFunctions.polyHashHof(col("s")).as("hof"))
      .orderBy(col("id")).collect()
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"native != HOF on malformed case id=${r.getInt(0)}")
    }
  }

  test("RewritePolyHash: the HOF hash pattern optimizes to polyhash_fp, same results") {
    import graft.functions.TextFunctions
    val docs = sources.Catalog.table(spark, "/root/testdata/sf0.001", "documents")
    val hof = docs.select(col("doc_id"),
      TextFunctions.polyHashHof(col("text")).as("h"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("polyhash_fp"),
      s"HOF pattern must rewrite to polyhash_fp; plan:\n$optimized")
    assert(!optimized.contains("aggregate(transform"),
      "the interpreted HOF chain must be gone after the rewrite")
    // and the rewritten plan computes the same values as the native form
    val native = docs.select(col("doc_id"),
      TextFunctions.polyHash(col("text")).as("h"))
    assert(hof.exceptAll(native).count() === 0)
    assert(native.exceptAll(hof).count() === 0)
  }

  test("dot_fp participates in whole-stage codegen on a parquet scan") {
    // a real scan (local Seqs constant-fold into LocalTableScan)
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(Similarity.fixedPoint(col("embedding")).as("fv"))
      .selectExpr("dot_fp(fv, fv) AS norm_fp")
    // codegen stages print with a `*(n)` prefix; dot_fp must be inside
    // one (note: the HOF `transform` Project prints WITHOUT `*` — it
    // cannot codegen, which is exactly why dot_fp exists)
    val plan = emb.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[dot_fp.*"), plan)
    // unit vectors: fixed-point self-dot ≈ 1e14 (within fp truncation)
    val norms = emb.collect().map(_.getLong(0))
    assert(norms.forall(n => math.abs(n - 1e14) < 1e10))
  }

  test("graft_table_changes / graft_table_history TVFs: the CDC and " +
      "audit surfaces in plain SQL") {
    import spark.implicits._
    import graft.sources.CommitLog
    val t = java.nio.file.Files
      .createTempDirectory("graft_tvf_").resolve("tbl").toString
    try {
      CommitLog.append(spark, t,
        Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
      CommitLog.append(spark, t, Seq((3L, "c")).toDF("id", "name"))
      CommitLog.delete(spark, t, col("id") === 2L)
      val feed = spark.sql(
        s"SELECT _change_type, _commit_version, id FROM " +
          s"graft_table_changes('$t', 1) ORDER BY _commit_version, id")
      assert(feed.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
        Seq(("insert", 2L, 3L), ("delete", 3L, 2L)))
      // TVF composes with ordinary SQL (aggregation over the feed)
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graft_table_changes('$t', 0) " +
          "WHERE _change_type = 'insert'").collect()(0).getLong(0) === 3L)
      val hist = spark.sql(
        s"SELECT version, op FROM graft_table_history('$t') " +
          "ORDER BY version")
      assert(hist.collect().map(r => (r.getLong(0), r.getString(1)))
        .toSeq === Seq((1L, "append"), (2L, "append"), (3L, "delete")))
      // non-literal args refuse loudly
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_table_changes('$t', id)")
      }
      assert(e.getMessage.toLowerCase.contains("literal") ||
        e.getMessage.toLowerCase.contains("resolve"))
    } finally {
      def go(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(go)); f.delete(): Unit
      }
      go(new java.io.File(t).getParentFile)
    }
  }
}
