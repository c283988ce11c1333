package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the fixed-point dot product —
  * the engine's demonstration of extension path (b) from the design
  * brief: a scalar that must run inside whole-stage codegen.
  *
  * `Similarity.dotInt` (the `zip_with`+`aggregate` HOF form) is
  * interpreted per lambda call; this expression generates a tight
  * primitive `for` loop over the two `ArrayData` (no boxing, no
  * per-element virtual dispatch), so declarative plans using
  * `dot_fp(a, b)` keep kernel-class performance without leaving SQL.
  *
  * Null semantics — EXACTLY those of the HOF form
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0L, (s,v) => s+v)`, so the
  * [[RewriteDotProduct]] optimizer rule may substitute this expression
  * soundly: NULL if either array is NULL, if the lengths differ
  * (zip_with pads with NULL → the sum nulls out), or if any paired
  * element is NULL.
  */
case class DotProductFP(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "dot_fp requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_fp"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the engine's native functions —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.expressions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFp)
    ext.injectFunction(GraftExtensions.polyHashFp)
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => RewritePolyHash)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    // whole-operator tier: native sort-merge as-of join (graft.plans)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // SQL UPDATE / MERGE INTO over commit-log tables (graft.plans)
    ext.injectPlannerStrategy(_ => graft.plans.CommitLogDmlStrategy)
    // erases the stats-relay holder ([[graft.plans.ScanStatsRelay]]);
    // the RULE itself cannot be injected here — no extensions hook
    // runs after V2 pushdown — so it rides extraOptimizations in
    // [[GraftExtensions.register]] (Engine calls both)
    ext.injectPlannerStrategy(_ => graft.plans.ScanStatsStrategy)
    // table-valued CDC / audit surface (Delta's table_changes parity)
    ext.injectTableFunction(GraftExtensions.tableChanges)
    ext.injectTableFunction(GraftExtensions.tableHistory)
  }
}

object GraftExtensions {
  private val dotFp = (
    new FunctionIdentifier("dot_fp"),
    new ExpressionInfo(classOf[DotProductFP].getName, "dot_fp"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "dot_fp takes exactly 2 arguments")
      DotProductFP(children.head, children(1)): Expression
    })

  private val polyHashFp = (
    new FunctionIdentifier("polyhash_fp"),
    new ExpressionInfo(classOf[PolyHashFP].getName, "polyhash_fp"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "polyhash_fp takes exactly 1 argument")
      PolyHashFP(children.head): Expression
    })

  /** `SELECT * FROM graft_table_changes('<table dir>', <afterVersion>)`
    * — the SQL surface of [[graft.sources.CommitLog.changeFeed]]
    * (Delta's `table_changes` TVF, public design): full CDC rows with
    * `_change_type` / `_commit_version` after the given version. Both
    * arguments must be literals (the plan is built at analysis time —
    * the same contract as Spark's own range()-style TVFs). */
  private val tableChanges = (
    new FunctionIdentifier("graft_table_changes"),
    new ExpressionInfo(classOf[graft.sources.CommitLog.Snapshot].getName,
      "graft_table_changes"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "graft_table_changes(path STRING, afterVersion BIGINT)")
      val path = literalString(children(0), "path")
      val after = literalLong(children(1), "afterVersion")
      graft.sources.CommitLog.changeFeed(
        org.apache.spark.sql.SparkSession.active, path, after)
        .queryExecution.analyzed
    })

  /** `SELECT * FROM graft_table_history('<table dir>')` — DESCRIBE
    * HISTORY as a TVF over [[graft.sources.CommitLog.history]]. */
  private val tableHistory = (
    new FunctionIdentifier("graft_table_history"),
    new ExpressionInfo(classOf[graft.sources.CommitLog.Snapshot].getName,
      "graft_table_history"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        "graft_table_history(path STRING)")
      val path = literalString(children(0), "path")
      graft.sources.CommitLog.history(
        org.apache.spark.sql.SparkSession.active, path)
        .queryExecution.analyzed
    })

  private def literalString(e: Expression, name: String): String = {
    require(e.foldable && e.dataType ==
      org.apache.spark.sql.types.StringType,
      s"argument '$name' must be a STRING literal")
    val v = e.eval()
    require(v != null, s"argument '$name' must not be NULL")
    v.toString
  }

  private def literalLong(e: Expression, name: String): Long = {
    require(e.foldable, s"argument '$name' must be a literal")
    e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case null => throw new IllegalArgumentException(
        s"argument '$name' must not be NULL")
      case other => throw new IllegalArgumentException(
        s"argument '$name' must be an integral literal, got $other")
    }
  }

  /** Register on an already-built session (extensions only apply at
    * build time; tests and notebooks share getOrCreate'd sessions).
    * The optimizer rule rides `experimental.extraOptimizations`, the
    * supported live-session hook for extra optimizer rules. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(dotFp._1, dotFp._2, dotFp._3)
    spark.sessionState.functionRegistry
      .registerFunction(polyHashFp._1, polyHashFp._2, polyHashFp._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      tableChanges._1, tableChanges._2, tableChanges._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      tableHistory._1, tableHistory._2, tableHistory._3)
    if (!spark.experimental.extraOptimizations.contains(RewriteDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDotProduct
    if (!spark.experimental.extraOptimizations.contains(RewritePolyHash))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewritePolyHash
    // MV answering (graft.plans.MvRewrite): a no-op while MvRegistry
    // is empty, so carrying it session-wide costs nothing
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.MvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.MvRewrite
    // statistics relay for wrapped V1Scan bridges (DV'd / mapped
    // commit-log scans) — AFTER MvRewrite, so MV matching sees the
    // un-hidden relation on the batch's first pass; must run
    // post-pushdown, hence extraOptimizations and not an extensions
    // injection ([[graft.plans.RelayV1ScanStatistics]] scaladoc)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RelayV1ScanStatistics))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.RelayV1ScanStatistics
    // check the PLANNER's assembled strategy list, not just
    // experimental.extraStrategies: a session built withExtensions
    // already carries the strategy via customPlannerStrategies, and
    // appending it again would make the planner generate duplicate
    // candidate plans for every as-of node (harmless but wasteful)
    if (!spark.sessionState.planner.strategies
        .contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    if (!spark.sessionState.planner.strategies
        .contains(graft.plans.CommitLogDmlStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+
          graft.plans.CommitLogDmlStrategy
    if (!spark.sessionState.planner.strategies
        .contains(graft.plans.ScanStatsStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+
          graft.plans.ScanStatsStrategy
  }
}
