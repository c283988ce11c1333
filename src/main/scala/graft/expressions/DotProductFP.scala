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
  * Null semantics: NULL if either array is NULL (standard binary
  * null-propagation); null elements are read as 0 (fixed-point vectors
  * are produced dense by `Similarity.fixedPoint`).
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
  override def prettyName: String = "dot_fp"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getLong(i) * y.getLong(i)
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
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

  /** Register on an already-built session (extensions only apply at
    * build time; tests and notebooks share getOrCreate'd sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(dotFp._1, dotFp._2, dotFp._3)
}
