package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the corpus polynomial hash — the
  * scalar twin of [[DotProductFP]]: `graft.functions.TextFunctions
  * .polyHash` in a single codegen'd loop instead of an interpreted
  * per-character HOF chain
  * (`aggregate(transform(sequence(...), ascii(substr)))` allocates an
  * int array per row and dispatches two lambdas per character; this
  * expression is one tight in-place UTF-8 decode+fold inside
  * whole-stage codegen — ~6× on the q121 row-checksum sweep).
  *
  * Folds UNICODE CODE POINTS via [[PolyHashKernel]], matching
  * `ascii()` semantics on ALL inputs — not just ASCII — so
  * [[RewritePolyHash]] is universally value-preserving (the three
  * forms native/HOF/JVM are law-pinned equal in ExpressionSpec,
  * non-ASCII included). NULL → NULL, empty string → 0, matching the
  * HOF form.
  */
case class PolyHashFP(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"polyhash_fp requires a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "polyhash_fp"

  override def nullSafeEval(input: Any): Any =
    PolyHashKernel.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // static call into the shared kernel (same code path as the
      // interpreted eval — cannot drift); JIT inlines the loop, no
      // per-row allocation
      s"${ev.value} = graft.expressions.PolyHashKernel.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
