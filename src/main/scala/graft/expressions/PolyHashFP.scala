package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions.{HashBase, HashMod}

/** Native Catalyst expression for the corpus polynomial hash — the
  * scalar twin of [[DotProductFP]]: `graft.functions.TextFunctions
  * .polyHash` in a single codegen'd byte loop instead of an
  * interpreted per-character HOF chain
  * (`aggregate(transform(sequence(...), ascii(substr)))` allocates an
  * int array per row and dispatches two lambdas per character; this
  * expression is one tight loop over the string's bytes inside
  * whole-stage codegen — ~6× on the q121 row-checksum sweep).
  *
  * Contract: ASCII corpus (byte == character == `ascii()` below 128 —
  * the same contract `TextFunctions.polyHashJvm` documents; the three
  * forms are law-pinned equal in ExpressionSpec). NULL → NULL, empty
  * string → 0, matching the HOF form.
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

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * HashBase + (s.getByte(i) & 0xFF)) % HashMod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |int $n = $c.numBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * ${HashBase}L + ($c.getByte($i) & 0xFF)) % ${HashMod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
