package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.functions.TextFunctions.{HashBase, HashMod}

/** Optimizer rule — the scalar twin of [[RewriteDotProduct]]: rewrite
  * the declarative polynomial-hash fold
  *
  *   aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s, i, 1))),
  *             0L, (h, c) -> (h * 131 + c) % 1000000007)
  *
  * (the shape `TextFunctions.polyHashHof` emits, and what a SQL author
  * writing the hash by hand produces) into the codegen'd
  * [[PolyHashFP]] byte loop. The HOF chain is interpreted per
  * character and allocates the index array per row; the native loop is
  * ~6× faster on the checksum queries.
  *
  * Soundness: NULL semantics match exactly (NULL string → NULL via
  * `length`; empty → 0). The match is deliberately narrow — the exact
  * sequence/substr/ascii chain over the SAME string expression on both
  * sides, the engine's (base, mod) constants, identity finish. Value
  * equality holds on ALL inputs: [[PolyHashKernel]] folds Unicode code
  * points, exactly what `ascii(substr(s, i, 1))` yields per character
  * (Spark's `Ascii` is `codePointAt(0)`), so the rewrite is
  * universally value-preserving — pinned by ExpressionSpec's
  * non-ASCII law (round-6 fix; previously the native loop hashed
  * UTF-8 bytes under a doc-only ASCII contract).
  */
object RewritePolyHash extends Rule[LogicalPlan] {

  private def isIdentity(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ArrayTransform(
            Sequence(Literal(1, IntegerType), Length(s1), _, _),
            LambdaFunction(
              Ascii(Substring(s2, iv: NamedLambdaVariable,
                Literal(1, IntegerType))),
              Seq(ia: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(
            Remainder(
              Add(
                Multiply(hv: NamedLambdaVariable, Literal(base, LongType), _),
                Cast(cv: NamedLambdaVariable, LongType, _, _), _),
              Literal(mod, LongType), _),
            Seq(ha: NamedLambdaVariable, ca: NamedLambdaVariable), _),
          finish: LambdaFunction)
        if iv.exprId == ia.exprId && hv.exprId == ha.exprId &&
          cv.exprId == ca.exprId &&
          base == HashBase && mod == HashMod &&
          isIdentity(finish) && s1.semanticEquals(s2) &&
          s1.dataType.isInstanceOf[StringType] =>
        PolyHashFP(s1)
    }
}
