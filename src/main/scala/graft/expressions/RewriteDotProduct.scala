package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule — extension path (c) of the design brief: rewrite
  * the declarative fixed-point dot product
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0L, (s, v) => s + v)
  *
  * (the shape `Similarity.dotInt` emits) into the codegen'd
  * [[DotProductFP]] primitive loop. Spark's higher-order-function
  * lambdas are interpreted per element — the measured order-of-
  * magnitude gap that pushed the engine's hot kernels into
  * `mapPartitions` — so plans that state the dot product declaratively
  * get kernel-class performance without the author knowing `dot_fp`
  * exists.
  *
  * Soundness: [[DotProductFP]]'s null semantics were defined to match
  * the HOF form exactly (NULL on null array, length mismatch, or any
  * NULL pair). The match is deliberately narrow — exact multiply/add
  * lambda bodies over the lambda's own variables, zero literal 0L,
  * identity finish, both inputs array<bigint> — anything else is left
  * untouched. Arithmetic eval context (ANSI vs legacy) is NOT part of
  * the guard: the native loop uses wrapped 64-bit arithmetic, so under
  * ANSI mode a would-be overflow ERROR becomes a wrapped value — in
  * the expression's domain (fixed-point vectors from `fixedPoint` /
  * `quantizeInt8`: |element| ≤ 1e7, products ≤ 1e14) overflow needs
  * ≥ ~9·10⁴ dimensions, far past any embedding this engine stores, so
  * values agree everywhere the HOF evaluates at all.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isIdentity(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
    case _ => false
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(
            Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(
            Add(s: NamedLambdaVariable, v: NamedLambdaVariable, _),
            Seq(sa: NamedLambdaVariable, va: NamedLambdaVariable), _),
          finish: LambdaFunction)
        if x.exprId == xa.exprId && y.exprId == ya.exprId &&
          s.exprId == sa.exprId && v.exprId == va.exprId &&
          isIdentity(finish) && isLongArray(l) && isLongArray(r) =>
        DotProductFP(l, r)
    }
}
