package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: recognize the composed higher-order-function cosine
  * pattern
  *
  * {{{ aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)
  *       / (sqrt(aggregate(transform(a, x -> x*x), 0.0, +))
  *          * sqrt(aggregate(transform(b, x -> x*x), 0.0, +))) }}}
  *
  * and fuse it into the single-pass codegen'd [[CosineSimilarity]]
  * kernel. Users (or generated SQL) writing the natural four-pass
  * formulation automatically get the fused loop — the same contract
  * Catalyst applies to its own built-ins, extended through
  * `SparkSessionExtensions.injectOptimizerRule` (see
  * [[graft.functions.GraftExtensions]]).
  *
  * Matching is intentionally conservative: only the exact shape above
  * (dot-product zip_with numerator, per-side self-product norms over the
  * SAME child expressions) rewrites; anything else is left untouched.
  */
object CosineFusionRule extends Rule[LogicalPlan] {

  /** The lambda body must use exactly the lambda's two declared
    * parameters, one each — (x,y) -> x*y, not x*x or y+y. */
  private def usesBothArgs(
      l: NamedLambdaVariable,
      r: NamedLambdaVariable,
      args: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]): Boolean =
    args.length == 2 && l.exprId != r.exprId &&
      Set(l.exprId, r.exprId) == args.map(_.exprId).toSet

  /** aggregate(zip_with(x, y, mul), 0.0, +) — returns (x, y). */
  private object DotAgg {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(x, y, LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _), zargs, _)),
            Literal(0.0, _) | Cast(Literal(0.0, _), _, _, _),
            LambdaFunction(Add(ax: NamedLambdaVariable, ay: NamedLambdaVariable, _), aargs, _),
            _) if usesBothArgs(mx, my, zargs) && usesBothArgs(ax, ay, aargs) =>
        Some((x, y))
      case _ => None
    }
  }

  /** sqrt(aggregate(transform(x, v -> v*v), 0.0, +)) — returns x. */
  private object NormSqrt {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(
            ArrayTransform(x, LambdaFunction(Multiply(v1: NamedLambdaVariable, v2: NamedLambdaVariable, _), _, _)),
            Literal(0.0, _) | Cast(Literal(0.0, _), _, _, _),
            LambdaFunction(Add(a1: NamedLambdaVariable, a2: NamedLambdaVariable, _), aargs, _),
            _)) if v1.exprId == v2.exprId && usesBothArgs(a1, a2, aargs) =>
        Some(x)
      case _ => None
    }
  }

  /** The HOF form returns NULL for null arrays, mismatched lengths
    * (zip_with null-pads) and null elements, and NaN (0.0/0.0) for
    * zero-norm vectors. The rewrite preserves ALL of those semantics via
    * the kernel's own `hofCompat` mode — the checks run inside the fused
    * loop, so each input array is evaluated exactly ONCE. (An earlier
    * formulation composed IsNull/Size/ArrayExists guard expressions
    * around the kernel; each guard re-evaluated the input expressions per
    * row, which erased the kernel's speedup entirely.) */
  /** Strip a `transform(x, v -> cast(v as double))` wrapper over a FLOAT
    * array: the kernel reads float elements natively and widens each to
    * double in-register, so the per-row materialization of a cast copy is
    * pure waste. Value-identical (same widening), and null-element /
    * length semantics are checked against the raw array, which transform
    * preserves 1:1. */
  private def stripCastTransform(e: Expression): Expression = e match {
    case ArrayTransform(x, LambdaFunction(
          Cast(cv: NamedLambdaVariable, org.apache.spark.sql.types.DoubleType, _, _),
          Seq(v: NamedLambdaVariable), _))
        if cv.exprId == v.exprId &&
          x.dataType == org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, false) =>
      x
    case ArrayTransform(x, LambdaFunction(
          Cast(cv: NamedLambdaVariable, org.apache.spark.sql.types.DoubleType, _, _),
          Seq(v: NamedLambdaVariable), _))
        if cv.exprId == v.exprId &&
          x.dataType == org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, true) =>
      x
    case _ => e
  }

  private def guarded(a: Expression, b: Expression): Expression =
    CosineSimilarity(stripCastTransform(a), stripCastTransform(b), hofCompat = true)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotAgg(a, b), Multiply(NormSqrt(na), NormSqrt(nb), _), _)
          if (a.semanticEquals(na) && b.semanticEquals(nb)) ||
            (a.semanticEquals(nb) && b.semanticEquals(na)) =>
        guarded(a, b)
    }
}
