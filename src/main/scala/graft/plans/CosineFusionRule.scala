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

  /** The fused kernel truncates to the shorter array and reads element
    * slots directly, while the HOF form returns NULL when the input
    * arrays are null, when the lengths differ (zip_with null-pads), or
    * when any element is null — and returns NaN (0.0/0.0) for zero-norm
    * vectors, where the kernel yields NULL. The rewrite preserves ALL of
    * those semantics: explicit null guards return NULL, and a Coalesce
    * maps the kernel's zero-norm NULL back to the HOF's NaN (NaN sorts
    * greatest in Spark, so silently swapping it for NULL would reorder
    * user rankings). When the schema guarantees non-null elements, only
    * the null-input and length checks remain. */
  private def guarded(a: Expression, b: Expression): Expression = {
    val nullD = Literal(null, org.apache.spark.sql.types.DoubleType)
    def sz(e: Expression) = Size(e, legacySizeOfNull = false)
    def hasNullElem(e: Expression): Option[Expression] = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(et, true) =>
        val v = NamedLambdaVariable("gx", et, nullable = true)
        Some(ArrayExists(e, LambdaFunction(IsNull(v), Seq(v))))
      case _ => None
    }
    val checks = Seq(Not(EqualTo(sz(a), sz(b)))) ++ hasNullElem(a) ++ hasNullElem(b)
    If(
      Or(IsNull(a), IsNull(b)),
      nullD,
      If(
        checks.reduce(Or),
        nullD,
        Coalesce(Seq(CosineSimilarity(a, b), Literal(Double.NaN)))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotAgg(a, b), Multiply(NormSqrt(na), NormSqrt(nb), _), _)
          if (a.semanticEquals(na) && b.semanticEquals(nb)) ||
            (a.semanticEquals(nb) && b.semanticEquals(na)) =>
        guarded(a, b)
    }
}
