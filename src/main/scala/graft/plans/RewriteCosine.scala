package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the declarative higher-order-function cosine
  * pattern ([[graft.functions.VectorOps.cosine]]) into the fused
  * [[CosineSimilarity]] expression.
  *
  * The declarative form materializes an intermediate array per row
  * (`zip_with`) and runs three lambda folds (dot, |a|², |b|²); the fused
  * expression is one allocation-free loop with whole-stage codegen. With
  * this rule injected (via [[GraftExtensions]]), a user who writes the
  * composable form gets the fused plan automatically — the Catalyst way
  * of shipping a kernel: declare the semantics, let a rule pick the
  * physical form.
  *
  * The match is deliberately strict — the exact tree `VectorOps.cosine`
  * produces, with lambda-variable identities verified — so it cannot
  * mis-fire on superficially similar expressions. Null elements are
  * handled identically by both forms: the HOF form null-propagates
  * through zip_with/aggregate, and [[CosineSimilarity]] scans for null
  * elements (only when the array type says containsNull) and yields NULL.
  * Remaining caveat: on ragged pairs (arrays of unequal length) the HOF
  * form yields NULL (zip_with pads with nulls) while the fused form
  * scores the common prefix; the rewrite assumes fixed-dimension
  * embedding columns, which is the only shape `VectorOps.cosine` is
  * documented for.
  */
object RewriteCosine extends Rule[LogicalPlan] {

  /** Strips VectorOps.asDouble — `transform(v, x -> cast(x as double))` —
    * so the underlying array column can be compared across the three dot
    * products and handed to the fused expression (which widens
    * internally).
    */
  private def base(e: Expression): Expression = e match {
    case ArrayTransform(child,
        LambdaFunction(c @ Cast(x: NamedLambdaVariable, DoubleType, _, _),
          Seq(ax: NamedLambdaVariable), _))
      if x.exprId == ax.exprId => child
    case other => other
  }

  /** Matches VectorOps.dot:
    * `aggregate(zip_with(a', b', (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`.
    */
  private object DotProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(la, lb,
            LambdaFunction(
              Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
              Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
            Seq(aacc: NamedLambdaVariable, av: NamedLambdaVariable), _),
          _)
        if x.exprId == ax.exprId && y.exprId == ay.exprId &&
          acc.exprId == aacc.exprId && v.exprId == av.exprId =>
        Some((base(la), base(lb)))
      case _ => None
    }
  }

  /** Matches the full guarded quotient:
    * `CASE WHEN norm(a)*norm(b) = 0 THEN 0.0 ELSE dot(a,b)/(norm(a)*norm(b))`.
    */
  private object CosinePattern {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case CaseWhen(
          Seq((EqualTo(n1, Literal(0.0, DoubleType)), Literal(0.0, DoubleType))),
          Some(Divide(DotProduct(a, b), n2, _)))
        if n1.semanticEquals(n2) =>
        n1 match {
          case Multiply(Sqrt(DotProduct(a1, a2)), Sqrt(DotProduct(b1, b2)), _)
            if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
              a1.semanticEquals(a) && b1.semanticEquals(b) =>
            Some((a, b))
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosinePattern(a, b) => CosineSimilarity(a, b)
    }
}
