package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognizes the declarative vector-fold idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)
  *
  * and rewrites it to the native codegen'd [[DotProduct]]; a second pattern
  * folds `dot/(sqrt(dot(a,a)) * sqrt(dot(b,b)))` into [[CosineSimilarity]].
  * Sound because both sides compute the identical IEEE-754 double sequence
  * (left-to-right fold, elements cast to double) — this is purely a
  * physical-speed rewrite, the reference-semantics analogue of the
  * hash-join substitution rule in the reference's optimizer
  * (/root/reference components/planner/optimizer/rules/hash_join.cpp:22-73:
  * same plan meaning, faster operator picked by pattern).
  *
  * Installed by [[GraftExtensions]] via injectOptimizerRule, so any user
  * who writes the portable HOF spelling gets native throughput without
  * knowing graft_dot exists.
  */
object RewriteVectorFolds extends Rule[LogicalPlan] {

  private def isDoubleElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** x, possibly wrapped in a cast-to-double. */
  private def unwrapCast(e: Expression): Expression = e match {
    case Cast(child, DoubleType, _, _) => child
    case other => other
  }

  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable,
              y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(aAcc, aV, _), Seq(acc: NamedLambdaVariable,
            v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
        if isDoubleElem(a) && isDoubleElem(b) &&
          unwrapCast(mx).semanticEquals(x) && unwrapCast(my).semanticEquals(y) &&
          aAcc.semanticEquals(acc) && aV.semanticEquals(v) &&
          fin.semanticEquals(facc) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // cosine shape first (otherwise the inner dots get consumed)
      case Divide(DotFold(a1, b1),
          Multiply(
            StaticInvokeSqrt(DotFold(a2, a3)),
            StaticInvokeSqrt(DotFold(b2, b3)), _), _)
        if a1.semanticEquals(a2) && a2.semanticEquals(a3) &&
          b1.semanticEquals(b2) && b2.semanticEquals(b3) =>
        CosineSimilarity(a1, b1)
      case DotFold(a, b) => DotProduct(a, b)
    }

  /** sqrt(x) in Catalyst is the Sqrt unary expression. */
  private object StaticInvokeSqrt {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(child) => Some(child)
      case _ => None
    }
  }
}
