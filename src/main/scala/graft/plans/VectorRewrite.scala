package graft.plans

import graft.functions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the higher-order-function formulation of a
  * vector dot product,
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * into the native [[graft.functions.DotProduct]] fold — same double
  * sequential-accumulation semantics, but one pass over the two array
  * buffers with primitive accumulators instead of materializing the
  * zipped intermediate array and interpreting two lambdas per element.
  * Users (and SQL authors) can keep writing the declarative HOF form;
  * the plan gets the fast expression.
  *
  * Conservative by construction: fires only when the multiply operands
  * are exactly the two zip lambda variables (modulo numeric casts), the
  * fold zero is literal 0.0, and the merge is a plain `acc + v` of the
  * fold's own lambda variables, with float/double array inputs. Anything
  * else is left untouched.
  */
object VectorDotRewrite extends Rule[LogicalPlan] {

  /** Strip numeric widening casts wrapped around lambda variables. */
  private def unwrap(e: Expression): Expression = e match {
    case Cast(child, DoubleType, _, _) => unwrap(child)
    case other => other
  }

  private def isVar(e: Expression, v: NamedExpression): Boolean = unwrap(e) match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def vectorTyped(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(mulBody, Seq(x, y), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(addBody, Seq(acc, v), _),
          finish @ LambdaFunction(finishBody, Seq(fv), _))
        if vectorTyped(a) && vectorTyped(b) &&
          (unwrap(mulBody) match {
            case Multiply(l, r, _) =>
              (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
            case _ => false
          }) &&
          (unwrap(addBody) match {
            case Add(l, r, _) =>
              (isVar(l, acc) && isVar(r, v)) || (isVar(l, v) && isVar(r, acc))
            case _ => false
          }) &&
          isVar(finishBody, fv) =>
      DotProduct(a, b)
  }
}

/** Builder-time injection: `SparkSession.builder()
  * .withExtensions(new GraftExtensions())` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Live sessions can
  * instead set `spark.experimental.extraOptimizations`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => VectorDotRewrite)
}
