package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  *             (acc, v) -> acc + v)
  *
  * into the native codegen'd [[FloatVectorDot]] — same left-to-right
  * double fold, bit-identical result, but a primitive loop inside
  * whole-stage codegen instead of two interpreted lambdas per element.
  * Users (and the ops library's reference implementation
  * `Similarity.dot`) write the declarative form; every plan gets the
  * fast path. Injected via [[GraftExtensions]].
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private def vecType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** x (possibly wrapped in casts to double) resolves to lambda var v */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(c, DoubleType, _, _) => isVar(c, v)
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(aAcc, aV, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            finish)
          if vecType(a) && vecType(b) &&
            ((isVar(mx, x) && isVar(my, y)) || (isVar(mx, y) && isVar(my, x))) &&
            isVar(aAcc, acc) && isVar(aV, v) &&
            isIdentityFinish(finish) =>
        FloatVectorDot(a, b)
    }

  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }
}
