package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Expression, LambdaFunction, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)
  *
  * into the codegen'd [[DotProduct]] expression, whenever a and b are
  * array<double>. The two are bit-identical by construction (same
  * left-to-right accumulation order; DotProduct's null semantics mirror the
  * fold's), so this is a pure performance rewrite: users who write the
  * idiomatic higher-order-function formulation get the primitive
  * whole-stage-codegen loop for free instead of an interpreted
  * HigherOrderFunction tree with per-row array allocation (~6x on the
  * vector-similarity operators' hot path, see PERF.md round 2).
  *
  * Injected by [[GraftExtensions]] (`spark.sql.extensions=...`), running in
  * the user-provided optimizer batch on the resolved plan — lambda
  * variables are bound by then, so identity is checked by exprId.
  */
object DotFoldRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object ZeroD {
    def unapply(e: Expression): Boolean = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(0.0d, DoubleType) => true
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            zero @ ZeroD(),
            LambdaFunction(Add(ax: NamedLambdaVariable, av: NamedLambdaVariable, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(farg: NamedLambdaVariable), _))
          if isDoubleArray(a) && isDoubleArray(b) &&
            // product of exactly the two zipped elements (either order)
            ((mx.exprId == zx.exprId && my.exprId == zy.exprId) ||
             (mx.exprId == zy.exprId && my.exprId == zx.exprId)) &&
            // merge is acc + element, acc on the LEFT (accumulation order)
            ax.exprId == acc.exprId && av.exprId == v.exprId &&
            // finish is identity
            fin.exprId == farg.exprId =>
        DotProduct(a, b)
    }
}
