package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the PORTABLE higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D,
  * (acc, v) -> acc + v)` — into the fused native [[DotProductExpr]].
  *
  * Users (and the reference-portable [[graft.operators.Similarity.dot]]
  * form) can write the standard-SQL shape; sessions built with
  * [[graft.GraftExtensions]] execute the single codegen'd loop instead
  * of two lambda dispatches plus an intermediate array per row. The
  * match is deliberately strict — exact multiply/add lambda bodies over
  * the lambda's own variables, double-typed zero — so any semantically
  * different aggregate is left untouched. [[DotProductExpr]] reproduces
  * the HOF's null semantics (length mismatch or a null element → NULL),
  * so the rewrite is observationally equivalent, not just fast.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _),
                Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(ax, ay, _),
              Seq(lacc: NamedLambdaVariable, lv: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(lfin: NamedLambdaVariable), _))
          if sameVar(mx, lx) && sameVar(my, ly) &&
            sameVar(ax, lacc) && sameVar(ay, lv) && sameVar(fin, lfin) =>
        DotProductExpr(a, b)
    }
}
