package graft.optimizer

import graft.functions.DotF
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Injected optimizer rule (SURVEY.md §4.3a — the
  * `SparkSessionExtensions.injectOptimizerRule` hook): rewrites the
  * interpreted higher-order dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *               0d, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotF]] kernel. Users keep writing the portable
  * declarative form; the engine runs the tight loop. Safe because DotF
  * reproduces the fold exactly: left-to-right double accumulation,
  * multiply commutes bit-identically, null elements poison the sum on
  * both paths, and unequal-length inputs yield null on both paths
  * (zip_with pads with nulls; DotF checks lengths up front).
  */
object FoldDotProduct extends Rule[LogicalPlan] {

  /** The lambda-variable (possibly behind a to-double cast) — returns its
    * exprId.
    */
  private def lambdaVar(e: Expression): Option[ExprId] = e match {
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v.exprId)
    case v: NamedLambdaVariable if v.dataType == DoubleType => Some(v.exprId)
    case _ => None
  }

  private def isDotArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(aa, av, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
        if isDotArray(l) && isDotArray(r) &&
          // product of the two zip vars, either order (x*y == y*x in IEEE)
          Set(lambdaVar(mx), lambdaVar(my)) == Set(Some(x.exprId), Some(y.exprId)) &&
          // merge is acc + v, either order
          Set(lambdaVar(aa), lambdaVar(av)) == Set(Some(acc.exprId), Some(v.exprId)) &&
          // finish is identity
          fin.exprId == fv.exprId =>
      DotF(l, r)
  }
}
