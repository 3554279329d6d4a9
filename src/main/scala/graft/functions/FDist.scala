package graft.functions

import org.apache.commons.math3.special.Beta
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static F-distribution survival function P(F_{d1,d2} >= x) =
  * I_{d2/(d2+d1·x)}(d2/2, d1/2) (regularized incomplete beta) — the one
  * special function the engine was missing to complete ANOVA inference
  * (reference tests always return p-values, e.g.
  * /root/reference/plots.R:139-162). Pure static call so codegen invokes
  * it directly (the [[StudentT]]/[[ChiSquared]] pattern).
  */
object FDist {
  def sf(x: Double, d1: Double, d2: Double): Double = {
    if (x.isNaN || d1.isNaN || d2.isNaN || d1 <= 0.0 || d2 <= 0.0) return Double.NaN
    if (x <= 0.0) return 1.0
    if (x.isInfinite) return 0.0
    Beta.regularizedBeta(d2 / (d2 + d1 * x), d2 / 2.0, d1 / 2.0)
  }
}

/** The F tail probability as a native Catalyst Expression — turns the k13
  * per-probe ANOVA statistic into an inferential p-value without leaving
  * whole-stage codegen. Registered as `graft_f_sf(x, df1, df2)` by
  * [[graft.GraftExtensions]].
  */
case class FDistSf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double, double), got ${children.map(_.dataType).mkString("(", ", ", ")")}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_f_sf"

  override protected def nullSafeEval(x: Any, d1: Any, d2: Any): Any =
    FDist.sf(x.asInstanceOf[Double], d1.asInstanceOf[Double], d2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, d1, d2) => s"graft.functions.FDist.sf($x, $d1, $d2)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): FDistSf =
    copy(first = newFirst, second = newSecond, third = newThird)
}
