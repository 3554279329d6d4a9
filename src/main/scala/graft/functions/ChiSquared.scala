package graft.functions

import org.apache.commons.math3.special.Gamma
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static chi-squared survival function P(X²_df >= x) = Q(df/2, x/2)
  * (regularized upper incomplete gamma) — a pure static call, so codegen
  * can invoke it directly (the [[StudentT]] pattern).
  */
object ChiSquared {
  def sf(x: Double, df: Double): Double = {
    if (x.isNaN || df.isNaN || df <= 0.0) return Double.NaN
    if (x <= 0.0) return 1.0
    if (x.isInfinite) return 0.0
    Gamma.regularizedGammaQ(df / 2.0, x / 2.0)
  }
}

/** The chi-squared tail probability as a native Catalyst Expression —
  * turns the a23 independence statistic into an inferential p-value
  * without leaving whole-stage codegen (no UDF boxing). Registered as the
  * SQL function `graft_chisq_sf(x, df)` by [[graft.GraftExtensions]].
  */
case class ChiSquaredSf(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_chisq_sf"

  override protected def nullSafeEval(x: Any, df: Any): Any =
    ChiSquared.sf(x.asInstanceOf[Double], df.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, df) => s"graft.functions.ChiSquared.sf($x, $df)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChiSquaredSf =
    copy(left = newLeft, right = newRight)
}
