package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static digamma/trigamma delegates (commons-math) — pure static calls so
  * codegen invokes them directly, same pattern as [[StudentT]] /
  * [[ChiSquared]].
  */
object GammaFns {
  def digamma(x: Double): Double =
    if (x.isNaN) Double.NaN
    else org.apache.commons.math3.special.Gamma.digamma(x)
  def trigamma(x: Double): Double =
    if (x.isNaN) Double.NaN
    else org.apache.commons.math3.special.Gamma.trigamma(x)
  def logGamma(x: Double): Double =
    if (x.isNaN || x <= 0.0) Double.NaN
    else org.apache.commons.math3.special.Gamma.logGamma(x)
}

private[functions] trait GammaUnary extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${child.dataType}")
}

/** ψ(x) as a native codegen Expression — the eBayes prior fit's per-probe
  * log-variance adjustment runs over probe-count rows (millions at scale),
  * where a Scala UDF would box every row and break whole-stage codegen.
  * Registered as `graft_digamma` by [[graft.GraftExtensions]].
  */
case class DigammaExpr(child: Expression) extends GammaUnary {
  override def prettyName: String = "graft_digamma"
  override protected def nullSafeEval(x: Any): Any =
    GammaFns.digamma(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.GammaFns.digamma($x)")
  override protected def withNewChildInternal(newChild: Expression): DigammaExpr =
    copy(child = newChild)
}

/** ln Γ(x) — the log-factorial workhorse behind exact combinatorial
  * tests (hypergeometric terms of Fisher's exact test are differences of
  * six lgammas, each row-local over the k-support). Delegates to
  * commons-math's Lanczos fit (≈1e-15 relative — DuckDB's C `lgamma`
  * agrees far below the 1e-6 oracle rounding). NaN outside x > 0.
  * Registered as `graft_lgamma`.
  */
case class LogGammaExpr(child: Expression) extends GammaUnary {
  override def prettyName: String = "graft_lgamma"
  override protected def nullSafeEval(x: Any): Any =
    GammaFns.logGamma(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.GammaFns.logGamma($x)")
  override protected def withNewChildInternal(newChild: Expression): LogGammaExpr =
    copy(child = newChild)
}

/** ψ′(x) — the companion spread term of the same fit. Registered as
  * `graft_trigamma`.
  */
case class TrigammaExpr(child: Expression) extends GammaUnary {
  override def prettyName: String = "graft_trigamma"
  override protected def nullSafeEval(x: Any): Any =
    GammaFns.trigamma(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.GammaFns.trigamma($x)")
  override protected def withNewChildInternal(newChild: Expression): TrigammaExpr =
    copy(child = newChild)
}
