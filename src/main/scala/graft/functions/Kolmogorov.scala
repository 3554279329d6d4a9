package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Asymptotic Kolmogorov survival function
  * Q(t) = 2 Σ_{k≥1} (-1)^{k-1} exp(-2 k² t²) — the limiting two-sample KS
  * p-value at statistic t = D·sqrt(n·m/(n+m)) (the k11 `ks_stat` column).
  * The alternating series converges in ~10 terms for t ≳ 0.3; terms are
  * summed until they vanish below 1e-16 with a fixed 100-term cap. For
  * t → 0 the series needs many terms and Q → 1, so tiny t short-circuits
  * to 1 (matching the commons-math `approximateP` behavior the spec
  * asserts against). Pure static call — codegen invokes it directly.
  */
object Kolmogorov {
  def sf(t: Double): Double = {
    if (t.isNaN) return Double.NaN
    if (t <= 0.05) return 1.0 // series impractical; Q(0.05) = 1 to >1e-300
    if (t.isInfinite) return 0.0
    var sum = 0.0
    var k = 1
    var sign = 1.0
    while (k <= 100) {
      val term = math.exp(-2.0 * k * k * t * t)
      if (term < 1e-16) { k = 101 } else { sum += sign * term; sign = -sign; k += 1 }
    }
    math.min(1.0, math.max(0.0, 2.0 * sum))
  }
}

/** Registered as `graft_ks_sf(t)` by [[graft.GraftExtensions]] — completes
  * k11 the way a25/k10 got their χ² chains.
  */
case class KolmogorovSf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${child.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ks_sf"

  override protected def nullSafeEval(t: Any): Any =
    Kolmogorov.sf(t.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Kolmogorov.sf($t)")

  override protected def withNewChildInternal(newChild: Expression): KolmogorovSf =
    copy(child = newChild)
}
