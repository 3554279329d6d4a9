package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass Welford moments as a typed Aggregator (SURVEY.md §7.1's
  * custom-Aggregator surface): numerically stable streaming (n, mean, M2)
  * with exact merge — the building block for per-group variance when a
  * one-pass kernel is preferred over built-in var_samp (e.g. inside
  * mapGroups kernels or a Structured Streaming aggregation).
  */
final case class WelfordBuf(n: Long, mean: Double, m2: Double)
final case class WelfordStats(n: Long, mean: Double, variance: Double)

class WelfordAgg extends Aggregator[Double, WelfordBuf, WelfordStats] {

  override def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

  override def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    WelfordBuf(n, mean, b.m2 + d * (x - mean))
  }

  override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      WelfordBuf(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n)
    }

  override def finish(r: WelfordBuf): WelfordStats =
    WelfordStats(r.n, r.mean, if (r.n > 1) r.m2 / (r.n - 1) else Double.NaN)

  override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  override def outputEncoder: Encoder[WelfordStats] = Encoders.product[WelfordStats]
}
