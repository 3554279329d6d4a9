package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean over fixed-dimension embedding vectors as a typed
  * Aggregator: per-partition partial sums (one double[] + count per group)
  * merge associatively, so a per-label centroid over N vectors shuffles
  * `groups × dim` doubles instead of the `N × dim` rows a
  * posexplode→groupBy(pos) restatement would — the map-side-combine shape
  * an embedding-centroid pass needs at corpus scale.
  */
final case class VecSumBuf(n: Long, sums: Array[Double])

class VecMeanAgg(dim: Int) extends Aggregator[Seq[Float], VecSumBuf, Seq[Double]] {

  override def zero: VecSumBuf = VecSumBuf(0L, new Array[Double](dim))

  override def reduce(b: VecSumBuf, v: Seq[Float]): VecSumBuf = {
    val s = b.sums
    var i = 0
    while (i < dim && i < v.length) { s(i) += v(i); i += 1 }
    VecSumBuf(b.n + 1, s)
  }

  override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf = {
    val s = a.sums
    var i = 0
    while (i < dim) { s(i) += b.sums(i); i += 1 }
    VecSumBuf(a.n + b.n, s)
  }

  override def finish(r: VecSumBuf): Seq[Double] =
    if (r.n == 0) Seq.empty
    else r.sums.map(_ / r.n).toSeq

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
