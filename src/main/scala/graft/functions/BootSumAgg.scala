package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted sibling of [[PermSumAgg]] for bootstrap resampling: each row
  * carries its value `k` and a DENSE length-B vector of resample weights
  * (how many times this sample was drawn in rep r); the aggregator
  * accumulates per-rep weighted sums and weight totals for all B reps in
  * ONE pass of mergeable bigint state — the same no-row×B-expansion shape
  * k30 uses, with multiplicity instead of membership.
  *
  * Buffer layout: sa(r-1) = Σ w_r·k, na(r-1) = Σ w_r. Output sa ++ na.
  */
final case class BootBuf(sa: Array[Long], na: Array[Long])

class BootSumAgg(b: Int) extends Aggregator[(Long, Seq[Int]), BootBuf, Seq[Long]] {

  override def zero: BootBuf = BootBuf(new Array[Long](b), new Array[Long](b))

  override def reduce(buf: BootBuf, in: (Long, Seq[Int])): BootBuf = {
    val k = in._1
    val w = in._2
    var i = 0
    while (i < b && i < w.length) {
      val wi = w(i)
      if (wi != 0) {
        buf.sa(i) += k * wi
        buf.na(i) += wi
      }
      i += 1
    }
    buf
  }

  override def merge(a: BootBuf, o: BootBuf): BootBuf = {
    var i = 0
    while (i < b) { a.sa(i) += o.sa(i); a.na(i) += o.na(i); i += 1 }
    a
  }

  override def finish(r: BootBuf): Seq[Long] = (r.sa ++ r.na).toSeq

  override def bufferEncoder: Encoder[BootBuf] = Encoders.product[BootBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
