package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted sibling of [[PermSumAgg]] for bootstrap resampling: each row
  * carries its value `k`, its group flag, and a DENSE length-B vector of
  * resample multiplicities (how many times this sample was drawn in rep
  * r); the aggregator accumulates per-rep weighted sums and weight totals
  * for BOTH groups and all B reps in ONE pass of mergeable bigint state —
  * the same no-row×B-expansion shape k30 uses, with multiplicity instead
  * of membership.
  *
  * The weights ride as `smallint` (Array[Short]) and both groups share
  * ONE aggregator call on purpose: object-hash aggregation falls back to
  * sort-based beyond its key threshold, and the SORT pays for every byte
  * of the input row — a 200-short vector keeps the per-row payload ~400 B
  * where two 200-int vectors cost 1.6 KB (the difference between an
  * in-memory sort and a disk spill at 16×).
  *
  * Buffer layout: group A (flag true) at sa/na, group B at sb/nb; output
  * sa ++ na ++ sb ++ nb (4B longs).
  */
final case class BootBuf(sa: Array[Long], na: Array[Long],
                         sb: Array[Long], nb: Array[Long])

class BootSumAgg(b: Int)
    extends Aggregator[(Long, Boolean, Array[Short]), BootBuf, Seq[Long]] {

  override def zero: BootBuf = BootBuf(new Array[Long](b), new Array[Long](b),
    new Array[Long](b), new Array[Long](b))

  override def reduce(buf: BootBuf, in: (Long, Boolean, Array[Short])): BootBuf = {
    val k = in._1
    val w = in._3
    val (s, n) = if (in._2) (buf.sa, buf.na) else (buf.sb, buf.nb)
    var i = 0
    while (i < b && i < w.length) {
      val wi = w(i)
      if (wi != 0) {
        s(i) += k * wi
        n(i) += wi
      }
      i += 1
    }
    buf
  }

  override def merge(a: BootBuf, o: BootBuf): BootBuf = {
    var i = 0
    while (i < b) {
      a.sa(i) += o.sa(i); a.na(i) += o.na(i)
      a.sb(i) += o.sb(i); a.nb(i) += o.nb(i)
      i += 1
    }
    a
  }

  override def finish(r: BootBuf): Seq[Long] =
    (r.sa ++ r.na ++ r.sb ++ r.nb).toSeq

  override def bufferEncoder: Encoder[BootBuf] = Encoders.product[BootBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
