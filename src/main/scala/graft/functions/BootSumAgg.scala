package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Poisson-weight bootstrap aggregator (the k41 kernel): each input row is
  * `(value k, group flag, integer sample key)`, and the aggregator derives
  * the row's multiplicity in every one of the B resamples ON THE FLY from
  * the deterministic device
  * `u(key, rep) = (key·2654435761 + rep·97561) mod 104729`, mapped through
  * the integer-threshold inverse CDF of Poisson(1) (the large-scale
  * bootstrap standard: per-record independent Poisson(1) weights — Chamandy
  * et al., "Estimating Uncertainty for Massive Data Streams", Google 2012 —
  * here made deterministic so two engines replay the identical resample).
  * Accumulates per-rep weighted sums and weight totals for BOTH groups and
  * all B reps in ONE pass of mergeable bigint state.
  *
  * Versus shipping dense length-B multiplicity vectors through a broadcast
  * join (the previous design): the row payload drops from ~400 B to three
  * scalars — the difference between an in-memory aggregation and a spilling
  * sort at 16× — and the weight arithmetic (one LCG multiply-add-mod plus a
  * threshold ladder per rep) stays cheaper than the memory traffic it
  * replaces. No driver state, no broadcast, nothing row×B materialized.
  *
  * The thresholds are ⌊cdf·104729⌋ for Poisson(1) at w = 0..7 (exact
  * integer comparisons — bit-equal in any engine); u ≥ 104727 caps at w=8
  * (true mass beyond the cap ≈ 1.1e−6).
  *
  * Buffer layout: group A (flag true) at sa/na, group B at sb/nb; output
  * sa ++ na ++ sb ++ nb (4B longs).
  */
final case class BootBuf(sa: Array[Long], na: Array[Long],
                         sb: Array[Long], nb: Array[Long])

object PoissonBootAgg {
  /** Integer inverse CDF of Poisson(1) over u ∈ [0, 104729). */
  def weight(u: Long): Int =
    if (u < 38527) 0
    else if (u < 77055) 1
    else if (u < 96319) 2
    else if (u < 102740) 3
    else if (u < 104345) 4
    else if (u < 104666) 5
    else if (u < 104720) 6
    else if (u < 104727) 7
    else 8

  /** The deterministic per-(sample, rep) draw. `rep` is 1-based. */
  def draw(key: Long, rep: Long): Int =
    weight((key * 2654435761L + rep * 97561L) % 104729L)
}

class PoissonBootAgg(b: Int)
    extends Aggregator[(Long, Boolean, Long), BootBuf, Seq[Long]] {

  override def zero: BootBuf = BootBuf(new Array[Long](b), new Array[Long](b),
    new Array[Long](b), new Array[Long](b))

  override def reduce(buf: BootBuf, in: (Long, Boolean, Long)): BootBuf = {
    val k = in._1
    val key = in._3
    val (s, n) = if (in._2) (buf.sa, buf.na) else (buf.sb, buf.nb)
    var r = 0
    while (r < b) {
      val w = PoissonBootAgg.draw(key, r + 1)
      if (w != 0) {
        s(r) += k * w
        n(r) += w
      }
      r += 1
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
