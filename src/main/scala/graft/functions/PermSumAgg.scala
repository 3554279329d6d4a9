package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-probe permutation sufficient statistics in ONE pass: for each of the
  * B label permutations, the group-A member count and the group-A sum of
  * the integer grid value — accumulated from each row's (k, reps-where-
  * this-sample-is-in-A) WITHOUT materializing the row × B expansion a
  * join-then-groupBy restatement generates (k30's 51M intermediate rows at
  * sf0.1 become 517k aggregator updates; the shuffle carries `probes ×
  * 2B longs` of mergeable state either way, but the map side stops
  * hashing two million (probe, rep) keys). Exactness is untouched: the
  * state is pure bigint sums, merge is associative/commutative, and the
  * DuckDB oracle keeps checking the RESULT through its independent
  * join+groupBy plan.
  *
  * Buffer layout: sa(r-1) = Σ k over group-A members in rep r,
  * na(r-1) = member count. Output: sa ++ na (length 2B).
  */
final case class PermBuf(sa: Array[Long], na: Array[Long])

class PermSumAgg(b: Int) extends Aggregator[(Long, Seq[Int]), PermBuf, Seq[Long]] {

  override def zero: PermBuf = PermBuf(new Array[Long](b), new Array[Long](b))

  override def reduce(buf: PermBuf, in: (Long, Seq[Int])): PermBuf = {
    val k = in._1
    val reps = in._2
    var i = 0
    while (i < reps.length) {
      val r = reps(i) - 1
      buf.sa(r) += k
      buf.na(r) += 1
      i += 1
    }
    buf
  }

  override def merge(a: PermBuf, o: PermBuf): PermBuf = {
    var i = 0
    while (i < b) { a.sa(i) += o.sa(i); a.na(i) += o.na(i); i += 1 }
    a
  }

  override def finish(r: PermBuf): Seq[Long] =
    (r.sa ++ r.na).toSeq

  override def bufferEncoder: Encoder[PermBuf] = Encoders.product[PermBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
