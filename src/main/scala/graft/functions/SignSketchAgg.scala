package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-sample random-hyperplane sign sketch for the thresholded Spearman
  * search (ops/Analytic.spearmanThresholded): accumulates, for every bit
  * j, the EXACT integer moments of the sign-weighted rank sums —
  * sdot_j = Σ s(probe, j)·ar2, ssum_j = Σ s(probe, j), plus n and
  * Σ ar2 — and emits bit_j = [n·sdot_j − (Σ ar2)·ssum_j ≥ 0], the sign
  * of n× the centered-rank projection (order-free exact, so Spark and
  * DuckDB agree bit-for-bit).
  *
  * Why an Aggregator and not a groupBy(sample, bit): the per-(sample, bit)
  * restatement amplifies the rank grid ×nbits through the join (3.7B rows
  * at the 64× sweep) and its partial-aggregate maps hold samples×bits
  * keys per task — measured OOM on an 8 g heap at 64×. This buffer holds
  * ONE array pair per sample (~2 KB), the input stays probes×samples
  * rows, and the caller pre-partitions by sample (the PoissonBootAgg
  * pattern) so each buffer exists exactly once and never crosses an
  * exchange.
  *
  * Signs arrive packed: words(j >> 6) bit (j & 63) set ⇒ s = +1, else −1
  * (the md5-derived hyperplane table, built once per distinct probe).
  *
  * Overflow posture: all accumulation in checked long arithmetic
  * (Math.addExact/multiplyExact) — exact while per-sample probe count
  * n ≤ ~1.3M (|n·sdot| ≤ 4n³ < 2⁶³), the same envelope as k12's bigint
  * fast path; beyond it the job fails loudly (ANSI posture), never
  * silently wraps.
  */
final case class SignSketchBuf(n: Long, sr: Long,
                               sdot: Array[Long], ssum: Array[Long])

class SignSketchAgg(nbits: Int)
    extends Aggregator[(Long, Seq[Long]), SignSketchBuf, Seq[Long]] {
  require(nbits >= 1 && nbits <= 1024, s"nbits=$nbits outside [1, 1024]")

  override def zero: SignSketchBuf =
    SignSketchBuf(0L, 0L, new Array[Long](nbits), new Array[Long](nbits))

  override def reduce(b: SignSketchBuf, in: (Long, Seq[Long])): SignSketchBuf = {
    val (ar2, words) = in
    val sdot = b.sdot
    val ssum = b.ssum
    var j = 0
    while (j < nbits) {
      val plus = ((words(j >> 6) >>> (j & 63)) & 1L) == 1L
      if (plus) {
        sdot(j) = Math.addExact(sdot(j), ar2)
        ssum(j) = Math.addExact(ssum(j), 1L)
      } else {
        sdot(j) = Math.subtractExact(sdot(j), ar2)
        ssum(j) = Math.subtractExact(ssum(j), 1L)
      }
      j += 1
    }
    SignSketchBuf(Math.addExact(b.n, 1L), Math.addExact(b.sr, ar2), sdot, ssum)
  }

  override def merge(a: SignSketchBuf, b: SignSketchBuf): SignSketchBuf = {
    val sdot = a.sdot
    val ssum = a.ssum
    var j = 0
    while (j < nbits) {
      sdot(j) = Math.addExact(sdot(j), b.sdot(j))
      ssum(j) = Math.addExact(ssum(j), b.ssum(j))
      j += 1
    }
    SignSketchBuf(Math.addExact(a.n, b.n), Math.addExact(a.sr, b.sr), sdot, ssum)
  }

  override def finish(r: SignSketchBuf): Seq[Long] =
    (0 until nbits).map { j =>
      val p = Math.subtractExact(Math.multiplyExact(r.n, r.sdot(j)),
        Math.multiplyExact(r.sr, r.ssum(j)))
      if (p >= 0L) 1L else 0L
    }

  override def bufferEncoder: Encoder[SignSketchBuf] = Encoders.product[SignSketchBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
