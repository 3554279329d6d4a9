package graft.ops

import org.apache.commons.math3.distribution.BetaDistribution
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K6 — BMIQ intra-sample normalization: map Infinium type-II probe betas
  * onto the type-I distribution via a 3-state beta-mixture fit and
  * beta-quantile mapping (the engine's restatement of the published BMIQ
  * method; reference driver /root/reference/bmiq/DoBMIQ.R:4-213, kernel
  * bmiq/BMIQ_1.4.R:39-231, params nL=3 / nfit=10000 / niter=5).
  *
  * Samples are independent, so the kernel is a
  * `groupByKey(sample_id).flatMapGroups`: one shuffle co-locates a sample's
  * probes (~300k doubles ≈ 2.4 MB per group in the reference — comfortably
  * task-local at any probe scale; samples are uniform by construction so
  * there is no skew). Where the reference subsamples stochastically
  * (`sample()` un-seeded, BMIQ_1.4.R:69,121) this kernel takes a
  * deterministic stride over the probe-id-sorted vector, making results
  * reproducible run-to-run.
  */
object Bmiq {

  final case class In(probe_id: String, sample_id: String, beta: Double, design_type: Int)
  final case class Out(probe_id: String, sample_id: String, beta: Double,
                       beta_norm: Double, design_type: Int)

  /** 3-state beta mixture fitted by EM with moment-matching M-steps.
    * Returns (weight, a, b) per state, states ordered U < H < M.
    */
  private[ops] def fitMixture(x: Array[Double], niter: Int): Array[(Double, Double, Double)] = {
    val n = x.length
    // threshold init (reference BMIQ_1.4.R:62-65): U < 0.2, M > 0.75
    val resp = Array.ofDim[Double](n, 3)
    x.zipWithIndex.foreach { case (v, i) =>
      val s = if (v < 0.2) 0 else if (v > 0.75) 2 else 1
      resp(i)(s) = 1.0
    }
    var params = Array.tabulate(3)(j => mStep(x, resp, j))
    var it = 0
    while (it < niter) {
      val dists = params.map { case (_, a, b) => new BetaDistribution(a, b) }
      var i = 0
      while (i < n) {
        var tot = 0.0
        var j = 0
        val dens = new Array[Double](3)
        while (j < 3) {
          dens(j) = params(j)._1 * math.max(dists(j).density(x(i)), 1e-300)
          tot += dens(j)
          j += 1
        }
        j = 0
        while (j < 3) { resp(i)(j) = dens(j) / tot; j += 1 }
        i += 1
      }
      params = Array.tabulate(3)(j => mStep(x, resp, j))
      it += 1
    }
    params
  }

  /** Weighted moment-matching beta M-step; (a,b) clamped for stability. */
  private def mStep(x: Array[Double], resp: Array[Array[Double]], j: Int): (Double, Double, Double) = {
    var w = 0.0; var s = 0.0
    var i = 0
    while (i < x.length) { w += resp(i)(j); s += resp(i)(j) * x(i); i += 1 }
    if (w < 1e-9) return (1e-9, 1.0, 1.0)
    val m = s / w
    var v = 0.0
    i = 0
    while (i < x.length) { val d = x(i) - m; v += resp(i)(j) * d * d; i += 1 }
    v = math.max(v / w, 1e-6)
    val cap = m * (1 - m)
    val vv = math.min(v, cap * 0.999)
    val k = cap / vv - 1
    val a = math.min(math.max(m * k, 0.05), 500.0)
    val b = math.min(math.max((1 - m) * k, 0.05), 500.0)
    (w / x.length, a, b)
  }

  /** Deterministic replacement for the reference's un-seeded subsample:
    * stride over the (already probe-sorted) vector.
    */
  private def strideSample(x: Array[Double], nfit: Int): Array[Double] =
    if (x.length <= nfit) x
    else { val step = x.length.toDouble / nfit; Array.tabulate(nfit)(i => x((i * step).toInt)) }

  /** Regularize exact 0/1 betas to the nearest interior observed value
    * (reference BMIQ_1.4.R:48-59).
    */
  private def regularize(x: Double, minPos: Double, maxSub1: Double): Double =
    if (x <= 0) minPos else if (x >= 1) maxSub1 else x

  private def normalizeSample(rows: Array[In], nfit: Int, niter: Int,
                              minPerType: Int): Iterator[Out] = {
    val sorted = rows.sortBy(_.probe_id)
    val t1 = sorted.filter(_.design_type == 1).map(_.beta)
    val t2 = sorted.filter(_.design_type == 2).map(_.beta)
    // ≥50-point guard per type (reference DoBMIQ.R:135-141): identity pass-through.
    if (t1.length < minPerType || t2.length < minPerType)
      return sorted.iterator.map(r => Out(r.probe_id, r.sample_id, r.beta, r.beta, r.design_type))

    val minPos = sorted.map(_.beta).filter(_ > 0).foldLeft(1.0)(math.min)
    val maxSub1 = sorted.map(_.beta).filter(_ < 1).foldLeft(0.0)(math.max)
    def reg(v: Double) = regularize(v, minPos, maxSub1)

    val p1 = fitMixture(strideSample(t1.map(reg), nfit), niter)
    val p2 = fitMixture(strideSample(t2.map(reg), nfit), niter)
    val d1U = new BetaDistribution(p1(0)._2, p1(0)._3)
    val d1M = new BetaDistribution(p1(2)._2, p1(2)._3)
    val d2U = new BetaDistribution(p2(0)._2, p2(0)._3)
    val d2M = new BetaDistribution(p2(2)._2, p2(2)._3)
    val dists2 = p2.map { case (_, a, b) => new BetaDistribution(a, b) }

    def classify2(v: Double): Int = {
      var best = 0; var bestD = -1.0
      var j = 0
      while (j < 3) {
        val dd = p2(j)._1 * math.max(dists2(j).density(v), 1e-300)
        if (dd > bestD) { bestD = dd; best = j }
        j += 1
      }
      best
    }

    def clamp01(v: Double) = math.min(math.max(v, 0.0), 1.0)
    def mapU(v: Double) = clamp01(d1U.inverseCumulativeProbability(
      math.min(math.max(d2U.cumulativeProbability(v), 1e-12), 1 - 1e-12)))
    def mapM(v: Double) = clamp01(d1M.inverseCumulativeProbability(
      math.min(math.max(d2M.cumulativeProbability(v), 1e-12), 1 - 1e-12)))

    // Classify all type-II probes once; derive the conformal H interval
    // (reference "Hubble" shift+dilation, BMIQ_1.4.R:184-207).
    val t2r = sorted.filter(_.design_type == 2)
    val classes = t2r.map(r => classify2(reg(r.beta)))
    val uMapped = t2r.zip(classes).collect { case (r, 0) => mapU(reg(r.beta)) }
    val mMapped = t2r.zip(classes).collect { case (r, 2) => mapM(reg(r.beta)) }
    val hVals = t2r.zip(classes).collect { case (r, 1) => reg(r.beta) }
    val uMax = if (uMapped.nonEmpty) uMapped.max else 0.2
    val mMin = if (mMapped.nonEmpty) mMapped.min else 0.8
    val (hLo, hHi) =
      if (hVals.nonEmpty) (hVals.min, hVals.max) else (uMax, mMin)
    def mapH(v: Double): Double =
      if (hHi - hLo < 1e-12) (uMax + mMin) / 2
      else clamp01(uMax + (v - hLo) / (hHi - hLo) * (mMin - uMax))

    val t2Norm = t2r.zip(classes).map { case (r, c) =>
      val v = reg(r.beta)
      val mapped = c match { case 0 => mapU(v); case 2 => mapM(v); case _ => mapH(v) }
      // never emit a non-finite normalized value — fall back to the input
      // (downstream kernels assume finite betas; NaN reaching LAPACK hangs)
      val nb = if (mapped.isNaN || mapped.isInfinite) v else mapped
      Out(r.probe_id, r.sample_id, r.beta, nb, 2)
    }
    // Type-I probes are the reference distribution — identity (BMIQ_1.4.R:210).
    val t1Norm = sorted.filter(_.design_type == 1)
      .map(r => Out(r.probe_id, r.sample_id, r.beta, r.beta, 1))
    (t1Norm ++ t2Norm).iterator
  }

  /** Entry point: long betas + probe manifest (design_type 1|2) →
    * normalized long betas.
    */
  def bmiq(beta: DataFrame, manifest: DataFrame, nfit: Int = 10000,
           niter: Int = 5, minPerType: Int = 50): DataFrame = {
    val spark = beta.sparkSession
    import spark.implicits._
    beta.join(broadcast(manifest), "probe_id")
      .select("probe_id", "sample_id", "beta", "design_type")
      .as[In]
      .groupByKey(_.sample_id)
      .flatMapGroups((_, it) => normalizeSample(it.toArray, nfit, niter, minPerType))
      .toDF()
  }
}
