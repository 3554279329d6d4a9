package graft

import org.apache.commons.math3.special.Gamma
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.ops.Dmp

class DmpSpec extends SparkSpec {
  import spark.implicits._

  // Two probes × 8 samples (4 WT / 4 MUT), deterministic betas.
  private def fixture = {
    val rows = for {
      p <- Seq("pA", "pB")
      (g, i) <- Seq("WT", "WT", "WT", "WT", "MUT", "MUT", "MUT", "MUT").zipWithIndex
    } yield {
      val base = if (p == "pA") 0.3 else 0.6
      val shift = if (g == "MUT" && p == "pA") 0.2 else 0.0
      (p, s"s$i", g, base + shift + 0.01 * (i % 4))
    }
    rows.toDF("probe_id", "sample_id", "group", "beta")
  }

  test("moments reproduce hand-computed group means and pooled variance") {
    val mom = Dmp.moments(fixture, "WT", "MUT").orderBy("probe_id").collect()
    val pA = mom(0)
    assert(pA.getAs[Long]("n1") == 4 && pA.getAs[Long]("n2") == 4)
    // M-values computed the same way as the kernel, driver-side
    def m(b: Double) = math.log(b / (1 - b)) / math.log(2)
    val wt = Seq(0.3, 0.31, 0.32, 0.33).map(m)
    val mut = Seq(0.5, 0.51, 0.52, 0.53).map(m)
    val expLogFc = wt.sum / 4 - mut.sum / 4
    assert(math.abs(pA.getAs[Double]("logfc") - expLogFc) < 1e-9)
    def varS(xs: Seq[Double]) = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
    }
    val expS2 = (3 * varS(wt) + 3 * varS(mut)) / 6
    assert(math.abs(pA.getAs[Double]("s2") - expS2) < 1e-9)
  }

  test("StudentTPValue matches commons-math TDistribution two-sided tails") {
    import org.apache.commons.math3.distribution.TDistribution
    for (t <- Seq(0.0, 0.5, 1.96, -2.5, 7.0); df <- Seq(3.0, 10.0, 120.0)) {
      val expected = 2.0 * new TDistribution(df).cumulativeProbability(-math.abs(t))
      val got = graft.functions.StudentT.twoSidedP(t, df)
      assert(math.abs(got - expected) < 1e-10, s"t=$t df=$df: $got vs $expected")
    }
  }

  test("trigammaInverse inverts trigamma") {
    Seq(0.01, 0.5, 2.0, 50.0).foreach { x =>
      val y = Gamma.trigamma(x)
      assert(math.abs(Dmp.trigammaInverse(y) - x) / x < 1e-6)
    }
  }

  test("complete shrinkage (d0=inf) gives s2_post == s0² and finite p-values") {
    val mom = Dmp.moments(fixture, "WT", "MUT")
    val prior = Dmp.Prior(Double.PositiveInfinity, 0.01)
    val out = Dmp.moderated(mom, prior).collect()
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("s2_post") - 0.01) < 1e-6)
      val p = r.getAs[Double]("p_value")
      assert(p >= 0 && p <= 1)
    }
  }

  test("full dmp flags the shifted probe ahead of the flat one") {
    val out = Dmp.dmp(fixture, "WT", "MUT")
      .select("probe_id", "p_value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("pA") < out("pB"))
  }
}
