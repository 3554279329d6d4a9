package graft

import graft.ops.{Mds, Pca}

/** Geometry-recovery specs for the two eigen-kernels: PCA must separate
  * planted clusters on PC1, classical MDS must recover a planted 1-D
  * ordering on dim1 — both up to sign, which is the only freedom the
  * algorithms have.
  */
class PcaMdsSpec extends SparkSpec {
  import spark.implicits._

  test("PCA: PC1 separates two planted sample clusters") {
    // samples s0-s4 sit near beta=0.25, s5-s9 near 0.75, small probe jitter
    val rows = for (p <- 0 until 30; s <- 0 until 10) yield {
      val base = if (s < 5) 0.25 else 0.75
      (f"p$p%03d", f"s$s%02d", base + 0.01 * math.sin(p * 1.7 + s))
    }
    val out = Pca.pcaCoords(rows.toDF("probe_id", "sample_id", "beta"),
      topK = 30, k = 2, scale = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a = (0 until 5).map(s => out(f"s$s%02d"))
    val b = (5 until 10).map(s => out(f"s$s%02d"))
    assert(a.forall(_ > 0) && b.forall(_ < 0) ||
      a.forall(_ < 0) && b.forall(_ > 0),
      s"PC1 does not separate clusters: a=$a b=$b")
  }

  test("MDS: dim1 recovers a planted 1-D sample ordering") {
    val rows = for (p <- 0 until 30; s <- 0 until 8) yield {
      (f"p$p%03d", f"s$s", 0.1 + 0.09 * s + 0.002 * math.sin(p * 2.3))
    }
    val coords = Mds.mdsCoords(spark, rows.toDF("probe_id", "sample_id", "beta"), topK = 30)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dim1 = (0 until 8).map(s => coords(s"s$s"))
    val asc = dim1.sliding(2).forall { case Seq(x, y) => x < y }
    val desc = dim1.sliding(2).forall { case Seq(x, y) => x > y }
    assert(asc || desc, s"dim1 not monotone in planted position: $dim1")
  }
}
