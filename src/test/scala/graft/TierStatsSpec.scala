package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph
import graft.llm.TextAnalysis

/** Round-6 closing tier: Welch t (k17) against commons-math's own Welch
  * implementation, degree-ordered triangle enumeration on planted graphs,
  * and BM25 against a hand-computed two-document corpus.
  */
class TierStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("k17 Welch t/df/p match commons-math TTest on real probes") {
    val sp = spark
    import sp.implicits._
    GraftExtensions.registerAll(sp)
    val got = QueriesStats.welchT(sp, sf)
      .withColumn("p_value", expr("graft_t_pvalue(t, df)"))
      .orderBy("probe_id").limit(5).collect()
    assert(got.nonEmpty, "no probes survived the n>=3 gates at sf0.001")
    // reconstruct both groups driver-side from the same views
    val bg = Tables.betaLong(sp, sf)
      .join(Tables.sampleSheet(sp, sf), "sample_id")
      .select(col("probe_id"), col("group"),
        round(col("beta") * 997).cast("bigint").as("k"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1)
    val tt = new org.apache.commons.math3.stat.inference.TTest()
    got.foreach { r =>
      val probe = r.getAs[String]("probe_id")
      val rows = bg(probe)
      val wt = rows.filter(_._2 == "WT").map(_._3.toDouble)
      val mut = rows.filter(_._2 == "MUT").map(_._3.toDouble)
      assert(math.abs(r.getAs[Double]("t") - tt.t(wt, mut)) < 1e-9,
        s"$probe t: got ${r.getAs[Double]("t")} expect ${tt.t(wt, mut)}")
      assert(math.abs(r.getAs[Double]("p_value") - tt.tTest(wt, mut)) < 1e-9,
        s"$probe p: got ${r.getAs[Double]("p_value")} expect ${tt.tTest(wt, mut)}")
      // delta_beta is the group mean difference rescaled off the 0..996 grid
      val md = wt.sum / wt.length - mut.sum / mut.length
      assert(math.abs(r.getAs[Double]("delta_beta") - md / 997.0) < 1e-12)
    }
  }

  test("k18 Brown-Forsythe F matches a driver-side reference on real probes") {
    val sp = spark
    import sp.implicits._
    val got = QueriesStats.brownForsythe(sp, sf)
      .orderBy("probe_id").limit(5).collect()
    assert(got.nonEmpty)
    val bg = Tables.betaLong(sp, sf)
      .join(Tables.sampleSheet(sp, sf), "sample_id")
      .select(col("probe_id"), col("run"),
        round(col("beta") * 997).cast("bigint").as("k"))
      .as[(String, String, Long)].collect().groupBy(_._1)
    def median2(xs: Seq[Long]): Long = { // 2×median of integers, exact
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    got.foreach { r =>
      val rows = bg(r.getAs[String]("probe_id"))
      val groups = rows.groupBy(_._2).values.toSeq
      val z = groups.flatMap { g =>
        val m2 = median2(g.map(_._3))
        g.map(x => math.abs(2 * x._3 - m2).toDouble)
      }
      val perGroup = groups.map { g =>
        val m2 = median2(g.map(_._3))
        g.map(x => math.abs(2 * x._3 - m2).toDouble)
      }
      val n = z.size.toDouble
      val grand = z.sum / n
      val ssb = perGroup.map(g => g.size * math.pow(g.sum / g.size - grand, 2)).sum
      val ssw = perGroup.map(g => g.map(x => math.pow(x - g.sum / g.size, 2)).sum).sum
      val f = (ssb / 2.0) / (ssw / (n - 3.0))
      assert(math.abs(r.getAs[Double]("bf_f") - f) < 1e-6 * math.max(1.0, f),
        s"${r.getAs[String]("probe_id")}: got ${r.getAs[Double]("bf_f")} expect $f")
    }
  }

  test("k19 Fisher combination is consistent with its component p-values") {
    val sp = spark
    val got = SparkEntry.queries("k19_fisher_combined")(sp, sf)
      .limit(5).collect()
    assert(got.nonEmpty)
    val chi = new org.apache.commons.math3.distribution.ChiSquaredDistribution(6.0)
    got.foreach { r =>
      val (pw, pr, pk) = (r.getAs[Double]("p_w"), r.getAs[Double]("p_r"), r.getAs[Double]("p_k"))
      val x2 = -2.0 * (math.log(pw) + math.log(pr) + math.log(pk))
      // rounded components => loose tolerance on the recomputed statistic
      assert(math.abs(r.getAs[Double]("x2") - x2) < 2e-4,
        s"${r.getString(0)}: x2=${r.getAs[Double]("x2")} recomputed=$x2")
      val p = 1.0 - chi.cumulativeProbability(r.getAs[Double]("x2"))
      assert(math.abs(r.getAs[Double]("p_value") - p) < 1e-5)
      graft.ops.Caches.releaseAll()
    }
  }

  private def triSet(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val sp = spark
    import sp.implicits._
    try Graph.triangles(edges.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    finally graft.ops.Caches.releaseAll()
  }

  test("triangles: K4 has exactly its four triangles, each emitted once") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(triSet(k4) ==
      Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles: paths and stars contribute none; shared-edge pair found") {
    // two triangles sharing edge (2,3), plus a pendant path 5-6-7
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L))
    assert(triSet(g) == Set((1L, 2L, 3L), (2L, 3L, 4L)))
  }

  test("bm25 matches a hand-computed two-document corpus") {
    val sp = spark
    import sp.implicits._
    // doc 1: "cat dog cat" (dl=3, tf_cat=2); doc 2: "dog bird" (dl=2, tf_cat=0)
    val docs = Seq((1L, "cat dog cat"), (2L, "dog bird")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, Seq("cat"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dl"), r.getAs[Long]("tf_cat"), r.getAs[Double]("score"))).toMap
    val (k1, b, avgdl) = (1.2, 0.75, 2.5)
    val idf = math.log(1.0 + (2.0 - 1.0 + 0.5) / (1.0 + 0.5)) // df_cat = 1
    val exp1 = idf * (2.0 * (k1 + 1.0)) / (2.0 + k1 * (1.0 - b + b * 3.0 / avgdl))
    assert(got(1L)._1 == 3L && got(1L)._2 == 2L)
    assert(math.abs(got(1L)._3 - exp1) < 1e-12, s"got ${got(1L)._3} expect $exp1")
    assert(got(2L)._2 == 0L && math.abs(got(2L)._3) < 1e-15)
  }
}
