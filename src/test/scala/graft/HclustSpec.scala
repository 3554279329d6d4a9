package graft

import graft.ops.Hclust

class HclustSpec extends SparkSpec {

  test("UPGMA linkage matches a hand-computed schedule") {
    // d(A,B)=1, d(C,D)=2, cross = {5,6,7,8}
    val ids = Vector("A", "B", "C", "D")
    val d = Map(
      (0, 1) -> 1.0, (2, 3) -> 2.0,
      (0, 2) -> 5.0, (0, 3) -> 6.0, (1, 2) -> 7.0, (1, 3) -> 8.0)
    val (merges, order) = Hclust.linkage(ids, (i, j) => d((math.min(i, j), math.max(i, j))))
    assert(merges == Seq(
      (1, "A", "B", 1.0, 2),
      (2, "C", "D", 2.0, 2),
      // UPGMA: d(AB, CD) = (5+6+7+8)/4 = 6.5
      (3, "N1", "N2", 6.5, 4)))
    assert(order == Seq("A", "B", "C", "D"))
  }

  test("deterministic tie-break on (distance, label, label)") {
    // equilateral: all pairwise = 1. First merge must be (A,B).
    val ids = Vector("C", "A", "B")
    val (merges, _) = Hclust.linkage(ids, (_, _) => 1.0)
    assert(merges.head._2 == "A" && merges.head._3 == "B")
  }

  test("cached-neighbor linkage is identical to the naive all-pairs-rescan reference") {
    // deterministic pseudo-random distances; includes planted exact ties
    val n = 60
    val ids = (0 until n).map(i => f"S$i%03d")
    def dist(i: Int, j: Int): Double = {
      val v = math.abs(math.sin(i * 31.7 + j * 7.3))
      math.rint(v * 50) / 50.0 // coarse grid -> many exact ties
    }
    // naive reference: full rescan of all active pairs each step
    def naive(): (Seq[(Int, String, String, Double, Int)], Seq[String]) = {
      val active = scala.collection.mutable.LinkedHashMap.empty[Int, (String, Int, Vector[String])]
      ids.zipWithIndex.foreach { case (id, i) => active(i) = (id, 1, Vector(id)) }
      val d = scala.collection.mutable.Map.empty[(Int, Int), Double]
      for (i <- 0 until n; j <- i + 1 until n) d((i, j)) = dist(i, j)
      def dd(a: Int, b: Int) = if (a < b) d((a, b)) else d((b, a))
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Double, Int)]
      var next = n; var step = 1
      while (active.size > 1) {
        val ks = active.keys.toIndexedSeq
        var best: (Double, String, String, Int, Int) = null
        for (x <- ks.indices; y <- x + 1 until ks.length) {
          val (a, b) = (ks(x), ks(y))
          val (la, lb) = (active(a)._1, active(b)._1)
          val (lo, hi) = if (la <= lb) (la, lb) else (lb, la)
          val cand = (dd(a, b), lo, hi, a, b)
          if (best == null || cand._1 < best._1 ||
              (cand._1 == best._1 && (cand._2 < best._2 ||
                (cand._2 == best._2 && cand._3 < best._3)))) best = cand
        }
        val (h, lo, hi, a, b) = (best._1, best._2, best._3, best._4, best._5)
        val (sa, sb) = (active(a)._2, active(b)._2)
        for (c <- active.keys if c != a && c != b)
          d((math.min(next, c), math.max(next, c))) =
            (sa * dd(a, c) + sb * dd(b, c)) / (sa + sb).toDouble
        val order = active(a)._3 ++ active(b)._3
        active.remove(a); active.remove(b)
        active(next) = (s"N$step", sa + sb, order)
        merges += ((step, lo, hi, h, sa + sb))
        next += 1; step += 1
      }
      (merges.toSeq, active.head._2._3)
    }
    val (mFast, oFast) = Hclust.linkage(ids, dist)
    val (mRef, oRef) = naive()
    assert(mFast == mRef)
    assert(oFast == oRef)
  }

  test("mergeTable over a beta table: n-1 merges, monotone heights, full leaf order") {
    import spark.implicits._
    val beta = Seq(
      // two tight pairs (S1,S2) and (S3,S4), far apart
      ("p1", "S1", 0.10), ("p1", "S2", 0.11), ("p1", "S3", 0.90), ("p1", "S4", 0.91),
      ("p2", "S1", 0.20), ("p2", "S2", 0.21), ("p2", "S3", 0.80), ("p2", "S4", 0.81),
      ("p3", "S1", 0.30), ("p3", "S2", 0.30), ("p3", "S3", 0.70), ("p3", "S4", 0.70)
    ).toDF("probe_id", "sample_id", "beta")
    val t = Hclust.mergeTable(spark, beta).collect()
    val leaves = t.filter(_.getInt(0) == 0)
    val merges = t.filter(_.getInt(0) > 0)
    assert(leaves.length == 4 && merges.length == 3)
    // leaf_pos is a permutation of 0..3
    assert(leaves.map(_.getAs[Int]("leaf_pos")).sorted.toSeq == Seq(0, 1, 2, 3))
    // average linkage over a metric input has no inversions
    val hs = merges.sortBy(_.getInt(0)).map(_.getAs[Double]("height"))
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b })
    // the tight pairs merge first, the cross-merge last
    val firstTwo = merges.sortBy(_.getInt(0)).take(2)
      .map(r => Set(r.getString(1), r.getString(2)))
    assert(firstTwo.contains(Set("S1", "S2")) && firstTwo.contains(Set("S3", "S4")))
  }
}
