package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K8 — agglomerative hierarchical clustering (UPGMA / average linkage)
  * over the sample axis, the clustering behind the reference's
  * `pheatmap(cluster_rows, cluster_cols)` heatmaps
  * (/root/reference/volcano_heatmap.R:40-47, volcano.R:185-199). The engine
  * emits the plot-ready tables: the merge schedule (one row per
  * agglomeration step, with height) and the dendrogram leaf order — what a
  * renderer draws, minus the pixels (SURVEY.md §2 scope rule for K8).
  *
  * Scale shape = the k08/K2 asymmetry: pairwise distances are computed
  * DISTRIBUTED (probe-keyed self-join → one hash aggregate, probes is the
  * axis that grows at 100 TB), and only the samples×samples matrix is
  * collected for the O(samples³) linkage loop — samples is the bounded
  * axis (135 in the reference). The distance input is the exact same
  * integer-moment aggregate k08 oracle-checks against DuckDB.
  *
  * Ties break deterministically on (distance, label, label) so the merge
  * schedule is platform-stable.
  */
object Hclust {

  /** Distributed pairwise mean-squared-distance on the beta grid —
    * identical arithmetic to k08 (exact integer numerators; /997² and
    * /n_shared applied once at the end).
    */
  def sampleDistances(beta: DataFrame): DataFrame = {
    val b = beta.select(col("probe_id"),
      col("sample_id"), round(col("beta") * 997).cast("bigint").as("k"))
    val l = b.select(col("probe_id"), col("sample_id").as("sa"), col("k").as("ka"))
    val r = b.select(col("probe_id"), col("sample_id").as("sb"), col("k").as("kb"))
    l.join(r, "probe_id").filter(col("sa") < col("sb"))
      .groupBy("sa", "sb")
      .agg(count(lit(1)).as("n_shared"),
        sum((col("ka") - col("kb")) * (col("ka") - col("kb"))).as("d2_num"))
      .select(col("sa"), col("sb"),
        (col("d2_num").cast("double")
          / (lit(994009.0) * col("n_shared").cast("double"))).as("d2"))
  }

  /** Average-linkage merge schedule from a collected condensed distance
    * matrix. Labels: leaves keep their ids; internal nodes are "N<step>".
    * Returns (step, left, right, height, size) plus the leaf order.
    */
  def linkage(ids: IndexedSeq[String], dist: (Int, Int) => Double)
      : (Seq[(Int, String, String, Double, Int)], Seq[String]) = {
    val n = ids.length
    // active cluster id -> (label, size, member leaf order)
    val active = mutable.LinkedHashMap.empty[Int, (String, Int, Vector[String])]
    ids.zipWithIndex.foreach { case (id, i) => active(i) = (id, 1, Vector(id)) }
    val d = mutable.Map.empty[(Int, Int), Double]
    for (i <- 0 until n; j <- i + 1 until n) d((i, j)) = dist(i, j)
    def dd(a: Int, b: Int) = if (a < b) d((a, b)) else d((b, a))

    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Double, Int)]
    var next = n
    var step = 1
    while (active.size > 1) {
      // deterministic argmin: (distance, labelA, labelB) with labels ordered
      val ks = active.keys.toIndexedSeq
      var best: (Double, String, String, Int, Int) = null
      for (x <- ks.indices; y <- x + 1 until ks.length) {
        val (a, b) = (ks(x), ks(y))
        val (la, lb) = (active(a)._1, active(b)._1)
        val (lo, hi) = if (la <= lb) (la, lb) else (lb, la)
        val cand = (dd(a, b), lo, hi, a, b)
        if (best == null ||
            cand._1 < best._1 ||
            (cand._1 == best._1 && (cand._2 < best._2 ||
              (cand._2 == best._2 && cand._3 < best._3)))) best = cand
      }
      val (h, lo, hi, a, b) = (best._1, best._2, best._3, best._4, best._5)
      val (sa, sb) = (active(a)._2, active(b)._2)
      // UPGMA update: d(new, c) = (|a| d(a,c) + |b| d(b,c)) / (|a|+|b|)
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

  /** Full K8 query: distributed distances → driver linkage → merge table.
    * `leaf_order` carries the dendrogram position of each member cluster's
    * first leaf — with the merge heights, exactly what `pheatmap` renders.
    */
  def mergeTable(spark: SparkSession, beta: DataFrame): DataFrame = {
    val pairs = sampleDistances(beta).collect()
    val ids = pairs.iterator
      .flatMap(p => Iterator(p.getString(0), p.getString(1))).toVector.distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val m = mutable.Map.empty[(Int, Int), Double]
    pairs.foreach { p =>
      val (i, j) = (idx(p.getString(0)), idx(p.getString(1)))
      m((math.min(i, j), math.max(i, j))) = p.getDouble(2)
    }
    val (merges, leafOrder) = linkage(ids.toIndexedSeq,
      // missing pair = no shared probes; push those merges last
      (i, j) => m.getOrElse((math.min(i, j), math.max(i, j)), Double.MaxValue))
    import spark.implicits._
    val mergeRows = merges.map { case (s, a, b, h, sz) =>
      (s, a, b,
        BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        sz, None: Option[Int])
    }
    // leaf-position rows (step 0) ride along so ONE table carries the whole
    // dendrogram: merges (step > 0, leaf_pos NULL) + leaf order (step = 0)
    val leafRows = leafOrder.zipWithIndex.map { case (id, i) =>
      (0, id, "leaf", 0.0, 1, Some(i): Option[Int])
    }
    (leafRows ++ mergeRows)
      .toDF("step", "left", "right", "height", "size", "leaf_pos")
      .orderBy("step", "left")
  }
}
