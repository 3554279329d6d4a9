package graft.ops

import org.apache.spark.ml.feature.{PCA, StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K1 — StandardScaler + PCA over samples×top-k-probes
  * (reference /root/reference/pca_analysis.py:38-48 sklearn
  * StandardScaler+PCA; workflow.R:218 prcomp(center=TRUE) on t(mvals)).
  *
  * The feature dimension is bounded by topK (10k in the reference), so the
  * samples-as-rows matrix is safe to pivot: width is a constant, rows scale
  * with samples. For an unbounded all-CpG PCA the scale path is
  * RowMatrix.computeSVD over the long table — not needed by the reference
  * surface, which always selects top-k first.
  */
object Pca {

  /** The eigensolve inside Spark ML's PCA (breeze/LAPACK on the collected
    * covariance) can intermittently throw NotConvergedException (empty
    * message): the input covariance jitters in the last ulp run-to-run
    * because aggregation merge order isn't fixed, and near-degenerate
    * spectra (synthetic data) occasionally trip LAPACK. Recomputing gives
    * a different ulp pattern, so a bounded retry is a sound fix.
    */
  private def fitWithRetry[T](what: String, attempts: Int = 3)(f: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        case e: Throwable =>
          last = e
          System.err.println(s"[pca] $what attempt ${i + 1}/$attempts failed: $e")
      }
      i += 1
    }
    throw last
  }

  /** PCA coordinates per sample + explained-variance ratios.
    * `scale=true` ~ sklearn StandardScaler flavor; `false` ~ the
    * centered-only prcomp "DESeq2 method" flavor (workflow.R:321).
    */
  def pcaCoords(beta: DataFrame, topK: Int, k: Int, scale: Boolean): DataFrame = {
    val topProbes = Analytic.topKByVariance(beta, "probe_id", "beta", topK)
      .select("probe_id").collect().map(_.getString(0)).sorted.toSeq
    val wide = beta.filter(col("probe_id").isin(topProbes: _*))
      .groupBy("sample_id").pivot("probe_id", topProbes).agg(first("beta"))
      .na.fill(0.5) // reference drops NA rows pre-PCA; absent cells are imputed at the midpoint
    val assembled = new VectorAssembler()
      .setInputCols(topProbes.toArray).setOutputCol("features")
      .transform(wide)
    // Both flavors center (prcomp center=TRUE); `scale` toggles the
    // unit-variance division. Without explicit centering Spark ML's PCA
    // projects raw vectors, leaving a constant offset per component.
    val feats = {
      val scaler = fitWithRetry("StandardScaler.fit") {
        new StandardScaler().setWithMean(true).setWithStd(scale)
          .setInputCol("features").setOutputCol("scaled")
          .fit(assembled)
      }
      scaler.transform(assembled)
    }
    val model = fitWithRetry("PCA.fit") {
      new PCA().setK(k).setInputCol("scaled").setOutputCol("pcs").fit(feats)
    }
    val evr = model.explainedVariance.toArray
    val arr = model.transform(feats)
      .select(col("sample_id"), vector_to_array(col("pcs")).as("pc"))
    (1 to k).foldLeft(arr) { (df, i) =>
      df.withColumn(s"pc$i", round(col("pc").getItem(i - 1), 6))
        .withColumn(s"evr$i", round(lit(evr(i - 1)), 6))
    }.drop("pc").orderBy("sample_id")
  }
}
