package graft.llm

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier step of CCNet/GPT-3-style
  * pipelines (a linear model scores every document; low scorers are dropped
  * or downsampled), restated on Spark ML. A logistic regression is trained
  * on weak labels from the engine's own heuristic quality rule, then scores
  * the full corpus; swapping the weak labels for human/reference labels
  * changes nothing structurally.
  *
  * Scale shape: features are pure row-local Column expressions (one
  * codegen'd projection, no shuffle); training is Spark ML's distributed
  * L-BFGS over the assembled vectors (treeAggregate passes, nothing
  * driver-side but the coefficient vector); scoring is a broadcast of that
  * coefficient vector into one more projection. The corpus is never
  * collected.
  */
object QualityModel {

  /** Row-local feature columns: word count (log-scaled), mean word length,
    * type-token ratio, digit fraction, and the heuristic composite.
    */
  def featureFrame(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(TextAnalysis.normalized(t), " ")
    val nToks = greatest(size(toks), lit(1)).cast("double")
    val alpha = length(regexp_replace(lower(t), "[^a-z0-9]", "")).cast("double")
    val digits = length(regexp_replace(lower(t), "[^0-9]", "")).cast("double")
    docs.withColumn("f_logwords", log(nToks + 1.0))
      .withColumn("f_mwl", alpha / nToks)
      .withColumn("f_ttr", size(array_distinct(toks)).cast("double") / nToks)
      .withColumn("f_digit", digits / greatest(alpha, lit(1.0)))
      .withColumn("f_heur", TextAnalysis.qualityScore(t))
  }

  val featureCols: Array[String] =
    Array("f_logwords", "f_mwl", "f_ttr", "f_digit", "f_heur")

  /** Weak label: the heuristic quality rule's verdict (stand-in for a
    * curated label set).
    */
  def weakLabel(text: Column): Column =
    (TextAnalysis.qualityScore(text) >= 0.6).cast("double")

  /** Train on the weak labels and score every document. Returns
    * (doc_id, label, quality_prob, prediction).
    */
  def trainScore(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val labeled = featureFrame(docs, textCol)
      .withColumn("label", weakLabel(col(textCol)))
    val assembled = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("features")
      // null text propagates null features; skip such rows instead of
      // aborting the whole training job (the assembler's default "error")
      .setHandleInvalid("skip")
      .transform(labeled)
    val model = new LogisticRegression()
      .setMaxIter(100).setRegParam(1e-3).setStandardization(true)
      .fit(assembled)
    model.transform(assembled)
      .select(col(idCol), col("label"),
        vector_to_array(col("probability")).getItem(1).as("quality_prob"),
        col("prediction"))
  }

  /** Isotonic (pool-adjacent-violators) calibration of the heuristic
    * quality score against a binary target: fits the monotone step
    * function mapping score → P(target) via Spark ML's DISTRIBUTED PAV
    * (per-partition pooling + associative merge — the driver sees only the
    * pooled boundary set, never the corpus). Returns the bounded model
    * surface `(idx, boundary, calibrated)` — the table a serving layer
    * broadcasts to turn scores into admission probabilities.
    */
  def isotonicCalibration(docs: DataFrame, target: Column,
                          textCol: String = "text"): DataFrame =
    isotonicFit(docs.select(
      TextAnalysis.qualityScore(col(textCol)).as("score"),
      target.cast("double").as("label")))

  /** PAV fit over a `(score: double, label: double)` frame → the bounded
    * `(idx, boundary, calibrated)` step table (values rounded to 1e-6 for
    * a stable export surface).
    */
  def isotonicFit(data: DataFrame): DataFrame = {
    val model = new org.apache.spark.ml.regression.IsotonicRegression()
      .setFeaturesCol("score").setLabelCol("label").setIsotonic(true)
      .fit(data)
    val spark = data.sparkSession
    import spark.implicits._
    model.boundaries.toArray.zip(model.predictions.toArray).zipWithIndex
      .map { case ((b, p), i) => (i.toLong, math.rint(b * 1e6) / 1e6,
        math.rint(p * 1e6) / 1e6) }
      .toSeq.toDF("idx", "boundary", "calibrated")
  }
}
