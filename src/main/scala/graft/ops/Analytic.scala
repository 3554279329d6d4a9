package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic tier (SURVEY.md §2.4/§2.5): per-key variance, top-k selection,
  * group means, and the Benjamini–Hochberg adjustment as pure window
  * functions.
  */
object Analytic {

  /** A2 — per-key sample variance of a value column
    * (reference /root/reference/top10k.py:8 df.var(axis=1), ddof=1).
    */
  def perKeyVariance(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(keyCol).agg(var_samp(col(valCol)).as("variance"), count(col(valCol)).as("n"))

  /** W1 — top-k keys by variance (reference /root/reference/workflow.R:155-161).
    * orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k then
    * a single driver merge of k·partitions rows — no global sort, scales to
    * any key cardinality.
    */
  def topKByVariance(df: DataFrame, keyCol: String, valCol: String, k: Int): DataFrame =
    perKeyVariance(df, keyCol, valCol)
      .orderBy(col("variance").desc, col(keyCol).asc)
      .limit(k)

  /** A3 — per-key per-group means and their difference (logFC precursor,
    * reference /root/reference/plots.R:148-158). `g1 - g2`.
    */
  def groupMeanDiff(df: DataFrame, keyCol: String, groupCol: String,
                    valCol: String, g1: String, g2: String): DataFrame =
    df.groupBy(keyCol)
      .agg(avg(when(col(groupCol) === g1, col(valCol))).as("mean_g1"),
           avg(when(col(groupCol) === g2, col(valCol))).as("mean_g2"))
      .withColumn("diff", col("mean_g1") - col("mean_g2"))

  /** W3/K4 — Benjamini–Hochberg FDR (reference /root/reference/plots.R:162
    * p.adjust(method="BH")): rank p ascending, p*n/rank, running min from the
    * largest p down, clamp to 1. Ties resolve identically to R because the
    * running min absorbs any within-tie rank assignment.
    *
    * Scale note: the global rank needs a total order. Spark implements the
    * empty-partition window with a single-partition sort — fine up to ~1e8
    * test rows (one row per probe, not per observation). Beyond that, swap
    * in a range-partitioned two-pass rank (sortWithinPartitions + partition
    * offsets); semantics identical.
    */
  def bhAdjust(df: DataFrame, pCol: String, tieBreak: String,
               outCol: String = "fdr"): DataFrame = {
    val wRank = Window.orderBy(col(pCol).asc, col(tieBreak).asc)
    val wAll = Window.partitionBy()
    val wMin = Window.orderBy(col("__rn").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__bh", col(pCol) * col("__n").cast("double") / col("__rn").cast("double"))
      .withColumn(outCol, least(min(col("__bh")).over(wMin), lit(1.0)))
      .drop("__rn", "__n", "__bh")
  }

  /** A10 — fixed-width histogram of a [0,1) value. */
  def histogram(df: DataFrame, valCol: String, nBins: Int): DataFrame =
    df.withColumn("bucket",
        least(floor(col(valCol) * nBins), lit(nBins - 1)).cast("int"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
}
