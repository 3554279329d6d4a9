package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series primitives over event tables (beyond-reference scale tier:
  * the resampling/gap-fill step every training-data telemetry pipeline
  * needs before windowed feature extraction).
  */
object Timeseries {

  /** Per-key gap-filled bucket counts: aggregate to (key, bucket) counts,
    * then expand each key's [min, max] bucket span into a dense grid and
    * left-join the counts back, so silent buckets surface as explicit 0s.
    *
    * Scale shape: the raw table is reduced to distinct (key, bucket) rows
    * by ONE partial-aggregated shuffle before anything is exploded, and the
    * grid explode is bounded by span/bucketWidth per key (calendar time,
    * not data volume) — so grid size grows with keys, never with event
    * count. The grid→counts join is an equi-join on the same (key, bucket)
    * hash partitioning the aggregation just produced, so AQE reuses the
    * shuffle rather than adding one.
    */
  def gapFillCounts(events: DataFrame, keyCol: String, bucketCol: String): DataFrame = {
    val counts = events.groupBy(keyCol, bucketCol).agg(count(lit(1)).as("n"))
    val grid = counts.groupBy(keyCol)
      .agg(min(bucketCol).as("__lo"), max(bucketCol).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as(bucketCol))
    grid.join(counts, Seq(keyCol, bucketCol), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }
}
