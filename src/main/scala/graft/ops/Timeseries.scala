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

  /** Batch sessionization: assign a per-key session index that increments
    * whenever the gap to the previous event exceeds `gapUs`. The classic
    * event-log primitive (the batch analog of streaming session windows,
    * which `streaming/QcMonitor` covers on the live path).
    *
    * Scale shape: ONE hash shuffle on the key, a sort within partitions,
    * two window passes over the same (key, ts, ord) sort order — Catalyst
    * reuses the sort, so no second exchange. Session state never leaves
    * the executor; nothing is collected. Skew note: a single key's events
    * sort within one task — at 100 TB with a pathological power-user key,
    * pre-split such keys by a coarse time bucket first.
    */
  def sessionize(events: DataFrame, keyCol: String, tsUsCol: String,
                 ordCol: String, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsUsCol), col(ordCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__new",
        when(lag(tsUsCol, 1).over(w).isNull
          .or(col(tsUsCol) - lag(tsUsCol, 1).over(w) > gapUs), 1L).otherwise(0L))
      .withColumn("session_idx", sum("__new").over(wRun))
      .drop("__new")
  }

  /** SCD type-2 dimension build from a change log: collapse consecutive
    * repeats of the tracked attribute per key, then stamp each surviving
    * row with a [valid_from, valid_to) interval (valid_to = next change's
    * timestamp, NULL while current). The standard warehouse temporal-
    * dimension primitive; the as-of join (`j09`) is its read-side dual.
    *
    * Same one-shuffle shape as [[sessionize]]: both the collapse filter's
    * lag and the interval's lead run over the identical (key, ts, ord)
    * sort, and the post-filter lead window re-sorts within the partitions
    * the first pass already clustered — no second exchange.
    */
  def scd2(changes: DataFrame, keyCol: String, attrCol: String,
           tsUsCol: String, ordCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsUsCol), col(ordCol))
    changes
      .withColumn("__prev", lag(attrCol, 1).over(w))
      .filter(col("__prev").isNull.or(col("__prev") =!= col(attrCol)))
      .withColumn("valid_from_us", col(tsUsCol))
      .withColumn("valid_to_us", lead(tsUsCol, 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .drop("__prev")
  }

  /** Sequential event funnel: for each key, the first timestamp of stage 0,
    * then the first stage-1 timestamp at or after it, and so on — a user
    * "reaches" stage i only through the ordered chain (the product-
    * analytics conversion primitive). Emits one row per key with
    * `stage_<i>_us` (NULL once the chain breaks) and `funnel_stage` =
    * stages reached.
    *
    * Scale shape: one hash shuffle on the key; every chain step is an
    * unordered-frame window min over that same partitioning (Catalyst
    * stacks the Window operators on one exchange, no re-shuffle, no sort),
    * and the final per-key collapse is an aggregate on keys already
    * co-located. NULL propagation does the chain logic: `ts >= NULL` is
    * NULL, so a broken chain never counts later stages.
    */
  def funnel(events: DataFrame, keyCol: String, tsUsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stages.nonEmpty)
    val w = Window.partitionBy(keyCol)
    var cur = events
    stages.zipWithIndex.foreach { case (st, i) =>
      // stage 0 is ungated (lit(true), NOT ts >= 0 — timestamps may be
      // pre-epoch/offset-relative); later stages require at-or-after the
      // previous stage's first occurrence
      val gate = if (i == 0) lit(true)
                 else col(tsUsCol) >= col(s"stage_${i - 1}_us")
      cur = cur.withColumn(s"stage_${i}_us",
        min(when(col(typeCol) === st && gate, col(tsUsCol))).over(w))
    }
    val stageCols = stages.indices.map(i => col(s"stage_${i}_us"))
    cur.groupBy(keyCol)
      .agg(min(stageCols.head).as("stage_0_us"),
        stageCols.tail.zipWithIndex.map { case (c, i) =>
          min(c).as(s"stage_${i + 1}_us")
        }: _*)
      .withColumn("funnel_stage",
        stages.indices.map(i => when(col(s"stage_${i}_us").isNotNull, 1)
          .otherwise(0)).reduce(_ + _))
  }

  /** Retention cohort matrix: cohort = each key's first `signupType`
    * bucket; count distinct keys active in each later bucket, keyed by
    * (cohort bucket, bucket offset). One aggregate to the cohort table,
    * one distinct to the activity table, an equi-join on the key (both
    * sides already hashed by it), and the final (cohort, offset) count.
    */
  /** Floor division for signed longs: `div` truncates toward zero, which
    * would merge the (-bucket, bucket) range into one double-width bucket
    * at 0 and shift every negative timestamp's bucket by one.
    */
  private def floorDiv(x: org.apache.spark.sql.Column, d: Long): org.apache.spark.sql.Column =
    (x - pmod(x, lit(d))) / d cast "bigint"

  def retentionCohorts(events: DataFrame, keyCol: String, tsUsCol: String,
                       typeCol: String, signupType: String,
                       bucketUs: Long): DataFrame = {
    val cohorts = events.filter(col(typeCol) === signupType)
      .groupBy(keyCol).agg(min(col(tsUsCol)).as("__first"))
      .select(col(keyCol), floorDiv(col("__first"), bucketUs).as("cohort_bucket"))
    val activity = events
      .select(col(keyCol), floorDiv(col(tsUsCol), bucketUs).as("bucket"))
      .distinct()
    activity.join(cohorts, keyCol)
      .filter(col("bucket") >= col("cohort_bucket"))
      .groupBy(col("cohort_bucket"),
        (col("bucket") - col("cohort_bucket")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_users")) // activity is (key, bucket)-distinct
  }

  /** Additive seasonal decomposition y = trend + seasonal + remainder over
    * a DENSE per-key integer-bucket count series (feed [[gapFillCounts]]
    * output): trend is the `period`-bucket centered moving average,
    * seasonal the per-slot (bucket mod period) mean of the detrended
    * series, remainder the rest — the classical-decomposition recipe
    * every telemetry/forecast pipeline runs before anomaly scoring.
    *
    * Determinism contract (shared with the DuckDB oracle): y and the
    * moving-window sums S are EXACT integer aggregates, and the per-slot
    * seasonal mean is computed as (Σy − ΣS/period)/n — every Σ an integer
    * aggregate — so no float is ever summed in shuffle order; the double
    * op sequence is fixed. Series edges (incomplete windows) are dropped
    * via an integer window count, not NaN propagation.
    *
    * Scale shape: one keyed window pass over the dense series (bounded by
    * calendar span, not event volume), one per-(key, slot) aggregate
    * (keys × period rows), and a broadcast join back. Nothing global.
    */
  def seasonalDecompose(series: DataFrame, keyCol: String, bucketCol: String,
                        valueCol: String, period: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(period >= 1, s"period must be >= 1, got $period")
    // centered window of EXACTLY `period` rows for any period: floor the
    // left reach, ceil the right — (-(period-1)/2 .. period/2). An
    // even-only frame like (-(p/2-1), p/2) spans p-1 rows for odd p and
    // the cnt==period edge filter would silently drop everything.
    val w = Window.partitionBy(keyCol).orderBy(bucketCol)
      .rowsBetween(-((period - 1) / 2), period / 2)
    val dP = lit(period.toDouble)
    val full = series
      .withColumn("__s", sum(valueCol).over(w))
      .withColumn("__cnt", count(lit(1)).over(w))
      .filter(col("__cnt") === period)
      .withColumn("__slot", pmod(col(bucketCol), lit(period)))
    val slots = full.groupBy(col(keyCol), col("__slot"))
      .agg(sum(valueCol).as("__sy"), sum("__s").as("__ss"),
        count(lit(1)).as("__n"))
      .withColumn("seasonal",
        (col("__sy").cast("double") - col("__ss").cast("double") / dP)
          / col("__n").cast("double"))
      .select(col(keyCol), col("__slot"), col("seasonal"))
    full.join(broadcast(slots), Seq(keyCol, "__slot"))
      .withColumn("trend", col("__s").cast("double") / dP)
      .withColumn("remainder",
        col(valueCol).cast("double") - col("trend") - col("seasonal"))
      .select(col(keyCol), col(bucketCol), col(valueCol),
        col("trend"), col("seasonal"), col("remainder"))
  }

  /** Per-key exact median by lower/upper ELEMENT selection (+ identical
    * (lo+hi)/2 on both engines) — the k33 move that keeps a median
    * oracle-checkable where percentile-interpolation kernels differ in
    * the last ulp. `tieCol` makes the rank deterministic under value ties.
    */
  def exactMedian(df: DataFrame, keyCol: String, valCol: String,
                  tieCol: String, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wR = Window.partitionBy(keyCol).orderBy(col(valCol).asc, col(tieCol).asc)
    val wC = Window.partitionBy(keyCol)
    df.withColumn("__rn", row_number().over(wR).cast("long"))
      .withColumn("__m", count(lit(1)).over(wC))
      .filter(expr("__rn = (__m + 1) div 2 OR __rn = __m div 2 + 1"))
      .groupBy(keyCol)
      .agg(((min(col(valCol)) + max(col(valCol))) / 2.0).as(outCol))
  }
}
