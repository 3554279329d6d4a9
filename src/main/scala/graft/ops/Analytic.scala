package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Analytic tier (SURVEY.md §2.4/§2.5): per-key variance, top-k selection,
  * group means, and the Benjamini–Hochberg adjustment.
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
    * Dispatches on row count: up to `windowMaxRows` the empty-partition
    * window (single-partition sort) is cheapest; above it the
    * range-partitioned two-pass rank takes over — no single task ever sees
    * more than one range partition, so the adjustment scales to any probe
    * cardinality. Both paths compute the identical double-op sequence
    * (p·n then /rank, suffix-min, clamp), asserted bit-equal in PropertySpec.
    */
  def bhAdjust(df: DataFrame, pCol: String, tieBreak: String,
               outCol: String = "fdr", windowMaxRows: Long = 5000000L,
               knownRows: Option[Long] = None): DataFrame = {
    // Plan-ONLY dispatch: the two paths compute the identical double-op
    // sequence (PropertySpec asserts them bit-equal), so the row count
    // here picks a physical plan, never a result — which licenses an
    // ESTIMATE in place of an exact count (the k12 width-dispatch
    // precedent). Until r10 this ran `persist(); count()` — one extra job
    // plus one cache fill per call, per adjusted query, pure fixed cost at
    // every scale (the 8-vs-32-core cohort below 0.7 was job-count-bound).
    // Callers that already know the exact row count pass it via knownRows
    // (Dmp folds it into the prior-fit aggregate); everyone else gets the
    // leaf-bytes estimate, which over-counts rows by ≥one order (≥48-byte
    // statistic rows, /8 divisor, compressed leaf bytes) and so errs
    // toward the scale-safe ranged path, never toward an oversized
    // single-partition window sort.
    // The windowed path consumes its input exactly once inside the
    // caller's single action, so dropping the persist removes a cache
    // fill without duplicating any upstream work.
    val rows = knownRows.getOrElse(planRowEstimate(df))
    if (rows <= windowMaxRows) bhAdjustWindowed(df, pCol, tieBreak, outCol)
    else bhAdjustRanged(df, pCol, tieBreak, outCol)
  }

  /** Row-count ESTIMATE from plan statistics — no job. Sums the leaf
    * relations' sizeInBytes (cached relations report their real in-memory
    * bytes; file relations their on-disk bytes) and divides by 8 — a
    * deliberate under-count of bytes/row for the ≥48-byte statistic rows
    * the adjusters see, so the row estimate OVER-counts. Suitable only for
    * plan-equivalent dispatches (windowed vs ranged are bit-equal); never
    * use where the count affects a result.
    */
  private[graft] def planRowEstimate(df: DataFrame): Long = {
    val leafBytes = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    (leafBytes / 8).min(BigInt(Long.MaxValue)).toLong
  }

  /** Benjamini–Yekutieli FDR — the dependence-robust BH variant: the
    * step-up quantity is scaled by the harmonic factor c(m) = Σ_{i≤m} 1/i
    * before the suffix-min + clamp. H_m is an ASCENDING driver loop over
    * the (already-counted-for-dispatch) row total — the identical IEEE
    * sequence to the oracle's i-ordered running sum, and O(m) driver time
    * on a number, not a row set. Same two-path size dispatch as
    * [[bhAdjust]]; scale=1 reproduces BH bit-for-bit (p·1.0 is exact).
    */
  def byAdjust(df: DataFrame, pCol: String, tieBreak: String,
               outCol: String = "fdr_by", windowMaxRows: Long = 5000000L): DataFrame = {
    val input =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        Caches.track(df.persist())
      else df
    val m = input.count()
    var h = 0.0
    var i = 1L
    while (i <= m) { h += 1.0 / i; i += 1 }
    if (m <= windowMaxRows) bhAdjustWindowed(input, pCol, tieBreak, outCol, scale = h)
    else bhAdjustRanged(input, pCol, tieBreak, outCol, scale = h)
  }

  /** Holm step-DOWN FWER adjustment (p.adjust method="holm" — the
    * no-assumptions Bonferroni improvement): adjusted p_(i) =
    * min(1, max_{j≤i} (m−j+1)·p_(j)) — a running MAX ascending in rank
    * where BH runs a suffix-min descending. Same two-path size dispatch.
    */
  def holmAdjust(df: DataFrame, pCol: String, tieBreak: String,
                 outCol: String = "p_holm", windowMaxRows: Long = 5000000L): DataFrame =
    // plan-only dispatch — see bhAdjust (holmWindowed ≡ holmRanged
    // bit-equal, PropertySpec)
    if (planRowEstimate(df) <= windowMaxRows) holmWindowed(df, pCol, tieBreak, outCol)
    else holmRanged(df, pCol, tieBreak, outCol)

  private[graft] def holmWindowed(df: DataFrame, pCol: String, tieBreak: String,
                                  outCol: String = "p_holm"): DataFrame = {
    val wRank = Window.orderBy(col(pCol).asc, col(tieBreak).asc)
    val wAll = Window.partitionBy()
    val wMax = Window.orderBy(col("__rn").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__hm",
        col(pCol) * (col("__n") - col("__rn") + 1L).cast("double"))
      .withColumn(outCol, least(max(col("__hm")).over(wMax), lit(1.0)))
      .drop("__rn", "__n", "__hm")
  }

  /** Range-partitioned two-pass Holm — the bhAdjustRanged mirror with the
    * directions flipped: ascending iteration, per-partition raw maxima,
    * PREFIX maxima from earlier partitions seeding each partition's
    * running max. Driver state is O(partitions).
    */
  private[graft] def holmRanged(df: DataFrame, pCol: String, tieBreak: String,
                                outCol: String = "p_holm",
                                numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = Caches.track(df
      .withColumn(pCol, col(pCol).cast("double"))
      .repartitionByRange(parts, col(pCol).asc, col(tieBreak).asc)
      .sortWithinPartitions(col(pCol).asc, col(tieBreak).asc)
      .persist())
    val pIdx = sorted.schema.fieldIndex(pCol)
    val cnts = sorted.groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = cnts.values.sum
    // lowest global rank (1-based) inside each partition
    val rankLow = (0 until parts).map { pid =>
      pid -> ((0 until pid).map(q => cnts.getOrElse(q, 0L)).sum + 1L)
    }.toMap
    val bLow = spark.sparkContext.broadcast(rankLow)
    val bTotal = total
    val maxRaw = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var mx = Double.NegativeInfinity
      var rank = bLow.value.getOrElse(pid, 1L)
      it.foreach { r =>
        val hm = r.getDouble(pIdx) * (bTotal - rank + 1L).toDouble
        rank += 1
        if (hm > mx) mx = hm
      }
      Iterator.single((pid, mx))
    }.collect().toMap
    // prefix maxima: the largest raw value among all SMALLER p-values
    val prefix = (0 until parts).map { pid =>
      val earlier = (0 until pid).map(q => maxRaw.getOrElse(q, Double.NegativeInfinity))
      pid -> (if (earlier.isEmpty) Double.NegativeInfinity else earlier.max)
    }.toMap
    val bPrefix = spark.sparkContext.broadcast(prefix)
    val outSchema = sorted.schema.add(outCol, DoubleType, nullable = false)
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var rank = bLow.value.getOrElse(pid, 1L)
      var run = bPrefix.value.getOrElse(pid, Double.NegativeInfinity)
      it.map { r =>
        val hm = r.getDouble(pIdx) * (bTotal - rank + 1L).toDouble
        rank += 1
        if (hm > run) run = hm
        Row.fromSeq(r.toSeq :+ math.min(run, 1.0))
      }
    }(Encoders.row(outSchema))
  }

  /** Windowed BH — one single-partition sort; right up to ~1e7 result rows. */
  private[graft] def bhAdjustWindowed(df: DataFrame, pCol: String, tieBreak: String,
                                      outCol: String = "fdr",
                                      scale: Double = 1.0): DataFrame = {
    val wRank = Window.orderBy(col(pCol).asc, col(tieBreak).asc)
    val wAll = Window.partitionBy()
    val wMin = Window.orderBy(col("__rn").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__bh", col(pCol) * lit(scale) * col("__n").cast("double") / col("__rn").cast("double"))
      .withColumn(outCol, least(min(col("__bh")).over(wMin), lit(1.0)))
      .drop("__rn", "__n", "__bh")
  }

  /** Range-partitioned two-pass BH — the 100 TB path. One range shuffle on
    * (p, tieBreak), then two tiny driver reduces (per-partition row counts →
    * rank offsets; per-partition BH minima → suffix minima) and one
    * partition-local pass that assigns rank = offset − i and folds the
    * running suffix-min. Driver state is O(partitions), never O(rows).
    */
  private[graft] def bhAdjustRanged(df: DataFrame, pCol: String, tieBreak: String,
                                    outCol: String = "fdr",
                                    numPartitions: Int = 0,
                                    scale: Double = 1.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Sort DESC within ASC range partitions: partition 0 holds the smallest
    // p-values, but each partition is iterated largest-p-first so the
    // suffix-min folds in one forward pass.
    // Tracked, not try/finally-released: the returned pass-3 plan is lazy and
    // still reads `sorted` — an eager unpersist here would force the caller's
    // action to redo the range shuffle + sort. The harness releases it after
    // the query's final action (ops.Caches contract).
    // normalize p to a non-null DoubleType up front: pass 2/3 decode rows
    // with getDouble, and the windowed sibling accepts any numeric — the
    // dispatch must not change accepted inputs at the size threshold
    val sorted = Caches.track(df
      .withColumn(pCol, col(pCol).cast("double"))
      .filter(col(pCol).isNotNull)
      .repartitionByRange(parts, col(pCol).asc, col(tieBreak).asc)
      .sortWithinPartitions(col(pCol).desc, col(tieBreak).desc)
      .persist())
    val pIdx = sorted.schema.fieldIndex(pCol)
    // Pass 1 (O(partitions) to driver): row count per range partition.
    val cnts = sorted.groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = cnts.values.sum
    val totalD = total.toDouble
    // Highest global rank inside each partition (ranks ascend with pid).
    val rankHigh = (0 until parts).map { pid =>
      pid -> (0 to pid).map(q => cnts.getOrElse(q, 0L)).sum
    }.toMap
    val bHigh = spark.sparkContext.broadcast(rankHigh)
    // Pass 2 (O(partitions) to driver): min raw-BH value per partition.
    val minBh = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var mn = Double.PositiveInfinity
      var i = 0L
      val high = bHigh.value.getOrElse(pid, 0L)
      it.foreach { r =>
        val bh = r.getDouble(pIdx) * scale * totalD / (high - i).toDouble
        i += 1
        if (bh < mn) mn = bh
      }
      Iterator.single((pid, mn))
    }.collect().toMap
    // Suffix minima: the smallest raw-BH among all LARGER p-values.
    val suffix = (0 until parts).map { pid =>
      val later = (pid + 1 until parts).map(q => minBh.getOrElse(q, Double.PositiveInfinity))
      pid -> (if (later.isEmpty) Double.PositiveInfinity else later.min)
    }.toMap
    val bSuffix = spark.sparkContext.broadcast(suffix)
    // Pass 3: emit fdr = min(running suffix-min, 1).
    val outSchema = sorted.schema.add(outCol, DoubleType, nullable = false)
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val high = bHigh.value.getOrElse(pid, 0L)
      var run = bSuffix.value.getOrElse(pid, Double.PositiveInfinity)
      var i = 0L
      it.map { r =>
        val bh = r.getDouble(pIdx) * scale * totalD / (high - i).toDouble
        i += 1
        if (bh < run) run = bh
        Row.fromSeq(r.toSeq :+ math.min(run, 1.0))
      }
    }(Encoders.row(outSchema))
  }

  /** Per-group BH — FDR within each `byCol` slice (the multi-contrast
    * per-coef p.adjust). The window is hash-partitioned on the group key, so
    * the sort is per-contrast, never global; bounded by the largest single
    * contrast's probe count.
    */
  def bhAdjustBy(df: DataFrame, byCol: String, pCol: String, tieBreak: String,
                 outCol: String = "fdr"): DataFrame = {
    val wRank = Window.partitionBy(byCol).orderBy(col(pCol).asc, col(tieBreak).asc)
    val wAll = Window.partitionBy(byCol)
    val wMin = Window.partitionBy(byCol).orderBy(col("__rn").desc)
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

  /** Per-group winsorization: clamp a value to that group's [lo, hi]
    * exact percentiles (the outlier-taming step before model features or
    * robust aggregates). One percentile aggregate per group (bounded
    * groups → the bounds table broadcasts), then a row-local clamp — the
    * data itself shuffles zero times. Above ~10M rows per group, swap the
    * exact `percentile` for `approx_percentile` exactly as the quantile
    * profile does (the bounds stop being bit-reproducible, the plan shape
    * is unchanged).
    */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                lo: Double, hi: Double): DataFrame = {
    val bounds = df.groupBy(groupCol).agg(
      expr(s"percentile($valCol, $lo)").as("__lo"),
      expr(s"percentile($valCol, $hi)").as("__hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn(s"${valCol}_w",
        least(greatest(col(valCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Shared base of the two-sample rank tests: collapse the data to
    * per-(key, value) tie cells with per-group counts. The full data
    * shuffles exactly once (the cell aggregate); everything downstream
    * runs on the cell table, which is bounded by distinct values per key.
    * Callers must pass a null-free value column (a null would form its
    * own tie cell and engines disagree on null sort position).
    */
  private def rankCells(df: DataFrame, keyCol: String, valCol: String,
                        groupCol: String, g1: String, g2: String): DataFrame =
    df.filter(col(groupCol).isin(g1, g2))
      .groupBy(keyCol, valCol)
      .agg(sum(when(col(groupCol) === g1, 1L).otherwise(0L)).as("c1"),
        sum(when(col(groupCol) === g2, 1L).otherwise(0L)).as("c2"))
      .withColumn("t", col("c1") + col("c2"))

  /** Two-sample Mann–Whitney (Wilcoxon rank-sum) U per key — the
    * nonparametric alternative to the moderated-t DMP path (rank-based:
    * any monotone transform of the values, beta vs M-value, yields the
    * identical U). Plan shape: one aggregate to tie cells, one per-key
    * cumulative window over the much smaller cell table, one per-key
    * aggregate — the window and final aggregate share the key partitioning,
    * so the cells shuffle once and the test scales with keys, not values.
    *
    * Exactness: average ranks are carried in doubled-rank integer units
    * (`ar2 = 2·avg_rank`, always integral even for .5 ranks) and U leaves
    * integer arithmetic in a single final division; the tie-corrected
    * normal z is one fixed double-op sequence. Keys where every value is
    * tied (zero rank variance) drop out, as in R's wilcox.test.
    * Integer bounds: `ties` sums t³ per key — exact in BIGINT to ~2M rows
    * per (key, value) cell, far past any per-key group size in scope.
    */
  def mannWhitney(df: DataFrame, keyCol: String, valCol: String,
                  groupCol: String, g1: String, g2: String): DataFrame = {
    val cells = rankCells(df, keyCol, valCol, groupCol, g1, g2)
    val wCum = Window.partitionBy(keyCol).orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cells.withColumn("cum", sum("t").over(wCum))
      .withColumn("ar2", lit(2L) * col("cum") - (col("t") - lit(1L)))
    val agg = ranked.groupBy(keyCol).agg(
      sum("c1").as("n1"), sum("c2").as("n2"),
      count(lit(1)).as("ncells"),
      sum(col("c1") * col("ar2")).as("r1_2"),
      sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val nd = (col("n1") + col("n2")).cast("double")
    agg.filter(col("ncells") > 1)
      .withColumn("u1", (col("r1_2") - col("n1") * (col("n1") + lit(1L))).cast("double") / 2.0)
      .withColumn("sigma", sqrt(n1d * n2d / 12.0 *
        (nd + 1.0 - col("ties").cast("double") / (nd * (nd - 1.0)))))
      .withColumn("z", (col("u1") - n1d * n2d / 2.0) / col("sigma"))
      .select(col(keyCol), col("n1"), col("n2"), col("u1"), col("z"))
  }

  /** Two-sample Kolmogorov–Smirnov D per key: max gap between the two
    * empirical CDFs, evaluated at every distinct value. Same cell+window
    * shape (and the same single data shuffle) as [[mannWhitney]]; the gap
    * is kept as the exact integer `|cum1·n2 − cum2·n1|` and divided by
    * n1·n2 once at the end, so D is bit-reproducible. `ks_stat` is the
    * sample-size-scaled statistic D·√(n1·n2/(n1+n2)) fed to the KS
    * asymptotic distribution.
    */
  def ksTest(df: DataFrame, keyCol: String, valCol: String,
             groupCol: String, g1: String, g2: String): DataFrame = {
    val cells = rankCells(df, keyCol, valCol, groupCol, g1, g2)
    val wCum = Window.partitionBy(keyCol).orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCol)
    val gaps = cells
      .withColumn("cum1", sum("c1").over(wCum))
      .withColumn("cum2", sum("c2").over(wCum))
      .withColumn("n1", sum("c1").over(wAll))
      .withColumn("n2", sum("c2").over(wAll))
      .withColumn("gap", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
    val agg = gaps.groupBy(keyCol).agg(
      max("n1").as("n1"), max("n2").as("n2"), max("gap").as("gap"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    agg.filter(col("n1") > 0 && col("n2") > 0)
      .withColumn("d", col("gap").cast("double") / (n1d * n2d))
      .withColumn("ks_stat", col("d") * sqrt(n1d * n2d / (n1d + n2d)))
      .select(col(keyCol), col("n1"), col("n2"), col("d"), col("ks_stat"))
  }

  /** K12 — sample×sample Spearman correlation matrix: ranks are per-sample
    * over that sample's observed probes (doubled-rank integer units, ties
    * exact via the tie-cell trick), pairs correlate over shared probes
    * (pairwise-complete), Pearson-on-ranks from exact integer moments.
    * Plan: cell aggregate + per-sample window + co-keyed join back, then
    * the probe self-join — samples stay the bounded axis, probes scale
    * freely.
    *
    * Width dispatch (the bhAdjust/CC/PageRank size-dispatch pattern): the
    * six rank moments per pair dominate the shuffle. With ranks ≤ 2·P the
    * moment sums are bounded by 4·P³, so below P ≈ 1.3M probes BIGINT
    * (8-byte, codegen'd long arithmetic) is exact — a 300k-probe array
    * rides the cheap path with 85× headroom at the 300_000 threshold.
    * Above it, decimal(38,0) takes over. Either way the FINAL per-pair
    * combination runs in decimal(38,0) over the same exact integer sums,
    * so the two paths are bit-equal by construction (PropertySpec asserts
    * it). ANSI mode (Spark 4 default) turns any bound miscount into an
    * overflow error, never a silent wrap.
    *
    * @param forceDecimal Some(true)/Some(false) pins the moment width for
    *   the equivalence test; None (production) dispatches on probe count.
    */
  def spearmanMatrix(df: DataFrame, probeCol: String, sampleCol: String,
      valCol: String, forceDecimal: Option[Boolean] = None): DataFrame = {
    // Doubled average ranks in ONE window pass over the rows (r9): with
    // cum = count over RANGE unbounded..current (peers included ⇒ the
    // tie group's MAX rank) and t = count over RANGE current..current
    // (the tie count), min+max rank = 2·cum − t + 1 — the identical
    // exact integer the tie-cell construction produced as
    // 2·Σt − (t−1). Both frames share one (sample, order-by-value)
    // window spec, so this is one exchange + one sort, replacing the
    // cells aggregate + cell window + (sample, value) join-back
    // (three shuffles; KernelProbe measured the old chain ~1.6 s/pass
    // at sf0.1).
    val w = Window.partitionBy(sampleCol).orderBy(valCol)
    val cumAll = count(lit(1))
      .over(w.rangeBetween(Window.unboundedPreceding, Window.currentRow))
    val ties = count(lit(1))
      .over(w.rangeBetween(Window.currentRow, Window.currentRow))
    // Both sides of the pair-expansion self-join read the ranked rows —
    // persist (released by the harness via Caches) so the rank window
    // runs once, not once per join side. Projected to the three
    // surviving columns so the cache holds narrow rows.
    val rb = graft.ops.Caches.track(
      df.withColumn("ar2", lit(2L) * cumAll - ties + lit(1L))
        .select(col(probeCol), col(sampleCol), col("ar2"))
        .persist())
    // ONE pass over rb decides the moment width, collects the bounded
    // sample axis AND materializes the cache (was three jobs: an exact
    // distinct-probe count, a distinct-sample collect, and the first
    // consumer's cache fill). The width dispatch may use an ESTIMATE:
    // both widths are bit-equal by construction (PropertySpec), so the
    // HLL ±2% error only moves the cheap/exact crossover, never a result
    // bit; the 250k gate keeps ~4× integer-envelope headroom below the
    // 1.3M-probe bigint bound even at maximal HLL undercount.
    val spark = df.sparkSession
    import spark.implicits._
    val disp = rb.agg(
      approx_count_distinct(col(probeCol)).as("np"),
      collect_set(col(sampleCol)).as("ss")).head()
    val useDecimal = forceDecimal.getOrElse(disp.getLong(0) > 250000L)
    val width = if (useDecimal) "decimal(38,0)" else "bigint"
    // Dict-encode the bounded sample axis (sorted → index order preserves
    // the id sort, so `sa < sb` keeps its string semantics) so the
    // expansion join's pair aggregate hashes one 8-byte int pair instead
    // of two strings per row — the aggregate sees |probe|·|samples/probe|²
    // rows, every byte of key counts. Decoded after the aggregate, which
    // is pairs-sized, not expansion-sized.
    val sampleIds = disp.getSeq[String](1).toArray.sorted
    val sdim = broadcast(
      sampleIds.zipWithIndex.toSeq.toDF(sampleCol, "__sid"))
    val rbe = rb.join(sdim, sampleCol)
    val l = rbe.select(col(probeCol), col("__sid").as("sa_i"),
      col("ar2").cast(width).as("ra"))
    val r = rbe.select(col(probeCol), col("__sid").as("sb_i"),
      col("ar2").cast(width).as("rb"))
    val m = l.join(r, probeCol).filter(col("sa_i") < col("sb_i"))
      .groupBy("sa_i", "sb_i")
      .agg(count(lit(1)).as("cnt"),
        sum("ra").as("msx"), sum("rb").as("msy"),
        sum(col("ra") * col("ra")).as("msxx"),
        sum(col("rb") * col("rb")).as("msyy"),
        sum(col("ra") * col("rb")).as("msxy"))
    val dec = "decimal(38,0)"
    def D(c: String) = col(c).cast(dec)
    val (n, sx, sy, sxx, syy, sxy) =
      (D("cnt"), D("msx"), D("msy"), D("msxx"), D("msyy"), D("msxy"))
    val denx = (n * sxx - sx * sx).cast("double")
    val deny = (n * syy - sy * sy).cast("double")
    m.filter(col("cnt") >= 2 && denx * deny > 0.0)
      .join(broadcast(sdim.toDF("sa", "sa_i")), "sa_i")
      .join(broadcast(sdim.toDF("sb", "sb_i")), "sb_i")
      .select(col("sa"), col("sb"), col("cnt").cast("bigint").as("n_shared"),
        ((n * sxy - sx * sy).cast("double") / sqrt(denx * deny)).as("rho"))
  }

  /** K12 thresholded production variant (r8): emit only sample pairs with
    * |Spearman ρ| ≥ `tau`, via a deterministic sign-sketch pre-filter so
    * the plan is no longer unconditionally samples² — the one k12
    * contract that breaks at 100 TB sample counts. Spearman ρ is Pearson
    * on ranks = the cosine of mean-centered rank vectors, so |ρ| ≥ τ
    * pairs are near-parallel (or near-antipodal) in centered-rank space,
    * and random-hyperplane sign bits (Charikar, STOC'02 — the d04 SimHash
    * family) collide them into shared buckets:
    *
    *  1. per-sample doubled ranks (k12's exact tie-cell construction);
    *  2. per (sample, bit j): the EXACT INTEGER projection sign — with
    *     hash-derived ±1 signs s(probe, j) (first md5 hex digit, engine-
    *     portable), p_j = n·Σ s·ar2 − (Σ ar2)·(Σ s) is n× the projection
    *     of the centered rank vector, all in integer arithmetic, so the
    *     sign is order-free exact in both engines;
    *  3. bits pack into `bands` band signatures, each canonicalized under
    *     global sign flip (lead bit 1 ⇒ complement) so anti-correlated
    *     pairs collide too;
    *  4. pairs sharing any (band, canonical signature) bucket are
    *     candidates; ONLY candidates pay the exact k12 moment aggregate,
    *     and the |ρ| ≥ τ filter runs on the exact value.
    *
    * The band width r is derived from the sample count (smallest r with
    * 4·2^r ≥ samples, floor 4) so expected bucket size stays ~4 and the
    * candidate stage stays ~linear in samples; total bits = bands·r.
    * Semantics are deterministic and SQL-expressible (the d10 rule): the
    * oracle replays the identical sketch, so recall is part of the
    * operator's definition — every emitted pair is EXACT (a true
    * |ρ| ≥ τ pair with k12's bit-identical ρ). A ρ = +1 pair is always
    * found (identical projections ⇒ identical bits ⇒ same bucket in
    * every band). A ρ = −1 pair is found whenever some band has no
    * zero projection: negated rank vectors give negated p_j, and the
    * flip-canonicalization collapses complementary bands — but p_j = 0
    * maps to bit 1 on BOTH sides (sign(0) can't anti-commute), so a
    * band containing a zero projection loses exact complementarity.
    * Pairs barely above τ are found with the standard banded-LSH
    * probability (AnalyticSpec pins the main directions).
    *
    * Width rule: the verify-stage moments use k12's 300k-probe
    * bigint/decimal dispatch; the sketch runs in checked long arithmetic
    * inside SignSketchAgg (exact to ~1.3M probes per sample — the same
    * 4n³ < 2⁶³ envelope as k12's fast path — and loud beyond, never a
    * silent wrap).
    */
  def spearmanThresholded(df: DataFrame, probeCol: String, sampleCol: String,
      valCol: String, tau: Double, bands: Int = 8,
      forceDecimal: Option[Boolean] = None): DataFrame = {
    require(tau > 0.0 && tau < 1.0, s"tau=$tau outside (0, 1)")
    val spark = df.sparkSession
    import spark.implicits._
    // one-window-pass doubled ranks — see spearmanMatrix (r9)
    val w = Window.partitionBy(sampleCol).orderBy(valCol)
    val cumAll = count(lit(1))
      .over(w.rangeBetween(Window.unboundedPreceding, Window.currentRow))
    val ties = count(lit(1))
      .over(w.rangeBetween(Window.currentRow, Window.currentRow))
    // consumed by the sketch (probes×bits) AND the candidate verify —
    // persist so the rank window runs once
    val rb = graft.ops.Caches.track(
      df.withColumn("ar2", lit(2L) * cumAll - ties + lit(1L))
        .select(col(probeCol), col(sampleCol), col("ar2"))
        .persist())
    // Width dispatch on the semantically-correct axis: every moment here
    // (sketch projections and pair sums alike) is bounded by 4·n³ where n
    // is the MAX PER-SAMPLE probe count — not the total probe axis k12
    // conservatively dispatches on (equal only in the dense-grid case).
    // A replica-disjoint or sharded corpus keeps per-sample n small while
    // total probes grow unboundedly; dispatching on the real bound keeps
    // the 64×-sweep pair stream on 8-byte bigint rows instead of 16-byte
    // decimals (the sort/shuffle volume of the verify stage is the
    // operator's dominant memory term).
    // ONE samples-bounded aggregate serves the width dispatch (max
    // per-sample probe count), the sample-axis collect (r derivation +
    // dict-encode) and the rb cache fill — was three jobs (r9).
    val perSample = rb.groupBy(sampleCol).agg(count(lit(1)).as("__n"))
      .collect()
    val useDecimal = forceDecimal.getOrElse(
      (if (perSample.isEmpty) 0L else perSample.map(_.getLong(1)).max) > 1300000L)
    val width = if (useDecimal) "decimal(38,0)" else "bigint"
    val sampleIds = perSample.map(_.getString(0)).sorted
    val nSamples = sampleIds.length.toLong
    val r = (4 to 30).find(b => (1L << b) * 4 >= nSamples).getOrElse(30)
    val nbits = bands * r
    // ±1 per (probe, bit) computed once on the distinct-probe axis and
    // PACKED into a long bitmask (bit set ⇒ +1) — md5 runs probes×bits
    // times, not rows×bits, and the join payload is words, not nbits rows
    val nWords = (nbits + 63) / 64
    def signBit(j: Int): Column =
      when(substring(md5(concat(col(probeCol), lit("#"), lit(j.toString))),
        1, 1) < "8", lit(1L << (j % 64))).otherwise(lit(0L))
    val signWords = (0 until nWords).map { w =>
      (w * 64 until math.min((w + 1) * 64, nbits))
        .map(signBit).reduce(_.bitwiseOR(_))
    }
    val signs = rb.select(col(probeCol)).distinct()
      .select(col(probeCol), array(signWords: _*).as("words"))
    // One sign-sketch buffer per sample (functions/SignSketchAgg — exact
    // integer projections, no per-(sample, bit) row amplification: the
    // groupBy(sample, bit) restatement OOM'd an 8 g heap at the 64×
    // sweep). The skinny joined rows pre-partition by sample so the
    // object aggregation keeps ONE buffer per sample and its partial
    // output already satisfies the final distribution (the
    // PoissonBootAgg pattern).
    val sketch = udaf(new graft.functions.SignSketchAgg(nbits))
    val proj = rb.join(signs, probeCol)
      .repartition(col(sampleCol))
      .groupBy(col(sampleCol))
      .agg(sketch(col("ar2"), col("words")).as("bits"))
    // band signatures row-local from the bit array; canonicalized under
    // global sign flip (lead bit 1 ⇒ complement) so anti-correlated pairs
    // collide too
    def bitAt(j: Int) = element_at(col("bits"), j + 1)
    val bandCols = (0 until bands).map { b =>
      val sig = (0 until r).map(i => bitAt(b * r + i) * lit(1L << i))
        .reduce(_ + _)
      struct(lit(b).as("band"),
        when(bitAt(b * r) === 1, lit((1L << r) - 1) - sig).otherwise(sig)
          .as("canon"))
    }
    val bandSig = proj
      .select(col(sampleCol), explode(array(bandCols: _*)).as("bc"))
      .select(col(sampleCol), col("bc.band").as("band"),
        col("bc.canon").as("canon"))
    // Candidate pairs on DICT-ENCODED int sample keys (k12's shuffle-byte
    // rule; index order preserves the lexical sort so sa_i < sb_i keeps
    // the string semantics).
    val sdim = broadcast(sampleIds.zipWithIndex.toSeq.toDF(sampleCol, "__sid"))
    val bse = bandSig.join(sdim, sampleCol)
      .select(col("__sid"), col("band"), col("canon"))
    val cand = bse.select(col("__sid").as("sa_i"), col("band"), col("canon"))
      .join(bse.select(col("__sid").as("sb_i"), col("band"), col("canon")),
        Seq("band", "canon"))
      .filter(col("sa_i") < col("sb_i"))
      .select("sa_i", "sb_i").distinct()
    // Exact k12 moments, restricted to candidates — in k12's OWN plan
    // shape: the probe-keyed self-join expands pairs STREAM-SIDE inside
    // the join stage (never materializing/shuffling expanded rows — the
    // (l ⋈ cand) ⋈ rr formulation shuffled |cand|×probes rows and OOM'd
    // the 64× sweep on an 8 g heap), and the candidate restriction is a
    // BROADCAST left-semi applied in the same stage, so only candidate
    // pairs reach the moment aggregate. cand is bounded by Σ C(bucket, 2)
    // (≈ bands × samples × expected-bucket-size ≈ linear in samples by
    // the derived-r rule), so the broadcast stays tens of MB at 64k
    // samples; like d03's LSH bands, adversarial all-identical corpora
    // inflate it only with true near-duplicates.
    val rbe = rb.join(sdim, sampleCol)
    val l = rbe.select(col(probeCol), col("__sid").as("sa_i"),
      col("ar2").cast(width).as("ra"))
    val rr = rbe.select(col(probeCol), col("__sid").as("sb_i"),
      col("ar2").cast(width).as("rbv"))
    val m = l.join(rr, probeCol).filter(col("sa_i") < col("sb_i"))
      .join(broadcast(cand), Seq("sa_i", "sb_i"), "left_semi")
      .groupBy("sa_i", "sb_i")
      .agg(count(lit(1)).as("cnt"),
        sum("ra").as("msx"), sum("rbv").as("msy"),
        sum(col("ra") * col("ra")).as("msxx"),
        sum(col("rbv") * col("rbv")).as("msyy"),
        sum(col("ra") * col("rbv")).as("msxy"))
    val dec = "decimal(38,0)"
    def D(c: String) = col(c).cast(dec)
    val (n, sx, sy, sxx, syy, sxy) =
      (D("cnt"), D("msx"), D("msy"), D("msxx"), D("msyy"), D("msxy"))
    val denx = (n * sxx - sx * sx).cast("double")
    val deny = (n * syy - sy * sy).cast("double")
    m.filter(col("cnt") >= 2 && denx * deny > 0.0)
      .withColumn("rho",
        (n * sxy - sx * sy).cast("double") / sqrt(denx * deny))
      .filter(abs(col("rho")) >= tau)
      .join(broadcast(sdim.toDF("sa", "sa_i")), "sa_i")
      .join(broadcast(sdim.toDF("sb", "sb_i")), "sb_i")
      .select(col("sa"), col("sb"), col("cnt").cast("bigint").as("n_shared"),
        col("rho"))
  }

  /** Per-group z-score normalization (the feature-standardization step,
    * grouped): moments come from ONE exact-integer aggregate per group
    * (the same bit-stable path as the variance operators — integer n/s/ss,
    * then a fixed double-op sequence), broadcast back, z computed
    * row-locally. The value column must be integer-valued; the data
    * itself never shuffles.
    */
  def zscoreNormalize(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val v = col(valCol).cast("bigint")
    val m = df.groupBy(groupCol).agg(count(lit(1)).as("__n"),
      sum(v).as("__s"), sum(v * v).as("__ss"))
    df.join(broadcast(m), groupCol)
      .withColumn("z",
        (v.cast("double") - col("__s").cast("double") / col("__n").cast("double")) /
          sqrt(graft.functions.Fns.varFromMoments(col("__n"), col("__s"), col("__ss"))))
      .drop("__n", "__s", "__ss")
  }
}
