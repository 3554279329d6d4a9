package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K7 — pOOBAH detection p-values + beta extraction over the long IDAT
  * intensity model (SURVEY.md §2 K7/S5, reclaimed round 6).
  *
  * The algorithm is PUBLIC: "P-value with OOB probes for Array
  * Hybridization" (Zhou W, Triche TJ, Laird PW, Shen H — "SeSAMe: reducing
  * artifactual detection of DNA methylation by Infinium BeadChips in
  * genomic deletions", Nucleic Acids Research 2018). Infinium Type I
  * probes measure in one color channel but their beads also fluoresce in
  * the other, OUT-OF-BAND, channel; those OOB intensities are pure
  * background, so per sample and channel they form an empirical null
  * distribution. A probe's detection p-value is the probability that
  * background meets or exceeds its observed signal:
  *
  *   p = 1 − ecdf_channel(signal),  ecdf(x) = #{oob ≤ x} / #oob
  *
  * with signal = M+U in the probe's design channel for Type I, and (our
  * documented convention) the per-channel bead intensity for Type II with
  * the probe keeping the more favorable (minimum) of its two channel
  * p-values. The reference applies this masking at threshold 0.05 via
  * `pOOBAH(sdf, pval.threshold = 0.05)` (/root/reference/idat.r:71) before
  * beta extraction (`getBetas`, idat.r:72).
  *
  * Scale posture: the ecdf is NOT computed driver-side — the classic
  * union-and-running-count trick makes it one shuffle: tag OOB rows 1 and
  * probe-signal rows 0, sort each (sample, channel) window by (value, tag
  * desc) and running-sum the tag; at every probe row the running sum is
  * exactly #{oob ≤ signal}. One window pass per (sample, channel), and a
  * window partition is array-size bounded (~1M beads) — the same
  * per-sample bound BMIQ and quantile normalization document. Samples are
  * the axis that grows at 100 TB, and samples parallelize perfectly.
  */
object Poobah {

  /** Recover probe metadata from the fixture's address scheme: addresses
    * `k` are Type II single beads, `1e8 + k` / `2e8 + k` are the Type I
    * U/M beads, and a Type I probe's design (in-band) channel is Grn for
    * k ≡ 0 (mod 4), Red otherwise. In production this step is a broadcast
    * manifest join (address → probe, type, channel); the fixture manifest
    * is closed-form, so the join collapses to row-local arithmetic — the
    * cheaper plan with identical semantics.
    */
  def decodeAddress(idat: DataFrame): DataFrame =
    idat
      .withColumn("kk", expr("address % 100000000"))
      .withColumn("tier", expr("address div 100000000"))
      .withColumn("design_type", when(col("tier") === 0, 2).otherwise(1))
      .withColumn("bead",
        when(col("tier") === 0,
          when(col("channel") === "Grn", "M").otherwise("U"))
          .when(col("tier") === 1, "U")
          .otherwise("M"))
      .withColumn("in_band",
        col("tier") === 0 ||
          col("channel") === when(col("kk") % 4 === 0, "Grn").otherwise("Red"))
      .withColumn("probe_id", format_string("cg%07d", col("kk")))
      .drop("kk", "tier")

  /** Detection p-values: `(sample_id, probe_id, detp)`. Input needs
    * `sample_id, channel, probe_id, design_type, in_band, mean`
    * ([[decodeAddress]] or [[graft.Tables.idatLong]] both provide them).
    */
  def detectionP(idat: DataFrame): DataFrame = {
    // Background: Type I beads read in their non-design channel.
    val oob = idat.filter(col("design_type") === 1 && !col("in_band"))
      .select(col("sample_id"), col("channel"),
        col("mean").cast("long").as("value"),
        lit(1).as("is_oob"), lit(null).cast("string").as("probe_id"))
    // Signals: Type I total (M+U) in the design channel; Type II per-bead
    // per-channel (min-p across the two channels taken at the end).
    val sigI = idat.filter(col("design_type") === 1 && col("in_band"))
      .groupBy("sample_id", "channel", "probe_id")
      .agg(sum(col("mean").cast("long")).as("value"))
      .select(col("sample_id"), col("channel"), col("value"),
        lit(0).as("is_oob"), col("probe_id"))
    val sigII = idat.filter(col("design_type") === 2)
      .select(col("sample_id"), col("channel"),
        col("mean").cast("long").as("value"),
        lit(0).as("is_oob"), col("probe_id"))

    // ecdf by union + running count: OOB ties sort BEFORE signal ties
    // (is_oob desc at equal value) so the running sum at a signal row is
    // #{oob ≤ value} — the ≤ of the ecdf definition. The running sum read
    // at signal rows is tie-order-independent: every equal-or-smaller OOB
    // row precedes every signal row it ties with.
    val wRun = Window.partitionBy("sample_id", "channel")
      .orderBy(col("value").asc, col("is_oob").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("sample_id", "channel")
    oob.unionAll(sigI).unionAll(sigII)
      .withColumn("cnt", sum("is_oob").over(wRun))
      .withColumn("noob", sum("is_oob").over(wAll))
      .filter(col("is_oob") === 0)
      .groupBy("sample_id", "probe_id")
      .agg(min(lit(1.0) - col("cnt").cast("double") / col("noob").cast("double"))
        .as("detp"))
  }

  /** Beta values `(sample_id, probe_id, beta)`: β = M / (M + U) over the
    * in-band bead intensities (reference `getBetas`, idat.r:72). One hash
    * aggregate — Type I sums its two design-channel beads, Type II its
    * Grn (M) and Red (U) reads, through the same two conditional sums.
    */
  def betas(idat: DataFrame): DataFrame =
    idat.filter(col("in_band"))
      .groupBy("sample_id", "probe_id")
      .agg(
        sum(when(col("bead") === "M", col("mean").cast("long")).otherwise(0L)).as("m"),
        sum(when(col("bead") === "U", col("mean").cast("long")).otherwise(0L)).as("u"))
      .select(col("sample_id"), col("probe_id"),
        (col("m").cast("double") / (col("m") + col("u")).cast("double")).as("beta"))
}
