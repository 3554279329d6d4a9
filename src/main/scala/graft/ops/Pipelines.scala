package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** E2 — the reference's flagship end-to-end lifecycle as ONE lazy DataFrame
  * DAG (reference /root/reference/workflow.R:1-722: "IDAT -> QC -> BMIQ
  * (per run) -> ComBat (across all runs) -> PCA"). Where the reference
  * crosses Python↔R process boundaries and round-trips CSV/RData temp
  * files between stages (workflow.R:86-91), the engine chains the same
  * stages as transforms — Catalyst sees the whole plan, and the only
  * materialization points are the two iterative kernels' internal
  * persists.
  */
object Pipelines {

  /** QC'd → BMIQ-normalized → ComBat-adjusted → top-k → PCA coordinates.
    *
    * @return PCA coordinates per surviving sample (the workflow's final
    *         plot-ready table, workflow.R:229-237).
    */
  def fullWorkflow(spark: SparkSession, beta: DataFrame, detp: DataFrame,
                   sheet: DataFrame, manifest: DataFrame,
                   qcThr: Double = 0.05, topK: Int = 50, pcs: Int = 3,
                   bmiqMinPerType: Int = 50): DataFrame = {
    // 1. per-run QC (workflow.R:43-75): sample mean-detP filter + probe
    // filter (observed-entry semantics — long model)
    val qcd = Qc.qcBetas(beta, detp, nSamples = -1, thr = qcThr)

    // 2. BMIQ intra-sample normalization (workflow.R:84-108)
    val normalized = Bmiq.bmiq(qcd, manifest, minPerType = bmiqMinPerType)
      .select(col("probe_id"), col("sample_id"), col("beta_norm").as("beta"))

    // 3. ComBat across runs on M-values (workflow.R:112-150), back to betas.
    // ComBat consumes its input twice (cell-moment pass + adjustment join);
    // persist the normalized chain so the BMIQ flatMapGroups runs once, not
    // twice — the same in-memory-intermediate posture as the adjusted
    // persist below.
    val m = normalized.withColumn("m", Fns.mValueClamped(col("beta")))
      .select("probe_id", "sample_id", "m")
      .persist()
    val adjusted = Combat.combat(m, sheet)
      .withColumn("beta", Fns.inverseMValue(col("m_adj")))
      .select("probe_id", "sample_id", "beta")
      // PCA reads its input twice (top-k selection, then the pivot); persist
      // so the QC→BMIQ→ComBat chain isn't recomputed — the reference's
      // in-memory reuse of intermediates (SURVEY.md §4).
      .persist()

    // 4-5. top-k variable probes + PCA (workflow.R:155-237). pcaCoords
    // materializes its bounded result eagerly, so the chain cache can be
    // dropped before returning — nothing leaks past the call.
    try Pca.pcaCoords(adjusted, topK, pcs, scale = true)
    finally { adjusted.unpersist(false); m.unpersist(false) }
  }

  /** The LLM-data analog of [[fullWorkflow]]: the whole curation tier as
    * ONE DAG — exact dedup → near-dup clusters → best-of-cluster keep →
    * heuristic quality gate → benchmark decontamination → context-window
    * chunking → sequence packing. Returns the packed training sequences
    * with their provenance (doc, chunk, bin).
    *
    * Scale posture is inherited from each stage (see their scaladoc); the
    * one cross-stage concern is that the survivor set feeds three
    * consumers (decontaminate's shingles, the chunker, and the final
    * join), so it is persisted once and released before returning.
    */
  def curationPipeline(docs: org.apache.spark.sql.DataFrame,
                       benchmark: org.apache.spark.sql.DataFrame,
                       minJaccard: Double = 0.5, minQuality: Double = 0.3,
                       minOverlap: Int = 5, chunkSize: Int = 50,
                       stride: Int = 40, capacity: Long = 512,
                       funnel: Option[CurationFunnel] = None,
                       maxDf: Option[Long] = graft.llm.Curation.DefaultMaxDf)
      : org.apache.spark.sql.DataFrame = {
    import graft.llm.{Curation, Dedup, TextAnalysis}
    funnel.foreach(_.register(docs.sparkSession))
    def observed(df: org.apache.spark.sql.DataFrame, stage: String) =
      funnel.fold(df)(_ => df.observe(s"curation_$stage", count(lit(1)).as("rows")))
    // exact-dedup survivors feed three consumers (the cluster-map build,
    // the scored side, and the provenance join) — persist like `survivors`.
    val exact = Caches.track(
      observed(Dedup.exactDedup(docs), "after_exact_dedup").persist())
    // kept feeds two consumers (decontaminate's shingle build and the
    // survivor join) — without a persist the lazy bestOfCluster residue
    // (the qualityScore regex over every doc + the cluster rank window)
    // re-evaluated under both branches (r9: one full regex pass saved).
    val kept = Caches.track(observed(
      Curation.bestOfCluster(exact, minJaccard,
          TextAnalysis.qualityScore(col("text")), maxDf)
        .select(col("kept_doc").as("doc_id"), col("score"))
        .join(exact, "doc_id")
        .filter(col("score") >= minQuality), "after_quality_gate")
      .persist())
    // survivors feed two consumers (chunk text + provenance join); the
    // cache is registered in Caches and released by the harness.
    val survivors = Caches.track(
      observed(
        kept.join(Curation.decontaminate(kept, benchmark, minOverlap)
            .filter(!col("contaminated")).select("doc_id"), "doc_id"),
        "after_decontamination")
        .persist())
    val chunks = Curation.chunkDocuments(survivors, chunkSize, stride)
      .withColumn("chunk_key",
        col("doc_id") * 10000L + col("chunk_id")) // chunk count/doc is bounded
    val packed = Curation.packSequences(
      chunks.select(col("chunk_key").as("doc_id"), col("chunk").as("text")),
      capacity).toDF()
    val meta = chunks.select(col("chunk_key"), col("doc_id").as("src_doc"),
      col("chunk_id"))
    packed.join(meta, packed.col("doc_id") === meta.col("chunk_key"))
      .select(col("src_doc"), col("chunk_id"), col("tokens"), col("bin_id"))
  }

  /** Per-stage row counts of [[curationPipeline]] via named
    * `Dataset.observe` — the funnel a production curation job reports
    * (after exact dedup → after cluster-keep + quality gate → after
    * decontamination). Observed metrics piggyback on the pipeline's own
    * actions (no extra job, no extra scan, exact counts at task commit);
    * this collector is a QueryExecutionListener because the pipeline's
    * internal persists/size-dispatch collects mean a stage can complete
    * under any of several actions — the listener keeps the max per stage
    * (every full pass reports the same value; CollectMetrics is a pushdown
    * barrier, so no partial-flow count can exceed it). Delivery is on the
    * listener thread: read [[summary]] after the pipeline action returns
    * (StreamingSpec-style polling in tests).
    */
  final class CurationFunnel
      extends org.apache.spark.sql.util.QueryExecutionListener {
    private val seen = scala.collection.concurrent.TrieMap.empty[String, Long]
    private[Pipelines] def register(spark: org.apache.spark.sql.SparkSession): Unit =
      spark.listenerManager.register(this)
    override def onSuccess(funcName: String,
                           qe: org.apache.spark.sql.execution.QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.foreach {
        case (name, row) if name.startsWith("curation_") &&
            row.schema.fieldNames.contains("rows") =>
          val n = row.getAs[Long]("rows")
          seen.updateWith(name.stripPrefix("curation_")) {
            case Some(prev) => Some(math.max(prev, n))
            case None => Some(n)
          }
        case _ =>
      }
    override def onFailure(funcName: String,
                           qe: org.apache.spark.sql.execution.QueryExecution,
                           exception: Exception): Unit = ()
    def summary: Map[String, Long] = seen.toMap
  }
}
