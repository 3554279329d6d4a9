package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Developer tool (the StageProbe pattern): time the interior stages of
  * the k12 Spearman kernel — rank cells, rank join-back, the probe-keyed
  * pair-expansion aggregate — so optimization targets the measured stage,
  * not a guess. Usage: runMain graft.KernelProbe [sfDir]
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val which = if (args.length > 1) args(1) else "k12"
    if (which == "e04") { probeE04(spark, sfDir); spark.stop(); return }
    if (which == "k01") { probeK01(spark, sfDir); spark.stop(); return }
    if (which == "k12t") { probeK12T(spark, sfDir); spark.stop(); return }

    val df = Tables.betaLong(spark, sfDir)
    df.count() // warm the shared view
    val (probeCol, sampleCol, valCol) = ("probe_id", "sample_id", "beta")

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      time("cells agg")(
        df.groupBy(sampleCol, valCol).agg(count(lit(1)).as("t")).count())
      val cells = df.groupBy(sampleCol, valCol).agg(count(lit(1)).as("t"))
      val wCum = Window.partitionBy(sampleCol).orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = cells.withColumn("cum", sum("t").over(wCum))
        .withColumn("ar2", lit(2L) * col("cum") - (col("t") - lit(1L)))
        .select(col(sampleCol), col(valCol), col("ar2"))
      time("rank window")(ranked.count())
      val rb = df.join(ranked, Seq(sampleCol, valCol))
      time("rank join-back")(rb.count())
      time("distinct probes")(df.select(probeCol).distinct().count())
      import spark.implicits._
      val t0 = System.nanoTime()
      val sampleIds = df.select(sampleCol).distinct().as[String].collect().sorted
      println(f"[probe] sample collect          ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=${sampleIds.length}")
      val sdim = broadcast(sampleIds.zipWithIndex.toSeq.toDF(sampleCol, "__sid"))
      val rbe = rb.join(sdim, sampleCol)
      val width = "bigint"
      val l = rbe.select(col(probeCol), col("__sid").as("sa_i"),
        col("ar2").cast(width).as("ra"))
      val r = rbe.select(col(probeCol), col("__sid").as("sb_i"),
        col("ar2").cast(width).as("rb"))
      time("pair join (count only)")(
        l.join(r, probeCol).filter(col("sa_i") < col("sb_i")).count())
      time("pair join + 6-mom agg")(
        l.join(r, probeCol).filter(col("sa_i") < col("sb_i"))
          .groupBy("sa_i", "sb_i")
          .agg(count(lit(1)).as("cnt"),
            sum("ra").as("msx"), sum("rb").as("msy"),
            sum(col("ra") * col("ra")).as("msxx"),
            sum(col("rb") * col("rb")).as("msyy"),
            sum(col("ra") * col("rb")).as("msxy")).count())
      // integer-probe-key variant of the same expansion
      val rbi = rb.join(sdim, sampleCol)
        .withColumn("__pid", xxhash64(col(probeCol)))
      val li = rbi.select(col("__pid"), col("__sid").as("sa_i"),
        col("ar2").cast(width).as("ra"))
      val ri = rbi.select(col("__pid"), col("__sid").as("sb_i"),
        col("ar2").cast(width).as("rb"))
      time("pair join int key + agg")(
        li.join(ri, "__pid").filter(col("sa_i") < col("sb_i"))
          .groupBy("sa_i", "sb_i")
          .agg(count(lit(1)).as("cnt"),
            sum("ra").as("msx"), sum("rb").as("msy"),
            sum(col("ra") * col("ra")).as("msxx"),
            sum(col("rb") * col("rb")).as("msyy"),
            sum(col("ra") * col("rb")).as("msxy")).count())
      time("full spearmanMatrix")(
        graft.ops.Analytic.spearmanMatrix(df, probeCol, sampleCol, valCol).count())
      graft.ops.Caches.releaseAll()
    }
    spark.stop()
  }

  /** Interior decomposition of the k12 thresholded Spearman: rank+persist,
    * dispatch aggregate, sign-sketch projection, candidate pairs, verify.
    */
  private def probeK12T(spark: SparkSession, sfDir: String): Unit = {
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    import org.apache.spark.sql.expressions.Window
    val df = Tables.betaLong(spark, sfDir)
    df.count()
    val (probeCol, sampleCol, valCol) = ("probe_id", "sample_id", "beta")
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val cells = df.groupBy(sampleCol, valCol).agg(count(lit(1)).as("t"))
      val wCum = Window.partitionBy(sampleCol).orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = cells.withColumn("cum", sum("t").over(wCum))
        .withColumn("ar2", lit(2L) * col("cum") - (col("t") - lit(1L)))
        .select(col(sampleCol), col(valCol), col("ar2"))
      val rb = graft.ops.Caches.track(
        df.join(ranked, Seq(sampleCol, valCol))
          .select(col(probeCol), col(sampleCol), col("ar2"))
          .persist())
      time("dispatch agg")(
        rb.groupBy(sampleCol).agg(count(lit(1)).as("__n")).collect().length)
      val perSample = rb.groupBy(sampleCol).agg(count(lit(1)).as("__n")).collect()
      val sampleIds = perSample.map(_.getString(0)).sorted
      val nSamples = sampleIds.length.toLong
      val r = (4 to 30).find(b => (1L << b) * 4 >= nSamples).getOrElse(30)
      val nbits = 8 * r
      val nWords = (nbits + 63) / 64
      def signBit(j: Int) =
        when(substring(md5(concat(col(probeCol), lit("#"), lit(j.toString))),
          1, 1) < "8", lit(1L << (j % 64))).otherwise(lit(0L))
      val signWords = (0 until nWords).map { w =>
        (w * 64 until math.min((w + 1) * 64, nbits))
          .map(signBit).reduce(_.bitwiseOR(_))
      }
      val signs = rb.select(col(probeCol)).distinct()
        .select(col(probeCol), array(signWords: _*).as("words"))
      time("signs count")(signs.count())
      val sketch = udaf(new graft.functions.SignSketchAgg(nbits))
      val proj = rb.join(signs, probeCol)
        .repartition(col(sampleCol))
        .groupBy(col(sampleCol))
        .agg(sketch(col("ar2"), col("words")).as("bits"))
      time("sketch proj")(proj.count())
      time("full thresholded")(
        graft.ops.Analytic.spearmanThresholded(df, probeCol, sampleCol,
          valCol, tau = 0.25).count())
      graft.ops.Caches.releaseAll()
    }
  }

  /** Interior decomposition of the k01 all-CpG PCA: sample collect, the
    * centered long table, the collect_list + Dataset-decode + sparse-row
    * build, and the Gram treeAggregate.
    */
  private def probeK01(spark: SparkSession, sfDir: String): Unit = {
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    import spark.implicits._
    val beta = Tables.betaLong(spark, sfDir)
    beta.count()
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      time("samples collect")(
        beta.select("sample_id").distinct().as[String].collect().length)
      val samples = beta.select("sample_id").distinct().as[String].collect().sorted
      val nS = samples.length
      val sdim = broadcast(samples.zipWithIndex.toSeq.toDF("sample_id", "__sid"))
      val mu = beta.groupBy("probe_id").agg(avg("beta").as("__mu"))
      val centered = beta.join(mu, "probe_id").join(sdim, "sample_id")
        .select(col("probe_id"), col("__sid"), (col("beta") - col("__mu")).as("v"))
      time("centered count")(centered.count())
      val grouped = centered.groupBy("probe_id")
        .agg(collect_list(struct(col("__sid").as("_1"), col("v").as("_2"))).as("cells"))
      time("collect_list count")(grouped.count())
      val rows = grouped.select("cells").as[Seq[(Int, Double)]]
        .rdd.map { cells =>
          val sorted = cells.sortBy(_._1)
          org.apache.spark.mllib.linalg.Vectors.sparse(
            nS, sorted.map(_._1).toArray, sorted.map(_._2).toArray)
        }
      time("rdd decode count")(rows.count())
      time("gram")(
        { new org.apache.spark.mllib.linalg.distributed.RowMatrix(rows, 0L, nS)
            .computeGramianMatrix(); 1L })
      time("full pcaAllCpg")(graft.ops.Pca.pcaAllCpg(beta, 3).count())
      graft.ops.Caches.releaseAll()
    }
  }

  /** Cumulative-prefix decomposition of the e04 curation pipeline (the
    * StageProbe pattern: cold kernel caches each step, so step N's delta
    * over step N−1 is that stage's cost).
    */
  private def probeE04(spark: SparkSession, sfDir: String): Unit = {
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    import graft.llm.{Curation, Dedup, TextAnalysis}
    val docsAll = Tables.table(spark, sfDir, "documents")
    docsAll.count()
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val docs = docsAll.filter(col("doc_id") >= 5)
      val bench = docsAll.filter(col("doc_id") < 5)
      time("exactDedup")(Dedup.exactDedup(docs).count())
      val exact = graft.ops.Caches.track(Dedup.exactDedup(docs).persist())
      time("exact persist+resolve")(
        Curation.resolveMaxDf(exact, Some(Curation.AutoMaxDf)).get)
      time("shingles persist")({
        val sh = graft.ops.Caches.track(Dedup.shingles(exact).persist())
        sh.count()
      })
      val sh = graft.ops.Caches.track(Dedup.shingles(exact).persist())
      time("dfPruned pairs")(
        Dedup.jaccardPairsDfPruned(sh, 0.5, 256L).count())
      time("dedupClusters")(
        Curation.dedupClusters(exact, 0.5, Some(256L)).count())
      time("bestOfCluster")(
        Curation.bestOfCluster(exact, 0.5,
          TextAnalysis.qualityScore(col("text")), Some(256L)).count())
      val kept0 = Curation.bestOfCluster(exact, 0.5,
          TextAnalysis.qualityScore(col("text")), Some(256L))
        .select(col("kept_doc").as("doc_id"), col("score"))
        .join(exact, "doc_id")
        .filter(col("score") >= 0.3)
      val kept = graft.ops.Caches.track(kept0.persist())
      time("kept persist")(kept.count())
      time("decontaminate")(
        kept.join(Curation.decontaminate(kept, bench, 5)
          .filter(!col("contaminated")).select("doc_id"), "doc_id").count())
      val survivors = graft.ops.Caches.track(
        kept.join(Curation.decontaminate(kept, bench, 5)
          .filter(!col("contaminated")).select("doc_id"), "doc_id").persist())
      survivors.count()
      time("chunk")(
        Curation.chunkDocuments(survivors, 50, 40).count())
      val chunks = Curation.chunkDocuments(survivors, 50, 40)
        .withColumn("chunk_key", col("doc_id") * 10000L + col("chunk_id"))
      time("pack")(
        Curation.packSequences(
          chunks.select(col("chunk_key").as("doc_id"), col("chunk").as("text")),
          512).toDF().count())
      time("full e04 (fresh)")({
        graft.ops.Caches.releaseAll()
        graft.ops.Pipelines.curationPipeline(docs, bench)
          .orderBy("src_doc", "chunk_id").count()
      })
      graft.ops.Caches.releaseAll()
    }
  }
}
