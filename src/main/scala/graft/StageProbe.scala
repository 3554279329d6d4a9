package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Developer tool: time the e02 full-workflow chain stage-by-stage
  * (cumulative prefixes, cold kernel caches each step) to see where the
  * pipeline's wall time actually goes. Usage:
  * runMain graft.StageProbe [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ops._
    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { rep =>
      graft.ops.Caches.releaseAll()
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-18s rep$rep ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val beta = Tables.betaLong(spark, sfDir)
    val detp = Tables.detpLong(spark, sfDir)
    val sheet = Tables.sampleSheet(spark, sfDir)
    val manifest = Tables.probeManifest(spark, sfDir)
    // warm the shared views + JIT outside the probes
    Seq(beta, detp, sheet, manifest).foreach(_.count())

    time("qc")(Qc.qcBetas(beta, detp, nSamples = -1, thr = 0.09).count())
    time("qc+bmiq") {
      val qcd = Qc.qcBetas(beta, detp, nSamples = -1, thr = 0.09)
      Bmiq.bmiq(qcd, manifest, minPerType = 10).count()
    }
    time("qc+bmiq+combat") {
      val qcd = Qc.qcBetas(beta, detp, nSamples = -1, thr = 0.09)
      val norm = Bmiq.bmiq(qcd, manifest, minPerType = 10)
        .select(col("probe_id"), col("sample_id"),
          graft.functions.Fns.mValueClamped(col("beta_norm")).as("m"))
        .persist()
      try Combat.combat(norm, sheet).count()
      finally norm.unpersist(false)
    }
    time("full e02")(SparkEntry.queries("e02_full_workflow")(spark, sfDir).count())
    spark.stop()
  }
}
