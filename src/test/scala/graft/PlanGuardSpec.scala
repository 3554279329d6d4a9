package graft

import org.apache.spark.sql.functions._

/** Automated plan-regression guard: the scale invariants PlanAudit checks
  * by hand, asserted over EVERY registered query so a regression fails
  * `sbt test` instead of surfacing at 100 TB. Uses sf0.001 — building a
  * query may execute its eager parts (writes, kernel collects), which is
  * cheap at this scale; the *plan shape* under test is scale-independent.
  */
class PlanGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no query plans a CartesianProduct") {
    // BroadcastNestedLoopJoin over a broadcast one-row side (sketches,
    // corpus totals) is the sanctioned cross-join shape; the
    // CartesianProduct node — both sides partitioned — is never acceptable.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.executedPlan.toString
          finally graft.ops.Caches.releaseAll()
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("dimension lookups broadcast instead of shuffling the fact side") {
    val plan = SparkEntry.queries("j05_lookup_rename")(spark, sfDir)
      .queryExecution.executedPlan.toString
    graft.ops.Caches.releaseAll()
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("flagship top-k ends in TakeOrderedAndProject, not a global sort") {
    val plan = SparkEntry.queries("w01_topk_variance")(spark, sfDir)
      .queryExecution.executedPlan.toString
    graft.ops.Caches.releaseAll()
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("b03's fact scan carries a dynamicpruning partition filter") {
    val plan = SparkEntry.queries("b03_partition_pruned_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    graft.ops.Caches.releaseAll()
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(1200))
  }

  test("filter pushdown reaches the parquet scan on a raw-table query") {
    val plan = Tables.table(spark, sfDir, "documents")
      .filter(col("lang") === "en").select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      plan.take(800))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      plan.take(800))
  }
}
