package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation checks (the Deequ/Great-Expectations shape):
  * declare per-row boolean expectations, get back one violations row per
  * rule. The entire report is ONE aggregate pass — every rule becomes a
  * `sum(when(!rule, 1))` column in the same hash aggregate, so N rules
  * cost one scan with map-side partial aggregation, never N scans. At
  * 100 TB that is the difference between a nightly gate and an
  * unrunnable one.
  *
  * Rules are plain `Column` predicates, so pushdown-friendly column
  * pruning applies: the scan reads only the columns the rules mention.
  */
object Validation {

  final case class Rule(name: String, predicate: Column)

  /** One row per rule: (rule, violations, total, pass_fraction). A NULL
    * predicate result counts as a violation — an expectation that cannot
    * be evaluated is not met (the Deequ convention).
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame =
    report(df, rules, Nil)

  /** [[validate]] sliced per group (per source, per shard, per ingest
    * batch — the gate a pipeline applies before admitting one supplier's
    * data). Still one aggregate pass; the shuffle carries one partial
    * report row per (group, partition).
    */
  def validateBy(df: DataFrame, groupCol: String, rules: Seq[Rule]): DataFrame =
    report(df, rules, Seq(groupCol))

  private def report(df: DataFrame, rules: Seq[Rule],
                     by: Seq[String]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    // coalesce: sum() over zero rows is NULL — an empty input must report
    // 0 violations explicitly, not a NULL a downstream gate silently drops.
    val aggs = count(lit(1)).as("total") +:
      rules.map(r => coalesce(sum(when(coalesce(r.predicate, lit(false)), 0L)
        .otherwise(1L)), lit(0L)).as(s"__v_${r.name}"))
    val one =
      if (by.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // unpivot each report row into (rule, violations, total) — bounded by
    // groups × rules, not the data.
    val pairs = rules.flatMap(r => Seq(lit(r.name), col(s"__v_${r.name}")))
    one.select(by.map(col) ++ Seq(col("total"),
        explode(map(pairs: _*)).as(Seq("rule", "violations"))): _*)
      .select(by.map(col) ++ Seq(col("rule"), col("violations"),
        col("total"),
        round(lit(1.0) - col("violations").cast("double") /
          greatest(col("total").cast("double"), lit(1.0)), 6)
          .as("pass_fraction")): _*)
  }
}
