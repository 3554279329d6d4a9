package graft

/** DuckDB-SQL mirrors of the [[Tables]] synthetic views, shared by every
  * oracle query in SparkEntry.oracleSql. The CTE text must stay in exact
  * semantic lockstep with Tables.scala — both derive the long-form
  * methylation tables from lineitem/supplier/part with pure integer
  * arithmetic so Spark and DuckDB agree bit-for-bit.
  */
object SqlOracles {

  /** WITH-clause defining beta / detp / sheet / manifest / anno.
    * Prepend to any oracle query that touches the methylation views.
    * DuckDB prunes unused CTEs, so including all five is free.
    */
  val ctes: String =
    """WITH beta AS (
      |  SELECT probe_id, sample_id, min(beta_raw) AS beta FROM (
      |    SELECT printf('cg%07d', l_partkey) AS probe_id,
      |           printf('S%03d', l_suppkey) AS sample_id,
      |           CAST((CAST(round(l_extendedprice * 100) AS BIGINT) + l_linenumber) % 997 AS DOUBLE) / 997.0 AS beta_raw
      |    FROM lineitem)
      |  GROUP BY 1, 2),
      |detp AS (
      |  SELECT probe_id, sample_id, min(pval_raw) AS pval FROM (
      |    SELECT printf('cg%07d', l_partkey) AS probe_id,
      |           printf('S%03d', l_suppkey) AS sample_id,
      |           CAST((l_orderkey * 7 + l_linenumber) % 101 AS DOUBLE) / 1010.0 AS pval_raw
      |    FROM lineitem)
      |  GROUP BY 1, 2),
      |sheet AS (
      |  SELECT printf('S%03d', s_suppkey) AS sample_id,
      |         'run_' || CAST(s_suppkey % 3 AS VARCHAR) AS run,
      |         CASE WHEN s_suppkey % 2 = 0 THEN 'WT' ELSE 'MUT' END AS "group"
      |  FROM supplier),
      |manifest AS (
      |  SELECT printf('cg%07d', p_partkey) AS probe_id,
      |         CASE WHEN p_partkey % 2 = 0 THEN 1 ELSE 2 END AS design_type
      |  FROM part),
      |anno AS (
      |  SELECT printf('cg%07d', p_partkey) AS probe_id,
      |         CASE WHEN p_partkey % 23 = 21 THEN 'chrX'
      |              WHEN p_partkey % 23 = 22 THEN 'chrY'
      |              ELSE 'chr' || CAST(p_partkey % 23 + 1 AS VARCHAR) END AS chr
      |  FROM part)
      |""".stripMargin

  /** SQL mirror of [[graft.functions.Fns.varFromMoments]] — identical double
    * op sequence over exact integer aggregates.
    */
  def varFromMoments(n: String, s: String, ss: String): String =
    s"(CAST($ss AS DOUBLE) - CAST($s AS DOUBLE) * CAST($s AS DOUBLE) / CAST($n AS DOUBLE)) / CAST($n - 1 AS DOUBLE)"

  /** SQL mirror of Fns.mValueClamped. */
  def mValueClamped(b: String): String = {
    val c = s"least(greatest($b, 0.001), 0.999)"
    s"log2($c / (1.0 - $c))"
  }
}
