package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Graph-analytics queries over the order graph (customer↔supplier
  * co-occurrence): fixed-point-integer PageRank and the bipartite
  * projection (supplier pairs by shared customers). Link analysis is the
  * connectivity-quality prior of web-crawl curation; here it runs on the
  * testdata's natural bipartite graph.
  */
object QueriesGraph {

  private val Iters = 5

  def all: Seq[Q] = Seq(

    // PageRank, 5 iterations, damping 0.85, int64 fixed point (Scale=1e12):
    // bit-exact across engines because every step is integer add/mul/floor-
    // div (see ops/Graph scaladoc). Top-20 suppliers by rank.
    Q("g01_pagerank", (s, d) => {
      val ranks = Graph.pageRank(
        Graph.custSuppEdges(Tables.table(s, d, "orders"),
          Tables.table(s, d, "lineitem")), Iters)
      ranks.filter(col("id") % 2L === 1L)
        .select(((col("id") - 1L) / 2L).cast("bigint").as("s_suppkey"),
          col("rank"))
        .join(broadcast(Tables.table(s, d, "supplier")
          .select(col("s_suppkey").cast("bigint").as("s_suppkey"), col("s_name"))),
          "s_suppkey")
        .select("s_suppkey", "s_name", "rank")
        .orderBy(col("rank").desc, col("s_suppkey").asc)
        .limit(20)
    }, Some(
      s"""${Graph.pageRankOracleCtes(Iters)}
         |SELECT CAST((r.id - 1) // 2 AS BIGINT) AS s_suppkey, s.s_name, r.rank
         |FROM r$Iters r JOIN supplier s ON CAST((r.id - 1) // 2 AS BIGINT) = s.s_suppkey
         |WHERE r.id % 2 = 1
         |ORDER BY r.rank DESC, s_suppkey LIMIT 20""".stripMargin)),

    // Bipartite projection: supplier pairs ranked by shared customers —
    // the one-hop co-occurrence graph (co-purchase / co-citation shape).
    // Self-join of the edge list on the customer side; fan-out is bounded
    // by per-customer degree (suppliers-per-customer²), never corpus².
    Q("g02_copurchase_projection", (s, d) => {
      val e = Graph.custSuppEdges(Tables.table(s, d, "orders"),
          Tables.table(s, d, "lineitem"))
        .select((col("src") / 2L).cast("bigint").as("cust"),
          ((col("dst") - 1L) / 2L).cast("bigint").as("supp"))
      e.as("a").join(e.as("b"),
          col("a.cust") === col("b.cust") && col("a.supp") < col("b.supp"))
        .groupBy(col("a.supp").as("supp_a"), col("b.supp").as("supp_b"))
        .agg(count(lit(1)).as("shared_customers"))
        .orderBy(col("shared_customers").desc, col("supp_a").asc, col("supp_b").asc)
        .limit(20)
    }, Some(
      """WITH e AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS cust,
        |                  CAST(l_suppkey AS BIGINT) AS supp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT a.supp AS supp_a, b.supp AS supp_b,
        |       CAST(count(*) AS BIGINT) AS shared_customers
        |FROM e a JOIN e b ON a.cust = b.cust AND a.supp < b.supp
        |GROUP BY 1, 2
        |ORDER BY 3 DESC, 1, 2 LIMIT 20""".stripMargin))
  )
}
