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
      // NOT persisted (r9 A/B): the self-join's two identical subtrees
      // share one shuffle via ReuseExchange, so a persist only adds a
      // materialization barrier (measured 2.5 s -> 2.7 s)
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
        |ORDER BY 3 DESC, 1, 2 LIMIT 20""".stripMargin)),

    // Triangle counting over the co-order part graph (parts that appear in
    // the same order ≥ 2 times form an edge): the classic cohesion metric
    // of near-dup/community structure. The Spark plan uses the
    // degree-ordered orientation (each edge directed toward the higher
    // (degree, id) endpoint) so every wedge join fans out by the SMALLER
    // degree — the compact-forward bound O(Σ d_min(e)) that survives skewed
    // degree distributions at 100 TB, instead of the naive O(Σ d(v)²). The
    // oracle counts the same triangles with the a<b<c triple join (the
    // orientation changes the join order, never the triangle set). Output:
    // per-part triangle participation, top 20.
    Q("g03_triangle_count", (s, d) => {
      val li = Tables.table(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").cast("bigint").as("p"))
        .distinct()
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2).select("u", "v")
      val tri = Graph.triangles(pairs)
        .select(explode(array(col("x"), col("y"), col("z"))).as("part"))
      tri.groupBy("part").agg(count(lit(1)).as("triangles"))
        .orderBy(col("triangles").desc, col("part").asc)
        .limit(20)
        .select(col("part").as("l_partkey"), col("triangles"))
    }, Some(
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS p
        |  FROM lineitem),
        |e AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (
        |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |       JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |parts AS (
        |  SELECT x AS part FROM tri UNION ALL
        |  SELECT y FROM tri UNION ALL
        |  SELECT z FROM tri)
        |SELECT part AS l_partkey, CAST(count(*) AS BIGINT) AS triangles
        |FROM parts GROUP BY 1
        |ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin)),

    // BFS hop distances from a seed set (customers of nation 0) over the
    // customer↔supplier order graph, bounded to 4 hops — the reachability
    // radius / crawl-frontier primitive. Level-synchronous frontier joins
    // (see ops/Graph.shortestPaths scaladoc); the oracle states the same
    // semantics declaratively as a bounded recursive CTE with min(dist)
    // — BFS distance ≡ min over ≤4-hop walks.
    Q("g04_shortest_paths", (s, d) => {
      val seeds = Tables.table(s, d, "customer")
        .filter(col("c_nationkey") === 0)
        .select((col("c_custkey").cast("bigint") * 2L).as("id"))
      val dist = Graph.shortestPaths(
        Graph.custSuppEdges(Tables.table(s, d, "orders"),
          Tables.table(s, d, "lineitem")), seeds, maxHops = 4)
      dist.select(
          when(col("id") % 2L === 0L, "customer").otherwise("supplier")
            .as("node_type"),
          when(col("id") % 2L === 0L, col("id") / lit(2L))
            .otherwise((col("id") - 1L) / lit(2L)).cast("bigint").as("node_key"),
          col("dist"))
        .orderBy("node_type", "node_key")
    }, Some(
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
        |                  CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        |walk(id, dist) AS (
        |  SELECT CAST(c_custkey AS BIGINT) * 2, 0
        |  FROM customer WHERE c_nationkey = 0
        |  UNION
        |  SELECT u.dst, w.dist + 1
        |  FROM walk w JOIN und u ON w.id = u.src WHERE w.dist < 4),
        |d AS (SELECT id, min(dist) AS dist FROM walk GROUP BY 1)
        |SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
        |       CAST(CASE WHEN id % 2 = 0 THEN id // 2 ELSE (id - 1) // 2 END AS BIGINT)
        |         AS node_key,
        |       CAST(dist AS INT) AS dist
        |FROM d ORDER BY node_type, node_key""".stripMargin))
  )
}
