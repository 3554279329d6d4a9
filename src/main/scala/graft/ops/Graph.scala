package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the link-analysis tier a web-scale
  * curation pipeline runs to score crawl domains by connectivity (the
  * quality prior used alongside text-level scores; cf. Common Crawl
  * harmonic-centrality ranking). The reference pipeline has no graph
  * operators; this extends the engine the same way the dedup/ANN tier
  * does, re-using the iterate-with-lineage-cuts shape of
  * [[graft.llm.Curation.connectedComponents]].
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic: ranks are scaled by
  * 1e12 and every step is int64 add / multiply / floor-divide. Floating
  * point would make the result depend on per-partition summation order;
  * integer sums are associative, so the result is bit-identical across
  * partitionings, runs, and engines — which is what makes a DuckDB oracle
  * (chained CTEs, `//` floor division) able to hash-match it exactly.
  */
object Graph {

  /** Rank scale: 1.0 of probability mass = 1e12. Headroom: intermediate
    * products reach 85 * 1e12 < 2^63.
    */
  val Scale = 1000000000000L

  /** Undirected customer↔supplier graph from co-occurrence in orders:
    * edge (c, s) iff customer c placed an order containing a lineitem
    * supplied by s. Node ids are namespaced into one key space
    * (customer = 2k, supplier = 2k+1) so the bipartite graph lives in a
    * single column pair — the join is orders⋈lineitem on the order key
    * (both sides shuffle on it; at scale both tables would be bucketed by
    * order key making this co-located), then DISTINCT to collapse repeat
    * business to one edge.
    */
  def custSuppEdges(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey").cast("bigint") * 2L).as("src"),
        (col("l_suppkey").cast("bigint") * 2L + 1L).as("dst"))
      .distinct()

  /** Fixed-iteration PageRank (damping 0.85) over an undirected edge list.
    *
    * Per iteration, each node's next rank is
    * `(15·Scale) div (100·N)  +  (85 · Σ_{u→v} (rank_u div outdeg_u)) div 100`
    * — the classic update with every division a floor-divide. Mass lost to
    * flooring is O(E) rank units per round (≤ micro-units at Scale=1e12),
    * a deterministic bias identical in both engines.
    *
    * Scale shape: the edge list is joined once per iteration against the
    * rank table (shuffle on src), re-aggregated on dst — the same two
    * shuffles a SQL engine pays per CTE stage. The edge list is persisted
    * (read `iterations` times); each round's rank table is one row per
    * node and localCheckpoint'ed so the plan does not grow with the
    * iteration count (reliable checkpoints on a real cluster). Undirected
    * means no dangling nodes: every node has in- and out-edges, so no
    * dangling-mass redistribution pass is needed.
    *
    * @param edges (src, dst) pairs, interpreted undirected; must not
    *              contain both orientations of the same pair (bipartite
    *              namespaced inputs like [[custSuppEdges]] guarantee this)
    * @return (id, rank) — rank in Scale units, int64
    */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               localThreshold: Long = 2000000L): DataFrame = {
    // Size dispatch (the connectedComponents pattern): integer arithmetic
    // is order-independent, so the driver-local recurrence is bit-identical
    // to the distributed one — below the threshold, skip the per-iteration
    // join/aggregate/checkpoint fixed cost entirely. GraphSpec pins both
    // paths to the same output.
    // Only the ONE-orientation list persists above the dispatch (r10): it
    // serves two actions either way (the dispatch count + the local
    // collect, or the count + the distributed union fill), so the
    // across-actions persist rule applies. The r9 shape additionally
    // persisted the two-orientation union BEFORE the dispatch — on the
    // local path that second fill (2E rows) plus the doubled-width collect
    // were pure materialization barriers ahead of a driver collect (driver
    // host measured g01 1.42 → 2.32 s); an un-persisted variant (count +
    // collect re-deriving the edge join twice) measured slower still
    // (1.78 → 1.95 s subset A/B). The union persist moves BELOW the
    // dispatch, where only the distributed path — whose per-iteration
    // joins re-read it — pays its fill.
    val edg = Caches.track(
      edges.select(col("src"), col("dst")).persist())
    if (edg.count() <= localThreshold) return pageRankLocal(edg, iterations)
    val und = Caches.track(
      edg.union(edg.select(col("dst").as("src"), col("src").as("dst")))
        .persist())
    val deg = und.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // One bounded scalar to the driver: the node count feeds the literal
    // teleport term (matches the oracle's count(*) over the degree CTE).
    val n = deg.count()
    require(n > 0, "pageRank: empty graph")
    val base = 15L * Scale / (100L * n) // Scala Long division = floor (>0)
    // src, dst, outdeg(src) — materialized once, read every iteration.
    val undDeg = Caches.track(und.join(deg, "src").persist())
    var ranks = deg.select(col("src").as("id"))
      .withColumn("rank", lit(Scale / n)).localCheckpoint()
    for (_ <- 1 to iterations) {
      ranks = undDeg.join(ranks, undDeg("src") === ranks("id"))
        .groupBy(undDeg("dst").as("id"))
        .agg((lit(base) +
          expr("85 * sum(rank div outdeg) div 100")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Small-graph path of [[pageRank]]: the identical integer recurrence on
    * the driver (every step int64 floor-divide/add, so summation order is
    * irrelevant and the result matches the distributed path bit-for-bit).
    * Takes the ONE-orientation edge list and doubles it driver-side (each
    * collected row contributes both directed edges) — half the collect
    * bytes of shipping the two-orientation union, and no union branch ever
    * evaluates the upstream derivation a second time.
    */
  private def pageRankLocal(edg: DataFrame, iterations: Int): DataFrame = {
    val spark = edg.sparkSession
    import spark.implicits._
    val rows = edg.select(col("src"), col("dst")).collect()
    // dense re-index so the iteration runs over primitive arrays (boxed
    // Long->Long maps measured ~5x slower on a 1M-edge graph). Discovery
    // order (src then dst per row) matches the old und collect, whose
    // swapped branch introduced no new ids — but the output is an
    // unordered (id, rank) set either way.
    val index = scala.collection.mutable.LongMap.empty[Int]
    val srcIdx = new Array[Int](rows.length)
    val dstIdx = new Array[Int](rows.length)
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    def idx(v: Long): Int =
      index.getOrElseUpdate(v, { val i = ids.length; ids += v; i })
    var e = 0
    while (e < rows.length) {
      srcIdx(e) = idx(rows(e).getLong(0))
      dstIdx(e) = idx(rows(e).getLong(1))
      e += 1
    }
    val n = ids.length.toLong
    require(n > 0, "pageRank: empty graph")
    // each undirected edge is two directed edges: degree and rank flow
    // accumulate in both directions, identical to iterating the union
    val deg = new Array[Long](ids.length)
    e = 0
    while (e < rows.length) {
      deg(srcIdx(e)) += 1L; deg(dstIdx(e)) += 1L
      e += 1
    }
    val base = 15L * Scale / (100L * n)
    var ranks = Array.fill(ids.length)(Scale / n)
    for (_ <- 1 to iterations) {
      val sums = new Array[Long](ids.length)
      e = 0
      while (e < rows.length) {
        sums(dstIdx(e)) += ranks(srcIdx(e)) / deg(srcIdx(e))
        sums(srcIdx(e)) += ranks(dstIdx(e)) / deg(dstIdx(e))
        e += 1
      }
      ranks = sums.map(s => base + 85L * s / 100L)
    }
    val out = ids.indices.map(i => (ids(i), ranks(i)))
    spark.sparkContext
      .parallelize(out, math.max(1, out.size / 500000 + 1))
      .toDF("id", "rank")
  }

  /** DuckDB oracle for [[pageRank]] over [[custSuppEdges]]: the identical
    * integer recurrence as chained CTEs (`//` = floor division in DuckDB;
    * all values positive, so it agrees with Spark's `div`).
    */
  def pageRankOracleCtes(iterations: Int): String = {
    val rounds = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT u.dst AS id,
         |         CAST((15 * ${Scale}) // (100 * n.n)
         |              + 85 * sum(r.rank // u.outdeg) // 100 AS BIGINT) AS rank
         |  FROM und u JOIN r${i - 1} r ON u.src = r.id CROSS JOIN n
         |  GROUP BY u.dst, n.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
       |                  CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |ud AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM ud GROUP BY 1),
       |und AS (SELECT ud.src, ud.dst, deg.outdeg FROM ud JOIN deg USING (src)),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
       |r0 AS (SELECT src AS id, CAST(${Scale} // n.n AS BIGINT) AS rank
       |       FROM deg CROSS JOIN n),
       |$rounds""".stripMargin
  }

  /** Triangle enumeration by degree-ordered orientation (compact-forward):
    * orient every undirected edge toward the higher (degree, id) endpoint,
    * join wedges at the lowest-ordered vertex, close against either
    * orientation of the third edge. Each triangle is emitted exactly once
    * (only its π-minimum vertex has two out-edges into it); the wedge
    * fan-out is bounded by the SMALLER endpoint degree per edge — the
    * O(Σ_e d_min(e)) bound that survives skewed degree distributions,
    * instead of the naive O(Σ_v d(v)²). The oriented edge set is persisted
    * (Caches-tracked) across its three consumers.
    *
    * @param pairs undirected edges as `(u, v)` bigint columns with u < v,
    *              no duplicates
    * @return one row per triangle, vertices sorted ascending as (x, y, z)
    */
  def triangles(pairs: DataFrame): DataFrame = {
    // NOT persisted (r9): pairs feeds three subtrees (both degree union
    // branches + the orientation join), but an A/B measurement at sf0.1
    // showed the persist SLOWER (3.0 s -> 3.4 s for g03) — the cache
    // materialization barrier costs more than the recomputes it saves on
    // a cached-scan upstream. Callers with a genuinely expensive pair
    // generator should persist before calling.
    val pr = pairs
    val deg = pr.select(col("u").as("n"))
      .unionAll(pr.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val e = pr
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"))
    val eo = Caches.track(e.persist())
    // wedge endpoints are emitted id-ordered (b < c), so the closing-edge
    // probe joins on the UNORDERED pair key (least, greatest) — a pure
    // equi-join (hash join), never a nested-loop OR of orientations
    val wedges = eo.as("e1").join(eo.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val closing = eo.select(least(col("src"), col("dst")).as("b"),
      greatest(col("src"), col("dst")).as("c"))
    wedges.join(closing, Seq("b", "c"))
      .select(sort_array(array(col("a"), col("b"), col("c"))).as("t"))
      .select(col("t").getItem(0).as("x"), col("t").getItem(1).as("y"),
        col("t").getItem(2).as("z"))
  }

  /** Multi-source BFS hop distances, bounded to `maxHops` — the
    * reachability primitive (seed-set expansion over a link graph, the
    * crawl-frontier / influence-radius shape). Level-synchronous: each
    * round joins ONLY the current frontier (nodes first reached last
    * round) against the edge list, drops already-settled nodes with an
    * anti-join, and unions the new level in. The frontier join keys on
    * src, the settled table is localCheckpoint'ed per round so the plan
    * stays constant-size in hops (reliable checkpoints on a real cluster),
    * and each round is two co-keyed shuffles — never a whole-graph
    * re-walk. Equivalent to min-dist over all ≤maxHops walks, which is
    * what the recursive-CTE oracle computes.
    *
    * @param edges (src, dst) pairs, interpreted undirected (both
    *              orientations are generated internally)
    * @param seeds single-column `id` frame, distance-0 nodes
    * @return (id, dist) for every node within maxHops of a seed
    */
  def shortestPaths(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                    localThreshold: Long = 2000000L): DataFrame = {
    // one-orientation list persists first — see pageRank (it serves the
    // dispatch count plus either the local collect or the union fill)
    val edg = Caches.track(
      edges.select(col("src"), col("dst")).persist())
    // Size dispatch (r10, the pageRank/CC pattern): BFS min-dist over
    // integer hops is order-free, so the driver-local level walk is
    // result-identical to the distributed loop — and below the threshold
    // the loop is maxHops × (join + distinct + anti-join + union +
    // 2 localCheckpoints) of fixed job cost over near-empty shuffles.
    // GraphSpec pins both paths to the same output; the g04 oracle
    // replays the recursive CTE.
    if (edg.count() <= localThreshold)
      return shortestPathsLocal(edg, seeds, maxHops)
    val und = Caches.track(
      edg.union(edg.select(col("dst").as("src"), col("src").as("dst")))
        .persist())
    var settled = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint()
    var frontier = settled
    var hop = 1
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(und, frontier("id") === und("src"))
        .select(und("dst").as("id")).distinct()
        .join(settled, Seq("id"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint()
      settled = settled.union(next).localCheckpoint()
      frontier = next
      hop += 1
    }
    settled
  }

  /** Small-graph path of [[shortestPaths]]: collect the one-orientation
    * edge list, walk BFS levels over CSR adjacency on the driver. Hop
    * distances are unique integers (min over walks), so the settled set
    * is identical to the distributed loop's — including seeds that touch
    * no edge, which settle at distance 0 in both paths.
    */
  private def shortestPathsLocal(edg: DataFrame, seeds: DataFrame,
                                 maxHops: Int): DataFrame = {
    val spark = edg.sparkSession
    val rows = edg.collect()
    val index = scala.collection.mutable.LongMap.empty[Int]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    def idx(v: Long): Int =
      index.getOrElseUpdate(v, { val i = ids.length; ids += v; i })
    val srcIdx = new Array[Int](rows.length)
    val dstIdx = new Array[Int](rows.length)
    var e = 0
    while (e < rows.length) {
      srcIdx(e) = idx(rows(e).getLong(0))
      dstIdx(e) = idx(rows(e).getLong(1))
      e += 1
    }
    val n = ids.length
    // CSR over both orientations
    val deg = new Array[Int](n)
    e = 0
    while (e < rows.length) { deg(srcIdx(e)) += 1; deg(dstIdx(e)) += 1; e += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val adj = new Array[Int](2 * rows.length)
    val fill = java.util.Arrays.copyOf(off, n)
    e = 0
    while (e < rows.length) {
      adj(fill(srcIdx(e))) = dstIdx(e); fill(srcIdx(e)) += 1
      adj(fill(dstIdx(e))) = srcIdx(e); fill(dstIdx(e)) += 1
      e += 1
    }
    val seedIds = seeds.select(col("id")).distinct().collect().map(_.getLong(0))
    val dist = new Array[Int](n)
    java.util.Arrays.fill(dist, Int.MaxValue)
    var frontier = scala.collection.mutable.ArrayBuffer.empty[Int]
    // seeds settle at 0 whether or not they touch an edge; only in-graph
    // seeds can expand
    seedIds.foreach { s =>
      index.get(s).foreach { si => dist(si) = 0; frontier += si }
    }
    var hop = 1
    while (hop <= maxHops && frontier.nonEmpty) {
      val next = scala.collection.mutable.ArrayBuffer.empty[Int]
      frontier.foreach { u =>
        var k = off(u)
        while (k < off(u + 1)) {
          val v = adj(k)
          if (dist(v) == Int.MaxValue) { dist(v) = hop; next += v }
          k += 1
        }
      }
      frontier = next
      hop += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val seen = scala.collection.mutable.LongMap.empty[Boolean]
    i = 0
    while (i < n) {
      if (dist(i) != Int.MaxValue) {
        out += org.apache.spark.sql.Row(ids(i), dist(i))
        seen(ids(i)) = true
      }
      i += 1
    }
    seedIds.foreach { s =>
      if (!seen.contains(s)) out += org.apache.spark.sql.Row(s, 0)
    }
    // schema mirrors the distributed union (nullable seed/edge ids, the
    // non-null literal hop column)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("dist",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(out.toArray: _*), schema)
  }
}
