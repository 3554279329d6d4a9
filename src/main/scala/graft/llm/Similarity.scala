package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id, embedding array<float>, label)`).
  *
  * Two tiers: brute-force cosine top-k (the correctness baseline — one
  * scan, no shuffle, TakeOrderedAndProject) and a sign-bit LSH-bucketed
  * variant (the scale path: the scan prunes to one bucket ≈ 1/2^bits of
  * the data before scoring; at 100 TB the bucket id becomes a partition
  * column so pruning happens at the file level).
  */
object Similarity {

  private def withVec(emb: DataFrame): DataFrame =
    emb.withColumn("v", col("embedding").cast("array<double>"))

  /** dot(v, q) and |v|² as codegen array expressions (zip_with/aggregate —
    * sequential fold, no UDF).
    */
  private def scored(e: DataFrame, qArr: Seq[Double]): DataFrame = {
    val qLit = typedLit(qArr)
    val qNorm = math.sqrt(qArr.map(x => x * x).sum)
    e.withColumn("dot",
        aggregate(zip_with(col("v"), qLit, (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .withColumn("nrm",
        aggregate(transform(col("v"), x => x * x), lit(0.0), (acc, x) => acc + x))
      .withColumn("cos", round(col("dot") / sqrt(col("nrm")) / lit(qNorm), 6))
  }

  private def queryVec(e: DataFrame, queryId: Long): Seq[Double] =
    e.filter(col("vec_id") === queryId).select("v").head().getSeq[Double](0)

  /** Brute-force cosine top-k against the embedding of `queryId`. */
  def cosineTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val e = withVec(emb)
    scored(e.filter(col("vec_id") =!= queryId), queryVec(e, queryId))
      .select("vec_id", "cos")
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Sign-bit bucket of the first `bits` dimensions (a 2^bits-cell LSH). */
  def signBucket(vecCol: String, bits: Int) =
    (1 to bits).map { i =>
      when(element_at(col(vecCol), i) >= 0, lit(1 << (bits - i))).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: score only vectors in the query's sign bucket. */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, bits: Int = 4): DataFrame = {
    val e = withVec(emb).withColumn("bucket", signBucket("v", bits))
    val q = queryVec(e, queryId)
    val qBucket = (1 to bits).map(i => if (q(i - 1) >= 0) 1 << (bits - i) else 0).sum
    scored(e.filter(col("vec_id") =!= queryId && col("bucket") === qBucket), q)
      .select("vec_id", "bucket", "cos")
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF-style ANN: a k-means coarse quantizer (Spark ML, fixed seed)
    * partitions the corpus into nlist cells; a query scores only the
    * nprobe cells whose centroids are closest to it. The 100 TB shape:
    * cell id becomes a partition column at ingest, so probing is file-level
    * partition pruning and each query touches nprobe/nlist of the data.
    */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int, nlist: Int = 16,
              nprobe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = graft.ops.Caches.track(
      withVec(emb).withColumn("fv", array_to_vector(col("v"))).persist())
    val model = new KMeans().setK(nlist).setSeed(42L)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(e)
    val assigned = model.transform(e)
    val q = queryVec(e, queryId)
    val centroids = model.clusterCenters.zipWithIndex
    val probeCells = centroids
      .map { case (c, i) =>
        val d = c.toArray.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nprobe).map(_._1).toSeq
    scored(assigned.filter(col("vec_id") =!= queryId &&
        col("cell").isin(probeCells: _*)), q)
      .select("vec_id", "cell", "cos")
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Product-quantization ANN (Jégou et al., TPAMI'11): vectors are
    * L2-normalized, split into `m` subspaces, and each subspace is vector-
    * quantized by its own small k-means codebook — a D-float vector
    * compresses to m small ints (m bytes at nbits=8). A query scores codes
    * by ADC (asymmetric distance computation): per subspace, the exact
    * distance from the query sub-vector to each centroid is precomputed
    * driver-side (m × codebookSize doubles), and a row's approximate
    * squared L2 distance is the sum of m table lookups. On unit vectors
    * ‖q−v‖² = 2−2·cos, so ascending ADC distance approximates descending
    * cosine — comparable against [[cosineTopK]].
    *
    * The 100 TB shape: codebooks are trained ONCE on a bounded sample and
    * shipped as literals (here: fit per call on the full input, which the
    * bench measures as training cost); the stored table keeps only
    * (vec_id, code) — a 32× scan-size reduction at D=64/m=4 — and the
    * whole shortlist scan is codegen'd int lookups + adds with a
    * TakeOrderedAndProject top-(k·rerank); only the shortlist's real
    * vectors are then read for an exact cosine re-rank (the standard
    * two-stage ADC + re-rank design). IVF (coarse cell = partition
    * pruning) composes with PQ (small codes) in a production IVFADC
    * index; both halves are here.
    */
  def pqTopK(emb: DataFrame, queryId: Long, k: Int, m: Int = 8,
             codebookSize: Int = 16, rerank: Int = 5): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = withVec(emb).select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val unit = withVec(emb).withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
      .withColumn("vn", transform(col("v"), x => x / col("nrm")))
    val subCols = (0 until m).map(i =>
      array_to_vector(slice(col("vn"), i * sub + 1, sub)).as(s"sub_$i"))
    val featured = graft.ops.Caches.track(
      unit.select((col("vec_id") +: subCols): _*).persist())
    // Codebooks train on a bounded deterministic sample (id-stride — no
    // seed, no shuffle): k-means needs ~O(100·k) points per subspace, and
    // at corpus scale fitting on everything would be pure waste. The
    // ENCODE pass below still covers every vector.
    val total = featured.count()
    val maxTrain = 200L * codebookSize
    val train =
      if (total <= maxTrain) featured
      else featured.filter(pmod(col("vec_id"), lit((total + maxTrain - 1) / maxTrain)) === 0)
    val models = (0 until m).map { i =>
      new KMeans().setK(codebookSize).setSeed(42L + i)
        .setFeaturesCol(s"sub_$i").setPredictionCol(s"c_$i").fit(train)
    }
    // (vec_id, c_0..c_{m-1}) — the PQ code table; all a query scan reads
    val codes = models.foldLeft(featured: DataFrame)((df, mod) => mod.transform(df))
      .select((col("vec_id") +: (0 until m).map(i => col(s"c_$i"))): _*)
    val q = unit.filter(col("vec_id") === queryId).select("vn").head().getSeq[Double](0)
    val dtabs = (0 until m).map { i =>
      val qs = q.slice(i * sub, (i + 1) * sub)
      models(i).clusterCenters.map { c =>
        c.toArray.zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum
      }.toSeq
    }
    val adist = (0 until m).map(i =>
      element_at(typedLit(dtabs(i)), col(s"c_$i") + 1)).reduce(_ + _)
    val shortlist = codes.filter(col("vec_id") =!= queryId)
      .withColumn("adist", round(adist, 6))
      .select("vec_id", "adist")
      .orderBy(col("adist").asc, col("vec_id").asc)
      .limit(k * rerank)
    // Exact re-rank of the ADC shortlist — the standard second stage: the
    // cheap code scan prunes the corpus to k·rerank ids, and only those
    // rows' real vectors are read (a semi-join; at scale a bucketed point
    // lookup). Quantization error then only costs recall when a true
    // neighbor misses the WHOLE shortlist.
    shortlist.join(unit.select(col("vec_id"), col("vn")), "vec_id")
      .withColumn("cos", // dot of unit vectors = cosine
        round(aggregate(zip_with(col("vn"), typedLit(q), (x, y) => x * y),
          lit(0.0), (a, x) => a + x), 6))
      .select("vec_id", "adist", "cos")
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Embedding-cosine near-dup pairs, blocked by label (or any coarse
    * bucket column) so the pair join is per-block, never global n².
    */
  def cosineNearDups(emb: DataFrame, blockCol: String, minCos: Double): DataFrame = {
    val e = withVec(emb)
      .withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (acc, x) => acc + x)))
      .select(col("vec_id"), col(blockCol).as("block"), col("v"), col("nrm"))
    e.as("x").join(e.as("y"), "block")
      .filter(col("x.vec_id") < col("y.vec_id"))
      .withColumn("dot",
        aggregate(zip_with(col("x.v"), col("y.v"), (a, b) => a * b), lit(0.0), (acc, x) => acc + x))
      .withColumn("cos", round(col("dot") / col("x.nrm") / col("y.nrm"), 6))
      .filter(col("cos") >= minCos)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("block"), col("cos"))
  }
}
