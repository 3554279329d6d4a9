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
