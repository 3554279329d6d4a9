package graft

import org.apache.spark.sql.functions._
import graft.functions.{CountMinAgg, CountMinSketch}

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic key stream: zipf-ish multiplicities over many
    * more distinct keys than sketch columns, so collisions actually occur.
    */
  private def stream: Seq[String] =
    (0 until 3000).flatMap(i => Seq.fill(1 + (3000 / (i + 1)) % 17)(s"key$i"))

  private def exact(keys: Seq[String]): Map[String, Long] =
    keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("estimates never undercount and stay within the eps*N bound") {
    val agg = new CountMinAgg(4, 256)
    val sk = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    val truth = exact(stream)
    val n = stream.size.toLong
    val epsN = math.ceil(math.E / 256 * n).toLong
    truth.foreach { case (k, c) =>
      val e = sk.estimate(k)
      assert(e >= c, s"undercount for $k: $e < $c")
      assert(e <= c + epsN, s"$k overcounted past eps*N: $e > $c + $epsN")
    }
  }

  test("merge of partial sketches is bit-identical to the single-pass sketch") {
    val agg = new CountMinAgg(4, 256)
    val whole = stream.foldLeft(agg.zero)(agg.reduce)
    val parts = stream.grouped(700).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = parts.reduce(agg.merge)
    assert(merged.sameElements(whole))
  }

  test("udaf through real shuffles equals the driver-side sequential fold") {
    val agg = new CountMinAgg(4, 256)
    val local = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    val cms = udaf(new CountMinAgg(4, 256))
    val row = stream.toDF("w").repartition(4)
      .agg(cms(col("w")).as("sk"))
      .select(col("sk.counts")).as[Array[Long]].head()
    assert(row.sameElements(local.counts))
  }

  test("zip_with merge of per-group sketches equals the one-pass sketch") {
    val cms = udaf(new CountMinAgg(4, 256))
    val df = stream.zipWithIndex
      .map { case (w, i) => (s"g${i % 5}", w) }.toDF("g", "w")
      .repartition(4)
    val whole = df.agg(cms(col("w")).as("sk"))
      .select(col("sk.counts")).as[Array[Long]].head()
    val merged = df.groupBy("g").agg(cms(col("w")).as("sk"))
      .agg(aggregate(collect_list(col("sk.counts")),
        array_repeat(lit(0L), 4 * 256),
        (acc, x) => zip_with(acc, x, (a, b) => a + b)).as("counts"))
      .as[Array[Long]].head()
    assert(merged.sameElements(whole))
  }

  test("estimate is exact when the key set is far smaller than the width") {
    val keys = (0 until 30).flatMap(i => Seq.fill(i + 1)(s"word$i"))
    val agg = new CountMinAgg(4, 1024)
    val sk = agg.finish(keys.foldLeft(agg.zero)(agg.reduce))
    exact(keys).foreach { case (k, c) => assert(sk.estimate(k) == c) }
    assert(sk.estimate("absent-key") == 0L)
  }

  test("buckets are deterministic and spread across rows") {
    assert(CountMinAgg.bucket("alpha", 0, 1024) ==
      CountMinAgg.bucket("alpha", 0, 1024))
    // the four row-hashes of one key should not all collide to one column
    val cols = (0 until 4).map(r => CountMinAgg.bucket("alpha", r, 1024))
    assert(cols.distinct.size > 1)
    val sk = CountMinSketch(4, 1024, new Array[Long](4096))
    assert(sk.estimate("anything") == 0L)
  }
}
