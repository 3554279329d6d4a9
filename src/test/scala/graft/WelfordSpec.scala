package graft

import org.apache.spark.sql.functions._
import graft.functions.WelfordAgg

class WelfordSpec extends SparkSpec {
  import spark.implicits._

  test("WelfordAgg matches var_samp/avg across a multi-partition group") {
    val data = (1 to 500).map(i => ("g" + (i % 3), math.sin(i * 0.7) * 10 + i % 7))
    val df = data.toDF("k", "x").repartition(4)
    val welford = udaf(new WelfordAgg)
    val got = df.groupBy("k")
      .agg(welford(col("x")).as("w"), avg("x").as("mu"), var_samp("x").as("v"))
      .collect()
    got.foreach { r =>
      val w = r.getStruct(1)
      assert(w.getLong(0) == data.count(_._1 == r.getString(0)))
      assert(math.abs(w.getDouble(1) - r.getDouble(2)) < 1e-9)
      assert(math.abs(w.getDouble(2) - r.getDouble(3)) < 1e-9)
    }
  }

  test("merge of disjoint buffers equals single-pass result") {
    val agg = new WelfordAgg
    val xs = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 32.0)
    val (left, right) = xs.splitAt(2)
    val merged = agg.merge(
      left.foldLeft(agg.zero)(agg.reduce),
      right.foldLeft(agg.zero)(agg.reduce))
    val single = xs.foldLeft(agg.zero)(agg.reduce)
    assert(math.abs(agg.finish(merged).variance - agg.finish(single).variance) < 1e-9)
  }
}
