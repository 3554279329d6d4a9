package graft

import graft.ops.QuantileNorm

class QuantileNormSpec extends SparkSpec {
  import spark.implicits._

  test("dense equal-count input with bins = n reproduces classic quantile normalization") {
    // two samples, 4 rows each; with bins = 4 every rank gets its own bin,
    // so the binned map IS preprocessCore normalize.quantiles: rank-r
    // values are replaced by the cross-sample rank-r mean.
    val long = Seq(
      ("k1", "A", 2.0), ("k2", "A", 4.0), ("k3", "A", 6.0), ("k4", "A", 8.0),
      ("k1", "B", 7.0), ("k2", "B", 1.0), ("k3", "B", 5.0), ("k4", "B", 3.0)
    ).toDF("key", "sample", "v")
    val got = QuantileNorm.normalizeBinned(long, "key", "sample", "v", bins = 4)
      .select("sample", "v", "qn_value").as[(String, Double, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    // rank means: (1.5, 3.5, 5.5, 7.5)
    val expect = Map(
      ("A", 2.0) -> 1.5, ("A", 4.0) -> 3.5, ("A", 6.0) -> 5.5, ("A", 8.0) -> 7.5,
      ("B", 1.0) -> 1.5, ("B", 3.0) -> 3.5, ("B", 5.0) -> 5.5, ("B", 7.0) -> 7.5)
    assert(got == expect)
  }

  test("ragged input: qn_value is monotone in sample rank and shared across samples per bin") {
    val long = Seq(
      ("k1", "A", 10.0), ("k2", "A", 20.0), ("k3", "A", 30.0),
      ("k4", "A", 40.0), ("k5", "A", 50.0),
      ("k1", "B", 5.0), ("k3", "B", 15.0), ("k5", "B", 25.0)
    ).toDF("key", "sample", "v")
    val rows = QuantileNorm.normalizeBinned(long, "key", "sample", "v", bins = 4)
      .select("sample", "v", "p", "qn_value")
      .as[(String, Double, Double, Double)].collect()
    // monotone within each sample: sorting by raw value sorts qn_value
    rows.groupBy(_._1).values.foreach { s =>
      val byV = s.sortBy(_._2).map(_._4)
      assert(byV.zip(byV.tail).forall { case (a, b) => a <= b }, byV.toSeq)
    }
    // same bin (same floor(4p) capped) ⇒ same reference value, across samples
    val byBin = rows.groupBy(t => math.min(math.floor(t._3 * 4), 3).toInt)
    byBin.values.foreach(g => assert(g.map(_._4).distinct.length == 1, g.toSeq))
    // the reference value of a bin is the mean of its members' raw values
    byBin.foreach { case (_, g) =>
      val mean = g.map(_._2).sum / g.length
      assert(math.abs(g.head._4 - mean) < 1e-12, s"${g.toSeq} mean=$mean")
    }
  }

  test("exact-rational path (denom) matches the avg path on k/997 data") {
    val long = (0 until 200).map { i =>
      (f"k$i%03d", s"S${i % 4}", ((i * 37) % 997).toDouble / 997.0)
    }.toDF("key", "sample", "v")
    val a = QuantileNorm.normalizeBinned(long, "key", "sample", "v", 10, denom = 997)
      .select("key", "sample", "qn_value").as[(String, String, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val b = QuantileNorm.normalizeBinned(long, "key", "sample", "v", 10)
      .select("key", "sample", "qn_value").as[(String, String, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"$k: $v vs ${b(k)}") }
  }
}
