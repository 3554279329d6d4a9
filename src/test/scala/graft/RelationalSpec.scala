package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // one hot key carrying 90% of rows
    val large = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).map(k => (k, k.length))
      .toDF("key", "len")
    val plain = large.join(small, "key")
      .agg(count(lit(1)), sum("v"), sum("len")).head()
    val salted = Relational.saltedJoin(large, small, "key", salts = 8)
      .agg(count(lit(1)), sum("v"), sum("len")).head()
    assert(plain == salted)
  }

  test("outerMergeByKey keeps the union of keys with nulls where absent") {
    val a = Seq(("p1", 1.0), ("p2", 2.0)).toDF("probe_id", "a")
    val b = Seq(("p2", 20.0), ("p3", 30.0)).toDF("probe_id", "b")
    val m = Relational.outerMergeByKey("probe_id", Seq(a, b))
      .orderBy("probe_id").collect()
    assert(m.map(_.getString(0)).toSeq == Seq("p1", "p2", "p3"))
    assert(m(0).isNullAt(2) && m(2).isNullAt(1))
    assert(m(1).getDouble(1) == 2.0 && m(1).getDouble(2) == 20.0)
  }

  test("lookupRename maps matched keys and keeps unmatched ones") {
    val df = Seq(("s1", 1), ("s2", 2)).toDF("sample_id", "v")
    val mapping = Seq(("s1", "renamed")).toDF("old_id", "new_id")
    val out = Relational.lookupRename(df, mapping, "sample_id", "old_id", "new_id")
      .orderBy("v").select("sample_id").as[String].collect()
    assert(out.toSeq == Seq("renamed", "s2"))
  }

  test("dedupFirst is deterministic under the explicit order") {
    val df = Seq(("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b")).toDF("key", "ord", "tag")
    val kept = Relational.dedupFirst(df, Seq("key"), Seq(col("ord").asc))
      .select("tag").as[String].collect()
    assert(kept.toSeq == Seq("a"))
  }
}
