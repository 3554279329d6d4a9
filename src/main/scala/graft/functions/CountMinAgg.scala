package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

/** A materialized count-min sketch (Cormode & Muthukrishnan, J. Algorithms
  * 2005): `counts` is a row-major depth×width grid; a key's estimate is the
  * min over its one bucket per row. Estimates never undercount, and
  * overcount by at most εN (ε = e/width) with probability 1 − (1/2)^depth.
  * When the live key set is far smaller than `width` (a fixed watchlist,
  * a bounded vocabulary) the min is collision-free and the estimate is the
  * exact count.
  */
final case class CountMinSketch(depth: Int, width: Int, counts: Array[Long]) {
  def estimate(key: String): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(r * width + CountMinAgg.bucket(key, r, width))
      if (c < m) m = c
      r += 1
    }
    m
  }
}

object CountMinAgg {
  /** Deterministic per-row bucket: seeded murmur3 of the key, floor-mod
    * into [0, width). Fixed seeds — the same key always lands in the same
    * buckets, across partitions, sessions, and reruns.
    */
  def bucket(key: String, row: Int, width: Int): Int =
    math.floorMod(MurmurHash3.stringHash(key, 0x9747b28c + row * 104729), width)
}

/** Count-min sketch as a mergeable typed Aggregator (SURVEY.md §7.1's
  * custom-Aggregator surface, the "novel sketch" tier next to the built-in
  * HLL++/bloom sketches of a12/b02): frequency estimates over an unbounded
  * key domain in ONE pass with fixed depth×width state. The buffer merge is
  * element-wise addition — partial sketches combine map-side, so a corpus
  * scan shuffles depth×width longs per partition instead of one row per
  * distinct key. That is the 100 TB shape for "how often do these terms
  * appear": the alternative exact groupBy shuffles the full token stream.
  */
class CountMinAgg(depth: Int = 4, width: Int = 1024)
    extends Aggregator[String, Array[Long], CountMinSketch] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], key: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      b(r * width + CountMinAgg.bucket(key, r, width)) += 1L
      r += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): CountMinSketch =
    CountMinSketch(depth, width, r)

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[CountMinSketch] =
    Encoders.product[CountMinSketch]
}
