package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch as a typed `Aggregator`: a depth×width array of
  * counters, each row a different hash of the key; the estimate of a
  * key's frequency is the MIN over its `depth` cells — always an
  * OVERestimate (one-sided error ≤ εN with ε ≈ e/width at the usual
  * depth ≈ ln(1/δ)).
  *
  * This is the 100 TB path for x19-style heavy hitters: the buffer is
  * FIXED-SIZE and merges by elementwise addition, so partial sketches
  * combine map-side and exactly one `depth×width` array per partition
  * crosses the shuffle — versus the exact aggregate shuffling one row
  * per distinct n-gram. The exact query (x19) doubles as this sketch's
  * accuracy oracle; the estimation error is spec-bounded, mirroring the
  * HLL tier (x16).
  *
  * Hashing: MurmurHash3 with the row index as seed — deterministic on
  * any JVM, no allocation per update beyond the hash call.
  */
case class CountMinAggregator(depth: Int, width: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {

  require(depth > 0 && width > 0, "count-min needs positive depth and width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    var d = 0
    while (d < depth) {
      buf(d * width + CountMinAggregator.cell(key, d, width)) += 1L
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAggregator {

  /** The cell index of `key` in sketch row `d` (row index = hash seed). */
  def cell(key: String, d: Int, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(key, d)
    math.floorMod(h, width)
  }

  /** Point estimate of `key`'s count from a finished sketch. */
  def estimate(sketch: Array[Long], key: String, depth: Int, width: Int): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + cell(key, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }
}
