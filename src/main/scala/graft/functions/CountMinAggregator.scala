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
  * Hashing: double hashing over the key's MD5 — row `d`'s cell is
  * `(h1 + d·h2) mod width` where `h1`/`h2` are the digest's first two
  * big-endian 32-bit words (the x48 Bloom idiom). MD5 is an engine-
  * neutral function, so the SAME cells are expressible in ANSI SQL
  * (`CAST(concat('0x', substr(md5(key), 1, 8)) AS BIGINT)` …) and the
  * sketch is reproducible bit-for-bit cross-engine — estimates hash-gate
  * against the DuckDB oracle INCLUDING collisions, where the previous
  * JVM-MurmurHash cells were engine-private (kept x23 rows-only).
  * One digest per update, cells for all `depth` rows derived from it.
  */
case class CountMinAggregator(depth: Int, width: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {

  require(depth > 0 && width > 0, "count-min needs positive depth and width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    val (h1, h2) = CountMinAggregator.hashes(key)
    var d = 0
    while (d < depth) {
      buf(d * width + CountMinAggregator.cell(h1, h2, d, width)) += 1L
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

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `(h1, h2)` = the first two big-endian unsigned 32-bit words of
    * MD5(key) — exactly `CAST(concat('0x', substr(md5(key), 1, 8)) AS
    * BIGINT)` / `… substr(…, 9, 8) …` in the SQL oracle.
    */
  def hashes(key: String): (Long, Long) = {
    val dg = md5.get()
    dg.reset()
    val b = dg.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def be32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    (be32(0), be32(4))
  }

  /** The cell index of a hashed key in sketch row `d` (double hashing;
    * h1, h2 < 2^32 and d ≤ depth keep `h1 + d·h2` far inside Long).
    */
  def cell(h1: Long, h2: Long, d: Int, width: Int): Int =
    ((h1 + d * h2) % width).toInt

  /** Point estimate of `key`'s count from a finished sketch. */
  def estimate(sketch: Array[Long], key: String, depth: Int, width: Int): Long = {
    val (h1, h2) = hashes(key)
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + cell(h1, h2, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }
}
