package graft

import graft.sources.XorChunk
import org.scalatest.funsuite.AnyFunSuite

/** The Gorilla XOR chunk codec: hand-derived bytes for a regular
  * series, lossless round-trips across the double domain (NaN
  * staleness markers bit-exact), every delta-of-delta window boundary,
  * and the malformed-input guards.
  */
class XorChunkSpec extends AnyFunSuite {

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  /** Round-trip, comparing values by RAW BITS (NaN ≠ NaN as doubles). */
  private def rt(s: Seq[(Long, Double)]): Unit = {
    val back = XorChunk.decode(XorChunk.encode(s))
    assert(back.map { case (t, v) => (t, bits(v)) } ===
      s.toVector.map { case (t, v) => (t, bits(v)) })
  }

  test("hand-derived bytes: the regular constant series") {
    // (1000, 1.0), (2000, 1.0), (3000, 1.0):
    //   00 03                     sample count
    //   D0 0F                     t0 = zigzag(1000) = 2000 as uvarint
    //   3F F0 00 00 00 00 00 00   1.0 raw IEEE bits
    //   E8 07                     tDelta = 1000 as uvarint
    //   0                         xor(v1, v0) = 0
    //   0                         dod = 0
    //   0                         xor(v2, v1) = 0
    //   → three bits, zero-padded to one byte 00
    val got = XorChunk.encode(Seq((1000L, 1.0), (2000L, 1.0), (3000L, 1.0)))
    assert(got.map("%02X".format(_)).mkString ===
      "0003D00F3FF0000000000000E80700")
    assert(XorChunk.decode(got) ===
      Vector((1000L, 1.0), (2000L, 1.0), (3000L, 1.0)))
  }

  test("round-trips: singletons, counters, sines, special values") {
    rt(Seq((0L, 0.0)))
    rt(Seq((1704067200000L, 42.5)))
    rt(Seq((-5000L, -1.75), (0L, -1.75))) // negative first timestamp (zigzag)
    // a 500-sample regular counter (the dod = 0 fast path end to end)
    rt((0 until 500).map(i => (1704067200000L + i * 15000L, i * 0.25)))
    // growing gaps (every dod window) + full-precision doubles
    rt((0 until 257).map(i => (i.toLong * i * 7919L, math.sin(i * 0.1) * 1e9)))
    // specials round-trip bit-exactly: NaN (the staleness marker), ±Inf,
    // signed zero, subnormals
    rt(Seq((10L, Double.NaN), (20L, Double.PositiveInfinity),
      (30L, Double.NegativeInfinity), (40L, -0.0),
      (50L, Double.MinPositiveValue), (60L, -Double.MinPositiveValue)))
    // value window narrows then widens (re-established leading/trailing)
    rt(Seq((1L, 1.0), (2L, 1.5), (3L, 1.25), (4L, 1e300), (5L, 1.25),
      (6L, 1.25), (7L, 3.0e-12)))
    // equal timestamps are "non-decreasing" (dod edge at 0-width deltas)
    rt(Seq((5L, 1.0), (5L, 2.0), (5L, 3.0)))
  }

  test("every dod window boundary encodes in its own arm and decodes back") {
    def tsFor(dods: Seq[Long]): Seq[(Long, Double)] = {
      // t0 = 0, tDelta1 = 2^41 (room for the most negative dods, the
      // 64-bit-arm −2^40 included), then each dod adjusts the running
      // delta
      var t = 0L
      var d = 1L << 41
      val out = Vector.newBuilder[(Long, Double)]
      out += ((0L, 1.0))
      t += d
      out += ((t, 2.0))
      dods.zipWithIndex.foreach { case (dod, i) =>
        d += dod
        t += d
        out += ((t, 3.0 + i))
      }
      out.result()
    }
    // the asymmetric window bounds: ±(2^{n−1}−1) stays, +2^{n−1} stays,
    // one past either end escalates to the next arm
    val edges = Seq[Long](0L, 1L, -1L,
      8191L, 8192L, -8191L, 8193L, -8192L, // 14-bit edge → 17-bit
      65535L, 65536L, -65535L, 65537L, -65536L, // 17-bit edge → 20-bit
      524287L, 524288L, -524287L, 524289L, -524288L, // 20-bit edge → 64-bit
      (1L << 40), -(1L << 40))
    rt(tsFor(edges))
    // and each edge alone after a fresh pair
    edges.foreach(e => rt(tsFor(Seq(e))))
  }

  test("malformed inputs fail loud") {
    intercept[IllegalArgumentException](XorChunk.encode(Nil))
    intercept[IllegalArgumentException](
      XorChunk.encode(Seq((1000L, 1.0), (500L, 1.0)))) // decreasing ts
    intercept[IllegalArgumentException](
      XorChunk.encode((0 to 0x10000).map(i => (i.toLong, 1.0)))) // count
    intercept[IllegalArgumentException](XorChunk.decode(Array[Byte](0)))
    // count says 3 samples but the stream ends after one
    val truncated = XorChunk.encode(Seq((1000L, 1.0))).clone()
    truncated(1) = 3
    intercept[IllegalArgumentException](XorChunk.decode(truncated))
  }
}
