package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.HistogramChunk
import graft.sources.RemoteWrite.Hist

/** The HISTOGRAM (type 2) chunk codec: hand-derived byte pin, lossless
  * round-trips across every encode arm (first-sample full write, tDelta,
  * dod ladder, count/zcnt deltas, sum XOR window, per-bucket
  * delta-of-delta, both bucket signs), the appendability law (schema or
  * span-layout change cuts a chunk), and seeded fuzz over random
  * histogram walks.
  */
class HistogramChunkSpec extends AnyFunSuite {

  private def h(ts: Long, schema: Int, count: Long, sum: Double,
      zcnt: Long, offs: Seq[Int], lens: Seq[Int], deltas: Seq[Long],
      negOffs: Seq[Int] = Nil, negLens: Seq[Int] = Nil,
      negDeltas: Seq[Long] = Nil): Hist =
    Hist(ts, schema, offs.toVector, lens.toVector, deltas.toVector,
      count, sum, zcnt, negOffs.toVector, negLens.toVector,
      negDeltas.toVector)

  test("hand-derived bytes: a single-sample chunk") {
    // Derived independently from the documented layout (a second
    // implementation of the bit ladder, not this codec):
    //   00 01        sample count 1
    //   00           flags: counter-reset hint unknown
    //   D0 0F        zigzag(1000) = 2000 as uvarint
    //   10011        schema 3: varbit '10' + 3 bits (011)
    //   00000000     zero threshold byte 0
    //   00000101     count uvarint 5
    //   00000001     zero_count uvarint 1
    //   <64 bits>    sum 2.5 = 0x4004000000000000
    //   00000001     nPosSpans 1
    //   0            span offset 0: varbit '0'
    //   00000010     span length uvarint 2
    //   00000000     nNegSpans 0
    //   10 011       delta 3
    //   10 111       delta -1 (two's complement in the 3-bit window)
    //   + zero padding to the byte edge
    val one = h(1000L, 3, 5L, 2.5, 1L, Seq(0), Seq(2), Seq(3L, -1L))
    val got = HistogramChunk.encode(Seq(one))
    assert(got.map("%02X".format(_)).mkString ===
      "000100D00F9800280A002000000000000008080277")
    assert(HistogramChunk.decode(got) === Vector(one))
  }

  test("round-trips: every follower arm (tDelta, dod, deltas, sum XOR), negative buckets, layout variety") {
    // three same-layout samples: uvarint tDelta, then dod = 0 arm;
    // counts/sums move; bucket deltas drift up and down
    val a = Seq(
      h(1000L, 3, 13L, 7.5, 2L, Seq(0, 3), Seq(2, 2), Seq(3L, -1L, 2L, 0L)),
      h(61000L, 3, 21L, 12.25, 3L, Seq(0, 3), Seq(2, 2), Seq(5L, -2L, 3L, -1L)),
      h(121000L, 3, 30L, 20.5, 3L, Seq(0, 3), Seq(2, 2), Seq(6L, -2L, 3L, 0L)))
    assert(HistogramChunk.decode(HistogramChunk.encode(a)) === a.toVector)
    // irregular timestamps drive the wider dod windows
    val jitter = Seq(
      h(0L, 0, 1L, 1.0, 0L, Seq(0), Seq(1), Seq(1L)),
      h(10L, 0, 2L, 2.0, 0L, Seq(0), Seq(1), Seq(2L)),
      h(20000L, 0, 3L, 4.0, 1L, Seq(0), Seq(1), Seq(3L)), // 14-bit dod
      h(20010L, 0, 4L, 4.0, 1L, Seq(0), Seq(1), Seq(4L)), // negative dod
      h(4000000020L, 0, 5L, -8.5, 2L, Seq(0), Seq(1), Seq(5L))) // 64-bit
    assert(HistogramChunk.decode(HistogramChunk.encode(jitter))
      === jitter.toVector)
    // negative buckets ride their own spans + delta chains
    val b = Seq(
      h(2000L, 2, 9L, -1.5, 1L, Seq(-2), Seq(1), Seq(7L),
        Seq(1), Seq(2), Seq(2L, 1L)),
      h(62000L, 2, 14L, -2.25, 2L, Seq(-2), Seq(1), Seq(9L),
        Seq(1), Seq(2), Seq(2L, 2L)))
    assert(HistogramChunk.decode(HistogramChunk.encode(b)) === b.toVector)
    // a bucket-free histogram (all mass in the zero bucket) is legal
    val z = Seq(h(5L, -4, 3L, 0.0, 3L, Nil, Nil, Nil))
    assert(HistogramChunk.decode(HistogramChunk.encode(z)) === z.toVector)
    // NaN sums (the staleness convention) round-trip bit-exactly
    val nan = Seq(
      h(1L, 0, 1L, 1.5, 0L, Seq(0), Seq(1), Seq(1L)),
      h(2L, 0, 1L, Double.NaN, 0L, Seq(0), Seq(1), Seq(1L)))
    val back = HistogramChunk.decode(HistogramChunk.encode(nan))
    assert(java.lang.Double.doubleToRawLongBits(back(1).sum) ===
      java.lang.Double.doubleToRawLongBits(Double.NaN))
  }

  test("appendability: schema or span-layout change refuses inside a chunk (the caller cuts)") {
    val base = h(1L, 3, 1L, 1.0, 0L, Seq(0), Seq(2), Seq(1L, 1L))
    assert(HistogramChunk.appendable(base,
      h(2L, 3, 2L, 2.0, 0L, Seq(0), Seq(2), Seq(2L, 1L))))
    val reschema = h(2L, 2, 2L, 2.0, 0L, Seq(0), Seq(2), Seq(2L, 1L))
    val relayout = h(2L, 3, 2L, 2.0, 0L, Seq(1), Seq(2), Seq(2L, 1L))
    assert(!HistogramChunk.appendable(base, reschema))
    assert(!HistogramChunk.appendable(base, relayout))
    intercept[IllegalArgumentException](
      HistogramChunk.encode(Seq(base, reschema)))
    intercept[IllegalArgumentException](
      HistogramChunk.encode(Seq(base, relayout)))
    // delta count must agree with the span layout
    intercept[IllegalArgumentException](HistogramChunk.encode(Seq(
      h(1L, 3, 1L, 1.0, 0L, Seq(0), Seq(2), Seq(1L)))))
    // malformed inputs fail loud
    intercept[IllegalArgumentException](HistogramChunk.encode(Nil))
    intercept[IllegalArgumentException](
      HistogramChunk.decode(Array[Byte](0, 1)))
  }

  test("FLOAT_HISTOGRAM (type 3): hand-derived single-sample bytes") {
    import graft.sources.FloatHistogramChunk
    import graft.sources.RemoteWrite.FHist
    // Derived independently from the documented layout (the second
    // implementation again): header 00 01 | 00, then the bitstream —
    // zigzag(1000) uvarint D0 0F; schema 3 varbit '10'+011; zthresh
    // byte 0; count 5.25 / zero_count 1.0 / sum 2.5 as raw 64-bit
    // doubles; nPos uvarint 1; span offset varbit '0' + length uvarint
    // 2; nNeg uvarint 0; bucket counts 1.5 and 0.25 as raw doubles.
    val one = FHist(1000L, 3, Vector(0), Vector(2), Vector(1.5, 0.25),
      5.25, 2.5, 1.0)
    val got = FloatHistogramChunk.encode(Seq(one))
    assert(got.map("%02X".format(_)).mkString ===
      "000100D00F980200A8000000000001FF800000000000020020000000000000080800FFE0000000000000FF40000000000000")
    assert(FloatHistogramChunk.decode(got) === Vector(one))
  }

  test("FLOAT_HISTOGRAM round-trips: per-column XOR windows, negative buckets, layout cut law, fuzz") {
    import graft.sources.FloatHistogramChunk
    import graft.sources.RemoteWrite.FHist
    // fractional mass drifting per bucket: each column's own XOR window
    val a = Seq(
      FHist(1000L, 3, Vector(0, 3), Vector(2, 1), Vector(1.5, 2.25, 0.5),
        5.25, 3.5, 1.0),
      FHist(61000L, 3, Vector(0, 3), Vector(2, 1), Vector(2.0, 2.25, 1.0),
        7.25, 5.25, 2.0),
      FHist(121000L, 3, Vector(0, 3), Vector(2, 1), Vector(2.0, 3.0, 1.0),
        8.0, 6.0, 2.0))
    assert(FloatHistogramChunk.decode(FloatHistogramChunk.encode(a))
      === a.toVector)
    // negative buckets + NaN sum (staleness) bit-exact
    val b = Seq(
      FHist(1L, 0, Vector(-1), Vector(1), Vector(0.75), 3.5, -0.5, 1.0,
        Vector(0), Vector(2), Vector(1.25, 0.5)),
      FHist(2L, 0, Vector(-1), Vector(1), Vector(1.0), 4.75, Double.NaN,
        1.0, Vector(0), Vector(2), Vector(1.25, 1.5)))
    val back = FloatHistogramChunk.decode(FloatHistogramChunk.encode(b))
    assert(back(0) === b(0))
    assert(java.lang.Double.doubleToRawLongBits(back(1).sum) ===
      java.lang.Double.doubleToRawLongBits(Double.NaN))
    // the appender's cut law mirrors the integer codec
    assert(!FloatHistogramChunk.appendable(a.head, b.head))
    intercept[IllegalArgumentException](
      FloatHistogramChunk.encode(Seq(a.head, b.head)))
    intercept[IllegalArgumentException](FloatHistogramChunk.encode(Nil))
    // seeded fuzz: random fractional walks round-trip bit-exactly
    val rnd = new scala.util.Random(20260815L)
    (0 until 25).foreach { trial =>
      val nb = 1 + rnd.nextInt(5)
      var t = rnd.nextLong() % 1000000L
      var counts = Vector.fill(nb)(rnd.nextDouble() * 10)
      val hists = (0 until 1 + rnd.nextInt(15)).map { i =>
        if (i > 0) {
          t += rnd.nextInt(100000).toLong
          counts = counts.map(c =>
            if (rnd.nextBoolean()) c else c + rnd.nextDouble())
        }
        FHist(t, rnd.nextInt(9) - 4 match { case s => s }, // schema fixed below
          Vector(0), Vector(nb), counts,
          counts.sum, rnd.nextDouble() * 100, rnd.nextInt(5).toDouble)
      }.map(_.copy(schema = 2)) // one layout per chunk
      assert(FloatHistogramChunk.decode(FloatHistogramChunk.encode(hists))
        === hists.toVector, s"trial $trial")
    }
  }

  test("crafted chunks fail loud: negative-after-truncation span fields never fabricate buckets") {
    import graft.sources.FloatHistogramChunk
    // a local MSB-first bit writer (a third, test-owned implementation
    // of the layout) builds a chunk whose span LENGTH uvarint is
    // 0xFFFFFFFF — legal bytes, but .toInt would truncate negative and
    // a later sum-only check would pass (−3 + 5 ≥ 0); the decoder must
    // refuse at the field
    class W { // bits MSB-first
      val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
      def bit(b: Int): Unit = bits += (b & 1)
      def nbits(v: Long, n: Int): Unit =
        (n - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1L).toInt))
      def byte(b: Int): Unit = nbits(b.toLong & 0xFF, 8)
      def uvarint(v0: Long): Unit = {
        var v = v0
        while ((v & ~0x7FL) != 0L) { byte(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
        byte(v.toInt)
      }
      def out: Array[Byte] = {
        val padded = bits ++ Seq.fill((8 - bits.size % 8) % 8)(0)
        padded.grouped(8).map(_.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
      }
    }
    def crafted(spanLen: Long): Array[Byte] = {
      val w = new W
      w.byte(0); w.byte(1) // one sample
      w.byte(0) // flags
      w.uvarint(2000L) // zigzag(1000)
      w.nbits(2L, 2); w.nbits(3L, 3) // schema 3 varbit '10'+011
      w.byte(0) // zthresh
      w.uvarint(5L) // count
      w.uvarint(1L) // zero_count
      w.nbits(java.lang.Double.doubleToRawLongBits(2.5), 64) // sum
      w.uvarint(1L) // nPos
      w.bit(0) // span offset 0 (varbit '0')
      w.uvarint(spanLen) // span LENGTH — the crafted field
      w.out // (truncated after the length: the decoder must fail first)
    }
    val e = intercept[IllegalArgumentException](
      HistogramChunk.decode(crafted(0xFFFFFFFFL)))
    assert(e.getMessage.contains("invalid span length"))
    // a sane length on the same bytes fails LATER (truncated stream),
    // proving the guard fired on the field, not on general damage
    intercept[IllegalArgumentException](HistogramChunk.decode(crafted(2L)))
    // the float codec shares the discipline (same header, count/zcnt/sum
    // as raw doubles before the spans)
    def craftedF(spanLen: Long): Array[Byte] = {
      val w = new W
      w.byte(0); w.byte(1); w.byte(0)
      w.uvarint(2000L)
      w.nbits(2L, 2); w.nbits(3L, 3)
      w.byte(0)
      w.nbits(java.lang.Double.doubleToRawLongBits(5.0), 64) // count
      w.nbits(java.lang.Double.doubleToRawLongBits(1.0), 64) // zcnt
      w.nbits(java.lang.Double.doubleToRawLongBits(2.5), 64) // sum
      w.uvarint(1L)
      w.bit(0)
      w.uvarint(spanLen)
      w.out
    }
    val ef = intercept[IllegalArgumentException](
      FloatHistogramChunk.decode(craftedF(0xFFFFFFFFL)))
    assert(ef.getMessage.contains("invalid span length"))
  }

  test("fuzz: seeded random histogram walks round-trip bit-exactly") {
    val rnd = new scala.util.Random(20260815L)
    (0 until 40).foreach { trial =>
      val schema = rnd.nextInt(9) - 4
      val nSpans = 1 + rnd.nextInt(3)
      var at = rnd.nextInt(20) - 10
      val spans = (0 until nSpans).map { _ =>
        val off = at + rnd.nextInt(5)
        val len = 1 + rnd.nextInt(4)
        at = off + len + rnd.nextInt(3)
        (off, len)
      }
      val nb = spans.map(_._2).sum
      var t = rnd.nextLong() % 1000000L
      var count = rnd.nextInt(100).toLong
      var deltas = Vector.fill(nb)(rnd.nextInt(9).toLong - 4L)
      val n = 1 + rnd.nextInt(20)
      val hists = (0 until n).map { i =>
        if (i > 0) {
          t += rnd.nextInt(100000).toLong
          count += rnd.nextInt(50).toLong
          deltas = deltas.map(_ + rnd.nextInt(7) - 3)
        }
        Hist(t, schema,
          spans.map(_._1).toVector, spans.map(_._2).toVector, deltas,
          count, rnd.nextDouble() * math.pow(10, rnd.nextInt(7) - 3),
          rnd.nextInt(10).toLong)
      }
      assert(HistogramChunk.decode(HistogramChunk.encode(hists))
        === hists.toVector, s"trial $trial")
    }
  }

  test("counter resets cut chunks and the hint chain records why") {
    import graft.sources.{FloatHistogramChunk, RemoteRead}
    import graft.sources.RemoteWrite.FHist
    val a = h(1000, 0, 10, 1.0, 5, Seq(0), Seq(2), Seq(3, 1)) // abs 3, 4
    // growth is not a reset; count / zero-bucket / any-bucket drops are
    assert(!HistogramChunk.resets(a,
      h(2000, 0, 12, 1.0, 5, Seq(0), Seq(2), Seq(3, 2))))
    assert(HistogramChunk.resets(a,
      h(2000, 0, 8, 1.0, 5, Seq(0), Seq(2), Seq(3, 1))))
    assert(HistogramChunk.resets(a,
      h(2000, 0, 12, 1.0, 3, Seq(0), Seq(2), Seq(3, 1))))
    assert(HistogramChunk.resets(a,
      h(2000, 0, 12, 1.0, 5, Seq(0), Seq(2), Seq(2, 1)))) // abs 2, 3
    // a layout change (already a cut) decides on the totals alone
    assert(HistogramChunk.resets(a,
      h(2000, 0, 7, 1.0, 5, Seq(1), Seq(1), Seq(9))))
    assert(!HistogramChunk.resets(a,
      h(2000, 0, 12, 1.0, 5, Seq(1), Seq(1), Seq(9))))
    // the hint rides the flag byte's high bits; decode is unaffected
    assert(HistogramChunk.hintOf(HistogramChunk.encode(Seq(a))) === 0)
    assert(HistogramChunk.hintOf(HistogramChunk.encode(Seq(a), hint = 1)) === 1)
    assert(HistogramChunk.decode(HistogramChunk.encode(Seq(a), hint = 2))
      === Vector(a))
    // float twin: wire buckets are absolute already
    def f(ts: Long, count: Double, cs: Vector[Double]) =
      FHist(ts, 0, Vector(0), Vector(2), cs, count, 1.0, 0.0)
    val fa = f(1000, 10.0, Vector(3.0, 4.0))
    assert(!FloatHistogramChunk.resets(fa, f(2000, 11.5, Vector(3.0, 4.5))))
    assert(FloatHistogramChunk.resets(fa, f(2000, 11.5, Vector(2.5, 4.5))))
    assert(FloatHistogramChunk.resets(fa, f(2000, 9.5, Vector(3.0, 4.0))))
    assert(FloatHistogramChunk.hintOf(
      FloatHistogramChunk.encode(Seq(fa), hint = 1)) === 1)
    // the streamed appender: two samples size-cut the first chunk
    // (budget 2), the third verifiably continues (NotCounterReset —
    // upstream header bits 0b01), the fourth DROPS the count — a reset
    // cut, CounterReset = 0b10 — and a reader never sees a decrease
    // inside one chunk. ChunkWalk reads the RAW upstream bits, so the
    // truth table pins the wire values (1 = not reset, 2 = reset)
    val samples = Seq(
      h(1, 0, 5, 1.0, 0, Seq(0), Seq(2), Seq(2, 1)),
      h(2, 0, 9, 1.0, 0, Seq(0), Seq(2), Seq(3, 2)),
      h(3, 0, 10, 1.0, 0, Seq(0), Seq(2), Seq(4, 2)),
      h(4, 0, 3, 1.0, 0, Seq(0), Seq(2), Seq(1, 0)))
    val bos = new java.io.ByteArrayOutputStream()
    val w = new RemoteRead.ChunkFrameWriter(bos, samplesPerChunk = 2,
      frameBytes = 1 << 20)
    w.startSeries(Vector("__name__" -> "hq"), 0L)
    samples.foreach(w.addHist)
    w.endSeries()
    w.finish()
    assert(ChunkWalk.chunkHints(bos.toByteArray) === Seq((2L, 0), (2L, 1), (2L, 2)))
    // the cuts never change the decoded samples
    assert(RemoteRead.walkStreamed(bos.toByteArray).flatMap(_._2.hists)
      === samples)
    // a fresh series resets the hint memory: re-sending the first
    // sample in a NEW series reads unknown again, not a reset
    val bos2 = new java.io.ByteArrayOutputStream()
    val w2 = new RemoteRead.ChunkFrameWriter(bos2, 120, 1 << 20)
    w2.startSeries(Vector("__name__" -> "h1"), 0L)
    w2.addHist(samples(2))
    w2.endSeries()
    w2.startSeries(Vector("__name__" -> "h2"), 0L)
    w2.addHist(samples(3))
    w2.endSeries()
    w2.finish()
    assert(ChunkWalk.chunkHints(bos2.toByteArray) === Seq((2L, 0), (2L, 0)))
    // GAUGE-type histograms (prompb reset_hint GAUGE on ingest) have no
    // reset semantics: the same decreasing walk stays ONE chunk and
    // carries the gauge hint (3); the per-sample ingest attribute is
    // chunk-level on this wire, so decoded samples read hint 0
    val bos3 = new java.io.ByteArrayOutputStream()
    val w3 = new RemoteRead.ChunkFrameWriter(bos3, 120, 1 << 20)
    w3.startSeries(Vector("__name__" -> "hg"), 0L)
    samples.map(_.copy(resetHint = 3)).foreach(w3.addHist)
    w3.endSeries()
    w3.finish()
    assert(ChunkWalk.chunkHints(bos3.toByteArray) === Seq((2L, 3)))
    assert(RemoteRead.walkStreamed(bos3.toByteArray).flatMap(_._2.hists)
      === samples)
    // a gauge↔counter hint-type flip cuts the open chunk even when the
    // layout is appendable and nothing drops — one chunk never mixes
    // gauge and counter semantics (upstream recreates the chunk on a
    // hint-type change). The counter chunk after a gauge one reads
    // unknown (reset detection against a gauge value is meaningless)
    val flip = Seq(samples(0).copy(resetHint = 3), samples(1),
      samples(2).copy(resetHint = 3))
    val bos4 = new java.io.ByteArrayOutputStream()
    val w4 = new RemoteRead.ChunkFrameWriter(bos4, 120, 1 << 20)
    w4.startSeries(Vector("__name__" -> "hf"), 0L)
    flip.foreach(w4.addHist)
    w4.endSeries()
    w4.finish()
    assert(ChunkWalk.chunkHints(bos4.toByteArray)
      === Seq((2L, 3), (2L, 0), (2L, 3)))
    assert(RemoteRead.walkStreamed(bos4.toByteArray).flatMap(_._2.hists)
      === flip.map(_.copy(resetHint = 0)))
  }
}
