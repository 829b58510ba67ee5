package graft.sources

import graft.sources.XorChunk.{BitReader, BitWriter, fits, readUvarint,
  signed, unzigzag, writeUvarint, zigzag}

/** Native-histogram chunk codec — the `Chunk.Encoding.HISTOGRAM`
  * (type 2) payload of the remote-read streamed protocol, so a
  * long-term-storage reader can pull this engine's native-histogram
  * families (the sample kind the reference's histogram block implies,
  * `prometheus.cpp:256-306`, lifted to the sparse exponential ladder)
  * as chunks, not just re-derived floats.
  *
  * Re-expressed from the PUBLIC format's documented structure (the
  * Prometheus TSDB histogram-chunk layout: a sample-count header, a
  * counter-reset hint byte, a fully-written first sample, and
  * delta/XOR-compressed followers; a sample that is not appendable —
  * schema or span-layout change — cuts a new chunk, which is how the
  * upstream appender behaves). Where the published documentation
  * leaves bit-level choices open, the layout below is this codec's
  * pinned choice, spec'd by hand-derived bytes and full round-trip
  * fuzzing — both ends of this wire (the frame writer and
  * [[RemoteRead.walkStreamed]]) speak it, and the a1x gate hash-fails
  * if one bit drifts.
  *
  * Layout (bits MSB-first within bytes, like [[XorChunk]]):
  *  - 2-byte big-endian sample count;
  *  - 1 flag byte: counter-reset hint in the two HIGH bits, upstream
  *    chunkenc's CounterResetHeader values (00 unknown, 10 counter
  *    reset, 01 not reset, 11 gauge — NOTE these differ from prompb's
  *    ResetHint enum, where YES=1 and NO=2; [[hintToWire]] maps
  *    between them), low bits zero;
  *  - sample 0, written in full:
  *      t            zigzag uvarint (ms),
  *      schema       varbit int,
  *      zthreshold   one byte 0 (the wire walk does not model the
  *                   threshold; 0 = "no zero bucket width", the public
  *                   one-byte form's zero arm),
  *      count        uvarint,   zero_count  uvarint,
  *      sum          64 raw IEEE-754 bits,
  *      nPosSpans    uvarint, then per span: offset varbit int,
  *                   length uvarint,
  *      nNegSpans    + spans likewise,
  *      pos deltas   varbit int each (exactly Σ pos lengths values —
  *                   the wire delta chain itself),
  *      neg deltas   varbit int each;
  *  - sample n ≥ 1 (guaranteed same schema + span layout; the encoder
  *    refuses otherwise — callers cut chunks on [[appendable]]):
  *      t            n = 1: tDelta uvarint; n ≥ 2: delta-of-delta on
  *                   the [[XorChunk]] 14/17/20/64-bit ladder,
  *      count        varbit int of (count_n − count_{n−1}),
  *      zero_count   varbit int of the same difference,
  *      sum          XOR-coded against the previous sum with the
  *                   leading/trailing-zero window (the [[XorChunk]]
  *                   value rule),
  *      pos deltas   varbit int of (delta_n[j] − delta_{n−1}[j]) per
  *                   bucket position — a steady histogram writes all
  *                   zeros, one bit per bucket,
  *      neg deltas   likewise.
  *
  * varbit int is the format's prefix-coded signed integer:
  * `0` → 0; `10`+3 bits; `110`+6; `1110`+9; `11110`+12; `11111`+64 —
  * each n-bit window two's-complement over `[−(2^{n−1}−1), 2^{n−1}]`
  * (the same asymmetric bound as the timestamp ladder).
  */
object HistogramChunk {

  import RemoteWrite.Hist

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"histogram chunk: $msg")

  /** Can `b` append onto `a`'s chunk? Same resolution and same sparse
    * layout — a change cuts a new chunk (upstream's appender rule; a
    * layout-growing recode is a server-side optimization this writer
    * does not need, the decoder accepts any chunk sequence).
    */
  def appendable(a: Hist, b: Hist): Boolean =
    a.schema == b.schema && a.offs == b.offs && a.lens == b.lens &&
      a.negOffs == b.negOffs && a.negLens == b.negLens

  /** Upstream's counter-reset detection between consecutive samples of
    * one counter family: the total count, the zero bucket, or ANY
    * absolute bucket dropping is a reset. Buckets compare per position
    * when the layouts match (the wire delta chains prefix-summed to the
    * absolute ladder); on a layout change — which cuts the chunk via
    * [[appendable]] anyway — only the totals decide, the documented
    * approximation of upstream's bucket-mapping walk (a definite drop
    * still reads as a reset; an ambiguous relayout reads unknown).
    */
  def resets(a: Hist, b: Hist): Boolean = {
    def abs(d: Vector[Long]) = d.scanLeft(0L)(_ + _).tail
    val drop = b.count < a.count || b.zeroCount < a.zeroCount
    if (!appendable(a, b)) drop
    else drop ||
      abs(a.deltas).zip(abs(b.deltas)).exists { case (x, y) => y < x } ||
      abs(a.negDeltas).zip(abs(b.negDeltas)).exists { case (x, y) => y < x }
  }

  /** prompb ResetHint enum (0 unknown, 1 YES/reset, 2 NO/not-reset,
    * 3 gauge — the convention the appender and ingest tiers speak)
    * ↔ upstream chunkenc's CounterResetHeader high bits (CounterReset
    * = 0b10, NotCounterReset = 0b01; unknown/gauge coincide). The two
    * conventions swap 1 and 2, so the map is its own inverse — encode
    * applies it writing the flag byte, [[hintOf]] applies it reading.
    */
  private[sources] def hintToWire(h: Int): Int = h match {
    case 1 => 2
    case 2 => 1
    case other => other
  }

  /** The chunk's counter-reset hint as the prompb ResetHint value
    * (0 unknown, 1 reset, 2 not reset, 3 gauge), translated from the
    * flag byte's upstream chunkenc header bits.
    */
  def hintOf(data: Array[Byte]): Int = hintToWire((data(2) & 0xFF) >> 6)

  private[sources] def writeVarbitInt(b: BitWriter, v: Long): Unit =
    if (v == 0L) b.writeBit(0)
    else if (fits(v, 3)) { b.writeBits(2L, 2); b.writeBits(v, 3) }
    else if (fits(v, 6)) { b.writeBits(6L, 3); b.writeBits(v, 6) }
    else if (fits(v, 9)) { b.writeBits(14L, 4); b.writeBits(v, 9) }
    else if (fits(v, 12)) { b.writeBits(30L, 5); b.writeBits(v, 12) }
    else { b.writeBits(31L, 5); b.writeBits(v, 64) }

  private[sources] def readVarbitInt(r: BitReader): Long =
    if (r.readBit() == 0) 0L
    else if (r.readBit() == 0) signed(r.readBits(3), 3)
    else if (r.readBit() == 0) signed(r.readBits(6), 6)
    else if (r.readBit() == 0) signed(r.readBits(9), 9)
    else if (r.readBit() == 0) signed(r.readBits(12), 12)
    else r.readBits(64)

  /** The XOR leading/trailing-zero window state for the `sum` column —
    * the [[XorChunk]] value rule, one instance per chunk.
    */
  private[sources] final class XorState {
    private var prev = 0L
    private var leading = 0xFF
    private var trailing = 0

    def seed(bits: Long): Unit = prev = bits

    def write(b: BitWriter, v: Double): Unit = {
      val bits = java.lang.Double.doubleToRawLongBits(v)
      val xor = bits ^ prev
      prev = bits
      if (xor == 0L) { b.writeBit(0); return }
      b.writeBit(1)
      var lead = java.lang.Long.numberOfLeadingZeros(xor)
      val trail = java.lang.Long.numberOfTrailingZeros(xor)
      if (lead >= 32) lead = 31
      if (leading != 0xFF && lead >= leading && trail >= trailing) {
        b.writeBit(0)
        b.writeBits(xor >>> trailing, 64 - leading - trailing)
      } else {
        leading = lead; trailing = trail
        b.writeBit(1)
        b.writeBits(lead.toLong, 5)
        val sig = 64 - lead - trail
        b.writeBits(sig.toLong & 0x3F, 6)
        b.writeBits(xor >>> trail, sig)
      }
    }

    def read(r: BitReader): Double = {
      if (r.readBit() == 1) {
        if (r.readBit() == 0) {
          val sig = 64 - leading - trailing
          prev ^= r.readBits(sig) << trailing
        } else {
          leading = r.readBits(5).toInt
          var sig = r.readBits(6).toInt
          if (sig == 0) sig = 64
          trailing = 64 - leading - sig
          prev ^= r.readBits(sig) << trailing
        }
      }
      java.lang.Double.longBitsToDouble(prev)
    }
  }

  /** Encode native-histogram samples (non-empty, ≤ 65535, timestamps
    * non-decreasing, ALL pairwise [[appendable]] — callers cut chunks
    * on layout change) as one HISTOGRAM chunk's `data` bytes. `hint`
    * is the chunk's counter-reset hint (0 unknown — a fresh series;
    * 1 counter reset — the appender cut BECAUSE [[resets]] fired;
    * 2 not reset — a verified continuation, e.g. a size cut), written
    * into the flag byte's high bits exactly as upstream's appender
    * records why a chunk started.
    */
  def encode(hists: Seq[Hist], hint: Int = 0): Array[Byte] = {
    if (hists.isEmpty) fail("empty chunk")
    if (hists.length > 0xFFFF)
      fail(s"${hists.length} samples exceed the 2-byte count")
    val h0 = hists.head
    hists.foreach { h =>
      if (!appendable(h0, h))
        fail("schema/span-layout change inside a chunk — cut a new one")
      if (h.deltas.length != h0.deltas.length ||
        h.negDeltas.length != h0.negDeltas.length)
        fail("delta count disagrees with the span layout")
    }
    if (h0.deltas.length != h0.lens.map(_.toLong).sum ||
      h0.negDeltas.length != h0.negLens.map(_.toLong).sum)
      fail("delta count disagrees with the span layout")
    val b = new BitWriter
    b.writeByte(hists.length >> 8)
    b.writeByte(hists.length & 0xFF)
    // counter-reset hint, high two bits — upstream's header values,
    // not the prompb enum the caller passes (they swap 1 and 2)
    b.writeByte(hintToWire(hint & 3) << 6)
    val sumX = new XorState
    var prev: Hist = null
    hists.zipWithIndex.foreach { case (h, i) =>
      if (i == 0) {
        writeUvarint(b, zigzag(h.tsMs))
        writeVarbitInt(b, h.schema.toLong)
        b.writeByte(0) // zero threshold: not modeled on this wire
        writeUvarint(b, h.count)
        writeUvarint(b, h.zeroCount)
        b.writeBits(java.lang.Double.doubleToRawLongBits(h.sum), 64)
        sumX.seed(java.lang.Double.doubleToRawLongBits(h.sum))
        writeUvarint(b, h.offs.length.toLong)
        h.offs.zip(h.lens).foreach { case (o, l) =>
          writeVarbitInt(b, o.toLong); writeUvarint(b, l.toLong)
        }
        writeUvarint(b, h.negOffs.length.toLong)
        h.negOffs.zip(h.negLens).foreach { case (o, l) =>
          writeVarbitInt(b, o.toLong); writeUvarint(b, l.toLong)
        }
        h.deltas.foreach(writeVarbitInt(b, _))
        h.negDeltas.foreach(writeVarbitInt(b, _))
      } else {
        val d = h.tsMs - prev.tsMs
        if (d < 0) fail("timestamps must be non-decreasing")
        if (i == 1) writeUvarint(b, d)
        else {
          val dod = d - (prev.tsMs - hists(i - 2).tsMs)
          if (dod == 0L) b.writeBit(0)
          else if (fits(dod, 14)) { b.writeBits(2L, 2); b.writeBits(dod, 14) }
          else if (fits(dod, 17)) { b.writeBits(6L, 3); b.writeBits(dod, 17) }
          else if (fits(dod, 20)) { b.writeBits(14L, 4); b.writeBits(dod, 20) }
          else { b.writeBits(15L, 4); b.writeBits(dod, 64) }
        }
        writeVarbitInt(b, h.count - prev.count)
        writeVarbitInt(b, h.zeroCount - prev.zeroCount)
        sumX.write(b, h.sum)
        var j = 0
        while (j < h.deltas.length) {
          writeVarbitInt(b, h.deltas(j) - prev.deltas(j)); j += 1
        }
        j = 0
        while (j < h.negDeltas.length) {
          writeVarbitInt(b, h.negDeltas(j) - prev.negDeltas(j)); j += 1
        }
      }
      prev = h
    }
    b.bytes
  }

  /** Decode one HISTOGRAM chunk's `data` bytes back to its samples. */
  def decode(data: Array[Byte]): Vector[Hist] = {
    if (data.length < 3) fail("chunk shorter than its header")
    val n = ((data(0) & 0xFF) << 8) | (data(1) & 0xFF)
    // data(2): counter-reset hint byte — advisory, nothing to restore
    val r = new BitReader(data, 3)
    val sumX = new XorState
    val out = Vector.newBuilder[Hist]
    var schema = 0
    var offs = Vector.empty[Int]
    var lens = Vector.empty[Int]
    var negOffs = Vector.empty[Int]
    var negLens = Vector.empty[Int]
    var t = 0L
    var tDelta = 0L
    var count = 0L
    var zcnt = 0L
    var sum = 0.0
    var deltas = Vector.empty[Long]
    var negDeltas = Vector.empty[Long]
    var i = 0
    while (i < n) {
      if (i == 0) {
        // every Int-destined field validates BEFORE .toInt: a crafted
        // chunk from a corrupt server must fail loud here, never
        // truncate into a negative span length that downstream walks
        // would turn into fabricated buckets (the remote-read walkers'
        // crafted-length discipline, carried into the chunk codec)
        def boundedLen(what: String): Int = {
          val v = readUvarint(r)
          if (v < 0 || v > data.length * 8L) fail(s"invalid $what")
          v.toInt
        }
        def boundedInt(what: String): Int = {
          val v = readVarbitInt(r)
          if (v < Int.MinValue || v > Int.MaxValue) fail(s"invalid $what")
          v.toInt
        }
        t = unzigzag(readUvarint(r))
        schema = boundedInt("schema")
        if (r.readByte() != 0) fail("unsupported zero-threshold form")
        count = readUvarint(r)
        zcnt = readUvarint(r)
        sum = java.lang.Double.longBitsToDouble(r.readBits(64))
        sumX.seed(java.lang.Double.doubleToRawLongBits(sum))
        val nPos = boundedLen("span count")
        val po = Vector.newBuilder[Int]; val pl = Vector.newBuilder[Int]
        (0 until nPos).foreach { _ =>
          po += boundedInt("span offset"); pl += boundedLen("span length")
        }
        offs = po.result(); lens = pl.result()
        val nNeg = boundedLen("span count")
        val no = Vector.newBuilder[Int]; val nl = Vector.newBuilder[Int]
        (0 until nNeg).foreach { _ =>
          no += boundedInt("span offset"); nl += boundedLen("span length")
        }
        negOffs = no.result(); negLens = nl.result()
        val nb = lens.map(_.toLong).sum
        val nnb = negLens.map(_.toLong).sum
        if (nb > data.length * 8L || nnb > data.length * 8L)
          fail("invalid bucket count")
        deltas = Vector.tabulate(nb.toInt)(_ => readVarbitInt(r))
        negDeltas = Vector.tabulate(nnb.toInt)(_ => readVarbitInt(r))
      } else {
        if (i == 1) tDelta = readUvarint(r)
        else {
          val dod: Long =
            if (r.readBit() == 0) 0L
            else if (r.readBit() == 0) signed(r.readBits(14), 14)
            else if (r.readBit() == 0) signed(r.readBits(17), 17)
            else if (r.readBit() == 0) signed(r.readBits(20), 20)
            else r.readBits(64)
          tDelta += dod
        }
        t += tDelta
        count += readVarbitInt(r)
        zcnt += readVarbitInt(r)
        sum = sumX.read(r)
        deltas = deltas.map(d => d + readVarbitInt(r))
        negDeltas = negDeltas.map(d => d + readVarbitInt(r))
      }
      out += Hist(t, schema, offs, lens, deltas, count, sum, zcnt,
        negOffs, negLens, negDeltas)
      i += 1
    }
    out.result()
  }
}

/** Float native-histogram chunk codec — the `Chunk.Encoding
  * .FLOAT_HISTOGRAM` (type 3) payload: the sample kind whose counts
  * are no longer whole numbers (an aggregating or scaling sender —
  * recording rules over histograms, federation of pre-divided rates),
  * carried on the wire as ABSOLUTE double bucket counts (prompb
  * `positive_counts`/`negative_counts`) rather than integer delta
  * chains. Layout mirrors [[HistogramChunk]] exactly except every
  * count-valued column is a double ridden through its own Gorilla XOR
  * window:
  *  - 2-byte count + 1 counter-reset-hint byte;
  *  - sample 0: t zigzag uvarint, schema varbit int, zero-threshold
  *    byte 0, then count / zero_count / sum as 64 raw bits each, spans
  *    (offset varbit int, length uvarint), and every bucket count as
  *    64 raw bits;
  *  - sample n ≥ 1 (same schema + layout, enforced like the integer
  *    codec): t through the uvarint/dod ladder, then count, zero_count,
  *    sum, and each bucket count XOR-coded against its own previous
  *    value with an independent leading/trailing window per column — a
  *    steady bucket costs one bit.
  */
object FloatHistogramChunk {

  import HistogramChunk.{XorState, hintToWire, readVarbitInt, writeVarbitInt}
  import RemoteWrite.FHist
  import XorChunk.{BitReader, BitWriter, fits, readUvarint, signed,
    unzigzag, writeUvarint, zigzag}

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"float histogram chunk: $msg")

  /** Same appendability rule as the integer codec: same resolution,
    * same sparse layout — a change cuts a new chunk.
    */
  def appendable(a: FHist, b: FHist): Boolean =
    a.schema == b.schema && a.offs == b.offs && a.lens == b.lens &&
      a.negOffs == b.negOffs && a.negLens == b.negLens

  /** The integer codec's counter-reset rule on the float form: total
    * count, zero bucket, or any bucket dropping. Float wire buckets
    * are ABSOLUTE already, so same-layout buckets compare directly;
    * a layout change decides on the totals alone, like the integer
    * twin.
    */
  def resets(a: FHist, b: FHist): Boolean = {
    val drop = b.count < a.count || b.zeroCount < a.zeroCount
    if (!appendable(a, b)) drop
    else drop ||
      a.counts.zip(b.counts).exists { case (x, y) => y < x } ||
      a.negCounts.zip(b.negCounts).exists { case (x, y) => y < x }
  }

  /** The chunk's counter-reset hint as the prompb ResetHint value —
    * same flag-byte layout and upstream-bit translation as the
    * integer codec.
    */
  def hintOf(data: Array[Byte]): Int = hintToWire((data(2) & 0xFF) >> 6)

  /** Encode float-histogram samples (non-empty, ≤ 65535, timestamps
    * non-decreasing, pairwise [[appendable]]) as one FLOAT_HISTOGRAM
    * chunk's `data` bytes. `hint` is the counter-reset hint byte's
    * high bits, as on the integer codec.
    */
  def encode(hists: Seq[FHist], hint: Int = 0): Array[Byte] = {
    if (hists.isEmpty) fail("empty chunk")
    if (hists.length > 0xFFFF)
      fail(s"${hists.length} samples exceed the 2-byte count")
    val h0 = hists.head
    hists.foreach { h =>
      if (!appendable(h0, h))
        fail("schema/span-layout change inside a chunk — cut a new one")
      if (h.counts.length != h0.counts.length ||
        h.negCounts.length != h0.negCounts.length)
        fail("bucket count disagrees with the span layout")
    }
    if (h0.counts.length != h0.lens.map(_.toLong).sum ||
      h0.negCounts.length != h0.negLens.map(_.toLong).sum)
      fail("bucket count disagrees with the span layout")
    val b = new BitWriter
    b.writeByte(hists.length >> 8)
    b.writeByte(hists.length & 0xFF)
    // upstream header bits, translated from the prompb enum like the
    // integer codec
    b.writeByte(hintToWire(hint & 3) << 6)
    val countX = new XorState
    val zcntX = new XorState
    val sumX = new XorState
    val posX = Array.fill(h0.counts.length)(new XorState)
    val negX = Array.fill(h0.negCounts.length)(new XorState)
    def raw(x: XorState, v: Double): Unit = {
      b.writeBits(java.lang.Double.doubleToRawLongBits(v), 64)
      x.seed(java.lang.Double.doubleToRawLongBits(v))
    }
    var prev: FHist = null
    hists.zipWithIndex.foreach { case (h, i) =>
      if (i == 0) {
        writeUvarint(b, zigzag(h.tsMs))
        writeVarbitInt(b, h.schema.toLong)
        b.writeByte(0) // zero threshold: not modeled on this wire
        raw(countX, h.count)
        raw(zcntX, h.zeroCount)
        raw(sumX, h.sum)
        writeUvarint(b, h.offs.length.toLong)
        h.offs.zip(h.lens).foreach { case (o, l) =>
          writeVarbitInt(b, o.toLong); writeUvarint(b, l.toLong)
        }
        writeUvarint(b, h.negOffs.length.toLong)
        h.negOffs.zip(h.negLens).foreach { case (o, l) =>
          writeVarbitInt(b, o.toLong); writeUvarint(b, l.toLong)
        }
        h.counts.zipWithIndex.foreach { case (v, j) => raw(posX(j), v) }
        h.negCounts.zipWithIndex.foreach { case (v, j) => raw(negX(j), v) }
      } else {
        val d = h.tsMs - prev.tsMs
        if (d < 0) fail("timestamps must be non-decreasing")
        if (i == 1) writeUvarint(b, d)
        else {
          val dod = d - (prev.tsMs - hists(i - 2).tsMs)
          if (dod == 0L) b.writeBit(0)
          else if (fits(dod, 14)) { b.writeBits(2L, 2); b.writeBits(dod, 14) }
          else if (fits(dod, 17)) { b.writeBits(6L, 3); b.writeBits(dod, 17) }
          else if (fits(dod, 20)) { b.writeBits(14L, 4); b.writeBits(dod, 20) }
          else { b.writeBits(15L, 4); b.writeBits(dod, 64) }
        }
        countX.write(b, h.count)
        zcntX.write(b, h.zeroCount)
        sumX.write(b, h.sum)
        h.counts.zipWithIndex.foreach { case (v, j) => posX(j).write(b, v) }
        h.negCounts.zipWithIndex.foreach { case (v, j) => negX(j).write(b, v) }
      }
      prev = h
    }
    b.bytes
  }

  /** Decode one FLOAT_HISTOGRAM chunk's `data` bytes back to samples. */
  def decode(data: Array[Byte]): Vector[FHist] = {
    if (data.length < 3) fail("chunk shorter than its header")
    val n = ((data(0) & 0xFF) << 8) | (data(1) & 0xFF)
    val r = new BitReader(data, 3)
    val countX = new XorState
    val zcntX = new XorState
    val sumX = new XorState
    var posX: Array[XorState] = Array.empty
    var negX: Array[XorState] = Array.empty
    def raw(x: XorState): Double = {
      val bits = r.readBits(64)
      x.seed(bits)
      java.lang.Double.longBitsToDouble(bits)
    }
    val out = Vector.newBuilder[FHist]
    var schema = 0
    var offs = Vector.empty[Int]
    var lens = Vector.empty[Int]
    var negOffs = Vector.empty[Int]
    var negLens = Vector.empty[Int]
    var t = 0L
    var tDelta = 0L
    var i = 0
    var count = 0.0
    var zcnt = 0.0
    var sum = 0.0
    var counts = Vector.empty[Double]
    var negCounts = Vector.empty[Double]
    while (i < n) {
      if (i == 0) {
        // validated Int reads — the integer codec's crafted-chunk
        // discipline (negative/oversized span fields fail loud, never
        // truncate)
        def boundedLen(what: String): Int = {
          val v = readUvarint(r)
          if (v < 0 || v > data.length * 8L) fail(s"invalid $what")
          v.toInt
        }
        def boundedInt(what: String): Int = {
          val v = readVarbitInt(r)
          if (v < Int.MinValue || v > Int.MaxValue) fail(s"invalid $what")
          v.toInt
        }
        t = unzigzag(readUvarint(r))
        schema = boundedInt("schema")
        if (r.readByte() != 0) fail("unsupported zero-threshold form")
        count = raw(countX)
        zcnt = raw(zcntX)
        sum = raw(sumX)
        val nPos = boundedLen("span count")
        val po = Vector.newBuilder[Int]; val pl = Vector.newBuilder[Int]
        (0 until nPos).foreach { _ =>
          po += boundedInt("span offset"); pl += boundedLen("span length")
        }
        offs = po.result(); lens = pl.result()
        val nNeg = boundedLen("span count")
        val no = Vector.newBuilder[Int]; val nl = Vector.newBuilder[Int]
        (0 until nNeg).foreach { _ =>
          no += boundedInt("span offset"); nl += boundedLen("span length")
        }
        negOffs = no.result(); negLens = nl.result()
        val nb = lens.map(_.toLong).sum
        val nnb = negLens.map(_.toLong).sum
        if (nb > data.length * 8L || nnb > data.length * 8L)
          fail("invalid bucket count")
        posX = Array.fill(nb.toInt)(new XorState)
        negX = Array.fill(nnb.toInt)(new XorState)
        counts = posX.toVector.map(raw)
        negCounts = negX.toVector.map(raw)
      } else {
        if (i == 1) tDelta = readUvarint(r)
        else {
          val dod: Long =
            if (r.readBit() == 0) 0L
            else if (r.readBit() == 0) signed(r.readBits(14), 14)
            else if (r.readBit() == 0) signed(r.readBits(17), 17)
            else if (r.readBit() == 0) signed(r.readBits(20), 20)
            else r.readBits(64)
          tDelta += dod
        }
        t += tDelta
        count = countX.read(r)
        zcnt = zcntX.read(r)
        sum = sumX.read(r)
        counts = posX.toVector.map(_.read(r))
        negCounts = negX.toVector.map(_.read(r))
      }
      out += FHist(t, schema, offs, lens, counts, count, sum, zcnt,
        negOffs, negLens, negCounts)
      i += 1
    }
    out.result()
  }
}
