package graft.sources

/** Gorilla XOR chunk codec — the `Chunk.Encoding.XOR` payload of the
  * remote-read STREAMED_XOR_CHUNKS protocol (the format Thanos/Cortex
  * queriers request by default, and the on-disk sample encoding of the
  * Prometheus TSDB). Re-expressed from the PUBLIC format definition:
  * Facebook's Gorilla paper §4.1 (delta-of-delta timestamps, XOR'd
  * values) with Prometheus's published bit-size ladder (tsdb/chunkenc
  * format documentation; the reference feeds exactly such a server,
  * `prometheus.cpp:73`).
  *
  * Layout (bits are MSB-first within bytes):
  *  - 2-byte big-endian sample count;
  *  - sample 0: timestamp as a SIGNED (zigzag) varint written
  *    byte-through-the-bitstream, value as 64 raw IEEE-754 bits;
  *  - sample 1: `tDelta = t1 − t0` as an UNSIGNED varint, value
  *    XOR-encoded (below);
  *  - sample n ≥ 2: `dod = tDelta_n − tDelta_{n−1}` prefix-coded —
  *    `0` → dod = 0; `10` + 14 bits; `110` + 17 bits; `1110` + 20
  *    bits; `1111` + 64 bits — each n-bit window holding the
  *    two's-complement of dod in `[−(2^{n−1}−1), 2^{n−1}]` (the
  *    asymmetric bound is part of the format: exactly 2^{n−1} stays in
  *    the SMALLER window and decodes positive); value XOR-encoded.
  *
  * Value XOR encoding against the previous sample's bits:
  *  - xor == 0 → single `0` bit;
  *  - else `1`, then `0` if the xor's leading/trailing-zero window fits
  *    the previously established window (re-use it: write the window's
  *    significant bits), or `1` + 5 bits of leading-zero count (clamped
  *    to 31) + 6 bits of significant-bit count (64 writes as 0 — 0
  *    significant bits cannot occur, the xor == 0 arm took it) + the
  *    significant bits themselves.
  *
  * The codec is LOSSLESS on the full double domain (NaN staleness
  * markers round-trip bit-exactly) and on any non-decreasing
  * millisecond timestamps — both spec-pinned, plus a hand-derived
  * byte-level pin and the a1w gate (a streamed response decoded back
  * must hash-match the SQL-derived sample relation).
  */
object XorChunk {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"xor chunk: $msg")

  /** MSB-first bit writer (the bstream convention of the format). */
  private[sources] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0 // partial byte, high bits filled first
    private var nBits = 0 // filled bits in cur (0..7)

    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }

    /** Write the LOW n bits of v, most significant of the window first. */
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        writeBit(((v >>> i) & 1L).toInt)
        i -= 1
      }
    }

    def writeByte(b: Int): Unit = writeBits(b.toLong & 0xFFL, 8)

    /** Flush: trailing partial byte zero-padded (the format reads by
      * sample COUNT, never to end-of-bytes, so padding is inert).
      */
    def bytes: Array[Byte] = {
      val whole = out.toByteArray
      if (nBits == 0) whole
      else whole :+ ((cur << (8 - nBits)) & 0xFF).toByte
    }
  }

  /** MSB-first bit reader. */
  private[sources] final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bit = 0 // next bit index within bytes(pos), 0 = MSB

    def readBit(): Int = {
      if (pos >= bytes.length) fail("truncated bit stream")
      val b = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }

    def readBits(n: Int): Long = {
      var acc = 0L
      var i = 0
      while (i < n) { acc = (acc << 1) | readBit().toLong; i += 1 }
      acc
    }

    def readByte(): Int = readBits(8).toInt
  }

  private[sources] def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private[sources] def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private[sources] def writeUvarint(b: BitWriter, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) { b.writeByte(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    b.writeByte(v.toInt)
  }

  private[sources] def readUvarint(r: BitReader): Long = {
    var shift = 0
    var acc = 0L
    while (shift <= 63) {
      val b = r.readByte()
      acc |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) return acc
      shift += 7
    }
    fail("uvarint exceeds 64 bits")
  }

  /** dod fits the n-bit window: `[−(2^{n−1}−1), 2^{n−1}]`. */
  private[sources] def fits(x: Long, nbits: Int): Boolean =
    -((1L << (nbits - 1)) - 1) <= x && x <= (1L << (nbits - 1))

  /** Encode `(timestampMs, value)` samples (must be non-empty, ≤ 65535,
    * timestamps non-decreasing) as one XOR chunk's `data` bytes.
    */
  def encode(samples: Seq[(Long, Double)]): Array[Byte] = {
    if (samples.isEmpty) fail("empty chunk")
    if (samples.length > 0xFFFF) fail(s"${samples.length} samples exceed the 2-byte count")
    val b = new BitWriter
    b.writeByte(samples.length >> 8)
    b.writeByte(samples.length & 0xFF)
    var prevT = 0L
    var prevTDelta = 0L
    var prevV = 0L
    // established xor window; leading 0xFF = none yet
    var leading = 0xFF
    var trailing = 0

    def writeVDelta(v: Double): Unit = {
      val bits = java.lang.Double.doubleToRawLongBits(v)
      val xor = bits ^ prevV
      prevV = bits
      if (xor == 0L) { b.writeBit(0); return }
      b.writeBit(1)
      var lead = java.lang.Long.numberOfLeadingZeros(xor)
      val trail = java.lang.Long.numberOfTrailingZeros(xor)
      if (lead >= 32) lead = 31 // 5-bit field
      if (leading != 0xFF && lead >= leading && trail >= trailing) {
        b.writeBit(0)
        b.writeBits(xor >>> trailing, 64 - leading - trailing)
      } else {
        leading = lead; trailing = trail
        b.writeBit(1)
        b.writeBits(lead.toLong, 5)
        val sig = 64 - lead - trail
        b.writeBits(sig.toLong & 0x3F, 6) // 64 → 0, restored on read
        b.writeBits(xor >>> trail, sig)
      }
    }

    samples.zipWithIndex.foreach { case ((t, v), i) =>
      if (i == 0) {
        writeUvarint(b, zigzag(t))
        b.writeBits(java.lang.Double.doubleToRawLongBits(v), 64)
        prevV = java.lang.Double.doubleToRawLongBits(v)
      } else if (i == 1) {
        val d = t - prevT
        if (d < 0) fail("timestamps must be non-decreasing")
        writeUvarint(b, d)
        prevTDelta = d
        writeVDelta(v)
      } else {
        val d = t - prevT
        if (d < 0) fail("timestamps must be non-decreasing")
        val dod = d - prevTDelta
        prevTDelta = d
        if (dod == 0L) b.writeBit(0)
        else if (fits(dod, 14)) { b.writeBits(2L, 2); b.writeBits(dod, 14) }
        else if (fits(dod, 17)) { b.writeBits(6L, 3); b.writeBits(dod, 17) }
        else if (fits(dod, 20)) { b.writeBits(14L, 4); b.writeBits(dod, 20) }
        else { b.writeBits(15L, 4); b.writeBits(dod, 64) }
        writeVDelta(v)
      }
      prevT = t
    }
    b.bytes
  }

  /** Decode one XOR chunk's `data` bytes back to its samples. */
  def decode(data: Array[Byte]): Vector[(Long, Double)] = {
    if (data.length < 2) fail("chunk shorter than its count header")
    val n = ((data(0) & 0xFF) << 8) | (data(1) & 0xFF)
    val r = new BitReader(data, 2)
    val out = Vector.newBuilder[(Long, Double)]
    var t = 0L
    var tDelta = 0L
    var vBits = 0L
    var leading = 0
    var trailing = 0

    def readVDelta(): Unit = {
      if (r.readBit() == 0) return // same value
      if (r.readBit() == 0) {
        val sig = 64 - leading - trailing
        vBits ^= r.readBits(sig) << trailing
      } else {
        leading = r.readBits(5).toInt
        var sig = r.readBits(6).toInt
        if (sig == 0) sig = 64 // the 6-bit field's 64 ↦ 0 writeback
        trailing = 64 - leading - sig
        vBits ^= r.readBits(sig) << trailing
      }
    }

    var i = 0
    while (i < n) {
      if (i == 0) {
        t = unzigzag(readUvarint(r))
        vBits = r.readBits(64)
      } else if (i == 1) {
        tDelta = readUvarint(r)
        t += tDelta
        readVDelta()
      } else {
        val dod: Long =
          if (r.readBit() == 0) 0L
          else if (r.readBit() == 0) signed(r.readBits(14), 14)
          else if (r.readBit() == 0) signed(r.readBits(17), 17)
          else if (r.readBit() == 0) signed(r.readBits(20), 20)
          else r.readBits(64)
        tDelta += dod
        t += tDelta
        readVDelta()
      }
      out += ((t, java.lang.Double.longBitsToDouble(vBits)))
      i += 1
    }
    out.result()
  }

  /** Restore a two's-complement n-bit window, with the format's
    * asymmetric bound: the raw value 2^{n−1} itself stays POSITIVE
    * (the encoder only chose this window when dod ≤ 2^{n−1}).
    */
  private[sources] def signed(raw: Long, nbits: Int): Long =
    if (raw > (1L << (nbits - 1))) raw - (1L << nbits) else raw
}
