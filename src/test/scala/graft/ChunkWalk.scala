package graft

/** Test-side INDEPENDENT walk of a streamed remote-read response —
  * its own protobuf/frame parser (not RemoteRead's), so specs that
  * assert chunk metadata also cross-check the framing itself.
  */
object ChunkWalk {

  // walk a streamed response's frames and collect every chunk's
  // (encoding, reset-hint) pair — an INDEPENDENT protobuf walk, not
  // RemoteRead's, so the framing is cross-checked too. The hint is
  // the RAW flag-byte high bits, i.e. upstream chunkenc's
  // CounterResetHeader values (0 unknown, 2 CounterReset,
  // 1 NotCounterReset, 3 gauge) — NOT the prompb enum, so specs
  // asserting on these values pin the upstream wire convention
  def chunkHints(bytes: Array[Byte]): Seq[(Long, Int)] = {
    var p = 0
    def uv(): Long = {
      var s = 0; var v = 0L; var b = 0
      do { b = bytes(p) & 0xFF; p += 1; v |= (b & 0x7FL) << s; s += 7 }
      while ((b & 0x80) != 0)
      v
    }
    // NOTE: `p += uv()` would read the OLD p before uv() advances it
    // (Scala's left-to-right evaluation) — always bind the varint first
    def skipLen(): Unit = { val l = uv().toInt; p += l }
    val out = Seq.newBuilder[(Long, Int)]
    while (p < bytes.length) {
      val len = uv().toInt
      p += 4 // frame CRC
      val end = p + len
      while (p < end) {
        val tag = uv()
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) => // ChunkedSeries
            val sLen = uv().toInt
            val sEnd = p + sLen
            while (p < sEnd) {
              val t2 = uv()
              ((t2 >> 3).toInt, (t2 & 7).toInt) match {
                case (2, 2) => // Chunk
                  val cLen = uv().toInt
                  val cEnd = p + cLen
                  var typ = 0L
                  var hint = -1
                  while (p < cEnd) {
                    val t3 = uv()
                    ((t3 >> 3).toInt, (t3 & 7).toInt) match {
                      case (3, 0) => typ = uv()
                      case (4, 2) =>
                        val l = uv().toInt
                        hint = (bytes(p + 2) & 0xFF) >> 6
                        p += l
                      case (_, 0) => uv()
                      case (_, 2) => skipLen()
                      case other => sys.error(s"unexpected wire shape $other")
                    }
                  }
                  out += ((typ, hint))
                case (_, 0) => uv()
                case (_, 2) => skipLen()
                case other => sys.error(s"unexpected wire shape $other")
              }
            }
          case (_, 0) => uv()
          case (_, 2) => skipLen()
          case other => sys.error(s"unexpected wire shape $other")
        }
      }
    }
    out.result()
  }

}
