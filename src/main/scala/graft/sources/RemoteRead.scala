package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prometheus REMOTE READ (`/api/v1/read`) — the outbound arrow of the
  * wire contract whose inbound arrow the remote-write receiver carries:
  * a Thanos/Cortex/long-term-storage reader POSTs a snappy-framed
  * protobuf `ReadRequest` (queries with a time range and label
  * matchers) and gets back a `ReadResponse` of raw sample frames, so an
  * external engine can pull series OUT of this TSDB exactly as it would
  * from a real Prometheus (the reference's repo purpose, README.md:2
  * "time series database"; its pull model at `prometheus.cpp:47,73` is
  * the scrape-side twin of this bulk-read door).
  *
  * Wire shapes (public prompb vocabulary):
  *  - `ReadRequest`: repeated `Query` (field 1), packed
  *    `accepted_response_types` (field 2 — BOTH protocol types are
  *    implemented: the mandatory SAMPLES baseline and
  *    STREAMED_XOR_CHUNKS, the Gorilla-chunk streaming face a Thanos
  *    querier requests by default; negotiation picks the first
  *    requested type, upstream's rule);
  *  - `Query`: `start_timestamp_ms`/`end_timestamp_ms` (fields 1/2,
  *    both bounds inclusive like upstream's select), repeated
  *    `LabelMatcher` (field 3: type EQ/NEQ/RE/NRE, name, value),
  *    `ReadHints` (field 4 — advisory, skipped by wire type);
  *  - `ReadResponse`: repeated `QueryResult` (field 1), one per request
  *    query, each a repeated-`TimeSeries`-field-1 message — the SAME
  *    byte shape as a `WriteRequest`, so the response body reuses
  *    [[RemoteWrite.encode]]/[[RemoteWrite.walk]] verbatim (one wire
  *    vocabulary, zero duplicated codecs).
  *
  * Series surface matches the remote-write SENDER ([[RemoteWriteClient
  * .backfill]]): wire names carry the exposition `_total` suffix for
  * counters, labels are `__name__`/`instance`/`k` (name-sorted, empty
  * values dropped — upstream strips empty labels from series identity),
  * values are the raw double samples at their own millisecond
  * timestamps. A matcher naming an absent label matches against the
  * empty string (upstream's missing-label rule). Tombstones apply for
  * free: the relation starts at [[graft.operators.Metrics
  * .metricEvents]], where `delete_series` predicates are already folded
  * into the scan.
  *
  * Scale shape: matcher + time filters are pure column predicates
  * pushed into the scan. The SAMPLES face materializes the response on
  * the driver — inherent to its protobuf envelope (one message, length
  * known up front) and bounded by the [[DefaultSampleLimit]] budget the
  * door enforces with HTTP 413 BEFORE encoding. The STREAMED face never
  * materializes the selection: [[prepareRead]] orders the matched
  * relation by (series key, ts) and drives the frame encoder from
  * `toLocalIterator`, so driver memory is one scan partition + one
  * ≤120-sample chunk buffer + one ~1 MiB frame — the protocol's whole
  * point, and the reason a reader bulk-exporting months of a 100 TB
  * corpus streams instead of OOMing the server.
  */
object RemoteRead {

  import RemoteWrite.{FHist, Hist, Series}

  /** LabelMatcher.Type: 0 EQ, 1 NEQ, 2 RE, 3 NRE. */
  final case class Matcher(op: Int, name: String, value: String)

  /** One decoded `Query`: inclusive ms bounds + matchers. */
  final case class ReadQuery(startMs: Long, endMs: Long,
      matchers: Seq[Matcher])

  /** The selection is over the server's response budget — the door
    * answers HTTP 413 (upstream's remote-read sample limit made an
    * explicit refusal) BEFORE any response byte leaves, never a
    * truncated or OOMing response. Deliberately NOT an
    * `IllegalArgumentException`: the endpoint's malformed-bytes 400 arm
    * must not swallow it.
    */
  final class LimitExceeded(msg: String) extends RuntimeException(msg)

  /** Upstream's remote-read sample budget (5e7 samples per request). */
  val DefaultSampleLimit: Long = 50000000L

  /** The SAMPLES face's BYTE budget: that face materializes the whole
    * response as driver rows before encoding (inherent to its
    * single-message envelope), and a sample-COUNT bound alone lets a
    * wide-histogram selection allocate gigabytes while staying under
    * 5e7 samples. The projected size — samples × an estimated wire
    * width per kind (16 B floats, 32 B + 3 B/bucket integer
    * histograms, 32 B + 9 B/bucket float ones) — refuses with 413
    * BEFORE materialization. Default = the sample limit × the float
    * width, so float-only selections refuse at the same point as
    * before and only genuinely wider rows refuse earlier. The STREAMED
    * face is exempt: its driver memory is one partition + one chunk +
    * one frame regardless of selection size (upstream likewise ignores
    * the read sample limit on the chunked protocol's account of its
    * bounded memory).
    */
  val DefaultSampleBytesLimit: Long = DefaultSampleLimit * 16L

  /** Upstream's streamed-face frame budget (~1 MiB of chunk payload per
    * CRC frame before the writer cuts it).
    */
  val DefaultFrameBytes: Int = 1 << 20

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed remote-read request: $msg")

  // ---- ONE bounds-checked cursor under every walker ----

  /** The protobuf read cursor all four walkers share ([[walkRequest]],
    * [[walkResponse]], [[acceptedTypes]], [[walkStreamed]]) — the
    * varint/length discipline exists ONCE, so the next walker is safe
    * by construction: every length-delimited read validates
    * `0 ≤ len ≤ limit − pos` BEFORE advancing (a crafted length —
    * negative after `.toInt`, or past the limit — must 400, never
    * rewind `pos` into an infinite loop on the single-threaded server
    * or bleed reads across message boundaries), and fixed-width skips
    * bounds-check too.
    */
  private[sources] final class ProtoCursor(val bytes: Array[Byte]) {
    var pos = 0
    val end: Int = bytes.length

    def varint(limit: Int): Long = {
      var shift = 0
      var acc = 0L
      while (shift <= 63) {
        if (pos >= limit) fail("truncated varint")
        val b = bytes(pos) & 0xFF
        pos += 1
        acc |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      fail("varint exceeds 64 bits")
    }

    /** A length-delimited field's content END; `pos` stays at the
      * content start. Validates before advancing.
      */
    def lenEnd(limit: Int): Int = {
      val l = varint(limit)
      if (l < 0 || l > limit - pos) fail("invalid length")
      pos + l.toInt
    }

    def str(limit: Int): String = {
      val e2 = lenEnd(limit)
      val s = new String(bytes, pos, e2 - pos,
        java.nio.charset.StandardCharsets.UTF_8)
      pos = e2
      s
    }

    /** The length-delimited field's raw content, copied out. */
    def chunk(limit: Int): Array[Byte] = {
      val e2 = lenEnd(limit)
      val out = java.util.Arrays.copyOfRange(bytes, pos, e2)
      pos = e2
      out
    }

    def skip(wire: Int, limit: Int): Unit = wire match {
      case 0 => varint(limit)
      case 1 =>
        if (limit - pos < 8) fail("truncated fixed64")
        pos += 8
      case 2 => pos = lenEnd(limit)
      case 5 =>
        if (limit - pos < 4) fail("truncated fixed32")
        pos += 4
      case w => fail(s"unsupported wire type $w")
    }

    def has(limit: Int): Boolean = pos < limit
  }

  // ---- decoder (the RECEIVER half: request bytes → queries) ----

  /** Walk an UNCOMPRESSED `ReadRequest`. Unknown fields skip by wire
    * type; structural damage (truncated varint/length) fails loud — the
    * endpoint maps it to HTTP 400 at the door.
    */
  def walkRequest(bytes: Array[Byte]): Seq[ReadQuery] = {
    val c = new ProtoCursor(bytes)
    def matcher(limit: Int): Matcher = {
      var op = 0
      var name = ""
      var value = ""
      while (c.has(limit)) {
        val tag = c.varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 0) => op = c.varint(limit).toInt
          case (2, 2) => name = c.str(limit)
          case (3, 2) => value = c.str(limit)
          case (_, w) => c.skip(w, limit)
        }
      }
      if (op < 0 || op > 3) fail(s"unknown matcher type $op")
      if (name.isEmpty) fail("matcher without a label name")
      Matcher(op, name, value)
    }
    def query(limit: Int): ReadQuery = {
      var startMs = 0L
      var endMs = 0L
      val ms = Vector.newBuilder[Matcher]
      while (c.has(limit)) {
        val tag = c.varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 0) => startMs = c.varint(limit)
          case (2, 0) => endMs = c.varint(limit)
          case (3, 2) => ms += matcher(c.lenEnd(limit))
          case (_, w) => c.skip(w, limit) // hints & future fields
        }
      }
      val m = ms.result()
      if (m.isEmpty) fail("query without matchers")
      ReadQuery(startMs, endMs, m)
    }
    val qs = Vector.newBuilder[ReadQuery]
    while (c.has(c.end)) {
      val tag = c.varint(c.end)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => qs += query(c.lenEnd(c.end))
        case (_, w) => c.skip(w, c.end) // accepted_response_types etc.
      }
    }
    val out = qs.result()
    if (out.isEmpty) fail("no queries")
    if (c.pos != c.end) fail("trailing bytes")
    out
  }

  // ---- encoder (request for the CLIENT half, response for the door;
  // pure varint/tag writers like RemoteWrite's sender) ----

  private def writeVarint(b: java.io.OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      b.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    b.write(v.toInt)
  }

  private def writeLen(b: java.io.ByteArrayOutputStream, field: Int,
      bytes: Array[Byte]): Unit = {
    writeVarint(b, (field.toLong << 3) | 2L)
    writeVarint(b, bytes.length.toLong)
    b.write(bytes, 0, bytes.length)
  }

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Encode queries as an UNCOMPRESSED `ReadRequest` (proto3 writer
    * convention: zero-valued scalars — the EQ matcher type — omit).
    * `accepted` advertises response types in preference order
    * (0 SAMPLES, 1 STREAMED_XOR_CHUNKS), packed like upstream.
    */
  def encodeRequest(queries: Seq[ReadQuery],
      accepted: Seq[Long] = Seq(0L)): Array[Byte] = {
    val req = new java.io.ByteArrayOutputStream()
    queries.foreach { q =>
      val qb = new java.io.ByteArrayOutputStream()
      if (q.startMs != 0L) {
        writeVarint(qb, (1L << 3) | 0L); writeVarint(qb, q.startMs)
      }
      if (q.endMs != 0L) {
        writeVarint(qb, (2L << 3) | 0L); writeVarint(qb, q.endMs)
      }
      q.matchers.foreach { m =>
        val mb = new java.io.ByteArrayOutputStream()
        if (m.op != 0) {
          writeVarint(mb, (1L << 3) | 0L); writeVarint(mb, m.op.toLong)
        }
        writeLen(mb, 2, utf8(m.name))
        writeLen(mb, 3, utf8(m.value))
        writeLen(qb, 3, mb.toByteArray)
      }
      writeLen(req, 1, qb.toByteArray)
    }
    // accepted_response_types: packed, explicit — like upstream's
    // reader advertising its preference order
    val ab = new java.io.ByteArrayOutputStream()
    accepted.foreach(writeVarint(ab, _))
    writeLen(req, 2, ab.toByteArray)
    req.toByteArray
  }

  /** Encode per-query results as an UNCOMPRESSED `ReadResponse`: each
    * `QueryResult` is byte-shaped like a `WriteRequest` (repeated
    * `TimeSeries`, field 1), so the body delegates to
    * [[RemoteWrite.encode]].
    */
  def encodeResponse(results: Seq[Seq[Series]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    results.foreach(qr => writeLen(out, 1, RemoteWrite.encode(qr)))
    out.toByteArray
  }

  /** Walk an UNCOMPRESSED `ReadResponse` — the client half's decode,
    * delegating each `QueryResult` block to [[RemoteWrite.walk]].
    */
  def walkResponse(bytes: Array[Byte]): Seq[Seq[Series]] = {
    val c = new ProtoCursor(bytes)
    val out = Vector.newBuilder[Seq[Series]]
    while (c.has(c.end)) {
      val tag = c.varint(c.end)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => out += RemoteWrite.walk(c.chunk(c.end))
        case (_, w) => c.skip(w, c.end)
      }
    }
    out.result()
  }

  // ---- STREAMED_XOR_CHUNKS: the protocol's second response type ----

  /** `ReadRequest.accepted_response_types` (field 2): 0 SAMPLES,
    * 1 STREAMED_XOR_CHUNKS. Parsed separately from [[walkRequest]]
    * (whose walk skips the field); packed (wire 2) and unpacked
    * (wire 0) encodings both accepted, per proto3.
    */
  def acceptedTypes(bytes: Array[Byte]): Seq[Long] = {
    val c = new ProtoCursor(bytes)
    val out = Vector.newBuilder[Long]
    while (c.has(c.end)) {
      val tag = c.varint(c.end)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (2, 2) => // packed
          val until = c.lenEnd(c.end)
          while (c.has(until)) out += c.varint(until)
        case (2, 0) => out += c.varint(c.end) // unpacked
        case (_, w) => c.skip(w, c.end)
      }
    }
    out.result()
  }

  /** Upstream's negotiation: the FIRST type in the request's list this
    * server supports wins; an empty list means the mandatory SAMPLES
    * baseline; a list naming only unknown types is the caller's error
    * (HTTP 400 at the door, like upstream's negotiate failure).
    */
  private[graft] def negotiate(accepted: Seq[Long]): Long =
    (if (accepted.isEmpty) Seq(0L) else accepted)
      .find(t => t == 0L || t == 1L)
      .getOrElse(fail(
        s"no supported response type among [${accepted.mkString(", ")}]"))

  /** The streamed face's INCREMENTAL frame writer — the one encoder
    * under both the in-memory [[encodeStreamed]] (gates, specs) and the
    * bounded-memory door ([[prepareRead]] feeding it from
    * `toLocalIterator`), so the two paths are byte-identical by
    * construction.
    *
    * Framing is upstream's ChunkedWriter convention:
    * `uvarint(len(data))` ++ big-endian CRC32C of `data` ++ `data`,
    * where each `data` is one `ChunkedReadResponse` message —
    * `chunked_series` (field 1, REPEATED: small series batch into one
    * frame until [[DefaultFrameBytes]] ~1 MiB accumulates, upstream's
    * frame budget) and `query_index` (field 2). A series whose chunks
    * overflow the budget SPLITS across frames with its labels repeated
    * (upstream's mid-series cut — the decoder re-joins by label
    * identity); a query-index change always cuts a frame, because the
    * index is a frame-level field.
    *
    * Float samples buffer into ≤`samplesPerChunk` Gorilla XOR chunks
    * (enc 1, upstream's 120-sample streaming budget); native-histogram
    * samples ride as HISTOGRAM chunks (enc 2) through
    * [[HistogramChunk]], cut on schema/layout change like upstream's
    * appender.
    */
  final class ChunkFrameWriter(out: java.io.OutputStream,
      samplesPerChunk: Int = 120, frameBytes: Int = DefaultFrameBytes) {
    require(samplesPerChunk > 0, "positive chunk budget")
    require(frameBytes > 0, "positive frame budget")

    private val crc = new java.util.zip.CRC32C()
    // closed ChunkedSeries messages awaiting their frame
    private val frame = new java.io.ByteArrayOutputStream()
    private var frameQ = 0L
    // the OPEN series: encoded label fields + closed chunk fields
    private var labelBytes: Array[Byte] = Array.emptyByteArray
    private val chunkFields = new java.io.ByteArrayOutputStream()
    private var open = false
    private val sampleBuf =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    private val histBuf = scala.collection.mutable.ArrayBuffer.empty[Hist]
    private val fhistBuf = scala.collection.mutable.ArrayBuffer.empty[FHist]
    // per-series appender memory for the reset-hint chain: the last
    // sample EVER appended (across chunk cuts) + the open chunk's hint
    private var lastHist: Hist = null
    private var lastFHist: FHist = null
    private var histHint = 0
    private var fhistHint = 0

    /** Frames cut so far (telemetry + the frame-count specs). */
    var framesWritten = 0L

    def startSeries(labels: Seq[(String, String)], queryIndex: Long): Unit = {
      require(!open, "previous series still open")
      lastHist = null
      lastFHist = null
      if (frame.size() > 0 && queryIndex != frameQ) flushFrame()
      frameQ = queryIndex
      val lb = new java.io.ByteArrayOutputStream()
      labels.foreach { case (n, v) =>
        val one = new java.io.ByteArrayOutputStream()
        writeLen(one, 1, utf8(n))
        writeLen(one, 2, utf8(v))
        writeLen(lb, 1, one.toByteArray)
      }
      labelBytes = lb.toByteArray
      open = true
    }

    /** One float sample (timestamp order within the series). */
    def addSample(tsMs: Long, v: Double): Unit = {
      require(open, "no open series")
      sampleBuf += ((tsMs, v))
      if (sampleBuf.length == samplesPerChunk) flushSampleChunk()
    }

    /** One native-histogram sample (timestamp order within the series).
      * Upstream's appender rules: a schema or span-layout change cuts
      * the chunk, and so does a detected COUNTER RESET (count, zero
      * bucket, or any bucket dropping) — a reader must never see a
      * decrease inside one counter chunk. Each new chunk records WHY it
      * started in its reset-hint byte: 1 when the cut was a reset, 2
      * when the previous sample verifiably continues (a size cut or an
      * appendable layout), 0 for a fresh series or an ambiguous
      * relayout.
      */
    def addHist(h: Hist): Unit = {
      require(open, "no open series")
      // a GAUGE-type histogram (prompb reset_hint GAUGE) has no reset
      // semantics: values move both ways inside one chunk, and every
      // chunk carries the gauge hint — upstream's GaugeType chunks. A
      // sender-DECLARED reset (hint YES) cuts even when no drop is
      // detectable — a counter that reset and already grew past its
      // pre-reset totals shows no drop, and merging it would corrupt a
      // reader's increase()
      val gauge = h.resetHint == 3
      val declared = h.resetHint == 1
      // a gauge↔counter hint-type flip cuts the open chunk too — one
      // chunk must never mix gauge and counter semantics (upstream's
      // appender recreates the chunk on a hint-type change)
      if (histBuf.nonEmpty && ((histHint == 3) != gauge ||
          !HistogramChunk.appendable(histBuf.last, h) ||
          (!gauge && (declared || HistogramChunk.resets(histBuf.last, h)))))
        flushHistChunk()
      if (histBuf.isEmpty)
        histHint =
          if (gauge) 3
          else if (declared) 1 // sender knowledge survives a type flip
          else if (lastHist == null || lastHist.resetHint == 3) 0
          // ↑ fresh series, or the previous sample was gauge-typed —
          //   reset detection against a gauge value is meaningless
          else if (HistogramChunk.resets(lastHist, h)) 1
          else if (HistogramChunk.appendable(lastHist, h)) 2
          else 0
      histBuf += h
      lastHist = h
      if (histBuf.length == samplesPerChunk) flushHistChunk()
    }

    /** One FLOAT-form native-histogram sample — same appender rules,
      * FLOAT_HISTOGRAM (type 3) chunks.
      */
    def addFHist(h: FHist): Unit = {
      require(open, "no open series")
      val gauge = h.resetHint == 3
      val declared = h.resetHint == 1
      if (fhistBuf.nonEmpty && ((fhistHint == 3) != gauge ||
          !FloatHistogramChunk.appendable(fhistBuf.last, h) ||
          (!gauge && (declared || FloatHistogramChunk.resets(fhistBuf.last, h)))))
        flushFHistChunk()
      if (fhistBuf.isEmpty)
        fhistHint =
          if (gauge) 3
          else if (declared) 1
          else if (lastFHist == null || lastFHist.resetHint == 3) 0
          else if (FloatHistogramChunk.resets(lastFHist, h)) 1
          else if (FloatHistogramChunk.appendable(lastFHist, h)) 2
          else 0
      fhistBuf += h
      lastFHist = h
      if (fhistBuf.length == samplesPerChunk) flushFHistChunk()
    }

    def endSeries(): Unit = {
      require(open, "no open series")
      flushSampleChunk()
      flushHistChunk()
      flushFHistChunk()
      closeSeries()
      open = false
    }

    /** Flush the trailing frame. Call once, after the last series. */
    def finish(): Unit = {
      require(!open, "a series is still open")
      flushFrame()
      out.flush()
    }

    private def flushSampleChunk(): Unit = if (sampleBuf.nonEmpty) {
      addChunk(sampleBuf.head._1, sampleBuf.last._1, 1L,
        XorChunk.encode(sampleBuf.toSeq))
      sampleBuf.clear()
    }

    private def flushHistChunk(): Unit = if (histBuf.nonEmpty) {
      addChunk(histBuf.head.tsMs, histBuf.last.tsMs, 2L,
        HistogramChunk.encode(histBuf.toSeq, histHint))
      histBuf.clear()
    }

    private def flushFHistChunk(): Unit = if (fhistBuf.nonEmpty) {
      addChunk(fhistBuf.head.tsMs, fhistBuf.last.tsMs, 3L,
        FloatHistogramChunk.encode(fhistBuf.toSeq, fhistHint))
      fhistBuf.clear()
    }

    /** One closed chunk onto the open series; cut the frame if the
      * budget is spent (the series continues — labels repeat in the
      * next frame, upstream's mid-series split).
      */
    private def addChunk(minT: Long, maxT: Long, enc: Long,
        data: Array[Byte]): Unit = {
      val ch = new java.io.ByteArrayOutputStream()
      writeVarint(ch, (1L << 3) | 0L); writeVarint(ch, minT)
      writeVarint(ch, (2L << 3) | 0L); writeVarint(ch, maxT)
      writeVarint(ch, (3L << 3) | 0L); writeVarint(ch, enc)
      writeLen(ch, 4, data)
      writeLen(chunkFields, 2, ch.toByteArray)
      if (frame.size() + labelBytes.length + chunkFields.size() >= frameBytes) {
        closeSeries()
        flushFrame()
      }
    }

    private def closeSeries(): Unit = if (chunkFields.size() > 0) {
      val cs = new java.io.ByteArrayOutputStream()
      cs.write(labelBytes, 0, labelBytes.length)
      chunkFields.writeTo(cs)
      writeLen(frame, 1, cs.toByteArray)
      chunkFields.reset()
    }

    private def flushFrame(): Unit = if (frame.size() > 0) {
      val msg = new java.io.ByteArrayOutputStream()
      frame.writeTo(msg)
      if (frameQ != 0L) { // proto3 zero default omits
        writeVarint(msg, (2L << 3) | 0L); writeVarint(msg, frameQ)
      }
      val data = msg.toByteArray
      writeVarint(out, data.length.toLong)
      crc.reset(); crc.update(data, 0, data.length)
      val c = crc.getValue
      out.write(((c >> 24) & 0xFF).toInt); out.write(((c >> 16) & 0xFF).toInt)
      out.write(((c >> 8) & 0xFF).toInt); out.write((c & 0xFF).toInt)
      out.write(data, 0, data.length)
      frame.reset()
      framesWritten += 1
    }
  }

  /** Streamed response bytes, in memory — [[ChunkFrameWriter]] fed from
    * already-materialized series (gates, specs, small responses). The
    * door's bounded-memory path ([[prepareRead]]) produces identical
    * bytes for the same selection: same writer, same feed order.
    */
  def encodeStreamed(results: Seq[Seq[Series]],
      samplesPerChunk: Int = 120,
      frameBytes: Int = DefaultFrameBytes): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val w = new ChunkFrameWriter(out, samplesPerChunk, frameBytes)
    results.zipWithIndex.foreach { case (qr, qIdx) =>
      qr.foreach { s =>
        w.startSeries(s.labels, qIdx.toLong)
        s.samples.foreach { case (v, t) => w.addSample(t, v) }
        s.hists.foreach(w.addHist)
        s.fhists.foreach(w.addFHist)
        w.endSeries()
      }
    }
    w.finish()
    out.toByteArray
  }

  /** Decode a streamed response: frames → (query_index, series with
    * XOR/HISTOGRAM chunks re-expanded to samples), in frame order — a
    * frame may batch MANY series (field 1 is repeated), and a series
    * split across frames yields one entry per fragment (labels repeat;
    * [[fetch]] re-joins adjacent fragments by label identity). CRC
    * mismatch and unknown chunk encodings fail loud.
    */
  def walkStreamed(bytes: Array[Byte]): Seq[(Long, Series)] = {
    val c = new ProtoCursor(bytes)
    val crc = new java.util.zip.CRC32C()
    val out = Vector.newBuilder[(Long, Series)]
    while (c.has(c.end)) {
      val l0 = c.varint(c.end)
      if (l0 < 0 || l0 > c.end - c.pos - 4) fail("truncated frame")
      val len = l0.toInt
      val want = ((bytes(c.pos) & 0xFFL) << 24) |
        ((bytes(c.pos + 1) & 0xFFL) << 16) |
        ((bytes(c.pos + 2) & 0xFFL) << 8) | (bytes(c.pos + 3) & 0xFFL)
      c.pos += 4
      crc.reset(); crc.update(bytes, c.pos, len)
      if (crc.getValue != want) fail("frame checksum mismatch")
      val frameEnd = c.pos + len
      var qIdx = 0L
      val series = Vector.newBuilder[Series]
      while (c.has(frameEnd)) {
        val tag = c.varint(frameEnd)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) => // ChunkedSeries (repeated — batched frames)
            val csEnd = c.lenEnd(frameEnd)
            val labels = Vector.newBuilder[(String, String)]
            val samples = Vector.newBuilder[(Double, Long)]
            val hists = Vector.newBuilder[Hist]
            val fhists = Vector.newBuilder[FHist]
            while (c.has(csEnd)) {
              val t2 = c.varint(csEnd)
              ((t2 >> 3).toInt, (t2 & 7).toInt) match {
                case (1, 2) => // Label
                  val lEnd = c.lenEnd(csEnd)
                  var n = ""
                  var v = ""
                  while (c.has(lEnd)) {
                    val t3 = c.varint(lEnd)
                    ((t3 >> 3).toInt, (t3 & 7).toInt) match {
                      case (1, 2) => n = c.str(lEnd)
                      case (2, 2) => v = c.str(lEnd)
                      case (_, w) => c.skip(w, lEnd)
                    }
                  }
                  labels += ((n, v))
                case (2, 2) => // Chunk
                  val cEnd = c.lenEnd(csEnd)
                  var typ = 0L
                  var data: Array[Byte] = Array.empty
                  while (c.has(cEnd)) {
                    val t3 = c.varint(cEnd)
                    ((t3 >> 3).toInt, (t3 & 7).toInt) match {
                      case (3, 0) => typ = c.varint(cEnd)
                      case (4, 2) => data = c.chunk(cEnd)
                      case (_, w) => c.skip(w, cEnd) // min/max advisory
                    }
                  }
                  typ match {
                    case 1L =>
                      samples ++= XorChunk.decode(data)
                        .map { case (t, v) => (v, t) }
                    case 2L => hists ++= HistogramChunk.decode(data)
                    case 3L => fhists ++= FloatHistogramChunk.decode(data)
                    case t => fail(s"unsupported chunk encoding $t")
                  }
                case (_, w) => c.skip(w, csEnd)
              }
            }
            series += Series(labels.result(), samples.result(),
              hists.result(), fhists = fhists.result())
          case (2, 0) => qIdx = c.varint(frameEnd)
          case (_, w) => c.skip(w, frameEnd)
        }
      }
      series.result().foreach(s => out += ((qIdx, s)))
    }
    out.result()
  }

  /** A negotiated answer, fully materialized: `streamed` decides the
    * HTTP face (content-type `application/x-streamed-protobuf;
    * proto=prometheus.ChunkedReadResponse`, no snappy — vs the SAMPLES
    * face's snappy-framed `application/x-protobuf`). Gate/spec
    * convenience over [[prepareRead]] — the HTTP door streams instead.
    */
  final case class ReadAnswer(streamed: Boolean, body: Array[Byte])

  /** The full negotiated door, materialized in memory (gates, specs).
    * The bytes ARE the streaming path's: [[prepareRead]] writes into
    * the buffer.
    */
  def serveNegotiated(spark: SparkSession, dir: String,
      body: Array[Byte],
      recorded: Option[DataFrame] = None): ReadAnswer = {
    val p = prepareRead(spark, dir, body, recorded = recorded)
    val bos = new java.io.ByteArrayOutputStream()
    p.writeTo(bos)
    ReadAnswer(p.streamed, bos.toByteArray)
  }

  /** A validated, negotiated, budget-checked request, ready to serve:
    * everything that can fail with a clean status (400 malformed, 413
    * over budget) has already run, so the endpoint can commit response
    * headers before [[writeTo]] touches the socket.
    */
  sealed trait PreparedRead {
    def streamed: Boolean
    def writeTo(out: java.io.OutputStream): Unit
  }

  /** SAMPLES face: one snappy-framed protobuf message — the envelope
    * needs its length up front, so the body is materialized (bounded by
    * the sample budget the 413 already enforced).
    */
  final case class SamplesAnswer(body: Array[Byte]) extends PreparedRead {
    def streamed: Boolean = false
    def writeTo(out: java.io.OutputStream): Unit = out.write(body)
  }

  /** STREAMED face: frames leave as they are produced — [[writeTo]]
    * drives the frame writer from `toLocalIterator` over the
    * (series, ts)-ordered selection, so driver memory stays bounded by
    * one scan partition + one chunk + one frame no matter how broad the
    * matchers or how long the time range.
    */
  final class StreamedAnswer(run: java.io.OutputStream => Unit)
      extends PreparedRead {
    def streamed: Boolean = true
    def writeTo(out: java.io.OutputStream): Unit = run(out)
  }

  /** Validate + negotiate + budget-check one POST body. Throws
    * `IllegalArgumentException` (→ 400) on malformed bytes and
    * [[LimitExceeded]] (→ 413) when the selection is over
    * `sampleLimit` — BEFORE any response byte exists, so the refusal is
    * always a clean status, never a truncated stream.
    *
    * `hists`/`fhists` are OPTIONAL native-histogram sources (batch
    * relations in the [[RemoteWrite.decodeHist]]/
    * [[RemoteWrite.decodeFHist]] shape: a `labels` map + per-sample
    * wire fields) — a server configured with them serves matching
    * native families alongside the float series: as prompb
    * `histograms` on the SAMPLES face, as HISTOGRAM/FLOAT_HISTOGRAM
    * chunks on the streamed face. `recorded` is an OPTIONAL float
    * source in the labels-map shape (`labels`, `ts_ms`, double
    * `value`) — RECORDING-RULE series, the samples upstream's rule
    * loop writes into its TSDB and a long-term-storage reader pulls
    * out over this very door ([[graft.promql.Rules
    * .recordedSeriesRelation]] builds it from a rule). For all three,
    * matchers apply against the full label map (missing labels match
    * `""`), time bounds inclusively on the sample timestamps, and
    * every sample counts toward the same response budget.
    */
  def prepareRead(spark: SparkSession, dir: String, body: Array[Byte],
      sampleLimit: Long = DefaultSampleLimit,
      samplesPerChunk: Int = 120,
      frameBytes: Int = DefaultFrameBytes,
      hists: Option[DataFrame] = None,
      fhists: Option[DataFrame] = None,
      recorded: Option[DataFrame] = None,
      sampleBytesLimit: Long = DefaultSampleBytesLimit): PreparedRead = {
    val raw = RemoteWrite.uncompress(body)
    val queries = walkRequest(raw)
    val resType = negotiate(acceptedTypes(raw))
    // one (count, projected-bytes) aggregate per histogram source per
    // query — column-pruned scan (sample columns never read beyond the
    // bucket-array SIZE), map-side combined
    def histCountBytes(df: DataFrame, perBucket: Long): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(lit(32L) + lit(perBucket) *
          (size(col("deltas")) + size(col("neg_deltas"))).cast("long")),
          lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // the response budgets: cheap aggregates buy a clean 413 BEFORE any
    // response byte exists. The sample COUNT bounds BOTH faces (the
    // upstream read limit); the projected BYTES bound the SAMPLES face
    // only — it materializes the response as driver rows, where a
    // wide-histogram selection could allocate gigabytes under the
    // count, while the streamed face's memory is bounded regardless
    val perQuery = queries.map { q =>
      val flt = matched(spark, dir, q).count()
      val rec = recorded.map(r => matchedHists(r, q).count()).getOrElse(0L)
      val (hc, hb) = hists.map(h => histCountBytes(matchedHists(h, q), 3L))
        .getOrElse((0L, 0L))
      val (fc, fb) = fhists.map(h => histCountBytes(matchedHists(h, q), 9L))
        .getOrElse((0L, 0L))
      (flt + rec + hc + fc, (flt + rec) * 16L + hb + fb)
    }
    val total = perQuery.map(_._1).sum
    if (total > sampleLimit) throw new LimitExceeded(
      s"query would return $total samples, over the $sampleLimit limit")
    val totalBytes = perQuery.map(_._2).sum
    if (resType != 1L && totalBytes > sampleBytesLimit)
      throw new LimitExceeded(
        s"query would materialize ~$totalBytes response bytes on the " +
          s"SAMPLES face, over the $sampleBytesLimit limit; the " +
          "STREAMED_XOR_CHUNKS response type serves this selection " +
          "with bounded memory")
    if (resType == 1L)
      new StreamedAnswer(out => {
        val w = new ChunkFrameWriter(out, samplesPerChunk, frameBytes)
        queries.zipWithIndex.foreach { case (q, qi) =>
          // upstream returns each query's series sorted by labels, and
          // strict clients merge-join or binary-search on that order —
          // so the four sources (raw floats, recorded rules, integer +
          // float native families) MERGE into one label-ordered
          // sequence instead of appending per kind. Each source arrives
          // label-ordered from its own distributed sort; the k-way
          // merge on the shared NUL-separated key needs one row of
          // lookahead per source, preserving the bounded-driver-memory
          // discipline
          val srcs: Seq[SeriesSource] =
            Seq(rawSource(spark, dir, q)) ++
              recorded.map(r => floatRowsSource(matchedHists(r, q))) ++
              hists.map(h =>
                histRowsSource(matchedHists(h, q), isFloat = false)) ++
              fhists.map(h =>
                histRowsSource(matchedHists(h, q), isFloat = true))
          var live = srcs.filter(_.peekKey.isDefined)
          while (live.nonEmpty) {
            live.minBy(_.peekKey.get).emitNext(w, qi.toLong)
            live = srcs.filter(_.peekKey.isDefined)
          }
        }
        w.finish()
      })
    else
      SamplesAnswer(RemoteWrite.compress(encodeResponse(
        queries.map { q =>
          // the same global label order as the streamed face (sortBy is
          // stable, so an exact-tie series keeps the source precedence
          // the merge's minBy picks)
          (seriesFor(spark, dir, q) ++
            recorded.map(r => floatSeriesFor(matchedHists(r, q)))
              .getOrElse(Nil) ++
            hists.map(h => histSeriesFor(matchedHists(h, q),
              isFloat = false)).getOrElse(Nil) ++
            fhists.map(h => histSeriesFor(matchedHists(h, q),
              isFloat = true)).getOrElse(Nil))
            .sortBy(s => labelSortKey(s.labels))
        })))
  }

  /** The canonical label sort key: name-sorted `(name, value)` pairs
    * joined with NUL. NUL sorts below every other byte, so plain string
    * order on these keys equals upstream's lexicographic label-pair
    * comparison (`labels.Compare` — name, then value, shorter label
    * set first on a shared prefix). [[matchedHists]]' `_skey` column
    * and [[rawSkey]] build the identical form relationally, so the
    * per-source distributed sorts and the driver-side merge all speak
    * one ordering.
    */
  private def labelSortKey(labels: Seq[(String, String)]): String =
    labels.map { case (n, v) => n + "\u0000" + v }.mkString("\u0000")

  /** The histogram samples one query selects from a labels-map source:
    * matchers against the map with the missing-label-matches-`""` rule,
    * inclusive time bounds, plus a canonical series key (name-sorted
    * `n=v` pairs, empty values dropped — upstream's series identity)
    * for deterministic grouping and ordering.
    */
  private def matchedHists(src: DataFrame, q: ReadQuery): DataFrame = {
    val pred = q.matchers.map { m =>
      val c = coalesce(element_at(col("labels"), m.name), lit(""))
      m.op match {
        case 0 => c === m.value
        case 1 => c =!= m.value
        case 2 => c.rlike(s"^(?:${m.value})$$")
        case 3 => !c.rlike(s"^(?:${m.value})$$")
      }
    }.reduce(_ && _)
    src.filter(pred && col("ts_ms") >= q.startMs && col("ts_ms") <= q.endMs)
      .withColumn("_skey", concat_ws("\u0000",
        transform(
          array_sort(filter(map_entries(col("labels")),
            e => e.getField("value") =!= "")),
          e => concat_ws("\u0000", e.getField("key"),
            e.getField("value")))))
  }

  private def histRowLabels(r: org.apache.spark.sql.Row)
      : Vector[(String, String)] =
    r.getMap[String, String](r.fieldIndex("labels")).toVector
      .filter(_._2.nonEmpty).sortBy(_._1)

  /** A histogram source MAY carry an integer `reset_hint` column (the
    * prompb enum: 3 = GAUGE) — without it the serving path treats the
    * family as an unknown-reset counter, so a gauge family pushed into
    * a hint-less relation would get WRONG counter-reset chunk cuts.
    */
  private def rowResetHint(r: org.apache.spark.sql.Row): Int = {
    val i = r.schema.fieldNames.indexOf("reset_hint")
    if (i < 0 || r.isNullAt(i)) 0 else r.getInt(i)
  }

  private def rowHist(r: org.apache.spark.sql.Row): Hist =
    Hist(r.getLong(r.fieldIndex("ts_ms")), r.getInt(r.fieldIndex("schema")),
      r.getSeq[Int](r.fieldIndex("offs")).toVector,
      r.getSeq[Int](r.fieldIndex("lens")).toVector,
      r.getSeq[Long](r.fieldIndex("deltas")).toVector,
      r.getLong(r.fieldIndex("count")),
      r.getDouble(r.fieldIndex("sum")),
      r.getLong(r.fieldIndex("zero_count")),
      r.getSeq[Int](r.fieldIndex("neg_offs")).toVector,
      r.getSeq[Int](r.fieldIndex("neg_lens")).toVector,
      r.getSeq[Long](r.fieldIndex("neg_deltas")).toVector,
      rowResetHint(r))

  private def rowFHist(r: org.apache.spark.sql.Row): FHist =
    FHist(r.getLong(r.fieldIndex("ts_ms")), r.getInt(r.fieldIndex("schema")),
      r.getSeq[Int](r.fieldIndex("offs")).toVector,
      r.getSeq[Int](r.fieldIndex("lens")).toVector,
      r.getSeq[Double](r.fieldIndex("deltas")).toVector,
      r.getDouble(r.fieldIndex("count")),
      r.getDouble(r.fieldIndex("sum")),
      r.getDouble(r.fieldIndex("zero_count")),
      r.getSeq[Int](r.fieldIndex("neg_offs")).toVector,
      r.getSeq[Int](r.fieldIndex("neg_lens")).toVector,
      r.getSeq[Double](r.fieldIndex("neg_deltas")).toVector,
      rowResetHint(r))

  /** One label-ordered per-series stream feeding the response merge.
    * Rows arrive (`_skey`, ts)-ordered through `toLocalIterator` (one
    * scan partition on the driver at a time — the distributed sort
    * already ran); `peekKey` exposes the NEXT series' sort key without
    * consuming it, `emitNext` writes that one whole series through the
    * frame writer and advances. The k-way merge in [[prepareRead]]
    * interleaves the four sources in global label order with one row
    * of lookahead per source — no extra materialization.
    */
  private final class SeriesSource(
      rows: Iterator[org.apache.spark.sql.Row],
      skeyOf: org.apache.spark.sql.Row => String,
      labelsOf: org.apache.spark.sql.Row => Vector[(String, String)],
      add: (ChunkFrameWriter, org.apache.spark.sql.Row) => Unit) {
    private val it = rows.buffered
    def peekKey: Option[String] =
      if (it.hasNext) Some(skeyOf(it.head)) else None
    def emitNext(w: ChunkFrameWriter, qIdx: Long): Unit = {
      val key = skeyOf(it.head)
      w.startSeries(labelsOf(it.head), qIdx)
      while (it.hasNext && skeyOf(it.head) == key) add(w, it.next())
      w.endSeries()
    }
  }

  private def scalaRows(df: DataFrame)
      : Iterator[org.apache.spark.sql.Row] = {
    val it = df.toLocalIterator()
    new Iterator[org.apache.spark.sql.Row] {
      def hasNext: Boolean = it.hasNext
      def next(): org.apache.spark.sql.Row = it.next()
    }
  }

  /** Matched histogram rows (labels-map shape) as a label-ordered
    * [[SeriesSource]] of HISTOGRAM / FLOAT_HISTOGRAM chunks.
    */
  private def histRowsSource(m: DataFrame, isFloat: Boolean): SeriesSource =
    new SeriesSource(
      scalaRows(m.orderBy(col("_skey"), col("ts_ms"))),
      r => r.getString(r.fieldIndex("_skey")),
      histRowLabels,
      (w, r) => if (isFloat) w.addFHist(rowFHist(r)) else w.addHist(rowHist(r)))

  /** Matched histogram rows as materialized [[Series]] — the SAMPLES
    * face's form (prompb `histograms`), bounded by the 413 budget.
    */
  private def histSeriesFor(m: DataFrame, isFloat: Boolean): Seq[Series] =
    m.collect()
      .groupBy(r => r.getString(r.fieldIndex("_skey")))
      .toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        val sorted = rs.sortBy(r => r.getLong(r.fieldIndex("ts_ms")))
        if (isFloat)
          Series(histRowLabels(sorted.head), Vector.empty,
            fhists = sorted.map(rowFHist).toVector)
        else
          Series(histRowLabels(sorted.head), Vector.empty,
            hists = sorted.map(rowHist).toVector)
      }

  /** Matched FLOAT rows from a labels-map source (recording-rule
    * series) as a label-ordered [[SeriesSource]] of XOR sample chunks —
    * rule outputs stream like any other float series.
    */
  private def floatRowsSource(m: DataFrame): SeriesSource =
    new SeriesSource(
      scalaRows(m.orderBy(col("_skey"), col("ts_ms"), col("value"))),
      r => r.getString(r.fieldIndex("_skey")),
      histRowLabels,
      (w, r) => w.addSample(r.getLong(r.fieldIndex("ts_ms")),
        r.getDouble(r.fieldIndex("value"))))

  /** Matched float rows from a labels-map source as materialized
    * [[Series]] — the SAMPLES face's form, bounded by the 413 budget.
    */
  private def floatSeriesFor(m: DataFrame): Seq[Series] =
    m.collect()
      .groupBy(r => r.getString(r.fieldIndex("_skey")))
      .toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        Series(histRowLabels(rs.head),
          rs.map(r => (r.getDouble(r.fieldIndex("value")),
            r.getLong(r.fieldIndex("ts_ms"))))
            .sortBy { case (v, t) => (t, v) }.toVector)
      }

  /** `_skey` for the raw wire relation: the same NUL-separated form as
    * [[matchedHists]] over its fixed label set (`__name__`, `instance`,
    * `k`), empty values dropped — so the raw source's distributed sort
    * and the labels-map sources' agree on one global series order.
    */
  private def rawSkey: Column = concat_ws("\u0000", flatten(filter(
    array(
      array(lit("__name__"), col("wire_name")),
      array(lit("instance"), col("instance")),
      array(lit("k"), col("k"))),
    a => element_at(a, 2) =!= "")))

  /** One query's raw float selection as a label-ordered
    * [[SeriesSource]]: the matched relation, ordered by (series key,
    * ts) so each series' rows arrive contiguous and in time order,
    * walks through `toLocalIterator` — Spark materializes one
    * partition at a time on the driver (the ordering shuffle ran
    * distributed; partitions are range-split by the same key). The r14
    * scale defect — collecting the whole selection before encoding —
    * stays closed by construction.
    */
  private def rawSource(spark: SparkSession, dir: String,
      q: ReadQuery): SeriesSource =
    new SeriesSource(
      scalaRows(matched(spark, dir, q).withColumn("_skey", rawSkey)
        .orderBy(col("_skey"), col("ts_ms"), col("value"))),
      r => r.getString(r.fieldIndex("_skey")),
      r => Vector(
        "__name__" -> r.getString(r.fieldIndex("wire_name")),
        "instance" -> r.getString(r.fieldIndex("instance")),
        "k" -> r.getString(r.fieldIndex("k"))).filter(_._2.nonEmpty),
      (w, r) => w.addSample(r.getLong(r.fieldIndex("ts_ms")),
        r.getDouble(r.fieldIndex("value"))))

  // ---- the evaluator: queries → sample relation / wire series ----

  /** The corpus as the remote-read wire vocabulary — one row per
    * sample: `wire_name` (exposition `_total` convention, shared with
    * the remote-write sender), `instance`, `k`, `ts_ms`, double
    * `value`. Pure projection over the tombstone-respecting events
    * view; everything stays a column expression until the serving
    * layer iterates (streamed) or collects (SAMPLES) the response.
    */
  private[graft] def sampleRelation(spark: SparkSession,
      dir: String): DataFrame =
    graft.operators.Metrics.metricEvents(spark, dir).select(
      concat(col("name"),
        when(col("kind") === "counter", "_total").otherwise(""))
        .as("wire_name"),
      col("label_instance").as("instance"),
      coalesce(col("label_k"), lit("")).as("k"),
      unix_millis(col("ts")).as("ts_ms"),
      col("value").cast("double").as("value"))

  /** One matcher as a column predicate over the wire labels. A label
    * this engine's series never carry matches as the empty string —
    * upstream's missing-label rule (so `{foo=""}` matches everything
    * and `{foo!=""}` nothing).
    */
  private def matcherCol(m: Matcher): Column = {
    val c = m.name match {
      case "__name__" => col("wire_name")
      case "instance" => col("instance")
      case "k" => col("k")
      case _ => lit("")
    }
    m.op match {
      case 0 => c === m.value
      case 1 => c =!= m.value
      case 2 => c.rlike(s"^(?:${m.value})$$")
      case 3 => !c.rlike(s"^(?:${m.value})$$")
    }
  }

  /** The samples one query selects, as a relation (matchers AND
    * inclusive time bounds — upstream's select semantics).
    */
  private[graft] def matched(spark: SparkSession, dir: String,
      q: ReadQuery): DataFrame =
    sampleRelation(spark, dir).filter(
      q.matchers.map(matcherCol).reduce(_ && _) &&
        col("ts_ms") >= q.startMs && col("ts_ms") <= q.endMs)

  /** One query's response frame, materialized: matched samples grouped
    * per series (labels name-sorted, empty values dropped; samples in
    * timestamp order), series in [[labelSortKey]] order — deterministic
    * bytes for any partitioning, and the SAME order [[rawSource]]'s
    * walk feeds the merge, so the two faces describe one selection.
    * SAMPLES-face only (its protobuf envelope is a single message); the
    * streamed face never calls this.
    */
  def seriesFor(spark: SparkSession, dir: String,
      q: ReadQuery): Seq[Series] =
    matched(spark, dir, q)
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq
      .map { case ((n, inst, k), rs) =>
        val labels = (Vector("__name__" -> n, "instance" -> inst,
          "k" -> k)).filter(_._2.nonEmpty)
        Series(labels,
          rs.map(r => (r.getDouble(4), r.getLong(3)))
            .sortBy { case (v, t) => (t, v) }.toVector)
      }
      .sortBy(s => labelSortKey(s.labels))

  /** The CLIENT half: POST one query to a remote-read endpoint and
    * decode its frame — what a federating deployment (or the read ∘
    * write round-trip spec) drives. `streamed = true` advertises
    * STREAMED_XOR_CHUNKS first (a Thanos querier's default); either
    * way the decode branches on the server's answering content type,
    * so a SAMPLES-only server still interoperates. A series the server
    * split across frames re-joins by adjacent label identity.
    */
  def fetch(url: String, q: ReadQuery, streamed: Boolean = false): Seq[Series] = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-protobuf")
    conn.setRequestProperty("Content-Encoding", "snappy")
    try {
      val os = conn.getOutputStream
      try os.write(RemoteWrite.compress(encodeRequest(Seq(q),
        if (streamed) Seq(1L, 0L) else Seq(0L))))
      finally os.close()
      require(conn.getResponseCode / 100 == 2,
        s"remote read failed: HTTP ${conn.getResponseCode}")
      val body = conn.getInputStream.readAllBytes()
      if (Option(conn.getHeaderField("Content-Type"))
          .exists(_.contains("ChunkedReadResponse")))
        walkStreamed(body).collect { case (0L, s) => s }
          .foldLeft(Vector.empty[Series]) { (acc, s) =>
            if (acc.nonEmpty && acc.last.labels == s.labels)
              acc.init :+ acc.last.copy(
                samples = acc.last.samples ++ s.samples,
                hists = acc.last.hists ++ s.hists,
                fhists = acc.last.fhists ++ s.fhists)
            else acc :+ s
          }
      else
        walkResponse(RemoteWrite.uncompress(body)).headOption.getOrElse(Nil)
    } finally conn.disconnect()
  }

  // ---- native-histogram families over the streamed face ----

  /** Stream a native-histogram SAMPLE relation (the remote-write tier's
    * decoded `Hist` rows — [[RemoteWriteSink.histograms]] flattened to
    * the columns below) through the chunked face as HISTOGRAM (type 2)
    * chunks, so a Thanos-style reader can pull this engine's native
    * families as chunks (the r14 bound — "XOR chunks only" — lifted).
    * Same bounded-memory discipline as [[rawSource]]: the relation
    * orders by (series, ts) and walks `toLocalIterator`; a schema or
    * span-layout change cuts the chunk (upstream's appender rule),
    * handled inside the frame writer.
    *
    * Expected columns: `metric, label_k, ts_ms, schema, count, sum,
    * zero_count, offs, lens, deltas, neg_offs, neg_lens, neg_deltas`.
    */
  def streamHists(hists: DataFrame, out: java.io.OutputStream,
      samplesPerChunk: Int = 120,
      frameBytes: Int = DefaultFrameBytes): Unit = {
    val w = new ChunkFrameWriter(out, samplesPerChunk, frameBytes)
    val it = hists.select(col("metric"), col("label_k"), col("ts_ms"),
      col("schema"), col("count"), col("sum"), col("zero_count"),
      col("offs"), col("lens"), col("deltas"),
      col("neg_offs"), col("neg_lens"), col("neg_deltas"))
      .orderBy(col("metric"), col("label_k"), col("ts_ms"))
      .toLocalIterator()
    var cur: (String, String) = null
    while (it.hasNext) {
      val r = it.next()
      val key = (r.getString(0), r.getString(1))
      if (key != cur) {
        if (cur != null) w.endSeries()
        w.startSeries(Vector("__name__" -> key._1, "k" -> key._2)
          .filter(_._2.nonEmpty), 0L)
        cur = key
      }
      w.addHist(Hist(r.getLong(2), r.getInt(3),
        r.getSeq[Int](7).toVector, r.getSeq[Int](8).toVector,
        r.getSeq[Long](9).toVector, r.getLong(4), r.getDouble(5),
        r.getLong(6), r.getSeq[Int](10).toVector,
        r.getSeq[Int](11).toVector, r.getSeq[Long](12).toVector))
    }
    if (cur != null) w.endSeries()
    w.finish()
  }

  /** a1x — the native-histogram CHUNK gate: a family of native
    * histogram samples (two series; one changes its span layout
    * mid-series, forcing the appender's chunk cut; one observes on both
    * sides of zero, exercising the negative ladder; timestamps step
    * regularly, exercising the dod-0 arm; counts/sums move, exercising
    * the delta and sum-XOR arms) served through the STREAMED face as
    * HISTOGRAM (type 2) chunks via the bounded-memory
    * [[streamHists]] walk, decoded back by the client half, and walked
    * to ABSOLUTE bucket counts by the engine's shared span decode
    * ([[graft.operators.Metrics.decodeWireSpans]], both bucket signs).
    * The DuckDB oracle is the bucket relation derived BY HAND from the
    * sample definitions — so the gate hash-fails if the chunk codec
    * drifts a single timestamp, count, sum bit, span, or delta, on
    * either side of zero, across a chunk cut, or in the frame walk.
    */
  def wireReadHistGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // (metric, k, ts, schema, count, sum, zcnt, offs, lens, deltas,
    //  negOffs, negLens, negDeltas) — series "a" keeps layout
    // [(0,2),(3,2)] for three samples (one chunk: uvarint tDelta then
    // dod 0), then switches to [(0,3)] (the cut); series "b" at a
    // different schema carries negative buckets.
    val samples = Seq(
      ("req_ms", "a", 1000L, 3, 13L, 7.5, 2L,
        Seq(0, 3), Seq(2, 2), Seq(3L, -1L, 2L, 0L),
        Seq.empty[Int], Seq.empty[Int], Seq.empty[Long]),
      ("req_ms", "a", 61000L, 3, 21L, 12.25, 3L,
        Seq(0, 3), Seq(2, 2), Seq(5L, -2L, 3L, -1L),
        Seq.empty[Int], Seq.empty[Int], Seq.empty[Long]),
      ("req_ms", "a", 121000L, 3, 30L, 20.5, 3L,
        Seq(0, 3), Seq(2, 2), Seq(6L, -2L, 3L, 0L),
        Seq.empty[Int], Seq.empty[Int], Seq.empty[Long]),
      ("req_ms", "a", 181000L, 3, 35L, 22.0, 4L,
        Seq(0), Seq(3), Seq(6L, 0L, -2L),
        Seq.empty[Int], Seq.empty[Int], Seq.empty[Long]),
      ("req_ms", "b", 2000L, 2, 9L, -1.5, 1L,
        Seq(-2), Seq(1), Seq(7L),
        Seq(1), Seq(2), Seq(2L, 1L)),
      ("req_ms", "b", 62000L, 2, 14L, -2.25, 2L,
        Seq(-2), Seq(1), Seq(9L),
        Seq(1), Seq(2), Seq(2L, 2L)))
    val df = samples.toDF("metric", "label_k", "ts_ms", "schema", "count",
      "sum", "zero_count", "offs", "lens", "deltas", "neg_offs",
      "neg_lens", "neg_deltas")
    val bos = new java.io.ByteArrayOutputStream()
    streamHists(df, bos)
    val rows = walkStreamed(bos.toByteArray).flatMap { case (_, s) =>
      val lm = s.labels.toMap
      s.hists.map { h =>
        (lm.getOrElse("__name__", ""), lm.getOrElse("k", ""), h.tsMs,
          h.schema, h.count, h.sum, h.zeroCount, h.offs, h.lens, h.deltas,
          h.negOffs, h.negLens, h.negDeltas)
      }
    }
    val decoded = rows.toDF("metric", "label_k", "ts_ms", "schema",
      "count", "sum", "zero_count", "offs", "lens", "deltas", "neg_offs",
      "neg_lens", "neg_deltas")
    val keys = Seq("metric", "label_k", "ts_ms", "schema", "count", "sum",
      "zero_count")
    val pos = graft.operators.Metrics.decodeWireSpans(decoded, keys)
      .withColumn("side", lit(1))
    val neg = graft.operators.Metrics.decodeWireSpans(
      decoded.select(keys.map(col) :+ col("neg_offs").as("offs") :+
        col("neg_lens").as("lens") :+ col("neg_deltas").as("deltas"): _*),
      keys).withColumn("side", lit(0))
    pos.unionByName(neg)
      .select(col("metric"), col("label_k"), col("ts_ms"), col("schema"),
        col("count"), col("sum"), col("zero_count"), col("side"),
        col("bucket"), col("bucket_count"))
      .orderBy(col("metric"), col("label_k"), col("ts_ms"), col("side"),
        col("bucket"))
  }

  /** Oracle twin of [[wireReadHistGate]]: the bucket relation derived
    * BY HAND from the sample definitions (series "a": span 2 anchors at
    * exclusive end 2 + offset 3 = 5; delta chains prefix-sum; series
    * "b": negative side walks its own spans) — doubles as quoted
    * strings, the correctly-rounded convention.
    */
  lazy val WireReadHistGateSql: String =
    """SELECT * FROM (VALUES
      |  ('req_ms', 'a', CAST(1000 AS BIGINT), 3, CAST(13 AS BIGINT), CAST('7.5' AS DOUBLE), CAST(2 AS BIGINT), 1, 0, CAST(3 AS BIGINT)),
      |  ('req_ms', 'a', 1000, 3, 13, CAST('7.5' AS DOUBLE), 2, 1, 1, 2),
      |  ('req_ms', 'a', 1000, 3, 13, CAST('7.5' AS DOUBLE), 2, 1, 5, 4),
      |  ('req_ms', 'a', 1000, 3, 13, CAST('7.5' AS DOUBLE), 2, 1, 6, 4),
      |  ('req_ms', 'a', 61000, 3, 21, CAST('12.25' AS DOUBLE), 3, 1, 0, 5),
      |  ('req_ms', 'a', 61000, 3, 21, CAST('12.25' AS DOUBLE), 3, 1, 1, 3),
      |  ('req_ms', 'a', 61000, 3, 21, CAST('12.25' AS DOUBLE), 3, 1, 5, 6),
      |  ('req_ms', 'a', 61000, 3, 21, CAST('12.25' AS DOUBLE), 3, 1, 6, 5),
      |  ('req_ms', 'a', 121000, 3, 30, CAST('20.5' AS DOUBLE), 3, 1, 0, 6),
      |  ('req_ms', 'a', 121000, 3, 30, CAST('20.5' AS DOUBLE), 3, 1, 1, 4),
      |  ('req_ms', 'a', 121000, 3, 30, CAST('20.5' AS DOUBLE), 3, 1, 5, 7),
      |  ('req_ms', 'a', 121000, 3, 30, CAST('20.5' AS DOUBLE), 3, 1, 6, 7),
      |  ('req_ms', 'a', 181000, 3, 35, CAST('22.0' AS DOUBLE), 4, 1, 0, 6),
      |  ('req_ms', 'a', 181000, 3, 35, CAST('22.0' AS DOUBLE), 4, 1, 1, 6),
      |  ('req_ms', 'a', 181000, 3, 35, CAST('22.0' AS DOUBLE), 4, 1, 2, 4),
      |  ('req_ms', 'b', 2000, 2, 9, CAST('-1.5' AS DOUBLE), 1, 0, 1, 2),
      |  ('req_ms', 'b', 2000, 2, 9, CAST('-1.5' AS DOUBLE), 1, 0, 2, 3),
      |  ('req_ms', 'b', 2000, 2, 9, CAST('-1.5' AS DOUBLE), 1, 1, -2, 7),
      |  ('req_ms', 'b', 62000, 2, 14, CAST('-2.25' AS DOUBLE), 2, 0, 1, 2),
      |  ('req_ms', 'b', 62000, 2, 14, CAST('-2.25' AS DOUBLE), 2, 0, 2, 4),
      |  ('req_ms', 'b', 62000, 2, 14, CAST('-2.25' AS DOUBLE), 2, 1, -2, 9)
      |) t(metric, label_k, ts_ms, schema, count, sum, zero_count, side, bucket, bucket_count)
      |ORDER BY metric, label_k, ts_ms, side, bucket""".stripMargin

  /** The FLOAT twin of [[streamHists]]: a float-histogram SAMPLE
    * relation (absolute double bucket counts — prompb's
    * `positive_counts` form) streamed as FLOAT_HISTOGRAM (type 3)
    * chunks through the same bounded-memory `toLocalIterator` walk.
    * Expected columns: `metric, label_k, ts_ms, schema, count, sum,
    * zero_count, offs, lens, counts, neg_offs, neg_lens, neg_counts`
    * (count/zero_count/counts/neg_counts double-typed).
    */
  def streamFHists(hists: DataFrame, out: java.io.OutputStream,
      samplesPerChunk: Int = 120,
      frameBytes: Int = DefaultFrameBytes): Unit = {
    val w = new ChunkFrameWriter(out, samplesPerChunk, frameBytes)
    val it = hists.select(col("metric"), col("label_k"), col("ts_ms"),
      col("schema"), col("count"), col("sum"), col("zero_count"),
      col("offs"), col("lens"), col("counts"),
      col("neg_offs"), col("neg_lens"), col("neg_counts"))
      .orderBy(col("metric"), col("label_k"), col("ts_ms"))
      .toLocalIterator()
    var cur: (String, String) = null
    while (it.hasNext) {
      val r = it.next()
      val key = (r.getString(0), r.getString(1))
      if (key != cur) {
        if (cur != null) w.endSeries()
        w.startSeries(Vector("__name__" -> key._1, "k" -> key._2)
          .filter(_._2.nonEmpty), 0L)
        cur = key
      }
      w.addFHist(FHist(r.getLong(2), r.getInt(3),
        r.getSeq[Int](7).toVector, r.getSeq[Int](8).toVector,
        r.getSeq[Double](9).toVector, r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getSeq[Int](10).toVector,
        r.getSeq[Int](11).toVector, r.getSeq[Double](12).toVector))
    }
    if (cur != null) w.endSeries()
    w.finish()
  }

  /** a1y — the FLOAT-histogram chunk gate (a1x's type-3 twin): a family
    * whose counts are no longer whole (the sample kind an aggregating
    * sender produces — fractional bucket mass), one series changing its
    * span layout mid-stream (the chunk cut), one observing on both
    * sides of zero at a different schema, served as FLOAT_HISTOGRAM
    * chunks via [[streamFHists]], decoded back, and position-walked to
    * absolute buckets by the shared span decode in ABSOLUTE mode
    * (float wire counts are not delta chains). Oracle: the hand-derived
    * bucket relation; counts are dyadic doubles so the XOR windows and
    * the relational walk must both be bit-exact.
    */
  def wireReadFloatHistGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val samples = Seq(
      ("rate_ms", "a", 1000L, 3, 5.25, 3.5, 1.0,
        Seq(0, 3), Seq(2, 1), Seq(1.5, 2.25, 0.5),
        Seq.empty[Int], Seq.empty[Int], Seq.empty[Double]),
      ("rate_ms", "a", 61000L, 3, 7.25, 5.25, 2.0,
        Seq(0, 3), Seq(2, 1), Seq(2.0, 2.25, 1.0),
        Seq.empty[Int], Seq.empty[Int], Seq.empty[Double]),
      ("rate_ms", "a", 121000L, 3, 6.0, 7.5, 2.0,
        Seq(0), Seq(1), Seq(4.0),
        Seq.empty[Int], Seq.empty[Int], Seq.empty[Double]),
      ("rate_ms", "b", 2000L, 0, 3.5, -0.5, 1.0,
        Seq(-1), Seq(1), Seq(0.75),
        Seq(0), Seq(2), Seq(1.25, 0.5)),
      ("rate_ms", "b", 62000L, 0, 4.75, -1.0, 1.0,
        Seq(-1), Seq(1), Seq(1.0),
        Seq(0), Seq(2), Seq(1.25, 1.5)))
    val df = samples.toDF("metric", "label_k", "ts_ms", "schema", "count",
      "sum", "zero_count", "offs", "lens", "counts", "neg_offs",
      "neg_lens", "neg_counts")
    val bos = new java.io.ByteArrayOutputStream()
    streamFHists(df, bos)
    val rows = walkStreamed(bos.toByteArray).flatMap { case (_, s) =>
      val lm = s.labels.toMap
      s.fhists.map { h =>
        (lm.getOrElse("__name__", ""), lm.getOrElse("k", ""), h.tsMs,
          h.schema, h.count, h.sum, h.zeroCount, h.offs, h.lens, h.counts,
          h.negOffs, h.negLens, h.negCounts)
      }
    }
    val decoded = rows.toDF("metric", "label_k", "ts_ms", "schema",
      "count", "sum", "zero_count", "offs", "lens", "deltas", "neg_offs",
      "neg_lens", "neg_deltas")
    val keys = Seq("metric", "label_k", "ts_ms", "schema", "count", "sum",
      "zero_count")
    val pos = graft.operators.Metrics
      .decodeWireSpans(decoded, keys, absolute = true)
      .withColumn("side", lit(1))
    val neg = graft.operators.Metrics.decodeWireSpans(
      decoded.select(keys.map(col) :+ col("neg_offs").as("offs") :+
        col("neg_lens").as("lens") :+ col("neg_deltas").as("deltas"): _*),
      keys, absolute = true).withColumn("side", lit(0))
    pos.unionByName(neg)
      .select(col("metric"), col("label_k"), col("ts_ms"), col("schema"),
        col("count"), col("sum"), col("zero_count"), col("side"),
        col("bucket"), col("bucket_count"))
      .orderBy(col("metric"), col("label_k"), col("ts_ms"), col("side"),
        col("bucket"))
  }

  /** Oracle twin of [[wireReadFloatHistGate]]: the bucket relation
    * derived BY HAND (series "a": span 2 anchors at exclusive end 2 +
    * offset 3 = 5; float counts are ABSOLUTE, no prefix sums; series
    * "b": negative side walks its own spans).
    */
  lazy val WireReadFloatHistGateSql: String =
    """SELECT * FROM (VALUES
      |  ('rate_ms', 'a', CAST(1000 AS BIGINT), 3, CAST('5.25' AS DOUBLE), CAST('3.5' AS DOUBLE), CAST('1.0' AS DOUBLE), 1, 0, CAST('1.5' AS DOUBLE)),
      |  ('rate_ms', 'a', 1000, 3, CAST('5.25' AS DOUBLE), CAST('3.5' AS DOUBLE), CAST('1.0' AS DOUBLE), 1, 1, CAST('2.25' AS DOUBLE)),
      |  ('rate_ms', 'a', 1000, 3, CAST('5.25' AS DOUBLE), CAST('3.5' AS DOUBLE), CAST('1.0' AS DOUBLE), 1, 5, CAST('0.5' AS DOUBLE)),
      |  ('rate_ms', 'a', 61000, 3, CAST('7.25' AS DOUBLE), CAST('5.25' AS DOUBLE), CAST('2.0' AS DOUBLE), 1, 0, CAST('2.0' AS DOUBLE)),
      |  ('rate_ms', 'a', 61000, 3, CAST('7.25' AS DOUBLE), CAST('5.25' AS DOUBLE), CAST('2.0' AS DOUBLE), 1, 1, CAST('2.25' AS DOUBLE)),
      |  ('rate_ms', 'a', 61000, 3, CAST('7.25' AS DOUBLE), CAST('5.25' AS DOUBLE), CAST('2.0' AS DOUBLE), 1, 5, CAST('1.0' AS DOUBLE)),
      |  ('rate_ms', 'a', 121000, 3, CAST('6.0' AS DOUBLE), CAST('7.5' AS DOUBLE), CAST('2.0' AS DOUBLE), 1, 0, CAST('4.0' AS DOUBLE)),
      |  ('rate_ms', 'b', 2000, 0, CAST('3.5' AS DOUBLE), CAST('-0.5' AS DOUBLE), CAST('1.0' AS DOUBLE), 0, 0, CAST('1.25' AS DOUBLE)),
      |  ('rate_ms', 'b', 2000, 0, CAST('3.5' AS DOUBLE), CAST('-0.5' AS DOUBLE), CAST('1.0' AS DOUBLE), 0, 1, CAST('0.5' AS DOUBLE)),
      |  ('rate_ms', 'b', 2000, 0, CAST('3.5' AS DOUBLE), CAST('-0.5' AS DOUBLE), CAST('1.0' AS DOUBLE), 1, -1, CAST('0.75' AS DOUBLE)),
      |  ('rate_ms', 'b', 62000, 0, CAST('4.75' AS DOUBLE), CAST('-1.0' AS DOUBLE), CAST('1.0' AS DOUBLE), 0, 0, CAST('1.25' AS DOUBLE)),
      |  ('rate_ms', 'b', 62000, 0, CAST('4.75' AS DOUBLE), CAST('-1.0' AS DOUBLE), CAST('1.0' AS DOUBLE), 0, 1, CAST('1.5' AS DOUBLE)),
      |  ('rate_ms', 'b', 62000, 0, CAST('4.75' AS DOUBLE), CAST('-1.0' AS DOUBLE), CAST('1.0' AS DOUBLE), 1, -1, CAST('1.0' AS DOUBLE))
      |) t(metric, label_k, ts_ms, schema, count, sum, zero_count, side, bucket, bucket_count)
      |ORDER BY metric, label_k, ts_ms, side, bucket""".stripMargin

  // ---- the a1v gate: remote-read decode + select, hash-gated ----

  /** A `ReadRequest` this engine did NOT encode — literal bytes
    * hand-derived from the public wire format (tag = field<<3 |
    * wiretype; every byte justified below):
    *
    *   0A 36  query#1 (field 1, 54 bytes):
    *     08 80E8C792CC31   start_timestamp_ms = 1704067200000 (2024-01-01)
    *     10 80F8ABD3D031   end_timestamp_ms   = 1705276800000 (2024-01-15)
    *     1A 1A  matcher, 26 bytes (type EQ omitted — proto3 zero default):
    *       12 08 "__name__"  1A 0E "purchase_total"
    *     1A 0A  matcher, 10 bytes:
    *       08 02  type RE
    *       12 01 "k"  1A 03 "1.*"
    *   0A 3A  query#2 (58 bytes):
    *     08 80E8C792CC31   start = 1704067200000
    *     10 80B0DC8FD631   end   = 1706745600000 (2024-02-01)
    *     1A 12  matcher: 12 08 "__name__"  1A 06 "signup"
    *     1A 10  matcher: 08 01 (NEQ)  12 08 "instance"  1A 02 "i0"
    *     22 04  ReadHints (field 4, skipped by wire type):
    *       08 E0D403  step_ms = 60000
    *   12 01 00  accepted_response_types: packed [SAMPLES]
    */
  private[graft] val GateRequest: Array[Byte] = RemoteWrite.hexBytes(
    "0A36" +
      "0880E8C792CC31" + "1080F8ABD3D031" +
      "1A1A" + "12085F5F6E616D655F5F" + "1A0E" +
      "70757263686173655F746F74616C" +
      "1A0A" + "0802" + "12016B" + "1A03312E2A" +
      "0A3A" +
      "0880E8C792CC31" + "1080B0DC8FD631" +
      "1A12" + "12085F5F6E616D655F5F" + "1A06" + "7369676E7570" +
      "1A10" + "0801" + "1208696E7374616E6365" + "1A026930" +
      "220408E0D403" +
      "120100")

  /** a1v — the remote-read gate: the literal request above decoded by
    * [[walkRequest]] and SELECTED against the corpus — counter series
    * by anchored regex over `k` within a two-week window, gauge series
    * by instance-NEQ over the full month — flattened to one row per
    * (query, sample). The DuckDB oracle re-derives both selections as
    * independent SQL over the events table, so the gate fails if the
    * walk, a matcher op, the `_total` naming, the inclusive time
    * bounds, or the missing-label rule ever drifts.
    */
  def wireReadGate(spark: SparkSession, dir: String): DataFrame = {
    val queries = walkRequest(GateRequest)
    queries.zipWithIndex.map { case (q, i) =>
      matched(spark, dir, q).withColumn("q_idx", lit(i))
    }.reduce(_ unionAll _)
      .select(col("q_idx"), col("wire_name"), col("instance"), col("k"),
        col("ts_ms"), col("value"))
      .orderBy(col("q_idx"), col("wire_name"), col("instance"), col("k"),
        col("ts_ms"), col("value"))
  }

  /** a1w — the STREAMED remote-read gate: the a1v request re-asked with
    * `accepted = [STREAMED_XOR_CHUNKS, SAMPLES]`, served through the
    * FULL negotiated door (snappy request → walk → negotiation → budget
    * check → the INCREMENTAL `toLocalIterator` frame path → XOR chunk
    * encode → CRC frames), then decoded back by the client half and
    * flattened to one row per (query, sample). The oracle is the SAME
    * relation as a1v — the codec is lossless — so any drift in
    * negotiation, framing, batching, a CRC, or a single XOR bit shifts
    * a timestamp or value and fails the hash.
    */
  def wireReadStreamedGate(spark: SparkSession, dir: String): DataFrame = {
    val queries = walkRequest(GateRequest)
    val req = RemoteWrite.compress(encodeRequest(queries, Seq(1L, 0L)))
    val ans = serveNegotiated(spark, dir, req)
    require(ans.streamed, "negotiation must pick STREAMED_XOR_CHUNKS")
    val rows = walkStreamed(ans.body).flatMap { case (qIdx, s) =>
      val lm = s.labels.toMap
      s.samples.map { case (v, t) =>
        (qIdx.toInt, lm.getOrElse("__name__", ""),
          lm.getOrElse("instance", ""), lm.getOrElse("k", ""), t, v)
      }
    }
    import spark.implicits._
    rows.toDF("q_idx", "wire_name", "instance", "k", "ts_ms", "value")
      .orderBy(col("q_idx"), col("wire_name"), col("instance"), col("k"),
        col("ts_ms"), col("value"))
  }

  /** a1za — recording-rule series over the remote-read door: the
    * standing 6h `sum by (k) (purchase)` rule's FULL lattice history
    * ([[graft.promql.Rules.recordedSeriesRelation]] — the samples
    * upstream's rule loop would have written into the TSDB a
    * long-term-storage reader pulls from) served through the negotiated
    * STREAMED face, decoded back by the client walk, and flattened to
    * `(label_k, t_s, value)`. The oracle re-derives the lattice
    * relationally (g = whole rule intervals covering the corpus span
    * + 1; cumulative DECIMAL snapshots at each instant's exact-micro
    * bound; floor-second instant stamps), so one hash pins the span
    * arithmetic, the dense-grid rule evaluation, the labels-map encode,
    * the XOR chunks, and the wire framing together.
    */
  def wireReadRecordedGate(spark: SparkSession, dir: String): DataFrame = {
    val rule = graft.promql.Rules.RecordingRule(
      "k_total6h", "sum by (k) (purchase)", intervalS = 21600)
    val rel = graft.promql.Rules.recordedSeriesRelation(spark, dir, rule)
    val q = ReadQuery(0L, Long.MaxValue / 2,
      Seq(Matcher(0, "__name__", "k_total6h")))
    val req = RemoteWrite.compress(encodeRequest(Seq(q), Seq(1L, 0L)))
    val ans = serveNegotiated(spark, dir, req, recorded = Some(rel))
    require(ans.streamed, "negotiation must pick STREAMED_XOR_CHUNKS")
    val rows = walkStreamed(ans.body).flatMap { case (_, s) =>
      val lm = s.labels.toMap
      s.samples.map { case (v, t) => (lm.getOrElse("k", ""), t / 1000L, v) }
    }
    import spark.implicits._
    rows.toDF("label_k", "t_s", "value")
      .orderBy(col("label_k"), col("t_s"), col("value"))
  }

  lazy val WireReadRecordedGateSql: String =
    s"""WITH m AS (${graft.operators.Metrics.MetricEventsSql}),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us, MIN(epoch_us(ts)) AS min_us
       |      FROM m),
       |n AS (SELECT ((t_us // 1000000) - (min_us // 1000000)) // 21600 + 1 AS g,
       |             t_us // 1000000 AS t_end, t_us FROM t),
       |idx AS (SELECT unnest(generate_series(1, (SELECT g FROM n))) AS i),
       |snap AS (
       |  SELECT label_k, i, SUM(CAST(value AS DECIMAL(18,2))) AS v
       |  FROM m, n, idx
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - (g - i) * 21600000000
       |  GROUP BY label_k, i)
       |SELECT s.label_k, n.t_end - (n.g - s.i) * 21600 AS t_s,
       |  CAST(s.v AS DOUBLE) AS value
       |FROM snap s, n
       |ORDER BY label_k, t_s, value""".stripMargin

  lazy val WireReadGateSql: String =
    s"""WITH m AS (${graft.operators.Metrics.MetricEventsSql}),
       |w AS (SELECT
       |  name || CASE WHEN kind = 'counter' THEN '_total' ELSE '' END AS wire_name,
       |  label_instance AS instance, COALESCE(label_k, '') AS k,
       |  epoch_ms(ts) AS ts_ms, value FROM m)
       |SELECT * FROM (
       |  SELECT 0 AS q_idx, wire_name, instance, k, ts_ms, value FROM w
       |  WHERE wire_name = 'purchase_total'
       |    AND regexp_matches(k, '^(?:1.*)$$')
       |    AND ts_ms BETWEEN 1704067200000 AND 1705276800000
       |  UNION ALL
       |  SELECT 1 AS q_idx, wire_name, instance, k, ts_ms, value FROM w
       |  WHERE wire_name = 'signup' AND instance <> 'i0'
       |    AND ts_ms BETWEEN 1704067200000 AND 1706745600000
       |)
       |ORDER BY q_idx, wire_name, instance, k, ts_ms, value""".stripMargin
}
