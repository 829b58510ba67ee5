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
  * pushed into the scan; the driver materializes only the RESPONSE
  * (grouped per series, O(matched samples)) — the same order as the
  * bytes leaving the socket, which is what a bulk reader asked for. A
  * reader paging a 100 TB corpus bounds each request by its time range,
  * exactly how upstream readers chunk remote reads.
  */
object RemoteRead {

  import RemoteWrite.Series

  /** LabelMatcher.Type: 0 EQ, 1 NEQ, 2 RE, 3 NRE. */
  final case class Matcher(op: Int, name: String, value: String)

  /** One decoded `Query`: inclusive ms bounds + matchers. */
  final case class ReadQuery(startMs: Long, endMs: Long,
      matchers: Seq[Matcher])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed remote-read request: $msg")

  // ---- decoder (the RECEIVER half: request bytes → queries) ----

  /** Walk an UNCOMPRESSED `ReadRequest`. Unknown fields skip by wire
    * type; structural damage (truncated varint/length) fails loud — the
    * endpoint maps it to HTTP 400 at the door.
    */
  def walkRequest(bytes: Array[Byte]): Seq[ReadQuery] = {
    var pos = 0
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
    // every length-delimited read validates BEFORE advancing: a crafted
    // length (negative after .toInt, or past the limit) must 400, never
    // rewind `pos` (a rewound skip loops the single-threaded server
    // forever) or bleed across message boundaries
    def lenEnd(limit: Int): Int = {
      val l = varint(limit)
      if (l < 0 || l > limit - pos) fail("invalid length")
      pos + l.toInt
    }
    def skip(wire: Int, limit: Int): Unit = wire match {
      case 0 => varint(limit)
      case 1 => pos += 8
      case 2 => pos = lenEnd(limit)
      case 5 => pos += 4
      case w => fail(s"unsupported wire type $w")
    }
    def str(limit: Int): String = {
      val e2 = lenEnd(limit)
      val s = new String(bytes, pos, e2 - pos,
        java.nio.charset.StandardCharsets.UTF_8)
      pos = e2
      s
    }
    def matcher(limit: Int): Matcher = {
      var op = 0
      var name = ""
      var value = ""
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 0) => op = varint(limit).toInt
          case (2, 2) => name = str(limit)
          case (3, 2) => value = str(limit)
          case (_, w) => skip(w, limit)
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
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 0) => startMs = varint(limit)
          case (2, 0) => endMs = varint(limit)
          case (3, 2) =>
            ms += matcher(lenEnd(limit))
          case (_, w) => skip(w, limit) // hints & future fields
        }
      }
      val m = ms.result()
      if (m.isEmpty) fail("query without matchers")
      ReadQuery(startMs, endMs, m)
    }
    val qs = Vector.newBuilder[ReadQuery]
    val end = bytes.length
    while (pos < end) {
      val tag = varint(end)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          qs += query(lenEnd(end))
        case (_, w) => skip(w, end) // accepted_response_types etc.
      }
    }
    val out = qs.result()
    if (out.isEmpty) fail("no queries")
    if (pos != end) fail("trailing bytes")
    out
  }

  // ---- encoder (request for the CLIENT half, response for the door;
  // pure varint/tag writers like RemoteWrite's sender) ----

  private def writeVarint(b: java.io.ByteArrayOutputStream, v0: Long): Unit = {
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
    var pos = 0
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
    val out = Vector.newBuilder[Seq[Series]]
    val end = bytes.length
    while (pos < end) {
      val tag = varint(end)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          val l = varint(end)
          if (l < 0 || l > end - pos) fail("invalid length")
          val len = l.toInt
          out += RemoteWrite.walk(
            java.util.Arrays.copyOfRange(bytes, pos, pos + len))
          pos += len
        case (_, w) => w match {
          case 0 => varint(end)
          case 1 => pos += 8
          case 2 =>
            val l = varint(end)
            if (l < 0 || l > end - pos) fail("invalid length")
            pos += l.toInt
          case 5 => pos += 4
          case x => fail(s"unsupported wire type $x")
        }
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
    var pos = 0
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
    val out = Vector.newBuilder[Long]
    val end = bytes.length
    while (pos < end) {
      val tag = varint(end)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (2, 2) => // packed
          val pl = varint(end)
          if (pl < 0 || pl > end - pos) fail("truncated accepted_response_types")
          val until = pos + pl.toInt
          while (pos < until) out += varint(until)
        case (2, 0) => out += varint(end) // unpacked
        case (_, 0) => varint(end)
        case (_, 1) => pos += 8
        case (_, 2) =>
          val l = varint(end)
          if (l < 0 || l > end - pos) fail("invalid length")
          pos += l.toInt
        case (_, 5) => pos += 4
        case (_, w) => fail(s"unsupported wire type $w")
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

  /** Streamed response bytes: one length-prefixed FRAME per non-empty
    * (query, series) pair — `uvarint(len(data))` ++ big-endian CRC32C
    * of `data` ++ `data` (upstream's ChunkedWriter convention; no
    * snappy — the payloads are already XOR-compressed). Each frame's
    * `data` is one `ChunkedReadResponse`: `chunked_series` (field 1)
    * holding the series' labels + its samples split into ≤120-sample
    * XOR chunks (upstream's streaming chunk budget), and `query_index`
    * (field 2) naming which request query it answers.
    */
  def encodeStreamed(results: Seq[Seq[Series]],
      samplesPerChunk: Int = 120): Array[Byte] = {
    require(samplesPerChunk > 0, "positive chunk budget")
    val out = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32C()
    results.zipWithIndex.foreach { case (qr, qIdx) =>
      qr.foreach { s =>
        val cs = new java.io.ByteArrayOutputStream()
        s.labels.foreach { case (n, v) =>
          val lb = new java.io.ByteArrayOutputStream()
          writeLen(lb, 1, utf8(n))
          writeLen(lb, 2, utf8(v))
          writeLen(cs, 1, lb.toByteArray)
        }
        // samples arrive (value, tsMs) in timestamp order (seriesFor)
        s.samples.grouped(samplesPerChunk).foreach { grp =>
          val ch = new java.io.ByteArrayOutputStream()
          writeVarint(ch, (1L << 3) | 0L); writeVarint(ch, grp.head._2)
          writeVarint(ch, (2L << 3) | 0L); writeVarint(ch, grp.last._2)
          writeVarint(ch, (3L << 3) | 0L); writeVarint(ch, 1L) // XOR
          writeLen(ch, 4, XorChunk.encode(grp.map { case (v, t) => (t, v) }))
          writeLen(cs, 2, ch.toByteArray)
        }
        val msg = new java.io.ByteArrayOutputStream()
        writeLen(msg, 1, cs.toByteArray)
        if (qIdx != 0) { // proto3 zero default omits
          writeVarint(msg, (2L << 3) | 0L); writeVarint(msg, qIdx.toLong)
        }
        val data = msg.toByteArray
        writeVarint(out, data.length.toLong)
        crc.reset(); crc.update(data, 0, data.length)
        val c = crc.getValue
        out.write(((c >> 24) & 0xFF).toInt); out.write(((c >> 16) & 0xFF).toInt)
        out.write(((c >> 8) & 0xFF).toInt); out.write((c & 0xFF).toInt)
        out.write(data, 0, data.length)
      }
    }
    out.toByteArray
  }

  /** Decode a streamed response: frames → (query_index, series with
    * XOR chunks re-expanded to samples), in frame order. CRC mismatch
    * and non-XOR chunk encodings fail loud.
    */
  def walkStreamed(bytes: Array[Byte]): Seq[(Long, Series)] = {
    var pos = 0
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
    // bounds-checked lengths BEFORE advancing (a crafted length must
    // 400, never rewind pos or bleed across message boundaries)
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
    val crc = new java.util.zip.CRC32C()
    val out = Vector.newBuilder[(Long, Series)]
    val end = bytes.length
    while (pos < end) {
      val l0 = varint(end)
      if (l0 < 0 || l0 > end - pos - 4) fail("truncated frame")
      val len = l0.toInt
      val want = ((bytes(pos) & 0xFFL) << 24) | ((bytes(pos + 1) & 0xFFL) << 16) |
        ((bytes(pos + 2) & 0xFFL) << 8) | (bytes(pos + 3) & 0xFFL)
      pos += 4
      crc.reset(); crc.update(bytes, pos, len)
      if (crc.getValue != want) fail("frame checksum mismatch")
      val frameEnd = pos + len
      var qIdx = 0L
      var series: Option[Series] = None
      while (pos < frameEnd) {
        val tag = varint(frameEnd)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) => // ChunkedSeries
            val csEnd = lenEnd(frameEnd)
            val labels = Vector.newBuilder[(String, String)]
            val samples = Vector.newBuilder[(Double, Long)]
            while (pos < csEnd) {
              val t2 = varint(csEnd)
              ((t2 >> 3).toInt, (t2 & 7).toInt) match {
                case (1, 2) => // Label
                  val lEnd = lenEnd(csEnd)
                  var n = ""
                  var v = ""
                  while (pos < lEnd) {
                    val t3 = varint(lEnd)
                    ((t3 >> 3).toInt, (t3 & 7).toInt) match {
                      case (1, 2) => n = str(lEnd)
                      case (2, 2) => v = str(lEnd)
                      case (_, 0) => varint(lEnd)
                      case (_, 2) => pos = lenEnd(lEnd)
                      case (_, w) => fail(s"unsupported wire type $w")
                    }
                  }
                  labels += ((n, v))
                case (2, 2) => // Chunk
                  val cEnd = lenEnd(csEnd)
                  var typ = 0L
                  var data: Array[Byte] = Array.empty
                  while (pos < cEnd) {
                    val t3 = varint(cEnd)
                    ((t3 >> 3).toInt, (t3 & 7).toInt) match {
                      case (3, 0) => typ = varint(cEnd)
                      case (4, 2) =>
                        val dEnd = lenEnd(cEnd)
                        data = java.util.Arrays.copyOfRange(bytes, pos, dEnd)
                        pos = dEnd
                      case (_, 0) => varint(cEnd) // min/max advisory
                      case (_, 2) => pos = lenEnd(cEnd)
                      case (_, w) => fail(s"unsupported wire type $w")
                    }
                  }
                  if (typ != 1L) fail(s"unsupported chunk encoding $typ (XOR only)")
                  samples ++= XorChunk.decode(data).map { case (t, v) => (v, t) }
                case (_, 0) => varint(csEnd)
                case (_, 2) => pos = lenEnd(csEnd)
                case (_, w) => fail(s"unsupported wire type $w")
              }
            }
            series = Some(Series(labels.result(), samples.result()))
          case (2, 0) => qIdx = varint(frameEnd)
          case (_, 0) => varint(frameEnd)
          case (_, 2) => pos = lenEnd(frameEnd)
          case (_, w) => fail(s"unsupported wire type $w")
        }
      }
      series.foreach(s => out += ((qIdx, s)))
    }
    out.result()
  }

  /** A negotiated answer: `streamed` decides the HTTP face
    * (content-type `application/x-streamed-protobuf;
    * proto=prometheus.ChunkedReadResponse`, no snappy — vs the SAMPLES
    * face's snappy-framed `application/x-protobuf`).
    */
  final case class ReadAnswer(streamed: Boolean, body: Array[Byte])

  /** The full negotiated door: request bytes → response bytes + face. */
  def serveNegotiated(spark: SparkSession, dir: String,
      body: Array[Byte]): ReadAnswer = {
    val raw = RemoteWrite.uncompress(body)
    val queries = walkRequest(raw)
    val resType = negotiate(acceptedTypes(raw))
    val results = queries.map(q => seriesFor(spark, dir, q))
    if (resType == 1L) ReadAnswer(streamed = true, encodeStreamed(results))
    else ReadAnswer(streamed = false,
      RemoteWrite.compress(encodeResponse(results)))
  }

  // ---- the evaluator: queries → sample relation / wire series ----

  /** The corpus as the remote-read wire vocabulary — one row per
    * sample: `wire_name` (exposition `_total` convention, shared with
    * the remote-write sender), `instance`, `k`, `ts_ms`, double
    * `value`. Pure projection over the tombstone-respecting events
    * view; everything stays a column expression until the serving
    * layer collects the response.
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

  /** One query's response frame: matched samples grouped per series
    * (labels name-sorted, empty values dropped; samples in timestamp
    * order), series in label order — deterministic bytes for any
    * partitioning.
    */
  def seriesFor(spark: SparkSession, dir: String,
      q: ReadQuery): Seq[Series] =
    matched(spark, dir, q)
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq.sortBy(_._1)
      .map { case ((n, inst, k), rs) =>
        val labels = (Vector("__name__" -> n, "instance" -> inst,
          "k" -> k)).filter(_._2.nonEmpty)
        Series(labels,
          rs.map(r => (r.getDouble(4), r.getLong(3)))
            .sortBy { case (v, t) => (t, v) }.toVector)
      }

  /** The full door: request BYTES (snappy-framed) → response BYTES
    * (snappy-framed) — what the HTTP endpoint serves.
    */
  def serve(spark: SparkSession, dir: String,
      body: Array[Byte]): Array[Byte] = {
    val queries = walkRequest(RemoteWrite.uncompress(body))
    RemoteWrite.compress(encodeResponse(
      queries.map(q => seriesFor(spark, dir, q))))
  }

  /** The CLIENT half: POST one query to a remote-read endpoint and
    * decode its frame — what a federating deployment (or the read ∘
    * write round-trip spec) drives. `streamed = true` advertises
    * STREAMED_XOR_CHUNKS first (a Thanos querier's default); either
    * way the decode branches on the server's answering content type,
    * so a SAMPLES-only server still interoperates.
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
      else
        walkResponse(RemoteWrite.uncompress(body)).headOption.getOrElse(Nil)
    } finally conn.disconnect()
  }

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
    * FULL negotiated door (snappy request → walk → negotiation → XOR
    * chunk encode → CRC frames), then decoded back by the client half
    * and flattened to one row per (query, sample). The oracle is the
    * SAME relation as a1v — the codec is lossless — so any drift in
    * negotiation, framing, a CRC, or a single XOR bit shifts a
    * timestamp or value and fails the hash. The encode∘decode runs on
    * the driver over the RESPONSE (O(matched samples) — the same bytes
    * that would leave the socket), not over the corpus.
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
