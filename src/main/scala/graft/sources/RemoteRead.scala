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
  *    `accepted_response_types` (field 2 — only SAMPLES is implemented;
  *    it is the protocol's mandatory baseline, so it always satisfies
  *    the negotiation);
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
    def skip(wire: Int, limit: Int): Unit = wire match {
      case 0 => varint(limit)
      case 1 => pos += 8
      case 2 => val len = varint(limit); pos += len.toInt
      case 5 => pos += 4
      case w => fail(s"unsupported wire type $w")
    }
    def str(limit: Int): String = {
      val len = varint(limit).toInt
      if (pos + len > limit) fail("truncated string")
      val s = new String(bytes, pos, len,
        java.nio.charset.StandardCharsets.UTF_8)
      pos += len
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
            val len = varint(limit).toInt
            val until = pos + len
            if (until > limit) fail("truncated matcher")
            ms += matcher(until)
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
          val len = varint(end).toInt
          val until = pos + len
          if (until > end) fail("truncated query")
          qs += query(until)
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
    */
  def encodeRequest(queries: Seq[ReadQuery]): Array[Byte] = {
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
    // accepted_response_types: packed [SAMPLES] — explicit, like
    // upstream's reader advertising its baseline
    writeLen(req, 2, Array[Byte](0))
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
          val len = varint(end).toInt
          if (pos + len > end) fail("truncated result")
          out += RemoteWrite.walk(
            java.util.Arrays.copyOfRange(bytes, pos, pos + len))
          pos += len
        case (_, w) => w match {
          case 0 => varint(end)
          case 1 => pos += 8
          case 2 => pos += varint(end).toInt
          case 5 => pos += 4
          case x => fail(s"unsupported wire type $x")
        }
      }
    }
    out.result()
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
    * write round-trip spec) drives.
    */
  def fetch(url: String, q: ReadQuery): Seq[Series] = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-protobuf")
    conn.setRequestProperty("Content-Encoding", "snappy")
    try {
      val os = conn.getOutputStream
      try os.write(RemoteWrite.compress(encodeRequest(Seq(q))))
      finally os.close()
      require(conn.getResponseCode / 100 == 2,
        s"remote read failed: HTTP ${conn.getResponseCode}")
      val body = conn.getInputStream.readAllBytes()
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
