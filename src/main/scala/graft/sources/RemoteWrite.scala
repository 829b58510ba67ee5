package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prometheus REMOTE WRITE 1.0 — the PUSH twin of the reference's pull
  * model (`/root/reference/prometheus.cpp:47,73` exposes `/metrics` for
  * a server to poll; remote write is how one Prometheus forwards its
  * samples to another): an HTTP POST of a snappy-compressed protobuf
  * `WriteRequest` lands as one row of a streaming relation, and the
  * wire decode is a row-local Catalyst generator
  * ([[graft.plans.RemoteWriteDecodeExpr]]) over the payload bytes —
  * batch ≡ streaming, nothing ever leaves the executor that holds the
  * payload.
  *
  * The wire format is the PUBLIC protobuf encoding of the public
  * `prometheus/prompb` schema (remote.proto / types.proto):
  *
  *   WriteRequest { repeated TimeSeries timeseries = 1; }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  *   Label        { string name = 1; string value = 2; }
  *   Sample       { double value = 1; int64 timestamp = 2; }   // ms
  *
  * [[walk]] is the ONE parser both tiers share: the generator calls it
  * per payload row on executors, and [[RemoteWriteSink.receive]] calls
  * it once driver-side to reject malformed bodies with HTTP 400 before
  * they enter the stream (a Prometheus receiver's own contract).
  * Unknown fields skip by wire type (exemplars, native-histogram
  * payloads, metadata), so payloads from newer senders decode their
  * samples instead of erroring.
  *
  * Scale shape: one POST = one row; the explode fans each payload's
  * (series × samples) onto the executor that holds it. A fleet of
  * senders is a union of sink relations; downstream state is the
  * streaming operators' own (rollup state ∝ open buckets × series).
  */
object RemoteWrite {

  /** Upstream's `external_labels` attach for OUTBOUND series (the
    * remote-write sender, `/federate`, the notifier): each external
    * pair joins the series' sorted label vector UNLESS the series
    * already carries that name — the series' own label wins, exactly
    * upstream's conflict rule — and empty external values are dropped
    * like any empty label. Returns a name-sorted vector (the wire
    * series identity).
    */
  private[graft] def withExternal(labels: Vector[(String, String)],
      ext: Map[String, String]): Vector[(String, String)] =
    if (ext.isEmpty) labels
    else {
      val have = labels.map(_._1).toSet
      (labels ++ ext.toVector.filter { case (k, v) =>
        !have.contains(k) && v.nonEmpty
      }).sortBy(_._1)
    }

  /** One exemplar off the wire (prompb `Exemplar`: labels = 1,
    * value = 2, timestamp = 3) — the trace-id-carrying observation a
    * sender attaches to a series, destined for the exemplar store.
    */
  final case class Exemplar(labels: Vector[(String, String)],
      value: Double, tsMs: Long)

  /** One decoded time series: its label pairs (wire order) and its
    * (value, timestamp-ms) samples (wire order); native-histogram
    * payloads (prompb `Histogram`, field 4) and exemplars (field 3)
    * ride alongside. `createdTsMs` is remote-write 2.0's per-series
    * created timestamp (v2 `TimeSeries.created_timestamp`, field 6 —
    * the Prometheus 3.x counter-birth instant); 0 = absent, upstream's
    * own convention. The 1.0 wire has no such field, so a v1 encode
    * drops it — the door materializes it as a CT-zero sample first
    * ([[withCtZero]]).
    */
  final case class Series(labels: Vector[(String, String)],
      samples: Vector[(Double, Long)],
      hists: Vector[Hist] = Vector.empty,
      exemplars: Vector[Exemplar] = Vector.empty,
      fhists: Vector[FHist] = Vector.empty,
      createdTsMs: Long = 0L)

  /** One native-histogram sample off the wire: the sparse POSITIVE
    * bucket ladder the engine models (`prometheus.cpp:256-306`'s
    * scrape-side twin carried over remote write) — span offsets/lengths
    * and the delta chain, exactly the exposition encoding
    * [[graft.operators.Metrics.decodeWireSpans]] walks — plus the
    * sample's own scalar state (prompb `count_int`/`sum`/
    * `zero_count_int`, fields 1/3/6): a native-histogram sample is a
    * COMPLETE snapshot, so these ride with every sample and the family
    * registry's last-write-wins needs no reconstruction.
    */
  final case class Hist(tsMs: Long, schema: Int,
      offs: Vector[Int], lens: Vector[Int], deltas: Vector[Long],
      count: Long = 0L, sum: Double = 0.0, zeroCount: Long = 0L,
      negOffs: Vector[Int] = Vector.empty, negLens: Vector[Int] = Vector.empty,
      negDeltas: Vector[Long] = Vector.empty,
      resetHint: Int = 0) // prompb ResetHint: 0 UNKNOWN, 1 YES, 2 NO, 3 GAUGE

  /** One FLOAT-form native-histogram sample (prompb's `count`/
    * `zero_count` as doubles, `positive_counts`/`negative_counts` as
    * ABSOLUTE per-bucket doubles — the sample kind an aggregating
    * sender produces, where observation counts are no longer whole):
    * the float twin of [[Hist]], served over the streamed remote-read
    * face as FLOAT_HISTOGRAM (type 3) chunks.
    */
  final case class FHist(tsMs: Long, schema: Int,
      offs: Vector[Int], lens: Vector[Int], counts: Vector[Double],
      count: Double = 0.0, sum: Double = 0.0, zeroCount: Double = 0.0,
      negOffs: Vector[Int] = Vector.empty, negLens: Vector[Int] = Vector.empty,
      negCounts: Vector[Double] = Vector.empty,
      resetHint: Int = 0) // prompb ResetHint: 0 UNKNOWN, 1 YES, 2 NO, 3 GAUGE

  /** Decode an UNCOMPRESSED `WriteRequest` payload. Throws
    * `IllegalArgumentException` on malformed bytes (truncated message,
    * over-running length, unsupported group wire types) — the receive
    * path maps that to HTTP 400.
    */
  def walk(bytes: Array[Byte]): Vector[Series] = {
    val end = bytes.length
    var pos = 0

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WriteRequest: $msg")

    def varint(limit: Int): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        if (pos >= limit) fail("truncated varint")
        val b = bytes(pos)
        pos += 1
        out |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      fail("varint exceeds 64 bits")
    }

    def fixed64(limit: Int): Long = {
      if (pos + 8 > limit) fail("truncated fixed64")
      var out = 0L
      var i = 0
      while (i < 8) {
        out |= (bytes(pos + i) & 0xFFL) << (8 * i)
        i += 1
      }
      pos += 8
      out
    }

    /** A length-delimited field's content end; `pos` stays at the
      * content start — the caller either walks to the returned end
      * (sub-message) or jumps `pos` there (string read, skip).
      */
    def lenDelim(limit: Int): Int = {
      val len = varint(limit)
      if (len < 0 || pos + len > limit) fail("length overruns message")
      pos + len.toInt
    }

    def skip(wireType: Int, limit: Int): Unit = wireType match {
      case 0 => varint(limit)
      case 1 =>
        if (pos + 8 > limit) fail("truncated fixed64")
        pos += 8
      case 2 => pos = lenDelim(limit)
      case 5 =>
        if (pos + 4 > limit) fail("truncated fixed32")
        pos += 4
      case other => fail(s"unsupported wire type $other")
    }

    def str(from: Int, until: Int): String =
      new String(bytes, from, until - from,
        java.nio.charset.StandardCharsets.UTF_8)

    def label(limit: Int): (String, String) = {
      var name = ""
      var value = ""
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) =>
            val u = lenDelim(limit); name = str(pos, u); pos = u
          case (2, 2) =>
            val u = lenDelim(limit); value = str(pos, u); pos = u
          case (_, wt) => skip(wt, limit)
        }
      }
      (name, value)
    }

    def sample(limit: Int): (Double, Long) = {
      var v = 0.0
      var ts = 0L
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 1) => v = java.lang.Double.longBitsToDouble(fixed64(limit))
          case (2, 0) => ts = varint(limit)
          case (_, wt) => skip(wt, limit)
        }
      }
      (v, ts)
    }

    // sint32/sint64 fields are zigzag-coded on the wire
    def zigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

    def bucketSpan(limit: Int): (Int, Int) = {
      var off = 0
      var len = 0
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 0) => off = zigzag(varint(limit)).toInt
          case (2, 0) => len = varint(limit).toInt
          case (_, wt) => skip(wt, limit)
        }
      }
      (off, len)
    }

    /** One wire histogram, dispatched by form: the INTEGER form
      * (count_int / zero_count_int / zigzag delta chains) decodes
      * Left([[Hist]]); the FLOAT form (count / zero_count as doubles,
      * ABSOLUTE packed-double `positive_counts`/`negative_counts` —
      * the sample kind an aggregating sender produces) decodes
      * Right([[FHist]]). Presence of ANY float-form field selects
      * float, upstream's reading.
      */
    def histogram(limit: Int): Either[Hist, FHist] = {
      var ts = 0L
      var schema = 0
      var count = 0L
      var hsum = 0.0
      var zero = 0L
      var isFloat = false
      var countF = 0.0
      var zeroF = 0.0
      var resetHint = 0
      val posCounts = Vector.newBuilder[Double]
      val negCounts = Vector.newBuilder[Double]
      val offs = Vector.newBuilder[Int]
      val lens = Vector.newBuilder[Int]
      val deltas = Vector.newBuilder[Long]
      val negOffs = Vector.newBuilder[Int]
      val negLens = Vector.newBuilder[Int]
      val negDeltas = Vector.newBuilder[Long]
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 0) => count = varint(limit) // count_int
          case (2, 1) => // count (float form)
            countF = java.lang.Double.longBitsToDouble(fixed64(limit))
            isFloat = true
          case (3, 1) => hsum = java.lang.Double.longBitsToDouble(fixed64(limit))
          case (4, 0) => schema = zigzag(varint(limit)).toInt
          case (6, 0) => zero = varint(limit) // zero_count_int
          case (7, 1) => // zero_count (float form)
            zeroF = java.lang.Double.longBitsToDouble(fixed64(limit))
            isFloat = true
          case (8, 2) => // negative_spans
            val (o, l) = bucketSpan(lenDelim(limit)); negOffs += o; negLens += l
          case (9, 2) => // packed negative zigzag deltas
            val u = lenDelim(limit)
            while (pos < u) negDeltas += zigzag(varint(u))
          case (9, 0) => negDeltas += zigzag(varint(limit))
          case (10, 2) => // packed negative_counts (float form, absolute)
            val u = lenDelim(limit)
            while (pos < u)
              negCounts += java.lang.Double.longBitsToDouble(fixed64(u))
            isFloat = true
          case (10, 1) =>
            negCounts += java.lang.Double.longBitsToDouble(fixed64(limit))
            isFloat = true
          case (11, 2) =>
            val (o, l) = bucketSpan(lenDelim(limit)); offs += o; lens += l
          case (12, 2) => // packed zigzag deltas (proto3 default)
            val u = lenDelim(limit)
            while (pos < u) deltas += zigzag(varint(u))
          case (12, 0) => deltas += zigzag(varint(limit)) // unpacked form
          case (13, 2) => // packed positive_counts (float form, absolute)
            val u = lenDelim(limit)
            while (pos < u)
              posCounts += java.lang.Double.longBitsToDouble(fixed64(u))
            isFloat = true
          case (13, 1) =>
            posCounts += java.lang.Double.longBitsToDouble(fixed64(limit))
            isFloat = true
          case (14, 0) => resetHint = varint(limit).toInt // ResetHint enum
          case (15, 0) => ts = varint(limit)
          case (_, wt) => skip(wt, limit) // future fields
        }
      }
      if (isFloat)
        Right(FHist(ts, schema, offs.result(), lens.result(),
          posCounts.result(), countF, hsum, zeroF, negOffs.result(),
          negLens.result(), negCounts.result(), resetHint))
      else
        Left(Hist(ts, schema, offs.result(), lens.result(), deltas.result(),
          count, hsum, zero, negOffs.result(), negLens.result(),
          negDeltas.result(), resetHint))
    }

    def exemplar(limit: Int): Exemplar = {
      val ls = Vector.newBuilder[(String, String)]
      var v = 0.0
      var ts = 0L
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) => ls += label(lenDelim(limit))
          case (2, 1) => v = java.lang.Double.longBitsToDouble(fixed64(limit))
          case (3, 0) => ts = varint(limit)
          case (_, wt) => skip(wt, limit)
        }
      }
      Exemplar(ls.result(), v, ts)
    }

    def timeSeries(limit: Int): Series = {
      val labels = Vector.newBuilder[(String, String)]
      val samples = Vector.newBuilder[(Double, Long)]
      val hists = Vector.newBuilder[Hist]
      val fhists = Vector.newBuilder[FHist]
      val exs = Vector.newBuilder[Exemplar]
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) => labels += label(lenDelim(limit))
          case (2, 2) => samples += sample(lenDelim(limit))
          case (3, 2) => exs += exemplar(lenDelim(limit))
          case (4, 2) => histogram(lenDelim(limit)) match {
            case Left(h) => hists += h
            case Right(f) => fhists += f
          }
          case (_, wt) => skip(wt, limit)
        }
      }
      Series(labels.result(), samples.result(), hists.result(),
        exs.result(), fhists.result())
    }

    val out = Vector.newBuilder[Series]
    while (pos < end) {
      val tag = varint(end)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => out += timeSeries(lenDelim(end))
        case (_, wt) => skip(wt, end)
      }
    }
    out.result()
  }

  /** Decode an UNCOMPRESSED remote-write 2.0 `io.prometheus.write.v2.
    * Request` — the symbol-table protocol: `symbols` (field 4, repeated
    * string; symbols[0] MUST be the empty string) interns every label
    * name/value once per request, and each TimeSeries carries packed
    * uint32 `labels_refs` pairs (field 1) instead of Label messages;
    * samples (field 2) and native histograms (field 3) keep the 1.0
    * shapes. Wire field order is free, so symbols may FOLLOW the
    * timeseries that reference them — the walk gathers both first and
    * resolves refs at the end. Out-of-range refs and odd-length ref
    * lists fail loud (the receiver's 400).
    */
  def walkV2(bytes: Array[Byte]): Vector[Series] = {
    val end = bytes.length
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed v2 Request: $msg")
    def varint(limit: Int): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        if (pos >= limit) fail("truncated varint")
        val b = bytes(pos)
        pos += 1
        out |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      fail("varint exceeds 64 bits")
    }
    def lenDelim(limit: Int): Int = {
      val len = varint(limit)
      if (len < 0 || pos + len > limit) fail("length overruns message")
      pos + len.toInt
    }
    def skip(wireType: Int, limit: Int): Unit = wireType match {
      case 0 => varint(limit)
      case 1 =>
        if (pos + 8 > limit) fail("truncated fixed64"); pos += 8
      case 2 => pos = lenDelim(limit)
      case 5 =>
        if (pos + 4 > limit) fail("truncated fixed32"); pos += 4
      case other => fail(s"unsupported wire type $other")
    }
    val symbols = Vector.newBuilder[String]
    val tsRanges = Vector.newBuilder[(Int, Int)]
    while (pos < end) {
      val tag = varint(end)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (4, 2) =>
          val u = lenDelim(end)
          symbols += new String(bytes, pos, u - pos,
            java.nio.charset.StandardCharsets.UTF_8)
          pos = u
        case (5, 2) =>
          val u = lenDelim(end); tsRanges += ((pos, u)); pos = u
        case (_, wt) => skip(wt, end)
      }
    }
    val syms = symbols.result()
    def sym(ref: Long): String = {
      if (ref < 0 || ref >= syms.length) fail(s"symbol ref $ref out of range")
      syms(ref.toInt)
    }
    tsRanges.result().map { case (from, until) =>
      pos = from
      val refs = Vector.newBuilder[Long]
      val samples = Vector.newBuilder[(Double, Long)]
      val hists = Vector.newBuilder[Hist]
      val fhists = Vector.newBuilder[FHist]
      // the v1 walker's sample/histogram sub-parsers apply verbatim —
      // only the label encoding changed in 2.0
      def sample(limit: Int): (Double, Long) = {
        var v = 0.0
        var ts = 0L
        while (pos < limit) {
          val tag = varint(limit)
          ((tag >> 3).toInt, (tag & 7).toInt) match {
            case (1, 1) =>
              if (pos + 8 > limit) fail("truncated fixed64")
              var bits = 0L
              var i = 0
              while (i < 8) { bits |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
              pos += 8
              v = java.lang.Double.longBitsToDouble(bits)
            case (2, 0) => ts = varint(limit)
            case (_, wt) => skip(wt, limit)
          }
        }
        (v, ts)
      }
      def zigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)
      def bucketSpan(limit: Int): (Int, Int) = {
        var off = 0
        var len = 0
        while (pos < limit) {
          val tag = varint(limit)
          ((tag >> 3).toInt, (tag & 7).toInt) match {
            case (1, 0) => off = zigzag(varint(limit)).toInt
            case (2, 0) => len = varint(limit).toInt
            case (_, wt) => skip(wt, limit)
          }
        }
        (off, len)
      }
      def f64(limit: Int): Double = {
        if (pos + 8 > limit) fail("truncated fixed64")
        var bits = 0L
        var i = 0
        while (i < 8) { bits |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
        pos += 8
        java.lang.Double.longBitsToDouble(bits)
      }
      // both histogram FORMS, like the v1 walker: integer → Left(Hist),
      // any float-form field present → Right(FHist)
      def histogram(limit: Int): Either[Hist, FHist] = {
        var ts = 0L
        var schema = 0
        var count = 0L
        var hsum = 0.0
        var zero = 0L
        var isFloat = false
        var countF = 0.0
        var zeroF = 0.0
        var resetHint = 0
        val posCounts = Vector.newBuilder[Double]
        val negCounts = Vector.newBuilder[Double]
        val offs = Vector.newBuilder[Int]
        val lens = Vector.newBuilder[Int]
        val deltas = Vector.newBuilder[Long]
        val negOffs = Vector.newBuilder[Int]
        val negLens = Vector.newBuilder[Int]
        val negDeltas = Vector.newBuilder[Long]
        while (pos < limit) {
          val tag = varint(limit)
          ((tag >> 3).toInt, (tag & 7).toInt) match {
            case (1, 0) => count = varint(limit)
            case (2, 1) => countF = f64(limit); isFloat = true
            case (3, 1) => hsum = f64(limit)
            case (4, 0) => schema = zigzag(varint(limit)).toInt
            case (6, 0) => zero = varint(limit)
            case (7, 1) => zeroF = f64(limit); isFloat = true
            case (8, 2) =>
              val (o, l) = bucketSpan(lenDelim(limit)); negOffs += o; negLens += l
            case (9, 2) =>
              val u = lenDelim(limit)
              while (pos < u) negDeltas += zigzag(varint(u))
            case (9, 0) => negDeltas += zigzag(varint(limit))
            case (10, 2) =>
              val u = lenDelim(limit)
              while (pos < u) negCounts += f64(u)
              isFloat = true
            case (10, 1) => negCounts += f64(limit); isFloat = true
            case (11, 2) =>
              val (o, l) = bucketSpan(lenDelim(limit)); offs += o; lens += l
            case (12, 2) =>
              val u = lenDelim(limit)
              while (pos < u) deltas += zigzag(varint(u))
            case (12, 0) => deltas += zigzag(varint(limit))
            case (13, 2) =>
              val u = lenDelim(limit)
              while (pos < u) posCounts += f64(u)
              isFloat = true
            case (13, 1) => posCounts += f64(limit); isFloat = true
            case (14, 0) => resetHint = varint(limit).toInt // ResetHint enum
            case (15, 0) => ts = varint(limit)
            case (_, wt) => skip(wt, limit)
          }
        }
        if (isFloat)
          Right(FHist(ts, schema, offs.result(), lens.result(),
            posCounts.result(), countF, hsum, zeroF, negOffs.result(),
            negLens.result(), negCounts.result(), resetHint))
        else
          Left(Hist(ts, schema, offs.result(), lens.result(), deltas.result(),
            count, hsum, zero, negOffs.result(), negLens.result(),
            negDeltas.result(), resetHint))
      }
      // v2 Exemplar: packed labels_refs = 1, value = 2, timestamp = 3
      def exemplarV2(limit: Int): Exemplar = {
        val ers = Vector.newBuilder[Long]
        var v = 0.0
        var ts = 0L
        while (pos < limit) {
          val tag = varint(limit)
          ((tag >> 3).toInt, (tag & 7).toInt) match {
            case (1, 2) =>
              val u = lenDelim(limit)
              while (pos < u) ers += varint(u)
            case (1, 0) => ers += varint(limit)
            case (2, 1) =>
              if (pos + 8 > limit) fail("truncated fixed64")
              var bits = 0L
              var i = 0
              while (i < 8) { bits |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
              pos += 8
              v = java.lang.Double.longBitsToDouble(bits)
            case (3, 0) => ts = varint(limit)
            case (_, wt) => skip(wt, limit)
          }
        }
        val es = ers.result()
        if (es.length % 2 != 0) fail("odd exemplar labels_refs length")
        Exemplar(es.grouped(2).map { case Vector(n, vv) => (sym(n), sym(vv)) }
          .toVector, v, ts)
      }
      val exs = Vector.newBuilder[Exemplar]
      var createdTs = 0L
      while (pos < until) {
        val tag = varint(until)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) => // packed labels_refs
            val u = lenDelim(until)
            while (pos < u) refs += varint(u)
          case (1, 0) => refs += varint(until) // unpacked form
          case (2, 2) => samples += sample(lenDelim(until))
          case (3, 2) => histogram(lenDelim(until)) match {
            case Left(h) => hists += h
            case Right(f) => fhists += f
          }
          case (4, 2) => exs += exemplarV2(lenDelim(until)) // v2: field 4
          case (6, 0) => createdTs = varint(until) // created_timestamp
          case (_, wt) => skip(wt, until)
        }
      }
      val rs = refs.result()
      if (rs.length % 2 != 0) fail("odd labels_refs length")
      val labels = rs.grouped(2).map { case Vector(n, v) => (sym(n), sym(v)) }
        .toVector
      Series(labels, samples.result(), hists.result(), exs.result(),
        fhists.result(), createdTs)
    }
  }

  // ---- encoder (the SENDER half — what the forwarding spec and a
  // federating deployment use; pure varint/tag writers) ----

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

  /** Encode series as an UNCOMPRESSED `WriteRequest` (deterministic:
    * fields in schema order, inputs in caller order).
    */
  def encode(series: Seq[Series]): Array[Byte] = {
    val req = new java.io.ByteArrayOutputStream()
    series.foreach { s =>
      val ts = new java.io.ByteArrayOutputStream()
      s.labels.foreach { case (n, v) =>
        val l = new java.io.ByteArrayOutputStream()
        writeLen(l, 1, utf8(n))
        writeLen(l, 2, utf8(v))
        writeLen(ts, 1, l.toByteArray)
      }
      s.samples.foreach { case (v, t) =>
        val sm = new java.io.ByteArrayOutputStream()
        writeVarint(sm, (1L << 3) | 1L)
        val bits = java.lang.Double.doubleToLongBits(v)
        var i = 0
        while (i < 8) { sm.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
        writeVarint(sm, (2L << 3) | 0L)
        writeVarint(sm, t)
        writeLen(ts, 2, sm.toByteArray)
      }
      s.exemplars.foreach { e => // Exemplar: labels=1, value=2, ts=3
        val em = new java.io.ByteArrayOutputStream()
        e.labels.foreach { case (n, v) =>
          val l = new java.io.ByteArrayOutputStream()
          writeLen(l, 1, utf8(n))
          writeLen(l, 2, utf8(v))
          writeLen(em, 1, l.toByteArray)
        }
        writeVarint(em, (2L << 3) | 1L)
        val bits = java.lang.Double.doubleToLongBits(e.value)
        var i = 0
        while (i < 8) { em.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
        writeVarint(em, (3L << 3) | 0L)
        writeVarint(em, e.tsMs)
        writeLen(ts, 3, em.toByteArray)
      }
      s.hists.foreach { h =>
        def zz(n: Long): Long = (n << 1) ^ (n >> 63)
        val hm = new java.io.ByteArrayOutputStream()
        if (h.count != 0L) { // count_int, field 1
          writeVarint(hm, (1L << 3) | 0L); writeVarint(hm, h.count)
        }
        if (java.lang.Double.doubleToRawLongBits(h.sum) != 0L) { // sum, field 3, little-endian double
          writeVarint(hm, (3L << 3) | 1L)
          val sb = java.lang.Double.doubleToLongBits(h.sum)
          var i = 0
          while (i < 8) { hm.write(((sb >>> (8 * i)) & 0xFF).toInt); i += 1 }
        }
        writeVarint(hm, (4L << 3) | 0L) // schema, sint32
        writeVarint(hm, zz(h.schema.toLong))
        if (h.zeroCount != 0L) { // zero_count_int, field 6
          writeVarint(hm, (6L << 3) | 0L); writeVarint(hm, h.zeroCount)
        }
        h.negOffs.zip(h.negLens).foreach { case (o, l) => // negative_spans, field 8
          val sp = new java.io.ByteArrayOutputStream()
          writeVarint(sp, (1L << 3) | 0L); writeVarint(sp, zz(o.toLong))
          writeVarint(sp, (2L << 3) | 0L); writeVarint(sp, l.toLong)
          writeLen(hm, 8, sp.toByteArray)
        }
        if (h.negDeltas.nonEmpty) { // packed negative deltas, field 9
          val dl = new java.io.ByteArrayOutputStream()
          h.negDeltas.foreach(d => writeVarint(dl, zz(d)))
          writeLen(hm, 9, dl.toByteArray)
        }
        h.offs.zip(h.lens).foreach { case (o, l) =>
          val sp = new java.io.ByteArrayOutputStream()
          writeVarint(sp, (1L << 3) | 0L)
          writeVarint(sp, zz(o.toLong))
          writeVarint(sp, (2L << 3) | 0L)
          writeVarint(sp, l.toLong)
          writeLen(hm, 11, sp.toByteArray)
        }
        if (h.deltas.nonEmpty) { // packed zigzag deltas
          val dl = new java.io.ByteArrayOutputStream()
          h.deltas.foreach(d => writeVarint(dl, zz(d)))
          writeLen(hm, 12, dl.toByteArray)
        }
        if (h.resetHint != 0) { // reset_hint, field 14 (GAUGE marks a
          // gauge-type native histogram: no reset semantics)
          writeVarint(hm, (14L << 3) | 0L)
          writeVarint(hm, h.resetHint.toLong)
        }
        writeVarint(hm, (15L << 3) | 0L)
        writeVarint(hm, h.tsMs)
        writeLen(ts, 4, hm.toByteArray)
      }
      s.fhists.foreach { h => // FLOAT form: absolute double counts
        def zz(n: Long): Long = (n << 1) ^ (n >> 63)
        val hm = new java.io.ByteArrayOutputStream()
        def dbl(field: Int, v: Double): Unit = {
          writeVarint(hm, (field.toLong << 3) | 1L)
          val b = java.lang.Double.doubleToLongBits(v)
          var i = 0
          while (i < 8) { hm.write(((b >>> (8 * i)) & 0xFF).toInt); i += 1 }
        }
        def packed(field: Int, vs: Seq[Double]): Unit = if (vs.nonEmpty) {
          val dl = new java.io.ByteArrayOutputStream()
          vs.foreach { v =>
            val b = java.lang.Double.doubleToLongBits(v)
            var i = 0
            while (i < 8) { dl.write(((b >>> (8 * i)) & 0xFF).toInt); i += 1 }
          }
          writeLen(hm, field, dl.toByteArray)
        }
        // count/zero_count ALWAYS write: their float-form presence is
        // what marks the sample as float on the wire (a zero-count
        // float histogram must not decode back as the integer form)
        dbl(2, h.count)
        if (java.lang.Double.doubleToRawLongBits(h.sum) != 0L) dbl(3, h.sum)
        writeVarint(hm, (4L << 3) | 0L)
        writeVarint(hm, zz(h.schema.toLong))
        dbl(7, h.zeroCount)
        h.negOffs.zip(h.negLens).foreach { case (o, l) => // field 8
          val sp = new java.io.ByteArrayOutputStream()
          writeVarint(sp, (1L << 3) | 0L); writeVarint(sp, zz(o.toLong))
          writeVarint(sp, (2L << 3) | 0L); writeVarint(sp, l.toLong)
          writeLen(hm, 8, sp.toByteArray)
        }
        packed(10, h.negCounts)
        h.offs.zip(h.lens).foreach { case (o, l) => // field 11
          val sp = new java.io.ByteArrayOutputStream()
          writeVarint(sp, (1L << 3) | 0L); writeVarint(sp, zz(o.toLong))
          writeVarint(sp, (2L << 3) | 0L); writeVarint(sp, l.toLong)
          writeLen(hm, 11, sp.toByteArray)
        }
        packed(13, h.counts)
        if (h.resetHint != 0) { // reset_hint, field 14 (GAUGE marks a
          // gauge-type native histogram: no reset semantics)
          writeVarint(hm, (14L << 3) | 0L)
          writeVarint(hm, h.resetHint.toLong)
        }
        writeVarint(hm, (15L << 3) | 0L)
        writeVarint(hm, h.tsMs)
        writeLen(ts, 4, hm.toByteArray)
      }
      writeLen(req, 1, ts.toByteArray)
    }
    req.toByteArray
  }

  /** Encode series as an UNCOMPRESSED remote-write 2.0 `Request`:
    * every label name/value interned once in the symbol table
    * (symbols[0] = "", per spec), packed `labels_refs` pairs per
    * series. Deterministic: first-appearance interning order.
    */
  def encodeV2(series: Seq[Series]): Array[Byte] = {
    val table = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def ref(s: String): Int = table.getOrElseUpdate(s, table.size)
    def zz(n: Long): Long = (n << 1) ^ (n >> 63)
    val tsBlocks = series.map { s =>
      val ts = new java.io.ByteArrayOutputStream()
      if (s.labels.nonEmpty) {
        val rl = new java.io.ByteArrayOutputStream()
        s.labels.foreach { case (n, v) =>
          writeVarint(rl, ref(n).toLong); writeVarint(rl, ref(v).toLong)
        }
        writeLen(ts, 1, rl.toByteArray)
      }
      s.samples.foreach { case (v, t) =>
        val sm = new java.io.ByteArrayOutputStream()
        writeVarint(sm, (1L << 3) | 1L)
        val bits = java.lang.Double.doubleToLongBits(v)
        var i = 0
        while (i < 8) { sm.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
        writeVarint(sm, (2L << 3) | 0L)
        writeVarint(sm, t)
        writeLen(ts, 2, sm.toByteArray)
      }
      s.exemplars.foreach { e => // v2 Exemplar: interned refs, field 4
        val em = new java.io.ByteArrayOutputStream()
        if (e.labels.nonEmpty) {
          val rl = new java.io.ByteArrayOutputStream()
          e.labels.foreach { case (n, v) =>
            writeVarint(rl, ref(n).toLong); writeVarint(rl, ref(v).toLong)
          }
          writeLen(em, 1, rl.toByteArray)
        }
        writeVarint(em, (2L << 3) | 1L)
        val bits = java.lang.Double.doubleToLongBits(e.value)
        var i = 0
        while (i < 8) { em.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
        writeVarint(em, (3L << 3) | 0L)
        writeVarint(em, e.tsMs)
        writeLen(ts, 4, em.toByteArray)
      }
      s.hists.foreach { h =>
        val hm = new java.io.ByteArrayOutputStream()
        if (h.count != 0L) {
          writeVarint(hm, (1L << 3) | 0L); writeVarint(hm, h.count)
        }
        if (java.lang.Double.doubleToRawLongBits(h.sum) != 0L) {
          writeVarint(hm, (3L << 3) | 1L)
          val sb = java.lang.Double.doubleToLongBits(h.sum)
          var i = 0
          while (i < 8) { hm.write(((sb >>> (8 * i)) & 0xFF).toInt); i += 1 }
        }
        writeVarint(hm, (4L << 3) | 0L)
        writeVarint(hm, zz(h.schema.toLong))
        if (h.zeroCount != 0L) {
          writeVarint(hm, (6L << 3) | 0L); writeVarint(hm, h.zeroCount)
        }
        h.negOffs.zip(h.negLens).foreach { case (o, l) =>
          val sp = new java.io.ByteArrayOutputStream()
          writeVarint(sp, (1L << 3) | 0L); writeVarint(sp, zz(o.toLong))
          writeVarint(sp, (2L << 3) | 0L); writeVarint(sp, l.toLong)
          writeLen(hm, 8, sp.toByteArray)
        }
        if (h.negDeltas.nonEmpty) {
          val dl = new java.io.ByteArrayOutputStream()
          h.negDeltas.foreach(d => writeVarint(dl, zz(d)))
          writeLen(hm, 9, dl.toByteArray)
        }
        h.offs.zip(h.lens).foreach { case (o, l) =>
          val sp = new java.io.ByteArrayOutputStream()
          writeVarint(sp, (1L << 3) | 0L); writeVarint(sp, zz(o.toLong))
          writeVarint(sp, (2L << 3) | 0L); writeVarint(sp, l.toLong)
          writeLen(hm, 11, sp.toByteArray)
        }
        if (h.deltas.nonEmpty) {
          val dl = new java.io.ByteArrayOutputStream()
          h.deltas.foreach(d => writeVarint(dl, zz(d)))
          writeLen(hm, 12, dl.toByteArray)
        }
        if (h.resetHint != 0) { // reset_hint, field 14 (GAUGE marks a
          // gauge-type native histogram: no reset semantics)
          writeVarint(hm, (14L << 3) | 0L)
          writeVarint(hm, h.resetHint.toLong)
        }
        writeVarint(hm, (15L << 3) | 0L)
        writeVarint(hm, h.tsMs)
        writeLen(ts, 3, hm.toByteArray) // v2: histograms are field 3
      }
      s.fhists.foreach { h => // FLOAT form: absolute double counts
        val hm = new java.io.ByteArrayOutputStream()
        def dbl(field: Int, v: Double): Unit = {
          writeVarint(hm, (field.toLong << 3) | 1L)
          val b = java.lang.Double.doubleToLongBits(v)
          var i = 0
          while (i < 8) { hm.write(((b >>> (8 * i)) & 0xFF).toInt); i += 1 }
        }
        def packed(field: Int, vs: Seq[Double]): Unit = if (vs.nonEmpty) {
          val dl = new java.io.ByteArrayOutputStream()
          vs.foreach { v =>
            val b = java.lang.Double.doubleToLongBits(v)
            var i = 0
            while (i < 8) { dl.write(((b >>> (8 * i)) & 0xFF).toInt); i += 1 }
          }
          writeLen(hm, field, dl.toByteArray)
        }
        // float-form count/zero_count always write — their presence IS
        // the form marker (see the v1 encoder)
        dbl(2, h.count)
        if (java.lang.Double.doubleToRawLongBits(h.sum) != 0L) dbl(3, h.sum)
        writeVarint(hm, (4L << 3) | 0L)
        writeVarint(hm, zz(h.schema.toLong))
        dbl(7, h.zeroCount)
        h.negOffs.zip(h.negLens).foreach { case (o, l) =>
          val sp = new java.io.ByteArrayOutputStream()
          writeVarint(sp, (1L << 3) | 0L); writeVarint(sp, zz(o.toLong))
          writeVarint(sp, (2L << 3) | 0L); writeVarint(sp, l.toLong)
          writeLen(hm, 8, sp.toByteArray)
        }
        packed(10, h.negCounts)
        h.offs.zip(h.lens).foreach { case (o, l) =>
          val sp = new java.io.ByteArrayOutputStream()
          writeVarint(sp, (1L << 3) | 0L); writeVarint(sp, zz(o.toLong))
          writeVarint(sp, (2L << 3) | 0L); writeVarint(sp, l.toLong)
          writeLen(hm, 11, sp.toByteArray)
        }
        packed(13, h.counts)
        if (h.resetHint != 0) { // reset_hint, field 14 (GAUGE marks a
          // gauge-type native histogram: no reset semantics)
          writeVarint(hm, (14L << 3) | 0L)
          writeVarint(hm, h.resetHint.toLong)
        }
        writeVarint(hm, (15L << 3) | 0L)
        writeVarint(hm, h.tsMs)
        writeLen(ts, 3, hm.toByteArray)
      }
      if (s.createdTsMs != 0L) { // created_timestamp, field 6
        writeVarint(ts, (6L << 3) | 0L)
        writeVarint(ts, s.createdTsMs)
      }
      ts.toByteArray
    }
    val req = new java.io.ByteArrayOutputStream()
    table.keys.foreach(s => writeLen(req, 4, utf8(s)))
    tsBlocks.foreach(b => writeLen(req, 5, b))
    req.toByteArray
  }

  /** Prometheus 3.x created-timestamp ingestion over remote-write 2.0:
    * a series whose `created_timestamp` strictly precedes its first
    * sample materializes the counter's BIRTH as a synthetic zero
    * sample AT the CT — upstream's CTZeroIngestion — so `rate`/
    * `increase` downstream count the first sample's full mass instead
    * of losing it to the unknown series start (the counter-start mass
    * loss 3.x's created-timestamp work exists to close). Applied where
    * the v2 door normalizes to the 1.0 stream wire shape (the v1 wire
    * has no CT field, so the zero sample IS the carry). No-op when CT
    * is absent (0) or not strictly before the first sample; float
    * samples only (native-histogram CT zero-injection is a documented
    * bound — the engine's histogram gates are all sample-complete).
    */
  def withCtZero(series: Vector[Series]): Vector[Series] =
    series.map { s =>
      if (s.createdTsMs > 0L && s.samples.nonEmpty &&
          s.createdTsMs < s.samples.map(_._2).min)
        s.copy(samples = (0.0, s.createdTsMs) +: s.samples)
      else s
    }

  /** The 2.0 protocol's content type on the wire; 1.0 senders use
    * plain `application/x-protobuf` (or omit the proto= parameter).
    */
  val V2ContentType =
    "application/x-protobuf;proto=io.prometheus.write.v2.Request"

  /** One snappy-framed remote-write POST — an `object` member so
    * executor-side closures (the backfill's per-partition pushers) can
    * call it without capturing any driver state. Returns the HTTP code,
    * or -1 on transport failure.
    */
  private[graft] def post(url: String, body: Array[Byte]): Int =
    try {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/x-protobuf")
      conn.setRequestProperty("Content-Encoding", "snappy")
      try {
        val os = conn.getOutputStream
        try os.write(body) finally os.close()
        conn.getResponseCode
      } finally conn.disconnect()
    } catch { case _: Exception => -1 }

  /** Upstream's retry policy: transport failures, 429, and 5xx are
    * RECOVERABLE (the receiver may come back); other 4xx are the
    * sender's own fault and retrying would re-fail forever.
    */
  private[graft] def isRecoverable(code: Int): Boolean =
    code == -1 || code == 429 || code / 100 == 5

  /** [[post]] with upstream's queue-manager retry semantics, bounded:
    * recoverable failures re-send after exponential backoff
    * (`minBackoffMs`, doubling, capped at `maxBackoffMs`) up to
    * `maxRetries` re-sends, then the batch DROPS with the failure code
    * visible to the caller's accounting — the in-memory per-shard retry
    * queue of a remote-write shard, collapsed to its per-batch reading
    * (each executor partition IS a shard here, and the batch in hand is
    * its queue head; upstream likewise blocks a shard on its head
    * batch, so bounded in-order retry is the same behavior with a
    * drop bound). Unrecoverable 4xx returns immediately. `sleep` is
    * injectable so specs don't wait wall-clock.
    */
  private[graft] def postWithRetry(url: String, body: Array[Byte],
      maxRetries: Int = 4, minBackoffMs: Long = 50,
      maxBackoffMs: Long = 5000,
      sleep: Long => Unit = Thread.sleep): Int = {
    var code = post(url, body)
    var backoff = minBackoffMs
    var attempt = 0
    while (isRecoverable(code) && attempt < maxRetries) {
      sleep(backoff)
      backoff = math.min(backoff * 2, maxBackoffMs)
      attempt += 1
      code = post(url, body)
    }
    code
  }

  /** The wire framing: remote write bodies are snappy BLOCK format. */
  def compress(proto: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.compress(proto)

  def uncompress(body: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.uncompress(body)

  /** Relational decode of `(recv_ts, proto)` payload rows → one
    * `(recv_ts, labels, value, ts_ms)` row per (series, sample), via
    * the registered generator — stateless column ops, so the same
    * expression tree serves the a1i gate (batch) and the sink (stream).
    */
  def decode(payloads: DataFrame): DataFrame = {
    graft.plans.RemoteWriteDecodeExpr.register(payloads.sparkSession)
    payloads.select(col("recv_ts"),
      expr("prom_rw_decode(proto)").as(Seq("labels", "value", "ts_ms")))
  }

  /** Decoded samples as the events-table schema, so the standard ingest
    * adapter ([[graft.operators.Metrics.metricEventsOf]]) and every
    * streaming operator behind it apply unchanged. The SAMPLE timestamp
    * is the event time (remote write carries per-sample times, unlike a
    * scrape's single instant); `_total` suffixes strip back to the
    * family name (senders forward series as exposed); `event_id` is a
    * deterministic hash of (sample time, series), so re-sent payloads
    * dedup under the engine's exact-dedup guard.
    */
  def toEvents(samples: DataFrame): DataFrame = {
    val name = regexp_replace(element_at(col("labels"), "__name__"),
      "_total$", "")
    val k = coalesce(element_at(col("labels"), "k"), lit(""))
    samples.select(
      xxhash64(col("ts_ms"), name, k).as("event_id"),
      timestamp_millis(col("ts_ms")).as("ts"),
      lit(1L).as("user_id"),
      name.as("event_type"),
      col("value"),
      concat(lit("{\"k\": \""), k, lit("\"}")).as("props"))
  }

  /** a1i — the wire-decode gate, b37c's remote-write sibling: a payload
    * this engine did NOT encode, spelled as LITERAL bytes hand-derived
    * from the public wire format (every byte justified in the comments
    * below), decoded by the generator; the DuckDB oracle is the
    * hand-derived sample relation, so the gate fails if the decoder
    * ever mis-reads a tag, varint, length, or little-endian double.
    *
    * Shapes covered: multi-label/multi-sample series; samples BEFORE
    * labels (field order is free in protobuf); an exemplar field and an
    * unknown varint field inside a series (skip by wire type); a
    * labels-only series (no sample rows); a top-level metadata field;
    * a negative double; multi-byte varint timestamps.
    */
  def wireDecode(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // WriteRequest, hand-assembled (tag = field<<3 | wiretype):
    //   0A 58  timeseries#1, 88 bytes:
    //     0A 1A  label: 0A 08 "__name__" 12 0E "purchase_total"
    //     0A 14  label: 0A 08 "instance" 12 08 "box:9090"
    //     0A 07  label: 0A 01 "k" 12 02 "eu"
    //     12 0C  sample: 09 <3.5 LE: 0x400C000000000000> 10 E8 07 (=1000)
    //     12 0D  sample: 09 <4.25 LE: 0x4011000000000000> 10 C8 DC 03 (=61000)
    //   0A 3D  timeseries#2, 61 bytes (samples FIRST, interleaved fields):
    //     12 0D  sample: 09 <-1.5 LE: 0xBFF8000000000000> 10 E0 A7 12 (=300000)
    //     0A 14  label: 0A 08 "__name__" 12 08 "cpu_temp"
    //     1A 0B  exemplar: 11 <9.0 LE> 18 01 (value 9.0 at ts 1 —
    //            decoded since a1p; this gate doesn't project it)
    //     0A 07  label: 0A 01 "k" 12 02 "us"
    //     28 07  unknown varint field 5 (skipped)
    //   0A 12  timeseries#3, 18 bytes (labels only -> no rows):
    //     0A 10  label: 0A 08 "__name__" 12 04 "idle"
    //   1A 02 08 01  metadata (field 3, skipped)
    val payload = hexBytes(
      "0A58" +
        "0A1A" + "0A085F5F6E616D655F5F" + "120E" + "707572636861" +
        "73655F746F74616C" +
        "0A14" + "0A08696E7374616E6365" + "1208" + "626F783A39303930" +
        "0A07" + "0A016B" + "12026575" +
        "120C" + "09000000000000" + "0C40" + "10E807" +
        "120D" + "09000000000000" + "1140" + "10C8DC03" +
        "0A3D" +
        "120D" + "09000000000000" + "F8BF" + "10E0A712" +
        "0A14" + "0A085F5F6E616D655F5F" + "1208" + "6370755F74656D70" +
        "1A0B" + "11000000000000" + "2240" + "1801" +
        "0A07" + "0A016B" + "12027573" +
        "2807" +
        "0A12" +
        "0A10" + "0A085F5F6E616D655F5F" + "1204" + "69646C65" +
        "1A020801")
    val payloads = Seq(payload).toDF("proto")
      .withColumn("recv_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    decode(payloads)
      .select(
        element_at(col("labels"), "__name__").as("metric"),
        coalesce(element_at(col("labels"), "instance"), lit("")).as("instance"),
        element_at(col("labels"), "k").as("label_k"),
        col("ts_ms"), col("value"))
      .orderBy(col("metric"), col("ts_ms"))
  }

  /** Relational decode of native-histogram payloads: `(recv_ts, proto)`
    * rows → one `(recv_ts, labels, ts_ms, schema, count, sum,
    * zero_count, offs, lens, deltas)` row per (series, histogram), via
    * the second generator.
    */
  def decodeHist(payloads: DataFrame): DataFrame = {
    graft.plans.RemoteWriteDecodeExpr.register(payloads.sparkSession)
    payloads.select(col("recv_ts"),
      expr("prom_rw_decode_hist(proto)")
        .as(Seq("labels", "ts_ms", "schema", "count", "sum", "zero_count",
          "offs", "lens", "deltas", "neg_offs", "neg_lens", "neg_deltas",
          "reset_hint")))
  }

  /** Relational decode of FLOAT-form native-histogram payloads — the
    * float twin of [[decodeHist]] (absolute double bucket counts ride
    * under the same `deltas`/`neg_deltas` column names, double-typed,
    * so the family registry and the quantile walk are shape-compatible
    * in ABSOLUTE mode).
    */
  def decodeFHist(payloads: DataFrame): DataFrame = {
    graft.plans.RemoteWriteDecodeExpr.register(payloads.sparkSession)
    payloads.select(col("recv_ts"),
      expr("prom_rw_decode_fhist(proto)")
        .as(Seq("labels", "ts_ms", "schema", "count", "sum", "zero_count",
          "offs", "lens", "deltas", "neg_offs", "neg_lens", "neg_deltas",
          "reset_hint")))
  }

  /** a1j — native histograms over remote write, b37c carried onto the
    * push wire: a hand-assembled payload whose `TimeSeries` rows carry
    * prompb `Histogram` messages (field 4) — zigzag sint32 schema and
    * span offsets, packed zigzag delta chains, skipped count/sum
    * fields — decoded by the generator and walked to absolute bucket
    * counts by the SAME relational span walk as the scrape-side ingest
    * ([[graft.operators.Metrics.decodeWireSpans]], keyed per histogram
    * sample). The DuckDB oracle is the hand-derived bucket relation.
    */
  def wireDecodeHist(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // WriteRequest, hand-assembled:
    //   0A 40  timeseries#1, 64 bytes:
    //     0A 12  label: 0A 08 "__name__" 12 06 "req_ms"
    //     0A 06  label: 0A 01 "k" 12 01 "a"
    //     22 22  histogram, 34 bytes:
    //       08 0D           count_int = 13 (decoded; unused by this gate)
    //       19 <7.5 LE: 0x401E000000000000>  sum (decoded; unused here)
    //       20 06           schema: zigzag(3) = 6
    //       5A 04 08 00 10 02   span {offset zigzag(0), length 2}
    //       5A 04 08 06 10 02   span {offset zigzag(3), length 2}
    //       62 04 06 01 04 00   packed deltas: zigzag [3, -1, 2, 0]
    //       78 E8 07        timestamp = 1000
    //   0A 2E  timeseries#2, 46 bytes:
    //     0A 12  label: __name__ = "req_ms"
    //     0A 06  label: k = "b"
    //     22 10  histogram, 16 bytes:
    //       20 06           schema: zigzag(3) = 6
    //       5A 04 08 03 10 01   span {offset zigzag(-2) = 3, length 1}
    //       62 01 0E        packed deltas: zigzag [7] = 0x0E
    //       70 03           reset_hint = GAUGE (field 14 — carried
    //                       relationally since r16, pinned here)
    //       78 D0 0F        timestamp = 2000
    val payload = hexBytes(
      "0A40" +
        "0A12" + "0A085F5F6E616D655F5F" + "1206" + "7265715F6D73" +
        "0A06" + "0A016B" + "120161" +
        "2222" +
        "080D" +
        "19" + "0000000000001E40" +
        "2006" +
        "5A0408001002" + "5A0408061002" +
        "620406010400" +
        "78E807" +
      "0A2E" +
        "0A12" + "0A085F5F6E616D655F5F" + "1206" + "7265715F6D73" +
        "0A06" + "0A016B" + "120162" +
        "2210" +
        "2006" +
        "5A0408031001" +
        "62010E" +
        "7003" +
        "78D00F")
    val payloads = Seq(payload).toDF("proto")
      .withColumn("recv_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val hists = decodeHist(payloads).select(
      element_at(col("labels"), "__name__").as("metric"),
      element_at(col("labels"), "k").as("label_k"),
      col("ts_ms"), col("schema"), col("reset_hint"),
      col("offs"), col("lens"), col("deltas"))
    graft.operators.Metrics
      .decodeWireSpans(hists,
        Seq("metric", "label_k", "ts_ms", "schema", "reset_hint"))
      .orderBy(col("metric"), col("label_k"), col("ts_ms"), col("bucket"))
  }

  /** a1k — remote write 2.0, the symbol-table protocol: a hand-built
    * `io.prometheus.write.v2.Request` whose timeseries PRECEDE the
    * symbols they reference (wire field order is free — the walker must
    * gather both before resolving), labels as packed uint32 ref pairs
    * into the interned table (symbols[0] = "" per spec), plus a skipped
    * reserved field. [[walkV2]] resolves the refs; the relation then
    * flows through the SAME normalized decode as every 1.0 payload
    * (re-encode → generator — both independently gated by a1i), and the
    * DuckDB oracle is the hand-derived sample relation.
    */
  def wireDecodeV2(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // v2 Request, hand-assembled (field 4 = symbols, field 5 = timeseries):
    //   08 01  reserved field 1 varint (skipped)
    //   2A 16  timeseries#1, 22 bytes:
    //     0A 06 01 02 03 04 05 06   packed labels_refs [1,2,3,4,5,6]
    //     12 0C 09 <3.5 LE> 10 E8 07   sample (3.5, 1000)
    //   2A 15  timeseries#2, 21 bytes:
    //     0A 04 01 07 03 08         packed labels_refs [1,7,3,8]
    //     12 0D 09 <-1.5 LE> 10 E0 A7 12   sample (-1.5, 300000)
    //   22 00                        symbols[0] = "" (spec-mandated)
    //   22 08 "__name__"             [1]
    //   22 0E "purchase_total"       [2]
    //   22 01 "k"                    [3]
    //   22 02 "eu"                   [4]
    //   22 08 "instance"             [5]
    //   22 08 "box:9090"             [6]
    //   22 08 "cpu_temp"             [7]
    //   22 02 "us"                   [8]
    val payload = hexBytes(
      "0801" +
        "2A16" +
        "0A06" + "010203040506" +
        "120C" + "09000000000000" + "0C40" + "10E807" +
        "2A15" +
        "0A04" + "01070308" +
        "120D" + "09000000000000" + "F8BF" + "10E0A712" +
        "2200" +
        "2208" + "5F5F6E616D655F5F" +
        "220E" + "70757263686173655F746F74616C" +
        "2201" + "6B" +
        "2202" + "6575" +
        "2208" + "696E7374616E6365" +
        "2208" + "626F783A39303930" +
        "2208" + "6370755F74656D70" +
        "2202" + "7573")
    val normalized = encode(walkV2(payload))
    val payloads = Seq(normalized).toDF("proto")
      .withColumn("recv_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    decode(payloads)
      .select(
        element_at(col("labels"), "__name__").as("metric"),
        coalesce(element_at(col("labels"), "instance"), lit("")).as("instance"),
        element_at(col("labels"), "k").as("label_k"),
        col("ts_ms"), col("value"))
      .orderBy(col("metric"), col("ts_ms"))
  }

  /** a1zd — CREATED TIMESTAMPS over remote-write 2.0 close the
    * counter-start mass loss (the Prometheus 3.x counter-birth work):
    * a hand-assembled v2 Request whose first series carries
    * `created_timestamp` (field 6) strictly before its first sample.
    * The door normalization ([[walkV2]] → [[withCtZero]] → [[encode]] →
    * generator — exactly [[RemoteWriteSink.receive]]'s v2 path)
    * materializes the birth as a CT-zero sample, so the reset-aware
    * `increase` below counts the FIRST sample's full mass for the
    * CT-bearing series (6.25: 3.5 birth mass + 0.75 growth + 2.0
    * post-reset) while the CT-less series loses its first sample to
    * the unknown start (4.0 = last − first), upstream's exact
    * semantics. The DuckDB twin re-runs the same lag/reset walk over
    * the hand-derived post-normalization rows.
    */
  def wireCreatedIncrease(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // v2 Request, hand-assembled (field 4 = symbols, field 5 = timeseries):
    //   2A 35  timeseries#1, 53 bytes:
    //     0A 04 01 02 03 04   packed labels_refs [1,2,3,4]
    //     12 0C 09 <3.5 LE: 0x400C...> 10 E8 07      sample (3.5, 1000)
    //     12 0D 09 <4.25 LE: 0x4011...> 10 C8 DC 03  sample (4.25, 61000)
    //     12 0D 09 <2.0 LE: 0x4000...> 10 C0 A9 07   sample (2.0, 120000)
    //     30 F4 03            created_timestamp = 500 (field 6)
    //   2A 23  timeseries#2, 35 bytes (NO created timestamp):
    //     0A 04 01 02 03 05   packed labels_refs [1,2,3,5]
    //     12 0C 09 <3.0 LE: 0x4008...> 10 E8 07      sample (3.0, 1000)
    //     12 0D 09 <7.0 LE: 0x401C...> 10 C8 DC 03   sample (7.0, 61000)
    //   22 00                 symbols[0] = "" (spec-mandated)
    //   22 08 "__name__" [1], 22 0A "jobs_total" [2], 22 01 "k" [3],
    //   22 01 "a" [4], 22 01 "b" [5]
    val payload = hexBytes(
      "2A35" +
        "0A04" + "01020304" +
        "120C" + "09" + "000000000000" + "0C40" + "10E807" +
        "120D" + "09" + "000000000000" + "1140" + "10C8DC03" +
        "120D" + "09" + "000000000000" + "0040" + "10C0A907" +
        "30F403" +
      "2A23" +
        "0A04" + "01020305" +
        "120C" + "09" + "000000000000" + "0840" + "10E807" +
        "120D" + "09" + "000000000000" + "1C40" + "10C8DC03" +
      "2200" +
        "2208" + "5F5F6E616D655F5F" +
        "220A" + "6A6F62735F746F74616C" +
        "2201" + "6B" +
        "2201" + "61" +
        "2201" + "62")
    val normalized = encode(withCtZero(walkV2(payload)))
    val payloads = Seq(normalized).toDF("proto")
      .withColumn("recv_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("metric"), col("label_k")).orderBy(col("ts_ms"))
    decode(payloads)
      .select(element_at(col("labels"), "__name__").as("metric"),
        coalesce(element_at(col("labels"), "k"), lit("")).as("label_k"),
        col("ts_ms"), col("value"))
      .withColumn("dv", col("value") - lag(col("value"), 1).over(w))
      .groupBy(col("metric"), col("label_k"))
      .agg(sum(when(col("dv").isNull, lit(0.0))
        .when(col("dv") >= 0, col("dv"))
        .otherwise(col("value"))).cast("double").as("increase"))
      .orderBy(col("metric"), col("label_k"))
  }

  /** Oracle twin of [[wireCreatedIncrease]]: the post-normalization
    * sample relation derived BY HAND from the wire bytes above — the
    * CT-zero row (0 @ 500 ms) included for the CT-bearing series —
    * through the same lag/reset increase walk.
    */
  val WireCreatedIncreaseSql: String =
    """WITH w(metric, label_k, ts_ms, value) AS (VALUES
      |  ('jobs_total', 'a', CAST(500 AS BIGINT), CAST('0' AS DOUBLE)),
      |  ('jobs_total', 'a', CAST(1000 AS BIGINT), CAST('3.5' AS DOUBLE)),
      |  ('jobs_total', 'a', CAST(61000 AS BIGINT), CAST('4.25' AS DOUBLE)),
      |  ('jobs_total', 'a', CAST(120000 AS BIGINT), CAST('2' AS DOUBLE)),
      |  ('jobs_total', 'b', CAST(1000 AS BIGINT), CAST('3' AS DOUBLE)),
      |  ('jobs_total', 'b', CAST(61000 AS BIGINT), CAST('7' AS DOUBLE))),
      |d AS (SELECT metric, label_k, value,
      |  value - lag(value) OVER (PARTITION BY metric, label_k
      |    ORDER BY ts_ms) AS dv
      |  FROM w)
      |SELECT metric, label_k,
      |  CAST(SUM(CASE WHEN dv IS NULL THEN 0
      |    WHEN dv >= 0 THEN dv ELSE value END) AS DOUBLE) AS increase
      |FROM d GROUP BY metric, label_k
      |ORDER BY metric, label_k""".stripMargin

  /** The live native-histogram FAMILY registry over remote write — the
    * r12 "future work" closed: a native-histogram sample is a COMPLETE
    * snapshot of its series (count, sum, zero bucket, and the sparse
    * ladder all ride in every sample), so family state is pure
    * last-write-wins per series — the gauge convention
    * (`prometheus.cpp:249`'s `Set`, lifted to histograms). One `max_by`
    * hash aggregate on the sample timestamp: map-side combinable, state
    * ∝ series, payload arrays never shuffle more than once.
    */
  def histFamily(hists: DataFrame): DataFrame =
    hists
      .select(element_at(col("labels"), "__name__").as("metric"),
        coalesce(element_at(col("labels"), "k"), lit("")).as("label_k"),
        col("ts_ms"), col("schema"), col("count"), col("sum"),
        col("zero_count"), col("offs"), col("lens"), col("deltas"),
        col("neg_offs"), col("neg_lens"), col("neg_deltas"))
      .groupBy(col("metric"), col("label_k"))
      .agg(
        max_by(struct(col("schema"), col("count"), col("sum"),
          col("zero_count"), col("offs"), col("lens"), col("deltas"),
          col("neg_offs"), col("neg_lens"), col("neg_deltas")),
          col("ts_ms")).as("h"),
        max(col("ts_ms")).as("ts_ms"))
      .select(col("metric"), col("label_k"), col("ts_ms"),
        col("h.schema").as("schema"), col("h.count").as("count"),
        col("h.sum").as("sum"), col("h.zero_count").as("zero_count"),
        col("h.offs").as("offs"), col("h.lens").as("lens"),
        col("h.deltas").as("deltas"), col("h.neg_offs").as("neg_offs"),
        col("h.neg_lens").as("neg_lens"), col("h.neg_deltas").as("neg_deltas"))

  /** The float-family twin of [[histFamily]]: last-write-wins per
    * series over FLOAT-form samples (each is a complete snapshot, like
    * the integer kind).
    */
  def fhistFamily(fhists: DataFrame): DataFrame = histFamily(fhists)

  /** `histogram_quantile(φ)` served straight from the remote-write
    * family state: the wire spans walk to absolute bucket counts through
    * the SAME shared decode as scrape-side ingest
    * ([[graft.operators.Metrics.decodeWireSpans]]), the rank walk and
    * in-bucket interpolation are the engine's pinned native-histogram
    * steps (zero bucket first, `2^((i−1+f)/2^schema)` through the
    * correctly-rounded [[graft.functions.DetMath.exp2Col]] twin), and
    * count/zero come from the sample's own wire fields — so the value
    * hash-gates against a DuckDB twin that re-derives the walk from the
    * hand-decoded bucket relation. Windows touch only series×buckets
    * rows; the rank past the last bucket returns its upper bound and a
    * rank inside the zero bucket returns 0 (the aggregator's rules).
    */
  def familyQuantile(spark: SparkSession, family: DataFrame,
      phi: Double, absolute: Boolean = false): DataFrame = {
    graft.plans.DetMathExprs.register(spark)
    // The TWO-SIDED rank walk (upstream's native-histogram CDF order:
    // negative buckets ascending in VALUE = descending index, then the
    // zero bucket, then positives ascending). Per-series scalars ride
    // THROUGH the span walk as extra key columns, so the whole
    // evaluation is one union of two span walks + one window pass +
    // ONE aggregate — no self-joins of the family lineage (min_by skips
    // null keys, so the ascending-order first candidate wins). The
    // candidate test `eff_cum − c < rank ≤ eff_cum` picks exactly the
    // crossing bucket; a rank inside the zero interval matches no row
    // and renders 0.0; a rank past everything takes the last positive
    // bound (the aggregator's overflow rule).
    val keys = Seq("metric", "label_k", "schema", "count", "sum",
      "zero_count")
    val series = Seq("metric", "label_k").map(col)
    // `absolute = true` is the FLOAT-family mode: the wire carries
    // absolute double counts, not delta chains; every downstream
    // expression (running sums, rank comparisons, interpolation) is
    // type-generic, so one walk serves both sample kinds
    val pos = graft.operators.Metrics
      .decodeWireSpans(family, keys, absolute = absolute)
      .withColumn("side", lit(1))
    val negIn = family.select(keys.map(col) :+
      col("neg_offs").as("offs") :+ col("neg_lens").as("lens") :+
      col("neg_deltas").as("deltas"): _*)
    val neg = graft.operators.Metrics
      .decodeWireSpans(negIn, keys, absolute = absolute)
      .withColumn("side", lit(0))
    val rank = lit(phi) * col("count").cast("double")
    val w = Window.partitionBy(series: _*).orderBy(col("ord"))
    val ws = Window.partitionBy(series: _*)
    val cand = neg.unionByName(pos)
      // ascending-value order: (side, −bucket | bucket)
      .withColumn("ord",
        (col("side").cast("long") * lit(10000000L) +
          when(col("side") === 0, -col("bucket")).otherwise(col("bucket"))
            .cast("long")))
      .withColumn("cum_run", sum(col("bucket_count")).over(w))
      .withColumn("negtot",
        sum(when(col("side") === 0, col("bucket_count")).otherwise(0L))
          .over(ws))
      .withColumn("eff_cum",
        col("cum_run") +
          when(col("side") === 1, col("zero_count")).otherwise(lit(0L)))
      .join(broadcast(graft.operators.Metrics.nhBoundsDf(spark)
        .select(col("bucket"), col("hi"))), Seq("bucket"))
      .withColumn("_isc",
        rank > (col("eff_cum") - col("bucket_count")).cast("double") &&
          rank <= col("eff_cum").cast("double"))
      .withColumn("f",
        (rank - (col("eff_cum") - col("bucket_count")).cast("double"))
          / col("bucket_count").cast("double"))
      .withColumn("xq",
        when(col("side") === 1,
          ((col("bucket") - lit(1)).cast("double") + col("f")))
          .otherwise(col("bucket").cast("double") - col("f"))
          / pow(lit(2.0), col("schema").cast("double")))
      .withColumn("_qv",
        when(col("side") === 1, graft.plans.DetMathExprs.detExp2C(col("xq")))
          .otherwise(-graft.plans.DetMathExprs.detExp2C(col("xq"))))
    cand
      .groupBy(keys.map(col): _*)
      .agg(max(when(col("side") === 1, col("hi"))).as("last_hi"),
        max(col("negtot")).as("negtot"),
        min_by(col("_qv"), when(col("_isc"), col("ord"))).as("qv"))
      .select(series :+ col("count") :+ col("zero_count") :+ col("sum") :+
        when(col("qv").isNotNull, col("qv"))
          .when(rank <= (col("negtot") + col("zero_count")).cast("double"),
            lit(0.0))
          .otherwise(col("last_hi")).as("q"): _*)
  }

  /** a1l — remote-written native histograms land in a LIVE family
    * (r12's declared future work): two pushes where the second
    * supersedes the first for series `a` (last-write-wins at the family,
    * like a later scrape replacing an earlier one), then
    * `histogram_quantile(0.9)` evaluated straight off the family state —
    * wire decode → LWW registry → span walk → pinned interpolation, end
    * to end. Bytes hand-assembled as in a1i/a1j; the DuckDB oracle
    * re-derives the quantile from the HAND-decoded latest bucket
    * relation, so the gate fails if the registry ever serves a stale
    * sample, misreads the new count/sum/zero_count wire fields, or
    * breaks the span walk.
    */
  def wireDecodeFamily(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // push 1 — WriteRequest, hand-assembled:
    //   0A 42  timeseries#1, 66 bytes:
    //     0A 12  label: 0A 08 "__name__" 12 06 "req_ms"
    //     0A 06  label: 0A 01 "k" 12 01 "a"
    //     22 24  histogram, 36 bytes:
    //       08 0F           count_int = 15
    //       19 <7.5 LE: 0x401E000000000000>  sum
    //       20 06           schema: zigzag(3) = 6
    //       30 02           zero_count_int = 2
    //       5A 04 08 00 10 02   span {offset 0, length 2}
    //       5A 04 08 06 10 02   span {offset zigzag(3), length 2}
    //       62 04 06 01 04 00   packed deltas: zigzag [3, -1, 2, 0]
    //       78 E8 07        timestamp = 1000
    //   0A 2E  timeseries#2, 46 bytes:
    //     0A 12  label: __name__ = "req_ms"
    //     0A 06  label: k = "b"
    //     22 10  histogram, 16 bytes:
    //       08 07           count_int = 7
    //       20 06           schema 3
    //       5A 04 08 03 10 01   span {offset zigzag(-2) = 3, length 1}
    //       62 01 0E        packed deltas: zigzag [7]
    //       78 D0 0F        timestamp = 2000
    val push1 = hexBytes(
      "0A42" +
        "0A12" + "0A085F5F6E616D655F5F" + "1206" + "7265715F6D73" +
        "0A06" + "0A016B" + "120161" +
        "2224" +
        "080F" +
        "19" + "0000000000001E40" +
        "2006" +
        "3002" +
        "5A0408001002" + "5A0408061002" +
        "620406010400" +
        "78E807" +
      "0A2E" +
        "0A12" + "0A085F5F6E616D655F5F" + "1206" + "7265715F6D73" +
        "0A06" + "0A016B" + "120162" +
        "2210" +
        "0807" +
        "2006" +
        "5A0408031001" +
        "62010E" +
        "78D00F")
    // push 2 — series a SUPERSEDED at t=3000:
    //   0A 3A  timeseries#1, 58 bytes:
    //     0A 12  label: __name__ = "req_ms"
    //     0A 06  label: k = "a"
    //     22 1C  histogram, 28 bytes:
    //       08 09           count_int = 9
    //       19 <4.25 LE: 0x4011000000000000>  sum
    //       20 06           schema 3
    //       30 01           zero_count_int = 1
    //       5A 04 08 02 10 02   span {offset zigzag(1), length 2}
    //       62 02 0A 03     packed deltas: zigzag [5, -2]
    //       78 B8 17        timestamp = 3000
    val push2 = hexBytes(
      "0A3A" +
        "0A12" + "0A085F5F6E616D655F5F" + "1206" + "7265715F6D73" +
        "0A06" + "0A016B" + "120161" +
        "221C" +
        "0809" +
        "19" + "0000000000001140" +
        "2006" +
        "3001" +
        "5A0408021002" +
        "62020A03" +
        "78B817")
    val payloads = Seq(push1, push2).toDF("proto")
      .withColumn("recv_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    familyQuantile(spark, histFamily(decodeHist(payloads)), 0.9)
      .orderBy(col("metric"), col("label_k"))
  }

  /** Oracle twin of [[wireDecodeFamily]]: the LATEST wire state derived
    * by hand (series a is push 2's snapshot — buckets 1:5, 2:3 from
    * span {1,2} + deltas [5,−2]; series b is push 1's — bucket −2:7),
    * with the rank walk and the pinned exp2 interpolation re-run in SQL
    * (rank 0.9·9 = 8.1 lands in bucket 2 past zero_count 1; rank
    * 0.9·7 = 6.3 lands in bucket −2).
    */
  lazy val WireDecodeFamilySql: String = {
    val interp = graft.functions.DetMath.exp2Sql("xq")
    s"""WITH f(metric, label_k, count, zero_count, sum) AS (VALUES
       |  ('req_ms', 'a', CAST(9 AS BIGINT), CAST(1 AS BIGINT), CAST('4.25' AS DOUBLE)),
       |  ('req_ms', 'b', CAST(7 AS BIGINT), CAST(0 AS BIGINT), CAST('0.0' AS DOUBLE))),
       |bk(metric, label_k, bucket, c) AS (VALUES
       |  ('req_ms', 'a', 1, CAST(5 AS BIGINT)),
       |  ('req_ms', 'a', 2, CAST(3 AS BIGINT)),
       |  ('req_ms', 'b', -2, CAST(7 AS BIGINT))),
       |bounds AS (${graft.operators.Metrics.NhBoundsSql}),
       |bw AS (
       |  SELECT bk.*, SUM(c) OVER (PARTITION BY metric, label_k
       |    ORDER BY bucket) AS cumc FROM bk),
       |bs AS (
       |  SELECT w.metric, w.label_k, MAX(b.hi) AS last_hi
       |  FROM bw w JOIN bounds b ON b.bucket = w.bucket GROUP BY 1, 2),
       |pick AS (
       |  SELECT w.metric, w.label_k, w.bucket,
       |    (CAST('0.9' AS DOUBLE) * CAST(f.count AS DOUBLE)
       |      - CAST(f.zero_count + w.cumc - w.c AS DOUBLE))
       |      / CAST(w.c AS DOUBLE) AS fr,
       |    ROW_NUMBER() OVER (PARTITION BY w.metric, w.label_k
       |      ORDER BY w.bucket) AS rn
       |  FROM bw w JOIN f ON f.metric = w.metric AND f.label_k = w.label_k
       |  WHERE CAST('0.9' AS DOUBLE) * CAST(f.count AS DOUBLE)
       |      > CAST(f.zero_count AS DOUBLE)
       |    AND CAST('0.9' AS DOUBLE) * CAST(f.count AS DOUBLE)
       |      <= CAST(f.zero_count + w.cumc AS DOUBLE)),
       |pq AS (
       |  SELECT metric, label_k, $interp AS qv
       |  FROM (SELECT metric, label_k,
       |          (CAST(bucket - 1 AS DOUBLE) + fr)
       |            / pow(2.0, CAST(3 AS DOUBLE)) AS xq
       |        FROM pick WHERE rn = 1))
       |SELECT f.metric, f.label_k, f.count, f.zero_count, f.sum,
       |  CASE WHEN CAST('0.9' AS DOUBLE) * CAST(f.count AS DOUBLE)
       |         <= CAST(f.zero_count AS DOUBLE) THEN 0.0
       |       WHEN pq.qv IS NOT NULL THEN pq.qv
       |       ELSE bs.last_hi END AS q
       |FROM f
       |LEFT JOIN pq ON pq.metric = f.metric AND pq.label_k = f.label_k
       |LEFT JOIN bs ON bs.metric = f.metric AND bs.label_k = f.label_k
       |ORDER BY f.metric, f.label_k""".stripMargin
  }

  /** Relational decode of exemplars: `(recv_ts, proto)` payload rows →
    * one `(recv_ts, labels, ex_labels, value, ts_ms)` row per (series,
    * exemplar), via the third generator face — the wire feed of the
    * exemplar store (`/api/v1/query_exemplars`).
    */
  def decodeEx(payloads: DataFrame): DataFrame = {
    graft.plans.RemoteWriteDecodeExpr.register(payloads.sparkSession)
    payloads.select(col("recv_ts"),
      expr("prom_rw_decode_ex(proto)")
        .as(Seq("labels", "ex_labels", "value", "ts_ms")))
  }

  /** `histogram_quantile(φ)` over PUSHED classic histogram series —
    * the `_bucket{le=…}` samples any protocol lands (remote write
    * forwards them as plain series; the OTLP door translates explicit-
    * bounds points into them): last-write-wins per (series, le) — a
    * pushed classic bucket sample IS cumulative state — then the
    * b7-gated codegen'd classic interpolation
    * ([[graft.plans.HistogramQuantileExpr]]) over each series' sorted
    * finite-bucket array with the `+Inf` sample as the total. One hash
    * aggregate + one array expression per series; no window passes.
    */
  def classicFamilyQuantile(spark: SparkSession, samples: DataFrame,
      phi: Double): DataFrame = {
    val buckets = samples
      .filter(element_at(col("labels"), "__name__").endsWith("_bucket") &&
        element_at(col("labels"), "le").isNotNull)
      .select(
        regexp_replace(element_at(col("labels"), "__name__"), "_bucket$", "")
          .as("metric"),
        coalesce(element_at(col("labels"), "k"), lit("")).as("label_k"),
        element_at(col("labels"), "le").as("le"),
        col("value"), col("ts_ms"))
    val latest = buckets
      .groupBy(col("metric"), col("label_k"), col("le"))
      .agg(max_by(col("value"), col("ts_ms")).as("cum"))
      .withColumn("cum_l", col("cum").cast("long"))
      .withColumn("le_d",
        when(col("le") === "+Inf", lit(Double.PositiveInfinity))
          .otherwise(col("le").cast("double")))
    latest.groupBy(col("metric"), col("label_k"))
      .agg(
        sort_array(collect_list(when(col("le") =!= "+Inf",
          struct(col("le_d").as("le"), col("cum_l").as("cum"))))).as("arr"),
        max(when(col("le") === "+Inf", col("cum_l"))).as("count"))
      .select(col("metric"), col("label_k"), col("count"),
        graft.plans.HistogramQuantileExpr.histogramQuantile(spark,
          s"${phi}d", "transform(arr, x -> x.le)",
          "transform(arr, x -> x.cum)", "count").as("q"))
  }

  /** The NHCB CONVERTER — Prometheus 3.x's `convert_classic_histograms`
    * path: a scraped/pushed CLASSIC `le`-ladder family becomes a NATIVE
    * histogram family with CUSTOM BUCKETS (schema −53, the public NHCB
    * encoding: `custom_values` = the sorted finite `le` bounds, sparse
    * positive buckets over indexes 0..n where index i < n covers
    * (v[i−1], v[i]] and index n is the +Inf arm, counts
    * NON-cumulative, no zero bucket). Input is the decoded sample
    * relation (the a1s shape: `_bucket{le}` / `_sum` / `_count`
    * series); output is one family row per (series, instant) in the
    * [[histFamily]] registry shape plus a `custom_values` column —
    * callers keep last-write-wins per series exactly like any family.
    *
    * One hash aggregate per (series, instant) + array expressions —
    * the ladder never self-joins; a NON-MONOTONE ladder (a decreasing
    * cumulative bucket) fails LOUD via raise_error, the A8 runtime-
    * validation convention.
    */
  def convertClassicToNhcb(samples: DataFrame): DataFrame = {
    val nm = element_at(col("labels"), "__name__")
    val rows = samples
      .filter(nm.rlike("_(bucket|sum|count)$"))
      .select(
        regexp_replace(nm, "_(bucket|sum|count)$", "").as("metric"),
        regexp_extract(nm, "_(bucket|sum|count)$", 1).as("part"),
        coalesce(element_at(col("labels"), "k"), lit("")).as("label_k"),
        element_at(col("labels"), "le").as("le"),
        col("ts_ms"), col("value"))
    val perInstant = rows
      .groupBy(col("metric"), col("label_k"), col("ts_ms"))
      .agg(
        sort_array(collect_list(when(
          col("part") === "bucket" && col("le") =!= "+Inf",
          struct(col("le").cast("double").as("le"),
            col("value").as("cum"))))).as("bk"),
        max(when(col("part") === "bucket" && col("le") === "+Inf",
          col("value"))).as("inf"),
        max(when(col("part") === "sum", col("value"))).as("sum"))
    val n = size(col("bk"))
    val cums = transform(col("bk"), b => b.getField("cum"))
    // the cumulative ladder un-summed: bucket 0 keeps its count, i > 0
    // subtracts the previous bound's cumulative, the +Inf arm closes
    // against the total
    val deltas = concat(
      transform(col("bk"), (b, i) =>
        when(i === 0, b.getField("cum"))
          .otherwise(b.getField("cum") - element_at(cums, i))),
      array(when(n === 0, coalesce(col("inf"), lit(0.0)))
        .otherwise(col("inf") - element_at(cums, n))))
    perInstant
      .withColumn("_deltas_d", deltas)
      .select(col("metric"), col("label_k"), col("ts_ms"),
        lit(-53).as("schema"),
        // the monotonicity guard rides the count column so pruning
        // can never drop it: a decreasing cumulative ladder raises
        when(exists(col("_deltas_d"), d => d < 0),
          raise_error(concat(
            lit("non-monotone classic ladder for "), col("metric")))
            .cast("double"))
          .otherwise(col("inf")).cast("long").as("count"),
        col("sum"),
        lit(0L).as("zero_count"),
        array(lit(0)).as("offs"),
        array(size(col("_deltas_d"))).as("lens"),
        col("_deltas_d").cast("array<bigint>").as("deltas"),
        array().cast("array<int>").as("neg_offs"),
        array().cast("array<int>").as("neg_lens"),
        array().cast("array<bigint>").as("neg_deltas"),
        transform(col("bk"), b => b.getField("le")).as("custom_values"))
  }

  /** `histogram_quantile(φ)` on an NHCB family — the native dispatch
    * for schema −53: the sparse buckets explode per index, bounds come
    * from `custom_values` (index i < n spans (v[i−1], v[i]], the +Inf
    * arm sits past v[n−1]), and the in-bucket interpolation is LINEAR —
    * upstream's custom-bucket quantile is the classic interpolation on
    * the custom ladder (lower bound 0 before the first bucket; a rank
    * past the last finite bound returns that bound), so a CONVERTED
    * family answers exactly like its classic source — the a1ze gate
    * pins this against a DuckDB walk over the custom bounds, and a1t's
    * classic answer is the same 0.95.
    */
  def nhcbFamilyQuantile(spark: SparkSession, family: DataFrame,
      phi: Double): DataFrame = {
    val series = Seq("metric", "label_k").map(col)
    val b = family.select(
      col("metric"), col("label_k"), col("schema"), col("count"),
      col("sum"), col("custom_values"),
      posexplode(col("deltas")).as(Seq("bucket", "c")))
    val n = size(col("custom_values"))
    val w = Window.partitionBy(series: _*).orderBy(col("bucket"))
    val rank = lit(phi) * col("count").cast("double")
    val cand = b
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("prev", col("cum") - col("c"))
      .withColumn("lo", when(col("bucket") === 0, lit(0.0))
        .otherwise(element_at(col("custom_values"), col("bucket"))))
      .withColumn("hi", when(col("bucket") < n,
        element_at(col("custom_values"), col("bucket") + 1)))
      .withColumn("_isc", col("bucket") < n &&
        rank > col("prev").cast("double") &&
        rank <= col("cum").cast("double"))
      .withColumn("_qv", col("lo") + (col("hi") - col("lo")) *
        (rank - col("prev").cast("double")) / col("c").cast("double"))
    cand
      .groupBy(col("metric"), col("label_k"), col("schema"),
        col("count"), col("sum"))
      .agg(
        max(when(col("bucket") < n, col("hi"))).as("last_hi"),
        min_by(col("_qv"), when(col("_isc"), col("bucket"))).as("qv"))
      .select(col("metric"), col("label_k"), col("schema"), col("count"),
        when(col("qv").isNotNull, col("qv"))
          .otherwise(col("last_hi")).as("q"))
  }

  /** a1p — EXEMPLARS over the wire (prompb `TimeSeries.exemplars`,
    * field 3 — previously skipped): a hand-assembled payload whose
    * series carries two trace-id exemplars next to its sample, decoded
    * by the third generator face into the exemplar store's wire feed;
    * a no-exemplar series contributes no rows. The DuckDB oracle is the
    * hand-derived exemplar relation.
    */
  def wireDecodeExemplars(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // WriteRequest, hand-assembled:
    //   0A 66  timeseries#1, 102 bytes:
    //     0A 12  label: 0A 08 "__name__" 12 06 "req_ms"
    //     0A 06  label: 0A 01 "k" 12 01 "a"
    //     12 0C  sample: 09 <0.5 LE: 0x3FE0000000000000> 10 E8 07 (=1000)
    //     1A 1C  exemplar, 28 bytes:
    //       0A 0E  label: 0A 08 "trace_id" 12 02 "t1"
    //       11 <0.25 LE: 0x3FD0000000000000>   value
    //       18 84 07                            timestamp = 900
    //     1A 1C  exemplar, 28 bytes:
    //       0A 0E  label: trace_id = "t2"
    //       11 <7.5 LE: 0x401E000000000000>    value
    //       18 B6 07                            timestamp = 950
    //   0A 1F  timeseries#2, 31 bytes (no exemplars -> no rows):
    //     0A 10  label: __name__ = "idle"
    //     12 0B  sample: 09 <1.0 LE: 0x3FF0000000000000> 10 01
    val payload = hexBytes(
      "0A66" +
        "0A12" + "0A085F5F6E616D655F5F" + "1206" + "7265715F6D73" +
        "0A06" + "0A016B" + "120161" +
        "120C" + "09000000000000" + "E03F" + "10E807" +
        "1A1C" +
        "0A0E" + "0A0874726163655F6964" + "12027431" +
        "11" + "000000000000D03F" +
        "188407" +
        "1A1C" +
        "0A0E" + "0A0874726163655F6964" + "12027432" +
        "11" + "0000000000001E40" +
        "18B607" +
      "0A1F" +
        "0A10" + "0A085F5F6E616D655F5F" + "1204" + "69646C65" +
        "120B" + "09000000000000" + "F03F" + "1001")
    val payloads = Seq(payload).toDF("proto")
      .withColumn("recv_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    decodeEx(payloads)
      .select(
        element_at(col("labels"), "__name__").as("metric"),
        element_at(col("labels"), "k").as("label_k"),
        element_at(col("ex_labels"), "trace_id").as("trace_id"),
        col("ts_ms"), col("value"))
      .orderBy(col("ts_ms"))
  }

  /** Oracle twin of [[wireDecodeExemplars]]: the hand-derived exemplar
    * relation (series 2 has none).
    */
  val WireDecodeExemplarsSql: String =
    """SELECT * FROM (VALUES
      |  ('req_ms', 'a', 't1', CAST(900 AS BIGINT), CAST('0.25' AS DOUBLE)),
      |  ('req_ms', 'a', 't2', CAST(950 AS BIGINT), CAST('7.5' AS DOUBLE))
      |) w(metric, label_k, trace_id, ts_ms, value)
      |ORDER BY ts_ms""".stripMargin

  /** a1o — NEGATIVE buckets over the wire (prompb `negative_spans`/
    * `negative_deltas`, fields 8/9): a hand-assembled payload whose
    * histogram observes on BOTH sides of zero, walked by the same span
    * decode (sign-agnostic), served through the TWO-SIDED rank walk —
    * upstream's native-histogram CDF order (negatives ascending in
    * value, zero bucket, positives) with the mirrored interpolation
    * `−2^((i−f)/2^s)` on the negative side. φ = 0.25 lands one series
    * in a negative bucket and the other in its zero bucket; the DuckDB
    * oracle re-runs the whole two-sided walk from the hand-decoded
    * signed bucket relation.
    */
  def wireDecodeNegative(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // WriteRequest, hand-assembled:
    //   0A 4D  timeseries#1, 77 bytes:
    //     0A 16  label: 0A 08 "__name__" 12 0A "temp_delta"
    //     0A 06  label: 0A 01 "k" 12 01 "n"
    //     22 2B  histogram, 43 bytes:
    //       08 0A           count_int = 10
    //       19 <-2.5 LE: 0xC004000000000000>  sum
    //       20 06           schema: zigzag(3) = 6
    //       30 01           zero_count_int = 1
    //       42 04 08 02 10 01   negative span {offset zigzag(1), len 1}
    //       42 04 08 02 10 01   negative span {offset zigzag(1), len 1}
    //         -> neg buckets: idx 1 (first span, absolute start 1) and
    //            idx 3 (gap 1 past the previous span's end 2)
    //       4A 02 08 03     packed negative deltas: zigzag [4, -2]
    //         -> neg counts: idx 1: 4, idx 3: 2
    //       5A 04 08 02 10 01   positive span {offset zigzag(1), len 1}
    //       62 01 06        packed deltas: zigzag [3] -> pos idx 1: 3
    //       78 E8 07        timestamp = 1000
    //   0A 34  timeseries#2, 52 bytes:
    //     0A 16  label: __name__ = "temp_delta"
    //     0A 06  label: k = "p"
    //     22 12  histogram, 18 bytes:
    //       08 04           count_int = 4
    //       20 06           schema 3
    //       30 02           zero_count_int = 2
    //       5A 04 08 04 10 01   positive span {offset zigzag(2), len 1}
    //       62 01 04        packed deltas: zigzag [2] -> pos idx 2: 2
    //       78 E8 07        timestamp = 1000
    val payloads = Seq(negativePayload).toDF("proto")
      .withColumn("recv_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    familyQuantile(spark, histFamily(decodeHist(payloads)), 0.25)
      .orderBy(col("metric"), col("label_k"))
  }

  /** The a1o/a1r shared payload — byte derivation in
    * [[wireDecodeNegative]]'s comments.
    */
  private[graft] lazy val negativePayload: Array[Byte] = hexBytes(
    "0A4D" +
      "0A16" + "0A085F5F6E616D655F5F" + "120A" + "74656D705F64656C7461" +
      "0A06" + "0A016B" + "12016E" +
      "222B" +
      "080A" +
      "19" + "00000000000004C0" +
      "2006" +
      "3001" +
      "4204" + "08021001" +
      "4204" + "08021001" +
      "4A02" + "0803" +
      "5A04" + "08021001" +
      "6201" + "06" +
      "78E807" +
    "0A34" +
      "0A16" + "0A085F5F6E616D655F5F" + "120A" + "74656D705F64656C7461" +
      "0A06" + "0A016B" + "120170" +
      "2212" +
      "0804" +
      "2006" +
      "3002" +
      "5A04" + "08041001" +
      "6201" + "04" +
      "78E807")

  /** `histogram_fraction(lo, hi)` over the remote-write family state,
    * NON-NEGATIVE bounds: the boundary constants' libm math runs once
    * at compose time ([[graft.functions.NativeHistogramAggregator
    * .fractionPieces]], the scrape-side convention) and the runtime
    * plan is ONE aggregate over the positive bucket ladder — negative
    * buckets sit below any non-negative bound on BOTH sides of the
    * F(hi) − F(lo) difference, so they cancel out of the numerator and
    * only the wire `count` (the denominator) sees them. Negative
    * bounds refuse loudly (the mirrored negative-side pieces are not
    * implemented — a documented bound).
    */
  def familyFraction(spark: SparkSession, family: DataFrame,
      lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi >= 0,
      "wire-family histogram_fraction supports non-negative bounds")
    val schema = graft.operators.Metrics.NhSchema
    val (bLo, fLo, zLo) = graft.functions.NativeHistogramAggregator
      .fractionPieces(lo, schema)
    val (bHi, fHi, zHi) = graft.functions.NativeHistogramAggregator
      .fractionPieces(hi, schema)
    val keys = Seq("metric", "label_k", "schema", "count", "sum",
      "zero_count")
    val series = Seq("metric", "label_k").map(col)
    val sums = graft.operators.Metrics.decodeWireSpans(family, keys)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(when(col("bucket") < bHi, col("bucket_count")).otherwise(0L))
          .as("below_hi"),
        sum(when(col("bucket") === bHi, col("bucket_count")).otherwise(0L))
          .as("at_hi"),
        sum(when(col("bucket") < bLo, col("bucket_count")).otherwise(0L))
          .as("below_lo"),
        sum(when(col("bucket") === bLo, col("bucket_count")).otherwise(0L))
          .as("at_lo"))
    def F(zInc: Boolean, below: String, at: String,
        fx: Double): org.apache.spark.sql.Column =
      ((if (zInc) col("zero_count") else lit(0L)) + col(below)).cast("double") +
        col(at).cast("double") * lit(fx)
    sums.select(series :+ col("count") :+
      ((F(zHi, "below_hi", "at_hi", fHi) - F(zLo, "below_lo", "at_lo", fLo))
        / col("count").cast("double")).as("frac"): _*)
  }

  /** a1r — `histogram_fraction(0, 1.12)` straight off the remote-write
    * family (the a1o payload's two-sided state): the positive ladder's
    * interpolated mass between the bounds over the WIRE count — series
    * n's negatives are denominator-only, series p's fraction is pure
    * in-bucket interpolation. The DuckDB oracle re-derives both from
    * the hand-decoded buckets with the same compose-time literals.
    */
  def wireDecodeFraction(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val payloads = Seq(negativePayload).toDF("proto")
      .withColumn("recv_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    familyFraction(spark, histFamily(decodeHist(payloads)), 0.0, 1.12)
      .orderBy(col("metric"), col("label_k"))
  }

  /** Oracle twin of [[wireDecodeFraction]]: the positive bucket
    * relation by hand (n: 1:3; p: 2:2) with the SAME compose-time
    * pieces — F(1.12) lands in bucket 2 with its log-interpolated
    * in-bucket fraction, F(0) is the zero bucket alone; negatives
    * cancel and only inflate the count.
    */
  lazy val WireDecodeFractionSql: String = {
    val schema = graft.operators.Metrics.NhSchema
    val (bLo, fLo, _) = graft.functions.NativeHistogramAggregator
      .fractionPieces(0.0, schema)
    val (bHi, fHi, _) = graft.functions.NativeHistogramAggregator
      .fractionPieces(1.12, schema)
    s"""WITH f(metric, label_k, count, zero_count) AS (VALUES
       |  ('temp_delta', 'n', CAST(10 AS BIGINT), CAST(1 AS BIGINT)),
       |  ('temp_delta', 'p', CAST(4 AS BIGINT), CAST(2 AS BIGINT))),
       |bk(metric, label_k, bucket, c) AS (VALUES
       |  ('temp_delta', 'n', 1, CAST(3 AS BIGINT)),
       |  ('temp_delta', 'p', 2, CAST(2 AS BIGINT))),
       |s AS (
       |  SELECT metric, label_k,
       |    CAST(SUM(CASE WHEN bucket < $bHi THEN c ELSE 0 END) AS BIGINT) AS below_hi,
       |    CAST(SUM(CASE WHEN bucket = $bHi THEN c ELSE 0 END) AS BIGINT) AS at_hi,
       |    CAST(SUM(CASE WHEN bucket < $bLo THEN c ELSE 0 END) AS BIGINT) AS below_lo,
       |    CAST(SUM(CASE WHEN bucket = $bLo THEN c ELSE 0 END) AS BIGINT) AS at_lo
       |  FROM bk GROUP BY 1, 2)
       |SELECT f.metric, f.label_k, f.count,
       |  ((CAST(f.zero_count + COALESCE(s.below_hi, 0) AS DOUBLE)
       |      + CAST(COALESCE(s.at_hi, 0) AS DOUBLE) * CAST('$fHi' AS DOUBLE))
       |   - (CAST(f.zero_count + COALESCE(s.below_lo, 0) AS DOUBLE)
       |      + CAST(COALESCE(s.at_lo, 0) AS DOUBLE) * CAST('$fLo' AS DOUBLE)))
       |  / CAST(f.count AS DOUBLE) AS frac
       |FROM f
       |LEFT JOIN s ON s.metric = f.metric AND s.label_k = f.label_k
       |ORDER BY f.metric, f.label_k""".stripMargin
  }

  /** Oracle twin of [[wireDecodeNegative]]: the signed bucket relation
    * derived by hand (series n: neg idx 1 count 4 and idx 3 count 2 —
    * span gap arithmetic in the payload comments — pos idx 1 count 3;
    * series p: pos idx 2 count 2), then the SAME two-sided walk in SQL:
    * rank 0.25·10 = 2.5 crosses the negative bucket 1 (the 2nd in
    * ascending-value order), f = (2.5−2)/4, q = −2^((1−f)/8); rank
    * 0.25·4 = 1 sits inside p's zero bucket → 0.0.
    */
  lazy val WireDecodeNegativeSql: String = {
    val interp = graft.functions.DetMath.exp2Sql("xq")
    s"""WITH f(metric, label_k, count, zero_count, sum) AS (VALUES
       |  ('temp_delta', 'n', CAST(10 AS BIGINT), CAST(1 AS BIGINT), CAST('-2.5' AS DOUBLE)),
       |  ('temp_delta', 'p', CAST(4 AS BIGINT), CAST(2 AS BIGINT), CAST('0.0' AS DOUBLE))),
       |bk(metric, label_k, side, bucket, c) AS (VALUES
       |  ('temp_delta', 'n', 0, 3, CAST(2 AS BIGINT)),
       |  ('temp_delta', 'n', 0, 1, CAST(4 AS BIGINT)),
       |  ('temp_delta', 'n', 1, 1, CAST(3 AS BIGINT)),
       |  ('temp_delta', 'p', 1, 2, CAST(2 AS BIGINT))),
       |bounds AS (${graft.operators.Metrics.NhBoundsSql}),
       |bw AS (
       |  SELECT bk.*, f.count, f.zero_count,
       |    side * 10000000 + CASE WHEN side = 0 THEN -bucket ELSE bucket END AS ord
       |  FROM bk JOIN f USING (metric, label_k)),
       |bw2 AS (
       |  SELECT bw.*,
       |    SUM(c) OVER (PARTITION BY metric, label_k ORDER BY ord) AS cum_run
       |  FROM bw),
       |bw3 AS (
       |  SELECT bw2.*,
       |    cum_run + CASE WHEN side = 1 THEN zero_count ELSE 0 END AS eff_cum
       |  FROM bw2),
       |pick AS (
       |  SELECT metric, label_k, side, bucket, ord,
       |    (CAST('0.25' AS DOUBLE) * CAST(count AS DOUBLE)
       |      - CAST(eff_cum - c AS DOUBLE)) / CAST(c AS DOUBLE) AS fr,
       |    ROW_NUMBER() OVER (PARTITION BY metric, label_k ORDER BY ord) AS rn
       |  FROM bw3
       |  WHERE CAST('0.25' AS DOUBLE) * CAST(count AS DOUBLE)
       |      > CAST(eff_cum - c AS DOUBLE)
       |    AND CAST('0.25' AS DOUBLE) * CAST(count AS DOUBLE)
       |      <= CAST(eff_cum AS DOUBLE)),
       |pq AS (
       |  SELECT metric, label_k,
       |    CASE WHEN side = 1 THEN $interp ELSE -($interp) END AS qv
       |  FROM (SELECT metric, label_k, side,
       |          (CASE WHEN side = 1 THEN CAST(bucket - 1 AS DOUBLE) + fr
       |                ELSE CAST(bucket AS DOUBLE) - fr END)
       |            / pow(2.0, CAST(3 AS DOUBLE)) AS xq
       |        FROM pick WHERE rn = 1)),
       |ls AS (
       |  SELECT w.metric, w.label_k, MAX(b.hi) AS last_hi
       |  FROM bw w JOIN bounds b ON b.bucket = w.bucket
       |  WHERE w.side = 1 GROUP BY 1, 2),
       |ng AS (
       |  SELECT metric, label_k,
       |    SUM(CASE WHEN side = 0 THEN c ELSE 0 END) AS negtot
       |  FROM bk GROUP BY 1, 2)
       |SELECT f.metric, f.label_k, f.count, f.zero_count, f.sum,
       |  CASE WHEN pq.qv IS NOT NULL THEN pq.qv
       |       WHEN CAST('0.25' AS DOUBLE) * CAST(f.count AS DOUBLE)
       |         <= CAST(COALESCE(ng.negtot, 0) + f.zero_count AS DOUBLE)
       |         THEN 0.0
       |       ELSE ls.last_hi END AS q
       |FROM f
       |LEFT JOIN pq ON pq.metric = f.metric AND pq.label_k = f.label_k
       |LEFT JOIN ls ON ls.metric = f.metric AND ls.label_k = f.label_k
       |LEFT JOIN ng ON ng.metric = f.metric AND ng.label_k = f.label_k
       |ORDER BY f.metric, f.label_k""".stripMargin
  }

  /** Oracle twin of [[wireDecodeV2]]: the hand-derived sample relation
    * (ref pairs [1,2][3,4][5,6] → the purchase series with instance;
    * [1,7][3,8] → cpu_temp/us, no instance label).
    */
  val WireDecodeV2Sql: String =
    """SELECT * FROM (VALUES
      |  ('cpu_temp', '', 'us', CAST(300000 AS BIGINT), CAST('-1.5' AS DOUBLE)),
      |  ('purchase_total', 'box:9090', 'eu', CAST(1000 AS BIGINT), CAST('3.5' AS DOUBLE))
      |) w(metric, instance, label_k, ts_ms, value)
      |ORDER BY metric, ts_ms""".stripMargin

  /** Oracle twin of [[wireDecodeHist]]: the bucket relation derived BY
    * HAND from the wire bytes above (series a: span 2 anchors at
    * offset-sum 3 + prior length 2 = bucket 5; delta chain 3, −1, 2, 0
    * → counts 3, 2, 4, 4; series b: zigzag(3) = −2, one bucket).
    */
  val WireDecodeHistSql: String =
    """SELECT * FROM (VALUES
      |  ('req_ms', 'a', CAST(1000 AS BIGINT), 3, 0, 0, CAST(3 AS BIGINT)),
      |  ('req_ms', 'a', CAST(1000 AS BIGINT), 3, 0, 1, CAST(2 AS BIGINT)),
      |  ('req_ms', 'a', CAST(1000 AS BIGINT), 3, 0, 5, CAST(4 AS BIGINT)),
      |  ('req_ms', 'a', CAST(1000 AS BIGINT), 3, 0, 6, CAST(4 AS BIGINT)),
      |  ('req_ms', 'b', CAST(2000 AS BIGINT), 3, 3, -2, CAST(7 AS BIGINT))
      |) w(metric, label_k, ts_ms, schema, reset_hint, bucket, bucket_count)
      |ORDER BY metric, label_k, ts_ms, bucket""".stripMargin

  private[graft] def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Oracle twin of [[wireDecode]]: the sample relation derived BY HAND
    * from the wire bytes above (doubles as quoted strings — string →
    * DOUBLE is correctly-rounded, a bare literal may re-round).
    */
  val WireDecodeSql: String =
    """SELECT * FROM (VALUES
      |  ('cpu_temp', '', 'us', CAST(300000 AS BIGINT), CAST('-1.5' AS DOUBLE)),
      |  ('purchase_total', 'box:9090', 'eu', CAST(1000 AS BIGINT), CAST('3.5' AS DOUBLE)),
      |  ('purchase_total', 'box:9090', 'eu', CAST(61000 AS BIGINT), CAST('4.25' AS DOUBLE))
      |) w(metric, instance, label_k, ts_ms, value)
      |ORDER BY metric, ts_ms""".stripMargin
}

/** The SENDER: forward a registry snapshot to a downstream engine's
  * `/api/v1/write` — the push-model twin of [[ScrapeLoop]] (hierarchical
  * federation where the LEAF initiates, for leaves a scraper can't
  * reach). Each [[push]] encodes the current
  * [[graft.streaming.ExpositionRegistry]] series as one `WriteRequest`
  * (one sample per series at the push instant — exactly what a scrape
  * of `/metrics` would see), snappy-frames it, and POSTs. Failures are
  * recorded, not thrown — a forwarder rides through receiver outages
  * like a Prometheus remote-write shard.
  */
object RemoteWriteRecorded {
  import org.apache.spark.sql.{DataFrame, Row, SparkSession}
  import org.apache.spark.sql.functions._

  /** Group labels-map sample rows `(labels, ts_ms, value)` into wire
    * [[RemoteWrite.Series]] — the recorded-series sender's batch shape,
    * shared verbatim with the a1zb gate: labels name-sorted with empty
    * values dropped (upstream's series identity), samples in timestamp
    * order, series in label order for deterministic bytes.
    */
  private[graft] def labelsMapSeries(batch: Seq[Row]): Seq[RemoteWrite.Series] =
    batch.map { r =>
      (r.getMap[String, String](0).toVector
        .filter(_._2.nonEmpty).sortBy(_._1),
        r.getLong(1), r.getDouble(2))
    }.groupBy(_._1).toSeq
      .sortBy(_._1.map(e => e._1 + "=" + e._2).mkString(","))
      .map { case (labels, rs) =>
        RemoteWrite.Series(labels,
          rs.sortBy(_._2).map(t => (t._3, t._2)).toVector)
      }

  /** a1zb — the remote-write SENDER forwards a recording rule's FULL
    * lattice history: the labels-map relation
    * ([[graft.promql.Rules.recordedSeriesRelation]]) grouped into wire
    * series by the sender's own batch builder, encoded as a
    * WriteRequest, decoded back by the receiver's walk, and flattened
    * to `(label_k, t_s, value)` — the outbound twin of the remote-read
    * a1za gate, hash-matched against the SAME DuckDB lattice oracle.
    * Upstream deployments remote-write exactly these series: aggregated
    * rule outputs are the recommended long-term-storage payload (small
    * cardinality, query-ready).
    */
  def wireWriteRecordedGate(spark: SparkSession, dir: String): DataFrame = {
    val rule = graft.promql.Rules.RecordingRule(
      "k_total6h", "sum by (k) (purchase)", intervalS = 21600)
    val rel = graft.promql.Rules.recordedSeriesRelation(spark, dir, rule)
    val rows = rel.select(col("labels"), col("ts_ms"), col("value"))
      .collect().toSeq
    val series = labelsMapSeries(rows)
    val decoded = RemoteWrite.walk(RemoteWrite.uncompress(
      RemoteWrite.compress(RemoteWrite.encode(series))))
    val flat = decoded.flatMap { s =>
      val lm = s.labels.toMap
      s.samples.map { case (v, t) => (lm.getOrElse("k", ""), t / 1000L, v) }
    }
    import spark.implicits._
    flat.toDF("label_k", "t_s", "value")
      .orderBy(col("label_k"), col("t_s"), col("value"))
  }
}

class RemoteWriteClient(url: String,
    maxRetries: Int = 4, minBackoffMs: Long = 50,
    maxBackoffMs: Long = 5000,
    externalLabels: Map[String, String] = Map.empty) {

  @volatile private var lastPushMs: Option[Long] = None
  @volatile private var lastError: Option[String] = None

  def status: (Option[Long], Option[String]) = (lastPushMs, lastError)

  /** Replay RAW event history downstream — the backfill story the
    * snapshot-push ([[push]]) deliberately does not cover: every sample
    * in `events` (the metricEvents schema) re-sends with its ORIGINAL
    * timestamp, so the receiver reconstructs the full series history,
    * not just the current totals. Counter families forward under their
    * exposed wire name (`name_total`, the convention [[push]] and the
    * receiver's `toEvents` already share); gauges and histogram
    * observations forward as-is.
    *
    * Scale shape: the pushes run EXECUTOR-SIDE — `foreachPartition`
    * groups each partition's rows into one `WriteRequest` per
    * `batchRows` samples (series grouped within a batch, samples in
    * timestamp order), so 1000 executors stream 1000 shards in parallel
    * and nothing funnels through the driver, exactly how a Prometheus
    * remote-write queue shards by series. Returns the accepted sample
    * count (an accumulator; failed POSTs are recorded by count, not
    * thrown — outage semantics like [[push]]).
    */
  def backfill(events: org.apache.spark.sql.DataFrame,
      batchRows: Int = 500): (Long, Long) = {
    // capture plain values, not `this`, in the executor closure
    val target = url
    val (mr, mnb, mxb) = (maxRetries, minBackoffMs, maxBackoffMs)
    val ext = externalLabels
    val spark = events.sparkSession
    val sent = spark.sparkContext.longAccumulator("rw_backfill_sent")
    val failed = spark.sparkContext.longAccumulator("rw_backfill_failed")
    import org.apache.spark.sql.functions._
    events
      .select(
        concat(col("name"),
          when(col("kind") === "counter", "_total").otherwise("")).as("wn"),
        coalesce(col("label_k"), lit("")).as("k"),
        unix_millis(col("ts")).as("ts_ms"),
        col("value"))
      .foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          rows.grouped(batchRows).foreach { batch =>
            val series = batch
              .groupBy(r => (r.getString(0), r.getString(1)))
              .toSeq.sortBy(_._1)
              .map { case ((wn, k), rs) =>
                RemoteWrite.Series(
                  RemoteWrite.withExternal(
                    Vector("__name__" -> wn, "k" -> k), ext),
                  rs.sortBy(_.getLong(2))
                    .map(r => (r.getDouble(3), r.getLong(2))).toVector)
              }
            val n = series.map(_.samples.length).sum
            // per-shard bounded retry ([[RemoteWrite.postWithRetry]]):
            // a transient receiver blip loses nothing; a dead receiver
            // drops the batch into the failed count
            val code = RemoteWrite.postWithRetry(target,
              RemoteWrite.compress(RemoteWrite.encode(series)),
              mr, mnb, mxb)
            // the remote-write spec: senders MUST treat any 2xx as
            // accepted (Prometheus's own receiver answers 204, older
            // and third-party receivers answer 200)
            if (code / 100 == 2) sent.add(n.toLong) else failed.add(n.toLong)
          }
      }
    (sent.value, failed.value)
  }

  /** Forward a RECORDING RULE's sample history downstream — rule
    * outputs are first-class TSDB series upstream, and aggregated rule
    * series are the recommended remote-write payload for long-term
    * storage (small cardinality, query-ready). Takes the labels-map
    * relation ([[graft.promql.Rules.recordedSeriesRelation]]); pushes
    * run EXECUTOR-SIDE exactly like [[backfill]] — one WriteRequest per
    * `batchRows` samples per partition, nothing funnels through the
    * driver — with the same outage semantics (failed POSTs recorded by
    * count, never thrown).
    */
  def backfillRecorded(rel: org.apache.spark.sql.DataFrame,
      batchRows: Int = 500): (Long, Long) = {
    val target = url
    val (mr, mnb, mxb) = (maxRetries, minBackoffMs, maxBackoffMs)
    val ext = externalLabels
    val spark = rel.sparkSession
    val sent = spark.sparkContext.longAccumulator("rw_recorded_sent")
    val failed = spark.sparkContext.longAccumulator("rw_recorded_failed")
    rel.select(rel("labels"), rel("ts_ms"), rel("value"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.grouped(batchRows).foreach { batch =>
          val series = RemoteWriteRecorded.labelsMapSeries(batch.toSeq)
            .map(s => s.copy(labels = RemoteWrite.withExternal(s.labels, ext)))
          val n = series.map(_.samples.length).sum
          val code = RemoteWrite.postWithRetry(target,
            RemoteWrite.compress(RemoteWrite.encode(series)),
            mr, mnb, mxb)
          if (code / 100 == 2) sent.add(n.toLong) else failed.add(n.toLong)
        }
      }
    (sent.value, failed.value)
  }

  /** One push: the registry's series at `atMs`, with the bounded
    * per-shard retry ([[RemoteWrite.postWithRetry]] — a transient 5xx
    * or transport blip re-sends after exponential backoff; past the
    * bound the push records the failure). Returns the final HTTP code
    * (any 2xx is acceptance) or -1 on a transport failure.
    */
  def push(atMs: Long = System.currentTimeMillis()): Int = {
    val series = graft.streaming.ExpositionRegistry.series().map { t =>
      RemoteWrite.Series(
        RemoteWrite.withExternal(
          Vector("__name__" -> s"${t.name}_total", "k" -> t.label_k),
          externalLabels),
        Vector((t.total, atMs)))
    }
    val body = RemoteWrite.compress(RemoteWrite.encode(series))
    val code = try RemoteWrite.postWithRetry(url, body,
      maxRetries, minBackoffMs, maxBackoffMs)
    finally { lastPushMs = Some(atMs) }
    // any 2xx is acceptance per the remote-write spec
    lastError =
      if (code / 100 == 2) None
      else if (code == -1) Some("transport failure") else Some(s"HTTP $code")
    code
  }
}

/** The RECEIVER: POSTed bodies land on a streaming relation; the wire
  * decode, event mapping, and rollup maintenance are the same column
  * expressions the batch tier runs. [[receive]] validates driver-side
  * (uncompress + one [[RemoteWrite.walk]] pass) so a malformed body is
  * an HTTP 400 at the door, never a poisoned stream.
  */
class RemoteWriteSink(spark: SparkSession) {
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val stream = MemoryStream[(java.sql.Timestamp, Array[Byte])]

  /** One POST body (snappy-framed protobuf). Throws on malformed input
    * — the endpoint maps it to 400 like upstream's receiver. The
    * `contentType` negotiates the protocol: a `proto=io.prometheus.
    * write.v2.Request` parameter selects the 2.0 symbol-table decode,
    * which NORMALIZES to the 1.0 relation at the door (walkV2 resolves
    * the refs; the stream carries one wire shape, so every downstream
    * column expression is protocol-agnostic). Returns the accepted
    * sample count — the v2 response header's value.
    */
  def receive(body: Array[Byte],
      atMs: Long = System.currentTimeMillis(),
      contentType: Option[String] = None): Long = {
    val raw = RemoteWrite.uncompress(body)
    val isV2 = contentType.exists(_.contains("io.prometheus.write.v2.Request"))
    val series =
      if (isV2) RemoteWrite.walkV2(raw) else RemoteWrite.walk(raw)
    // v2 created timestamps materialize as CT-zero birth samples in the
    // normalization (the 1.0 wire shape has no CT field) — downstream
    // rate/increase then count the first sample's full mass
    val proto =
      if (isV2) RemoteWrite.encode(RemoteWrite.withCtZero(series)) else raw
    stream.addData((new java.sql.Timestamp(atMs), proto))
    series.map(_.samples.length.toLong).sum
  }

  /** Already-walked series (the OTLP door after translation) onto the
    * same stream wire shape — the normalize-at-the-door convention
    * every non-1.0 protocol follows. Returns the accepted sample count.
    */
  def receiveSeries(series: Seq[RemoteWrite.Series],
      atMs: Long = System.currentTimeMillis()): Long = {
    stream.addData((new java.sql.Timestamp(atMs), RemoteWrite.encode(series)))
    series.map(s =>
      (s.samples.length + s.hists.length + s.fhists.length).toLong).sum
  }

  /** The raw payload relation: one (recv_ts, proto) row per POST. */
  def payloads: DataFrame = stream.toDF().toDF("recv_ts", "proto")

  /** Decoded (recv_ts, labels, value, ts_ms) sample rows. */
  def samples: DataFrame = RemoteWrite.decode(payloads)

  /** Pushed samples as events-schema rows — feed to `metricEventsOf`,
    * `streamingRollup`, or any other ingest consumer.
    */
  def events: DataFrame = RemoteWrite.toEvents(samples)

  /** Decoded native-histogram sample rows off the pushed payloads. */
  def histograms: DataFrame = RemoteWrite.decodeHist(payloads)

  /** Decoded exemplar rows off the pushed payloads — the wire feed of
    * the exemplar store.
    */
  def exemplarRows: DataFrame = RemoteWrite.decodeEx(payloads)

  /** The LIVE native-histogram family registry over everything pushed so
    * far: last-write-wins state per series (streaming aggregation —
    * write with `outputMode(Complete)`, or run as a batch over the
    * drained payloads).
    */
  def nativeFamily: DataFrame = RemoteWrite.histFamily(histograms)

  /** Decoded FLOAT-form native-histogram sample rows off the pushed
    * payloads (absolute double bucket counts).
    */
  def floatHistograms: DataFrame = RemoteWrite.decodeFHist(payloads)

  /** The float-family LWW registry — queryable like [[nativeFamily]]
    * via `RemoteWrite.familyQuantile(..., absolute = true)`.
    */
  def nativeFamilyF: DataFrame = RemoteWrite.fhistFamily(floatHistograms)
}

/** a1z's home — see [[RemoteWrite.wireDecodeMixedHist]]. */
object RemoteWriteFloatGate {
  import org.apache.spark.sql.functions._

  /** a1z — BOTH histogram forms in one foreign push: a hand-assembled
    * `WriteRequest` whose first series carries an INTEGER native
    * histogram (count_int/zero_count_int, zigzag delta chains) and
    * whose second carries the FLOAT form (prompb `count`/`zero_count`
    * as fixed64 doubles — fields 2/7 — and ABSOLUTE packed-double
    * `positive_counts`/`negative_counts` — fields 13/10: the sample
    * kind an aggregating sender produces, with fractional bucket
    * mass). The walker must dispatch per sample by field presence;
    * both walk to absolute buckets through the shared span decode
    * (delta mode for the integer form, absolute mode for the float
    * form) and hash against the hand-derived relation.
    *
    * Bytes (tag = field<<3 | wiretype; every byte justified):
    *   0A 3A  timeseries#1, 58 bytes:
    *     0A 12  label: 0A 08 "__name__" 12 06 "mix_ms"
    *     0A 06  label: 0A 01 "k" 12 01 "i"
    *     22 1C  histogram (integer form), 28 bytes:
    *       08 0D           count_int = 13
    *       19 <7.5 LE: 0x401E000000000000>  sum
    *       20 06           schema: zigzag(3)
    *       30 02           zero_count_int = 2
    *       5A 04 08 00 10 02   positive span {0, 2}
    *       62 02 06 01     packed deltas: zigzag [3, -1]
    *       78 E8 07        timestamp = 1000
    *   0A 66  timeseries#2, 102 bytes:
    *     0A 12  label: __name__ = "mix_ms"
    *     0A 06  label: k = "f"
    *     22 48  histogram (FLOAT form), 72 bytes:
    *       11 <4.75 LE: 0x4013000000000000>   count (field 2, double)
    *       19 <-1.0 LE: 0xBFF0000000000000>   sum
    *       20 04           schema: zigzag(2)
    *       39 <1.0 LE: 0x3FF0000000000000>    zero_count (field 7)
    *       42 04 08 00 10 02   negative span {0, 2} (field 8)
    *       52 10 <1.25 LE><0.5 LE>  packed negative_counts (field 10)
    *       5A 04 08 01 10 01   positive span {zigzag(−1), 1} (field 11)
    *       6A 08 <0.75 LE>     packed positive_counts (field 13)
    *       78 D0 0F        timestamp = 2000
    */
  def wireDecodeMixedHist(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val payload = RemoteWrite.hexBytes(
      "0A3A" +
        "0A12" + "0A085F5F6E616D655F5F" + "1206" + "6D69785F6D73" +
        "0A06" + "0A016B" + "120169" +
        "221C" +
        "080D" +
        "19" + "000000000000" + "1E40" +
        "2006" +
        "3002" +
        "5A0408001002" +
        "62020601" +
        "78E807" +
      "0A66" +
        "0A12" + "0A085F5F6E616D655F5F" + "1206" + "6D69785F6D73" +
        "0A06" + "0A016B" + "120166" +
        "2248" +
        "11" + "000000000000" + "1340" +
        "19" + "000000000000" + "F0BF" +
        "2004" +
        "39" + "000000000000" + "F03F" +
        "4204" + "08001002" +
        "5210" + "000000000000F43F" + "000000000000E03F" +
        "5A04" + "08011001" +
        "6A08" + "000000000000E83F" +
        "78D00F")
    val series = RemoteWrite.walk(payload)
    def lv(s: RemoteWrite.Series, n: String): String =
      s.labels.toMap.getOrElse(n, "")
    val intRows = series.flatMap(s => s.hists.map(h =>
      (lv(s, "__name__"), lv(s, "k"), h.tsMs, h.schema,
        h.count.toDouble, h.sum, h.zeroCount.toDouble,
        h.offs, h.lens, h.deltas, h.negOffs, h.negLens, h.negDeltas)))
      .toDF("metric", "label_k", "ts_ms", "schema", "count", "sum",
        "zero_count", "offs", "lens", "deltas", "neg_offs", "neg_lens",
        "neg_deltas")
    val fltRows = series.flatMap(s => s.fhists.map(h =>
      (lv(s, "__name__"), lv(s, "k"), h.tsMs, h.schema,
        h.count, h.sum, h.zeroCount,
        h.offs, h.lens, h.counts, h.negOffs, h.negLens, h.negCounts)))
      .toDF("metric", "label_k", "ts_ms", "schema", "count", "sum",
        "zero_count", "offs", "lens", "deltas", "neg_offs", "neg_lens",
        "neg_deltas")
    val keys = Seq("metric", "label_k", "ts_ms", "schema", "count", "sum",
      "zero_count")
    def sides(df: DataFrame, absolute: Boolean): DataFrame = {
      val pos = graft.operators.Metrics
        .decodeWireSpans(df, keys, absolute = absolute)
        .withColumn("side", lit(1))
      val neg = graft.operators.Metrics.decodeWireSpans(
        df.select(keys.map(col) :+ col("neg_offs").as("offs") :+
          col("neg_lens").as("lens") :+ col("neg_deltas").as("deltas"): _*),
        keys, absolute = absolute).withColumn("side", lit(0))
      pos.unionByName(neg)
    }
    sides(intRows, absolute = false)
      .withColumn("bucket_count", col("bucket_count").cast("double"))
      .unionByName(sides(fltRows, absolute = true))
      .select(col("metric"), col("label_k"), col("ts_ms"), col("schema"),
        col("count"), col("sum"), col("zero_count"), col("side"),
        col("bucket"), col("bucket_count"))
      .orderBy(col("metric"), col("label_k"), col("ts_ms"), col("side"),
        col("bucket"))
  }

  /** a1zz — FLOAT families are QUERYABLE, not just servable: two
    * pushes of FLOAT-form histograms where the second supersedes series
    * `a` (last-write-wins at the family), then `histogram_quantile(0.9)`
    * evaluated straight off the float family state — encode → the
    * `prom_rw_decode_fhist` generator → LWW registry → the SAME rank
    * walk as the integer families in ABSOLUTE mode (float wire counts
    * are not delta chains; every downstream expression is
    * type-generic). Fractional counts make the ranks and interpolation
    * genuinely non-integer: the DuckDB oracle re-derives the walk from
    * the hand-decoded latest buckets with the engine's deterministic
    * exp2 twin, so a drifted rank comparison, a stale family row, or
    * one interpolation double fails the hash.
    */
  def wireFloatFamilyQuantile(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import RemoteWrite.{FHist, Series}
    val push1 = RemoteWrite.encode(Seq(Series(
      Vector("__name__" -> "q_ms", "k" -> "a"), Vector.empty,
      fhists = Vector(FHist(1000L, 3, Vector(1), Vector(2),
        Vector(5.0, 3.0), 9.0, 4.25, 1.0)))))
    val push2 = RemoteWrite.encode(Seq(
      Series(Vector("__name__" -> "q_ms", "k" -> "a"), Vector.empty,
        fhists = Vector(FHist(61000L, 3, Vector(1), Vector(2),
          Vector(4.5, 3.5), 10.0, 6.5, 2.0))),
      Series(Vector("__name__" -> "q_ms", "k" -> "b"), Vector.empty,
        fhists = Vector(FHist(2000L, 3, Vector(-2), Vector(1),
          Vector(7.5), 7.5, 0.5, 0.0)))))
    val payloads = Seq(push1, push2).toDF("proto")
      .withColumn("recv_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val fam = RemoteWrite.fhistFamily(RemoteWrite.decodeFHist(payloads))
    RemoteWrite.familyQuantile(spark, fam, 0.9, absolute = true)
      .orderBy(col("metric"), col("label_k"))
  }

  /** Oracle twin of [[wireFloatFamilyQuantile]]: the latest float
    * buckets derived by hand (a superseded: [4.5, 3.5] at buckets 1/2,
    * count 10, zero 2 → rank 9 crosses bucket 2 with fr = 2.5/3.5;
    * b: rank 6.75 inside its single bucket −2, fr = 0.9), interpolated
    * through the deterministic exp2.
    */
  lazy val WireFloatFamilyQuantileSql: String = {
    val interp = graft.functions.DetMath.exp2Sql("xq")
    s"""WITH f(metric, label_k, count, zero_count, sum) AS (VALUES
       |  ('q_ms', 'a', CAST('10.0' AS DOUBLE), CAST('2.0' AS DOUBLE), CAST('6.5' AS DOUBLE)),
       |  ('q_ms', 'b', CAST('7.5' AS DOUBLE), CAST('0.0' AS DOUBLE), CAST('0.5' AS DOUBLE))),
       |bk(metric, label_k, bucket, c) AS (VALUES
       |  ('q_ms', 'a', 1, CAST('4.5' AS DOUBLE)),
       |  ('q_ms', 'a', 2, CAST('3.5' AS DOUBLE)),
       |  ('q_ms', 'b', -2, CAST('7.5' AS DOUBLE))),
       |bw AS (
       |  SELECT bk.*, SUM(c) OVER (PARTITION BY metric, label_k
       |    ORDER BY bucket) AS cumc FROM bk),
       |bounds AS (${graft.operators.Metrics.NhBoundsSql}),
       |bs AS (
       |  SELECT w.metric, w.label_k, MAX(b.hi) AS last_hi
       |  FROM bw w JOIN bounds b ON b.bucket = w.bucket GROUP BY 1, 2),
       |pick AS (
       |  SELECT w.metric, w.label_k, w.bucket,
       |    (CAST('0.9' AS DOUBLE) * f.count - (f.zero_count + w.cumc - w.c))
       |      / w.c AS fr,
       |    ROW_NUMBER() OVER (PARTITION BY w.metric, w.label_k
       |      ORDER BY w.bucket) AS rn
       |  FROM bw w JOIN f ON f.metric = w.metric AND f.label_k = w.label_k
       |  WHERE CAST('0.9' AS DOUBLE) * f.count > f.zero_count + w.cumc - w.c
       |    AND CAST('0.9' AS DOUBLE) * f.count <= f.zero_count + w.cumc),
       |pq AS (
       |  SELECT metric, label_k, $interp AS qv
       |  FROM (SELECT metric, label_k,
       |          (CAST(bucket - 1 AS DOUBLE) + fr)
       |            / pow(2.0, CAST(3 AS DOUBLE)) AS xq
       |        FROM pick WHERE rn = 1))
       |SELECT f.metric, f.label_k, f.count, f.zero_count, f.sum,
       |  CASE WHEN pq.qv IS NOT NULL THEN pq.qv
       |       WHEN CAST('0.9' AS DOUBLE) * f.count <= f.zero_count
       |         THEN 0.0
       |       ELSE bs.last_hi END AS q
       |FROM f
       |LEFT JOIN pq ON pq.metric = f.metric AND pq.label_k = f.label_k
       |LEFT JOIN bs ON bs.metric = f.metric AND bs.label_k = f.label_k
       |ORDER BY f.metric, f.label_k""".stripMargin
  }

  /** Oracle twin: the bucket relation derived BY HAND from the payload
    * comments (integer deltas prefix-sum: 3, 3−1=2; float counts are
    * absolute).
    */
  lazy val WireDecodeMixedHistSql: String =
    """SELECT * FROM (VALUES
      |  ('mix_ms', 'f', CAST(2000 AS BIGINT), 2, CAST('4.75' AS DOUBLE), CAST('-1.0' AS DOUBLE), CAST('1.0' AS DOUBLE), 0, 0, CAST('1.25' AS DOUBLE)),
      |  ('mix_ms', 'f', 2000, 2, CAST('4.75' AS DOUBLE), CAST('-1.0' AS DOUBLE), CAST('1.0' AS DOUBLE), 0, 1, CAST('0.5' AS DOUBLE)),
      |  ('mix_ms', 'f', 2000, 2, CAST('4.75' AS DOUBLE), CAST('-1.0' AS DOUBLE), CAST('1.0' AS DOUBLE), 1, -1, CAST('0.75' AS DOUBLE)),
      |  ('mix_ms', 'i', 1000, 3, CAST('13.0' AS DOUBLE), CAST('7.5' AS DOUBLE), CAST('2.0' AS DOUBLE), 1, 0, CAST('3.0' AS DOUBLE)),
      |  ('mix_ms', 'i', 1000, 3, CAST('13.0' AS DOUBLE), CAST('7.5' AS DOUBLE), CAST('2.0' AS DOUBLE), 1, 1, CAST('2.0' AS DOUBLE))
      |) t(metric, label_k, ts_ms, schema, count, sum, zero_count, side, bucket, bucket_count)
      |ORDER BY metric, label_k, ts_ms, side, bucket""".stripMargin
}
