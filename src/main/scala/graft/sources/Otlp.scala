package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OTLP metrics ingestion — the third push protocol at the door, next
  * to remote write 1.0/2.0: Prometheus serves
  * `POST /api/v1/otlp/v1/metrics` (an OpenTelemetry collector's
  * `ExportMetricsServiceRequest` protobuf) and translates points into
  * its own data model by the PUBLIC OTLP→Prometheus compatibility
  * rules. This engine does the same and then NORMALIZES to the one
  * stream wire shape ([[RemoteWrite.Series]] → encode → the a1i-gated
  * generator), so every downstream column expression — events mapping,
  * streaming rollup, the pyramid — is protocol-agnostic, exactly like
  * the remote-write 2.0 path.
  *
  * Translation rules implemented (the compatibility spec's core):
  *  - metric names sanitize (`[^a-zA-Z0-9:_]` → `_`), gain the unit's
  *    suffix (`s`→`_seconds`, `ms`→`_milliseconds`, `By`→`_bytes`,
  *    `%`→`_percent`; dimensionless `1` adds nothing), and monotonic
  *    sums end in `_total`;
  *  - resource attributes `service.name` → `job` (prefixed by
  *    `service.namespace/` when present) and `service.instance.id` →
  *    `instance`; other resource attributes are dropped (upstream puts
  *    them in `target_info`, out of this engine's one-label model);
  *  - point attributes become labels with sanitized names;
  *  - only CUMULATIVE sums are ingestible (upstream rejects delta
  *    temporality absent a feature flag) — delta fails loud, the
  *    endpoint's 400;
  *  - `as_int` points widen to double (the engine's value model, like
  *    Prometheus's float samples).
  */
object Otlp {

  /** One number data point off the wire, pre-translation. */
  final case class Point(name: String, unit: String, kind: String,
      monotonic: Boolean, temporality: Int,
      resource: Vector[(String, String)], attrs: Vector[(String, String)],
      tsNano: Long, value: Double)

  /** Decode an UNCOMPRESSED `ExportMetricsServiceRequest`. Throws
    * `IllegalArgumentException` on malformed bytes — the endpoint's
    * HTTP 400. Unknown fields (histogram/summary metrics, exemplars,
    * scope, schema URLs) skip by wire type, so a collector sending more
    * than this engine models still lands its gauges and sums.
    */
  def walk(bytes: Array[Byte]): Vector[Point] = {
    val end = bytes.length
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed OTLP request: $msg")
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
      while (i < 8) { out |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      out
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
    def str(from: Int, until: Int): String =
      new String(bytes, from, until - from,
        java.nio.charset.StandardCharsets.UTF_8)

    // KeyValue { key = 1; AnyValue value = 2 } — only string/bool/int/
    // double AnyValue branches render; array/kvlist/bytes skip to ""
    def keyValue(limit: Int): (String, String) = {
      var key = ""
      var value = ""
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) =>
            val u = lenDelim(limit); key = str(pos, u); pos = u
          case (2, 2) =>
            val vu = lenDelim(limit)
            while (pos < vu) {
              val vt = varint(vu)
              ((vt >> 3).toInt, (vt & 7).toInt) match {
                case (1, 2) =>
                  val su = lenDelim(vu); value = str(pos, su); pos = su
                case (2, 0) => value = if (varint(vu) != 0L) "true" else "false"
                case (3, 0) => value = varint(vu).toString
                case (4, 1) =>
                  value = java.lang.Double.longBitsToDouble(fixed64(vu)).toString
                case (_, wt) => skip(wt, vu)
              }
            }
          case (_, wt) => skip(wt, limit)
        }
      }
      (key, value)
    }

    // NumberDataPoint { start=2 fixed64; time=3 fixed64; as_double=4;
    //                   as_int=6 sfixed64; attributes=7 }
    def dataPoint(limit: Int): (Vector[(String, String)], Long, Double) = {
      val attrs = Vector.newBuilder[(String, String)]
      var ts = 0L
      var v = 0.0
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (3, 1) => ts = fixed64(limit)
          case (4, 1) => v = java.lang.Double.longBitsToDouble(fixed64(limit))
          case (6, 1) => v = fixed64(limit).toDouble // as_int, sfixed64
          case (7, 2) => attrs += keyValue(lenDelim(limit))
          case (_, wt) => skip(wt, limit)
        }
      }
      (attrs.result(), ts, v)
    }

    // Metric { name=1; unit=3; gauge=5; sum=7 } — histogram(9)/
    // exponential_histogram(10)/summary(11) skip (not modeled)
    def metric(limit: Int, resource: Vector[(String, String)]): Vector[Point] = {
      var name = ""
      var unit = ""
      val out = Vector.newBuilder[(String, Boolean, Int, Vector[(String, String)], Long, Double)]
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) =>
            val u = lenDelim(limit); name = str(pos, u); pos = u
          case (3, 2) =>
            val u = lenDelim(limit); unit = str(pos, u); pos = u
          case (5, 2) => // Gauge { data_points = 1 }
            val gu = lenDelim(limit)
            while (pos < gu) {
              val gt = varint(gu)
              ((gt >> 3).toInt, (gt & 7).toInt) match {
                case (1, 2) =>
                  val (a, t, v) = dataPoint(lenDelim(gu))
                  out += (("gauge", false, 2, a, t, v))
                case (_, wt) => skip(wt, gu)
              }
            }
          case (7, 2) => // Sum { data_points=1; temporality=2; monotonic=3 }
            val su = lenDelim(limit)
            val pts = Vector.newBuilder[(Vector[(String, String)], Long, Double)]
            var temporality = 0
            var monotonic = false
            while (pos < su) {
              val st = varint(su)
              ((st >> 3).toInt, (st & 7).toInt) match {
                case (1, 2) => pts += dataPoint(lenDelim(su))
                case (2, 0) => temporality = varint(su).toInt
                case (3, 0) => monotonic = varint(su) != 0L
                case (_, wt) => skip(wt, su)
              }
            }
            pts.result().foreach { case (a, t, v) =>
              out += (("sum", monotonic, temporality, a, t, v))
            }
          case (_, wt) => skip(wt, limit)
        }
      }
      val n = name
      val u = unit
      out.result().map { case (kind, mono, temp, attrs, ts, v) =>
        Point(n, u, kind, mono, temp, resource, attrs, ts, v)
      }
    }

    val points = Vector.newBuilder[Point]
    while (pos < end) {
      val tag = varint(end)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // ResourceMetrics { resource=1; scope_metrics=2 }
          val ru = lenDelim(end)
          var resource = Vector.empty[(String, String)]
          // resource may follow its scope_metrics on the wire — gather
          // scope ranges first, walk metrics after (like walkV2's
          // symbols-last handling)
          val smRanges = Vector.newBuilder[(Int, Int)]
          while (pos < ru) {
            val rt = varint(ru)
            ((rt >> 3).toInt, (rt & 7).toInt) match {
              case (1, 2) => // Resource { attributes = 1 }
                val au = lenDelim(ru)
                val as = Vector.newBuilder[(String, String)]
                while (pos < au) {
                  val at = varint(au)
                  ((at >> 3).toInt, (at & 7).toInt) match {
                    case (1, 2) => as += keyValue(lenDelim(au))
                    case (_, wt) => skip(wt, au)
                  }
                }
                resource = as.result()
              case (2, 2) =>
                val u = lenDelim(ru); smRanges += ((pos, u)); pos = u
              case (_, wt) => skip(wt, ru)
            }
          }
          val res = resource
          smRanges.result().foreach { case (from, until) =>
            pos = from
            while (pos < until) {
              val st = varint(until)
              ((st >> 3).toInt, (st & 7).toInt) match {
                case (2, 2) => points ++= metric(lenDelim(until), res)
                case (_, wt) => skip(wt, until) // scope, schema_url
              }
            }
          }
          pos = ru
        case (_, wt) => skip(wt, end)
      }
    }
    points.result()
  }

  /** The compatibility spec's unit-suffix table (the subset of units
    * the engine's corpora use; unknown units sanitize and append as-is,
    * the dimensionless `1` appends nothing).
    */
  private val UnitSuffix = Map(
    "s" -> "seconds", "ms" -> "milliseconds", "us" -> "microseconds",
    "ns" -> "nanoseconds", "By" -> "bytes", "KiBy" -> "kibibytes",
    "MiBy" -> "mebibytes", "%" -> "percent", "1" -> "")

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == ':' || c == '_') c else '_')

  private def labelSanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '_') c else '_')

  /** Prometheus name of an OTLP metric: sanitized, unit-suffixed,
    * `_total` for monotonic sums.
    */
  private[graft] def promName(p: Point): String = {
    val base = sanitize(p.name)
    val suffix = UnitSuffix.getOrElse(p.unit, sanitize(p.unit))
    val unitized =
      if (suffix.isEmpty || base.endsWith(s"_$suffix")) base
      else s"${base}_$suffix"
    if (p.kind == "sum" && p.monotonic && !unitized.endsWith("_total"))
      s"${unitized}_total"
    else unitized
  }

  /** Translate walked points into the one stream wire shape. Delta
    * sums fail loud (upstream's OTLP receiver rejects them too).
    */
  def translate(points: Vector[Point]): Vector[RemoteWrite.Series] =
    points.map { p =>
      if (p.kind == "sum" && p.temporality != 2)
        throw new IllegalArgumentException(
          s"OTLP sum '${p.name}' has non-cumulative temporality " +
            s"${p.temporality}; only cumulative is ingestible")
      val res = p.resource.toMap
      val job = res.get("service.name").map { n =>
        res.get("service.namespace").map(ns => s"$ns/$n").getOrElse(n)
      }
      val labels =
        Vector("__name__" -> promName(p)) ++
          job.map("job" -> _) ++
          res.get("service.instance.id").map("instance" -> _) ++
          p.attrs.map { case (k, v) => labelSanitize(k) -> v }
      RemoteWrite.Series(labels, Vector((p.value, p.tsNano / 1000000L)))
    }

  /** a1n — the OTLP door, hash-gated like a1i/a1j/a1k: a hand-assembled
    * `ExportMetricsServiceRequest` (every byte justified below) walks,
    * translates by the compatibility rules, normalizes through the SAME
    * a1i-gated generator as every other push protocol, and the DuckDB
    * oracle is the hand-derived translated relation — so the gate fails
    * if the walker misreads the nesting, the name translation drops a
    * suffix, or the resource→job/instance mapping drifts.
    *
    * Shapes covered: monotonic cumulative sum with unit suffixing +
    * `_total` (double point, dotted name+attrs); gauge from an `as_int`
    * point; a dropped non-identity resource attribute; an empty
    * InstrumentationScope message (skipped); fixed64 nano timestamps.
    */
  def otlpIngest(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // ExportMetricsServiceRequest, hand-assembled:
    // 0A BF01  resource_metrics#1, 191 bytes:
    //   0A 4C  resource, 76 bytes:
    //     0A 1A  attr: 0A 0C "service.name" 12 0A (0A 08 "checkout")
    //     0A 1E  attr: 0A 13 "service.instance.id" 12 07 (0A 05 "box:1")
    //     0A 0E  attr: 0A 06 "region" 12 04 (0A 02 "eu")   <- dropped
    //   12 6F  scope_metrics, 111 bytes:
    //     0A 00  scope: empty InstrumentationScope (skipped)
    //     12 3E  metric#1, 62 bytes:
    //       0A 14  name = "http.server.duration"
    //       1A 01  unit = "s"
    //       3A 23  sum, 35 bytes:
    //         0A 1D  data_point, 29 bytes:
    //           19 <1e9 ns LE: 0x3B9ACA00>   time = 1 s
    //           21 <3.5 LE: 0x400C000000000000>  as_double
    //           3A 09  attr: 0A 01 "k" 12 04 (0A 02 "eu")
    //         10 02  temporality = CUMULATIVE
    //         18 01  is_monotonic = true
    //     12 2B  metric#2, 43 bytes:
    //       0A 08  name = "cpu.temp"
    //       2A 1F  gauge, 31 bytes:
    //         0A 1D  data_point, 29 bytes:
    //           19 <2e9 ns LE: 0x77359400>   time = 2 s
    //           31 <42 LE sfixed64>          as_int
    //           3A 09  attr: 0A 01 "k" 12 04 (0A 02 "us")
    val payload = RemoteWrite.hexBytes(
      "0A" + "BF01" +
        "0A4C" +
        "0A1A" + "0A0C" + "736572766963652E6E616D65" +
          "120A" + "0A08" + "636865636B6F7574" +
        "0A1E" + "0A13" + "736572766963652E696E7374616E63652E6964" +
          "1207" + "0A05" + "626F783A31" +
        "0A0E" + "0A06" + "726567696F6E" + "1204" + "0A02" + "6575" +
        "126F" +
        "0A00" +
        "123E" +
        "0A14" + "687474702E7365727665722E6475726174696F6E" +
        "1A01" + "73" +
        "3A23" +
        "0A1D" +
        "19" + "00CA9A3B00000000" +
        "21" + "000000000000" + "0C40" +
        "3A09" + "0A016B" + "1204" + "0A026575" +
        "1002" +
        "1801" +
        "122B" +
        "0A08" + "6370752E74656D70" +
        "2A1F" +
        "0A1D" +
        "19" + "0094357700000000" +
        "31" + "2A00000000000000" +
        "3A09" + "0A016B" + "1204" + "0A027573")
    val normalized = RemoteWrite.encode(translate(walk(payload)))
    val payloads = Seq(normalized).toDF("proto")
      .withColumn("recv_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    RemoteWrite.decode(payloads)
      .select(
        element_at(col("labels"), "__name__").as("metric"),
        element_at(col("labels"), "job").as("job"),
        element_at(col("labels"), "instance").as("instance"),
        element_at(col("labels"), "k").as("label_k"),
        col("ts_ms"), col("value"))
      .orderBy(col("metric"), col("ts_ms"))
  }

  /** Oracle twin of [[otlpIngest]]: the translated relation derived BY
    * HAND from the wire spec above — `http.server.duration` (unit `s`,
    * monotonic cumulative sum) → `http_server_duration_seconds_total`;
    * `cpu.temp` gauge → `cpu_temp` with the int point widened; job /
    * instance from the resource identity attributes; `region` dropped.
    */
  val OtlpIngestSql: String =
    """SELECT * FROM (VALUES
      |  ('cpu_temp', 'checkout', 'box:1', 'us', CAST(2000 AS BIGINT),
      |    CAST('42.0' AS DOUBLE)),
      |  ('http_server_duration_seconds_total', 'checkout', 'box:1', 'eu',
      |    CAST(1000 AS BIGINT), CAST('3.5' AS DOUBLE))
      |) w(metric, job, instance, label_k, ts_ms, value)
      |ORDER BY metric, ts_ms""".stripMargin
}
