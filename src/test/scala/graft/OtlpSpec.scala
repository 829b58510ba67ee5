package graft

import graft.sources.{Otlp, QueryEndpoint, RemoteWrite, RemoteWriteSink}

/** The OTLP door: hand-assembled `ExportMetricsServiceRequest` bytes
  * walk to exactly the hand-derived points, translation follows the
  * public OTLP→Prometheus compatibility rules (unit suffixes, `_total`,
  * resource identity → job/instance, delta rejection), and an HTTP POST
  * to `/api/v1/otlp/v1/metrics` (plain and gzip) lands in the same
  * streaming ingest as remote write.
  */
class OtlpSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-assembled OTLP payload translates to the hand-derived relation") {
    val rows = Otlp.otlpIngest(spark)
      .as[(String, String, String, String, Long, Double)].collect().toSeq
    assert(rows === Seq(
      ("cpu_temp", "checkout", "box:1", "us", 2000L, 42.0),
      ("http_server_duration_seconds_total", "checkout", "box:1", "eu",
        1000L, 3.5)))
  }

  test("name translation: sanitize, unit suffix, _total, namespace-prefixed job") {
    def pt(name: String, unit: String, kind: String, mono: Boolean,
        res: Vector[(String, String)] = Vector.empty): Otlp.Point =
      Otlp.Point(name, unit, kind, mono, 2, res, Vector.empty, 1000000000L, 1.0)
    assert(Otlp.promName(pt("http.server.duration", "s", "sum", true)) ===
      "http_server_duration_seconds_total")
    // already-suffixed names don't double up
    assert(Otlp.promName(pt("queue.wait.seconds", "s", "gauge", false)) ===
      "queue_wait_seconds")
    assert(Otlp.promName(pt("disk.io", "By", "sum", true)) ===
      "disk_io_bytes_total")
    // dimensionless "1" appends nothing; non-monotonic sums get no _total
    assert(Otlp.promName(pt("cache.ratio", "1", "sum", false)) === "cache_ratio")
    assert(Otlp.promName(pt("cpu.usage", "%", "gauge", false)) ===
      "cpu_usage_percent")
    // service.namespace prefixes job
    val s = Otlp.translate(Otlp.Decoded(Vector(pt("m", "", "gauge", false,
      Vector("service.name" -> "api", "service.namespace" -> "prod"))), Vector.empty))
    assert(s.head.labels.toMap.get("job") === Some("prod/api"))
  }

  test("delta-temporality sums fail loud; gauges ignore temporality") {
    val delta = Otlp.Point("m", "", "sum", true, 1, Vector.empty,
      Vector.empty, 0L, 1.0)
    val e = intercept[IllegalArgumentException](Otlp.translate(Otlp.Decoded(Vector(delta), Vector.empty)))
    assert(e.getMessage.contains("cumulative"))
    val g = Otlp.Point("m", "", "gauge", false, 0, Vector.empty,
      Vector.empty, 0L, 1.0)
    assert(Otlp.translate(Otlp.Decoded(Vector(g), Vector.empty)).size === 1)
  }

  test("exponential histograms: index mapping, span re-encode, family serving") {
    // the off-by-one: OTLP bucket i at offset o = Prometheus index o+i+1
    assert(Otlp.toSpans(0, Vector(5L, 3L)) ===
      ((Vector(1), Vector(2), Vector(5L, -2L))))
    assert(Otlp.toSpans(-3, Vector(2L, 2L, 7L)) ===
      ((Vector(-2), Vector(3), Vector(2L, 0L, 5L))))
    assert(Otlp.toSpans(4, Vector.empty) ===
      ((Vector.empty, Vector.empty, Vector.empty)))
    // the a1q gate's payload walks to exactly one expohist
    val gate = Otlp.otlpExpoHist(spark)
      .as[(String, String, Long, Long, Double, Double)].collect().toSeq
    assert(gate.map(r => (r._1, r._2, r._3, r._4, r._5)) ===
      Seq(("req_size_bytes", "eu", 12L, 1L, 4.25)))
    // q(0.9): rank 10.8 crosses positive bucket 2 past negtot 3 +
    // zero 1 + bucket-1's 5 = 9; f = (10.8−9)/3, xq = (1+f)/8
    val f = (0.9 * 12.0 - 9.0) / 3.0
    assert(gate.head._6 === graft.functions.DetMath.exp2((1.0 + f) / 8.0))
    // delta-temporality expohists 400 like delta sums
    val delta = Otlp.ExpoHist("m", "", 1, Vector.empty, Vector.empty,
      0L, 1L, 0.0, 0L, 3, 0, Vector(1L), 0, Vector.empty)
    val e = intercept[IllegalArgumentException](
      Otlp.translate(Otlp.Decoded(Vector.empty, Vector(delta))))
    assert(e.getMessage.contains("cumulative"))
  }

  test("classic histograms translate to cumulative _bucket/_sum/_count series") {
    val rows = Otlp.otlpClassicHist(spark)
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(rows === Seq(
      ("rpc_latency_seconds_bucket", "eu", "+Inf", 1000L, 6.0),
      ("rpc_latency_seconds_bucket", "eu", "0.5", 1000L, 3.0),
      ("rpc_latency_seconds_bucket", "eu", "1", 1000L, 5.0),
      ("rpc_latency_seconds_count", "eu", "", 1000L, 6.0),
      ("rpc_latency_seconds_sum", "eu", "", 1000L, 4.5)))
    // le text convention: integral bounds drop the trailing .0
    assert(Otlp.fmtLe(1.0) === "1" && Otlp.fmtLe(0.5) === "0.5" &&
      Otlp.fmtLe(250.0) === "250")
    // delta-temporality classic histograms 400 like the other kinds
    val delta = Otlp.ClassicHist("m", "", 1, Vector.empty, Vector.empty,
      0L, 1L, 0.0, Vector(1.0), Vector(1L, 0L))
    val e = intercept[IllegalArgumentException](Otlp.translate(
      Otlp.Decoded(Vector.empty, Vector.empty, Vector(delta))))
    assert(e.getMessage.contains("cumulative"))
  }

  test("summaries translate to quantile-labeled gauges + _sum/_count") {
    val rows = Otlp.otlpSummary(spark)
      .as[(String, String, String, String, Long, Double)].collect().toSeq
    assert(rows === Seq(
      ("rpc_latency_seconds", "checkout", "0.5", "eu", 1000L, 0.25),
      ("rpc_latency_seconds", "checkout", "0.9", "eu", 1000L, 4.5),
      ("rpc_latency_seconds_count", "checkout", "", "eu", 1000L, 10.0),
      ("rpc_latency_seconds_sum", "checkout", "", "eu", 1000L, 2.5)))
    // structural check of the walked point itself (attrs after the
    // quantile_values on the wire; fixed64 count; double sum)
    val sm = Otlp.SummaryPoint("svc.latency", "ms", Vector.empty,
      Vector("k" -> "us"), 3000000000L, 7L, 1.25,
      Vector((0.5, 2.0), (0.99, 8.0)))
    val series = Otlp.translate(Otlp.Decoded(Vector.empty, Vector.empty,
      Vector.empty, Vector(sm)))
    assert(series.map(_.labels) === Vector(
      Vector("__name__" -> "svc_latency_milliseconds", "k" -> "us",
        "quantile" -> "0.5"),
      Vector("__name__" -> "svc_latency_milliseconds", "k" -> "us",
        "quantile" -> "0.99"),
      Vector("__name__" -> "svc_latency_milliseconds_sum", "k" -> "us"),
      Vector("__name__" -> "svc_latency_milliseconds_count", "k" -> "us")))
    assert(series.flatMap(_.samples) === Vector((2.0, 3000L), (8.0, 3000L),
      (1.25, 3000L), (7.0, 3000L)))
  }

  test("an OTLP expohist POST lands in the live native-histogram family") {
    val dir = fixture("events" ->
      Seq(ev(1, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    val sink = new RemoteWriteSink(spark)
    val server = QueryEndpoint.start(spark, dir, remoteWrite = Some(sink))
    try {
      // push the a1q gate's payload bytes through the real HTTP door
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/otlp/v1/metrics"
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/x-protobuf")
      val body = RemoteWrite.hexBytes(
        "0A76" + "0A1C" + "0A1A" + "0A0C" + "736572766963652E6E616D65" +
          "120A" + "0A08" + "636865636B6F7574" + "1256" + "1254" +
          "0A08" + "7265712E73697A65" + "1A02" + "4279" + "5244" + "0A40" +
          "0A09" + "0A016B" + "1204" + "0A026575" +
          "19" + "00CA9A3B00000000" + "21" + "0C00000000000000" +
          "29" + "0000000000001140" + "3006" + "39" + "0100000000000000" +
          "4206" + "0800" + "12020503" + "4A05" + "0802" + "120103" + "1002")
      try {
        val os = conn.getOutputStream
        try os.write(body) finally os.close()
        assert(conn.getResponseCode === 200)
      } finally conn.disconnect()
      val q = sink.nativeFamily.writeStream.format("memory")
        .queryName("otlp_fam").outputMode("complete").start()
      try {
        q.processAllAvailable()
        // the streamed family state ≡ the a1q batch gate's inputs, and
        // the quantile off it ≡ the gate's answer
        val served = RemoteWrite.familyQuantile(spark,
          spark.table("otlp_fam"), 0.9)
          .as[(String, String, Long, Long, Double, Double)].collect().toSeq
        val gate = Otlp.otlpExpoHist(spark)
          .as[(String, String, Long, Long, Double, Double)].collect().toSeq
        assert(served === gate)
      } finally q.stop()
    } finally server.stop(0)
  }

  test("malformed OTLP bytes fail loud") {
    intercept[IllegalArgumentException](Otlp.walk(Array[Byte](0x0A, 0x05, 0x00)))
    intercept[IllegalArgumentException](
      Otlp.walk(RemoteWrite.hexBytes("0A03" + "0B0000"))) // group wiretype
  }

  test("POST /api/v1/otlp/v1/metrics ingests, gzip negotiates, errors 400/405") {
    val dir = fixture("events" ->
      Seq(ev(1, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    val sink = new RemoteWriteSink(spark)
    val server = QueryEndpoint.start(spark, dir, remoteWrite = Some(sink))
    val port = server.getAddress.getPort
    val url = s"http://127.0.0.1:$port/api/v1/otlp/v1/metrics"
    // re-use the a1n gate's hand-assembled payload bytes via the walker:
    // one gauge point (cpu.temp) as a minimal live export
    val body = {
      // tiny request assembled through the translation's own wire
      // helpers is circular — hand-build the 2-level nesting instead:
      // resource_metrics { scope_metrics { metric { name="up.time",
      //   unit="s", gauge { dp { time=1e9, as_double=2.5 } } } } }
      RemoteWrite.hexBytes(
        "0A26" + // resource_metrics, 38 bytes
          "1224" + // scope_metrics, 36 bytes
          "1222" + // metric, 34 bytes
          "0A07" + "75702E74696D65" + // name = "up.time"
          "1A01" + "73" + // unit = "s"
          "2A14" + // gauge, 20 bytes
          "0A12" + // data_point, 18 bytes
          "19" + "00CA9A3B00000000" + // time = 1e9 ns
          "21" + "0000000000000440") // as_double = 2.5
    }
    try {
      def post(bytes: Array[Byte], gzip: Boolean = false): Int = {
        val conn = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/x-protobuf")
        if (gzip) conn.setRequestProperty("Content-Encoding", "gzip")
        try {
          val os = conn.getOutputStream
          try os.write(bytes) finally os.close()
          conn.getResponseCode
        } finally conn.disconnect()
      }
      assert(post(body) === 200)
      val gz = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(body); g.close()
        bos.toByteArray
      }
      assert(post(gz, gzip = true) === 200)
      val q = sink.events.writeStream.format("memory")
        .queryName("otlp_ev").outputMode("append").start()
      try {
        q.processAllAvailable()
        val evs = spark.table("otlp_ev")
          .select("event_type", "value")
          .as[(String, Double)].collect().toSeq
        assert(evs === Seq(
          ("up_time_seconds", 2.5), ("up_time_seconds", 2.5)),
          "both the plain and the gzip POST landed")
      } finally q.stop()
      assert(post(Array[Byte](1, 2, 3)) === 400)
      // delta sum at the door: 400
      val delta = RemoteWrite.hexBytes(
        "0A18" + "1216" + "1214" +
          "0A01" + "6D" + // name = "m"
          "3A0F" + // sum, 15 bytes
          "0A09" + // dp, 9 bytes: just the time
          "19" + "00CA9A3B00000000" +
          "1001" + "1801") // temporality = DELTA, monotonic
      assert(post(delta) === 400)
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try assert(conn.getResponseCode === 405) finally conn.disconnect()
    } finally server.stop(0)
  }

  test("OTLP delta sums convert to cumulative behind the opt-in, cross-request") {
    val dir = fixture("events" ->
      Seq(ev(1, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    val sink = new RemoteWriteSink(spark)
    // the 3.x flag: the door holds one cross-request DeltaState
    val server = QueryEndpoint.start(spark, dir, remoteWrite = Some(sink),
      otlpDeltaToCumulative = true)
    val url =
      s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/otlp/v1/metrics"
    // one-point DELTA monotonic sum named "m": resource_metrics {
    // scope_metrics { metric { name="m", sum { dp { time, as_double }
    // temporality=DELTA, monotonic } } } }
    def deltaBody(tsLE: String, vLE: String): Array[Byte] =
      RemoteWrite.hexBytes(
        "0A21" + "121F" + "121D" +
          "0A01" + "6D" +
          "3A18" +
          "0A12" + "19" + tsLE + "21" + vLE +
          "1001" + "1801")
    def post(bytes: Array[Byte]): Int = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      try {
        val os = conn.getOutputStream
        try os.write(bytes) finally os.close()
        conn.getResponseCode
      } finally conn.disconnect()
    }
    try {
      // two requests ACCUMULATE: 2.0 then +3.5 → cumulative 2.0, 5.5
      assert(post(deltaBody("00CA9A3B00000000", "0000000000000040")) === 200)
      assert(post(deltaBody("0094357700000000", "0000000000000C40")) === 200)
      // an out-of-order delta (at the already-seen 1 s) DROPS — it can
      // never merge into the cumulative stream (upstream drops it too)
      assert(post(deltaBody("00CA9A3B00000000", "0000000000005940")) === 200)
      val q = sink.events.writeStream.format("memory")
        .queryName("otlp_delta_ev").outputMode("append").start()
      try {
        q.processAllAvailable()
        val evs = spark.table("otlp_delta_ev")
          .select("event_type", "value").as[(String, Double)]
          .collect().toSeq.sortBy(_._2)
        assert(evs === Seq(("m", 2.0), ("m", 5.5)),
          "cross-request running total; the out-of-order point dropped")
      } finally q.stop()
    } finally server.stop(0)
  }

  test("OTLP delta exponential histograms accumulate behind the opt-in; scale mismatch downscales") {
    def h(tsNano: Long, temporality: Int, count: Long, sum: Double,
        zero: Long, scale: Int, posOff: Int, pos: Vector[Long]): Otlp.ExpoHist =
      Otlp.ExpoHist("lat", "s", temporality, Vector.empty,
        Vector("k" -> "eu"), tsNano, count, sum, zero, scale,
        posOff, pos, 0, Vector.empty)
    // without the flag, delta expohists still fail loud (the default)
    intercept[IllegalArgumentException] {
      Otlp.translate(Otlp.Decoded(Vector.empty,
        Vector(h(1000000000L, 1, 2, 1.0, 0, 3, 0, Vector(2L)))))
    }
    val st = new Otlp.DeltaState
    def wire(series: Vector[RemoteWrite.Series]) =
      series.flatMap(s => s.hists.map(hh =>
        (hh.tsMs, hh.schema, hh.count, hh.sum, hh.zeroCount,
          hh.offs, hh.lens, hh.deltas)))
    // push 1 at scale 3: Prom indices 1→5, 2→3
    val w1 = wire(Otlp.translate(Otlp.Decoded(Vector.empty,
      Vector(h(1000000000L, 1, 9, 3.5, 1, 3, 0, Vector(5L, 3L)))), Some(st)))
    assert(w1 === Vector((1000L, 3, 9L, 3.5, 1L,
      Vector(1), Vector(2), Vector(5L, -2L))))
    // push 2 at COARSER scale 2: its index 1 covers scale-3 indices
    // 1..2 — the running state downscales (5+3 fold into new index 1)
    // and the new bucket adds there too: index 1 → 5+3+4 = 12
    val w2 = wire(Otlp.translate(Otlp.Decoded(Vector.empty,
      Vector(h(2000000000L, 1, 4, 1.25, 1, 2, 0, Vector(4L)))), Some(st)))
    assert(w2 === Vector((2000L, 2, 13L, 4.75, 2L,
      Vector(1), Vector(1), Vector(12L))))
    // an out-of-order delta point DROPS (nothing emitted)
    val w3 = wire(Otlp.translate(Otlp.Decoded(Vector.empty,
      Vector(h(1500000000L, 1, 7, 9.0, 0, 2, 0, Vector(7L)))), Some(st)))
    assert(w3.isEmpty)
  }

  test("OTLP delta classic histograms accumulate; a bounds change resets the series") {
    def ch(tsNano: Long, temporality: Int, count: Long, sum: Double,
        bounds: Vector[Double], cs: Vector[Long]): Otlp.ClassicHist =
      Otlp.ClassicHist("lat", "s", temporality, Vector.empty,
        Vector("k" -> "eu"), tsNano, count, sum, bounds, cs)
    // flag-less delta classic still 400s (the default)
    intercept[IllegalArgumentException] {
      Otlp.translate(Otlp.Decoded(Vector.empty, Vector.empty,
        Vector(ch(1000000000L, 1, 3, 1.0, Vector(1.0), Vector(2L, 1L)))))
    }
    val st = new Otlp.DeltaState
    def buckets(series: Vector[RemoteWrite.Series]) = series
      .filter(_.labels.exists(l => l._1 == "__name__" &&
        l._2 == "lat_seconds_bucket"))
      .map(s => (s.labels.collectFirst { case ("le", v) => v }.get,
        s.samples.head._1, s.samples.head._2)).sortBy(_._1)
    // two delta pushes with the SAME bounds add per bucket:
    // [2,1]+[1,4] → cumulative per-bucket [3,5] → _bucket 3, 8(+Inf)
    Otlp.translate(Otlp.Decoded(Vector.empty, Vector.empty,
      Vector(ch(1000000000L, 1, 3, 1.0, Vector(1.0), Vector(2L, 1L)))),
      Some(st))
    val w2 = buckets(Otlp.translate(Otlp.Decoded(Vector.empty, Vector.empty,
      Vector(ch(2000000000L, 1, 5, 2.5, Vector(1.0), Vector(1L, 4L)))),
      Some(st)))
    assert(w2 === Vector(("+Inf", 8.0, 2000L), ("1", 3.0, 2000L)))
    // a BOUNDS change resets the running state to the incoming point
    val w3 = buckets(Otlp.translate(Otlp.Decoded(Vector.empty, Vector.empty,
      Vector(ch(3000000000L, 1, 2, 0.5, Vector(5.0), Vector(2L, 0L)))),
      Some(st)))
    assert(w3 === Vector(("+Inf", 2.0, 3000L), ("5", 2.0, 3000L)))
  }
}
