package graft

import graft.sources.{RemoteWrite, RemoteWriteClient, RemoteWriteSink}
import graft.streaming.MetricStream
import org.apache.spark.sql.streaming.OutputMode

/** The PUSH half of the wire contract: remote-write payloads decode to
  * sample rows (hand-assembled foreign bytes AND encoder round-trips),
  * malformed bodies fail at the door, and an HTTP POST to
  * `/api/v1/write` lands in the streaming ingest — push → decode →
  * events → streamingRollup, end to end.
  */
class RemoteWriteSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-assembled WriteRequest decodes to exactly the hand-derived samples") {
    val rows = RemoteWrite.wireDecode(spark)
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(rows === Seq(
      ("cpu_temp", "", "us", 300000L, -1.5),
      ("purchase_total", "box:9090", "eu", 1000L, 3.5),
      ("purchase_total", "box:9090", "eu", 61000L, 4.25)))
  }

  test("walk round-trips encode, through snappy framing") {
    val series = Vector(
      RemoteWrite.Series(
        Vector("__name__" -> "signup_total", "k" -> "eu", "zone" -> "a"),
        Vector((0.0, 0L), (1e300, 1234567890123L), (-2.5, 42L))),
      RemoteWrite.Series(Vector("__name__" -> "idle"), Vector.empty),
      RemoteWrite.Series(Vector.empty, Vector((7.0, 9L))),
      // native-histogram payloads: zigzag schema/offsets (negative
      // values exercise the sign bit), packed delta chains
      RemoteWrite.Series(Vector("__name__" -> "req_ms"), Vector.empty,
        Vector(
          RemoteWrite.Hist(1000L, 3, Vector(-4, 2), Vector(1, 3),
            Vector(5L, -2L, 1L, 0L)),
          RemoteWrite.Hist(2000L, -1, Vector.empty, Vector.empty,
            Vector.empty))))
    val wire = RemoteWrite.compress(RemoteWrite.encode(series))
    assert(RemoteWrite.walk(RemoteWrite.uncompress(wire)) === series)
  }

  test("FLOAT-form histograms round-trip both protocols; form dispatch is per sample") {
    // fractional bucket mass: absolute double counts (prompb fields
    // 2/7/10/13), coexisting with an integer histogram on another series
    val series = Vector(
      RemoteWrite.Series(Vector("__name__" -> "rate_ms", "k" -> "f"),
        Vector.empty,
        fhists = Vector(
          RemoteWrite.FHist(1000L, 3, Vector(-1, 2), Vector(1, 2),
            Vector(0.75, 1.25, 0.5), 4.75, -1.5, 1.0),
          // zero-count float sample: must STAY float on re-walk (the
          // always-written fields 2/7 are the form marker)
          RemoteWrite.FHist(2000L, -2, Vector.empty, Vector.empty,
            Vector.empty, 0.0, 0.0, 0.0,
            Vector(0), Vector(1), Vector(2.25)))),
      RemoteWrite.Series(Vector("__name__" -> "req_ms"), Vector.empty,
        Vector(RemoteWrite.Hist(1000L, 3, Vector(0), Vector(2),
          Vector(3L, -1L), 13L, 7.5, 2L))))
    assert(RemoteWrite.walk(RemoteWrite.uncompress(
      RemoteWrite.compress(RemoteWrite.encode(series)))) === series)
    assert(RemoteWrite.walkV2(RemoteWrite.encodeV2(series)) === series)
    // the sink counts float samples in its accepted total
    val sink = new RemoteWriteSink(spark)
    assert(sink.receiveSeries(series) === 3L)
    // a NEGATIVE-ZERO sum survives the wire bit-exactly (the writer
    // skips the field by raw BITS, not by == 0.0 — which -0.0 passes):
    // both protocols, both histogram forms
    val nz = Vector(
      RemoteWrite.Series(Vector("__name__" -> "z"), Vector.empty,
        hists = Vector(RemoteWrite.Hist(1L, 0, Vector(0), Vector(1),
          Vector(1L), 1L, -0.0, 0L)),
        fhists = Vector(RemoteWrite.FHist(2L, 0, Vector(0), Vector(1),
          Vector(1.0), 1.0, -0.0, 0.0))))
    def sumBits(ss: Seq[RemoteWrite.Series]): Seq[Long] =
      ss.flatMap(s => s.hists.map(_.sum) ++ s.fhists.map(_.sum))
        .map(java.lang.Double.doubleToRawLongBits)
    assert(sumBits(RemoteWrite.walk(RemoteWrite.encode(nz)))
      === sumBits(nz))
    assert(sumBits(RemoteWrite.walkV2(RemoteWrite.encodeV2(nz)))
      === sumBits(nz))
  }

  test("hand-assembled native-histogram payload walks to the hand-derived buckets") {
    val rows = RemoteWrite.wireDecodeHist(spark)
      .as[(String, String, Long, Int, Int, Int, Long)].collect().toSeq
    // series b's histogram carries reset_hint GAUGE (3) on the wire —
    // the decode relation carries it relationally since r16
    assert(rows === Seq(
      ("req_ms", "a", 1000L, 3, 0, 0, 3L),
      ("req_ms", "a", 1000L, 3, 0, 1, 2L),
      ("req_ms", "a", 1000L, 3, 0, 5, 4L),
      ("req_ms", "a", 1000L, 3, 0, 6, 4L),
      ("req_ms", "b", 2000L, 3, 3, -2, 7L)))
  }

  test("v2: hand-assembled symbol-table Request resolves to the hand-derived samples") {
    val rows = RemoteWrite.wireDecodeV2(spark)
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(rows === Seq(
      ("cpu_temp", "", "us", 300000L, -1.5),
      ("purchase_total", "box:9090", "eu", 1000L, 3.5)))
  }

  test("v2: walkV2 round-trips encodeV2, histograms included") {
    val series = Vector(
      RemoteWrite.Series(
        Vector("__name__" -> "signup_total", "k" -> "eu"),
        Vector((0.25, 7L), (-3.0, 99L))),
      // shares symbols with the first series (interning is per-request)
      RemoteWrite.Series(
        Vector("__name__" -> "signup_total", "k" -> "us"),
        Vector((1.0, 7L))),
      RemoteWrite.Series(Vector("__name__" -> "req_ms"), Vector.empty,
        Vector(RemoteWrite.Hist(42L, 3, Vector(-1), Vector(2),
          Vector(4L, -1L)))))
    val wire = RemoteWrite.encodeV2(series)
    assert(RemoteWrite.walkV2(wire) === series)
    // interning is real: the shared "signup_total" symbol appears in
    // the request bytes exactly once (v1 would carry it per series)
    val text = new String(wire, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert("signup_total".r.findAllIn(text).size === 1)
    assert(RemoteWrite.encode(series).containsSlice(
      "signup_total".getBytes) && {
      val v1 = new String(RemoteWrite.encode(series),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      "signup_total".r.findAllIn(v1).size === 2
    }, "the v1 form repeats the label value per series")
    // malformed v2: a ref past the symbol table fails loud
    intercept[IllegalArgumentException](
      RemoteWrite.walkV2(RemoteWrite.hexBytes("2A040A020163" + "2200")))
  }

  test("malformed payloads fail loud: truncated varint, overrun length, group wire type") {
    // 0A = timeseries tag, then a continuation byte with no terminator
    intercept[IllegalArgumentException](RemoteWrite.walk(RemoteWrite.hexBytes("0A80")))
    // declared length 5, one content byte present
    intercept[IllegalArgumentException](RemoteWrite.walk(RemoteWrite.hexBytes("0A0500")))
    // wire type 3 (group start) is not in the proto3 wire format
    intercept[IllegalArgumentException](RemoteWrite.walk(RemoteWrite.hexBytes("0B")))
  }

  private def post(url: String, body: Array[Byte],
      contentType: String = "application/x-protobuf")
      : (Int, String, Option[String]) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", contentType)
    conn.setRequestProperty("Content-Encoding", "snappy")
    try {
      val os = conn.getOutputStream
      try os.write(body) finally os.close()
      val code = conn.getResponseCode
      val written = Option(conn.getHeaderField(
        "X-Prometheus-Remote-Write-Samples-Written"))
      val is = Option(if (code >= 400) conn.getErrorStream else conn.getInputStream)
      val text = is.map { s =>
        try new String(s.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally s.close()
      }.getOrElse("")
      (code, text, written)
    } finally conn.disconnect()
  }

  test("POST /api/v1/write ingests into the streaming rollup pyramid") {
    val dir = fixture("events" ->
      Seq(ev(1, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    val sink = new RemoteWriteSink(spark)
    val server = graft.sources.QueryEndpoint.start(spark, dir,
      remoteWrite = Some(sink))
    val port = server.getAddress.getPort
    val url = s"http://127.0.0.1:$port/api/v1/write"
    try {
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01").getTime
      val q = MetricStream.streamingRollup(sink.events)
        .writeStream.format("memory").queryName("rw_roll")
        .outputMode(OutputMode.Update).start()
      try {
        // two pushes, like a forwarding Prometheus's successive sends
        val (c1, _, _) = post(url, RemoteWrite.compress(RemoteWrite.encode(Seq(
          RemoteWrite.Series(
            Vector("__name__" -> "purchase_total", "k" -> "a"),
            Vector((5.5, t1)))))))
        assert(c1 === 204)
        val (c2, _, _) = post(url, RemoteWrite.compress(RemoteWrite.encode(Seq(
          RemoteWrite.Series(
            Vector("__name__" -> "purchase_total", "k" -> "a"),
            Vector((7.25, t1 + 60000L))),
          RemoteWrite.Series(
            Vector("__name__" -> "click_total", "k" -> "b"),
            Vector((2.0, t1)))))))
        assert(c2 === 204)
        q.processAllAvailable()
        val rows = spark.table("rw_roll")
          .as[(String, String, String, String, Long, Long, BigDecimal,
            Double, Double, Double, (Long, Long), Double, (Long, Long),
            Option[(Long, Long)])]
          .collect()
        def state(name: String, k: String) =
          rows.filter(r => r._1 == name && r._2 == k).maxBy(_._6)
        val pa = state("purchase", "a")
        assert(pa._6 === 2L, "both pushed samples in the 1h bucket")
        assert(pa._7 === BigDecimal("12.75"), "exact decimal sum 5.5 + 7.25")
        assert(pa._8 === 5.5 && pa._9 === 7.25, "vmin/vmax bracket the pushes")
        assert(pa._12 === 7.25, "vlast follows the later SAMPLE timestamp")
        assert(state("click", "b")._6 === 1L)
      } finally q.stop()
    } finally server.stop(0)
  }

  test("POST negotiates remote write 2.0 by content type; written-samples header") {
    val dir = fixture("events" ->
      Seq(ev(1, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    val sink = new RemoteWriteSink(spark)
    val server = graft.sources.QueryEndpoint.start(spark, dir,
      remoteWrite = Some(sink))
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/write"
    try {
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01").getTime
      val q = sink.events.writeStream.format("memory")
        .queryName("rw_v2").outputMode("append").start()
      try {
        val body = RemoteWrite.compress(RemoteWrite.encodeV2(Seq(
          RemoteWrite.Series(
            Vector("__name__" -> "purchase_total", "k" -> "a"),
            Vector((5.5, t1), (7.25, t1 + 1000L))),
          RemoteWrite.Series(
            Vector("__name__" -> "click_total", "k" -> "b"),
            Vector((2.0, t1))))))
        val (code, _, written) = post(url, body, RemoteWrite.V2ContentType)
        assert(code === 204)
        assert(written === Some("3"), "the 2.0 receiver reports accepted samples")
        q.processAllAvailable()
        val got = spark.table("rw_v2")
          .select("event_type", "value").collect()
          .map(r => (r.getString(0), r.getDouble(1))).toSet
        assert(got === Set(("purchase", 5.5), ("purchase", 7.25),
          ("click", 2.0)))
        // a v2 body under the 1.0 content type decodes vacuously (no
        // field-1 series) — accepted with ZERO samples written, the
        // same mis-negotiation behavior an upstream 1.0 receiver has
        val (code0, _, written0) = post(url, body)
        assert(code0 === 204 && written0 === Some("0"))
      } finally q.stop()
    } finally server.stop(0)
  }

  test("the forwarder pushes the registry downstream: leaf-initiated federation") {
    import graft.sources.RemoteWriteClient
    import graft.streaming.{ExpositionRegistry, MetricStream}
    ExpositionRegistry.clear()
    Seq(
      MetricStream.SeriesTotal("purchase", "a", 5.5, 3),
      MetricStream.SeriesTotal("purchase", "b", 4.0, 1),
      MetricStream.SeriesTotal("click", "a", 2.0, 2)
    ).foreach(ExpositionRegistry.publish)
    val dir = fixture("events" ->
      Seq(ev(1, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    val sink = new RemoteWriteSink(spark)
    val server = graft.sources.QueryEndpoint.start(spark, dir,
      remoteWrite = Some(sink))
    try {
      val client = new RemoteWriteClient(
        s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/write")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01").getTime
      val q = sink.events.writeStream.format("memory")
        .queryName("rw_fwd").outputMode("append").start()
      try {
        assert(client.push(t1) === 204)
        assert(client.status._2 === None, "clean push records no error")
        q.processAllAvailable()
        // the downstream's decoded events are exactly the leaf's
        // registry (_total strips back to the family name on ingest)
        val got = spark.table("rw_fwd")
          .select("event_type", "props", "value").collect()
          .map(r => (r.getString(0),
            r.getString(1).split("\"")(3), r.getDouble(2))).toSet
        assert(got === Set(("purchase", "a", 5.5), ("purchase", "b", 4.0),
          ("click", "a", 2.0)))
      } finally q.stop()
      // a dead downstream records, never throws
      val dead = new RemoteWriteClient("http://127.0.0.1:1/api/v1/write")
      assert(dead.push(t1) === -1)
      assert(dead.status._2.nonEmpty)
    } finally server.stop(0)
  }

  test("external_labels join outbound wire series; series labels win on conflict") {
    import graft.sources.RemoteWrite
    val ext = Map("env" -> "prod", "k" -> "ext-loses", "drop" -> "")
    // the attach law: name-sorted merge, series label wins, empties drop
    assert(RemoteWrite.withExternal(
      Vector("__name__" -> "m_total", "k" -> "a"), ext) ===
      Vector("__name__" -> "m_total", "env" -> "prod", "k" -> "a"))
    assert(RemoteWrite.withExternal(Vector("__name__" -> "m"), Map.empty) ===
      Vector("__name__" -> "m"))
    // and the merged labels survive the wire round-trip byte-faithfully
    val s = RemoteWrite.Series(
      RemoteWrite.withExternal(Vector("__name__" -> "m_total", "k" -> "a"), ext),
      Vector((1.5, 1000L)))
    val back = RemoteWrite.walk(RemoteWrite.uncompress(
      RemoteWrite.compress(RemoteWrite.encode(Seq(s)))))
    assert(back.head.labels ===
      Vector("__name__" -> "m_total", "env" -> "prod", "k" -> "a"))
  }

  test("write endpoint rejects: garbage body 400, GET 405, unconfigured 400") {
    val dir = fixture("events" ->
      Seq(ev(1, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    val sink = new RemoteWriteSink(spark)
    val server = graft.sources.QueryEndpoint.start(spark, dir,
      remoteWrite = Some(sink))
    val port = server.getAddress.getPort
    val url = s"http://127.0.0.1:$port/api/v1/write"
    try {
      val (code, body, _) = post(url, Array[Byte](1, 2, 3))
      assert(code === 400 && body.contains("bad_data"))
      // valid snappy frame around malformed protobuf is ALSO a 400
      val (code2, _, _) = post(url,
        RemoteWrite.compress(RemoteWrite.hexBytes("0A0500")))
      assert(code2 === 400)
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try assert(conn.getResponseCode === 405) finally conn.disconnect()
    } finally server.stop(0)

    val bare = graft.sources.QueryEndpoint.start(spark, dir)
    try {
      val (code, body, _) = post(
        s"http://127.0.0.1:${bare.getAddress.getPort}/api/v1/write",
        RemoteWrite.compress(RemoteWrite.encode(Nil)))
      assert(code === 400 && body.contains("not configured"))
    } finally bare.stop(0)
  }

  test("backfill replays the FULL event history downstream, executor-side") {
    // engine A holds history across all three kinds; engine B receives
    // over real HTTP; B's decoded events must reconstruct A's samples
    // with their ORIGINAL timestamps (not the push instant) — the
    // replay story the snapshot-push deliberately does not cover
    val dirA = fixture("events" -> Seq(
      ev(0, 0L, "purchase", 1.5, "eu"),
      ev(1, 60000L, "purchase", 2.25, "eu"),
      ev(2, 1000L, "purchase", 4.0, "us"),
      ev(3, 2000L, "signup", 10.0, "eu"),
      ev(4, 3000L, "error", 0.25, "eu"),
      ev(5, 4000L, "error", 0.75, "eu")
    ).toDF(eventCols: _*))
    val dirB = fixture("events" ->
      Seq(ev(9, 0L, "purchase", 0.0, "zz")).toDF(eventCols: _*))
    val sinkB = new RemoteWriteSink(spark)
    val server = graft.sources.QueryEndpoint.start(spark, dirB,
      remoteWrite = Some(sinkB))
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/write"
      val evA = graft.operators.Metrics.metricEvents(spark, dirA)
      // batchRows=2 forces several WriteRequests per partition
      val (sent, failedN) = new RemoteWriteClient(url).backfill(evA, batchRows = 2)
      assert(sent === 6L && failedN === 0L)
      val q = sinkB.events.writeStream.format("memory")
        .queryName("rw_backfill").outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("rw_backfill")
          .select($"event_type", $"value",
            org.apache.spark.sql.functions.unix_millis($"ts"))
          .as[(String, Double, Long)].collect().toSeq.sorted
        val want = evA
          .select($"name", $"value",
            org.apache.spark.sql.functions.unix_millis($"ts"))
          .as[(String, Double, Long)].collect().toSeq.sorted
        assert(got === want, "replayed history ≡ source history, " +
          "original timestamps preserved")
      } finally q.stop()
      // an unreachable receiver records, never throws
      val (s2, f2) = new RemoteWriteClient(
        "http://127.0.0.1:1/api/v1/write").backfill(evA, batchRows = 100)
      assert(s2 === 0L && f2 === 6L)
    } finally server.stop(0)
  }

  test("prompb reset_hint round-trips: both protocols, both histogram forms") {
    import graft.sources.RemoteWrite.{FHist, Hist, Series}
    // GAUGE (3) marks a gauge-type native histogram — no reset
    // semantics; YES (1) a known reset. Both ride field 14 and survive
    // the v1 AND v2 wires in both sample forms.
    val gh = Hist(5L, 0, Vector(0), Vector(1), Vector(2L), 2L, 1.5, 0L,
      resetHint = 3)
    val yh = FHist(6L, 0, Vector(0), Vector(1), Vector(2.5), 2.5, 1.5, 0.0,
      resetHint = 1)
    val s = Series(Vector("__name__" -> "g", "k" -> "a"), Vector.empty,
      hists = Vector(gh), fhists = Vector(yh))
    assert(RemoteWrite.walk(RemoteWrite.encode(Seq(s))) === Vector(s))
    assert(RemoteWrite.walkV2(RemoteWrite.encodeV2(Seq(s))) === Vector(s))
    // an absent field keeps the proto3 zero default (UNKNOWN)
    val plain = s.copy(hists = Vector(gh.copy(resetHint = 0)),
      fhists = Vector(yh.copy(resetHint = 0)))
    assert(RemoteWrite.walk(RemoteWrite.encode(Seq(plain))) === Vector(plain))
  }

  test("created timestamps: v2 round-trip, CT-zero materialization at the door") {
    import graft.sources.RemoteWrite.Series
    // the 2.0 wire round-trips created_timestamp (field 6)
    val s = Series(Vector("__name__" -> "c_total"),
      Vector((3.5, 1000L), (4.0, 2000L)), createdTsMs = 500L)
    assert(RemoteWrite.walkV2(RemoteWrite.encodeV2(Seq(s))) === Vector(s))
    // absent CT keeps the proto3 zero default
    val bare = s.copy(createdTsMs = 0L)
    assert(RemoteWrite.walkV2(RemoteWrite.encodeV2(Seq(bare)))
      === Vector(bare))
    // the 1.0 wire has NO CT field — a v1 round-trip drops it (the
    // documented downgrade; the door carries CT as the zero sample)
    assert(RemoteWrite.walk(RemoteWrite.encode(Seq(s))) === Vector(bare))
    // CTZeroIngestion: CT strictly before the first sample prepends
    // the birth as a zero sample; CT at/after the first sample or
    // absent is a no-op (never fabricate out-of-order or duplicate
    // mass); a sample-less series is untouched
    assert(RemoteWrite.withCtZero(Vector(s)).head.samples
      === Vector((0.0, 500L), (3.5, 1000L), (4.0, 2000L)))
    assert(RemoteWrite.withCtZero(Vector(s.copy(createdTsMs = 1000L)))
      === Vector(s.copy(createdTsMs = 1000L)))
    assert(RemoteWrite.withCtZero(Vector(s.copy(createdTsMs = 1500L)))
      === Vector(s.copy(createdTsMs = 1500L)))
    assert(RemoteWrite.withCtZero(Vector(bare)) === Vector(bare))
    assert(RemoteWrite.withCtZero(Vector(
      s.copy(samples = Vector.empty))).head.samples === Vector.empty)
    // the sink's v2 door materializes the CT zero into the stream wire
    // shape: the decoded relation carries the birth row
    val sink = new RemoteWriteSink(spark)
    sink.receive(RemoteWrite.compress(RemoteWrite.encodeV2(Seq(s))),
      atMs = 7L, contentType = Some(RemoteWrite.V2ContentType))
    val q = sink.samples.writeStream.format("memory")
      .queryName("ct_door").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ct_door")
        .select("ts_ms", "value").as[(Long, Double)].collect().sorted
      assert(rows === Array((500L, 0.0), (1000L, 3.5), (2000L, 4.0)))
    } finally q.stop()
  }

  test("NHCB converter: custom bounds, first-bucket and overflow ranks, monotone guard") {
    def classicRows(infV: Double, cums: Seq[(String, Double)]) = {
      val bk = cums.map { case (le, c) =>
        (Map("__name__" -> "lat_bucket", "k" -> "a", "le" -> le), c, 1000L)
      } :+ ((Map("__name__" -> "lat_bucket", "k" -> "a", "le" -> "+Inf"),
        infV, 1000L)) :+
        ((Map("__name__" -> "lat_sum", "k" -> "a"), 4.5, 1000L))
      bk.toDF("labels", "value", "ts_ms")
    }
    val fam = RemoteWrite.convertClassicToNhcb(
      classicRows(6.0, Seq("0.5" -> 3.0, "1" -> 5.0)))
    val row = fam.collect().head
    assert(row.getAs[Int]("schema") === -53)
    assert(row.getAs[Long]("count") === 6L)
    assert(row.getAs[Seq[Double]]("custom_values") === Seq(0.5, 1.0))
    assert(row.getAs[Seq[Long]]("deltas") === Seq(3L, 2L, 1L))
    assert(row.getAs[Long]("zero_count") === 0L)
    // a rank inside the FIRST bucket interpolates from 0 (the classic
    // lower-bound rule): 0.25·6 = 1.5 → 0 + 0.5·1.5/3 = 0.25
    val q1 = RemoteWrite.nhcbFamilyQuantile(spark, fam, 0.25)
      .collect().head.getAs[Double]("q")
    assert(q1 === 0.25)
    // a rank past the last finite bound returns that bound: φ=1 →
    // rank 6 > finite cum 5 → 1.0
    val q2 = RemoteWrite.nhcbFamilyQuantile(spark, fam, 1.0)
      .collect().head.getAs[Double]("q")
    assert(q2 === 1.0)
    // a decreasing cumulative ladder fails LOUD at the converter
    val bad = RemoteWrite.convertClassicToNhcb(
      classicRows(6.0, Seq("0.5" -> 5.0, "1" -> 3.0)))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("non-monotone classic ladder"))
  }

  test("backfillRecorded forwards a recording rule's lattice downstream, executor-side") {
    // upstream's recommended long-term-storage payload: aggregated
    // rule outputs. Engine A's 30s sum-by rule over a 60s corpus span
    // yields 5 lattice samples (eu: 1.5/1.5/3.75, us born after the
    // first instant: 4.0/4.0); engine B receives over real HTTP and
    // its decoded events must carry the rule's name, values, and
    // lattice timestamps
    val dirA = fixture("events" -> Seq(
      ev(0, 0L, "purchase", 1.5, "eu"),
      ev(1, 60000L, "purchase", 2.25, "eu"),
      ev(2, 1000L, "purchase", 4.0, "us")
    ).toDF(eventCols: _*))
    val dirB = fixture("events" ->
      Seq(ev(9, 0L, "purchase", 0.0, "zz")).toDF(eventCols: _*))
    val rel = graft.promql.Rules.recordedSeriesRelation(spark, dirA,
      graft.promql.Rules.RecordingRule("k_sum", "sum by (k) (purchase)",
        intervalS = 30))
    val sinkB = new RemoteWriteSink(spark)
    val server = graft.sources.QueryEndpoint.start(spark, dirB,
      remoteWrite = Some(sinkB))
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/write"
      // batchRows=2 forces several WriteRequests per partition
      val (sent, failedN) =
        new RemoteWriteClient(url).backfillRecorded(rel, batchRows = 2)
      assert(sent === 5L && failedN === 0L)
      val q = sinkB.events.writeStream.format("memory")
        .queryName("rw_backfill_rec").outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("rw_backfill_rec")
          .select($"event_type", $"value",
            org.apache.spark.sql.functions.unix_millis($"ts"))
          .as[(String, Double, Long)].collect().toSeq.sorted
        val want = rel
          .select(org.apache.spark.sql.functions
            .element_at($"labels", "__name__"), $"value", $"ts_ms")
          .as[(String, Double, Long)].collect().toSeq.sorted
        assert(got === want,
          "received rule samples ≡ the lattice relation, timestamps preserved")
      } finally q.stop()
    } finally server.stop(0)
  }

  test("pushed native histograms land in a LIVE family: LWW registry through the sink") {
    // the same two payloads the a1l gate hand-assembles, but POSTed
    // through the RECEIVE path (snappy framing, driver-side validation,
    // streaming relation) — the sink's family view must serve exactly
    // the gate's batch answer: series a superseded by push 2, series b
    // still push 1's snapshot
    val sink = new RemoteWriteSink(spark)
    val series1 = Vector(
      RemoteWrite.Series(Vector("__name__" -> "req_ms", "k" -> "a"),
        Vector.empty, Vector(RemoteWrite.Hist(1000L, 3, Vector(0, 3),
          Vector(2, 2), Vector(3L, -1L, 2L, 0L), 15L, 7.5, 2L))),
      RemoteWrite.Series(Vector("__name__" -> "req_ms", "k" -> "b"),
        Vector.empty, Vector(RemoteWrite.Hist(2000L, 3, Vector(-2),
          Vector(1), Vector(7L), 7L, 0.0, 0L))))
    val series2 = Vector(
      RemoteWrite.Series(Vector("__name__" -> "req_ms", "k" -> "a"),
        Vector.empty, Vector(RemoteWrite.Hist(3000L, 3, Vector(1),
          Vector(2), Vector(5L, -2L), 9L, 4.25, 1L))))
    sink.receive(RemoteWrite.compress(RemoteWrite.encode(series1)))
    sink.receive(RemoteWrite.compress(RemoteWrite.encode(series2)))
    val q = sink.nativeFamily.writeStream.format("memory")
      .queryName("rw_family").outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val fam = spark.table("rw_family")
        .select("metric", "label_k", "ts_ms", "count", "sum", "zero_count")
        .as[(String, String, Long, Long, Double, Long)].collect().sorted
      assert(fam === Seq(
        ("req_ms", "a", 3000L, 9L, 4.25, 1L),
        ("req_ms", "b", 2000L, 7L, 0.0, 0L)))
      // quantile off the streamed family state ≡ the a1l batch gate
      val served = RemoteWrite.familyQuantile(spark,
        spark.table("rw_family"), 0.9)
        .orderBy($"metric", $"label_k")
        .as[(String, String, Long, Long, Double, Double)].collect().toSeq
      val gate = RemoteWrite.wireDecodeFamily(spark)
        .as[(String, String, Long, Long, Double, Double)].collect().toSeq
      assert(served === gate)
    } finally q.stop()
  }

  test("pushed FLOAT histograms land in a LIVE float family; quantile ≡ the a1zz gate") {
    // the a1zz gate's two pushes POSTed through the RECEIVE path: the
    // float family view (LWW over fractional-count snapshots) must
    // serve exactly the gate's batch answer, through the same rank
    // walk in ABSOLUTE mode
    val sink = new RemoteWriteSink(spark)
    sink.receive(RemoteWrite.compress(RemoteWrite.encode(Seq(
      RemoteWrite.Series(Vector("__name__" -> "q_ms", "k" -> "a"),
        Vector.empty, fhists = Vector(RemoteWrite.FHist(1000L, 3,
          Vector(1), Vector(2), Vector(5.0, 3.0), 9.0, 4.25, 1.0)))))))
    sink.receive(RemoteWrite.compress(RemoteWrite.encode(Seq(
      RemoteWrite.Series(Vector("__name__" -> "q_ms", "k" -> "a"),
        Vector.empty, fhists = Vector(RemoteWrite.FHist(61000L, 3,
          Vector(1), Vector(2), Vector(4.5, 3.5), 10.0, 6.5, 2.0))),
      RemoteWrite.Series(Vector("__name__" -> "q_ms", "k" -> "b"),
        Vector.empty, fhists = Vector(RemoteWrite.FHist(2000L, 3,
          Vector(-2), Vector(1), Vector(7.5), 7.5, 0.5, 0.0)))))))
    val q = sink.nativeFamilyF.writeStream.format("memory")
      .queryName("rw_ffamily").outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val fam = spark.table("rw_ffamily")
        .select("metric", "label_k", "ts_ms", "count", "sum", "zero_count")
        .as[(String, String, Long, Double, Double, Double)].collect().sorted
      assert(fam === Seq(
        ("q_ms", "a", 61000L, 10.0, 6.5, 2.0),
        ("q_ms", "b", 2000L, 7.5, 0.5, 0.0)))
      val served = RemoteWrite.familyQuantile(spark,
        spark.table("rw_ffamily"), 0.9, absolute = true)
        .orderBy($"metric", $"label_k")
        .as[(String, String, Double, Double, Double, Double)].collect().toSeq
      val gate = graft.sources.RemoteWriteFloatGate
        .wireFloatFamilyQuantile(spark, "")
        .as[(String, String, Double, Double, Double, Double)].collect().toSeq
      assert(served === gate)
      // the fractional rank genuinely interpolates: a's q sits strictly
      // inside bucket 2's bounds (2^(1/8), 2^(2/8)]
      val qa = gate.head._6
      assert(qa > math.pow(2, 1.0 / 8) && qa <= math.pow(2, 2.0 / 8))
    } finally q.stop()
  }

  test("exemplars round-trip both protocols; hand-assembled payload decodes exactly") {
    val s = Vector(RemoteWrite.Series(
      Vector("__name__" -> "req_ms", "k" -> "a"),
      Vector((0.5, 1000L)),
      Vector.empty,
      Vector(
        RemoteWrite.Exemplar(Vector("trace_id" -> "t1"), 0.25, 900L),
        RemoteWrite.Exemplar(Vector.empty, -2.0, 42L))))
    assert(RemoteWrite.walk(RemoteWrite.encode(s)) === s)
    // v2 interns exemplar labels through the same symbol table
    assert(RemoteWrite.walkV2(RemoteWrite.encodeV2(s)) === s)
    val rows = RemoteWrite.wireDecodeExemplars(spark)
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(rows === Seq(
      ("req_ms", "a", "t1", 900L, 0.25),
      ("req_ms", "a", "t2", 950L, 7.5)))
  }

  test("negative buckets round-trip both protocols; the two-sided walk is sign-exact") {
    val h = RemoteWrite.Hist(7000L, 3, Vector(1), Vector(2), Vector(5L, -1L),
      20L, -3.5, 2L, Vector(-2, 1), Vector(1, 1), Vector(6L, -3L))
    val s = Vector(RemoteWrite.Series(Vector("__name__" -> "d", "k" -> "x"),
      Vector.empty, Vector(h)))
    assert(RemoteWrite.walk(RemoteWrite.encode(s)) === s)
    assert(RemoteWrite.walkV2(RemoteWrite.encodeV2(s)) === s)
    // gate values, re-derived by hand: series n's q(0.25) crosses
    // negative bucket 1 → −2^((1−0.125)/8); series p's rank sits in the
    // zero bucket → exactly 0.0
    val rows = RemoteWrite.wireDecodeNegative(spark)
      .as[(String, String, Long, Long, Double, Double)].collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._3)) ===
      Seq(("temp_delta", "n", 10L), ("temp_delta", "p", 4L)))
    assert(rows(0)._6 === -graft.functions.DetMath.exp2(0.109375))
    assert(rows(1)._6 === 0.0)
  }

  test("hist round-trip carries count/sum/zero_count; re-push is idempotent at the family") {
    val h = RemoteWrite.Hist(5000L, 3, Vector(2), Vector(1), Vector(4L),
      11L, 2.25, 3L)
    val s = Vector(RemoteWrite.Series(Vector("__name__" -> "x"),
      Vector.empty, Vector(h)))
    assert(RemoteWrite.walk(RemoteWrite.encode(s)) === s)
    assert(RemoteWrite.walkV2(RemoteWrite.encodeV2(s)) === s)
    // duplicate payload rows collapse to the same LWW state
    val payloads = Seq(RemoteWrite.encode(s), RemoteWrite.encode(s))
      .toDF("proto")
      .withColumn("recv_ts",
        org.apache.spark.sql.functions.lit(
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val fam = RemoteWrite.histFamily(RemoteWrite.decodeHist(payloads))
      .select("metric", "label_k", "ts_ms", "count", "sum", "zero_count")
      .as[(String, String, Long, Long, Double, Long)].collect().toSeq
    assert(fam === Seq(("x", "", 5000L, 11L, 2.25, 3L)))
  }
}
