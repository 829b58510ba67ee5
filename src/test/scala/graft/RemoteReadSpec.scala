package graft

import graft.sources.{QueryEndpoint, RemoteRead, RemoteWrite, RemoteWriteSink}
import graft.sources.RemoteRead.{Matcher, ReadQuery}

/** The PULL half of the bulk wire contract: `ReadRequest` bytes decode
  * to queries (hand-assembled foreign bytes AND encoder round-trips),
  * matcher semantics follow upstream (anchored regex, missing-label
  * rule, inclusive bounds), `/api/v1/read` serves snappy-framed
  * `ReadResponse` frames over real HTTP, and a SECOND engine can
  * backfill itself FROM a remote-read answer — read ∘ write, the full
  * round trip a federating deployment runs.
  */
class RemoteReadSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dir = fixture("events" -> Seq(
    ev(0, 0L, "purchase", 1.5, "eu"),
    ev(1, 60000L, "purchase", 2.25, "eu"),
    ev(2, 1000L, "purchase", 4.0, "us"),
    ev(3, 2000L, "signup", 10.0, "eu"),
    ev(4, 3000L, "error", 0.25, "eu"),
    ev(5, 4000L, "error", 0.75, "eu")
  ).toDF(eventCols: _*))

  private val T0ms = 1704067200000L // 2024-01-01, the fixture's epoch
  private val all = ReadQuery(0L, 4102444800000L,
    Seq(Matcher(2, "__name__", ".+")))

  test("encodeRequest round-trips walkRequest across all matcher types") {
    val qs = Seq(
      ReadQuery(T0ms, T0ms + 60000L, Seq(
        Matcher(0, "__name__", "purchase_total"),
        Matcher(2, "k", "e.*"))),
      ReadQuery(0L, 1L, Seq(
        Matcher(1, "instance", "i0"),
        Matcher(3, "k", "us|zz"))))
    assert(RemoteRead.walkRequest(RemoteRead.encodeRequest(qs)) === qs)
    // response framing round-trips through the shared TimeSeries codec
    val frames = Seq(
      Seq(RemoteWrite.Series(Vector("__name__" -> "purchase_total",
        "k" -> "eu"), Vector((1.5, T0ms), (2.25, T0ms + 60000L)))),
      Seq.empty[RemoteWrite.Series])
    assert(RemoteRead.walkResponse(RemoteRead.encodeResponse(frames))
      === frames)
  }

  test("the hand-assembled gate request decodes to the hand-derived queries") {
    val qs = RemoteRead.walkRequest(RemoteRead.GateRequest)
    assert(qs === Seq(
      ReadQuery(1704067200000L, 1705276800000L, Seq(
        Matcher(0, "__name__", "purchase_total"),
        Matcher(2, "k", "1.*"))),
      ReadQuery(1704067200000L, 1706745600000L, Seq(
        Matcher(0, "__name__", "signup"),
        Matcher(1, "instance", "i0"))))) // ReadHints + response types skipped
  }

  test("matcher semantics: anchored regex, NEQ/NRE, missing-label rule, inclusive bounds") {
    def names(q: ReadQuery): Seq[(String, Double, Long)] =
      RemoteRead.seriesFor(spark, dir, q).flatMap(s =>
        s.samples.map { case (v, t) =>
          (s.labels.toMap.apply("__name__"), v, t) })
    // anchored: "e.*" must not substring-match "purchase"'s k="eu" name
    assert(names(ReadQuery(0L, Long.MaxValue >> 10,
      Seq(Matcher(2, "__name__", "e.*")))).map(_._1).distinct === Seq("error"))
    // NEQ on k
    assert(names(ReadQuery(0L, Long.MaxValue >> 10, Seq(
      Matcher(0, "__name__", "purchase_total"), Matcher(1, "k", "eu"))))
      === Seq(("purchase_total", 4.0, T0ms + 1000L)))
    // a label this engine never carries matches as "" (upstream rule)
    assert(names(ReadQuery(0L, Long.MaxValue >> 10, Seq(
      Matcher(0, "job", "")))).size === 6)
    assert(names(ReadQuery(0L, Long.MaxValue >> 10, Seq(
      Matcher(1, "job", "")))).isEmpty)
    // inclusive time bounds, both edges
    assert(names(ReadQuery(T0ms, T0ms + 1000L, Seq(
      Matcher(2, "__name__", "purchase.*")))).map(_._3).sorted
      === Seq(T0ms, T0ms + 1000L))
    // series labels come name-sorted; samples in time order
    val s = RemoteRead.seriesFor(spark, dir, ReadQuery(0L,
      Long.MaxValue >> 10, Seq(Matcher(0, "k", "eu"),
        Matcher(0, "__name__", "purchase_total")))).head
    assert(s.labels.map(_._1) === Vector("__name__", "instance", "k"))
    assert(s.samples === Vector((1.5, T0ms), (2.25, T0ms + 60000L)))
  }

  test("HTTP: /api/v1/read serves frames; malformed body 400; GET 405") {
    val server = QueryEndpoint.start(spark, dir)
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/read"
    try {
      val got = RemoteRead.fetch(url, ReadQuery(0L, Long.MaxValue >> 10,
        Seq(Matcher(0, "__name__", "signup"))))
      assert(got === Seq(RemoteWrite.Series(
        Vector("__name__" -> "signup", "instance" -> "i1", "k" -> "eu"),
        Vector((10.0, T0ms + 2000L)))))
      def post(body: Array[Byte]): Int = {
        val conn = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        try {
          val os = conn.getOutputStream
          try os.write(body) finally os.close()
          conn.getResponseCode
        } finally conn.disconnect()
      }
      assert(post("not snappy".getBytes) === 400)
      assert(post(RemoteWrite.compress(Array[Byte](0x0A, 0x7F))) === 400)
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try assert(conn.getResponseCode === 405) finally conn.disconnect()
    } finally server.stop(0)
  }

  test("read ∘ write: a second engine backfills itself FROM a remote-read answer") {
    val serverA = QueryEndpoint.start(spark, dir)
    val urlA = s"http://127.0.0.1:${serverA.getAddress.getPort}/api/v1/read"
    val sinkB = new RemoteWriteSink(spark)
    try {
      // pull EVERYTHING out of A over the read wire...
      val pulled = RemoteRead.fetch(urlA, all)
      assert(pulled.map(_.samples.size).sum === 6)
      // ...and push it into B over the write wire vocabulary
      sinkB.receiveSeries(pulled)
      val q = sinkB.events.writeStream.format("memory")
        .queryName("rr_roundtrip").outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("rr_roundtrip")
          .select($"event_type", $"value",
            org.apache.spark.sql.functions.unix_millis($"ts"))
          .as[(String, Double, Long)].collect().toSeq.sorted
        val want = graft.operators.Metrics.metricEvents(spark, dir)
          .select($"name", $"value",
            org.apache.spark.sql.functions.unix_millis($"ts"))
          .as[(String, Double, Long)].collect().toSeq.sorted
        assert(got === want,
          "B's ingested history ≡ A's corpus, original timestamps kept")
      } finally q.stop()
    } finally serverA.stop(0)
  }

  test("tombstones apply to remote read: deleted samples never leave the TSDB") {
    try {
      graft.promql.Admin.deleteSeries(spark, dir,
        Seq("""purchase{k="eu"}"""))
      val got = RemoteRead.seriesFor(spark, dir, ReadQuery(0L,
        Long.MaxValue >> 10, Seq(Matcher(0, "__name__", "purchase_total"))))
      assert(got.map(_.labels.toMap.apply("k")) === Seq("us"))
    } finally graft.promql.Admin.reset(spark, dir)
  }

  test("STREAMED_XOR_CHUNKS: negotiation, frames, chunk budget, query_index, CRC") {
    // negotiation: first REQUESTED supported type wins; empty = SAMPLES;
    // only-unknown types are the caller's 400
    assert(RemoteRead.negotiate(Seq(1L, 0L)) === 1L)
    assert(RemoteRead.negotiate(Seq(0L, 1L)) === 0L)
    assert(RemoteRead.negotiate(Nil) === 0L)
    assert(RemoteRead.negotiate(Seq(7L, 1L)) === 1L)
    intercept[IllegalArgumentException](RemoteRead.negotiate(Seq(7L)))
    // the packed field parses from our encoder and from the gate bytes
    assert(RemoteRead.acceptedTypes(
      RemoteRead.encodeRequest(Seq(all), Seq(1L, 0L))) === Seq(1L, 0L))
    assert(RemoteRead.acceptedTypes(RemoteRead.GateRequest) === Seq(0L))
    // a streamed answer decodes to EXACTLY the SAMPLES answer's series
    val samples = RemoteRead.seriesFor(spark, dir, all)
    assert(samples.nonEmpty)
    val frames = RemoteRead.encodeStreamed(Seq(samples))
    val decoded = RemoteRead.walkStreamed(frames)
    assert(decoded.forall(_._1 === 0L))
    assert(decoded.map(_._2) === samples)
    // the chunk budget splits long series; decode re-joins seamlessly
    val long = RemoteWrite.Series(Vector("__name__" -> "m_total"),
      (0 until 300).map(i => (i * 0.5, i.toLong * 1000L)).toVector)
    assert(RemoteRead.walkStreamed(RemoteRead.encodeStreamed(
      Seq(Seq(long)), samplesPerChunk = 120)) === Seq((0L, long)))
    // query_index names which request query a frame answers
    val two = RemoteRead.walkStreamed(
      RemoteRead.encodeStreamed(Seq(samples, samples.take(1))))
    assert(two.map(_._1).distinct === Seq(0L, 1L))
    // a flipped payload byte fails the frame CRC
    val corrupt = frames.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](
      RemoteRead.walkStreamed(corrupt))
    assert(e.getMessage.contains("checksum"))
  }

  test("crafted lengths fail loud: negative-after-truncation and past-limit varints") {
    // field 3 / wire 2 with length varint 0xFFFFFFFA (= -6 as an Int):
    // an unchecked skip would REWIND pos and spin the single-threaded
    // server forever — every walker must 400 instead
    val evil = RemoteWrite.hexBytes("1AFAFFFFFF0F")
    intercept[IllegalArgumentException](RemoteRead.walkRequest(evil))
    intercept[IllegalArgumentException](RemoteRead.acceptedTypes(evil))
    intercept[IllegalArgumentException](RemoteRead.walkResponse(evil))
    // a length past the limit must not bleed across message boundaries
    val overrun = RemoteRead.encodeRequest(Seq(all)).clone()
    // first query's declared length points past the body
    overrun(1) = 0x7E.toByte
    intercept[IllegalArgumentException](RemoteRead.walkRequest(overrun))
    // streamed frames: corrupt a ChunkedSeries length inside a valid
    // CRC'd frame — re-frame the tampered data so only the inner
    // length is wrong
    val s = RemoteRead.seriesFor(spark, dir, all).head
    val frames = RemoteRead.encodeStreamed(Seq(Seq(s)))
    var p = 0
    while ((frames(p) & 0x80) != 0) p += 1 // skip the frame-len varint
    val data = java.util.Arrays.copyOfRange(frames, p + 5, frames.length)
    data(1) = 0x7F.toByte // ChunkedSeries length past the frame
    val crc = new java.util.zip.CRC32C()
    crc.update(data, 0, data.length)
    val reframed = new java.io.ByteArrayOutputStream()
    reframed.write(data.length) // < 128, one varint byte
    val c = crc.getValue
    reframed.write(((c >> 24) & 0xFF).toInt); reframed.write(((c >> 16) & 0xFF).toInt)
    reframed.write(((c >> 8) & 0xFF).toInt); reframed.write((c & 0xFF).toInt)
    reframed.write(data, 0, data.length)
    val e = intercept[IllegalArgumentException](
      RemoteRead.walkStreamed(reframed.toByteArray))
    assert(e.getMessage.contains("invalid length") ||
      e.getMessage.contains("truncated"))
    // ...and over HTTP the door answers 400, the server stays alive
    val server = QueryEndpoint.start(spark, dir)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/read"
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(RemoteWrite.compress(evil)) finally os.close()
      assert(conn.getResponseCode === 400)
      conn.disconnect()
      assert(RemoteRead.fetch(url, all).nonEmpty, "server must still serve")
    } finally server.stop(0)
  }

  // frames on the wire: uvarint(len) ++ 4-byte CRC ++ data
  private def frameCount(bytes: Array[Byte]): Int = {
    var pos = 0
    var n = 0
    while (pos < bytes.length) {
      var len = 0L
      var shift = 0
      while ((bytes(pos) & 0x80) != 0) {
        len |= (bytes(pos) & 0x7FL) << shift; shift += 7; pos += 1
      }
      len |= (bytes(pos) & 0x7FL) << shift
      pos += 1 + 4 + len.toInt
      n += 1
    }
    n
  }

  test("streamed face is incremental + batched: door bytes ≡ in-memory encoder, small series coalesce, a tiny budget splits, fragments re-join") {
    val req = RemoteWrite.compress(RemoteRead.encodeRequest(Seq(all), Seq(1L)))
    // the door's bounded-memory path (toLocalIterator over the ordered
    // relation) produces byte-identical frames to the in-memory encoder
    val ans = RemoteRead.serveNegotiated(spark, dir, req)
    assert(ans.streamed)
    val ref = RemoteRead.encodeStreamed(
      Seq(RemoteRead.seriesFor(spark, dir, all)))
    assert(ans.body.toSeq === ref.toSeq,
      "iterator-driven door bytes ≡ in-memory encoder")
    // multi-series BATCHING: all four small series coalesce into ONE
    // ~1 MiB-budget frame (upstream's ChunkedWriter behavior)
    assert(frameCount(ans.body) === 1)
    assert(RemoteRead.walkStreamed(ans.body).size === 4)
    // a tiny frame budget cuts the same selection into MANY frames —
    // the selection streams frame-by-frame — and decodes identically
    val p = RemoteRead.prepareRead(spark, dir, req, frameBytes = 32)
    val bos = new java.io.ByteArrayOutputStream()
    p.writeTo(bos)
    val tiny = bos.toByteArray
    assert(frameCount(tiny) > 1, "multi-series selection streams frame-by-frame")
    def flat(bs: Array[Byte]) = RemoteRead.walkStreamed(bs)
      .flatMap { case (q, s) => s.samples.map(x => (q, s.labels, x)) }
    assert(flat(tiny) === flat(ans.body))
    // an over-budget SERIES splits across frames with labels repeated;
    // the fragments re-join losslessly
    val long = RemoteWrite.Series(Vector("__name__" -> "m_total"),
      (0 until 300).map(i => (i * 0.5, i.toLong * 1000L)).toVector)
    val split = RemoteRead.encodeStreamed(Seq(Seq(long)),
      samplesPerChunk = 10, frameBytes = 64)
    assert(frameCount(split) > 1)
    val parts = RemoteRead.walkStreamed(split)
    assert(parts.size > 1 && parts.forall(_._2.labels == long.labels))
    assert(parts.flatMap(_._2.samples).toVector === long.samples)
  }

  test("response budget: over-limit selections answer 413 BEFORE any byte leaves; the server stays alive") {
    // the 6-sample corpus against a 5-sample budget: a clean refusal,
    // never a truncated stream or an OOMing collect
    intercept[RemoteRead.LimitExceeded](RemoteRead.prepareRead(spark, dir,
      RemoteWrite.compress(RemoteRead.encodeRequest(Seq(all))),
      sampleLimit = 5))
    val server = QueryEndpoint.start(spark, dir, readSampleLimit = 5)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/read"
      def post(accepted: Seq[Long], q: ReadQuery = all): Int = {
        val conn = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        try {
          val os = conn.getOutputStream
          try os.write(RemoteWrite.compress(
            RemoteRead.encodeRequest(Seq(q), accepted)))
          finally os.close()
          conn.getResponseCode
        } finally conn.disconnect()
      }
      assert(post(Seq(0L)) === 413, "SAMPLES face refuses over budget")
      assert(post(Seq(1L)) === 413, "streamed face refuses over budget")
      // a narrow selection under the budget still serves on both faces
      val narrow = ReadQuery(0L, Long.MaxValue >> 10,
        Seq(Matcher(0, "__name__", "signup")))
      assert(RemoteRead.fetch(url, narrow).nonEmpty)
      assert(RemoteRead.fetch(url, narrow, streamed = true).nonEmpty)
    } finally server.stop(0)
  }

  test("HTTP: a downstream store pulls LIVE native-histogram families over the read door, both faces") {
    // a server configured with native-histogram sources (the decoded
    // shapes pushed payloads produce): one integer family on two
    // series, one FLOAT family — the verdict scenario: a Thanos-style
    // reader pulls them as chunks (streamed) or prompb histograms
    // (SAMPLES), alongside the corpus float series
    val h1 = RemoteWrite.Hist(1000L, 3, Vector(0, 3), Vector(2, 2),
      Vector(3L, -1L, 2L, 0L), 13L, 7.5, 2L)
    val h2 = RemoteWrite.Hist(61000L, 3, Vector(0, 3), Vector(2, 2),
      Vector(5L, -2L, 3L, -1L), 21L, 12.25, 3L)
    val h3 = RemoteWrite.Hist(2000L, 2, Vector(-2), Vector(1), Vector(7L),
      9L, -1.5, 1L, Vector(1), Vector(2), Vector(2L, 1L))
    val f1 = RemoteWrite.FHist(3000L, 3, Vector(1), Vector(2),
      Vector(4.5, 3.5), 10.0, 6.5, 2.0)
    val histDf = Seq(
      (Map("__name__" -> "req_ms", "k" -> "a"), h1.tsMs, h1.schema,
        h1.count, h1.sum, h1.zeroCount, h1.offs, h1.lens, h1.deltas,
        h1.negOffs, h1.negLens, h1.negDeltas),
      (Map("__name__" -> "req_ms", "k" -> "a"), h2.tsMs, h2.schema,
        h2.count, h2.sum, h2.zeroCount, h2.offs, h2.lens, h2.deltas,
        h2.negOffs, h2.negLens, h2.negDeltas),
      (Map("__name__" -> "req_ms", "k" -> "b"), h3.tsMs, h3.schema,
        h3.count, h3.sum, h3.zeroCount, h3.offs, h3.lens, h3.deltas,
        h3.negOffs, h3.negLens, h3.negDeltas))
      .toDF("labels", "ts_ms", "schema", "count", "sum", "zero_count",
        "offs", "lens", "deltas", "neg_offs", "neg_lens", "neg_deltas")
    val fhistDf = Seq(
      (Map("__name__" -> "rate_ms", "k" -> "f"), f1.tsMs, f1.schema,
        f1.count, f1.sum, f1.zeroCount, f1.offs, f1.lens, f1.counts,
        f1.negOffs, f1.negLens, f1.negCounts))
      .toDF("labels", "ts_ms", "schema", "count", "sum", "zero_count",
        "offs", "lens", "deltas", "neg_offs", "neg_lens", "neg_deltas")
    val server = QueryEndpoint.start(spark, dir,
      readHists = Some(histDf), readFHists = Some(fhistDf))
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/read"
      val wantA = Seq(
        RemoteWrite.Series(Vector("__name__" -> "req_ms", "k" -> "a"),
          Vector.empty, hists = Vector(h1, h2)),
        RemoteWrite.Series(Vector("__name__" -> "req_ms", "k" -> "b"),
          Vector.empty, hists = Vector(h3)))
      val q = ReadQuery(0L, Long.MaxValue >> 10,
        Seq(Matcher(0, "__name__", "req_ms")))
      // streamed face: HISTOGRAM chunks, decoded back by the client
      assert(RemoteRead.fetch(url, q, streamed = true) === wantA)
      // SAMPLES face: prompb histograms in the TimeSeries rows
      assert(RemoteRead.fetch(url, q) === wantA)
      // the FLOAT family serves as type-3 chunks / float-form prompb
      val qf = ReadQuery(0L, Long.MaxValue >> 10,
        Seq(Matcher(0, "__name__", "rate_ms")))
      val wantF = Seq(RemoteWrite.Series(
        Vector("__name__" -> "rate_ms", "k" -> "f"), Vector.empty,
        fhists = Vector(f1)))
      assert(RemoteRead.fetch(url, qf, streamed = true) === wantF)
      assert(RemoteRead.fetch(url, qf) === wantF)
      // matchers and time bounds apply to the hist relation: k="a"
      // only; a window ending before h2 drops it
      assert(RemoteRead.fetch(url, ReadQuery(0L, Long.MaxValue >> 10,
        Seq(Matcher(0, "__name__", "req_ms"), Matcher(0, "k", "a"))),
        streamed = true) === wantA.take(1))
      assert(RemoteRead.fetch(url, ReadQuery(0L, 1000L,
        Seq(Matcher(0, "__name__", "req_ms"), Matcher(0, "k", "a"))),
        streamed = true) === Seq(wantA.head.copy(hists = Vector(h1))))
      // a label the families never carry matches "" (upstream rule)
      assert(RemoteRead.fetch(url, ReadQuery(0L, Long.MaxValue >> 10,
        Seq(Matcher(0, "__name__", "req_ms"), Matcher(1, "zone", ""))),
        streamed = true) === Nil)
      // corpus float series still serve alongside, same door
      assert(RemoteRead.fetch(url, all).map(_.samples.size).sum === 6)
    } finally server.stop(0)
    // histogram samples count toward the response budget: a 3-sample
    // limit refuses the 4-sample selection (3 int + 1 float) with 413
    val tight = QueryEndpoint.start(spark, dir, readSampleLimit = 3,
      readHists = Some(histDf), readFHists = Some(fhistDf))
    try {
      val url = s"http://127.0.0.1:${tight.getAddress.getPort}/api/v1/read"
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(RemoteWrite.compress(RemoteRead.encodeRequest(Seq(
        ReadQuery(0L, Long.MaxValue >> 10,
          Seq(Matcher(2, "__name__", "req_ms|rate_ms")))))))
      finally os.close()
      assert(conn.getResponseCode === 413)
      conn.disconnect()
    } finally tight.stop(0)
  }

  test("HTTP: a long-term-storage reader pulls RECORDING-RULE series over the read door") {
    // a server configured with a recording rule serves the rule loop's
    // full sample lattice — upstream's primary remote-read use case
    // (Thanos/Cortex pulling rule outputs). Rule `sum by (k)
    // (purchase)` at a 30s interval over the 60s corpus span → 3
    // instants T−60s/T−30s/T: eu sums 1.5/1.5/3.75 (the second
    // purchase lands at T), us is born after the first instant's bound
    val rule = graft.promql.Rules.RecordingRule(
      "k_sum", "sum by (k) (purchase)", intervalS = 30)
    val server = QueryEndpoint.start(spark, dir, recordingRules = Seq(rule),
      readSampleLimit = 5)
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/read"
    try {
      val q = ReadQuery(0L, 4102444800000L,
        Seq(Matcher(0, "__name__", "k_sum")))
      val expected = Seq(
        RemoteWrite.Series(Vector("__name__" -> "k_sum", "k" -> "eu"),
          Vector((1.5, T0ms), (1.5, T0ms + 30000L), (3.75, T0ms + 60000L))),
        RemoteWrite.Series(Vector("__name__" -> "k_sum", "k" -> "us"),
          Vector((4.0, T0ms + 30000L), (4.0, T0ms + 60000L))))
      // both faces serve the identical series (streamed = XOR chunks)
      assert(RemoteRead.fetch(url, q) === expected)
      assert(RemoteRead.fetch(url, q, streamed = true) === expected)
      // matchers and time bounds select within the rule series
      assert(RemoteRead.fetch(url, q.copy(matchers =
        q.matchers :+ Matcher(0, "k", "us")), streamed = true) ===
        expected.tail)
      assert(RemoteRead.fetch(url, q.copy(startMs = T0ms + 30000L)) ===
        Seq(expected.head.copy(samples = expected.head.samples.tail),
          expected(1)))
      // recorded samples count toward the response budget: the full
      // corpus + 5 rule samples overflow the 5-sample limit → 413
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      try {
        val os = conn.getOutputStream
        try os.write(RemoteWrite.compress(
          RemoteRead.encodeRequest(Seq(all))))
        finally os.close()
        assert(conn.getResponseCode === 413,
          "rule samples count toward the budget")
      } finally conn.disconnect()
      // a rule-free server serves the same request with zero rule rows
      // (no recorded source is configured) — the door stays live
      assert(RemoteRead.fetch(url, q.copy(matchers =
        Seq(Matcher(0, "__name__", "signup")))).nonEmpty)
    } finally server.stop(0)
    // one bad rule never takes the door down: the broken expression is
    // skipped (upstream's per-group rule health) while the good rule
    // and the corpus keep serving
    val mixed = QueryEndpoint.start(spark, dir, recordingRules = Seq(rule,
      graft.promql.Rules.RecordingRule("broken", "nosuch_metric",
        intervalS = 30)))
    try {
      val url2 =
        s"http://127.0.0.1:${mixed.getAddress.getPort}/api/v1/read"
      assert(RemoteRead.fetch(url2, ReadQuery(0L, 4102444800000L,
        Seq(Matcher(0, "__name__", "k_sum")))).nonEmpty)
      assert(RemoteRead.fetch(url2, ReadQuery(0L, 4102444800000L,
        Seq(Matcher(0, "__name__", "signup")))).nonEmpty)
    } finally mixed.stop(0)
  }

  test("mixed raw+recorded+histogram responses merge in label order on both faces") {
    // upstream returns a query's series sorted by labels, and strict
    // clients merge-join or binary-search on that order — recorded and
    // native-family series must MERGE with raw floats, not append
    // after them. Names chosen to interleave: aardvark_rule sorts
    // before every raw name, oxide_ms between error and purchase,
    // zebra_rule after signup
    val recordedDf = Seq(
      (Map("__name__" -> "aardvark_rule", "k" -> "eu"), T0ms, 1.0),
      (Map("__name__" -> "zebra_rule"), T0ms, 2.0))
      .toDF("labels", "ts_ms", "value")
    val histDf = Seq(
      (Map("__name__" -> "oxide_ms"), T0ms, 0, Seq(0), Seq(1), Seq(3L),
        3L, 1.0, 0L, Seq.empty[Int], Seq.empty[Int], Seq.empty[Long]))
      .toDF("labels", "ts_ms", "schema", "offs", "lens", "deltas", "count",
        "sum", "zero_count", "neg_offs", "neg_lens", "neg_deltas")
    def labelsOf(types: Seq[Long]): Seq[Vector[(String, String)]] = {
      val body = RemoteWrite.compress(
        RemoteRead.encodeRequest(Seq(all), types))
      val p = RemoteRead.prepareRead(spark, dir, body,
        hists = Some(histDf), recorded = Some(recordedDf))
      val bos = new java.io.ByteArrayOutputStream()
      p.writeTo(bos)
      if (types.head == 1L)
        RemoteRead.walkStreamed(bos.toByteArray).map(_._2.labels)
          .foldLeft(Vector.empty[Vector[(String, String)]]) { (acc, l) =>
            if (acc.nonEmpty && acc.last == l) acc else acc :+ l
          }
      else
        RemoteRead.walkResponse(RemoteWrite.uncompress(bos.toByteArray))
          .head.map(_.labels)
    }
    val streamed = labelsOf(Seq(1L))
    val viaSamples = labelsOf(Seq(0L))
    // both faces list the identical series in the identical order
    assert(streamed === viaSamples)
    // the order is globally label-sorted (upstream labels.Compare:
    // name-sorted pairs, lexicographic, shorter label set first)
    val keys = streamed.map(
      _.map { case (n, v) => n + "\u0000" + v }.mkString("\u0000"))
    assert(keys === keys.sorted)
    // and the three sources interleave by name, not append by kind
    assert(streamed.map(_.head._2).distinct === Seq("aardvark_rule",
      "error", "oxide_ms", "purchase_total", "signup", "zebra_rule"))
  }

  test("gauge-marked histogram sources serve hint-3 chunks; declared resets cut") {
    // a histogram source MAY carry the prompb reset_hint column —
    // without it, a gauge family's decreasing walk would be reset-cut
    // into bogus 'counter reset' chunks on the serving path
    val rows = Seq(
      (Map("__name__" -> "g_hist"), 1000L, 0, Seq(0), Seq(1), Seq(10L),
        10L, 1.0, 0L, Seq.empty[Int], Seq.empty[Int], Seq.empty[Long], 3),
      (Map("__name__" -> "g_hist"), 2000L, 0, Seq(0), Seq(1), Seq(4L),
        4L, 0.5, 0L, Seq.empty[Int], Seq.empty[Int], Seq.empty[Long], 3),
      (Map("__name__" -> "g_hist"), 3000L, 0, Seq(0), Seq(1), Seq(8L),
        8L, 0.8, 0L, Seq.empty[Int], Seq.empty[Int], Seq.empty[Long], 3))
      .toDF("labels", "ts_ms", "schema", "offs", "lens", "deltas", "count",
        "sum", "zero_count", "neg_offs", "neg_lens", "neg_deltas",
        "reset_hint")
    val q = ReadQuery(0L, Long.MaxValue >> 10,
      Seq(Matcher(0, "__name__", "g_hist")))
    val req = RemoteWrite.compress(RemoteRead.encodeRequest(Seq(q), Seq(1L)))
    def bytesWith(src: org.apache.spark.sql.DataFrame): Array[Byte] = {
      val p = RemoteRead.prepareRead(spark, dir, req, hists = Some(src))
      val bos = new java.io.ByteArrayOutputStream()
      p.writeTo(bos)
      bos.toByteArray
    }
    // the gauge-marked relation: ONE hint-3 chunk despite 10 → 4 → 8
    val gb = bytesWith(rows)
    assert(ChunkWalk.chunkHints(gb).filter(_._1 == 2L) === Seq((2L, 3)))
    assert(RemoteRead.walkStreamed(gb).flatMap(_._2.hists)
      .map(h => (h.tsMs, h.count)) === Seq((1000L, 10L), (2000L, 4L),
      (3000L, 8L)))
    // WITHOUT the column the same rows read as an unknown counter: the
    // 10 → 4 drop reset-cuts (wire header bits 0b00 then 0b10 —
    // upstream's CounterReset is 2 on the wire), samples unchanged
    val cb = bytesWith(rows.drop("reset_hint"))
    assert(ChunkWalk.chunkHints(cb).filter(_._1 == 2L)
      === Seq((2L, 0), (2L, 2)))
    // an explicitly DECLARED reset (prompb hint YES) cuts even when no
    // drop is detectable — a counter that reset and already grew past
    // its pre-reset totals (100 → reset → 150)
    import graft.sources.RemoteWrite.Hist
    val bos = new java.io.ByteArrayOutputStream()
    val w = new RemoteRead.ChunkFrameWriter(bos, 120, 1 << 20)
    w.startSeries(Vector("__name__" -> "c"), 0L)
    w.addHist(Hist(1L, 0, Vector(0), Vector(1), Vector(100L), 100L, 1.0, 0L))
    w.addHist(Hist(2L, 0, Vector(0), Vector(1), Vector(150L), 150L, 1.5, 0L,
      resetHint = 1))
    w.endSeries()
    w.finish()
    assert(ChunkWalk.chunkHints(bos.toByteArray) === Seq((2L, 0), (2L, 2)))
  }

  test("the SAMPLES face refuses on projected BYTES; the streamed face is exempt") {
    // a wide-histogram selection can sit far under the 5e7-sample
    // count while projecting gigabytes of driver rows on the SAMPLES
    // face — the byte budget (samples x width per kind) refuses it
    // with 413 BEFORE materialization, while the streamed face serves
    // the same selection with bounded memory
    val wide = Seq((Map("__name__" -> "w_hist"), 1000L, 0,
      Seq(0), Seq(500), (1L to 500L).map(_ => 1L), 500L, 1.0, 0L,
      Seq.empty[Int], Seq.empty[Int], Seq.empty[Long]))
      .toDF("labels", "ts_ms", "schema", "offs", "lens", "deltas",
        "count", "sum", "zero_count", "neg_offs", "neg_lens",
        "neg_deltas")
    val q = ReadQuery(0L, Long.MaxValue >> 10,
      Seq(Matcher(0, "__name__", "w_hist")))
    def prepared(types: Seq[Long]) = RemoteRead.prepareRead(spark, dir,
      RemoteWrite.compress(RemoteRead.encodeRequest(Seq(q), types)),
      hists = Some(wide),
      // 1 sample x (32 + 3*500) = 1532 projected bytes > 1000;
      // the sample limit stays far away
      sampleBytesLimit = 1000L)
    val e = intercept[RemoteRead.LimitExceeded](prepared(Seq(0L)))
    assert(e.getMessage.contains("SAMPLES face") &&
      e.getMessage.contains("STREAMED_XOR_CHUNKS"))
    // the streamed face serves the identical selection and budget
    val bos = new java.io.ByteArrayOutputStream()
    prepared(Seq(1L)).writeTo(bos)
    assert(RemoteRead.walkStreamed(bos.toByteArray).flatMap(_._2.hists)
      .map(_.count) === Seq(500L))
  }

  test("a gauge family through the GENERATOR never reset-cuts on the door") {
    // the r15 bound closed: prom_rw_decode_hist now carries reset_hint
    // relationally, so a gauge-type family pushed over the wire keeps
    // its hint through the relational tier and serves as ONE hint-3
    // chunk despite decreasing counts — no bogus 'counter reset' cuts
    import graft.sources.RemoteWrite.Hist
    def h(ts: Long, c: Long) = Hist(ts, 0, Vector(0), Vector(1),
      Vector(c), c, c * 0.5, 0L, resetHint = 3)
    val payload = RemoteWrite.encode(Seq(RemoteWrite.Series(
      Vector("__name__" -> "g_wire"), Vector.empty,
      hists = Vector(h(1000L, 10L), h(2000L, 4L), h(3000L, 8L)))))
    val payloads = Seq(payload).toDF("proto")
      .withColumn("recv_ts", org.apache.spark.sql.functions.lit(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val src = RemoteWrite.decodeHist(payloads)
    // the generator's relation carries the hint column
    assert(src.columns.contains("reset_hint"))
    assert(src.select("reset_hint").as[Int].collect().toSeq === Seq(3, 3, 3))
    val q = ReadQuery(0L, Long.MaxValue >> 10,
      Seq(Matcher(0, "__name__", "g_wire")))
    val req = RemoteWrite.compress(RemoteRead.encodeRequest(Seq(q), Seq(1L)))
    val p = RemoteRead.prepareRead(spark, dir, req, hists = Some(src))
    val bos = new java.io.ByteArrayOutputStream()
    p.writeTo(bos)
    assert(ChunkWalk.chunkHints(bos.toByteArray).filter(_._1 == 2L)
      === Seq((2L, 3)))
    assert(RemoteRead.walkStreamed(bos.toByteArray).flatMap(_._2.hists)
      .map(x => (x.tsMs, x.count)) === Seq((1000L, 10L), (2000L, 4L),
      (3000L, 8L)))
  }

  test("HTTP: a streamed-first client reads the same series as a SAMPLES client") {
    val server = QueryEndpoint.start(spark, dir)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/read"
      val viaSamples = RemoteRead.fetch(url, all)
      val viaStreamed = RemoteRead.fetch(url, all, streamed = true)
      assert(viaSamples.nonEmpty)
      assert(viaStreamed === viaSamples)
    } finally server.stop(0)
  }
}
