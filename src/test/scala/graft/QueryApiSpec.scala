package graft

import java.net.{HttpURLConnection, URL, URLEncoder}

import graft.promql.Api
import graft.sources.QueryEndpoint

/** The HTTP query API contract: every endpoint returns BYTE-IDENTICAL
  * payloads to its in-process [[Api]] twin (the server adds transport,
  * never semantics), errors surface as Prometheus's error envelope with
  * HTTP 400, and unknown paths 404.
  */
class QueryApiSpec extends SparkTestBase {
  import spark.implicits._

  private val D = 86400000L

  private lazy val dir: String = fixture("events" -> Seq(
    ev(0, 0, "purchase", 1.0, "a"),
    ev(1, 1 * D, "purchase", 2.0, "a"),
    ev(2, 2 * D, "purchase", 4.0, "b"),
    ev(3, 3 * D, "purchase", 2.5, "a"),
    ev(4, 0, "signup", 10.0, "a"),
    ev(5, 2 * D, "signup", 12.5, "b")
  ).toDF(eventCols: _*))

  private val T0 = 1704067200L
  private val dayS = 86400L

  private def get(port: Int, pathAndQuery: String): (Int, String) = {
    val conn = new URL(s"http://127.0.0.1:$port$pathAndQuery")
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      (code, new String(is.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    } finally conn.disconnect()
  }

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  test("query API endpoints serve the Api twins byte-for-byte") {
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      val q = "sum by (k) (purchase)"
      assert(get(port, s"/api/v1/query?query=${enc(q)}") ===
        ((200, Api.queryJson(spark, dir, q))))

      val (start, end, step) = (T0 + 1 * dayS, T0 + 3 * dayS, dayS)
      assert(get(port, s"/api/v1/query_range?query=${enc(q)}" +
        s"&start=$start&end=$end&step=$step") ===
        ((200, Api.queryRangeJson(spark, dir, q, start, end, step))))
      // step as a PromQL duration literal ("1d") parses to the same grid
      assert(get(port, s"/api/v1/query_range?query=${enc(q)}" +
        s"&start=$start&end=$end&step=1d") ===
        ((200, Api.queryRangeJson(spark, dir, q, start, end, step))))

      assert(get(port, s"/api/v1/series?${enc("match[]")}=${enc("purchase")}") ===
        ((200, Api.seriesJson(spark, dir, Seq("purchase")))))
      assert(get(port, "/api/v1/labels") ===
        ((200, Api.labelsJson(spark, dir))))
      assert(get(port, "/api/v1/label/k/values") ===
        ((200, Api.labelValuesJson(spark, dir, "k"))))
    } finally server.stop(0)
  }

  private def postForm(port: Int, path: String, body: String): (Int, String) = {
    val conn = new URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    try {
      val os = conn.getOutputStream
      try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      (code, new String(is.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    } finally conn.disconnect()
  }

  test("POST form bodies: the Grafana default for long queries, upstream's parsing rules") {
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      val q = "sum by (k) (purchase)"
      // query + query_range accept form-encoded POST, byte-identical to GET
      assert(postForm(port, "/api/v1/query", s"query=${enc(q)}") ===
        ((200, Api.queryJson(spark, dir, q))))
      val (start, end, step) = (T0 + 1 * dayS, T0 + 3 * dayS, dayS)
      assert(postForm(port, "/api/v1/query_range",
        s"query=${enc(q)}&start=$start&end=$end&step=$step") ===
        ((200, Api.queryRangeJson(spark, dir, q, start, end, step))))
      // body parameters take precedence over URL query ones (Go's
      // Request.FormValue rule, which upstream rides on)
      assert(postForm(port, s"/api/v1/query?query=${enc("signup")}",
        s"query=${enc(q)}") === ((200, Api.queryJson(spark, dir, q))))
      // repeated match[] unions across URL and body (/api/v1/series)
      assert(postForm(port, s"/api/v1/series?${enc("match[]")}=${enc("purchase")}",
        s"${enc("match[]")}=${enc("signup")}") ===
        ((200, Api.seriesJson(spark, dir, Seq("purchase", "signup")))))
      // a missing required key still errors in the envelope
      val (code, body) = postForm(port, "/api/v1/query", "time=123")
      assert(code === 400 && body.contains("missing required parameter"))
    } finally server.stop(0)
  }

  test("limit= truncates series/labels/label-values with upstream's warning") {
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      // the fixture has 2 distinct purchase series; limit=1 truncates
      val (c1, b1) = get(port,
        s"/api/v1/series?${enc("match[]")}=${enc("purchase")}&limit=1")
      assert(c1 === 200)
      assert(b1.contains("\"warnings\":[\"results truncated due to limit\"]"))
      assert(b1.sliding("__name__".length).count(_ == "__name__") === 1)
      // a limit >= the result size adds no warning and drops nothing
      assert(get(port,
        s"/api/v1/series?${enc("match[]")}=${enc("purchase")}&limit=99") ===
        ((200, Api.seriesJson(spark, dir, Seq("purchase")))))
      // limit=0 disables (upstream), negatives 400
      assert(get(port, "/api/v1/labels?limit=0") ===
        ((200, Api.labelsJson(spark, dir))))
      val (c2, b2) = get(port, "/api/v1/label/k/values?limit=1")
      assert(c2 === 200 && b2.contains("truncated") &&
        b2.contains("\"data\":[\"a\"]"))
      assert(get(port, "/api/v1/labels?limit=-1")._1 === 400)
    } finally server.stop(0)
  }

  test("RFC3339 timestamps and gzip content negotiation") {
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      val q = "sum by (k) (purchase)"
      val (start, end, step) = (T0 + 1 * dayS, T0 + 3 * dayS, dayS)
      val want = Api.queryRangeJson(spark, dir, q, start, end, step)
      // upstream accepts RFC3339 wherever it accepts unix seconds
      assert(get(port, s"/api/v1/query_range?query=${enc(q)}" +
        s"&start=${enc("2024-01-02T00:00:00Z")}" +
        s"&end=${enc("2024-01-04T00:00:00+00:00")}&step=1d") === ((200, want)))
      assert(get(port, s"/api/v1/query?query=${enc(q)}" +
        s"&time=${enc("2024-01-03T00:00:00Z")}") ===
        ((200, Api.queryJson(spark, dir, q, timeS = Some(T0 + 2 * dayS)))))
      // Accept-Encoding: gzip → the identical bytes, gzip-framed
      val conn = new URL(s"http://127.0.0.1:$port/api/v1/query?query=${enc(q)}")
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestProperty("Accept-Encoding", "gzip")
      try {
        assert(conn.getResponseCode === 200)
        assert(conn.getHeaderField("Content-Encoding") === "gzip")
        val gz = new java.util.zip.GZIPInputStream(conn.getInputStream)
        val body = new String(gz.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        assert(body === Api.queryJson(spark, dir, q))
      } finally conn.disconnect()
      // gzip;q=0 is an explicit REFUSAL (RFC 7231): identity bytes
      val c2 = new URL(s"http://127.0.0.1:$port/api/v1/query?query=${enc(q)}")
        .openConnection().asInstanceOf[HttpURLConnection]
      c2.setRequestProperty("Accept-Encoding", "gzip;q=0, identity")
      try {
        assert(c2.getResponseCode === 200)
        assert(c2.getHeaderField("Content-Encoding") === null)
        assert(new String(c2.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) ===
          Api.queryJson(spark, dir, q))
      } finally c2.disconnect()
    } finally server.stop(0)
  }

  test("/api/v1/query_range max_source_resolution opts into pyramid serving") {
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      val q = "sum by (k) (purchase)"
      val (start, end, step) = (T0 + 1 * dayS, T0 + 3 * dayS, dayS)
      val base = s"/api/v1/query_range?query=${enc(q)}" +
        s"&start=$start&end=$end&step=$step"
      val raw = get(port, base)
      // the opt-in routes through the pyramid and equals the in-process
      // twin byte-for-byte (duration literal AND seconds forms)
      val routed = get(port, s"$base&max_source_resolution=1d")
      assert(routed === ((200, Api.queryRangeJson(spark, dir, q, start, end,
        step, maxSourceResS = Some(86400L)))))
      assert(get(port, s"$base&max_source_resolution=86400") === routed)
      // convention-exact serving: this fixture's samples sit exactly
      // on day epochs — the boundary case that diverged before rollup
      // buckets went closed-right. Routed bytes ≡ raw bytes.
      assert(raw._2.contains(s"""[$start,"3.0"]"""))
      assert(routed._2 === raw._2,
        "pyramid-served bytes equal raw serving, boundary samples included")
      // 0 / absent = raw serving, unchanged bytes
      assert(get(port, s"$base&max_source_resolution=0") === raw)
      // an unservable cap falls back to the raw paths, same bytes
      assert(get(port, s"$base&max_source_resolution=30m") === raw)
    } finally server.stop(0)
  }

  test("/api/v1/query honors time= via the shifted compile") {
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      val q = "sum by (k) (purchase)"
      val t1 = T0 + 1 * dayS
      // HTTP wiring: the time= parameter reaches the in-process twin
      val (code, body) = get(port, s"/api/v1/query?query=${enc(q)}&time=$t1")
      assert(code === 200)
      assert(body === Api.queryJson(spark, dir, q, timeS = Some(t1)))
      // the envelope renders the REQUESTED instant, not the corpus T
      assert(body.contains(s""""value":[$t1,"""))
      // semantics: at T0+1d only series a has samples (1.0 + 2.0); b's
      // first sample is a day later and must NOT appear
      assert(body.contains(""""k":"a""""))
      assert(body.contains("\"3.0\""))
      assert(!body.contains(""""k":"b""""))
      // bytes-exact against the @-pinned twin: an absolute @ pin makes
      // the shift a no-op, so both compiles must agree byte-for-byte
      assert(body === Api.queryJson(spark, dir,
        s"sum by (k) (purchase @ $t1)", timeS = Some(t1)))
      // a future instant is rejected loudly (the corpus cannot answer
      // it) — never today's answer with a past-looking envelope
      val (c2, b2) = get(port,
        s"/api/v1/query?query=${enc(q)}&time=${T0 + 100 * dayS}")
      assert(c2 === 400 && b2.contains("after the corpus instant"))
    } finally server.stop(0)
  }

  test("/api/v1/series: repeated match[], start/end, all sample kinds") {
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    val m = enc("match[]")
    try {
      // two selectors union (and the HTTP payload equals the twin)
      val (code, body) = get(port,
        s"/api/v1/series?$m=${enc("purchase")}&$m=${enc("signup")}")
      assert(code === 200)
      assert(body === Api.seriesJson(spark, dir, Seq("purchase", "signup")))
      assert(Seq("purchase", "signup").forall(body.contains))
      // overlapping selectors dedup
      assert(get(port, s"/api/v1/series?$m=${enc("purchase")}&$m=${enc("purchase")}")._2
        === Api.seriesJson(spark, dir, Seq("purchase")))
      // start/end bound sample presence: during the first day only
      // series a of purchase has samples
      val (c3, b3) = get(port,
        s"/api/v1/series?$m=${enc("purchase")}&start=$T0&end=${T0 + dayS}")
      assert(c3 === 200)
      assert(b3.contains(""""k":"a"""") && !b3.contains(""""k":"b""""))
      // matcher-filtered selector
      assert(get(port, s"/api/v1/series?$m=${enc("purchase{k=\"b\"}")}")._2
        === Api.seriesJson(spark, dir, Seq("purchase{k=\"b\"}")))
      // no match[] → 400 naming the parameter
      val (c4, b4) = get(port, "/api/v1/series")
      assert(c4 === 400 && b4.contains("match[]"))
      // a non-selector match[] → 400 in the error envelope
      assert(get(port, s"/api/v1/series?$m=${enc("sum(purchase)")}")._1 === 400)
    } finally server.stop(0)
  }

  test("recorded names serve /federate and /api/v1/series like TSDB series") {
    import graft.promql.Rules.RecordingRule
    // upstream's rule loop writes recorded series into the TSDB, so
    // federation and the series-metadata endpoint list them exactly
    // like scraped families — the same view semantics /api/v1/query
    // already serves
    val rules = Seq(
      RecordingRule("k_total_d", "sum by (k) (purchase)", intervalS = dayS))
    val server = QueryEndpoint.start(spark, dir, recordingRules = rules)
    val port = server.getAddress.getPort
    val m = enc("match[]")
    try {
      // federate renders the record under its own __name__ with the
      // rule's by-labels; cumulative sums a=5.50, b=4.00 at T (= day 3)
      val tMs = (T0 + 3 * dayS) * 1000L
      val (cf, bf) = get(port, s"/federate?$m=${enc("k_total_d")}")
      assert(cf === 200)
      assert(bf ===
        s"""k_total_d{k="a"} 5.50 $tMs\nk_total_d{k="b"} 4.00 $tMs\n""")
      // matchers inside the selector apply post-hoc on the rule vector
      assert(get(port, s"/federate?$m=${enc("k_total_d{k=\"b\"}")}")._2 ===
        s"""k_total_d{k="b"} 4.00 $tMs\n""")
      // mixed raw + recorded matches share one payload
      val mixed =
        get(port, s"/federate?$m=${enc("k_total_d")}&$m=${enc("signup")}")._2
      assert(mixed.contains("k_total_d{k=\"a\"}") && mixed.contains("signup{"))
      // /api/v1/series lists rule series identities under __name__
      val (cs, bs) = get(port, s"/api/v1/series?$m=${enc("k_total_d")}")
      assert(cs === 200)
      assert(bs.contains(""""__name__":"k_total_d"""") &&
        bs.contains(""""k":"a"""") && bs.contains(""""k":"b""""))
      // end bounds exclude series born later: b's first purchase lands
      // on day 2, so end = day 1 lists only a
      val bs2 = get(port,
        s"/api/v1/series?$m=${enc("k_total_d")}&end=${T0 + dayS}")._2
      assert(bs2.contains(""""k":"a"""") && !bs2.contains(""""k":"b""""))
      // raw + recorded selectors union in one response
      val both = get(port,
        s"/api/v1/series?$m=${enc("k_total_d")}&$m=${enc("purchase")}")._2
      assert(both.contains("k_total_d") && both.contains("purchase"))
      // record names list as __name__ values (unscoped)
      val (cv, bv) = get(port, "/api/v1/label/__name__/values")
      assert(cv === 200)
      assert(bv.contains(""""k_total_d"""") && bv.contains(""""purchase""""))
      // a scoped request keeps the corpus-presence answer
      assert(!get(port,
        s"/api/v1/label/__name__/values?$m=${enc("purchase")}")._2
        .contains("k_total_d"))
      // a TIME-SCOPED selector-less request still lists record names
      // when the window intersects the rule lattice — rule outputs are
      // ordinary TSDB series upstream, so a start/end bound must not
      // silently drop them (presence is lattice-granular like /series)
      assert(get(port,
        s"/api/v1/label/__name__/values?start=$T0")._2
        .contains("k_total_d"))
      assert(get(port,
        s"/api/v1/label/__name__/values?end=${T0 + dayS}")._2
        .contains("k_total_d"))
      // ...but a window wholly past the corpus instant or wholly
      // before the corpus start holds no rule sample
      assert(!get(port,
        s"/api/v1/label/__name__/values?start=${T0 + 4 * dayS}")._2
        .contains("k_total_d"))
      assert(!get(port,
        s"/api/v1/label/__name__/values?end=${T0 - 1}")._2
        .contains("k_total_d"))
    } finally server.stop(0)
  }

  test("/api/v1/status/tsdb serves the cardinality dashboard's shape") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      val om = new ObjectMapper()
      val root = om.readTree(get(port, "/api/v1/status/tsdb")._2)
      assert(root.get("status").asText === "success")
      val d = root.get("data")
      val hs = d.get("headStats")
      assert(hs.get("numSeries").asLong > 0)
      assert(hs.get("numLabelPairs").asLong > 0)
      assert(hs.get("minTime").asLong <= hs.get("maxTime").asLong)
      assert(hs.get("chunkCount").asLong >= hs.get("numSeries").asLong,
        "every series carries at least one chunk")
      // series-per-metric entries sum to the head series count, and
      // each breakdown lists value-descending (upstream's top-10 order)
      val bm = d.get("seriesCountByMetricName")
      val counts = (0 until bm.size).map(i => bm.get(i).get("value").asLong)
      assert(counts.sum === hs.get("numSeries").asLong)
      assert(counts === counts.sortBy(-_))
      val bp = d.get("seriesCountByLabelValuePair")
      assert(bp.size <= 10)
      val pv = (0 until bp.size).map(i => bp.get(i).get("value").asLong)
      assert(pv === pv.sortBy(-_))
      assert((0 until bp.size).forall(i =>
        bp.get(i).get("name").asText.contains("=")))
    } finally server.stop(0)
  }

  test("/api/v1/rules, alerts, buildinfo, metadata serve Grafana's contract") {
    import com.fasterxml.jackson.databind.ObjectMapper
    import graft.promql.Rules.{AlertRule, RecordingRule}
    // a: breaches now (5.5 > 3) but not a day ago (3.0) → pending;
    // b: breaches at both instants (4.0) → firing
    val rule = AlertRule("High", "sum by (k) (purchase) > 3",
      forS = dayS, intervalS = dayS)
    val server = QueryEndpoint.start(spark, dir, alertRules = Seq(rule),
      recordingRules = Seq(
        RecordingRule("k_totals", "sum by (k) (purchase)"),
        RecordingRule("broken", "nosuch_metric")))
    val port = server.getAddress.getPort
    val om = new ObjectMapper()
    try {
      // Grafana's datasource health check: buildinfo with a version
      val bi = om.readTree(get(port, "/api/v1/status/buildinfo")._2)
      assert(bi.get("status").asText === "success")
      assert(bi.get("data").get("version").asText.nonEmpty)
      // metric autocomplete: every family, right kind, and the
      // reference-faithful EMPTY help (prometheus.cpp registers all
      // families with Help(""))
      val md = om.readTree(get(port, "/api/v1/metadata")._2).get("data")
      assert(md.size === 5)
      assert(md.get("purchase").get(0).get("type").asText === "counter")
      assert(md.get("signup").get(0).get("type").asText === "gauge")
      assert(md.get("error").get(0).get("type").asText === "histogram")
      assert(md.get("purchase").get(0).get("help").asText === "")
      // live alert instances with full labels and the ladder states
      val al = om.readTree(get(port, "/api/v1/alerts")._2)
        .get("data").get("alerts")
      val states = (0 until al.size).map(i =>
        al.get(i).get("labels").get("k").asText ->
          al.get(i).get("state").asText).toMap
      assert(states === Map("a" -> "pending", "b" -> "firing"))
      assert((0 until al.size).forall(i =>
        al.get(i).get("labels").get("alertname").asText === "High"))
      // the rule file: firing>pending>inactive collapse, alert
      // instances attached, recording-rule compose health
      val rules = om.readTree(get(port, "/api/v1/rules")._2)
        .get("data").get("groups").get(0).get("rules")
      val byName = (0 until rules.size).map(i =>
        rules.get(i).get("name").asText -> rules.get(i)).toMap
      assert(byName.keySet === Set("High", "k_totals", "broken"))
      assert(byName("High").get("state").asText === "firing")
      assert(byName("High").get("type").asText === "alerting")
      assert(byName("High").get("duration").asLong === dayS)
      assert(byName("High").get("alerts").size === 2)
      assert(byName("k_totals").get("type").asText === "recording")
      assert(byName("k_totals").get("health").asText === "ok")
      assert(byName("broken").get("health").asText === "err")
      // status/config: the standing rule file as its Prometheus YAML
      val cfg = om.readTree(get(port, "/api/v1/status/config")._2)
        .get("data").get("yaml").asText
      assert(cfg.contains("- alert: High"))
      assert(cfg.contains("expr: sum by (k) (purchase) > 3"))
      assert(cfg.contains("for: 1d") && cfg.contains("interval: 1d"))
      assert(cfg.contains("- record: k_totals"))
      // the ALERTS synthetic series answers /api/v1/query under the
      // server's standing rules (upstream's queryable alert states)
      val aq = om.readTree(get(port, "/api/v1/query?query=" +
        java.net.URLEncoder.encode(
          """ALERTS{alertstate="firing"}""", "UTF-8"))._2)
      assert(aq.get("status").asText === "success")
      val res = aq.get("data").get("result")
      assert(res.size === 1)
      assert(res.get(0).get("metric").get("alertname").asText === "High")
      assert(res.get(0).get("metric").get("alertstate").asText === "firing")
      assert(res.get(0).get("metric").get("k").asText === "b")
      // ... and query_range serves the ALERTS timeline at GRID scale
      // (240 instants — the union path walls at 64), the Grafana
      // alert-timeline panel's request shape
      val tS = graft.promql.Compiler.instantSeconds(spark, dir).toLong
      val ar = om.readTree(get(port, "/api/v1/query_range?query=" +
        java.net.URLEncoder.encode("""ALERTS{alertstate="firing"}""",
          "UTF-8") +
        s"&start=${tS - 239 * 3600L}&end=$tS&step=3600")._2)
      assert(ar.get("status").asText === "success")
      val mres = ar.get("data").get("result")
      assert(mres.size === 1)
      assert(mres.get(0).get("metric").get("alertname").asText === "High")
      assert(mres.get(0).get("metric").get("alertstate").asText === "firing")
      assert(mres.get(0).get("metric").get("k").asText === "b")
      // b crossed the threshold exactly a day before T, so precisely
      // the final hourly instant has both ladder lookbacks breaching —
      // the point here is the 240-instant panel SERVED (the union path
      // refuses past 64; QueryRangeSpec pins the wall-lifting law)
      assert(mres.get(0).get("values").size === 1)
    } finally server.stop(0)
  }

  test("lifecycle: /-/healthy, /-/ready, /-/reload swaps rules with no stale cache") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val f = java.nio.file.Files.createTempFile("graft_rules", ".yml")
    def yaml(threshold: Int): String =
      s"""groups:
         |- name: graft
         |  interval: 1d
         |  rules:
         |  - alert: Hot
         |    expr: sum by (k) (purchase) > $threshold
         |""".stripMargin
    java.nio.file.Files.write(f, yaml(1000).getBytes("UTF-8"))
    // resultsCache ON: the reload MUST invalidate, or the old answer
    // would serve from cache for the identical query string
    val server = QueryEndpoint.start(spark, dir, resultsCache = true,
      ruleFile = Some(f.toString))
    val port = server.getAddress.getPort
    val om = new ObjectMapper()
    try {
      val (hc, hb) = get(port, "/-/healthy")
      assert(hc === 200 && hb.contains("Healthy"))
      val (rc, rb) = get(port, "/-/ready")
      assert(rc === 200 && rb.contains("Ready"))
      // reload is POST-only, like upstream
      assert(get(port, "/-/reload")._1 === 405)
      // under threshold 1000 nothing fires
      val q = "/api/v1/query?query=" + enc("""ALERTS{alertstate="firing"}""")
      assert(om.readTree(get(port, q)._2)
        .path("data").path("result").size === 0)
      assert(om.readTree(get(port, "/api/v1/rules")._2)
        .path("data").path("groups").get(0).path("rules").get(0)
        .path("query").asText.endsWith("> 1000"))
      // swap the file, reload, and the SAME query string answers under
      // the new rules on the very next request
      java.nio.file.Files.write(f, yaml(1).getBytes("UTF-8"))
      assert(postForm(port, "/-/reload", "")._1 === 200)
      val after = om.readTree(get(port, q)._2).path("data").path("result")
      assert(after.size === 2, "both k-groups breach threshold 1")
      assert(om.readTree(get(port, "/api/v1/rules")._2)
        .path("data").path("groups").get(0).path("rules").get(0)
        .path("query").asText.endsWith("> 1"))
      // a syntactically broken file fails the reload with 500 and the
      // OLD rules stay standing (upstream's apply-or-keep semantics)
      java.nio.file.Files.write(f, "groups:\n- name: graft\n  rules:\n  - alert: X\n    for: nonsense\n".getBytes("UTF-8"))
      assert(postForm(port, "/-/reload", "")._1 === 500)
      assert(om.readTree(get(port, q)._2).path("data").path("result")
        .size === 2, "failed reload must keep the previous rules")
    } finally {
      server.stop(0)
      java.nio.file.Files.deleteIfExists(f)
    }
  }

  test("/federate attaches external_labels; series labels win on conflict") {
    val server = QueryEndpoint.start(spark, dir,
      externalLabels = Map("env" -> "prod", "k" -> "ext"))
    val port = server.getAddress.getPort
    try {
      val (code, body) = get(port, "/federate?match[]=" + enc("signup"))
      assert(code === 200)
      val lines = body.trim.split("\n").toSeq
      assert(lines.nonEmpty)
      // env joins alphabetically; the series' own k survives the clash
      assert(lines.forall(_.matches(
        """signup\{env="prod",instance="i\d",k="[ab]"\} .*""")))
      assert(body === Api.federateText(spark, dir, Seq("signup"),
        Map("env" -> "prod", "k" -> "ext")))
      // the config endpoint shows the identity under global:, the
      // grammar RuleConfig reads back
      val yaml = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(get(port, "/api/v1/status/config")._2)
        .path("data").path("yaml").asText
      assert(yaml.contains("external_labels:") &&
        yaml.contains("env: prod"))
      assert(graft.promql.RuleConfig.parseFull(yaml)._3 ===
        Map("env" -> "prod", "k" -> "ext"))
    } finally server.stop(0)
  }

  test("/-/reload swaps external_labels from the config file's global section") {
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".yml")
    def yaml(env: String): String =
      s"global:\n  external_labels:\n    env: $env\ngroups: []\n"
    java.nio.file.Files.write(f, yaml("stage").getBytes("UTF-8"))
    val server = QueryEndpoint.start(spark, dir, ruleFile = Some(f.toString))
    val port = server.getAddress.getPort
    try {
      def fed() = get(port, "/federate?match[]=" + enc("signup"))._2
      assert(fed().contains("""env="stage""""))
      java.nio.file.Files.write(f, yaml("prod").getBytes("UTF-8"))
      assert(postForm(port, "/-/reload", "")._1 === 200)
      assert(fed().contains("""env="prod""""),
        "the very next federation carries the reloaded identity")
    } finally {
      server.stop(0)
      java.nio.file.Files.deleteIfExists(f)
    }
  }

  test("/api/v1/targets reads a file-SD pool at request time") {
    import com.fasterxml.jackson.databind.ObjectMapper
    graft.streaming.ExpositionRegistry.clear()
    graft.streaming.ExpositionRegistry.publish(
      graft.streaming.MetricStream.SeriesTotal("purchase", "a", 1.0, 1))
    val s1 = graft.sources.ScrapeEndpoint.start()
    val p1 = s1.getAddress.getPort
    val sd = java.nio.file.Files.createTempFile("graft_sd_api", ".json")
    java.nio.file.Files.write(sd,
      s"""[{"targets": ["127.0.0.1:$p1"], "labels": {"job": "web"}}]"""
        .getBytes("UTF-8"))
    val pool = new graft.sources.ScrapePool(spark, sd.toString)
    val server = QueryEndpoint.start(spark, dir, scrapePool = Some(pool))
    val port = server.getAddress.getPort
    val om = new ObjectMapper()
    def active(): Seq[(String, String)] = {
      val at = om.readTree(get(port, "/api/v1/targets")._2)
        .path("data").path("activeTargets")
      (0 until at.size).map(i => (at.get(i).path("scrapePool").asText,
        at.get(i).path("health").asText))
    }
    try {
      assert(active() === Nil, "nothing discovered before the first tick")
      pool.poll()
      assert(active() === Seq(("web", "up")),
        "discovery shows on the next listing without a server restart")
      java.nio.file.Files.write(sd, "[]".getBytes("UTF-8"))
      pool.poll()
      assert(active() === Nil, "a removed target leaves the listing")
    } finally {
      server.stop(0); s1.stop(0)
      java.nio.file.Files.deleteIfExists(sd)
    }
  }

  test("/api/v1/labels and label values honor match[] and start/end") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    val om = new ObjectMapper()
    def arr(path: String): Seq[String] = {
      val n = om.readTree(get(port, path)._2).get("data")
      (0 until n.size).map(n.get(_).asText)
    }
    try {
      // unscoped: the full label universe
      assert(arr("/api/v1/labels") === Seq("__name__", "instance", "k"))
      // scoped to a family: series carry all three labels
      assert(arr(s"/api/v1/labels?match[]=${enc("purchase")}") ===
        Seq("__name__", "instance", "k"))
      // scoped to nothing: the empty list, like upstream
      assert(arr(s"/api/v1/labels?match[]=${enc("purchase{k=\"zzz\"}")}")
        === Seq.empty)
      // label values scope by selector…
      assert(arr(s"/api/v1/label/k/values?match[]=${enc("purchase")}") ===
        Seq("a", "b"))
      assert(arr(s"/api/v1/label/k/values?match[]=${enc("signup{k=\"a\"}")}")
        === Seq("a"))
      // …and by sample-presence time bounds: before purchase b's first
      // sample lands, only k="a" has purchase samples
      assert(arr(s"/api/v1/label/k/values?match[]=${enc("purchase")}" +
        s"&end=${T0 + dayS + dayS / 2}") === Seq("a"))
      // repeated match[] unions
      assert(arr(s"/api/v1/label/__name__/values" +
        s"?match[]=${enc("purchase")}&match[]=${enc("signup")}") ===
        Seq("purchase", "signup"))
    } finally server.stop(0)
  }

  test("/api/v1/format_query, status/flags, status/runtimeinfo") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    val om = new ObjectMapper()
    try {
      // the prettifier endpoint: canonical rendering, upstream's shape
      val (c1, b1) = get(port,
        s"/api/v1/format_query?query=${enc("sum  by(k)(rate(purchase[86400s]))")}")
      assert(c1 === 200)
      val f = om.readTree(b1)
      assert(f.get("status").asText === "success")
      assert(f.get("data").asText === "sum by (k) (rate(purchase[1d]))")
      // unparseable query: the usual 400 bad_data
      val (c2, b2) = get(port, s"/api/v1/format_query?query=${enc("sum by (")}")
      assert(c2 === 400 && b2.contains("bad_data"))
      // parse_query: the AST in the upstream vocabulary
      val (c3, b3) = get(port,
        s"/api/v1/parse_query?query=${enc("sum by (k) (purchase)")}")
      assert(c3 === 200)
      val ast = om.readTree(b3).get("data")
      assert(ast.get("type").asText === "aggregation")
      assert(ast.get("expr").get("type").asText === "vectorSelector")
      val (c4, _) = get(port, s"/api/v1/parse_query?query=${enc("rate(")}")
      assert(c4 === 400)
      // flags: the engine's REAL serving knobs
      val fl = om.readTree(get(port, "/api/v1/status/flags")._2).get("data")
      assert(fl.get("promql.max-grid-instants").asText === "4096")
      assert(fl.get("rollup.resolutions").asText === "1h,2h,6h,1d")
      // runtimeinfo: session start time and runtime facts
      val ri = om.readTree(get(port, "/api/v1/status/runtimeinfo")._2)
        .get("data")
      assert(ri.get("startTime").asText.nonEmpty)
      assert(ri.get("reloadConfigSuccess").asBoolean)
      assert(ri.get("sparkVersion").asText === spark.version)
    } finally server.stop(0)
  }

  test("/api/v1/query_exemplars serves the anchored per-bucket exemplars") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val H = 3600000L
    val hdir = fixture("events" -> Seq(
      ev(1, 0, "error", 0.5, "a"),
      ev(2, H, "error", 0.75, "a"), // same (0,1] bucket, fresher → exemplar
      ev(3, H, "error", 7.0, "a"), // the (5,10] bucket
      ev(4, 2 * H, "error", 200.0, "a"), // above the last bound: none
      ev(5, 0, "purchase", 1.0, "a")
    ).toDF(eventCols: _*))
    val server = QueryEndpoint.start(spark, hdir)
    val port = server.getAddress.getPort
    try {
      val got = get(port, s"/api/v1/query_exemplars?query=${enc("error")}")
      assert(got === ((200, Api.queryExemplarsJson(spark, hdir, "error"))))
      val om = new ObjectMapper()
      val data = om.readTree(got._2).get("data")
      // (0,1] and (5,10] carry exemplars; the out-of-range 200.0 none
      assert(data.size === 2)
      val byLe = (0 until data.size).map(i =>
        data.get(i).get("seriesLabels").get("le").asText -> data.get(i)).toMap
      assert(byLe.keySet === Set("1.0", "10.0"))
      val ex1 = byLe("1.0").get("exemplars").get(0)
      assert(ex1.get("value").asText === "0.75",
        "the anchored FRESHEST in-bucket observation is the exemplar")
      assert(ex1.get("labels").get("event_id").asText === "2")
      assert(byLe("1.0").get("seriesLabels").get("__name__").asText === "error")
      // start/end bounds narrow the store to in-range observations
      val bounded = get(port, s"/api/v1/query_exemplars?query=${enc("error")}" +
        s"&start=$T0&end=$T0")
      val bdata = om.readTree(bounded._2).get("data")
      assert(bdata.size === 1)
      assert(bdata.get(0).get("exemplars").get(0).get("value").asText === "0.5")
      // a non-histogram selector has no exemplar storage: empty list
      val none = get(port, s"/api/v1/query_exemplars?query=${enc("purchase")}")
      assert(om.readTree(none._2).get("data").size === 0)
    } finally server.stop(0)
  }

  test("/api/v1/status/tsdb reports head stats from the series catalog") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      val got = get(port, "/api/v1/status/tsdb")
      assert(got === ((200, Api.tsdbStatusJson(spark, dir))))
      val d = new ObjectMapper().readTree(got._2).get("data")
      val head = d.get("headStats")
      // series catalog: purchase×{a,b} + signup×{a,b}, one instance
      assert(head.get("numSeries").asLong === 4)
      assert(head.get("numLabelPairs").asLong === 5) // 2 names + 1 inst + 2 ks
      assert(head.get("minTime").asLong === T0 * 1000)
      assert(head.get("maxTime").asLong === (T0 + 3 * dayS) * 1000)
      assert(head.get("chunkCount").asLong > 0)
      val byMetric = d.get("seriesCountByMetricName")
      val m = (0 until byMetric.size).map(i =>
        byMetric.get(i).get("name").asText ->
          byMetric.get(i).get("value").asLong).toMap
      assert(m === Map("purchase" -> 2L, "signup" -> 2L))
    } finally server.stop(0)
  }

  test("federate renders negative gauge values with a leading sign") {
    val negDir = fixture("events" -> Seq(
      ev(0, 0, "signup", 2.25, "a"),
      ev(1, D, "signup", -0.5, "a"),
      ev(2, D, "signup", -12.75, "b")
    ).toDF(eventCols: _*))
    val tMs = (T0 + 1 * dayS) * 1000L
    // LWW per series; the sign prints separately from the cents split
    // (truncating / and sign-keeping % would render `0.-50`)
    assert(Api.federateText(spark, negDir, Seq("signup")) ===
      s"""signup{instance="i1",k="a"} -0.50 $tMs
         |signup{instance="i1",k="b"} -12.75 $tMs
         |""".stripMargin)
  }

  test("/federate serves the timestamped exposition payload for matched series") {
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      val m = enc("match[]")
      val (code, body) = get(port,
        s"/federate?$m=${enc("purchase")}&$m=${enc("signup")}")
      assert(code === 200)
      // exact bytes: full series keys, alphabetical labels, cents
      // values, corpus-instant timestamp in ms, sorted lines
      val tMs = (T0 + 3 * dayS) * 1000L
      assert(body ===
        s"""purchase{instance="i1",k="a"} 5.50 $tMs
           |purchase{instance="i1",k="b"} 4.00 $tMs
           |signup{instance="i1",k="a"} 10.00 $tMs
           |signup{instance="i1",k="b"} 12.50 $tMs
           |""".stripMargin)
      assert(body === Api.federateText(spark, dir, Seq("purchase", "signup")),
        "HTTP payload must equal the in-process twin")
      // overlapping selectors dedup the matched series
      assert(get(port, s"/federate?$m=${enc("purchase")}&$m=${enc("purchase")}")._2
        === Api.federateText(spark, dir, Seq("purchase")))
      // matcher selectors federate too
      assert(get(port, s"/federate?$m=${enc("purchase{k=\"a\"}")}")._2
        .linesIterator.toSeq === Seq(s"""purchase{instance="i1",k="a"} 5.50 $tMs"""))
      // no match[] → 400 naming the parameter
      val (c2, b2) = get(port, "/federate")
      assert(c2 === 400 && b2.contains("match[]"))
    } finally server.stop(0)
  }

  test("errors wear the Prometheus envelope; unknown paths 404") {
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      // compose-time failure → 400 + error envelope
      val (code, body) = get(port, s"/api/v1/query?query=${enc("nosuch_metric")}")
      assert(code === 400)
      assert(body.startsWith("""{"status":"error","errorType":"bad_data""""))
      // missing parameter → 400, names the parameter
      val (c2, b2) = get(port, "/api/v1/query_range?query=up&start=1&end=2")
      assert(c2 === 400 && b2.contains("step"))
      // unparseable timestamps → 400, never a 500
      val (c3, _) = get(port,
        s"/api/v1/query_range?query=${enc("purchase")}&start=x&end=2&step=1")
      assert(c3 === 400)
      // unknown top-level path → the server's 404
      assert(get(port, "/nope")._1 === 404)
      // a bogus suffix under /api/v1/query is rejected, not served
      assert(get(port, s"/api/v1/queryzz?query=${enc("purchase")}")._1 === 400)
    } finally server.stop(0)
  }
}
