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
        ((200, Api.seriesJson(spark, dir, "purchase"))))
      assert(get(port, "/api/v1/labels") ===
        ((200, Api.labelsJson(spark, dir))))
      assert(get(port, "/api/v1/label/k/values") ===
        ((200, Api.labelValuesJson(spark, dir, "k"))))
    } finally server.stop(0)
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
