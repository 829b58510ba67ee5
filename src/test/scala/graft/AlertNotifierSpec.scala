package graft

import graft.promql.Rules.AlertRule
import graft.sources.AlertNotifier

/** The outbound alerting arrow: firing alerts POST to an
  * Alertmanager-shaped `/api/v2/alerts` receiver as the v2 JSON array;
  * pending/inactive rules send nothing; outages record, never throw.
  */
class AlertNotifierSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dir: String = fixture("events" -> Seq(
    ev(0, 0, "purchase", 4.0, "a"),
    ev(1, 1000, "purchase", 3.5, "a"),
    ev(2, 2000, "purchase", 1.0, "b"),
    ev(3, 3000, "signup", 10.0, "a")
  ).toDF(eventCols: _*))

  test("firing alerts POST the Alertmanager v2 shape; empty set skips the wire") {
    @volatile var received: Option[String] = None
    val am = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    am.createContext("/api/v2/alerts", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        received = Some(new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        ex.sendResponseHeaders(200, -1L)
        ex.getResponseBody.close()
      }
    })
    am.start()
    try {
      val url = s"http://127.0.0.1:${am.getAddress.getPort}/api/v2/alerts"
      val n = new AlertNotifier(url)
      // k=a totals 7.5 > 3 fires; k=b (1.0) does not
      val code = n.notify(spark, dir,
        Seq(AlertRule("High", "sum by (k) (purchase) > 3")))
      assert(code === 200)
      val body = received.getOrElse(fail("no POST arrived"))
      assert(body.contains(""""alertname":"High""""))
      assert(body.contains(""""k":"a""""))
      assert(!body.contains(""""k":"b""""))
      assert(body.contains(""""startsAt":"""))
      assert(body.contains(""""generatorURL":"""))
      assert(n.status._2 === None && n.status._3 === 1)

      // nothing firing: no POST, local 204
      received = None
      val quiet = n.notify(spark, dir,
        Seq(AlertRule("Impossible", "sum(purchase) > 1000000")))
      assert(quiet === 204 && received === None && n.status._3 === 0)
    } finally am.stop(0)
  }

  test("an unreachable Alertmanager records the outage, never throws") {
    val n = new AlertNotifier("http://127.0.0.1:1/api/v2/alerts")
    val code = n.notify(spark, dir,
      Seq(AlertRule("High", "sum by (k) (purchase) > 3")))
    assert(code === -1)
    assert(n.status._2.nonEmpty)
  }

  test("/api/v1/alertmanagers partitions healthy vs dropped notifiers") {
    val good = new AlertNotifier("http://127.0.0.1:1/unused") // never posted
    val bad = new AlertNotifier("http://127.0.0.1:1/api/v2/alerts")
    bad.notify(spark, dir, Seq(AlertRule("High", "sum by (k) (purchase) > 3")))
    val server = graft.sources.QueryEndpoint.start(spark, dir,
      alertmanagers = Seq(
        "http://am-healthy:9093/api/v2/alerts" -> good,
        "http://am-down:9093/api/v2/alerts" -> bad))
    try {
      val conn = new java.net.URL(
        s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/alertmanagers")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val body = try new String(conn.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally conn.disconnect()
      assert(body ===
        """{"status":"success","data":{"activeAlertmanagers":""" +
          """[{"url":"http://am-healthy:9093/api/v2/alerts"}],""" +
          """"droppedAlertmanagers":[{"url":"http://am-down:9093/api/v2/alerts"}]}}""")
    } finally server.stop(0)
  }
}
