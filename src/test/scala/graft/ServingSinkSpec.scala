package graft

import graft.operators.Metrics
import graft.sources.ServingSink

/** Partitioned serving-table sink: round-trip, partition layout on disk,
  * and partition pruning on read-back.
  */
class ServingSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("sink writes kind-partitioned parquet and prunes on read") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dir = fixture("events" -> Seq(
      (0L, t0, 1L, "click", 2.0, """{"k": "a"}"""),
      (1L, t0, 1L, "signup", 7.0, """{"k": "a"}"""),
      (2L, t0, 1L, "error", 3.0, """{"k": "h"}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = java.nio.file.Files.createTempDirectory("serving").toString

    ServingSink.write(Metrics.exposition(spark, dir), out)

    // hive-style kind= partition directories on disk
    val parts = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("kind="))
    assert(parts.toSet === Set("kind=counter", "kind=gauge", "kind=histogram"))

    // read-back returns only the selected kind, and the plan prunes
    val counters = ServingSink.readKind(spark, out, "counter")
    assert(counters.select($"name").as[String].collect().toSeq === Seq("click"))
    val plan = counters.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(kind"), plan.take(500))
  }

  test("HTTP pull endpoint serves the registry as Prometheus text exposition") {
    import graft.sources.ScrapeEndpoint
    import graft.streaming.{ExpositionRegistry, MetricStream}
    ExpositionRegistry.clear()
    ExpositionRegistry.publish(MetricStream.SeriesTotal("click", "a", 7.0, 3L))
    ExpositionRegistry.publish(MetricStream.SeriesTotal("click", "b", 2.5, 1L))
    ExpositionRegistry.publish(MetricStream.SeriesTotal("purchase", "a", 10.0, 2L))
    val server = ScrapeEndpoint.start() // ephemeral port
    try {
      val port = server.getAddress.getPort
      def get(path: String): (Int, String, String) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val ct = Option(conn.getContentType).getOrElse("")
        val body =
          if (code == 200)
            new String(conn.getInputStream.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
          else ""
        conn.disconnect()
        (code, ct, body)
      }
      val (code, ct, body) = get("/metrics")
      assert(code === 200)
      assert(ct === ScrapeEndpoint.ContentType)
      // the exact reference wire shape, sorted, cents-rendered (a1c's
      // renderer contract), trailing newline
      assert(body ===
        "click{k=\"a\"} 7.00\nclick{k=\"b\"} 2.50\npurchase{k=\"a\"} 10.00\n")
      // a second scrape sees updated state without restart
      ExpositionRegistry.publish(MetricStream.SeriesTotal("click", "a", 8.25, 4L))
      assert(get("/metrics")._3.contains("click{k=\"a\"} 8.25"))
      // only /metrics is registered, like the reference's single handler
      assert(get("/other")._1 === 404)
      // the payload parses with the engine's own a1d regex contract
      val re = "^(\\w+)\\{k=\"([^\"]*)\"\\} (.+)$".r
      body.linesIterator.foreach(l => assert(re.findFirstIn(l).isDefined, l))
      // content negotiation: an OpenMetrics Accept header switches the
      // wire to the 1.0 format — TYPE headers, _total suffix, # EOF —
      // exactly what a modern Prometheus scraper negotiates
      def getOm(path: String): (Int, String, String) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestProperty("Accept",
          "application/openmetrics-text;version=1.0.0,text/plain;q=0.5")
        val code = conn.getResponseCode
        val ct = Option(conn.getContentType).getOrElse("")
        val b = new String(conn.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        conn.disconnect()
        (code, ct, b)
      }
      val (omCode, omCt, omBody) = getOm("/metrics")
      assert(omCode === 200)
      assert(omCt === ScrapeEndpoint.OpenMetricsContentType)
      assert(omBody ===
        "# TYPE click counter\nclick_total{k=\"a\"} 8.25\n" +
        "click_total{k=\"b\"} 2.50\n# TYPE purchase counter\n" +
        "purchase_total{k=\"a\"} 10.00\n# EOF\n")
    } finally {
      server.stop(0)
      ExpositionRegistry.clear()
    }
  }

  test("endpoint serves a live streaming sink's accumulating state") {
    import graft.sources.ScrapeEndpoint
    import graft.streaming.{ExpositionRegistry, MetricStream}
    ExpositionRegistry.clear()
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RawEvent]
    val q = MetricStream.startServingSink(
      MetricStream.runningCounterTotals(input.toDF()),
      "scrape-endpoint-spec")
    val server = ScrapeEndpoint.start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData(RawEvent(0L, t0, 1L, "click", 2.0, """{"k": "a"}"""))
      input.addData(RawEvent(1L, t0, 1L, "click", 3.5, """{"k": "a"}"""))
      q.processAllAvailable()
      val port = server.getAddress.getPort
      val conn = new java.net.URL(s"http://127.0.0.1:$port/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val body = new String(conn.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      conn.disconnect()
      assert(body === "click{k=\"a\"} 5.50\n")
    } finally {
      server.stop(0)
      q.stop()
      ExpositionRegistry.clear()
    }
  }
}
