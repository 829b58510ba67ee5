package graft

import graft.sources.{ScrapeClient, ScrapeEndpoint, ScrapeLoop}
import graft.streaming.{ExpositionRegistry, MetricStream}
import org.apache.spark.sql.streaming.OutputMode

/** The reference's pull model closed END TO END: the engine scrapes its
  * OWN `/metrics` endpoint (the Exposer twin), re-ingests the payload
  * through the standard adapter, and maintains the rollup pyramid from
  * the scraped stream — fetch → parse → events → streamingRollup.
  */
class ScrapeClientSpec extends SparkTestBase {
  import spark.implicits._

  private def seed(): Unit = {
    ExpositionRegistry.clear()
    Seq(
      MetricStream.SeriesTotal("purchase", "a", 5.5, 3),
      MetricStream.SeriesTotal("purchase", "b", 4.0, 1),
      MetricStream.SeriesTotal("click", "a", 2.0, 2)
    ).foreach(ExpositionRegistry.publish)
  }

  test("a scraped payload re-ingests to exactly the source registry (both formats)") {
    seed()
    val server = ScrapeEndpoint.start()
    val port = server.getAddress.getPort
    try {
      val url = s"http://127.0.0.1:$port/metrics"
      val want = ExpositionRegistry.series()
        .map(t => (t.name, t.label_k, t.total)).toSet
      for (om <- Seq(false, true)) {
        val body = ScrapeClient.fetch(url, openMetrics = om)
        if (om) assert(body.endsWith("# EOF\n") && body.contains("_total{"))
        val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        val parsed = ScrapeClient.parsePayloads(
          Seq((ts, body)).toDF("scrape_ts", "payload"))
          .as[(java.sql.Timestamp, String, String, Double)].collect()
        // re-ingested registry ≡ source registry, exactly — the wire
        // round-trips every series and value in either format
        assert(parsed.map(r => (r._2, r._3, r._4)).toSet === want, s"om=$om")
        assert(parsed.forall(_._1 === ts))
      }
      // a real Prometheus scrapes with Accept-Encoding: gzip — the
      // framed payload decompresses to the identical exposition bytes
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestProperty("Accept-Encoding", "gzip")
      try {
        assert(conn.getResponseCode === 200)
        assert(conn.getHeaderField("Content-Encoding") === "gzip")
        val gz = new java.util.zip.GZIPInputStream(conn.getInputStream)
        assert(new String(gz.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) === ScrapeClient.fetch(url))
      } finally conn.disconnect()
    } finally server.stop(0)
  }

  test("/api/v1/targets reports scrape-pool health: unknown, up, down") {
    import com.fasterxml.jackson.databind.ObjectMapper
    seed()
    val server = ScrapeEndpoint.start()
    val port = server.getAddress.getPort
    val dir = fixture("events" ->
      Seq(ev(1, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    try {
      val good = new ScrapeLoop(spark, s"http://127.0.0.1:$port/metrics")
      val bad = new ScrapeLoop(spark, "http://127.0.0.1:1/metrics",
        job = "edge")
      val qe = graft.sources.QueryEndpoint.start(spark, dir,
        scrapeTargets = Seq(good, bad))
      val qport = qe.getAddress.getPort
      val om = new ObjectMapper()
      def targets(): Map[String, (String, String)] = {
        val body = ScrapeClient.fetch(s"http://127.0.0.1:$qport/api/v1/targets")
        val at = om.readTree(body).get("data").get("activeTargets")
        (0 until at.size).map(i =>
          at.get(i).get("scrapePool").asText ->
            ((at.get(i).get("health").asText,
              at.get(i).get("lastError").asText))).toMap
      }
      try {
        // never scraped: health unknown on both
        assert(targets().view.mapValues(_._1).toMap ===
          Map("graft" -> "unknown", "edge" -> "unknown"))
        good.poll()
        bad.poll() // connection refused — recorded, not thrown
        val after = targets()
        assert(after("graft") === (("up", "")))
        assert(after("edge")._1 === "down")
        assert(after("edge")._2.nonEmpty, "the scrape error is kept verbatim")
      } finally qe.stop(0)
    } finally server.stop(0)
  }

  test("tick-driven scrape loop maintains the streaming rollup pyramid") {
    seed()
    val server = ScrapeEndpoint.start()
    val port = server.getAddress.getPort
    try {
      val loop = new ScrapeLoop(spark, s"http://127.0.0.1:$port/metrics")
      // +1 s off the hour epoch: a tick at EXACTLY 10:00:00 would land
      // in the bucket ending there (closed-right membership) and the
      // two scrapes would split across buckets
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01").getTime
      val q = MetricStream.streamingRollup(loop.events)
        .writeStream.format("memory").queryName("scrape_roll")
        .outputMode(OutputMode.Update).start()
      try {
        loop.poll(t1)
        q.processAllAvailable()
        // the registry moves between ticks; the second scrape lands in
        // the same 1h bucket one minute later
        ExpositionRegistry.publish(MetricStream.SeriesTotal("purchase", "a", 7.25, 4))
        loop.poll(t1 + 60000L)
        q.processAllAvailable()
        val rows = spark.table("scrape_roll")
          .as[(String, String, String, String, Long, Long, BigDecimal,
            Double, Double, Double, (Long, Long), Double, (Long, Long))]
          .collect()
        // latest update per series (Update-mode sink keeps history)
        def state(name: String, k: String) =
          rows.filter(r => r._1 == name && r._2 == k).maxBy(_._6)
        val pa = state("purchase", "a")
        assert(pa._6 === 2L, "two scrape samples in the bucket")
        assert(pa._7 === BigDecimal("12.75"), "exact decimal sum 5.5 + 7.25")
        assert(pa._12 === 7.25, "vlast follows the registry move")
        assert(pa._8 === 5.5 && pa._9 === 7.25, "vmin/vmax bracket the ticks")
        assert(state("purchase", "b")._12 === 4.0)
        assert(state("click", "a")._6 === 2L)
      } finally q.stop()
    } finally server.stop(0)
  }
}
