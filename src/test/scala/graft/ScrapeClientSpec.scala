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

  test("metric_relabel_configs prune and rewrite series BEFORE rollup ingest") {
    import graft.sources.Relabel
    seed()
    val server = ScrapeEndpoint.start()
    val port = server.getAddress.getPort
    try {
      val rules = Seq(
        // drop the click family at the door — no ingest state ever
        // exists for it
        Relabel.Rule(action = "drop", sourceLabels = Seq("__name__"),
          regex = "click"),
        // rewrite a label value with a capture group
        Relabel.Rule(action = "replace", sourceLabels = Seq("k"),
          regex = "(a)", targetLabel = "k", replacement = "$1lpha"))
      val loop = new ScrapeLoop(spark, s"http://127.0.0.1:$port/metrics",
        metricRelabelConfigs = rules)
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01").getTime
      val q = MetricStream.streamingRollup(loop.events)
        .writeStream.format("memory").queryName("scrape_relabeled")
        .outputMode(OutputMode.Update).start()
      try {
        loop.poll(t1)
        q.processAllAvailable()
        val keys = spark.table("scrape_relabeled")
          .select("name", "label_k").as[(String, String)].collect().toSet
        // click never reached the rollup operator; purchase{k=a}
        // ingested under the rewritten k=alpha; report samples ride
        // UNRELABELED (upstream appends them after the rule chain)
        val inst = s"127.0.0.1:$port"
        assert(keys === Set("purchase" -> "alpha", "purchase" -> "b",
          "up" -> inst, "scrape_duration_seconds" -> inst,
          "scrape_samples_scraped" -> inst))
      } finally q.stop()
      // batch ≡ streaming: the same rules over the same payload as a
      // static relation give the same sample set (one expression tree
      // binds to both)
      val body = ScrapeClient.fetch(s"http://127.0.0.1:$port/metrics")
      val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:01")
      val batch = ScrapeClient.parsePayloads(
        Seq((ts, body)).toDF("scrape_ts", "payload"), rules)
        .as[(java.sql.Timestamp, String, String, Double)].collect()
        .map(r => (r._2, r._3, r._4)).toSet
      assert(batch === Set(("purchase", "alpha", 5.5),
        ("purchase", "b", 4.0)))
    } finally server.stop(0)
  }

  test("relabel_configs act at target discovery; column face ≡ scala face") {
    import graft.sources.Relabel
    import graft.sources.Relabel.Rule
    // a dropped target is never fetched: no scrape, no error, health
    // stays unknown — upstream drops it from the scrape pool entirely
    val t = new ScrapeLoop(spark, "http://127.0.0.1:1/metrics",
      job = "edge1", relabelConfigs = Seq(
        Rule(action = "drop", sourceLabels = Seq("job"), regex = "edge.*")))
    assert(t.dropped)
    t.poll()
    assert(t.status.lastScrapeMs.isEmpty && t.status.health === "unknown")
    // replace on the job label renames the target's identity
    val t2 = new ScrapeLoop(spark, "http://127.0.0.1:1/metrics",
      job = "edge", relabelConfigs = Seq(
        Rule(action = "replace", sourceLabels = Seq("job"),
          regex = "(.*)", targetLabel = "job", replacement = "prod-$1")))
    assert(!t2.dropped && t2.status.job === "prod-edge")
    // the column face and the driver-side scala face are ONE
    // semantics: every action over a matrix of label sets
    val labelSets = Seq(
      Map("__name__" -> "api_http_requests_total", "job" -> "API",
        "instance" -> "h1:9100"),
      Map("__name__" -> "node_cpu", "mode" -> "idle", "cpu" -> "7"),
      Map("__name__" -> "up"))
    val ruleChains = Seq(
      Seq(Rule(action = "replace", sourceLabels = Seq("__name__"),
        regex = "api_(.*)", targetLabel = "__name__",
        replacement = "$1")),
      Seq(Rule(action = "keep", sourceLabels = Seq("job", "mode"),
        regex = "API;.*")),
      Seq(Rule(action = "hashmod", sourceLabels = Seq("instance"),
        targetLabel = "shard", modulus = 4L),
        Rule(action = "lowercase", sourceLabels = Seq("job"),
          targetLabel = "job")),
      Seq(Rule(action = "labelmap", regex = "(mode|cpu)",
        replacement = "sys_$1"),
        Rule(action = "labeldrop", regex = "cpu")),
      Seq(Rule(action = "keepequal", sourceLabels = Seq("cpu"),
        targetLabel = "cpu")),
      Seq(Rule(action = "dropequal", sourceLabels = Seq("mode"),
        targetLabel = "mode")),
      Seq(Rule(action = "uppercase", sourceLabels = Seq("__name__"),
        targetLabel = "NAME")),
      Seq(Rule(action = "labelkeep", regex = "__name__|job")))
    for (ls <- labelSets; rs <- ruleChains) {
      val viaScala = Relabel.relabelMap(ls, rs)
      val viaCol = Seq(Tuple1(ls)).toDF("labels")
        .select(Relabel.relabelCol(org.apache.spark.sql.functions.col("labels"), rs).as("out"))
        .collect().head
      val got =
        if (viaCol.isNullAt(0)) None
        else Some(viaCol.getMap[String, String](0).toMap)
      assert(got === viaScala, s"labels=$ls rules=$rs")
    }
  }

  test("vanished series get staleness markers; a failed scrape stales the target") {
    seed() // purchase{a,b} + click{a}
    val server = ScrapeEndpoint.start()
    val port = server.getAddress.getPort
    val loop = new ScrapeLoop(spark, s"http://127.0.0.1:$port/metrics")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01").getTime
    val q = loop.events.writeStream.format("memory")
      .queryName("stale_ev").outputMode("append").start()
    def rows() = spark.table("stale_ev")
      .select(org.apache.spark.sql.functions.unix_millis(
        org.apache.spark.sql.functions.col("ts")).as("ts_ms"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.get_json_object(
          org.apache.spark.sql.functions.col("props"), "$.k").as("k"),
        org.apache.spark.sql.functions.col("value"))
      .as[(Long, String, String, Double)].collect().toSeq
    // staleness-aware LWW: latest sample per series; marker-latest
    // series are EXCLUDED — the consumer rule StaleMarker exists for
    // NOTE: Map.collect with a Tuple2-valued function rebuilds a MAP
    // (keys collide) — filter + keySet keeps the series-key pairs
    def live() = rows().groupBy(r => (r._2, r._3))
      .filter { case (_, rs) => !rs.maxBy(_._1)._4.isNaN }
      .keySet
    // the per-target report samples ride every tick (up + scrape
    // telemetry, keyed by the target's instance)
    val inst = s"127.0.0.1:$port"
    val report = Set(("up", inst), ("scrape_duration_seconds", inst),
      ("scrape_samples_scraped", inst))
    try {
      loop.poll(t1)
      q.processAllAvailable()
      assert(live() === Set(("purchase", "a"), ("purchase", "b"),
        ("click", "a")) ++ report)
      assert(rows().filter(r => r._2 == "up").forall(_._4 === 1.0))
      assert(rows().filter(r => r._2 == "scrape_samples_scraped")
        .forall(_._4 === 3.0), "three sample lines on the wire")
      // the registry moves on: b and click vanish from the payload —
      // the next tick closes them with markers AT that tick's instant
      ExpositionRegistry.clear()
      ExpositionRegistry.publish(
        MetricStream.SeriesTotal("purchase", "a", 9.0, 4))
      loop.poll(t1 + 60000L)
      q.processAllAvailable()
      val marked = rows().filter(_._4.isNaN)
      assert(marked.map(m => (m._1, m._2, m._3)).toSet === Set(
        (t1 + 60000L, "purchase", "b"), (t1 + 60000L, "click", "a")))
      assert(live() === Set(("purchase", "a")) ++ report)
      // a DOWN target stales everything it still served — but the
      // report samples keep flowing: `up = 0` IS the outage signal
      server.stop(0)
      loop.poll(t1 + 120000L)
      q.processAllAvailable()
      assert(loop.status.health === "down")
      assert(live() === report)
      val lastUp = rows().filter(r => r._2 == "up").maxBy(_._1)
      assert(lastUp._1 === t1 + 120000L && lastUp._4 === 0.0)
      assert(rows().filter(r =>
          r._2 == "scrape_samples_scraped" && r._1 == t1 + 120000L)
        .forall(_._4 === 0.0))
    } finally q.stop()
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
            Double, Double, Double, (Long, Long), Double, (Long, Long),
            Option[(Long, Long)])]
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
