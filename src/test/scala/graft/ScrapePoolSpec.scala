package graft

import graft.sources.{ScrapeClient, ScrapeEndpoint, ScrapePool}
import graft.streaming.{ExpositionRegistry, MetricStream}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** File-based target discovery ([[ScrapePool]]) and the
  * `honor_labels` attach law ([[ScrapeClient.attachTargetLabels]]) —
  * the scrape-config surface a real multi-target Prometheus runs.
  */
class ScrapePoolSpec extends SparkTestBase {
  import spark.implicits._

  test("honor_labels attach law: exposed wins under honor, exports under default") {
    val samples = Seq(
      // carries an exposed instance AND job
      (Map("__name__" -> "m", "instance" -> "exp:1", "job" -> "expjob"), 1.0),
      // carries neither
      (Map("__name__" -> "m", "k" -> "a"), 2.0),
      // the rename-collision edge: an exposed exported_instance twin
      // alongside the exposed instance — the rename OVERWRITES it
      // (upstream's labels.Builder.Set)
      (Map("__name__" -> "m", "instance" -> "exp:1",
        "exported_instance" -> "already"), 3.0))
      .toDF("labels", "value")
      .withColumn("scrape_ts", to_timestamp(lit("2024-01-01 00:00:00")))
    val target = Map("instance" -> "tgt:9090", "job" -> "graft")
    def got(honor: Boolean): Map[Double, Map[String, String]] =
      ScrapeClient.attachTargetLabels(samples, target, honor)
        .select(col("value"), col("labels"))
        .collect().map(r => r.getDouble(0) ->
          r.getMap[String, String](1).toMap).toMap
    val h = got(honor = true)
    assert(h(1.0) === Map("__name__" -> "m", "instance" -> "exp:1",
      "job" -> "expjob"))
    assert(h(2.0) === Map("__name__" -> "m", "k" -> "a",
      "instance" -> "tgt:9090", "job" -> "graft"))
    val e = got(honor = false)
    assert(e(1.0) === Map("__name__" -> "m",
      "instance" -> "tgt:9090", "exported_instance" -> "exp:1",
      "job" -> "graft", "exported_job" -> "expjob"))
    assert(e(2.0) === Map("__name__" -> "m", "k" -> "a",
      "instance" -> "tgt:9090", "job" -> "graft"))
    assert(e(3.0) === Map("__name__" -> "m",
      "instance" -> "tgt:9090", "exported_instance" -> "exp:1",
      "job" -> "graft"))
    // no target labels = identity, either mode
    for (honor <- Seq(true, false))
      assert(ScrapeClient.attachTargetLabels(samples, Map.empty, honor)
        .select(col("labels")).collect().map(_.getMap[String, String](0).toMap)
        .toSet === samples.select(col("labels")).collect()
        .map(_.getMap[String, String](0).toMap).toSet)
  }

  test("a dead target fires `up == 0` through the real evaluator — the canonical outage alert") {
    ExpositionRegistry.clear()
    ExpositionRegistry.publish(
      MetricStream.SeriesTotal("purchase", "a", 5.5, 3))
    val server = ScrapeEndpoint.start()
    val port = server.getAddress.getPort
    val loop = new graft.sources.ScrapeLoop(spark,
      s"http://127.0.0.1:$port/metrics")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01").getTime
    val q = loop.events.writeStream.format("memory")
      .queryName("up_alert_ev").outputMode("append").start()
    try {
      loop.poll(t1)
      q.processAllAvailable()
      def evalUp(key: String): Set[(String, String)] = {
        // snapshot into a local relation: the memory table's LOGICAL
        // PLAN is identical across ticks, and a lazily-seeded view
        // would cache-match the previous tick's persisted rows
        val snap = spark.createDataFrame(
          spark.table("up_alert_ev").collect().toSeq.asJava,
          spark.table("up_alert_ev").schema)
        graft.operators.Metrics.seedEvents(spark, key,
          graft.operators.Metrics.metricEventsOf(snap))
        graft.promql.Rules.evaluateAlerts(spark, key, Seq(
          graft.promql.Rules.AlertRule("TargetDown", "up == 0")))
          .select(col("alertname"), col("label_k"))
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
      }
      assert(evalUp(s"up#t1") === Set.empty, "a healthy target fires nothing")
      // the target dies; the next tick's up = 0 IS the alert condition
      server.stop(0)
      loop.poll(t1 + 60000L)
      q.processAllAvailable()
      assert(evalUp(s"up#t2") ===
        Set(("TargetDown", s"127.0.0.1:$port")),
        "the outage fires on the target's identity")
    } finally q.stop()
  }

  test("file-SD pool: discovery, per-group labels, retire-on-removal, bad-file keeps scraping") {
    ExpositionRegistry.clear()
    Seq(MetricStream.SeriesTotal("purchase", "a", 5.5, 3),
      MetricStream.SeriesTotal("signup", "b", 2.0, 1))
      .foreach(ExpositionRegistry.publish)
    val s1 = ScrapeEndpoint.start()
    val s2 = ScrapeEndpoint.start()
    val (p1, p2) = (s1.getAddress.getPort, s2.getAddress.getPort)
    val (a1, a2) = (s"127.0.0.1:$p1", s"127.0.0.1:$p2")
    val sd = java.nio.file.Files.createTempFile("graft_sd", ".json")
    def writeSd(entries: String): Unit =
      java.nio.file.Files.write(sd, entries.getBytes("UTF-8"))
    writeSd(s"""[
      |{"targets": ["$a1"], "labels": {"job": "web", "dc": "east"}},
      |{"targets": ["$a2"], "labels": {"job": "db"}}
      |]""".stripMargin)
    val pool = new ScrapePool(spark, sd.toString)
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01").getTime
    try {
      pool.poll(t1)
      assert(pool.sdError.isEmpty)
      val st = pool.statuses
      assert(st.map(s => (s.instance, s.job, s.health)).toSet ===
        Set((a1, "web", "up"), (a2, "db", "up")))
      // the labeled face carries each group's SD labels + identity,
      // and the report samples ride with ONLY the target identity
      val q = pool.labeledEvents.writeStream.format("memory")
        .queryName("sd_pool").outputMode("append").start()
      try {
        q.processAllAvailable()
        def rows() = spark.table("sd_pool")
          .select(col("labels"), col("value"),
            unix_millis(col("scrape_ts")).as("ts_ms"))
          .collect().map(r => (r.getMap[String, String](0).toMap,
            r.getDouble(1), r.getLong(2))).toSeq
        val purchases = rows().filter(_._1.get("__name__")
          .contains("purchase"))
        assert(purchases.map(_._1).toSet === Set(
          Map("__name__" -> "purchase", "k" -> "a",
            "instance" -> a1, "job" -> "web", "dc" -> "east"),
          Map("__name__" -> "purchase", "k" -> "a",
            "instance" -> a2, "job" -> "db")))
        val ups = rows().filter(_._1.get("__name__").contains("up"))
        assert(ups.map(u => (u._1, u._2)).toSet === Set(
          (Map("__name__" -> "up", "instance" -> a1, "job" -> "web",
            "dc" -> "east"), 1.0),
          (Map("__name__" -> "up", "instance" -> a2, "job" -> "db"),
            1.0)))
        // ---- removal: drop the db target from the file — the next
        // poll retires it: markers for its live series AND a stale up
        writeSd(s"""[{"targets": ["$a1"],
          |"labels": {"job": "web", "dc": "east"}}]""".stripMargin)
        val t2 = t1 + 60000L
        pool.poll(t2)
        q.processAllAvailable()
        assert(pool.statuses.map(_.instance) === Seq(a1))
        val atT2 = rows().filter(_._3 == t2)
        val (gone, kept) = atT2.partition(_._1.get("instance").contains(a2))
        assert(gone.nonEmpty && gone.forall(_._2.isNaN),
          "every retired-target sample at t2 is a staleness marker")
        assert(gone.exists(_._1.get("__name__").contains("up")),
          "the retired target's up goes stale too")
        assert(kept.filter(_._1.get("__name__").contains("purchase"))
          .forall(r => !r._2.isNaN), "the surviving target keeps serving")
        // ---- a malformed SD file keeps the previous target set
        // scraping (discovery failure must not take targets down)
        writeSd("{not json[")
        val t3 = t2 + 60000L
        pool.poll(t3)
        assert(pool.sdError.isDefined)
        assert(pool.statuses.map(_.instance) === Seq(a1))
        assert(pool.statuses.head.lastScrapeMs === Some(t3))
        // ---- recovery: the fixed file re-adds the db target
        writeSd(s"""[
          |{"targets": ["$a1"], "labels": {"job": "web", "dc": "east"}},
          |{"targets": ["$a2"], "labels": {"job": "db"}}
          |]""".stripMargin)
        pool.poll(t3 + 60000L)
        assert(pool.sdError.isEmpty)
        assert(pool.statuses.map(s => (s.instance, s.job)).toSet ===
          Set((a1, "web"), (a2, "db")))
      } finally q.stop()
    } finally {
      s1.stop(0); s2.stop(0)
      java.nio.file.Files.deleteIfExists(sd)
    }
  }
}
