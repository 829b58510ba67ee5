package graft

import java.net.{HttpURLConnection, URL, URLEncoder}

import graft.promql.{Admin, Api}
import graft.sources.QueryEndpoint

/** The TSDB admin API: delete_series records tombstones and every
  * query path (instant, head scan, rollup pyramid) excludes the covered
  * samples immediately; clean_tombstones applies them PHYSICALLY (the
  * head compacts — forgetting the tombstones afterwards does not bring
  * the data back); snapshot writes a consistent, re-seedable copy.
  * Store state is per (session, fixture dir) and every test resets in
  * `finally`, so suites stay order-independent.
  */
class AdminApiSpec extends SparkTestBase {
  import spark.implicits._

  private val D = 86400000L
  private val T0 = 1704067200L // 2024-01-01 00:00:00 UTC
  private val dayS = 86400L

  private def freshDir: String = fixture("events" -> Seq(
    ev(0, 0, "purchase", 1.0, "a"),
    ev(1, 1 * D, "purchase", 2.0, "a"),
    ev(2, 2 * D, "purchase", 4.0, "b"),
    ev(3, 3 * D, "purchase", 2.5, "a"),
    ev(4, 0, "signup", 10.0, "a"),
    ev(5, 3 * D, "signup", 12.5, "b")
  ).toDF(eventCols: _*))

  private def post(port: Int, pathAndQuery: String): (Int, String) = {
    val conn = new URL(s"http://127.0.0.1:$port$pathAndQuery")
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    try {
      val code = conn.getResponseCode
      val is = Option(
        if (code >= 400) conn.getErrorStream else conn.getInputStream)
      val body = is.map { s =>
        try new String(s.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally s.close()
      }.getOrElse("")
      (code, body)
    } finally conn.disconnect()
  }

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

  private def counterTotals(dir: String): Map[String, Double] =
    graft.operators.Metrics.counterSnapshot(spark, dir)
      .select("label_k", "value").as[(String, Double)].collect().toMap

  test("delete_series over HTTP: immediate exclusion, restored on reset") {
    val dir = freshDir
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      val before = counterTotals(dir)
      assert(before === Map("a" -> 5.5, "b" -> 4.0))
      val beforeJson = Api.queryJson(spark, dir, "sum by (k) (purchase)")

      val (code, _) = post(port,
        s"/api/v1/admin/tsdb/delete_series?match[]=${enc("""purchase{k="a"}""")}")
      assert(code === 204)
      assert(Admin.tombstones(spark, dir).size === 1)
      assert(counterTotals(dir) === Map("b" -> 4.0))
      // the untouched family is unaffected
      assert(graft.operators.Metrics.gaugeSnapshot(spark, dir).count() === 2)

      Admin.reset(spark, dir) // forget WITHOUT applying: data returns
      assert(counterTotals(dir) === before)
      assert(Api.queryJson(spark, dir, "sum by (k) (purchase)") === beforeJson)
    } finally { Admin.reset(spark, dir); server.stop(0) }
  }

  test("time-bounded delete removes only the covered samples") {
    val dir = freshDir
    try {
      // purchase samples at t0, t0+1d, t0+2d(b), t0+3d(a); delete
      // everything up to 1.5 days in — events 0 and 1 go, 2 and 3 stay
      Admin.deleteSeries(spark, dir, Seq("purchase"),
        startS = None, endS = Some(T0 + (3 * dayS) / 2))
      assert(counterTotals(dir) === Map("a" -> 2.5, "b" -> 4.0))
      // a start bound too: delete [t0+2.5d, ∞) — only event 3 goes
      Admin.reset(spark, dir)
      Admin.deleteSeries(spark, dir, Seq("purchase"),
        startS = Some(T0 + 2 * dayS + dayS / 2), endS = None)
      assert(counterTotals(dir) === Map("a" -> 3.0, "b" -> 4.0))
    } finally Admin.reset(spark, dir)
  }

  test("admin endpoint contract: 405 on GET, 400 on bad selector or missing match[]") {
    val dir = freshDir
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      val (g, _) = get(port, "/api/v1/admin/tsdb/delete_series?match[]=purchase")
      assert(g === 405)
      val (m, body) = post(port, "/api/v1/admin/tsdb/delete_series")
      assert(m === 400 && body.contains("match[]"))
      val (b, _) = post(port,
        s"/api/v1/admin/tsdb/delete_series?match[]=${enc("rate(purchase[5m])")}")
      assert(b === 400)
      assert(Admin.tombstones(spark, dir).isEmpty,
        "failed deletes must not poison the store")
    } finally { Admin.reset(spark, dir); server.stop(0) }
  }

  test("clean_tombstones applies physically: forgetting afterwards changes nothing") {
    val dir = freshDir
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      Admin.deleteSeries(spark, dir, Seq("""purchase{k="a"}"""))
      val deleted = counterTotals(dir)
      assert(deleted === Map("b" -> 4.0))

      val (code, _) = post(port, "/api/v1/admin/tsdb/clean_tombstones")
      assert(code === 204)
      assert(Admin.tombstones(spark, dir).isEmpty)
      assert(counterTotals(dir) === deleted, "answers unchanged by clean")

      // the proof of PHYSICAL application: with no tombstones in the
      // store, the deleted rows are still gone — the head was compacted
      Admin.reset(spark, dir)
      assert(counterTotals(dir) === deleted)
      assert(graft.operators.Metrics.metricEvents(spark, dir)
        .filter($"name" === "purchase" && $"label_k" === "a").count() === 0)
    } finally { Admin.reset(spark, dir); server.stop(0) }
  }

  test("rollup pyramid serves tombstone-exact answers: faces rebuild from the filtered head") {
    val dir = freshDir
    try {
      // prime the base face, then delete — the face must NOT serve the
      // stale pre-delete aggregate
      val primed = graft.operators.Downsample.rollupFace1h(spark, dir, "base")
      assert(primed.filter($"name" === "purchase" && $"label_k" === "a")
        .count() > 0)
      Admin.deleteSeries(spark, dir, Seq("""purchase{k="a"}"""))
      val face = graft.operators.Downsample.rollupFace1h(spark, dir, "base")
      assert(face.filter($"name" === "purchase" && $"label_k" === "a")
        .count() === 0, "rebuilt face excludes the tombstoned series")
      assert(face.filter($"name" === "purchase" && $"label_k" === "b")
        .count() > 0)
    } finally Admin.reset(spark, dir)
  }

  test("snapshot writes the tombstone-respecting head and the rollup faces") {
    val dir = freshDir
    val server = QueryEndpoint.start(spark, dir)
    val port = server.getAddress.getPort
    try {
      Admin.deleteSeries(spark, dir, Seq("""purchase{k="a"}"""))
      val (code, body) = post(port, "/api/v1/admin/tsdb/snapshot")
      assert(code === 200 && body.startsWith(
        """{"status":"success","data":{"name":""""))
      val name = body.split("\"name\":\"")(1).stripSuffix("\"}}")
      val head = spark.read.parquet(s"$name/head")
      assert(head.filter($"name" === "purchase" && $"label_k" === "a")
        .count() === 0, "snapshot respects pending tombstones")
      assert(head.count() ===
        graft.operators.Metrics.metricEvents(spark, dir).count())
      graft.operators.Downsample.RollupFaces.foreach { f =>
        assert(new java.io.File(s"$name/face_$f").exists())
      }
      // the snapshot head re-seeds an engine: silver-schema round trip
      assert(head.columns.toSeq === Seq("ts", "name", "label_k",
        "label_instance", "kind", "value", "event_id"))
    } finally { Admin.reset(spark, dir); server.stop(0) }
  }

  test("delete_series invalidates a resultsCache frontend: warm chunks never serve tombstoned samples") {
    // 15 days of hourly samples: the frontend's 240-instant chunks are
    // COMPLETE (cacheable) for a day-1 request at a 1h step
    val dir = fixture("events" -> (0 until 361).map { i =>
      ev(i.toLong, i * 3600000L, "purchase", 1.0 + (i % 7),
        if (i % 2 == 0) "a" else "b")
    }.toDF(eventCols: _*))
    val fronted = QueryEndpoint.start(spark, dir, resultsCache = true)
    val plain = QueryEndpoint.start(spark, dir)
    val port = fronted.getAddress.getPort
    try {
      graft.promql.ResultsCache.clear()
      val s = T0
      val e = T0 + dayS
      val path = s"/api/v1/query_range?query=${enc("sum by (k) (purchase)")}" +
        s"&start=$s&end=$e&step=1h"
      val before = get(port, path)._2
      assert(get(port, path)._2 === before, "warm repeat, pre-delete")
      val (h0, m0) = graft.promql.ResultsCache.stats
      assert(h0 > 0, "the repeat must have hit the cache")

      val (code, _) = post(port,
        s"/api/v1/admin/tsdb/delete_series?match[]=${enc("""purchase{k="a"}""")}")
      assert(code === 204)
      // the warm frontend must now answer like an uncached server —
      // tombstone-filtered, not the stale pre-delete chunks
      val want = get(plain.getAddress.getPort, path)._2
      assert(want !== before, "the delete must change the answer")
      assert(get(port, path)._2 === want,
        "a cached frontend served stale tombstoned chunks after delete_series")
      assert(graft.promql.ResultsCache.stats._2 > m0,
        "the delete must force chunk recomputation")
    } finally { Admin.reset(spark, dir); fronted.stop(0); plain.stop(0) }
  }
}
