package graft

import graft.model.Stale
import graft.operators.Downsample
import graft.plans.StaleExprs
import graft.sources.{ScrapeEndpoint, ScrapeLoop}
import graft.streaming.{ExpositionRegistry, MetricStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** STALENESS MARKERS as first-class citizens ([[graft.model.Stale]]):
  *
  *  - the engine EMITS upstream's exact reserved quiet-NaN bit
  *    pattern, asserted here on the RAW BITS over the live scrape
  *    tier (an independent walker, so the convention can never
  *    self-confirm); DETECTION is any-NaN because Spark's parquet
  *    writer canonicalizes NaN payloads (pinned here too);
  *  - rollups exclude markers from every value field and carry the
  *    marker anchor as `stale_at` (batch ≡ streaming, field for
  *    field);
  *  - range functions (`max_over_time`, …) never see markers — a
  *    window crossing a staleness point serves the PRE-STALE values,
  *    never NaN;
  *  - instant reads (raw union path, dense grid, pyramid LWW) CUT a
  *    series whose latest event is a marker, and a newer real sample
  *    revives it — on both the raw and rollup-served tiers, which
  *    must agree bit-for-bit.
  */
class StalenessSpec extends SparkTestBase {
  import spark.implicits._

  private val H = 3600000L
  // epoch seconds of the fixture's t0 (2024-01-01 00:00:00 UTC)
  private val T0 = 1704067200L

  /** signup (gauge): series a samples at 01:30 (10.0) and 03:30 (20.0),
    * then a STALENESS MARKER at 05:30; series b samples at 01:30 (5.0)
    * and 09:30 (7.0).
    */
  private def staleRows = Seq(
    ev(1, 1 * H + 1800000L, "signup", 10.0, "a"),
    ev(2, 3 * H + 1800000L, "signup", 20.0, "a"),
    ev(5, 5 * H + 1800000L, "signup", Stale.Marker, "a"),
    ev(3, 1 * H + 1800000L, "signup", 5.0, "b"),
    ev(4, 9 * H + 1800000L, "signup", 7.0, "b"))

  test("marker detection, emission bits, and the parquet canonicalization that fixes the convention") {
    // batch encoder rows preserve what the engine emits bit-exact
    val live = Seq((1L, Stale.Marker)).toDF("id", "value")
      .as[(Long, Double)].head()._2
    assert(java.lang.Double.doubleToRawLongBits(live) === Stale.Bits)
    // DURABLE tier: Spark's parquet writer canonicalizes the payload —
    // the empirical fact that forces any-NaN detection ([[Stale]] doc);
    // if this ever starts passing bit-exact, the convention can tighten
    val dir = fixture("events" -> staleRows.toDF(eventCols: _*))
    val onDisk = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_id") === 5L)
      .select(col("value"),
        StaleExprs.isStaleC(col("value")).as("st"))
      .as[(Double, Boolean)].head()
    assert(java.lang.Double.doubleToRawLongBits(onDisk._1) !== Stale.Bits,
      "parquet canonicalized the payload (the documented platform fact)")
    assert(onDisk._2, "detection still catches the round-tripped marker")
    assert(Stale.isMarker(Stale.Marker) && Stale.isMarker(Double.NaN))
    assert(!Stale.isMarker(1.5))
    // a null value is not a marker (Spark's isnan is false on null)
    val n = Seq((1L, Option.empty[Double])).toDF("id", "value")
      .select(StaleExprs.isStaleC(col("value"))).head()
    assert(!n.getBoolean(0))
  }

  test("rollups exclude markers from value fields and carry stale_at; compaction merges it") {
    val dir = fixture("events" -> staleRows.toDF(eventCols: _*))
    val h1 = Downsample.rollupRaw(spark, dir, 3600L)
      .filter(col("name") === "signup")
    val byBucket = h1.collect().map { r =>
      (r.getString(r.fieldIndex("label_k")),
        r.getLong(r.fieldIndex("bucket_s"))) -> r
    }.toMap
    // series a, hour-01 bucket: one real sample, untouched by staleness
    val a1 = byBucket(("a", T0 + 1 * 3600L))
    assert(a1.getLong(a1.fieldIndex("cnt")) === 1L)
    assert(a1.getDouble(a1.fieldIndex("vlast")) === 10.0)
    assert(a1.isNullAt(a1.fieldIndex("stale_at")))
    // series a, hour-05 bucket: ONLY the marker — no samples to serve,
    // null value fields, the marker anchor carried for the instant tier
    val a5 = byBucket(("a", T0 + 5 * 3600L))
    assert(a5.getLong(a5.fieldIndex("cnt")) === 0L)
    assert(a5.isNullAt(a5.fieldIndex("vmax")))
    assert(a5.isNullAt(a5.fieldIndex("vlast")))
    assert(a5.isNullAt(a5.fieldIndex("last_at")))
    assert(!a5.isNullAt(a5.fieldIndex("stale_at")))
    // compaction to 6h: the 00:00–06:00 bucket folds a's two samples
    // AND the marker — value fields see only the samples; stale_at
    // out-anchors last_at, so the instant tier will cut here
    val c6 = Downsample.compact(h1, 21600L)
      .filter(col("name") === "signup" && col("label_k") === "a" &&
        col("bucket_s") === T0)
      .collect().head
    assert(c6.getLong(c6.fieldIndex("cnt")) === 2L)
    assert(c6.getDouble(c6.fieldIndex("vmax")) === 20.0)
    assert(c6.getDouble(c6.fieldIndex("vlast")) === 20.0)
    val lastAt = c6.getStruct(c6.fieldIndex("last_at"))
    val staleAt = c6.getStruct(c6.fieldIndex("stale_at"))
    assert(staleAt.getLong(0) > lastAt.getLong(0),
      "the marker out-anchors the last real sample")
  }

  test("instant reads cut at the marker on every tier; range windows serve pre-stale values") {
    val dir = fixture("events" -> staleRows.toDF(eventCols: _*))

    def series(json: String, k: String): Option[Double] = {
      // one vector element: {"metric":{..."k":"<k>"...},"value":[t,"v"]}
      val m = ("\"k\":\"" + k + "\"[^\\]]*?\"value\":\\[[-0-9.eE]+,\"([-0-9.eE]+)\"").r
      m.findFirstMatchIn(json).map(_.group(1).toDouble)
    }
    // RAW UNION instant read at the corpus instant (09:30): a's latest
    // event is the 05:30 marker — absent; b serves its 09:30 sample
    val atT = graft.promql.Api.queryJson(spark, dir, "signup")
    assert(series(atT, "a") === None, "marker-latest series is cut")
    assert(series(atT, "b") === Some(7.0))
    // pinned before the marker (04:00): a serves its 03:30 sample
    val at4 = graft.promql.Api.queryJson(spark, dir, "signup",
      timeS = Some(T0 + 4 * 3600L))
    assert(series(at4, "a") === Some(20.0))
    assert(series(at4, "b") === Some(5.0))

    // DENSE GRID (query_range): hourly instants 02:00 … 09:00 — a is
    // present until the marker (02:00–05:00) and absent after;
    // b is present throughout
    val grid = graft.promql.Compiler.rangeGridEval(spark, dir,
        graft.promql.Parser.parse("signup"),
        T0 + 2 * 3600L, T0 + 9 * 3600L, 3600L)
      .get.select(col("label_k"), col("t_s"), col("value"))
      .as[(String, Long, Double)].collect().toSet
    val aInstants = grid.filter(_._1 == "a").map(r => (r._2 - T0) / 3600L)
    assert(aInstants === Set(2L, 3L, 4L, 5L),
      "a is cut from the 06:00 instant on (marker at 05:30)")
    assert(grid.filter(_._1 == "b").map(r => (r._2 - T0) / 3600L) ===
      (2L to 9L).toSet)
    assert(grid.filter(r => r._1 == "a" && (r._2 - T0) / 3600L >= 4L)
      .forall(_._3 === 20.0))

    // PYRAMID LWW (rollup-served): the same four 2h-step instants must
    // agree with the raw grid bit-for-bit — the 04:00–06:00 bucket
    // holds only the marker, so its token cuts 06:00 and 08:00
    val pyr = graft.promql.Pyramid.queryRangeAligned(spark, dir,
        "signup", 4, 7200L)
      .select(col("label_k"), col("t_s"), col("value"))
      .as[(String, Long, Double)].collect().toSet
    val gridAt2h = grid.filter(r => (r._2 - T0) % 7200L == 0 &&
      r._2 >= T0 + 2 * 3600L && r._2 <= T0 + 8 * 3600L)
    assert(pyr === gridAt2h, "pyramid ≡ raw grid under markers")
    assert(pyr.filter(_._1 == "a").map(r => (r._2 - T0) / 3600L) ===
      Set(2L, 4L))

    // RANGE functions never see markers: a 6h max_over_time window
    // crossing the staleness point serves the PRE-STALE max, never NaN
    // — rollup-served and raw paths alike
    val mot = graft.promql.Pyramid.queryRangeAligned(spark, dir,
        "max_over_time(signup[21600s])", 1, 21600L)
      .select(col("label_k"), col("value"))
      .as[(String, Double)].collect().toMap
    assert(mot("a") === 20.0, "pre-stale max, not NaN")
    assert(mot("b") === 5.0)
    val motRaw = graft.promql.Api.queryJson(spark, dir,
      "max_over_time(signup[6h])", timeS = Some(T0 + 6 * 3600L))
    assert(series(motRaw, "a") === Some(20.0))
    assert(series(motRaw, "b") === Some(5.0))
  }

  test("streaming rollup ≡ batch rollup under markers, field for field") {
    implicit val sqlCtx = spark.sqlContext
    // sentinels close every fixture bucket (append mode emits closed
    // windows only); excluded from the law by family
    val sentinels = Seq(ev(98, 100 * H, "click", 1.0, "z"),
      ev(99, 101 * H, "click", 1.0, "z"))
    val rows = staleRows ++ sentinels
    val dir = fixture("events" -> rows.toDF(eventCols: _*))
    val mem = MemoryStream[RawEvent]
    val out = MetricStream.streamingRollup(mem.toDF(), "2 minutes")
    val q = out.writeStream.format("memory").queryName("stale_roll")
      .outputMode(OutputMode.Append).start()
    try {
      def re(t: (Long, java.sql.Timestamp, Long, String, Double, String)) =
        RawEvent(t._1, t._2, t._3, t._4, t._5, t._6)
      mem.addData(staleRows.map(re): _*)
      q.processAllAvailable()
      mem.addData(re(sentinels(0)))
      q.processAllAvailable()
      mem.addData(re(sentinels(1)))
      q.processAllAvailable()
      val streamed = spark.table("stale_roll")
        .filter(col("name") =!= "click").collect().map(_.toSeq).toSet
      val batch = Downsample.rollupRaw(spark, dir, 3600L)
        .filter(col("name") =!= "click").collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming gauge eval cuts a marker-latest series; a newer sample revives it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = graft.promql.Engine.evalStream(mem.toDF(), "sum by (k) (signup)")
    val q = out.writeStream.format("memory").queryName("stale_eval")
      .outputMode(OutputMode.Update).start()
    def at(h: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + h * H)
    def rows() = spark.table("stale_eval")
      .as[(String, Option[Double])].collect().toSeq
    try {
      mem.addData(RawEvent(1, at(1), 1L, "signup", 10.0, """{"k": "a"}"""),
        RawEvent(2, at(1), 1L, "signup", 5.0, """{"k": "b"}"""))
      q.processAllAvailable()
      assert(rows().contains(("a", Some(10.0))) &&
        rows().contains(("b", Some(5.0))))
      // the marker out-anchors a's sample: the group updates to NULL —
      // Update mode's absence marker (no NaN ever reaches the sink)
      mem.addData(RawEvent(3, at(2), 1L, "signup",
        Stale.Marker, """{"k": "a"}"""))
      q.processAllAvailable()
      assert(rows().contains(("a", None)), "cut series retracts via null")
      assert(!rows().exists(r => r._2.exists(_.isNaN)), "no NaN serves")
      // a newer real sample revives the series
      mem.addData(RawEvent(4, at(3), 1L, "signup", 4.0, """{"k": "a"}"""))
      q.processAllAvailable()
      assert(rows().contains(("a", Some(4.0))))
    } finally q.stop()
  }

  test("a scraped mid-window vanish flows marker-clean through streamingRollup") {
    ExpositionRegistry.clear()
    Seq(MetricStream.SeriesTotal("purchase", "a", 5.5, 3),
      MetricStream.SeriesTotal("purchase", "b", 4.0, 1))
      .foreach(ExpositionRegistry.publish)
    val server = ScrapeEndpoint.start()
    val port = server.getAddress.getPort
    try {
      val loop = new ScrapeLoop(spark, s"http://127.0.0.1:$port/metrics")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:01").getTime
      val q = MetricStream.streamingRollup(loop.events)
        .writeStream.format("memory").queryName("vanish_roll")
        .outputMode(OutputMode.Update).start()
      try {
        loop.poll(t1)
        q.processAllAvailable()
        // b vanishes from the exposition — the next tick closes it
        // with a marker INSIDE the same 1h bucket
        ExpositionRegistry.clear()
        ExpositionRegistry.publish(
          MetricStream.SeriesTotal("purchase", "a", 9.0, 4))
        loop.poll(t1 + 60000L)
        q.processAllAvailable()
        val rows = spark.table("vanish_roll")
          .filter(col("name") === "purchase")
          .select(col("label_k"), col("cnt"), col("vmax"), col("vlast"),
            col("stale_at").isNotNull.as("has_marker"))
          .as[(String, Long, Double, Double, Boolean)].collect()
        // latest state update per series: ties on cnt break toward the
        // marker-carrying update (Update-mode sink keeps history)
        def latest(k: String) = rows.filter(_._1 == k)
          .maxBy(r => (r._2, r._5))
        val b = latest("b")
        // the vanished series' bucket: the marker is NOT a sample —
        // cnt stays 1, vmax/vlast keep the PRE-STALE value (the old
        // untagged path served NaN here) — and the anchor is carried
        assert(b._2 === 1L)
        assert(b._3 === 4.0 && b._4 === 4.0)
        assert(b._5, "the marker anchor rides the bucket")
        val a = latest("a")
        assert(a._2 === 2L && a._4 === 9.0 && !a._5)
        // (that the raw marker reaches events-relation consumers as NaN
        // is pinned by ScrapeClientSpec's staleness test — a second
        // query over the same MemoryStreams here would race the first
        // query's batch commits)
      } finally q.stop()
    } finally server.stop(0)
  }
}
