package graft

import graft.streaming.{ExpositionRegistry, MetricStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics (SURVEY.md §5.5): watermark drops late samples,
  * running keyed state matches the batch snapshot, the serving sink
  * exposes the current snapshot to concurrent readers.
  */
// Raw events-schema row fed through the same adapter as batch.
// Top-level and public: encoder case classes must not be private (generated
// SafeProjection code can't access them) nor inner (no outer scope at
// deserialization time).
case class RawEvent(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String, value: Double, props: String)

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def raw(id: Long, minute: Int, value: Double, label: String = "s") =
    RawEvent(id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"),
      1L, "click", value, s"""{"k": "$label"}""")

  test("windowed totals aggregate per tumbling window; late data beyond watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = MetricStream.windowedCounterTotals(mem.toDF(), "1 minute", "2 minutes")
    val q = out.writeStream.format("memory").queryName("win_totals")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(raw(0, 10, 1.0), raw(1, 10, 2.0))
      q.processAllAvailable()
      // advance event time far past the 10:10 window + 2min watermark
      mem.addData(raw(2, 30, 5.0))
      q.processAllAvailable()
      // late sample for the long-closed 10:10 window: must be dropped
      mem.addData(raw(3, 10, 100.0))
      q.processAllAvailable()
      val rows = spark.table("win_totals")
        .groupBy("window_start").sum("total")
        .as[(java.sql.Timestamp, Double)].collect().toMap
      val w10 = java.sql.Timestamp.valueOf("2024-01-01 10:10:00")
      val w30 = java.sql.Timestamp.valueOf("2024-01-01 10:30:00")
      assert(rows(w10) === 3.0) // 1+2, the late 100.0 never lands
      assert(rows(w30) === 5.0)
    } finally q.stop()
  }

  test("the rule loop as a stream: emitted samples ≡ the batch lattice") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.element_at
    // a 10-minute recording rule over three click events; anchor = the
    // latest event (the batch corpus instant), lattice 10:10 … 10:40.
    // a is born ON an instant, b between instants; a is quiet across
    // the middle instants (timeout repeats), b across the tail
    val rows = Seq(
      raw(0, 10, 1.5, "a"), raw(1, 40, 2.25, "a"), raw(2, 11, 4.0, "b"))
    val dir = fixture("events" -> rows.toDF())
    val rule = graft.promql.Rules.RecordingRule("k_click10m",
      "sum by (k) (click)", intervalS = 600)
    val want = graft.promql.Rules.recordedSeriesRelation(spark, dir, rule)
      .select(element_at($"labels", "k"), $"ts_ms", $"value")
      .as[(String, Long, Double)].collect().toSeq.sorted
    assert(want.size === 7, "4 instants for a + 3 for b")
    val anchorMs = rows.map(_.ts.getTime).max
    val mem = MemoryStream[RawEvent]
    val out = MetricStream.streamingRuleLoop(mem.toDF(), "k_click10m",
      "click", 600000L, anchorMs)
    val q = out.writeStream.format("memory").queryName("rule_loop")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(rows(0), rows(2))
      q.processAllAvailable()
      // the second batch advances the watermark to 10:40 — everything
      // strictly before it closes
      mem.addData(rows(1))
      q.processAllAvailable()
      // two sentinel batches of ANOTHER family: the first pushes event
      // time past the anchor, the second fires the event-time timeouts
      // that close the remaining instants — quiet-group repeats
      // included, no click traffic needed
      mem.addData(raw(7, 55, 1.0, "zz").copy(event_type = "noise"))
      q.processAllAvailable()
      mem.addData(raw(8, 58, 1.0, "zz").copy(event_type = "noise"))
      q.processAllAvailable()
      val got = spark.table("rule_loop")
        .as[MetricStream.RuleSample].collect().toSeq
        .map(s => (s.label_k, s.ts_ms, s.value)).sorted
      assert(got === want, "stream ≡ batch for the rule lattice")
    } finally q.stop()
  }

  test("a 2-rule file (counter + gauge) as ONE stream ≡ the batch lattice") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.element_at
    // counter rule over click (running cents) + gauge rule over signup
    // (per-series LWW summed through DECIMAL(38,12)) in ONE stream.
    // signup a has TWO instances (user 1: 5.0 → 7.5 mid-lattice;
    // user 2: 2.5), so the gauge group value is a real multi-series
    // LWW sum, not a single latest
    val clicks = Seq(
      raw(0, 10, 1.5, "a"), raw(1, 40, 2.25, "a"), raw(2, 11, 4.0, "b"))
    val sigs = Seq(
      raw(3, 10, 5.0, "a").copy(event_type = "signup"),
      raw(4, 25, 7.5, "a").copy(event_type = "signup"),
      raw(5, 15, 2.5, "a").copy(event_type = "signup", user_id = 2L),
      raw(6, 11, 3.25, "b").copy(event_type = "signup"))
    val rows = clicks ++ sigs
    val dir = fixture("events" -> rows.toDF())
    val batchRules = Seq(
      graft.promql.Rules.RecordingRule("k_click10m",
        "sum by (k) (click)", intervalS = 600),
      graft.promql.Rules.RecordingRule("k_sig10m",
        "sum by (k) (signup)", intervalS = 600))
    val want = batchRules.flatMap { r =>
      graft.promql.Rules.recordedSeriesRelation(spark, dir, r)
        .select(element_at($"labels", "__name__"),
          element_at($"labels", "k"), $"ts_ms", $"value")
        .as[(String, String, Long, Double)].collect().toSeq
    }.sorted
    val anchorMs = rows.map(_.ts.getTime).max
    val mem = MemoryStream[RawEvent]
    val out = MetricStream.streamingRuleFile(mem.toDF(), Seq(
      MetricStream.StreamRule("k_click10m", "click", gauge = false, 600000L),
      MetricStream.StreamRule("k_sig10m", "signup", gauge = true, 600000L)),
      anchorMs)
    val q = out.writeStream.format("memory").queryName("rule_file")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(rows.filter(_.ts.getTime < anchorMs): _*)
      q.processAllAvailable()
      mem.addData(rows.filter(_.ts.getTime == anchorMs): _*)
      q.processAllAvailable()
      // sentinel batches of ANOTHER family close the tail instants via
      // event-time timeouts — quiet-group repeats included
      mem.addData(raw(7, 55, 1.0, "zz").copy(event_type = "noise"))
      q.processAllAvailable()
      mem.addData(raw(8, 58, 1.0, "zz").copy(event_type = "noise"))
      q.processAllAvailable()
      val got = spark.table("rule_file")
        .as[MetricStream.RuleSample].collect().toSeq
        .map(s => (s.record, s.label_k, s.ts_ms, s.value)).sorted
      assert(got === want, "stream ≡ batch for the 2-rule file")
    } finally q.stop()
  }

  test("running keyed state accumulates across batches like the batch snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = MetricStream.runningCounterTotals(mem.toDF())
    val q = out.writeStream.format("memory").queryName("run_totals")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(raw(0, 1, 1.5, "a"), raw(1, 2, 2.5, "a"), raw(2, 3, 4.0, "b"))
      q.processAllAvailable()
      mem.addData(raw(3, 4, 6.0, "a"))
      q.processAllAvailable()
      // the latest emitted row per series carries the all-time total
      val latest = spark.table("run_totals")
        .groupBy($"label_k").agg(org.apache.spark.sql.functions.max($"total"))
        .as[(String, Double)].collect().toMap
      assert(latest === Map("a" -> 10.0, "b" -> 4.0))
    } finally q.stop()
  }

  test("streaming gauge converges to last-write-wins under out-of-order delivery") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = MetricStream.runningGaugeLatest(mem.toDF()
      .withColumn("event_type", org.apache.spark.sql.functions.lit("signup")))
    val q = out.writeStream.format("memory").queryName("gauge_latest")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(raw(0, 10, 5.0), raw(1, 20, 9.0))
      q.processAllAvailable()
      mem.addData(raw(2, 15, 100.0)) // out-of-order: older than the held ts
      q.processAllAvailable()
      val latest = spark.table("gauge_latest")
        .orderBy($"tsUs".desc).select($"value").as[Double].collect()
      assert(latest.head === 9.0) // the stale 100.0 never wins
    } finally q.stop()
  }

  test("streaming histogram buckets match the batch aggregator semantics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = MetricStream.runningHistogram(mem.toDF()
      .withColumn("event_type", org.apache.spark.sql.functions.lit("error")))
    val q = out.writeStream.format("memory").queryName("hist_state")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(raw(0, 1, 0.5), raw(1, 2, 3.0))
      q.processAllAvailable()
      mem.addData(raw(2, 3, 200.0)) // overflow: beyond last boundary
      q.processAllAvailable()
      val last = spark.table("hist_state").orderBy($"n".desc).limit(1)
        .select($"counts", $"sumCents", $"n")
        .as[(Seq[Long], Long, Long)].head()
      assert(last._1 === Seq(1L, 1L, 0L, 0L, 0L, 0L, 0L)) // 0.5→le1, 3.0→le5, 200 overflow
      assert(last._2 === 20350L)
      assert(last._3 === 3L)
    } finally q.stop()
  }

  test("streaming session windows emit closed sessions that match batch output") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    // gap 30 min: 10:00+10:10 merge, 11:30 opens a second session
    val sessionRows = Seq(raw(0, 0, 1.0), raw(1, 10, 2.0))
    val laterRows = Seq(RawEvent(2, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"),
      1L, "click", 4.0, """{"k": "s"}"""))
    // sentinel far in the future advances the watermark (2h) past both
    // sessions' ends so Append emits them; its own session stays open
    val sentinel = Seq(RawEvent(9, java.sql.Timestamp.valueOf("2024-01-01 20:00:00"),
      1L, "click", 0.0, """{"k": "t"}"""))
    val out = MetricStream.sessionizedCounts(mem.toDF())
    val q = out.writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(sessionRows: _*)
      q.processAllAvailable()
      mem.addData(laterRows: _*)
      q.processAllAvailable()
      mem.addData(sentinel: _*)
      q.processAllAvailable()
      val streamed = spark.table("sess_win")
        .select($"session_start", $"session_end", $"label_k", $"n_events", $"total")
        .as[(java.sql.Timestamp, java.sql.Timestamp, String, Long, Double)]
        .collect().toSet
      // batch parity: the SAME function over the same rows as a static DF,
      // restricted to sessions the watermark had closed
      val static = (sessionRows ++ laterRows ++ sentinel).toDF()
      val batch = MetricStream.sessionizedCounts(static)
        .filter($"session_end" <= java.sql.Timestamp.valueOf("2024-01-01 18:00:00"))
        .select($"session_start", $"session_end", $"label_k", $"n_events", $"total")
        .as[(java.sql.Timestamp, java.sql.Timestamp, String, Long, Double)]
        .collect().toSet
      assert(streamed === batch)
      assert(streamed.map(r => (r._3, r._4, r._5)) ===
        Set(("s", 2L, 3.0), ("s", 1L, 4.0)))
    } finally q.stop()
  }

  test("serving sink exposes the scrape snapshot while the query runs") {
    implicit val sqlCtx = spark.sqlContext
    ExpositionRegistry.clear()
    val mem = MemoryStream[RawEvent]
    val q = MetricStream.startServingSink(
      MetricStream.runningCounterTotals(mem.toDF()), "serving_test")
    try {
      mem.addData(raw(0, 1, 3.0, "x"), raw(1, 2, 4.0, "x"), raw(2, 3, 9.0, "y"))
      q.processAllAvailable()
      val snap = ExpositionRegistry.snapshot(spark)
        .select($"label_k", $"total").as[(String, Double)].collect().toMap
      assert(snap === Map("x" -> 7.0, "y" -> 9.0))
    } finally {
      q.stop()
      ExpositionRegistry.clear()
    }
  }

  test("streaming holt_winters equals the batch fold after the same samples") {
    implicit val sqlCtx = spark.sqlContext
    def g(id: Long, minute: Int, value: Double) =
      RawEvent(id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"),
        1L, "signup", value, """{"k": "hw"}""")
    val samples = Seq(1.0, 4.0, 2.0, 8.0, 5.0)
    val mem = MemoryStream[RawEvent]
    val out = MetricStream.runningHoltWinters(mem.toDF())
    val q = out.writeStream.format("memory").queryName("hw_test")
      .outputMode(OutputMode.Update).start()
    try {
      // ordered delivery split across micro-batches
      mem.addData(g(0, 0, samples(0)), g(1, 1, samples(1)))
      q.processAllAvailable()
      mem.addData(g(2, 2, samples(2)), g(3, 3, samples(3)), g(4, 4, samples(4)))
      q.processAllAvailable()
      val streamed = spark.table("hw_test").orderBy($"n".desc)
        .select($"smoothed").as[Double].head()
      // batch operator over the identical events
      val dir = fixture("events" -> samples.zipWithIndex.map { case (v, i) =>
        ev(i.toLong, i * 60000L, "signup", v, "hw")
      }.toDF(eventCols: _*))
      val batch = graft.operators.PromQL.holtWinters(spark, dir)
        .select($"smoothed").as[Double].head()
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming rollup maintains the pyramid's 1h level bit-identically to batch") {
    implicit val sqlCtx = spark.sqlContext
    val H = 3600000L
    val rows = Seq(
      ev(1, 0L, "purchase", 1.5, "a"),
      ev(3, 600000L, "purchase", 2.0, "a"),
      ev(2, 600000L, "purchase", 7.0, "a"), // the (ts, event_id) tie
      ev(4, 5 * H + 1000L, "purchase", 0.25, "a"),
      ev(5, 2 * H, "error", 42.0, "b"),
      ev(6, 3 * H, "signup", 10.0, "a"))
    // far-future sentinels advance the watermark so every fixture
    // bucket CLOSES (append mode emits only closed windows); their own
    // open bucket is excluded from the law below
    val sentinels = Seq(ev(98, 100 * H, "click", 1.0, "z"),
      ev(99, 101 * H, "click", 1.0, "z"))
    val dir = fixture("events" -> (rows ++ sentinels).toDF(eventCols: _*))
    val mem = MemoryStream[RawEvent]
    val out = graft.streaming.MetricStream.streamingRollup(mem.toDF(), "2 minutes")
    val q = out.writeStream.format("memory").queryName("roll_stream")
      .outputMode(OutputMode.Append).start()
    try {
      def re(t: (Long, java.sql.Timestamp, Long, String, Double, String)) =
        RawEvent(t._1, t._2, t._3, t._4, t._5, t._6)
      // out-of-order delivery across micro-batches: the hour-0 tie
      // arrives split, the hour-5 sample arrives before hour-2's
      mem.addData(re(rows(0)), re(rows(1)))
      q.processAllAvailable()
      mem.addData(re(rows(3)), re(rows(2)), re(rows(4)), re(rows(5)))
      q.processAllAvailable()
      mem.addData(re(sentinels(0)))
      q.processAllAvailable()
      mem.addData(re(sentinels(1)))
      q.processAllAvailable()
      val streamed = spark.table("roll_stream")
        .filter(org.apache.spark.sql.functions.col("name") =!= "click")
      val batch = graft.operators.Downsample.rollupRaw(spark, dir, 3600L)
        .filter(org.apache.spark.sql.functions.col("name") =!= "click")
      assert(streamed.columns.toSeq === batch.columns.toSeq)
      val sRows = streamed.collect().map(_.toSeq).toSet
      val bRows = batch.collect().map(_.toSeq).toSet
      assert(sRows === bRows)
      assert(bRows.nonEmpty)
      // the streamed level feeds compaction exactly like the batch one:
      // coarser pyramid levels never re-read raw events
      val cS = graft.operators.Downsample.compact(streamed, 86400L)
        .collect().map(_.toSeq).toSet
      val cB = graft.operators.Downsample.compact(batch, 86400L)
        .collect().map(_.toSeq).toSet
      assert(cS === cB)
    } finally q.stop()
  }

  test("streaming block segments serve the pyramid after restart: append-only + merged view") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Downsample
    val H = 3600000L
    // event times non-decreasing across batches (the watermark contract
    // a live scrape/push stream obeys); the 00:10/00:12 pair updates
    // ONE bucket across two batches, producing a superseded segment
    val rows = Seq(
      ev(1, 10 * 60000L, "purchase", 1.5, "a"),
      ev(2, 12 * 60000L, "purchase", 2.0, "a"),
      ev(3, 5 * H + 600000L, "purchase", 0.25, "b"),
      ev(4, 7 * H, "signup", 10.0, "a"))
    val dir = fixture("events" -> rows.toDF(eventCols: _*))
    val blockDir = java.nio.file.Files
      .createTempDirectory("graft_stream_blocks").toString + "/blocks"
    val mem = MemoryStream[RawEvent]
    val q = MetricStream.streamingBlocks(
      MetricStream.streamingRollup(mem.toDF(), "2 minutes"), blockDir)
    def re(t: (Long, java.sql.Timestamp, Long, String, Double, String)) =
      RawEvent(t._1, t._2, t._3, t._4, t._5, t._6)
    try {
      // three micro-batches; the hour-0 bucket's state updates twice,
      // so the directory holds a SUPERSEDED segment row
      mem.addData(re(rows(0)))
      q.processAllAvailable()
      mem.addData(re(rows(1)), re(rows(2)))
      q.processAllAvailable()
      mem.addData(re(rows(3)))
      q.processAllAvailable()
    } finally q.stop()
    val segments = spark.read.parquet(blockDir)
    val view = MetricStream.blocksView(spark, blockDir)
    assert(segments.count() > view.count(),
      "append-only segments keep superseded state; the view merges it away")
    // the merged view IS the batch rollup, field for field
    val batch = Downsample.rollupRaw(spark, dir, 3600L)
    assert(view.columns.toSeq === batch.columns.toSeq)
    assert(view.collect().map(_.toSeq).toSet ===
      batch.collect().map(_.toSeq).toSet)
    // the restart: in-memory faces gone, the router serves the STREAMED
    // segments and answers exactly like the raw-events dense grid
    Downsample.evictRollups(spark, dir)
    Downsample.seedRollup(spark, dir, "base", view)
    val routedBefore = try {
      val query = "sum by (k) (increase(purchase[6h]))"
      val routed = graft.promql.Pyramid
        .queryRangeAligned(spark, dir, query, 4, 21600L)
        .collect().map(_.toSeq).toSet
      val t = graft.promql.Compiler.instantSeconds(spark, dir).toLong
      val endS = t / 21600L * 21600L
      val grid = graft.promql.Compiler.rangeGridEval(spark, dir,
          graft.promql.Parser.parse(query), endS - 3 * 21600L, endS, 21600L)
        .get.collect().map(_.toSeq).toSet
      assert(routed === grid)
      assert(routed.nonEmpty)
      routed
    } finally Downsample.evictRollups(spark, dir)
    // LSM COMPACTION: the directory rewrites as its own merged view —
    // superseded segments fold away, answers do not move
    val viewCount = view.count() // BEFORE the swap (stale listings after)
    val (segsBefore, segsAfter) =
      graft.tools.CompactBlocks.run(spark, blockDir)
    assert(segsBefore > segsAfter, "compaction folded the superseded segment")
    assert(segsAfter === viewCount)
    val viewAfter = MetricStream.blocksView(spark, blockDir)
    assert(viewAfter.collect().map(_.toSeq).toSet ===
      batch.collect().map(_.toSeq).toSet, "compaction changed no state")
    Downsample.seedRollup(spark, dir, "base", viewAfter)
    try {
      val routed = graft.promql.Pyramid.queryRangeAligned(spark, dir,
          "sum by (k) (increase(purchase[6h]))", 4, 21600L)
        .collect().map(_.toSeq).toSet
      assert(routed === routedBefore, "answers moved under compaction")
    } finally Downsample.evictRollups(spark, dir)
    // RETENTION: keep only buckets at/after hour 5 — the hour-0 state
    // retires, the kept buckets survive byte-identically
    val keepFrom = batch.agg(org.apache.spark.sql.functions
      .max(org.apache.spark.sql.functions.col("bucket_s"))).head.getLong(0)
    graft.tools.CompactBlocks.run(spark, blockDir, keepFrom)
    val retained = MetricStream.blocksView(spark, blockDir)
    assert(retained.select("bucket_s").distinct().as[Long].collect()
      .forall(_ >= keepFrom))
    assert(retained.collect().map(_.toSeq).toSet ===
      batch.filter(org.apache.spark.sql.functions.col("bucket_s") >= keepFrom)
        .collect().map(_.toSeq).toSet)
  }

  test("streaming dedup drops replayed event_ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = MetricStream.dedupedEvents(mem.toDF(), "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(raw(0, 1, 1.0), raw(1, 2, 2.0))
      q.processAllAvailable()
      // a retry redelivers event 1 in a later batch (within watermark),
      // plus one genuinely new event
      mem.addData(raw(1, 2, 2.0), raw(2, 3, 4.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select($"event_id")
        .as[Long].collect().sorted
      assert(ids.toSeq === Seq(0L, 1L, 2L))
    } finally q.stop()
  }

  test("streaming PromQL: the same query text runs continuously and converges to batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = graft.promql.Engine.evalStream(mem.toDF(),
      """sum by (k) (click{k!="z"}) > 2""")
    val q = out.writeStream.format("memory").queryName("promql_stream")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(raw(0, 1, 2.0, "a"), raw(1, 2, 1.0, "b"))
      q.processAllAvailable()
      mem.addData(raw(2, 3, 4.0, "a"), raw(3, 4, 9.0, "z")) // z filtered out
      q.processAllAvailable()
      // latest update per key = the running snapshot
      val snap = spark.table("promql_stream")
        .groupBy($"label_k").agg(org.apache.spark.sql.functions.max($"value").as("value"))
        .as[(String, Double)].collect().toMap
      assert(snap === Map("a" -> 6.0)) // b stays at 1.0, below the > 2 filter
      // batch evaluation over the identical events agrees
      val dir = fixture("events" -> Seq(
        ev(0, 60000, "click", 2.0, "a"), ev(1, 120000, "click", 1.0, "b"),
        ev(2, 180000, "click", 4.0, "a"), ev(3, 240000, "click", 9.0, "z")
      ).toDF(eventCols: _*))
      val batch = graft.promql.Engine.eval(spark, dir, """sum by (k) (click{k!="z"}) > 2""")
        .as[(String, Double)].collect().toMap
      assert(batch === snap)
    } finally q.stop()
  }

  test("streaming PromQL rejects batch-only constructs at compose time") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    def bad(q: String) = intercept[graft.promql.PromQLCompileException](
      graft.promql.Engine.evalStream(mem.toDF(), q))
    bad("purchase offset 1d")
    bad("purchase @ 1704067200")
    bad("purchase[5m]") // bare range: wrap in rate/increase
    bad("topk(2, purchase)")
    bad("error") // histogram: keyed-state operator, no scalar vector
  }

  test("streaming grammar fuzz: evalStream composes or raises only PromQL exceptions") {
    // compose-only contract (no query started): the streaming compiler
    // either builds an analyzed streaming DataFrame or rejects the text
    // with PromQLParse/CompileException — batch-only constructs must
    // never leak an AnalysisException out of plan construction.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val events = mem.toDF()
    val rnd = new scala.util.Random(813L)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    def sel() = {
      val n = pick(Seq("purchase", "click", "click", "signup", "signup",
        "purchase", "error", "nope"))
      val m = rnd.nextInt(6) match {
        case 0 | 1 => ""
        case 2 | 3 => s"""{k="a"}"""
        case 4 => s"""{k=~"a|b"}"""
        case _ => s"""{bogus=~"a|b"}"""
      }
      val off = rnd.nextInt(8) match {
        case 0 => " offset 1h"   // batch-only → compile error
        case 1 => " @ 1704067200" // batch-only → compile error
        case _ => ""
      }
      s"$n$m$off"
    }
    def q(depth: Int): String =
      if (depth <= 0) sel()
      else rnd.nextInt(8) match {
        case 0 => s"sum by (${pick(Seq("k", "k", "instance", "bogus"))}) (${q(depth - 1)})"
        case 1 => s"${pick(Seq("rate", "increase"))}(${sel()}[${pick(Seq("5m", "1h"))}])"
        case 2 => s"${pick(Seq("avg", "min", "max", "count"))} by (k) (rate(${sel()}[5m]))"
        case 3 => s"${q(depth - 1)} ${pick(Seq(">", "<", "*"))} ${pick(Seq("2", "0.5"))}"
        case 4 => s"histogram_quantile(0.9, ${sel()})"
        case 5 => s"topk(2, ${q(depth - 1)})"          // batch-only
        case 6 => s"quantile_over_time(0.5, ${sel()}[1h])" // batch-only
        case _ => s"${sel()}[5m]"                      // bare range: rejected
      }
    var ok = 0; var rejected = 0
    for (_ <- 1 to 80) {
      val text = q(2)
      try { graft.promql.Engine.evalStream(events, text); ok += 1 }
      catch {
        case _: graft.promql.PromQLParseException |
             _: graft.promql.PromQLCompileException => rejected += 1
        case e: Throwable =>
          fail(s"streaming query '$text' leaked ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(ok >= 10, s"only $ok/80 composed — generator too hostile")
    assert(rejected >= 10, s"only $rejected/80 rejected — generator too tame")
  }

  test("streaming PromQL gauge selector converges to the batch last-write-wins") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = graft.promql.Engine.evalStream(mem.toDF()
      .withColumn("event_type", org.apache.spark.sql.functions.lit("signup")), "signup")
    val q = out.writeStream.format("memory").queryName("promql_gauge")
      .outputMode(OutputMode.Update).start()
    try {
      // LATEST event-time value first, then stragglers out of order —
      // the running max_by must keep (ts, event_id)-max, not arrival-max
      mem.addData(raw(0, 30, 7.0, "a"))
      q.processAllAvailable()
      mem.addData(raw(1, 10, 99.0, "a"), raw(2, 20, 50.0, "a"))
      q.processAllAvailable()
      // every emitted update carries 7.0: the 10:30 sample wins on event
      // time in batch 1, and the stragglers never displace it — 99.0/50.0
      // must not appear in ANY update
      val updates = spark.table("promql_gauge")
        .select($"label_k", $"value").as[(String, Double)].collect().toSet
      assert(updates === Set(("a", 7.0)))
      val batchDir = fixture("events" -> Seq(
        ev(0, 30 * 60000, "signup", 7.0, "a"),
        ev(1, 10 * 60000, "signup", 99.0, "a"),
        ev(2, 20 * 60000, "signup", 50.0, "a")).toDF(eventCols: _*))
      val batch = graft.promql.Engine.eval(spark, batchDir, "signup")
        .select($"label_k", $"value").as[(String, Double)].collect().toSeq
      assert(batch === Seq(("a", 7.0)))
    } finally q.stop()
  }

  test("streaming histogram scalars converge to the batch instant values") {
    implicit val sqlCtx = spark.sqlContext
    // error is a histogram family; observations 2, 8, 30 on one series
    def run(query: String, sink: String): Set[(String, Double)] = {
      val mem = MemoryStream[RawEvent]
      val out = graft.promql.Engine.evalStream(mem.toDF()
        .withColumn("event_type", org.apache.spark.sql.functions.lit("error")), query)
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Update).start()
      try {
        mem.addData(raw(0, 10, 2.0, "a"), raw(1, 11, 8.0, "a"))
        q.processAllAvailable()
        mem.addData(raw(2, 12, 30.0, "a"))
        q.processAllAvailable()
        // every per-batch update, order-free: batch 1 sees {2, 8},
        // batch 2 folds in 30 — the running aggregate emits both states
        spark.table(sink).select($"label_k", $"value")
          .as[(String, Double)].collect().toSet
      } finally q.stop()
    }
    assert(run("histogram_count(error)", "s_hc") ===
      Set(("a", 2.0), ("a", 3.0)))
    assert(run("histogram_sum(error)", "s_hs") ===
      Set(("a", 10.0), ("a", 40.0)))
    assert(run("histogram_avg(error)", "s_ha") ===
      Set(("a", 5.0), ("a", 40.0 / 3.0)))
    // batch parity on the same samples
    val dir = fixture("events" -> Seq(
      ev(0, 0, "error", 2.0, "a"), ev(1, 60000, "error", 8.0, "a"),
      ev(2, 120000, "error", 30.0, "a")).toDF(eventCols: _*))
    val batch = graft.promql.Engine.eval(spark, dir, "histogram_avg(error)")
      .select($"label_k", $"value").as[(String, Double)].collect().toSeq
    assert(batch === Seq(("a", 40.0 / 3.0)))
  }

  test("streaming histogram_fraction converges to the batch interpolation bit-exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = graft.promql.Engine.evalStream(mem.toDF()
      .withColumn("event_type", org.apache.spark.sql.functions.lit("error")),
      "histogram_fraction(2.5, 75.5, error)")
    val q = out.writeStream.format("memory").queryName("s_hf")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(raw(0, 10, 2.0, "a"), raw(1, 11, 8.0, "a"), raw(2, 12, 30.0, "a"))
      q.processAllAvailable()
      val streamed = spark.table("s_hf").select($"label_k", $"value")
        .as[(String, Double)].collect().toSeq
      val dir = fixture("events" -> Seq(
        ev(0, 0, "error", 2.0, "a"), ev(1, 60000, "error", 8.0, "a"),
        ev(2, 120000, "error", 30.0, "a")).toDF(eventCols: _*))
      val batch = graft.promql.Engine.eval(spark, dir,
        "histogram_fraction(2.5, 75.5, error)")
        .select($"label_k", $"value").as[(String, Double)].collect().toSeq
      assert(streamed === batch) // identical IEEE interpolation both paths
    } finally q.stop()
  }

  test("streaming PromQL gauge aggregations reduce last-write-wins values, not raw observations") {
    implicit val sqlCtx = spark.sqlContext
    // two gauge series (k=a, k=b), each overwritten out of order: the
    // aggregate must fold the per-series LATEST (a→7, b→3), never the
    // raw observation stream (sum of all events would be 159)
    def feed(query: String, sink: String): Unit = {
      val mem = MemoryStream[RawEvent]
      val out = graft.promql.Engine.evalStream(mem.toDF()
        .withColumn("event_type", org.apache.spark.sql.functions.lit("signup")), query)
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Update).start()
      try {
        mem.addData(raw(0, 30, 7.0, "a"), raw(1, 25, 3.0, "b"))
        q.processAllAvailable()
        // stragglers behind each series' latest: must not displace
        mem.addData(raw(2, 10, 99.0, "a"), raw(3, 20, 50.0, "b"))
        q.processAllAvailable()
      } finally q.stop()
    }
    def last(sink: String): Double = spark.table(sink)
      .select($"value").as[Double].collect().last
    feed("sum(signup)", "g_sum"); assert(last("g_sum") === 10.0)
    feed("max(signup)", "g_max"); assert(last("g_max") === 7.0)
    feed("min(signup)", "g_min"); assert(last("g_min") === 3.0)
    feed("count(signup)", "g_cnt"); assert(last("g_cnt") === 2.0)
    feed("avg(signup)", "g_avg"); assert(last("g_avg") === 5.0)
    // batch evaluation over the identical events agrees
    val dir = fixture("events" -> Seq(
      ev(0, 30 * 60000, "signup", 7.0, "a"), ev(1, 25 * 60000, "signup", 3.0, "b"),
      ev(2, 10 * 60000, "signup", 99.0, "a"), ev(3, 20 * 60000, "signup", 50.0, "b")
    ).toDF(eventCols: _*))
    for ((q, want) <- Seq("sum(signup)" -> 10.0, "max(signup)" -> 7.0,
        "min(signup)" -> 3.0, "count(signup)" -> 2.0, "avg(signup)" -> 5.0)) {
      val batch = graft.promql.Engine.eval(spark, dir, q)
        .select($"value").as[Double].collect()
      assert(batch.toSeq === Seq(want), q)
    }
  }

  test("streaming PromQL counter min/max/avg/count reduce per-series running totals") {
    implicit val sqlCtx = spark.sqlContext
    // two counter series: a accumulates 1+2=3, b accumulates 9. count is
    // the SERIES count (2), max the larger TOTAL (9) — the raw-event
    // forms (count=3 events, max=9 single increment) happen to differ
    // on count and avg, which is what the totals buffer fixes
    def feed(query: String, sink: String): Unit = {
      val mem = MemoryStream[RawEvent]
      val out = graft.promql.Engine.evalStream(mem.toDF(), query)
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Update).start()
      try {
        mem.addData(raw(0, 1, 1.0, "a"), raw(1, 2, 9.0, "b"))
        q.processAllAvailable()
        mem.addData(raw(2, 3, 2.0, "a"))
        q.processAllAvailable()
      } finally q.stop()
    }
    def last(sink: String): Double = spark.table(sink)
      .select($"value").as[Double].collect().last
    feed("count(click)", "c_cnt"); assert(last("c_cnt") === 2.0)
    feed("max(click)", "c_max"); assert(last("c_max") === 9.0)
    feed("min(click)", "c_min"); assert(last("c_min") === 3.0)
    feed("avg(click)", "c_avg"); assert(last("c_avg") === 6.0)
    val dir = fixture("events" -> Seq(
      ev(0, 60000, "click", 1.0, "a"), ev(1, 120000, "click", 9.0, "b"),
      ev(2, 180000, "click", 2.0, "a")).toDF(eventCols: _*))
    for ((q, want) <- Seq("count(click)" -> 2.0, "max(click)" -> 9.0,
        "min(click)" -> 3.0, "avg(click)" -> 6.0)) {
      val batch = graft.promql.Engine.eval(spark, dir, q)
        .select($"value").as[Double].collect()
      assert(batch.toSeq === Seq(want), q)
    }
  }

  test("streaming PromQL histogram_quantile converges to the batch interpolation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = graft.promql.Engine.evalStream(mem.toDF()
      .withColumn("event_type", org.apache.spark.sql.functions.lit("error")),
      "histogram_quantile(0.9, error)")
    val q = out.writeStream.format("memory").queryName("promql_hq")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(raw(0, 1, 2.0, "a"), raw(1, 2, 4.0, "a"))
      q.processAllAvailable()
      mem.addData(raw(2, 3, 8.0, "a"), raw(3, 4, 30.0, "a"))
      q.processAllAvailable()
      val streamed = spark.table("promql_hq")
        .orderBy($"value").select($"value").as[Double].collect().last
      // batch over the identical four observations
      val dir = fixture("events" -> Seq(
        ev(0, 60000, "error", 2.0, "a"), ev(1, 120000, "error", 4.0, "a"),
        ev(2, 180000, "error", 8.0, "a"), ev(3, 240000, "error", 30.0, "a")
      ).toDF(eventCols: _*))
      val batch = graft.promql.Engine.eval(spark, dir, "histogram_quantile(0.9, error)")
        .select($"value").as[Double].head()
      assert(streamed === batch)
      // rank 3.6 of cums (0.5→0, 1→0, 5→2, 10→3, 25→3, 50→4, …) lands in
      // (25, 50]: 25 + 25·(3.6−3)/1 = 40
      assert(batch === 40.0)
    } finally q.stop()
  }

  test("streaming PromQL windowed histogram_quantile emits per-window quantiles") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = graft.promql.Engine.evalStream(mem.toDF()
      .withColumn("event_type", org.apache.spark.sql.functions.lit("error")),
      "histogram_quantile(0.5, rate(error[1m]))", watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("promql_hq_win")
      .outputMode(OutputMode.Append).start()
    try {
      // window 10:01: observations 2, 4 → median rank 1.0 → first bucket
      // containing it is le=5 (cums: 1→0, 5→2): 1 + 4·(1−0)/2 = 3
      mem.addData(raw(0, 1, 2.0, "a"), raw(1, 1, 4.0, "a"))
      q.processAllAvailable()
      // advance the watermark far past 10:01 to close the window
      mem.addData(raw(2, 30, 8.0, "a"))
      q.processAllAvailable()
      mem.addData(raw(3, 59, 8.0, "a"))
      q.processAllAvailable()
      val w1 = java.sql.Timestamp.valueOf("2024-01-01 10:01:00")
      val rows = spark.table("promql_hq_win")
        .select($"window_start", $"value")
        .as[(java.sql.Timestamp, Double)].collect().toMap
      assert(rows(w1) === 3.0)
    } finally q.stop()
  }

  test("streaming PromQL windowed increase/rate emit per-tumbling-window values") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    // 60-second tumbling windows over the click counter
    val out = graft.promql.Engine.evalStream(mem.toDF(), "increase(click[1m])")
    val q = out.writeStream.format("memory").queryName("promql_increase")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(raw(0, 10, 1.0, "a"), raw(1, 10, 2.0, "a"), raw(2, 11, 5.0, "a"))
      q.processAllAvailable()
      val w10 = java.sql.Timestamp.valueOf("2024-01-01 10:10:00")
      val w11 = java.sql.Timestamp.valueOf("2024-01-01 10:11:00")
      val byWindow = spark.table("promql_increase")
        .groupBy($"window_start").agg(org.apache.spark.sql.functions.max($"value"))
        .as[(java.sql.Timestamp, Double)].collect().toMap
      assert(byWindow === Map(w10 -> 3.0, w11 -> 5.0))
      // sum by (k) over the windowed rate pushes into ONE aggregation
      val memS = MemoryStream[RawEvent]
      val outS = graft.promql.Engine.evalStream(memS.toDF(),
        "sum by (k) (increase(click[1m]))")
      val qS = outS.writeStream.format("memory").queryName("promql_sum_increase")
        .outputMode(OutputMode.Update).start()
      try {
        // two series (users 1, 2) of the same label within one window
        memS.addData(
          RawEvent(0, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "click", 1.0, """{"k": "a"}"""),
          RawEvent(1, java.sql.Timestamp.valueOf("2024-01-01 10:10:30"), 2L, "click", 4.0, """{"k": "a"}"""))
        qS.processAllAvailable()
        val sums = spark.table("promql_sum_increase")
          .groupBy($"window_start", $"label_k")
          .agg(org.apache.spark.sql.functions.max($"value"))
          .as[(java.sql.Timestamp, String, Double)].collect().toSet
        assert(sums === Set((w10, "a", 5.0)))
      } finally qS.stop()
      // rate divides the same windowed increase by the window seconds
      val mem2 = MemoryStream[RawEvent]
      val out2 = graft.promql.Engine.evalStream(mem2.toDF(), "rate(click[1m])")
      val q2 = out2.writeStream.format("memory").queryName("promql_rate")
        .outputMode(OutputMode.Update).start()
      try {
        mem2.addData(raw(0, 10, 1.0, "a"), raw(1, 10, 2.0, "a"))
        q2.processAllAvailable()
        val rates = spark.table("promql_rate")
          .select($"value").as[Double].collect().toSet
        assert(rates === Set(3.0 / 60.0))
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming PromQL 'sum without' over a windowed rate groups on the series key") {
    implicit val sqlCtx = spark.sqlContext
    // `without (instance)` must derive its grouping from the SELECTOR's
    // series key (k), never from the windowed vector's labels — the
    // synthetic window_start column does not exist on the raw relation
    val mem = MemoryStream[RawEvent]
    val out = graft.promql.Engine.evalStream(mem.toDF(),
      "sum without (instance) (increase(click[1m]))")
    assert(out.columns.toSeq === Seq("window_start", "label_k", "value"))
    val q = out.writeStream.format("memory").queryName("promql_sum_without")
      .outputMode(OutputMode.Update).start()
    try {
      // two instances (users 1, 2) of the same k inside one window
      mem.addData(
        RawEvent(0, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "click", 1.0, """{"k": "a"}"""),
        RawEvent(1, java.sql.Timestamp.valueOf("2024-01-01 10:10:30"), 2L, "click", 4.0, """{"k": "a"}"""))
      q.processAllAvailable()
      val w10 = java.sql.Timestamp.valueOf("2024-01-01 10:10:00")
      val sums = spark.table("promql_sum_without")
        .groupBy($"window_start", $"label_k")
        .agg(org.apache.spark.sql.functions.max($"value"))
        .as[(java.sql.Timestamp, String, Double)].collect().toSet
      assert(sums === Set((w10, "a", 5.0)))
    } finally q.stop()
  }

  test("streaming PromQL max/avg over windowed increase chain two stateful aggregations") {
    implicit val sqlCtx = spark.sqlContext
    // per-series windowed increase, then the cross-series max per window:
    // chained stateful operators — Append mode, windows emit when the
    // watermark passes their end
    val mem = MemoryStream[RawEvent]
    val out = graft.promql.Engine.evalStream(mem.toDF(),
      "max by (k) (increase(click[1m]))", watermark = "0 seconds")
    assert(out.columns.toSeq === Seq("window_start", "label_k", "value"))
    val q = out.writeStream.format("memory").queryName("promql_max_increase")
      .outputMode(OutputMode.Append).start()
    try {
      // window 10:10 — series u1 sums to 3, u2 to 4
      mem.addData(
        RawEvent(0, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "click", 1.0, """{"k": "a"}"""),
        RawEvent(1, java.sql.Timestamp.valueOf("2024-01-01 10:10:20"), 1L, "click", 2.0, """{"k": "a"}"""),
        RawEvent(2, java.sql.Timestamp.valueOf("2024-01-01 10:10:30"), 2L, "click", 4.0, """{"k": "a"}"""))
      q.processAllAvailable()
      // advance the watermark past the 10:10 window's end to emit it
      mem.addData(
        RawEvent(3, java.sql.Timestamp.valueOf("2024-01-01 10:12:00"), 1L, "click", 9.0, """{"k": "a"}"""))
      q.processAllAvailable()
      val w10 = java.sql.Timestamp.valueOf("2024-01-01 10:10:00")
      val rows = spark.table("promql_max_increase")
        .as[(java.sql.Timestamp, String, Double)].collect().toSet
      assert(rows === Set((w10, "a", 4.0)))
    } finally q.stop()
    // avg over the same shape
    val mem2 = MemoryStream[RawEvent]
    val out2 = graft.promql.Engine.evalStream(mem2.toDF(),
      "avg by (k) (increase(click[1m]))", watermark = "0 seconds")
    val q2 = out2.writeStream.format("memory").queryName("promql_avg_increase")
      .outputMode(OutputMode.Append).start()
    try {
      mem2.addData(
        RawEvent(0, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "click", 1.0, """{"k": "a"}"""),
        RawEvent(1, java.sql.Timestamp.valueOf("2024-01-01 10:10:30"), 2L, "click", 4.0, """{"k": "a"}"""))
      q2.processAllAvailable()
      mem2.addData(
        RawEvent(2, java.sql.Timestamp.valueOf("2024-01-01 10:12:00"), 1L, "click", 9.0, """{"k": "a"}"""))
      q2.processAllAvailable()
      val w10 = java.sql.Timestamp.valueOf("2024-01-01 10:10:00")
      val rows = spark.table("promql_avg_increase")
        .as[(java.sql.Timestamp, String, Double)].collect().toSet
      assert(rows === Set((w10, "a", 2.5)))
    } finally q2.stop()
  }

  test("stream-stream interval join attributes purchases to preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val out = MetricStream.clickAttribution(mem.toDF())
    val q = out.writeStream.format("memory").queryName("attrib_test")
      .outputMode(OutputMode.Append).start()
    try {
      def at(id: Long, minute: Int, etype: String, value: Double, label: String) =
        RawEvent(id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"),
          1L, etype, value, s"""{"k": "$label"}""")
      mem.addData(
        at(0, 0, "click", 1.0, "a"),     // 5 min before the purchase → joins
        at(1, 20, "click", 1.0, "a"),    // 15 min after → outside interval
        at(2, 0, "click", 1.0, "b"),     // other label → no match
        at(3, 5, "purchase", 10.0, "a"))
      q.processAllAvailable()
      // advance both watermarks so joined results are finalized
      mem.addData(at(9, 59, "click", 0.0, "z"), at(10, 59, "purchase", 0.0, "z"))
      q.processAllAvailable()
      val rows = spark.table("attrib_test")
        .select($"purchase_id", $"label_k", $"click_value")
        .as[(Long, String, Double)].collect().filter(_._1 == 3L)
      assert(rows.toSeq === Seq((3L, "a", 1.0)))
    } finally q.stop()
  }

  test("streaming bloom decontamination equals the batch scorer bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    def row(id: Long, text: String, src: String) =
      (id, text, "en", src, text.length.toLong)
    val corpus = Seq(
      row(1, "alpha beta gamma delta epsilon zeta", "src1"), // full overlap
      row(2, "one two three four five six seven", "src1"),   // fresh text
      row(3, "alpha beta gamma brand new suffix here", "src2")) // partial
    val dir = fixture("documents" -> (row(0,
      "alpha beta gamma delta epsilon zeta", "src0") +: corpus)
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val batch = graft.operators.TextAnalysis.bloomContamination(spark, dir)
      .select($"doc_id", $"n_shingles", $"n_bloom_hits", $"bloom_contamination", $"flagged")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSet
    // the eval bitset is the STATIC side; the corpus arrives as a stream
    val bits = graft.operators.TextAnalysis.bloomBitset(spark, dir)
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.TextAnalysis.bloomScore(
      mem.toDF().toDF("doc_id", "text"), bits)
    val q = out.writeStream.format("memory").queryName("bloom_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(corpus.map(c => (c._1, c._2)): _*)
      q.processAllAvailable()
      val streamed = spark.table("bloom_stream")
        .select($"doc_id", $"n_shingles", $"n_bloom_hits", $"bloom_contamination", $"flagged")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming chunking equals the batch chunker (stateless row-local path)") {
    implicit val sqlCtx = spark.sqlContext
    def row(id: Long, text: String) =
      (id, text, "en", "src1", text.length.toLong)
    val corpus = Seq(
      row(1, (1 to 120).map(i => s"tok$i").mkString(" ")), // 3 chunks
      row(2, "short doc"),                                 // 1 partial chunk
      row(3, (1 to 50).map(i => s"w$i").mkString(" ")))    // exactly one window + stride tail
    val dir = fixture("documents" ->
      corpus.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val batch = graft.operators.TextAnalysis.chunkDocuments(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSet
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.TextAnalysis.chunkDocumentsOf(
      mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("chunk_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(corpus.map(c => (c._1, c._2)): _*)
      q.processAllAvailable()
      val streamed = spark.table("chunk_stream")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming simhash firewall equals the batch near-dup pair relation") {
    implicit val sqlCtx = spark.sqlContext
    def row(id: Long, text: String) =
      (id, text, "en", "src1", text.length.toLong)
    // docs 1/2 are single-word edits of each other (near-dups), 3 is
    // disjoint, 4 duplicates 1 exactly (Hamming 0)
    val corpus = Seq(
      row(1, "the quick brown fox jumps over the lazy dog"),
      row(2, "the quick brown fox leaps over the lazy dog"),
      row(3, "completely different content with other words entirely"),
      row(4, "the quick brown fox jumps over the lazy dog"))
    val dir = fixture("documents" ->
      corpus.toDF("doc_id", "text", "lang", "source", "n_chars"))
    // the row-local signature expression matches the aggregate form
    val batchSig = graft.operators.Dedup.simhashSignatures(spark, dir)
      .as[(Long, Long)].collect().toMap
    val localSig = corpus.map(c => (c._1, c._2)).toDF("doc_id", "text")
      .withColumn("sig", org.apache.spark.sql.functions.expr(
        graft.operators.Dedup.SimhashRowExpr))
      .select($"doc_id", $"sig").as[(Long, Long)].collect().toMap
    assert(localSig === batchSig)
    // batch pair relation, symmetrized to the firewall's per-doc view
    val pairs = graft.operators.Dedup.simhashNearDup(spark, dir)
      .as[(Long, Long, Long)].collect()
    val batchView = (pairs.map(p => (p._1, p._2, p._3)) ++
      pairs.map(p => (p._2, p._1, p._3))).toSet
    assert(batchView.nonEmpty, "fixture has no near-dup pair; test is vacuous")
    // every corpus doc arrives on the stream; the static side is the
    // corpus signature index
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.Dedup.simhashFirewall(
      mem.toDF().toDF("doc_id", "text"),
      graft.operators.Dedup.simhashSignatures(spark, dir))
    val q = out.writeStream.format("memory").queryName("firewall_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(corpus.map(c => (c._1, c._2)): _*)
      q.processAllAvailable()
      val streamed = spark.table("firewall_stream")
        .select($"doc_id", $"partner", $"hamming")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed === batchView)
    } finally q.stop()
  }

  test("streaming curation gate equals the batch gate and x24's verdict") {
    implicit val sqlCtx = spark.sqlContext
    def row(id: Long, text: String, src: String) =
      (id, text, "en", src, text.length.toLong)
    // one gate per document: contaminated (4/5 shingles in the src0
    // benchmark), ok, duplicate-of-2, too_short, dominated (top 6/10),
    // repetitive (dup 8/12, top 3/12)
    val corpus = Seq(
      row(1, "alpha beta gamma delta epsilon zeta extra", "src1"),
      row(2, "one two three four five six seven eight nine", "src1"),
      row(3, "one two three four five six seven eight nine", "src2"),
      row(4, "tiny doc", "src1"),
      row(5, "rep rep rep rep rep rep unique words here now", "src2"),
      row(6, "x x x y y y z z z w w w", "src1"))
    val dir = fixture("documents" -> (row(0,
      "alpha beta gamma delta epsilon zeta", "src0") +: corpus)
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    // the gate ties back to x24's exact verdict on this FP-free fixture
    // (src0 itself never flows through the gate — it IS the benchmark)
    val x24 = graft.operators.TextAnalysis.filterVerdict(spark, dir)
      .filter($"doc_id" >= 1).as[(Long, Boolean, String, Long, Double, Double, Double)].collect().toSet
    assert(x24.map(_._3) === Set("benchmark_contaminated", "ok", "duplicate",
      "too_short", "dominated_by_one_token", "repetitive"),
      "fixture does not exercise every gate")
    val index = graft.operators.TextAnalysis.docDigestIndex(spark, dir)
    val bits = graft.operators.TextAnalysis.bloomBitset(spark, dir)
    val docsDf = corpus.map(c => (c._1, c._2)).toDF("doc_id", "text")
    val batchGate = graft.operators.TextAnalysis
      .curationGate(docsDf, index, bits).as[(Long, Boolean, String, Long, Double, Double, Double)].collect().toSet
    assert(batchGate === x24)
    // the SAME plan over a stream, fed across two micro-batches
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.TextAnalysis.curationGate(
      mem.toDF().toDF("doc_id", "text"), index, bits)
    val q = out.writeStream.format("memory").queryName("curation_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(corpus.take(3).map(c => (c._1, c._2)): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(3).map(c => (c._1, c._2)): _*)
      q.processAllAvailable()
      val streamed = spark.table("curation_stream").as[(Long, Boolean, String, Long, Double, Double, Double)].collect().toSet
      assert(streamed === batchGate)
    } finally q.stop()
  }

  test("streaming boilerplate firewall equals the batch scrub and x74 bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    def row(id: Long, text: String, src: String) =
      (id, text, "en", src, text.length.toLong)
    // docs 1/2 share a 7-token prefix (one 5-shingle dup run); doc 3 is clean
    val pre = "terms of service apply to this document"
    // doc 4 has NULL text: x74's posexplode emits no row for it and the
    // firewall's isNotNull filter must drop it identically in batch AND
    // stream - the law fixture that closes r10's null-text hole
    val corpus = Seq(
      row(1, s"$pre alpha beta gamma delta", "src1"),
      row(2, s"$pre epsilon zeta eta theta", "src2"),
      row(3, "completely unrelated content with fresh words", "src1"),
      (4L, null.asInstanceOf[String], "en", "src2", 0L))
    val dir = fixture("documents" ->
      corpus.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val x74 = graft.operators.TextAnalysis.spanScrub(spark, dir)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(x74.exists(_._4 > 0), "fixture scrubs nothing; test is vacuous")
    val bits = graft.operators.TextAnalysis.dupShingleBitset(spark, dir)
    val docsDf = corpus.map(c => (c._1, c._2)).toDF("doc_id", "text")
    val batch = graft.operators.TextAnalysis.boilerplateFirewall(docsDf, bits)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    // row-local bloom scrub ties back to x74's exact relation-level scrub
    // on this FP-free fixture
    assert(batch === x74)
    // the null-text doc is in neither relation - same row universe
    assert(!batch.exists(_._1 == 4L))
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.TextAnalysis.boilerplateFirewall(
      mem.toDF().toDF("doc_id", "text"), bits)
    val q = out.writeStream.format("memory").queryName("boiler_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(corpus.take(2).map(c => (c._1, c._2)): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(2).map(c => (c._1, c._2)): _*)
      q.processAllAvailable()
      val streamed = spark.table("boiler_stream")
        .as[(Long, Long, Long, Long, String)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming entropy gate equals batch x78 bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    def row(id: Long, text: String, src: String) =
      (id, text, "en", src, text.length.toLong)
    val corpus = Seq(
      row(1, "a a a a a a", "src1"),              // constant
      row(2, "alpha beta gamma delta epsilon", "src1"), // uniform
      row(3, "x x x x x y y z", "src2"))          // skewed
    val dir = fixture("documents" ->
      corpus.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val x78 = graft.operators.TextAnalysis.tokenEntropy(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    val docsDf = corpus.map(c => (c._1, c._2)).toDF("doc_id", "text")
    // the row-local fold's integer nano-bit adds are order-free, so the
    // in-row score equals the relational groupBy sum EXACTLY
    val batch = graft.operators.TextAnalysis.entropyGate(spark, docsDf)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(batch === x78)
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.TextAnalysis.entropyGate(
      spark, mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("entropy_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(corpus.take(2).map(c => (c._1, c._2)): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(2).map(c => (c._1, c._2)): _*)
      q.processAllAvailable()
      val streamed = spark.table("entropy_stream")
        .as[(Long, Long, Long, Double, Double)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming DSIR gate equals batch x80 bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // x80's relational scoring, restricted to the gate's columns
    val batch = graft.operators.TextAnalysis.dsirImportance(spark, dir)
      .select($"doc_id", $"n_feats", $"logw_bits", $"keep")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(batch.nonEmpty)
    // freeze the model; score the same corpus row-locally (batch frame)
    val model = graft.operators.TextAnalysis.dsirModel(spark, dir)
    val docsDf = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text")
    val local = graft.operators.TextAnalysis.dsirGate(docsDf, model)
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(local === batch,
      "row-local fold diverges from the relational groupBy sum")
    // now as a stream: same plan, stream-static broadcast, append mode
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.TextAnalysis.dsirGate(
      mem.toDF().toDF("doc_id", "text"), model)
    val q = out.writeStream.format("memory").queryName("dsir_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = docsDf.as[(Long, String)].collect()
      mem.addData(rows.take(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("dsir_stream")
        .as[(Long, Long, Double, Boolean)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming byte-entropy gate equals batch x81 bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.Multimodal.byteEntropy(spark, dir)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSet
    assert(batch.nonEmpty)
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.Multimodal.byteEntropyGate(
      mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("entropy81_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = graft.sources.Tables.documents(spark, dir)
        .select($"doc_id", $"text").as[(Long, String)].collect()
      mem.addData(rows.take(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("entropy81_stream")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming BPE encode with a frozen merge table equals batch x73") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val rounds = graft.operators.TextAnalysis.BpeEncodeRounds
    val batch = graft.operators.TextAnalysis.bpeEncode(spark, dir, rounds)
      .as[(Long, Long, Long, Long, Double, String)].collect().toSet
    // freeze the tokenizer: collect the rounds-sized merge table
    val merges = graft.operators.TextAnalysis.bpeTrainState(spark, dir, rounds)
      ._1.map(_.select($"round", $"merged").as[(Long, String)].head())
      .map { case (r, p) => (r.toInt, p) }
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.TextAnalysis.bpeEncodeStream(
      mem.toDF().toDF("doc_id", "text"), merges)
    val q = out.writeStream.format("memory").queryName("bpe_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a.toSeq: _*)
      q.processAllAvailable()
      mem.addData(b.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("bpe_stream")
        .as[(Long, Long, Long, Long, Double, String)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming alert ladder: pending at onset, firing when sustained, gap resets") {
    implicit val sqlCtx = spark.sqlContext
    val d = 86400000L // one day in ms (fixture ev() takes ms offsets)
    // a: breaches days 0-4 -> pending, pending, then firing from day 2
    // b: breaches days 0,1, SILENT day 2 (gap reset), breaches days 3,4
    // c: active but below threshold -> never emits
    // day-5 sentinels (value 0, below threshold) close each day-4 window
    val rows = (0 to 4).flatMap { day =>
      Seq(ev(day, day * d, "purchase", 10.0, "a"),
        ev(100 + day, day * d, "purchase", 1.0, "c")) ++
        (if (day == 2) Nil else Seq(ev(200 + day, day * d, "purchase", 9.0, "b")))
    } ++ Seq(ev(500, 5 * d, "purchase", 0.0, "a"),
      ev(501, 5 * d, "purchase", 0.0, "b"),
      ev(502, 5 * d, "purchase", 0.0, "c"))
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val out = graft.streaming.MetricStream.alertStateStream(
      mem.toDF().toDF(eventCols: _*), thresholdCents = 500L, needK = 3)
    val q = out.writeStream.format("memory").queryName("alert_ladder")
      .outputMode(OutputMode.Update).start()
    try {
      val (h, t) = rows.splitAt(rows.length / 2)
      mem.addData(h: _*)
      q.processAllAvailable()
      mem.addData(t: _*)
      q.processAllAvailable()
      val got = spark.table("alert_ladder")
        .select($"label_k", $"window_start_us", $"alertstate")
        .as[(String, Long, String)].collect().toSet
      val t0us = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
      def wday(n: Int) = {
        val us = t0us + n * d * 1000L
        math.floorDiv(us, 86400000000L) * 86400000000L
      }
      assert(got === Set(
        ("a", wday(0), "pending"), ("a", wday(1), "pending"),
        ("a", wday(2), "firing"), ("a", wday(3), "firing"),
        ("a", wday(4), "firing"),
        ("b", wday(0), "pending"), ("b", wday(1), "pending"),
        ("b", wday(3), "pending"), ("b", wday(4), "pending")))
    } finally q.stop()
  }

  test("ALERTS_FOR_STATE: a seeded restart fires at the ORIGINAL deadline; unseeded re-arms") {
    implicit val sqlCtx = spark.sqlContext
    val MS = graft.streaming.MetricStream
    val d = 86400000L
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_forstate").toString
    val t0us = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    def wday(n: Int) =
      math.floorDiv(t0us + n * d * 1000L, 86400000000L) * 86400000000L
    // series a breaches every day 0..4 (threshold 5, needK 3): the
    // uninterrupted ladder goes pending(d0), pending(d1), firing(d2..4)
    val all = (0 to 4).map(day => ev(day, day * d, "purchase", 10.0, "a")) :+
      ev(500, 5 * d, "purchase", 0.0, "a") // day-5 sentinel closes day 4
    val (phase1, phase2) = (all.take(3), all.drop(3))

    // ---- phase 1: run to day 2 (47h-into-pending analog), persist
    // the for-state snapshots next to the raw segments
    val mem1 = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val q1t = MS.alertStateStream(mem1.toDF().toDF(eventCols: _*),
        thresholdCents = 500L, needK = 3)
      .writeStream.format("memory").queryName("fs_phase1")
      .outputMode(OutputMode.Update).start()
    val q1s = MS.streamingForState(
      MS.alertLadderStream(mem1.toDF().toDF(eventCols: _*),
        thresholdCents = 500L, needK = 3), stateDir)
    try {
      mem1.addData(phase1: _*)
      q1t.processAllAvailable()
      q1s.processAllAvailable()
    } finally { q1t.stop(); q1s.stop() }
    val p1 = spark.table("fs_phase1")
      .select($"label_k", $"window_start_us", $"alertstate")
      .as[(String, Long, String)].collect().toSet
    assert(p1 === Set(("a", wday(0), "pending"), ("a", wday(1), "pending")))
    // the durable view holds the mid-pending timer: open day-2 window,
    // run 2 — exactly what a restart must resume from
    val seed = MS.forStateView(spark, stateDir)
    val seedRow = seed.as[(String, Long, Long, Int)].collect().toSeq
    assert(seedRow === Seq(("a", wday(2), 1000L, 2)))

    // ---- phase 2: FRESH start (no checkpoint), seeded — the day-3
    // event closes the restored day-2 window and the alert FIRES at
    // the original deadline (run 2 + 1 = needK), not re-armed
    val mem2 = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val q2 = MS.alertStateStream(mem2.toDF().toDF(eventCols: _*),
        thresholdCents = 500L, needK = 3, initial = Some(seed))
      .writeStream.format("memory").queryName("fs_phase2")
      .outputMode(OutputMode.Update).start()
    try {
      mem2.addData(phase2: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val p2 = spark.table("fs_phase2")
      .select($"label_k", $"window_start_us", $"alertstate")
      .as[(String, Long, String)].collect().toSet
    assert(p2 === Set(("a", wday(2), "firing"), ("a", wday(3), "firing"),
      ("a", wday(4), "firing")))

    // ---- the seeded split equals the uninterrupted single stream
    // (restart is INVISIBLE in the emitted ALERTS history)
    val mem3 = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val q3 = MS.alertStateStream(mem3.toDF().toDF(eventCols: _*),
        thresholdCents = 500L, needK = 3)
      .writeStream.format("memory").queryName("fs_single")
      .outputMode(OutputMode.Update).start()
    try {
      mem3.addData(all: _*)
      q3.processAllAvailable()
    } finally q3.stop()
    val single = spark.table("fs_single")
      .select($"label_k", $"window_start_us", $"alertstate")
      .as[(String, Long, String)].collect().toSet
    assert((p1 ++ p2) === single)

    // ---- control: an UNSEEDED fresh start re-arms the ladder — the
    // 2-days-pending alert starts over and never fires in phase 2
    val mem4 = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val q4 = MS.alertStateStream(mem4.toDF().toDF(eventCols: _*),
        thresholdCents = 500L, needK = 3)
      .writeStream.format("memory").queryName("fs_rearmed")
      .outputMode(OutputMode.Update).start()
    try {
      mem4.addData(phase2: _*)
      q4.processAllAvailable()
    } finally q4.stop()
    val rearmed = spark.table("fs_rearmed")
      .select($"alertstate").as[String].collect().toSet
    assert(!rearmed.contains("firing"),
      "unseeded restart must lose the pending run (the defect the seed fixes)")
  }

  test("streaming semantic-dedup gate equals batch core membership bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val model = graft.operators.Similarity.semanticGateModel(spark, dir)
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
    val local = graft.operators.Similarity.semanticGate(vecs, model)
      .as[(Long, Int, Double, Boolean)].collect().toSet
    assert(local.nonEmpty)
    // batch law: scored against the SAME frozen centroids, the gate's
    // (cell, cosine) IS the batch assignment, and admit == NOT core
    val batch = graft.operators.Similarity.kmeansAssignments(spark, dir)
      .select($"vec_id", $"cell", $"cosine",
        !($"cosine" >= graft.operators.Similarity.SemanticTau))
      .as[(Long, Int, Double, Boolean)].collect().toSet
    assert(local === batch,
      "in-row argmax diverges from the batch max_by assignment")
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = graft.operators.Similarity.semanticGate(
      mem.toDF().toDF("vec_id", "embedding"), model)
    val q = out.writeStream.format("memory").queryName("semantic_gate")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = vecs.as[(Long, Seq[Float])].collect()
      mem.addData(rows.take(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("semantic_gate")
        .as[(Long, Int, Double, Boolean)].collect().toSet
      assert(streamed === local)
    } finally q.stop()
  }

  test("streaming classifier gate equals batch x86 bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch x86, restricted to the deployment columns (the teacher bit
    // is train-time only — a stream has no verdict stack to join)
    val batch = graft.operators.Classifier.classifierGate(spark, dir)
      .select($"doc_id", $"score", $"keep")
      .as[(Long, Double, Boolean)].collect().toSet
    assert(batch.nonEmpty)
    // freeze the trained weights; score the same corpus row-locally
    val w = graft.operators.Classifier.train(spark, dir).last
    val docsDf = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text")
    val local = graft.operators.Classifier.classifierGateStream(docsDf, w)
      .as[(Long, Double, Boolean)].collect().toSet
    assert(local === batch,
      "row-local feature HOFs diverge from the batch explode+groupBy")
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.Classifier.classifierGateStream(
      mem.toDF().toDF("doc_id", "text"), w)
    val q = out.writeStream.format("memory").queryName("classifier_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = docsDf.as[(Long, String)].collect()
      mem.addData(rows.take(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2).toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("classifier_stream")
        .as[(Long, Double, Boolean)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
