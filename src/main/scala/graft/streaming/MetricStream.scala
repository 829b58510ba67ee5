package graft.streaming

import graft.operators.Metrics
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming ingest — the streaming half of the engine
  * (SURVEY.md §3 E3). The reference's cooperative tick loop
  * (`run main 0.2`, `/root/reference/test.edn:8`) maps to micro-batch
  * triggers; per-block member state held across ticks
  * (`prometheus.cpp:178,218,257`) maps to watermarked windowed
  * aggregation state and `flatMapGroupsWithState` keyed state; the
  * HTTP pull exposition (`prometheus.cpp:73,80`) maps to a
  * `foreachBatch` serving sink that scrapers read concurrently.
  *
  * Scale: all operators key state by series `(name, label_k)` — state
  * store shards distribute with the shuffle; watermarks bound state
  * growth (windows older than the watermark are evicted); the reference
  * has no late-data concept (scrapes are wall-clock), so the watermark
  * policy is ours to declare.
  */
object MetricStream {

  /** One accumulated counter series row emitted by the running-total op. */
  case class SeriesTotal(name: String, label_k: String, total: Double, n: Long)

  case class SeriesKey(name: String, label_k: String)
  case class Obs(name: String, label_k: String, value: Double)

  /** Tumbling-window counter totals with a watermark: the streaming
    * analog of [[Metrics.counterSnapshot]] per window. Late samples
    * beyond the watermark are dropped (state for closed windows is
    * evicted — bounded state at any ingest rate).
    */
  def windowedCounterTotals(
      events: DataFrame,
      window: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    Metrics.metricEventsOf(events)
      .filter(col("kind") === "counter" && col("value") >= 0)
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("name"), col("label_k"))
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("name"),
        col("label_k"), col("total"), col("n"))

  /** Streaming maintenance of the downsampling pyramid's finest level
    * ([[graft.operators.Downsample]]): per-(series, aligned 1h window)
    * rollup rows with the SAME composition-carrying fields as the batch
    * `rollupRaw` — count, exact decimal sum, min/max, and
    * (ts_us, event_id)-anchored first/last. Grouping on the event-time
    * window keeps watermark eviction live (state for closed buckets is
    * dropped), and `window()` over the 1 µs-shifted event time is
    * exactly the batch tier's closed-right `(b·res, (b+1)·res]`
    * bucketing, so closed streaming buckets are
    * bit-identical to batch rollup rows — StreamingSpec pins
    * stream ≡ batch field-for-field. That makes the pyramid
    * maintainable incrementally at ingest: coarser levels compact from
    * this output ([[graft.operators.Downsample.compact]]) without ever
    * re-reading raw events. 100 TB shape: one watermarked streaming
    * aggregate; state ∝ open buckets × series, not events.
    */
  def streamingRollup(events: DataFrame,
      watermark: String = "2 minutes"): DataFrame = {
    val st = graft.plans.StaleExprs.isStaleC(col("value"))
    val fMin = min(col("_f"))
    val fMax = max(col("_f"))
    Metrics.metricEventsOf(events)
      .withColumn("ts_us", unix_micros(col("ts")))
      // STALENESS ([[graft.model.Stale]], same construction as the
      // batch rollupRaw): a marker row contributes to no value field —
      // `_f` is null for markers, so the aggregates skip them — and the
      // bucket keeps the latest marker anchor as `stale_at` for the
      // instant tier's series cut
      .withColumn("_f", when(!st,
        struct(col("ts_us"), col("event_id"), col("value"))))
      .withColumn("_m", when(st,
        struct(col("ts_us"), col("event_id"))))
      // window() assigns [start, end); the pyramid's buckets are
      // (start, end] (PromQL's closed-right range convention, see
      // Downsample.bucketCol) — shifting event time by 1 µs before
      // windowing maps one onto the other exactly
      .withColumn("_wts", col("ts") - expr("INTERVAL 1 MICROSECOND"))
      .withWatermark("_wts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("_wts"), "1 hour"),
        col("name"), col("label_k"), col("label_instance"), col("kind"))
      .agg(
        count(col("_f")).as("cnt"),
        sum(col("_f").getField("value")
          .cast(org.apache.spark.sql.types.DecimalType(38, 2)))
          .as("sum_dec"),
        min(col("_f").getField("value")).as("vmin"),
        max(col("_f").getField("value")).as("vmax"),
        fMin.getField("value").as("vfirst"),
        when(fMin.isNotNull, struct(fMin.getField("ts_us").as("ts_us"),
          fMin.getField("event_id").as("event_id"))).as("first_at"),
        fMax.getField("value").as("vlast"),
        when(fMax.isNotNull, struct(fMax.getField("ts_us").as("ts_us"),
          fMax.getField("event_id").as("event_id"))).as("last_at"),
        max(col("_m")).as("stale_at"))
      .select(col("name"), col("label_k"), col("label_instance"), col("kind"),
        unix_seconds(col("window.start")).as("bucket_s"),
        col("cnt"), col("sum_dec"), col("vmin"), col("vmax"),
        col("vfirst"), col("first_at"), col("vlast"), col("last_at"),
        col("stale_at"))
  }

  /** DURABLE pyramid maintenance, LSM-style: every micro-batch's
    * updated rollup state rows APPEND to the on-disk block directory
    * as immutable segments (no read-modify-write inside the streaming
    * commit — append-only is crash-safe and never contends with
    * readers); [[blocksView]] is the read-side merge that keeps only
    * the LATEST state per (series, bucket). `cnt` is monotone within a
    * bucket and `last_at` anchors ties, so "latest" is a max_by — the
    * same recipe an LSM tree's read path uses, with compaction =
    * rewriting the directory as its own merged view (what
    * `tools/Materialize` emits). Closes ingest → rollup → DISK →
    * router end to end: a restart serves scraped/pushed data from the
    * segments alone.
    */
  def streamingBlocks(rollups: DataFrame, blockDir: String): StreamingQuery =
    rollups.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(blockDir)
      }
      .start()

  /** DURABLE raw-event history for the push doors — the raw-segment
    * face next to [[streamingBlocks]]: every micro-batch's samples
    * (already adapted to the metric-events view) APPEND to the segment
    * directory as immutable parquet (crash-safe, append-only, never
    * contends with readers — the same LSM discipline as the rollup
    * blocks). Where the rollup blocks serve ALIGNED reads after a
    * restart, these segments serve the NON-ALIGNED ones: seed
    * [[graft.operators.Metrics.seedEvents]] with [[rawSegmentsView]]
    * and every raw-path query (odd-window rates, unaligned instants,
    * subqueries) answers from disk alone.
    */
  def streamingRawSegments(events: DataFrame,
      segDir: String): StreamingQuery =
    Metrics.metricEventsOf(events).writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(segDir)
      }
      .start()

  /** The raw-segment directory's serving view, replay-deduped: a
    * redelivered micro-batch appends byte-identical rows, and
    * `event_id` is the engine-wide exact-dedup key, so keeping one row
    * per id restores the exactly-once relation (all duplicates are
    * identical, making the pick order-free). Schema = the
    * metric-events view, ready for `Metrics.seedEvents`.
    */
  def rawSegmentsView(spark: SparkSession, segDir: String): DataFrame =
    spark.read.parquet(segDir)
      .dropDuplicates("event_id")
      .select(col("ts"), col("name"), col("label_k"),
        col("label_instance"), col("kind"), col("value"), col("event_id"))

  /** The block directory's merged serving view: latest state per
    * (series, bucket) across all appended segments — schema-identical
    * to the batch `rollupRaw`, so [[graft.operators.Downsample
    * .seedRollup]] serves it to every pyramid consumer unchanged.
    */
  def blocksView(spark: SparkSession, blockDir: String): DataFrame = {
    val all = spark.read.parquet(blockDir)
    val key = Seq("name", "label_k", "label_instance", "kind", "bucket_s")
    val payload = all.columns.filterNot(key.contains)
    // ordering key: cnt is monotone within a bucket and last_at anchors
    // real-sample ties — but a MARKER-ONLY update advances neither
    // (markers are excluded from cnt/last_at and only move stale_at),
    // so stale_at joins the key: the post-marker state wins its tie
    // with the pre-marker one (null stale_at sorts below any anchor)
    // and the staleness cut survives a restart deterministically.
    all.groupBy(key.map(col): _*)
      .agg(expr(s"max_by(struct(${payload.mkString(", ")}), " +
        "struct(cnt, last_at, stale_at))").as("_s"))
      .select(key.map(col) ++ payload.map(c => col(s"_s.$c").as(c)): _*)
  }

  /** Running all-time counter totals per series via keyed state — the
    * direct analog of the registry's accumulating counter cells
    * (`prometheus.cpp:34-36,212`): state never resets, one row per
    * series is (re-)emitted on every update.
    */
  def runningCounterTotals(events: DataFrame): Dataset[SeriesTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    Metrics.metricEventsOf(events)
      .filter(col("kind") === "counter" && col("value") >= 0)
      .select(col("name"), col("label_k"), col("value")).as[Obs]
      .groupByKey(o => SeriesKey(o.name, o.label_k))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: SeriesKey, rows: Iterator[Obs], state: GroupState[SeriesTotal]) => {
          val prev = state.getOption.getOrElse(SeriesTotal(key.name, key.label_k, 0.0, 0L))
          var total = prev.total
          var n = prev.n
          rows.foreach { o => total += o.value; n += 1 }
          val updated = SeriesTotal(key.name, key.label_k, total, n)
          state.update(updated)
          Iterator.single(updated)
        })
  }

  /** One recorded sample the streaming rule loop writes. */
  case class RuleSample(record: String, label_k: String, ts_ms: Long,
      value: Double)

  /** One rule a [[streamingRuleFile]] stream serves: `gauge = false`
    * is the fast-shape counter rule `sum by (k) (<family>)` (exact
    * running cents); `gauge = true` is the gauge twin — per-series
    * last-write-wins folded at each lattice instant, the present
    * series' values summed through DECIMAL(38,12) exactly like the
    * batch grid's gauge arm ([[graft.promql.Compiler]]
    * gridGaugeInstants), so stream ≡ batch stays bit-exact.
    */
  case class StreamRule(record: String, family: String, gauge: Boolean,
      intervalMs: Long)

  /** Rule-file keyed state: the counter arm's folded cents, the gauge
    * arm's per-series (instance) last-write-wins, the last emitted
    * instant, and the not-yet-closed events.
    */
  case class RuleFileState(appliedCents: Long,
      lww: Map[String, (Long, Long, Double)],
      emittedThroughMs: Long,
      pending: Vector[(Long, Long, String, Long, Double)])

  /** The RULE LOOP as a stream: a fast-shape counter rule
    * (`sum by (k) (<counter>)`) maintained incrementally. Keyed state
    * holds each group's exact running cents; every lattice instant the
    * WATERMARK closes emits the sample upstream's evaluation loop would
    * have written — ts = the instant, value = the running sum over
    * events at-or-before it (the batch snapshot's closed-right bound).
    * Quiet groups keep ticking through event-time timeouts, so a series
    * with no new events still repeats its value at every instant,
    * exactly like the rule loop writing an unchanged sample.
    *
    * Stream ≡ batch: emitted samples equal
    * [[graft.promql.Rules.recordedSeriesRelation]]'s rows for the same
    * rule once the watermark passes `anchorMs` (StreamingSpec pins it):
    *  - instants are `anchorMs`-aligned interval multiples, so both
    *    tiers stamp identical timestamps (`anchorMs` = the batch corpus
    *    instant);
    *  - an instant emits only once the watermark passes it (its sum is
    *    final under the declared lateness policy); later-than-watermark
    *    stragglers fold into state for FUTURE instants but closed
    *    instants never re-emit — upstream's loop never rewrites written
    *    samples;
    *  - emission clamps at `anchorMs` (the lattice the batch tier
    *    serves; a live deployment would let it run unbounded).
    * 100 TB shape: state is O(groups) + the under-watermark event tail;
    * emission ∝ instants crossed, never events.
    */
  def streamingRuleLoop(events: DataFrame, record: String,
      counterName: String, intervalMs: Long, anchorMs: Long,
      watermark: String = "0 seconds"): Dataset[RuleSample] =
    streamingRuleFile(events,
      Seq(StreamRule(record, counterName, gauge = false, intervalMs)),
      anchorMs, watermark)

  /** A whole RULE FILE as one stream — the multi-rule, multi-kind
    * generalization of [[streamingRuleLoop]]: counter-sum rules keep
    * exact running cents, gauge rules keep per-series last-write-wins
    * (ties on (event time, event_id), the engine's deterministic LWW
    * everywhere), and every rule rides its own interval off the shared
    * anchor. One stateful operator serves the file: each event row
    * fans out to one row per rule SLOT (a Generate ABOVE the watermark
    * node — never a filter, which Spark would push below it and
    * filtered-out families would stop advancing event time); a slot
    * whose rule the row doesn't feed carries the empty key (watermark
    * carrier: no state, no output). Post-anchor events route to the
    * empty key too — they can never land inside a served instant, so
    * admitting them would only grow pending state.
    *
    * Stream ≡ batch per rule: emitted samples equal
    * [[graft.promql.Rules.recordedSeriesRelation]]'s rows for the same
    * rule file once the watermark passes `anchorMs` (StreamingSpec pins
    * a counter + gauge file row-for-row). The gauge arm's group value
    * sums the present series' LWW doubles through DECIMAL(38,12) —
    * `BigDecimal.valueOf` + scale 12 HALF_UP — the exact arithmetic of
    * the batch grid's gauge `sum by`, so the two tiers agree to the
    * bit.
    *
    * 100 TB shape: state is O(rules × groups × series-per-group) + the
    * under-watermark event tail; emission ∝ instants crossed, never
    * events.
    */
  def streamingRuleFile(events: DataFrame, rules: Seq[StreamRule],
      anchorMs: Long,
      watermark: String = "0 seconds"): Dataset[RuleSample] = {
    require(rules.nonEmpty, "empty rule file")
    val spark = events.sparkSession
    import spark.implicits._
    val byIdx = rules.toIndexedSeq
    val slots = array(byIdx.zipWithIndex.map { case (r, i) =>
      val feeds = col("name") === r.family &&
        unix_millis(col("ts")) <= anchorMs &&
        (if (r.gauge) col("kind") === "gauge"
        else col("kind") === "counter" && col("value") >= 0)
      when(feeds, concat(lit(s"$i|"), col("label_k"))).otherwise(lit(""))
    }: _*)
    Metrics.metricEventsOf(events)
      // watermark BEFORE any shaping: any event advances event time, so
      // other families' traffic closes every rule's instants
      .withWatermark("ts", watermark)
      .select(col("ts"), col("label_instance"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        col("value"), explode(slots).as("k"))
      .as[(java.sql.Timestamp, String, Long, Long, Double, String)]
      .groupByKey(_._6)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (key: String,
            rows: Iterator[(java.sql.Timestamp, String, Long, Long,
              Double, String)],
            state: GroupState[RuleFileState]) => {
          if (key.isEmpty) Iterator.empty
          else {
            val rule = byIdx(key.takeWhile(_ != '|').toInt)
            val labelK = key.drop(key.indexOf('|') + 1)
            val newEv = rows
              .map(r => (r._1.getTime, r._3, r._2, r._4, r._5)).toVector
            if (newEv.isEmpty && state.getOption.isEmpty) Iterator.empty
            else {
              val wm = state.getCurrentWatermarkMs()
              val st0 = state.getOption.getOrElse {
                // first instant ≥ the group's first event = birth; seed
                // the cursor one interval below it
                val firstTs = newEv.map(_._1).min
                val kk = (anchorMs - firstTs) / rule.intervalMs
                RuleFileState(0L, Map.empty,
                  anchorMs - (kk + 1) * rule.intervalMs, Vector.empty)
              }
              var applied = st0.appliedCents
              var lww = st0.lww
              var thru = st0.emittedThroughMs
              var pending = st0.pending ++ newEv
              val out = Vector.newBuilder[RuleSample]
              var inst = thru + rule.intervalMs
              // an instant closes only when the watermark is STRICTLY
              // past it — Spark still admits events stamped AT the
              // watermark, so `inst == wm` could yet receive an on-time
              // sample the batch lattice (closed-right) would count
              while (inst <= anchorMs && inst < wm) {
                val (now, later) = pending.partition(_._1 <= inst)
                pending = later
                if (rule.gauge) {
                  now.foreach { case (ts, eid, instLbl, _, v) =>
                    val cur = lww.get(instLbl)
                    if (cur.isEmpty || ts > cur.get._1 ||
                      (ts == cur.get._1 && eid > cur.get._2))
                      lww += instLbl -> ((ts, eid, v))
                  }
                  if (lww.nonEmpty)
                    out += RuleSample(rule.record, labelK, inst,
                      lww.values.map(x => BigDecimal.valueOf(x._3)
                        .setScale(12, BigDecimal.RoundingMode.HALF_UP))
                        .sum.toDouble)
                } else {
                  applied += now.map(_._4).sum
                  out += RuleSample(rule.record, labelK, inst,
                    applied / 100.0)
                }
                thru = inst
                inst += rule.intervalMs
              }
              state.update(RuleFileState(applied, lww, thru, pending))
              // wake when the next instant can close; Spark requires
              // the timeout strictly past the current watermark, so an
              // instant sitting exactly ON it re-arms one tick later
              if (thru < anchorMs) state.setTimeoutTimestamp(
                math.max(thru + rule.intervalMs, wm + 1L))
              out.result().iterator
            }
          }
        })
  }

  /** One gauge series row: the latest value by event time. */
  case class SeriesLatest(name: String, label_k: String, value: Double,
      tsUs: Long, eventId: Long)

  case class TsObs(name: String, label_k: String, value: Double,
      tsUs: Long, eventId: Long)

  /** Streaming gauge: last-write-wins per series with the same
    * deterministic (event-time, event_id) ordering as the batch snapshot
    * — keyed state holds one row per series (`Set`,
    * `prometheus.cpp:249`). Late samples older than the held one are
    * ignored, so out-of-order delivery converges to the batch answer.
    */
  def runningGaugeLatest(events: DataFrame): Dataset[SeriesLatest] = {
    val spark = events.sparkSession
    import spark.implicits._
    Metrics.metricEventsOf(events)
      .filter(col("kind") === "gauge")
      .select(col("name"), col("label_k"), col("value"),
        unix_micros(col("ts")).as("tsUs"), col("event_id").as("eventId")).as[TsObs]
      .groupByKey(o => SeriesKey(o.name, o.label_k))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: SeriesKey, rows: Iterator[TsObs], state: GroupState[SeriesLatest]) => {
          var cur = state.getOption.orNull
          rows.foreach { o =>
            if (cur == null || o.tsUs > cur.tsUs ||
                (o.tsUs == cur.tsUs && o.eventId > cur.eventId))
              cur = SeriesLatest(key.name, key.label_k, o.value, o.tsUs, o.eventId)
          }
          state.update(cur)
          Iterator.single(cur)
        })
  }

  /** One histogram series row: bucket counts + _sum/_count, maintained
    * incrementally.
    */
  case class SeriesHist(name: String, label_k: String, counts: Array[Long],
      sumCents: Long, n: Long)

  /** Streaming histogram: per-series bucket buffers in keyed state — the
    * streaming twin of [[graft.functions.HistogramAggregator]]
    * (`Observe`, `prometheus.cpp:303`). State size is fixed per series
    * (one long per boundary), so total state is O(series), independent
    * of ingest volume.
    */
  def runningHistogram(events: DataFrame,
      boundaries: Seq[Double] = graft.model.MetricEvent.Buckets): Dataset[SeriesHist] = {
    val spark = events.sparkSession
    import spark.implicits._
    val bs = boundaries.toArray
    Metrics.metricEventsOf(events)
      .filter(col("kind") === "histogram")
      .select(col("name"), col("label_k"), col("value")).as[Obs]
      .groupByKey(o => SeriesKey(o.name, o.label_k))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: SeriesKey, rows: Iterator[Obs], state: GroupState[SeriesHist]) => {
          val cur = state.getOption.getOrElse(
            SeriesHist(key.name, key.label_k, new Array[Long](bs.length), 0L, 0L))
          var sumCents = cur.sumCents
          var n = cur.n
          rows.foreach { o =>
            var i = 0
            var idx = -1
            while (i < bs.length && idx < 0) {
              if (o.value <= bs(i)) idx = i
              i += 1
            }
            if (idx >= 0) cur.counts(idx) += 1
            sumCents += math.round(o.value * 100)
            n += 1
          }
          val updated = SeriesHist(key.name, key.label_k, cur.counts, sumCents, n)
          state.update(updated)
          Iterator.single(updated)
        })
  }

  /** One emitted alert transition: a CLOSED breached window with its
    * ladder state.
    */
  case class AlertState(label_k: String, window_start_us: Long,
      value: Double, alertstate: String)

  /** Keyed ladder state: the one open window + the consecutive-breach
    * run count (O(1) per series).
    */
  case class LadderState(openStartUs: Long, openCents: Long, run: Int)

  /** Streaming alert state machine — upstream's pending→firing ladder
    * (the p74 batch ALERTS series) as keyed state over CLOSED tumbling
    * windows: per series, accumulate the window's counter total in
    * exact cents; when a later-window event arrives the open window
    * CLOSES — a breach (total > threshold) extends the consecutive-run
    * counter, a quiet or sub-threshold window resets it — and every
    * closed breached window emits `pending` (run < needK) or `firing`
    * (run ≥ needK). Inactive windows emit nothing, exactly like
    * upstream's ALERTS series.
    *
    * Determinism & state: per-batch rows are sorted by (event-time,
    * event_id) — the engine's tiebreak — before folding, so replay
    * order inside a batch cannot change transitions; state is ONE
    * (openStart, cents, run) triple per series, O(series) total;
    * a gap of ≥ 1 empty window resets the run in O(1) (empty windows
    * cannot breach, so one reset stands in for all of them — no
    * catch-up loop, silent series cost nothing). Late events older
    * than the open window are dropped (the gauge op's convergence
    * rule). Window close is driven by the series' own event-time
    * progress (no wall-clock), so the same plan replays batch or
    * streaming bit-identically.
    */
  def alertStateStream(events: DataFrame, metric: String = "purchase",
      thresholdCents: Long = 500L, windowUs: Long = 86400000000L,
      needK: Int = 3,
      initial: Option[DataFrame] = None): Dataset[AlertState] = {
    val spark = events.sparkSession
    import spark.implicits._
    alertLadderStream(events, metric, thresholdCents, windowUs, needK,
      initial)
      .filter(e => !e.is_state)
      .map(e => AlertState(e.label_k, e.window_start_us, e.value,
        e.alertstate))
  }

  /** One ladder-stream output row: a transition (`is_state = false` —
    * the [[AlertState]] fields) or a FOR-STATE SNAPSHOT
    * (`is_state = true` — the series' live `(openStart, openCents,
    * run)` triple after the batch, upstream's `ALERTS_FOR_STATE`
    * sample re-expressed for this engine's windowed ladder).
    */
  case class LadderEvent(label_k: String, window_start_us: Long,
      value: Double, alertstate: String, is_state: Boolean,
      open_start_us: Long, open_cents: Long, run: Int)

  /** The full-faced streaming ladder: [[alertStateStream]]'s
    * transitions PLUS one for-state snapshot per updated series per
    * batch — what upstream persists as the `ALERTS_FOR_STATE` series so
    * `for` timers survive a restart. `initial` seeds the keyed state
    * (schema `label_k, open_start_us, open_cents, run` —
    * [[forStateView]]'s shape): a FRESH start (no Spark checkpoint)
    * seeded from the durable snapshots resumes every pending run where
    * it left off, so a 2-day `for` alert 47 h into pending fires at its
    * ORIGINAL deadline instead of re-arming (StreamingSpec pins the
    * exact scenario). State and snapshots are O(series); the snapshot
    * ordering key `(open_start_us, open_cents)` is monotone per series
    * (windows only advance, cents only accumulate within one), so the
    * durable view needs no extra sequence column.
    */
  def alertLadderStream(events: DataFrame, metric: String = "purchase",
      thresholdCents: Long = 500L, windowUs: Long = 86400000000L,
      needK: Int = 3,
      initial: Option[DataFrame] = None): Dataset[LadderEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = Metrics.metricEventsOf(events)
      .filter(col("kind") === "counter" && col("value") >= 0 &&
        col("name") === metric)
      .select(col("name"), col("label_k"), col("value"),
        unix_micros(col("ts")).as("tsUs"), col("event_id").as("eventId")).as[TsObs]
      .groupByKey(o => SeriesKey(o.name, o.label_k))
    val func = (key: SeriesKey, rows: Iterator[TsObs],
        state: GroupState[LadderState]) => {
      val out = scala.collection.mutable.ArrayBuffer[LadderEvent]()
      var cur = state.getOption.orNull
      val before = cur
      rows.toSeq.sortBy(o => (o.tsUs, o.eventId)).foreach { o =>
        val w = math.floorDiv(o.tsUs, windowUs) * windowUs
        if (cur == null) cur = LadderState(w, 0L, 0)
        if (w > cur.openStartUs) {
          // close the open window
          val breach = cur.openCents > thresholdCents
          val run = if (breach) cur.run + 1 else 0
          if (breach) out += LadderEvent(key.label_k, cur.openStartUs,
            cur.openCents / 100.0,
            if (run >= needK) "firing" else "pending",
            is_state = false, 0L, 0L, 0)
          // any fully-empty window between close and w resets the run
          val runAfterGap =
            if (w > cur.openStartUs + windowUs) 0 else run
          cur = LadderState(w, 0L, runAfterGap)
        }
        if (w == cur.openStartUs)
          cur = cur.copy(openCents = cur.openCents + math.round(o.value * 100))
        // w < openStart: late event behind the open window — dropped
      }
      if (cur != null) {
        state.update(cur)
        if (cur != before) // quiet series re-snapshot nothing
          out += LadderEvent(key.label_k, 0L, 0.0, "", is_state = true,
            cur.openStartUs, cur.openCents, cur.run)
      }
      out.iterator
    }
    initial match {
      case None =>
        keyed.flatMapGroupsWithState(
          OutputMode.Update, GroupStateTimeout.NoTimeout)(func)
      case Some(seed) =>
        val init = seed
          .select(col("label_k"), col("open_start_us"),
            col("open_cents"), col("run"))
          .as[(String, Long, Long, Int)]
          .groupByKey(r => SeriesKey(metric, r._1))
          .mapValues(r => LadderState(r._2, r._3, r._4))
        keyed.flatMapGroupsWithState(
          OutputMode.Update, GroupStateTimeout.NoTimeout, init)(func)
    }
  }

  /** Durable `ALERTS_FOR_STATE` face: the ladder stream's for-state
    * snapshots APPEND to `stateDir` as immutable parquet segments —
    * the same LSM discipline as [[streamingRawSegments]], one tiny
    * O(updated series) batch per trigger.
    */
  def streamingForState(ladder: Dataset[LadderEvent],
      stateDir: String): StreamingQuery =
    ladder.filter(col("is_state"))
      .select(col("label_k"), col("open_start_us"), col("open_cents"),
        col("run"))
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(stateDir)
      }
      .start()

  /** The for-state directory's serving view: the LATEST snapshot per
    * series — `(open_start_us, open_cents)` is monotone per series, so
    * max_by needs no segment sequencing. Feed it to
    * [[alertLadderStream]]'s `initial` on a fresh start to restore
    * every pending `for` timer.
    */
  def forStateView(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateDir)
      .groupBy(col("label_k"))
      .agg(expr("max_by(struct(open_start_us, open_cents, run), " +
        "struct(open_start_us, open_cents))").as("_s"))
      .select(col("label_k"), col("_s.open_start_us").as("open_start_us"),
        col("_s.open_cents").as("open_cents"), col("_s.run").as("run"))

  /** Streaming sessionization: watermarked `session_window` per series —
    * the streaming twin of the batch `b16` sessionize. Events of a
    * series gapped ≤ `gap` merge into one session; in Append mode a
    * session row is emitted exactly once, when the watermark passes its
    * end (so its state is also evicted then — state is bounded by the
    * number of OPEN sessions, not by history). The same function runs
    * unchanged on a static DataFrame, which is what the batch-parity
    * test asserts.
    */
  def sessionizedCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    Metrics.metricEventsOf(events)
      .filter(col("kind") === "counter" && col("value") >= 0)
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("name"), col("label_k"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("name"), col("label_k"), col("n_events"), col("total"))

  /** One smoothed series row: Holt-Winters (level, trend) state. */
  case class SeriesSmoothed(name: String, label_k: String, level: Double,
      trend: Double, n: Long, smoothed: Double)

  /** Streaming Holt-Winters: the (level, trend) recurrence of
    * [[graft.operators.PromQL.holtWinters]] maintained as keyed state —
    * the natural streaming form of a computation that has NO mergeable
    * partial state (each update needs the previous level/trend, so
    * batch must fold an ordered array while streaming just carries two
    * doubles per series). Samples must arrive in event order per series
    * (guaranteed by an ordered log partitioned on the series key; the
    * spec drives it so). State is O(1) per series forever.
    */
  def runningHoltWinters(events: DataFrame, sf: Double = 0.5, tf: Double = 0.3)
      : Dataset[SeriesSmoothed] = {
    val spark = events.sparkSession
    import spark.implicits._
    Metrics.metricEventsOf(events)
      .filter(col("kind") === "gauge")
      .select(col("name"), col("label_k"), col("value")).as[Obs]
      .groupByKey(o => SeriesKey(o.name, o.label_k))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: SeriesKey, rows: Iterator[Obs], state: GroupState[SeriesSmoothed]) => {
          var cur = state.getOption.orNull
          rows.foreach { o =>
            cur =
              if (cur == null)
                SeriesSmoothed(key.name, key.label_k, o.value, Double.NaN, 1L, Double.NaN)
              else if (cur.n == 1L) {
                // second sample initializes the trend (b0 = y1 - y0) and
                // applies the first smoothing step, as in the batch fold
                val b0 = o.value - cur.level
                val s1 = sf * o.value + (1 - sf) * (cur.level + b0)
                val b1 = tf * (s1 - cur.level) + (1 - tf) * b0
                SeriesSmoothed(key.name, key.label_k, s1, b1, 2L, s1)
              } else {
                val s1 = sf * o.value + (1 - sf) * (cur.level + cur.trend)
                val b1 = tf * (s1 - cur.level) + (1 - tf) * cur.trend
                SeriesSmoothed(key.name, key.label_k, s1, b1, cur.n + 1L, s1)
              }
          }
          state.update(cur)
          Iterator.single(cur)
        })
  }

  /** Streaming exact dedup: drop replayed samples by `event_id` with
    * state bounded by the watermark — the ingest guard for at-least-once
    * transports (a scraper retry delivers the same observation twice;
    * the reference never sees this because its wire is in-process, but
    * any distributed deployment of the same semantics must). State is
    * evicted as event time passes `watermark`, so memory is bounded by
    * the duplicate-arrival horizon, not by history — the property that
    * makes the operator run forever at ingest scale.
    */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    Metrics.metricEventsOf(events)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join (attribution): each purchase matched to
    * the same-label click events in the 10 minutes before it. Both sides
    * carry watermarks and the join condition bounds event-time distance,
    * so each side's buffered state is evicted once the other side's
    * watermark passes the interval — bounded state, shuffle keyed on the
    * label (AQE/skew handling applies at scale like any equi-join).
    */
  def clickAttribution(events: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val m = Metrics.metricEventsOf(events)
    val clicks = m.filter(col("name") === "click")
      .select(col("label_k").as("c_label"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    val purchases = m.filter(col("name") === "purchase")
      .select(col("label_k").as("label_k"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"), col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      expr("""c_label = label_k AND
              click_ts >= purchase_ts - INTERVAL 10 MINUTES AND
              click_ts <= purchase_ts"""))
      .select(col("purchase_id"), col("label_k"), col("purchase_ts"),
        col("purchase_value"), col("click_ts"), col("click_value"))
  }

  /** The Exposer analog (`prometheus.cpp:27-93`): a `foreachBatch` sink
    * maintaining the latest snapshot in [[ExpositionRegistry]], which
    * concurrent "scrapers" read without blocking ingest — the pull model
    * inverted to read-on-demand, like the reference's HTTP endpoint
    * serving from atomics while the wire keeps ticking.
    */
  def startServingSink(totals: Dataset[SeriesTotal], queryName: String): StreamingQuery =
    totals.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Update)
      .trigger(Trigger.ProcessingTime("200 milliseconds")) // the 0.2 s tick
      .foreachBatch { (batch: Dataset[SeriesTotal], _: Long) =>
        batch.collect().foreach(ExpositionRegistry.publish)
      }
      .start()
}

/** Driver-side serving registry: series → latest accumulated value.
  * Concurrent map ⇒ scrape reads never block the streaming query, the
  * same hand-off the reference gets from prometheus-cpp's atomics
  * (`prometheus.cpp:80`).
  *
  * Memory bound: the `foreachBatch` collect and this map are O(#series)
  * — the SERIES key space, not the sample volume — which is exactly the
  * bound the reference's in-process registry carries
  * (`prometheus.cpp:34-45`). A deployment whose series cardinality
  * outgrows driver memory swaps the registry for a keyed external store
  * (the `ServingSink` parquet layout) without touching the query.
  */
object ExpositionRegistry {
  private val state =
    new java.util.concurrent.ConcurrentHashMap[(String, String), MetricStream.SeriesTotal]()

  def publish(t: MetricStream.SeriesTotal): Unit = state.put((t.name, t.label_k), t)

  /** The raw series state, Spark-free — the HTTP pull endpoint
    * ([[graft.sources.ScrapeEndpoint]]) reads this on the request
    * thread.
    */
  def series(): Seq[MetricStream.SeriesTotal] = {
    import scala.jdk.CollectionConverters._
    state.values().asScala.toSeq
  }

  /** The scrape: current snapshot of every series as a DataFrame. */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    state.values().asScala.toSeq.toDS().toDF()
  }

  def clear(): Unit = state.clear()
}
