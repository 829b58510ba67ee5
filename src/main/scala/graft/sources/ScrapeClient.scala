package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The SCRAPE CLIENT — the other half of the reference's pull model:
  * the reference exposes `/metrics` for a Prometheus server to poll
  * (`/root/reference/prometheus.cpp:47,73`); this closes the loop by
  * being that poller, Spark-first: a tick-driven HTTP fetch lands each
  * payload as one row of a streaming relation, and everything after
  * the fetch — line parse, series extraction, event mapping, rollup
  * maintenance — is the SAME stateless/stateful DataFrame pipeline the
  * batch tier runs ([[parsePayloads]]/[[toEvents]] are plain column
  * expressions, so they bind to static and streaming inputs alike).
  *
  * Flow: [[ScrapeLoop.poll]] → fetch payload → `MemoryStream.addData`
  * → [[parsePayloads]] → [[toEvents]] →
  * `Metrics.metricEventsOf` → `MetricStream.streamingRollup` (or any
  * other streaming operator) — ingest-to-pyramid, end to end.
  *
  * Scale shape: the fetch is one driver-side HTTP GET per tick per
  * target (exactly a Prometheus server's cost); parsing fans out —
  * each payload row explodes to its lines on executors, so a fleet of
  * targets is one union of scrape relations and the per-line work
  * distributes. State downstream is the streaming operators' own
  * (rollup state ∝ open buckets × series).
  */
object ScrapeClient {

  /** One blocking HTTP GET of a metrics endpoint; `openMetrics`
    * negotiates the OpenMetrics 1.0 content type like a modern
    * Prometheus (Accept header, see [[ScrapeEndpoint]]).
    */
  def fetch(url: String, openMetrics: Boolean = false): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    if (openMetrics)
      conn.setRequestProperty("Accept",
        "application/openmetrics-text; version=1.0.0")
    // scrape like a real Prometheus: advertise gzip, decode if the
    // exposer framed it (identity servers unaffected)
    conn.setRequestProperty("Accept-Encoding", "gzip")
    try {
      val raw = conn.getInputStream
      val is =
        if (Option(conn.getHeaderField("Content-Encoding")).contains("gzip"))
          new java.util.zip.GZIPInputStream(raw)
        else raw
      try new String(is.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally is.close()
    } finally conn.disconnect()
  }

  // one sample line: `name{k="v"} value` — text exposition, or
  // OpenMetrics counter lines under the `_total` suffix
  private val LineRe = "^([a-z_]+)\\{k=\"([^\"]*)\"\\} (-?[0-9.]+)$"

  /** Relational parse of scrape payloads: `(scrape_ts, payload)` rows →
    * one `(scrape_ts, name, label_k, value)` row per sample line.
    * Comment/`# EOF` lines drop; OpenMetrics `_total` suffixes strip
    * back to the family name. Stateless column ops only, so the same
    * expression tree serves batch parity tests and the live stream.
    *
    * `metricRelabel` applies upstream's `metric_relabel_configs` to
    * each sample's label set (`__name__` = family name, `k`) BEFORE
    * anything ingests it: samples a rule drops (keep/drop miss, or a
    * rewritten-away `__name__`) are pruned here, so a high-cardinality
    * family costs nothing downstream. The fixed output schema keeps
    * the post-relabel `__name__`/`k`; rules writing OTHER labels are
    * served by [[parsePayloadsLabels]], which returns the full map.
    */
  def parsePayloads(payloads: DataFrame,
      metricRelabel: Seq[Relabel.Rule] = Nil): DataFrame = {
    val parsed = payloads
      .select(col("scrape_ts"), explode(split(col("payload"), "\n")).as("line"))
      .filter(col("line").rlike(LineRe))
      .select(
        col("scrape_ts"),
        regexp_replace(regexp_extract(col("line"), LineRe, 1), "_total$", "")
          .as("name"),
        regexp_extract(col("line"), LineRe, 2).as("label_k"),
        regexp_extract(col("line"), LineRe, 3).cast("double").as("value"))
    applyMetricRelabel(parsed, metricRelabel)
  }

  /** The relabeled sample relation with the FULL label map — for rules
    * that write labels beyond the wire's `__name__`/`k`. Columns:
    * `(scrape_ts, labels map<string,string>, value)`.
    */
  def parsePayloadsLabels(payloads: DataFrame,
      metricRelabel: Seq[Relabel.Rule]): DataFrame =
    relabeled(parsePayloads(payloads), metricRelabel)

  /** Prometheus STALENESS MARKER — the sample a vanished series gets
    * at the scrape that no longer exposes it (or at a failed scrape,
    * for the whole target), so consumers cut the series off
    * immediately instead of serving its last value through the
    * lookback window. The EMITTED value is upstream's exact reserved
    * quiet-NaN bit pattern ([[graft.model.Stale.Bits]]); DETECTION is
    * any-NaN (`isnan`, [[graft.plans.StaleExprs]]) — the engine-wide
    * convention, because Spark canonicalizes NaN payloads in both the
    * parquet writer and the streaming tier, so upstream's bit
    * distinction cannot survive either layer (see
    * [[graft.model.Stale]]'s REPRESENTATION note; the scrape-line
    * grammar can never parse a NaN, so no real sample collides). Rollups
    * exclude markers from value fields and carry a `stale_at` anchor;
    * instant/LWW reads cut a series whose latest event is the marker;
    * range functions never see markers (upstream's semantics
    * throughout — see [[graft.model.Stale]]).
    */
  val StaleMarker: Double = graft.model.Stale.Marker

  /** The series identities one payload exposes — the driver-side parse
    * the staleness tracker diffs between ticks (same line grammar as
    * the relational parse; one target's exposition is O(#series)
    * driver work, exactly upstream's per-target scrape cache).
    */
  /** Number of sample lines one payload exposes — upstream's
    * `scrape_samples_scraped` report value (comments / `# EOF` don't
    * count; one line = one sample under this wire's grammar).
    */
  private[sources] def sampleCount(body: String): Long = {
    val re = LineRe.r
    body.linesIterator.count(l => re.matches(l)).toLong
  }

  private[sources] def seriesOf(body: String): Set[(String, String)] = {
    val re = LineRe.r
    body.linesIterator.collect {
      case re(n, k, _) => (n.replaceAll("_total$", ""), k)
    }.toSet
  }

  /** `metric_relabel_configs` over an already-parsed sample relation —
    * shared by the payload parse and the staleness markers, so a
    * marker is relabeled exactly like the samples of the series it
    * closes (a dropped series needs no marker; a renamed one is
    * closed under its ingested name).
    */
  private[sources] def applyMetricRelabel(parsed: DataFrame,
      rules: Seq[Relabel.Rule]): DataFrame =
    if (rules.isEmpty) parsed
    else relabeled(parsed, rules)
      .select(col("scrape_ts"),
        element_at(col("labels"), "__name__").as("name"),
        coalesce(element_at(col("labels"), "k"), lit("")).as("label_k"),
        col("value"))

  /** [[relabeled]] for callers that need the full label-map shape even
    * under an empty rule chain (the labeled scrape relation's marker /
    * report arms).
    */
  private[sources] def relabelOnly(parsed: DataFrame,
      rules: Seq[Relabel.Rule]): DataFrame = relabeled(parsed, rules)

  private def relabeled(parsed: DataFrame,
      rules: Seq[Relabel.Rule]): DataFrame =
    parsed
      .withColumn("labels", Relabel.relabelCol(
        map(lit("__name__"), col("name"), lit("k"), col("label_k")), rules))
      // a dropped sample (null map) or one whose __name__ a rule
      // removed cannot ingest — pruned at the door, upstream's rule
      .filter(col("labels").isNotNull &&
        coalesce(element_at(col("labels"), "__name__"), lit("")) =!= "")
      .select(col("scrape_ts"), col("labels"), col("value"))

  /** Upstream's `honor_labels` attach law — TARGET labels (instance,
    * job, plus any file-SD labels, post-relabeling) joining each
    * scraped sample's label map:
    *
    *  - `honorLabels = false` (upstream's default): the target pair
    *    always lands; an exposed label of the same name is RENAMED to
    *    `exported_<name>` first (never silently dropped);
    *  - `honorLabels = true`: the exposed label wins; the target pair
    *    attaches only where the sample doesn't carry the name.
    *
    * Pure column expression over the `(scrape_ts, labels, value)`
    * relation ([[parsePayloadsLabels]]'s shape) — no UDF, no shuffle;
    * target labels are plan literals (O(#targets) driver state, the
    * same bound upstream's scrape pool carries).
    */
  def attachTargetLabels(samples: DataFrame,
      targetLabels: Map[String, String],
      honorLabels: Boolean): DataFrame = {
    if (targetLabels.isEmpty) return samples
    val tmap = map(targetLabels.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    import org.apache.spark.sql.Column
    // overwrite-put, duplicate-safe under Spark's strict map policy
    def put(base: Column, k: String, v: Column): Column =
      map_concat(map_filter(base, (bk, _) => bk =!= lit(k)), map(lit(k), v))
    val attached =
      if (honorLabels)
        // exposed wins: attach only the target pairs the sample lacks
        map_concat(col("labels"), map_filter(tmap,
          (k, _) => !map_contains_key(col("labels"), k)))
      else
        // target wins — upstream's exact sequence per target pair:
        // a clashing exposed value moves to exported_<name>
        // (OVERWRITING any exposed exported_<name> twin, upstream's
        // labels.Builder.Set), then the target pair lands
        targetLabels.toSeq.sortBy(_._1).foldLeft(col("labels")) {
          case (acc, (k, v)) =>
            val moved = when(map_contains_key(acc, k),
              put(acc, s"exported_$k", element_at(acc, k)))
              .otherwise(acc)
            put(moved, k, lit(v))
        }
    samples.withColumn("labels", attached)
  }

  /** One scrape target's live status — the row `/api/v1/targets`
    * renders: never-scraped targets are `unknown`, a clean last fetch
    * is `up`, a failed one `down` with the error kept verbatim (the
    * Prometheus target-health model).
    */
  final case class TargetStatus(url: String, job: String,
      lastScrapeMs: Option[Long], lastError: Option[String],
      lastDurationS: Double) {
    def health: String =
      if (lastScrapeMs.isEmpty) "unknown"
      else if (lastError.isEmpty) "up" else "down"
    /** host:port of the scrape URL — the `instance` label. */
    def instance: String = {
      val u = new java.net.URI(url)
      if (u.getPort > 0) s"${u.getHost}:${u.getPort}" else u.getHost
    }
  }

  /** Scraped samples as the events-table schema, so the standard ingest
    * adapter ([[graft.operators.Metrics.metricEventsOf]]) and every
    * streaming operator behind it apply unchanged: one event per
    * (scrape, series) with the scrape instant as event time — exactly
    * a Prometheus server's sample model. `event_id` is a deterministic
    * hash of (scrape, series), so replayed ticks dedup under the
    * engine's exact-dedup guard.
    */
  def toEvents(samples: DataFrame): DataFrame =
    samples.select(
      xxhash64(col("scrape_ts"), col("name"), col("label_k")).as("event_id"),
      col("scrape_ts").as("ts"),
      lit(1L).as("user_id"),
      col("name").as("event_type"),
      col("value"),
      concat(lit("{\"k\": \""), col("label_k"), lit("\"}")).as("props"))
}

/** A tick-driven scrape loop over one target: each [[poll]] fetches the
  * endpoint once and appends the payload to the streaming relation —
  * the cooperative-scheduler tick of the reference's wire
  * (`run main 0.2`, `/root/reference/test.edn:8`) driven by the caller
  * (a test, a scheduler thread, a cron). Downstream queries read
  * [[events]] and process ticks as micro-batches.
  */
class ScrapeLoop(spark: SparkSession, url: String,
    openMetrics: Boolean = false, job: String = "graft",
    relabelConfigs: Seq[Relabel.Rule] = Nil,
    metricRelabelConfigs: Seq[Relabel.Rule] = Nil,
    honorLabels: Boolean = false,
    discoveryLabels: Map[String, String] = Map.empty) {
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val stream = MemoryStream[(java.sql.Timestamp, String)]
  // per-scrape SYNTHETIC samples (up / scrape_duration_seconds /
  // scrape_samples_scraped) — appended AFTER metric relabeling like
  // upstream's report samples, so no rule can drop the health signal
  private val synthetics =
    MemoryStream[(java.sql.Timestamp, String, String, Double)]
  // staleness: vanished series land here as (scrape_ts, name, label_k,
  // StaleMarker). The marker VALUE rides as encoder DATA, never as a
  // `lit()` — Literal codegen has no Java NaN literal and collapses
  // any NaN to the default bit pattern, which would erase the
  // marker's reserved payload ([[graft.model.Stale.Bits]])
  private val markers =
    MemoryStream[(java.sql.Timestamp, String, String, Double)]

  @volatile private var lastScrapeMs: Option[Long] = None
  @volatile private var lastError: Option[String] = None
  @volatile private var lastDurationS: Double = 0.0
  @volatile private var liveSeries: Set[(String, String)] = Set.empty

  /** Target relabeling (`relabel_configs`) — applied ONCE here, at the
    * target's discovery time, exactly like upstream (O(#targets),
    * never per sample). The input label set is the discovery
    * vocabulary this engine's targets carry; `None` = the target is
    * dropped and [[poll]] never fetches it.
    */
  val targetLabels: Option[Map[String, String]] = {
    val instance = ScrapeClient.TargetStatus(url, job, None, None, 0.0)
      .instance
    // discovery labels (a file-SD group's `labels`) OVERRIDE the
    // address-derived defaults, upstream's precedence: an SD `job` or
    // `instance` wins; `__address__` stays the wire address
    Relabel.relabelMap(Map(
      "__address__" -> instance, "instance" -> instance, "job" -> job) ++
      discoveryLabels, relabelConfigs)
  }

  /** True when `relabel_configs` dropped this target at discovery. */
  def dropped: Boolean = targetLabels.isEmpty

  /** The target's live health row for `/api/v1/targets` — under the
    * RELABELED job (a replace rule on `job` renames the target's
    * identity, upstream's behavior).
    */
  def status: ScrapeClient.TargetStatus =
    ScrapeClient.TargetStatus(url,
      targetLabels.flatMap(_.get("job")).getOrElse(job),
      lastScrapeMs, lastError, lastDurationS)

  /** The raw scrape relation: one (scrape_ts, payload) row per tick. */
  def payloads: DataFrame = stream.toDF().toDF("scrape_ts", "payload")

  /** Scraped samples as events-schema rows (see
    * [[ScrapeClient.toEvents]]) — feed to `metricEventsOf`,
    * `streamingRollup`, `evalStream`, or any other ingest consumer.
    * `metric_relabel_configs` apply inside the parse, so dropped
    * series never reach an ingest operator's state. STALENESS MARKERS
    * ([[ScrapeClient.StaleMarker]] samples for series a scrape no
    * longer exposes, or all of a failed target's series) ride the same
    * relation, relabeled identically — a staleness-aware consumer
    * drops a series whose LATEST sample is the marker.
    */
  def events: DataFrame = {
    val markerSamples = markers.toDF()
      .toDF("scrape_ts", "name", "label_k", "value")
    // synthetics bypass metric_relabel_configs (upstream appends the
    // report samples after relabeling — no rule can drop `up`)
    val reportSamples = synthetics.toDF()
      .toDF("scrape_ts", "name", "label_k", "value")
    ScrapeClient.toEvents(
      ScrapeClient.parsePayloads(payloads, metricRelabelConfigs)
        .unionByName(ScrapeClient.applyMetricRelabel(markerSamples,
          metricRelabelConfigs))
        .unionByName(reportSamples))
  }

  /** The FULL-label-map sample relation (`scrape_ts, labels, value`)
    * with the target's identity attached under the `honor_labels` law
    * ([[ScrapeClient.attachTargetLabels]]): every ingested sample
    * carries `instance`/`job` (plus file-SD labels) exactly as
    * upstream stores it. Markers and report samples ride the same
    * attach, so a down target's `up = 0` is addressable by target.
    */
  def labeledEvents: DataFrame = {
    val markerSamples = markers.toDF()
      .toDF("scrape_ts", "name", "label_k", "value")
    val reportSamples = synthetics.toDF()
      .toDF("scrape_ts", "name", "label_k", "value")
    // report samples carry ONLY `__name__` of their own — the target
    // identity below is their whole label set, exactly upstream's
    // `up{instance, job}` shape (no exposed `k`)
    val reportLabeled = reportSamples.select(col("scrape_ts"),
      map(lit("__name__"), col("name")).as("labels"), col("value"))
    val samples = ScrapeClient
      .parsePayloadsLabels(payloads, metricRelabelConfigs)
      .unionByName(ScrapeClient.relabelOnly(markerSamples,
        metricRelabelConfigs))
      .unionByName(reportLabeled)
    // meta labels (`__address__` and friends) are dropped before
    // ingestion, upstream's post-relabel strip — only `__name__` (the
    // sample's own) plus the real target identity reach storage
    ScrapeClient.attachTargetLabels(samples,
      targetLabels.getOrElse(Map.empty)
        .filter { case (k, _) => !k.startsWith("__") }, honorLabels)
  }

  /** One tick: fetch now (or at the given instant) and append. A
    * failed fetch records target-down state instead of throwing — a
    * Prometheus keeps scraping through outages, and `/api/v1/targets`
    * shows the health — and marks EVERY live series of the target
    * stale at the failed instant (upstream's behavior: a down target's
    * series must not serve through the lookback window). A
    * relabel-dropped target never fetches.
    */
  def poll(atMs: Long = System.currentTimeMillis()): Unit = {
    if (dropped) return
    val t0 = System.nanoTime()
    var up = 0.0
    var scraped = 0L
    try {
      val body = ScrapeClient.fetch(url, openMetrics)
      stream.addData((new java.sql.Timestamp(atMs), body))
      markVanished(ScrapeClient.seriesOf(body), atMs)
      lastError = None
      up = 1.0
      scraped = ScrapeClient.sampleCount(body)
    } catch {
      case e: Exception =>
        markVanished(Set.empty, atMs)
        lastError = Some(e.toString)
    } finally {
      lastScrapeMs = Some(atMs)
      lastDurationS = (System.nanoTime() - t0) / 1e9
      // upstream's report samples, emitted after EVERY attempt (failed
      // ones included — `up = 0` IS the signal): per-target gauges
      // keyed by the relabeled instance identity
      val ts = new java.sql.Timestamp(atMs)
      val inst = targetLabels.flatMap(_.get("instance"))
        .getOrElse(status.instance)
      synthetics.addData(
        (ts, "up", inst, up),
        (ts, "scrape_duration_seconds", inst, lastDurationS),
        (ts, "scrape_samples_scraped", inst, scraped.toDouble))
    }
  }

  /** Target REMOVAL (a file-SD group no longer lists it): every live
    * series gets a staleness marker and `up` goes stale too, so the
    * retired target's series cut immediately instead of serving
    * through the lookback window — upstream's scrape-loop-stop
    * behavior.
    */
  private[sources] def retire(atMs: Long): Unit = {
    markVanished(Set.empty, atMs)
    val ts = new java.sql.Timestamp(atMs)
    val inst = targetLabels.flatMap(_.get("instance"))
      .getOrElse(status.instance)
    synthetics.addData(
      (ts, "up", inst, ScrapeClient.StaleMarker),
      (ts, "scrape_duration_seconds", inst, ScrapeClient.StaleMarker),
      (ts, "scrape_samples_scraped", inst, ScrapeClient.StaleMarker))
  }

  /** Diff this tick's series set against the last one; vanished series
    * get a staleness marker at this tick's instant (sorted for a
    * deterministic append order).
    */
  private def markVanished(now: Set[(String, String)], atMs: Long): Unit = {
    val gone = (liveSeries -- now).toSeq.sorted
    if (gone.nonEmpty)
      markers.addData(gone.map { case (n, k) =>
        (new java.sql.Timestamp(atMs), n, k, ScrapeClient.StaleMarker)
      }: _*)
    liveSeries = now
  }
}
