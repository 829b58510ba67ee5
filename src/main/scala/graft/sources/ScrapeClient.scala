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
    */
  def parsePayloads(payloads: DataFrame): DataFrame =
    payloads
      .select(col("scrape_ts"), explode(split(col("payload"), "\n")).as("line"))
      .filter(col("line").rlike(LineRe))
      .select(
        col("scrape_ts"),
        regexp_replace(regexp_extract(col("line"), LineRe, 1), "_total$", "")
          .as("name"),
        regexp_extract(col("line"), LineRe, 2).as("label_k"),
        regexp_extract(col("line"), LineRe, 3).cast("double").as("value"))

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
    openMetrics: Boolean = false, job: String = "graft") {
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val stream = MemoryStream[(java.sql.Timestamp, String)]

  @volatile private var lastScrapeMs: Option[Long] = None
  @volatile private var lastError: Option[String] = None
  @volatile private var lastDurationS: Double = 0.0

  /** The target's live health row for `/api/v1/targets`. */
  def status: ScrapeClient.TargetStatus =
    ScrapeClient.TargetStatus(url, job, lastScrapeMs, lastError,
      lastDurationS)

  /** The raw scrape relation: one (scrape_ts, payload) row per tick. */
  def payloads: DataFrame = stream.toDF().toDF("scrape_ts", "payload")

  /** Scraped samples as events-schema rows (see
    * [[ScrapeClient.toEvents]]) — feed to `metricEventsOf`,
    * `streamingRollup`, `evalStream`, or any other ingest consumer.
    */
  def events: DataFrame =
    ScrapeClient.toEvents(ScrapeClient.parsePayloads(payloads))

  /** One tick: fetch now (or at the given instant) and append. A
    * failed fetch records target-down state instead of throwing — a
    * Prometheus keeps scraping through outages, and `/api/v1/targets`
    * shows the health.
    */
  def poll(atMs: Long = System.currentTimeMillis()): Unit = {
    val t0 = System.nanoTime()
    try {
      val body = ScrapeClient.fetch(url, openMetrics)
      stream.addData((new java.sql.Timestamp(atMs), body))
      lastError = None
    } catch {
      case e: Exception => lastError = Some(e.toString)
    } finally {
      lastScrapeMs = Some(atMs)
      lastDurationS = (System.nanoTime() - t0) / 1e9
    }
  }
}
