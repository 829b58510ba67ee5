package graft.model

import java.sql.Timestamp

/** The normative sample/observation row of the metric data model.
  *
  * Mirrors the reference's value system: one float observation per tick,
  * addressed by metric family name + 0..1 label pairs
  * (`/root/reference/prometheus.cpp:189-192`), one of three sample kinds —
  * counter (`prometheus.cpp:177-215`), gauge (`:217-252`), histogram
  * (`:256-306`). Time (`ts`) is a first-class column because the Spark
  * engine also answers the scraped-TSDB query surface (SURVEY.md §2.2),
  * where the reference delegates time to the scraping server.
  *
  * A series identity is `(name, labels)`. We carry a pre-normalized
  * `labelK` column (the single label value for key "k") so grouping keys
  * are flat strings — cheap to hash, shuffle, and sort at 100 TB — rather
  * than MapType canonicalization on every exchange.
  */
final case class MetricEvent(
    ts: Timestamp,
    name: String,
    labelK: String,
    kind: String,
    value: Double,
    eventId: Long
)

object MetricEvent {
  /** Sample kinds, assigned per metric family (event_type):
    * clicks/views/purchases accumulate (counter), signups set a level
    * (gauge), error magnitudes are distribution observations (histogram).
    */
  val CounterNames: Seq[String] = Seq("click", "view", "purchase")
  val GaugeNames: Seq[String] = Seq("signup") ++ SyntheticNames
  val HistogramNames: Seq[String] = Seq("error")

  /** The per-target SYNTHETIC series a scrape appends after every
    * attempt (up / scrape health telemetry — what `up == 0` alerts and
    * meta-monitoring dashboards read). All gauges: each scrape SETS the
    * target's current level. The scrape loop emits them
    * ([[graft.sources.ScrapeLoop.poll]]); the parquet corpora never
    * carry these event types, so batch oracles are unaffected.
    */
  def SyntheticNames: Seq[String] =
    Seq("up", "scrape_duration_seconds", "scrape_samples_scraped")

  /** Explicit histogram bucket boundaries — the `Buckets` float-seq param
    * of `Prometheus.Histogram` (`/root/reference/prometheus.cpp:111-113`).
    */
  val Buckets: Seq[Double] = Seq(1.0, 5.0, 10.0, 25.0, 50.0, 100.0, 150.0)
}
