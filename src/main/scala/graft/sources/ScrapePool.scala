package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** FILE-BASED TARGET DISCOVERY over a pool of scrape loops —
  * upstream's `file_sd_configs`: the target list lives in a JSON file
  * (`[{"targets": ["host:port", ...], "labels": {"job": "...", ...}},
  * ...]`), and the pool re-reads it on every poll tick, so target
  * adds/removes take effect without a restart (upstream watches the
  * file; per-tick re-read is the same convergence with this engine's
  * caller-driven tick — the file is O(#targets) driver state either
  * way).
  *
  * Lifecycle per tick ([[poll]]):
  *  - a NEW address spawns a [[ScrapeLoop]] carrying the group's
  *    labels as discovery labels (relabeling and `honor_labels` apply
  *    per target exactly as on a static loop);
  *  - a REMOVED address retires its loop: every live series gets a
  *    staleness marker and the target's `up` goes stale
  *    ([[ScrapeLoop.retire]]), upstream's scrape-loop-stop behavior;
  *  - surviving addresses poll.
  *
  * Scale shape: discovery is one driver-side file read per tick
  * (upstream's SD manager cost); everything downstream — parse,
  * relabel, events — is the loops' own distributed pipeline, and
  * [[events]] is one union over the live loops' streaming relations.
  *
  * Reference hook: the reference exposes one `/metrics` endpoint
  * (`/root/reference/prometheus.cpp:47,73`) and leaves discovery to
  * the scraping server; this is that server's discovery half.
  */
class ScrapePool(spark: SparkSession, sdFile: String,
    openMetrics: Boolean = false,
    relabelConfigs: Seq[Relabel.Rule] = Nil,
    metricRelabelConfigs: Seq[Relabel.Rule] = Nil,
    honorLabels: Boolean = false) {

  // url -> live loop, in first-discovery order (stable /api/v1/targets
  // rendering); retired loops keep their streams alive so their
  // markers stay readable, but leave the pool
  private val loops =
    new scala.collection.mutable.LinkedHashMap[String, ScrapeLoop]
  private val retiredLoops =
    new scala.collection.mutable.ArrayBuffer[ScrapeLoop]

  /** Parse the file-SD JSON into (address, labels) pairs — one entry
    * per listed target, the group's labels shared. Malformed JSON
    * throws (the caller keeps the previous target set, upstream's
    * behavior on a bad SD file: [[poll]] catches and keeps serving).
    */
  private[sources] def readSd(): Seq[(String, Map[String, String])] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Path.of(sdFile)))
    require(root.isArray, s"file-SD $sdFile: top level must be an array")
    import scala.jdk.CollectionConverters._
    root.elements.asScala.flatMap { group =>
      val labels = Option(group.get("labels")).filter(_.isObject)
        .map(_.properties.asScala
          .map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty[String, String])
      Option(group.get("targets")).filter(_.isArray)
        .map(_.elements.asScala.map(_.asText).toSeq)
        .getOrElse(Nil)
        .map(addr => addr -> labels)
    }.toSeq
  }

  @volatile private var lastSdError: Option[String] = None

  /** The last SD read's health — `None` after a clean read; a bad file
    * leaves the previous target set standing and the error here.
    */
  def sdError: Option[String] = lastSdError

  /** Re-read the SD file and converge the pool, then poll every live
    * target at `atMs`. An unreadable/malformed file keeps the previous
    * target set scraping (upstream's SD behavior — discovery failure
    * must not take running targets down).
    */
  def poll(atMs: Long = System.currentTimeMillis()): Unit = {
    try {
      val desired = readSd()
      lastSdError = None
      val desiredUrls = desired.map { case (addr, _) =>
        s"http://$addr/metrics"
      }.toSet
      // retire removed targets first (their markers carry this tick's
      // instant, strictly before any re-added series' new samples)
      val gone = loops.keys.filterNot(desiredUrls.contains).toSeq
      gone.foreach { url =>
        val l = loops.remove(url).get
        l.retire(atMs)
        retiredLoops += l
      }
      desired.foreach { case (addr, labels) =>
        val url = s"http://$addr/metrics"
        if (!loops.contains(url))
          loops.put(url, new ScrapeLoop(spark, url, openMetrics,
            job = labels.getOrElse("job", "graft"),
            relabelConfigs = relabelConfigs,
            metricRelabelConfigs = metricRelabelConfigs,
            honorLabels = honorLabels,
            discoveryLabels = labels))
      }
    } catch {
      case e: Exception => lastSdError = Some(e.toString)
    }
    loops.values.foreach(_.poll(atMs))
  }

  /** Live targets' health rows (`/api/v1/targets`), discovery order. */
  def statuses: Seq[ScrapeClient.TargetStatus] =
    loops.values.map(_.status).toSeq

  /** The pool's event relation: the union of every loop's events —
    * live AND retired (a retired target's staleness markers must stay
    * readable). Re-call after [[poll]] to pick up newly discovered
    * targets' relations.
    */
  def events: DataFrame = {
    val all = (loops.values ++ retiredLoops).map(_.events).toSeq
    require(all.nonEmpty, s"file-SD $sdFile discovered no targets yet")
    all.reduce(_ unionByName _)
  }

  /** [[events]] with the full label map and target identity attached
    * ([[ScrapeLoop.labeledEvents]]) — the honor_labels-governed face.
    */
  def labeledEvents: DataFrame = {
    val all = (loops.values ++ retiredLoops).map(_.labeledEvents).toSeq
    require(all.nonEmpty, s"file-SD $sdFile discovered no targets yet")
    all.reduce(_ unionByName _)
  }
}
