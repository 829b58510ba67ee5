package graft.sources

import org.apache.spark.sql.SparkSession

/** The alert DELIVERY half of the alerting pipeline — what a Prometheus
  * server does with firing alerts: POST them to an Alertmanager's
  * `/api/v2/alerts` as a JSON array of `{labels, annotations, startsAt,
  * generatorURL}` objects. The rules engine and the `/api/v1/alerts`
  * read side already exist ([[graft.promql.Rules]],
  * `Api.alertsJson`); this closes the outbound arrow.
  *
  * Upstream semantics kept:
  *  - only FIRING instances notify (pending stay server-side);
  *  - every [[notify]] re-sends the full current firing set — an
  *    Alertmanager dedups by label set, so re-sending is the liveness
  *    contract, not a bug;
  *  - delivery failures are RECORDED, never thrown — a server rides
  *    through Alertmanager outages exactly like the remote-write
  *    forwarder ([[RemoteWriteClient]]).
  *
  * One evaluation = one POST of O(#firing series) bytes: the rule plans
  * run distributed, only the firing rows collect (the same O(#series)
  * serving-layer cost class as every other endpoint).
  */
class AlertNotifier(url: String) {

  @volatile private var lastNotifyMs: Option[Long] = None
  @volatile private var lastError: Option[String] = None
  @volatile private var lastSent: Int = 0

  /** (last notify instant, last error, alerts in the last POST). */
  def status: (Option[Long], Option[String], Int) =
    (lastNotifyMs, lastError, lastSent)

  /** One notification pass: evaluate the rules, POST the firing set.
    * Returns the HTTP code (Alertmanager answers 200) or -1 on a
    * transport failure. An empty firing set skips the POST and returns
    * 204 locally (nothing to deliver is not an error).
    */
  def notify(spark: SparkSession, dir: String,
      rules: Seq[graft.promql.Rules.AlertRule],
      atMs: Long = System.currentTimeMillis(),
      externalLabels: Map[String, String] = Map.empty): Int = {
    val body = graft.promql.Api.firingAlertsBody(spark, dir, rules,
      externalLabels)
    lastNotifyMs = Some(atMs)
    if (body == "[]") { lastSent = 0; lastError = None; return 204 }
    lastSent = "\\{\"labels\":".r.findAllIn(body).length // one per item
    try {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      try {
        val os = conn.getOutputStream
        try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally os.close()
        val code = conn.getResponseCode
        lastError = if (code >= 200 && code < 300) None else Some(s"HTTP $code")
        code
      } finally conn.disconnect()
    } catch {
      case e: Exception => lastError = Some(e.toString); -1
    }
  }
}
