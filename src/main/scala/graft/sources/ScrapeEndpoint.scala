package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.streaming.ExpositionRegistry

/** The reference's defining surface made LITERAL: an HTTP pull endpoint
  * serving the current metric snapshot as Prometheus text exposition —
  * the Exposer the reference constructs at `0.0.0.0:9090` and scrapes
  * through `/metrics` (`/root/reference/prometheus.cpp:47,73`).
  *
  * Spark-first inversion, same wire contract: the reference serves from
  * an in-process registry its blocks mutate; this engine serves from
  * [[graft.streaming.ExpositionRegistry]], which the Structured
  * Streaming serving sink keeps current per micro-batch
  * (`MetricStream.startServingSink`). A scrape reads the concurrent
  * map — O(#series), never a Spark job, never blocking ingest — the
  * exact hand-off prometheus-cpp gets from its atomics
  * (`prometheus.cpp:80`).
  *
  * The payload renders `name{k="v"} value` lines, sorted, with the
  * value printed from integer cents — the same renderer contract as the
  * oracle-gated a1c query ([[graft.operators.PromQL.expositionText]]),
  * so the HTTP bytes equal the engine's hash-checked exposition rows
  * for the same series state. Content type is the Prometheus text
  * format's `text/plain; version=0.0.4`.
  *
  * JDK-built-in `com.sun.net.httpserver` — zero added dependencies.
  */
object ScrapeEndpoint {

  val ContentType = "text/plain; version=0.0.4; charset=utf-8"

  /** OpenMetrics 1.0 content type, served when the scraper negotiates
    * it (Prometheus sends exactly this Accept value since 2.5).
    */
  val OpenMetricsContentType =
    "application/openmetrics-text; version=1.0.0; charset=utf-8"

  /** Cents → decimal string with the sign rendered separately (JVM
    * truncating `/` and sign-keeping `%` would print `0.-50` for a
    * negative total).
    */
  private def centsStr(cents: Long): String = {
    val a = Math.abs(cents)
    s"${if (cents < 0) "-" else ""}${a / 100}.${"%02d".format(a % 100)}"
  }

  /** Render the registry snapshot as exposition text: one sorted
    * `name{k="v"} intpart.fraction2` line per series, trailing newline.
    * Cents rendering matches a1c: pure integer/string ops, so the same
    * series state always prints the same bytes.
    */
  def renderText(): String = {
    val lines = ExpositionRegistry.series().map { t =>
      val cents = Math.round(t.total * 100.0)
      s"""${t.name}{k="${t.label_k}"} ${centsStr(cents)}"""
    }.sorted
    lines.mkString("", "\n", if (lines.nonEmpty) "\n" else "")
  }

  /** The same registry snapshot as an OpenMetrics 1.0 payload — the
    * format a modern Prometheus negotiates via
    * `Accept: application/openmetrics-text`: `# TYPE` header per
    * family, counter samples under the `_total` suffix, terminating
    * `# EOF\n`. The renderer contract matches the oracle-gated a1e
    * query ([[graft.operators.PromQL.openMetricsText]]) — cents
    * rendering, family-then-series sort — restricted to the counter
    * families the serving sink publishes.
    */
  def renderOpenMetrics(): String = {
    val ss = ExpositionRegistry.series()
    val fams = ss.groupBy(_.name).toSeq.sortBy(_._1)
    val blocks = fams.map { case (fam, ts) =>
      val lines = ts.map { t =>
        val cents = Math.round(t.total * 100.0)
        s"""${t.name}_total{k="${t.label_k}"} ${centsStr(cents)}"""
      }.sorted
      (s"# TYPE $fam counter" +: lines).mkString("\n")
    }
    blocks.mkString("", "\n", if (blocks.nonEmpty) "\n# EOF\n" else "# EOF\n")
  }

  /** Start the pull endpoint on `port` (0 = ephemeral; read the bound
    * port from the returned server). GET `/metrics` serves the
    * snapshot; anything else 404s, exactly like the reference's single
    * registered handler. The server runs on its own dispatcher thread
    * and holds no Spark state — stop it with `server.stop(0)`.
    */
  /** Gzip content negotiation shared by every HTTP door: frame `plain`
    * with gzip (setting `Content-Encoding`) iff the client's
    * `Accept-Encoding` lists gzip with a positive q-value — a client
    * sending `gzip;q=0` has explicitly REFUSED gzip (RFC 7231 §5.3.4)
    * and must get identity bytes.
    */
  private[sources] def gzipIfAccepted(ex: HttpExchange,
      plain: Array[Byte]): Array[Byte] = {
    val wantsGzip = Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
      .exists(_.toLowerCase.split(',').exists { entry =>
        val parts = entry.split(';').map(_.trim)
        parts.headOption.contains("gzip") &&
          !parts.tail.exists(p => p.startsWith("q=") &&
            (try p.stripPrefix("q=").toDouble <= 0.0
             catch { case _: NumberFormatException => false }))
      })
    if (!wantsGzip) plain
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      try gz.write(plain) finally gz.close()
      ex.getResponseHeaders.set("Content-Encoding", "gzip")
      bos.toByteArray
    }
  }

  def start(port: Int = 0): HttpServer = {
    val server = HttpServer.create(new java.net.InetSocketAddress(port), 0)
    server.createContext("/metrics", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
        val om = accept.contains("application/openmetrics-text")
        val text = if (om) renderOpenMetrics() else renderText()
        val plain = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        // a real Prometheus scrapes with Accept-Encoding: gzip — serve
        // the identical payload gzip-framed when asked (identity stays
        // the default for curl/humans)
        val body = gzipIfAccepted(ex, plain)
        ex.getResponseHeaders.set("Content-Type",
          if (om) OpenMetricsContentType else ContentType)
        ex.sendResponseHeaders(200, body.length.toLong)
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
      }
    })
    server.setExecutor(null)
    server.start()
    server
  }
}
