package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.promql.Api

/** The Prometheus HTTP *query* API, served over the same zero-dependency
  * JDK server as the `/metrics` pull endpoint ([[ScrapeEndpoint]]) — the
  * read half of the wire contract whose write half the reference's
  * Exposer carries (`/root/reference/prometheus.cpp:47,73`): a Grafana
  * pointed at this port speaks to the engine like a Prometheus server.
  *
  *  - `GET /api/v1/query?query=<promql>` → instant vector envelope
  *    ([[Api.queryJson]]);
  *  - `GET /api/v1/query_range?query=…&start=…&end=…&step=…` → matrix
  *    envelope ([[Api.queryRangeJson]] — dense-grid when the shape
  *    allows, per-instant union otherwise);
  *  - `GET /api/v1/series?match[]=<selector>`, `GET /api/v1/labels`,
  *    `GET /api/v1/label/<name>/values` → the metadata endpoints.
  *
  * Handlers evaluate Spark plans synchronously (the cached adapter
  * relations make repeat queries cheap); compose-time errors surface as
  * Prometheus's own error envelope
  * `{"status":"error","errorType":"bad_data","error":…}` with HTTP 400,
  * so clients see exactly the upstream failure shape. Timestamps accept
  * integer or decimal epoch seconds (the API's numeric form); `step`
  * additionally accepts a PromQL duration literal like `6h`.
  */
object QueryEndpoint {

  val ContentType = "application/json; charset=utf-8"

  private val DurationRe = "([0-9]+)(ms|s|m|h|d|w|y)".r

  /** Epoch seconds from the API's numeric form (integer or decimal —
    * fractions floor, matching the engine's integer-second anchoring).
    */
  /** Upstream accepts unix seconds (float) AND RFC3339 timestamps for
    * every time parameter; Grafana sends unix, `promtool`/humans send
    * RFC3339.
    */
  private def epochS(s: String): Long =
    try java.lang.Double.parseDouble(s).toLong
    catch {
      case _: NumberFormatException =>
        java.time.OffsetDateTime.parse(s).toInstant.getEpochSecond
    }

  private def stepS(s: String): Long = s match {
    case DurationRe(n, u) =>
      val mult = u match {
        case "ms" => 0L // sub-second steps floor to 0 and fail loud below
        case "s" => 1L
        case "m" => 60L
        case "h" => 3600L
        case "d" => 86400L
        case "w" => 7L * 86400L
        case "y" => 365L * 86400L
      }
      n.toLong * mult
    case other => epochS(other)
  }

  private def decodePairs(raw: String): Seq[(String, String)] =
    raw.split('&').toSeq
      .filter(_.nonEmpty)
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(
            java.net.URLDecoder.decode(k, "UTF-8") ->
              java.net.URLDecoder.decode(v, "UTF-8"))
          case _ => None
        }
      }

  /** A form-encoded POST body's parameters — upstream accepts POST on
    * every query endpoint (Grafana POSTs by default: long PromQL
    * overflows URL limits), merging body and URL parameters with the
    * BODY taking precedence (Go's `Request.FormValue` rule, which
    * upstream's parsing rides on). Non-form bodies contribute nothing.
    */
  private def formPairs(ex: HttpExchange): Seq[(String, String)] =
    if (ex.getRequestMethod == "POST" &&
        Option(ex.getRequestHeaders.getFirst("Content-Type"))
          .exists(_.toLowerCase.startsWith("application/x-www-form-urlencoded")))
      decodePairs(new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
    else Nil

  /** Call AT MOST ONCE per exchange (the body stream reads once; do NOT
    * memoize on exchange attributes — those are per-CONTEXT in the JDK
    * server and would leak one request's parameters into the next).
    * Handlers needing both the map and repeated keys derive both from
    * one [[multiParams]] call.
    */
  private def params(ex: HttpExchange): Map[String, String] =
    multiParams(ex).toMap

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def errorBody(msg: String): String =
    s"""{"status":"error","errorType":"bad_data","error":"${jsonEscape(msg)}"}"""

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String = ContentType): Unit = {
    val plain = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // content negotiation like upstream's httputil wrapper: a client
    // advertising `Accept-Encoding: gzip` (with positive q) gets the
    // identical bytes gzip-framed — shared negotiation logic with the
    // exposition door
    val bytes = ScrapeEndpoint.gzipIfAccepted(ex, plain)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def handler(f: HttpExchange => String,
      contentType: String = ContentType): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try respond(ex, 200, f(ex), contentType)
        catch {
          case e: Exception =>
            respond(ex, 400, errorBody(Option(e.getMessage).getOrElse(
              e.getClass.getSimpleName)))
        }
    }

  /** Repeated-key parameters (`match[]` may appear many times), URL
    * query plus any form-encoded POST body: both lists contribute for
    * repeated keys (upstream unions them), and because the body pairs
    * come LAST, `.toMap` gives single-value keys Go's
    * `Request.FormValue` precedence (body wins) — which is what
    * upstream's parsing rides on. Reads the request body: call at most
    * once per exchange.
    */
  private def multiParams(ex: HttpExchange): Seq[(String, String)] =
    decodePairs(Option(ex.getRequestURI.getRawQuery).getOrElse("")) ++
      formPairs(ex)

  private def required(p: Map[String, String], k: String): String =
    p.getOrElse(k, throw new IllegalArgumentException(
      s"missing required parameter '$k'"))

  /** Start the query API for `(spark, dir)` on `port` (0 = ephemeral).
    * `nativeFamilies` routes those histogram families through the
    * native sparse-bucket plans, like [[Api.queryRangeJson]].
    * `alertRules`/`recordingRules` are the server's standing rule file
    * — served live on `/api/v1/rules` and `/api/v1/alerts`.
    */
  def start(spark: SparkSession, dir: String, port: Int = 0,
      nativeFamilies: Set[String] = Set.empty,
      alertRules: Seq[graft.promql.Rules.AlertRule] = Nil,
      recordingRules: Seq[graft.promql.Rules.RecordingRule] = Nil,
      scrapeTargets: Seq[ScrapeLoop] = Nil,
      remoteWrite: Option[RemoteWriteSink] = None,
      resultsCache: Boolean = false,
      alertmanagers: Seq[(String, AlertNotifier)] = Nil,
      readSampleLimit: Long = RemoteRead.DefaultSampleLimit,
      readHists: Option[org.apache.spark.sql.DataFrame] = None,
      readFHists: Option[org.apache.spark.sql.DataFrame] = None,
      readSampleBytesLimit: Long =
        RemoteRead.DefaultSampleBytesLimit,
      otlpDeltaToCumulative: Boolean = false,
      externalLabels: Map[String, String] = Map.empty,
      ruleFile: Option[String] = None,
      scrapePool: Option[ScrapePool] = None): HttpServer = {
    // the 3.x flag-gated OTLP delta path: one cross-request conversion
    // state per server instance (O(#series) driver state)
    val otlpDelta: Option[Otlp.DeltaState] =
      if (otlpDeltaToCumulative) Some(new Otlp.DeltaState) else None
    // the standing rule file, RELOADABLE: `ruleFile` (a path in the
    // [[graft.promql.RuleConfig]] grammar) takes precedence over the
    // inline params; `POST /-/reload` re-reads it and bumps the
    // results-cache epoch so no handler ever serves an answer computed
    // under the old rules. Handlers read through `aRules`/`rRules` at
    // REQUEST time, so a swap is visible on the very next request.
    // external_labels reload with the rules: a config file's `global:`
    // section overrides the inline param, and `/-/reload` swaps both
    // atomically (no request ever sees new rules with old identity)
    val rulesRef = new java.util.concurrent.atomic.AtomicReference[
        (Seq[graft.promql.Rules.AlertRule],
          Seq[graft.promql.Rules.RecordingRule],
          Map[String, String])](
      ruleFile.map(graft.promql.RuleConfig.loadFull)
        .map { case (a, r, ext) =>
          (a, r, if (ext.nonEmpty) ext else externalLabels) }
        .getOrElse((alertRules, recordingRules, externalLabels)))
    def aRules = rulesRef.get()._1
    def rRules = rulesRef.get()._2
    def extLabels = rulesRef.get()._3
    val server = HttpServer.create(new java.net.InetSocketAddress(port), 0)
    // remote-write receiver: POST of a snappy-framed WriteRequest; 204
    // on accept (upstream's receiver contract), 400 on malformed bytes,
    // 405 on non-POST. Absent a configured sink every POST is a 400 —
    // this server has no write path to offer.
    server.createContext("/api/v1/write", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          if (ex.getRequestMethod != "POST") {
            respond(ex, 405, errorBody("remote write requires POST"))
          } else {
            val body = ex.getRequestBody.readAllBytes()
            remoteWrite match {
              case Some(sink) =>
                val ct = Option(ex.getRequestHeaders.getFirst("Content-Type"))
                val written = sink.receive(body, contentType = ct)
                // the 2.0 receiver contract: report accepted counts
                ex.getResponseHeaders.set(
                  "X-Prometheus-Remote-Write-Samples-Written",
                  written.toString)
                ex.sendResponseHeaders(204, -1L)
                ex.getResponseBody.close()
              case None => respond(ex, 400,
                errorBody("remote write is not configured on this server"))
            }
          }
        } catch {
          case e: Exception =>
            respond(ex, 400, errorBody(Option(e.getMessage).getOrElse(
              e.getClass.getSimpleName)))
        }
    })
    // remote READ: the outbound arrow of the wire contract — POST of a
    // snappy-framed ReadRequest, answered with a snappy-framed
    // ReadResponse (SAMPLES, the mandatory baseline) or CRC-framed XOR
    // chunks (the streamed face a Thanos querier asks for by default,
    // served INCREMENTALLY — chunked transfer, frames leave as the
    // ordered scan produces them, driver memory stays bounded);
    // malformed bytes 400, selection over the sample budget 413,
    // non-POST 405. Everything that can fail cleanly runs in
    // prepareRead BEFORE response headers commit.
    server.createContext("/api/v1/read", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        var committed = false
        try {
          if (ex.getRequestMethod != "POST") {
            respond(ex, 405, errorBody("remote read requires POST"))
          } else {
            // recording-rule series ride the read door too (upstream's
            // rule loop writes them into the TSDB a reader pulls from):
            // the lattice relation rebuilds per request — two cheap
            // column-pruned driver aggregates for the span — so admin
            // mutations (delete_series) and corpus growth stay live. A
            // rule whose relation can't build (broken expression, a
            // shape the grid tier declines) is SKIPPED with a server
            // log, like upstream's per-group rule health: one bad rule
            // never takes the whole door down.
            val recorded =
              if (rRules.isEmpty) None
              else {
                val rels = rRules.flatMap { r =>
                  try Some(graft.promql.Rules
                    .recordedSeriesRelation(spark, dir, r))
                  catch {
                    case e: Exception =>
                      System.err.println(
                        s"[remote-read] rule '${r.record}' not servable: $e")
                      None
                  }
                }
                rels.reduceOption(_ unionAll _)
              }
            val prepared = RemoteRead.prepareRead(spark, dir,
              ex.getRequestBody.readAllBytes(),
              sampleLimit = readSampleLimit,
              hists = readHists, fhists = readFHists,
              recorded = recorded,
              sampleBytesLimit = readSampleBytesLimit)
            prepared match {
              case RemoteRead.SamplesAnswer(body) =>
                ex.getResponseHeaders.set("Content-Type",
                  "application/x-protobuf")
                ex.getResponseHeaders.set("Content-Encoding", "snappy")
                ex.sendResponseHeaders(200, body.length.toLong)
                committed = true
                val os = ex.getResponseBody
                try os.write(body) finally os.close()
              case streamed =>
                ex.getResponseHeaders.set("Content-Type",
                  "application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse")
                ex.sendResponseHeaders(200, 0L) // chunked: length unknown
                committed = true
                val os = ex.getResponseBody
                try streamed.writeTo(os) finally os.close()
            }
          }
        } catch {
          // a failure AFTER the 200 committed (a Spark task dying
          // mid-stream) cannot become a status line anymore: surface
          // the root cause server-side and cut the stream — the client
          // sees a truncated chunked body, the log sees why. respond()
          // on a committed exchange would raise a secondary
          // headers-already-sent error that MASKS the real failure.
          case e: Exception if committed =>
            System.err.println(s"[remote-read] mid-stream failure: $e")
            try ex.close() catch { case _: Exception => () }
          case e: RemoteRead.LimitExceeded =>
            respond(ex, 413, errorBody(Option(e.getMessage).getOrElse(
              e.getClass.getSimpleName)))
          case e: Exception =>
            respond(ex, 400, errorBody(Option(e.getMessage).getOrElse(
              e.getClass.getSimpleName)))
        }
      }
    })
    // the OTLP door: an OpenTelemetry collector's protobuf export,
    // translated by the public compatibility rules and normalized onto
    // the same stream wire shape as remote write (200 empty response on
    // accept, like upstream's OTLP receiver; gzip bodies negotiate by
    // Content-Encoding; malformed bytes and delta sums 400)
    server.createContext("/api/v1/otlp/v1/metrics", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          if (ex.getRequestMethod != "POST") {
            respond(ex, 405, errorBody("OTLP ingest requires POST"))
          } else remoteWrite match {
            case Some(sink) =>
              val raw = ex.getRequestBody.readAllBytes()
              val body =
                if (Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
                  .exists(_.contains("gzip"))) {
                  val in = new java.util.zip.GZIPInputStream(
                    new java.io.ByteArrayInputStream(raw))
                  try in.readAllBytes() finally in.close()
                } else raw
              sink.receiveSeries(Otlp.translate(Otlp.walk(body), otlpDelta))
              ex.sendResponseHeaders(200, -1L)
              ex.getResponseBody.close()
            case None => respond(ex, 400,
              errorBody("OTLP ingest is not configured on this server"))
          }
        } catch {
          case e: Exception =>
            respond(ex, 400, errorBody(Option(e.getMessage).getOrElse(
              e.getClass.getSimpleName)))
        }
    })
    // the TSDB admin API (upstream gates it behind
    // --web.enable-admin-api; this server exists to serve the engine's
    // own capabilities, so it is always on): delete_series records
    // tombstones and returns 204 — every query excludes the covered
    // samples immediately; clean_tombstones applies them physically
    // (204); snapshot writes a consistent copy and returns its name.
    def adminHandler(f: HttpExchange => Option[String]): HttpHandler =
      new HttpHandler {
        override def handle(ex: HttpExchange): Unit =
          try {
            if (ex.getRequestMethod != "POST" && ex.getRequestMethod != "PUT") {
              respond(ex, 405, errorBody("admin endpoints require POST or PUT"))
            } else f(ex) match {
              case Some(body) => respond(ex, 200, body)
              case None =>
                ex.sendResponseHeaders(204, -1L)
                ex.getResponseBody.close()
            }
          } catch {
            case e: Exception =>
              respond(ex, 400, errorBody(Option(e.getMessage).getOrElse(
                e.getClass.getSimpleName)))
          }
      }
    server.createContext("/api/v1/admin/tsdb/delete_series", adminHandler { ex =>
      val mp = multiParams(ex) // one body read: map + repeats from it
      val ms = mp.collect { case ("match[]", v) => v }
      val p = mp.toMap
      graft.promql.Admin.deleteSeries(spark, dir, ms,
        p.get("start").map(epochS), p.get("end").map(epochS))
      None
    })
    server.createContext("/api/v1/admin/tsdb/clean_tombstones", adminHandler { _ =>
      graft.promql.Admin.cleanTombstones(spark, dir)
      None
    })
    server.createContext("/api/v1/admin/tsdb/snapshot", adminHandler { _ =>
      val name = graft.promql.Admin.snapshot(spark, dir)
      Some(s"""{"status":"success","data":{"name":"${jsonEscape(name)}"}}""")
    })
    server.createContext("/api/v1/targets", handler { _ =>
      // pool statuses read at REQUEST time — file-SD adds/removes
      // show on the next scrape tick's listing
      Api.targetsJson(scrapeTargets.map(_.status) ++
        scrapePool.map(_.statuses).getOrElse(Nil))
    })
    // upstream's Alertmanager-discovery view: the configured notifier
    // endpoints with delivery health (a notifier whose last POST failed
    // reports as dropped, like an unreachable discovered AM)
    server.createContext("/api/v1/alertmanagers", handler { _ =>
      val (active, dropped) = alertmanagers.partition {
        case (_, n) => n.status._2.isEmpty
      }
      def arr(xs: Seq[(String, AlertNotifier)]): String =
        xs.map { case (u, _) => s"""{"url":"${jsonEscape(u)}"}""" }
          .mkString("[", ",", "]")
      s"""{"status":"success","data":{"activeAlertmanagers":${arr(active)},""" +
        s""""droppedAlertmanagers":${arr(dropped)}}}"""
    })
    server.createContext("/api/v1/status/tsdb", handler { _ =>
      Api.tsdbStatusJson(spark, dir)
    })
    server.createContext("/api/v1/query_exemplars", handler { ex =>
      val p = params(ex)
      Api.queryExemplarsJson(spark, dir, required(p, "query"),
        p.get("start").map(epochS), p.get("end").map(epochS))
    })
    server.createContext("/api/v1/rules", handler { _ =>
      Api.rulesJson(spark, dir, aRules, rRules)
    })
    server.createContext("/api/v1/alerts", handler { _ =>
      Api.alertsJson(spark, dir, aRules)
    })
    server.createContext("/api/v1/status/buildinfo", handler { _ =>
      Api.buildInfoJson
    })
    // lifecycle endpoints — what k8s probes and reload tooling hit:
    //  - /-/healthy: 200 once the server loop is serving (liveness);
    //  - /-/ready: 200 once the corpus is queryable — the probe primes
    //    the evaluation-instant cache, the engine's "TSDB loaded"
    //    analog, and 503s while the corpus can't answer (readiness);
    //  - /-/reload (POST): re-read the rule file and bump the
    //    results-cache epoch, so the very next request sees the new
    //    rules and no cached answer computed under the old ones is
    //    ever served (upstream's SIGHUP/endpoint reload).
    server.createContext("/-/healthy", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, 200, "Graft is Healthy.\n", "text/plain; charset=utf-8")
    })
    server.createContext("/-/ready", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          graft.promql.Compiler.instantSeconds(spark, dir)
          respond(ex, 200, "Graft is Ready.\n", "text/plain; charset=utf-8")
        } catch {
          case e: Exception =>
            respond(ex, 503, s"Not ready: ${Option(e.getMessage)
              .getOrElse(e.getClass.getSimpleName)}\n",
              "text/plain; charset=utf-8")
        }
    })
    server.createContext("/-/reload", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        if (ex.getRequestMethod != "POST")
          respond(ex, 405, errorBody("reload requires POST"))
        else try {
          rulesRef.set(ruleFile.map(graft.promql.RuleConfig.loadFull)
            .map { case (a, r, ext) =>
              (a, r, if (ext.nonEmpty) ext else externalLabels) }
            .getOrElse((alertRules, recordingRules, externalLabels)))
          graft.promql.ResultsCache.invalidate(spark, dir)
          respond(ex, 200, "", "text/plain; charset=utf-8")
        } catch {
          case e: Exception =>
            // upstream answers 500 when the new config fails to apply
            // (the old rules stay standing — rulesRef was not set)
            respond(ex, 500, s"failed to reload: ${Option(e.getMessage)
              .getOrElse(e.getClass.getSimpleName)}\n",
              "text/plain; charset=utf-8")
        }
    })
    server.createContext("/api/v1/status/flags", handler { _ =>
      Api.flagsJson(spark)
    })
    server.createContext("/api/v1/status/config", handler { _ =>
      Api.configJson(aRules, rRules, extLabels)
    })
    server.createContext("/api/v1/status/runtimeinfo", handler { _ =>
      Api.runtimeInfoJson(spark)
    })
    server.createContext("/api/v1/format_query", handler { ex =>
      Api.formatQueryJson(required(params(ex), "query"))
    })
    server.createContext("/api/v1/parse_query", handler { ex =>
      Api.parseQueryJson(required(params(ex), "query"))
    })
    server.createContext("/api/v1/metadata", handler { _ =>
      Api.metadataJson
    })
    server.createContext("/api/v1/query_range", handler { ex =>
      val p = params(ex)
      // Thanos's max_source_resolution: an explicit opt-in capping how
      // coarse a rollup level may serve aligned queries (rollup
      // serving is convention-exact — closed-right buckets ≡ PromQL
      // (t−W, t], see Pyramid); 0 or absent = raw only
      val msr = p.get("max_source_resolution").map(stepS).filter(_ > 0)
      // the standing rule file's recorded names are selectable in any
      // served query (upstream: rules write to the TSDB; here: view
      // semantics via the compile context) — and so is the ALERTS
      // synthetic series, at dashboard grid scale (the alert-timeline
      // panel), like the instant door below
      graft.promql.Compiler.withAlertRules(aRules) {
      graft.promql.Compiler.withRecordedRules(rRules) {
        // the query-frontend results cache is a deployment choice
        // (Cortex/Thanos run it in front of the querier) — opt in at
        // server start; responses are byte-identical either way
        if (resultsCache)
          graft.promql.ResultsCache.queryRangeJson(spark, dir,
            required(p, "query"),
            epochS(required(p, "start")), epochS(required(p, "end")),
            stepS(required(p, "step")), nativeFamilies, msr)
        else
          Api.queryRangeJson(spark, dir, required(p, "query"),
            epochS(required(p, "start")), epochS(required(p, "end")),
            stepS(required(p, "step")), nativeFamilies, msr)
      }
      }
    })
    server.createContext("/api/v1/query", handler { ex =>
      // createContext is prefix-matched, so /api/v1/query_range has its
      // own (longer) context above; reject other suffixes here
      if (ex.getRequestURI.getPath != "/api/v1/query")
        throw new IllegalArgumentException(
          s"unknown endpoint ${ex.getRequestURI.getPath}")
      val p = params(ex)
      // the standing rule file's ALERTS series answers /api/v1/query
      // like any series (upstream's queryable alert states)
      graft.promql.Compiler.withAlertRules(aRules)(
        graft.promql.Compiler.withRecordedRules(rRules)(
          // the instant path caches behind the same opt-in as query_range
          // (Cortex's frontend caches instant results too); byte-identical
          // either way — a miss delegates to the direct path
          if (resultsCache)
            graft.promql.ResultsCache.queryJson(spark, dir,
              required(p, "query"), nativeFamilies,
              timeS = p.get("time").map(epochS))
          else
            Api.queryJson(spark, dir, required(p, "query"), nativeFamilies,
              timeS = p.get("time").map(epochS))))
    })
    // hierarchical federation: the timestamped exposition payload for
    // the matched series, the same bytes as the oracle-gated a1g query
    server.createContext("/federate", handler(ex => {
      val ms = multiParams(ex).collect { case ("match[]", v) => v }
      if (ms.isEmpty) throw new IllegalArgumentException(
        "missing required parameter 'match[]'")
      // the standing rule file's recorded names federate like any
      // TSDB series, exactly as they answer /api/v1/query
      graft.promql.Compiler.withRecordedRules(rRules)(
        Api.federateText(spark, dir, ms, extLabels))
    }, ScrapeEndpoint.ContentType))
    server.createContext("/api/v1/series", handler { ex =>
      // repeated match[] selectors union (upstream semantics); start/end
      // bound the sample-presence window
      val mp = multiParams(ex) // one body read: map + repeats from it
      val ms = mp.collect { case ("match[]", v) => v }
      if (ms.isEmpty) throw new IllegalArgumentException(
        "missing required parameter 'match[]'")
      val p = mp.toMap
      graft.promql.Compiler.withRecordedRules(rRules)(
        Api.seriesJson(spark, dir, ms,
          p.get("start").map(epochS), p.get("end").map(epochS),
          p.get("limit").map(_.toInt)))
    })
    server.createContext("/api/v1/labels", handler { ex =>
      val mp = multiParams(ex)
      val p = mp.toMap
      Api.labelsJson(spark, dir,
        mp.collect { case ("match[]", v) => v },
        p.get("start").map(epochS), p.get("end").map(epochS),
        p.get("limit").map(_.toInt))
    })
    server.createContext("/api/v1/label", handler { ex =>
      ex.getRequestURI.getPath.split('/') match {
        case Array("", "api", "v1", "label", name, "values") =>
          val mp = multiParams(ex)
          val p = mp.toMap
          graft.promql.Compiler.withRecordedRules(rRules)(
            Api.labelValuesJson(spark, dir, name,
              mp.collect { case ("match[]", v) => v },
              p.get("start").map(epochS), p.get("end").map(epochS),
              p.get("limit").map(_.toInt)))
        case _ => throw new IllegalArgumentException(
          s"unknown endpoint ${ex.getRequestURI.getPath}")
      }
    })
    server.setExecutor(null)
    server.start()
    server
  }
}
