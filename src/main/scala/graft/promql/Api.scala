package graft.promql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Prometheus HTTP query-API response envelope — the serving-side
  * twin of the text exposition (`a1c`): a user of the reference's stack
  * reads query results as
  * `{"status":"success","data":{"resultType":"vector","result":[
  *   {"metric":{"__name__":"up","k":"1"},"value":[<ts>,"<v>"]}, ...]}}`.
  *
  * The vector rows are an AGGREGATED result (one row per output
  * series), so materializing them at the serving layer is the intended
  * O(#series) endpoint cost — exactly like the exposition registry;
  * per-row JSON (metric map + escaping) is built DISTRIBUTEDLY by
  * Spark's `to_json` before the collect, the driver only concatenates.
  */
object Api {

  /** Physical label column → PromQL label name. */
  private def promLabel(c: String): String = c match {
    case "name" => "__name__"
    case l if l.startsWith("label_") => l.stripPrefix("label_")
    case other => other
  }

  /** Evaluate `query` and render the instant-vector JSON envelope.
    * `timeS` is the API's `time=` parameter: the vector evaluates AT
    * that epoch instant (via a shifted compile — upstream's
    * past-instant semantics) and the envelope renders it; absent, the
    * corpus instant T is the evaluation time, upstream's "now". A
    * `timeS` after T is rejected (`bad_data`) — the corpus has no
    * future samples, so serving T's answer for it would be silently
    * wrong.
    */
  def queryJson(spark: SparkSession, dir: String, query: String,
      nativeFamilies: Set[String] = Set.empty,
      timeS: Option[Long] = None): String = {
    val t = Compiler.instantSeconds(spark, dir)
    timeS.foreach(ts => require(ts <= t.toLong,
      s"time $ts is after the corpus instant ${t.toLong}"))
    val shiftS = timeS.map(ts => t.toLong - ts).getOrElse(0L)
    val df = Compiler.withNativeFamilies(nativeFamilies)(
      Compiler.compileShifted(spark, dir, Parser.parse(query), shiftS))
    val labelCols = df.columns.filter(_ != "value").toSeq
    val renderT: Any = timeS.getOrElse(t)
    // one element per output series:
    //   {"metric":{...labels...},"value":[<t>,"<v>"]}
    val metric =
      if (labelCols.isEmpty) lit("{}")
      else to_json(struct(labelCols.map(c => col(c).as(promLabel(c))): _*))
    val element = concat(
      lit("{\"metric\":"), metric,
      lit(s""","value":[$renderT,""""), col("value").cast("string"), lit("\"]}"))
    val parts = df.select(element.as("j")).collect().map(_.getString(0))
    parts.mkString(
      """{"status":"success","data":{"resultType":"vector","result":[""",
      ",", "]}}")
  }

  /** The `query_range` twin: `query` evaluated at each step-spaced grid
    * instant in `[startS, endS]` (epoch seconds, all ≤ the corpus
    * instant T), rendered as the matrix envelope
    * `{"resultType":"matrix","result":[{"metric":{...},
    *   "values":[[t,"v"],...]}, ...]}`.
    *
    * Physical shape, in preference order:
    *  1. **Dense grid** ([[Compiler.rangeGridEval]]) for the common
    *     dashboard shapes — selector / `sum by` / rate / `*_over_time`:
    *     ONE event pass + one window over the series×grid, so a
    *     1,000-step panel costs no more planning than a 10-step one
    *     (bound 4096 instants).
    *  2. **Per-instant union** for every other shape (bound 64
    *     instants, like the subquery union strategy).
    * Either way, per-(series, instant) sample strings are built
    * distributedly and ONE hash aggregate per series assembles the
    * time-sorted values array — the collect stays O(#series), never
    * O(samples × series). The two paths are bit-identical on any common
    * grid (`QueryRangeSpec`).
    */
  def queryRangeJson(spark: SparkSession, dir: String, query: String,
      startS: Long, endS: Long, stepS: Long,
      nativeFamilies: Set[String] = Set.empty,
      maxSourceResS: Option[Long] = None): String =
    queryRangeJsonImpl(spark, dir, query, startS, endS, stepS, grid = true,
      nativeFamilies, maxSourceResS)

  /** `grid = false` forces the per-instant union path — the test hook
    * that lets `QueryRangeSpec` pin union ≡ grid on a common grid.
    */
  private[graft] def queryRangeJsonImpl(spark: SparkSession, dir: String,
      query: String, startS: Long, endS: Long, stepS: Long,
      grid: Boolean, nativeFamilies: Set[String] = Set.empty,
      maxSourceResS: Option[Long] = None): String =
    Compiler.withNativeFamilies(nativeFamilies)(
      queryRangeJsonBody(spark, dir, query, startS, endS, stepS, grid,
        maxSourceResS))

  /** The serving path's physical-plan choice, in preference order:
    * pyramid rollups (when the caller opted in via `maxSourceResS` —
    * Thanos's `max_source_resolution`, the caller's cap on how coarse
    * a pre-aggregation level may answer; rollup serving itself is
    * convention-exact, closed-right buckets ≡ PromQL `(t−W, t]`, see
    * [[Pyramid]]), dense grid, per-instant union. Returns the matrix
    * relation with the grid instant as `_t`.
    */
  /** Grid evaluation SHARDED past the compose gate: a range wider than
    * 4096 instants splits into ≤4096-instant chunks evaluated
    * independently and unioned — sound because every grid value is a
    * function of its own instant (the lattice bounds only scope the
    * relation), so a chunked union is per-instant identical to one
    * plan; `QueryRangeSpec` pins chunk-boundary continuity. The shard
    * count is bounded (plans grow linearly in shards) — a panel wider
    * than 65536 instants refuses loudly, like the 4096 gate it extends.
    */
  private def gridSharded(spark: SparkSession, dir: String, ast: Ast,
      startS: Long, endS: Long, stepS: Long): Option[DataFrame] = {
    val g = (endS - startS) / stepS + 1
    if (g <= 4096)
      Compiler.rangeGridEval(spark, dir, ast, startS, endS, stepS)
    else if (g > 65536)
      throw new PromQLCompileException(
        s"query_range evaluates $g instants; 1..65536 supported " +
          "(sharded over the 4096-instant grid)")
    else {
      // window arms budget extra lattice indexes (the rate lag
      // baseline spans window/step indexes BEFORE each chunk), so the
      // viable chunk width is shape-dependent: try 4096 and halve on
      // the compose gate — compose-time only, nothing executes.
      @annotation.tailrec
      def attempt(size: Int): Option[DataFrame] = {
        val res: Option[Option[DataFrame]] =
          try {
            val evaled = (startS to endS by stepS).grouped(size)
              .map(c => Compiler.rangeGridEval(spark, dir, ast,
                c.head, c.last, stepS)).toSeq
            // all-or-nothing: a shape one chunk can't grid, none can —
            // fall through to the union path's own gate untouched
            if (evaled.exists(_.isEmpty)) Some(None)
            else Some(Some(evaled.flatten.reduce(_ unionAll _)))
          } catch {
            case e: PromQLCompileException
                if size > 256 && e.getMessage.contains("4096") => None
          }
        res match {
          case Some(r) => r
          case None => attempt(size / 2)
        }
      }
      attempt(4096)
    }
  }

  private[graft] def rangeRelation(spark: SparkSession, dir: String, ast0: Ast,
      startS: Long, endS: Long, stepS: Long, grid: Boolean,
      maxSourceResS: Option[Long]): DataFrame = {
    // recorded-rule selectors inline as their expressions (then any
    // @ pins the rule itself carried resolve against THIS range), so
    // the grid/pyramid/sharded tiers serve recorded names at full
    // scale; non-inlinable shapes keep the union path's instant
    // evaluator
    val ast = Ast.resolveAtEdges(
      Compiler.inlineRecorded(spark, dir, ast0), Some(startS), Some(endS))
    val t = Compiler.instantSeconds(spark, dir)
    val instants = (startS to endS by stepS).toSeq
    require(instants.nonEmpty, "empty evaluation grid")
    instants.foreach(i => require(i <= t,
      s"grid instant $i is after the corpus instant ${t.toLong}"))
    maxSourceResS
      .flatMap(mr => Pyramid.rangeEval(spark, dir, ast, startS, endS, stepS, mr))
      .orElse(
        if (grid) gridSharded(spark, dir, ast, startS, endS, stepS)
        else None)
      .map(_.withColumnRenamed("t_s", "_t")).getOrElse {
      if (instants.length > 64)
        throw new PromQLCompileException(
          s"query_range evaluates ${instants.length} instants; this query " +
            "shape supports 1..64 (dense-grid shapes evaluate up to 4096)")
      instants.map { i =>
        Compiler.compileAt(spark, dir, ast, (t - i).toLong)
          .withColumn("_t", lit(i))
      }.reduce(_ unionAll _)
    }
  }

  /** The p96 gate's entry — the ROUTED downsampled `query_range` as a
    * relation: the same grid anchoring as [[Pyramid.queryRangeAligned]]
    * (end on the last aligned step edge), but routed through the
    * SERVING path's preference chain with the downsampling opt-in, so
    * gating it proves the route HTTP `max_source_resolution` requests
    * take — pyramid first, dense-grid/union fallback when the router
    * declines.
    */
  def queryRangeServed(spark: SparkSession, dir: String, query: String,
      instants: Int, stepS: Long, maxSourceResS: Long): DataFrame = {
    require(instants >= 1, "at least one grid instant")
    val t = Compiler.instantSeconds(spark, dir).toLong
    val endS = t / stepS * stepS
    val startS = endS - (instants - 1).toLong * stepS
    val ast = Ast.resolveAtEdges(Parser.parse(query), Some(startS), Some(endS))
    rangeRelation(spark, dir, ast, startS, endS, stepS, grid = true,
      Some(maxSourceResS)).withColumnRenamed("_t", "t_s")
  }

  /** A matrix relation's rows rendered to the response vocabulary:
    * `m` = the series' metric-JSON object, `_t` = the instant, `s` =
    * the `[t,"v"]` sample fragment — the ONE definition both the direct
    * serving path and the results cache ([[ResultsCache]]) render from,
    * so cached and uncached responses are byte-identical by
    * construction.
    */
  private[graft] def seriesSamples(unioned: DataFrame): DataFrame = {
    val labelCols = unioned.columns.filterNot(c => c == "value" || c == "_t").toSeq
    val metric =
      if (labelCols.isEmpty) lit("{}")
      else to_json(struct(labelCols.map(c => col(c).as(promLabel(c))): _*))
    val sample = concat(lit("["), col("_t").cast("string"),
      lit(",\""), col("value").cast("string"), lit("\"]"))
    unioned.select(metric.as("m"), col("_t"), sample.as("s"))
  }

  private def queryRangeJsonBody(spark: SparkSession, dir: String,
      query: String, startS: Long, endS: Long, stepS: Long,
      grid: Boolean, maxSourceResS: Option[Long] = None): String = {
    require(stepS > 0, "step must be positive")
    require(endS >= startS, "end must be >= start")
    // @ start()/@ end() pin to the range query's own bounds (upstream
    // Prometheus semantics), resolved once for EVERY physical path
    val ast = Ast.resolveAtEdges(Parser.parse(query), Some(startS), Some(endS))
    val unioned = rangeRelation(spark, dir, ast, startS, endS, stepS, grid,
      maxSourceResS)
    val series = seriesSamples(unioned)
      .groupBy(col("m"))
      .agg(array_join(expr("transform(array_sort(collect_list(struct(_t, s))), x -> x.s)"),
        ",").as("vals"))
      .orderBy(col("m"))
    val parts = series
      .select(concat(lit("{\"metric\":"), col("m"),
        lit(",\"values\":["), col("vals"), lit("]}")).as("j"))
      .collect().map(_.getString(0))
    parts.mkString(
      """{"status":"success","data":{"resultType":"matrix","result":[""",
      ",", "]}}")
  }

  /** Dense-grid `query_range` as a relation (`labels… :+ t_s :+ value`):
    * the grid anchored at the corpus instant — `end = ⌊T⌋`,
    * `start = end − (instants−1)·step` — so the registered p76 gate and
    * its DuckDB oracle agree on absolute epochs across sf dirs. Fails
    * at compose time for shapes without a grid strategy (those route
    * through [[queryRangeJson]]'s union path).
    */
  def queryRangeGrid(spark: SparkSession, dir: String, query: String,
      instants: Int, stepS: Long,
      nativeFamilies: Set[String] = Set.empty,
      recordingRules: Seq[Rules.RecordingRule] = Nil,
      alertRules: Seq[Rules.AlertRule] = Nil): DataFrame = {
    require(instants >= 1, "at least one grid instant")
    val endS = Compiler.instantSeconds(spark, dir).toLong
    val startS = endS - (instants - 1).toLong * stepS
    Compiler.withAlertRules(alertRules)(
      Compiler.withRecordedRules(recordingRules)(
        Compiler.withNativeFamilies(nativeFamilies)(
          Compiler.rangeGridEval(spark, dir,
            Ast.resolveAtEdges(Compiler.inlineRecorded(spark, dir,
              Parser.parse(query)), Some(startS), Some(endS)),
            startS, endS, stepS))))
      .getOrElse(throw new PromQLCompileException(
        s"no dense-grid strategy for query shape: $query"))
  }

  /** `/federate` twin: each `match[]` selector evaluated as an instant
    * vector and rendered as Prometheus text exposition WITH the sample
    * timestamp in milliseconds — the payload one Prometheus serves
    * another for hierarchical federation. Series union-dedup across
    * selectors, labels alphabetical, lines sorted, values rendered from
    * integer cents (the a1c renderer contract), trailing newline.
    * Line building is distributed; the collect is O(#series).
    */
  def federateText(spark: SparkSession, dir: String,
      matches: Seq[String],
      externalLabels: Map[String, String] = Map.empty): String = {
    require(matches.nonEmpty, "at least one match[] selector")
    val tMs = Compiler.instantSeconds(spark, dir).toLong * 1000L
    val rendered = matches.map { m =>
      val df0 = Engine.eval(spark, dir, m)
      // recorded names federate like any TSDB series (upstream's rule
      // loop writes them): a sum-by rule's vector retains only its
      // by-labels, so the record's own name — the series' `__name__`
      // upstream — is re-attached for the exposition line. Raw-family
      // selectors keep their name column untouched.
      val df = if (df0.columns.contains("name")) df0
        else Parser.parse(m) match {
          case s: Selector => df0.withColumn("name", lit(s.name))
          case _ => throw new PromQLCompileException(
            s"/federate matches series selectors; '$m' names no series")
        }
      // upstream federation attaches the server's external_labels to
      // every exported line UNLESS the series already carries the name
      // (the series' own label wins) — the per-server identity a
      // hierarchical scraper dedups on (b40's consumption side)
      val seriesLabels = df.columns.filter(c => c != "value" && c != "name")
        .map(c => (promLabel(c), col(c))).toSeq
      val have = seriesLabels.map(_._1).toSet
      val labels = (seriesLabels ++ externalLabels.toSeq.collect {
        case (k, v) if !have.contains(k) && v.nonEmpty => (k, lit(v))
      }).sortBy(_._1)
      val inner = concat_ws(",", labels.map { case (p, c) =>
        concat(lit(p + "=\""), c, lit("\""))
      }.toIndexedSeq: _*)
      val cents = round(col("value") * 100).cast("long")
      // sign rendered separately: Spark's truncating `/` and
      // sign-keeping `%` would print `0.-50` for a negative gauge
      val acents = abs(cents)
      df.select(concat(col("name"), lit("{"), inner, lit("} "),
        when(cents < 0, lit("-")).otherwise(lit("")),
        (acents / 100).cast("long").cast("string"), lit("."),
        lpad(pmod(acents, lit(100L)).cast("string"), 2, "0"),
        lit(s" $tMs")).as("line"))
    }.reduce(_ unionByName _).distinct()
    val parts = rendered.orderBy(col("line")).collect().map(_.getString(0))
    parts.mkString("", "\n", if (parts.nonEmpty) "\n" else "")
  }

  private def envelope(dataJson: String): String =
    s"""{"status":"success","data":$dataJson}"""

  /** Truncate `items` to upstream's `limit` parameter semantics:
    * `limit=0` (or absent) disables, negatives are the caller's 400,
    * and a truncated response carries upstream's literal warning in the
    * envelope.
    */
  private def limited(items: Seq[String],
      limit: Option[Int]): (Seq[String], Seq[String]) = limit match {
    case Some(n) if n < 0 =>
      throw new IllegalArgumentException("limit must be non-negative")
    case Some(n) if n > 0 && items.length > n =>
      (items.take(n), Seq("results truncated due to limit"))
    case _ => (items, Nil)
  }

  private def warnEnvelope(dataJson: String, warnings: Seq[String]): String =
    if (warnings.isEmpty) envelope(dataJson)
    else s"""{"status":"success","warnings":${
      warnings.map(w => s""""${jsonEscape(w)}"""").mkString("[", ",", "]")
    },"data":$dataJson}"""

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `/api/v1/status/buildinfo` twin — the static identity payload
    * Grafana's datasource health check reads (it only needs
    * `status=success` and a `data.version`).
    */
  val buildInfoJson: String = envelope(
    """{"version":"3.0.0","revision":"graft","branch":"main",""" +
      """"buildUser":"graft","buildDate":"","goVersion":""}""")

  /** `/api/v1/status/tsdb` twin — the cardinality dashboard (head
    * stats + top-10 per breakdown, value-descending with name ties
    * ascending, upstream's shape). Renders the b39-gated stats
    * relation; the collect is O(labels + families), never O(series).
    */
  def tsdbStatusJson(spark: SparkSession, dir: String): String = {
    val rows = graft.operators.PromQL.tsdbStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
    val head = rows.filter(_._1 == "headStats")
      .map(r => r._2 -> r._3).toMap.withDefaultValue(0L)
    def sec(section: String): String = rows.filter(_._1 == section)
      .sortBy { case (_, n, v) => (-v, n) }.take(10)
      .map { case (_, n, v) =>
        s"""{"name":"${jsonEscape(n)}","value":$v}"""
      }.mkString("[", ",", "]")
    envelope(
      s"""{"headStats":{"numSeries":${head("numSeries")},""" +
        s""""numLabelPairs":${head("numLabelPairs")},""" +
        s""""chunkCount":${head("chunkCount")},""" +
        s""""minTime":${head("minTime")},""" +
        s""""maxTime":${head("maxTime")}},""" +
        s""""seriesCountByMetricName":${sec("seriesCountByMetricName")},""" +
        s""""labelValueCountByLabelName":${sec("labelValueCountByLabelName")},""" +
        s""""memoryInBytesByLabelName":${sec("memoryInBytesByLabelName")},""" +
        s""""seriesCountByLabelValuePair":${sec("seriesCountByLabelValuePair")}}""")
  }

  /** `/api/v1/format_query` twin — upstream's prettifier endpoint: the
    * parsed query rendered canonically ([[Format.format]], parse-stable
    * by FormatSpec's law); an unparseable query is the usual 400
    * `bad_data`, exactly like upstream.
    */
  def formatQueryJson(query: String): String =
    envelope(s""""${jsonEscape(Format.format(Parser.parse(query)))}"""")

  /** `/api/v1/parse_query` twin — upstream's (experimental) AST
    * introspection endpoint: the parsed query rendered in the upstream
    * parser's JSON vocabulary ([[Format.json]]); unparseable queries
    * 400 like everywhere else.
    */
  def parseQueryJson(query: String): String =
    envelope(Format.json(Parser.parse(query)))

  /** `/api/v1/status/config` twin — Grafana's "show configuration":
    * the server's standing rule file rendered as the Prometheus rule
    * YAML it is equivalent to, under upstream's `{"yaml": …}` envelope.
    * Durations render canonically ([[Format]]'s convention); a server
    * started with no rules serves an empty groups list, not an error.
    */
  def configJson(alertRules: Seq[Rules.AlertRule],
      recordingRules: Seq[Rules.RecordingRule],
      externalLabels: Map[String, String] = Map.empty): String = {
    def dur(s: Long): String =
      if (s <= 0) "0s"
      else if (s % 86400 == 0) s"${s / 86400}d"
      else if (s % 3600 == 0) s"${s / 3600}h"
      else if (s % 60 == 0) s"${s / 60}m"
      else s"${s}s"
    def yamlMap(key: String, m: Map[String, String]): String =
      if (m.isEmpty) ""
      else s"\n    $key:\n" + m.toSeq.sortBy(_._1).map { case (k, v) =>
        s"      $k: ${if (v.exists("{}:#'\"".contains(_))) "'" + v.replace("'", "''") + "'" else v}"
      }.mkString("\n")
    val rules =
      recordingRules.map(r =>
        s"  - record: ${r.record}\n    expr: ${r.expr}") ++
        alertRules.map { a =>
          s"  - alert: ${a.alert}\n    expr: ${a.expr}" +
            (if (a.forS > 0) s"\n    for: ${dur(a.forS)}" else "") +
            (if (a.keepFiringForS > 0)
              s"\n    keep_firing_for: ${dur(a.keepFiringForS)}" else "") +
            yamlMap("labels", a.labels) +
            yamlMap("annotations", a.annotations)
        }
    // the global section leads, upstream's YAML order; 4-space entry
    // indent is what [[graft.promql.RuleConfig.parseFull]] reads back
    // (load ∘ render stays the identity, RuleConfigSpec's law)
    val globalYaml =
      if (externalLabels.isEmpty) ""
      else "global:\n  external_labels:\n" +
        externalLabels.toSeq.sortBy(_._1).map { case (k, v) =>
          s"    $k: ${if (v.exists("{}:#'\"".contains(_)))
            "'" + v.replace("'", "''") + "'" else v}"
        }.mkString("\n") + "\n"
    val yaml = globalYaml +
      (if (rules.isEmpty) "groups: []\n"
      else "groups:\n- name: graft\n" +
        (alertRules.map(_.intervalS).filter(_ > 0).headOption
          .map(i => s"  interval: ${dur(i)}\n").getOrElse("")) +
        "  rules:\n" + rules.mkString("\n") + "\n")
    envelope(s"""{"yaml":"${jsonEscape(yaml)}"}""")
  }

  /** `/api/v1/status/flags` twin: the engine's REAL serving knobs under
    * flag-map shape — honest analogs of upstream's CLI flags (grid
    * bound, rollup lattice, shuffle width), never invented Go flags.
    */
  def flagsJson(spark: SparkSession): String = envelope(
    s"""{"promql.max-grid-instants":"4096",""" +
      s""""rollup.resolutions":"1h,2h,6h,1d",""" +
      s""""spark.sql.shuffle.partitions":"${spark.conf
        .get("spark.sql.shuffle.partitions")}",""" +
      s""""spark.master":"${jsonEscape(spark.sparkContext.master)}"}""")

  /** `/api/v1/status/runtimeinfo` twin: session start time and the
    * engine's runtime facts in upstream's key shape where one exists.
    */
  def runtimeInfoJson(spark: SparkSession): String = {
    val startIso = java.time.Instant
      .ofEpochMilli(spark.sparkContext.startTime).toString
    envelope(
      s"""{"startTime":"$startIso","CWD":"${jsonEscape(
          System.getProperty("user.dir"))}",""" +
        s""""reloadConfigSuccess":true,"corruptionCount":0,""" +
        s""""sparkVersion":"${spark.version}",""" +
        s""""defaultParallelism":${spark.sparkContext.defaultParallelism}}""")
  }

  /** `/api/v1/metadata` twin: per-family kind + help from the family
    * catalog — help is the empty string, faithfully: the reference
    * registers every family with `Help("")`
    * (`/root/reference/prometheus.cpp:186,227`). Grafana's metric
    * autocomplete reads exactly this shape.
    */
  def metadataJson: String = {
    import graft.model.MetricEvent
    // the scrape report series (up & friends) serve NO metadata —
    // upstream's well-known quirk: synthetics aren't scraped, so the
    // metadata store never sees them
    val fams =
      MetricEvent.CounterNames.map(_ -> "counter") ++
        MetricEvent.GaugeNames
          .filterNot(MetricEvent.SyntheticNames.contains)
          .map(_ -> "gauge") ++
        MetricEvent.HistogramNames.map(_ -> "histogram")
    envelope(fams.sortBy(_._1).map { case (n, k) =>
      s""""${jsonEscape(n)}":[{"type":"$k","help":"","unit":""}]"""
    }.mkString("{", ",", "}"))
  }

  /** `/api/v1/targets` twin: the scrape pool's live health rows —
    * upstream's `activeTargets` shape (labels, scrapePool/Url,
    * lastError/lastScrape/duration, health) from
    * [[graft.sources.ScrapeClient.TargetStatus]]; never-scraped
    * targets are `unknown`, failures `down` with the error verbatim.
    */
  def targetsJson(targets: Seq[graft.sources.ScrapeClient.TargetStatus])
      : String = {
    val active = targets.map { t =>
      val lastScrape = t.lastScrapeMs
        .map(ms => java.time.Instant.ofEpochMilli(ms).toString).getOrElse("")
      s"""{"discoveredLabels":{},""" +
        s""""labels":{"instance":"${jsonEscape(t.instance)}",""" +
        s""""job":"${jsonEscape(t.job)}"},""" +
        s""""scrapePool":"${jsonEscape(t.job)}",""" +
        s""""scrapeUrl":"${jsonEscape(t.url)}",""" +
        s""""globalUrl":"${jsonEscape(t.url)}",""" +
        s""""lastError":"${jsonEscape(t.lastError.getOrElse(""))}",""" +
        s""""lastScrape":"$lastScrape",""" +
        s""""lastScrapeDuration":${t.lastDurationS},""" +
        s""""health":"${t.health}"}"""
    }
    envelope(s"""{"activeTargets":[${active.mkString(",")}],""" +
      """"droppedTargets":[]}""")
  }

  /** The current `ALERTS`-style rows of one rule (offset 0), with the
    * condition's full label set — shared by the rules and alerts
    * endpoints. Returns (labelCols, rows).
    */
  private def currentAlertRows(spark: SparkSession, dir: String,
      rule: Rules.AlertRule): (Seq[String], Array[org.apache.spark.sql.Row]) = {
    val df = Rules.alertStates(spark, dir, rule, Seq(0L))
    val lcs = df.columns.filterNot(
      Set("alertname", "alertstate", "offset_s", "value").contains).toSeq
    (lcs, df.collect())
  }

  /** One alert instance's final label set: the condition's series
    * labels + `alertname` + the RULE's labels (templated against the
    * series labels and value, overriding on collision — upstream's
    * merge order), plus its rendered annotations. Shared by the
    * alerts/rules endpoints and the notifier body.
    */
  private def instanceLabelsAndAnnotations(rule: Rules.AlertRule,
      lcs: Seq[String], row: org.apache.spark.sql.Row)
      : (Seq[(String, String)], String) = {
    val base = ("alertname" -> rule.alert) +: lcs.flatMap(c =>
      Option(row.getAs[String](c)).map(v => promLabel(c) -> v))
    val baseMap = base.toMap
    val v = row.getAs[Double]("value")
    val extra = rule.labels.toSeq.sortBy(_._1).map { case (k, tpl) =>
      k -> Rules.renderTemplate(tpl, baseMap, v)
    }
    val merged = base.filterNot(b => rule.labels.contains(b._1)) ++ extra
    val annotations = rule.annotations.toSeq.sortBy(_._1)
      .map { case (k, tpl) =>
        s""""${jsonEscape(k)}":"${jsonEscape(
          Rules.renderTemplate(tpl, baseMap, v))}""""
      }.mkString("{", ",", "}")
    (merged, annotations)
  }

  private def labelsJson(labels: Seq[(String, String)]): String =
    labels.map { case (k, v) =>
      s""""${jsonEscape(k)}":"${jsonEscape(v)}""""
    }.mkString("{", ",", "}")

  private def alertJson(rule: Rules.AlertRule, lcs: Seq[String],
      row: org.apache.spark.sql.Row, activeAt: String): String = {
    val (labels, annotations) = instanceLabelsAndAnnotations(rule, lcs, row)
    s"""{"labels":${labelsJson(labels)},"annotations":$annotations,""" +
      s""""state":"${row.getAs[String]("alertstate")}",""" +
      s""""activeAt":"$activeAt","value":"${row.getAs[Double]("value")}"}"""
  }

  /** The Alertmanager v2 POST body for the currently FIRING instances
    * (upstream notifies only firing alerts; pending stay server-side):
    * a JSON array of `{labels, annotations, startsAt, generatorURL}`
    * objects, the shape `POST /api/v2/alerts` accepts. The notifier
    * ([[graft.sources.AlertNotifier]]) sends these bytes.
    */
  private[graft] def firingAlertsBody(spark: SparkSession, dir: String,
      rules: Seq[Rules.AlertRule],
      externalLabels: Map[String, String] = Map.empty): String = {
    val startsAt = java.time.Instant
      .ofEpochSecond(Compiler.instantSeconds(spark, dir).toLong).toString
    val items = rules.flatMap { r =>
      val (lcs, rows) = currentAlertRows(spark, dir, r)
      rows.filter(_.getAs[String]("alertstate") == "firing").map { row =>
        val (labels0, annotations) = instanceLabelsAndAnnotations(r, lcs, row)
        // external_labels join the outgoing alert's label set unless
        // the instance already carries the name (alert labels win —
        // upstream's notifier attach rule)
        val have = labels0.map(_._1).toSet
        val labels = labels0 ++ externalLabels.toSeq.sortBy(_._1).collect {
          case (k, v) if !have.contains(k) && v.nonEmpty => (k, v)
        }
        s"""{"labels":${labelsJson(labels)},"annotations":$annotations,""" +
          s""""startsAt":"$startsAt",""" +
          s""""generatorURL":"/graph?g0.expr=${jsonEscape(
            java.net.URLEncoder.encode(r.expr, "UTF-8"))}"}"""
      }
    }
    items.mkString("[", ",", "]")
  }

  /** `/api/v1/alerts` twin: every rule's currently active alert
    * instances (pending AND firing, like upstream), labels carrying
    * the condition's full series key. `activeAt` is the evaluation
    * instant — the batch reading of "active since".
    */
  def alertsJson(spark: SparkSession, dir: String,
      rules: Seq[Rules.AlertRule]): String = {
    val activeAt = java.time.Instant
      .ofEpochSecond(Compiler.instantSeconds(spark, dir).toLong).toString
    val alerts = rules.flatMap { r =>
      val (lcs, rows) = currentAlertRows(spark, dir, r)
      rows.map(alertJson(r, lcs, _, activeAt))
    }
    envelope(s"""{"alerts":[${alerts.mkString(",")}]}""")
  }

  /** `/api/v1/rules` twin: one group carrying every configured rule —
    * alerting rules with their live alert instances and the
    * firing>pending>inactive collapse upstream shows, recording rules
    * with a compose-time health check (the plan builds or it doesn't —
    * rule evaluation IS plan construction here).
    */
  def rulesJson(spark: SparkSession, dir: String,
      alertRules: Seq[Rules.AlertRule],
      recordingRules: Seq[Rules.RecordingRule]): String = {
    val lastEval = java.time.Instant
      .ofEpochSecond(Compiler.instantSeconds(spark, dir).toLong).toString
    val alerting = alertRules.map { r =>
      val (lcs, rows) = currentAlertRows(spark, dir, r)
      val states = rows.map(_.getAs[String]("alertstate")).toSet
      val state =
        if (states.contains("firing")) "firing"
        else if (states.nonEmpty) "pending"
        else "inactive"
      val alerts = rows.map(alertJson(r, lcs, _, lastEval)).mkString(",")
      // rule-level labels/annotations are the UNRENDERED templates,
      // exactly what upstream's /api/v1/rules shows
      def rawMap(m: Map[String, String]): String =
        m.toSeq.sortBy(_._1).map { case (k, v) =>
          s""""${jsonEscape(k)}":"${jsonEscape(v)}""""
        }.mkString("{", ",", "}")
      s"""{"state":"$state","name":"${jsonEscape(r.alert)}",""" +
        s""""query":"${jsonEscape(r.expr)}","duration":${r.forS},""" +
        s""""keepFiringFor":${r.keepFiringForS},""" +
        s""""labels":${rawMap(r.labels)},""" +
        s""""annotations":${rawMap(r.annotations)},"alerts":[$alerts],""" +
        s""""health":"ok","lastEvaluation":"$lastEval","type":"alerting"}"""
    }
    val recording = recordingRules.map { r =>
      val health =
        try { Engine.eval(spark, dir, r.expr); "ok" }
        catch { case _: Exception => "err" }
      s"""{"name":"${jsonEscape(r.record)}",""" +
        s""""query":"${jsonEscape(r.expr)}","labels":{},""" +
        s""""health":"$health","lastEvaluation":"$lastEval",""" +
        s""""type":"recording"}"""
    }
    envelope(s"""{"groups":[{"name":"graft","file":"graft.rules",""" +
      s""""rules":[${(alerting ++ recording).mkString(",")}]}]}""")
  }

  /** `/api/v1/series` twin: the distinct series (as metric maps) with
    * at least one sample matching ANY of the `match[]` selectors inside
    * `[startS, endS]` (defaults: the whole corpus) — upstream's
    * repeated-`match[]` union semantics. Selector filters OR into ONE
    * scan predicate, so N selectors cost one pass + one distinct over
    * the series key, never N jobs. Works for every sample kind
    * (a histogram family lists its series here even though it has no
    * scalar instant vector).
    */
  /** One OR-of-selectors AND sample-presence time-bound predicate over
    * the events view — the scoping shared by `/api/v1/series`,
    * `/api/v1/labels`, and `/api/v1/label/<l>/values` (upstream's
    * `match[]` + `start`/`end` semantics).
    */
  private[graft] def matchFilter(selectors: Seq[String],
      startS: Option[Long], endS: Option[Long]): Column = {
    val filters = selectors.map { m =>
      Parser.parse(m) match {
        case sel: Selector
            if sel.rangeS.isEmpty && sel.offsetS.isEmpty && sel.atS.isEmpty =>
          if (sel.name.isEmpty && !sel.matchers.exists(_.label == "__name__"))
            throw new PromQLCompileException(
              s"match[] selector '$m' needs a metric name or a __name__ matcher")
          val nameF = sel.matchers.filter(_.label == "__name__")
            .foldLeft(if (sel.name.nonEmpty) col("name") === sel.name
              else lit(true)) { (acc, mm) =>
              acc && (mm.op match {
                case "=" => col("name") === mm.value
                case "!=" => col("name") =!= mm.value
                case "=~" => col("name").rlike(s"^(?:${mm.value})$$")
                case "!~" => !col("name").rlike(s"^(?:${mm.value})$$")
              })
            }
          nameF && Compiler.matcherFilter(sel.matchers)
        case _ => throw new PromQLCompileException(
          s"match[] must be a plain series selector, got '$m'")
      }
    }
    val timeF = startS.map(s => unix_micros(col("ts")) >= s * 1000000L)
      .getOrElse(lit(true)) &&
      endS.map(e => unix_micros(col("ts")) <= e * 1000000L).getOrElse(lit(true))
    filters.reduceOption(_ || _).getOrElse(lit(true)) && timeF
  }

  def seriesJson(spark: SparkSession, dir: String, selectors: Seq[String],
      startS: Option[Long] = None, endS: Option[Long] = None,
      limit: Option[Int] = None): String = {
    require(selectors.nonEmpty, "at least one match[] selector")
    // recorded names list like any TSDB series (upstream: the rule loop
    // writes them); a selector naming one evaluates the rule vector —
    // at `end` when given, so series born after the window stay out
    // (presence is lattice-granular: a rule series once born has a
    // sample at every later interval instant)
    val recNames = Compiler.currentRecordedNames
    val (recM, rawM) = selectors.partition(s => Parser.parse(s) match {
      case sel: Selector => recNames.contains(sel.name)
      case _ => false
    })
    val rawMaps =
      if (rawM.isEmpty) Seq.empty[String]
      else graft.operators.Metrics.metricEvents(spark, dir)
        .filter(matchFilter(rawM, startS, endS))
        .select(to_json(struct(
          col("name").as("__name__"),
          col("label_k").as("k"),
          col("label_instance").as("instance"))).as("m"))
        .distinct().collect().map(_.getString(0)).toSeq
    val recMaps = if (recM.isEmpty) Seq.empty[String] else {
      val tS = Compiler.instantSeconds(spark, dir).toLong
      // no recorded sample exists past the corpus instant, so a window
      // STARTING beyond it holds nothing (upstream's empty-range
      // answer); inside the corpus, presence stays lattice-granular
      if (startS.exists(_ > tS)) Seq.empty[String]
      else recM.flatMap { m =>
        val name = Parser.parse(m) match {
          case sel: Selector => sel.name
          case _ => "" // unreachable: the partition matched on Selector
        }
        // `end` past the corpus instant clamps to it (upstream lists
        // head series for any future bound); earlier bounds pin the
        // rule vector at `end` via the @ modifier
        val df = Engine.eval(spark, dir,
          endS.filter(_ < tS).map(e => s"($m @ $e)").getOrElse(m))
        val labelCols = df.columns.toSeq
          .filter(c => c != "value" && c != "name")
        val fields = lit(name).as("__name__") +:
          labelCols.map(c => coalesce(col(c), lit("")).as(promLabel(c)))
        df.select(to_json(struct(fields: _*)).as("m"))
          .distinct().collect().map(_.getString(0)).toSeq
      }
    }
    val maps = (rawMaps ++ recMaps).distinct.sorted
    val (kept, warns) = limited(maps, limit)
    warnEnvelope(kept.mkString("[", ",", "]"), warns)
  }

  /** `/api/v1/query_exemplars` twin: the exemplar store
    * ([[graft.operators.PromQL.exemplars]]) filtered by a plain series
    * selector and optional `[startS, endS]` sample bounds — per
    * (histogram series, `le` bucket), ONE exemplar: the anchored
    * freshest observation, labels carrying this engine's trace-id
    * analog (`event_id`), upstream's response shape (`seriesLabels` +
    * `exemplars[{labels, value, timestamp}]`). Non-histogram selectors
    * return the empty list, like a Prometheus with no exemplar storage
    * for that series.
    */
  def queryExemplarsJson(spark: SparkSession, dir: String, query: String,
      startS: Option[Long] = None, endS: Option[Long] = None): String = {
    val sel = Parser.parse(query) match {
      case s: Selector if s.rangeS.isEmpty && s.offsetS.isEmpty &&
          s.atS.isEmpty && s.name.nonEmpty => s
      case _ => throw new PromQLCompileException(
        s"query_exemplars takes a plain series selector, got '$query'")
    }
    val timeF =
      startS.map(s => unix_micros(col("ts")) >= s * 1000000L)
        .getOrElse(lit(true)) &&
        endS.map(e => unix_micros(col("ts")) <= e * 1000000L)
          .getOrElse(lit(true))
    val obs = graft.operators.Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "histogram" && col("name") === sel.name &&
        Compiler.matcherFilter(sel.matchers) && timeF)
    val items = graft.operators.PromQL.exemplarsOf(obs).collect().map { r =>
      val ts = r.getAs[Long]("ts_us")
      val tsStr = s"${ts / 1000000L}.${"%06d".format(ts % 1000000L)}"
      s"""{"seriesLabels":{"__name__":"${jsonEscape(r.getAs[String]("name"))}",""" +
        s""""instance":"${jsonEscape(r.getAs[String]("label_instance"))}",""" +
        s""""k":"${jsonEscape(r.getAs[String]("label_k"))}",""" +
        s""""le":"${r.getAs[Double]("le")}"},""" +
        s""""exemplars":[{"labels":{"event_id":"${r.getAs[Long]("event_id")}"},""" +
        s""""value":"${r.getAs[Double]("value")}","timestamp":$tsStr}]}"""
    }
    envelope(items.mkString("[", ",", "]"))
  }

  /** `/api/v1/labels` twin: the label-name universe. */
  def labelsJson(spark: SparkSession, dir: String,
      selectors: Seq[String] = Nil, startS: Option[Long] = None,
      endS: Option[Long] = None, limit: Option[Int] = None): String = {
    val ev = graft.operators.Metrics.metricEvents(spark, dir)
    val names = ev.columns.toSeq
      .collect { case c if c == "name" || c.startsWith("label_") => promLabel(c) }
      .sorted
    // scoped: labels present on the MATCHING series in range — every
    // series carries the full universe, so the scoped answer is all-or-
    // nothing on whether any sample matches (upstream semantics over
    // this engine's label model)
    val out =
      if (selectors.isEmpty && startS.isEmpty && endS.isEmpty) names
      else if (ev.filter(matchFilter(selectors, startS, endS)).isEmpty) Nil
      else names
    val (kept, warns) = limited(out, limit)
    warnEnvelope(kept.map(n => s""""$n"""").mkString("[", ",", "]"), warns)
  }

  /** `/api/v1/label/<label>/values` twin: distinct values of a label,
    * optionally scoped by `match[]` selectors and sample-presence
    * `start`/`end` bounds like upstream.
    */
  def labelValuesJson(spark: SparkSession, dir: String, label: String,
      selectors: Seq[String] = Nil, startS: Option[Long] = None,
      endS: Option[Long] = None, limit: Option[Int] = None): String = {
    val c = label match {
      case "__name__" => "name"
      case other => "label_" + other
    }
    val ev = graft.operators.Metrics.metricEvents(spark, dir)
    if (!ev.columns.contains(c))
      throw new PromQLCompileException(s"unknown label '$label'")
    val vals = ev.filter(matchFilter(selectors, startS, endS))
      .select(to_json(struct(col(c).as("v"))).as("j"))
      .distinct().orderBy(col("j"))
      .collect().map(_.getString(0).stripPrefix("""{"v":""").stripSuffix("}"))
      .toSeq
    // the standing rule file's record names are `__name__` values too
    // (upstream: rule outputs are TSDB series). Selector-less requests
    // list them whenever the requested window intersects the rule
    // lattice [corpus start, corpus instant] — presence is lattice-
    // granular like /series (a time-scoped request must NOT silently
    // drop rule names, they are ordinary TSDB series upstream); a
    // match[] scope keeps the corpus-presence answer
    val recVals =
      if (label == "__name__" && selectors.isEmpty &&
          Compiler.currentRecordedNames.nonEmpty && {
            lazy val tS = Compiler.instantSeconds(spark, dir).toLong
            lazy val minS = Compiler.minInstantSeconds(spark, dir).toLong
            startS.forall(_ <= tS) && endS.forall(_ >= minS)
          })
        Compiler.currentRecordedNames.toSeq.map(n => s""""$n"""")
      else Nil
    val (kept, warns) = limited((vals ++ recVals).distinct.sorted, limit)
    warnEnvelope(kept.mkString("[", ",", "]"), warns)
  }
}
