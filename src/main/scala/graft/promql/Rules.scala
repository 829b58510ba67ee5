package graft.promql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recording and alerting rules — the two ways a Prometheus server
  * turns PromQL text into standing outputs, completing the query half
  * of the stack the reference feeds (the server scraping
  * `/root/reference/prometheus.cpp:73` evaluates exactly these rule
  * files):
  *
  *  - a recording rule names a query and materializes its result as a
  *    new series (here: a parquet relation per rule — the batch analog
  *    of the server's periodic evaluation loop);
  *  - an alert rule is a comparison-filtered query; series it returns
  *    are the FIRING alerts.
  *
  * Both are thin compositions over [[Engine]]: rule evaluation IS plan
  * construction, so a rule file of N rules is N independent Catalyst
  * plans sharing the session's cached adapter relations.
  *
  * Ladder identity: every pending→firing computation below keys on the
  * condition's FULL label set (whatever label columns its compiled
  * vector retains — `label_k`, `label_instance`, `name`, any subset),
  * so two series that share one label never alias into a single ladder
  * state. A condition that aggregated every label away (a scalar alert)
  * fires on the null `label_k`, upstream's label-free-alert reading.
  */
object Rules {

  /** A recording rule: `record` names the output series, `expr` is the
    * rule's PromQL, and `intervalS` is the rule group's evaluation
    * interval — the cadence at which the server's rule loop would write
    * `record`'s samples (Prometheus's `evaluation_interval`, default
    * 1m). The interval is what gives a RANGE selector over the recorded
    * name its sample grid: `rate(record[d])` reads the samples the loop
    * would have written at the `d/intervalS` instants inside the window.
    */
  final case class RecordingRule(record: String, expr: String,
      intervalS: Long = 60)

  /** An alert rule; `forS > 0` requires the condition to hold at EVERY
    * evaluation instant T, T−interval, …, T−for before the series
    * fires — Prometheus's pending→firing ladder collapsed to its batch
    * reading ("has this been true for the whole window, sampled at the
    * rule interval").
    *
    * `keepFiringForS > 0` is upstream's `keep_firing_for`: once a
    * series reached `firing`, it KEEPS firing for that long after the
    * condition clears (serving the last breach's value) — the
    * flap-damping grace window. Must be a multiple of the evaluation
    * interval, like `for`.
    *
    * `labels` are added to every alert instance's label set (they
    * override condition labels on collision, upstream's rule);
    * `annotations` are the human-facing summary/description texts.
    * Both support the standard template forms `{{ $labels.<name> }}`
    * and `{{ $value }}`, rendered PER INSTANCE ([[renderTemplate]]).
    */
  final case class AlertRule(alert: String, expr: String,
      forS: Long = 0, intervalS: Long = 0,
      keepFiringForS: Long = 0,
      labels: Map[String, String] = Map.empty,
      annotations: Map[String, String] = Map.empty)

  /** Alert template rendering — the `{{ $labels.<name> }}` /
    * `{{ $value }}` subset of upstream's Go-template surface (the two
    * forms real rule files use for routing-relevant annotations). A
    * label absent from the instance renders empty, like a missing Go
    * map key; `$value` renders with the JVM double's shortest-repr
    * `toString` (documented engine-wide float-rendering convention).
    */
  private val LabelTpl = raw"\{\{\s*\$$labels\.([a-zA-Z_][a-zA-Z0-9_]*)\s*\}\}".r
  private val ValueTpl = raw"\{\{\s*\$$value\s*\}\}".r
  def renderTemplate(tpl: String, labels: Map[String, String],
      value: Double): String = {
    val withLabels = LabelTpl.replaceAllIn(tpl, m =>
      scala.util.matching.Regex.quoteReplacement(
        labels.getOrElse(m.group(1), "")))
    ValueTpl.replaceAllIn(withLabels,
      scala.util.matching.Regex.quoteReplacement(value.toString))
  }

  /** Evaluate each recording rule to its DataFrame (compose-time errors
    * surface per rule, before any job runs).
    */
  def evaluateRecording(spark: SparkSession, dir: String,
      rules: Seq[RecordingRule]): Seq[(String, DataFrame)] =
    rules.map(r => r.record -> Engine.eval(spark, dir, r.expr))

  /** Materialize recording rules under `outDir/<record>` (parquet) —
    * the batch analog of the server writing recorded series to its
    * TSDB; rule outputs are re-readable as inputs of later stages.
    */
  def writeRecording(spark: SparkSession, dir: String,
      rules: Seq[RecordingRule], outDir: String): Unit =
    evaluateRecording(spark, dir, rules).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }

  /** A recording rule's FULL sample history as a labels-map relation —
    * `(labels` incl. `__name__` = record`, ts_ms, value)` — the shape
    * the remote-read door serves: upstream's primary remote-read use
    * case is a long-term-storage reader (Thanos, Cortex) pulling rule
    * outputs, and the rule loop's samples ARE TSDB series there. The
    * lattice anchors at the corpus instant T and covers every rule
    * instant back to the corpus start (g = span/interval + 1 whole
    * intervals), riding the dense-grid strategy — ONE event pass for
    * all instants, capped at the grid bound (`maxInstants`; a longer
    * retention shards by time range at scale). Values are the rule
    * vector's doubles, exactly what upstream's rule loop writes.
    */
  def recordedSeriesRelation(spark: SparkSession, dir: String,
      rule: RecordingRule, maxInstants: Int = 4096): DataFrame = {
    import org.apache.spark.sql.functions._
    val endS = Compiler.instantSeconds(spark, dir).toLong
    // cached 1-row aggregate — per-request lattice rebuilds stay
    // plan-only, no repeated min-ts scan
    val minS = Compiler.minInstantSeconds(spark, dir).toLong
    val g = math.min((endS - minS) / rule.intervalS + 1L,
      maxInstants.toLong).toInt
    val df = Api.queryRangeGrid(spark, dir, rule.record, g, rule.intervalS,
      recordingRules = Seq(rule))
    val labelCols = df.columns.filter(_.startsWith("label_")).toSeq
    val entries: Seq[Column] =
      Seq(lit("__name__"), lit(rule.record)) ++
        labelCols.flatMap(c => Seq(lit(c.stripPrefix("label_")),
          coalesce(col(c), lit(""))))
    df.select(map(entries: _*).as("labels"),
      (col("t_s") * 1000L).cast("long").as("ts_ms"),
      col("value").cast("double").as("value"))
  }

  /** The condition's series identity: every label column its compiled
    * vector retains. A fully-aggregated (scalar) condition gets a null
    * `label_k` so the ladder joins/outputs keep a stable shape — the
    * label-free alert fires on the empty label set, like upstream's
    * scalar alerts.
    */
  private[promql] def withSeriesKey(df: DataFrame): (DataFrame, Seq[String]) = {
    val lcs = df.columns.filter(c => c != "value" && c != "t_s").toSeq
    if (lcs.nonEmpty) (df, lcs)
    else (df.withColumn("label_k", lit(null).cast("string")), Seq("label_k"))
  }

  /** Null-safe conjunction over the series-key columns (Spark's
    * equi-join drops null keys; `<=>` keeps the scalar alert's null
    * label joinable).
    */
  private def keyEq(left: DataFrame, right: DataFrame,
      lcs: Seq[String], rightPrefix: String): Column =
    lcs.map(c => left(c) <=> right(rightPrefix + c)).reduce(_ && _)

  /** Evaluate alert rules; the union of firing series, one row per
    * (alertname, series) carrying the condition's full label set.
    * Rules whose conditions retain different label subsets align on
    * the union of their label columns (absent labels null), so one
    * call evaluates a whole rule file.
    */
  def evaluateAlerts(spark: SparkSession, dir: String,
      rules: Seq[AlertRule]): DataFrame = {
    val frames = rules.map { r =>
      if (r.keepFiringForS > 0) {
        // the grace window makes "firing now" depend on PAST ladder
        // states — delegate to the full ladder at offset 0 and keep
        // its firing rows (held series included, upstream's reading)
        val st = alertStates(spark, dir, r, Seq(0L))
          .filter(col("alertstate") === "firing")
        val lcs = st.columns
          .filterNot(Set("alertname", "alertstate", "offset_s", "value")
            .contains).toSeq
        st.select(col("alertname") +: (lcs.map(col) :+ col("value")): _*)
      } else evaluateOneAlert(spark, dir, r)
    }
    // align rule outputs on the union of their label columns (canonical
    // order: name, label_k, label_instance — the series-key order)
    val allLabels = Seq("name", "label_k", "label_instance")
      .filter(l => frames.exists(_.columns.contains(l)))
    val aligned = frames.map { f =>
      f.select(col("alertname") +: (allLabels.map(l =>
        if (f.columns.contains(l)) col(l)
        else lit(null).cast("string").as(l)) :+ col("value")): _*)
    }
    aligned.reduce(_ unionAll _)
      .orderBy((col("alertname") +: allLabels.map(col)): _*)
  }

  private def evaluateOneAlert(spark: SparkSession, dir: String,
      r: AlertRule): DataFrame = {
    {
      val ast = Parser.parse(r.expr)
      val (current, lcs) = withSeriesKey(Compiler.compileAt(spark, dir, ast, 0L))
      val sustained =
        if (r.forS <= 0) current
        else {
          if (r.intervalS <= 0 || r.forS % r.intervalS != 0)
            throw new PromQLCompileException(
              s"alert '${r.alert}': `for` (${r.forS}s) must be a positive multiple of the evaluation interval (${r.intervalS}s)")
          // firing = the condition's series present at EVERY past instant
          // too: semi-join the current firing set against each shifted
          // evaluation, null-safe on the FULL series key
          (1L to r.forS / r.intervalS).foldLeft(current) { (acc, i) =>
            val past = withSeriesKey(
              Compiler.compileAt(spark, dir, ast, i * r.intervalS))._1
              .select(lcs.map(c => col(c).as("_p_" + c)): _*).distinct()
            acc.join(past, keyEq(acc, past, lcs, "_p_"), "left_semi")
          }
        }
      sustained.select(lit(r.alert).as("alertname") +:
        (lcs.map(col) :+ col("value")): _*)
    }
  }

  /** The per-instant alert STATE ladder — upstream's `ALERTS` series
    * (`alertstate="pending"/"firing"`) over a range of evaluation
    * instants, completing [[evaluateAlerts]]'s single-instant batch
    * reading: at each output offset `o` (seconds before now), a series
    * breaching the condition is `firing` iff it also breached at every
    * lookback instant `o + i·interval`, `i = 1..for/interval`, else
    * `pending`. Inactive series emit nothing, exactly like upstream.
    *
    * Shape: one compiled plan per DISTINCT evaluation instant (output
    * offsets ∪ their lookbacks — the subquery union strategy), unioned
    * into a tiny presence relation (#series × #instants rows), then one
    * self-equi-join counting matched lookbacks. Nothing is
    * per-event; the event scan cost is the |instants| compiled
    * snapshots, each a filtered aggregate.
    */
  def alertStates(spark: SparkSession, dir: String, rule: AlertRule,
      offsets: Seq[Long]): DataFrame = {
    // forS == 0 is upstream's for-less rule: alerts skip `pending` and
    // fire at the first breaching instant (k = 0 below); a positive
    // `for` must divide into evaluation intervals
    if (rule.forS < 0 ||
        (rule.forS > 0 && (rule.intervalS <= 0 || rule.forS % rule.intervalS != 0)))
      throw new PromQLCompileException(
        s"alert '${rule.alert}': `for` (${rule.forS}s) must be a non-negative multiple of the evaluation interval (${rule.intervalS}s)")
    if (rule.keepFiringForS < 0 ||
        (rule.keepFiringForS > 0 &&
          (rule.intervalS <= 0 || rule.keepFiringForS % rule.intervalS != 0)))
      throw new PromQLCompileException(
        s"alert '${rule.alert}': `keep_firing_for` (${rule.keepFiringForS}s) must be a non-negative multiple of the evaluation interval (${rule.intervalS}s)")
    val ast = Parser.parse(rule.expr)
    val k = if (rule.forS == 0) 0 else (rule.forS / rule.intervalS).toInt
    // the lookback-join modulo needs a positive divisor even when the
    // for-less rule carries intervalS = 0 (k = 0 makes it vacuous)
    val iv = math.max(rule.intervalS, 1L)
    // keep_firing_for: a firing at a PAST instant within the grace
    // window holds the alert firing at the output instant, so ladder
    // states are computed at the grace extensions too
    val kf = if (rule.keepFiringForS == 0) 0
      else (rule.keepFiringForS / rule.intervalS).toInt
    val stateOffsets = (offsets ++
      offsets.flatMap(o => (1 to kf).map(i => o + i * iv))).distinct.sorted
    val evalOffsets =
      stateOffsets.flatMap(o => (0 to k).map(i => o + i * iv)).distinct.sorted
    val compiled = evalOffsets.map(o =>
      o -> withSeriesKey(Compiler.compileAt(spark, dir, ast, o)))
    val lcs = compiled.head._2._2
    val pres = compiled.map { case (o, (df, _)) =>
      df.select(lit(o).as("offset_s") +: (lcs.map(col) :+ col("value")): _*)
    }.reduce(_ unionAll _)
    val cur = pres.filter(col("offset_s").isin(stateOffsets: _*))
    val past = pres.select(col("offset_s").as("_p_off") +:
      lcs.map(c => col(c).as("_p_" + c)): _*)
    val base = cur.join(past,
        keyEq(cur, past, lcs, "_p_") &&
          past("_p_off") >= cur("offset_s") &&
          past("_p_off") <= cur("offset_s") + rule.forS &&
          ((past("_p_off") - cur("offset_s")) % iv === 0))
      .groupBy((col("offset_s") +: lcs.map(col) :+ col("value")): _*)
      .agg(count(lit(1)).as("_n"))
      .select(
        when(col("_n") === (k + 1), "firing").otherwise("pending").as("alertstate") +:
          col("offset_s") +: (lcs.map(col) :+ col("value")): _*)
    val resolved =
      if (kf == 0) base
      else {
        // a breaching row at an output offset, marked by ladder state
        val out = base.filter(col("offset_s").isin(offsets: _*))
          .select(col("offset_s") +: lcs.map(col) :+ col("value") :+
            (col("alertstate") === "firing").as("_fire") :+
            lit(false).as("_held") :+ col("offset_s").as("_src"): _*)
        // each FIRING instant projects a held-firing shadow onto the
        // kf following evaluation instants (smaller offsets = later
        // wall time); the union's groupBy (null labels group together,
        // so scalar alerts need no shadow keys here) resolves:
        // firing if any arm fires, value = the breaching row's if
        // present else the NEAREST past firing's (upstream serves the
        // last breach's value through the grace window)
        val held = base.filter(col("alertstate") === "firing")
          .withColumn("_i", explode(sequence(lit(1L), lit(kf.toLong))))
          .withColumn("_o", col("offset_s") - col("_i") * iv)
          .filter(col("_o").isin(offsets: _*) && col("_o") >= 0)
          .select(col("_o").as("offset_s") +: lcs.map(col) :+
            col("value") :+ lit(true).as("_fire") :+
            lit(true).as("_held") :+ col("offset_s").as("_src"): _*)
        out.unionByName(held)
          .groupBy((col("offset_s") +: lcs.map(col)): _*)
          .agg(
            max(col("_fire")).as("_f"),
            expr("min_by(value, struct(_held, _src))").as("value"))
          .select(
            when(col("_f"), "firing").otherwise("pending").as("alertstate") +:
              col("offset_s") +: (lcs.map(col) :+ col("value")): _*)
      }
    resolved
      .select(
        lit(rule.alert).as("alertname") +: col("alertstate") +:
          col("offset_s") +: (lcs.map(col) :+ col("value")): _*)
      .orderBy((col("offset_s") +: lcs.map(col)): _*)
  }

  /** [[alertStates]] at DASHBOARD resolution: the `ALERTS` state
    * timeline over `instants` step-spaced grid instants (end anchored
    * at `⌊T⌋`, the [[Api.queryRangeGrid]] anchor) as ONE dense-grid
    * plan — where [[alertStates]] compiles a snapshot per distinct
    * evaluation instant (its union strategy walls at ~64), this routes
    * the condition through [[Compiler.rangeGridEval]] (bound 4096) and
    * turns the pending→firing ladder into a sliding window:
    *
    *  - the condition evaluates once over an EXTENDED grid that
    *    prepends the `for/interval` lookback instants, so the first
    *    output step sees its full history;
    *  - breaches are densified onto the series×instant lattice and the
    *    lookback count is `count(value)` over a trailing window
    *    PARTITIONED BY the instant's residue class modulo
    *    `interval/step` — rows `1..k` back inside a residue class are
    *    exactly the instants `interval, 2·interval, …` earlier, so one
    *    `rowsBetween(−k, 0)` window IS the ladder even when the rule
    *    interval is a coarser multiple of the grid step;
    *  - `firing` iff all `k` lookbacks breached, `pending` otherwise;
    *    non-breaching instants emit nothing, exactly like upstream's
    *    `ALERTS` series and [[alertStates]].
    *
    * Event-scan cost is the ONE grid pass regardless of step count — a
    * 240-step alert timeline costs what a 10-step one does.
    */
  def alertStatesGrid(spark: SparkSession, dir: String, rule: AlertRule,
      instants: Int, stepS: Long): DataFrame = {
    require(instants >= 1, "at least one grid instant")
    require(stepS > 0, "step must be positive")
    if ((rule.forS > 0 || rule.keepFiringForS > 0) && rule.intervalS % stepS != 0)
      throw new PromQLCompileException(
        s"alert '${rule.alert}': the evaluation interval (${rule.intervalS}s) must be a multiple of the grid step (${stepS}s)")
    val endS = Compiler.instantSeconds(spark, dir).toLong
    val outStartS = endS - (instants - 1).toLong * stepS
    alertStatesGridAt(spark, dir, rule, outStartS, endS, stepS)
      .getOrElse(throw new PromQLCompileException(
        s"alert '${rule.alert}': no dense-grid strategy for the condition shape; use alertStates (per-instant union, ≤64 instants)"))
  }

  /** The range-parameterized core of [[alertStatesGrid]]: the ladder
    * evaluated at every step-spaced ABSOLUTE instant in
    * `[outStartS, outEndS]` (epoch seconds — the `query_range` grid the
    * `ALERTS` selector rides, [[graft.promql.Compiler]]'s grid arm).
    * Returns `None` when the shape has no one-plan evaluation — the
    * condition lacks a dense-grid strategy, or the rule interval
    * doesn't align with the grid step — so the selector falls to the
    * per-instant union path instead of refusing; rule-file CONFIG
    * errors (a `for` that isn't an interval multiple) still throw.
    */
  private[graft] def alertStatesGridAt(spark: SparkSession, dir: String,
      rule: AlertRule, outStartS: Long, outEndS: Long,
      stepS: Long): Option[DataFrame] = {
    require(stepS > 0, "step must be positive")
    require(outEndS >= outStartS, "end must be >= start")
    require((outEndS - outStartS) % stepS == 0,
      "grid bounds must be step-aligned")
    if (rule.forS < 0 ||
        (rule.forS > 0 && (rule.intervalS <= 0 || rule.forS % rule.intervalS != 0)))
      throw new PromQLCompileException(
        s"alert '${rule.alert}': `for` (${rule.forS}s) must be a non-negative multiple of the evaluation interval (${rule.intervalS}s)")
    if (rule.keepFiringForS < 0 ||
        (rule.keepFiringForS > 0 &&
          (rule.intervalS <= 0 || rule.keepFiringForS % rule.intervalS != 0)))
      throw new PromQLCompileException(
        s"alert '${rule.alert}': `keep_firing_for` (${rule.keepFiringForS}s) must be a non-negative multiple of the evaluation interval (${rule.intervalS}s)")
    if ((rule.forS > 0 || rule.keepFiringForS > 0) && rule.intervalS % stepS != 0)
      return None
    val instants = ((outEndS - outStartS) / stepS + 1).toInt
    val k = if (rule.forS == 0) 0 else (rule.forS / rule.intervalS).toInt
    val kf = if (rule.keepFiringForS == 0) 0
      else (rule.keepFiringForS / rule.intervalS).toInt
    val m = if (rule.forS == 0 && rule.keepFiringForS == 0) 1
      else (rule.intervalS / stepS).toInt
    val endS = outEndS
    val ext = instants + (k + kf) * m
    val startS = endS - (ext - 1).toLong * stepS
    val ast = Ast.resolveAtEdges(Parser.parse(rule.expr), Some(startS), Some(endS))
    val condOpt = Compiler.rangeGridEval(spark, dir, ast, startS, endS, stepS)
    if (condOpt.isEmpty) return None
    val cond = condOpt.get
    val (p0, lcs) = withSeriesKey(cond)
    // null-safe lattice keys: one coalesced shadow per label column (a
    // scalar condition breaches on the null label; Spark's equi-join
    // drops null keys). The sentinel is the NUL escape — no real label
    // value contains it.
    val shadows = lcs.indices.map(i => s"_sk$i")
    def shadowed(df: DataFrame): DataFrame =
      lcs.zip(shadows).foldLeft(df) { case (d, (c, s)) =>
        d.withColumn(s, coalesce(col(c), lit("\u0000")))
      }
    val p = shadowed(p0)
      .withColumn("_i",
        ((col("t_s") - lit(startS)) / lit(stepS)).cast("long") + lit(1L))
      .select((shadows.map(col) ++ lcs.map(col)) :+ col("_i") :+ col("value"): _*)
    import spark.implicits._
    // densify breaches onto the series×instant lattice so the trailing
    // window SEES missed instants (as null values) — ever-breaching
    // series only, the ladder's own output bound
    val lattice = p.select(shadows.map(col) ++ lcs.map(col): _*).distinct()
      .crossJoin(broadcast(spark.range(1L, ext + 1L).toDF("_i")))
    val dense = lattice.join(p.select((shadows.map(col) :+ col("_i")) :+ col("value"): _*),
      shadows :+ "_i", "left")
    val wl = Window.partitionBy(shadows.map(col) :+ pmod(col("_i"), lit(m.toLong)): _*)
      .orderBy(col("_i")).rowsBetween(-k, Window.currentRow)
    val laddered = dense.withColumn("_n", count(col("value")).over(wl))
    val staged =
      if (kf == 0) laddered
        .filter(col("value").isNotNull)
        .withColumn("_state",
          when(col("_n") === (k + 1), "firing").otherwise("pending"))
      else {
        // keep_firing_for on the grid: a ladder-firing instant holds the
        // alert firing for the next kf instants OF ITS RESIDUE CLASS
        // (one rule interval apart each — the same window partition the
        // ladder uses), serving the last breach's value through the
        // grace; a re-breach during the grace stays firing (upstream's
        // continuation rule)
        val wr = Window
          .partitionBy(shadows.map(col) :+ pmod(col("_i"), lit(m.toLong)): _*)
          .orderBy(col("_i"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fire0 = col("_n") === (k + 1) && col("value").isNotNull
        laddered
          .withColumn("_lastFire", max(when(fire0, col("_i"))).over(wr))
          .withColumn("_lastVal",
            last(when(fire0, col("value")), ignoreNulls = true).over(wr))
          .withColumn("_heldF", col("_lastFire").isNotNull &&
            (col("_i") - col("_lastFire")) <= kf.toLong * m)
          .filter(col("value").isNotNull || col("_heldF"))
          .withColumn("_state",
            when(col("_heldF"), "firing").otherwise(
              when(col("_n") === (k + 1), "firing").otherwise("pending")))
          .withColumn("value",
            when(col("value").isNotNull, col("value"))
              .otherwise(col("_lastVal")))
      }
    Some(staged
      .filter(col("_i") > (k + kf).toLong * m)
      .select(
        lit(rule.alert).as("alertname") +:
          col("_state").as("alertstate") +:
          (lit(startS) + (col("_i") - 1) * lit(stepS)).cast("long").as("t_s") +:
          (lcs.map(col) :+ col("value")): _*)
      .orderBy((col("t_s") +: lcs.map(col)): _*))
  }
}
