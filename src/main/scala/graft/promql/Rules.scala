package graft.promql

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  */
object Rules {

  final case class RecordingRule(record: String, expr: String)

  /** An alert rule; `forS > 0` requires the condition to hold at EVERY
    * evaluation instant T, T−interval, …, T−for before the series
    * fires — Prometheus's pending→firing ladder collapsed to its batch
    * reading ("has this been true for the whole window, sampled at the
    * rule interval").
    */
  final case class AlertRule(alert: String, expr: String,
      forS: Long = 0, intervalS: Long = 0)

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

  /** Evaluate alert rules; the union of firing series, one row per
    * (alertname, series). Vectors that aggregated the label away fire
    * with a null label, like an alert on a scalar-valued expression.
    */
  def evaluateAlerts(spark: SparkSession, dir: String,
      rules: Seq[AlertRule]): DataFrame = {
    def labelled(df: DataFrame): DataFrame =
      if (df.columns.contains("label_k")) df.select(col("label_k"), col("value"))
      else df.select(lit(null).cast("string").as("label_k"), col("value"))
    val frames = rules.map { r =>
      val ast = Parser.parse(r.expr)
      val current = labelled(Compiler.compileAt(spark, dir, ast, 0L))
      val sustained =
        if (r.forS <= 0) current
        else {
          if (r.intervalS <= 0 || r.forS % r.intervalS != 0)
            throw new PromQLCompileException(
              s"alert '${r.alert}': `for` (${r.forS}s) must be a positive multiple of the evaluation interval (${r.intervalS}s)")
          // firing = the condition's series present at EVERY past instant
          // too: semi-join the current firing set against each shifted
          // evaluation (null-safe on the label — a label-free condition
          // fires on the empty label set, like Prometheus's scalar alerts)
          (1L to r.forS / r.intervalS).foldLeft(current) { (acc, i) =>
            val past = labelled(Compiler.compileAt(spark, dir, ast, i * r.intervalS))
              .select(col("label_k").as("_past_lk")).distinct()
            acc.join(past, acc("label_k") <=> past("_past_lk"), "left_semi")
          }
        }
      sustained.select(lit(r.alert).as("alertname"), col("label_k"), col("value"))
    }
    frames.reduce(_ unionAll _).orderBy(col("alertname"), col("label_k"))
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
    val ast = Parser.parse(rule.expr)
    val k = if (rule.forS == 0) 0 else (rule.forS / rule.intervalS).toInt
    // the lookback-join modulo needs a positive divisor even when the
    // for-less rule carries intervalS = 0 (k = 0 makes it vacuous)
    val iv = math.max(rule.intervalS, 1L)
    def labelled(df: DataFrame): DataFrame =
      if (df.columns.contains("label_k")) df.select(col("label_k"), col("value"))
      else df.select(lit(null).cast("string").as("label_k"), col("value"))
    val evalOffsets =
      offsets.flatMap(o => (0 to k).map(i => o + i * iv)).distinct.sorted
    val pres = evalOffsets.map { o =>
      labelled(Compiler.compileAt(spark, dir, ast, o))
        .select(lit(o).as("offset_s"), col("label_k"), col("value"))
    }.reduce(_ unionAll _)
    val cur = pres.filter(col("offset_s").isin(offsets: _*))
    val past = pres.select(col("offset_s").as("_p_off"), col("label_k").as("_p_lk"))
    cur.join(past,
        cur("label_k") <=> past("_p_lk") &&
          past("_p_off") >= cur("offset_s") &&
          past("_p_off") <= cur("offset_s") + rule.forS &&
          ((past("_p_off") - cur("offset_s")) % iv === 0))
      .groupBy(col("offset_s"), col("label_k"), col("value"))
      .agg(count(lit(1)).as("_n"))
      .select(
        lit(rule.alert).as("alertname"),
        when(col("_n") === (k + 1), "firing").otherwise("pending").as("alertstate"),
        col("offset_s"), col("label_k"), col("value"))
      .orderBy(col("offset_s"), col("label_k"))
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
    if (rule.forS < 0 ||
        (rule.forS > 0 && (rule.intervalS <= 0 || rule.forS % rule.intervalS != 0)))
      throw new PromQLCompileException(
        s"alert '${rule.alert}': `for` (${rule.forS}s) must be a non-negative multiple of the evaluation interval (${rule.intervalS}s)")
    if (rule.forS > 0 && rule.intervalS % stepS != 0)
      throw new PromQLCompileException(
        s"alert '${rule.alert}': the evaluation interval (${rule.intervalS}s) must be a multiple of the grid step (${stepS}s)")
    val k = if (rule.forS == 0) 0 else (rule.forS / rule.intervalS).toInt
    val m = if (rule.forS == 0) 1 else (rule.intervalS / stepS).toInt
    val endS = Compiler.instantSeconds(spark, dir).toLong
    val ext = instants + k * m
    val startS = endS - (ext - 1).toLong * stepS
    val ast = Ast.resolveAtEdges(Parser.parse(rule.expr), Some(startS), Some(endS))
    val cond = Compiler.rangeGridEval(spark, dir, ast, startS, endS, stepS)
      .getOrElse(throw new PromQLCompileException(
        s"alert '${rule.alert}': no dense-grid strategy for the condition shape; use alertStates (per-instant union, ≤64 instants)"))
    // the union ladder's label convention: label_k, or the null label
    // for conditions that aggregated it away
    val p0 =
      if (cond.columns.contains("label_k"))
        cond.select(col("label_k"), col("t_s"), col("value"))
      else cond.select(lit(null).cast("string").as("label_k"), col("t_s"),
        col("value"))
    // null-safe lattice key (a label-free condition breaches on the
    // null label; Spark's equi-join drops null keys)
    val p = p0
      .withColumn("_lk", coalesce(col("label_k"), lit(" ")))
      .withColumn("_i",
        ((col("t_s") - lit(startS)) / lit(stepS)).cast("long") + lit(1L))
      .select(col("_lk"), col("label_k"), col("_i"), col("value"))
    import spark.implicits._
    // densify breaches onto the series×instant lattice so the trailing
    // window SEES missed instants (as null values) — ever-breaching
    // series only, the ladder's own output bound
    val lattice = p.select(col("_lk"), col("label_k")).distinct()
      .crossJoin(broadcast(spark.range(1L, ext + 1L).toDF("_i")))
    val dense = lattice.join(p.select(col("_lk"), col("_i"), col("value")),
      Seq("_lk", "_i"), "left")
    val wl = Window.partitionBy(col("_lk"), pmod(col("_i"), lit(m.toLong)))
      .orderBy(col("_i")).rowsBetween(-k, Window.currentRow)
    dense
      .withColumn("_n", count(col("value")).over(wl))
      .filter(col("value").isNotNull && col("_i") > k.toLong * m)
      .select(
        lit(rule.alert).as("alertname"),
        when(col("_n") === (k + 1), "firing").otherwise("pending").as("alertstate"),
        (lit(startS) + (col("_i") - 1) * lit(stepS)).cast("long").as("t_s"),
        col("label_k"), col("value"))
      .orderBy(col("t_s"), col("label_k"))
  }
}
