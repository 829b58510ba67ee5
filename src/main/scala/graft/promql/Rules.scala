package graft.promql

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
