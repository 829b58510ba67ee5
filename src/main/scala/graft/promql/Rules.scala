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
  final case class AlertRule(alert: String, expr: String)

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
    val frames = rules.map { r =>
      val df = Engine.eval(spark, dir, r.expr)
      val labelled =
        if (df.columns.contains("label_k")) df.select(col("label_k"), col("value"))
        else df.select(lit(null).cast("string").as("label_k"), col("value"))
      labelled.select(lit(r.alert).as("alertname"), col("label_k"), col("value"))
    }
    frames.reduce(_ unionAll _).orderBy(col("alertname"), col("label_k"))
  }
}
