package graft.promql

import org.apache.spark.sql.SparkSession
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

  /** Evaluate `query` and render the instant-vector JSON envelope. */
  def queryJson(spark: SparkSession, dir: String, query: String): String = {
    val df = Engine.eval(spark, dir, query)
    val labelCols = df.columns.filter(_ != "value").toSeq
    val t = Compiler.instantSeconds(spark, dir)
    // one element per output series:
    //   {"metric":{...labels...},"value":[T,"<value>"]}
    val metric =
      if (labelCols.isEmpty) lit("{}")
      else to_json(struct(labelCols.map(c => col(c).as(promLabel(c))): _*))
    val element = concat(
      lit("{\"metric\":"), metric,
      lit(s""","value":[$t,""""), col("value").cast("string"), lit("\"]}"))
    val parts = df.select(element.as("j")).collect().map(_.getString(0))
    parts.mkString(
      """{"status":"success","data":{"resultType":"vector","result":[""",
      ",", "]}}")
  }
}
