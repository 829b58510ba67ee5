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

  /** The `query_range` twin: `query` evaluated at each step-spaced grid
    * instant in `[startS, endS]` (epoch seconds, all ≤ the corpus
    * instant T), rendered as the matrix envelope
    * `{"resultType":"matrix","result":[{"metric":{...},
    *   "values":[[t,"v"],...]}, ...]}`.
    *
    * Physical shape: the per-instant plans union (compose-time bound 64
    * instants, like the subquery union strategy), per-(series, instant)
    * sample strings are built distributedly, and ONE hash aggregate per
    * series assembles the time-sorted values array — the collect stays
    * O(#series), never O(samples × series).
    */
  def queryRangeJson(spark: SparkSession, dir: String, query: String,
      startS: Long, endS: Long, stepS: Long): String = {
    require(stepS > 0, "step must be positive")
    require(endS >= startS, "end must be >= start")
    val ast = Parser.parse(query)
    val t = Compiler.instantSeconds(spark, dir)
    val instants = (startS to endS by stepS).toSeq
    require(instants.nonEmpty, "empty evaluation grid")
    if (instants.length > 64)
      throw new PromQLCompileException(
        s"query_range evaluates ${instants.length} instants; 1..64 supported")
    instants.foreach(i => require(i <= t,
      s"grid instant $i is after the corpus instant ${t.toLong}"))
    val slices = instants.map { i =>
      Compiler.compileAt(spark, dir, ast, (t - i).toLong)
        .withColumn("_t", lit(i))
    }
    val unioned = slices.reduce(_ unionAll _)
    val labelCols = unioned.columns.filterNot(c => c == "value" || c == "_t").toSeq
    val metric =
      if (labelCols.isEmpty) lit("{}")
      else to_json(struct(labelCols.map(c => col(c).as(promLabel(c))): _*))
    val sample = concat(lit("["), col("_t").cast("string"),
      lit(",\""), col("value").cast("string"), lit("\"]"))
    val series = unioned
      .select(metric.as("m"), col("_t"), sample.as("s"))
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

  private def envelope(dataJson: String): String =
    s"""{"status":"success","data":$dataJson}"""

  /** `/api/v1/series` twin: the distinct series (as metric maps)
    * matching a selector — one distinct aggregate over the series key.
    */
  def seriesJson(spark: SparkSession, dir: String, selector: String): String = {
    val df = Engine.eval(spark, dir, selector)
    val labelCols = df.columns.filter(_ != "value").toSeq
    val maps = df
      .select(to_json(struct(labelCols.map(c => col(c).as(promLabel(c))): _*)).as("m"))
      .distinct().orderBy(col("m"))
      .collect().map(_.getString(0))
    envelope(maps.mkString("[", ",", "]"))
  }

  /** `/api/v1/labels` twin: the label-name universe. */
  def labelsJson(spark: SparkSession, dir: String): String = {
    val names = graft.operators.Metrics.metricEvents(spark, dir).columns.toSeq
      .collect { case c if c == "name" || c.startsWith("label_") => promLabel(c) }
      .sorted
    envelope(names.map(n => s""""$n"""").mkString("[", ",", "]"))
  }

  /** `/api/v1/label/<label>/values` twin: distinct values of a label. */
  def labelValuesJson(spark: SparkSession, dir: String, label: String): String = {
    val c = label match {
      case "__name__" => "name"
      case other => "label_" + other
    }
    val ev = graft.operators.Metrics.metricEvents(spark, dir)
    if (!ev.columns.contains(c))
      throw new PromQLCompileException(s"unknown label '$label'")
    val vals = ev.select(to_json(struct(col(c).as("v"))).as("j"))
      .distinct().orderBy(col("j"))
      .collect().map(_.getString(0).stripPrefix("""{"v":""").stripSuffix("}"))
    envelope(vals.mkString("[", ",", "]"))
  }
}
