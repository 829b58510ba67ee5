package graft.promql

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  def queryJson(spark: SparkSession, dir: String, query: String,
      nativeFamilies: Set[String] = Set.empty): String = {
    val df = Engine.eval(spark, dir, query, nativeFamilies = nativeFamilies)
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
      nativeFamilies: Set[String] = Set.empty): String =
    queryRangeJsonImpl(spark, dir, query, startS, endS, stepS, grid = true,
      nativeFamilies)

  /** `grid = false` forces the per-instant union path — the test hook
    * that lets `QueryRangeSpec` pin union ≡ grid on a common grid.
    */
  private[graft] def queryRangeJsonImpl(spark: SparkSession, dir: String,
      query: String, startS: Long, endS: Long, stepS: Long,
      grid: Boolean, nativeFamilies: Set[String] = Set.empty): String =
    Compiler.withNativeFamilies(nativeFamilies)(
      queryRangeJsonBody(spark, dir, query, startS, endS, stepS, grid))

  private def queryRangeJsonBody(spark: SparkSession, dir: String,
      query: String, startS: Long, endS: Long, stepS: Long,
      grid: Boolean): String = {
    require(stepS > 0, "step must be positive")
    require(endS >= startS, "end must be >= start")
    // @ start()/@ end() pin to the range query's own bounds (upstream
    // Prometheus semantics), resolved once for BOTH physical paths
    val ast = Ast.resolveAtEdges(Parser.parse(query), Some(startS), Some(endS))
    val t = Compiler.instantSeconds(spark, dir)
    val instants = (startS to endS by stepS).toSeq
    require(instants.nonEmpty, "empty evaluation grid")
    instants.foreach(i => require(i <= t,
      s"grid instant $i is after the corpus instant ${t.toLong}"))
    val unioned = (if (grid) Compiler.rangeGridEval(spark, dir, ast, startS, endS, stepS)
      else None).map(_.withColumnRenamed("t_s", "_t")).getOrElse {
      if (instants.length > 64)
        throw new PromQLCompileException(
          s"query_range evaluates ${instants.length} instants; this query " +
            "shape supports 1..64 (dense-grid shapes evaluate up to 4096)")
      instants.map { i =>
        Compiler.compileAt(spark, dir, ast, (t - i).toLong)
          .withColumn("_t", lit(i))
      }.reduce(_ unionAll _)
    }
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

  /** Dense-grid `query_range` as a relation (`labels… :+ t_s :+ value`):
    * the grid anchored at the corpus instant — `end = ⌊T⌋`,
    * `start = end − (instants−1)·step` — so the registered p76 gate and
    * its DuckDB oracle agree on absolute epochs across sf dirs. Fails
    * at compose time for shapes without a grid strategy (those route
    * through [[queryRangeJson]]'s union path).
    */
  def queryRangeGrid(spark: SparkSession, dir: String, query: String,
      instants: Int, stepS: Long,
      nativeFamilies: Set[String] = Set.empty): DataFrame = {
    require(instants >= 1, "at least one grid instant")
    val endS = Compiler.instantSeconds(spark, dir).toLong
    val startS = endS - (instants - 1).toLong * stepS
    Compiler.withNativeFamilies(nativeFamilies)(
      Compiler.rangeGridEval(spark, dir,
        Ast.resolveAtEdges(Parser.parse(query), Some(startS), Some(endS)),
        startS, endS, stepS))
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
      matches: Seq[String]): String = {
    require(matches.nonEmpty, "at least one match[] selector")
    val tMs = Compiler.instantSeconds(spark, dir).toLong * 1000L
    val rendered = matches.map { m =>
      val df = Engine.eval(spark, dir, m)
      val labels = df.columns.filter(c => c != "value" && c != "name")
        .map(c => (promLabel(c), c)).sortBy(_._1)
      val inner = concat_ws(",", labels.map { case (p, c) =>
        concat(lit(p + "=\""), col(c), lit("\""))
      }.toIndexedSeq: _*)
      val cents = round(col("value") * 100).cast("long")
      df.select(concat(col("name"), lit("{"), inner, lit("} "),
        (cents / 100).cast("long").cast("string"), lit("."),
        lpad((cents % 100).cast("string"), 2, "0"),
        lit(s" $tMs")).as("line"))
    }.reduce(_ unionByName _).distinct()
    val parts = rendered.orderBy(col("line")).collect().map(_.getString(0))
    parts.mkString("", "\n", if (parts.nonEmpty) "\n" else "")
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
