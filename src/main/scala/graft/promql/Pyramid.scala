package graft.promql

import graft.model.MetricEvent
import graft.operators.Downsample
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ALIGNMENT-RULE ROUTER: serve `query_range` from the rollup
  * pyramid ([[graft.operators.Downsample]]) when the query shape and
  * the grid's alignment allow it — the automatic form of the rule the
  * p88/p90/p91 panels prove by hash gate ("aligned windows serve
  * losslessly from rollups", the Thanos/M3 downsampling contract).
  *
  * Servable shapes: `increase(counter[W])` / `rate(counter[W])`, bare
  * or under `sum [by (labels)]`, with any label matchers (the rollup
  * relation carries the full series key, so B1 matchers filter rollup
  * rows directly). Alignment: W, step, and every grid instant must be
  * multiples of a rollup resolution (the largest of 1d/6h/2h/1h that
  * divides all three is used, so coarser panels read fewer rows).
  *
  * Window convention — NONE diverges from the raw paths: a rollup
  * bucket holds samples in the closed-right `(b·res, (b+1)·res]`
  * ([[graft.operators.Downsample]] bucketCol), so a pyramid-served
  * window at instant `t` is exactly PromQL's range selector
  * `(t−W, t]` and instant reads include samples at exactly `t`, like
  * the raw paths. [[graft.PyramidRouterSpec]] pins bit-equality with
  * the dense-grid path including a sample landing EXACTLY on an
  * aligned boundary epoch, and the p92–p98 gates hash-check the
  * routed answers end-to-end against raw-events oracles, so rollup
  * serving is convention-exact at corpus scale — not approximately.
  *
  * 100 TB shape: the router's input is the compacted rollup relation
  * (series × buckets — the raw event count is already gone), the
  * instant lattice is a broadcast range, and each series costs one
  * sliding window. An unservable shape or unaligned grid returns
  * `None` and the caller falls through to the dense-grid path over
  * raw events — serving never silently changes semantics.
  */
object Pyramid {

  private val AllResolutions = Seq(86400L, 21600L, 7200L, 3600L)

  private val FullKey = Seq("name", "label_k", "label_instance")

  /** A served grid vector before materialization: the per-instant
    * relation (`labels… :+ t_s :+ value`), its label columns, and the
    * DEFERRED rate divisor — rates ride as exact decimals and divide
    * once at [[materialize]], the same convention as the dense-grid
    * tier's `rangeGridVector`, so cross-series aggregation stays
    * associative under any partitioning and ordering ops (min/max/
    * topk/quantile) rank identically before and after the division.
    */
  private type Vec = (DataFrame, Seq[String], Option[Double])

  private def materialize(v: Vec): DataFrame = {
    val (df, labels, rdiv) = v
    val value = rdiv.map(d => col("value").cast("double") / lit(d))
      .getOrElse(col("value").cast("double"))
    df.select(labels.map(col) :+ col("t_s") :+ value.as("value"): _*)
  }

  /** Route `ast` at the `[startS, endS] × stepS` grid through the
    * pyramid, or `None` when the shape/alignment forbids it. Output
    * matches the dense-grid relation contract: `labels… :+ t_s :+
    * value`, ordered by the caller.
    *
    * `maxResS` is Thanos's `max_source_resolution`: only rollup levels
    * at or below it may serve (the caller's bound on how much
    * pre-aggregation it accepts); the default admits every level.
    */
  def rangeEval(spark: SparkSession, dir: String, ast: Ast,
      startS: Long, endS: Long, stepS: Long,
      maxResS: Long = Long.MaxValue): Option[DataFrame] = {
    require(stepS > 0, "step must be positive")
    require(endS >= startS, "end must be >= start")
    vec(spark, dir, ast, startS, endS, stepS,
      AllResolutions.filter(_ <= maxResS)).map(materialize)
  }

  private def vec(spark: SparkSession, dir: String, ast: Ast,
      startS: Long, endS: Long, stepS: Long,
      resolutions: Seq[Long]): Option[Vec] = {
    def byColsOf(grouping: Option[(String, Seq[String])]): Option[Seq[String]] =
      grouping match {
        case None => Some(Nil)
        case Some(("by", ls)) => Some(ls.map(Compiler.labelCol))
        case Some(("without", ls)) =>
          val dropped = ls.map(Compiler.labelCol).toSet + "name"
          Some(FullKey.filterNot(dropped))
        case _ => None
      }
    ast match {
      // FUSED fast paths first: sum-of-rates aggregates rollup partials
      // BEFORE windowing (one window per group, not per series)
      case Agg("sum", grouping, None,
          Func(fn @ ("increase" | "rate"), None, sel: Selector))
          if servableSelector(sel, windowed = true) =>
        byColsOf(grouping).flatMap(bc =>
          serve(spark, dir, bc, fn, sel, startS, endS, stepS, resolutions))
      case Func(fn @ ("increase" | "rate"), None, sel: Selector)
          if servableSelector(sel, windowed = true) =>
        serve(spark, dir, FullKey, fn, sel, startS, endS, stepS, resolutions)
      // windowed gauge/counter sample aggregations: the rollup row
      // already carries every field the five *_over_time shapes need
      // (vmin/vmax/sum_dec/cnt), so an aligned window is one slide
      // over the compacted relation
      case Func(fn @ ("min_over_time" | "max_over_time" | "avg_over_time" |
          "sum_over_time" | "count_over_time" | "last_over_time" |
          "present_over_time"), None, sel: Selector)
          if servableOverTime(sel) =>
        serveOverTime(spark, dir, fn, sel, startS, endS, stepS, resolutions)
      // counter instant vector: running totals through each instant
      case Agg("sum", grouping, None, sel: Selector)
          if servableSelector(sel, windowed = false) =>
        byColsOf(grouping).flatMap(bc =>
          serveTotals(spark, dir, bc, sel, startS, endS, stepS, resolutions))
      case sel: Selector if servableSelector(sel, windowed = false) =>
        serveTotals(spark, dir, FullKey, sel, startS, endS, stepS, resolutions)
      // gauge instant vector: last-write-wins through each instant
      case sel: Selector if servableGauge(sel) =>
        serveGauge(spark, dir, sel, startS, endS, stepS, resolutions)
      // B11 derivations: histogram_count/sum/avg over a windowed
      // histogram family — the base rollup row already carries the
      // observation count and exact-decimal sum per bucket, so each is
      // one sliding window over the compacted relation (count and sum
      // ride undivided under rate's deferred divisor; avg divides the
      // two windowed moments — scale-invariant, rate ≡ increase)
      case Func(fn @ ("histogram_count" | "histogram_sum" | "histogram_avg"),
          None, Func(rf @ ("rate" | "increase"), None, sel: Selector))
          if servableHist(sel) =>
        serveHistScalar(spark, dir, fn, rf, sel, startS, endS, stepS,
          resolutions)
      // classic histogram_quantile over a windowed (aggregated)
      // histogram family — rank = φ·count is scale-invariant, so
      // rate and increase route identically
      case Func("histogram_quantile", Some(phi),
          Agg("sum", grouping, None,
            Func("increase" | "rate", None, sel: Selector)))
          if servableHist(sel) =>
        byColsOf(grouping).flatMap(bc =>
          serveHistQuantile(spark, dir, bc, phi, sel, startS, endS, stepS,
            resolutions))
      case Func("histogram_quantile", Some(phi),
          Func("increase" | "rate", None, sel: Selector))
          if servableHist(sel) =>
        serveHistQuantile(spark, dir, FullKey, phi, sel, startS, endS, stepS,
          resolutions)
      // the GENERIC vector-aggregation layer: every PromQL aggregation
      // op over ANY served inner, per (group, instant) — the dense-grid
      // tier's composition layer re-expressed over rollup-served
      // operands (identical value expressions, `t_s` in place of the
      // grid index, so the two paths bit-match)
      case Agg(op, grouping, param, inner)
          if GenericAggOps.contains(op) =>
        vec(spark, dir, inner, startS, endS, stepS, resolutions)
          .flatMap { case (df, labels, rdiv) =>
            groupColsOf(grouping, labels).flatMap { groupCols =>
              if (!groupCols.forall(labels.contains)) None
              else applyAgg(op, param, df, labels, groupCols, rdiv)
            }
          }
      // COMPOSITION: binary arithmetic / comparison filters over
      // pyramid-served operands — the error-ratio and threshold panels
      // (`sum by (k)(rate(a[w])) / sum by (k)(rate(b[w]))`, `… > 0.05`,
      // `… * 100`). Both operands route recursively (each picks its own
      // best rollup level), then one equi-join per instant on the
      // shared label columns — default one-to-one matching. Vector
      // operands carrying `name` (bare selectors) decline: default
      // matching drops the metric name, which the raw paths own; the
      // aggregated forms dashboards use carry only `by` labels.
      case b: BinOp
          if (ArithOps.contains(b.op) || CmpOps.contains(b.op)) &&
            !b.boolMod && b.on.isEmpty && b.ignoring.isEmpty &&
            !b.groupLeft && !b.groupRight =>
        def served(a: Ast): Option[DataFrame] =
          vec(spark, dir, a, startS, endS, stepS, resolutions).map(materialize)
        val out = (b.left, b.right) match {
          case (NumLit(v), r0) =>
            served(r0).map(applyScalar(b.op, _, v, scalarLeft = true))
          case (l0, NumLit(v)) =>
            served(l0).map(applyScalar(b.op, _, v, scalarLeft = false))
          case (l0, r0) =>
            for {
              lDf <- served(l0)
              rDf <- served(r0)
              j <- joinServed(b.op, lDf, rDf)
            } yield j
        }
        out.map(df =>
          (df, df.columns.toSeq.filterNot(Set("t_s", "value")), None))
      case _ => None
    }
  }

  private val ArithOps = Set("+", "-", "*", "/", "%")
  private val CmpOps = Set(">", "<", ">=", "<=", "==", "!=")

  private val GenericAggOps = Set("sum", "min", "max", "count", "avg",
    "quantile", "stddev", "stdvar", "group", "topk", "bottomk",
    "limitk", "limit_ratio")

  /** Grouping → group columns over the INNER's label set (the nested
    * form of `byColsOf`: after an aggregation the label universe is the
    * group's, not the full series key).
    */
  private def groupColsOf(grp: Option[(String, Seq[String])],
      labels: Seq[String]): Option[Seq[String]] = grp match {
    case None => Some(Nil)
    case Some(("by", ls)) => Some(ls.map(Compiler.labelCol))
    case Some(("without", ls)) =>
      val dropped = ls.map(Compiler.labelCol).toSet
      Some(labels.filterNot(l => l == "name" || dropped.contains(l)))
    case _ => None
  }

  /** Order-safe cross-series sum: decimal vectors (undivided rates,
    * running totals) sum exactly; double vectors sum through
    * DECIMAL(38,12) — the dense-grid tier's `vectorSum` convention.
    */
  private def vectorSum(df: DataFrame): Column =
    if (df.schema("value").dataType
        .isInstanceOf[org.apache.spark.sql.types.DecimalType]) sum(col("value"))
    else sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 12)))

  /** One aggregation op per (group, instant) over a served vector —
    * the dense-grid composition layer's expressions verbatim with
    * `t_s` as the instant key. Ops that ORDER (min/max/topk/bottomk/
    * quantile) act on the undivided decimal: the deferred divisor is
    * positive, so ranking commutes with it; stddev/stdvar divide FIRST
    * (the union path's cents-moment convention needs the actual rate).
    */
  private def applyAgg(op: String, param: Option[Double], v: DataFrame,
      labels: Seq[String], groupCols: Seq[String],
      rdiv: Option[Double]): Option[Vec] = {
    val byInst = (groupCols :+ "t_s").map(col)
    op match {
      case "sum" => Some((v.groupBy(byInst: _*)
        .agg(vectorSum(v).as("value")), groupCols, rdiv))
      case "min" => Some((v.groupBy(byInst: _*)
        .agg(min(col("value")).as("value")), groupCols, rdiv))
      case "max" => Some((v.groupBy(byInst: _*)
        .agg(max(col("value")).as("value")), groupCols, rdiv))
      case "count" => Some((v.groupBy(byInst: _*)
        .agg(count(lit(1)).cast("double").as("value")),
        groupCols, None)) // series counts are not rate-scaled
      case "avg" => Some((v.groupBy(byInst: _*)
        .agg((vectorSum(v).cast("double") / count(lit(1)).cast("double"))
          .as("value")), groupCols, rdiv))
      case "quantile" => param.map { phi =>
        (v.groupBy(byInst: _*)
          .agg(expr(s"percentile(cast(value as double), $phi)")
            .as("value")), groupCols, rdiv)
      }
      case "stddev" | "stdvar" =>
        val m = (rdiv match {
          case Some(d) => v.withColumn("value",
            col("value").cast("double") / lit(d))
          case None => v
        }).withColumn("_cents", round(col("value") * 100, 0).cast("long"))
          .groupBy(byInst: _*)
          .agg(sum(col("_cents")).as("_s1"),
            sum(col("_cents") * col("_cents")).as("_s2"),
            count(lit(1)).as("_n"))
        val mean = col("_s1").cast("double") / col("_n").cast("double")
        val varCents = col("_s2").cast("double") / col("_n").cast("double") -
          mean * mean
        val sOut = if (op == "stddev") sqrt(varCents) / 100.0
          else varCents / 10000.0
        Some((m.select((groupCols :+ "t_s").map(col) :+ sOut.as("value"): _*),
          groupCols, None))
      case "group" =>
        Some((v.groupBy(byInst: _*).agg(max(lit(1.0)).as("value")),
          groupCols, None))
      case "topk" | "bottomk" => param match {
        case Some(n) if n == n.floor && n >= 1 =>
          val ord =
            if (op == "topk") col("value").desc +: labels.map(col)
            else col("value").asc +: labels.map(col)
          val w = Window.partitionBy(byInst: _*).orderBy(ord: _*)
          Some((v.withColumn("_rk", row_number().over(w))
            .filter(col("_rk") <= n.toInt).drop("_rk"), labels, rdiv))
        case _ => None
      }
      case "limitk" => param match {
        case Some(n) if n == n.floor && n >= 1 =>
          // the deterministic md5 label-identity pick, ranked among the
          // series PRESENT at each instant
          val sig = md5(concat_ws("|", labels.map(col): _*))
          val w = Window.partitionBy(byInst: _*)
            .orderBy(sig.asc +: labels.map(col): _*)
          Some((v.withColumn("_rk", row_number().over(w))
            .filter(col("_rk") <= n.toInt).drop("_rk"), labels, rdiv))
        case _ => None
      }
      case "limit_ratio" => param match {
        case Some(r) if r >= -1.0 && r <= 1.0 =>
          // per-SERIES hash decision — instant-independent
          if (r == 1.0 || r == -1.0) Some((v, labels, rdiv))
          else {
            val u = substring(md5(concat_ws("|", labels.map(col): _*)), 1, 8)
            val keep = if (r >= 0) {
              val thr = f"${math.floor(r * 4294967296.0).toLong}%08x"
              u < lit(thr)
            } else {
              val thr = f"${math.floor((1.0 + r) * 4294967296.0).toLong}%08x"
              u >= lit(thr)
            }
            Some((v.filter(keep), labels, rdiv))
          }
        case _ => None
      }
    }
  }

  private def arith(op: String, l: Column, r: Column): Column = op match {
    case "+" => l.cast("double") + r.cast("double")
    case "-" => l.cast("double") - r.cast("double")
    case "*" => l.cast("double") * r.cast("double")
    case "/" => l.cast("double") / r.cast("double")
    case "%" => l.cast("double") % r.cast("double")
  }

  private def cmp(op: String, l: Column, r: Column): Column = op match {
    case ">" => l > r
    case "<" => l < r
    case ">=" => l >= r
    case "<=" => l <= r
    case "==" => l === r
    case "!=" => l =!= r
  }

  /** Scalar-literal operand over a served relation: arithmetic maps the
    * value column, comparisons filter (PromQL's non-`bool` semantics).
    */
  private def applyScalar(op: String, df: DataFrame, v: Double,
      scalarLeft: Boolean): DataFrame = {
    val (l, r) =
      if (scalarLeft) (lit(v), col("value").cast("double"))
      else (col("value").cast("double"), lit(v))
    if (ArithOps.contains(op)) df.withColumn("value", arith(op, l, r))
    else df.filter(cmp(op, l, r))
  }

  /** Default one-to-one matching of two served relations: both sides
    * must expose the SAME label columns (none of them `name` — the
    * aggregated dashboard forms), joined per (labels, instant); the
    * join is inner, so unmatched samples drop like upstream's default
    * matching. Arithmetic combines the values; a comparison keeps the
    * LEFT side's sample when it holds.
    */
  private def joinServed(op: String, lDf: DataFrame,
      rDf: DataFrame): Option[DataFrame] = {
    val lLabels = lDf.columns.toSeq.filterNot(Set("t_s", "value"))
    val rLabels = rDf.columns.toSeq.filterNot(Set("t_s", "value"))
    if (lLabels.toSet != rLabels.toSet || lLabels.contains("name")) None
    else {
      val joined = lDf.join(rDf.withColumnRenamed("value", "_rv"),
        lLabels :+ "t_s", "inner")
      val out =
        if (ArithOps.contains(op))
          joined.withColumn("value",
            arith(op, col("value"), col("_rv")))
        else joined.filter(cmp(op, col("value").cast("double"),
          col("_rv").cast("double")))
      Some(out.select((lLabels.map(col) :+ col("t_s") :+
        col("value").cast("double").as("value")): _*))
    }
  }

  /** Counter family, no time shift (an `offset`/`@` would shift
    * windows off the bucket lattice); `windowed` demands/forbids the
    * range suffix.
    */
  private def servableSelector(sel: Selector, windowed: Boolean): Boolean =
    (if (windowed) sel.rangeS.exists(_ > 0) else sel.rangeS.isEmpty) &&
      sel.offsetS.isEmpty && sel.atS.isEmpty &&
      sel.name.nonEmpty && MetricEvent.CounterNames.contains(sel.name) &&
      sel.matchers.forall(_.label != "__name__")

  private def servableGauge(sel: Selector): Boolean =
    sel.rangeS.isEmpty && sel.offsetS.isEmpty && sel.atS.isEmpty &&
      sel.name.nonEmpty && MetricEvent.GaugeNames.contains(sel.name) &&
      sel.matchers.forall(_.label != "__name__")

  private def servableHist(sel: Selector): Boolean =
    sel.rangeS.exists(_ > 0) && sel.offsetS.isEmpty && sel.atS.isEmpty &&
      sel.name.nonEmpty && MetricEvent.HistogramNames.contains(sel.name) &&
      sel.matchers.forall(_.label != "__name__")

  /** `*_over_time` windows read raw sample VALUES, so any scalar-valued
    * family serves (counter or gauge — the rollup's vmin/vmax/sum/cnt
    * fields are kind-agnostic); histogram observations have no scalar
    * instant value, mirroring the raw paths' kind check.
    */
  private def servableOverTime(sel: Selector): Boolean =
    sel.rangeS.exists(_ > 0) && sel.offsetS.isEmpty && sel.atS.isEmpty &&
      sel.name.nonEmpty &&
      (MetricEvent.CounterNames.contains(sel.name) ||
        MetricEvent.GaugeNames.contains(sel.name)) &&
      sel.matchers.forall(_.label != "__name__")

  private def serve(spark: SparkSession, dir: String, byCols: Seq[String],
      fn: String, sel: Selector, startS: Long, endS: Long,
      stepS: Long, resolutions: Seq[Long]): Option[Vec] = {
    val w = sel.rangeS.get
    resolutions
      .find(r => w % r == 0 && stepS % r == 0 && startS % r == 0)
      .map { res =>
        val nb = (w / res).toInt
        // instant t ↔ the window's LAST bucket t/res − 1
        val bLo = startS / res - nb // earliest bucket any window reads
        val bHi = endS / res - 1
        val roll = Downsample
          .compact(Downsample.rollup1hCached(spark, dir), res)
          .filter(col("name") === sel.name &&
            Compiler.matcherFilter(sel.matchers))
          .withColumn("_b", expr(s"bucket_s div $res"))
          .filter(col("_b").between(bLo, bHi))
          .groupBy((byCols :+ "_b").map(col): _*)
          .agg(sum(col("sum_dec")).as("_s"), sum(col("cnt")).as("_n"))
        import spark.implicits._
        val lattice = (if (byCols.isEmpty) spark.range(1).toDF("_one")
          else roll.select(byCols.map(col): _*).distinct())
          .crossJoin(broadcast(
            spark.range(bLo, bHi + 1).toDF("_b")))
          .select((byCols :+ "_b").map(col): _*)
        val win = Window.partitionBy(byCols.map(col): _*).orderBy(col("_b"))
          .rowsBetween(-(nb - 1), Window.currentRow)
        // both windowed sums evaluate BEFORE the instant filter — the
        // frame must slide over the dense bucket lattice, not over
        // whichever rows survive filtering; the windowed DECIMAL rides
        // undivided (rate's divisor defers to materialize)
        val df = lattice.join(roll, byCols :+ "_b", "left")
          .withColumn("_ws", sum(col("_s")).over(win))
          .withColumn("_wn", sum(col("_n")).over(win))
          .withColumn("t_s", ((col("_b") + 1) * res).cast("long"))
          .filter(col("_wn") > 0 &&
            col("t_s").between(startS, endS) &&
            (col("t_s") - lit(startS)) % lit(stepS) === 0)
          .select((byCols.map(col) :+ col("t_s") :+
            col("_ws").as("value")): _*)
        (df, byCols, if (fn == "rate") Some(w.toDouble) else None)
      }
  }

  /** Shared: alignment pick for instant-vector serving (no window to
    * constrain — only step and start must sit on a rollup lattice).
    */
  private def instantRes(startS: Long, stepS: Long,
      resolutions: Seq[Long]): Option[Long] =
    resolutions.find(r => stepS % r == 0 && startS % r == 0)

  /** Shared: the compacted, matcher-filtered rollup rows of `sel` at
    * resolution `res`, with `_b` = bucket index, bounded above by the
    * last bucket any instant reads.
    */
  private def rollOf(spark: SparkSession, dir: String, sel: Selector,
      res: Long, bHi: Long): DataFrame =
    Downsample.compact(Downsample.rollup1hCached(spark, dir), res)
      .filter(col("name") === sel.name && Compiler.matcherFilter(sel.matchers))
      .withColumn("_b", expr(s"bucket_s div $res"))
      .filter(col("_b") <= bHi)

  /** Per-group dense bucket lattice from each group's FIRST data
    * bucket through `bHi` — series (or `by`-groups) emit nothing
    * before their first sample, like the instant vector.
    */
  private def groupLattice(roll: DataFrame, byCols: Seq[String],
      bHi: Long): DataFrame =
    roll.groupBy(byCols.map(col): _*).agg(min(col("_b")).as("_b0"))
      .select(byCols.map(col) :+
        explode(sequence(col("_b0"), lit(bHi))).as("_b"): _*)

  /** Counter INSTANT vector from the pyramid: the running total through
    * each aligned instant — one cumulative window over the group's
    * bucket lattice (samples at or before `t`, the inclusive instant
    * read, like every pyramid window under closed-right buckets).
    */
  private def serveTotals(spark: SparkSession, dir: String,
      byCols: Seq[String], sel: Selector, startS: Long, endS: Long,
      stepS: Long, resolutions: Seq[Long]): Option[Vec] =
    instantRes(startS, stepS, resolutions).map { res =>
      val bHi = endS / res - 1
      val roll = rollOf(spark, dir, sel, res, bHi)
        .groupBy((byCols :+ "_b").map(col): _*)
        .agg(sum(col("sum_dec")).as("_s"))
      val win = Window.partitionBy(byCols.map(col): _*).orderBy(col("_b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val df = groupLattice(roll, byCols, bHi)
        .join(roll, byCols :+ "_b", "left")
        .withColumn("_ws", sum(col("_s")).over(win))
        .withColumn("t_s", ((col("_b") + 1) * res).cast("long"))
        .filter(col("t_s").between(startS, endS) &&
          (col("t_s") - lit(startS)) % lit(stepS) === 0)
        .select(byCols.map(col) :+ col("t_s") :+ col("_ws").as("value"): _*)
      (df, byCols, None)
    }

  /** Gauge INSTANT vector from the pyramid: last-write-wins through
    * each aligned instant from the rollups' anchored `vlast` fields —
    * later buckets strictly out-anchor earlier ones (the p89 law), so
    * the running LWW is one `last(ignoreNulls)` window per series.
    *
    * STALENESS: a bucket whose latest event is a marker
    * (`stale_at` out-anchors `last_at`) emits a CUT token instead of a
    * value — the carried LWW goes absent at that instant and stays
    * absent until a newer real sample revives the series (upstream's
    * instant-selector marker semantics, served from rollup fields
    * alone).
    */
  private def serveGauge(spark: SparkSession, dir: String, sel: Selector,
      startS: Long, endS: Long, stepS: Long,
      resolutions: Seq[Long]): Option[Vec] =
    instantRes(startS, stepS, resolutions).map { res =>
      val keys = FullKey
      val bHi = endS / res - 1
      val roll = rollOf(spark, dir, sel, res, bHi)
        .withColumn("_tok", gaugeToken)
        .select(keys.map(col) :+ col("_b") :+ col("_tok"): _*)
      val win = Window.partitionBy(keys.map(col): _*).orderBy(col("_b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val df = groupLattice(roll, keys, bHi)
        .join(roll, keys :+ "_b", "left")
        .withColumn("_c", last(col("_tok"), ignoreNulls = true).over(win))
        .withColumn("_v",
          when(!col("_c").getField("cut"), col("_c").getField("v")))
        .withColumn("t_s", ((col("_b") + 1) * res).cast("long"))
        .filter(col("_v").isNotNull &&
          col("t_s").between(startS, endS) &&
          (col("t_s") - lit(startS)) % lit(stepS) === 0)
        .select(keys.map(col) :+ col("t_s") :+ col("_v").as("value"): _*)
      (df, keys, None)
    }

  /** The per-bucket LWW token a rollup row contributes to the carried
    * gauge state: a CUT (series absent from the bucket's closed-right
    * instant on) when the latest event in the bucket is a staleness
    * marker, the anchored `vlast` otherwise; null (carry the previous
    * state) for a bucket with neither. Shared by [[serveGauge]] and
    * [[graft.operators.Downsample.gaugePanel]].
    */
  private[graft] def gaugeToken: Column = {
    val cut = col("stale_at").isNotNull &&
      (col("last_at").isNull || col("stale_at") > col("last_at"))
    when(cut, struct(lit(true).as("cut"),
        lit(null).cast("double").as("v")))
      .when(col("last_at").isNotNull,
        struct(lit(false).as("cut"), col("vlast").as("v")))
  }

  /** The five `*_over_time` sample-window aggregations per series from
    * rollup fields alone — the rollup row already pays for exactly
    * these (`vmin`/`vmax`/`sum_dec`/`cnt`), so an aligned window is one
    * sliding window over the compacted relation: min/max nest, sums and
    * counts add, and `avg` is the exact-decimal sum over the count with
    * the cast at the end (the engine-wide float convention). Windows
    * are PromQL's `(t−W, t]` exactly, like every arm here.
    */
  private def serveOverTime(spark: SparkSession, dir: String, fn: String,
      sel: Selector, startS: Long, endS: Long, stepS: Long,
      resolutions: Seq[Long]): Option[Vec] = {
    val w = sel.rangeS.get
    resolutions
      .find(r => w % r == 0 && stepS % r == 0 && startS % r == 0)
      .map { res =>
        val nb = (w / res).toInt
        val keys = FullKey
        val bLo = startS / res - nb
        val bHi = endS / res - 1
        val roll = rollOf(spark, dir, sel, res, bHi)
          .filter(col("_b") >= bLo)
          .select(keys.map(col) :+ col("_b") :+ col("cnt") :+
            col("sum_dec") :+ col("vmin") :+ col("vmax") :+ col("vlast"): _*)
        import spark.implicits._
        val lattice = roll.select(keys.map(col): _*).distinct()
          .crossJoin(broadcast(spark.range(bLo, bHi + 1).toDF("_b")))
        val win = Window.partitionBy(keys.map(col): _*).orderBy(col("_b"))
          .rowsBetween(-(nb - 1), Window.currentRow)
        val joined = lattice.join(roll, keys :+ "_b", "left")
          .withColumn("_wn", sum(col("cnt")).over(win))
        val value = fn match {
          case "sum_over_time" => sum(col("sum_dec")).over(win).cast("double")
          case "count_over_time" => col("_wn").cast("double")
          case "avg_over_time" =>
            sum(col("sum_dec")).over(win).cast("double") /
              col("_wn").cast("double")
          case "min_over_time" => min(col("vmin")).over(win)
          case "max_over_time" => max(col("vmax")).over(win)
          // the freshest sample in the window: the latest data bucket's
          // anchored vlast (later buckets strictly out-anchor earlier)
          case "last_over_time" => last(col("vlast"), ignoreNulls = true).over(win)
          case "present_over_time" => lit(1.0)
        }
        val df = joined
          .withColumn("_v", value)
          .withColumn("t_s", ((col("_b") + 1) * res).cast("long"))
          .filter(col("_wn") > 0 &&
            col("t_s").between(startS, endS) &&
            (col("t_s") - lit(startS)) % lit(stepS) === 0)
          .select(keys.map(col) :+ col("t_s") :+ col("_v").as("value"): _*)
        (df, keys, None)
      }
  }

  /** `histogram_count/sum/avg(rate|increase(hist[W]))` per series from
    * the BASE rollup's (cnt, sum_dec) fields — the union path's
    * windowed moments over compacted buckets: count and sum ride
    * undivided (rate's ÷W defers to materialize, so the division
    * expression is the union path's `cnt/W` / `(Σdec→double)/W`
    * exactly); avg = the exact-decimal sum over the count with the
    * casts in the union path's order.
    */
  private def serveHistScalar(spark: SparkSession, dir: String, fn: String,
      rf: String, sel: Selector, startS: Long, endS: Long, stepS: Long,
      resolutions: Seq[Long]): Option[Vec] = {
    val w = sel.rangeS.get
    resolutions
      .find(r => w % r == 0 && stepS % r == 0 && startS % r == 0)
      .map { res =>
        val nb = (w / res).toInt
        val bLo = startS / res - nb
        val bHi = endS / res - 1
        val roll = rollOf(spark, dir, sel, res, bHi)
          .filter(col("_b") >= bLo)
          .groupBy((FullKey :+ "_b").map(col): _*)
          .agg(sum(col("sum_dec")).as("_s"), sum(col("cnt")).as("_n"))
        import spark.implicits._
        val lattice = roll.select(FullKey.map(col): _*).distinct()
          .crossJoin(broadcast(spark.range(bLo, bHi + 1).toDF("_b")))
        val win = Window.partitionBy(FullKey.map(col): _*).orderBy(col("_b"))
          .rowsBetween(-(nb - 1), Window.currentRow)
        val windowed = lattice.join(roll, FullKey :+ "_b", "left")
          .withColumn("_ws", sum(col("_s")).over(win))
          .withColumn("_wn", sum(col("_n")).over(win))
          .withColumn("t_s", ((col("_b") + 1) * res).cast("long"))
          .filter(col("_wn") > 0 &&
            col("t_s").between(startS, endS) &&
            (col("t_s") - lit(startS)) % lit(stepS) === 0)
        // values divide HERE, not at materialize: the reference for
        // these shapes is the union path, whose aggregations consume
        // the divided doubles (through the order-safe DECIMAL(38,12)
        // sum) — deferring the divisor would sum exact decimals and
        // disagree in the 12th decimal under sum/avg composition
        val value = fn match {
          case "histogram_count" =>
            if (rf == "rate") col("_wn").cast("double") / lit(w.toDouble)
            else col("_wn").cast("double")
          case "histogram_sum" =>
            if (rf == "rate") col("_ws").cast("double") / lit(w.toDouble)
            else col("_ws").cast("double")
          case "histogram_avg" =>
            col("_ws").cast("double") / col("_wn").cast("double")
        }
        (windowed.select(FullKey.map(col) :+ col("t_s") :+
          value.as("value"): _*), FullKey, None)
      }
  }

  /** Classic `histogram_quantile(φ, sum by (…) (rate(hist[W])))` from
    * the HISTOGRAM level of the pyramid
    * ([[Downsample.histRollupRaw]]): windowed per-`le` cumulative
    * counts from compacted ladders + one sliding window per
    * (group, le), then the engine's fused single-pass interpolation
    * per (group, instant) — the p90 panel generalized over φ, window,
    * grouping, matchers, and grid.
    */
  private def serveHistQuantile(spark: SparkSession, dir: String,
      byCols: Seq[String], phi: Double, sel: Selector, startS: Long,
      endS: Long, stepS: Long, resolutions: Seq[Long]): Option[Vec] = {
    val w = sel.rangeS.get
    resolutions
      .find(r => w % r == 0 && stepS % r == 0 && startS % r == 0)
      .map { res =>
        val nb = (w / res).toInt
        val bLo = startS / res - nb
        val bHi = endS / res - 1
        val h = Downsample
          .histCompact(Downsample.histRollup1hCached(spark, dir), res)
          .filter(col("name") === sel.name &&
            Compiler.matcherFilter(sel.matchers))
          .withColumn("_b", expr(s"bucket_s div $res"))
          .filter(col("_b").between(bLo, bHi))
          .groupBy((byCols :+ "_b" :+ "le").map(col): _*)
          .agg(sum(col("cum_count")).as("_c"), sum(col("cnt")).as("_n"))
        import spark.implicits._
        val lattice = h.select((byCols :+ "le").map(col): _*).distinct()
          .crossJoin(broadcast(spark.range(bLo, bHi + 1).toDF("_b")))
        val win = Window.partitionBy((byCols :+ "le").map(col): _*)
          .orderBy(col("_b")).rowsBetween(-(nb - 1), Window.currentRow)
        val windowed = lattice.join(h, byCols ++ Seq("_b", "le"), "left")
          .withColumn("_wc", sum(col("_c")).over(win))
          .withColumn("_wn", sum(col("_n")).over(win))
          .withColumn("t_s", ((col("_b") + 1) * res).cast("long"))
          .filter(col("_wn") > 0 &&
            col("t_s").between(startS, endS) &&
            (col("t_s") - lit(startS)) % lit(stepS) === 0)
        val wq = Window.partitionBy((byCols :+ "_b").map(col): _*)
          .orderBy(col("le"))
        val part = Window.partitionBy((byCols :+ "_b").map(col): _*)
        val ranked = windowed
          .withColumn("rank", lit(phi) * col("_wn").cast("double"))
          .withColumn("prev_le", coalesce(lag(col("le"), 1).over(wq), lit(0.0)))
          .withColumn("prev_cum", coalesce(lag(col("_wc"), 1).over(wq), lit(0L)))
          .withColumn("max_le", max(col("le")).over(part))
          .withColumn("max_cum", max(col("_wc")).over(part))
        val overflowRow = col("le") === col("max_le") &&
          col("rank") > col("max_cum").cast("double")
        val inBucketRow = col("_wc") >= col("rank") &&
          col("prev_cum") < col("rank")
        val df = ranked
          .filter(inBucketRow || overflowRow)
          .select(byCols.map(col) :+ col("t_s") :+
            when(overflowRow, col("max_le"))
              .otherwise(col("prev_le") + (col("le") - col("prev_le"))
                * (col("rank") - col("prev_cum").cast("double"))
                / (col("_wc") - col("prev_cum")).cast("double")).as("value"): _*)
        (df, byCols, None)
      }
  }

  /** The p92 entry: the routed `query_range` anchored on the corpus's
    * last ALIGNED bucket edge (the panels' anchoring convention —
    * `end = (⌊T/step⌋)·step`), `instants × stepS` wide. Throws if the
    * router declines (the gate exists to prove the route, not to fall
    * back).
    */
  def queryRangeAligned(spark: SparkSession, dir: String, query: String,
      instants: Int, stepS: Long): DataFrame = {
    require(instants >= 1, "at least one grid instant")
    val t = Compiler.instantSeconds(spark, dir).toLong
    val endS = t / stepS * stepS
    val startS = endS - (instants - 1).toLong * stepS
    val ast = Ast.resolveAtEdges(Parser.parse(query), Some(startS), Some(endS))
    rangeEval(spark, dir, ast, startS, endS, stepS)
      .getOrElse(throw new PromQLCompileException(
        s"pyramid router declined query shape: $query"))
  }
}
