package graft

import graft.promql.{Api, PromQLCompileException}
import org.apache.spark.sql.functions.{col, lit}

/** The dense-grid `query_range` laws (r10 ask #1):
  *
  *  1. union ≡ grid — every grid-able shape renders the SAME matrix
  *     envelope through the per-instant union path and the one-plan
  *     series×grid path on a common instant set (bit-identical strings,
  *     so values, instants, series sets, and ordering all agree);
  *  2. the grid path lifts the union path's 64-instant wall — hundreds
  *     of instants evaluate for dashboard shapes, while non-grid shapes
  *     keep the explicit compose-time refusal;
  *  3. the relation-facing [[Api.queryRangeGrid]] anchors `end = ⌊T⌋`
  *     and emits one row per (series, instant-with-data) with
  *     step-spaced `t_s`.
  */
class QueryRangeSpec extends SparkTestBase {
  import spark.implicits._

  private val D = 86400000L // ms/day

  /** 10 days of counters (purchase, 2 labels), gauges (signup), and
    * histogram observations (error) — every grid strategy has data.
    */
  private lazy val dir: String = fixture("events" -> Seq(
    ev(0, 0, "purchase", 1.0, "a"),
    ev(1, 1 * D, "purchase", 2.0, "a"),
    ev(2, 1 * D + 3600000L, "purchase", 3.0, "b"),
    ev(3, 2 * D, "purchase", 4.0, "b"),
    ev(4, 3 * D + 7200000L, "purchase", 2.5, "a"),
    ev(5, 5 * D, "purchase", 1.5, "a"),
    ev(6, 6 * D + 1800000L, "purchase", 6.0, "b"),
    ev(7, 8 * D, "purchase", 2.0, "a"),
    ev(8, 0, "signup", 10.0, "a"),
    ev(9, 2 * D + 60000L, "signup", 12.5, "a"),
    ev(10, 4 * D, "signup", 11.0, "b"),
    ev(11, 7 * D + 60000L, "signup", 9.5, "a"),
    ev(16, 5 * D, "signup", 8.0, "b"),  // pairs with day-4 b for idelta

    ev(12, 1 * D, "error", 3.0, "a"),
    ev(13, 4 * D + 60000L, "error", 80.0, "a"),
    ev(14, 6 * D, "error", 12.0, "b"),
    ev(15, 9 * D, "purchase", 7.0, "b")
  ).toDF(eventCols: _*))

  private val T0 = 1704067200L // 2024-01-01 epoch seconds
  private val dayS = 86400L

  private def both(query: String, startS: Long, endS: Long, stepS: Long)
      : (String, String) =
    (Api.queryRangeJsonImpl(spark, dir, query, startS, endS, stepS, grid = false),
      Api.queryRangeJsonImpl(spark, dir, query, startS, endS, stepS, grid = true))

  test("union and grid paths render bit-identical matrices for every grid shape") {
    val gridShapes = Seq(
      "purchase",                          // bare counter snapshot
      "sum by (k) (purchase)",             // by-agg counter
      "signup",                            // bare gauge LWW
      "sum by (k) (signup)",               // by-agg gauge
      "rate(purchase[2d])",                // windowed rate, w = 2 steps
      "sum by (k) (rate(purchase[2d]))",   // the dashboard query
      "increase(purchase[1d])",            // w = 1 step
      "sum_over_time(error[2d])",          // decomposable over_time
      "max_over_time(purchase[3d])",
      "count_over_time(error[1d])",
      "sum(purchase)",                     // GLOBAL aggregations (no by)
      "sum(signup)",
      "sum(rate(purchase[2d]))",           // the dashboard headline
      "histogram_quantile(0.5, error)",    // classic hq: instant form
      "histogram_quantile(0.9, rate(error[2d]))",
      "histogram_quantile(0.9, sum by (k) (rate(error[2d])))", // p99 panel
      "histogram_quantile(0.9, sum(rate(error[2d])))",
      "count by (k) (purchase)",           // generic per-instant aggs
      "avg by (k) (signup)",
      "max by (k) (purchase)",
      "min(signup)",
      "sum without (instance) (purchase)",
      "topk(1, sum by (k) (purchase))",    // per-instant ranking
      "topk(2, sum by (k) (rate(purchase[2d])))",
      "bottomk(1, sum by (k) (purchase))",
      "sum by (k) (purchase) * 100",       // binary ops per instant
      "100 / sum by (k) (purchase)",
      "sum by (k) (rate(purchase[2d])) > 0.000001",
      "sum by (k) (purchase) > bool 5",
      "sum by (k) (rate(purchase[2d])) / sum by (k) (purchase)", // ratio panel
      "sum by (k) (purchase) + sum by (k) (signup)",
      "purchase > bool signup",            // bare-selector matching drops name
      "abs(sum by (k) (purchase) - 5)",    // scalar funcs per instant
      "clamp_max(sum by (k) (rate(purchase[2d])) * 100000, 3)",
      "round(sum by (k) (signup))",
      "sqrt(sum(purchase))",
      "ln(sum by (k) (purchase))",
      "quantile(0.5, purchase)",           // remaining agg family
      "stddev(purchase)",
      "stdvar by (k) (purchase)",
      "limitk(1, purchase)",
      "limit_ratio(0.5, purchase)",
      "limit_ratio(-0.5, purchase)",
      "sum by (k) (purchase) and sum by (k) (signup)", // set ops per instant
      "sum by (k) (purchase) unless sum by (k) (signup{k=\"a\"})",
      "sum by (k) (purchase{k=\"a\"}) or sum by (k) (purchase)",
      "sum by (k) (purchase offset 1d)",   // time shifts ride the anchor
      "rate(purchase[2d] offset 2d)",
      "sum by (k) (purchase @ 1704758400)", // @ pins: constant across the grid
      // many-to-one matching per instant (the enrichment panels)
      "sum by (k, instance) (purchase) * on(k) group_left sum by (k) (signup)",
      "sum by (k) (signup) * on(k) group_right sum by (k, instance) (purchase)",
      "sum by (k, instance) (purchase) > on(k) group_left sum by (k) (signup)",
      // scalar() operands per instant (the normalization panels)
      "sum by (k) (purchase) / scalar(sum(purchase))",
      "scalar(sum(signup)) * sum by (k) (purchase)",
      "sum by (k) (purchase) > bool scalar(sum(purchase))",
      "sum by (k) (signup) + time()",      // per-instant eval timestamp
      "absent(purchase{k=\"zzz\"})",       // the "no data" alert panel
      "absent_over_time(signup[1d])",      // absent on some instants only
      // label rewrites per instant (the relabeling panels)
      "label_replace(sum by (k) (purchase), \"grp\", \"$1x\", \"k\", \"(a)\")",
      "sum by (grp) (label_replace(sum by (k) (purchase), \"grp\", \"g$1\", \"k\", \"(.*)\"))",
      "label_join(sum by (k, instance) (purchase), \"combo\", \"-\", \"k\", \"instance\")",
      // element-preserving sorts: matrix order is label-fixed on both paths
      "sort(sum by (k) (purchase))",
      "sort_desc(sum by (k) (rate(purchase[2d])))",
      "sort_by_label(sum by (k) (purchase), \"k\")",
      "vector(42)",                        // label-free literal vector
      "count_values(\"val\", purchase)",   // value-histogram per instant
      // SUBQUERY inners on the grid: the inner evaluates once on its
      // lattice (recursive grid), the outer slides over lattice indexes
      "max_over_time((sum by (k) (purchase))[2d:1d])",   // counter sum-by inner
      "sum_over_time((sum by (k) (purchase))[3d:1d])",
      "avg_over_time((signup)[2d:1d])",                    // bare gauge inner
      "min_over_time((sum by (k) (signup))[2d:1d])",     // gauge sum-by inner
      "max_over_time((rate(purchase[2d]))[2d:1d])",        // rate inner (÷w defers)
      "avg_over_time((rate(purchase[2d]))[3d:1d])",
      "count_over_time((rate(purchase[2d]))[2d:1d])",      // count never scales
      "sum_over_time((sum_over_time(error[2d]))[2d:1d])",  // nested over_time inner
      "max_over_time((max_over_time(purchase[1d]))[2d:1d])",
      "max_over_time((avg_over_time((signup)[2d:1d]))[2d:1d])", // DOUBLY nested subquery
      // non-strategy inners: the union fallback materializes ÷w per
      // instant before collapsing — the grid must match that ordering
      "max_over_time((sum without (instance) (rate(purchase[2d])))[2d:1d])",
      "sum_over_time((sum by (k) (rate(purchase[2d])) / sum by (k) (purchase))[2d:1d])",
      "max_over_time((abs(sum by (k) (purchase) - 5))[2d:1d])",
      // variance-pair subquery INNERS: exact-cents (Σx, Σx², n) bucket
      // partials on the grid vs per-instant union recomputation
      "max_over_time((stddev_over_time(signup[2d]))[2d:1d])",
      "avg_over_time((stdvar_over_time(purchase[2d]))[2d:1d])",
      // the long tail of range functions: exploded event↦instant pairs
      // through the union path's own rangeWindowAgg recipes
      "delta(signup[2d])",                 // gauge last − first
      "last_over_time(signup[2d])",
      "last_over_time(purchase[3d])",
      "present_over_time(error[2d])",
      "quantile_over_time(0.5, purchase[2d])",
      "mad_over_time(signup[2d])",
      "stddev_over_time(purchase[2d])",
      "stdvar_over_time(purchase[3d])",
      "ts_of_max_over_time(signup[2d])",
      "ts_of_min_over_time(purchase[2d])",
      "ts_of_last_over_time(error[2d])",
      "irate(purchase[2d])",               // last-two-samples rate
      "idelta(signup[2d])",
      "changes(signup[2d])",               // window-internal lag pairs
      "resets(purchase[3d])",              // full-history wrapped sums
      "deriv(signup[3d])",                 // exact-integer least squares
      "predict_linear(signup[3d], 3600)",
      // and their compositions ride the generic layers
      "max by (k) (quantile_over_time(0.5, purchase[2d]))",
      "sum by (k) (delta(signup[2d]))",
      "topk(1, irate(purchase[2d]))",
      // timestamp(): running max-ts per instant (gauge-LWW shape)
      "timestamp(signup)",
      "timestamp(purchase)",
      "max by (k) (timestamp(purchase))",
      // Holt-Winters per instant: the fold over each window's sorted
      // values, keyed by instant over the exploded pairs
      "double_exponential_smoothing(signup[2d], 0.5, 0.3)",
      "double_exponential_smoothing(signup[3d], 0.9, 1.0)",
      // info() enrichment rides the grid (instant-independent join)
      "info(signup)",
      "info(purchase) * 2",
      "sum by (version) (info(signup))",
      // @ start()/@ end() pins resolve to the range query's own bounds
      "sum by (k) (purchase @ start())",
      "sum by (k) (purchase @ end())",
      "rate(purchase[2d] @ end())")
    // grid start..end: days 2..9 after T0, step 1d (8 instants)
    val (s, e) = (T0 + 2 * dayS, T0 + 9 * dayS)
    for (q <- gridShapes) {
      val (union, grid) = both(q, s, e, dayS)
      assert(union === grid, s"union ≠ grid for: $q")
      assert(grid.contains("\"values\":[["), s"empty matrix for: $q")
    }
    // the global shapes really took the grid path (not a silent union
    // fallback): they evaluate past the union path's 64-instant wall
    val wide = Api.queryRangeJson(spark, dir, "sum(rate(purchase[2d]))",
      T0 + 9 * dayS - 99 * 7200L, T0 + 9 * dayS, 7200L)
    assert(wide.contains("\"resultType\":\"matrix\""))
    // stddev subquery inners cleared their own 64-instant wall: 200
    // subquery instants evaluate as ONE bucket-partial grid pass
    val wideVar = graft.promql.Engine.eval(spark, dir,
      "max_over_time((stddev_over_time(signup[2d]))[200h:1h])")
    assert(wideVar.count() > 0)
  }

  test("native-histogram quantile: union == grid under the 3.x sample-kind dispatch") {
    val (s, e) = (T0 + 2 * dayS, T0 + 9 * dayS)
    for (q <- Seq(
        "histogram_quantile(0.9, error)",
        "histogram_quantile(0.9, rate(error[2d]))",
        "histogram_quantile(0.9, sum by (k) (rate(error[2d])))")) {
      val u = Api.queryRangeJsonImpl(spark, dir, q, s, e, dayS,
        grid = false, Set("error"))
      val g = Api.queryRangeJsonImpl(spark, dir, q, s, e, dayS,
        grid = true, Set("error"))
      assert(u === g, s"native union ≠ grid for: $q")
      assert(g.contains("\"values\":[["), s"empty native matrix for: $q")
      // the dispatch is real: the sparse-bucket answer differs from the
      // classic literal-boundary interpolation on the same grid
      val classic = Api.queryRangeJsonImpl(spark, dir, q, s, e, dayS, grid = true)
      assert(g !== classic, s"native ≡ classic for: $q — dispatch inert")
    }
  }

  test("time() is the per-instant evaluation timestamp, on both paths") {
    import com.fasterxml.jackson.databind.ObjectMapper
    // (sum * 0) + time(): the matrix's values ARE the grid instants —
    // the r11 fix; before it, time() returned the corpus instant T at
    // every step
    val q = "(sum(signup) * 0) + time()"
    for (grid <- Seq(true, false)) {
      val json = Api.queryRangeJsonImpl(spark, dir, q,
        T0 + 7 * dayS, T0 + 9 * dayS, dayS, grid)
      val vals = new ObjectMapper().readTree(json)
        .get("data").get("result").get(0).get("values")
      (0 until vals.size).foreach { i =>
        assert(vals.get(i).get(0).asDouble === vals.get(i).get(1).asText.toDouble,
          s"grid=$grid step $i: value is not the instant")
      }
      assert(vals.size === 3)
    }
    // and the shape evaluates past the union wall on the grid path
    val wide = Api.queryRangeJson(spark, dir, q,
      T0 + 9 * dayS - 99 * 7200L, T0 + 9 * dayS, 7200L)
    assert(wide.contains("\"resultType\":\"matrix\""))
  }

  test("@ start()/@ end() pin to the range query's own bounds") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val (s, e) = (T0 + 2 * dayS, T0 + 9 * dayS)
    val om = new ObjectMapper()
    for (grid <- Seq(true, false)) {
      def vals(q: String) = om.readTree(Api.queryRangeJsonImpl(
        spark, dir, q, s, e, dayS, grid))
        .get("data").get("result").get(0).get("values")
      val uv = vals("sum(purchase)")
      // @ end(): every instant carries the PLAIN query's value AT end
      val pv = vals("sum(purchase @ end())")
      val endVal = uv.get(uv.size - 1).get(1).asText
      assert(pv.size === uv.size)
      (0 until pv.size).foreach { i =>
        assert(pv.get(i).get(1).asText === endVal, s"grid=$grid step $i") }
      // @ start(): likewise pins to the first instant's value
      val sv = vals("sum(purchase @ start())")
      val startVal = uv.get(0).get(1).asText
      (0 until sv.size).foreach { i =>
        assert(sv.get(i).get(1).asText === startVal, s"grid=$grid step $i") }
      assert(startVal !== endVal) // the pin is real on this fixture
    }
  }

  test("grid lifts the 64-instant union wall; non-grid shapes keep it") {
    // 100 instants at 2h: union path would refuse, grid path evaluates
    val (s100, e100) = (T0 + 9 * dayS - 99 * 7200L, T0 + 9 * dayS)
    val json = Api.queryRangeJson(spark, dir, "sum by (k) (purchase)",
      s100, e100, 7200L)
    assert(json.contains("\"resultType\":\"matrix\""))
    // a non-grid shape on the same 100-instant grid fails loudly at
    // compose time (plan-union blowup is refused, not attempted)
    val ex = intercept[PromQLCompileException] {
      Api.queryRangeJson(spark, dir,
        "quantile_over_time(0.5, purchase[90m])",
        s100, e100, 7200L)
    }
    assert(ex.getMessage.contains("64"))
    // ... but the same shape still works on a small grid (union path)
    val small = Api.queryRangeJson(spark, dir,
      "quantile_over_time(0.5, purchase[90m])",
      T0 + 7 * dayS, T0 + 9 * dayS, dayS)
    assert(small.contains("\"resultType\":\"matrix\""))
    // subquery shapes GRID now — a 100-instant grid that used to be
    // refused evaluates through the recursive lattice (2h steps on a
    // 2h-step subquery lattice)
    val sqWide = Api.queryRangeJson(spark, dir,
      "max_over_time((sum by (k) (purchase))[4h:2h])", s100, e100, 7200L)
    assert(sqWide.contains("\"resultType\":\"matrix\""))
  }

  test("query_range shards past the 4096-instant grid gate; boundaries continuous") {
    import graft.promql.{Ast, Compiler, Parser}
    val stepS = 60L
    val endS = T0 + 8 * dayS
    val startS = endS - 4999 * stepS
    // running totals emit at EVERY instant once a series has data, so
    // the full 5000-instant width is visible
    val q = "sum by (k) (purchase)"
    val ast = Ast.resolveAtEdges(Parser.parse(q), Some(startS), Some(endS))
    val full = Api.rangeRelation(spark, dir, ast, startS, endS, stepS,
      grid = true, None)
    val ts = full.select("_t").distinct().as[Long].collect().sorted
    assert(ts.length === 5000, "the matrix spans past the one-plan gate")
    assert(ts.head === startS && ts.last === endS)
    // chunk-boundary continuity: a 64-instant window STRADDLING the
    // first shard edge equals its own direct one-chunk grid eval
    val bStart = startS + (4096 - 32) * stepS
    val bEnd = bStart + 63 * stepS
    val window = full.filter(col("_t").between(bStart, bEnd))
      .collect().map(_.toSeq).toSet
    val direct = Compiler.rangeGridEval(spark, dir, ast, bStart, bEnd, stepS)
      .get.withColumnRenamed("t_s", "_t").collect().map(_.toSeq).toSet
    assert(window === direct)
    assert(window.size === 64 * 2, "both k groups at all 64 instants")
    // WINDOW arms shard too — their lag baseline shrinks the viable
    // chunk width, exercising the compose-time halving retry
    val rAst = Ast.resolveAtEdges(
      Parser.parse("sum by (k) (rate(purchase[1d]))"),
      Some(startS), Some(endS))
    val rated = Api.rangeRelation(spark, dir, rAst, startS, endS, stepS,
      grid = true, None)
    val rTs = rated.select("_t").distinct().as[Long].collect().sorted
    assert(rTs.last === endS, "the last shard serves the day-8 window")
    assert(rTs.nonEmpty && rTs.head < startS + 4096 * stepS,
      "an earlier shard serves the day-5 windows")
    // past the shard bound: the same loud compose-time refusal style
    val err = intercept[PromQLCompileException](
      Api.rangeRelation(spark, dir, ast, endS - 70000 * stepS, endS, stepS,
        grid = true, None))
    assert(err.getMessage.contains("65536"))
  }

  test("subquery grid: outer step a strict multiple of the lattice step") {
    // outer step 2d over a 1d lattice (r = 2): every outer instant maps
    // to lattice index k + (i-1)·r — union ≡ grid pins the mapping
    for (q <- Seq(
        "max_over_time((sum by (k) (purchase))[2d:1d])",
        "sum_over_time((rate(purchase[2d]))[3d:1d])",
        "avg_over_time((signup)[2d:1d])")) {
      val (union, grid) = both(q, T0 + 3 * dayS, T0 + 9 * dayS, 2 * dayS)
      assert(union === grid, s"union ≠ grid (r=2) for: $q")
      assert(grid.contains("\"values\":[["), s"empty matrix (r=2) for: $q")
    }
    // an outer step OFF the lattice (not a multiple of s) keeps the
    // union path — grid=true and grid=false agree because the grid
    // declines the shape (here: 36h step over a 1d-step subquery)
    val (u, g2) = both("max_over_time((sum by (k) (purchase))[2d:1d])",
      T0 + 3 * dayS, T0 + 9 * dayS, 129600L)
    assert(u === g2)
  }

  test("queryRangeGrid relation: end anchored at ⌊T⌋, step-spaced t_s") {
    val df = Api.queryRangeGrid(spark, dir, "sum by (k) (purchase)", 8, dayS)
    assert(df.columns.toSeq === Seq("label_k", "t_s", "value"))
    val rows = df.orderBy("label_k", "t_s")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val tMax = rows.map(_._2).max
    assert(tMax === T0 + 9 * dayS) // last event day = corpus instant floor
    // t_s values sit on the step grid anchored at the end
    assert(rows.forall { case (_, t, _) => (tMax - t) % dayS === 0L })
    // series appear only once they have data: label a starts day 0,
    // label b starts day 1 — both present across the 8-instant window,
    // and the final snapshot equals the full cumulative sum
    val lastByK = rows.groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2)._3 }
    assert(lastByK === Map("a" -> 9.0, "b" -> 20.0))
    // a non-grid shape is refused with a pointer, not mis-evaluated
    intercept[PromQLCompileException] {
      Api.queryRangeGrid(spark, dir,
        "quantile_over_time(0.5, purchase[90m])", 8, dayS)
    }
  }

  test("alert-state ladder: dense grid == per-instant union, and lifts the wall") {
    import graft.promql.Rules
    import graft.promql.Rules.AlertRule
    val tS = T0 + 9 * dayS // the fixture's corpus instant floor (last event day)
    def normGrid(df: org.apache.spark.sql.DataFrame) = df
      .select("alertname", "alertstate", "t_s", "label_k", "value")
      .collect().map(_.toSeq).toSet
    def normUnion(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("t_s", (lit(tS) - col("offset_s")).cast("long"))
      .select("alertname", "alertstate", "t_s", "label_k", "value")
      .collect().map(_.toSeq).toSet

    // rule interval == grid step (m = 1): cum(purchase) by k crosses 5
    // mid-fixture, so the window holds a genuine pending→firing edge
    val rule = AlertRule("Hot", "sum by (k) (purchase) > 5",
      forS = 2 * dayS, intervalS = dayS)
    val grid = normGrid(Rules.alertStatesGrid(spark, dir, rule, 6, dayS))
    val union = normUnion(Rules.alertStates(spark, dir, rule,
      (0 to 5).map(_ * dayS)))
    assert(grid === union)
    assert(grid.map(_(1)).toSet === Set("firing", "pending"),
      "fixture should exercise both ladder states")

    // rule interval a coarser MULTIPLE of the grid step (m = 2): the
    // residue-class window must skip the in-between instants
    val half = dayS / 2
    val grid2 = normGrid(Rules.alertStatesGrid(spark, dir, rule, 5, half))
    val union2 = normUnion(Rules.alertStates(spark, dir, rule,
      (0 to 4).map(_ * half)))
    assert(grid2 === union2)

    // a label-free condition breaches on the null label (null-safe lattice)
    val scalarRule = AlertRule("Any", "sum(purchase) > 5",
      forS = dayS, intervalS = dayS)
    val grid3 = normGrid(Rules.alertStatesGrid(spark, dir, scalarRule, 3, dayS))
    val union3 = normUnion(Rules.alertStates(spark, dir, scalarRule,
      Seq(0L, dayS, 2 * dayS)))
    assert(grid3 === union3)
    assert(grid3.nonEmpty && grid3.forall(_(3) == null))

    // the union ladder walls at ~64 compiled snapshots; the grid ladder
    // evaluates 240 instants as one plan
    val wide = Rules.alertStatesGrid(spark, dir, rule, 240, 3600L)
      .select("alertstate").distinct().collect().map(_.getString(0)).toSet
    assert(wide.subsetOf(Set("firing", "pending")) && wide.nonEmpty)

    // a condition without a grid strategy refuses with a pointer
    val ex = intercept[PromQLCompileException] {
      Rules.alertStatesGrid(spark, dir,
        AlertRule("X", "quantile_over_time(0.5, purchase[90m]) > 1", 0, 0),
        4, dayS)
    }
    assert(ex.getMessage.contains("alertStates"))
    // off-lattice rule interval refuses at compose time
    intercept[PromQLCompileException] {
      Rules.alertStatesGrid(spark, dir,
        AlertRule("X", "sum by (k) (purchase) > 5", forS = 2 * dayS,
          intervalS = dayS), 4, 43201L)
    }
  }

  test("ALERTS selector serves query_range: union == grid, wall lifted, offset rewinds") {
    import graft.promql.{Compiler, Rules}
    import graft.promql.Rules.AlertRule
    val tS = T0 + 9 * dayS
    val rules = Seq(
      AlertRule("Hot", "sum by (k) (purchase) > 5",
        forS = 2 * dayS, intervalS = dayS),
      AlertRule("Low", "sum by (k) (purchase) < 3")) // for-less
    Compiler.withAlertRules(rules) {
      // 1. union ≡ grid on a common ≤64-instant lattice — filtered,
      //    unfiltered, and offset-rewound forms all agree bit-for-bit
      for (q <- Seq("""ALERTS{alertstate="firing"}""", "ALERTS",
          """ALERTS{alertname="Hot"}""", "ALERTS offset 1d")) {
        val u = Api.queryRangeJsonImpl(spark, dir, q,
          tS - 5 * dayS, tS, dayS, grid = false)
        val g = Api.queryRangeJsonImpl(spark, dir, q,
          tS - 5 * dayS, tS, dayS, grid = true)
        assert(u === g, s"union != grid for $q")
      }
      // the fixture exercises both states on the common lattice
      val both = Api.queryRangeJsonImpl(spark, dir, "ALERTS",
        tS - 5 * dayS, tS, dayS, grid = true)
      assert(both.contains("\"firing\"") && both.contains("\"pending\""))
      // offset REWINDS: the offset-d timeline over [s, e] equals the
      // plain timeline over [s−d, e−d] value-for-value (instants shift)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      def seriesVals(json: String): Map[String, Seq[String]] = {
        val res = om.readTree(json).path("data").path("result")
        (0 until res.size).map { i =>
          val e = res.get(i)
          e.path("metric").toString ->
            (0 until e.path("values").size).map(j =>
              e.path("values").get(j).get(1).asText).toSeq
        }.toMap
      }
      val rewound = seriesVals(Api.queryRangeJsonImpl(spark, dir,
        "ALERTS offset 1d", tS - 4 * dayS, tS, dayS, grid = true))
      val plain = seriesVals(Api.queryRangeJsonImpl(spark, dir,
        "ALERTS", tS - 5 * dayS, tS - dayS, dayS, grid = true))
      assert(rewound === plain)
      // 2. the selector LIFTS the 64-instant union wall: a 240-instant
      //    alert-timeline panel serves as one dense-grid plan per rule
      val wide = Api.queryRangeJsonImpl(spark, dir,
        """ALERTS{alertstate="firing"}""",
        tS - 239 * 3600L, tS, 3600L, grid = true)
      assert(wide.contains("\"firing\""))
      intercept[PromQLCompileException] {
        Api.queryRangeJsonImpl(spark, dir, """ALERTS{alertstate="firing"}""",
          tS - 239 * 3600L, tS, 3600L, grid = false)
      }
      // 3. a rule whose interval is off the step lattice falls the
      //    selector back to the union path (served ≤64, refused beyond)
      Compiler.withAlertRules(Seq(AlertRule("Odd",
          "sum by (k) (purchase) > 5", forS = 2 * dayS, intervalS = dayS))) {
        val offStep = 40000L // 86400 % 40000 != 0: no residue-class grid
        val u = Api.queryRangeJsonImpl(spark, dir, "ALERTS",
          tS - 4 * offStep, tS, offStep, grid = false)
        val g = Api.queryRangeJsonImpl(spark, dir, "ALERTS",
          tS - 4 * offStep, tS, offStep, grid = true)
        assert(u === g, "off-lattice rule: grid path must fall back to union")
      }
    }
    // without standing rules the selector refuses with the b43 pointer
    val ex = intercept[PromQLCompileException] {
      Api.queryRangeJsonImpl(spark, dir, "ALERTS",
        tS - 2 * dayS, tS, dayS, grid = true)
    }
    assert(ex.getMessage.contains("standing alert rules"))
  }

  test("alert ladders key on the FULL series label set, not label_k alone") {
    import graft.promql.Rules
    import graft.promql.Rules.AlertRule
    // two series SHARING label_k but on different instances: user 1 →
    // instance i1 breaches from day 0; user 2 → i2 only from day 2. A
    // ladder collapsed to label_k would alias them (several lattice
    // rows per (label_k, instant) → wrong pending/firing states).
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def evu(id: Long, d: Long, user: Long, v: Double) =
      (id, new java.sql.Timestamp(t0.getTime + d * 86400000L), user,
        "purchase", v, """{"k": "a"}""")
    val dir2 = fixture("events" -> Seq(
      evu(0, 0, 1, 10.0), evu(1, 1, 1, 1.0),
      evu(2, 2, 2, 10.0), evu(3, 3, 2, 1.0)
    ).toDF(eventCols: _*))
    val rule = AlertRule("PerSeries", "purchase > 5", forS = dayS,
      intervalS = dayS)
    val tS = T0 + 3 * dayS
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("label_instance"), r.getAs[Long]("t_s"))
    val grid = Rules.alertStatesGrid(spark, dir2, rule, 3, dayS)
    // the output carries the condition's full label set
    assert(grid.columns.toSeq ===
      Seq("alertname", "alertstate", "t_s", "name", "label_k",
        "label_instance", "value"))
    val byKey = grid.collect().map(r => key(r) -> r.getAs[String]("alertstate")).toMap
    // day 2: i1 (breaching since day 0) fires; i2's FIRST breach is
    // pending — the label_k-collapsed ladder reported both firing
    assert(byKey(("i1", tS - dayS)) === "firing")
    assert(byKey(("i2", tS - dayS)) === "pending")
    assert(byKey(("i2", tS)) === "firing")
    // the union-path ladder agrees row-for-row on the common instants
    val union = Rules.alertStates(spark, dir2, rule, Seq(0L, dayS, 2 * dayS))
      .withColumn("t_s", (lit(tS) - col("offset_s")).cast("long"))
      .select("alertname", "alertstate", "t_s", "name", "label_k",
        "label_instance", "value")
      .collect().map(_.toSeq).toSet
    assert(grid.select("alertname", "alertstate", "t_s", "name", "label_k",
      "label_instance", "value").collect().map(_.toSeq).toSet === union)
  }

  test("recorded series serve query_range at GRID scale via AST inlining") {
    import graft.promql.{Compiler, Rules}
    val rules = Seq(
      Rules.RecordingRule("k_total", "sum by (k) (purchase)"),
      Rules.RecordingRule("raw_p", "purchase")) // name-retaining
    Compiler.withRecordedRules(rules) {
      // 217 instants — far past the union path's 64-instant wall, so
      // this ONLY works if the recorded name rides the grid tier; the
      // answer must be byte-identical to querying the rule expression
      val s = T0
      val e = T0 + 216 * 3600L // = the corpus instant (day 9)
      val rec = Api.queryRangeJson(spark, dir, "k_total", s, e, 3600L)
      val exp = Api.queryRangeJson(spark, dir, "sum by (k) (purchase)",
        s, e, 3600L)
      assert(rec === exp)
      // composition on top of the inlined name grids too
      assert(Api.queryRangeJson(spark, dir, "topk(1, k_total)", s, e, 3600L)
        === Api.queryRangeJson(spark, dir,
          "topk(1, sum by (k) (purchase))", s, e, 3600L))
      // a name-RETAINING rule inlines through the internal record-name
      // wrapper (a relation-level column rewrite), so it serves the
      // full 217-instant grid too — byte-identical to the raw family's
      // panel with the name rewritten to the record's
      val big = Api.queryRangeJson(spark, dir, "raw_p", s, e, 3600L)
      val expP = Api.queryRangeJson(spark, dir, "purchase", s, e, 3600L)
      assert(big === expP.replace("\"purchase\"", "\"raw_p\""))
      assert(big.contains("\"raw_p\"") && !big.contains("\"purchase\""))
      // few-instant union-path panels agree (both paths rename)
      val few = Api.queryRangeJson(spark, dir, "raw_p",
        T0 + 7 * dayS, T0 + 8 * dayS, dayS)
      assert(few.contains("\"raw_p\""), s"record name lost: $few")
      // matchers force the post-hoc instant path as well — consistent
      // with the instant query's answer at matching instants
      val m = Api.queryRangeJson(spark, dir, """k_total{k="a"}""",
        T0 + 8 * dayS, T0 + 8 * dayS, dayS)
      assert(m.contains("\"values\""))
      assert(!m.contains("\"k\":\"b\""))
      // rate over a RECORDED series: the dense-grid endpoint-difference
      // arm is bit-identical to the per-instant sample-grid walk on a
      // union-sized panel...
      val rAst = graft.promql.Parser.parse("rate(k_total[2d])")
      val sG = T0 + 168 * 3600L
      def rows(grid: Boolean) =
        Api.rangeRelation(spark, dir, rAst, sG, e, 3600L, grid, None)
          .select("label_k", "_t", "value")
          .collect().map(_.toSeq).toSet
      assert(rows(grid = true) === rows(grid = false))
      assert(rows(grid = true).nonEmpty)
      // ...and serves the full 217-instant dashboard panel as ONE plan
      val bigRate = Api.queryRangeGrid(spark, dir, "rate(k_total[2d])",
        217, 3600L)
      assert(bigRate.count() > 0)
    }
    // *_over_time over a recorded series rides the grid on the rule's
    // OWN lattice (hourly here, so lattice == grid): union ≡ grid
    // bit-exact per function, and the 217-instant smoothing panel is
    // one plan
    Compiler.withRecordedRules(Seq(Rules.RecordingRule("k_total_h",
        "sum by (k) (purchase)", intervalS = 3600))) {
      val sG = T0 + 168 * 3600L
      val e = T0 + 216 * 3600L
      for (fn <- Seq("avg_over_time", "sum_over_time", "count_over_time",
          "max_over_time", "last_over_time", "delta")) {
        val ast = graft.promql.Parser.parse(s"$fn(k_total_h[2d])")
        def r2(grid: Boolean) =
          Api.rangeRelation(spark, dir, ast, sG, e, 3600L, grid, None)
            .select("label_k", "_t", "value").collect().map(_.toSeq).toSet
        assert(r2(grid = true) === r2(grid = false), fn)
        assert(r2(grid = true).nonEmpty, fn)
      }
      assert(Api.queryRangeGrid(spark, dir,
        "avg_over_time(k_total_h[2d])", 217, 3600L).count() > 0)
    }
    // GAUGE rules ride the grid too (LWW lattice reconstruction) —
    // including delta, the gauge range function
    Compiler.withRecordedRules(Seq(Rules.RecordingRule("s_sum_h",
        "sum by (k) (signup)", intervalS = 3600))) {
      val sG = T0 + 168 * 3600L
      val e = T0 + 216 * 3600L
      for (fn <- Seq("avg_over_time", "last_over_time", "delta",
          "min_over_time")) {
        val ast = graft.promql.Parser.parse(s"$fn(s_sum_h[2d])")
        def r3(grid: Boolean) =
          Api.rangeRelation(spark, dir, ast, sG, e, 3600L, grid, None)
            .select("label_k", "_t", "value").collect().map(_.toSeq).toSet
        assert(r3(grid = true) === r3(grid = false), fn)
        assert(r3(grid = true).nonEmpty, fn)
      }
      // ...and rate over a GAUGE rule must NOT take the grid's
      // endpoint difference (non-monotone samples need the union
      // path's reset-aware walk): few-instant panels still serve
      val rAst = graft.promql.Parser.parse("rate(s_sum_h[2d])")
      assert(Api.rangeRelation(spark, dir, rAst, e - 4 * 3600L, e,
        3600L, grid = true, None).collect().nonEmpty)
    }
    // a bare (name-retaining) gauge rule: the grid renames like the
    // instant path
    Compiler.withRecordedRules(Seq(Rules.RecordingRule("s_bare_h",
        "signup", intervalS = 3600))) {
      val sG = T0 + 168 * 3600L
      val e = T0 + 216 * 3600L
      val ast = graft.promql.Parser.parse("delta(s_bare_h[2d])")
      def r4(grid: Boolean) =
        Api.rangeRelation(spark, dir, ast, sG, e, 3600L, grid, None)
          .select("name", "label_k", "label_instance", "_t", "value")
          .collect().map(_.toSeq).toSet
      assert(r4(grid = true) === r4(grid = false))
      assert(r4(grid = true).forall(_.head === "s_bare_h"))
    }
  }

  test("recorded deriv/predict_linear/irate/idelta serve query_range at GRID scale") {
    import graft.promql.{Compiler, Rules}
    // the capacity-panel tail on the dense grid: the shift-algebra
    // least-squares arm must be bit-identical to the per-instant walk —
    // partial windows at a series' birth included — for counter AND
    // gauge rules, and serve a 217-instant panel as ONE plan (the union
    // path walls at 64)
    val sG = T0 + 168 * 3600L
    val e = T0 + 216 * 3600L
    Compiler.withRecordedRules(Seq(
      Rules.RecordingRule("k_total_h", "sum by (k) (purchase)",
        intervalS = 3600),
      Rules.RecordingRule("s_sum_h", "sum by (k) (signup)",
        intervalS = 3600))) {
      for (q <- Seq("deriv(k_total_h[2d])",
          "predict_linear(k_total_h[2d], 3600)",
          "irate(k_total_h[1d])", "idelta(k_total_h[2d])",
          "deriv(s_sum_h[2d])", "irate(s_sum_h[1d])",
          "changes(k_total_h[2d])", "changes(s_sum_h[1d])",
          "resets(s_sum_h[2d])")) {
        val ast = graft.promql.Parser.parse(q)
        def rows(grid: Boolean) =
          Api.rangeRelation(spark, dir, ast, sG, e, 3600L, grid, None)
            .select("label_k", "_t", "value").collect().map(_.toSeq).toSet
        assert(rows(grid = true) === rows(grid = false), q)
        assert(rows(grid = true).nonEmpty, q)
      }
      // the full 217-instant dashboard panels are single plans
      assert(Api.queryRangeGrid(spark, dir, "deriv(k_total_h[2d])",
        217, 3600L).count() > 0)
      assert(Api.queryRangeGrid(spark, dir, "irate(k_total_h[2d])",
        217, 3600L).count() > 0)
      // a one-sample window can never fit a line or make a pair: the
      // grid arm renders the same EMPTY result as the per-instant path
      assert(Api.rangeRelation(spark, dir,
        graft.promql.Parser.parse("irate(k_total_h[1h])"),
        sG, e, 3600L, grid = true, None).count() === 0L)
      // derived-value rules: the grid DECLINES the shape (no silent
      // cents coarsening) and the union path refuses with the teaching
      // message — the cents-exact bound holds on both tiers
      Compiler.withRecordedRules(Seq(Rules.RecordingRule("k_half_h",
          "sum by (k) (purchase) / 2", intervalS = 3600))) {
        val ast = graft.promql.Parser.parse("deriv(k_half_h[2d])")
        val err = intercept[graft.promql.PromQLCompileException](
          Api.rangeRelation(spark, dir, ast, e - 3 * 3600L, e, 3600L,
            grid = false, None).collect())
        assert(err.getMessage.contains("sum-by rule shape"))
        val errG = intercept[Exception](
          Api.rangeRelation(spark, dir, ast, e - 3 * 3600L, e, 3600L,
            grid = true, None).collect())
        assert(errG.getMessage.contains("sum-by rule shape") ||
          errG.getMessage.contains("no dense-grid strategy"))
      }
    }
  }

  test("recorded quantile/stddev/mad/ts_of_* serve query_range at GRID scale") {
    import graft.promql.{Compiler, Rules}
    // the exotic over-time tail on the dense grid: frame-array rank
    // walks (quantile/mad), frame moments (stddev/stdvar), and
    // timestamp recovery with latest-wins ties (ts_of_*) must be
    // bit-identical to the per-instant rangeWindowAgg walks — partial
    // windows at a series' birth included — for counter AND gauge
    // rules, and serve a 217-instant panel as ONE plan
    val sG = T0 + 168 * 3600L
    val e = T0 + 216 * 3600L
    Compiler.withRecordedRules(Seq(
      Rules.RecordingRule("k_total_h", "sum by (k) (purchase)",
        intervalS = 3600),
      Rules.RecordingRule("s_sum_h", "sum by (k) (signup)",
        intervalS = 3600))) {
      for (q <- Seq(
          "quantile_over_time(0.25, k_total_h[2d])",
          "quantile_over_time(0.9, s_sum_h[1d])",
          "stddev_over_time(k_total_h[2d])",
          "stdvar_over_time(s_sum_h[2d])",
          "mad_over_time(k_total_h[2d])",
          "ts_of_max_over_time(k_total_h[2d])",
          "ts_of_min_over_time(s_sum_h[1d])",
          "ts_of_last_over_time(k_total_h[2d])")) {
        val ast = graft.promql.Parser.parse(q)
        def rows(grid: Boolean) =
          Api.rangeRelation(spark, dir, ast, sG, e, 3600L, grid, None)
            .select("label_k", "_t", "value").collect().map(_.toSeq).toSet
        assert(rows(grid = true) === rows(grid = false), q)
        assert(rows(grid = true).nonEmpty, q)
      }
      // the full 217-instant dashboard panels are single plans (past
      // the union path's 64-instant wall)
      assert(Api.queryRangeGrid(spark, dir,
        "quantile_over_time(0.5, k_total_h[2d])", 217, 3600L).count() > 0)
      assert(Api.queryRangeGrid(spark, dir,
        "ts_of_max_over_time(k_total_h[2d])", 217, 3600L).count() > 0)
      // ts_of_* only compare the rule's own values → a derived-value
      // rule serves on the union path; the grid declines the shape
      // (non-fast rule) rather than coarsening
      Compiler.withRecordedRules(Seq(Rules.RecordingRule("k_half_h",
          "sum by (k) (purchase) / 2", intervalS = 3600))) {
        val ast = graft.promql.Parser.parse("ts_of_max_over_time(k_half_h[2d])")
        def rows(grid: Boolean) =
          Api.rangeRelation(spark, dir, ast, e - 3 * 3600L, e, 3600L,
            grid, None)
            .select("label_k", "_t", "value").collect().map(_.toSeq).toSet
        assert(rows(grid = true) === rows(grid = false))
        assert(rows(grid = false).nonEmpty)
      }
    }
  }
}
