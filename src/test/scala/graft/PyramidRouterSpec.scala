package graft

import graft.operators.Downsample
import graft.promql.{Ast, Parser, Pyramid}
import org.apache.spark.sql.functions._

/** The alignment-rule router's laws:
  *
  *  1. the routed answer is BIT-IDENTICAL to the dense-grid path over
  *     raw events (same grid, same query);
  *  2. the router generalizes the hand-built p88 panel;
  *  3. law 1 holds for a sample landing EXACTLY on an aligned boundary
  *     epoch — rollup buckets are closed-right `(b·res, (b+1)·res]`,
  *     so pyramid windows ARE PromQL's `(t−W, t]`, no divergence;
  *  4. unservable shapes and unaligned grids decline (None), they
  *     never serve approximately.
  */
class PyramidRouterSpec extends SparkTestBase {
  import spark.implicits._

  private val H = 3600000L // ms/hour
  private val Res = 21600L // 6h, seconds

  // every sample +5 min into its hour: nothing lands on an aligned
  // boundary, so law 1's bit-equality must hold
  private lazy val dir: String = fixture("events" -> Seq(
    ev(1, 5 * 60000L, "purchase", 1.5, "a"),
    ev(2, H + 5 * 60000L, "purchase", 2.0, "a"),
    ev(3, 7 * H + 5 * 60000L, "purchase", 4.0, "a"),
    ev(4, 13 * H + 5 * 60000L, "purchase", 0.25, "b"),
    ev(5, 25 * H + 5 * 60000L, "purchase", 8.0, "b"),
    ev(6, 49 * H + 5 * 60000L, "purchase", 3.0, "a"),
    ev(7, 50 * H + 5 * 60000L, "click", 1.0, "a"), // sets the corpus instant
    // second counter family overlapping purchase windows — the
    // compositional (ratio) rows join the two
    ev(15, 2 * H + 5 * 60000L, "click", 2.0, "a"),
    ev(16, 14 * H + 5 * 60000L, "click", 0.5, "b"),
    // gauge series with an out-of-order overwrite inside one bucket
    ev(8, 2 * H + 5 * 60000L, "signup", 10.0, "a"),
    ev(9, 26 * H + 5 * 60000L, "signup", 7.5, "a"),
    ev(10, 26 * H + 4 * 60000L, "signup", 9.0, "b"),
    // histogram observations across two buckets + an overflow value
    ev(11, 3 * H + 5 * 60000L, "error", 0.5, "a"),
    ev(12, 3 * H + 6 * 60000L, "error", 7.0, "a"),
    ev(13, 27 * H + 5 * 60000L, "error", 30.0, "a"),
    ev(14, 27 * H + 6 * 60000L, "error", 999.0, "b")
  ).toDF(eventCols: _*))

  private def aligned(dirS: String, q: String, instants: Int)
      : (Long, Long, Ast) = {
    val t = graft.promql.Compiler.instantSeconds(spark, dirS).toLong
    val endS = t / Res * Res
    val startS = endS - (instants - 1).toLong * Res
    (startS, endS,
      Ast.resolveAtEdges(Parser.parse(q), Some(startS), Some(endS)))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy(df.columns.map(col): _*).collect().map(_.toSeq).toSeq

  test("routed query_range equals the dense-grid path off boundaries, matchers included") {
    for (q <- Seq(
        "sum by (k) (rate(purchase[1d]))",
        "sum by (k) (increase(purchase[1d]))",
        "increase(purchase[6h])",
        "sum(rate(purchase[12h]))",
        "sum by (k) (rate(purchase{k=\"a\"}[1d]))",
        // the other two value strategies: running totals and gauge LWW
        "sum by (k) (purchase)",
        "purchase",
        "signup",
        // the histogram arm: classic quantile over windowed ladders
        "histogram_quantile(0.9, sum by (k) (rate(error[1d])))",
        "histogram_quantile(0.5, sum by (k) (increase(error[6h])))",
        // the *_over_time arm: sample-window aggregations from rollup
        // vmin/vmax/sum_dec/cnt fields, gauge AND counter families
        "min_over_time(signup[1d])",
        "max_over_time(signup[1d])",
        "avg_over_time(signup[1d])",
        "sum_over_time(purchase[1d])",
        "count_over_time(purchase[6h])",
        "last_over_time(signup[1d])",
        "present_over_time(purchase[1d])",
        // COMPOSITION: binary arithmetic / thresholds over served
        // operands — each side routes to its own rollup level, then
        // one equi-join per (label, instant)
        "sum by (k) (rate(purchase[1d])) / sum by (k) (rate(click[1d]))",
        "sum by (k) (increase(purchase[1d])) - sum by (k) (increase(click[1d]))",
        "sum by (k) (rate(purchase[1d])) * 100",
        "sum by (k) (purchase) > 3",
        // the GENERIC vector-aggregation layer: every aggregation op
        // over any served inner, per (group, instant) — rates ride as
        // exact decimals under the deferred divisor, so min/max/topk
        // order identically and sums stay associative
        "max by (k) (rate(purchase[1d]))",
        "min by (k) (increase(purchase[1d]))",
        "avg by (k) (rate(purchase[1d]))",
        "count by (k) (rate(purchase[1d]))",
        "count(purchase)",
        "stddev by (k) (increase(purchase[1d]))",
        "stdvar(increase(purchase[1d]))",
        "quantile(0.5, rate(purchase[1d]))",
        "group by (k) (signup)",
        "topk(1, sum by (k) (rate(purchase[1d])))",
        "bottomk(1, sum by (k) (increase(purchase[1d])))",
        "limitk(2, rate(purchase[1d]))",
        "max without (instance) (signup)",
        // generic aggs over the *_over_time and LWW arms
        "count(max_over_time(signup[1d]))",
        "avg by (k) (sum_over_time(purchase[1d]))",
        "max(signup)",
        // and over a served COMPOSITION
        "max(sum by (k) (rate(purchase[1d])) / sum by (k) (rate(click[1d])))")) {
      val (s, e, ast) = aligned(dir, q, 6)
      val routed = Pyramid.rangeEval(spark, dir, ast, s, e, Res)
        .getOrElse(fail(s"router declined: $q"))
      val grid = graft.promql.Compiler.rangeGridEval(spark, dir, ast, s, e, Res)
        .getOrElse(fail(s"no dense-grid strategy: $q"))
      assert(routed.columns.toSeq === grid.columns.toSeq, q)
      assert(rows(routed) === rows(grid), q)
      assert(rows(routed).nonEmpty, q)
    }
  }

  test("histogram scalar derivations route from the base rollup (vs the union path)") {
    // no dense-grid arm exists for these shapes, so the reference
    // answer is the per-instant UNION path (Api.rangeRelation grid=off)
    for (q <- Seq(
        "histogram_sum(rate(error[1d]))",
        "histogram_count(increase(error[6h]))",
        "histogram_count(rate(error[1d]))",
        "histogram_avg(rate(error[1d]))",
        // …and the generic aggregation layer composes on top
        "sum by (k) (histogram_sum(rate(error[1d])))",
        "max(histogram_count(rate(error[1d])))")) {
      val (s, e, ast) = aligned(dir, q, 6)
      val routed = Pyramid.rangeEval(spark, dir, ast, s, e, Res)
        .getOrElse(fail(s"router declined: $q"))
      val union = graft.promql.Api.rangeRelation(spark, dir, ast, s, e, Res,
          grid = false, None).withColumnRenamed("_t", "t_s")
        .select(routed.columns.map(col): _*) // union appends _t last
      assert(rows(routed) === rows(union), q)
      assert(rows(routed).nonEmpty, q)
    }
  }

  test("the router generalizes the hand-built rollup panel (p88 shape)") {
    val sf = "/root/testdata/sf0.001"
    val panel = Downsample.rollupPanel(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    // rollupPanel's instants end at the current PARTIAL bucket's edge:
    // (bmax+1)·res, 40 wide
    val bmax = graft.operators.Metrics.metricEvents(spark, sf)
      .agg(max(unix_micros(col("ts")))).as[Long].head() / (Res * 1000000L)
    val endS = (bmax + 1) * Res
    val startS = endS - 39L * Res
    val ast = Parser.parse("sum by (k) (increase(purchase[1d]))")
    val routed = Pyramid.rangeEval(spark, sf, ast, startS, endS, Res)
      .getOrElse(fail("router declined the panel shape"))
      .as[(String, Long, Double)].collect().toSet
    assert(routed === panel)
    assert(panel.nonEmpty)
  }

  test("boundary-landing samples serve exactly: routed == grid ON the epoch") {
    // one sample exactly ON an aligned 6h epoch boundary — the case
    // that diverged before rollup buckets went closed-right
    val bdir = fixture("events" -> Seq(
      ev(1, 5 * 60000L, "purchase", 1.0, "a"),
      ev(2, 4 * Res * 1000L, "purchase", 10.0, "a"), // boundary epoch
      ev(3, 5 * Res * 1000L + 5 * 60000L, "purchase", 2.0, "a")
    ).toDF(eventCols: _*))
    val q = "sum by (k) (increase(purchase[6h]))"
    val (s, e, ast) = aligned(bdir, q, 6)
    def toMap(df: org.apache.spark.sql.DataFrame) = df
      .as[(String, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    val routed = toMap(Pyramid.rangeEval(spark, bdir, ast, s, e, Res).get)
    val grid = toMap(
      graft.promql.Compiler.rangeGridEval(spark, bdir, ast, s, e, Res).get)
    val bEpoch = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000L +
      4 * Res
    // PromQL window (t−W, t]: the boundary sample counts AT its epoch —
    // on BOTH paths, because a rollup bucket is (b·res, (b+1)·res]
    assert(grid(("a", bEpoch)) === 10.0, "grid: sample AT t is inside (t-W, t]")
    assert(routed(("a", bEpoch)) === 10.0,
      "pyramid: the boundary sample is inside the SAME window as PromQL")
    assert(routed === grid, "routed == grid everywhere, boundary included")
  }

  test("max_source_resolution caps the admissible rollup level") {
    val q = "sum by (k) (rate(purchase[1d]))"
    val (s, e, ast) = aligned(dir, q, 6)
    val full = rows(Pyramid.rangeEval(spark, dir, ast, s, e, Res).get)
    // a finer cap forces a finer level — rollup serving is lossless at
    // EVERY admissible level, so the answer is bit-identical
    for (cap <- Seq(21600L, 7200L, 3600L))
      assert(rows(Pyramid.rangeEval(spark, dir, ast, s, e, Res, cap).get)
        === full, s"cap=$cap")
    // a cap below the finest level declines: the raw paths serve
    assert(Pyramid.rangeEval(spark, dir, ast, s, e, Res, 1800L).isEmpty)
    assert(Pyramid.rangeEval(spark, dir, ast, s, e, Res, 0L).isEmpty)
  }

  test("unservable shapes and unaligned grids decline") {
    def declined(q: String, s: Long, e: Long, st: Long, d: String = dir) =
      assert(Pyramid.rangeEval(spark, d, Parser.parse(q), s, e, st).isEmpty, q)
    val (s, e, _) = aligned(dir, "rate(purchase[1d])", 6)
    declined("rate(signup[1d])", s, e, Res) // gauge family
    declined("rate(purchase[1d] offset 1h)", s, e, Res) // time shift
    declined("max by (k) (rate(signup[1d]))", s, e, Res) // unservable inner
    declined("topk(1.5, rate(purchase[1d]))", s, e, Res) // non-integer k
    declined("rate(purchase[90m])", s, e, Res) // window not bucket-aligned
    declined("rate(purchase[1d])", s + 1, e + 1, Res) // unaligned instants
    declined("rate(purchase[1d])", s, e, 1800L) // step finer than any level
    // name-carrying operands: default matching drops the metric name,
    // which the raw paths own — the composition arm declines
    declined("purchase / signup", s, e, Res)
    declined( // a half-servable composition declines as a whole
      "sum by (k) (rate(purchase[1d])) / sum by (k) (rate(purchase[90m]))",
      s, e, Res)
  }
}
