package graft

import graft.promql.{Engine, Parser, PromQLCompileException, PromQLParseException}
import graft.promql.{Agg, BinOp, Func, Matcher, NumLit, Selector}

/** The PromQL string front-end: parse shapes, evaluation semantics vs
  * hand-built operators, and the compose-time (A7) type checks.
  */
class PromQLFrontendSpec extends SparkTestBase {
  import spark.implicits._

  test("parser builds the expected AST for a nested aggregation") {
    val ast = Parser.parse("""sum by (k) (rate(purchase{k=~"1.*"}[5m]))""")
    assert(ast === Agg("sum", Some("by" -> Seq("k")), None,
      Func("rate", None,
        Selector("purchase", Seq(Matcher("k", "=~", "1.*")), Some(300L), None))))
  }

  test("parser handles offsets, trailing by-clause, and binary ops with on") {
    assert(Parser.parse("sum(click offset 1d) by (k)") ===
      Agg("sum", Some("by" -> Seq("k")), None,
        Selector("click", Nil, None, Some(86400L))))
    assert(Parser.parse("purchase / on(k) click > 2") ===
      BinOp(">", None,
        BinOp("/", Some(Seq("k")), Selector("purchase"), Selector("click")),
        NumLit(2.0)))
  }

  test("parser totalizes: fuzzed input only ever raises PromQLParseException") {
    val pool = "sumratebyk(){}[]\"=~!<>+-*/%^@:,.0159dhw _abc".toCharArray
    val rnd = new scala.util.Random(1234)
    var parsed = 0
    for (_ <- 1 to 3000) {
      val s = Array.fill(rnd.nextInt(40) + 1)(pool(rnd.nextInt(pool.length))).mkString
      try { Parser.parse(s); parsed += 1 }
      catch {
        case _: PromQLParseException => () // the only acceptable failure
      }
    }
    assert(parsed >= 0) // reached without MatchError/NumberFormat/StackOverflow
  }

  test("query API renders the Prometheus instant-vector JSON envelope") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.5, "a"),
      ev(1, 1000, "purchase", 2.0, "a"),
      ev(2, 0, "purchase", 7.0, "b")
    ).toDF(eventCols: _*))
    val json = graft.promql.Api.queryJson(spark, dir, "sum by (k) (purchase)")
    val root = new ObjectMapper().readTree(json)
    assert(root.get("status").asText === "success")
    assert(root.get("data").get("resultType").asText === "vector")
    val result = root.get("data").get("result")
    assert(result.size === 2)
    val byK = (0 until result.size).map { i =>
      val e = result.get(i)
      e.get("metric").get("k").asText -> e.get("value").get(1).asText.toDouble
    }.toMap
    assert(byK === Map("a" -> 3.5, "b" -> 7.0))
    // the timestamp slot carries the evaluation instant (epoch seconds)
    val ts = result.get(0).get("value").get(0).asDouble
    assert(ts === 1704067201.0) // t0 + 1s (the latest event)
    // full-series vectors expose __name__ like Prometheus
    val j2 = graft.promql.Api.queryJson(spark, dir, "purchase")
    val r2 = new ObjectMapper().readTree(j2).get("data").get("result")
    assert(r2.get(0).get("metric").has("__name__"))
  }

  test("query_range API renders the matrix envelope over a step grid") {
    import com.fasterxml.jackson.databind.ObjectMapper
    // t0 = 1704067200; events at t0, t0+1h, t0+2h
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),
      ev(1, h, "purchase", 2.0, "a"),
      ev(2, 2 * h, "purchase", 4.0, "a")
    ).toDF(eventCols: _*))
    val json = graft.promql.Api.queryRangeJson(spark, dir,
      "sum by (k) (purchase)", 1704067200L, 1704074400L, 3600L)
    val root = new ObjectMapper().readTree(json)
    assert(root.get("data").get("resultType").asText === "matrix")
    val result = root.get("data").get("result")
    assert(result.size === 1)
    val vals = result.get(0).get("values")
    val series = (0 until vals.size).map { i =>
      vals.get(i).get(0).asLong -> vals.get(i).get(1).asText.toDouble
    }
    // cumulative counter snapshots at each grid instant, time-sorted
    assert(series === Seq(
      1704067200L -> 1.0, 1704070800L -> 3.0, 1704074400L -> 7.0))
  }

  test("series/labels/label-values metadata APIs") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),
      ev(1, 0, "purchase", 2.0, "b"),
      ev(2, 0, "click", 3.0, "a")
    ).toDF(eventCols: _*))
    val om = new ObjectMapper()
    val series = om.readTree(graft.promql.Api.seriesJson(spark, dir, Seq("purchase")))
      .get("data")
    assert(series.size === 2)
    assert((0 until series.size).forall(i =>
      series.get(i).get("__name__").asText === "purchase"))
    val labels = om.readTree(graft.promql.Api.labelsJson(spark, dir)).get("data")
    assert((0 until labels.size).map(labels.get(_).asText).toSet ===
      Set("__name__", "instance", "k"))
    val kvals = om.readTree(
      graft.promql.Api.labelValuesJson(spark, dir, "k")).get("data")
    assert((0 until kvals.size).map(kvals.get(_).asText).toSet === Set("a", "b"))
    intercept[PromQLCompileException](
      graft.promql.Api.labelValuesJson(spark, dir, "nope"))
  }

  test("parse errors carry position context") {
    intercept[PromQLParseException](Parser.parse("sum by (k) (purchase"))
    intercept[PromQLParseException](Parser.parse("purchase{k=1}"))
    intercept[PromQLParseException](Parser.parse("purchase[5]"))
    intercept[PromQLParseException](Parser.parse("rate(purchase[5m]) trailing"))
  }

  test("counter selector evaluates to the accumulated snapshot") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.5, "a"),
      ev(1, 1000, "purchase", 2.0, "a"),
      ev(2, 0, "purchase", 7.0, "b"),
      ev(3, 0, "click", 9.0, "a") // other family, excluded
    ).toDF(eventCols: _*))
    val rows = Engine.eval(spark, dir, "purchase")
      .select($"label_k", $"value").as[(String, Double)].collect().toSet
    assert(rows === Set(("a", 3.5), ("b", 7.0)))
  }

  test("matchers, scalar arithmetic, and comparison filters compose") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a1"),
      ev(1, 0, "purchase", 20.0, "a2"),
      ev(2, 0, "purchase", 30.0, "b1")
    ).toDF(eventCols: _*))
    val rows = Engine.eval(spark, dir, """purchase{k=~"a."} * 2 > 25""")
      .select($"label_k", $"value").as[(String, Double)].collect().toSet
    assert(rows === Set(("a2", 40.0))) // a1: 20 fails filter; b1: no match
  }

  test("rate and increase use exactly the trailing window; offset shifts it") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),      // T-2h: outside [T-1h, T]
      ev(1, 1 * h, "purchase", 2.0, "a"),  // T-1h: boundary — excluded (open lower)
      ev(2, 2 * h, "purchase", 4.0, "a")   // T: included
    ).toDF(eventCols: _*))
    val inc = Engine.eval(spark, dir, "increase(purchase[1h])")
      .select($"value").as[Double].collect()
    assert(inc.toSeq === Seq(4.0))
    val r = Engine.eval(spark, dir, "rate(purchase[2h])")
      .select($"value").as[Double].collect()
    assert(r.toSeq === Seq((2.0 + 4.0) / 7200.0))
    val off = Engine.eval(spark, dir, "increase(purchase[1h] offset 1h)")
      .select($"value").as[Double].collect()
    assert(off.toSeq === Seq(2.0)) // window (T-2h, T-1h]
  }

  test("resets counts wrapped-cumulative decreases on in-window pairs only") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 60.0, "a"),
      ev(1, 1 * h, "purchase", 60.0, "a"), // cum 120.00 wraps past 100.00
      ev(2, 2 * h, "purchase", 30.0, "a")  // cum 150.00 — no wrap step
    ).toDF(eventCols: _*))
    val all = Engine.eval(spark, dir, "resets(purchase[3h])")
      .select($"value").as[Double].collect()
    assert(all.toSeq === Seq(1.0)) // the 0h→1h pair wrapped
    // with a [2h] window the wrapping pair's FIRST sample sits on the
    // open lower bound — excluded, so no in-window pair resets
    val tight = Engine.eval(spark, dir, "resets(purchase[2h])")
      .select($"value").as[Double].collect()
    assert(tight.toSeq === Seq(0.0))
  }

  test("resets under a subquery maxes the per-instant windowed values") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 60.0, "a"),
      ev(1, 1 * h, "purchase", 60.0, "a"), // wrap between 0h and 1h
      ev(2, 2 * h, "purchase", 30.0, "a"),
      ev(3, 3 * h, "purchase", 25.0, "a")
    ).toDF(eventCols: _*))
    def one(q: String): Double =
      Engine.eval(spark, dir, q).select($"value").as[Double].head()
    val sub = one("max_over_time((resets(purchase[3h]))[2h:1h])")
    val atT = one("resets(purchase[3h])")
    val shifted = one("resets(purchase[3h] offset 1h)")
    assert(sub === math.max(atT, shifted))
    assert(shifted === 1.0 && atT === 0.0) // the wrap pair ages out at T
  }

  test("day_of_year and the inverse hyperbolic functions evaluate exactly") {
    val day = 86400000L
    val dir = fixture("events" -> Seq(
      ev(0, 40 * day, "signup", 2.0, "a"),
      ev(1, 40 * day, "signup", 0.5, "b")
    ).toDF(eventCols: _*))
    val doy = Engine.eval(spark, dir, "day_of_year(timestamp(signup))")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(doy === Map("a" -> 41.0, "b" -> 41.0)) // 1970-02-10
    val acosh = Engine.eval(spark, dir, "acosh(signup)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(math.abs(acosh("a") - math.log(2.0 + math.sqrt(3.0))) < 1e-12)
    assert(acosh("b").isNaN) // below the x >= 1 domain
    val asinh = Engine.eval(spark, dir, "asinh(signup - 1)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(math.abs(asinh("a") - math.log(1.0 + math.sqrt(2.0))) < 1e-12)
    assert(asinh("b") === math.log(-0.5 + math.sqrt(1.25))) // same IEEE order
    val atanh = Engine.eval(spark, dir, "atanh(signup - 1.5)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(math.abs(atanh("a") - 0.5 * math.log(3.0)) < 1e-12) // x = 0.5
    assert(atanh("b") === Double.NegativeInfinity)             // x = -1
  }

  test("sum by / avg / topk match hand-computed values") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),
      ev(1, 0, "purchase", 3.0, "a"),
      ev(2, 0, "purchase", 10.0, "b"),
      ev(3, 0, "purchase", 2.0, "c")
    ).toDF(eventCols: _*))
    val sums = Engine.eval(spark, dir, "sum by (k) (purchase)")
      .select($"label_k", $"value").as[(String, Double)].collect().toSet
    assert(sums === Set(("a", 4.0), ("b", 10.0), ("c", 2.0)))
    val avg = Engine.eval(spark, dir, "avg(purchase)")
      .select($"value").as[Double].collect()
    assert(avg.toSeq === Seq((4.0 + 10.0 + 2.0) / 3))
    val top = Engine.eval(spark, dir, "topk(2, sum by (k) (purchase))")
      .select($"label_k").as[String].collect().toSet
    assert(top === Set("b", "a"))
  }

  test("vector binary op joins on the shared label and drops the name") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 0, "click", 4.0, "a"),
      ev(2, 0, "purchase", 9.0, "lonely") // no click side → dropped
    ).toDF(eventCols: _*))
    val rows = Engine.eval(spark, dir, "purchase / on(k) click")
      .as[(String, Double)].collect().toSet
    assert(rows === Set(("a", 2.5)))
  }

  test("histogram_quantile through the front-end matches the operator") {
    val dir = fixture("events" -> (1 to 10).map(i =>
      ev(i.toLong, 0, "error", i / 10.0, "u")).toDF(eventCols: _*))
    val q = Engine.eval(spark, dir, "histogram_quantile(0.9, error)")
      .select($"value").as[Double].collect()
    assert(q.toSeq === Seq(0.9)) // same fixture as the PromQLSpec hand-check
  }

  test("gauge selector is last-write-wins; delta spans the window") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 5.0, "a"),
      ev(1, 1000, "signup", 9.0, "a")
    ).toDF(eventCols: _*))
    assert(Engine.eval(spark, dir, "signup").select($"value")
      .as[Double].collect().toSeq === Seq(9.0))
    assert(Engine.eval(spark, dir, "delta(signup[1h])").select($"value")
      .as[Double].collect().toSeq === Seq(4.0))
  }

  test("vector set ops: and/unless/or with left priority") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 0, "purchase", 20.0, "b"),
      ev(2, 0, "click", 1.0, "a"),
      ev(3, 0, "click", 5.0, "c")
    ).toDF(eventCols: _*))
    def run(q: String) = Engine.eval(spark, dir, q)
      .select($"label_k", $"value").as[(String, Double)].collect().toSet
    assert(run("purchase and click") === Set(("a", 10.0)))
    assert(run("purchase unless click") === Set(("b", 20.0)))
    assert(run("sum by (k) (purchase) or sum by (k) (click)") ===
      Set(("a", 10.0), ("b", 20.0), ("c", 5.0))) // left wins on "a"
  }

  test("over_time family aggregates raw samples in the trailing window") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 2.0, "a"),      // outside [T-1h, T]
      ev(1, 1 * h + 1, "signup", 4.0, "a"),
      ev(2, 2 * h, "signup", 10.0, "a")
    ).toDF(eventCols: _*))
    def one(q: String) = Engine.eval(spark, dir, q)
      .select($"value").as[Double].collect().toSeq
    assert(one("max_over_time(signup[1h])") === Seq(10.0))
    assert(one("min_over_time(signup[1h])") === Seq(4.0))
    assert(one("sum_over_time(signup[1h])") === Seq(14.0))
    assert(one("avg_over_time(signup[1h])") === Seq(7.0))
    assert(one("count_over_time(signup[1h])") === Seq(2.0))
  }

  test("@ modifier pins the evaluation instant absolutely") {
    // t0 = 2024-01-01 00:00:00 UTC = 1704067200 epoch seconds
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),
      ev(1, 3600000, "purchase", 2.0, "a") // t0 + 1h
    ).toDF(eventCols: _*))
    assert(Engine.eval(spark, dir, "purchase @ 1704067200")
      .select($"value").as[Double].collect().toSeq === Seq(1.0))
    assert(Engine.eval(spark, dir, "purchase @ 1704070800")
      .select($"value").as[Double].collect().toSeq === Seq(3.0))
    // @ composes with a range function window
    assert(Engine.eval(spark, dir, "increase(purchase[30m] @ 1704070800)")
      .select($"value").as[Double].collect().toSeq === Seq(2.0))
  }

  test("grouped topk/quantile rank and aggregate within each label group") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 0, "purchase", 20.0, "b"),
      ev(2, 0, "purchase", 30.0, "c")
    ).toDF(eventCols: _*))
    // each label is its own group → per-group top-1 keeps every series
    val top = Engine.eval(spark, dir, "topk by (k) (1, purchase)")
      .select($"label_k", $"value").as[(String, Double)].collect().toSet
    assert(top === Set(("a", 10.0), ("b", 20.0), ("c", 30.0)))
    // ungrouped topk stays a global limit
    val g = Engine.eval(spark, dir, "topk(1, purchase)")
      .select($"label_k").as[String].collect().toSeq
    assert(g === Seq("c"))
    val q = Engine.eval(spark, dir, "quantile by (k) (0.5, purchase)")
      .select($"label_k", $"value").as[(String, Double)].collect().toSet
    assert(q === Set(("a", 10.0), ("b", 20.0), ("c", 30.0)))
  }

  test("subquery evaluates the inner expression at step-spaced instants") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),     // T-2h
      ev(1, 1 * h, "purchase", 2.0, "a"), // T-1h
      ev(2, 2 * h, "purchase", 4.0, "a")  // T
    ).toDF(eventCols: _*))
    // snapshots: at T-1h → 3.0, at T → 7.0
    def one(q: String) = Engine.eval(spark, dir, q)
      .select($"value").as[Double].collect().toSeq
    assert(one("max_over_time((sum by (k) (purchase))[2h:1h])") === Seq(7.0))
    assert(one("min_over_time((sum by (k) (purchase))[2h:1h])") === Seq(3.0))
    assert(one("avg_over_time((sum by (k) (purchase))[2h:1h])") === Seq(5.0))
    assert(one("sum_over_time((sum by (k) (purchase))[2h:1h])") === Seq(10.0))
    assert(one("count_over_time((sum by (k) (purchase))[2h:1h])") === Seq(2.0))
  }

  test("subquery compose-time bounds: step/range validation and placement") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, "max_over_time((purchase)[5h:2h])")) // not a multiple
    intercept[PromQLCompileException](       // union strategy (arith inner): > 64 instants
      Engine.eval(spark, dir, "max_over_time((sum by (k) (purchase) * 2)[100d:1h])"))
    intercept[PromQLCompileException](       // grid strategy: > 4096 instants
      Engine.eval(spark, dir, "max_over_time((purchase)[100d:20m])"))
    intercept[graft.promql.PromQLParseException](
      Engine.eval(spark, dir, "(purchase)[2h:1h]")) // subquery outside over_time
  }

  test("bare subquery suffixes parse like their parenthesized forms (upstream grammar)") {
    // selector suffix, function-call suffix, aggregation suffix
    assert(Parser.parse("avg_over_time(signup[2d:1d])") ===
      Parser.parse("avg_over_time((signup)[2d:1d])"))
    assert(Parser.parse("""max_over_time(purchase{k="a"}[2d:1d])""") ===
      Parser.parse("""max_over_time((purchase{k="a"})[2d:1d])"""))
    assert(Parser.parse("max_over_time(rate(purchase[5m])[1h:5m])") ===
      Parser.parse("max_over_time((rate(purchase[5m]))[1h:5m])"))
    assert(Parser.parse("sum_over_time(sum by (k) (purchase)[2d:1d])") ===
      Parser.parse("sum_over_time((sum by (k) (purchase))[2d:1d])"))
    // nested bare forms compose
    assert(Parser.parse("max_over_time(avg_over_time(signup[2d:1d])[2d:1d])") ===
      Parser.parse("max_over_time((avg_over_time((signup)[2d:1d]))[2d:1d])"))
    // a trailing offset on a bare subquery attaches to the inner
    // selector — equivalent for a pure selector inner
    assert(Parser.parse("avg_over_time(signup[2d:1d] offset 1d)") ===
      Parser.parse("avg_over_time((signup offset 1d)[2d:1d])"))
    // @ after a subquery range is refused with a pointer
    val ex = intercept[graft.promql.PromQLParseException](
      Parser.parse("avg_over_time(signup[2d:1d] @ 1704067200)"))
    assert(ex.getMessage.contains("pin the inner selector"))
    // a subquery range cannot follow a range selector
    intercept[graft.promql.PromQLParseException](
      Parser.parse("max_over_time(rate(purchase[5m])[1h])"))
  }

  test("nested over_time subquery grid matches independent per-instant evaluation") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, h, "signup", 5.0, "a"), ev(1, 2 * h, "signup", 9.0, "a"),
      ev(2, 4 * h, "signup", 3.0, "a"), ev(3, 5 * h, "signup", 7.0, "a"),
      ev(4, 2 * h, "signup", 10.0, "b"), ev(5, 5 * h, "signup", 4.0, "b"),
      ev(6, 3 * h, "purchase", 2.0, "a")).toDF(eventCols: _*))
    for (inner <- Seq("avg_over_time", "min_over_time", "max_over_time",
        "sum_over_time", "count_over_time");
        outer <- Seq("max_over_time", "min_over_time")) {
      val grid = Engine.eval(spark, dir, s"$outer(($inner(signup[2h]))[4h:1h])")
        .select($"label_k", $"value").as[(String, Double)].collect().toMap
      // independent reference: the inner evaluated per offset instant
      // (T−3h..T, the same instants the grid covers), folded by hand;
      // instants with an empty window are absent on both paths
      val perInstant = (0 to 3).map { j =>
        val off = if (j == 0) "" else s" offset ${j}h"
        Engine.eval(spark, dir, s"$inner(signup[2h]$off)")
          .select($"label_k", $"value").as[(String, Double)].collect().toMap
      }
      val keys = perInstant.flatMap(_.keys).toSet
      val expect = keys.map { k =>
        val vs = perInstant.flatMap(_.get(k))
        k -> (if (outer == "max_over_time") vs.max else vs.min)
      }.toMap
      assert(grid === expect, s"$outer over $inner")
    }
    // stddev inner stays on the union path (not bucket-decomposable)
    val viaUnion = Engine.eval(spark, dir,
      "max_over_time((stddev_over_time(signup[2h]))[4h:1h])")
      .select($"label_k", $"value").as[(String, Double)].collect()
    assert(viaUnion.nonEmpty)
  }

  test("grid-strategy subquery matches per-instant semantics for bare counter selectors") {
    val h = 3600000L
    // two series (same k, users 1/2 → instances i1/i2), events across 3 instants
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(id: Long, tsMs: Long, user: Long, v: Double) =
      (id, new java.sql.Timestamp(t0.getTime + tsMs), user, "purchase", v, """{"k": "a"}""")
    val dir = fixture("events" -> Seq(
      at(0, 0, 1L, 1.0),      // T-2h
      at(1, 1 * h, 1L, 2.0),  // T-1h
      at(2, 2 * h, 2L, 4.0)   // T (first event of series i2!)
    ).toDF(eventCols: _*))
    // snapshots per series: i1 → (T-1h: 3, T: 3); i2 absent until T → (T: 4)
    val sums = Engine.eval(spark, dir, "sum_over_time((purchase)[2h:1h])")
      .select($"label_instance", $"value").as[(String, Double)].collect().toMap
    assert(sums === Map("i1" -> 6.0, "i2" -> 4.0))
    val counts = Engine.eval(spark, dir, "count_over_time((purchase)[2h:1h])")
      .select($"label_instance", $"value").as[(String, Double)].collect().toMap
    assert(counts === Map("i1" -> 2.0, "i2" -> 1.0)) // i2 exists at ONE instant
    // a large instant count runs through the same grid (no plan union)
    val wide = Engine.eval(spark, dir, "max_over_time((sum by (k) (purchase))[100d:1h])")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(wide === Map("a" -> 7.0))
  }

  test("rate-grid subquery: per-instant increases are running-sum differences") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),     // T-3h
      ev(1, 1 * h, "purchase", 2.0, "a"), // T-2h
      ev(2, 2 * h, "purchase", 4.0, "a"), // T-1h
      ev(3, 3 * h, "purchase", 8.0, "a")  // T
    ).toDF(eventCols: _*))
    def one(q: String) = Engine.eval(spark, dir, q)
      .select($"value").as[Double].collect().toSeq
    // instants T-1h, T with window 2h: increase(T-1h) = (T-3h, T-1h] = 6,
    // increase(T) = (T-2h, T] = 12  (the T-3h event is pruned + cancels)
    assert(one("max_over_time((increase(purchase[2h]))[2h:1h])") === Seq(12.0))
    assert(one("min_over_time((increase(purchase[2h]))[2h:1h])") === Seq(6.0))
    assert(one("sum_over_time((increase(purchase[2h]))[2h:1h])") === Seq(18.0))
    assert(one("avg_over_time((rate(purchase[2h]))[2h:1h])") === Seq(9.0 / 7200.0))
    // tiling identity: step-aligned 1h increases over 3h sum to increase[3h]
    val tiled = one("sum_over_time((increase(purchase[1h]))[3h:1h])")
    assert(tiled === one("increase(purchase[3h])"))
    assert(tiled === Seq(14.0))
    // a fine step drives the instant count far past the union bound (96
    // instants, lag baseline 48 more) — the identity still holds exactly
    val fine = one("sum_over_time((increase(purchase[30m]))[2d:30m])")
    assert(fine === one("increase(purchase[2d])"))
  }

  test("limitk picks a deterministic hash sample per group; limit_ratio complements tile") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"), ev(1, 0, "purchase", 2.0, "b"),
      ev(2, 0, "purchase", 4.0, "c"), ev(3, 0, "purchase", 8.0, "d"),
      ev(4, 0, "purchase", 16.0, "e"), ev(5, 0, "purchase", 32.0, "f")
    ).toDF(eventCols: _*))
    def series(q: String) = Engine.eval(spark, dir, q)
      .select($"label_k").as[String].collect().toSet
    val all = series("purchase")
    assert(all.size === 6)
    // limitk: k series globally, deterministic across evaluations
    val two = series("limitk(2, purchase)")
    assert(two.size === 2 && two.subsetOf(all))
    assert(series("limitk(2, purchase)") === two)
    // per-group limitk: one series per k group = every group survives
    assert(series("limitk by (k) (1, purchase)") === all)
    // limit_ratio: r and r−1 select exact complements; ±1 keep all
    val kept = series("limit_ratio(0.5, purchase)")
    val rest = series("limit_ratio(-0.5, purchase)")
    assert((kept & rest) === Set.empty)
    assert((kept ++ rest) === all)
    assert(series("limit_ratio(1.0, purchase)") === all)
    assert(series("limit_ratio(-1.0, purchase)") === all)
    intercept[PromQLCompileException](Engine.eval(spark, dir, "limit_ratio(1.5, purchase)"))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "limitk(0, purchase)"))
  }

  test("for-duration alerts fire only when the condition holds at every instant") {
    import graft.promql.Rules
    import graft.promql.Rules.AlertRule
    val d = 86400000L
    val dir = fixture("events" -> Seq(
      // series a: breaches from day 0 → present at T, T-1d, T-2d
      ev(0, 0, "purchase", 10.0, "a"),
      // series b: first event ON day 2 → above threshold only at T
      ev(1, 2 * d, "purchase", 50.0, "b"),
      // series c: old but small → never breaches
      ev(2, 0, "purchase", 1.0, "c"),
      ev(3, 2 * d, "purchase", 1.0, "c")
    ).toDF(eventCols: _*))
    val rule = "sum by (k) (purchase) > 5"
    // without `for`: a and b both fire now
    val now = Rules.evaluateAlerts(spark, dir, Seq(AlertRule("Hi", rule)))
      .select($"label_k").as[String].collect().toSet
    assert(now === Set("a", "b"))
    // with for: 2d @ 1d — only a held at T-1d and T-2d
    val sustained = Rules.evaluateAlerts(spark, dir, Seq(
      AlertRule("Hi", rule, forS = 2 * 86400, intervalS = 86400)))
      .select($"label_k", $"value").as[(String, Double)].collect().toSeq
    assert(sustained === Seq(("a", 10.0))) // value = the CURRENT snapshot
    // misconfigured interval is a compose-time error
    intercept[PromQLCompileException](Rules.evaluateAlerts(spark, dir, Seq(
      AlertRule("Hi", rule, forS = 100, intervalS = 33))))
  }

  test("alert state ladder: pending at onset, firing once sustained") {
    import graft.promql.Rules
    import graft.promql.Rules.AlertRule
    val d = 86400000L
    val dir = fixture("events" -> Seq(
      // a: breaches from day 0 — firing at every output instant
      ev(0, 0, "purchase", 10.0, "a"),
      // b: first breach on day 2 — at T it has NOT held for 2d (pending);
      //    at T-1d/T-2d it is inactive (no row at all)
      ev(1, 2 * d, "purchase", 50.0, "b"),
      // c: never breaches — inactive everywhere
      ev(2, 0, "purchase", 1.0, "c")
    ).toDF(eventCols: _*))
    val rule = AlertRule("Hi", "sum by (k) (purchase) > 5",
      forS = 2 * 86400, intervalS = 86400)
    val states = Rules.alertStates(spark, dir, rule, Seq(0L, 86400L, 172800L))
      .select($"offset_s", $"label_k", $"alertstate")
      .as[(Long, String, String)].collect().toSet
    // a fires at offset 0 (breached at T, T-1d, T-2d); at earlier output
    // instants its own lookbacks (T-3d, T-4d) predate all data -> pending
    assert(states === Set(
      (0L, "a", "firing"), (86400L, "a", "pending"), (172800L, "a", "pending"),
      (0L, "b", "pending")))
    // consistency with the collapsed batch reading: the firing set at
    // offset 0 IS evaluateAlerts' for-duration result
    val collapsed = Rules.evaluateAlerts(spark, dir, Seq(rule))
      .select($"label_k").as[String].collect().toSet
    val firing0 = Rules.alertStates(spark, dir, rule, Seq(0L))
      .filter($"alertstate" === "firing")
      .select($"label_k").as[String].collect().toSet
    assert(firing0 === collapsed)
  }

  test("recording rules materialize; alert rules fire on threshold breaches") {
    import graft.promql.Rules
    import graft.promql.Rules.{AlertRule, RecordingRule}
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 0, "purchase", 90.0, "b"),
      ev(2, 0, "click", 5.0, "a")
    ).toDF(eventCols: _*))
    val out = java.nio.file.Files.createTempDirectory("graft_rules").toString
    Rules.writeRecording(spark, dir, Seq(
      RecordingRule("k_purchase_total", "sum by (k) (purchase)")), out)
    val recorded = spark.read.parquet(s"$out/k_purchase_total")
      .select($"label_k", $"value").as[(String, Double)].collect().toSet
    assert(recorded === Set(("a", 10.0), ("b", 90.0)))
    val alerts = Rules.evaluateAlerts(spark, dir, Seq(
      AlertRule("HighPurchase", "purchase > 50"),
      AlertRule("TotalHigh", "sum(purchase) > 1000"))) // does not fire (100 < 1000)
      .select($"alertname", $"label_k", $"value")
      .as[(String, String, Double)].collect().toSet
    assert(alerts === Set(("HighPurchase", "b", 90.0)))
  }

  test("string escapes and unary minus parse (matcher values, negative scalars)") {
    val ast = Parser.parse("""purchase{k="a\"b"}""")
    assert(ast === Selector("purchase", Seq(Matcher("k", "=", "a\"b"))))
    assert(Parser.parse("""purchase{k="a\\b"}""") ===
      Selector("purchase", Seq(Matcher("k", "=", "a\\b"))))
    assert(Parser.parse("clamp_min(purchase, -5)") ===
      Func("clamp_min", Some(-5.0), Selector("purchase")))
    assert(Parser.parse("purchase * -2") ===
      BinOp("*", None, Selector("purchase"), NumLit(-2.0)))
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a")).toDF(eventCols: _*))
    assert(Engine.eval(spark, dir, "purchase * -2").select($"value")
      .as[Double].collect().toSeq === Seq(-20.0))
    assert(Engine.eval(spark, dir, "clamp_min(purchase, -5)").select($"value")
      .as[Double].collect().toSeq === Seq(10.0))
  }

  test("log/exp family matches the JVM reference; PromQL edge semantics") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 4.0, "a"),
      ev(1, 0, "purchase", 0.0, "z") // sums to 0 → ln = -Inf
    ).toDF(eventCols: _*))
    def one(q: String) = Engine.eval(spark, dir, q)
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    def approx(a: Double, b: Double): Boolean = math.abs(a - b) <= 2 * math.ulp(b)
    assert(approx(one("ln(purchase)")("a"), StrictMath.log(4.0)))
    assert(one("ln(purchase)")("z").isNegInfinity)
    assert(one("log2(purchase)")("a") === 2.0)
    assert(approx(one("log10(purchase)")("a"), StrictMath.log10(4.0)))
    assert(approx(one("exp(purchase)")("a"), StrictMath.exp(4.0)))
    assert(one("exp(purchase)")("z") === 1.0)
  }

  test("sum over rate keeps tiny per-second rates exact (no decimal quantization)") {
    val h = 3600000L
    // two series of label a: increase 1.0 and 2.0 in the last hour →
    // sum by (k) (rate) = 3/3600 ≈ 0.000833, far below the 0.005 step
    // a DECIMAL(18,2) cast would quantize to zero
    val dir = fixture("events" -> Seq(
      ev(0, 2 * h, "purchase", 1.0, "a"),
      ev(1, 2 * h, "purchase", 2.0, "a")
    ).toDF(eventCols: _*))
    val v = Engine.eval(spark, dir, "sum by (k) (rate(purchase[1h]))")
      .select($"value").as[Double].collect()
    assert(v.toSeq === Seq(3.0 / 3600.0))
    val avg = Engine.eval(spark, dir, "avg(rate(purchase[1h]))")
      .select($"value").as[Double].collect()
    assert(avg.toSeq === Seq(3.0 / 3600.0)) // one series after full-key grouping
  }

  test("b33 log family values match java.lang.Math on the gauge snapshot") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 7.5, "a"),
      ev(1, 1000, "signup", 12.25, "a"), // last write wins
      ev(2, 0, "signup", 3.0, "b")
    ).toDF(eventCols: _*))
    val rows = graft.operators.PromQL.logFunctions(spark, dir)
      .select($"label_k", $"value", $"ln_v", $"log2_v", $"log10_v", $"exp_scaled")
      .as[(String, Double, Double, Double, Double, Double)].collect()
    assert(rows.map(r => r._1 -> r._2).toMap === Map("a" -> 12.25, "b" -> 3.0))
    // Spark's log family routes through StrictMath while java.lang.Math
    // may use a 1-ulp-different intrinsic — pin within 2 ulps
    def approx(a: Double, b: Double): Boolean = math.abs(a - b) <= 2 * math.ulp(b)
    rows.foreach { r =>
      assert(approx(r._3, StrictMath.log(r._2)), s"ln ${r._2}")
      assert(approx(r._4, StrictMath.log(r._2) / StrictMath.log(2.0)), s"log2 ${r._2}")
      assert(approx(r._5, StrictMath.log10(r._2)), s"log10 ${r._2}")
      assert(approx(r._6, StrictMath.exp(r._2 / 1000.0)), s"exp ${r._2}")
    }
  }

  test("b33b: the deterministic log family tracks libm within 1e-11 and keeps edge semantics") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 7.5, "a"),
      ev(1, 1000, "signup", 12.25, "a"),
      ev(2, 0, "signup", 3.0, "b"),
      ev(3, 0, "signup", 0.0, "z"),   // ln 0 = -Inf
      ev(4, 0, "signup", -2.0, "n")   // ln(x<0) = NaN
    ).toDF(eventCols: _*))
    val rows = graft.operators.PromQL.logFunctionsDet(spark, dir)
      .select($"label_k", $"value", $"ln_v", $"log2_v", $"log10_v", $"exp_scaled")
      .as[(String, Double, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    for (k <- Seq("a", "b")) {
      val r = rows(k)
      assert(math.abs(r._3 - StrictMath.log(r._2)) < 1e-11, s"ln $k")
      assert(r._4 === graft.functions.DetMath.log2(r._2), s"log2 $k")
      assert(math.abs(r._5 - StrictMath.log10(r._2)) < 1e-11, s"log10 $k")
      assert(math.abs(r._6 - StrictMath.exp(r._2 / 1000.0)) < 1e-11, s"exp $k")
    }
    assert(rows("z")._3.isNegInfinity && rows("z")._4.isNegInfinity)
    assert(rows("n")._3.isNaN && rows("n")._5.isNaN)
    // exp is total: defined for the zero and negative snapshots too
    assert(math.abs(rows("n")._6 - StrictMath.exp(-0.002)) < 1e-11)
  }

  test("b38: deterministic inverse hyperbolics track the identities and keep domain edges") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 7.5, "a"),    // asinh(2.0), acosh(7.5), atanh(0.005)
      ev(1, 0, "signup", 0.5, "b"),    // acosh domain: NaN below 1
      ev(2, 0, "signup", 405.5, "c")   // atanh(1.0) = +Inf
    ).toDF(eventCols: _*))
    val rows = graft.operators.PromQL.inverseHyperbolicDet(spark, dir)
      .select($"label_k", $"value", $"asinh_v", $"acosh_v", $"atanh_v")
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def ref(f: Double => Double, x: Double): Double = f(x)
    val a = rows("a")
    assert(math.abs(a._3 - StrictMath.log(2.0 + math.sqrt(5.0))) < 1e-11)
    assert(math.abs(a._4 - StrictMath.log(7.5 + math.sqrt(7.5 * 7.5 - 1))) < 1e-11)
    assert(math.abs(a._5 - 0.5 * StrictMath.log(1.005 / 0.995)) < 1e-11)
    assert(rows("b")._4.isNaN)                  // acosh(0.5)
    assert(rows("c")._5.isPosInfinity)          // atanh(1)
    assert(!rows("b")._3.isNaN && !rows("c")._3.isNaN) // asinh total
  }

  test("group_left keeps the left label set in many-to-one matching") {
    // two series share k="a" (different users → instances i1, i2)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (0L, t0, 1L, "purchase", 30.0, """{"k": "a"}"""),
      (1L, t0, 2L, "purchase", 10.0, """{"k": "a"}"""),
      (2L, t0, 1L, "purchase", 5.0, """{"k": "b"}"""))
    val dir = fixture("events" -> rows.toDF(eventCols: _*))
    val share = Engine.eval(spark, dir,
      "purchase / on(k) group_left sum by (k) (purchase)")
      .select($"label_instance", $"label_k", $"value")
      .as[(String, String, Double)].collect().toSet
    assert(share === Set(("i1", "a", 0.75), ("i2", "a", 0.25), ("i1", "b", 1.0)))
    // group_left without on(...) or against a scalar is rejected
    intercept[PromQLCompileException](Engine.eval(spark, dir,
      "purchase / on(k) group_left 2"))
  }

  test("bool modifier yields 0/1 vectors; ignoring and group_right match correctly") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (0L, t0, 1L, "purchase", 30.0, """{"k": "a"}"""),
      (1L, t0, 2L, "purchase", 10.0, """{"k": "a"}"""),
      (2L, t0, 1L, "click", 20.0, """{"k": "a"}"""))
    val dir = fixture("events" -> rows.toDF(eventCols: _*))
    // scalar bool: every series kept, value flattened to 0/1
    val b = Engine.eval(spark, dir, "purchase > bool 15")
      .select($"label_instance", $"value").as[(String, Double)].collect().toSet
    assert(b === Set(("i1", 1.0), ("i2", 0.0)))
    // vector bool over the full key: i1 purchase 30 > click 20 → 1;
    // i2 has no click side → dropped by the join (PromQL matching)
    val vb = Engine.eval(spark, dir, "purchase > bool on(k, instance) click")
      .select($"label_instance", $"value").as[(String, Double)].collect().toSet
    assert(vb === Set(("i1", 1.0)))
    // ignoring(instance) + group_left: share of each instance in its k group
    val ig = Engine.eval(spark, dir,
      "sum by (k, instance) (purchase) / ignoring(instance) group_left sum by (k) (purchase)")
      .select($"label_instance", $"value").as[(String, Double)].collect().toSet
    assert(ig === Set(("i1", 0.75), ("i2", 0.25)))
    // group_right mirrors group_left: the right side keeps its labels
    val gr = Engine.eval(spark, dir,
      "sum by (k) (purchase) / on(k) group_right purchase")
      .select($"label_instance", $"value").as[(String, Double)].collect().toSet
    assert(gr === Set(("i1", 40.0 / 30.0), ("i2", 40.0 / 10.0)))
    // bool on a non-comparison operator is rejected at compose time
    intercept[PromQLCompileException](Engine.eval(spark, dir,
      "purchase + bool 2"))
  }

  test("absent emits the 1-row equality-labeled vector only when nothing matches") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    val missing = Engine.eval(spark, dir, """absent(purchase{k="zzz"})""")
      .select($"label_k", $"value").as[(String, Double)].collect().toSeq
    assert(missing === Seq(("zzz", 1.0)))
    val present = Engine.eval(spark, dir, """absent(purchase{k="a"})""")
      .select($"value").as[Double].collect()
    assert(present.isEmpty)
    // compose-time: unknown family still fails before any job
    intercept[PromQLCompileException](Engine.eval(spark, dir, "absent(nosuch)"))
  }

  test("gauge grid subquery replays last-write-wins at each instant") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 9.0, "a"),      // T-2h: value 9
      ev(1, 1 * h, "signup", 4.0, "a"),  // T-1h: drops to 4
      ev(2, 2 * h, "signup", 6.0, "a")   // T: rises to 6
    ).toDF(eventCols: _*))
    // instants T-1h (LWW = 4) and T (LWW = 6); the T-2h value 9 is
    // SUPERSEDED by instant T-1h — a naive per-window max would say 9
    def one(q: String) = Engine.eval(spark, dir, q)
      .select($"value").as[Double].collect().toSeq
    assert(one("max_over_time((signup)[2h:1h])") === Seq(6.0))
    assert(one("min_over_time((signup)[2h:1h])") === Seq(4.0))
    assert(one("count_over_time((signup)[2h:1h])") === Seq(2.0))
    assert(one("avg_over_time((signup)[2h:1h])") === Seq(5.0))
    // large instant counts run through the same grid; with hourly
    // instants there IS an instant at T-2h whose LWW value is 9
    assert(one("max_over_time((signup)[100d:1h])") === Seq(9.0))
  }

  test("stddev/stdvar_over_time use exact cent moments; clamp desugars") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 1 * h, "signup", 2.0, "a"),
      ev(1, 2 * h, "signup", 4.0, "a"),
      ev(2, 2 * h, "signup", 9.0, "a")
    ).toDF(eventCols: _*))
    // population variance of {2, 4, 9} = ((4+16+81)/3 - 25) = 8.666...
    val sv = Engine.eval(spark, dir, "stdvar_over_time(signup[2h])")
      .select($"value").as[Double].collect()
    assert(math.abs(sv.head - (101.0 / 3.0 - 25.0)) < 1e-9)
    val sd = Engine.eval(spark, dir, "stddev_over_time(signup[2h])")
      .select($"value").as[Double].collect()
    assert(math.abs(sd.head - math.sqrt(101.0 / 3.0 - 25.0)) < 1e-9)
    // clamp(v, min, max) = clamp_max(clamp_min(v, min), max)
    assert(Parser.parse("clamp(signup, 3, 8)") ===
      Func("clamp_max", Some(8.0), Func("clamp_min", Some(3.0), Selector("signup"))))
    val clamped = Engine.eval(spark, dir, "clamp(signup, 5, 8)")
      .select($"value").as[Double].collect()
    assert(clamped.toSeq === Seq(8.0)) // LWW 9 clamped to 8
  }

  test("histogram_count/sum/avg and histogram_fraction match hand values") {
    val h = 3600000L
    // buckets are 1,5,10,25,50,100,150; series a observes 2,8,30,200
    // (one observation past the top boundary), series b observes 4
    val dir = fixture("events" -> Seq(
      ev(0, h, "error", 2.0, "a"), ev(1, 2 * h, "error", 8.0, "a"),
      ev(2, 3 * h, "error", 30.0, "a"), ev(3, 4 * h, "error", 200.0, "a"),
      ev(4, h, "error", 4.0, "b")).toDF(eventCols: _*))
    def m(q: String): Map[String, Double] =
      Engine.eval(spark, dir, q)
        .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(m("histogram_count(error)") === Map("a" -> 4.0, "b" -> 1.0))
    assert(m("histogram_sum(error)") === Map("a" -> 240.0, "b" -> 4.0))
    assert(m("histogram_avg(error)") === Map("a" -> 60.0, "b" -> 4.0))
    // a: F(75.5)=3 (the 200 observation is invisible above the top
    // boundary), F(2.5)=0+1·(2.5−1)/(5−1)=0.375 → (3−0.375)/4
    // b: F(75.5)=1, F(2.5)=0.375 → 0.625
    assert(m("histogram_fraction(2.5, 75.5, error)") ===
      Map("a" -> 0.65625, "b" -> 0.625))
    // windowed: T=4h, window (2h,4h] holds a's 30 and 200 only
    assert(m("histogram_count(rate(error[2h]))") === Map("a" -> 2.0 / 7200.0))
    assert(m("histogram_sum(increase(error[2h]))") === Map("a" -> 230.0))
    // avg is scale-invariant: rate form = mean observed value in window
    assert(m("histogram_avg(rate(error[2h]))") === Map("a" -> 115.0))
    // stdvar: a = {2,8,30,200} → E[x²]−E[x]² = 10242 − 3600 = 6642
    val sv = m("histogram_stdvar(error)")
    assert(math.abs(sv("a") - 6642.0) < 1e-6 && sv("b") === 0.0)
    val sd = m("histogram_stddev(error)")
    assert(math.abs(sd("a") - math.sqrt(6642.0)) < 1e-9 && sd("b") === 0.0)
  }

  test("native-histogram dispatch: front-end quantile bit-matches the aggregator; fraction matches hand values") {
    val h = 3600000L
    // series a observes 2,8,30,200; series b observes 4 and two zeros
    // (exercising the zero bucket through the front-end path)
    val dir = fixture("events" -> Seq(
      ev(0, h, "error", 2.0, "a"), ev(1, 2 * h, "error", 8.0, "a"),
      ev(2, 3 * h, "error", 30.0, "a"), ev(3, 4 * h, "error", 200.0, "a"),
      ev(4, h, "error", 4.0, "b"), ev(5, 2 * h, "error", 0.0, "b"),
      ev(6, 3 * h, "error", 0.0, "b")).toDF(eventCols: _*))
    val native = Engine.eval(spark, dir, "histogram_quantile(0.9, error)",
      nativeFamilies = Set("error"))
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    // independent reference: fold the same observations through the
    // NativeHistogramAggregator and take its DetMath quantile — the
    // front-end plan must reproduce it bit for bit
    val agg = new graft.functions.NativeHistogramAggregator(3)
    def ref(vals: Seq[Double], phi: Double): Double =
      agg.quantile(vals.foldLeft(agg.zero)(agg.reduce), phi)
    assert(native("a") === ref(Seq(2.0, 8.0, 30.0, 200.0), 0.9))
    assert(native("b") === ref(Seq(4.0, 0.0, 0.0), 0.9))
    // rank 0.9·3=2.7 of b falls past the two zeros into the 4.0 bucket
    assert(native("b") > 0.0)
    // zero-bucket rank: phi low enough that rank <= zero_count → exactly 0
    val low = Engine.eval(spark, dir, "histogram_quantile(0.5, error)",
      nativeFamilies = Set("error"))
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(low("b") === 0.0)
    assert(low("a") === ref(Seq(2.0, 8.0, 30.0, 200.0), 0.5))
    // classic path untouched when the family is NOT declared native
    val classic = Engine.eval(spark, dir, "histogram_quantile(0.9, error)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(classic !== native)
    // native fraction: hand values — a's buckets (schema 3) hold 2, 8,
    // 30, 200 in separate buckets; (2.5, 75.5] covers 8 and 30 fully
    // plus the log-interpolated slivers of 2's and 200's buckets
    val frac = Engine.eval(spark, dir, "histogram_fraction(2.5, 75.5, error)",
      nativeFamilies = Set("error"))
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    import graft.functions.NativeHistogramAggregator.fractionPieces
    val (bLo, fLo, _) = fractionPieces(2.5, 3)
    val (bHi, fHi, _) = fractionPieces(75.5, 3)
    def refFrac(vals: Seq[Double]): Double = {
      val buckets = vals.filter(_ > 0).groupBy(agg.bucketIndex).view.mapValues(_.size.toLong)
      val zero = vals.count(_ == 0.0).toLong
      def F(b: Int, fx: Double): Double =
        (zero + buckets.filter(_._1 < b).values.sum).toDouble +
          buckets.getOrElse(b, 0L).toDouble * fx
      (F(bHi, fHi) - F(bLo, fLo)) / vals.length.toDouble
    }
    assert(math.abs(frac("a") - refFrac(Seq(2.0, 8.0, 30.0, 200.0))) < 1e-15)
    assert(math.abs(frac("b") - refFrac(Seq(4.0, 0.0, 0.0))) < 1e-15)
    // fraction of everything is 1 when all observations are in range
    val all = Engine.eval(spark, dir, "histogram_fraction(0.001, 1000, error)",
      nativeFamilies = Set("error"))
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(all("a") === 1.0)
  }

  test("info() enriches series with the derived target_info label") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 5.0, "a"),
      ev(1, 1000, "signup", 7.0, "a"),
      ev(2, 0, "signup", 2.0, "b"),
      ev(3, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    val rows = Engine.eval(spark, dir, "info(signup)")
      .select($"label_k", $"label_instance", $"label_version", $"value")
      .as[(String, String, String, Double)].collect().toSet
    // user_id=1 → instance i1 → derived version v1; gauge is LWW
    assert(rows === Set(("a", "i1", "v1", 7.0), ("b", "i1", "v1", 2.0)))
    // composes downstream: the copied label is aggregatable
    val agg = Engine.eval(spark, dir, "sum by (version) (info(signup))")
      .select($"label_version", $"value").as[(String, Double)].collect().toSet
    assert(agg === Set(("v1", 9.0)))
    // identifying label must still be present at the join
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, "info(sum by (k) (signup))"))
    // collision guard: enriching twice would duplicate 'version'
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, "info(info(signup))"))
  }

  test("compose-time checks reject kind and shape errors before any job") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a")).toDF(eventCols: _*))
    // A7 analog: each of these fails at compile, not at executor time
    intercept[PromQLCompileException](Engine.eval(spark, dir, "rate(signup[5m])"))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "rate(purchase)"))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "purchase[5m]"))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "nosuchmetric"))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "error"))
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, "histogram_quantile(0.9, purchase)"))
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, "histogram_avg(purchase)"))
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, "histogram_fraction(5, 2, error)"))
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, "histogram_count(error[5m])"))
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, """purchase{badlabel="x"}"""))
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, "topk(2.5, purchase)"))
  }

  // flatten an exception's own + cause-chain messages (raise_error
  // surfaces wrapped in SparkRuntimeException / task failure layers)
  private def allMessages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("b34 trig family values match StrictMath; label and calendar functions") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 7.5, "a"),
      ev(1, 0, "signup", 3.0, "b"),
      ev(2, 0, "purchase", 10.0, "a")
    ).toDF(eventCols: _*))
    def approx(a: Double, b: Double): Boolean =
      (a.isNaN && b.isNaN) || math.abs(a - b) <= 2 * math.ulp(b)
    val rows = graft.operators.PromQL.trigFunctions(spark, dir)
      .select($"value", $"sin_v", $"cos_v", $"tan_v", $"atan_v", $"tanh_v",
        $"deg_v", $"rad_v")
      .as[(Double, Double, Double, Double, Double, Double, Double, Double)]
      .collect()
    rows.foreach { r =>
      assert(approx(r._2, StrictMath.sin(r._1)), s"sin ${r._1}")
      assert(approx(r._3, StrictMath.cos(r._1)), s"cos ${r._1}")
      assert(approx(r._4, StrictMath.tan(r._1)), s"tan ${r._1}")
      assert(approx(r._5, StrictMath.atan(r._1)), s"atan ${r._1}")
      assert(approx(r._6, StrictMath.tanh(r._1)), s"tanh ${r._1}")
      assert(approx(r._7, StrictMath.toDegrees(r._1)), s"deg ${r._1}")
      assert(approx(r._8, StrictMath.toRadians(r._1)), s"rad ${r._1}")
    }
    // the front-end trig path composes like any scalar function
    val s = Engine.eval(spark, dir, "sin(signup)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(approx(s("a"), StrictMath.sin(7.5)) && approx(s("b"), StrictMath.sin(3.0)))
    // pi() is a scalar literal
    assert(Parser.parse("pi()") === graft.promql.NumLit(math.Pi))
    val piScaled = Engine.eval(spark, dir, "purchase * pi()")
      .select($"value").as[Double].collect()
    assert(approx(piScaled.head, 10.0 * math.Pi))
    // label_replace: no-match leaves the series unchanged (empty dst)
    val lr = Engine.eval(spark, dir,
      """label_replace(purchase, "m", "g-$1", "k", "(a)")""")
    assert(lr.columns.toSeq ===
      Seq("name", "label_k", "label_instance", "label_m", "value"))
    val lrRows = lr.select($"label_k", $"label_m").as[(String, String)].collect().toMap
    assert(lrRows === Map("a" -> "g-a"))
    // calendar components: t0 is 2024-01-01 (a Monday)
    val epoch = Engine.eval(spark, dir, "timestamp(purchase)")
      .select($"value").as[Double].collect().head
    val cal = java.time.Instant.ofEpochSecond(epoch.toLong)
      .atZone(java.time.ZoneOffset.UTC)
    val checks = Seq(
      "minute" -> cal.getMinute.toDouble,
      "day_of_week" -> (cal.getDayOfWeek.getValue % 7).toDouble, // 0 = Sunday
      "day_of_month" -> cal.getDayOfMonth.toDouble,
      "year" -> cal.getYear.toDouble,
      "days_in_month" -> cal.toLocalDate.lengthOfMonth.toDouble)
    checks.foreach { case (fn, expected) =>
      val got = Engine.eval(spark, dir, s"$fn(timestamp(purchase))")
        .select($"value").as[Double].collect().head
      assert(got === expected, fn)
    }
  }

  test("power, modulo, atan2 operators and negative offsets") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 0, "purchase", 3.0, "b"),
      ev(2, h, "click", 2.0, "a") // T = 1h
    ).toDF(eventCols: _*))
    def approx(a: Double, b: Double): Boolean = math.abs(a - b) <= 2 * math.ulp(b)
    // ^ binds tightest and is right-associative: 2 ^ 3 ^ 2 = 2^9
    assert(Parser.parse("purchase ^ 2 * 3") ===
      BinOp("*", None, BinOp("^", None, Selector("purchase"), NumLit(2.0)), NumLit(3.0)))
    val sq = Engine.eval(spark, dir, "purchase ^ 2")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(sq === Map("a" -> 100.0, "b" -> 9.0))
    val mod = Engine.eval(spark, dir, "purchase % 3")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(mod === Map("a" -> 1.0, "b" -> 0.0))
    // atan2 as a vector-vector matched operator
    val at = Engine.eval(spark, dir, "purchase atan2 on(k) click")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(at.keySet === Set("a") && approx(at("a"), StrictMath.atan2(10.0, 2.0)))
    // a negative offset looks FORWARD: purchase offset -1h evaluated at
    // T-1h sees everything up to T, same as the unshifted snapshot at T
    assert(Parser.parse("purchase offset -1h") ===
      Selector("purchase", Nil, None, Some(-3600L)))
    // t0 = 2024-01-01 00:00 UTC = 1704067200; both pin the bound at t0+1h
    val back = Engine.eval(spark, dir,
      "sum by (k) (purchase offset 1h @ 1704074400)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    val fwd = Engine.eval(spark, dir,
      "sum by (k) (purchase offset -1h @ 1704067200)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(back === Map("a" -> 10.0, "b" -> 3.0))
    assert(fwd === back) // @t0 + look 1h forward == @t0+2h − 1h
  }

  test("round to_nearest, @ start()/end(), and absent_over_time compose") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 7.3, "a"),
      ev(1, 0, "signup", 2.5, "b"), // tie: rounds UP (toward +Inf)
      ev(2, 0, "purchase", 1.0, "a")
    ).toDF(eventCols: _*))
    val r5 = Engine.eval(spark, dir, "round(signup, 5)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(r5 === Map("a" -> 5.0, "b" -> 5.0))
    val r1 = Engine.eval(spark, dir, "round(signup)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(r1 === Map("a" -> 7.0, "b" -> 3.0)) // 2.5 → 3 (half up)
    // @ start() / @ end() parse to sentinel pins; an INSTANT query
    // resolves both to the evaluation instant itself (upstream's
    // start = end = eval-time rule)
    assert(Parser.parse("signup @ start()") ===
      Selector("signup", atS = Some(Selector.AtStart)))
    assert(Parser.parse("signup @ end()") ===
      Selector("signup", atS = Some(Selector.AtEnd)))
    assert(graft.promql.Ast.resolveAtEdges(
      Parser.parse("signup @ start()"), None, None) === Selector("signup"))
    val atEnd = Engine.eval(spark, dir, "sum by (k) (signup @ end())")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(atEnd === Map("a" -> 7.3, "b" -> 2.5))
    // absent_over_time: 1-row equality-labeled vector iff no samples
    assert(Engine.eval(spark, dir, """absent_over_time(signup{k="zz"}[1h])""")
      .collect().length === 1)
    assert(Engine.eval(spark, dir, """absent_over_time(signup{k="a"}[1h])""")
      .collect().isEmpty)
  }

  test("group_left(labels) carries labels from the one side") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "click", 6.0, "a"),
      ev(1, 0, "click", 4.0, "b"),
      ev(2, 0, "purchase", 5.0, "x")
    ).toDF(eventCols: _*))
    val df = Engine.eval(spark, dir,
      """sum by (instance) (click) / on(instance) group_left(k) purchase{k="x"}""")
    assert(df.columns.toSeq === Seq("label_instance", "label_k", "value"))
    val rows = df.as[(String, String, Double)].collect().toSet
    assert(rows === Set(("i1", "x", 2.0))) // (6+4)/5, k carried from purchase
    // carried label must exist on the one side and be new on the many side
    intercept[PromQLCompileException](Engine.eval(spark, dir,
      """click / on(instance) group_left(k) purchase{k="x"}"""))
    // parser: "(" after group_left is always a label list
    assert(Parser.parse("a / on(k) group_left(instance) b") ===
      BinOp("/", Some(Seq("k")), Selector("a"), Selector("b"),
        groupLeft = true, groupCarry = Seq("instance")))
  }

  test("__name__ matchers select across families with compose-time checks") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),
      ev(1, 0, "click", 2.0, "a"),
      ev(2, 0, "signup", 9.0, "a")
    ).toDF(eventCols: _*))
    // bare brace selector unions same-kind families; name stays a label
    val rows = Engine.eval(spark, dir, """{__name__=~"purchase|click"}""")
      .select($"name", $"value").as[(String, Double)].collect().toSet
    assert(rows === Set(("purchase", 1.0), ("click", 2.0)))
    // negative name matcher against the counter universe
    val neg = Engine.eval(spark, dir, """sum by (k) ({__name__=~"purchase|click", __name__!="click"})""")
      .select($"value").as[Double].collect().toSeq
    assert(neg === Seq(1.0))
    // rate over a cross-family counter selector
    assert(Engine.eval(spark, dir, """increase({__name__=~"purchase|click"}[1h])""")
      .select($"value").as[Double].collect().toSet === Set(1.0, 2.0))
    // mixed kinds and empty matches fail at compose time
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, """{__name__=~"purchase|signup"}"""))
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, """{__name__="nosuch"}"""))
    intercept[PromQLCompileException](Engine.eval(spark, dir, """{k="a"}"""))
  }

  test("vector matching raises on duplicate series per match group") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 0, "purchase", 20.0, "b"),
      ev(2, 0, "click", 5.0, "a")
    ).toDF(eventCols: _*))
    // one-to-one: two purchase series share the instance match group
    val e1 = intercept[Throwable] {
      Engine.eval(spark, dir, "purchase / on(instance) click").collect()
    }
    assert(allMessages(e1).contains("found duplicate series"))
    // group_left: the "one" (right) side itself must be unique per group
    val e2 = intercept[Throwable] {
      Engine.eval(spark, dir, "click / on(instance) group_left purchase").collect()
    }
    assert(allMessages(e2).contains("found duplicate series"))
    // a genuinely one-to-one match still evaluates
    val ok = Engine.eval(spark, dir, "purchase / on(k) click")
      .select($"label_k", $"value").as[(String, Double)].collect().toSet
    assert(ok === Set(("a", 2.0)))
  }

  test("round-5 function family: sort, scalar, time, vector, sgn, timestamp") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 0, "purchase", 30.0, "b"),
      ev(2, h, "signup", 7.0, "a"),
      ev(3, 2 * h, "signup", 3.0, "b") // T = 2h
    ).toDF(eventCols: _*))
    // sort_desc orders the output vector by value
    val sorted = Engine.eval(spark, dir, "sort_desc(purchase)")
      .select($"value").as[Double].collect().toSeq
    assert(sorted === Seq(30.0, 10.0))
    // scalar() broadcasts the 1-series value; multi-series scalar is NaN
    val share = Engine.eval(spark, dir, "purchase / scalar(sum(purchase))")
      .select($"label_k", $"value").as[(String, Double)].collect().toSet
    assert(share === Set(("a", 0.25), ("b", 0.75)))
    val nan = Engine.eval(spark, dir, "purchase / scalar(purchase)")
      .select($"value").as[Double].collect()
    assert(nan.forall(_.isNaN))
    // time() is the evaluation instant T (seconds); timestamp(v) the
    // per-series last-sample instant — their difference is the age
    val age = Engine.eval(spark, dir, "time() - timestamp(signup)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(age === Map("a" -> 3600.0, "b" -> 0.0))
    // vector(s): the label-free 1-element vector
    val v1 = Engine.eval(spark, dir, "vector(2.5)")
    assert(v1.columns.toSeq === Seq("value"))
    assert(v1.as[Double].collect().toSeq === Seq(2.5))
    // sgn
    val s = Engine.eval(spark, dir, "sgn(signup - 5.5)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(s === Map("a" -> 1.0, "b" -> -1.0))
  }

  test("round-5 range functions obey kind and shape compose-time checks") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),
      ev(1, 0, "signup", 2.0, "a")).toDF(eventCols: _*))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "irate(signup[5m])"))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "idelta(purchase[5m])"))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "changes(purchase[5m])"))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "deriv(purchase[5m])"))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "irate(purchase)"))
    intercept[PromQLCompileException](Engine.eval(spark, dir, "scalar(purchase)"))
    intercept[PromQLCompileException](
      Engine.eval(spark, dir, """count_values("k", purchase)"""))
    // parser shapes for the parameterized forms
    assert(Parser.parse("predict_linear(signup[1h], 600)") ===
      Func("predict_linear", Some(600.0), Selector("signup", Nil, Some(3600L), None)))
    assert(Parser.parse("quantile_over_time(0.9, signup[1h])") ===
      Func("quantile_over_time", Some(0.9), Selector("signup", Nil, Some(3600L), None)))
    assert(Parser.parse("""count_values("v", purchase)""") ===
      graft.promql.CountValues("v", Selector("purchase")))
  }

  test("round-5 windowed functions compute the documented window semantics") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 1.0, "a"),      // outside [T-2h, T]? T=4h; 4h window covers all
      ev(1, h, "signup", 5.0, "a"),
      ev(2, 2 * h, "signup", 5.0, "a"),
      ev(3, 3 * h, "signup", 2.0, "a"),
      ev(4, 4 * h, "signup", 9.0, "a"),
      ev(5, 4 * h, "purchase", 4.0, "a") // T anchor; counter family
    ).toDF(eventCols: _*))
    // changes: 1→5→5→2→9 has 3 changes (5→5 is not a change)
    val ch = Engine.eval(spark, dir, "changes(signup[5h])")
      .select($"value").as[Double].collect()
    assert(ch.toSeq === Seq(3.0))
    // idelta: last two samples 2, 9 → 7
    val id = Engine.eval(spark, dir, "idelta(signup[5h])")
      .select($"value").as[Double].collect()
    assert(id.toSeq === Seq(7.0))
    // last_over_time picks the freshest sample; present_over_time is 1
    assert(Engine.eval(spark, dir, "last_over_time(signup[5h])")
      .select($"value").as[Double].collect().toSeq === Seq(9.0))
    assert(Engine.eval(spark, dir, "present_over_time(signup[5h])")
      .select($"value").as[Double].collect().toSeq === Seq(1.0))
    // quantile_over_time(0.5, ...) over {1,2,5,5,9} → 5
    assert(Engine.eval(spark, dir, "quantile_over_time(0.5, signup[5h])")
      .select($"value").as[Double].collect().toSeq === Seq(5.0))
    // deriv over a perfectly linear series equals its slope
    val dir2 = fixture("events" -> Seq(
      ev(0, 0, "signup", 1.0, "a"),
      ev(1, h, "signup", 2.0, "a"),
      ev(2, 2 * h, "signup", 3.0, "a")
    ).toDF(eventCols: _*))
    val dv = Engine.eval(spark, dir2, "deriv(signup[3h])")
      .select($"value").as[Double].collect()
    assert(math.abs(dv.head - 1.0 / 3600.0) < 1e-12)
    // predict_linear extrapolates the same line one hour past T
    val pv = Engine.eval(spark, dir2, "predict_linear(signup[3h], 3600)")
      .select($"value").as[Double].collect()
    assert(math.abs(pv.head - 4.0) < 1e-9)
  }

  test("grammar fuzz: generated queries evaluate or raise ONLY PromQL exceptions") {
    // ADVICE r4's last defect class: a shape the compiler accepts but
    // Catalyst rejects at analysis time (AnalysisException instead of a
    // compose-time PromQLCompileException). This harness generates
    // structurally-plausible queries — deliberately including kind and
    // label violations — and asserts the contract: either the plan
    // builds AND collects, or the failure is a PromQL{Parse,Compile}
    // Exception raised before any job.
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, h, "purchase", 2.0, "a"), ev(1, 2 * h, "purchase", 3.0, "b"),
      ev(2, h, "click", 1.0, "a"), ev(3, 2 * h, "click", 4.0, "a"),
      ev(4, h, "signup", 5.0, "a"), ev(5, 2 * h, "signup", 7.0, "b"),
      ev(6, h, "error", 9.0, "a"), ev(7, 2 * h, "error", 60.0, "a")
    ).toDF(eventCols: _*))
    val rnd = new scala.util.Random(20260813L)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    def reseed(s: Long): Unit = rnd.setSeed(s)
    def name() = pick(Seq("purchase", "click", "signup", "error", "nope"))
    def lbl() = pick(Seq("k", "instance", "bogus"))
    def sel() = {
      val m = rnd.nextInt(3) match {
        case 0 => ""
        case 1 => s"""{${lbl()}="a"}"""
        case _ => s"""{${lbl()}=~"a|b"}"""
      }
      val off = if (rnd.nextBoolean()) " offset 1h" else ""
      s"${name()}$m$off"
    }
    def range() = s"${sel()}[${pick(Seq("1h", "5h", "1d"))}]"
    def vector(depth: Int): String =
      if (depth <= 0) sel()
      else rnd.nextInt(18) match {
        case 0 => s"sum by (${lbl()}) (${vector(depth - 1)})"
        case 1 => s"${pick(Seq("rate", "increase", "delta", "irate", "changes", "resets"))}(${range()})"
        case 2 => s"${pick(Seq("avg_over_time", "mad_over_time", "ts_of_max_over_time", "stddev_over_time"))}(${range()})"
        case 3 => s"topk(2, ${vector(depth - 1)})"
        case 4 => s"${vector(depth - 1)} ${pick(Seq("+", "*", ">", "or", "unless"))} ${vector(depth - 1)}"
        case 5 => s"${pick(Seq("abs", "ceil", "exp", "sgn", "sort_desc",
          "asinh", "acosh", "atanh"))}(${vector(depth - 1)})"
        case 6 => s"histogram_quantile(0.9, ${sel()})"
        case 7 => s"""label_replace(${vector(depth - 1)}, "dst", "x", "${lbl()}", "a.*")"""
        case 8 => s"quantile_over_time(0.5, ${range()})"
        case 9 => s"${pick(Seq("avg_over_time", "max_over_time", "sum_over_time", "count_over_time"))}((${pick(Seq(vector(depth - 1), s"min_over_time(${range()})", s"avg_over_time(${range()})", s"resets(${range()})"))})[1d:6h])"
        case 10 => s"${pick(Seq("limitk", "limit_ratio"))}(${pick(Seq("2", "0.5"))}, ${vector(depth - 1)})"
        case 11 => s"${name()} @ ${pick(Seq("1704067200", "start()", "end()"))}"
        case 12 => s"""count_values("v", ${vector(depth - 1)})"""
        case 13 => s"""sort_by_label(${vector(depth - 1)}, "${lbl()}")"""
        case 14 => s"${sel()} ${pick(Seq("/", ">"))} ${pick(Seq("on", "ignoring"))}(${lbl()}) ${pick(Seq("", "group_left "))}${sel()}"
        case 15 => s"double_exponential_smoothing(${range()}, 0.5, 0.3)"
        case 16 => s"${pick(Seq("histogram_count", "histogram_sum", "histogram_avg"))}(${pick(Seq(sel(), s"rate(${range()})"))})"
        case _ => s"histogram_fraction(${pick(Seq("2.5", "50"))}, ${pick(Seq("75.5", "10"))}, ${sel()})"
      }
    var ok = 0; var rejected = 0
    for (seed <- Seq(20260813L, 424242L)) {
      reseed(seed)
      for (_ <- 1 to 60) {
        val q = vector(2)
        try { Engine.eval(spark, dir, q).collect(); ok += 1 }
        catch {
          case _: PromQLParseException | _: PromQLCompileException => rejected += 1
          // the one INTENTIONAL runtime error (Prometheus parity): the
          // vector-matching cardinality guard fires during execution
          // (raise_error → SparkException, message possibly in a cause)
          case e: Throwable if Iterator.iterate(e)(_.getCause)
            .takeWhile(_ ne null).take(5)
            .exists(t => Option(t.getMessage)
              .exists(_.contains("found duplicate series"))) => rejected += 1
          case e: Throwable =>
            fail(s"query '$q' leaked ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
    // the generator must exercise BOTH paths to mean anything
    assert(ok >= 20, s"only $ok/120 queries evaluated — generator too hostile")
    assert(rejected >= 20, s"only $rejected/120 rejected — generator too tame")
  }

  test("ts_of_last/max/min_over_time return the extremum sample's timestamp") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, h, "signup", 5.0, "a"),
      ev(1, 2 * h, "signup", 9.0, "a"), // first max
      ev(2, 3 * h, "signup", 9.0, "a"), // tie — LATEST wins (upstream >=)
      ev(3, 4 * h, "signup", 1.0, "a")
    ).toDF(eventCols: _*))
    def one(q: String): Double = Engine.eval(spark, dir, q)
      .select($"value").as[Double].collect().head
    val base = 1704067200.0 // the fixture's 2024-01-01T00:00Z epoch base
    assert(one("ts_of_last_over_time(signup[5h])") === base + 4 * 3600.0)
    assert(one("ts_of_max_over_time(signup[5h])") === base + 3 * 3600.0)
    assert(one("ts_of_min_over_time(signup[5h])") === base + 4 * 3600.0)
  }

  test("double_exponential_smoothing matches the published recurrence; guards compose") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, h, "signup", 2.0, "a"),
      ev(1, 2 * h, "signup", 4.0, "a"),
      ev(2, 3 * h, "signup", 10.0, "a")
    ).toDF(eventCols: _*))
    // s0=2, b0=2; fold starts at y1=4: s1 = 0.5*4 + 0.5*(2+2) = 4,
    // b1 = 0.3*(4-2) + 0.7*2 = 2; then y2=10: s2 = 0.5*10 + 0.5*(4+2) = 8
    val v = Engine.eval(spark, dir,
      "double_exponential_smoothing(signup[5h], 0.5, 0.3)")
      .select($"value").as[Double].collect()
    assert(v.toSeq === Seq(8.0))
    // holt_winters is the 2.x alias
    assert(Engine.eval(spark, dir, "holt_winters(signup[5h], 0.5, 0.3)")
      .select($"value").as[Double].collect().toSeq === Seq(8.0))
    // single-sample series yield no row
    val dir2 = fixture("events" -> Seq(
      ev(0, h, "signup", 2.0, "a")).toDF(eventCols: _*))
    assert(Engine.eval(spark, dir2,
      "double_exponential_smoothing(signup[5h], 0.5, 0.3)").count() === 0)
    // compose-time: factor range and kind checks fire before any job
    assertThrows[PromQLCompileException] {
      Engine.eval(spark, dir, "double_exponential_smoothing(signup[5h], 1.5, 0.3)")
    }
    assertThrows[PromQLCompileException] {
      Engine.eval(spark, dir, "double_exponential_smoothing(purchase[5h], 0.5, 0.3)")
    }
    // tf = 1 is VALID upstream (only sf is strictly inside (0,1));
    // tf > 1 is not
    assert(Engine.eval(spark, dir,
      "double_exponential_smoothing(signup[5h], 0.5, 1)").count() > 0)
    assertThrows[PromQLCompileException] {
      Engine.eval(spark, dir, "double_exponential_smoothing(signup[5h], 0.5, 1.1)")
    }
  }

  test("mad_over_time is the interpolated median absolute deviation") {
    val h = 3600000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 1.0, "a"),
      ev(1, h, "signup", 5.0, "a"),
      ev(2, 2 * h, "signup", 5.0, "a"),
      ev(3, 3 * h, "signup", 2.0, "a"),
      ev(4, 4 * h, "signup", 9.0, "a")
    ).toDF(eventCols: _*))
    // samples {1,2,5,5,9}: median 5; |x−5| = {4,3,0,0,4} → median 3
    assert(Engine.eval(spark, dir, "mad_over_time(signup[5h])")
      .select($"value").as[Double].collect().toSeq === Seq(3.0))
    // even count {1,2,5,9}: median 3.5; |x−3.5| = {2.5,1.5,1.5,5.5} → 2.0
    val dir2 = fixture("events" -> Seq(
      ev(0, h, "signup", 1.0, "a"),
      ev(1, 2 * h, "signup", 2.0, "a"),
      ev(2, 3 * h, "signup", 5.0, "a"),
      ev(3, 4 * h, "signup", 9.0, "a")
    ).toDF(eventCols: _*))
    assert(Engine.eval(spark, dir2, "mad_over_time(signup[5h])")
      .select($"value").as[Double].collect().toSeq === Seq(2.0))
  }

  test("sort_by_label orders output by label value, validated at compose time") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "b"),
      ev(1, 0, "purchase", 2.0, "a"),
      ev(2, 0, "purchase", 3.0, "c")
    ).toDF(eventCols: _*))
    val asc = Engine.eval(spark, dir,
      """sort_by_label(sum by (k) (purchase), "k")""")
      .select($"label_k").as[String].collect()
    assert(asc.toSeq === Seq("a", "b", "c"))
    val desc = Engine.eval(spark, dir,
      """sort_by_label_desc(sum by (k) (purchase), "k")""")
      .select($"label_k").as[String].collect()
    assert(desc.toSeq === Seq("c", "b", "a"))
    // upstream natural order: digit runs compare numerically, so
    // pod2 < pod10 (lexicographic would invert them); mixed runs and
    // leading zeros stay deterministic via the raw-value tiebreak
    val natDir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "pod10"),
      ev(1, 0, "purchase", 2.0, "pod2"),
      ev(2, 0, "purchase", 3.0, "pod02"),
      ev(3, 0, "purchase", 4.0, "a9z"),
      ev(4, 0, "purchase", 5.0, "a10b")
    ).toDF(eventCols: _*))
    val nat = Engine.eval(spark, natDir,
      """sort_by_label(sum by (k) (purchase), "k")""")
      .select($"label_k").as[String].collect()
    assert(nat.toSeq === Seq("a9z", "a10b", "pod02", "pod2", "pod10"))
    // unknown label fails at compose time, before any job runs
    assertThrows[PromQLCompileException] {
      Engine.eval(spark, dir, """sort_by_label(sum by (k) (purchase), "nope")""")
    }
    // an outer sort overrides the inner label ordering (outermost wins)
    val overridden = Engine.eval(spark, dir,
      """sort_desc(sort_by_label(sum by (k) (purchase), "k"))""")
      .select($"value").as[Double].collect()
    assert(overridden.toSeq === overridden.sorted(Ordering[Double].reverse).toSeq)
  }

  test("det-math mode routes libm functions and binops through DetMath; default mode keeps JVM libm") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 2.0, "a"),
      ev(1, 1000, "signup", 7.5, "a"), // LWW winner for a
      ev(2, 0, "signup", 120.0, "b"),
      ev(3, 0, "signup", 0.25, "c")
    ).toDF(eventCols: _*))
    val DM = graft.functions.DetMath
    val lww = Map("a" -> 7.5, "b" -> 120.0, "c" -> 0.25)
    // scalar function: det mode is the b33b step sequence
    val lnDet = Engine.eval(spark, dir, "ln(signup)", detMath = true)
    assert(lnDet.queryExecution.analyzed.toString.contains("det_log2"),
      "det mode must compile ln through the native det_log2")
    val gotLn = lnDet.select($"label_k", $"value").as[(String, Double)]
      .collect().toMap
    lww.foreach { case (k, v) =>
      assert(gotLn(k) === DM.log2(v) * graft.operators.PromQL.Ln2, s"ln $k")
    }
    // binop ^: both pow dispatch branches
    val powDet = Engine.eval(spark, dir, "(signup - 5.5) ^ 3", detMath = true)
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    lww.foreach { case (k, v) =>
      assert(powDet(k) === DM.pow(v - 5.5, 3.0), s"pow $k")
    }
    // atan2 quadrant dispatch
    val at2 = Engine.eval(spark, dir, "signup atan2 (signup - 5.5)",
        detMath = true)
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    lww.foreach { case (k, v) =>
      assert(at2(k) === DM.atan2(v, v - 5.5), s"atan2 $k")
    }
    // default mode unchanged: upstream JVM-libm parity
    val lnLibm = Engine.eval(spark, dir, "ln(signup)")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    lww.foreach { case (k, v) =>
      assert(lnLibm(k) === Math.log(v), s"libm ln $k")
    }
  }

  test("plain comparison filters the left side, keeping its full labels and values") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 0, "purchase", 20.0, "b"),
      ev(2, 0, "click", 5.0, "a"),
      ev(3, 0, "click", 30.0, "b")
    ).toDF(eventCols: _*))
    val df = Engine.eval(spark, dir, "purchase > on(k, instance) click")
    // full LEFT label set survives — name included, not just the match key
    assert(df.columns.toSeq === Seq("name", "label_k", "label_instance", "value"))
    val rows = df.as[(String, String, String, Double)].collect().toSet
    assert(rows === Set(("purchase", "a", "i1", 10.0))) // b: 20 < 30 dropped
  }

  test("recorded series are selectable: view semantics, offsets, guards") {
    import graft.promql.Rules.RecordingRule
    val d = 86400000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 1 * d, "purchase", 5.0, "a"),
      ev(2, 2 * d, "purchase", 4.0, "b"),
      ev(3, 2 * d, "signup", 7.0, "a")
    ).toDF(eventCols: _*))
    val rules = Seq(RecordingRule("k_total", "sum by (k) (purchase)"))
    // the recorded name answers exactly like its expression
    val rec = Engine.eval(spark, dir, "k_total", recordingRules = rules)
      .as[(String, Double)].collect().toSeq
    val direct = Engine.eval(spark, dir, "sum by (k) (purchase)")
      .as[(String, Double)].collect().toSeq
    assert(rec === direct && rec === Seq(("a", 15.0), ("b", 4.0)))
    // post-hoc matchers; a label the rule aggregated away matches ""
    assert(Engine.eval(spark, dir, """k_total{k="a"}""",
      recordingRules = rules).as[(String, Double)].collect().toSeq ===
      Seq(("a", 15.0)))
    assert(Engine.eval(spark, dir, """k_total{instance="i9"}""",
      recordingRules = rules).count() === 0)
    assert(Engine.eval(spark, dir, """k_total{instance=""}""",
      recordingRules = rules).count() === 2)
    // offset: the rule evaluates at the shifted instant — identical to
    // offsetting inside the rule expression itself
    assert(Engine.eval(spark, dir, "k_total offset 1d",
      recordingRules = rules).as[(String, Double)].collect().toSeq ===
      Engine.eval(spark, dir, "sum by (k) (purchase offset 1d)")
        .as[(String, Double)].collect().toSeq)
    // rules compose (a rule over a rule); binary ops mix recorded + raw
    val nested = Seq(
      RecordingRule("k_total", "sum by (k) (purchase)"),
      RecordingRule("k_share", "k_total / scalar(sum(k_total))"))
    assert(Engine.eval(spark, dir, """k_share{k="b"}""",
      recordingRules = nested).as[(String, Double)].collect().toSeq ===
      Seq(("b", 4.0 / 19.0)))
    // guards: bare range vector refused; cycles refused; shadow refused
    val e1 = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "k_total[1d]", recordingRules = rules).collect())
    assert(e1.getMessage.contains("bare range vector"))
    val e2 = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "loop_a", recordingRules = Seq(
        RecordingRule("loop_a", "loop_b + 1"),
        RecordingRule("loop_b", "loop_a + 1"))).collect())
    assert(e2.getMessage.contains("self-referential"))
    val e3 = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "purchase", recordingRules = Seq(RecordingRule("purchase", "signup"))))
    assert(e3.getMessage.contains("shadows"))
    // the HTTP server's standing rule file serves recorded names
    val server = graft.sources.QueryEndpoint.start(spark, dir,
      recordingRules = rules)
    try {
      val conn = new java.net.URL(
        s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/query?" +
          s"query=${java.net.URLEncoder.encode("sum(k_total)", "UTF-8")}")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val body = try new String(conn.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally conn.disconnect()
      assert(body.contains("\"19\"") || body.contains("\"19.0\""),
        s"recorded name served over HTTP: $body")
    } finally server.stop(0)
  }

  test("range selectors over recorded series: the rule-loop sample grid") {
    import graft.promql.Rules.RecordingRule
    val d = 86400000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 1 * d, "purchase", 5.0, "a"),
      ev(2, 2 * d, "purchase", 4.0, "b"),
      ev(3, 1 * d, "signup", 7.0, "a"),
      ev(4, 2 * d, "signup", 3.0, "a")
    ).toDF(eventCols: _*))
    val rules = Seq(
      RecordingRule("k_total", "sum by (k) (purchase)", intervalS = 86400))
    def ev1(q: String, rs: Seq[RecordingRule] = rules): Seq[(String, Double)] =
      Engine.eval(spark, dir, q, recordingRules = rs)
        .as[(String, Double)].collect().toSeq.sortBy(_._1)
    // the flagship identity: rate over the recorded sum ≡ sum of raw
    // rates, bit-exact — including series BORN inside the window (b's
    // whole mass accumulated in-window and counts)
    assert(ev1("rate(k_total[2d])") === ev1("sum by (k) (rate(purchase[2d]))"))
    assert(ev1("rate(k_total[2d])") ===
      Seq(("a", 5.0 / 172800), ("b", 4.0 / 172800)))
    assert(ev1("increase(k_total[2d])") === Seq(("a", 5.0), ("b", 4.0)))
    // view semantics where they DIFFER from raw: the rule loop writes a
    // sample at every instant, so a series quiet inside the window is
    // PRESENT with increase 0 (raw has no in-window events → absent)
    assert(ev1("increase(k_total[1d])") === Seq(("a", 0.0), ("b", 4.0)))
    assert(ev1("sum by (k) (increase(purchase[1d]))") === Seq(("b", 4.0)))
    // *_over_time over the written samples (instants 1d and 2d — the
    // left-open window excludes the T−2d sample)
    assert(ev1("sum_over_time(k_total[2d])") === Seq(("a", 30.0), ("b", 4.0)))
    assert(ev1("avg_over_time(k_total[2d])") === Seq(("a", 15.0), ("b", 4.0)))
    assert(ev1("count_over_time(k_total[2d])") === Seq(("a", 2.0), ("b", 1.0)))
    assert(ev1("min_over_time(k_total[2d])") === Seq(("a", 15.0), ("b", 4.0)))
    assert(ev1("last_over_time(k_total[2d])") === Seq(("a", 15.0), ("b", 4.0)))
    assert(ev1("present_over_time(k_total[2d])") === Seq(("a", 1.0), ("b", 1.0)))
    // post-hoc matchers, aggregated-away-label-matches-"" rule
    assert(ev1("""rate(k_total{k="a"}[2d])""") === Seq(("a", 5.0 / 172800)))
    assert(ev1("""rate(k_total{instance=""}[2d])""").map(_._1) === Seq("a", "b"))
    assert(ev1("""rate(k_total{instance="i9"}[2d])""") === Seq.empty)
    // offset composes onto the grid anchor exactly like the raw window
    assert(ev1("rate(k_total[1d] offset 1d)") ===
      ev1("sum by (k) (rate(purchase[1d] offset 1d))"))
    assert(ev1("rate(k_total[1d] offset 1d)") === Seq(("a", 5.0 / 86400)))
    // aggregation composes on top of a recorded range (the deferred
    // rate division rides through the sum: exact (5+4)/172800, not
    // 5/172800 + 4/172800 — the raw-rate convention)
    assert(Engine.eval(spark, dir, "sum(rate(k_total[2d]))",
      recordingRules = rules).as[Double].collect().toSeq ===
      Seq(9.0 / 172800))
    // the union fallback: a rule shape the counter grid cannot serve
    // (scalar arithmetic) re-derives per-instant vectors and walks the
    // same reset-aware grid — exact through DECIMAL(38,12)
    val half = rules :+ RecordingRule("k_half",
      "sum by (k) (purchase) / 2", intervalS = 86400)
    assert(ev1("rate(k_half[2d])", half) ===
      Seq(("a", 2.5 / 172800), ("b", 2.0 / 172800)))
    // delta over a recorded GAUGE rule: last − first of the written
    // samples (LWW at 1d → 7, at 2d → 3; a 1d window holds ONE sample
    // → delta 0, the single-sample rule)
    val gRule = Seq(RecordingRule("s_last", "signup", intervalS = 86400))
    assert(Engine.eval(spark, dir, "delta(s_last[2d])",
      recordingRules = gRule).select("value")
      .as[Double].collect().toSeq === Seq(3.0 - 7.0))
    assert(Engine.eval(spark, dir, "delta(s_last[1d])",
      recordingRules = gRule).select("value")
      .as[Double].collect().toSeq === Seq(0.0))
    // guards: non-multiple range; unsupported function; cycle; interval
    val e1 = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "rate(k_total[36h])", recordingRules = rules).collect())
    assert(e1.getMessage.contains("multiple of its evaluation interval"))
    // a RANGE function without a [range] is the compose-time error,
    // never a raw None.get
    val e1b = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "rate(k_total)", recordingRules = rules).collect())
    assert(e1b.getMessage.contains("requires a range selector"))
    // the one remaining recorded-range refusal (quantile/mad/stddev/
    // ts_of_* all serve now — their own spec below): the inherently
    // iterative smoothing function
    val e2 = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "double_exponential_smoothing(k_total[2d], 0.5, 0.5)",
      recordingRules = rules).collect())
    assert(e2.getMessage.contains("recorded series"))
    val e3 = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "loop_r", recordingRules = Seq(
        RecordingRule("loop_r", "rate(loop_r[1d])", intervalS = 86400))).collect())
    assert(e3.getMessage.contains("self-referential"))
    val e4 = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "z_bad", recordingRules = Seq(RecordingRule("z_bad", "purchase", 0))))
    assert(e4.getMessage.contains("interval must be positive"))
  }

  test("recorded-range exotic tail: deriv/predict_linear/irate/idelta on the rule lattice") {
    import graft.promql.Rules.RecordingRule
    val d = 86400000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 1 * d, "purchase", 5.0, "a"),
      ev(2, 2 * d, "purchase", 4.0, "b"),
      ev(3, 1 * d, "signup", 7.0, "a"),
      ev(4, 2 * d, "signup", 3.0, "a")
    ).toDF(eventCols: _*))
    val rules = Seq(
      RecordingRule("k_total", "sum by (k) (purchase)", intervalS = 86400))
    def ev1(q: String, rs: Seq[RecordingRule] = rules): Seq[(String, Double)] =
      Engine.eval(spark, dir, q, recordingRules = rs)
        .as[(String, Double)].collect().toSeq.sortBy(_._1)
    // deriv fits the lattice's cumulative cents snapshots (a's points:
    // (1d, 1000), (2d, 1500), (3d-anchored grid x = i·86400): slope =
    // (nΣxy − ΣxΣy)/(nΣxx − Σx²) with the exact integer sums below;
    // b exists at ONE instant only → zero x-variance → absent
    // (upstream's degenerate-fit rule)
    val u = 86400.0
    val slope = (129600000.0 / 44789760000.0) // 1500u / 6u² cents/s
    assert(ev1("deriv(k_total[3d])") === Seq(("a", slope / 100.0)))
    // predict_linear = the same fit extrapolated to T + 12h, every
    // double op in the engine's order
    val predicted =
      ((4000.0 - slope * (6.0 * u)) / 3.0 + slope * (3.0 * u + 43200.0)) / 100.0
    assert(ev1("predict_linear(k_total[3d], 43200)") ===
      Seq(("a", predicted)))
    // irate = the last two lattice instants; offset composes; a series
    // born at the final instant has one sample → absent
    assert(ev1("irate(k_total[2d] offset 1d)") === Seq(("a", 5.0 / 86400)))
    // a quiet final interval reads 0 (the written samples are equal)
    assert(ev1("irate(k_total[2d])") === Seq(("a", 0.0)))
    // g == 1: a single in-window sample can never make a pair → empty
    assert(ev1("irate(k_total[1d])") === Seq.empty)
    // recorded series are UNTYPED floats upstream — irate reads any
    // rule reset-aware (a decreasing gauge rule reads as post-reset
    // mass), idelta reads last − previous
    val gRule = Seq(RecordingRule("s_last", "signup", intervalS = 86400))
    assert(Engine.eval(spark, dir, "irate(s_last[2d])",
      recordingRules = gRule).select("value").as[Double].collect().toSeq
      === Seq(3.0 / 86400))
    assert(Engine.eval(spark, dir, "idelta(s_last[2d])",
      recordingRules = gRule).select("value").as[Double].collect().toSeq
      === Seq(3.0 - 7.0))
    // post-hoc matchers ride the shared transform
    assert(ev1("""deriv(k_total{k="zz"}[3d])""") === Seq.empty)
    // the cents walk needs a cents-exact rule shape: derived-value
    // rules (scalar arithmetic → 12-decimal values) refuse loudly
    val half = rules :+ RecordingRule("k_half",
      "sum by (k) (purchase) / 2", intervalS = 86400)
    val e1 = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "deriv(k_half[2d])", recordingRules = half).collect())
    assert(e1.getMessage.contains("sum-by rule shape"))
    // histogram_quantile over a recorded name teaches the upstream
    // rule idiom (record the bucket series with their le labels)
    val e2 = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "histogram_quantile(0.9, k_total)", recordingRules = rules).collect())
    assert(e2.getMessage.contains("sum by (le)"))
    // changes/resets count adjacent in-window lattice pairs, exact
    // DECIMAL comparisons, any rule shape. a's cumsum: 1000@0d,
    // 1500@1d, 1500@2d — a [2d] window holds samples at 1d and 2d
    // (one pair, unchanged? no: 1500 = 1500 → 0 changes); [3d] holds
    // 0d..2d (pairs (0d,1d) changed + (1d,2d) unchanged → 1). b born
    // at 2d: single sample → present with 0.
    assert(ev1("changes(k_total[3d])") === Seq(("a", 1.0), ("b", 0.0)))
    assert(ev1("changes(k_total[2d])") === Seq(("a", 0.0), ("b", 0.0)))
    // monotone counter-sum rules never reset
    assert(ev1("resets(k_total[3d])") === Seq(("a", 0.0), ("b", 0.0)))
    // a decreasing gauge rule resets: s_last 7@1d → 3@2d
    assert(Engine.eval(spark, dir, "resets(s_last[2d])",
      recordingRules = gRule).select("value").as[Double].collect().toSeq
      === Seq(1.0))
    assert(Engine.eval(spark, dir, "changes(s_last[2d])",
      recordingRules = gRule).select("value").as[Double].collect().toSeq
      === Seq(1.0))
    // derived-value rules serve too (exact decimal comparisons need no
    // cents): the halved rule still changes once over [3d]
    assert(ev1("changes(k_half[3d])", half) === Seq(("a", 1.0), ("b", 0.0)))
  }

  test("recorded exotic over-time tail: quantile/stddev/mad/ts_of_* on the rule lattice") {
    import graft.promql.Rules.RecordingRule
    val d = 86400000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"),
      ev(1, 1 * d, "purchase", 5.0, "a"),
      ev(2, 2 * d, "purchase", 2.0, "a"),
      ev(3, 2 * d, "purchase", 4.0, "b")
    ).toDF(eventCols: _*))
    val rules = Seq(
      RecordingRule("k_total", "sum by (k) (purchase)", intervalS = 86400))
    def ev1(q: String, rs: Seq[RecordingRule] = rules): Seq[(String, Double)] =
      Engine.eval(spark, dir, q, recordingRules = rs)
        .as[(String, Double)].collect().toSeq.sortBy(_._1)
    // a's lattice cents over [3d]: 1000@T−2d, 1500@T−1d, 1700@T;
    // b is born at T (one sample). The anchor T = the corpus instant.
    val tS = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000.0 +
      2.0 * 86400.0
    // quantile at φ=0.25: pos = (3−1)·0.25 = 0.5 interpolates rn1/rn2
    // → (1000 + (1500−1000)·0.5)/100; a single sample reads itself
    assert(ev1("quantile_over_time(0.25, k_total[3d])") ===
      Seq(("a", 12.5), ("b", 4.0)))
    // stddev/stdvar: exact cents moments, the engine's double order
    val mean = 4200.0 / 3.0
    val varCents = 6140000.0 / 3.0 - mean * mean
    assert(ev1("stddev_over_time(k_total[3d])") ===
      Seq(("a", math.sqrt(varCents) / 100.0), ("b", 0.0)))
    assert(ev1("stdvar_over_time(k_total[3d])") ===
      Seq(("a", varCents / 10000.0), ("b", 0.0)))
    // mad: median 1500 (pos = 1.0), devs {500, 0, 200} → sorted middle
    // dev = 200 cents
    assert(ev1("mad_over_time(k_total[3d])") === Seq(("a", 2.0), ("b", 0.0)))
    // ts_of_*: the rule loop's write timestamps come back — max sits at
    // the final instant for both series; min at a's first in-window
    // instant; offset shifts the recovered anchor with the window
    assert(ev1("ts_of_max_over_time(k_total[3d])") ===
      Seq(("a", tS), ("b", tS)))
    assert(ev1("ts_of_last_over_time(k_total[3d])") ===
      Seq(("a", tS), ("b", tS)))
    assert(ev1("ts_of_min_over_time(k_total[3d])") ===
      Seq(("a", tS - 2.0 * 86400.0), ("b", tS)))
    assert(ev1("ts_of_max_over_time(k_total[2d] offset 1d)") ===
      Seq(("a", tS - 86400.0)))
    // ties break LATEST (upstream replaces the running extremum on >=):
    // a constant-zero BINOP rule — also the union (any-shape) arm —
    // attains its max at every instant, so the final one wins
    val zero = Seq(RecordingRule("k_zero",
      "sum by (k) (purchase) - sum by (k) (purchase)", intervalS = 86400))
    assert(ev1("ts_of_max_over_time(k_zero[3d])", zero) ===
      Seq(("a", tS), ("b", tS)))
    // the rank/moment walks need exact cents → derived-value rules
    // refuse loudly; ts_of_* compare the rule's own DECIMAL values and
    // serve any shape
    val half = rules :+ RecordingRule("k_half",
      "sum by (k) (purchase) / 2", intervalS = 86400)
    val e = intercept[PromQLCompileException](Engine.eval(spark, dir,
      "quantile_over_time(0.5, k_half[2d])", recordingRules = half).collect())
    assert(e.getMessage.contains("sum-by rule shape"))
    assert(ev1("ts_of_max_over_time(k_half[3d])", half) ===
      Seq(("a", tS), ("b", tS)))
    // post-hoc matchers ride the shared transform
    assert(ev1("""stddev_over_time(k_total{k="a"}[3d])""") ===
      Seq(("a", math.sqrt(varCents) / 100.0)))
  }
}
