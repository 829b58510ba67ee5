package graft

import graft.operators.{Metrics, PromQL}

/** Tier-A semantics against the reference-scenario fixture
  * (FIXTURES.md §1): replay `test.edn`'s workload — 3 series of one
  * counter family, +1/+2/+4 per 0.2 s tick — and assert the documented
  * snapshot/rate outcomes, plus gauge and histogram unit semantics.
  */
class MetricsSpec extends SparkTestBase {
  import spark.implicits._

  private val Ticks = 50



  /** test.edn replay: tick i at t0+0.2s*i; Value1 +1, Value2 +2 (two +1
    * events), Value3 +4 (four +1 events); 'click' → counter kind.
    */
  private lazy val tickFixture: String = {
    val rows = (0 until Ticks).flatMap { i =>
      val ms = i * 200L
      val base = i * 7L
      Seq(ev(base, ms, "click", 1.0, "Value1")) ++
        (0 until 2).map(j => ev(base + 1 + j, ms, "click", 1.0, "Value2")) ++
        (0 until 4).map(j => ev(base + 3 + j, ms, "click", 1.0, "Value3"))
    }
    fixture("events" -> rows.toDF(eventCols: _*))
  }

  test("counter snapshot accumulates 1:2:4 like the reference workload") {
    val snap = Metrics.counterSnapshot(spark, tickFixture)
      .filter($"name" === "click")
      .select($"label_k", $"value").as[(String, Double)].collect().toMap
    assert(snap === Map("Value1" -> Ticks.toDouble,
      "Value2" -> 2.0 * Ticks, "Value3" -> 4.0 * Ticks))
  }

  test("negative counter increments are rejected by the validation filter") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "click", 5.0, "a"),
      ev(1, 0, "click", -3.0, "a")).toDF(eventCols: _*))
    val snap = Metrics.counterSnapshot(spark, dir)
    assert(snap.select("value").as[Double].collect().toSeq === Seq(5.0))
    // hard-fail variant mirrors ActivationError (prometheus.cpp:210-211)
    val ex = intercept[Exception] {
      Metrics.validatedCounterEvents(spark, dir).collect()
    }
    assert(ex.getMessage.contains("counter increment must be >= 0"))
  }

  test("gauge snapshot is last-write-wins with event_id tiebreak") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 10.0, "a"),
      ev(1, 60000, "signup", 20.0, "a"),
      ev(2, 60000, "signup", 30.0, "a") // same ts, higher id wins
    ).toDF(eventCols: _*))
    val v = Metrics.gaugeSnapshot(spark, dir).select("value").as[Double].collect()
    assert(v.toSeq === Seq(30.0))
  }

  test("histogram buckets are cumulative and bounded by count") {
    // 'error' → histogram kind; boundaries 1,5,10,25,50,100,150
    val obs = Seq(0.5, 3.0, 7.0, 20.0, 40.0, 80.0, 120.0, 200.0)
    val dir = fixture("events" -> obs.zipWithIndex.map { case (v, i) =>
      ev(i.toLong, 0, "error", v, "h")
    }.toDF(eventCols: _*))
    val rows = Metrics.histogramSnapshot(spark, dir)
      .orderBy("le").select("le", "cum_count", "count")
      .as[(Double, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(1.0, 5.0, 10.0, 25.0, 50.0, 100.0, 150.0))
    assert(rows.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)) // 200.0 overflows
    assert(rows.forall(r => r._2 <= r._3 && r._3 == obs.size))
  }

  test("exposition serves counter, gauge and histogram _sum/_count series") {
    val dir = fixture("events" -> (Seq(
      ev(0, 0, "click", 2.0, "a"),
      ev(1, 0, "signup", 7.0, "a")) ++
      Seq(ev(2, 0, "error", 3.0, "h"), ev(3, 0, "error", 9.0, "h"))
    ).toDF(eventCols: _*))
    val rows = Metrics.exposition(spark, dir)
      .select($"name", $"value").as[(String, Double)].collect().toMap
    assert(rows("click") === 2.0)
    assert(rows("signup") === 7.0)
    assert(rows("error_sum") === 12.0)
    assert(rows("error_count") === 2.0)
  }

  test("rate over the tick fixture recovers the accumulated totals") {
    // All increments fall inside one hour; the first sample's delta is
    // its own value, so sum(delta) = final accumulated value.
    val r = PromQL.rate(spark, tickFixture)
      .select($"label_k", $"rate").as[(String, Double)].collect().toMap
    assert(math.abs(r("Value1") - Ticks / 3600.0) < 1e-9)
    assert(math.abs(r("Value2") - 2.0 * Ticks / 3600.0) < 1e-9)
    assert(math.abs(r("Value3") - 4.0 * Ticks / 3600.0) < 1e-9)
  }

  test("rate compensates counter resets (decrease => counter restarted)") {
    // One series crossing the 1000.00 wrap: increments of 600 then 600
    // produce cumulative 600, 1200→wrapped 200 (reset). Reset rule says
    // increase = 600 + 200 = 800 (the wrap loses 1000 by construction —
    // what matters is the rule: delta after reset = current value).
    val dir = fixture("events" -> Seq(
      ev(0, 0, "click", 600.0, "w"),
      ev(1, 1000, "click", 600.0, "w")).toDF(eventCols: _*))
    val r = PromQL.rate(spark, dir).select("rate").as[Double].collect()
    assert(math.abs(r.head - 800.0 / 3600.0) < 1e-9)
  }

  test("passthrough tap leaves rows untouched and captures metrics (A5)") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "click", 5.0, "a"), ev(1, 0, "click", 7.0, "b")).toDF(eventCols: _*))
    val base = Metrics.metricEvents(spark, dir)
    val obs = new org.apache.spark.sql.Observation("a5_spec_tap")
    val tapped = base.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("n_rows"))
    // identity: same rows, same schema, nothing added to the plan
    assert(tapped.schema === base.schema)
    assert(tapped.collect().toSeq === base.collect().toSeq)
    assert(obs.get("n_rows") === 2L)
    // the named-tap variant used by the a5 query is also an identity
    val named = Metrics.passthrough(base, "a5_spec_named")
    assert(named.collect().toSeq === base.collect().toSeq)
  }

  test("mistyped events input fails at compose time with the A7 check") {
    import spark.implicits._
    val bad = Seq((1L, "click")).toDF("event_id", "event_type") // no ts/value/props
    val e = intercept[IllegalArgumentException] {
      Metrics.metricEventsOf(bad)
    }
    assert(e.getMessage.contains("expected timestamp"))
    assert(e.getMessage.contains("<absent>"))
  }

  test("DetMath.exp2: ~ulp accuracy vs StrictMath, exact at integers, Column mirror identical") {
    import graft.functions.DetMath
    // dense sweep over the native-histogram exponent range
    val xs = (-12000 to 16000).map(_ / 1000.0) ++
      Seq(-10.0, -1.0, 0.0, 1.0, 10.0, 15.0, 0.125, -0.125)
    for (x <- xs) {
      val got = DetMath.exp2(x)
      val ref = StrictMath.pow(2.0, x)
      assert(math.abs(got - ref) <= 4 * Math.ulp(ref),
        s"exp2($x)=$got vs strict $ref")
    }
    // integer exponents are EXACT (u = 0, P(0) = 1, 2^e exact)
    for (k <- -30 to 30)
      assert(DetMath.exp2(k.toDouble) === StrictMath.pow(2.0, k.toDouble), s"k=$k")
    // the Spark Column mirror runs the identical pinned step sequence
    val df = xs.toDF("x").select($"x", DetMath.exp2Col($"x").as("e"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) === DetMath.exp2(r.getDouble(0)),
        s"column mirror diverges at x=${r.getDouble(0)}")
    }
    // the SQL mirror embeds the same literal tables (spot the text)
    val sql = DetMath.exp2Sql("xq")
    assert(sql.contains("FLOOR(xq * 32.0)") && sql.contains("pow(2.0,"))
  }

  test("DetMath.log2: tight absolute error, exact at powers of two, Column mirror identical") {
    import graft.functions.DetMath
    val ln2 = StrictMath.log(2.0)
    // probability-shaped sweep (the x76 domain) + wide magnitudes
    val xs = (1 to 40000).map(_ / 1000.0) ++
      (1 to 200).map(k => 1.0 / (k * k + 1)) ++
      Seq(1e-9, 1e-6, 0.5, 1.0, 2.0, 1.5, 1024.0, 3e7)
    for (x <- xs) {
      val got = DetMath.log2(x)
      val ref = StrictMath.log(x) / ln2
      assert(math.abs(got - ref) <= 1e-12,
        s"log2($x)=$got vs strict $ref")
    }
    for (k <- -40 to 40)
      assert(DetMath.log2(StrictMath.pow(2.0, k.toDouble)) === k.toDouble, s"k=$k")
    // round trip through the deterministic pair stays within score noise
    for (x <- Seq(0.001, 0.3, 7.5, 4000.0))
      assert(math.abs(DetMath.exp2(DetMath.log2(x)) - x) / x < 1e-9, s"x=$x")
    val df = xs.toDF("x").select($"x", DetMath.log2Col($"x").as("l"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) === DetMath.log2(r.getDouble(0)),
        s"column mirror diverges at x=${r.getDouble(0)}")
    }
    // the NATIVE codegen'd expressions are the same pinned scalars by
    // construction — assert it anyway through a real plan
    val nat = xs.toDF("x").select($"x",
      graft.plans.DetMathExprs.detLog2(spark, "x").as("l"),
      graft.plans.DetMathExprs.detExp2(spark, "x").as("e"))
    nat.collect().foreach { r =>
      assert(r.getDouble(1) === DetMath.log2(r.getDouble(0)))
      assert(r.getDouble(2) === DetMath.exp2(r.getDouble(0)))
    }
  }

  test("DetMath.sin/cos: tight accuracy vs StrictMath over the fixture range, pythagorean law, native exprs identical") {
    import graft.functions.DetMath
    // the gauge snapshot domain (|x| <= 500 → |k| <= 320, Cody-Waite
    // products exact) plus quadrant-boundary and tiny arguments
    val xs = (-5000 to 5000).map(_ / 10.0) ++
      (0 to 400).map(k => k * StrictMath.PI / 4.0) ++
      Seq(0.0, 1e-9, -1e-9, 0.5, -0.5, 1.0, 490.02, -490.02)
    for (x <- xs) {
      val gs = DetMath.sin(x)
      val gc = DetMath.cos(x)
      assert(math.abs(gs - StrictMath.sin(x)) <= 1e-13,
        s"sin($x)=$gs vs strict ${StrictMath.sin(x)}")
      assert(math.abs(gc - StrictMath.cos(x)) <= 1e-13,
        s"cos($x)=$gc vs strict ${StrictMath.cos(x)}")
      assert(math.abs(gs * gs + gc * gc - 1.0) <= 5e-14, s"pyth $x")
    }
    assert(DetMath.sin(0.0) === 0.0)
    assert(DetMath.cos(0.0) === 1.0)
    assert(DetMath.sin(Double.NaN).isNaN)
    assert(DetMath.sin(Double.PositiveInfinity).isNaN)
    // r10 ask #8: past the exact-product bound (|k| > 2^20) the
    // reduction would silently drift — the tier fails LOUD instead of
    // degrading; at and inside the bound it still answers accurately
    val bound = DetMath.SinCosDomainMax
    assert(math.abs(DetMath.sin(bound) - StrictMath.sin(bound)) <= 1e-9)
    assert(math.abs(DetMath.cos(-bound) - StrictMath.cos(-bound)) <= 1e-9)
    for (bad <- Seq(bound * 1.0000001, -bound * 2, 1e9)) {
      val e = intercept[IllegalArgumentException](DetMath.sin(bad))
      assert(e.getMessage.contains("Cody-Waite"))
      intercept[IllegalArgumentException](DetMath.cos(bad))
    }
    // infinities keep their NaN semantics — the guard is for finite
    // phases only
    assert(DetMath.cos(Double.NegativeInfinity).isNaN)
    // the native codegen'd expressions ARE the same pinned scalars —
    // assert through a real plan anyway
    graft.plans.DetMathExprs.register(spark)
    val nat = xs.toDF("x").selectExpr("x", "det_sin(x) AS s", "det_cos(x) AS c")
    nat.collect().foreach { r =>
      assert(r.getDouble(1) === DetMath.sin(r.getDouble(0)))
      assert(r.getDouble(2) === DetMath.cos(r.getDouble(0)))
    }
  }

  test("DetMath.atan: accuracy vs StrictMath incl. inversion branch, asin identity edges, native expr identical") {
    import graft.functions.DetMath
    val xs = (-4000 to 4000).map(_ / 100.0) ++
      (1 to 100).map(k => 1.0 / k) ++
      Seq(0.0, 1.0, -1.0, 0.999, 1.001, 1e-12, 1e6, -1e6, 490.02)
    for (x <- xs) {
      val got = DetMath.atan(x)
      assert(math.abs(got - StrictMath.atan(x)) <= 1e-14,
        s"atan($x)=$got vs strict ${StrictMath.atan(x)}")
    }
    assert(DetMath.atan(0.0) === 0.0)
    assert(DetMath.atan(Double.PositiveInfinity) === DetMath.HalfPi)
    assert(DetMath.atan(Double.NegativeInfinity) === -DetMath.HalfPi)
    assert(DetMath.atan(Double.NaN).isNaN)
    // asin u = atan(u/sqrt(1-u^2)) — the b34b composition — tracks
    // StrictMath.asin over the open domain
    for (u <- (-99 to 99).map(_ / 100.0)) {
      val z = u / math.sqrt(1.0 - u * u)
      assert(math.abs(DetMath.atan(z) - StrictMath.asin(u)) <= 1e-13, s"asin $u")
    }
    graft.plans.DetMathExprs.register(spark)
    val nat = xs.toDF("x").selectExpr("x", "det_atan(x) AS a")
    nat.collect().foreach { r =>
      assert(r.getDouble(1) === DetMath.atan(r.getDouble(0)))
    }
  }

  test("DetMath.pow/atan2: accuracy vs StrictMath, full dispatch coverage, Column mirrors identical") {
    import graft.functions.DetMath
    // pow: positive-base accuracy (the exp2∘log2 composition compounds
    // both absolute errors — bound is log2's 1e-12 scaled by the result)
    for (l <- Seq(0.5, 1.5, 2.0, 7.3, 100.0, 490.02); r <- Seq(-2.5, -1.0, 0.0, 0.5, 1.0, 2.5, 3.0)) {
      val got = DetMath.pow(l, r)
      val ref = StrictMath.pow(l, r)
      assert(math.abs(got - ref) <= 1e-11 * math.max(1.0, math.abs(ref)),
        s"pow($l,$r)=$got vs strict $ref")
    }
    // dispatch: zero base exact; negative base integer exponent signed;
    // fractional exponent on negative base NaN; NaN propagates
    assert(DetMath.pow(0.0, 2.0) === 0.0)
    assert(DetMath.pow(0.0, 0.0) === 1.0)
    assert(DetMath.pow(0.0, -2.0) === Double.PositiveInfinity)
    assert(math.abs(DetMath.pow(-2.0, 3.0) - -8.0) <= 1e-11 * 8)
    assert(math.abs(DetMath.pow(-2.0, 2.0) - 4.0) <= 1e-11 * 4)
    assert(DetMath.pow(-2.0, 2.5).isNaN)
    assert(DetMath.pow(Double.NaN, 2.0).isNaN && DetMath.pow(2.0, Double.NaN).isNaN)
    // atan2: quadrants, axes, accuracy
    for (y <- Seq(-3.0, -0.5, 0.0, 0.5, 3.0); x <- Seq(-2.0, -0.5, 0.0, 0.5, 2.0)) {
      val got = DetMath.atan2(y, x)
      val ref = StrictMath.atan2(y, x)
      assert(math.abs(got - ref) <= 1e-13, s"atan2($y,$x)=$got vs strict $ref")
    }
    assert(DetMath.atan2(0.0, 0.0) === 0.0)
    assert(DetMath.atan2(Double.NaN, 1.0).isNaN)
    // Column mirrors run the identical dispatch through the natives
    graft.plans.DetMathExprs.register(spark)
    val pairs = for (l <- Seq(-2.0, 0.0, 0.5, 7.3); r <- Seq(-2.5, 0.0, 2.0, 3.0)) yield (l, r)
    val dfp = pairs.toDF("l", "r").select($"l", $"r",
      graft.plans.DetMathExprs.detPowC($"l", $"r").as("p"),
      graft.plans.DetMathExprs.detAtan2C($"l", $"r").as("a"))
    dfp.collect().foreach { row =>
      val (l, r) = (row.getDouble(0), row.getDouble(1))
      val (gp, ga) = (row.getDouble(2), row.getDouble(3))
      val (sp, sa) = (DetMath.pow(l, r), DetMath.atan2(l, r))
      assert(gp === sp || (gp.isNaN && sp.isNaN), s"powC($l,$r)=$gp vs scalar $sp")
      assert(ga === sa || (ga.isNaN && sa.isNaN), s"atan2C($l,$r)=$ga vs scalar $sa")
    }
  }

  test("native histogram: merge laws, wire round-trip, bucket bounds, quantiles") {
    val agg = new graft.functions.NativeHistogramAggregator(3)
    // includes exact bucket upper bounds (2^(4/8), 2, 4) — float
    // rounding of log2(v)*2^s once mis-bucketed these one bucket up
    val vals = Seq(0.0, 0.01, 0.5, 1.0, 1.0, 2.5, 7.0, 42.0, 42.0, 42.0,
      199.99, 1500.0, 0.0, StrictMath.sqrt(2.0), 2.0, 4.0,
      StrictMath.pow(2.0, 3.0 / 8.0))
    // sequential fold vs arbitrary split-merge: identical INTEGER state
    // (the hash-gated fields); the compensated float pair may move by
    // ulps with merge order — bounded below, never hash-gated
    val whole = vals.foldLeft(agg.zero)(agg.reduce)
    val exactSum = vals.map(BigDecimal(_)).sum.toDouble
    for (cut <- Seq(1, 4, 7, 12)) {
      val (a, b) = vals.splitAt(cut)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(merged.copy(sumF = 0, sumC = 0) === whole.copy(sumF = 0, sumC = 0),
        s"cut $cut")
      assert(math.abs((merged.sumF - merged.sumC) - exactSum) <=
        2e-16 * vals.map(math.abs).sum, s"cut $cut float sum")
    }
    // r10 ask #3 laws: sum_float carries the Prometheus float semantic
    // within the Kahan bound; sum (exact cents) stays within the
    // quantization bound of it
    val sk = agg.finish(whole)
    assert(math.abs(sk.sum_float - exactSum) <= 2e-16 * vals.map(math.abs).sum)
    assert(math.abs(sk.sum - sk.sum_float) <= 0.005 * sk.count)
    // non-cent observations: sum_float resolves what cents quantize
    // (√2 + 2^(3/8) are not 2-decimal) — the two fields genuinely differ
    assert(sk.sum !== sk.sum_float)
    assert(whole.zero === 2L && whole.count === vals.length.toLong)
    // every positive observation lies in its bucket's (lo, hi] range
    for (v <- vals.filter(_ > 0)) {
      val i = agg.bucketIndex(v)
      assert(v > agg.bucketLow(i) && v <= agg.bucketHigh(i),
        s"v=$v i=$i (${agg.bucketLow(i)}, ${agg.bucketHigh(i)}]")
    }
    // wire shape round-trips, including multi-span gaps
    val (off, len, del) = agg.encode(whole.buckets)
    assert(agg.decode(off, len, del) === whole.buckets)
    assert(off.length === len.length && del.length === whole.buckets.size)
    assert(len.sum === whole.buckets.size)
    // FOREIGN scrape payloads the engine's own encoder never produces:
    // a zero-length leading span consumes no deltas but still anchors
    // the absolute index — the NEXT span's offset is relative to its
    // end (5 + 2 = 7), never re-read as absolute (which would land the
    // run at index 2)
    assert(agg.decode(Seq(5, 2), Seq(0, 3), Seq(2L, 1L, -1L)) ===
      Map(7 -> 2L, 8 -> 3L, 9 -> 2L))
    // zero-length INTERIOR span: same anchoring rule mid-stream
    assert(agg.decode(Seq(1, 3, 2), Seq(2, 0, 1), Seq(4L, -2L, 5L)) ===
      Map(1 -> 4L, 2 -> 2L, 8 -> 7L))
    // quantiles: monotone in phi, inside the observed range, zero-bucket exact
    val qs = Seq(0.0, 0.1, 0.5, 0.9, 0.99, 1.0).map(agg.quantile(whole, _))
    assert(qs === qs.sorted)
    assert(agg.quantile(whole, 0.1) === 0.0) // rank 1.3 of 13 falls in the 2-count zero bucket
    assert(qs.last <= agg.bucketHigh(agg.bucketIndex(1500.0)) * (1 + 1e-9))
    // relative error bound: each quantile within one bucket factor of
    // the exact order statistic
    val sortedVals = vals.sorted
    for (phi <- Seq(0.5, 0.9, 0.99)) {
      val exact = sortedVals(math.ceil(phi * vals.length).toInt - 1)
      val est = agg.quantile(whole, phi)
      val base = agg.bucketHigh(1) / agg.bucketLow(1)
      assert(est <= exact * base * (1 + 1e-9) && est >= exact / base * (1 - 1e-9),
        s"phi=$phi exact=$exact est=$est")
    }
    // the registered query runs end-to-end and is partition-stable
    val df = Metrics.nativeHistogramSnapshot(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq === Seq("name", "label_k", "schema", "zero_count",
      "count", "sum", "n_buckets", "n_spans", "p50", "p90", "p99"))
  }

  test("b37c: relational ingest of foreign payloads matches the JVM codec") {
    val agg = new graft.functions.NativeHistogramAggregator(Metrics.NhSchema)
    // the registered query's literal payloads, decoded independently by
    // the JVM scrape-side codec — the relational span walk must agree
    // bucket-for-bucket (same zero-length-span anchoring, same delta
    // chains, no fabricated rows from the len=0 spans)
    val expected = Map(
      "a" -> agg.decode(Seq(0, 2), Seq(2, 3), Seq(3L, 1L, -1L, 2L, 0L)),
      "b" -> agg.decode(Seq(4, 3), Seq(0, 2), Seq(5L, -2L)),
      "c" -> agg.decode(Seq(-2, 1, 2), Seq(1, 0, 2), Seq(7L, -3L, 1L)))
    val got = Metrics.nativeHistogramIngest(spark, "unused").collect()
      .groupBy(_.getString(1))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getInt(2) -> r.getLong(5)).toMap
      }
    assert(got === expected)
    // the hand-derived anchors: zero-length leading span b lands at 7,
    // zero-length mid span c advances without consuming a delta
    assert(expected("b") === Map(7 -> 5L, 8 -> 3L))
    assert(expected("c") === Map(-2 -> 7L, 2 -> 4L, 3 -> 5L))
    // every emitted bucket joined literal bounds with lo < hi
    val bounds = Metrics.nativeHistogramIngest(spark, "unused").collect()
      .map(r => (r.getDouble(3), r.getDouble(4)))
    assert(bounds.length === 10 && bounds.forall { case (lo, hi) => lo < hi })
  }
}
