package graft

import graft.operators.PromQL

/** Tier-B unit semantics: hand-computed histogram_quantile interpolation,
  * topk ranking, as-of staleness lookback.
  */
class PromQLSpec extends SparkTestBase {
  import spark.implicits._


  test("OpenMetrics payload: format laws and exemplar anchoring") {
    val H = 3600000L
    val dir = fixture("events" -> Seq(
      ev(1, 0L, "purchase", 1.5, "a"),
      ev(2, H, "purchase", 2.0, "a"),
      ev(3, 0L, "signup", 10.0, "a"),
      ev(4, H, "signup", 7.25, "a"), // LWW winner
      // two error observations in the le=5.0 bucket; the later one
      // (id 6) must be the exemplar
      ev(5, 0L, "error", 3.0, "b"),
      ev(6, H, "error", 4.5, "b"),
      ev(7, H, "error", 999.0, "b") // beyond the last finite bucket
    ).toDF(eventCols: _*))
    val payload = PromQL.openMetricsText(spark, dir)
      .as[String].collect().head
    val lines = payload.split("\n")
    assert(lines.last === "# EOF")
    // every family's TYPE header precedes its first sample line
    for (fam <- Seq("purchase", "signup", "error")) {
      val t = lines.indexWhere(_.startsWith(s"# TYPE $fam "))
      val s = lines.indexWhere(l => l.startsWith(fam) && !l.startsWith("# "))
      assert(t >= 0 && s > t, s"$fam TYPE header not before samples")
    }
    assert(lines.contains("purchase_total{k=\"a\"} 3.50"))
    assert(lines.contains("signup{k=\"a\"} 7.25"))
    // ladder: cumulative counts, exemplar = last obs IN the bucket,
    // +Inf row = total count, _count counts the overflow obs too
    assert(lines.contains(
      "error_bucket{k=\"b\",le=\"5.0\"} 2 # {event_id=\"6\"} 4.50"))
    assert(lines.contains("error_bucket{k=\"b\",le=\"1.0\"} 0"))
    assert(lines.contains("error_bucket{k=\"b\",le=\"+Inf\"} 3"))
    assert(lines.contains("error_count{k=\"b\"} 3"))
    assert(lines.contains("error_sum{k=\"b\"} 1006.50"))
    // the parse side round-trips the exemplar and the +Inf row
    val parsed = PromQL.openMetricsParse(spark, dir)
      .where($"suffix" === "bucket" && $"le" === "5.0")
      .select("exemplar_id", "exemplar_value")
      .as[(Option[Long], Option[Double])].collect()
    assert(parsed.toSeq === Seq((Some(6L), Some(4.5))))
  }

  test("histogram_quantile interpolates linearly inside the target bucket") {
    // 10 observations uniform in (0,1]: all in the first bucket (le=1.0).
    // rank = 0.9*10 = 9; first bucket cum=10, prev_cum=0, prev_le=0
    // → q = 0 + (1-0) * (9-0)/(10-0) = 0.9  (hand-computed)
    val dir = fixture("events" -> (1 to 10).map(i =>
      ev(i.toLong, 0, "error", i / 10.0, "u")).toDF(eventCols: _*))
    val q = PromQL.histogramQuantile(spark, dir).select("q").as[Double].collect()
    assert(q.toSeq === Seq(0.9))
  }

  test("histogram_quantile returns the top finite boundary when rank overflows") {
    // 10 observations of 999.0: all beyond le=150 → rank 9 > max_cum 0
    // → q = 150.0 (highest finite boundary), per Prometheus semantics.
    val dir = fixture("events" -> (1 to 10).map(i =>
      ev(i.toLong, 0, "error", 999.0, "o")).toDF(eventCols: _*))
    val q = PromQL.histogramQuantile(spark, dir).select("q").as[Double].collect()
    assert(q.toSeq === Seq(150.0))
  }

  test("native histogram_quantile expression matches the compositional form") {
    val dir = fixture("events" -> ((1 to 10).map(i =>
      ev(i.toLong, 0, "error", i / 10.0, "u")) ++ (1 to 10).map(i =>
      ev(100 + i.toLong, 0, "error", 999.0, "o"))).toDF(eventCols: _*))
    val compositional = graft.operators.PromQL.histogramQuantile(spark, dir)
      .select("name", "label_k", "q").as[(String, String, Double)].collect().toSet
    val native = graft.operators.Metrics.histogramQuantileNative(spark, dir)
      .select("name", "label_k", "q").as[(String, String, Double)].collect().toSet
    assert(native === compositional)
    assert(native.map(r => r._2 -> r._3).toMap === Map("u" -> 0.9, "o" -> 150.0))
  }

  test("custom histogram Aggregator matches the crossJoin snapshot form") {
    val dir = fixture("events" -> (1 to 20).map(i =>
      ev(i.toLong, 0, "error", i * 11.0, "h")).toDF(eventCols: _*))
    val a = graft.operators.Metrics.histogramSnapshot(spark, dir)
      .select("le", "cum_count", "count", "sum")
      .as[(Double, Long, Long, Double)].collect().toSet
    val b = graft.operators.Metrics.histogramSnapshotAgg(spark, dir)
      .select("le", "cum_count", "count", "sum")
      .as[(Double, Long, Long, Double)].collect().toSet
    assert(a === b)
  }

  test("topk keeps exactly the 2 highest series per family, ranked") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "click", 1.0, "a"), ev(1, 0, "click", 5.0, "b"),
      ev(2, 0, "click", 3.0, "c"), ev(3, 0, "view", 9.0, "z")
    ).toDF(eventCols: _*))
    val rows = PromQL.topk(spark, dir)
      .select($"name", $"label_k", $"rank").as[(String, String, Int)].collect().toSet
    assert(rows === Set(("click", "b", 1), ("click", "c", 2), ("view", "z", 1)))
  }

  test("as-of picks the freshest sample within lookback, none beyond it") {
    // gauge samples on Jan 3 and Jan 20; grid instants Jan 2..30.
    // Jan 2: no sample yet. Jan 3..7: sees the Jan-3 sample (5-day
    // lookback); Jan 8: Jan-3 sample is stale (>5 days) → absent.
    val day = 86400000L
    val dir = fixture("events" -> Seq(
      ev(0, 2 * day, "signup", 11.0, "s"),   // Jan 3 00:00
      ev(1, 19 * day, "signup", 22.0, "s")   // Jan 20 00:00
    ).toDF(eventCols: _*))
    val rows = PromQL.asOf(spark, dir)
      .select($"t_us", $"value").as[(Long, Double)].collect().toMap
    def us(d: Int) = (java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00").getTime) * 1000L
    assert(rows(us(3)) === 11.0)
    assert(rows(us(7)) === 11.0)
    assert(!rows.contains(us(2)))
    assert(!rows.contains(us(8)))  // staleness: sample older than lookback
    assert(rows(us(20)) === 22.0)
    assert(rows(us(24)) === 22.0)
    assert(!rows.contains(us(25)))
  }

  test("sessionize boundary: gap == duration merges, gap just over splits") {
    // Spark session_window is merge-inclusive at exactly the gap
    // duration: t, t+30:00 merge; a further event +30:00.001 splits.
    val dir = fixture("events" -> Seq(
      ev(0, 0, "click", 1.0, "s"),
      ev(1, 30 * 60000L, "click", 1.0, "s"),          // exactly 30 min → merges
      ev(2, 60 * 60000L + 1L, "click", 1.0, "s")      // 30:00.001 gap → splits
    ).toDF(eventCols: _*))
    val sizes = graft.operators.PromQL.sessionize(spark, dir)
      .select("n_events").as[Long].collect().sorted.toSeq
    assert(sizes === Seq(1L, 2L))
  }

  test("negative matchers exclude the named family and matching labels") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "7"), // excluded: name
      ev(1, 0, "click", 1.0, "3"),    // excluded: label ~ ^[0-4]
      ev(2, 0, "click", 1.0, "9"),    // kept
      ev(3, 0, "signup", 1.0, "9")    // excluded: not a counter kind
    ).toDF(eventCols: _*))
    val rows = graft.operators.PromQL.selectorNegative(spark, dir)
      .select("name", "label_k").as[(String, String)].collect().toSet
    assert(rows === Set(("click", "9")))
  }

  test("binary op joins series on label and divides") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "a"), ev(1, 0, "click", 4.0, "a"),
      ev(2, 0, "purchase", 9.0, "b") // no click{b} → excluded by inner join
    ).toDF(eventCols: _*))
    val rows = PromQL.binaryOp(spark, dir)
      .select($"label_k", $"ratio").as[(String, Double)].collect().toMap
    assert(rows === Map("a" -> 2.5))
  }

  test("agg family computes count/min/max/avg without (k)") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "click", 1.0, "a"), ev(1, 0, "click", 5.0, "b"),
      ev(2, 0, "click", 3.0, "c"), ev(3, 0, "view", 9.0, "z")
    ).toDF(eventCols: _*))
    val rows = PromQL.aggFamily(spark, dir)
      .select($"name", $"n_series", $"min_value", $"max_value", $"avg_value")
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(rows === Set(("click", 3L, 1.0, 5.0, 3.0), ("view", 1L, 9.0, 9.0, 9.0)))
  }

  test("group_left carries the info label onto every matched left row") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "2"),
      ev(1, 60 * 60000L, "purchase", 20.0, "2"), // second hour, same series
      ev(2, 0, "click", 4.0, "2"),               // info vector: one row
      ev(3, 0, "purchase", 7.0, "3")             // no click{3} → dropped
    ).toDF(eventCols: _*))
    val rows = PromQL.groupLeftJoin(spark, dir)
      .select($"label_k", $"tier", $"purchase_value", $"ratio")
      .as[(String, String, Double, Double)].collect().toSet
    // both hourly rows of label 2 carry tier=even and divide by the same
    // click total
    assert(rows === Set(("2", "even", 10.0, 2.5), ("2", "even", 20.0, 5.0)))
  }

  test("vector or keeps all left series and only unmatched right series") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 10.0, "4"), // left (label < 50)
      ev(1, 0, "click", 3.0, "4"),     // right, label in left → dropped
      ev(2, 0, "click", 5.0, "8")      // right, label not in left → kept
    ).toDF(eventCols: _*))
    val rows = PromQL.vectorOr(spark, dir)
      .select($"name", $"label_k", $"value")
      .as[(String, String, Double)].collect().toSet
    assert(rows === Set(("purchase", "4", 10.0), ("click", "8", 5.0)))
  }

  test("trailing lookback window sums exactly [t-2h, t] of its own series") {
    val h = 60 * 60000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),
      ev(1, 1 * h, "purchase", 2.0, "a"),
      ev(2, 2 * h, "purchase", 4.0, "a"),  // exactly 2h back → includes ev0
      ev(3, 4 * h, "purchase", 8.0, "a"),  // 2h window → includes only ev2
      ev(4, 0, "purchase", 100.0, "b")     // other series, never mixed in
    ).toDF(eventCols: _*))
    val rows = PromQL.trailingLookback(spark, dir)
      .select($"event_id", $"sum_ot", $"count_ot")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(0L) === ((1.0, 1L)))
    assert(rows(1L) === ((3.0, 2L)))
    assert(rows(2L) === ((7.0, 3L)))   // inclusive lower bound at t-2h
    assert(rows(3L) === ((12.0, 2L)))  // ev2 + itself
    assert(rows(4L) === ((100.0, 1L)))
  }

  test("irate/idelta use exactly the last two samples of the day") {
    // increments 1, 2, 3 at t = 0s, 10s, 30s → cumulative 1.00/3.00/6.00;
    // last pair: delta 3.00 over 20 s → irate 0.15/s, idelta 3.00
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),
      ev(1, 10000, "purchase", 2.0, "a"),
      ev(2, 30000, "purchase", 3.0, "a")
    ).toDF(eventCols: _*))
    val rows = PromQL.instantRate(spark, dir)
      .select($"irate", $"idelta").as[(Double, Double)].collect()
    assert(rows.toSeq === Seq((0.15, 3.0)))
  }

  test("deriv is the least-squares slope; predict_linear extrapolates it") {
    // gauge 1.00 @ 0s, 2.00 @ 100s, 3.00 @ 200s: slope = 1 cent/s →
    // deriv 0.01 value/s; ŷ(90000 s) = (100 + 1*90000)/100 = 901.0
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 1.0, "a"),
      ev(1, 100000, "signup", 2.0, "a"),
      ev(2, 200000, "signup", 3.0, "a")
    ).toDF(eventCols: _*))
    val rows = PromQL.linearRegression(spark, dir)
      .select($"deriv", $"predict_1h").as[(Double, Double)].collect()
    assert(rows.toSeq === Seq((0.01, 901.0)))
  }

  test("count_values buckets series by identical snapshot value") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 5.0, "a"), // series a totals 5.00
      ev(1, 0, "purchase", 2.0, "b"), // series b totals 5.00 too
      ev(2, 1000, "purchase", 3.0, "b"),
      ev(3, 0, "purchase", 9.0, "c")  // series c alone at 9.00
    ).toDF(eventCols: _*))
    val rows = PromQL.countValues(spark, dir)
      .select($"value", $"n_series").as[(Double, Long)].collect().toSet
    assert(rows === Set((5.0, 2L), (9.0, 1L)))
  }

  test("math functions apply exact scalar semantics to the gauge snapshot") {
    // last-write-wins snapshot = 16.81 (12.25 earlier is superseded)
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 12.25, "a"),
      ev(1, 1000, "signup", 16.81, "a")
    ).toDF(eventCols: _*))
    val r = PromQL.mathFunctions(spark, dir)
      .select($"value", $"ceil_v", $"floor_v", $"round_v", $"sign_dev", $"mod7")
      .as[(Double, Double, Double, Double, Double, Long)].collect()
    assert(r.toSeq === Seq((16.81, 17.0, 16.0, 17.0, -1.0, 1681L % 7)))
  }

  test("time functions use PromQL day_of_week numbering and leap-year days_in_month") {
    val day = 86400000L
    val dir = fixture("events" -> Seq(
      ev(0, 6 * day, "purchase", 1.0, "a"),  // 2024-01-07, a Sunday
      ev(1, 40 * day, "purchase", 1.0, "a")  // 2024-02-10, leap February
    ).toDF(eventCols: _*))
    val rows = PromQL.timeFunctions(spark, dir)
      .select($"day_of_month", $"day_of_week", $"days_in_month", $"month")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows === Set((7L, 0L, 31L, 1L), (10L, 6L, 29L, 2L)))
  }

  test("changes counts value movements within the day only") {
    val day = 86400000L
    val dir = fixture("events" -> Seq(
      ev(0, 0, "signup", 1.0, "a"),
      ev(1, 1000, "signup", 2.0, "a"),      // change
      ev(2, 2000, "signup", 2.0, "a"),      // no change
      ev(3, 3000, "signup", 5.0, "a"),      // change
      ev(4, day, "signup", 9.0, "a"),       // next day: no predecessor in window
      ev(5, day + 1000, "signup", 1.0, "a") // change
    ).toDF(eventCols: _*))
    val rows = PromQL.changes(spark, dir)
      .select($"day_us", $"changes").as[(Long, Long)].collect().toMap
    assert(rows.values.toSeq.sorted === Seq(1L, 2L))
  }

  test("holt_winters matches an independent Scala recurrence, skips 1-sample series") {
    def reference(ys: Seq[Double], sf: Double = 0.5, tf: Double = 0.3): Double = {
      var s = ys.head
      var b = ys(1) - ys.head
      ys.drop(1).foreach { y =>
        val sNew = sf * y + (1 - sf) * (s + b)
        b = tf * (sNew - s) + (1 - tf) * b
        s = sNew
      }
      s
    }
    val ys = Seq(1.0, 4.0, 2.0, 8.0, 5.0)
    val dir = fixture("events" -> (ys.zipWithIndex.map { case (v, i) =>
      ev(i.toLong, i * 1000L, "signup", v, "a")
    } :+ ev(99, 0, "signup", 7.0, "solo")).toDF(eventCols: _*))
    val rows = PromQL.holtWinters(spark, dir)
      .select($"label_k", $"smoothed").as[(String, Double)].collect().toMap
    assert(rows.keySet === Set("a"))   // 1-sample series yields nothing
    assert(rows("a") === reference(ys))
  }

  test("exposition text round-trips through the parser bit-exactly") {
    val dir = fixture("events" -> Seq(
      ev(0, 0, "purchase", 1.0, "a"),
      ev(1, 1000, "purchase", 2.5, "a"),
      ev(2, 0, "click", 0.07, "b")
    ).toDF(eventCols: _*))
    val rows = PromQL.expositionParse(spark, dir)
      .as[(String, String, Double)].collect().toSet
    assert(rows === Set(("purchase", "a", 3.5), ("click", "b", 0.07)))
  }
}
