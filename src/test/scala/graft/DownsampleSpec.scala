package graft

import graft.operators.Downsample

/** The downsampling/compaction laws:
  *
  *  1. compaction is lossless — `compact(rollup(1h), 1d)` equals the
  *     day rollup computed straight from raw events, field for field
  *     (exact decimal sums, anchored first/last included);
  *  2. compaction CHAINS — hour → 2h → day equals hour → day equals
  *     raw → day, so a rollup pyramid never re-reads raw events;
  *  3. first/last anchors break ts ties on event_id, so the relation
  *     is deterministic under any partitioning.
  */
class DownsampleSpec extends SparkTestBase {
  import spark.implicits._

  private val H = 3600000L // ms/hour

  // Buckets are closed-right (b·res, (b+1)·res]: a sample at exactly
  // k·H belongs to the bucket ENDING at k·H — several fixture samples
  // sit exactly on hour epochs to pin that assignment.
  private lazy val dir: String = fixture("events" -> Seq(
    // t=0 lands ON the hour-0 epoch → the bucket ending at t0 (hour −1)
    ev(1, 0L, "purchase", 1.5, "a"),
    // hour 0 of day 0: two samples sharing a timestamp (the tie that
    // must break on event_id for first/last)
    ev(3, 600000L, "purchase", 2.0, "a"),
    ev(2, 600000L, "purchase", 7.0, "a"),
    // hour 5 of day 0, same series — second hour bucket, same day bucket
    ev(4, 5 * H + 1000L, "purchase", 0.25, "a"),
    // exactly on the day-1 epoch → hour 23 / day 0
    ev(5, 24 * H, "purchase", 4.0, "b"),
    ev(6, 26 * H + 30000L, "purchase", 1.0, "b"),
    // gauge and histogram families ride the same rollup
    ev(7, 3 * H, "signup", 10.0, "a"),
    ev(8, 27 * H, "signup", 8.5, "a"),
    ev(9, 2 * H, "error", 42.0, "b"),
    ev(10, 50 * H, "error", 3.0, "b")
  ).toDF(eventCols: _*))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("compacting the hour rollup to days equals the day rollup from raw events") {
    val viaCompact = Downsample.compact(Downsample.rollupRaw(spark, dir, 3600L), 86400L)
    val direct = Downsample.rollupRaw(spark, dir, 86400L)
    assert(viaCompact.columns.toSeq === direct.columns.toSeq)
    assert(rows(viaCompact) === rows(direct))
    assert(rows(direct).nonEmpty)
  }

  test("compaction chains: 1h -> 2h -> 1d equals 1h -> 1d") {
    val h1 = Downsample.rollupRaw(spark, dir, 3600L)
    val chained = Downsample.compact(Downsample.compact(h1, 7200L), 86400L)
    val oneHop = Downsample.compact(h1, 86400L)
    assert(rows(chained) === rows(oneHop))
  }

  test("rollup-served panel equals raw-window sums at aligned instants") {
    import org.apache.spark.sql.functions._
    val panel = Downsample.rollupPanel(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(panel.nonEmpty)
    assert(panel.forall(_._2 % 21600 == 0), "panel instants not 6h-aligned")
    // independently recompute each window straight from the fixture
    val raw = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(get_json_object(col("props"), "$.k").as("k"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .as[(String, Long, Double)].collect()
    panel.foreach { case (k, tS, v) =>
      val lo = (tS - 86400L) * 1000000L
      val hi = tS * 1000000L
      val expect = raw.filter(r => r._1 == k && r._2 > lo && r._2 <= hi)
        .map(r => BigDecimal(r._3).setScale(2)).sum
      assert(BigDecimal(v).setScale(2) == expect, s"panel ($k, $tS)")
    }
    // windows with no samples emit nothing
    assert(panel.forall(_._3 != 0.0d) ||
      raw.isEmpty, "empty-window rows must be absent, not zero")
  }

  test("gauge panel from rollups equals raw last-write-wins at aligned instants") {
    import org.apache.spark.sql.functions._
    val panel = Downsample.gaugePanel(spark, dir)
      .as[(String, String, String, Long, Double)].collect()
    assert(panel.nonEmpty)
    assert(panel.forall(_._4 % 21600 == 0))
    val raw = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(get_json_object(col("props"), "$.k").as("k"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("value"), col("event_id"))
      .as[(String, Long, Long, Double, Long)].collect()
    panel.foreach { case (_, k, inst, tS, v) =>
      val cands = raw.filter(r => r._1 == k && s"i${r._2 % 4}" == inst &&
        r._3 <= tS * 1000000L)
      assert(cands.nonEmpty, s"panel emitted before first sample ($k, $tS)")
      val expect = cands.maxBy(r => (r._3, r._5))._4
      assert(v === expect, s"gauge panel ($k, $inst, $tS)")
    }
    // (instants before a series' first sample are absent, not
    // null/zero — the cands.nonEmpty assertion above is that law)
  }

  test("histogram compaction is lossless and chains, like the scalar levels") {
    val viaCompact = Downsample.histCompact(
      Downsample.histRollupRaw(spark, dir, 3600L), 86400L)
    val direct = Downsample.histRollupRaw(spark, dir, 86400L)
    assert(viaCompact.columns.toSeq === direct.columns.toSeq)
    assert(rows(viaCompact) === rows(direct))
    assert(rows(direct).nonEmpty)
    val chained = Downsample.histCompact(
      Downsample.histCompact(Downsample.histRollupRaw(spark, dir, 3600L), 7200L),
      86400L)
    assert(rows(chained) === rows(direct))
  }

  test("native-histogram rollups compact losslessly (totals and sparse cells)") {
    val totVia = Downsample.nhTotCompact(
      Downsample.nhTotRollupRaw(spark, dir, 3600L), 86400L)
    val totDirect = Downsample.nhTotRollupRaw(spark, dir, 86400L)
    assert(rows(totVia) === rows(totDirect))
    val bkVia = Downsample.nhBkCompact(
      Downsample.nhBkRollupRaw(spark, dir, 3600L), 86400L)
    val bkDirect = Downsample.nhBkRollupRaw(spark, dir, 86400L)
    assert(rows(bkVia) === rows(bkDirect))
    assert(rows(bkDirect).nonEmpty)
    // the native panel emits only at aligned instants with observations
    val panel = Downsample.nativeHistogramPanel(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(panel.nonEmpty)
    assert(panel.forall(_._2 % 21600 == 0))
    assert(panel.forall(_._3 > 0.0))
  }

  test("histogram panel from rollups equals raw-window quantiles at aligned instants") {
    import org.apache.spark.sql.functions._
    val panel = Downsample.histogramPanel(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(panel.nonEmpty)
    assert(panel.forall(_._2 % 21600 == 0), "panel instants not 6h-aligned")
    val bounds = graft.model.MetricEvent.Buckets
    val raw = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(get_json_object(col("props"), "$.k").as("k"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .as[(String, Long, Double)].collect()
    panel.foreach { case (k, tS, v) =>
      val lo = (tS - 86400L) * 1000000L
      val hi = tS * 1000000L
      val obs = raw.filter(r => r._1 == k && r._2 > lo && r._2 <= hi)
      assert(obs.nonEmpty, s"panel emitted for an empty window ($k, $tS)")
      val rank = 0.9 * obs.length
      val cums = bounds.map(le => (le, obs.count(_._3 <= le).toLong))
      val expect =
        if (rank > cums.last._2.toDouble) bounds.last
        else {
          val i = cums.indexWhere(_._2 >= rank)
          val (le, cum) = cums(i)
          val (prevLe, prevCum) =
            if (i == 0) (0.0, 0L) else cums(i - 1)
          prevLe + (le - prevLe) * (rank - prevCum.toDouble) /
            (cum - prevCum).toDouble
        }
      assert(v === expect, s"histogram panel ($k, $tS)")
    }
  }

  test("serving face: aligned buckets, exact sums, tie-broken anchors") {
    val df = Downsample.rollup1h(spark, dir)
    assert(df.columns.toSeq === Seq("name", "label_k", "label_instance",
      "kind", "bucket_s", "cnt", "sum", "vmin", "vmax", "vfirst", "vlast"))
    val out = df.as[(String, String, String, String, Long, Long, Double,
      Double, Double, Double, Double)].collect()
    assert(out.forall(_._5 % 3600 == 0), "bucket_s not hour-aligned")
    assert(out.map(_._6).sum === 10L, "rollup must account for every event")
    // hour-0 purchase/a holds only the t=600s tie — id 2 value 7.0
    // before id 3 value 2.0; last is therefore id 3. The t=0 sample
    // (id 1) sits EXACTLY on the hour-0 epoch and so belongs to the
    // bucket ENDING there (closed-right membership).
    val h0 = out.find(r => r._1 == "purchase" && r._2 == "a" && r._5 % 86400 == 0).get
    assert(h0._6 === 2L)
    assert(h0._7 === 9.0) // 2.0 + 7.0, exact in cents
    assert(h0._8 === 2.0 && h0._9 === 7.0)
    assert(h0._10 === 7.0, "first = lowest event_id at the tied ts")
    assert(h0._11 === 2.0, "last = latest (ts, event_id) = id 3")
    // the boundary sample: alone in the bucket whose closed-right end
    // is the hour-0 epoch
    val prev = out.find(r => r._1 == "purchase" && r._2 == "a" &&
      r._5 % 86400 == 86400 - 3600).get
    assert(prev._6 === 1L && prev._7 === 1.5,
      "a sample AT b·res belongs to the bucket ending there")
  }
}
