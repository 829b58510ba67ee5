package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier-B operators: the TSDB query surface the reference exists to feed
  * (SURVEY.md §2.2) — selectors, range windows, reset-aware `rate`,
  * label-dimension aggregation, `topk`, cross-series quantiles,
  * `histogram_quantile`, vector binary ops, `offset`, and as-of staleness
  * — each as a declarative Spark plan over the MetricEvent view.
  *
  * Scale design notes:
  *  - Every per-series computation partitions by `(name, label_k)` — the
  *    natural shard key; window operators sort only within a series, so
  *    skew is bounded by the hottest single series, and there is exactly
  *    one exchange per query.
  *  - Counter arithmetic runs in integer cents (`round(value*100)` as
  *    BIGINT): cumulative sums/lags/mod-wraps are exact and
  *    partition-order independent, so results are deterministic on any
  *    cluster layout (and bit-equal to the DuckDB oracle). Division back
  *    to doubles happens once, at the end.
  *  - The as-of query keeps the (tiny) time grid on the broadcast side of
  *    a range join; the fact side never shuffles.
  */
object PromQL {

  import Metrics.MetricEventsSql

  private def series: Seq[Column] = Seq(col("name"), col("label_k"))

  /** Counter events in integer cents. */
  private def counterCents(spark: SparkSession, dir: String): DataFrame =
    Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "counter" && col("value") >= 0)
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))

  private val CounterCentsSql: String =
    s"""SELECT *, CAST(round(value * 100, 0) AS BIGINT) AS cents
       |FROM ($MetricEventsSql) WHERE kind = 'counter' AND value >= 0""".stripMargin

  /** B1 instant-vector selector with label matchers:
    * `purchase{k=~"^1[0-9]$"}` — equality on the metric name + regex on
    * the label value (PromQL `=~`). Both predicates are plain column
    * filters → pushed into the parquet scan.
    */
  def selector(spark: SparkSession, dir: String): DataFrame =
    Metrics.metricEvents(spark, dir)
      .filter(col("name") === "purchase" && col("label_k").rlike("^1[0-9]$"))
      .select(col("event_id"), col("name"), col("label_k"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy(col("event_id"))

  val SelectorSql: String =
    s"""SELECT event_id, name, label_k, value, epoch_us(ts) AS ts_us
       |FROM ($MetricEventsSql)
       |WHERE name = 'purchase' AND regexp_matches(label_k, '^1[0-9]${"$"}')
       |ORDER BY event_id""".stripMargin

  /** B1b negative matchers: `{name!="purchase", k!~"^[0-4]"}` — the
    * complement selectors (`!=`, `!~`) of [[selector]], still plain
    * pushed-down column predicates.
    */
  def selectorNegative(spark: SparkSession, dir: String): DataFrame =
    Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "counter" &&
        col("name") =!= "purchase" && !col("label_k").rlike("^[0-4]"))
      .groupBy(series: _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(col("name"), col("label_k"))

  val SelectorNegativeSql: String =
    s"""SELECT name, label_k, COUNT(*) AS n
       |FROM ($MetricEventsSql)
       |WHERE kind = 'counter' AND name <> 'purchase'
       |  AND NOT regexp_matches(label_k, '^[0-4]')
       |GROUP BY name, label_k
       |ORDER BY name, label_k""".stripMargin

  /** B-absent `absent()`-style missing-series detection: the expected
    * series universe (families × labels seen anywhere) anti-joined
    * against the series actually present for one family — the PromQL
    * alerting primitive "this series stopped reporting". Anti join =
    * Spark's dedicated LeftAnti, broadcast on the present side.
    */
  def absentSeries(spark: SparkSession, dir: String): DataFrame = {
    val m = Metrics.metricEvents(spark, dir).filter(col("kind") === "counter")
    val universe = m.select(col("label_k")).distinct()
    val present = m.filter(col("name") === "purchase" &&
        col("label_k").cast("int") < 90)
      .select(col("label_k")).distinct()
    universe.join(present, Seq("label_k"), "left_anti")
      .select(lit("purchase").as("name"), col("label_k"), lit(true).as("absent"))
      .orderBy(col("label_k"))
  }

  val AbsentSeriesSql: String =
    s"""WITH m AS (SELECT * FROM ($MetricEventsSql) WHERE kind = 'counter'),
       |universe AS (SELECT DISTINCT label_k FROM m),
       |present AS (SELECT DISTINCT label_k FROM m
       |            WHERE name = 'purchase' AND TRY_CAST(label_k AS INT) < 90)
       |SELECT 'purchase' AS name, label_k, TRUE AS absent
       |FROM universe
       |WHERE NOT EXISTS (SELECT 1 FROM present WHERE present.label_k = universe.label_k)
       |ORDER BY label_k""".stripMargin

  /** A2-salted: the counter snapshot through an explicit two-phase
    * salted aggregation — phase 1 aggregates on (series, salt = hash
    * mod 8) spreading a hot series over 8 reducers, phase 2 collapses
    * the salts. Bit-identical to [[Metrics.counterSnapshot]] (same
    * oracle) because decimal sums are associative; this is the
    * documented skew-mitigation path for a series receiving a
    * disproportionate share of events at 100 TB (AQE skew handling
    * covers joins; salting covers aggregations).
    */
  def counterSnapshotSalted(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "counter" && col("value") >= 0)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("name"), col("label_k"), col("salt"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).as("partial"),
        count(lit(1)).as("pn"))
      .groupBy(col("name"), col("label_k"))
      .agg(sum(col("partial")).cast("double").as("value"),
        sum(col("pn")).as("n_increments"))
      .orderBy(col("name"), col("label_k"))
  }

  /** B2 range selector + per-series windowed aggregation: hourly tumbling
    * windows per counter series (`sum_over_time(m[1h])`). One hash
    * aggregate keyed by (series, hour) — no sort, no window function.
    */
  def rangeAgg(spark: SparkSession, dir: String): DataFrame =
    counterCents(spark, dir)
      .groupBy(series :+ unix_micros(date_trunc("hour", col("ts"))).as("hour_us"): _*)
      .agg((sum(col("cents")).cast("double") / 100.0).as("value"),
        count(lit(1)).as("n_samples"))
      .orderBy(col("name"), col("label_k"), col("hour_us"))

  val RangeAggSql: String =
    s"""SELECT name, label_k, epoch_us(date_trunc('hour', ts)) AS hour_us,
       |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS value,
       |  COUNT(*) AS n_samples
       |FROM ($CounterCentsSql)
       |GROUP BY name, label_k, date_trunc('hour', ts)
       |ORDER BY name, label_k, hour_us""".stripMargin

  /** B2b sliding windows: 2-hour windows sliding by 1 hour (each sample
    * lands in 2 overlapping windows) via Spark's native `window(ts,
    * size, slide)`. The oracle reproduces the assignment rule exactly:
    * window starts are `date_trunc(hour, ts) − k·slide` for k ∈ {0, 1}.
    */
  def slidingWindowAgg(spark: SparkSession, dir: String): DataFrame =
    counterCents(spark, dir)
      .groupBy(col("name"),
        window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg((sum(col("cents")).cast("double") / 100.0).as("value"),
        count(lit(1)).as("n"))
      .select(col("name"), unix_micros(col("w.start")).as("window_start_us"),
        col("value"), col("n"))
      .orderBy(col("name"), col("window_start_us"))

  val SlidingWindowAggSql: String =
    s"""WITH c AS ($CounterCentsSql),
       |assigned AS (
       |  SELECT name, cents,
       |    date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start
       |  FROM c, (SELECT unnest([0, 1]) AS k))
       |SELECT name, epoch_us(window_start) AS window_start_us,
       |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS value,
       |  COUNT(*) AS n
       |FROM assigned
       |GROUP BY name, window_start
       |ORDER BY name, window_start_us""".stripMargin

  /** B3 counter-reset-aware `rate()` (SURVEY.md §7 hard-part #1).
    *
    * The event stream carries increments; a scraped TSDB sees cumulative
    * samples. We reconstruct the cumulative series (running sum per
    * series), wrap it at 1000.00 to synthesize deterministic counter
    * resets, then recover per-sample increase with the published
    * Prometheus reset rule — `curr < prev ⇒ increase = curr` (the counter
    * restarted from 0) — and aggregate to a per-hour per-second rate.
    * Two window passes over one per-series sort; Spark executes both in
    * a single Window stage because they share partitioning and ordering.
    */
  def rate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(series: _*).orderBy(col("ts"), col("event_id"))
    counterCents(spark, dir)
      .withColumn("wrapped",
        sum(col("cents")).over(w.rowsBetween(Window.unboundedPreceding, 0)) % 100000L)
      .withColumn("prev", lag(col("wrapped"), 1).over(w))
      .withColumn("delta",
        when(col("prev").isNull, col("wrapped"))
          .when(col("wrapped") >= col("prev"), col("wrapped") - col("prev"))
          .otherwise(col("wrapped")))
      .groupBy(series :+ unix_micros(date_trunc("hour", col("ts"))).as("hour_us"): _*)
      .agg((sum(col("delta")).cast("double") / 100.0 / 3600.0).as("rate"))
      .orderBy(col("name"), col("label_k"), col("hour_us"))
  }

  val RateSql: String =
    s"""WITH c AS ($CounterCentsSql),
       |w AS (SELECT *,
       |  SUM(cents) OVER (PARTITION BY name, label_k ORDER BY ts, event_id
       |                   ROWS UNBOUNDED PRECEDING) % 100000 AS wrapped
       |  FROM c),
       |d AS (SELECT *,
       |  LAG(wrapped) OVER (PARTITION BY name, label_k
       |                     ORDER BY ts, event_id) AS prev
       |  FROM w)
       |SELECT name, label_k, epoch_us(date_trunc('hour', ts)) AS hour_us,
       |  CAST(SUM(CASE WHEN prev IS NULL THEN wrapped
       |                WHEN wrapped >= prev THEN wrapped - prev
       |                ELSE wrapped END) AS DOUBLE) / 100.0 / 3600.0 AS rate
       |FROM d
       |GROUP BY name, label_k, date_trunc('hour', ts)
       |ORDER BY name, label_k, hour_us""".stripMargin

  /** B4 label-dimension aggregation: `sum by (k)` and `sum without (k)`
    * in one pass via grouping sets (placeholder `<agg>` marks the
    * collapsed dimension). Partial aggregation happens map-side for both
    * grouping sets before the single shuffle.
    */
  def aggByLabel(spark: SparkSession, dir: String): DataFrame =
    counterCents(spark, dir)
      .groupingSets(Seq(Seq(col("name")), Seq(col("label_k"))),
        col("name"), col("label_k"))
      .agg((sum(col("cents")).cast("double") / 100.0).as("value"))
      .select(coalesce(col("name"), lit("<agg>")).as("name"),
        coalesce(col("label_k"), lit("<agg>")).as("label_k"), col("value"))
      .orderBy(col("name"), col("label_k"))

  val AggByLabelSql: String =
    s"""SELECT COALESCE(name, '<agg>') AS name,
       |  COALESCE(label_k, '<agg>') AS label_k,
       |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS value
       |FROM ($CounterCentsSql)
       |GROUP BY GROUPING SETS ((name), (label_k))
       |ORDER BY name, label_k""".stripMargin

  /** B2c TRUE trailing-lookback range window — PromQL
    * `sum_over_time(purchase[2h])` / `count_over_time` evaluated AT
    * every sample instant, not on aligned buckets: each row's window is
    * `[t−2h, t]` of ITS OWN series via `rangeBetween` on the
    * microsecond axis. Per-series sort only (partition = series key,
    * one exchange); RANGE frames include order-value ties identically
    * in both engines, and the summand is integer cents, so the frame
    * sum is deterministic without a row tiebreak.
    */
  def trailingLookback(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(series: _*).orderBy(col("ts_us"))
      .rangeBetween(-7200000000L, 0L) // 2h in micros, inclusive
    counterCents(spark, dir)
      .filter(col("name") === "purchase")
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("name"), col("label_k"), col("event_id"), col("ts_us"),
        (sum(col("cents")).over(w).cast("double") / 100.0).as("sum_ot"),
        count(lit(1)).over(w).as("count_ot"))
      .orderBy(col("name"), col("label_k"), col("ts_us"), col("event_id"))
  }

  val TrailingLookbackSql: String =
    s"""SELECT name, label_k, event_id, ts_us,
       |  CAST(SUM(cents) OVER w AS DOUBLE) / 100.0 AS sum_ot,
       |  COUNT(*) OVER w AS count_ot
       |FROM (SELECT *, epoch_us(ts) AS ts_us FROM ($CounterCentsSql)
       |      WHERE name = 'purchase')
       |WINDOW w AS (PARTITION BY name, label_k ORDER BY ts_us
       |             RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW)
       |ORDER BY name, label_k, ts_us, event_id""".stripMargin

  /** The label universe of the series key space — the reference's data
    * model is (metric name, single label pair), `prometheus.cpp:189-192`.
    */
  private val LabelUniverse = Seq("name", "label_k")

  /** PromQL `without (drop…)` as a grouping key: every label dimension
    * of the series universe EXCEPT the dropped ones. Complement-label
    * grouping composes with any aggregate; `by (ks…)` is just the
    * positive selection `ks.map(col)`.
    */
  def without(drop: String*): Seq[Column] =
    LabelUniverse.filterNot(drop.contains).map(col)

  /** B4 complete aggregation family: `count/min/max/avg without (k)`
    * across per-series snapshot values — one partial-aggregating
    * shuffle for the snapshot, one for the family rollup. `avg` is the
    * exact integer-cent sum divided once, so it bit-matches the oracle.
    */
  def aggFamily(spark: SparkSession, dir: String): DataFrame = {
    val snap = counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
    snap.groupBy(without("label_k"): _*)
      .agg(
        count(lit(1)).as("n_series"),
        (min(col("cents")).cast("double") / 100.0).as("min_value"),
        (max(col("cents")).cast("double") / 100.0).as("max_value"),
        (sum(col("cents")).cast("double") / 100.0 / count(lit(1))).as("avg_value"))
      .orderBy(col("name"))
  }

  val AggFamilySql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k, SUM(cents) AS cents
       |  FROM ($CounterCentsSql) GROUP BY name, label_k)
       |SELECT name,
       |  COUNT(*) AS n_series,
       |  CAST(MIN(cents) AS DOUBLE) / 100.0 AS min_value,
       |  CAST(MAX(cents) AS DOUBLE) / 100.0 AS max_value,
       |  CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*) AS avg_value
       |FROM snap
       |GROUP BY name
       |ORDER BY name""".stripMargin

  /** B5 `topk(2, …)` — top series per metric family by snapshot value.
    * Rank inside each family partition; integer cents ⇒ no float-tie
    * nondeterminism, label_k breaks exact ties.
    */
  def topk(spark: SparkSession, dir: String): DataFrame = {
    val snap = counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
    val w = Window.partitionBy(col("name"))
      .orderBy(col("cents").desc, col("label_k"))
    snap.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select(col("name"), col("label_k"),
        (col("cents").cast("double") / 100.0).as("value"), col("rank"))
      .orderBy(col("name"), col("rank"))
  }

  val TopkSql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k, SUM(cents) AS cents
       |  FROM ($CounterCentsSql) GROUP BY name, label_k),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY name
       |        ORDER BY cents DESC, label_k) AS rank FROM snap)
       |SELECT name, label_k, CAST(cents AS DOUBLE) / 100.0 AS value, rank
       |FROM r WHERE rank <= 2
       |ORDER BY name, rank""".stripMargin

  /** B6 cross-series `quantile(0.5, …)`: median of per-series snapshot
    * values within each family. Interpolation is spelled out (1-based
    * rank r = (n−1)·φ, linear between floor/ceil neighbours) instead of
    * calling an engine-specific percentile, so Spark and the oracle
    * compute the identical IEEE expression.
    */
  def quantileAcross(spark: SparkSession, dir: String): DataFrame = {
    val snap = counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
    val w = Window.partitionBy(col("name")).orderBy(col("cents"), col("label_k"))
    snap
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("name"))))
      .withColumn("pos", (col("n") - 1).cast("double") * 0.5)
      .groupBy(col("name"))
      .agg(
        (max(when(col("rn") === floor(col("pos")).cast("long") + 1, col("cents"))).cast("double")
          + (max(when(col("rn") === ceil(col("pos")).cast("long") + 1, col("cents"))).cast("double")
            - max(when(col("rn") === floor(col("pos")).cast("long") + 1, col("cents"))).cast("double"))
          * (max(col("pos")) - floor(max(col("pos"))))).as("median_cents"))
      .select(col("name"), (col("median_cents") / 100.0).as("median"))
      .orderBy(col("name"))
  }

  val QuantileAcrossSql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k, SUM(cents) AS cents
       |  FROM ($CounterCentsSql) GROUP BY name, label_k),
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY name ORDER BY cents, label_k) AS rn,
       |  COUNT(*) OVER (PARTITION BY name) AS n FROM snap),
       |p AS (SELECT *, CAST(n - 1 AS DOUBLE) * 0.5 AS pos FROM r)
       |SELECT name,
       |  (MAX(CASE WHEN rn = CAST(FLOOR(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE
       |   + (MAX(CASE WHEN rn = CAST(CEIL(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE
       |      - MAX(CASE WHEN rn = CAST(FLOOR(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE)
       |     * (MAX(pos) - FLOOR(MAX(pos)))) / 100.0 AS median
       |FROM p GROUP BY name
       |ORDER BY name""".stripMargin

  /** B7 `histogram_quantile(0.9, …)` over the cumulative bucket snapshot
    * (SURVEY.md §7 hard-part #2). Published Prometheus semantics:
    * rank = φ·count; the target bucket is the smallest `le` whose
    * cumulative count reaches the rank; linear interpolation inside it
    * (lower bound 0 for the first bucket); a rank beyond the last finite
    * bucket returns the highest finite boundary.
    */
  def histogramQuantile(spark: SparkSession, dir: String): DataFrame = {
    val phi = 0.9
    val snap = Metrics.histogramSnapshot(spark, dir)
      .select(col("name"), col("label_k"), col("le"), col("cum_count"), col("count"))
    val w = Window.partitionBy(series: _*).orderBy(col("le"))
    val ranked = snap
      .withColumn("rank", lit(phi) * col("count").cast("double"))
      .withColumn("prev_le", coalesce(lag(col("le"), 1).over(w), lit(0.0)))
      .withColumn("prev_cum", coalesce(lag(col("cum_count"), 1).over(w), lit(0L)))
      .withColumn("max_le", max(col("le")).over(Window.partitionBy(series: _*)))
      .withColumn("max_cum", max(col("cum_count")).over(Window.partitionBy(series: _*)))
    // one fused pass (same construction as the front-end compiler): the
    // union form would recompute the snapshot+window subtree twice
    val overflowRow = col("le") === col("max_le") &&
      col("rank") > col("max_cum").cast("double")
    val inBucketRow = col("cum_count") >= col("rank") &&
      col("prev_cum") < col("rank")
    ranked
      .filter(inBucketRow || overflowRow)
      .select(col("name"), col("label_k"),
        when(overflowRow, col("max_le"))
          .otherwise(col("prev_le") + (col("le") - col("prev_le"))
            * (col("rank") - col("prev_cum").cast("double"))
            / (col("cum_count") - col("prev_cum")).cast("double")).as("q"))
      .orderBy(col("name"), col("label_k"))
  }

  val HistogramQuantileSql: String =
    s"""WITH snap AS (${Metrics.HistogramSnapshotSql.replace("ORDER BY name, label_k, le", "")}),
       |r AS (SELECT name, label_k, le, cum_count,
       |  0.9 * CAST(count AS DOUBLE) AS rank,
       |  COALESCE(LAG(le) OVER (PARTITION BY name, label_k ORDER BY le), 0.0) AS prev_le,
       |  COALESCE(LAG(cum_count) OVER (PARTITION BY name, label_k ORDER BY le), 0) AS prev_cum,
       |  MAX(le) OVER (PARTITION BY name, label_k) AS max_le,
       |  MAX(cum_count) OVER (PARTITION BY name, label_k) AS max_cum
       |  FROM snap)
       |SELECT name, label_k,
       |  prev_le + (le - prev_le) * (rank - CAST(prev_cum AS DOUBLE))
       |    / CAST(cum_count - prev_cum AS DOUBLE) AS q
       |FROM r WHERE cum_count >= rank AND prev_cum < rank
       |UNION ALL
       |SELECT name, label_k, max_le AS q
       |FROM r WHERE le = max_le AND rank > CAST(max_cum AS DOUBLE)
       |ORDER BY name, label_k""".stripMargin

  /** B8 vector binary op with label matching: `purchase / click` joined
    * `on (k)` — an equi-join of two snapshot vectors on the label set,
    * then column arithmetic. Both sides aggregate before joining, so the
    * join input is one row per series (tiny at any scale).
    */
  def binaryOp(spark: SparkSession, dir: String): DataFrame = {
    val snap = counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
    val p = snap.filter(col("name") === "purchase")
      .select(col("label_k"), col("cents").as("purchase_cents"))
    val c = snap.filter(col("name") === "click")
      .select(col("label_k"), col("cents").as("click_cents"))
    p.join(c, Seq("label_k"))
      .select(col("label_k"),
        (col("purchase_cents").cast("double") / 100.0).as("purchase_value"),
        (col("click_cents").cast("double") / 100.0).as("click_value"),
        (col("purchase_cents").cast("double") / col("click_cents").cast("double")).as("ratio"))
      .orderBy(col("label_k"))
  }

  val BinaryOpSql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k, SUM(cents) AS cents
       |  FROM ($CounterCentsSql) GROUP BY name, label_k)
       |SELECT p.label_k,
       |  CAST(p.cents AS DOUBLE) / 100.0 AS purchase_value,
       |  CAST(c.cents AS DOUBLE) / 100.0 AS click_value,
       |  CAST(p.cents AS DOUBLE) / CAST(c.cents AS DOUBLE) AS ratio
       |FROM (SELECT * FROM snap WHERE name = 'purchase') p
       |JOIN (SELECT * FROM snap WHERE name = 'click') c USING (label_k)
       |ORDER BY label_k""".stripMargin

  /** B8b many-to-one vector matching:
    * `purchase_hourly / ignoring(ts) group_left(tier) click_info` —
    * the classic "join a metric to its info-metric" pattern. The left
    * side keeps its full dimensionality (one row per label × hour); the
    * right side is ONE row per label (`ignoring` collapses everything
    * but the match key), and `group_left` carries the info label
    * (`tier`) onto every matched left row. The info vector is one row
    * per series — broadcast, so the fact side never shuffles for the
    * join regardless of corpus size.
    */
  def groupLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = counterCents(spark, dir)
    val hourly = c.filter(col("name") === "purchase")
      .groupBy(col("label_k"), unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .agg(sum(col("cents")).as("pcents"))
    val info = c.filter(col("name") === "click")
      .groupBy(col("label_k"))
      .agg(sum(col("cents")).as("ccents"))
      .withColumn("tier",
        when(col("label_k").cast("int") % 2 === 0, "even").otherwise("odd"))
    hourly.join(broadcast(info), Seq("label_k"))
      .select(col("label_k"), col("hour_us"), col("tier"),
        (col("pcents").cast("double") / 100.0).as("purchase_value"),
        (col("pcents").cast("double") / col("ccents").cast("double")).as("ratio"))
      .orderBy(col("label_k"), col("hour_us"))
  }

  val GroupLeftJoinSql: String =
    s"""WITH c AS ($CounterCentsSql),
       |hourly AS (
       |  SELECT label_k, epoch_us(date_trunc('hour', ts)) AS hour_us,
       |    SUM(cents) AS pcents
       |  FROM c WHERE name = 'purchase' GROUP BY 1, 2),
       |info AS (
       |  SELECT label_k, SUM(cents) AS ccents,
       |    CASE WHEN TRY_CAST(label_k AS INT) % 2 = 0 THEN 'even' ELSE 'odd' END AS tier
       |  FROM c WHERE name = 'click' GROUP BY label_k)
       |SELECT label_k, hour_us, tier,
       |  CAST(pcents AS DOUBLE) / 100.0 AS purchase_value,
       |  CAST(pcents AS DOUBLE) / CAST(ccents AS DOUBLE) AS ratio
       |FROM hourly JOIN info USING (label_k)
       |ORDER BY label_k, hour_us""".stripMargin

  /** B9 `offset` time shift: last-day counter volume per series vs the
    * same series one week earlier — two conditional aggregations over a
    * single scan (no self-join, no second pass).
    */
  def offsetCompare(spark: SparkSession, dir: String): DataFrame = {
    val t1 = lit("2024-01-30 00:00:00").cast("timestamp")
    val t0 = lit("2024-01-29 00:00:00").cast("timestamp")
    val o1 = lit("2024-01-23 00:00:00").cast("timestamp")
    val o0 = lit("2024-01-22 00:00:00").cast("timestamp")
    counterCents(spark, dir)
      .groupBy(series: _*)
      .agg(
        (sum(when(col("ts") >= t0 && col("ts") < t1, col("cents")).otherwise(0L))
          .cast("double") / 100.0).as("current_value"),
        (sum(when(col("ts") >= o0 && col("ts") < o1, col("cents")).otherwise(0L))
          .cast("double") / 100.0).as("offset_value"))
      .withColumn("delta", col("current_value") - col("offset_value"))
      .orderBy(col("name"), col("label_k"))
  }

  val OffsetCompareSql: String =
    s"""SELECT name, label_k,
       |  CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-29 00:00:00'
       |                 AND ts <  TIMESTAMP '2024-01-30 00:00:00'
       |                THEN cents ELSE 0 END) AS DOUBLE) / 100.0 AS current_value,
       |  CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-22 00:00:00'
       |                 AND ts <  TIMESTAMP '2024-01-23 00:00:00'
       |                THEN cents ELSE 0 END) AS DOUBLE) / 100.0 AS offset_value,
       |  CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-29 00:00:00'
       |                 AND ts <  TIMESTAMP '2024-01-30 00:00:00'
       |                THEN cents ELSE 0 END) AS DOUBLE) / 100.0
       |  - CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-22 00:00:00'
       |                   AND ts <  TIMESTAMP '2024-01-23 00:00:00'
       |                  THEN cents ELSE 0 END) AS DOUBLE) / 100.0 AS delta
       |FROM ($CounterCentsSql)
       |GROUP BY name, label_k
       |ORDER BY name, label_k""".stripMargin

  /** B3b `increase()`: whole-range reset-aware increase per series — the
    * same wrapped-cumulative reconstruction as [[rate]], aggregated over
    * the full range instead of per hour (rate = increase / seconds).
    */
  def increase(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(series: _*).orderBy(col("ts"), col("event_id"))
    counterCents(spark, dir)
      .withColumn("wrapped",
        sum(col("cents")).over(w.rowsBetween(Window.unboundedPreceding, 0)) % 100000L)
      .withColumn("prev", lag(col("wrapped"), 1).over(w))
      .withColumn("delta",
        when(col("prev").isNull, col("wrapped"))
          .when(col("wrapped") >= col("prev"), col("wrapped") - col("prev"))
          .otherwise(col("wrapped")))
      .groupBy(series: _*)
      .agg((sum(col("delta")).cast("double") / 100.0).as("increase"),
        count(lit(1)).as("n_samples"))
      .orderBy(col("name"), col("label_k"))
  }

  val IncreaseSql: String =
    s"""WITH c AS ($CounterCentsSql),
       |w AS (SELECT *,
       |  SUM(cents) OVER (PARTITION BY name, label_k ORDER BY ts, event_id
       |                   ROWS UNBOUNDED PRECEDING) % 100000 AS wrapped
       |  FROM c),
       |d AS (SELECT *,
       |  LAG(wrapped) OVER (PARTITION BY name, label_k
       |                     ORDER BY ts, event_id) AS prev
       |  FROM w)
       |SELECT name, label_k,
       |  CAST(SUM(CASE WHEN prev IS NULL THEN wrapped
       |                WHEN wrapped >= prev THEN wrapped - prev
       |                ELSE wrapped END) AS DOUBLE) / 100.0 AS increase,
       |  COUNT(*) AS n_samples
       |FROM d
       |GROUP BY name, label_k
       |ORDER BY name, label_k""".stripMargin

  /** B3c `delta()`: gauge change over each daily window = last − first
    * sample by event time (gauges are not reset-compensated, per PromQL).
    * first/last are picked by deterministic (ts, event_id) ranking in one
    * window pass.
    */
  def deltaGauge(spark: SparkSession, dir: String): DataFrame = {
    val day = unix_micros(date_trunc("day", col("ts"))).as("day_us")
    val base = Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("day_us", day)
    val w = Window.partitionBy(col("name"), col("label_k"), col("day_us"))
      .orderBy(col("ts"), col("event_id"))
    base
      .withColumn("rn_first", row_number().over(w))
      .withColumn("rn_last",
        row_number().over(Window.partitionBy(col("name"), col("label_k"), col("day_us"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .groupBy(col("name"), col("label_k"), col("day_us"))
      .agg(((max(when(col("rn_last") === 1, col("cents")))
        - max(when(col("rn_first") === 1, col("cents")))).cast("double") / 100.0).as("delta"))
      .orderBy(col("name"), col("label_k"), col("day_us"))
  }

  val DeltaGaugeSql: String =
    s"""WITH g AS (
       |  SELECT *, CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |    epoch_us(date_trunc('day', ts)) AS day_us
       |  FROM ($MetricEventsSql) WHERE kind = 'gauge'),
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k, day_us
       |                     ORDER BY ts, event_id) AS rn_first,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k, day_us
       |                     ORDER BY ts DESC, event_id DESC) AS rn_last
       |  FROM g)
       |SELECT name, label_k, day_us,
       |  CAST(MAX(CASE WHEN rn_last = 1 THEN cents END)
       |       - MAX(CASE WHEN rn_first = 1 THEN cents END) AS DOUBLE) / 100.0 AS delta
       |FROM r
       |GROUP BY name, label_k, day_us
       |ORDER BY name, label_k, day_us""".stripMargin

  /** B-set vector set operations: `purchase and click` (series whose
    * label set exists in both vectors → left-semi join) and
    * `purchase unless click` (→ left-anti join), PromQL's `and`/`unless`
    * mapped to Spark's dedicated semi/anti join types (SURVEY.md §2.3).
    * Labels 0..99 exist for both families at any real sf, so the fixture
    * exercise happens on restricted sub-vectors (click's even labels).
    */
  def vectorSetOps(spark: SparkSession, dir: String): DataFrame = {
    val snap = counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
    val p = snap.filter(col("name") === "purchase")
    val c = snap.filter(col("name") === "click" && col("label_k").cast("int") % 2 === 0)
      .select(col("label_k"))
    val and = p.join(c, Seq("label_k"), "left_semi")
      .select(lit("and").as("op"), col("label_k"),
        (col("cents").cast("double") / 100.0).as("value"))
    val unless = p.join(c, Seq("label_k"), "left_anti")
      .select(lit("unless").as("op"), col("label_k"),
        (col("cents").cast("double") / 100.0).as("value"))
    and.unionAll(unless).orderBy(col("op"), col("label_k"))
  }

  val VectorSetOpsSql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k, SUM(cents) AS cents
       |  FROM ($CounterCentsSql) GROUP BY name, label_k),
       |p AS (SELECT * FROM snap WHERE name = 'purchase'),
       |c AS (SELECT label_k FROM snap
       |      WHERE name = 'click' AND TRY_CAST(label_k AS INT) % 2 = 0)
       |SELECT 'and' AS op, label_k, CAST(cents AS DOUBLE) / 100.0 AS value
       |FROM p WHERE label_k IN (SELECT label_k FROM c)
       |UNION ALL
       |SELECT 'unless' AS op, label_k, CAST(cents AS DOUBLE) / 100.0 AS value
       |FROM p WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.label_k = p.label_k)
       |ORDER BY op, label_k""".stripMargin

  /** B13b PromQL `or`: union with left priority — every series of the
    * left vector, plus the right-vector series whose label set does not
    * already appear on the left. The dedup is a left-anti join on the
    * label key (broadcast-able: the key sets are per-series, tiny), then
    * a shuffle-free unionAll. Completes the and/unless/or set-op family.
    */
  def vectorOr(spark: SparkSession, dir: String): DataFrame = {
    val snap = counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
    val p = snap.filter(col("name") === "purchase" && col("label_k").cast("int") < 50)
    val c = snap.filter(col("name") === "click" && col("label_k").cast("int") % 2 === 0)
    // the equi-key anti join reorders columns (key first) — realign
    // before the positional unionAll
    val fromC = c.join(p.select(col("label_k")), Seq("label_k"), "left_anti")
      .select(col("name"), col("label_k"), col("cents"))
    p.select(col("name"), col("label_k"), col("cents")).unionAll(fromC)
      .select(col("name"), col("label_k"),
        (col("cents").cast("double") / 100.0).as("value"))
      .orderBy(col("label_k"), col("name"))
  }

  val VectorOrSql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k, SUM(cents) AS cents
       |  FROM ($CounterCentsSql) GROUP BY name, label_k),
       |p AS (SELECT * FROM snap
       |      WHERE name = 'purchase' AND TRY_CAST(label_k AS INT) < 50),
       |c AS (SELECT * FROM snap
       |      WHERE name = 'click' AND TRY_CAST(label_k AS INT) % 2 = 0)
       |SELECT name, label_k, CAST(cents AS DOUBLE) / 100.0 AS value FROM p
       |UNION ALL
       |SELECT name, label_k, CAST(cents AS DOUBLE) / 100.0 AS value FROM c
       |WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.label_k = c.label_k)
       |ORDER BY label_k, name""".stripMargin

  /** B-scalar PromQL label/value functions in one pass:
    * `label_replace(v, "bucket", "$1", "k", "([0-9]).*")` (regex capture
    * into a new label) and `clamp(v, 200, 1200)` with its `clamp_min`/
    * `clamp_max` halves. Pure per-row projections — no shuffle beyond
    * the snapshot's own aggregate; at any scale these are free riders on
    * whatever pipeline they decorate.
    */
  def labelFunctions(spark: SparkSession, dir: String): DataFrame = {
    val snap = counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
      .withColumn("value", col("cents").cast("double") / 100.0)
    snap.select(
      col("name"), col("label_k"),
      regexp_replace(col("label_k"), "([0-9]).*", "$1").as("decade"),
      col("value"),
      least(greatest(col("value"), lit(200.0)), lit(1200.0)).as("clamped"),
      greatest(col("value"), lit(200.0)).as("clamp_min"),
      least(col("value"), lit(1200.0)).as("clamp_max"))
      .orderBy(col("name"), col("label_k"))
  }

  val LabelFunctionsSql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k,
       |    CAST(SUM(cents) AS DOUBLE) / 100.0 AS value
       |  FROM ($CounterCentsSql) GROUP BY name, label_k)
       |SELECT name, label_k,
       |  regexp_replace(label_k, '([0-9]).*', '\\1') AS decade,
       |  value,
       |  least(greatest(value, 200.0), 1200.0) AS clamped,
       |  greatest(value, 200.0) AS clamp_min,
       |  least(value, 1200.0) AS clamp_max
       |FROM snap
       |ORDER BY name, label_k""".stripMargin

  /** B-range `avg/min/max/last_over_time` for gauge series per day — one
    * hash aggregate computes all four range functions (last via the
    * deterministic rank trick, avg via exact cents).
    */
  def overTime(spark: SparkSession, dir: String): DataFrame = {
    val base = Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
    val wLast = Window.partitionBy(col("name"), col("label_k"), col("day_us"))
      .orderBy(col("ts").desc, col("event_id").desc)
    base.withColumn("rn_last", row_number().over(wLast))
      .groupBy(col("name"), col("label_k"), col("day_us"))
      .agg(
        (sum(col("cents")).cast("double") / 100.0 / count(lit(1)).cast("double")).as("avg_ot"),
        (min(col("cents")).cast("double") / 100.0).as("min_ot"),
        (max(col("cents")).cast("double") / 100.0).as("max_ot"),
        (max(when(col("rn_last") === 1, col("cents"))).cast("double") / 100.0).as("last_ot"))
      .orderBy(col("name"), col("label_k"), col("day_us"))
  }

  val OverTimeSql: String =
    s"""WITH g AS (
       |  SELECT *, CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |    epoch_us(date_trunc('day', ts)) AS day_us
       |  FROM ($MetricEventsSql) WHERE kind = 'gauge'),
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k, day_us
       |                     ORDER BY ts DESC, event_id DESC) AS rn_last
       |  FROM g)
       |SELECT name, label_k, day_us,
       |  CAST(SUM(cents) AS DOUBLE) / 100.0 / CAST(COUNT(*) AS DOUBLE) AS avg_ot,
       |  CAST(MIN(cents) AS DOUBLE) / 100.0 AS min_ot,
       |  CAST(MAX(cents) AS DOUBLE) / 100.0 AS max_ot,
       |  CAST(MAX(CASE WHEN rn_last = 1 THEN cents END) AS DOUBLE) / 100.0 AS last_ot
       |FROM r
       |GROUP BY name, label_k, day_us
       |ORDER BY name, label_k, day_us""".stripMargin

  /** B-range `stddev_over_time` / `count_over_time`: per-series daily
    * population standard deviation and sample count for gauges. Moments
    * are accumulated as exact integers (Σcents, Σcents²) — associative
    * and engine-identical — with one final IEEE expression
    * `sqrt(Σx²/n − (Σx/n)²)/100`.
    */
  def stddevOverTime(spark: SparkSession, dir: String): DataFrame =
    Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
      .groupBy(col("name"), col("label_k"), col("day_us"))
      .agg(sum(col("cents")).as("s1"), sum(col("cents") * col("cents")).as("s2"),
        count(lit(1)).as("count_ot"))
      .select(col("name"), col("label_k"), col("day_us"),
        (sqrt(col("s2").cast("double") / col("count_ot").cast("double")
          - (col("s1").cast("double") / col("count_ot").cast("double"))
            * (col("s1").cast("double") / col("count_ot").cast("double"))) / 100.0)
          .as("stddev_ot"),
        col("count_ot"))
      .orderBy(col("name"), col("label_k"), col("day_us"))

  val StddevOverTimeSql: String =
    s"""WITH g AS (
       |  SELECT *, CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |    epoch_us(date_trunc('day', ts)) AS day_us
       |  FROM ($MetricEventsSql) WHERE kind = 'gauge'),
       |m AS (
       |  SELECT name, label_k, day_us,
       |    CAST(SUM(cents) AS BIGINT) AS s1,
       |    CAST(SUM(cents * cents) AS BIGINT) AS s2,
       |    COUNT(*) AS count_ot
       |  FROM g GROUP BY name, label_k, day_us)
       |SELECT name, label_k, day_us,
       |  sqrt(CAST(s2 AS DOUBLE) / CAST(count_ot AS DOUBLE)
       |    - (CAST(s1 AS DOUBLE) / CAST(count_ot AS DOUBLE))
       |      * (CAST(s1 AS DOUBLE) / CAST(count_ot AS DOUBLE))) / 100.0 AS stddev_ot,
       |  count_ot
       |FROM m
       |ORDER BY name, label_k, day_us""".stripMargin

  /** B-range `quantile_over_time(0.5, …)`: per-series daily median of
    * gauge samples, with the same spelled-out linear interpolation as
    * [[quantileAcross]] (rank r = (n−1)·φ over the day's sorted samples)
    * so both engines compute the identical IEEE expression.
    */
  def quantileOverTime(spark: SparkSession, dir: String): DataFrame = {
    val base = Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
    val grp = Seq(col("name"), col("label_k"), col("day_us"))
    val w = Window.partitionBy(grp: _*).orderBy(col("cents"), col("event_id"))
    base
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(grp: _*)))
      .withColumn("pos", (col("n") - 1).cast("double") * 0.5)
      .groupBy(grp: _*)
      .agg(
        ((max(when(col("rn") === floor(col("pos")).cast("long") + 1, col("cents"))).cast("double")
          + (max(when(col("rn") === ceil(col("pos")).cast("long") + 1, col("cents"))).cast("double")
            - max(when(col("rn") === floor(col("pos")).cast("long") + 1, col("cents"))).cast("double"))
          * (max(col("pos")) - floor(max(col("pos"))))) / 100.0).as("median_ot"))
      .orderBy(col("name"), col("label_k"), col("day_us"))
  }

  val QuantileOverTimeSql: String =
    s"""WITH g AS (
       |  SELECT *, CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |    epoch_us(date_trunc('day', ts)) AS day_us
       |  FROM ($MetricEventsSql) WHERE kind = 'gauge'),
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k, day_us
       |                     ORDER BY cents, event_id) AS rn,
       |  COUNT(*) OVER (PARTITION BY name, label_k, day_us) AS n
       |  FROM g),
       |p AS (SELECT *, CAST(n - 1 AS DOUBLE) * 0.5 AS pos FROM r)
       |SELECT name, label_k, day_us,
       |  (MAX(CASE WHEN rn = CAST(FLOOR(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE
       |   + (MAX(CASE WHEN rn = CAST(CEIL(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE
       |      - MAX(CASE WHEN rn = CAST(FLOOR(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE)
       |     * (MAX(pos) - FLOOR(MAX(pos)))) / 100.0 AS median_ot
       |FROM p GROUP BY name, label_k, day_us
       |ORDER BY name, label_k, day_us""".stripMargin

  /** B5b `bottomk(2, …)` — the mirror of [[topk]]; kept separate because
    * PromQL exposes both and the tie-break direction differs.
    */
  def bottomk(spark: SparkSession, dir: String): DataFrame = {
    val snap = counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
    val w = Window.partitionBy(col("name"))
      .orderBy(col("cents").asc, col("label_k"))
    snap.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select(col("name"), col("label_k"),
        (col("cents").cast("double") / 100.0).as("value"), col("rank"))
      .orderBy(col("name"), col("rank"))
  }

  val BottomkSql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k, SUM(cents) AS cents
       |  FROM ($CounterCentsSql) GROUP BY name, label_k),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY name
       |        ORDER BY cents ASC, label_k) AS rank FROM snap)
       |SELECT name, label_k, CAST(cents AS DOUBLE) / 100.0 AS value, rank
       |FROM r WHERE rank <= 2
       |ORDER BY name, rank""".stripMargin

  /** B-resets `resets()`: number of counter resets per series over the
    * range — the companion diagnostic of [[rate]], sharing the wrapped
    * cumulative reconstruction (a reset = the wrapped value decreasing).
    */
  def resets(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(series: _*).orderBy(col("ts"), col("event_id"))
    counterCents(spark, dir)
      .withColumn("wrapped",
        sum(col("cents")).over(w.rowsBetween(Window.unboundedPreceding, 0)) % 100000L)
      .withColumn("prev", lag(col("wrapped"), 1).over(w))
      .groupBy(series: _*)
      .agg(sum(when(col("wrapped") < col("prev"), 1L).otherwise(0L)).as("resets"),
        count(lit(1)).as("n_samples"))
      .orderBy(col("name"), col("label_k"))
  }

  val ResetsSql: String =
    s"""WITH c AS ($CounterCentsSql),
       |w AS (SELECT *,
       |  SUM(cents) OVER (PARTITION BY name, label_k ORDER BY ts, event_id
       |                   ROWS UNBOUNDED PRECEDING) % 100000 AS wrapped
       |  FROM c),
       |d AS (SELECT *,
       |  LAG(wrapped) OVER (PARTITION BY name, label_k
       |                     ORDER BY ts, event_id) AS prev
       |  FROM w)
       |SELECT name, label_k,
       |  CAST(SUM(CASE WHEN wrapped < prev THEN 1 ELSE 0 END) AS BIGINT) AS resets,
       |  COUNT(*) AS n_samples
       |FROM d
       |GROUP BY name, label_k
       |ORDER BY name, label_k""".stripMargin

  /** B-rollup: multi-granularity label summaries via `rollup(name,
    * label)` — totals per series, per family, and grand total in ONE
    * aggregation pass (SURVEY.md §2.3: "cube/rollup available free if a
    * query needs multi-granularity label summaries").
    */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame =
    counterCents(spark, dir)
      .rollup(col("name"), col("label_k"))
      .agg((sum(col("cents")).cast("double") / 100.0).as("value"),
        count(lit(1)).as("n"))
      .select(coalesce(col("name"), lit("<all>")).as("name"),
        coalesce(col("label_k"), lit("<all>")).as("label_k"),
        col("value"), col("n"))
      .orderBy(col("name"), col("label_k"))

  val RollupSummarySql: String =
    s"""SELECT COALESCE(name, '<all>') AS name,
       |  COALESCE(label_k, '<all>') AS label_k,
       |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS value,
       |  COUNT(*) AS n
       |FROM ($CounterCentsSql)
       |GROUP BY ROLLUP (name, label_k)
       |ORDER BY name, label_k""".stripMargin

  /** A1-text: the scrape payload itself — Prometheus text exposition
    * format (`name{Label1="v"} value`), the exact bytes a scraper reads
    * from the reference's endpoint (`/root/reference/prometheus.cpp:73`;
    * series shape per `test.edn:4-6`). The value string is rendered from
    * integer cents (`intpart.fraction2`) — pure integer/string ops that
    * print identically in both engines (double/decimal formatting does
    * not).
    */
  def expositionText(spark: SparkSession, dir: String): DataFrame = {
    val snap = counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
    snap.select(concat(
        col("name"), lit("{k=\""), col("label_k"), lit("\"} "),
        (col("cents") / 100).cast("long").cast("string"), lit("."),
        lpad((col("cents") % 100).cast("string"), 2, "0"))
      .as("line"))
      .orderBy(col("line"))
  }

  val ExpositionTextSql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k, SUM(cents) AS cents
       |  FROM ($CounterCentsSql) GROUP BY name, label_k)
       |SELECT name || '{k="' || label_k || '"} '
       |  || CAST(cents // 100 AS VARCHAR) || '.'
       |  || lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS line
       |FROM snap
       |ORDER BY line""".stripMargin

  /** A1-parse: the scrape-INGEST side of the exposition contract — parse
    * the Prometheus text format (`name{k="v"} value`, the exact payload
    * [[expositionText]] renders and the reference serves at
    * `/root/reference/prometheus.cpp:73`) back into typed series rows.
    * This is what a Prometheus server does with the reference's endpoint
    * bytes; here it is three `regexp_extract` projections — fully
    * codegen'd, no shuffle beyond the snapshot the text came from — and
    * the decimal string parses to double identically in both engines
    * (correctly-rounded decimal→binary conversion), so the round-trip
    * is bit-exact.
    */
  def expositionParse(spark: SparkSession, dir: String): DataFrame = {
    val re = "^(\\w+)\\{k=\"([^\"]*)\"\\} (.+)$"
    expositionText(spark, dir).select(
        regexp_extract(col("line"), re, 1).as("name"),
        regexp_extract(col("line"), re, 2).as("label_k"),
        regexp_extract(col("line"), re, 3).cast("double").as("value"))
      .orderBy(col("name"), col("label_k"))
  }

  val ExpositionParseSql: String = {
    // stripMargin BEFORE splicing ExpositionTextSql — its rendered body
    // contains lines that begin with `||` (string concat), which an
    // outer stripMargin would truncate to `|`
    val body =
      """SELECT regexp_extract(line, '^(\w+)\{k="([^"]*)"\} (.+)$', 1) AS name,
        |  regexp_extract(line, '^(\w+)\{k="([^"]*)"\} (.+)$', 2) AS label_k,
        |  CAST(regexp_extract(line, '^(\w+)\{k="([^"]*)"\} (.+)$', 3) AS DOUBLE) AS value
        |FROM lines
        |ORDER BY name, label_k""".stripMargin
    s"WITH lines AS ($ExpositionTextSql)\n$body"
  }

  /** B39: the TSDB STATS surface (`/api/v1/status/tsdb` — the
    * cardinality dashboard Grafana and every capacity review read):
    * head stats (series count, distinct label pairs, chunk count under
    * the read door's 120-sample convention, min/max sample time) and
    * the three cardinality breakdowns (series per metric name, distinct
    * values per label name, series per label=value pair) plus the
    * label-bytes accounting — every row a plain aggregate over the
    * events relation, map-side combinable, nothing driver-side beyond
    * the O(labels) response. One (section, name, value) relation so the
    * whole surface hash-gates against a DuckDB twin.
    */
  def tsdbStats(spark: SparkSession, dir: String): DataFrame = {
    val m = Metrics.metricEvents(spark, dir)
      .select(col("name"), coalesce(col("label_k"), lit("")).as("label_k"),
        col("label_instance"), unix_millis(col("ts")).as("ts_ms"))
    val series = m.groupBy(col("name"), col("label_k"),
      col("label_instance")).agg(count(lit(1)).as("n"))
    // one row per (series, label) with empty values dropped — the
    // engine's series-identity convention (and upstream's: empty
    // labels are absent labels)
    val pairs = series.select(
      explode(map(lit("__name__"), col("name"),
        lit("instance"), col("label_instance"),
        lit("k"), col("label_k"))).as(Seq("lbl", "v")))
      .filter(col("v") =!= "")
    val bounds = m.agg(min(col("ts_ms")).as("mn"), max(col("ts_ms")).as("mx"))
    val head = series
      .agg(count(lit(1)).as("numSeries"),
        sum(ceil(col("n").cast("double") / 120.0).cast("long"))
          .as("chunkCount"))
      .crossJoin(bounds)
      .select(expr("stack(4, 'numSeries', numSeries, " +
        "'chunkCount', chunkCount, 'minTime', mn, 'maxTime', mx)")
        .as(Seq("name", "value")))
      .select(lit("headStats").as("section"), col("name"), col("value"))
    val nlp = pairs.select(col("lbl"), col("v")).distinct()
      .agg(count(lit(1)).as("value"))
      .select(lit("headStats").as("section"),
        lit("numLabelPairs").as("name"), col("value"))
    val byMetric = series.groupBy(col("name"))
      .agg(count(lit(1)).as("value"))
      .select(lit("seriesCountByMetricName").as("section"), col("name"),
        col("value"))
    val byLabel = pairs.groupBy(col("lbl"))
      .agg(countDistinct(col("v")).as("value"))
      .select(lit("labelValueCountByLabelName").as("section"),
        col("lbl").as("name"), col("value"))
    val byPair = pairs.groupBy(col("lbl"), col("v"))
      .agg(count(lit(1)).as("value"))
      .select(lit("seriesCountByLabelValuePair").as("section"),
        concat(col("lbl"), lit("="), col("v")).as("name"), col("value"))
    val bytes = pairs.groupBy(col("lbl"))
      .agg(sum((length(col("lbl")) + length(col("v"))).cast("long"))
        .as("value"))
      .select(lit("memoryInBytesByLabelName").as("section"),
        col("lbl").as("name"), col("value"))
    head.unionByName(nlp).unionByName(byMetric).unionByName(byLabel)
      .unionByName(byPair).unionByName(bytes)
      .orderBy(col("section"), col("name"))
  }

  val TsdbStatsSql: String =
    s"""WITH m AS (
       |  SELECT name, COALESCE(label_k, '') AS label_k, label_instance,
       |    epoch_us(ts) // 1000 AS ts_ms
       |  FROM ($MetricEventsSql)),
       |series AS (
       |  SELECT name, label_k, label_instance, COUNT(*) AS n
       |  FROM m GROUP BY name, label_k, label_instance),
       |pairs AS (
       |  SELECT lbl, v FROM (
       |    SELECT '__name__' AS lbl, name AS v FROM series
       |    UNION ALL SELECT 'instance', label_instance FROM series
       |    UNION ALL SELECT 'k', label_k FROM series)
       |  WHERE v <> ''),
       |head AS (
       |  SELECT 'headStats' AS section, x.name,
       |    CAST(x.value AS BIGINT) AS value
       |  FROM (
       |    SELECT 'numSeries' AS name,
       |      (SELECT COUNT(*) FROM series) AS value
       |    UNION ALL SELECT 'chunkCount',
       |      (SELECT SUM(CAST(CEIL(CAST(n AS DOUBLE) / 120.0) AS BIGINT))
       |       FROM series)
       |    UNION ALL SELECT 'minTime', (SELECT MIN(ts_ms) FROM m)
       |    UNION ALL SELECT 'maxTime', (SELECT MAX(ts_ms) FROM m)
       |    UNION ALL SELECT 'numLabelPairs',
       |      (SELECT COUNT(*) FROM (SELECT DISTINCT lbl, v FROM pairs))
       |  ) x)
       |SELECT section, name, value FROM head
       |UNION ALL
       |SELECT 'seriesCountByMetricName', name, COUNT(*)
       |FROM series GROUP BY name
       |UNION ALL
       |SELECT 'labelValueCountByLabelName', lbl, COUNT(DISTINCT v)
       |FROM pairs GROUP BY lbl
       |UNION ALL
       |SELECT 'seriesCountByLabelValuePair', lbl || '=' || v, COUNT(*)
       |FROM pairs GROUP BY lbl, v
       |UNION ALL
       |SELECT 'memoryInBytesByLabelName', lbl,
       |  CAST(SUM(LENGTH(lbl) + LENGTH(v)) AS BIGINT)
       |FROM pairs GROUP BY lbl
       |ORDER BY section, name""".stripMargin

  /** B40: HA REPLICA DEDUPLICATION — the Thanos/Mimir
    * `--query.replica-label` semantics over this engine's label model:
    * two Prometheus replicas scraping the same targets produce the
    * same series under different replica labels, and the query tier
    * must serve ONE of them, not double-counted both. Treating
    * `instance` as the replica label: per logical series (name, k),
    * pick the replica whose LAST sample is newest (the
    * freshest-replica rule Mimir applies; ties break on the
    * lexicographically smallest replica for determinism) and serve
    * only its samples. One hash aggregate elects winners (map-side
    * combinable, O(series)); the winner relation joins back
    * broadcast — replica counts are tiny by construction — so the
    * corpus-sized side never shuffles twice.
    */
  def haDedup(spark: SparkSession, dir: String): DataFrame = {
    val m = Metrics.metricEvents(spark, dir)
      .select(col("name"), coalesce(col("label_k"), lit("")).as("label_k"),
        col("label_instance"), unix_millis(col("ts")).as("ts_ms"),
        col("value"))
    // election: freshest replica per logical series; ties prefer the
    // SMALLEST replica name — max_by on (last_ts, negated-order name)
    // via a struct ordering with the name's complement is awkward, so
    // use min_by on (-last_ts, name): smallest = (newest ts, first name)
    val winners = m
      .groupBy(col("name"), col("label_k"), col("label_instance"))
      .agg(max(col("ts_ms")).as("last_ts"))
      .groupBy(col("name"), col("label_k"))
      .agg(min_by(col("label_instance"),
        struct((-col("last_ts")).as("a"), col("label_instance").as("b")))
        .as("label_instance"))
    m.join(broadcast(winners), Seq("name", "label_k", "label_instance"))
      .groupBy(col("name"), col("label_k"), col("label_instance"))
      .agg(count(lit(1)).as("n_samples"),
        max(col("ts_ms")).as("last_ts_ms"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("v_sum"))
      .orderBy(col("name"), col("label_k"))
  }

  val HaDedupSql: String =
    s"""WITH m AS (
       |  SELECT name, COALESCE(label_k, '') AS label_k, label_instance,
       |    epoch_us(ts) // 1000 AS ts_ms, value
       |  FROM ($MetricEventsSql)),
       |reps AS (
       |  SELECT name, label_k, label_instance, MAX(ts_ms) AS last_ts
       |  FROM m GROUP BY name, label_k, label_instance),
       |winners AS (
       |  SELECT name, label_k, label_instance FROM (
       |    SELECT name, label_k, label_instance,
       |      ROW_NUMBER() OVER (PARTITION BY name, label_k
       |        ORDER BY last_ts DESC, label_instance) AS rn
       |    FROM reps) WHERE rn = 1)
       |SELECT m.name, m.label_k, m.label_instance,
       |  COUNT(*) AS n_samples,
       |  MAX(m.ts_ms) AS last_ts_ms,
       |  CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
       |FROM m
       |JOIN winners w ON w.name = m.name AND w.label_k = m.label_k
       |  AND w.label_instance = m.label_instance
       |GROUP BY m.name, m.label_k, m.label_instance
       |ORDER BY m.name, m.label_k""".stripMargin

  /** A1-relabel: `metric_relabel_configs` over a scraped payload — the
    * scrape door's label-set rewrite every production Prometheus runs
    * before ingest (the server-side half the reference's pull endpoint
    * implies, `/root/reference/prometheus.cpp:73`). The payload is the
    * engine's own exposition bytes; [[graft.sources.ScrapeClient
    * .parsePayloadsLabels]] parses and relabels with pure column
    * expressions (stateless, codegen, batch ≡ streaming), exercising
    * drop (the `click` family is pruned BEFORE any ingest state),
    * replace with capture-group expansion, uppercase, and labelmap.
    * The DuckDB twin re-applies the same anchored-regex rules over the
    * same parsed lines.
    */
  def scrapeRelabel(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{Relabel, ScrapeClient}
    val payloads = expositionText(spark, dir)
      .agg(array_join(array_sort(collect_list(col("line"))), "\n")
        .as("payload"))
      .withColumn("scrape_ts", to_timestamp(lit("2024-03-01 00:00:00")))
    val rules = Seq(
      Relabel.Rule(action = "drop", sourceLabels = Seq("__name__"),
        regex = "click"),
      Relabel.Rule(action = "replace", sourceLabels = Seq("k"),
        regex = "([0-9])([0-9])", targetLabel = "shard",
        replacement = "$1-$2"),
      Relabel.Rule(action = "uppercase", sourceLabels = Seq("__name__"),
        targetLabel = "fam"),
      Relabel.Rule(action = "labelmap", regex = "k",
        replacement = "kcopy"))
    ScrapeClient.parsePayloadsLabels(payloads, rules)
      .select(
        element_at(col("labels"), "__name__").as("name"),
        coalesce(element_at(col("labels"), "k"), lit("")).as("k"),
        coalesce(element_at(col("labels"), "shard"), lit("")).as("shard"),
        coalesce(element_at(col("labels"), "fam"), lit("")).as("fam"),
        coalesce(element_at(col("labels"), "kcopy"), lit("")).as("kcopy"),
        col("value"))
      .orderBy(col("name"), col("k"))
  }

  val ScrapeRelabelSql: String = {
    // parse the same exposition lines, then re-apply the rule chain:
    // anchored regexes, later rules see earlier rules' writes
    val body =
      """parsed AS (
        |  SELECT regexp_extract(line, '^(\w+)\{k="([^"]*)"\} (.+)$', 1) AS name,
        |    regexp_extract(line, '^(\w+)\{k="([^"]*)"\} (.+)$', 2) AS label_k,
        |    CAST(regexp_extract(line, '^(\w+)\{k="([^"]*)"\} (.+)$', 3) AS DOUBLE) AS value
        |  FROM lines),
        |kept AS (SELECT * FROM parsed
        |  WHERE NOT regexp_matches(name, '^(?:click)$'))
        |SELECT name, label_k AS k,
        |  CASE WHEN regexp_matches(label_k, '^(?:([0-9])([0-9]))$')
        |    THEN regexp_replace(label_k, '^(?:([0-9])([0-9]))$', '\1-\2')
        |    ELSE '' END AS shard,
        |  upper(name) AS fam,
        |  label_k AS kcopy,
        |  value
        |FROM kept
        |ORDER BY name, k""".stripMargin
    s"WITH lines AS ($ExpositionTextSql),\n$body"
  }

  /** `honor_labels` over the corpus exposition — the scrape-door
    * attach law hash-gated on real data: a metric-relabel chain writes
    * an exposed `instance` on every sample and an exposed `job` on the
    * purchase family only, then the target identity
    * `{instance="localhost:9090", job="graft"}` attaches BOTH ways
    * ([[graft.sources.ScrapeClient.attachTargetLabels]]):
    * `honor` — the exposed label wins, the target pair lands only
    * where absent; `export` — the target pair always lands and the
    * exposed clash moves under `exported_<name>`. One relation, both
    * modes, every label face a column.
    */
  def honorLabels(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{Relabel, ScrapeClient}
    val payloads = expositionText(spark, dir)
      .agg(array_join(array_sort(collect_list(col("line"))), "\n")
        .as("payload"))
      .withColumn("scrape_ts", to_timestamp(lit("2024-03-01 00:00:00")))
    val rules = Seq(
      Relabel.Rule(action = "replace", sourceLabels = Seq("k"),
        regex = "(.*)", targetLabel = "instance", replacement = "exp-$1"),
      Relabel.Rule(action = "replace", sourceLabels = Seq("__name__"),
        regex = "purchase", targetLabel = "job",
        replacement = "exposed-job"))
    val samples = ScrapeClient.parsePayloadsLabels(payloads, rules)
    val target = Map("instance" -> "localhost:9090", "job" -> "graft")
    def face(honor: Boolean): DataFrame =
      ScrapeClient.attachTargetLabels(samples, target, honor)
        .select(
          lit(if (honor) "honor" else "export").as("mode"),
          element_at(col("labels"), "__name__").as("name"),
          coalesce(element_at(col("labels"), "k"), lit("")).as("k"),
          coalesce(element_at(col("labels"), "instance"), lit(""))
            .as("instance"),
          coalesce(element_at(col("labels"), "exported_instance"),
            lit("")).as("exported_instance"),
          coalesce(element_at(col("labels"), "job"), lit("")).as("job"),
          coalesce(element_at(col("labels"), "exported_job"), lit(""))
            .as("exported_job"),
          col("value"))
    face(honor = true).unionAll(face(honor = false))
      .orderBy(col("mode"), col("name"), col("k"))
  }

  /** Oracle twin of [[honorLabels]]: parse the same exposition lines,
    * re-derive the two relabel writes, then spell out both attach
    * modes' outcomes per column.
    */
  val HonorLabelsSql: String = {
    val body =
      """parsed AS (
        |  SELECT regexp_extract(line, '^([a-z_]+)\{k="([^"]*)"\} (-?[0-9.]+)$', 1) AS name,
        |    regexp_extract(line, '^([a-z_]+)\{k="([^"]*)"\} (-?[0-9.]+)$', 2) AS k,
        |    CAST(regexp_extract(line, '^([a-z_]+)\{k="([^"]*)"\} (-?[0-9.]+)$', 3) AS DOUBLE) AS value
        |  FROM lines
        |  WHERE regexp_matches(line, '^[a-z_]+\{k="[^"]*"\} -?[0-9.]+$')),
        |lab AS (
        |  SELECT name, k, value,
        |    'exp-' || k AS exp_inst,
        |    CASE WHEN name = 'purchase' THEN 'exposed-job' ELSE '' END AS exp_job
        |  FROM parsed)
        |SELECT * FROM (
        |  SELECT 'honor' AS mode, name, k,
        |    exp_inst AS instance, '' AS exported_instance,
        |    CASE WHEN exp_job <> '' THEN exp_job ELSE 'graft' END AS job,
        |    '' AS exported_job, value
        |  FROM lab
        |  UNION ALL
        |  SELECT 'export' AS mode, name, k,
        |    'localhost:9090' AS instance, exp_inst AS exported_instance,
        |    'graft' AS job, exp_job AS exported_job, value
        |  FROM lab)
        |ORDER BY mode, name, k""".stripMargin
    s"WITH lines AS ($ExpositionTextSql),\n$body"
  }

  /** A1-OpenMetrics: the SAME registry snapshot rendered as an
    * OpenMetrics 1.0 payload (the successor exposition format the
    * reference's prometheus-cpp pull endpoint predates): `# TYPE`
    * headers per family, counter samples under the `_total` suffix,
    * gauges plain, histograms as the full ladder — `_bucket` lines
    * with cumulative counts INCLUDING the mandatory `le="+Inf"` row,
    * `_sum`/`_count` — and per-bucket EXEMPLARS (`# {event_id="…"} v`):
    * the last observation landing in each non-cumulative bucket,
    * (ts, event_id)-anchored like every last-sample in this engine.
    * The whole payload is ONE row ending in `# EOF`, assembled by
    * sorting the (family, series, position) line relation — the
    * collect is O(lines) = O(#series × ladder), the registry bound the
    * reference itself carries, same as the serving sink. Values render
    * from integer cents; counts render as bare integers — pure
    * integer/string ops, so the DuckDB twin's bytes are identical and
    * the payload hash-gates.
    */
  def openMetricsText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def rend(cents: Column): Column = concat(
      (cents.cast("long") / 100).cast("long").cast("string"), lit("."),
      lpad((cents.cast("long") % 100).cast("string"), 2, "0"))
    val m = Metrics.metricEvents(spark, dir)
    // counters: snapshot totals under `_total`
    val cSnap = counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
    val cLines = cSnap.select(col("name").as("fam"), col("label_k"),
      lit(10).as("ord"),
      concat(col("name"), lit("_total{k=\""), col("label_k"), lit("\"} "),
        rend(col("cents"))).as("line"))
    // gauges: last-write-wins, plain name
    val wg = Window.partitionBy(col("name"), col("label_k"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val gSnap = m.filter(col("kind") === "gauge")
      .withColumn("rn", row_number().over(wg)).filter(col("rn") === 1)
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
    val gLines = gSnap.select(col("name").as("fam"), col("label_k"),
      lit(10).as("ord"),
      concat(col("name"), lit("{k=\""), col("label_k"), lit("\"} "),
        rend(col("cents"))).as("line"))
    // histograms: ladder + exemplars from bucketed observations
    val h = m.filter(col("kind") === "histogram")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("ts_us", unix_micros(col("ts")))
    val bounds = graft.model.MetricEvent.Buckets
    val bounds2 = bounds.zip(0.0 +: bounds.init).zipWithIndex
      .map { case ((le, lo), i) => (i + 1, lo, le) }
      .toDF("bidx", "lo", "le")
    val leStr = concat(col("le").cast("long").cast("string"), lit(".0"))
    val cum = h.crossJoin(broadcast(bounds2.select(col("bidx"), col("le"))))
      .groupBy(col("name"), col("label_k"), col("bidx"), col("le"))
      .agg(sum(when(col("value") <= col("le"), 1L).otherwise(0L)).as("cum"))
    val ex = h.join(broadcast(bounds2),
        col("value") > col("lo") && col("value") <= col("le"))
      .groupBy(col("name"), col("label_k"), col("bidx"))
      .agg(expr("max_by(cents, struct(ts_us, event_id))").as("ex_cents"),
        expr("max_by(event_id, struct(ts_us, event_id))").as("ex_id"))
    val bLines = cum.join(ex, Seq("name", "label_k", "bidx"), "left")
      .select(col("name").as("fam"), col("label_k"),
        (lit(10) + col("bidx")).as("ord"),
        concat(col("name"), lit("_bucket{k=\""), col("label_k"),
          lit("\",le=\""), leStr, lit("\"} "), col("cum").cast("string"),
          when(col("ex_id").isNotNull,
            concat(lit(" # {event_id=\""), col("ex_id").cast("string"),
              lit("\"} "), rend(col("ex_cents")))).otherwise(lit("")))
          .as("line"))
    val tot = h.groupBy(series: _*)
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    val infLines = tot.select(col("name").as("fam"), col("label_k"),
      lit(50).as("ord"),
      concat(col("name"), lit("_bucket{k=\""), col("label_k"),
        lit("\",le=\"+Inf\"} "), col("n").cast("string")).as("line"))
    val sumLines = tot.select(col("name").as("fam"), col("label_k"),
      lit(51).as("ord"),
      concat(col("name"), lit("_sum{k=\""), col("label_k"), lit("\"} "),
        rend(col("sum_cents"))).as("line"))
    val cntLines = tot.select(col("name").as("fam"), col("label_k"),
      lit(52).as("ord"),
      concat(col("name"), lit("_count{k=\""), col("label_k"), lit("\"} "),
        col("n").cast("string")).as("line"))
    // TYPE headers (label_k = "" sorts before every series block)
    def types(src: DataFrame, kind: String): DataFrame =
      src.select(col("name")).distinct()
        .select(col("name").as("fam"), lit("").as("label_k"),
          lit(0).as("ord"),
          concat(lit("# TYPE "), col("name"), lit(s" $kind")).as("line"))
    val lines = Seq(
      types(cSnap, "counter"), cLines,
      types(gSnap, "gauge"), gLines,
      types(tot, "histogram"), bLines, infLines, sumLines, cntLines)
      .reduce(_ unionByName _)
    lines
      .select(struct(col("fam"), col("label_k"), col("ord"), col("line")).as("s"))
      .agg(collect_list(col("s")).as("ss"))
      .select(concat(
        array_join(transform(array_sort(col("ss")), s => s("line")), "\n"),
        lit("\n# EOF")).as("payload"))
  }

  /** Shared cents→string rendering for the DuckDB twin. */
  private def rendSql(cents: String): String =
    s"CAST($cents // 100 AS VARCHAR) || '.' || lpad(CAST($cents % 100 AS VARCHAR), 2, '0')"

  val OpenMetricsTextSql: String = {
    val bounds = graft.model.MetricEvent.Buckets
    val bounds2 = bounds.zip(0.0 +: bounds.init).zipWithIndex
      .map { case ((le, lo), i) => s"(${i + 1}, $lo, $le)" }.mkString(",")
    s"""WITH m AS ($MetricEventsSql),
       |c AS (SELECT name, label_k, SUM(cents) AS cents
       |      FROM ($CounterCentsSql) GROUP BY name, label_k),
       |g AS (SELECT name, label_k,
       |        CAST(round(value * 100, 0) AS BIGINT) AS cents
       |      FROM (SELECT *, ROW_NUMBER() OVER (
       |              PARTITION BY name, label_k
       |              ORDER BY ts DESC, event_id DESC) AS rn
       |            FROM m WHERE kind = 'gauge') WHERE rn = 1),
       |h AS (SELECT name, label_k, value,
       |        CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |        epoch_us(ts) AS ts_us, event_id
       |      FROM m WHERE kind = 'histogram'),
       |b2 AS (SELECT * FROM (VALUES $bounds2) b(bidx, lo, le)),
       |cum AS (
       |  SELECT h.name, h.label_k, b2.bidx, b2.le,
       |    SUM(CASE WHEN h.value <= b2.le THEN 1 ELSE 0 END) AS cum
       |  FROM h CROSS JOIN b2 GROUP BY h.name, h.label_k, b2.bidx, b2.le),
       |ex AS (
       |  SELECT name, label_k, bidx, cents AS ex_cents, event_id AS ex_id
       |  FROM (SELECT h.*, b2.bidx, ROW_NUMBER() OVER (
       |          PARTITION BY h.name, h.label_k, b2.bidx
       |          ORDER BY h.ts_us DESC, h.event_id DESC) AS rn
       |        FROM h JOIN b2 ON h.value > b2.lo AND h.value <= b2.le)
       |  WHERE rn = 1),
       |tot AS (SELECT name, label_k, COUNT(*) AS n, SUM(cents) AS sum_cents
       |        FROM h GROUP BY name, label_k),
       |lines AS (
       |  SELECT name AS fam, '' AS label_k, 0 AS ord,
       |    '# TYPE ' || name || ' counter' AS line
       |  FROM (SELECT DISTINCT name FROM c)
       |  UNION ALL
       |  SELECT name, label_k, 10,
       |    name || '_total{k="' || label_k || '"} ' || ${rendSql("cents")}
       |  FROM c
       |  UNION ALL
       |  SELECT name, '', 0, '# TYPE ' || name || ' gauge'
       |  FROM (SELECT DISTINCT name FROM g)
       |  UNION ALL
       |  SELECT name, label_k, 10,
       |    name || '{k="' || label_k || '"} ' || ${rendSql("cents")}
       |  FROM g
       |  UNION ALL
       |  SELECT name, '', 0, '# TYPE ' || name || ' histogram'
       |  FROM (SELECT DISTINCT name FROM tot)
       |  UNION ALL
       |  SELECT cum.name, cum.label_k, 10 + cum.bidx,
       |    cum.name || '_bucket{k="' || cum.label_k || '",le="'
       |      || CAST(CAST(cum.le AS BIGINT) AS VARCHAR) || '.0"} '
       |      || CAST(cum.cum AS VARCHAR)
       |      || COALESCE(' # {event_id="' || CAST(ex.ex_id AS VARCHAR)
       |           || '"} ' || ${rendSql("ex.ex_cents")}, '')
       |  FROM cum LEFT JOIN ex ON ex.name = cum.name
       |    AND ex.label_k = cum.label_k AND ex.bidx = cum.bidx
       |  UNION ALL
       |  SELECT name, label_k, 50,
       |    name || '_bucket{k="' || label_k || '",le="+Inf"} '
       |      || CAST(n AS VARCHAR)
       |  FROM tot
       |  UNION ALL
       |  SELECT name, label_k, 51,
       |    name || '_sum{k="' || label_k || '"} ' || ${rendSql("sum_cents")}
       |  FROM tot
       |  UNION ALL
       |  SELECT name, label_k, 52,
       |    name || '_count{k="' || label_k || '"} ' || CAST(n AS VARCHAR)
       |  FROM tot)
       |SELECT string_agg(line, chr(10)
       |         ORDER BY fam, label_k, ord, line) || chr(10) || '# EOF'
       |  AS payload
       |FROM lines""".stripMargin
  }

  /** A1-OpenMetrics-parse: the ingest half — split the payload back
    * into typed rows (family, suffix, label, le, value, exemplar).
    * Comment/EOF lines drop; sample lines parse with plain string
    * surgery (suffix by `ends_with` on the pre-`{` base, fields by
    * anchored regex) — both engines run the identical steps over the
    * identical bytes, so the round-trip hash-gates like a1d.
    */
  def openMetricsParse(spark: SparkSession, dir: String): DataFrame = {
    val base = regexp_extract(col("line"), "^([a-z_]+)\\{", 1)
    def suf(s: String): Column = base.endsWith(s)
    val re = "^[a-z_]+\\{k=\"([^\"]*)\"(?:,le=\"([^\"]*)\")?\\} ([0-9.]+)" +
      "(?: # \\{event_id=\"([0-9]+)\"\\} ([0-9.]+))?$"
    openMetricsText(spark, dir)
      .select(explode(split(col("payload"), "\n")).as("line"))
      .filter(!col("line").startsWith("#"))
      .select(
        when(suf("_total"), regexp_replace(base, "_total$", ""))
          .when(suf("_bucket"), regexp_replace(base, "_bucket$", ""))
          .when(suf("_sum"), regexp_replace(base, "_sum$", ""))
          .when(suf("_count"), regexp_replace(base, "_count$", ""))
          .otherwise(base).as("name"),
        when(suf("_total"), "total").when(suf("_bucket"), "bucket")
          .when(suf("_sum"), "sum").when(suf("_count"), "count")
          .otherwise(lit("gauge")).as("suffix"),
        regexp_extract(col("line"), re, 1).as("label_k"),
        nullif(regexp_extract(col("line"), re, 2), lit("")).as("le"),
        regexp_extract(col("line"), re, 3).cast("double").as("value"),
        nullif(regexp_extract(col("line"), re, 4), lit("")).cast("long")
          .as("exemplar_id"),
        nullif(regexp_extract(col("line"), re, 5), lit("")).cast("double")
          .as("exemplar_value"))
      .orderBy(col("name"), col("suffix"), col("label_k"), col("le"))
  }

  val OpenMetricsParseSql: String = {
    val re = """^[a-z_]+\{k="([^"]*)"(?:,le="([^"]*)")?\} ([0-9.]+)""" +
      """(?: # \{event_id="([0-9]+)"\} ([0-9.]+))?$"""
    // stripMargin BEFORE splicing OpenMetricsTextSql (its rendered body
    // has lines beginning with `||` — see ExpositionParseSql)
    val body =
      s"""ln AS (SELECT unnest(string_split(payload, chr(10))) AS line FROM om),
       |s AS (SELECT line,
       |        regexp_extract(line, '^([a-z_]+)\\{', 1) AS base
       |      FROM ln WHERE line NOT LIKE '#%'),
       |p AS (SELECT line,
       |  CASE WHEN ends_with(base, '_total') THEN regexp_replace(base, '_total$$', '')
       |       WHEN ends_with(base, '_bucket') THEN regexp_replace(base, '_bucket$$', '')
       |       WHEN ends_with(base, '_sum') THEN regexp_replace(base, '_sum$$', '')
       |       WHEN ends_with(base, '_count') THEN regexp_replace(base, '_count$$', '')
       |       ELSE base END AS name,
       |  CASE WHEN ends_with(base, '_total') THEN 'total'
       |       WHEN ends_with(base, '_bucket') THEN 'bucket'
       |       WHEN ends_with(base, '_sum') THEN 'sum'
       |       WHEN ends_with(base, '_count') THEN 'count'
       |       ELSE 'gauge' END AS suffix
       |  FROM s)
       |SELECT p.name, p.suffix,
       |  regexp_extract(p.line, '$re', 1) AS label_k,
       |  nullif(regexp_extract(p.line, '$re', 2), '') AS le,
       |  CAST(regexp_extract(p.line, '$re', 3) AS DOUBLE) AS value,
       |  CAST(nullif(regexp_extract(p.line, '$re', 4), '') AS BIGINT) AS exemplar_id,
       |  CAST(nullif(regexp_extract(p.line, '$re', 5), '') AS DOUBLE) AS exemplar_value
       |FROM p
       |ORDER BY name, suffix, label_k, le""".stripMargin
    s"WITH om AS ($OpenMetricsTextSql),\n$body"
  }

  /** The EXEMPLAR STORE twin: per (histogram series, `le` bucket), the
    * anchored freshest observation — exactly the exemplar the
    * OpenMetrics emission attaches to each bucket line
    * (`# {event_id="…"} v`, [[openMetricsText]]), surfaced as a
    * queryable relation for `/api/v1/query_exemplars`. `event_id` is
    * this engine's trace-id analog (the reference ships raw samples
    * with ids, `prometheus.cpp:256-306`); the anchor is the
    * (ts, event_id) max, so the store is deterministic under any
    * partitioning. Values above the last finite bound carry no
    * exemplar, mirroring the emission.
    *
    * 100 TB shape: one broadcast range-join onto 7 bounds + one hash
    * aggregate — output ∝ series × buckets, observation payloads never
    * shuffle past the partial aggregation.
    */
  def exemplars(spark: SparkSession, dir: String): DataFrame =
    exemplarsOf(Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "histogram"))

  /** Core of [[exemplars]] over any pre-filtered histogram-observation
    * relation (the query_exemplars API applies selector + time bounds
    * first).
    */
  private[graft] def exemplarsOf(obs: DataFrame): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    val m = obs.withColumn("ts_us", unix_micros(col("ts")))
    val bounds = graft.model.MetricEvent.Buckets
    val b2 = bounds.zip(0.0 +: bounds.init)
      .map { case (le, lo) => (lo, le) }.toDF("lo", "le")
    m.join(broadcast(b2), col("value") > col("lo") && col("value") <= col("le"))
      .groupBy(col("name"), col("label_k"), col("label_instance"), col("le"))
      .agg(
        expr("max_by(event_id, struct(ts_us, event_id))").as("event_id"),
        expr("max_by(value, struct(ts_us, event_id))").as("value"),
        expr("max_by(ts_us, struct(ts_us, event_id))").as("ts_us"))
      .orderBy(col("name"), col("label_k"), col("label_instance"), col("le"))
  }

  val ExemplarsSql: String = {
    val bounds = graft.model.MetricEvent.Buckets
    val pairs = bounds.zip(0.0 +: bounds.init)
      .map { case (le, lo) => s"($lo, $le)" }.mkString(",")
    s"""WITH m AS ($MetricEventsSql),
       |b AS (SELECT * FROM (VALUES $pairs) b(lo, le)),
       |r AS (
       |  SELECT m.name, m.label_k, m.label_instance, b.le, m.event_id,
       |    m.value, epoch_us(m.ts) AS ts_us,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY m.name, m.label_k, m.label_instance, b.le
       |      ORDER BY m.ts DESC, m.event_id DESC) AS rn
       |  FROM m JOIN b ON m.value > b.lo AND m.value <= b.le
       |  WHERE m.kind = 'histogram')
       |SELECT name, label_k, label_instance, le, event_id, value, ts_us
       |FROM r WHERE rn = 1
       |ORDER BY name, label_k, label_instance, le""".stripMargin
  }

  /** B-session: gap-based sessionization of the event stream per user —
    * Spark's native `session_window` (30-minute inactivity gap), the
    * batch twin of the streaming session-window operator (SURVEY.md §2.3
    * "session windows"). The oracle reproduces the same boundaries with
    * the classic gaps-and-islands formulation (lag + cumulative flag
    * sum), proving the two definitions agree: a new session starts when
    * the gap since the previous event EXCEEDS the gap duration — Spark's
    * session end (`ts + gap`) is merge-inclusive, so a gap of exactly
    * the duration still merges (boundary pinned by PromQLSpec).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    Metrics.metricEvents(spark, dir)
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .groupBy(col("name"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("cents")).cast("double") / 100.0).as("total_value"))
      .select(col("name"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("total_value"))
      .orderBy(col("name"), col("session_start_us"))

  val SessionizeSql: String =
    s"""WITH m AS (
       |  SELECT name, ts, CAST(round(value * 100, 0) AS BIGINT) AS cents
       |  FROM ($MetricEventsSql)),
       |flagged AS (
       |  SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY name ORDER BY ts)
       |                      <= INTERVAL 30 MINUTE
       |                 THEN 0 ELSE 1 END AS new_session
       |  FROM m),
       |islands AS (
       |  SELECT *, SUM(new_session) OVER (PARTITION BY name ORDER BY ts
       |              ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM flagged)
       |SELECT name, epoch_us(MIN(ts)) AS session_start_us,
       |  COUNT(*) AS n_events,
       |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_value
       |FROM islands
       |GROUP BY name, session_id
       |ORDER BY name, session_start_us""".stripMargin

  /** B35: funnel conversion over the raw event stream — the behavioral
    * companion of B16's sessionization: of the users who clicked, how
    * many VIEWED within a day of their first click, and of those, how
    * many PURCHASED within a day of that first view (click → view →
    * purchase, each stage anchored at the previous stage's FIRST
    * qualifying event — the standard ordered-funnel definition). Stage
    * populations and two per-stage conversion rates (each ONE divide of
    * exact counts) in a single row.
    *
    * Scale shape: each stage is an event-type-filtered scan (predicate
    * pushed to parquet) joined on user_id with the time bound as
    * residual, then a per-user min — user-keyed shuffles only, fan-out
    * bounded by events-per-user, no window over the full stream. The
    * three 1-row counts broadcast into the final select.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("fc"))
    val views = clicks
      .join(ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("vts")), Seq("user_id"))
      .filter(col("vts") >= col("fc") &&
        col("vts") <= col("fc") + expr("INTERVAL 1 DAY"))
      .groupBy(col("user_id")).agg(min(col("vts")).as("fv"))
    val buyers = views
      .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts")), Seq("user_id"))
      .filter(col("pts") >= col("fv") &&
        col("pts") <= col("fv") + expr("INTERVAL 1 DAY"))
      .select(col("user_id")).distinct()
    val nC = clicks.agg(count(lit(1)).as("n_clickers"))
    val nV = views.agg(count(lit(1)).as("n_viewers"))
    val nP = buyers.agg(count(lit(1)).as("n_buyers"))
    nC.crossJoin(broadcast(nV)).crossJoin(broadcast(nP))
      .select(col("n_clickers"), col("n_viewers"), col("n_buyers"),
        (col("n_viewers").cast("double") / col("n_clickers").cast("double"))
          .as("view_rate"),
        (col("n_buyers").cast("double") / col("n_viewers").cast("double"))
          .as("purchase_rate"))
  }

  val FunnelSql: String =
    """WITH c AS (
      |  SELECT user_id, MIN(ts) AS fc FROM events
      |  WHERE event_type = 'click' GROUP BY user_id),
      |v AS (
      |  SELECT c.user_id, MIN(e.ts) AS fv
      |  FROM c JOIN events e ON e.user_id = c.user_id
      |    AND e.event_type = 'view'
      |    AND e.ts >= c.fc AND e.ts <= c.fc + INTERVAL 1 DAY
      |  GROUP BY c.user_id),
      |p AS (
      |  SELECT DISTINCT v.user_id
      |  FROM v JOIN events e ON e.user_id = v.user_id
      |    AND e.event_type = 'purchase'
      |    AND e.ts >= v.fv AND e.ts <= v.fv + INTERVAL 1 DAY)
      |SELECT
      |  (SELECT COUNT(*) FROM c) AS n_clickers,
      |  (SELECT COUNT(*) FROM v) AS n_viewers,
      |  (SELECT COUNT(*) FROM p) AS n_buyers,
      |  CAST((SELECT COUNT(*) FROM v) AS DOUBLE)
      |    / CAST((SELECT COUNT(*) FROM c) AS DOUBLE) AS view_rate,
      |  CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
      |    / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS purchase_rate""".stripMargin

  /** B36: weekly cohort retention — the third classic behavioral view
    * after sessions (B16) and funnels (B35): users grouped by
    * first-seen week (cohort), each cohort's share still active k weeks
    * later. Week index = days-since-2024-01-01 div 7 — pure integer
    * calendar arithmetic, identical both engines. Exact distinct
    * counts; retention is ONE divide per matrix cell.
    *
    * Scale shape: one user-keyed aggregate for cohorts, one distinct
    * over (user, week) activity pairs, one join back on user_id, then
    * a matrix-sized (weeks²) rollup — the event stream shuffles only on
    * user_id, and nothing wider than (user, week) ever moves.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"),
        expr("cast(datediff(to_date(ts), date'2024-01-01') as bigint) div 7")
          .as("week"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val active = ev.distinct()
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    cohorts.join(active, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("n_active"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val RetentionCohortsSql: String =
    """WITH ev AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
      |      AS BIGINT) AS week
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
      |sizes AS (
      |  SELECT cohort_week, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1),
      |cells AS (
      |  SELECT cohort_week, week - cohort_week AS week_offset,
      |    COUNT(*) AS n_active
      |  FROM cohorts JOIN ev USING (user_id)
      |  GROUP BY 1, 2)
      |SELECT cohort_week, week_offset, cohort_size, n_active,
      |  CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention
      |FROM cells JOIN sizes USING (cohort_week)
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** B10 as-of staleness (SURVEY.md §7 hard-part #3): for each daily
    * instant t, the most recent gauge sample ≤ t within a 5-day lookback.
    * The instant grid is constant-size and broadcast; the gauge stream is
    * range-joined against it without shuffling, then one row_number pass
    * per (series, t) picks the freshest sample with a deterministic
    * event_id tiebreak. At 100 TB the same plan holds because the grid
    * side stays tiny; a grid of comparable size to the facts would switch
    * to the union-merge-sort formulation instead.
    */
  def asOf(spark: SparkSession, dir: String): DataFrame = {
    val grid = spark.range(2, 31).select(
      expr("TIMESTAMP '2024-01-01 00:00:00' + id * INTERVAL 1 DAY").as("t"))
    val g = Metrics.metricEvents(spark, dir).filter(col("kind") === "gauge")
    val joined = g.join(broadcast(grid),
      col("ts") <= col("t") && col("ts") > col("t") - expr("INTERVAL 5 DAYS"))
    val w = Window.partitionBy(col("name"), col("label_k"), col("t"))
      .orderBy(col("ts").desc, col("event_id").desc)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("name"), col("label_k"), unix_micros(col("t")).as("t_us"), col("value"))
      .orderBy(col("name"), col("label_k"), col("t_us"))
  }

  val AsOfSql: String =
    s"""WITH grid AS (
       |  SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (d) DAY AS t
       |  FROM generate_series(2, 30) s(d)),
       |g AS (SELECT * FROM ($MetricEventsSql) WHERE kind = 'gauge'),
       |j AS (SELECT g.*, grid.t,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k, t
       |                     ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM g JOIN grid ON g.ts <= grid.t AND g.ts > grid.t - INTERVAL 5 DAY)
       |SELECT name, label_k, epoch_us(t) AS t_us, value
       |FROM j WHERE rn = 1
       |ORDER BY name, label_k, t_us""".stripMargin

  /** The STALENESS-MARKER fixture both b41/b42 gates drive
    * ([[graft.model.Stale]]): the metric-events view with one injected
    * marker per gauge series, placement split by a deterministic
    * parity of the series label —
    *  - even parity: the marker lands AFTER the series' last sample
    *    (the series vanished; instant reads must CUT it);
    *  - odd parity: the marker lands between the 2nd-latest and latest
    *    samples (the series vanished and CAME BACK; the newer sample
    *    must revive it).
    * Marker rows carry NaN values and negative event_ids (collision-
    * free with the corpus' non-negative ids).
    */
  private def staleInjected(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("ts", "name", "label_k", "label_instance", "kind",
      "value", "event_id")
    val g = Metrics.metricEvents(spark, dir).filter(col("kind") === "gauge")
    val w = Window
      .partitionBy(col("name"), col("label_k"), col("label_instance"))
      .orderBy(col("ts").desc, col("event_id").desc)
    // placement, in integer micros (both twins share the formula):
    //  - even parity (vanish): latest ts + 1ms, strictly after;
    //  - odd parity (revive): the FLOOR MIDPOINT between the 2nd-latest
    //    and latest samples — never out-anchors the latest sample for
    //    ANY inter-sample gap (a <1ms gap broke the old "+1ms" rule);
    //    a zero gap degenerates to the 2nd-latest ts, where the
    //    marker's negative event_id still loses the LWW tie, so the
    //    revival reading holds data-independently.
    val markers = g.withColumn("_rn", row_number().over(w))
      .withColumn("_newer_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("_par", ascii(substring(col("label_k"), 1, 1)) % 2)
      .filter((col("_rn") === 1 && col("_par") === 0) ||
        (col("_rn") === 2 && col("_par") === 1))
      .select(
        timestamp_micros(
          when(col("_rn") === 1, unix_micros(col("ts")) + 1000L)
            .otherwise(unix_micros(col("ts")) +
              expr("(_newer_us - unix_micros(ts)) div 2"))).as("ts"),
        col("name"), col("label_k"), col("label_instance"), col("kind"),
        lit(Double.NaN).as("value"),
        (-col("event_id") - 1).as("event_id"))
    Metrics.metricEvents(spark, dir).select(cols.map(col): _*)
      .unionByName(markers)
  }

  /** b41: the INSTANT vector over the marker-injected corpus, through
    * the REAL evaluator path (seeded events view → `Engine.eval` →
    * staleness-aware LWW): vanished series (even parity — marker
    * latest) contribute nothing; revived series (odd parity — a real
    * sample after the marker) serve their newest value. The oracle
    * computes the same cut analytically, marker-free.
    */
  def staleInstant(spark: SparkSession, dir: String): DataFrame = {
    val key = s"$dir#b41stale"
    Metrics.seedEvents(spark, key, staleInjected(spark, dir))
    graft.promql.Engine.eval(spark, key, "signup")
      .select(col("name"), col("label_k"), col("label_instance"),
        col("value").cast("double").as("value"))
      .orderBy(col("name"), col("label_k"), col("label_instance"))
  }

  val StaleInstantSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY name, label_k, label_instance
       |    ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM m WHERE kind = 'gauge')
       |SELECT name, label_k, label_instance, value
       |FROM r
       |WHERE rn = 1 AND ascii(substr(label_k, 1, 1)) % 2 = 1
       |ORDER BY name, label_k, label_instance""".stripMargin

  /** b42: the composition-carrying ROLLUP over the marker-injected
    * corpus ([[Downsample.rollupRawOf]], 6h buckets): markers are
    * excluded from every value field (`cnt`/`sum`/`vmin`/`vmax`/
    * first/last — the old untagged-NaN path corrupted `vmax`/`vlast`
    * here) and surface only as the bucket's `has_marker` flag
    * (`stale_at` anchor). The oracle aggregates real samples only and
    * derives the marker buckets analytically.
    */
  def staleRollup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Downsample
      .rollupRawOf(staleInjected(spark, dir)
        .filter(col("kind") === "gauge"), 21600L)
      .select(col("name"), col("label_k"), col("label_instance"),
        col("kind"), col("bucket_s"), col("cnt"),
        col("sum_dec").cast("double").as("sum"),
        col("vmin"), col("vmax"), col("vfirst"), col("vlast"),
        col("stale_at").isNotNull.as("has_marker"))
      .orderBy(col("name"), col("label_k"), col("label_instance"),
        col("bucket_s"))

  val StaleRollupSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |g AS (
       |  SELECT name, label_k, label_instance, kind, value, event_id,
       |    epoch_us(ts) AS ts_us
       |  FROM m WHERE kind = 'gauge'),
       |rk AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY name, label_k, label_instance
       |    ORDER BY ts_us DESC, event_id DESC) AS rn,
       |    LAG(ts_us) OVER (
       |      PARTITION BY name, label_k, label_instance
       |      ORDER BY ts_us DESC, event_id DESC) AS newer_us
       |  FROM g),
       |mk AS (
       |  -- marker placement mirrors the fixture: vanish = latest+1ms,
       |  -- revive = the floor midpoint between the newest two samples
       |  SELECT name, label_k, label_instance, kind,
       |    ((CASE WHEN rn = 1 THEN ts_us + 1000
       |           ELSE ts_us + (newer_us - ts_us) // 2 END
       |      + 21599999999) // 21600000000 - 1) * 21600
       |      AS bucket_s
       |  FROM rk
       |  WHERE (rn = 1 AND ascii(substr(label_k, 1, 1)) % 2 = 0)
       |     OR (rn = 2 AND ascii(substr(label_k, 1, 1)) % 2 = 1)
       |  GROUP BY ALL),
       |sb AS (
       |  SELECT *,
       |    ((ts_us + 21599999999) // 21600000000 - 1) * 21600 AS bucket_s
       |  FROM g),
       |f AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY name, label_k, label_instance, kind, bucket_s
       |      ORDER BY ts_us, event_id) AS rn_a,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY name, label_k, label_instance, kind, bucket_s
       |      ORDER BY ts_us DESC, event_id DESC) AS rn_d
       |  FROM sb),
       |sa AS (
       |  SELECT name, label_k, label_instance, kind, bucket_s,
       |    COUNT(*) AS cnt,
       |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum,
       |    MIN(value) AS vmin, MAX(value) AS vmax,
       |    MAX(CASE WHEN rn_a = 1 THEN value END) AS vfirst,
       |    MAX(CASE WHEN rn_d = 1 THEN value END) AS vlast
       |  FROM f GROUP BY ALL)
       |SELECT
       |  COALESCE(sa.name, mk.name) AS name,
       |  COALESCE(sa.label_k, mk.label_k) AS label_k,
       |  COALESCE(sa.label_instance, mk.label_instance) AS label_instance,
       |  COALESCE(sa.kind, mk.kind) AS kind,
       |  COALESCE(sa.bucket_s, mk.bucket_s) AS bucket_s,
       |  COALESCE(sa.cnt, 0) AS cnt,
       |  sa.sum AS sum, sa.vmin AS vmin, sa.vmax AS vmax,
       |  sa.vfirst AS vfirst, sa.vlast AS vlast,
       |  (mk.bucket_s IS NOT NULL) AS has_marker
       |FROM sa FULL OUTER JOIN mk
       |  ON sa.name = mk.name AND sa.label_k = mk.label_k
       |  AND sa.label_instance = mk.label_instance AND sa.kind = mk.kind
       |  AND sa.bucket_s = mk.bucket_s
       |ORDER BY name, label_k, label_instance, bucket_s""".stripMargin

  /** B3-instant `irate`/`idelta`: the rate/delta of the LAST two samples
    * of each (series, day) — PromQL's spike-sensitive counterparts of
    * the averaged `rate`/`delta`. Reuses the wrapped-counter + reset
    * compensation construction of [[rate]] (same single window stage,
    * same partitioning), then one row_number pass picks the freshest
    * sample per day. Division happens on exact integers (cents, micros)
    * so the doubles are bit-reproducible on any partitioning.
    */
  def instantRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(series: _*).orderBy(col("ts"), col("event_id"))
    val prepped = counterCents(spark, dir)
      .withColumn("wrapped",
        sum(col("cents")).over(w.rowsBetween(Window.unboundedPreceding, 0)) % 100000L)
      .withColumn("prev", lag(col("wrapped"), 1).over(w))
      .withColumn("prev_ts_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
    val wd = Window.partitionBy(col("name"), col("label_k"), col("day_us"))
      .orderBy(col("ts").desc, col("event_id").desc)
    prepped
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") === 1 && col("prev").isNotNull &&
        unix_micros(col("ts")) > col("prev_ts_us"))
      .withColumn("delta",
        when(col("wrapped") >= col("prev"), col("wrapped") - col("prev"))
          .otherwise(col("wrapped")))
      .withColumn("gap_s",
        (unix_micros(col("ts")) - col("prev_ts_us")).cast("double") / 1000000.0)
      .select(col("name"), col("label_k"), col("day_us"),
        ((col("delta").cast("double") / 100.0) / col("gap_s")).as("irate"),
        ((col("wrapped") - col("prev")).cast("double") / 100.0).as("idelta"))
      .orderBy(col("name"), col("label_k"), col("day_us"))
  }

  val InstantRateSql: String =
    s"""WITH c AS ($CounterCentsSql),
       |w AS (SELECT *,
       |  SUM(cents) OVER (PARTITION BY name, label_k ORDER BY ts, event_id
       |                   ROWS UNBOUNDED PRECEDING) % 100000 AS wrapped
       |  FROM c),
       |d AS (SELECT *, epoch_us(date_trunc('day', ts)) AS day_us,
       |  LAG(wrapped) OVER (PARTITION BY name, label_k
       |                     ORDER BY ts, event_id) AS prev,
       |  LAG(epoch_us(ts)) OVER (PARTITION BY name, label_k
       |                          ORDER BY ts, event_id) AS prev_ts_us
       |  FROM w),
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k, day_us
       |                     ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM d)
       |SELECT name, label_k, day_us,
       |  (CAST(CASE WHEN wrapped >= prev THEN wrapped - prev
       |             ELSE wrapped END AS DOUBLE) / 100.0)
       |    / (CAST(epoch_us(ts) - prev_ts_us AS DOUBLE) / 1000000.0) AS irate,
       |  CAST(wrapped - prev AS DOUBLE) / 100.0 AS idelta
       |FROM r
       |WHERE rn = 1 AND prev IS NOT NULL AND epoch_us(ts) > prev_ts_us
       |ORDER BY name, label_k, day_us""".stripMargin

  /** B3-regression `deriv`/`predict_linear`: per (gauge series, day)
    * least-squares slope and the 1-hour-past-day-end extrapolation.
    * All five regression sums accumulate as exact BIGINTs (x = seconds
    * since day start, y = cents) in ONE map-side-combinable hash
    * aggregate — no window, no second pass — and the closed-form slope/
    * intercept divisions run on those exact integers in an identical
    * order in both engines, so the output doubles bit-match. Groups
    * with fewer than two distinct sample times carry no slope and are
    * filtered, mirroring PromQL's no-result on single-sample ranges.
    */
  def linearRegression(spark: SparkSession, dir: String): DataFrame = {
    val base = Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
      .withColumn("x", expr("(unix_micros(ts) - day_us) div 1000000"))
    val agg = base.groupBy(col("name"), col("label_k"), col("day_us"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("cents")).as("sy"),
        sum(col("x") * col("cents")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") * col("sxx") - col("sx") * col("sx") =!= 0L)
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    agg
      .withColumn("slope", slope)
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
          col("n").cast("double"))
      .select(col("name"), col("label_k"), col("day_us"),
        (col("slope") / 100.0).as("deriv"),
        ((col("intercept") + col("slope") * lit(90000.0)) / 100.0).as("predict_1h"))
      .orderBy(col("name"), col("label_k"), col("day_us"))
  }

  val LinearRegressionSql: String =
    s"""WITH g AS (
       |  SELECT *, CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |    epoch_us(date_trunc('day', ts)) AS day_us
       |  FROM ($MetricEventsSql) WHERE kind = 'gauge'),
       |x AS (SELECT *, (epoch_us(ts) - day_us) // 1000000 AS x FROM g),
       |a AS (
       |  SELECT name, label_k, day_us, COUNT(*) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(cents) AS BIGINT) AS sy,
       |    CAST(SUM(x * cents) AS BIGINT) AS sxy,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx
       |  FROM x GROUP BY name, label_k, day_us),
       |s AS (
       |  SELECT *, CAST(n * sxy - sx * sy AS DOUBLE)
       |              / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
       |  FROM a WHERE n * sxx - sx * sx <> 0)
       |SELECT name, label_k, day_us,
       |  slope / 100.0 AS deriv,
       |  ((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
       |    + slope * 90000.0) / 100.0 AS predict_1h
       |FROM s
       |ORDER BY name, label_k, day_us""".stripMargin

  /** B4-dual `count_values` + `group`: histogram of the counter snapshot
    * VALUES (how many series sit at each accumulated total — PromQL
    * `count_values("v", m)`), with the degenerate `group` aggregator (a
    * constant 1 per populated group). Two chained hash aggregates, both
    * map-side combinable; grouping happens on exact cents, never on a
    * formatted double.
    */
  def countValues(spark: SparkSession, dir: String): DataFrame =
    counterCents(spark, dir)
      .groupBy(series: _*).agg(sum(col("cents")).as("cents"))
      .groupBy(col("name"), col("cents"))
      .agg(count(lit(1)).as("n_series"))
      .select(col("name"), (col("cents").cast("double") / 100.0).as("value"),
        col("n_series"), lit(1L).as("grp"))
      .orderBy(col("name"), col("value"))

  val CountValuesSql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k, SUM(cents) AS cents
       |  FROM ($CounterCentsSql) GROUP BY name, label_k)
       |SELECT name, CAST(cents AS DOUBLE) / 100.0 AS value,
       |  COUNT(*) AS n_series, CAST(1 AS BIGINT) AS grp
       |FROM snap
       |GROUP BY name, cents
       |ORDER BY name, value""".stripMargin

  /** B-scalar math function family over the gauge snapshot: `abs`,
    * `ceil`, `floor`, `round`, `sqrt`, `sgn`, and modular bucketing —
    * the PromQL scalar library restricted to operations with exact
    * IEEE semantics (correctly-rounded sqrt, away-from-zero round on
    * halves) so results are bit-identical across engines; `exp`/`ln`
    * are deliberately excluded because libm last-ulp differences break
    * cross-engine reproducibility. Pure per-row projections on top of
    * one snapshot aggregate.
    */
  def mathFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(series: _*)
      .orderBy(col("ts").desc, col("event_id").desc)
    val snap = Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    snap.select(col("name"), col("label_k"),
        (col("cents").cast("double") / 100.0).as("value"),
        (abs(col("cents") - 50000L).cast("double") / 100.0).as("abs_dev"),
        ceil(col("cents").cast("double") / 100.0).cast("double").as("ceil_v"),
        floor(col("cents").cast("double") / 100.0).cast("double").as("floor_v"),
        round(col("cents").cast("double") / 100.0).cast("double").as("round_v"),
        sqrt(col("cents").cast("double") / 100.0).as("sqrt_v"),
        signum(col("cents") - 50000L).cast("double").as("sign_dev"),
        (col("cents") % 7L).as("mod7"))
      .orderBy(col("name"), col("label_k"))
  }

  val MathFunctionsSql: String =
    s"""WITH g AS (
       |  SELECT *, CAST(round(value * 100, 0) AS BIGINT) AS cents
       |  FROM ($MetricEventsSql) WHERE kind = 'gauge'),
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k
       |                     ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM g),
       |snap AS (SELECT name, label_k, cents FROM r WHERE rn = 1)
       |SELECT name, label_k,
       |  CAST(cents AS DOUBLE) / 100.0 AS value,
       |  CAST(abs(cents - 50000) AS DOUBLE) / 100.0 AS abs_dev,
       |  CAST(ceil(CAST(cents AS DOUBLE) / 100.0) AS DOUBLE) AS ceil_v,
       |  CAST(floor(CAST(cents AS DOUBLE) / 100.0) AS DOUBLE) AS floor_v,
       |  CAST(round(CAST(cents AS DOUBLE) / 100.0) AS DOUBLE) AS round_v,
       |  sqrt(CAST(cents AS DOUBLE) / 100.0) AS sqrt_v,
       |  CAST(sign(cents - 50000) AS DOUBLE) AS sign_dev,
       |  cents % 7 AS mod7
       |FROM snap
       |ORDER BY name, label_k""".stripMargin

  /** B-scalar log/exp family (`exp`, `ln`, `log2`, `log10`) over the
    * gauge snapshot — the libm-dependent complement of [[mathFunctions]]
    * (which excludes them from the oracle gate because last-ulp results
    * differ across engines). Rows-only driver check like b29/x16/x26;
    * the spec pins every value against the JVM's own `java.lang.Math`
    * reference, and the PromQL edge semantics are encoded explicitly
    * (`ln(0) = -Inf`, `ln(x<0) = NaN`) instead of Spark's
    * null-on-domain-error. `exp` is evaluated on a /1000 scale so large
    * snapshots don't overflow to Infinity.
    */
  def logFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(series: _*)
      .orderBy(col("ts").desc, col("event_id").desc)
    val snap = Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    def lnLike(f: Column => Column)(x: Column): Column =
      when(x > 0, f(x))
        .when(x === 0, lit(Double.NegativeInfinity))
        .otherwise(lit(Double.NaN))
    snap.select(col("name"), col("label_k"), col("value"),
        lnLike(log(_))(col("value")).as("ln_v"),
        lnLike(log2(_))(col("value")).as("log2_v"),
        lnLike(log10(_))(col("value")).as("log10_v"),
        exp(col("value") / 1000.0).as("exp_scaled"))
      .orderBy(col("name"), col("label_k"))
  }

  /** b33b: the log/exp family through the engine's DETERMINISTIC
    * transcendentals — the hash-gateable twin of [[logFunctions]].
    * Every value derives from `det_log2`/`det_exp2` and literal
    * constants: `ln x = log2(x)·ln2`, `log10 x = log2(x)·log10(2)`,
    * `e^x = 2^(x·log2 e)` — each a DetMath call plus ONE
    * correctly-rounded multiply, so the DuckDB twin reproduces the
    * doubles bit for bit. b33 keeps upstream PromQL parity (JVM libm,
    * spec-pinned, rows-only); this variant is the reproducible-recipe
    * option — a deployment that needs cross-engine-identical math
    * (stored thresholds, replayable alerts) uses these, accepting
    * ≤ ~1e-12 divergence from libm. Same gauge LWW snapshot, same edge
    * semantics (`ln 0 = −Inf`, `ln(x<0) = NaN`).
    */
  def logFunctionsDet(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.DetMathExprs
    DetMathExprs.register(spark)
    val w = Window.partitionBy(series: _*)
      .orderBy(col("ts").desc, col("event_id").desc)
    val snap = Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("xe", col("value") / lit(1000.0) * lit(PromQL.Log2E))
    def lnLike(f: Column)(x: Column): Column =
      when(x > 0, f)
        .when(x === 0, lit(Double.NegativeInfinity))
        .otherwise(lit(Double.NaN))
    val lg = expr("det_log2(value)")
    snap.select(col("name"), col("label_k"), col("value"),
        lnLike(lg * lit(PromQL.Ln2))(col("value")).as("ln_v"),
        lnLike(lg)(col("value")).as("log2_v"),
        lnLike(lg * lit(PromQL.Log10_2))(col("value")).as("log10_v"),
        expr("det_exp2(xe)").as("exp_scaled"))
      .orderBy(col("name"), col("label_k"))
  }

  lazy val LogFunctionsDetSql: String = {
    val lg = graft.functions.DetMath.log2Sql("value")
    val e2 = graft.functions.DetMath.exp2Sql("xe")
    def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
    def lnLike(value: String): String =
      s"""CASE WHEN value > 0 THEN $value
         |     WHEN value = 0 THEN CAST('-inf' AS DOUBLE)
         |     ELSE CAST('nan' AS DOUBLE) END""".stripMargin
    s"""WITH m AS (${Metrics.MetricEventsSql}),
       |r AS (SELECT name, label_k, value,
       |        ROW_NUMBER() OVER (PARTITION BY name, label_k
       |                           ORDER BY ts DESC, event_id DESC) AS rn
       |      FROM m WHERE kind = 'gauge'),
       |s AS (SELECT name, label_k, value,
       |        value / 1000.0 * ${d(PromQL.Log2E)} AS xe
       |      FROM r WHERE rn = 1)
       |SELECT name, label_k, value,
       |  ${lnLike(s"($lg) * ${d(PromQL.Ln2)}")} AS ln_v,
       |  ${lnLike(s"($lg)")} AS log2_v,
       |  ${lnLike(s"($lg) * ${d(PromQL.Log10_2)}")} AS log10_v,
       |  $e2 AS exp_scaled
       |FROM s
       |ORDER BY name, label_k""".stripMargin
  }

  /** Shared literal constants of the deterministic log family. */
  val Ln2: Double = StrictMath.log(2.0)
  val Log10_2: Double = StrictMath.log10(2.0)
  val Log2E: Double = 1.0 / StrictMath.log(2.0)

  /** b38: deterministic inverse hyperbolics — the gateable twins of
    * the p64–p66 front-end functions (which keep upstream libm-`ln`
    * parity and stay rows-only). Classic identities over
    * [[graft.plans.DetMathExprs]]:
    * `asinh x = ln(x + √(x²+1))`, `acosh x = ln(x + √(x²−1))` (x ≥ 1,
    * NaN below), `atanh x = ½·ln((1+x)/(1−x))` (|x| < 1, ±∞ at ±1,
    * NaN outside) — with `ln y = det_log2(y)·ln2`. Same argument
    * shapes as p64–p66 (`v−5.5`, `v`, `(v−5.5)/400`), same gauge LWW
    * snapshot. The direct formulas cancel for large-magnitude negative
    * `asinh` arguments — deterministically so, and the fixture range
    * is far inside; documented rather than branch-compensated.
    */
  def inverseHyperbolicDet(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.DetMathExprs.register(spark)
    val w = Window.partitionBy(series: _*)
      .orderBy(col("ts").desc, col("event_id").desc)
    val snap = Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("u1", col("value") - lit(5.5))
      .withColumn("u3", (col("value") - lit(5.5)) / lit(400.0))
      .withColumn("a1", col("u1") + sqrt(col("u1") * col("u1") + lit(1.0)))
      // domain-guarded intermediates (NULL outside): DuckDB raises on
      // sqrt/log of negatives even in branches a CASE later discards
      .withColumn("a2", when(col("value") >= 1,
        col("value") + sqrt(col("value") * col("value") - lit(1.0))))
      .withColumn("a3", when(abs(col("u3")) < 1,
        (lit(1.0) + col("u3")) / (lit(1.0) - col("u3"))))
    snap.select(col("name"), col("label_k"), col("value"),
        (expr("det_log2(a1)") * lit(Ln2)).as("asinh_v"),
        when(col("value") >= 1, expr("det_log2(a2)") * lit(Ln2))
          .otherwise(lit(Double.NaN)).as("acosh_v"),
        when(abs(col("u3")) < 1, lit(0.5) * (expr("det_log2(a3)") * lit(Ln2)))
          .when(col("u3") === 1, lit(Double.PositiveInfinity))
          .when(col("u3") === -1, lit(Double.NegativeInfinity))
          .otherwise(lit(Double.NaN)).as("atanh_v"))
      .orderBy(col("name"), col("label_k"))
  }

  lazy val InverseHyperbolicDetSql: String = {
    def lg(c: String): String = graft.functions.DetMath.log2Sql(c)
    def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
    s"""WITH m AS (${Metrics.MetricEventsSql}),
       |r AS (SELECT name, label_k, value,
       |        ROW_NUMBER() OVER (PARTITION BY name, label_k
       |                           ORDER BY ts DESC, event_id DESC) AS rn
       |      FROM m WHERE kind = 'gauge'),
       |s AS (SELECT name, label_k, value,
       |        value - 5.5 AS u1,
       |        (value - 5.5) / 400.0 AS u3
       |      FROM r WHERE rn = 1),
       |s2 AS (SELECT *,
       |        u1 + sqrt(u1 * u1 + 1.0) AS a1,
       |        CASE WHEN value >= 1
       |             THEN value + sqrt(value * value - 1.0) END AS a2,
       |        CASE WHEN abs(u3) < 1
       |             THEN (1.0 + u3) / (1.0 - u3) END AS a3
       |      FROM s)
       |SELECT name, label_k, value,
       |  (${lg("a1")}) * ${d(Ln2)} AS asinh_v,
       |  CASE WHEN value >= 1 THEN (${lg("a2")}) * ${d(Ln2)}
       |       ELSE CAST('nan' AS DOUBLE) END AS acosh_v,
       |  CASE WHEN abs(u3) < 1 THEN 0.5 * ((${lg("a3")}) * ${d(Ln2)})
       |       WHEN u3 = 1 THEN CAST('inf' AS DOUBLE)
       |       WHEN u3 = -1 THEN CAST('-inf' AS DOUBLE)
       |       ELSE CAST('nan' AS DOUBLE) END AS atanh_v
       |FROM s2
       |ORDER BY name, label_k""".stripMargin
  }

  /** B34 trigonometric family (PromQL `sin/cos/tan/asin/acos/atan/
    * sinh/cosh/tanh/deg/rad`) over the gauge snapshot — like the b33
    * log family, libm last-ulp differences across engines make these
    * rows-only; the spec pins every column against `StrictMath` within
    * a documented ulp tolerance. `u = value/100` scales into the
    * asin/acos domain (out-of-domain inputs are NaN in both engines).
    */
  def trigFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(series: _*)
      .orderBy(col("ts").desc, col("event_id").desc)
    val snap = Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val x = col("value")
    val u = col("value") / 100.0
    snap.select(col("name"), col("label_k"), col("value"),
        sin(x).as("sin_v"), cos(x).as("cos_v"), tan(x).as("tan_v"),
        asin(u).as("asin_u"), acos(u).as("acos_u"), atan(x).as("atan_v"),
        sinh(u).as("sinh_u"), cosh(u).as("cosh_u"), tanh(x).as("tanh_v"),
        degrees(x).as("deg_v"), radians(x).as("rad_v"))
      .orderBy(col("name"), col("label_k"))
  }

  /** b34b: the trig family through the engine's DETERMINISTIC
    * transcendentals — the hash-gateable twin of [[trigFunctions]]
    * (which keeps upstream JVM-libm parity and stays rows-only).
    * sin/cos run the pinned Cody-Waite reduction + Taylor dispatch
    * ([[graft.functions.DetMath.sin]]); tan = det_sin/det_cos (one
    * correctly-rounded divide); atan the table-reduced core; asin via
    * `atan(u/√(1−u²))` with exact ±π/2 edges and NaN outside the
    * domain; acos = π/2 − asin (one subtract); sinh/cosh/tanh over
    * `E = det_exp2(x·log2 e)` (`(E ∓ 1/E)/2`, `(E−1/E)/(E+1/E)`);
    * deg/rad one literal multiply. Every step is a single IEEE
    * correctly-rounded op in pinned order, so the DuckDB twin
    * reproduces all eleven columns bit for bit. Same gauge LWW
    * snapshot and argument shapes as b34 (`u = value/100` scales into
    * the asin domain).
    */
  def trigFunctionsDet(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DetMath
    graft.plans.DetMathExprs.register(spark)
    val w = Window.partitionBy(series: _*)
      .orderBy(col("ts").desc, col("event_id").desc)
    val snap = Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("u", col("value") / lit(100.0))
      .withColumn("eu", col("u") * lit(Log2E))
      .withColumn("ex", col("value") * lit(Log2E))
      .withColumn("ee", expr("det_exp2(eu)"))
      .withColumn("et", expr("det_exp2(ex)"))
      // domain-guarded intermediate (NULL outside |u| < 1): DuckDB
      // raises on sqrt of negatives even in discarded CASE branches
      .withColumn("az", when(abs(col("u")) < 1,
        col("u") / sqrt(lit(1.0) - col("u") * col("u"))))
      .withColumn("asin_u",
        when(abs(col("u")) < 1, expr("det_atan(az)"))
          .when(col("u") === 1, lit(DetMath.HalfPi))
          .when(col("u") === -1, lit(-DetMath.HalfPi))
          .otherwise(lit(Double.NaN)))
    snap.select(col("name"), col("label_k"), col("value"),
        expr("det_sin(value)").as("sin_v"),
        expr("det_cos(value)").as("cos_v"),
        (expr("det_sin(value)") / expr("det_cos(value)")).as("tan_v"),
        col("asin_u"),
        (lit(DetMath.HalfPi) - col("asin_u")).as("acos_u"),
        expr("det_atan(value)").as("atan_v"),
        ((col("ee") - lit(1.0) / col("ee")) * lit(0.5)).as("sinh_u"),
        ((col("ee") + lit(1.0) / col("ee")) * lit(0.5)).as("cosh_u"),
        when(abs(col("value")) > 700.0, signum(col("value")))
          .otherwise((col("et") - lit(1.0) / col("et")) /
            (col("et") + lit(1.0) / col("et"))).as("tanh_v"),
        (col("value") * lit(DetMath.DegPerRad)).as("deg_v"),
        (col("value") * lit(DetMath.RadPerDeg)).as("rad_v"))
      .orderBy(col("name"), col("label_k"))
  }

  lazy val TrigFunctionsDetSql: String = {
    val DM = graft.functions.DetMath
    def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
    val sinD = DM.sinDispatchSql("sp", "cp", "q")
    val cosD = DM.cosDispatchSql("sp", "cp", "q")
    s"""WITH m AS (${Metrics.MetricEventsSql}),
       |r AS (SELECT name, label_k, value,
       |        ROW_NUMBER() OVER (PARTITION BY name, label_k
       |                           ORDER BY ts DESC, event_id DESC) AS rn
       |      FROM m WHERE kind = 'gauge'),
       |s AS (SELECT name, label_k, value, value / 100.0 AS u
       |      FROM r WHERE rn = 1),
       |s2 AS (SELECT *,
       |        u * ${d(PromQL.Log2E)} AS eu,
       |        value * ${d(PromQL.Log2E)} AS ex,
       |        ${DM.trigKfSql("value")} AS kf,
       |        CASE WHEN abs(u) < 1 THEN u / sqrt(1.0 - u * u) END AS az
       |      FROM s),
       |s3 AS (SELECT *,
       |        ${DM.exp2Sql("eu")} AS ee,
       |        ${DM.exp2Sql("ex")} AS et,
       |        ${DM.trigRSql("value", "kf")} AS redr,
       |        ${DM.trigQSql("kf")} AS q,
       |        CASE WHEN abs(u) < 1 THEN ${DM.atanSql("az")}
       |             WHEN u = 1 THEN ${d(DM.HalfPi)}
       |             WHEN u = -1 THEN -${d(DM.HalfPi)}
       |             ELSE CAST('nan' AS DOUBLE) END AS asin_u
       |      FROM s2),
       |s4 AS (SELECT *,
       |        ${DM.sinPolySql("redr")} AS sp,
       |        ${DM.cosPolySql("redr")} AS cp
       |      FROM s3)
       |SELECT name, label_k, value,
       |  $sinD AS sin_v,
       |  $cosD AS cos_v,
       |  ($sinD) / ($cosD) AS tan_v,
       |  asin_u,
       |  ${d(DM.HalfPi)} - asin_u AS acos_u,
       |  ${DM.atanSql("value")} AS atan_v,
       |  (ee - 1.0 / ee) * 0.5 AS sinh_u,
       |  (ee + 1.0 / ee) * 0.5 AS cosh_u,
       |  CASE WHEN abs(value) > 700.0
       |       THEN CASE WHEN value > 0 THEN 1.0
       |                 WHEN value < 0 THEN -1.0 ELSE 0.0 END
       |       ELSE (et - 1.0 / et) / (et + 1.0 / et) END AS tanh_v,
       |  value * ${d(DM.DegPerRad)} AS deg_v,
       |  value * ${d(DM.RadPerDeg)} AS rad_v
       |FROM s4
       |ORDER BY name, label_k""".stripMargin
  }

  /** B19b `absent_over_time(purchase[1d])` evaluated on the day grid:
    * the (series-universe × day) combinations where the family has NO
    * sample — `absent` (b19) answers "which series never exist", this
    * answers "which days went dark per series". The universe and the
    * day grid are tiny DISTINCT relations (broadcast cross join);
    * presence is a distinct projection of the events; the answer is one
    * anti join. No per-event fan-out anywhere.
    */
  def absentOverTime(spark: SparkSession, dir: String): DataFrame = {
    val ev = counterCents(spark, dir)
      .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
    val universe = ev.select(col("label_k")).distinct()
    val days = ev.select(col("day_us")).distinct()
    val present = ev.filter(col("name") === "purchase")
      .select(col("label_k"), col("day_us")).distinct()
    universe.crossJoin(broadcast(days))
      .join(present, Seq("label_k", "day_us"), "left_anti")
      .select(lit("purchase").as("name"), col("label_k"), col("day_us"),
        lit(true).as("absent"))
      .orderBy(col("label_k"), col("day_us"))
  }

  val AbsentOverTimeSql: String =
    s"""WITH c AS (
       |  SELECT *, epoch_us(date_trunc('day', ts)) AS day_us
       |  FROM ($CounterCentsSql)),
       |universe AS (SELECT DISTINCT label_k FROM c),
       |days AS (SELECT DISTINCT day_us FROM c),
       |present AS (
       |  SELECT DISTINCT label_k, day_us FROM c WHERE name = 'purchase'),
       |grid AS (SELECT label_k, day_us FROM universe, days)
       |SELECT 'purchase' AS name, g.label_k AS label_k, g.day_us AS day_us,
       |  TRUE AS absent
       |FROM grid g
       |WHERE NOT EXISTS (SELECT 1 FROM present p
       |                  WHERE p.label_k = g.label_k AND p.day_us = g.day_us)
       |ORDER BY label_k, day_us""".stripMargin

  /** B-series metadata functions in one pass over the counter snapshot:
    * `label_join(v, "combined", "-", "name", "k")` (label concatenation
    * into a new label), `timestamp(v)` (the last sample's time, kept in
    * exact micros), `present_over_time` (constant 1 per existing
    * series), with `sort_desc` output ordering (value-descending,
    * deterministic label tiebreak). One hash aggregate computes the
    * value and the last-sample time together — no second pass.
    */
  def seriesFunctions(spark: SparkSession, dir: String): DataFrame =
    counterCents(spark, dir)
      .groupBy(series: _*)
      .agg(sum(col("cents")).as("cents"),
        max(unix_micros(col("ts"))).as("last_us"))
      .select(col("name"), col("label_k"),
        concat_ws("-", col("name"), col("label_k")).as("combined"),
        (col("cents").cast("double") / 100.0).as("value"),
        col("last_us"), lit(1L).as("present"))
      .orderBy(col("value").desc, col("label_k"), col("name"))

  val SeriesFunctionsSql: String =
    s"""WITH snap AS (
       |  SELECT name, label_k, SUM(cents) AS cents,
       |    MAX(epoch_us(ts)) AS last_us
       |  FROM ($CounterCentsSql) GROUP BY name, label_k)
       |SELECT name, label_k,
       |  name || '-' || label_k AS combined,
       |  CAST(cents AS DOUBLE) / 100.0 AS value,
       |  last_us, CAST(1 AS BIGINT) AS present
       |FROM snap
       |ORDER BY value DESC, label_k, name""".stripMargin

  /** B3-counting `changes(v[1d])`: how many times each gauge series
    * changed value within the day — one `lag` per series (same single
    * window stage as every per-series operator, partitioned on the
    * series key) and an integer conditional sum. Exact integers end to
    * end. The companion `resets` (b17) counts only DECREASES of a
    * counter; `changes` counts any value movement of a gauge.
    */
  def changes(spark: SparkSession, dir: String): DataFrame = {
    // the window partitions on (series, day): PromQL's changes(v[1d])
    // compares only samples INSIDE the range, so a day's first sample
    // has no predecessor
    val w = Window.partitionBy(col("name"), col("label_k"), col("day_us"))
      .orderBy(col("ts"), col("event_id"))
    Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .groupBy(col("name"), col("label_k"), col("day_us"))
      .agg(sum(when(col("prev").isNotNull && col("cents") =!= col("prev"), 1L)
        .otherwise(0L)).as("changes"))
      .orderBy(col("name"), col("label_k"), col("day_us"))
  }

  val ChangesSql: String =
    s"""WITH g AS (
       |  SELECT *, CAST(round(value * 100, 0) AS BIGINT) AS cents
       |  FROM ($MetricEventsSql) WHERE kind = 'gauge'),
       |d AS (SELECT *, epoch_us(date_trunc('day', ts)) AS day_us FROM g),
       |l AS (SELECT *,
       |  LAG(cents) OVER (PARTITION BY name, label_k, day_us
       |                   ORDER BY ts, event_id) AS prev
       |  FROM d)
       |SELECT name, label_k, day_us,
       |  CAST(SUM(CASE WHEN prev IS NOT NULL AND cents <> prev
       |                THEN 1 ELSE 0 END) AS BIGINT) AS changes
       |FROM l
       |GROUP BY name, label_k, day_us
       |ORDER BY name, label_k, day_us""".stripMargin

  /** B3-smoothing `holt_winters(v[d], 0.5, 0.3)`: double exponential
    * smoothing of each gauge series (level + trend recurrences, exactly
    * the published PromQL formulation: s₀=y₀, b₀=y₁−y₀, then
    * sᵢ = sf·yᵢ + (1−sf)(sᵢ₋₁+bᵢ₋₁), bᵢ = tf(sᵢ−sᵢ₋₁) + (1−tf)bᵢ₋₁).
    *
    * A sequential recurrence has no mergeable partial state, so it
    * CANNOT be a combiner-friendly aggregate — the scalable shape is
    * one ordered array per series (`sort_array(collect_list(...))`,
    * bounded by samples-per-series-per-window, not corpus size) folded
    * by a single `aggregate` HOF with a (level, trend) struct
    * accumulator. Series with fewer than two samples yield no result,
    * per PromQL. HASH-GATED: the recurrence is pure +/× (no libm), the
    * sample order is pinned by `(ts, event_id)` on both sides, and each
    * step is the same correctly-rounded expression tree — so a DuckDB
    * RECURSIVE CTE stepping the identical fold reproduces the smoothed
    * value bit for bit ([[HoltWintersSql]]; the round-9 rows-only
    * classification assumed libm was involved — it is not). The spec
    * additionally pins the fold against an independent Scala reference.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame =
    Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "gauge")
      .groupBy(series: _*)
      .agg(transform(
        sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))),
        x => x("value")).as("vals"))
      .filter(size(col("vals")) >= 2)
      .withColumn("smoothed", expr(
        // vals[i] is 0-based, slice() is 1-based: init from (y0, y1−y0),
        // fold over y1..yn−1 (positions 2..n)
        """aggregate(
          |  slice(vals, 2, greatest(size(vals) - 1, 0)),
          |  named_struct('s', vals[0], 'b', vals[1] - vals[0]),
          |  (acc, y) -> named_struct(
          |    's', 0.5D * y + 0.5D * (acc.s + acc.b),
          |    'b', 0.3D * ((0.5D * y + 0.5D * (acc.s + acc.b)) - acc.s)
          |         + 0.7D * acc.b),
          |  acc -> acc.s)""".stripMargin))
      .select(col("name"), col("label_k"), col("smoothed"))
      .orderBy(col("name"), col("label_k"))

  /** Oracle twin of [[holtWinters]]: the per-series fold stepped by a
    * RECURSIVE CTE — state after position `p` (1-based) is `(s, b)`;
    * the base row is the init `(y₀, y₁−y₀)` at p = 1 and each
    * recursive row advances one sample with the EXACT expression tree
    * the Spark `aggregate` lambda evaluates (s′ recomputed inline in
    * b′, mirroring the HOF), so every intermediate double matches.
    */
  val HoltWintersSql: String =
    s"""WITH RECURSIVE m AS (${Metrics.MetricEventsSql}),
       |g AS (
       |  SELECT name, label_k, list(value ORDER BY ts, event_id) AS vals
       |  FROM m WHERE kind = 'gauge'
       |  GROUP BY name, label_k),
       |g2 AS (SELECT *, len(vals) AS n FROM g WHERE len(vals) >= 2),
       |steps AS (
       |  SELECT name, label_k, vals, n, 1 AS p,
       |    vals[1] AS s, vals[2] - vals[1] AS b
       |  FROM g2
       |  UNION ALL
       |  SELECT name, label_k, vals, n, p + 1,
       |    0.5 * vals[p + 1] + 0.5 * (s + b),
       |    0.3 * ((0.5 * vals[p + 1] + 0.5 * (s + b)) - s) + 0.7 * b
       |  FROM steps WHERE p < n)
       |SELECT name, label_k, s AS smoothed
       |FROM steps WHERE p = n
       |ORDER BY name, label_k""".stripMargin

  /** B-time function family: PromQL `minute`/`hour`/`day_of_week`/
    * `day_of_month`/`days_in_month`/`month`/`year` over the event
    * timestamps, aggregated to one row per UTC day (calendar parts are
    * constant within the day, so the group collapses losslessly).
    * `day_of_week` uses PromQL/DuckDB numbering (Sunday = 0); Spark's
    * 1-based `dayofweek` is shifted to match.
    */
  def timeFunctions(spark: SparkSession, dir: String): DataFrame =
    Metrics.metricEvents(spark, dir)
      .withColumn("day_us", unix_micros(date_trunc("day", col("ts"))))
      .groupBy(col("day_us"),
        year(col("ts")).cast("long").as("year"),
        month(col("ts")).cast("long").as("month"),
        dayofmonth(col("ts")).cast("long").as("day_of_month"),
        (dayofweek(col("ts")) - 1).cast("long").as("day_of_week"),
        dayofmonth(last_day(col("ts"))).cast("long").as("days_in_month"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("day_us"))

  val TimeFunctionsSql: String =
    s"""SELECT epoch_us(date_trunc('day', ts)) AS day_us,
       |  CAST(year(ts) AS BIGINT) AS year,
       |  CAST(month(ts) AS BIGINT) AS month,
       |  CAST(day(ts) AS BIGINT) AS day_of_month,
       |  CAST(dayofweek(ts) AS BIGINT) AS day_of_week,
       |  CAST(day(last_day(ts)) AS BIGINT) AS days_in_month,
       |  COUNT(*) AS n_events
       |FROM ($MetricEventsSql)
       |GROUP BY 1, 2, 3, 4, 5, 6
       |ORDER BY day_us""".stripMargin
}
