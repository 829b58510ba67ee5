package graft.promql

import graft.operators.Metrics

/** DuckDB twins for the parser-routed driver queries (p1–p12): each SQL
  * mirrors what [[Compiler]] emits for the given PromQL string, so the
  * driver's oracle check covers the WHOLE front-end path — tokenizer →
  * parser → compiler → Catalyst — not just the hand-built operators.
  */
object Oracle {

  import Metrics.MetricEventsSql

  /** Shared histogram_quantile interpolation twin: cumulative bucket
    * counts per full series key `(name, label_k, label_instance)` over
    * the observation set selected by `tsFilter` (instant: everything up
    * to T; windowed rate: `(T−d, T]`), then the PromQL linear
    * interpolation with the max-bucket overflow rule — the same
    * expression shapes the compiler emits, so doubles bit-match.
    */
  private def histogramQuantileTwin(phi: Double, tsFilter: String,
      groupCols: Seq[String] = Seq("name", "label_k", "label_instance")): String = {
    val g = groupCols.mkString(", ")
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (SELECT $g, value FROM m, t
       |      WHERE name = 'error' AND $tsFilter),
       |b AS (SELECT * FROM (VALUES (1.0),(5.0),(10.0),(25.0),(50.0),(100.0),(150.0)) b(le)),
       |snap AS (
       |  SELECT $g, le,
       |    CAST(SUM(CASE WHEN value <= le THEN 1 ELSE 0 END) AS BIGINT) AS cum_count,
       |    COUNT(*) AS cnt
       |  FROM w CROSS JOIN b
       |  GROUP BY $g, le),
       |r AS (
       |  SELECT *, $phi * CAST(cnt AS DOUBLE) AS rnk,
       |    COALESCE(LAG(le) OVER w2, 0.0) AS prev_le,
       |    COALESCE(LAG(cum_count) OVER w2, 0) AS prev_cum,
       |    MAX(le) OVER w3 AS max_le,
       |    MAX(cum_count) OVER w3 AS max_cum
       |  FROM snap
       |  WINDOW w2 AS (PARTITION BY $g ORDER BY le),
       |         w3 AS (PARTITION BY $g))
       |SELECT $g, value FROM (
       |  SELECT $g,
       |    prev_le + (le - prev_le) * (rnk - CAST(prev_cum AS DOUBLE))
       |      / CAST(cum_count - prev_cum AS DOUBLE) AS value
       |  FROM r WHERE CAST(cum_count AS DOUBLE) >= rnk AND CAST(prev_cum AS DOUBLE) < rnk
       |  UNION ALL
       |  SELECT $g, max_le AS value
       |  FROM r WHERE le = max_le AND rnk > CAST(max_cum AS DOUBLE))
       |ORDER BY $g, value""".stripMargin
  }

  /** `topk(3, sum by (k) (purchase))` */
  val TopkSumSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |snap AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY label_k),
       |top AS (SELECT label_k, dv FROM snap ORDER BY dv DESC, label_k LIMIT 3)
       |SELECT label_k, CAST(dv AS DOUBLE) AS value
       |FROM top ORDER BY label_k, value""".stripMargin

  /** `topk(2, k_total{k=~"1.*"})` with the standing recording rule
    * `k_total: sum by (k) (purchase)` — recorded-series view semantics:
    * the rule inlines at the selector, the matcher applies post-hoc on
    * the recorded vector's labels, and the surrounding aggregation
    * composes. The twin re-derives the whole pipeline relationally, so
    * the gate fails if rule inlining, the post-hoc matcher, or the
    * topk ranking over a recorded operand ever drifts.
    */
  val RecordedTopkSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |rec AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY label_k),
       |flt AS (SELECT * FROM rec WHERE regexp_matches(label_k, '^(?:1.*)$$')),
       |top AS (SELECT label_k, dv FROM flt ORDER BY dv DESC, label_k LIMIT 2)
       |SELECT label_k, CAST(dv AS DOUBLE) AS value
       |FROM top ORDER BY label_k, value""".stripMargin

  /** `rate(k_total6h[4d])` with the standing recording rule
    * `k_total6h: sum by (k) (purchase)` at a 6-hour evaluation
    * interval — a RANGE selector over a recorded series. The twin
    * re-derives the samples the rule loop would have written (the rule
    * expression at the 17 grid instants T−4d … T, 6h apart) and then
    * walks them with the engine's reset-aware adjacent-sample recipe:
    * each sample contributes `v − prev` (or `v` after a reset / for a
    * series born inside the window), the T−4d baseline row seeds the
    * walk and is excluded from the left-open window, and the deferred
    * ÷4d lands once on the exact decimal increase. The gate fails if
    * the grid anchoring, the baseline handling, the reset walk, or the
    * deferred division ever drifts.
    */
  val RecordedRateSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |idx AS (SELECT i FROM generate_series(0, 16) g(i)),
       |snap AS (
       |  SELECT label_k, i, SUM(CAST(value AS DECIMAL(18,2))) AS v
       |  FROM m, t, idx
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - (16 - i) * 21600000000
       |  GROUP BY label_k, i),
       |walk AS (
       |  SELECT label_k, i, v,
       |    LAG(v) OVER (PARTITION BY label_k ORDER BY i) AS pv
       |  FROM snap),
       |inc AS (
       |  SELECT label_k,
       |    SUM(CASE WHEN pv IS NULL THEN v
       |             WHEN v >= pv THEN v - pv
       |             ELSE v END) AS dv
       |  FROM walk WHERE i >= 1
       |  GROUP BY label_k)
       |SELECT label_k, CAST(dv AS DOUBLE) / CAST(345600 AS DOUBLE) AS value
       |FROM inc ORDER BY label_k""".stripMargin

  /** `deriv(k_total6h[2d])` under the standing 6h sum-by rule — the
    * recorded lattice's 8 in-window instants re-derived as cumulative
    * cents snapshots (events ≤ instant, the counter-grid clamping), then
    * the exact-integer least squares of b25: x = i·21600 s since the
    * window start, five HUGEINT sums, closed-form slope in the identical
    * division order as the compiler.
    */
  val RecordedDerivSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |idx AS (SELECT i FROM generate_series(1, 8) g(i)),
       |snap AS (
       |  SELECT label_k, i,
       |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
       |  FROM m, t, idx
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - (8 - i) * 21600000000
       |  GROUP BY label_k, i),
       |ls AS (
       |  SELECT label_k, COUNT(*) AS n, SUM(x) AS sx, SUM(cents) AS sy,
       |    SUM(x * cents) AS sxy, SUM(x * x) AS sxx
       |  FROM (SELECT label_k, i * 21600 AS x, cents FROM snap) s
       |  GROUP BY label_k)
       |SELECT label_k,
       |  CAST(n * sxy - sx * sy AS DOUBLE)
       |    / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS value
       |FROM ls WHERE n * sxx - sx * sx <> 0
       |ORDER BY label_k""".stripMargin

  /** `predict_linear(k_total6h[2d], 3600)` — the deriv lattice walk plus
    * the intercept extrapolated to T + 1h (x = d + horizon = 176400 s),
    * every double op in the compiler's order.
    */
  val RecordedPredictSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |idx AS (SELECT i FROM generate_series(1, 8) g(i)),
       |snap AS (
       |  SELECT label_k, i,
       |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
       |  FROM m, t, idx
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - (8 - i) * 21600000000
       |  GROUP BY label_k, i),
       |ls AS (
       |  SELECT label_k, COUNT(*) AS n, SUM(x) AS sx, SUM(cents) AS sy,
       |    SUM(x * cents) AS sxy, SUM(x * x) AS sxx
       |  FROM (SELECT label_k, i * 21600 AS x, cents FROM snap) s
       |  GROUP BY label_k),
       |sl AS (
       |  SELECT label_k, n, sx, sy,
       |    CAST(n * sxy - sx * sy AS DOUBLE)
       |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
       |  FROM ls WHERE n * sxx - sx * sx <> 0)
       |SELECT label_k,
       |  ((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
       |    / CAST(n AS DOUBLE) + slope * 176400.0) / 100.0 AS value
       |FROM sl ORDER BY label_k""".stripMargin

  /** `irate(k_total6h[12h])` — the last two lattice instants (T−6h, T)
    * as cumulative cents snapshots; series born inside the final
    * interval have no T−6h sample and return nothing (upstream's
    * two-sample rule); reset-aware difference over 21600 s.
    */
  val RecordedIrateSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |idx AS (SELECT i FROM generate_series(1, 2) g(i)),
       |snap AS (
       |  SELECT label_k, i,
       |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
       |  FROM m, t, idx
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - (2 - i) * 21600000000
       |  GROUP BY label_k, i),
       |pair AS (
       |  SELECT a.label_k, a.cents AS c1, b.cents AS c2
       |  FROM snap a JOIN snap b ON a.label_k = b.label_k
       |  WHERE a.i = 2 AND b.i = 1)
       |SELECT label_k,
       |  CAST(CASE WHEN c1 >= c2 THEN c1 - c2 ELSE c1 END AS DOUBLE)
       |    / 100.0 / 21600.0 AS value
       |FROM pair ORDER BY label_k""".stripMargin

  /** The recorded 6h sum-by lattice's in-window instants as exact
    * cumulative cents snapshots — the shared front half of every
    * recorded exotic-tail twin ([[RecordedQuantileSql]] and friends):
    * instant i (1..g) sits at T − (g−i)·6h, its snapshot sums every
    * event at or before it.
    */
  private def recordedLatticeCents(g: Int): String =
    s"""m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |idx AS (SELECT i FROM generate_series(1, $g) g(i)),
       |snap AS (
       |  SELECT label_k, i,
       |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
       |  FROM m, t, idx
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - ($g - i) * 21600000000
       |  GROUP BY label_k, i)""".stripMargin

  /** `quantile_over_time(0.9, k_total6h[2d])` — the PromQL linear
    * interpolation at rank (n−1)·φ over the 8 in-window lattice
    * snapshots' exact cents, rank tiebreak on the lattice index
    * (matching the engine's per-instant `_i` stand-in for event_id).
    */
  val RecordedQuantileSql: String =
    s"""WITH ${recordedLatticeCents(8)},
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY label_k ORDER BY cents, i) AS rn,
       |  COUNT(*) OVER (PARTITION BY label_k) AS n
       |  FROM snap),
       |p AS (SELECT *, CAST(n - 1 AS DOUBLE) * 0.9 AS pos FROM r)
       |SELECT label_k,
       |  (MAX(CASE WHEN rn = CAST(FLOOR(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE
       |   + (MAX(CASE WHEN rn = CAST(CEIL(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE
       |      - MAX(CASE WHEN rn = CAST(FLOOR(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE)
       |     * (MAX(pos) - FLOOR(MAX(pos)))) / 100.0 AS value
       |FROM p GROUP BY label_k
       |ORDER BY label_k, value""".stripMargin

  /** `stddev_over_time(k_total6h[2d])` — exact integer moments (Σx,
    * Σx², n) over the 8 lattice snapshots' cents, the variance walk in
    * the engine's exact double order (s2/n − mean·mean).
    */
  val RecordedStddevSql: String =
    s"""WITH ${recordedLatticeCents(8)},
       |a AS (
       |  SELECT label_k,
       |    CAST(SUM(cents) AS BIGINT) AS s1,
       |    CAST(SUM(cents * cents) AS BIGINT) AS s2,
       |    COUNT(*) AS n
       |  FROM snap GROUP BY label_k)
       |SELECT label_k,
       |  sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0 AS value
       |FROM a
       |ORDER BY label_k, value""".stripMargin

  /** `mad_over_time(k_total6h[2d])` — median absolute deviation about
    * the median over the lattice snapshots: the first median on exact
    * cents, the second on the |cents − median| doubles, both at the
    * (n−1)·0.5 interpolation, rank tiebreak on the lattice index.
    */
  val RecordedMadSql: String =
    s"""WITH ${recordedLatticeCents(8)},
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY label_k ORDER BY cents, i) AS rn,
       |  COUNT(*) OVER (PARTITION BY label_k) AS n
       |  FROM snap),
       |p AS (SELECT *, CAST(n - 1 AS DOUBLE) * 0.5 AS pos FROM r),
       |med AS (SELECT *,
       |  CAST(MAX(CASE WHEN rn = CAST(FLOOR(pos) AS BIGINT) + 1 THEN cents END)
       |    OVER pw AS DOUBLE) AS lo,
       |  CAST(MAX(CASE WHEN rn = CAST(CEIL(pos) AS BIGINT) + 1 THEN cents END)
       |    OVER pw AS DOUBLE) AS hi
       |  FROM p WINDOW pw AS (PARTITION BY label_k)),
       |d AS (SELECT *,
       |  abs(CAST(cents AS DOUBLE) - (lo + (hi - lo) * (pos - FLOOR(pos)))) AS dev
       |  FROM med),
       |r2 AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY label_k ORDER BY dev, i) AS rn2
       |  FROM d)
       |SELECT label_k,
       |  (MAX(CASE WHEN rn2 = CAST(FLOOR(pos) AS BIGINT) + 1 THEN dev END)
       |   + (MAX(CASE WHEN rn2 = CAST(CEIL(pos) AS BIGINT) + 1 THEN dev END)
       |      - MAX(CASE WHEN rn2 = CAST(FLOOR(pos) AS BIGINT) + 1 THEN dev END))
       |     * (MAX(pos) - FLOOR(MAX(pos)))) / 100.0 AS value
       |FROM r2 GROUP BY label_k
       |ORDER BY label_k, value""".stripMargin

  /** `ts_of_max_over_time(k_total6h[2d])` — the rule-loop write
    * timestamp (seconds) of the lattice instant attaining the window
    * max; ties break on the LATEST instant (upstream replaces the
    * running extremum on >=). Exact DECIMAL value comparisons — the
    * engine serves this for ANY rule shape.
    */
  val RecordedTsOfMaxSql: String =
    s"""WITH ${recordedLatticeCents(8)},
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY label_k
       |                     ORDER BY cents DESC, i DESC) AS rn
       |  FROM snap)
       |SELECT r.label_k,
       |  CAST(t.t_us - (8 - r.i) * 21600000000 AS DOUBLE) / 1e6 AS value
       |FROM r, t WHERE r.rn = 1
       |ORDER BY label_k, value""".stripMargin

  /** p111: `deriv(k_total6h[1d])` on the dense 240×6h grid under the
    * standing 6h sum-by rule — the capacity panel as ONE plan. The twin
    * re-derives the rule lattice (243 points = 240 grid instants + the
    * 3 extra the first window needs) as cumulative cents snapshots,
    * self-joins each output instant to its 4-point window over the
    * PRESENT rows (a series born mid-lattice fits partial windows,
    * exactly the per-instant sample set), and runs the exact-integer
    * least squares with x measured from the window start — the
    * compiler's shift-algebra arm must reproduce every division
    * bit-for-bit.
    */
  val RecordedGridDerivSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |idx AS (SELECT unnest(generate_series(1, 243)) AS i),
       |snap AS (
       |  SELECT label_k, i,
       |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
       |  FROM m, t, idx
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - (243 - i) * 21600000000
       |  GROUP BY label_k, i),
       |win AS (
       |  SELECT a.label_k, a.i AS i, COUNT(*) AS n,
       |    SUM((b.i - (a.i - 4)) * 21600) AS sx,
       |    SUM(b.cents) AS sy,
       |    SUM((b.i - (a.i - 4)) * 21600 * b.cents) AS sxy,
       |    SUM((b.i - (a.i - 4)) * 21600 * (b.i - (a.i - 4)) * 21600) AS sxx
       |  FROM snap a JOIN snap b ON a.label_k = b.label_k
       |    AND b.i BETWEEN a.i - 3 AND a.i
       |  WHERE a.i >= 4
       |  GROUP BY a.label_k, a.i)
       |SELECT w.label_k,
       |  (t.t_us // 1000000) - (243 - w.i) * 21600 AS t_s,
       |  CAST(w.n * w.sxy - w.sx * w.sy AS DOUBLE)
       |    / CAST(w.n * w.sxx - w.sx * w.sx AS DOUBLE) / 100.0 AS value
       |FROM win w, t WHERE w.n * w.sxx - w.sx * w.sx <> 0
       |ORDER BY w.label_k, t_s""".stripMargin

  /** p112: `changes(k_total6h[1d])` on the dense 240×6h grid — the
    * activity panel over a recording rule. The twin rebuilds the 243
    * lattice snapshots, flags each present row whose value differs from
    * its predecessor (global LAG over present rows — null at birth, so
    * a pair with the pre-window or pre-birth sample never counts), and
    * sums the LAST k−1 = 3 flags per output instant (both-ends-in-window
    * pairs exactly); every present series reads a value, 0 included.
    */
  val RecordedGridChangesSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |idx AS (SELECT unnest(generate_series(1, 243)) AS i),
       |snap AS (
       |  SELECT label_k, i, SUM(CAST(value AS DECIMAL(18,2))) AS v
       |  FROM m, t, idx
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - (243 - i) * 21600000000
       |  GROUP BY label_k, i),
       |flg AS (
       |  SELECT label_k, i,
       |    CASE WHEN LAG(v) OVER (PARTITION BY label_k ORDER BY i)
       |           IS NOT NULL
       |         AND v <> LAG(v) OVER (PARTITION BY label_k ORDER BY i)
       |      THEN 1 ELSE 0 END AS c
       |  FROM snap),
       |win AS (
       |  SELECT a.label_k, a.i AS i, SUM(b.c) AS n_chg
       |  FROM flg a JOIN flg b ON a.label_k = b.label_k
       |    AND b.i BETWEEN a.i - 2 AND a.i
       |  WHERE a.i >= 4
       |  GROUP BY a.label_k, a.i)
       |SELECT w.label_k,
       |  (t.t_us // 1000000) - (243 - w.i) * 21600 AS t_s,
       |  CAST(w.n_chg AS DOUBLE) AS value
       |FROM win w, t
       |ORDER BY w.label_k, t_s""".stripMargin

  /** p117: `quantile_over_time(0.25, k_total6h[1d])` on the dense
    * 240×6h grid — each output instant's 4-point lattice window rank-
    * walked with the PromQL (n−1)·φ interpolation on exact cents,
    * partial windows at a series' birth included.
    */
  val RecordedGridQuantileSql: String =
    s"""WITH ${recordedLatticeCents(243)},
       |win AS (
       |  SELECT a.label_k, a.i AS i, b.cents
       |  FROM snap a JOIN snap b ON a.label_k = b.label_k
       |    AND b.i BETWEEN a.i - 3 AND a.i
       |  WHERE a.i >= 4),
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY label_k, i ORDER BY cents) AS rn,
       |  COUNT(*) OVER (PARTITION BY label_k, i) AS n
       |  FROM win),
       |p AS (SELECT *, CAST(n - 1 AS DOUBLE) * 0.25 AS pos FROM r)
       |SELECT p.label_k,
       |  (t.t_us // 1000000) - (243 - p.i) * 21600 AS t_s,
       |  (MAX(CASE WHEN rn = CAST(FLOOR(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE
       |   + (MAX(CASE WHEN rn = CAST(CEIL(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE
       |      - MAX(CASE WHEN rn = CAST(FLOOR(pos) AS BIGINT) + 1 THEN cents END)::DOUBLE)
       |     * (MAX(pos) - FLOOR(MAX(pos)))) / 100.0 AS value
       |FROM p, t GROUP BY p.label_k, p.i, t.t_us
       |ORDER BY label_k, t_s""".stripMargin

  /** p118: `ts_of_max_over_time(k_total6h[1d])` on the dense grid —
    * the lattice write timestamp of each window's max, latest-instant
    * tiebreak, exact integer micros → one double division.
    */
  val RecordedGridTsOfMaxSql: String =
    s"""WITH ${recordedLatticeCents(243)},
       |win AS (
       |  SELECT a.label_k, a.i AS i, b.i AS j,
       |    ROW_NUMBER() OVER (PARTITION BY a.label_k, a.i
       |                       ORDER BY b.cents DESC, b.i DESC) AS rn
       |  FROM snap a JOIN snap b ON a.label_k = b.label_k
       |    AND b.i BETWEEN a.i - 3 AND a.i
       |  WHERE a.i >= 4)
       |SELECT w.label_k,
       |  (t.t_us // 1000000) - (243 - w.i) * 21600 AS t_s,
       |  CAST(t.t_us - (243 - w.j) * 21600000000 AS DOUBLE) / 1e6 AS value
       |FROM win w, t WHERE w.rn = 1
       |ORDER BY w.label_k, t_s""".stripMargin

  /** p119: `stddev_over_time(k_total6h[1d])` on the dense grid — the
    * exact integer (Σx, Σx², n) moments per 4-point window, the
    * engine's variance double walk.
    */
  val RecordedGridStddevSql: String =
    s"""WITH ${recordedLatticeCents(243)},
       |win AS (
       |  SELECT a.label_k, a.i AS i,
       |    CAST(SUM(b.cents) AS BIGINT) AS s1,
       |    CAST(SUM(b.cents * b.cents) AS BIGINT) AS s2,
       |    COUNT(*) AS n
       |  FROM snap a JOIN snap b ON a.label_k = b.label_k
       |    AND b.i BETWEEN a.i - 3 AND a.i
       |  WHERE a.i >= 4
       |  GROUP BY a.label_k, a.i)
       |SELECT w.label_k,
       |  (t.t_us // 1000000) - (243 - w.i) * 21600 AS t_s,
       |  sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0 AS value
       |FROM win w, t
       |ORDER BY w.label_k, t_s""".stripMargin

  /** `limitk by (k) (1, purchase)` — one series per k group chosen by
    * the deterministic label-identity hash (md5 ascending, labels
    * tiebreak), mirroring the compiler's ranking window exactly.
    */
  val LimitkSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |snap AS (
       |  SELECT name, label_k, label_instance,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY name, label_k, label_instance),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY label_k
       |    ORDER BY md5(name || '|' || label_k || '|' || label_instance),
       |             name, label_k, label_instance) AS rk
       |  FROM snap)
       |SELECT name, label_k, label_instance, CAST(dv AS DOUBLE) AS value
       |FROM r WHERE rk <= 1
       |ORDER BY name, label_k, label_instance""".stripMargin

  /** `limit_ratio(0.5, purchase)` — deterministic hash sampling of
    * series: keep u(series) < 0.5 where u is the first 8 md5 hex chars
    * of the label identity (fixed-width lowercase hex: lexicographic =
    * numeric compare in both engines).
    */
  val LimitRatioSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |snap AS (
       |  SELECT name, label_k, label_instance,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY name, label_k, label_instance)
       |SELECT name, label_k, label_instance, CAST(dv AS DOUBLE) AS value
       |FROM snap
       |WHERE substr(md5(name || '|' || label_k || '|' || label_instance), 1, 8) < '80000000'
       |ORDER BY name, label_k, label_instance""".stripMargin

  /** `sum by (k) (purchase{k=~"1.*"}) / on(k) sum by (k) (click)` —
    * both sides aggregated over the instance label first, so the
    * `on(k)` match is one-to-one (PromQL rejects many-to-many).
    */
  val BinOpSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |p AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS pv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |    AND regexp_matches(label_k, '^(?:1.*)$$')
       |  GROUP BY label_k),
       |c AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS cv
       |  FROM m WHERE name = 'click' AND value >= 0
       |  GROUP BY label_k)
       |SELECT p.label_k AS label_k, CAST(pv AS DOUBLE) / CAST(cv AS DOUBLE) AS value
       |FROM p JOIN c USING (label_k)
       |ORDER BY label_k, value""".stripMargin

  /** `histogram_quantile(0.9, error)` — instant quantile per full
    * series key.
    */
  val HistogramQuantileSql: String =
    histogramQuantileTwin(0.9, "epoch_us(ts) <= t_us")

  /** `histogram_quantile(0.9, rate(error[4d]))` — the canonical
    * alerting idiom: windowed bucket increase feeding the quantile
    * (scale-invariant, so rate and increase agree).
    */
  val HistogramQuantileRateSql: String =
    histogramQuantileTwin(0.9,
      "epoch_us(ts) > t_us - 345600000000 AND epoch_us(ts) <= t_us")

  /** `histogram_quantile(0.9, sum by (k) (rate(error[4d])))` — the
    * aggregated-histogram idiom: bucket series summed across instances
    * before the interpolation (one fused grouping, no per-series pass).
    */
  val HistogramQuantileAggSql: String =
    histogramQuantileTwin(0.9,
      "epoch_us(ts) > t_us - 345600000000 AND epoch_us(ts) <= t_us",
      Seq("label_k"))

  /** `histogram_avg(error)` — the family keeps raw observations, so
    * avg = exact decimal sum / count (B11's `_sum`/`_count` derived
    * series, divided) — no bucket estimation involved.
    */
  val HistogramAvgSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m)
       |SELECT name, label_k, label_instance,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS value
       |FROM m, t
       |WHERE name = 'error' AND epoch_us(ts) <= t_us
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `histogram_stddev(error)` — exact integer-cents moments over the
    * family's raw observations, the stddev_over_time expression shape.
    */
  val HistogramStddevSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT name, label_k, label_instance,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents
       |  FROM m, t
       |  WHERE name = 'error' AND epoch_us(ts) <= t_us),
       |a AS (
       |  SELECT name, label_k, label_instance,
       |    CAST(SUM(cents) AS BIGINT) AS s1,
       |    CAST(SUM(cents * cents) AS BIGINT) AS s2,
       |    COUNT(*) AS n
       |  FROM w GROUP BY name, label_k, label_instance)
       |SELECT name, label_k, label_instance,
       |  sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0 AS value
       |FROM a
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `histogram_count(rate(error[4d]))` — windowed observation count
    * per series divided by the window seconds.
    */
  val HistogramCountRateSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m)
       |SELECT name, label_k, label_instance,
       |  CAST(COUNT(*) AS DOUBLE) / 345600.0 AS value
       |FROM m, t
       |WHERE name = 'error'
       |  AND epoch_us(ts) > t_us - 345600000000 AND epoch_us(ts) <= t_us
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `histogram_fraction(2.5, 75.5, error)` — F(x) per series via the
    * same MAX-over-bucket-rows pick the compiler emits (cumulative
    * counts are monotone in le, so MAX lands on the single row whose
    * bucket contains x; full buckets below telescope into prev_cum).
    */
  /** `double_exponential_smoothing(signup[10d], 0.5, 0.3)` — the
    * windowed Holt-Winters fold stepped by a RECURSIVE CTE. The
    * recurrence is pure +/× (no libm): sample order is pinned by
    * `(ts, event_id)` on both sides and each step is the identical
    * correctly-rounded expression tree the compiler's `aggregate`
    * lambda evaluates (s′ recomputed inline in b′), so every
    * intermediate double matches. The smoothing-factor literals are the
    * SAME Scala doubles the compiler interpolates into its expression.
    */
  val SmoothingSql: String = {
    val sf = 0.5
    val tf = 0.3
    val sfL = s"CAST('$sf' AS DOUBLE)"
    val isfL = s"CAST('${1 - sf}' AS DOUBLE)"
    val tfL = s"CAST('$tf' AS DOUBLE)"
    val itfL = s"CAST('${1 - tf}' AS DOUBLE)"
    s"""WITH RECURSIVE m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (SELECT name, label_k, label_instance, ts, event_id, value
       |      FROM m, t
       |      WHERE name = 'signup' AND epoch_us(ts) > t_us - 864000000000
       |        AND epoch_us(ts) <= t_us),
       |g AS (SELECT name, label_k, label_instance,
       |        list(value ORDER BY ts, event_id) AS vals
       |      FROM w GROUP BY 1, 2, 3),
       |g2 AS (SELECT *, len(vals) AS n FROM g WHERE len(vals) >= 2),
       |steps AS (
       |  SELECT name, label_k, label_instance, vals, n, 1 AS p,
       |    vals[1] AS s, vals[2] - vals[1] AS b
       |  FROM g2
       |  UNION ALL
       |  SELECT name, label_k, label_instance, vals, n, p + 1,
       |    $sfL * vals[p + 1] + $isfL * (s + b),
       |    $tfL * (($sfL * vals[p + 1] + $isfL * (s + b)) - s) + $itfL * b
       |  FROM steps WHERE p < n)
       |SELECT name, label_k, label_instance, s AS value
       |FROM steps WHERE p = n
       |ORDER BY name, label_k, label_instance, value""".stripMargin
  }

  /** `histogram_quantile(0.9, error)` with `error` declared NATIVE:
    * the sparse exponential-bucket rebuild over the shared literal
    * bounds, with the aggregator's exact rank walk and the
    * interpolation through [[graft.functions.DetMath.exp2Sql]] — the
    * same pinned step sequence the Spark plan runs, so doubles
    * bit-match. The quantile is scale-invariant, so the windowed
    * `rate(error[d])` form differs ONLY in `tsFilter` (exactly like
    * the classic twin).
    */
  private def nativeHistogramQuantileTwin(tsFilter: String,
      gCols: Seq[String] = Seq("name", "label_k", "label_instance"),
      wCte: Option[String] = None): String = {
    val g = gCols.mkString(", ")
    def eq(a: String, b: String): String =
      gCols.map(c => s"$a.$c = $b.$c").mkString(" AND ")
    def cols(a: String): String = gCols.map(c => s"$a.$c").mkString(", ")
    val outCols = gCols.map(c => s"t2.$c AS $c").mkString(", ")
    val interp = graft.functions.DetMath.exp2Sql("xq")
    val w = wCte.getOrElse(
      s"""SELECT $g, value FROM m, t
         |      WHERE name = 'error' AND $tsFilter""".stripMargin)
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS ($w),
       |bounds AS (${Metrics.NhBoundsSql}),
       |tot AS (
       |  SELECT $g, COUNT(*) AS cnt,
       |    CAST(SUM(CASE WHEN value = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero
       |  FROM w GROUP BY $g),
       |bk AS (
       |  SELECT $g, b.bucket, b.hi, COUNT(*) AS c
       |  FROM w JOIN bounds b ON w.value > b.lo AND w.value <= b.hi
       |  GROUP BY $g, b.bucket, b.hi),
       |bw AS (
       |  SELECT *, SUM(c) OVER (PARTITION BY $g ORDER BY bucket) AS cumc
       |  FROM bk),
       |bs AS (SELECT $g, MAX(hi) AS last_hi FROM bw GROUP BY $g),
       |pick AS (
       |  SELECT ${cols("q")}, w2.bucket,
       |    (q.rank - CAST(q.zero + w2.cumc - w2.c AS DOUBLE))
       |      / CAST(w2.c AS DOUBLE) AS f,
       |    ROW_NUMBER() OVER (PARTITION BY ${cols("q")}
       |      ORDER BY w2.bucket) AS rn
       |  FROM (SELECT *, 0.9 * CAST(cnt AS DOUBLE) AS rank FROM tot) q
       |  JOIN bw w2 ON ${eq("w2", "q")}
       |    AND q.rank <= CAST(q.zero + w2.cumc AS DOUBLE)
       |  WHERE q.rank > CAST(q.zero AS DOUBLE)),
       |pq AS (
       |  SELECT $g, $interp AS qv
       |  FROM (SELECT $g,
       |          (CAST(bucket - 1 AS DOUBLE) + f) / 8.0 AS xq
       |        FROM pick WHERE rn = 1))
       |SELECT $outCols,
       |  CASE WHEN 0.9 * CAST(t2.cnt AS DOUBLE) <= CAST(t2.zero AS DOUBLE) THEN 0.0
       |       WHEN pq.qv IS NOT NULL THEN pq.qv
       |       ELSE bs.last_hi END AS value
       |FROM tot t2
       |LEFT JOIN pq ON ${eq("pq", "t2")}
       |LEFT JOIN bs ON ${eq("bs", "t2")}
       |ORDER BY $g, value""".stripMargin
  }

  /** `histogram_quantile(0.9, error)` on the native family — instant. */
  val NativeHistogramQuantileSql: String =
    nativeHistogramQuantileTwin("epoch_us(ts) <= t_us")

  /** `histogram_quantile(0.9, rate(error[4d]))` on the native family —
    * the alerting form; scale-invariance makes rate/increase identical.
    */
  val NativeHistogramQuantileRateSql: String =
    nativeHistogramQuantileTwin(
      "epoch_us(ts) > t_us - 345600000000 AND epoch_us(ts) <= t_us")

  /** `histogram_quantile(0.9, sum by (k) (rate(error[4d])))` on the
    * native family — the everyday aggregated alerting form through the
    * sparse-bucket plan: merging native sketches across instances is a
    * coarser grouping of the same exact bucket counts, so the twin is
    * the SAME generator grouped on `label_k` alone.
    */
  val NativeHistogramQuantileAggSql: String =
    nativeHistogramQuantileTwin(
      "epoch_us(ts) > t_us - 345600000000 AND epoch_us(ts) <= t_us",
      gCols = Seq("label_k"))

  /** p82: `histogram_quantile(0.9, sum by (k) (rate(error[2d])))` with
    * `error` NATIVE, on the 240×6h grid — the sparse-bucket alerting
    * panel at every step: per instant, the windowed observations feed
    * the same exact bucket walk + DetMath.exp2 interpolation, grouped
    * on (label_k, t_s).
    */
  val QueryRangeNativeHqSql: String =
    nativeHistogramQuantileTwin("", gCols = Seq("label_k", "t_s"),
      wCte = Some(
        """SELECT m.label_k,
          |    (t.t_us // 1000000) - (240 - i.i) * 21600 AS t_s,
          |    m.value
          |  FROM m, t, (SELECT unnest(generate_series(1, 240)) AS i) i
          |  WHERE m.name = 'error'
          |    AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
          |    AND epoch_us(m.ts) >  t.t_us - (240 - i.i) * 21600000000 - 172800000000""".stripMargin))

  /** p91: the pyramid-served NATIVE panel — the same 1d windows at the
    * last 40 bucket-ALIGNED 6h instants the p88/p90 panels use, sketch
    * and det_exp2 walk re-derived straight from raw observations; the
    * engine side answers from compacted nh rollups
    * ([[graft.operators.Downsample.nativeHistogramPanel]]), so the hash
    * match proves native-histogram pyramid serving lossless.
    */
  val RollupNativeHqSql: String =
    nativeHistogramQuantileTwin("", gCols = Seq("label_k", "t_s"),
      wCte = Some(
        """SELECT m.label_k,
          |    (ta.bmax - i.i + 1) * 21600 AS t_s,
          |    m.value
          |  FROM m, (SELECT (MAX(epoch_us(ts)) + 21599999999) // 21600000000 - 1
          |             AS bmax FROM m) ta,
          |       (SELECT unnest(generate_series(0, 39)) AS i) i
          |  WHERE m.name = 'error'
          |    AND epoch_us(m.ts) >  (ta.bmax - i.i - 3) * 21600000000
          |    AND epoch_us(m.ts) <= (ta.bmax - i.i + 1) * 21600000000""".stripMargin))

  /** a1g: the `/federate` payload for `match[]=purchase&match[]=signup`
    * — counter totals and gauge LWW per full series key rendered as
    * timestamped exposition lines (`name{instance=…,k=…} v <ts_ms>`),
    * sorted, one payload string; mirrors [[Api.federateText]] byte for
    * byte (cents rendering, alphabetical labels, trailing newline).
    */
  val FederateSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT (MAX(epoch_us(ts)) // 1000000) * 1000 AS ts_ms FROM m),
       |c AS (SELECT name, label_k, label_instance,
       |        SUM(CAST(round(value * 100, 0) AS BIGINT)) AS cents
       |      FROM m WHERE kind = 'counter' AND value >= 0 AND name = 'purchase'
       |      GROUP BY name, label_k, label_instance),
       |g AS (SELECT name, label_k, label_instance,
       |        CAST(round(value * 100, 0) AS BIGINT) AS cents
       |      FROM (SELECT *, ROW_NUMBER() OVER (
       |              PARTITION BY name, label_k, label_instance
       |              ORDER BY ts DESC, event_id DESC) AS rn
       |            FROM m WHERE kind = 'gauge' AND name = 'signup')
       |      WHERE rn = 1),
       |u AS (SELECT * FROM c UNION ALL SELECT * FROM g),
       |lines AS (
       |  SELECT name || '{instance="' || label_instance || '",k="' || label_k
       |    || '"} ' || (CASE WHEN cents < 0 THEN '-' ELSE '' END)
       |    || CAST(abs(cents) // 100 AS VARCHAR) || '.'
       |    || lpad(CAST(abs(cents) % 100 AS VARCHAR), 2, '0')
       |    || ' ' || CAST(t.ts_ms AS VARCHAR) AS line
       |  FROM u, t)
       |SELECT string_agg(line, chr(10) ORDER BY line) || chr(10) AS payload
       |FROM lines""".stripMargin

  /** a1gc: [[FederateSql]] under
    * `external_labels: {env: prod, k: ext}` — `env` joins every line
    * alphabetically (env < instance < k), while `k` keeps the SERIES'
    * own value (the external pair is dropped on conflict, upstream's
    * rule).
    */
  val FederateExternalSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT (MAX(epoch_us(ts)) // 1000000) * 1000 AS ts_ms FROM m),
       |c AS (SELECT name, label_k, label_instance,
       |        SUM(CAST(round(value * 100, 0) AS BIGINT)) AS cents
       |      FROM m WHERE kind = 'counter' AND value >= 0 AND name = 'purchase'
       |      GROUP BY name, label_k, label_instance),
       |g AS (SELECT name, label_k, label_instance,
       |        CAST(round(value * 100, 0) AS BIGINT) AS cents
       |      FROM (SELECT *, ROW_NUMBER() OVER (
       |              PARTITION BY name, label_k, label_instance
       |              ORDER BY ts DESC, event_id DESC) AS rn
       |            FROM m WHERE kind = 'gauge' AND name = 'signup')
       |      WHERE rn = 1),
       |u AS (SELECT * FROM c UNION ALL SELECT * FROM g),
       |lines AS (
       |  SELECT name || '{env="prod",instance="' || label_instance
       |    || '",k="' || label_k
       |    || '"} ' || (CASE WHEN cents < 0 THEN '-' ELSE '' END)
       |    || CAST(abs(cents) // 100 AS VARCHAR) || '.'
       |    || lpad(CAST(abs(cents) % 100 AS VARCHAR), 2, '0')
       |    || ' ' || CAST(t.ts_ms AS VARCHAR) AS line
       |  FROM u, t)
       |SELECT string_agg(line, chr(10) ORDER BY line) || chr(10) AS payload
       |FROM lines""".stripMargin

  /** a1gb: `/federate` with `match[]=k_total6h&match[]=signup` under
    * the standing 6h sum-by rule — recorded names federate like any
    * TSDB series (upstream's rule loop writes them), rendered with the
    * record as `__name__` and the rule's by-labels, alongside a raw
    * gauge family; same byte discipline as [[FederateSql]].
    */
  val FederateRecordedSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT (MAX(epoch_us(ts)) // 1000000) * 1000 AS ts_ms FROM m),
       |c AS (SELECT 'k_total6h' AS name, label_k,
       |        SUM(CAST(round(value * 100, 0) AS BIGINT)) AS cents
       |      FROM m WHERE kind = 'counter' AND value >= 0 AND name = 'purchase'
       |      GROUP BY label_k),
       |g AS (SELECT name, label_k, label_instance,
       |        CAST(round(value * 100, 0) AS BIGINT) AS cents
       |      FROM (SELECT *, ROW_NUMBER() OVER (
       |              PARTITION BY name, label_k, label_instance
       |              ORDER BY ts DESC, event_id DESC) AS rn
       |            FROM m WHERE kind = 'gauge' AND name = 'signup')
       |      WHERE rn = 1),
       |lines AS (
       |  SELECT name || '{k="' || label_k || '"} '
       |    || (CASE WHEN cents < 0 THEN '-' ELSE '' END)
       |    || CAST(abs(cents) // 100 AS VARCHAR) || '.'
       |    || lpad(CAST(abs(cents) % 100 AS VARCHAR), 2, '0')
       |    || ' ' || CAST(t.ts_ms AS VARCHAR) AS line
       |  FROM c, t
       |  UNION ALL
       |  SELECT name || '{instance="' || label_instance || '",k="' || label_k
       |    || '"} ' || (CASE WHEN cents < 0 THEN '-' ELSE '' END)
       |    || CAST(abs(cents) // 100 AS VARCHAR) || '.'
       |    || lpad(CAST(abs(cents) % 100 AS VARCHAR), 2, '0')
       |    || ' ' || CAST(t.ts_ms AS VARCHAR) AS line
       |  FROM g, t)
       |SELECT string_agg(line, chr(10) ORDER BY line) || chr(10) AS payload
       |FROM lines""".stripMargin

  /** p92: the pyramid ROUTER — `sum by (k) (rate(purchase[2d]))` at
    * 240 aligned 6h instants, PromQL windows (`(t−W, t]` — the rollup
    * buckets are closed-right, see [[Pyramid]], so rollup serving is
    * convention-exact) computed straight from raw events; the engine
    * answers from compacted rollups, so the hash match proves the
    * routed answer exact at corpus scale.
    */
  val PyramidRateSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) // 21600000000 AS ebi FROM m),
       |inst AS (SELECT unnest(generate_series(0, 239)) AS i)
       |SELECT m.label_k, (t.ebi - i.i) * 21600 AS t_s,
       |  CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) / 172800.0 AS value
       |FROM m, t, inst i
       |WHERE m.name = 'purchase'
       |  AND epoch_us(m.ts) >  ((t.ebi - i.i) * 21600 - 172800) * 1000000
       |  AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000
       |GROUP BY m.label_k, i.i, t.ebi
       |ORDER BY label_k, t_s""".stripMargin

  /** p93: the router's GAUGE arm — bare `signup` at 240 aligned 6h
    * instants: per series, the latest raw sample at or before each
    * instant ((ts, event_id)-tie-broken — PromQL's inclusive instant
    * read); the engine reads only rollup `vlast` anchors.
    */
  val PyramidGaugeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) // 21600000000 AS ebi FROM m),
       |inst AS (SELECT unnest(generate_series(0, 239)) AS i),
       |r AS (
       |  SELECT m.name, m.label_k, m.label_instance,
       |    (t.ebi - i.i) * 21600 AS t_s, m.value,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY m.name, m.label_k, m.label_instance, i.i
       |      ORDER BY m.ts DESC, m.event_id DESC) AS rn
       |  FROM m, t, inst i
       |  WHERE m.name = 'signup'
       |    AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000)
       |SELECT name, label_k, label_instance, t_s, value FROM r WHERE rn = 1
       |ORDER BY name, label_k, label_instance, t_s""".stripMargin

  /** p94: the router's counter-TOTALS arm — `sum by (k) (purchase)` at
    * 240 aligned 6h instants: the exact-decimal running total of every
    * sample at or before each instant.
    */
  val PyramidTotalsSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) // 21600000000 AS ebi FROM m),
       |inst AS (SELECT unnest(generate_series(0, 239)) AS i)
       |SELECT m.label_k, (t.ebi - i.i) * 21600 AS t_s,
       |  CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM m, t, inst i
       |WHERE m.name = 'purchase'
       |  AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000
       |GROUP BY m.label_k, i.i, t.ebi
       |ORDER BY label_k, t_s""".stripMargin

  /** p95: the router's HISTOGRAM arm —
    * `histogram_quantile(0.5, sum by (k) (rate(error[1d])))` at 240
    * aligned 6h instants, PromQL `(t−W, t]` windows, ladder and
    * interpolation from raw events; the engine reads compacted
    * per-`le` rollups.
    */
  val PyramidHqSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) // 21600000000 AS ebi FROM m),
       |inst AS (SELECT unnest(generate_series(0, 239)) AS i),
       |b AS (${Metrics.BucketBoundsSql}),
       |w AS (
       |  SELECT m.label_k, (t.ebi - i.i) * 21600 AS t_s, b.le,
       |    SUM(CASE WHEN m.value <= b.le THEN 1 ELSE 0 END) AS wc,
       |    COUNT(*) AS wn
       |  FROM m, t, inst i, b
       |  WHERE m.kind = 'histogram' AND m.name = 'error'
       |    AND epoch_us(m.ts) >  ((t.ebi - i.i) * 21600 - 86400) * 1000000
       |    AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000
       |  GROUP BY m.label_k, i.i, t.ebi, b.le),
       |r AS (
       |  SELECT label_k, t_s, le, wc,
       |    0.5 * CAST(wn AS DOUBLE) AS rank,
       |    COALESCE(LAG(le) OVER (PARTITION BY label_k, t_s ORDER BY le), 0.0) AS prev_le,
       |    COALESCE(LAG(wc) OVER (PARTITION BY label_k, t_s ORDER BY le), 0) AS prev_cum,
       |    MAX(le) OVER (PARTITION BY label_k, t_s) AS max_le,
       |    MAX(wc) OVER (PARTITION BY label_k, t_s) AS max_cum
       |  FROM w)
       |SELECT label_k, t_s,
       |  prev_le + (le - prev_le) * (rank - CAST(prev_cum AS DOUBLE))
       |    / CAST(wc - prev_cum AS DOUBLE) AS value
       |FROM r WHERE wc >= rank AND prev_cum < rank
       |UNION ALL
       |SELECT label_k, t_s, max_le AS value
       |FROM r WHERE le = max_le AND rank > CAST(max_cum AS DOUBLE)
       |ORDER BY label_k, t_s""".stripMargin

  /** p97: the router's `*_over_time` arm — `avg_over_time(signup[1d])`
    * per series at 240 aligned 6h instants under PromQL's `(t−W, t]`
    * windows, the mean computed straight from raw events as
    * exact-decimal sum over count with ONE final cast (the engine
    * divides the windowed rollup `sum_dec` by the windowed `cnt`, so
    * both sides divide identical doubles).
    */
  val PyramidOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) // 21600000000 AS ebi FROM m),
       |inst AS (SELECT unnest(generate_series(0, 239)) AS i)
       |SELECT m.name, m.label_k, m.label_instance,
       |  (t.ebi - i.i) * 21600 AS t_s,
       |  CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS value
       |FROM m, t, inst i
       |WHERE m.name = 'signup'
       |  AND epoch_us(m.ts) >  ((t.ebi - i.i) * 21600 - 86400) * 1000000
       |  AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000
       |GROUP BY m.name, m.label_k, m.label_instance, i.i, t.ebi
       |ORDER BY name, label_k, label_instance, t_s""".stripMargin

  /** p98: the router's windowed-LWW arm — `last_over_time(signup[1d])`
    * per series at 240 aligned 6h instants under PromQL's `(t−W, t]`
    * windows: the freshest raw sample inside each window,
    * (ts, event_id)-tie-broken; the engine reads only the anchored
    * rollup `vlast` fields.
    */
  val PyramidLastSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) // 21600000000 AS ebi FROM m),
       |inst AS (SELECT unnest(generate_series(0, 239)) AS i),
       |r AS (
       |  SELECT m.name, m.label_k, m.label_instance,
       |    (t.ebi - i.i) * 21600 AS t_s, m.value,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY m.name, m.label_k, m.label_instance, i.i
       |      ORDER BY m.ts DESC, m.event_id DESC) AS rn
       |  FROM m, t, inst i
       |  WHERE m.name = 'signup'
       |    AND epoch_us(m.ts) >  ((t.ebi - i.i) * 21600 - 86400) * 1000000
       |    AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000)
       |SELECT name, label_k, label_instance, t_s, value FROM r WHERE rn = 1
       |ORDER BY name, label_k, label_instance, t_s""".stripMargin

  /** p99: COMPOSITION over the pyramid —
    * `sum by (k) (rate(purchase[1d])) / sum by (k) (rate(click[1d]))`
    * at 240 aligned 6h instants: each side's PromQL `(t−W, t]` window
    * sum from raw events, divided per (label_k, instant) with the
    * identical double-operation order the engine uses (decimal → double
    * → /86400 per side, then the ratio); the inner join IS default
    * one-to-one matching (unmatched instants drop). The engine joins
    * two recursively-routed rollup relations — raw events untouched.
    */
  val PyramidRatioSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) // 21600000000 AS ebi FROM m),
       |inst AS (SELECT unnest(generate_series(0, 239)) AS i),
       |a AS (
       |  SELECT m.label_k, (t.ebi - i.i) * 21600 AS t_s,
       |    CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) / 86400.0 AS v
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase'
       |    AND epoch_us(m.ts) >  ((t.ebi - i.i) * 21600 - 86400) * 1000000
       |    AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000
       |  GROUP BY m.label_k, i.i, t.ebi),
       |c AS (
       |  SELECT m.label_k, (t.ebi - i.i) * 21600 AS t_s,
       |    CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) / 86400.0 AS v
       |  FROM m, t, inst i
       |  WHERE m.name = 'click'
       |    AND epoch_us(m.ts) >  ((t.ebi - i.i) * 21600 - 86400) * 1000000
       |    AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000
       |  GROUP BY m.label_k, i.i, t.ebi)
       |SELECT a.label_k, a.t_s, a.v / c.v AS value
       |FROM a JOIN c ON a.label_k = c.label_k AND a.t_s = c.t_s
       |ORDER BY a.label_k, a.t_s""".stripMargin

  /** p100: `max by (k) (rate(purchase[1d]))` at 240 aligned 6h instants
    * — the router's GENERIC aggregation layer: per-series windowed
    * decimal sums, max per (k, instant) over the undivided decimals
    * (ordering commutes with the positive deferred divisor), ONE ÷86400
    * on the winner.
    */
  val PyramidAggSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) // 21600000000 AS ebi FROM m),
       |inst AS (SELECT unnest(generate_series(0, 239)) AS i),
       |s AS (
       |  SELECT m.label_k, m.label_instance, (t.ebi - i.i) * 21600 AS t_s,
       |    SUM(CAST(m.value AS DECIMAL(18,2))) AS d
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase'
       |    AND epoch_us(m.ts) >  ((t.ebi - i.i) * 21600 - 86400) * 1000000
       |    AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000
       |  GROUP BY m.label_k, m.label_instance, i.i, t.ebi)
       |SELECT label_k, t_s, CAST(MAX(d) AS DOUBLE) / 86400.0 AS value
       |FROM s GROUP BY label_k, t_s
       |ORDER BY label_k, t_s""".stripMargin

  /** p101: `topk(1, sum by (k) (rate(purchase[1d])))` at 240 aligned 6h
    * instants — the generic layer's per-instant ranking: groups order
    * by the summed UNDIVIDED decimal descending with the label
    * tie-break, the winner divides once.
    */
  val PyramidTopkSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) // 21600000000 AS ebi FROM m),
       |inst AS (SELECT unnest(generate_series(0, 239)) AS i),
       |s AS (
       |  SELECT m.label_k, (t.ebi - i.i) * 21600 AS t_s,
       |    SUM(CAST(m.value AS DECIMAL(18,2))) AS d
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase'
       |    AND epoch_us(m.ts) >  ((t.ebi - i.i) * 21600 - 86400) * 1000000
       |    AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000
       |  GROUP BY m.label_k, i.i, t.ebi),
       |r AS (
       |  SELECT label_k, t_s, d, ROW_NUMBER() OVER (
       |    PARTITION BY t_s ORDER BY d DESC, label_k) AS rn
       |  FROM s)
       |SELECT label_k, t_s, CAST(d AS DOUBLE) / 86400.0 AS value
       |FROM r WHERE rn = 1
       |ORDER BY label_k, t_s""".stripMargin

  /** p102: `histogram_sum(rate(error[1d]))` at 240 aligned 6h instants —
    * the router's B11 arm: per-series windowed exact-decimal observation
    * sums from the BASE rollup (cnt/sum_dec), ONE ÷86400 at the end.
    */
  val PyramidHistScalarSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) // 21600000000 AS ebi FROM m),
       |inst AS (SELECT unnest(generate_series(0, 239)) AS i)
       |SELECT m.name, m.label_k, m.label_instance,
       |  (t.ebi - i.i) * 21600 AS t_s,
       |  CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) / 86400.0 AS value
       |FROM m, t, inst i
       |WHERE m.name = 'error'
       |  AND epoch_us(m.ts) >  ((t.ebi - i.i) * 21600 - 86400) * 1000000
       |  AND epoch_us(m.ts) <= (t.ebi - i.i) * 21600 * 1000000
       |GROUP BY m.name, m.label_k, m.label_instance, i.i, t.ebi
       |ORDER BY name, label_k, label_instance, t_s""".stripMargin

  /** p83: `max_over_time((sum by (k) (rate(purchase[1d])))[1d:6h])` on
    * the 240×6h grid — the subquery inner evaluates once on the shared
    * 6h lattice, each outer step takes the max over its 4 trailing
    * lattice instants (outer offsets j = 0..3). Inner window increases
    * stay DECIMAL through both the lattice and the outer max; ONE final
    * ÷86400 (the engine's deferred rateDiv through max_over_time) makes
    * the doubles bit-match.
    */
  val QueryRangeSubquerySql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 240)) AS i),
       |off AS (SELECT unnest(generate_series(0, 3)) AS j),
       |win AS (
       |  SELECT m.label_k, i.i, o.j,
       |    SUM(CAST(m.value AS DECIMAL(18,2))) AS dv
       |  FROM m, t, inst i, off o
       |  WHERE m.name = 'purchase' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000 - o.j * 21600000000
       |    AND epoch_us(m.ts) >  t.t_us - (240 - i.i) * 21600000000 - o.j * 21600000000 - 86400000000
       |  GROUP BY m.label_k, i.i, o.j)
       |SELECT w.label_k,
       |  (t.t_us // 1000000) - (240 - w.i) * 21600 AS t_s,
       |  CAST(MAX(w.dv) AS DOUBLE) / 86400.0 AS value
       |FROM win w, t
       |GROUP BY w.label_k, w.i, t.t_us
       |ORDER BY w.label_k, t_s""".stripMargin

  /** p84: `quantile_over_time(0.5, signup[1d])` on the 240×6h grid —
    * the p50-of-gauge panel at every step, evaluated by the explode
    * tier (each event feeds its 4 covering instants, then the union
    * path's own interpolation recipe keyed by instant). Exact cents
    * ranks + identical IEEE interpolation order ⇒ hash-exact.
    */
  val QueryRangeQuantileSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 240)) AS i),
       |w AS (
       |  SELECT m.name, m.label_k, m.label_instance, m.event_id, i.i,
       |    (t.t_us // 1000000) - (240 - i.i) * 21600 AS t_s,
       |    CAST(round(m.value * 100, 0) AS BIGINT) AS cents
       |  FROM m, t, inst i
       |  WHERE m.name = 'signup'
       |    AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
       |    AND epoch_us(m.ts) >  t.t_us - (240 - i.i) * 21600000000 - 86400000000),
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k, label_instance, i
       |                     ORDER BY cents, event_id) AS rn,
       |  COUNT(*) OVER (PARTITION BY name, label_k, label_instance, i) AS n
       |  FROM w),
       |p AS (SELECT *, CAST(n - 1 AS DOUBLE) * 0.5 AS pos FROM r)
       |SELECT name, label_k, label_instance, t_s,
       |  (CAST(MAX(CASE WHEN rn = CAST(floor(pos) AS BIGINT) + 1 THEN cents END) AS DOUBLE)
       |   + (CAST(MAX(CASE WHEN rn = CAST(ceil(pos) AS BIGINT) + 1 THEN cents END) AS DOUBLE)
       |      - CAST(MAX(CASE WHEN rn = CAST(floor(pos) AS BIGINT) + 1 THEN cents END) AS DOUBLE))
       |     * (MAX(pos) - floor(MAX(pos)))) / 100.0 AS value
       |FROM p GROUP BY name, label_k, label_instance, i, t_s
       |ORDER BY name, label_k, label_instance, t_s""".stripMargin

  /** `histogram_fraction(2.5, 75.5, error)` with `error` NATIVE: the
    * boundary constants' bucket index and log-interpolated in-bucket
    * fraction are computed once at generation time (the same
    * compose-time literals the Spark plan embeds); the SQL is pure
    * integer sums + one literal multiply per bound.
    */
  val NativeHistogramFractionSql: String = {
    val g = "name, label_k, label_instance"
    val (bLo, fLo, _) = graft.functions.NativeHistogramAggregator
      .fractionPieces(2.5, Metrics.NhSchema)
    val (bHi, fHi, _) = graft.functions.NativeHistogramAggregator
      .fractionPieces(75.5, Metrics.NhSchema)
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (SELECT $g, value FROM m, t
       |      WHERE name = 'error' AND epoch_us(ts) <= t_us),
       |bounds AS (${Metrics.NhBoundsSql}),
       |tot AS (
       |  SELECT $g, COUNT(*) AS cnt,
       |    CAST(SUM(CASE WHEN value = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero
       |  FROM w GROUP BY $g),
       |bk AS (
       |  SELECT $g, b.bucket, COUNT(*) AS c
       |  FROM w JOIN bounds b ON w.value > b.lo AND w.value <= b.hi
       |  GROUP BY $g, b.bucket),
       |s AS (
       |  SELECT $g,
       |    CAST(SUM(CASE WHEN bucket < $bHi THEN c ELSE 0 END) AS BIGINT) AS below_hi,
       |    CAST(SUM(CASE WHEN bucket = $bHi THEN c ELSE 0 END) AS BIGINT) AS at_hi,
       |    CAST(SUM(CASE WHEN bucket < $bLo THEN c ELSE 0 END) AS BIGINT) AS below_lo,
       |    CAST(SUM(CASE WHEN bucket = $bLo THEN c ELSE 0 END) AS BIGINT) AS at_lo
       |  FROM bk GROUP BY $g)
       |SELECT t2.name AS name, t2.label_k AS label_k,
       |  t2.label_instance AS label_instance,
       |  ((CAST(t2.zero + COALESCE(s.below_hi, 0) AS DOUBLE)
       |      + CAST(COALESCE(s.at_hi, 0) AS DOUBLE) * CAST('$fHi' AS DOUBLE))
       |   - (CAST(t2.zero + COALESCE(s.below_lo, 0) AS DOUBLE)
       |      + CAST(COALESCE(s.at_lo, 0) AS DOUBLE) * CAST('$fLo' AS DOUBLE)))
       |  / CAST(t2.cnt AS DOUBLE) AS value
       |FROM tot t2
       |LEFT JOIN s ON s.name = t2.name AND s.label_k = t2.label_k
       |  AND s.label_instance = t2.label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin
  }

  val HistogramFractionSql: String = {
    def f(x: Double): String =
      s"""MAX(CASE WHEN $x >= le THEN CAST(cum_count AS DOUBLE)
         |    WHEN $x > prev_le THEN CAST(prev_cum AS DOUBLE)
         |      + CAST(cum_count - prev_cum AS DOUBLE)
         |      * ($x - prev_le) / (le - prev_le)
         |    ELSE 0.0 END)""".stripMargin
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (SELECT name, label_k, label_instance, value FROM m, t
       |      WHERE name = 'error' AND epoch_us(ts) <= t_us),
       |b AS (SELECT * FROM (VALUES (1.0),(5.0),(10.0),(25.0),(50.0),(100.0),(150.0)) b(le)),
       |snap AS (
       |  SELECT name, label_k, label_instance, le,
       |    CAST(SUM(CASE WHEN value <= le THEN 1 ELSE 0 END) AS BIGINT) AS cum_count,
       |    COUNT(*) AS cnt
       |  FROM w CROSS JOIN b
       |  GROUP BY name, label_k, label_instance, le),
       |r AS (
       |  SELECT *,
       |    COALESCE(LAG(le) OVER w2, 0.0) AS prev_le,
       |    COALESCE(LAG(cum_count) OVER w2, 0) AS prev_cum
       |  FROM snap
       |  WINDOW w2 AS (PARTITION BY name, label_k, label_instance ORDER BY le))
       |SELECT name, label_k, label_instance,
       |  (${f(75.5)} - ${f(2.5)}) / CAST(MAX(cnt) AS DOUBLE) AS value
       |FROM r
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin
  }

  /** `histogram_fraction(2.5, 75.5, rate(error[4d]))` — the windowed
    * (alerting) form: the same single-row interpolation over bucket
    * counts built from the trailing 4d window only (the fraction is
    * scale-invariant, so rate and increase feed it identically).
    */
  val HistogramFractionRateSql: String = {
    def f(x: Double): String =
      s"""MAX(CASE WHEN $x >= le THEN CAST(cum_count AS DOUBLE)
         |    WHEN $x > prev_le THEN CAST(prev_cum AS DOUBLE)
         |      + CAST(cum_count - prev_cum AS DOUBLE)
         |      * ($x - prev_le) / (le - prev_le)
         |    ELSE 0.0 END)""".stripMargin
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (SELECT name, label_k, label_instance, value FROM m, t
       |      WHERE name = 'error' AND epoch_us(ts) <= t_us
       |        AND epoch_us(ts) > t_us - 345600000000),
       |b AS (SELECT * FROM (VALUES (1.0),(5.0),(10.0),(25.0),(50.0),(100.0),(150.0)) b(le)),
       |snap AS (
       |  SELECT name, label_k, label_instance, le,
       |    CAST(SUM(CASE WHEN value <= le THEN 1 ELSE 0 END) AS BIGINT) AS cum_count,
       |    COUNT(*) AS cnt
       |  FROM w CROSS JOIN b
       |  GROUP BY name, label_k, label_instance, le),
       |r AS (
       |  SELECT *,
       |    COALESCE(LAG(le) OVER w2, 0.0) AS prev_le,
       |    COALESCE(LAG(cum_count) OVER w2, 0) AS prev_cum
       |  FROM snap
       |  WINDOW w2 AS (PARTITION BY name, label_k, label_instance ORDER BY le))
       |SELECT name, label_k, label_instance,
       |  (${f(75.5)} - ${f(2.5)}) / CAST(MAX(cnt) AS DOUBLE) AS value
       |FROM r
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin
  }

  /** `max_over_time((resets(purchase[10d]))[4d:1d])` — windowed resets
    * evaluated at the subquery's four instants (T−3d … T, the union
    * path's shifts), max across instants where the window holds
    * samples. Per instant: the full-history wrapped running sum up to
    * that instant, decreases counted only between consecutive samples
    * both inside the 10d window (the p62 semantics, shifted).
    */
  val ResetsSubquerySql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(0, 3)) AS s),
       |c AS (SELECT m.ts, m.name, m.label_k, m.label_instance, m.event_id, i.s,
       |        CAST(round(m.value * 100, 0) AS BIGINT) AS cents,
       |        t.t_us - i.s * 86400000000 AS hi
       |      FROM m, t, inst i
       |      WHERE m.name = 'purchase' AND m.value >= 0
       |        AND epoch_us(m.ts) <= t.t_us - i.s * 86400000000),
       |w AS (SELECT *,
       |  SUM(cents) OVER (PARTITION BY name, label_k, label_instance, s
       |                   ORDER BY ts, event_id
       |                   ROWS UNBOUNDED PRECEDING) % 10000 AS wrapped
       |  FROM c),
       |d AS (SELECT *,
       |  LAG(wrapped) OVER sw AS prev,
       |  LAG(epoch_us(ts)) OVER sw AS prev_us
       |  FROM w WINDOW sw AS (PARTITION BY name, label_k, label_instance, s
       |                       ORDER BY ts, event_id)),
       |per AS (
       |  SELECT name, label_k, label_instance, s,
       |    CAST(SUM(CASE WHEN prev IS NOT NULL AND prev_us > hi - 864000000000
       |                   AND wrapped < prev THEN 1 ELSE 0 END) AS DOUBLE) AS v
       |  FROM d WHERE epoch_us(ts) > hi - 864000000000
       |  GROUP BY name, label_k, label_instance, s)
       |SELECT name, label_k, label_instance, MAX(v) AS value
       |FROM per
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `info(signup)` — the last-write-wins gauge snapshot enriched with
    * the adapter's derived target_info data label
    * (`version` = 'v' + instance digits).
    */
  val InfoSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |g AS (SELECT name, label_k, label_instance, value FROM (
       |        SELECT name, label_k, label_instance, value,
       |          ROW_NUMBER() OVER (PARTITION BY name, label_k, label_instance
       |                             ORDER BY ts DESC, event_id DESC) AS rn
       |        FROM m WHERE name = 'signup') WHERE rn = 1)
       |SELECT name, label_k, label_instance,
       |  'v' || substr(label_instance, 2) AS label_version, value
       |FROM g
       |ORDER BY name, label_k, label_instance, label_version, value""".stripMargin

  /** `max_over_time((avg_over_time(signup[2d]))[8d:1d])` — the nested
    * over_time grid: per instant i (1..8, t_i = T − (8−i)·1d) the
    * inner mean over (t_i − 2d, t_i] as exact decimal sum / count,
    * outer max across the instants where the window holds samples.
    */
  val NestedOverTimeGridSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 8)) AS i),
       |win AS (
       |  SELECT name, label_k, label_instance, i.i,
       |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE) AS v
       |  FROM m, t, inst i
       |  WHERE name = 'signup'
       |    AND epoch_us(ts) <= t_us - (8 - i.i) * 86400000000
       |    AND epoch_us(ts) >  t_us - (8 - i.i) * 86400000000 - 172800000000
       |  GROUP BY name, label_k, label_instance, i.i)
       |SELECT name, label_k, label_instance, MAX(v) AS value
       |FROM win
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** p76: dense-grid `query_range` of `sum by (k) (purchase)` — 240
    * instants at 6h anchored at `end = ⌊T⌋` (the engine's
    * [[Api.queryRangeGrid]] anchor, shift 0): instant i's bound is
    * `t_us − (240−i)·6h`, its snapshot the cumulative exact-decimal sum
    * up to the bound; series×instant rows exist only once the series
    * has events (GROUP BY emits no empty groups — matching the grid's
    * running-count filter).
    */
  val QueryRangeGridSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 240)) AS i)
       |SELECT m.label_k,
       |  (t.t_us // 1000000) - (240 - i.i) * 21600 AS t_s,
       |  CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM m, t, inst i
       |WHERE m.name = 'purchase' AND m.value >= 0
       |  AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
       |GROUP BY m.label_k, i.i, t.t_us
       |ORDER BY m.label_k, t_s""".stripMargin

  /** p105: the name-retaining recording rule `raw_p: purchase` served
    * on the dense 240×6h query_range grid — per full series key, the
    * counter snapshot at each instant's bound, with the series RENAMED
    * to the record (the rule loop writes samples named `raw_p`). The
    * gate fails if name-retaining rule inlining, the record-name
    * rewrite, or the grid snapshots drift.
    */
  val RecordedGridRenamedSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 240)) AS i)
       |SELECT 'raw_p' AS name, m.label_k, m.label_instance,
       |  (t.t_us // 1000000) - (240 - i.i) * 21600 AS t_s,
       |  CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM m, t, inst i
       |WHERE m.name = 'purchase' AND m.value >= 0
       |  AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
       |GROUP BY m.label_k, m.label_instance, i.i, t.t_us
       |ORDER BY name, m.label_k, m.label_instance, t_s""".stripMargin

  /** p106: `rate(k_total6h[1d])` — a RANGE selector over the recorded
    * rule `k_total6h: sum by (k) (purchase)` (6h interval) — on the
    * dense 240×6h query_range grid. The twin mirrors the grid arm's
    * endpoint-difference reading: per (k, instant), the exact decimal
    * cumulative at the instant's bound minus the cumulative one window
    * earlier (absent baseline = 0 — a group born inside the window
    * counts its whole mass), rows present whenever the group has ANY
    * history (a quiet group rates 0 — the rule's samples exist), and
    * ONE final ÷86400 on the decimal difference. Fails if the grid
    * anchoring, the lag baseline, the view-semantics presence rules, or
    * the deferred division drifts.
    */
  val RecordedGridRateSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 240)) AS i),
       |snap AS (
       |  SELECT m.label_k, i.i, t.t_us,
       |    SUM(CAST(m.value AS DECIMAL(18,2))) AS v
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
       |  GROUP BY m.label_k, i.i, t.t_us),
       |base AS (
       |  SELECT m.label_k, i.i, SUM(CAST(m.value AS DECIMAL(18,2))) AS v
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
       |                          - 86400000000
       |  GROUP BY m.label_k, i.i)
       |SELECT s.label_k,
       |  (s.t_us // 1000000) - (240 - s.i) * 21600 AS t_s,
       |  CAST(s.v - COALESCE(b.v, 0) AS DOUBLE) / CAST(86400 AS DOUBLE) AS value
       |FROM snap s LEFT JOIN base b ON s.label_k = b.label_k AND s.i = b.i
       |ORDER BY s.label_k, t_s""".stripMargin

  /** p107: `avg_over_time(k_total6h[1d])` — a `*_over_time` smoothing
    * panel over the recorded rule `k_total6h: sum by (k) (purchase)`
    * (6h interval) on the dense 240×6h grid. The twin re-derives the
    * rule-loop samples on the rule's own lattice (243 points: 240 grid
    * instants + the 3 extra the first window needs), slides a 4-row
    * frame per group over the PRESENT rows (a group born mid-lattice
    * has a partial first window — exactly the per-instant sample set),
    * and mirrors the engine's expression order: exact decimal window
    * sum cast to double, divided by the window count. Fails if the
    * lattice anchoring, the frame, the presence rules, or the division
    * order drifts.
    */
  val RecordedGridOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 243)) AS i),
       |snap AS (
       |  SELECT m.label_k, i.i, t.t_us,
       |    SUM(CAST(m.value AS DECIMAL(18,2))) AS v
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - (243 - i.i) * 21600000000
       |  GROUP BY m.label_k, i.i, t.t_us),
       |win AS (
       |  SELECT label_k, i, t_us,
       |    CAST(SUM(v) OVER (PARTITION BY label_k ORDER BY i
       |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
       |      / CAST(COUNT(*) OVER (PARTITION BY label_k ORDER BY i
       |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
       |      AS value
       |  FROM snap)
       |SELECT label_k,
       |  (t_us // 1000000) - (240 - (i - 3)) * 21600 AS t_s, value
       |FROM win WHERE i >= 4
       |ORDER BY label_k, t_s""".stripMargin

  /** p77: `sum by (k) (rate(purchase[2d]))` on the same 240×6h grid —
    * instant i's window is `(bound − 2d, bound]`, the exact decimal
    * increase divided ONCE by the window seconds (the engine's deferred
    * rateDiv), so the doubles bit-match.
    */
  val QueryRangeRateSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 240)) AS i)
       |SELECT m.label_k,
       |  (t.t_us // 1000000) - (240 - i.i) * 21600 AS t_s,
       |  CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) / 172800.0 AS value
       |FROM m, t, inst i
       |WHERE m.name = 'purchase' AND m.value >= 0
       |  AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
       |  AND epoch_us(m.ts) >  t.t_us - (240 - i.i) * 21600000000 - 172800000000
       |GROUP BY m.label_k, i.i, t.t_us
       |ORDER BY m.label_k, t_s""".stripMargin

  /** p78: bare gauge `signup` on the 240×6h grid — per full series key,
    * the last-write-wins sample at or before each instant's bound
    * (ties broken by event_id, the engine's deterministic order).
    */
  val QueryRangeGaugeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 240)) AS i),
       |r AS (
       |  SELECT m.name, m.label_k, m.label_instance,
       |    (t.t_us // 1000000) - (240 - i.i) * 21600 AS t_s,
       |    m.value,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY m.name, m.label_k, m.label_instance, i.i
       |      ORDER BY m.ts DESC, m.event_id DESC) AS rn
       |  FROM m, t, inst i
       |  WHERE m.name = 'signup'
       |    AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000)
       |SELECT name, label_k, label_instance, t_s, value
       |FROM r WHERE rn = 1
       |ORDER BY name, label_k, label_instance, t_s""".stripMargin

  /** p79: `histogram_quantile(0.9, sum by (k) (rate(error[2d])))` on
    * the 240×6h grid — per instant, the bucket counts in the trailing
    * 2d window (summed across instances per k) feed the standard
    * interpolation; identical integer inputs + identical IEEE
    * expression order ⇒ the doubles hash-match the engine's sliding
    * bucket-partial plan.
    */
  val QueryRangeHqSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 240)) AS i),
       |w AS (
       |  SELECT m.label_k,
       |    (t.t_us // 1000000) - (240 - i.i) * 21600 AS t_s,
       |    m.value
       |  FROM m, t, inst i
       |  WHERE m.name = 'error'
       |    AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
       |    AND epoch_us(m.ts) >  t.t_us - (240 - i.i) * 21600000000 - 172800000000),
       |b AS (SELECT * FROM (VALUES (1.0),(5.0),(10.0),(25.0),(50.0),(100.0),(150.0)) b(le)),
       |snap AS (
       |  SELECT label_k, t_s, le,
       |    CAST(SUM(CASE WHEN value <= le THEN 1 ELSE 0 END) AS BIGINT) AS cum_count,
       |    COUNT(*) AS cnt
       |  FROM w CROSS JOIN b
       |  GROUP BY label_k, t_s, le),
       |r AS (
       |  SELECT *, 0.9 * CAST(cnt AS DOUBLE) AS rnk,
       |    COALESCE(LAG(le) OVER w2, 0.0) AS prev_le,
       |    COALESCE(LAG(cum_count) OVER w2, 0) AS prev_cum,
       |    MAX(le) OVER w3 AS max_le,
       |    MAX(cum_count) OVER w3 AS max_cum
       |  FROM snap
       |  WINDOW w2 AS (PARTITION BY label_k, t_s ORDER BY le),
       |         w3 AS (PARTITION BY label_k, t_s))
       |SELECT label_k, t_s, value FROM (
       |  SELECT label_k, t_s,
       |    prev_le + (le - prev_le) * (rnk - CAST(prev_cum AS DOUBLE))
       |      / CAST(cum_count - prev_cum AS DOUBLE) AS value
       |  FROM r WHERE CAST(cum_count AS DOUBLE) >= rnk AND CAST(prev_cum AS DOUBLE) < rnk
       |  UNION ALL
       |  SELECT label_k, t_s, max_le AS value
       |  FROM r WHERE le = max_le AND rnk > CAST(max_cum AS DOUBLE))
       |ORDER BY label_k, t_s""".stripMargin

  /** p80: `topk(3, sum by (k) (rate(purchase[2d])))` on the 240×6h
    * grid — the "top movers" dashboard panel: per instant, rank the
    * per-k exact-decimal window increases (ties broken by label, the
    * engine's deterministic order), keep 3, divide once by the window.
    */
  val QueryRangeTopkSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 240)) AS i),
       |win AS (
       |  SELECT m.label_k,
       |    (t.t_us // 1000000) - (240 - i.i) * 21600 AS t_s,
       |    SUM(CAST(m.value AS DECIMAL(18,2))) AS dv
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
       |    AND epoch_us(m.ts) >  t.t_us - (240 - i.i) * 21600000000 - 172800000000
       |  GROUP BY m.label_k, i.i, t.t_us),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY t_s
       |    ORDER BY dv DESC, label_k) AS rk
       |  FROM win)
       |SELECT label_k, t_s, CAST(dv AS DOUBLE) / 172800.0 AS value
       |FROM r WHERE rk <= 3
       |ORDER BY label_k, t_s""".stripMargin

  /** p81: `sum by (k) (rate(purchase[2d])) / sum by (k) (rate(click[2d]))`
    * on the 240×6h grid — the ratio panel (conversion / error-rate
    * idiom): per instant, each side's exact-decimal window increase is
    * divided ONCE by the window (the deferred rateDiv, applied per side
    * before the op — the union path's rounding order), then the two
    * doubles divide; instants where either side's window is empty are
    * absent (inner match join).
    */
  val QueryRangeRatioSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 240)) AS i),
       |l AS (
       |  SELECT m.label_k,
       |    (t.t_us // 1000000) - (240 - i.i) * 21600 AS t_s,
       |    SUM(CAST(m.value AS DECIMAL(18,2))) AS dv
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
       |    AND epoch_us(m.ts) >  t.t_us - (240 - i.i) * 21600000000 - 172800000000
       |  GROUP BY m.label_k, i.i, t.t_us),
       |r AS (
       |  SELECT m.label_k,
       |    (t.t_us // 1000000) - (240 - i.i) * 21600 AS t_s,
       |    SUM(CAST(m.value AS DECIMAL(18,2))) AS dv
       |  FROM m, t, inst i
       |  WHERE m.name = 'click' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - (240 - i.i) * 21600000000
       |    AND epoch_us(m.ts) >  t.t_us - (240 - i.i) * 21600000000 - 172800000000
       |  GROUP BY m.label_k, i.i, t.t_us)
       |SELECT l.label_k, l.t_s,
       |  (CAST(l.dv AS DOUBLE) / 172800.0) / (CAST(r.dv AS DOUBLE) / 172800.0) AS value
       |FROM l JOIN r ON r.label_k = l.label_k AND r.t_s = l.t_s
       |ORDER BY l.label_k, l.t_s""".stripMargin

  /** `sum by (k) (purchase{k=~"[0-4].*"}) or sum by (k) (click{k=~"[3-6].*"})` */
  val OrSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |p AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |    AND regexp_matches(label_k, '^(?:[0-4].*)$$')
       |  GROUP BY label_k),
       |c AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m WHERE name = 'click' AND value >= 0
       |    AND regexp_matches(label_k, '^(?:[3-6].*)$$')
       |  GROUP BY label_k)
       |SELECT label_k, CAST(dv AS DOUBLE) AS value FROM p
       |UNION ALL
       |SELECT label_k, CAST(dv AS DOUBLE) AS value FROM c
       |WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.label_k = c.label_k)
       |ORDER BY label_k, value""".stripMargin

  /** `max_over_time(signup[10d] offset 2d)` — per full series key. */
  val MaxOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m)
       |SELECT name, label_k, label_instance, MAX(value) AS value
       |FROM m, t
       |WHERE name = 'signup'
       |  AND epoch_us(ts) > t_us - 1036800000000
       |  AND epoch_us(ts) <= t_us - 172800000000
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `max_over_time((sum by (k) (purchase))[4d:1d])` — the subquery's
    * four instants (T−3d … T) expressed as a shift grid.
    */
  val SubquerySql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |g AS (SELECT unnest(generate_series(0, 3)) AS s),
       |snap AS (
       |  SELECT label_k, s, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m, t, g
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - s * 86400000000
       |  GROUP BY label_k, s)
       |SELECT label_k, CAST(MAX(dv) AS DOUBLE) AS value
       |FROM snap GROUP BY label_k
       |ORDER BY label_k, value""".stripMargin

  /** `sum_over_time((sum by (k) (purchase))[64d:1h])` — 1536 instants
    * in the CUMULATIVE form that mirrors the compiler's grid strategy:
    * each event lands at its first contributing instant index, running
    * sums over the series×grid reconstruct every snapshot, instants
    * with no events yet are absent. All decimal until the final cast.
    */
  val SubqueryGridSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |e AS (
       |  SELECT label_k, value,
       |    GREATEST(1, 1536 - (t_us - epoch_us(ts)) // 3600000000) AS i
       |  FROM m, t
       |  WHERE name = 'purchase' AND value >= 0 AND epoch_us(ts) <= t_us),
       |p AS (
       |  SELECT label_k, i, SUM(CAST(value AS DECIMAL(18,2))) AS dv, COUNT(*) AS n
       |  FROM e GROUP BY label_k, i),
       |gi AS (
       |  SELECT label_k, g.i AS i
       |  FROM (SELECT DISTINCT label_k FROM p),
       |       (SELECT unnest(generate_series(1, 1536)) AS i) g),
       |c AS (
       |  SELECT gi.label_k AS label_k, gi.i AS i,
       |    SUM(dv) OVER w AS cum_dv, SUM(n) OVER w AS cum_n
       |  FROM gi LEFT JOIN p ON p.label_k = gi.label_k AND p.i = gi.i
       |  WINDOW w AS (PARTITION BY gi.label_k ORDER BY gi.i
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT label_k, CAST(SUM(cum_dv) AS DOUBLE) AS value
       |FROM c WHERE cum_n > 0
       |GROUP BY label_k
       |ORDER BY label_k, value""".stripMargin

  /** `max_over_time((rate(purchase[1d]))[16d:2h])` — 192 instants of a
    * WINDOWED RATE through the rate-grid strategy: per-instant increase
    * = cum(i) − cum(i−12) over the series×grid running sums (grid
    * extended 12 indexes below 1 for the lag baseline; events at or
    * before instant_{1−12} pruned — they cancel in every difference),
    * the deferred ÷86400 applied once after the max.
    */
  val SubqueryGridRateSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |e AS (
       |  SELECT name, label_k, label_instance, value,
       |    192 - (t_us - epoch_us(ts)) // 7200000000 AS i
       |  FROM m, t
       |  WHERE name = 'purchase' AND value >= 0 AND epoch_us(ts) <= t_us
       |    AND (t_us - epoch_us(ts)) < 203 * 7200000000),
       |p AS (
       |  SELECT name, label_k, label_instance, i,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS dv, COUNT(*) AS n
       |  FROM e GROUP BY name, label_k, label_instance, i),
       |gi AS (
       |  SELECT name, label_k, label_instance, g.i AS i
       |  FROM (SELECT DISTINCT name, label_k, label_instance FROM p),
       |       (SELECT unnest(generate_series(-11, 192)) AS i) g),
       |c AS (
       |  SELECT gi.name AS name, gi.label_k AS label_k,
       |    gi.label_instance AS label_instance, gi.i AS i,
       |    COALESCE(SUM(p.dv) OVER w, 0) AS cum_dv,
       |    COALESCE(SUM(p.n) OVER w, 0) AS cum_n
       |  FROM gi LEFT JOIN p ON p.name = gi.name AND p.label_k = gi.label_k
       |    AND p.label_instance = gi.label_instance AND p.i = gi.i
       |  WINDOW w AS (PARTITION BY gi.name, gi.label_k, gi.label_instance
       |               ORDER BY gi.i
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |d AS (
       |  SELECT name, label_k, label_instance, i,
       |    cum_dv - COALESCE(LAG(cum_dv, 12) OVER o, 0) AS diff,
       |    cum_n - COALESCE(LAG(cum_n, 12) OVER o, 0) AS win_n
       |  FROM c
       |  WINDOW o AS (PARTITION BY name, label_k, label_instance ORDER BY i))
       |SELECT name, label_k, label_instance,
       |  CAST(MAX(diff) AS DOUBLE) / 86400.0 AS value
       |FROM d WHERE i >= 1 AND win_n > 0
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance""".stripMargin

  /** `avg_over_time((sum by (k) (increase(purchase[2d])))[8d:4h])` —
    * the rate-grid strategy under a `sum by` inner: the group increase
    * is the running-sum difference of the (label_k, i) partials
    * (k = 12 lag over 48 instants), averaged per group.
    */
  val SubqueryGridRateSumSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |e AS (
       |  SELECT label_k, value,
       |    48 - (t_us - epoch_us(ts)) // 14400000000 AS i
       |  FROM m, t
       |  WHERE name = 'purchase' AND value >= 0 AND epoch_us(ts) <= t_us
       |    AND (t_us - epoch_us(ts)) < 59 * 14400000000),
       |p AS (
       |  SELECT label_k, i,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS dv, COUNT(*) AS n
       |  FROM e GROUP BY label_k, i),
       |gi AS (
       |  SELECT label_k, g.i AS i
       |  FROM (SELECT DISTINCT label_k FROM p),
       |       (SELECT unnest(generate_series(-11, 48)) AS i) g),
       |c AS (
       |  SELECT gi.label_k AS label_k, gi.i AS i,
       |    COALESCE(SUM(p.dv) OVER w, 0) AS cum_dv,
       |    COALESCE(SUM(p.n) OVER w, 0) AS cum_n
       |  FROM gi LEFT JOIN p ON p.label_k = gi.label_k AND p.i = gi.i
       |  WINDOW w AS (PARTITION BY gi.label_k ORDER BY gi.i
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |d AS (
       |  SELECT label_k, i,
       |    cum_dv - COALESCE(LAG(cum_dv, 12) OVER o, 0) AS diff,
       |    cum_n - COALESCE(LAG(cum_n, 12) OVER o, 0) AS win_n
       |  FROM c
       |  WINDOW o AS (PARTITION BY label_k ORDER BY i))
       |SELECT label_k,
       |  CAST(SUM(diff) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS value
       |FROM d WHERE i >= 1 AND win_n > 0
       |GROUP BY label_k
       |ORDER BY label_k""".stripMargin

  /** `max_over_time((signup)[32d:6h])` — 128 instants of a GAUGE
    * through the grid strategy: per-instant last-write-wins values
    * reconstructed by a running max over the (ts, event_id, value)
    * struct (lexicographic; value never decides because (ts, event_id)
    * is unique), mirroring the compiler exactly.
    */
  val SubqueryGridGaugeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |e AS (
       |  SELECT name, label_k, label_instance, value, event_id,
       |    epoch_us(ts) AS tu,
       |    GREATEST(1, 128 - (t_us - epoch_us(ts)) // 21600000000) AS i
       |  FROM m, t
       |  WHERE name = 'signup' AND epoch_us(ts) <= t_us),
       |p AS (
       |  SELECT name, label_k, label_instance, i,
       |    MAX(struct_pack(t := tu, e := event_id, v := value)) AS mstr,
       |    COUNT(*) AS n
       |  FROM e GROUP BY name, label_k, label_instance, i),
       |gi AS (
       |  SELECT name, label_k, label_instance, g.i AS i
       |  FROM (SELECT DISTINCT name, label_k, label_instance FROM p),
       |       (SELECT unnest(generate_series(1, 128)) AS i) g),
       |c AS (
       |  SELECT gi.name AS name, gi.label_k AS label_k,
       |    gi.label_instance AS label_instance, gi.i AS i,
       |    MAX(p.mstr) OVER w AS cum, SUM(p.n) OVER w AS cum_n
       |  FROM gi LEFT JOIN p ON p.name = gi.name AND p.label_k = gi.label_k
       |    AND p.label_instance = gi.label_instance AND p.i = gi.i
       |  WINDOW w AS (PARTITION BY gi.name, gi.label_k, gi.label_instance
       |               ORDER BY gi.i
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT name, label_k, label_instance, MAX(cum.v) AS value
       |FROM c WHERE cum_n > 0
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `stddev_over_time(signup[10d])` — exact integer-cents moments,
    * variance written in the identical expression order as the
    * compiler so doubles bit-match.
    */
  val StddevOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT name, label_k, label_instance,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents
       |  FROM m, t
       |  WHERE name = 'signup'
       |    AND epoch_us(ts) > t_us - 864000000000
       |    AND epoch_us(ts) <= t_us),
       |a AS (
       |  SELECT name, label_k, label_instance,
       |    CAST(SUM(cents) AS BIGINT) AS s1,
       |    CAST(SUM(cents * cents) AS BIGINT) AS s2,
       |    COUNT(*) AS n
       |  FROM w GROUP BY name, label_k, label_instance)
       |SELECT name, label_k, label_instance,
       |  sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0 AS value
       |FROM a
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** Alert rules `HighSeries: sum by (k) (purchase) > 450` and
    * `LowSeries: sum by (k) (click) < 200` through [[Rules.evaluateAlerts]].
    */
  val AlertsSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |p AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m WHERE name = 'purchase' AND value >= 0 GROUP BY label_k),
       |c AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m WHERE name = 'click' AND value >= 0 GROUP BY label_k)
       |SELECT 'HighSeries' AS alertname, label_k, CAST(dv AS DOUBLE) AS value
       |FROM p WHERE CAST(dv AS DOUBLE) > 450
       |UNION ALL
       |SELECT 'LowSeries' AS alertname, label_k, CAST(dv AS DOUBLE) AS value
       |FROM c WHERE CAST(dv AS DOUBLE) < 200
       |ORDER BY alertname, label_k""".stripMargin

  /** for-duration alert: `sum by (k) (purchase) > 450` sustained at the
    * three instants T, T−1d, T−2d (`for: 2d`, interval 1d) — the firing
    * set is the current breach semi-joined against each shifted
    * evaluation, value = the CURRENT snapshot.
    */
  val ForAlertSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |s0 AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m, t WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us
       |  GROUP BY label_k
       |  HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) > 450),
       |s1 AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m, t WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - 86400000000
       |  GROUP BY label_k
       |  HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) > 450),
       |s2 AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m, t WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - 172800000000
       |  GROUP BY label_k
       |  HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) > 450)
       |SELECT 'SustainedHigh' AS alertname, s0.label_k AS label_k,
       |  CAST(s0.dv AS DOUBLE) AS value
       |FROM s0
       |WHERE EXISTS (SELECT 1 FROM s1 WHERE s1.label_k = s0.label_k)
       |  AND EXISTS (SELECT 1 FROM s2 WHERE s2.label_k = s0.label_k)
       |ORDER BY alertname, label_k""".stripMargin

  /** b43: the SELECTABLE `ALERTS` synthetic series —
    * `ALERTS{alertstate="firing"}` under two standing rules: the
    * for-ladder `SustainedHigh` (`sum by (k) (purchase) > 450`,
    * `for: 2d` @ 1d — firing = breach at T semi-joined against both
    * lookbacks, the [[ForAlertSql]] shape) and the for-less
    * `LowSeries` (`sum by (k) (click) < 200` — every breach fires
    * immediately). The matcher keeps only `firing` rows; values are
    * the CURRENT snapshot sums.
    */
  val AlertsSeriesSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |s0 AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m, t WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us
       |  GROUP BY label_k
       |  HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) > 450),
       |s1 AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m, t WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - 86400000000
       |  GROUP BY label_k
       |  HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) > 450),
       |s2 AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m, t WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) <= t_us - 172800000000
       |  GROUP BY label_k
       |  HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) > 450),
       |low AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
       |  FROM m WHERE name = 'click' AND value >= 0
       |  GROUP BY label_k
       |  HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) < 200)
       |SELECT * FROM (
       |  SELECT 'SustainedHigh' AS alertname, 'firing' AS alertstate,
       |    s0.label_k AS label_k, CAST(s0.dv AS DOUBLE) AS value
       |  FROM s0
       |  WHERE EXISTS (SELECT 1 FROM s1 WHERE s1.label_k = s0.label_k)
       |    AND EXISTS (SELECT 1 FROM s2 WHERE s2.label_k = s0.label_k)
       |  UNION ALL
       |  SELECT 'LowSeries' AS alertname, 'firing' AS alertstate,
       |    label_k, CAST(dv AS DOUBLE) AS value
       |  FROM low)
       |ORDER BY alertname, label_k""".stripMargin

  /** b44: the `ALERTS{alertstate="firing"}` selector over the
    * `query_range` dense grid — the Grafana alert-timeline panel: 240
    * output instants at 6h step (extended lattice 248 for the
    * SustainedHigh ladder's 2·4-step lookback; LowSeries is for-less,
    * firing at every breaching instant), under the same two-rule file
    * as b43. Instant i's bound is `t_us − (248−i)·6h`, the
    * [[AlertStatesGridSql]] anchor; only the last 240 instants
    * (`i > 8`) are served.
    */
  val AlertsRangeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 248)) AS i),
       |breach AS (
       |  SELECT m.label_k, i.i,
       |    CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - (248 - i.i) * 21600000000
       |  GROUP BY m.label_k, i.i
       |  HAVING CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) > 450),
       |lowb AS (
       |  SELECT m.label_k, i.i,
       |    CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |  FROM m, t, inst i
       |  WHERE m.name = 'click' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - (248 - i.i) * 21600000000
       |  GROUP BY m.label_k, i.i
       |  HAVING CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) < 200)
       |SELECT * FROM (
       |  SELECT 'SustainedHigh' AS alertname, 'firing' AS alertstate,
       |    (t.t_us // 1000000) - (248 - b.i) * 21600 AS t_s,
       |    b.label_k AS label_k, b.value AS value
       |  FROM breach b, t
       |  WHERE b.i > 8
       |    AND EXISTS (SELECT 1 FROM breach b1
       |                WHERE b1.label_k = b.label_k AND b1.i = b.i - 4)
       |    AND EXISTS (SELECT 1 FROM breach b2
       |                WHERE b2.label_k = b.label_k AND b2.i = b.i - 8)
       |  UNION ALL
       |  SELECT 'LowSeries' AS alertname, 'firing' AS alertstate,
       |    (t.t_us // 1000000) - (248 - l.i) * 21600 AS t_s,
       |    l.label_k AS label_k, l.value AS value
       |  FROM lowb l, t
       |  WHERE l.i > 8)
       |ORDER BY alertname, t_s, label_k""".stripMargin

  /** b45: the `ALERTS_FOR_STATE` restoration series — per active
    * (rule, breaching-at-T series), `activeAt` = the first instant of
    * its consecutive-breach streak on the rule's evaluation lattice
    * (`⌊T⌋ − j·interval`, j = 0..L−1 spanning the corpus; SustainedHigh
    * at interval 1d), or ⌊T⌋ itself for the interval-free LowSeries
    * rule. streak = the smallest missing lattice index (no miss → L),
    * activeAt = ⌊T⌋ − (streak−1)·interval — mirroring the engine's
    * suffix-run window over the dense-grid ladder.
    */
  val AlertsForStateSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us, MIN(epoch_us(ts)) AS mn_us
       |      FROM m),
       |b AS (SELECT (t_us // 1000000) AS t_s,
       |        LEAST(((t_us // 1000000) - (mn_us // 1000000)) // 86400 + 1,
       |              4096) AS L
       |      FROM t),
       |inst AS (SELECT unnest(generate_series(0,
       |           CAST((SELECT L FROM b) AS INT) - 1)) AS j),
       |breach AS (
       |  SELECT m.label_k, i.j
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - i.j * 86400000000
       |  GROUP BY m.label_k, i.j
       |  HAVING CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) > 450),
       |act AS (
       |  SELECT s.label_k,
       |    COALESCE((SELECT MIN(i.j) FROM inst i
       |              WHERE NOT EXISTS (SELECT 1 FROM breach x
       |                                WHERE x.label_k = s.label_k
       |                                  AND x.j = i.j)),
       |             (SELECT L FROM b)) AS streak
       |  FROM (SELECT label_k FROM breach WHERE j = 0) s),
       |low0 AS (
       |  SELECT m.label_k
       |  FROM m, t
       |  WHERE m.name = 'click' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us
       |  GROUP BY m.label_k
       |  HAVING CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) < 200)
       |SELECT * FROM (
       |  SELECT 'SustainedHigh' AS alertname, a.label_k AS label_k,
       |    CAST(b.t_s - (a.streak - 1) * 86400 AS DOUBLE) AS value
       |  FROM act a, b
       |  UNION ALL
       |  SELECT 'LowSeries' AS alertname, label_k,
       |    CAST(b.t_s AS DOUBLE) AS value
       |  FROM low0, b)
       |ORDER BY alertname, label_k""".stripMargin

  /** p74: the ALERTS state ladder — `sum by (k) (purchase) > 450`,
    * `for: 2d` at interval 1d, evaluated at offsets {0, 1d, 2d, 3d}.
    * MACHINE-GENERATED (one breach CTE per distinct evaluation instant,
    * output offsets ∪ lookbacks; firing = EXISTS at every lookback) —
    * the generator mirrors [[graft.promql.Rules.alertStates]]'s
    * presence-count join exactly.
    */
  lazy val AlertStatesSql: String = {
    val offsets = Seq(0L, 86400L, 172800L, 259200L)
    val interval = 86400L
    val k = 2
    val evalOffsets =
      offsets.flatMap(o => (0 to k).map(i => o + i * interval)).distinct.sorted
    val ctes = evalOffsets.map { o =>
      s"""s$o AS (
         |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS dv
         |  FROM m, t WHERE name = 'purchase' AND value >= 0
         |    AND epoch_us(ts) <= t_us - ${o}000000
         |  GROUP BY label_k
         |  HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) > 450)""".stripMargin
    }.mkString(",\n")
    val sel = offsets.map { o =>
      val conds = (1 to k).map(i =>
        s"EXISTS (SELECT 1 FROM s${o + i * interval} x WHERE x.label_k = s$o.label_k)")
        .mkString("\n    AND ")
      s"""SELECT 'SustainedHigh' AS alertname,
         |  CASE WHEN $conds THEN 'firing' ELSE 'pending' END AS alertstate,
         |  CAST($o AS BIGINT) AS offset_s, label_k, CAST(dv AS DOUBLE) AS value
         |FROM s$o""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |$ctes
       |$sel
       |ORDER BY offset_s, label_k""".stripMargin
  }

  /** p85: the ALERTS state ladder on the DENSE GRID —
    * `sum by (k) (purchase) > 450`, `for: 2d` at interval 1d, over 240
    * output instants at 6h step (extended grid 248 = 240 + 2·4 lookback
    * instants; the rule interval strides 4 grid steps). Instant i's
    * bound is `t_us − (248−i)·6h` — the [[QueryRangeGridSql]] anchor —
    * and a breach is `firing` iff the breach set also contains the same
    * series at i−4 and i−8 (= 1·interval and 2·interval earlier),
    * mirroring [[graft.promql.Rules.alertStatesGrid]]'s residue-class
    * sliding window.
    */
  val AlertStatesGridSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |inst AS (SELECT unnest(generate_series(1, 248)) AS i),
       |breach AS (
       |  SELECT m.label_k, i.i,
       |    CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |  FROM m, t, inst i
       |  WHERE m.name = 'purchase' AND m.value >= 0
       |    AND epoch_us(m.ts) <= t.t_us - (248 - i.i) * 21600000000
       |  GROUP BY m.label_k, i.i
       |  HAVING CAST(SUM(CAST(m.value AS DECIMAL(18,2))) AS DOUBLE) > 450)
       |SELECT 'SustainedHigh' AS alertname,
       |  CASE WHEN
       |    EXISTS (SELECT 1 FROM breach b1
       |            WHERE b1.label_k = b.label_k AND b1.i = b.i - 4)
       |    AND EXISTS (SELECT 1 FROM breach b2
       |                WHERE b2.label_k = b.label_k AND b2.i = b.i - 8)
       |    THEN 'firing' ELSE 'pending' END AS alertstate,
       |  (t.t_us // 1000000) - (248 - b.i) * 21600 AS t_s,
       |  b.label_k, b.value AS value
       |FROM breach b, t
       |WHERE b.i > 8
       |ORDER BY t_s, b.label_k""".stripMargin

  /** `sum by (k) (increase(purchase[2d]))` */
  val IncreaseSumSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT label_k, value FROM m, t
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) > t_us - 172800000000
       |    AND epoch_us(ts) <= t_us)
       |SELECT label_k, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM w GROUP BY label_k
       |ORDER BY label_k, value""".stripMargin

  /** `sum by (k, instance) (purchase)` — grouping on BOTH series labels. */
  val MultiLabelSumSql: String =
    s"""WITH m AS ($MetricEventsSql)
       |SELECT label_k, label_instance,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM m WHERE name = 'purchase' AND value >= 0
       |GROUP BY label_k, label_instance
       |ORDER BY label_k, label_instance, value""".stripMargin

  /** `purchase / on(k, instance) click` — one-to-one vector matching on
    * the FULL two-label key.
    */
  val MultiLabelBinOpSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |p AS (
       |  SELECT label_k, label_instance, SUM(CAST(value AS DECIMAL(18,2))) AS pv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY label_k, label_instance),
       |c AS (
       |  SELECT label_k, label_instance, SUM(CAST(value AS DECIMAL(18,2))) AS cv
       |  FROM m WHERE name = 'click' AND value >= 0
       |  GROUP BY label_k, label_instance)
       |SELECT p.label_k AS label_k, p.label_instance AS label_instance,
       |  CAST(pv AS DOUBLE) / CAST(cv AS DOUBLE) AS value
       |FROM p JOIN c USING (label_k, label_instance)
       |ORDER BY label_k, label_instance, value""".stripMargin

  /** `purchase / on(k) group_left sum by (k) (purchase)` — each series'
    * share of its k-group total: many-to-one matching where the left
    * side keeps its full (name, k, instance) label set.
    */
  val GroupLeftShareSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |s AS (
       |  SELECT name, label_k, label_instance,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY name, label_k, label_instance),
       |g AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS gv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY label_k)
       |SELECT s.name AS name, s.label_k AS label_k,
       |  s.label_instance AS label_instance,
       |  CAST(sv AS DOUBLE) / CAST(gv AS DOUBLE) AS value
       |FROM s JOIN g USING (label_k)
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `absent(purchase{k="zzz"})` — the 1-row vector carrying the
    * equality-matcher labels when no series matches.
    */
  val AbsentSql: String =
    s"""SELECT 'zzz' AS label_k, CAST(1.0 AS DOUBLE) AS value
       |FROM (SELECT COUNT(*) AS c FROM ($MetricEventsSql)
       |      WHERE name = 'purchase' AND label_k = 'zzz')
       |WHERE c = 0
       |ORDER BY label_k, value""".stripMargin

  /** `purchase > bool on(k, instance) click` — the bool modifier turns
    * the comparison into a 0/1-valued vector instead of a filter.
    */
  val BoolCmpSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |p AS (
       |  SELECT label_k, label_instance, SUM(CAST(value AS DECIMAL(18,2))) AS pv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY label_k, label_instance),
       |c AS (
       |  SELECT label_k, label_instance, SUM(CAST(value AS DECIMAL(18,2))) AS cv
       |  FROM m WHERE name = 'click' AND value >= 0
       |  GROUP BY label_k, label_instance)
       |SELECT p.label_k AS label_k, p.label_instance AS label_instance,
       |  CASE WHEN CAST(pv AS DOUBLE) > CAST(cv AS DOUBLE)
       |       THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS value
       |FROM p JOIN c USING (label_k, label_instance)
       |ORDER BY label_k, label_instance, value""".stripMargin

  /** `sum by (k, instance) (purchase) / ignoring(instance) group_left
    * sum by (k) (purchase)` — ignoring-based matching feeding a
    * many-to-one join.
    */
  val IgnoringShareSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |s AS (
       |  SELECT label_k, label_instance, SUM(CAST(value AS DECIMAL(18,2))) AS sv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY label_k, label_instance),
       |g AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS gv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY label_k)
       |SELECT s.label_k AS label_k, s.label_instance AS label_instance,
       |  CAST(sv AS DOUBLE) / CAST(gv AS DOUBLE) AS value
       |FROM s JOIN g USING (label_k)
       |ORDER BY label_k, label_instance, value""".stripMargin

  /** `sum by (instance) (rate(purchase[2d]))` — sum-over-rate through
    * the deferred-division path: exact decimal increases summed per
    * instance, divided by the window ONCE (no per-rate DECIMAL(18,2)
    * quantization).
    */
  val RateSumSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT label_instance, value FROM m, t
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) > t_us - 172800000000
       |    AND epoch_us(ts) <= t_us)
       |SELECT label_instance,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / 172800.0 AS value
       |FROM w GROUP BY label_instance
       |ORDER BY label_instance, value""".stripMargin

  /** `purchase > on(k, instance) click` — a plain (non-bool) comparison
    * FILTERS the left side's series: survivors keep their FULL label set
    * (metric name included) and their untouched values; nothing projects
    * down to the matching labels.
    */
  val FilterCmpSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |p AS (
       |  SELECT name, label_k, label_instance,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS pv
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY name, label_k, label_instance),
       |c AS (
       |  SELECT label_k, label_instance, SUM(CAST(value AS DECIMAL(18,2))) AS cv
       |  FROM m WHERE name = 'click' AND value >= 0
       |  GROUP BY label_k, label_instance)
       |SELECT p.name AS name, p.label_k AS label_k,
       |  p.label_instance AS label_instance, CAST(pv AS DOUBLE) AS value
       |FROM p JOIN c USING (label_k, label_instance)
       |WHERE CAST(pv AS DOUBLE) > CAST(cv AS DOUBLE)
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** The gauge last-write-wins snapshot (deterministic (ts, event_id)
    * tiebreak) — shared CTE body for the gauge-instant oracles.
    */
  private val GaugeLwwBody: String =
    s"""SELECT name, label_k, label_instance, value FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY name, label_k, label_instance
       |    ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM m WHERE name = 'signup') WHERE rn = 1""".stripMargin

  /** `stddev by (k) (signup)` — across-series population stddev of the
    * gauge snapshot, on exact integer cents.
    */
  val AggStddevSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |lww AS ($GaugeLwwBody),
       |c AS (SELECT label_k, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM lww),
       |a AS (
       |  SELECT label_k, CAST(SUM(cents) AS BIGINT) AS s1,
       |    CAST(SUM(cents * cents) AS BIGINT) AS s2, COUNT(*) AS n
       |  FROM c GROUP BY label_k)
       |SELECT label_k,
       |  sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
       |    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0 AS value
       |FROM a
       |ORDER BY label_k, value""".stripMargin

  /** `group by (k) (purchase)` — the degenerate aggregator. */
  val AggGroupSql: String =
    s"""WITH m AS ($MetricEventsSql)
       |SELECT label_k, CAST(1.0 AS DOUBLE) AS value
       |FROM m WHERE name = 'purchase' AND value >= 0
       |GROUP BY label_k
       |ORDER BY label_k, value""".stripMargin

  /** `count_values("v", purchase)` — histogram of the counter snapshot
    * values; label = fixed 2-decimal rendering of the exact cents.
    */
  val CountValuesSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |snap AS (
       |  SELECT name, label_k, label_instance,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS v
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY name, label_k, label_instance),
       |c AS (SELECT CAST(round(v * 100, 0) AS BIGINT) AS cents FROM snap)
       |SELECT printf('%.2f', CAST(cents AS DOUBLE) / 100.0) AS label_v,
       |  CAST(COUNT(*) AS DOUBLE) AS value
       |FROM c GROUP BY cents
       |ORDER BY label_v, value""".stripMargin

  /** `quantile_over_time(0.5, signup[10d])` — PromQL linear
    * interpolation at rank (n−1)·φ on exact cents.
    */
  val QuantileOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT name, label_k, label_instance, event_id,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents
       |  FROM m, t
       |  WHERE name = 'signup'
       |    AND epoch_us(ts) > t_us - 864000000000
       |    AND epoch_us(ts) <= t_us),
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k, label_instance
       |                     ORDER BY cents, event_id) AS rn,
       |  COUNT(*) OVER (PARTITION BY name, label_k, label_instance) AS n
       |  FROM w),
       |p AS (SELECT *, CAST(n - 1 AS DOUBLE) * 0.5 AS pos FROM r)
       |SELECT name, label_k, label_instance,
       |  (CAST(MAX(CASE WHEN rn = CAST(floor(pos) AS BIGINT) + 1 THEN cents END) AS DOUBLE)
       |   + (CAST(MAX(CASE WHEN rn = CAST(ceil(pos) AS BIGINT) + 1 THEN cents END) AS DOUBLE)
       |      - CAST(MAX(CASE WHEN rn = CAST(floor(pos) AS BIGINT) + 1 THEN cents END) AS DOUBLE))
       |     * (MAX(pos) - floor(MAX(pos)))) / 100.0 AS value
       |FROM p GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `last_over_time(signup[10d])` — freshest sample in the window. */
  val LastOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT name, label_k, label_instance, value,
       |    ROW_NUMBER() OVER (PARTITION BY name, label_k, label_instance
       |                       ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM m, t
       |  WHERE name = 'signup'
       |    AND epoch_us(ts) > t_us - 864000000000
       |    AND epoch_us(ts) <= t_us)
       |SELECT name, label_k, label_instance, CAST(value AS DOUBLE) AS value
       |FROM w WHERE rn = 1
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `present_over_time(signup[10d])`. */
  val PresentOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m)
       |SELECT name, label_k, label_instance, CAST(1.0 AS DOUBLE) AS value
       |FROM m, t
       |WHERE name = 'signup'
       |  AND epoch_us(ts) > t_us - 864000000000
       |  AND epoch_us(ts) <= t_us
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `irate(purchase[10d])` — last increment / last gap, exact integer
    * cents & micros until the final division (increments model: the
    * cumulative counter's last step IS the last increment).
    */
  val IrateSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT name, label_k, label_instance, event_id, epoch_us(ts) AS ts_us,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |    ROW_NUMBER() OVER (PARTITION BY name, label_k, label_instance
       |                       ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM m, t
       |  WHERE name = 'purchase' AND value >= 0
       |    AND epoch_us(ts) > t_us - 864000000000
       |    AND epoch_us(ts) <= t_us),
       |a AS (
       |  SELECT name, label_k, label_instance,
       |    MAX(CASE WHEN rn = 1 THEN cents END) AS c1,
       |    MAX(CASE WHEN rn = 1 THEN ts_us END) AS t1,
       |    MAX(CASE WHEN rn = 2 THEN ts_us END) AS t2,
       |    COUNT(*) AS n
       |  FROM w WHERE rn <= 2 GROUP BY name, label_k, label_instance)
       |SELECT name, label_k, label_instance,
       |  (CAST(c1 AS DOUBLE) / 100.0)
       |    / (CAST(t1 - t2 AS DOUBLE) / 1000000.0) AS value
       |FROM a WHERE n >= 2 AND t1 > t2
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `idelta(signup[10d])` — last-minus-previous gauge sample. */
  val IdeltaSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT name, label_k, label_instance,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |    ROW_NUMBER() OVER (PARTITION BY name, label_k, label_instance
       |                       ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM m, t
       |  WHERE name = 'signup'
       |    AND epoch_us(ts) > t_us - 864000000000
       |    AND epoch_us(ts) <= t_us),
       |a AS (
       |  SELECT name, label_k, label_instance,
       |    MAX(CASE WHEN rn = 1 THEN cents END) AS c1,
       |    MAX(CASE WHEN rn = 2 THEN cents END) AS c2,
       |    COUNT(*) AS n
       |  FROM w WHERE rn <= 2 GROUP BY name, label_k, label_instance)
       |SELECT name, label_k, label_instance,
       |  CAST(c1 - c2 AS DOUBLE) / 100.0 AS value
       |FROM a WHERE n >= 2
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `changes(signup[10d])` — adjacent-unequal sample count. */
  val ChangesFrontSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT name, label_k, label_instance,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |    LAG(CAST(round(value * 100, 0) AS BIGINT)) OVER (
       |      PARTITION BY name, label_k, label_instance
       |      ORDER BY ts, event_id) AS prev
       |  FROM m, t
       |  WHERE name = 'signup'
       |    AND epoch_us(ts) > t_us - 864000000000
       |    AND epoch_us(ts) <= t_us)
       |SELECT name, label_k, label_instance,
       |  CAST(SUM(CASE WHEN prev IS NOT NULL AND cents <> prev
       |                THEN 1 ELSE 0 END) AS DOUBLE) AS value
       |FROM w GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `deriv(signup[10d])` and `predict_linear(signup[10d], 3600)` —
    * exact-integer least squares (x = whole seconds since window start,
    * y = cents), divisions in the identical order as the plan.
    */
  private def regressionSql(select: String): String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT name, label_k, label_instance,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |    (epoch_us(ts) - (t_us - 864000000000)) // 1000000 AS x
       |  FROM m, t
       |  WHERE name = 'signup'
       |    AND epoch_us(ts) > t_us - 864000000000
       |    AND epoch_us(ts) <= t_us),
       |a AS (
       |  SELECT name, label_k, label_instance, COUNT(*) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(cents) AS BIGINT) AS sy,
       |    CAST(SUM(x * cents) AS BIGINT) AS sxy,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx
       |  FROM w GROUP BY name, label_k, label_instance),
       |s AS (
       |  SELECT *, CAST(n * sxy - sx * sy AS DOUBLE)
       |              / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
       |  FROM a WHERE n * sxx - sx * sx <> 0)
       |SELECT name, label_k, label_instance, $select AS value
       |FROM s
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  val DerivSql: String = regressionSql("slope / 100.0")

  val PredictLinearSql: String = regressionSql(
    """((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
      |    + slope * 867600.0) / 100.0""".stripMargin)

  /** `sort_desc(sum by (k) (purchase))` — output ordered by value. */
  val SortDescSql: String =
    s"""WITH m AS ($MetricEventsSql)
       |SELECT label_k,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM m WHERE name = 'purchase' AND value >= 0
       |GROUP BY label_k
       |ORDER BY value DESC, label_k""".stripMargin

  /** `sort_by_label_desc(sum by (k) (purchase), "k")` — ordered by the
    * label value, descending.
    */
  val SortByLabelSql: String =
    s"""WITH m AS ($MetricEventsSql)
       |SELECT label_k,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM m WHERE name = 'purchase' AND value >= 0
       |GROUP BY label_k
       |ORDER BY COALESCE(array_to_string(list_transform(
       |    regexp_extract_all(label_k, '[0-9]+|[^0-9]+'),
       |    e -> CASE WHEN regexp_matches(e, '^[0-9]') THEN lpad(e, 16, '0')
       |         ELSE e END), ''), '') DESC,
       |  label_k DESC, value DESC""".stripMargin

  /** `mad_over_time(signup[10d])` — median absolute deviation about the
    * median; both medians PromQL-interpolated at (n−1)·0.5, the first on
    * exact cents, the second on |cents − median| doubles.
    */
  val MadOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT name, label_k, label_instance, event_id,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents
       |  FROM m, t
       |  WHERE name = 'signup'
       |    AND epoch_us(ts) > t_us - 864000000000
       |    AND epoch_us(ts) <= t_us),
       |r AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k, label_instance
       |                     ORDER BY cents, event_id) AS rn,
       |  COUNT(*) OVER (PARTITION BY name, label_k, label_instance) AS n
       |  FROM w),
       |p AS (SELECT *, CAST(n - 1 AS DOUBLE) * 0.5 AS pos FROM r),
       |med AS (SELECT *,
       |  CAST(MAX(CASE WHEN rn = CAST(floor(pos) AS BIGINT) + 1 THEN cents END)
       |    OVER pw AS DOUBLE) AS lo,
       |  CAST(MAX(CASE WHEN rn = CAST(ceil(pos) AS BIGINT) + 1 THEN cents END)
       |    OVER pw AS DOUBLE) AS hi
       |  FROM p WINDOW pw AS (PARTITION BY name, label_k, label_instance)),
       |d AS (SELECT *,
       |  abs(CAST(cents AS DOUBLE) - (lo + (hi - lo) * (pos - floor(pos)))) AS dev
       |  FROM med),
       |r2 AS (SELECT *,
       |  ROW_NUMBER() OVER (PARTITION BY name, label_k, label_instance
       |                     ORDER BY dev, event_id) AS rn2
       |  FROM d)
       |SELECT name, label_k, label_instance,
       |  (MAX(CASE WHEN rn2 = CAST(floor(pos) AS BIGINT) + 1 THEN dev END)
       |   + (MAX(CASE WHEN rn2 = CAST(ceil(pos) AS BIGINT) + 1 THEN dev END)
       |      - MAX(CASE WHEN rn2 = CAST(floor(pos) AS BIGINT) + 1 THEN dev END))
       |     * (MAX(pos) - floor(MAX(pos)))) / 100.0 AS value
       |FROM r2 GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `ts_of_max_over_time(signup[10d])` — timestamp (s) of the window's
    * max sample, latest-(ts, event_id) tiebreak (upstream replaces the
    * running extremum on >=, so the last sample attaining it wins).
    */
  val TsOfMaxOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |w AS (
       |  SELECT name, label_k, label_instance, value,
       |    CAST(epoch_us(ts) AS DOUBLE) / 1e6 AS sec,
       |    ROW_NUMBER() OVER (PARTITION BY name, label_k, label_instance
       |                       ORDER BY value DESC, ts DESC, event_id DESC) AS rn
       |  FROM m, t
       |  WHERE name = 'signup'
       |    AND epoch_us(ts) > t_us - 864000000000
       |    AND epoch_us(ts) <= t_us)
       |SELECT name, label_k, label_instance, sec AS value
       |FROM w WHERE rn = 1
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `timestamp(signup)` — the instant sample's timestamp (seconds). */
  val TimestampSql: String =
    s"""WITH m AS ($MetricEventsSql)
       |SELECT name, label_k, label_instance,
       |  CAST(MAX(epoch_us(ts)) AS DOUBLE) / 1e6 AS value
       |FROM m WHERE name = 'signup'
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `sum by (k) (purchase) / scalar(sum(purchase))` — share of total
    * via a broadcast 1-row scalar.
    */
  val ScalarShareSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |p AS (
       |  SELECT label_k, SUM(CAST(value AS DECIMAL(18,2))) AS kv
       |  FROM m WHERE name = 'purchase' AND value >= 0 GROUP BY label_k),
       |tot AS (
       |  SELECT SUM(CAST(value AS DECIMAL(18,2))) AS tv
       |  FROM m WHERE name = 'purchase' AND value >= 0)
       |SELECT label_k, CAST(kv AS DOUBLE) / CAST(tv AS DOUBLE) AS value
       |FROM p, tot
       |ORDER BY label_k, value""".stripMargin

  /** `sgn(signup - 5.5)` — sign of the shifted gauge snapshot. */
  val SgnSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |lww AS ($GaugeLwwBody)
       |SELECT name, label_k, label_instance,
       |  CAST(sign(CAST(value AS DOUBLE) - 5.5) AS DOUBLE) AS value
       |FROM lww
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  /** `((signup - 5.5) ^ 3) + ((signup / 100) ^ 2.5)` under det-math
    * compilation — [[graft.functions.DetMath.powSql]] with the
    * domain-guarded base columns (DuckDB raises on log2 of a
    * discarded-branch negative). Arithmetic binops drop the metric
    * name (PromQL `__name__` semantics).
    */
  val PowDetSql: String = {
    val DM = graft.functions.DetMath
    val p1 = DM.powSql("u1", "u1p", "u1n", "3.0")
    val p2 = DM.powSql("u2", "u2p", "u2n", "2.5")
    s"""WITH m AS ($MetricEventsSql),
       |lww AS ($GaugeLwwBody),
       |s AS (SELECT label_k, label_instance,
       |        CAST(value AS DOUBLE) - 5.5 AS u1,
       |        CAST(value AS DOUBLE) / 100.0 AS u2
       |      FROM lww),
       |g AS (SELECT *,
       |        CASE WHEN u1 > 0 THEN u1 END AS u1p,
       |        CASE WHEN u1 < 0 THEN -u1 END AS u1n,
       |        CASE WHEN u2 > 0 THEN u2 END AS u2p,
       |        CASE WHEN u2 < 0 THEN -u2 END AS u2n
       |      FROM s)
       |SELECT label_k, label_instance, ($p1) + ($p2) AS value
       |FROM g
       |ORDER BY label_k, label_instance, value""".stripMargin
  }

  /** `signup atan2 (signup - 5.5)` under det-math compilation —
    * [[graft.functions.DetMath.atan2Sql]]'s quadrant dispatch (the
    * fixture crosses x = 0, exercising ±π correction and the axis
    * branches).
    *
    * STAGED through one CTE per intermediate (same IEEE ops in the
    * same order as the one-expression form — each stage is a named
    * column, not a re-derivation): the inlined `atan2Sql` fragment
    * repeats the full `atan` expansion in every quadrant branch and
    * each nested term re-expands its operands, so the flat SQL's
    * expression tree grows combinatorially and blew DuckDB's memory
    * cap in the r17 harness (a 16 KB allocation failing = the tree
    * alone filled the budget). The staged form is linear in the
    * algorithm's step count and value-identical by construction.
    */
  val Atan2DetSql: String = {
    val DM = graft.functions.DetMath
    def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
    // Horner over rr2 — one stage, coefficients pinned like atanSql's
    val p = (4 to 0 by -1).foldLeft(d(DM.AtanCoeffs(5))) { (acc, i) =>
      s"($acc * rr2 + ${d(DM.AtanCoeffs(i))})"
    }
    val tbl = DM.AtanTable.map(d).mkString("[", ",", "]")
    s"""WITH m AS ($MetricEventsSql),
       |lww AS ($GaugeLwwBody),
       |s AS (SELECT label_k, label_instance,
       |        CAST(value AS DOUBLE) AS y,
       |        CAST(value AS DOUBLE) - 5.5 AS x
       |      FROM lww),
       |-- the ratio, NULL on the y-axis / NaN rows (NULL propagates
       |-- through every stage; the final CASE serves those branches)
       |s0 AS (SELECT *, CASE WHEN isnan(y) OR isnan(x) OR x = 0.0
       |         THEN NULL ELSE y / x END AS z FROM s),
       |s1 AS (SELECT *, ABS(z) AS az FROM s0),
       |s2 AS (SELECT *, CASE WHEN az > 1.0 THEN 1.0 / az ELSE az END AS tt
       |       FROM s1),
       |s3 AS (SELECT *, CAST(FLOOR(tt * 8.0 + 0.5) AS INT) AS j FROM s2),
       |s4 AS (SELECT *, (CAST(j AS DOUBLE) / 8.0) AS b FROM s3),
       |s5 AS (SELECT *, ((tt - b) / (1.0 + tt * b)) AS rr FROM s4),
       |s6 AS (SELECT *, (rr * rr) AS rr2 FROM s5),
       |s7 AS (SELECT *, (($tbl)[j + 1] + rr * (1.0 + rr2 * $p)) AS at
       |       FROM s6),
       |s8 AS (SELECT *, (CASE WHEN az > 1.0 THEN ${d(DM.HalfPi)} - at
       |         ELSE at END) AS v0 FROM s7),
       |s9 AS (SELECT *, (CASE WHEN z < 0.0 THEN -v0 ELSE v0 END) AS q
       |       FROM s8)
       |SELECT label_k, label_instance,
       |  (CASE WHEN isnan(y) OR isnan(x) THEN CAST('nan' AS DOUBLE)
       |        WHEN x > 0.0 THEN q
       |        WHEN x < 0.0 AND y >= 0.0 THEN q + ${d(DM.Pi)}
       |        WHEN x < 0.0 THEN q - ${d(DM.Pi)}
       |        WHEN y > 0.0 THEN ${d(DM.HalfPi)}
       |        WHEN y < 0.0 THEN -${d(DM.HalfPi)}
       |        ELSE 0.0 END) AS value
       |FROM s9
       |ORDER BY label_k, label_instance, value""".stripMargin
  }

  /** `label_replace(purchase, "shard", "s$$1", "k", "(.).*")` — dst
    * label from the capture-group expansion of the anchored regex.
    */
  val LabelReplaceSql: String =
    s"""WITH m AS ($MetricEventsSql)
       |SELECT name, label_k, label_instance,
       |  's' || substr(label_k, 1, 1) AS label_shard,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM m WHERE name = 'purchase' AND value >= 0
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, label_shard, value""".stripMargin

  /** `label_join(purchase, "series", "|", "k", "instance")`. */
  val LabelJoinSql: String =
    s"""WITH m AS ($MetricEventsSql)
       |SELECT name, label_k, label_instance,
       |  label_k || '|' || label_instance AS label_series,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM m WHERE name = 'purchase' AND value >= 0
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, label_series, value""".stripMargin

  /** `hour(timestamp(signup))` / `day_of_week(timestamp(signup))` /
    * `month(timestamp(signup))` — calendar components of the per-series
    * last-sample instant (UTC; integer arithmetic where possible, the
    * naive-UTC calendar for month).
    */
  private def timeComponentSql(valueExpr: String): String =
    s"""WITH m AS ($MetricEventsSql),
       |s AS (
       |  SELECT name, label_k, label_instance,
       |    CAST(MAX(epoch_us(ts)) AS DOUBLE) / 1e6 AS x
       |  FROM m WHERE name = 'signup'
       |  GROUP BY name, label_k, label_instance)
       |SELECT name, label_k, label_instance, $valueExpr AS value
       |FROM s
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  val HourSql: String = timeComponentSql(
    "CAST(CAST(floor(x / 3600.0) AS BIGINT) % 24 AS DOUBLE)")

  val DayOfWeekSql: String = timeComponentSql(
    "CAST((CAST(floor(x / 86400.0) AS BIGINT) + 4) % 7 AS DOUBLE)")

  val MonthSql: String = timeComponentSql(
    "CAST(date_part('month', make_timestamp(CAST(floor(x) AS BIGINT) * 1000000)) AS DOUBLE)")

  val DayOfYearSql: String = timeComponentSql(
    "CAST(date_part('doy', make_timestamp(CAST(floor(x) AS BIGINT) * 1000000)) AS DOUBLE)")

  /** `resets(purchase[30d])` — the windowed wrapped-cumulative
    * reconstruction (wrap at 100.00 = 10000 cents per series; see the
    * compiler case): running cents sum over the FULL history up to T,
    * decreases counted only between consecutive samples both inside
    * the 30d window.
    */
  val ResetsWindowSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |c AS (SELECT m.*, t.t_us,
       |        CAST(round(value * 100, 0) AS BIGINT) AS cents
       |      FROM m, t
       |      WHERE name = 'purchase' AND value >= 0
       |        AND epoch_us(ts) <= t_us),
       |w AS (SELECT *,
       |  SUM(cents) OVER (PARTITION BY name, label_k, label_instance
       |                   ORDER BY ts, event_id
       |                   ROWS UNBOUNDED PRECEDING) % 10000 AS wrapped
       |  FROM c),
       |d AS (SELECT *,
       |  LAG(wrapped) OVER sw AS prev,
       |  LAG(epoch_us(ts)) OVER sw AS prev_us
       |  FROM w WINDOW sw AS (PARTITION BY name, label_k, label_instance
       |                       ORDER BY ts, event_id))
       |SELECT name, label_k, label_instance,
       |  CAST(SUM(CASE WHEN prev IS NOT NULL
       |                 AND prev_us > t_us - 2592000000000
       |                 AND wrapped < prev THEN 1 ELSE 0 END) AS DOUBLE) AS value
       |FROM d WHERE epoch_us(ts) > t_us - 2592000000000
       |GROUP BY name, label_k, label_instance
       |ORDER BY name, label_k, label_instance, value""".stripMargin

  // NOTE: no oracle twins for asinh/acosh/atanh — they route through
  // ln, and Math.log vs DuckDB's ln diverge by 1 ulp on some fixture
  // inputs (measured rel err ~2e-16), the same libm bucket as ^/atan2.
  // The p64/p65/p66 queries are registered rows-only with exact
  // IEEE-order values spec-pinned in PromQLFrontendSpec.

  /** `max_over_time((sum by (k) (signup))[32d:6h])` — the gauge grid
    * strategy with a `sum by` inner shape: per-instant LWW per series,
    * summed per (k, instant) in DECIMAL(38,12), max over instants.
    */
  val SubqueryGridGaugeSumSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m),
       |e AS (
       |  SELECT name, label_k, label_instance, value, event_id,
       |    epoch_us(ts) AS tu,
       |    GREATEST(1, 128 - (t_us - epoch_us(ts)) // 21600000000) AS i
       |  FROM m, t
       |  WHERE name = 'signup' AND epoch_us(ts) <= t_us),
       |p AS (
       |  SELECT name, label_k, label_instance, i,
       |    MAX(struct_pack(t := tu, e := event_id, v := value)) AS mstr,
       |    COUNT(*) AS n
       |  FROM e GROUP BY name, label_k, label_instance, i),
       |gi AS (
       |  SELECT name, label_k, label_instance, g.i AS i
       |  FROM (SELECT DISTINCT name, label_k, label_instance FROM p),
       |       (SELECT unnest(generate_series(1, 128)) AS i) g),
       |c AS (
       |  SELECT gi.name AS name, gi.label_k AS label_k,
       |    gi.label_instance AS label_instance, gi.i AS i,
       |    MAX(p.mstr) OVER w AS cum, SUM(p.n) OVER w AS cum_n
       |  FROM gi LEFT JOIN p ON p.name = gi.name AND p.label_k = gi.label_k
       |    AND p.label_instance = gi.label_instance AND p.i = gi.i
       |  WINDOW w AS (PARTITION BY gi.name, gi.label_k, gi.label_instance
       |               ORDER BY gi.i
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |gv AS (
       |  SELECT label_k, i, SUM(CAST(cum.v AS DECIMAL(38,12))) AS gvv
       |  FROM c WHERE cum_n > 0
       |  GROUP BY label_k, i)
       |SELECT label_k, CAST(MAX(gvv) AS DOUBLE) AS value
       |FROM gv
       |GROUP BY label_k
       |ORDER BY label_k, value""".stripMargin

  /** `absent_over_time(signup{k="zzz"}[10d])` — the 1-row
    * equality-labeled vector when the window holds no samples.
    */
  val AbsentOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m)
       |SELECT 'zzz' AS label_k, CAST(1.0 AS DOUBLE) AS value
       |FROM (SELECT COUNT(*) AS c FROM m, t
       |      WHERE name = 'signup' AND label_k = 'zzz'
       |        AND epoch_us(ts) > t_us - 864000000000
       |        AND epoch_us(ts) <= t_us)
       |WHERE c = 0""".stripMargin

  /** `sum by (instance) (click) / on(instance) group_left(k)
    * purchase{k="42"}` — labels carried from the "one" side onto the
    * many-side output (the info-metric join idiom).
    */
  val GroupLeftCarrySql: String =
    s"""WITH m AS ($MetricEventsSql),
       |c AS (
       |  SELECT label_instance, SUM(CAST(value AS DECIMAL(18,2))) AS cv
       |  FROM m WHERE name = 'click' AND value >= 0
       |  GROUP BY label_instance),
       |p AS (
       |  SELECT label_k, label_instance, SUM(CAST(value AS DECIMAL(18,2))) AS pv
       |  FROM m WHERE name = 'purchase' AND value >= 0 AND label_k = '42'
       |  GROUP BY label_k, label_instance)
       |SELECT c.label_instance AS label_instance, p.label_k AS label_k,
       |  CAST(cv AS DOUBLE) / CAST(pv AS DOUBLE) AS value
       |FROM c JOIN p USING (label_instance)
       |ORDER BY label_instance, label_k, value""".stripMargin

  /** `sum by (k) ({__name__=~"purchase|click"})` — a cross-family
    * selector resolved at compose time to an IN-list scan filter.
    */
  val NameRegexSumSql: String =
    s"""WITH m AS ($MetricEventsSql)
       |SELECT label_k,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM m WHERE name IN ('purchase', 'click') AND value >= 0
       |GROUP BY label_k
       |ORDER BY label_k, value""".stripMargin

  /** `purchase % 7` — fmod is exact, so the doubles bit-match. */
  val ModSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |snap AS (
       |  SELECT name, label_k, label_instance,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS v
       |  FROM m WHERE name = 'purchase' AND value >= 0
       |  GROUP BY name, label_k, label_instance)
       |SELECT name, label_k, label_instance,
       |  CAST(v AS DOUBLE) % CAST(7 AS DOUBLE) AS value
       |FROM snap
       |ORDER BY name, label_k, label_instance, value""".stripMargin
}
