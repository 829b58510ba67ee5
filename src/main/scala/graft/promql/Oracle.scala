package graft.promql

import graft.operators.{Metrics, PromQL}

/** DuckDB twins for the parser-routed driver queries (p1–p4): each SQL
  * mirrors what [[Compiler]] emits for the given PromQL string, so the
  * driver's oracle check covers the WHOLE front-end path — tokenizer →
  * parser → compiler → Catalyst — not just the hand-built operators.
  */
object Oracle {

  import Metrics.MetricEventsSql

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

  /** `purchase{k=~"1.*"} / on(k) click` */
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

  /** `histogram_quantile(0.9, error)` — the operator-level SQL with the
    * front-end's output shape (`value`, deterministic order).
    */
  val HistogramQuantileSql: String =
    "SELECT name, label_k, q AS value FROM (" + PromQL.HistogramQuantileSql +
      ") ORDER BY name, label_k, value"

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

  /** `max_over_time(signup[10d] offset 2d)` */
  val MaxOverTimeSql: String =
    s"""WITH m AS ($MetricEventsSql),
       |t AS (SELECT MAX(epoch_us(ts)) AS t_us FROM m)
       |SELECT name, label_k, MAX(value) AS value
       |FROM m, t
       |WHERE name = 'signup'
       |  AND epoch_us(ts) > t_us - 1036800000000
       |  AND epoch_us(ts) <= t_us - 172800000000
       |GROUP BY name, label_k
       |ORDER BY name, label_k, value""".stripMargin

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
}
