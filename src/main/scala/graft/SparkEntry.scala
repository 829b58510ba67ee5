package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 expressed
  * Spark-first; [[oracleSql]] holds its ANSI-SQL twin for the driver's
  * DuckDB parity check (column names aliased identically on both sides).
  */
object SparkEntry {

  /** Flagship: the exposition snapshot (`Prometheus.Exposer` serving view,
    * SURVEY.md §2.1 A1) over the sf0.001 event stream — the current value
    * of every counter/gauge/histogram series.
    */
  def entry(spark: SparkSession): DataFrame =
    Metrics.exposition(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tier A — the reference's literal operator semantics (SURVEY.md §2.1)
    "a1_exposition" -> ((s, d) => Metrics.exposition(s, d)),
    "a2_counter_snapshot" -> ((s, d) => Metrics.counterSnapshot(s, d)),
    "a3_gauge_snapshot" -> ((s, d) => Metrics.gaugeSnapshot(s, d)),
    "a4_histogram_snapshot" -> ((s, d) => Metrics.histogramSnapshot(s, d)),
    // Tier B — PromQL-class TSDB query surface (SURVEY.md §2.2)
    "b1_selector" -> ((s, d) => PromQL.selector(s, d)),
    "b2_range_agg" -> ((s, d) => PromQL.rangeAgg(s, d)),
    "b3_rate" -> ((s, d) => PromQL.rate(s, d)),
    "b4_agg_by_label" -> ((s, d) => PromQL.aggByLabel(s, d)),
    "b5_topk" -> ((s, d) => PromQL.topk(s, d)),
    "b6_quantile_across" -> ((s, d) => PromQL.quantileAcross(s, d)),
    "b7_histogram_quantile" -> ((s, d) => PromQL.histogramQuantile(s, d)),
    "b8_binary_op" -> ((s, d) => PromQL.binaryOp(s, d)),
    "b9_offset_compare" -> ((s, d) => PromQL.offsetCompare(s, d)),
    "b10_asof" -> ((s, d) => PromQL.asOf(s, d)),
    // Relational surface (SURVEY.md §2.3: scans/joins/agg/sort/limit)
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q3_shipping_priority" -> ((s, d) => Relational.shippingPriority(s, d)),
    "q5_local_supplier_volume" -> ((s, d) => Relational.localSupplierVolume(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "a1_exposition" -> Metrics.ExpositionSql,
    "a2_counter_snapshot" -> Metrics.CounterSnapshotSql,
    "a3_gauge_snapshot" -> Metrics.GaugeSnapshotSql,
    "a4_histogram_snapshot" -> Metrics.HistogramSnapshotSql,
    "b1_selector" -> PromQL.SelectorSql,
    "b2_range_agg" -> PromQL.RangeAggSql,
    "b3_rate" -> PromQL.RateSql,
    "b4_agg_by_label" -> PromQL.AggByLabelSql,
    "b5_topk" -> PromQL.TopkSql,
    "b6_quantile_across" -> PromQL.QuantileAcrossSql,
    "b7_histogram_quantile" -> PromQL.HistogramQuantileSql,
    "b8_binary_op" -> PromQL.BinaryOpSql,
    "b9_offset_compare" -> PromQL.OffsetCompareSql,
    "b10_asof" -> PromQL.AsOfSql,
    "q1_pricing_summary" -> Relational.PricingSummarySql,
    "q3_shipping_priority" -> Relational.ShippingPrioritySql,
    "q5_local_supplier_volume" -> Relational.LocalSupplierVolumeSql,
  )
}
