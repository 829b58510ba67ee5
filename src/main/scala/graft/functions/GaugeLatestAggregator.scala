package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One gauge sample flowing into [[GaugeLatestAggregator]]: the series
  * identity plus the (event-time, event_id) pair that orders
  * last-write-wins, mirroring the reference's `SetGauge` overwrite
  * semantics (`/root/reference/prometheus.cpp:249`).
  */
case class GaugeObs(series: String, tsUs: Long, eventId: String, value: Double)

/** Per-series latest state kept in the aggregation buffer. */
case class GaugeLatest(tsUs: Long, eventId: String, value: Double)

/** Last-write-wins per series WITHIN one aggregation group, emitting the
  * latest value of every series ordered by series identity.
  *
  * This exists for the STREAMING `agg by (...) (gauge)` path: summing a
  * gauge family groups per-series latest values, and a per-series
  * pre-aggregation followed by the cross-series sum would chain two
  * unwindowed stateful operators (unsupported outside Append mode).
  * Folding the per-series state INTO the aggregation buffer keeps the
  * query a single stateful operator: state is one map entry per series
  * per group (the same O(#series) bound as the per-series form), and the
  * buffer is mergeable, so map-side partial aggregation still applies —
  * at 100 TB the shuffle carries one buffer row per (group × partition),
  * never per observation.
  *
  * The cross-series reduction (sum / min / max / avg / count) is applied
  * AFTERWARDS as a stateless projection over the emitted array, exactly
  * matching the batch compiler's decimal-sum semantics.
  */
object GaugeLatestAggregator
    extends Aggregator[GaugeObs, Map[String, GaugeLatest], Array[Double]] {

  private def later(a: GaugeLatest, b: GaugeLatest): GaugeLatest =
    if (b.tsUs > a.tsUs || (b.tsUs == a.tsUs && b.eventId > a.eventId)) b else a

  override def zero: Map[String, GaugeLatest] = Map.empty

  override def reduce(m: Map[String, GaugeLatest], o: GaugeObs): Map[String, GaugeLatest] = {
    val cand = GaugeLatest(o.tsUs, o.eventId, o.value)
    m.updated(o.series, m.get(o.series).fold(cand)(later(_, cand)))
  }

  override def merge(a: Map[String, GaugeLatest], b: Map[String, GaugeLatest]): Map[String, GaugeLatest] =
    b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.get(k).fold(v)(later(_, v)))
    }

  /** Values sorted by series identity: a deterministic array regardless
    * of map iteration / partition order, so downstream HOF folds are
    * bit-reproducible.
    */
  override def finish(m: Map[String, GaugeLatest]): Array[Double] =
    m.toArray.sortBy(_._1).map(_._2.value)

  override def bufferEncoder: Encoder[Map[String, GaugeLatest]] =
    ExpressionEncoder[Map[String, GaugeLatest]]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

/** One counter increment flowing into [[CounterTotalsAggregator]]:
  * series identity plus the increment in exact integer cents (the
  * engine-wide 2-decimal sample convention).
  */
case class CounterObs(series: String, cents: Long)

/** Running PER-SERIES counter totals within one aggregation group,
  * emitted as an ordered exact-cents array.
  *
  * The streaming form of `count/min/max/avg by (...) (counter)`: those
  * reductions apply to the per-series TOTALS (only `sum` commutes with
  * the event-level accumulation), and a per-series running sum followed
  * by a cross-series aggregate would chain two unwindowed stateful
  * operators. Folding the per-series totals into one mergeable buffer
  * keeps it a single stateful operator with the same O(#series per
  * group) state bound; integer-cent addition is exact and associative,
  * so map-side partials combine bit-reproducibly under any partitioning.
  */
object CounterTotalsAggregator
    extends Aggregator[CounterObs, Map[String, Long], Array[Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], o: CounterObs): Map[String, Long] =
    m.updated(o.series, m.getOrElse(o.series, 0L) + o.cents)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }

  /** Totals sorted by series identity — deterministic output array. */
  override def finish(m: Map[String, Long]): Array[Long] =
    m.toArray.sortBy(_._1).map(_._2)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
