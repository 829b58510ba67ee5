package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass histogram accumulation as a typed `Aggregator` — the
  * custom-buffer promotion of the crossJoin+groupBy snapshot form
  * (SURVEY.md §4: "TypedImperativeAggregate-style custom Aggregator for
  * histograms (mergeable bucket buffers)").
  *
  * Buffer = per-boundary counts + exact cent sum + count; `merge` is
  * element-wise addition, so partial aggregation combines map-side and
  * the shuffle carries ONE buffer row per series per partition —
  * at 100 TB the wire cost is O(series × partitions × buckets), with no
  * per-observation rows crossing the network (the crossJoin form ships
  * 7× fewer rows than observations too, but pays a 7× pre-aggregation
  * fan-out this form avoids).
  *
  * Mirrors prometheus-cpp's `Observe` accumulating bucket counts +
  * `_sum`/`_count` per series (`/root/reference/prometheus.cpp:303`).
  */
object HistogramAggregator {

  case class Buf(counts: Array[Long], sumCents: Long, n: Long)

  /** Finished snapshot: cumulative counts aligned with `les`. */
  case class Out(les: Array[Double], cums: Array[Long], count: Long, sum: Double)

  def apply(boundaries: Seq[Double]): Aggregator[Double, Buf, Out] =
    new Aggregator[Double, Buf, Out] {
      private val bs = boundaries.toArray

      override def zero: Buf = Buf(new Array[Long](bs.length), 0L, 0L)

      override def reduce(b: Buf, value: Double): Buf = {
        var i = 0
        // smallest boundary >= value; beyond the last => overflow (+Inf
        // bucket), counted only in n
        var idx = -1
        while (i < bs.length && idx < 0) {
          if (value <= bs(i)) idx = i
          i += 1
        }
        if (idx >= 0) b.counts(idx) += 1
        Buf(b.counts, b.sumCents + math.round(value * 100), b.n + 1)
      }

      override def merge(a: Buf, b: Buf): Buf = {
        val out = new Array[Long](bs.length)
        var i = 0
        while (i < bs.length) { out(i) = a.counts(i) + b.counts(i); i += 1 }
        Buf(out, a.sumCents + b.sumCents, a.n + b.n)
      }

      override def finish(b: Buf): Out = {
        val cums = new Array[Long](bs.length)
        var acc = 0L
        var i = 0
        while (i < bs.length) { acc += b.counts(i); cums(i) = acc; i += 1 }
        Out(bs.clone(), cums, b.n, b.sumCents / 100.0)
      }

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Out] = Encoders.product[Out]
    }
}
