package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass exact second-moment accumulation over quantized
  * embedding vectors — the first (and only distributed) step of
  * covariance/PCA/whitening prep. Buffer = observation count, per-dim
  * sums, and the upper-triangle raw-product sums (d(d+1)/2 longs);
  * `merge` is element-wise addition, so partials combine map-side and
  * the shuffle carries ONE ~16 KB buffer per partition regardless of
  * corpus size — at 100 TB the wire cost is O(partitions), nothing
  * per-row.
  *
  * All arithmetic is exact BIGINT on the ten-thousandth-quantized
  * integers (the Similarity-tier convention), so the result is
  * bit-identical under any partitioning and oracle-checkable. Headroom:
  * |q| ≤ 10⁴ puts n·ΣP at ~n²·10⁸ — exact to ~3×10⁵ vectors; larger
  * corpora drop the quantization scale (the documented knob), the
  * operator shape is unchanged.
  */
object CovarianceAggregator {

  case class Buf(n: Long, s: Array[Long], p: Array[Long])

  def apply(dim: Int): Aggregator[Seq[Long], Buf, Buf] =
    new Aggregator[Seq[Long], Buf, Buf] {
      private val tri = dim * (dim + 1) / 2

      override def zero: Buf = Buf(0L, new Array[Long](dim), new Array[Long](tri))

      override def reduce(b: Buf, q: Seq[Long]): Buf = {
        val a = q.toArray
        var i = 0
        var k = 0
        while (i < dim) {
          b.s(i) += a(i)
          var j = i
          while (j < dim) { b.p(k) += a(i) * a(j); k += 1; j += 1 }
          i += 1
        }
        Buf(b.n + 1, b.s, b.p)
      }

      override def merge(x: Buf, y: Buf): Buf = {
        val s = new Array[Long](dim)
        val p = new Array[Long](tri)
        var i = 0
        while (i < dim) { s(i) = x.s(i) + y.s(i); i += 1 }
        var k = 0
        while (k < tri) { p(k) = x.p(k) + y.p(k); k += 1 }
        Buf(x.n + y.n, s, p)
      }

      override def finish(b: Buf): Buf = b

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
    }
}
