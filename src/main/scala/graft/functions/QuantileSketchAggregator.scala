package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** DDSketch-style quantile sketch as a typed `Aggregator`: values land
  * in geometric buckets `floor(log_γ(x))`, so any quantile read back
  * from the bucket counts carries RELATIVE error ≤ (γ−1) — here γ=1.02
  * → 2 %. The buffer is a fixed-size count array that merges by
  * elementwise addition: partial sketches combine map-side and one
  * small array per partition crosses the shuffle, versus the exact
  * `percentile` aggregator buffering every value per group.
  *
  * This is the quantile member of the sketch tier (x16 HLL = distinct,
  * x23 count-min = frequency): the published DDSketch construction
  * (Masson et al., VLDB 2019) restricted to positive values and a
  * bounded index range (values below γ^0 clamp to bucket 0, above
  * γ^(width−1) to the top bucket — document lengths fit comfortably).
  * Deterministic: bucket math is pure arithmetic, no randomness, so
  * unlike sampling reservoirs the sketch is reproducible on any
  * partitioning.
  */
case class QuantileSketchAggregator(gamma: Double, width: Int)
  extends Aggregator[Double, Array[Long], Array[Long]] {

  require(gamma > 1.0 && width > 1, "need gamma > 1 and width > 1")

  override def zero: Array[Long] = new Array[Long](width)

  override def reduce(buf: Array[Long], x: Double): Array[Long] = {
    buf(QuantileSketchAggregator.bucket(x, gamma, width)) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object QuantileSketchAggregator {

  /** `γ^i` for i = 0..width, computed ONCE per (γ, width) and shared by
    * bucket assignment, the estimate read-back, and the SQL oracle's
    * literal bounds — so all three see the SAME doubles. (The previous
    * per-call `log`/`pow` read-back was libm-routed and engine-private,
    * which kept x26 rows-only.)
    */
  private val powCache =
    new java.util.concurrent.ConcurrentHashMap[(Double, Int), Array[Double]]()

  def powTable(gamma: Double, width: Int): Array[Double] =
    powCache.computeIfAbsent((gamma, width),
      _ => Array.tabulate(width + 1)(i => StrictMath.pow(gamma, i)))

  /** Bucket of `x`: the unique `i` with `γ^i ≤ x < γ^(i+1)` by BINARY
    * SEARCH over the shared power table — exact containment against the
    * same literals the oracle range-joins (a `log`-quotient index can
    * land one bucket off when x sits within rounding of a boundary);
    * `x ≤ 1` clamps to 0 and `x ≥ γ^(width−1)` to the top bucket.
    */
  def bucket(x: Double, gamma: Double, width: Int): Int = {
    if (!(x > 1.0)) return 0
    val p = powTable(gamma, width)
    if (x >= p(width - 1)) return width - 1
    var lo = 0
    var hi = width - 1 // invariant: p(lo) <= x < p(hi)
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (p(mid) <= x) lo = mid else hi = mid
    }
    lo
  }

  /** Quantile estimate: the geometric midpoint of the bucket where the
    * cumulative count reaches φ·N — the DDSketch read-back, relative
    * error ≤ (γ−1) for in-range values. Pure arithmetic over the shared
    * power table (pinned op order), so the value is reproducible in the
    * SQL oracle bit for bit.
    */
  def estimate(sketch: Array[Long], phi: Double, gamma: Double): Double = {
    val n = sketch.sum
    if (n == 0L) return Double.NaN
    val rank = math.max(1L, math.ceil(phi * n).toLong)
    val p = powTable(gamma, sketch.length)
    var cum = 0L
    var i = 0
    while (i < sketch.length) {
      cum += sketch(i)
      if (cum >= rank) {
        // midpoint of [γ^i, γ^(i+1)): 2γ^i·γ/(γ+1) ≈ γ^(i+0.5)
        return 2.0 * p(i) * gamma / (gamma + 1.0)
      }
      i += 1
    }
    Double.NaN
  }
}
