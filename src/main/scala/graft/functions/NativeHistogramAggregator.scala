package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable buffer for [[NativeHistogramAggregator]]: exact integer
  * state for everything hash-gated — the double `sum` of the classic
  * sketch is replaced by exact cents so merge order can never perturb
  * the result (the engine-wide determinism rule) — PLUS a
  * Kahan-compensated float pair `(sumF, sumC)` carrying Prometheus's
  * float-sum semantics for non-cent observations (r10 ask #3). The
  * float pair is deterministic per partitioning but its last ulp can
  * move with merge order, so it feeds the rows-only `sum_float` field
  * only; `sumCents` keeps the hash.
  */
case class NHBuffer(zero: Long, count: Long, sumCents: Long,
    sumF: Double, sumC: Double, buckets: Map[Int, Long])

/** The finished sketch: counts, the sparse positive buckets in the
  * exposition wire shape (spans + count deltas), and the three standard
  * release quantiles computed from the exponential buckets. All fields
  * are pure functions of exact integer state, so the output is
  * bit-stable under any partitioning.
  *
  * `sum` SEMANTICS (deliberate divergence from the Prometheus wire
  * format, where `sum` is an exact float accumulation): observations
  * are accumulated as exact integer CENTS and `sum = sumCents / 100`,
  * so merge order can never perturb the result. Non-cent observations
  * (e.g. √2) therefore quantize in `sum` — `sum_float` carries the
  * Prometheus float semantic alongside it, accumulated with Kahan
  * compensation (error ≤ 2ε·Σ|v| regardless of count, vs n·ε for a
  * naive sum). `sum_float`'s last ulp can move with Spark's merge
  * order, so hash-gated queries select `sum` and leave `sum_float` to
  * rows-only consumers; the spec law pins `|sum_float − Σv| ≤ 2ε·Σ|v|`
  * and `|sum − sum_float| ≤ 0.005·count` (the cent-quantization bound).
  */
case class NHSketch(schema: Int, zero_count: Long, count: Long,
    sum: Double, sum_float: Double, n_buckets: Long,
    span_offsets: Seq[Int], span_lengths: Seq[Int], deltas: Seq[Long],
    p50: Double, p90: Double, p99: Double)

/** Prometheus NATIVE histogram (exponential/sparse buckets) as a typed
  * mergeable Aggregator — the sample kind the classic
  * explicit-boundary A4 histogram (`prometheus.cpp:277-278`) predates.
  * Public semantics (Prometheus exposition-format and client library
  * docs): with schema `s`, bucket `i` covers `(base^(i-1), base^i]`
  * where `base = 2^(2^-s)`; an observation `v > 0` lands in
  * `i = ceil(log2(v) · 2^s)`; `v == 0` lands in the zero bucket. The
  * wire encoding is a span list (first span starts at its absolute
  * index; later offsets are gaps from the previous span's end) plus
  * per-bucket count DELTAS (first relative to zero).
  *
  * 100 TB design: the buffer is a sparse `Map[Int, Long]` bounded by
  * the value dynamic range (≈ 2^s · log2(max/min) entries — tens to a
  * few hundred), merged by key-wise sum — the same
  * one-buffer-per-partition shuffle shape as the classic
  * [[HistogramAggregator]], with resolution that adapts to the data
  * instead of fixed boundaries.
  *
  * Quantiles use the upstream exponential interpolation for native
  * histograms: within bucket `(lo, hi]` at covered fraction `f`,
  * `q = lo · (hi/lo)^f`; a rank inside the zero bucket returns 0.
  * `StrictMath` keeps the float path identical on every JVM. Not
  * oracle-gated (the driver's fixtures carry no native-histogram
  * samples — NOTES_r9 ask #1); spec-pinned instead: merge
  * associativity, wire-shape round-trip, bucket-bound containment,
  * and quantile monotonicity/range laws.
  */
class NativeHistogramAggregator(val schema: Int)
    extends Aggregator[Double, NHBuffer, NHSketch] with Serializable {
  require(schema >= -4 && schema <= 8, "prometheus native-histogram schema range")

  private val scale = StrictMath.pow(2.0, schema) // 2^s (negative s = coarse buckets)

  def bucketIndex(v: Double): Int = {
    val raw = StrictMath.log(v) / StrictMath.log(2.0) * scale
    val up = StrictMath.ceil(raw).toInt
    // Float rounding can push raw a hair above the integer for v
    // EXACTLY on a bucket's closed upper bound (e.g. v = 2^(4/8) at
    // schema 3 gives raw = 4.000000000000001), bumping v into the
    // bucket whose OPEN lower bound equals v. Containment demands
    // v > bucketLow(i): step down while violated (at most one step —
    // and symmetrically one step up if rounding went low).
    if (v <= bucketLow(up)) up - 1
    else if (v > bucketHigh(up)) up + 1
    else up
  }

  def bucketLow(i: Int): Double = StrictMath.pow(2.0, (i - 1) / scale)
  def bucketHigh(i: Int): Double = StrictMath.pow(2.0, i / scale)

  override def zero: NHBuffer = NHBuffer(0L, 0L, 0L, 0.0, 0.0, Map.empty)

  /** One Kahan step: add `v` to the compensated pair `(s, c)`. */
  private def kahan(s: Double, c: Double, v: Double): (Double, Double) = {
    val y = v - c
    val t = s + y
    (t, (t - s) - y)
  }

  override def reduce(b: NHBuffer, v: Double): NHBuffer = {
    require(v >= 0, "native-histogram operator covers the non-negative range")
    val cents = Math.round(v * 100.0)
    val (sf, sc) = kahan(b.sumF, b.sumC, v)
    if (v == 0.0) b.copy(zero = b.zero + 1, count = b.count + 1,
      sumCents = b.sumCents + cents, sumF = sf, sumC = sc)
    else {
      val i = bucketIndex(v)
      b.copy(count = b.count + 1, sumCents = b.sumCents + cents,
        sumF = sf, sumC = sc,
        buckets = b.buckets.updated(i, b.buckets.getOrElse(i, 0L) + 1L))
    }
  }

  override def merge(a: NHBuffer, b: NHBuffer): NHBuffer = {
    // fold b's compensated pair in as two Kahan steps (sum, then the
    // residual) — the error bound stays O(ε·Σ|v|) across any merge tree
    val (s1, c1) = kahan(a.sumF, a.sumC, b.sumF)
    val (s2, c2) = kahan(s1, c1, -b.sumC)
    NHBuffer(a.zero + b.zero, a.count + b.count, a.sumCents + b.sumCents,
      s2, c2,
      b.buckets.foldLeft(a.buckets) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0L) + v)
      })
  }

  /** Exponential-interpolation quantile over the sorted sparse buckets:
    * within bucket `i` at covered fraction `f`, `q = 2^((i−1+f)/2^s)` —
    * algebraically `lo·(hi/lo)^f`, but computed through the engine's
    * deterministic [[DetMath.exp2]] instead of libm `pow`, so the value
    * is bit-identical across engines (hash-gated in b37/p69) and across
    * partitionings, within a few ulp of the libm result.
    */
  def quantile(b: NHBuffer, phi: Double): Double = {
    if (b.count == 0L) return Double.NaN
    val rank = phi * b.count
    if (rank <= b.zero) return 0.0
    var cum = b.zero.toDouble
    val sorted = b.buckets.toSeq.sortBy(_._1)
    for ((i, c) <- sorted) {
      if (rank <= cum + c) {
        val f = (rank - cum) / c
        return DetMath.exp2(((i - 1) + f) / scale)
      }
      cum += c
    }
    bucketHigh(sorted.last._1)
  }

  /** Sparse map → exposition wire shape: walk the sorted indices once;
    * first span offset is absolute, later offsets are gaps from the
    * previous span's exclusive end; deltas chain count-to-count.
    */
  def encode(buckets: Map[Int, Long]): (Seq[Int], Seq[Int], Seq[Long]) = {
    val sorted = buckets.toSeq.sortBy(_._1)
    if (sorted.isEmpty) return (Nil, Nil, Nil)
    val idx = sorted.map(_._1)
    val counts = sorted.map(_._2)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    val lengths = scala.collection.mutable.ArrayBuffer[Int]()
    var pos = 0
    while (pos < idx.length) {
      val start = idx(pos)
      var end = pos
      while (end + 1 < idx.length && idx(end + 1) == idx(end) + 1) end += 1
      offsets += (if (offsets.isEmpty) start else start - (idx(pos - 1) + 1))
      lengths += (end - pos + 1)
      pos = end + 1
    }
    val deltas = counts.zip(0L +: counts.dropRight(1)).map { case (c, p) => c - p }
    (offsets.toSeq, lengths.toSeq, deltas)
  }

  /** Wire shape → sparse map (the scrape-ingest side; round-trip law).
    * The first span's offset is absolute and later offsets are relative
    * to the previous span's exclusive end — tracked with an explicit
    * first-span flag, NOT by whether any delta has been consumed: a
    * zero-length leading span (legal on the wire) consumes no deltas,
    * and keying on the delta index would mis-read the next span's
    * offset as absolute.
    */
  def decode(offsets: Seq[Int], lengths: Seq[Int], deltas: Seq[Long])
      : Map[Int, Long] = {
    val out = scala.collection.mutable.Map[Int, Long]()
    var idx = 0
    var di = 0
    var prevCount = 0L
    var first = true
    offsets.zip(lengths).foreach { case (off, len) =>
      idx = (if (first) off else idx + off)
      first = false
      (0 until len).foreach { _ =>
        prevCount += deltas(di)
        out(idx) = prevCount
        di += 1
        idx += 1
      }
    }
    out.toMap
  }

  override def finish(b: NHBuffer): NHSketch = {
    val (off, len, del) = encode(b.buckets)
    NHSketch(schema, b.zero, b.count, b.sumCents / 100.0,
      b.sumF - b.sumC, // the compensated estimate: s carries −c of error
      b.buckets.size.toLong,
      off, len, del, quantile(b, 0.5), quantile(b, 0.9), quantile(b, 0.99))
  }

  override def bufferEncoder: Encoder[NHBuffer] = Encoders.product[NHBuffer]
  override def outputEncoder: Encoder[NHSketch] = Encoders.product[NHSketch]
}

object NativeHistogramAggregator {

  /** COMPILE-TIME pieces of `histogram_fraction`'s boundary `x`: the
    * bucket index containing `x`, the log-interpolated fraction of that
    * bucket at or below `x` (`log2(x)·2^s − (i−1)`, clamped to [0,1]),
    * and whether the zero bucket counts as below `x`. The fraction
    * bounds are CONSTANTS in the query text, so this libm-routed math
    * runs once at compose time in the JVM and ships to both engines as
    * literals — the runtime plan stays libm-free and hash-gateable.
    */
  def fractionPieces(x: Double, schema: Int): (Int, Double, Boolean) =
    if (x <= 0) (Int.MinValue, 0.0, x >= 0)
    else {
      val a = new NativeHistogramAggregator(schema)
      val scale = StrictMath.pow(2.0, schema)
      val b = a.bucketIndex(x)
      val fx = math.max(0.0, math.min(1.0,
        StrictMath.log(x) / StrictMath.log(2.0) * scale - (b - 1)))
      (b, fx, true)
    }
}
