package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OTLP metrics ingestion — the third push protocol at the door, next
  * to remote write 1.0/2.0: Prometheus serves
  * `POST /api/v1/otlp/v1/metrics` (an OpenTelemetry collector's
  * `ExportMetricsServiceRequest` protobuf) and translates points into
  * its own data model by the PUBLIC OTLP→Prometheus compatibility
  * rules. This engine does the same and then NORMALIZES to the one
  * stream wire shape ([[RemoteWrite.Series]] → encode → the a1i-gated
  * generator), so every downstream column expression — events mapping,
  * streaming rollup, the pyramid — is protocol-agnostic, exactly like
  * the remote-write 2.0 path.
  *
  * Translation rules implemented (the compatibility spec's core):
  *  - metric names sanitize (`[^a-zA-Z0-9:_]` → `_`), gain the unit's
  *    suffix (`s`→`_seconds`, `ms`→`_milliseconds`, `By`→`_bytes`,
  *    `%`→`_percent`; dimensionless `1` adds nothing), and monotonic
  *    sums end in `_total`;
  *  - resource attributes `service.name` → `job` (prefixed by
  *    `service.namespace/` when present) and `service.instance.id` →
  *    `instance`; other resource attributes are dropped (upstream puts
  *    them in `target_info`, out of this engine's one-label model);
  *  - point attributes become labels with sanitized names;
  *  - only CUMULATIVE sums are ingestible (upstream rejects delta
  *    temporality absent a feature flag) — delta fails loud, the
  *    endpoint's 400;
  *  - `as_int` points widen to double (the engine's value model, like
  *    Prometheus's float samples).
  */
object Otlp {

  /** One number data point off the wire, pre-translation. */
  final case class Point(name: String, unit: String, kind: String,
      monotonic: Boolean, temporality: Int,
      resource: Vector[(String, String)], attrs: Vector[(String, String)],
      tsNano: Long, value: Double)

  /** Cross-request state of the DELTA→CUMULATIVE conversion —
    * Prometheus 3.x's flag-gated OTLP delta ingestion (upstream's
    * deltatocumulative path): one (last point time, running total) per
    * delta-sum series, held by the door that opted in. Driver state is
    * O(#series), the ExpositionRegistry bound. A point at or before
    * its series' last seen time DROPS (out-of-order deltas cannot
    * merge into a cumulative stream; upstream drops them too).
    */
  final class DeltaState {
    private val m = scala.collection.mutable.Map
      .empty[Vector[(String, String)], (Long, Double)]
    /** Fold one delta point into its series' running total; `None` =
      * the point is out of order and dropped.
      */
    def add(key: Vector[(String, String)], tsMs: Long,
        v: Double): Option[Double] = synchronized {
      m.get(key) match {
        case Some((lastTs, _)) if tsMs <= lastTs => None
        case prev =>
          val cum = prev.map(_._2).getOrElse(0.0) + v
          m.update(key, (tsMs, cum))
          Some(cum)
      }
    }

    /** Running cumulative state of one delta EXPONENTIAL-HISTOGRAM
      * series: totals plus ABSOLUTE bucket counts keyed by Prometheus
      * index (OTLP bucket i at `offset` is index `offset + i + 1`),
      * at the smallest scale seen so far.
      */
    private final case class ExpoCum(lastTs: Long, scale: Int,
        count: Long, sum: Double, zeroCount: Long,
        pos: Map[Int, Long], neg: Map[Int, Long])
    private val hm = scala.collection.mutable.Map
      .empty[Vector[(String, String)], ExpoCum]

    /** Fold one delta exponential-histogram point into its series'
      * running cumulative state (upstream deltatocumulative's
      * histogram arm): `count`/`sum`/`zero_count` add, bucket counts
      * add per index, and a scale mismatch DOWNSCALES to the smaller
      * scale (halving the index, ceil — merging exponential ladders is
      * exact only toward coarser scales; upstream downscales the same
      * way). Returns the accumulated point as a CUMULATIVE [[ExpoHist]]
      * ready for the ordinary translation path; `None` = out of order,
      * dropped.
      */
    def addExpoHist(key: Vector[(String, String)],
        h: ExpoHist): Option[ExpoHist] = synchronized {
      val tsMs = h.tsNano / 1000000L
      hm.get(key) match {
        case Some(st) if tsMs <= st.lastTs => None
        case prev =>
          def toMap(off: Int, cs: Vector[Long]): Map[Int, Long] =
            cs.zipWithIndex.collect {
              case (c, i) if c != 0 => (off + i + 1) -> c
            }.toMap
          // index j at scale s covers (2^((j-1)/2^s), 2^(j/2^s)]; at
          // scale s-d the covering index is ceil(j / 2^d)
          def down(bm: Map[Int, Long], d: Int): Map[Int, Long] =
            if (d <= 0) bm
            else bm.groupMapReduce { case (j, _) =>
              Math.floorDiv(j + (1 << d) - 1, 1 << d)
            }(_._2)(_ + _)
          def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
            (a.keySet ++ b.keySet).iterator
              .map(j => j -> (a.getOrElse(j, 0L) + b.getOrElse(j, 0L)))
              .toMap
          val scale = math.min(prev.map(_.scale).getOrElse(h.scale), h.scale)
          val (pPos, pNeg) = prev
            .map(st => (down(st.pos, st.scale - scale),
              down(st.neg, st.scale - scale)))
            .getOrElse((Map.empty[Int, Long], Map.empty[Int, Long]))
          val pos = merge(pPos, down(toMap(h.posOffset, h.posCounts),
            h.scale - scale))
          val neg = merge(pNeg, down(toMap(h.negOffset, h.negCounts),
            h.scale - scale))
          val st2 = ExpoCum(tsMs, scale,
            prev.map(_.count).getOrElse(0L) + h.count,
            prev.map(_.sum).getOrElse(0.0) + h.sum,
            prev.map(_.zeroCount).getOrElse(0L) + h.zeroCount,
            pos, neg)
          hm.update(key, st2)
          def dense(bm: Map[Int, Long]): (Int, Vector[Long]) =
            if (bm.isEmpty) (0, Vector.empty)
            else {
              val lo = bm.keys.min
              val hi = bm.keys.max
              (lo - 1, (lo to hi).map(j => bm.getOrElse(j, 0L)).toVector)
            }
          val (po, pc) = dense(pos)
          val (no, nc) = dense(neg)
          Some(h.copy(temporality = 2, count = st2.count, sum = st2.sum,
            zeroCount = st2.zeroCount, scale = scale,
            posOffset = po, posCounts = pc,
            negOffset = no, negCounts = nc))
      }
    }

    /** Running cumulative state of one delta CLASSIC (explicit-bounds)
      * histogram series. Bucket layouts must match to accumulate; a
      * BOUNDS CHANGE resets the series' state to the incoming point
      * (upstream deltatocumulative's layout-change reset — the two
      * ladders cannot merge).
      */
    private final case class ClassicCum(lastTs: Long,
        bounds: Vector[Double], counts: Vector[Long], count: Long,
        sum: Double)
    private val chm = scala.collection.mutable.Map
      .empty[Vector[(String, String)], ClassicCum]

    /** Fold one delta classic-histogram point into its series' running
      * cumulative state; `None` = out of order, dropped.
      */
    def addClassicHist(key: Vector[(String, String)],
        h: ClassicHist): Option[ClassicHist] = synchronized {
      val tsMs = h.tsNano / 1000000L
      chm.get(key) match {
        case Some(st) if tsMs <= st.lastTs => None
        case prev =>
          val st2 = prev match {
            case Some(st) if st.bounds == h.bounds =>
              ClassicCum(tsMs, h.bounds,
                st.counts.zipAll(h.bucketCounts, 0L, 0L).map(t => t._1 + t._2),
                st.count + h.count, st.sum + h.sum)
            case _ => // first point, or a layout change resets
              ClassicCum(tsMs, h.bounds, h.bucketCounts, h.count, h.sum)
          }
          chm.update(key, st2)
          Some(h.copy(temporality = 2, bucketCounts = st2.counts,
            count = st2.count, sum = st2.sum))
      }
    }
  }

  /** One exponential-histogram data point off the wire — OTLP's twin of
    * the Prometheus native histogram: same base-2 exponential bucketing
    * (`scale` ≡ schema), but buckets ride as ABSOLUTE counts over a
    * dense index range (offset + counts array) instead of span/delta
    * chains, and the index convention is off by one (OTLP bucket i
    * covers `(base^(offset+i), base^(offset+i+1)]`; the Prometheus
    * index for that interval is `offset + i + 1`).
    */
  final case class ExpoHist(name: String, unit: String, temporality: Int,
      resource: Vector[(String, String)], attrs: Vector[(String, String)],
      tsNano: Long, count: Long, sum: Double, zeroCount: Long, scale: Int,
      posOffset: Int, posCounts: Vector[Long],
      negOffset: Int, negCounts: Vector[Long])

  /** One classic (explicit-bounds) histogram data point — translated
    * the way upstream's OTLP receiver does: into plain
    * `_bucket{le=…}` / `_sum` / `_count` SERIES (cumulative counts from
    * the per-bucket array), which then ride the ordinary sample
    * pipeline with no special handling anywhere downstream.
    */
  final case class ClassicHist(name: String, unit: String,
      temporality: Int, resource: Vector[(String, String)],
      attrs: Vector[(String, String)], tsNano: Long, count: Long,
      sum: Double, bounds: Vector[Double], bucketCounts: Vector[Long])

  /** One summary data point — translated the way upstream's compat
    * spec prescribes: `_sum` and `_count` series plus one gauge series
    * per pre-computed quantile, labeled `quantile="φ"` on the BASE name
    * (no suffix), exactly the classic Prometheus summary exposition.
    * Summaries carry no temporality field on the wire — the quantile
    * values are windowed by the producer and `count`/`sum` are
    * cumulative by definition.
    */
  final case class SummaryPoint(name: String, unit: String,
      resource: Vector[(String, String)], attrs: Vector[(String, String)],
      tsNano: Long, count: Long, sum: Double,
      quantiles: Vector[(Double, Double)])

  /** Everything a payload carries that this engine models. */
  final case class Decoded(points: Vector[Point],
      expoHists: Vector[ExpoHist],
      classicHists: Vector[ClassicHist] = Vector.empty,
      summaries: Vector[SummaryPoint] = Vector.empty)

  /** Decode an UNCOMPRESSED `ExportMetricsServiceRequest`. Throws
    * `IllegalArgumentException` on malformed bytes — the endpoint's
    * HTTP 400. Unknown fields (exemplars, scope, schema URLs, future
    * metric kinds) skip by wire type, so a collector sending more than
    * this engine models still lands everything it does model: gauges,
    * sums, classic + exponential histograms, and summaries.
    */
  def walk(bytes: Array[Byte]): Decoded = {
    val end = bytes.length
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed OTLP request: $msg")
    def varint(limit: Int): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        if (pos >= limit) fail("truncated varint")
        val b = bytes(pos)
        pos += 1
        out |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      fail("varint exceeds 64 bits")
    }
    def fixed64(limit: Int): Long = {
      if (pos + 8 > limit) fail("truncated fixed64")
      var out = 0L
      var i = 0
      while (i < 8) { out |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      out
    }
    def lenDelim(limit: Int): Int = {
      val len = varint(limit)
      if (len < 0 || pos + len > limit) fail("length overruns message")
      pos + len.toInt
    }
    def skip(wireType: Int, limit: Int): Unit = wireType match {
      case 0 => varint(limit)
      case 1 =>
        if (pos + 8 > limit) fail("truncated fixed64"); pos += 8
      case 2 => pos = lenDelim(limit)
      case 5 =>
        if (pos + 4 > limit) fail("truncated fixed32"); pos += 4
      case other => fail(s"unsupported wire type $other")
    }
    def str(from: Int, until: Int): String =
      new String(bytes, from, until - from,
        java.nio.charset.StandardCharsets.UTF_8)

    // KeyValue { key = 1; AnyValue value = 2 } — only string/bool/int/
    // double AnyValue branches render; array/kvlist/bytes skip to ""
    def keyValue(limit: Int): (String, String) = {
      var key = ""
      var value = ""
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) =>
            val u = lenDelim(limit); key = str(pos, u); pos = u
          case (2, 2) =>
            val vu = lenDelim(limit)
            while (pos < vu) {
              val vt = varint(vu)
              ((vt >> 3).toInt, (vt & 7).toInt) match {
                case (1, 2) =>
                  val su = lenDelim(vu); value = str(pos, su); pos = su
                case (2, 0) => value = if (varint(vu) != 0L) "true" else "false"
                case (3, 0) => value = varint(vu).toString
                case (4, 1) =>
                  value = java.lang.Double.longBitsToDouble(fixed64(vu)).toString
                case (_, wt) => skip(wt, vu)
              }
            }
          case (_, wt) => skip(wt, limit)
        }
      }
      (key, value)
    }

    // NumberDataPoint { start=2 fixed64; time=3 fixed64; as_double=4;
    //                   as_int=6 sfixed64; attributes=7 }
    def dataPoint(limit: Int): (Vector[(String, String)], Long, Double) = {
      val attrs = Vector.newBuilder[(String, String)]
      var ts = 0L
      var v = 0.0
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (3, 1) => ts = fixed64(limit)
          case (4, 1) => v = java.lang.Double.longBitsToDouble(fixed64(limit))
          case (6, 1) => v = fixed64(limit).toDouble // as_int, sfixed64
          case (7, 2) => attrs += keyValue(lenDelim(limit))
          case (_, wt) => skip(wt, limit)
        }
      }
      (attrs.result(), ts, v)
    }

    // ExponentialHistogramDataPoint { attributes=1; time=3 fixed64;
    //   count=4 fixed64; sum=5 double; scale=6 sint32;
    //   zero_count=7 fixed64; positive=8 Buckets; negative=9 Buckets }
    // Buckets { offset=1 sint32; bucket_counts=2 repeated uint64 }
    def expoBuckets(limit: Int): (Int, Vector[Long]) = {
      var off = 0
      val counts = Vector.newBuilder[Long]
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 0) =>
            val u = varint(limit); off = ((u >>> 1) ^ -(u & 1L)).toInt
          case (2, 2) =>
            val u = lenDelim(limit)
            while (pos < u) counts += varint(u)
          case (2, 0) => counts += varint(limit)
          case (_, wt) => skip(wt, limit)
        }
      }
      (off, counts.result())
    }

    def expoPoint(limit: Int): (Vector[(String, String)], Long, Long,
        Double, Long, Int, Int, Vector[Long], Int, Vector[Long]) = {
      val attrs = Vector.newBuilder[(String, String)]
      var ts = 0L
      var count = 0L
      var sum = 0.0
      var zero = 0L
      var scale = 0
      var po = 0
      var pc = Vector.empty[Long]
      var no = 0
      var nc = Vector.empty[Long]
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) => attrs += keyValue(lenDelim(limit))
          case (3, 1) => ts = fixed64(limit)
          case (4, 1) => count = fixed64(limit)
          case (5, 1) => sum = java.lang.Double.longBitsToDouble(fixed64(limit))
          case (6, 0) =>
            val u = varint(limit); scale = ((u >>> 1) ^ -(u & 1L)).toInt
          case (7, 1) => zero = fixed64(limit)
          case (8, 2) =>
            val (o, c) = expoBuckets(lenDelim(limit)); po = o; pc = c
          case (9, 2) =>
            val (o, c) = expoBuckets(lenDelim(limit)); no = o; nc = c
          case (_, wt) => skip(wt, limit)
        }
      }
      (attrs.result(), ts, count, sum, zero, scale, po, pc, no, nc)
    }

    // HistogramDataPoint { attributes=1; time=3 fixed64; count=4
    //   fixed64; sum=5 double; bucket_counts=6 packed fixed64;
    //   explicit_bounds=7 packed double }
    def classicPoint(limit: Int): (Vector[(String, String)], Long, Long,
        Double, Vector[Double], Vector[Long]) = {
      val attrs = Vector.newBuilder[(String, String)]
      var ts = 0L
      var count = 0L
      var sum = 0.0
      val bounds = Vector.newBuilder[Double]
      val counts = Vector.newBuilder[Long]
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) => attrs += keyValue(lenDelim(limit))
          case (3, 1) => ts = fixed64(limit)
          case (4, 1) => count = fixed64(limit)
          case (5, 1) => sum = java.lang.Double.longBitsToDouble(fixed64(limit))
          case (6, 2) => // packed fixed64 bucket_counts
            val u = lenDelim(limit)
            while (pos < u) counts += fixed64(u)
          case (6, 1) => counts += fixed64(limit)
          case (7, 2) => // packed double explicit_bounds
            val u = lenDelim(limit)
            while (pos < u)
              bounds += java.lang.Double.longBitsToDouble(fixed64(u))
          case (7, 1) =>
            bounds += java.lang.Double.longBitsToDouble(fixed64(limit))
          case (_, wt) => skip(wt, limit)
        }
      }
      (attrs.result(), ts, count, sum, bounds.result(), counts.result())
    }

    // SummaryDataPoint { attributes=7; time=3 fixed64; count=4 fixed64;
    //   sum=5 double; quantile_values=6 ValueAtQuantile }
    // ValueAtQuantile { quantile=1 double; value=2 double }
    def summaryPoint(limit: Int): (Vector[(String, String)], Long, Long,
        Double, Vector[(Double, Double)]) = {
      val attrs = Vector.newBuilder[(String, String)]
      var ts = 0L
      var count = 0L
      var sum = 0.0
      val qs = Vector.newBuilder[(Double, Double)]
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (3, 1) => ts = fixed64(limit)
          case (4, 1) => count = fixed64(limit)
          case (5, 1) => sum = java.lang.Double.longBitsToDouble(fixed64(limit))
          case (6, 2) =>
            val u = lenDelim(limit)
            var q = 0.0
            var v = 0.0
            while (pos < u) {
              val qt = varint(u)
              ((qt >> 3).toInt, (qt & 7).toInt) match {
                case (1, 1) => q = java.lang.Double.longBitsToDouble(fixed64(u))
                case (2, 1) => v = java.lang.Double.longBitsToDouble(fixed64(u))
                case (_, wt) => skip(wt, u)
              }
            }
            qs += ((q, v))
          case (7, 2) => attrs += keyValue(lenDelim(limit))
          case (_, wt) => skip(wt, limit)
        }
      }
      (attrs.result(), ts, count, sum, qs.result())
    }

    // Metric { name=1; unit=3; gauge=5; sum=7; histogram=9;
    //          exponential_histogram=10; summary=11 }
    def metric(limit: Int, resource: Vector[(String, String)])
        : (Vector[Point], Vector[ExpoHist], Vector[ClassicHist],
            Vector[SummaryPoint]) = {
      var name = ""
      var unit = ""
      val ehs = Vector.newBuilder[ExpoHist]
      var ehRaw = Vector.empty[(Vector[(String, String)], Long, Long,
        Double, Long, Int, Int, Vector[Long], Int, Vector[Long])]
      var ehTemporality = 0
      var chRaw = Vector.empty[(Vector[(String, String)], Long, Long,
        Double, Vector[Double], Vector[Long])]
      var chTemporality = 0
      var smRaw = Vector.empty[(Vector[(String, String)], Long, Long,
        Double, Vector[(Double, Double)])]
      val out = Vector.newBuilder[(String, Boolean, Int, Vector[(String, String)], Long, Double)]
      while (pos < limit) {
        val tag = varint(limit)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) =>
            val u = lenDelim(limit); name = str(pos, u); pos = u
          case (3, 2) =>
            val u = lenDelim(limit); unit = str(pos, u); pos = u
          case (5, 2) => // Gauge { data_points = 1 }
            val gu = lenDelim(limit)
            while (pos < gu) {
              val gt = varint(gu)
              ((gt >> 3).toInt, (gt & 7).toInt) match {
                case (1, 2) =>
                  val (a, t, v) = dataPoint(lenDelim(gu))
                  out += (("gauge", false, 2, a, t, v))
                case (_, wt) => skip(wt, gu)
              }
            }
          case (7, 2) => // Sum { data_points=1; temporality=2; monotonic=3 }
            val su = lenDelim(limit)
            val pts = Vector.newBuilder[(Vector[(String, String)], Long, Double)]
            var temporality = 0
            var monotonic = false
            while (pos < su) {
              val st = varint(su)
              ((st >> 3).toInt, (st & 7).toInt) match {
                case (1, 2) => pts += dataPoint(lenDelim(su))
                case (2, 0) => temporality = varint(su).toInt
                case (3, 0) => monotonic = varint(su) != 0L
                case (_, wt) => skip(wt, su)
              }
            }
            pts.result().foreach { case (a, t, v) =>
              out += (("sum", monotonic, temporality, a, t, v))
            }
          case (9, 2) => // Histogram { data_points=1; temporality=2 }
            val hu = lenDelim(limit)
            while (pos < hu) {
              val ht = varint(hu)
              ((ht >> 3).toInt, (ht & 7).toInt) match {
                case (1, 2) => chRaw = chRaw :+ classicPoint(lenDelim(hu))
                case (2, 0) => chTemporality = varint(hu).toInt
                case (_, wt) => skip(wt, hu)
              }
            }
          case (10, 2) => // ExponentialHistogram { data_points=1; temporality=2 }
            val eu = lenDelim(limit)
            while (pos < eu) {
              val et = varint(eu)
              ((et >> 3).toInt, (et & 7).toInt) match {
                case (1, 2) => ehRaw = ehRaw :+ expoPoint(lenDelim(eu))
                case (2, 0) => ehTemporality = varint(eu).toInt
                case (_, wt) => skip(wt, eu)
              }
            }
          case (11, 2) => // Summary { data_points=1 } — no temporality
            val su = lenDelim(limit)
            while (pos < su) {
              val st = varint(su)
              ((st >> 3).toInt, (st & 7).toInt) match {
                case (1, 2) => smRaw = smRaw :+ summaryPoint(lenDelim(su))
                case (_, wt) => skip(wt, su)
              }
            }
          case (_, wt) => skip(wt, limit)
        }
      }
      val n = name
      val u = unit
      ehRaw.foreach { case (a, t, c, s, z, sc, po, pc, no, nc) =>
        ehs += ExpoHist(n, u, ehTemporality, resource, a, t, c, s, z, sc,
          po, pc, no, nc)
      }
      val chs = chRaw.map { case (a, t, c, s, bs, cs) =>
        ClassicHist(n, u, chTemporality, resource, a, t, c, s, bs, cs)
      }
      val sms = smRaw.map { case (a, t, c, s, qs) =>
        SummaryPoint(n, u, resource, a, t, c, s, qs)
      }
      (out.result().map { case (kind, mono, temp, attrs, ts, v) =>
        Point(n, u, kind, mono, temp, resource, attrs, ts, v)
      }, ehs.result(), chs, sms)
    }

    val points = Vector.newBuilder[Point]
    val expos = Vector.newBuilder[ExpoHist]
    val classics = Vector.newBuilder[ClassicHist]
    val summaries = Vector.newBuilder[SummaryPoint]
    while (pos < end) {
      val tag = varint(end)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // ResourceMetrics { resource=1; scope_metrics=2 }
          val ru = lenDelim(end)
          var resource = Vector.empty[(String, String)]
          // resource may follow its scope_metrics on the wire — gather
          // scope ranges first, walk metrics after (like walkV2's
          // symbols-last handling)
          val smRanges = Vector.newBuilder[(Int, Int)]
          while (pos < ru) {
            val rt = varint(ru)
            ((rt >> 3).toInt, (rt & 7).toInt) match {
              case (1, 2) => // Resource { attributes = 1 }
                val au = lenDelim(ru)
                val as = Vector.newBuilder[(String, String)]
                while (pos < au) {
                  val at = varint(au)
                  ((at >> 3).toInt, (at & 7).toInt) match {
                    case (1, 2) => as += keyValue(lenDelim(au))
                    case (_, wt) => skip(wt, au)
                  }
                }
                resource = as.result()
              case (2, 2) =>
                val u = lenDelim(ru); smRanges += ((pos, u)); pos = u
              case (_, wt) => skip(wt, ru)
            }
          }
          val res = resource
          smRanges.result().foreach { case (from, until) =>
            pos = from
            while (pos < until) {
              val st = varint(until)
              ((st >> 3).toInt, (st & 7).toInt) match {
                case (2, 2) =>
                  val (ps, es, cs, ss) = metric(lenDelim(until), res)
                  points ++= ps
                  expos ++= es
                  classics ++= cs
                  summaries ++= ss
                case (_, wt) => skip(wt, until) // scope, schema_url
              }
            }
          }
          pos = ru
        case (_, wt) => skip(wt, end)
      }
    }
    Decoded(points.result(), expos.result(), classics.result(),
      summaries.result())
  }

  /** The compatibility spec's unit-suffix table (the subset of units
    * the engine's corpora use; unknown units sanitize and append as-is,
    * the dimensionless `1` appends nothing).
    */
  private val UnitSuffix = Map(
    "s" -> "seconds", "ms" -> "milliseconds", "us" -> "microseconds",
    "ns" -> "nanoseconds", "By" -> "bytes", "KiBy" -> "kibibytes",
    "MiBy" -> "mebibytes", "%" -> "percent", "1" -> "")

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == ':' || c == '_') c else '_')

  private def labelSanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '_') c else '_')

  /** Prometheus name of an OTLP metric: sanitized, unit-suffixed,
    * `_total` for monotonic sums.
    */
  private[graft] def promName(p: Point): String = {
    val base = sanitize(p.name)
    val suffix = UnitSuffix.getOrElse(p.unit, sanitize(p.unit))
    val unitized =
      if (suffix.isEmpty || base.endsWith(s"_$suffix")) base
      else s"${base}_$suffix"
    if (p.kind == "sum" && p.monotonic && !unitized.endsWith("_total"))
      s"${unitized}_total"
    else unitized
  }

  private def seriesLabels(name: String,
      resource: Vector[(String, String)],
      attrs: Vector[(String, String)]): Vector[(String, String)] = {
    val res = resource.toMap
    val job = res.get("service.name").map { n =>
      res.get("service.namespace").map(ns => s"$ns/$n").getOrElse(n)
    }
    Vector("__name__" -> name) ++
      job.map("job" -> _) ++
      res.get("service.instance.id").map("instance" -> _) ++
      attrs.map { case (k, v) => labelSanitize(k) -> v }
  }

  /** (offset, absolute counts) of one OTLP Buckets message → the
    * Prometheus span/delta encoding: OTLP bucket i maps to Prometheus
    * index `offset + i + 1` (the off-by-one between the two public
    * conventions — OTLP's bucket 0 at offset 0 covers (1, base], which
    * IS Prometheus bucket 1), one dense span, counts re-expressed as a
    * delta chain.
    */
  private[graft] def toSpans(offset: Int, counts: Vector[Long])
      : (Vector[Int], Vector[Int], Vector[Long]) =
    if (counts.isEmpty) (Vector.empty, Vector.empty, Vector.empty)
    else {
      val deltas = counts.head +: counts.sliding(2).collect {
        case Vector(a, b) => b - a
      }.toVector
      (Vector(offset + 1), Vector(counts.length), deltas)
    }

  /** Translate a walked payload into the one stream wire shape —
    * number points as samples, exponential histograms as native-
    * histogram payloads (the engine's family registry and two-sided
    * quantile walk consume them like any remote-written histogram).
    * Delta temporality fails loud on both kinds (upstream's OTLP
    * receiver rejects it too).
    */
  def translate(decoded: Decoded,
      deltaState: Option[DeltaState] = None): Vector[RemoteWrite.Series] = {
    // DELTA sums convert to cumulative when the door opted in (the 3.x
    // flag-gated path): points fold per series in timestamp order into
    // the cross-request running total; out-of-order points drop. With
    // no state configured, delta still fails loud below — upstream's
    // default.
    val (deltaPts, plainPts) = deltaState match {
      case Some(_) =>
        decoded.points.partition(p => p.kind == "sum" && p.temporality == 1)
      case None => (Vector.empty[Point], decoded.points)
    }
    val deltaSeries = deltaState.toVector.flatMap { st =>
      deltaPts.groupBy(p => seriesLabels(promName(p), p.resource, p.attrs))
        .toVector.sortBy(_._1.toString) // deterministic fold order
        .flatMap { case (labels, ps) =>
          ps.sortBy(_.tsNano).flatMap { p =>
            st.add(labels, p.tsNano / 1000000L, p.value).map(cum =>
              RemoteWrite.Series(labels, Vector((cum, p.tsNano / 1000000L))))
          }
        }
    }
    val pts = plainPts.map { p =>
      if (p.kind == "sum" && p.temporality != 2)
        throw new IllegalArgumentException(
          s"OTLP sum '${p.name}' has non-cumulative temporality " +
            s"${p.temporality}; only cumulative is ingestible")
      RemoteWrite.Series(seriesLabels(promName(p), p.resource, p.attrs),
        Vector((p.value, p.tsNano / 1000000L)))
    } ++ deltaSeries
    def expoName(h: ExpoHist): String = {
      val base = sanitize(h.name)
      val suffix = UnitSuffix.getOrElse(h.unit, sanitize(h.unit))
      if (suffix.isEmpty || base.endsWith(s"_$suffix")) base
      else s"${base}_$suffix"
    }
    // DELTA exponential histograms convert behind the same opt-in flag
    // (the deltatocumulative histogram arm): per series in timestamp
    // order, bucket counts accumulate; the converted points then ride
    // the ordinary cumulative path below
    val (deltaHists, plainHists) = deltaState match {
      case Some(_) => decoded.expoHists.partition(_.temporality == 1)
      case None => (Vector.empty[ExpoHist], decoded.expoHists)
    }
    val convertedHists = deltaState.toVector.flatMap { st =>
      deltaHists.groupBy(h => seriesLabels(expoName(h), h.resource, h.attrs))
        .toVector.sortBy(_._1.toString) // deterministic fold order
        .flatMap { case (labels, hs) =>
          hs.sortBy(_.tsNano).flatMap(h => st.addExpoHist(labels, h))
        }
    }
    val hists = (plainHists ++ convertedHists).map { h =>
      if (h.temporality != 2)
        throw new IllegalArgumentException(
          s"OTLP exponential histogram '${h.name}' has non-cumulative " +
            s"temporality ${h.temporality}; only cumulative is ingestible")
      val named = expoName(h)
      val (po, pl, pd) = toSpans(h.posOffset, h.posCounts)
      val (no, nl, nd) = toSpans(h.negOffset, h.negCounts)
      RemoteWrite.Series(seriesLabels(named, h.resource, h.attrs),
        Vector.empty,
        Vector(RemoteWrite.Hist(h.tsNano / 1000000L, h.scale, po, pl, pd,
          h.count, h.sum, h.zeroCount, no, nl, nd)))
    }
    // DELTA classic histograms convert behind the same flag: per-series
    // running bucket/count/sum totals; a bounds change resets (the two
    // ladders cannot merge — upstream's layout-change rule)
    def classicName(h: ClassicHist): String = {
      val base = sanitize(h.name)
      val suffix = UnitSuffix.getOrElse(h.unit, sanitize(h.unit))
      if (suffix.isEmpty || base.endsWith(s"_$suffix")) base
      else s"${base}_$suffix"
    }
    val (deltaClassics, plainClassics) = deltaState match {
      case Some(_) => decoded.classicHists.partition(_.temporality == 1)
      case None => (Vector.empty[ClassicHist], decoded.classicHists)
    }
    val convertedClassics = deltaState.toVector.flatMap { st =>
      deltaClassics
        .groupBy(h => seriesLabels(classicName(h), h.resource, h.attrs))
        .toVector.sortBy(_._1.toString)
        .flatMap { case (labels, hs) =>
          hs.sortBy(_.tsNano).flatMap(h => st.addClassicHist(labels, h))
        }
    }
    val classics = (plainClassics ++ convertedClassics).flatMap { h =>
      if (h.temporality != 2)
        throw new IllegalArgumentException(
          s"OTLP histogram '${h.name}' has non-cumulative temporality " +
            s"${h.temporality}; only cumulative is ingestible")
      val named = classicName(h)
      val tsMs = h.tsNano / 1000000L
      def ser(name: String, extra: Vector[(String, String)],
          v: Double): RemoteWrite.Series =
        RemoteWrite.Series(
          seriesLabels(name, h.resource, h.attrs) ++ extra,
          Vector((v, tsMs)))
      // upstream's classic translation: one cumulative _bucket series
      // per bound (prefix sums of the per-bucket array) + the +Inf
      // bucket (the total), plus _sum and _count — plain samples from
      // here on, nothing downstream is histogram-aware
      val cums = h.bucketCounts.scanLeft(0L)(_ + _).drop(1)
      val buckets = h.bounds.zip(cums).map { case (b, c) =>
        ser(s"${named}_bucket", Vector("le" -> fmtLe(b)), c.toDouble)
      } :+ ser(s"${named}_bucket", Vector("le" -> "+Inf"),
        cums.lastOption.getOrElse(0L).toDouble)
      buckets :+ ser(s"${named}_sum", Vector.empty, h.sum) :+
        ser(s"${named}_count", Vector.empty, h.count.toDouble)
    }
    val summaries = decoded.summaries.flatMap { sm =>
      val base = sanitize(sm.name)
      val suffix = UnitSuffix.getOrElse(sm.unit, sanitize(sm.unit))
      val named =
        if (suffix.isEmpty || base.endsWith(s"_$suffix")) base
        else s"${base}_$suffix"
      val tsMs = sm.tsNano / 1000000L
      def ser(name: String, extra: Vector[(String, String)],
          v: Double): RemoteWrite.Series =
        RemoteWrite.Series(
          seriesLabels(name, sm.resource, sm.attrs) ++ extra,
          Vector((v, tsMs)))
      // upstream's summary translation: each pre-computed quantile is a
      // gauge series on the BASE name with a `quantile` label, plus
      // `_sum`/`_count` — the classic Prometheus summary exposition,
      // plain samples from here on
      sm.quantiles.map { case (q, v) =>
        ser(named, Vector("quantile" -> fmtLe(q)), v)
      } :+ ser(s"${named}_sum", Vector.empty, sm.sum) :+
        ser(s"${named}_count", Vector.empty, sm.count.toDouble)
    }
    pts ++ hists ++ classics ++ summaries
  }

  /** `le` rendering, the Prometheus text convention: integral bounds
    * print without the trailing `.0`.
    */
  private[graft] def fmtLe(v: Double): String =
    if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15)
      v.toLong.toString
    else v.toString

  /** a1n — the OTLP door, hash-gated like a1i/a1j/a1k: a hand-assembled
    * `ExportMetricsServiceRequest` (every byte justified below) walks,
    * translates by the compatibility rules, normalizes through the SAME
    * a1i-gated generator as every other push protocol, and the DuckDB
    * oracle is the hand-derived translated relation — so the gate fails
    * if the walker misreads the nesting, the name translation drops a
    * suffix, or the resource→job/instance mapping drifts.
    *
    * Shapes covered: monotonic cumulative sum with unit suffixing +
    * `_total` (double point, dotted name+attrs); gauge from an `as_int`
    * point; a dropped non-identity resource attribute; an empty
    * InstrumentationScope message (skipped); fixed64 nano timestamps.
    */
  def otlpIngest(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // ExportMetricsServiceRequest, hand-assembled:
    // 0A BF01  resource_metrics#1, 191 bytes:
    //   0A 4C  resource, 76 bytes:
    //     0A 1A  attr: 0A 0C "service.name" 12 0A (0A 08 "checkout")
    //     0A 1E  attr: 0A 13 "service.instance.id" 12 07 (0A 05 "box:1")
    //     0A 0E  attr: 0A 06 "region" 12 04 (0A 02 "eu")   <- dropped
    //   12 6F  scope_metrics, 111 bytes:
    //     0A 00  scope: empty InstrumentationScope (skipped)
    //     12 3E  metric#1, 62 bytes:
    //       0A 14  name = "http.server.duration"
    //       1A 01  unit = "s"
    //       3A 23  sum, 35 bytes:
    //         0A 1D  data_point, 29 bytes:
    //           19 <1e9 ns LE: 0x3B9ACA00>   time = 1 s
    //           21 <3.5 LE: 0x400C000000000000>  as_double
    //           3A 09  attr: 0A 01 "k" 12 04 (0A 02 "eu")
    //         10 02  temporality = CUMULATIVE
    //         18 01  is_monotonic = true
    //     12 2B  metric#2, 43 bytes:
    //       0A 08  name = "cpu.temp"
    //       2A 1F  gauge, 31 bytes:
    //         0A 1D  data_point, 29 bytes:
    //           19 <2e9 ns LE: 0x77359400>   time = 2 s
    //           31 <42 LE sfixed64>          as_int
    //           3A 09  attr: 0A 01 "k" 12 04 (0A 02 "us")
    val payload = RemoteWrite.hexBytes(
      "0A" + "BF01" +
        "0A4C" +
        "0A1A" + "0A0C" + "736572766963652E6E616D65" +
          "120A" + "0A08" + "636865636B6F7574" +
        "0A1E" + "0A13" + "736572766963652E696E7374616E63652E6964" +
          "1207" + "0A05" + "626F783A31" +
        "0A0E" + "0A06" + "726567696F6E" + "1204" + "0A02" + "6575" +
        "126F" +
        "0A00" +
        "123E" +
        "0A14" + "687474702E7365727665722E6475726174696F6E" +
        "1A01" + "73" +
        "3A23" +
        "0A1D" +
        "19" + "00CA9A3B00000000" +
        "21" + "000000000000" + "0C40" +
        "3A09" + "0A016B" + "1204" + "0A026575" +
        "1002" +
        "1801" +
        "122B" +
        "0A08" + "6370752E74656D70" +
        "2A1F" +
        "0A1D" +
        "19" + "0094357700000000" +
        "31" + "2A00000000000000" +
        "3A09" + "0A016B" + "1204" + "0A027573")
    val normalized = RemoteWrite.encode(translate(walk(payload)))
    val payloads = Seq(normalized).toDF("proto")
      .withColumn("recv_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    RemoteWrite.decode(payloads)
      .select(
        element_at(col("labels"), "__name__").as("metric"),
        element_at(col("labels"), "job").as("job"),
        element_at(col("labels"), "instance").as("instance"),
        element_at(col("labels"), "k").as("label_k"),
        col("ts_ms"), col("value"))
      .orderBy(col("metric"), col("ts_ms"))
  }

  /** a1zf — OTLP DELTA temporality ingests behind the opt-in (the
    * Prometheus 3.x flag-gated deltatocumulative path): a
    * hand-assembled request whose monotonic sum carries DELTA
    * temporality (1) and FOUR data points across two series; the
    * conversion folds each series' points in timestamp order into the
    * running total, the converted cumulative samples normalize through
    * the same a1i-gated generator as every push, and the DuckDB twin
    * re-runs the prefix sum over the hand-derived delta rows.
    */
  def otlpDeltaIngest(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // ExportMetricsServiceRequest, hand-assembled:
    // 0A B401  resource_metrics#1, 180 bytes:
    //   0A 1C  resource: attr service.name = "checkout"
    //   12 9301  scope_metrics, 147 bytes:
    //     0A 00  scope: empty (skipped)
    //     12 8E01  metric#1, 142 bytes:
    //       0A 09  name = "ops.count"
    //       3A 8001  sum, 128 bytes:
    //         0A 1D  data_point: 19 <1e9 ns> 21 <2.0> attr k=eu
    //         0A 1D  data_point: 19 <2e9 ns> 21 <3.5> attr k=eu
    //         0A 1D  data_point: 19 <3e9 ns> 21 <1.0> attr k=eu
    //         0A 1D  data_point: 19 <1e9 ns> 21 <4.0> attr k=us
    //         10 01  temporality = DELTA
    //         18 01  is_monotonic = true
    val payload = RemoteWrite.hexBytes(
      "0A" + "B401" +
        "0A1C" +
        "0A1A" + "0A0C" + "736572766963652E6E616D65" +
          "120A" + "0A08" + "636865636B6F7574" +
        "12" + "9301" +
        "0A00" +
        "12" + "8E01" +
        "0A09" + "6F70732E636F756E74" +
        "3A" + "8001" +
        "0A1D" + "19" + "00CA9A3B00000000" +
          "21" + "0000000000000040" +
          "3A09" + "0A016B" + "1204" + "0A026575" +
        "0A1D" + "19" + "0094357700000000" +
          "21" + "000000000000" + "0C40" +
          "3A09" + "0A016B" + "1204" + "0A026575" +
        "0A1D" + "19" + "005ED0B200000000" +
          "21" + "000000000000F03F" +
          "3A09" + "0A016B" + "1204" + "0A026575" +
        "0A1D" + "19" + "00CA9A3B00000000" +
          "21" + "0000000000001040" +
          "3A09" + "0A016B" + "1204" + "0A027573" +
        "1001" +
        "1801")
    val normalized = RemoteWrite.encode(
      translate(walk(payload), Some(new DeltaState)))
    val payloads = Seq(normalized).toDF("proto")
      .withColumn("recv_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    RemoteWrite.decode(payloads)
      .select(
        element_at(col("labels"), "__name__").as("metric"),
        element_at(col("labels"), "job").as("job"),
        element_at(col("labels"), "k").as("label_k"),
        col("ts_ms"), col("value"))
      .orderBy(col("metric"), col("label_k"), col("ts_ms"))
  }

  /** Oracle twin of [[otlpDeltaIngest]]: the hand-derived DELTA rows
    * through the same in-order prefix sum (eu: 2 → 5.5 → 6.5; us: 4).
    */
  val OtlpDeltaIngestSql: String =
    """WITH d(metric, job, label_k, ts_ms, v) AS (VALUES
      |  ('ops_count_total', 'checkout', 'eu', CAST(1000 AS BIGINT),
      |    CAST('2' AS DOUBLE)),
      |  ('ops_count_total', 'checkout', 'eu', CAST(2000 AS BIGINT),
      |    CAST('3.5' AS DOUBLE)),
      |  ('ops_count_total', 'checkout', 'eu', CAST(3000 AS BIGINT),
      |    CAST('1' AS DOUBLE)),
      |  ('ops_count_total', 'checkout', 'us', CAST(1000 AS BIGINT),
      |    CAST('4' AS DOUBLE)))
      |SELECT metric, job, label_k, ts_ms,
      |  SUM(v) OVER (PARTITION BY metric, label_k
      |    ORDER BY ts_ms) AS value
      |FROM d
      |ORDER BY metric, label_k, ts_ms""".stripMargin

  /** a1zg — OTLP DELTA temporality for EXPONENTIAL HISTOGRAMS behind
    * the same opt-in flag (upstream deltatocumulative's histogram arm,
    * the a1zf sum conversion's vector-valued twin): two delta pushes of
    * one series accumulate per-bucket running totals across requests,
    * and the accumulated state serves `histogram_quantile` IDENTICALLY
    * to a one-shot cumulative twin carrying the exact sums — both rows
    * ride the REAL path (translate → wire encode → decode → LWW family
    * registry → two-sided quantile walk). Points are built typed (the
    * wire walk itself is the a1q gate's subject).
    *
    * Hand-derivation for the oracle: pushes at scale 3 carry positive
    * buckets {off 0, [5,3]} then {off 2, [2,1]} (Prometheus indices
    * 1→5, 2→3 then 3→2, 4→1), counts 9+4, sums 3.5+1.25, zeros 1+1 →
    * merged count 13, zero 2, ladder [5,3,2,1]. φ=0.5: rank 6.5
    * crosses index 1 past the zero bucket's 2 → fraction
    * (6.5−2)/5 = 0.9 → q = 2^((1−1+0.9)/2³) = 2^0.1125.
    */
  def otlpDeltaHist(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def h(tsNano: Long, temporality: Int, count: Long, sum: Double,
        zero: Long, posOff: Int, pos: Vector[Long]): ExpoHist =
      ExpoHist("rpc.size", "By", temporality,
        Vector("service.name" -> "checkout"), Vector("k" -> "eu"),
        tsNano, count, sum, zero, 3, posOff, pos, 0, Vector.empty)
    val st = new DeltaState
    val deltas =
      translate(Decoded(Vector.empty,
        Vector(h(1000000000L, 1, 9, 3.5, 1, 0, Vector(5L, 3L)))),
        Some(st)) ++
      translate(Decoded(Vector.empty,
        Vector(h(2000000000L, 1, 4, 1.25, 1, 2, Vector(2L, 1L)))),
        Some(st))
    val cumTwin = translate(Decoded(Vector.empty,
      Vector(h(2000000000L, 2, 13, 4.75, 2, 0, Vector(5L, 3L, 2L, 1L)))))
    def served(series: Vector[RemoteWrite.Series], src: String): DataFrame = {
      val payloads = Seq(RemoteWrite.encode(series)).toDF("proto")
        .withColumn("recv_ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      RemoteWrite.familyQuantile(spark,
        RemoteWrite.histFamily(RemoteWrite.decodeHist(payloads)), 0.5)
        .select(lit(src).as("source"), col("metric"), col("label_k"),
          col("count"), col("zero_count"), col("sum"), col("q"))
    }
    served(deltas, "delta_converted")
      .unionByName(served(cumTwin, "cumulative_twin"))
      .orderBy(col("source"))
  }

  /** Oracle twin of [[otlpDeltaHist]]: the hand-derived accumulated
    * state (see the gate's derivation) under BOTH sources — the
    * converter must make the delta pushes indistinguishable from their
    * cumulative twin. The quantile is the pinned native interpolation
    * `2^0.1125` through the DetMath twin.
    */
  lazy val OtlpDeltaHistSql: String = {
    val interp = graft.functions.DetMath.exp2Sql("xq")
    s"""WITH q AS (
       |  SELECT $interp AS qv
       |  FROM (SELECT CAST('0.1125' AS DOUBLE) AS xq))
       |SELECT s.source, 'rpc_size_bytes' AS metric, 'eu' AS label_k,
       |  CAST(13 AS BIGINT) AS count, CAST(2 AS BIGINT) AS zero_count,
       |  CAST('4.75' AS DOUBLE) AS sum, q.qv AS q
       |FROM (VALUES ('cumulative_twin'), ('delta_converted')) s(source), q
       |ORDER BY s.source""".stripMargin
  }

  /** a1q — OTLP exponential histograms land in the NATIVE-HISTOGRAM
    * family: a hand-assembled `ExportMetricsServiceRequest` whose
    * metric carries an ExponentialHistogramDataPoint (fixed64
    * count/zero_count, sint32 scale, positive AND negative Buckets with
    * absolute counts), translated through the off-by-one index mapping
    * and the span/delta re-encoding into the SAME wire shape remote
    * write uses, then served by the family registry's two-sided
    * quantile walk — OTLP → native family → histogram_quantile, end to
    * end. The DuckDB oracle re-runs the whole walk from the
    * hand-mapped signed bucket relation.
    */
  def otlpExpoHist(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // ExportMetricsServiceRequest, hand-assembled:
    // 0A 76  resource_metrics#1, 118 bytes:
    //   0A 1C  resource, 28 bytes:
    //     0A 1A  attr: 0A 0C "service.name" 12 0A (0A 08 "checkout")
    //   12 56  scope_metrics, 86 bytes:
    //     12 54  metric#1, 84 bytes:
    //       0A 08  name = "req.size"
    //       1A 02  unit = "By"
    //       52 44  exponential_histogram, 68 bytes:
    //         0A 40  data_point, 64 bytes:
    //           0A 09  attr: 0A 01 "k" 12 04 (0A 02 "eu")
    //           19 <1e9 ns LE>          time = 1 s
    //           21 <12 LE fixed64>      count
    //           29 <4.25 LE double>     sum
    //           30 06                   scale: zigzag(3)
    //           39 <1 LE fixed64>       zero_count
    //           42 06 08 00 12 02 05 03 positive {offset 0, counts [5,3]}
    //             -> Prometheus buckets 1:5, 2:3 (index = offset+i+1)
    //           4A 05 08 02 12 01 03    negative {offset zigzag(1), counts [3]}
    //             -> Prometheus negative bucket 2: 3
    //         10 02  temporality = CUMULATIVE
    val payload = RemoteWrite.hexBytes(
      "0A76" +
        "0A1C" +
        "0A1A" + "0A0C" + "736572766963652E6E616D65" +
          "120A" + "0A08" + "636865636B6F7574" +
        "1256" +
        "1254" +
        "0A08" + "7265712E73697A65" +
        "1A02" + "4279" +
        "5244" +
        "0A40" +
        "0A09" + "0A016B" + "1204" + "0A026575" +
        "19" + "00CA9A3B00000000" +
        "21" + "0C00000000000000" +
        "29" + "0000000000001140" +
        "3006" +
        "39" + "0100000000000000" +
        "4206" + "0800" + "12020503" +
        "4A05" + "0802" + "120103" +
        "1002")
    val normalized = RemoteWrite.encode(translate(walk(payload)))
    val payloads = Seq(normalized).toDF("proto")
      .withColumn("recv_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    RemoteWrite.familyQuantile(spark,
      RemoteWrite.histFamily(RemoteWrite.decodeHist(payloads)), 0.9)
      .orderBy(col("metric"), col("label_k"))
  }

  /** Oracle twin of [[otlpExpoHist]]: the signed bucket relation mapped
    * by hand (OTLP positive {offset 0, [5, 3]} → Prometheus 1:5, 2:3;
    * negative {offset 1, [3]} → negative bucket 2:3), then the SAME
    * two-sided walk in SQL — rank 0.9·12 = 10.8 crosses positive
    * bucket 2 past (negtot 3 + zero 1 + bucket-1's 5) = 9.
    */
  lazy val OtlpExpoHistSql: String = {
    val interp = graft.functions.DetMath.exp2Sql("xq")
    s"""WITH f(metric, label_k, count, zero_count, sum) AS (VALUES
       |  ('req_size_bytes', 'eu', CAST(12 AS BIGINT), CAST(1 AS BIGINT),
       |   CAST('4.25' AS DOUBLE))),
       |bk(metric, label_k, side, bucket, c) AS (VALUES
       |  ('req_size_bytes', 'eu', 0, 2, CAST(3 AS BIGINT)),
       |  ('req_size_bytes', 'eu', 1, 1, CAST(5 AS BIGINT)),
       |  ('req_size_bytes', 'eu', 1, 2, CAST(3 AS BIGINT))),
       |bounds AS (${graft.operators.Metrics.NhBoundsSql}),
       |bw AS (
       |  SELECT bk.*, f.count, f.zero_count,
       |    side * 10000000 + CASE WHEN side = 0 THEN -bucket ELSE bucket END AS ord
       |  FROM bk JOIN f USING (metric, label_k)),
       |bw2 AS (
       |  SELECT bw.*,
       |    SUM(c) OVER (PARTITION BY metric, label_k ORDER BY ord) AS cum_run
       |  FROM bw),
       |bw3 AS (
       |  SELECT bw2.*,
       |    cum_run + CASE WHEN side = 1 THEN zero_count ELSE 0 END AS eff_cum
       |  FROM bw2),
       |pick AS (
       |  SELECT metric, label_k, side, bucket, ord,
       |    (CAST('0.9' AS DOUBLE) * CAST(count AS DOUBLE)
       |      - CAST(eff_cum - c AS DOUBLE)) / CAST(c AS DOUBLE) AS fr,
       |    ROW_NUMBER() OVER (PARTITION BY metric, label_k ORDER BY ord) AS rn
       |  FROM bw3
       |  WHERE CAST('0.9' AS DOUBLE) * CAST(count AS DOUBLE)
       |      > CAST(eff_cum - c AS DOUBLE)
       |    AND CAST('0.9' AS DOUBLE) * CAST(count AS DOUBLE)
       |      <= CAST(eff_cum AS DOUBLE)),
       |pq AS (
       |  SELECT metric, label_k,
       |    CASE WHEN side = 1 THEN $interp ELSE -($interp) END AS qv
       |  FROM (SELECT metric, label_k, side,
       |          (CASE WHEN side = 1 THEN CAST(bucket - 1 AS DOUBLE) + fr
       |                ELSE CAST(bucket AS DOUBLE) - fr END)
       |            / pow(2.0, CAST(3 AS DOUBLE)) AS xq
       |        FROM pick WHERE rn = 1)),
       |ls AS (
       |  SELECT w.metric, w.label_k, MAX(b.hi) AS last_hi
       |  FROM bw w JOIN bounds b ON b.bucket = w.bucket
       |  WHERE w.side = 1 GROUP BY 1, 2),
       |ng AS (
       |  SELECT metric, label_k,
       |    SUM(CASE WHEN side = 0 THEN c ELSE 0 END) AS negtot
       |  FROM bk GROUP BY 1, 2)
       |SELECT f.metric, f.label_k, f.count, f.zero_count, f.sum,
       |  CASE WHEN pq.qv IS NOT NULL THEN pq.qv
       |       WHEN CAST('0.9' AS DOUBLE) * CAST(f.count AS DOUBLE)
       |         <= CAST(COALESCE(ng.negtot, 0) + f.zero_count AS DOUBLE)
       |         THEN 0.0
       |       ELSE ls.last_hi END AS q
       |FROM f
       |LEFT JOIN pq ON pq.metric = f.metric AND pq.label_k = f.label_k
       |LEFT JOIN ls ON ls.metric = f.metric AND ls.label_k = f.label_k
       |LEFT JOIN ng ON ng.metric = f.metric AND ng.label_k = f.label_k
       |ORDER BY f.metric, f.label_k""".stripMargin
  }

  /** a1s — OTLP CLASSIC (explicit-bounds) histograms translate exactly
    * the way upstream's OTLP receiver does: into plain cumulative
    * `_bucket{le=…}` / `_sum` / `_count` sample series (prefix sums of
    * the per-bucket array, the `+Inf` bucket from the total), which
    * then ride the ordinary sample pipeline with no histogram-aware
    * code anywhere downstream. The hand-assembled payload carries
    * packed fixed64 bucket_counts and packed double explicit_bounds;
    * the DuckDB oracle is the hand-derived translated relation
    * (integral bounds render without the trailing `.0`, the text
    * convention).
    */
  /** The a1s/a1t shared payload — byte derivation in
    * [[otlpClassicHist]]'s comments.
    */
  private[graft] lazy val ClassicPayload: Array[Byte] = RemoteWrite.hexBytes(
    "0A6C" +
      "126A" +
      "1268" +
      "0A0B" + "7270632E6C6174656E6379" +
      "1A01" + "73" +
      "4A56" +
      "0A52" +
      "0A09" + "0A016B" + "1204" + "0A026575" +
      "19" + "00CA9A3B00000000" +
      "21" + "0600000000000000" +
      "29" + "0000000000001240" +
      "3218" + "030000000000000002000000000000000100000000000000" +
      "3A10" + "000000000000E03F" + "000000000000F03F" +
      "1002")

  def otlpClassicHist(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // ExportMetricsServiceRequest, hand-assembled:
    // 0A 6C  resource_metrics#1, 108 bytes (no resource — no job label):
    //   12 6A  scope_metrics, 106 bytes:
    //     12 68  metric#1, 104 bytes:
    //       0A 0B  name = "rpc.latency"
    //       1A 01  unit = "s"
    //       4A 56  histogram, 86 bytes:
    //         0A 52  data_point, 82 bytes:
    //           0A 09  attr: 0A 01 "k" 12 04 (0A 02 "eu")
    //           19 <1e9 ns LE>        time = 1 s
    //           21 <6 LE fixed64>     count
    //           29 <4.5 LE double>    sum
    //           32 18  packed fixed64 bucket_counts [3, 2, 1]
    //           3A 10  packed double explicit_bounds [0.5, 1.0]
    //         10 02  temporality = CUMULATIVE
    val normalized = RemoteWrite.encode(translate(walk(ClassicPayload)))
    val payloads = Seq(normalized).toDF("proto")
      .withColumn("recv_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    RemoteWrite.decode(payloads)
      .select(
        element_at(col("labels"), "__name__").as("metric"),
        element_at(col("labels"), "k").as("label_k"),
        coalesce(element_at(col("labels"), "le"), lit("")).as("le"),
        col("ts_ms"), col("value"))
      .orderBy(col("metric"), col("le"))
  }

  /** a1t — the classic WIRE family is queryable: the a1s payload's
    * translated `_bucket{le}` samples, last-write-wins per (series,
    * le), served by the b7-gated classic interpolation
    * ([[RemoteWrite.classicFamilyQuantile]]) — OTLP classic histogram
    * → plain pushed samples → histogram_quantile, end to end with no
    * histogram-aware code between the door and the quantile. The
    * DuckDB oracle re-runs the classic walk (lower bound 0 before the
    * first bucket; rank past the last finite bucket returns its
    * boundary) from the hand-derived cumulative buckets.
    */
  def otlpClassicQuantile(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val normalized = RemoteWrite.encode(translate(walk(ClassicPayload)))
    val payloads = Seq(normalized).toDF("proto")
      .withColumn("recv_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    RemoteWrite.classicFamilyQuantile(spark,
      RemoteWrite.decode(payloads), 0.8)
      .orderBy(col("metric"), col("label_k"))
  }

  /** Oracle twin of [[otlpClassicQuantile]]: rank 0.8·6 = 4.8 crosses
    * the le=1 bucket past le=0.5's cumulative 3 — the classic linear
    * interpolation `0.5 + (1−0.5)·(4.8−3)/(5−3)`, re-run in SQL from
    * the hand-derived buckets with the identical comparison casts.
    */
  val OtlpClassicQuantileSql: String =
    """WITH bk(metric, label_k, le, cum) AS (VALUES
      |  ('rpc_latency_seconds', 'eu', CAST('0.5' AS DOUBLE), CAST(3 AS BIGINT)),
      |  ('rpc_latency_seconds', 'eu', CAST('1.0' AS DOUBLE), CAST(5 AS BIGINT))),
      |n(metric, label_k, count) AS (VALUES
      |  ('rpc_latency_seconds', 'eu', CAST(6 AS BIGINT))),
      |r AS (
      |  SELECT bk.*, n.count,
      |    CAST('0.8' AS DOUBLE) * CAST(n.count AS DOUBLE) AS rnk,
      |    COALESCE(LAG(bk.le) OVER w2, 0.0) AS prev_le,
      |    COALESCE(LAG(bk.cum) OVER w2, 0) AS prev_cum,
      |    MAX(bk.le) OVER w3 AS max_le
      |  FROM bk JOIN n ON n.metric = bk.metric AND n.label_k = bk.label_k
      |  WINDOW w2 AS (PARTITION BY bk.metric, bk.label_k ORDER BY bk.le),
      |         w3 AS (PARTITION BY bk.metric, bk.label_k))
      |SELECT metric, label_k, count, q FROM (
      |  SELECT metric, label_k, count,
      |    prev_le + (le - prev_le) * (rnk - CAST(prev_cum AS DOUBLE))
      |      / CAST(cum - prev_cum AS DOUBLE) AS q
      |  FROM r
      |  WHERE CAST(cum AS DOUBLE) >= rnk AND CAST(prev_cum AS DOUBLE) < rnk
      |  UNION ALL
      |  SELECT metric, label_k, count, max_le AS q
      |  FROM r WHERE le = max_le AND rnk > (
      |    SELECT CAST(MAX(cum) AS DOUBLE) FROM bk b2
      |    WHERE b2.metric = r.metric AND b2.label_k = r.label_k))
      |ORDER BY metric, label_k""".stripMargin

  /** a1ze — the NHCB CONVERTER end to end (Prometheus 3.x
    * `convert_classic_histograms`): the a1s classic payload's
    * translated `_bucket{le}` ladder converts into a native
    * custom-bucket family (schema −53, `custom_values` = the finite
    * bounds, non-cumulative sparse buckets + the +Inf arm) and serves
    * through [[RemoteWrite.nhcbFamilyQuantile]]'s native dispatch —
    * the SAME 0.95 the classic walk (a1t) answers, proving the
    * conversion is lossless for quantiles. The DuckDB twin re-derives
    * the rank walk from the custom bounds and non-cumulative counts.
    */
  def otlpNhcbQuantile(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val normalized = RemoteWrite.encode(translate(walk(ClassicPayload)))
    val payloads = Seq(normalized).toDF("proto")
      .withColumn("recv_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val fam = RemoteWrite.convertClassicToNhcb(RemoteWrite.decode(payloads))
    RemoteWrite.nhcbFamilyQuantile(spark, fam, 0.8)
      .orderBy(col("metric"), col("label_k"))
  }

  /** Oracle twin of [[otlpNhcbQuantile]]: the converted NHCB relation
    * by hand — custom bounds [0.5, 1.0], non-cumulative buckets
    * [3, 2, 1] (the +Inf arm last) — through the custom-bucket rank
    * walk: rank 0.8·6 = 4.8 lands in bucket 1 ((0.5, 1.0]), linear
    * interpolation `0.5 + (1.0−0.5)·(4.8−3)/2 = 0.95`.
    */
  val OtlpNhcbQuantileSql: String =
    """WITH nh(metric, label_k, sch, bucket, c, lo, hi) AS (VALUES
      |  ('rpc_latency_seconds', 'eu', -53, 0, CAST(3 AS BIGINT),
      |    CAST('0' AS DOUBLE), CAST('0.5' AS DOUBLE)),
      |  ('rpc_latency_seconds', 'eu', -53, 1, CAST(2 AS BIGINT),
      |    CAST('0.5' AS DOUBLE), CAST('1.0' AS DOUBLE)),
      |  ('rpc_latency_seconds', 'eu', -53, 2, CAST(1 AS BIGINT),
      |    CAST('1.0' AS DOUBLE), NULL)),
      |cnt AS (SELECT metric, label_k, CAST(SUM(c) AS BIGINT) AS count
      |  FROM nh GROUP BY metric, label_k),
      |r AS (SELECT nh.*, cnt.count,
      |  CAST('0.8' AS DOUBLE) * CAST(cnt.count AS DOUBLE) AS rnk,
      |  SUM(c) OVER (PARTITION BY nh.metric, nh.label_k
      |    ORDER BY bucket) AS cum
      |  FROM nh JOIN cnt ON cnt.metric = nh.metric
      |    AND cnt.label_k = nh.label_k)
      |SELECT metric, label_k, sch AS schema, count,
      |  lo + (hi - lo) * (rnk - CAST(cum - c AS DOUBLE))
      |    / CAST(c AS DOUBLE) AS q
      |FROM r
      |WHERE hi IS NOT NULL AND CAST(cum AS DOUBLE) >= rnk
      |  AND CAST(cum - c AS DOUBLE) < rnk
      |ORDER BY metric, label_k""".stripMargin

  /** Oracle twin of [[otlpClassicHist]]: the translated relation by
    * hand — cumulative buckets 3, 3+2 = 5, +Inf = 6; `_sum` 4.5;
    * `_count` 6; bound 1.0 renders as `1`.
    */
  val OtlpClassicHistSql: String =
    """SELECT * FROM (VALUES
      |  ('rpc_latency_seconds_bucket', 'eu', '+Inf', CAST(1000 AS BIGINT),
      |    CAST('6.0' AS DOUBLE)),
      |  ('rpc_latency_seconds_bucket', 'eu', '0.5', CAST(1000 AS BIGINT),
      |    CAST('3.0' AS DOUBLE)),
      |  ('rpc_latency_seconds_bucket', 'eu', '1', CAST(1000 AS BIGINT),
      |    CAST('5.0' AS DOUBLE)),
      |  ('rpc_latency_seconds_count', 'eu', '', CAST(1000 AS BIGINT),
      |    CAST('6.0' AS DOUBLE)),
      |  ('rpc_latency_seconds_sum', 'eu', '', CAST(1000 AS BIGINT),
      |    CAST('4.5' AS DOUBLE))
      |) w(metric, label_k, le, ts_ms, value)
      |ORDER BY metric, le""".stripMargin

  /** Oracle twin of [[otlpIngest]]: the translated relation derived BY
    * HAND from the wire spec above — `http.server.duration` (unit `s`,
    * monotonic cumulative sum) → `http_server_duration_seconds_total`;
    * `cpu.temp` gauge → `cpu_temp` with the int point widened; job /
    * instance from the resource identity attributes; `region` dropped.
    */
  val OtlpIngestSql: String =
    """SELECT * FROM (VALUES
      |  ('cpu_temp', 'checkout', 'box:1', 'us', CAST(2000 AS BIGINT),
      |    CAST('42.0' AS DOUBLE)),
      |  ('http_server_duration_seconds_total', 'checkout', 'box:1', 'eu',
      |    CAST(1000 AS BIGINT), CAST('3.5' AS DOUBLE))
      |) w(metric, job, instance, label_k, ts_ms, value)
      |ORDER BY metric, ts_ms""".stripMargin

  /** a1u — OTLP SUMMARIES translate per the upstream compat spec: each
    * pre-computed quantile becomes a gauge series on the BASE
    * (unit-suffixed) name with a `quantile` label, plus `_sum` and
    * `_count` — the classic Prometheus summary exposition, riding the
    * ordinary sample pipeline with no summary-aware code downstream.
    * The hand-assembled payload carries two ValueAtQuantile messages,
    * fixed64 count, double sum, and a resource identity; the DuckDB
    * oracle is the hand-derived translated relation.
    */
  def otlpSummary(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // ExportMetricsServiceRequest, hand-assembled:
    // 0A 8401  resource_metrics#1, 132 bytes:
    //   0A 1C  resource, 28 bytes:
    //     0A 1A  attr: 0A 0C "service.name" 12 0A (0A 08 "checkout")
    //   12 64  scope_metrics, 100 bytes:
    //     12 62  metric#1, 98 bytes:
    //       0A 0B  name = "rpc.latency"
    //       1A 01  unit = "s"
    //       5A 50  summary, 80 bytes:
    //         0A 4E  data_point, 78 bytes:
    //           19 <1e9 ns LE>         time = 1 s
    //           21 <10 LE fixed64>     count
    //           29 <2.5 LE double>     sum
    //           32 12  quantile_value, 18 bytes:
    //             09 <0.5 LE: 0x3FE0000000000000>  quantile
    //             11 <0.25 LE: 0x3FD0000000000000> value
    //           32 12  quantile_value, 18 bytes:
    //             09 <0.9 LE: 0x3FECCCCCCCCCCCCD>  quantile
    //             11 <4.5 LE: 0x4012000000000000>  value
    //           3A 09  attr: 0A 01 "k" 12 04 (0A 02 "eu")
    val payload = RemoteWrite.hexBytes(
      "0A8401" +
        "0A1C" +
        "0A1A" + "0A0C" + "736572766963652E6E616D65" +
          "120A" + "0A08" + "636865636B6F7574" +
        "1264" +
        "1262" +
        "0A0B" + "7270632E6C6174656E6379" +
        "1A01" + "73" +
        "5A50" +
        "0A4E" +
        "19" + "00CA9A3B00000000" +
        "21" + "0A00000000000000" +
        "29" + "0000000000000440" +
        "3212" + "09000000000000E03F" + "11000000000000D03F" +
        "3212" + "09CDCCCCCCCCCCEC3F" + "110000000000001240" +
        "3A09" + "0A016B" + "1204" + "0A026575")
    val normalized = RemoteWrite.encode(translate(walk(payload)))
    val payloads = Seq(normalized).toDF("proto")
      .withColumn("recv_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    RemoteWrite.decode(payloads)
      .select(
        element_at(col("labels"), "__name__").as("metric"),
        element_at(col("labels"), "job").as("job"),
        coalesce(element_at(col("labels"), "quantile"), lit(""))
          .as("quantile"),
        element_at(col("labels"), "k").as("label_k"),
        col("ts_ms"), col("value"))
      .orderBy(col("metric"), col("quantile"))
  }

  /** Oracle twin of [[otlpSummary]]: the translated relation by hand —
    * quantile gauges on the suffixed base name (`quantile` labels
    * "0.5"/"0.9"), `_sum` 2.5, `_count` 10.
    */
  val OtlpSummarySql: String =
    """SELECT * FROM (VALUES
      |  ('rpc_latency_seconds', 'checkout', '0.5', 'eu',
      |    CAST(1000 AS BIGINT), CAST('0.25' AS DOUBLE)),
      |  ('rpc_latency_seconds', 'checkout', '0.9', 'eu',
      |    CAST(1000 AS BIGINT), CAST('4.5' AS DOUBLE)),
      |  ('rpc_latency_seconds_count', 'checkout', '', 'eu',
      |    CAST(1000 AS BIGINT), CAST('10.0' AS DOUBLE)),
      |  ('rpc_latency_seconds_sum', 'checkout', '', 'eu',
      |    CAST(1000 AS BIGINT), CAST('2.5' AS DOUBLE))
      |) w(metric, job, quantile, label_k, ts_ms, value)
      |ORDER BY metric, quantile""".stripMargin
}
