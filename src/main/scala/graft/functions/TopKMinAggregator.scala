package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded "K smallest distinct strings" typed `Aggregator`.
  *
  * Replaces the distinct + per-key window-sort plan for winnowing-style
  * fingerprints (SURVEY.md §2 x12): the buffer is a sorted array of at
  * most K distinct values, `reduce` is an insertion into that bounded
  * buffer, and `merge` is a bounded sorted-merge — so partial
  * aggregation combines map-side and exactly ONE ≤K-element row per doc
  * crosses the shuffle. At 100 TB this turns a global
  * shuffle+sort of every (doc, shingle-hash) row into a single hash
  * aggregate whose wire cost is O(docs × K), independent of document
  * length.
  *
  * Duplicate values are ignored (the K smallest DISTINCT values), which
  * also subsumes the upstream `.distinct()` pass.
  */
object TopKMinAggregator {

  case class Buf(vals: Array[String])

  /** Finishes to the K values joined ascending with `|` — ready for a
    * final `md5`, and avoids needing an array output encoder.
    */
  def apply(k: Int): Aggregator[String, Buf, String] =
    new Aggregator[String, Buf, String] {

      override def zero: Buf = Buf(Array.empty)

      override def reduce(b: Buf, v: String): Buf = {
        if (v == null) return b
        val a = b.vals
        val n = a.length
        // full and not smaller than the current max => no-op
        if (n == k && a(n - 1) <= v) return b
        var i = 0
        while (i < n && a(i) < v) i += 1
        if (i < n && a(i) == v) return b // already present
        val m = math.min(n + 1, k)
        val out = new Array[String](m)
        System.arraycopy(a, 0, out, 0, i)
        out(i) = v
        System.arraycopy(a, i, out, i + 1, m - i - 1)
        Buf(out)
      }

      override def merge(x: Buf, y: Buf): Buf = {
        val a = x.vals; val b = y.vals
        if (a.isEmpty) return y
        if (b.isEmpty) return x
        val out = new Array[String](math.min(a.length + b.length, k))
        var i = 0; var j = 0; var o = 0
        while (o < out.length && (i < a.length || j < b.length)) {
          val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
          val v = if (takeA) a(i) else b(j)
          if (takeA) i += 1 else j += 1
          // skip duplicates across the two sorted runs
          if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
        }
        Buf(if (o == out.length) out else out.take(o))
      }

      override def finish(b: Buf): String = b.vals.mkString("|")

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }
}
