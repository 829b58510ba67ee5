package graft.model

/** Prometheus's STALENESS MARKER — the sample upstream appends to a
  * series at the first scrape that no longer exposes it (or to every
  * series of a failed target), so instant reads cut the series off
  * immediately instead of serving its last value through the lookback
  * window. The reference feeds a pull-scraping Prometheus server
  * (`/root/reference/prometheus.cpp:73` opens the pull endpoint); the
  * scraping side's marker contract is public.
  *
  * Engine-wide semantics (mirroring upstream):
  *  - INSTANT reads (LWW / lookback): a series whose latest event at
  *    or before the instant is a marker contributes NOTHING; a newer
  *    real sample revives it.
  *  - RANGE functions (`*_over_time`, `rate`, …): markers are
  *    INVISIBLE — filtered out of the window's samples entirely.
  *  - ROLLUPS: value fields (`cnt`/`sum_dec`/`vmin`/`vmax`/`vfirst`/
  *    `vlast`) are computed over real samples only; the bucket carries
  *    the latest marker's anchor as `stale_at` so the pyramid's
  *    instant tier can cut series without re-reading raw events.
  *
  * REPRESENTATION — one deliberate deviation from upstream. Upstream
  * reserves a SPECIFIC quiet-NaN payload ([[Bits]]) so an ordinary NaN
  * sample stays distinguishable from a marker. This engine EMITS that
  * exact pattern (batch encoder rows preserve it bit-for-bit, pinned
  * in StalenessSpec) but DETECTS markers with plain `isnan`: Spark
  * canonicalizes NaN payloads at two independent layers — the parquet
  * writer (a written file holds 0x7ff8… where the row held 0x7ff0…2)
  * and the streaming tier (MemoryStream → sink rows arrive
  * canonicalized) — both verified empirically, so the bit distinction
  * cannot survive either the durable format or the live stream.
  * Treating ALL NaN as staleness is therefore the convention: the
  * scrape parser's line regex can never produce NaN from a payload,
  * the parquet corpus carries none, and remote-write receivers in the
  * wild make the same `isNaN` simplification because markers are, in
  * practice, the only NaN crossing that wire.
  *
  * TRANSPORT CAVEAT: `lit(Marker)` also collapses the payload (Literal
  * codegen has no Java NaN literal) — when emitting markers, carry the
  * value as encoder DATA (a case-class / tuple field), never as a
  * Column literal, so live consumers still see upstream's exact bits.
  */
object Stale {
  /** Upstream's `value.StaleNaN` bit pattern — what the engine EMITS. */
  val Bits: Long = 0x7ff0000000000002L

  /** The marker as a double (NaN to every arithmetic op). */
  val Marker: Double = java.lang.Double.longBitsToDouble(Bits)

  /** Scalar detection — any NaN (see REPRESENTATION above). */
  def isMarker(v: Double): Boolean = v.isNaN
}
