package graft.promql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TSDB admin surface — Prometheus's `/api/v1/admin/tsdb`
  * endpoints (delete_series / clean_tombstones / snapshot),
  * re-expressed over the engine's relational head.
  *
  * Upstream semantics (the public admin API contract):
  *  - `delete_series` records TOMBSTONES — (series matchers × time
  *    range) — and every subsequent query excludes the covered samples
  *    immediately; the data stays on disk until compaction.
  *  - `clean_tombstones` applies the pending tombstones physically and
  *    clears them.
  *  - `snapshot` writes a consistent copy of the current (tombstone-
  *    respecting) data to a new directory and returns its name.
  *
  * Spark-first shape: a tombstone is a pure COLUMN PREDICATE over the
  * metricEvents view (the same compiled `match[]` filter the series
  * endpoint uses — [[Api.matchFilter]]), so exclusion is one
  * `filter(NOT …)` folded into every consumer at the scan:
  * predicate-pushdown carries it into the parquet/cached reads, no
  * join, no shuffle, nothing new materializes at delete time. The
  * rollup pyramid is aggregated state and cannot re-filter — a delete
  * therefore EVICTS the faces ([[graft.operators.Downsample
  * .evictRollups]]); they rebuild lazily from the filtered head, so
  * routed answers stay tombstone-exact (a real Prometheus likewise
  * re-compacts blocks touched by tombstones). `clean_tombstones`
  * compacts the head: the filtered relation replaces the cache entry
  * (at 100 TB: the silver-table rewrite), and the tombstone list
  * empties.
  *
  * State is per (session, corpus dir) like every engine cache, and the
  * GATES never touch it — a1m compiles its tombstones inline (pure), so
  * correctness runs stay order-independent; the mutable store is
  * exercised by `AdminApiSpec` with eager reads and try/finally resets.
  */
object Admin {

  /** One `delete_series` call: the OR of its `match[]` selectors,
    * bounded by the optional sample-time window — exactly the
    * predicate shape of [[Api.matchFilter]].
    */
  final case class Tombstone(selectors: Seq[String],
      startS: Option[Long], endS: Option[Long])

  private val store = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Vector[Tombstone]]()

  /** Record a tombstone. The selector set compiles EAGERLY so a
    * malformed `match[]` is the caller's HTTP 400, never a poisoned
    * store; the pyramid faces evict so no rollup serves deleted
    * samples.
    */
  def deleteSeries(spark: SparkSession, dir: String, selectors: Seq[String],
      startS: Option[Long] = None, endS: Option[Long] = None): Unit = {
    require(selectors.nonEmpty, "missing required parameter 'match[]'")
    Api.matchFilter(selectors, startS, endS) // validate now, fail loud
    val k = (spark, dir)
    store.compute(k, (_, v) => {
      if (v == null) // first tombstone for this key: one evictor, ever
        graft.operators.SessionCaches.onApplicationEnd(spark)(() =>
          store.remove(k))
      (if (v == null) Vector.empty else v) :+
        Tombstone(selectors, startS, endS)
    })
    graft.operators.Downsample.evictRollups(spark, dir)
    ResultsCache.invalidate(spark, dir)
  }

  def tombstones(spark: SparkSession, dir: String): Seq[Tombstone] =
    Option(store.get((spark, dir))).getOrElse(Vector.empty)

  /** The combined exclusion predicate, or None when nothing is
    * tombstoned (the fast path every untouched corpus takes).
    */
  def predicate(spark: SparkSession, dir: String): Option[Column] =
    tombstones(spark, dir) match {
      case Seq() => None
      case ts => Some(ts.map(t =>
        Api.matchFilter(t.selectors, t.startS, t.endS)).reduce(_ || _))
    }

  /** Tombstone-respecting view of an events relation — what
    * [[graft.operators.Metrics.metricEvents]] folds in. `NOT(pred)`
    * alone would also drop rows where the predicate is NULL (3-valued
    * logic: a NULL label under a regex matcher), which upstream does
    * not delete — coalesce pins those rows as kept.
    */
  private[graft] def applyTombstones(spark: SparkSession, dir: String,
      events: DataFrame): DataFrame =
    predicate(spark, dir) match {
      case None => events
      case Some(p) => events.filter(!coalesce(p, lit(false)))
    }

  /** Apply pending tombstones PHYSICALLY and clear them: the head
    * compacts to the filtered relation ([[graft.operators.Metrics
    * .compactHead]] — materialize child, swap, release parent), the
    * faces rebuild from the compacted head. Queries answer identically
    * before and after (spec-pinned); only the storage changed.
    */
  def cleanTombstones(spark: SparkSession, dir: String): Unit = {
    predicate(spark, dir).foreach { p =>
      graft.operators.Metrics.compactHead(spark, dir,
        !coalesce(p, lit(false)))
    }
    store.remove((spark, dir))
    graft.operators.Downsample.evictRollups(spark, dir)
    ResultsCache.invalidate(spark, dir)
  }

  /** Write a consistent snapshot — the tombstone-respecting head plus
    * every materialized rollup face — and return its directory name
    * (upstream returns the new block dir's name under `data/snapshots`;
    * this engine's data dir is the read-only corpus, so snapshots land
    * in their own temp root). The head parquet round-trips through
    * `tools/Materialize`'s silver schema, so a snapshot can re-seed an
    * engine directly.
    */
  def snapshot(spark: SparkSession, dir: String): String = {
    val stamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val root = java.nio.file.Files.createTempDirectory(s"graft-snapshot-")
    val name = s"$stamp-${java.lang.Long.toHexString(root.hashCode().toLong & 0xffffffffL)}"
    val out = root.resolve(name)
    graft.operators.Metrics.metricEvents(spark, dir)
      .write.mode("overwrite").parquet(out.resolve("head").toString)
    graft.operators.Downsample.RollupFaces.foreach { face =>
      graft.operators.Downsample.rollupFace1h(spark, dir, face)
        .write.mode("overwrite").parquet(out.resolve(s"face_$face").toString)
    }
    out.toString
  }

  /** Test/repl helper: forget tombstones WITHOUT applying them. */
  private[graft] def reset(spark: SparkSession, dir: String): Unit = {
    store.remove((spark, dir))
    graft.operators.Downsample.evictRollups(spark, dir)
    ResultsCache.invalidate(spark, dir)
  }

  // ---- the a1m gate: delete_series semantics, hash-gated ----

  private[graft] val GateTombstones = Seq(
    Tombstone(Seq("""purchase{k=~"1.*"}"""), None, None),
    Tombstone(Seq("click"), None, Some(1705276800L))) // ≤ 2024-01-15

  /** a1m — tombstone exclusion over the head, PURE (no store): two
    * deletes — a whole-series-set matcher (`purchase{k=~"1.*"}`, all
    * time) and a time-bounded family delete (`click` up to 2024-01-15)
    * — then the counter snapshot over what remains. The DuckDB oracle
    * re-states both tombstones as independent SQL, so the gate fails if
    * the matcher compile, the time bound, or the NULL-keep rule ever
    * drifts.
    */
  def deletedCounterSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val p = GateTombstones.map(t =>
      Api.matchFilter(t.selectors, t.startS, t.endS)).reduce(_ || _)
    graft.operators.Metrics.metricEvents(spark, dir)
      .filter(!coalesce(p, lit(false)))
      .filter(col("kind") === "counter" && col("value") >= 0)
      .groupBy(col("name"), col("label_k"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("value"),
        count(lit(1)).as("n_increments"))
      .orderBy(col("name"), col("label_k"))
  }

  lazy val DeletedCounterSnapshotSql: String =
    s"""WITH m AS (${graft.operators.Metrics.MetricEventsSql})
       |SELECT name, label_k,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value,
       |  COUNT(*) AS n_increments
       |FROM m
       |WHERE kind = 'counter' AND value >= 0
       |  AND NOT COALESCE(
       |    (name = 'purchase' AND regexp_matches(label_k, '^(?:1.*)$$'))
       |    OR (name = 'click' AND epoch_us(ts) <= CAST(1705276800 AS BIGINT) * 1000000),
       |    FALSE)
       |GROUP BY name, label_k
       |ORDER BY name, label_k""".stripMargin
}
