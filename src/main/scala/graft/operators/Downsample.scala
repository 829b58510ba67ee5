package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TSDB downsampling and compaction — the long-range serving tier above
  * the raw samples the reference emits (`prometheus.cpp:256-306` ships
  * raw scrape samples; every production TSDB stacks resolution rollups
  * on top of exactly that stream to serve month/year dashboards without
  * touching raw data).
  *
  * A rollup row summarizes one (series, aligned time bucket): sample
  * count, EXACT decimal sum (the cents convention every aggregate in
  * this engine uses), min/max, and the first/last sample with its
  * (ts, event_id) anchor — the anchors are what make rollups
  * COMPOSABLE: a coarser rollup is a pure re-aggregation of a finer one
  * (`cnt`/`sum` add, `min`/`max` nest, first/last ride their anchors),
  * so compaction never re-reads raw events. [[DownsampleSpec]] pins the
  * law `compact(rollup(fine), coarse) == rollup(coarse)` field-for-field
  * and the registered p87 gate hash-checks the compacted output against
  * a DuckDB oracle computed DIRECTLY from raw events.
  *
  * 100 TB design: one hash-aggregate shuffle over the events relation
  * (map-side combine does the heavy lifting — output is
  * series × buckets, a ~10⁴–10⁵× reduction on real telemetry densities);
  * each further compaction level shuffles only the previous rollup.
  * Serving: a dashboard whose window and step are bucket-aligned can
  * evaluate sum/count/min/max panels from the rollup relation alone —
  * the alignment requirement is exactly Thanos/M3's, and the p87 law is
  * the proof the swap is lossless for aligned reads.
  */
object Downsample {

  private val Key = Seq("name", "label_k", "label_instance", "kind")

  /** Session-scoped cache of the pyramid's FINEST level per (session,
    * dir, face): at test scale an in-memory columnar relation, at
    * 100 TB the analog is the materialized rollup table every TSDB
    * keeps on disk. Every pyramid read (panels, the router, the
    * serving path) starts from these, so repeat dashboard queries
    * never re-aggregate raw events — and the SERVED plans scan the
    * rollup relation, not the event log.
    */
  private val rollupCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def cached(spark: SparkSession, dir: String, face: String)(
      build: => DataFrame): DataFrame =
    rollupCache.computeIfAbsent((spark, dir, face), k => {
      SessionCaches.onApplicationEnd(spark)(() => rollupCache.remove(k))
      build.persist()
    })

  /** The pyramid's silver-table swap (the rollup face of
    * `Metrics.seedEvents`): point one face's cache entry at an
    * externally MATERIALIZED relation — every pyramid read (panels,
    * router, serving path) consumes it without knowing the source moved
    * from compute+persist to a parquet read. `tools/Materialize` writes
    * the faces; `MaterializeSpec` pins identical routed answers either
    * way. This is the restart story a real TSDB has: rollup blocks
    * live on disk, not in a session cache.
    */
  private[graft] def seedRollup(spark: SparkSession, dir: String,
      face: String, silver: DataFrame): Unit = {
    require(RollupFaces.contains(face), s"unknown rollup face '$face'")
    rollupCache.put((spark, dir, face), silver)
    SessionCaches.onApplicationEnd(spark)(() =>
      rollupCache.remove((spark, dir, face)))
  }

  private[graft] val RollupFaces = Seq("base", "hist", "nhTot", "nhBk")

  /** One face's cached 1h relation by name — what `tools/Materialize`
    * writes to disk.
    */
  private[graft] def rollupFace1h(spark: SparkSession, dir: String,
      face: String): DataFrame = face match {
    case "base" => rollup1hCached(spark, dir)
    case "hist" => histRollup1hCached(spark, dir)
    case "nhTot" => nhTot1hCached(spark, dir)
    case "nhBk" => nhBk1hCached(spark, dir)
  }

  /** Drop the cached (possibly persisted) faces of `(spark, dir)` —
    * the restart simulation `MaterializeSpec` drives before seeding.
    * The shared nh-observation relation evicts with them (it derives
    * from the same events view, so a tombstone must not keep serving
    * deleted series through any cached derivation).
    */
  private[graft] def evictRollups(spark: SparkSession, dir: String): Unit = {
    RollupFaces.foreach { face =>
      Option(rollupCache.remove((spark, dir, face)))
        .foreach(df => if (df.storageLevel.useMemory) df.unpersist())
    }
    Option(nhObsCache.remove((spark, dir))).foreach(_.unpersist())
  }

  /** Session-cached NH-BUCKETIZED observation relation: every
    * histogram-kind observation with its sparse exponential bucket id
    * (null out of the literal bounds' range) and zero flag — ONE
    * scalar bucketization pass per (session, sf), shared by the
    * pyramid's native faces ([[nhTotRollupRaw]]/[[nhBkRollupRaw]], the
    * p90/p91 path) and the dense-grid native quantile
    * ([[graft.promql.Compiler]] gridNativeHqInstants, the p82 path).
    * The TSDB analog: bucketize once at ingest, not once per reader.
    * Evicted with the rollup faces on every admin mutation.
    */
  private val nhObsCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  /** Silver swap for the nh-observation relation (the [[seedRollup]]
    * convention): point the cache at an externally materialized copy —
    * the pyramid's nh faces and the dense-grid native quantile consume
    * it without knowing the source moved from compute+persist to a
    * parquet read.
    */
  private[graft] def seedNhObs(spark: SparkSession, dir: String,
      silver: DataFrame): Unit = {
    require(silver.columns.toSeq == Seq("name", "label_k",
      "label_instance", "ts", "value", "bucket", "iszero"),
      s"silver nh-obs schema ${silver.columns.toSeq}")
    nhObsCache.put((spark, dir), silver)
    SessionCaches.onApplicationEnd(spark)(() =>
      nhObsCache.remove((spark, dir)))
  }

  private[graft] def nhObsCached(spark: SparkSession,
      dir: String): DataFrame =
    nhObsCache.computeIfAbsent((spark, dir), k => {
      SessionCaches.onApplicationEnd(spark)(() => nhObsCache.remove(k))
      Metrics.metricEvents(spark, dir)
        .filter(col("kind") === "histogram")
        .select(col("name"), col("label_k"), col("label_instance"),
          col("ts"), col("value"),
          when(col("value") > Metrics.NhLoMin &&
            col("value") <= Metrics.NhHiMax,
            Metrics.nhBucketCol(col("value"))).as("bucket"),
          (col("value") === 0.0).as("iszero"))
        .persist()
    })

  /** The cached 1h composition-carrying rollup ([[rollupRaw]]). */
  private[graft] def rollup1hCached(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "base")(rollupRaw(spark, dir, 3600L))

  /** The cached 1h classic-histogram ladder rollup ([[histRollupRaw]]). */
  private[graft] def histRollup1hCached(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "hist")(histRollupRaw(spark, dir, 3600L))

  /** The cached 1h native-histogram totals face ([[nhTotRollupRaw]]). */
  private[graft] def nhTot1hCached(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "nhTot")(nhTotRollupRaw(spark, dir, 3600L))

  /** The cached 1h native-histogram bucket face ([[nhBkRollupRaw]]). */
  private[graft] def nhBk1hCached(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "nhBk")(nhBkRollupRaw(spark, dir, 3600L))

  /** Materialize all four 1h rollup faces (the pyramid's silver tables,
    * shared by p86–p102/b7b and the recorded panels) — the Bench/
    * TimeQuery warm-up entry, so the first pyramid query's number
    * measures its panel plan, not the cache builds.
    */
  private[graft] def warmRollups(spark: SparkSession, dir: String): Unit = {
    rollup1hCached(spark, dir).count()
    histRollup1hCached(spark, dir).count()
    nhTot1hCached(spark, dir).count()
    nhBk1hCached(spark, dir).count()
  }

  // Bucket membership is (b·res, (b+1)·res] — the CLOSED-RIGHT
  // convention PromQL's range selector (t−W, t] uses, so an aligned
  // pyramid window is exactly a run of whole buckets and rollup-served
  // answers match the raw paths bit-for-bit, boundary samples included
  // (a sample at exactly b·res belongs to the bucket ENDING there).
  // Index = ceil(ts/res) − 1, in integer `div` (not double floor(/):
  // µs epochs sit near 2^50 and the arithmetic must stay exact).
  private def bucketCol(resS: Long): Column = {
    val resUs = resS * 1000000L
    expr(s"(((unix_micros(ts) + ${resUs - 1L}) div $resUs) - 1) * $resS")
      .cast("long").as("bucket_s")
  }

  /** The composition-carrying rollup: exact decimal `sum_dec` and the
    * (ts_us, event_id) anchors of the first/last samples, which
    * [[compact]] needs to re-aggregate losslessly. Not the serving
    * face — [[rollup]] casts/projects for that.
    *
    * STALENESS-AWARE ([[graft.model.Stale]]): marker rows are excluded
    * from every value field (`cnt`/`sum_dec`/`vmin`/`vmax`/first/last)
    * — range functions never see markers, upstream's semantics — and
    * the bucket carries the latest marker's anchor as `stale_at` so
    * the pyramid's instant/LWW tier can cut series at the marker
    * without re-reading raw events. A bucket holding only markers
    * keeps `cnt = 0` and null value fields but a non-null `stale_at`.
    */
  private[graft] def rollupRaw(spark: SparkSession, dir: String,
      resS: Long): DataFrame =
    rollupRawOf(Metrics.metricEvents(spark, dir), resS)

  /** [[rollupRaw]] over an arbitrary events-adapter relation — the
    * shared core the b42 staleness gate drives with a marker-injected
    * feed (the dir-based face can't carry markers; the parquet corpus
    * has none).
    */
  private[graft] def rollupRawOf(events: DataFrame, resS: Long): DataFrame = {
    require(resS > 0, "rollup resolution must be positive")
    val st = graft.plans.StaleExprs.isStaleC(col("value"))
    val pre = events
      .withColumn("bucket_s", bucketCol(resS))
      .withColumn("ts_us", unix_micros(col("ts")))
      // a real sample's (anchor, value) tuple — null for a marker row,
      // so every value aggregate below skips markers by construction
      // ((ts_us, event_id) is unique, so struct min/max == the anchored
      // min_by/max_by and `value` never tiebreaks)
      .withColumn("_f", when(!st,
        struct(col("ts_us"), col("event_id"), col("value"))))
      .withColumn("_m", when(st,
        struct(col("ts_us"), col("event_id"))))
    val fMin = min(col("_f"))
    val fMax = max(col("_f"))
    pre.groupBy((Key :+ "bucket_s").map(col): _*)
      .agg(
        count(col("_f")).as("cnt"),
        sum(col("_f").getField("value").cast(DecimalType(38, 2)))
          .as("sum_dec"),
        min(col("_f").getField("value")).as("vmin"),
        max(col("_f").getField("value")).as("vmax"),
        fMin.getField("value").as("vfirst"),
        when(fMin.isNotNull, struct(fMin.getField("ts_us").as("ts_us"),
          fMin.getField("event_id").as("event_id"))).as("first_at"),
        fMax.getField("value").as("vlast"),
        when(fMax.isNotNull, struct(fMax.getField("ts_us").as("ts_us"),
          fMax.getField("event_id").as("event_id"))).as("last_at"),
        max(col("_m")).as("stale_at"))
  }

  /** Re-aggregate a finer rollup to resolution `resS` (which must be a
    * multiple of the finer resolution so fine buckets nest) — the
    * compaction step: no raw events touched, every field composed from
    * the finer summaries.
    */
  private[graft] def compact(roll: DataFrame, resS: Long): DataFrame = {
    require(resS > 0, "compaction resolution must be positive")
    // marker-only fine buckets carry null anchors — the when-guarded
    // struct min/max skips them exactly (min_by over a null ordering
    // key is the same skip, but the struct form is explicit)
    val f = min(when(col("first_at").isNotNull,
      struct(col("first_at").as("at"), col("vfirst").as("v"))))
    val l = max(when(col("last_at").isNotNull,
      struct(col("last_at").as("at"), col("vlast").as("v"))))
    roll
      .withColumn("bucket_s",
        expr(s"(bucket_s div $resS) * $resS").cast("long"))
      .groupBy((Key :+ "bucket_s").map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_dec")).as("sum_dec"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"),
        f.getField("v").as("vfirst"),
        f.getField("at").as("first_at"),
        l.getField("v").as("vlast"),
        l.getField("at").as("last_at"),
        max(col("stale_at")).as("stale_at"))
  }

  /** The serving face of a rollup relation: exact sums surfaced as
    * double (the engine-wide convention), anchors dropped.
    */
  private def serve(roll: DataFrame): DataFrame =
    roll.filter(col("cnt") > 0) // marker-only buckets have no samples to serve
      .select((Key :+ "bucket_s").map(col) ++ Seq(
        col("cnt"),
        col("sum_dec").cast("double").as("sum"),
        col("vmin"), col("vmax"), col("vfirst"), col("vlast")): _*)
      .orderBy((Key :+ "bucket_s").map(col): _*)

  /** p86: the 1-hour rollup of every metric family. */
  def rollup1h(spark: SparkSession, dir: String): DataFrame =
    serve(rollup1hCached(spark, dir))

  /** p87: the 1-day rollup produced BY COMPACTION of the 1-hour rollup
    * — gated against an oracle that computes the day buckets directly
    * from raw events, so the hash check IS the compaction-losslessness
    * proof at corpus scale.
    */
  def compact1hTo1d(spark: SparkSession, dir: String): DataFrame =
    serve(compact(rollup1hCached(spark, dir), 86400L))

  /** p88: a dashboard panel served ENTIRELY from the rollup pyramid —
    * `sum by (k)` of the trailing-1d increase of `purchase` at the last
    * 40 bucket-ALIGNED 6h instants, computed from
    * `compact(rollup(1h), 6h)` bucket sums and one sliding window:
    * raw events are never touched past the rollup build. The DuckDB
    * oracle computes the same aligned windows straight from raw events,
    * so the hash match proves rollup serving is lossless whenever
    * window and step are bucket-aligned (the Thanos/M3 alignment rule,
    * here as a gate instead of folklore).
    *
    * 100 TB shape: the panel's input is series × buckets (already
    * ~10⁴–10⁵× smaller than raw), the lattice join is a broadcast of
    * 43 indexes, and the window slides per label — cost is independent
    * of raw event count once the rollup exists.
    */
  def rollupPanel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val res = 21600L
    val all = compact(rollup1hCached(spark, dir), res)
    val r6 = all
      .filter(col("name") === "purchase")
      .groupBy(col("label_k"), col("bucket_s"))
      .agg(sum(col("sum_dec")).as("_s"), sum(col("cnt")).as("_n"))
      .withColumn("_b", expr(s"bucket_s div $res"))
      .select(col("label_k"), col("_b"), col("_s"), col("_n"))
    // the panel anchors on the CORPUS's last bucket (all families), the
    // evaluation-instant convention every query shares — anchoring on
    // the panel family alone would silently shift the grid whenever the
    // corpus's last event belongs to another family
    val bmax = all.agg(max(expr(s"bucket_s div $res")).as("_bmax"))
    import spark.implicits._
    // 40 output instants + 3 lookback buckets (window = 4 × 6h = 1d)
    val lattice = r6.select(col("label_k")).distinct()
      .crossJoin(broadcast(spark.range(0L, 43L).toDF("_j")))
      .crossJoin(broadcast(bmax))
      .select(col("label_k"), col("_j"),
        (col("_bmax") - lit(42L) + col("_j")).as("_b"))
    val w = Window.partitionBy(col("label_k")).orderBy(col("_b"))
      .rowsBetween(-3, Window.currentRow)
    lattice.join(r6, Seq("label_k", "_b"), "left")
      .withColumn("_ws", sum(col("_s")).over(w))
      .withColumn("_wn", sum(col("_n")).over(w))
      .filter(col("_wn") > 0 && col("_j") >= 3)
      .select(col("label_k"),
        ((col("_b") + 1) * res).cast("long").as("t_s"),
        col("_ws").cast("double").as("value"))
      .orderBy(col("label_k"), col("t_s"))
  }

  /** p89: the GAUGE panel from the pyramid — last-write-wins `signup`
    * per series at the last 40 aligned 6h instants, from rollup
    * `vlast`/anchor fields alone: the per-bucket last sample is already
    * anchored, later buckets strictly out-anchor earlier ones, so the
    * running LWW is one `last(ignoreNulls)` window over the series'
    * bucket rows unioned with 40 probe rows (the as-of union trick —
    * probe at bucket b reads every sample through b's closed-right end,
    * i.e. at or before `t_s = (b+1)·res`). Series emit nothing before
    * their first sample, like the instant vector.
    */
  def gaugePanel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val res = 21600L
    val all = compact(rollup1hCached(spark, dir), res)
    val keys = Seq("name", "label_k", "label_instance")
    val bmax = all.agg(max(expr(s"bucket_s div $res")).as("_bmax"))
    val s = all.filter(col("name") === "signup")
      .withColumn("_b", expr(s"bucket_s div $res"))
      // staleness-aware LWW token (cut/value/carry) — see
      // [[graft.promql.Pyramid.gaugeToken]]
      .withColumn("_tok", graft.promql.Pyramid.gaugeToken)
      .select(keys.map(col) :+ col("_b") :+ col("_tok") :+
        lit(0).as("_probe"): _*)
    import spark.implicits._
    val probes = s.select(keys.map(col): _*).distinct()
      .crossJoin(broadcast(spark.range(0L, 40L).toDF("_j")))
      .crossJoin(broadcast(bmax))
      .select(keys.map(col) :+ (col("_bmax") - col("_j")).as("_b") :+
        lit(null).cast("struct<cut:boolean,v:double>").as("_tok") :+
        lit(1).as("_probe"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_b"), col("_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.unionByName(probes)
      .withColumn("_c", last(col("_tok"), ignoreNulls = true).over(w))
      .withColumn("_v",
        when(!col("_c").getField("cut"), col("_c").getField("v")))
      .filter(col("_probe") === 1 && col("_v").isNotNull)
      .select(keys.map(col) :+ ((col("_b") + 1) * res).cast("long").as("t_s") :+
        col("_v").as("value"): _*)
      .orderBy((keys :+ "t_s").map(col): _*)
  }

  /** p89 oracle: per aligned instant, the latest raw `signup` sample
    * at or before the instant, (ts, event_id)-tie-broken.
    */
  val GaugePanelSql: String =
    s"""WITH m AS (${Metrics.MetricEventsSql}),
       |t AS (SELECT (MAX(epoch_us(ts)) + 21599999999) // 21600000000 - 1
       |        AS bmax FROM m),
       |inst AS (SELECT unnest(generate_series(0, 39)) AS i),
       |r AS (
       |  SELECT m.name, m.label_k, m.label_instance,
       |    (t.bmax - i.i + 1) * 21600 AS t_s, m.value,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY m.name, m.label_k, m.label_instance, i.i
       |      ORDER BY m.ts DESC, m.event_id DESC) AS rn
       |  FROM m, t, inst i
       |  WHERE m.name = 'signup'
       |    AND epoch_us(m.ts) <= (t.bmax - i.i + 1) * 21600000000)
       |SELECT name, label_k, label_instance, t_s, value FROM r WHERE rn = 1
       |ORDER BY name, label_k, label_instance, t_s""".stripMargin

  /** p88 oracle: the same 40 aligned 6h instants, each window summed
    * straight from raw events.
    */
  val RollupPanelSql: String =
    s"""WITH m AS (${Metrics.MetricEventsSql}),
       |t AS (SELECT (MAX(epoch_us(ts)) + 21599999999) // 21600000000 - 1
       |        AS bmax FROM m),
       |inst AS (SELECT unnest(generate_series(0, 39)) AS i)
       |SELECT label_k, (t.bmax - i.i + 1) * 21600 AS t_s,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
       |FROM m, t, inst i
       |WHERE name = 'purchase'
       |  AND epoch_us(ts) >  (t.bmax - i.i - 3) * 21600000000
       |  AND epoch_us(ts) <= (t.bmax - i.i + 1) * 21600000000
       |GROUP BY label_k, i.i, t.bmax
       |ORDER BY label_k, t_s""".stripMargin

  // ——— the HISTOGRAM level of the pyramid ———————————————————————————
  //
  // The third sample kind (`prometheus.cpp:256-306`) rolls up as
  // per-(series, time bucket, le) CUMULATIVE bucket counts — integers,
  // so they sum across time buckets and the compaction law carries
  // over verbatim: cum_count(le) over a coarse bucket is the sum of the
  // fine buckets' cum_counts, because every observation contributes to
  // the same fixed set of `le` rows regardless of when it arrived.
  // That makes windowed `histogram_quantile` servable from the pyramid:
  // the panel's per-instant bucket ladder is a sliding SUM of rollup
  // rows, never a re-read of raw observations.

  /** Per-(series, bucket, le) cumulative counts at resolution `resS`,
    * plus the per-bucket observation total `cnt` (repeated on each `le`
    * row of a group — constant within the group, so it re-aggregates by
    * the same `sum` as the counts).
    */
  private[graft] def histRollupRaw(spark: SparkSession, dir: String,
      resS: Long): DataFrame = {
    require(resS > 0, "rollup resolution must be positive")
    Metrics.metricEvents(spark, dir)
      .filter(col("kind") === "histogram")
      .withColumn("bucket_s", bucketCol(resS))
      .crossJoin(broadcast(Metrics.bucketBounds(spark)))
      .groupBy((Key :+ "bucket_s" :+ "le").map(col): _*)
      .agg(
        sum(when(col("value") <= col("le"), 1L).otherwise(0L)).as("cum_count"),
        count(lit(1)).as("cnt"))
  }

  /** Histogram compaction: pure re-aggregation of a finer histogram
    * rollup — the fine buckets nest, the integer counts add.
    */
  private[graft] def histCompact(roll: DataFrame, resS: Long): DataFrame = {
    require(resS > 0, "compaction resolution must be positive")
    roll
      .withColumn("bucket_s",
        expr(s"(bucket_s div $resS) * $resS").cast("long"))
      .groupBy((Key :+ "bucket_s" :+ "le").map(col): _*)
      .agg(sum(col("cum_count")).as("cum_count"), sum(col("cnt")).as("cnt"))
  }

  /** p90: the p99-style LATENCY PANEL served entirely from the
    * histogram pyramid — `histogram_quantile(0.9, sum by (k)
    * (increase(error[1d])))` at the last 40 bucket-aligned 6h instants,
    * computed from `histCompact(histRollup(1h), 6h)` bucket ladders and
    * one sliding window per (k, le); raw observations are never touched
    * past the rollup build. The DuckDB oracle computes the same aligned
    * windows and the same interpolation straight from raw events, so
    * the hash match extends the p87/p88 losslessness proof to the third
    * sample kind — the full pyramid now serves all three.
    *
    * 100 TB shape: rollup input is series × buckets × 7 les (still
    * ~10⁴× smaller than raw observation counts on real latency
    * densities), the lattice join broadcasts 43 indexes per (k, le),
    * the quantile is two windows over 7-row ladders. Panel cost is
    * independent of raw event count once the pyramid exists.
    */
  def histogramPanel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val res = 21600L
    val phi = 0.9
    // anchor on the CORPUS's last bucket (all families) — the shared
    // evaluation-instant convention (see rollupPanel)
    val bmax = rollup1hCached(spark, dir)
      .agg(max(expr(s"(bucket_s div $res)")).as("_bmax"))
    val h6 = histCompact(histRollup1hCached(spark, dir), res)
      .filter(col("name") === "error")
      .groupBy(col("label_k"), col("bucket_s"), col("le"))
      .agg(sum(col("cum_count")).as("_c"), sum(col("cnt")).as("_n"))
      .withColumn("_b", expr(s"bucket_s div $res"))
      .select(col("label_k"), col("_b"), col("le"), col("_c"), col("_n"))
    import spark.implicits._
    // 40 output instants + 3 lookback buckets (window = 4 × 6h = 1d)
    val lattice = h6.select(col("label_k"), col("le")).distinct()
      .crossJoin(broadcast(spark.range(0L, 43L).toDF("_j")))
      .crossJoin(broadcast(bmax))
      .select(col("label_k"), col("le"), col("_j"),
        (col("_bmax") - lit(42L) + col("_j")).as("_b"))
    val w = Window.partitionBy(col("label_k"), col("le")).orderBy(col("_b"))
      .rowsBetween(-3, Window.currentRow)
    // _wn is identical across the 7 le rows of an instant (the rollup
    // emits the full ladder for any bucket with >= 1 observation), so
    // the instant filter below drops WHOLE ladders, never partial ones
    val windowed = lattice.join(h6, Seq("label_k", "_b", "le"), "left")
      .withColumn("_wc", sum(col("_c")).over(w))
      .withColumn("_wn", sum(col("_n")).over(w))
      .filter(col("_wn") > 0 && col("_j") >= 3)
    // classic histogram_quantile per (k, instant) — the same fused
    // single-pass construction as PromQL.histogramQuantile
    val wq = Window.partitionBy(col("label_k"), col("_b")).orderBy(col("le"))
    val part = Window.partitionBy(col("label_k"), col("_b"))
    val ranked = windowed
      .withColumn("rank", lit(phi) * col("_wn").cast("double"))
      .withColumn("prev_le", coalesce(lag(col("le"), 1).over(wq), lit(0.0)))
      .withColumn("prev_cum", coalesce(lag(col("_wc"), 1).over(wq), lit(0L)))
      .withColumn("max_le", max(col("le")).over(part))
      .withColumn("max_cum", max(col("_wc")).over(part))
    val overflowRow = col("le") === col("max_le") &&
      col("rank") > col("max_cum").cast("double")
    val inBucketRow = col("_wc") >= col("rank") && col("prev_cum") < col("rank")
    ranked
      .filter(inBucketRow || overflowRow)
      .select(col("label_k"),
        ((col("_b") + 1) * res).cast("long").as("t_s"),
        when(overflowRow, col("max_le"))
          .otherwise(col("prev_le") + (col("le") - col("prev_le"))
            * (col("rank") - col("prev_cum").cast("double"))
            / (col("_wc") - col("prev_cum")).cast("double")).as("value"))
      .orderBy(col("label_k"), col("t_s"))
  }

  // ——— the NATIVE-histogram level of the pyramid ————————————————————
  //
  // The sparse exponential-bucket sample kind (Prometheus 3.x) rolls
  // up exactly like the classic ladder: per-(series, time bucket,
  // nh-bucket) observation counts plus a per-(series, time bucket)
  // totals row (count, zero-count) — all integers, so compaction is
  // summation and the p87 losslessness law carries over. The quantile
  // walk then runs on windowed ladder sums, with the same compose-time
  // literal bounds + deterministic det_exp2 interpolation the instant
  // plan uses (`promql/Compiler.nativeHistogramQuantile`), so the
  // pyramid-served panel hash-gates end to end.

  /** Totals face: per-(series, bucket) observation count + zero count. */
  private[graft] def nhTotRollupRaw(spark: SparkSession, dir: String,
      resS: Long): DataFrame = {
    require(resS > 0, "rollup resolution must be positive")
    nhObsCached(spark, dir)
      .withColumn("kind", lit("histogram"))
      .withColumn("bucket_s", bucketCol(resS))
      .groupBy((Key :+ "bucket_s").map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("iszero"), 1L).otherwise(0L)).as("zero"))
  }

  /** Sparse-bucket face: per-(series, bucket, nh-bucket) counts over
    * the shared literal bounds (scalar bucketization — no range join;
    * out-of-range values drop here but stay in the totals, mirroring
    * the instant plan).
    */
  private[graft] def nhBkRollupRaw(spark: SparkSession, dir: String,
      resS: Long): DataFrame = {
    require(resS > 0, "rollup resolution must be positive")
    nhObsCached(spark, dir)
      .filter(col("bucket").isNotNull)
      .withColumn("kind", lit("histogram"))
      .withColumn("bucket_s", bucketCol(resS))
      .groupBy((Key :+ "bucket_s" :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("c"))
  }

  private[graft] def nhTotCompact(roll: DataFrame, resS: Long): DataFrame =
    roll.withColumn("bucket_s", expr(s"(bucket_s div $resS) * $resS").cast("long"))
      .groupBy((Key :+ "bucket_s").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("zero")).as("zero"))

  private[graft] def nhBkCompact(roll: DataFrame, resS: Long): DataFrame =
    roll.withColumn("bucket_s", expr(s"(bucket_s div $resS) * $resS").cast("long"))
      .groupBy((Key :+ "bucket_s" :+ "bucket").map(col): _*)
      .agg(sum(col("c")).as("c"))

  /** p91: the NATIVE-histogram panel served from the pyramid —
    * `histogram_quantile(0.9, sum by (k) (rate(error[1d])))` under the
    * 3.x sparse-bucket dispatch at the last 40 aligned 6h instants,
    * computed from compacted nh rollups and two sliding windows
    * (totals + per-nh-bucket ladders); interpolation via the
    * deterministic det_exp2 walk. The oracle re-derives every windowed
    * sketch straight from raw observations, so the hash match extends
    * the pyramid-losslessness proof to the native sample kind — with
    * p86–p90 the pyramid now serves counter, gauge, classic AND native
    * histogram panels.
    *
    * 100 TB shape: nh rollup rows ∝ series × buckets × occupied
    * nh-cells (sparse — the value dynamic range bounds cells/series);
    * the panel windows slide over rollup rows only, and the pick is a
    * row_number over ~tens of candidate cells per instant.
    */
  def nativeHistogramPanel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val res = 21600L
    val phi = 0.9
    val bmax = rollup1hCached(spark, dir)
      .agg(max(expr(s"(bucket_s div $res)")).as("_bmax"))
    import spark.implicits._
    val grid = broadcast(spark.range(0L, 43L).toDF("_j"))

    // totals per (k, instant): sliding 4-bucket window on the compacted
    // totals rollup
    val tot6 = nhTotCompact(nhTot1hCached(spark, dir), res)
      .filter(col("name") === "error")
      .groupBy(col("label_k"), col("bucket_s"))
      .agg(sum(col("cnt")).as("_n"), sum(col("zero")).as("_z"))
      .withColumn("_b", expr(s"bucket_s div $res"))
      .select(col("label_k"), col("_b"), col("_n"), col("_z"))
      // Every relation checkpointed in this panel is referenced 2–3×
      // downstream (lattice distinct + join; cumsum + stats; pick +
      // final serve). Left lazy, each reference replayed its whole
      // upstream — the executed plan measured 322 nodes with ~30 live
      // exchanges. Each checkpoint is series×instants-bounded.
      .localCheckpoint()
    val totLattice = tot6.select(col("label_k")).distinct()
      .crossJoin(grid).crossJoin(broadcast(bmax))
      .select(col("label_k"), col("_j"),
        (col("_bmax") - lit(42L) + col("_j")).as("_b"))
    val wt = Window.partitionBy(col("label_k")).orderBy(col("_b"))
      .rowsBetween(-3, Window.currentRow)
    val tot = totLattice.join(tot6, Seq("label_k", "_b"), "left")
      .withColumn("cnt", sum(col("_n")).over(wt))
      .withColumn("zero", sum(col("_z")).over(wt))
      .filter(col("cnt") > 0 && col("_j") >= 3)
      .select(col("label_k"), col("_b"), col("cnt"), col("zero"))
      .localCheckpoint()

    // nh-bucket ladder per (k, instant): sliding window per (k, cell)
    val bk6 = nhBkCompact(nhBk1hCached(spark, dir), res)
      .filter(col("name") === "error")
      .groupBy(col("label_k"), col("bucket_s"), col("bucket"))
      .agg(sum(col("c")).as("_c"))
      .withColumn("_b", expr(s"bucket_s div $res"))
      .select(col("label_k"), col("_b"), col("bucket"), col("_c"))
      .localCheckpoint()
    val bkLattice = bk6.select(col("label_k"), col("bucket")).distinct()
      .crossJoin(grid).crossJoin(broadcast(bmax))
      .select(col("label_k"), col("bucket"), col("_j"),
        (col("_bmax") - lit(42L) + col("_j")).as("_b"))
    val wb = Window.partitionBy(col("label_k"), col("bucket")).orderBy(col("_b"))
      .rowsBetween(-3, Window.currentRow)
    val bk = bkLattice.join(bk6, Seq("label_k", "_b", "bucket"), "left")
      .withColumn("c", sum(col("_c")).over(wb))
      .filter(col("c") > 0 && col("_j") >= 3)
      .join(broadcast(Metrics.nhBoundsDf(spark).select(col("bucket"), col("hi"))),
        Seq("bucket"))
      .select(col("label_k"), col("_b"), col("bucket"), col("c"), col("hi"))

    // the instant plan's pick/interpolate, keyed by (k, instant)
    val wq = Window.partitionBy(col("label_k"), col("_b")).orderBy(col("bucket"))
    val bw = bk.withColumn("cumc", sum(col("c")).over(wq))
      .localCheckpoint()
    val bstats = bw.groupBy(col("label_k"), col("_b")).agg(max(col("hi")).as("last_hi"))
    val picked = bw.join(tot, Seq("label_k", "_b"))
      .withColumn("rank", lit(phi) * col("cnt").cast("double"))
      .filter(col("rank") > col("zero").cast("double") &&
        col("rank") <= (col("zero") + col("cumc")).cast("double"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") === 1)
      .withColumn("f",
        (col("rank") - (col("zero") + col("cumc") - col("c")).cast("double"))
          / col("c").cast("double"))
      .withColumn("xq",
        ((col("bucket") - lit(1)).cast("double") + col("f")) / lit(8.0))
      .select(col("label_k"), col("_b"),
        graft.plans.DetMathExprs.detExp2(spark, "xq").as("_qv"))
    tot.join(picked, Seq("label_k", "_b"), "left")
      .join(bstats, Seq("label_k", "_b"), "left")
      .select(col("label_k"),
        ((col("_b") + 1) * res).cast("long").as("t_s"),
        when(lit(phi) * col("cnt").cast("double") <= col("zero").cast("double"),
          lit(0.0))
          .when(col("_qv").isNotNull, col("_qv"))
          .otherwise(col("last_hi")).as("value"))
      .orderBy(col("label_k"), col("t_s"))
  }

  /** p90 oracle: the same aligned 1d windows at the last 40 6h
    * instants, bucket ladder and interpolation computed DIRECTLY from
    * raw events.
    */
  val HistogramPanelSql: String =
    s"""WITH m AS (${Metrics.MetricEventsSql}),
       |t AS (SELECT (MAX(epoch_us(ts)) + 21599999999) // 21600000000 - 1
       |        AS bmax FROM m),
       |inst AS (SELECT unnest(generate_series(0, 39)) AS i),
       |b AS (${Metrics.BucketBoundsSql}),
       |w AS (
       |  SELECT m.label_k, (t.bmax - i.i + 1) * 21600 AS t_s, b.le,
       |    SUM(CASE WHEN m.value <= b.le THEN 1 ELSE 0 END) AS wc,
       |    COUNT(*) AS wn
       |  FROM m, t, inst i, b
       |  WHERE m.kind = 'histogram' AND m.name = 'error'
       |    AND epoch_us(m.ts) >  (t.bmax - i.i - 3) * 21600000000
       |    AND epoch_us(m.ts) <= (t.bmax - i.i + 1) * 21600000000
       |  GROUP BY m.label_k, i.i, t.bmax, b.le),
       |r AS (
       |  SELECT label_k, t_s, le, wc,
       |    0.9 * CAST(wn AS DOUBLE) AS rank,
       |    COALESCE(LAG(le) OVER (PARTITION BY label_k, t_s ORDER BY le), 0.0) AS prev_le,
       |    COALESCE(LAG(wc) OVER (PARTITION BY label_k, t_s ORDER BY le), 0) AS prev_cum,
       |    MAX(le) OVER (PARTITION BY label_k, t_s) AS max_le,
       |    MAX(wc) OVER (PARTITION BY label_k, t_s) AS max_cum
       |  FROM w)
       |SELECT label_k, t_s,
       |  prev_le + (le - prev_le) * (rank - CAST(prev_cum AS DOUBLE))
       |    / CAST(wc - prev_cum AS DOUBLE) AS value
       |FROM r WHERE wc >= rank AND prev_cum < rank
       |UNION ALL
       |SELECT label_k, t_s, max_le AS value
       |FROM r WHERE le = max_le AND rank > CAST(max_cum AS DOUBLE)
       |ORDER BY label_k, t_s""".stripMargin

  private def rollupSql(resS: Long): String =
    s"""WITH m AS (${Metrics.MetricEventsSql}),
       |r AS (
       |  SELECT name, label_k, label_instance, kind,
       |    ((epoch_us(ts) + ${resS}000000 - 1) // ${resS}000000 - 1) * $resS
       |      AS bucket_s,
       |    value, event_id, epoch_us(ts) AS ts_us
       |  FROM m),
       |f AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY name, label_k, label_instance, kind, bucket_s
       |      ORDER BY ts_us, event_id) AS rn_a,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY name, label_k, label_instance, kind, bucket_s
       |      ORDER BY ts_us DESC, event_id DESC) AS rn_d
       |  FROM r)
       |SELECT name, label_k, label_instance, kind, bucket_s,
       |  COUNT(*) AS cnt,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum,
       |  MIN(value) AS vmin, MAX(value) AS vmax,
       |  MAX(CASE WHEN rn_a = 1 THEN value END) AS vfirst,
       |  MAX(CASE WHEN rn_d = 1 THEN value END) AS vlast
       |FROM f
       |GROUP BY name, label_k, label_instance, kind, bucket_s
       |ORDER BY name, label_k, label_instance, kind, bucket_s""".stripMargin

  /** p86 oracle: the 1h rollup straight from raw events. */
  val Rollup1hSql: String = rollupSql(3600L)

  /** p87 oracle: the DAY buckets straight from raw events — the engine
    * side answers by compacting the 1h rollup, so a hash match proves
    * compaction loses nothing.
    */
  val Compact1dSql: String = rollupSql(86400L)
}
