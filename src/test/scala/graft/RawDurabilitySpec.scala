package graft

import graft.streaming.MetricStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Raw-event durability for the push doors ([[MetricStream
  * .streamingRawSegments]]): pushed samples append to immutable
  * parquet segments as they ingest, and after a restart the seeded
  * segment view serves NON-ALIGNED raw-path queries identically to the
  * original corpus — the face the rollup blocks (aligned reads) don't
  * cover. A redelivered micro-batch dedups away by event_id.
  */
class RawDurabilitySpec extends SparkTestBase {
  import spark.implicits._

  test("push → segments → restart: non-aligned queries serve from disk alone") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ev(1, 10 * 60000L, "purchase", 1.5, "a"),
      ev(2, 100 * 60000L, "purchase", 2.0, "a"),
      ev(3, 170 * 60000L, "purchase", 0.25, "a"),
      ev(4, 170 * 60000L, "purchase", 4.0, "b"),
      ev(5, 30 * 60000L, "signup", 10.0, "a"))
    // the pre-restart truth: the same samples as an ordinary corpus
    val dir = fixture("events" -> rows.toDF(eventCols: _*))
    val segDir = java.nio.file.Files
      .createTempDirectory("graft_raw_segments").toString + "/segments"
    val mem = MemoryStream[RawEvent]
    val q = MetricStream.streamingRawSegments(mem.toDF(), segDir)
    def re(t: (Long, java.sql.Timestamp, Long, String, Double, String)) =
      RawEvent(t._1, t._2, t._3, t._4, t._5, t._6)
    try {
      mem.addData(rows.take(3).map(re): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(3).map(re): _*)
      q.processAllAvailable()
      // a retry redelivers the second batch — byte-identical appends
      mem.addData(rows.drop(3).map(re): _*)
      q.processAllAvailable()
    } finally q.stop()
    // the view restores the exactly-once relation
    val view = MetricStream.rawSegmentsView(spark, segDir)
    assert(view.count() === rows.length.toLong,
      "replayed batch dedups away by event_id")
    // RESTART: a fresh serving key seeded from the segments alone —
    // no events parquet behind it
    val key = s"$dir#rawrestart"
    graft.operators.Metrics.seedEvents(spark, key, view)
    // non-aligned queries (odd windows, unaligned instants) — exactly
    // what the rollup blocks can NOT serve — answer identically
    for (query <- Seq(
        "rate(purchase[90m])",
        "sum by (k) (increase(purchase[150m]))",
        "max_over_time(signup[170m])",
        "purchase offset 25m")) {
      val pre = graft.promql.Engine.eval(spark, dir, query)
        .collect().map(_.toSeq).toSet
      val post = graft.promql.Engine.eval(spark, key, query)
        .collect().map(_.toSeq).toSet
      assert(post === pre, s"restart moved '$query'")
      assert(pre.nonEmpty, s"vacuous fixture for '$query'")
    }
    // RAW COMPACTION: the directory rewrites as its own deduped view —
    // segment files shrink (the replayed batch folds into the files),
    // the view is identical, and routed answers do not move
    val viewBefore = view.collect().map(_.toSeq).toSet
    val segFiles = new java.io.File(segDir)
      .listFiles.count(_.getName.endsWith(".parquet"))
    val (segsBefore, segsAfter) =
      graft.tools.CompactBlocks.runRaw(spark, segDir)
    assert(segsBefore > segsAfter, "compaction folded the replayed rows")
    assert(segsAfter === rows.length.toLong)
    val segFilesAfter = new java.io.File(segDir)
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(segFilesAfter <= segFiles)
    val viewAfter = MetricStream.rawSegmentsView(spark, segDir)
    assert(viewAfter.collect().map(_.toSeq).toSet === viewBefore,
      "compaction changed the serving view")
    val key2 = s"$dir#rawcompacted"
    graft.operators.Metrics.seedEvents(spark, key2, viewAfter)
    val pre = graft.promql.Engine.eval(spark, dir, "rate(purchase[90m])")
      .collect().map(_.toSeq).toSet
    assert(graft.promql.Engine.eval(spark, key2, "rate(purchase[90m])")
      .collect().map(_.toSeq).toSet === pre)
    // RETENTION: keep samples at/after minute 100 — older raw samples
    // retire, the kept ones survive byte-identically
    val keepFromS = (java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime + 100 * 60000L) / 1000L
    graft.tools.CompactBlocks.runRaw(spark, segDir, keepFromS)
    val retained = MetricStream.rawSegmentsView(spark, segDir)
    val keptIds = retained.select($"event_id").as[Long].collect().toSet
    assert(keptIds === Set(2L, 3L, 4L), "retention cut is exact")
    assert(retained.collect().map(_.toSeq).toSet ===
      viewBefore.filter(r => Set(2L, 3L, 4L)
        .contains(r(6).asInstanceOf[Long])))
  }
}
