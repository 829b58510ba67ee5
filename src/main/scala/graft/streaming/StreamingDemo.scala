package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** End-to-end streaming run on real data: stream the sf events table
  * through the keyed running-total operator into the serving registry,
  * then "scrape" it — the full Exposer analog
  * (`/root/reference/prometheus.cpp:27-93`) as one runnable pipeline.
  *
  * Run: sbt "runMain graft.streaming.StreamingDemo [sfDir]"
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // file-source streaming read of the same parquet the batch path uses.
    // The file source wants a directory of arriving files (the testdata is
    // a single file, read-only) — stage it into a temp "landing" dir, the
    // shape a real ingest directory would have.
    val schema = Tables.events(spark, dir).schema
    val landing = java.nio.file.Files.createTempDirectory("graft_stream_landing")
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    if (java.nio.file.Files.isDirectory(src))
      java.nio.file.Files.list(src).forEach(p =>
        java.nio.file.Files.copy(p, landing.resolve(p.getFileName)))
    else java.nio.file.Files.copy(src, landing.resolve("events.parquet"))
    val raw = spark.readStream.schema(schema).parquet(landing.toString)

    ExpositionRegistry.clear()
    val t0 = System.nanoTime()
    val query = MetricStream.startServingSink(
      MetricStream.runningCounterTotals(raw), "demo_serving")
    query.processAllAvailable()
    val elapsed = (System.nanoTime() - t0) / 1e9

    val snap = ExpositionRegistry.snapshot(spark)
    val nEvents = graft.operators.Metrics.metricEvents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("kind") === "counter").count()
    println(f"[streaming-demo] ingested $nEvents counter events in $elapsed%.2f s " +
      f"= ${nEvents / elapsed}%.0f increments/s " +
      "(reference workload: 35 increments/s, /root/reference/test.edn:4-8)")
    val n = snap.count()
    println(s"[streaming-demo] scrape snapshot: $n series")
    snap.orderBy("name", "label_k").show(10, truncate = false)

    // cross-check the scrape against the batch counter snapshot
    val batch = graft.operators.Metrics.counterSnapshot(spark, dir)
    val streamTotal = snap.agg(org.apache.spark.sql.functions.sum("total"))
      .head().getDouble(0)
    val batchTotal = batch.agg(org.apache.spark.sql.functions.sum("value"))
      .head().getDouble(0)
    println(f"[streaming-demo] stream total=$streamTotal%.2f batch total=$batchTotal%.2f " +
      (if (math.abs(streamTotal - batchTotal) < 1e-6) "MATCH" else "MISMATCH"))
    query.stop()
    spark.stop()
  }
}
