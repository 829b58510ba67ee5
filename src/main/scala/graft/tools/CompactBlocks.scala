package graft.tools

import graft.streaming.MetricStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** LSM COMPACTION for the streaming block directory
  * ([[MetricStream.streamingBlocks]]): rewrite the segments as their
  * own merged view — the read path's `max_by` folded into the files —
  * optionally dropping buckets older than a retention horizon (the
  * Thanos/M3 retention knob: rollup levels outlive raw data; here the
  * caller passes the oldest bucket epoch to keep). Answers are
  * UNCHANGED by construction: the view of the compacted directory is
  * the view of the original minus retired buckets, and the blocks spec
  * pins routed answers identical before/after.
  *
  * The rewrite is crash-safe without coordination: the merged view
  * lands in a sibling staging directory, then two renames swap it in
  * (readers hold immutable parquet file handles; a crash between
  * renames leaves either the old or the new directory intact, plus a
  * leftover to sweep).
  *
  * Usage: `runMain graft.tools.CompactBlocks <blockDir> [keepFromBucketS]`.
  */
object CompactBlocks {

  /** The crash-safe in-place swap both faces share: write `merged` to
    * a sibling staging directory, two renames, sweep the retired copy,
    * refresh the session's file-listing cache. Returns (rows before,
    * rows after).
    */
  private def swapIn(spark: SparkSession, targetDir: String,
      merged: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val before = spark.read.parquet(targetDir).count()
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(targetDir)
    val fs = dir.getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(targetDir + ".compacting")
    val retired = new org.apache.hadoop.fs.Path(targetDir + ".retired")
    merged.write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(dir, retired))
      throw new java.io.IOException(s"cannot retire $targetDir")
    if (!fs.rename(staging, dir))
      throw new java.io.IOException(s"cannot swap in compacted $targetDir")
    fs.delete(retired, true)
    // drop the session's cached file listing for the swapped path —
    // pre-swap DataFrames must not chase retired segment files
    spark.catalog.refreshByPath(targetDir)
    val after = spark.read.parquet(targetDir).count()
    (before, after)
  }

  /** Compact `blockDir` in place; returns (segment rows before, rows
    * after). `keepFromBucketS` drops buckets strictly older.
    */
  def run(spark: SparkSession, blockDir: String,
      keepFromBucketS: Long = Long.MinValue): (Long, Long) =
    swapIn(spark, blockDir, MetricStream.blocksView(spark, blockDir)
      .filter(col("bucket_s") >= keepFromBucketS))

  /** The RAW-SEGMENT face ([[MetricStream.streamingRawSegments]]): the
    * push doors append one parquet segment per micro-batch forever, so
    * at real ingest rates the directory becomes a small-files swamp and
    * the serving view re-deduplicates every read. Compaction rewrites
    * the directory as its own replay-deduped view
    * ([[MetricStream.rawSegmentsView]] folded into the files — the
    * `dropDuplicates(event_id)` work happens ONCE here instead of per
    * query), optionally dropping samples with event time strictly
    * before `keepFromS` (epoch seconds) — the raw-data retention
    * horizon every real TSDB runs (rollup levels outlive raw samples;
    * [[run]] is their knob). Same two-rename crash-safety; the view of
    * the compacted directory is the view of the original minus retired
    * samples, so routed answers are unchanged by construction
    * (StreamingSpec pins it).
    */
  def runRaw(spark: SparkSession, segDir: String,
      keepFromS: Long = Long.MinValue): (Long, Long) = {
    val base = MetricStream.rawSegmentsView(spark, segDir)
    val kept =
      if (keepFromS == Long.MinValue) base
      else base.filter(
        org.apache.spark.sql.functions.unix_micros(col("ts")) >=
          keepFromS * 1000000L)
    swapIn(spark, segDir, kept)
  }

  def main(args: Array[String]): Unit = {
    val raw = args.contains("--raw")
    val rest = args.filterNot(_ == "--raw")
    val targetDir = rest(0)
    val keepFrom = rest.drop(1).headOption.map(_.toLong).getOrElse(Long.MinValue)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (b, a) =
      if (raw) runRaw(spark, targetDir, keepFrom)
      else run(spark, targetDir, keepFrom)
    println(s"[compact] $targetDir: $b segment rows -> $a")
    spark.stop()
  }
}
