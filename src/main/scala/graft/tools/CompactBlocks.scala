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

  /** Compact `blockDir` in place; returns (segment rows before, rows
    * after). `keepFromBucketS` drops buckets strictly older.
    */
  def run(spark: SparkSession, blockDir: String,
      keepFromBucketS: Long = Long.MinValue): (Long, Long) = {
    val before = spark.read.parquet(blockDir).count()
    val merged = MetricStream.blocksView(spark, blockDir)
      .filter(col("bucket_s") >= keepFromBucketS)
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(blockDir)
    val fs = dir.getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(blockDir + ".compacting")
    val retired = new org.apache.hadoop.fs.Path(blockDir + ".retired")
    merged.write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(dir, retired))
      throw new java.io.IOException(s"cannot retire $blockDir")
    if (!fs.rename(staging, dir))
      throw new java.io.IOException(s"cannot swap in compacted $blockDir")
    fs.delete(retired, true)
    // drop the session's cached file listing for the swapped path —
    // pre-swap DataFrames must not chase retired segment files
    spark.catalog.refreshByPath(blockDir)
    val after = spark.read.parquet(blockDir).count()
    (before, after)
  }

  def main(args: Array[String]): Unit = {
    val blockDir = args(0)
    val keepFrom = args.drop(1).headOption.map(_.toLong).getOrElse(Long.MinValue)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (b, a) = run(spark, blockDir, keepFrom)
    println(s"[compact] $blockDir: $b segment rows -> $a")
    spark.stop()
  }
}
