package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run ONE SparkEntry query by name, executing the REAL
  * plan (`toRdd.count()`, not `count()` which Catalyst re-plans with
  * output pruning), print wall seconds and optionally the formatted
  * plan. Usage: runMain graft.tools.RunOne <name> [sfDir] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val n = df.queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[runone] $name rows=$n sec=$sec%.2f")
    if (args.contains("explain")) df.explain("formatted")
    spark.stop()
  }
}
