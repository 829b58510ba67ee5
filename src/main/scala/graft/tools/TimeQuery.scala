package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeated-timing harness for INDIVIDUAL registered queries — the
  * fine-grained companion to [[graft.Bench]] (which times everything
  * once): `runMain graft.tools.TimeQuery <n> <name> [name ...]` runs
  * each named [[graft.SparkEntry.queries]] entry n times against
  * `SPARK_GRAFT_SF_DIR` after the SAME shared-cache warm-ups Bench
  * performs, printing every sample plus min/median — the tool for
  * separating a genuine plan regression from this host's multi-minute
  * throttling bursts (bench_trend's per-query ratios point here).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <n> <queryName> [more...]")
    val n = args(0).toInt
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def warm(f: => Unit): Unit =
      try f catch { case e: Throwable => System.err.println(s"[time] warm-up FAILED: $e") }
    warm(graft.SparkEntry.entry(spark).queryExecution.toRdd.count())
    warm(graft.operators.Metrics.metricEvents(spark, sfDir).count())
    warm(graft.operators.Corpus.shingleRows(spark, sfDir).count())
    warm(graft.operators.Corpus.shingleRows(spark, sfDir, 2).count())
    warm(graft.operators.Dedup.minhashLsh(spark, sfDir).queryExecution.toRdd.count())
    warm(graft.operators.TextAnalysis.langId(spark, sfDir).queryExecution.toRdd.count())
    warm(graft.operators.Similarity.quantizedEmbeddings(spark, sfDir).queryExecution.toRdd.count())
    warm(graft.operators.TextAnalysis.bpeTrainState(
      spark, sfDir, graft.operators.TextAnalysis.BpeEncodeRounds))
    warm(graft.operators.TextAnalysis.bpeTrainState(
      spark, sfDir, graft.operators.TextAnalysis.BpeTrainRounds))
    warm(graft.operators.TextAnalysis.bpeEncodedDocs(spark, sfDir).count())
    warm(graft.operators.Downsample.nhObsCached(spark, sfDir).count())
    warm(graft.operators.Multimodal.phashNeardup(spark, sfDir).count())
    warm(graft.operators.Downsample.warmRollups(spark, sfDir))
    warm(graft.operators.Dedup.dedupComponents(spark, sfDir).queryExecution.toRdd.count())
    warm(graft.operators.Similarity.kmeansAssignments(spark, sfDir).count())
    warm(graft.operators.Similarity.kmeansParallelInit(spark, sfDir).count())
    warm(graft.operators.Similarity.warmAnnShared(spark, sfDir))
    warm(graft.operators.TextAnalysis.filterVerdict(spark, sfDir).count())
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[time] $name: NOT REGISTERED")
        case Some(fn) =>
          val ts = (1 to n).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).queryExecution.toRdd.count()
            (System.nanoTime() - t0) / 1e9
          }
          val sorted = ts.sorted
          println(f"[time] $name: min=${sorted.head}%.3f " +
            f"median=${sorted(n / 2)}%.3f " +
            s"samples=${ts.map(t => f"$t%.3f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
