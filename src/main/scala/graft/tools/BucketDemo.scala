package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Bucketed co-located join demonstration: write `lineitem` and `orders`
  * bucketed by orderkey, then join them — the sort-merge join consumes
  * the bucket layout directly, with NO exchange on either side. This is
  * the 100 TB plan for repeated fact-fact joins: pay the shuffle once at
  * write time, never again at query time (vs. a broadcast join, which
  * only works when one side is small).
  *
  * Run: sbt "runMain graft.tools.BucketDemo [sfDir]"
  * Prints the join plan's exchange count — 0 proves co-location.
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables.lineitem(spark, dir).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    Tables.orders(spark, dir).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
      .groupBy("o_orderpriority")
      .count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    val smj = plan.contains("SortMergeJoin")
    val bucketedScans = plan.linesIterator.count(_.contains("Bucketed: true"))
    // co-location holds iff no Exchange sits between the join and its
    // scans: every line below the (last) SortMergeJoin must be shuffle-free
    val lines = plan.linesIterator.toSeq
    val belowJoin = lines.drop(lines.lastIndexWhere(_.contains("SortMergeJoin")) + 1)
    val joinSideShuffles = belowJoin.count(_.contains("Exchange hashpartitioning"))
    println(s"[bucket-demo] sortMergeJoin=$smj bucketedScans=$bucketedScans " +
      s"joinSideShuffles=$joinSideShuffles")
    println(if (smj && bucketedScans >= 2 && joinSideShuffles == 0)
      "[bucket-demo] CO-LOCATED: join consumed bucket layout with no join-side shuffle"
    else s"[bucket-demo] UNEXPECTED PLAN:\n$plan")
    spark.stop()
  }
}
