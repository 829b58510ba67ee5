package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * and greps it for the scale-critical properties (parquet filter
  * pushdown, pruned read schemas, broadcast joins, whole-stage codegen
  * spans, custom expression placement).
  *
  * Run: sbt "runMain graft.tools.PlanAudit [sfDir] [query ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val df = fn(spark, dir)
        df.collect() // execute THIS plan so AQE finalizes it (count() would plan separately)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val pushed = "PushedFilters: \\[[^\\]]+\\]".r
          .findAllIn(plan).toSeq.distinct.filterNot(_.contains("[]"))
        val schemas = "ReadSchema: [^\n]+".r.findAllIn(plan).toSeq.distinct
        val simple = df.queryExecution.executedPlan.toString
        val broadcasts = "\\((\\d+)\\) BroadcastHashJoin".r
          .findAllMatchIn(plan).map(_.group(1)).toSeq.distinct.size
        val shuffles = "\\((\\d+)\\) Exchange".r
          .findAllMatchIn(plan).map(_.group(1)).toSeq.distinct.size
        val codegenSpans = "\\*\\((\\d+)\\)".r
          .findAllMatchIn(simple).map(_.group(1)).toSeq.distinct.size
        val joins = plan.linesIterator
          .filter(l => l.contains("Join") && l.contains("("))
          .map(_.trim.takeWhile(_ != '[')).toSeq.distinct
        println(s"== $name")
        println(s"   codegen_spans=$codegenSpans shuffles=$shuffles broadcast_joins=$broadcasts")
        if (joins.nonEmpty) println(s"   joins: ${joins.mkString(" | ")}")
        pushed.foreach(p => println(s"   $p"))
        schemas.foreach(s => println(s"   ${s.take(160)}"))
        if (sys.env.contains("PLAN_AUDIT_FULL")) println(plan)
      }
    }
    spark.stop()
  }
}
