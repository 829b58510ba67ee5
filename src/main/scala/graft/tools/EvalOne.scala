package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: evaluate PromQL query string(s) through the front-end
  * against a testdata dir and print row counts (add `show` to print
  * rows, `explain` for the formatted plan).
  * Usage: runMain graft.tools.EvalOne [sfDir] <query> [query ...]
  */
object EvalOne {
  def main(args: Array[String]): Unit = {
    val (dir, queries) =
      if (args.nonEmpty && args.head.startsWith("/")) (args.head, args.tail)
      else ("/root/testdata/sf0.001", args)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val show = queries.contains("show")
    val explain = queries.contains("explain")
    for (q <- queries.filterNot(Set("show", "explain"))) {
      try {
        val df = graft.promql.Engine.eval(spark, dir, q)
        println(s"[evalone] OK rows=${df.count()} :: $q")
        if (show) df.show(50, truncate = false)
        if (explain) df.explain("formatted")
      } catch {
        case e: Throwable =>
          println(s"[evalone] FAIL ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(200)} :: $q")
      }
    }
    spark.stop()
  }
}
