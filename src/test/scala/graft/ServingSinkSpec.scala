package graft

import graft.operators.Metrics
import graft.sources.ServingSink

/** Partitioned serving-table sink: round-trip, partition layout on disk,
  * and partition pruning on read-back.
  */
class ServingSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("sink writes kind-partitioned parquet and prunes on read") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dir = fixture("events" -> Seq(
      (0L, t0, 1L, "click", 2.0, """{"k": "a"}"""),
      (1L, t0, 1L, "signup", 7.0, """{"k": "a"}"""),
      (2L, t0, 1L, "error", 3.0, """{"k": "h"}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = java.nio.file.Files.createTempDirectory("serving").toString

    ServingSink.write(Metrics.exposition(spark, dir), out)

    // hive-style kind= partition directories on disk
    val parts = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("kind="))
    assert(parts.toSet === Set("kind=counter", "kind=gauge", "kind=histogram"))

    // read-back returns only the selected kind, and the plan prunes
    val counters = ServingSink.readKind(spark, out, "counter")
    assert(counters.select($"name").as[String].collect().toSeq === Seq("click"))
    val plan = counters.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(kind"), plan.take(500))
  }
}
