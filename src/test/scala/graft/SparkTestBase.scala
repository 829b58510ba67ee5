package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession + fixture-writing helpers for specs. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session

  /** A fresh temp dir with the /root/testdata layout: one parquet file
    * per (name, df) pair. Operators are pointed at the returned dir.
    */
  def fixture(tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fixture").toString
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  /** events-table fixture row: (event_id, t0+tsMs, user, type, value,
    * props with single label k). Shared by the metric-operator specs.
    */
  protected val eventCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  protected def ev(id: Long, tsMs: Long, etype: String, value: Double, label: String)
      : (Long, java.sql.Timestamp, Long, String, Double, String) =
    (id, new java.sql.Timestamp(t0.getTime + tsMs), 1L, etype, value, s"""{"k": "$label"}""")
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
