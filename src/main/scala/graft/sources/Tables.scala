package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema + extension
  * tables (see /root/repo/TESTDATA.md).
  *
  * Scale notes (100 TB design): every loader is a plain
  * `spark.read.parquet` so Catalyst's vectorized parquet reader, predicate
  * pushdown, and column pruning apply untouched. At cluster scale these
  * paths become partitioned directories; nothing here assumes a single
  * file. Dimension tables (`region`, `nation`, `supplier`, `part`,
  * `customer`) are small at every scale factor and are always joined with
  * an explicit `broadcast()` hint by callers.
  */
object Tables {
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Columns stored as parquet TIMESTAMP(NANOS) per table. Spark has no
    * nanosecond timestamp type; we read them as nanos-since-epoch longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and floor-convert to
    * microsecond timestamps with integral `div` (a double division would
    * lose precision above 2^53 ns). DuckDB's own ns→us handling floors
    * identically, so oracle parity holds.
    */
  private val NanosTsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    NanosTsCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == org.apache.spark.sql.types.LongType)
        d.withColumn(c, org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(s"$c div 1000")))
      else d
    }
  }
}
