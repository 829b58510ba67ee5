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

  /** Timestamp columns per table, normalized to a canonical
    * `TimestampType` regardless of how the driver's generator wrote them.
    * Observed physical encodings across fixture regenerations:
    *  - parquet TIMESTAMP(NANOS): Spark has no nanosecond timestamp type;
    *    read as nanos-since-epoch longs (`spark.sql.legacy.parquet
    *    .nanosAsLong`) and floor-convert with integral `div` (a double
    *    division would lose precision above 2^53 ns). DuckDB floors
    *    identically, so oracle parity holds.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark ≥3.4
    *    reads this as `timestamp_ntz`; cast to `TimestampType`. The
    *    session timezone is pinned UTC (Verify/Bench/specs), so the cast
    *    reinterprets the same wall-clock as the same UTC instant — which
    *    is exactly how DuckDB treats a naive timestamp. Canonicalizing
    *    here keeps the A7 compose-time gate strict downstream while
    *    accepting representably-equivalent input (the reference's own
    *    compose step coerces where types unify, prometheus.cpp:160-167).
    */
  private val TsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // nanos-as-long conversion applies only to the known ns columns; the
    // ntz→timestamp canonicalization applies to EVERY ntz column so the
    // next fixture regeneration can't reintroduce the r8 wipeout on a
    // column this list doesn't mention.
    val withNanos = TsCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == LongType)
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else d
    }
    withNanos.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(withNanos) { (d, f) =>
        d.withColumn(f.name, d(f.name).cast(TimestampType))
      }
  }
}
