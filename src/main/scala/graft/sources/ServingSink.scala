package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch serving sink: materialize a snapshot DataFrame as a
  * kind-partitioned parquet serving table and read it back with
  * partition pruning — the durable variant of the scrape endpoint
  * (`/root/reference/prometheus.cpp:73,80` exposes a transient snapshot;
  * a Spark deployment persists it for downstream consumers).
  *
  * Scale notes: partitioning by `kind` (low cardinality) keeps directory
  * listings cheap and lets `WHERE kind = …` prune whole partitions at
  * the metadata level; within each partition, rows are sorted by the
  * series key so parquet row-group min/max statistics prune series-range
  * scans too. At 100 TB the same layout holds with an added time
  * (`date`) partition column.
  */
object ServingSink {

  def write(snapshot: DataFrame, path: String): Unit =
    snapshot
      .repartition(snapshot.col("kind"))
      .sortWithinPartitions("name", "label_k")
      .write
      .mode("overwrite")
      .partitionBy("kind")
      .parquet(path)

  /** Read back one metric kind — the partition filter prunes at the
    * directory level (verify: the scan's `PartitionFilters` in explain).
    */
  def readKind(spark: SparkSession, path: String, kind: String): DataFrame =
    spark.read.parquet(path).filter(s"kind = '$kind'")
}
