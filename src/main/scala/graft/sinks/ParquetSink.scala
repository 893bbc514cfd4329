package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Columnar lake sink — at 100 TB the JDBC target becomes the summary
  * store and the full scan data lands in partitioned parquet instead.
  * Hive-style partition directories give the engine partition pruning on
  * the refresh/query predicates (protocol, scan_date) for free.
  */
object ParquetSink {

  /** Write partitioned by low-cardinality keys (e.g. protocol,
    * scan_date): one directory per value combination, pruned at read
    * time by PartitionFilters. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Cluster rows by a high-cardinality key into `n` files per
    * partition: co-locates equal keys (bucket-join-friendly layout) and
    * keeps min/max column stats tight for row-group skipping. */
  def writeClustered(df: DataFrame, path: String, clusterCol: String, n: Int,
      mode: String = "overwrite"): Unit =
    df.repartition(n, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(mode).parquet(path)

  /** The reference's refresh contract on a lake: overwrite only the
    * partition directories present in `df` (dynamic partition
    * overwrite), leaving sibling partitions untouched — the
    * DELETE-by-protocol equivalent without touching other protocols. */
  def refreshPartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
