package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Z-order (Morton) layout over TWO high-cardinality dimensions:
    * each row's dims are rank-normalized to 16 bits via ntile, the bits
    * interleaved into one z-value, and the data range-partitioned +
    * sorted by it. Every output file then covers a small RECTANGLE in
    * (d1, d2) space — min/max footer stats stay tight on BOTH columns,
    * so point/range predicates on either dimension skip most files
    * (linear sort gives that for one dimension only). This is the
    * standard data-skipping layout for multi-predicate scans at 100 TB.
    */
  def writeZOrdered(df: DataFrame, path: String, d1: String, d2: String,
      nFiles: Int, mode: String = "overwrite"): Unit = {
    // Rank-normalize each dim to 8 bits via ONE distributed quantile
    // pass (Greenwald-Khanna sketch, driver sees 255 boundaries — never
    // a global window/sort, which would serialize at scale). Bucket
    // lookup is a map-side filter over the broadcast boundary literal.
    def buckets(c: String): Column = {
      val bounds = df.stat.approxQuantile(
        c, (1 until 256).map(_ / 256.0).toArray, 0.001)
      val lit256 = typedLit(bounds.toSeq)
      size(filter(lit256, b => b <= col(c).cast("double"))).cast("bigint")
    }
    val z = df
      .withColumn("__r1", buckets(d1))
      .withColumn("__r2", buckets(d2))
      .withColumn("__z", expr(
        """aggregate(sequence(0, 7), cast(0 as bigint), (acc, i) ->
          |  acc
          |  + shiftleft((__r1 >> i) & 1, 2 * i + 1)
          |  + shiftleft((__r2 >> i) & 1, 2 * i))""".stripMargin))
    z.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__r1", "__r2", "__z")
      .write.mode(mode).parquet(path)
  }

  /** Keyed MERGE (upsert) into a partitioned parquet lake: rows of
    * `updates` replace existing rows with the same key; everything else
    * in the AFFECTED partitions survives; untouched partitions are not
    * rewritten at all (dynamic partition overwrite). This is the
    * CDC-apply pattern over plain parquet — at 100 TB the rewrite cost
    * is bounded by the touched partitions, not the table.
    *
    * The merged set is eagerly materialized (lineage truncated) before
    * the overwrite because the plan reads the same path it writes; a
    * production deployment would stage-and-swap instead. */
  def mergeUpsert(updates: DataFrame, path: String, keyCols: Seq[String],
      partitionCols: Seq[String]): Unit = {
    val spark = updates.sparkSession
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val exists = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(fsPath)
    val merged =
      if (!exists) updates
      else {
        val existing = spark.read.parquet(path)
        // prune to affected partitions, then anti-join away updated keys
        val touched = updates.select(partitionCols.map(col): _*).distinct()
        val survivors = existing
          .join(broadcast(touched), partitionCols, "left_semi")
          .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
        survivors.unionByName(updates).localCheckpoint(true)
      }
    merged.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

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
  /** Write a per-partition MANIFEST beside a partitioned table:
    * row count and min/max of a stats column per partition value,
    * landed under `_manifest` (underscore-prefixed paths are invisible
    * to parquet readers, so the base table reads unchanged). This is
    * the cheap bookkeeping a 100 TB lake keeps for freshness checks,
    * incremental planning, and skipping — recomputed per refresh from
    * one aggregate over the affected partitions. */
  def writeManifest(spark: org.apache.spark.sql.SparkSession, path: String,
      partitionCols: Seq[String], statsCol: String): Unit =
    spark.read.parquet(path)
      .groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        min(col(statsCol)).as(s"min_$statsCol"),
        max(col(statsCol)).as(s"max_$statsCol"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")

}
