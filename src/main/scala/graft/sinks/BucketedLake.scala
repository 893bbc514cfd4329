package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout — the shuffle-ELIMINATION story for repeated
  * fact-fact joins at 100 TB: both sides hash-bucketed and sorted on
  * the join key at WRITE time, so every subsequent sort-merge join
  * reads co-located buckets with no exchange and no sort. One shuffle
  * paid once at layout time amortizes over every downstream join /
  * aggregation on that key (the classic warehouse trick Spark exposes
  * via bucketBy + the session catalog).
  */
object BucketedLake {

  /** Persist `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
