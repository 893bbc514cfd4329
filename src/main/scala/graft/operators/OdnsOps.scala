package graft.operators

import graft.Tables
import graft.functions.Typers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable demonstrations of the reference's field-typing and
  * filename-date semantics, expressed over the shared `events` table so
  * the DuckDB gate can verify values (the full CSV→JDBC pipeline is
  * exercised in ScalaTest with its own fixtures — see OdnsPipelineSpec).
  */
object OdnsOps {

  /** Round-trips event timestamps through the reference's string format
    * and exercises null-on-failure numeric typing
    * (fieldtypers.py:13-31). */
  def odnsTyping(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        date_format(col("ts"), Typers.OdnsTimestampFormat).as("ts_str"),
        col("event_type"), col("value"))
      .agg(
        count(Typers.tryOdnsTimestamp(col("ts_str"))).as("n_ts_parsed"),
        max(unix_micros(Typers.tryOdnsTimestamp(col("ts_str")))).as("max_ts_us"),
        count(Typers.tryDouble(col("event_type"))).as("n_bad_numeric"),
        count(Typers.tryDouble(col("value").cast("string"))).as("n_good_numeric"))

  /** scan_date extraction from synthesized archive filenames
    * (zipFileUtils.py:25-35). */
  def odnsScanDate(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("fname",
        concat(lit("tcp_scan_"), to_date(col("ts")).cast("string"), lit(".csv.gz")))
      .withColumn("scan_date", regexp_extract(col("fname"), "\\d{4}-\\d{2}-\\d{2}", 0))
      .groupBy(col("scan_date"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("scan_date"))
}
