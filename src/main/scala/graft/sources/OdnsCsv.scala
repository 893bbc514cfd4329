package graft.sources

import graft.functions.Typers
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Distributed reader for ODNS scan CSVs — the Spark-native equivalent of
  * the reference's unzip + csv.DictReader loop (dataimporter.py:131-184,
  * zipFileUtils.py:19-23).
  *
  * Differences by design, for scale:
  *  - No unzip step: Spark's text source decompresses `.csv.gz` natively.
  *    A gzip file is non-splittable, so one task reads one archive — the
  *    same unit of work as the reference, but all archives in parallel.
  *  - `scan_date` comes from `input_file_name()` per row, so one read can
  *    span many scan days and stays correct (the reference handles one
  *    file per run; dataimporter.py:266).
  *  - Typing is null-on-failure via try_* expressions (≡ fieldtypers.py),
  *    fully codegen'd, no UDFs.
  */
object OdnsCsv {

  /** CSV columns common to both protocols (dataimporter.py:22-62). */
  private val CommonColumns: Seq[String] = Seq(
    "ip_request", "ip_response", "a_record",
    "timestamp_request",
    "response_type",
    "country_request", "asn_request", "prefix_request", "org_request",
    "country_response", "asn_response", "prefix_response", "org_response",
    "country_arecord", "asn_arecord", "prefix_arecord", "org_arecord")

  /** tcp CSVs additionally carry `timestamp_response` (dataimporter.py:23). */
  def csvColumns(protocol: String): Seq[String] = protocol match {
    case "tcp" =>
      CommonColumns.take(4) ++ Seq("timestamp_response") ++ CommonColumns.drop(4)
    case "udp" => CommonColumns
    case p => throw new IllegalArgumentException(s"unknown protocol: $p")
  }

  /** Final table layout (dataimporter.py:64-84 + scan_date). */
  val TableColumns: Seq[String] = Seq(
    "protocol", "ip_request", "ip_response", "a_record",
    "timestamp_request", "timestamp_response", "response_type",
    "country_request", "asn_request", "prefix_request", "org_request",
    "country_response", "asn_response", "prefix_response", "org_response",
    "country_arecord", "asn_arecord", "prefix_arecord", "org_arecord",
    "scan_date")

  private def rawSchema(protocol: String): StructType =
    StructType(csvColumns(protocol).map(StructField(_, StringType, nullable = true)))

  /** Read one or more `{protocol}*.csv[.gz]` archives into the typed,
    * enriched ODNS layout. `paths` may be files, dirs or globs. */
  def read(spark: SparkSession, protocol: String, paths: String*): DataFrame = {
    val raw = spark.read
      .option("sep", ";")
      .option("header", "true")
      // the reference's csv module does no quote processing beyond default
      .option("mode", "PERMISSIVE")
      .schema(rawSchema(protocol))
      .csv(paths: _*)
      .withColumn("_src", input_file_name())
    typed(raw, protocol)
  }

  /** Apply reference typing semantics and produce the 20-col layout. */
  private[graft] def typed(raw: DataFrame, protocol: String): DataFrame = {
    val present = raw.columns.toSet
    def field(name: String): Column = {
      val c =
        if (present.contains(name)) col(name)
        else lit(null).cast(StringType) // udp has no timestamp_response
      name match {
        case "timestamp_request" | "timestamp_response" =>
          Typers.tryOdnsTimestamp(c)
        case "asn_request" | "asn_response" | "asn_arecord" =>
          Typers.tryDouble(c)
        case _ => Typers.emptyToNull(c)
      }
    }
    val cols = TableColumns.map {
      case "protocol" => lit(protocol).as("protocol")
      case "scan_date" => Typers.extractScanDate(col("_src")).as("scan_date")
      case name => field(name).as(name)
    }
    raw.select(cols: _*)
  }
}
