package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables.
  *
  * All tables are plain parquet except `events`, whose `ts` column is
  * parquet TIMESTAMP(NANOS) — Spark's TimestampType is microsecond
  * precision and the vectorized reader rejects NANOS outright, so we read
  * it as a raw long (`spark.sql.legacy.parquet.nanosAsLong`) and truncate
  * to micros, which is bit-identical to what DuckDB's TIMESTAMP cast does
  * (floor division for positive epochs).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` converted to a proper microsecond TimestampType.
    *
    * Schema-adaptive: older testdata generations wrote `ts` as parquet
    * TIMESTAMP(NANOS) (read as a raw long), newer ones write
    * TIMESTAMP(MICROS) without UTC adjustment (read as TIMESTAMP_NTZ).
    * Both normalize to the same microsecond TimestampType — the session
    * timezone is pinned to UTC, so the NTZ→TZ cast is value-identical
    * to what DuckDB sees reading the same file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => normTs(df)
    }
  }

  /** Cast any TIMESTAMP_NTZ columns to TimestampType. Newer testdata
    * generations write parquet timestamps without the UTC-adjusted flag;
    * with the session timezone pinned to UTC the cast is value-identical,
    * and it keeps every operator (and the driver-compared output dtype)
    * on the single TimestampType the whole gated surface was proven on. */
  private def normTs(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(org.apache.spark.sql.types.TimestampType))
        case _ => d
      }
    }

  // every loader routes through normTs (a no-op on schemas without NTZ
  // columns) so a future testdata regeneration that flips any table's
  // timestamp representation cannot silently reintroduce dtype drift
  def lineitem(spark: SparkSession, dir: String): DataFrame = normTs(table(spark, dir, "lineitem"))
  def orders(spark: SparkSession, dir: String): DataFrame   = normTs(table(spark, dir, "orders"))
  def customer(spark: SparkSession, dir: String): DataFrame = normTs(table(spark, dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame = normTs(table(spark, dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame     = normTs(table(spark, dir, "part"))
  def nation(spark: SparkSession, dir: String): DataFrame   = normTs(table(spark, dir, "nation"))
  def region(spark: SparkSession, dir: String): DataFrame   = normTs(table(spark, dir, "region"))
  def documents(spark: SparkSession, dir: String): DataFrame = normTs(table(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = normTs(table(spark, dir, "embeddings"))

  /** Fingerprint of the data snapshot at `dir`: md5 over the sorted
    * recursive file listing (path, length, mtime). Parquet writers
    * produce fresh part-file names on every rewrite, so any in-place
    * refresh changes the digest. Shared by the snapshot-scoped caches
    * (Dedup's hot-key probe, Analytics' edge snapshot) so "same path,
    * different data" can never serve a stale derivation. Cost: one
    * filesystem listing — orders cheaper than the Spark job each cache
    * avoids. */
  def snapshotFingerprint(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return "absent"
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      entries += s"${s.getPath}:${s.getLen}:${s.getModificationTime}"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(entries.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }
}
