package graft

import java.nio.file.Files

import graft.sinks.ParquetSink
import graft.sources.OdnsCsv
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

class ParquetSinkSpec extends SparkSpec {

  private def odnsDf(n: Int) = {
    val dir = Files.createTempDirectory("lake_src")
    OdnsFixtures.writeArchive(dir, "tcp_scan_2026-08-01.csv.gz",
      OdnsFixtures.TcpHeader, OdnsFixtures.tcpRows(n))
    OdnsCsv.read(spark, "tcp", dir.toString)
  }

  test("partitioned write prunes partitions at read time") {
    val out = Files.createTempDirectory("lake_out").toString + "/odns"
    ParquetSink.writePartitioned(odnsDf(6), out, Seq("protocol", "scan_date"))
    val back = spark.read.parquet(out).filter(col("protocol") === "tcp")
    assert(back.count() == 6)
    val plan = back.queryExecution.explainString(FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("protocol"), s"no partition pruning: $pf")
  }

  test("dynamic partition refresh replaces only matching partitions") {
    val out = Files.createTempDirectory("lake_refresh").toString + "/odns"
    val df = odnsDf(6)
    ParquetSink.writePartitioned(df, out, Seq("protocol"))
    // fake a second protocol partition by rewriting the column
    ParquetSink.refreshPartitions(
      df.withColumn("protocol", lit("udp")), out, Seq("protocol"))
    val back = spark.read.parquet(out)
    assert(back.filter(col("protocol") === "tcp").count() == 6) // untouched
    assert(back.filter(col("protocol") === "udp").count() == 6)
    // refresh tcp with fewer rows — replaces, doesn't accumulate
    ParquetSink.refreshPartitions(df.limit(2), out, Seq("protocol"))
    assert(spark.read.parquet(out).filter(col("protocol") === "tcp").count() == 2)
  }

  test("clustered write co-locates keys and keeps row order within files") {
    val out = Files.createTempDirectory("lake_cluster").toString + "/docs"
    ParquetSink.writeClustered(Tables.documents(spark, sf0001), out, "lang", 4)
    val back = spark.read.parquet(out)
    assert(back.count() == 500)
    assert(back.select("lang").distinct().count() == 5)
  }

  /** avg per-file (max-min) span of `c`, as a fraction of the global span. */
  private def relSpan(path: String, c: String): Double = {
    val back = spark.read.parquet(path)
      .withColumn("__f", input_file_name())
    val spans = back.groupBy(col("__f"))
      .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
      .agg(avg(col("span"))).collect()(0).getDouble(0)
    val g = back.agg((max(col(c)) - min(col(c))).cast("double")).collect()(0).getDouble(0)
    spans / g
  }

  test("bucketed tables sort-merge join with no exchange and no sort") {
    import graft.sinks.BucketedLake
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    BucketedLake.writeBucketed(o, "graft_ob", "o_orderkey", 8)
    BucketedLake.writeBucketed(l, "graft_lb", "l_orderkey", 8)
    // force SMJ (orders is broadcast-sized at sf0.001) to expose the
    // co-location: bucketed+sorted sides need neither exchange nor sort
    val j = spark.table("graft_lb").hint("merge")
      .join(spark.table("graft_ob"), col("l_orderkey") === col("o_orderkey"))
    val p = j.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    val expected = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(j.count() == expected)
    spark.sql("DROP TABLE IF EXISTS graft_ob")
    spark.sql("DROP TABLE IF EXISTS graft_lb")
  }

  test("keyed merge-upsert replaces matching keys, keeps survivors, skips untouched partitions") {
    import graft.sinks.ParquetSink
    val out = Files.createTempDirectory("lake_merge").toString + "/t"
    import spark.implicits._
    val base = Seq(
      (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "B", 40.0))
      .toDF("id", "part", "v")
    ParquetSink.writePartitioned(base, out, Seq("part"))
    val bFileTimes = Files.list(java.nio.file.Paths.get(s"$out/part=B"))
      .toArray.map(_.toString).sorted.mkString(",")
    // update id=1, insert id=5, both in partition A
    val updates = Seq((1L, "A", 11.0), (5L, "A", 50.0)).toDF("id", "part", "v")
    ParquetSink.mergeUpsert(updates, out, Seq("id"), Seq("part"))
    val back = spark.read.parquet(out)
    assert(back.count() == 5)
    assert(back.filter($"id" === 1L).select("v").collect()(0).getDouble(0) == 11.0)
    assert(back.filter($"id" === 2L).count() == 1) // survivor kept
    assert(back.filter($"id" === 5L).count() == 1) // insert applied
    // partition B was not rewritten (same files)
    val bAfter = Files.list(java.nio.file.Paths.get(s"$out/part=B"))
      .toArray.map(_.toString).sorted.mkString(",")
    assert(bAfter == bFileTimes, "untouched partition was rewritten")
  }

  test("z-ordered write keeps min/max tight on BOTH dimensions") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val zout = Files.createTempDirectory("lake_z").toString + "/li"
    ParquetSink.writeZOrdered(li, zout, "l_partkey", "l_suppkey", 16)
    assert(spark.read.parquet(zout).count() == li.count())
    // a linear sort on d1 leaves d2 unclustered (full span per file)…
    val lout = Files.createTempDirectory("lake_lin").toString + "/li"
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(lout)
    assert(relSpan(lout, "l_suppkey") > 0.8)
    // …while z-order shrinks BOTH (16 files ≈ 4×4 grid → ~1/4 span each)
    assert(relSpan(zout, "l_partkey") < 0.5, s"d1 span ${relSpan(zout, "l_partkey")}")
    assert(relSpan(zout, "l_suppkey") < 0.5, s"d2 span ${relSpan(zout, "l_suppkey")}")
  }
}
