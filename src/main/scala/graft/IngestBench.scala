package graft

import java.nio.file.{Files, Paths}

import graft.sources.OdnsCsv

/** Ingest throughput benchmark — the reference's actual workload
  * (gzip CSV → typed rows → store). Generates synthetic tcp archives,
  * then times the distributed read+type+write path end to end.
  *
  * Usage: runMain graft.IngestBench [rowsPerFile] [nFiles]
  * Prints one JSON line with rows/sec for parse-only and parse+parquet.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val rowsPerFile = args.headOption.map(_.toInt).getOrElse(250000)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("ingest_bench")
    val header = OdnsCsv.csvColumns("tcp").mkString(";")
    (0 until nFiles).foreach { f =>
      val p = dir.resolve(f"tcp_scan_2026-08-${f + 1}%02d.csv.gz")
      val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        new java.util.zip.GZIPOutputStream(
          new java.io.FileOutputStream(p.toFile)), "UTF-8"), 1 << 20)
      out.write(header); out.newLine()
      var i = 0
      while (i < rowsPerFile) {
        out.write(s"1.2.${i % 256}.${i % 250};5.6.7.$f;9.9.9.9;" +
          s"2026-08-0${f + 1} 10:${i % 60}:${i % 60}.${100000 + i % 899999};" +
          s"2026-08-0${f + 1} 10:${i % 60}:${i % 60}.${200000 + i % 799999};A;" +
          s"DE;${3320 + i % 1000};1.2.0.0/16;OrgA;US;${701 + i % 500};5.6.0.0/16;OrgB;" +
          s"FR;${1111 + i % 300};9.9.0.0/16;")
        out.newLine()
        i += 1
      }
      out.close()
    }
    val total = rowsPerFile.toLong * nFiles

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm up the session
    spark.range(1000).count()

    val (_, tParse) = time {
      OdnsCsv.read(spark, "tcp", dir.toString).filter("timestamp_request IS NOT NULL").count()
    }
    val outPq = Files.createTempDirectory("ingest_out").toString + "/pq"
    val (_, tWrite) = time {
      OdnsCsv.read(spark, "tcp", dir.toString)
        .write.mode("overwrite").parquet(outPq)
    }
    println(s"""{"metric":"ingest_rows_per_sec","rows":$total,"files":$nFiles,""" +
      s""""parse_sec":$tParse,"parse_rows_per_sec":${(total / tParse).toLong},""" +
      s""""parse_write_sec":$tWrite,"parse_write_rows_per_sec":${(total / tWrite).toLong}}""")
    spark.stop()
  }
}
