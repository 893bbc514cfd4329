package graft

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference container's invocation
  * surface (dataimporter.py:203-232): `--check-health` probes the
  * JDBC target and the archive root and exits 0 (healthy) / 1, with
  * the same message shapes; without flags it runs the ingest
  * (discover latest archive per protocol → typed read → refresh
  * load). Configuration comes from a config.ini-style file
  * (`--config <path>`, default `config.ini`) — see [[OdnsConfig]].
  *
  * Exit codes are the reference's health-check contract
  * (dataimporter.py:212-227): 0 healthy, 1 any probe failed.
  */
object OdnsApp {

  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 1).collect {
      case Array(k, v) if k.startsWith("--") && !v.startsWith("--") => k -> v
    }.toMap
    val configPath = argMap.getOrElse("--config", "config.ini")
    val cfg = OdnsConfig.load(configPath)
    val target = cfg.target
    val archiveRoot = argMap.get("--archive-root")
      .orElse(cfg.archiveRoot)
      .getOrElse(sys.error("config: missing [paths] archive-root"))

    val spark = SparkSession.builder()
      .appName("odns-importer")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    // compute the exit code first: sys.exit inside the try would skip
    // the finally, leaving the session to the shutdown hook
    val exitCode =
      try {
        if (args.contains("--check-health")) {
          println("[*] Health check...")
          val pg = OdnsPipeline.checkJdbc(target)
          val drive = OdnsPipeline.checkArchiveRoot(spark, archiveRoot)
          if (pg && drive) {
            println("[*] System healthy.")
            0
          } else {
            if (!pg) println("[*] No database connection.")
            if (!drive) println("[*] Failed to access data drive.")
            1
          }
        } else {
          println("[*] Processing data.")
          val year = argMap.get("--year").map(_.toInt)
            .getOrElse(java.time.Year.now().getValue)
          val results = OdnsPipeline.run(spark, archiveRoot, target, year,
            ingestAll = args.contains("--all"))
          results.foreach { r =>
            println(s"[*] ${r.protocol}: ${r.archive.getOrElse("no archive")} -> ${r.rows} rows")
          }
          0
        }
      } finally spark.stop()
    sys.exit(exitCode)
  }
}
