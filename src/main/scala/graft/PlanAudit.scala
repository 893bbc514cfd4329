package graft

import java.nio.file.{Files, Paths}

/** Perf/plan audit tool: runs each query twice (cold/warm) and dumps the
  * formatted physical plan to target/plans/<name>.txt for pushdown /
  * broadcast / codegen inspection.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [query...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wanted = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // production extensions on, same as Bench/Verify — SQL-named
      // graft functions (log2_fixed, simhash60, …) must resolve here
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("target/plans"))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.isEmpty || wanted.contains(n))
    println(f"${"query"}%-22s ${"cold_s"}%8s ${"warm_s"}%8s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val cold = once(); val warm = once()
        Files.writeString(Paths.get(s"target/plans/$name.txt"),
          fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        println(f"$name%-22s $cold%8.2f $warm%8.2f")
      } catch { case e: Throwable =>
        println(f"$name%-22s FAILED ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
