package graft
import org.apache.spark.sql.SparkSession
import scala.collection.immutable.ListMap

/** Benchmark main: runs every registered query on
  * `SPARK_GRAFT_SF_DIR`, twice each, and reports the min wall-time
  * (repeat-min damps host-contention noise — observed driver runs
  * where an untouched query measured 60x a clean rerun). Output
  * protocol: the per-query map goes on its own line FIRST, and a
  * short total-only JSON record is the LAST line of stdout, so a
  * consumer that keeps only a bounded tail of the output still sees
  * the headline metric. A throwing query is reported in an explicit
  * "errors" list (never a fake wall-time) and excluded from total. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen compiler, shuffle machinery, FS client,
    // broadcast + hash-join paths) so the first measured query isn't
    // charged JVM/executor startup — standard bench hygiene; every
    // query below is still measured end-to-end
    locally {
      import org.apache.spark.sql.functions.broadcast
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey")).count()
      n.as("a").hint("shuffle_hash")
        .join(n.as("b"), org.apache.spark.sql.functions.expr("a.n_nationkey = b.n_nationkey"))
        .count()
      n.groupBy("n_regionkey").count().collect()
      spark.range(1000).selectExpr("sum(id)").collect()
    }
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable => Left(e.getClass.getSimpleName + ": " +
        Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(160)) }
    }
    // optional comma-separated subset for focused micro-benching
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val runs = ListMap(selected: _*).map { case (name, fn) =>
      val a = timeOnce(fn)
      val b = if (a.isRight) timeOnce(fn) else a
      name -> (for (x <- a; y <- b) yield math.min(x, y))
    }
    val ok = runs.collect { case (k, Right(v)) => k -> v }
    val errs = runs.collect { case (k, Left(m)) => k -> m }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val es = errs.map { case (k, m) => "\"" + k + "\":\"" + esc(m) + "\"" }.mkString("{", ",", "}")
    val total = ok.values.sum
    // per-query detail first (may be truncated by tail-limited consumers)
    println(s"""{"metric":"queries","queries":$qs,"errors":$es,"n_ok":${ok.size},"n_err":${errs.size},"sf":"$sfDir"}""")
    // the LAST stdout line is the short headline record
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${ok.size},"n_errors":${errs.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
