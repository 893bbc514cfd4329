package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf0001 = "/root/testdata/sf0.001"

  /** Exact-integer column decoder across the engine's three output-edge
    * carriers (BIGINT, exact-decimal TEXT, internal DecimalType in
    * pre-output tests) — shared so the next carrier change cannot
    * desynchronize sibling suites. */
  def big(r: org.apache.spark.sql.Row, i: Int): BigInt = r.get(i) match {
    case d: java.math.BigDecimal => BigInt(d.toBigInteger)
    case l: java.lang.Long       => BigInt(l)
    case i2: java.lang.Integer   => BigInt(i2.intValue)
    case s: String               => BigInt(s)
    case o => sys.error(s"unexpected type for exact-int column: $o")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // production sessions (Bench/Verify/OdnsApp) register the native
    // graft functions via GraftExtensions; mirror that here so
    // operators using SQL-named functions (log2_fixed, simhash60, …)
    // run identically under test
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    s
  }
}
