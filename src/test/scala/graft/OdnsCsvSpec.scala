package graft

import java.nio.file.Files

import graft.sources.OdnsCsv
import org.apache.spark.sql.functions._

class OdnsCsvSpec extends SparkSpec {

  test("tcp archive reads with full 20-col layout, typing, protocol and scan_date") {
    val dir = Files.createTempDirectory("odns_tcp")
    OdnsFixtures.writeArchive(dir, "tcp_scan_2026-08-01.csv.gz",
      OdnsFixtures.TcpHeader, OdnsFixtures.tcpRows(6))
    val df = OdnsCsv.read(spark, "tcp", dir.toString)

    assert(df.columns.toSeq == OdnsCsv.TableColumns)
    assert(df.count() == 6)
    val rows = df.orderBy("ip_request").collect()
    assert(rows.forall(_.getAs[String]("protocol") == "tcp"))
    assert(rows.forall(_.getAs[String]("scan_date") == "2026-08-01"))
    // timestamps typed; every 3rd row has empty timestamp_response → null
    assert(df.filter(col("timestamp_request").isNull).count() == 0)
    assert(df.filter(col("timestamp_response").isNull).count() == 2)
    // asn typed to double with null-on-failure (every 4th asn_response bad)
    assert(df.schema("asn_request").dataType.typeName == "double")
    assert(df.filter(col("asn_response").isNull).count() == 2)
    // empty org_arecord → null
    assert(df.filter(col("org_arecord").isNull).count() == 6)
  }

  test("udp archive fills missing timestamp_response with null") {
    val dir = Files.createTempDirectory("odns_udp")
    OdnsFixtures.writeArchive(dir, "udp_scan_2026-08-02.csv.gz",
      OdnsFixtures.UdpHeader, OdnsFixtures.udpRows(4))
    val df = OdnsCsv.read(spark, "udp", dir.toString)
    assert(df.columns.toSeq == OdnsCsv.TableColumns)
    assert(df.count() == 4)
    assert(df.filter(col("timestamp_response").isNull).count() == 4)
    assert(df.filter(col("protocol") === "udp").count() == 4)
    // asn_arecord empty on every udp row → null via floatTyper("")
    assert(df.filter(col("asn_arecord").isNull).count() == 4)
  }

  test("malformed rows degrade to nulls, never crash the read") {
    val dir = Files.createTempDirectory("odns_bad")
    val goodRows = OdnsFixtures.tcpRows(2)
    val badRows = Seq(
      "only;three;fields",                       // too few columns
      OdnsFixtures.tcpRows(1).head + ";extra1;extra2", // too many columns
      "")                                        // blank line
    OdnsFixtures.writeArchive(dir, "tcp_scan_2026-08-01.csv.gz",
      OdnsFixtures.TcpHeader, goodRows ++ badRows)
    val df = OdnsCsv.read(spark, "tcp", dir.toString)
    val rows = df.collect() // must not throw (PERMISSIVE mode)
    assert(rows.length >= goodRows.length)
    // the well-formed rows are intact
    assert(df.filter(col("timestamp_request").isNotNull).count() >= 2)
  }

  test("multiple archives read in one pass with per-file scan_date") {
    val dir = Files.createTempDirectory("odns_multi")
    OdnsFixtures.writeArchive(dir, "tcp_scan_2026-08-01.csv.gz",
      OdnsFixtures.TcpHeader, OdnsFixtures.tcpRows(3))
    OdnsFixtures.writeArchive(dir, "tcp_scan_2026-08-02.csv.gz",
      OdnsFixtures.TcpHeader, OdnsFixtures.tcpRows(2))
    val df = OdnsCsv.read(spark, "tcp", dir.toString)
    val byDate = df.groupBy("scan_date").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDate == Map("2026-08-01" -> 3L, "2026-08-02" -> 2L))
  }
}
