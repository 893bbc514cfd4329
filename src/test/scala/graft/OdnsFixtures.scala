package graft

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

/** Synthetic ODNS CSV archives mirroring the reference's input layout. */
object OdnsFixtures {

  val TcpHeader: String = graft.sources.OdnsCsv.csvColumns("tcp").mkString(";")
  val UdpHeader: String = graft.sources.OdnsCsv.csvColumns("udp").mkString(";")

  def tcpRows(n: Int): Seq[String] = (0 until n).map { i =>
    Seq(
      s"1.2.3.$i", s"5.6.7.$i", s"9.9.9.$i",
      s"2026-08-01 10:00:0$i.00000$i",
      if (i % 3 == 0) "" else s"2026-08-01 10:00:0$i.10000$i", // some missing
      "A",
      "DE", s"${3320 + i}", s"1.2.3.0/24", "OrgA",
      "US", if (i % 4 == 0) "notanasn" else s"${701 + i}", "5.6.7.0/24", "OrgB",
      "FR", s"${1111 + i}", "9.9.9.0/24", "")
      .mkString(";")
  }

  def udpRows(n: Int): Seq[String] = (0 until n).map { i =>
    Seq(
      s"10.2.3.$i", s"50.6.7.$i", s"90.9.9.$i",
      s"2026-08-02 11:00:0$i.00000$i",
      "NOERROR",
      "NL", s"${2000 + i}", "10.2.3.0/24", "OrgC",
      "JP", s"${3000 + i}", "50.6.7.0/24", "OrgD",
      "BR", "", "90.9.9.0/24", "OrgE")
      .mkString(";")
  }

  /** Write a gzipped semicolon CSV like `tcp_scan_2026-08-01.csv.gz`. */
  def writeArchive(dir: Path, name: String, header: String, rows: Seq[String]): Path = {
    Files.createDirectories(dir)
    val f = dir.resolve(name)
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(f.toFile)), "UTF-8"))
    try {
      w.write(header); w.newLine()
      rows.foreach { r => w.write(r); w.newLine() }
    } finally w.close()
    f
  }
}
