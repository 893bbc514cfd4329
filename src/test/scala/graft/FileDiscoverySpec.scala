package graft

import java.nio.file.{Files, Path}

import graft.sources.FileDiscovery

class FileDiscoverySpec extends SparkSpec {

  private def touch(dir: Path, name: String, mtime: Long): Unit = {
    val f = dir.resolve(name)
    Files.write(f, "x".getBytes)
    f.toFile.setLastModified(mtime)
  }

  test("mostRecent picks the newest matching archive by mtime") {
    val dir = Files.createTempDirectory("disc")
    touch(dir, "tcp_scan_2026-08-01.csv.gz", 1000000L)
    touch(dir, "tcp_scan_2026-08-03.csv.gz", 3000000L)
    touch(dir, "tcp_scan_2026-08-02.csv.gz", 2000000L)
    touch(dir, "udp_scan_2026-08-09.csv.gz", 9000000L) // wrong prefix
    touch(dir, "tcp_scan_2026-08-04.txt", 9000000L)    // wrong extension
    val got = FileDiscovery.mostRecent(dir.toString, "tcp", "csv.gz")
    assert(got.exists(_.endsWith("tcp_scan_2026-08-03.csv.gz")))
  }

  test("mostRecent on missing or empty dir is None") {
    assert(FileDiscovery.mostRecent("/nonexistent/dir", "tcp", "csv.gz").isEmpty)
    val empty = Files.createTempDirectory("disc_empty")
    assert(FileDiscovery.mostRecent(empty.toString, "tcp", "csv.gz").isEmpty)
  }

  test("all lists every matching archive sorted") {
    val dir = Files.createTempDirectory("disc_all")
    touch(dir, "tcp_b.csv.gz", 2000000L)
    touch(dir, "tcp_a.csv.gz", 1000000L)
    touch(dir, "other.csv.gz", 1000000L)
    val got = FileDiscovery.all(dir.toString, "tcp", "csv.gz")
    assert(got.map(_.split('/').last) == Seq("tcp_a.csv.gz", "tcp_b.csv.gz"))
  }

  test("file date extraction mirrors the reference regex") {
    assert(FileDiscovery.extractFileDate("/x/y/tcp_scan_2026-08-01.csv.gz")
      .contains("2026-08-01"))
    assert(FileDiscovery.extractFileDate("/2026-01-01/nodate.csv.gz").isEmpty)
  }

  test("archive layout path") {
    assert(FileDiscovery.dataPath("/data", 2026, "tcp") == "/data/2026/tcp/")
  }

  test("moveProcessed relocates the archive, creating the destination dir") {
    val dir = Files.createTempDirectory("disc_move")
    touch(dir, "tcp_done.csv.gz", 1000000L)
    val dest = dir.resolve("processed")
    assert(FileDiscovery.moveProcessed(
      dir.resolve("tcp_done.csv.gz").toString, dest.toString))
    assert(!Files.exists(dir.resolve("tcp_done.csv.gz")))
    assert(Files.exists(dest.resolve("tcp_done.csv.gz")))
    // missing source: false, no throw (reference prints and continues)
    assert(!FileDiscovery.moveProcessed(
      dir.resolve("absent.csv.gz").toString, dest.toString))
  }

  test("delete removes the temp file and is false on a missing one") {
    val dir = Files.createTempDirectory("disc_del")
    touch(dir, "tmp.csv", 1000000L)
    assert(FileDiscovery.delete(dir.resolve("tmp.csv").toString))
    assert(!Files.exists(dir.resolve("tmp.csv")))
    assert(!FileDiscovery.delete(dir.resolve("tmp.csv").toString))
  }
}
