package graft

import java.nio.file.Files

import graft.sinks.JdbcSink
import graft.sources.OdnsCsv

/** OPT-IN Postgres integration battery for [[JdbcSink]] — the real-
  * dialect half of the JdbcSinkSpec/Derby evidence (r11 verdict #1).
  * Exercises every assumption the sink's "Postgres dialect contract"
  * scaladoc pins: unquoted case-folded identifiers, DELETE+append
  * refresh semantics, per-partition batched commits, TEXT/timestamp
  * type mapping, and the update-else-insert upsert.
  *
  * Run with a real server (no Postgres ships in the build sandbox —
  * the tests CANCEL, not pass, when unconfigured):
  * {{{
  *   sbt -DpgUrl='jdbc:postgresql://host:5432/db?user=u&password=p' \
  *       'testOnly graft.PostgresIntegrationSpec'
  * }}}
  * The Postgres JDBC driver jar must be on the classpath (drop
  * postgresql-*.jar into a lib/ directory or extend the unmanaged
  * jars path) — it is not bundled with Spark's jars. Each run uses a
  * fresh `graft_it_*` table pair and drops it afterwards.
  */
class PostgresIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private def pgUrl: Option[String] =
    sys.props.get("pgUrl").orElse(sys.env.get("PG_URL")).filter(_.nonEmpty)

  private def withTable(test: JdbcSink.Target => Unit): Unit = {
    assume(pgUrl.nonEmpty, "-DpgUrl not set: Postgres integration skipped")
    val table = s"graft_it_${System.nanoTime()}"
    val t = JdbcSink.Target(pgUrl.get, table)
    val conn = t.connection()
    try {
      val cols = OdnsCsv.TableColumns.collect {
        case c @ ("timestamp_request" | "timestamp_response") => s"$c timestamp"
        case c @ ("asn_request" | "asn_response" | "asn_arecord") => s"$c double precision"
        case c => s"$c text"
      }
      val st = conn.createStatement()
      // lower-case unquoted DDL — the case-folding convention the
      // contract requires of deployments
      try st.executeUpdate(s"CREATE TABLE $table (${cols.mkString(", ")})")
      finally st.close()
    } finally conn.close()
    try test(t)
    finally {
      val c2 = t.connection()
      try {
        val st = c2.createStatement()
        try st.executeUpdate(s"DROP TABLE IF EXISTS $table") finally st.close()
      } finally c2.close()
    }
  }

  private def odnsDf(protocol: String, n: Int) = {
    val dir = Files.createTempDirectory(s"pg_$protocol")
    val (header, rows) =
      if (protocol == "tcp") (OdnsFixtures.TcpHeader, OdnsFixtures.tcpRows(n))
      else (OdnsFixtures.UdpHeader, OdnsFixtures.udpRows(n))
    OdnsFixtures.writeArchive(dir, s"${protocol}_scan_2026-08-01.csv.gz", header, rows)
    OdnsCsv.read(spark, protocol, dir.toString)
  }

  test("pg: append writes batched rows; read-back types are TEXT/timestamp/double") {
    withTable { t =>
      JdbcSink.append(odnsDf("tcp", 5), t, batchSize = 2)
      assert(JdbcSink.count(t) == 5)
      val back = spark.read.format("jdbc")
        .option("url", t.url).option("dbtable", t.table).load()
      // Postgres folds unquoted identifiers to lower case
      assert(back.filter($"protocol" === "tcp").count() == 5)
      val asn = back.schema.find(_.name == "asn_request").get
      assert(asn.dataType.typeName == "double")
      val ts = back.schema.find(_.name == "timestamp_request").get
      assert(ts.dataType.typeName.startsWith("timestamp"))
    }
  }

  test("pg: refreshPartition replaces one protocol and leaves the other intact (re-run idempotent)") {
    withTable { t =>
      JdbcSink.refreshPartition(odnsDf("tcp", 5), t, "protocol", "tcp")
      JdbcSink.refreshPartition(odnsDf("udp", 3), t, "protocol", "udp")
      assert(JdbcSink.count(t) == 8)
      JdbcSink.refreshPartition(odnsDf("tcp", 2), t, "protocol", "tcp")
      assert(JdbcSink.count(t) == 5)
      // recovery contract: re-running the same refresh converges
      JdbcSink.refreshPartition(odnsDf("tcp", 2), t, "protocol", "tcp")
      assert(JdbcSink.count(t) == 5)
    }
  }

  test("pg: upsert is idempotent per key and updates values in place") {
    withTable { t =>
      // reuse two text columns of the odns table as a (key, value) pair
      val kv = Seq(("k1", "v1"), ("k2", "v2")).toDF("protocol", "qtype")
      JdbcSink.upsert(kv.select($"protocol", $"qtype"),
        t.copy(), Seq("protocol"))
      val kv2 = Seq(("k1", "v1b"), ("k3", "v3")).toDF("protocol", "qtype")
      JdbcSink.upsert(kv2, t.copy(), Seq("protocol"))
      val back = spark.read.format("jdbc")
        .option("url", t.url).option("dbtable", t.table).load()
        .select($"protocol", $"qtype").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(back == Map("k1" -> "v1b", "k2" -> "v2", "k3" -> "v3"))
    }
  }

  test("pg: deleteWhere still rejects unsafe identifiers (guard is dialect-independent)") {
    assume(pgUrl.nonEmpty, "-DpgUrl not set: Postgres integration skipped")
    intercept[IllegalArgumentException] {
      JdbcSink.deleteWhere(JdbcSink.Target(pgUrl.get, "graft_it_guard"),
        "protocol; DROP TABLE x", "tcp")
    }
  }
}
