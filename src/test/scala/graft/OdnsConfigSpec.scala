package graft

import java.nio.file.Files

/** The config.ini surface (reference config.ini.template +
  * dataimporter.py:15-19): section parsing, Postgres URL assembly,
  * jdbc-url override, and wiring the health check from a file. */
class OdnsConfigSpec extends SparkSpec {

  private val template =
    """# comment
      |[db-connection-params]
      |dbname = db
      |user = dbuser
      |password = dbpwd
      |host = dbhost
      |port = 5433
      |
      |[db-table-names]
      |odnstable = odns.dns_entries
      |""".stripMargin

  test("parses the reference template shape into sections") {
    val cfg = OdnsConfig.parse(template)
    assert(cfg.db("dbname").contains("db"))
    assert(cfg.db("user").contains("dbuser"))
    assert(cfg.table == "odns.dns_entries")
  }

  test("target assembles the psycopg-style connection: URL from host/port/dbname, credentials as properties") {
    val t = OdnsConfig.parse(template).target
    assert(t.url == "jdbc:postgresql://dbhost:5433/db")
    assert(t.table == "odns.dns_entries")
    assert(t.properties.getProperty("user") == "dbuser")
    assert(t.properties.getProperty("password") == "dbpwd")
  }

  test("jdbc-url override + [paths] archive-root drive the health check from one file") {
    val dbDir = Files.createTempDirectory("derby_cfg").resolve("cfg_db")
    val root = Files.createTempDirectory("cfg_root")
    val cfg = OdnsConfig.parse(
      s"""[db-connection-params]
         |jdbc-url = jdbc:derby:$dbDir;create=true
         |[db-table-names]
         |odnstable = odns_entries
         |[paths]
         |archive-root = $root
         |""".stripMargin)
    assert(cfg.archiveRoot.contains(root.toString))
    assert(OdnsPipeline.checkJdbc(cfg.target), "Derby target from config must connect")
    assert(OdnsPipeline.checkArchiveRoot(spark, cfg.archiveRoot.get))
    assert(!OdnsPipeline.checkArchiveRoot(spark, "/nonexistent/odns/root"))
  }

  test("load reads from a file path like configparser.read") {
    val f = Files.createTempDirectory("cfg").resolve("config.ini")
    Files.write(f, template.getBytes)
    assert(OdnsConfig.load(f.toString).table == "odns.dns_entries")
  }
}
