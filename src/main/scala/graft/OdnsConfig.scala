package graft

import java.util.Properties

import graft.sinks.JdbcSink

/** config.ini-style configuration surface — the Spark-native mirror of
  * the reference's `configparser` setup (dataimporter.py:15-19,
  * config.ini.template): a `[db-connection-params]` section with
  * dbname/user/password/host/port and a `[db-table-names]` section
  * with the target table. Extra keys (e.g. `archive-root`, `jdbc-url`)
  * are carried so deployments can keep one file for the whole
  * pipeline. The parser is a minimal INI reader: `[section]` headers,
  * `key = value` lines, `#`/`;` comments — the subset the reference's
  * template uses.
  */
object OdnsConfig {

  final case class Config(sections: Map[String, Map[String, String]]) {

    def get(section: String, key: String): Option[String] =
      sections.get(section).flatMap(_.get(key))

    def db(key: String): Option[String] = get("db-connection-params", key)

    /** The reference reads the table name as
      * `config["db-table-names"]["odnstable"]` (dataimporter.py:19). */
    def table: String =
      get("db-table-names", "odnstable")
        .getOrElse(sys.error("config: missing [db-table-names] odnstable"))

    /** JDBC target assembled the way psycopg assembles DB_CONFIG
      * (dataimporter.py:15-18): host/port/dbname make the URL,
      * user/password ride as connection properties. An explicit
      * `jdbc-url` key overrides the Postgres construction so tests
      * (Derby) and other engines use the same file format. */
    def target: JdbcSink.Target = {
      val url = db("jdbc-url").getOrElse {
        val host = db("host").getOrElse("localhost")
        val port = db("port").getOrElse("5432")
        val name = db("dbname").getOrElse(sys.error("config: missing dbname"))
        s"jdbc:postgresql://$host:$port/$name"
      }
      val props = new Properties()
      db("user").foreach(props.setProperty("user", _))
      db("password").foreach(props.setProperty("password", _))
      JdbcSink.Target(url, table, props)
    }

    def archiveRoot: Option[String] = get("paths", "archive-root")
  }

  /** Raised for a `key = value` line before any `[section]` header —
    * the behavior of the mirrored `configparser`
    * (MissingSectionHeaderError): a malformed file must fail loudly,
    * not yield empty lookups. */
  final class MissingSectionHeaderException(line: String)
    extends IllegalArgumentException(
      s"config: key/value line before any [section] header: $line")

  def parse(text: String): Config = {
    var section: String = null
    val out = collection.mutable.Map.empty[String, Map[String, String]]
    text.linesIterator.map(_.trim).foreach {
      case l if l.isEmpty || l.startsWith("#") || l.startsWith(";") => ()
      case l if l.startsWith("[") && l.endsWith("]") =>
        section = l.substring(1, l.length - 1).trim
        out.getOrElseUpdate(section, Map.empty)
      case l if l.contains("=") =>
        if (section == null) throw new MissingSectionHeaderException(l)
        val (k, v) = l.splitAt(l.indexOf('='))
        out(section) = out.getOrElse(section, Map.empty) +
          (k.trim -> v.drop(1).trim)
      case _ => ()
    }
    Config(out.toMap)
  }

  def load(path: String): Config = {
    val src = scala.io.Source.fromFile(path)
    try parse(src.mkString) finally src.close()
  }
}
