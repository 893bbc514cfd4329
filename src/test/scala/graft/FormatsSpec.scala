package graft

import java.nio.file.Files

/** Multi-format source/sink coverage: the engine reads and writes every
  * columnar/text format shipped with Spark (parquet is the primary lake
  * format; ORC for interop, JSON-lines and CSV for exchange). Fidelity
  * is asserted by exact set equality against the parquet original. */
class FormatsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf0001)

  private def roundTrips(write: String => Unit, read: String => org.apache.spark.sql.DataFrame): Unit = {
    val dir = Files.createTempDirectory("fmt").toString + "/docs"
    write(dir)
    val back = read(dir)
    assert(back.count() == docs.count())
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }

  test("ORC round-trip preserves every row and type") {
    roundTrips(
      d => docs.write.orc(d),
      d => spark.read.orc(d))
  }

  test("JSON-lines round-trip preserves every row (schema re-applied)") {
    roundTrips(
      d => docs.write.json(d),
      d => spark.read.schema(docs.schema).json(d))
  }

  test("CSV round-trip with quoting preserves free-text rows") {
    roundTrips(
      d => docs.write.option("header", "true").csv(d),
      d => spark.read.option("header", "true").schema(docs.schema).csv(d))
  }
}
