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

  test("schema evolution: mergeSchema unions old and new parquet layouts") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("fmt_evo").toString + "/docs"
    // v1 writers know (doc_id, lang); a later deploy adds quality_score
    docs.select(col("doc_id"), col("lang"))
      .write.parquet(dir + "/batch=1")
    docs.select(col("doc_id"), col("lang"),
        (length(col("text")) % 100).cast("double").as("quality_score"))
      .write.parquet(dir + "/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq ==
      Seq("batch", "doc_id", "lang", "quality_score"))
    assert(merged.count() == docs.count() * 2)
    // old rows surface the new column as null, new rows carry values
    assert(merged.filter(col("batch") === 1)
      .filter(col("quality_score").isNotNull).count() == 0)
    assert(merged.filter(col("batch") === 2)
      .filter(col("quality_score").isNull).count() == 0)
  }
}
