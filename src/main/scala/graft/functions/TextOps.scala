package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text primitives for dedup/quality operators. All Catalyst
  * higher-order functions — per-row array work stays inside whole-stage
  * codegen; nothing here shuffles or touches the driver.
  */
object TextOps {

  /** Whitespace tokens with empties dropped (split keeps them). */
  def tokens(text: String): Column =
    expr(s"filter(split($text, ' '), x -> x != '')")

  /** One row per 3-gram shingle occurrence, in token order: posexplode
    * evaluates the tokenizer once per document, then a window `lead`
    * assembles shingles in whole-stage codegen — linear in tokens, one
    * shuffle on the doc key. (A per-row array formulation via nested
    * HOFs gets inlined by CollapseProject and re-tokenizes per element —
    * hidden quadratic; this shape avoids it.) */
  def shingleRows(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    df.select(col(idCol), posexplode(tokens(textCol)).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col(idCol), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("s"))
  }

  // NOTE: a persist()-based session cache of the shingle table was
  // measured SLOWER than recomputation here (cache materialization
  // breaks whole-stage fusion and adds a job per consumer) — at real
  // scale the shared intermediate belongs in a parquet shingle table,
  // not executor cache.
}
