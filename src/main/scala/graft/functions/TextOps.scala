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

  /** Word 3-gram shingles over a token array column (1-based
    * element_at matches the oracle's 1-based list indexing). */
  def shingles3(toks: String): Column = expr(
    s"transform(sequence(1, size($toks) - 2), i -> concat(element_at($toks, i), ' ', element_at($toks, i + 1), ' ', element_at($toks, i + 2)))")

  /** 8-permutation MinHash signature: permutation i is the md5 keyed by
    * the seed `i`, min taken lexicographically over hex digests — a
    * valid min-wise hash family that both engines compute identically. */
  def minhashSig(shingles: String, perms: Int = 8): Column = expr(
    s"transform(sequence(0, ${perms - 1}), i -> array_min(transform($shingles, s -> md5(concat(cast(i as string), ':', s)))))")

  /** Adds toks + shingles columns, dropping docs too short to shingle.
    * NOTE: keeps the shingle list as a per-row array; for operators that
    * immediately explode it, prefer [[shingleRows]] — Catalyst's project
    * collapse inlines the `toks` HOF into every element_at of the
    * shingle lambda, turning this form quadratic in tokens. */
  def withShingles(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("toks", tokens(textCol))
      .filter(expr("size(toks) >= 3"))
      .withColumn("shingles", shingles3("toks"))

  /** One row per 3-gram shingle occurrence, in token order: posexplode
    * evaluates the tokenizer once per document, then a window `lead`
    * assembles shingles in whole-stage codegen — linear in tokens, one
    * shuffle on the doc key. Produces exactly the same shingle multiset
    * as [[withShingles]]. */
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
}
