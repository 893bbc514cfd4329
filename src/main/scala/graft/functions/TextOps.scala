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

  /** Adds toks + shingles columns, dropping docs too short to shingle. */
  def withShingles(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("toks", tokens(textCol))
      .filter(expr("size(toks) >= 3"))
      .withColumn("shingles", shingles3("toks"))
}
