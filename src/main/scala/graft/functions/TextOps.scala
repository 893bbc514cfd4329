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

  /** Round-robin rebalance before a compute-heavy per-row stage.
    * Higher-order-function lambdas evaluate interpreted (outside
    * whole-stage codegen), so a narrow scan — locally often a single
    * parquet file = a single partition — serializes them. A small
    * row-level shuffle of the raw docs buys full-core parallelism for
    * the expensive map stage (measured 3-4x on the shingle/minhash
    * ops). At cluster scale the scan's own splits usually provide this
    * and the exchange coalesces to a no-op under AQE; the pattern
    * (rebalance input before expensive map work) is the same one you'd
    * apply on a 1000-executor job after a selective filter. */
  def balanced(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** 3-gram shingle array per row, in token order — computed entirely
    * map-side (no shuffle, no explode). The token array is bound as a
    * higher-order-function LAMBDA VARIABLE (`transform(array(toks),
    * t -> …)`): lambda variables cannot be inlined by CollapseProject,
    * so the tokenizer runs once per row even though the shingle lambda
    * reads it per element. (A plain `toks` column referenced inside a
    * lambda body gets inlined and re-split per element — the hidden
    * quadratic that forced a window-based shape in round 1.)
    *
    * Docs with <3 tokens yield an empty array; callers filter
    * `size(...) > 0` to reproduce the reference's WHERE len(t) >= 3. */
  def shingleArray(textCol: String): Column = ngramArray(textCol, 3)

  /** Word n-gram array per row, same lambda-binding shape as
    * [[shingleArray]] (which is the n=3 case). */
  def ngramArray(textCol: String, n: Int): Column = {
    val gram = (0 until n).map(j => s"element_at(t, i + $j)").mkString(", ")
    expr(
      s"""element_at(transform(array(filter(split($textCol, ' '), x -> x != '')),
         |  t -> if(size(t) < $n, cast(array() as array<string>),
         |    transform(sequence(1, size(t) - ${n - 1}),
         |      i -> concat_ws(' ', $gram)))),
         |1)""".stripMargin)
  }

  // NOTE (round 1): a persist()-based session cache of the shingle
  // intermediate was measured SLOWER than recomputation (cache
  // materialization breaks whole-stage fusion and adds a job per
  // consumer) — at real scale a shared shingle intermediate belongs in
  // a parquet table, not executor cache. Shingles are now recomputed
  // map-side per consumer, which is strictly cheaper than the round-1
  // posexplode+window shape (one shuffle per consumer eliminated).
}
