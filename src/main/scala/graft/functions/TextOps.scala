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
    * map-side (no shuffle, no explode).
    *
    * Docs with <3 tokens yield an empty array; callers filter
    * `size(...) > 0` to reproduce the reference's WHERE len(t) >= 3. */
  def shingleArray(textCol: String): Column = ngramArray(textCol, 3)

  /** Word n-gram array per row — a native codegen expression
    * (org.apache.spark.sql.graft.WordNgrams): one compiled
    * tokenize+join pass per row instead of the interpreted
    * lambda-bound HOF cascade it replaces (which itself replaced a
    * CollapseProject-inlined quadratic — see the git history for both
    * shapes; the HOF cascade remains the reference formulation the
    * expression is asserted against in TextExpressionsSpec). */
  def ngramArray(textCol: String, n: Int): Column =
    org.apache.spark.sql.graft.TextExpressions.wordNgrams(col(textCol), n)

  // NOTE (round 1): a persist()-based session cache of the shingle
  // intermediate was measured SLOWER than recomputation (cache
  // materialization breaks whole-stage fusion and adds a job per
  // consumer) — at real scale a shared shingle intermediate belongs in
  // a parquet table, not executor cache. Shingles are now recomputed
  // map-side per consumer, which is strictly cheaper than the round-1
  // posexplode+window shape (one shuffle per consumer eliminated).
}
