package graft.functions

import org.apache.spark.sql.graft.VectorExpressions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, expr}

/** Vector math over array columns.
  *
  * Float-vector paths use the native codegen'd Catalyst expressions
  * (graft.expressions); mixed/double arrays fall back to higher-order
  * functions. Both accumulate products in double, left-to-right in array
  * order, matching the DuckDB oracle's `list_sum(list_transform(...))`
  * bit-for-bit.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ for two `array<float>` columns — native codegen loop. */
  def dot(a: String, b: String): Column = VectorExpressions.dot(col(a), col(b))

  /** Σ aᵢ·bᵢ for float OR double array columns (each side read at its
    * stored precision — no implicit array cast) — native codegen loop,
    * bit-identical to the `aggregate(zip_with(...))` fold it replaces. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** |a| for an `array<float>` column — native codegen loop. */
  def norm2(a: String): Column = VectorExpressions.norm(col(a))

  /** Σ (aᵢ−bᵢ)² for float OR double array columns (each side read at
    * its stored precision) — native codegen loop, bit-identical to the
    * `aggregate(zip_with(...))` fold it replaces. */
  def l2sq(a: Column, b: Column): Column = VectorExpressions.l2sq(a, b)

  /** HOF fallback for arrays of any numeric element type (e.g. the
    * double-typed centroid vectors). */
  def dotHof(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)")

  def norm2Hof(a: String): Column = expr(
    s"sqrt(aggregate($a, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))")

  /** Cosine similarity dot/(|a|·|b|) for float vectors. */
  def cosine(a: String, b: String): Column =
    dot(a, b).divide(norm2(a).multiply(norm2(b)))
}
