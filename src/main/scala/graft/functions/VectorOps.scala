package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Vector math over `array<float>` columns using Catalyst higher-order
  * functions — codegen'd, no UDFs, no driver involvement.
  *
  * Determinism: products are computed in double and summed left-to-right
  * in array order (`aggregate` is a sequential fold), which matches the
  * DuckDB oracle's `list_sum(list_transform(...))` evaluation exactly —
  * bit-identical results on both engines.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double, sequential fold over array order. */
  def dot(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)")

  def norm2(a: String): Column = expr(
    s"sqrt(aggregate($a, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))")

  /** Cosine similarity dot/(|a|·|b|), same formula text as the oracle. */
  def cosine(a: String, b: String): Column =
    dot(a, b).divide(norm2(a).multiply(norm2(b)))
}
