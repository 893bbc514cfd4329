// Hosted inside the spark.sql package hierarchy because the extension
// surface (AbstractDataType) is private[sql] — the established pattern
// for libraries shipping native expressions (see VectorExpressions).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Fixed-point base-2 logarithm of a positive BIGINT at scale 2²⁰:
  * returns `floor(log2(x)) · 2²⁰ + frac₂₀`, where frac₂₀ is the first
  * 20 binary fraction digits produced by the classic integer
  * square-and-compare digit recurrence:
  *
  *   m  = ⌊log2 x⌋            (position of the top bit)
  *   r₀ = (x · 2²⁰) div 2^m   ∈ [2²⁰, 2²¹)
  *   20×: r ← r² div 2²⁰; digit = [r ≥ 2²¹]; if digit then r ← r div 2
  *
  * Every step is exact int64 arithmetic (r² < 2⁴²), so ANY engine that
  * repeats the recurrence — the DuckDB oracle does, as a recursive CTE
  * of the same three integer ops — produces the IDENTICAL scaled
  * integer. That is what makes entropy-family statistics (perplexity,
  * KL divergence) exactly gateable where a float `log()` would be
  * 1-ulp unstable across engines. The recurrence truncates r at each
  * of the 20 squarings (no guard bits), so the absolute error vs true
  * log2 is a few ulp of the 2⁻²⁰ scale — ≤ 2.5e-6 by the executable
  * property (PropertySpec) — far below any decision threshold these
  * metrics feed.
  *
  * Domain: 1 ≤ x < 2⁴³ (the r₀ shift needs x·2²⁰ inside int64);
  * null outside. 2⁴³ ≈ 8.8e12 covers any per-group token count this
  * side of a full 100 TB corpus in ONE group; callers that aggregate
  * beyond that must pre-scale (log2(x/2^s) + s).
  */
object Log2Fixed {
  /** The recurrence as a plain function — shared by the expression's
    * interpreted eval and the streaming twins so every engine-side
    * consumer runs literally the same integer steps. Domain
    * 1 ≤ x < 2⁴³ (throws outside — streaming callers use [[shifted]]). */
  def compute(x: Long): Long = {
    require(x > 0L && x < (1L << 43), s"log2_fixed domain: $x")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var r = (x << 20) >> m
    var acc = 0L
    var i = 0
    while (i < 20) {
      r = (r * r) >> 20
      if (r >= (1L << 21)) { acc = (acc << 1) | 1L; r >>= 1 }
      else acc <<= 1
      i += 1
    }
    m.toLong * (1L << 20) + acc
  }

  /** Shift-extended form lg(x ≫ s) + s·2²⁰ (s = max(0, bitlen−43)) —
    * any positive int64; mirrors TextAnalysis.lgShift's SQL fragment. */
  def shifted(x: Long): Long = {
    require(x > 0L, s"log2 of non-positive: $x")
    val s = math.max(0, (64 - java.lang.Long.numberOfLeadingZeros(x)) - 43)
    compute(x >> s) + s.toLong * (1L << 20)
  }
}

case class Log2Fixed(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "log2_fixed"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    if (x <= 0L || x >= (1L << 43)) null
    else Log2Fixed.compute(x) // ONE interpreted copy; codegen mirrors it
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val m = ctx.freshName("m")
    val r = ctx.freshName("r")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    val x = childGen.value
    ev.copy(code =
      code"""
        |${childGen.code}
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = -1L;
        |if (!${childGen.isNull} && $x > 0L && $x < (1L << 43)) {
        |  int $m = 63 - java.lang.Long.numberOfLeadingZeros($x);
        |  long $r = ($x << 20) >> $m;
        |  long $acc = 0L;
        |  for (int $i = 0; $i < 20; $i++) {
        |    $r = ($r * $r) >> 20;
        |    if ($r >= (1L << 21)) { $acc = ($acc << 1) | 1L; $r >>= 1; }
        |    else { $acc <<= 1; }
        |  }
        |  ${ev.isNull} = false;
        |  ${ev.value} = ((long) $m) * (1L << 20) + $acc;
        |}
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
