// Hosted inside the spark.sql package hierarchy because the extension
// surface is private[sql] — the established pattern for libraries
// shipping native expressions (see TextExpressions).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, LongType}

/** Per-group order statistics over CALENDAR-BOUNDED collected arrays —
  * the r14 optimization of the q120/q171 pair-median family.
  *
  * The two-pass distributed k-th order statistic (bucket counts, then
  * rank only inside the median bucket) was the right shape while the
  * pair multiset lived as a DataFrame: it kept the ~14M-row expansion
  * off any single task. But the expansion's INPUT is the per-priority
  * daily series — calendar-bounded (~2.4k rows per priority at every
  * SF, the q118/q120 adjudication), so the whole selection collapses
  * to per-group local arithmetic: collect the ≤days-long array per
  * group and select the k-th smallest pair statistic inside one
  * expression eval. No pair row ever materializes as Spark data, no
  * second pass re-expands it, and the only shuffle left is the daily
  * aggregate's. Measured at sf0.1: q120 5.9 s → the cost of the daily
  * groupBy; q171 5.4 s → likewise (see OPTIMIZATION_r14.md).
  *
  * Scale shape: group count × days is bounded by the calendar, so the
  * collected arrays stay KB-sized at any corpus size; the expressions
  * run once per GROUP (≤ |priorities| evals), so interpreted eval
  * (CodegenFallback) costs nothing measurable.
  *
  * Exactness: both selections return the identical integer the
  * DataFrame formulation produced — the k = (m+1) div 2 lower median
  * of the exact pair multiset — and the DuckDB oracles still compute
  * the same order statistic from their own pair expansion. */
object PairOrderStats {
  /** Lower median (k = (m+1) div 2, m = n(n−1)/2) of all pairwise sums
    * xᵢ+xⱼ (i<j) over the multiset `xs` — the q120 Hodges–Lehmann
    * doubled pseudo-median. Binary search on the value domain with an
    * O(n) two-pointer rank count per step: O(n·log span), no pair ever
    * materializes. `xs` is sorted in place. */
  def pairSumLowerMedian(xs: Array[Long]): Long = {
    val n = xs.length
    require(n >= 2, "pairSumLowerMedian needs >= 2 values")
    java.util.Arrays.sort(xs)
    val m = n.toLong * (n - 1) / 2
    val k = (m + 1) / 2
    var lo = xs(0) + xs(1)
    var hi = xs(n - 2) + xs(n - 1)
    while (lo < hi) {
      val mid = lo + (hi - lo) / 2
      // rank count: pairs (i < j) with xs(i)+xs(j) <= mid. Two-pointer
      // over the sorted array — when the (i, j) sum fits, every j' in
      // (i, j] fits too (ascending order), so credit j−i pairs at once.
      var cnt = 0L
      var i = 0
      var j = n - 1
      while (i < j) {
        if (xs(i) + xs(j) > mid) j -= 1
        else { cnt += (j - i); i += 1 }
      }
      if (cnt >= k) hi = mid else lo = mid + 1
    }
    // the loop converges on the smallest v with rank(v) >= k, which is
    // an attained pair sum (rank(v−1) < k forces a pair equal to v)
    lo
  }

  /** Ceiling for the Theil–Sen enumeration: n(n−1)/2 slope longs are
    * materialized per group, so 4096 days (11 years of daily series —
    * the corpus spans ~7) caps the scratch at ~64 MB per group.
    * Fail-loud past it, like the repo's other documented ceilings. */
  val TheilSenMaxDays = 4096

  /** Lower median of the pairwise integer slopes
    * sign(cⱼ−cᵢ) · (|cⱼ−cᵢ|·10⁶ div (dⱼ−dᵢ)) over i<j by day — exactly
    * q171's per-pair expression (sign-split truncated division; div is
    * floor here because both operands are nonnegative). Slopes are not
    * monotone in any sort of the inputs, so the selection enumerates
    * the calendar²-bounded multiset locally and sorts — ~2.9M longs at
    * the current corpus span, one Arrays.sort per group. `rows` must be
    * parallel (day, cents) arrays sorted ascending by day with distinct
    * days (the daily aggregate guarantees both). */
  def theilSenLowerMedianMicro(ds: Array[Long], cs: Array[Long]): Long = {
    val n = ds.length
    require(n >= 2, "theilSenLowerMedianMicro needs >= 2 days")
    require(n <= TheilSenMaxDays,
      s"theilSenLowerMedianMicro: $n days > $TheilSenMaxDays — the slope " +
        "enumeration is calendar-bounded; shard the series or raise the ceiling")
    val m = (n.toLong * (n - 1) / 2).toInt
    val sl = new Array[Long](m)
    var idx = 0
    var i = 0
    while (i < n - 1) {
      val di = ds(i); val ci = cs(i)
      var j = i + 1
      while (j < n) {
        val dc = cs(j) - ci
        val dd = ds(j) - di
        // multiplyExact: the SQL form would wrap silently out of domain;
        // failing loudly is the strictly safer twin of the same ceiling
        val q = Math.multiplyExact(Math.abs(dc), 1000000L) / dd
        sl(idx) = if (dc < 0) -q else q
        idx += 1
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(sl)
    sl(((m + 1) / 2) - 1)
  }
}

/** pair_sum_lower_median(array<long>) — null for arrays shorter than 2
  * (a group with one day has no pairs; the DataFrame form emitted no
  * row, callers filter n >= 2). Evaluated once per group: interpreted
  * eval is free, hence CodegenFallback. */
case class PairSumLowerMedian(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pair_sum_lower_median"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < 2) null
    else PairOrderStats.pairSumLowerMedian(arr.toLongArray())
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** theil_sen_lower_median_micro(days array<long>, cents array<long>) —
  * the q171 slope median; arrays must be parallel and day-sorted (the
  * caller builds them from ONE array_sort(collect_list(struct(d, c)))).
  * Null for arrays shorter than 2. */
case class TheilSenLowerMedianMicro(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "theil_sen_lower_median_micro"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val ds = l.asInstanceOf[ArrayData]
    val cs = r.asInstanceOf[ArrayData]
    if (ds.numElements() < 2) null
    else PairOrderStats.theilSenLowerMedianMicro(ds.toLongArray(), cs.toLongArray())
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object OrderStatFunctions {
  def pairSumLowerMedian(xs: Column): Column =
    ExpressionUtils.column(PairSumLowerMedian(ExpressionUtils.expression(xs)))
  def theilSenLowerMedianMicro(ds: Column, cs: Column): Column =
    ExpressionUtils.column(TheilSenLowerMedianMicro(
      ExpressionUtils.expression(ds), ExpressionUtils.expression(cs)))
}
