// Hosted inside the spark.sql package hierarchy because the extension
// surface (AbstractDataType, ExpressionUtils.column) is private[sql] —
// the established pattern for libraries shipping native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Native Catalyst expressions for float-vector math — the hot inner loop
  * of the similarity/dedup operators. The higher-order-function
  * formulation (`aggregate(zip_with(...))`) is interpreted per element
  * with boxing; these generate a tight primitive Java loop inside
  * whole-stage codegen instead.
  *
  * Determinism contract (must match the DuckDB oracle bit-for-bit): each
  * float is widened to double, products accumulate left-to-right in array
  * order — exactly the sequential fold the oracle's
  * `list_sum(list_transform(...))` performs.
  *
  * Length-mismatch contract (r11 advice): the binary folds return NULL
  * when the two arrays differ in length — the same answer the HOF
  * `aggregate(zip_with(a, b, ...), 0, +)` they replace gives there
  * (zip_with pads the short side with NULLs and the fold absorbs them) —
  * so a malformed embedding row surfaces as NULL instead of a plausible
  * truncated-prefix value.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  // float OR double arrays per side, read at stored precision (the
  // FloatVecL2Sq posture — an implicit float→double ARRAY cast would
  // change which value is widened and break bit-parity with the HOF
  // fold): raw embeddings are float, normalized vectors and centroids
  // are double
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  // NULL on length mismatch (below), regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (isFloat(left), isFloat(right))
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $getX * $getY;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** sqrt(Σ vᵢ²) with the same sequential-double accumulation. */
case class FloatVecNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ (aᵢ − bᵢ)² — squared L2, the exact-distance fold of the ANN recall
  * audits. Accepts float OR double arrays on each side (centroids and
  * residuals are double arrays; raw embeddings are float) WITHOUT an
  * implicit array cast, because a float→double array cast would change
  * which value is widened and break bit-parity with the HOF fold it
  * replaces: each element is read at its stored precision and widened
  * to double exactly where `(cast(x as double) - c)` did. Sequential
  * left-to-right accumulation — identical IEEE op order to
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0, +)` on
  * equal-length arrays (all callers zip fixed-dim vectors); on a
  * length MISMATCH the result is NULL, matching that HOF's answer
  * (zip_with null-pads, the fold absorbs) — never a silently
  * truncated prefix distance. */
case class FloatVecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  // NULL on length mismatch, regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_l2sq"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (isFloat(left), isFloat(right))
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $getX - $getY;
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def norm(a: Column): Column =
    ExpressionUtils.column(FloatVecNorm(ExpressionUtils.expression(a)))
  def l2sq(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVecL2Sq(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
