package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-level registration of the native vector expressions, so
  * `spark.sql("SELECT float_vec_dot(a, b) ...")` works alongside the
  * Column API. */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[FloatVecDot].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_vec_dot"),
      info("float_vec_dot", "float_vec_dot(a, b) - dot product of two float arrays in double precision"),
      (es: Seq[Expression]) => FloatVecDot(es(0), es(1))),
    (FunctionIdentifier("float_vec_norm"),
      info("float_vec_norm", "float_vec_norm(a) - L2 norm of a float array in double precision"),
      (es: Seq[Expression]) => FloatVecNorm(es.head)))

  /** Register on a live session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}
