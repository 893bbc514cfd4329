package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s (the `TypedColumn` extension tier): custom
  * aggregation logic with a case-class buffer, merged associatively —
  * exactly the contract a distributed partial-aggregate needs. The
  * cents-exact average demonstrates the determinism discipline in the
  * typed API: the buffer is integer cents, so merge order cannot
  * perturb the result; the single division happens in `finish`.
  */
object TypedAggs {

  case class AvgBuf(var sumCents: Long, var n: Long)

  /** Exact-cents average over a double money column: reduction and
    * merge are integer-only; `finish` divides once. */
  class CentsAvg extends Aggregator[Double, AvgBuf, Double] {
    override def zero: AvgBuf = AvgBuf(0L, 0L)
    override def reduce(b: AvgBuf, x: Double): AvgBuf = {
      b.sumCents += math.round(x * 100) // money arrives with 2 decimals
      b.n += 1
      b
    }
    override def merge(a: AvgBuf, b: AvgBuf): AvgBuf = {
      a.sumCents += b.sumCents; a.n += b.n; a
    }
    override def finish(b: AvgBuf): Double =
      if (b.n == 0) 0.0 else b.sumCents.toDouble / b.n / 100.0
    override def bufferEncoder: Encoder[AvgBuf] = Encoders.product[AvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def centsAvg: TypedColumn[Double, Double] = new CentsAvg().toColumn
}
