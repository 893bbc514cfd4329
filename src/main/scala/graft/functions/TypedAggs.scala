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

  /** K-minimum-values distinct sketch over md5 hashes — a MERGEABLE
    * bounded-state estimator (buffer = the k smallest hash strings,
    * merge = sorted-merge-take-k) whose estimate is DETERMINISTIC:
    * md5 is a fixed function, so unlike HLL the value itself is
    * engine-reproducible and oracle-checkable. Estimate: exact count
    * while fewer than k distinct hashes were seen; otherwise
    * (k−1)/R with R = the k-th smallest hash as a fraction of the
    * hash space (top 60 bits). State is O(k) per group regardless of
    * input size — the partial-aggregate shape a 100 TB distinct-count
    * wants. */
  case class KmvBuf(var hashes: List[String])

  class KmvDistinct(k: Int) extends Aggregator[String, KmvBuf, Double] {
    private def insert(sorted: List[String], h: String): List[String] = {
      if (sorted.contains(h)) sorted
      else {
        val (lo, hi) = sorted.span(_ < h)
        val merged = lo ::: h :: hi
        if (merged.length > k) merged.take(k) else merged
      }
    }
    override def zero: KmvBuf = KmvBuf(Nil)
    override def reduce(b: KmvBuf, h: String): KmvBuf = {
      b.hashes = insert(b.hashes, h); b
    }
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      a.hashes = b.hashes.foldLeft(a.hashes)(insert); a
    }
    override def finish(b: KmvBuf): Double = {
      val n = b.hashes.length
      if (n < k) n.toDouble
      else {
        // top 60 bits of the k-th smallest hash as a fraction of 2^60
        val r = java.lang.Long.parseLong(b.hashes.last.substring(0, 15), 16)
          .toDouble / (1L << 60).toDouble
        (k - 1).toDouble / r
      }
    }
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def kmvDistinct(k: Int): TypedColumn[String, Double] = new KmvDistinct(k).toColumn
}
