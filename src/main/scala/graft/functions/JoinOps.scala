package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join helper. AQE's skew-join split handles most hot
  * keys at runtime; explicit salting is the deterministic fallback when
  * one key dominates so heavily that even split partitions overwhelm a
  * task (the classic null-key / power-law dimension case at 100 TB).
  */
object JoinOps {

  /** Equi-join `big ⋈ small` on `key`, spreading each hot key of `big`
    * over `saltBuckets` partitions: the big side gets a deterministic
    * salt from `distributor` (any roughly-uniform column, e.g. a row
    * id), the small side is replicated `saltBuckets` times. Result rows
    * equal the plain join exactly; only the partitioning changes. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, distributor: Column): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(hash(distributor), lit(saltBuckets)))
    val saltedSmall = small
      .withColumn("_salt", explode(expr(s"sequence(0, ${saltBuckets - 1})")))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
