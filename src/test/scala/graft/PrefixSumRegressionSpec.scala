package graft

import graft.operators.CorpusPipeline
import org.apache.spark.sql.functions._

/** Regression guard for the prefix-sum branch-divergence bug: with the
  * original spark_partition_id()-after-repartitionByRange formulation,
  * the subtotal branch and the join branch could re-execute the range
  * exchange with independently re-sampled boundaries (RDD-id seed) and
  * assign rows to DIFFERENT partitions — observed as nondeterministic
  * off-by-a-partition cumsums in q108 at sf0.01, while every
  * smaller/simpler plan passed. The pure-bucket formulation makes the
  * divergence structurally impossible; this spec pins the exact shape
  * that failed (chained calls, both cumulative columns consumed, sf0.01
  * row count) against a driver-side recomputation. */
class PrefixSumRegressionSpec extends SparkSpec {

  private def s01 = Tables.orders(spark, "/root/testdata/sf0.01")
    .select(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").as("cents"),
      (col("o_custkey") % 2).cast("int").as("grp"))
    .groupBy(col("cents"))
    .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("a1"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("a2"))
    .withColumn("k", lit(1))

  test("chained prefix sums with both cumulative columns consumed are exact at sf0.01") {
    val base = s01
    val bkt = CorpusPipeline.equiWidthBucket(base, "cents")
    val cum = CorpusPipeline.prefixSumExclusive(
      CorpusPipeline.prefixSumExclusive(base, "k", Seq(col("cents")), "a1", "c1x", bkt),
      "k", Seq(col("cents")), "a2", "c2x", bkt)
    val got = cum.select(col("cents"), col("a1"), col("a2"), col("c1x"), col("c2x"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    var c1 = 0L; var c2 = 0L; var bad = 0
    got.foreach { case (v, a1, a2, c1x, c2x) =>
      if (c1x != c1 || c2x != c2) bad += 1
      c1 += a1; c2 += a2
    }
    assert(bad == 0, s"$bad mismatching cumulative rows of ${got.length}")
  }
}
