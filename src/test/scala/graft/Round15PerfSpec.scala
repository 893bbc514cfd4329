package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Round-15 optimization specs: the near-dup pair-table snapshot
  * (keying + value parity) and the IVF-PQ index-frame persist
  * (cache hygiene after release). */
class Round15PerfSpec extends SparkSpec {

  test("jaccard pair snapshot is keyed by the RESOLVED cap: capped and default builds never collide") {
    import spark.implicits._
    Dedup.clearHotKeyCache()
    val dir = java.nio.file.Files.createTempDirectory("snap_key").toString
    // 6 docs share a boilerplate span (hot at cap 3, cold at the
    // default cap 100); 2 docs share a distinct span
    val boiler = "common boilerplate navigation header shared across every single page of this site"
    val docs = (1 to 6).map(i =>
      (i.toLong, "en", "s0", s"$boiler unique tail $i")) ++ Seq(
      (10L, "en", "s0", "a rare pair of documents with their own wording entirely"),
      (11L, "en", "s0", "a rare pair of documents with their own wording entirely"))
    docs.toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // snapshot ON (the default): first call writes jaccard_pairs_3,
    // second writes jaccard_pairs_100 — a tag collision would make the
    // second call return the first call's (boiler-free) pair set
    val capped = Dedup.ddNgramJaccard(spark, dir, shingleDfCap = Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dflt = Dedup.ddNgramJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(p => p._1 <= 6 && p._2 <= 6),
      s"cap 3 must stop-list the boilerplate shingles: $capped")
    assert(dflt.exists(p => p._1 <= 6 && p._2 <= 6),
      s"default cap 100 must keep the 6-family pairs (df 6 < 100): $dflt")
    assert(capped.contains((10L, 11L)) && dflt.contains((10L, 11L)),
      "the cold pair must survive under both caps")
    // and a REPEAT call reads the snapshot with identical values
    val again = Dedup.ddNgramJaccard(spark, dir, shingleDfCap = Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == capped, "snapshot read-back must be value-identical")
  }

  test("sim_ivfpq / probe curve / recall: no cached blocks survive the call (index persist released)") {
    def cachedCount = spark.sparkContext.getPersistentRDDs.size
    val before = cachedCount
    // <= not ==: earlier suites' localCheckpoint entries unpersist
    // asynchronously (the Round4OpsSpec precedent) — only an INCREASE
    // is a leak of ours
    assert(Similarity.simIvfpq(spark, sf0001).count() > 0)
    assert(cachedCount <= before,
      s"sim_ivfpq leaked ${cachedCount - before} cached RDD(s)")
    assert(Similarity.simIvfpqProbeCurve(spark, sf0001).count() > 0)
    assert(cachedCount <= before,
      s"sim_ivfpq_probe_curve leaked ${cachedCount - before} cached RDD(s)")
    assert(Similarity.simIvfpqRecall(spark, sf0001).count() > 0)
    assert(cachedCount <= before,
      s"sim_ivfpq_recall leaked ${cachedCount - before} cached RDD(s)")
  }

  test("sim_power_iteration: driver-side mul chain matches the distributed formulation bit for bit") {
    // re-derive v1/v2/v3 the pre-r15 way (DataFrame joins over the
    // mirrored matrix) from sim_covariance's exact integers and compare
    // bit-exact against the operator's driver-side fold
    val cov = Similarity.simCovariance(spark, sf0001)
      .select(col("dim_i"), col("dim_j"),
        (col("sum_prod_micro").cast("double") / 1e6).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mirrored = cov ++ cov.collect { case (i, j, g) if i != j => (j, i, g) }
    val byI = mirrored.groupBy(_._1).map { case (i, rs) =>
      (i, rs.map(r => (r._2, r._3)).sortBy(_._1)) }
    val v1 = byI.map { case (i, rs) =>
      (i, rs.foldLeft(0.0) { case (a, (_, g)) => a + g }) }
    def mul(v: Map[Long, Double]) = byI.map { case (i, rs) =>
      (i, rs.foldLeft(0.0) { case (a, (j, g)) => a + g * v(j) }) }
    val (v2, v3g) = (mul(v1), mul(mul(v1)))
    val got = Similarity.simPowerIteration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (d, a1, a2, a3) =>
      assert(java.lang.Double.doubleToRawLongBits(a1) ==
        java.lang.Double.doubleToRawLongBits(v1(d)), s"v1 mismatch at dim $d")
      assert(java.lang.Double.doubleToRawLongBits(a2) ==
        java.lang.Double.doubleToRawLongBits(v2(d)), s"v2 mismatch at dim $d")
      assert(java.lang.Double.doubleToRawLongBits(a3) ==
        java.lang.Double.doubleToRawLongBits(v3g(d)), s"v3 mismatch at dim $d")
    }
  }
}
