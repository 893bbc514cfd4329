package graft

import org.apache.spark.sql.graft.PairOrderStats

/** Round-14 optimization specs: the per-group order-statistic kernels
  * that replaced the q120/q171 distributed pair expansions. The
  * operators themselves stay pinned by their existing brute-force
  * specs (Round5WidenSpec q120, Round10OpsSpec q171) and the DuckDB
  * gate; these tests hammer the KERNELS on adversarial inputs the
  * corpus never produces (ties, negatives, tiny n, even/odd pair
  * counts), where a selection off-by-one would hide. */
class Round14PerfSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def bruteHl(xs: Seq[Long]): Long = {
    val sums = (for (i <- xs.indices; j <- (i + 1) until xs.size)
      yield xs(i) + xs(j)).sorted
    sums((sums.size - 1) / 2) // 1-based rank (m+1) div 2
  }

  private def bruteTs(pts: Seq[(Long, Long)]): Long = {
    val s = pts.sortBy(_._1)
    val sl = (for (i <- s.indices; j <- (i + 1) until s.size) yield {
      val dc = s(j)._2 - s(i)._2
      val dd = s(j)._1 - s(i)._1
      val q = math.abs(dc) * 1000000L / dd
      if (dc < 0) -q else q
    }).sorted
    sl((sl.size - 1) / 2)
  }

  // deterministic pseudo-random longs (no Math.random in tests either —
  // reproducibility is the point of a selection kernel spec)
  private def lcg(seed: Long, n: Int, mod: Long): Seq[Long] = {
    var x = seed
    (1 to n).map { _ => x = (x * 6364136223846793005L + 1442695040888963407L); math.abs(x) % mod - mod / 2 }
  }

  test("pairSumLowerMedian: equals brute force on ties, negatives, odd/even pair counts") {
    val cases = Seq(
      Seq(1L, 2L),                       // m = 1
      Seq(5L, 5L, 5L),                   // all ties
      Seq(-3L, 0L, 7L),                  // m = 3 (odd)
      Seq(-10L, -10L, 4L, 4L),           // m = 6 (even), duplicate values
      Seq(Long.MinValue / 4, 0L, Long.MaxValue / 4, 17L),
      lcg(42L, 37, 1000L),               // dense ties
      lcg(7L, 64, 1000000000000L)        // wide span
    )
    cases.foreach { xs =>
      assert(PairOrderStats.pairSumLowerMedian(xs.toArray) === bruteHl(xs),
        s"HL kernel diverged on ${xs.take(8)}...")
    }
  }

  test("theilSenLowerMedianMicro: equals brute force incl. sign-split truncation on negatives") {
    val cases: Seq[Seq[(Long, Long)]] = Seq(
      Seq((0L, 10L), (1L, 7L)),                    // single negative slope
      Seq((0L, 0L), (2L, 0L), (5L, 0L)),           // all-zero slopes
      Seq((0L, 100L), (1L, 97L), (3L, 103L), (10L, 1L)), // mixed signs, trunc-sensitive
      lcg(3L, 50, 100000L).zipWithIndex.map { case (c, i) => (i.toLong * 3 + 1, c) },
      lcg(11L, 200, 1000000000L).zipWithIndex.map { case (c, i) => (i.toLong + 1, c) }
    )
    cases.foreach { pts =>
      val s = pts.sortBy(_._1)
      val ds = s.map(_._1).toArray
      val cs = s.map(_._2).toArray
      assert(PairOrderStats.theilSenLowerMedianMicro(ds, cs) === bruteTs(pts),
        s"Theil-Sen kernel diverged on ${pts.take(4)}...")
    }
  }

  test("theilSenLowerMedianMicro: fail-loud past the calendar ceiling") {
    val n = PairOrderStats.TheilSenMaxDays + 1
    val ds = Array.tabulate(n)(_.toLong)
    val cs = Array.tabulate(n)(_.toLong)
    val e = intercept[IllegalArgumentException] {
      PairOrderStats.theilSenLowerMedianMicro(ds, cs)
    }
    assert(e.getMessage.contains("calendar-bounded"))
  }
}
