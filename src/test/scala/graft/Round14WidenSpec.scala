package graft

import graft.operators.Similarity

/** Round-14 specs: the sub-cell-blocked DBSCAN census (the 100 TB
  * configuration of sim_dbscan_cores — r13 verdict weak #3) and the
  * invariances that make the refinement a safe dial: a zero-bit carve
  * is bit-identical to the uncapped census, and adding bits can only
  * REMOVE neighbours (never invent one), so is_core demotes
  * monotonically. */
class Round14WidenSpec extends SparkSpec {

  test("sim_dbscan_cores_capped: subBits=0 is bit-identical to the uncapped census") {
    val uncapped = Similarity.simDbscanCores(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    // minPts pinned to the uncapped 4 so the test isolates the carve
    // dial (the registered capped config pairs the finer carve with
    // minPts = 2)
    val zeroBits = Similarity.simDbscanCoresCapped(spark, sf0001, minPts = 4, subBits = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(zeroBits == uncapped)
  }

  test("sim_dbscan_cores_capped: a finer carve only removes neighbours; sub-cells nest in labels") {
    val uncapped = Similarity.simDbscanCores(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val capped = Similarity.simDbscanCoresCapped(spark, sf0001, subBits = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(capped.nonEmpty)
    capped.foreach { case (vid, cell, n, isCore) =>
      val (label, nFull) = uncapped(vid)
      // sub-cell id = label * 2^subBits + bits — integer-nested
      assert(cell / 4 == label, s"vec $vid: sub-cell $cell outside label $label")
      assert(n <= nFull, s"vec $vid: capped census invented neighbours ($n > $nFull)")
      assert(isCore == (n >= 2))
    }
    // the refinement must stay LIVE at this SF: some vector loses at
    // least one cross-sub-cell neighbour (otherwise the spec is
    // vacuous and the carve untested), yet core points survive
    assert(capped.exists { case (vid, _, n, _) => n < uncapped(vid)._2 },
      "carve removed no neighbour anywhere — vacuous fixture")
    assert(capped.exists(_._4), "no core points under the 2-bit carve")
  }

  test("sim_dbscan_cores_capped: sign bits agree with a plain-Scala recompute of the dbs planes") {
    val planes = (0 until 2).map(p => Similarity.dbsPlane(p).toArray)
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map { r =>
        (r.getLong(0), r.getInt(1),
          r.getSeq[Float](2).toArray)
      }
    val expectedCells = vecs.map { case (vid, label, e) =>
      val bits = planes.map { pl =>
        // the identical left-to-right fold the Spark expression and
        // the oracle's + chain run — bit-exact, not just close
        var s = 0.0
        var j = 0
        while (j < e.length) { s += e(j).toDouble * pl(j); j += 1 }
        if (s > 0) 1L else 0L
      }
      vid -> (label.toLong * 4 + bits(0) * 2 + bits(1))
    }.toMap
    val got = Similarity.simDbscanCoresCapped(spark, sf0001, subBits = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (vid, cell) =>
      assert(cell == expectedCells(vid), s"vec $vid: cell $cell != ${expectedCells(vid)}")
    }
  }
}
