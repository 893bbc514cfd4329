package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, Multimodal}

/** Round-10 hardening specs: the default-ON dup-density guard, the
  * LPA loop's constant plan depth, the Mantel–Haenszel decimal route,
  * and the degenerate-payload frame semantics. */
class Round10OpsSpec extends SparkSpec {

  test("hot-shingle df cap is DEFAULT-ON: default == explicit default cap; conf dial and explicit-uncapped respected") {
    val dflt = Dedup.ddNgramJaccard(spark, sf0001).collect().map(_.toString).toSeq
    val explicit = Dedup.ddNgramJaccard(spark, sf0001,
      shingleDfCap = Some(100)).collect().map(_.toString).toSeq
    assert(dflt == explicit, "the default path must run the df-100 guard")
    // observed max shingle df at sf0.001 is single-digit, so the
    // default cap is non-binding here: flipping it ON changed nothing
    // at the gate scales (the sf1 audit is where it bites)
    val uncapped = Dedup.ddNgramJaccard(spark, sf0001,
      shingleDfCap = Some(0)).collect().map(_.toString).toSeq
    assert(dflt == uncapped,
      "df-100 guard must be result-invariant where no shingle is hot")
    val key = "spark.graft.dedup.shingleDfCap"
    spark.conf.set(key, "3")
    try {
      val viaConf = Dedup.ddNgramJaccard(spark, sf0001).collect().map(_.toString).toSeq
      val viaParam = Dedup.ddNgramJaccard(spark, sf0001,
        shingleDfCap = Some(3)).collect().map(_.toString).toSeq
      assert(viaConf == viaParam, "session conf must drive the default cap")
    } finally spark.conf.unset(key)
  }

  test("containment carries the same default guard: default == Some(100) == uncapped at this scale") {
    val dflt = Dedup.ddContainment(spark, sf0001).collect().map(_.toString).toSeq
    assert(dflt == Dedup.ddContainment(spark, sf0001, shingleDfCap = Some(100))
      .collect().map(_.toString).toSeq)
    assert(dflt == Dedup.ddContainment(spark, sf0001, shingleDfCap = Some(0))
      .collect().map(_.toString).toSeq)
    assert(dflt.nonEmpty, "fixture must produce containment pairs")
  }

  test("LPA loop: plan depth is CONSTANT in iteration count (per-step localCheckpoint)") {
    // iters=8 must not deepen the final plan vs iters=2: each step
    // checkpoints, so the plan above the last checkpoint is the same
    // shape regardless of how many rounds ran (the 100 TB iteration
    // discipline — no lineage blowup at deployment iteration counts).
    def planLines(iters: Int): Int = {
      val df = Analytics.q168LpaStep(spark, sf0001, iters)
      df.queryExecution.optimizedPlan.treeString.linesIterator.size
    }
    val d2 = planLines(2)
    val d8 = planLines(8)
    assert(d2 == d8, s"plan depth must not grow with iters (2 -> $d2 lines, 8 -> $d8)")
  }

  test("LPA converges on the fixture: iters=8 labeling equals iters=4 (fixed point reached)") {
    val l4 = Analytics.q168LpaStep(spark, sf0001, 4).collect().map(r => (r.getLong(0), r.getLong(1)))
    val l8 = Analytics.q168LpaStep(spark, sf0001, 8).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(l4.nonEmpty)
    assert(l4.map(t => t._1 -> t._2).toMap == l8.map(t => t._1 -> t._2).toMap,
      "frequency-vote labels must be stable once the loop has converged")
  }

  test("Mantel-Haenszel: ad/bc micro terms are exact through the decimal route (no int64 product)") {
    val rows = Analytics.q170MantelHaenszel(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(a, b, c, d, n, ad, bc) = (1 to 7).map(i => r.getLong(i))
      assert(n == a + b + c + d)
      assert(ad == (BigInt(a) * d * 1000000 / n).toLong, "ad_micro must equal the exact BigInt value")
      assert(bc == (BigInt(b) * c * 1000000 / n).toLong, "bc_micro must equal the exact BigInt value")
    }
  }

  test("CDC chunk projection: keepOuter keeps a NULL-text doc as one NULL-chunk row") {
    import spark.implicits._
    val docs = Seq((1L, Option("hello world rolling hash text body")),
      (2L, None: Option[String])).toDF("doc_id", "text")
    val inner = Dedup.cdcChunkRowsOf(docs, 8, 63).collect()
    assert(!inner.exists(_.getLong(0) == 2L), "inner explode drops the null-text doc (batch contract)")
    val outer = Dedup.cdcChunkRowsOf(docs, 8, 63, keepOuter = true).collect()
    val r2 = outer.filter(_.getLong(0) == 2L)
    assert(r2.length == 1 && r2.head.isNullAt(1) && r2.head.isNullAt(2),
      "outer explode keeps the doc with NULL chunk columns")
    // real docs are byte-identical between the two modes
    assert(inner.filter(_.getLong(0) == 1L).map(_.toString).toSeq ==
      outer.filter(_.getLong(0) == 1L).map(_.toString).toSeq)
  }

  test("frame energies: an empty payload yields NO frames (no phantom frame 0)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mm_empty").toString
    Seq((1L, "en", "src0", ""), (2L, "en", "src0", "abcdefgh12345"))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.mmFrameEnergy(spark, dir).collect()
    assert(!rows.exists(_.getLong(0) == 1L),
      "empty text must produce zero frame rows (oracle floor-div emits an empty range)")
    val d2 = rows.filter(_.getLong(0) == 2L)
    assert(d2.length == 2, "13 bytes at frame=8 -> frames 0 (len 8) and 1 (len 5)")
    assert(d2.map(_.getAs[Long]("frame_len")).toSeq == Seq(8L, 5L))
  }
}
