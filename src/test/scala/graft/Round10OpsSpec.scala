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

  test("ragged MaxSim: ranked lists mix sub-vector widths and un-encoded docs are never retrieved") {
    val rows = operators.Similarity.simMaxsimRagged(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val widths = rows.map(_.getAs[Long]("n_doc_subs")).distinct.sorted
    assert(widths.length > 1 && widths.forall(w => w >= 2 && w <= 5),
      s"ragged table must surface multiple doc sub-counts in the top-k (got ${widths.toSeq})")
    assert(!rows.exists(_.getAs[Long]("vec_id") % 17 == 0),
      "NULL-token (un-encoded) docs must not be retrievable")
    val perQ = rows.groupBy(_.getAs[Long]("query_id"))
    perQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length).toSeq)
      val scores = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("score_micro"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rank")
    }
  }

  test("MaxSim norm hoist: doc sub-norms project BELOW the broadcast join, once per corpus row") {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    def aliases(p: LogicalPlan, name: String): Boolean =
      p.expressions.exists(_.exists {
        case a: Alias => a.name == name
        case _ => false
      })
    for (fn <- Seq(
        () => operators.Similarity.simMaxsim(spark, sf0001),
        () => operators.Similarity.simMaxsimRagged(spark, sf0001))) {
      val plan = fn().queryExecution.optimizedPlan
      val join = plan.collectFirst { case j: Join => j }
      assert(join.nonEmpty, "plan must contain the broadcast query-corpus join")
      val below = join.get.children.flatMap(_.collect {
        case n if aliases(n, "dnorms") => n
      })
      assert(below.nonEmpty,
        "dnorms must be COMPUTED under the join's corpus side (once per doc row)")
      val everywhere = plan.collect { case n if aliases(n, "dnorms") => n }
      assert(everywhere.size == below.size,
        "no dnorms computation may be inlined above the join " +
          "(per-pair work must be dots only — CollapseProject must not undo the hoist)")
    }
  }

  test("adaptive RAKE: stoplist sizes differ per language and no phrase exceeds the cap") {
    val rows = operators.TextAnalysis.txtRakeLang(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("lang")).distinct.length == 5,
      "all five corpus languages must produce keyphrases")
    assert(rows.forall(_.getAs[Long]("n_words") <= 4L),
      "the maxLen cap must bound every emitted phrase")
    val stops = rows.map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_stop")).distinct
    assert(stops.map(_._2).distinct.length > 1,
      s"the mean-df knee must size stoplists per language (got $stops)")
  }

  test("adaptive RAKE cap binds: uncapped runs longer than maxLen exist and are discarded") {
    // recompute the candidate-run lengths the operator saw: if no run
    // exceeded the cap the test fixture proves nothing — guard it
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"),
        posexplode(graft.functions.TextOps.tokens("text")).as(Seq("pos", "term")))
    val dfc = toks.groupBy(col("lang"), col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val lt = dfc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_terms"), sum(col("df")).as("sum_df"))
    val stop = dfc.join(broadcast(lt), Seq("lang"))
      .filter(col("df") * col("n_terms") >= col("sum_df"))
      .select(col("lang"), col("term"), lit(true).as("is_stop"))
    val maxRun = toks.join(broadcast(stop), Seq("lang", "term"), "left")
      .filter(col("is_stop").isNull)
      .withColumn("run_id", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("run_id")).agg(count(lit(1)).as("run_len"))
      .agg(max(col("run_len"))).head().getLong(0)
    assert(maxRun > 4L,
      s"fixture must contain runs longer than the cap for the cap to be exercised (max run $maxRun)")
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
