package graft

import graft.operators.{CorpusPipeline, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-7 widening: semantic decontamination (the vector twin of the
  * 5-gram dd_decontaminate) and the entropy-tier quality funnel. */
class Round7WidenSpec extends SparkSpec {

  test("dd_semantic_decontaminate: driver recompute; benchmark rows never flagged") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val bench = vecs.filter(_._1 % 17 == 0)
    val corpus = vecs.filter(_._1 % 17 != 0)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = corpus.flatMap { case (vid, lbl, ce) =>
      val hits = bench.filter(b => b._2 == lbl && cos(ce, b._3) >= 0.30)
        .map(b => (b._1, cos(ce, b._3)))
      if (hits.isEmpty) None
      else {
        val best = hits.minBy { case (bid, s) => (-s, bid) }
        Some(vid -> ((hits.length.toLong, best._1,
          BigDecimal(best._2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
      }
    }.toMap
    val got = Dedup.ddSemanticDecontaminate(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expect.keySet, "flagged set recomputes")
    // max_sim float rounding: compare to 1e-9 of the driver double
    got.foreach { case (vid, (n, bid, s)) =>
      val (en, ebid, es) = expect(vid)
      assert(n == en && bid == ebid, s"hits/nearest for $vid")
      assert(math.abs(s - es) < 1e-9, s"max_sim for $vid")
    }
    assert(got.keys.forall(_ % 17 != 0), "the benchmark slice is never scored against itself")
  }

  test("dd_semantic_decontaminate: sign-projection refinement is a value-consistent subset") {
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val exact = asMap(Dedup.ddSemanticDecontaminate(spark, sf0001).collect())
    val refined = asMap(Dedup.ddSemanticDecontaminate(spark, sf0001, refineBits = 2).collect())
    assert(refined.keySet.subsetOf(exact.keySet),
      "cell refinement may only drop detections, never invent them")
    refined.foreach { case (vid, (n, _, s)) =>
      val (en, _, es) = exact(vid)
      assert(n <= en, s"hit count can only shrink under refinement ($vid)")
      assert(s <= es + 1e-12, s"max_sim can only shrink or hold ($vid)")
    }
  }

  test("SparkEntry.entry: the driver's flagship smoke check returns rows locally too") {
    assert(SparkEntry.entry(spark).count() > 0,
      "the flagship corpus job must produce rows (the driver smoke-checks this)")
  }

  test("pipe_quality_funnel: counts reconstruct from the component gates; survivors monotone") {
    val nDocs = Tables.documents(spark, sf0001).count()
    val ent = TextAnalysis.txtEntropyFilter(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(6)))).toMap // n_tokens, low_entropy
    val uni = TextAnalysis.txtDocPerplexity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val kn = TextAnalysis.txtDocKnPerplexity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val ids = Tables.documents(spark, sf0001).select(col("doc_id")).collect().map(_.getLong(0))
    val flags = ids.map { id =>
      val (n, low) = ent.getOrElse(id, (0L, false))
      (n, low, uni.getOrElse(id, false), kn.getOrElse(id, false))
    }
    val expect = Map(
      "docs_total" -> nDocs,
      "fail_length" -> flags.count(_._1 < 16).toLong,
      "fail_low_entropy" -> flags.count(_._2).toLong,
      "fail_unigram_ppl" -> flags.count(_._3).toLong,
      "fail_kn_ppl" -> flags.count(_._4).toLong,
      "pass_length" -> flags.count(_._1 >= 16).toLong,
      "pass_entropy" -> flags.count(f => f._1 >= 16 && !f._2).toLong,
      "pass_unigram_ppl" -> flags.count(f => f._1 >= 16 && !f._2 && !f._3).toLong,
      "kept" -> flags.count(f => f._1 >= 16 && !f._2 && !f._3 && !f._4).toLong)
    val got = CorpusPipeline.pipeQualityFunnel(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect, s"funnel rows reconstruct: got $got expect $expect")
    // funnel conservation: cumulative survivors never increase
    assert(got("docs_total") >= got("pass_length"))
    assert(got("pass_length") >= got("pass_entropy"))
    assert(got("pass_entropy") >= got("pass_unigram_ppl"))
    assert(got("pass_unigram_ppl") >= got("kept"))
    // non-vacuous on this corpus: something is dropped, something kept
    assert(got("kept") > 0 && got("kept") < got("docs_total"))
  }

  test("txt_code_detect: the POSITIVE class fires on code-shaped text (all-prose corpus never exercises it)") {
    // the synthetic corpus contains no code, so the gated run proves
    // only the negative class — stage a crafted corpus where both
    // classes must appear, through the same loader path
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("code_detect")
    val code = "def snake_case(x): { y = x == 1; return fn_call(y); } " * 4
    val prose = "the quiet afternoon settled over the harbor and nobody spoke of it " * 4
    Seq(
      (1L, code, "en", "src0", code.length.toLong),
      (2L, prose, "en", "src0", prose.length.toLong),
      (3L, "", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val got = TextAnalysis.txtCodeDetect(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(got(1L), "code-shaped text must classify as code")
    assert(!got(2L), "prose must not classify as code")
    assert(!got(3L), "the empty doc stays prose (the 0-char guard)")
  }

  test("q7_semi_anti: the ANTI class fires on customers without orders (single-class at small SFs)") {
    // at sf0.001/sf0.01 every customer has orders, so the gated run
    // proves only the semi half; at sf0.1 exactly one customer carries
    // the anti class. Pin both halves on a crafted corpus through the
    // same loader path.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semi_anti")
    Seq(
      (1L, "c1", 0, 10.0, "BUILDING"),
      (2L, "c2", 0, 20.0, "MACHINERY"),
      (3L, "c3", 1, 30.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(dir.resolve("customer.parquet").toString)
    Seq(
      (100L, 1L, "O", 5.0, java.sql.Timestamp.valueOf("1996-01-01 00:00:00"), "1-URGENT"),
      (101L, 3L, "F", 7.0, java.sql.Timestamp.valueOf("1996-02-01 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(dir.resolve("orders.parquet").toString)
    val got = operators.Analytics.q7SemiAnti(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true),
      "semi and anti halves must partition the crafted corpus")
  }

  test("pipe_quality_funnel: the unigram gates share one tokenize; values match the standalone components") {
    // r15 shape: entropy and unigram-LM both consume ONE docTermCounts
    // subtree, so the final adaptive plan must show the per-doc
    // term-count exchange REUSED (one unigram tokenize at runtime);
    // the KN gate keeps its own bigram pass. The gram-table persist
    // variant was measured slower and reverted — see the operator.
    val df = CorpusPipeline.pipeQualityFunnel(spark, sf0001)
    val rows = df.collect() // materialize so AQE finalizes (skill note)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"the two unigram gates must share the doc-term exchange:\n$p")
    assert(!p.contains("CartesianProduct"))
    // value parity against the standalone components: same per-doc
    // booleans => same 9-row funnel
    val ent = TextAnalysis.txtEntropyFilter(spark, sf0001)
      .select(col("doc_id"), col("n_tokens"), col("low_entropy"))
    val uni = TextAnalysis.txtDocPerplexity(spark, sf0001)
      .select(col("doc_id"), col("high_perplexity").as("high_uni_ppl"))
    val kn = TextAnalysis.txtDocKnPerplexity(spark, sf0001)
      .select(col("doc_id"), col("high_perplexity").as("high_kn_ppl"))
    val m = CorpusPipeline.MinDocTokens
    val expect = Tables.documents(spark, sf0001).select(col("doc_id"))
      .join(ent, Seq("doc_id"), "left")
      .join(uni, Seq("doc_id"), "left")
      .join(kn, Seq("doc_id"), "left")
      .select(
        coalesce(col("n_tokens"), lit(0L)).as("nt"),
        coalesce(col("low_entropy"), lit(false)).as("le"),
        coalesce(col("high_uni_ppl"), lit(false)).as("hu"),
        coalesce(col("high_kn_ppl"), lit(false)).as("hk"))
      .agg(count(lit(1)), sum(expr(s"if(nt < $m, 1, 0)")),
        sum(expr("if(le, 1, 0)")), sum(expr("if(hu, 1, 0)")),
        sum(expr("if(hk, 1, 0)")), sum(expr(s"if(nt >= $m, 1, 0)")),
        sum(expr(s"if(nt >= $m AND NOT le, 1, 0)")),
        sum(expr(s"if(nt >= $m AND NOT le AND NOT hu, 1, 0)")),
        sum(expr(s"if(nt >= $m AND NOT le AND NOT hu AND NOT hk, 1, 0)")))
      .head()
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = Map(
      "docs_total" -> expect.getLong(0), "fail_length" -> expect.getLong(1),
      "fail_low_entropy" -> expect.getLong(2), "fail_unigram_ppl" -> expect.getLong(3),
      "fail_kn_ppl" -> expect.getLong(4), "pass_length" -> expect.getLong(5),
      "pass_entropy" -> expect.getLong(6), "pass_unigram_ppl" -> expect.getLong(7),
      "kept" -> expect.getLong(8))
    assert(got == exp, "funnel counts must equal the standalone-component composition")
  }
}
