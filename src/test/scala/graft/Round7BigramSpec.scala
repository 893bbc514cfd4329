package graft

import org.apache.spark.sql.functions._

/** Round-7 bigram-LM tier: conditional entropy H(w2|w1) per language
  * and the per-document interpolated-KN bigram perplexity filter —
  * both validated against full BigInt recomputes of the fixed-point
  * log2 statistics on sf0.001 (the same adjudication device as
  * Round6EntropySpec for the unigram tier). */
class Round7BigramSpec extends SparkSpec {

  /** Driver replica of Log2Fixed's recurrence (MathExpressions.scala). */
  private def lgRef(x: Long): Long = {
    require(x > 0 && x < (1L << 43))
    val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var r = (x << 20) >> m
    var acc = 0L
    for (_ <- 0 until 20) {
      r = (r * r) >> 20
      if (r >= (1L << 21)) { acc = (acc << 1) | 1L; r >>= 1 }
      else acc <<= 1
    }
    m.toLong * (1L << 20) + acc
  }

  /** Shift-extended form (s = 0 at this SF, same as the operators'). */
  private def lgS(x: Long): BigInt = {
    val s = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(x) - 43)
    BigInt(lgRef(x >> s)) + BigInt(s) * 1048576
  }

  /** (doc_id, lang, w1, w2) bigram stream off the raw documents —
    * the driver-side twin of ngramArray(text, 2). */
  private def bigrams(): Seq[(Long, String, String, String)] =
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .flatMap { r =>
        val toks = r.getString(2).split(' ').filter(_.nonEmpty)
        toks.iterator.sliding(2).withPartial(false)
          .map(p => (r.getLong(0), r.getString(1), p(0), p(1))).toSeq
      }.toSeq

  test("txt_cond_entropy: chain-rule numerators recompute; 0 <= H(w2|w1) <= H(w1,w2)") {
    val bg = bigrams()
    val byLang = bg.groupBy(_._2)
    val got = operators.TextAnalysis.txtCondEntropy(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSet == byLang.keySet)
    got.foreach { r =>
      val lang = r.getString(0)
      val cs = byLang(lang).groupBy(t => (t._3, t._4)).view.mapValues(_.size.toLong).toMap
      val pre = byLang(lang).groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val n = cs.values.sum
      val sbg = cs.values.map(c => BigInt(c) * lgRef(c)).sum
      val spre = pre.values.map(c => BigInt(c) * lgRef(c)).sum
      val hJoint = BigInt(n) * lgRef(n) - sbg
      val hCond = spre - sbg
      assert(r.getLong(1) == n, "n_bigrams")
      assert(r.getLong(2) == cs.size.toLong, "n_bigram_types")
      assert(r.getLong(3) == pre.size.toLong, "n_prefix_types")
      assert(BigInt(r.getLong(4)) == hJoint, s"h_joint_num for $lang")
      assert(BigInt(r.getLong(5)) == hCond, s"h_cond_num for $lang")
      assert(r.getLong(6) == (hJoint * 1000000 / (BigInt(n) * 1048576)).toLong)
      assert(r.getLong(7) == (hCond * 1000000 / (BigInt(n) * 1048576)).toLong)
      // entropy order: 0 <= H(w2|w1) <= H(w1,w2) — the first EXACT even
      // under lg truncation (monotonicity), so no sign split is needed
      assert(hCond >= 0 && hCond <= hJoint)
      // natural text is neither fully deterministic nor i.i.d.-flat
      assert(r.getLong(7) > 0 && r.getLong(7) < r.getLong(6))
    }
  }

  test("txt_doc_kn_perplexity: per-doc bits recompute against the per-lang KN LM") {
    val bg = bigrams()
    // per-language reference LM (counts include the docs themselves)
    val corpus = bg.groupBy(t => (t._2, t._3, t._4)).view.mapValues(_.size.toLong).toMap
    val prefix = corpus.groupBy(t => (t._1._1, t._1._2)).map { case (k, m) =>
      k -> (m.values.sum, m.size.toLong) // (cw1, n_follow)
    }
    val contin = corpus.keys.groupBy(t => (t._1, t._3)).view.mapValues(_.size.toLong).toMap
    val bTypes = corpus.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def bitsW(lang: String, w1: String, w2: String): BigInt = {
      val c = corpus((lang, w1, w2))
      val (cw1, nf) = prefix((lang, w1))
      val np = contin((lang, w2))
      val b = bTypes(lang)
      val pNum = (4 * c - 3) * b + 3 * nf * np
      // decomposed denominator: lg(4*cw1*B) == 2*2^20 + lg(cw1) + lg(B)
      BigInt(2097152) + lgS(cw1) + lgS(b) - lgS(pNum)
    }
    val byDoc = bg.groupBy(t => (t._1, t._2))
    val got = operators.TextAnalysis.txtDocKnPerplexity(spark, sf0001).collect()
    assert(got.length == byDoc.size, "one row per doc with >= 1 bigram")
    got.foreach { r =>
      val (doc, lang) = (r.getLong(0), r.getString(1))
      val cs = byDoc((doc, lang)).groupBy(t => (t._3, t._4)).view.mapValues(_.size.toLong)
      val n = cs.values.sum
      val sb = cs.map { case ((w1, w2), cD) => BigInt(cD) * bitsW(lang, w1, w2) }.sum
      assert(r.getLong(2) == n, "n_bigrams")
      assert(BigInt(r.getLong(3)) == sb, s"kn_bits_num for doc $doc")
      val micro = (sb.abs * 1000000 / (BigInt(n) * 1048576)).toLong * (if (sb < 0) -1 else 1)
      assert(r.getLong(4) == micro && r.getBoolean(5) == (micro > 5000000L))
      // a self-included KN LM assigns every doc bigram P < 1 in the
      // exact rational, so the summed bits are positive save lg ulps
      assert(micro > -10, "bits can only go negative by truncation ulps")
    }
    // the filter is non-vacuous at some SF; at sf0.001 just sane bounds
    assert(got.forall(r => r.getLong(4) < 30000000L), "under 30 bits/bigram")
  }

  test("bigram-LM plans: log2_fixed runs above the bigram-type aggregate, never per token") {
    for (name <- Seq("txt_cond_entropy", "txt_doc_kn_perplexity")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val plan = df.queryExecution.optimizedPlan
      // every Aggregate whose expressions mention log2_fixed must sit
      // ABOVE an Aggregate (the bigram-type/prefix rollup) — the log
      // cost is type-bounded, not token-bounded
      def aggsWithLog(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[org.apache.spark.sql.catalyst.plans.logical.Aggregate] =
        p.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.aggregateExpressions.exists(_.find {
              case e: org.apache.spark.sql.catalyst.expressions.Expression =>
                e.getClass.getSimpleName == "Log2Fixed"
            }.isDefined) => a
        }
      val offenders = aggsWithLog(plan).filterNot { a =>
        a.child.collectFirst {
          case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => ()
        }.isDefined
      }
      assert(offenders.isEmpty,
        s"$name: log2_fixed inside a token-level aggregate:\n${offenders.mkString("\n")}")
    }
  }

  test("txt_doc_kn_perplexity: executed plan reuses the doc-bigram exchange (one tokenize pass)") {
    val df = SparkEntry.queries("txt_doc_kn_perplexity")(spark, sf0001)
    df.collect() // materialize THIS queryExecution so AQE finalizes it
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange") || executed.contains("ReusedSubquery"),
      "reference-LM branch must reuse the doc-bigram aggregate exchange")
  }
}
