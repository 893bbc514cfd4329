package graft

import org.apache.spark.sql.functions._

/** Round-8 trigram-LM tier: conditional entropy H(w3|w1w2) per
  * language and the per-document interpolated-KN TRIGRAM perplexity —
  * both validated against full BigInt recomputes of the fixed-point
  * log2 statistics on sf0.001 (the same adjudication device as
  * Round7BigramSpec for the bigram tier). */
class Round8TrigramSpec extends SparkSpec {

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

  /** (doc_id, lang, w1, w2, w3) trigram stream off the raw documents —
    * the driver-side twin of ngramArray(text, 3). */
  private def trigrams(): Seq[(Long, String, String, String, String)] =
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .flatMap { r =>
        val toks = r.getString(2).split(' ').filter(_.nonEmpty)
        toks.iterator.sliding(3).withPartial(false)
          .map(p => (r.getLong(0), r.getString(1), p(0), p(1), p(2))).toSeq
      }.toSeq

  test("txt_cond_entropy3: chain-rule numerators recompute; 0 <= H(w3|w1w2) <= H(w1w2w3)") {
    val tg = trigrams()
    val byLang = tg.groupBy(_._2)
    val got = operators.TextAnalysis.txtCondEntropy3(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSet == byLang.keySet)
    got.foreach { r =>
      val lang = r.getString(0)
      val cs = byLang(lang).groupBy(t => (t._3, t._4, t._5)).view.mapValues(_.size.toLong).toMap
      val pre = byLang(lang).groupBy(t => (t._3, t._4)).view.mapValues(_.size.toLong).toMap
      val n = cs.values.sum
      val stg = cs.values.map(c => BigInt(c) * lgRef(c)).sum
      val spre = pre.values.map(c => BigInt(c) * lgRef(c)).sum
      val hJoint = BigInt(n) * lgRef(n) - stg
      val hCond = spre - stg
      assert(r.getLong(1) == n, "n_trigrams")
      assert(r.getLong(2) == cs.size.toLong, "n_trigram_types")
      assert(r.getLong(3) == pre.size.toLong, "n_prefix_types")
      assert(BigInt(r.getLong(4)) == hJoint, s"h_joint_num for $lang")
      assert(BigInt(r.getLong(5)) == hCond, s"h_cond_num for $lang")
      assert(r.getLong(6) == (hJoint * 1000000 / (BigInt(n) * 1048576)).toLong)
      assert(r.getLong(7) == (hCond * 1000000 / (BigInt(n) * 1048576)).toLong)
      assert(hCond >= 0 && hCond <= hJoint)
      // natural text is neither fully deterministic nor i.i.d.-flat
      assert(r.getLong(7) > 0 && r.getLong(7) < r.getLong(6))
    }
  }

  test("trigram context can only sharpen: H(w3|w1w2) <= H(w2|w1) per language") {
    // conditioning on more context never raises entropy — the
    // information-theoretic cross-tier invariant the ladder rests on
    val h2 = operators.TextAnalysis.txtCondEntropy(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(7)).toMap
    val h3 = operators.TextAnalysis.txtCondEntropy3(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(7)).toMap
    assert(h3.keySet == h2.keySet)
    // lg truncation can smear a few micro-bits; allow ulp slack only
    h3.foreach { case (lang, v) =>
      assert(v <= h2(lang) + 10, s"H(w3|w1w2) > H(w2|w1) for $lang: $v vs ${h2(lang)}")
    }
  }

  test("txt_doc_kn3_perplexity: per-doc bits recompute against the two-level KN-trigram LM") {
    val tg = trigrams()
    // per-language reference LM (counts include the docs themselves)
    val corpus = tg.groupBy(t => (t._2, t._3, t._4, t._5)).view.mapValues(_.size.toLong).toMap
    val prefix12 = corpus.groupBy(t => (t._1._1, t._1._2, t._1._3)).map { case (k, m) =>
      k -> ((m.values.sum, m.size.toLong)) // (cw12, n1f12)
    }
    // continuation-bigram table: type counts of the trigram table
    val cont23 = corpus.keys.groupBy(t => (t._1, t._3, t._4)).view.mapValues(_.size.toLong).toMap
    val mid2 = cont23.groupBy(t => (t._1._1, t._1._2)).map { case (k, m) =>
      k -> ((m.values.sum, m.size.toLong)) // (nmid2, nf2p)
    }
    val cont3 = cont23.keys.groupBy(t => (t._1, t._3)).view.mapValues(_.size.toLong).toMap
    val bPairs = cont23.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def bitsW(lang: String, w1: String, w2: String, w3: String): BigInt = {
      val c = corpus((lang, w1, w2, w3))
      val (cw12, f12) = prefix12((lang, w1, w2))
      val c2p = cont23((lang, w2, w3))
      val (m2, f2p) = mid2((lang, w2))
      val p3 = cont3((lang, w3))
      val b = bPairs(lang)
      val pNum = (4 * c - 3) * 4 * m2 * b + 3 * f12 * ((4 * c2p - 3) * b + 3 * f2p * p3)
      // decomposed denominator: lg(16*cw12*m2*B) == 4*2^20 + lg(cw12) + lg(m2) + lg(B)
      BigInt(4194304) + lgS(cw12) + lgS(m2) + lgS(b) - lgS(pNum)
    }
    val byDoc = tg.groupBy(t => (t._1, t._2))
    val got = operators.TextAnalysis.txtDocKn3Perplexity(spark, sf0001).collect()
    assert(got.length == byDoc.size, "one row per doc with >= 1 trigram")
    got.foreach { r =>
      val (doc, lang) = (r.getLong(0), r.getString(1))
      val cs = byDoc((doc, lang)).groupBy(t => (t._3, t._4, t._5)).view.mapValues(_.size.toLong)
      val n = cs.values.sum
      val sb = cs.map { case ((w1, w2, w3), cD) => BigInt(cD) * bitsW(lang, w1, w2, w3) }.sum
      assert(r.getLong(2) == n, "n_trigrams")
      assert(BigInt(r.getLong(3)) == sb, s"kn3_bits_num for doc $doc")
      val micro = (sb.abs * 1000000 / (BigInt(n) * 1048576)).toLong * (if (sb < 0) -1 else 1)
      assert(r.getLong(4) == micro && r.getBoolean(5) == (micro > 4000000L))
      // a self-included KN LM assigns every doc trigram P < 1 in the
      // exact rational, so the summed bits are positive save lg ulps
      assert(micro > -10, "bits can only go negative by truncation ulps")
    }
    assert(got.forall(r => r.getLong(4) < 30000000L), "under 30 bits/trigram")
  }

  test("trigram-LM plans: log2_fixed runs above the trigram-type aggregate, never per token") {
    for (name <- Seq("txt_cond_entropy3", "txt_doc_kn3_perplexity")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val plan = df.queryExecution.optimizedPlan
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

  test("txt_doc_kn3_perplexity: executed plan reuses the doc-trigram exchange (one tokenize pass)") {
    val df = SparkEntry.queries("txt_doc_kn3_perplexity")(spark, sf0001)
    df.collect() // materialize THIS queryExecution so AQE finalizes it
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange") || executed.contains("ReusedSubquery"),
      "reference-LM branch must reuse the doc-trigram aggregate exchange")
  }
}
