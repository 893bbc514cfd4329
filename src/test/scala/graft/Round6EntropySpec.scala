package graft

import org.apache.spark.sql.functions._

/** Round-6 entropy tier: the fixed-point log2 expression and the two
  * operators it makes exactly gateable (unigram perplexity, pairwise
  * KL divergence). The expression is validated against a driver-side
  * replica of the integer digit recurrence plus known exact points;
  * the operators against a full BigInt recompute on sf0.001. */
class Round6EntropySpec extends SparkSpec {

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

  test("log2_fixed: exact at powers of two, 2^-20-close elsewhere, null outside domain") {
    import spark.implicits._
    val xs = Seq(1L, 2L, 3L, 5L, 7L, 64L, 1000L, 999983L, 1000000L,
      (1L << 42) - 1, (1L << 43) - 1)
    val got = xs.toDF("x").selectExpr("x", "log2_fixed(x) lg").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      assert(got(x) == lgRef(x), s"recurrence parity at $x")
      val approx = got(x).toDouble / (1L << 20)
      assert(math.abs(approx - math.log(x.toDouble) / math.log(2.0)) < 2e-6,
        s"within 2^-20 of true log2 at $x")
    }
    (0 to 20).foreach(k => assert(got.getOrElse(1L << k, lgRef(1L << k)) == k.toLong * (1L << 20),
      s"exact at 2^$k"))
    val nulls = Seq(0L, -5L, 1L << 43).toDF("x")
      .selectExpr("log2_fixed(x) lg").collect()
    assert(nulls.forall(_.isNullAt(0)), "null outside 1 <= x < 2^43")
  }

  test("log2_fixed: interpreted eval equals codegen result") {
    import spark.implicits._
    // a projection over a driver dataset runs codegen; eval() the
    // expression directly for the interpreted path
    val xs = (1L to 4096L) ++ Seq(999983L, (1L << 43) - 1)
    val fromCodegen = xs.toDF("x").selectExpr("log2_fixed(x)").collect().map(_.getLong(0))
    xs.zip(fromCodegen).foreach { case (x, cg) =>
      val interp = org.apache.spark.sql.graft.Log2Fixed(
        org.apache.spark.sql.catalyst.expressions.Literal(x)).eval(null)
      assert(interp == cg, s"eval/codegen parity at $x")
    }
  }

  test("txt_perplexity: h_num recomputes from token counts; single-type corpus is exactly 0") {
    val counts = Tables.documents(spark, sf0001)
      .select(col("lang"), explode(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .collect().groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.size.toLong).toMap
    val byLang = counts.groupBy(_._1._1)
    val got = operators.TextAnalysis.txtPerplexity(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSet == byLang.keySet)
    got.foreach { r =>
      val lang = r.getString(0)
      val cs = byLang(lang).values.toSeq
      val n = cs.sum
      val hNum = BigInt(n) * lgRef(n) - cs.map(c => BigInt(c) * lgRef(c)).sum
      assert(r.getLong(1) == cs.size.toLong, "n_types")
      assert(r.getLong(2) == n, "n_tokens")
      assert(BigInt(r.getLong(3)) == hNum, s"h_num for $lang")
      assert(r.getLong(4) == (hNum * 1000000 / (BigInt(n) * 1048576)).toLong,
        "bits_per_token_micro is the exact integer division")
      // entropy sanity: 0 <= H <= log2(V) (+1 ulp headroom per term)
      assert(hNum >= 0 && r.getLong(4) <= 21 * 1000000L)
    }
  }

  test("txt_entropy_filter: per-doc entropy recomputes; flag thresholds at 3.5 bits") {
    val perDoc = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.groupBy(_.getString(1)).view.mapValues(_.size.toLong).toMap).toMap
    val got = operators.TextAnalysis.txtEntropyFilter(spark, sf0001).collect()
    assert(got.length == perDoc.size, "one row per tokenizable doc")
    got.foreach { r =>
      val cs = perDoc(r.getLong(0)).values.toSeq
      val n = cs.sum
      val hNum = BigInt(n) * lgRef(n) - cs.map(c => BigInt(c) * lgRef(c)).sum
      assert(BigInt(r.getLong(4)) == hNum, s"h_num for doc ${r.getLong(0)}")
      val micro = (hNum * 1000000 / (BigInt(n) * 1048576)).toLong
      assert(r.getLong(5) == micro)
      assert(r.getBoolean(6) == (micro < 3500000L))
    }
    // the gate is non-vacuous on this corpus: both classes present
    assert(got.exists(_.getBoolean(6)) && got.exists(!_.getBoolean(6)))
  }

  test("txt_doc_perplexity: numerators recompute against the per-lang reference LM") {
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), explode(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val ref = toks.groupBy(r => (r._2, r._3)).view.mapValues(_.size.toLong).toMap
    val langTot = toks.groupBy(_._2).map { case (l, rs) =>
      l -> (rs.map(_._3).distinct.size.toLong, rs.size.toLong) // (V_l, N_l)
    }
    val byDoc = toks.groupBy(r => (r._1, r._2))
      .view.mapValues(_.groupBy(_._3).view.mapValues(_.size.toLong).toMap).toMap
    val got = operators.TextAnalysis.txtDocPerplexity(spark, sf0001).collect()
    assert(got.length == byDoc.size)
    got.foreach { r =>
      val (doc, lang) = (r.getLong(0), r.getString(1))
      val cs = byDoc((doc, lang))
      val n = cs.values.sum
      val (vl, nl) = langTot(lang)
      val pplNum = BigInt(n) * lgRef(nl + vl) -
        cs.map { case (w, c) => BigInt(c) * lgRef(ref((lang, w)) + 1) }.sum
      assert(r.getLong(2) == n)
      assert(BigInt(r.getLong(3)) == pplNum, s"ppl_num for doc $doc")
      val micro = (pplNum * 1000000 / (BigInt(n) * 1048576)).toLong
      assert(r.getLong(4) == micro && r.getBoolean(5) == (micro > 5000000L))
      assert(pplNum > 0, "reference-LM surprisal is strictly positive")
    }
  }

  test("Verify's DecimalType lint: red on a decimal output, green on the allowed carriers") {
    import spark.implicits._
    val bad = Seq(1L).toDF("k").selectExpr("k", "cast(42 as decimal(38,0)) v")
    val e = intercept[IllegalArgumentException] {
      Verify.assertNoDecimalOutput(bad, "bad_decimal")
    }
    assert(e.getMessage.contains("bad_decimal") && e.getMessage.contains("v"))
    val good = Seq(1L).toDF("k").selectExpr(
      "k", "cast(42 as string) s", "cast(1.5 as double) d", "k * 1000000 m")
    Verify.assertNoDecimalOutput(good, "good") // must not throw
  }

  test("pipe_quality_verdict: mask bits reconstruct from the component signals") {
    val ent = operators.TextAnalysis.txtEntropyFilter(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(5))).toMap // n_tokens, entropy
    val ppl = operators.TextAnalysis.txtDocPerplexity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val chars = Tables.documents(spark, sf0001).select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = operators.CorpusPipeline.pipeQualityVerdict(spark, sf0001).collect()
    assert(got.length == ent.size, "one verdict per tokenizable doc")
    got.foreach { r =>
      val id = r.getLong(0)
      val (n, e) = ent(id)
      val p = ppl(id)
      val cpt = chars(id) * 1000000L / n
      val mask = (if (e < 3500000L) 1L else 0L) + (if (p > 5000000L) 2L else 0L) +
        (if (n < 16L) 4L else 0L) +
        (if (cpt < 4800000L || cpt > 5800000L) 8L else 0L)
      assert(r.getLong(5) == e && r.getLong(6) == p && r.getLong(7) == cpt)
      assert(r.getLong(8) == mask, s"reason_mask for doc $id")
      assert(r.getBoolean(9) == (mask == 0L))
    }
    // the composite is non-vacuous: keeps and drops both present, and
    // at least two distinct failure reasons fire on this corpus
    assert(got.exists(_.getBoolean(9)) && got.exists(!_.getBoolean(9)))
    assert(got.filter(!_.getBoolean(9)).map(_.getLong(8)).distinct.length >= 2)
  }

  test("txt_js_divergence: numerators recompute; JS bounded in [0, 1 bit]") {
    val toks = Tables.documents(spark, sf0001)
      .select(col("lang"), explode(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = toks.map(_._2).distinct
    val v = vocab.size.toLong
    val nTok = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    // driver replica of the shift-extended log (s = 0 at this SF)
    def lgS(x: Long): BigInt = {
      val s = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(x) - 43)
      BigInt(lgRef(x >> s)) + BigInt(s) * 1048576
    }
    val got = operators.TextAnalysis.txtJsDivergence(spark, sf0001).collect()
    got.foreach { r =>
      val (la, lb) = (r.getString(0), r.getString(1))
      val (da, db) = (nTok(la) + v, nTok(lb) + v)
      val union = vocab.filter(w => counts.contains((la, w)) || counts.contains((lb, w)))
      def num(selfIsA: Boolean, dOther: Long): BigInt =
        union.map { w =>
          val ca = counts.getOrElse((la, w), 0L); val cb = counts.getOrElse((lb, w), 0L)
          val sW = (ca + 1) * db + (cb + 1) * da
          val cSelf = if (selfIsA) ca else cb
          BigInt(cSelf + 1) * (BigInt(1048576) + lgS(cSelf + 1) + lgS(dOther) - lgS(sW))
        }.sum + BigInt(v - union.size) * (BigInt(1048576) + lgS(dOther) - lgS(da + db))
      val ja = num(selfIsA = true, db)
      val jb = num(selfIsA = false, da)
      assert(BigInt(r.getLong(6)) == ja, s"js_a_num $la|$lb")
      assert(BigInt(r.getLong(7)) == jb, s"js_b_num $la|$lb")
      val micro = r.getLong(8)
      assert(micro >= 0 && micro <= 1000000L, "0 <= JS <= 1 bit")
      assert(micro > 0, "different languages diverge")
    }
  }

  test("txt_kl_divergence: numerators recompute over the smoothed global vocab; KL >= 0") {
    val counts = Tables.documents(spark, sf0001)
      .select(col("lang"), explode(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .collect().groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.size.toLong).toMap
    val langs = counts.keys.map(_._1).toSeq.distinct.sorted
    val vocab = counts.keys.map(_._2).toSet
    val v = vocab.size.toLong
    val nTok = langs.map(l => l -> counts.collect { case ((ll, _), c) if ll == l => c }.sum).toMap
    val got = operators.TextAnalysis.txtKlDivergence(spark, sf0001).collect()
    assert(got.length == langs.combinations(2).size)
    got.foreach { r =>
      val (la, lb) = (r.getString(0), r.getString(1))
      val (na, nb) = (nTok(la), nTok(lb))
      assert(r.getLong(2) == na && r.getLong(3) == nb && r.getLong(4) == v)
      def klNum(x: String, nx: Long, y: String, ny: Long): BigInt =
        vocab.toSeq.map { w =>
          val cx = counts.getOrElse((x, w), 0L); val cy = counts.getOrElse((y, w), 0L)
          BigInt(cx + 1) * (lgRef(cx + 1) - lgRef(cy + 1))
        }.sum + BigInt(nx + v) * (lgRef(ny + v) - lgRef(nx + v))
      assert(BigInt(r.getLong(6)) == klNum(la, na, lb, nb), s"kl_ab_num $la->$lb")
      assert(BigInt(r.getLong(7)) == klNum(lb, nb, la, na), s"kl_ba_num $lb->$la")
      // KL of genuinely different unigram LMs is positive
      assert(r.getLong(8) > 0 && r.getLong(9) > 0, "positive micro-KL both directions")
    }
  }
}
