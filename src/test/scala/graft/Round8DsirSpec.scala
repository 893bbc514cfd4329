package graft

import org.apache.spark.sql.functions._

/** Round-8 DSIR importance-weight tier (Xie et al. 2023, importance
  * resampling for LM data selection): per-document target-vs-raw LM
  * log-ratio weights validated against a full BigInt recompute of the
  * fixed-point-lg statistic on sf0.001 — the same adjudication device
  * as the perplexity/KN specs. */
class Round8DsirSpec extends SparkSpec {

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

  test("txt_dsir_weights: numerators recompute from raw/target LM counts; flag = micro threshold") {
    val rows = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val toks = rows.map { case (id, lang, src, text) =>
      (id, lang, src, text.split(' ').filter(_.nonEmpty).toSeq)
    }
    val byLang = toks.groupBy(_._2)
    val expected = byLang.toSeq.flatMap { case (lang, docs) =>
      val raw = docs.flatMap(_._4).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tgt = docs.filter(_._3 == "src0").flatMap(_._4)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val v = raw.size.toLong
      val nR = raw.values.sum
      val nT = tgt.values.sum
      val corr = BigInt(lgRef(nR + v)) - BigInt(lgRef(nT + v))
      docs.map { case (id, _, _, ts) =>
        val n = ts.size.toLong
        val sdiff = ts.map(t =>
          BigInt(lgRef(tgt.getOrElse(t, 0L) + 1)) - BigInt(lgRef(raw(t) + 1))).sum
        id -> ((lang, n, sdiff + BigInt(n) * corr))
      }
    }.toMap
    val got = operators.TextAnalysis.txtDsirWeights(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (lang, n, wNum, wMicro, sel)) =>
      val (eLang, eN, eW) = expected(id)
      assert(lang == eLang && n == eN, s"doc $id identity")
      assert(BigInt(wNum) == eW, s"doc $id w_num")
      // sign-split truncating micro division, exactly the operator's
      val eMicro = (eW.abs * 1000000 / (BigInt(n) * 1048576)).toLong *
        (if (eW < 0) -1 else 1)
      assert(wMicro == eMicro, s"doc $id w_micro")
      assert(sel == (wMicro > operators.TextAnalysis.DsirMinMicro), s"doc $id selected")
    }
    // the weights must actually discriminate: not all docs on one side
    val flags = got.values.map(_._5).toSet
    assert(flags == Set(true, false),
      "selection flag must be two-class on the test corpus")
  }

  test("pipe_dsir_topk: per-language short-list matches a driver rank over the weight table; TopK prunes") {
    val w = operators.TextAnalysis.txtDsirWeights(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(4)))
    val expected = w.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy(t => (-t._4, t._2)).take(operators.TextAnalysis.DsirTopK)
        .zipWithIndex.map { case ((_, id, n, micro), i) =>
          (lang, i + 1L, id, n, micro) }
    }.toSet
    val df = operators.TextAnalysis.pipeDsirTopk(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // the corpus-sized weight table must be pruned through the
    // bounded-heap operator, not ranked by a raw per-language window
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"),
      s"selection list must prune through TopKPerGroup:\n${p.take(1200)}")
  }

  test("txt_dsir_bigram: numerators recompute from raw/target bigram LMs; flag two-class") {
    val rows = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val bgs = rows.map { case (id, lang, src, text) =>
      val toks = text.split(' ').filter(_.nonEmpty)
      (id, lang, src,
        toks.iterator.sliding(2).withPartial(false).map(p => p(0) + " " + p(1)).toSeq)
    }.filter(_._4.nonEmpty)
    val byLang = bgs.groupBy(_._2)
    val expected = byLang.toSeq.flatMap { case (_, docs) =>
      val raw = docs.flatMap(_._4).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tgt = docs.filter(_._3 == "src0").flatMap(_._4)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val b = raw.size.toLong
      val nR = raw.values.sum
      val nT = tgt.values.sum
      val corr = BigInt(lgRef(nR + b)) - BigInt(lgRef(nT + b))
      docs.map { case (id, lang, _, ds) =>
        val n = ds.size.toLong
        val sdiff = ds.map(g =>
          BigInt(lgRef(tgt.getOrElse(g, 0L) + 1)) - BigInt(lgRef(raw(g) + 1))).sum
        id -> ((lang, n, sdiff + BigInt(n) * corr))
      }
    }.toMap
    val got = operators.TextAnalysis.txtDsirBigram(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.keySet == expected.keySet,
      "exactly the docs with >= 1 bigram are scored")
    got.foreach { case (id, (lang, n, wNum, wMicro, sel)) =>
      val (eLang, eN, eW) = expected(id)
      assert(lang == eLang && n == eN, s"doc $id identity")
      assert(BigInt(wNum) == eW, s"doc $id w_num")
      val eMicro = (eW.abs * 1000000 / (BigInt(n) * 1048576)).toLong *
        (if (eW < 0) -1 else 1)
      assert(wMicro == eMicro, s"doc $id w_micro")
      assert(sel == (wMicro > operators.TextAnalysis.Dsir2MinMicro), s"doc $id selected")
    }
    assert(got.values.map(_._5).toSet == Set(true, false),
      "bigram selection flag must be two-class on the test corpus")
  }
}
