package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("quality stats cover all docs with ratios in [0,1]") {
    val rows = TextAnalysis.txtQuality(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      val pr = r.getAs[Double]("punct_ratio")
      val sr = r.getAs[Double]("stopword_ratio")
      val q = r.getAs[Double]("quality_score")
      assert(pr >= 0 && pr <= 1 && sr >= 0 && sr <= 1 && q >= 0 && q <= 1)
    }
  }

  test("langid predicts a language for every doc with consistent scores") {
    val rows = TextAnalysis.txtLangid(spark, sf0001).collect()
    assert(rows.length == 500)
    val langs = Set("de", "en", "es", "fr")
    rows.foreach { r =>
      val pred = r.getAs[String]("pred_lang")
      assert(langs.contains(pred))
      val scores = Map(
        "de" -> r.getAs[Long]("s_de"), "en" -> r.getAs[Long]("s_en"),
        "es" -> r.getAs[Long]("s_es"), "fr" -> r.getAs[Long]("s_fr"))
      assert(scores(pred) == scores.values.max)
    }
  }

  test("bpe-ish token count >= whitespace token count") {
    val rows = TextAnalysis.txtTokens(spark, sf0001).collect()
    assert(rows.forall(r =>
      r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_ws_tokens")))
  }

  test("fingerprints are stable signatures: equal text => equal fingerprint") {
    val fp = TextAnalysis.txtFingerprint(spark, sf0001).collect()
    assert(fp.length == 500)
    assert(fp.forall(_.getAs[String]("fingerprint").length == 32))
  }
}
