package graft

import graft.operators.{Analytics, Dedup, Multimodal, Similarity, TextAnalysis}

/** Round-12 widening specs: structural invariants of the new
  * time-series screens, link-analysis, sketch/compression tiers and
  * the k-means‖ seeding round. Value parity vs DuckDB is the gate's
  * job; these pin the identities the oracle can't express. */
class Round12NewOpsSpec extends SparkSpec {

  test("q173 Durbin-Watson: 0 <= DW <= 4 via num <= 4*den, and den > 0") {
    val rows = Analytics.q173DurbinWatson(spark, sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val num = BigInt(r.getAs[String]("dw_num"))
      val den = BigInt(r.getAs[String]("dw_den"))
      assert(den > 0, s"den must be positive: $r")
      // (a-b)^2 <= 2a^2 + 2b^2 summed => num <= 4*den
      assert(num >= 0 && num <= den * 4, s"DW out of [0,4]: $r")
    }
  }

  test("q174 turning points: bounded by the interior length") {
    Analytics.q174TurningPoints(spark, sf0001).collect().foreach { r =>
      val n = r.getAs[Long]("n_days")
      val tp = r.getAs[Long]("tp_count")
      assert(tp >= 0 && tp <= n - 2, s"tp_count out of range: $r")
      assert(r.getAs[Long]("exp_num3") == 2 * (n - 2))
      assert(r.getAs[Long]("var_num90") == 16 * n - 29)
    }
  }

  test("q175 Bartels: doubled midranks sum to n(n+1) exactly") {
    Analytics.q175BartelsRank(spark, sf0001).collect().foreach { r =>
      val n = r.getAs[Long]("n_days")
      assert(r.getAs[Long]("rank_sum2") == n * (n + 1),
        s"midrank identity broken: $r")
      assert(BigInt(r.getAs[String]("rvn_den")) > 0)
    }
  }

  test("q176 KPSS: eta and s2 nonnegative; eta bounded by n^2 * s2 (partial sums of a zero-sum series)") {
    Analytics.q176KpssInputs(spark, sf0001).collect().foreach { r =>
      val n = BigInt(r.getAs[Long]("n_days"))
      val eta = BigInt(r.getAs[String]("eta_num"))
      val s2 = BigInt(r.getAs[String]("s2_num"))
      assert(eta >= 0 && s2 > 0)
      // Cauchy-Schwarz: each |P_t| <= sqrt(t * sum e^2) => eta <= n^2 s2
      assert(eta <= n * n * s2, s"eta past the Cauchy-Schwarz bound: $r")
    }
  }

  test("q177 HITS: a2 dominates a1 (h1 >= a1(p) along every edge) and ranks are ordered") {
    val rows = Analytics.q177Hits(spark, sf0001).collect()
    assert(rows.length == 20)
    val a2s = rows.map(_.getAs[Long]("a2")).toSeq
    assert(a2s == a2s.sortBy(-_), "output must be a2-descending")
    rows.foreach { r =>
      assert(r.getAs[Long]("a2") >= r.getAs[Long]("a1"),
        s"a2 = sum of h1 over >= a1 contributing customers each >= a1: $r")
    }
  }

  test("txt_theil_u: micros within [0, 1e6] and joint entropy dominates each marginal") {
    val r = TextAnalysis.txtTheilU(spark, sf0001).collect().head
    val hx = r.getAs[Long]("h_lang_num")
    val hy = r.getAs[Long]("h_source_num")
    val hxy = r.getAs[Long]("h_joint_num")
    assert(hx > 0 && hy > 0 && hxy > 0)
    val ul = r.getAs[Long]("u_lang_micro")
    val us = r.getAs[Long]("u_source_micro")
    assert(ul >= 0 && ul <= 1000000, s"U(lang) out of [0,1]: $ul")
    assert(us >= 0 && us <= 1000000, s"U(source) out of [0,1]: $us")
    // floored logs keep the subadditivity direction up to the clamp
    assert(r.getAs[Long]("i_num") >= 0)
  }

  test("dd_bbit_minhash: m_bits in [0,8]; full-signature-identical pairs read m = 8") {
    import org.apache.spark.sql.functions._
    val pairs = Dedup.ddBbitMinhash(spark, sf0001)
    pairs.collect().foreach { r =>
      val m = r.getAs[Long]("m_bits")
      assert(m >= 0 && m <= 8)
      assert(r.getAs[Long]("rho_num8") == 2 * m - 8)
    }
    // exact-text duplicate docs share all 8 per-perm mins => all 8 bits
    val sigs = Dedup.ddMinhashSigs(spark, sf0001)
      .select(col("doc_id"), col("signature"))
    val dupPair = sigs.as("a").join(sigs.as("b"),
        col("a.signature") === col("b.signature") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).collect()
    if (dupPair.nonEmpty) {
      val (da, db) = (dupPair.head.getLong(0), dupPair.head.getLong(1))
      val hit = pairs.where(col("doc_a") === da && col("doc_b") === db).collect()
      hit.foreach(r => assert(r.getAs[Long]("m_bits") == 8,
        s"identical signatures must agree on every bit: $r"))
    }
  }

  test("mm_phash_hamming_hist: tier counts sum to the pair-set size") {
    import org.apache.spark.sql.functions._
    val total = Multimodal.mmPhashDup(spark, sf0001).count()
    val hist = Multimodal.mmPhashHammingHist(spark, sf0001).collect()
    assert(hist.map(_.getAs[Long]("n_pairs")).sum == total)
    hist.foreach(r => assert(r.getAs[Long]("hamming") >= 0 &&
      r.getAs[Long]("hamming") <= 5))
  }

  test("sim_bq_rerank: every answer comes from the Hamming candidate set and scores are descending per query") {
    val cand = Similarity.simHammingTopk(spark, sf0001, 20)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val out = Similarity.simBqRerank(spark, sf0001).collect()
    out.foreach { r =>
      assert(cand.contains((r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))),
        s"re-ranked answer outside the candidate set: $r")
    }
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val scores = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score")).toSeq
      assert(scores == scores.sorted.reverse, s"scores not descending: $scores")
    }
  }

  test("q178 gamma/Somers: pair classes partition n(n-1)/2 (with the y-tie complement) and |gamma| >= |Somers D|") {
    val r = Analytics.q178GammaSomers(spark, sf0001).collect().head
    val n = r.getAs[Long]("n")
    val c = r.getAs[Long]("c_pairs"); val d = r.getAs[Long]("d_pairs")
    val tx = r.getAs[Long]("tx_pairs"); val ty = r.getAs[Long]("ty_pairs")
    // C + D + T_x + T_y(+both-tied) = n(n-1)/2; the both-tied residue
    // is what's left inside cells
    assert(c + d + tx + ty <= n * (n - 1) / 2)
    assert(math.abs(r.getAs[Long]("gamma_micro")) >=
      math.abs(r.getAs[Long]("somers_d_micro")),
      "Somers' D has the larger denominator, so it can't exceed gamma")
  }

  test("q179 Cliff's delta: gt+lt+eq = n_b*n_r exactly and |delta| <= 1e6 micro") {
    val r = Analytics.q179CliffsDelta(spark, sf0001).collect().head
    val prod = r.getAs[Long]("n_b") * r.getAs[Long]("n_r")
    assert(r.getAs[Long]("n_gt") + r.getAs[Long]("n_lt") + r.getAs[Long]("n_eq") == prod,
      s"pair classes must partition the cross product: $r")
    assert(math.abs(r.getAs[Long]("delta_micro")) <= 1000000)
  }

  test("q180 Ljung-Box inputs: 7 lags per priority, |num| <= den (Cauchy-Schwarz), n_pairs = n - lag") {
    val rows = Analytics.q180LjungBox(spark, sf0001).collect()
    assert(rows.length == 35)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == r.getAs[Long]("n_days") - r.getAs[Long]("lag"))
      assert(BigInt(r.getAs[String]("rho_num")).abs <= BigInt(r.getAs[String]("rho_den")),
        s"autocovariance can't exceed the lag-0 variance: $r")
    }
  }

  test("q181 sign test: direction counts partition the pair count") {
    Analytics.q181SignTest(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") + r.getAs[Long]("n_zero")
        == r.getAs[Long]("n_pairs"), s"directions must partition: $r")
    }
  }

  test("sim_ivf_imbalance: lambda >= 1 exactly (Cauchy-Schwarz) with equality only when balanced") {
    val r = Similarity.simIvfImbalance(spark, sf0001).collect().head
    val k = r.getAs[Long]("k"); val n = r.getAs[Long]("n")
    val ss = r.getAs[Long]("sum_sq")
    assert(BigInt(k) * BigInt(ss) >= BigInt(n) * BigInt(n),
      "k*sum(n_c^2) >= n^2 always")
    assert(r.getAs[Long]("imbalance_micro") >= 1000000)
    assert(r.getAs[Long]("min_cell") <= r.getAs[Long]("max_cell"))
  }

  test("sim_kmeanspar_step: selection is the exact d2-proportional coin (replayable row by row)") {
    import org.apache.spark.sql.functions._
    val sel = Similarity.simKmeansParStep(spark, sf0001)
    val rows = sel.collect()
    assert(rows.nonEmpty, "an oversampling round on real data selects ~ell candidates")
    // replay: selected rows must satisfy u*phi < ell*d2*2^40 against
    // an independently recomputed phi
    val step = Similarity.simKmeansStep(spark, sf0001)
      .select(col("vec_id"), col("dist"))
    val phi = step.agg(sum(expr("cast(dist as decimal(38,6))"))).collect().head.getDecimal(0)
    rows.foreach { r =>
      val d2 = BigDecimal(r.getAs[Double]("d2")).setScale(6)
      val u = BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(s"kmpp:${r.getAs[Long]("vec_id")}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(10), 16)
      assert(BigDecimal(u) * BigDecimal(phi) <
        BigDecimal(20) * d2 * BigDecimal(BigInt(1) << 40),
        s"selected row fails the replayed coin test: $r")
    }
  }
}
