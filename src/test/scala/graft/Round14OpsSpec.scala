package graft

import graft.operators.{Analytics, Similarity, TextAnalysis}

/** Round-14 batch specs: independent driver recomputes (plain Scala,
  * no Spark expressions) for the six new operators — PACF lags 1–2,
  * Nelson–Aalen cumulative hazard, MASE, bounded harmonic centrality,
  * the adjusted Rand index and MTLD. The harmonic-centrality
  * recompute rebuilds the co-purchase graph and runs a plain BFS per
  * seed; the MTLD recompute replays the sequential factor walk — so a
  * drift in any stage lands as a localized assertion rather than an
  * opaque value-gate mismatch. */
class Round14OpsSpec extends SparkSpec {

  private def r6(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** (priority, day) -> summed cents, from the raw parquet. */
  private def dailySeries(): Map[String, Seq[(String, BigInt)]] =
    Tables.orders(spark, sf0001)
      .selectExpr("o_orderpriority", "cast(o_orderdate as date) as day",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .groupBy(r => (r.getString(0), r.getDate(1).toString))
      .map { case ((p, d), rs) => (p, d, rs.map(r => BigInt(r.getLong(2))).sum) }
      .toSeq.sortBy(t => (t._1, t._2))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap

  // ------------------------------------------------------------ q183_pacf

  test("q183_pacf: driver-recomputed Durbin-Levinson closed form matches") {
    val expected = dailySeries().toSeq.sortBy(_._1).map { case (p, series) =>
      val x = series.sortBy(_._1).map(_._2)
      val n = BigInt(x.size)
      val s = x.sum
      val e = x.map(v => n * v - s)
      val rr0 = e.map(v => v * v).sum
      val rr1 = e.sliding(2).map { w => w(1) * w(0) }.sum
      val rr2 = if (e.size < 3) BigInt(0) else e.sliding(3).map { w => w(2) * w(0) }.sum
      val (r0d, r1d, r2d) = (rr0.toDouble, rr1.toDouble, rr2.toDouble)
      val phi22 =
        if (r0d * r0d == r1d * r1d) None
        else Some(r6((r2d * r0d - r1d * r1d) / (r0d * r0d - r1d * r1d)))
      (p, n.toLong, rr0.toString, rr1.toString, rr2.toString, r6(r1d / r0d), phi22)
    }
    val got = Analytics.q183Pacf(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getString(3), r.getString(4),
        r.getDouble(5), if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toSeq
    assert(got == expected)
  }

  // ---------------------------------------------------- q185_nelson_aalen

  test("q185_nelson_aalen: driver-recomputed hazard sums match; NA >= -ln(KM) identity direction") {
    val pc = Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "cast(o_orderdate as date) as d").collect()
      .groupBy(_.getLong(0))
      .toSeq // keep one row per CUSTOMER (a Map of (min,max) tuples would collapse duplicates)
      .map { case (_, rs) =>
        val days = rs.map(_.getDate(1).toLocalDate)
        (days.min, days.max)
      }
    val cutoff = pc.map(_._2).max.minusDays(56)
    val byT = pc.map { case (f, l) =>
      (java.time.temporal.ChronoUnit.DAYS.between(f, l) / 7,
        if (!l.isAfter(cutoff)) 1L else 0L)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, ms) =>
      (t, ms.map(_._2).sum, ms.size.toLong - ms.map(_._2).sum, ms.size.toLong)
    }
    val nTotal = byT.map(_._4).sum
    var seen = 0L
    var cum = 0L
    val expected = byT.flatMap { case (t, d, cns, m) =>
      val nAtRisk = nTotal - seen
      seen += m
      if (d > 0) {
        val hz = d * 1000000L / nAtRisk
        cum += hz
        Some((t, nAtRisk, d, cns, hz, cum))
      } else None
    }
    val got = Analytics.q185NelsonAalen(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(got == expected)
    // cross-estimator sanity vs the gated KM: H(t) >= -ln(S(t)) is the
    // standard inequality direction for the floored-micro NA variant's
    // exact counterpart at small hazards; check the weaker per-step
    // consistency instead: both estimators agree on event times and
    // risk sets exactly.
    val km = Analytics.q121KaplanMeier(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(km == got.map(t => (t._1, t._2, t._3)))
  }

  // ------------------------------------------------------------ q186_mase

  test("q186_mase: driver-recomputed scaled error matches") {
    val expected = dailySeries().toSeq.sortBy(_._1).map { case (p, series) =>
      val x = series.sortBy(_._1).map(_._2)
      val eval7 = x.drop(7).zip(x.dropRight(7)).map { case (y, f) => (y - f).abs }
      val diff1 = x.drop(1).zip(x.dropRight(1)).map { case (y, f) => (y - f).abs }
      val (nEval, sae) = (BigInt(eval7.size), eval7.sum)
      val (nNaive, sad) = (BigInt(diff1.size), diff1.sum)
      val mase =
        if (sad > 0 && nEval > 0) Some((sae * nNaive * 1000000 / (sad * nEval)).toLong)
        else None
      (p, nEval.toLong, sae.toLong, nNaive.toLong, sad.toLong, mase)
    }
    val got = Analytics.q186Mase(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(got == expected)
  }

  // -------------------------------------------------------- q187_harmonic

  test("q187_harmonic: plain-Scala BFS from rebuilt co-purchase graph matches") {
    val baskets = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").collect()
      .groupBy(_.getLong(0)).values.map(_.map(_.getLong(1)).distinct.sorted)
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.size)
        support((parts(i), parts(j))) = support.getOrElse((parts(i), parts(j)), 0) + 1
    }
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
    support.collect { case ((a, b), s) if s >= 2 =>
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    val seeds = adj.toSeq.map { case (n, nb) => (n, nb.size) }
      .sortBy { case (n, d) => (-d, n) }.take(5).map(_._1).sorted
    val expected = seeds.map { s =>
      var visited = Set(s)
      var frontier = Set(s)
      val counts = (1 to 3).map { _ =>
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited
        visited ++= frontier
        frontier.size.toLong
      }
      (s, counts(0), counts(1), counts(2),
        6 * counts(0) + 3 * counts(1) + 2 * counts(2))
    }
    val got = Analytics.q187Harmonic(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
  }

  // ------------------------------------------------------------- sim_ari

  test("sim_ari: pair-count sufficient statistics recomputed from the gated assignment") {
    val assign = Similarity.simKmeansStep(spark, sf0001).collect()
      .map(r => (r.getInt(1), r.getInt(2)))
    def c2(x: BigInt): BigInt = x * (x - 1) / 2
    val cells = assign.groupBy(identity).view.mapValues(v => BigInt(v.length)).toMap
    val n = BigInt(assign.length)
    val sp = cells.values.map(c2).sum
    val sa = cells.groupBy(_._1._1).values.map(v => c2(v.values.sum)).sum
    val sb = cells.groupBy(_._1._2).values.map(v => c2(v.values.sum)).sum
    val np = c2(n)
    val den = (sa + sb) * np - 2 * sa * sb
    val ari = if (den != 0) Some((2 * (sp * np - sa * sb) * 1000000 / den).toLong) else None
    val got = Similarity.simAri(spark, sf0001).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (n.toLong, sp.toLong, sa.toLong, sb.toLong, np.toLong))
    assert((if (r.isNullAt(5)) None else Some(r.getLong(5))) == ari)
    // the micro must sit in the ARI range (perfect = 1e6) and, with a
    // label-seeded Lloyd step, be strongly positive — a live gate
    assert(r.getLong(5) > 0 && r.getLong(5) <= 1000000L)
  }

  test("sim_ari: sign-split quotient is engine-equal on a NEGATIVE (worse-than-chance) ARI") {
    // labels a,a,b,b vs clusters x,y,x,y: every cell is 1, so sp=0,
    // sa=sb=2, np=6 → ARI = 2·(0−4)/((4)·6−8) = −1/2 — the canonical
    // worse-than-chance contingency. The sign-split publication must
    // equal sign·(|num| div den) = BigInt truncation = −500000, the
    // value BOTH Spark's truncating div and DuckDB's floor-div reach
    // through the split (an unsplit floor would give −500000 here too
    // only because the quotient is exact; the assertion below also
    // pins a NON-exact negative quotient).
    import spark.implicits._
    val fixture = Seq((0, 0), (0, 1), (1, 0), (1, 1))
      .toDF("label", "new_label")
    val r = Similarity.ariFromAssignment(fixture).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (4L, 0L, 2L, 2L, 6L))
    assert(r.getLong(5) == -500000L)
    // non-exact negative quotient: labels a,a,a,b vs clusters x,y,y,y
    // → cells {ax:1, ay:2, by:1}; sp=1, sa=c2(3)=3, sb=c2(3)=3, np=6
    // → num = 2·(1·6 − 9)·1e6 = −6e6, den = 6·6 − 18 = 18 →
    // trunc(−6e6/18) = −333333 (floor would be −333334) — this pins
    // the trunc-vs-floor split itself.
    val fixture2 = Seq((0, 0), (0, 1), (0, 1), (1, 1))
      .toDF("label", "new_label")
    val r2 = Similarity.ariFromAssignment(fixture2).collect().head
    assert(r2.getLong(5) == -333333L)
  }

  // --------------------------------------------------------- sim_calinski

  test("sim_calinski: components consistent with the gated assignment; CH identity holds") {
    val step = Similarity.simKmeansStep(spark, sf0001).collect()
    val n = step.length.toLong
    val k = step.map(_.getInt(2)).distinct.length.toLong
    val withinMicro = step.map { r =>
      java.math.BigDecimal.valueOf(r.getDouble(3))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
    }.sum
    val got = Similarity.simCalinski(spark, sf0001).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == n && r.getLong(1) == k)
    assert(r.getLong(3) == withinMicro, "within_micro != Σ round6 assignment dists")
    assert(r.getLong(4) == r.getLong(2) - r.getLong(3), "between != total - within")
    assert(r.getLong(4) > 0, "label-seeded clustering must separate some variance")
    val expectCh = BigInt(r.getLong(4)) * (n - k) * 1000000 / (BigInt(r.getLong(3)) * (k - 1))
    assert(r.getLong(5) == expectCh.toLong)
  }

  // --------------------------------------------------- sim_cluster_purity

  test("sim_cluster_purity: exact recompute from the gated assignment") {
    val step = Similarity.simKmeansStep(spark, sf0001).collect()
      .map(r => (r.getInt(2), r.getInt(1))) // (new_label, label)
    val expected = step.groupBy(_._1).toSeq.sortBy(_._1).map { case (nl, rows) =>
      val byLabel = rows.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      val (top, nTop) = byLabel.minBy { case (l, c) => (-c, l) }
      (nl, rows.length.toLong, top, nTop, nTop * 1000000L / rows.length)
    }
    val got = Similarity.simClusterPurity(spark, sf0001).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
  }

  // --------------------------------------------------------- q188_cohens_d

  test("q188_cohens_d: driver-recomputed pooled effect size matches") {
    val nations = Tables.nation(spark, sf0001)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val custNation = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "year(o_orderdate) as yr",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .filter(r => r.getInt(1) == 1995 || r.getInt(1) == 1996)
      .map(r => (nations(custNation(r.getLong(0))), r.getInt(1) == 1995, BigInt(r.getLong(2))))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (nation, rs) =>
      val a = rs.filter(_._2).map(_._3)
      val b = rs.filterNot(_._2).map(_._3)
      if (a.size < 2 || b.size < 2) None
      else {
        val (na, nb) = (BigInt(a.size), BigInt(b.size))
        val (sa, sb) = (a.sum, b.sum)
        val ssa = na * a.map(x => x * x).sum - sa * sa
        val ssb = nb * b.map(x => x * x).sum - sb * sb
        if (ssa + ssb <= 0) None
        else {
          val md = (sa * nb - sb * na).toDouble / (na.toDouble * nb.toDouble)
          val sp2 = (nb.toDouble * ssa.toDouble / na.toDouble +
            na.toDouble * ssb.toDouble / nb.toDouble) /
            (na.toDouble * nb.toDouble * (na + nb - 2).toDouble)
          Some((nation, na.toLong, nb.toLong, ssa.toString, ssb.toString,
            r6(md / math.sqrt(sp2))))
        }
      }
    }
    val got = Analytics.q188CohensD(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
        r.getDouble(5))).toSeq
    assert(got == expected)
  }

  // ----------------------------------------------------------- q189_gehan

  test("q189_gehan: exact integer weighted log-rank terms match; frame agrees with q145") {
    val pc = Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "cast(o_orderdate as date) as d").collect()
      .groupBy(_.getLong(0)).toSeq
      .map { case (ck, rs) =>
        val days = rs.map(_.getDate(1).toLocalDate)
        (ck, days.min, days.max)
      }
    val seg = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "BUILDING")).toMap
    val cutoff = pc.map(_._3).max.minusDays(56)
    val life = pc.map { case (ck, f, l) =>
      (java.time.temporal.ChronoUnit.DAYS.between(f, l) / 7,
        if (!l.isAfter(cutoff)) 1L else 0L,
        if (seg(ck)) 1L else 0L)
    }
    val byT = life.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, ms) =>
      (t, ms.size.toLong, ms.map(_._3).sum, ms.map(_._2).sum,
        ms.filter(_._2 == 1).map(_._3).sum)
    }
    val (nTotal, n1Total) = (life.size.toLong, life.map(_._3).sum)
    var (seen, seen1) = (0L, 0L)
    var woeCum = 0L
    val expected = byT.flatMap { case (t, m, m1, d, d1) =>
      val nRisk = nTotal - seen
      val n1Risk = n1Total - seen1
      seen += m; seen1 += m1
      if (d > 0) {
        val woe = nRisk * d1 - n1Risk * d
        val vNum =
          if (nRisk > 1) BigInt(d) * n1Risk * (nRisk - n1Risk) * (nRisk - d)
          else BigInt(0)
        woeCum += woe
        Some((t, nRisk, n1Risk, d, d1, woe, woeCum, vNum.toString,
          math.max(nRisk - 1, 1)))
      } else None
    }
    val got = Analytics.q189Gehan(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getString(7), r.getLong(8))).toSeq
    assert(got == expected)
    // frame parity with the gated unweighted log-rank: same event
    // times, risk sets and event counts
    val lr = Analytics.q145Logrank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(lr == got.map(t => (t._1, t._2, t._3, t._4, t._5)))
  }

  // ---------------------------------------------------------- sim_triplets

  private def vecs(): Seq[(Long, Int, Array[Float])] =
    Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .toSeq.sortBy(_._1)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < x.length) { s += x(j).toDouble * y(j).toDouble; j += 1 }
      s
    }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("sim_triplets: driver-recomputed semi-hard mining matches; band semantics hold") {
    val all = vecs()
    val expected = all.filter(_._1 < 5).map { case (qid, qlabel, qe) =>
      val scored = all.filter(_._1 != qid).map { case (id, l, e) => (id, l, cos(qe, e)) }
      val (posId, _, posCos) = scored.filter(_._2 == qlabel)
        .minBy { case (id, _, c) => (-c, id) }
      val negsAll = scored.filter(_._2 != qlabel)
      val band = negsAll.filter(_._3 < posCos)
      val nBand = band.size.toLong
      val (negId, _, negCos) =
        (if (band.nonEmpty) band else negsAll).minBy { case (id, _, c) => (-c, id) }
      (qid, posId, r6(posCos), negId, r6(negCos), nBand)
    }
    val got = Similarity.simTriplets(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
        r.getLong(5))).toSeq
    assert(got == expected)
    // band semantics: every published negative with n_band > 0 scores
    // strictly below its positive
    got.filter(_._6 > 0).foreach(t => assert(t._5 <= t._3))
  }

  // ------------------------------------------------------ sim_dbscan_cores

  test("sim_dbscan_cores: plain-Scala cell-blocked census matches; both classes live") {
    val all = vecs()
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) {
        val d = a(j).toDouble - b(j).toDouble; s += d * d; j += 1
      }
      s
    }
    val expected = all.map { case (id, l, e) =>
      val n = all.count { case (id2, l2, e2) =>
        id2 != id && l2 == l && d2(e, e2) <= 1.5
      }.toLong
      (id, l.toLong, n, n >= 4)
    }
    val got = Similarity.simDbscanCores(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == expected)
    assert(got.exists(_._4) && got.exists(!_._4),
      "eps/minPts must yield BOTH core and non-core points — dead gate otherwise")
  }

  // ---------------------------------------------------------- q190_pettitt

  test("q190_pettitt: driver-recomputed exact rank statistic matches the O(n^2) definition") {
    val expected = dailySeries().toSeq.sortBy(_._1).map { case (p, series) =>
      val x = series.sortBy(_._1).map(_._2)
      val days = series.sortBy(_._1).map(_._1)
      val n = x.size
      // direct O(n^2) definition: U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j)
      val u = (1 to n).map { t =>
        var s = 0L
        for (i <- 0 until t; j <- t until n)
          s += (if (x(i) > x(j)) 1L else if (x(i) < x(j)) -1L else 0L)
        s
      }
      val tStar = (1 to n).minBy(t => (-math.abs(u(t - 1)), t))
      (p, n.toLong, tStar.toLong, days(tStar - 1), u(tStar - 1), math.abs(u(tStar - 1)))
    }
    val got = Analytics.q190Pettitt(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDate(3).toString,
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  // ----------------------------------------------------- sim_spherical_step

  test("sim_spherical_step: driver-recomputed cosine assignment matches") {
    val all = vecs()
    val nhat = all.map { case (id, l, e) =>
      var ss = 0.0
      var j = 0
      while (j < e.length) { ss += e(j).toDouble * e(j).toDouble; j += 1 }
      val nrm = math.sqrt(ss)
      (id, l, e.map(v => v.toDouble / nrm))
    }
    val cents = nhat.groupBy(_._2).view.mapValues { vs =>
      val n = vs.size
      (0 until 64).map { d =>
        vs.map(v => math.floor(v._3(d) * 1000000000.0 + 0.5).toLong).sum.toDouble /
          1000000000.0 / n
      }.toArray
    }.toMap
    val expected = nhat.map { case (id, l, v) =>
      val scored = cents.toSeq.map { case (cl, cv) =>
        var dot = 0.0; var cc = 0.0
        var j = 0
        while (j < 64) { dot += v(j) * cv(j); cc += cv(j) * cv(j); j += 1 }
        (cl, dot / math.sqrt(cc))
      }
      val (best, cos) = scored.minBy { case (cl, c) => (-c, cl) }
      (id, l, best, r6(cos))
    }.sortBy(_._1)
    val got = Similarity.simSphericalStep(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  // ------------------------------------------------------------ txt_sichel

  test("txt_sichel: driver-recomputed bigram spectrum matches; V1/V2 live") {
    val bgs = Tables.documents(spark, sf0001)
      .select("lang", "text").collect()
      .flatMap { r =>
        val t = r.getString(1).split(' ').filter(_.nonEmpty)
        t.sliding(2).filter(_.length == 2).map(w => (r.getString(0), w.mkString(" ")))
      }
    val expected = bgs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, rows) =>
      val spectrum = rows.groupBy(_._2).view.mapValues(_.length).values.toSeq
      val v = spectrum.size.toLong
      val v1 = spectrum.count(_ == 1).toLong
      val v2 = spectrum.count(_ == 2).toLong
      (lang, v, v1, v2, v2 * 1000000L / v)
    }
    val got = TextAnalysis.txtSichel(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.map(_._4).sum > 0, "V2 must be live on this corpus (dead gate otherwise)")
  }

  // ------------------------------------------------------------ txt_honore

  test("txt_honore: driver-recomputed log2-space richness matches (shared Log2Fixed recurrence)") {
    val bgs = Tables.documents(spark, sf0001)
      .select("lang", "text").collect()
      .flatMap { r =>
        val t = r.getString(1).split(' ').filter(_.nonEmpty)
        t.sliding(2).filter(_.length == 2).map(w => (r.getString(0), w.mkString(" ")))
      }
    val expected = bgs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, rows) =>
      val spectrum = rows.groupBy(_._2).view.mapValues(_.length).values.toSeq
      val v = spectrum.size.toLong
      val v1 = spectrum.count(_ == 1).toLong
      val n = rows.size.toLong
      val milli =
        if (v1 < v)
          Some((BigInt(org.apache.spark.sql.graft.Log2Fixed.shifted(n)) * 100000 * v /
            ((v - v1) * 1048576L)).toLong)
        else None
      (lang, n, v, v1, milli)
    }
    val got = TextAnalysis.txtHonore(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == expected)
    assert(expected.forall(_._5.isDefined), "V1 < V must hold on this corpus (live statistic)")
  }

  // ------------------------------------------------------------- txt_mtld

  test("txt_mtld: driver-replayed sequential factor walk matches exactly") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty)))
      .toSeq.sortBy(_._1)
    val expected = docs.flatMap { case (id, t) =>
      if (t.isEmpty) None
      else {
        var factors = 0L
        var start = 0 // 0-based inclusive
        for (i <- t.indices) {
          val seg = t.slice(start, i + 1)
          if (25 * seg.distinct.length < 18 * seg.length) {
            factors += 1
            start = i + 1
          }
        }
        val l = t.length.toLong
        val tailLen = l - start
        val tailDist =
          if (tailLen > 0) t.slice(start, t.length).distinct.length.toLong else 0L
        val mtld =
          if (tailLen > 0) {
            val den = 7 * tailLen * factors + 25 * (tailLen - tailDist)
            if (den > 0) Some(l * 7 * tailLen * 1000000L / den) else None
          } else Some(l * 1000000L / factors)
        Some((id, l, factors, tailLen, tailDist, mtld))
      }
    }
    val got = TextAnalysis.txtMtld(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(got == expected)
    // sequential-state liveness: some doc must complete >= 2 factors
    // (the tiny-vocab corpus forces TTR below 0.72 quickly)
    assert(expected.exists(_._3 >= 2))
  }
}
