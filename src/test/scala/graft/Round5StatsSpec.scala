package graft

import org.apache.spark.sql.functions._

/** Round-5 third-wave specs: SPC control chart, brand modularity, Haar
  * wavelet energy, cross-correlation, McNemar, and odds-ratio — each
  * validated against a brute-force driver recompute on sf0.001 plus the
  * algebraic conservation laws the emitted integers must satisfy. */
class Round5StatsSpec extends SparkSpec {

  /** daily revenue cents keyed by (priority, day), recomputed in the
    * driver with exact BigDecimal→cents arithmetic. */
  private def dailyCents(): Map[(String, java.time.LocalDate), Long] =
    Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").as("cents"))
      .collect()
      .groupBy(r => (r.getString(0), r.getDate(1).toLocalDate))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }

  test("q138_control_chart: MR stats and out-of-control counts recompute") {
    val daily = dailyCents()
    val expected = daily.keys.map(_._1).toSeq.distinct.sorted.map { p =>
      val series = daily.collect { case ((`p`, d), c) => (d, c) }
        .toSeq.sortBy(_._1.toEpochDay).map(_._2)
      val mrs = series.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.toSeq
      val n = mrs.size.toLong; val s = mrs.sum; val mx = mrs.max
      val ooc = mrs.count(mr => BigInt(mr) * 1000 * n > BigInt(s) * 3267).toLong
      p -> ((n, s, mx, ooc))
    }.toMap
    val got = operators.Analytics.q138ControlChart(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
  }

  test("q141_haar: level energies equal a driver wavelet recompute and " +
    "level-1 coefficient count halves the calendar") {
    val daily = dailyCents().toSeq
      .groupBy(_._1._2).map { case (d, rs) => (d, rs.map(_._2).sum) }
      .toSeq.sortBy(_._1.toEpochDay).map(_._2)
    val expected = (1 to 3).map { l =>
      val blk = 1 << l; val half = 1 << (l - 1)
      val ds = daily.grouped(blk).filter(_.size == blk).map { g =>
        g.zipWithIndex.map { case (c, i) =>
          if ((i / half) % 2 == 0) BigInt(c) else BigInt(-c)
        }.sum
      }.toSeq
      (l.toLong, ds.size.toLong, ds.map(d => d * d).sum, ds.map(_.abs).max.toLong)
    }
    val got = operators.Analytics.q141Haar(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), big(r, 2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.head._2 == daily.size / 2, "level 1 pairs up the whole calendar")
  }

  test("q142_ccf: sufficient sums recompute and satisfy the variance identity") {
    val daily = dailyCents()
    def series(p: String) =
      daily.collect { case ((`p`, d), c) => (d.toEpochDay, c) }.toMap
    val xs = series("1-URGENT"); val ys = series("5-LOW")
    // only lags whose shifted join is non-empty appear in the output
    // (inner join) — mirror that here so a sparser testdata generation
    // can't fail the spec spuriously
    val expected = (0L to 7L).flatMap { lag =>
      val pairs = xs.toSeq.flatMap { case (d, x) => ys.get(d + lag).map(y => (x, y)) }
      if (pairs.isEmpty) None else Some {
      val n = pairs.size.toLong
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sx2 = pairs.map(p => BigInt(p._1) * p._1).sum
      val sy2 = pairs.map(p => BigInt(p._2) * p._2).sum
      (lag, n, sx, sy, n * sxy - sx * sy, n * sx2 - sx * sx, n * sy2 - sy * sy)
    } }
    val got = operators.Analytics.q142Ccf(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), big(r, 2), big(r, 3), big(r, 4),
        big(r, 5), big(r, 6))).toSeq
    assert(got == expected)
    // n·Σx² − (Σx)² = Σᵢ<ⱼ(xᵢ−xⱼ)² ≥ 0: the variance numerator is never negative
    got.foreach { g => assert(g._6 >= 0 && g._7 >= 0) }
  }

  test("q140_modularity: per-brand terms recompute from the co-purchase edges and " +
    "degree sums conserve 2m") {
    val rows = operators.Analytics.q140Modularity(spark, sf0001).collect()
    val m = rows.head.getLong(3)
    assert(rows.forall(_.getLong(3) == m), "m_edges is the one global total")
    assert(rows.map(_.getLong(1)).sum == 2 * m, "Σ deg_sum = 2m (each edge has two endpoints)")
    assert(rows.map(_.getLong(2)).sum <= m, "intra-brand edges are a subset of all edges")
    rows.foreach { r =>
      val term = BigInt(4) * m * r.getLong(2) - BigInt(r.getLong(1)) * r.getLong(1)
      assert(big(r, 4) == term, s"q_term recomputes for ${r.getString(0)}")
    }
  }

  test("q143_mcnemar: cells partition the customer dim and the statistic recomputes") {
    val rows = operators.Analytics.q143Mcnemar(spark, sf0001).collect()
    val nCustomers = Tables.customer(spark, sf0001).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).sum
      == nCustomers, "2×2 cells partition every customer exactly once")
    rows.foreach { r =>
      val b = r.getLong(2); val c = r.getLong(3)
      assert(big(r, 5) == BigInt(b - c) * (b - c))
      assert(r.getLong(6) == b + c)
      if (b + c > 0)
        assert(r.getDouble(7) == ((b - c).toDouble * (b - c)) / (b + c))
    }
  }

  test("q144_odds_ratio: cells partition customers per nation; OR/RR cross-multiply") {
    val rows = operators.Analytics.q144OddsRatio(spark, sf0001).collect()
    val nCustomers = Tables.customer(spark, sf0001).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).sum
      == nCustomers)
    rows.foreach { r =>
      val (eo, en, uo, un) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(big(r, 5) == BigInt(eo) * un && big(r, 6) == BigInt(en) * uo)
      assert(big(r, 8) == BigInt(eo) * (uo + un) && big(r, 9) == BigInt(uo) * (eo + en))
      if (en > 0 && uo > 0)
        assert(r.getDouble(7) == (BigInt(eo) * un).toDouble / (BigInt(en) * uo).toDouble)
    }
  }

  test("q145_logrank: risk sets recompute, group-1 subsets bound, variance accumulates") {
    val rows = operators.Analytics.q145Logrank(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // risk sets decrease as t advances; the group-1 slice is always a subset
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) < a.getLong(1), "total risk set strictly shrinks past each event time")
        assert(b.getLong(2) <= a.getLong(2))
        assert(b.getDouble(6) >= a.getDouble(6) - 1e-12, "cumulative variance never decreases")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n1_risk <= n_risk")
      assert(r.getLong(4) <= r.getLong(3), "d1 <= d")
      assert(r.getLong(3) > 0, "only event times are emitted")
    }
    // driver recompute of the final O−E with the same left-to-right fold
    val life = {
      val perCust = Tables.orders(spark, sf0001)
        .groupBy(col("o_custkey"))
        .agg(min(to_date(col("o_orderdate"))).as("fd"), max(to_date(col("o_orderdate"))).as("ld"))
      val cut = Tables.orders(spark, sf0001)
        .agg(date_sub(max(to_date(col("o_orderdate"))), 56).as("cut")).collect()(0).getDate(0)
      perCust.join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
        .select(col("fd"), col("ld"), col("c_mktsegment")).collect().map { r =>
          val t = (r.getDate(1).toLocalDate.toEpochDay - r.getDate(0).toLocalDate.toEpochDay) / 7
          (t, if (!r.getDate(1).after(cut)) 1 else 0,
            if (r.getString(2) == "BUILDING") 1 else 0)
        }
    }
    val byT = life.groupBy(_._1).map { case (t, rs) =>
      (t, rs.size.toLong, rs.map(_._3.toLong).sum, rs.map(_._2.toLong).sum,
        rs.map(x => (x._2 * x._3).toLong).sum)
    }.toSeq.sortBy(_._1)
    val nTot = life.size.toLong; val n1Tot = life.map(_._3.toLong).sum
    var seenM = 0L; var seenM1 = 0L; var oe = 0.0
    val expected = byT.flatMap { case (t, m, m1, d, d1) =>
      val nr = nTot - seenM; val n1r = n1Tot - seenM1
      seenM += m; seenM1 += m1
      if (d > 0) { oe += d1.toDouble - d.toDouble * n1r / nr; Some((t, nr, n1r, oe)) }
      else None
    }
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.toSeq == expected)
  }

  test("sim_hubness: histogram conserves nodes and total kNN edges") {
    val rows = operators.Similarity.simHubness(spark, sf0001).collect()
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nVecs, "every vector lands in exactly one bucket")
    val edges = operators.Similarity.simKnnGraph(spark, sf0001).count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == edges,
      "Σ indeg·n_nodes = number of kNN edges")
  }

  test("sim_covariance: full upper triangle, shared per-dimension sums, PSD diagonal") {
    val rows = operators.Similarity.simCovariance(spark, sf0001).collect()
    assert(rows.length == 64 * 65 / 2, "64·65/2 upper-triangle cells incl. diagonal")
    val n = Tables.embeddings(spark, sf0001).count()
    assert(rows.forall(_.getLong(2) == n))
    rows.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(big(r, 3).signum >= 0, "diagonal second moments are non-negative"))
    // sum_i depends only on dim_i: every row with the same i agrees
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.map(r => big(r, 4)).distinct.size == 1)
    }
  }

  test("txt_sentence_stats: counts recompute against a driver regex pass") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val sents = ds.map(d => "[.!?]+".r.findAllIn(d._2).size.toLong)
      val words = ds.map(d => d._2.split(" ").count(_.nonEmpty).toLong)
      val nd = ds.size.toLong; val ns = sents.sum
      lang -> ((nd, ns, words.sum, sents.max, ns * 1000000L / nd,
        if (ns == 0) None else Some(words.sum * 1000000L / ns)))
    }
    val got = operators.TextAnalysis.txtSentenceStats(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    assert(got == expected)
  }

  test("dd_quality_keepers: keeper is the longest member of its component") {
    val comp = operators.Dedup.ddComponents(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val chars = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = comp.groupBy(_._2).map { case (c, ms) =>
      val members = ms.map(_._1)
      val best = members.map(id => (chars(id), -id)).max
      c -> ((members.size.toLong, members.map(chars).sum, -best._2, best._1))
    }
    val got = operators.Dedup.ddQualityKeepers(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
  }

  test("q146_levene: group medians and deviation sums recompute") {
    val vals = Tables.customer(spark, sf0001)
      .select(col("c_mktsegment"),
        expr("cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = vals.groupBy(_._1).map { case (seg, rs) =>
      val xs = rs.map(_._2).sorted
      val med = xs((xs.size + 1) / 2 - 1)
      val zs = xs.map(x => math.abs(x - med))
      seg -> ((xs.size.toLong, med, zs.sum, zs.map(z => BigInt(z) * z).sum))
    }
    val got = operators.Analytics.q146Levene(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), big(r, 4))))
      .toMap
    assert(got == expected)
  }

  test("q147_open_orders: running count recomputes and drains to zero") {
    val rows = operators.Analytics.q147OpenOrders(spark, sf0001).collect()
    var run = 0L
    rows.foreach { r => run += r.getLong(1); assert(r.getLong(2) == run) }
    assert(run == 0L, "every +1 is matched by a -1 thirty days later")
    assert(rows.map(_.getLong(2)).max > 0)
  }

  test("q148_qq_decile: deciles are exact order statistics of each sample") {
    def sample(p: String): Array[Long] = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === p)
      .select(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"))
      .collect().map(_.getLong(0)).sorted
    val xs = sample("1-URGENT"); val ys = sample("5-LOW")
    def stat(s: Array[Long], q: Long): Long = {
      val k = (s.length.toLong * q + 9) / 10 // ceil(n·q/10)
      s((k - 1).toInt)
    }
    val got = operators.Analytics.q148QqDecile(spark, sf0001).collect()
    assert(got.length == 9)
    got.foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(1) == stat(xs, q) && r.getLong(2) == stat(ys, q))
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }

  test("q149_seq_patterns: support never exceeds occurrences or the user count") {
    val rows = operators.Analytics.q149SeqPatterns(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sf0001).select(col("user_id")).distinct().count()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "a user contributes >= 1 occurrence")
      assert(r.getLong(2) <= nUsers)
      assert(r.getLong(2) >= 1)
    }
    // descending support with (a, b) tie order
    rows.sliding(2).foreach {
      case Array(x, y) =>
        assert(x.getLong(2) > y.getLong(2) ||
        (x.getLong(2) == y.getLong(2) &&
          (x.getString(0) < y.getString(0) ||
            (x.getString(0) == y.getString(0) && x.getString(1) < y.getString(1)))))
    }
  }

  test("q150_seasonal_dow: trend/seasonal recompute from the daily series") {
    val daily = dailyCents().toSeq
      .groupBy(_._1._2).map { case (d, rs) => (d, rs.map(_._2).sum) }
      .toSeq.sortBy(_._1.toEpochDay)
    val det = daily.sliding(7).map { win =>
      val (day, cents) = win(3)
      val trend = win.map(_._2).sum * 1000L / 7L
      (day.getDayOfWeek.getValue % 7, cents * 1000L - trend)
    }.toSeq
    val expected = det.groupBy(_._1).map { case (dow, rs) =>
      val s = rs.map(_._2).sum; val n = rs.size.toLong
      dow.toLong -> ((n, s, rs.map(_._2).max, Math.floorDiv(s, n)))
    }
    val got = operators.Analytics.q150SeasonalDow(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
  }

  test("txt_kn_prob: rationals recompute from independent counts and stay in (0, 1)") {
    val rows = operators.TextAnalysis.txtKnProb(spark, sf0001).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val (c, cw1, nf, np, b) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
      assert(big(r, 7) == BigInt(4 * c - 3) * b + BigInt(3) * nf * np)
      assert(big(r, 8) == BigInt(4) * cw1 * b)
      assert(big(r, 7) > 0 && big(r, 7) < big(r, 8), "0 < P_KN < 1 on seen bigrams")
      assert(c <= cw1 && nf <= cw1 && np <= b)
    }
  }

  test("sim_power_iteration: v1..v3 equal the driver's ordered matrix-vector folds") {
    val g = operators.Similarity.simCovariance(spark, sf0001).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt),
        r.getLong(3) / 1e6))
    val full = (g ++ g.collect { case ((i, j), v) if i != j => ((j, i), v) }).toMap
    def mul(v: Array[Double]): Array[Double] =
      Array.tabulate(64) { i =>
        (0 until 64).foldLeft(0.0)((acc, j) => acc + full((i, j)) * v(j))
      }
    val v1 = mul(Array.fill(64)(1.0)); val v2 = mul(v1); val v3 = mul(v2)
    val got = operators.Similarity.simPowerIteration(spark, sf0001).collect()
    got.foreach { r =>
      val d = r.getLong(0).toInt
      assert(r.getDouble(1) == v1(d) && r.getDouble(2) == v2(d) && r.getDouble(3) == v3(d),
        s"dim $d folds bit-identically")
    }
  }

  test("q151_hurst_inputs: R and variance numerator recompute; deviations close the loop") {
    val daily = dailyCents()
    val expected = daily.keys.map(_._1).toSeq.distinct.sorted.map { p =>
      val series = daily.collect { case ((`p`, d), c) => (d, c) }
        .toSeq.sortBy(_._1.toEpochDay).map(_._2)
      val n = series.size.toLong; val s = series.sum
      val devs = series.scanLeft(0L)(_ + _).tail.zipWithIndex
        .map { case (pk, i) => BigInt(n) * pk - BigInt(i + 1) * s }
      assert(devs.last == 0, "d_n = n·S − n·S closes at zero")
      val sx2 = series.map(x => BigInt(x) * x).sum
      p -> ((n, s, devs.max - devs.min, BigInt(n) * sx2 - BigInt(s) * s))
    }.toMap
    val got = operators.Analytics.q151HurstInputs(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), big(r, 3), big(r, 4))))
      .toMap
    assert(got == expected)
  }

  test("q152_friedman: rank sums recompute; per-block 2x midranks total k(k+1)") {
    val daily = dailyCents()
    val weekly = daily.toSeq.groupBy { case ((p, d), _) => (p, d.toEpochDay / 7) }
      .map { case (k, rs) => k -> rs.map(_._2).sum }
    val byWeek = weekly.groupBy(_._1._2).filter(_._2.size == 5)
    val r2s = byWeek.toSeq.flatMap { case (_, vs) =>
      val vals = vs.map { case ((p, _), c) => (p, c) }
      vals.map { case (p, c) =>
        val less = vals.count(_._2 < c); val eq = vals.count(_._2 == c)
        (p, 2L * less + eq + 1)
      }
    }
    // each complete block's 2× midranks must total 2·(1+..+5) = 30
    byWeek.foreach { case (_, vs) =>
      val vals = vs.map(_._2)
      val tot = vals.map(c => 2L * vals.count(_ < c) + vals.count(_ == c) + 1).sum
      assert(tot == 30)
    }
    val expected = r2s.groupBy(_._1).map { case (p, rs) =>
      p -> ((rs.size.toLong, rs.map(_._2).sum, rs.map(r => BigInt(r._2) * r._2).sum))
    }
    val got = operators.Analytics.q152Friedman(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), big(r, 4)))).toMap
    assert(got == expected)
  }

  test("dd_soft_weights: mass splits within clusters and singletons keep full weight") {
    val rows = operators.Dedup.ddSoftWeights(spark, sf0001).collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs, "every document gets a weight")
    val sizes = operators.Dedup.ddComponents(spark, sf0001).collect()
      .groupBy(_.getLong(1)).map { case (c, ms) => c -> ms.length.toLong }
    rows.foreach { r =>
      val expectedSize = sizes.getOrElse(r.getLong(1), 1L)
      assert(r.getLong(2) == expectedSize)
      assert(r.getLong(3) == 1000000L / expectedSize)
    }
    assert(rows.count(_.getLong(2) == 1L) > 0, "corpus has singletons")
  }

  test("q153_cochran_q: Q pieces recompute from the three activity sets") {
    val rows = operators.Analytics.q153CochranQ(spark, sf0001).collect()
    assert(rows.length == 3)
    val o = Tables.orders(spark, sf0001)
    def activeSet(y: Int) = o.filter(expr(s"year(o_orderdate) = $y"))
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val (a95, a96, a97) = (activeSet(1995), activeSet(1996), activeSet(1997))
    val custs = Tables.customer(spark, sf0001).select(col("c_custkey"))
      .collect().map(_.getLong(0))
    val ls = custs.map(c => Seq(a95(c), a96(c), a97(c)).count(identity).toLong)
    val gs = Map(1995L -> custs.count(a95).toLong, 1996L -> custs.count(a96).toLong,
      1997L -> custs.count(a97).toLong)
    val sumG = gs.values.sum
    val qNum = BigInt(2) * (3 * gs.values.map(g => BigInt(g) * g).sum - BigInt(sumG) * sumG)
    val qDen = BigInt(3) * ls.sum - ls.map(l => l * l).sum
    rows.foreach { r =>
      assert(r.getLong(1) == gs(r.getLong(0)))
      assert(r.getLong(2) == custs.length.toLong)
      assert(big(r, 3) == qNum && big(r, 4) == qDen)
      assert(r.getDouble(5) == qNum.toDouble / qDen.toDouble)
    }
  }

  test("txt_doc_keywords: every doc with tokens gets <= 3 ranked keywords, scores ordered") {
    val rows = operators.TextAnalysis.txtDocKeywords(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(5) > b.getDouble(5) ||
            (a.getDouble(5) == b.getDouble(5) && a.getString(2) < b.getString(2)))
        case _ =>
      }
    }
    // tf never exceeds the doc's token count; df >= 1
    rows.foreach(r => assert(r.getLong(3) >= 1 && r.getLong(4) >= 1))
  }

  test("q154_grubbs_inputs: extreme deviation and its day recompute") {
    val daily = dailyCents()
    val expected = daily.keys.map(_._1).toSeq.distinct.sorted.map { p =>
      val series = daily.collect { case ((`p`, d), c) => (d, c) }.toSeq
      val n = series.size.toLong; val s = series.map(_._2).sum
      val devs = series.map { case (d, c) => (d, (BigInt(n) * c - s).abs) }
      val gNum = devs.map(_._2).max
      val peak = devs.filter(_._2 == gNum).map(_._1).minBy(_.toEpochDay)
      val sx2 = series.map(x => BigInt(x._2) * x._2).sum
      p -> ((n, s, gNum, peak, BigInt(n) * sx2 - BigInt(s) * s))
    }.toMap
    val got = operators.Analytics.q154GrubbsInputs(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), big(r, 3),
        r.getDate(4).toLocalDate, big(r, 5)))).toMap
    assert(got == expected)
  }

  test("dd_lsh_precision: hit count equals the recall side's catch count") {
    val p = operators.Dedup.ddLshPrecision(spark, sf0001).collect()(0)
    val r = operators.Dedup.ddLshRecall(spark, sf0001).collect()(0)
    assert(p.getLong(1) == r.getLong(1),
      "|exact ∩ candidates| must agree between the two audits")
    assert(p.getLong(1) <= p.getLong(0))
    assert(p.getLong(2) == p.getLong(1) * 1000000L / p.getLong(0))
  }

  test("sim_norm2_hist: buckets partition the corpus with ordered ranges") {
    val rows = operators.Similarity.simNorm2Hist(spark, sf0001).collect()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 10)
      assert(r.getLong(2) <= r.getLong(3))
    }
    // bucket ranges are disjoint and ordered
    rows.sortBy(_.getLong(0)).sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2))
      case _ =>
    }
  }

  test("q155_binary_seg: split points recompute against a driver binary segmentation") {
    val daily = dailyCents().toSeq
      .groupBy(_._1._2).map { case (d, rs) => (d, rs.map(_._2).sum) }
      .toSeq.sortBy(_._1.toEpochDay)
    val n = daily.size.toLong
    val pfx = daily.map(_._2).scanLeft(BigInt(0))(_ + _).tail
    val s = pfx.last
    def argmax(ks: Seq[Long], score: Long => BigInt): (Long, BigInt) =
      ks.map(k => (k, score(k))).maxBy { case (k, sc) => (sc, -k) }
    val (k1, sc1) = argmax((1L until n).toSeq, k => (BigInt(n) * pfx((k - 1).toInt) - BigInt(k) * s).abs)
    val p1 = pfx((k1 - 1).toInt)
    val (kl, scl) = argmax((1L until k1).toSeq,
      k => (BigInt(k1) * pfx((k - 1).toInt) - BigInt(k) * p1).abs)
    val (kr, scr) = argmax(((k1 + 1) until n).toSeq,
      k => (BigInt(n - k1) * (pfx((k - 1).toInt) - p1) - BigInt(k - k1) * (s - p1)).abs)
    val got = operators.Analytics.q155BinarySeg(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getDate(1).toLocalDate, r.getLong(2), big(r, 3)))).toMap
    assert(got("all") == ((daily((k1 - 1).toInt)._1, k1, sc1)))
    assert(got("left") == ((daily((kl - 1).toInt)._1, kl, scl)))
    assert(got("right") == ((daily((kr - 1).toInt)._1, kr, scr)))
  }

  test("txt_fertility: ratios recompute and BPE-ish tokenization never shrinks the word count") {
    val rows = operators.TextAnalysis.txtFertility(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2),
        "every whitespace word yields at least one BPE-ish token")
      assert(r.getLong(4) == r.getLong(3) * 1000000L / r.getLong(2))
      assert(r.getLong(4) >= 1000000L)
    }
  }

  test("sim_ivf_probe_curve: recall and candidates are monotone in nprobe; nprobe=4 covers both cells") {
    val rows = operators.Similarity.simIvfProbeCurve(spark, sf0001).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) >= a.getLong(1), "more probes, more candidates")
        assert(b.getLong(3) >= a.getLong(3), "more probes never lose hits")
      case _ =>
    }
    // nprobe=2 must reproduce the gated sim_recall_report totals
    val rr = operators.Similarity.simRecallReport(spark, sf0001).collect()
    assert(rows(1).getLong(3) == rr.map(_.getLong(2)).sum)
    assert(rows(1).getLong(2) == rr.map(_.getLong(1)).sum)
  }

  test("q156_mk_seasonal: per-dow S statistics recompute") {
    val daily = dailyCents().toSeq
      .groupBy(_._1._2).map { case (d, rs) => (d, rs.map(_._2).sum) }
    val expected = daily.groupBy(_._1.getDayOfWeek.getValue % 7)
      // a dow with a single observation has no pairs — the operator's
      // inner join on the S statistic drops it; mirror that
      .filter(_._2.size >= 2)
      .map { case (dowJ, rs) =>
      val series = rs.toSeq.sortBy(_._1.toEpochDay).map(_._2)
      var s = 0L
      for (i <- series.indices; j <- (i + 1) until series.size)
        s += java.lang.Long.signum(series(j) - series(i))
      val n = series.size.toLong
      val tieTerm = series.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      // spark dow = dayofweek - 1 (0 = Sunday); java getValue: Mon=1..Sun=7
      dowJ.toLong -> ((n, s, n * (n - 1) * (2 * n + 5) - tieTerm))
    }
    val got = operators.Analytics.q156MkSeasonal(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("txt_lid_trigram: confusion matrix matches a driver rank-weight recompute") {
    // NOTE: the synthetic corpus draws every language's text from one
    // shared token pool, so no content-based LID can beat majority
    // class here — the spec therefore checks the exact Cavnar–Trenkle
    // mechanics (rank-weight scoring, tie-breaks), not accuracy.
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def tris(t: String): Seq[String] =
      (0 to math.max(t.length - 3, -1)).map(i => t.substring(i, i + 3))
    val profile: Map[String, Map[String, Long]] = docs.groupBy(_._2).map { case (lang, ds) =>
      val counts = ds.flatMap(d => tris(d._3)).groupBy(identity).view.mapValues(_.size.toLong)
      val top = counts.toSeq.sortBy { case (tri, c) => (-c, tri) }.take(100)
      lang -> top.zipWithIndex.map { case ((tri, _), i) => tri -> (100L - i) }.toMap
    }
    val expected = docs.map { case (id, lang, text) =>
      val dc = tris(text).groupBy(identity).view.mapValues(_.size.toLong)
      val scores = profile.map { case (pl, w) =>
        pl -> dc.map { case (tri, c) => c * w.getOrElse(tri, 0L) }.sum
      }.filter(_._2 > 0)
      val pred = if (scores.isEmpty) "unk"
        else scores.toSeq.minBy { case (pl, s) => (-s, pl) }._1
      (lang, pred)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = operators.TextAnalysis.txtLidTrigram(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("dd_dup_mass_report: counts reconcile with the component and hash views") {
    val r = operators.Dedup.ddDupMassReport(spark, sf0001).collect()(0)
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(r.getLong(0) == nDocs)
    val comp = operators.Dedup.ddComponents(spark, sf0001).collect()
    val nearDropped = comp.count(x => x.getLong(0) != x.getLong(1)).toLong
    assert(r.getLong(3) == nearDropped)
    assert(r.getLong(4) <= r.getLong(2) + r.getLong(3), "distinct union never exceeds the sum")
    assert(r.getLong(4) >= r.getLong(3), "union at least covers the near-dup side")
    assert(r.getLong(6) == r.getLong(5) * 1000000L / r.getLong(1))
  }

  test("q157_two_way_anova: cell statistics recompute and marginals reconcile with q138's series") {
    val daily = dailyCents()
    val expected = daily.toSeq.groupBy { case ((p, d), _) =>
      (p, d.getDayOfWeek.getValue % 7)
    }.map { case (k, rs) =>
      val vals = rs.map(_._2)
      k -> ((vals.size.toLong, vals.sum, vals.map(v => BigInt(v) * v).sum))
    }
    val got = operators.Analytics.q157TwoWayAnova(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), big(r, 4))))
      .toMap
    assert(got == expected)
    // row marginals recover the per-priority day counts
    val byPrio = got.groupBy(_._1._1).view.mapValues(_.values.map(_._1).sum)
    daily.keys.map(_._1).toSeq.distinct.foreach { p =>
      assert(byPrio(p) == daily.keys.count(_._1 == p).toLong)
    }
  }

  test("pipe_code_mix: shares partition each language's documents") {
    val rows = operators.CorpusPipeline.pipeCodeMixReport(spark, sf0001).collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val langDocs = g.head.getLong(4)
      assert(g.map(_.getLong(2)).sum == langDocs, "verdict cells partition the language")
      g.foreach(r => assert(r.getLong(5) == r.getLong(2) * 1000000L / langDocs))
    }
  }

  test("q158_cuped: theta pieces recompute from per-customer year spends") {
    val o = Tables.orders(spark, sf0001)
      .select(expr("year(o_orderdate)").as("y"), col("o_custkey"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    def spend(y: Int): Map[Long, Long] =
      o.filter(_._1 == y).groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val pre = spend(1995); val post = spend(1996)
    val custs = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = custs.groupBy(_._2).map { case (seg, cs) =>
      val xs = cs.map(c => (pre.getOrElse(c._1, 0L), post.getOrElse(c._1, 0L)))
      val n = xs.size.toLong
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxy = xs.map(p => BigInt(p._1) * p._2).sum
      val sx2 = xs.map(p => BigInt(p._1) * p._1).sum
      seg -> ((n, sx, sy, n * sxy - BigInt(sx) * sy, n * sx2 - BigInt(sx) * sx))
    }
    val got = operators.Analytics.q158Cuped(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        big(r, 4), big(r, 5)))).toMap
    assert(got == expected)
    got.values.foreach(v => assert(v._5 >= 0, "Var(pre) numerator is non-negative"))
  }

  test("pipe_boilerplate_exposure: hits bound spans and only hot-span docs appear") {
    val rows = operators.CorpusPipeline.pipeBoilerplateExposure(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nHot = operators.Dedup.ddHotSpans(spark, sf0001).count()
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= nHot,
        "distinct hot spans per doc bounded by the hot-span list")
      assert(r.getLong(2) >= r.getLong(1), "occurrences >= distinct spans")
    }
  }

  test("q159_did_cells: cells recompute and the DiD rational equals the mean algebra") {
    val o = Tables.orders(spark, sf0001)
      .select(expr("year(o_orderdate)").as("y"), col("o_custkey"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    def spend(y: Int): Map[Long, Long] =
      o.filter(_._1 == y).groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val pre = spend(1995); val post = spend(1996)
    val custs = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), if (r.getString(1) == "BUILDING") 1L else 0L))
    def cell(t: Long, p: Int): (Long, Long) = {
      val cs = custs.filter(_._2 == t)
      val m = if (p == 0) pre else post
      (cs.length.toLong, cs.map(c => m.getOrElse(c._1, 0L)).sum)
    }
    val ((n11, s11), (n10, s10)) = (cell(1, 1), cell(1, 0))
    val ((n01, s01), (n00, s00)) = (cell(0, 1), cell(0, 0))
    val didNum = BigInt(s11) * n10 * n01 * n00 - BigInt(s10) * n11 * n01 * n00 -
      BigInt(s01) * n11 * n10 * n00 + BigInt(s00) * n11 * n10 * n01
    val didDen = BigInt(n11) * n10 * n01 * n00
    val rows = operators.Analytics.q159DidCells(spark, sf0001).collect()
    assert(rows.length == 4)
    val cells = rows.map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(cells((1L, 1L)) == ((n11, s11)) && cells((1L, 0L)) == ((n10, s10)))
    assert(cells((0L, 1L)) == ((n01, s01)) && cells((0L, 0L)) == ((n00, s00)))
    rows.foreach { r => assert(big(r, 4) == didNum && big(r, 5) == didDen) }
    // the rational equals ((s11/n11 − s10/n10) − (s01/n01 − s00/n00))
    val lhs = didNum.toDouble / didDen.toDouble
    val rhs = (s11.toDouble / n11 - s10.toDouble / n10) - (s01.toDouble / n01 - s00.toDouble / n00)
    assert(math.abs(lhs - rhs) < 1e-6)
  }

  test("sim_pq_residual: 8 subspaces partition the corpus, energies are positive and bounded") {
    val rows = operators.Similarity.simPqResidual(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L to 7L))
    val n = Tables.embeddings(spark, sf0001).count()
    rows.foreach { r =>
      assert(r.getLong(1) == n, "every vector contributes one residual per subspace")
      assert(r.getLong(2) >= 0)
      assert(r.getLong(3) <= r.getLong(2), "max residual bounded by total energy")
      assert(r.getLong(3) * n >= r.getLong(2), "n·max bounds the total")
    }
  }

  test("sim_centroid_shift: labels with stable assignments shift less than the max") {
    val rows = operators.Similarity.simCentroidShift(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nVecs, "old memberships partition the corpus")
    assert(rows.map(_.getLong(2)).sum == nVecs, "new memberships partition the corpus")
    rows.foreach(r => assert(r.getDouble(3) >= 0))
  }
}
