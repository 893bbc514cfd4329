package graft

import org.apache.spark.sql.functions._

/** Round-9 widening: MaxSim multi-vector retrieval and the per-document
  * edit-distance dedup gate (batch half; the streaming twin is pinned in
  * StreamingSpec). */
class Round9WidenSpec extends SparkSpec {

  test("sim_maxsim: scores recompute from raw embeddings; top-k is true top-k") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sub(v: Array[Float], s: Int) = v.slice(s * 16, s * 16 + 16)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until 16) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def score(q: Array[Float], d: Array[Float]): Long =
      (0 until 4).map { s =>
        math.floor(1000000.0 *
          (0 until 4).map(t => cos(sub(q, s), sub(d, t))).max).toLong
      }.sum
    val rows = operators.Similarity.simMaxsim(spark, sf0001).collect()
    assert(rows.length == 5 * 10, "k rows per query")
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to 10L), "dense ranks 1..k")
      val scores = sorted.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "scores non-increasing with rank")
      assert(scores.forall(s => s <= 4000000L && s >= -4000000L),
        "MaxSim of 4 cosines is bounded by ±4·10⁶")
      sorted.foreach { r =>
        assert(r.getLong(3) == score(e(qid), e(r.getLong(2))),
          s"query $qid doc ${r.getLong(2)}: engine score != recompute")
      }
      // completeness: every excluded doc scores <= the kept minimum
      val kept = sorted.map(_.getLong(2)).toSet
      val minKept = scores.min
      e.keys.filter(v => v != qid && !kept(v)).foreach { v =>
        assert(score(e(qid), e(v)) <= minKept,
          s"doc $v outscores the kept top-k of query $qid")
      }
    }
  }

  test("sim_mmr: full greedy recomputes; MMR diverges from pure relevance") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosMicro(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      math.floor(1000000.0 * dot / (math.sqrt(na) * math.sqrt(nb))).toLong
    }
    // reference greedy: pool = top-20 by rel, then 5 MMR picks
    def greedy(qid: Long): Seq[(Long, Long, Long, Option[Long])] = {
      val rel = e.keys.filter(_ != qid).map(v => v -> cosMicro(e(qid), e(v))).toSeq
      val pool = rel.sortBy { case (v, r) => (-r, v) }.take(20)
      var selected = Vector.empty[(Long, Long, Long, Option[Long])] // (step, vec, rel, msim)
      var remaining = pool
      for (step <- 1 to 5) {
        val scoredRem = remaining.map { case (v, r) =>
          val msim =
            if (selected.isEmpty) None
            else Some(selected.map(s => cosMicro(e(v), e(s._2))).max)
          (v, r, msim)
        }
        val (pv, pr, pm) = scoredRem.minBy { case (v, r, m) => (-(r - m.getOrElse(0L)), v) }
        selected :+= ((step.toLong, pv, pr, pm))
        remaining = remaining.filterNot(_._1 == pv)
      }
      selected
    }
    val rows = operators.Similarity.simMmr(spark, sf0001).collect()
    assert(rows.length == 25)
    var diverged = false
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val exp = greedy(qid)
      val got = rs.sortBy(_.getLong(1)).map(r => (r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      assert(got.toSeq == exp, s"query $qid greedy mismatch:\n got $got\n exp $exp")
      // diversity: does MMR's set differ from the pure-relevance top-5?
      val relTop = e.keys.filter(_ != qid).map(v => v -> cosMicro(e(qid), e(v)))
        .toSeq.sortBy { case (v, r) => (-r, v) }.take(5).map(_._1).toSet
      if (got.map(_._2).toSet != relTop) diverged = true
    }
    assert(diverged, "MMR never penalized redundancy on this fixture")
  }

  test("q164_kendall_w: exact pieces recompute; chi2_F = b(k-1)W identity; W in [0,1]") {
    val f = operators.Analytics.q152Friedman(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val rows = operators.Analytics.q164KendallW(spark, sf0001).collect()
    assert(rows.length == 5)
    val b = f.map(_._2).max
    val k = 5L
    val devs = f.map { case (_, nb, sumR2) => sumR2 - 6L * nb }
    assert(devs.sum == 0L, "rank-sum deviations must cancel")
    val s4 = devs.map(d => d * d).sum
    val wDen = b * b * k * (k * k - 1)
    rows.foreach { r =>
      val prio = r.getString(0)
      val dev = f.find(_._1 == prio).map { case (_, nb, sr) => sr - 6L * nb }.get
      assert(r.getLong(4) == dev, s"$prio dev")
      assert(r.getLong(5) == s4 && r.getLong(6) == 3L * s4 && r.getLong(7) == wDen)
      assert(r.getLong(8) == 3L * s4 * 1000000L / wDen, s"$prio w_micro")
      assert(r.getLong(6) <= r.getLong(7), "W <= 1")
    }
    // chi2_F = b(k-1) * W — the Friedman statistic via the effect size
    val chi2ViaW = (3.0 * s4 / wDen) * b * (k - 1)
    val chi2Direct = 3.0 * s4 / (b * k * (k + 1))
    assert(math.abs(chi2ViaW - chi2Direct) < 1e-9, "chi2_F = b(k-1)W identity")
  }

  test("q166_page_hinkley: accumulator, running min, and peak recompute serially") {
    val daily = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(expr("cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint)").as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val rows = operators.Analytics.q166PageHinkley(spark, sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val prio = r.getString(0)
      val series = daily.filter(_._1 == prio).sortBy(_._2.toEpochDay)
      var cum = 0L; var m = 0L; var runmin = Long.MaxValue
      var phPeak = Long.MinValue; var peakDay: java.time.LocalDate = null
      series.zipWithIndex.foreach { case ((_, day, cents), i) =>
        cum += cents
        m += cents - cum / (i + 1)
        runmin = math.min(runmin, m)
        val ph = m - runmin
        if (ph > phPeak) { phPeak = ph; peakDay = day }
      }
      assert(r.getLong(1) == series.length.toLong, s"$prio n_days")
      assert(r.getLong(2) == m, s"$prio m_end")
      assert(r.getLong(3) == runmin, s"$prio m_min")
      assert(r.getLong(4) == phPeak, s"$prio ph_peak")
      assert(r.getDate(5).toLocalDate == peakDay, s"$prio peak_day")
      assert(phPeak >= 0L, "PH is a max-minus-min, never negative")
    }
  }

  test("q165_mood_median: doubled grand median and contingency recompute") {
    val daily = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(expr("cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val sorted = daily.map(_._2).sorted
    val n = sorted.length
    val m2 = sorted((n + 1) / 2 - 1) + sorted(n / 2)
    val rows = operators.Analytics.q165MoodMedian(spark, sf0001).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).sum == n.toLong, "all priority-days counted")
    rows.foreach { r =>
      val prio = r.getString(0)
      val vals = daily.filter(_._1 == prio).map(_._2)
      assert(r.getLong(5) == m2, "shared doubled median")
      assert(r.getLong(1) == vals.length.toLong)
      assert(r.getLong(2) == vals.count(_ * 2 > m2).toLong, s"$prio above")
      assert(r.getLong(3) == vals.count(_ * 2 < m2).toLong, s"$prio below")
      assert(r.getLong(4) == vals.count(_ * 2 == m2).toLong, s"$prio at")
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(1))
    }
    // the grand median splits the pooled sample roughly in half
    val above = rows.map(_.getLong(2)).sum
    val below = rows.map(_.getLong(3)).sum
    assert(math.abs(above - below) <= n / 2, "median is central")
  }

  test("pipe_t_closeness: variational distance recomputes; bounds hold") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), expr("n_chars div 100").as("lb"), col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val nTotal = docs.length.toLong
    val glob = docs.groupBy(_._3).map { case (l, d) => l -> d.length.toLong }
    val rows = operators.CorpusPipeline.pipeTCloseness(spark, sf0001).collect()
    val classes = docs.groupBy(d => (d._1, d._2))
    assert(rows.length == classes.size, "one row per quasi-id class")
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val members = classes(key)
      val nClass = members.length.toLong
      assert(r.getLong(2) == nClass)
      val cl = members.groupBy(_._3).map { case (l, d) => l -> d.length.toLong }
      val sumAbs = glob.map { case (l, g) =>
        math.abs(cl.getOrElse(l, 0L) * nTotal - g * nClass)
      }.sum
      val tMicro = sumAbs * 1000000L / (2L * nClass * nTotal)
      assert(r.getLong(3) == tMicro, s"class $key t_micro")
      assert(tMicro >= 0L && tMicro <= 1000000L, "TV distance is in [0,1]")
      assert(r.getBoolean(4) == (tMicro > 300000L))
    }
    // a singleton class is maximally skewed: t = (N - g_lang) / N
    val singles = rows.filter(_.getLong(2) == 1L)
    assert(singles.nonEmpty, "fixture must contain singleton classes")
    singles.foreach { r =>
      val lang = classes((r.getString(0), r.getLong(1))).head._3
      assert(r.getLong(3) == (nTotal - glob(lang)) * 1000000L / nTotal)
    }
  }

  test("mm_scene_cut: cut rollup recomputes from the byte frames") {
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = operators.Multimodal.mmSceneCut(spark, sf0001).collect()
    assert(rows.length == texts.size, "every payload with a full frame appears")
    var withCut = 0
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      // char-based frames, matching the operator's substring/ascii walk
      val energies = t.toCharArray.grouped(8).filter(_.length == 8)
        .map(_.map(_.toLong).sum).toArray
      val deltas = energies.zip(energies.drop(1)).map { case (a, b) => b - a }
      assert(r.getLong(1) == energies.length.toLong, "full-frame count")
      assert(r.getLong(2) == deltas.count(d => math.abs(d) >= 150L).toLong)
      if (deltas.nonEmpty)
        assert(r.getLong(3) == deltas.map(math.abs).max)
      val firstCut = deltas.indexWhere(d => math.abs(d) >= 150L)
      if (firstCut < 0) assert(r.isNullAt(4))
      else { assert(r.getLong(4) == firstCut + 1L); withCut += 1 }
    }
    assert(withCut > 0 && withCut < rows.length, "both cut classes live")
  }

  test("q167_ansari_bradley: doubled AB scores recompute; group sums partition the pool") {
    val daily = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(expr("cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val n = daily.length.toLong
    val byVal = daily.groupBy(_._2).toSeq.sortBy(_._1)
    var cLt = 0L
    val ab2ByVal = byVal.map { case (v, hits) =>
      val nv = hits.length.toLong
      val r2 = 2L * cLt + nv + 1L
      cLt += nv
      v -> math.min(r2, 2L * (n + 1L) - r2)
    }.toMap
    val expSum = daily.groupBy(_._1).map { case (g, hits) =>
      g -> ((hits.length.toLong, hits.map(h => ab2ByVal(h._2)).sum))
    }
    val rows = operators.Analytics.q167AnsariBradley(spark, sf0001).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (nG, sum) = expSum(r.getString(0))
      assert(r.getLong(1) == nG && r.getLong(2) == sum, s"${r.getString(0)}")
      assert(r.getLong(3) == n)
    }
    // the two group sums partition the pooled AB mass exactly
    assert(rows.map(_.getLong(2)).sum == rows.head.getLong(4),
      "sum over groups = pooled ab2")
    val pooledSq = byVal.map { case (v, hits) =>
      hits.length.toLong * ab2ByVal(v) * ab2ByVal(v) }.sum
    assert(rows.head.getLong(5) == pooledSq, "pooled ab2^2 (tie-corrected variance piece)")
  }

  test("q168_lpa_step: two-step label propagation recomputes from the raw edges") {
    val baskets = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val pairs = baskets.flatMap(ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    def step(lab: Map[Long, Long]): Map[Long, (Long, Long)] =
      adj.map { case (v, ns) =>
        val votes = ns.groupBy(lab).map { case (l, hits) => (l, hits.size.toLong) }
        val (l, c) = votes.minBy { case (l, c) => (-c, l) }
        v -> ((l, c))
      }
    val s1 = step(adj.keys.map(v => v -> v).toMap)
    val s2 = step(s1.map { case (v, (l, _)) => v -> l })
    val rows = operators.Analytics.q168LpaStep(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == s2, "two-step LPA labels + votes must match the driver recompute")
    assert(rows.values.map(_._1).toSet.size < rows.size,
      "propagation must actually merge nodes into communities")
  }

  test("mm_silence_trim: bounds recompute; the all-silent class fires on synthetic input") {
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = operators.Multimodal.mmSilenceTrim(spark, sf0001).collect()
    var trimmed = 0
    rows.foreach { r =>
      val es = texts(r.getLong(0)).toCharArray.grouped(8)
        .filter(_.length == 8).map(_.map(_.toLong).sum).toArray
      val loud = es.zipWithIndex.filter(_._1 >= 700L).map(_._2.toLong)
      assert(r.getLong(1) == es.length.toLong)
      if (loud.isEmpty) assert(r.getBoolean(7) && r.getLong(4) == 0L)
      else {
        assert(r.getLong(2) == loud.min && r.getLong(3) == loud.max)
        assert(r.getLong(4) == loud.max - loud.min + 1L)
        assert(r.getLong(5) == loud.min && r.getLong(6) == es.length - 1L - loud.max)
        if (loud.min > 0 || loud.max < es.length - 1) trimmed += 1
      }
    }
    assert(trimmed > 0, "fixture must contain payloads with silent edges")
    // the TRUE all_silent class (vacuity allowlist contract): a payload
    // of spaces (frame energy 8*32 = 256 < 700) must flag, not drop
    val dir = java.nio.file.Files.createTempDirectory("silent_docs")
    val spk = spark
    import spk.implicits._
    Seq((1L, " " * 64, "en", "src0", 64L),
      (2L, "Z" * 64, "en", "src0", 64L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.toString + "/documents.parquet")
    val syn = operators.Multimodal.mmSilenceTrim(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(syn(1L).getBoolean(7) && syn(1L).getLong(4) == 0L
      && syn(1L).getLong(5) == 8L && syn(1L).isNullAt(2),
      "all-silent payload: flagged, kept 0, full lead cut, NULL bounds")
    assert(!syn(2L).getBoolean(7) && syn(2L).getLong(4) == 8L,
      "loud payload unaffected")
  }

  test("dd_cdc_ingest: savings recompute; replica docs dedupe near-fully") {
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pows = Array.iterate(1L, 8)(_ * 31L)
    def chunksOf(t: String): Seq[String] = {
      val n = t.length
      val bnds = (8 to n - 1).filter { i =>
        (0 until 8).map(j => t.charAt(i - 1 - j).toLong * pows(j)).sum % 64 == 0
      }
      (0 +: bnds :+ n).sliding(2).map { case Seq(a, b) => t.substring(a, b) }.toSeq
    }
    val hist = texts.filter(_._1 < 400L).values.flatMap(chunksOf).toSet
    val rows = operators.Dedup.ddCdcIngest(spark, sf0001).collect()
    assert(rows.length == texts.count(_._1 >= 400L))
    var fullSave = 0
    rows.foreach { r =>
      val cs = chunksOf(texts(r.getLong(0)))
      val hits = cs.filter(hist.contains)
      assert(r.getLong(1) == cs.length.toLong, s"doc ${r.getLong(0)} n_chunks")
      assert(r.getLong(2) == hits.length.toLong, s"doc ${r.getLong(0)} n_hit")
      assert(r.getLong(3) == cs.map(_.length.toLong).sum)
      assert(r.getLong(4) == hits.map(_.length.toLong).sum)
      assert(r.getLong(5) == r.getLong(4) * 1000000L / r.getLong(3))
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(4) <= r.getLong(3))
      if (r.getLong(5) >= 900000L) fullSave += 1
    }
    assert(fullSave > 0, "near-replica docs must dedupe (near-)fully against history")
  }

  test("q169_runs_up_down: runs and null pieces recompute serially") {
    val daily = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(expr("cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint)").as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val rows = operators.Analytics.q169RunsUpDown(spark, sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val series = daily.filter(_._1 == r.getString(0)).sortBy(_._2.toEpochDay).map(_._3)
      val deltas = series.zip(series.tail).map { case (a, b) => b - a }
      val signs = deltas.map(d => if (d > 0) 1 else if (d < 0) -1 else 0)
      val nz = signs.filter(_ != 0)
      val changes = nz.zip(nz.tail).count { case (a, b) => a != b }
      assert(r.getLong(1) == nz.length.toLong, "m")
      assert(r.getLong(2) == signs.count(_ == 0).toLong, "n_zero")
      assert(r.getLong(3) == changes + 1L, "n_runs")
      assert(r.getLong(4) == 2L * (nz.length + 1L) - 1L, "3*E[R]")
      assert(r.getLong(5) == 16L * (nz.length + 1L) - 29L, "90*Var[R]")
      assert(r.getLong(3) >= 1L && r.getLong(3) <= r.getLong(1))
    }
  }

  test("q170_mantel_haenszel: 2x2 cells and MH terms recompute per stratum") {
    val rows2 = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(expr("cast(year(o_orderdate) as long)"), col("o_orderpriority"),
        col("o_orderstatus")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val out = operators.Analytics.q170MantelHaenszel(spark, sf0001).collect()
    assert(out.length == rows2.map(_._1).distinct.length, "one row per year")
    out.foreach { r =>
      val yr = r.getLong(0)
      val s = rows2.filter(_._1 == yr)
      val a = s.count(x => x._2 == "1-URGENT" && x._3 == "F").toLong
      val b = s.count(x => x._2 == "1-URGENT" && x._3 != "F").toLong
      val c = s.count(x => x._2 == "5-LOW" && x._3 == "F").toLong
      val d = s.count(x => x._2 == "5-LOW" && x._3 != "F").toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((a, b, c, d)))
      assert(r.getLong(5) == a + b + c + d)
      assert(r.getLong(6) == a * d * 1000000L / (a + b + c + d))
      assert(r.getLong(7) == b * c * 1000000L / (a + b + c + d))
    }
    // both MH sums live: the OR is a real ratio on this fixture
    assert(out.map(_.getLong(6)).sum > 0L && out.map(_.getLong(7)).sum > 0L)
  }

  test("pipe_class_weights: inverse-frequency weights recompute; mass averages to 1") {
    val docs = Tables.documents(spark, sf0001).select(col("lang")).collect()
      .map(_.getString(0))
    val n = docs.length.toLong
    val g = docs.groupBy(identity).map { case (l, hits) => l -> hits.length.toLong }
    val k = g.size.toLong
    val rows = operators.CorpusPipeline.pipeClassWeights(spark, sf0001).collect()
    assert(rows.length == k.toInt)
    var mass = 0L
    rows.foreach { r =>
      val nG = g(r.getString(0))
      assert(r.getLong(1) == nG && r.getLong(2) == n)
      assert(r.getLong(3) == nG * 1000000L / n)
      assert(r.getLong(4) == n * 1000000L / (k * nG))
      mass += nG * r.getLong(4)
    }
    // Σ n_g · w_g = N (weights average to 1), up to the k floor losses
    assert(mass <= n * 1000000L && mass > n * 1000000L - k * 1000000L,
      s"balanced-weight mass off: $mass vs ${n * 1000000L}")
  }

  test("txt_rake: keyphrases recompute from a driver-side RAKE pass") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).toSeq))
    // corpus-derived stoplist: top-10 DF terms per lang
    val stop = docs.flatMap { case (id, lang, ts) => ts.distinct.map(t => (lang, t, id)) }
      .groupBy(d => (d._1, d._2)).map { case ((l, t), hits) => (l, t, hits.size) }
      .groupBy(_._1).flatMap { case (_, terms) =>
        terms.toSeq.sortBy { case (_, t, df) => (-df, t) }.take(10)
      }.map(d => (d._1, d._2)).toSet
    // stopword-free runs per doc
    val runRows = docs.flatMap { case (id, lang, ts) =>
      val flags = ts.map(t => stop((lang, t)))
      val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      ts.zip(flags).foreach { case (t, isStop) =>
        if (isStop) { if (cur.nonEmpty) { runs += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty } }
        else cur += t
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs.map(r => (id, lang, r))
    }
    val wstat = runRows.flatMap { case (_, lang, r) => r.map(t => (lang, t, r.length.toLong)) }
      .groupBy(d => (d._1, d._2)).map { case ((l, t), hits) =>
        (l, t) -> (hits.map(_._3).sum * 1000000L / hits.size)
      }
    val byPhrase = runRows
      .map { case (_, lang, r) =>
        (lang, r.mkString(" "), r.length.toLong, r.map(t => wstat((lang, t))).sum)
      }
      .groupBy(d => (d._1, d._2)).map { case ((l, p), hits) =>
        (l, p, hits.head._3, hits.size.toLong, hits.head._4)
      }
    val expected = byPhrase.groupBy(_._1).flatMap { case (_, phrases) =>
      phrases.toSeq.sortBy { case (_, p, _, _, s) => (-s, p) }.take(10)
        .zipWithIndex.map { case ((l, p, nw, no, s), i) => (l, i + 1L, p, nw, no, s) }
    }.toSet
    val rows = operators.TextAnalysis.txtRake(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(rows.nonEmpty && rows == expected,
      "RAKE top phrases must match the driver recompute")
    // invariants: no stopword survives into a phrase; deg >= freq
    rows.foreach { case (lang, _, phrase, nWords, _, score) =>
      phrase.split(" ").foreach(t => assert(!stop((lang, t)),
        s"stopword '$t' leaked into phrase '$phrase'"))
      assert(score >= nWords * 1000000L,
        "each word scores >= 1.0 (degree >= frequency)")
    }
  }

  test("dd_cdc_chunks: chunk table recomputes from a driver-side rolling chunker") {
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val pows = Array.iterate(1L, 8)(_ * 31L)
    def chunksOf(t: String): Seq[String] = {
      val n = t.length
      val bnds = (8 to n - 1).filter { i =>
        val h = (0 until 8).map(j => t.charAt(i - 1 - j).toLong * pows(j)).sum
        h % 64 == 0
      }
      val allb = 0 +: bnds :+ n
      allb.sliding(2).map { case Seq(a, b) => t.substring(a, b) }.toSeq
    }
    // driver-side duplicate-chunk table
    val all = texts.flatMap { case (id, t) => chunksOf(t).map(c => (id, c)) }
    // invariant: chunks reassemble the document exactly
    texts.foreach { case (_, t) => assert(chunksOf(t).mkString == t) }
    val expected = all.groupBy(_._2).filter(_._2.length >= 2).map {
      case (c, hits) =>
        (c.length.toLong, hits.length.toLong,
          hits.map(_._1).distinct.length.toLong, hits.map(_._1).min)
    }.toSeq.sorted
    val rows = operators.Dedup.ddCdcChunks(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted
    assert(rows.nonEmpty, "fixture must contain shared chunks")
    assert(rows == expected, "duplicate-chunk table must match the driver chunker")
    // CDC's point: boundaries are content-local — a prefix insertion
    // leaves every chunk after the edit window intact
    val (_, sample) = texts.maxBy(_._2.length)
    val shifted = "x" + sample
    val tailShared = chunksOf(sample).toSet.intersect(chunksOf(shifted).toSet)
    assert(tailShared.nonEmpty,
      "a 1-char prefix insertion must not shift every chunk boundary")
  }

  test("dd_edit_gate: verdicts recompute from incremental candidates + DP distances") {
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Long = {
      val prev = Array.tabulate(b.length + 1)(_.toLong)
      val cur = new Array[Long](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i.toLong
        for (j <- 1 to b.length) {
          val s = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0L else 1L)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), s)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val cand = operators.Dedup.ddIncremental(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (n, ps) => n -> ps.map(_._2).distinct }
    val rows = operators.Dedup.ddEditGate(spark, sf0001).collect()
    assert(rows.length == 100, "one verdict per new doc (400..499)")
    var nDup = 0; var nNoCand = 0
    rows.foreach { r =>
      val id = r.getLong(0)
      val cs = cand.getOrElse(id, Array.empty[Long])
      assert(r.getLong(2) == cs.length.toLong, s"doc $id candidate count")
      if (cs.isEmpty) {
        assert(r.isNullAt(3) && !r.getBoolean(4),
          s"doc $id: no candidates must mean NULL best / not-dup")
        nNoCand += 1
      } else {
        val best = cs.map { o =>
          val (tn, to) = (texts(id), texts(o))
          lev(tn, to) * 1000000L / math.max(tn.length, to.length)
        }.min
        assert(r.getLong(3) == best, s"doc $id best_micro")
        assert(r.getBoolean(4) == (best <= 400000L), s"doc $id verdict")
        if (best <= 400000L) nDup += 1
      }
    }
    assert(nDup > 0, "fixture must contain at least one dup verdict")
    assert(nNoCand > 0, "fixture must contain candidate-less docs")
  }
}
