package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: the edit-distance verify tier, the leakage-free
  * cluster split, and contrastive hard-negative mining. */
class Round9OpsSpec extends SparkSpec {

  test("dd_edit_distance: every pair's distance recomputes via driver-side DP") {
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Long = {
      val prev = Array.tabulate(b.length + 1)(_.toLong)
      val cur = new Array[Long](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i.toLong
        for (j <- 1 to b.length) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0L else 1L)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val rows = operators.Dedup.ddEditDistance(spark, sf0001).collect()
    assert(rows.nonEmpty, "fixture must contain near-dup candidate pairs")
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ta, tb) = (texts(a), texts(b))
      val d = lev(ta, tb)
      assert(r.getLong(2) == ta.length.toLong && r.getLong(3) == tb.length.toLong)
      assert(r.getLong(4) == d, s"pair ($a,$b): engine dist ${r.getLong(4)} != DP $d")
      assert(d >= math.abs(ta.length - tb.length),
        "levenshtein lower bound |len_a - len_b| must hold")
      assert(r.getLong(5) == d * 1000000L / math.max(ta.length, tb.length))
    }
  }

  test("pipe_cluster_split: clusters never span splits; singletons match pipe_split") {
    val rows = operators.CorpusPipeline.pipeClusterSplit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(rows.length == 500 && rows.map(_._1).distinct.length == 500,
      "every doc exactly once")
    // the leakage property: one cluster, one split
    rows.groupBy(_._2).values.foreach { members =>
      assert(members.map(_._3).toSet.size == 1,
        s"cluster ${members.head._2} spans splits ${members.map(_._3).toSet}")
    }
    // singleton docs (no near-dup pair) hash the same base as pipe_split
    val inComponent = operators.Dedup.ddComponents(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    val parent = operators.CorpusPipeline.pipeSplit(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val singles = rows.filter(r => !inComponent(r._1))
    assert(singles.nonEmpty, "fixture must contain docs outside any near-dup family")
    singles.foreach { case (id, cluster, split) =>
      assert(cluster == id, "a singleton is its own cluster")
      assert(split == parent(id), "a singleton's split is bit-identical to pipe_split")
    }
    // split proportions stay sane (md5 bucket: ~90/5/5)
    val bySplit = rows.groupBy(_._3).view.mapValues(_.size).toMap
    assert(bySplit.getOrElse("train", 0) > bySplit.getOrElse("val", 0) &&
      bySplit.getOrElse("train", 0) > bySplit.getOrElse("test", 0))
  }

  test("sim_hard_negatives: cross-label only, ranks recompute, never beats unrestricted top-1") {
    val vecs = Tables.embeddings(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = operators.Similarity.simHardNegatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val labelOf = vecs.map(v => v._1 -> v._3.toLong).toMap
    got.foreach { case (q, _, v, negLabel) =>
      assert(labelOf(v) == negLabel && negLabel != labelOf(q),
        "a hard negative must carry a different label than its query")
    }
    // exact driver recompute of the per-query cross-label ranking
    vecs.filter(_._1 < 5).foreach { case (qid, qe, qlabel) =>
      val expected = vecs.filter(_._3 != qlabel)
        .map(v => (v._1, cos(qe, v._2)))
        .sortBy { case (id, c) => (-c, id) }
        .take(5).map(_._1).toSeq
      val mine = got.filter(_._1 == qid).sortBy(_._2).map(_._3).toSeq
      assert(mine == expected, s"query $qid hard-negative ranking mismatch")
    }
    // sanity: restricting to cross-label can only lower the best score
    val best = operators.Similarity.simTopkBruteforce(spark, sf0001).collect()
      .filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    operators.Similarity.simHardNegatives(spark, sf0001).collect()
      .filter(_.getLong(1) == 1L)
      .foreach { r => assert(r.getDouble(4) <= best(r.getLong(0)) + 1e-9) }
  }

  test("sim_hard_negatives_ivf: cross-label, candidates within probed cells, recall measured") {
    val exact = operators.Similarity.simHardNegatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = operators.Similarity.simHardNegativesIvf(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val labelOf = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    ivf.foreach { case (q, v, negLabel) =>
      assert(labelOf(v) == negLabel && negLabel != labelOf(q),
        "IVF hard negatives must stay cross-label")
    }
    // probing ≤2 of 9 foreign cells: recall vs exact is measured, must
    // be non-trivial (the fixture's clusters align with labels)
    val hits = ivf.map { case (q, v, _) => if (exact(q)(v)) 1 else 0 }.sum
    val recall = hits.toDouble / ivf.length
    assert(recall >= 0.2, s"IVF hard-negative recall collapsed: $recall")
    assert(ivf.groupBy(_._1).values.forall(_.length == 5), "5 rows per query")
  }

  test("pipe_source_drift: PSI recomputes from counts; identical sources drift to ~zero") {
    import org.apache.spark.sql.graft.Log2Fixed
    val rows = operators.TextAnalysis.pipeSourceDrift(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // driver recompute: rebuild the bucket grid and the fixed-point sum
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), size(graft.functions.TextOps.tokens("text")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1))).filter(_._2 > 0)
      .map { case (s, n) => (s, (((n - 1) / 32) + 1).toLong * 32) }
    val buckets = docs.map(_._2).distinct.sorted
    val nTot = docs.length.toLong
    val b = buckets.length.toLong
    val refC = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      val nS = r.getLong(1)
      assert(r.getLong(2) == nTot && r.getLong(3) == b)
      val cC = docs.filter(_._1 == src).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      assert(cC.values.sum == nS)
      val num = buckets.map { bk =>
        val c = cC.getOrElse(bk, 0L); val rf = refC(bk)
        val diff = BigInt(c + 1) * (nTot + b) - BigInt(rf + 1) * (nS + b)
        val lgd = Log2Fixed.shifted(c + 1) + Log2Fixed.shifted(nTot + b) -
          Log2Fixed.shifted(rf + 1) - Log2Fixed.shifted(nS + b)
        diff * lgd
      }.sum
      assert(BigInt(r.getString(4)) == num, s"psi_num mismatch for $src")
      val den = BigInt(nS + b) * (nTot + b) * 1048576
      val micro = (num.abs * 1000000 / den).toLong * (if (num < 0) -1 else 1)
      assert(r.getLong(5) == micro)
    }
    // red-path twin: a source distributed like the corpus has PSI ≈ 0
    // (self-drift of the pooled reference against itself is 0 exactly
    // when p == q; per-source it's small) — assert the MAGNITUDE scale
    assert(rows.forall(_.getLong(5) >= 0),
      "PSI is a sum of non-negative terms; micro must not go negative beyond lg rounding")
  }

  test("pipe_split_leakage: cluster hash eliminates the crossings the doc hash has") {
    val rows = operators.CorpusPipeline.pipeSplitLeakage(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (nPairsC, crossC) = rows("cluster_hash")
    val (nPairsD, crossD) = rows("doc_hash")
    assert(nPairsC == nPairsD && nPairsC > 0, "both strategies audit the same pair set")
    assert(crossC == 0L, "cluster-keyed split must never split a near-dup family")
    assert(crossD > 0L,
      "fixture must exhibit the leakage the doc-keyed split cannot avoid" +
        " (if this ever fails, the corpus no longer has cross-bucket families)")
  }

  test("q161_jonckheere: doubled pairwise U counts recompute; MW cross-check") {
    val rows = operators.Analytics.q161Jonckheere(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), BigInt(r.getString(4))))).toMap
    assert(rows.size == 10, "C(5,2) ordered group pairs")
    val orders = Tables.orders(spark, sf0001)
      .select(expr("substring(o_orderpriority, 1, 1)").as("g"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { case ((lo, hi), (nLo, nHi, u2)) =>
      val xs = orders.filter(_._1 == lo).map(_._2)
      val ys = orders.filter(_._1 == hi).map(_._2)
      assert(nLo == xs.length.toLong && nHi == ys.length.toLong)
      // brute-force doubled U: 2*#(x<y) + #(x==y)
      var acc = BigInt(0)
      xs.foreach { x => ys.foreach { y =>
        if (x < y) acc += 2 else if (x == y) acc += 1 } }
      assert(u2 == acc, s"pair ($lo,$hi) doubled U")
      // identity: U(lo,hi) + U(hi,lo) = n_lo*n_hi => doubled form sums to 2*n*n
      var rev = BigInt(0)
      ys.foreach { y => xs.foreach { x =>
        if (y < x) rev += 2 else if (y == x) rev += 1 } }
      assert(u2 + rev == BigInt(2) * nLo * nHi)
    }
  }

  test("sim_pq_rerank: re-ranked top-5 is candidate-bounded and exact-ordered") {
    val cand = operators.Similarity.simPqAdc(spark, sf0001, k = 20).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val got = operators.Similarity.simPqRerank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.groupBy(_._1).values.forall(_.length == 5), "5 rows per query")
    got.foreach { case (q, _, v, _) =>
      assert(cand(q)(v), "every re-ranked hit must come from the ADC candidate set")
    }
    // exact distances recompute via the same ordered fold driver-side
    val vecs = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    got.foreach { case (q, _, v, dist) =>
      assert(dist == l2(vecs(q), vecs(v)), s"exact L2 for ($q,$v) must fold bit-identically")
    }
    // within each query the ranking is by exact distance, not ADC order
    got.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.sameElements(byRank.sorted), "re-rank must order by exact distance")
    }
  }

  test("q163_page_trend: L recomputes from the Friedman rank sums; null mean is exact") {
    val f = operators.Analytics.q152Friedman(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = operators.Analytics.q163PageTrend(spark, sf0001).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == f.map(_._2).max)
    assert(f.map(_._2).distinct.length == 1, "complete blocks: equal counts per treatment")
    val l2 = f.map { case (j, _, r2) => BigInt(j) * r2 }.sum
    assert(BigInt(r.getString(2)) == l2)
    val b = r.getLong(1)
    assert(r.getLong(3) == b * 6 * 15, "null mean b*(k+1)*k(k+1)/2 for k=5")
    // the doubled rank sums themselves total b*k*(k+1) per the midrank
    // identity, so L2 is bounded by j-weighted extremes
    val tot = f.map(_._3).sum
    assert(BigInt(tot) == BigInt(b) * 5 * 6, "midrank totals close")
  }

  test("q162_cochran_armitage: trend terms recompute; centering identity holds") {
    val rows = operators.Analytics.q162CochranArmitage(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), BigInt(r.getString(6))))
    assert(rows.length == 5)
    val orders = Tables.orders(spark, sf0001)
      .select(expr("substring(o_orderpriority, 1, 1)").as("g"),
        (col("o_orderstatus") === "F").as("hit"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val n = orders.length.toLong
    val n1 = orders.count(_._2).toLong
    rows.foreach { case (_, w, nG, n1G, nTot, n1Tot, tTerm) =>
      val mine = orders.filter(_._1 == w.toString)
      assert(nG == mine.length.toLong && n1G == mine.count(_._2).toLong)
      assert(nTot == n && n1Tot == n1)
      assert(tTerm == BigInt(w) * (BigInt(n1G) * n - BigInt(nG) * n1))
    }
    // centering: with w replaced by a CONSTANT the sum is 0, so
    // Σ t_term = Σ (w - c)·(...) for any c — check via w and w-3
    val t = rows.map(_._7).sum
    val tShift = rows.map { case (_, w, nG, n1G, _, _, _) =>
      BigInt(w - 3) * (BigInt(n1G) * n - BigInt(nG) * n1) }.sum
    assert(t == tShift, "trend statistic must be invariant to score shift")
  }

  test("mm_frame_energy: per-frame byte sums recompute; frames tile the payload exactly") {
    val texts = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = operators.Multimodal.mmFrameEnergy(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (id, frames) =>
      val t = texts(id)
      assert(frames.map(_._3).sum == t.length.toLong, s"doc $id frames must tile the payload")
      frames.foreach { case (_, idx, len, energy) =>
        val slice = t.slice((idx * 8).toInt, (idx * 8 + len).toInt)
        assert(slice.length.toLong == len)
        assert(energy == slice.map(_.toLong).sum, s"doc $id frame $idx energy")
      }
    }
    assert(rows.map(_._1).distinct.length == 500, "every doc profiled")
  }

  test("txt_yule_k: repeat-rate rational recomputes; consistency with simpson's S2") {
    val rows = operators.TextAnalysis.txtYuleK(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sf0001)
      .select(col("lang"), explode(graft.functions.TextOps.tokens("text")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    rows.foreach { r =>
      val lang = r.getString(0)
      val counts = toks.filter(_._1 == lang).groupBy(_._2).map(_._2.length.toLong)
      val n = counts.sum
      val s2 = counts.map(c => BigInt(c) * c).sum
      assert(r.getLong(1) == counts.size.toLong && r.getLong(2) == n)
      assert(BigInt(r.getString(3)) == s2 - n, s"$lang k_num")
      assert(r.getLong(4) == ((s2 - n) * 10000 * 1000000 / (BigInt(n) * n)).toLong)
      // Yule's K numerator is Simpson's numerator: S2 - N = sum c(c-1)
      assert(s2 - n == counts.map(c => BigInt(c) * (c - 1)).sum)
    }
  }

  test("q160_kruskal_wallis: doubled midrank sums recompute; totals close the loop") {
    val rows = operators.Analytics.q160KruskalWallis(spark, sf0001).collect()
    assert(rows.length == 5, "five priority groups")
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = orders.length.toLong
    val byVal = orders.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sortedVals = byVal.keys.toArray.sorted
    val cLt = scala.collection.mutable.Map.empty[Long, Long]
    var acc = 0L
    sortedVals.foreach { v => cLt(v) = acc; acc += byVal(v) }
    rows.foreach { r =>
      val grp = r.getString(0)
      val mine = orders.filter(_._1 == grp)
      assert(r.getLong(1) == mine.length.toLong)
      val rs2 = mine.map { case (_, v) => BigInt(2 * cLt(v) + byVal(v) + 1) }.sum
      assert(BigInt(r.getString(2)) == rs2, s"group $grp doubled rank sum")
      assert(r.getLong(3) == n)
      val tieSum = byVal.values.map(t => BigInt(t) * t * t - t).sum
      assert(BigInt(r.getString(4)) == tieSum)
    }
    // sum of doubled midranks over all groups = N(N+1)
    val total = rows.map(r => BigInt(r.getString(2))).sum
    assert(total == BigInt(n) * (n + 1), "sum of 2*R_g must equal N(N+1)")
  }
}
