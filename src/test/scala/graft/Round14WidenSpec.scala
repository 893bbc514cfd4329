package graft

import graft.operators.{Analytics, Dedup, Similarity}

/** Round-14 widen-batch specs: independent driver recomputes (plain
  * Scala, no Spark expressions) for the seven new operators —
  * Jarque–Bera inputs, per-node clustering coefficients, Cox–Stuart
  * trend counts, Welch's t, Davies–Bouldin, the OPH LSH banding and
  * the bucket-local leave-one-out k-NN accuracy. Each recompute
  * rebuilds the statistic from the raw parquet rows with the SAME
  * IEEE expression trees / exact-integer quotients the operator
  * publishes, so a drift in any stage lands as a localized assertion
  * here rather than an opaque value-gate mismatch. */
class Round14WidenSpec extends SparkSpec {

  private def r6(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ------------------------------------------------- q191_jarque_bera

  test("q191_jarque_bera: moments expand from exact power sums, same IEEE tree") {
    val rows = Tables.orders(spark, sf0001)
      .selectExpr("o_orderpriority",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (p, xs) =>
      val n = xs.size.toLong
      if (n < 2) None else {
        val c = xs.map(x => BigInt(x._2))
        val s1 = c.sum
        val s2 = c.map(x => x * x).sum
        val s3 = c.map(x => x * x * x).sum
        val s4 = c.map(x => x * x * x * x).sum
        val nd = n.toDouble
        val m1 = s1.toDouble / nd
        val m2 = s2.toDouble / nd - m1 * m1
        val m3 = s3.toDouble / nd - 3 * m1 * (s2.toDouble / nd) + 2 * m1 * m1 * m1
        val m4 = s4.toDouble / nd - 4 * m1 * (s3.toDouble / nd) +
          6 * m1 * m1 * (s2.toDouble / nd) - 3 * m1 * m1 * m1 * m1
        val skew = m3 / math.sqrt(m2 * m2 * m2)
        val kurt = m4 / (m2 * m2)
        val jb = nd / 6 * (skew * skew + (kurt - 3) * (kurt - 3) / 4)
        Some((p, n, s1.toString, s2.toString, s3.toString, s4.toString,
          r6(skew), r6(kurt), r6(jb)))
      }
    }
    val got = Analytics.q191JarqueBera(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8))).toSeq
    assert(got == expected)
  }

  // -------------------------------------------- q192_clustering_coeff

  test("q192_clustering_coeff: brute-force per-node triangles over the co-purchase edges") {
    val baskets = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted).filter(_.length > 1)
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for (parts <- baskets; i <- parts.indices; j <- i + 1 until parts.length)
      support((parts(i), parts(j))) = support.getOrElse((parts(i), parts(j)), 0) + 1
    val edges = support.filter(_._2 >= 2).keySet.toSet
    val adj = (edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)))
      .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).toSet }
    val deg = adj.map { case (n, vs) => n -> vs.size.toLong }
    val tri = scala.collection.mutable.Map.empty[Long, Long]
    for ((a, b) <- edges; c <- adj(a) & adj(b) if b < c)
      for (n <- Seq(a, b, c)) tri(n) = tri.getOrElse(n, 0L) + 1L
    val expected = deg.filter(_._2 >= 2).toSeq.map { case (n, d) =>
      val t = tri.getOrElse(n, 0L)
      (n, d, t, (BigInt(2) * t * 1000000 / (BigInt(d) * (d - 1))).toLong)
    }.sortBy { case (n, d, _, _) => (-d, n) }.take(20)
    val got = Analytics.q192ClusteringCoeff(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  // ----------------------------------------------------- q193_cox_stuart

  test("q193_cox_stuart: pairing rule (n+1) div 2, middle day dropped on odd n") {
    val daily = Tables.orders(spark, sf0001)
      .selectExpr("o_orderpriority", "cast(o_orderdate as date) as day",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getLong(2)))
      .groupBy(_._1).map { case (k, vs) => (k._1, k._2, vs.map(_._2).sum) }
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, ds) =>
      val xs = ds.toSeq.sortBy(_._2).map(_._3)
      val n = xs.length
      val c = (n + 1) / 2
      val pairs = (0 until n / 2).map(t => (xs(t), xs(t + c)))
      (p, n.toLong, pairs.size.toLong,
        pairs.count(pr => pr._2 > pr._1).toLong,
        pairs.count(pr => pr._2 < pr._1).toLong,
        pairs.count(pr => pr._2 == pr._1).toLong)
    }
    val got = Analytics.q193CoxStuart(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the pairing must actually pair: n_pairs == n_days div 2
    assert(got.forall(r => r._3 == r._2 / 2))
  }

  // ------------------------------------------------------- q194_welch_t

  test("q194_welch_t: Welch statistic and Satterthwaite df from exact sums") {
    val cust = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val nations = Tables.nation(spark, sf0001)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val rows = Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "year(o_orderdate) as y",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .filter(r => r.getInt(1) == 1995 || r.getInt(1) == 1996)
      .map(r => (nations(cust(r.getAs[Number](0).longValue)), r.getInt(1) == 1995, r.getLong(2)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (nat, xs) =>
      val a = xs.filter(_._2).map(x => BigInt(x._3))
      val b = xs.filterNot(_._2).map(x => BigInt(x._3))
      val (na, nb) = (a.size.toLong, b.size.toLong)
      if (na < 2 || nb < 2) None else {
        val (sa, sb) = (a.sum, b.sum)
        val (qa, qb) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
        val ssa = na * qa - sa * sa
        val ssb = nb * qb - sb * sb
        if (ssa <= 0 || ssb <= 0) None else {
          val sea = ssa.toDouble / (na.toDouble * na * (na - 1))
          val seb = ssb.toDouble / (nb.toDouble * nb * (nb - 1))
          val t = (sa.toDouble / na - sb.toDouble / nb) / math.sqrt(sea + seb)
          val df = (sea + seb) * (sea + seb) /
            (sea * sea / (na - 1) + seb * seb / (nb - 1))
          Some((nat, na, nb, ssa.toString, ssb.toString, r6(t), r6(df)))
        }
      }
    }
    val got = Analytics.q194WelchT(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected)
    // df must sit between min(n)-1 and n_a+n_b-2 (Welch bracket)
    assert(got.forall(r => r._7 >= (math.min(r._2, r._3) - 1) - 1e-6 &&
      r._7 <= (r._2 + r._3 - 2) + 1e-6))
  }

  // -------------------------------------------------- sim_davies_bouldin

  /** Centroid means replicated with the engine's own cast chain:
    * float → decimal(18,9) (HALF_UP over the double-widened value) →
    * exact sum → double ÷ n. */
  private def centroids(vecs: Array[(Long, Int, Array[Float])]): Map[Int, Array[Double]] =
    vecs.groupBy(_._2).map { case (label, members) =>
      val dims = members.head._3.length
      label -> Array.tabulate(dims) { d =>
        val s = members.map(m => BigDecimal(java.math.BigDecimal.valueOf(m._3(d).toDouble))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
        s.toDouble / members.length
      }
    }

  test("sim_davies_bouldin: full driver rebuild (assign, scatter, separation, worst ratio)") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val cent = centroids(vecs)
    // assignment: raw double distance fold, (dist, clabel) tie order
    val assigned = vecs.map { case (id, _, e) =>
      val best = cent.toSeq.map { case (cl, cv) =>
        var s = 0.0; var j = 0
        while (j < e.length) { val dfd = e(j).toDouble - cv(j); s += dfd * dfd; j += 1 }
        (s, cl)
      }.min
      (id, best._2, best._1)
    }
    val scat = assigned.groupBy(_._2).map { case (cl, ms) =>
      val ssumMicro = ms.map { m =>
        (BigDecimal(java.math.BigDecimal.valueOf(r6(math.sqrt(r6(m._3)))))
          .setScale(6) * 1000000).toBigInt
      }.sum
      cl -> (ms.length.toLong, ssumMicro / ms.length)
    }
    val dMicro = (for {
      (i, ci) <- cent.toSeq; (j, cj) <- cent.toSeq if i != j
      ss = ci.zip(cj).foldLeft(0.0)((acc, p) => acc + (p._1 - p._2) * (p._1 - p._2))
      dm = (BigDecimal(java.math.BigDecimal.valueOf(r6(math.sqrt(ss))))
        .setScale(6) * 1000000).toBigInt
      if dm > 0
    } yield ((i, j), dm)).toMap
    val expected = scat.toSeq.sortBy(_._1).map { case (i, (n, si)) =>
      val ratios = dMicro.collect { case ((a, j), dm) if a == i =>
        (si + scat(j)._2) * 1000000 / dm
      }
      (i, n, si.toLong, if (ratios.isEmpty) None else Some(ratios.max.toLong))
    }
    val got = Similarity.simDaviesBouldin(spark, sf0001).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == expected)
  }

  // ------------------------------------------------------- dd_oph_lsh

  test("dd_oph_lsh: banding recipe parity from the OPH signature table") {
    val sigs = Dedup.ddOphSigs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(3).split(',')))
    val buckets = scala.collection.mutable.Map.empty[(Int, String), List[Long]]
    for ((id, s) <- sigs; b <- 0 until 4) {
      val bh = md5hex(s(2 * b) + s(2 * b + 1) + ":" + b)
      buckets((b, bh)) = id :: buckets.getOrElse((b, bh), Nil)
    }
    val expected = buckets.values.flatMap { ids =>
      val so = ids.sorted
      for (i <- so.indices; j <- i + 1 until so.length) yield (so(i), so(j))
    }.toSet.toSeq.sorted
    val got = Dedup.ddOphLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("dd_oph_lsh: catches every very-near-dup pair (exact-Jaccard recall audit)") {
    val cand = Dedup.ddOphLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nearDups = Dedup.ddNgramJaccard(spark, sf0001).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.8)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(nearDups.nonEmpty, "fixture should contain near-dups")
    assert(nearDups.subsetOf(cand),
      s"OPH LSH missed near-dups: ${nearDups -- cand}")
  }

  // --------------------------------------------------- sim_knn_accuracy

  private def lshW(p: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967295.0 - 0.5
  }

  test("sim_knn_accuracy: driver-recomputed bucket top-k majority vote") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val planes = Array.tabulate(6)(p => Array.tabulate(64)(d => lshW(p, d + 1)))
    def bucket(e: Array[Float]): Long =
      (0 until 6).foldLeft(0L) { (acc, p) =>
        var s = 0.0; var j = 0
        while (j < e.length) { s += e(j).toDouble * planes(p)(j); j += 1 }
        acc + (if (s > 0) 1L << p else 0L)
      }
    def nrm(e: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < e.length) { s += e(j).toDouble * e(j).toDouble; j += 1 }
      math.sqrt(s)
    }
    val b = vecs.map { case (id, l, e) => (id, l, e, bucket(e), nrm(e)) }
    val byBucket = b.groupBy(_._4)
    val preds = b.flatMap { case (src, slabel, ea, bk, na) =>
      val nbrs = byBucket(bk).filter(_._1 != src).map { case (dst, dl, eb, _, nb) =>
        var dp = 0.0; var j = 0
        while (j < ea.length) { dp += ea(j).toDouble * eb(j).toDouble; j += 1 }
        (dp / (na * nb), dst, dl)
      }
      if (nbrs.isEmpty) None else {
        val top = nbrs.sortBy { case (c, dst, _) => (-c, dst) }.take(3)
        val vote = top.groupBy(_._3).toSeq
          .map { case (dl, vs) => (vs.size, dl) }
          .sortBy { case (v, dl) => (-v, dl) }.head._2
        Some((slabel, vote))
      }
    }
    val total = vecs.groupBy(_._2).map { case (l, vs) => l -> vs.length.toLong }
    val expected = preds.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, ps) =>
      val nEval = ps.length.toLong
      val nCorrect = ps.count(p => p._2 == p._1).toLong
      (l.toLong, total(l), nEval, nCorrect, nCorrect * 1000000 / nEval)
    }
    val got = Similarity.simKnnAccuracy(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // the eval must not be vacuous: some vector evaluated, not all correct
    assert(got.map(_._3).sum > 0)
  }
}
