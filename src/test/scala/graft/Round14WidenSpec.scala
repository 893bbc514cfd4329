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

  // ------------------------------------------------ oph_slots kernel

  test("oph_slots kernel: bit-identical to the interpreted HOF form over the corpus") {
    val F = org.apache.spark.sql.functions
    val rows = Tables.documents(spark, sf0001)
      .select(F.col("doc_id"), graft.functions.TextOps.shingleArray("text").as("sh"))
      .filter(F.size(F.col("sh")) > 0)
      .withColumn("k", org.apache.spark.sql.graft.TextExpressions.ophSlots(F.col("sh"), 8))
      .withColumn("h", F.expr(
        """transform(sequence(0, 7), i -> array_min(filter(transform(sh, s -> md5(s)),
          |hh -> (locate(substring(hh, 32, 1), '0123456789abcdef') - 1) % 8 = i)))""".stripMargin))
      .selectExpr("doc_id",
        "array_join(transform(k, x -> coalesce(x, '_')), ',') kj",
        "array_join(transform(h, x -> coalesce(x, '_')), ',') hj")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(1) == r.getString(2), s"doc ${r.getLong(0)}"))
    // the empty-bin (NULL slot) path must be exercised by the fixture
    assert(rows.exists(_.getString(1).contains("_")), "no doc exercised an empty bin")
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

  // =================================================== batch 2 (r14)

  private def dailyCents(): Seq[(String, String, Long)] =
    Tables.orders(spark, sf0001)
      .selectExpr("o_orderpriority", "cast(o_orderdate as date) as day",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case ((p, d), vs) => (p, d, vs.map(_._2).sum) }
      .sortBy(t => (t._1, t._2))

  /** ISO-Monday week start for a yyyy-mm-dd date string. */
  private def weekOf(day: String): String =
    java.time.LocalDate.parse(day)
      .`with`(java.time.temporal.TemporalAdjusters.previousOrSame(java.time.DayOfWeek.MONDAY))
      .toString

  // ------------------------------------------------ q195_block_maxima

  test("q195_block_maxima: Gumbel moment inputs off weekly maxima, literal constants") {
    val expected = dailyCents().groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (p, ds) =>
      val maxima = ds.groupBy(t => weekOf(t._2)).values.map(_.map(_._3).max).toSeq
      val n = maxima.size.toLong
      if (n < 2) None else {
        val s1 = maxima.map(BigInt(_)).sum
        val s2 = maxima.map(m => BigInt(m) * m).sum
        val ssb = n * s2 - s1 * s1
        if (ssb <= 0) None else {
          val beta = math.sqrt(ssb.toDouble / (n.toDouble * (n - 1))) *
            2.449489742783178 / 3.141592653589793
          Some((p, n, s1.toString, s2.toString, r6(beta),
            r6(s1.toDouble / n - 0.5772156649015329 * beta)))
        }
      }
    }
    val got = Analytics.q195BlockMaxima(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected)
  }

  // ------------------------------------------------------- q196_cvar

  test("q196_cvar: VaR rank and tail mean replay; tail is ~5% of days") {
    val expected = dailyCents().groupBy(_._1).toSeq.sortBy(_._1).map { case (p, ds) =>
      val sorted = ds.sortBy(t => (t._3, t._2)).map(_._3)
      val n = sorted.size
      val rStar = (n * 95 + 99) / 100
      val tail = sorted.drop(rStar - 1)
      (p, n.toLong, sorted(rStar - 1), tail.size.toLong,
        (tail.map(BigInt(_)).sum / tail.size).toLong)
    }
    val got = Analytics.q196Cvar(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // CVaR dominates VaR, and the tail is the ceil-5% carve
    assert(got.forall(r => r._5 >= r._3))
    assert(got.forall(r => r._4 == r._2 - (r._2 * 95 + 99) / 100 + 1))
  }

  // ----------------------------------------------- q197_partial_corr

  test("q197_partial_corr: three Pearson r's and the partial off exact sums") {
    val daily = Tables.orders(spark, sf0001)
      .selectExpr("o_orderpriority", "cast(o_orderdate as date) as day",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents", "o_custkey")
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), (r.getLong(2), r.getAs[Number](3).longValue)))
      .groupBy(_._1).toSeq
      .map { case ((p, d), vs) =>
        (p, d, vs.map(_._2._1).sum, vs.size.toLong, vs.map(_._2._2).distinct.size.toLong)
      }
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (p, ds) =>
      val n = ds.size.toLong
      if (n < 3) None else {
        val (xs, ys, zs) = (ds.map(d => BigInt(d._3)), ds.map(d => BigInt(d._4)), ds.map(d => BigInt(d._5)))
        def s(v: Seq[BigInt]) = v.sum
        def sq(v: Seq[BigInt]) = v.map(a => a * a).sum
        def cr(a: Seq[BigInt], b: Seq[BigInt]) = a.zip(b).map(t => t._1 * t._2).sum
        val (sx, sy, sz) = (s(xs), s(ys), s(zs))
        val dx = n * sq(xs) - sx * sx
        val dy = n * sq(ys) - sy * sy
        val dz = n * sq(zs) - sz * sz
        if (dx <= 0 || dy <= 0 || dz <= 0) None else {
          val rxy = (n * cr(xs, ys) - sx * sy).toDouble / math.sqrt(dx.toDouble * dy.toDouble)
          val rxz = (n * cr(xs, zs) - sx * sz).toDouble / math.sqrt(dx.toDouble * dz.toDouble)
          val ryz = (n * cr(ys, zs) - sy * sz).toDouble / math.sqrt(dy.toDouble * dz.toDouble)
          val den = (1 - rxz * rxz) * (1 - ryz * ryz)
          val part = if (den > 0) Some(r6((rxy - rxz * ryz) / math.sqrt(den))) else None
          Some((p, n, r6(rxy), r6(rxz), r6(ryz), part))
        }
      }
    }
    val got = Analytics.q197PartialCorr(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSeq
    assert(got == expected)
  }

  // --------------------------------------------- q198_cronbach_alpha

  test("q198_cronbach_alpha: complete-week listwise deletion and exact SS") {
    val weekly = dailyCents()
      .map(t => ((t._1, weekOf(t._2)), t._3))
      .groupBy(_._1).toSeq
      .map { case ((p, w), vs) => (p, w, BigInt(vs.map(_._2).sum)) }
    val k = weekly.map(_._1).distinct.size
    val complete = weekly.groupBy(_._2).filter(_._2.size == k)
    assert(complete.size >= 2, "fixture needs >= 2 complete weeks")
    val n = complete.size.toLong
    val ssItems = weekly.filter(t => complete.contains(t._2))
      .groupBy(_._1).values.map { vs =>
        val x = vs.map(_._3)
        n * x.map(a => a * a).sum - x.sum * x.sum
      }.sum
    val totals = complete.values.map(_.map(_._3).sum).toSeq
    val ssTotal = n * totals.map(a => a * a).sum - totals.sum * totals.sum
    val alpha = r6(k.toDouble / (k - 1) * (1 - ssItems.toDouble / ssTotal.toDouble))
    val got = Analytics.q198CronbachAlpha(spark, sf0001).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getDouble(4)) ==
      (k.toLong, n, ssItems.toString, ssTotal.toString, alpha))
  }

  // -------------------------------------------- q199_cooks_distance

  test("q199_cooks_distance: full influence replay (residual, leverage, top-3)") {
    val expected = dailyCents().groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (p, ds) =>
      val ys = ds.sortBy(_._2).map(_._3)
      val n = ys.size.toLong
      if (n <= 2) Nil else {
        val ts = (1L to n).toSeq
        val st = BigInt(ts.sum)
        val st2 = ts.map(t => BigInt(t) * t).sum
        val sy = ys.map(BigInt(_)).sum
        val sty = ts.zip(ys).map { case (t, y) => BigInt(t) * y }.sum
        val den = n * st2 - st * st
        val bnum = n * sty - st * sy
        if (den <= 0) Nil else {
          val rows = ts.zip(ys).zip(ds.sortBy(_._2)).map { case ((t, y), (_, day, _)) =>
            val eScaled = den * (n * y - sy) - bnum * (BigInt(n) * t - st)
            val eR = java.math.BigDecimal.valueOf(
              eScaled.toDouble / (n.toDouble * den.toDouble))
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue
            val h = 1.0 / n + ((BigInt(n) * t - st) * (BigInt(n) * t - st)).toDouble /
              (n.toDouble * den.toDouble)
            (day, y, eR, h)
          }
          val sumE2 = rows.map(r0 => BigInt(r0._3) * r0._3).sum
          if (sumE2 <= 0) Nil else {
            val s2 = sumE2.toDouble / (n - 2)
            rows.map { case (day, y, eR, h) =>
              val cook = (eR.toDouble * eR / (2 * s2)) * (h / ((1 - h) * (1 - h)))
              (p, day, y, r6(h), r6(cook), cook)
            }.sortBy(r0 => (-r0._6, r0._2)).take(3)
              .map(r0 => (r0._1, r0._2, r0._3, r0._4, r0._5))
              .sortBy(r0 => (r0._1, r0._2))
          }
        }
      }
    }
    val got = Analytics.q199CooksDistance(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    // leverage within (0, 1); cook nonnegative
    assert(got.forall(r => r._4 > 0 && r._4 < 1 && r._5 >= 0))
  }

  // ------------------------------------------------- q200_rich_club

  test("q200_rich_club: brute-force degree-ladder replay over the edge set") {
    val baskets = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted).filter(_.length > 1)
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for (parts <- baskets; i <- parts.indices; j <- i + 1 until parts.length)
      support((parts(i), parts(j))) = support.getOrElse((parts(i), parts(j)), 0) + 1
    val edges = support.filter(_._2 >= 2).keySet.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, vs) => n -> vs.size.toLong }
    val expected = Seq(1L, 2L, 4L, 8L, 16L, 32L).map { k =>
      val nNodes = deg.values.count(_ > k).toLong
      val nEdges = edges.count(e => math.min(deg(e._1), deg(e._2)) > k).toLong
      val phi = if (nNodes >= 2)
        Some((BigInt(2) * nEdges * 1000000 / (BigInt(nNodes) * (nNodes - 1))).toLong)
      else None
      (k, nNodes, nEdges, phi)
    }
    val got = Analytics.q200RichClub(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == expected)
    // monotone: raising the bar can only shrink the club
    assert(got.sliding(2).forall(w => w(1)._2 <= w(0)._2 && w(1)._3 <= w(0)._3))
  }

  // ---------------------------------------------------- txt_herdan

  /** Driver replica of Log2Fixed's recurrence (MathExpressions.scala). */
  private def lgRef14(x: Long): Long = {
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

  test("txt_herdan: C = lgV/lgN off the shared fixed-point recurrence") {
    val toks = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ts) =>
      val n = ts.size.toLong
      val v = ts.map(_._2).distinct.size.toLong
      val c = if (n >= 2)
        Some((BigInt(lgRef14(v)) * 1000000 / BigInt(lgRef14(n))).toLong)
      else None
      (lang, n, v, c)
    }
    val got = operators.TextAnalysis.txtHerdan(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == expected)
    // C in (0, 1] scaled: vocab <= tokens so lgV <= lgN
    assert(got.forall(_._4.forall(c => c >= 0 && c <= 1000000)))
  }

  // -------------------------------------------------- sim_xie_beni

  test("sim_xie_beni: inertia/min-separation replay off the Lloyd pieces") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val cent = centroids(vecs)
    val inertiaMicro = vecs.map { case (_, _, e) =>
      val best = cent.toSeq.map { case (cl, cv) =>
        var s = 0.0; var j = 0
        while (j < e.length) { val dfd = e(j).toDouble - cv(j); s += dfd * dfd; j += 1 }
        (s, cl)
      }.min._1
      (BigDecimal(java.math.BigDecimal.valueOf(r6(best))).setScale(6) * 1000000).toBigInt
    }.sum
    val minSep = (for {
      (i, ci) <- cent.toSeq; (j, cj) <- cent.toSeq if i != j
      ss = ci.zip(cj).foldLeft(0.0)((acc, p) => acc + (p._1 - p._2) * (p._1 - p._2))
    } yield (BigDecimal(java.math.BigDecimal.valueOf(r6(ss))).setScale(6) * 1000000).toBigInt).min
    val n = vecs.length.toLong
    val xb = if (minSep > 0) Some((inertiaMicro * 1000000 / (BigInt(n) * minSep)).toLong) else None
    val got = Similarity.simXieBeni(spark, sf0001).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3))) ==
      (n, inertiaMicro.toLong, minSep.toLong, xb))
  }

  // =================================================== batch 3 (r14)

  private def copurchaseRef(): (Set[(Long, Long)], Map[Long, Long]) = {
    val baskets = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted).filter(_.length > 1)
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for (parts <- baskets; i <- parts.indices; j <- i + 1 until parts.length)
      support((parts(i), parts(j))) = support.getOrElse((parts(i), parts(j)), 0) + 1
    val edges = support.filter(_._2 >= 2).keySet.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, vs) => n -> vs.size.toLong }
    (edges, deg)
  }

  // --------------------------------------------------- q201_adamic_adar

  test("q201_adamic_adar: wedge replay with the fixed-point log weight") {
    val (edges, deg) = copurchaseRef()
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).toSet }
    val cand = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((w, nbrs) <- adj; n1 <- nbrs; n2 <- nbrs if n1 < n2) {
      val term = 1048576000L / lgRef14(deg(w))
      val (c, aa) = cand.getOrElse((n1, n2), (0L, 0L))
      cand((n1, n2)) = (c + 1, aa + term)
    }
    val expected = cand.toSeq
      .filter { case ((n1, n2), _) => !edges.contains((n1, n2)) }
      .map { case ((n1, n2), (c, aa)) => (n1, n2, c, aa) }
      .sortBy { case (n1, n2, _, aa) => (-aa, n1, n2) }.take(20)
    val got = Analytics.q201AdamicAdar(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  // -------------------------------------------------------- q202_bowker

  test("q202_bowker: modal-transition cells and symmetry terms replay") {
    val orders = Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "year(o_orderdate) as y", "o_orderpriority")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getInt(1), r.getString(2)))
      .filter(t => t._2 == 1995 || t._2 == 1996)
    def modal(yr: Int): Map[Long, String] =
      orders.filter(_._2 == yr).groupBy(_._1).map { case (cust, os) =>
        cust -> os.groupBy(_._3).toSeq
          .map { case (p, vs) => (vs.size, p) }
          .sortBy { case (c, p) => (-c, p) }.head._2
      }
    val (m95, m96) = (modal(1995), modal(1996))
    val cells = m95.keySet.intersect(m96.keySet).toSeq
      .map(c => (m95(c), m96(c)))
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val ps = cells.keySet.flatMap(k => Seq(k._1, k._2)).toSeq.sorted
    val expected = (for { i <- ps; j <- ps if i < j } yield {
      val nij = cells.getOrElse((i, j), 0L)
      val nji = cells.getOrElse((j, i), 0L)
      val term = if (nij + nji > 0)
        Some((BigInt(nij - nji) * (nij - nji) * 1000000 / (nij + nji)).toLong)
      else None
      (i, j, nij, nji, term)
    }).sortBy(t => (t._1, t._2))
    val got = Analytics.q202Bowker(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == expected)
  }

  // ------------------------------------------------------- q203_dixon_q

  test("q203_dixon_q: order-statistic gap ratios replay; Q in [0, 1]") {
    val expected = dailyCents().groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (p, ds) =>
      val s = ds.sortBy(t => (t._3, t._2)).map(_._3)
      val n = s.size
      if (n < 3) None else {
        val range = s.last - s.head
        def q(g: Long) = if (range > 0)
          Some((BigInt(g) * 1000000 / range).toLong) else None
        Some((p, n.toLong, s.head, s.last, q(s(1) - s.head), q(s.last - s(n - 2))))
      }
    }
    val got = Analytics.q203DixonQ(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(got == expected)
    assert(got.forall(r => r._5.forall(v => v >= 0 && v <= 1000000) &&
      r._6.forall(v => v >= 0 && v <= 1000000)))
  }

  // -------------------------------------------- q204_kendall_tau_b

  test("q204_kendall_tau_b: cell-product concordance and tie margins replay") {
    val base = Tables.orders(spark, sf0001)
      .selectExpr("cast(substring(o_orderpriority, 1, 1) as bigint) as x",
        "least(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) div 5000000, 9) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cells = base.groupBy(identity).map { case (k, vs) => k -> BigInt(vs.size) }
    val cs = cells.toSeq
    var (cC, dD) = (BigInt(0), BigInt(0))
    for (((xa, ya), na) <- cs; ((xb, yb), nb) <- cs
         if xa < xb || (xa == xb && ya < yb)) {
      if (xa < xb && ya < yb) cC += na * nb
      if (xa < xb && ya > yb) dD += na * nb
    }
    val n = cells.values.sum
    val n12 = cells.groupBy(_._1._1).values
      .map(m => { val t = m.values.sum; t * (t - 1) }).sum
    val n22 = cells.groupBy(_._1._2).values
      .map(m => { val t = m.values.sum; t * (t - 1) }).sum
    val n02 = n * (n - 1)
    val tau = r6((cC.toDouble - dD.toDouble) /
      math.sqrt((n02 - n12).toDouble / 2 * ((n02 - n22).toDouble / 2)))
    val got = Analytics.q204KendallTauB(spark, sf0001).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5)) ==
      (n.toLong, cC.toLong, dD.toLong, (n12 / 2).toLong, (n22 / 2).toLong, tau))
    // tau-b bracketed by gamma's support: |tau| <= 1
    assert(math.abs(r.getDouble(5)) <= 1.0)
  }

  // --------------------------------------------------- txt_guiraud

  test("txt_guiraud: root-TTR replay; between TTR bias endpoints") {
    val toks = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ts) =>
      val n = ts.size.toLong
      val v = ts.map(_._2).distinct.size.toLong
      (lang, n, v, r6(v.toDouble / math.sqrt(n.toDouble)))
    }
    val got = operators.TextAnalysis.txtGuiraud(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  // --------------------------------------------- dd_oph_incremental

  test("dd_oph_incremental: band join against history replays from the signature table") {
    val sigs = Dedup.ddOphSigs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(3).split(',')))
    def bands(filter: Long => Boolean): Map[(Int, String), Seq[Long]] = {
      val bs = for ((id, s) <- sigs.toSeq if filter(id); b <- 0 until 4)
        yield ((b, md5hex(s(2 * b) + s(2 * b + 1) + ":" + b)), id)
      bs.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    }
    val hist = bands(_ < 400L)
    val neu = bands(_ >= 400L)
    val expected = (for {
      (k, newIds) <- neu.toSeq; oldIds <- hist.get(k).toSeq
      n <- newIds; o <- oldIds
    } yield (n, o)).distinct.sorted
    val got = Dedup.ddOphIncremental(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.forall(p => p._1 >= 400L && p._2 < 400L))
  }

  // =================================================== batch 4 (r14)

  /** Shift-extended lgRef14 — the driver replica of the operators'
    * lgShift fragment (lg(x ≫ s) + s·2²⁰ past the 2⁴³ domain). */
  private def lgShiftRef(x: Long): Long = {
    require(x > 0)
    val s = math.max(0, (64 - java.lang.Long.numberOfLeadingZeros(x)) - 43)
    lgRef14(x >> s) + s.toLong * (1L << 20)
  }

  private def ordersCents(): Array[(String, java.sql.Date, Long)] =
    Tables.orders(spark, sf0001)
      .selectExpr("o_orderpriority", "cast(o_orderdate as date) as day",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))

  // ------------------------------------------- q205_anderson_darling

  test("q205_anderson_darling: per-cell floored micro terms replay over pooled EDF cells") {
    val rows = Tables.orders(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority")
        .isin("1-URGENT", "5-LOW"))
      .join(Tables.customer(spark, sf0001),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .join(Tables.nation(spark, sf0001),
        org.apache.spark.sql.functions.expr("c_nationkey = n_nationkey"))
      .join(Tables.region(spark, sf0001),
        org.apache.spark.sql.functions.expr("n_regionkey = r_regionkey"))
      .selectExpr("r_name", "o_orderpriority = '1-URGENT' as is_a",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (reg, xs) =>
      val cells = xs.groupBy(_._3).toSeq.sortBy(_._1)
        .map { case (v, cs) => (v, cs.size.toLong, cs.count(_._2).toLong) }
      val nTot = cells.map(_._2).sum
      val nA = cells.map(_._3).sum
      val nB = nTot - nA
      if (nA == 0 || nB == 0) None else {
        var bj = 0L; var ma = 0L; var mb = 0L
        var ia = BigInt(0); var ib = BigInt(0)
        for ((_, cTot, cA) <- cells) {
          bj += cTot; ma += cA; mb += cTot - cA
          if (bj < nTot) {
            def term(m: Long, na: Long): BigInt = {
              val num = BigInt(nTot) * m - BigInt(na) * bj
              BigInt(cTot) * num * num * 1000000 / (BigInt(bj) * (nTot - bj))
            }
            ia += term(ma, nA); ib += term(mb, nB)
          }
        }
        val a2 = r6((ia.toDouble / nA.toDouble + ib.toDouble / nB.toDouble)
          / (nTot.toDouble * 1e6))
        Some((reg, nA, nB, ia.toString, ib.toString, a2))
      }
    }
    val got = Analytics.q205AndersonDarling(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getDouble(5))).toSeq
    assert(got == expected)
    // AD is nonnegative and the inner sums are nonnegative integers
    assert(got.forall(_._6 >= 0))
  }

  // ------------------------------------------------------ q206_quade

  test("q206_quade: block-range weighting replay (doubled midranks at both levels)") {
    val weekly = ordersCents()
      .groupBy(r => (r._1, r._2.toLocalDate.toEpochDay / 7))
      .map { case ((p, wk), vs) => (p, wk, vs.map(x => BigInt(x._3)).sum.toLong) }.toSeq
    val complete = weekly.groupBy(_._2).filter(_._2.size == 5).keySet
    val wv = weekly.filter(w => complete(w._2))
    val r2 = wv.map { case (p, wk, c) =>
      val blk = wv.filter(_._2 == wk)
      ((p, wk), 2L * blk.count(_._3 < c) + blk.count(_._3 == c) + 1L)
    }.toMap
    val ranges = wv.groupBy(_._2).map { case (wk, vs) =>
      (wk, vs.map(_._3).max - vs.map(_._3).min) }.toSeq
    val q2 = ranges.map { case (wk, rng) =>
      (wk, 2L * (ranges.count(_._2 < rng) + 1) + ranges.count(_._2 == rng) - 1L)
    }.toMap
    val s4 = wv.map { case (p, wk, _) => (p, wk, q2(wk) * (r2((p, wk)) - 6L)) }
    val a16 = s4.map(x => BigInt(x._3) * x._3).sum
    val perTreat = s4.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, xs) =>
      (p, xs.size.toLong, xs.map(x => BigInt(x._3)).sum) }
    val nb = perTreat.head._2
    val b16n = perTreat.map(t => t._3 * t._3).sum
    val f = if (BigInt(nb) * a16 - b16n > 0)
      Some(r6((BigInt(nb - 1) * b16n).toDouble / (BigInt(nb) * a16 - b16n).toDouble))
    else None
    val expected = perTreat.map { case (p, n, s) =>
      (p, n, s.toLong, a16.toString, f) }
    val got = Analytics.q206Quade(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got == expected)
    // the doubled-midrank invariant within every complete block:
    // Σ r2 over the k=5 treatments is k(k+1) = 30 at the 2x scale
    assert(complete.forall(wk =>
      wv.filter(_._2 == wk).map(w => r2((w._1, wk))).sum == 30L))
  }

  // ------------------------------------------------ q207_theil_index

  test("q207_theil_index: within/between decomposition replay in fixed-point lg2") {
    val byCust = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .join(Tables.nation(spark, sf0001),
        org.apache.spark.sql.functions.expr("c_nationkey = n_nationkey"))
      .selectExpr("n_name", "o_custkey",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).toSeq
      .map { case ((nn, _), vs) => (nn, vs.map(v => BigInt(v._3)).sum.toLong) }
      .filter(_._2 > 0)
    val grp = byCust.groupBy(_._1).toSeq.sortBy(_._1).map { case (nn, xs) =>
      (nn, xs.size.toLong, xs.map(x => BigInt(x._2)).sum.toLong) }
    val nTot = grp.map(_._2).sum
    val sTot = grp.map(g => BigInt(g._3)).sum.toLong
    val expected = grp.map { case (nn, ng, sg) =>
      val wnum = byCust.filter(_._1 == nn).map { case (_, x) =>
        BigInt(x) * (lgShiftRef(x) + lgShiftRef(ng) - lgShiftRef(sg)) }.sum
      val bterm = BigInt(sg) *
        (lgShiftRef(sg) + lgShiftRef(nTot) - lgShiftRef(ng) - lgShiftRef(sTot))
      // BigInt / truncates toward zero == the operators' sign-split div
      (nn, ng, sg, (wnum * 1000 / (BigInt(sg) * 1048576)).toLong,
        (bterm * 1000 / (BigInt(sTot) * 1048576)).toLong)
    }
    val got = Analytics.q207TheilIndex(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // decomposability sanity: total between-mass is near-zero-or-positive
    // (fixed-point lg is not exactly additive; exact-log Theil is >= 0)
    assert(expected.map(_._5).sum >= -expected.size.toLong)
  }

  // ------------------------------------------------- q208_dispersion

  test("q208_dispersion: VMR and D are exact rationals off one daily aggregate") {
    val daily = ordersCents()
      .groupBy(r => (r._1, r._2)).map { case ((p, d), vs) => (p, d, vs.size.toLong) }
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (p, xs) =>
      val n = xs.size.toLong
      val sc = xs.map(_._3).sum
      val sc2 = xs.map(x => BigInt(x._3) * x._3).sum
      if (n < 2 || sc <= 0) None else {
        val ssn = BigInt(n) * sc2 - BigInt(sc) * sc
        Some((p, n, sc, (ssn * 1000000 / (BigInt(n - 1) * sc)).toLong,
          (ssn * 1000000 / BigInt(sc)).toLong))
      }
    }
    val got = Analytics.q208Dispersion(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // overdispersed order flow: d = (n-1)*vmr exactly at micro scale
    assert(got.forall(r => r._4 >= 0 && r._5 >= 0))
  }

  // ---------------------------------------------------- txt_dugast

  test("txt_dugast: U = lg2N/(lgN - lgV) off the shared recurrence; saturation NULL") {
    val toks = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ts) =>
      val n = ts.size.toLong
      val v = ts.map(_._2).distinct.size.toLong
      val lgN = lgShiftRef(n); val lgV = lgShiftRef(v)
      val u = if (n >= 2 && lgN > lgV)
        Some((BigInt(lgN) * lgN * 1000 / (BigInt(1048576) * (lgN - lgV))).toLong)
      else None
      (lang, n, v, u)
    }
    val got = operators.TextAnalysis.txtDugast(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == expected)
    assert(got.forall(_._4.forall(_ > 0)))
  }

  // ------------------------------------------------- sim_kmeans_bic

  test("sim_kmeans_bic: bits-BIC/AIC replay off the Lloyd pieces and literal constants") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val cent = centroids(vecs)
    val assigned = vecs.map { case (id, _, e) =>
      val best = cent.toSeq.map { case (cl, cv) =>
        var s = 0.0; var j = 0
        while (j < e.length) { val dfd = e(j).toDouble - cv(j); s += dfd * dfd; j += 1 }
        (s, cl)
      }.min
      (id, best._2, (BigDecimal(java.math.BigDecimal.valueOf(r6(best._1)))
        .setScale(6) * 1000000).toBigInt)
    }
    val per = assigned.groupBy(_._2).map { case (cl, xs) =>
      (cl, xs.length.toLong, xs.map(_._3).sum) }.toSeq
    val n = per.map(_._2).sum
    val k = per.size.toLong
    val d = vecs.head._3.length.toLong
    val sse = per.map(_._3).sum.toLong
    val snl = per.map(p => BigInt(p._2) * lgShiftRef(p._2)).sum
    val f2 =
      if (n > k && sse > 0) Some(
        -BigInt(n) * d * (2780295L + lgShiftRef(sse) - lgShiftRef(1000000L * d * (n - k))) -
          BigInt(d) * (n - k) * 1512775L + 2 * snl - 2 * BigInt(n) * lgShiftRef(n))
      else None
    val expected = (n, k, d, sse,
      f2.map(v => (v * 1000 / 2097152).toLong),
      f2.map(v => ((-v + BigInt(k) * (d + 1) * lgShiftRef(n)) * 1000 / 1048576).toLong),
      f2.map(v => ((-v + BigInt(k) * (d + 1) * 2 * 1512775L) * 1000 / 1048576).toLong))
    val got = Similarity.simKmeansBic(spark, sf0001).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)),
      if (r.isNullAt(5)) None else Some(r.getLong(5)),
      if (r.isNullAt(6)) None else Some(r.getLong(6))) == expected)
    // model-selection sanity at fixed k: BIC penalizes harder than AIC
    // once lg n > 2 lg e (n >= 8). (ll itself can be POSITIVE here:
    // a continuous density with per-dim variance < 1 exceeds 1.)
    if (n >= 8) assert(expected._6.zip(expected._7).forall(p => p._1 >= p._2))
  }

  // ------------------------------------------------- sim_hnsw_topk

  test("sim_hnsw_topk: structure, carve determinism, and recall@5 vs exact") {
    val hnsw = Similarity.simHnswTopk(spark, sf0001).collect()
    val byQ = hnsw.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 5, s"expected 5 queries, got ${byQ.keySet}")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
        s"query $q ranks broken")
    }
    // layer-1 carve: deterministic md5 nibble, ~1/16 of the corpus,
    // nonempty at every SF (the traversal needs an entry set)
    val members = Tables.embeddings(spark, sf0001)
      .select("vec_id").collect().map(_.getLong(0))
      .filter(id => md5hex("hnsw:" + id).startsWith("0"))
    assert(members.nonEmpty)
    // recall@5 vs exact: the hierarchy starts label-agnostic (4 md5
    // entries, not per-cell seeds), so its floor sits under flat
    // NSW's 0.3; a collapsed traversal (stuck at entries) lands ~0
    val exact = Similarity.simTopkBruteforce(spark, sf0001).collect()
      .filter(_.getAs[Long]("rank") <= 5)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val hits = hnsw.count(r =>
      exact((r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))))
    val recall = hits.toDouble / exact.size
    info(f"HNSW recall@5 = $recall%.2f ($hits/${exact.size})")
    assert(recall >= 0.2, f"HNSW recall@5 collapsed: $recall%.2f")
  }

  test("sim_hnsw_recall: per-query rows self-consistent and k pinned") {
    Similarity.simHnswRecall(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("k") == 5)
      val h = r.getAs[Long]("n_hit")
      assert(h >= 0 && h <= 5)
      assert(math.abs(r.getAs[Double]("recall_at_k") - h / 5.0) < 1e-12)
    }
  }

  // =================================================== batch 6 (r14)

  // -------------------------------------------- q209_brunner_munzel

  test("q209_brunner_munzel: doubled-midrank relative effect and variance replay") {
    val rows = Tables.orders(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority")
        .isin("1-URGENT", "5-LOW"))
      .join(Tables.customer(spark, sf0001),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .join(Tables.nation(spark, sf0001),
        org.apache.spark.sql.functions.expr("c_nationkey = n_nationkey"))
      .join(Tables.region(spark, sf0001),
        org.apache.spark.sql.functions.expr("n_regionkey = r_regionkey"))
      .selectExpr("r_name", "o_orderpriority = '1-URGENT' as is_a",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (reg, xs) =>
      val cells = xs.groupBy(_._3).toSeq.sortBy(_._1)
        .map { case (v, cs) => (v, cs.size.toLong, cs.count(_._2).toLong) }
      val nA = cells.map(_._3).sum
      val nB = cells.map(c => c._2 - c._3).sum
      if (nA < 2 || nB < 2) None else {
        var ltC = 0L; var ltA = 0L; var ltB = 0L
        var sr2a = BigInt(0); var sr2b = BigInt(0)
        val withRanks = cells.map { case (_, cTot, cA) =>
          val cB = cTot - cA
          val r2 = 2 * ltC + cTot + 1
          val w2a = 2 * ltA + cA + 1
          val w2b = 2 * ltB + cB + 1
          ltC += cTot; ltA += cA; ltB += cB
          sr2a += BigInt(cA) * r2; sr2b += BigInt(cB) * r2
          (cTot, cA, cB, r2, w2a, w2b)
        }
        var s4na = BigInt(0); var s4nb = BigInt(0)
        for ((_, cA, cB, r2, w2a, w2b) <- withRanks) {
          val da = BigInt(nA) * (r2 - w2a + nA + 1) - sr2a
          val db = BigInt(nB) * (r2 - w2b + nB + 1) - sr2b
          s4na += BigInt(cA) * da * da
          s4nb += BigInt(cB) * db * db
        }
        val pHat = ((sr2b - BigInt(nB) * (nB + 1)) * 1000000 /
          (2 * BigInt(nA) * nB)).toLong
        val t = if (s4na + s4nb > 0) Some(r6(
          (nA.toDouble * nB)
            * (sr2b.toDouble / (2 * nB.toDouble) - sr2a.toDouble / (2 * nA.toDouble))
            / ((nA + nB).toDouble
               * math.sqrt(nA.toDouble * (s4na.toDouble / (4 * nA.toDouble * nA * (nA - 1)))
                 + nB.toDouble * (s4nb.toDouble / (4 * nB.toDouble * nB * (nB - 1)))))))
        else None
        Some((reg, nA, nB, pHat, s4na.toString, s4nb.toString, t))
      }
    }
    val got = Analytics.q209BrunnerMunzel(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toSeq
    assert(got == expected)
    // relative effect is a probability at micro scale
    assert(got.forall(r => r._4 >= 0 && r._4 <= 1000000))
  }

  // ---------------------------------------------------- txt_summer

  test("txt_summer: double-log composition lg(lg X) = lgRef(lgRef X) - 20*2^20") {
    val toks = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ts) =>
      val n = ts.size.toLong
      val v = ts.map(_._2).distinct.size.toLong
      val lgN = lgShiftRef(n); val lgV = lgShiftRef(v)
      val s = if (lgV > 1048576 && lgN > 1048576) {
        val lln = lgRef14(lgN) - 20971520L
        val llv = lgRef14(lgV) - 20971520L
        if (lln > 0 && llv > 0) Some((BigInt(llv) * 1000000 / BigInt(lln)).toLong)
        else None
      } else None
      (lang, n, v, s)
    }
    val got = operators.TextAnalysis.txtSummer(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == expected)
    assert(got.forall(_._4.forall(s => s > 0 && s <= 1000000)))
  }

  // --------------------------------------------------- sim_hopkins

  test("sim_hopkins: deterministic probe/synthetic NN replay; H in (0.5, 1] band sanity") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val m = 50
    val probes = vecs.sortBy { case (id, _) => (md5hex("hop:" + id), id) }.take(m)
    val dims = vecs.head._2.length
    val lo = Array.tabulate(dims)(d => vecs.map(_._2(d).toDouble).min)
    val hi = Array.tabulate(dims)(d => vecs.map(_._2(d).toDouble).max)
    def frac(s: Long, i: Int): Double =
      java.lang.Long.parseLong(md5hex(s"hopu:$s:$i").substring(0, 8), 16)
        .toDouble / 4294967296.0
    val synth = (0L until m.toLong).map(s =>
      Array.tabulate(dims)(d => lo(d) + frac(s, d + 1) * (hi(d) - lo(d))))
    def d2(a: Array[Double], b: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { val df = a(j) - b(j).toDouble; s += df * df; j += 1 }
      s
    }
    val sumW = probes.map { case (pid, pe) =>
      val pd = pe.map(_.toDouble)
      val mn = vecs.iterator.filter(_._1 != pid).map(v => d2(pd, v._2)).min
      math.floor(1000000 * mn).toLong
    }.sum
    val sumU = synth.map { pe =>
      val mn = vecs.iterator.map(v => d2(pe, v._2)).min
      math.floor(1000000 * mn).toLong
    }.sum
    val h = BigInt(sumU) * 1000000 / (BigInt(sumU) + sumW)
    val got = Similarity.simHopkins(spark, sf0001).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (m.toLong, sumW, sumU, h.toLong))
    // embeddings are label-clustered, so tendency must clear the
    // uniform-noise midpoint
    assert(r.getLong(3) > 500000, s"H = ${r.getLong(3)} not > 0.5")
  }
}
