package graft

import graft.operators.{Analytics, Dedup, Similarity, TextAnalysis}

/** Round-13 batch-2 specs: independent driver recomputes (plain
  * Scala, no Spark expressions) for the six new operators — MATTR,
  * one-permutation minhash, the RP-tree ANN pair, ADF inputs and the
  * Brier calibration cells. The RP-tree recompute rebuilds the whole
  * index (projections, per-node lower medians, leaf routing, in-leaf
  * cosine top-k) from the raw parquet floats, so a drift in ANY stage
  * of the operator — plane derivation, median rank, child arithmetic,
  * tie-breaks — lands as a localized assertion here rather than an
  * opaque value-gate mismatch. */
class Round13WidenSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docs(): Seq[(Long, Array[String])] =
    Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty)))
      .toSeq.sortBy(_._1)

  // ---------------------------------------------------------- txt_mattr

  test("txt_mattr: driver-recomputed window distinct sums match exactly") {
    val expected = docs().flatMap { case (id, t) =>
      if (t.length < 50) None
      else {
        val nw = t.length - 49
        val num = (0 until nw).map(s => t.slice(s, s + 50).distinct.length.toLong).sum
        Some((id, t.length.toLong, nw.toLong, num, num * 1000000L / (50L * nw)))
      }
    }
    val got = TextAnalysis.txtMattr(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
  }

  // -------------------------------------------------------- dd_oph_sigs

  /** Reference OPH: one md5 per 3-gram shingle, binned by last hex
    * digit mod 8, per-bin min, circular borrow densification. */
  private def referenceOph(t: Array[String]): Option[(Long, Long, String)] = {
    if (t.length < 3) return None
    val shingles = (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
    val hs = shingles.map(md5hex)
    val raw: IndexedSeq[Option[String]] = (0 until 8).map { i =>
      val bin = hs.filter(h => ("0123456789abcdef".indexOf(h.last) % 8) == i)
      if (bin.isEmpty) None else Some(bin.min)
    }
    val dense = (0 until 8).map { i =>
      (0 until 8).iterator.map(j => raw((i + j) % 8)).collectFirst { case Some(v) => v }.get
    }
    Some((shingles.distinct.length.toLong, raw.count(_.isEmpty).toLong, dense.mkString(",")))
  }

  test("dd_oph_sigs: driver-recomputed densified signatures match exactly") {
    val expected = docs().flatMap { case (id, t) =>
      referenceOph(t).map { case (ns, ne, sig) => (id, ns, ne, sig) }
    }
    val got = Dedup.ddOphSigs(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expected)
  }

  test("dd_oph_sigs: densification fires (short docs exist) and fills every slot") {
    val rows = Dedup.ddOphSigs(spark, sf0001).collect()
    assert(rows.exists(_.getLong(2) > 0), "no doc exercised the borrow path")
    assert(rows.forall(_.getString(3).split(',').length == 8))
    assert(rows.forall(_.getString(3).split(',').forall(_.length == 32)))
  }

  // ------------------------------------------------- sim_rp_tree family

  /** Full driver rebuild of the RP-tree: same plane doubles, same
    * left-to-right fold order, lower-median rank (n+1)/2 with
    * (proj, vec_id) order, child = node*2 + (proj > thr). */
  private def referenceLeaves(): Map[Long, (Int, Array[Float])] = {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    var nodes: Map[Long, Int] = vecs.map(v => v._1 -> 0).toMap
    for (p <- 0 until 3) {
      val plane = Similarity.rpPlane(p).toArray
      val proj: Map[Long, Double] = vecs.map { case (id, e) =>
        var s = 0.0
        var j = 0
        while (j < e.length) { s += e(j).toDouble * plane(j); j += 1 }
        id -> s
      }.toMap
      val thr: Map[Int, Double] = nodes.groupBy(_._2).map { case (node, members) =>
        val ordered = members.keys.toSeq.map(id => (proj(id), id)).sorted
        node -> ordered(((ordered.size + 1) / 2) - 1)._1
      }
      nodes = nodes.map { case (id, node) =>
        id -> (node * 2 + (if (proj(id) > thr(node)) 1 else 0))
      }
    }
    vecs.map { case (id, e) => id -> ((nodes(id), e)) }.toMap
  }

  test("sim_rp_tree: driver-rebuilt tree reproduces the top-k exactly; leaves balanced") {
    val leaves = referenceLeaves()
    val sizes = leaves.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0 until 8).toSet, s"missing leaves: $sizes")
    assert(sizes.values.max - sizes.values.min <= 3,
      s"median splits must balance leaves: $sizes") // ±1 per level
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]): Double = {
        var s = 0.0; var j = 0
        while (j < x.length) { s += x(j).toDouble * y(j).toDouble; j += 1 }
        s
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val expected = (0L until 5L).flatMap { qid =>
      val (qleaf, qe) = leaves(qid)
      leaves.toSeq.collect { case (id, (l, e)) if l == qleaf && id != qid => (id, cos(qe, e)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).zipWithIndex
        .map { case ((id, c), i) =>
          (qid, (i + 1).toLong, id, java.math.BigDecimal.valueOf(c).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
        }
    }
    val got = Similarity.simRpTree(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("sim_rp_recall: n_hit equals the exact∩approx overlap of the two gated outputs") {
    val exact = Similarity.simTopkBruteforce(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.simRpTree(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Similarity.simRpRecall(spark, sf0001).collect()
    assert(got.map(_.getLong(0)).toSeq == (0L until 5L).toSeq)
    got.foreach { r =>
      val qid = r.getLong(0)
      val hits = exact.count { case (q, v) => q == qid && approx((q, v)) }
      assert(r.getLong(1) == 10L)
      assert(r.getLong(2) == hits.toLong, s"q$qid n_hit ${r.getLong(2)} != $hits")
    }
  }

  // ----------------------------------------------------- q182 adf inputs

  test("q182_adf_inputs: driver-recomputed closed form matches") {
    val daily = Tables.orders(spark, sf0001)
      .selectExpr("o_orderpriority", "cast(o_orderdate as date) as day",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .groupBy(r => (r.getString(0), r.getDate(1).toString))
      .map { case ((p, d), rs) => (p, d, rs.map(r => BigInt(r.getLong(2))).sum) }
      .toSeq.sortBy(t => (t._1, t._2))
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, series) =>
      val cents = series.sortBy(_._2).map(_._3)
      val obs = cents.sliding(2).map { w => (w(0), w(1) - w(0)) }.toSeq
      val n = BigInt(obs.size)
      val sx = obs.map(_._1).sum
      val sd = obs.map(_._2).sum
      val sxd = obs.map { case (x, d) => x * d }.sum
      val sxx = obs.map { case (x, _) => x * x }.sum
      def r6(v: Double) = java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      // gamma: one correctly-rounded double division of EXACT sums;
      // intercept: the EXPLICIT sign-split quotient sign·(|num| div
      // den) — the engine-equal semantics both the operator and the
      // oracle now publish (Spark div truncates, DuckDB // floors;
      // sign-split makes them agree on negative numerators)
      val iNum = sd * sxx - sx * sxd
      val iDen = n * sxx - sx * sx
      val intercept = if (iNum < 0) -((-iNum) / iDen) else iNum / iDen
      (p, n.toLong, r6((n * sxd - sx * sd).toDouble / (n * sxx - sx * sx).toDouble),
        intercept.toLong)
    }
    val got = Analytics.q182AdfInputs(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  // --------------------------------------------------- q184 brier cells

  test("q184_brier_cells: driver-recomputed calibration cells match") {
    val flags = Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "year(o_orderdate) as yr").collect()
      .groupBy(_.getLong(0))
      .map { case (ck, rs) =>
        val yrs = rs.map(_.getInt(1)).toSet
        ck -> (if (yrs(1995)) 1L else 0L, if (yrs(1996)) 1L else 0L)
      }
    val expected = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_mktsegment").collect()
      .groupBy(_.getString(1)).toSeq.sortBy(_._1)
      .map { case (seg, cs) =>
        val fs = cs.map(c => flags.getOrElse(c.getLong(0), (0L, 0L)))
        val n = cs.length.toLong
        val k95 = fs.map(_._1).sum
        val k96 = fs.map(_._2).sum
        (seg, n, k95, k96, (BigInt(k95 - k96).pow(2) * 1000000 / n).toLong)
      }
    val got = Analytics.q184BrierCells(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
  }
}
