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
