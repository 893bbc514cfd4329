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
}
