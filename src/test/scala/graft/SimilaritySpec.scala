package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
      r.getAs[Long]("vec_id"))).toSeq

  test("brute force returns k ranked neighbors per query, no self-match") {
    val rows = Similarity.simTopkBruteforce(spark, sf0001).collect()
    assert(rows.length == 50) // 5 queries × k=10
    assert(rows.forall(r => r.getAs[Long]("vec_id") != r.getAs[Long]("query_id")))
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rs =>
      val ranked = rs.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
      val scores = ranked.map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sorted.reverse))
    }
  }

  test("IVF ANN achieves useful recall vs brute force") {
    val exact = resultSet(Similarity.simTopkBruteforce(spark, sf0001))
      .map { case (q, _, v) => (q, v) }.toSet
    val approx = resultSet(Similarity.simIvfAnn(spark, sf0001))
      .map { case (q, _, v) => (q, v) }.toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"IVF recall@10 = $recall%.2f")
    // the synthetic embeddings have weak label-cluster structure
    // (within-label cosine <= 0.47), so nprobe=2 of 10 cells bounds
    // recall near nprobe/ncells; assert we at least clear that floor
    assert(recall >= 0.15, s"IVF recall below chance floor: $recall")
  }

  test("multi-probe LSH recall dominates single-probe") {
    val exact = resultSet(Similarity.simTopkBruteforce(spark, sf0001))
      .map { case (q, _, v) => (q, v) }.toSet
    def recall(df: org.apache.spark.sql.DataFrame) =
      (resultSet(df).map { case (q, _, v) => (q, v) }.toSet & exact).size.toDouble / exact.size
    val single = recall(Similarity.simLshAnn(spark, sf0001))
    val multi = recall(Similarity.simLshMultiProbe(spark, sf0001))
    info(f"LSH recall@10: single=$single%.2f multi=$multi%.2f")
    assert(multi >= single)
    assert(multi > 0.1, s"multi-probe recall too low: $multi")
  }

  test("k-means step assigns every vector to a valid nearest cell") {
    val rows = Similarity.simKmeansStep(spark, sf0001).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[Double]("dist") >= 0.0))
    assert(rows.forall(r => (0 to 9).contains(r.getAs[Int]("new_label"))))
    // a Lloyd step can only keep or reduce each point's distance to its
    // own (seed) centroid, so some points must stay put
    val stayed = rows.count(r => r.getAs[Int]("label") == r.getAs[Int]("new_label"))
    assert(stayed > 0)
  }

  test("LSH ANN buckets give non-empty results and sane recall") {
    val approx = resultSet(Similarity.simLshAnn(spark, sf0001))
    assert(approx.nonEmpty)
    val exact = resultSet(Similarity.simTopkBruteforce(spark, sf0001))
      .map { case (q, _, v) => (q, v) }.toSet
    val hits = approx.map { case (q, _, v) => (q, v) }.toSet & exact
    info(s"LSH returned ${approx.size} results, ${hits.size} overlap with exact top-10")
    // sign-bucket LSH on near-orthogonal vectors is coarse; just require signal
    assert(hits.nonEmpty)
  }

  test("hamming top-k: distances match a driver-side sign-bit recompute") {
    val rows = Similarity.simHammingTopk(spark, sf0001).collect()
    assert(rows.length == 5 * 10)
    // recompute the sign codes for all vectors in the driver
    val embs = graft.Tables.embeddings(spark, sf0001)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")).toMap
    def code(v: scala.collection.Seq[Float]): Seq[Boolean] = v.map(_ > 0f).toSeq
    rows.foreach { r =>
      val q = code(embs(r.getAs[Long]("query_id")))
      val c = code(embs(r.getAs[Long]("vec_id")))
      val expected = q.zip(c).count { case (a, b) => a != b }
      assert(r.getAs[Long]("hamming") == expected.toLong,
        s"hamming mismatch for ${r.getAs[Long]("query_id")}->${r.getAs[Long]("vec_id")}")
    }
    // ranks must be non-decreasing in distance within each query
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("hamming"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
    // and the prune must run through the bounded-heap operator
    val p = Similarity.simHammingTopk(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), s"expected TopKPerGroup in:\n$p")
  }
}
