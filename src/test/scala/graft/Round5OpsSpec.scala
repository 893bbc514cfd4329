package graft

import graft.operators.CorpusPipeline
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 specs: the distributed two-phase prefix sum that replaced
  * the per-language serial window in the packing family — value parity
  * with the serial formulation and the plan property that motivated it
  * (no window partitioned by the language key alone). */
class Round5OpsSpec extends SparkSpec {

  private def sizedDocs = Tables.documents(spark, sf0001)
    .withColumn("dl", expr(
      "cast(size(filter(split(text, ' '), x -> x != '')) as bigint)"))
    .filter(col("dl") > 0)

  test("prefixSumExclusive is bit-identical to the serial per-key window cumsum") {
    val serial = sizedDocs
      .withColumn("start_off", coalesce(
        sum(col("dl")).over(Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("doc_id"), col("start_off"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val twoPhase = CorpusPipeline
      .prefixSumExclusive(sizedDocs, "lang", Seq(col("doc_id")), "dl", "start_off",
        CorpusPipeline.equiWidthBucket(sizedDocs, "doc_id"))
      .select(col("lang"), col("doc_id"), col("start_off"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(twoPhase == serial)
  }

  test("prefixSumExclusive parity holds under a multi-column descending order") {
    val serial = sizedDocs
      .withColumn("off", coalesce(
        sum(col("dl")).over(Window.partitionBy(col("lang"))
          .orderBy(col("dl").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("off"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twoPhase = CorpusPipeline
      .prefixSumExclusive(sizedDocs, "lang", Seq(col("dl").desc, col("doc_id")),
        "dl", "off", expr("cast(-dl as bigint)"))
      .select(col("doc_id"), col("off"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPhase == serial)
  }

  test("prefixMaxExclusive is identical to the serial window max, including first-row nulls") {
    val serial = sizedDocs
      .withColumn("pm", max(col("dl")).over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("doc_id"), col("pm"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val twoPhase = CorpusPipeline
      .prefixMaxExclusive(sizedDocs, "lang", Seq(col("doc_id")), "dl", "pm",
        CorpusPipeline.equiWidthBucket(sizedDocs, "doc_id"))
      .select(col("doc_id"), col("pm"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(twoPhase == serial)
  }

  test("q100_ema: convexity — each EMA lies within the trailing 8-point cents range") {
    val rows = graft.operators.Analytics.q100Ema(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3) / 1000.0))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { series =>
      // output order is the day order (warm-up rows dropped); from the
      // 8th output row on, the trailing 8 OUTPUT rows are the window
      series.sliding(8).filter(_.size == 8).foreach { wnd =>
        val cents = wnd.map(_._2)
        val ema = wnd.last._3
        assert(ema >= cents.min - 1e-3 && ema <= cents.max + 1e-3,
          s"ema $ema outside [${cents.min}, ${cents.max}]")
      }
    }
  }

  test("mm_phash_dup: banded pairs equal the all-pairs hamming<=5 answer (pigeonhole)") {
    val hashes = Tables.documents(spark, sf0001)
      .withColumn("grams", expr(
        "regexp_replace(hex(cast(text as binary)), '(.{8})', '$1 ')"))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions.simhash60(col("grams")).as("ph"))
      .filter(col("ph").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val allPairs = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 5
    } yield (ia, ib)).toSet
    val banded = graft.operators.Multimodal.mmPhashDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == allPairs, s"banded=${banded.size} allPairs=${allPairs.size}")
  }

  test("q104_weighted_median: matches a direct in-memory weighted median") {
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"),
        expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"),
        expr("cast(l_quantity as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.sortBy(_._2)
      val tw = rs.map(_._3).sum
      var cw = 0L
      val med = sorted.find { case (_, _, w) => cw += w; cw * 2 >= tw }.get._2
      flag -> ((tw, med))
    }
    val got = graft.operators.Analytics.q104WeightedMedian(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("pipe_epoch_shuffle: slots are dense per (epoch, shard) and epochs disagree on order") {
    val rows = graft.operators.CorpusPipeline.pipeEpochShuffle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(r => (r._1, r._2)).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == (1L to g.size).toSeq, "slots must be dense from 1")
    }
    val orderByEpoch = rows.groupBy(_._1).map { case (e, g) =>
      e -> g.sortBy(r => (r._2, r._4)).map(_._3).toSeq
    }
    assert(orderByEpoch(0L) != orderByEpoch(1L),
      "different epochs must yield different document orders")
    assert(orderByEpoch(0L).sorted == orderByEpoch(1L).sorted,
      "every epoch covers the identical doc set")
  }

  test("dd_bloom_prefilter: hit counts match a driver-side recomputation (⇒ no false negatives)") {
    // an exact dup's 3 positions equal its history twin's, so hit-count
    // correctness IMPLIES the no-false-negative guarantee; verifying the
    // counts exactly is the stronger test (the sf0.001 fixture happens to
    // contain no cross-split exact dup to observe directly)
    import graft.operators.Dedup
    def positions(text: String): Seq[Long] = (0 to 2).map { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$text".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 4096
    }
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val hist = docs.filter(_._1 < 400).flatMap(d => positions(d._2)).toSet
    val expected = docs.filter(_._1 >= 400).map { case (id, t) =>
      id -> positions(t).count(hist).toLong
    }.toMap
    val got = Dedup.ddBloomPrefilter(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(Dedup.ddBloomPrefilter(spark, sf0001).collect()
      .forall(r => r.getBoolean(2) == (r.getLong(1) == 3)))
  }

  test("pipe_curriculum: closed-form stages equal the serial ntile window exactly") {
    val serial = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        graft.functions.TextOps.tokens("text").as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("source"),
        expr("cast(aggregate(t, 0, (acc, x) -> acc + length(x)) as bigint)").as("n_chars"),
        size(col("t")).cast("long").as("n_tokens"))
      .withColumn("score", round(col("n_chars") / col("n_tokens"), 6))
      .withColumn("stage", ntile(4).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("score"), col("doc_id"))).cast("bigint"))
      .select(col("doc_id"), col("stage"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = graft.operators.CorpusPipeline.pipeCurriculum(spark, sf0001)
      .select(col("doc_id"), col("stage"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == serial)
  }

  test("packing family plans carry no window partitioned by lang alone") {
    Seq(
      CorpusPipeline.pipePackSequences(spark, sf0001),
      CorpusPipeline.pipeTokenBudget(spark, sf0001),
      CorpusPipeline.pipeE2eCorpus(spark, sf0001)
    ).foreach { df =>
      // string-parse the plan (the AQE wrapper hides WindowExec nodes
      // from TreeNode.collect): every window whose spec involves lang
      // must also involve the bucket — the tiny per-bucket-subtotal
      // window orders by _bkt, the big cumsum partitions by it. Windows
      // on other keys (the dedup window on clean_md5, a high-cardinality
      // hash) are not the skew pattern under test.
      val p = df.queryExecution.executedPlan.toString
      val windowLines = p.linesIterator.filter(_.contains("Window [")).toSeq
      assert(windowLines.nonEmpty, s"expected window operators in:\n$p")
      val langWindows = windowLines.filter(_.contains("lang"))
      assert(langWindows.nonEmpty, "the per-lang cumsum windows must exist")
      langWindows.foreach { l =>
        assert(l.contains("_bkt"),
          s"serial per-lang window found (no _bkt in spec): $l")
      }
    }
  }
}
