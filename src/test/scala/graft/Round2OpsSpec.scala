package graft

import graft.operators.{Analytics, Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions.col

/** Semantic properties of the round-2 operators (the oracle gate checks
  * value parity; these check the invariants that make the answers
  * *right*, not just engine-consistent). */
class Round2OpsSpec extends SparkSpec {

  test("txt_bigrams: ranks are 1..5 per lang and counts are non-increasing") {
    val rows = TextAnalysis.txtBigrams(spark, sf0001).collect()
    val byLang = rows.groupBy(_.getString(0))
    byLang.values.foreach { g =>
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to g.length))
      val counts = g.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    }
  }

  test("txt_vocab: dense ids, unique terms, tf >= df >= 1") {
    val rows = TextAnalysis.txtVocab(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).sameElements(1L to rows.length))
    assert(rows.map(_.getString(1)).distinct.length == rows.length)
    rows.foreach { r => assert(r.getLong(2) >= r.getLong(3) && r.getLong(3) >= 1) }
  }

  test("txt_len_hist: buckets are 50-aligned and doc counts sum to corpus size") {
    val rows = TextAnalysis.txtLenHist(spark, sf0001).collect()
    assert(rows.forall(_.getLong(0) % 50 == 0))
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.documents(spark, sf0001).count())
  }

  test("txt_pii_mask: every injected email/IP is redacted and counted") {
    val rows = TextAnalysis.txtPiiMask(spark, sf0001).collect()
    rows.foreach { r =>
      val masked = r.getString(1)
      assert(!masked.contains("@"), s"unmasked email: $masked")
      assert(masked.contains("<EMAIL>") && masked.contains("<IP>"))
      assert(r.getLong(2) == 1 && r.getLong(3) == 1)
    }
  }

  test("sim_quantize: values bounded by ±127 and max-abs maps to ±127") {
    val rows = Similarity.simQuantize(spark, sf0001).collect()
    rows.foreach { r =>
      val q = r.getString(2).split(',').map(_.toInt).toSeq
      assert(q.forall(v => v >= -127 && v <= 127))
      assert(q.exists(v => math.abs(v) == 127), "scale element must hit ±127")
      assert(r.getDouble(1) > 0)
    }
  }

  test("sim_centroid_dist: one row per unordered label pair, cosine in [-1,1]") {
    val rows = Similarity.simCentroidDist(spark, sf0001).collect()
    val labels = Tables.embeddings(spark, sf0001)
      .select("label").distinct().count().toInt
    assert(rows.length == labels * (labels - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[Number](0).longValue < r.getAs[Number](1).longValue)
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  test("q32_latest_per_key: one row per user and it is the max timestamp") {
    val out = Analytics.q32LatestPerKey(spark, sf0001)
    val users = out.select("user_id").collect().map(_.getLong(0))
    assert(users.distinct.length == users.length)
    val maxTs = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("ts").as("m"))
    val joined = out.join(maxTs, "user_id")
      .filter(org.apache.spark.sql.functions.col("last_ts") =!=
        org.apache.spark.sql.functions.col("m"))
    assert(joined.count() == 0)
  }

  test("q33_except: result is disjoint from the 1997 customer set") {
    import org.apache.spark.sql.functions._
    val out = Analytics.q33Except(spark, sf0001)
    val c97 = Tables.orders(spark, sf0001)
      .filter(expr("year(o_orderdate) = 1997")).select(col("o_custkey").as("custkey"))
    assert(out.join(c97, "custkey").count() == 0)
    assert(out.count() == out.distinct().count())
  }

  test("q34_date_arith: latency bounds hold (avg <= max, n_lines > 0)") {
    val rows = Analytics.q34DateArith(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) > 0)
      assert(r.getDouble(3) <= r.getLong(4).toDouble)
    }
  }

  test("q35_regex_extract: first match starts with 's' iff count > 0") {
    val rows = Analytics.q35RegexExtract(spark, sf0001).collect()
    rows.foreach { r =>
      val n = r.getLong(1); val w = r.getString(2)
      if (n > 0) assert(w.startsWith("s")) else assert(w.isEmpty)
    }
  }

  test("q36_approx_quantile: sketch stays within rank tolerance of the exact percentiles") {
    val approx = Analytics.q36ApproxQuantile(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Analytics.q17Percentiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e25, e50, e75)) =>
      val (a25, a50, a75) = approx(k)
      // GK with accuracy 10000 on ~thousands of rows: near-exact; allow 5%
      Seq((a25, e25), (a50, e50), (a75, e75)).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 0.05 * math.abs(e) + 1e-6, s"$k: $a vs $e")
      }
    }
  }

  test("pipe_clean_corpus: survivors are unique, gated and cover all clean dups") {
    val rows = operators.CorpusPipeline.pipeCleanCorpus(spark, sf0001).collect()
    assert(rows.map(_.getString(1)).distinct.length == rows.length)
    assert(rows.forall(_.getLong(2) >= 10))
    // survivors' dup counts account for every gated document
    import org.apache.spark.sql.functions._
    val gated = Tables.documents(spark, sf0001)
      .withColumn("clean", expr(
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' '))"))
      .filter(expr("size(filter(split(clean, ' '), x -> x != '')) >= 10"))
      .count()
    assert(rows.map(_.getLong(3)).sum == gated)
  }

  test("dd_keepers: keepers partition the corpus (dup counts sum to |docs|)") {
    val rows = Dedup.ddKeepers(spark, sf0001).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sf0001).count())
    assert(rows.map(_.getString(1)).distinct.length == rows.length)
  }

  private def fiveGrams(text: String): Set[String] = {
    val t = text.split(' ').filter(_.nonEmpty)
    if (t.length < 5) Set.empty
    else t.sliding(5).map(_.mkString(" ")).toSet
  }

  test("dd_decontaminate: flags exactly the non-benchmark docs sharing a 5-gram") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val benchGrams = docs.filter(_._2 == "src0").flatMap(d => fiveGrams(d._3)).toSet
    val expected = docs.filter(_._2 != "src0")
      .map(d => d._1 -> fiveGrams(d._3).count(benchGrams))
      .filter(_._2 > 0).toMap
    val got = Dedup.ddDecontaminate(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.map { case (k, v) => k -> v.toLong })
  }

  test("q37_stratified_sample: deterministic carve near per-source target rates") {
    val rows = Analytics.q37StratifiedSample(spark, sf0001).collect()
    rows.foreach { r =>
      val (src, target, total, sampled) =
        (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))
      val even = src.drop(3).toInt % 2 == 0
      assert(target == (if (even) 0.25 else 0.75))
      assert(sampled <= total)
      // md5-prefix carve is binomial around the target; generous bound
      assert(math.abs(r.getDouble(4) - target) < 0.35, s"$src rate off")
    }
    val again = Analytics.q37StratifiedSample(spark, sf0001).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("txt_bm25: dense ranks, non-increasing scores, tf columns match the text") {
    val rows = TextAnalysis.txtBm25(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).sameElements(1L to rows.length))
    val scores = rows.map(_.getDouble(6))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val text = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(3).foreach { r =>
      val toks = text(r.getLong(1)).split(' ').filter(_.nonEmpty)
      assert(r.getLong(2) == toks.length)
      assert(r.getLong(3) == toks.count(_ == "join"))
      assert(r.getLong(4) == toks.count(_ == "hash"))
      assert(r.getLong(5) == toks.count(_ == "scan"))
    }
  }

  test("q38_interval_join: every bucket matches a driver-side recompute of the window") {
    val events = Tables.events(spark, sf0001)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(ts) tsm", "cast(value as decimal(18,2)) v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDecimal(4)))
    val sevenDaysMicros = 7L * 24 * 3600 * 1000000
    val expected = events.filter(_._3 == "signup").flatMap { case (aid, uid, _, t0, _) =>
      val hits = events.filter { case (_, u, _, t, _) =>
        u == uid && t > t0 && t <= t0 + sevenDaysMicros
      }
      if (hits.isEmpty) None
      else Some(aid -> (hits.length.toLong, hits.map(_._5.doubleValue).sum))
    }.toMap
    // the reformulated gate must be LIVE (the original orders target
    // shared no calendar with events — 0 rows at every SF)
    assert(expected.nonEmpty, "attribution window non-vacuous on this corpus")
    val got = Analytics.q38IntervalJoin(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (n, s)) =>
      assert(n == expected(k)._1, s"anchor $k count")
      assert(math.abs(s - expected(k)._2) < 1e-6, s"anchor $k sum")
    }
  }

  test("q39_checksum: invariant under repartitioning and counts cover the table") {
    val a = Analytics.q39Checksum(spark, sf0001).collect()
    assert(a.map(_.getLong(1)).sum == Tables.lineitem(spark, sf0001).count())
    // order-independence: same fold over a differently-partitioned scan
    val shuffled = Tables.lineitem(spark, sf0001).repartition(13)
    shuffled.createOrReplaceTempView("lineitem_shuf")
    val b = spark.sql(
      """SELECT l_returnflag, count(1) n_rows,
        | cast(sum(cast(cast(conv(substring(md5(concat_ws('|',
        |   cast(l_orderkey as string), cast(l_linenumber as string),
        |   cast(l_partkey as string), cast(l_suppkey as string),
        |   l_returnflag, l_linestatus)), 1, 8), 16, 10) as bigint) as decimal(38,0)))
        |  % 2305843009213693951 as bigint) checksum
        |FROM lineitem_shuf GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("dd_semdedup: keeper precedes dropped, sims in threshold band, blocked by cell") {
    val rows = Dedup.ddSemdedup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(0), "keeper must be the lower id")
      val sim = r.getDouble(3)
      assert(sim >= 0.35 && sim <= 1.0 + 1e-9)
      assert(r.getLong(2) >= 1)
    }
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("dd_hot_spans: spans are word 3-grams present in >=3 distinct documents") {
    val rows = Dedup.ddHotSpans(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    val docs = Tables.documents(spark, sf0001).select("text").collect().map(_.getString(0))
    rows.take(5).foreach { r =>
      val span = r.getString(0)
      assert(span.split(' ').count(_.nonEmpty) == 3, s"not a 3-gram: '$span'")
      val nDocs = docs.count(t => t.split(' ').filter(_.nonEmpty)
        .sliding(3).exists(_.mkString(" ") == span))
      assert(nDocs.toLong == r.getLong(1), s"span '$span' doc count")
    }
  }

  test("txt_unigram_score: one row per doc; score is mean corpus tf over total") {
    val rows = TextAnalysis.txtUnigramScore(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty).toSeq)
    assert(rows.length == docs.count(_._2.nonEmpty))
    val tf = docs.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val corpusTotal = tf.values.sum
    val byId = docs.toMap
    rows.take(10).foreach { r =>
      val toks = byId(r.getLong(0))
      assert(r.getLong(1) == toks.length)
      val sumTf = toks.map(tf).sum
      assert(r.getLong(2) == sumTf)
      val expect = sumTf.toDouble / (toks.length.toDouble * corpusTotal.toDouble)
      assert(math.abs(r.getDouble(3) - expect) < 1e-12)
    }
  }

  test("pipe_pack_sequences: per-language offsets are a cumsum and flags consistent") {
    val rows = graft.operators.CorpusPipeline.pipePackSequences(spark, sf0001).collect()
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      var off = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) == off, s"doc ${r.getLong(1)} offset")
        val (dl, start) = (r.getLong(2), r.getLong(3))
        assert(r.getLong(4) == start / 128)
        assert(r.getLong(5) == (start + dl - 1) / 128)
        assert(r.getBoolean(6) == (r.getLong(4) != r.getLong(5)))
        off += dl
      }
    }
  }

  test("q40_lag_features: lag/gap/trailing-mean match a driver-side recompute") {
    val rows = Analytics.q40LagFeatures(spark, sf0001).collect()
    val byUser = rows.groupBy(_.getLong(1))
    byUser.values.foreach { g =>
      // rows arrive ordered by event_id within user (ts order == id order per oracle sort)
      var prev: Option[Double] = None
      val window = scala.collection.mutable.Queue.empty[Double]
      g.foreach { r =>
        val v = r.getDouble(2)
        if (prev.isEmpty) assert(r.isNullAt(3) && r.isNullAt(4))
        else assert(math.abs(r.getDouble(3) - prev.get) < 1e-9)
        window.enqueue(v)
        if (window.size > 3) window.dequeue()
        assert(math.abs(r.getDouble(5) - window.sum / window.size) < 1e-9,
          s"avg3 for event ${r.getLong(0)}")
        prev = Some(v)
      }
    }
  }

  test("q41_column_stats: one row per profiled column, counts cover the table") {
    val rows = Analytics.q41ColumnStats(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).sorted.sameElements(
      Seq("l_linestatus", "l_orderkey", "l_partkey", "l_returnflag")))
    val n = Tables.lineitem(spark, sf0001).count()
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == 0) // testdata has no nulls in these columns
      assert(r.getLong(3) >= 1 && r.getLong(3) <= n)
      assert(r.getString(4) <= r.getString(5) ||
        r.getString(0).endsWith("key")) // numeric min/max stringified
    }
  }

  test("q42_salted_join: result identical to the unsalted join") {
    val got = Analytics.q42SaltedJoin(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val li = Tables.lineitem(spark, sf0001)
    val part = Tables.part(spark, sf0001)
    val plain = li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.expr(
          "cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double)").as("rev"))
      .orderBy(col("p_brand")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == plain.toSeq)
  }

  test("q43_funnel: stage timestamps are strictly ordered and stages consistent") {
    val rows = Analytics.q43Funnel(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getInt(4)
      val ts = (1 to 3).map(i => if (r.isNullAt(i)) None
        else Some(r.getTimestamp(i)))
      assert(stage == 1 + ts(1).size + ts(2).size)
      if (ts(1).isDefined) assert(ts(0).get.before(ts(1).get))
      if (ts(2).isDefined) assert(ts(1).isDefined && ts(1).get.before(ts(2).get))
    }
  }

  test("txt_inverted_index: postings sorted, capped at 20, df matches the corpus") {
    val rows = TextAnalysis.txtInvertedIndex(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty).toSet)
    rows.foreach { r =>
      val p = r.getString(2).split(',').map(_.toLong).toSeq
      assert(r.getLong(1) >= 5 && p.length <= 20)
      assert(p.zip(p.tail).forall { case (a, b) => a < b }, "postings not sorted-unique")
    }
    rows.take(5).foreach { r =>
      val term = r.getString(0)
      val expect = docs.filter(_._2.contains(term)).map(_._1).sorted
      assert(r.getLong(1) == expect.length)
      assert(r.getString(2).split(',').map(_.toLong).toSeq == expect.take(20).toSeq)
    }
  }

  test("txt_oov_rate: rates bounded and recompute matches for sample docs") {
    val rows = TextAnalysis.txtOovRate(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty).toSeq)
    val tf = docs.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    val vocab = tf.filter(_._2 >= 5).keySet
    val byId = docs.toMap
    assert(rows.length == docs.count(_._2.nonEmpty))
    rows.take(10).foreach { r =>
      val toks = byId(r.getLong(0))
      val oov = toks.count(!vocab(_))
      assert(r.getLong(1) == toks.length && r.getLong(2) == oov)
      val rate = r.getDouble(3)
      assert(rate >= 0 && rate <= 1)
      assert(math.abs(rate - oov.toDouble / toks.length) < 1e-9)
    }
  }

  test("pipe_chunk_docs: chunks tile each doc with stride 48 and reproduce its text") {
    val rows = graft.operators.CorpusPipeline.pipeChunkDocs(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty).toSeq).toMap
    rows.groupBy(_.getLong(0)).foreach { case (id, g) =>
      val toks = docs(id)
      val sorted = g.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i && r.getLong(2) == 48L * i)
        val start = r.getLong(2).toInt
        val expect = toks.slice(start, start + 64)
        assert(r.getLong(3) == math.min(64, toks.length - start))
        assert(r.getString(4) == expect.mkString(" "), s"doc $id chunk $i text")
      }
      // coverage: last chunk starts within the doc
      assert(48L * (sorted.length - 1) < toks.length)
      assert(48L * sorted.length >= toks.length || sorted.length * 48 < toks.length + 48)
    }
  }

  test("q44_argmax: top_customer actually holds the max balance in its nation") {
    val rows = Analytics.q44Argmax(spark, sf0001).collect()
    val cust = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_name", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    rows.foreach { r =>
      val inNation = cust.filter(_._1 == r.getString(0))
      assert(r.getLong(1) == inNation.length)
      assert(r.getDouble(2) == inNation.map(_._3).max)
      assert(inNation.exists(c => c._2 == r.getString(3) && c._3 == r.getDouble(2)),
        s"${r.getString(3)} does not hold max in ${r.getString(0)}")
    }
  }

  test("q45_sliding_distinct: trailing-7-day counts match a driver recompute") {
    val rows = Analytics.q45SlidingDistinct(spark, sf0001).collect()
    val ev = Tables.events(spark, sf0001)
      .selectExpr("cast(to_date(ts) as string) d", "user_id").collect()
      .map(r => (java.time.LocalDate.parse(r.getString(0)), r.getLong(1)))
    val days = ev.map(_._1).distinct.sorted
    assert(rows.length == days.length)
    rows.foreach { r =>
      val day = java.time.LocalDate.parse(r.getDate(0).toString)
      val expect = ev.filter { case (d, _) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._2).distinct.length
      assert(r.getLong(1) == expect, s"day $day")
    }
  }

  test("dd_fuzzy_match: pairs share a brand and dist is the true edit distance") {
    val rows = Dedup.ddFuzzyMatch(spark, sf0001).collect()
    assert(rows.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(2))
      val d = lev(r.getString(3), r.getString(4))
      assert(d <= 4 && r.getLong(5) == d, s"dist mismatch for ${r.getString(3)}/${r.getString(4)}")
    }
  }

  test("mm_embed_stub: 3 ranked neighbors per query doc, scores in [-1,1] non-increasing") {
    val rows = graft.operators.Multimodal.mmEmbedStub(spark, sf0001).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byDoc.values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(1L to 3L))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      scores.foreach(s => assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
    }
  }

  test("txt_gopher: ratios bounded and keep flag consistent with its gates") {
    val rows = TextAnalysis.txtGopher(spark, sf0001).collect()
    assert(rows.length == Tables.documents(spark, sf0001).count())
    rows.foreach { r =>
      val (n, dup, topBg, mwl) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(dup >= 0 && dup < 1)
      assert(topBg > 0 && topBg <= 1)
      assert(mwl > 0)
      assert(r.getDouble(5) >= 0)
      val expectKeep = n >= 10 && n <= 1000 && dup <= 0.6 && topBg <= 0.2 &&
        mwl >= 2 && mwl <= 12
      assert(r.getBoolean(6) == expectKeep, s"doc ${r.getLong(0)} keep mismatch")
    }
  }
}
