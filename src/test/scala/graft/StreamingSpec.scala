package graft

import java.nio.file.Files

import graft.sinks.JdbcSink
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsStream() = {
    // stage the batch events table as a streaming file source
    val src = Files.createTempDirectory("stream_events")
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(src.toString)
    val schema = Tables.events(spark, sf0001).schema
    spark.readStream.schema(schema).parquet(src.toString)
  }

  /** Pin the file-source replay order of the two split directories by
    * setting EXPLICIT modification times (a strictly before b) instead
    * of sleeping between writes — FileStreamSource orders by mtime, and
    * on a coarse-mtime filesystem a 1.1 s sleep could still tie. */
  private def orderAthenB(dir: java.nio.file.Path): Unit = {
    val now = System.currentTimeMillis()
    def setAll(sub: String, t: Long): Unit = {
      val d = dir.resolve(sub)
      val walk = Files.walk(d) // Stream holds directory handles — close it
      try walk.forEach { p =>
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(t))
      } finally walk.close()
    }
    setAll("a", now - 60000)
    setAll("b", now)
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  test("streaming entropy gate is row-identical to the batch filter") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("entropy_stream")
    docs.write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
      .as[Streams.DocText]
    runToMemory(Streams.entropyGateStream(stream).toDF(), "entropy_stream_t")
    val streamed = spark.sql("select * from entropy_stream_t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))).toMap
    val batch = graft.operators.TextAnalysis.txtEntropyFilter(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))).toMap
    assert(streamed == batch,
      "in-flight entropy scores and flags must equal the batch operator row for row")
  }

  test("streaming reference-LM perplexity gate matches the batch filter on the snapshot corpus") {
    // write half: persist the per-(lang,term) reference LM lake
    val lake = Files.createTempDirectory("ref_lm_lake")
    Streams.refLmWrite(spark, sf0001, lake.toString)
    // stream the SAME corpus the snapshot was built from — txtDocPerplexity's
    // self-included reference makes the batch operator the exact oracle
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("ppl_stream")
    docs.write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
      .as[Streams.DocText]
    runToMemory(Streams.docPerplexityStream(stream, lake.toString).toDF(), "ppl_stream_t")
    val streamed = spark.sql("select * from ppl_stream_t").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    val batch = graft.operators.TextAnalysis.txtDocPerplexity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(streamed == batch,
      "stream-static scores and flags must equal the batch operator row for row")
    // snapshot semantics: a post-snapshot doc with OOV terms still scores
    // (cr=0 path); an unseen LANGUAGE is FLAGGED with a null score —
    // the unified flag-don't-skip OOD policy across all streaming gates
    import spark.implicits._
    val late = Seq(
      Streams.DocText(900001L, "en", "zzzunseen zzzunseen qqqnovel"),
      Streams.DocText(900002L, "xx", "no lm for this language")).toDS()
    docs.sparkSession.createDataFrame(late.toDF().rdd, late.toDF().schema)
      .write.mode("overwrite").parquet(src.toString + "_late")
    val lateStream = spark.readStream.schema(docs.schema)
      .parquet(src.toString + "_late").as[Streams.DocText]
    runToMemory(Streams.docPerplexityStream(lateStream, lake.toString).toDF(), "ppl_late_t")
    val lateRows = spark.sql("select * from ppl_late_t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.isNullAt(3), r.isNullAt(4),
        r.getBoolean(5)))).toMap
    assert(lateRows.keySet == Set(900001L, 900002L),
      "every doc gets a verdict row — OOD language included")
    val (_, nullNum1, nullSc1, flag1) = lateRows(900001L)
    assert(!nullNum1 && !nullSc1 && flag1,
      "an all-OOV doc in a KNOWN language scores and is flagged")
    val (nTok2, nullNum2, nullSc2, flag2) = lateRows(900002L)
    assert(nTok2 == 5L && nullNum2 && nullSc2 && flag2,
      "an OOD-language doc is flagged with null score AND numerator, never silently passed")
  }

  test("streaming KN-bigram perplexity gate matches the batch filter on the snapshot corpus") {
    val lake = Files.createTempDirectory("kn_lm_lake")
    Streams.knLmWrite(spark, sf0001, lake.toString)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("kn_stream")
    docs.write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
      .as[Streams.DocText]
    runToMemory(Streams.docKnPerplexityStream(stream, lake.toString).toDF(), "kn_stream_t")
    // on the snapshot corpus every bigram is known: n_known == n_bigrams
    // and (n_bigrams, kn_bits_num, bits_micro, flag) match batch rows
    val streamed = spark.sql("select * from kn_stream_t").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    streamed.values.foreach { case (_, n, known, _, _, _) =>
      assert(n == known, "zero OOV on the snapshot's own corpus")
    }
    val batch = graft.operators.TextAnalysis.txtDocKnPerplexity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(streamed == batch,
      "stream-static KN scores and flags must equal the batch operator row for row")
    // OOV semantics: unseen bigrams are counted, not scored; a doc with
    // zero known bigrams is flagged with no score
    import spark.implicits._
    val late = Seq(
      Streams.DocText(900101L, "en", "zzq1 zzq2 zzq3"),
      Streams.DocText(900102L, "en", "the " * 50)).toDS()
    late.toDF().write.mode("overwrite").parquet(src.toString + "_late")
    val lateStream = spark.readStream.schema(docs.schema)
      .parquet(src.toString + "_late").as[Streams.DocText]
    runToMemory(Streams.docKnPerplexityStream(lateStream, lake.toString).toDF(), "kn_late_t")
    val lateRows = spark.sql("select * from kn_late_t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.isNullAt(4),
        r.isNullAt(5), r.getBoolean(6)))).toMap
    val (n1, k1, nullNum1, null1, flag1) = lateRows(900101L)
    assert(n1 == 2L && k1 == 0L && nullNum1 && null1 && flag1,
      "an all-OOV doc carries no score (null numerator too) and is flagged")
    val (n2, k2, _, null2, _) = lateRows(900102L)
    assert(n2 == 49L, "every bigram occurrence is accounted")
    assert(null2 == (k2 == 0L), "a score exists iff some bigram is known")
  }

  test("streaming KN-trigram perplexity gate matches the batch filter on the snapshot corpus") {
    val lake = Files.createTempDirectory("kn3_lm_lake")
    Streams.kn3LmWrite(spark, sf0001, lake.toString)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("kn3_stream")
    docs.write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
      .as[Streams.DocText]
    runToMemory(Streams.docKn3PerplexityStream(stream, lake.toString).toDF(), "kn3_stream_t")
    // on the snapshot corpus every trigram is known: n_known == n_trigrams
    // and (n_trigrams, kn3_bits_num, bits_micro, flag) match batch rows
    val streamed = spark.sql("select * from kn3_stream_t").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    streamed.values.foreach { case (_, n, known, _, _, _) =>
      assert(n == known, "zero OOV on the snapshot's own corpus")
    }
    val batch = graft.operators.TextAnalysis.txtDocKn3Perplexity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(streamed == batch,
      "stream-static KN-trigram scores and flags must equal the batch operator row for row")
    // OOV + OOD-language semantics: unseen trigrams counted not scored;
    // zero-known and OOD-language docs flagged with null score (the
    // unified flag-don't-skip policy)
    import spark.implicits._
    val late = Seq(
      Streams.DocText(900201L, "en", "zzq1 zzq2 zzq3 zzq4"),
      Streams.DocText(900202L, "xx", "one two three four five")).toDS()
    late.toDF().write.mode("overwrite").parquet(src.toString + "_late")
    val lateStream = spark.readStream.schema(docs.schema)
      .parquet(src.toString + "_late").as[Streams.DocText]
    runToMemory(Streams.docKn3PerplexityStream(lateStream, lake.toString).toDF(), "kn3_late_t")
    val lateRows = spark.sql("select * from kn3_late_t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.isNullAt(4),
        r.isNullAt(5), r.getBoolean(6)))).toMap
    val (n1, k1, nullNum1, null1, flag1) = lateRows(900201L)
    assert(n1 == 2L && k1 == 0L && nullNum1 && null1 && flag1,
      "an all-OOV doc carries no score (null numerator too) and is flagged")
    val (n2, k2, nullNum2, null2, flag2) = lateRows(900202L)
    assert(n2 == 3L && k2 == 0L && nullNum2 && null2 && flag2,
      "an OOD-language doc is flagged with a null score, never skipped or passed")
  }

  test("streaming DSIR gate matches the batch importance weights on the snapshot corpus") {
    val lake = Files.createTempDirectory("dsir_lm_lake")
    Streams.dsirLmWrite(spark, sf0001, lake.toString)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("dsir_stream")
    docs.write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
      .as[Streams.DocText]
    runToMemory(Streams.docDsirStream(stream, lake.toString).toDF(), "dsir_stream_t")
    val streamed = spark.sql("select * from dsir_stream_t").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    val batch = graft.operators.TextAnalysis.txtDsirWeights(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(streamed == batch,
      "stream-static DSIR weights and flags must equal the batch operator row for row")
    // OOV-term / OOD-language semantics: a term neither LM has seen is
    // ZERO evidence (the doc still scores); an off-snapshot language
    // cannot be scored — emitted unselected with a null weight, never
    // dropped (flag-don't-skip)
    import spark.implicits._
    val late = Seq(
      Streams.DocText(910301L, "en", "zzq7 zzq8 zzq9"),
      Streams.DocText(910302L, "xx", "one two three")).toDS()
    late.toDF().write.mode("overwrite").parquet(src.toString + "_late")
    val lateStream = spark.readStream.schema(docs.schema)
      .parquet(src.toString + "_late").as[Streams.DocText]
    runToMemory(Streams.docDsirStream(lateStream, lake.toString).toDF(), "dsir_late_t")
    val lateRows = spark.sql("select * from dsir_late_t").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.isNullAt(4), r.getBoolean(5)))).toMap
    val (_, n1, w1, null1, sel1) = {
      val v = lateRows(910301L); (v._1, v._2, v._3, v._4, v._5)
    }
    // all-OOV doc in a known language: every term contributes 0, so
    // w_num is exactly the n·(lg(N_R+V) − lg(N_T+V)) correction — a
    // real (positive) score, and the doc is selectable
    assert(n1 == 3L && !null1 && w1.exists(_ > 0L) && sel1,
      "an all-OOV doc in a known language scores on the totals correction alone")
    val (_, n2, w2, null2, sel2) = {
      val v = lateRows(910302L); (v._1, v._2, v._3, v._4, v._5)
    }
    // r9: the numerator is null for OOD too — 0L would read as "exactly
    // zero bits of evidence" to a consumer aggregating w_num unchecked
    assert(n2 == 3L && w2.isEmpty && null2 && !sel2,
      "an OOD-language doc is emitted unselected with null weight AND numerator, never dropped")
  }

  test("streaming quality gate: one-pass three-signal verdicts reconcile with the batch funnel") {
    val uniLake = Files.createTempDirectory("q_ref_lake")
    val knLake = Files.createTempDirectory("q_kn_lake")
    Streams.refLmWrite(spark, sf0001, uniLake.toString)
    Streams.knLmWrite(spark, sf0001, knLake.toString)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("quality_stream")
    docs.write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
      .as[Streams.DocText]
    runToMemory(
      Streams.qualityGateStream(stream, uniLake.toString, knLake.toString).toDF(),
      "quality_stream_t")
    val streamed = spark.sql("select * from quality_stream_t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6)))).toMap
    // per-doc flags equal the batch component operators row for row
    val ent = graft.operators.TextAnalysis.txtEntropyFilter(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(6)))).toMap
    val uni = graft.operators.TextAnalysis.txtDocPerplexity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val kn = graft.operators.TextAnalysis.txtDocKnPerplexity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(streamed.keySet == ent.keySet, "one verdict per tokenizable doc")
    streamed.foreach { case (id, (n, low, hUni, hKn, keep)) =>
      val (nB, lowB) = ent(id)
      assert(n == nB && low == lowB, s"entropy parity for doc $id")
      assert(hUni == uni(id), s"unigram-ppl parity for doc $id")
      assert(hKn == kn.getOrElse(id, false), s"KN-ppl parity for doc $id")
      assert(keep == (n >= graft.operators.CorpusPipeline.MinDocTokens
        && !low && !hUni && !hKn), s"keep rule for doc $id")
    }
    // the streamed verdicts aggregate to the batch funnel's counts
    val funnel = graft.operators.CorpusPipeline.pipeQualityFunnel(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, sf0001).count()
    val vs = streamed.values.toSeq
    assert(funnel("docs_total") == total)
    assert(funnel("fail_length") ==
      (total - vs.size) + vs.count(_._1 < graft.operators.CorpusPipeline.MinDocTokens))
    assert(funnel("fail_low_entropy") == vs.count(_._2))
    assert(funnel("fail_unigram_ppl") == vs.count(_._3))
    assert(funnel("fail_kn_ppl") == vs.count(_._4))
    assert(funnel("kept") == vs.count(_._5))
  }

  test("streaming quality gate: off-snapshot language is flagged, not skipped or passed") {
    // the composite gate's OOD policy, pinned: a doc whose language has
    // no reference LM gets a verdict row with high_uni_ppl = true and
    // keep = false — same flag-don't-skip policy as the single-signal
    // gates (unified r8)
    val uniLake = Files.createTempDirectory("ood_ref_lake")
    val knLake = Files.createTempDirectory("ood_kn_lake")
    Streams.refLmWrite(spark, sf0001, uniLake.toString)
    Streams.knLmWrite(spark, sf0001, knLake.toString)
    import spark.implicits._
    // long enough to clear the length gate and repetitive-free so only
    // the OOD flags decide the verdict
    val text = (1 to 60).map(i => s"ood$i").mkString(" ")
    val late = Seq(Streams.DocText(910001L, "xx", text)).toDS()
    val src = Files.createTempDirectory("ood_docs")
    late.toDF().write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream.schema(late.toDF().schema).parquet(src.toString)
      .as[Streams.DocText]
    runToMemory(
      Streams.qualityGateStream(stream, uniLake.toString, knLake.toString).toDF(),
      "ood_gate_t")
    val rows = spark.sql("select * from ood_gate_t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(rows.keySet == Set(910001L), "the OOD-language doc gets exactly one verdict row")
    val (n, lowEnt, highUni, highKn, keep) = rows(910001L)
    assert(n == 60L, "token count still computed without an LM")
    assert(!lowEnt, "60 distinct tokens: the doc-local entropy signal is live and clean")
    assert(highUni, "no unigram LM for the language: flagged, not skipped")
    assert(highKn, "no KN bigrams known: fully out-of-distribution, flagged")
    assert(!keep, "an unscorable doc must never silently pass the gate")
  }

  test("streaming quality gate: exactly-once across a checkpointed restart") {
    val uniLake = Files.createTempDirectory("qr_ref_lake")
    val knLake = Files.createTempDirectory("qr_kn_lake")
    Streams.refLmWrite(spark, sf0001, uniLake.toString)
    Streams.knLmWrite(spark, sf0001, knLake.toString)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val firstHalf = docs.filter(col("doc_id") % 2 === 0)
    val secondHalf = docs.filter(col("doc_id") % 2 =!= 0)
    val src = Files.createTempDirectory("qr_src")
    val out = Files.createTempDirectory("qr_out").toString + "/data"
    val ckpt = Files.createTempDirectory("qr_ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(src.toString + "/*")
        .as[Streams.DocText]
      val q = Streams.qualityGateStream(stream, uniLake.toString, knLake.toString)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    firstHalf.write.mode("overwrite").parquet(src.toString + "/a")
    runOnce() // first incarnation: only the first half exists
    secondHalf.write.mode("overwrite").parquet(src.toString + "/b")
    runOnce() // restart from the checkpoint: must process ONLY the b files
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6))
    // exactly-once: every tokenizable doc verdicted exactly once across
    // the two incarnations, none duplicated, none dropped
    val expected = graft.operators.TextAnalysis.txtEntropyFilter(spark, sf0001)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rows.length == rows.map(_._1).distinct.length, "no doc verdicted twice")
    assert(rows.map(_._1).toSet == expected, "no doc dropped across the restart")
  }

  test("streaming DSIR gate: exactly-once and batch parity across a checkpointed restart") {
    val lake = Files.createTempDirectory("dr_dsir_lake")
    Streams.dsirLmWrite(spark, sf0001, lake.toString)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("dr_src")
    val out = Files.createTempDirectory("dr_out").toString + "/data"
    val ckpt = Files.createTempDirectory("dr_ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(src.toString + "/*")
        .as[Streams.DocText]
      val q = Streams.docDsirStream(stream, lake.toString)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(src.toString + "/a")
    runOnce() // first incarnation: only the even docs exist
    docs.filter(col("doc_id") % 2 =!= 0).write.mode("overwrite").parquet(src.toString + "/b")
    runOnce() // restart from the checkpoint: must process ONLY the b files
    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    val batch = graft.operators.TextAnalysis.txtDsirWeights(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(spark.read.parquet(out).count() == streamed.size,
      "no doc weighted twice across the restart")
    assert(streamed == batch,
      "weights across the two incarnations equal the batch operator row for row")
  }

  test("streaming edit gate: exactly-once and batch parity across a checkpointed restart") {
    val lake = Files.createTempDirectory("eg_lake")
    Streams.editLakeWrite(spark, sf0001, lake.toString)
    // the stream sees the NEW batch (the batch twin's doc_id >= 400 side)
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") >= 400)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("eg_src")
    val out = Files.createTempDirectory("eg_out").toString + "/data"
    val ckpt = Files.createTempDirectory("eg_ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(src.toString + "/*")
        .as[Streams.DocText]
      val q = Streams.editGateStream(stream, lake.toString)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(src.toString + "/a")
    runOnce() // first incarnation: only the even docs exist
    docs.filter(col("doc_id") % 2 =!= 0).write.mode("overwrite").parquet(src.toString + "/b")
    runOnce() // restart from the checkpoint: must process ONLY the b files
    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))).toMap
    val batch = graft.operators.Dedup.ddEditGate(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))).toMap
    assert(spark.read.parquet(out).count() == streamed.size,
      "no doc judged twice across the restart")
    assert(streamed == batch,
      "verdicts across the two incarnations equal the batch gate row for row")
    assert(streamed.valuesIterator.exists(_._4) && streamed.valuesIterator.exists(!_._4),
      "both verdict classes live in the fixture")
  }

  test("IVF-PQ serving lake: stream answers equal sim_ivfpq bit-for-bit across a checkpointed restart") {
    val lake = Files.createTempDirectory("ann_lake")
    Streams.ivfpqLakeWrite(spark, sf0001, lake.toString)
    val qdf = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val src = Files.createTempDirectory("ann_src")
    val out = Files.createTempDirectory("ann_out").toString + "/data"
    val ckpt = Files.createTempDirectory("ann_ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(qdf.schema).parquet(src.toString + "/*")
        .as[Streams.QueryVec]
      val q = Streams.ivfpqServeStream(stream, lake.toString)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    qdf.filter(col("q_id") === 0).write.mode("overwrite").parquet(src.toString + "/a")
    runOnce() // first incarnation: one query
    qdf.filter(col("q_id") > 0).write.mode("overwrite").parquet(src.toString + "/b")
    runOnce() // restart: must serve ONLY the two new queries
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val batch = graft.operators.Similarity.simIvfpq(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(spark.read.parquet(out).count() == streamed.size,
      "no query answered twice across the restart")
    assert(streamed == batch,
      "served top-k must equal the gated batch operator, adc_dist bit-for-bit")
    assert(streamed.nonEmpty && qdf.count() == 3)
  }

  test("streaming CDC ingest: exactly-once and batch parity across a checkpointed restart") {
    val lake = Files.createTempDirectory("cdc_lake")
    Streams.cdcLakeWrite(spark, sf0001, lake.toString)
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") >= 400)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("cdc_src")
    val out = Files.createTempDirectory("cdc_out").toString + "/data"
    val ckpt = Files.createTempDirectory("cdc_ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(src.toString + "/*")
        .as[Streams.DocText]
      val q = Streams.cdcIngestStream(stream, lake.toString)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(src.toString + "/a")
    runOnce() // first incarnation: only the even docs exist
    docs.filter(col("doc_id") % 2 =!= 0).write.mode("overwrite").parquet(src.toString + "/b")
    runOnce() // restart from the checkpoint: must process ONLY the b files
    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val batch = graft.operators.Dedup.ddCdcIngest(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(spark.read.parquet(out).count() == streamed.size,
      "no doc reported twice across the restart")
    assert(streamed == batch,
      "savings reports across the two incarnations equal the batch operator row for row")
  }

  test("streaming CDC ingest: flag-don't-drop — a NULL-text doc still yields a report row") {
    val lake = Files.createTempDirectory("cdcn_lake")
    Streams.cdcLakeWrite(spark, sf0001, lake.toString)
    val src = Files.createTempDirectory("cdcn_src")
    val out = Files.createTempDirectory("cdcn_out").toString + "/data"
    val ckpt = Files.createTempDirectory("cdcn_ckpt").toString
    val schema = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).schema
    Seq((9001L, "en", null: String), (9002L, "en", ""),
        (9003L, "en", "a real document body with several rolling-hash chunks in it"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(src.toString + "/a")
    val stream = spark.readStream.schema(schema).parquet(src.toString + "/*")
      .as[Streams.DocText]
    val q = Streams.cdcIngestStream(stream, lake.toString)
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(9001L, 9002L, 9003L),
      "every input doc must produce a report row — nothing silently dropped")
    val nullDoc = rows(9001L)
    assert(nullDoc.getLong(1) == 0L && nullDoc.getLong(3) == 0L,
      "null text reports zero chunks / zero bytes")
    assert(nullDoc.isNullAt(5),
      "saved_micro is NULL on zero bytes — the batch operator's div convention")
    assert(rows(9002L).isNullAt(5), "empty text: zero bytes => NULL ratio too")
    assert(!rows(9003L).isNullAt(5), "a real doc gets a real ratio")
  }

  test("streaming KN-trigram gate: exactly-once and batch parity across a checkpointed restart") {
    val lake = Files.createTempDirectory("k3r_lake")
    Streams.kn3LmWrite(spark, sf0001, lake.toString)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("k3r_src")
    val out = Files.createTempDirectory("k3r_out").toString + "/data"
    val ckpt = Files.createTempDirectory("k3r_ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(src.toString + "/*")
        .as[Streams.DocText]
      val q = Streams.docKn3PerplexityStream(stream, lake.toString)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(src.toString + "/a")
    runOnce() // first incarnation: only the even docs exist
    docs.filter(col("doc_id") % 2 =!= 0).write.mode("overwrite").parquet(src.toString + "/b")
    runOnce() // restart from the checkpoint: must process ONLY the b files
    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    // batch twin has no n_known column: on the snapshot corpus every
    // trigram is known, so n_known == n_trigrams (same mapping as the
    // single-incarnation parity spec)
    val batch = graft.operators.TextAnalysis.txtDocKn3Perplexity(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(spark.read.parquet(out).count() == streamed.size,
      "no doc scored twice across the restart")
    assert(streamed == batch,
      "scores across the two incarnations equal the batch operator row for row")
  }

  test("streaming ODNS ingest matches the batch reader") {
    val dir = Files.createTempDirectory("stream_odns")
    OdnsFixtures.writeArchive(dir, "tcp_scan_2026-08-01.csv.gz",
      OdnsFixtures.TcpHeader, OdnsFixtures.tcpRows(6))
    runToMemory(Streams.odnsStream(spark, "tcp", dir.toString + "/*.csv.gz"), "odns_stream")
    val got = spark.sql("select * from odns_stream")
    assert(got.count() == 6)
    assert(got.columns.toSeq == graft.sources.OdnsCsv.TableColumns)
    assert(got.filter(col("scan_date") === "2026-08-01").count() == 6)
  }

  test("watermarked tumbling counts equal the batch twin") {
    runToMemory(Streams.tumblingCounts(eventsStream()), "tumbling", OutputMode.Complete())
    val streamed = spark.sql("select hour, event_type, n, sum_value from tumbling")
      .collect().map(_.toString).sorted
    val batch = graft.operators.Analytics.q15TumblingAgg(spark, sf0001)
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }

  test("session windows cover all events with positive durations") {
    runToMemory(Streams.sessionWindows(eventsStream()), "sessions", OutputMode.Complete())
    val rows = spark.sql("select * from sessions").collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == 1000L)
    // session count should match the batch sessionizer
    val batchSessions = graft.operators.Analytics.q14Sessionize(spark, sf0001).count()
    assert(rows.length.toLong == batchSessions)
  }

  test("custom keyed state accumulates per-user running totals") {
    val events = Seq(
      Streams.UserEvent(1L, "click", 1.0), Streams.UserEvent(1L, "view", 2.5),
      Streams.UserEvent(2L, "click", 4.0)).toDS()
    // batch Dataset exercise of the same state function (update semantics)
    val out = Streams.userRunningTotals(events).collect()
      .map(t => t.user_id -> t).toMap
    assert(out(1L).n_events == 2 && math.abs(out(1L).total_value - 3.5) < 1e-9)
    assert(out(2L).n_events == 1)
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    // stage events twice -> every event_id appears in two files
    val src = Files.createTempDirectory("stream_dup")
    val ev = Tables.events(spark, sf0001)
    ev.write.mode("overwrite").parquet(src.toString + "/a")
    ev.write.mode("overwrite").parquet(src.toString + "/b")
    val stream = spark.readStream.schema(ev.schema)
      .parquet(src.toString + "/*")
    runToMemory(Streams.dedupByKey(stream, Seq("event_id")), "dedup_stream")
    assert(spark.sql("select * from dedup_stream").count() == 1000L)
    assert(spark.sql("select count(distinct event_id) from dedup_stream")
      .collect().head.getLong(0) == 1000L)
  }

  test("streaming near-dup dedup drops band-colliding docs, keeps distinct ones") {
    val src = Files.createTempDirectory("stream_neardup")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "2026-01-01 10:00:00"),
      (2L, "the quick brown fox jumps over the lazy dog", "2026-01-01 10:05:00"), // exact dup -> same bands
      (3L, "completely different words about spark shuffles and joins", "2026-01-01 10:10:00"),
      (4L, "another unrelated document mentioning parquet row groups", "2026-01-01 10:15:00"))
      .toDF("doc_id", "text", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    docs.write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream.schema(
      docs.schema).parquet(src.toString)
    runToMemory(Streams.dedupNearDup(stream), "neardup_stream")
    val kept = spark.sql("select doc_id from neardup_stream").collect().map(_.getLong(0)).sorted
    assert(kept.length == 3 && !(kept.contains(1L) && kept.contains(2L)),
      s"expected one of doc 1/2 dropped, kept: ${kept.mkString(",")}")
    assert(kept.contains(3L) && kept.contains(4L))
  }

  test("stream-stream interval join matches its batch twin") {
    runToMemory(Streams.purchaseErrorJoin(eventsStream()), "ss_join")
    val streamed = spark.sql("select * from ss_join").count()
    // batch twin of the same interval join
    val ev = Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    val batch = p.join(e, org.apache.spark.sql.functions.expr(
      "user_id = e_user AND e_ts >= p_ts - INTERVAL 1 HOUR AND e_ts < p_ts")).count()
    assert(streamed == batch && batch > 0)
  }

  test("stateful sessionizer closes sessions on gap, matches batch counts") {
    import org.apache.spark.sql.functions.unix_micros
    // batch-mode exercise of the state function: all events in one group
    // batch -> emitted rows are the CLOSED sessions; the last session per
    // user stays open in state
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Streams.SessionEvent]
    val closed = Streams.sessionizeStateful(ev).collect()
    val batchSessions = graft.operators.Analytics.q14Sessionize(spark, sf0001)
    val totalSessions = batchSessions.count()
    val nUsers = batchSessions.select("user_id").distinct().count()
    // closed sessions = all sessions minus the one still open per user
    assert(closed.length.toLong == totalSessions - nUsers)
    closed.foreach { s =>
      assert(s.end_us >= s.start_us && s.n_events >= 1)
    }
  }

  test("streaming debounce keep-set equals the batch q65 operator") {
    import org.apache.spark.sql.functions.unix_micros
    // batch-mode exercise of the state function: identical lag
    // semantics to the batch window formulation on the same events
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[Streams.TypedEvent]
    val kept = Streams.debounce(ev).collect()
    val streamCounts = kept.groupBy(e => (e.user_id, e.event_type))
      .view.mapValues(_.length.toLong).toMap
    val batch = graft.operators.Analytics.q65Debounce(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamCounts == batch,
      "stream and batch debounce must keep identical counts per key")
  }

  test("streaming running top-k: state carries across micro-batches and matches the batch operator") {
    import org.apache.spark.sql.functions.unix_micros
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("value"))
    // two parquet files -> two micro-batches (maxFilesPerTrigger=1):
    // the per-key top-k state must merge across them
    val dir = Files.createTempDirectory("topk_stream")
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(dir.toString + "/a")
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(dir.toString + "/b")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .as[Streams.ScoredEvent]
    runToMemory(Streams.runningTopK(stream).toDF(), "running_topk", OutputMode.Update())
    // memory sink in Update mode appends each trigger's snapshots:
    // the LAST snapshot per user is the final state
    val finalRows = spark.sql("select * from running_topk").collect()
      .zipWithIndex
      .groupBy(_._1.getLong(0))
      .map { case (u, rs) => u -> rs.maxBy(_._2)._1.getString(1) }
    val batch = org.apache.spark.sql.graft.TopK.perGroup(
        ev, Seq("user_id"), Seq(("value", true), ("event_id", false)), 3)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        u -> rs.sortBy(r => (-r.getDouble(2), r.getLong(1))).map(_.getLong(1)).mkString(",") }
    assert(finalRows == batch,
      "final streamed top-k state must equal the batch TopKPerGroup selection")
  }

  test("streaming weighted sample: final snapshot equals the batch bottom-k per source") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("source"), col("doc_id"), col("n_chars"),
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 10), 16, 10) as bigint)" +
          " div greatest(n_chars, 1)").as("priority"))
    val dir = Files.createTempDirectory("wsample_stream")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(dir.toString + "/a")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(dir.toString + "/b")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .as[Streams.DocArrival]
    runToMemory(Streams.runningWeightedSample(stream).toDF(), "running_wsample",
      OutputMode.Update())
    val finalRows = spark.sql("select * from running_wsample").collect()
      .zipWithIndex
      .groupBy(_._1.getString(0))
      .map { case (s, rs) => s -> rs.maxBy(_._2)._1.getString(1) }
    val batch = graft.operators.CorpusPipeline.pipeWeightedSample(spark, sf0001)
      .collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).mkString(",") }
    assert(finalRows == batch,
      "final streamed sample must equal the batch weighted bottom-k")
  }

  test("streaming KMV distinct: final snapshot bit-equals the batch sketch across micro-batches") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
    val dir = Files.createTempDirectory("kmv_stream")
    ev.filter(md5(col("h")).startsWith("0") || md5(col("h")).startsWith("1"))
      .coalesce(1).write.parquet(dir.toString + "/a")
    ev.filter(!(md5(col("h")).startsWith("0") || md5(col("h")).startsWith("1")))
      .coalesce(1).write.parquet(dir.toString + "/b")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .as[Streams.HashedEvent]
    runToMemory(Streams.runningKmvDistinct(stream).toDF(), "kmv_stream", OutputMode.Update())
    val streamed = spark.sql("select * from kmv_stream").collect()
      .zipWithIndex.groupBy(_._1.getString(0))
      .map { case (k, rs) => k -> rs.maxBy(_._2)._1.getDouble(1) }
    import org.apache.spark.sql.Encoders
    val batch = ev
      .as[(String, String)](Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .groupByKey(_._1)(Encoders.STRING)
      .mapValues(_._2)(Encoders.STRING)
      .agg(graft.functions.TypedAggs.kmvDistinct(64).name("est"))
      .collect().toMap
    assert(streamed == batch, "stream and batch KMV sketches must agree exactly")
  }

  test("update-mode aggregation upserts into Derby idempotently") {
    val dbDir = Files.createTempDirectory("derby").resolve("upsert_db")
    val target = JdbcSink.Target(s"jdbc:derby:$dbDir;create=true", "etype_counts")
    val conn = target.connection()
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE etype_counts (event_type VARCHAR(32) PRIMARY KEY, n BIGINT)")
      st.close()
    } finally conn.close()
    val counts = eventsStream().groupBy(col("event_type"))
      .agg(org.apache.spark.sql.functions.count(col("event_id")).as("n"))
    val ck = Files.createTempDirectory("ck_upsert").toString
    Streams.aggToJdbcUpsert(counts, target, Seq("event_type"), ck)
      .awaitTermination(120000)
    assert(JdbcSink.count(target) == 5) // one row per event type, not per batch
    // feeding the SAME data through a fresh stream re-upserts, row count stable
    val ck2 = Files.createTempDirectory("ck_upsert2").toString
    Streams.aggToJdbcUpsert(counts, target, Seq("event_type"), ck2)
      .awaitTermination(120000)
    assert(JdbcSink.count(target) == 5)
    // and values equal the batch truth
    val back = spark.read.format("jdbc")
      .option("url", target.url).option("dbtable", target.table).load()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Tables.events(spark, sf0001).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(back == truth)
  }

  test("foreachBatch JDBC sink lands micro-batches in Derby") {
    val dir = Files.createTempDirectory("stream_jdbc")
    OdnsFixtures.writeArchive(dir, "tcp_scan_2026-08-03.csv.gz",
      OdnsFixtures.TcpHeader, OdnsFixtures.tcpRows(5))
    val dbDir = Files.createTempDirectory("derby").resolve("stream_db")
    val target = JdbcSink.Target(s"jdbc:derby:$dbDir;create=true", "odns_stream_t")
    val ck = Files.createTempDirectory("ck").toString
    val q = Streams.toJdbc(
      Streams.odnsStream(spark, "tcp", dir.toString + "/*.csv.gz"), target, ck)
    q.awaitTermination(120000)
    assert(JdbcSink.count(target) == 5)
    // restart with same checkpoint: no new files -> no duplicates
    val q2 = Streams.toJdbc(
      Streams.odnsStream(spark, "tcp", dir.toString + "/*.csv.gz"), target, ck)
    q2.awaitTermination(120000)
    assert(JdbcSink.count(target) == 5)
  }

  test("streaming packing offsets: running per-lang state matches the batch prefix-sum placements") {
    val docs = Tables.documents(spark, sf0001)
      .withColumn("dl", expr("cast(size(filter(split(text, ' '), x -> x != '')) as bigint)"))
      .filter(col("dl") > 0)
      .select(col("lang"), col("doc_id"), col("dl"))
    // two micro-batches split by id range; the earlier-written file (low
    // ids) is the older mtime, so the file source replays in doc order —
    // the arrival-order contract the streaming form documents
    val dir = Files.createTempDirectory("pack_stream")
    docs.filter(col("doc_id") < 500).coalesce(1).write.parquet(dir.toString + "/a")
    docs.filter(col("doc_id") >= 500).coalesce(1).write.parquet(dir.toString + "/b")
    orderAthenB(dir)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .as[Streams.DocSize]
    runToMemory(Streams.packingOffsets(stream).toDF(), "pack_stream_t")
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1))
    def placement(r: org.apache.spark.sql.Row) = (r.getLong(3), r.getLong(4), r.getLong(5))
    val streamed = spark.sql("select * from pack_stream_t").collect()
      .map(r => key(r) -> placement(r)).toMap
    val batch = graft.operators.CorpusPipeline.pipePackSequences(spark, sf0001)
      .collect().map(r => key(r) -> placement(r)).toMap
    assert(streamed == batch,
      "streamed placements must be row-identical to the batch packing operator")
  }

  test("streaming EMA: O(1) per-priority state matches the batch lag window to the last integer") {
    val daily = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")).as("cents"))
      .select(col("priority"), expr("datediff(day, date'1970-01-01')").cast("long").as("day_epoch"),
        col("cents"))
    // split by day range into two files; older file = lower days, so the
    // file source replays in day order across micro-batches — the
    // arrival-order contract the twin documents (state carries across)
    val mid = daily.agg(expr("percentile_approx(day_epoch, 0.5)")).head().getLong(0)
    val dir = Files.createTempDirectory("ema_stream")
    daily.filter(col("day_epoch") < mid).coalesce(1).write.parquet(dir.toString + "/a")
    daily.filter(col("day_epoch") >= mid).coalesce(1).write.parquet(dir.toString + "/b")
    orderAthenB(dir)
    val stream = spark.readStream.schema(daily.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .as[Streams.DailyCents]
    runToMemory(Streams.emaStream(stream).toDF(), "ema_stream_t")
    val streamed = spark.sql("select * from ema_stream_t").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val batch = graft.operators.Analytics.q100Ema(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(streamed == batch,
      "streaming EMA must equal the batch 8-point rational EMA row for row")
  }

  test("streaming open-intervals count: O(1) state matches the batch running sum row for row") {
    val o = Tables.orders(spark, sf0001)
      .select(expr("datediff(to_date(o_orderdate), date'1970-01-01')").cast("long").as("sd"))
    val deltas = o.select($"sd".as("day_epoch"), lit(1L).as("delta"))
      .unionAll(o.select(($"sd" + 30).as("day_epoch"), lit(-1L).as("delta")))
    // split by day range; the older file holds the earlier days, so the
    // file source replays day-ordered batches that never split a day —
    // the twin's arrival contract
    val mid = deltas.agg(expr("percentile_approx(day_epoch, 0.5)")).head().getLong(0)
    val dir = Files.createTempDirectory("open_stream")
    deltas.filter($"day_epoch" < mid).coalesce(1).write.parquet(dir.toString + "/a")
    deltas.filter($"day_epoch" >= mid).coalesce(1).write.parquet(dir.toString + "/b")
    orderAthenB(dir)
    val stream = spark.readStream.schema(deltas.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .as[Streams.DayDelta]
    runToMemory(Streams.openIntervalsStream(stream).toDF(), "open_stream_t")
    val streamed = spark.sql("select * from open_stream_t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = graft.operators.Analytics.q147OpenOrders(spark, sf0001).collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(streamed == batch,
      "streamed running open count must equal the batch prefix sum row for row")
  }

  test("streaming SPC accumulator: O(1) state final snapshot matches the batch control chart") {
    val daily = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")).as("cents"))
      .select(col("priority"),
        expr("datediff(day, date'1970-01-01')").cast("long").as("day_epoch"), col("cents"))
    val mid = daily.agg(expr("percentile_approx(day_epoch, 0.5)")).head().getLong(0)
    val dir = Files.createTempDirectory("spc_stream")
    daily.filter(col("day_epoch") < mid).coalesce(1).write.parquet(dir.toString + "/a")
    daily.filter(col("day_epoch") >= mid).coalesce(1).write.parquet(dir.toString + "/b")
    orderAthenB(dir)
    val stream = spark.readStream.schema(daily.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .as[Streams.DailyCents]
    runToMemory(Streams.controlChartStream(stream).toDF(), "spc_stream_t",
      OutputMode.Update)
    // last snapshot per priority = final accumulated state
    val streamed = spark.sql(
      "select priority, n_mr, sum_mr, max_mr from (select *, row_number() over " +
        "(partition by priority order by n_mr desc) rn from spc_stream_t) where rn = 1")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = graft.operators.Analytics.q138ControlChart(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(streamed == batch,
      "final streamed MR sufficient statistics must equal the batch control chart")
  }

  test("streaming MASE accumulators: O(1) state final snapshot matches the batch q186 sums") {
    val daily = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")).as("cents"))
      .select(col("priority"),
        expr("datediff(day, date'1970-01-01')").cast("long").as("day_epoch"), col("cents"))
    val mid = daily.agg(expr("percentile_approx(day_epoch, 0.5)")).head().getLong(0)
    val dir = Files.createTempDirectory("mase_stream")
    daily.filter(col("day_epoch") < mid).coalesce(1).write.parquet(dir.toString + "/a")
    daily.filter(col("day_epoch") >= mid).coalesce(1).write.parquet(dir.toString + "/b")
    orderAthenB(dir)
    val stream = spark.readStream.schema(daily.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .as[Streams.DailyCents]
    runToMemory(Streams.maseStream(stream).toDF(), "mase_stream_t",
      OutputMode.Update)
    val streamed = spark.sql(
      "select priority, n_eval, sae_cents, n_naive, sad_cents from (select *," +
        " row_number() over (partition by priority order by n_eval desc) rn" +
        " from mase_stream_t) where rn = 1")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val batch = graft.operators.Analytics.q186Mase(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(streamed == batch,
      "final streamed MASE sufficient statistics must equal the batch operator's sums")
  }

  test("streaming Page-Hinkley monitor: final snapshot matches the batch detector") {
    val daily = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")).as("cents"))
      .select(col("priority"),
        expr("datediff(day, date'1970-01-01')").cast("long").as("day_epoch"), col("cents"))
    val mid = daily.agg(expr("percentile_approx(day_epoch, 0.5)")).head().getLong(0)
    val dir = Files.createTempDirectory("ph_stream")
    daily.filter(col("day_epoch") < mid).coalesce(1).write.parquet(dir.toString + "/a")
    daily.filter(col("day_epoch") >= mid).coalesce(1).write.parquet(dir.toString + "/b")
    orderAthenB(dir)
    val stream = spark.readStream.schema(daily.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .as[Streams.DailyCents]
    runToMemory(Streams.pageHinkleyStream(stream).toDF(), "ph_stream_t",
      OutputMode.Update)
    val streamed = spark.sql(
      "select priority, n_days, m_end, m_min, ph_peak, peak_day_epoch from (select *," +
        " row_number() over (partition by priority order by n_days desc) rn" +
        " from ph_stream_t) where rn = 1")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val batch = graft.operators.Analytics.q166PageHinkley(spark, sf0001)
      .select(col("o_orderpriority"), col("n_days"), col("m_end"),
        col("m_min"), col("ph_peak"),
        expr("datediff(peak_day, date'1970-01-01')").cast("long"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(streamed == batch,
      "final streamed Page-Hinkley state must equal the batch detector row for row")
  }

  test("streaming Page-Hinkley monitor: state survives a checkpointed restart") {
    // Order-dependent detector, so the split is BY DAY (first half of
    // the calendar in incarnation 1, second half after the restart) —
    // the day-ordered arrival contract holds across the checkpoint
    // boundary exactly as it would for a live daily feed.
    val daily = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")).as("cents"))
      .select(col("priority"),
        expr("datediff(day, date'1970-01-01')").cast("long").as("day_epoch"), col("cents"))
    val mid = daily.agg(expr("percentile_approx(day_epoch, 0.5)")).head().getLong(0)
    val src = Files.createTempDirectory("ph_r_src")
    val out = Files.createTempDirectory("ph_r_out").toString + "/data"
    val ckpt = Files.createTempDirectory("ph_r_ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(daily.schema).parquet(src.toString + "/*")
        .as[Streams.DailyCents]
      val q = Streams.pageHinkleyStream(stream)
        .toDF().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    daily.filter(col("day_epoch") < mid).write.mode("overwrite").parquet(src.toString + "/a")
    runOnce() // first incarnation sees the early half of the calendar
    daily.filter(col("day_epoch") >= mid).write.mode("overwrite").parquet(src.toString + "/b")
    runOnce() // restart: the six-long accumulator must resume, not reset
    val finalRows = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    val batch = graft.operators.Analytics.q166PageHinkley(spark, sf0001)
      .select(col("o_orderpriority"), col("n_days"), col("m_end"),
        col("m_min"), col("ph_peak"),
        expr("datediff(peak_day, date'1970-01-01')").cast("long"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    batch.foreach { case (prio, (n, mEnd, mMin, phPeak, peakDay)) =>
      val (_, gotN, gotM, gotMin, gotPeak, gotDay) = finalRows(prio)
      assert(gotN == n && gotM == mEnd && gotMin == mMin &&
        gotPeak == phPeak && gotDay == peakDay,
        s"priority $prio: post-restart Page-Hinkley state must equal the batch detector")
    }
  }

  test("streaming PSI drift monitor: final snapshot matches the batch PSI on the reference corpus") {
    val lake = Files.createTempDirectory("drift_lake")
    Streams.driftLmWrite(spark, sf0001, lake.toString)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"), col("source"))
    val dir = Files.createTempDirectory("drift_stream")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(dir.toString + "/a")
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.parquet(dir.toString + "/b")
    orderAthenB(dir)
    import spark.implicits._
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*")
      .select(col("doc_id"), col("lang"), col("text"), col("source"))
      .as[(Long, String, String, String)]
      .map(r => Streams.SourcedDoc(r._1, r._4, r._3))
    runToMemory(Streams.sourceDriftStream(stream, lake.toString).toDF(),
      "drift_stream_t", OutputMode.Update)
    // last snapshot per source = the fully-accumulated state
    val streamed = spark.sql(
      "select source, n_s, n_off, psi_num, psi_micro from (select *, row_number() over " +
        "(partition by source order by n_s desc) rn from drift_stream_t) where rn = 1")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))))
      .toMap
    val batch = graft.operators.TextAnalysis.pipeSourceDrift(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), 0L, r.getString(4), r.getLong(5)))).toMap
    assert(streamed == batch,
      "running PSI over the reference's own corpus must land exactly on the batch PSI")
  }

  test("streaming PSI drift monitor: state survives a checkpointed restart") {
    val lake = Files.createTempDirectory("drift_lake3")
    Streams.driftLmWrite(spark, sf0001, lake.toString)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    import spark.implicits._
    val src = Files.createTempDirectory("drift_r_src")
    val out = Files.createTempDirectory("drift_r_out").toString + "/data"
    val ckpt = Files.createTempDirectory("drift_r_ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(src.toString + "/*")
        .as[Streams.SourcedDoc]
      // mapGroupsWithState requires Update mode → foreachBatch appends
      // each trigger's per-source snapshot rows; the LAST (max n_s)
      // row per source is the live monitor value
      val q = Streams.sourceDriftStream(stream, lake.toString)
        .toDF().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(src.toString + "/a")
    runOnce() // first incarnation sees half the corpus
    docs.filter(col("doc_id") % 2 =!= 0).write.mode("overwrite").parquet(src.toString + "/b")
    runOnce() // restart: retained bucket counts must resume, not reset
    val finalRows = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    val batch = graft.operators.TextAnalysis.pipeSourceDrift(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(4), r.getLong(5)))).toMap
    batch.foreach { case (srcName, (nS, num, micro)) =>
      val (_, gotN, gotNum, gotMicro) = finalRows(srcName)
      assert(gotN == nS && gotNum == num && gotMicro == micro,
        s"source $srcName: post-restart running PSI must equal the batch PSI")
    }
  }

  test("streaming PSI drift monitor: off-reference buckets are counted, not scored") {
    val lake = Files.createTempDirectory("drift_lake2")
    Streams.driftLmWrite(spark, sf0001, lake.toString)
    import spark.implicits._
    // one doc far longer than anything in the reference corpus: its
    // 32-token bucket cannot exist in the lake
    val giant = (1 to 5000).map(i => s"w$i").mkString(" ")
    val late = Seq(Streams.SourcedDoc(980001L, "srcX", giant),
      Streams.SourcedDoc(980002L, "srcX", "alpha beta gamma delta")).toDS()
    val dir = Files.createTempDirectory("drift_late")
    late.toDF().write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(late.toDF().schema).parquet(dir.toString)
      .as[Streams.SourcedDoc]
    runToMemory(Streams.sourceDriftStream(stream, lake.toString).toDF(),
      "drift_late_t", OutputMode.Update)
    val rows = spark.sql("select * from drift_late_t").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (nS, nOff) = rows("srcX")
    assert(nS == 2L && nOff == 1L,
      "the off-support doc is counted in n_s and surfaced in n_off, never dropped")
  }

  test("streaming dup-span gate: has_dup subset row-identical to the batch ExactSubstr cut-list; clean docs emitted") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val src = Files.createTempDirectory("dupspan_stream")
    val lake = Files.createTempDirectory("dupspan_lake")
    docs.write.mode("overwrite").parquet(src.toString)
    Streams.dupGramLakeWrite(spark, sf0001, lake.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(src.toString)
      .as[Streams.DocText]
    runToMemory(Streams.dupSpanGateStream(stream, lake.toString).toDF(), "dupspan_t")
    val streamed = spark.sql("select * from dupspan_t where has_dup").collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_spans"),
        r.getAs[Long]("dup_token_span"), r.getAs[Long]("longest_span"),
        r.getAs[Long]("n_dup_grams")))).toMap
    val batch = graft.operators.Dedup.ddDupSpans(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_spans"),
        r.getAs[Long]("dup_token_span"), r.getAs[Long]("longest_span"),
        r.getAs[Long]("n_dup_grams")))).toMap
    assert(streamed == batch,
      "in-flight dup spans must equal the batch cut-list row for row on the lake's own corpus")
    // flag-don't-drop: every doc long enough to carry a gram is emitted
    val emitted = spark.sql("select count(*) from dupspan_t").collect().head.getLong(0)
    val eligible = docs.collect().count(
      _.getString(2).split(' ').count(_.nonEmpty) >= 10)
    assert(emitted == eligible,
      s"clean docs must be emitted with has_dup=false: $emitted of $eligible")
  }
}
