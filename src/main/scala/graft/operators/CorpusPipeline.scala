package graft.operators

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline — the flagship "switch
  * your corpus job to this engine" query: normalize → length/quality
  * gate → exact dedup (keep smallest doc_id) in ONE declarative plan.
  *
  * Catalyst fuses the normalize+gate projections into the scan, so the
  * only shuffle before the output sort is the dedup window on the
  * content hash — at 100 TB the pipeline is one pass over the corpus
  * plus one hash-keyed exchange, the same shape production cleaning
  * jobs (C4, RefinedWeb, FineWeb) use. */
object CorpusPipeline {

  /** Min doc length (tokens) for the quality tier — the verdict's
    * bit-4 gate and the funnel's length stage share THIS definition,
    * and SparkEntry interpolates it into both DuckDB oracles: one
    * number, four consumers, zero drift. */
  val MinDocTokens: Int = 16

  /** Exclusive running sum of `valCol` per `keyCol` along `orderCols`,
    * WITHOUT a per-key serial window. `Window.partitionBy(key)` funnels
    * each key through ONE task — with a 60%-English corpus the dominant
    * language serializes the whole packing stage at 100 TB. Instead, the
    * classic two-phase distributed prefix sum:
    *
    *   1. coarsen the ordering into `bucket` — a DETERMINISTIC pure
    *      function of row values, monotone non-decreasing along
    *      `orderCols` (e.g. [[equiWidthBucket]]);
    *   2. per-(key, bucket) subtotals → a small table whose own cumsum
    *      gives each bucket's starting offset;
    *   3. broadcast the offsets back and cumsum WITHIN (key, bucket) —
    *      the window parallelism is populated buckets × keys, never the
    *      key count.
    *
    * The result is bit-identical to the serial window (exact integer
    * sums, no reordering).
    *
    * Why a caller-supplied bucket and not `spark_partition_id()` after
    * `repartitionByRange` (the textbook formulation): Spark may
    * re-execute this frame once per consuming branch (subtotals vs the
    * final join), and the range partitioner re-SAMPLES its boundaries
    * per execution with the RDD id as seed — when exchange reuse fails
    * (column pruning diverges the two subtrees), the two executions
    * assign rows to DIFFERENT partitions and the offsets silently
    * misalign (observed: nondeterministic off-by-a-partition cumsums).
    * A bucket computed from row values alone cannot diverge, no matter
    * how many times Catalyst re-executes or how AQE re-plans.
    *
    * CONTRACT: the bucket expression must never evaluate to NULL — the
    * offsets join is an equi-join on (key, bucket), and a null bucket
    * would silently DROP the row where the serial window would keep it
    * (nulls-first). Current call sites derive buckets from non-null
    * arithmetic; preserve that when adding callers. */
  private[graft] def prefixSumExclusive(df: DataFrame, keyCol: String,
      orderCols: Seq[Column], valCol: String, outCol: String,
      bucket: Column): DataFrame =
    prefixSumsExclusive(df, keyCol, orderCols, Seq(valCol -> outCol), bucket)

  /** Multi-column form of [[prefixSumExclusive]] — N exclusive running
    * sums along the SAME (key, ordering, bucket) in ONE two-phase pass:
    * one per-(key, bucket) subtotal aggregate carrying every value
    * column, one offsets window, one within-bucket window whose N sum
    * expressions share the single Window node. The r13 shape chained
    * the single-column helper (q205/q209 ran the whole
    * aggregate+window+join machinery three times over the same frame);
    * bit-identical outputs, N× less prefix machinery (r14, guide §2.4:
    * operations keyed the same way share one exchange). */
  private[graft] def prefixSumsExclusive(df: DataFrame, keyCol: String,
      orderCols: Seq[Column], valOuts: Seq[(String, String)],
      bucket: Column): DataFrame = {
    val b = df.withColumn("_bkt", bucket)
    val wOff = Window.partitionBy(col(keyCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val subAggs = valOuts.map { case (v, _) => sum(col(v)).as(s"_psum_$v") }
    val offsets = valOuts.foldLeft(
        b.groupBy(col(keyCol), col("_bkt")).agg(subAggs.head, subAggs.tail: _*)) {
        case (d, (v, _)) =>
          d.withColumn(s"_off_$v",
            coalesce(sum(col(s"_psum_$v")).over(wOff), lit(0L)))
      }
      .select((col(keyCol) +: col("_bkt") +:
        valOuts.map { case (v, _) => col(s"_off_$v") }): _*)
    val wIn = Window.partitionBy(col(keyCol), col("_bkt")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    valOuts.foldLeft(b.join(broadcast(offsets), Seq(keyCol, "_bkt"))) {
        case (d, (v, out)) =>
          d.withColumn(out,
            coalesce(sum(col(v)).over(wIn), lit(0L)) + col(s"_off_$v"))
      }
      .drop(("_bkt" +: valOuts.map { case (v, _) => s"_off_$v" }): _*)
  }

  /** Exclusive running MAX per key along `orderCols` — the prefix-max
    * sibling of [[prefixSumExclusive]] (max is associative, so the
    * same two-phase bucket decomposition applies; `greatest` skips
    * nulls, so the first row of a key is NULL exactly like the serial
    * `max().over(rowsBetween(unboundedPreceding, -1))`). Same bucket
    * contract: deterministic pure row data, monotone along the
    * ordering. */
  private[graft] def prefixMaxExclusive(df: DataFrame, keyCol: String,
      orderCols: Seq[Column], valCol: String, outCol: String,
      bucket: Column): DataFrame = {
    val b = df.withColumn("_bkt", bucket)
    val wOff = Window.partitionBy(col(keyCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy(col(keyCol), col("_bkt"))
      .agg(max(col(valCol)).as("_pmax"))
      .withColumn("_off", max(col("_pmax")).over(wOff))
      .select(col(keyCol), col("_bkt"), col("_off"))
    val wIn = Window.partitionBy(col(keyCol), col("_bkt")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(broadcast(offsets), Seq(keyCol, "_bkt"))
      .withColumn(outCol, greatest(max(col(valCol)).over(wIn), col("_off")))
      .drop("_bkt", "_pmax", "_off")
  }

  /** Equi-width bucket id over a LONG column for [[prefixSumExclusive]]:
    * ((v − lo)·n) div (hi − lo + 1) ∈ [0, n) — exact integer
    * arithmetic, deterministic, monotone. lo/hi are collected once up
    * front: the same boundary-planning pass a range partitioner runs,
    * minus the execution-dependent sampling. Balanced when the column
    * is roughly uniform over its span (dense ids, prices); a skewed
    * column only costs parallelism, never correctness. */
  private[graft] def equiWidthBucket(df: DataFrame, colName: String,
      n: Int = 64): Column = {
    val r = df.agg(min(col(colName).cast("long")), max(col(colName).cast("long"))).head()
    if (r.isNullAt(0)) lit(0L)
    else {
      val lo = r.getLong(0); val hi = r.getLong(1)
      // subtractExact: a span past Long.MaxValue would WRAP NEGATIVE,
      // trivially pass a plain hi-lo check, and yield non-monotone
      // buckets (silently wrong cumsums) — fail loudly instead
      val span = Math.subtractExact(hi, lo)
      require(span < Long.MaxValue / n, s"equiWidthBucket: span of $colName too wide")
      expr(s"(($colName - $lo) * $n) div ($span + 1)")
    }
  }

  def pipeCleanCorpus(spark: SparkSession, dir: String,
      minTokens: Int = 10): DataFrame = {
    val byHash = Window.partitionBy(col("clean_md5"))
    Tables.documents(spark, dir)
      .withColumn("clean", expr(
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' '))"))
      .withColumn("n_tokens", expr(
        "cast(size(filter(split(clean, ' '), x -> x != '')) as bigint)"))
      .filter(col("n_tokens") >= minTokens)
      .withColumn("clean_md5", md5(col("clean")))
      .withColumn("rn", row_number().over(byHash.orderBy(col("doc_id"))))
      .withColumn("n_dups", count(lit(1)).over(byHash))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("clean_md5"), col("n_tokens"), col("n_dups"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing — the batch-prep step that concatenates tokenized
    * documents into fixed-length training sequences (seq_len tokens)
    * and reports, per document, which packs it lands in and whether it
    * straddles a pack boundary. Packing streams are per-language
    * (deterministic doc_id order within each); the running offset is
    * the two-phase [[prefixSumExclusive]], so the dominant language
    * never serializes onto one task — parallelism tracks the partition
    * count at any corpus size. */
  /** RAG-style document chunking: fixed-size token windows (64 tokens,
    * stride 48 → 16-token overlap) with byte-free token offsets, chunk
    * ids, and the re-joined chunk text. Pure map + generate per row —
    * zero shuffles; chunk boundaries never cross documents so the op
    * parallelizes embarrassingly at any scale. The trailing partial
    * window is kept (standard for retrieval corpora). */
  def pipeChunkDocs(spark: SparkSession, dir: String,
      chunkLen: Int = 64, stride: Int = 48): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", graft.functions.TextOps.tokens("text"))
      .withColumn("dl", expr("cast(size(toks) as bigint)"))
      .filter(col("dl") > 0)
      .select(col("doc_id"), col("dl"), col("toks"),
        posexplode(expr(s"sequence(0L, dl - 1, $stride)")).as(Seq("chunk_idx", "start_tok")))
      .withColumn("chunk_text",
        expr(s"concat_ws(' ', slice(toks, cast(start_tok + 1 as int), $chunkLen))"))
      .withColumn("n_toks", expr(s"least(cast($chunkLen as bigint), dl - start_tok)"))
      .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        col("start_tok"), col("n_toks"), col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  def pipePackSequences(spark: SparkSession, dir: String,
      seqLen: Int = 128): DataFrame = {
    val sized = Tables.documents(spark, dir)
      .withColumn("dl", expr(
        "cast(size(filter(split(text, ' '), x -> x != '')) as bigint)"))
      .filter(col("dl") > 0)
    // bucket bounds from the RAW scan: bounding the tokenized frame
    // would run the split/size projection a third time just for min/max
    prefixSumExclusive(sized, "lang", Seq(col("doc_id")), "dl", "start_off",
        equiWidthBucket(Tables.documents(spark, dir), "doc_id"))
      // integer `div`: exact for every seqLen (IEEE `/`-then-cast is only
      // exact for powers of two below 2^53)
      .select(col("lang"), col("doc_id"), col("dl"), col("start_off"),
        expr(s"start_off div $seqLen").as("pack_first"),
        expr(s"(start_off + dl - 1) div $seqLen").as("pack_last"),
        expr(s"start_off div $seqLen != (start_off + dl - 1) div $seqLen")
          .as("spans_boundary"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Dataset mixing: per-language quota downsampling (the "rebalance
    * the corpus so English doesn't drown everything" pass every
    * multilingual training mix runs). Each doc is kept with
    * probability min(1, cap/|lang|) via a DETERMINISTIC md5-derived
    * uniform, so the sample is reproducible across runs, engines and
    * partitionings. The keep test is exact integer arithmetic —
    * u · |lang| < cap · 16¹⁰ in DECIMAL(38,0) — never a float
    * threshold that could disagree between engines. Language counts
    * are a tiny broadcast; the filter is map-side: at 100 TB this is
    * one pass over the corpus, zero shuffles of the payload. */
  /** T5-style span-corruption LAYOUT: deterministic masked-span
    * placement per document — every 10th token position starts a
    * 3-token span when the doc's md5-derived offset selects it, spans
    * clipped to the doc, emitted as (doc_id, span_id, start, len,
    * sentinel_id). The selection is pure integer arithmetic on the
    * doc hash (reproducible across engines/partitionings — the
    * property a training job needs to regenerate identical data).
    * One map-side projection + explode: no shuffle before the output
    * sort at any scale. */
  def pipeSpanCorruption(spark: SparkSession, dir: String,
      every: Int = 10, spanLen: Int = 3): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("dl", expr(
        "cast(size(filter(split(text, ' '), x -> x != '')) as bigint)"))
      .filter(col("dl") >= every)
      // deterministic per-doc phase in [0, every)
      .withColumn("phase", expr(
        s"cast(conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10) as bigint) % $every"))
      .select(col("doc_id"), col("dl"), col("phase"),
        posexplode(expr(s"sequence(phase, dl - 1, $every)")).as(Seq("span_id", "start_tok")))
      .withColumn("span_len",
        least(lit(spanLen.toLong), col("dl") - col("start_tok")))
      .select(col("doc_id"), col("span_id").cast("bigint").as("span_id"),
        col("start_tok"), col("span_len"),
        (lit(32000L) + col("span_id")).as("sentinel_id"))
      .orderBy(col("doc_id"), col("span_id"))

  /** SFT chat-template rendering: each document becomes an
    * instruction-tuning example — a deterministic prompt derived from
    * its metadata, the text as the response, rendered with
    * system/user/assistant markers, clipped to a character budget,
    * and the LOSS-MASK OFFSET (first character of the assistant span,
    * where training loss starts) emitted alongside. Everything is
    * string concat + length arithmetic: a pure projection that fuses
    * into the scan, zero shuffle at corpus scale. */
  def pipeSftRender(spark: SparkSession, dir: String,
      maxChars: Int = 600): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("prompt",
        concat(lit("Summarize the following "), col("lang"),
          lit(" document from "), col("source"), lit(":")))
      .withColumn("header",
        concat(lit("<|system|>You are a helpful assistant.<|user|>"),
          col("prompt"), lit("<|assistant|>")))
      .withColumn("loss_start_char", length(col("header")).cast("bigint"))
      .withColumn("rendered",
        expr(s"substring(concat(header, text), 1, $maxChars)"))
      .select(col("doc_id"), col("rendered"), col("loss_start_char"),
        length(col("rendered")).cast("bigint").as("n_chars"),
        (length(col("rendered")) < length(concat(col("header"), col("text"))))
          .cast("int").as("clipped"))
      .orderBy(col("doc_id"))

  /** Quality-gate funnel report — the observability table a cleaning
    * pipeline publishes: per Gopher gate, how many docs fail it, plus
    * the survivor count. One aggregate over the per-doc gate metrics
    * (computed map-side by [[TextAnalysis.txtGopher]]'s projections):
    * the report costs a single pass + a 7-row combine at any corpus
    * size, and it is what makes a gate-threshold change reviewable
    * before it ships. */
  def pipeQualityReport(spark: SparkSession, dir: String): DataFrame = {
    val g = TextAnalysis.txtGopher(spark, dir)
    g.agg(
      count(lit(1)).as("n_docs"),
      sum(expr("if(n_tokens < 10 OR n_tokens > 1000, 1, 0)")).as("fail_len"),
      sum(expr("if(dup_word_frac > 0.6, 1, 0)")).as("fail_dup"),
      sum(expr("if(top_bigram_frac > 0.2, 1, 0)")).as("fail_bigram"),
      sum(expr("if(mean_word_len < 2 OR mean_word_len > 12, 1, 0)")).as("fail_wordlen"),
      sum(expr("if(keep, 1, 0)")).as("n_kept"))
      .selectExpr(
        """stack(6,
          | 'docs_total',    n_docs,
          | 'fail_length',   fail_len,
          | 'fail_dup_words',fail_dup,
          | 'fail_top_bigram', fail_bigram,
          | 'fail_word_len', fail_wordlen,
          | 'kept',          n_kept)
          | AS (gate, n)""".stripMargin)
      .orderBy(col("gate"))
  }

  /** Entropy-tier quality FUNNEL — [[pipeQualityReport]]'s counting
    * report upgraded to the round-6/7 information-theoretic gates,
    * applied in sequence (the order a production cleaner runs them,
    * cheapest first): length → per-doc entropy (txtEntropyFilter) →
    * unigram reference-LM perplexity (txtDocPerplexity) → KN-BIGRAM
    * reference-LM perplexity (txtDocKnPerplexity). Emits each gate's
    * MARGINAL failure count over all docs plus the CUMULATIVE
    * survivor counts after each stage ("kept" = passed all four).
    * Component operators are reused verbatim so every threshold lives
    * in exactly one place (the pipe_quality_verdict discipline); the
    * joins are doc_id-keyed — document text never moves through the
    * funnel. Docs the tokenizer yields nothing for fail the length
    * gate; docs too short for a bigram score pass the KN gate
    * vacuously (they are already dead at the length gate). */
  def pipeQualityFunnel(spark: SparkSession, dir: String): DataFrame = {
    // r15: the two UNIGRAM gates (entropy, unigram LM) consume ONE
    // docTermCounts subtree — the per-doc term-count aggregate is
    // byte-identical in both branches (all four columns are grouping
    // keys/aggregates, so column pruning cannot diverge them) and
    // ReusedExchange computes the tokenize once at runtime. The KN
    // gate stays the standalone operator (bigrams share nothing with
    // the unigram pass). Gate arithmetic is unchanged and
    // single-definition (entropyFilterFrom / docPerplexityFrom — the
    // same bodies the standalone gated operators call).
    //
    // MEASURED DECLINE recorded here (r15): materializing ONE tagged
    // n-gram pass (spine+unigram+bigram rows in a persisted per-doc
    // gram table read by all four consumers) was implemented and
    // measured at sf0.1 (full bench ×2, controls ~1.1× drift): funnel
    // 4.43→6.85 s — REVERTED. The corpus-sized cache write plus the
    // serialized cache-build job cost more than the tokenize passes it
    // removed (the txtRake decline mechanism).
    val docTerm = TextAnalysis.docTermCounts(spark, dir)
    val ent = TextAnalysis.entropyFilterFrom(docTerm)
      .select(col("doc_id"), col("n_tokens"), col("low_entropy"))
    val uni = TextAnalysis.docPerplexityFrom(docTerm)
      .select(col("doc_id"), col("high_perplexity").as("high_uni_ppl"))
    val kn = TextAnalysis.txtDocKnPerplexity(spark, dir)
      .select(col("doc_id"), col("high_perplexity").as("high_kn_ppl"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(ent, Seq("doc_id"), "left")
      .join(uni, Seq("doc_id"), "left")
      .join(kn, Seq("doc_id"), "left")
      .select(
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("low_entropy"), lit(false)).as("low_entropy"),
        coalesce(col("high_uni_ppl"), lit(false)).as("high_uni_ppl"),
        coalesce(col("high_kn_ppl"), lit(false)).as("high_kn_ppl"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(expr(s"if(n_tokens < $MinDocTokens, 1, 0)")).as("fail_len"),
        sum(expr("if(low_entropy, 1, 0)")).as("fail_ent"),
        sum(expr("if(high_uni_ppl, 1, 0)")).as("fail_uni"),
        sum(expr("if(high_kn_ppl, 1, 0)")).as("fail_kn"),
        sum(expr(s"if(n_tokens >= $MinDocTokens, 1, 0)")).as("s1"),
        sum(expr(s"if(n_tokens >= $MinDocTokens AND NOT low_entropy, 1, 0)")).as("s2"),
        sum(expr(s"if(n_tokens >= $MinDocTokens AND NOT low_entropy AND NOT high_uni_ppl, 1, 0)")).as("s3"),
        sum(expr(s"if(n_tokens >= $MinDocTokens AND NOT low_entropy AND NOT high_uni_ppl AND NOT high_kn_ppl, 1, 0)")).as("s4"))
      .selectExpr(
        """stack(9,
          | 'docs_total',       n_docs,
          | 'fail_length',      fail_len,
          | 'fail_low_entropy', fail_ent,
          | 'fail_unigram_ppl', fail_uni,
          | 'fail_kn_ppl',      fail_kn,
          | 'pass_length',      s1,
          | 'pass_entropy',     s2,
          | 'pass_unigram_ppl', s3,
          | 'kept',             s4)
          | AS (stage, n)""".stripMargin)
      .orderBy(col("stage"))
  }

  def pipeMixCorpus(spark: SparkSession, dir: String, cap: Int = 100): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    d.join(broadcast(counts), Seq("lang"))
      .withColumn("u", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 10), 16, 10) as decimal(38,0))"))
      .filter(expr(s"u * cast(n_lang as decimal(38,0)) < " +
        s"cast($cap as decimal(38,0)) * cast(1099511627776 as decimal(38,0))"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }
  /** Deterministic round-robin interleave of sources into a single
    * training order: doc r of source s lands at position
    * (r−1)·S + idx(s) + 1 — pure integer arithmetic, NO global sort
    * or single-partition window (the naive row_number() over
    * everything serializes at 100 TB; this formulation assigns
    * positions map-side after one per-source window). Unequal source
    * sizes leave gaps once a source exhausts — harmless for a
    * training order (readers sort by position). The per-source rank
    * itself rides the distributed prefix sum (sources are a fixed
    * handful — a row_number window per source would funnel the corpus
    * through that many tasks). */
  def pipeInterleave(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .withColumn("one", lit(1L))
    val srcs = d.select(col("source")).distinct()
      .withColumn("src_idx",
        row_number().over(Window.orderBy(col("source"))).cast("long") - 1)
    val ns = srcs.count() // #sources: tiny driver scalar
    prefixSumExclusive(d, "source", Seq(col("doc_id")), "one", "r0",
        equiWidthBucket(d, "doc_id"))
      .withColumn("rank_in_source", col("r0") + 1)
      .join(broadcast(srcs), "source")
      .select(
        ((col("rank_in_source") - 1) * lit(ns) + col("src_idx") + 1).as("position"),
        col("source"), col("rank_in_source"), col("doc_id"))
      .orderBy(col("position"))
  }

  /** Curriculum staging: docs bucketed into 4 difficulty stages per
    * source by mean token length (the cheap difficulty proxy; swap
    * the score column for a model-based one in production). Stage
    * assignment is EXACTLY `ntile(4)` over (score, doc_id) per source
    * — but computed without the per-source serial window (sources are
    * a fixed handful, so `ntile().over(partitionBy(source))` funnels
    * the corpus through ~5 tasks): the per-source rank comes from the
    * distributed prefix sum (count of strictly-smaller rows + 1) and
    * ntile's uneven-bucket arithmetic is a closed-form integer
    * expression over (rank, per-source total). Ties break on doc_id,
    * so the assignment is deterministic and the oracle stays plain
    * `ntile(4)`. */
  def pipeCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), TextOps.tokens("text").as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("source"),
        size(col("t")).cast("long").as("n_tokens"),
        expr("cast(aggregate(t, 0, (acc, x) -> acc + length(x)) as bigint)").as("n_chars"))
      .withColumn("score", round(col("n_chars") / col("n_tokens"), 6))
      .withColumn("one", lit(1L))
    val totals = scored.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    prefixSumExclusive(scored, "source", Seq(col("score"), col("doc_id")),
        "one", "r0", expr("cast(floor(score * 4) as bigint)"))
      .withColumn("r", col("r0") + 1)
      .join(broadcast(totals), "source")
      // ntile(4): the first (n mod 4) buckets carry one extra row; the
      // ELSE branch's div-by-zero is unreachable (n < 4 ⇒ every r takes
      // the THEN branch, bucket = rank)
      .withColumn("stage", expr(
        """cast(CASE WHEN r <= (n_src % 4) * (n_src div 4 + 1)
          |  THEN (r - 1) div (n_src div 4 + 1)
          |  ELSE (n_src % 4) + (r - 1 - (n_src % 4) * (n_src div 4 + 1)) div (n_src div 4)
          |END + 1 as bigint)""".stripMargin))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("score"), col("stage"))
      .orderBy(col("doc_id"))
  }

  /** Packing-efficiency report over [[pipePackSequences]]: bins used,
    * fill ratio, and boundary-spanning docs per language — the
    * padding-waste readout a training-data layout job publishes.
    * Pure aggregation of exact integers; one rational division. */
  def pipePackStats(spark: SparkSession, dir: String, seqLen: Int = 128): DataFrame =
    pipePackSequences(spark, dir, seqLen)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_tokens"),
        (max(col("pack_last")) + 1).as("n_bins"),
        sum(when(col("spans_boundary"), 1L).otherwise(0L)).as("n_spanning"))
      .select(col("lang"), col("n_docs"), col("total_tokens"), col("n_bins"), col("n_spanning"),
        (col("total_tokens") / (col("n_bins") * seqLen).cast("double")).as("fill_ratio"))
      .orderBy(col("lang"))

  /** Token-budget corpus assembly: per language, docs are taken in
    * quality order (mean token length desc, doc_id tie-break) until a
    * token budget is hit — the "fill the training mix under a budget"
    * selection. The cutoff is a per-language window cumsum over
    * integer token counts (exact; never a global sort); a doc is kept
    * while the budget is not yet exhausted BEFORE it, so exactly the
    * first over-budget doc still fits — the standard greedy fill. */
  def pipeTokenBudget(spark: SparkSession, dir: String,
      budgetPerLang: Long = 5000L): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), TextOps.tokens("text").as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("lang"),
        size(col("t")).cast("long").as("n_tokens"),
        expr("cast(aggregate(t, 0, (acc, x) -> acc + length(x)) as bigint)").as("n_chars"))
      .withColumn("score", round(col("n_chars") / col("n_tokens"), 6))
    // bucket = −floor(4·score): a deterministic monotone coarsening of
    // the DESCENDING score order (equal scores share a bucket, so the
    // doc_id tie-break stays inside one bucket's window)
    prefixSumExclusive(scored, "lang", Seq(col("score").desc, col("doc_id")),
        "n_tokens", "taken_before",
        expr("cast(-floor(score * 4) as bigint)"))
      .filter(col("taken_before") < budgetPerLang)
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("score"), col("taken_before"))
      .orderBy(col("lang"), col("taken_before"))
  }

  /** The END-TO-END corpus job as ONE declarative plan — normalize →
    * quality gate → exact dedup (keep smallest doc_id) → sequence-pack
    * the survivors → per-language packing report. This is the
    * composed "switch your corpus pipeline to this engine" flagship:
    * Catalyst fuses the normalize/gate projections into the scan, the
    * dedup window is the only payload shuffle, packing rides a
    * per-lang window over the survivors, and the report is a tiny
    * aggregate — four logical stages, two exchanges that matter. */
  def pipeE2eCorpus(spark: SparkSession, dir: String,
      minTokens: Int = 10, seqLen: Int = 128): DataFrame = {
    val byHash = Window.partitionBy(col("clean_md5"))
    val kept = Tables.documents(spark, dir)
      .withColumn("clean", expr(
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' '))"))
      .withColumn("dl", expr(
        "cast(size(filter(split(clean, ' '), x -> x != '')) as bigint)"))
      .filter(col("dl") >= minTokens)
      .withColumn("clean_md5", md5(col("clean")))
      .withColumn("rn", row_number().over(byHash.orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("dl"))
    // bucket bounds from the RAW id span (a superset of the survivors'):
    // cheaper than bounding the filtered frame, and empty buckets are free
    val packed = prefixSumExclusive(kept, "lang", Seq(col("doc_id")), "dl", "start_off",
        equiWidthBucket(Tables.documents(spark, dir), "doc_id"))
      // integer `div`, not IEEE `/`-then-cast: exact for every seqLen and
      // offset magnitude (the double path is only exact for powers of two)
      .withColumn("pack_last", expr(s"(start_off + dl - 1) div $seqLen"))
    packed.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("dl")).as("total_tokens"),
        (max(col("pack_last")) + 1).as("n_bins"),
        (sum(col("dl")) / ((max(col("pack_last")) + 1) * seqLen).cast("double")).as("fill_ratio"))
      .orderBy(col("lang"))
  }

  /** Dataset card: the per-language summary table a corpus release
    * ships — doc counts, token totals, corpus share, mean length and
    * exact-duplicate rate. Shares are integer micro-units via integer
    * div, so no float sits on any compare boundary. One pass for the
    * stats, one content-hash window for dup counts, a tiny broadcast
    * for the grand total. */
  def pipeDatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val byHash = Window.partitionBy(col("h"))
    val base = Tables.documents(spark, dir)
      .withColumn("n_tokens", expr(
        "cast(size(filter(split(text, ' '), x -> x != '')) as bigint)"))
      .withColumn("h", md5(col("text")))
      .withColumn("n_copies", count(lit(1)).over(byHash))
    val perLang = base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
    val tot = perLang.agg(sum(col("total_tokens")).as("grand_tokens"))
    perLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("total_tokens"), col("n_dup_docs"),
        expr("(total_tokens * 1000000) div grand_tokens").as("token_share_micro"),
        expr("(total_tokens * 1000000) div n_docs").as("avg_tokens_micro"),
        expr("(n_dup_docs * 1000000) div n_docs").as("dup_rate_micro"))
      .orderBy(col("lang"))
  }

  /** Deterministic epoch reshuffle layout: every training epoch gives
    * each doc a fresh pseudorandom placement — shard = md5(epoch:id)
    * top bits mod nShards, slot = rank within (epoch, shard) by the
    * same key — reproducible across runs, engines and partitionings
    * (the property a resumable multi-epoch loader needs; rand() is
    * not). The within-shard window is bounded by corpus/nShards and
    * parallelism is epochs × shards, so no stage serializes at scale.
    * Map-side arithmetic until the one (epoch, shard)-keyed sort. */
  def pipeEpochShuffle(spark: SparkSession, dir: String,
      nEpochs: Int = 2, nShards: Int = 8): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(expr(s"sequence(0, ${nEpochs - 1})")).as("epoch"))
      .withColumn("skey",
        md5(concat(col("epoch").cast("string"), lit(":"), col("doc_id").cast("string"))))
      .withColumn("shard",
        expr(s"cast(conv(substring(skey, 1, 8), 16, 10) as bigint) % $nShards"))
      .withColumn("slot", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("skey"), col("doc_id"))).cast("bigint"))
      .select(col("epoch").cast("bigint").as("epoch"), col("shard"),
        col("doc_id"), col("slot"))
      .orderBy(col("epoch"), col("shard"), col("slot"))

  /** Deterministic train/val/test split: the md5-bucket assignment
    * every training pipeline needs — stable across runs, engines,
    * partitionings, and corpus growth (a doc's split never changes
    * when other docs are added, unlike rand() or modulo-of-rank).
    * Bucket = top-40-bit md5 fraction of the doc id scaled to 0-99:
    * <90 train, <95 val, else test. Pure map-side arithmetic. */
  def pipeSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", expr(
        // pure bigint arithmetic: uval < 2^40 so uval*100 < 2^47; `div`
        // is exact integer division — no decimal rounding at boundaries
        "(cast(conv(substring(md5(cast(doc_id as string)), 1, 10), 16, 10) as bigint) * 100) div 1099511627776"))
      .select(col("doc_id"), col("lang"),
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))

  /** LEAKAGE-FREE train/val/test split: the cluster-aware upgrade of
    * [[pipeSplit]] — near-duplicate documents must land in the SAME
    * split, or evaluation leaks training data through paraphrases the
    * doc-keyed split cannot see (the GPT-3 appendix-C failure mode).
    * Every doc is assigned its near-dup component label
    * ([[Dedup.ddComponents]] — min doc_id of the ≥0.2-Jaccard chain;
    * docs in no pair are their own singleton cluster), and the
    * md5-bucket split hashes the CLUSTER, so a whole family moves
    * together and a singleton's assignment is bit-identical to
    * [[pipeSplit]] (same hash base: cluster = doc_id). Growth-stable
    * like the parent: adding docs never moves an existing cluster.
    * Scale: the components input is edges ≪ docs behind the LSH/df-cap
    * guards; the doc-side join is an id-keyed left join against that
    * slim label table; the hash is map-side. */
  def pipeClusterSplit(spark: SparkSession, dir: String): DataFrame =
    pipeClusterSplitFrom(spark, dir, Dedup.ddComponents(spark, dir))

  /** [[pipeClusterSplit]] over a PRECOMPUTED components table — lets
    * pipe_split_leakage reuse one pair build for both its strategies. */
  private[operators] def pipeClusterSplitFrom(spark: SparkSession,
      dir: String, comp: DataFrame): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("bucket", expr(
        "(cast(conv(substring(md5(cast(cluster as string)), 1, 10), 16, 10) as bigint) * 100) div 1099511627776"))
      .select(col("doc_id"), col("lang"), col("cluster"),
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))

  /** Split-leakage audit — the measurement that MOTIVATES
    * [[pipeClusterSplit]]: for each split strategy, how many near-dup
    * pairs (the ≥0.2-Jaccard candidate set) straddle two different
    * splits. Under the doc-keyed hash ([[pipeSplit]]) a paraphrase
    * family scatters across train/val/test with probability
    * 1 − Σ p_s² per pair; under the cluster-keyed hash the count is
    * ZERO by construction (both endpoints share a component) — this
    * query gates that claim against the oracle rather than asserting
    * it. Scale: the pair set is the guarded candidate stream; the two
    * split tables join id-keyed; output is 2 rows. */
  def pipeSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    // ONE pair build (the expensive shingle self-join) serves both the
    // audit join AND the components the cluster strategy needs —
    // measured 1.6× at sf1 (59.9 → 38.2 s) where the pair family
    // dominates
    val pairs = Dedup.ddNgramJaccard(spark, dir).select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    def crossings(split: DataFrame, name: String): DataFrame =
      pairs
        .join(split.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
        .join(split.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L)).as("n_cross_split"))
        .select(lit(name).as("strategy"), col("n_pairs"), col("n_cross_split"))
    crossings(pipeSplit(spark, dir).select(col("doc_id"), col("split")), "doc_hash")
      .unionAll(crossings(
        pipeClusterSplitFrom(spark, dir, Dedup.componentsFromPairs(spark, pairs))
          .select(col("doc_id"), col("split")), "cluster_hash"))
      .orderBy(col("strategy"))
  }

  /** Length-bucketed batching accounting: docs grouped into
    * 32-token-multiple buckets (the pad-to-bucket batching strategy
    * that replaces pad-to-max), with the padding waste each bucket
    * incurs — all integer arithmetic. The report that justifies
    * bucketed batching over global padding in a training loader. */
  def pipeLengthBuckets(spark: SparkSession, dir: String,
      step: Int = 32): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens("text").as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .withColumn("bucket_len", expr(s"((n_tokens - 1) div $step + 1) * $step"))
      .groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (count(lit(1)) * col("bucket_len").cast("long") - sum(col("n_tokens"))).as("pad_waste"))
      .select(col("bucket_len"), col("n_docs"), col("total_tokens"), col("pad_waste"),
        (col("pad_waste") / (col("n_docs") * col("bucket_len")).cast("double")).as("waste_frac"))
      .orderBy(col("bucket_len"))

  /** Temperature-based mixture weights (the multilingual-sampling
    * recipe: p_i ∝ n_i^(1/τ) with τ = 2, i.e. √n — boosts low-resource
    * languages without drowning the head). √ is correctly-rounded
    * IEEE so it preserves cross-engine parity, and the normalizing
    * Σ√n_i runs as an ordered cumulative sum over the ≤|langs| rows —
    * both engines add the same doubles in the same sequence (max of a
    * nonneg-term cumsum = its last element). Everything upstream is
    * one integer count aggregate; the window is bounded by the
    * language DOMAIN, not the corpus. */
  def pipeTempSampling(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val wCum = Window.orderBy(col("lang"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("sq", sqrt(col("n_docs").cast("double")))
      .withColumn("s_cum", sum(col("sq")).over(wCum))
    val tot = cum.agg(sum(col("n_docs")).as("n_total"),
      max(col("s_cum")).as("sq_total"))
    cum.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        (col("n_docs") / col("n_total")).as("base_share"),
        (col("sq") / col("sq_total")).as("temp_weight"))
      .orderBy(col("lang"))
  }

  /** k-anonymity audit over quasi-identifiers (lang, source,
    * length-bucket): the privacy readout a release review runs before
    * publishing a corpus — how many documents sit in equivalence
    * classes smaller than k (re-identifiable by their quasi-id combo
    * alone). One groupBy on the quasi-id, one tiny histogram rollup on
    * class size; output is bounded by the distinct class sizes. Exact
    * integers; `at_risk` marks sizes below k=5. */
  def pipeKAnonymity(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_docs"))
      .withColumn("at_risk", col("class_size") < k)
      .orderBy(col("class_size"))

  /** Deterministic weighted sampling without replacement: k docs per
    * source with inclusion odds ∝ document length — the
    * quality-weighted spot-check sample every curation review pulls.
    * Priority-sampling formulation: priority = u div weight where u is
    * a 40-bit integer from md5(doc_id) — longer docs draw smaller
    * priorities; the k smallest win. ALL integer arithmetic (both
    * engines truncate positive div identically — no float u ~ U(0,1),
    * no log, the exact-parity version of A-ES weighted reservoirs).
    * Per-source bottom-k runs through the bounded-heap TopKPerGroup
    * operator: no corpus-growing per-source window; the rank window
    * after pruning orders k rows per source. */
  def pipeWeightedSample(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .withColumn("uval", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 10), 16, 10) as bigint)"))
      .withColumn("priority", expr("uval div greatest(n_chars, 1)"))
      .select(col("source"), col("doc_id"), col("n_chars"), col("priority"))
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      docs, Seq("source"), Seq("priority" -> false, "doc_id" -> false), k)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority"), col("doc_id"))
    pruned.withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("source"), col("rank"), col("doc_id"), col("n_chars"),
        col("priority"))
      .orderBy(col("source"), col("rank"))
  }

  /** l-diversity audit — the companion check to [[pipeKAnonymity]]:
    * a quasi-identifier class is safe only if the SENSITIVE attribute
    * (here `lang`) takes at least l distinct values inside it, else
    * class membership leaks the attribute even when k-anonymity
    * holds. Classes key on (source, length bucket); output is the
    * histogram of classes by their diversity l with the at-risk flag
    * at l < 2. Two hash aggregates (distinct-within-group then
    * histogram), both map-side combinable; output bounded by the
    * distinct l values, never the corpus. */
  def pipeLDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"), expr("n_chars div 100").as("len_bucket"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("lang")).as("l"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_docs"))
      .withColumn("at_risk", col("l") < 2)
      .orderBy(col("l"))

  /** t-closeness audit — the third rung of the privacy ladder
    * ([[pipeKAnonymity]] → [[pipeLDiversity]] → this): an equivalence
    * class can be k-anonymous AND l-diverse yet still leak if its
    * sensitive-attribute DISTRIBUTION differs sharply from the
    * corpus-wide one (an attacker learns "docs in this class are
    * almost surely lang X"). Per quasi-identifier class
    * (source, length-bucket), the variational distance between the
    * class's `lang` distribution and the global one — the categorical
    * form of the t-closeness paper's EMD — as the exact rational
    * t = Σ_l |c_l·N − g_l·n| / (2·n·N), micro-floored; `at_risk` iff
    * t > 0.3. The class × language grid is |classes|·|langs| rows
    * (both tiny aggregates, broadcast), so at 100 TB this is two
    * map-side-combinable aggregates and a broadcast grid join — the
    * corpus is scanned once. */
  def pipeTCloseness(spark: SparkSession, dir: String,
      tMicro: Long = 300000L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cls = docs
      .groupBy(col("source"), expr("n_chars div 100").as("len_bucket"),
        col("lang"))
      .agg(count(lit(1)).as("c"))
    val classTot = cls.groupBy(col("source"), col("len_bucket"))
      .agg(sum(col("c")).as("n_class"))
    val globTot = docs.groupBy(col("lang")).agg(count(lit(1)).as("g"))
    val nTotal = docs.agg(count(lit(1)).as("n_total"))
    classTot.crossJoin(broadcast(globTot)).crossJoin(broadcast(nTotal))
      .join(cls, Seq("source", "len_bucket", "lang"), "left")
      .groupBy(col("source"), col("len_bucket"), col("n_class"),
        col("n_total"))
      .agg(sum(expr("abs(cast(coalesce(c, 0) as decimal(38,0)) * n_total" +
        " - cast(g as decimal(38,0)) * n_class)")).as("sum_abs"))
      .select(col("source"), col("len_bucket"), col("n_class"),
        expr("cast(sum_abs * 1000000" +
          " div (2 * cast(n_class as decimal(38,0)) * n_total) as bigint)")
          .as("t_micro"))
      .withColumn("at_risk", col("t_micro") > tMicro)
      .orderBy(col("source"), col("len_bucket"))
  }

  /** Inverse-frequency CLASS WEIGHTS per language — the balancing
    * weights a training loop feeds its sampler/loss when classes are
    * skewed: w_g = N / (k·n_g) (sklearn's `balanced` convention —
    * weights average to 1 across the corpus), exact micro fixed-point.
    * One tiny aggregate + broadcast total; the audit row carries the
    * class share so the skew is visible next to its correction. */
  def pipeClassWeights(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = g.agg(sum(col("n_docs")).as("n_total"),
      count(lit(1)).as("k"))
    g.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("n_total"),
        expr("n_docs * 1000000 div n_total").as("share_micro"),
        expr("n_total * 1000000 div (k * n_docs)").as("weight_micro"))
      .orderBy(col("lang"))
  }

  /** RLHF preference-pair assembly: within each language, pair the
    * i-th longest document (proxy "chosen") with the i-th shortest
    * ("rejected") — the deterministic best-vs-worst layout used to
    * bootstrap reward-model data from a scored corpus. Both rankings
    * are row_number()≤k windows, so the TopKPerGroupRewrite lowers
    * them onto the bounded-heap operator (no full per-language sort);
    * the pair count caps at min(k, n_docs div 2) so a thin language
    * never pairs a document with itself. Margin is an exact integer. */
  def pipeRlhfPairs(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("lang"), col("doc_id"), col("n_chars"))
    val best = docs.withColumn("pair_idx", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("pair_idx") <= k)
      .select(col("lang"), col("pair_idx"),
        col("doc_id").as("chosen_id"), col("n_chars").as("chosen_chars"))
    val worst = docs.withColumn("pair_idx", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n_chars").asc, col("doc_id"))))
      .filter(col("pair_idx") <= k)
      .select(col("lang"), col("pair_idx"),
        col("doc_id").as("rejected_id"), col("n_chars").as("rejected_chars"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    best.join(worst, Seq("lang", "pair_idx"))
      .join(broadcast(counts), "lang")
      .filter(col("pair_idx") <= expr("n_docs div 2"))
      .select(col("lang"), col("pair_idx").cast("long").as("pair_idx"),
        col("chosen_id"), col("rejected_id"),
        (col("chosen_chars") - col("rejected_chars")).as("margin_chars"))
      .orderBy(col("lang"), col("pair_idx"))
  }

  /** Contrastive batch assembly with label-collision-free packing:
    * slot the i-th vector of every label into batch i (round-robin by
    * within-label rank), so no in-batch negative shares the anchor's
    * label — the batching discipline contrastive/CLIP-style training
    * needs. The rank is the two-phase prefix COUNT (cells are single
    * vectors; no serial window); the per-batch report (slots, negative
    * pairs, completeness vs the global label count) is one map-side-
    * combinable aggregate. */
  def pipeContrastiveBatches(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("label"), col("vec_id"))
      .withColumn("c", lit(1L))
    val ranked = prefixSumExclusive(e, "label", Seq(col("vec_id")), "c", "_lt",
      equiWidthBucket(e, "vec_id"))
    val nLabels = e.select(countDistinct(col("label")).as("n_labels"))
    ranked.groupBy(col("_lt").as("batch_id"))
      .agg(count(lit(1)).as("n_slots"))
      .crossJoin(broadcast(nLabels))
      .select(col("batch_id"), col("n_slots"),
        (col("n_slots") * (col("n_slots") - 1L)).as("n_neg_pairs"),
        (col("n_slots") === col("n_labels")).as("is_full"))
      .orderBy(col("batch_id"))
  }

  /** Per-document boilerplate exposure — the APPLY-side readout of
    * [[Dedup.ddHotSpans]]: how many of the corpus's top-50 hot spans
    * each document contains (distinct spans hit + total occurrences).
    * The gate a C4-style cleaner applies before deciding whether to
    * cut spans or drop documents. The 50-row hot-span set broadcasts;
    * the per-doc shingle explode is the same map-side pass the
    * detector used; only hits reach the aggregate. */
  def pipeBoilerplateExposure(spark: SparkSession, dir: String): DataFrame = {
    val hot = Dedup.ddHotSpans(spark, dir).select(col("span"))
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(TextOps.shingleArray("text")).as("span"))
      .join(broadcast(hot), "span")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("span")).as("n_hot_spans"),
        count(lit(1)).as("n_hot_hits"))
      .orderBy(col("doc_id"))
  }

  /** Code-mix contamination report: per (labeled language, code verdict)
    * doc and char counts plus the per-language code share in exact
    * micro-units — the cross of [[TextAnalysis.txtCodeDetect]]'s integer
    * vote against the language labels, read before fixing per-language
    * mixture quotas (code-heavy "natural language" slices silently skew
    * multilingual sampling). Join is doc-keyed on two slim projections;
    * text is scanned once by the detector. */
  def pipeCodeMixReport(spark: SparkSession, dir: String): DataFrame = {
    val verdicts = TextAnalysis.txtCodeDetect(spark, dir)
      .select(col("doc_id"), col("is_code"), col("n_chars"))
    val wL = Window.partitionBy(col("lang"))
    Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
      .join(verdicts, "doc_id")
      .groupBy(col("lang"), col("is_code"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .withColumn("lang_docs", sum(col("n_docs")).over(wL))
      .withColumn("share_micro", expr("n_docs * 1000000 div lang_docs"))
      .orderBy(col("lang"), col("is_code"))
  }

  /** Composite keep/drop quality verdict per document — the ONE-STOP
    * cleaner decision a pretraining pipeline applies before writing
    * the training shard, combining the engine's gated quality signals
    * into a reason bitmask (a doc can fail several ways; the mask
    * keeps the audit trail):
    *   bit 1 — low entropy (repetitive/templated; < 3.5 bits/token)
    *   bit 2 — high reference-LM perplexity (OOD/noise; > 5.0 bits)
    *   bit 4 — too short (< 16 tokens)
    *   bit 8 — token shape out of band (chars/token micro outside
    *           [4.8e6, 5.8e6] — binary-ish or run-on content)
    * keep = mask 0. Reuses [[TextAnalysis.txtEntropyFilter]] and
    * [[TextAnalysis.txtDocPerplexity]] verbatim (their own gates prove
    * the numbers), joined back to the slim doc projection on the id —
    * at 100 TB this is two vocab-pass signals + one id-keyed join,
    * and the text column never moves. */
  def pipeQualityVerdict(spark: SparkSession, dir: String): DataFrame = {
    // bits 1/2 reuse the COMPONENT operators' own boolean flags, so
    // their thresholds live in exactly one place each (the components'
    // parameter defaults) and the composite cannot silently diverge
    val ent = TextAnalysis.txtEntropyFilter(spark, dir)
      .select(col("doc_id"), col("n_tokens"),
        col("bits_per_token_micro").as("entropy_micro"), col("low_entropy"))
    val ppl = TextAnalysis.txtDocPerplexity(spark, dir)
      .select(col("doc_id"), col("bits_micro").as("ppl_micro"),
        col("high_perplexity"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .join(ent, Seq("doc_id")) // inner: zero-token docs have no verdict
      .join(ppl, Seq("doc_id"))
      .withColumn("chars_per_token_micro",
        expr("n_chars * 1000000 div n_tokens"))
      .withColumn("reason_mask", expr(
        "CASE WHEN low_entropy THEN 1 ELSE 0 END" +
          " + CASE WHEN high_perplexity THEN 2 ELSE 0 END" +
          s" + CASE WHEN n_tokens < $MinDocTokens THEN 4 ELSE 0 END" +
          " + CASE WHEN chars_per_token_micro < 4800000" +
          "        OR chars_per_token_micro > 5800000 THEN 8 ELSE 0 END")
        .cast("long"))
      .drop("low_entropy", "high_perplexity")
      .withColumn("keep", col("reason_mask") === 0L)
      .orderBy(col("doc_id"))
  }
}
