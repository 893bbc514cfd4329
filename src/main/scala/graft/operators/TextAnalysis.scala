package graft.operators

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis operators over `documents` (SURVEY.md §2.3 #35-38).
  * Pure per-row projections — no shuffle except the final ORDER BY for
  * oracle determinism; at scale these run as a single map stage fused
  * into the scan. */
object TextAnalysis {

  private val Stopwords = Seq("the", "and", "of", "to", "a", "is")
  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Per-doc stats + composite quality score (length, punctuation,
    * stopword density) — the standard pre-training quality gates. */
  def txtQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", TextOps.tokens("text"))
      .withColumn("n_tokens", expr("cast(size(toks) as bigint)"))
      .withColumn("n_chars_measured", expr("cast(length(text) as bigint)"))
      .withColumn("punct_ratio", expr(
        "cast(length(regexp_replace(text, '[A-Za-z0-9 ]', '')) as double) / length(text)"))
      .withColumn("stopword_ratio", expr(
        s"cast(size(filter(toks, x -> x IN ${inList(Stopwords)})) as double) / size(toks)"))
      .withColumn("quality_score", expr(
        "0.4 * least(cast(1 as double), n_tokens / 20.0) + 0.3 * (1 - punct_ratio) + 0.3 * (1 - stopword_ratio)"))
      .select(col("doc_id"), col("n_tokens"), col("n_chars_measured"),
        col("punct_ratio"), col("stopword_ratio"), col("quality_score"))
      .orderBy(col("doc_id"))

  private val LangStops: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une"))

  /** Stopword-overlap language ID; argmax with lexicographic tie-break
    * (the CASE chain gives ties to the alphabetically first language,
    * identically in both engines). */
  def txtLangid(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .withColumn("toks", TextOps.tokens("text"))
    val scored = LangStops.foldLeft(base) { case (df, (lang, words)) =>
      df.withColumn(s"s_$lang", expr(
        s"cast(size(filter(toks, x -> x IN ${inList(words)})) as bigint)"))
    }
    scored
      .withColumn("pred_lang", expr(
        """CASE WHEN s_de >= greatest(s_en, s_es, s_fr) THEN 'de'
          |     WHEN s_en >= greatest(s_es, s_fr) THEN 'en'
          |     WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END""".stripMargin))
      .select(col("doc_id"), col("s_de"), col("s_en"), col("s_es"), col("s_fr"),
        col("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID confusion matrix: predicted language (the stopword
    * heuristic of [[txtLangid]]) against the labeled language — the QA
    * readout that decides whether the cheap classifier is good enough
    * to gate a corpus. Pure integer counts over one join-free pass
    * (lang rides the same row as the prediction). */
  def txtLangidConfusion(spark: SparkSession, dir: String): DataFrame =
    txtLangid(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))

  /** Code-vs-prose detection: the corpus-gating heuristic that keeps
    * source code out of (or routes it into) a text corpus. Pure
    * integer signals — brace/bracket count, semicolons, assignment
    * and snake_case occurrences, digit density — with an integer-
    * threshold vote (≥ 2 strong signals ⇒ code), so no float sits on
    * the decision boundary. One codegen projection per row. */
  def txtCodeDetect(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("cast(regexp_count(text, '[{}\\\\[\\\\]()]') as bigint)").as("n_brackets"),
        expr("cast(regexp_count(text, ';') as bigint)").as("n_semicolons"),
        expr("cast(regexp_count(text, '[=<>!]=|=') as bigint)").as("n_assign"),
        expr("cast(regexp_count(text, '[a-z]+_[a-z]+') as bigint)").as("n_snake"),
        expr("cast(length(text) as bigint)").as("n_chars"))
      .withColumn("is_code",
        // n_chars > 0 guard: with an empty doc every 0·k ≥ 0 vote would
        // be vacuously true and the least code-like input would classify
        // as code
        (col("n_chars") > 0) &&
        ((col("n_brackets") * 40 >= col("n_chars")).cast("int") +
          (col("n_semicolons") * 100 >= col("n_chars")).cast("int") +
          (col("n_assign") * 60 >= col("n_chars")).cast("int") +
          (col("n_snake") * 80 >= col("n_chars")).cast("int") >= 2))
      .orderBy(col("doc_id"))

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation marks). */
  def txtTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_ws_tokens", expr(
        "cast(size(filter(split(text, ' '), x -> x != '')) as bigint)"))
      .withColumn("n_bpe_tokens", expr(
        "cast(size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) as bigint)"))
      .select(col("doc_id"), col("n_ws_tokens"), col("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Normalization for dedup/training: lowercase, strip non-alnum,
    * squash whitespace — the canonical text-cleaning pass, as a pure
    * codegen projection. */
  def txtNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("clean", expr(
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' '))"))
      .select(col("doc_id"), col("clean"),
        md5(col("clean")).as("clean_md5"),
        expr("cast(length(clean) as bigint)").as("n_clean_chars"))
      .orderBy(col("doc_id"))

  /** TF-IDF top terms per language. The idf uses the log-free rational
    * form tf·N/df (multiplication and division are IEEE-exact-rounded,
    * so Spark and DuckDB agree bit-for-bit; libm `ln` would not).
    * Shape: two shuffles (term stats), broadcast of the doc count, then
    * a per-lang top-k window. */
  def txtTopTerms(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("lang"), col("doc_id"),
      explode(TextOps.tokens("text")).as("term"))
    val tf = tok.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf").cast("double") * col("n_total") / col("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("term"), col("tf"), col("df"),
        col("score").as("score"))
      .orderBy(col("lang"), col("rank"))
  }

  /** Top-5 bigrams per language — the n-gram language-model counting
    * pass. Bigram arrays are built map-side (lambda-bound tokens, see
    * TextOps.ngramArray); one shuffle for the counts, a top-k window
    * over the survivors. */
  def txtBigrams(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.ngramArray("text", 2)).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rank"))
  }

  /** Vocabulary build: corpus-wide term table with frequency-ranked ids
    * (the tokenizer-training precursor). The global rank over
    * (tf desc, term) is assigned WITHOUT an un-partitioned window —
    * a web-scale term table is billions of rows pre-cut, and a global
    * `row_number()` funnels all of it through one task. Instead the
    * total order is decomposed group-wise: token_id = (cumulative
    * count of all earlier (tf, first-char) groups) + (rank within the
    * group). The group-count table is tiny (#distinct tf × alphabet),
    * so its cumulative window is a single trivially small task; the
    * offsets broadcast back, and the within-group window is properly
    * partitioned — every task bounded by one (tf, prefix) slice.
    * Bit-identical to the single-window formulation (the oracle's
    * row_number) by construction of the order decomposition. */
  def txtVocab(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .withColumn("pfx", substring(col("term"), 1, 1))
    // per-group counts → exclusive cumulative offset in the total order
    val offsets = terms.groupBy(col("tf"), col("pfx"))
      .agg(count(lit(1)).as("grp_n"))
      .withColumn("offset",
        coalesce(sum(col("grp_n")).over(
          Window.orderBy(col("tf").desc, col("pfx"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("tf"), col("pfx"), col("offset"))
    val wGrp = Window.partitionBy(col("tf"), col("pfx")).orderBy(col("term"))
    terms.join(broadcast(offsets), Seq("tf", "pfx"))
      .withColumn("token_id",
        (col("offset") + row_number().over(wGrp)).cast("bigint"))
      .select(col("token_id"), col("term"), col("tf"), col("df"))
      .orderBy(col("token_id"))
  }

  /** Document-length histogram in 50-char buckets — the corpus-shape
    * profile (length filtering is the first quality gate most training
    * pipelines apply). Exact integer sums, one tiny shuffle. */
  def txtLenHist(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy((floor(length(col("text")) / 50) * 50).cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        expr("cast(sum(cast(length(text) as bigint)) as double) / count(*)").as("avg_chars"))
      .orderBy(col("bucket"))

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII masking: email/IPv4 redaction with match counts. The testdata
    * corpus has no organic PII, so a deterministic synthetic
    * contact line derived from doc_id is prepended first — the oracle
    * then genuinely checks that both engines' regex replacement agrees.
    * Pure projection; the patterns are RE2-and-Java-compatible. */
  def txtPiiMask(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("s", concat(
        lit("contact user"), col("doc_id").cast("string"), lit("@example.com at 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7 "), col("text")))
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("s"), lit(EmailRe), lit("<EMAIL>")),
          lit(Ipv4Re), lit("<IP>")).as("masked"),
        size(regexp_extract_all(col("s"), lit(EmailRe), lit(0))).cast("bigint").as("n_emails"),
        size(regexp_extract_all(col("s"), lit(Ipv4Re), lit(0))).cast("bigint").as("n_ips"))
      .orderBy(col("doc_id"))

  /** BM25 relevance (k1=1.2, b=0.75) for a fixed keyword query, with
    * the log-free rational idf (N-df+0.5)/(df+0.5) — same monotone
    * ranking as the classic form, but every step is IEEE double
    * arithmetic both engines perform identically. Corpus stats (N,
    * avgdl, per-term df) are one tiny aggregate broadcast back; the
    * scoring is a pure map stage; top-k goes through
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  def txtBm25(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val terms = Seq("join", "hash", "scan")
    // balanced: both passes run interpreted-HOF token work per row; a
    // single-file scan would serialize them on one task (see TextOps)
    val docs = TextOps.balanced(Tables.documents(spark, dir))
      .withColumn("toks", TextOps.tokens("text"))
    val statCols = Seq(
      count(lit(1)).as("n_docs"),
      expr("cast(sum(cast(size(toks) as decimal(18,2))) as double) / count(*)").as("avgdl")) ++
      terms.map(t => expr(
        s"sum(if(array_contains(toks, '$t'), 1, 0))").as(s"df_$t"))
    val stats = docs.agg(statCols.head, statCols.tail: _*)
    val tfd = terms.foldLeft(docs.crossJoin(broadcast(stats))
        .withColumn("dl", expr("cast(size(toks) as bigint)"))) { (df, t) =>
      df.withColumn(s"tf_$t", expr(
        s"cast(size(filter(toks, x -> x = '$t')) as bigint)"))
    }
    val score = terms.map { t =>
      s"""((cast(n_docs - df_$t as double) + 0.5) / (cast(df_$t as double) + 0.5))
         | * (cast(tf_$t as double) * 2.2)
         | / (cast(tf_$t as double) + 1.2 * (0.25 + 0.75 * (cast(dl as double) / avgdl)))""".stripMargin
    }.mkString(" + ")
    val top = tfd.withColumn("score", expr(s"$score"))
      .select((Seq(col("doc_id"), col("dl")) ++
        terms.map(t => col(s"tf_$t")) :+ col("score")): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("bigint"))
      .select((Seq(col("rank"), col("doc_id"), col("dl")) ++
        terms.map(t => col(s"tf_$t")) :+ col("score")): _*)
      .orderBy(col("rank"))
  }

  /** Gopher-style repetition/quality gates: duplicate-word fraction,
    * most-frequent-bigram mass, mean word length, symbol-to-word ratio,
    * and the composite keep decision. Entirely per-row HOF arithmetic —
    * a single map stage over the corpus; the bigram array is bound as a
    * lambda variable so CollapseProject cannot re-inline its
    * construction per distinct-bigram element. */
  def txtGopher(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .withColumn("toks", TextOps.tokens("text"))
      .withColumn("n_tokens", expr("cast(size(toks) as bigint)"))
      .withColumn("dup_word_frac", expr(
        "cast(n_tokens - size(array_distinct(toks)) as double) / n_tokens"))
      // the bigram array is a single native call, bound as a lambda
      // variable so the per-distinct-bigram count scans the bound copy
      .withColumn("top_bigram_frac",
        when(col("n_tokens") < 2, lit(0.0)).otherwise(
          element_at(transform(
            array(org.apache.spark.sql.graft.TextExpressions.wordNgrams(col("text"), 2)),
            g => array_max(transform(array_distinct(g),
              b => size(filter(g, x => x === b))))), 1).cast("double")
          / (col("n_tokens") - 1)))
      .withColumn("mean_word_len", expr(
        "cast(aggregate(toks, cast(0 as bigint), (a, x) -> a + length(x)) as double) / n_tokens"))
      .withColumn("symbol_ratio", expr(
        "cast(length(regexp_replace(text, '[A-Za-z0-9 ]', '')) as double) / n_tokens"))
      .withColumn("keep", expr(
        """n_tokens >= 10 AND n_tokens <= 1000 AND dup_word_frac <= 0.6
          |AND top_bigram_frac <= 0.2 AND mean_word_len >= 2 AND mean_word_len <= 12""".stripMargin))
      .select(col("doc_id"), col("n_tokens"), col("dup_word_frac"),
        col("top_bigram_frac"), col("mean_word_len"), col("symbol_ratio"),
        col("keep"))
      .orderBy(col("doc_id"))

  /** Inverted index build (term → posting list): the search-side twin
    * of vocabulary construction. Postings are exact sorted doc-id
    * arrays capped at 20 entries per term (the cap bounds row width —
    * a full web-scale posting list is stored chunked, and the first
    * chunk is what lands here). One explode + one partial-aggregated
    * shuffle on the term; collect_set is per-group bounded because df
    * is bounded by the corpus slice per term. Terms below df 5 are
    * dropped post-combine. */
  def txtInvertedIndex(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(array_distinct(TextOps.tokens("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        expr("array_join(transform(slice(array_sort(collect_list(doc_id)), 1, 20)," +
          " x -> cast(x as string)), ',')").as("postings"))
      .filter(col("df") >= 5)
      .orderBy(col("term"))

  /** Out-of-vocabulary rate per document: tokens are checked against
    * the corpus vocabulary restricted to terms seen >= 5 times (the
    * practical "real word" cut a tokenizer-coverage audit uses). The
    * vocab aggregate is tiny and broadcast back; the membership join
    * is map-side, so the whole audit is two passes over the tokens
    * with one broadcast — no big-side shuffle at 100 TB. */
  def txtOovRate(spark: SparkSession, dir: String, minTf: Int = 5): DataFrame = {
    val toks = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(TextOps.tokens("text")).as("term"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= minTf).select(col("term"))
    toks.join(broadcast(vocab.withColumn("in_vocab", lit(1))), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("dl"), col("n_oov"),
        round(col("n_oov").cast("double") / col("dl").cast("double"), 12).as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  /** Unigram-likelihood document score — the model-free stand-in for a
    * perplexity filter (CCNet-style): each document is scored by the
    * average corpus frequency of its tokens, kept entirely rational
    * (sum of bigint term counts / (doc_len × corpus_total)) so both
    * engines compute bit-identical doubles without libm. The corpus
    * unigram table is a tiny aggregate (|vocab| rows) broadcast back;
    * the scoring join is map-side. Low scores = rare-token gibberish,
    * high = stop-word soup — the standard two-sided cut. */
  def txtUnigramScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(TextOps.tokens("text")).as("term"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val total = vocab.agg(sum(col("tf")).as("corpus_total"))
    toks.join(broadcast(vocab), "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), sum(col("tf")).as("sum_tf"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("dl"), col("sum_tf"),
        round(col("sum_tf").cast("double") /
          (col("dl").cast("double") * col("corpus_total").cast("double")), 12).as("score"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: min-hash over 3-gram shingles (the k=1
    * winnow) — a stable content signature robust to word order at the
    * edges; equal fingerprints ⇒ shared rare shingle. */
  def txtFingerprint(spark: SparkSession, dir: String): DataFrame =
    // fully map-side: shingle array + min-of-md5s per row (one native
    // codegen call, raw-digest min — see graft.Md5Min), no shuffle
    // before the output sort
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), TextOps.shingleArray("text").as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        org.apache.spark.sql.graft.TextExpressions.md5Min(col("sh")).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** Readability scoring (Flesch-shaped): words per sentence and
    * vowel-group-per-word as the syllable proxy, combined with the
    * standard literal coefficients. Counts are regexp_count integers
    * (identical across engines), the score is one double expression
    * over exact ratios, rounded. Pure projection — fuses into the
    * scan at any scale. */
  def txtReadability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_words", expr(
        "cast(size(filter(split(text, ' '), x -> x != '')) as bigint)"))
      .filter(col("n_words") > 0)
      .withColumn("n_sents", expr(
        "cast(greatest(regexp_count(text, '[.!?]'), 1) as bigint)"))
      .withColumn("n_vgroups", expr(
        "cast(greatest(regexp_count(lower(text), '[aeiouy]+'), 1) as bigint)"))
      .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_vgroups"),
        (lit(206.835)
          - lit(1.015) * (col("n_words") / col("n_sents"))
          - lit(84.6) * (col("n_vgroups") / col("n_words"))).as("flesch"))
      .orderBy(col("doc_id"))

  /** Kneser-Ney-shaped count tables for bigram LM estimation: per
    * bigram the raw count, per left-context the prefix total, and the
    * bigram's CONTINUATION standing (how many distinct left contexts
    * the right word follows — the quantity KN discounting is built
    * on). Pure integer aggregates (the smoothing division happens at
    * model-build time, not here): one shingle-shaped projection, two
    * partial-aggregated shuffles, top-100 by count with full
    * tie-break. */
  def txtKnCounts(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    // bigrams from the native codegen n-gram kernel; tokens are
    // space-split so the join-point split is lossless
    val bi = TextOps.balanced(Tables.documents(spark, dir))
      .select(explode(TextOps.ngramArray("text", 2)).as("bg"))
      .select(expr("split(bg, ' ')[0]").as("w1"), expr("split(bg, ' ')[1]").as("w2"))
    val counts = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_bigram"))
    val prefix = counts.groupBy(col("w1")).agg(sum(col("n_bigram")).as("n_prefix"))
    val continuation = counts.groupBy(col("w2"))
      .agg(count(lit(1)).as("n_continuation"))
    counts.join(prefix, "w1").join(continuation, "w2")
      .select(col("w1"), col("w2"), col("n_bigram"), col("n_prefix"),
        col("n_continuation"))
      .orderBy(col("n_bigram").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Tokenizer APPLICATION: encode every document into its token-id
    * sequence using the corpus vocabulary from [[txtVocab]] — the
    * text→ids step that feeds training. The vocabulary (small by
    * construction) broadcasts; each doc's tokens join map-side, then
    * one doc-keyed shuffle reassembles the sequence in position order
    * (collect_list of (pos, id) structs, array_sort, project). At
    * 100 TB: corpus passes once, vocab rides the broadcast, the only
    * big exchange is keyed on doc_id — no token-keyed shuffle of the
    * corpus. Ids are emitted CSV-encoded (scalar cell, lossless). */
  def txtTokenizeIds(spark: SparkSession, dir: String): DataFrame = {
    val vocab = txtVocab(spark, dir).select(col("term"), col("token_id"))
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), posexplode(TextOps.tokens("text")).as(Seq("pos", "term")))
      .join(broadcast(vocab), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        expr("array_join(transform(array_sort(collect_list(struct(pos, token_id)))," +
          " x -> cast(x.token_id as string)), ',')").as("ids"))
      .orderBy(col("doc_id"))
  }
  /** Type-token ratio (lexical diversity) per document — the
    * vocabulary-richness quality signal (low TTR flags boilerplate /
    * keyword stuffing). Pure map-side array work; the ratio is one
    * integer division at the edge. */
  def txtTtr(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens("text").as("t"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_types"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        (col("n_types") / col("n_tokens")).as("ttr"))
      .orderBy(col("doc_id"))

  /** Hapax-legomena rate per language: the fraction of the vocabulary
    * that occurs exactly once — the heavy-tail health check a corpus
    * audit runs beside the Zipf plot (too-low hapax rate flags
    * templated/duplicated text). One token explode + two aggregates
    * on the (lang, term) key; the rate is one integer division. */
  def txtHapax(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("lang"), col("n_vocab"), col("n_hapax"),
        (col("n_hapax") / col("n_vocab")).as("hapax_rate"))
      .orderBy(col("lang"))

  /** Within-document repetition: the fraction of word 4-grams that are
    * repeats of an earlier 4-gram in the same doc — the
    * compression-ratio-style templated-text detector (high repetition
    * = boilerplate). Map-side array work, one rational division. */
  def txtRepetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.ngramArray("text", 4).as("g"))
      .filter(size(col("g")) > 0)
      .select(col("doc_id"),
        size(col("g")).cast("long").as("n_grams"),
        size(array_distinct(col("g"))).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        ((col("n_grams") - col("n_distinct")) / col("n_grams")).as("repetition"))
      .orderBy(col("doc_id"))

  /** BPE-style merge-pair counting — the inner statistic of tokenizer
    * training: frequencies of adjacent character pairs within words,
    * top-k by count. One explode chain (words → in-word pairs), one
    * count aggregate, a total-order top-k; all map-side until the
    * pair-keyed shuffle. Each BPE iteration at corpus scale is exactly
    * this query over the current vocabulary segmentation. */
  def txtBpePairs(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TextOps.tokens("text")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(k)

  /** Corpus-order novelty: the fraction of each doc's distinct
    * shingles whose FIRST corpus occurrence (min doc_id) is this doc —
    * the "how much new text does this doc add" curation signal
    * (near-1 = fresh content, near-0 = recombined boilerplate). One
    * shingle-keyed shuffle carries (shingle → first doc); the per-doc
    * ratio is integer-exact. */
  def txtNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(array_distinct(TextOps.shingleArray("text"))).as("s"))
    val first = sh.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        (col("n_novel") / col("n_shingles")).as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** Simpson concentration index of the per-language unigram
    * distribution as an exact rational: λ = Σc(c−1) / N(N−1) emitted
    * as (num, den) exact-decimal STRING digits (r8: the N² pair family
    * is the shortest-runway output class — sf1 audit measured exp 2.0,
    * ~2.7e3×SF to int64 — so the whole rational rides the STRING path
    * and no deployment SF can overflow the output edge) — the
    * probability two random tokens are the same type, the
    * corpus-diversity twin of q77's HHI. Term counts collapse
    * map-side; DECIMAL(38,0) keeps a 100 TB N² exact internally. */
  def txtSimpson(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(expr("cast(c as decimal(38,0)) * (c - 1)")).as("simpson_num"))
      .select(col("lang"), col("n_types"), col("n_tokens"),
        expr("cast(simpson_num as string)").as("simpson_num"),
        expr("cast(cast(n_tokens as decimal(38,0)) * (n_tokens - 1) as string)")
          .as("simpson_den"))
      .orderBy(col("lang"))

  /** Reciprocal-rank fusion of two retrieval signals per language —
    * the standard list-merging step behind hybrid (BM25 + vector)
    * search. Each signal's top-20 is pruned through the bounded-heap
    * TopKPerGroup operator FIRST (no corpus-growing per-language
    * window — classic RRF only ever fuses the retrieved lists), ranked
    * inside its ≤20-row list, and fused over the full-outer union with
    * score = Σ 10¹² div (60 + rank): scaled-INTEGER reciprocal ranks,
    * so the fused ordering is exact in both engines (no float sums of
    * 1/(60+r)). Signals here are doc length and token count — stand-ins
    * wired the way real scores would be. */
  def txtRankFusion(spark: SparkSession, dir: String,
      k: Int = 20, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), col("doc_id"), col("n_chars"),
        size(TextOps.tokens("text")).cast("long").as("n_tokens"))
    def ranked(signal: String, rankName: String): DataFrame = {
      val pruned = org.apache.spark.sql.graft.TopK.perGroup(
        docs, Seq("lang"), Seq(signal -> true, "doc_id" -> false), k)
      val w = Window.partitionBy(col("lang"))
        .orderBy(col(signal).desc, col("doc_id"))
      pruned.withColumn(rankName, row_number().over(w).cast("long"))
        .select(col("lang"), col("doc_id"), col(rankName))
    }
    val fused = ranked("n_chars", "rank_chars")
      .join(ranked("n_tokens", "rank_tokens"), Seq("lang", "doc_id"), "full_outer")
      .withColumn("rrf_score", expr(
        "coalesce(1000000000000 div (60 + rank_chars), 0) + " +
        "coalesce(1000000000000 div (60 + rank_tokens), 0)"))
    val top = org.apache.spark.sql.graft.TopK.perGroup(
      fused, Seq("lang"), Seq("rrf_score" -> true, "doc_id" -> false), topN)
    val w2 = Window.partitionBy(col("lang"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w2).cast("long"))
      .select(col("lang"), col("rank"), col("doc_id"),
        col("rank_chars"), col("rank_tokens"), col("rrf_score"))
      .orderBy(col("lang"), col("rank"))
  }

  /** Pairwise vocabulary-overlap Jaccard between languages: shared
    * distinct types / union of types for every lang pair — the
    * corpus-contamination / borrowing audit (a high overlap between
    * two "languages" usually means mislabeled or code-mixed shards).
    * One distinct on (lang, term), then a term-keyed self-join whose
    * fan-out is bounded by |langs|² PER TERM — the join never
    * expands with corpus size, only with vocabulary. The |langs|²
    * pair grid is broadcast; integer counts, one final division. */
  def txtVocabOverlap(spark: SparkSession, dir: String): DataFrame = {
    val vocab = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .distinct()
    val sizes = vocab.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val inter = vocab.as("va").join(vocab.as("vb"),
        col("va.term") === col("vb.term") && col("va.lang") < col("vb.lang"))
      .groupBy(col("va.lang").as("la"), col("vb.lang").as("lb"))
      .agg(count(lit(1)).as("n_inter"))
    val grid = sizes.as("sa").join(sizes.as("sb"), col("sa.lang") < col("sb.lang"))
      .select(col("sa.lang").as("lang_a"), col("sb.lang").as("lang_b"),
        col("sa.n").as("n_a"), col("sb.n").as("n_b"))
    grid.join(broadcast(inter),
        col("lang_a") === col("la") && col("lang_b") === col("lb"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .select(col("lang_a"), col("lang_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("n_union"),
        (col("n_inter").cast("double") / col("n_union")).as("jaccard"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** Head-mass coverage of the bigram distribution: what fraction of
    * ALL bigram occurrences the top-10/50/100 bigrams account for —
    * the boilerplate-concentration audit (a templated corpus puts
    * most of its mass in a tiny head; a diverse one doesn't). The
    * global top-100 is a TakeOrdered (bounded heap, no full sort);
    * the cumulative mass runs over ≤100 ranked rows. Exact integer
    * masses, one edge division per checkpoint. */
  def txtNgramCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = TextOps.balanced(Tables.documents(spark, dir))
      .select(explode(TextOps.ngramArray("text", 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(count(lit(1)).as("n_distinct"),
      sum(col("n")).as("total_occ"))
    val top = counts.orderBy(col("n").desc, col("bigram")).limit(100)
    val w = Window.orderBy(col("n").desc, col("bigram"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("bigram"))).cast("long"))
      .withColumn("cum_mass", sum(col("n")).over(w)) // ≤100 ranked rows
      .filter(col("rank").isin(10L, 50L, 100L))
      .crossJoin(broadcast(tot))
      .select(col("rank").as("k"), col("n_distinct"), col("total_occ"),
        col("cum_mass").as("top_k_mass"),
        (col("cum_mass").cast("double") / col("total_occ")).as("coverage"))
      .orderBy(col("k"))
  }

  /** Total-variation distance between per-language unigram
    * distributions, as an EXACT rational: TV(a,b) = ½Σ|pᵢ−qᵢ| over the
    * term union = (Σ_both |c_a·N_b − c_b·N_a| + N_b·(N_a−Σ_both c_a)
    * + N_a·(N_b−Σ_both c_b)) / (2·N_a·N_b) — the a-only and b-only
    * tails collapse algebraically, so the distance needs only the
    * SHARED terms (one term-keyed self-join, fan-out ≤ |langs|² per
    * term) plus the broadcast totals. The log-free distribution
    * divergence the float-parity policy allows where KL/JS are
    * excluded; the corpus-drift audit between language shards. */
  def txtTvDistance(spark: SparkSession, dir: String): DataFrame = {
    val counts = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("n_tok"))
    val both = counts.as("ca")
      .join(counts.as("cb"),
        col("ca.term") === col("cb.term") && col("ca.lang") < col("cb.lang"))
      .join(broadcast(totals.select(col("lang").as("ta"), col("n_tok").as("n_a"))),
        col("ca.lang") === col("ta"))
      .join(broadcast(totals.select(col("lang").as("tb"), col("n_tok").as("n_b"))),
        col("cb.lang") === col("tb"))
      .groupBy(col("ca.lang").as("la"), col("cb.lang").as("lb"))
      .agg(sum(expr("abs(cast(ca.c as decimal(38,0)) * n_b" +
          " - cast(cb.c as decimal(38,0)) * n_a)")).as("sum_abs"),
        sum(col("ca.c")).as("ca_both"),
        sum(col("cb.c")).as("cb_both"))
    val grid = totals.as("sa").join(totals.as("sb"), col("sa.lang") < col("sb.lang"))
      .select(col("sa.lang").as("lang_a"), col("sb.lang").as("lang_b"),
        col("sa.n_tok").as("n_a"), col("sb.n_tok").as("n_b"))
    grid.join(broadcast(both),
        col("lang_a") === col("la") && col("lang_b") === col("lb"), "left")
      .select(col("lang_a"), col("lang_b"), col("n_a"), col("n_b"),
        // r8: the 2·N_a·N_b pair family measured exp 2.0 at the sf1
        // audit (~3.2e3×SF to int64) — the rational stays DECIMAL
        // internally and leaves as exact STRING digits; the float
        // readout derives from the decimals before the cast
        expr("coalesce(sum_abs, 0)" +
          " + cast(n_b as decimal(38,0)) * (n_a - coalesce(ca_both, 0))" +
          " + cast(n_a as decimal(38,0)) * (n_b - coalesce(cb_both, 0))")
          .as("tv_num_d"),
        expr("2 * cast(n_a as decimal(38,0)) * n_b").as("tv_den_d"))
      .select(col("lang_a"), col("lang_b"), col("n_a"), col("n_b"),
        col("tv_num_d").cast("string").as("tv_num"),
        col("tv_den_d").cast("string").as("tv_den"),
        (col("tv_num_d").cast("double") / col("tv_den_d").cast("double"))
          .as("tv"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** Chao1 species-richness estimate of the per-language vocabulary:
    * Ŝ = S_obs + f₁(f₁−1)/(2(f₂+1)) (bias-corrected form — defined
    * even when no doubletons exist). f₁/f₂ are the singleton/doubleton
    * type counts; the estimate answers "how much vocabulary has this
    * corpus NOT seen yet", the sampling-completeness audit for a
    * tokenizer-training corpus. Emitted as exact integer parts
    * (DECIMAL(38,0) numerator — f₁² at web scale passes 2⁶³) plus one
    * edge division. */
  def txtChao1(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("lang"), col("n_types"), col("n_tokens"), col("f1"), col("f2"),
        expr("cast(cast(f1 as decimal(38,0)) * (f1 - 1) as bigint)")
          .as("chao_num"),
        (lit(2L) * (col("f2") + lit(1L))).as("chao_den"))
      .withColumn("chao1",
        col("n_types") + col("chao_num").cast("double") / col("chao_den"))
      .orderBy(col("lang"))

  /** Good–Turing adjusted counts from the BIGRAM frequency-of-
    * frequencies table: r* = (r+1)·N_{r+1}/N_r for r ≤ 10 — the
    * classical Katz-backoff smoothing statistic (the mass assigned to
    * unseen events is N₁/N). Bigrams, not unigrams: the low frequency
    * classes Good–Turing exists to smooth are populated by the sparse
    * event space (a unigram table over a bounded vocabulary has no
    * singletons once the corpus is large). The heavy work is one
    * (bigram)-keyed count and one tiny groupBy on r; the N_{r+1}
    * lookup is a broadcast self-join on r+1 over ≤11 rows, so a
    * missing frequency class yields r* = 0 rather than a lead() over
    * a gap. Exact integer (num, den) parts; one edge division. */
  def txtGoodTuring(spark: SparkSession, dir: String, maxR: Int = 10): DataFrame = {
    val ff = TextOps.balanced(Tables.documents(spark, dir))
      .select(explode(TextOps.ngramArray("text", 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("r"))
      .filter(col("r") <= maxR + 1)
      .groupBy(col("r")).agg(count(lit(1)).as("n_r"))
    ff.as("a").join(broadcast(ff.as("b")), col("a.r") + 1 === col("b.r"), "left")
      .filter(col("a.r") <= maxR)
      .select(col("a.r").as("r"), col("a.n_r").as("n_r"),
        ((col("a.r") + 1) * coalesce(col("b.n_r"), lit(0L))).as("gt_num"),
        col("a.n_r").as("gt_den"))
      .withColumn("r_star", col("gt_num").cast("double") / col("gt_den"))
      .orderBy(col("r"))
  }

  /** Cohen's kappa for the stopword language-ID against the labels —
    * the chance-corrected agreement score computed straight off
    * [[txtLangidConfusion]]'s matrix as ONE exact rational:
    * κ = (agree·n − Σᵢ rowᵢ·colᵢ) / (n² − Σᵢ rowᵢ·colᵢ), emitted as
    * integer (num, den). All marginals re-aggregate the tiny
    * |langs|² matrix; a single division never happens. */
  def txtLangidKappa(spark: SparkSession, dir: String): DataFrame = {
    val conf = txtLangidConfusion(spark, dir)
    val rowT = conf.groupBy(col("lang")).agg(sum(col("n_docs")).as("row_n"))
    val colT = conf.groupBy(col("pred_lang")).agg(sum(col("n_docs")).as("col_n"))
    val prods = rowT.join(colT, col("lang") === col("pred_lang"))
      .agg(sum(expr("cast(row_n as decimal(38,0)) * col_n")).as("chance_prod"))
    conf.agg(sum(col("n_docs")).as("n"),
        sum(when(col("lang") === col("pred_lang"), col("n_docs"))
          .otherwise(0L)).as("agree"))
      .crossJoin(broadcast(prods))
      .select(col("n"), col("agree"),
        expr("cast(chance_prod as bigint)").as("chance_prod"),
        expr("cast(cast(agree as decimal(38,0)) * n - chance_prod as bigint)")
          .as("kappa_num"),
        expr("cast(cast(n as decimal(38,0)) * n - chance_prod as bigint)")
          .as("kappa_den"))
  }

  /** Term burstiness (variance-to-mean ratio of per-document counts)
    * for the corpus-wide top-20 terms, as exact integer rationals:
    * VMR = (D·Σc² − (Σc)²) / (D·Σc) over ALL D documents (zeros
    * included arithmetically — only docs containing the term produce
    * rows, the rest contribute nothing to either sum). Bursty terms
    * (VMR ≫ 1) concentrate in few docs — the content-word detector
    * dual to document-level repetition. Top-20 selection tie-breaks
    * on the term string, so the row set is deterministic. */
  def txtBurstiness(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val perDoc = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val stats = perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("n_docs_with"),
        sum(col("c")).as("sum_c"),
        sum(expr("cast(c as decimal(38,0)) * c")).as("sum_c2"))
    // Catalyst folds the constant partition key away and plans the
    // global-top-k limit as TakeOrderedAndProject (per-partition
    // bounded heap + merge), so only k rows ever reach the ranking
    // window — verified in target/plans/txt_burstiness.txt
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(col("sum_c").desc, col("term"))
    stats.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .crossJoin(broadcast(nDocs))
      .select(col("rank"), col("term"), col("n_docs_with"), col("sum_c"),
        expr("cast(sum_c2 as bigint)").as("sum_c2"),
        expr("cast(cast(n_docs as decimal(38,0)) * sum_c2 - cast(sum_c as decimal(38,0)) * sum_c as bigint)")
          .as("vmr_num"),
        expr("cast(cast(n_docs as decimal(38,0)) * sum_c as bigint)")
          .as("vmr_den"))
      .orderBy(col("rank"))
  }

  /** Collocation strength for the corpus-wide top-20 bigrams — the
    * log-free PMI: lift(x,y) = P(xy)/(P(x)P(y)) as an EXACT rational
    * n_xy·N² / (B·n_x·n_y) (N tokens, B bigrams), emitted as integer
    * (num, den) plus the single-division double used for ranking
    * (identical IEEE division both engines). Bigrams come from the
    * native WordNgrams kernel; the two unigram joins are keyed on the
    * word, and the top-20 plans as TakeOrderedAndProject like
    * [[txtBurstiness]]. Min support 5 keeps noise bigrams out. */
  def txtCollocations(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = TextOps.balanced(Tables.documents(spark, dir))
    val uni = docs.select(explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n_term"))
    val bi = docs
      .select(explode(
        org.apache.spark.sql.graft.TextExpressions.wordNgrams(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= 5)
    val totals = uni.agg(sum(col("n_term")).as("n_tokens"))
      .crossJoin(docs.select(explode(
          org.apache.spark.sql.graft.TextExpressions.wordNgrams(col("text"), 2)).as("b"))
        .agg(count(lit(1)).as("n_bigrams")))
    val scored = bi
      .withColumn("x", expr("split(bigram, ' ')[0]"))
      .withColumn("y", expr("split(bigram, ' ')[1]"))
      .join(uni.select(col("term").as("x"), col("n_term").as("n_x")), "x")
      .join(uni.select(col("term").as("y"), col("n_term").as("n_y")), "y")
      .crossJoin(broadcast(totals))
      .select(col("bigram"), col("n_xy"), col("n_x"), col("n_y"),
        // products of three corpus-scale aggregates (cubic per SF
        // decade): exact decimal TEXT at the output edge
        expr("cast(cast(n_xy as decimal(38,0)) * n_tokens * n_tokens as string)")
          .as("lift_num"),
        expr("cast(cast(n_bigrams as decimal(38,0)) * n_x * n_y as string)")
          .as("lift_den"))
      .withColumn("lift",
        col("lift_num").cast("double") / col("lift_den").cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(col("lift").desc, col("bigram"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("bigram"), col("n_xy"), col("n_x"), col("n_y"),
        col("lift_num"), col("lift_den"), col("lift"))
      .orderBy(col("rank"))
  }

  /** Heaps-law vocabulary-growth curve: the corpus is cut into 10
    * equi-width doc_id checkpoint buckets, and each checkpoint reports
    * cumulative docs seen vs cumulative distinct vocabulary — a term
    * counts at the bucket of its FIRST document (one min-aggregate,
    * the same first-occurrence trick as [[txtNovelty]]). Sublinear
    * growth is the expected heavy-tail signature; a near-linear curve
    * flags synthetic or templated text. All integers; the cumsum
    * window is 10 rows. */
  def txtVocabGrowth(spark: SparkSession, dir: String, nBuckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = Tables.documents(spark, dir).select(col("doc_id"))
    val bktOf = CorpusPipeline.equiWidthBucket(ids, "doc_id", nBuckets)
    val docCounts = ids.withColumn("b", bktOf)
      .groupBy(col("b")).agg(count(lit(1)).as("docs"))
    val termCounts = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("term")).agg(min(col("doc_id")).as("doc_id"))
      .withColumn("b", bktOf)
      .groupBy(col("b")).agg(count(lit(1)).as("new_terms"))
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docCounts.join(termCounts, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("docs"), lit(0L)).as("docs"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .select(col("b").as("bucket"), sum(col("docs")).over(w).as("docs_cum"),
        col("new_terms"), sum(col("new_terms")).over(w).as("vocab_cum"))
      .orderBy(col("bucket"))
  }

  /** Zipf's-law rank-constant audit per language: for the top-k terms,
    * freq·rank should be roughly constant (≈ the Zipf normalizer) —
    * a cheap sanity probe that a corpus slice has natural-language
    * frequency structure rather than templated/synthetic text. The
    * rank·freq product is an exact integer (no log–log fit), and the
    * per-language top-k runs on the aggregated vocab table (bounded by
    * vocabulary, not corpus size) through the row_number()<=k pattern
    * the TopKPerGroupRewrite rule lowers onto the bounded-heap
    * operator. */
  /** Precision/recall curve for the English-detector gate: sweep the
    * stopword-hit threshold t and report the confusion counts against
    * the labeled `lang` column — the calibration table you read before
    * picking any quality/language gate's cutoff (the gate itself is
    * txt_langid's s_en feature). One scan computes the feature, an
    * 8-row threshold table cross-joins (broadcast) and the counts
    * aggregate map-side; precision/recall are single divisions of
    * exact integers. */
  def txtPrCurve(spark: SparkSession, dir: String, maxT: Int = 8): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(($"lang" === "en").as("is_en"),
        expr(s"cast(size(filter(split(text, ' '), x -> x IN ${inList(Stopwords)})) as bigint)")
          .as("s_en"))
    scored
      .select($"is_en", $"s_en", explode(expr(s"sequence(1, $maxT)")).as("thr"))
      .groupBy($"thr")
      .agg(
        sum(when($"s_en" >= $"thr" && $"is_en", 1L).otherwise(0L)).as("tp"),
        sum(when($"s_en" >= $"thr" && !$"is_en", 1L).otherwise(0L)).as("fp"),
        sum(when($"s_en" < $"thr" && $"is_en", 1L).otherwise(0L)).as("fn"),
        sum(when($"s_en" < $"thr" && !$"is_en", 1L).otherwise(0L)).as("tn"))
      .select($"thr".cast("long").as("t"), $"tp", $"fp", $"fn", $"tn",
        expr("cast(tp as double) / cast(tp + fp as double)").as("precision"),
        expr("cast(tp as double) / cast(tp + fn as double)").as("recall"))
      .orderBy($"t")
  }

  private implicit class DollarT(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }

  /** Sentence-structure profile per language: sentence counts from
    * terminal-punctuation runs (`[.!?]+` — same RE2/Java-compatible
    * class both engines), words per sentence as an exact integer
    * micro-ratio. Pure map-side projection into a 4-group aggregate —
    * fuses into the scan at any corpus size. */
  def txtSentenceStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        expr("cast(regexp_count(text, '[.!?]+') as bigint)").as("sent"),
        expr("cast(size(filter(split(text, ' '), x -> x != '')) as bigint)").as("words"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("sent")).as("n_sentences"),
        sum(col("words")).as("n_words"),
        max(col("sent")).as("max_sent_per_doc"))
      .withColumn("sent_per_doc_micro", expr("n_sentences * 1000000 div n_docs"))
      .withColumn("words_per_sent_micro", expr(
        "CASE WHEN n_sentences = 0 THEN NULL ELSE n_words * 1000000 div n_sentences END"))
      .orderBy(col("lang"))

  /** Interpolated Kneser–Ney bigram probability as ONE exact rational —
    * the actual smoothed LM probability, not just its count tables
    * ([[txtKnCounts]]). With discount d = 3/4 every term has the common
    * denominator 4·c(w1·)·B (B = distinct bigram types), so
    * P_KN(w2|w1) = [(4c−3)·B + 3·N1+(w1,·)·N1+(·,w2)] / [4·c(w1·)·B]
    * — integer numerator and denominator, no float anywhere (c ≥ 1 in
    * the bigram table, so the max(c−d, 0) clamp is vacuous). Three
    * count aggregates reuse the bigram shuffle; the 1-row B total
    * broadcasts. Top-k by count, deterministic ties.
    *
    * p_num/p_den ride the exact-decimal STRING path (r9: the r8 sf1
    * audit measured their int64 runway at 3.2e3×/5.4e3×SF — the
    * shortest left on the BIGINT edge — c·B-class products grow ~SF²
    * on dup-dense corpora): DECIMAL(38,0) internally, digit strings at
    * the output edge, so no deployment SF can overflow it and the r7
    * fail-loud raise_error guard is no longer needed. */
  def txtKnProb(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val bi = TextOps.balanced(Tables.documents(spark, dir))
      .select(explode(TextOps.ngramArray("text", 2)).as("bg"))
      .select(expr("split(bg, ' ')[0]").as("w1"), expr("split(bg, ' ')[1]").as("w2"))
    val counts = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val prefix = counts.groupBy(col("w1"))
      .agg(sum(col("c")).as("cw1"), count(lit(1)).as("n_follow"))
    val contin = counts.groupBy(col("w2")).agg(count(lit(1)).as("n_precede"))
    val btot = counts.agg(count(lit(1)).as("b_types"))
    counts.join(prefix, "w1").join(contin, "w2").crossJoin(broadcast(btot))
      .select(col("w1"), col("w2"), col("c"), col("cw1"),
        col("n_follow"), col("n_precede"), col("b_types"),
        expr("cast(cast(4 * c - 3 as decimal(38,0)) * b_types" +
          " + cast(3 as decimal(38,0)) * n_follow * n_precede as string)").as("p_num"),
        expr("cast(cast(4 as decimal(38,0)) * cw1 * b_types as string)").as("p_den"))
      .orderBy(col("c").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Per-DOCUMENT keyword extraction: top-3 terms by tf·idf within each
    * doc — the document-tagging twin of the per-language [[txtTopTerms]].
    * The ranking window is doc-keyed (row_number ≤ k, auto-rewritten to
    * the bounded-heap TopKPerGroup under the production extensions), so
    * the exchange carries ≤ 3 rows per document. The score is one
    * product and one division of exact integers — bit-identical doubles
    * in both engines, ties broken by term. */
  def txtDocKeywords(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"), explode(TextOps.tokens("text")).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf").cast("double") * col("n_total") / col("df"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Tokenizer fertility per language: BPE-ish tokens per whitespace
    * word (the multilingual-tokenizer cost metric — high fertility
    * means a language pays more sequence length per word). Both counts
    * are the gated [[txtTokens]] integers aggregated per language; the
    * ratio is an exact micro-division. Pure map-side projection into a
    * language-keyed aggregate. */
  def txtFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        expr("cast(size(filter(split(text, ' '), x -> x != '')) as bigint)").as("ws"),
        expr("cast(size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) as bigint)").as("bpe"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("n_ws_tokens"),
        sum(col("bpe")).as("n_bpe_tokens"))
      .withColumn("fertility_micro", expr(
        "CASE WHEN n_ws_tokens = 0 THEN NULL ELSE n_bpe_tokens * 1000000 div n_ws_tokens END"))
      .orderBy(col("lang"))

  /** Character-trigram language ID — the second LID tier above the
    * stopword heuristic ([[txtLangid]]): per-language trigram profiles
    * (top-100 by count, deterministic ties) are learned from the
    * labeled corpus and broadcast; every document scores each
    * language by the EXACT integer dot product of its trigram counts
    * against RANK weights 101−rank (the Cavnar–Trenkle out-of-place
    * device — rank weights are corpus-size-invariant, where raw
    * profile counts let the largest language's magnitudes win every
    * product) — argmin over (−score, lang) picks the prediction with
    * no float anywhere. Output is the confusion
    * matrix vs the labels. At 100 TB: profiles are a k·|langs|-row
    * broadcast; the corpus passes once, keyed shuffles only on
    * (doc, trigram) count pairs that HIT a profile trigram. */
  def txtLidTrigram(spark: SparkSession, dir: String, profileK: Int = 100): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // trigrams come from the native CharNgrams kernel — one O(bytes)
    // codegen call per row (empty for sub-3-char docs, code-point
    // safe). The HOF `transform(sequence(...), i -> substring(text,
    // i, 3))` form it replaces was O(len²) per doc (substring re-scans
    // the UTF8String per position) and interpreted — it was most of
    // the operator's 37 s at sf1; value parity is pinned in spec.
    val tri = docs.select(col("doc_id"), col("lang"),
      explode(org.apache.spark.sql.graft.TextExpressions.charNgrams(
        col("text"), 3)).as("tri"))
    // NO corpus-sized shuffle anywhere (r11 — the sf1 cost was the
    // (doc, tri) count shuffle, ~50M rows, not the explode):
    //  - profile pass: explode → partial agg collapses to the trigram
    //    VOCAB per partition map-side, so the (lang, tri) exchange is
    //    vocab-bounded;
    //  - scoring pass: Σ_tri dc·w  =  Σ_occurrences w, so raw trigram
    //    OCCURRENCES join the broadcast profile directly — no per-doc
    //    pre-count — and the partial agg collapses to ≤ |langs| rows
    //    per doc per partition before the only remaining shuffle.
    // The explode runs once per pass; map-side work beats shuffling
    // the corpus (pinned in PlanSpec: no exchange keyed by doc & tri).
    val wP = org.apache.spark.sql.expressions.Window
      .partitionBy(col("plang")).orderBy(col("pc").desc, col("tri"))
    val profile = tri.groupBy(col("lang").as("plang"), col("tri"))
      .agg(count(lit(1)).as("pc"))
      .withColumn("rn", row_number().over(wP))
      .filter(col("rn") <= profileK)
      .select(col("plang"), col("tri"), (lit(profileK + 1) - col("rn")).as("w"))
    // LONG score sum: score = Σ_occurrences w ≤ 100 · doc length —
    // nowhere near int64; a DECIMAL accumulator here cost an object
    // add per hit row (the fanout makes hits ≈ 3× occurrences)
    val pred = tri.join(broadcast(profile), "tri")
      .groupBy(col("doc_id"), col("plang"))
      .agg(sum(expr("cast(w as bigint)")).as("score"))
      .groupBy(col("doc_id"))
      .agg(expr("min_by(plang, named_struct('s', -score, 'l', plang))").as("pred_lang"))
    docs.select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"), "left")
      .na.fill("unk", Seq("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Corpus perplexity per language under its own unigram LM — the
    * entropy-tier quality gate a pretraining pipeline filters on,
    * made EXACTLY gateable by the fixed-point log2 expression
    * (org.apache.spark.sql.graft.Log2Fixed, scale 2²⁰): both engines
    * run the identical integer digit recurrence, so the scaled
    * cross-entropy numerator H_num = N·lg(N) − Σ_w c_w·lg(c_w)
    * (lg = log2_fixed) is ONE exact integer — no float log ever
    * forms, closing the r5 "entropy tier" gap without breaking the
    * float-parity policy. bits/token ×10⁶ is an exact integer
    * division at the edge; perplexity = 2^(bits/token) is the
    * consumer's one exponential. Vocab-keyed aggregate: the log
    * runs per TYPE (vocab-bounded), never per token. */
  def txtPerplexity(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(expr(s"cast(c as decimal(38,0)) * ${lgShift("c")}")).as("_sclg"))
      .select(col("lang"), col("n_types"), col("n_tokens"),
        expr(s"cast(cast(n_tokens as decimal(38,0)) * ${lgShift("n_tokens")} - _sclg as bigint)")
          .as("h_num"),
        expr(s"cast(cast(cast(n_tokens as decimal(38,0)) * ${lgShift("n_tokens")} - _sclg as decimal(38,0))" +
          " * 1000000 div (cast(n_tokens as decimal(38,0)) * 1048576) as bigint)")
          .as("bits_per_token_micro"))
      .orderBy(col("lang"))

  /** Pairwise KL divergence between language unigram distributions
    * (add-one smoothing over the GLOBAL vocab), in the same exact
    * fixed-point-log2 integers as [[txtPerplexity]]: per ordered pair
    * (a<b), KL(a‖b)·(N_a+V)·2²⁰ = Σ_w (c_aw+1)·[lg(c_aw+1) + lg(N_b+V)
    * − lg(c_bw+1) − lg(N_a+V)] — the DECOMPOSED log form keeps every
    * log2_fixed argument ≤ max(c)+1 (domain-safe to ~2⁴³ tokens per
    * language; the product form would breach at sf1). Terms with
    * c=0 on both sides collapse to a closed form ×(V − |union vocab|).
    * Work is vocab²-free: one full-outer join per pair on the term
    * key, langs are ≤5 so the pair fan-out is bounded. Output: both
    * directions' exact numerators + micro-bit readouts. */
  /** Shared pair machinery for the divergence queries: per-ordered-
    * lang-pair union-vocab count rows (la, lb, ca, cb) + the broadcast
    * pair grid (la, lb, n_a, n_b, v_glob). The fan is ≤ |langs| per
    * count row; the full-outer runs on the term key. */
  private def langPairUnion(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val counts = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("n_tok"))
    val pairsGrid = totals.select(col("lang").as("la"), col("n_tok").as("n_a"))
      .crossJoin(totals.select(col("lang").as("lb"), col("n_tok").as("n_b")))
      .filter(col("la") < col("lb"))
      .crossJoin(counts.select(col("term")).distinct()
        .agg(count(lit(1)).as("v_glob")))
    // per-pair union vocab: fan each lang's counts to its pairs (the
    // pair grid broadcasts — ≤ |langs|² rows), full-outer on the term
    val aSide = counts.select(col("lang").as("la"), col("term"), col("c").as("ca"))
      .join(broadcast(pairsGrid.select(col("la"), col("lb"))), Seq("la"))
    val bSide = counts.select(col("lang").as("lb"), col("term"), col("c").as("cb"))
      .join(broadcast(pairsGrid.select(col("la"), col("lb"))), Seq("lb"))
    val union = aSide.join(bSide, Seq("la", "lb", "term"), "full_outer")
      .select(col("la"), col("lb"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    (union, pairsGrid)
  }

  def txtKlDivergence(spark: SparkSession, dir: String): DataFrame = {
    val (union, pairsGrid) = langPairUnion(spark, dir)
    // Σ_union (c_x+1)·(lg(c_x+1) − lg(c_y+1)); the all-vocab remainder
    // collapses to (N_x+V)·(lg(N_y+V) − lg(N_x+V)) because
    // Σ_V (c_x+1) = N_x+V and zero-both terms cancel in the sum
    union.groupBy(col("la"), col("lb"))
      .agg(count(lit(1)).as("n_union"),
        sum(expr(s"cast(ca + 1 as decimal(38,0))" +
          s" * (${lgShift("ca + 1")} - ${lgShift("cb + 1")})")).as("_sab"),
        sum(expr(s"cast(cb + 1 as decimal(38,0))" +
          s" * (${lgShift("cb + 1")} - ${lgShift("ca + 1")})")).as("_sba"))
      .join(broadcast(pairsGrid), Seq("la", "lb"))
      .select(col("la").as("lang_a"), col("lb").as("lang_b"),
        col("n_a"), col("n_b"), col("v_glob"), col("n_union"),
        expr(s"cast(_sab + cast(n_a + v_glob as decimal(38,0))" +
          s" * (${lgShift("n_b + v_glob")} - ${lgShift("n_a + v_glob")}) as bigint)")
          .as("kl_ab_num"),
        expr(s"cast(_sba + cast(n_b + v_glob as decimal(38,0))" +
          s" * (${lgShift("n_a + v_glob")} - ${lgShift("n_b + v_glob")}) as bigint)")
          .as("kl_ba_num"))
      // sign-split integer division: Spark `div` truncates toward zero
      // while DuckDB `//` floors — on the (theoretically possible)
      // negative near-zero numerator the abs/sign form is engine-equal
      .withColumn("kl_ab_micro", expr(
        "cast((CASE WHEN kl_ab_num < 0 THEN -1 ELSE 1 END)" +
          " * (cast(abs(kl_ab_num) as decimal(38,0)) * 1000000" +
          " div (cast(n_a + v_glob as decimal(38,0)) * 1048576)) as bigint)"))
      .withColumn("kl_ba_micro", expr(
        "cast((CASE WHEN kl_ba_num < 0 THEN -1 ELSE 1 END)" +
          " * (cast(abs(kl_ba_num) as decimal(38,0)) * 1000000" +
          " div (cast(n_b + v_glob as decimal(38,0)) * 1048576)) as bigint)"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** Yule's K characteristic per language — the repeat-rate
    * completion of the lexical-diversity tier (TTR → hapax → Heaps →
    * Zipf → Simpson → THIS): K = 10⁴·(S₂ − N)/N² with S₂ = Σ_types c²
    * — Yule's vocabulary-richness constant, famously stable under
    * corpus growth where raw TTR collapses. All-integer: S₂ and N are
    * exact sums off the one term-count aggregate (map-side collapse,
    * same shuffle the whole tier shares), K emitted as the exact
    * rational (k_num = S₂ − N on the STRING path — Σc² is N²-class —
    * plus a micro division). */
  def txtYuleK(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(expr("cast(c as decimal(38,0)) * c")).as("s2"))
      .select(col("lang"), col("n_types"), col("n_tokens"),
        expr("cast(s2 - n_tokens as string)").as("k_num"),
        expr("cast(cast(s2 - n_tokens as decimal(38,0)) * 10000 * 1000000" +
          " div (cast(n_tokens as decimal(38,0)) * n_tokens) as bigint)")
          .as("k_micro"))
      .orderBy(col("lang"))

  /** Population-Stability-Index drift monitor per source — the
    * standard "did this source's shape move?" readout a continuously-
    * fed corpus pipeline alarms on: PSI(source ‖ corpus) =
    * Σ_b (p_b − q_b)·lg(p_b/q_b) over 32-token length buckets (the
    * pipe_length_buckets geometry), p = the source's distribution,
    * q = the corpus-wide reference, add-one smoothing over the global
    * bucket set so no cell is empty. All-integer fixed-point: with
    * D_s = N_s+B and D = N+B the per-bucket term is
    * [(c+1)·D − (r+1)·D_s] · [lg(c+1)+lg(D)−lg(r+1)−lg(D_s)] over the
    * common denominator D_s·D — every factor exact, lg on the shared
    * [[lgShift]] device, so both engines sum identical integers (the
    * per-bucket product is ≥ 0 mathematically, making the sum
    * monotone-meaningful). PSI is in BITS (lg, not ln — the engine's
    * convention across the information-theoretic tier). Scale: the
    * bucket table is ≤ a few dozen rows regardless of corpus size, so
    * past the first map-side count aggregate everything broadcasts;
    * psi_num is corpus²·lg-class → exact-decimal STRING output. */
  def pipeSourceDrift(spark: SparkSession, dir: String, step: Int = 32): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("source"), TextOps.tokens("text").as("t"))
      .filter(size(col("t")) > 0)
      .select(col("source"),
        expr(s"cast(((size(t) - 1) div $step + 1) * $step as bigint)").as("bucket"))
    val cell = d.groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c"))
    val ref = cell.groupBy(col("bucket")).agg(sum(col("c")).as("r"))
    val srcTot = cell.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val glob = ref.agg(sum(col("r")).as("n_tot"), count(lit(1)).as("b_buckets"))
    srcTot.crossJoin(broadcast(ref))
      .join(cell, Seq("source", "bucket"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(glob))
      .withColumn("diff", expr(
        "cast(c + 1 as decimal(38,0)) * (n_tot + b_buckets)" +
          " - cast(r + 1 as decimal(38,0)) * (n_s + b_buckets)"))
      .withColumn("lgdiff", expr(
        s"${lgShift("c + 1")} + ${lgShift("n_tot + b_buckets")}" +
          s" - ${lgShift("r + 1")} - ${lgShift("n_s + b_buckets")}"))
      .groupBy(col("source"), col("n_s"), col("n_tot"), col("b_buckets"))
      .agg(sum(expr("diff * lgdiff")).as("_num"))
      .select(col("source"), col("n_s"), col("n_tot"), col("b_buckets"),
        expr("cast(_num as string)").as("psi_num"),
        // sign-split micro division (lg rounding can leave a tiny
        // negative where the exact sum is ~0): engine-equal truncation
        expr("cast((CASE WHEN _num < 0 THEN -1 ELSE 1 END)" +
          " * (abs(_num) * 1000000 div (cast(n_s + b_buckets as decimal(38,0))" +
          " * (n_tot + b_buckets) * 1048576)) as bigint)").as("psi_micro"))
      .orderBy(col("source"))
  }

  /** Shift-extended fixed-point log2 as a SQL fragment: for arguments
    * that can pass log2_fixed's 2⁴³ domain (the JS mixture numerator
    * S_w = (c_a+1)·D_b + (c_b+1)·D_a is corpus×corpus), compute
    * lg(x) ≈ lg(x >> s) + s·2²⁰ with s = max(0, bitlen(x) − 43).
    * Deterministic in both engines (the oracle mirrors the same
    * shift-then-lookup), exact when s = 0 — which is every argument
    * at the gated SFs. */
  private def lgShift(x: String): String =
    // short-circuit the in-domain case: bin()'s string materialization
    // only runs past 2⁴³ (measured ~2× on the vocab-keyed aggregates
    // when unconditional); the oracle's greatest()-form computes the
    // same (s, arg) values either way
    s"(CASE WHEN ($x) < 8796093022208 THEN log2_fixed($x)" +
      s" ELSE log2_fixed(($x) div shiftleft(cast(1 as bigint), length(bin($x)) - 43))" +
      s" + cast(length(bin($x)) - 43 as bigint) * 1048576 END)"

  /** Pairwise Jensen–Shannon divergence between language unigram LMs —
    * the symmetric, bounded cousin of [[txtKlDivergence]] (the corpus-
    * similarity readout mixing policies actually compare on): with
    * p_x = (c_x+1)/D_x, D_x = N_x+V and m = (p_a+p_b)/2,
    * lg(p_a/m) = 2²⁰ + lg(c_a+1) + lg(D_b) − lg(S_w) over the common
    * numerator S_w = (c_a+1)·D_b + (c_b+1)·D_a — every term one
    * [[lgShift]] integer. Domain note: [[lgShift]] extends each LOG
    * argument past 2⁴³, but S_w itself is FORMED in int64 before the
    * shift; the c·D cross term passes 2⁶³ at roughly N ≈ 3·10⁹ tokens
    * per language (≈2³¹·⁵ — far below the 2⁴³ per-argument limit),
    * where non-ANSI Spark would wrap silently and DuckDB would error.
    * That is the operator's true domain ceiling; past it, shard the
    * corpus per language before pairing (the per-shard JS is the
    * mixing signal anyway). The zero-both vocab mass has the closed form
    * (V−|union|)·(2²⁰ + lg(D_x̄) − lg(D_a+D_b)) per direction. Emitted
    * as both directions' exact KL(x‖m) numerators at scale D_x·2²⁰
    * plus the combined JS micro-bits (decimal-internal cross-multiply;
    * sign-split division). Same vocab-keyed shapes as KL: one
    * full-outer on the term key, grid broadcast. */
  def txtJsDivergence(spark: SparkSession, dir: String): DataFrame = {
    val (union, pairsGrid) = langPairUnion(spark, dir)
    val terms = union.join(broadcast(pairsGrid), Seq("la", "lb"))
      .withColumn("d_a", expr("n_a + v_glob"))
      .withColumn("d_b", expr("n_b + v_glob"))
      .withColumn("s_w", expr("(ca + 1) * d_b + (cb + 1) * d_a"))
    val sums = terms.groupBy(col("la"), col("lb"))
      .agg(count(lit(1)).as("n_union"),
        sum(expr("cast(ca + 1 as decimal(38,0)) * (1048576" +
          s" + ${lgShift("ca + 1")} + ${lgShift("d_b")} - ${lgShift("s_w")})")).as("_ja"),
        sum(expr("cast(cb + 1 as decimal(38,0)) * (1048576" +
          s" + ${lgShift("cb + 1")} + ${lgShift("d_a")} - ${lgShift("s_w")})")).as("_jb"))
    sums.join(broadcast(pairsGrid), Seq("la", "lb"))
      .withColumn("d_a", expr("n_a + v_glob"))
      .withColumn("d_b", expr("n_b + v_glob"))
      .select(col("la").as("lang_a"), col("lb").as("lang_b"),
        col("n_a"), col("n_b"), col("v_glob"), col("n_union"),
        expr("cast(_ja + cast(v_glob - n_union as decimal(38,0)) * (1048576" +
          s" + ${lgShift("d_b")} - ${lgShift("d_a + d_b")}) as bigint)").as("js_a_num"),
        expr("cast(_jb + cast(v_glob - n_union as decimal(38,0)) * (1048576" +
          s" + ${lgShift("d_a")} - ${lgShift("d_a + d_b")}) as bigint)").as("js_b_num"),
        col("d_a"), col("d_b"))
      // JS = (js_a_num/D_a + js_b_num/D_b) / (2·2²⁰); cross-multiplied
      // into one exact rational, micro-scaled, sign-split division
      .withColumn("js_micro", expr(
        "cast((CASE WHEN cast(js_a_num as decimal(38,0)) * d_b + cast(js_b_num as decimal(38,0)) * d_a < 0 THEN -1 ELSE 1 END)" +
          " * (abs(cast(js_a_num as decimal(38,0)) * d_b + cast(js_b_num as decimal(38,0)) * d_a) * 1000000" +
          " div (cast(2 as decimal(38,0)) * d_a * d_b * 1048576)) as bigint)"))
      .drop("d_a", "d_b")
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** Per-document token-entropy quality gate — the C4-style
    * repetitiveness filter (templated/boilerplate docs score low):
    * H_doc = lg(n) − (1/n)·Σ c·lg(c) in the same exact fixed-point
    * integers as [[txtPerplexity]], flagged below `minBitsMicro`.
    * Pure per-doc map-side aggregation (doc-keyed counts collapse
    * before the log; the log runs per (doc, type) — bounded by doc
    * length, never corpus vocab × corpus size). */
  def txtEntropyFilter(spark: SparkSession, dir: String,
      minBitsMicro: Long = 3500000L): DataFrame =
    entropyFilterFrom(docTermCounts(spark, dir), minBitsMicro)

  /** Per-doc term counts (doc_id, lang, term, c) — the shared head of
    * the unigram quality tier ([[txtEntropyFilter]],
    * [[txtDocPerplexity]]); the funnel derives the same frame from its
    * one tagged n-gram pass. */
  private[operators] def docTermCounts(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("doc_id"), col("lang"), col("term"))
      .agg(count(lit(1)).as("c"))

  /** [[txtEntropyFilter]] body over a caller-supplied per-doc term
    * count frame — ONE definition of the gate arithmetic, whatever
    * derivation feeds it (the pipe_quality_verdict discipline). */
  private[operators] def entropyFilterFrom(docTerm: DataFrame,
      minBitsMicro: Long = 3500000L): DataFrame =
    docTerm
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(expr(s"c * ${lgShift("c")}")).as("_sclg"))
      .select(col("doc_id"), col("lang"), col("n_types"), col("n_tokens"),
        expr(s"n_tokens * ${lgShift("n_tokens")} - _sclg").as("h_num"),
        // decimal-internal micro division: h_num·10⁶ would pass int64
        // on ~10⁶-token documents
        expr(s"cast(cast(n_tokens * ${lgShift("n_tokens")} - _sclg as decimal(38,0))" +
          " * 1000000 div (cast(n_tokens as decimal(38,0)) * 1048576) as bigint)")
          .as("bits_per_token_micro"))
      .withColumn("low_entropy", col("bits_per_token_micro") < minBitsMicro)
      .orderBy(col("doc_id"))

  /** Per-document perplexity under the document's own language's
    * smoothed unigram reference LM — THE canonical pretraining
    * quality filter (out-of-distribution/noise docs score high),
    * exactly gateable via fixed-point log2:
    * bits(d) = lg(N_l+V_l) − (1/n_d)·Σ_w c_dw·lg(c_ref_w + 1),
    * emitted as the exact scaled numerator plus the micro-bits
    * integer division; flagged above `maxBitsMicro`. The reference
    * counts include the doc itself (the standard quick-filter form —
    * fully deterministic, no train/held-out split). 100 TB shape:
    * the log runs on the vocab-keyed reference table, per-doc terms
    * join it on (lang, term) — one shuffle on the term key, the
    * lang totals broadcast. */
  def txtDocPerplexity(spark: SparkSession, dir: String,
      maxBitsMicro: Long = 5000000L): DataFrame =
    docPerplexityFrom(docTermCounts(spark, dir), maxBitsMicro)

  /** [[txtDocPerplexity]] body over a caller-supplied per-doc term
    * count frame — one definition of the LM arithmetic for the
    * standalone operator and the funnel's shared-pass derivation. */
  private[operators] def docPerplexityFrom(docTerm: DataFrame,
      maxBitsMicro: Long = 5000000L): DataFrame = {
    // reference counts RE-AGGREGATE the per-doc counts (identical
    // values, Σc per (lang, term)) so the doc-term exchange appears in
    // both branches and ReusedExchange runs the tokenize scan ONCE —
    // deriving ref from toks directly re-exploded the whole corpus
    val ref = docTerm.groupBy(col("lang"), col("term"))
      .agg(sum(col("c")).as("cr"))
    val tot = ref.groupBy(col("lang"))
      .agg(count(lit(1)).as("v_l"), sum(col("cr")).as("n_l"))
    docTerm.join(ref, Seq("lang", "term"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(expr(s"cast(c as decimal(38,0)) * ${lgShift("cr + 1")}")).as("_sclg"))
      .join(broadcast(tot), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"cast(cast(n_tokens as decimal(38,0)) * ${lgShift("n_l + v_l")} - _sclg as bigint)")
          .as("ppl_num"),
        expr(s"cast(cast(cast(n_tokens as decimal(38,0)) * ${lgShift("n_l + v_l")} - _sclg as decimal(38,0))" +
          " * 1000000 div (cast(n_tokens as decimal(38,0)) * 1048576) as bigint)")
          .as("bits_micro"))
      .withColumn("high_perplexity", col("bits_micro") > maxBitsMicro)
      .orderBy(col("doc_id"))
  }

  /** DSIR-style per-document importance weight for targeted data
    * selection (public method: Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023 —
    * hashed-n-gram LM importance weights): score every document by
    * the average log-ratio of a TARGET unigram LM to the RAW corpus
    * LM, in the engine's exact fixed-point lg integers. The target
    * slice is `source = 'src0'` — the same held-out carve 31d's
    * decontamination treats as the benchmark, here used positively as
    * "data I want more of". With add-one smoothing over the RAW
    * per-language vocab (target ⊆ corpus so its vocab needs no union):
    * w_num(d) = Σ_t c_d(t)·[lg(c_T+1) − lg(c_R+1)]
    *            + n_d·[lg(N_R+V) − lg(N_T+V)]  (all ·2²⁰)
    * — terms the target never uses pull the weight down, exactly the
    * resampling intuition. Emitted as the exact numerator, per-token
    * micro-bits (sign-split division — engine-equal truncation), and
    * the `selected` flag above `minMicro` (default [[DsirMinMicro]] —
    * ONE definition shared by the batch op, the streaming gate and the
    * oracle; −0.05 bits/token sits at the measured per-doc weight
    * median so both classes are live at every gated SF).
    * 100 TB shape: both logs run on the VOCAB-keyed LM table — never
    * per token; doc terms join it on (lang, term) (one shuffle); the
    * per-lang totals broadcast; the raw LM re-aggregates the doc-term
    * counts so ReusedExchange tokenizes the corpus ONCE. The weight
    * numerator is doc-length-bounded (≤ n_d·64·2²⁰), so the BIGINT
    * edge is SF-independent. */
  def txtDsirWeights(spark: SparkSession, dir: String,
      minMicro: Long = DsirMinMicro): DataFrame = {
    val docTerm = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("doc_id"), col("lang"), col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    val raw = docTerm.groupBy(col("lang"), col("term"))
      .agg(sum(col("c")).as("cr"))
    val tgt = docTerm.filter(col("source") === "src0")
      .groupBy(col("lang"), col("term")).agg(sum(col("c")).as("ct"))
    val lm = raw.join(tgt, Seq("lang", "term"), "left")
      .select(col("lang"), col("term"), col("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    val tot = lm.groupBy(col("lang"))
      .agg(count(lit(1)).as("v_l"), sum(col("cr")).as("n_r"),
        sum(col("ct")).as("n_t"))
    docTerm.join(lm, Seq("lang", "term"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(expr(s"cast(c as decimal(38,0))" +
          s" * (${lgShift("ct + 1")} - ${lgShift("cr + 1")})")).as("_sdiff"))
      .join(broadcast(tot), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"cast(_sdiff + cast(n_tokens as decimal(38,0))" +
          s" * (${lgShift("n_r + v_l")} - ${lgShift("n_t + v_l")}) as bigint)")
          .as("w_num"))
      .withColumn("w_micro", expr(
        "cast((CASE WHEN w_num < 0 THEN -1 ELSE 1 END)" +
          " * (cast(abs(w_num) as decimal(38,0)) * 1000000" +
          " div (cast(n_tokens as decimal(38,0)) * 1048576)) as bigint)"))
      .withColumn("selected", col("w_micro") > minMicro)
      .orderBy(col("doc_id"))
  }

  /** The DSIR selection threshold in µbits/token — sourced here so the
    * batch operator, the streaming gate and the DuckDB oracle share
    * ONE definition (the CorpusPipeline.MinDocTokens discipline).
    * −0.05 bits/token ≈ the per-doc weight median on the synthetic
    * corpora (measured −55k/−65k µbits at sf0.001/sf0.01), so the
    * selected flag is two-class at every gated SF. */
  val DsirMinMicro: Long = -50000L

  /** The BIGRAM-feature DSIR threshold (µbits/bigram). Bigram LMs are
    * sparser, so per-doc weights sit lower and spread wider than the
    * unigram tier (measured medians −211k/−215k/−146k µbits at
    * sf0.001/0.01/0.1); −0.15 bits/bigram straddles at every SF. */
  val Dsir2MinMicro: Long = -150000L

  /** The per-language selection-list depth for [[pipeDsirTopk]]. */
  val DsirTopK: Int = 10

  /** DSIR selection short-list: the top-[[DsirTopK]] documents per
    * language by importance weight — the APPLY-side readout of
    * [[txtDsirWeights]] (which docs would an importance-resampling
    * pass actually pull first). Reuses the weight operator VERBATIM
    * (one threshold/constant set), ranks by (w_micro desc, doc_id)
    * for a deterministic total order, and prunes through the
    * bounded-heap TopKPerGroup rewrite — ≤ k rows per language cross
    * the exchange, the corpus-sized weight table never feeds a raw
    * per-language window. */
  def pipeDsirTopk(spark: SparkSession, dir: String,
      k: Int = DsirTopK): DataFrame = {
    val w = txtDsirWeights(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("w_micro"))
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      w, Seq("lang"), Seq(("w_micro", true), ("doc_id", false)), k)
    // the rank window consumes the ≤ k·|langs| pruned rows, never the
    // corpus-sized weight table
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("w_micro").desc, col("doc_id"))
    pruned.withColumn("sel_rank", row_number().over(win).cast("bigint"))
      .select(col("lang"), col("sel_rank"), col("doc_id"), col("n_tokens"),
        col("w_micro"))
      .orderBy(col("lang"), col("sel_rank"))
  }

  /** DSIR importance weight over the BIGRAM feature space — the
    * paper's actual hashed-n-gram form one level up from
    * [[txtDsirWeights]] (Xie et al. 2023 score documents on unigram+
    * bigram features; the unigram tier is the proven device, this is
    * the bigram half): per document,
    * w_num(d) = Σ_b c_d(b)·[lg(c_T(b)+1) − lg(c_R(b)+1)]
    *            + n_d·[lg(N_R+B) − lg(N_T+B)]  (all ·2²⁰)
    * with add-one smoothing over the RAW per-language bigram vocab B.
    * Same 100 TB shape as the unigram tier: logs on the BIGRAM-TYPE-
    * keyed LM table, doc bigrams join on (lang, w₁w₂), totals
    * broadcast, ReusedExchange bigramizes once. Emitted as the exact
    * numerator, per-bigram micro-bits (sign-split), and `selected`
    * above [[Dsir2MinMicro]]. */
  def txtDsirBigram(spark: SparkSession, dir: String,
      minMicro: Long = Dsir2MinMicro): DataFrame = {
    val docBg = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(TextOps.ngramArray("text", 2)).as("bg"))
      .groupBy(col("doc_id"), col("lang"), col("source"), col("bg"))
      .agg(count(lit(1)).as("c"))
    val raw = docBg.groupBy(col("lang"), col("bg"))
      .agg(sum(col("c")).as("cr"))
    val tgt = docBg.filter(col("source") === "src0")
      .groupBy(col("lang"), col("bg")).agg(sum(col("c")).as("ct"))
    val lm = raw.join(tgt, Seq("lang", "bg"), "left")
      .select(col("lang"), col("bg"), col("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    val tot = lm.groupBy(col("lang"))
      .agg(count(lit(1)).as("b_l"), sum(col("cr")).as("n_r"),
        sum(col("ct")).as("n_t"))
    docBg.join(lm, Seq("lang", "bg"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(expr(s"cast(c as decimal(38,0))" +
          s" * (${lgShift("ct + 1")} - ${lgShift("cr + 1")})")).as("_sdiff"))
      .join(broadcast(tot), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        expr(s"cast(_sdiff + cast(n_bigrams as decimal(38,0))" +
          s" * (${lgShift("n_r + b_l")} - ${lgShift("n_t + b_l")}) as bigint)")
          .as("w_num"))
      .withColumn("w_micro", expr(
        "cast((CASE WHEN w_num < 0 THEN -1 ELSE 1 END)" +
          " * (cast(abs(w_num) as decimal(38,0)) * 1000000" +
          " div (cast(n_bigrams as decimal(38,0)) * 1048576)) as bigint)"))
      .withColumn("selected", col("w_micro") > minMicro)
      .orderBy(col("doc_id"))
  }

  /** Conditional bigram entropy H(w₂|w₁) per language — the bigram-LM
    * extension of [[txtPerplexity]]'s unigram tier: how predictable is
    * the next word given the previous one (templated/boilerplate
    * corpora score near zero; diverse prose scores high). Via the
    * chain rule H(W₂|W₁) = H(W₁,W₂) − H(W₁), both terms collapse to
    * the same exact fixed-point device: with bigram counts c(w₁,w₂),
    * prefix counts c(w₁)=Σ_w₂ c, and N total bigrams,
    * H_cond·N·2²⁰ = Σ_w₁ c(w₁)·lg(c(w₁)) − Σ c(w₁,w₂)·lg(c(w₁,w₂)),
    * every lg one [[lgShift]] integer. Nonnegativity is EXACT even
    * under lg truncation (lg monotone ⇒ Σ_w₂ c·lg_f(c) ≤ c(w₁)·
    * lg_f(c(w₁))), so the micro division needs no sign split. The
    * log runs on BIGRAM-TYPE-keyed aggregates, never per token —
    * the same vocab-bounded discipline as the unigram tier. */
  def txtCondEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.ngramArray("text", 2)).as("bg"))
      .select(col("lang"),
        expr("split(bg, ' ')[0]").as("w1"), expr("split(bg, ' ')[1]").as("w2"))
      .groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val joint = counts.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_bigram_types"),
        sum(col("c")).as("n_bigrams"),
        sum(expr(s"cast(c as decimal(38,0)) * ${lgShift("c")}")).as("_sbg"))
    // prefix marginal re-aggregates the bigram counts (identical values)
    // so the bigram-count exchange appears in both branches and
    // ReusedExchange runs the tokenize scan once (txtDocPerplexity form)
    val prefix = counts.groupBy(col("lang"), col("w1"))
      .agg(sum(col("c")).as("cw1"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_prefix_types"),
        sum(expr(s"cast(cw1 as decimal(38,0)) * ${lgShift("cw1")}")).as("_spre"))
    joint.join(prefix, Seq("lang"))
      .select(col("lang"), col("n_bigrams"), col("n_bigram_types"), col("n_prefix_types"),
        expr(s"cast(cast(n_bigrams as decimal(38,0)) * ${lgShift("n_bigrams")} - _sbg as bigint)")
          .as("h_joint_num"),
        expr("cast(_spre - _sbg as bigint)").as("h_cond_num"),
        expr(s"cast(cast(cast(n_bigrams as decimal(38,0)) * ${lgShift("n_bigrams")} - _sbg as decimal(38,0))" +
          " * 1000000 div (cast(n_bigrams as decimal(38,0)) * 1048576) as bigint)")
          .as("joint_bits_micro"),
        expr("cast(cast(_spre - _sbg as decimal(38,0))" +
          " * 1000000 div (cast(n_bigrams as decimal(38,0)) * 1048576) as bigint)")
          .as("cond_bits_micro"))
      .orderBy(col("lang"))
  }

  /** Per-doc bigram counts (doc_id, lang, w1, w2, c_d) — the shared
    * head of the KN tier. */
  private def docBigramCounts(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), explode(TextOps.ngramArray("text", 2)).as("bg"))
      .select(col("doc_id"), col("lang"),
        expr("split(bg, ' ')[0]").as("w1"), expr("split(bg, ' ')[1]").as("w2"))
      .groupBy(col("doc_id"), col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_d"))

  /** The per-(lang, w1, w2) KN SURPRISAL table bits_w =
    * lg(p_den) − lg(p_num) over the given doc-bigram counts — shared
    * by [[txtDocKnPerplexity]] and the streaming lake write
    * (Streams.knLmWrite), so the persisted scores are bit-identical
    * to the batch filter's by construction. */
  private[graft] def knLmBits(docBg: DataFrame): DataFrame = {
    val counts = docBg.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(sum(col("c_d")).as("c"))
    // r15: marginals back to groupBy + join-back AGGREGATES — the r14
    // whole-partition-window form (one exchange per marginal) won at
    // sf0.1 but REVERSED at sf1 (window 8.2 s vs aggregate 5.3 s,
    // two runs each, plans/r15): the window ships every type row and
    // sorts it inside each (lang, w_i) partition, while the aggregate
    // partial-aggregates map-side and joins back a vocab-sized table —
    // the shape that keeps winning as the type table grows (guide §2.3
    // "aggregate before you shuffle"; the r14 VERDICT's flagged skew
    // risk resolved by measurement, not argument).
    val prefix = counts.groupBy(col("lang"), col("w1"))
      .agg(sum(col("c")).as("cw1"), count(lit(1)).as("n_follow"))
    val contin = counts.groupBy(col("lang"), col("w2"))
      .agg(count(lit(1)).as("n_precede"))
    val btot = counts.groupBy(col("lang")).agg(count(lit(1)).as("b_types"))
    counts
      .join(prefix, Seq("lang", "w1")).join(contin, Seq("lang", "w2"))
      .join(broadcast(btot), Seq("lang"))
      .select(col("lang"), col("w1"), col("w2"),
        // fail-loud past the documented c·B < 2⁶¹ ceiling: the plain
        // decimal→bigint cast is non-ANSI (NULL on overflow), which
        // would silently DROP the bigram from every per-doc sum while
        // the DuckDB oracle errors loudly — guard so both engines fail
        // the same way (shard per language past this point)
        expr("CASE WHEN cast(4 * c - 3 as decimal(38,0)) * b_types" +
          " + cast(3 as decimal(38,0)) * n_follow * n_precede" +
          " < cast(9223372036854775807 as decimal(38,0))" +
          " THEN cast(cast(4 * c - 3 as decimal(38,0)) * b_types" +
          " + cast(3 as decimal(38,0)) * n_follow * n_precede as bigint)" +
          " ELSE cast(raise_error('knLmBits: KN numerator (4c-3)*B + 3*n1f*n1p" +
          " exceeds int64 - shard the LM per language') as bigint) END").as("p_num"),
        col("cw1"), col("b_types"))
      .select(col("lang"), col("w1"), col("w2"),
        expr(s"2097152 + ${lgShift("cw1")} + ${lgShift("b_types")}" +
          s" - ${lgShift("p_num")}").as("bits_w"))
  }

  /** The shared head for the streaming lake write — public face of
    * [[knLmBits]] over the corpus at `dir`. */
  def knBigramBits(spark: SparkSession, dir: String): DataFrame =
    knLmBits(docBigramCounts(spark, dir))

  /** Per-document perplexity under the document's language's
    * INTERPOLATED KNESER–NEY BIGRAM LM — the stronger canonical
    * pretraining quality filter above [[txtDocPerplexity]]'s unigram
    * reference: P_KN(w₂|w₁) = (c−¾)/c(w₁) + ¾·(n_follow/c(w₁))·
    * (n_precede/B), the exact rational the repo already gates
    * globally as `txt_kn_prob` (p_num/p_den with d=¾), here built
    * PER LANGUAGE (see [[knLmBits]]). Per doc-bigram,
    * bits = lg(p_den) − lg(p_num); the denominator 4·c(w₁)·B is a
    * pure product, so it DECOMPOSES exactly:
    * lg(p_den) ≐ 2·2²⁰ + lg(c(w₁)) + lg(B) — no corpus² integer ever
    * forms on that side (the KL/JS discipline). The numerator
    * (4c−3)·B + 3·n_follow·n_precede is irreducible and is formed in
    * int64: its domain ceiling is c·B < 2⁶¹ (past it, shard per
    * language — same ceiling class as the JS mixture numerator,
    * documented there). Reference counts include the doc itself (the
    * deterministic quick-filter form, as [[txtDocPerplexity]]).
    * 100 TB shape: lg runs on the BIGRAM-TYPE-keyed LM table; doc
    * bigrams join it on (lang,w₁,w₂) — one shuffle on the bigram key;
    * per-lang B broadcast. The micro division is SIGN-SPLIT: near-
    * deterministic docs can sum a few negative lg-truncation ulps. */
  def txtDocKnPerplexity(spark: SparkSession, dir: String,
      maxBitsMicro: Long = 5000000L): DataFrame =
    docKnPerplexityFrom(docBigramCounts(spark, dir), maxBitsMicro)

  /** [[txtDocKnPerplexity]] body over a caller-supplied per-doc bigram
    * count frame — one definition of the KN gate arithmetic for the
    * standalone operator and the funnel's shared-pass derivation. */
  private[operators] def docKnPerplexityFrom(docBg: DataFrame,
      maxBitsMicro: Long = 5000000L): DataFrame = {
    // the reference LM re-aggregates the per-doc counts (identical
    // values) — the doc-bigram exchange appears in both branches and
    // ReusedExchange runs the tokenize scan ONCE (txtDocPerplexity form)
    val lm = knLmBits(docBg)
    docBg.join(lm, Seq("lang", "w1", "w2"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c_d")).as("n_bigrams"),
        sum(expr("cast(c_d as decimal(38,0)) * bits_w")).as("_sb"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        expr("cast(_sb as bigint)").as("kn_bits_num"),
        expr("cast((CASE WHEN _sb < 0 THEN -1 ELSE 1 END)" +
          " * (abs(cast(_sb as decimal(38,0))) * 1000000" +
          " div (cast(n_bigrams as decimal(38,0)) * 1048576)) as bigint)")
          .as("bits_micro"))
      .withColumn("high_perplexity", col("bits_micro") > maxBitsMicro)
      .orderBy(col("doc_id"))
  }

  /** Conditional TRIGRAM entropy H(w₃|w₁w₂) per language — the
    * third LM tier above [[txtCondEntropy]]'s H(w₂|w₁): by the chain
    * rule H(w₃|w₁w₂) = H(w₁w₂w₃) − H(w₁w₂), so both numerators share
    * the Σ c·lg(c) device over the TRIGRAM-TYPE table and the prefix
    * marginal re-aggregates the same counts (identical values) so the
    * trigram-count exchange appears in both branches and ReusedExchange
    * runs the tokenize scan once ([[txtCondEntropy]] form). H is
    * monotone under lg truncation exactly as the bigram tier
    * (Σ_w₃ c·lg_f(c) ≤ c(w₁w₂)·lg_f(c(w₁w₂))), so the micro division
    * needs no sign split. The log runs on TRIGRAM-TYPE-keyed
    * aggregates, never per token — vocab-bounded at 100 TB. */
  def txtCondEntropy3(spark: SparkSession, dir: String): DataFrame = {
    val counts = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.ngramArray("text", 3)).as("tg"))
      .select(col("lang"),
        expr("split(tg, ' ')[0]").as("w1"), expr("split(tg, ' ')[1]").as("w2"),
        expr("split(tg, ' ')[2]").as("w3"))
      .groupBy(col("lang"), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c"))
    val joint = counts.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_trigram_types"),
        sum(col("c")).as("n_trigrams"),
        sum(expr(s"cast(c as decimal(38,0)) * ${lgShift("c")}")).as("_stg"))
    val prefix = counts.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(sum(col("c")).as("cw12"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_prefix_types"),
        sum(expr(s"cast(cw12 as decimal(38,0)) * ${lgShift("cw12")}")).as("_spre"))
    joint.join(prefix, Seq("lang"))
      .select(col("lang"), col("n_trigrams"), col("n_trigram_types"), col("n_prefix_types"),
        expr(s"cast(cast(n_trigrams as decimal(38,0)) * ${lgShift("n_trigrams")} - _stg as bigint)")
          .as("h_joint_num"),
        expr("cast(_spre - _stg as bigint)").as("h_cond_num"),
        expr(s"cast(cast(cast(n_trigrams as decimal(38,0)) * ${lgShift("n_trigrams")} - _stg as decimal(38,0))" +
          " * 1000000 div (cast(n_trigrams as decimal(38,0)) * 1048576) as bigint)")
          .as("joint_bits_micro"),
        expr("cast(cast(_spre - _stg as decimal(38,0))" +
          " * 1000000 div (cast(n_trigrams as decimal(38,0)) * 1048576) as bigint)")
          .as("cond_bits_micro"))
      .orderBy(col("lang"))
  }

  /** Per-doc trigram counts (doc_id, lang, w1, w2, w3, c_d) — the
    * shared head of the KN-trigram tier. */
  private def docTrigramCounts(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), explode(TextOps.ngramArray("text", 3)).as("tg"))
      .select(col("doc_id"), col("lang"),
        expr("split(tg, ' ')[0]").as("w1"), expr("split(tg, ' ')[1]").as("w2"),
        expr("split(tg, ' ')[2]").as("w3"))
      .groupBy(col("doc_id"), col("lang"), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c_d"))

  /** The per-(lang, w1, w2, w3) interpolated KNESER–NEY TRIGRAM
    * surprisal table bits_w = lg(p_den) − lg(p_num), discount d = ¾ at
    * BOTH levels of the recursion:
    *
    *   P(w₃|w₁w₂) = (c−¾)/c₁₂ + ¾·(N₁₊(w₁w₂·)/c₁₂)·P'(w₃|w₂)
    *   P'(w₃|w₂)  = (c'−¾)/N₁₊(·w₂·) + ¾·(N₁₊'(w₂·)/N₁₊(·w₂·))·(N₁₊(·w₃)/B)
    *
    * with continuation counts from the trigram-TYPE table (standard
    * KN: level-k counts are type counts of the (k+1)-gram table):
    * c' = N₁₊(·w₂w₃) [distinct w₁], N₁₊(·w₂·) = Σ_w₃ c', N₁₊'(w₂·) =
    * distinct w₃ after w₂, N₁₊(·w₃) = distinct w₂ before w₃, B =
    * distinct (w₂,w₃) pairs. Every term then has the common
    * denominator p_den = 16·c₁₂·N₁₊(·w₂·)·B, a pure product that
    * DECOMPOSES exactly: lg(p_den) ≐ 4·2²⁰ + lg(c₁₂) + lg(N₁₊(·w₂·))
    * + lg(B) — no corpus³ integer ever forms on that side. The
    * numerator
    *   p_num = (4c−3)·4·m₂·B + 3·f₁₂·((4c'−3)·B + 3·f₂'·p₃)
    * is irreducible and formed in int64 behind the same fail-loud
    * overflow guard as [[knLmBits]] (domain ceiling ~16·c·m₂·B < 2⁶³;
    * past it, shard per language). Both clamps max(·−¾, 0) are vacuous
    * because c ≥ 1 and c' ≥ 1 in the type tables. All aggregates are
    * TYPE-keyed (vocab-bounded); the per-lang B is broadcast. */
  private[graft] def kn3LmBits(docTg: DataFrame): DataFrame = {
    val counts = docTg.groupBy(col("lang"), col("w1"), col("w2"), col("w3"))
      .agg(sum(col("c_d")).as("c"))
    // r15: marginals back to the groupBy + join-back AGGREGATE chain —
    // the r14 window form reversed at sf1 (12.1 s window vs 8.8-10.4 s
    // aggregate; see knLmBits note and plans/r15): map-side partial
    // aggregation of the vocab-sized marginal tables beats sorting the
    // whole type table inside each (lang, w_i) window partition as the
    // table grows. cont23's count(*) per (w2,w3) IS N1+(·w2w3) because
    // counts rows are distinct (w1,w2,w3) types.
    val prefix12 = counts.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(sum(col("c")).as("cw12"), count(lit(1)).as("n1f12"))
    val cont23 = counts.groupBy(col("lang"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c2p"))
    val mid2 = cont23.groupBy(col("lang"), col("w2"))
      .agg(sum(col("c2p")).as("nmid2"), count(lit(1)).as("nf2p"))
    val cont3 = cont23.groupBy(col("lang"), col("w3"))
      .agg(count(lit(1)).as("n1p3"))
    val btot = cont23.groupBy(col("lang")).agg(count(lit(1)).as("b_pairs"))
    counts
      .join(prefix12, Seq("lang", "w1", "w2"))
      .join(cont23, Seq("lang", "w2", "w3"))
      .join(mid2, Seq("lang", "w2"))
      .join(cont3, Seq("lang", "w3"))
      .join(broadcast(btot), Seq("lang"))
      .select(col("lang"), col("w1"), col("w2"), col("w3"),
        // fail-loud past the int64 ceiling, as [[knLmBits]]
        expr("CASE WHEN cast(4 * c - 3 as decimal(38,0)) * 4 * nmid2 * b_pairs" +
          " + cast(3 as decimal(38,0)) * n1f12" +
          " * (cast(4 * c2p - 3 as decimal(38,0)) * b_pairs + cast(3 as decimal(38,0)) * nf2p * n1p3)" +
          " < cast(9223372036854775807 as decimal(38,0))" +
          " THEN cast(cast(4 * c - 3 as decimal(38,0)) * 4 * nmid2 * b_pairs" +
          " + cast(3 as decimal(38,0)) * n1f12" +
          " * (cast(4 * c2p - 3 as decimal(38,0)) * b_pairs + cast(3 as decimal(38,0)) * nf2p * n1p3) as bigint)" +
          " ELSE cast(raise_error('kn3LmBits: KN-trigram numerator exceeds int64" +
          " - shard the LM per language') as bigint) END").as("p_num"),
        col("cw12"), col("nmid2"), col("b_pairs"))
      .select(col("lang"), col("w1"), col("w2"), col("w3"),
        expr(s"4194304 + ${lgShift("cw12")} + ${lgShift("nmid2")}" +
          s" + ${lgShift("b_pairs")} - ${lgShift("p_num")}").as("bits_w"))
  }

  /** The shared head for the streaming lake write — public face of
    * [[kn3LmBits]] over the corpus at `dir` (Streams.kn3LmWrite). */
  def kn3TrigramBits(spark: SparkSession, dir: String): DataFrame =
    kn3LmBits(docTrigramCounts(spark, dir))

  /** Per-document perplexity under the language's interpolated
    * KNESER–NEY TRIGRAM LM — the deepest tier of the quality-filter
    * ladder ([[txtDocPerplexity]] unigram → [[txtDocKnPerplexity]]
    * bigram → this): per doc-trigram, bits = lg(p_den) − lg(p_num)
    * from [[kn3LmBits]]; reference counts include the doc itself (the
    * deterministic quick-filter form shared by the whole ladder).
    * 100 TB shape: lg runs on the TRIGRAM-TYPE-keyed LM table; doc
    * trigrams join it on (lang,w₁,w₂,w₃) — one shuffle on the trigram
    * key; the per-doc rollup re-aggregates the SAME doc-trigram
    * counts, so the exchange is reused and the corpus tokenizes once.
    * The micro division is SIGN-SPLIT as in the bigram tier. */
  def txtDocKn3Perplexity(spark: SparkSession, dir: String,
      maxBitsMicro: Long = 4000000L): DataFrame = {
    val docTg = docTrigramCounts(spark, dir)
    val lm = kn3LmBits(docTg)
    docTg.join(lm, Seq("lang", "w1", "w2", "w3"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c_d")).as("n_trigrams"),
        sum(expr("cast(c_d as decimal(38,0)) * bits_w")).as("_sb"))
      .select(col("doc_id"), col("lang"), col("n_trigrams"),
        expr("cast(_sb as bigint)").as("kn3_bits_num"),
        expr("cast((CASE WHEN _sb < 0 THEN -1 ELSE 1 END)" +
          " * (abs(cast(_sb as decimal(38,0))) * 1000000" +
          " div (cast(n_trigrams as decimal(38,0)) * 1048576)) as bigint)")
          .as("bits_micro"))
      .withColumn("high_perplexity", col("bits_micro") > maxBitsMicro)
      .orderBy(col("doc_id"))
  }

  def txtZipf(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, dir)
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("lang")).orderBy(col("tf").desc, col("term"))
    tf.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .withColumn("zipf_c", col("tf") * col("rank"))
      .select(col("lang"), col("rank"), col("term"), col("tf"), col("zipf_c"))
      .orderBy(col("lang"), col("rank"))
  }

  /** RAKE keyphrase extraction (Rapid Automatic Keyword Extraction) —
    * the unsupervised keyphrase pass a corpus-analysis/tagging pipeline
    * runs: candidate phrases are the maximal stopword-free token runs,
    * each word scores degree/frequency over those phrases (degree =
    * Σ co-occurring phrase length, favoring words that live in long
    * phrases), and a phrase scores the sum of its words. The stoplist
    * is corpus-derived (the nStop highest-document-frequency terms per
    * language — no hardcoded language assumption), runs come from the
    * classic gaps-and-islands device (run_id = pos − rank among
    * non-stop tokens, a doc-keyed window), and every score is exact
    * fixed-point (w_micro = deg·10⁶ div freq, phrase = integer sum).
    * Output: top-k phrases per language. 100 TB shape: stoplist and
    * word stats are vocabulary-sized aggregates; the per-doc stages
    * are doc-keyed windows/joins; final top-k prunes through the
    * bounded-heap TopKPerGroup. */
  def txtRake(spark: SparkSession, dir: String, nStop: Int = 10,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r15 MEASURED DECLINE — keep the two fused tokenize passes: the
    // census and the scoring pass each re-run scan+posexplode, and
    // ReusedExchange cannot dedup them (column pruning diverges the
    // subtrees — the census drops `pos`). Persisting one
    // doc-partitioned token stream for both was implemented and
    // measured at sf0.1 (full bench ×2, controls ~1.1× drift):
    // txt_rake 3.12→4.41 s, txt_rake_lang 2.33→4.89 s — REVERTED.
    // Same mechanism as the r14 rake window decline: materializing the
    // corpus-sized token stream (cache write + columnar boundary +
    // serialized cache-build job) costs more than the second map-side
    // regex-tokenize of the compressed scan, at this SF and at scale.
    val toks = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        posexplode(TextOps.tokens("text")).as(Seq("pos", "term")))
    val df = toks.groupBy(col("lang"), col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val wStop = Window.partitionBy(col("lang"))
      .orderBy(col("df").desc, col("term"))
    val stop = df.withColumn("rn", row_number().over(wStop))
      .filter(col("rn") <= nStop)
      .select(col("lang"), col("term"), lit(true).as("is_stop"))
    val runs = toks.join(broadcast(stop), Seq("lang", "term"), "left")
      .filter(col("is_stop").isNull)
      .withColumn("run_id", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    // run length via an unordered window over (doc_id, run_id): the
    // run_id window already partitioned by doc_id, so this adds a sort
    // but NO second shuffle (vs the groupBy + self-join formulation)
    val occ = runs.withColumn("run_len", count(lit(1)).over(
      Window.partitionBy(col("doc_id"), col("run_id"))))
    // r14 note: a whole-partition (lang, term) WINDOW for these stats
    // (one exchange instead of groupBy + join-back) was MEASURED a
    // regression at sf0.1 (4.18 → 6.22 s subset A/B): the window's
    // sort of the corpus-sized occurrence stream costs more than the
    // hash aggregate + hash join it replaces. Kept the agg+join shape.
    val wstat = occ.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("freq"), sum(col("run_len")).as("deg"))
      .withColumn("w_micro", expr("deg * 1000000 div freq"))
    val phr = occ
      .join(wstat.select(col("lang"), col("term"), col("w_micro")),
        Seq("lang", "term"))
      .groupBy(col("doc_id"), col("lang"), col("run_id"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, term)))," +
        " x -> x.term), ' ')").as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("w_micro")).as("score_micro"))
    val byPhrase = phr.groupBy(col("lang"), col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("n_words")).as("n_words"),
        max(col("score_micro")).as("score_micro"))
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      byPhrase, Seq("lang"), Seq("score_micro" -> true, "phrase" -> false), k)
    val wTop = Window.partitionBy(col("lang"))
      .orderBy(col("score_micro").desc, col("phrase"))
    pruned.withColumn("rank", row_number().over(wTop).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("phrase"), col("n_words"),
        col("n_occ"), col("score_micro"))
      .orderBy(col("lang"), col("rank"))
  }

  /** Per-language RAKE with ADAPTIVE stoplist sizing and a phrase-
    * length cap — the production dial set [[txtRake]]'s fixed
    * rank-nStop cut lacks: a uniform top-10 underfits languages whose
    * function-word mass is wider (and overfits narrow ones), so here
    * the stoplist is each language's own document-frequency knee —
    * term t is a stopword in language L iff df(t,L) · |vocab(L)| ≥
    * Σ df(L) (df at or above the language's MEAN df; division-free, so
    * the cut is exact integer in both engines and the stoplist SIZE
    * falls out of the distribution per language — `n_stop` in the
    * output proves the sizes differ). Candidate phrases longer than
    * `maxLen` words are discarded (classic RAKE's maxWords dial;
    * unbounded stopword-free runs are junk phrases AND an unbounded
    * string_agg — the cap is also the scale guard, replicated in the
    * oracle). Scoring is [[txtRake]]'s exact fixed-point
    * degree/frequency. 100 TB shape: identical to [[txtRake]] —
    * vocabulary-sized aggregates (now two: df + the per-language
    * totals, both broadcast), doc-keyed windows, bounded-heap top-k;
    * the cap bounds the phrase rollup's group width. */
  def txtRakeLang(spark: SparkSession, dir: String, maxLen: Int = 4,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // two fused tokenize passes by measurement — see the [[txtRake]]
    // r15 decline note (the shared persisted stream was 2.1× slower)
    val toks = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        posexplode(TextOps.tokens("text")).as(Seq("pos", "term")))
    val dfc = toks.groupBy(col("lang"), col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val langTot = dfc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_terms"), sum(col("df")).as("sum_df"))
    val stop = dfc.join(broadcast(langTot), Seq("lang"))
      .filter(col("df") * col("n_terms") >= col("sum_df"))
      .select(col("lang"), col("term"), lit(true).as("is_stop"))
    val nStop = stop.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_stop"))
    val runs = toks.join(broadcast(stop), Seq("lang", "term"), "left")
      .filter(col("is_stop").isNull)
      .withColumn("run_id", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val occ = runs.withColumn("run_len", count(lit(1)).over(
        Window.partitionBy(col("doc_id"), col("run_id"))))
      .filter(col("run_len") <= maxLen)
    // r14: window-stat rewrite measured a regression here too — see
    // the [[txtRake]] note; agg+join shape kept deliberately
    val wstat = occ.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("freq"), sum(col("run_len")).as("deg"))
      .withColumn("w_micro", expr("deg * 1000000 div freq"))
    val phr = occ
      .join(wstat.select(col("lang"), col("term"), col("w_micro")),
        Seq("lang", "term"))
      .groupBy(col("doc_id"), col("lang"), col("run_id"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, term)))," +
        " x -> x.term), ' ')").as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("w_micro")).as("score_micro"))
    val byPhrase = phr.groupBy(col("lang"), col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("n_words")).as("n_words"),
        max(col("score_micro")).as("score_micro"))
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      byPhrase, Seq("lang"), Seq("score_micro" -> true, "phrase" -> false), k)
    val wTop = Window.partitionBy(col("lang"))
      .orderBy(col("score_micro").desc, col("phrase"))
    pruned.withColumn("rank", row_number().over(wTop).cast("bigint"))
      .filter(col("rank") <= k)
      .join(broadcast(nStop), Seq("lang"))
      .select(col("lang"), col("rank"), col("phrase"), col("n_words"),
        col("n_occ"), col("score_micro"), col("n_stop"))
      .orderBy(col("lang"), col("rank"))
  }

  /** TextRank keywords per language — the graph-ranking sibling of
    * RAKE (Mihalcea & Tarau's random-walk scoring): nodes are the
    * language's terms, edges are ADJACENT-token co-occurrences
    * (window 2) weighted by count, and term importance is weighted
    * PageRank (pr = 0.15 + 0.85·Σ pr·w/W) iterated a fixed `iters`
    * rounds. Reuses the q57 bit-stability discipline exactly:
    * per-edge contributions are rounded to 12 decimals THEN summed as
    * DECIMAL(30,12) — partition-order-independent, so ranks are
    * bit-identical across any cluster layout (and to the oracle's
    * unrolled CTE chain). Edges below `minW` co-occurrences are
    * pruned (the support floor that keeps a web-scale co-occurrence
    * graph near-linear in the corpus instead of vocab² — hapax
    * adjacencies are noise for ranking anyway).
    *
    * 100 TB shape: the bigram stream is MAP-SIDE (the shared
    * [[TextOps.ngramArray]] codegen pass — no doc-keyed window
    * shuffle); the graph is vocabulary-sized, every iteration is one
    * edge⋈rank join + one dst-keyed aggregate hashing the SAME
    * (lang, node) key, so pre-partitioning the persisted edge list
    * makes all rounds co-partitioned (the q57 exemplar). r14 fused
    * round 1 — where every rank is the literal 1.0 seed — into a
    * direct edge aggregate, dropping the first rank join entirely
    * (value-identical: 1.0·x = x in IEEE, same rounded terms, same
    * decimal sums); r15 put wdeg back on a groupBy + join-back
    * aggregate after the r14 window form reversed at sf1 (see the
    * inline note).
    *
    * @param iters number of rank iterations, PRECONDITION iters >= 1:
    *              round 1 is fused into the edge aggregate, so the
    *              pre-r14 iters=0 call (return the 1.0 seed ranks) is
    *              no longer expressible and is rejected loudly. */
  def txtTextrank(spark: SparkSession, dir: String, iters: Int = 3,
      minW: Long = 2L, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iters >= 1, s"txtTextrank: iters=$iters must be >= 1 " +
      "(round 1 is fused into the edge aggregate)")
    val bg = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.ngramArray("text", 2)).as("b2"))
      .select(col("lang"),
        expr("split_part(b2, ' ', 1)").as("t1"),
        expr("split_part(b2, ' ', 2)").as("t2"))
      .filter(col("t1") =!= col("t2"))
    val pairs = bg
      .select(col("lang"), least(col("t1"), col("t2")).as("a"),
        greatest(col("t1"), col("t2")).as("b"))
      .groupBy(col("lang"), col("a"), col("b"))
      .agg(count(lit(1)).as("wgt"))
      .filter(col("wgt") >= minW)
    val edges = pairs.select(col("lang"), col("a").as("src"), col("b").as("dst"), col("wgt"))
      .unionAll(pairs.select(col("lang"), col("b").as("src"), col("a").as("dst"), col("wgt")))
    // r15: wdeg back to groupBy + join-back — the r14 whole-partition
    // window reversed at sf1 (5.2 s window vs 2.9-4.5 s aggregate, two
    // runs; same mechanism as the knLmBits note: the window sorts every
    // edge row inside its (lang, src) partition, the aggregate
    // partial-aggregates map-side). The r14 round-1 fuse below is KEPT.
    val wdegAgg = edges.groupBy(col("lang"), col("src")).agg(sum(col("wgt")).as("wdeg"))
    val ed = edges.join(wdegAgg, Seq("lang", "src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // round 1 fused: every node's seed rank is exactly 1.0, so the
    // first edge⋈rank join degenerates to the edge aggregate itself
    // (1.0 * wgt / wdeg = wgt / wdeg bit-for-bit)
    var pr = ed
      .groupBy(col("lang"), col("dst"))
      .agg(expr("cast(sum(cast(round(wgt / wdeg, 12) as decimal(30,12))) as double)").as("s"))
      .select(col("lang"), col("dst").as("node"),
        round(lit(0.15) + lit(0.85) * col("s"), 12).as("pr"))
    for (_ <- 2 to iters) {
      pr = ed.join(pr.withColumnRenamed("lang", "plang"),
          col("src") === col("node") && col("lang") === col("plang"))
        .groupBy(col("lang"), col("dst"))
        .agg(expr("cast(sum(cast(round(pr * wgt / wdeg, 12) as decimal(30,12))) as double)").as("s"))
        .select(col("lang"), col("dst").as("node"),
          round(lit(0.15) + lit(0.85) * col("s"), 12).as("pr"))
    }
    val wTop = Window.partitionBy(col("lang")).orderBy(col("pr").desc, col("node"))
    val out = pr.withColumn("rank", row_number().over(wTop).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("node").as("term"), col("pr"))
      .orderBy(col("lang"), col("rank"))
    graft.operators.Analytics.materializeAndRelease(spark, out, ed)
  }

  /** Theil's uncertainty coefficient between the lang and source
    * columns — the normalized mutual-information audit ("how much does
    * knowing the crawl source tell you about the language?") on the
    * same exact fixed-point-log2 device as [[txtPerplexity]]: each
    * entropy numerator is H·N·2²⁰ = N·lg(N) − Σ c·lg(c) over the
    * (lang × source) contingency table — a ≤(langs·sources)-row
    * aggregate after ONE corpus scan, so the statistic costs a
    * groupBy and three tiny rollups. U(X|Y) = I/H(X) with
    * I = H(X)+H(Y)−H(X,Y); the micro ratios divide the exact
    * integers in decimal(38) (the numerators are N·lg-scale, which
    * passes int64 × 10⁶ near 10⁶ docs — the decimal path keeps the
    * division exact at any corpus size). */
  def txtTheilU(spark: SparkSession, dir: String): DataFrame = {
    val joint = TextOps.balanced(Tables.documents(spark, dir))
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
    def hnum(counts: DataFrame): DataFrame = counts
      .agg(sum(col("c")).as("n"),
        sum(expr(s"cast(c as decimal(38,0)) * ${lgShift("c")}")).as("_sclg"))
      .select(col("n"),
        expr(s"cast(cast(n as decimal(38,0)) * ${lgShift("n")} - _sclg as bigint)").as("h"))
    val hx = hnum(joint.groupBy(col("lang")).agg(sum(col("c")).as("c")))
      .select(col("n").as("n_docs"), col("h").as("h_lang_num"))
    val hy = hnum(joint.groupBy(col("source")).agg(sum(col("c")).as("c")))
      .select(col("h").as("h_source_num"))
    val hxy = hnum(joint).select(col("h").as("h_joint_num"))
    // I is clamped at 0: mutual information is nonnegative, but the
    // FLOORED fixed-point logs can push a near-independent table a few
    // ulps negative, where trunc-vs-floor division would diverge
    // between engines — the clamp pins both to the defined domain
    hx.crossJoin(broadcast(hy)).crossJoin(broadcast(hxy))
      .withColumn("i_num",
        greatest(lit(0L), col("h_lang_num") + col("h_source_num") - col("h_joint_num")))
      .select(col("n_docs"), col("h_lang_num"), col("h_source_num"),
        col("h_joint_num"), col("i_num"),
        // zero-entropy guard: a single-language (or single-source)
        // corpus makes H = 0, where Spark's div returns NULL but the
        // oracle's // raises — the explicit NULL pins both engines to
        // the same degenerate-corpus answer (oracle mirrors the CASE)
        when(col("h_lang_num") > 0,
          expr("cast(cast(i_num as decimal(38,0)) * 1000000 div h_lang_num as bigint)"))
          .as("u_lang_micro"),
        when(col("h_source_num") > 0,
          expr("cast(cast(i_num as decimal(38,0)) * 1000000 div h_source_num as bigint)"))
          .as("u_source_micro"))
  }

  /** BPE tokenizer TRAINING — `rounds` unrolled argmax-merge/re-count
    * iterations (the q57 discipline), completing the tokenizer tier
    * above [[txtBpePairs]] (which is exactly ONE round's count stage).
    * The corpus is scanned ONCE into the persisted word-frequency
    * table (the classical BPE training input: distinct word types ×
    * counts — at 100 TB that's the vocabulary, millions of rows, not
    * the corpus); every training round then costs one vocab-scale
    * pair count, a 1-row argmax (freq DESC, then (left,right) lexical
    * — the deterministic tie-break both engines share), and one
    * broadcast-merge map over the segmentations. Segmentations ride
    * as delimiter-wrapped strings `(s1)(s2)…`: applying merge (a,b)
    * is one literal `replace(seg, '(a)(b)', '(ab)')`, whose
    * left-to-right non-overlapping scan IS greedy BPE merge order
    * ('aaa' → ['aa','a'], never the overlapping double-count).
    * Training words are alphabetic types only (standard BPE
    * pre-tokenization splits letters from punctuation/digits; it also
    * makes the paren delimiters collision-free by construction). */
  def txtBpeMerges(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val (words, merges, _) = bpeTrain(spark, dir, rounds)
    val out = merges.reduce(_ unionAll _)
      .select(col("round"), col("a").as("left_sym"), col("b").as("right_sym"),
        concat(col("a"), col("b")).as("merged"), col("freq"))
      .orderBy(col("round"))
    graft.operators.Analytics.materializeAndRelease(spark, out, words)
  }

  /** Shared BPE training core: (persisted word-frequency table, one
    * 1-row merge frame per round, final segmentations). Callers MUST
    * route their bounded result through materializeAndRelease(words)
    * so the persisted vocab table never leaks past the call. */
  private def bpeTrain(spark: SparkSession, dir: String, rounds: Int)
      : (DataFrame, Seq[DataFrame], DataFrame) = {
    val words = TextOps.balanced(Tables.documents(spark, dir))
      .select(explode(TextOps.tokens("text")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), regexp_replace(col("w"), "(.)", "($1)").as("seg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // one training round's count+argmax over the current segmentations
    def bestPair(segs: DataFrame, r: Int): DataFrame = segs
      .select(col("cnt"), split(expr("trim(BOTH '()' FROM seg)"), "\\)\\(").as("sy"))
      // single-symbol words contribute no pairs (and sequence(1,0)
      // would run DOWNWARD in Spark — the filter is load-bearing)
      .filter(size(col("sy")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(sy) - 1)," +
          " i -> named_struct('a', element_at(sy, i), 'b', element_at(sy, i + 1)))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("freq"))
      .orderBy(col("freq").desc, col("a"), col("b")).limit(1)
      .select(lit(r.toLong).as("round"), col("a"), col("b"), col("freq"))

    var segs = words
    val merges = (1 to rounds).map { r =>
      val best = bestPair(segs, r)
      segs = segs.crossJoin(broadcast(best.select(col("a").as("ma"), col("b").as("mb"))))
        .select(col("w"), col("cnt"), expr(
          "replace(seg, concat('(', ma, ')(', mb, ')'), concat('(', ma, mb, ')'))").as("seg"))
      best
    }
    (words, merges, segs)
  }

  /** MATTR — moving-average type-token ratio (Covington & McFall
    * 2010), window 50, stride 1: the length-robust lexical-diversity
    * score (plain TTR falls with doc length; [[txtTtr]] keeps that
    * raw form). Per qualifying doc (≥ 50 tokens) every 50-token
    * window's distinct-type count is summed — `mattr_num` over the
    * implicit denominator 50·n_windows, published exactly plus the
    * floor micro ratio.
    *
    * Scale shape: ONE fold per row over sequence/slice/array_distinct
    * — zero shuffle, zero explode; work is bounded by doc length
    * (windows ≤ n_tokens), so the operator scales with corpus bytes
    * exactly like a projection. The naive alternative (posexplode
    * tokens → window-id expansion → groupBy (doc, window) distinct)
    * shuffles 50× the token stream; at 100 TB that exchange is the
    * whole job, and this shape deletes it. */
  def txtMattr(spark: SparkSession, dir: String, window: Int = 50): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), TextOps.tokens("text").as("t"))
      .filter(size(col("t")) >= window)
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        (size(col("t")) - (window - 1)).cast("long").as("n_windows"),
        expr(
          s"""aggregate(sequence(1, size(t) - ${window - 1}), cast(0 as bigint),
             |(acc, s) -> acc + size(array_distinct(slice(t, s, $window))))""".stripMargin)
          .as("mattr_num"))
      .withColumn("mattr_micro",
        expr(s"mattr_num * 1000000 div ($window * n_windows)"))
      .orderBy(col("doc_id"))

  /** Sichel's S — the dislegomena proportion V₂/V per language
    * (Sichel 1975), over the BIGRAM type spectrum: the
    * frequency-spectrum constant that stays stable as the corpus
    * grows where raw TTR collapses, read beside [[txtHapax]] (V₁) and
    * Yule's K. Bigrams, not unigrams, deliberately: the synthetic
    * corpus's 31-term unigram vocabulary has NO tf=2 types at any SF
    * (a dead gate — the round-7 vacuity lesson), while the bigram
    * spectrum carries live V₁/V₂ mass everywhere. One map-side n-gram
    * expansion + one aggregate; exact integers, one micro division. */
  def txtSichel(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.ngramArray("text", 2)).as("bg"))
      .groupBy(col("lang"), col("bg"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("v"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("v1"),
        sum(when(col("tf") === 2, 1L).otherwise(0L)).as("v2"))
      .select(col("lang"), col("v"), col("v1"), col("v2"),
        expr("v2 * 1000000 div v").as("sichel_micro"))
      .orderBy(col("lang"))

  /** Honoré's R per language over the bigram spectrum — the V₁-based
    * lexical-richness constant completing the spectrum trio beside
    * [[txtSichel]] (V₂) and Yule's K: classically
    * R = 100·ln N / (1 − V₁/V). Published in LOG2-space as the exact
    * integer milli statistic 100·lg₂(N)·V·1000 / ((V−V₁)·2²⁰) off the
    * fixed-point log2 recurrence ([[txtPerplexity]]'s contract — no
    * float log forms anywhere); ×ln2 at the consumer recovers the
    * natural-log classic. Saturated vocabularies (V₁ = V — every type
    * a hapax, the tiny-corpus degenerate) emit NULL in both engines.
    * Bigrams for the same reason as Sichel: the 31-term unigram
    * vocabulary has no live V₁ mass on this corpus. */
  def txtHonore(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.ngramArray("text", 2)).as("bg"))
      .groupBy(col("lang"), col("bg"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("v"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("v1"),
        sum(col("tf")).as("n_bigrams"))
      .select(col("lang"), col("n_bigrams"), col("v"), col("v1"),
        expr(s"""CASE WHEN v1 < v THEN
                |cast(cast(${lgShift("n_bigrams")} as decimal(38,0)) * 100000 * v
                |  div ((v - v1) * 1048576) as bigint) END""".stripMargin)
          .as("honore_lg2_milli"))
      .orderBy(col("lang"))

  /** MTLD — Measure of Textual Lexical Diversity (McCarthy & Jarvis
    * 2010), forward pass: walk the token stream keeping a running
    * factor; when the factor's TTR drops below 0.72 the factor
    * completes and restarts at the next token. MTLD = n_tokens /
    * (factors + partial) where the trailing partial credits
    * (1−TTR)/(1−0.72). Unlike the windowed [[txtMattr]] this is
    * SEQUENTIAL state — the diversity score order-shuffling can't
    * fake — and it stays exact: the threshold test is the integer
    * cross-multiply 25·distinct < 18·len, the partial is the rational
    * 25(l′−d′)/(7l′), and the published score is one integer floor
    * division (n·7l′·10⁶ div (7l′F + 25(l′−d′))); a doc whose factor
    * never completes and whose tokens are all distinct has no defined
    * MTLD and both engines emit NULL via the guard. Scale shape: the
    * MATTR contract — one fold per row (sequence/slice/
    * array_distinct), zero shuffle, zero explode, work bounded by
    * doc length. */
  def txtMtld(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), TextOps.tokens("text").as("t"))
      .filter(size(col("t")) > 0)
      .withColumn("acc", expr(
        """aggregate(sequence(1, size(t)),
          |  array(cast(0 as bigint), cast(1 as bigint)),
          |  (acc, i) -> if(25 * size(array_distinct(
          |        slice(t, cast(acc[1] as int), cast(i - acc[1] + 1 as int))))
          |      < 18 * cast(i - acc[1] + 1 as int),
          |    array(acc[0] + 1, cast(i as bigint) + 1), acc))""".stripMargin))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_factors", expr("acc[0]"))
      .withColumn("tail_len", expr("cast(size(t) as bigint) - acc[1] + 1"))
      .withColumn("tail_distinct", expr(
        """if(tail_len > 0, cast(size(array_distinct(
          |  slice(t, cast(acc[1] as int), cast(tail_len as int)))) as bigint),
          |  cast(0 as bigint))""".stripMargin))
      .select(col("doc_id"), col("n_tokens"), col("n_factors"),
        col("tail_len"), col("tail_distinct"),
        expr(
          """CASE WHEN tail_len > 0 THEN
            | CASE WHEN 7 * tail_len * n_factors + 25 * (tail_len - tail_distinct) > 0
            |  THEN n_tokens * 7 * tail_len * 1000000
            |       div (7 * tail_len * n_factors + 25 * (tail_len - tail_distinct))
            | END
            |ELSE n_tokens * 1000000 div n_factors END""".stripMargin).as("mtld_micro"))
      .orderBy(col("doc_id"))

  /** BPE APPLY — the other half of the tokenizer tier: run the
    * [[txtBpeMerges]]-trained merges over the training vocabulary and
    * report the corpus-weighted segmentation compression (Σ cnt·|seg|
    * before = character count, after = symbol count post `rounds`
    * merges, plus the micro ratio and how many word TYPES shortened).
    * This is the fertility readout a tokenizer-training pipeline
    * publishes per merge budget; one aggregate over the final
    * segmentations, exact integers throughout. */
  def txtBpeEncode(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val (words, _, segs) = bpeTrain(spark, dir, rounds)
    val out = segs
      .select(col("cnt"), length(col("w")).cast("long").as("nb"),
        size(split(expr("trim(BOTH '()' FROM seg)"), "\\)\\(")).cast("long").as("na"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("cnt") * col("nb")).as("n_sym_before"),
        sum(col("cnt") * col("na")).as("n_sym_after"),
        sum(when(col("na") < col("nb"), 1L).otherwise(0L)).as("n_types_shortened"))
      .select(col("n_tokens"), col("n_types"), col("n_sym_before"),
        col("n_sym_after"), col("n_types_shortened"),
        expr("cast(cast(n_sym_after as decimal(38,0)) * 1000000 div n_sym_before as bigint)")
          .as("compression_micro"))
    graft.operators.Analytics.materializeAndRelease(spark, out, words)
  }


  /** Herdan's C = lg V / lg N per language — the log-space
    * type-token ratio (unlike raw TTR it is nearly length-invariant,
    * the cross-corpus comparable of the richness family): both logs
    * run on the shared fixed-point log2 recurrence ([[lgShift]], the
    * same Log2Fixed function every entropy/perplexity operator and
    * its oracle CTE use), so C is an exact integer ratio of two
    * 2²⁰-scaled logs — one truncated division, trunc == floor (both
    * sides nonnegative). Single-token languages (lg N = 0) guard to
    * NULL in both engines. */
  def txtHerdan(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("term")).as("vocab"))
      .select(col("lang"), col("n_tokens"), col("vocab"),
        expr(s"""CASE WHEN n_tokens >= 2 THEN
                |cast(cast(${lgShift("vocab")} as decimal(38,0)) * 1000000
                |  div ${lgShift("n_tokens")} as bigint) END""".stripMargin)
          .as("herdan_c_micro"))
      .orderBy(col("lang"))

  /** Guiraud's R = V/√N per language — the root-TTR richness index
    * (between raw TTR's full length bias and Herdan's log invariance;
    * the trio TTR/R/C spans the classical length-correction ladder).
    * One sqrt-only double expression over the exact (V, N) integers —
    * the q62 sqrt-only parity class — rounded 6. */
  def txtGuiraud(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("term")).as("vocab"))
      .select(col("lang"), col("n_tokens"), col("vocab"),
        round(expr("cast(vocab as double) / sqrt(cast(n_tokens as double))"), 6)
          .as("guiraud_r"))
      .orderBy(col("lang"))

  /** Dugast's U = lg²N / (lg N − lg V) per language — the richness
    * index built to stay finite as TTR's numerator saturates (V → N
    * sends Herdan's C → 1 uninformatively; U blows up, making
    * near-total diversity VISIBLE — the complementary failure mode).
    * Both logs on the shared fixed-point lg₂ recurrence ([[lgShift]]),
    * so U is one truncated division of 2²⁰-scaled integers —
    * nonnegative (lg N ≥ lg V), trunc == floor. V = N (the undefined
    * point) and single-token languages guard to NULL both engines. */
  def txtDugast(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("term")).as("vocab"))
      .select(col("lang"), col("n_tokens"), col("vocab"),
        expr(s"""CASE WHEN n_tokens >= 2 AND ${lgShift("n_tokens")} > ${lgShift("vocab")} THEN
                |cast(cast(${lgShift("n_tokens")} as decimal(38,0)) * ${lgShift("n_tokens")} * 1000
                |  div (cast(1048576 as decimal(38,0))
                |       * (${lgShift("n_tokens")} - ${lgShift("vocab")})) as bigint) END""".stripMargin)
          .as("dugast_u_milli"))
      .orderBy(col("lang"))

  /** Summer's S = lg lg V / lg lg N per language — the DOUBLE-log
    * richness index closing the correction ladder (TTR linear →
    * Guiraud √ → Herdan lg → Summer lg lg: each rung flattens more
    * of the length dependence; S is the one still discriminative on
    * corpora orders of magnitude apart). lg lg X composes as
    * lg₂fixed(lg₂fixed(X)) − 20·2²⁰ (the inner value is 2²⁰-scaled,
    * so its log carries a +20 the subtraction removes) — the OUTER
    * log's argument is a ≤ 63·2²⁰ integer, always inside the
    * recurrence domain. One truncated division, nonnegative
    * (V ≤ N ⇒ lg lg V ≤ lg lg N), trunc == floor; V ≤ 2 or either
    * double-log ≤ 0 guards NULL in both engines. */
  def txtSummer(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("term")).as("vocab"))
      .withColumn("lgn", expr(lgShift("n_tokens")))
      .withColumn("lgv", expr(lgShift("vocab")))
      .select(col("lang"), col("n_tokens"), col("vocab"),
        expr("""CASE WHEN lgv > 1048576 AND lgn > 1048576
               | AND log2_fixed(lgn) - 20971520 > 0 AND log2_fixed(lgv) - 20971520 > 0 THEN
               |cast(cast(log2_fixed(lgv) - 20971520 as decimal(38,0)) * 1000000
               |  div (log2_fixed(lgn) - 20971520) as bigint) END""".stripMargin)
          .as("summer_s_micro"))
      .orderBy(col("lang"))
}
