package graft.operators

import graft.Tables
import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents`/`embeddings` tables
  * (SURVEY.md §2.3 #27-31).
  *
  * Scale shape: every variant is one shuffle on a compact key (content
  * hash, band hash, shingle, or label block) — never an O(n²) cross
  * join. Candidate generation and verification are separate stages, as
  * in production MinHash-LSH pipelines.
  */
object Dedup {

  /** Hot-shingle df-cap DEFAULT — the 100 TB dup-density guard,
    * ON by default since round 10. Rationale (measured, not guessed):
    * the sf1 scaling audit saw the uncapped near-dup pair input grow
    * 128×/decade on a dup-dense corpus (Σ df·(df−1)/2 — a data
    * property), and the df-capped components ran 3.3× faster at sf1
    * with gated correctness. A cap of 100 is far above any organic
    * shingle df at the test scales (observed max 25 at sf0.1) — it
    * exists to stop the boilerplate-span blowup, not to change
    * results on healthy corpora. Every oracle-gated consumer
    * replicates the cap EXACTLY in its oracle SQL, so the gate stays
    * strict whether or not the cap binds. */
  private[operators] val ShingleDfCapDefault = 100

  /** Resolve the effective df cap for the near-dup pair family:
    * an explicit `Some(c > 0)` wins; `Some(c <= 0)` is explicitly
    * UNCAPPED (the pre-r10 behavior, for invariance specs and corpora
    * known dup-clean); `None` defers to the session config
    * `spark.graft.dedup.shingleDfCap` (int; <= 0 disables), which
    * itself defaults to [[ShingleDfCapDefault]]. */
  private[operators] def resolveShingleDfCap(spark: SparkSession,
      cap: Option[Int]): Option[Int] =
    cap.orElse(spark.conf.getOption("spark.graft.dedup.shingleDfCap")
      .map(_.trim.toInt).orElse(Some(ShingleDfCapDefault)))
      .filter(_ > 0)

  /** Hot stop-lists above this size fall back to the anti-join path
    * instead of an inline literal set (defensive only: hot keys are
    * few by construction — a 100k-entry stop list means the corpus is
    * pathological and the broadcast anti-join is the right shape).
    * Overridable for the red-path spec. */
  private def hotKeyInlineLimit(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.dedup.hotKeyInlineLimit")
      .map(_.trim.toInt).getOrElse(100000)

  /** Process-lifetime probe cache: (sfDir, family, cap) → (corpus
    * fingerprint, collected hot keys). The census is a pure function of
    * the corpus snapshot, and FOUR gated consumers sit on the same
    * jaccardPairs stop list — one probe serves them all (r10 verdict
    * next #2: the census used to run unconditionally inside every
    * consumer's plan). The fingerprint (r11 advice) invalidates the
    * entry when the corpus at the path changes — in-place rewrites,
    * or another session reusing the path with different data — so a
    * stale stop list is never silently applied; each entry stores one
    * (fingerprint, value) pair, so churning snapshots replace rather
    * than accumulate. `None` value = the list overflowed the inline
    * limit (fall back to the join each time). */
  private val hotKeyCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int), (String, Option[Array[Any]])]

  /** Test hook: drop all cached stop lists. (The fingerprint key makes
    * this unnecessary after corpus rewrites; kept for spec isolation.) */
  private[graft] def clearHotKeyCache(): Unit = hotKeyCache.clear()

  // snapshot fingerprint shared with the other snapshot-scoped caches
  private def corpusFingerprint(spark: SparkSession, dir: String): String =
    Tables.snapshotFingerprint(spark, dir)

  /** Two-phase hot-key guard — value-identical to the single-plan
    * census + broadcast-anti-join formulation, but split so the main
    * job never pays for a census that finds nothing:
    *
    * phase 1 (probe, its own tiny-result job, cached per corpus
    * snapshot): df per key, keep keys with df > cap, collect them —
    * hot keys are FEW by construction (that is what hot means), so
    * this is a handful of values even on a web corpus;
    * phase 2: if the list is empty, the input passes through UNTOUCHED
    * (zero guard cost in the main plan — the common case on healthy
    * corpora); otherwise the stop list becomes an inline NOT-IN filter
    * (Catalyst folds large IN lists to an InSet probe inside codegen —
    * no join, no broadcast exchange, the big exploded stream is
    * scanned exactly once). Lists past [[hotKeyInlineLimit]] keep the
    * old broadcast anti-join shape.
    *
    * NULL keys pass through on EVERY path (r11 advice): the anti-join
    * keeps null-keyed rows (null never equals a build row), so the
    * inline filter ORs `isNull` in, and the census excludes the NULL
    * group — a NULL key has no document frequency and is never "hot"
    * (a NULL in the stop list would also poison the inline NOT-IN:
    * `key IN (NULL, …)` is UNKNOWN for every non-matching key, so the
    * negation would silently drop ALL cold rows). */
  private[operators] def dropHotKeys(spark: SparkSession, input: DataFrame,
      keyCol: String, cap: Int, cacheKey: (String, String)): DataFrame = {
    def census = input.filter(col(keyCol).isNotNull).groupBy(col(keyCol))
      .agg(count(lit(1)).as("df")).filter(col("df") > cap).select(col(keyCol))
    val limit = hotKeyInlineLimit(spark)
    def probe: Option[Array[Any]] = {
      val rows = census.limit(limit + 1).collect()
      if (rows.length > limit) None else Some(rows.map(_.get(0)))
    }
    val (dir, family) = cacheKey
    val fp = corpusFingerprint(spark, dir)
    val k = (dir, family, cap)
    val cached = hotKeyCache.get(k) match {
      case Some((`fp`, v)) => v
      case _ =>
        val v = probe
        hotKeyCache.put(k, (fp, v))
        v
    }
    cached match {
      case Some(keys) if keys.isEmpty => input
      case Some(keys) =>
        input.filter(col(keyCol).isNull || !col(keyCol).isin(keys.toIndexedSeq: _*))
      case None =>
        input.join(broadcast(census), Seq(keyCol), "left_anti")
    }
  }

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * At 100 TB this is the cheapest pass: map-side md5 + one shuffle
    * of (hash, id) pairs, never the payload. */
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy(col("content_hash"))

  /** Cross-source duplication matrix: NEAR-dup candidate-pair counts
    * between every source pair — which crawl providers copy each
    * other (and how much each self-duplicates). Exact-hash pairs
    * would be the cheap basis, but this corpus (like most real web
    * crawls post-normalization) duplicates by *rewording*, so the
    * honest basis is [[ddMinhashLsh]]'s banded candidate pairs. The
    * pair table joins the slim (doc_id, source) projection twice on
    * the pair-id keys — payload never moves — and sources are
    * orientation-normalized (least/greatest) so the matrix is upper
    * triangular. Exact integer counts. */
  def ddCrossSourceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ddMinhashLsh(spark, dir)
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_dup_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** MinHash + LSH banding: 8-perm signature, 4 bands × 2 rows.
    * Shuffle volume is docs × bands (tiny fixed-width rows); the
    * self-join happens only within band buckets. Pairs sharing any
    * band are candidates for the exact verify pass (ddNgramJaccard). */
  def ddMinhashLsh(spark: SparkSession, dir: String,
      bucketCap: Option[Int] = None): DataFrame = {
    // r15: the candidate pair set rides the snapshot store like
    // jaccardPairs — six gated consumers (minhash_lsh, cross_source,
    // bbit, jaccard_est, lsh_recall, lsh_precision) re-ran the band
    // build per query. The presentation sort stays OUTSIDE the
    // snapshot (parquet read-back order is file order, so the gated
    // output's contract sort must be applied on the read).
    Analytics.snapshotTable(spark, dir,
        s"minhash_lsh_${bucketCap.getOrElse(0)}")(
      minhashLshPairs(spark, dir, bucketCap))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private def minhashLshPairs(spark: SparkSession, dir: String,
      bucketCap: Option[Int]): DataFrame = {
    // The whole signature is computed MAP-SIDE per document, as ONE
    // native codegen call per row (MinHashBands: 8 perm-seeded md5
    // mins folded straight into 4 band hashes, raw-digest comparisons,
    // zero intermediate arrays) — no signature shuffle at all. The only
    // shuffles left are the band bucket groupBy, the pair distinct, and
    // the output sort. Same hash family and band layout as the oracle
    // (perm-seeded md5, lexicographic min). At 100 TB this is the shape
    // you want: shuffle volume = docs × 4 fixed-width band rows,
    // nothing keyed on perm.
    val bands = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), TextOps.shingleArray("text").as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), posexplode(
        org.apache.spark.sql.graft.TextExpressions.minhashBands(col("sh"), 8, 4)))
      .withColumnRenamed("pos", "b").withColumnRenamed("col", "bh")
    // pair generation inside each band bucket (no self-join: the band
    // subtree is computed once, and bucket membership lists are small
    // by LSH construction). `bucketCap` is the skew guard at scale: a
    // degenerate band bucket (e.g. millions of near-empty docs hashing
    // identically) would otherwise expand |bucket|² pairs inside ONE
    // task. Capped buckets are dropped whole — the standard recall
    // trade (a true pair in a dropped bucket usually re-surfaces via
    // one of its other 3 bands). None = exact (default; the gated
    // query runs uncapped).
    val buckets = bands
      .groupBy(col("b"), col("bh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    bucketCap.fold(buckets)(c => buckets.filter(size(col("ids")) <= c))
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids) - i - 1), y -> named_struct('doc_a', x, 'doc_b', y))))")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  /** Dedup APPLY step: materialize the kept corpus — one surviving row
    * per content hash (smallest doc_id wins) with its duplicate count.
    * Window over the content hash: one shuffle, payload carried once.
    * This is the pass that actually shrinks the 100 TB corpus after
    * [[ddExact]] has profiled it. */
  def ddKeepers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHash = Window.partitionBy(col("content_hash"))
    Tables.documents(spark, dir)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("rn", row_number().over(byHash.orderBy(col("doc_id"))))
      .withColumn("n_dups", count(lit(1)).over(byHash))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("content_hash"), col("n_dups"))
      .orderBy(col("doc_id"))
  }

  /** 60-bit SimHash over token hashes (oracle-checked: the hex→int
    * conversion is replicated in SQL via digit-position arithmetic).
    * Hamming-close hashes ⇒ near-dup texts; the spec asserts the metric
    * property. One projection, no shuffle. */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame =
    // one native codegen pass per row (SimHash60) — replaces the
    // 60×tokens interpreted lambda fold (measured ~10x on sf0.1);
    // bit-equivalence vs the HOF reference is spec-asserted
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions.simhash60(col("text")).as("simhash"))
      .filter(col("simhash").isNotNull)
      .orderBy(col("doc_id"))

  /** Exact n-gram Jaccard via the explode-join formulation: docs sharing
    * ≥1 shingle become pairs, similarity from intersection counts. The
    * threshold test is integer arithmetic (j ≥ 0.2 ⇔ 5·|∩| ≥ |∪|) so no
    * float boundary can disagree with the oracle. Scale: shuffle keyed
    * on shingle; a frequency cap on hot shingles (stop-shingles) is the
    * standard skew guard at 100 TB. */
  def ddNgramJaccard(spark: SparkSession, dir: String,
      shingleDfCap: Option[Int] = None): DataFrame =
    jaccardPairs(spark, dir, shingleDfCap)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Minhash signature TABLE: the persistable per-doc signature (8
    * perm-seeded md5 mins, CSV-encoded) plus the shingle-set size —
    * what a cross-corpus / cross-run dedup pipeline lands in the lake
    * so new batches join against history without re-reading old text.
    * One native codegen pass per row (MinHashSig), zero shuffles
    * before the output sort. */
  def ddMinhashSigs(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), TextOps.shingleArray("text").as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        size(array_distinct(col("sh"))).cast("long").as("n_shingles"),
        array_join(org.apache.spark.sql.graft.TextExpressions
          .minhashSig(col("sh"), 8), ",").as("signature"))
      .orderBy(col("doc_id"))

  /** b-bit minwise sketches (b = 1, k = 8 perms) scored over the LSH
    * candidate pairs — the STORAGE tier of the minhash ladder (Li &
    * König's b-bit minwise hashing): keep only the LOWEST BIT of each
    * per-perm min, so the 8-perm signature collapses from 8×32 hex
    * chars to ONE byte and the persisted signature lake shrinks ~64×.
    * The price is random 1-bit collisions, which the estimator
    * corrects exactly: for b=1, P[bit match] = ρ + (1−ρ)/2, so
    * ρ̂ = 2·(m/k) − 1 — emitted as the exact integer numerator
    * rho_num8 = 2m − 8 over the denominator 8 in the name (no float
    * division, and no trunc-vs-floor hazard on its negative values).
    * Bits come map-side off the SAME native minhashSig kernel the
    * signature lake persists (bit = parity of the min's last hex
    * char); candidates are the gated [[ddMinhashLsh]] band pairs, so
    * only slim (id, byte) rows join the bounded pair set. */
  def ddBbitMinhash(spark: SparkSession, dir: String): DataFrame = {
    val bits = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), TextOps.shingleArray("text").as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions.minhashSig(col("sh"), 8).as("sig"))
      .select(col("doc_id"), expr(
        "aggregate(transform(sig, (s, i) -> shiftleft(" +
          "cast(conv(substring(s, 32, 1), 16, 10) as bigint) % 2, i)), " +
          "cast(0 as bigint), (a, v) -> a + v)").as("sketch"))
    ddMinhashLsh(spark, dir)
      .join(bits.select(col("doc_id").as("doc_a"), col("sketch").as("ka")), Seq("doc_a"))
      .join(bits.select(col("doc_id").as("doc_b"), col("sketch").as("kb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (lit(8L) - expr("cast(bit_count(ka ^ kb) as bigint)")).as("m_bits"))
      .withColumn("rho_num8", lit(2L) * col("m_bits") - 8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** One-permutation MinHash signatures (Li, Owen & Zhang, NIPS 2012)
    * with rotation densification (Shrivastava & Li, ICML 2014): ONE
    * md5 per shingle. The hash stream is binned by its own low bits
    * (last hex digit mod 8) and each bin's min hash is a signature
    * slot; empty bins borrow circularly from the next non-empty slot
    * (the densification that keeps the estimator unbiased for short
    * docs). vs [[ddMinhashSigs]]' k-permutation form — k independent
    * md5 passes per shingle — this is the k× hashing refund that
    * matters at corpus scale: at the k = 64–128 widths production
    * dedup runs, the hash pass dominates signature build, and OPH
    * makes its cost flat in k. The one-md5 pass runs on the native
    * `oph_slots` kernel (one compiled call per row — r14; the prior
    * interpreted form materialized every digest string then made 8
    * slot-filter passes, costing MORE than the k-perm kernel and
    * hiding in the bench because count() prunes the signature
    * column); densification over the 8-element slot array stays a
    * free HOF. Map-side only (no shuffle, no explode); `n_empty`
    * publishes the densification rate, the short-doc accuracy
    * diagnostic (estimator variance grows with borrowed slots). */
  def ddOphSigs(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), TextOps.shingleArray("text").as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("raw",
        org.apache.spark.sql.graft.TextExpressions.ophSlots(col("sh"), 8))
      .select(col("doc_id"),
        size(array_distinct(col("sh"))).cast("long").as("n_shingles"),
        expr("cast(size(filter(raw, x -> x is null)) as bigint)").as("n_empty"),
        expr(
          """array_join(transform(sequence(0, 7), i ->
            |element_at(filter(transform(sequence(0, 7), j ->
            |element_at(raw, cast((i + j) % 8 as int) + 1)), x -> x is not null), 1)), ',')""".stripMargin)
          .as("signature"))
      .orderBy(col("doc_id"))

  /** LSH banding over the ONE-PERMUTATION signatures — completes the
    * OPH rung ([[ddOphSigs]] build → band → candidate pairs, the same
    * 4-band × 2-row layout as [[ddMinhashLsh]]): band hashes fold the
    * densified slot pairs through the identical md5(s₁‖s₂‖':'‖b)
    * recipe [[bandsFromSigs]] applies to the k-permutation signature
    * lake, so a stored OPH signature table feeds this banding
    * unchanged. The candidate set differs from the k-perm LSH only
    * through the estimator (slot mins vs per-perm mins) — recall
    * audited in spec against the exact-Jaccard pair set. Shuffle
    * volume is docs × 4 fixed-width band rows; pairs expand
    * bucket-locally, never a self-join. */
  def ddOphLsh(spark: SparkSession, dir: String): DataFrame = {
    val bands = bandsFromSigs(
      ddOphSigs(spark, dir).select(col("doc_id"), col("signature")))
      .withColumnRenamed("doc_old", "doc_id")
    bands
      .groupBy(col("b"), col("bh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids) - i - 1), y -> named_struct('doc_a', x, 'doc_b', y))))")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** INCREMENTAL dedup: a new batch (doc_id ≥ 400 models the
    * freshly-crawled slice) LSH-checked against corpus HISTORY using
    * only the persisted signature table — history text is never
    * re-read or re-shingled: its band hashes derive from the stored
    * per-perm mins (md5 of the two member hexes + band index, exactly
    * the fold [[ddMinhashSigs]]' native kernel applies). Only the new
    * batch tokenizes; the join is band-keyed with history's band side
    * ~4 rows/doc. This is the shape that keeps nightly dedup O(batch)
    * instead of O(corpus) at 100 TB. */
  /** Band hashes reconstructed FROM a signature table — the shared
    * history side of the incremental dedup flows (recompute, lake, and
    * the streaming edit gate's lake write). */
  private[graft] def bandsFromSigs(sigs: DataFrame): DataFrame = sigs
    .select(col("doc_id").as("doc_old"),
      expr("split(signature, ',')").as("s"),
      explode(expr("sequence(0, 3)")).as("b"))
    .select(col("doc_old"), col("b"),
      expr("md5(concat(element_at(s, 2 * b + 1), element_at(s, 2 * b + 2), ':', cast(b as string)))").as("bh"))

  def ddIncremental(spark: SparkSession, dir: String,
      splitId: Long = 400L): DataFrame = {
    // history side: band hashes reconstructed FROM the signature table
    val histBands = bandsFromSigs(
      ddMinhashSigs(spark, dir).filter(col("doc_id") < splitId))
    // new batch: shingle + band natively (the only side touching text)
    val newBands = TextOps.balanced(Tables.documents(spark, dir))
      .filter(col("doc_id") >= splitId)
      .select(col("doc_id").as("doc_new"), TextOps.shingleArray("text").as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_new"), posexplode(
        org.apache.spark.sql.graft.TextExpressions.minhashBands(col("sh"), 8, 4)))
      .withColumnRenamed("pos", "b").withColumnRenamed("col", "bh")
    newBands.join(histBands, Seq("b", "bh"))
      .select(col("doc_new"), col("doc_old")).distinct()
      .orderBy(col("doc_new"), col("doc_old"))
  }

  /** The lake-table variant of [[ddIncremental]]: history band hashes
    * come from a PERSISTED signature table (parquet written by a
    * previous run of [[ddMinhashSigs]]) — the scan reads only
    * (doc_id, signature), pruning text entirely; the new batch is the
    * only side that tokenizes. This is the nightly-dedup flow:
    * O(batch) work + a band-keyed join against O(corpus) signatures
    * that are ~100 bytes/doc. */
  def ddIncrementalFromLake(spark: SparkSession, dir: String,
      sigTablePath: String, splitId: Long = 400L): DataFrame = {
    val histBands = bandsFromSigs(
      spark.read.parquet(sigTablePath).filter(col("doc_id") < splitId))
    val newBands = TextOps.balanced(Tables.documents(spark, dir))
      .filter(col("doc_id") >= splitId)
      .select(col("doc_id").as("doc_new"), TextOps.shingleArray("text").as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_new"), posexplode(
        org.apache.spark.sql.graft.TextExpressions.minhashBands(col("sh"), 8, 4)))
      .withColumnRenamed("pos", "b").withColumnRenamed("col", "bh")
    newBands.join(histBands, Seq("b", "bh"))
      .select(col("doc_new"), col("doc_old")).distinct()
      .orderBy(col("doc_new"), col("doc_old"))
  }

  /** The WRITE half of the signature-lake flow ([[ddIncrementalFromLake]]
    * is the read half): compute the batch's minhash signatures and
    * MERGE them into the persisted table keyed by doc_id. The table is
    * partitioned by doc_id range (`chunk` = doc_id / 1000), so an
    * append-mostly nightly batch rewrites only the chunk directories
    * its ids fall in — never the historical bulk; re-upserting the
    * same batch is idempotent (key-replace). This closes the nightly
    * loop: upsert batch N's signatures, dedup batch N+1 against the
    * table, upsert N+1, … — every step O(batch), signatures ~100
    * bytes/doc. */
  def sigLakeUpsert(spark: SparkSession, dir: String, sigTablePath: String,
      minDocId: Long = 0L, maxDocId: Long = Long.MaxValue): Unit = {
    val sigs = ddMinhashSigs(spark, dir)
      .filter(col("doc_id") >= minDocId && col("doc_id") < maxDocId)
      .withColumn("chunk", (col("doc_id") / lit(1000L)).cast("long"))
    graft.sinks.ParquetSink.mergeUpsert(sigs, sigTablePath,
      Seq("doc_id"), Seq("chunk"))
  }

  /** Bloom-filter membership PRE-FILTER: the O(1)-per-probe gate a
    * nightly dedup runs before any expensive signature join — "could
    * this new doc's content hash be in the corpus?" with zero false
    * negatives. Deterministic construction (k=3 positions = md5 of
    * i:text mod m=4096 — no engine-private bloom format), so the
    * filter itself is oracle-checkable. The history's populated
    * position set is ≤ m rows and broadcasts; probing is a map-side
    * join at any corpus size; the spec pins the no-false-negative
    * guarantee against exact dedup. */
  def ddBloomPrefilter(spark: SparkSession, dir: String,
      splitId: Long = 400L, bits: Int = 4096): DataFrame = {
    def positions(df: DataFrame): DataFrame = df
      .select(col("doc_id"), col("text"), explode(expr("sequence(0, 2)")).as("i"))
      .select(col("doc_id"),
        expr(s"cast(conv(substring(md5(concat(cast(i as string), ':', text)), 1, 8), 16, 10) as bigint) % $bits").as("pos"))
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val histPos = positions(docs.filter(col("doc_id") < splitId))
      .select(col("pos")).distinct()
    positions(docs.filter(col("doc_id") >= splitId))
      .join(broadcast(histPos.withColumn("hit", lit(1))), Seq("pos"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_hit"))
      .select(col("doc_id"), col("n_hit"), (col("n_hit") === 3).as("maybe_dup"))
      .orderBy(col("doc_id"))
  }

  /** LSH band-configuration tuning curve: candidate-pair counts for the
    * (bands × rows) splits of the same 8-perm signature — the
    * recall/cost sweep run before fixing a production config (more,
    * narrower bands = higher recall and more candidates). All three
    * configs share one signature computation; each is a band-keyed
    * pair count, never all-pairs. */
  def ddLshTuningCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // every config's bands come off ONE signature pass (a per-config
    // self-join would re-derive the shingle+signature lineage twice per
    // config), and pairs expand bucket-locally via the same
    // no-self-join collect_list formulation as ddMinhashLsh
    val bands = ddMinhashSigs(spark, dir)
      .select(col("doc_id"), expr("split(signature, ',')").as("s"))
      .select(col("doc_id"), col("s"), explode(expr(
        "array(struct(2 as nb, 4 as r), struct(4 as nb, 2 as r), struct(8 as nb, 1 as r))")).as("cfg"))
      .select(col("doc_id"), col("s"),
        col("cfg.nb").as("nb"), col("cfg.r").as("r"),
        explode(expr("sequence(0, cfg.nb - 1)")).as("b"))
      .select(col("doc_id"), col("nb"), col("r"), col("b"),
        expr("md5(concat(concat_ws('', slice(s, b * r + 1, r)), ':', cast(b as string)))").as("bh"))
    val counts = bands
      .groupBy(col("nb"), col("r"), col("b"), col("bh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("nb"), col("r"), explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids) - i - 1), y -> named_struct('da', x, 'db', y))))")).as("p"))
      .select(col("nb"), col("r"), col("p.da"), col("p.db")).distinct()
      .groupBy(col("nb"), col("r"))
      .agg(count(lit(1)).as("n"))
    Seq((2L, 4L), (4L, 2L), (8L, 1L)).toDF("n_bands", "rows_per_band")
      .join(counts,
        col("n_bands") === col("nb") && col("rows_per_band") === col("r"), "left")
      .select(col("n_bands"), col("rows_per_band"),
        coalesce(col("n"), lit(0L)).as("n_candidate_pairs"))
      .orderBy(col("n_bands"))
  }

  /** Asymmetric CONTAINMENT detection: pairs where the smaller doc's
    * shingle set is ≥ half inside the larger's — catches quote
    * inclusion / partial copies that symmetric jaccard misses (a
    * short doc fully quoted inside a long one has low jaccard but
    * containment 1.0). Same single-shuffle shingle self-join core as
    * [[ddNgramJaccard]]; the threshold is the integer test
    * 2·|∩| ≥ min(|A|,|B|), so no float boundary can disagree with
    * the oracle. Carries the same default-ON hot-shingle df cap as
    * [[jaccardPairs]] (dropping a stop-shingle shrinks |∩|
    * symmetrically, so containment only decreases — conservative for
    * the ≥ threshold). */
  def ddContainment(spark: SparkSession, dir: String,
      shingleDfCap: Option[Int] = None): DataFrame = {
    // same slim-pair core as jaccardPairs; the conservative bucket
    // pre-filter is the containment threshold at the size lower bounds
    // (least(na, nb) ≥ least(2^ba, 2^bb), so failing with the bounds
    // is a true reject)
    val surv = shinglePairCounts(spark, dir, shingleDfCap)
      .filter(expr("ninter * 2 >= least(shiftleft(1L, ba), shiftleft(1L, bb))"))
    attachPairSizes(spark, dir, surv)
      .filter(expr("ninter * 2 >= least(na, nb)"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        expr("round(cast(ninter as double) / least(na, nb), 6)").as("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Shared intersection-count core of [[jaccardPairs]] and
    * [[ddContainment]]: for every ordered doc pair sharing ≥1 surviving
    * shingle, the exact shared-shingle count plus each side's
    * floor(log2(set size)) bucket. The r12 redesign of the r11 shape —
    * same result set, three measured GC killers removed (the old
    * 4-long-key aggregate over a ~58M-group pair stream ran 10–50 s at
    * sf1 depending on GC weather; this shape is the slim-pair +
    * attach-after pattern that cut mm_phash_dup 5×):
    *
    *  - SLIM pair rows: the self-join output carries (da, db) plus two
    *    1-byte size buckets — never the exact sizes. Exact sizes attach
    *    later, only to output-bounded survivors ([[attachPairSizes]]).
    *  - NO map-side partial aggregate: the join output is explicitly
    *    repartitioned on (da, db) BEFORE the groupBy, so the pair
    *    exchange ships raw slim rows straight from the join (groups
    *    are ~unique — a pair sharing i shingles appears once in each of
    *    i different shingle partitions, so the pre-shuffle partial agg
    *    reduced nothing and built a multi-GB long-lived hash map per
    *    pass; stage telemetry showed 60+ s of GC in the bad runs).
    *    Post-shuffle, partitioning satisfies the grouping, so the
    *    aggregate runs inside the same stage over partition-local rows.
    *  - MORE, SHORTER-LIVED tasks: the explicit repartition widens the
    *    pair stage to [[pairShufflePartitions]] (default 4× default
    *    parallelism) so each aggregation map stays young-gen sized
    *    instead of 32 concurrent multi-hundred-MB maps.
    *
    * The log2 buckets exist so consumers can apply their threshold
    * CONSERVATIVELY before the exact sizes attach: na ≥ 2^ba, so a pair
    * failing the threshold with the lower bounds failing is a true
    * reject. Bucket from `length(bin(n)) - 1` — exact integer floor of
    * log2, no float boundary. */
  private def shinglePairCounts(spark: SparkSession, dir: String,
      shingleDfCap: Option[Int]): DataFrame = {
    val shAll = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), array_distinct(TextOps.shingleArray("text")).as("shd"))
      .filter(size(col("shd")) > 0)
      .select(col("doc_id"),
        (length(bin(size(col("shd")))) - 1).cast("int").as("lb"),
        explode(col("shd")).as("s"))
    // hot-shingle stop-list: two-phase probe (dropHotKeys) — the census
    // runs once per corpus snapshot as its own job; the main plan sees
    // either nothing (no hot keys — the healthy-corpus case) or a
    // map-side InSet filter (the big exploded stream never reshuffles)
    val sh = resolveShingleDfCap(spark, shingleDfCap).fold(shAll) { cap =>
      dropHotKeys(spark, shAll, "s", cap, (dir, "shingle"))
    }
    // shuffled-hash self-join on the shingle key (measured 2x over
    // sort-merge: small rows, hash beats sorting) — the exchange below
    // is identical on both sides, so it's computed once and reused
    // (widening THIS exchange to the pair-stage width was measured
    // 1.5-2x SLOWER and noisier: the 32-way s-exchange keeps whole
    // shingle-df runs task-local for the probe-side stream)
    sh.as("a").hint("shuffle_hash").join(sh.as("b"),
        expr("a.s = b.s AND a.doc_id < b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.lb").as("ba"), col("b.lb").as("bb"))
      .repartition(pairShufflePartitions(spark), col("da"), col("db"))
      .groupBy(col("da"), col("db"), col("ba"), col("bb"))
      .agg(count(lit(1)).as("ninter"))
  }

  /** Pair-stage width (see [[shinglePairCounts]]): enough tasks that
    * each post-shuffle aggregation map dies young. Overridable via
    * `spark.graft.dedup.pairShufflePartitions`. */
  private def pairShufflePartitions(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.dedup.pairShufflePartitions")
      .map(_.trim.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism * 4)

  /** Attach exact shingle-set sizes to a (da, db, …) pair frame —
    * AFTER the consumer's conservative bucket filter, so the joins
    * touch only output-bounded survivors. Two plain hash joins against
    * the slim (doc_id, n) projection: nothing corpus-growing is
    * broadcast by construction (AQE picks broadcast at bench scale
    * because the SURVIVOR side is tiny — the legal direction). */
  private def attachPairSizes(spark: SparkSession, dir: String,
      surv: DataFrame): DataFrame = {
    // NOTE (r13): snapshotting this (doc_id, n) frame through the
    // per-corpus parquet store was MEASURED a wash-to-regression at
    // sf0.1 (2.0 → 2.2 s on both consumers): the inline scan fuses
    // into the attach joins, while the snapshot adds a write job and
    // an extra scan. The r12 premium lives in the pair-keyed
    // repartition (the deliberate, documented GC-fix price), not here
    // — so the inline shape stays.
    val sizes = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), array_distinct(TextOps.shingleArray("text")).as("shd"))
      .filter(size(col("shd")) > 0)
      .select(col("doc_id"), size(col("shd")).cast("long").as("n"))
    surv
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
  }

  /** The jaccard pair set WITHOUT the presentation sort — internal
    * consumers (connected components) don't need order, and a global
    * sort of the pair set is pure waste there.
    *
    * `shingleDfCap` is the hot-shingle skew guard at scale: a shingle
    * present in k docs contributes k² join rows, so one boilerplate
    * span shared by 10⁶ documents turns the shingle-keyed self-join
    * into a single 10¹²-row task. The guard computes per-shingle doc
    * frequency (a partial-aggregated pass over rows already being
    * produced) and drops shingles above the cap via a broadcast
    * anti-join — hot shingles are FEW by construction (that is what
    * hot means), so the stop-list is kilobytes even on a web corpus.
    * Dropping a stop-shingle can only shrink measured |∩| (both docs
    * lose it symmetrically, like a stopword cut before jaccard).
    *
    * DEFAULT-ON since r10 ([[ShingleDfCapDefault]] = 100): the sf1
    * audit measured the UNCAPPED pair input growing 128×/decade on a
    * dup-dense corpus, and the capped components run 3.3× faster at
    * sf1 — so the production default is the guarded config, with the
    * cap replicated exactly in every consumer's oracle SQL. Uncapped
    * is a config away (see [[resolveShingleDfCap]]).
    *
    * Pair counting and size attachment are the [[shinglePairCounts]] /
    * [[attachPairSizes]] split; the bucket pre-filter here is the
    * jaccard threshold evaluated at the size LOWER bounds
    * (ninter·5 ≥ 2^ba + 2^bb − ninter) — a pair failing it fails the
    * exact test too (na+nb ≥ 2^ba+2^bb), so the filter is a pure
    * row-reducer with zero effect on the result set.
    *
    * r15: the pair table rides [[Analytics.snapshotTable]] — TWELVE
    * gated consumers (components×6, ngram_jaccard, lsh_recall/precision,
    * edit_distance, split_leakage, cluster_split) each re-ran the
    * shingle self-join (~1.2–1.8 s/call at sf0.1); the output is
    * edges ≪ docs by the df-cap guard, exactly the "shared derived
    * table belongs in the lake" shape the copurchase store set (guide
    * §6 read once; same conf flag, fingerprint-invalidated, keyed by
    * the RESOLVED cap so capped/uncapped configs never collide). */
  private[graft] def jaccardPairs(spark: SparkSession, dir: String,
      shingleDfCap: Option[Int] = None): DataFrame = {
    val cap = resolveShingleDfCap(spark, shingleDfCap)
    Analytics.snapshotTable(spark, dir, s"jaccard_pairs_${cap.getOrElse(0)}") {
      // Some(0) = "explicitly uncapped" downstream (resolveShingleDfCap
      // filters non-positive to None without re-applying the default)
      val surv = shinglePairCounts(spark, dir, Some(cap.getOrElse(0)))
        .filter(expr("ninter * 5 >= shiftleft(1L, ba) + shiftleft(1L, bb) - ninter"))
      attachPairSizes(spark, dir, surv)
        .filter(expr("ninter * 5 >= (na + nb - ninter)"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          expr("round(cast(ninter as double) / (na + nb - ninter), 6)").as("jaccard"))
    }
  }

  /** Connected components over the near-dup pair graph (ddNgramJaccard
    * edges): every document in a component shares a ≥0.2-Jaccard chain —
    * the cluster you keep one representative from. Iterative min-label
    * propagation; each round is one join + aggregate, lineage truncated
    * per round, converging in O(cluster diameter) rounds (near-dup
    * clusters are shallow). The driver sees only a scalar per round —
    * this is the simple form of the large-star/small-star CC algorithm
    * used at web scale. */
  /** Edge sets small enough for the driver take the O(E·α) union-find
    * fast path; anything larger runs the distributed propagation. The
    * near-dup graph is usually tiny relative to the corpus (edges ≪
    * docs), so at 100 TB this collect is of the PAIRS, not the data —
    * still guarded, with the iterative path as fallback. */
  private val DriverEdgeLimitDefault = 2000000L

  /** Runtime override so the distributed branch is testable: set
    * `spark.graft.components.driverEdgeLimit` to 0 to force the
    * iterative propagation path on any corpus (the branch a 100 TB
    * pair graph takes). Defaults to 2M pairs. */
  private def driverEdgeLimit(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.components.driverEdgeLimit")
      .map(_.toLong).getOrElse(DriverEdgeLimitDefault)

  /** `shingleDfCap` is the 100 TB dup-density guard for the COMPONENTS
    * input (r9): the sf1 audit measured the uncapped pair input growing
    * 128× across one decade on a dup-dense corpus (Σdf(df−1)/2 — a data
    * property, not a plan property). Capping shingle df stop-lists the
    * hot shingles BEFORE the self-join, bounding the join fan-out; the
    * capped config is itself oracle-gated (`dd_components_capped`) with
    * the cap replicated exactly in the oracle SQL. */
  def ddComponents(spark: SparkSession, dir: String,
      shingleDfCap: Option[Int] = None): DataFrame =
    componentsFromPairs(spark, jaccardPairs(spark, dir, shingleDfCap)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true))

  /** Components over an ALREADY-MATERIALIZED (doc_a, doc_b) pair set —
    * the seam that lets a caller computing the pair set for its own
    * purposes (pipe_split_leakage audits two split strategies over it)
    * reuse ONE pair build instead of re-shingling the corpus. */
  private[operators] def componentsFromPairs(spark: SparkSession,
      pairs: DataFrame): DataFrame = {
    if (pairs.count() <= driverEdgeLimit(spark)) return componentsUnionFind(spark, pairs)
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .unionAll(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .localCheckpoint(true)
    // seed with round 1 fused in: label = min(self, direct neighbors)
    var labels = edges.groupBy(col("a")).agg(min(col("b")).as("mb"))
      .select(col("a").as("n"), least(col("a"), col("mb")).as("lbl"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val nbrMin = edges.join(labels, col("b") === col("n"))
        .groupBy(col("a")).agg(min(col("lbl")).as("nbr"))
      // carry the old label through so convergence is a filter on the
      // checkpointed result, not another join
      val next = labels.join(nbrMin, col("n") === col("a"), "left")
        .select(col("n"), col("lbl").as("old_lbl"),
          least(col("lbl"), coalesce(col("nbr"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      val changed = next.filter(col("lbl") =!= col("old_lbl")).count()
      labels = next.select(col("n"), col("lbl"))
      converged = changed == 0
      rounds += 1
    }
    labels.select(col("n").as("doc_id"), col("lbl").as("component"))
      .orderBy(col("doc_id"))
  }

  /** Driver-side union-find over a collected (small) pair set; emits
    * the same (doc_id, min-reachable-id) labeling as the distributed
    * propagation. */
  private def componentsUnionFind(spark: SparkSession,
      pairs: DataFrame): DataFrame = {
    import spark.implicits._
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val out = parent.keys.toSeq.map(n => (n, find(n))).sorted
    out.toDF("doc_id", "component").orderBy(col("doc_id"))
  }

  /** Character-level edit-distance VERIFY tier over the near-dup
    * candidate pairs — the last rung of the dedup verification ladder
    * (LSH candidates → signature-Jaccard estimate → exact n-gram
    * Jaccard → CHARACTER edit distance): per candidate pair, the
    * Levenshtein distance between the two full texts plus the
    * normalized micro-ratio dist·10⁶ div max(len) a near-identical
    * policy would threshold on. Levenshtein is O(len²) per pair, so it
    * is only ever run on the CANDIDATE set (jaccard ≥ 0.2 pairs — the
    * same guarded input as components; never all pairs): at 100 TB the
    * pair set is edges ≪ docs by the LSH/df-cap guards, the pair list
    * broadcasts, and the text table is read map-side for side A; the
    * side-B join moves only candidate-matched rows of the slim
    * (id, text) projection. */
  def ddEditDistance(spark: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardPairs(spark, dir).select(col("doc_a"), col("doc_b"))
    val texts = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // no forced broadcast of the pair set: on a dup-dense corpus the
    // candidate graph can reach many millions of rows (the blowup the
    // shingleDfCap guard exists for), and a forced broadcast would be
    // a driver/broadcast-limit failure there. AQE's runtime join
    // selection broadcasts it when it IS small and shuffles otherwise.
    texts.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
      .join(pairs, Seq("doc_a"))
      .hint("shuffle_hash")
      .join(texts.select(col("doc_id").as("doc_b"), col("text").as("text_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        length(col("text_a")).cast("long").as("len_a"),
        length(col("text_b")).cast("long").as("len_b"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("dist"))
      .withColumn("dist_micro", expr("dist * 1000000 div greatest(len_a, len_b)"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Nightly-batch EDIT-DISTANCE DEDUP GATE — the per-DOCUMENT verdict
    * rollup of the incremental flow: every new doc (id ≥ splitId) gets
    * its LSH band candidates against the history (the exact
    * [[ddIncremental]] pair semantics), each candidate is verified with
    * full character Levenshtein, and the doc's verdict is the MINIMUM
    * normalized distance dist·10⁶ div max(len) against any history
    * candidate — `is_dup` iff that best ratio is ≤ maxDistMicro. Docs
    * with zero candidates (including too-short-to-shingle docs) pass
    * with n_cand = 0 / best_micro NULL. This is the batch twin of
    * [[graft.streaming.Streams.editGateStream]] (same verdict per doc,
    * spec-pinned). 100 TB shape: candidates are the band-keyed join
    * (never all-pairs), the candidate pair list is ≪ the batch and
    * broadcasts back onto it, and the O(len²) verify runs only on
    * candidate-matched rows. */
  def ddEditGate(spark: SparkSession, dir: String, splitId: Long = 400L,
      maxDistMicro: Long = 400000L): DataFrame = {
    val pairs = ddIncremental(spark, dir, splitId)
      .select(col("doc_new"), col("doc_old"))
    val docs = Tables.documents(spark, dir)
    val newDocs = docs.filter(col("doc_id") >= splitId)
      .select(col("doc_id").as("doc_new"), col("lang"),
        col("text").as("text_new"))
    newDocs
      .join(broadcast(pairs), Seq("doc_new"), "left")
      .join(docs.select(col("doc_id").as("doc_old"), col("text").as("text_old")),
        Seq("doc_old"), "left")
      .withColumn("dist_micro", expr(
        "cast(levenshtein(text_new, text_old) as bigint) * 1000000" +
          " div greatest(length(text_new), length(text_old))"))
      .groupBy(col("doc_new"), col("lang"))
      .agg(countDistinct(col("doc_old")).as("n_cand"),
        min(col("dist_micro")).as("best_micro"))
      .withColumn("is_dup",
        coalesce(col("best_micro") <= maxDistMicro, lit(false)))
      .orderBy(col("doc_new"))
  }

  /** Content-defined chunking (CDC) dedup — the rolling-hash chunker
    * every storage/dataset dedup system (rsync, LBFS, FastCDC) runs so
    * that an insertion near the top of a file does NOT shift every
    * downstream chunk boundary (the failure mode of fixed-size
    * blocks): a chunk ends wherever the polynomial hash of the last
    * `window` characters ≡ 0 (mod `mask`+1), expected chunk ≈ mask+1
    * chars. Output is the duplicate-chunk table (hash, length, copies,
    * docs, keeper) — the bytes a chunk store would actually save.
    * The hash is the plain base-31 window polynomial evaluated
    * directly per position (integer-exact in both engines; the
    * rolling O(1) update is the sequential-machine optimization of
    * the same value). 100 TB shape: chunking + hashing fuse into the
    * scan map-side; only slim (hash, doc_id, len) rows shuffle on the
    * chunk hash — the text bytes never move. */
  /** Per-document CDC chunk rows (doc_id, chunk_md5, chunk_len) —
    * shared by [[ddCdcChunks]] (corpus-wide duplicate table),
    * [[ddCdcIngest]] (new-batch savings vs the history store), and the
    * streaming ingest twin (which feeds a streaming frame through
    * [[cdcChunkRowsOf]] — same expressions, same values). */
  private def cdcChunkRows(spark: SparkSession, dir: String,
      window: Int, mask: Int): DataFrame =
    cdcChunkRowsOf(TextOps.balanced(Tables.documents(spark, dir)),
      window, mask)

  /** The chunking projection over any (doc_id, text) frame — batch or
    * streaming. With `keepOuter = true` (the streaming flag-don't-drop
    * policy) a doc with NULL text — whose boundary array, and hence
    * chunk list, is NULL — survives as one row with NULL
    * chunk_md5/chunk_len instead of vanishing in the explode, so the
    * downstream rollup can report it rather than silently skip it.
    * Empty text behaves identically in both modes (one zero-length
    * chunk — the batch convention). */
  private[graft] def cdcChunkRowsOf(docs: DataFrame,
      window: Int, mask: Int, keepOuter: Boolean = false): DataFrame = {
    val chunked = docs
      .select(col("doc_id"), col("text"),
        expr("cast(length(text) as int)").as("n"))
      .withColumn("bnds",
        org.apache.spark.sql.graft.TextExpressions.cdcBoundaries(
          col("text"), window, mask))
      .withColumn("allb", expr("concat(array(0), bnds, array(n))"))
    val chs = expr(
      "transform(sequence(1, size(allb) - 1), k -> named_struct(" +
        "'start', element_at(allb, k) + 1," +
        " 'clen', element_at(allb, k + 1) - element_at(allb, k)))")
    val exploded =
      if (keepOuter) chunked.select(col("doc_id"), col("text"),
        explode_outer(chs).as("ch"))
      else chunked.select(col("doc_id"), col("text"), explode(chs).as("ch"))
    exploded.select(col("doc_id"),
      expr("md5(substring(text, ch.start, ch.clen))").as("chunk_md5"),
      expr("cast(ch.clen as bigint)").as("chunk_len"))
  }

  /** Byte-level pair containment via CDC chunk hashes — the dedup
    * signal a CHUNK STORE gives away for free: two documents sharing
    * most of their content-defined chunks contain each other at the
    * byte level, catching partial copies / long quotes that are
    * insensitive to tokenization (the shingle-based [[ddContainment]]
    * needs token structure; this works on raw bytes, including code,
    * markup, or any binary-ish text). Same single-shuffle
    * self-join-on-key core as [[jaccardPairs]] with chunk hashes in
    * place of shingles — per-doc DISTINCT chunk arrays (set semantics)
    * computed entirely map-side off the native [[ddCdcChunks]]
    * boundary expression, set size riding along with every exploded
    * row, and the SAME default-ON hot-key df cap (a chunk shared by k
    * docs contributes k² join rows — boilerplate chunks are the same
    * blowup as boilerplate shingles). Threshold and ratio are pure
    * integers: pair kept iff 2·|∩| ≥ min(|A|,|B|),
    * containment_micro = |∩|·10⁶ div min(|A|,|B|). */
  def ddChunkContainment(spark: SparkSession, dir: String,
      window: Int = 8, mask: Int = 63,
      chunkDfCap: Option[Int] = None): DataFrame = {
    val chAll = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"),
        expr("cast(length(text) as int)").as("n0"))
      .withColumn("bnds",
        org.apache.spark.sql.graft.TextExpressions.cdcBoundaries(
          col("text"), window, mask))
      .withColumn("allb", expr("concat(array(0), bnds, array(n0))"))
      .withColumn("chd", expr(
        "array_distinct(transform(sequence(1, size(allb) - 1), k ->" +
          " md5(substring(text, element_at(allb, k) + 1," +
          " element_at(allb, k + 1) - element_at(allb, k)))))"))
      .filter(size(col("chd")) > 0)
      .select(col("doc_id"), size(col("chd")).cast("long").as("n"),
        explode(col("chd")).as("s"))
    val ch = resolveShingleDfCap(spark, chunkDfCap).fold(chAll) { cap =>
      dropHotKeys(spark, chAll, "s", cap, (dir, s"chunk:$window:$mask"))
    }
    ch.as("a").hint("shuffle_hash").join(ch.as("b"),
        expr("a.s = b.s AND a.doc_id < b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("ninter"))
      .filter(expr("ninter * 2 >= least(na, nb)"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("na").as("n_chunks_a"), col("nb").as("n_chunks_b"),
        col("ninter"),
        expr("ninter * 1000000 div least(na, nb)").as("containment_micro"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def ddCdcChunks(spark: SparkSession, dir: String,
      window: Int = 8, mask: Int = 63): DataFrame = {
    // boundary positions come from the native rolling-hash expression
    // (one compiled O(n) pass per row; the interpreted per-position HOF
    // formulation it replaces measured ~10x slower at sf0.1 — the
    // value is asserted identical against that formulation in spec)
    val chunks = cdcChunkRows(spark, dir, window, mask)
    chunks
      .groupBy(col("chunk_md5"))
      .agg(min(col("chunk_len")).as("chunk_len"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper_doc"))
      .filter(col("n_copies") >= 2)
      .orderBy(col("chunk_md5"))
  }

  /** CDC INGEST savings report — the per-document answer a chunk store
    * gives a nightly batch: "how many of this new doc's chunks do we
    * already hold, and how many bytes does that save?" New docs
    * (id ≥ splitId) are chunked with the same content-defined
    * boundaries as [[ddCdcChunks]]; each chunk probes the HISTORY
    * store (the distinct chunk hashes of ids < splitId — in a
    * deployment this is the persisted chunk index, the
    * ddIncrementalFromLake pattern; here recomputed so the oracle can
    * check values). saved_micro = bytes_saved·10⁶ div bytes_total is
    * the per-doc dedup ratio an ingest dashboard plots. 100 TB shape:
    * both sides are slim (hash, len) rows, the probe is one hash-keyed
    * join, text bytes never shuffle. */
  def ddCdcIngest(spark: SparkSession, dir: String,
      window: Int = 8, mask: Int = 63, splitId: Long = 400L): DataFrame = {
    val chunks = cdcChunkRows(spark, dir, window, mask)
    val hist = chunks.filter(col("doc_id") < splitId)
      .select(col("chunk_md5")).distinct()
      .withColumn("hit", lit(1L))
    chunks.filter(col("doc_id") >= splitId)
      .join(hist, Seq("chunk_md5"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"),
        sum(col("chunk_len")).as("bytes_total"),
        sum(when(col("hit").isNotNull, col("chunk_len")).otherwise(0L))
          .as("bytes_saved"))
      .withColumn("saved_micro",
        expr("bytes_saved * 1000000 div bytes_total"))
      .orderBy(col("doc_id"))
  }

  /** Decontamination: flag training documents that share any word
    * 5-gram with the held-out benchmark slice (source = 'src0') — the
    * eval-leakage scrub every pretraining pipeline runs before
    * training. The benchmark n-gram set is small by construction (it is
    * the eval suite, not the corpus), so it broadcasts and the corpus
    * side needs no shuffle until the tiny per-doc hit count — at 100 TB
    * the scan streams once past a broadcast hash set. */
  def ddDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val g = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(TextOps.ngramArray("text", 5))).as("ng"))
    val bench = g.filter(col("source") === "src0").select(col("ng")).distinct()
    g.filter(col("source") =!= "src0")
      .join(broadcast(bench), "ng")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ng")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** Semantic decontamination — the VECTOR twin of [[ddDecontaminate]]:
    * where the 5-gram pass catches verbatim benchmark leakage, this
    * catches PARAPHRASED leakage — corpus vectors whose embedding is
    * cosine-near ANY vector of the held-out benchmark slice. The
    * benchmark carve is deterministic (vec_id ≡ 0 mod 17, ~6% — the
    * stand-in for a real eval set's embedding table). Blocking is the
    * SemDeDup recipe: label cells (+ the shared sign-projection
    * refinement dial [[signProjectionCell]] for the k ∝ n scale path;
    * `refineBits = 0` is the oracle-gated exact semantics). 100 TB
    * shape: a benchmark is TINY relative to the corpus, so the bench
    * side broadcasts — the join is map-side, one corpus pass, no
    * shuffle of the corpus embeddings; the cell equality then only
    * prunes compute, not recall beyond the standard SimHash bound. */
  def ddSemanticDecontaminate(spark: SparkSession, dir: String,
      minCos: Double = 0.30, refineBits: Int = 0): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("nrm", VectorOps.norm2("embedding"))
      .withColumn("cell", signProjectionCell(refineBits))
    val bench = e.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("bid"), col("label"), col("cell"),
        col("embedding").as("be"), col("nrm").as("bn"))
    val corpus = e.filter(col("vec_id") % 17 =!= 0)
      .select(col("vec_id"), col("label"), col("cell"),
        col("embedding").as("ce"), col("nrm").as("cn"))
    corpus.join(broadcast(bench), Seq("label", "cell"))
      .withColumn("cosim", VectorOps.dot("ce", "be") / (col("cn") * col("bn")))
      .filter(col("cosim") >= minCos)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_bench_hits"),
        expr("min_by(bid, named_struct('s', -cosim, 'b', bid))").as("nearest_bench"),
        round(max(col("cosim")), 6).as("max_sim"))
      .orderBy(col("vec_id"))
  }

  /** Sign-random-projection cell id over the `embedding` column:
    * `lshBits` deterministic hyperplanes (fixed seed → stable across
    * runs and cluster layouts), cell = the sign bit-pattern. Map-side
    * arithmetic only — the shared blocking dial of [[ddEmbedCos]] and
    * [[ddSemdedup]]. `lshBits <= 0` collapses to a single cell (exact
    * semantics). Fails loudly on the two silent-degradation inputs:
    * bits past the Int range and vectors wider than the hyperplane
    * (zip_with would null-pad and send every vector to cell 0). */
  private def signProjectionCell(lshBits: Int): Column = {
    require(lshBits <= 31,
      s"signProjectionCell: lshBits=$lshBits would overflow the Int cell id (max 31)")
    if (lshBits <= 0) lit(0)
    else {
      val rnd = new scala.util.Random(0x5eed)
      val sig = (0 until lshBits).map { i =>
        val plane = array(Seq.fill(128)(lit(rnd.nextGaussian())): _*)
        val d = aggregate(
          zip_with(col("embedding"), slice(plane, lit(1), size(col("embedding"))),
            (x, y) => x.cast("double") * y),
          lit(0.0), (acc, v) => acc + v)
        when(d >= 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
      when(size(col("embedding")) <= 128, sig)
        .otherwise(raise_error(concat(
          lit("signProjectionCell: embedding dim "), size(col("embedding")).cast("string"),
          lit(" exceeds the 128-component hyperplane"))))
    }
  }

  /** Embedding-cosine near-dup, blocked by label (an IVF-style coarse
    * partition): pairs are only formed within a block, turning O(n²)
    * into Σ|block|².
    *
    * Label alone is a FIXED block count, so in-block pairs grow ∝ n²
    * with corpus size. `lshBits` (default 0 = off, the oracle-gated
    * exact semantics) is the scale path: each label block is refined
    * by a sign-random-projection signature — `lshBits` deterministic
    * hyperplanes, cell = the sign bit-pattern — so the cell count is
    * |labels|·2^bits and bits can be chosen ∝ log(n/targetBlockSize),
    * giving cells whose count scales with n. Cosine-near vectors
    * agree on each sign bit with probability 1 − θ/π (the SimHash
    * bound), so near-dup pairs stay co-celled w.h.p. — the standard
    * recall/cost dial of LSH near-dup at 100 TB. The spec proves the
    * refined result is a score-identical subset of the exact one. */
  def ddEmbedCos(spark: SparkSession, dir: String, lshBits: Int = 0): DataFrame = {
    // norms are precomputed once per vector (not per pair) — the value
    // is identical to the oracle's per-pair formula, just not recomputed
    val e0 = Tables.embeddings(spark, dir)
      .withColumn("nrm", VectorOps.norm2("embedding"))
    val e = e0.withColumn("cell", signProjectionCell(lshBits))
    val a = e.select(col("vec_id").as("va"), col("label"), col("cell"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vb"), col("label"), col("cell"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("label", "cell"))
      .filter(col("va") < col("vb"))
      .withColumn("cosim", VectorOps.dot("ea", "eb") / (col("na") * col("nb")))
      .filter(col("cosim") >= 0.3)
      .select(col("va").as("vec_a"), col("vb").as("vec_b"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** SemDeDup-style semantic dedup: vectors are first assigned to their
    * nearest centroid (one k-means assignment step — exact-decimal
    * centroids broadcast back, map-side nearest-cell argmin), then
    * near-duplicate pairs are formed ONLY within a cell and every
    * vector with a higher id than some ≥0.35-cosine neighbour is
    * dropped. The clustering bounds the pair stage to Σ|cell|² instead
    * of n² — the published SemDeDup recipe — and at 100 TB each stage
    * is one broadcast + one keyed shuffle on the cell id.
    *
    * The label-derived centroids alone are a FIXED cell count, so
    * in-cell pairs grow ∝ n² with corpus size. `refineBits` (default 0
    * = off, the oracle-gated exact semantics) is the scale dial: each
    * centroid cell is further split by the shared sign-random-
    * projection signature ([[signProjectionCell]]), giving
    * |labels|·2^bits cells with bits chosen ∝ log(n/targetCellSize) —
    * the same recall/cost trade every production SemDeDup runs. The
    * spec proves the refined result is a value-identical subset. */
  def ddSemdedup(spark: SparkSession, dir: String,
      refineBits: Int = 0): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(cast(v as decimal(18,9))) as double) / count(*)").as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("cv"))
      .select(col("label").as("clabel"), col("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("dist"), col("clabel"))
    val assigned = e.crossJoin(broadcast(cent))
      .withColumn("dist", expr(
        "aggregate(zip_with(embedding, cv, (x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), cast(0 as double), (acc, v) -> acc + v)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("nrm", VectorOps.norm2("embedding"))
      .withColumn("cell", signProjectionCell(refineBits))
      .select(col("vec_id"), col("clabel"), col("cell"), col("embedding"), col("nrm"))
    val a = assigned.select(col("vec_id").as("va"), col("clabel"), col("cell"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("vec_id").as("vb"), col("clabel"), col("cell"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("clabel", "cell"))
      .filter(col("va") < col("vb"))
      .withColumn("cosim", VectorOps.dot("ea", "eb") / (col("na") * col("nb")))
      .filter(col("cosim") >= 0.35)
      .groupBy(col("vb").as("dropped"))
      .agg(min(col("va")).as("keeper"),
        count(lit(1)).as("n_near"),
        round(max(col("cosim")), 6).as("max_sim"))
      .orderBy(col("dropped"))
  }

  /** Fuzzy entity matching (record linkage): part names within the
    * same brand block whose edit distance is <= 4 — the classic
    * blocked-levenshtein pass a catalog/entity-resolution pipeline
    * runs. The block key is (brand, length-band): levenshtein(a,b) >=
    * |len(a)-len(b)|, so with band width maxDist+1 a matching pair is
    * always in the same or an adjacent band — the probe side is
    * replicated to its three neighbor bands and the join is exact on
    * the band, making the banding LOSSLESS (same result as the plain
    * brand-blocked join) while the pair space drops from Σ|brand|²
    * (fixed ~25 blocks ⇒ quadratic in n) to Σ|brand,band|·|neighbor
    * bands| — the shape that survives 100 TB. Levenshtein runs inside
    * codegen on short strings. */
  def ddFuzzyMatch(spark: SparkSession, dir: String, maxDist: Int = 4): DataFrame = {
    val w = maxDist + 1
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_name"),
        floor(length(col("p_name")) / w).as("band"))
    // The probe side is round-robin repartitioned so the pair work is
    // spread over every core regardless of how few (brand, band) keys
    // exist — a blocked self-join's keys are coarse by construction,
    // so a key-hashed shuffle would leave most partitions idle. The
    // replicated side is broadcast (entity tables are catalog-sized;
    // at 100 TB the per-executor copy is still the blocked dim, not
    // the corpus), making the join a BroadcastHashJoin with ZERO
    // shuffle of the 10^7-scale pair stream.
    val a = p.repartition(spark.sparkContext.defaultParallelism * 2)
      .select(col("p_brand"), col("band"),
        col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"),
      col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    a.join(broadcast(b), Seq("p_brand", "band"))
      .filter(col("key_a") < col("key_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("p_brand"), col("key_a"), col("key_b"),
        col("name_a"), col("name_b"), col("dist").cast("bigint").as("dist"))
      .orderBy(col("p_brand"), col("key_a"), col("key_b"))
  }

  /** Cross-document hot-span detection (C4-style boilerplate carve):
    * distinct word 3-gram spans per document, counted across the
    * corpus; spans seen in ≥3 documents are ranked. Map-side native
    * shingling (one codegen pass per row), one partial-aggregated
    * shuffle on the span — at 100 TB the exploded span rows are the
    * only thing on the wire, and the ≥3 filter runs post-combine. The
    * survivors are the removal list a cleanup pass would anti-join. */
  def ddHotSpans(spark: SparkSession, dir: String, k: Int = 50): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(array_distinct(TextOps.shingleArray("text"))).as("span"))
      .groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 3)
      .orderBy(col("n_docs").desc, col("span"))
      .limit(k)
  /** Cluster-size histogram of the near-duplicate graph: connected
    * components ([[ddComponents]]) grouped into (cluster_size,
    * n_clusters) — the dedup REPORT a corpus curation run publishes
    * (how much of the corpus is 2-way, 3-way, … duplicated). Two tiny
    * aggregates over the O(duplicated docs) component table; all the
    * heavy lifting is the already-bucketed component pass. */
  def ddClusterSizes(spark: SparkSession, dir: String): DataFrame =
    ddComponents(spark, dir)
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").cast("long").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))

  /** SimHash near-dup pairs via band blocking, RECALL-COMPLETE by
    * pigeonhole: the 60-bit hash splits into 6 bands of 10 bits, so
    * any pair within Hamming distance 5 agrees on at least one whole
    * band and is generated by the band-keyed join — the result is
    * EXACTLY the all-pairs answer (the oracle computes it all-pairs)
    * without the O(n²) scan. Verification is one codegen'd
    * bit_count(xor) per candidate. The same dial as MinHash-LSH:
    * more/narrower bands buy a larger guaranteed radius. */
  def ddSimhashPairs(spark: SparkSession, dir: String,
      maxHamming: Int = 5): DataFrame = {
    // pigeonhole over 6 bands only guarantees recall for distance <= 5;
    // a larger radius would silently lose pairs, so refuse it
    require(maxHamming >= 0 && maxHamming <= 5,
      s"ddSimhashPairs: maxHamming=$maxHamming outside the 6-band " +
        "pigeonhole guarantee (0..5); use more/narrower bands for a larger radius")
    val h = ddSimhash(spark, dir) // (doc_id, 60-bit simhash)
    val bands = h.select(col("doc_id"), col("simhash"),
        explode(expr("sequence(0, 5)")).as("b"))
      .withColumn("bh", expr("(simhash >> (10 * b)) & 1023"))
    val a = bands.select(col("doc_id").as("doc_a"), col("simhash").as("ha"),
      col("b"), col("bh"))
    val bb = bands.select(col("doc_id").as("doc_b"), col("simhash").as("hb"),
      col("b"), col("bh"))
    a.join(bb, Seq("b", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("cast(bit_count(ha ^ hb) as bigint)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Signature-based Jaccard ESTIMATE for LSH candidate pairs: the
    * fraction of agreeing perm-mins (k/8) — the cheap score a
    * production pipeline uses to rank candidates BEFORE any exact
    * verify touches text. Joins ride the persisted-signature shape
    * ([[ddMinhashSigs]]); the estimate is integer-ratio exact. The
    * spec checks the estimator against exact Jaccard on the verified
    * pairs (unbiasedness within MinHash variance). */
  def ddJaccardEst(spark: SparkSession, dir: String): DataFrame = {
    val sigs = ddMinhashSigs(spark, dir)
      .select(col("doc_id"), expr("split(signature, ',')").as("sg"))
    ddMinhashLsh(spark, dir)
      .join(sigs.select(col("doc_id").as("doc_a"), col("sg").as("sa")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sg").as("sb")), "doc_b")
      .withColumn("n_match", expr(
        "cast(aggregate(zip_with(sa, sb, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v) as bigint)"))
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        round(col("n_match") / lit(8.0), 6).as("jaccard_est"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Dedup audit by source: how much of each source is exact-duplicate
    * content (docs whose hash appears elsewhere in the corpus) — the
    * per-provider quality readout a crawl pipeline publishes. Hash
    * cardinalities ride one shuffle; the rate is integer-ratio
    * exact. */
  def ddDupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val hashed = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val dupHash = hashed.groupBy(col("h"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).select(col("h"))
    hashed
      .join(broadcast(dupHash.withColumn("is_dup", lit(1L))), Seq("h"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_docs"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        (col("n_dup_docs") / col("n_docs")).as("dup_rate"))
      .orderBy(col("source"))
  }

  /** LSH quality report: recall of the banded MinHash candidates
    * against the exact Jaccard ≥ 0.2 pairs — the dedup-side accuracy
    * readout (the similarity-side twin is sim_recall_report). Both
    * inputs are deterministic, so the single-row report is
    * oracle-checkable; the join touches only the two small pair
    * sets. */
  def ddLshRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = ddNgramJaccard(spark, dir).select(col("doc_a"), col("doc_b"))
    val cand = ddMinhashLsh(spark, dir)
      .select(col("doc_a").as("ca"), col("doc_b").as("cb"))
    exact
      .join(cand, col("doc_a") === col("ca") && col("doc_b") === col("cb"), "left")
      .agg(count(lit(1)).as("n_exact_pairs"),
        sum(when(col("ca").isNotNull, 1L).otherwise(0L)).as("n_caught"))
      .select(col("n_exact_pairs"), col("n_caught"),
        (col("n_caught") / col("n_exact_pairs")).as("recall"))
  }

  /** LSH candidate PRECISION — the complement of [[ddLshRecall]]: of
    * the pairs the banding surfaces, how many are true near-dups under
    * the exact n-gram Jaccard rule? Recall says what the index misses;
    * precision prices the verify stage (every false candidate costs a
    * full Jaccard computation at 100 TB). Same two bounded pair sets,
    * roles swapped; the ratio is an exact integer micro-division. */
  def ddLshPrecision(spark: SparkSession, dir: String): DataFrame = {
    val truth = ddNgramJaccard(spark, dir)
      .select(col("doc_a").as("ta"), col("doc_b").as("tb"))
    ddMinhashLsh(spark, dir).select(col("doc_a"), col("doc_b"))
      .join(truth, col("doc_a") === col("ta") && col("doc_b") === col("tb"), "left")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("ta").isNotNull, 1L).otherwise(0L)).as("n_true"))
      .select(col("n_candidates"), col("n_true"),
        // explicit NULL when banding surfaces no pairs — the sibling
        // micro-ratios guard their denominators the same way rather
        // than relying on div-by-zero NULL semantics matching engines
        expr("CASE WHEN n_candidates = 0 THEN NULL" +
          " ELSE n_true * 1000000 div n_candidates END").as("precision_micro"))
  }

  /** Corpus duplication-mass report: ONE row quantifying how much of
    * the corpus dedup would remove — exact-dup non-keepers (md5
    * groups, min-id keeper), near-dup non-keepers (component label
    * keeper), their distinct union (a doc can be both), and the
    * removable character mass as an exact micro-fraction. The summary
    * a data lead reads before approving a dedup pass. Text hashes
    * map-side; only ids and char counts move. */
  def ddDupMassReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    // r15: exactDrop is consumed TWICE (the union into `dropped` and
    // the n_exact_dropped count) and each reference re-ran the full
    // md5-of-text + keeper-window pass — persist the slim dropped-id
    // set instead (bounded by the duplicate count, ids only; guide
    // §1.2 don't recompute). The 1-row report releases it through
    // materializeAndRelease. nearDrop re-references are already free:
    // components returns a driver-built LocalRelation.
    val exactDrop = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("keeper", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearDrop = ddComponents(spark, dir)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"))
    val dropped = exactDrop.unionAll(nearDrop).distinct()
    val tot = docs.agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    val dropStats = docs.join(dropped, Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("n_dropped"), coalesce(sum(col("n_chars")), lit(0L)).as("dropped_chars"))
    val nE = exactDrop.agg(count(lit(1)).as("n_exact_dropped"))
    val nN = nearDrop.agg(count(lit(1)).as("n_near_dropped"))
    val out = tot.crossJoin(broadcast(dropStats)).crossJoin(broadcast(nE)).crossJoin(broadcast(nN))
      .select(col("n_docs"), col("total_chars"), col("n_exact_dropped"),
        col("n_near_dropped"), col("n_dropped"), col("dropped_chars"),
        expr("dropped_chars * 1000000 div total_chars").as("dropped_char_micro"))
    Analytics.materializeAndRelease(spark, out, exactDrop)
  }

  /** Near-dup KEEPERS — the APPLY step for near-duplicate dedup: one
    * surviving doc per connected near-dup cluster (smallest doc_id),
    * plus every doc that has no near-duplicate at all. The pass that
    * actually shrinks the corpus after [[ddComponents]] has profiled
    * it; survivors = all docs minus non-representative cluster
    * members, via one broadcast anti-join of the (tiny) dropped
    * set. */
  def ddNearKeepers(spark: SparkSession, dir: String): DataFrame = {
    val comp = ddComponents(spark, dir)
    val dropped = comp.filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("drop_id"))
    Tables.documents(spark, dir)
      .join(broadcast(dropped), col("doc_id") === col("drop_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Shingle document-frequency profile: how many shingles occur in
    * exactly df documents — the skew diagnostic behind the
    * hot-shingle stop-list guard (a heavy tail here is why
    * `shingleDfCap` exists: the joins key on shingles, and a shingle
    * shared by thousands of docs quadratically inflates its bucket).
    * Two aggregates on the shingle key; pure integers. */
  def ddShingleDfProfile(spark: SparkSession, dir: String): DataFrame =
    TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(array_distinct(TextOps.shingleArray("text"))).as("s"))
      .groupBy(col("s")).agg(countDistinct(col("doc_id")).as("df"))
      .groupBy(col("df"))
      .agg(count(lit(1)).as("n_shingles"))
      .orderBy(col("df"))

  /** Soft dedup: per-document sampling weight 1/cluster_size in exact
    * integer micro-units — the keep-everything-but-downweight policy
    * (training pipelines that can't afford hard drops reweight the
    * loss instead). Singletons keep weight 1.0; members of a near-dup
    * component split one unit of mass (up to integer-div truncation,
    * which consumers see exactly). Two slim joins on doc ids; text
    * never moves. */
  def ddSoftWeights(spark: SparkSession, dir: String): DataFrame = {
    val comp = ddComponents(spark, dir)
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("csize"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .join(broadcast(sizes), Seq("component"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"),
        coalesce(col("csize"), lit(1L)).as("cluster_size"))
      .withColumn("weight_micro", expr("1000000 div cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** Quality-aware keeper selection per near-dup component: instead of
    * ddNearKeepers' keep-the-label policy, keep the LONGEST member
    * (max n_chars, ties to the smaller doc_id via the max_by struct
    * tie-break) — the policy real pipelines run, where near-dup
    * clusters keep the most complete copy. One doc-keyed join of the
    * component table against a slim (doc_id, n_chars) projection —
    * text never moves — and one component-keyed aggregate. */
  def ddQualityKeepers(spark: SparkSession, dir: String): DataFrame =
    ddComponents(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("total_chars"),
        expr("max_by(doc_id, struct(n_chars, -doc_id))").as("keeper_id"),
        max(col("n_chars")).as("keeper_chars"))
      .orderBy(col("component"))

  /** EXACT duplicated-substring span extraction (the ExactSubstr tier
    * of Lee et al.'s "Deduplicating Training Data Makes Language
    * Models Better" — the precision rung ABOVE the shingle-Jaccard
    * approximations): a token position is duplicated when its word
    * `n`-gram occurs ≥2 times ANYWHERE in the corpus (including the
    * same doc); overlapping/adjacent duplicated positions (gap ≤ n)
    * merge into maximal spans — exactly the character-level
    * suffix-array spans of the paper, lifted to token granularity so
    * the whole computation is one gram-keyed shuffle + one per-doc
    * window instead of a suffix array. Per-doc readout: span count,
    * covered tokens, longest span, duplicated-gram count — the
    * cut-list a dedup pass hands the trainer. Scale shape: the
    * duplicated-gram census and the position probe share one exchange
    * (same gram-keyed child — ReusedExchange); islands are a
    * doc-keyed window over only the DUPLICATED positions (the rare
    * side at healthy dup rates). */
  def ddDupSpans(spark: SparkSession, dir: String, n: Int = 10): DataFrame = {
    val toks = TextOps.balanced(Tables.documents(spark, dir))
      .select(col("doc_id"), TextOps.ngramArray("text", n).as("g"))
      .filter(size(col("g")) > 0)
      .select(col("doc_id"), posexplode(col("g")).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("gram"))
    val dup = toks.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("gram"))
    val hits = toks.join(dup, Seq("gram")).select(col("doc_id"), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = hits
      // new island when the previous duplicated gram can't touch this
      // one: ranges [p, p+n-1] and [q, q+n-1] merge iff q <= p + n
      // (first row: NULL comparison -> otherwise(0), island 0)
      .withColumn("ni",
        when(col("pos") > lag(col("pos"), 1).over(w) + n, 1L).otherwise(0L))
      .withColumn("isl", sum(col("ni")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + n - 1).as("e"),
        count(lit(1)).as("ng"))
    spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_token_span"),
        max(col("e") - col("s") + 1).as("longest_span"),
        sum(col("ng")).as("n_dup_grams"))
      .orderBy(col("doc_id"))
  }


  /** INCREMENTAL dedup over the ONE-PERMUTATION signature tier — the
    * nightly flow [[ddIncremental]] runs on k-perm signatures, re-run
    * on the OPH lake: history bands reconstruct FROM the signature
    * table via the shared [[bandsFromSigs]] recipe (history text is
    * never touched), the new batch signs through the same native
    * oph_slots kernel, and candidates are the band-key join. At
    * production k this is the cheaper nightly loop by the OPH
    * hashing refund — the batch side hashes each shingle ONCE. */
  def ddOphIncremental(spark: SparkSession, dir: String,
      splitId: Long = 400L): DataFrame = {
    val histBands = bandsFromSigs(
      ddOphSigs(spark, dir).filter(col("doc_id") < splitId)
        .select(col("doc_id"), col("signature")))
    val newBands = bandsFromSigs(
      ddOphSigs(spark, dir).filter(col("doc_id") >= splitId)
        .select(col("doc_id"), col("signature")))
      .withColumnRenamed("doc_old", "doc_new")
    newBands.join(histBands, Seq("b", "bh"))
      .select(col("doc_new"), col("doc_old")).distinct()
      .orderBy(col("doc_new"), col("doc_old"))
  }
}
