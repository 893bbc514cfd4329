package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.3 #39-40): opaque binary
  * payloads + typed metadata, with decode/feature-extraction plumbing.
  *
  * The documents table stands in for a media table: its text bytes play
  * the role of an encoded image/audio payload. The *decode* itself is a
  * deterministic stub (no media libs in this container) — but the Spark
  * plumbing around it is the real thing: binary column, batch-shaped
  * partition iteration, typed Dataset out.
  */
object Multimodal {

  /** Media payloads read from FILES via Spark's `binaryFile` source —
    * the honest 100 TB media deployment shape (a real corpus is a lake
    * of encoded files, not a synthesized column). Emits the same
    * `(doc_id, payload)` interface the synthesized payload table
    * exposes, so every mm_* operator runs unchanged on top of it:
    * doc_id is parsed from the `<id>.bin` filename, payload is the raw
    * file content. binaryFile is a proper FileFormat — distributed
    * scan, partition pruning by path, no driver-side file listing
    * beyond the usual InMemoryFileIndex — so the seam scales like any
    * parquet read. */
  def payloadsFromBinaryFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(glob)
      .select(
        expr("cast(regexp_extract(reverse(split(path, '/'))[0], " +
          "'^([0-9]+)\\\\.bin$', 1) as bigint)").as("doc_id"),
        col("content").as("payload"))

  /** The synthesized payload table: the documents table standing in
    * for a media lake (text bytes as the encoded payload). Same
    * interface as [[payloadsFromBinaryFiles]]. */
  def payloadTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Binary payload + metadata projection, oracle-checked: byte length,
    * content digest, and a hex preview of the leading bytes. */
  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame =
    mmBinaryMetaOf(payloadTable(spark, dir))

  /** [[mmBinaryMeta]] over ANY (doc_id, payload) table — the seam that
    * lets the binaryFile-sourced lake and the synthesized table run
    * the identical plan (spec-proven equal row for row). */
  def mmBinaryMetaOf(payloads: DataFrame): DataFrame =
    payloads.select(
        col("doc_id"),
        expr("cast(octet_length(payload) as bigint)").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        expr("substring(hex(payload), 1, 16)").as("head_hex"))
      .orderBy(col("doc_id"))

  /** Frame sampling over pseudo-video payloads: one row per sampled
    * frame with a per-frame byte slice — the explode-shaped plumbing a
    * real video pipeline uses (decode once, emit k frames), with the
    * decoder stubbed deterministically. At scale this is a Generate
    * (no shuffle), and frame payloads stay columnar binary. */
  def mmFrameSample(spark: SparkSession, dir: String, everyNth: Int = 3): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_frames", expr("cast(1 + pmod(octet_length(payload), 8) as bigint)"))
      .select(col("doc_id"), col("n_frames"),
        explode(expr(s"sequence(cast(0 as bigint), n_frames - 1, cast($everyNth as bigint))")).as("frame_idx"))
      .withColumn("frame_ts_ms", col("frame_idx") * 40) // 25 fps stub
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Media → embedding → vector-index integration: each "media" doc is
    * embedded by a deterministic stub (md5-derived 64-dim vector — the
    * seam where a real CLIP/CLAP encoder batch would run) and its top-3
    * nearest corpus vectors are retrieved by cosine. The retrieval is
    * the production shape: tiny query set broadcast, corpus never
    * shuffled, per-partition bounded heaps (TopKPerGroup) before the
    * final rank — the same plan a 100 TB media-search backfill wants. */
  def mmEmbedStub(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import graft.functions.VectorOps
    val q = Tables.documents(spark, dir)
      .filter(col("doc_id") < 5)
      .withColumn("pmd5", md5(col("text")))
      .withColumn("qv", expr(
        """transform(sequence(0, 63), j ->
          | cast(conv(substring(md5(concat(pmd5, ':', cast(j div 32 as string))),
          |   (j % 32) + 1, 1), 16, 10) as double) / 15.0)""".stripMargin))
      .withColumn("qnrm", VectorOps.norm2Hof("qv"))
      .select(col("doc_id"), col("qv"), col("qnrm"))
    val c = Tables.embeddings(spark, dir)
      .withColumn("nrm", VectorOps.norm2("embedding"))
    val scored = broadcast(q).crossJoin(c)
      .withColumn("cosim", VectorOps.dotHof("qv", "embedding") / (col("qnrm") * col("nrm")))
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("doc_id"), Seq("cosim" -> true, "vec_id" -> false), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("cosim").desc, col("vec_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("doc_id"), col("rank"), col("vec_id"),
        round(col("cosim"), 6).as("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** One decoded media record per document. */
  case class MediaFeature(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, n_frames: Int, kind: String)

  /** Decode/feature-extract plumbing via mapPartitions: the iterator is
    * the batch boundary where a real implementation would hand byte
    * buffers to a native decoder (libjpeg/ffmpeg) once per batch. The
    * stub derives deterministic fake dimensions from the payload bytes;
    * everything around it — binary encoder in, case-class encoder out,
    * per-partition batching, no driver collect — is production-shaped.
    * Rows-only check + MultimodalSpec. */
  def mmDecodeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { batch =>
      // real impl: initialize the native decoder once per partition here
      batch.map { case (id, bytes) =>
        val n = bytes.length
        // ??? decode(bytes) — stubbed: deterministic pseudo-dimensions
        val w = 64 + (n % 577)
        val h = 64 + ((n * 31) % 421)
        val frames = 1 + (bytes.headOption.map(_ & 0x7f).getOrElse(0) % 8)
        MediaFeature(id, n, w, h, frames, if (n % 2 == 0) "image" else "audio")
      }
    }.toDF().orderBy(col("doc_id"))
  }
  /** Frame ENERGY profile over pseudo-audio payloads: the per-frame
    * loudness curve an audio pipeline computes right after decode
    * (here the deterministic stand-in: byte values as samples, 8-byte
    * frames, energy = Σ sample values). Generate-shaped integer
    * arithmetic off the payload — one codegen pass per row, no
    * shuffle before the output sort, payload bytes never move. The
    * curve feeds silence trimming / segment selection the way a real
    * loudness gate would. */
  def mmFrameEnergy(spark: SparkSession, dir: String, frame: Int = 8): DataFrame =
    frameEnergies(spark, dir, frame).orderBy(col("doc_id"), col("frame_idx"))

  /** Unsorted per-frame energy rows — shared by [[mmFrameEnergy]] (adds
    * the output sort) and [[mmSceneCut]] (whose per-doc window provides
    * its own doc-keyed ordering, so no global sort is inherited). */
  private def frameEnergies(spark: SparkSession, dir: String,
      frame: Int): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        expr("cast(length(text) as bigint)").as("n_bytes"))
      // EMPTY payloads produce NO frames. Without this filter Spark
      // diverges from the floor-division oracle: `(0-1) div 8`
      // truncates toward zero (0, not -1), so sequence(0, 0) would
      // emit a phantom frame 0 — and sequence(1, 0) is DESCENDING in
      // Spark, so the energy transform would then probe two
      // out-of-range positions.
      .filter(col("n_bytes") > 0L)
      .select(col("doc_id"), col("n_bytes"), col("text"),
        explode(expr(s"sequence(cast(0 as bigint), (n_bytes - 1) div $frame)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"cast(least(cast($frame as bigint), n_bytes - frame_idx * $frame) as bigint)")
          .as("frame_len"),
        expr(s"aggregate(transform(sequence(1, cast(least(cast($frame as bigint)," +
          s" n_bytes - frame_idx * $frame) as int))," +
          s" i -> ascii(substring(text, cast(frame_idx * $frame as int) + i, 1)))," +
          s" cast(0 as bigint), (acc, v) -> acc + v)").as("energy"))

  /** Scene/segment CUT detection over the pseudo-video frame stream —
    * the shot-boundary pass a video pipeline runs right after decode
    * (here over the same deterministic byte-frame stand-in as
    * [[mmFrameEnergy]]): a cut wherever the energy of consecutive FULL
    * frames jumps by ≥ threshold. Per-payload summary row: frame
    * count, cut count, the largest absolute jump, and the first cut's
    * frame index (NULL when the payload has no cut — flag-don't-drop).
    * The lag is a per-doc window above the frame explode (keyed on
    * doc_id, never corpus-serial), then one map-side-combinable
    * rollup; payload bytes never shuffle. */
  def mmSceneCut(spark: SparkSession, dir: String,
      frame: Int = 8, threshold: Long = 150L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val full = frameEnergies(spark, dir, frame)
      .filter(col("frame_len") === frame.toLong)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    full
      .withColumn("delta", col("energy") - lag(col("energy"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(abs(col("delta")) >= threshold, 1L).otherwise(0L))
          .as("n_cuts"),
        max(abs(col("delta"))).as("max_abs_delta"),
        min(when(abs(col("delta")) >= threshold, col("frame_idx")))
          .as("first_cut_idx"))
      .orderBy(col("doc_id"))
  }

  /** Silence TRIM over the pseudo-audio frame stream — the
    * leading/trailing low-energy cut every audio-ingest pipeline
    * applies before feature extraction (here over the same
    * deterministic byte-frame stand-in as [[mmFrameEnergy]]): frames
    * below the energy threshold at the head and tail are dropped, the
    * kept span is reported in frames, and an all-silent payload is
    * FLAGGED (kept span zero, NULL bounds) rather than dropped. One
    * conditional min/max rollup per payload above the frame explode —
    * no window at all; map-side combinable at any scale. */
  def mmSilenceTrim(spark: SparkSession, dir: String,
      frame: Int = 8, threshold: Long = 700L): DataFrame =
    frameEnergies(spark, dir, frame)
      .filter(col("frame_len") === frame.toLong)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        min(when(col("energy") >= threshold, col("frame_idx")))
          .as("first_loud"),
        max(when(col("energy") >= threshold, col("frame_idx")))
          .as("last_loud"))
      .withColumn("kept_frames",
        coalesce(col("last_loud") - col("first_loud") + 1L, lit(0L)))
      .withColumn("lead_cut",
        coalesce(col("first_loud"), col("n_frames")))
      .withColumn("trail_cut",
        coalesce(col("n_frames") - 1L - col("last_loud"), lit(0L)))
      .withColumn("all_silent", col("first_loud").isNull)
      .orderBy(col("doc_id"))

  /** Exact media dedup: payloads grouped by content digest — the
    * storage-dedup / hash-matching pass every media lake runs before
    * any expensive perceptual comparison. Map-side md5 over the
    * binary column, one digest-keyed shuffle of (hash, id, length) —
    * the payload bytes never move. */
  def mmExactDup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("keeper"),
        max(expr("cast(octet_length(payload) as bigint)")).as("n_bytes"))
      .orderBy(col("payload_md5"))

  /** ViT-style tile grid over the stubbed image dimensions: every
    * "image" is cut into tile×tile patches (row-major tile ids, edge
    * tiles clipped) — the patchification layout a vision encoder's
    * preprocessing emits, with pixel offsets a cropper would consume.
    * Pure Generate-shaped integer arithmetic off the payload LENGTH —
    * the bytes themselves never move; at 100 TB this is a map-side
    * explode fused into the scan, exactly like [[mmFrameSample]]. */
  def mmTileLayout(spark: SparkSession, dir: String, tile: Int = 128): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n", expr("cast(octet_length(cast(text as binary)) as bigint)"))
      .filter(expr("n % 2 = 0")) // the stub's "image" kind
      .withColumn("w", expr("cast(64 + n % 577 as bigint)"))
      .withColumn("h", expr("cast(64 + (n * 31) % 421 as bigint)"))
      .withColumn("tx_n", expr(s"(w + ${tile - 1}) div $tile"))
      .withColumn("ty_n", expr(s"(h + ${tile - 1}) div $tile"))
      .select(col("doc_id"), col("w"), col("h"), col("tx_n"),
        explode(expr("sequence(0, tx_n * ty_n - 1)")).as("tile_id"))
      .withColumn("x0", expr(s"(tile_id % tx_n) * $tile"))
      .withColumn("y0", expr(s"(tile_id div tx_n) * $tile"))
      .select(col("doc_id"), col("tile_id"), col("x0"), col("y0"),
        expr(s"least(cast($tile as bigint), w - x0)").as("tile_w"),
        expr(s"least(cast($tile as bigint), h - y0)").as("tile_h"))
      .orderBy(col("doc_id"), col("tile_id"))

  /** Resolve the effective identical-hash FAMILY cap for the phash
    * pair join: explicit `Some(c > 0)` wins, `Some(c <= 0)` is
    * explicitly uncapped, `None` defers to
    * `spark.graft.mm.phashFamilyCap` (default 100, DEFAULT-ON — the
    * sf0.1 corpus already grows 100+-replica exact-hash families). */
  private def resolvePhashFamilyCap(spark: SparkSession,
      cap: Option[Int]): Option[Int] =
    cap.orElse(spark.conf.getOption("spark.graft.mm.phashFamilyCap")
      .map(_.trim.toInt).orElse(Some(100)))
      .filter(_ > 0)

  /** Perceptual-hash-style media near-dup pairs: a 60-bit SimHash over
    * the payload's hex 4-byte grams (computed WITHOUT decoding — the
    * content-hash tier between exact digest dedup and a real perceptual
    * model), banded 6×10 bits so any pair within Hamming distance 5
    * shares a whole band (pigeonhole — recall-complete vs the all-pairs
    * scan, same guarantee as the text-side banding, MODULO the
    * default-ON FAMILY cap below).
    *
    * Quadratic-blowup guard, DUP-DENSITY-DRIVEN (r10 advice): the k²
    * pair explosion comes from families of k docs sharing the
    * IDENTICAL full 60-bit hash (replica payloads hash identically),
    * so the guard drops docs whose exact-hash family exceeds the cap
    * BEFORE banding — a criterion that depends only on duplication
    * density, never on corpus size. The earlier per-(band, bandHash)
    * bucket cap is gone: a band hash has only 10 bits, so bucket
    * occupancy grows linearly with the corpus from unrelated-doc
    * collisions alone, and capping it silently discarded genuine
    * Hamming≤5 near-dups once every bucket went hot. With the family
    * cap, recall among the SURVIVING docs is complete at every corpus
    * size — the criterion that decides survival is dup density, never
    * corpus size or bucket occupancy. What is suppressed is every pair
    * touching a >cap-replica exact-hash mega-family: its intra-family
    * k² expansion AND its Hamming≤5 pairs with docs OUTSIDE the family
    * (the capped docs are dropped before banding, so they pair with
    * nothing). The linear [[mmExactDup]] pass reports exactly which
    * families were capped out, so the suppression is auditable, but a
    * consumer needing mega-family↔outsider near-dup pairs must re-run
    * with the cap off. The band join itself runs at FAMILY granularity
    * (distinct hashes, each carrying its ≤cap sorted member array), so
    * the 10-bit-bucket collision cost is quadratic in DISTINCT hashes
    * only — Θ((n/r)²/2¹⁰/6) for replica factor r — and the doc-pair
    * expansion is bounded by the output; a deployment beyond ~10⁸
    * DISTINCT media payloads should widen the hash. (Explicitly
    * UNCAPPED configs trade this away: family arrays are then
    * unbounded, the spec/compat escape hatch only.) The hash is one
    * codegen pass per row; the payload bytes never shuffle — only
    * (60-bit hash, member ids, band hash) rows do. */
  def mmPhashDup(spark: SparkSession, dir: String,
      maxHamming: Int = 5, familyCap: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 5,
      s"mmPhashDup: maxHamming=$maxHamming outside the 6-band pigeonhole guarantee")
    val h = Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      // space-delimit the hex stream into 8-hex-char (4-byte) grams: the
      // token stream the shared SimHash60 kernel consumes
      .withColumn("grams", expr("regexp_replace(hex(payload), '(.{8})', '$1 ')"))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions.simhash60(col("grams")).as("ph"))
      .filter(col("ph").isNotNull)
    // family cap via the shared two-phase probe (Dedup.dropHotKeys):
    // the exact-hash family census runs once per corpus snapshot as
    // its own tiny-result job; the main plan sees either nothing (no
    // mega-family) or a map-side InSet filter on ph
    val famed = resolvePhashFamilyCap(spark, familyCap).fold(h) { cap =>
      Dedup.dropHotKeys(spark, h, "ph", cap, (dir, "phash_fam"))
    }
    // FAMILY-granularity banding (r11): the band join runs over
    // DISTINCT hashes, never doc rows — replica families collapse to
    // one row each (sorted member array, ≤ cap members under the
    // default-ON guard), so the 10-bit-bucket collision cost is
    // quadratic in distinct hashes, not in docs (a 10-replica corpus
    // pays 1/100th the join work), and the doc-pair expansion
    // afterwards is bounded by the OUTPUT. Same result set exactly:
    // cross-family pairs = hash pairs within Hamming≤maxHamming
    // sharing a band (pigeonhole-complete), expanded to all member
    // pairs; within-family pairs = C(s,2) at Hamming 0.
    // localCheckpoint (LAZY): four consumers read fams (two slim band
    // sides, two member-attach sides), and column pruning gives the
    // slim sides a DIFFERENT aggregate subtree than the attach sides —
    // no ReusedExchange possible — so without the checkpoint the
    // hash+aggregate pass executed per consumer pair. The table is one
    // slim row per DISTINCT hash (ids ≤ cap under the default-ON
    // guard); only the lineage is cut, rows stay distributed.
    val fams = famed.groupBy(col("ph"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .localCheckpoint(false)
    // the self-join carries ONLY the two hash longs — the candidate
    // stream is collision-sized (tens of millions of rows at 50k
    // distinct hashes), and dragging the member arrays through it
    // measured 5× the whole operator; survivors are output-bounded,
    // so the arrays attach afterwards by two hash joins
    val bandsSlim = fams.select(col("ph"), explode(expr("sequence(0, 5)")).as("b"))
      .withColumn("bh", expr("(ph >> (10 * b)) & 1023"))
    // shuffled-hash, not sort-merge: 6144 distinct (b, bh) keys with
    // huge per-key multiplicity make SMJ buffer-and-replay each dup
    // run (measured 10× slower than hash on the identical join)
    val hashPairs = bandsSlim.select(col("ph").as("ha"), col("b"), col("bh"))
      .hint("shuffle_hash")
      .join(bandsSlim.select(col("ph").as("hb"), col("b"), col("bh")), Seq("b", "bh"))
      .filter(col("ha") < col("hb"))
      .filter(expr(s"bit_count(ha ^ hb) <= $maxHamming"))
      .select(col("ha"), col("hb"),
        expr("cast(bit_count(ha ^ hb) as bigint)").as("hamming"))
      .dropDuplicates("ha", "hb")
    val crossFam = hashPairs
      .join(fams.select(col("ph").as("ha"), col("ids").as("ids_a")), Seq("ha"))
      .join(fams.select(col("ph").as("hb"), col("ids").as("ids_b")), Seq("hb"))
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("hamming"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("hamming"))
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"), col("hamming"))
    val withinFam = fams.filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids) - i - 1), y -> named_struct('da', x, 'db', y))))")).as("p"))
      .select(col("p.da").as("doc_a"), col("p.db").as("doc_b"),
        lit(0L).as("hamming"))
    crossFam.unionAll(withinFam)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Hamming-distance histogram of the perceptual near-dup pairs —
    * the THRESHOLD-TUNING diagnostic for [[mmPhashDup]] (where does
    * the pair mass sit between exact-dup Hamming 0 and the cut at 5?
    * a histogram hugging the cut says the threshold is clipping a
    * real near-dup population; one hugging 0 says the corpus
    * duplicates exactly and the band join is mostly confirming
    * [[mmExactDup]]). One ≤6-row aggregate over the gated pair set —
    * scale rides entirely on the pair operator. */
  def mmPhashHammingHist(spark: SparkSession, dir: String): DataFrame =
    mmPhashDup(spark, dir)
      .groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming"))

  /** WIDE perceptual-hash near-dup pairs — the >10⁸-distinct-payload
    * tier of [[mmPhashDup]]: a 128-bit SimHash (full md5 votes, two
    * 64-bit words) banded 6×(22/21/21 bits per word), so any pair
    * within Hamming distance 5 over the full 128 bits shares a whole
    * band (pigeonhole — same guarantee as the 60-bit tier). The design
    * bound this tier buys: a 60-bit hash has 10-bit band buckets that
    * fill with unrelated-doc collisions linearly in DISTINCT payloads
    * (~10⁸ before every bucket runs hot — the documented r11 limit);
    * 21/22-bit buckets push the same saturation past ~10¹² distinct
    * payloads, at the cost of one extra long per row in the slim band
    * stream. Same scale architecture as the 60-bit tier, verbatim:
    * identical-full-hash FAMILY capping (dup-density-driven, default
    * cap shared via `spark.graft.mm.phashFamilyCap`), band join at
    * FAMILY granularity over distinct hashes, slim two-long candidate
    * rows with member arrays attached only to output-bounded
    * survivors. Hamming across both words; pair orientation normalized
    * by doc_id. Payload bytes never shuffle. */
  def mmPhashDupWide(spark: SparkSession, dir: String,
      maxHamming: Int = 5, familyCap: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 5,
      s"mmPhashDupWide: maxHamming=$maxHamming outside the 6-band pigeonhole guarantee")
    val h = Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("grams", expr("regexp_replace(hex(payload), '(.{8})', '$1 ')"))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions.simhash128(col("grams")).as("ph"))
      .filter(col("ph").isNotNull)
      .select(col("doc_id"), expr("ph[0]").as("w1"), expr("ph[1]").as("w2"))
      // single-column family key for the shared two-phase probe
      .withColumn("phk", concat_ws(":", col("w1"), col("w2")))
    val famed = resolvePhashFamilyCap(spark, familyCap).fold(h) { cap =>
      Dedup.dropHotKeys(spark, h, "phk", cap, (dir, "phash128_fam"))
    }
    val fams = famed.groupBy(col("w1"), col("w2"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .localCheckpoint(false)
    // slim band stream: two hash longs + band id/value only
    val bandsSlim = fams.select(col("w1"), col("w2"),
        explode(expr("sequence(0, 5)")).as("b"))
      .withColumn("w", when(col("b") < 3, col("w1")).otherwise(col("w2")))
      .withColumn("bh", expr(
        """CASE WHEN b % 3 = 0 THEN w & 4194303
          |     WHEN b % 3 = 1 THEN (w >> 22) & 2097151
          |     ELSE (w >> 43) & 2097151 END""".stripMargin))
      .select(col("w1"), col("w2"), col("b"), col("bh"))
    val hashPairs = bandsSlim
      .select(col("w1").as("w1a"), col("w2").as("w2a"), col("b"), col("bh"))
      .hint("shuffle_hash")
      .join(bandsSlim.select(col("w1").as("w1b"), col("w2").as("w2b"),
        col("b"), col("bh")), Seq("b", "bh"))
      // one orientation per unordered hash pair (any deterministic
      // order works: output doc pairs re-normalize by doc_id)
      .filter(expr("w1a < w1b OR (w1a = w1b AND w2a < w2b)"))
      .filter(expr(s"bit_count(w1a ^ w1b) + bit_count(w2a ^ w2b) <= $maxHamming"))
      .select(col("w1a"), col("w2a"), col("w1b"), col("w2b"),
        expr("cast(bit_count(w1a ^ w1b) + bit_count(w2a ^ w2b) as bigint)").as("hamming"))
      .dropDuplicates("w1a", "w2a", "w1b", "w2b")
    val crossFam = hashPairs
      .join(fams.select(col("w1").as("w1a"), col("w2").as("w2a"),
        col("ids").as("ids_a")), Seq("w1a", "w2a"))
      .join(fams.select(col("w1").as("w1b"), col("w2").as("w2b"),
        col("ids").as("ids_b")), Seq("w1b", "w2b"))
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("hamming"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("hamming"))
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"), col("hamming"))
    val withinFam = fams.filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids) - i - 1), y -> named_struct('da', x, 'db', y))))")).as("p"))
      .select(col("p.da").as("doc_a"), col("p.db").as("doc_b"),
        lit(0L).as("hamming"))
    crossFam.unionAll(withinFam)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Byte-range chunking of media payloads: fixed-size chunks with
    * exact integer offsets and a per-chunk digest — the layout pass an
    * upload/CDC pipeline runs before moving large media (multipart
    * parts, content-defined sync windows). One Generate per row, zero
    * shuffles before the output sort; chunk slicing is columnar binary
    * (substring on the payload), the bytes never leave their row. The
    * digest is md5 over the chunk's HEX form: a pure function of the
    * bytes that both engines can compute byte-exactly for ANY payload
    * (DuckDB's md5 takes VARCHAR only, and character substrings would
    * silently diverge from byte slices on multi-byte content). */
  def mmChunkMedia(spark: SparkSession, dir: String,
      chunkBytes: Int = 96): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", expr("cast(octet_length(payload) as bigint)"))
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("n_bytes"), col("payload"),
        posexplode(expr(s"sequence(0L, n_bytes - 1, cast($chunkBytes as bigint))"))
          .as(Seq("chunk_idx", "start_byte")))
      .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        col("start_byte"),
        expr(s"least(cast($chunkBytes as bigint), n_bytes - start_byte)").as("chunk_len"),
        md5(expr(s"hex(substring(payload, cast(start_byte + 1 as int), $chunkBytes))")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Per-kind media profile over the deterministic decode stub: count
    * and mean pseudo-dimensions per media kind. Because the stub's
    * arithmetic is fixed (dims derived from byte lengths), the
    * profile is oracle-checkable — the plumbing pattern for the real
    * decoder's QA summary (count, resolution mix, frame stats). */
  def mmKindProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n", expr("cast(octet_length(cast(text as binary)) as bigint)"))
      .select(col("doc_id"), col("n"),
        when(col("n") % 2 === 0, "image").otherwise("audio").as("kind"),
        (lit(64) + col("n") % 577).cast("bigint").as("w"),
        (lit(64) + (col("n") * 31) % 421).cast("bigint").as("h"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n")).as("total_bytes"),
        (sum(col("w")) / count(lit(1)).cast("double")).as("avg_w"),
        (sum(col("h")) / count(lit(1)).cast("double")).as("avg_h"))
      .orderBy(col("kind"))

  /** SDXL-style aspect-ratio bucketing: every image snaps to the
    * nearest of 15 fixed training resolutions (8 landscape/square
    * bases + their portrait transposes) so batches can share a padded
    * shape — the standard pre-training layout pass for image corpora.
    * Image dims are an md5-derived metadata stub (512..2048 step 64);
    * aspect ratios compare as SCALED INTEGERS ((w·1000) div h) so the
    * nearest-bucket argmin is exact — no float ratios, no log-space
    * snapping. The bucket table broadcasts; assignment is one
    * map-side min-of-struct aggregate (no window over the corpus);
    * output is the 15-row bucket histogram. */
  def mmAspectBuckets(spark: SparkSession, dir: String): DataFrame = {
    val base = Seq((512, 2048), (576, 1664), (704, 1344), (768, 1280),
      (832, 1152), (896, 1088), (960, 1024), (1024, 1024))
    val all = (base ++ base.filter(p => p._1 != p._2).map(_.swap)).sorted
    val structs = all.map { case (w0, h0) =>
      s"named_struct('bw', cast($w0 as bigint), 'bh', cast($h0 as bigint))"
    }.mkString(", ")
    val buckets = spark.range(1)
      .select(explode(expr(s"array($structs)")).as("b"))
      .select(col("b.bw").as("bw"), col("b.bh").as("bh"))
      .withColumn("b_ar", expr("(bw * 1000) div bh"))
    def dim(salt: String): String =
      s"cast(64 * (8 + cast(conv(substring(md5(concat(cast(doc_id as string), '$salt')), 1, 2), 16, 10) as bigint) % 25) as bigint)"
    val imgs = Tables.documents(spark, dir)
      .select(col("doc_id"), expr(dim(":w")).as("w"), expr(dim(":h")).as("h"))
      .withColumn("img_ar", expr("(w * 1000) div h"))
    imgs.crossJoin(broadcast(buckets))
      .withColumn("adiff", abs(col("img_ar") - col("b_ar")))
      .groupBy(col("doc_id"), col("img_ar"))
      .agg(min(struct(col("adiff"), col("b_ar"), col("bw"), col("bh"))).as("m"))
      .select(col("img_ar"), col("m.bw").as("bw"), col("m.bh").as("bh"),
        col("m.b_ar").as("b_ar"))
      .groupBy(col("bw"), col("bh"), col("b_ar"))
      .agg(count(lit(1)).as("n_images"),
        min(col("img_ar")).as("min_ar"), max(col("img_ar")).as("max_ar"))
      .orderBy(col("bw"), col("bh"))
  }

}
