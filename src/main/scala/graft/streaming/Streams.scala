package graft.streaming

import graft.sinks.JdbcSink
import graft.sources.OdnsCsv
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Structured Streaming surface (SURVEY.md §2.4).
  *
  * The reference is a poll-the-archive-dir batch loop; its streaming twin
  * is a file-source stream over the same directory: each newly landed
  * archive becomes a micro-batch, exactly-once via checkpointing — no
  * cron, no processed/ directory bookkeeping (zipFileUtils.py:60-69
  * becomes the checkpoint log).
  */
object Streams {

  /** Streaming ODNS ingest: watch an archive dir, apply the same typed
    * transform as the batch reader. */
  def odnsStream(spark: SparkSession, protocol: String, dir: String): DataFrame = {
    val raw = spark.readStream
      .option("sep", ";")
      .option("header", "true")
      .option("maxFilesPerTrigger", 16) // bound micro-batch size at scale
      .schema(StructType(OdnsCsv.csvColumns(protocol)
        .map(StructField(_, StringType, nullable = true))))
      .csv(dir)
      .withColumn("_src", input_file_name())
    OdnsCsv.typed(raw, protocol)
  }

  /** Watermarked tumbling 1-hour aggregate — the streaming twin of
    * Analytics.q15TumblingAgg. Late events beyond 2h are dropped and
    * state is bounded, so this runs forever at any rate. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("cast(sum(cast(value as decimal(18,2))) as double)").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))

  /** Declarative gap-based sessionization — the streaming twin of
    * Analytics.q14Sessionize, via the built-in session_window (state
    * merged by Spark, bounded by the watermark). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"))

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: per-user running totals
    * with a processing-time idle timeout that flushes and drops state —
    * the pattern for any bespoke state machine the built-in windows
    * can't express. State per key is O(1); scale-out is by key hash. */
  def userRunningTotals(events: Dataset[UserEvent],
      idleTimeout: String = "1 hour"): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
            val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
              case ((cn, cv), e) => (cn + 1, cv + e.value)
            }
            val next = UserTotal(uid, n, v)
            state.update(next)
            state.setTimeoutDuration(idleTimeout)
            next
          }
      }
  }

  case class SessionEvent(user_id: Long, ts_us: Long)
  case class SessionState(start_us: Long, last_us: Long, n: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Custom stateful sessionizer via flatMapGroupsWithState: emits a
    * session row when a 30-minute gap closes it, carrying open-session
    * state per user with a processing-time idle timeout as the flush
    * path. This is the escape hatch for session semantics session_window
    * can't express (e.g. cap on session length, custom merge rules);
    * state is O(1) per user and sharded by key hash. */
  def sessionizeStateful(events: Dataset[SessionEvent],
      gapUs: Long = 1800L * 1000000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, s.start_us, s.last_us, s.n))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts_us)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_us - s.last_us <= gapUs =>
                  cur = Some(SessionState(s.start_us, e.ts_us, s.n + 1))
                case Some(s) =>
                  closed += SessionOut(uid, s.start_us, s.last_us, s.n)
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1))
                case None =>
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration("1 hour")
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup on a key: state bounded by the watermark —
    * duplicates arriving within the watermark window are dropped, the
    * streaming half of the batch ddExact operator (at-least-once
    * upstream → effectively-once downstream). */
  def dedupByKey(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming NEAR-dup dedup: the streaming half of the minhash/LSH
    * batch path. Each document's LSH band hashes are computed map-side
    * (same hash family as Dedup.ddMinhashLsh); a doc is emitted only if
    * its FIRST band hash is unseen within the watermark — docs that
    * collide with an earlier doc on that band (near-identical text) are
    * dropped in-stream with state bounded by the watermark. One band
    * gives the high-precision band-collision test; widen to all bands
    * downstream of a batch verify if recall matters more than state. */
  def dedupNearDup(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame = {
    val sig = docs
      .withColumn("sh", graft.functions.TextOps.shingleArray(textCol))
      .filter(size(col("sh")) > 0)
      .withColumn("band0", element_at(
        org.apache.spark.sql.graft.TextExpressions.minhashBands(col("sh"), 2, 1), 1))
      .drop("sh")
    sig
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("band0"))
  }

  /** Watermarked stream-stream interval join: for each purchase, the
    * error events of the same user in the preceding hour (fraud/debug
    * correlation shape). Both sides' state is bounded by watermark +
    * interval; the join is keyed on user_id so it scales by key hash. */
  def purchaseErrorJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "2 hours")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "2 hours")
    purchases.join(errors,
      expr("""user_id = e_user AND e_ts >= p_ts - INTERVAL 1 HOUR AND e_ts < p_ts"""))
      .select(col("user_id"), col("p_ts"), col("p_value"), col("e_ts"))
  }

  /** Streaming aggregation → JDBC via foreachBatch upsert: update-mode
    * batches re-emit changed keys, and the keyed upsert makes the sink
    * idempotent — the exactly-once-observable pattern for dashboards /
    * summary tables fed by a stream. */
  def aggToJdbcUpsert(agg: DataFrame, target: JdbcSink.Target,
      keyCols: Seq[String], checkpointDir: String): StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        JdbcSink.upsert(batch, target, keyCols)
      }
      .start()

  /** Stream → JDBC via foreachBatch: each micro-batch appends through
    * the same batched JDBC writer as the batch pipeline, giving
    * at-least-once into an idempotent target (dedupe on a key upstream
    * or use refreshPartition per batch window for exactly-once). */
  def toJdbc(df: DataFrame, target: JdbcSink.Target, checkpointDir: String,
      batchSize: Int = JdbcSink.DefaultBatchSize): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        JdbcSink.append(batch, target, batchSize)
      }
      .start()

  case class ScoredEvent(user_id: Long, event_id: Long, value: Double)
  case class TopKSnapshot(user_id: Long, top_ids: String, min_kept: Double)

  /** Streaming RUNNING TOP-K per key — the stream twin of the batch
    * TopKPerGroup operator: each key keeps a bounded k-item state
    * (value desc, event_id tie-break — a total order), updated per
    * micro-batch and emitted as the current snapshot. State is O(k)
    * per key, the same bound the batch operator's heaps carry; an
    * idle timeout would bound the key set in production (left off
    * here so the parity spec sees every key's final state). The
    * snapshot encodes the ids CSV so Update-mode sinks get one row
    * per key per trigger. */
  def runningTopK(events: Dataset[ScoredEvent], k: Int = 3): Dataset[TopKSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[List[(Double, Long)], TopKSnapshot](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[ScoredEvent], state: GroupState[List[(Double, Long)]]) =>
          val merged = (state.getOption.getOrElse(Nil) ++
              batch.map(e => (e.value, e.event_id)))
            .sortBy { case (v, id) => (-v, id) }
            .take(k)
          state.update(merged)
          TopKSnapshot(uid, merged.map(_._2).mkString(","), merged.last._1)
      }
  }

  case class HashedEvent(event_type: String, h: String)
  case class DistinctSnapshot(event_type: String, est_distinct: Double)

  /** Streaming approximate distinct per key via the KMV sketch — the
    * stream face of TypedAggs.KmvDistinct: state is the k smallest
    * md5 hashes per key (O(k), merge = sorted insert), and each
    * trigger emits the current estimate. Because the sketch is
    * deterministic, the final streamed snapshot is BIT-equal to the
    * batch aggregator on the same data — asserted in StreamingSpec.
    * This is the dashboard-counter shape: bounded state, update-mode
    * snapshots, no full distinct materialization. */
  def runningKmvDistinct(events: Dataset[HashedEvent], k: Int = 64): Dataset[DistinctSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[List[String], DistinctSnapshot](
        GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[HashedEvent], state: GroupState[List[String]]) =>
          var hashes = state.getOption.getOrElse(Nil)
          batch.foreach { e =>
            if (!hashes.contains(e.h)) {
              val (lo, hi) = hashes.span(_ < e.h)
              val merged = lo ::: e.h :: hi
              hashes = if (merged.length > k) merged.take(k) else merged
            }
          }
          state.update(hashes)
          val est =
            if (hashes.length < k) hashes.length.toDouble
            else {
              val r = java.lang.Long.parseLong(hashes.last.substring(0, 15), 16)
                .toDouble / (1L << 60).toDouble
              (k - 1).toDouble / r
            }
          DistinctSnapshot(key, est)
      }
  }

  case class DocSize(lang: String, doc_id: Long, dl: Long)
  case class PackedDoc(lang: String, doc_id: Long, dl: Long, start_off: Long,
      pack_first: Long, pack_last: Long)

  /** Streaming sequence-packing offsets — the stream twin of the batch
    * CorpusPipeline.pipePackSequences: per-language state is ONE long
    * (the running token offset) and each arriving doc is emitted with
    * its exact pack placement. Where the batch form recovers global
    * order via the distributed prefix sum, the streaming form relies
    * on per-language arrival order (a loader tailing doc shards in id
    * order) — state O(1) per language, placements row-identical to
    * the batch operator on the same ordered data (StreamingSpec). */
  def packingOffsets(docs: Dataset[DocSize], seqLen: Int = 128): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.lang)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, batch: Iterator[DocSize], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = batch.toSeq.sortBy(_.doc_id).map { d =>
            val start = off
            off += d.dl
            // positive operands: `/` truncation == the batch op's `div`
            PackedDoc(lang, d.doc_id, d.dl, start,
              start / seqLen, (start + d.dl - 1) / seqLen)
          }
          state.update(off)
          out.iterator
      }
  }

  case class DailyCents(priority: String, day_epoch: Long, cents: Long)
  case class EmaPoint(priority: String, day_epoch: Long, cents: Long, ema8_milli: Long)

  /** Streaming EMA — the stream twin of the batch q100 operator: the
    * 8-point α=1/4 EMA with exact rational weights 3ʲ·4⁷⁻ʲ/58975 and
    * the same overflow-safe integer split division, emitted in milli-
    * cents. State per priority is the last SEVEN cents values (O(1)),
    * so the arithmetic is IDENTICAL to the batch lag-window form —
    * row-for-row equal on the same ordered data (StreamingSpec), the
    * property that lets a live dashboard and the nightly batch job
    * agree to the last integer. Weights stay exact: no float ever
    * enters. */
  def emaStream(daily: Dataset[DailyCents]): Dataset[EmaPoint] = {
    import daily.sparkSession.implicits._
    val weights = (0 to 7).map(j =>
      (BigInt(3).pow(j) * BigInt(4).pow(7 - j)).toLong)
    daily
      .groupByKey(_.priority)
      .flatMapGroupsWithState[List[Long], EmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (p: String, batch: Iterator[DailyCents], state: GroupState[List[Long]]) =>
          var hist = state.getOption.getOrElse(Nil) // most recent first, ≤ 7
          val out = batch.toSeq.sortBy(_.day_epoch).flatMap { d =>
            val window = d.cents :: hist
            val res = if (window.size == 8) {
              val wsum = window.zip(weights).map { case (c, w) => c * w }.sum
              // split div: exact floor(wsum·1000/58975) without overflow
              Some(EmaPoint(p, d.day_epoch, d.cents,
                (wsum / 58975) * 1000 + ((wsum % 58975) * 1000) / 58975))
            } else None
            hist = window.take(7)
            res
          }
          state.update(hist)
          out.iterator
      }
  }

  case class TypedEvent(user_id: Long, event_type: String, ts_us: Long)
  case class DebounceState(last_us: Long)

  /** Streaming DEBOUNCE — the stream twin of the batch q65 operator:
    * an event within `gapUs` of the previously SEEN same-(user,type)
    * event is suppressed. O(1) state per key (just the last
    * timestamp), keyed and sharded exactly like the batch window's
    * partitioning; a processing-time idle timeout reaps keys so
    * state is bounded by the active-key set, not history. The lag
    * semantics (vs previous RAW event) are what make the batch and
    * stream halves produce identical keep-sets on the same data —
    * asserted in StreamingSpec. */
  def debounce(events: Dataset[TypedEvent],
      gapUs: Long = 30L * 1000000L): Dataset[TypedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[DebounceState, TypedEvent](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_: (Long, String), batch: Iterator[TypedEvent], state: GroupState[DebounceState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = batch.toSeq.sortBy(_.ts_us)
            val kept = Seq.newBuilder[TypedEvent]
            var last = state.getOption.map(_.last_us)
            sorted.foreach { e =>
              if (last.forall(l => e.ts_us - l > gapUs)) kept += e
              last = Some(e.ts_us)
            }
            last.foreach { l =>
              state.update(DebounceState(l))
              state.setTimeoutDuration("1 hour")
            }
            kept.result().iterator
          }
      }
  }

  case class DocArrival(source: String, doc_id: Long, n_chars: Long,
      priority: Long)
  case class SampleSnapshot(source: String, kept_ids: String,
      worst_priority: Long)

  /** Streaming weighted sampling without replacement — the stream twin
    * of CorpusPipeline.pipeWeightedSample: priority sampling is
    * NATURALLY streaming (keep the k smallest priorities per source;
    * a new arrival either evicts the current worst or is dropped), so
    * state is O(k) per source and the final snapshot is IDENTICAL to
    * the batch bottom-k on the same data — the priorities are
    * deterministic md5 integers, asserted in StreamingSpec. Update-mode
    * snapshots, one row per source per trigger. */
  def runningWeightedSample(docs: Dataset[DocArrival],
      k: Int = 10): Dataset[SampleSnapshot] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .mapGroupsWithState[List[(Long, Long)], SampleSnapshot](
        GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[DocArrival], state: GroupState[List[(Long, Long)]]) =>
          val merged = (state.getOption.getOrElse(Nil) ++
              batch.map(d => (d.priority, d.doc_id)))
            .sorted
            .take(k)
          state.update(merged)
          SampleSnapshot(src, merged.map(_._2).mkString(","), merged.last._1)
      }
  }

  case class SpcState(last: Long, n: Long, sum: Long, mx: Long)
  case class SpcSnapshot(priority: String, n_mr: Long, sum_mr: Long, max_mr: Long)

  /** Streaming SPC moving-range accumulator — the stream twin of the
    * batch q138 control chart: state per priority is FOUR longs (last
    * value, count, ΣMR, max MR), updated in day order per trigger.
    * The batch operator's out-of-control count tests against the
    * FINAL MR̄, which no online pass can know — so the twin carries
    * exactly the O(1) sufficient statistics that limit needs, and the
    * final snapshot is integer-identical to the batch n/Σ/max
    * (StreamingSpec parity); a live monitor flags against the
    * running limit instead, the standard online-SPC reading. */
  def controlChartStream(daily: Dataset[DailyCents]): Dataset[SpcSnapshot] = {
    import daily.sparkSession.implicits._
    daily
      .groupByKey(_.priority)
      .mapGroupsWithState[SpcState, SpcSnapshot](GroupStateTimeout.NoTimeout) {
        (p: String, batch: Iterator[DailyCents], state: GroupState[SpcState]) =>
          var st = state.getOption.getOrElse(SpcState(Long.MinValue, 0L, 0L, 0L))
          batch.toSeq.sortBy(_.day_epoch).foreach { d =>
            if (st.last != Long.MinValue) {
              val mr = math.abs(d.cents - st.last)
              st = SpcState(d.cents, st.n + 1, st.sum + mr, math.max(st.mx, mr))
            } else st = st.copy(last = d.cents)
          }
          state.update(st)
          SpcSnapshot(p, st.n, st.sum, st.mx)
      }
  }

  case class MaseState(ring: Seq[Long], prev: Long, hasPrev: Boolean,
      nEval: Long, sae: Long, nNaive: Long, sad: Long)
  case class MaseSnapshot(priority: String, n_eval: Long, sae_cents: Long,
      n_naive: Long, sad_cents: Long)

  /** Streaming MASE accumulators — the deployment twin of the batch
    * q186 forecast-accuracy readout: per priority the state is a
    * 7-long ring buffer (the lag-7 seasonal-naive predictions) plus
    * the previous value and four counters (Σ|e| over scored rows,
    * Σ|Δ| over naive-1 pairs) — O(1) state, ~9 longs. Each trigger
    * folds its days in order and emits the running sufficient
    * statistics; consumers form MASE = (sae/n_eval)/(sad/n_naive)
    * at the edge. Arrival contract as the SPC twin: day-ordered
    * batches per priority (the lag semantics are ROW-lag over the
    * observed series, exactly the batch operator's window). */
  def maseStream(daily: Dataset[DailyCents]): Dataset[MaseSnapshot] = {
    import daily.sparkSession.implicits._
    daily
      .groupByKey(_.priority)
      .mapGroupsWithState[MaseState, MaseSnapshot](GroupStateTimeout.NoTimeout) {
        (p: String, batch: Iterator[DailyCents], state: GroupState[MaseState]) =>
          var st = state.getOption.getOrElse(
            MaseState(Vector.empty, 0L, false, 0L, 0L, 0L, 0L))
          batch.toSeq.sortBy(_.day_epoch).foreach { d =>
            if (st.hasPrev)
              st = st.copy(nNaive = st.nNaive + 1,
                sad = st.sad + math.abs(d.cents - st.prev))
            if (st.ring.size == 7)
              st = st.copy(nEval = st.nEval + 1,
                sae = st.sae + math.abs(d.cents - st.ring.head))
            st = st.copy(ring = (st.ring :+ d.cents).takeRight(7),
              prev = d.cents, hasPrev = true)
          }
          state.update(st)
          MaseSnapshot(p, st.nEval, st.sae, st.nNaive, st.sad)
      }
  }

  case class DayDelta(day_epoch: Long, delta: Long)
  case class OpenCount(day_epoch: Long, net: Long, n_open: Long)

  /** Streaming concurrent-intervals count — the stream twin of the
    * batch q147 open-orders operator: state is ONE long (the running
    * open count), each trigger folds its days in order and emits the
    * per-day net and running count. The single group key mirrors the
    * batch form's single global running sum; like packingOffsets, the
    * arrival contract is day-ordered batches that never split a day —
    * under it the output is row-identical to the batch operator
    * (StreamingSpec parity). */
  def openIntervalsStream(deltas: Dataset[DayDelta]): Dataset[OpenCount] = {
    import deltas.sparkSession.implicits._
    deltas
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Long, OpenCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, batch: Iterator[DayDelta], state: GroupState[Long]) =>
          var run = state.getOption.getOrElse(0L)
          val out = batch.toSeq.groupBy(_.day_epoch).toSeq.sortBy(_._1)
            .map { case (d, rs) =>
              val net = rs.map(_.delta).sum
              run += net
              OpenCount(d, net, run)
            }
          state.update(run)
          out.iterator
      }
  }

  case class DocText(doc_id: Long, lang: String, text: String)
  case class EntropyGate(doc_id: Long, lang: String, n_types: Long,
      n_tokens: Long, h_num: Long, bits_per_token_micro: Long,
      low_entropy: Boolean)

  /** Streaming per-document entropy quality gate — the in-flight twin
    * of TextAnalysis.txtEntropyFilter: each arriving doc is scored and
    * flagged the moment it lands, with ZERO keyed state (the statistic
    * is doc-local). The exact fixed-point recurrence is the SAME Scala
    * function the native expression evaluates (Log2Fixed.compute via
    * the shifted form), so the flags are row-identical to the batch
    * operator on the same docs (StreamingSpec parity test). At
    * cluster scale this is a pure map stage on the ingest stream — a
    * C4-style cleaner that never waits for a batch window. */
  def entropyGateStream(docs: Dataset[DocText],
      minBitsMicro: Long = 3500000L): Dataset[EntropyGate] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.graft.Log2Fixed
    docs.flatMap { d =>
      // null/zero-token docs: the batch twin's split→filter→explode
      // yields no row for them — skip, don't kill the stream
      val toks = streamToks(d)
      if (toks.isEmpty) None
      else {
        val n = toks.length.toLong
        val counts = toks.groupBy(identity).view.mapValues(_.length.toLong)
        val sclg = counts.values.map(c => c * Log2Fixed.shifted(c)).sum
        val hNum = n * Log2Fixed.shifted(n) - sclg
        val micro = (BigInt(hNum) * 1000000 / (BigInt(n) * 1048576)).toLong
        Some(EntropyGate(d.doc_id, d.lang, counts.size.toLong, n, hNum, micro,
          micro < minBitsMicro))
      }
    }
  }

  case class DocPerplexity(doc_id: Long, lang: String, n_tokens: Long,
      ppl_num: Option[Long], bits_micro: Option[Long], high_perplexity: Boolean)

  /** Null-safe whitespace tokens — the ONE stream-side twin of the
    * batch TextOps.tokens; every doc-local gate tokenizes through
    * here so a tokenization fix cannot fork the parity contract. */
  private def streamToks(d: DocText): Array[String] =
    if (d.text == null) Array.empty[String]
    else d.text.split(" ").filter(_.nonEmpty)

  /** Doc-local term counts (doc_id, lang, term, c) — map-side, zero
    * state; shared by the unigram-LM and composite gates. */
  private def docTermCounts(docs: Dataset[DocText]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      streamToks(d).groupBy(identity).iterator
        .map { case (t, g) => (d.doc_id, d.lang, t, g.length.toLong) }
    }.toDF("doc_id", "lang", "term", "c")
  }

  /** Doc-local bigram counts (doc_id, lang, w1, w2, c_d) — map-side,
    * zero state; shared by the KN and composite gates. */
  private def docBigramCountsStream(docs: Dataset[DocText]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      streamToks(d).iterator.sliding(2).withPartial(false)
        .map(p => (p(0), p(1))).toSeq.groupBy(identity).iterator
        .map { case ((w1, w2), g) => (d.doc_id, d.lang, w1, w2, g.length.toLong) }
    }.toDF("doc_id", "lang", "w1", "w2", "c_d")
  }

  /** Write half of the reference-LM lake: persist the per-(lang, term)
    * smoothed-unigram reference counts and the per-lang totals that
    * TextAnalysis.txtDocPerplexity derives on the fly — the
    * signature-lake pattern (Dedup.sigLakeUpsert) applied to the LM:
    * build once from the trusted corpus, then every future stream/batch
    * scores against the SNAPSHOT instead of re-aggregating the corpus.
    * Layout: `path/terms` (lang, term, cr) vocab-keyed — corpus-sized,
    * partition-prunable on lang; `path/totals` (lang, v_l, n_l) — one
    * row per language. */
  def refLmWrite(spark: SparkSession, dir: String, path: String): Unit = {
    val terms = graft.functions.TextOps.balanced(graft.Tables.documents(spark, dir))
      .select(col("lang"), explode(graft.functions.TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("cr"))
    terms.write.mode("overwrite").parquet(s"$path/terms")
    spark.read.parquet(s"$path/terms")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("v_l"), sum(col("cr")).as("n_l"))
      .write.mode("overwrite").parquet(s"$path/totals")
  }

  /** Streaming per-document reference-LM perplexity gate — the
    * deployment shape of TextAnalysis.txtDocPerplexity: each arriving
    * doc is scored against the PERSISTED reference LM (the
    * [[refLmWrite]] snapshot) via a STREAM-STATIC join on
    * (lang, term) — the static side is the vocab-keyed parquet lake,
    * never broadcast, never re-aggregated per trigger. The per-doc
    * rollup runs as flatMapGroupsWithState with ZERO retained state
    * (state is never set): each doc's term rows land in one micro-batch
    * by the doc-arrives-whole contract every doc-local twin here uses,
    * so the group closes within the trigger. Snapshot semantics: counts
    * are AS-OF the lake write — a term the snapshot has never seen
    * scores as cr = 0, so its add-one-smoothed surprisal term is
    * lg(0+1) = 0, i.e. maximal surprise under the decomposed statistic
    * (the lg(N_l+V_l) mass is uncompensated). OUT-OF-SNAPSHOT-LANGUAGE
    * POLICY (unified across all streaming gates, r8): a doc whose
    * language has no reference LM is FLAGGED — emitted with
    * bits_micro = None and high_perplexity = true, exactly the
    * [[docKnPerplexityStream]] zero-known shape and the composite
    * [[qualityGateStream]]'s high_uni_ppl = true verdict — never
    * silently passed and never dropped from the verdict stream (a
    * cleaner that cannot score a doc must say so, not lose it). On the
    * snapshot's own corpus the output is row-identical to the batch
    * operator (StreamingSpec parity). */
  def docPerplexityStream(docs: Dataset[DocText], refLmPath: String,
      maxBitsMicro: Long = 5000000L): Dataset[DocPerplexity] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.Log2Fixed
    val refTerms = spark.read.parquet(s"$refLmPath/terms")
    // per-lang totals: |langs| rows — a driver map, captured by value
    val totals = spark.read.parquet(s"$refLmPath/totals").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // stream-static join: stream side keyed (lang, term); OOV → cr = 0
    val joined = docTermCounts(docs)
      .join(refTerms, Seq("lang", "term"), "left")
      .select(col("doc_id"), col("lang"), col("c"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .as[(Long, String, Long, Long)]
    joined.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Boolean, DocPerplexity](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((docId, lang), rows, _: GroupState[Boolean]) =>
          totals.get(lang) match {
            case None =>
              // off-snapshot language: no LM to score against — flag,
              // don't drop (the unified OOD policy; see scaladoc)
              // numerator None too (r9): 0L read as "exactly zero bits of
              // evidence" by consumers aggregating without a null check
              val n = rows.map(_._3).sum
              Iterator.single(DocPerplexity(docId, lang, n, None, None, true))
            case Some((vl, nl)) =>
              var n = 0L
              var sclg = BigInt(0)
              rows.foreach { case (_, _, c, cr) =>
                n += c
                sclg += BigInt(c) * Log2Fixed.shifted(cr + 1)
              }
              val pplNum = BigInt(n) * Log2Fixed.shifted(nl + vl) - sclg
              val micro = (pplNum * 1000000 / (BigInt(n) * 1048576)).toLong
              Iterator.single(DocPerplexity(docId, lang, n, Some(pplNum.toLong),
                Some(micro), micro > maxBitsMicro))
          }
      }
  }

  case class DocQualityVerdict(doc_id: Long, lang: String, n_tokens: Long,
      low_entropy: Boolean, high_uni_ppl: Boolean, high_kn_ppl: Boolean,
      keep: Boolean)

  /** Streaming QUALITY GATE — the in-flight twin of the batch
    * pipe_quality_funnel's row-level decision: every arriving doc is
    * scored on all three information-theoretic signals in ONE pass —
    * doc-local entropy (zero external state), unigram reference-LM
    * perplexity (stream-static join on the [[refLmWrite]] lake), and
    * KN-bigram perplexity (stream-static join on the [[knLmWrite]]
    * lake) — and emits one verdict row with the funnel's keep rule
    * (len ≥ MinDocTokens ∧ ¬low_entropy ∧ ¬high_uni ∧ ¬high_kn).
    * Plumbing: the doc explodes map-side into TAGGED rows (kind 'u' =
    * term counts carrying the lake's cr, kind 'b' = bigram counts
    * carrying the lake's bits_w), the two stream-static joins run on
    * their own keys, the tagged unions meet in ONE zero-retained-state
    * flatMapGroupsWithState — so the whole cleaner is a single
    * streaming query with a single stateful stage. Snapshot semantics
    * per component as in the two single-signal gates; docs the
    * tokenizer yields nothing for produce no row (the batch funnel
    * counts them as length-failures — the parity spec reconciles).
    * OUT-OF-SNAPSHOT-LANGUAGE POLICY (unified, r8): a doc whose
    * language has no unigram reference LM is FLAGGED high_uni_ppl =
    * true (⇒ keep = false) — same flag-don't-skip policy as
    * [[docPerplexityStream]] and [[docKnPerplexityStream]]; the batch
    * funnel never meets this case because it scores the same corpus
    * the LM is derived from. On the snapshot corpus the flags equal
    * the batch components row for row.
    *
    * DOC-ATOMICITY CONTRACT: a document's exploded rows must all
    * arrive within ONE micro-batch — the verdict is computed from the
    * rows of the batch the doc arrives in (zero carried state), which
    * holds for the file source used here because a doc is one parquet
    * row and files are assigned to triggers whole; the checkpointed-
    * restart spec pins exactly-once at that granularity. */
  def qualityGateStream(docs: Dataset[DocText], refLmPath: String,
      knLmPath: String,
      minBitsMicro: Long = 3500000L, maxUniBitsMicro: Long = 5000000L,
      maxKnBitsMicro: Long = 5000000L): Dataset[DocQualityVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.Log2Fixed
    val minTok = graft.operators.CorpusPipeline.MinDocTokens
    val refTerms = spark.read.parquet(s"$refLmPath/terms")
    val knLake = spark.read.parquet(s"$knLmPath/bigram_bits")
    val totals = spark.read.parquet(s"$refLmPath/totals").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val uniRows = docTermCounts(docs)
      .join(refTerms, Seq("lang", "term"), "left")
      .select(col("doc_id"), col("lang"), lit("u").as("kind"), col("c"),
        col("cr").as("aux"))
    val bgRows = docBigramCountsStream(docs)
      .join(knLake, Seq("lang", "w1", "w2"), "left")
      .select(col("doc_id"), col("lang"), lit("b").as("kind"),
        col("c_d").as("c"), col("bits_w").as("aux"))
    uniRows.union(bgRows)
      .as[(Long, String, String, Long, Option[Long])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Boolean, DocQualityVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((docId, lang), rows, _: GroupState[Boolean]) =>
          var n = 0L
          var sclgEnt = BigInt(0) // Σ c·lg(c) over doc term counts
          var sclgUni = BigInt(0) // Σ c·lg(cr+1) over ref counts
          var nKn = 0L
          var knownKn = 0L
          var sbKn = BigInt(0)
          rows.foreach {
            case (_, _, "u", c, cr) =>
              n += c
              sclgEnt += BigInt(c) * Log2Fixed.shifted(c)
              sclgUni += BigInt(c) * Log2Fixed.shifted(cr.getOrElse(0L) + 1)
            case (_, _, _, cD, bits) =>
              nKn += cD
              bits.foreach { b => knownKn += cD; sbKn += BigInt(cD) * b }
          }
          if (n == 0L) Iterator.empty
          else {
            val entMicro = ((BigInt(n) * Log2Fixed.shifted(n) - sclgEnt) *
              1000000 / (BigInt(n) * 1048576)).toLong
            val lowEntropy = entMicro < minBitsMicro
            val highUni = totals.get(lang) match {
              case Some((vl, nl)) =>
                val num = BigInt(n) * Log2Fixed.shifted(nl + vl) - sclgUni
                (num * 1000000 / (BigInt(n) * 1048576)).toLong > maxUniBitsMicro
              case None => true // no reference LM: out-of-distribution
            }
            val highKn =
              if (nKn == 0L) false // too short for a bigram score: dead at the length gate
              else if (knownKn == 0L) true // fully OOV under the KN LM
              else {
                val micro = (sbKn.abs * 1000000 / (BigInt(knownKn) * 1048576)).toLong *
                  (if (sbKn < 0) -1 else 1)
                micro > maxKnBitsMicro
              }
            val keep = n >= minTok && !lowEntropy && !highUni && !highKn
            Iterator.single(DocQualityVerdict(docId, lang, n,
              lowEntropy, highUni, highKn, keep))
          }
      }
  }

  case class DocKnPerplexity(doc_id: Long, lang: String, n_bigrams: Long,
      n_known: Long, kn_bits_num: Option[Long], bits_micro: Option[Long],
      high_perplexity: Boolean)

  /** Write half of the KN-bigram LM lake: persist the per-
    * (lang, w1, w2) SURPRISAL table bits_w that
    * TextAnalysis.txtDocKnPerplexity derives on the fly — the scored
    * LM itself is the lake, so the read half does zero LM math. The
    * scores are bit-identical to the batch filter's by construction
    * (both run TextAnalysis.knLmBits). */
  def knLmWrite(spark: SparkSession, dir: String, path: String): Unit =
    graft.operators.TextAnalysis.knBigramBits(spark, dir)
      .write.mode("overwrite").parquet(s"$path/bigram_bits")

  /** Streaming per-document KN-BIGRAM perplexity gate — the stronger
    * deployment twin above [[docPerplexityStream]]: arriving docs are
    * scored against the PERSISTED surprisal lake ([[knLmWrite]]) via a
    * stream-static join on (lang, w1, w2); the per-doc rollup is the
    * same zero-retained-state flatMapGroupsWithState. Snapshot
    * semantics differ from the unigram gate by necessity: an
    * add-one-smoothed unigram count extends to unseen terms, but a KN
    * bigram the snapshot has never seen HAS no discounted estimate —
    * OOV bigrams are counted (`n_bigrams − n_known`) and the score is
    * bits per KNOWN bigram; a doc with zero known bigrams is fully
    * out-of-distribution (bits_micro = None, flagged). On the
    * snapshot's own corpus n_known = n_bigrams and the output is
    * row-identical to the batch operator (StreamingSpec parity). */
  def docKnPerplexityStream(docs: Dataset[DocText], knLmPath: String,
      maxBitsMicro: Long = 5000000L): Dataset[DocKnPerplexity] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lake = spark.read.parquet(s"$knLmPath/bigram_bits")
    val joined = docBigramCountsStream(docs)
      .join(lake, Seq("lang", "w1", "w2"), "left")
      .select(col("doc_id"), col("lang"), col("c_d"), col("bits_w"))
      .as[(Long, String, Long, Option[Long])]
    joined.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Boolean, DocKnPerplexity](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((docId, lang), rows, _: GroupState[Boolean]) =>
          var n = 0L
          var known = 0L
          var sb = BigInt(0)
          rows.foreach { case (_, _, cD, bits) =>
            n += cD
            bits.foreach { b => known += cD; sb += BigInt(cD) * b }
          }
          if (known == 0L)
            Iterator.single(DocKnPerplexity(docId, lang, n, 0L, None, None, true))
          else {
            // the batch twin's sign-split integer division, exactly
            val micro = (sb.abs * 1000000 / (BigInt(known) * 1048576)).toLong *
              (if (sb < 0) -1 else 1)
            Iterator.single(DocKnPerplexity(docId, lang, n, known, Some(sb.toLong),
              Some(micro), micro > maxBitsMicro))
          }
      }
  }

  case class DocDsirWeight(doc_id: Long, lang: String, n_tokens: Long,
      w_num: Option[Long], w_micro: Option[Long], selected: Boolean)

  /** Write half of the DSIR importance-weight lake: persist the
    * per-(lang, term) RAW corpus counts and TARGET-slice
    * (source = 'src0') counts plus the per-lang totals that
    * TextAnalysis.txtDsirWeights derives on the fly — the same
    * signature-lake pattern as [[refLmWrite]]. Layout: `path/terms`
    * (lang, term, cr, ct) vocab-keyed; `path/totals`
    * (lang, v_l, n_r, n_t) one row per language. */
  def dsirLmWrite(spark: SparkSession, dir: String, path: String): Unit = {
    val docTerm = graft.functions.TextOps.balanced(graft.Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(graft.functions.TextOps.tokens("text")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(sum(lit(1L)).as("cr"),
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ct"))
    docTerm.write.mode("overwrite").parquet(s"$path/terms")
    spark.read.parquet(s"$path/terms")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("v_l"), sum(col("cr")).as("n_r"),
        sum(col("ct")).as("n_t"))
      .write.mode("overwrite").parquet(s"$path/totals")
  }

  /** Streaming DSIR importance-weight gate — the deployment shape of
    * TextAnalysis.txtDsirWeights: arriving docs are scored against the
    * PERSISTED raw/target LM lake ([[dsirLmWrite]]) via a
    * stream-static join on (lang, term); the per-doc rollup is the
    * same zero-retained-state flatMapGroupsWithState under the
    * doc-atomicity contract (a doc's term rows arrive within one
    * micro-batch). Snapshot semantics: a term NEITHER LM has seen
    * contributes lg(1) − lg(1) = 0 — no evidence either way (unlike
    * the perplexity gates, where OOV is maximal surprise); a doc whose
    * LANGUAGE is off-snapshot cannot be scored and is emitted with
    * w_micro = None and selected = false under the unified
    * flag-don't-skip policy — a selector that cannot score a doc must
    * not select it, and must not lose it from the verdict stream. On
    * the snapshot's own corpus the output is row-identical to the
    * batch operator. */
  def docDsirStream(docs: Dataset[DocText], dsirLmPath: String,
      minMicro: Long = graft.operators.TextAnalysis.DsirMinMicro): Dataset[DocDsirWeight] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.Log2Fixed
    val lake = spark.read.parquet(s"$dsirLmPath/terms")
    val totals = spark.read.parquet(s"$dsirLmPath/totals").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val joined = docTermCounts(docs)
      .join(lake, Seq("lang", "term"), "left")
      .select(col("doc_id"), col("lang"), col("c"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
      .as[(Long, String, Long, Long, Long)]
    joined.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Boolean, DocDsirWeight](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((docId, lang), rows, _: GroupState[Boolean]) =>
          totals.get(lang) match {
            case None =>
              val n = rows.map(_._3).sum
              Iterator.single(DocDsirWeight(docId, lang, n, None, None, false))
            case Some((vl, nr, nt)) =>
              var n = 0L
              var sdiff = BigInt(0)
              rows.foreach { case (_, _, c, cr, ct) =>
                n += c
                sdiff += BigInt(c) *
                  (Log2Fixed.shifted(ct + 1) - Log2Fixed.shifted(cr + 1))
              }
              val wNum = sdiff + BigInt(n) *
                (Log2Fixed.shifted(nr + vl) - Log2Fixed.shifted(nt + vl))
              // the batch twin's sign-split integer division, exactly
              val micro = (wNum.abs * 1000000 / (BigInt(n) * 1048576)).toLong *
                (if (wNum < 0) -1 else 1)
              Iterator.single(DocDsirWeight(docId, lang, n, Some(wNum.toLong),
                Some(micro), micro > minMicro))
          }
      }
  }

  case class DocKn3Perplexity(doc_id: Long, lang: String, n_trigrams: Long,
      n_known: Long, kn3_bits_num: Option[Long], bits_micro: Option[Long],
      high_perplexity: Boolean)

  /** Doc-local trigram counts (doc_id, lang, w1, w2, w3, c_d) —
    * map-side, zero state; the trigram twin of
    * [[docBigramCountsStream]]. */
  private def docTrigramCountsStream(docs: Dataset[DocText]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      streamToks(d).iterator.sliding(3).withPartial(false)
        .map(p => (p(0), p(1), p(2))).toSeq.groupBy(identity).iterator
        .map { case ((w1, w2, w3), g) =>
          (d.doc_id, d.lang, w1, w2, w3, g.length.toLong) }
    }.toDF("doc_id", "lang", "w1", "w2", "w3", "c_d")
  }

  /** Write half of the KN-TRIGRAM LM lake: persist the per-
    * (lang, w1, w2, w3) surprisal table bits_w that
    * TextAnalysis.txtDocKn3Perplexity derives on the fly — the same
    * Catalyst plan (TextAnalysis.kn3LmBits) as the batch filter, so
    * the persisted scores are bit-identical by construction. */
  def kn3LmWrite(spark: SparkSession, dir: String, path: String): Unit =
    graft.operators.TextAnalysis.kn3TrigramBits(spark, dir)
      .write.mode("overwrite").parquet(s"$path/trigram_bits")

  /** Streaming per-document KN-TRIGRAM perplexity gate — the
    * deployment twin of the deepest LM tier, exactly the
    * [[docKnPerplexityStream]] shape one level up: arriving docs are
    * scored against the PERSISTED surprisal lake ([[kn3LmWrite]]) via
    * a stream-static join on (lang, w1, w2, w3); the per-doc rollup is
    * the same zero-retained-state flatMapGroupsWithState under the
    * doc-atomicity contract (a doc's rows arrive within one
    * micro-batch — true for the file source, one parquet row per doc).
    * OOV trigrams are counted (`n_trigrams − n_known`), the score is
    * bits per KNOWN trigram; a doc with zero known trigrams — or an
    * out-of-snapshot LANGUAGE, which is just its special case — is
    * flagged with a null score (the unified flag-don't-skip OOD
    * policy). On the snapshot's own corpus n_known = n_trigrams and
    * the output is row-identical to the batch operator. */
  def docKn3PerplexityStream(docs: Dataset[DocText], kn3LmPath: String,
      maxBitsMicro: Long = 4000000L): Dataset[DocKn3Perplexity] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lake = spark.read.parquet(s"$kn3LmPath/trigram_bits")
    val joined = docTrigramCountsStream(docs)
      .join(lake, Seq("lang", "w1", "w2", "w3"), "left")
      .select(col("doc_id"), col("lang"), col("c_d"), col("bits_w"))
      .as[(Long, String, Long, Option[Long])]
    joined.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Boolean, DocKn3Perplexity](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((docId, lang), rows, _: GroupState[Boolean]) =>
          var n = 0L
          var known = 0L
          var sb = BigInt(0)
          rows.foreach { case (_, _, cD, bits) =>
            n += cD
            bits.foreach { b => known += cD; sb += BigInt(cD) * b }
          }
          if (known == 0L)
            Iterator.single(DocKn3Perplexity(docId, lang, n, 0L, None, None, true))
          else {
            // the batch twin's sign-split integer division, exactly
            val micro = (sb.abs * 1000000 / (BigInt(known) * 1048576)).toLong *
              (if (sb < 0) -1 else 1)
            Iterator.single(DocKn3Perplexity(docId, lang, n, known, Some(sb.toLong),
              Some(micro), micro > maxBitsMicro))
          }
      }
  }

  case class SourcedDoc(doc_id: Long, source: String, text: String)
  case class DriftState(counts: Map[Long, Long], n_s: Long, n_off: Long)
  case class DriftSnapshot(source: String, n_s: Long, n_off: Long,
      psi_num: String, psi_micro: Long)

  /** Write half of the DRIFT reference lake: persist the corpus-wide
    * 32-token length-bucket distribution that
    * TextAnalysis.pipeSourceDrift uses as its reference — the
    * "yesterday's corpus shape" snapshot the streaming monitor alarms
    * against. */
  def driftLmWrite(spark: SparkSession, dir: String, path: String,
      step: Int = 32): Unit = {
    val d = graft.Tables.documents(spark, dir)
      .select(graft.functions.TextOps.tokens("text").as("t"))
      .filter(size(col("t")) > 0)
      .select(expr(s"cast(((size(t) - 1) div $step + 1) * $step as bigint)").as("bucket"))
    val ref = d.groupBy(col("bucket")).agg(count(lit(1)).as("r"))
      .localCheckpoint(true)
    ref.write.mode("overwrite").parquet(s"$path/buckets")
    ref.agg(sum(col("r")).as("n_tot"), count(lit(1)).as("b_buckets"))
      .write.mode("overwrite").parquet(s"$path/totals")
  }

  /** STREAMING PSI drift monitor — the deployment twin of the batch
    * pipe_source_drift: arriving docs update O(#buckets) retained
    * state per source (bucket counts + totals; buckets are a few dozen
    * at any corpus size, so the state is effectively O(1) like the SPC
    * accumulator), and every trigger emits the RUNNING PSI of that
    * source's length distribution against the PERSISTED reference lake
    * ([[driftLmWrite]] — yesterday's corpus shape). Same exact
    * fixed-point arithmetic as the batch operator (Log2Fixed.shifted =
    * the SQL lgShift for in-domain args), so when the monitor has seen
    * the reference's own corpus the final snapshot is row-identical to
    * the batch PSI (StreamingSpec parity). A doc landing in a bucket
    * the reference has never seen cannot be scored against a reference
    * cell: it still counts in n_s (shifting mass off the reference
    * support registers as drift through every denominator) and is
    * surfaced in `n_off` — flag-don't-skip, like every gate here. */
  def sourceDriftStream(docs: Dataset[SourcedDoc], driftLmPath: String,
      step: Int = 32): Dataset[DriftSnapshot] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.Log2Fixed
    // O(#buckets) driver maps, captured by value — the lake IS the LM
    val refCounts = spark.read.parquet(s"$driftLmPath/buckets").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (nTot, bBuckets) = spark.read.parquet(s"$driftLmPath/totals").collect()
      .map(r => (r.getLong(0), r.getLong(1))).head
    docs.groupByKey(_.source)
      .mapGroupsWithState[DriftState, DriftSnapshot](GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[SourcedDoc], state: GroupState[DriftState]) =>
          var st = state.getOption.getOrElse(DriftState(Map.empty, 0L, 0L))
          batch.foreach { d =>
            val n = if (d.text == null) 0
              else d.text.split(" ").count(_.nonEmpty)
            if (n > 0) {
              val b = ((n - 1) / step + 1).toLong * step
              val off = !refCounts.contains(b)
              st = DriftState(
                if (off) st.counts
                else st.counts.updated(b, st.counts.getOrElse(b, 0L) + 1L),
                st.n_s + 1, st.n_off + (if (off) 1L else 0L))
            }
          }
          state.update(st)
          var num = BigInt(0)
          refCounts.foreach { case (b, r) =>
            val c = st.counts.getOrElse(b, 0L)
            val diff = BigInt(c + 1) * (nTot + bBuckets) -
              BigInt(r + 1) * (st.n_s + bBuckets)
            val lgd = Log2Fixed.shifted(c + 1) + Log2Fixed.shifted(nTot + bBuckets) -
              Log2Fixed.shifted(r + 1) - Log2Fixed.shifted(st.n_s + bBuckets)
            num += diff * lgd
          }
          val den = BigInt(st.n_s + bBuckets) * (nTot + bBuckets) * 1048576
          val micro = (num.abs * 1000000 / den).toLong * (if (num < 0) -1 else 1)
          DriftSnapshot(src, st.n_s, st.n_off, num.toString, micro)
      }
  }

  case class PhState(n: Long, cum: Long, m: Long, runmin: Long,
      phPeak: Long, peakDayEpoch: Long)
  case class PhSnapshot(priority: String, n_days: Long, m_end: Long,
      m_min: Long, ph_peak: Long, peak_day_epoch: Long)

  /** Streaming Page–Hinkley mean-shift monitor — the stream twin of
    * the batch [[graft.operators.Analytics.q166PageHinkley]]: state per
    * priority is SIX longs (count, running sum, accumulator m, its
    * running min, the peak PH and its day), folded in day order per
    * trigger; the running mean uses the same exact cent-floored
    * `cum div t`, so under the day-ordered arrival contract the final
    * snapshot is integer-identical to the batch operator (StreamingSpec
    * parity). This is the detector a live revenue monitor actually
    * deploys — alarm when ph_peak first exceeds λ; O(1) state per key,
    * runs forever at any rate. */
  def pageHinkleyStream(daily: Dataset[DailyCents]): Dataset[PhSnapshot] = {
    import daily.sparkSession.implicits._
    daily
      .groupByKey(_.priority)
      .mapGroupsWithState[PhState, PhSnapshot](GroupStateTimeout.NoTimeout) {
        (p: String, batch: Iterator[DailyCents], state: GroupState[PhState]) =>
          var st = state.getOption.getOrElse(
            PhState(0L, 0L, 0L, Long.MaxValue, Long.MinValue, Long.MinValue))
          batch.toSeq.sortBy(_.day_epoch).foreach { d =>
            val n = st.n + 1
            val cum = st.cum + d.cents
            val m = st.m + (d.cents - cum / n) // all positive: / == div
            val runmin = math.min(st.runmin, m)
            val ph = m - runmin
            val (peak, peakDay) =
              if (ph > st.phPeak) (ph, d.day_epoch)
              else (st.phPeak, st.peakDayEpoch)
            st = PhState(n, cum, m, runmin, peak, peakDay)
          }
          state.update(st)
          PhSnapshot(p, st.n, st.m, st.runmin, st.phPeak, st.peakDayEpoch)
      }
  }

  /** Write half of the CDC chunk-store lake: the history's DISTINCT
    * chunk hashes — the persisted index [[cdcIngestStream]] probes.
    * ~32 B/chunk, text pruned; an ingest run appends its own new
    * hashes after the probe (the sigLakeUpsert pattern). */
  def cdcLakeWrite(spark: SparkSession, dir: String, path: String,
      splitId: Long = 400L): Unit =
    graft.operators.Dedup.cdcChunkRowsOf(
      graft.Tables.documents(spark, dir).filter(col("doc_id") < splitId)
        .select(col("doc_id"), col("text")), 8, 63)
      .select(col("chunk_md5")).distinct()
      .write.mode("overwrite").parquet(s"$path/chunks")

  case class CdcIngestReport(doc_id: Long, n_chunks: Long, n_hit: Long,
      bytes_total: Long, bytes_saved: Long, saved_micro: Option[Long])

  /** Streaming CDC INGEST monitor — the deployment twin of
    * [[graft.operators.Dedup.ddCdcIngest]]: each arriving doc is
    * chunked with the SAME native rolling-hash boundaries, every chunk
    * probes the persisted chunk store ([[cdcLakeWrite]]) via a
    * stream-static left join on the digest, and the per-doc savings
    * report (chunks held, bytes saved, dedup ratio) is the
    * zero-retained-state flatMapGroupsWithState rollup every gate here
    * uses. Flag-don't-drop: a NULL-text doc survives the chunk
    * projection (explode_outer) and reports n_chunks = 0; saved_micro
    * is None whenever bytes_total = 0 — the same NULL the batch
    * operator's integer `div` yields there. Under the snapshot lake
    * the output is row-identical to the batch operator (StreamingSpec
    * parity + restart exactly-once). */
  def cdcIngestStream(docs: Dataset[DocText],
      lakePath: String): Dataset[CdcIngestReport] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = spark.read.parquet(s"$lakePath/chunks")
      .withColumn("hit", lit(1L))
    graft.operators.Dedup.cdcChunkRowsOf(
        docs.toDF().select(col("doc_id"), col("text")), 8, 63,
        keepOuter = true)
      .join(hist, Seq("chunk_md5"), "left_outer")
      .select(col("doc_id"),
        // NULL chunk_len marks the no-chunks row explode_outer kept:
        // length -1 is the in-band sentinel the rollup skips (chunk
        // lengths are never negative)
        coalesce(col("chunk_len"), lit(-1L)).as("chunk_len"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, CdcIngestReport](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (docId, rows, _: GroupState[Boolean]) =>
          var n = 0L; var h = 0L; var bt = 0L; var bs = 0L
          rows.foreach { case (_, len, hit) =>
            if (len >= 0L) {
              n += 1; bt += len
              if (hit == 1L) { h += 1; bs += len }
            }
          }
          Iterator.single(CdcIngestReport(docId, n, h, bt, bs,
            if (bt == 0L) None else Some(bs * 1000000L / bt)))
      }
  }

  /** Write half of the ANN SERVING lake: the IVF-PQ index — coarse
    * cell centroids, residual codebook, and per-vector codes — built
    * by [[graft.operators.Similarity.ivfpqIndexParts]], the EXACT
    * frames the gated batch operator (sim_ivfpq) scores with. This is
    * the deployment shape for 100 TB: the corpus is scanned once per
    * snapshot to build the index; query batches afterwards never touch
    * raw vectors — they read 8-byte codes through the inverted-file
    * label join. Key types normalize to LONG at the write edge so the
    * serving side is schema-stable across corpus snapshots. */
  def ivfpqLakeWrite(spark: SparkSession, dir: String, path: String): Unit = {
    val (cells, cb, codes) = graft.operators.Similarity.ivfpqIndexParts(spark, dir)
    cells.select(col("label").cast("long").as("label"), col("cellv"))
      .write.mode("overwrite").parquet(s"$path/cells")
    cb.select(col("g").cast("long").as("code"), col("sub").cast("long").as("sub"),
        col("cv"))
      .write.mode("overwrite").parquet(s"$path/codebook")
    codes.select(col("vec_id"), col("label").cast("long").as("label"),
        col("sub").cast("long").as("sub"), col("code").cast("long").as("code"))
      .write.mode("overwrite").parquet(s"$path/codes")
    // the serving-side read shape (r11 advice): ONE row per vector with
    // its 8 sub-codes pivoted sub-ascending into an array, so the query
    // path joins one candidate row per vector instead of 8 term rows —
    // pivoted ONCE at build time, never per micro-batch
    codes.groupBy(col("vec_id"), col("label").cast("long").as("label"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(sub, code))), x -> cast(x.code as long))")
        .as("codevec"))
      .write.mode("overwrite").parquet(s"$path/codes_wide")
  }

  case class QueryVec(q_id: Long, q_emb: Array[Float])
  case class AnnHit(q_id: Long, rank: Long, vec_id: Long, cell: Long,
      adc_dist: Double)

  /** Streaming IVF-PQ serving — the query path of the persisted ANN
    * lake ([[ivfpqLakeWrite]]): each arriving query vector ranks the
    * broadcast-scale cell centroids map-side (10 cells × 64 doubles —
    * a driver map captured by value, the refLm-totals pattern), emits
    * its top-nprobe (cell, residual) probes, and the candidates come
    * from a STREAM-STATIC inverted-file join on the cell label — codes
    * of un-probed cells never leave the scan, and the raw corpus is
    * never touched at query time. The per-candidate ADC is computed
    * MAP-SIDE in the batch operator's exact IEEE op order (per-sub
    * j-ascending squares folded sequentially, then the sub-ascending
    * term fold — the array_sort(struct(sub, term)) accumulation order),
    * against the pre-pivoted `codes_wide` lake table (one row per
    * candidate vector, its 8 sub-codes as an array) and the
    * driver-collected codebook (8 subs × 16 codewords × 8 doubles —
    * broadcast-by-value like the centroids). The per-query rollup is
    * then a BOUNDED top-k heap over one row per candidate (r11 advice:
    * the previous shape buffered all candidate×8 term rows per query
    * in an executor map — per-query heap grew with the corpus; now
    * per-query working memory is O(k) regardless of candidate count),
    * zero-retained-state flatMapGroupsWithState — a query's candidate
    * rows all land in its own micro-batch, so no state outlives the
    * trigger. On the snapshot's own queries the output is
    * ROW-IDENTICAL to sim_ivfpq, adc_dist bit-for-bit (StreamingSpec
    * parity + checkpointed-restart exactly-once). */
  def ivfpqServeStream(queries: Dataset[QueryVec], lakePath: String,
      nprobe: Int = 2, k: Int = 5): Dataset[AnnHit] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cells: Array[(Long, Array[Double])] =
      spark.read.parquet(s"$lakePath/cells").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    // codebook by value: cbArr(sub)(code) = 8-dim codeword (tiny, fixed)
    val cbArr: Array[Array[Array[Double]]] = {
      val rows = spark.read.parquet(s"$lakePath/codebook").collect()
        .map(r => (r.getLong(1).toInt, r.getLong(0).toInt, r.getSeq[Double](2).toArray))
      val nSub = rows.map(_._1).max + 1
      val nCode = rows.map(_._2).max + 1
      val arr = Array.ofDim[Array[Double]](nSub, nCode)
      rows.foreach { case (sub, code, cv) => arr(sub)(code) = cv }
      arr
    }
    val codesWide = spark.read.parquet(s"$lakePath/codes_wide")
    // per-query probe fan-out, map-side: exact L2 to each centroid with
    // the batch fold's exact op order (sequential i-ascending adds over
    // (x_d − c_d)²), ranked by (dist, label) — identical cell choice
    val probes = queries.flatMap { q =>
      val scored = cells.map { case (label, cv) =>
        var acc = 0.0
        var i = 0
        while (i < cv.length) {
          val d = q.q_emb(i).toDouble - cv(i); acc += d * d; i += 1
        }
        (label, acc)
      }
      scored.sortBy { case (l, dist) => (dist, l) }.take(nprobe).iterator
        .map { case (label, _) =>
          val cv = cells.find(_._1 == label).get._2
          val qr = Array.tabulate(cv.length)(i => q.q_emb(i).toDouble - cv(i))
          (q.q_id, label, qr)
        }
    }.toDF("q_id", "label", "qr")
    probes
      // inverted-file read: ONE slim row per candidate vector in a
      // probed cell (codes of un-probed cells never leave the scan)
      .join(codesWide, Seq("label"))
      .select(col("q_id"), col("vec_id"), col("label"), col("qr"), col("codevec"))
      .as[(Long, Long, Long, Seq[Double], Seq[Long])]
      .map { case (qId, vecId, label, qrSeq, codevec) =>
        // the batch ADC bit-for-bit: term_sub = Σ_{j=1..8} (qr[sub·8+j]
        // − cv[j])² folded j-ascending, terms folded sub-ascending
        val qr = qrSeq.toArray
        var adc = 0.0
        var sub = 0
        while (sub < codevec.length) {
          val cw = cbArr(sub)(codevec(sub).toInt)
          var term = 0.0
          var j = 0
          while (j < cw.length) {
            val d = qr(sub * 8 + j) - cw(j); term += d * d; j += 1
          }
          adc += term
          sub += 1
        }
        (qId, vecId, label, adc)
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, AnnHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (qId, rows, _: GroupState[Boolean]) =>
          // bounded top-k: a size-k max-heap on (adc, vec_id) — each
          // candidate vector appears exactly once per query (one cell
          // per vector, distinct probed cells), so evicting the current
          // worst reproduces sortBy((adc, vec_id)).take(k) exactly
          val ord = Ordering.by[(Long, Long, Double), (Double, Long)] {
            case (vecId, _, adc) => (adc, vecId)
          }
          val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long, Double)](ord)
          rows.foreach { case (_, vecId, label, adc) =>
            if (vecId != qId) {
              heap.enqueue((vecId, label, adc))
              if (heap.size > k) heap.dequeue()
            }
          }
          val topk: Seq[(Long, Long, Double)] = heap.dequeueAll.reverse
          topk.iterator.zipWithIndex
            .map { case ((vecId, label, adc), i) =>
              AnnHit(qId, (i + 1).toLong, vecId, label, adc)
            }
      }
  }

  /** Write half of the EDIT-GATE dedup lake: the history's LSH band
    * hashes (slim — 4 rows × ~40 bytes per doc, text pruned from the
    * scan) plus the history texts the verify tier fetches by id. Band
    * hashes are [[graft.operators.Dedup.bandsFromSigs]] over the same
    * signatures the batch flows use, so the stream's candidate set is
    * bit-identical to [[graft.operators.Dedup.ddIncremental]]'s. */
  def editLakeWrite(spark: SparkSession, dir: String, path: String,
      splitId: Long = 400L): Unit = {
    graft.operators.Dedup.bandsFromSigs(
      graft.operators.Dedup.ddMinhashSigs(spark, dir)
        .filter(col("doc_id") < splitId))
      .write.mode("overwrite").parquet(s"$path/bands")
    graft.Tables.documents(spark, dir).filter(col("doc_id") < splitId)
      .select(col("doc_id").as("doc_old"), col("text").as("text_old"))
      .write.mode("overwrite").parquet(s"$path/texts")
  }

  case class EditGateVerdict(doc_id: Long, lang: String, n_cand: Long,
      best_micro: Option[Long], is_dup: Boolean)

  /** Streaming EDIT-DISTANCE dedup gate — the deployment twin of
    * [[graft.operators.Dedup.ddEditGate]]: each arriving doc is banded
    * with the SAME minhash-band expression as the batch flow, candidate
    * partners come from a stream-static join against the persisted band
    * lake ([[editLakeWrite]]), each candidate is verified with full
    * character Levenshtein against the lake text, and the per-doc
    * verdict is the minimum normalized distance — `is_dup` iff
    * best ≤ maxDistMicro. Docs with no candidates (including
    * too-short-to-shingle docs, kept through posexplode_outer) pass
    * with n_cand = 0 / best_micro = None — flag-don't-skip, nothing is
    * silently dropped. The per-doc rollup is the zero-retained-state
    * flatMapGroupsWithState every gate here uses: a stream-static join
    * delivers ALL of a doc's candidate rows in its own micro-batch, so
    * no state outlives the batch and the stream runs forever at any
    * rate. O(len²) verify cost is bounded by the band-keyed candidate
    * fan-out, never all-pairs. */
  def editGateStream(docs: Dataset[DocText], lakePath: String,
      maxDistMicro: Long = 400000L): Dataset[EditGateVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = spark.read.parquet(s"$lakePath/bands")
    val texts = spark.read.parquet(s"$lakePath/texts")
    docs.toDF()
      .withColumn("sh", graft.functions.TextOps.shingleArray("text"))
      .select(col("doc_id"), col("lang"), col("text"),
        posexplode_outer(when(size(col("sh")) > 0,
          org.apache.spark.sql.graft.TextExpressions.minhashBands(col("sh"), 8, 4)))
          .as(Seq("b", "bh")))
      .join(bands, Seq("b", "bh"), "left_outer")
      .join(texts, Seq("doc_old"), "left_outer")
      .withColumn("dist_micro", expr(
        "cast(levenshtein(text, text_old) as bigint) * 1000000" +
          " div greatest(length(text), length(text_old))"))
      .select(col("doc_id"), col("lang"), col("doc_old"), col("dist_micro"))
      .as[(Long, String, Option[Long], Option[Long])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Boolean, EditGateVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((docId, lang), rows, _: GroupState[Boolean]) =>
          val seen = scala.collection.mutable.Set.empty[Long]
          var best = Option.empty[Long]
          rows.foreach { case (_, _, oldOpt, dOpt) =>
            oldOpt.foreach(seen += _)
            dOpt.foreach(d => if (best.forall(d < _)) best = Some(d))
          }
          Iterator.single(EditGateVerdict(docId, lang, seen.size.toLong,
            best, best.exists(_ <= maxDistMicro)))
      }
  }

  /** Write half of the duplicated-gram lake — the ExactSubstr
    * ([[graft.operators.Dedup.ddDupSpans]]) census persisted once from
    * the trusted corpus (the refLmWrite/sigLake pattern): every word
    * `n`-gram with ≥2 occurrences corpus-wide, gram-keyed parquet. */
  def dupGramLakeWrite(spark: SparkSession, dir: String, path: String,
      n: Int = 10): Unit =
    graft.functions.TextOps.balanced(graft.Tables.documents(spark, dir))
      .select(graft.functions.TextOps.ngramArray("text", n).as("g"))
      .filter(size(col("g")) > 0)
      .select(explode(col("g")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("gram"))
      .write.mode("overwrite").parquet(s"$path/dup_grams")

  case class DocDupSpans(doc_id: Long, lang: String, n_grams: Long,
      n_dup_grams: Long, n_spans: Long, dup_token_span: Long,
      longest_span: Long, has_dup: Boolean)

  /** Streaming duplicated-span gate — the in-flight twin of
    * [[graft.operators.Dedup.ddDupSpans]]: each arriving doc's word
    * n-gram positions probe the PERSISTED dup-gram lake via a
    * stream-static left join (gram-keyed, never broadcast, never
    * re-censused per trigger); the per-doc island merge (gap ≤ n —
    * exactly the batch operator's span rule) runs in ONE
    * zero-retained-state flatMapGroupsWithState under the
    * doc-arrives-whole contract every doc-local twin here uses.
    * CLEAN DOCS ARE EMITTED with has_dup = false, zero spans — the
    * flag-don't-drop policy (a decontamination gate must say "clean",
    * not lose the doc); the batch cut-list equals the has_dup = true
    * subset row for row on the lake's own corpus (StreamingSpec
    * parity). Snapshot semantics: a gram the lake never saw counts as
    * non-duplicated — new dups ACROSS arriving docs are the next lake
    * rebuild's job (same as-of contract as the LM gates). */
  def dupSpanGateStream(docs: Dataset[DocText], lakePath: String,
      n: Int = 10): Dataset[DocDupSpans] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lake = spark.read.parquet(s"$lakePath/dup_grams")
      .withColumn("hit", lit(1))
    val grams = docs.flatMap { d =>
      val t = streamToks(d)
      (0 to t.length - n).iterator
        .map(i => (d.doc_id, d.lang, (i + 1).toLong, t.slice(i, i + n).mkString(" ")))
    }.toDF("doc_id", "lang", "pos", "gram")
    grams.join(lake, Seq("gram"), "left")
      .select(col("doc_id"), col("lang"), col("pos"),
        coalesce(col("hit"), lit(0)).as("hit"))
      .as[(Long, String, Long, Int)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Boolean, DocDupSpans](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((docId, lang), rows, _: GroupState[Boolean]) =>
          var nGrams = 0L
          val dups = scala.collection.mutable.ArrayBuffer.empty[Long]
          rows.foreach { case (_, _, p, h) =>
            nGrams += 1
            if (h == 1) dups += p
          }
          val ps = dups.sorted
          var nSpans = 0L; var covered = 0L; var longest = 0L
          var s = -1L; var last = -1L
          def close(): Unit = if (s >= 0) {
            val len = last + n - 1 - s + 1
            nSpans += 1; covered += len; if (len > longest) longest = len
          }
          ps.foreach { p =>
            if (s < 0 || p > last + n) { close(); s = p }
            last = p
          }
          close()
          Iterator.single(DocDupSpans(docId, lang, nGrams, ps.length.toLong,
            nSpans, covered, longest, ps.nonEmpty))
      }
  }
}
