package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.ops.MergeWriter

/** Input tick for the stateful alert stream. */
case class PriceTick(asset_id: String, ts: java.sql.Timestamp, price: Double)

/** Input document for the streaming near-dup detector. */
case class DocText(doc_id: Long, text: String)

/** Emitted when a document lands in a minhash band bucket already
  * claimed by an earlier document: a NEAR-DUP CANDIDATE (same
  * contract as the batch band join — verify with exact Jaccard
  * downstream before dropping; a doc colliding in several bands is
  * emitted once per band). */
case class NearDupCandidate(doc_id: Long, dup_of: Long, band: Int)

/** Emitted when a tick exceeds the running per-asset high watermark. */
case class HighAlert(asset_id: String, ts: java.sql.Timestamp,
                     price: Double, prev_high: Double)

/** Input event for the streaming sessionizer. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

/** Input event for the streaming A→B pattern matcher: `etype` is
  * "A" (the trigger, e.g. login/impression) or "B" (the goal, e.g.
  * purchase/click); other types should be filtered out upstream. */
case class PatternEvent(user_id: Long, etype: String,
                        ts: java.sql.Timestamp, event_id: Long)

/** One resolution per A event from [[StreamingIngest.matchPattern]]:
  * `matched = true` with the FIRST qualifying B's timestamp, or
  * `matched = false` (b_ts = epoch sentinel) when the watermark
  * passed `a_ts + horizon` with no qualifying B — the timeout. An A
  * whose window is still open at stream end emits nothing. */
case class PatternOutcome(user_id: Long, a_id: Long, a_ts: java.sql.Timestamp,
                          b_ts: java.sql.Timestamp, matched: Boolean)

/** A CLOSED session emitted by [[StreamingIngest.sessionizeStream]]:
  * closed either by a same-user event beyond the gap (emitted at
  * arrival) or by the event-time timer once the watermark passes
  * `session_end + gap` (no in-order event can extend it anymore). A
  * session still open at stream end is never emitted — the same
  * contract as `session_window`'s unclosed tail. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long)

/** Structured Streaming skin over the reference's incremental contract
  * (SURVEY.md §2.10). The reference emulates streaming with a daily
  * cron + overlap-and-upsert (`.github/workflows/etl.yml:5-7`,
  * `src/etl.py:35`); the native-stream equivalent is:
  *
  *   tick stream → watermark (late-data tolerance = the reference's
  *   24 h refetch overlap) → 1-hour tumbling-window candles →
  *   foreachBatch last-write-wins merge.
  *
  * Update output mode + an idempotent merge sink reproduces
  * overlap-and-upsert exactly: a window re-emitted with late data
  * overwrites its previous row by PK, like a re-run of the ETL over
  * the same window. State scales as (assets × open windows), bounded
  * by the watermark — safe at 1000-executor scale.
  */
object StreamingIngest {

  /** Hourly OHLC candles over a (possibly streaming) tick frame with
    * columns (asset_id, ts, price, market_cap, volume).
    * Works identically on batch frames (watermark is a no-op there),
    * which is how the spec cross-checks stream vs batch results. */
  def hourlyCandles(ticks: DataFrame, watermark: String = "24 hours"): DataFrame =
    ticks
      .withWatermark("ts", watermark)
      .groupBy(col("asset_id"), window(col("ts"), "1 hour").as("w"))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        max_by(col("market_cap"), when(col("market_cap").isNotNull, col("ts"))).as("market_cap"),
        max_by(col("volume"), when(col("volume").isNotNull, col("ts"))).as("volume"),
        count(lit(1)).as("n_ticks"))
      .select(col("asset_id"), col("w.start").as("ts"),
        col("open"), col("high"), col("low"), col("close"),
        col("market_cap"), col("volume"), col("n_ticks"))

  /** Streaming exact dedup over a document stream — the streaming form
    * of `Dedup.exactDedup` for continuous training-data ingest: rows
    * whose normalized content hash was already seen are dropped;
    * per-hash state is bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark`), so state size is
    * (distinct docs per watermark horizon), not unbounded history. */
  def dedupDocuments(docs: DataFrame, watermark: String = "24 hours"): DataFrame =
    docs
      .withColumn("content_hash", graft.ext.Dedup.contentHash(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming NEAR-duplicate candidate detection — the streaming form
    * of `Dedup.nearDupText`'s band join, for continuous training-data
    * ingest where "have I seen something like this" must be answered
    * per arriving document, not per batch recompute.
    *
    * Per-row (map-only): normalize → trigram shingles → minhash
    * signature → `numBands` band buckets, computed with the SAME
    * hash chain as the batch operator (xxhash64 shingle → per-seed
    * xxhash64 → per-band combiner), so stream and batch agree on
    * candidacy exactly (spec-asserted). The signature uses the HOF
    * form here — per-document streaming cost, where the batch path's
    * explode+aggregate shape doesn't compose with the keyed state op
    * (one stateful operator per stream).
    *
    * Stateful: one `Long` (first-seen doc id) per OCCUPIED (band,
    * bucket) — the keyed-state analog of the band join's build side.
    * State grows with distinct buckets seen; production ingest bounds
    * it with `GroupStateTimeout` eviction (the watermark analog of
    * `dropDuplicatesWithinWatermark`), which changes candidate recall
    * only across evicted horizons. Works on a batch Dataset too
    * (state is per-group-empty there; smallest id wins via the
    * in-group sort), which is how the spec cross-checks.
    */
  /** Per-row (map-only) minhash band-bucket derivation shared by the
    * two streaming near-dup forms: (doc_id, band, bucket) rows with
    * the SAME hash chain as the batch band join. */
  private def bandBucketRows(docs: Dataset[DocText],
                             numBands: Int, r: Int): Dataset[(Long, Int, Long)] = {
    import docs.sparkSession.implicits._
    import graft.ext.Dedup
    val bands = Dedup.bandBuckets(numBands, r)(i => element_at(col("__sig"), i + 1))
    docs.toDF()
      .withColumn("__toks", split(Dedup.normalized(col("text")), " "))
      .withColumn("__sh", Dedup.shinglesFromToks(col("__toks")))
      .filter(size(col("__sh")) > 0)
      .withColumn("__h", transform(col("__sh"), s => xxhash64(s)))
      // The `when` guard is always true post-filter; it exists to
      // reference __h a SECOND time in this projection, so
      // CollapseProject keeps it as a materialized alias — a
      // single-referenced non-cheap alias gets inlined into the
      // per-seed lambda and re-hashes every shingle once per seed
      // (the expression-tree recompute class; a filter between
      // projections is no barrier, PushPredicateThroughProject
      // substitutes it away — the round-2 lesson).
      .withColumn("__sig", when(size(col("__h")) > 0,
        transform(sequence(lit(0), lit(numBands * r - 1)),
          s => array_min(transform(col("__h"), h => Dedup.permHash(h, s))))))
      .select(col("doc_id"), explode(bands).as("__b"))
      .select(col("doc_id"), col("__b.band").as("band"), col("__b.bucket").as("bucket"))
      .as[(Long, Int, Long)]
  }

  def nearDupCandidates(docs: Dataset[DocText],
                        numBands: Int = 16, r: Int = 4): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    // Band/bucket construction and per-seed permutation hash are the
    // SHARED Dedup helpers — one definition for batch and stream, so
    // candidacy cannot drift (also spec-compared on the same corpus).
    bandBucketRows(docs, numBands, r)
      .groupByKey { case (_, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[Long, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state) =>
          var first = state.getOption.getOrElse(Long.MaxValue)
          val out = rows.toSeq.sortBy(_._1).flatMap { case (id, _, _) =>
            if (first == Long.MaxValue) { first = id; None }
            else if (id != first) Some(NearDupCandidate(id, first, band))
            else None
          }
          state.update(first)
          out.iterator
      }
  }

  /** The `transformWithState` processor behind [[nearDupCandidatesTtl]]:
    * one first-claimant doc id per occupied (band, bucket), held in a
    * ValueState with a PROCESSING-TIME TTL — the state bound the
    * NoTimeout form documents but cannot enforce. Every batch that
    * touches a bucket refreshes its TTL (update-on-activity: a bucket
    * expires only after `ttl` of silence), after which the next
    * arrival re-claims it — candidate recall changes exactly across
    * evicted horizons, the documented trade. */
  private[streaming] class BucketClaimProcessor(ttl: TTLConfig)
      extends StatefulProcessor[(Int, Long), (Long, Int, Long), NearDupCandidate] {
    @transient private var first: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      first = getHandle.getValueState[Long]("first", Encoders.scalaLong, ttl)
    override def handleInputRows(key: (Int, Long), rows: Iterator[(Long, Int, Long)],
                                 tv: TimerValues): Iterator[NearDupCandidate] = {
      var f = if (first.exists()) Some(first.get()) else None
      val out = rows.toSeq.sortBy(_._1).flatMap { case (id, band, _) =>
        f match {
          case None => f = Some(id); None
          case Some(x) if id != x => Some(NearDupCandidate(id, x, band))
          case _ => None
        }
      }
      f.foreach(first.update) // refreshes the TTL on every active batch
      out.iterator
    }
  }

  /** TTL-BOUNDED streaming near-dup candidates — [[nearDupCandidates]]
    * with the production state bound made real: per-bucket state
    * expires after `ttl` of inactivity (RocksDB-backed processing-time
    * TTL), so state size is (buckets active within the horizon), not
    * unbounded history. Same hash chain and candidacy contract as the
    * batch band join; recall differs only across evicted horizons.
    * Requires the RocksDB state store provider. */
  def nearDupCandidatesTtl(docs: Dataset[DocText], ttl: java.time.Duration,
                           numBands: Int = 16, r: Int = 4): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    bandBucketRows(docs, numBands, r)
      .groupByKey { case (_, band, bucket) => (band, bucket) }
      .transformWithState(new BucketClaimProcessor(TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Append())(Encoders.product[NearDupCandidate])
  }

  /** Custom per-key streaming state via `flatMapGroupsWithState`
    * (SURVEY.md §2.10 — arbitrary stateful ops beyond windowed aggs):
    * emits an alert whenever an asset ticks above its running
    * all-time-high. State is one double per asset — bounded by the
    * key cardinality, the correct shape for arbitrary-state streaming
    * at scale (vs. holding history). Works on a streaming OR batch
    * Dataset (the spec cross-checks both paths).
    */
  def highWatermarkAlerts(ticks: Dataset[PriceTick]): Dataset[HighAlert] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.asset_id)
      .flatMapGroupsWithState[Double, HighAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (asset: String, rows: Iterator[PriceTick], state: GroupState[Double]) =>
          var high = state.getOption.getOrElse(Double.NegativeInfinity)
          val alerts = rows.toSeq.sortBy(_.ts.getTime).flatMap { t =>
            if (t.price > high) {
              val prev = high
              high = t.price
              Some(HighAlert(asset, t.ts, t.price, prev))
            } else None
          }
          state.update(high)
          alerts.iterator
      }
  }

  /** STREAM-STREAM interval join — the event-correlation shape
    * (impression→click attribution here; trade→quote, request→response
    * generally): two live streams joined on an equi key PLUS an
    * event-time containment bound. Each side carries its own
    * watermark, and the time-range predicate lets Spark bound BOTH
    * join-state buffers: an impression can be evicted once the click
    * watermark passes `imp_ts + horizon`, a click once the impression
    * watermark passes `click_ts` — state ∝ traffic × horizon, never
    * unbounded history. Without the range predicate a stream-stream
    * join must buffer forever; the bound is what makes the operator
    * deployable. Works identically on batch frames (watermarks are
    * no-ops there), which is how the spec cross-checks stream ==
    * batch.
    *
    * `joinType = "left_outer"` is the funnel form: an impression whose
    * attribution window closes with no click emits ONCE with null
    * click columns — the emission happens when the watermark evicts
    * the impression from join state, so unmatched rows appear one
    * micro-batch after their window closes, never earlier (the
    * correctness condition: a click may still arrive until then). */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
                      horizonMinutes: Int = 10,
                      watermark: String = "1 hour",
                      joinType: String = "inner"): DataFrame =
    impressions.withWatermark("imp_ts", watermark)
      .join(clicks.withWatermark("click_ts", watermark),
        col("ad_id") === col("click_ad_id") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr(s"interval $horizonMinutes minutes"),
        joinType)
      .select(col("imp_id"), col("click_id"), col("ad_id"),
        col("imp_ts"), col("click_ts"))

  /** The `transformWithState` processor behind [[sessionizeStream]] —
    * Spark 4's arbitrary-state API (SPARK-46815): explicit typed
    * state handles plus EVENT-TIME TIMERS, the piece
    * `flatMapGroupsWithState` lacks (its timeouts are per-function
    * and processing-time-ish; here the session CLOSES exactly when
    * the watermark proves no in-order event can extend it).
    *
    * State: one (startMs, lastMs, n) triple per open session per key.
    * On input: rows sorted by event time, folded with the gap rule —
    * a row within `gapMs` of the session end extends it, a later row
    * CLOSES it (emitted immediately) and opens the next; the one
    * registered timer is moved to the new `lastMs + gapMs`. On timer
    * expiry (watermark ≥ session end + gap): emit and clear. Rows
    * below the watermark never reach the processor (late-filtered by
    * the operator — pinned in StreamingSpec).
    *
    * CONTRACT: per-key arrival must be event-time monotone ACROSS
    * batches (in-batch disorder is sorted away); an out-of-order
    * cross-batch survivor within the watermark merges conservatively
    * (min start / max end) rather than re-splitting history.
    *
    * Scale posture: state is 3 longs per OPEN session per key —
    * bounded by live keys, not history; timers evict it the moment
    * the watermark closes the window. This is the deployable form of
    * q55's batch sessionize for continuous ingest. */
  private[streaming] class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("session",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
                                 tv: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[ClosedSession]
      var cur = if (st.exists()) Some(st.get()) else None
      // one live timer per key: drop the old one before re-registering
      cur.foreach { case (_, last, _) => getHandle.deleteTimer(last + gapMs) }
      sorted.foreach { e =>
        val ms = e.ts.getTime
        cur match {
          case Some((s0, l0, n0)) if ms - l0 <= gapMs =>
            cur = Some((math.min(s0, ms), math.max(l0, ms), n0 + 1))
          case Some((s0, l0, n0)) =>
            out ::= ClosedSession(key, new java.sql.Timestamp(s0),
              new java.sql.Timestamp(l0), n0)
            cur = Some((ms, ms, 1L))
          case None => cur = Some((ms, ms, 1L))
        }
      }
      cur.foreach { c => st.update(c); getHandle.registerTimer(c._2 + gapMs) }
      out.reverseIterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (st.exists()) {
        val (s0, l0, n0) = st.get()
        // guard against a stale timer racing a same-batch extension
        if (l0 + gapMs == info.getExpiryTimeInMs) {
          st.clear()
          return Iterator.single(ClosedSession(key, new java.sql.Timestamp(s0),
            new java.sql.Timestamp(l0), n0))
        }
      }
      Iterator.empty
    }
  }

  /** Streaming sessionization with event-time-timer closure — the
    * streaming form of `EventAnalytics.sessionize` (q55): sessions
    * split on inactivity gaps over `gapMs`, and each session is
    * emitted EXACTLY ONCE, either when a later same-key event closes
    * it or when the watermark passes its `end + gap` (the timer).
    * Requires the RocksDB state store provider (transformWithState's
    * backing store); see the q121 gate for the session-conf shape. */
  def sessionizeStream(events: Dataset[SessionEvent],
                       gapMs: Long = 30 * 60 * 1000L,
                       watermark: String = "24 hours"): Dataset[ClosedSession] =
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())(Encoders.product[ClosedSession])

  /** The `transformWithState` processor behind [[matchPattern]] —
    * ListState + one event-time timer per pending A. An arriving B
    * resolves EVERY pending A whose window covers it (an A stays
    * pending only until its first qualifying B, so "first B at or
    * after A within the horizon" is exactly what emits); a timer
    * firing at `a_ts + horizon` resolves the A as a timeout. Stale
    * timers (their A already matched) find no pending entry with that
    * expiry and no-op. Input rows are sorted (ts, A-before-B) so an
    * equal-timestamp A/B pair resolves deterministically as a match.
    *
    * Ordering soundness: a KEPT B implies `b_ts ≥ wm(batch)`, and a
    * qualifying B implies `b_ts ≤ a_ts + horizon`, so the A's timer
    * (`wm > a_ts + horizon`) can never have fired before a batch that
    * still delivers a qualifying B — match-vs-timeout is determined
    * by the data, not by intra-batch processing order.
    *
    * State: pending (a_id, a_ts) pairs per key — bounded by A-traffic
    * × horizon, evicted by match or timer, never history. */
  private[streaming] class PatternProcessor(horizonMs: Long)
      extends StatefulProcessor[Long, PatternEvent, PatternOutcome] {
    @transient private var pending: ListState[(Long, Long)] = _
    private def t(ms: Long) = new java.sql.Timestamp(ms)
    private val epoch = new java.sql.Timestamp(0L)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getListState[(Long, Long)]("pendingA",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[PatternEvent],
                                 tv: TimerValues): Iterator[PatternOutcome] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, if (e.etype == "B") 1 else 0))
      var buf = if (pending.exists()) pending.get().toVector else Vector.empty
      var out = List.empty[PatternOutcome]
      sorted.foreach { e =>
        val ms = e.ts.getTime
        if (e.etype == "A") {
          buf :+= ((e.event_id, ms))
          getHandle.registerTimer(ms + horizonMs)
        } else if (e.etype == "B") {
          val (hit, miss) = buf.partition(p => p._2 <= ms && ms <= p._2 + horizonMs)
          hit.foreach { case (id, aMs) => out ::= PatternOutcome(key, id, t(aMs), t(ms), true) }
          buf = miss
        }
      }
      if (buf.isEmpty) pending.clear() else pending.put(buf.toArray)
      out.reverseIterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[PatternOutcome] = {
      val buf = if (pending.exists()) pending.get().toVector else Vector.empty
      val (timedOut, keep) = buf.partition(_._2 + horizonMs == info.getExpiryTimeInMs)
      if (keep.isEmpty) pending.clear() else pending.put(keep.toArray)
      timedOut.iterator.map { case (id, aMs) =>
        PatternOutcome(key, id, t(aMs), epoch, false) }
    }
  }

  /** Streaming A→B pattern matching with timeout — the CEP-lite
    * funnel step ("purchase within an hour of login") as a single
    * stateful operator: every A event resolves exactly once, as a
    * MATCH carrying its first qualifying B's timestamp or as a
    * TIMEOUT once the watermark proves no qualifying B can arrive.
    * The batch q79 funnel answers this offline; this is the
    * continuous form. Requires the RocksDB state store (see q122). */
  def matchPattern(events: Dataset[PatternEvent],
                   horizonMs: Long = 60 * 60 * 1000L,
                   watermark: String = "24 hours"): Dataset[PatternOutcome] =
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new PatternProcessor(horizonMs),
        TimeMode.EventTime(), OutputMode.Append())(Encoders.product[PatternOutcome])

  /** foreachBatch sink: last-write-wins merge of each micro-batch into
    * a date-partitioned parquet table on (asset_id, ts) — U2 semantics
    * (`src/db.py:87-99`) with partition-pruned rewrites. */
  def candleMergeSink(path: String): (DataFrame, Long) => Unit = (batch, _) => {
    val withDay = batch.withColumn("day", date_trunc("day", col("ts")))
    MergeWriter.mergeIntoPartitioned(batch.sparkSession, path, withDay,
      keys = Seq("asset_id", "ts"), partitionCol = "day")
  }

  /** Property key [[manifestMergeSink]] records its micro-batch id
    * under. A DURABLE prop ([[graft.ops.ManifestTable.DurablePropKeys]]):
    * maintenance commits (foldMoR, plain merges) carry the marker
    * forward, so a fold between an erasure commit and a foreachBatch
    * replay can no longer erase the exactly-once watermark. */
  val StreamBatchIdProp: String = graft.ops.ManifestTable.StreamBatchIdProp

  /** EXACTLY-ONCE foreachBatch sink into a [[graft.ops.ManifestTable]]:
    * the micro-batch id commits ATOMICALLY with the data as a
    * manifest property (one rename carries both), so when failure
    * recovery RE-DELIVERS a batch — foreachBatch's documented
    * at-least-once contract — the sink sees `recorded id >= delivered
    * id` and skips, making the merge's side effects exactly-once per
    * batch id. This is the marker-table pattern (Delta's
    * `txnAppId`/`txnVersion`) built on the props primitive; without
    * it a replayed non-idempotent merge double-applies. The merge
    * itself is idempotent here (LWW upsert), so exactly-once is
    * belt-and-braces for THIS pipeline — the point is the sink shape,
    * proven by the q126 gate replaying a POISONED duplicate batch
    * that must leave no trace. */
  def manifestMergeSink(path: String, keys: Seq[String] = Seq("asset_id", "ts"))
      : (DataFrame, Long) => Unit = (batch, id) => {
    val spark = batch.sparkSession
    val recorded = graft.ops.ManifestTable.readProps(spark, path)
      .get(StreamBatchIdProp).map(_.toLong)
    if (!recorded.exists(_ >= id)) {
      val withDay = batch.withColumn("day", date_trunc("day", col("ts")))
      graft.ops.ManifestTable.merge(spark, path, withDay,
        keys = keys, partitionCol = "day",
        props = Map(StreamBatchIdProp -> id.toString))
    }
  }

  /** [[manifestMergeSink]] generalized to ANY row shape: the batch's
    * rows merge AS-IS (no derived day column) into a manifest table
    * keyed on `keys`, partitioned by an existing `partitionCol`, with
    * the batch-id marker committed atomically. The downstream half of
    * an incremental pipeline: a [[graft.ops.ManifestStreamProvider]]
    * read feeds this sink, and the pair moves ONLY new commits end to
    * end — the medallion hop (bronze→silver) with exactly-once on
    * both sides. */
  def manifestUpsertSink(path: String, keys: Seq[String], partitionCol: String,
                         retainVersions: Int = 2,
                         statsColumns: Seq[String] = Nil,
                         bloomColumns: Seq[String] = Nil): (DataFrame, Long) => Unit =
    (batch, id) => {
      val spark = batch.sparkSession
      val recorded = graft.ops.ManifestTable.readProps(spark, path)
        .get(StreamBatchIdProp).map(_.toLong)
      if (!recorded.exists(_ >= id))
        graft.ops.ManifestTable.merge(spark, path, batch,
          keys = keys, partitionCol = partitionCol,
          retainVersions = retainVersions,
          statsColumns = statsColumns, bloomColumns = bloomColumns,
          props = Map(StreamBatchIdProp -> id.toString))
    }

  /** EXACTLY-ONCE CDF REPLICATION SINK: applies micro-batches of a
    * `mode=cdf` [[graft.ops.ManifestStreamProvider]] read (rows
    * carrying `_change_type`/`_commit_version`) to a downstream
    * manifest table via [[graft.ops.ManifestTable.applyChanges]],
    * with the batch-id marker committed atomically. `update_preimage`
    * rows drop (the postimage carries the new payload); the
    * remaining types map onto the applyChangeFeed op domain with
    * `_commit_version` as the LWW version, so a single batch spanning
    * several upstream commits (the restart catch-up case) resolves
    * per key to the LAST commit's outcome — an update then delete of
    * the same key nets to the delete. This is how a downstream
    * replica of an UPDATING table stays exact without ever rescanning
    * it. */
  def cdfApplySink(path: String, keys: Seq[String], partitionCol: String,
                   retainVersions: Int = 2): (DataFrame, Long) => Unit =
    (batch, id) => {
      val spark = batch.sparkSession
      val recorded = graft.ops.ManifestTable.readProps(spark, path)
        .get(StreamBatchIdProp).map(_.toLong)
      if (!recorded.exists(_ >= id)) {
        val feed = batch.filter(col("_change_type") =!= "update_preimage")
          .withColumn("op", when(col("_change_type") === "insert", lit("insert"))
            .when(col("_change_type") === "update_postimage", lit("update"))
            .otherwise(lit("delete")))
          .withColumnRenamed("_commit_version", "version")
          .drop("_change_type")
        if (!feed.isEmpty)
          graft.ops.ManifestTable.applyChanges(spark, path, feed,
            keys = keys, partitionCol = partitionCol,
            retainVersions = retainVersions,
            props = Map(StreamBatchIdProp -> id.toString))
      }
    }

  /** STREAM-STATIC enrichment + watermarked daily rollup: each
    * micro-batch of the event stream inner-joins a STATIC dimension
    * frame — Spark's stream-static join is stateless (the dim is
    * re-resolved per batch and typically broadcast; no dim rows ever
    * enter the state store) — then feeds a watermarked tumbling-day
    * aggregate per dim attribute. The enrichment-then-rollup shape
    * every metrics pipeline starts from; rows later than the
    * watermark drop under the standard window-end rule (gated with
    * the q97 replay-and-recompute-the-cut pattern as q139). */
  def tierDailyRollup(ticks: DataFrame, dim: DataFrame, watermark: String): DataFrame =
    ticks.withWatermark("ts", watermark)
      .join(dim, Seq("user_id"))
      .groupBy(window(col("ts"), "1 day"), col("tier"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * lit(1e3)).cast("long")).as("sum_value_e3"))
      .select(col("window.start").as("day"), col("tier"), col("n"),
        col("sum_value_e3"))

  /** EXACTLY-ONCE STREAMING ERASURE: a foreachBatch sink applying
    * each micro-batch of subject keys (an erasure-request stream —
    * the operational shape of right-to-be-forgotten at scale: a
    * queue, not a cron) as a MERGE-ON-READ key delete —
    * [[graft.ops.ManifestTable.deleteByKeysMoR]]'s bloom-pruned,
    * zero-rewrite path — with the batch id committed ATOMICALLY with
    * the DV manifest rename (the [[manifestMergeSink]] marker
    * pattern). Re-delivery is load-bearing to skip here: a replayed
    * erasure batch would otherwise merge its positions into the DV a
    * second time — idempotent for the SAME positions, but a replay
    * AFTER a fold would re-delete rows a later batch resurrected, the
    * q132 CDC hazard. Each batch's key list is collected to the
    * driver — erasure requests are small by nature (the
    * deleteByKeysMoR contract). A batch matching NO live rows commits
    * nothing (and records no marker): replaying a no-op is a no-op. */
  def erasureSink(path: String, partitionCol: String, keyCol: String,
                  retainVersions: Int = 2): (DataFrame, Long) => Unit =
    (batch, id) => {
      val spark = batch.sparkSession
      val recorded = graft.ops.ManifestTable.readProps(spark, path)
        .get(StreamBatchIdProp).map(_.toLong)
      if (!recorded.exists(_ >= id)) {
        val keys = batch.select(org.apache.spark.sql.functions.col(keyCol)
          .cast("string")).distinct().collect().map(_.getString(0)).toSeq
        if (keys.nonEmpty)
          graft.ops.ManifestTable.deleteByKeysMoR(spark, path, partitionCol,
            keyCol, keys, retainVersions = retainVersions,
            extraProps = Map(StreamBatchIdProp -> id.toString))
      }
    }

  /** Exactly-once CDC ingestion: a foreachBatch sink applying a
    * row-level change stream (insert/update/delete + version columns)
    * to a manifest table through [[graft.ops.ManifestTable.applyChanges]],
    * with [[manifestMergeSink]]'s batch-id-as-table-property
    * de-duplication. Unlike the upsert sink — where re-delivery is
    * merely wasteful because LWW merges are idempotent — a re-applied
    * CDC batch is WRONG: replaying yesterday's deletes would kill rows
    * a later batch re-inserted. The skip is therefore load-bearing
    * here, and the q132 gate proves it by re-delivering a committed
    * batch after a subsequent resurrection. */
  def cdcApplySink(path: String, keys: Seq[String], partitionCol: String,
                   opCol: String = "op", versionCol: String = "version")
      : (DataFrame, Long) => Unit = (batch, id) => {
    val spark = batch.sparkSession
    val recorded = graft.ops.ManifestTable.readProps(spark, path)
      .get(StreamBatchIdProp).map(_.toLong)
    if (!recorded.exists(_ >= id))
      graft.ops.ManifestTable.applyChanges(spark, path, batch, keys, partitionCol,
        opCol, versionCol, props = Map(StreamBatchIdProp -> id.toString))
  }
}
