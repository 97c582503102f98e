package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  def nearDupCandidates(docs: Dataset[DocText],
                        numBands: Int = 16, r: Int = 4): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    import graft.ext.Dedup
    // Band/bucket construction and per-seed permutation hash are the
    // SHARED Dedup helpers — one definition for batch and stream, so
    // candidacy cannot drift (also spec-compared on the same corpus).
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

  /** foreachBatch sink: last-write-wins merge of each micro-batch into
    * a date-partitioned parquet table on (asset_id, ts) — U2 semantics
    * (`src/db.py:87-99`) with partition-pruned rewrites. */
  def candleMergeSink(path: String): (DataFrame, Long) => Unit = (batch, _) => {
    val withDay = batch.withColumn("day", date_trunc("day", col("ts")))
    MergeWriter.mergeIntoPartitioned(batch.sparkSession, path, withDay,
      keys = Seq("asset_id", "ts"), partitionCol = "day")
  }
}
