package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.MergeWriter

/** Input tick for the stateful alert stream. */
case class PriceTick(asset_id: String, ts: java.sql.Timestamp, price: Double)

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

  /** foreachBatch sink: last-write-wins merge of each micro-batch into
    * a date-partitioned parquet table on (asset_id, ts) — U2 semantics
    * (`src/db.py:87-99`) with partition-pruned rewrites. */
  def candleMergeSink(path: String): (DataFrame, Long) => Unit = (batch, _) => {
    val withDay = batch.withColumn("day", date_trunc("day", col("ts")))
    MergeWriter.mergeIntoPartitioned(batch.sparkSession, path, withDay,
      keys = Seq("asset_id", "ts"), partitionCol = "day")
  }
}
