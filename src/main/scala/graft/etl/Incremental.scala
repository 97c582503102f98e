package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{ManifestTable, Merge, Ops}

/** The reference's write path (`src/etl.py` / `src/backfill.py`),
  * re-expressed as one DataFrame DAG per run (SURVEY.md §3.1):
  *
  *   markets → assets-upsert;  chart → align → prices-upsert;
  *   aligned → OHLC fold → daily-upsert.
  *
  * All three merges follow the reference's PK last-write-wins contract
  * (`src/db.py:73-117`); runs are idempotent under re-execution with
  * overlapping windows (the reference's overlap-and-upsert
  * incrementality, §2.10).
  *
  * `runTs` parameterizes the wall clock. The "daily" row is stamped
  * with the Asia/Kolkata calendar date of the run — reproduced
  * exactly from `src/etl.py:15,47` (SURVEY.md §7.6.1); pass
  * `istDate = false` to use the candle-derived UTC date instead (the
  * documented deviation mode).
  */
object Incremental {

  /** OHLC + last-seen market_cap/volume fold over one run's aligned
    * candle rows (`src/etl.py:40-54`): open/close by ts order,
    * high/low extrema, mc/vol from the latest point that has one
    * (`max(mc_map.keys())` ≈ max_by with null-skip). The whole fold is
    * one hash aggregate with map-side combine.
    */
  def dailyFold(aligned: DataFrame, dateCol: Column, insertedAt: Column): DataFrame =
    aligned
      .groupBy(col("asset_id"))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        max_by(col("volume"), when(col("volume").isNotNull, col("ts"))).as("volume"),
        max_by(col("market_cap"), when(col("market_cap").isNotNull, col("ts"))).as("market_cap"))
      .select(
        col("asset_id"), dateCol.as("date"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("market_cap"),
        insertedAt.as("inserted_at"))

  /** IST run-date (`src/etl.py:15,47`): the Asia/Kolkata calendar date
    * at run time — NOT the candle's own date. */
  def istRunDate(runTs: Column): Column =
    to_date(from_utc_timestamp(runTs, "Asia/Kolkata"))

  /** One incremental run (`python -m src.etl` equivalent).
    *
    * @param markets  coins_markets payload (id, symbol, name)
    * @param chart    market_chart payloads (coin_id + 3 parallel arrays)
    * @param assets   existing assets table (may be empty)
    * @param prices   existing prices table (may be empty)
    * @param daily    existing daily_metrics table (may be empty)
    * @param runTs    the run's wall-clock instant (replaces now())
    * @return (assets', prices', daily_metrics') merged states
    */
  def run(markets: DataFrame, chart: DataFrame,
          assets: DataFrame, prices: DataFrame, daily: DataFrame,
          runTs: Timestamp, istDate: Boolean = true): (DataFrame, DataFrame, DataFrame) = {
    val (incomingAssets, aligned, incomingDaily) =
      incomingFrames(markets, chart, lit(runTs), istDate)

    // U1: assets upsert — symbol/name update, first_seen_at preserved
    // from the first insert (src/db.py:77-81; default now(), schema.sql:8).
    val assetsMerged = Merge.upsert(assets, incomingAssets,
      Seq("asset_id"), preserveExisting = Seq("first_seen_at"))

    // U2: prices upsert on (asset_id, ts).
    val pricesMerged = Merge.upsert(prices, aligned, Seq("asset_id", "ts"))

    // U3: daily_metrics upsert on (asset_id, date).
    val dailyMerged = Merge.upsert(daily, incomingDaily, Seq("asset_id", "date"))

    (assetsMerged, pricesMerged, dailyMerged)
  }

  /** The three incoming frames of one run — ONE derivation shared by
    * the in-memory sink ([[run]]) and the durable manifest sink
    * ([[runOnManifest]]), so the two write paths can never drift
    * semantically.
    *
    * @return (incomingAssets U1, aligned candle rows U2, incomingDaily U3)
    */
  private def incomingFrames(markets: DataFrame, chart: DataFrame,
                             runTsCol: Column, istDate: Boolean)
      : (DataFrame, DataFrame, DataFrame) = {
    val incomingAssets = markets.select(
      col("id").as("asset_id"), col("symbol"), col("name"),
      runTsCol.as("first_seen_at"))

    // J6/F6: align the three parallel series into candle rows.
    val aligned = ChartAlign.align(chart, insertedAt = runTsCol)

    // A2/F7: daily OHLC stamped with the configured run-date semantics
    // (IST run-date for exact parity; candle-derived UTC date as the
    // documented deviation mode).
    val incomingDaily =
      if (istDate) dailyFold(aligned, istRunDate(runTsCol), runTsCol)
      else aligned.groupBy(col("asset_id"), to_date(col("ts")).as("date"))
        .agg(
          min_by(col("price"), col("ts")).as("open"),
          max(col("price")).as("high"),
          min(col("price")).as("low"),
          max_by(col("price"), col("ts")).as("close"),
          max_by(col("volume"), when(col("volume").isNotNull, col("ts"))).as("volume"),
          max_by(col("market_cap"), when(col("market_cap").isNotNull, col("ts"))).as("market_cap"))
        .withColumn("inserted_at", runTsCol)
        .select("asset_id", "date", "open", "high", "low", "close",
          "volume", "market_cap", "inserted_at")

    (incomingAssets, aligned, incomingDaily)
  }

  /** Partition column the manifest sink derives for each table and
    * strips again on read. Derivations are functions of each table's
    * KEY — asset_id hash bucket for `assets`, the day of `ts` for
    * `prices`, the day of `date` for `daily_metrics` — so
    * [[ManifestTable]]'s stable-partition-per-key contract holds by
    * construction, never by caller discipline. */
  val SinkPartCol = "__part"

  /** One incremental run committed DURABLY: the same three upserts as
    * [[run]], landed on three [[ManifestTable]]s under `base/` —
    * `assets`, `prices`, `daily_metrics` — each commit ONE manifest
    * rename, wholly-old-or-wholly-new for any concurrent reader. This
    * is the reference pipeline (`src/etl.py:57-59`) on the durable
    * sink: a crash mid-run leaves every table readable at its previous
    * snapshot, and re-running the same payload is idempotent
    * (merge(merge(s,b),b) == merge(s,b), the U1-U3 contract).
    *
    * Scale posture: only the partitions a batch touches are read and
    * rewritten (ManifestTable prunes by partition value), so a daily
    * refetch rewrites the trailing date dirs of `prices`, never
    * history; `assets` is bucketed by key hash so a 10-coin or a
    * 100 k-asset dim both land bounded directories. */
  /** Declared partition windows for [[runOnManifest]]'s three sinks —
    * the replaceWhere-style fast path ([[ManifestTable.TableMerge]]
    * `knownTouched`): a scheduled ingest knows its date window and
    * bucket set up front, so the per-run partition-discovery job is
    * pure overhead. Wrong declarations fail loudly before any commit
    * (the written-vs-declared cross-check), never mis-merge. */
  final case class KnownParts(assets: Set[String], prices: Set[String],
                              daily: Set[String])

  /** All `assetBuckets` hash-bucket partition values — the safe
    * `KnownParts.assets` declaration (declaring a bucket with no
    * incoming rows only rewrites it; missing one would fail the
    * commit check, so over-declaring the full set is the right
    * default for a dim of any size). */
  def allAssetBuckets(assetBuckets: Int = 16): Set[String] =
    (0 until assetBuckets).map(_.toString).toSet

  /** The `KnownParts.daily` value for a run: the run-date partition
    * (IST calendar date by default, matching [[istRunDate]]). */
  def dailyPartOf(runTs: Timestamp, istDate: Boolean = true): Set[String] =
    if (istDate)
      Set(runTs.toInstant.atZone(java.time.ZoneId.of("Asia/Kolkata")).toLocalDate.toString)
    else sys.error("dailyPartOf: candle-derived dates vary per row; " +
      "derive KnownParts.daily from the data or omit knownParts")

  def runOnManifest(spark: SparkSession, markets: DataFrame, chart: DataFrame,
                    base: String, runTs: Timestamp, istDate: Boolean = true,
                    assetBuckets: Int = 16,
                    knownParts: Option[KnownParts] = None,
                    shareIntermediates: Boolean = false): Unit = {
    val (rawAssets, rawAligned, rawDaily) =
      incomingFrames(markets, chart, lit(runTs), istDate)
    // Each merge evaluates its incoming frame several times (the
    // touched-partition distinct, the batch write, the upsert), and
    // `aligned` additionally feeds the daily fold — materialize the
    // three frames once per run instead of re-running the
    // explode-heavy alignment per action. Persisted LOCALLY and
    // released in `finally` by DEFAULT (not `Intermediates.shared`):
    // this is a write-path API whose callers — specs, long-lived
    // ingest services — are not the Bench/Verify harness and never
    // sweep, so registry-pinned storage would accumulate per run for
    // the session's lifetime. `shareIntermediates = true` opts into
    // the plan-identity registry instead, for harness callers that DO
    // sweep: an idempotent re-run of the same payload (same chart
    // frame, same runTs) then reuses the first run's materialized
    // alignment/fold instead of recomputing them.
    val frames =
      if (shareIntermediates)
        Seq(graft.ops.Intermediates.shared(rawAssets),
          graft.ops.Intermediates.shared(rawAligned),
          graft.ops.Intermediates.shared(rawDaily))
      else Seq(rawAssets, rawAligned, rawDaily)
    val Seq(incomingAssets, aligned, incomingDaily) = frames
    if (!shareIntermediates)
      frames.foreach(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // ONE mergeMany run: one touched-partition job + one write job
    // cover all three tables (vs 2 jobs per table with single-table
    // merges) — the per-run fixed overhead is the dominant cost of a
    // small incremental batch, so the N-table coalescing is the
    // scale lever for frequent commits. Commits stay per-table
    // manifest renames; each table is atomically old-or-new.
    try ManifestTable.mergeMany(spark, base, Seq(
      ManifestTable.TableMerge("assets",
        incomingAssets.withColumn(SinkPartCol,
          pmod(xxhash64(col("asset_id")), lit(assetBuckets.toLong)).cast("string")),
        keys = Seq("asset_id"), partitionCol = SinkPartCol,
        preserveExisting = Seq("first_seen_at"),
        knownTouched = knownParts.map(_.assets)),
      ManifestTable.TableMerge("prices",
        aligned.withColumn(SinkPartCol, date_format(col("ts"), "yyyy-MM-dd")),
        keys = Seq("asset_id", "ts"), partitionCol = SinkPartCol,
        knownTouched = knownParts.map(_.prices)),
      ManifestTable.TableMerge("daily_metrics",
        incomingDaily.withColumn(SinkPartCol, date_format(col("date"), "yyyy-MM-dd")),
        keys = Seq("asset_id", "date"), partitionCol = SinkPartCol,
        knownTouched = knownParts.map(_.daily))))
    finally if (!shareIntermediates) frames.foreach(_.unpersist(blocking = false))
  }

  /** Manifest-sink readers — resolve the latest snapshot and strip the
    * derived partition column, so callers see exactly the [[run]]
    * schemas. */
  def readAssets(spark: SparkSession, base: String): DataFrame =
    ManifestTable.read(spark, s"$base/assets").drop(SinkPartCol)
  def readPrices(spark: SparkSession, base: String): DataFrame =
    ManifestTable.read(spark, s"$base/prices").drop(SinkPartCol)
  def readDaily(spark: SparkSession, base: String): DataFrame =
    ManifestTable.read(spark, s"$base/daily_metrics").drop(SinkPartCol)

  /** Backfill (`src/backfill.py`): bulk-hydrate `prices` only — same
    * align + upsert, no daily fold (§3.3). Trivially parallel over
    * (coin, window): the chart DataFrame may hold any number of
    * payload rows. */
  def backfill(chart: DataFrame, prices: DataFrame, runTs: Timestamp): DataFrame = {
    val aligned = ChartAlign.align(chart, insertedAt = lit(runTs))
    Merge.upsert(prices, aligned, Seq("asset_id", "ts"))
  }
}
