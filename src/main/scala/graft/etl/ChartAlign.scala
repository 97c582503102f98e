package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Alignment of the CoinGecko `market_chart` parallel arrays into
  * `prices` rows — the reference's J6/F6/F8/F15 group
  * (`src/etl.py:36-43`, `src/backfill.py:26-30`).
  *
  * The reference builds `{ms: value}` dicts for market_caps and
  * total_volumes and probes them per price point; the Spark-first
  * form explodes each array to (ts, value) rows and LEFT-joins on
  * (coin, ts) — left because a price ts may be missing from the other
  * two series and must survive with null mc/vol (`src/etl.py:43`,
  * SURVEY.md §7.6.8). At scale the join form beats a map lookup: it
  * shuffles each series once by (coin, ts) instead of building
  * per-row maps, and the two join inputs are co-partitioned after the
  * first exchange so the second join reuses the partitioning.
  */
object ChartAlign {

  /** Explode one `[[ms, v], …]` array column to (coin_id, ts, v) rows.
    * Epoch-ms → UTC timestamp truncated to whole seconds, exactly as
    * the reference does (`src/etl.py:42` zeroes sub-second via
    * `replace(microsecond=0)` after fromtimestamp(ms/1000)). */
  def explodeSeries(chart: DataFrame, arrayCol: String, valueName: String): DataFrame =
    chart
      .select(col("coin_id"), explode(col(arrayCol)).as("pair"))
      .select(
        col("coin_id"),
        timestamp_seconds(expr("CAST(pair[0] AS LONG) div 1000")).as("ts"),
        col("pair").getItem(1).as(valueName))

  /** Trim a series to points at-or-after `cutoffMs` — the reference's
    * client-side hourly-granularity trim (`src/coingecko.py:79-84`,
    * boundary point kept by `>=`). Applied pre-explode with a
    * higher-order filter so pruned pairs never become rows. */
  def trimWindow(chart: DataFrame, arrayCol: String, cutoffMs: Long): DataFrame =
    chart.withColumn(arrayCol,
      filter(col(arrayCol), pair => pair.getItem(0) >= lit(cutoffMs.toDouble)))

  /** Align the three parallel series into `prices`-shaped rows
    * (asset_id, ts, price, market_cap, volume, source, inserted_at).
    * `insertedAt` parameterizes the DB-default `now()` for
    * determinism (SURVEY.md §7.6.2).
    *
    * Plan shape: ONE exchange. The three arrays arrive colocated in a
    * single row per coin, so the earlier 3-explode + 2-left-join form
    * re-shuffled data that was never apart (3 exchanges); here each
    * element is tagged with its series, exploded once (map-side), and
    * pivoted back by a single (coin, ts) hash aggregate. A row is
    * emitted iff the ts has a PRICE entry (the reference iterates the
    * prices list and probes the other two, `src/etl.py:40-43`), with
    * null mc/vol where those series lack the ts.
    *
    * Contract (shared with the join form it replaces): (coin, second)
    * is unique within each series — the payload carries whole-second
    * timestamps, so callers reduce sub-second collisions first. On a
    * violating input the join form fanned out duplicate rows; this
    * form collapses to the max value per second — both are outside
    * the contract, this one at least keeps the (asset_id, ts) PK the
    * downstream upsert requires. */
  def align(chart: DataFrame, insertedAt: Column): DataFrame = {
    def tag(arrayCol: String, s: Int): Column =
      transform(col(arrayCol), pair =>
        struct(pair.getItem(0).as("ms"), pair.getItem(1).as("v"), lit(s).as("s")))
    chart
      .select(col("coin_id"), explode(concat(
        tag("prices", 0), tag("market_caps", 1), tag("total_volumes", 2))).as("e"))
      .groupBy(col("coin_id"),
        timestamp_seconds(expr("CAST(e.ms AS LONG) div 1000")).as("ts"))
      .agg(
        // existence, not value: a null price ENTRY must still emit its
        // row (the join form kept it), only a missing one drops it
        count(when(col("e.s") === 0, lit(1))).as("__has_price"),
        max(when(col("e.s") === 0, col("e.v"))).as("price"),
        max(when(col("e.s") === 1, col("e.v"))).as("market_cap"),
        max(when(col("e.s") === 2, col("e.v"))).as("volume"))
      .filter(col("__has_price") > 0)
      .select(
        col("coin_id").as("asset_id"),
        col("ts"),
        col("price").cast(DecimalType(20, 8)).as("price"),
        col("market_cap").cast(DecimalType(30, 2)).as("market_cap"),
        col("volume").cast(DecimalType(30, 2)).as("volume"),
        lit("coingecko").as("source"),
        insertedAt.as("inserted_at"))
  }
}
