package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Ops

/** The reference's entire query surface: the four analytical views of
  * `sql/views.sql:2-42`, as DataFrame functions.
  *
  * Deviations from the SQL text, by design (SURVEY.md §7.6):
  *   - `now()` is an explicit `asOf` parameter (tests pass a fixed
  *     instant, production passes `current_timestamp()`);
  *   - greatest-per-group and as-of are window/aggregate forms, not
  *     the reference's self-joins — one shuffle instead of two
  *     (`views.sql:4-6,12-21`);
  *   - the ~10-row `assets` dimension is always broadcast.
  *
  * `prices` ties on (asset_id, ts) cannot occur (PK in the reference,
  * merge key here), so no tie-breaker is needed beyond ts.
  */
object CryptoViews {

  /** `v_latest_prices` (`views.sql:2-8`): latest price row per asset
    * + dimension attributes, ordered by market cap desc nulls last. */
  def vLatestPrices(prices: DataFrame, assets: DataFrame): DataFrame =
    Ops.latestPerKey(prices, Seq("asset_id"), Seq(col("ts")))
      .join(broadcast(assets), Seq("asset_id"))
      .select(col("asset_id"), col("symbol"), col("name"),
        col("price"), col("market_cap"), col("volume"), col("ts"))
      .orderBy(col("market_cap").desc_nulls_last, col("asset_id"))

  /** `v_price_change_24h` (`views.sql:10-28`): latest price vs price
    * as of `asOf - 24h`, pct change rounded to 4, left join keeps
    * assets lacking a 24h-old point (J4). Emits the reference's exact
    * columns (`price AS price_now`, `views.sql:22`) and order —
    * `l.market_cap desc nulls last` (`views.sql:28`); market_cap is
    * carried for the sort but not projected, like the SQL. */
  def vPriceChange24h(prices: DataFrame, assets: DataFrame, asOf: Column): DataFrame = {
    val latest = Ops.latestPerKey(prices, Seq("asset_id"), Seq(col("ts")))
      .select(col("asset_id"), col("price"), col("market_cap"))
    val p24 = Ops.asOfAtOrBefore(prices, Seq("asset_id"), col("ts"),
        asOf - expr("INTERVAL 24 HOURS"))
      .select(col("asset_id"), col("price").as("price_24h"))
    latest
      .join(p24, Seq("asset_id"), "left")
      .join(broadcast(assets.select("asset_id", "symbol", "name")), Seq("asset_id"))
      .select(
        col("asset_id"), col("symbol"), col("name"),
        col("price").as("price_now"), col("price_24h"),
        when(col("price_24h").isNotNull,
          round((col("price") - col("price_24h")) / col("price_24h") * lit(100.0), 4))
          .otherwise(lit(null)).as("pct_change_24h"),
        col("market_cap"))
      .orderBy(col("market_cap").desc_nulls_last, col("asset_id"))
      .drop("market_cap")
  }

  /** `v_daily_ohlc` (`views.sql:30-35`): daily metrics + dim join
    * (incl. `a.name`, `views.sql:32`), ordered (asset_id, date desc). */
  def vDailyOhlc(dailyMetrics: DataFrame, assets: DataFrame): DataFrame =
    dailyMetrics
      .join(broadcast(assets.select("asset_id", "symbol", "name")), Seq("asset_id"))
      .select(col("asset_id"), col("symbol"), col("name"), col("date"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("market_cap"))
      .orderBy(col("asset_id"), col("date").desc)

  /** `v_sparkline_7d` (`views.sql:37-42`): trailing-7-day price series
    * per asset (incl. `a.name`, `views.sql:38`), ordered (asset_id, ts). */
  def vSparkline7d(prices: DataFrame, assets: DataFrame, asOf: Column): DataFrame =
    prices
      .filter(col("ts") >= asOf - expr("INTERVAL 7 DAYS"))
      .join(broadcast(assets.select("asset_id", "symbol", "name")), Seq("asset_id"))
      .select(col("asset_id"), col("symbol"), col("name"), col("ts"), col("price"))
      .orderBy(col("asset_id"), col("ts"))

  /** The dashboard's combined overview (`app.py:94-156`, J5/F11/P5/
    * A3-A5 collapsed into one plan, SURVEY.md §3.2): latest prices
    * merged with 24h change, display price coalesced (F11), optional
    * case-insensitive search (P5). One DataFrame instead of the
    * reference's client-side pandas recompute.
    */
  def overview(prices: DataFrame, assets: DataFrame, asOf: Column,
               search: Option[String] = None): DataFrame = {
    val latest = vLatestPrices(prices, assets)
    val change = vPriceChange24h(prices, assets, asOf)
      .select(col("asset_id"), col("price_now"),
        col("price_24h"), col("pct_change_24h"))
    // one row per asset on both sides — broadcast the change side so
    // the merge is a map-side hash join, not a sort-merge exchange
    val joined = latest.join(broadcast(change), Seq("asset_id"), "left")
      .withColumn("display_price", coalesce(col("price_now"), col("price")))
    val searched = search.fold(joined) { q =>
      val needle = q.toLowerCase
      joined.filter(
        lower(col("name")).contains(needle) || lower(col("symbol")).contains(needle))
    }
    searched
      .select(col("asset_id"), col("symbol"), col("name"), col("display_price"),
        col("market_cap"), col("volume"), col("pct_change_24h"), col("ts"))
      .orderBy(col("market_cap").desc_nulls_last, col("asset_id"))
  }

  /** Register the reference's entire SQL-visible surface as Spark
    * temp views under the reference's own names — the three base
    * tables (`sql/schema.sql`) and the four analytical views
    * (`sql/views.sql:2-42`) — so a consumer who today reads
    * `v_latest_prices` through PostgREST can `spark.sql` the
    * identical names unchanged.
    *
    * Temp views are lazy plans: each query re-evaluates against the
    * CURRENT content of the passed frames, but `asOf` is frozen at
    * registration (the views are deterministic by design — SURVEY
    * §7.6 #2); re-register per batch/request to advance the clock,
    * mirroring the reference's one-cron-tick-per-day cadence. */
  def registerSql(prices: DataFrame, assets: DataFrame, dailyMetrics: DataFrame,
                  asOf: Column): Unit = {
    prices.createOrReplaceTempView("prices")
    assets.createOrReplaceTempView("assets")
    dailyMetrics.createOrReplaceTempView("daily_metrics")
    vLatestPrices(prices, assets).createOrReplaceTempView("v_latest_prices")
    vPriceChange24h(prices, assets, asOf).createOrReplaceTempView("v_price_change_24h")
    vDailyOhlc(dailyMetrics, assets).createOrReplaceTempView("v_daily_ohlc")
    vSparkline7d(prices, assets, asOf).createOrReplaceTempView("v_sparkline_7d")
  }

  /** Dashboard KPI row (`app.py:119-127`, A3-A5): one tiny aggregate. */
  def kpis(overviewDf: DataFrame): DataFrame =
    overviewDf.agg(
      count(lit(1)).as("n_assets"),
      max(col("market_cap")).as("top_market_cap"),
      avg(col("pct_change_24h")).as("avg_pct_change_24h"))
}
