package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas mirroring the reference's DDL (`sql/schema.sql`)
  * and API payload shapes (`src/coingecko.py`), per SURVEY.md §1.2.
  * Fixed declared schemas — no inference — so plans are stable and
  * scans prune columns.
  */
object Schemas {

  /** `assets` (`sql/schema.sql:4-9`). */
  val assets: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("first_seen_at", TimestampType, nullable = true)))

  /** `prices` (`sql/schema.sql:13-22`), PK (asset_id, ts). */
  val prices: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("price", DecimalType(20, 8), nullable = false),
    StructField("market_cap", DecimalType(30, 2), nullable = true),
    StructField("volume", DecimalType(30, 2), nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("inserted_at", TimestampType, nullable = true)))

  /** `daily_metrics` (`sql/schema.sql:25-36`), PK (asset_id, date). */
  val dailyMetrics: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("open", DecimalType(20, 8), nullable = true),
    StructField("high", DecimalType(20, 8), nullable = true),
    StructField("low", DecimalType(20, 8), nullable = true),
    StructField("close", DecimalType(20, 8), nullable = true),
    StructField("volume", DecimalType(30, 2), nullable = true),
    StructField("market_cap", DecimalType(30, 2), nullable = true),
    StructField("inserted_at", TimestampType, nullable = true)))

  /** CoinGecko `market_chart` payload (`src/etl.py:36`): three parallel
    * `[[epoch_ms, value], …]` arrays, possibly misaligned. One row per
    * (coin, payload). */
  val marketChart: StructType = StructType(Seq(
    StructField("coin_id", StringType, nullable = false),
    StructField("prices", ArrayType(ArrayType(DoubleType)), nullable = true),
    StructField("market_caps", ArrayType(ArrayType(DoubleType)), nullable = true),
    StructField("total_volumes", ArrayType(ArrayType(DoubleType)), nullable = true)))

  /** CoinGecko `get_coins_markets` consumed fields (`src/etl.py:27-28`);
    * extra response fields are fetched-but-ignored by the reference. */
  val coinsMarkets: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("symbol", StringType, nullable = true),
    StructField("name", StringType, nullable = true)))
}
