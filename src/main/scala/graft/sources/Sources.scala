package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Schemas

/** Fixture-backed source adapters for the reference's two REST payloads
  * (SURVEY.md §2.1 S2/S3). The reference fetches these over HTTPS with
  * retry/backoff (`src/coingecko.py:36-90`); that is connector
  * plumbing, not query semantics — here the payloads are JSON files
  * read with the explicit payload schema (no inference), which is also
  * the shape a DataSource-V2 live reader would produce.
  */
object Sources {

  /** `get_coin_market_chart_by_id` payloads: one JSON object per line
    * with coin_id + the three parallel arrays (`src/etl.py:36`). */
  def marketChart(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.marketChart).json(path)

  /** `get_coins_markets` payload: array of coin metadata objects; only
    * (id, symbol, name) are consumed (`src/etl.py:27-28`) — extra
    * fields in the fixture are ignored by the explicit schema, proving
    * the fetched-but-unused fields stay unused. */
  def coinsMarkets(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.coinsMarkets).json(path)
}
