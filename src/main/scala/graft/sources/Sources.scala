package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.model.Schemas

/** Source adapters for the reference's two REST payloads (SURVEY.md
  * §2.1 S2/S3). The reference fetches these over HTTPS with
  * retry/backoff (`src/coingecko.py:36-90`); here each payload has a
  * fixture-file reader (explicit payload schema, no inference) and a
  * live-HTTP path with the same status semantics: per-partition DSv2
  * fetch for the per-coin `market_chart` series
  * ([[graft.sources.v2.ChartDataSource]]) and a driver-side fetch for
  * the bounded `coins_markets` metadata dim ([[Sources.coinsMarketsLive]]).
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

  /** Live `get_coins_markets` fetch (S2) with the reference's HTTP
    * semantics (`src/coingecko.py:36-62`): 429/5xx/transport are
    * retried under [[Retry.withBackoff]], other 4xx fail hard. The
    * payload is one JSON ARRAY of coin objects; only the consumed
    * fields are kept, extras ignored like the fixture reader.
    *
    * Driver-side BY DESIGN (scale posture): the markets payload is a
    * bounded dimension — one page of coin metadata per run — that
    * every downstream plan consumes broadcast. One driver GET + a
    * local DataFrame is the right shape; partition-parallel fetch is
    * for the per-(coin, window) series, which is what the DSv2 chart
    * reader does. */
  def coinsMarketsLive(spark: SparkSession, url: String,
                       retryBaseDelayMs: Long = 1000L): DataFrame = {
    val body = Retry.withBackoff(baseDelayMs = retryBaseDelayMs) { () => Http.getBody(url) }
    val node = new ObjectMapper().readTree(body)
    require(node.isArray, s"coins_markets payload is not a JSON array: ${body.take(80)}")
    val rows: java.util.List[Row] = node.elements().asScala.map { o =>
      def str(f: String) =
        Option(o.get(f)).filterNot(_.isNull).map(_.asText()).orNull
      val id = str("id")
      // `id` is declared non-nullable in the schema; a null here would
      // silently violate it (codegen trusts declared nullability) —
      // fail fast with a payload-shaped error instead.
      require(id != null, s"coins_markets element missing 'id': ${o.toString.take(120)}")
      Row(id, str("symbol"), str("name"))
    }.toList.asJava
    spark.createDataFrame(rows, Schemas.coinsMarkets)
  }
}

/** One HTTP GET with the reference's status→error mapping
  * (`src/coingecko.py:13-34`): 429 and 5xx and transport failures
  * become [[Retry.TransientError]] (retryable); any other 4xx is a
  * hard IOException (no retry). Shared by the executor-side DSv2
  * chart reader and the driver-side markets fetch so both live paths
  * have identical semantics (and one loopback-HTTP spec pattern
  * covers both). */
object Http {
  def getBody(url: String,
              connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 30000): String = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestProperty("Accept", "application/json")
    try {
      val code =
        try conn.getResponseCode
        catch { case e: java.io.IOException =>
          throw new Retry.TransientError(s"transport failure fetching $url", e)
        }
      if (code == 429 || code >= 500)
        throw new Retry.TransientError(s"HTTP $code from $url")
      if (code >= 400)
        throw new java.io.IOException(s"HTTP $code from $url") // hard: no retry
      // Body-read failures are transport failures too (connection reset
      // mid-stream) — retryable, same as a failed connect.
      try {
        val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
        try src.mkString
        finally src.close()
      } catch { case e: java.io.IOException =>
        throw new Retry.TransientError(s"transport failure reading $url", e)
      }
    } finally conn.disconnect()
  }
}
