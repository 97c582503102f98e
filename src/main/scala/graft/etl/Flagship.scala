package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.views.CryptoViews

/** Flagship end-to-end demo (driver smoke gate): the complete
  * reference write path + read path in one plan, driven by testdata.
  *
  * The events table is reshaped into the reference's ingest payloads —
  * each event_type becomes a "coin" whose market_chart arrays are the
  * events' (ms, value) pairs (the same parallel-array shape as
  * `src/etl.py:36`) — then the full pipeline runs: align (J6) →
  * assets/prices/daily upserts (U1-U3) → combined dashboard overview
  * (J1-J5, A3-A5, F11). */
object Flagship {

  /** Max events per "coin" in the reshaped chart payload — mirrors the
    * reference's bounded fetch window (≤ ~2,160 points/coin/call,
    * `src/backfill.py:20`). */
  val ChartCap = 2160

  def run(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val runTs = Timestamp.valueOf("2024-02-01 01:10:00")

    val markets = ev.select(col("event_type")).distinct()
      .select(col("event_type").as("id"),
        upper(col("event_type")).as("symbol"),
        initcap(col("event_type")).as("name"))

    // market_chart payloads: one row per coin, three parallel
    // [[ms, value], …] arrays (sorted by ms, like the API emits).
    // The per-key history is capped to the latest ChartCap events
    // BEFORE collecting (round-1 verdict #4: an unbounded per-key
    // collect_list OOMs a hot key at scale — the reference's real
    // payload is a bounded API window, so the cap is faithful too).
    val recent = ev
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("__rn") <= ChartCap)
      .drop("__rn")
    val pair = array(unix_millis(col("ts")).cast("double"), col("value"))
    val chart = recent
      .groupBy(col("event_type").as("coin_id"))
      .agg(
        sort_array(collect_list(pair)).as("prices"),
        sort_array(collect_list(array(unix_millis(col("ts")).cast("double"),
          col("value") * lit(1000.0)))).as("market_caps"),
        sort_array(collect_list(array(unix_millis(col("ts")).cast("double"),
          col("value") * lit(10.0)))).as("total_volumes"))

    val empty = (s: org.apache.spark.sql.types.StructType) =>
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    val (assets, prices, _) = Incremental.run(markets, chart,
      empty(graft.model.Schemas.assets), empty(graft.model.Schemas.prices),
      empty(graft.model.Schemas.dailyMetrics), runTs)

    CryptoViews.overview(prices, assets, asOf = lit(runTs))
  }
}
