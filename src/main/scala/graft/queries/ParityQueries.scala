package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ops.{Merge, Ops}

/** Reference-parity query surface (SURVEY.md §2) re-expressed over the
  * driver testdata tables so both Spark and the DuckDB oracle run the
  * same semantics. Each query cites the reference operator(s) it
  * reproduces.
  *
  * Hash-stability conventions (every query in SparkEntry follows them):
  *   - monetary/measure doubles are cast to DECIMAL(18,2) before
  *     aggregation — exact, order-independent arithmetic that matches
  *     DuckDB bit-for-bit; final numeric outputs are cast back to
  *     DOUBLE so both engines emit the same physical type;
  *   - averages are computed as CAST(SUM(dec) AS DOUBLE)/COUNT so the
  *     division happens once, in IEEE-754 double, identically in both
  *     engines (DuckDB's AVG over DECIMAL takes a different path);
  *   - every query ends in a deterministic total ORDER BY (Catalyst's
  *     EliminateSorts removes it under count-only actions, so this is
  *     free in the benchmark path).
  */
object ParityQueries {

  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Fixed as-of anchor (SURVEY.md §7.6.2: views parameterize `now()`
    * for determinism); mid-range of the events table at every SF. */
  val AsOfCutoff = "2024-01-15 00:00:00"

  // ----------------------------------------------------------------
  // q1_agg — pricing summary (A1/A3-A5, F1-F3): single hash aggregate
  // with map-side partial aggregation; all arithmetic decimal-exact.
  // Mirrors the reference's KPI aggregates (app.py:119-127) and view
  // arithmetic (views.sql:24).
  // ----------------------------------------------------------------
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        max(dec(col("l_extendedprice"))).cast("double").as("max_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ----------------------------------------------------------------
  // q2_latest_per_key — v_latest_prices shape (J1 greatest-per-group,
  // views.sql:4-6 + J2 dim join, views.sql:7): latest event per user,
  // joined to the customer dimension. Window form (one shuffle)
  // instead of the reference's self-join (two shuffles); the dim side
  // is broadcast.
  // ----------------------------------------------------------------
  def q2LatestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    val latest = Ops.latestPerKey(ev, Seq("user_id"), Seq(col("ts"), col("event_id")))
    latest
      .join(broadcast(cust), latest("user_id") === cust("c_custkey"))
      .select(col("user_id"), col("c_name"), col("ts"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  val q2LatestPerKeySql: String =
    """SELECT user_id, c_name, ts, event_type, value
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) e
      |JOIN customer c ON c.c_custkey = e.user_id
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // ----------------------------------------------------------------
  // q3_asof_change — v_price_change_24h (J3 as-of join, views.sql:12-21;
  // J4 left join, views.sql:27; F1-F3 pct arithmetic w/ null
  // propagation, views.sql:23-25; R1 NULLS LAST, views.sql:28).
  // Cutoff is a fixed parameter per SURVEY.md §7.6.2.
  // ----------------------------------------------------------------
  def q3AsOfChange(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    val cutoff = lit(AsOfCutoff).cast("timestamp")

    val latest = Ops.latestPerKey(ev, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("value").as("value_now"))
    val asOf = Ops.asOfAtOrBefore(ev, Seq("user_id"), col("ts"), cutoff, Seq(col("event_id")))
      .select(col("user_id"), col("value").as("value_then"))

    latest
      .join(asOf, Seq("user_id"), "left")
      .join(broadcast(cust), latest("user_id") === cust("c_custkey"))
      .select(
        col("user_id"), col("c_name"), col("value_now"), col("value_then"),
        when(col("value_then").isNotNull && col("value_then") =!= 0.0,
          round((col("value_now") - col("value_then")) / col("value_then") * 100.0, 4))
          .otherwise(lit(null).cast("double")).as("pct_change"))
      .orderBy(col("pct_change").desc_nulls_last, col("user_id"))
  }

  val q3AsOfChangeSql: String =
    s"""WITH latest AS (
       |  SELECT user_id, value AS value_now FROM (
       |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events) t WHERE rn = 1),
       |asof_ev AS (
       |  SELECT user_id, value AS value_then FROM (
       |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts <= TIMESTAMP '$AsOfCutoff') t WHERE rn = 1)
       |SELECT l.user_id, c.c_name, l.value_now, a.value_then,
       |  CASE WHEN a.value_then IS NOT NULL AND a.value_then <> 0.0
       |       THEN round((l.value_now - a.value_then) / a.value_then * 100.0, 4)
       |       ELSE NULL END AS pct_change
       |FROM latest l
       |LEFT JOIN asof_ev a ON a.user_id = l.user_id
       |JOIN customer c ON c.c_custkey = l.user_id
       |ORDER BY pct_change DESC NULLS LAST, l.user_id""".stripMargin

  // ----------------------------------------------------------------
  // q4_daily_ohlc — daily OHLC rollup (A2, src/etl.py:40-54): per user
  // per day open/high/low/close via min_by/max_by — one hash aggregate
  // with map-side combine, no window, no self-join. (user_id, ts) is
  // unique in events, so arg_min/arg_max are deterministic.
  // The day column is a day-truncated timestamp (not DateType) so both
  // engines emit the identical physical type through pandas/parquet.
  // ----------------------------------------------------------------
  def q4DailyOhlc(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    Ops.ohlc(ev, Seq("user_id"), date_trunc("day", col("ts")), col("ts"),
        col("value"), col("event_id"))
      .orderBy(col("user_id"), col("date"))
  }

  val q4DailyOhlcSql: String =
    """SELECT user_id, date_trunc('day', ts) AS date,
      |  arg_min(value, ts) AS open,
      |  max(value) AS high,
      |  min(value) AS low,
      |  arg_max(value, ts) AS close,
      |  COUNT(*) AS n_points
      |FROM events
      |GROUP BY user_id, date_trunc('day', ts)
      |ORDER BY user_id, date""".stripMargin

  // ----------------------------------------------------------------
  // q5_sparkline — v_sparkline_7d (P3 time-range predicate,
  // views.sql:37-42): trailing 7 days anchored at max(ts) for
  // determinism. The 1-row max aggregate is broadcast, so the range
  // predicate stays a broadcast-join filter — no driver round-trip.
  // ----------------------------------------------------------------
  def q5Sparkline(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val maxTs = ev.agg(max(col("ts")).as("max_ts"))
    ev.crossJoin(broadcast(maxTs))
      .filter(col("ts") >= col("max_ts") - expr("INTERVAL 7 DAYS"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .orderedShared(col("event_id"))
  }

  val q5SparklineSql: String =
    """SELECT event_id, user_id, ts, value
      |FROM events
      |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
      |ORDER BY event_id""".stripMargin

  // ----------------------------------------------------------------
  // q6_search_filter — dashboard substring search (P5, app.py:110-112:
  // case-insensitive contains on name OR segment).
  // ----------------------------------------------------------------
  def q6SearchFilter(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    cust.filter(
        lower(col("c_name")).contains("111") ||
        lower(col("c_mktsegment")).contains("machine"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q6SearchFilterSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE lower(c_name) LIKE '%111%' OR lower(c_mktsegment) LIKE '%machine%'
      |ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------------------
  // q7_null_ordering — KPI mean with null-skip + NULLS LAST sort
  // (A5 app.py:123, P6 app.py:122-123, R1 views.sql:28): avg purchase
  // value per customer, customers without purchases kept as NULL via
  // left join, ordered desc with nulls last.
  // ----------------------------------------------------------------
  def q7NullOrdering(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg((sum(dec(col("value"))).cast("double") / count(lit(1))).as("avg_purchase"))
    cust
      .join(purchases, cust("c_custkey") === purchases("user_id"), "left")
      .select(col("c_custkey"), col("c_name"), col("avg_purchase"))
      .orderedShared(col("avg_purchase").desc_nulls_last, col("c_custkey"))
  }

  val q7NullOrderingSql: String =
    """SELECT c_custkey, c_name, avg_purchase
      |FROM customer c
      |LEFT JOIN (
      |  SELECT user_id,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_purchase
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id) p
      |ON p.user_id = c.c_custkey
      |ORDER BY avg_purchase DESC NULLS LAST, c_custkey""".stripMargin

  // ----------------------------------------------------------------
  // q8_topk — top-k (R4): ORDER BY … LIMIT, planned as
  // TakeOrderedAndProject (no full sort materialization — each
  // partition keeps k rows, driver merges k·p).
  // ----------------------------------------------------------------
  def q8TopK(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val q8TopKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin

  // ----------------------------------------------------------------
  // q9_upsert_events — U2 fact upsert (src/db.py:87-99): merge a
  // mutated batch back into events by PK, incoming wins; verified via
  // a downstream aggregate so the whole merged state is hashed.
  // ----------------------------------------------------------------
  def q9UpsertEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val incoming = ev.filter(col("event_id") % 100 < 10)
      .withColumn("value", col("value") + lit(1.0))
    val merged = Merge.upsert(ev, incoming, Seq("event_id"))
    merged.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q9UpsertEventsSql: String =
    """WITH incoming AS (
      |  SELECT event_id, ts, user_id, event_type, value + 1.0 AS value, props
      |  FROM events WHERE event_id % 100 < 10),
      |merged AS (
      |  SELECT * FROM incoming
      |  UNION ALL
      |  SELECT * FROM events WHERE event_id NOT IN (SELECT event_id FROM incoming))
      |SELECT event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM merged
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------
  // q10_upsert_preserve — U1 dimension upsert (src/db.py:73-84): the
  // incoming row updates the mutable columns but `first_seen_at`-like
  // columns keep the existing value (here: c_acctbal survives an
  // incoming NULL). Oracle is the trivially-correct spec of the same
  // semantics.
  // ----------------------------------------------------------------
  def q10UpsertPreserve(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val incoming = cust.filter(col("c_custkey") % 7 === 0)
      .withColumn("c_name", upper(col("c_name")))
      .withColumn("c_acctbal", lit(null).cast("double"))
    val merged = Merge.upsert(cust, incoming, Seq("c_custkey"),
      preserveExisting = Seq("c_acctbal"))
    merged
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q10UpsertPreserveSql: String =
    """SELECT c_custkey,
      |  CASE WHEN c_custkey % 7 = 0 THEN upper(c_name) ELSE c_name END AS c_name,
      |  c_acctbal, c_mktsegment
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------------------
  // q11_revenue — multi-join aggregate (J2 dim join + shuffle join +
  // A-group aggregates): revenue per customer over orders⋈lineitem
  // with a date-range predicate pushed to the scan (P3).
  // ----------------------------------------------------------------
  def q11Revenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"))
      .orderBy(col("c_custkey"))
  }

  val q11RevenueSql: String =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_orderkey) AS n_orders,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------------------
  // q12_hourly — time bucketing (F4-F6: date_trunc, epoch-ms
  // round-trip, src/etl.py:42): hourly rollup of one day of events.
  // ----------------------------------------------------------------
  def q12Hourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp") &&
              col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .withColumn("hour_epoch_ms", unix_millis(col("hour")))
      .select(col("hour"), col("hour_epoch_ms"), col("n"), col("sum_value"))
      .orderBy(col("hour"))
  }

  val q12HourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour,
      |  epoch_ms(date_trunc('hour', ts)) AS hour_epoch_ms,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' AND ts < TIMESTAMP '2024-01-16 00:00:00'
      |GROUP BY date_trunc('hour', ts)
      |ORDER BY hour""".stripMargin

  // ----------------------------------------------------------------
  // q13_wordcount — array flatten/explode (F15, src/etl.py:41-44):
  // whitespace tokenize + explode + count. Generator stays inside
  // whole-stage codegen; the aggregate gets map-side combine.
  // ----------------------------------------------------------------
  def q13Wordcount(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("token"))
  }

  val q13WordcountSql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |WHERE token <> ''
      |GROUP BY token
      |ORDER BY token""".stripMargin

  // ----------------------------------------------------------------
  // q14_json_extract — JSON payload decode (F13, app.py:31; map
  // construction F14): extract props.k, bucket it, aggregate.
  // ----------------------------------------------------------------
  def q14JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("k_bucket"))
  }

  val q14JsonExtractSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY k_bucket
      |ORDER BY k_bucket""".stripMargin
}
