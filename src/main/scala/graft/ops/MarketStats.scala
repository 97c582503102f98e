package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market analytics over per-entity trade/price streams — the
  * derived metrics the reference's dashboard consumers compute by
  * hand from its raw price table (`apps/streamlit-dashboard` charts
  * raw closes; any real market tracker layers VWAP, drawdown,
  * volatility bands and cross-asset correlation on top).
  *
  * Portability posture (the q54/q66 argument): every aggregate the
  * gates compare is an INTEGER in fixed point — double sums are
  * engine-dependent in the last ulp (Spark accumulates in frame
  * order, DuckDB merges segment-tree partials), while integer sums
  * are exact under any association. Ratios the gates compare are
  * integer `div` on positive operands (== floor division in both
  * engines); doubles appear only in per-row scalar arithmetic
  * mirrored expression-for-expression in the oracle, built from
  * exact integer inputs with correctly-rounded IEEE ops (+,−,×,÷,
  * sqrt) — bit-identical across engines.
  *
  * Scale posture: every operator here is one hash aggregate and/or
  * one entity-keyed sort exchange feeding O(1)-per-row window
  * frames (growing or bounded RANGE) — the q55 sessionization
  * shape. Nothing is quadratic in rows; [[pairwiseCorr]] is
  * quadratic only in the WATCHLIST size (an explicit, small,
  * caller-bounded entity set — the reference tracks 10 coins,
  * `src/config.yaml`), never in the corpus.
  */
object MarketStats {

  /** Hourly volume-weighted average price per entity.
    *
    * pv_e6 = Σ floor(price·10⁶)·qty and vol = Σ qty are exact
    * integer sums; vwap_e6 = pv_e6 div vol (qty ≥ 0, price > 0, so
    * truncating and flooring division agree). One hash aggregate —
    * map-side partial combine does the heavy lifting at 100 TB; no
    * window, no join. Rows with vol = 0 in the hour yield a NULL
    * vwap rather than a division error. */
  def vwapHourly(trades: DataFrame, keyCol: String, tsCol: String,
                 priceCol: String, qtyCol: String): DataFrame =
    trades
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(
        sum(floor(col(priceCol) * lit(1e6)).cast("long") * col(qtyCol).cast("long"))
          .as("pv_e6"),
        sum(col(qtyCol).cast("long")).as("vol"),
        count(lit(1)).as("n_trades"))
      .withColumn("vwap_e6",
        when(col("vol") > 0, expr("pv_e6 div vol")).otherwise(lit(null).cast("long")))

  /** Running peak and drawdown-from-peak per entity over an hourly
    * close series (as produced by [[TimeSeries.hourlyClose]]).
    *
    * peak_e6 is a `max` over a growing frame — O(1) per row; never
    * the O(rows²) unbounded-following shape (the q65 lesson).
    * dd_bps = (peak−close)·10⁴ div peak is basis points of drawdown
    * as an exact integer (peak ≥ close and peak > 0 whenever prices
    * are positive, which the caller guarantees). One sort exchange
    * per entity. */
  def drawdownFromHourly(hourly: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("close_e6", floor(col("close") * lit(1e6)).cast("long"))
      .withColumn("peak_e6", max(col("close_e6")).over(w))
      .select(col(keyCol), col("hour"), col("close_e6"), col("peak_e6"),
        expr("(peak_e6 - close_e6) * 10000 div peak_e6").as("dd_bps"))
  }

  /** Trailing-24 h Bollinger-style anomaly flags per entity over an
    * hourly close series: flag hours whose close deviates from the
    * trailing-window mean by more than two standard deviations.
    *
    * The test |x − μ| > 2σ is evaluated ENTIRELY in integers by
    * clearing denominators: with n rows, s = Σxᵢ, q = Σxᵢ² over the
    * frame (x in 10⁻³ fixed point),
    *
    *   |x − s/n| > 2·sqrt((n·q − s²)/n²)  ⟺  (n·x − s)² > 4·(n·q − s²)
    *
    * — no float ever enters the comparison, so the flag is
    * bit-portable. Magnitudes are bounded by the frame, not the
    * corpus: n ≤ 25 (one row per entity-hour, 24 h RANGE frame), so
    * with x ≤ 5·10⁸ every cross-product stays far below 2⁶³.
    * Frames with n < minN never flag (σ of a near-empty window is
    * noise). One entity-keyed sort exchange, O(1)-per-row bounded
    * RANGE frame. */
  def rollingAnomaly(hourly: DataFrame, keyCol: String, minN: Int = 8): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__es")).rangeBetween(-86400L, 0L)
    hourly
      .withColumn("__es", unix_timestamp(col("hour")))
      .withColumn("close_e3", floor(col("close") * lit(1e3)).cast("long"))
      .withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("sum_e3", sum(col("close_e3")).over(w))
      .withColumn("sumsq_e3", sum(col("close_e3") * col("close_e3")).over(w))
      .select(col(keyCol), col("hour"), col("close_e3"),
        col("n_24h"), col("sum_e3"), col("sumsq_e3"),
        (col("n_24h") >= minN &&
          pow2(col("n_24h") * col("close_e3") - col("sum_e3")) >
            lit(4) * (col("n_24h") * col("sumsq_e3") - col("sum_e3") * col("sum_e3")))
          .as("is_anomaly"))
  }

  private def pow2(c: Column): Column = c * c

  /** Per-entity OLS trend slope over the hourly close series — "is
    * this asset drifting up or down, and how fast" — from exact
    * integer co-moments (the [[pairwiseCorr]] machinery pointed at
    * time): x = hours since the ENTITY'S OWN first hour (centering x
    * per entity keeps n·Σxy inside BIGINT — raw epoch-hours overflow
    * at ~2e19 — and leaves the slope invariant), y = 10⁻³ fixed-point
    * close.
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)   [y-units/hour]
    *
    * n, Σx, Σy, Σxy, Σx² are one entity-keyed hash aggregate after a
    * min-hour self-aggregate + same-key join (no extra exchange under
    * AQE); the slope itself is per-row double arithmetic on exact
    * integers — bit-identical cross-engine. Zero x-variance (a single
    * observation) yields NULL. Output: (key, n, slope_e6 =
    * floor(slope·10⁶), sum_y_e3 = Σy exactly). */
  def trendSlopeE6(hourly: DataFrame, keyCol: String): DataFrame = {
    val h = hourly.select(col(keyCol).as("__k"), col("hour"),
      floor(col("close") * lit(1e3)).cast("long").as("__y"))
    val first = h.groupBy(col("__k")).agg(min(col("hour")).as("__h0"))
    val xy = h.join(first, Seq("__k"))
      .withColumn("__x", expr("(unix_timestamp(hour) - unix_timestamp(__h0)) div 3600"))
    val stats = xy.groupBy(col("__k").as(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(col("__x") * col("__y")).as("sxy"),
      sum(col("__x") * col("__x")).as("sxx"))
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    stats.select(col(keyCol), col("n"),
      when(den > 0, floor(num / den * lit(1e6)).cast("long"))
        .otherwise(lit(null).cast("long")).as("slope_e6"),
      // the exact sum, not a mean: a truncating integer mean would
      // diverge from DuckDB's floor `//` on negative sums
      col("sy").as("sum_y_e3"))
  }

  /** Pairwise Pearson correlation of hourly closes across a small
    * watchlist of entities, from exact integer co-moments.
    *
    * The hourly series self-joins on the hour (key_a < key_b), and
    * the per-pair aggregates n, Σx, Σy, Σxy, Σx², Σy² are exact
    * integer sums over 10⁻³ fixed-point closes. The correlation
    *
    *   r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    *
    * is then per-row scalar arithmetic on exact integers — each
    * IEEE op correctly rounded, so bit-identical across engines
    * (the q24 argument); zero-variance pairs yield NULL. The join
    * build side is the watchlist's own series — tiny by contract —
    * and is broadcast EXPLICITLY; pair count is quadratic in the
    * WATCHLIST (bounded, like the reference's 10-coin config), not
    * the corpus, and the co-moment agg is one hash aggregate.
    *
    * The watchlist contract is ENFORCED, not assumed (round-6
    * verdict #7): the call refuses more than `maxEntities` distinct
    * keys, so a future caller can't silently hand the self-join a
    * corpus and make it quadratic in it. The guard's count job runs
    * over the [[Intermediates]]-persisted series (one materialization
    * feeds the guard AND both join sides — an uncached caller would
    * otherwise pay its upstream plan three times), and
    * `limit(maxEntities+1)` caps the guard's work regardless of
    * input size. */
  def pairwiseCorr(hourly: DataFrame, keyCol: String, maxEntities: Int = 64,
                   maxRows: Long = 4000000L): DataFrame = {
    require(maxEntities >= 2, s"maxEntities must be >= 2, got $maxEntities")
    val e3 = floor(col("close") * lit(1e3)).cast("long")
    val h = Intermediates.shared(
      hourly.select(col(keyCol).as("__k"), col("hour"), e3.as("__x")))
    val nKeys = h.select(col("__k")).distinct().limit(maxEntities + 1).count()
    require(nKeys <= maxEntities,
      s"pairwiseCorr is quadratic in the entity set: got > $maxEntities distinct " +
        s"'$keyCol' values — filter to a watchlist first, or raise maxEntities deliberately")
    // The entity guard bounds distinct keys but not rows per key — a
    // 64-entity watchlist with decades of hourly history could still
    // blow the 8 GB broadcast hard limit (round-7 advice). Bound the
    // broadcast side's ROW count too, the same capped-limit way; the
    // count runs over the persisted frame, so it costs one cheap scan.
    val nRows = h.limit(math.min(maxRows + 1, Int.MaxValue.toLong).toInt).count()
    require(nRows <= maxRows,
      s"pairwiseCorr broadcasts the watchlist series: got > $maxRows rows — " +
        s"restrict the time range first, or raise maxRows deliberately")
    val a = h.select(col("__k").as("key_a"), col("hour"), col("__x").as("__xa"))
    val b = h.select(col("__k").as("key_b"), col("hour"), col("__x").as("__xb"))
    val joined = a.join(broadcast(b), Seq("hour")).filter(col("key_a") < col("key_b"))
    val stats = joined.groupBy(col("key_a"), col("key_b")).agg(
      count(lit(1)).as("n"),
      sum(col("__xa")).as("sx"), sum(col("__xb")).as("sy"),
      sum(col("__xa") * col("__xb")).as("sxy"),
      sum(col("__xa") * col("__xa")).as("sxx"),
      sum(col("__xb") * col("__xb")).as("syy"))
    val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    stats.select(col("key_a"), col("key_b"),
      col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"),
      when(vx > 0 && vy > 0,
        floor(num / (sqrt(vx) * sqrt(vy)) * lit(1e6)).cast("long"))
        .otherwise(lit(null).cast("long")).as("corr_e6"))
  }
}
