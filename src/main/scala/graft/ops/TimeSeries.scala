package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair and rolling aggregation over per-entity event
  * streams — the operations the reference's dashboard consumers do
  * by hand on sparse hourly series (`apps/streamlit-dashboard`
  * renders gap-ridden sparklines; a real pipeline fills and smooths
  * them). All shapes are one entity-keyed sort exchange feeding
  * window functions — the q55 sessionization posture.
  */
object TimeSeries {

  /** Last value per (key, hour) — the hourly "close" series that
    * [[gapFillHourly]] and [[rollingAvg24h]] operate on. One hash
    * aggregate (`max_by` over the event time), no window. Callers
    * needing a tie-break must pre-dedup `tsCol` per key ((user, ts)
    * is unique in the events table — the q4 contract). */
  def hourlyClose(events: DataFrame, keyCol: String, tsCol: String,
                  valCol: String): DataFrame =
    events.groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(max_by(col(valCol), col(tsCol)).as("close"))

  /** LINEAR GAP-FILL over a dense hourly grid: for each key, emit one
    * row per hour from its first to its last observed hour; observed
    * hours carry their close, missing hours interpolate linearly
    * between the nearest observed neighbors:
    *
    *   v(t) = prev + (next − prev) · (t − t_prev) / (t_next − t_prev)
    *
    * Shape: grid = per-key (min, max) agg + `sequence`/`explode`
    * (map-only after one agg — never a driver loop); neighbor lookup
    * = `last(..., ignoreNulls)` / `first(..., ignoreNulls)` windows
    * over ONE entity-keyed sort; grid rows per key are bounded by
    * the key's own time span. Endpoints are observed by
    * construction, so the interpolation is always two-sided.
    *
    * Portability: the interpolation is per-row double arithmetic
    * with a fixed association order (the oracle mirrors it
    * expression-for-expression — the q24 argument); no
    * order-sensitive float aggregation anywhere. The raw double is
    * returned UNROUNDED: gates emit `floor(x·10⁶)` fixed point,
    * because `round(x, n)`'s tie/representation behavior differs
    * across engines in the last ulp (measured: 32.557813 vs
    * 32.557812 on identical inputs) while `floor` of bit-identical
    * doubles cannot. */
  def gapFillHourly(events: DataFrame, keyCol: String, tsCol: String,
                    valCol: String): DataFrame =
    gapFillFromHourly(hourlyClose(events, keyCol, tsCol, valCol), keyCol)

  /** [[gapFillHourly]] over a precomputed (key, hour, close) frame —
    * the `FromShingles` convention: callers holding a shared cached
    * hourly pass (one aggregate feeding the whole time-series
    * family) skip re-aggregating the raw events. */
  def gapFillFromHourly(hourly: DataFrame, keyCol: String): DataFrame = {
    // Next-observed neighbor per OBSERVED row, computed with `lead`
    // over the hourly frame (observed rows only — a key's hourly rows
    // are a small subset of its dense grid) and attached through the
    // grid join. A gap row's next observed hour equals its PRECEDING
    // observed row's lead — no observed row lies between them — so one
    // ascending growing-frame pass propagates both neighbor pairs.
    // Earlier rounds computed the "next" side with a DESCENDING sort
    // over the full grid (itself the fix for the O(rows²) unbounded-
    // following frame, measured 47 s vs 1.5 s at sf0.1); this form
    // removes that second full-grid exchange+sort outright and pays
    // only an hourly-sized window for the leads (guide §2.4: one
    // entity-keyed sort per pass, over the smaller frame).
    val wLead = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
    val obs = hourly
      .withColumn("__nv0", lead(col("close"), 1).over(wLead))
      .withColumn("__nh0", lead(col("hour"), 1).over(wLead))
    val grid = hourly.groupBy(col(keyCol))
      .agg(min(col("hour")).as("__h0"), max(col("hour")).as("__h1"))
      .select(col(keyCol),
        explode(sequence(col("__h0"), col("__h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    // `last(ignoreNulls)` over a growing frame is O(1) per row; only
    // the last observed row per key carries a null lead, and the grid
    // never extends past it, so every gap row finds a non-null
    // neighbor pair (endpoints are observed by construction).
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsHour = when(col("close").isNotNull, col("hour"))
    val frac = (unix_timestamp(col("hour")) - unix_timestamp(col("__ph"))).cast("double") /
      (unix_timestamp(col("__nh")) - unix_timestamp(col("__ph"))).cast("double")
    grid.join(obs, Seq(keyCol, "hour"), "left_outer")
      .withColumn("__pv", last(col("close"), ignoreNulls = true).over(wPrev))
      .withColumn("__ph", last(obsHour, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", last(col("__nv0"), ignoreNulls = true).over(wPrev))
      .withColumn("__nh", last(col("__nh0"), ignoreNulls = true).over(wPrev))
      .select(col(keyCol), col("hour"),
        when(col("close").isNotNull, col("close"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) * frac)
          .as("value_filled"),
        col("close").isNull.as("was_gap"))
  }

  /** Trailing 24-hour rolling average over the hourly close series —
    * a RANGE frame (ts' ≥ ts − 24 h, inclusive both ends) on the
    * epoch-second order key, per entity.
    *
    * The sum is 1e-6 FIXED POINT: a double `avg` over a bounded
    * window frame is engine-DEPENDENT in the last ulp (Spark
    * accumulates in frame order; DuckDB aggregates frames via a
    * segment tree — different association), while integer sums are
    * exact in any order — the q54 pooling argument applied to
    * windows. Output carries the exact integers (sum_e6, n_24h) and
    * a convenience double average; gates compare the integers. */
  def rollingAvg24h(events: DataFrame, keyCol: String, tsCol: String,
                    valCol: String): DataFrame =
    rollingAvg24hFromHourly(hourlyClose(events, keyCol, tsCol, valCol), keyCol)

  /** [[rollingAvg24h]] over a precomputed (key, hour, close) frame —
    * same shared-pass convention as [[gapFillFromHourly]]. */
  def rollingAvg24hFromHourly(hourlyIn: DataFrame, keyCol: String): DataFrame = {
    val hourly = hourlyIn
      .withColumn("__es", unix_timestamp(col("hour")))
      .withColumn("__e6", floor(col("close") * lit(1e6)).cast("long"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__es"))
      .rangeBetween(-86400L, 0L)
    hourly
      .withColumn("sum_e6", sum(col("__e6")).over(w))
      .withColumn("n_24h", count(lit(1)).over(w))
      .select(col(keyCol), col("hour"), col("sum_e6"), col("n_24h"),
        (col("sum_e6").cast("double") / lit(1e6) / col("n_24h").cast("double"))
          .as("avg_24h"))
  }
}
