package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-log analytics: funnels, retention cohorts, hopping-window
  * aggregates, and value histograms — the product-analytics operator
  * family over an append-only event stream (the reference's `events`
  * shape: entity, event-time, type, value).
  *
  * Every operator here is a composition of hash aggregates and
  * co-keyed joins — no windows over unbounded frames, no driver-side
  * loops — so each survives a 100 TB event log: the only exchanges
  * are on the entity key (funnel/retention) or the bucket key
  * (hopping/histogram), and every aggregate is map-side combinable.
  */
object EventAnalytics {

  /** Ordered funnel conversion: how many users reached stage i, where
    * stage 1 is "has any `stages(0)` event" and stage i>1 is "has a
    * `stages(i-1)` event STRICTLY AFTER the user's stage-(i-1) time"
    * (min-ts semantics — the earliest possible completion of each
    * stage, the standard product-analytics definition).
    *
    * Shape: one filtered hash aggregate per stage plus a user-keyed
    * join onto the previous stage's (user, time) frame — all joins
    * and aggs share the user key, so at scale AQE plans the chain on
    * one partitioning. Each stage frame feeds both the next stage and
    * its own count, so it is registered with [[Intermediates]] (the
    * materialize-once-then-sweep contract). Stage count is the
    * caller's list — typically 3-5 — never data-dependent.
    *
    * Output: (stage, event_type, n_users), stage ascending. */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"duplicate stage types: $stages")
    var reached: DataFrame = null
    val counts = stages.zipWithIndex.map { case (st, i) =>
      val hits = events.filter(col(typeCol) === st)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      reached = Intermediates.shared(
        if (i == 0) hits.groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
        else hits.join(reached.select(col("__u"), col("__t").as("__prev")), Seq("__u"))
          .filter(col("__ts") > col("__prev"))
          .groupBy(col("__u")).agg(min(col("__ts")).as("__t")))
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(st).as("event_type"), col("n_users"))
    }
    counts.reduce(_ unionByName _)
  }

  /** Retention cohorts: users are cohorted by their FIRST active day;
    * each (cohort_day, day_offset) row counts the cohort's users
    * active `day_offset` days later. The classic triangle every
    * growth dashboard draws.
    *
    * Shape: distinct (user, day) — one hash aggregate whose partial
    * side collapses each user's same-day events before the exchange —
    * then a user-keyed self-aggregate for the cohort day and a
    * user-keyed join back (same key: no extra exchange under AQE),
    * then one (cohort, offset) hash aggregate. The distinct rows make
    * `count` already a distinct-user count — no count_distinct state.
    *
    * Output: (cohort_day, day_offset, n_active). */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val days = Intermediates.shared(
      events.select(col(userCol).as("__u"), to_date(col(tsCol)).as("__day")).distinct())
    val cohort = days.groupBy(col("__u")).agg(min(col("__day")).as("cohort_day"))
    days.join(cohort, Seq("__u"))
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Hopping (sliding) window aggregate: event count and exact
    * fixed-point value sum per `width`-wide window sliding every
    * `slide` — Spark's built-in `window()` generator, the same
    * operator Structured Streaming runs, so the batch and streaming
    * forms share a plan shape. Each event lands in width/slide
    * windows (2 for the 1h/30m default) — bounded row expansion, one
    * hash aggregate on the window struct.
    *
    * Output: (win_start, n_events, sum_value_e3). */
  def hoppingCounts(events: DataFrame, tsCol: String = "ts",
                    valCol: String = "value",
                    width: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col(tsCol), width, slide).as("__w"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col(valCol) * lit(1e3)).cast("long")).as("sum_value_e3"))
      .select(col("__w.start").as("win_start"), col("n_events"), col("sum_value_e3"))

  /** Fixed-width value histogram per group: bin = floor(value /
    * binWidth) — one hash aggregate, the map-side-combinable shape
    * (the 100 TB histogram is exactly this; adaptive/quantile binning
    * is [[graft.ext.Sketches]]' KLL territory).
    *
    * Output: (groupCols…, bin, n, min_value_e3, max_value_e3). */
  def histogram(events: DataFrame, valCol: String, binWidth: Double,
                groupCols: Seq[String]): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val e3 = floor(col(valCol) * lit(1e3)).cast("long")
    events
      .groupBy((groupCols.map(col) :+
        floor(col(valCol) / lit(binWidth)).cast("long").as("bin")): _*)
      .agg(count(lit(1)).as("n"),
        min(e3).as("min_value_e3"), max(e3).as("max_value_e3"))
  }
}
