package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational primitives the reference implements across its three
  * compute layers (SQL views, Python ETL, pandas dashboard) — re-expressed
  * as composable Spark operators.
  *
  * Scale posture (100 TB): every operator here is a single declarative
  * plan — one shuffle for the window/agg on the key columns, no
  * driver-side collects, no UDFs. Latest-per-key and as-of are window
  * based rather than the reference's self-join form (`views.sql:4-6`),
  * which halves the shuffles: the self-join shape shuffles the fact
  * table twice (once for the agg, once for the join) while the window
  * form shuffles it once by key.
  */
object Ops {

  /** Greatest-row-per-group (reference J1, `views.sql:4-6`): the latest
    * row per `keys` ordered by `orderBy` (pass ts plus a unique
    * tie-breaker for determinism).
    *
    * One hash-partition shuffle on `keys`; at 1000 executors this is
    * the minimal movement for this semantic. Skewed keys are handled by
    * AQE (spark.sql.adaptive.enabled) since row_number windows
    * partition strictly by key; for pathological single-key skew use
    * [[latestPerKeyAgg]] which does partial aggregation map-side.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Aggregation form of latest-per-key: `max_by(struct(payload), ord)`.
    * Unlike the window form this gets a map-side partial aggregate
    * (each task reduces its partition to one row per key before the
    * shuffle), so it wins when keys are few and rows are many —
    * exactly the reference's shape (10 assets × unbounded history).
    * `ord` must be unique per key for deterministic results.
    */
  def latestPerKeyAgg(df: DataFrame, keys: Seq[String], ord: Column, payload: Seq[String]): DataFrame = {
    val packed = struct(payload.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(packed, ord).as("__row"))
      .select(keys.map(col) ++ payload.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** As-of (backward) lookup (reference J3, `views.sql:12-21`): per key,
    * the latest row with `tsCol <= cutoff`. The reference implements
    * this as CTE + self-join; here it is filter + latest-per-key, so
    * the cutoff predicate is pushed into the parquet scan (row-group
    * pruning on ts min/max stats) before any shuffle.
    */
  def asOfAtOrBefore(df: DataFrame, keys: Seq[String], tsCol: Column,
                     cutoff: Column, tieBreak: Seq[Column] = Nil): DataFrame =
    latestPerKey(df.filter(tsCol <= cutoff), keys, tsCol +: tieBreak)

  /** Daily OHLC rollup (reference A2, `src/etl.py:40-54`): per key per
    * day: open = value at min ts, high/low = max/min value,
    * close = value at max ts. `tieBreak` disambiguates equal
    * timestamps (the reference relies on array order; Spark needs an
    * explicit total order for determinism).
    *
    * Single hash aggregate with map-side combine — min_by/max_by are
    * built-in Catalyst aggregates, so this stays in whole-stage
    * codegen and shuffles only (key, day) partial states, not rows.
    */
  def ohlc(df: DataFrame, keys: Seq[String], dayCol: Column, tsCol: Column,
           valueCol: Column, tieBreak: Column): DataFrame = {
    val ord = struct(tsCol, tieBreak)
    df.groupBy((keys.map(col) :+ dayCol.as("date")): _*)
      .agg(
        min_by(valueCol, ord).as("open"),
        max(valueCol).as("high"),
        min(valueCol).as("low"),
        max_by(valueCol, ord).as("close"),
        count(lit(1)).as("n_points"))
  }

  /** Gap-based sessionization — the classic event-stream operator: a
    * new session starts when the gap to the user's previous event
    * exceeds `gapUs` microseconds. Two windows over one (user) shuffle
    * — a lag for the boundary flag, a running sum to number sessions —
    * then the per-session rollup is a hash aggregate. All arithmetic
    * is integer microseconds (engine-portable). At scale the shuffle
    * key is the user id — the same partitioning the rollup reuses, so
    * the whole operator is ONE exchange.
    *
    * Output: (userCol, session_id, n_events, start_us, end_us). */
  def sessionize(events: DataFrame, userCol: String, tsUsCol: String,
                 tieBreak: String, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsUsCol), col(tieBreak))
    val prev = lag(col(tsUsCol), 1).over(w)
    events
      .withColumn("__new",
        when(prev.isNull || col(tsUsCol) - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsUsCol)).as("start_us"),
        max(col(tsUsCol)).as("end_us"))
  }

  /** Bucketed range (interval) join: match each point to every
    * interval containing it, with NO equi key available. The naive
    * plan for `p.x BETWEEN i.lo AND i.hi` is a broadcast-nested-loop
    * (or cartesian) join — |points| × |intervals| comparisons, the
    * classic 100 TB killer. Instead, decompose into an EQUI join:
    * each interval explodes into the day buckets it covers, each
    * point maps to its one bucket, and the join key is the bucket —
    * a shuffle/broadcast hash join whose cost is |points| +
    * Σ interval-lengths-in-days. The exact containment predicate is
    * re-checked in the join condition (buckets at day granularity
    * over day-precision data make it a no-op here, but sub-bucket
    * precision stays correct). This is the standard interval-join
    * decomposition (bucket width trades replication vs selectivity;
    * choose ~= median interval length).
    *
    * `points` keeps all its columns; intervals contribute `idCol`.
    * Points in no interval are dropped (inner semantics); intervals
    * with no points surface through the caller's left join against
    * the interval table (q78's shape). PlanSpec asserts the physical
    * plan has no BNLJ/cartesian. */
  def rangeJoinByDay(points: DataFrame, ptDateCol: String,
                     intervals: DataFrame, idCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val buckets = intervals
      .select(col(idCol), col(startCol).as("__lo"), col(endCol).as("__hi"),
        explode(sequence(
          to_date(col(startCol)), to_date(col(endCol)),
          expr("interval 1 day"))).as("__iday"))
    points
      .withColumn("__pday", to_date(col(ptDateCol)))
      .join(buckets,
        col("__pday") === col("__iday") &&
          col(ptDateCol) >= col("__lo") && col(ptDateCol) <= col("__hi"))
      .drop("__pday", "__iday", "__lo", "__hi")
  }

  /** General two-table AS-OF join (pandas `merge_asof` / kdb `aj`):
    * every left row picks the single right row with the greatest
    * right-ts ≤ its own ts within its key; left rows with no prior
    * right row survive with null payload (left-outer). [[asOfAtOrBefore]]
    * (the reference's 24 h-ago view, J3) is the special case of a
    * constant cutoff; this is the per-row form a time-series store
    * needs (match each trade to the prevailing quote, each event to
    * the last config change).
    *
    * Shape — the UNION-AND-SWEEP form: both sides union into one
    * frame sorted per key by (ts, side) with right rows FIRST at
    * equal ts (making the match inclusive), and the right payload
    * rides forward under a growing `last(ignoreNulls)` frame; left
    * rows filter back out. ONE sort exchange on the key total. The
    * alternatives don't scale: a per-left-row subquery is O(L·R),
    * and an equi-join on key explodes on dense right series before
    * its window prunes.
    *
    * Null semantics match merge_asof/ASOF JOIN exactly: the payload
    * travels as ONE STRUCT (non-null for every right row even when
    * all its fields are null), so a matched right row whose payload
    * VALUE is null yields null — `ignoreNulls` skips only the union's
    * placeholder rows, never a genuine null observation. Right rows
    * with a null timestamp are dropped (no event time is "at or
    * before" anything — ASOF's null comparison matches nothing);
    * they'd otherwise sort nulls-first and become a bogus fallback.
    * Right rows must be unique per (key, ts) — at equal right
    * timestamps the carried payload is tie-ambiguous.
    *
    * Output: every left column plus `payloadCols` from the right. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    require(leftCols.intersect(payloadCols).isEmpty,
      s"right payload collides with left columns: ${leftCols.intersect(payloadCols).mkString(",")}")
    val r = right.filter(col(tsCol).isNotNull)
      .select(leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(col): _*).as("__p") :+ lit(0).as("__side"): _*)
    val l = left.select(leftCols.map(col) :+
      lit(null).cast(r.schema("__p").dataType).as("__p") :+ lit(1).as("__side"): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** SCD2 (slowly-changing-dimension type 2) temporal join: each fact
    * row picks the dimension VERSION effective at its event time —
    * `fact.ts ∈ [valid_from, valid_to)` (half-open, the standard SCD2
    * interval convention: a version's `valid_to` is the successor's
    * `valid_from`, so no instant matches two versions).
    *
    * Plan shape — the reason this is an operator and not a raw join:
    * the dimension KEY is an equi condition, so the join is a hash
    * join (broadcast for normal dim sizes) with the interval test as
    * a residual filter — never a nested loop, unlike a naive
    * "BETWEEN-only" temporal join (q78's no-equi-key problem doesn't
    * arise: SCD2 always has the key). Each fact matches at most one
    * version when intervals are disjoint per key — the caller's
    * contract; PlanSpec pins the hash-join shape via q88. */
  def scd2Join(facts: DataFrame, dimVersions: DataFrame,
               factKey: String, dimKey: String, tsCol: String,
               fromCol: String = "valid_from", toCol: String = "valid_to"): DataFrame =
    facts.join(dimVersions,
      facts(factKey) === dimVersions(dimKey) &&
        facts(tsCol) >= dimVersions(fromCol) && facts(tsCol) < dimVersions(toCol))
}
