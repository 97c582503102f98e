package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL AGGREGATE-VIEW MAINTENANCE over a [[ManifestTable]] —
  * the lakehouse materialized-view refresh: a grouped COUNT/SUM view
  * of a base table is kept current by folding in only the DELTA of
  * the partitions each base commit touched, never re-scanning the
  * table. At 100 TB this is the difference between a refresh that
  * costs O(daily batch) and one that costs O(history).
  *
  * Mechanics per [[refresh]]:
  *   1. The last folded-in base version is read from the agg table's
  *      committed PROPERTIES (`agg.base_version`) — atomic with the
  *      agg data because both live in one manifest rename, so the
  *      "applied the delta but lost the watermark" double-count crash
  *      window cannot exist.
  *   2. CHANGED partitions = manifest-entry diff between the recorded
  *      and current base versions (added, removed, or rewritten dirs
  *      — a pure driver-side metadata compare).
  *   3. The delta = aggregate over the changed partitions' NEW dirs
  *      minus the same over their OLD dirs (sign-tagged union, one
  *      aggregation job) — old dirs are readable because they belong
  *      to a retained base version (time travel is what makes
  *      retraction possible without a log).
  *   4. Affected group-hash buckets of the agg table are rewritten
  *      via replaceTouched (bucket-pruned read ⟗ delta, groups whose
  *      count reaches zero are DROPPED — the delete upsert semantics
  *      cannot express), committing the new base version in the same
  *      rename.
  *
  * If the recorded base version is no longer retained (refresh lagged
  * past the base's `retainVersions` horizon) the view falls back to a
  * FULL rebuild — correct, just not incremental; size the base
  * retention to the refresh cadence.
  *
  * EXACTNESS CONTRACT: `sumCols` should be integer (LONG) or DECIMAL
  * columns — fixed-point addition is associative, so the
  * incrementally-maintained sums are bit-equal to a full recompute
  * (the q125 gate proves it cross-engine). Floating sums would drift
  * by reduction order, as they already do between any two full
  * recomputes. Every maintained sum is pinned to its CANONICAL type —
  * exactly what `sum(col)` produces on the base (LONG for integrals,
  * `decimal(min(38, p+10), s)` for decimals) — by casting each fold
  * step back: without the cast, decimal arithmetic would widen the
  * view's schema by one digit per incremental refresh. A group's
  * running sum that genuinely overflows the canonical type fails the
  * REFRESH loudly under ANSI — the same boundary at which the scan's
  * own Sum errors, never a silently wrapped view. Retractions negate
  * (type-preserving) rather than multiply by the sign. COUNT and SUM
  * are the retractable aggregates; `minMaxCols` adds MIN/MAX under
  * the classical FAST-REFRESH-ON-APPEND contract — min/max FOLD
  * exactly when the delta is purely ADDITIVE (only brand-new
  * partitions; `least`/`greatest` are order-independent for any
  * type), and any RETRACTION (a rewritten or removed partition might
  * have held the current bound) forces the documented full rebuild.
  */
object IncrementalAgg {

  val BaseVersionProp = "agg.base_version"
  /** The bucket count the view was last built with — the group→bucket
    * mapping must stay stable or an incremental delta would land
    * groups in new buckets while the old buckets keep their rows
    * (double counting); a mismatch forces a full rebuild. */
  val BucketsProp = "agg.buckets"
  /** The min/max columns the view maintains — a mismatch with the
    * caller's request forces a full rebuild (the committed view
    * schema would not carry the requested bounds). */
  val MinMaxProp = "agg.minmax"
  private val BucketCol = "__gbucket"

  /** What a [[refresh]] did: `committed` is false only for the
    * already-current no-op; `incremental` is false when the view was
    * fully rebuilt (first build, lapsed retention, spec change, or a
    * RETRACTION under maintained min/max). */
  final case class RefreshResult(incremental: Boolean, committed: Boolean)

  /** The maintained view (group columns, `n`, `sum_<col>`…,
    * `min_<col>`/`max_<col>`…). */
  def read(spark: SparkSession, aggPath: String): DataFrame =
    ManifestTable.read(spark, aggPath).drop(BucketCol)

  /** The view AT a specific retained version — [[graft.plans
    * .MvRewriteRule]] pins the version it freshness-checked, so a
    * refresh racing the planner can never make it serve a version it
    * did not verify. */
  def readAt(spark: SparkSession, aggPath: String, version: Long): DataFrame =
    ManifestTable.readVersion(spark, aggPath, version).drop(BucketCol)

  /** Bring the aggregate view at `aggPath` up to date with the base
    * table at `basePath`. No-op if already current.
    *
    * CONTRACT: `groupCols` must be NON-NULL (the delta⟗existing join
    * is on the group key; null groups would not match themselves and
    * silently split). `buckets` and `minMaxCols` must stay stable per
    * view — a change is detected via the committed properties and
    * forces a full rebuild. */
  def refresh(spark: SparkSession, basePath: String, aggPath: String,
              groupCols: Seq[String], sumCols: Seq[String],
              buckets: Int = 16, retainVersions: Int = 2,
              minMaxCols: Seq[String] = Nil): RefreshResult = {
    require(groupCols.nonEmpty, "IncrementalAgg.refresh: no group columns")
    val fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseVersions = ManifestTable.versions(fs, basePath)
    require(baseVersions.nonEmpty, s"IncrementalAgg.refresh: no base table at $basePath")
    val baseCur = baseVersions.last
    val aggProps = ManifestTable.readProps(spark, aggPath)
    val state = aggProps.get(BaseVersionProp).map(_.toLong)
    val sameBuckets = aggProps.get(BucketsProp).forall(_ == buckets.toString)
    val mmSpec = minMaxCols.mkString(",")
    // pre-MinMaxProp views committed no entry — equivalent to "no
    // maintained bounds", so legacy views stay incremental
    val sameMinMax = aggProps.get(MinMaxProp).getOrElse("") == mmSpec
    if (state.contains(baseCur) && sameBuckets && sameMinMax)
      return RefreshResult(incremental = false, committed = false)

    // the CANONICAL maintained type per sum column — exactly what
    // `sum(col)` produces on the base; every fold step casts back to
    // it so the view schema never drifts (decimal adds widen by a
    // digit per fold otherwise)
    val sumType: Map[String, org.apache.spark.sql.types.DataType] = {
      val baseSchema = ManifestTable.read(spark, basePath).schema
      sumCols.map { c =>
        c -> (baseSchema(c).dataType match {
          case d: org.apache.spark.sql.types.DecimalType =>
            org.apache.spark.sql.types.DecimalType(
              math.min(38, d.precision + 10), d.scale)
          case org.apache.spark.sql.types.FloatType |
               org.apache.spark.sql.types.DoubleType =>
            org.apache.spark.sql.types.DoubleType
          case _ => org.apache.spark.sql.types.LongType
        })
      }.toMap
    }
    def canon(c: String, e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      e.cast(sumType(c)).as(s"sum_$c")

    // count + signed sums + signed NON-NULL COUNTS (the retractable
    // family; retraction NEGATES — type-preserving, unlike a sign
    // multiply which widens decimals). The per-measure `cnt_<c>` is
    // what keeps SUM null-correct under retraction: "no non-null rows
    // left" (SQL NULL sum) and "values cancel to zero" are
    // indistinguishable from the running sum alone, and it is exactly
    // avg's count(v) denominator for the MV rewrite.
    def aggOf(df: DataFrame, sign: Long): DataFrame = {
      def signed(c: String) = if (sign >= 0L) col(c) else -col(c)
      df.groupBy(groupCols.map(col): _*)
        .agg(sum(lit(sign)).as("n"),
          sumCols.map(c => canon(c, sum(signed(c)))) ++
            sumCols.map(c => sum(when(col(c).isNotNull, lit(sign))
              .otherwise(lit(0L))).as(s"cnt_$c")): _*)
    }

    // count + sums + non-null counts + min/max (the additive-only
    // family)
    def aggFull(df: DataFrame): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("n"),
          sumCols.map(c => canon(c, sum(col(c)))) ++
            sumCols.map(c => count(col(c)).as(s"cnt_$c")) ++
            minMaxCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
              max(col(c)).as(s"max_$c"))): _*)

    def withBucket(df: DataFrame): DataFrame =
      df.withColumn(BucketCol,
        pmod(xxhash64(groupCols.map(col): _*), lit(buckets.toLong)).cast("string"))

    val aggFs = new Path(aggPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val props = Map(BaseVersionProp -> baseCur.toString,
      BucketsProp -> buckets.toString, MinMaxProp -> mmSpec)

    def fullRebuild(): RefreshResult = {
      // Full (re)build: the complete aggregate replaces every bucket
      // (declared = every bucket of the NEW mapping plus every
      // existing partition — stale buckets of an old mapping delete).
      val full = withBucket(aggFull(ManifestTable.read(spark, basePath)))
      ManifestTable.merge(spark, aggPath, full,
        keys = groupCols, partitionCol = BucketCol,
        retainVersions = retainVersions, replaceTouched = true,
        knownTouched = Some(ManifestTable.partitionKeys(aggFs, aggPath) ++
          (0 until buckets).map(_.toString)),
        props = props)
      RefreshResult(incremental = false, committed = true)
    }

    // a view built before per-measure non-null counts lacks the
    // cnt_<c> columns the fold needs — a one-time spec-change rebuild
    // upgrades it (exactly the BucketsProp/MinMaxProp posture)
    def viewHasCnts: Boolean = {
      val cols = ManifestTable.read(spark, aggPath).schema.fieldNames.toSet
      sumCols.forall(c => cols.contains(s"cnt_$c"))
    }
    val incremental = sameBuckets && sameMinMax &&
      state.exists(v => baseVersions.contains(v)) &&
      ManifestTable.versions(aggFs, aggPath).nonEmpty && viewHasCnts
    if (!incremental) return fullRebuild()

    // Changed partitions between the recorded and current versions —
    // a driver-side manifest diff (dir strings; stats suffixes ignored).
    val prevV = state.get
    val oldDirs = ManifestTable.partitionDirs(fs, basePath, prevV)
    val newDirs = ManifestTable.partitionDirs(fs, basePath, baseCur)
    val changed = (oldDirs.keySet ++ newDirs.keySet).filter(k =>
      oldDirs.get(k) != newDirs.get(k))
    // Keyed reads (not raw dir reads): a compacted dir shared across
    // partitions must contribute each changed key's rows exactly once,
    // and never the rows of an unchanged key it also holds — else the
    // +1/-1 fold double-counts or leaks.
    val minus = changed.intersect(oldDirs.keySet)
    val plus = changed.intersect(newDirs.keySet)

    // Maintained min/max fold ONLY over additive deltas: a retracted
    // (rewritten/removed) partition might have held the current
    // bound, and min/max cannot "subtract" — full rebuild instead.
    if (minMaxCols.nonEmpty && minus.nonEmpty) return fullRebuild()

    val delta: Option[DataFrame] =
      if (changed.isEmpty) None
      else if (minMaxCols.nonEmpty)
        Some(aggFull(ManifestTable.readKeys(spark, basePath, baseCur, plus)))
      else {
        val parts = Seq(
          if (plus.isEmpty) None
          else Some(aggOf(ManifestTable.readKeys(spark, basePath, baseCur, plus), 1L)),
          if (minus.isEmpty) None
          else Some(aggOf(ManifestTable.readKeys(spark, basePath, prevV, minus), -1L))
        ).flatten
        Some(parts.reduce(_ unionByName _)
          .groupBy(groupCols.map(col): _*)
          .agg(sum(col("n")).as("n"),
            sumCols.map(c => canon(c, sum(col(s"sum_$c")))) ++
              sumCols.map(c => sum(col(s"cnt_$c")).as(s"cnt_$c")): _*))
      }

    delta match {
      case None =>
        // Nothing changed (e.g. an idempotent base re-commit of
        // identical content would still differ in dir names and land
        // in the delta path; truly-empty diffs only advance the
        // watermark): commit a data-empty version carrying the props.
        val empty = read(spark, aggPath).limit(0)
        ManifestTable.merge(spark, aggPath, withBucket(empty),
          keys = groupCols, partitionCol = BucketCol,
          retainVersions = retainVersions, props = props)
        RefreshResult(incremental = true, committed = true)
      case Some(d) =>
        val dB = withBucket(d)
        val affected = dB.select(col(BucketCol)).distinct()
          .collect().map(_.getString(0)).toSet
        // Only buckets that EXIST can be read; an affected bucket
        // whose groups are all new has no dir yet (and an all-new
        // affected set would otherwise fail the empty-read guard).
        val readable = affected.intersect(ManifestTable.partitionKeys(aggFs, aggPath))
        val existing =
          if (readable.isEmpty) read(spark, aggPath).limit(0)
          else ManifestTable.read(spark, aggPath,
            partitionFilter = readable.contains).drop(BucketCol)
        val gc = groupCols
        val merged = existing.select(
            (gc.map(col) :+ col("n").as("__en")) ++
              sumCols.map(c => col(s"sum_$c").as(s"__e$c")) ++
              sumCols.map(c => col(s"cnt_$c").as(s"__ec$c")) ++
              minMaxCols.flatMap(c => Seq(col(s"min_$c").as(s"__emn$c"),
                col(s"max_$c").as(s"__emx$c"))): _*)
          .join(d.select((gc.map(col) :+ col("n").as("__dn")) ++
            sumCols.map(c => col(s"sum_$c").as(s"__d$c")) ++
            sumCols.map(c => col(s"cnt_$c").as(s"__dc$c")) ++
            minMaxCols.flatMap(c => Seq(col(s"min_$c").as(s"__dmn$c"),
              col(s"max_$c").as(s"__dmx$c"))): _*), gc, "full_outer")
          .select((gc.map(col) :+
            (coalesce(col("__en"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n")) ++
            // a folded sum is SQL NULL exactly when no non-null row
            // remains — "retracted every value" and "values cancel to
            // zero" are different answers, and only cnt can tell them
            // apart (the coalesce alone would serve 0 for an all-null
            // group where the scan serves NULL)
            sumCols.map { c =>
              val cnt = coalesce(col(s"__ec$c"), lit(0L)) +
                coalesce(col(s"__dc$c"), lit(0L))
              when(cnt === 0L, lit(null).cast(sumType(c)))
                .otherwise((coalesce(col(s"__e$c"), lit(0L).cast(sumType(c))) +
                  coalesce(col(s"__d$c"), lit(0L).cast(sumType(c))))
                  .cast(sumType(c))).as(s"sum_$c")
            } ++
            sumCols.map(c => (coalesce(col(s"__ec$c"), lit(0L)) +
              coalesce(col(s"__dc$c"), lit(0L))).as(s"cnt_$c")) ++
            // least/greatest skip NULLs (an all-null or absent side
            // contributes nothing) — exactly SQL min/max null semantics
            minMaxCols.flatMap(c => Seq(
              least(col(s"__emn$c"), col(s"__dmn$c")).as(s"min_$c"),
              greatest(col(s"__emx$c"), col(s"__dmx$c")).as(s"max_$c"))): _*)
          .filter(col("n") > 0) // a group retracted to zero disappears
        ManifestTable.merge(spark, aggPath, withBucket(merged),
          keys = groupCols, partitionCol = BucketCol,
          retainVersions = retainVersions, replaceTouched = true,
          knownTouched = Some(affected), props = props)
        RefreshResult(incremental = true, committed = true)
    }
  }
}
