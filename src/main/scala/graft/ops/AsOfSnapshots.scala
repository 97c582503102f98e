package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MAINTAINED AS-OF ANCHORS — the fast path for the reference's #2
  * dashboard view, `v_price_change_24h` (`sql/views.sql:11-27`):
  * "the latest row per key AT OR BEFORE a cutoff". The raw plan
  * ([[Ops.asOfAtOrBefore]]) scans every row ever written at or below
  * the cutoff and shuffles it by key — O(history) per dashboard
  * refresh at 100 TB, because a key that last traded months ago keeps
  * its anchor row in an old partition that can never be pruned.
  *
  * The maintained form stores PERIODIC LATEST SNAPSHOTS: for each
  * period P (a monotone rendering of the base's day partition keys —
  * e.g. 10-day "decades" or months), one partition holding
  * `latestPerKey(all base rows in partitions of periods <= P)`.
  * Snapshots fold forward — `snap(P) = latestPerKey(snap(prev) ∪
  * period-P rows)` — the same argmax-folds-over-any-partition
  * identity [[IncrementalLatest]] rests on, so each refresh costs
  * O(keys + new periods' rows), never O(history). Then
  *
  * `asOf(cutoff)` = one window over
  *   `snap(sd) ∪ (boundary rows: period > sd, day <= cutoffDay,
  *                ts <= cutoff)`
  * where sd is the greatest snapshotted period STRICTLY below the
  * cutoff's period — O(keys + one period's rows) per query, with
  * every partition above the cutoff day pruned at the manifest and
  * every partition at-or-below sd answered by the snapshot.
  *
  * ROW-LOCATION CONTRACT (validated where checkable): the base is
  * partitioned by a DAY rendering of the leading order column — every
  * row in partition k has `ordCols.head` within day k — and
  * `periodOfKey` is monotone over the lexicographic key order (this
  * IS validated, per refresh and per query). The ord tuple is unique
  * per key ([[IncrementalLatest]]'s determinism contract).
  *
  * FRESHNESS is transactional, the [[graft.plans.MvRewriteRule]]
  * posture: each completed refresh commits the folded base version;
  * `asOf` takes the fast path only when the base's CURRENT manifest
  * entries for every partition at-or-below sd are IDENTICAL to that
  * version's (late-arriving data above sd — the overwhelmingly common
  * case — never blocks it). Anything else falls back to the direct
  * window, which still prunes every partition above the cutoff day.
  * A refresh interrupted mid-fold is safe: intermediate period
  * commits carry the PREVIOUS base version, so the completion marker
  * (the new version) lands only with the final period and a resumed
  * refresh re-folds from the first dirty period. */
object AsOfSnapshots {

  val BaseVersionProp = "asof.base_version"
  val KeysProp = "asof.keys"
  val OrdProp = "asof.ord"
  /** The store's period partition column. */
  val PeriodColName = "__speriod"

  /** What a [[refresh]] did: `periodsFolded` snapshot partitions
    * (re)written; `suffixRecompute` when a change to an
    * already-snapshotted period forced refolding it and everything
    * after it (late data / rectification), as opposed to appending
    * brand-new periods. */
  final case class RefreshResult(periodsFolded: Int, committed: Boolean,
                                 suffixRecompute: Boolean = false)

  /** An [[asOf]] answer: `fast` iff it was served from a snapshot
    * (plus boundary partitions) rather than the pruned full window;
    * `snapshotPeriod` is the anchor snapshot used. */
  final case class AsOfAnswer(df: DataFrame, fast: Boolean,
                              snapshotPeriod: Option[String])

  private def latestRows(df: DataFrame, keys: Seq[String],
                         ordCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordCols.map(col(_).desc): _*)
    df.withColumn("__arn", row_number().over(w))
      .filter(col("__arn") === 1).drop("__arn")
  }

  private def requireMonotone(keys: Seq[String], periodOfKey: String => String,
                              who: String): Unit = {
    val sorted = keys.sorted
    val periods = sorted.map(periodOfKey)
    require(periods == periods.sorted,
      s"AsOfSnapshots.$who: periodOfKey is not monotone over the base " +
        s"partition keys — snapshot coverage would be ill-defined")
  }

  /** Bring the snapshot store at `storePath` up to date with the base
    * at `basePath`. Folds only new periods forward; a change inside
    * an already-snapshotted period refolds from that period on
    * (suffix recompute — bounded by periods-since, never the full
    * history unless the first period changed). No-op when current. */
  def refresh(spark: SparkSession, basePath: String, storePath: String,
              keys: Seq[String], ordCols: Seq[String],
              periodOfKey: String => String,
              retainVersions: Int = 2): RefreshResult = {
    require(keys.nonEmpty, "AsOfSnapshots.refresh: no key columns")
    require(ordCols.nonEmpty, "AsOfSnapshots.refresh: no order columns")
    require(keys.intersect(ordCols).isEmpty,
      "AsOfSnapshots.refresh: keys and ordCols must be disjoint")
    val hc = spark.sparkContext.hadoopConfiguration
    val baseFs = new Path(basePath).getFileSystem(hc)
    val storeFs = new Path(storePath).getFileSystem(hc)
    val baseVersions = ManifestTable.versions(baseFs, basePath)
    require(baseVersions.nonEmpty,
      s"AsOfSnapshots.refresh: no base table at $basePath")
    val baseCur = baseVersions.last
    val recorded = ManifestTable.readProps(spark, storePath)
    for (k <- recorded.get(KeysProp)) require(k == keys.mkString(","),
      s"AsOfSnapshots.refresh: store at $storePath is keyed on $k, " +
        s"not ${keys.mkString(",")}")
    for (o <- recorded.get(OrdProp)) require(o == ordCols.mkString(","),
      s"AsOfSnapshots.refresh: store at $storePath is ordered by $o, " +
        s"not ${ordCols.mkString(",")}")
    val state = recorded.get(BaseVersionProp).map(_.toLong)
    if (state.contains(baseCur))
      return RefreshResult(0, committed = false)

    val curDirs = ManifestTable.partitionDirs(baseFs, basePath, baseCur)
    requireMonotone(curDirs.keys.toSeq, periodOfKey, "refresh")
    val prevDirs = state.filter(baseVersions.contains)
      .map(v => ManifestTable.partitionDirs(baseFs, basePath, v))
    val changedKeys = prevDirs match {
      case None => curDirs.keySet
      case Some(pd) => (curDirs.keySet ++ pd.keySet)
        .filter(k => curDirs.get(k) != pd.get(k))
    }
    val storePeriods = ManifestTable.partitionKeys(storeFs, storePath)
    if (changedKeys.isEmpty) {
      // metadata-only base commit: advance the watermark
      if (storePeriods.isEmpty) return RefreshResult(0, committed = false)
      val empty = ManifestTable.read(spark, storePath).limit(0)
      ManifestTable.merge(spark, storePath, empty, keys = keys,
        partitionCol = PeriodColName, retainVersions = retainVersions,
        props = Map(BaseVersionProp -> baseCur.toString,
          KeysProp -> keys.mkString(","), OrdProp -> ordCols.mkString(",")))
      return RefreshResult(0, committed = true)
    }
    val firstDirty = changedKeys.map(periodOfKey).min
    // refold every period >= firstDirty that exists in the base OR is
    // already snapshotted (a period whose base partitions all vanished
    // still needs its stale snapshot rewritten to the folded-forward
    // content)
    val periods = (curDirs.keySet.map(periodOfKey) ++ storePeriods)
      .filter(_ >= firstDirty).toSeq.sorted
    val suffix = storePeriods.exists(_ >= firstDirty)
    val anchor = storePeriods.filter(_ < firstDirty)
      .reduceOption((a, b) => if (a >= b) a else b)
    var prevSnap: Option[DataFrame] = anchor.map(p =>
      ManifestTable.read(spark, storePath, partitionFilter = _ == p)
        .drop(PeriodColName))
    periods.zipWithIndex.foreach { case (p, i) =>
      val pKeys = curDirs.keySet.filter(k => periodOfKey(k) == p)
      val periodRows: Option[DataFrame] =
        if (pKeys.isEmpty) None
        else Some(ManifestTable.read(spark, basePath,
          partitionFilter = k => periodOfKey(k) == p))
      val snap = (prevSnap, periodRows) match {
        case (Some(s), Some(r)) => latestRows(s.unionByName(r), keys, ordCols)
        case (Some(s), None) => s
        case (None, Some(r)) => latestRows(r, keys, ordCols)
        case (None, None) => sys.error( // unreachable: p came from one of them
          s"AsOfSnapshots.refresh: period $p has neither base rows nor a snapshot")
      }
      // the completion marker (the NEW base version) lands only with
      // the LAST period — an interrupted refresh re-folds on resume
      val verProp =
        if (i == periods.size - 1) Map(BaseVersionProp -> baseCur.toString)
        else state.map(v => Map(BaseVersionProp -> v.toString))
          .getOrElse(Map.empty[String, String])
      ManifestTable.merge(spark, storePath,
        snap.withColumn(PeriodColName, lit(p)), keys = keys,
        partitionCol = PeriodColName, retainVersions = retainVersions,
        replaceTouched = true, knownTouched = Some(Set(p)),
        props = verProp ++ Map(KeysProp -> keys.mkString(","),
          OrdProp -> ordCols.mkString(",")))
      // fold forward from what was just COMMITTED (shallow plans, and
      // the store itself is the recovery point)
      prevSnap = Some(ManifestTable.read(spark, storePath,
        partitionFilter = _ == p).drop(PeriodColName))
    }
    RefreshResult(periods.size, committed = true, suffixRecompute = suffix)
  }

  /** Latest row per key at-or-before `cutoff` (row predicate on
    * `ordCols.head`), where `cutoffKey` is the cutoff's day rendered
    * exactly like the base partition keys. Fast when a fresh snapshot
    * below the cutoff's period exists; the fallback window still
    * prunes every partition above `cutoffKey` at the manifest. */
  def asOf(spark: SparkSession, basePath: String, storePath: String,
           keys: Seq[String], ordCols: Seq[String],
           periodOfKey: String => String,
           cutoffKey: String, cutoff: Column): AsOfAnswer = {
    val hc = spark.sparkContext.hadoopConfiguration
    val baseFs = new Path(basePath).getFileSystem(hc)
    val storeFs = new Path(storePath).getFileSystem(hc)
    val baseCur = ManifestTable.versions(baseFs, basePath).lastOption.getOrElse(
      sys.error(s"AsOfSnapshots.asOf: no base table at $basePath"))
    val curDirs = ManifestTable.partitionDirs(baseFs, basePath, baseCur)
    requireMonotone(curDirs.keys.toSeq, periodOfKey, "asOf")
    val anchorPeriod = periodOfKey(cutoffKey)

    def fallback: AsOfAnswer = {
      val atOrBelow = curDirs.keySet.filter(_ <= cutoffKey)
      val df =
        if (atOrBelow.isEmpty) ManifestTable.read(spark, basePath).limit(0)
        else latestRows(ManifestTable.read(spark, basePath,
          partitionFilter = _ <= cutoffKey)
          .filter(col(ordCols.head) <= cutoff), keys, ordCols)
      AsOfAnswer(df, fast = false, snapshotPeriod = None)
    }

    val recorded = ManifestTable.readProps(spark, storePath)
    if (!recorded.get(KeysProp).contains(keys.mkString(",")) ||
        !recorded.get(OrdProp).contains(ordCols.mkString(","))) return fallback
    val folded = recorded.get(BaseVersionProp).map(_.toLong) match {
      case Some(v) if ManifestTable.versions(baseFs, basePath).contains(v) => v
      case _ => return fallback
    }
    val sd = ManifestTable.partitionKeys(storeFs, storePath)
      .filter(_ < anchorPeriod)
      .reduceOption((a, b) => if (a >= b) a else b) match {
      case Some(p) => p
      case None => return fallback
    }
    // transactional freshness, scoped to what the snapshot actually
    // covers: every base partition at-or-below sd byte-identical
    // between the folded and the current version (late data ABOVE sd
    // is served by the boundary read and never blocks the fast path)
    val foldedDirs = ManifestTable.partitionDirs(baseFs, basePath, folded)
    val covered = (k: String) => periodOfKey(k) <= sd
    val freshBelow = (curDirs.keySet ++ foldedDirs.keySet).filter(covered)
      .forall(k => curDirs.get(k) == foldedDirs.get(k))
    if (!freshBelow) return fallback

    val snap = ManifestTable.read(spark, storePath, partitionFilter = _ == sd)
      .drop(PeriodColName)
    val boundaryKeys = curDirs.keySet
      .filter(k => periodOfKey(k) > sd && k <= cutoffKey)
    val df =
      if (boundaryKeys.isEmpty) snap
      else latestRows(snap.unionByName(
        ManifestTable.read(spark, basePath, partitionFilter = boundaryKeys.contains)
          .filter(col(ordCols.head) <= cutoff)), keys, ordCols)
    AsOfAnswer(df, fast = true, snapshotPeriod = Some(sd))
  }
}
