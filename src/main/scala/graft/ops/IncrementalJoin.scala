package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL JOIN-VIEW MAINTENANCE over [[ManifestTable]]s — the
  * materialized fact⋈dim enrichment view kept current from MANIFEST
  * DIFFS, the join-shaped sibling of [[IncrementalAgg]]:
  *
  *   - **Fact-side commits** rewrite exactly their own partitions:
  *     the view is partitioned like the fact, so a changed fact
  *     partition's view content is recomputed as
  *     `factPartition ⋈ dim` and lands via replaceTouched.
  *   - **Dim-side commits** resolve to AFFECTED JOIN KEYS through
  *     [[ManifestTable.changes]] (the change data feed — identical
  *     rewritten rows contribute nothing, so a sloppy dim writer that
  *     rewrites whole partitions still yields a tight key set), then
  *     ONE column-pruned scan of the fact (partition col + join key
  *     only) finds which fact partitions hold those keys; only those
  *     rewrite.
  *   - Both folded-in base versions commit ATOMICALLY with the view
  *     data as manifest properties — the applied-but-unrecorded
  *     double-apply window cannot exist (the [[IncrementalAgg]]
  *     watermark argument).
  *
  * At 100 TB a daily fact batch refresh costs O(batch ⋈ dim), and a
  * dim trickle-update costs O(key-bearing partitions ⋈ dim) — never a
  * full view rebuild. The fall-back (first build, lapsed retention,
  * expired dim intermediates) is the full `fact ⋈ dim` — correct,
  * just not incremental.
  *
  * CONTRACTS: `joinKey` is UNIQUE in the dim (N:1 enrichment — each
  * fact row matches ≤1 dim row; the view keys stay the fact keys);
  * the join is INNER, so a fact row whose key leaves the dim drops
  * out of the view on the partitions-rewrite path like any other row.
  * Fact partition values must be stable per fact key ([[ManifestTable]]
  * merge contract).
  */
object IncrementalJoin {

  val FactVersionProp = "join.fact_version"
  val DimVersionProp = "join.dim_version"

  /** Evidence a [[refresh]] returns. `committed` is false only for
    * the already-current no-op. */
  final case class RefreshResult(partitionsRewritten: Long, full: Boolean,
                                 committed: Boolean)

  /** The maintained view. */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    ManifestTable.read(spark, viewPath)

  /** Bring the join view at `viewPath` up to date with the fact and
    * dim tables. No-op if both folded-in versions are current. */
  def refresh(spark: SparkSession, factPath: String, dimPath: String,
              viewPath: String, factKeys: Seq[String], joinKey: String,
              factPartitionCol: String, retainVersions: Int = 2): RefreshResult = {
    val hc = spark.sparkContext.hadoopConfiguration
    val factFs = new Path(factPath).getFileSystem(hc)
    val dimFs = new Path(dimPath).getFileSystem(hc)
    val viewFs = new Path(viewPath).getFileSystem(hc)
    val factVs = ManifestTable.versions(factFs, factPath)
    val dimVs = ManifestTable.versions(dimFs, dimPath)
    require(factVs.nonEmpty, s"IncrementalJoin.refresh: no fact table at $factPath")
    require(dimVs.nonEmpty, s"IncrementalJoin.refresh: no dim table at $dimPath")
    val (factCur, dimCur) = (factVs.last, dimVs.last)
    val recorded = ManifestTable.readProps(spark, viewPath)
    val recF = recorded.get(FactVersionProp).map(_.toLong)
    val recD = recorded.get(DimVersionProp).map(_.toLong)
    if (recF.contains(factCur) && recD.contains(dimCur))
      return RefreshResult(0L, full = false, committed = false)
    val newProps = Map(FactVersionProp -> factCur.toString,
      DimVersionProp -> dimCur.toString)
    val dim = ManifestTable.read(spark, dimPath)
    // The N:1 enrichment contract: a duplicate dim key would fan every
    // matching fact row out into duplicate view rows — refuse loudly
    // (one dim-sized aggregate per refresh; the dim is the small side).
    ManifestTable.requireUniqueKeys(dim, Seq(joinKey), "IncrementalJoin dim")

    // Incremental needs: an existing view, both recorded versions
    // still retained, and every dim version in (recorded, current]
    // retained (the changes() contiguity requirement).
    val incremental = ManifestTable.versions(viewFs, viewPath).nonEmpty &&
      recF.exists(factVs.contains) && recD.exists(dimVs.contains) &&
      recD.exists(v => dimVs.count(x => x > v && x <= dimCur) == dimCur - v)

    if (!incremental) {
      val factParts = ManifestTable.partitionKeys(factFs, factPath)
      val full = ManifestTable.read(spark, factPath).join(dim, Seq(joinKey))
      ManifestTable.merge(spark, viewPath, full, keys = factKeys,
        partitionCol = factPartitionCol, retainVersions = retainVersions,
        replaceTouched = true,
        knownTouched = Some(ManifestTable.partitionKeys(viewFs, viewPath) ++ factParts),
        props = newProps)
      return RefreshResult(factParts.size.toLong, full = true, committed = true)
    }

    // Fact-side: changed partitions from the manifest diff.
    val oldF = ManifestTable.partitionDirs(factFs, factPath, recF.get)
    val newF = ManifestTable.partitionDirs(factFs, factPath, factCur)
    val factChanged = (oldF.keySet ++ newF.keySet)
      .filter(k => oldF.get(k) != newF.get(k))

    // Dim-side: affected join keys via the CDF, then the fact
    // partitions that hold them (one column-pruned scan; a bloom
    // dir-index on the fact's join key would prune it further).
    val extra: Set[String] =
      if (recD.get == dimCur) Set.empty
      else {
        val keys = ManifestTable.changes(spark, dimPath, Seq(joinKey), recD.get, dimCur)
          .select(col(joinKey)).distinct()
        ManifestTable.read(spark, factPath)
          .select(col(factPartitionCol), col(joinKey))
          .join(broadcast(keys), Seq(joinKey), "left_semi")
          .select(col(factPartitionCol).cast("string").as("__p")).distinct()
          .collect().map(_.getString(0)).toSet
      }

    val touched = factChanged ++ extra
    val readable = touched.intersect(newF.keySet)
    val newContent =
      if (readable.isEmpty)
        // every touched partition vanished from the fact — commit the
        // partition deletes (and the version watermark) with an empty
        // batch shaped by the view's committed schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          ManifestTable.read(spark, viewPath).schema)
      else ManifestTable.read(spark, factPath, partitionFilter = readable.contains)
        .join(dim, Seq(joinKey))
    ManifestTable.merge(spark, viewPath, newContent, keys = factKeys,
      partitionCol = factPartitionCol, retainVersions = retainVersions,
      replaceTouched = true, knownTouched = Some(touched), props = newProps)
    RefreshResult(touched.size.toLong, full = false, committed = true)
  }
}
