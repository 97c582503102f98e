package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-committed partitioned table — the minimal table format
  * that closes [[MergeWriter.mergeIntoPartitioned]]'s remaining
  * ceiling (round-7 verdict #4): true multi-partition snapshot
  * atomicity. The two-rename swap commit still exposes a
  * per-partition torn-read window — a reader listing the table
  * between two partition swaps sees partition A new and partition B
  * old. Here readers never list the table at all: they resolve ONE
  * manifest file, and the commit point is ONE filesystem rename.
  *
  * Layout under `path/`:
  *   - `data/batch-<uuid>/__pdir=<value>/part-*.parquet` — immutable
  *     data directories; every merge writes NEW directories and never
  *     mutates or renames an existing one. The partition column is
  *     retained inside the files (the `__pdir` copy exists only to
  *     shape the directory layout), so a data dir reads as plain
  *     parquet with the full schema — no partition-inference plumbing.
  *   - `_manifests/m<version>` — a `__schema__\t<schema-json>` header
  *     (the snapshot's committed schema) then one line per live
  *     partition: `<partition-value-string>\t<relative data dir>`.
  *     The LATEST version is the table. Reads resolve under the
  *     committed schema, so a partition written before an additive
  *     widening fills the missing columns with nulls — no
  *     mergeSchema footer sweep, and each retained version reads
  *     under its own schema.
  *
  * Commit protocol: write the merged batch's data dirs (invisible —
  * nothing references them), write the new manifest to a `.tmp` name,
  * then ONE `rename(tmp, m<v+1>)` — atomic on HDFS and on the
  * object-store committers that emulate it. A reader resolves either
  * m<v> (wholly old) or m<v+1> (wholly new); there is no intermediate
  * state, however many partitions the batch touched. Rename-if-absent
  * doubles as optimistic concurrency: two racing writers both target
  * m<v+1> and the loser's rename fails loudly (single-writer is the
  * contract, the check makes a violation a crash instead of a
  * corruption).
  *
  * Crash anywhere before the manifest rename leaves the table
  * untouched — orphan data dirs and manifest tmps are garbage, swept
  * by the next successful merge's [[cleanup]]. No recovery-rollback
  * step exists because no state between "old table" and "new table"
  * ever does.
  *
  * Retention: cleanup keeps the data dirs of the latest TWO manifests,
  * so a reader that resolved the previous manifest just before a
  * commit keeps reading consistent (old) data through one subsequent
  * merge — the same one-version grace Delta's default VACUUM horizon
  * serves. This is deliberately a miniature of the Delta/Iceberg
  * commit design; swapping to a real table format replaces this file
  * one-for-one and keeps every caller's semantics.
  *
  * Scale posture: the manifest is O(live partitions) text resolved
  * once per read — at 100 TB that is thousands of lines, driver-side
  * trivial; data reads remain partition-pruned parquet scans (pass a
  * `partitionFilter` to [[read]] for dir-level pruning). The merge
  * itself reads only touched partitions, like the swap-commit form.
  */
object ManifestTable {

  private[ops] val ManifestDir = "_manifests"
  private val DataDir = "data"
  /** Conventional in-table location for [[ManifestTxn]] journals —
    * what [[fsck]] scans for crash residue. */
  private[ops] val TxnDir = "_txn"
  /** Manifest line key carrying the committed table schema (JSON).
    * Reserved — a real partition value can never collide with it
    * because partition values are stringified column values and this
    * name is not a legal date/number and is refused as exotic. */
  private val SchemaKey = "__schema__"
  /** Manifest line key carrying the commit wall-clock epoch-millis —
    * the [[readAsOf]] resolution key. Same reservation argument. */
  private val CommitKey = "__commit_ms__"
  /** Manifest line key carrying caller table properties (an encoded
    * k=v list) — committed ATOMICALLY with the data by living in the
    * same manifest, which is what makes them usable as transactional
    * watermarks (e.g. [[IncrementalAgg]]'s last-folded base version:
    * a crash between "agg data committed" and "state recorded" cannot
    * exist, because they are one rename). NOT carried forward — each
    * commit records its own; [[readProps]] resolves the latest. */
  private val PropsKey = "__props__"
  /** Manifest line key recording the table's partition column name.
    * Written by every commit since [[compact]] landed; readers need it
    * ONLY to row-filter a compacted (shared) data dir, so manifests
    * written before this key exist are still fully readable — they
    * cannot contain shared dirs. Same reservation argument. */
  private val PartitionColKey = "__partition_col__"
  private val Reserved = Set(SchemaKey, CommitKey, PropsKey, PartitionColKey)

  /** The committed partition-column name, if recorded. */
  private[ops] def partitionColOf(lines: Seq[(String, String)]): Option[String] =
    lines.collectFirst { case (PartitionColKey, c) => c }

  /** Is this relative data dir a [[compact]]-written SHARED dir? A
    * shared dir may hold several partitions' rows — and, because dirs
    * are immutable, it may also hold STALE rows of a partition a later
    * merge rewrote elsewhere. Readers must therefore always filter a
    * shared dir to the keys that CURRENTLY reference it; exclusive
    * `batch-` dirs hold exactly their one partition and never need a
    * filter. */
  private def isSharedDir(dir: String): Boolean = dir.startsWith(s"$DataDir/compact-")

  /** Read the rows belonging to manifest `keys` under a version's
    * `lines` — THE keyed read every partition-scoped consumer goes
    * through. Exclusive dirs scan plain and filter-free (the common
    * un-compacted layout pays nothing); each [[compact]]ed shared dir
    * is opened once and row-filtered to the requested keys that
    * CURRENTLY reference it — per dir, because an immutable shared dir
    * can hold stale rows of a key a later commit moved to another dir
    * (even to another shared dir, which is why one global key filter
    * would still double-read). `schemaOverride` lets a caller resolve
    * old dirs under a NEWER committed schema (the change-feed
    * contract); otherwise the lines' own committed schema applies.
    *
    * DELETION VECTORS: an entry carrying a `__dv` suffix item has
    * merge-on-read deletes pending — its rows anti-join the sidecar's
    * (file, row-position) set (a broadcast of the tiny DV, no shuffle)
    * before anything downstream sees them. Entries without a DV pay
    * NOTHING: the plain multi-dir scan is untouched. `withPos = true`
    * keeps the [[FileKeyCol]]/[[RowPosCol]] physical-address columns
    * in the output — the handle [[deleteWhereMoR]] uses to record new
    * positions. */
  private[ops] def readEntriesOf(spark: SparkSession, path: String,
                                 lines: Seq[(String, String)], keys: Set[String],
                                 schemaOverride: Option[org.apache.spark.sql.types.StructType] = None,
                                 withPos: Boolean = false): DataFrame = {
    val selected = dataEntries(lines).filter(e => keys(e._1))
    require(selected.nonEmpty, s"ManifestTable.readEntriesOf: no data dir under $path " +
      s"for keys ${keys.take(5).mkString(", ")}…")
    val schema = schemaOverride.orElse(committedSchema(lines))
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Column renames are metadata-only: files forever store their
    // CREATION-TIME (physical) names, and the rename.map property
    // maps current → physical. The scan requests the PHYSICAL schema
    // (so parquet matches fields by the names actually on disk) and
    // [[finish]] aliases back to current names at the end.
    val colmap = renameMapOf(propsOf(lines))
    def physOf(n: String): String = colmap.getOrElse(n, n)
    def rd(dirs: Seq[String]): DataFrame = {
      val rdr = schema match {
        case Some(s) if colmap.nonEmpty =>
          spark.read.schema(org.apache.spark.sql.types.StructType(
            s.fields.map(f => f.copy(name = physOf(f.name)))))
        case Some(s) => spark.read.schema(s)
        case None => spark.read
      }
      rdr.parquet(dirs.map(d => s"$path/$d"): _*)
    }
    // Catalyst-integrated data skipping: the scan is the same
    // HadoopFsRelation + ParquetFileFormat `spark.read.parquet`
    // builds, but over a [[GraftFileIndex]] that answers `listFiles`
    // from the manifest's per-dir zone maps / blooms — so a plain
    // `.where(col > x)` on the returned frame prunes whole dirs at
    // physical planning, with no explicit readSkipping call. The
    // legacy schemaless branch keeps the inferring reader.
    def listParquet(relDir: String): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(new Path(s"$path/$relDir")).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    // Manifest stats/bloom items are keyed by CURRENT column names
    // (rekeyItems at commit, renameColumn rewrites in place); the
    // scan's pushed dataFilters reference PHYSICAL attribute names —
    // re-key the metadata to match.
    def toPhys(m: GraftFileIndex.EntryMeta): GraftFileIndex.EntryMeta =
      if (colmap.isEmpty) m
      else m.copy(stats = m.stats.map { case (k, v) => physOf(k) -> v },
        blooms = m.blooms.map { case (k, v) => physOf(k) -> v },
        strStats = m.strStats.map { case (k, v) => physOf(k) -> v },
        nullCounts = m.nullCounts.map { case (k, v) => physOf(k) -> v },
        tokBlooms = m.tokBlooms.map { case (k, v) => physOf(k) -> v })
    def metasOf(entries: Seq[(String, String)]): Seq[GraftFileIndex.DirMeta] = {
      val main = entries.groupBy(e => dirOf(e._2)).toSeq.sortBy(_._1).map {
        case (d, es) =>
          GraftFileIndex.DirMeta(d, listParquet(d),
            es.map(e => toPhys(entryMetaOf(e._2)).copy(key = Some(e._1))))
      }
      val aux = entries.flatMap(e => auxRefsOf(e._2).map(_._2)).distinct.map { d =>
        GraftFileIndex.DirMeta(d, listParquet(d),
          Seq(GraftFileIndex.EntryMeta(Map.empty, Map.empty, prunable = false)))
      }
      main ++ aux
    }
    def rdIndexed(entries: Seq[(String, String)]): DataFrame = schema match {
      case Some(s) =>
        val phys =
          if (colmap.isEmpty) s
          else org.apache.spark.sql.types.StructType(
            s.fields.map(f => f.copy(name = physOf(f.name))))
        val idx = new GraftFileIndex(new Path(path), metasOf(entries),
          partitionColName = partitionColOf(lines),
          writerTz = propsOf(lines).get(PartitionTzProp))
        val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
          idx, org.apache.spark.sql.types.StructType(Nil), phys, None,
          new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
          Map.empty[String, String])(cs)
        cs.baseRelationToDataFrame(rel)
      case None =>
        rd((entries.map(e => dirOf(e._2)) ++
          entries.flatMap(e => auxRefsOf(e._2).map(_._2))).distinct)
    }
    // The physical row address: (last-3-segment file key, row index in
    // file). The file key `batch-<uuid>/__pdir=<v>/part-…` is unique
    // within a table (UUID dirs), and file NAME alone would not be —
    // one dynamic-partition write task emits the same part-NNNNN-uuid
    // name under several partition dirs.
    def withMeta(df: DataFrame): DataFrame = df
      .withColumn(FileKeyCol,
        concat_ws("/", slice(split(col("_metadata.file_path"), "/"), -3, 3)))
      .withColumn(RowPosCol, col("_metadata.row_index"))
    def applyDv(df: DataFrame, refs: Seq[String]): DataFrame =
      if (refs.isEmpty) df
      else {
        import spark.implicits._
        val pairs = refs.distinct.flatMap(rel => loadDv(fs, path, rel)).distinct
        val dvDf = pairs.toDF(DvFileCol, DvPosCol)
        df.join(broadcast(dvDf),
          df(FileKeyCol) === dvDf(DvFileCol) && df(RowPosCol) === dvDf(DvPosCol),
          "left_anti")
      }
    // One frame per dir group; every branch ends with the same column
    // list (schema under CURRENT names [+ the two pos columns]), so
    // the positional union below stays exact. The rename alias runs
    // LAST — metadata extraction and the DV anti-join need the scan
    // relation, and the row filter upstream uses the partition column
    // (never renamable, so physical == current for it).
    def renameToCurrent(df: DataFrame): DataFrame = (schema, colmap) match {
      case (Some(s), m) if m.nonEmpty =>
        val keep = df.columns.filter(c => c == FileKeyCol || c == RowPosCol)
        df.select(s.fields.map(f => col(physOf(f.name)).as(f.name)).toSeq ++
          keep.map(col): _*)
      case _ => df
    }
    def finish(df: DataFrame, refs: Seq[String], needMeta: Boolean): DataFrame = {
      val framed = renameToCurrent(if (needMeta) applyDv(withMeta(df), refs) else df)
      if (needMeta && !withPos) framed.drop(FileKeyCol, RowPosCol) else framed
    }
    val (shared, exclusive) = selected.partition(e => isSharedDir(dirOf(e._2)))
    val exDvRefs = exclusive.flatMap(e => dvRefOf(e._2).map(_._2))
    // Merge-on-read UPDATE appendices ride into the same scan: an
    // entry's `__aux` dirs hold rows of ITS partition only, so
    // [[metasOf]] adds them (unprunable) to the dir list of whichever
    // branch reads the entry (and the shared branch's partition-value
    // row filter passes them). The DV anti-join runs AFTER the union,
    // so positions recorded against aux files (a second update
    // superseding a first) resolve too.
    val exFrame =
      if (exclusive.isEmpty) Nil
      else Seq(finish(rdIndexed(exclusive),
        exDvRefs, needMeta = withPos || exDvRefs.nonEmpty))
    if (shared.isEmpty) exFrame.head
    else {
      val pcol = partitionColOf(lines).getOrElse(sys.error(
        s"ManifestTable: a shared (compacted) data dir under $path needs the " +
          s"$PartitionColKey manifest header to row-filter, and this manifest has " +
          "none — foreign tooling wrote a shared dir without the header"))
      val sharedFrames = shared.groupBy(e => dirOf(e._2)).toSeq.sortBy(_._1)
        .map { case (d, es) =>
          val refs = es.flatMap(e => dvRefOf(e._2).map(_._2))
          finish(rdIndexed(es).filter(col(pcol).cast("string")
            .isInCollection(es.map(_._1))), refs,
            needMeta = withPos || refs.nonEmpty)
        }
      // All branches resolve under ONE schema (compact refuses to run
      // on a schemaless legacy table), so a positional union is exact.
      (exFrame ++ sharedFrames).reduce(_.union(_))
    }
  }

  /** [[readEntriesOf]] against a retained `version` — the keyed read
    * the incremental-view maintainers use for their manifest diffs. */
  private[ops] def readKeys(spark: SparkSession, path: String, version: Long,
                            keys: Set[String]): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readEntriesOf(spark, path, readManifest(fs, path, version), keys)
  }

  /** Merge `incoming` into the manifest table at `path` with
    * [[Merge.upsert]] semantics per partition of `partitionCol`
    * (non-null values required — a null partition has no directory
    * name). Creates the table on first call. Only the partitions
    * present in `incoming` are read and re-written.
    *
    * `retainVersions` manifests (and every data dir any of them
    * references) survive each commit — the reader grace period AND
    * the time-travel horizon: [[readVersion]] can pin any retained
    * snapshot. The default keeps the new version plus one.
    *
    * CONTRACT: `partitionCol` must be STABLE per key (or derived from
    * the key, like a date column keyed by (entity, date)). The upsert
    * is partition-scoped, so if an incoming row moved a key to a
    * different partition value, the old copy — living in an untouched
    * partition that is never read — would survive alongside the new
    * one in the next snapshot. This is inherited from
    * [[MergeWriter.mergeIntoPartitioned]]'s swap-commit contract and
    * is the same restriction Hive-style static partition overwrite
    * carries. */
  def merge(spark: SparkSession, path: String, incoming: DataFrame,
            keys: Seq[String], partitionCol: String,
            preserveExisting: Seq[String] = Nil,
            retainVersions: Int = 2,
            statsColumns: Seq[String] = Nil,
            replaceTouched: Boolean = false,
            props: Map[String, String] = Map.empty,
            knownTouched: Option[Set[String]] = None,
            bloomColumns: Seq[String] = Nil,
            bloomBits: Int = 8192,
            tokenBloomColumns: Seq[String] = Nil,
            tokenBloomBits: Int = 16384,
            kmvColumns: Seq[String] = Nil,
            kmvK: Int = 256,
            sortWithinDirs: Seq[String] = Nil,
            sumColumns: Seq[String] = Nil): Unit =
    mergeCore(spark, path, incoming, keys, partitionCol, preserveExisting,
      retainVersions, statsColumns, replaceTouched, props, knownTouched,
      bloomColumns, bloomBits, bucketSpec = None,
      tokenBloomColumns = tokenBloomColumns, tokenBloomBits = tokenBloomBits,
      kmvColumns = kmvColumns, kmvK = kmvK, sortWithinDirs = sortWithinDirs,
      sumColumns = sumColumns)

  /** [[merge]] into a BUCKET-SPECCED manifest table: rows are written
    * pre-hashed into `nBuckets` files per partition dir on `bucketCol`
    * (and pre-sorted within each bucket), and the spec is committed as
    * table properties — so [[registerBucketed]] can expose the table
    * to Spark's catalog bucketed scan and a co-bucketed fact⋈fact
    * manifest join plans with NO exchange ([[Bucketed.noShuffleJoin]]'s
    * SMB contract, extended to manifest tables; the r11 gap where
    * shuffle-free joins existed only for catalog `bucketBy` tables).
    *
    * The spec is fixed at table creation; every later batch must
    * declare the same (bucketCol, nBuckets). Other DML (plain merge,
    * delete/update in either form, compact) REFUSES on a bucketed
    * table — each would write non-bucketed files or detach rows from
    * their hash bucket, silently degrading every later join back to a
    * shuffle. Re-spec = [[repartitionTable]]-style rewrite under a new
    * path. */
  def mergeBucketed(spark: SparkSession, path: String, incoming: DataFrame,
                    keys: Seq[String], partitionCol: String,
                    bucketCol: String, nBuckets: Int,
                    preserveExisting: Seq[String] = Nil,
                    retainVersions: Int = 2,
                    statsColumns: Seq[String] = Nil,
                    replaceTouched: Boolean = false,
                    knownTouched: Option[Set[String]] = None,
                    bloomColumns: Seq[String] = Nil,
                    bloomBits: Int = 8192): Unit = {
    require(nBuckets >= 1, s"ManifestTable.mergeBucketed: nBuckets must be >= 1, got $nBuckets")
    require(bucketCol != partitionCol,
      "ManifestTable.mergeBucketed: bucketCol must differ from partitionCol " +
        "(partition pruning already covers the partition column)")
    require(incoming.columns.contains(bucketCol),
      s"ManifestTable.mergeBucketed: incoming has no column $bucketCol")
    val existing = readProps(spark, path)
    bucketSpecOf(existing).foreach { case (c, n) =>
      require(c == bucketCol && n == nBuckets,
        s"ManifestTable.mergeBucketed: table is bucketed by ($c, $n), " +
          s"got ($bucketCol, $nBuckets) — the spec is fixed at creation")
    }
    mergeCore(spark, path, incoming, keys, partitionCol, preserveExisting,
      retainVersions, statsColumns, replaceTouched,
      existing ++ Map(BucketColProp -> bucketCol, BucketNProp -> nBuckets.toString),
      knownTouched, bloomColumns, bloomBits,
      bucketSpec = Some((bucketCol, nBuckets)))
  }

  private def mergeCore(spark: SparkSession, path: String, incoming: DataFrame,
                        keys: Seq[String], partitionCol: String,
                        preserveExisting: Seq[String],
                        retainVersions: Int,
                        statsColumns: Seq[String],
                        replaceTouched: Boolean,
                        props: Map[String, String],
                        knownTouched: Option[Set[String]],
                        bloomColumns: Seq[String],
                        bloomBits: Int,
                        bucketSpec: Option[(String, Int)],
                        tokenBloomColumns: Seq[String] = Nil,
                        tokenBloomBits: Int = 16384,
                        kmvColumns: Seq[String] = Nil,
                        kmvK: Int = 256,
                        sortWithinDirs: Seq[String] = Nil,
                        sumColumns: Seq[String] = Nil): Unit = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireBucketAgreement(spark, path, bucketSpec, "merge")
    // Rename support: the batch is written under PHYSICAL names (so
    // all dirs stay uniform forever) and the map is carried forward —
    // per-commit props semantics would silently drop it. The same
    // carry-forward applies to every durable table-state prop (see
    // DurablePropKeys): tombstones, bucket spec, partition transform,
    // stream watermark all outlive the commit that wrote them.
    val prevProps = readProps(spark, path)
    val colmap = renameMapOf(prevProps)
    require(bucketSpec.isEmpty || colmap.isEmpty,
      "ManifestTable.mergeBucketed: refusing on a table with renamed columns " +
        "(the catalog registration binds columns by name)")
    val physNames = colmap.values.toSet
    val colliding = incoming.columns.filterNot(colmap.contains).filter(physNames)
    require(colliding.isEmpty,
      s"ManifestTable.merge: column(s) ${colliding.mkString(", ")} collide with " +
        "the physical (file) name of a renamed column — pick another name")
    // Timestamp-typed partition keys: stamp the writer's session zone
    // as the parse-back certificate ([[PartitionTzProp]]); a session
    // whose zone differs from the recorded one REFUSES — its key text
    // would interleave two renderings on one table. The stamp lands
    // ONLY on the table-CREATING merge (no prior manifest): a table
    // that predates the certificate may hold key text rendered in a
    // zone this session cannot know, and stamping the CURRENT zone
    // retroactively would certify a fiction the per-key round-trip
    // check cannot detect (any fixed-offset zone round-trips its own
    // rendering). Legacy tables stay UNCERTIFIED — readers refuse the
    // metadata fast paths safely — until an operator attests the
    // writer zone via [[certifyPartitionTz]].
    val tzProps: Map[String, String] =
      incoming.schema.find(_.name == partitionCol).map(_.dataType) match {
        case Some(org.apache.spark.sql.types.TimestampType) =>
          val tz = spark.sessionState.conf.sessionLocalTimeZone
          prevProps.get(PartitionTzProp) match {
            case Some(rec) =>
              require(rec == tz,
                s"ManifestTable.merge: timestamp partition keys under $path were " +
                  s"rendered in zone $rec; this session writes in $tz — set " +
                  s"spark.sql.session.timeZone=$rec (mixed-zone key text is unsound)")
              Map(PartitionTzProp -> tz)
            case None if latestVersion(fs, path).isEmpty =>
              Map(PartitionTzProp -> tz)
            case None => Map.empty
          }
        case _ => Map.empty
      }
    val effProps = durablePropsOf(prevProps) ++ tzProps ++
      (if (colmap.isEmpty) Map.empty[String, String]
       else Map(RenameMapProp -> encodeRenameMap(colmap))) ++ props ++
      (if (sortWithinDirs.isEmpty) Map.empty[String, String]
       else Map(SortColsProp -> sortWithinDirs.mkString(",")))
    // Effective write sort order: this merge's declaration, else the
    // committed durable one — every writer keeps the layout contract.
    val effSort = sortColsOf(effProps)
    require(effSort.isEmpty || bucketSpec.isEmpty,
      "ManifestTable.merge: sortWithinDirs and a bucket spec are exclusive — " +
        "the bucketed writer already sorts within buckets via sortBy")
    // A DECLARING merge must carry its sort columns (clearer refusal
    // than planMerge's generic one); an INHERITED order needs no
    // check — additive-only evolution means every batch carries every
    // existing table column, the sort column included.
    sortWithinDirs.foreach(c => require(incoming.columns.contains(c),
      s"ManifestTable.merge: sort column $c is not in the incoming batch"))

    // Affected-partition pruning: tiny bounded collect (distinct
    // partition values of one batch), same as the swap-commit form —
    // skipped when the caller DECLARES the window (commit-checked,
    // see TableMerge.knownTouched).
    val touched = validateTouched(knownTouched.getOrElse(incoming
      .select(col(partitionCol).cast("string").as("__p")).distinct()
      .collect().map(r => Option(r.getString(0)).getOrElse(
        sys.error(s"ManifestTable.merge: null $partitionCol value in incoming"))).toSet))
    val plan = planMerge(spark, fs, path, incoming, keys, preserveExisting, touched,
      replaceTouched)

    // New data dirs, invisible until the manifest rename below. The
    // repartition gives each partition dir ONE file per batch (see
    // mergeMany's write for the small-files rationale). Bucketed
    // tables instead write through a throwaway catalog table —
    // `bucketBy` is the only writer that stamps bucket ids into file
    // names, which is where Spark's bucketed scan reads them back —
    // repartitioned on the bucket hash so each (dir, bucket) is one
    // file; the external table is dropped immediately (files stay).
    val batch = s"$DataDir/batch-${java.util.UUID.randomUUID()}"
    bucketSpec match {
      case None =>
        val shaped = toPhysical(plan.merged, colmap)
          .withColumn("__pdir", col(partitionCol).cast("string"))
          .repartition(col("__pdir"))
        // Durable write sort order: rows sort by (__pdir, sort cols)
        // within each task so every file's ROW GROUPS carry tight,
        // disjoint sort-column footer ranges — parquet row-group
        // pushdown then skips inside the dirs dir-pruning keeps.
        val ordered =
          if (effSort.isEmpty) shaped
          else shaped.sortWithinPartitions(
            (col("__pdir") +: effSort.map(c => col(colmap.getOrElse(c, c)))): _*)
        ordered.write.partitionBy("__pdir").parquet(s"$path/$batch")
      case Some((c, n)) =>
        val tmp = "graft_mbkt_w_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        spark.sql(s"DROP TABLE IF EXISTS `$tmp`")
        plan.merged.withColumn("__pdir", col(partitionCol).cast("string"))
          .repartition(n, col(c))
          .write.format("parquet").partitionBy("__pdir")
          .bucketBy(n, c).sortBy(c)
          .option("path", s"$path/$batch")
          .saveAsTable(tmp)
        spark.sql(s"DROP TABLE `$tmp`")
    }
    val newEntries = listPartitionDirs(fs, s"$path/$batch").map { name =>
      unescapePathName(name.stripPrefix("__pdir=")) -> s"$batch/$name"
    }
    // Bloom index build reads the JUST-WRITTEN batch back (a
    // column-pruned scan of only partitionCol + the bloom columns) —
    // cheaper than re-evaluating the merge plan a second time. An
    // EMPTY batch (e.g. a delete that dropped every touched partition
    // wholesale) wrote no parquet files, so there is nothing to read
    // — and nothing to index.
    // The batch on disk carries PHYSICAL names: probe/collect under
    // those, then re-key the committed items to CURRENT names (the
    // names zone-map/bloom lookups use).
    val physToCur = colmap.map(_.swap)
    // CHECK-constraint enforcement ([[addConstraint]]): validate the
    // just-written batch — the only rows whose values are new — under
    // CURRENT names, BEFORE anything commits. A refusal leaves the
    // batch dir as unreferenced residue the next merge sweeps.
    if (newEntries.nonEmpty && constraintsOf(effProps).nonEmpty) {
      val b = spark.read.parquet(s"$path/$batch")
      val curNames = b.columns.filterNot(_ == "__pdir")
        .map(c => col(c).as(physToCur.getOrElse(c, c)))
      checkConstraints(b.select(curNames.toSeq: _*), effProps, "merge")
    }
    def collected(cols: Seq[String])
                 (build: Seq[String] => Map[String, Seq[String]]): Map[String, Seq[String]] =
      if (cols.isEmpty || newEntries.isEmpty) Map.empty[String, Seq[String]]
      else build(cols.map(c => colmap.getOrElse(c, c)))
        .view.mapValues(items => rekeyItems(items, physToCur)).toMap
    lazy val batchDf = spark.read.parquet(s"$path/$batch")
    val blooms = collected(bloomColumns)(
      cs => collectBlooms(batchDf, partitionCol, cs, bloomBits))
    val tokItems = collected(tokenBloomColumns)(
      cs => collectTokenBlooms(batchDf, partitionCol, cs, tokenBloomBits))
    val kmvItems = collected(kmvColumns)(
      cs => collectKmv(batchDf, partitionCol, cs, kmvK))
    val sumItems = collected(sumColumns)(
      cs => collectSums(batchDf, partitionCol, cs))
    val indexItems = (blooms.toSeq ++ tokItems.toSeq ++ kmvItems.toSeq ++
        sumItems.toSeq)
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSeq).toMap
    commitPlan(fs, plan, partitionCol, newEntries, retainVersions,
      statsColumns.map(c => colmap.getOrElse(c, c)), effProps, indexItems, physToCur)
  }

  /** One incoming batch per table (a [[mergeMany]] element): the table
    * lives at `<base>/<name>`, carrying [[merge]]'s per-table contract
    * (stable partition per key, additive-only schema evolution).
    *
    * `knownTouched` is the replaceWhere-style fast path: an ingest
    * job that KNOWS its batch's partition window (a daily cron's date
    * range, a fixed bucket set) declares it and skips the
    * touched-partition discovery job entirely. It is SAFE to get
    * wrong: the commit cross-checks the declared set against the
    * partitions the batch actually wrote and refuses to commit on any
    * mismatch — a declared-but-absent partition and an
    * undeclared-but-present one both fail loudly before the manifest
    * rename, so an incorrect declaration can never mis-merge. */
  final case class TableMerge(name: String, incoming: DataFrame,
                              keys: Seq[String], partitionCol: String,
                              preserveExisting: Seq[String] = Nil,
                              knownTouched: Option[Set[String]] = None,
                              statsColumns: Seq[String] = Nil,
                              replaceTouched: Boolean = false,
                              props: Map[String, String] = Map.empty)

  /** Merge several tables' batches with ONE touched-partition job and
    * ONE Spark write job covering every table — the multi-table form
    * of [[merge]] for pipelines that land N tables per run (the ETL's
    * assets/prices/daily triple). Per-table COMMITS stay individual
    * manifest renames — each table is atomically old-or-new, but the
    * run as a whole is not a cross-table transaction (a crash between
    * renames leaves earlier tables committed; re-running the same
    * batches is idempotent, which is the recovery story).
    *
    * Mechanics: the per-table MERGED frames are tagged with their
    * table name and union'd (by name, missing columns null — they
    * never collide because each table reads back under its OWN
    * committed schema), written once partitioned by
    * `(__tbl, __pdir)` to a staging dir, then each `__tbl=<name>`
    * subtree is RENAMED into that table's conventional
    * `data/batch-<uuid>` location — a metadata move, no data copy —
    * so manifests, readers, retention and cleanup are exactly the
    * single-table code paths. Cuts a 3-table run from 6 Spark jobs
    * (distinct+write per table) to 2; at scale the win is the write
    * job's fixed overhead (driver scheduling, commit protocol), which
    * this amortizes N× per run. */
  def mergeMany(spark: SparkSession, base: String, tables: Seq[TableMerge],
                retainVersions: Int = 2): Unit = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    require(tables.nonEmpty, "ManifestTable.mergeMany: no tables")
    require(tables.map(_.name).distinct.size == tables.size,
      s"ManifestTable.mergeMany: duplicate table names in ${tables.map(_.name)}")
    tables.foreach(t => require(t.name.nonEmpty && t.name.head.isLetterOrDigit &&
      t.name.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"ManifestTable.mergeMany: table name '${t.name}' must be [A-Za-z0-9][A-Za-z0-9_.-]* " +
        "(it becomes a partition directory name, and a leading underscore would " +
        "collide with the _staging-* residue sweep)"))
    // Same-named columns across tables must agree on dtype or the
    // union below would mis-type one side; refuse loudly up front.
    tables.flatMap(t => t.incoming.schema.fields.map(f => (f.name, f.dataType, t.name)))
      .groupBy(_._1).foreach { case (cname, occ) =>
        require(occ.map(_._2).distinct.size == 1,
          s"ManifestTable.mergeMany: column $cname has conflicting types across tables " +
            occ.map(o => s"${o._3}:${o._2.simpleString}").mkString(", "))
      }
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    tables.foreach { t =>
      requireBucketAgreement(spark, s"$base/${t.name}", None, "mergeMany")
      require(renameMapOf(readProps(spark, s"$base/${t.name}")).isEmpty,
        s"ManifestTable.mergeMany: table ${t.name} has renamed columns — " +
          "merge it individually (the staged multi-table write cannot apply " +
          "per-table physical-name mappings)")
    }

    // Sweep residue of a CRASHED earlier mergeMany: its staging dir
    // sits under `base` (outside any table path), so the per-table
    // orphan cleanup never sees it. Nothing references a staging dir
    // until its renames run, so a survivor is dead weight — the
    // multi-table analog of the batch-dir orphan sweep, and it gets
    // the SAME [[OrphanGraceMs]] modification-time grace: single-
    // writer is the documented contract, but if a rival mergeMany IS
    // in flight on this base, deleting its staging mid-write would
    // fail its renames non-retryably — the grace keeps the sweep
    // consistent with the commit-level concurrency protections.
    val now = System.currentTimeMillis()
    if (fs.exists(new Path(base)))
      fs.listStatus(new Path(base))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("_staging-") &&
          now - st.getModificationTime >= OrphanGraceMs)
        .foreach(st => fs.delete(st.getPath, true))

    // ONE job for every table's touched-partition distinct — and only
    // for the tables that did NOT declare `knownTouched` (declared
    // sets are commit-checked, not trusted; see TableMerge). The
    // per-table distincts never collide across the union because the
    // table-name tag differs.
    val undeclared = tables.filter(_.knownTouched.isEmpty)
    val touchedRows =
      if (undeclared.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else undeclared.map(t =>
          t.incoming.select(lit(t.name).as("__t"),
            col(t.partitionCol).cast("string").as("__p")).distinct())
        .reduce(_ unionAll _).collect()
    val touchedByTable: Map[String, Set[String]] = tables.map { t =>
      t.name -> validateTouched(t.knownTouched.getOrElse(
        touchedRows.iterator.filter(_.getString(0) == t.name)
          .map(r => Option(r.getString(1)).getOrElse(
            sys.error(s"ManifestTable.merge: null ${t.partitionCol} value in incoming")))
          .toSet))
    }.toMap

    val plans = tables.map(t => t -> planMerge(spark, fs, s"$base/${t.name}",
      t.incoming, t.keys, t.preserveExisting, touchedByTable(t.name), t.replaceTouched))

    // ONE write job covering every table's merged batch. The
    // repartition aligns write tasks with partition dirs: each
    // (table, partition) lands in exactly one task, so every dir gets
    // ONE parquet file instead of one per upstream shuffle partition —
    // the small-files discipline. (A single partition too large for
    // one task would add a salt column here; daily/bucketed partitions
    // at batch granularity stay well under that.)
    val staging = s"$base/_staging-${java.util.UUID.randomUUID()}"
    plans.map { case (t, p) =>
        p.merged.withColumn("__tbl", lit(t.name))
          .withColumn("__pdir", col(t.partitionCol).cast("string"))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      .repartition(col("__tbl"), col("__pdir"))
      .write.partitionBy("__tbl", "__pdir").parquet(staging)

    try plans.foreach { case (t, plan) =>
      val src = new Path(s"$staging/__tbl=${t.name}")
      val batch = s"$DataDir/batch-${java.util.UUID.randomUUID()}"
      val newEntries =
        if (!fs.exists(src)) Nil // empty batch for this table
        else {
          val dest = new Path(s"${plan.path}/$batch")
          fs.mkdirs(dest.getParent)
          require(fs.rename(src, dest),
            s"ManifestTable.mergeMany: staging rename $src -> $dest failed")
          listPartitionDirs(fs, dest.toString).map { name =>
            unescapePathName(name.stripPrefix("__pdir=")) -> s"$batch/$name"
          }
        }
      val tProps = durablePropsOf(readProps(spark, plan.path)) ++ t.props
      // The staged batch is validated under PHYSICAL column names
      // (no physToCur re-keying on this path) — sound ONLY because
      // rename-mapped tables are refused up front AND `t.props`
      // cannot smuggle a mapping in: enforce the assumption on the
      // EFFECTIVE props, so if TableMerge ever grows rename support
      // this fails loudly instead of resolving the wrong column.
      require(renameMapOf(tProps).isEmpty,
        s"ManifestTable.mergeMany: table ${t.name} carries a rename map in its " +
          "effective props — the multi-table staged write validates and lands " +
          "batches under physical names; merge it individually")
      // CHECK constraints hold on the multi-table path too — each
      // table's batch validates against ITS constraints before ITS
      // commit. A refusal mid-loop leaves earlier tables committed
      // and later ones untouched (mergeMany's commits are per-table
      // sequential — the same partial-progress window a crash between
      // commits has; wrap in ManifestTxn for all-or-nothing).
      if (newEntries.nonEmpty && constraintsOf(tProps).nonEmpty)
        checkConstraints(spark.read.parquet(s"${plan.path}/$batch").drop("__pdir"),
          tProps, "mergeMany")
      commitPlan(fs, plan, t.partitionCol, newEntries, retainVersions, t.statsColumns,
        tProps)
    } finally fs.delete(new Path(staging), true)
  }

  /** A planned single-table merge: everything [[merge]] derives before
    * its batch write, so [[mergeMany]] can share one write job across
    * tables and still commit each through the identical path. */
  private final case class MergePlan(path: String, current: Option[Long],
                                     oldEntries: Seq[(String, String)],
                                     touched: Set[String], merged: DataFrame,
                                     nextSchemaJson: String,
                                     replaceTouched: Boolean = false)

  /** Refuse a frame whose `keys` are not unique — the guard the
    * conditional-merge family shares ([[mergeInto]], [[Scd2]],
    * [[IncrementalJoin]]'s dim): a duplicate key fans a keyed
    * full-outer join out into duplicate rows, which no downstream
    * check can attribute. One bounded aggregate (first offender). */
  private[ops] def requireUniqueKeys(df: DataFrame, keys: Seq[String],
                                     what: String): Unit = {
    val dup = df.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty, s"$what: duplicate key " +
      s"(${keys.zip(dup.headOption.map(_.toSeq.init).getOrElse(Nil))
        .map { case (k, v) => s"$k=$v" }.mkString(", ")}) — " +
      "keys must be unique or the keyed join fans out")
  }

  /** Manifest lines are `key\tdir\n` — a key carrying either control
    * character would corrupt the file's structure. Date/numeric
    * partition values never do; refuse the exotic string case loudly. */
  private def validateTouched(touched: Set[String]): Set[String] = {
    touched.find(k => k.contains('\t') || k.contains('\n')).foreach(k =>
      sys.error(s"ManifestTable.merge: partition value ${k.replace("\t", "\\t")
        .replace("\n", "\\n")} contains a tab/newline — not manifest-encodable"))
    Reserved.foreach(k => require(!touched(k),
      s"ManifestTable.merge: partition value '$k' collides with a reserved manifest key"))
    touched
  }

  private def planMerge(spark: SparkSession, fs: FileSystem, path: String,
                        incoming: DataFrame, keys: Seq[String],
                        preserveExisting: Seq[String],
                        touched: Set[String],
                        replaceTouched: Boolean = false): MergePlan = {
    val current = latestVersion(fs, path)
    val oldLines = current.map(v => readManifest(fs, path, v)).getOrElse(Nil)
    val oldEntries = dataEntries(oldLines)
    val prevSchema = committedSchema(oldLines)
    val touchedKeys = oldEntries.map(_._1).filter(touched).toSet
    // SCHEMA EVOLUTION (additive): a merge may ADD nullable columns.
    // The touched partitions are read under the previously COMMITTED
    // schema (absent columns fill as null — handles partitions written
    // before an earlier widening without a mergeSchema footer sweep),
    // then widened to the incoming batch's new columns so the upsert
    // sees aligned frames. Dropping or RETYPING a column is refused
    // loudly — by NAME AND DTYPE, and also on new-partition-only
    // batches (no touched dirs), which would otherwise commit a
    // narrowed/retyped schema that silently projects away or bricks
    // the untouched partitions.
    // The keyed read: under the previously committed schema, each
    // referenced dir opened once, row-filtered if a dir is shared
    // with an untouched key (a compacted dir).
    val existingOpt =
      if (touchedKeys.isEmpty) None
      else Some(readEntriesOf(spark, path, oldLines, touchedKeys))
    // The schema the table already has, whenever one is knowable:
    // the committed schema, else (legacy manifests) the touched dirs'
    // self-described schema, else — for a legacy table touched only on
    // NEW partitions — ONE old data dir's parquet footer (a cheap
    // single-dir read). Without that last arm the drop/retype guard
    // would be skipped and the incoming batch's schema committed as
    // authoritative, deterministically projecting away any column the
    // old partitions carry on every subsequent read.
    val baseline: Option[org.apache.spark.sql.types.StructType] =
      prevSchema.orElse(existingOpt.map(_.schema))
        .orElse(oldEntries.headOption.map { case (_, value) =>
          spark.read.parquet(s"$path/${dirOf(value)}").schema
        })
    baseline.foreach { base =>
      val dropped = base.fieldNames.filterNot(incoming.columns.contains)
      require(dropped.isEmpty, "ManifestTable.merge: incoming batch is missing table " +
        s"column(s) ${dropped.mkString(", ")} — only additive schema evolution is supported")
      // A column ADDED by this batch must not resolve to a TOMBSTONED
      // physical field (a previous dropColumn): retained dirs still
      // store the dead values under that name, and re-adding would
      // resurrect them on every old-dir read.
      val tombs = tombstonesOf(propsOf(oldLines))
      if (tombs.nonEmpty) {
        val map0 = renameMapOf(propsOf(oldLines))
        val readded = incoming.columns.filterNot(base.fieldNames.contains)
          .filter(c => tombs.contains(map0.getOrElse(c, c)))
        require(readded.isEmpty, s"ManifestTable.merge: column(s) " +
          s"${readded.mkString(", ")} were previously DROPPED — retained data " +
          "dirs still store the old values under that physical field, and " +
          "re-adding would resurrect them; add the data under a different " +
          "column name (renameColumn can restore the desired name later)")
      }
      base.fields.foreach { f =>
        val inDt = incoming.schema(f.name).dataType
        require(inDt == f.dataType, s"ManifestTable.merge: column ${f.name} retyped " +
          s"${f.dataType.simpleString} -> ${inDt.simpleString} — only additive schema " +
          "evolution is supported (untouched partitions cannot be read under the new type)")
      }
    }
    // replaceTouched = static partition overwrite (replaceWhere): the
    // incoming batch IS the new content of its partitions — no upsert
    // against existing rows, which is also the only way a row can be
    // DELETED from this table format. Schema evolution guards above
    // still apply (untouched partitions must stay readable).
    val merged = existingOpt match {
      case _ if replaceTouched => incoming
      case None => incoming
      case Some(existing) =>
        val added = incoming.columns.filterNot(existing.columns.contains)
        val widened = added.foldLeft(existing)((df, c) =>
          df.withColumn(c, lit(null).cast(incoming.schema(c).dataType)))
        Merge.upsert(widened, incoming, keys, preserveExisting)
    }
    // The committed schema: previous column order first, additions at
    // the end; a column any retained data dir may lack is forced
    // nullable so old-version readers still resolve it (as null). A
    // legacy table (committed pre-schema-tracking) gets every field
    // forced nullable — the conservative choice when the set of dirs
    // that might lack a column is unknowable.
    val nextSchema: org.apache.spark.sql.types.StructType = baseline match {
      case Some(base) =>
        val addedFields = merged.schema.fields
          .filterNot(f => base.fieldNames.contains(f.name))
          .map(_.copy(nullable = true))
        org.apache.spark.sql.types.StructType(
          base.fields.map { f =>
            f.copy(nullable = f.nullable || merged.schema(f.name).nullable)
          } ++ addedFields)
      case None if current.isDefined =>
        org.apache.spark.sql.types.StructType(
          merged.schema.fields.map(_.copy(nullable = true)))
      case None => merged.schema
    }
    MergePlan(path, current, oldEntries, touched, merged, nextSchema.json, replaceTouched)
  }

  /** Leaf `__pdir=` partition directory names of a written batch dir,
    * sorted by partition value. */
  private def listPartitionDirs(fs: FileSystem, batchDir: String): Seq[String] =
    fs.listStatus(new Path(batchDir))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__pdir="))
      .map(_.getPath.getName).toSeq.sorted

  // ------------------------------------------------------------------
  // ZONE-MAP DATA SKIPPING (r11). When a merge declares
  // `statsColumns`, the commit reads the just-written parquet FOOTERS
  // (driver-side metadata, no Spark job) and records per-partition
  // min/max for those columns as a third tab field on the manifest
  // line: `<pvalue>\t<dir>\t<col>=<kind>:<min>:<max>;…`. Untouched
  // partitions carry their stats forward verbatim (the entry value
  // moves whole through the commit), so one statsful writer makes the
  // whole table skippable over time. [[readSkipping]] then prunes at
  // the DIRECTORY level on a value range — the layer below partition
  // pruning that makes a 100 TB scan touch only the files whose range
  // intersects the predicate (Delta/Iceberg's file-stats skipping in
  // miniature). Fail-safe by construction: a column with no recorded
  // stats (older commits, unsupported physical type, a file whose
  // footer lacks them) is never skipped on.
  //
  // Only physical types whose footer min/max order matches the SQL
  // value order are recorded: INT32/INT64 (incl. timestamp micros —
  // bounds are then raw micros), FLOAT, DOUBLE. Decimals (unscaled
  // ints), strings (unsigned-byte vs UTF-16 collation mismatch), and
  // nested types are skipped — unrecordable, so unprunable, so safe.
  // ------------------------------------------------------------------

  /** Split a manifest entry value into its data dir and optional
    * encoded stats (the value is `dir` or `dir\tstats`). */
  private[ops] def dirOf(entryValue: String): String = {
    val i = entryValue.indexOf('\t')
    if (i < 0) entryValue else entryValue.substring(0, i)
  }

  private[ops] def statsOf(entryValue: String): Option[String] = {
    val i = entryValue.indexOf('\t')
    if (i < 0) None else Some(entryValue.substring(i + 1))
  }

  /** Decode `col=kind:min:max;…` to per-column numeric bounds (kind
    * `n`; string zone maps — kind `s` — decode via
    * [[decodeStrStats]]). */
  private[ops] def decodeStats(stats: String): Map[String, (BigDecimal, BigDecimal)] =
    stats.split(';').iterator.filter(_.nonEmpty).flatMap { part =>
      val eq = part.indexOf('=')
      if (eq < 0) None
      else part.substring(eq + 1).split(':') match {
        case Array(k, mn, mx) if k != StrStatKind =>
          try Some(part.substring(0, eq) -> (BigDecimal(mn), BigDecimal(mx)))
          catch { case _: NumberFormatException => None }
        case _ => None
      }
    }.toMap

  /** Decode kind-`s` items (`col=s:<b64min>:<b64max>`) to per-column
    * ASCII string bounds. */
  private[ops] def decodeStrStats(stats: String): Map[String, (String, String)] =
    stats.split(';').iterator.filter(_.nonEmpty).flatMap { part =>
      val eq = part.indexOf('=')
      if (eq < 0) None
      else part.substring(eq + 1).split(':') match {
        case Array(StrStatKind, mn, mx) =>
          try {
            val d = java.util.Base64.getDecoder
            Some(part.substring(0, eq) ->
              (new String(d.decode(mn), java.nio.charset.StandardCharsets.UTF_8),
               new String(d.decode(mx), java.nio.charset.StandardCharsets.UTF_8)))
          } catch { case _: IllegalArgumentException => None }
        case _ => None
      }
    }.toMap

  /** An entry's skipping metadata for [[GraftFileIndex]]: numeric
    * zone-map bounds and bloom payloads split out of the stats string,
    * with aux-carrying entries marked unprunable (an update appendix
    * may hold values outside the recorded bounds — the rule
    * [[readSkipping]]/[[readSkippingEquals]] already apply). */
  private[ops] def entryMetaOf(entryValue: String): GraftFileIndex.EntryMeta = {
    val items = statsOf(entryValue).map(_.split(';').toSeq).getOrElse(Nil)
    val blooms = items.iterator.filter(_.contains(s"$BloomTag=")).map { item =>
      val i = item.indexOf(s"$BloomTag=")
      item.substring(0, i) -> item.substring(i + BloomTag.length + 1)
    }.toMap
    val tokBlooms = items.iterator.filter(_.contains(s"$TokBloomTag=")).map { item =>
      val i = item.indexOf(s"$TokBloomTag=")
      item.substring(0, i) -> item.substring(i + TokBloomTag.length + 1)
    }.toMap
    val nulls = items.iterator.filter(_.contains(s"$NullsTag=")).flatMap { item =>
      val i = item.indexOf(s"$NullsTag=")
      try Some(item.substring(0, i) -> item.substring(i + NullsTag.length + 1).toLong)
      catch { case _: NumberFormatException => None }
    }.toMap
    val rows = items.collectFirst {
      case it if it.startsWith(s"$RowCountKey=") =>
        it.substring(RowCountKey.length + 1).toLong
    }
    val sums = items.iterator.filter(_.contains(s"$SumTag=")).flatMap { item =>
      val i = item.indexOf(s"$SumTag=")
      try Some(item.substring(0, i) ->
        BigInt(item.substring(i + SumTag.length + 1)))
      catch { case _: NumberFormatException => None }
    }.toMap
    val zoneItems = items.iterator
      .filterNot(it => it.contains(s"$BloomTag=") || it.contains(s"$NullsTag=") ||
        it.contains(s"$TokBloomTag=") || it.contains(s"$KmvTag=") ||
        it.contains(s"$SumTag="))
      .mkString(";")
    val (stats, strStats) = zoneItems match {
      case "" => (Map.empty[String, (BigDecimal, BigDecimal)],
        Map.empty[String, (String, String)])
      case s => (decodeStats(s), decodeStrStats(s))
    }
    GraftFileIndex.EntryMeta(stats, blooms,
      prunable = auxRefsOf(entryValue).isEmpty,
      strStats = strStats, nullCounts = nulls, rowCount = rows,
      tokBlooms = tokBlooms, sums = sums)
  }

  /** Merge footer min/max AND null counts for `cols` across every
    * parquet file of `absDir`. A zone map is recorded only if EVERY
    * file has usable stats for it under a supported physical type —
    * anything less and skipping on it could drop rows. Numeric
    * columns (ints, floats, dates, micros timestamps) record kind-`n`
    * bounds; STRING columns record kind-`s` bounds when both footer
    * bounds are pure printable ASCII (where the footer's UTF-8 byte
    * order agrees with Java string order — non-ASCII bounds are
    * skipped rather than risking an order mismatch; truncated footer
    * bounds are already supersets, so they stay exclusion-safe). Null
    * counts (`col!nulls=<n>`) record independently of the zone map —
    * an all-null file has no min/max but a perfectly good null count
    * — and power `IS [NOT] NULL` dir pruning. */
  private def collectStats(fs: FileSystem, absDir: String,
                           cols: Seq[String]): Option[String] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val files = fs.listStatus(new Path(absDir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty) return None
    // per col: zone accumulator (Left = numeric, Right = string) and
    // null-count accumulator; None value = poisoned
    type Zone = Either[(BigDecimal, BigDecimal), (String, String)]
    val acc = scala.collection.mutable.Map.empty[String, Option[Zone]]
    val nulls = scala.collection.mutable.Map.empty[String, Option[Long]]
    var totalRows = 0L // footer block row counts — free while we're here
    def ascii(s: String): Boolean = s.forall(c => c >= 0x20 && c < 0x7f)
    files.foreach { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, fs.getConf))
      try {
        val blocks = reader.getFooter.getBlocks
        blocks.forEach(b => totalRows += b.getRowCount)
        cols.foreach { c =>
          var fileZone: Option[Zone] = None
          var zoneOk = true
          var fileNulls = 0L
          var nullsOk = true
          var seen = false
          blocks.forEach { b =>
            b.getColumns.forEach { cc =>
              if (cc.getPath.toDotString == c) {
                seen = true
                val pt = cc.getPrimitiveType
                val logical = pt.getLogicalTypeAnnotation
                val isString = logical.isInstanceOf[org.apache.parquet.schema
                  .LogicalTypeAnnotation.StringLogicalTypeAnnotation] &&
                  pt.getPrimitiveTypeName == BINARY
                // Timestamp bounds are interpreted as epoch MICROS by
                // the pruning side (GraftFileIndex's numOf/dayMicros/
                // truncBounds) — the session's pinned writer unit. A
                // dir from a foreign writer in MILLIS/NANOS would be
                // off by 1000x and silently drop matching dirs, so any
                // other unit poisons instead of recording.
                val tsMicros = logical match {
                  case t: org.apache.parquet.schema
                    .LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                    t.getUnit == org.apache.parquet.schema
                      .LogicalTypeAnnotation.TimeUnit.MICROS
                  case _ => false
                }
                val numericLogical = logical == null || tsMicros ||
                  logical.isInstanceOf[org.apache.parquet.schema
                    .LogicalTypeAnnotation.IntLogicalTypeAnnotation] ||
                  logical.isInstanceOf[org.apache.parquet.schema
                    .LogicalTypeAnnotation.DateLogicalTypeAnnotation]
                // decimal(≤18) stores as INT32/INT64 of the UNSCALED
                // value — recordable once re-scaled (money columns)
                val decScale = logical match {
                  case d: org.apache.parquet.schema
                    .LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
                    Some(d.getScale)
                  case _ => None
                }
                val st = cc.getStatistics
                if (st == null) { zoneOk = false; nullsOk = false }
                else {
                  if (st.isNumNullsSet) fileNulls += st.getNumNulls
                  else nullsOk = false
                  if (!st.hasNonNullValue) zoneOk = false
                  else if (isString) {
                    (st.genericGetMin, st.genericGetMax) match {
                      case (a: org.apache.parquet.io.api.Binary,
                            b: org.apache.parquet.io.api.Binary) =>
                        val (mn, mx) = (a.toStringUsingUTF8, b.toStringUsingUTF8)
                        if (!ascii(mn) || !ascii(mx)) zoneOk = false
                        else fileZone = fileZone match {
                          case Some(Right((m0, m1))) => Some(Right(
                            (if (mn < m0) mn else m0, if (mx > m1) mx else m1)))
                          case Some(Left(_)) => zoneOk = false; None
                          case _ => Some(Right((mn, mx)))
                        }
                      case _ => zoneOk = false
                    }
                  } else if ((numericLogical || decScale.isDefined) &&
                      Seq(INT32, INT64, FLOAT, DOUBLE).contains(pt.getPrimitiveTypeName)) {
                    val parsed0 = (st.genericGetMin, st.genericGetMax) match {
                      case (a: java.lang.Integer, b: java.lang.Integer) =>
                        Some((BigDecimal(a.intValue), BigDecimal(b.intValue)))
                      case (a: java.lang.Long, b: java.lang.Long) =>
                        Some((BigDecimal(a.longValue), BigDecimal(b.longValue)))
                      case (a: java.lang.Float, b: java.lang.Float) =>
                        Some((BigDecimal(a.floatValue.toDouble),
                          BigDecimal(b.floatValue.toDouble)))
                      case (a: java.lang.Double, b: java.lang.Double) =>
                        Some((BigDecimal(a.doubleValue), BigDecimal(b.doubleValue)))
                      case _ => None
                    }
                    val parsed = decScale match {
                      case Some(s) => parsed0.map { case (mn, mx) =>
                        (BigDecimal(mn.toBigIntExact.get, s),
                         BigDecimal(mx.toBigIntExact.get, s)) }
                      case None => parsed0
                    }
                    parsed match {
                      case Some((mn, mx)) => fileZone = fileZone match {
                        case Some(Left((m0, m1))) =>
                          Some(Left((m0.min(mn), m1.max(mx))))
                        case Some(Right(_)) => zoneOk = false; None
                        case _ => Some(Left((mn, mx)))
                      }
                      case None => zoneOk = false
                    }
                  } else zoneOk = false
                }
              }
            }
          }
          // a file NOT storing the column at all (additive evolution:
          // written before the column existed) reads as all-null rows
          // — null counts stay honest only by poisoning
          if (!seen) { zoneOk = false; nullsOk = false }
          if (!zoneOk || fileZone.isEmpty) acc(c) = None
          else acc.updateWith(c) {
            case Some(Some(Left((m0, m1)))) => fileZone match {
              case Some(Left((mn, mx))) => Some(Some(Left((m0.min(mn), m1.max(mx)))))
              case _ => Some(None)
            }
            case Some(Some(Right((m0, m1)))) => fileZone match {
              case Some(Right((mn, mx))) => Some(Some(Right(
                (if (mn < m0) mn else m0, if (mx > m1) mx else m1))))
              case _ => Some(None)
            }
            case Some(None) => Some(None)
            case None => Some(fileZone)
          }
          if (!nullsOk) nulls(c) = None
          else nulls.updateWith(c) {
            case Some(Some(n)) => Some(Some(n + fileNulls))
            case Some(None) => Some(None)
            case None => Some(Some(fileNulls))
          }
        }
      } finally reader.close()
    }
    val b64 = java.util.Base64.getEncoder
    val zoneItems = cols.flatMap(c => acc.get(c).flatten.map {
      case Left((mn, mx)) =>
        s"$c=n:${mn.bigDecimal.toPlainString}:${mx.bigDecimal.toPlainString}"
      case Right((mn, mx)) =>
        val cs = java.nio.charset.StandardCharsets.UTF_8
        s"$c=$StrStatKind:${b64.encodeToString(mn.getBytes(cs))}:" +
          b64.encodeToString(mx.getBytes(cs))
    })
    val nullItems = cols.flatMap(c => nulls.get(c).flatten.map(n => s"$c$NullsTag=$n"))
    val recorded = zoneItems ++ nullItems :+
      s"$RowCountKey=$totalRows" // always recordable — powers fastCount
    Some(recorded.mkString(";"))
  }

  // ------------------------------------------------------------------
  // BLOOM DIR-INDEX (r11) — the EQUALITY complement to the zone maps:
  // min/max ranges cannot prune a point lookup on a high-cardinality
  // unsorted column (every partition's range straddles it), and
  // strings have no recordable range at all. A merge declaring
  // `bloomColumns` commits one small bloom filter PER PARTITION DIR
  // per column into the manifest line (`col!bloom=k:m:<hex>` — the
  // '!' makes the key unmistakable for a zone-map entry), built with
  // the same engine-portable md5 position scheme as
  // [[graft.ext.Sketches.bloomWords]] so a DuckDB oracle rebuilds
  // identical filters. [[readSkippingEquals]] then prunes at the
  // DIRECTORY level: a dir whose bloom says "definitely absent" is
  // never opened — no false negatives by construction, false
  // positives only cost a read. Delta's bloom-filter index in
  // miniature, at dir rather than file granularity. Untouched
  // partitions carry their filters forward verbatim; dirs without a
  // filter are always read (fail-safe). Size the filter to the
  // partition's cardinality: mBits defaults to 8192 (2 KB/partition
  // in the manifest) — at ~4 hashes that holds FP < 1% up to ~850
  // distinct values per partition; pass a larger `bloomBits` for
  // denser partitions.
  // ------------------------------------------------------------------

  private val BloomHashes = 4
  private val BloomTag = "!bloom"
  /** Suffix-item tag for a TOKEN bloom (`col!tokbf=k:m:<hex>`): the
    * same packed-word md5 bloom as `!bloom`, built over the DISTINCT
    * lowercased `[a-z0-9]+` tokens of a text column rather than its
    * whole values — ClickHouse's `tokenbf_v1` skipping index, at dir
    * granularity. [[GraftFileIndex]] prunes on it when the pushed
    * predicate is [[graft.ext.TextAnalysis.tokenMatch]]'s expression
    * shape: a keyword search over a token-indexed 100 TB corpus opens
    * only dirs whose bloom might contain the token. Same payload
    * format as `!bloom`, so [[bloomContains]] probes both. */
  private[ops] val TokBloomTag = "!tokbf"
  /** Suffix-item tag for a KMV distinct sketch (`col!kmv=<k>:<hex…>`,
    * hex… = the dir's bottom-`k` DISTINCT 64-bit md5 value hashes as
    * sorted fixed-width 16-char hex, concatenated). The bottom-k /
    * K-Minimum-Values estimator (Bar-Yossef et al. 2002; the Theta
    * sketch's core): sketches merge by union-then-keep-k, so
    * [[approxDistinct]] answers COUNT(DISTINCT col) over the whole
    * table METADATA-ONLY — O(dirs·k) driver work, zero files read —
    * the same scale class as the manifest itself. Engine-portable by
    * construction (md5 of the CAST-to-string value; an oracle rebuilds
    * the identical sketch in SQL). */
  private[ops] val KmvTag = "!kmv"
  /** Zone-map kind marker for string bounds (`col=s:<b64>:<b64>`). */
  private[ops] val StrStatKind = "s"
  /** Suffix-item tag for a column's null count (`col!nulls=<n>`). */
  private[ops] val NullsTag = "!nulls"
  /** Suffix-item tag for a column's EXACT SUM over the dir's non-null
    * rows (`col!sum=<signed decimal integer>`, committed by
    * `merge(sumColumns = …)` from one bounded per-dir aggregate job —
    * parquet footers carry min/max/null-count but never sums, so this
    * is the one stats family that costs a job at write time). Long
    * addition is associative, so the fold across entries is exact at
    * any re-grouping: [[graft.plans.StatsAggRule]] answers global and
    * GROUP-BY-pcol `sum(col)` — and `avg(col)` under the 2⁵³
    * double-exactness proof — from metadata, zero files read. Stored
    * as unbounded decimal text (the per-dir aggregate runs in
    * decimal(38,0)), so the COMMITTED value never wraps; the rule
    * backs off when the folded total exceeds Long range (the scan
    * would overflow there, and that behavior — ANSI error or legacy
    * wrap — belongs to the scan, not to a silent metadata answer). */
  private[ops] val SumTag = "!sum"

  // ------------------------------------------------------------------
  // DELETION VECTORS (r12) — merge-on-read row deletes, the
  // Delta/Iceberg-v2 answer to the copy-on-write scale gap: a GDPR
  // erasure of 5 subjects from a 100 TB table must not rewrite every
  // touched partition. [[deleteWhereMoR]]/[[deleteByKeysMoR]] commit a
  // tiny per-partition SIDECAR of deleted physical row addresses
  // ((file, row-index) pairs, recorded from the parquet `_metadata`
  // columns) and re-point the manifest entry at it via a `__dv`
  // suffix item — ZERO data dirs rewrite; the commit is the usual one
  // manifest rename. Reads fold the DV in as a broadcast anti-join
  // ([[readEntriesOf]]); [[fastCount]] stays metadata-only by
  // subtracting the recorded count; [[compact]] (and any merge that
  // rewrites the partition) folds the DV into the rewritten file and
  // drops the item. Zone-map/bloom suffixes survive a DV untouched —
  // they become supersets, which only costs a false-positive read.
  // ------------------------------------------------------------------

  /** Manifest suffix item key for a deletion vector: `__dv=<n>:<rel>`
    * (n = deleted row count — what keeps [[fastCount]] metadata-only —
    * and rel = the sidecar path under the table root). Unmistakable
    * for a zone-map (`col=kind:min:max`) or bloom (`col!bloom=…`)
    * item, and ignored by their parsers. */
  private val DvTag = "__dv"
  /** Physical-address columns [[readEntriesOf]] exposes `withPos`. */
  private[ops] val FileKeyCol = "__graft_file"
  private[ops] val RowPosCol = "__graft_pos"
  private val DvFileCol = "__dv_file"
  private val DvPosCol = "__dv_pos"

  /** The (deletedCount, sidecarRelPath) a manifest entry's `__dv`
    * item records, if any. */
  private[ops] def dvRefOf(entryValue: String): Option[(Long, String)] =
    statsOf(entryValue).flatMap(_.split(';').iterator
      .find(_.startsWith(s"$DvTag="))
      .map { item =>
        val body = item.substring(DvTag.length + 1)
        val i = body.indexOf(':')
        require(i > 0, s"ManifestTable: corrupt $DvTag item '${item.take(60)}'")
        (body.substring(0, i).toLong, body.substring(i + 1))
      })

  /** Replace (or add) the `__dv` item on an entry value, keeping the
    * dir and every other suffix item (zone maps, blooms, rowcount —
    * all still valid as supersets/pre-delete counts). */
  private def setDvItem(entryValue: String, n: Long, rel: String): String = {
    val d = dirOf(entryValue)
    val items = statsOf(entryValue)
      .map(_.split(';').toSeq.filter(it => it.nonEmpty && !it.startsWith(s"$DvTag=")))
      .getOrElse(Nil)
    s"$d\t${(items :+ s"$DvTag=$n:$rel").mkString(";")}"
  }

  /** Manifest suffix item key for APPENDED-ROW dirs (merge-on-read
    * updates): `__aux=<n>:<rel>[,<n>:<rel>…]` — each ref is an extra
    * data dir holding rows that belong to the entry's partition ON TOP
    * of its primary dir (the Iceberg-v2 "one partition, many data
    * files" shape at dir granularity). `n` = appended row count, which
    * keeps [[fastCount]] metadata-only. A list because each
    * [[updateWhereMoR]] on a partition appends one more dir without
    * rewriting the previous ones; [[compact]] (or any merge touching
    * the partition) folds them back into one dir and drops the item.
    *
    * PRUNING CONTRACT: an entry carrying `__aux` is NEVER pruned by
    * its zone-map/bloom items — those were recorded from the primary
    * dir, and an update may have written values outside them (that is
    * the point of an update). Compaction restores prunability. */
  private val AuxTag = "__aux"

  /** The (appendedCount, auxDirRel) list an entry's `__aux` item
    * records; empty when none. */
  private[ops] def auxRefsOf(entryValue: String): Seq[(Long, String)] =
    statsOf(entryValue).toSeq.flatMap(_.split(';').iterator
      .filter(_.startsWith(s"$AuxTag="))
      .flatMap(_.substring(AuxTag.length + 1).split(',').iterator
        .filter(_.nonEmpty).map { ref =>
          val i = ref.indexOf(':')
          require(i > 0, s"ManifestTable: corrupt $AuxTag item ref '${ref.take(60)}'")
          (ref.substring(0, i).toLong, ref.substring(i + 1))
        }))

  /** Replace (or add) the `__aux` item on an entry value, keeping the
    * dir and every other suffix item. */
  private def setAuxItem(entryValue: String, refs: Seq[(Long, String)]): String = {
    val d = dirOf(entryValue)
    val items = statsOf(entryValue)
      .map(_.split(';').toSeq.filter(it => it.nonEmpty && !it.startsWith(s"$AuxTag=")))
      .getOrElse(Nil)
    val item = s"$AuxTag=${refs.map { case (n, rel) => s"$n:$rel" }.mkString(",")}"
    s"$d\t${(items :+ item).mkString(";")}"
  }

  /** Write a DV sidecar: one line per file, `<fileKey>\t<pos,pos,…>`,
    * positions sorted — newline-delimited text for the same
    * debuggability reason the manifest itself is. Size is
    * O(deleted rows in the partition): erasure-scale by contract. */
  private def writeDv(fs: FileSystem, tablePath: String, rel: String,
                      pairs: Seq[(String, Long)]): Unit = {
    val p = new Path(s"$tablePath/$rel")
    fs.mkdirs(p.getParent)
    val out = fs.create(p, false)
    try out.write(pairs.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, ps) =>
      require(!f.contains('\t') && !f.contains('\n'),
        s"ManifestTable: file key '$f' not DV-encodable")
      s"$f\t${ps.map(_._2).distinct.sorted.mkString(",")}"
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Load a DV sidecar back to its (fileKey, rowPos) pairs. */
  private def loadDv(fs: FileSystem, tablePath: String, rel: String): Seq[(String, Long)] = {
    val in = fs.open(new Path(s"$tablePath/$rel"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).flatMap { line =>
        val i = line.indexOf('\t')
        require(i >= 0, s"ManifestTable: corrupt DV sidecar $rel: no tab in " +
          line.take(60))
        val f = line.substring(0, i)
        line.substring(i + 1).split(',').iterator.filter(_.nonEmpty)
          .map(s => (f, s.toLong)).toSeq
      }.toList
    finally in.close()
  }

  /** Relative PRIMARY data dirs a retained `version` references
    * (`__aux` appendix dirs and DV sidecars not included — see
    * [[auxStats]]/[[dvStats]] for those) — observability for gates
    * pinning physical facts (the q176/q179 zero-dirs-rewritten
    * evidence). Driver-side metadata only. */
  /** TRUE iff two retained versions carry BIT-IDENTICAL table data:
    * the full data-entry lists (key → dir + stats/DV/aux suffix)
    * compare equal. Dirs are immutable (every data change lands new
    * dirs or new DV/aux suffix items), so entry-list equality proves
    * the versions differ only in head metadata — schema, props,
    * constraints, MV catalog entries. The MV rewrites use this to
    * bridge metadata-only commits in their freshness checks: a
    * catalog/constraint commit after a view refresh must not disarm
    * the rewrite (the data the view folded is provably unchanged).
    * Driver-side: two manifest reads. */
  private[graft] def sameDataEntries(spark: SparkSession, path: String,
                                     v1: Long, v2: Long): Boolean =
    v1 == v2 || {
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      try dataEntries(readManifest(fs, path, v1)) ==
        dataEntries(readManifest(fs, path, v2))
      catch { case scala.util.control.NonFatal(_) => false } // expired version
    }

  def dataDirs(spark: SparkSession, path: String, version: Long): Set[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    dataEntries(readManifest(fs, path, version)).map(e => dirOf(e._2)).toSet
  }

  /** Partition key → relative data dir of a retained `version` —
    * per-entry observability (the q178 only-the-batch-was-assigned
    * evidence compares untouched entries' dirs across versions).
    * Driver-side metadata only. */
  def entryDirs(spark: SparkSession, path: String, version: Long): Map[String, String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    dataEntries(readManifest(fs, path, version))
      .map { case (k, v) => k -> dirOf(v) }.toMap
  }

  /** DV observability: (entries carrying a DV, total deleted rows
    * recorded) in the LATEST manifest — metadata-only. The q176 gate
    * pins this to prove the delete was merge-on-read and that
    * [[compact]] folded it back to zero. */
  def dvStats(spark: SparkSession, path: String): (Long, Long) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.dvStats: no manifest under $path/$ManifestDir"))
    val refs = dataEntries(readManifest(fs, path, v)).flatMap(e => dvRefOf(e._2))
    (refs.size.toLong, refs.map(_._1).sum)
  }

  /** Aux-appendix observability: (entries carrying an `__aux` item,
    * total appended rows recorded) in the LATEST manifest —
    * metadata-only. The update gate pins this to prove the update was
    * merge-on-read and that [[compact]] folded it back to zero. */
  def auxStats(spark: SparkSession, path: String): (Long, Long) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.auxStats: no manifest under $path/$ManifestDir"))
    val refs = dataEntries(readManifest(fs, path, v)).flatMap(e => auxRefsOf(e._2))
    (refs.size.toLong, refs.map(_._1).sum)
  }

  /** One retained snapshot's audit row ([[history]]). `rows` is the
    * metadata-recorded row count when EVERY entry of that version
    * carries one (None otherwise — pre-stats versions). */
  final case class VersionInfo(version: Long, commitMs: Option[Long],
                               entries: Long, rows: Option[Long],
                               props: Map[String, String])

  /** DESCRIBE HISTORY: every RETAINED version's commit time, entry
    * count, metadata row count, and committed props, oldest first —
    * the audit surface next to [[fsck]]/[[readVersion]]/[[readAsOf]].
    * Metadata-only: O(retained versions) manifest reads, no Spark
    * job. Props diffs between rows surface schema/constraint/layout
    * changes; expired versions are simply absent (the retention
    * horizon IS the audit horizon — Delta's posture). */
  def history(spark: SparkSession, path: String): Seq[VersionInfo] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    versions(fs, path).sorted.map { v =>
      val lines = readManifest(fs, path, v)
      val es = dataEntries(lines)
      val rowCounts = es.map(e => entryMetaOf(e._2).rowCount)
      VersionInfo(v,
        lines.collectFirst { case (CommitKey, ms) => ms.toLong },
        es.size.toLong,
        if (rowCounts.nonEmpty && rowCounts.forall(_.isDefined))
          Some(rowCounts.flatten.sum) else None,
        propsOf(lines))
    }
  }

  /** [[approxDistinct]]'s answer. `exact` is TRUE when the merged
    * union held fewer than `k` hashes — then EVERY dir's sketch was
    * its complete hash set, so the union is the complete corpus hash
    * set and the estimate is the true distinct count (modulo 64-bit
    * md5 collisions, ~n²/2⁶⁵ — negligible below billions of values). */
  final case class DistinctEstimate(estimate: Long, exact: Boolean,
                                    k: Int, dirs: Long) {
    /** Advisory ~95% interval around the estimate: the bottom-k
      * estimator's relative standard error is ≈ 1/√k (Beyer et al.
      * 2007), so ±1.96/√k. Collapses to a point when [[exact]].
      * Driver-side doubles — advisory, deliberately not part of any
      * oracle contract (the estimate itself is the exact-arithmetic
      * value). */
    def bounds95: (Long, Long) =
      if (exact || k == 0) (estimate, estimate)
      else {
        val m = (1.96 * estimate / math.sqrt(k.toDouble)).toLong
        (math.max(0L, estimate - m), estimate + m)
      }
  }

  /** The KMV payload (`k`, sorted 16-hex-char hashes) a manifest
    * entry carries for `column`, if any. */
  private def kmvOf(entryValue: String, column: String): Option[(Int, Seq[String])] =
    statsOf(entryValue).flatMap(_.split(';').iterator
      .find(_.startsWith(s"$column$KmvTag="))
      .map { item =>
        val payload = item.substring(item.indexOf('=') + 1)
        val i = payload.indexOf(':')
        require(i > 0, s"ManifestTable: corrupt kmv payload for $column")
        val hex = payload.substring(i + 1)
        require(hex.length % 16 == 0,
          s"ManifestTable: corrupt kmv payload for $column (hex length ${hex.length})")
        (payload.substring(0, i).toInt, hex.grouped(16).toSeq)
      })

  /** The SINGLE k / mBits the committed KMV (resp. token-bloom)
    * sketches for `columns` were built with, across every entry that
    * carries one — so maintenance rewrites ([[foldMoR]]) re-sketch
    * touched dirs with the SAME parameters and the family stays
    * homogeneous (a mixed-k table makes [[approxDistinct]] refuse
    * permanently). None = no committed sketch for any of the columns;
    * a table that ALREADY carries mixed sizes refuses loudly — the
    * caller must re-merge every dir to re-unify first. */
  private def committedSketchParam(lines: Seq[(String, String)],
                                   columns: Seq[String], tag: String,
                                   decode: String => Int,
                                   what: String): Option[Int] = {
    val found = (for {
      (_, value) <- dataEntries(lines)
      items <- statsOf(value).toSeq
      c <- columns
      item <- items.split(';').iterator.filter(_.startsWith(s"$c$tag="))
    } yield decode(item.substring(item.indexOf('=') + 1))).distinct
    require(found.size <= 1,
      s"ManifestTable: committed $what sketches carry mixed parameters " +
        s"(${found.sorted.mkString(", ")}) — re-merge every dir to re-unify " +
        "before maintenance can re-sketch")
    found.headOption
  }

  /** METADATA-ONLY approximate `COUNT(DISTINCT column)` over the
    * table (optionally a partition subset): merges the per-dir KMV
    * sketches committed by `merge(kmvColumns = …)` — union the
    * bottom-k hash sets, keep the k smallest, estimate
    * `(k−1)·2⁶⁴ / h_k` (the classic bottom-k estimator, Bar-Yossef
    * et al. 2002; relative error ≈ 1/√k, ~6% at the k=256 default).
    * ZERO files are read — O(dirs·k) driver-side string work, the
    * same scale class as reading the manifest — so at 100 TB this is
    * the difference between an instant answer and a full-table
    * shuffle. All arithmetic is exact BigInt (truncating division),
    * reproducible verbatim by an external engine (DuckDB HUGEINT) —
    * the q214 oracle rebuilds the identical sketch and estimate from
    * the raw rows.
    *
    * Honesty rules: REFUSES when any selected entry lacks a committed
    * sketch for `column` (a partial answer would silently undercount)
    * or carries pending merge-on-read state (a DV'd row is still in
    * its dir's sketch and an appendix row is in none — fold first;
    * the same posture [[fastCount]] takes the subtraction path for,
    * but a distinct count has no subtraction). Deleting dirs via
    * compaction is safe — entries carry their sketches forward
    * verbatim, and a sketch union is insensitive to re-grouping. */
  def approxDistinct(spark: SparkSession, path: String, column: String,
                     partitionFilter: String => Boolean = _ => true): DistinctEstimate = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.approxDistinct: no manifest under $path/$ManifestDir"))
    approxDistinctAt(spark, path, column, v, partitionFilter)
  }

  /** [[approxDistinct]] AT a retained version — the time-travel
    * sketch: each manifest version's entries carry the sketches
    * committed WITH them, so the estimate over a pinned snapshot
    * answers "how many distinct users before last night's batch"
    * from the OLD sketches even after later upserts rewrote the
    * dirs — the same completeness-per-snapshot certificate
    * [[graft.plans.StatsAggRule]] holds for [[readVersion]] reads.
    * Same honesty rules (every selected entry sketched, no pending
    * MoR state at that snapshot). */
  def approxDistinctAt(spark: SparkSession, path: String, column: String,
                       version: Long,
                       partitionFilter: String => Boolean = _ => true): DistinctEstimate = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(versions(fs, path).contains(version),
      s"ManifestTable.approxDistinctAt: m$version not retained under $path " +
        s"(have ${versions(fs, path).mkString(", ")})")
    val entries = dataEntries(readManifest(fs, path, version))
      .filter(e => partitionFilter(e._1))
    entries.foreach { case (kPart, value) =>
      require(dvRefOf(value).isEmpty && auxRefsOf(value).isEmpty,
        s"ManifestTable.approxDistinct: entry $kPart carries pending merge-on-read " +
          "state (DV or update appendix) the committed sketches do not reflect — " +
          "run compact/maybeFoldMoR first")
    }
    val payloads = entries.map { case (kPart, value) =>
      kmvOf(value, column).getOrElse(sys.error(
        s"ManifestTable.approxDistinct: entry $kPart has no committed KMV sketch " +
          s"for $column — merge with kmvColumns = Seq(\"$column\")"))
    }
    if (payloads.isEmpty) DistinctEstimate(0L, exact = true, 0, 0L)
    else {
      val ks = payloads.map(_._1).distinct
      require(ks.size == 1,
        s"ManifestTable.approxDistinct: mixed sketch sizes ${ks.mkString(", ")}")
      val k = ks.head
      val union = payloads.iterator.flatMap(_._2).toSeq.distinct.sorted
      if (union.size < k)
        DistinctEstimate(union.size.toLong, exact = true, k, entries.size.toLong)
      else {
        val hk = BigInt(union(k - 1), 16)
        val est = (BigInt(k - 1) << 64) / hk
        DistinctEstimate(if (est.isValidLong) est.toLong else Long.MaxValue,
          exact = false, k, entries.size.toLong)
      }
    }
  }

  /** [[approxDistinct]] under a SQL PARTITION-KEY predicate — the
    * [[graft.plans.StatsAggRule]] `narrow` adjudication applied to
    * the sketch fold: `where` is parsed and accepted ONLY as
    * conjunctions of `pcol = lit` / `pcol IN (lits)` / `pcol <op>
    * lit` range comparisons (plus `pcol IS NOT NULL`, a no-op —
    * merge refuses null partition values). Every such predicate
    * keeps entries WHOLE-or-not-at-all, so folding only the
    * surviving entries' KMV sketches answers `COUNT(DISTINCT col)
    * WHERE day >= '…'` from metadata with the same exactness
    * contract as the full fold. Equality/IN literals must stringify
    * exactly as the manifest key does; range comparisons decide on
    * parsed-back integral keys or on ASCII strings (Java order ==
    * UTF8 byte order). When the structural adjudicator refuses, any
    * OTHER deterministic predicate of the partition column ALONE
    * (a function of the key, an OR, a LIKE) still decides via
    * [[exprKeyPredicateOf]] — analyzed against the table and
    * evaluated per entry key, constant within an entry. Only a
    * predicate referencing a NON-key column (or a non-lossless key
    * type) REFUSES LOUDLY: a silently mis-scoped subset would be a
    * wrong answer, and the row-level fallback is a plain
    * `count(DISTINCT …)` scan. */
  def approxDistinctWhere(spark: SparkSession, path: String, column: String,
                          where: String): DistinctEstimate = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.approxDistinctWhere: no manifest under $path/$ManifestDir"))
    approxDistinctWhereAt(spark, path, column, where, v)
  }

  /** [[approxDistinctWhere]] AT a retained version — the predicate is
    * adjudicated against THAT snapshot's committed partition-column
    * type and entry keys, and the fold reads that snapshot's sketches
    * ([[approxDistinctAt]]), so the whole answer — scope AND
    * estimate — is transactionally pinned (this also anchors the
    * latest-version path: adjudication and fold share one version,
    * never a racing pair). */
  def approxDistinctWhereAt(spark: SparkSession, path: String, column: String,
                            where: String, version: Long): DistinctEstimate = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(versions(fs, path).contains(version),
      s"ManifestTable.approxDistinctWhereAt: m$version not retained under $path")
    val lines = readManifest(fs, path, version)
    val pcol = partitionColOf(lines).getOrElse(sys.error(
      s"ManifestTable.approxDistinctWhere: no partition column recorded under $path"))
    val pcolType = committedSchema(lines).getOrElse(sys.error(
      s"ManifestTable.approxDistinctWhere: no committed schema under $path"))
      .find(_.name == pcol).getOrElse(sys.error(
        s"ManifestTable.approxDistinctWhere: partition column $pcol missing " +
          s"from the committed schema under $path")).dataType
    val keys = dataEntries(lines).map(_._1)
    val pred =
      try keyPredicateOf(spark, where, pcol, pcolType, keys)
      catch { case e: RuntimeException if e.getMessage != null &&
          e.getMessage.contains("not key-decidable") =>
        // the structural adjudicator refused — ANY deterministic
        // predicate of the partition column ALONE is still decidable
        // (constant per entry): analyze it against the table and
        // evaluate per key, the graft.plans.StatsAggRule narrow/eval
        // contract applied to the sketch fold
        exprKeyPredicateOf(spark, path, where, pcol, pcolType, version,
            propsOf(lines).get(PartitionTzProp))
          .getOrElse(throw e)
      }
    approxDistinctAt(spark, path, column, version, pred)
  }

  /** The [[approxDistinctWhere]] EVAL fallback: analyze `where`
    * against the table (so coercions/functions resolve exactly as a
    * scan's would), require every reference to be the partition
    * column, and decide per entry key by substituting the parsed-back
    * internal value — exact for key-roundtrip-lossless pcol types
    * (integrals, strings, ISO dates). NULL excludes (SQL WHERE). A
    * non-pcol reference or a non-lossless pcol type returns None (the
    * caller re-raises the structural refusal); an ANSI eval error
    * propagates — the equivalent scan would raise it too. */
  private def exprKeyPredicateOf(spark: SparkSession, path: String, where: String,
                                 pcol: String,
                                 pcolType: org.apache.spark.sql.types.DataType,
                                 version: Long,
                                 writerTz: Option[String])
      : Option[String => Boolean] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    // an analysis failure (e.g. an ANSI-unparsable literal the
    // coercion folds eagerly) means no honest metadata decision —
    // return None so the caller re-raises the structural refusal and
    // the user's row-level fallback surfaces the engine's own error.
    // Analysis runs against the PINNED version's schema — a rename
    // or type change after the snapshot must not leak in.
    val analyzed =
      try readVersion(spark, path, version)
        .where(org.apache.spark.sql.functions.expr(where))
        .queryExecution.analyzed
      catch { case scala.util.control.NonFatal(_) => return None }
    val conds = analyzed.collect { case f: LFilter => f.condition }
    if (conds.size != 1) return None
    val cond = conds.head
    if (!cond.deterministic || cond.references.isEmpty ||
        !cond.references.forall(_.name == pcol)) return None
    def keyVal(k: String): Option[Any] = pcolType match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(k))
      case org.apache.spark.sql.types.ByteType => k.toByteOption
      case org.apache.spark.sql.types.ShortType => k.toShortOption
      case org.apache.spark.sql.types.IntegerType => k.toIntOption
      case org.apache.spark.sql.types.LongType => k.toLongOption
      case org.apache.spark.sql.types.DateType =>
        try Some(java.time.LocalDate.parse(k).toEpochDay.toInt)
        catch { case _: java.time.format.DateTimeParseException => None }
      // TIMESTAMP keys under the writer-zone certificate
      // ([[PartitionTzProp]], the [[graft.plans.StatsAggRule]]
      // keyInternal contract): session zone must EQUAL the recorded
      // writer zone and be fixed-offset (injective rendering, no DST
      // fold), and the parsed value must render back to the
      // identical key text via Spark's own cast.
      case dt @ (org.apache.spark.sql.types.TimestampType |
                 org.apache.spark.sql.types.TimestampNTZType) =>
        import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
        val tz = spark.sessionState.conf.sessionLocalTimeZone
        val zoneOk = dt == org.apache.spark.sql.types.TimestampNTZType || {
          writerTz.contains(tz) &&
            (try java.time.ZoneId.of(tz).getRules.isFixedOffset
             catch { case scala.util.control.NonFatal(_) => false })
        }
        if (!zoneOk) None
        else {
          val parsed =
            try Cast(Literal(org.apache.spark.unsafe.types.UTF8String
              .fromString(k), org.apache.spark.sql.types.StringType),
              dt, Some(tz), EvalMode.LEGACY)
              .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
            catch { case scala.util.control.NonFatal(_) => null }
          Option(parsed).filter { v =>
            try Cast(Literal(v, dt), org.apache.spark.sql.types.StringType,
              Some(tz), EvalMode.LEGACY)
              .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
              .toString == k
            catch { case scala.util.control.NonFatal(_) => false }
          }
        }
      case _ => None
    }
    // probe losslessness up front so refusal stays LOUD and immediate
    // rather than a surprise mid-fold
    Some { (k: String) =>
      val kv = keyVal(k).getOrElse(sys.error(
        s"ManifestTable.approxDistinctWhere: key '$k' does not parse back " +
          s"losslessly as ${pcolType.simpleString} — the expression predicate " +
          "cannot be decided from metadata"))
      val bound = cond.transformUp {
        case _: AttributeReference => Literal(kv, pcolType)
      }
      bound.eval(org.apache.spark.sql.catalyst.InternalRow.empty) == true
    }
  }

  /** Parse `where` into a key-string predicate, or refuse loudly —
    * the [[approxDistinctWhere]] adjudicator (the exactness rules of
    * [[graft.plans.StatsAggRule]]'s `narrow`, over manifest keys). */
  private def keyPredicateOf(spark: SparkSession, where: String, pcol: String,
                             pcolType: org.apache.spark.sql.types.DataType,
                             keys: Seq[String]): String => Boolean = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    def refuse(e: Expression): Nothing = sys.error(
      s"ManifestTable.approxDistinctWhere: predicate '${e.sql}' is not " +
        s"key-decidable — only AND-conjunctions of $pcol =/IN/range against " +
        "literals fold from metadata; use a row-level count(DISTINCT …) scan " +
        "for anything else")
    def isP(e: Expression): Boolean = e match {
      case a: UnresolvedAttribute =>
        a.nameParts.mkString(".").equalsIgnoreCase(pcol)
      case _ => false
    }
    def conj(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conj(l) ++ conj(r)
      case other => Seq(other)
    }
    def ascii(s: String): Boolean = s.forall(c => c >= 0x20 && c < 0x7f)
    // The compare DOMAIN is adjudicated from the COMMITTED SCHEMA's
    // partition-column type plus the literal's type — the expression
    // is parsed UNRESOLVED, so no analyzer coercion protects this
    // path, and key-shape inference fails in both directions:
    //
    //   - INTEGRAL column: the engine compares numerically whatever
    //     the literal family is (ANSI casts a string literal to the
    //     column's integral type), so `day >= '9'` over int keys
    //     1..12 must keep 9..12 — a textual compare would silently
    //     exclude '10'..'12'. String literals must parse as longs or
    //     refuse (the engine's cast would error too).
    //   - STRING column, STRING literal: pure string equality /
    //     ordering — NEVER coerce: `part = '3'` against zero-padded
    //     keys '01'..'12' is FALSE in the engine even though '3' and
    //     '03' are numerically equal. (Ranges additionally need the
    //     ASCII guard: Java order == UTF8 byte order.)
    //   - STRING column, INTEGRAL literal: the engine casts the
    //     COLUMN to the numeric domain (`part = 3` matches key '03'),
    //     so keys compare as parsed longs — decidable only when EVERY
    //     key parses (a non-parsing key would make the scan's ANSI
    //     cast error; refuse loudly rather than guess).
    //   - DATE column, STRING literal: the engine casts the literal
    //     to a date; keys are canonical ISO (`CAST(date AS STRING)`),
    //     where lexicographic order IS date order — so the compare is
    //     textual, but ONLY when the literal is itself canonical ISO
    //     (a non-canonical '2024-1-5' names the same date yet would
    //     textually miss the key; refuse it).
    //
    // Any other column type or literal family refuses loudly.
    val integralCol = pcolType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val stringCol = pcolType == StringType
    // The string-column + integral-literal cross-domain path asserts
    // "the engine casts the COLUMN to the numeric domain" — true
    // under ANSI coercion (string → the literal's integral type,
    // exact), but under LEGACY coercion Spark widens BOTH sides to
    // DOUBLE, where longs beyond 2^53 collapse; a key encoding such
    // an integer could adjudicate differently here (exact long
    // compare) than in a real scan. Gate the path on ANSI mode, or —
    // under legacy — on every key and literal fitting EXACTLY in a
    // double, and refuse loudly otherwise.
    val ansiOn = spark.sessionState.conf.ansiEnabled
    def exactInDouble(x: Long): Boolean = math.abs(x) <= (1L << 53)
    val allKeysParse = keys.forall(_.toLongOption.isDefined)
    val keysNumericallyDecidable = allKeysParse &&
      (ansiOn || keys.forall(k => exactInDouble(k.toLong)))
    val allAscii = keys.forall(ascii)
    def eqValue(e: Expression, l: Literal): Either[Long, String] =
      if (l.value == null) refuse(e)
      else if (integralCol) l.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          scala.Left(l.value.toString.toLong)
        case StringType =>
          l.value.toString.toLongOption.map(scala.Left(_)).getOrElse(refuse(e))
        case _ => refuse(e)
      }
      else if (stringCol) l.dataType match {
        case StringType => scala.Right(l.value.toString)
        case ByteType | ShortType | IntegerType | LongType
            if keysNumericallyDecidable &&
              (ansiOn || exactInDouble(l.value.toString.toLong)) =>
          scala.Left(l.value.toString.toLong)
        case _ => refuse(e)
      }
      else if (pcolType == DateType) l.dataType match {
        case StringType =>
          val s = l.value.toString
          val canonical =
            try java.time.LocalDate.parse(s).toString == s
            catch { case _: java.time.format.DateTimeParseException => false }
          if (canonical) scala.Right(s) else refuse(e)
        case _ => refuse(e)
      }
      else refuse(e)
    // a key that fails to parse cannot happen on the gated paths
    // (integral columns commit integral keys; the string-column
    // numeric path requires every key to parse) — if one appears
    // anyway, refuse LOUDLY rather than silently excluding it. One
    // shared parser so equality, comparison and IN all fail the
    // identical condition the identical way.
    def parseKeyLong(k: String): Long = k.toLongOption.getOrElse(
      sys.error(s"ManifestTable.approxDistinctWhere: key '$k' does not " +
        "parse as an integer — the numeric predicate cannot be decided " +
        "from metadata"))
    def eqPred(e: Expression, l: Literal): String => Boolean =
      eqValue(e, l) match {
        case scala.Left(x) => k => parseKeyLong(k) == x
        case scala.Right(s) => k => k == s
      }
    def cmpPred(e: Expression, l: Literal, cmp: Int => Boolean): String => Boolean =
      eqValue(e, l) match {
        case scala.Left(x) => k => cmp(parseKeyLong(k).compare(x))
        case scala.Right(s) if ascii(s) && allAscii => k => cmp(k.compare(s))
        case _ => refuse(e)
      }
    val preds: Seq[String => Boolean] =
      conj(spark.sessionState.sqlParser.parseExpression(where)).map {
        case e @ EqualTo(k, l: Literal) if isP(k) => eqPred(e, l)
        case e @ EqualTo(l: Literal, k) if isP(k) => eqPred(e, l)
        case e @ In(k, vs) if isP(k) && vs.forall(_.isInstanceOf[Literal]) =>
          val values = vs.map(x => eqValue(e, x.asInstanceOf[Literal]))
          val longs = values.collect { case scala.Left(x) => x }.toSet
          val strs = values.collect { case scala.Right(s) => s }.toSet
          k => (longs.nonEmpty && longs(parseKeyLong(k))) || strs(k)
        case e @ GreaterThan(k, l: Literal) if isP(k) => cmpPred(e, l, _ > 0)
        case e @ GreaterThan(l: Literal, k) if isP(k) => cmpPred(e, l, _ < 0)
        case e @ GreaterThanOrEqual(k, l: Literal) if isP(k) => cmpPred(e, l, _ >= 0)
        case e @ GreaterThanOrEqual(l: Literal, k) if isP(k) => cmpPred(e, l, _ <= 0)
        case e @ LessThan(k, l: Literal) if isP(k) => cmpPred(e, l, _ < 0)
        case e @ LessThan(l: Literal, k) if isP(k) => cmpPred(e, l, _ > 0)
        case e @ LessThanOrEqual(k, l: Literal) if isP(k) => cmpPred(e, l, _ <= 0)
        case e @ LessThanOrEqual(l: Literal, k) if isP(k) => cmpPred(e, l, _ >= 0)
        case IsNotNull(k) if isP(k) => _ => true
        case other => refuse(other)
      }
    k => preds.forall(_(k))
  }

  /** Per-partition packed bloom filters for `cols` over the written
    * batch, as manifest suffix items — ONE Spark job for all columns
    * (column-pruned scan of the batch). Bounded collect:
    * O(partitions × mBits/32) small rows, the same driver-side scale
    * class as the manifest itself. */
  private def collectBlooms(batchDf: DataFrame, partitionCol: String,
                            cols: Seq[String], mBits: Int): Map[String, Seq[String]] = {
    require(mBits % 32 == 0 && mBits > 0, s"bloomBits must be a positive multiple of 32, got $mBits")
    val posFrames = cols.map { c =>
      batchDf.filter(col(c).isNotNull)
        .select(col(partitionCol).cast("string").as("__p"), lit(c).as("__c"),
          explode(array((0 until BloomHashes).map(j =>
            graft.ext.Sketches.bloomPos(col(c), j, mBits)): _*)).as("__pos"))
    }
    packPosItems(posFrames, mBits, BloomTag)
  }

  /** Per-partition TOKEN blooms ([[TokBloomTag]]) for text columns
    * `cols`: the bloom is built over the dir's DISTINCT lowercased
    * `[a-z0-9]+` tokens ([[graft.ext.TextAnalysis.TokenSplitRe]] — the
    * same stream [[graft.ext.TextAnalysis.tokenMatch]] probes), so a
    * keyword search prunes dirs through [[GraftFileIndex]]. The
    * distinct-per-dir pass bounds the insert count at the dir's
    * VOCABULARY (not its token count); size `mBits` to that — the
    * 16384-bit default holds FP < 1% to ~1700 distinct tokens/dir. */
  private def collectTokenBlooms(batchDf: DataFrame, partitionCol: String,
                                 cols: Seq[String], mBits: Int): Map[String, Seq[String]] = {
    require(mBits % 32 == 0 && mBits > 0,
      s"tokenBloomBits must be a positive multiple of 32, got $mBits")
    val posFrames = cols.map { c =>
      batchDf.filter(col(c).isNotNull)
        .select(col(partitionCol).cast("string").as("__p"),
          explode(split(lower(col(c)), graft.ext.TextAnalysis.TokenSplitRe)).as("__t"))
        .filter(col("__t") =!= "")
        .distinct()
        .select(col("__p"), lit(c).as("__c"),
          explode(array((0 until BloomHashes).map(j =>
            graft.ext.Sketches.bloomPos(col("__t"), j, mBits)): _*)).as("__pos"))
    }
    packPosItems(posFrames, mBits, TokBloomTag)
  }

  /** Shared bloom packer: `(dir, col, bit-position)` frames →
    * `col<tag>=k:m:<hex>` manifest items. ONE Spark job for all
    * columns of one tag family; bounded collect of
    * O(partitions × mBits/32) small rows — the same driver-side scale
    * class as the manifest itself. */
  private def packPosItems(posFrames: Seq[DataFrame], mBits: Int,
                           tag: String): Map[String, Seq[String]] = {
    val words = mBits / 32
    val packed = posFrames.reduce(_ unionAll _)
      .select(col("__p"), col("__c"),
        floor(col("__pos") / 32).cast("int").as("__w"),
        (col("__pos") % 32).cast("int").as("__bit"))
      .groupBy(col("__p"), col("__c"), col("__w"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), __bit)")).as("__bits"))
      .collect()
    packed.groupBy(r => (r.getString(0), r.getString(1))).map { case ((p, c), rows) =>
      val arr = Array.fill(words)(0L)
      rows.foreach(r => arr(r.getInt(2)) = r.getLong(3))
      (p, c, s"$c$tag=$BloomHashes:$mBits:${arr.map(w => f"$w%08x").mkString}")
    }.toSeq.groupBy(_._1).view.mapValues(_.map(_._3).toSeq).toMap
  }

  /** Per-partition KMV (bottom-k) distinct sketches ([[KmvTag]]) for
    * `cols`: the dir's `k` smallest DISTINCT 64-bit md5 value hashes,
    * kept as sorted fixed-width hex (lexicographic == numeric for
    * fixed-width lowercase hex, so strings sort correctly end to
    * end). One distinct + one window per batch; the window ranks
    * within (dir, col) and the filter keeps ≤ k rows per group, so
    * the collect is bounded at O(dirs × cols × k). */
  private def collectKmv(batchDf: DataFrame, partitionCol: String,
                         cols: Seq[String], k: Int): Map[String, Seq[String]] = {
    require(k >= 16 && k <= 4096, s"kmvK must be in [16, 4096], got $k")
    val hFrames = cols.map { c =>
      batchDf.filter(col(c).isNotNull)
        .select(col(partitionCol).cast("string").as("__p"), lit(c).as("__c"),
          substring(md5(col(c).cast("string")), 1, 16).as("__h"))
        .distinct()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__p"), col("__c")).orderBy(col("__h"))
    val rows = hFrames.reduce(_ unionAll _)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .collect()
    rows.groupBy(r => (r.getString(0), r.getString(1))).map { case ((p, c), rs) =>
      val hex = rs.sortBy(_.getInt(3)).map(_.getString(2)).mkString
      (p, c, s"$c$KmvTag=$k:$hex")
    }.toSeq.groupBy(_._1).view.mapValues(_.map(_._3).toSeq).toMap
  }

  /** Per-partition EXACT SUMS ([[SumTag]]) for integral AND decimal
    * columns `cols`: ONE bounded aggregate job over the written batch.
    * Integral values sum in decimal(38,0) and commit as the plain
    * integer total; decimal(p,s) values sum in decimal(38,s) (exact —
    * fixed-point addition is associative; 38 digits dwarf any real
    * dir's total, and a dir whose |Σ| really crosses 10³⁸⁻ˢ fails THIS
    * WRITE loudly under ANSI instead of committing a wrapped item) and
    * commit as the UNSCALED integer at the column's scale, so the
    * stored text is scale-free and never wraps. The reader
    * ([[graft.plans.StatsAggRule]]) re-attaches the scale from the
    * column's type. An all-null (or absent) column in a dir records NO
    * item — the rule disambiguates through the committed null counts,
    * mirroring the zone-map all-null convention. FLOAT columns refuse:
    * their sums are reduction-order-dependent and never fold as an
    * identity. */
  private def collectSums(batchDf: DataFrame, partitionCol: String,
                          cols: Seq[String]): Map[String, Seq[String]] = {
    import org.apache.spark.sql.types._
    val scaleOf: Map[String, Int] = cols.map { c =>
      val dt = batchDf.schema(c).dataType
      val s = dt match {
        case ByteType | ShortType | IntegerType | LongType => Some(0)
        case d: DecimalType => Some(d.scale)
        case _ => None
      }
      require(s.isDefined,
        s"ManifestTable: sumColumns supports integral and decimal columns " +
          s"only — $c is ${dt.simpleString} (float sums are " +
          "reduction-order-dependent and never fold as an identity)")
      c -> s.get
    }.toMap
    val aggs = cols.map(c => sum(col(c).cast(s"decimal(38,${scaleOf(c)})")).as(c))
    val rows = batchDf
      .select((col(partitionCol).cast("string").as("__p") +: cols.map(col)): _*)
      .groupBy(col("__p")).agg(aggs.head, aggs.tail: _*).collect()
    rows.flatMap { r =>
      val p = r.getString(0)
      cols.zipWithIndex.flatMap { case (c, i) =>
        Option(r.get(i + 1)).map { v =>
          val unscaled = v.asInstanceOf[java.math.BigDecimal]
            .setScale(scaleOf(c)).unscaledValue
          (p, s"$c$SumTag=$unscaled")
        }
      }
    }.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
  }

  /** Driver-side replica of [[graft.ext.Sketches.bloomPos]]: md5 of
    * "j#value", first 8 hex chars as a long, mod mBits. MUST stay in
    * lockstep with the Spark expression (and the DuckDB oracle form). */
  private def bloomProbePos(value: String, j: Int, mBits: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j#$value".getBytes("UTF-8"))
    val hex8 = md.take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex8, 16) % mBits).toInt
  }

  /** Decode a `k:mBits:<hex>` bloom payload and test membership. */
  private[ops] def bloomContains(payload: String, value: String): Boolean =
    payload.split(':') match {
      case Array(kS, mS, hex) =>
        val (k, m) = (kS.toInt, mS.toInt)
        require(hex.length == m / 32 * 8,
          s"ManifestTable: corrupt bloom payload (len ${hex.length} for m=$m)")
        (0 until k).forall { j =>
          val pos = bloomProbePos(value, j, m)
          val bits = java.lang.Long.parseLong(hex.substring(pos / 32 * 8, pos / 32 * 8 + 8), 16)
          (bits & (1L << (pos % 32))) != 0L
        }
      case _ => sys.error(s"ManifestTable: corrupt bloom payload '${payload.take(40)}'")
    }

  /** The bloom payload a manifest entry carries for `column`, if any. */
  private def bloomOf(entryValue: String, column: String): Option[String] =
    statsOf(entryValue).flatMap(_.split(';').iterator
      .find(_.startsWith(s"$column$BloomTag="))
      .map(item => item.substring(item.indexOf('=') + 1)))

  /** Read the table touching only partition dirs whose bloom filter
    * for `column` might contain `value` (the stringified column value,
    * matching `CAST(col AS STRING)`) — equality skipping under
    * partition pruning. Returns a SUPERSET of the matching rows (whole
    * surviving dirs); apply the row filter on top. Dirs without a
    * committed bloom for `column` are always read. */
  def readSkippingEquals(spark: SparkSession, path: String, column: String,
                         value: String,
                         partitionFilter: String => Boolean = _ => true): SkipResult = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.readSkippingEquals: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val live = dataEntries(lines).filter(e => partitionFilter(e._1))
    val kept = live.filter { case (_, entryValue) =>
      // an aux appendix may hold values outside the recorded bloom
      // (that is what an update does) — unprunable until compacted
      auxRefsOf(entryValue).nonEmpty || (bloomOf(entryValue, column) match {
        case Some(payload) => bloomContains(payload, value)
        case None => true // no filter recorded -> cannot prune safely
      })
    }
    // Dir-granular superset: every live entry referencing a kept dir
    // survives (a shared dir is scanned once, and only its CURRENT
    // keys' rows — never another key's stale copies).
    val keptDirs = kept.map(e => dirOf(e._2)).distinct
    val keptDirSet = keptDirs.toSet
    val survivors = live.filter(e => keptDirSet(dirOf(e._2))).map(_._1).toSet
    val df =
      if (kept.isEmpty) {
        val s = committedSchema(lines).getOrElse(sys.error(
          s"ManifestTable.readSkippingEquals: every dir pruned and manifest m$v has no " +
            "committed schema to shape an empty result"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      } else readEntriesOf(spark, path, lines, survivors)
    SkipResult(df, keptDirs.size.toLong, live.size.toLong)
  }

  /** A [[readSkipping]] result: the pruned frame plus the pruning
    * evidence (how many live dirs the range actually touched). */
  final case class SkipResult(df: DataFrame, dirsScanned: Long, dirsTotal: Long)

  /** JOIN-DRIVEN FILE PRUNING — the dynamic-partition-pruning analog
    * for manifest tables: before a fact ⋈ small-dim equi-join, probe
    * the dim side's DISTINCT join keys against every fact entry's
    * committed bloom + zone map at PLANNING time, and read only the
    * dirs at least one key might live in. Spark's own DPP prunes
    * PARTITIONS of a partitioned scan from a broadcast join's key set
    * at runtime; the manifest already holds per-dir value metadata,
    * so the same idea prunes FILES, driver-side, before any task
    * launches. At 100 TB this turns "scan the fact table because the
    * filter is on the dim" — the classic star-schema tax — into a
    * dirs_kept ≪ dirs_total scan.
    *
    * The dim collect is bounded by the SAME broadcast-small contract
    * the subsequent BroadcastHashJoin needs anyway (`maxKeys` refuses
    * loudly past it — a dim too big to collect is too big to
    * broadcast, and this optimization does not apply). Exclusion is
    * per entry, CONSERVATIVE (false keeps only): an entry survives
    * unless EVERY key is provably absent (bloom says no, or the
    * recorded [min,max] excludes it); aux-carrying entries and
    * metadata-less columns always survive. NULL keys are dropped —
    * an equi-join never matches them.
    *
    * Returns the SUPERSET frame (whole surviving dirs) — apply the
    * actual join on top; zero false drops by the exclusion rules
    * above. */
  def readJoinPruned(spark: SparkSession, path: String, column: String,
                     dim: DataFrame, dimCol: String,
                     partitionFilter: String => Boolean = _ => true,
                     maxKeys: Int = 100000): SkipResult = {
    val keyRows = dim.select(col(dimCol).cast("string").as("__k"))
      .distinct().limit(maxKeys + 1).collect()
    require(keyRows.length <= maxKeys,
      s"ManifestTable.readJoinPruned: dim side exceeds $maxKeys distinct keys — " +
        "too large for a planning-time probe (and for the broadcast join it " +
        "feeds); use a plain join, or raise maxKeys deliberately")
    val keys = keyRows.iterator.map(_.getString(0)).filter(_ != null).toSeq
    val nums = keys.flatMap(k => try Some(BigDecimal(k))
      catch { case _: NumberFormatException => None })
    val numOk = nums.size == keys.size // zone maps only compare when every key parses
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.readJoinPruned: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val live = dataEntries(lines).filter(e => partitionFilter(e._1))
    val kept = live.filter { case (_, value) =>
      auxRefsOf(value).nonEmpty || {
        val bloom = bloomOf(value, column)
        val zone = statsOf(value).map(decodeStats).flatMap(_.get(column))
        val zoneStr = statsOf(value).map(decodeStrStats).flatMap(_.get(column))
        if (keys.isEmpty) false // an empty dim joins to nothing
        else keys.indices.exists { i =>
          val k = keys(i)
          val bloomHit = bloom.forall(p => bloomContains(p, k))
          val zoneHit = zone.forall { case (mn, mx) =>
            !numOk || (nums(i) >= mn && nums(i) <= mx) }
          val zoneStrHit = zoneStr.forall { case (mn, mx) =>
            !k.forall(c => c >= 0x20 && c < 0x7f) || (k >= mn && k <= mx) }
          bloomHit && zoneHit && zoneStrHit
        }
      }
    }
    val keptDirs = kept.map(e => dirOf(e._2)).distinct
    val keptDirSet = keptDirs.toSet
    val survivors = live.filter(e => keptDirSet(dirOf(e._2))).map(_._1).toSet
    val df =
      if (kept.isEmpty) {
        val s = committedSchema(lines).getOrElse(sys.error(
          s"ManifestTable.readJoinPruned: every dir pruned and manifest m$v has no " +
            "committed schema to shape an empty result"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      } else readEntriesOf(spark, path, lines, survivors)
    SkipResult(df, keptDirs.size.toLong, live.size.toLong)
  }

  /** Read the table touching only partition dirs whose recorded
    * [min, max] for `column` intersects [lo, hi] — zone-map skipping
    * under partition pruning. Returns a SUPERSET of the rows matching
    * the range (whole surviving dirs); apply the row filter on top.
    * Dirs without recorded stats for `column` are always read. */
  def readSkipping(spark: SparkSession, path: String, column: String,
                   lo: BigDecimal, hi: BigDecimal,
                   partitionFilter: String => Boolean = _ => true): SkipResult = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.readSkipping: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val live = dataEntries(lines).filter(e => partitionFilter(e._1))
    val kept = live.filter { case (_, value) =>
      // an aux appendix may hold values outside the recorded zone map
      // (that is what an update does) — unprunable until compacted
      auxRefsOf(value).nonEmpty ||
      (statsOf(value).map(decodeStats).flatMap(_.get(column)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true // no stats recorded -> cannot prune safely
      })
    }
    // Dir-granular superset: every live entry referencing a kept dir
    // survives (a shared dir is scanned once, and only its CURRENT
    // keys' rows — never another key's stale copies).
    val keptDirs = kept.map(e => dirOf(e._2)).distinct
    val keptDirSet = keptDirs.toSet
    val survivors = live.filter(e => keptDirSet(dirOf(e._2))).map(_._1).toSet
    val df =
      if (kept.isEmpty) {
        val s = committedSchema(lines).getOrElse(sys.error(
          s"ManifestTable.readSkipping: every dir pruned and manifest m$v has no " +
            "committed schema to shape an empty result"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      } else readEntriesOf(spark, path, lines, survivors)
    SkipResult(df, keptDirs.size.toLong, live.size.toLong)
  }

  /** The commit half shared by [[merge]] and [[mergeMany]]: assemble
    * the next manifest from the plan plus the written entries, rename
    * it live, retire versions beyond the retention horizon. */
  private def commitPlan(fs: FileSystem, plan: MergePlan,
                         partitionCol: String,
                         newEntries: Seq[(String, String)],
                         retainVersions: Int,
                         statsColumns: Seq[String] = Nil,
                         props: Map[String, String] = Map.empty,
                         blooms: Map[String, Seq[String]] = Map.empty,
                         physToCur: Map[String, String] = Map.empty): Unit = {
    // `__dv`/`__aux` are the reserved suffix-item keys for deletion
    // vectors and update appendices (see [[dvRefOf]]/[[auxRefsOf]]); a
    // stats column of either name would commit a zone-map item (e.g.
    // `__dv=long:min:max`) that every subsequent read would try to
    // parse as a DV/aux reference.
    Seq(DvTag, AuxTag).foreach(t => require(!statsColumns.contains(t),
      s"ManifestTable: column name '$t' is reserved for merge-on-read " +
        "manifest items and cannot be a stats column"))
    // The written-vs-touched cross-check, directional:
    //   - a WRITTEN partition outside the touched set means the batch
    //     carried rows whose existing data was never read (an
    //     under-declared `knownTouched`, or a broken partition-value
    //     string roundtrip) — committing would lose the merge, refuse;
    //   - a touched partition NOT written is legal only as the no-op
    //     case (declared, but neither incoming rows nor an existing
    //     dir — over-declaring a fixed bucket set is the documented
    //     default); if it HAS an existing dir its rows were read into
    //     the merged batch, so absence from the output means the
    //     write dropped data — refuse.
    val written = newEntries.map(_._1).toSet
    val undeclared = written -- plan.touched
    require(undeclared.isEmpty,
      s"ManifestTable.merge: partitions ${undeclared.mkString(", ")} were written but " +
        s"not in the touched set ${plan.touched} — under-declared knownTouched or a " +
        "partition-value string roundtrip break; refusing to commit")
    // Under replaceTouched, a declared partition with no output rows
    // is a legitimate PARTITION DELETE (its old dir is dropped from
    // the entries below); under merge semantics it means the write
    // lost the existing rows it read — refuse.
    val phantom = (plan.touched -- written).intersect(plan.oldEntries.map(_._1).toSet)
    require(plan.replaceTouched || phantom.isEmpty,
      s"ManifestTable.merge: touched partitions ${phantom.mkString(", ")} have existing " +
        "data but the merged batch wrote no output for them — refusing to commit")
    // Zone-map stats (driver-side footer reads, no Spark job) and
    // bloom items for the new dirs; untouched entries carry theirs
    // forward verbatim.
    val newWithStats =
      if (statsColumns.isEmpty && blooms.isEmpty) newEntries
      else newEntries.map { case (k, dir) =>
        // statsColumns arrive as PHYSICAL (file) names; the committed
        // items are re-keyed to CURRENT names, the ones lookups use.
        val zone = if (statsColumns.isEmpty) Nil
          else rekeyItems(collectStats(fs, s"${plan.path}/$dir", statsColumns)
            .toSeq.flatMap(_.split(';')).filter(_.nonEmpty), physToCur)
        val items = zone ++ blooms.getOrElse(k, Nil)
        k -> (if (items.isEmpty) dir else s"$dir\t${items.mkString(";")}")
      }
    val propLines =
      if (props.isEmpty) Nil
      else Seq(PropsKey -> props.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${escapeProp(k)}=${escapeProp(v)}" }.mkString(";"))
    val entries = (SchemaKey -> plan.nextSchemaJson) +:
      (CommitKey -> System.currentTimeMillis().toString) +:
      (PartitionColKey -> partitionCol) +:
      (propLines ++ plan.oldEntries.filterNot(e => plan.touched(e._1)) ++ newWithStats)
    val next = plan.current.getOrElse(0L) + 1
    writeManifest(fs, plan.path, next, entries)
    cleanup(fs, plan.path, keepVersions =
      (versions(fs, plan.path) :+ next).distinct.sorted.takeRight(retainVersions).toSet)
  }

  /** MAINTENANCE: shrink the retention horizon of an existing table to
    * its latest `keepLast` versions — expire older manifests and
    * DELETE every data file no retained version references (the
    * vacuum). A long-lived table whose writers used a generous
    * `retainVersions` accumulates every superseded batch dir;
    * this is the explicit reclaim. The CURRENT version can never be
    * expired (`keepLast >= 1` and the kept set always contains the
    * head); expired versions subsequently fail [[readVersion]] with
    * its named not-retained error. Idempotent; driver-side filesystem
    * metadata only, no Spark job. */
  def expireVersions(spark: SparkSession, path: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"expireVersions: keepLast must be >= 1, got $keepLast " +
      "(the current version cannot be expired)")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versions(fs, path)
    require(vs.nonEmpty, s"expireVersions: no manifest under $path/$ManifestDir")
    cleanup(fs, path, keepVersions = vs.takeRight(keepLast).toSet)
  }

  // ------------------------------------------------------------------
  // COMPACTION (r11) — Delta OPTIMIZE's bin-packing in miniature, at
  // the granularity this format has: each manifest entry references
  // one data dir (one file), so a long-lived table with fine-grained
  // partitions (daily dirs over years, per-bucket dirs) accumulates
  // thousands of TINY files — the classic small-files tax: at 100 TB
  // the scan cost is dominated by per-file open/footer overhead, not
  // bytes. compact() greedily packs runs of adjacent small dirs into
  // SHARED data dirs (one file per bin, ~targetBytes each) and commits
  // the rewrite as a new manifest version with ZERO logical change:
  // same rows, same schema, same table properties (carried forward
  // verbatim — unlike merge's per-commit props, compaction must not
  // disturb transactional watermarks), same per-entry stats/bloom
  // suffixes (each key's row content is untouched, so its recorded
  // bounds stay exact). Readers stay correct through [[readEntriesOf]]:
  // a shared dir is opened once, and row-filtered by partition value
  // only when a read selects a strict subset of its keys.
  // ------------------------------------------------------------------

  /** A [[compact]] result: data-dir counts before/after, how many
    * manifest entries moved into shared dirs, how many bins were
    * written, the byte mass rewritten, and whether a version committed
    * at all (no-op when nothing packs — no version burned). */
  final case class CompactResult(dirsBefore: Long, dirsAfter: Long,
                                 entriesCompacted: Long, binsWritten: Long,
                                 bytesCompacted: Long, committed: Boolean)

  /** Bin-pack the latest snapshot's small data dirs into shared dirs
    * of ~`targetBytes` (dirs already at or above `targetBytes` are
    * left alone; a bin must cover at least `minDirs` dirs to be worth
    * the rewrite). Key-adjacent dirs pack together — bins never span
    * a large dir — so range locality survives for the skipping reads.
    * ONE Spark job rewrites every bin (a broadcast key→bin tag + a
    * one-file-per-bin shuffle); the commit is the usual single
    * manifest rename, concurrency-checked like every other commit. */
  def compact(spark: SparkSession, path: String, partitionCol: String,
              targetBytes: Long = 128L << 20, minDirs: Int = 2,
              retainVersions: Int = 2,
              sortWithinBins: Seq[String] = Nil): CompactResult = {
    require(targetBytes > 0, s"compact: targetBytes must be > 0, got $targetBytes")
    require(minDirs >= 2, s"compact: minDirs must be >= 2, got $minDirs " +
      "(a 1-dir bin is a rewrite with no file-count win)")
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.compact: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, cur)
    requireBucketAgreement(spark, path, None, "compact")
    partitionColOf(lines).foreach(h => require(h == partitionCol,
      s"ManifestTable.compact: table partition column is $h, not $partitionCol"))
    // Shared dirs are only readable under ONE authoritative schema
    // (readEntriesOf unions per-dir scans positionally), so a legacy
    // schemaless manifest must see a merge (which commits one) first.
    val schema = committedSchema(lines).getOrElse(sys.error(
      s"ManifestTable.compact: no committed schema under $path (legacy manifest) — " +
        "run one merge first"))
    require(schema.fieldNames.contains(partitionCol),
      s"ManifestTable.compact: $partitionCol is not a column of the committed schema")
    val entries = dataEntries(lines)

    // Units = distinct data dirs in key order (an already-shared dir
    // from an earlier compact is ONE unit and may re-pack with its
    // neighbors). Sizes are driver-side filesystem metadata.
    val byDir = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[(String, String)]]
    entries.sortBy(_._1).foreach { e =>
      val d = dirOf(e._2)
      byDir.update(d, byDir.getOrElse(d, Vector.empty) :+ e)
    }
    val units: Seq[(String, Vector[(String, String)], Long)] = byDir.toSeq.map {
      case (d, es) => (d, es, fs.getContentSummary(new Path(s"$path/$d")).getLength)
    }

    // Greedy adjacent packing; a large dir closes the current bin.
    val bins = scala.collection.mutable.Buffer.empty[Vector[(String, Vector[(String, String)], Long)]]
    var open = Vector.empty[(String, Vector[(String, String)], Long)]
    var openBytes = 0L
    def close(): Unit = {
      if (open.size >= minDirs) bins += open
      open = Vector.empty; openBytes = 0L
    }
    units.foreach { u =>
      if (u._3 >= targetBytes) close() // stays alone, breaks adjacency
      else {
        if (u._3 > targetBytes - openBytes) close() // overflow-safe bound
        open :+= u; openBytes += u._3
      }
    }
    close()
    if (bins.isEmpty)
      return CompactResult(units.size.toLong, units.size.toLong, 0L, 0L, 0L,
        committed = false)

    // ONE rewrite job: broadcast (partition value -> bin) tag, one
    // file per bin. Rows never move across bins, and readEntriesOf
    // already scoped the scan to exactly the binned keys' rows.
    import spark.implicits._
    val binOfKey: Seq[(String, Int)] = bins.zipWithIndex.toSeq.flatMap {
      case (bin, i) => bin.flatMap(_._2.map(_._1)).map(k => k -> i)
    }
    val binned = readEntriesOf(spark, path, lines, binOfKey.map(_._1).toSet)
    val batch = s"$DataDir/compact-${java.util.UUID.randomUUID()}"
    val packed = binned
      .join(broadcast(binOfKey.toDF("__ck", "__bin")),
        col(partitionCol).cast("string") === col("__ck"), "inner")
      .drop("__ck")
      .repartition(col("__bin"))
      // Optional CLUSTERING inside each bin file (Z-order-lite on one
      // key chain): tightens parquet row-group/page stats so the
      // engine's own scan-time skipping bites inside the shared file.
      .sortWithinPartitions((col("__bin") +: sortWithinBins.map(col)): _*)
    // Rewritten shared dirs keep the table's PHYSICAL names uniform.
    toPhysical(packed, renameMapOf(propsOf(lines)))
      .write.partitionBy("__bin").parquet(s"$path/$batch")

    // New entries: each binned key re-points at its bin's shared dir,
    // CARRYING its stats/bloom suffix verbatim (per-key content is
    // unchanged, so recorded bounds and row counts stay exact);
    // untouched entries move through whole.
    val dirOfBin: Map[Int, String] = fs.listStatus(new Path(s"$path/$batch"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__bin="))
      .map(st => st.getPath.getName.stripPrefix("__bin=").toInt ->
        s"$batch/${st.getPath.getName}")
      .toMap
    require(dirOfBin.size == bins.size, s"ManifestTable.compact: wrote " +
      s"${dirOfBin.size} bin dirs for ${bins.size} planned bins — a bin lost its rows")
    val binByKey = binOfKey.toMap
    val newEntries = entries.map { case (k, value) =>
      binByKey.get(k) match {
        case None => k -> value
        case Some(b) =>
          val d = dirOfBin(b)
          // The rewrite FOLDED any pending DV and aux appendix in
          // (readEntriesOf applied/unioned them), so the carried
          // suffix drops the __dv/__aux items — and the now-stale
          // pre-fold __rowcount with them (fastCount falls back to a
          // real count for folded entries until the next statsful
          // merge re-records one). An aux fold ALSO drops zone maps
          // and blooms: appended rows may lie outside the recorded
          // bounds, so post-fold they would prune wrongly; a pure DV
          // fold keeps them (still-valid supersets).
          val items0 = statsOf(value)
            .map(_.split(';').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
          val hadDv = items0.exists(_.startsWith(s"$DvTag="))
          val hadAux = items0.exists(_.startsWith(s"$AuxTag="))
          val items =
            if (hadAux) Nil
            else if (!hadDv) items0
            // A DV fold keeps zone maps and blooms (still-valid
            // SUPERSETS — false keeps only) but must drop the KMV
            // sketch: it still holds the deleted values' hashes, and
            // unlike pruning metadata a distinct ESTIMATE has no
            // conservative direction — approxDistinct would count
            // erased rows. Its absence makes approxDistinct refuse
            // honestly until the next kmvColumns merge re-sketches.
            // Committed SUMS drop for the same reason — they still
            // include the deleted rows' values and have no
            // conservative direction. (Null counts KEEP: stale
            // counts only overestimate nulls post-delete — safe for
            // both IS-NULL prune directions — and the exact uses in
            // StatsAggRule all cross-check the rowcount, which is
            // gone until the next statsful merge.)
            else items0.filterNot(it => it.startsWith(s"$DvTag=") ||
              it.startsWith(s"$RowCountKey=") || it.contains(s"$KmvTag=") ||
              it.contains(s"$SumTag="))
          k -> (if (items.isEmpty) d else s"$d\t${items.mkString(";")}")
      }
    }
    val head =
      lines.collect { case e @ (SchemaKey, _) => e } ++
        Seq(CommitKey -> System.currentTimeMillis().toString,
          PartitionColKey -> partitionCol) ++
        lines.collect { case e @ (PropsKey, _) => e }
    writeManifest(fs, path, cur + 1, head ++ newEntries)
    cleanup(fs, path, keepVersions =
      (versions(fs, path) :+ (cur + 1)).distinct.sorted.takeRight(retainVersions).toSet)
    CompactResult(units.size.toLong,
      (units.size - bins.map(_.size).sum + bins.size).toLong,
      binOfKey.size.toLong, bins.size.toLong, bins.flatten.map(_._3).sum,
      committed = true)
  }

  /** A [[purgeDeletes]] result: how many data dirs carried a pending
    * deletion vector and were purged, how many manifest entries
    * (partition keys) were rewritten vs dropped outright (every row
    * of the key was deleted), and whether a version committed (false
    * = the table carried no DVs — no version burned). */
  final case class PurgeResult(dirsPurged: Long, entriesRewritten: Long,
                               entriesDropped: Long, committed: Boolean)

  /** PHYSICAL erasure follow-up to the DV (merge-on-read) delete
    * family: [[deleteByKeysMoR]]/[[deleteWhereMoR]] make deleted rows
    * LOGICALLY unreadable in O(sidecar) time, but the rows' bytes
    * remain in the data files (masked by the sidecar) and in every
    * retained prior version — the same caveat Delta documents for
    * deletion vectors before OPTIMIZE + VACUUM. `purgeDeletes`
    * completes the Art.-17 loop:
    *
    *   1. every entry of every dir that carries a `__dv` item
    *      rewrites ([[foldMoR]]'s mechanism — a keyed read folds the
    *      vectors in, a replaceTouched commit re-points the entries,
    *      bucket-specced tables re-land through the bucketed write
    *      path). The WHOLE dir rewrites, not just its DV'd entries:
    *      on a shared/compacted dir, leaving un-DV'd co-tenant
    *      entries pointing at the old dir would keep the purged
    *      bytes on disk;
    *   2. a key whose every row was deleted lands zero rows, so its
    *      entry DROPS from the manifest;
    *   3. the commit's cleanup expires prior versions down to
    *      `retainVersions` — deleting the pre-purge data dirs and the
    *      DV sidecars themselves.
    *
    * Physical removal holds only for what this call can see: with
    * `retainVersions` > 1 older retained snapshots still reference
    * the unpurged dirs, so callers wanting bytes-gone-NOW keep the
    * default 1 (deliberately stricter than other maintenance ops) and
    * give up time travel past this commit. Pass `statsColumns` /
    * `bloomColumns` to re-record skipping metadata on the purged dirs
    * — in particular, re-declare the erasure key's bloom so the NEXT
    * `eraseKeys` still prunes. Current table properties re-commit
    * verbatim (non-durable layout params must survive maintenance).
    * No-op (no version, `committed=false`) when no entry carries a
    * DV; idempotent — a second run sees none. */
  def purgeDeletes(spark: SparkSession, path: String,
                   retainVersions: Int = 1,
                   statsColumns: Seq[String] = Nil,
                   bloomColumns: Seq[String] = Nil,
                   bloomBits: Int = 8192): PurgeResult = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    require(ManifestTxn.active().isEmpty,
      "ManifestTable.purgeDeletes: physical erasure deletes dead dirs " +
        "immediately and cannot run inside a transaction (a rollback would " +
        "need them) — call it after the transaction commits; it is idempotent")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.purgeDeletes: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, cur)
    val pcol = partitionColOf(lines).getOrElse(sys.error(
      s"ManifestTable.purgeDeletes: no partition column recorded under $path"))
    val entries = dataEntries(lines)
    val dvDirs = entries.filter(e => dvRefOf(e._2).isDefined)
      .map(e => dirOf(e._2)).toSet
    if (dvDirs.isEmpty) return PurgeResult(0L, 0L, 0L, committed = false)
    // whole-dir coverage: every co-tenant key of a DV'd dir rewrites
    val touched = entries.filter(e => dvDirs(dirOf(e._2))).map(_._1).toSet
    val rows = readEntriesOf(spark, path, lines, touched)
    // bounded collect (<= |touched| values): which keys still hold
    // rows once the vectors fold in — an all-deleted purge must NOT
    // go through mergeCore (it would write an empty, never-referenced
    // batch dir that fsck then flags as an orphan)
    val survivors: Set[String] = rows
      .select(col(pcol).cast("string").as("__p")).distinct()
      .collect().map(_.getString(0)).toSet
    val prevProps = readProps(spark, path)
    if (survivors.isEmpty) {
      // every touched key lost every row: drop their entries in a
      // direct metadata commit (head + untouched entries), no data
      // write at all
      val head = lines.collect { case e @ (SchemaKey, _) => e } ++
        Seq(CommitKey -> System.currentTimeMillis().toString,
          PartitionColKey -> pcol) ++
        lines.collect { case e @ (PropsKey, _) => e }
      writeManifest(fs, path, cur + 1,
        head ++ entries.filterNot(e => touched(e._1)))
      cleanup(fs, path, keepVersions = (versions(fs, path) :+ (cur + 1))
        .distinct.sorted.takeRight(retainVersions).toSet)
    } else mergeCore(spark, path, rows, keys = Nil, partitionCol = pcol,
      preserveExisting = Nil, retainVersions = retainVersions,
      statsColumns = statsColumns, replaceTouched = true,
      props = prevProps, knownTouched = Some(touched),
      bloomColumns = bloomColumns, bloomBits = bloomBits,
      bucketSpec = bucketSpecOf(prevProps))
    // FINE-GRAINED dead-dir sweep. The commit's coarse cleanup works
    // at TOP-LEVEL batch-dir granularity: a batch dir with one still-
    // live co-tenant partition survives whole, including the purged
    // partitions' old subdirs — exactly the bytes this call promises
    // to remove. Delete each pre-purge DV'd dir that NO kept version
    // references any more (provably dead: we just re-pointed every
    // entry off it; with retainVersions > 1 an older kept snapshot
    // may still claim it, and then it stays — the documented trade).
    val keptRefs: Set[String] = versions(fs, path).flatMap(v =>
      dataEntries(readManifest(fs, path, v)).map(e => dirOf(e._2))).toSet
    dvDirs.filterNot(keptRefs).foreach { d =>
      val p = new Path(s"$path/$d")
      if (fs.exists(p)) fs.delete(p, true)
    }
    val after = dataEntries(readManifest(fs, path,
      latestVersion(fs, path).getOrElse(cur))).map(_._1).toSet
    PurgeResult(dvDirs.size.toLong, (touched & after).size.toLong,
      (touched -- after).size.toLong, committed = true)
  }

  /** PARTITION RESPEC — rewrite the table under a NEW partition
    * column in one atomic commit (the by-rewrite form of Iceberg's
    * partition-spec evolution; Hive-style layouts cannot do this
    * without a window where readers see both layouts). `derive`
    * optionally computes the new column from existing ones (additive
    * schema evolution — it becomes a real stored column, the hidden-
    * partitioning posture). Every OLD partition key is declared
    * touched so its entry drops in the same rename that introduces
    * the new keys; a reader resolves wholly-old-layout or wholly-new,
    * never a mix, and retained prior versions still time-travel under
    * the old layout. Cost: one full-table rewrite — the honest price
    * of a layout change; do it once, when the query pattern shifts. */
  def repartitionTable(spark: SparkSession, path: String, newPartitionCol: String,
                       derive: Option[org.apache.spark.sql.Column] = None,
                       retainVersions: Int = 2): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(latestVersion(fs, path).nonEmpty,
      s"ManifestTable.repartitionTable: no table at $path")
    require(!renameMapOf(readProps(spark, path)).contains(newPartitionCol),
      s"ManifestTable.repartitionTable: $newPartitionCol is a renamed column — " +
        "the partition column must read under its physical name (rename it back " +
        "first, or partition on another column)")
    val cur = read(spark, path)
    val df = derive match {
      case Some(e) =>
        require(!cur.columns.contains(newPartitionCol),
          s"ManifestTable.repartitionTable: $newPartitionCol already exists — omit derive")
        cur.withColumn(newPartitionCol, e)
      case None =>
        require(cur.columns.contains(newPartitionCol),
          s"ManifestTable.repartitionTable: no column $newPartitionCol — pass derive")
        cur
    }
    val newKeys = df.select(col(newPartitionCol).cast("string").as("__p")).distinct()
      .collect().map(r => Option(r.getString(0)).getOrElse(sys.error(
        s"ManifestTable.repartitionTable: null $newPartitionCol value"))).toSet
    merge(spark, path, df, keys = Nil, partitionCol = newPartitionCol,
      replaceTouched = true, retainVersions = retainVersions,
      knownTouched = Some(newKeys ++ partitionKeys(fs, path)))
  }

  /** MULTI-DIMENSIONAL Z-ORDER RE-CLUSTERING — Delta `OPTIMIZE ZORDER
    * BY`'s layout at this format's granularity: rewrite the table into
    * `2^(bits·cols)` partition dirs keyed by the INTERLEAVED bit ranks
    * of `cols`, so every clustered column's per-dir `[min, max]` is
    * tight and a selective probe on ANY of them — not just the
    * original partition column — prunes most dirs through the
    * committed zone maps ([[GraftFileIndex]] / [[readSkipping]]). At
    * 100 TB this is the difference between "only time filters skip"
    * and "the second and third most common predicates skip too".
    *
    * Ranks default to per-column QUANTILE buckets (one bounded
    * `approxQuantile` driver call per column — 2^bits-1 splits, so
    * data skew cannot starve buckets); pass `ranks` for an explicit,
    * externally-reproducible bucketing (fixed-width ranges, domain
    * codes). NULLs rank 0 (conservative: they cluster with the lowest
    * bucket and never mis-prune — zone maps exclude only on non-null
    * bounds). The rewrite is ONE [[merge]] under partition column
    * `__zb` (the zero-padded z value rides as a data column, like any
    * [[repartitionTable]] derivation); stats on every clustered
    * column are re-recorded. Returns the number of z-dirs written.
    *
    * INCREMENTAL MAINTENANCE (the lifecycle around the one-shot
    * OPTIMIZE-ZORDER): the quantile path COMMITS its spec — columns,
    * bits and the split points — as DURABLE table properties, which
    * enables
    *   - [[mergeZOrdered]]: cluster-on-write — later batches assign
    *     their own `__zb` from the committed splits and land in their
    *     z-dirs, so routine ingest does not erode clustering at all;
    *   - [[clusteringDebt]] / [[maybeRecluster]]: the O(manifest)
    *     health check + auto-recluster policy (the maybeCompact
    *     pattern) for when the DATA DISTRIBUTION drifts past the
    *     committed splits (mass piles into edge buckets).
    * Re-clustering is supported: on a table this function already
    * clustered (committed spec present), it recomputes the splits
    * from the CURRENT data and rewrites — `__zb` is recognized as the
    * cluster column, not a user column. The explicit-`ranks` path
    * commits columns + bits but no splits (an arbitrary Column is not
    * serializable metadata), so cluster-on-write refuses on such
    * tables and says why. */
  def clusterZOrder(spark: SparkSession, path: String, cols: Seq[String],
                    bits: Int = 3,
                    ranks: Option[Seq[org.apache.spark.sql.Column]] = None,
                    relativeError: Double = 0.001,
                    retainVersions: Int = 2,
                    statsColumns: Seq[String] = Nil,
                    bloomColumns: Seq[String] = Nil,
                    bloomBits: Int = 8192): Long = {
    require(cols.size >= 2,
      "ManifestTable.clusterZOrder: needs >= 2 columns (one column is a plain " +
        "range repartition — use repartitionTable)")
    require(bits >= 1 && bits * cols.size <= 20,
      s"ManifestTable.clusterZOrder: bits*cols must be in [${cols.size}, 20] " +
        s"(got $bits*${cols.size} -> ${1 << (bits * cols.size)} dirs)")
    ranks.foreach(r => require(r.size == cols.size,
      s"ManifestTable.clusterZOrder: ${r.size} rank expressions for ${cols.size} columns"))
    cols.foreach(c => require(!c.exists(";|=,".contains(_)),
      s"ManifestTable.clusterZOrder: column name '$c' would corrupt the " +
        "committed split encoding"))
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(latestVersion(fs, path).nonEmpty,
      s"ManifestTable.clusterZOrder: no table at $path")
    val prevProps = readProps(spark, path)
    val curRaw = read(spark, path)
    // a committed spec marks __zb as OURS (re-cluster: recompute and
    // overwrite); without one, a __zb column belongs to the user
    val cur =
      if (prevProps.contains(ZOrderColsProp)) curRaw.drop("__zb")
      else { require(!curRaw.columns.contains("__zb"),
        "ManifestTable.clusterZOrder: column __zb already exists and no " +
          "committed z-order spec claims it — refusing to overwrite user data")
        curRaw }
    cols.foreach(c => require(cur.columns.contains(c),
      s"ManifestTable.clusterZOrder: no column $c (have ${cur.columns.mkString(", ")})"))
    val buckets = 1 << bits
    // Explicit ranks are CLAMPED to [0, 2^bits): only `bits` low bits
    // interleave, so an out-of-domain rank would silently alias
    // distant buckets into one z-dir (correctness survives — zone maps
    // come from real footers — but clustering quality collapses with
    // no signal). Clamping keeps extremes in the edge buckets, which
    // is the monotone behavior a fixed-width-range caller expects.
    val splitsPerCol: Option[Seq[Array[Double]]] =
      if (ranks.isDefined) None
      else Some(cols.map { c =>
        val probs = (1 until buckets).map(_.toDouble / buckets).toArray
        cur.stat.approxQuantile(c, probs, relativeError).distinct.sorted
      })
    val rankCols = ranks.map(_.map(r =>
      least(lit(buckets - 1), greatest(lit(0), r.cast("int")))
    )).getOrElse(splitsPerCol.get.zip(cols).map { case (sp, c) =>
      zRankOf(col(c), sp) })
    val df = cur.withColumn("__zb", zBucketOf(rankCols, bits))
    val newKeys = df.select(col("__zb")).distinct()
      .collect().map(_.getString(0)).toSet // bounded: <= 2^(bits*cols)
    val zprops = Map(ZOrderColsProp -> cols.mkString(","),
      ZOrderBitsProp -> bits.toString) ++
      splitsPerCol.map(sp => ZOrderSplitsProp -> cols.zip(sp).map {
        case (c, arr) => s"$c=${arr.map(_.toString).mkString("|")}"
      }.mkString(";"))
    merge(spark, path, df, keys = Nil, partitionCol = "__zb",
      replaceTouched = true, retainVersions = retainVersions,
      knownTouched = Some(newKeys ++ partitionKeys(fs, path)),
      statsColumns = (cols ++ statsColumns).distinct, props = zprops,
      bloomColumns = bloomColumns, bloomBits = bloomBits)
    newKeys.size.toLong
  }

  /** Quantile rank of `c` against committed split points (the number
    * of splits strictly below the value; NULL ranks 0). */
  private def zRankOf(c: org.apache.spark.sql.Column,
                      splits: Array[Double]): org.apache.spark.sql.Column =
    splits.foldLeft(lit(0))((acc, s) => acc + when(c > lit(s), 1).otherwise(0))

  /** The zero-padded interleaved z value of per-column ranks. */
  private def zBucketOf(rankCols: Seq[org.apache.spark.sql.Column],
                        bits: Int): org.apache.spark.sql.Column = {
    val n = rankCols.size
    val buckets = 1 << bits
    val z = (0 until n).flatMap { j =>
      (0 until bits).map { i =>
        shiftleft(shiftright(rankCols(j).cast("int"), i).bitwiseAND(lit(1)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
    val pad = ((buckets << (bits * (n - 1))) - 1).toString.length
    format_string(s"%0${pad}d", coalesce(z, lit(0)))
  }

  private def zSpecOf(props: Map[String, String],
                      what: String): (Seq[String], Int, Map[String, Array[Double]]) = {
    val cols = props.getOrElse(ZOrderColsProp, sys.error(
      s"ManifestTable.$what: table is not z-ordered — run clusterZOrder first"))
      .split(',').toSeq
    val bits = props(ZOrderBitsProp).toInt
    val splits = props.getOrElse(ZOrderSplitsProp, sys.error(
      s"ManifestTable.$what: table was clustered with explicit ranks (no " +
        "committed splits) — re-cluster through the quantile path to enable " +
        "incremental maintenance")).split(';').map { part =>
      val i = part.indexOf('=')
      part.take(i) -> (if (part.length == i + 1) Array.empty[Double]
        else part.drop(i + 1).split("\\|").map(_.toDouble))
    }.toMap
    (cols, bits, splits)
  }

  /** CLUSTER-ON-WRITE — the maintenance half [[clusterZOrder]]'s
    * one-shot rewrite needs to stay true over time: a new batch
    * assigns its own `__zb` from the COMMITTED splits and merges under
    * the z partition column, so it lands in exactly the z-dirs its
    * values belong to (routine ingest erodes nothing; only the hit
    * dirs rewrite, like any merge). Quality then degrades only when
    * the DATA drifts past the committed splits — which
    * [[clusteringDebt]] watches and [[maybeRecluster]] repairs.
    *
    * Keyed upserts: LWW within the z-dirs the batch lands in — the
    * standard partitioned-upsert contract applies: if an existing
    * key's CLUSTERED column values change, the new row lands in its
    * new z-dir and the stale copy in the old dir must be deleted
    * explicitly (deleteByKeysMoR) — the merge cannot see it there.
    * Returns the z-dirs touched. */
  def mergeZOrdered(spark: SparkSession, path: String, incoming: DataFrame,
                    keys: Seq[String] = Nil,
                    preserveExisting: Seq[String] = Nil,
                    retainVersions: Int = 2,
                    statsColumns: Seq[String] = Nil,
                    bloomColumns: Seq[String] = Nil,
                    bloomBits: Int = 8192): Set[String] = {
    val (zcols, bits, splits) = zSpecOf(readProps(spark, path), "mergeZOrdered")
    zcols.foreach(c => require(incoming.columns.contains(c),
      s"ManifestTable.mergeZOrdered: incoming batch lacks clustered column $c"))
    val rankCols = zcols.map(c => zRankOf(col(c), splits(c)))
    val df = incoming.withColumn("__zb", zBucketOf(rankCols, bits))
    val touched = df.select(col("__zb")).distinct()
      .collect().map(_.getString(0)).toSet // bounded: <= 2^(bits*cols)
    merge(spark, path, df, keys = keys, partitionCol = "__zb",
      preserveExisting = preserveExisting, retainVersions = retainVersions,
      statsColumns = (zcols ++ statsColumns).distinct,
      knownTouched = Some(touched),
      bloomColumns = bloomColumns, bloomBits = bloomBits)
    touched
  }

  /** A [[clusteringDebt]] report. `debtFactor` is the policy signal:
    * the heaviest z-dir's row count over the ideal per-dir mass
    * (total / 2^(bits·cols)) — 1.0 = perfectly balanced, and a pile-up
    * in one bucket (the stale-splits signature: every new row ranks
    * into an edge bucket once the domain drifts) pushes it up
    * linearly. `avgSpanRatio` (mean over clustered columns of the
    * mean per-dir zone-map span / global span) is the read-side
    * observability companion: how much of the domain a probe-hit dir
    * drags in. */
  final case class ZOrderDebt(dirs: Long, rows: Long, maxDirRows: Long,
                              debtFactor: Double, avgSpanRatio: Double,
                              metadataOnly: Boolean)

  /** O(manifest) CLUSTERING HEALTH CHECK — no Spark job, no file
    * opened: per-dir row counts and zone maps are already committed
    * manifest metadata. `metadataOnly=false` (some entry lacks a
    * rowcount — e.g. a folded entry before its next statsful merge)
    * falls back to counting that entry's dir with a bounded read. */
  def clusteringDebt(spark: SparkSession, path: String): ZOrderDebt = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.clusteringDebt: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val (zcols, bits, _) = zSpecOf(propsOf(lines), "clusteringDebt")
    val entries = dataEntries(lines)
    if (entries.isEmpty)
      return ZOrderDebt(0L, 0L, 0L, 0.0, 0.0, metadataOnly = true)
    val counted = entries.map { case (k, value) =>
      rowCountOf(value).map(_ - dvRefOf(value).map(_._1).getOrElse(0L)
        + auxRefsOf(value).map(_._1).sum)
        .map(n => (n, true))
        .getOrElse((read(spark, path, _ == k).count(), false))
    }
    val rows = counted.map(_._1).sum
    val maxDir = counted.map(_._1).max
    val ideal = rows.toDouble / (1L << (bits * zcols.size))
    val metas = entries.map(e => entryMetaOf(e._2))
    val ratios = zcols.flatMap { c =>
      val spans = metas.flatMap(_.stats.get(c))
      if (spans.isEmpty) None
      else {
        val lo = spans.map(_._1).min
        val hi = spans.map(_._2).max
        val g = (hi - lo).toDouble
        if (g == 0.0) Some(0.0)
        else Some(spans.map(s => (s._2 - s._1).toDouble / g).sum / spans.size)
      }
    }
    ZOrderDebt(entries.size.toLong, rows, maxDir,
      if (ideal == 0.0) 0.0 else maxDir / ideal,
      if (ratios.isEmpty) 1.0 else ratios.sum / ratios.size,
      metadataOnly = counted.forall(_._2))
  }

  /** MAINTENANCE POLICY for clustering (the [[maybeCompact]] /
    * [[maybeFoldMoR]] pattern): O(manifest) while healthy; a real
    * re-cluster — fresh quantile splits from the CURRENT data, one
    * rewrite — only once the heaviest z-dir exceeds `maxDebtFactor` ×
    * the ideal per-dir mass AND the table is big enough for the
    * rewrite to matter (`minRows`). An ingest job calls this after
    * its [[mergeZOrdered]] batches; the common case costs one
    * manifest read. Returns the new z-dir count when it re-clustered. */
  def maybeRecluster(spark: SparkSession, path: String,
                     maxDebtFactor: Double = 4.0,
                     minRows: Long = 0L,
                     relativeError: Double = 0.001,
                     retainVersions: Int = 2,
                     statsColumns: Seq[String] = Nil,
                     bloomColumns: Seq[String] = Nil,
                     bloomBits: Int = 8192): Option[Long] = {
    require(maxDebtFactor > 1.0,
      s"maybeRecluster: maxDebtFactor must be > 1, got $maxDebtFactor")
    val (zcols, bits, _) = zSpecOf(readProps(spark, path), "maybeRecluster")
    val debt = clusteringDebt(spark, path)
    if (debt.debtFactor <= maxDebtFactor || debt.rows < minRows) None
    else Some(clusterZOrder(spark, path, zcols, bits,
      relativeError = relativeError, retainVersions = retainVersions,
      statsColumns = statsColumns, bloomColumns = bloomColumns,
      bloomBits = bloomBits))
  }

  /** A [[deepClone]] result: dirs and bytes copied. */
  final case class CloneResult(dirsCopied: Long, bytesCopied: Long)

  /** DEEP CLONE — materialize the LATEST snapshot of `src` as an
    * independent table at `dst` (Delta's `CREATE TABLE … DEEP CLONE`):
    * every referenced data dir is copied byte-for-byte under its own
    * relative name, and a fresh `m1` manifest carries the snapshot's
    * schema, partition column, properties, and per-entry stats/bloom
    * suffixes VERBATIM — so the clone is immediately skippable and
    * fastCount-able without a rewrite. After the clone the two tables
    * share nothing: either side merges, deletes, compacts or expires
    * without the other noticing — the backup / dev-fork workflow.
    *
    * The byte copy runs driver-side dir-by-dir ([[org.apache.hadoop.fs.FileUtil]]);
    * at real scale the copy step is a distcp-shaped job, but the
    * TABLE-level semantics — which dirs, and the one-manifest commit
    * that makes the clone appear atomically — are exactly this. A
    * SHALLOW clone (manifest-only, shared dirs) is deliberately NOT
    * offered: the source's retention would vacuum shared files out
    * from under the clone, the failure Delta documents and forbids
    * for vacuum'd shallow clones. */
  def deepClone(spark: SparkSession, src: String, dst: String): CloneResult = {
    val conf = spark.sparkContext.hadoopConfiguration
    val sfs = new Path(src).getFileSystem(conf)
    val dfs = new Path(dst).getFileSystem(conf)
    val v = latestVersion(sfs, src).getOrElse(
      sys.error(s"ManifestTable.deepClone: no manifest under $src/$ManifestDir"))
    require(latestVersion(dfs, dst).isEmpty,
      s"ManifestTable.deepClone: $dst already holds a table — refusing to overwrite")
    val lines = readManifest(sfs, src, v)
    // Data dirs plus any pending DV sidecars and aux appendices — a
    // clone without the DVs would resurrect deleted rows, one without
    // the aux dirs would lose updated rows.
    val dirs = (dataEntries(lines).map(e => dirOf(e._2)) ++
      dataEntries(lines).flatMap(e => dvRefOf(e._2).map(_._2)) ++
      dataEntries(lines).flatMap(e => auxRefsOf(e._2).map(_._2))).distinct
    var bytes = 0L
    dirs.foreach { d =>
      bytes += sfs.getContentSummary(new Path(s"$src/$d")).getLength
      require(org.apache.hadoop.fs.FileUtil.copy(
        sfs, new Path(s"$src/$d"), dfs, new Path(s"$dst/$d"),
        false, false, conf),
        s"ManifestTable.deepClone: copy of $d failed")
    }
    val head = lines.filter { case (k, _) => k == SchemaKey || k == PartitionColKey ||
      k == PropsKey }
    writeManifest(dfs, dst, 1L,
      head ++ Seq(CommitKey -> System.currentTimeMillis().toString) ++
        dataEntries(lines))
    CloneResult(dirs.size.toLong, bytes)
  }

  /** MAINTENANCE POLICY: compact only when the live snapshot
    * references more than `maxDirs` data dirs — the auto-OPTIMIZE
    * trigger an ingest job calls after every merge: O(1) manifest
    * metadata when healthy (None, no version burned, no Spark job),
    * a real [[compact]] only once the small-files debt crosses the
    * line. */
  def maybeCompact(spark: SparkSession, path: String, partitionCol: String,
                   maxDirs: Int,
                   targetBytes: Long = 128L << 20, minDirs: Int = 2,
                   retainVersions: Int = 2,
                   sortWithinBins: Seq[String] = Nil): Option[CompactResult] = {
    require(maxDirs >= 1, s"maybeCompact: maxDirs must be >= 1, got $maxDirs")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.maybeCompact: no manifest under $path/$ManifestDir"))
    val liveDirs = dataEntries(readManifest(fs, path, v))
      .map(e => dirOf(e._2)).distinct.size
    if (liveDirs <= maxDirs) None
    else Some(compact(spark, path, partitionCol, targetBytes, minDirs,
      retainVersions, sortWithinBins))
  }

  /** Fold pending MERGE-ON-READ DEBT — every entry carrying a DV
    * sidecar or an `__aux` appendix rewrites into plain data files
    * (the keyed read folds them; the replaceTouched commit re-points
    * the entries) — and ONLY those entries: debt-free partitions are
    * untouched. This is the maintenance primitive [[compact]] cannot
    * substitute for: bin-packing skips a lone small dir (`minDirs`),
    * so a single partition carrying months of appendix chain would
    * never fold through it. Pass `statsColumns`/`bloomColumns` to
    * re-record skipping metadata on the folded dirs (a fold
    * restores an aux-carrying entry's prunability). Returns the
    * number of partitions folded (0 = debt-free, no commit). */
  def foldMoR(spark: SparkSession, path: String, partitionCol: String,
              retainVersions: Int = 2,
              statsColumns: Seq[String] = Nil,
              bloomColumns: Seq[String] = Nil,
              bloomBits: Int = 8192,
              tokenBloomColumns: Seq[String] = Nil,
              tokenBloomBits: Int = 16384,
              kmvColumns: Seq[String] = Nil,
              kmvK: Int = 256,
              sumColumns: Seq[String] = Nil): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.foldMoR: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val debt = dataEntries(lines).filter { case (_, value) =>
      dvRefOf(value).nonEmpty || auxRefsOf(value).nonEmpty }.map(_._1).toSet
    if (debt.isEmpty) return 0L
    val rows = readEntriesOf(spark, path, lines, debt)
    // Sketch-family homogeneity: re-sketch the touched dirs with the
    // SAME k / mBits the table's existing sketches were committed with
    // (the committed parameter WINS over the argument default — a
    // table sketched at k=64 whose fold re-sketched at the 256 default
    // would end mixed-k and lose approxDistinct permanently). A table
    // with no committed sketch uses the argument as before.
    val effKmvK = committedSketchParam(lines, kmvColumns, KmvTag,
      p => p.substring(0, p.indexOf(':')).toInt, "KMV").getOrElse(kmvK)
    val effTokBits = committedSketchParam(lines, tokenBloomColumns, TokBloomTag,
      p => p.split(':')(1).toInt, "token-bloom").getOrElse(tokenBloomBits)
    // A bucket-specced table folds through the BUCKETED write path —
    // the folded rows re-land pre-hashed into the same layout, so the
    // table stays join-ready through its whole DV lifecycle (the
    // plain path would write un-bucket-named files).
    mergeCore(spark, path, rows, keys = Nil, partitionCol = partitionCol,
      preserveExisting = Nil, retainVersions = retainVersions,
      statsColumns = statsColumns, replaceTouched = true,
      props = Map.empty, knownTouched = Some(debt),
      bloomColumns = bloomColumns, bloomBits = bloomBits,
      bucketSpec = bucketSpecOf(readProps(spark, path)),
      tokenBloomColumns = tokenBloomColumns, tokenBloomBits = effTokBits,
      kmvColumns = kmvColumns, kmvK = effKmvK, sumColumns = sumColumns)
    debt.size.toLong
  }

  /** MAINTENANCE POLICY for merge-on-read debt (the [[maybeCompact]]
    * pattern): O(1) manifest metadata while healthy; a real
    * [[foldMoR]] only once more than `maxPending` entries carry a DV
    * or appendix. An ingest job calls this after its MoR
    * deletes/updates so read-side anti-join and appendix-union costs
    * stay bounded. */
  def maybeFoldMoR(spark: SparkSession, path: String, partitionCol: String,
                   maxPending: Int,
                   retainVersions: Int = 2,
                   statsColumns: Seq[String] = Nil,
                   bloomColumns: Seq[String] = Nil,
                   bloomBits: Int = 8192,
                   tokenBloomColumns: Seq[String] = Nil,
                   tokenBloomBits: Int = 16384,
                   kmvColumns: Seq[String] = Nil,
                   kmvK: Int = 256,
                   sumColumns: Seq[String] = Nil): Option[Long] = {
    require(maxPending >= 0, s"maybeFoldMoR: maxPending must be >= 0, got $maxPending")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.maybeFoldMoR: no manifest under $path/$ManifestDir"))
    val pending = dataEntries(readManifest(fs, path, v)).count { case (_, value) =>
      dvRefOf(value).nonEmpty || auxRefsOf(value).nonEmpty }
    if (pending <= maxPending) None
    else Some(foldMoR(spark, path, partitionCol, retainVersions, statsColumns,
      bloomColumns, bloomBits, tokenBloomColumns, tokenBloomBits,
      kmvColumns, kmvK, sumColumns))
  }

  // ------------------------------------------------------------------
  // ROW-LEVEL DELETE / UPDATE (r11) — copy-on-write, the Delta-default
  // strategy: ONE column-pruned counting scan over the candidate
  // partitions finds which partitions actually contain matching rows,
  // then ONLY those partitions rewrite (through the existing
  // replaceTouched commit path — same manifest rename, same retention,
  // same schema guards). A partition whose every row matches a DELETE
  // is dropped from the manifest without being read a second time. At
  // 100 TB the cost is O(matching partitions) data rewrite + one scan
  // of the candidate window — never a full-table rewrite; callers
  // narrow the window further with `partitionFilter` (the replaceWhere
  // discipline: the caller asserts the predicate cannot match outside
  // the window, and rows outside it are left untouched by contract).
  //
  // SQL semantics are preserved exactly: a row where the predicate
  // evaluates to NULL is NOT matched (DELETE removes only
  // predicate-IS-TRUE rows; UPDATE leaves NULL-predicate rows
  // unchanged), and UPDATE assignment right-hand sides all evaluate
  // against the PRE-update row, whatever order the assignments are
  // given in.
  // ------------------------------------------------------------------

  /** Evidence a [[deleteWhere]]/[[updateWhere]] returns: how many rows
    * matched, how many partitions rewrote / dropped / were scanned,
    * and whether a new version was committed at all (a no-match op is
    * a no-op — it burns no version and rewrites nothing). */
  final case class RowOpResult(rowsMatched: Long, partitionsRewritten: Long,
                               partitionsDropped: Long, partitionsScanned: Long,
                               partitionsTotal: Long, committed: Boolean)

  /** Per-candidate-partition (value, matchedRows, totalRows) in ONE
    * column-pruned Spark job (the scan reads only `partitionCol` plus
    * the predicate's input columns). Bounded collect: O(partitions). */
  private def matchCounts(spark: SparkSession, path: String, version: Long,
                          candidates: Seq[(String, String)], partitionCol: String,
                          hit: org.apache.spark.sql.Column): Seq[(String, Long, Long)] =
    readKeys(spark, path, version, candidates.map(_._1).toSet)
      .groupBy(col(partitionCol).cast("string").as("__p"))
      .agg(sum(when(hit, lit(1L)).otherwise(lit(0L))).as("__m"),
        count(lit(1)).as("__t"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  /** DELETE FROM the table WHERE `predicate` — copy-on-write. Rows
    * where the predicate is NULL are kept (SQL DELETE semantics).
    * Partitions left empty by the delete are dropped from the manifest
    * (dir-level delete, the partition never rewrites); partitions with
    * surviving rows rewrite whole; partitions with no matching row are
    * untouched (their manifest entries — and zone-map stats — carry
    * forward verbatim). Time travel still reads the pre-delete rows
    * through any retained earlier version. */
  def deleteWhere(spark: SparkSession, path: String, partitionCol: String,
                  predicate: org.apache.spark.sql.Column,
                  partitionFilter: String => Boolean = _ => true,
                  retainVersions: Int = 2,
                  statsColumns: Seq[String] = Nil,
                  bloomColumns: Seq[String] = Nil,
                  bloomBits: Int = 8192): RowOpResult = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.deleteWhere: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val entries = dataEntries(lines)
    val candidates = entries.filter(e => partitionFilter(e._1))
    if (candidates.isEmpty)
      return RowOpResult(0L, 0L, 0L, 0L, entries.size.toLong, committed = false)
    val hit = coalesce(predicate, lit(false))
    val counts = matchCounts(spark, path, v, candidates, partitionCol, hit)
    val touched = counts.filter(_._2 > 0L)
    if (touched.isEmpty)
      return RowOpResult(0L, 0L, 0L, candidates.size.toLong, entries.size.toLong,
        committed = false)
    val rewritten = touched.filter { case (_, m, t) => m < t }
    val incoming =
      if (rewritten.isEmpty)
        // Every matched partition empties wholesale — commit a pure
        // partition drop; the empty frame shapes the schema guards.
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          committedSchema(lines).getOrElse(
            readEntriesOf(spark, path, lines, Set(candidates.head._1)).schema))
      else readEntriesOf(spark, path, lines, rewritten.map(_._1).toSet).filter(!hit)
    merge(spark, path, incoming, keys = Nil, partitionCol = partitionCol,
      retainVersions = retainVersions, statsColumns = statsColumns,
      replaceTouched = true, knownTouched = Some(touched.map(_._1).toSet),
      bloomColumns = bloomColumns, bloomBits = bloomBits)
    RowOpResult(touched.map(_._2).sum, rewritten.size.toLong,
      (touched.size - rewritten.size).toLong, candidates.size.toLong,
      entries.size.toLong, committed = true)
  }

  /** A [[deleteByKeys]] result: the row-op outcome plus the bloom
    * pruning evidence (how many live dirs the key probe touched). */
  final case class KeyDeleteResult(op: RowOpResult, dirsProbed: Long, dirsTotal: Long)

  /** TARGETED DELETE BY KEY LIST — the right-to-be-forgotten path: a
    * GDPR erasure request arrives as a (small) list of subject keys,
    * and at 100 TB the difference between "scan everything for 50
    * ids" and this is the whole feature. The committed bloom
    * dir-index on `keyCol` restricts the candidate partitions to the
    * dirs that MIGHT hold any of the keys (no false negatives — a
    * bloom'd dir that skips provably holds none of them; un-bloom'd
    * dirs are always probed, fail-safe), then [[deleteWhere]] runs
    * its counting scan + copy-on-write rewrite over just those.
    * Stringified-key matching follows the bloom's own
    * `CAST(col AS STRING)` convention. */
  def deleteByKeys(spark: SparkSession, path: String, partitionCol: String,
                   keyCol: String, keys: Seq[String],
                   retainVersions: Int = 2,
                   statsColumns: Seq[String] = Nil,
                   bloomColumns: Seq[String] = Nil,
                   bloomBits: Int = 8192): KeyDeleteResult = {
    require(keys.nonEmpty, "ManifestTable.deleteByKeys: empty key list")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.deleteByKeys: no manifest under $path/$ManifestDir"))
    val live = dataEntries(readManifest(fs, path, v))
    val candidateEntries = live.filter { case (_, entryValue) =>
      // an aux appendix may hold key values outside the recorded
      // bloom (an update can assign the key column) — always probe
      auxRefsOf(entryValue).nonEmpty || (bloomOf(entryValue, keyCol) match {
        case Some(payload) => keys.exists(k => bloomContains(payload, k))
        case None => true // no filter recorded -> cannot prune safely
      })
    }
    val candidates = candidateEntries.map(_._1).toSet
    val op =
      if (candidates.isEmpty)
        RowOpResult(0L, 0L, 0L, 0L, live.size.toLong, committed = false)
      else deleteWhere(spark, path, partitionCol,
        col(keyCol).cast("string").isInCollection(keys),
        partitionFilter = candidates.contains,
        retainVersions = retainVersions, statsColumns = statsColumns,
        bloomColumns = bloomColumns, bloomBits = bloomBits)
    // DISTINCT data dirs, not partition entries: after compaction
    // several entries share one dir, and the pruning evidence must
    // reflect physical scan work (as readSkippingEquals counts it).
    KeyDeleteResult(op, candidateEntries.map(e => dirOf(e._2)).distinct.size.toLong,
      live.map(e => dirOf(e._2)).distinct.size.toLong)
  }

  /** UPDATE the table SET `assignments` WHERE `predicate` —
    * copy-on-write. Rows where the predicate is NULL are unchanged;
    * every assignment right-hand side evaluates against the PRE-update
    * row. Only partitions containing a matching row rewrite. The
    * partition column cannot be assigned (a row moving across
    * partition dirs breaks the stable-partition contract — model that
    * as delete + re-merge), and assignments must target EXISTING
    * columns (add columns through [[merge]]'s additive evolution, not
    * through an update). A retype in an assignment is refused by the
    * commit's schema guard. */
  def updateWhere(spark: SparkSession, path: String, partitionCol: String,
                  predicate: org.apache.spark.sql.Column,
                  assignments: Map[String, org.apache.spark.sql.Column],
                  partitionFilter: String => Boolean = _ => true,
                  retainVersions: Int = 2,
                  statsColumns: Seq[String] = Nil,
                  bloomColumns: Seq[String] = Nil,
                  bloomBits: Int = 8192): RowOpResult = {
    require(assignments.nonEmpty, "ManifestTable.updateWhere: no assignments")
    require(!assignments.contains(partitionCol),
      s"ManifestTable.updateWhere: cannot assign partition column $partitionCol — " +
        "a row moving across partition dirs breaks the stable-partition contract")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.updateWhere: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val entries = dataEntries(lines)
    val candidates = entries.filter(e => partitionFilter(e._1))
    if (candidates.isEmpty)
      return RowOpResult(0L, 0L, 0L, 0L, entries.size.toLong, committed = false)
    val hit = coalesce(predicate, lit(false))
    val counts = matchCounts(spark, path, v, candidates, partitionCol, hit)
    val touched = counts.filter(_._2 > 0L)
    if (touched.isEmpty)
      return RowOpResult(0L, 0L, 0L, candidates.size.toLong, entries.size.toLong,
        committed = false)
    val base = readEntriesOf(spark, path, lines, touched.map(_._1).toSet)
    val missing = assignments.keys.filterNot(base.columns.contains)
    require(missing.isEmpty, "ManifestTable.updateWhere: assignment to column(s) " +
      s"${missing.mkString(", ")} not in the table — additive columns go through merge")
    // Stage every new value under a temp name FIRST so each RHS sees
    // the pre-update row, then swap them in (UPDATE evaluation order).
    val staged = assignments.toSeq.zipWithIndex
    val withTmp = staged.foldLeft(base) { case (df, ((c, e), i)) =>
      df.withColumn(s"__upd_$i", when(hit, e).otherwise(col(c)))
    }
    val incoming = staged.foldLeft(withTmp) { case (df, ((c, _), i)) =>
      df.withColumn(c, col(s"__upd_$i"))
    }.drop(staged.map { case (_, i) => s"__upd_$i" }: _*)
    merge(spark, path, incoming, keys = Nil, partitionCol = partitionCol,
      retainVersions = retainVersions, statsColumns = statsColumns,
      replaceTouched = true, knownTouched = Some(touched.map(_._1).toSet),
      bloomColumns = bloomColumns, bloomBits = bloomBits)
    RowOpResult(touched.map(_._2).sum, touched.size.toLong, 0L,
      candidates.size.toLong, entries.size.toLong, committed = true)
  }

  /** Evidence a [[deleteWhereMoR]] returns: rows newly deleted, how
    * many partitions took a DV, how many were scanned, and the
    * headline physical fact — `dirsRewritten` is ALWAYS 0 (the whole
    * point of merge-on-read; the field exists so gates can pin it). */
  final case class DvDeleteResult(rowsDeleted: Long, partitionsAffected: Long,
                                  partitionsScanned: Long, partitionsTotal: Long,
                                  dirsRewritten: Long, committed: Boolean)

  /** DELETE FROM the table WHERE `predicate` — MERGE-ON-READ. Instead
    * of rewriting matched partitions ([[deleteWhere]]'s copy-on-write),
    * this records each matched row's physical address in a per-
    * partition DV sidecar and commits ONE manifest rename that
    * re-points the touched entries — zero data dirs rewrite, whatever
    * the table size. Reads, CDC, incremental views, [[fastCount]] and
    * time travel all observe the delete exactly as if the rows were
    * rewritten away; [[compact]] or any merge touching the partition
    * later folds the DV into real files and drops it.
    *
    * SQL semantics match [[deleteWhere]]: NULL-predicate rows are
    * kept. A second MoR delete on a partition MERGES its positions
    * into the existing DV (one sidecar per entry, ever). CONTRACT:
    * the matched set is collected to the driver (that is what makes
    * the commit O(deleted rows), not O(table)) — this is the
    * erasure-scale path; a delete matching a large fraction of the
    * table belongs on [[deleteWhere]], whose cost is the rewrite it
    * performs anyway. Safe under [[withCommitRetry]]: a lost version
    * race re-plans against the winner's head. */
  def deleteWhereMoR(spark: SparkSession, path: String, partitionCol: String,
                     predicate: org.apache.spark.sql.Column,
                     partitionFilter: String => Boolean = _ => true,
                     retainVersions: Int = 2,
                     extraProps: Map[String, String] = Map.empty): DvDeleteResult = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.deleteWhereMoR: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    // Deliberately NO bucket-agreement check: a deletion vector is a
    // POSITION sidecar — no row moves, no file rewrites, the bucket
    // layout invariant holds exactly (Iceberg's bucket + position-
    // deletes composition). registerBucketed overlays the DV
    // anti-join as a broadcast join, which preserves the scan's
    // HashPartitioning — the fact⋈fact join stays zero-exchange.
    // Appendix-writing updateWhereMoR stays refused (appended rows
    // would detach from their hash bucket).
    partitionColOf(lines).foreach(h => require(h == partitionCol,
      s"ManifestTable.deleteWhereMoR: table partition column is $h, not $partitionCol"))
    val entries = dataEntries(lines)
    val candidates = entries.filter(e => partitionFilter(e._1))
    if (candidates.isEmpty)
      return DvDeleteResult(0L, 0L, 0L, entries.size.toLong, 0L, committed = false)
    val hit = coalesce(predicate, lit(false))
    // ONE scan of the candidate window, with physical addresses and
    // the EXISTING DVs applied — so matches are rows live right now,
    // and a re-run of the same delete is an idempotent no-op.
    val matched = readEntriesOf(spark, path, lines, candidates.map(_._1).toSet,
        withPos = true)
      .filter(hit)
      .select(col(partitionCol).cast("string"), col(FileKeyCol), col(RowPosCol))
      .collect()
    if (matched.isEmpty)
      return DvDeleteResult(0L, 0L, candidates.size.toLong, entries.size.toLong, 0L,
        committed = false)
    val entryByKey = entries.toMap
    val byPart: Seq[(String, Seq[(String, Long)])] = matched
      .groupBy(r => Option(r.getString(0)).getOrElse(sys.error(
        s"ManifestTable.deleteWhereMoR: null $partitionCol value in a matched row")))
      .toSeq.sortBy(_._1)
      .map { case (p, rs) => p -> rs.toSeq.map(r => (r.getString(1), r.getLong(2))) }
    // One sidecar dir per commit; per touched entry, merge the new
    // positions with any existing DV (an entry references exactly one
    // sidecar at a time — the superseded one becomes sweepable).
    val dvDir = s"$DataDir/dv-${java.util.UUID.randomUUID()}"
    val newRefs: Map[String, (Long, String)] = byPart.zipWithIndex.map {
      case ((p, pairs), i) =>
        val old = dvRefOf(entryByKey.getOrElse(p, sys.error(
            s"ManifestTable.deleteWhereMoR: matched partition $p has no manifest entry")))
          .map(r => loadDv(fs, path, r._2)).getOrElse(Nil)
        val all = (old ++ pairs).distinct
        val rel = s"$dvDir/p$i.dv"
        writeDv(fs, path, rel, all)
        p -> (all.size.toLong, rel)
    }.toMap
    val newEntries = entries.map { case (k, value) =>
      newRefs.get(k) match {
        case None => k -> value
        case Some((n, rel)) => k -> setDvItem(value, n, rel)
      }
    }
    val head = lines.collect { case e @ (SchemaKey, _) => e } ++
      Seq(CommitKey -> System.currentTimeMillis().toString,
        PartitionColKey -> partitionCol) ++
      morPropLines(lines, extraProps)
    writeManifest(fs, path, v + 1, head ++ newEntries)
    cleanup(fs, path, keepVersions =
      (versions(fs, path) :+ (v + 1)).distinct.sorted.takeRight(retainVersions).toSet)
    DvDeleteResult(matched.length.toLong, byPart.size.toLong,
      candidates.size.toLong, entries.size.toLong, dirsRewritten = 0L,
      committed = true)
  }

  /** The props line a merge-on-read commit carries: the PREVIOUS
    * version's properties merged under `extraProps` — the extra keys
    * commit ATOMICALLY with the DV/appendix rename, which is what the
    * exactly-once streaming-erasure marker needs. */
  private def morPropLines(lines: Seq[(String, String)],
                           extraProps: Map[String, String]): Seq[(String, String)] = {
    if (extraProps.isEmpty) lines.collect { case e @ (PropsKey, _) => e }
    else {
      val merged = propsOf(lines) ++ extraProps
      Seq(PropsKey -> merged.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${escapeProp(k)}=${escapeProp(v)}" }.mkString(";"))
    }
  }

  /** Evidence an [[updateWhereMoR]] returns: rows updated, partitions
    * that took a DV+appendix, the scan/total window, and the headline
    * physical fact — `dirsRewritten` is ALWAYS 0 (gate-pinnable). */
  final case class DvUpdateResult(rowsUpdated: Long, partitionsAffected: Long,
                                  partitionsScanned: Long, partitionsTotal: Long,
                                  dirsRewritten: Long, committed: Boolean)

  /** UPDATE the table SET `assignments` WHERE `predicate` —
    * MERGE-ON-READ (the Iceberg-v2 update form). Instead of rewriting
    * every matched partition ([[updateWhere]]'s copy-on-write), this
    * commits, in ONE manifest rename:
    *
    *   - a deletion vector over the matched rows' physical positions
    *     (exactly [[deleteWhereMoR]]'s machinery), and
    *   - an `__aux` APPENDIX dir per touched partition holding the
    *     updated rows, written by one distributed job.
    *
    * Zero existing data dirs rewrite, whatever the table size — on a
    * wide 100 TB table a single-column correction pays only the
    * updated rows' write, not a partition rewrite. Reads, CDC,
    * incremental views, [[fastCount]] (DV count out, aux count in —
    * still metadata-only) and time travel observe the update exactly
    * as if the partitions were rewritten; [[compact]] or any merge
    * touching the partition later folds DV+appendix into real files.
    *
    * SQL semantics match [[updateWhere]]: NULL-predicate rows are
    * unchanged, every assignment RHS evaluates against the PRE-update
    * row, the partition column cannot be assigned, and assignments
    * must target existing columns. An entry carrying an appendix is
    * exempt from zone-map/bloom pruning until folded (updated values
    * may lie outside the recorded bounds — see [[AuxTag]]). A second
    * MoR update composes: its DV may address appendix files, and its
    * appendix joins the entry's ref list. CONTRACT: matched-row
    * ADDRESSES are collected to the driver (O(updated rows), as for
    * [[deleteWhereMoR]]); row CONTENT flows executor-side only. A
    * large-fraction update belongs on [[updateWhere]]. */
  def updateWhereMoR(spark: SparkSession, path: String, partitionCol: String,
                     predicate: org.apache.spark.sql.Column,
                     assignments: Map[String, org.apache.spark.sql.Column],
                     partitionFilter: String => Boolean = _ => true,
                     retainVersions: Int = 2): DvUpdateResult = {
    require(assignments.nonEmpty, "ManifestTable.updateWhereMoR: no assignments")
    require(!assignments.contains(partitionCol),
      s"ManifestTable.updateWhereMoR: cannot assign partition column $partitionCol — " +
        "a row moving across partition dirs breaks the stable-partition contract")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.updateWhereMoR: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    requireBucketAgreement(spark, path, None, "updateWhereMoR")
    partitionColOf(lines).foreach(h => require(h == partitionCol,
      s"ManifestTable.updateWhereMoR: table partition column is $h, not $partitionCol"))
    val entries = dataEntries(lines)
    val candidates = entries.filter(e => partitionFilter(e._1))
    if (candidates.isEmpty)
      return DvUpdateResult(0L, 0L, 0L, entries.size.toLong, 0L, committed = false)
    val hit = coalesce(predicate, lit(false))
    // ONE scan of the candidate window with physical addresses and
    // existing DVs/appendices applied — matches are rows live right
    // now, so re-running the same idempotent assignment (x := c)
    // re-addresses the appendix rows, never resurrects old ones.
    val scanned = readEntriesOf(spark, path, lines, candidates.map(_._1).toSet,
      withPos = true)
    val missing = assignments.keys.filterNot(c =>
      scanned.columns.contains(c) && c != FileKeyCol && c != RowPosCol)
    require(missing.isEmpty, "ManifestTable.updateWhereMoR: assignment to column(s) " +
      s"${missing.mkString(", ")} not in the table — additive columns go through merge")
    val matched = scanned.filter(hit)
    val addrs = matched
      .select(col(partitionCol).cast("string"), col(FileKeyCol), col(RowPosCol))
      .collect()
    if (addrs.isEmpty)
      return DvUpdateResult(0L, 0L, candidates.size.toLong, entries.size.toLong, 0L,
        committed = false)
    // The updated rows — staged assignment so every RHS sees the
    // pre-update row (UPDATE evaluation order), then one distributed
    // write partitioned like merge's batch dirs.
    val staged = assignments.toSeq.zipWithIndex
    val withTmp = staged.foldLeft(matched) { case (df, ((_, e), i)) =>
      df.withColumn(s"__upd_$i", e)
    }
    val updatedDf = staged.foldLeft(withTmp) { case (df, ((c, _), i)) =>
      df.withColumn(c, col(s"__upd_$i"))
    }.drop(staged.map { case (_, i) => s"__upd_$i" }: _*)
      .drop(FileKeyCol, RowPosCol)
    // CHECK constraints apply to the updated values too — an UPDATE
    // must not be a constraint side door (Delta enforces the same).
    checkConstraints(updatedDf, propsOf(lines), "updateWhereMoR")
    val auxBatch = s"$DataDir/aux-${java.util.UUID.randomUUID()}"
    // Appendix files keep the table's PHYSICAL names uniform.
    toPhysical(updatedDf, renameMapOf(propsOf(lines)))
      .withColumn("__pdir", col(partitionCol).cast("string"))
      .repartition(col("__pdir"))
      .write.partitionBy("__pdir").parquet(s"$path/$auxBatch")
    val auxDirByPart: Map[String, String] =
      listPartitionDirs(fs, s"$path/$auxBatch").map { name =>
        unescapePathName(name.stripPrefix("__pdir=")) -> s"$auxBatch/$name"
      }.toMap
    val entryByKey = entries.toMap
    val byPart: Seq[(String, Seq[(String, Long)])] = addrs
      .groupBy(r => Option(r.getString(0)).getOrElse(sys.error(
        s"ManifestTable.updateWhereMoR: null $partitionCol value in a matched row")))
      .toSeq.sortBy(_._1)
      .map { case (p, rs) => p -> rs.toSeq.map(r => (r.getString(1), r.getLong(2))) }
    require(byPart.map(_._1).toSet == auxDirByPart.keySet,
      "ManifestTable.updateWhereMoR: appendix write produced partitions " +
        s"${auxDirByPart.keySet} but matched rows span ${byPart.map(_._1).toSet} — " +
        "a partition-value string roundtrip break; refusing to commit")
    val dvDir = s"$DataDir/dv-${java.util.UUID.randomUUID()}"
    val newValues: Map[String, String] = byPart.zipWithIndex.map {
      case ((p, pairs), i) =>
        val value = entryByKey.getOrElse(p, sys.error(
          s"ManifestTable.updateWhereMoR: matched partition $p has no manifest entry"))
        val old = dvRefOf(value).map(r => loadDv(fs, path, r._2)).getOrElse(Nil)
        val all = (old ++ pairs).distinct
        val rel = s"$dvDir/p$i.dv"
        writeDv(fs, path, rel, all)
        val withDv = setDvItem(value, all.size.toLong, rel)
        p -> setAuxItem(withDv,
          auxRefsOf(value) :+ (pairs.size.toLong, auxDirByPart(p)))
    }.toMap
    val newEntries = entries.map { case (k, value) =>
      k -> newValues.getOrElse(k, value)
    }
    val head = lines.collect { case e @ (SchemaKey, _) => e } ++
      Seq(CommitKey -> System.currentTimeMillis().toString,
        PartitionColKey -> partitionCol) ++
      lines.collect { case e @ (PropsKey, _) => e }
    writeManifest(fs, path, v + 1, head ++ newEntries)
    cleanup(fs, path, keepVersions =
      (versions(fs, path) :+ (v + 1)).distinct.sorted.takeRight(retainVersions).toSet)
    DvUpdateResult(addrs.length.toLong, byPart.size.toLong,
      candidates.size.toLong, entries.size.toLong, dirsRewritten = 0L,
      committed = true)
  }

  /** A [[updateByKeysMoR]] result: the DV+appendix outcome plus the
    * bloom pruning evidence. */
  final case class KeyDvUpdateResult(op: DvUpdateResult, dirsProbed: Long,
                                     dirsTotal: Long)

  /** TARGETED MERGE-ON-READ UPDATE BY KEY LIST — the rectification
    * half of the right-to-be-forgotten family (GDPR Art. 16 next to
    * Art. 17's [[deleteByKeysMoR]]): a correction request arrives as
    * a (small) list of subject keys plus assignments, the committed
    * bloom dir-index narrows the scan to dirs that MIGHT hold any of
    * them (no false negatives; un-bloom'd and aux-carrying dirs probe
    * fail-safe), and [[updateWhereMoR]] commits DV + appendix in one
    * rename — zero dirs rewritten. */
  def updateByKeysMoR(spark: SparkSession, path: String, partitionCol: String,
                      keyCol: String, keys: Seq[String],
                      assignments: Map[String, org.apache.spark.sql.Column],
                      retainVersions: Int = 2): KeyDvUpdateResult = {
    require(keys.nonEmpty, "ManifestTable.updateByKeysMoR: empty key list")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.updateByKeysMoR: no manifest under $path/$ManifestDir"))
    val live = dataEntries(readManifest(fs, path, v))
    val candidateEntries = live.filter { case (_, entryValue) =>
      auxRefsOf(entryValue).nonEmpty || (bloomOf(entryValue, keyCol) match {
        case Some(payload) => keys.exists(k => bloomContains(payload, k))
        case None => true // no filter recorded -> cannot prune safely
      })
    }
    val candidates = candidateEntries.map(_._1).toSet
    val op =
      if (candidates.isEmpty)
        DvUpdateResult(0L, 0L, 0L, live.size.toLong, 0L, committed = false)
      else updateWhereMoR(spark, path, partitionCol,
        col(keyCol).cast("string").isInCollection(keys), assignments,
        partitionFilter = candidates.contains, retainVersions = retainVersions)
    KeyDvUpdateResult(op, candidateEntries.map(e => dirOf(e._2)).distinct.size.toLong,
      live.map(e => dirOf(e._2)).distinct.size.toLong)
  }

  /** A [[deleteByKeysMoR]] result: the DV outcome plus the bloom
    * pruning evidence. */
  final case class KeyDvDeleteResult(op: DvDeleteResult, dirsProbed: Long,
                                     dirsTotal: Long)

  /** TARGETED MERGE-ON-READ DELETE BY KEY LIST — [[deleteByKeys]]'s
    * bloom-pruned candidate narrowing (a dir whose committed bloom
    * says every key is absent is never scanned; un-bloom'd dirs probe
    * fail-safe) feeding [[deleteWhereMoR]]'s zero-rewrite commit: the
    * full right-to-be-forgotten path at 100 TB touches the few dirs
    * that might hold the subjects, writes a KB-scale sidecar, and
    * renames one manifest. */
  def deleteByKeysMoR(spark: SparkSession, path: String, partitionCol: String,
                      keyCol: String, keys: Seq[String],
                      retainVersions: Int = 2,
                      extraProps: Map[String, String] = Map.empty): KeyDvDeleteResult = {
    require(keys.nonEmpty, "ManifestTable.deleteByKeysMoR: empty key list")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.deleteByKeysMoR: no manifest under $path/$ManifestDir"))
    val live = dataEntries(readManifest(fs, path, v))
    val candidateEntries = live.filter { case (_, entryValue) =>
      // an aux appendix may hold key values outside the recorded
      // bloom (an update can assign the key column) — always probe
      auxRefsOf(entryValue).nonEmpty || (bloomOf(entryValue, keyCol) match {
        case Some(payload) => keys.exists(k => bloomContains(payload, k))
        case None => true // no filter recorded -> cannot prune safely
      })
    }
    val candidates = candidateEntries.map(_._1).toSet
    val op =
      if (candidates.isEmpty)
        DvDeleteResult(0L, 0L, 0L, live.size.toLong, 0L, committed = false)
      else deleteWhereMoR(spark, path, partitionCol,
        col(keyCol).cast("string").isInCollection(keys),
        partitionFilter = candidates.contains, retainVersions = retainVersions,
        extraProps = extraProps)
    // DISTINCT data dirs (compaction makes entries share dirs) — the
    // evidence must reflect physical scans, not manifest entries.
    KeyDvDeleteResult(op, candidateEntries.map(e => dirOf(e._2)).distinct.size.toLong,
      live.map(e => dirOf(e._2)).distinct.size.toLong)
  }

  /** Apply a CDC batch — rows carrying the table's columns plus an op
    * (`insert` / `update` / `delete`) and a version — to the manifest
    * table with [[Merge.applyChangeFeed]] semantics: per key the
    * highest-version op wins within the batch, delete winners drop the
    * key, insert/update winners upsert it. Partition-scoped like
    * [[merge]]: only the partitions the feed names are read and
    * rewritten (delete rows carry their row's partition value, so a
    * delete-only partition is still declared), and a partition the
    * batch empties is dropped from the manifest. Creates the table on
    * first call (schema = the feed minus op/version). This is the
    * Debezium-shaped ingestion path: land row-level change streams
    * without materializing the full table. CONTRACT: `partitionCol`
    * stable per key, as for [[merge]]. */
  def applyChanges(spark: SparkSession, path: String, feed: DataFrame,
                   keys: Seq[String], partitionCol: String,
                   opCol: String = "op", versionCol: String = "version",
                   retainVersions: Int = 2,
                   props: Map[String, String] = Map.empty): Unit = {
    val payloadCols = feed.columns.filterNot(c => c == opCol || c == versionCol).toSeq
    require(keys.forall(payloadCols.contains),
      s"ManifestTable.applyChanges: keys ${keys.filterNot(payloadCols.contains)
        .mkString(", ")} not in the feed payload")
    require(payloadCols.contains(partitionCol),
      s"ManifestTable.applyChanges: partition column $partitionCol not in the feed " +
        "payload (delete rows must carry their partition value too)")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val touched = validateTouched(feed
      .select(col(partitionCol).cast("string").as("__p")).distinct()
      .collect().map(r => Option(r.getString(0)).getOrElse(
        sys.error(s"ManifestTable.applyChanges: null $partitionCol value in feed"))).toSet)
    val payload = feed.select(payloadCols.map(col): _*)
    val existing = latestVersion(fs, path) match {
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], payload.schema)
      case Some(v) =>
        val lines = readManifest(fs, path, v)
        val keys = dataEntries(lines).map(_._1).filter(touched).toSet
        if (keys.isEmpty) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          committedSchema(lines).getOrElse(payload.schema))
        else readEntriesOf(spark, path, lines, keys)
    }
    val merged = Merge.applyChangeFeed(existing, feed, keys, opCol, versionCol)
    merge(spark, path, merged, keys = Nil, partitionCol = partitionCol,
      retainVersions = retainVersions, replaceTouched = true,
      knownTouched = Some(touched), props = props)
  }

  // ------------------------------------------------------------------
  // HIDDEN PARTITIONING (r11) — Iceberg's headline usability idea in
  // miniature: the caller merges by a TIMESTAMP column and never
  // manages a partition column; the day() transform is derived at
  // write time and COMMITTED as a table property, so a reader can ask
  // for a raw ts range and get dir-level pruning derived from the
  // transform automatically — no caller-side knowledge of the
  // partition layout, hence no mis-pruning bugs when the layout
  // changes.
  // ------------------------------------------------------------------

  /** The committed partition-transform property ([[mergeByDay]]). */
  val TransformProp = "partition.transform"

  /** Table properties [[mergeBucketed]] commits: the SMB bucket spec.
    * Present together or not at all. */
  val BucketColProp = "bucket.col"
  val BucketNProp = "bucket.n"

  /** The (bucketCol, nBuckets) a property map declares, if any. */
  private[ops] def bucketSpecOf(props: Map[String, String]): Option[(String, Int)] =
    for { c <- props.get(BucketColProp); n <- props.get(BucketNProp) }
      yield (c, n.toInt)

  /** Refuse an operation whose write path would break a committed
    * bucket layout: a table carrying a bucket spec accepts writes only
    * from [[mergeBucketed]] with the SAME spec (plain merges write
    * un-bucket-named files; DV/aux commits detach rows from their
    * hash bucket; compact repacks across buckets) — any of those
    * would silently turn every later "shuffle-free" join back into a
    * shuffle, the failure [[Bucketed.noShuffleJoin]] exists to
    * surface. */
  private def requireBucketAgreement(spark: SparkSession, path: String,
                                     declared: Option[(String, Int)],
                                     op: String): Unit = {
    val committed = bucketSpecOf(readProps(spark, path))
    (committed, declared) match {
      case (Some(spec), None) => sys.error(
        s"ManifestTable.$op: table at $path is bucketed by $spec — only " +
          "mergeBucketed with the same spec may write it (plain DML would " +
          "break the bucketed file layout)")
      case (Some(spec), Some(d)) => require(spec == d,
        s"ManifestTable.$op: table is bucketed by $spec, got $d")
      case (None, _) => ()
    }
  }

  /** Expose a snapshot of a [[mergeBucketed]] table to Spark's
    * catalog bucketed scan: registers (replacing any previous
    * registration) an EXTERNAL partitioned+bucketed catalog table
    * whose partitions point at the manifest's data dirs — zero data
    * movement, metadata-only, re-runnable after every commit.
    * `spark.table(name)` then plans a bucketed scan
    * (`HashPartitioning(bucketCol, n)`), and a join of two tables
    * registered with the same spec on the bucket column needs NO
    * exchange ([[Bucketed.isShuffleFree]] is the evidence, as for
    * q159's catalog tables). The dir-name partition column rides
    * along as `__pdir` (string); data columns are exactly the
    * committed schema. `version` pins a RETAINED snapshot (time
    * travel — a reproducible training run re-registers the exact
    * snapshot it trained on); default = latest. */
  def registerBucketed(spark: SparkSession, path: String, name: String,
                       version: Option[Long] = None): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = version.getOrElse(latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.registerBucketed: no manifest under $path/$ManifestDir")))
    require(versions(fs, path).contains(v),
      s"ManifestTable.registerBucketed: m$v not retained under $path " +
        s"(have ${versions(fs, path).mkString(", ")})")
    val lines = readManifest(fs, path, v)
    val (c, n) = bucketSpecOf(propsOf(lines)).getOrElse(sys.error(
      s"ManifestTable.registerBucketed: table at $path has no bucket spec — " +
        "write it with mergeBucketed"))
    val schema = committedSchema(lines).getOrElse(sys.error(
      s"ManifestTable.registerBucketed: no committed schema under $path"))
    require(renameMapOf(propsOf(lines)).isEmpty,
      s"ManifestTable.registerBucketed: table at $path has renamed columns — " +
        "the catalog schema binds file fields by name (foreign tooling wrote " +
        "an unsupported combination; our writers refuse it)")
    val entries = dataEntries(lines)
    entries.foreach { case (k, value) =>
      require(!isSharedDir(dirOf(value)) && auxRefsOf(value).isEmpty,
        s"ManifestTable.registerBucketed: entry $k carries a compacted/aux " +
          "reference — not a clean bucketed layout (appendix rows detach from " +
          "their hash bucket; the writers refuse these on bucketed tables). " +
          "DV sidecars ARE supported: position deletes preserve the layout")
    }
    val dvRefs = entries.flatMap(e => dvRefOf(e._2).map(_._2)).distinct
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    // LOCATION is a stub: a partitioned catalog table scans ONLY its
    // registered partitions, each of which points at a manifest dir.
    // Created empty so the catalog's existence probes stay quiet.
    fs.mkdirs(new Path(s"$path/_bucketstub"))
    spark.sql(
      s"""CREATE TABLE `$name` (${schema.toDDL}, __pdir STRING)
         |USING PARQUET
         |PARTITIONED BY (__pdir)
         |CLUSTERED BY (`$c`) SORTED BY (`$c`) INTO $n BUCKETS
         |LOCATION '$path/_bucketstub'""".stripMargin)
    entries.foreach { case (k, value) =>
      val esc = k.replace("'", "''")
      spark.sql(s"ALTER TABLE `$name` ADD PARTITION (__pdir='$esc') " +
        s"LOCATION '$path/${dirOf(value)}'")
    }
    // Merge-on-read deletes (bucket-layout-preserving position
    // sidecars): fold them in as a BROADCAST anti-join over the
    // catalog scan's own `_metadata` addresses. A broadcast join
    // preserves the streamed side's HashPartitioning(bucketCol, n),
    // so downstream co-bucketed joins still plan ZERO exchanges —
    // the live-rows view rides the same bucketed scan.
    val base = spark.table(name)
    if (dvRefs.isEmpty) base
    else {
      import spark.implicits._
      val pairs = dvRefs.flatMap(rel => loadDv(fs, path, rel)).distinct
      val dvDf = pairs.toDF(DvFileCol, DvPosCol)
      val keyed = base
        .withColumn(FileKeyCol,
          concat_ws("/", slice(split(col("_metadata.file_path"), "/"), -3, 3)))
        .withColumn(RowPosCol, col("_metadata.row_index"))
      keyed.join(broadcast(dvDf),
          keyed(FileKeyCol) === dvDf(DvFileCol) && keyed(RowPosCol) === dvDf(DvPosCol),
          "left_anti")
        .drop(FileKeyCol, RowPosCol)
    }
  }

  /** Table property [[renameColumn]] maintains: `cur1=phys1,cur2=phys2`
    * — for every RENAMED column, the CURRENT name → the PHYSICAL name
    * the parquet files store (creation-time name; files are never
    * rewritten for a rename). Columns never renamed are absent
    * (physical == current). The Iceberg-style name mapping at
    * dir granularity — workable because every writer here funnels the
    * frame through [[toPhysical]] before touching disk, so physical
    * names stay uniform across ALL of a table's dirs forever. */
  val RenameMapProp = "rename.map"

  /** The current → physical map a property map declares (empty when
    * no column was ever renamed). */
  private[ops] def renameMapOf(props: Map[String, String]): Map[String, String] =
    props.get(RenameMapProp).toSeq.flatMap(_.split(',').iterator.filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"ManifestTable: corrupt $RenameMapProp entry '$kv'")
        kv.substring(0, i) -> kv.substring(i + 1)
      }).toMap

  private def encodeRenameMap(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")

  /** Rename a frame's columns current → physical before a write (the
    * inverse of the read-side alias in [[readEntriesOf]]). Columns
    * outside the map (incl. `__pdir`) pass through. */
  private def toPhysical(df: DataFrame, colmap: Map[String, String]): DataFrame =
    if (colmap.isEmpty) df
    else df.select(df.columns.map(c => col(c).as(colmap.getOrElse(c, c))).toSeq: _*)

  /** Re-key stats/bloom item strings from physical back to current
    * column names (items are keyed by the CURRENT name so zone-map and
    * bloom lookups keep pruning after a rename). Item heads are
    * `<col>=…` (zone map / rowcount) or `<col>!bloom=…`. */
  private def rekeyItems(items: Seq[String], physToCur: Map[String, String]): Seq[String] =
    if (physToCur.isEmpty) items
    else items.map { it =>
      val head = it.takeWhile(c => c != '=' && c != '!')
      physToCur.get(head) match {
        case Some(cur) => cur + it.substring(head.length)
        case None => it
      }
    }

  /** RENAME a column — METADATA-ONLY (Iceberg-style name mapping): one
    * manifest commit that (a) renames the field in the committed
    * schema, (b) records current → physical in [[RenameMapProp]] so
    * every retained data dir reads byte-identically under the new
    * name, and (c) re-keys the column's zone-map/bloom items so data
    * skipping keeps pruning. No file is touched; old versions still
    * time-travel under the old name. Renaming the partition column is
    * refused (partition entries and dir names embed its values; model
    * that as [[repartitionTable]]), as is renaming on a bucketed
    * table (the catalog registration binds the bucket column by
    * name). Chained renames compose (a→b→c maps c to a's physical);
    * renaming back to the physical name drops the map entry. */
  def renameColumn(spark: SparkSession, path: String, oldName: String,
                   newName: String, retainVersions: Int = 2): Unit = {
    require(oldName != newName, "ManifestTable.renameColumn: names are equal")
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.renameColumn: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val schema = committedSchema(lines).getOrElse(sys.error(
      s"ManifestTable.renameColumn: no committed schema under $path (legacy " +
        "manifest) — run one merge first"))
    require(schema.fieldNames.contains(oldName),
      s"ManifestTable.renameColumn: no column $oldName " +
        s"(have ${schema.fieldNames.mkString(", ")})")
    require(!schema.fieldNames.contains(newName),
      s"ManifestTable.renameColumn: column $newName already exists")
    partitionColOf(lines).foreach(p => require(p != oldName,
      s"ManifestTable.renameColumn: $oldName is the partition column — dir names " +
        "embed its values; use repartitionTable for a layout change"))
    val props = propsOf(lines)
    require(bucketSpecOf(props).isEmpty,
      "ManifestTable.renameColumn: refusing on a bucketed table (the catalog " +
        "registration binds the bucket column by name)")
    requireNoConstraintRefs(spark, props, oldName, "renameColumn")
    val map0 = renameMapOf(props)
    val physical = map0.getOrElse(oldName, oldName)
    val map1 = (map0 - oldName) ++
      (if (newName == physical) Map.empty else Map(newName -> physical))
    // The current → physical resolution must stay injective, or two
    // current columns would read the same file field.
    val newFields = schema.fieldNames.toSeq.map(n => if (n == oldName) newName else n)
    val resolved = newFields.map(n => map1.getOrElse(n, n))
    require(resolved.distinct.size == resolved.size,
      s"ManifestTable.renameColumn: renaming $oldName to $newName makes the " +
        s"physical resolution ambiguous (another column already resolves to a " +
        "colliding file field)")
    val newSchema = org.apache.spark.sql.types.StructType(
      schema.fields.map(f => if (f.name == oldName) f.copy(name = newName) else f))
    // Re-key the renamed column's zone/bloom items current-name-wise.
    val rekey = Map(oldName -> newName)
    val newEntries = dataEntries(lines).map { case (k, value) =>
      val items = statsOf(value).map(_.split(';').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
      val out = rekeyItems(items, rekey)
      k -> (if (out.isEmpty) dirOf(value) else s"${dirOf(value)}\t${out.mkString(";")}")
    }
    // A renamed SORT column keeps the durable write order coherent —
    // the prop holds CURRENT names, so it renames along.
    val sortFixed = sortColsOf(props).map(c => if (c == oldName) newName else c)
    val newProps = (props - RenameMapProp) ++
      (if (map1.isEmpty) Map.empty else Map(RenameMapProp -> encodeRenameMap(map1))) ++
      (if (sortFixed.isEmpty) Map.empty
       else Map(SortColsProp -> sortFixed.mkString(",")))
    val propLines =
      if (newProps.isEmpty) Nil
      else Seq(PropsKey -> newProps.toSeq.sortBy(_._1)
        .map { case (k2, v2) => s"${escapeProp(k2)}=${escapeProp(v2)}" }.mkString(";"))
    val head = Seq(SchemaKey -> newSchema.json,
      CommitKey -> System.currentTimeMillis().toString) ++
      lines.collect { case (PartitionColKey, p) => PartitionColKey -> p } ++
      propLines
    writeManifest(fs, path, v + 1, head ++ newEntries)
    cleanup(fs, path, keepVersions =
      (versions(fs, path) :+ (v + 1)).distinct.sorted.takeRight(retainVersions).toSet)
  }

  /** Table property [[dropColumn]] maintains: the comma-joined set of
    * PHYSICAL file-field names ever dropped. Retained data dirs still
    * store those fields (a drop is metadata-only), so RE-ADDING a
    * column that resolves to a tombstoned physical name is refused at
    * merge time — old dirs would resurrect the dropped values under
    * the new column. Iceberg avoids this with column IDs; the name
    * mapping gets the same safety by never letting a live column
    * resolve to a dead field. */
  val DropTombstonesProp = "drop.tombstones"

  private[ops] def tombstonesOf(props: Map[String, String]): Set[String] =
    props.get(DropTombstonesProp).toSeq
      .flatMap(_.split(',').iterator.filter(_.nonEmpty)).toSet

  /** Key the exactly-once streaming sink records its micro-batch id
    * under ([[graft.streaming.StreamingIngest.manifestMergeSink]] —
    * which aliases this constant); defined here so the durable-props
    * carry-forward below can name it without a package cycle. */
  val StreamBatchIdProp = "stream.batch_id"

  /** DURABLE table-state property keys: facts about the TABLE (its
    * physical layout, name mapping, dead fields, transactional
    * watermarks) rather than about one commit. Commit paths that
    * assemble props from caller input ([[merge]]/[[mergeMany]]) carry
    * these forward from the previous version — losing any of them
    * silently corrupts the state its mechanism protects: a lost
    * [[DropTombstonesProp]] lets a later merge re-add the dropped
    * column name and resurrect dead values from retained dirs; a lost
    * [[StreamBatchIdProp]] (e.g. a [[foldMoR]] between an erasure
    * commit and a foreachBatch replay) re-opens the replayed-batch
    * double-apply the exactly-once sink exists to prevent. Caller
    * props override on key collision (a stream sink advancing its own
    * watermark). */
  /** Z-order spec props ([[clusterZOrder]]): the clustered columns,
    * bits per column, and the committed quantile split points —
    * durable so [[mergeZOrdered]]'s cluster-on-write and
    * [[maybeRecluster]]'s health check survive every later commit. */
  val ZOrderColsProp = "zorder.cols"
  val ZOrderBitsProp = "zorder.bits"
  val ZOrderSplitsProp = "zorder.splits"

  /** Durable WRITE SORT ORDER (Iceberg's `write.sort-order`): once a
    * merge declares `sortWithinDirs`, every later batch of every
    * writer sorts its rows by these columns within each partition dir
    * before writing — so parquet ROW GROUPS carry tight, disjoint
    * min/max footer ranges on the sort columns and selective scans
    * skip row groups inside the dirs that dir-level pruning keeps
    * (the second level of the skipping hierarchy; dir zone maps are
    * the first). Comma-joined CURRENT column names. Re-declaring with
    * different columns updates the order for FUTURE batches only —
    * already-written files keep their layout (Iceberg's semantics;
    * rewrite via compact/clusterZOrder to re-sort history). */
  val SortColsProp = "sort.cols"

  /** The committed write sort order, if any. */
  def sortColsOf(props: Map[String, String]): Seq[String] =
    props.get(SortColsProp).map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  /** Prefix of table-level CHECK-constraint props
    * (`constraint.<name> = <sql expr>`, [[addConstraint]]). Durable
    * as a PREFIX family — every constraint survives every commit. */
  val ConstraintPropPrefix = "constraint."

  /** Prefixes of the MATERIALIZED-VIEW definition prop families
    * ([[graft.plans.MvRegistry]] / [[graft.plans.MvJoinRegistry]]
    * `register(durable = true)`): the MV catalog entry lives on the
    * BASE (resp. fact) table's own manifest, so a fresh session's
    * planner rediscovers every registered rewrite with no in-memory
    * state — the difference between "correct results" and "correct
    * results 1000× slower, silently" after a restart. */
  val MvAggDefPropPrefix = "mv.agg."
  val MvJoinDefPropPrefix = "mv.join."
  val MvLatestDefPropPrefix = "mv.latest."

  /** The SESSION TIMEZONE a timestamp-typed partition column's keys
    * were rendered in (`CAST(ts AS STRING)` at write time) — the
    * CERTIFICATE that makes the key text parseable back to the exact
    * internal micros: for UTC/fixed-offset zones the cast is
    * BIJECTIVE at microsecond precision, so a reader whose session
    * zone EQUALS the recorded writer zone can round-trip key → value
    * ([[graft.plans.StatsAggRule]] keyInternal). Stamped by the first
    * timestamp-keyed merge; later merges REFUSE a differing session
    * zone — mixed-zone key text on one table is unsound (the same
    * instant would render two dir names). */
  val PartitionTzProp = "partition.tz"

  private[ops] val DurablePropKeys: Set[String] =
    Set(RenameMapProp, DropTombstonesProp, BucketColProp, BucketNProp,
        TransformProp, StreamBatchIdProp,
        ZOrderColsProp, ZOrderBitsProp, ZOrderSplitsProp, SortColsProp,
        PartitionTzProp)

  private[ops] def durablePropsOf(props: Map[String, String]): Map[String, String] =
    props.view.filterKeys(k =>
      DurablePropKeys(k) || k.startsWith(ConstraintPropPrefix) ||
        k.startsWith(MvAggDefPropPrefix) || k.startsWith(MvJoinDefPropPrefix) ||
        k.startsWith(MvLatestDefPropPrefix)).toMap

  /** One metadata-only commit adding/removing MV-definition props —
    * the registries' durable backing ([[MvAggDefPropPrefix]] /
    * [[MvJoinDefPropPrefix]] families only: validated families like
    * `constraint.*` have their own entry points with their own
    * validation commits and must not be reachable through a generic
    * prop write). Data entries, schema, and partition column carry
    * verbatim; bumps the version like every commit. */
  private[graft] def updateMvDefProps(spark: SparkSession, path: String,
                                      adds: Map[String, String],
                                      removeKeys: String => Boolean,
                                      retainVersions: Int): Unit = {
    require(adds.keys.forall(k => k.startsWith(MvAggDefPropPrefix) ||
      k.startsWith(MvJoinDefPropPrefix) || k.startsWith(MvLatestDefPropPrefix)),
      s"ManifestTable.updateMvDefProps: only mv.* prop families, got " +
        adds.keys.mkString(", "))
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.updateMvDefProps: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val props = propsOf(lines)
    val next = props.filterNot { case (k, _) =>
      (k.startsWith(MvAggDefPropPrefix) || k.startsWith(MvJoinDefPropPrefix) ||
        k.startsWith(MvLatestDefPropPrefix)) && removeKeys(k)
    } ++ adds
    if (next != props) commitProps(fs, path, v, lines, next, retainVersions)
  }

  /** OPERATOR ATTESTATION of a LEGACY timestamp-keyed table's writer
    * zone ([[PartitionTzProp]]) — one metadata-only commit. Tables
    * created before the certificate existed carry partition-key text
    * whose rendering zone is unrecoverable from the text alone (any
    * fixed-offset zone round-trips its own rendering), so [[merge]]
    * never stamps them retroactively and the metadata fast paths
    * refuse. An operator who KNOWS the historical writer sessions'
    * zone records it here; the op validates everything that IS
    * checkable — the table already has commits, the partition column
    * is committed-schema TIMESTAMP, no conflicting certificate
    * exists (same-zone re-certification is an idempotent no-op),
    * `tz` is a fixed-offset zone (only those render bijectively at
    * microsecond precision, so no reader honors anything else), and
    * every committed key's text round-trips text→micros→text under
    * `tz` — and refuses loudly otherwise. What it cannot validate is
    * the attestation itself; that is the operator's contract, the
    * same trust boundary as declaring the right primary key. */
  def certifyPartitionTz(spark: SparkSession, path: String, tz: String,
                         retainVersions: Int = 3): Unit = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.certifyPartitionTz: no manifest under " +
        s"$path/$ManifestDir — a NEW table is certified by its first merge"))
    val lines = readManifest(fs, path, v)
    val props = propsOf(lines)
    props.get(PartitionTzProp) match {
      case Some(rec) if rec == tz => return // idempotent re-attestation
      case Some(rec) => sys.error(
        s"ManifestTable.certifyPartitionTz: $path is already certified as " +
          s"zone $rec; re-certifying as $tz would contradict committed key text")
      case None =>
    }
    val pcol = partitionColOf(lines).getOrElse(sys.error(
      s"ManifestTable.certifyPartitionTz: $path has no committed partition column"))
    val dt = committedSchema(lines).flatMap(_.fields.find(_.name == pcol).map(_.dataType))
      .getOrElse(sys.error(
        s"ManifestTable.certifyPartitionTz: $path has no committed schema — " +
          s"cannot prove $pcol is timestamp-typed"))
    require(dt == org.apache.spark.sql.types.TimestampType,
      s"ManifestTable.certifyPartitionTz: $pcol is $dt, not TIMESTAMP — the " +
        "writer-zone certificate only applies to timestamp-typed partition keys")
    val fixedOffset =
      try java.time.ZoneId.of(tz).getRules.isFixedOffset
      catch { case scala.util.control.NonFatal(_) => false }
    require(fixedOffset,
      s"ManifestTable.certifyPartitionTz: $tz is not a fixed-offset zone — " +
        "only fixed-offset renderings are bijective at microsecond precision, " +
        "so no metadata reader would honor this certificate")
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
    dataEntries(lines).map(_._1).distinct.foreach { k =>
      val parsed =
        try Cast(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(k),
          org.apache.spark.sql.types.StringType), dt, Some(tz), EvalMode.LEGACY)
          .eval(InternalRow.empty)
        catch { case scala.util.control.NonFatal(_) => null }
      val back = Option(parsed).map { p =>
        Cast(Literal(p, dt), org.apache.spark.sql.types.StringType, Some(tz),
          EvalMode.LEGACY).eval(InternalRow.empty).toString
      }
      require(back.contains(k),
        s"ManifestTable.certifyPartitionTz: committed key '$k' does not " +
          s"round-trip under $tz — attestation refused")
    }
    commitProps(fs, path, v, lines, props + (PartitionTzProp -> tz), retainVersions)
  }

  /** Test instrument ONLY: strip a durable prop with one
    * metadata-only commit — simulates a LEGACY table written before
    * the prop existed (e.g. pre-certificate timestamp-keyed tables
    * for [[certifyPartitionTz]] tests). Never part of the public
    * surface; real tables never un-certify. */
  private[graft] def stripDurablePropForTest(spark: SparkSession, path: String,
                                             key: String,
                                             retainVersions: Int = 3): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.stripDurablePropForTest: no manifest under $path"))
    val lines = readManifest(fs, path, v)
    commitProps(fs, path, v, lines, propsOf(lines) - key, retainVersions)
  }

  /** The table's committed CHECK constraints, `name -> sql expr`. */
  def constraintsOf(props: Map[String, String]): Map[String, String] =
    props.collect { case (k, v) if k.startsWith(ConstraintPropPrefix) =>
      k.substring(ConstraintPropPrefix.length) -> v }

  /** Refuse a [[renameColumn]]/[[dropColumn]] of a column any
    * committed CHECK constraint references. Without this guard the
    * stale SQL text would survive in the durable props, fail every
    * subsequent value-landing write with an unresolved-column error —
    * and, worse, silently validate the WRONG column if a new column
    * later takes the old name (Delta refuses rename/drop of
    * constrained columns for exactly this reason). Resolution is
    * case-insensitive, matching the analyzer's default resolver the
    * enforcement path ([[checkConstraints]]' `expr(sql)`) uses. */
  private def requireNoConstraintRefs(spark: SparkSession,
                                      props: Map[String, String],
                                      colName: String, op: String): Unit =
    constraintsOf(props).toSeq.sortBy(_._1).foreach { case (n, sql) =>
      val refs = spark.sessionState.sqlParser.parseExpression(sql).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.mkString(".").toLowerCase(java.util.Locale.ROOT)
      }.toSet
      require(!refs.contains(colName.toLowerCase(java.util.Locale.ROOT)),
        s"ManifestTable.$op: column $colName is referenced by CHECK constraint " +
          s"'$n' ($sql) — dropConstraint first")
    }

  /** Validate `df` (CURRENT column names) against every committed
    * CHECK constraint in `props`; refuses on the first violated one.
    * SQL-standard CHECK semantics: a row violates only when the
    * expression evaluates to FALSE — NULL satisfies (the posture
    * `WHERE` takes the opposite of, and what the SQL standard
    * specifies for CHECK). One bounded Spark job per constraint
    * (`limit(1)` — existence, not a count; constraint sets are small
    * by design). */
  private def checkConstraints(df: DataFrame, props: Map[String, String],
                               op: String): Unit =
    constraintsOf(props).toSeq.sortBy(_._1).foreach { case (n, sql) =>
      val viol = df.filter(coalesce(expr(sql), lit(true)) === lit(false))
        .limit(1).count()
      require(viol == 0L,
        s"ManifestTable.$op: CHECK constraint '$n' ($sql) is violated by " +
          "incoming rows — refusing to commit")
    }

  /** ADD a table-level CHECK constraint (Delta's `ALTER TABLE … ADD
    * CONSTRAINT … CHECK`): one metadata-only manifest commit that
    * records `constraint.<name> = <exprSql>` as a durable prop, after
    * validating that EVERY existing row satisfies the expression (one
    * bounded scan — a constraint that the table already violates is
    * refused, Delta's posture). From then on every write that lands
    * new row values — [[merge]]/[[mergeBucketed]] batches and
    * merge-on-read update appendices — validates against it before
    * committing and REFUSES wholesale on a violation (the staged
    * batch dir is left as crash residue the next merge sweeps; no
    * partial state is ever visible). Rewrite maintenance (compact,
    * z-order, purge, fold) moves only rows that already passed, so it
    * does not re-validate. SQL-standard semantics: a row violates
    * only when the expression is FALSE; NULL satisfies — write
    * `col IS NOT NULL` to forbid nulls. Constraints survive every
    * commit (durable-prefix props) and time-travel like any prop. */
  def addConstraint(spark: SparkSession, path: String, name: String,
                    exprSql: String, retainVersions: Int = 2): Unit = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"ManifestTable.addConstraint: name must be [A-Za-z0-9_]+, got '$name'")
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.addConstraint: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val props = propsOf(lines)
    require(!props.contains(s"$ConstraintPropPrefix$name"),
      s"ManifestTable.addConstraint: constraint '$name' already exists — drop it first")
    // the existing table must satisfy the new constraint
    checkConstraints(read(spark, path),
      Map(s"$ConstraintPropPrefix$name" -> exprSql), "addConstraint")
    commitProps(fs, path, v, lines,
      props + (s"$ConstraintPropPrefix$name" -> exprSql), retainVersions)
  }

  /** DROP a CHECK constraint — one metadata-only commit. */
  def dropConstraint(spark: SparkSession, path: String, name: String,
                     retainVersions: Int = 2): Unit = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.dropConstraint: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val props = propsOf(lines)
    require(props.contains(s"$ConstraintPropPrefix$name"),
      s"ManifestTable.dropConstraint: no constraint '$name' " +
        s"(have ${constraintsOf(props).keys.toSeq.sorted.mkString(", ") })")
    commitProps(fs, path, v, lines, props - s"$ConstraintPropPrefix$name",
      retainVersions)
  }

  /** Metadata-only commit of a new props map: schema, partition
    * column, and every data entry carry verbatim; only the props line
    * changes. The [[renameColumn]]/[[dropColumn]] commit form,
    * factored for props-only changes. */
  private def commitProps(fs: FileSystem, path: String, v: Long,
                          lines: Seq[(String, String)],
                          newProps: Map[String, String],
                          retainVersions: Int): Unit = {
    val propLines =
      if (newProps.isEmpty) Nil
      else Seq(PropsKey -> newProps.toSeq.sortBy(_._1)
        .map { case (k2, v2) => s"${escapeProp(k2)}=${escapeProp(v2)}" }.mkString(";"))
    val head =
      lines.collect { case (SchemaKey, s) => SchemaKey -> s } ++
        Seq(CommitKey -> System.currentTimeMillis().toString) ++
        lines.collect { case (PartitionColKey, p) => PartitionColKey -> p } ++
        propLines
    writeManifest(fs, path, v + 1, head ++ dataEntries(lines))
    cleanup(fs, path, keepVersions =
      (versions(fs, path) :+ (v + 1)).distinct.sorted.takeRight(retainVersions).toSet)
  }

  /** DROP a column — METADATA-ONLY, [[renameColumn]]'s sibling: one
    * manifest commit that (a) removes the field from the committed
    * schema — every retained data dir still stores it, reads simply
    * stop requesting it — (b) strips the column's zone-map/bloom
    * items, (c) drops its name-mapping entry, and (d) TOMBSTONES the
    * physical file field so a later merge cannot re-add a column that
    * would resurrect the dead values from old dirs (re-adding under a
    * DIFFERENT name is fine — old dirs resolve it as null, the
    * additive-evolution behavior). No file is touched; old versions
    * still time-travel WITH the column. The partition column (dir
    * names embed its values), the bucket column (the layout hashes
    * it), and the last remaining column are refused. */
  def dropColumn(spark: SparkSession, path: String, name: String,
                 retainVersions: Int = 2): Unit = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.dropColumn: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val schema = committedSchema(lines).getOrElse(sys.error(
      s"ManifestTable.dropColumn: no committed schema under $path (legacy " +
        "manifest) — run one merge first"))
    require(schema.fieldNames.contains(name),
      s"ManifestTable.dropColumn: no column $name " +
        s"(have ${schema.fieldNames.mkString(", ")})")
    require(schema.fields.length > 1,
      s"ManifestTable.dropColumn: $name is the table's only column")
    partitionColOf(lines).foreach(p => require(p != name,
      s"ManifestTable.dropColumn: $name is the partition column — dir names " +
        "embed its values; use repartitionTable for a layout change"))
    val props = propsOf(lines)
    bucketSpecOf(props).foreach { case (bc, _) => require(bc != name,
      s"ManifestTable.dropColumn: $name is the bucket column — the layout " +
        "hashes it; rewrite with a new spec instead") }
    requireNoConstraintRefs(spark, props, name, "dropColumn")
    val map0 = renameMapOf(props)
    val physical = map0.getOrElse(name, name)
    val map1 = map0 - name
    val newSchema = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == name))
    // Strip the dropped column's zone/bloom items (keyed by current
    // name); rowcounts and other columns' items stay.
    val newEntries = dataEntries(lines).map { case (k, value) =>
      val items = statsOf(value).map(_.split(';').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
      val kept = items.filterNot { it =>
        it.takeWhile(c => c != '=' && c != '!') == name }
      k -> (if (kept.isEmpty) dirOf(value) else s"${dirOf(value)}\t${kept.mkString(";")}")
    }
    // A dropped SORT column falls out of the durable write order
    // (Iceberg's behavior); an emptied order drops the prop.
    val sortKept = sortColsOf(props).filterNot(_ == name)
    val newProps = (props - RenameMapProp - SortColsProp) ++
      (if (map1.isEmpty) Map.empty else Map(RenameMapProp -> encodeRenameMap(map1))) ++
      (if (sortKept.isEmpty) Map.empty
       else Map(SortColsProp -> sortKept.mkString(","))) ++
      Map(DropTombstonesProp ->
        (tombstonesOf(props) + physical).toSeq.sorted.mkString(","))
    val propLines = Seq(PropsKey -> newProps.toSeq.sortBy(_._1)
      .map { case (k2, v2) => s"${escapeProp(k2)}=${escapeProp(v2)}" }.mkString(";"))
    val head = Seq(SchemaKey -> newSchema.json,
      CommitKey -> System.currentTimeMillis().toString) ++
      lines.collect { case (PartitionColKey, p) => PartitionColKey -> p } ++
      propLines
    writeManifest(fs, path, v + 1, head ++ newEntries)
    cleanup(fs, path, keepVersions =
      (versions(fs, path) :+ (v + 1)).distinct.sorted.takeRight(retainVersions).toSet)
  }

  /** The widenings [[widenColumn]] accepts — Iceberg's set (int →
    * long, float → double, decimal precision growth at fixed scale)
    * plus the small-int chain. Each is one Spark's parquet reader
    * upcasts NATIVELY when the requested schema is wider than the
    * file's physical type (verified for both the vectorized and
    * row-based readers), which is what makes the operation
    * metadata-only: old files are simply read under the wider type. */
  private def isWidening(from: org.apache.spark.sql.types.DataType,
                         to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) =>
        t.scale == f.scale && t.precision > f.precision
      case _ => false
    }
  }

  /** WIDEN a column's type — METADATA-ONLY: one manifest commit that
    * re-types the field in the committed schema; every retained data
    * dir reads byte-identically under the wider type (the parquet
    * reader's native upcast — no file touched), new batches write the
    * wide type, and mixed-width dir histories resolve transparently.
    * Allowed widenings: [[isWidening]]. Zone-map items stay (bounds
    * are value-level, unchanged by a widening); bloom items stay for
    * the integral/decimal widenings (their `CAST(col AS STRING)` keys
    * render identically at either width) but are DROPPED for
    * float → double, where the string rendering of a value differs
    * across widths and a stale bloom would FALSE-NEGATIVE a probe —
    * dirs without a bloom are always probed, fail-safe. Refused for
    * the partition column (dir names embed its rendered values) and
    * for a bucket column (the bucket hash differs across widths, so
    * widening would silently detach rows from their buckets). Old
    * versions still time-travel under the old type. */
  def widenColumn(spark: SparkSession, path: String, colName: String,
                  newType: org.apache.spark.sql.types.DataType,
                  retainVersions: Int = 2): Unit = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.widenColumn: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val schema = committedSchema(lines).getOrElse(sys.error(
      s"ManifestTable.widenColumn: no committed schema under $path (legacy " +
        "manifest) — run one merge first"))
    require(schema.fieldNames.contains(colName),
      s"ManifestTable.widenColumn: no column $colName " +
        s"(have ${schema.fieldNames.mkString(", ")})")
    val field = schema.fields(schema.fieldIndex(colName))
    require(isWidening(field.dataType, newType),
      s"ManifestTable.widenColumn: ${field.dataType.simpleString} -> " +
        s"${newType.simpleString} is not a supported widening")
    partitionColOf(lines).foreach(p => require(p != colName,
      s"ManifestTable.widenColumn: $colName is the partition column — dir names " +
        "embed its rendered values"))
    val props = propsOf(lines)
    bucketSpecOf(props).foreach { case (bc, _) => require(bc != colName,
      s"ManifestTable.widenColumn: $colName is the bucket column — the bucket " +
        "hash differs across widths; re-spec under a new path instead") }
    val dropBlooms = field.dataType == org.apache.spark.sql.types.FloatType
    val newSchema = org.apache.spark.sql.types.StructType(schema.fields.map(f =>
      if (f.name == colName) f.copy(dataType = newType) else f))
    val newEntries = dataEntries(lines).map { case (k, value) =>
      val items = statsOf(value).map(_.split(';').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
      val out = if (!dropBlooms) items
        else items.filterNot(_.startsWith(s"$colName$BloomTag="))
      k -> (if (out.isEmpty) dirOf(value) else s"${dirOf(value)}\t${out.mkString(";")}")
    }
    val propLines =
      if (props.isEmpty) Nil
      else Seq(PropsKey -> props.toSeq.sortBy(_._1)
        .map { case (k2, v2) => s"${escapeProp(k2)}=${escapeProp(v2)}" }.mkString(";"))
    val head = Seq(SchemaKey -> newSchema.json,
      CommitKey -> System.currentTimeMillis().toString) ++
      lines.collect { case (PartitionColKey, p) => PartitionColKey -> p } ++
      propLines
    writeManifest(fs, path, v + 1, head ++ newEntries)
    cleanup(fs, path, keepVersions =
      (versions(fs, path) :+ (v + 1)).distinct.sorted.takeRight(retainVersions).toSet)
  }

  /** The property map a manifest's lines carry (empty when none). */
  private def propsOf(lines: Seq[(String, String)]): Map[String, String] =
    lines.collectFirst { case (PropsKey, enc) => enc }
      .map(_.split(';').iterator.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        require(i >= 0, s"ManifestTable: corrupt property '$kv'")
        unescapePathName(kv.substring(0, i)) -> unescapePathName(kv.substring(i + 1))
      }.toMap)
      .getOrElse(Map.empty)
  private val DerivedDayCol = "__day"

  /** [[merge]] partitioned by `day(tsCol)` — the derived `__day`
    * column shapes the directory layout and rides in the files; the
    * transform commits as a table property every merge, which is what
    * [[readTsRange]] resolves. Same per-key stability contract: a
    * key's day must not move (true for (entity, day)-keyed data). */
  def mergeByDay(spark: SparkSession, path: String, incoming: DataFrame,
                 keys: Seq[String], tsCol: String,
                 preserveExisting: Seq[String] = Nil,
                 retainVersions: Int = 2,
                 statsColumns: Seq[String] = Nil,
                 replaceTouched: Boolean = false,
                 bloomColumns: Seq[String] = Nil,
                 bloomBits: Int = 8192): Unit =
    merge(spark, path,
      incoming.withColumn(DerivedDayCol, date_trunc("day", col(tsCol))),
      keys, partitionCol = DerivedDayCol,
      preserveExisting = preserveExisting, retainVersions = retainVersions,
      statsColumns = statsColumns, replaceTouched = replaceTouched,
      props = Map(TransformProp -> s"day($tsCol)"),
      bloomColumns = bloomColumns, bloomBits = bloomBits)

  /** Read the table for a raw `[lo, hi]` TIMESTAMP range (strings in
    * `yyyy-MM-dd HH:mm:ss`, the session-UTC partition-value format)
    * — dir-level pruning is DERIVED from the committed day()
    * transform: partitions from `day(lo)` through `hi` survive, the
    * rest are never opened. Returns a day-granular SUPERSET (whole
    * surviving dirs); apply the row filter on top. Fails loudly on a
    * table without a committed transform — guessing a layout is how
    * silent mis-prunes happen. */
  def readTsRange(spark: SparkSession, path: String,
                  lo: String, hi: String): SkipResult = {
    require(lo.length >= 10 && hi.length >= 10 && lo <= hi,
      s"ManifestTable.readTsRange: bad range [$lo, $hi]")
    val tf = readProps(spark, path).getOrElse(TransformProp,
      sys.error(s"ManifestTable.readTsRange: no $TransformProp property at $path — " +
        "write through mergeByDay (readers must not guess the layout)"))
    require(tf.startsWith("day("),
      s"ManifestTable.readTsRange: unsupported transform $tf")
    val loDay = lo.substring(0, 10) + " 00:00:00"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.readTsRange: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val live = dataEntries(lines)
    // fixed-width "yyyy-MM-dd HH:mm:ss" strings compare chronologically
    val kept = live.filter { case (p, _) => p >= loDay && p <= hi }
    // Dir-granular superset: every live entry referencing a kept dir
    // survives (a shared dir is scanned once, and only its CURRENT
    // keys' rows — never another key's stale copies).
    val keptDirs = kept.map(e => dirOf(e._2)).distinct
    val keptDirSet = keptDirs.toSet
    val survivors = live.filter(e => keptDirSet(dirOf(e._2))).map(_._1).toSet
    val df =
      if (kept.isEmpty) {
        val s = committedSchema(lines).getOrElse(sys.error(
          s"ManifestTable.readTsRange: every dir pruned and manifest m$v has no " +
            "committed schema to shape an empty result"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      } else readEntriesOf(spark, path, lines, survivors)
    SkipResult(df, keptDirs.size.toLong, live.size.toLong)
  }

  /** Evidence a [[mergeInto]] returns. */
  final case class MergeIntoResult(updated: Long, deleted: Long, inserted: Long,
                                   partitionsRewritten: Long)

  /** Delta-style MERGE INTO — the general conditional upsert that
    * completes the DML quartet next to [[merge]] (plain LWW upsert),
    * [[deleteWhere]]/[[updateWhere]] and [[applyChanges]] (CDC):
    *
    *   - a source row matching an existing row by `keys` DELETES it
    *     when `whenMatchedDelete` evaluates true (NULL = no), else
    *     UPDATES it by `whenMatchedUpdate` (empty map = keep the
    *     target row unchanged);
    *   - an unmatched source row INSERTS when `insertNotMatched`
    *     (the source then must carry the full table schema);
    *   - unmatched target rows are untouched.
    *
    * Update/delete expressions evaluate over the joined row: TARGET
    * columns under their own names, SOURCE columns as `src_<name>`
    * (the two-sided reference Delta writes as `t.x` / `s.x`).
    * Partition-scoped like every write here: only the partitions the
    * SOURCE names are read and rewritten (matched rows always share
    * the source row's partition under the stable-partition contract),
    * and the whole result lands through the replaceTouched commit.
    * One extra bounded aggregate computes the clause counts. */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
                keys: Seq[String], partitionCol: String,
                whenMatchedUpdate: Map[String, org.apache.spark.sql.Column] = Map.empty,
                whenMatchedDelete: Option[org.apache.spark.sql.Column] = None,
                insertNotMatched: Boolean = true,
                retainVersions: Int = 2,
                statsColumns: Seq[String] = Nil,
                bloomColumns: Seq[String] = Nil,
                bloomBits: Int = 8192): MergeIntoResult = {
    require(keys.nonEmpty, "ManifestTable.mergeInto: no key columns")
    require(source.columns.contains(partitionCol),
      s"ManifestTable.mergeInto: source must carry the partition column $partitionCol")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.mergeInto: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val touched = validateTouched(source
      .select(col(partitionCol).cast("string").as("__p")).distinct()
      .collect().map(r => Option(r.getString(0)).getOrElse(
        sys.error(s"ManifestTable.mergeInto: null $partitionCol value in source"))).toSet)
    val touchedKeys = dataEntries(lines).map(_._1).filter(touched).toSet
    val targetCols = committedSchema(lines).map(_.fieldNames.toSeq)
      .getOrElse(sys.error(s"ManifestTable.mergeInto: manifest m$v has no committed " +
        "schema (legacy table) — mergeInto needs the authoritative column list"))
    whenMatchedUpdate.keys.foreach(c => require(targetCols.contains(c),
      s"ManifestTable.mergeInto: update target column $c not in the table"))
    require(!whenMatchedUpdate.keys.exists(keys.contains),
      "ManifestTable.mergeInto: cannot update a key column")
    require(!whenMatchedUpdate.contains(partitionCol),
      s"ManifestTable.mergeInto: cannot update partition column $partitionCol")
    val existing =
      if (touchedKeys.isEmpty) {
        val s = committedSchema(lines).get
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      } else readEntriesOf(spark, path, lines, touchedKeys)
    // Duplicate source keys would fan the full-outer join out into
    // duplicate target rows — Delta's "multiple source rows matched"
    // error, refused here the same way (one bounded aggregate).
    requireUniqueKeys(source, keys, "ManifestTable.mergeInto source")
    // Source: keys keep their names (join columns), payload prefixed.
    val src = source.columns.foldLeft(source) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, s"src_$c")
    }
    val j = existing.withColumn("__te", lit(true))
      .join(src.withColumn("__se", lit(true)), keys, "full_outer")
    val matched = col("__te").isNotNull && col("__se").isNotNull
    val del = whenMatchedDelete.map(c => coalesce(c, lit(false))).getOrElse(lit(false))
    // coalesce: SUM over an empty join (empty source) is NULL
    val counts = j.agg(
      coalesce(sum(when(matched && !del, 1L).otherwise(0L)), lit(0L)).as("u"),
      coalesce(sum(when(matched && del, 1L).otherwise(0L)), lit(0L)).as("d"),
      coalesce(sum(when(col("__te").isNull, 1L).otherwise(0L)), lit(0L)).as("i"))
      .collect()(0)
    val kept = j.filter(!(matched && del) && (lit(insertNotMatched) || col("__te").isNotNull))
    val merged = kept.select(targetCols.map { c =>
      val srcC = if (keys.contains(c)) col(c) else col(s"src_$c")
      val tgt =
        if (keys.contains(c)) col(c)
        else whenMatchedUpdate.get(c).map(e => when(matched, e).otherwise(col(c)))
          .getOrElse(col(c))
      when(col("__te").isNull, srcC).otherwise(tgt).as(c)
    }: _*)
    merge(spark, path, merged, keys = Nil, partitionCol = partitionCol,
      retainVersions = retainVersions, replaceTouched = true,
      knownTouched = Some(touched), statsColumns = statsColumns,
      bloomColumns = bloomColumns, bloomBits = bloomBits)
    MergeIntoResult(counts.getLong(0), counts.getLong(1),
      if (insertNotMatched) counts.getLong(2) else 0L, touched.size.toLong)
  }

  // ------------------------------------------------------------------
  // CHANGE DATA FEED (r11) — row-level diffs between retained
  // versions, the Delta CDF surface computed FROM THE MANIFEST DIFF:
  // a partition whose manifest entry is byte-identical across two
  // versions cannot have changed (dirs are immutable), so each
  // version step reads ONLY the partitions whose dir changed — at
  // 100 TB a daily commit touching 1% of partitions diffs 1% of the
  // table, never all of it. Within a changed partition, a keyed full
  // outer join classifies every row: insert / delete /
  // update_preimage+update_postimage (a row present on both sides
  // with identical non-key values emits nothing).
  // ------------------------------------------------------------------

  /** Row-level changes between retained versions `fromVersion`
    * (exclusive) and `toVersion` (inclusive), one step per commit:
    * the table's columns (under each step's committed schema; earlier
    * steps resolve later-added columns as null) plus `_change_type`
    * (insert | delete | update_preimage | update_postimage) and
    * `_commit_version`. `keys` is the table's logical key (the same
    * key its merges upsert on); per-commit attribution requires every
    * intermediate version retained. */
  def changes(spark: SparkSession, path: String, keys: Seq[String],
              fromVersion: Long, toVersion: Long): DataFrame = {
    require(keys.nonEmpty, "ManifestTable.changes: no key columns")
    require(fromVersion < toVersion,
      s"ManifestTable.changes: fromVersion $fromVersion must be < toVersion $toVersion")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versions(fs, path)
    val steps = vs.filter(v => v > fromVersion && v <= toVersion)
    require(vs.contains(fromVersion) && steps.size == (toVersion - fromVersion),
      s"ManifestTable.changes: need every version m$fromVersion..m$toVersion retained " +
        s"(have ${vs.mkString(", ")}) — an expired intermediate collapses per-commit " +
        "attribution")
    steps.map(v => changeStep(spark, fs, path, keys, v))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** [[changeStep]] restricted to a PARTITION subset — the unit the
    * streaming source's cdf dir/byte-bounded triggers slice on: one
    * commit's change feed decomposes cleanly by partition (each
    * partition's diff is independent), so a giant UPDATE commit can
    * stream across several bounded micro-batches. */
  private[ops] def changeStepOf(spark: SparkSession, path: String,
                                keys: Seq[String], v: Long,
                                parts: Set[String]): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    changeStep(spark, fs, path, keys, v, restrictTo = Some(parts))
  }

  /** The row diff contributed by ONE commit (version `v` vs `v-1`),
    * optionally restricted to a subset of changed partitions. */
  private def changeStep(spark: SparkSession, fs: FileSystem, path: String,
                         keys: Seq[String], v: Long,
                         restrictTo: Option[Set[String]] = None): DataFrame = {
    val prevLines = readManifest(fs, path, v - 1)
    val prevDirs = dataEntries(prevLines).map { case (k, value) => k -> dirOf(value) }.toMap
    val curLines = readManifest(fs, path, v)
    val curDirs = dataEntries(curLines).map { case (k, value) => k -> dirOf(value) }.toMap
    // Change detection compares the DV+aux-qualified dir identity, not
    // the dir alone: a merge-on-read delete (or update's appendix)
    // changes an entry's visible rows WITHOUT changing its dir, and
    // comparing dirs only would make such commits invisible to the
    // change feed.
    def identOf(lines: Seq[(String, String)]): Map[String, String] =
      dataEntries(lines).map { case (k, value) =>
        k -> (dirOf(value) + dvRefOf(value).map(r => "|" + r._2).getOrElse("") +
          auxRefsOf(value).map(r => "|" + r._2).mkString)
      }.toMap
    val prevId = identOf(prevLines)
    val curId = identOf(curLines)
    val changed = (prevId.keySet ++ curId.keySet)
      .filter(p => prevId.get(p) != curId.get(p))
      .filter(p => restrictTo.forall(_.contains(p)))
    if (changed.isEmpty) {
      // A props-only commit (e.g. an incremental view's no-op version
      // watermark) changes no partition: emit an empty step —
      // unionByName(allowMissingColumns) null-fills the data columns
      // against the other steps. Key dtypes come from the committed
      // schema so the union never sees a type conflict (string
      // fallback only for legacy schemaless manifests, where every
      // step is equally legacy).
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val keyFields = committedSchema(curLines) match {
        case Some(s) => keys.map(k => s.fields(s.fieldIndex(k)))
        case None => keys.map(k => StructField(k, StringType))
      }
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(keyFields ++ Seq(StructField("_change_type", StringType),
          StructField("_commit_version", LongType))))
    }
    // Both sides read (and the diff emits) under the NEW version's
    // committed schema — a widening commit diffs old rows with the
    // added columns as null, exactly how version v reads them.
    val schema: org.apache.spark.sql.types.StructType =
      committedSchema(curLines).getOrElse {
        // changed nonempty => a dir exists on one side
        val some = changed.toSeq.sorted.iterator
          .flatMap(k => curDirs.get(k).orElse(prevDirs.get(k))).next()
        spark.read.parquet(s"$path/$some").schema
      }
    // The keyed read filters a shared (compacted) dir to the CHANGED
    // keys — without it, a merge that pulls one key out of a shared
    // dir would diff the dir's OTHER keys as phantom deletes.
    def side(lines: Seq[(String, String)], dirMap: Map[String, String]): DataFrame = {
      val ks = changed.intersect(dirMap.keySet)
      if (ks.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else readEntriesOf(spark, path, lines, ks, schemaOverride = Some(schema))
    }
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"ManifestTable.changes: key column $k not in the m$v schema"))
    val nonKeys = schema.fieldNames.filterNot(keys.contains).toSeq
    def pack(df: DataFrame, data: String, marker: String): DataFrame =
      df.select(keys.map(col) ++ Seq(
        struct(nonKeys.map(col): _*).as(data), lit(true).as(marker)): _*)
    val j = pack(side(prevLines, prevDirs), "__od", "__oe")
      .join(pack(side(curLines, curDirs), "__nd", "__ne"), keys, "full_outer")
    val differs = col("__oe").isNotNull && col("__ne").isNotNull &&
      !(col("__od") <=> col("__nd"))
    val pre = when(col("__ne").isNull, struct(lit("delete").as("t"), col("__od").as("d")))
      .when(differs, struct(lit("update_preimage").as("t"), col("__od").as("d")))
    val post = when(col("__oe").isNull, struct(lit("insert").as("t"), col("__nd").as("d")))
      .when(differs, struct(lit("update_postimage").as("t"), col("__nd").as("d")))
    j.select(keys.map(col) :+ explode(array(pre, post)).as("__c"): _*)
      .filter(col("__c").isNotNull)
      .select(keys.map(col) ++ nonKeys.map(nk => col(s"__c.d.$nk").as(nk)) ++ Seq(
        col("__c.t").as("_change_type"), lit(v).as("_commit_version")): _*)
  }

  /** RESTORE the table to retained `version` — as a NEW commit, the
    * undo that keeps history linear (Delta's `RESTORE TABLE …
    * VERSION AS OF`). The restored manifest re-references the old
    * version's data dirs verbatim (zero data copy — dirs are
    * immutable, and retention keeps every dir any kept manifest
    * references), carrying that snapshot's schema, stats/bloom
    * suffixes AND table properties — properties are part of the
    * snapshot's transactional state (stream batch ids, view
    * watermarks), and restoring data without them would corrupt
    * exactly the exactly-once logic they exist for. One manifest
    * write regardless of table size; a no-op when already current. */
  def restore(spark: SparkSession, path: String, version: Long,
              retainVersions: Int = 2): Unit = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versions(fs, path)
    require(vs.contains(version),
      s"ManifestTable.restore: m$version not retained under $path " +
        s"(have ${vs.mkString(", ")})")
    val cur = vs.last
    if (version == cur) return
    val lines = readManifest(fs, path, version)
    val keep = lines.filter { case (k, _) => k != CommitKey }
    val next = cur + 1
    writeManifest(fs, path, next,
      (CommitKey -> System.currentTimeMillis().toString) +: keep)
    cleanup(fs, path, keepVersions =
      (vs :+ next).distinct.sorted.takeRight(retainVersions).toSet)
  }

  /** A [[fastCount]] result: the row count and whether it came from
    * manifest metadata alone (no file opened, no Spark job). */
  final case class CountResult(rows: Long, metadataOnly: Boolean)

  /** COUNT(*) over the (partition-filtered) table — metadata-only
    * when every surviving manifest entry carries a committed
    * `__rowcount` (recorded from the parquet footers whenever a merge
    * declares `statsColumns`; entries carry it forward untouched), a
    * plain Spark count otherwise. At 100 TB the metadata path answers
    * the commonest observability query without touching one file. */
  def fastCount(spark: SparkSession, path: String,
                partitionFilter: String => Boolean = _ => true): CountResult = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.fastCount: no manifest under $path/$ManifestDir"))
    val live = dataEntries(readManifest(fs, path, v)).filter(e => partitionFilter(e._1))
    // A pending DV subtracts its recorded count — the footer rowcount
    // is pre-delete, the `__dv=<n>:…` item carries exactly the delta.
    // Aux appendices add theirs: `__aux=<n>:…` counts are recorded at
    // append time, so a MoR update (DV old positions + aux new rows)
    // nets to zero and the count stays metadata-only.
    val counts = live.map { case (_, value) =>
      rowCountOf(value).map(_ - dvRefOf(value).map(_._1).getOrElse(0L)
        + auxRefsOf(value).map(_._1).sum) }
    if (counts.forall(_.isDefined))
      CountResult(counts.flatten.sum, metadataOnly = true)
    else if (live.isEmpty) CountResult(0L, metadataOnly = true)
    else CountResult(read(spark, path, partitionFilter).count(), metadataOnly = false)
  }

  /** The committed `__rowcount` of a manifest entry, if recorded. */
  private def rowCountOf(entryValue: String): Option[Long] =
    statsOf(entryValue).flatMap(_.split(';').iterator
      .find(_.startsWith(s"$RowCountKey="))
      .flatMap(item => item.substring(RowCountKey.length + 1).toLongOption))

  private val RowCountKey = "__rowcount"

  /** CONSISTENCY AUDIT (fsck): classify every divergence between the
    * retained manifests and the filesystem — the operational check a
    * long-lived table runs before trusting a backup restore, a bucket
    * migration, or a foreign writer. Driver-side metadata only (no
    * Spark job); one row per finding, empty = healthy:
    *
    *   - `missing_dir` — a dir some retained manifest references does
    *     not exist (data loss: that version can no longer be read);
    *   - `orphan_batch` — a `data/batch-*` dir no retained manifest
    *     references (crash residue the next merge's cleanup would
    *     sweep; dead weight, not corruption);
    *   - `manifest_tmp` — a leftover `.tmp` from a crashed commit
    *     (never made live; dead weight);
    *   - `corrupt_manifest` — a retained manifest that fails to parse
    *     (zero lines / missing tab: created outside the tmp+rename
    *     protocol);
    *   - `missing_dv` — a deletion-vector sidecar some retained
    *     manifest references does not exist (worse than missing data:
    *     the rows it deleted would silently resurrect).
    */
  def fsck(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val issues = scala.collection.mutable.Buffer.empty[(String, String)]
    val referenced = scala.collection.mutable.Set.empty[String]
    versions(fs, path).foreach { v =>
      try {
        val lines = readManifest(fs, path, v)
        // The r13 metadata families must PARSE — a corrupt rename map,
        // tombstone list or bucket spec breaks every later read/merge,
        // so the audit surfaces it as the manifest corruption it is.
        val props = propsOf(lines)
        renameMapOf(props); tombstonesOf(props); bucketSpecOf(props)
        dataEntries(lines).foreach { case (p, value) =>
        val d = dirOf(value)
        referenced += d.split('/').take(2).mkString("/")
        if (!fs.exists(new Path(s"$path/$d")))
          issues += (("missing_dir", f"m$v%d:$p:$d"))
        dvRefOf(value).foreach { case (_, rel) =>
          referenced += rel.split('/').take(2).mkString("/")
          // a lost DV sidecar silently resurrects deleted rows —
          // strictly worse than missing data, so it gets its own class
          if (!fs.exists(new Path(s"$path/$rel")))
            issues += (("missing_dv", f"m$v%d:$p:$rel"))
        }
        auxRefsOf(value).foreach { case (_, rel) =>
          referenced += rel.split('/').take(2).mkString("/")
          // a lost aux appendix loses that update's rows: data loss,
          // the same class as a missing primary dir
          if (!fs.exists(new Path(s"$path/$rel")))
            issues += (("missing_dir", f"m$v%d:$p:$rel"))
        }
        }
      } catch {
        case e: Exception =>
          issues += (("corrupt_manifest", s"m$v: ${Option(e.getMessage).getOrElse(e.toString).take(120)}"))
      }
    }
    val dataDir = new Path(s"$path/$DataDir")
    if (fs.exists(dataDir)) fs.listStatus(dataDir).foreach { st =>
      val n = st.getPath.getName
      if (!referenced(s"$DataDir/$n"))
        // DV/aux residue classifies distinctly from a stale batch dir:
        // an orphan sidecar is retention residue of a folded MoR
        // commit (expected, reclaimable), where an orphan batch is an
        // interrupted write
        issues += ((if (n.startsWith("dv-")) "orphan_dv"
                    else if (n.startsWith("aux-")) "orphan_aux"
                    else "orphan_batch", n))
    }
    val mDir = new Path(s"$path/$ManifestDir")
    if (fs.exists(mDir)) fs.listStatus(mDir).foreach { st =>
      if (st.getPath.getName.endsWith(".tmp"))
        issues += (("manifest_tmp", st.getPath.getName))
    }
    // Surviving multi-table txn journals (the conventional in-table
    // journal location `_txn`): a journal present at audit time is a
    // crash the writer has not rolled forward yet — ManifestTxn
    // .recover repairs it; the audit's job is to REPORT it.
    val txnDir = new Path(s"$path/$TxnDir")
    if (fs.exists(txnDir)) fs.listStatus(txnDir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("txn-"))
        issues += ((if (n.endsWith(".tmp")) "txn_tmp" else "txn_journal", n))
    }
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        issues.toSeq.map(t => org.apache.spark.sql.Row(t._1, t._2)), 1),
      StructType(Seq(StructField("issue", StringType, nullable = false),
        StructField("subject", StringType, nullable = false))))
  }

  /** The table as of its latest manifest. `partitionFilter` prunes at
    * the DIRECTORY level by partition-value string, before any file
    * is touched — the manifest-resolved analog of partition pruning. */
  def read(spark: SparkSession, path: String,
           partitionFilter: String => Boolean = _ => true): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, path).getOrElse(
      sys.error(s"ManifestTable.read: no manifest under $path/$ManifestDir"))
    val lines = readManifest(fs, path, v)
    val keys = dataEntries(lines).map(_._1).filter(partitionFilter).toSet
    require(keys.nonEmpty, s"ManifestTable.read: manifest m$v has no partition " +
      s"passing the filter")
    // Committed schema (when present) pins column set + order and
    // fills columns a pre-widening data dir lacks with nulls; the
    // keyed read opens each (possibly compacted) dir once.
    readEntriesOf(spark, path, lines, keys)
  }

  /** TIME TRAVEL: the table as of a specific retained `version` — the
    * snapshot a reader pinned before a subsequent commit, or an audit
    * ("what did yesterday's load see"). Fails if the version was
    * cleaned (older than the writer's `retainVersions` horizon). */
  def readVersion(spark: SparkSession, path: String, version: Long,
                  partitionFilter: String => Boolean = _ => true): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(versions(fs, path).contains(version),
      s"ManifestTable.readVersion: m$version not retained under $path " +
        s"(have ${versions(fs, path).mkString(", ")})")
    val lines = readManifest(fs, path, version)
    val keys = dataEntries(lines).map(_._1).filter(partitionFilter).toSet
    require(keys.nonEmpty, s"ManifestTable.readVersion: manifest m$version has no " +
      s"partition passing the filter")
    // Each version reads under ITS OWN committed schema — a snapshot
    // pinned before a widening resolves without the added columns.
    readEntriesOf(spark, path, lines, keys)
  }

  /** TIME TRAVEL BY TIMESTAMP: the table as of wall-clock instant
    * `asOfMs` — the latest retained version whose commit time is at
    * or before it (Delta's `TIMESTAMP AS OF`). Commit times come from
    * the `__commit_ms__` manifest header; pre-tracking manifests fall
    * back to the manifest file's modification time. Fails if every
    * retained version committed after `asOfMs` (the snapshot that was
    * live then has been expired — or never existed). */
  def readAsOf(spark: SparkSession, path: String, asOfMs: Long,
               partitionFilter: String => Boolean = _ => true): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versions(fs, path)
    require(vs.nonEmpty, s"ManifestTable.readAsOf: no manifest under $path/$ManifestDir")
    val eligible = vs.filter { v =>
      val ms = committedMs(readManifest(fs, path, v)).getOrElse(
        fs.getFileStatus(new Path(f"$path/$ManifestDir/m$v%012d")).getModificationTime)
      ms <= asOfMs
    }
    require(eligible.nonEmpty,
      s"ManifestTable.readAsOf: no retained version committed at or before $asOfMs " +
        s"(earliest retained is m${vs.head})")
    readVersion(spark, path, eligible.last, partitionFilter)
  }

  /** Partition-key → DV-QUALIFIED dir identity of a retained version
    * (stats suffixes stripped; a pending deletion vector rides as a
    * `|<sidecar>` suffix). Consumers ([[IncrementalAgg]]/
    * [[IncrementalJoin]]) compare these for EQUALITY to find changed
    * partitions — the DV suffix is what makes a merge-on-read delete
    * register as a change even though the data dir itself is
    * untouched. Not a filesystem path; resolve dirs via the keyed
    * reads. */
  private[ops] def partitionDirs(fs: FileSystem, path: String,
                                 version: Long): Map[String, String] =
    dataEntries(readManifest(fs, path, version))
      .map { case (k, v) =>
        k -> (dirOf(v) + dvRefOf(v).map(r => "|" + r._2).getOrElse("") +
          auxRefsOf(v).map(r => "|" + r._2).mkString)
      }.toMap

  /** The LATEST version's partition keys; empty if no table. */
  private[ops] def partitionKeys(fs: FileSystem, path: String): Set[String] =
    latestVersion(fs, path)
      .map(v => partitionDirs(fs, path, v).keySet).getOrElse(Set.empty)

  /** All retained manifest versions, ascending (empty = no table).
    * Only `m<digits>` names count — a stray foreign file in the
    * manifest dir is ignored rather than crashing every read. */
  def versions(fs: FileSystem, path: String): Seq[Long] = {
    val dir = new Path(s"$path/$ManifestDir")
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.length > 1 && n.startsWith("m") &&
        n.drop(1).forall(_.isDigit) => n.drop(1).toLong }
      .toSeq.sorted
  }

  /** Highest committed manifest version, if the table exists. */
  private[ops] def latestVersion(fs: FileSystem, path: String): Option[Long] =
    versions(fs, path).lastOption

  /** Partition entries of a manifest (reserved headers filtered out). */
  private[ops] def dataEntries(lines: Seq[(String, String)]): Seq[(String, String)] =
    lines.filterNot(e => Reserved(e._1))

  /** The wall-clock commit instant a manifest recorded, if any
    * (manifests written before commit-time tracking have none —
    * [[readAsOf]] then falls back to the manifest file's mtime). */
  private[ops] def committedMs(lines: Seq[(String, String)]): Option[Long] =
    lines.collectFirst { case (CommitKey, ms) => ms.toLong }

  /** %-escape for property keys/values ('%', '=', ';', tab, newline
    * — the chars the encoded list and manifest line structure use). */
  private def escapeProp(s: String): String =
    s.flatMap {
      case c @ ('%' | '=' | ';' | '\t' | '\n') => f"%%${c.toInt}%02X"
      case c => c.toString
    }

  /** Table properties committed by the LATEST manifest (empty when
    * the last commit recorded none — props are per-commit, not
    * carried forward; see [[PropsKey]]). */
  def readProps(spark: SparkSession, path: String): Map[String, String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    latestVersion(fs, path) match {
      case None => Map.empty
      case Some(v) => propsOf(readManifest(fs, path, v))
    }
  }

  /** Properties committed by a SPECIFIC retained version — the
    * freshness instrument for consumers that must then READ exactly
    * the version they checked ([[graft.plans.MvRewriteRule]] pairs
    * this with [[readVersion]]; checking latest-props and separately
    * re-resolving "latest" would tear under a concurrent refresh). */
  def readPropsAt(spark: SparkSession, path: String, version: Long): Map[String, String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(versions(fs, path).contains(version),
      s"ManifestTable.readPropsAt: m$version not retained under $path")
    propsOf(readManifest(fs, path, version))
  }

  /** The schema a manifest committed, if one was recorded (manifests
    * written before schema tracking have none — readers then fall
    * back to parquet self-description, the pre-evolution behavior). */
  private[ops] def committedSchema(
      lines: Seq[(String, String)]): Option[org.apache.spark.sql.types.StructType] =
    lines.collectFirst { case (SchemaKey, json) =>
      org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType] }

  private[ops] def readManifest(fs: FileSystem, path: String, v: Long): Seq[(String, String)] = {
    val mpath = f"$path/$ManifestDir/m$v%012d"
    val in = fs.open(new Path(mpath))
    try {
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().zipWithIndex.toList
      // A legal manifest always carries at least one line (the schema
      // header since tracking; a data entry before it). Zero lines =
      // a manifest created outside the tmp+rename protocol (crash
      // artifact, foreign tooling) — treating it as an empty table
      // would silently drop every partition; refuse instead.
      require(lines.nonEmpty, s"ManifestTable: corrupt manifest $mpath: zero lines")
      lines.map { case (line, n) =>
        val i = line.indexOf('\t')
        // A tab-less line means a truncated or corrupt manifest (e.g. a
        // trailing partial line from a non-atomic create on a foreign
        // filesystem). Name the file and line, matching the loud-failure
        // posture of the rest of this object, instead of letting
        // substring throw an uninformative StringIndexOutOfBounds.
        require(i >= 0, s"ManifestTable: corrupt manifest $mpath line ${n + 1}: " +
          s"no tab separator in ${line.take(80)}")
        (line.substring(0, i), line.substring(i + 1))
      }
    } finally in.close()
  }

  private[ops] def manifestDest(path: String, v: Long): Path =
    new Path(f"$path/$ManifestDir/m$v%012d")

  /** Write a version's manifest CONTENT as a tmp file (no commit). */
  private[ops] def writeManifestTmp(fs: FileSystem, path: String, v: Long,
                                    entries: Seq[(String, String)]): Path = {
    val tmp = new Path(f"$path/$ManifestDir/m$v%012d-${java.util.UUID.randomUUID()}.tmp")
    fs.mkdirs(tmp.getParent)
    val out = fs.create(tmp, false)
    try out.write(entries.map { case (k, d) => s"$k\t$d" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
    tmp
  }

  /** THE commit point: one atomic create-if-absent of the version
    * file. The primitive is FILESYSTEM-SPECIFIC — the same reality
    * Delta's per-store LogStores encode:
    *   - HDFS (and stores with HDFS rename semantics): rename to an
    *     existing destination returns false — rename IS the CAS
    *     (consumes the tmp on success);
    *   - local file:// : POSIX rename REPLACES an existing target,
    *     silently clobbering a rival's commit (a lost update — the
    *     q150 barrier race caught exactly this), so the CAS is an
    *     atomic hard LINK, which fails with FileAlreadyExists when
    *     the version is taken (the tmp survives for the caller to
    *     drop — or keep, as [[ManifestTxn]]'s recovery does for
    *     content comparison). */
  private[ops] def casManifest(fs: FileSystem, dest: Path, tmp: Path): Boolean =
    if ("file" == fs.getScheme) {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dest.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else fs.rename(tmp, dest)

  private def writeManifest(fs: FileSystem, path: String, v: Long,
                            entries: Seq[(String, String)]): Unit =
    ManifestTxn.active() match {
      case Some(txn) => // STAGED: the tmp is written, the CAS deferred
        // to the transaction's promote phase (ManifestTxn.run)
        txn.stage(path, v, writeManifestTmp(fs, path, v, entries).getName)
      case None =>
        val tmp = writeManifestTmp(fs, path, v, entries)
        val dest = manifestDest(path, v)
        if (!casManifest(fs, dest, tmp)) {
          fs.delete(tmp, false) // the loser's tmp is residue, drop it now
          throw CommitConflictException(
            s"ManifestTable: commit of $dest lost the version race (concurrent " +
              "writer); table still reads as the previous version")
        }
        if ("file" == fs.getScheme) fs.delete(tmp, false) // linked, tmp done
    }

  /** A lost commit race: another writer renamed this version live
    * first. The table is untouched by the loser (its data dirs are
    * unreferenced residue, swept by the next successful commit's
    * cleanup); the write is safe to re-plan against the new head. */
  final case class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  /** OPTIMISTIC CONCURRENCY (Delta-style): run `op` — any write on
    * this object ([[merge]], [[deleteWhere]], [[mergeInto]],
    * [[compact]]…) — and, on a lost commit race, RE-EXECUTE it against
    * the new head, up to `maxAttempts` times with jittered backoff.
    * Re-execution (not re-commit) is what makes this correct: the
    * write re-reads the touched partitions as the winner left them, so
    * upsert semantics hold under any interleaving, and writers on
    * DISJOINT partitions serialize without losing either batch. A
    * retry re-runs the op's Spark job — the price of lock-free
    * multi-writer commits, paid only on actual contention (same
    * trade Delta's conflict-then-retry protocol makes). The loser's
    * orphaned data dirs are crash-residue-equivalent and swept by the
    * next successful commit.
    *
    * RETENTION CONTRACT: `retainVersions` must exceed the maximum
    * number of rival commits that can land while one writer is
    * planning+writing — a loser planned at vN reads vN's dirs, and a
    * rival's cleanup may vacuum them once vN falls off the horizon
    * (the same vacuum-vs-concurrent-reader window Delta documents).
    * Size retention to writer count, as the q150 gate does. */
  def withCommitRetry[T](maxAttempts: Int = 5)(op: => T): T = {
    require(maxAttempts >= 1, s"withCommitRetry: maxAttempts must be >= 1")
    var attempt = 1
    var backoffMs = 50L
    while (true) {
      try return op
      catch {
        case e: CommitConflictException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
          // Jitter decorrelates two symmetric losers re-racing.
          Thread.sleep(backoffMs + scala.util.Random.nextLong(backoffMs))
          backoffMs = math.min(backoffMs * 2, 2000L)
      }
    }
    sys.error("unreachable")
  }

  /** How long a NEVER-REFERENCED data dir must sit before the sweep
    * treats it as crash residue. A concurrent writer's in-flight batch
    * dir is also unreferenced — without this grace, a rival's
    * commit-time cleanup would delete it mid-write (the bug q150's
    * barrier race exposed). Dirs referenced by an EXPIRED manifest are
    * known-dead and deleted immediately, so retention semantics (and
    * the vacuum tests) are unchanged. */
  private[graft] val OrphanGraceMs: Long = 60L * 60 * 1000

  /** Drop data dirs unreferenced by every kept manifest, stray
    * manifest tmps, and manifests older than the kept set. Runs after
    * each successful commit. Two classes of unreferenced dir:
    * KNOWN-DEAD (referenced only by manifests expiring right now) go
    * immediately; NEVER-REFERENCED (crash residue — or a concurrent
    * writer's in-flight batch) survive [[OrphanGraceMs]] first. */
  private def cleanup(fs: FileSystem, path: String, keepVersions: Set[Long]): Unit =
    ManifestTxn.active() match {
      case Some(txn) => txn.deferCleanup(path, keepVersions) // after promote
      case None => cleanupNow(fs, path, keepVersions)
    }

  private[ops] def cleanupNow(fs: FileSystem, path: String,
                              keepVersions: Set[Long]): Unit = {
    // Every top-level data/ dir an entry references: its data batch
    // dir AND, when a deletion vector is pending, the DV sidecar's
    // dir — a swept DV would silently RESURRECT deleted rows, the
    // worst possible failure for an erasure feature.
    def refsOf(value: String): Seq[String] =
      (dirOf(value).split('/').take(2).mkString("/") +:
        dvRefOf(value).map(r => r._2.split('/').take(2).mkString("/")).toList) ++
        auxRefsOf(value).map(r => r._2.split('/').take(2).mkString("/"))
    val live: Set[String] = keepVersions.flatMap(v =>
      dataEntries(readManifest(fs, path, v))).flatMap { case (_, v) => refsOf(v) }
    // Dirs referenced by the manifests this cleanup expires: dead the
    // moment the manifest goes. Best-effort — an unreadable expired
    // manifest leaves its dirs to the grace path.
    val dead: Set[String] = versions(fs, path).filterNot(keepVersions).flatMap { v =>
      try dataEntries(readManifest(fs, path, v)).flatMap { case (_, value) => refsOf(value) }
      catch { case _: Exception => Nil }
    }.toSet -- live
    val now = System.currentTimeMillis()
    val dataDir = new Path(s"$path/$DataDir")
    if (fs.exists(dataDir)) fs.listStatus(dataDir).foreach { st =>
      val rel = s"$DataDir/${st.getPath.getName}"
      if (!live(rel) &&
          (dead(rel) || now - st.getModificationTime >= OrphanGraceMs))
        fs.delete(st.getPath, true)
    }
    fs.listStatus(new Path(s"$path/$ManifestDir")).foreach { st =>
      val n = st.getPath.getName
      // Tmp manifests get the same grace — a rival's tmp exists for an
      // instant between write and rename, and deleting it would turn
      // that WINNING commit into a spurious conflict.
      val stale =
        (n.endsWith(".tmp") && now - st.getModificationTime >= OrphanGraceMs) ||
        (n.length > 1 && n.startsWith("m") && n.drop(1).forall(_.isDigit) &&
          !keepVersions(n.drop(1).toLong))
      if (stale) fs.delete(st.getPath, false)
    }
  }

  /** Inverse of Spark's partition-dir escaping (`%xx` sequences). */
  private[graft] def unescapePathName(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
