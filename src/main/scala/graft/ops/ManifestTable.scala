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

  private val ManifestDir = "_manifests"
  private val DataDir = "data"
  /** Manifest line key carrying the committed table schema (JSON).
    * Reserved — a real partition value can never collide with it
    * because partition values are stringified column values and this
    * name is not a legal date/number and is refused as exotic. */
  private val SchemaKey = "__schema__"

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
            retainVersions: Int = 2): Unit = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = latestVersion(fs, path)
    val oldLines = current.map(v => readManifest(fs, path, v)).getOrElse(Nil)
    val oldEntries = dataEntries(oldLines)
    val prevSchema = committedSchema(oldLines)

    // Affected-partition pruning: tiny bounded collect (distinct
    // partition values of one batch), same as the swap-commit form.
    val touched = incoming
      .select(col(partitionCol).cast("string").as("__p")).distinct()
      .collect().map(r => Option(r.getString(0)).getOrElse(
        sys.error(s"ManifestTable.merge: null $partitionCol value in incoming"))).toSet
    // Manifest lines are `key\tdir\n` — a key carrying either control
    // character would corrupt the file's structure. Date/numeric
    // partition values never do; refuse the exotic string case loudly.
    touched.find(k => k.contains('\t') || k.contains('\n')).foreach(k =>
      sys.error(s"ManifestTable.merge: partition value ${k.replace("\t", "\\t")
        .replace("\n", "\\n")} contains a tab/newline — not manifest-encodable"))
    require(!touched(SchemaKey),
      s"ManifestTable.merge: partition value '$SchemaKey' collides with the manifest schema key")
    val touchedDirs = oldEntries.filter(e => touched(e._1)).map(e => s"$path/${e._2}")
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
    val reader = prevSchema.map(spark.read.schema(_)).getOrElse(spark.read)
    val existingOpt =
      if (touchedDirs.isEmpty) None else Some(reader.parquet(touchedDirs: _*))
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
        .orElse(oldEntries.headOption.map { case (_, dir) =>
          spark.read.parquet(s"$path/$dir").schema
        })
    baseline.foreach { base =>
      val dropped = base.fieldNames.filterNot(incoming.columns.contains)
      require(dropped.isEmpty, "ManifestTable.merge: incoming batch is missing table " +
        s"column(s) ${dropped.mkString(", ")} — only additive schema evolution is supported")
      base.fields.foreach { f =>
        val inDt = incoming.schema(f.name).dataType
        require(inDt == f.dataType, s"ManifestTable.merge: column ${f.name} retyped " +
          s"${f.dataType.simpleString} -> ${inDt.simpleString} — only additive schema " +
          "evolution is supported (untouched partitions cannot be read under the new type)")
      }
    }
    val merged = existingOpt match {
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

    // New data dirs, invisible until the manifest rename below.
    val batch = s"$DataDir/batch-${java.util.UUID.randomUUID()}"
    merged.withColumn("__pdir", col(partitionCol).cast("string"))
      .write.partitionBy("__pdir").parquet(s"$path/$batch")
    val newEntries = fs.listStatus(new Path(s"$path/$batch"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__pdir="))
      .map { st =>
        val name = st.getPath.getName
        unescapePathName(name.stripPrefix("__pdir=")) -> s"$batch/$name"
      }.toSeq.sortBy(_._1)
    require(newEntries.map(_._1).toSet == touched,
      s"ManifestTable.merge: written partitions ${newEntries.map(_._1)} != " +
        s"batch partitions $touched — partition-value string roundtrip broke")

    val entries = (SchemaKey -> nextSchema.json) +:
      (oldEntries.filterNot(e => touched(e._1)) ++ newEntries)
    val next = current.getOrElse(0L) + 1
    writeManifest(fs, path, next, entries)
    cleanup(fs, path, keepVersions =
      (versions(fs, path) :+ next).distinct.sorted.takeRight(retainVersions).toSet)
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
    val dirs = dataEntries(lines)
      .collect { case (key, dir) if partitionFilter(key) => s"$path/$dir" }
    require(dirs.nonEmpty, s"ManifestTable.read: manifest m$v has no partition " +
      s"passing the filter")
    // Committed schema (when present) pins column set + order and
    // fills columns a pre-widening data dir lacks with nulls.
    committedSchema(lines).map(spark.read.schema(_)).getOrElse(spark.read).parquet(dirs: _*)
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
    val dirs = dataEntries(lines)
      .collect { case (key, dir) if partitionFilter(key) => s"$path/$dir" }
    require(dirs.nonEmpty, s"ManifestTable.readVersion: manifest m$version has no " +
      s"partition passing the filter")
    // Each version reads under ITS OWN committed schema — a snapshot
    // pinned before a widening resolves without the added columns.
    committedSchema(lines).map(spark.read.schema(_)).getOrElse(spark.read).parquet(dirs: _*)
  }

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

  /** Partition entries of a manifest (the schema header filtered out). */
  private[ops] def dataEntries(lines: Seq[(String, String)]): Seq[(String, String)] =
    lines.filterNot(_._1 == SchemaKey)

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
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().zipWithIndex.toList
      .map { case (line, n) =>
        val i = line.indexOf('\t')
        // A tab-less line means a truncated or corrupt manifest (e.g. a
        // trailing partial line from a non-atomic create on a foreign
        // filesystem). Name the file and line, matching the loud-failure
        // posture of the rest of this object, instead of letting
        // substring throw an uninformative StringIndexOutOfBounds.
        require(i >= 0, s"ManifestTable: corrupt manifest $mpath line ${n + 1}: " +
          s"no tab separator in ${line.take(80)}")
        (line.substring(0, i), line.substring(i + 1))
      } finally in.close()
  }

  private def writeManifest(fs: FileSystem, path: String, v: Long,
                            entries: Seq[(String, String)]): Unit = {
    val dest = new Path(f"$path/$ManifestDir/m$v%012d")
    val tmp = new Path(f"$path/$ManifestDir/m$v%012d-${java.util.UUID.randomUUID()}.tmp")
    fs.mkdirs(dest.getParent)
    val out = fs.create(tmp, false)
    try out.write(entries.map { case (k, d) => s"$k\t$d" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
    // THE commit point: one rename. HDFS rename-to-existing returns
    // false, so a concurrent writer racing to the same version fails
    // here loudly instead of silently clobbering the other's commit.
    require(fs.rename(tmp, dest),
      s"ManifestTable: commit rename $tmp -> $dest failed (concurrent writer?); " +
        s"table still reads as the previous version")
  }

  /** Drop data dirs unreferenced by every kept manifest, stray
    * manifest tmps, and manifests older than the kept set. Runs after
    * each successful commit; also sweeps the residue of crashed
    * merges (their batch dirs were never referenced by anything). */
  private def cleanup(fs: FileSystem, path: String, keepVersions: Set[Long]): Unit = {
    val live: Set[String] = keepVersions.flatMap(v => dataEntries(readManifest(fs, path, v)))
      .map { case (_, dir) => dir.split('/').take(2).mkString("/") } // data/batch-…
    val dataDir = new Path(s"$path/$DataDir")
    if (fs.exists(dataDir)) fs.listStatus(dataDir).foreach { st =>
      if (!live(s"$DataDir/${st.getPath.getName}")) fs.delete(st.getPath, true)
    }
    fs.listStatus(new Path(s"$path/$ManifestDir")).foreach { st =>
      val n = st.getPath.getName
      val stale = n.endsWith(".tmp") ||
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
