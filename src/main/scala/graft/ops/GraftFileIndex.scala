package graft.ops

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._

/** Catalyst-integrated data skipping for manifest tables — the Delta
  * Lake architecture (`TahoeFileIndex`): a [[FileIndex]] whose
  * `listFiles` receives the query's pushed `dataFilters` at physical
  * planning time and answers with only the data dirs whose committed
  * zone-map `[min, max]` bounds and bloom filters might satisfy them.
  *
  * This makes skipping AUTOMATIC: `ManifestTable.read(path).where(…)`
  * prunes dirs through Catalyst's own `FileSourceStrategy`, with no
  * special API — `readSkipping`/`readSkippingEquals` remain as the
  * explicit forms, but every plain read now carries the same pruning.
  * The relation built over this index is the same `HadoopFsRelation`
  * + `ParquetFileFormat` pair `spark.read.parquet` produces, so
  * vectorized reads, row-group pushdown (`PushedFilters`), column
  * pruning, `_metadata` columns, and whole-stage codegen are all
  * unchanged; ONLY the file listing differs.
  *
  * Reference behavior: the reference reads its whole store per query
  * (`src/db.py:24-41` loads full tables); at 100 TB the file listing
  * IS the query planner's first bottleneck, and per-dir skipping from
  * manifest metadata is what keeps a selective query from touching
  * every file.
  *
  * Pruning is CONSERVATIVE (false keeps only):
  *   - a dir is dropped only when EVERY manifest entry referencing it
  *     is prunable and provably excluded by some conjunct;
  *   - entries carrying merge-on-read `__aux` appendices are never
  *     pruned (updated values may lie outside the recorded bounds —
  *     the same rule `readSkipping` applies);
  *   - predicates that are not simple `col <op> literal` comparisons
  *     (casts, functions, UDFs, IS NULL) prune nothing;
  *   - deletion vectors never affect pruning: a DV only removes rows,
  *     so recorded bounds remain a superset of the live rows.
  *
  * Scale note: `listFiles` is a driver-side metadata operation over
  * the manifest's entry list — O(dirs), no filesystem I/O (file
  * statuses are listed once when the index is built, the same work
  * `InMemoryFileIndex` does for `spark.read.parquet`).
  */
object GraftFileIndex {

  /** Skipping metadata of ONE manifest entry: numeric zone-map bounds
    * and bloom payloads under PHYSICAL column names, plus whether the
    * entry may be pruned at all (false for aux-carrying entries). */
  final case class EntryMeta(stats: Map[String, (BigDecimal, BigDecimal)],
                             blooms: Map[String, String],
                             prunable: Boolean)

  /** One data dir with the entries that reference it (several after
    * compaction folds partitions into a shared dir). */
  final case class DirMeta(relDir: String, files: Seq[FileStatus],
                           entries: Seq[EntryMeta])

  private[ops] def numOf(l: Literal): Option[BigDecimal] =
    if (l.value == null) None
    else l.dataType match {
      case ByteType => Some(BigDecimal(l.value.asInstanceOf[Byte].toInt))
      case ShortType => Some(BigDecimal(l.value.asInstanceOf[Short].toInt))
      case IntegerType | DateType => Some(BigDecimal(l.value.asInstanceOf[Int]))
      case LongType | TimestampType | TimestampNTZType =>
        Some(BigDecimal(l.value.asInstanceOf[Long]))
      case FloatType =>
        val f = l.value.asInstanceOf[Float]
        if (java.lang.Float.isFinite(f)) Some(BigDecimal(f.toDouble)) else None
      case DoubleType =>
        val d = l.value.asInstanceOf[Double]
        if (java.lang.Double.isFinite(d)) Some(BigDecimal(d)) else None
      case _ => None
    }

  /** The literal as the string [[ManifestTable.bloomContains]] hashes —
    * blooms are built over `CAST(col AS STRING)`, so only types whose
    * JVM `toString` matches that cast exactly are eligible. */
  private[ops] def strOf(l: Literal): Option[String] =
    if (l.value == null) None
    else l.dataType match {
      case StringType | IntegerType | LongType | ByteType | ShortType =>
        Some(l.value.toString)
      case _ => None
    }
}

final class GraftFileIndex(tableRoot: Path,
                           dirs: Seq[GraftFileIndex.DirMeta]) extends FileIndex {
  import GraftFileIndex._

  /** Evidence channel: `(dirsKept, dirsTotal)` of the most recent
    * `listFiles` call that carried data filters — the gate/spec
    * instrument (specs assert kept < total for a selective filter). */
  @volatile var lastPrune: Option[(Long, Long)] = None

  override def rootPaths: Seq[Path] = Seq(tableRoot)
  override def partitionSchema: StructType = StructType(Nil)
  override def refresh(): Unit = ()
  override lazy val sizeInBytes: Long =
    dirs.iterator.flatMap(_.files).map(_.getLen).sum
  override def inputFiles: Array[String] =
    dirs.flatMap(_.files.map(_.getPath.toString)).toArray

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (dataFilters.isEmpty) dirs
      else dirs.filter { d =>
        !dataFilters.exists(f => d.entries.forall(en => en.prunable && excludes(f, en)))
      }
    if (dataFilters.nonEmpty) lastPrune = Some((kept.size.toLong, dirs.size.toLong))
    Seq(PartitionDirectory(InternalRow.empty, kept.flatMap(_.files).toArray))
  }

  /** True only when NO row of `en`'s dir can satisfy `e` — unknown
    * shapes answer false (keep). `excludes(And(l,r))` may exclude on
    * either side; `Or` needs both. */
  private def excludes(e: Expression, en: EntryMeta): Boolean = e match {
    case And(l, r) => excludes(l, en) || excludes(r, en)
    case Or(l, r) => excludes(l, en) && excludes(r, en)
    case EqualTo(a: AttributeReference, l: Literal) => exclEq(a.name, l, en)
    case EqualTo(l: Literal, a: AttributeReference) => exclEq(a.name, l, en)
    case EqualNullSafe(a: AttributeReference, l: Literal) if l.value != null =>
      exclEq(a.name, l, en)
    case EqualNullSafe(l: Literal, a: AttributeReference) if l.value != null =>
      exclEq(a.name, l, en)
    case GreaterThan(a: AttributeReference, l: Literal) =>
      bounds(a.name, l, en).exists { case (_, mx, v) => mx <= v }
    case GreaterThan(l: Literal, a: AttributeReference) => // v > col ⇔ col < v
      bounds(a.name, l, en).exists { case (mn, _, v) => mn >= v }
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      bounds(a.name, l, en).exists { case (_, mx, v) => mx < v }
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      bounds(a.name, l, en).exists { case (mn, _, v) => mn > v }
    case LessThan(a: AttributeReference, l: Literal) =>
      bounds(a.name, l, en).exists { case (mn, _, v) => mn >= v }
    case LessThan(l: Literal, a: AttributeReference) =>
      bounds(a.name, l, en).exists { case (_, mx, v) => mx <= v }
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      bounds(a.name, l, en).exists { case (mn, _, v) => mn > v }
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      bounds(a.name, l, en).exists { case (_, mx, v) => mx < v }
    case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.forall(v => exclEq(a.name, v.asInstanceOf[Literal], en))
    case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
      hset.forall(v => exclEq(a.name, Literal.create(v, a.dataType), en))
    case _ => false
  }

  private def bounds(name: String, l: Literal,
                     en: EntryMeta): Option[(BigDecimal, BigDecimal, BigDecimal)] =
    for { (mn, mx) <- en.stats.get(name); v <- numOf(l) } yield (mn, mx, v)

  private def exclEq(name: String, l: Literal, en: EntryMeta): Boolean = {
    val statsExclude = bounds(name, l, en).exists { case (mn, mx, v) => v < mn || v > mx }
    statsExclude || (en.blooms.get(name) match {
      case Some(payload) =>
        strOf(l).exists(s => !ManifestTable.bloomContains(payload, s))
      case None => false
    })
  }
}
