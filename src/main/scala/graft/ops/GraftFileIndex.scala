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

  /** Skipping metadata of ONE manifest entry: numeric and string
    * zone-map bounds, per-column null counts, the entry's row count,
    * and bloom payloads — all under PHYSICAL column names — plus
    * whether the entry may be pruned at all (false for aux-carrying
    * entries). String bounds are recorded only when pure ASCII
    * (where UTF-8 byte order, the parquet footer's comparator, agrees
    * with Java string order); null counts only when every footer sets
    * them. */
  final case class EntryMeta(stats: Map[String, (BigDecimal, BigDecimal)],
                             blooms: Map[String, String],
                             prunable: Boolean,
                             strStats: Map[String, (String, String)] = Map.empty,
                             nullCounts: Map[String, Long] = Map.empty,
                             rowCount: Option[Long] = None,
                             key: Option[String] = None,
                             tokBlooms: Map[String, String] = Map.empty,
                             sums: Map[String, BigInt] = Map.empty)

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
      case _: DecimalType => // money columns: the crypto tables' natural type
        Some(l.value.asInstanceOf[org.apache.spark.sql.types.Decimal].toBigDecimal)
      case _ => None
    }

  /** The literal as the string [[ManifestTable.bloomContains]] hashes —
    * blooms are built over `CAST(col AS STRING)`, so only types whose
    * JVM `toString` matches that cast exactly are eligible. */
  private[graft] def strOf(l: Literal): Option[String] =
    if (l.value == null) None
    else l.dataType match {
      case StringType | IntegerType | LongType | ByteType | ShortType =>
        Some(l.value.toString)
      case _ => None
    }

  /** A string literal eligible for string zone-map comparison: pure
    * ASCII, where UTF-8 byte order (the footer comparator the
    * committed bounds were recorded under) and Java string order
    * agree. Non-ASCII answers None → no pruning (conservative). */
  private[ops] def asciiOf(l: Literal): Option[String] =
    if (l.value == null || l.dataType != StringType) None
    else {
      val s = l.value.toString
      if (s.forall(c => c >= 0x20 && c < 0x7f)) Some(s) else None
    }

  /** Unwraps `CAST(ts AS DATE)` — the Catalyst form of
    * `to_date(tsCol)` and the single most common time filter a user
    * writes (`to_date(day) = DATE '…'`). The cast is MONOTONE
    * non-injective: date D covers the timestamp range
    * `[D 00:00, D+1 00:00)` in the cast's session zone, so every
    * comparison against a date literal translates to a range check on
    * the column's committed micros bounds. Yields the attribute and
    * the zone id the cast resolved. */
  private[ops] object TsAsDate {
    def unapply(e: Expression): Option[(AttributeReference, String)] = e match {
      case c @ Cast(a: AttributeReference, DateType, _, _)
          if a.dataType == TimestampType =>
        Some((a, c.timeZoneId.getOrElse("UTC")))
      case _ => None
    }
  }

  /** `[lo, hi)` in epoch MICROS of date-literal `days` in `zone` —
    * the timestamp window `CAST(ts AS DATE) = days` selects. */
  private[ops] def dayMicros(days: Int, zone: String): (Long, Long) = {
    val z = java.time.ZoneId.of(zone)
    val d = java.time.LocalDate.ofEpochDay(days.toLong)
    def micros(i: java.time.Instant): Long =
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    (micros(d.atStartOfDay(z).toInstant),
     micros(d.plusDays(1).atStartOfDay(z).toInstant))
  }

  private[ops] def daysOf(l: Literal): Option[Int] =
    if (l.value == null || l.dataType != DateType) None
    else Some(l.value.asInstanceOf[Int])

  /** Unwraps `date_trunc(unit, ts)` — the dashboard time filter
    * (`date_trunc('day', ts) = TIMESTAMP '…'`). Monotone
    * non-injective like [[TsAsDate]]. */
  private[ops] object TruncTs {
    def unapply(e: Expression): Option[(AttributeReference, String, String)] = e match {
      case t @ TruncTimestamp(Literal(fmt, StringType), a: AttributeReference, _)
          if a.dataType == TimestampType && fmt != null =>
        Some((a, fmt.toString.toLowerCase(java.util.Locale.ROOT),
          t.timeZoneId.getOrElse("UTC")))
      case _ => None
    }
  }

  /** `(floor, next-boundary)` in epoch micros of trunc-unit `unit`
    * around instant `tMicros` in `zone`; None for units this prunes
    * conservatively on (week variants, quarters, sub-hour). */
  private[ops] def truncBounds(unit: String, tMicros: Long,
                               zone: String): Option[(Long, Long)] = {
    val z = java.time.ZoneId.of(zone)
    def micros(x: java.time.chrono.ChronoZonedDateTime[_]): Long = {
      val i = x.toInstant
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    }
    val zdt = java.time.Instant.ofEpochSecond(Math.floorDiv(tMicros, 1000000L),
      Math.floorMod(tMicros, 1000000L) * 1000L).atZone(z)
    val d = zdt.toLocalDate
    val win = unit match {
      case "day" | "dd" =>
        Some((d.atStartOfDay(z), d.plusDays(1).atStartOfDay(z)))
      case "hour" =>
        val h = zdt.truncatedTo(java.time.temporal.ChronoUnit.HOURS)
        Some((h, h.plusHours(1)))
      case "month" | "mon" | "mm" =>
        val m = d.withDayOfMonth(1)
        Some((m.atStartOfDay(z), m.plusMonths(1).atStartOfDay(z)))
      case "year" | "yyyy" | "yy" =>
        val y = d.withDayOfYear(1)
        Some((y.atStartOfDay(z), y.plusYears(1).atStartOfDay(z)))
      case _ => None
    }
    win.map { case (lo, hi) => (micros(lo), micros(hi)) }
  }
}

final class GraftFileIndex(tableRoot: Path,
                           dirs: Seq[GraftFileIndex.DirMeta],
                           reportTotal: Option[Long] = None,
                           val partitionColName: Option[String] = None,
                           val writerTz: Option[String] = None)
    extends FileIndex {
  import GraftFileIndex._

  /** Evidence channel: `(dirsKept, dirsTotal)` of the most recent
    * `listFiles` call that carried data filters — the gate/spec
    * instrument (specs assert kept < total for a selective filter).
    * A join-narrowed index ([[joinNarrow]]) reports against the
    * ORIGINAL table's dir count and records evidence even for a
    * filterless listing (the narrowing IS the filter). */
  @volatile var lastPrune: Option[(Long, Long)] = None

  /** True for an index [[joinNarrow]] produced — the join-prune rule
    * never narrows twice. */
  private[graft] def isNarrowed: Boolean = reportTotal.isDefined

  private[graft] def dirCount: Int = dirs.size

  /** Every live entry's skipping metadata — [[graft.plans.StatsAggRule]]'s
    * input (each manifest entry appears under exactly one dir, so this
    * enumerates entries once; per-entry stats stay per-KEY exact even
    * for compact-shared dirs because entries carry their pre-compact
    * stats forward verbatim). */
  private[graft] def entryMetas: Seq[EntryMeta] = dirs.flatMap(_.entries)

  /** The relative data dirs this index reads — [[graft.plans
    * .MvRewriteRule]]'s scan-identity instrument (equality with the
    * current manifest's dir set proves the scan is the complete,
    * current table: dir names are UUID-fresh per commit). Aux
    * (appendix) dirs appear here too, so a pending-MoR scan never
    * compares equal. */
  private[graft] def relDirs: Seq[String] = dirs.map(_.relDir)

  /** The join-driven narrowing ([[graft.plans.JoinPruneRule]]'s
    * worker): keep only dirs where at least one entry might hold at
    * least one of the dim side's join keys, by the committed blooms
    * and numeric/string zone maps — the same conservative rules
    * [[ManifestTable.readJoinPruned]] applies (aux-carrying entries
    * always survive; a column with no recorded metadata never
    * prunes; non-numeric / non-ASCII keys skip that comparison
    * domain). An EMPTY key set joins to nothing — every dir prunes.
    * Returns None when nothing would be pruned (leave the plan
    * untouched). */
  private[graft] def joinNarrow(column: String,
                                keys: Seq[String]): Option[GraftFileIndex] = {
    val kept =
      if (keys.isEmpty) Nil
      else {
        val nums = keys.map(k => try Some(BigDecimal(k))
          catch { case _: NumberFormatException => None })
        val numOk = nums.forall(_.isDefined) // compare only when every key parses
        def entryMayHold(en: EntryMeta): Boolean =
          !en.prunable || keys.indices.exists { i =>
            val k = keys(i)
            val bloomHit = en.blooms.get(column)
              .forall(p => ManifestTable.bloomContains(p, k))
            val zoneHit = en.stats.get(column).forall { case (mn, mx) =>
              !numOk || { val v = nums(i).get; v >= mn && v <= mx } }
            val strHit = en.strStats.get(column).forall { case (mn, mx) =>
              !k.forall(c => c >= 0x20 && c < 0x7f) || (k >= mn && k <= mx) }
            bloomHit && zoneHit && strHit
          }
        dirs.filter(_.entries.exists(entryMayHold))
      }
    if (kept.size == dirs.size) None
    else Some(new GraftFileIndex(tableRoot, kept,
      Some(reportTotal.getOrElse(dirs.size.toLong)), partitionColName, writerTz))
  }

  override def rootPaths: Seq[Path] = Seq(tableRoot)
  override def partitionSchema: StructType = StructType(Nil)
  override def refresh(): Unit = ()
  override lazy val sizeInBytes: Long =
    dirs.iterator.flatMap(_.files).map(_.getLen).sum
  // Percent-escaped URIs, matching Spark's PartitioningAwareFileIndex
  // contract (callers do `new java.net.URI(inputFiles.head)`; raw
  // Path.toString breaks on partition values carrying spaces/colons).
  override def inputFiles: Array[String] =
    dirs.flatMap(_.files.map(_.getPath.toUri.toString)).toArray

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (dataFilters.isEmpty) dirs
      else dirs.filter { d =>
        !dataFilters.exists(f => d.entries.forall(en => en.prunable && excludes(f, en)))
      }
    if (dataFilters.nonEmpty || reportTotal.isDefined)
      lastPrune = Some((kept.size.toLong, reportTotal.getOrElse(dirs.size.toLong)))
    Seq(PartitionDirectory(InternalRow.empty, kept.flatMap(_.files).toArray))
  }

  /** True only when NO row of `en`'s dir can satisfy `e` — unknown
    * shapes answer false (keep). `excludes(And(l,r))` may exclude on
    * either side; `Or` needs both. Comparison cases prune from
    * numeric OR string zone maps ([[cmps]]); `IS NULL` prunes dirs
    * whose committed null count is zero, `IS NOT NULL` all-null dirs;
    * `CAST(ts AS DATE)` comparisons ([[TsAsDate]] — `to_date(day)`,
    * the most common time filter) translate to micros-range checks
    * against the timestamp column's own bounds. */
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
      cmps(a.name, l, en).exists(_._2 <= 0) // mx <= v
    case GreaterThan(l: Literal, a: AttributeReference) => // v > col ⇔ col < v
      cmps(a.name, l, en).exists(_._1 >= 0) // mn >= v
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      cmps(a.name, l, en).exists(_._2 < 0) // mx < v
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      cmps(a.name, l, en).exists(_._1 > 0) // mn > v
    case LessThan(a: AttributeReference, l: Literal) =>
      cmps(a.name, l, en).exists(_._1 >= 0)
    case LessThan(l: Literal, a: AttributeReference) =>
      cmps(a.name, l, en).exists(_._2 <= 0)
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      cmps(a.name, l, en).exists(_._1 > 0)
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      cmps(a.name, l, en).exists(_._2 < 0)
    case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.forall(v => exclEq(a.name, v.asInstanceOf[Literal], en))
    case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
      hset.forall(v => exclEq(a.name, Literal.create(v, a.dataType), en))
    case StartsWith(a: AttributeReference, l: Literal) =>
      // col LIKE 'p%' (the URL/domain family's natural filter): every
      // p-prefixed string s satisfies p <= s < succ(p), where succ(p)
      // bumps the last char — well-defined for ASCII p (last char
      // < 0x7f), the only literals the ASCII zone maps compare
      // against. Excluded when the dir's bounds sit entirely below p
      // or entirely at/after succ(p). Empty prefix keeps (matches all).
      (for { (mn, mx) <- en.strStats.get(a.name); p <- asciiOf(l) if p.nonEmpty }
        yield mx < p || mn >= p.init + (p.last + 1).toChar).getOrElse(false)
    case IsNull(a: AttributeReference) =>
      // a committed null count of ZERO proves no row of the dir is null
      en.nullCounts.get(a.name).contains(0L)
    case IsNotNull(a: AttributeReference) =>
      // every row null (nulls == rowcount) proves no row survives
      (for { n <- en.nullCounts.get(a.name); r <- en.rowCount } yield n == r)
        .getOrElse(false)
    // ---- CAST(ts AS DATE) <op> DATE-literal: range-translate -------
    case EqualTo(TsAsDate(a, z), l: Literal) => exclDay(a, z, l, en)
    case EqualTo(l: Literal, TsAsDate(a, z)) => exclDay(a, z, l, en)
    case GreaterThan(TsAsDate(a, z), l: Literal) => // date(ts) > D ⇔ ts >= hi
      dayWin(a, z, l, en).exists { case (_, mx, _, hi) => mx < hi }
    case GreaterThan(l: Literal, TsAsDate(a, z)) => // D > date(ts) ⇔ ts < lo
      dayWin(a, z, l, en).exists { case (mn, _, lo, _) => mn >= lo }
    case GreaterThanOrEqual(TsAsDate(a, z), l: Literal) => // ⇔ ts >= lo
      dayWin(a, z, l, en).exists { case (_, mx, lo, _) => mx < lo }
    case GreaterThanOrEqual(l: Literal, TsAsDate(a, z)) => // ⇔ ts < hi
      dayWin(a, z, l, en).exists { case (mn, _, _, hi) => mn >= hi }
    case LessThan(TsAsDate(a, z), l: Literal) => // ⇔ ts < lo
      dayWin(a, z, l, en).exists { case (mn, _, lo, _) => mn >= lo }
    case LessThan(l: Literal, TsAsDate(a, z)) => // ⇔ ts >= hi
      dayWin(a, z, l, en).exists { case (_, mx, _, hi) => mx < hi }
    case LessThanOrEqual(TsAsDate(a, z), l: Literal) => // ⇔ ts < hi
      dayWin(a, z, l, en).exists { case (mn, _, _, hi) => mn >= hi }
    case LessThanOrEqual(l: Literal, TsAsDate(a, z)) => // ⇔ ts >= lo
      dayWin(a, z, l, en).exists { case (_, mx, lo, _) => mx < lo }
    case In(TsAsDate(a, z), vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.forall(v => exclDay(a, z, v.asInstanceOf[Literal], en))
    // ---- date_trunc(unit, ts) <op> TIMESTAMP-literal ---------------
    // trunc output is always unit-aligned, so every comparison against
    // T translates to a micros threshold: with T's window [lo, hi)
    // (lo = floor boundary, hi = next), trunc(ts) > T ⇔ ts >= hi;
    // trunc(ts) >= T ⇔ ts >= (T aligned ? lo : hi); trunc(ts) <= T ⇔
    // ts < hi; trunc(ts) < T ⇔ ts < (T aligned ? lo : hi).
    case EqualTo(TruncTs(a, u, z), l: Literal) => exclTrunc(a, u, z, l, en)
    case EqualTo(l: Literal, TruncTs(a, u, z)) => exclTrunc(a, u, z, l, en)
    case In(TruncTs(a, u, z), vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.forall(v => exclTrunc(a, u, z, v.asInstanceOf[Literal], en))
    case GreaterThan(TruncTs(a, u, z), l: Literal) => // ⇔ ts >= hi
      truncWin(u, z, l, en.stats.get(a.name)).exists { case (mn @ _, mx, _, hi, _) => mx < hi }
    case GreaterThan(l: Literal, TruncTs(a, u, z)) => // trunc < T ⇔ ts < (al ? lo : hi)
      truncWin(u, z, l, en.stats.get(a.name)).exists {
        case (mn, _, lo, hi, al) => mn >= (if (al) lo else hi) }
    case GreaterThanOrEqual(TruncTs(a, u, z), l: Literal) => // ⇔ ts >= (al ? lo : hi)
      truncWin(u, z, l, en.stats.get(a.name)).exists {
        case (_, mx, lo, hi, al) => mx < (if (al) lo else hi) }
    case GreaterThanOrEqual(l: Literal, TruncTs(a, u, z)) => // trunc <= T ⇔ ts < hi
      truncWin(u, z, l, en.stats.get(a.name)).exists { case (mn, _, _, hi, _) => mn >= hi }
    case LessThan(TruncTs(a, u, z), l: Literal) => // ⇔ ts < (al ? lo : hi)
      truncWin(u, z, l, en.stats.get(a.name)).exists {
        case (mn, _, lo, hi, al) => mn >= (if (al) lo else hi) }
    case LessThan(l: Literal, TruncTs(a, u, z)) => // trunc > T ⇔ ts >= hi
      truncWin(u, z, l, en.stats.get(a.name)).exists { case (_, mx, _, hi, _) => mx < hi }
    case LessThanOrEqual(TruncTs(a, u, z), l: Literal) => // ⇔ ts < hi
      truncWin(u, z, l, en.stats.get(a.name)).exists { case (mn, _, _, hi, _) => mn >= hi }
    case LessThanOrEqual(l: Literal, TruncTs(a, u, z)) => // trunc >= T ⇔ ts >= (al ? lo : hi)
      truncWin(u, z, l, en.stats.get(a.name)).exists {
        case (_, mx, lo, hi, al) => mx < (if (al) lo else hi) }
    // ---- tokenMatch(text, 'tok') against a committed TOKEN bloom ---
    // graft.ext.TextAnalysis.tokenMatch builds EXACTLY
    // `array_contains(split(lower(col), TokenSplitRe), 'tok')`; a dir
    // whose committed token bloom proves the token absent from every
    // row's token stream is excluded (no false negatives — every
    // distinct token of every row was inserted at commit). Guarded on
    // the literal being a real token: a non-[a-z0-9]+ literal can
    // never equal a split element, but pruning on it would be a
    // semantics claim the bloom doesn't make — keep instead.
    case ArrayContains(
        StringSplit(Lower(a: AttributeReference),
          Literal(re, StringType), Literal(-1, IntegerType)),
        Literal(tok, StringType))
        if re != null && tok != null &&
          re.toString == graft.ext.TextAnalysis.TokenSplitRe => {
      val t = tok.toString
      t.nonEmpty && t.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) &&
        en.tokBlooms.get(a.name)
          .exists(p => !ManifestTable.bloomContains(p, t))
    }
    // tokenMatchAny(text, toks): excluded only when the bloom proves
    // EVERY probe token absent. Conservative guard: every element must
    // be a real [a-z0-9]+ token, else no pruning.
    case ArraysOverlap(
        StringSplit(Lower(a: AttributeReference),
          Literal(re, StringType), Literal(-1, IntegerType)),
        Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
          ArrayType(StringType, _)))
        if re != null && re.toString == graft.ext.TextAnalysis.TokenSplitRe => {
      val toks = (0 until arr.numElements()).map(i =>
        if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString)
      toks.nonEmpty &&
        toks.forall(t => t != null && t.nonEmpty &&
          t.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))) &&
        en.tokBlooms.get(a.name)
          .exists(p => toks.forall(t => !ManifestTable.bloomContains(p, t)))
    }
    case _ => false
  }

  /** `(min, max, lo, hi, aligned)` for a trunc-comparison: the entry's
    * micros bounds plus the literal's unit window and whether the
    * literal IS the floor boundary. */
  private def truncWin(unit: String, zone: String, l: Literal,
                       stats: Option[(BigDecimal, BigDecimal)])
      : Option[(BigDecimal, BigDecimal, Long, Long, Boolean)] =
    for {
      (mn, mx) <- stats
      v <- if (l.dataType == TimestampType) numOf(l) else None
      (lo, hi) <- truncBounds(unit, v.toLongExact, zone)
    } yield (mn, mx, lo, hi, lo == v.toLongExact)

  /** `date_trunc(unit, ts) = T`: when T is unit-aligned the predicate
    * selects `ts ∈ [T, next-boundary)` — range-check the committed
    * micros bounds; when T is NOT aligned the predicate is FALSE for
    * every row (trunc output is always aligned), so every dir
    * excludes regardless of stats. */
  private def exclTrunc(a: AttributeReference, unit: String, zone: String,
                        l: Literal, en: EntryMeta): Boolean =
    (if (l.dataType == TimestampType) numOf(l) else None) match {
      case None => false
      case Some(v) =>
        truncBounds(unit, v.toLongExact, zone) match {
          case None => false
          case Some((lo, _)) if lo != v.toLongExact => true // unsatisfiable
          case Some((lo, hi)) =>
            en.stats.get(a.name).exists { case (mn, mx) => mx < lo || mn >= hi }
        }
    }

  private def bounds(name: String, l: Literal,
                     en: EntryMeta): Option[(BigDecimal, BigDecimal, BigDecimal)] =
    for { (mn, mx) <- en.stats.get(name); v <- numOf(l) } yield (mn, mx, v)

  /** `(compare(min, v), compare(max, v))` in whichever zone-map domain
    * holds both the column's bounds and the literal — numeric first,
    * ASCII-string second; None when neither does (keep). */
  private def cmps(name: String, l: Literal, en: EntryMeta): Option[(Int, Int)] =
    bounds(name, l, en).map { case (mn, mx, v) => (mn.compare(v), mx.compare(v)) }
      .orElse(for { (mn, mx) <- en.strStats.get(name); v <- asciiOf(l) }
        yield (mn.compareTo(v), mx.compareTo(v)))

  /** The entry's micros bounds for `a` plus the `[lo, hi)` micros
    * window of date-literal `l` in zone `z`. */
  private def dayWin(a: AttributeReference, z: String, l: Literal,
                     en: EntryMeta): Option[(BigDecimal, BigDecimal, Long, Long)] =
    for { (mn, mx) <- en.stats.get(a.name); d <- daysOf(l) } yield {
      val (lo, hi) = dayMicros(d, z)
      (mn, mx, lo, hi)
    }

  private def exclDay(a: AttributeReference, z: String, l: Literal,
                      en: EntryMeta): Boolean =
    dayWin(a, z, l, en).exists { case (mn, mx, lo, hi) => mx < lo || mn >= hi }

  private def exclEq(name: String, l: Literal, en: EntryMeta): Boolean = {
    val statsExclude = cmps(name, l, en).exists { case (mnC, mxC) => mnC > 0 || mxC < 0 }
    statsExclude || (en.blooms.get(name) match {
      case Some(payload) =>
        strOf(l).exists(s => !ManifestTable.bloomContains(payload, s))
      case None => false
    })
  }
}
