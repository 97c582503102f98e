package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** MULTI-TABLE ATOMIC COMMIT over [[ManifestTable]]s — the consistency
  * a 100 TB pipeline's table PAIRS need (fact + rollup, corpus +
  * index: [[graft.ext.IvfStore]] commits two tables; a failure between
  * them leaves an index referencing documents the corpus doesn't
  * have). Neither Delta nor Iceberg offers this without an external
  * catalog; the manifest format makes it cheap because every table
  * commit is already ONE create-if-absent of a version file.
  *
  * Protocol (write-ahead journal + roll-forward):
  *   1. STAGE — inside [[run]], every ManifestTable write lands its
  *      manifest as a `.tmp` (the data dirs are written normally —
  *      they are invisible until a manifest references them) and the
  *      CAS is deferred; per-table cleanups are deferred too.
  *   2. PRE-CHECK — each staged table must still head at version-1
  *      (no rival commit since planning), else clean abort: tmps
  *      deleted, NO table changed.
  *   3. JOURNAL — one file listing (table, version, tmpName) renamed
  *      into the journal dir. THE transaction commit point: before it,
  *      a crash aborts wholesale (tmps are graced residue the next
  *      per-table commit sweeps); after it, the transaction IS
  *      committed and completion is a matter of roll-forward.
  *   4. PROMOTE — each staged manifest CAS'd live, in stage order.
  *   5. Journal deleted, tmps deleted, deferred cleanups run.
  *
  * [[recover]] rolls forward any journal a crash left: a promoted
  * entry is recognized (dest exists; if its tmp also survives, the
  * bytes must match) and skipped — recovery is IDEMPOTENT and safe to
  * re-run. A dest taken by a FOREIGN commit (different bytes) raises
  * [[TxnBrokenException]] — the single-writer-per-table contract was
  * violated mid-transaction, which no journal can repair.
  *
  * Contracts: one staged commit per table per transaction (a second
  * write to the same table inside `run` refuses — staged state is
  * invisible to reads, so the second op would plan against a stale
  * head); writes inside `run` must be plain DML (merge/applyChanges/
  * deletes) — composed ops that READ BACK their own commit see the
  * pre-transaction snapshot; and, as everywhere in this format,
  * single writer per table while a transaction is in flight
  * (withCommitRetry's optimistic protocol resolves races between
  * INDEPENDENT commits, not within a multi-table promote). */
object ManifestTxn {

  /** One table's deferred commit: version and tmp manifest name. */
  final case class Staged(path: String, version: Long, tmpName: String)

  /** A pre-check failure: some table moved since planning. Nothing
    * was committed; re-run the transaction against the new heads. */
  final case class TxnConflictException(msg: String) extends RuntimeException(msg)

  /** A foreign commit took a journaled version slot with different
    * content — unrecoverable by roll-forward. */
  final case class TxnBrokenException(msg: String) extends RuntimeException(msg)

  final class Context private[ManifestTxn] () {
    private[ManifestTxn] val staged =
      scala.collection.mutable.LinkedHashMap.empty[String, Staged]
    private[ManifestTxn] val cleanups =
      scala.collection.mutable.Buffer.empty[(String, Set[Long])]

    private[ops] def stage(path: String, version: Long, tmpName: String): Unit = {
      require(!staged.contains(path),
        s"ManifestTxn: table $path already has a staged commit — one commit per " +
          "table per transaction (staged state is invisible to reads, so a second " +
          "write would plan against a stale head)")
      staged(path) = Staged(path, version, tmpName)
    }

    private[ops] def deferCleanup(path: String, keepVersions: Set[Long]): Unit =
      cleanups += ((path, keepVersions))
  }

  private val ctx = new ThreadLocal[Option[Context]] {
    override def initialValue: Option[Context] = None
  }
  private[ops] def active(): Option[Context] = ctx.get()

  private def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run `body` — whose ManifestTable writes are staged — then commit
    * them ALL or NONE. Returns `body`'s result on success. */
  def run[T](spark: SparkSession, journalDir: String)(body: => T): T = {
    require(ctx.get().isEmpty, "ManifestTxn: transactions do not nest")
    val c = new Context()
    ctx.set(Some(c))
    val result =
      try body
      catch { case t: Throwable => abort(spark, c); ctx.set(None); throw t }
      finally ctx.set(None)
    commit(spark, journalDir, c)
    result
  }

  private def abort(spark: SparkSession, c: Context): Unit =
    c.staged.values.foreach { s =>
      val fs = fsOf(spark, s.path)
      fs.delete(new Path(s"${s.path}/${tmpRel(s)}"), false)
    }

  private def tmpRel(s: Staged): String = s"${ManifestTable.ManifestDir}/${s.tmpName}"

  /** Stage `body`'s writes and return them WITHOUT committing — the
    * crash-simulation hook: a spec journals/promotes the phases
    * itself to pin recovery behavior. Test-only granularity. */
  private[graft] def stageOnly[T](spark: SparkSession)(body: => T): Seq[Staged] = {
    require(ctx.get().isEmpty, "ManifestTxn: transactions do not nest")
    val c = new Context()
    ctx.set(Some(c))
    try { body; c.staged.values.toSeq } finally ctx.set(None)
  }

  /** Commit phase: pre-check, journal, promote, cleanup. Exposed at
    * `private[graft]` granularity so the crash-simulation spec can
    * drive the phases separately; [[run]] is the public surface. */
  private def commit(spark: SparkSession, journalDir: String, c: Context): Unit = {
    if (c.staged.isEmpty) return
    // PRE-CHECK: every staged table must still head at version-1.
    c.staged.values.foreach { s =>
      val fs = fsOf(spark, s.path)
      val head = ManifestTable.versions(fs, s.path).lastOption
      val expected = if (s.version == 1L) None else Some(s.version - 1)
      if (head != expected) {
        abort(spark, c)
        throw TxnConflictException(
          s"ManifestTxn: table ${s.path} moved to m${head.getOrElse(-1L)} while the " +
            s"transaction staged m${s.version} — nothing committed; re-run")
      }
    }
    val journal = writeJournal(spark, journalDir, c.staged.values.toSeq)
    promote(spark, c.staged.values.toSeq)
    fsOf(spark, journalDir).delete(journal, false)
    c.staged.values.foreach { s =>
      fsOf(spark, s.path).delete(new Path(s"${s.path}/${tmpRel(s)}"), false)
    }
    c.cleanups.foreach { case (p, keep) =>
      ManifestTable.cleanupNow(fsOf(spark, p), p, keep)
    }
  }

  private[graft] def writeJournal(spark: SparkSession, journalDir: String,
                                  staged: Seq[Staged]): Path = {
    val fs = fsOf(spark, journalDir)
    val name = s"txn-${java.util.UUID.randomUUID()}"
    val tmp = new Path(s"$journalDir/$name.tmp")
    fs.mkdirs(tmp.getParent)
    val out = fs.create(tmp, false)
    try out.write(staged.map(s => s"${s.path}\t${s.version}\t${s.tmpName}")
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val dest = new Path(s"$journalDir/$name")
    require(fs.rename(tmp, dest), s"ManifestTxn: journal rename failed for $dest")
    dest
  }

  /** Roll the journaled promotes forward, idempotently. */
  private[graft] def promote(spark: SparkSession, staged: Seq[Staged]): Unit =
    staged.foreach { s =>
      val fs = fsOf(spark, s.path)
      val dest = ManifestTable.manifestDest(s.path, s.version)
      val tmp = new Path(s"${s.path}/${tmpRel(s)}")
      if (fs.exists(dest)) {
        // Already promoted (a resumed roll-forward), OR a foreign
        // commit stole the slot. The surviving tmp adjudicates.
        if (fs.exists(tmp) && !sameBytes(fs, dest, tmp))
          throw TxnBrokenException(
            s"ManifestTxn: $dest was committed by a FOREIGN writer while this " +
              "transaction held a journaled claim on it — the single-writer-per-" +
              "table contract was violated; manual reconciliation required")
      } else {
        require(fs.exists(tmp),
          s"ManifestTxn: staged manifest $tmp is gone and $dest was never " +
            "promoted — cannot roll forward")
        if (!ManifestTable.casManifest(fs, dest, tmp) && !sameBytes(fs, dest, tmp))
          throw TxnBrokenException(
            s"ManifestTxn: lost the CAS on $dest to a foreign writer mid-promote; " +
              "manual reconciliation required")
      }
    }

  private def sameBytes(fs: FileSystem, a: Path, b: Path): Boolean = {
    def read(p: Path): Array[Byte] = {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    }
    java.util.Arrays.equals(read(a), read(b))
  }

  /** Complete any transaction a crash left journaled: promote the
    * un-promoted, delete the journal and surviving tmps. Returns the
    * number of journals rolled forward. Deferred cleanups lost to the
    * crash are NOT replayed — they are retention housekeeping the next
    * per-table commit performs anyway. */
  def recover(spark: SparkSession, journalDir: String): Int = {
    val fs = fsOf(spark, journalDir)
    val dir = new Path(journalDir)
    if (!fs.exists(dir)) return 0
    val journals = fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.startsWith("txn-") && !p.getName.endsWith(".tmp"))
    journals.foreach { j =>
      val in = fs.open(j)
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                    finally in.close()
      val staged = content.split('\n').iterator.filter(_.nonEmpty).map { line =>
        val Array(p, v, t) = line.split('\t')
        Staged(p, v.toLong, t)
      }.toSeq
      promote(spark, staged)
      fs.delete(j, false)
      staged.foreach(s =>
        fsOf(spark, s.path).delete(new Path(s"${s.path}/${tmpRel(s)}"), false))
    }
    journals.length
  }
}
