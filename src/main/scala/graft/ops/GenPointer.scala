package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** BLUE/GREEN GENERATION POINTER for the persisted index stores
  * ([[graft.ext.IvfStore]], [[graft.ext.PqStore]],
  * [[graft.ext.CentroidStore]]).
  *
  * A drift-triggered retrain must not rebuild in place: a live
  * `searchCommitted` would either see a half-built index or lose the
  * index for the duration of training. Instead the store builds the
  * NEW generation side-by-side under `base/gen-NNNNNN/` while every
  * reader keeps resolving the current one, then flips this pointer in
  * ONE compare-and-swap — the same per-filesystem commit primitive
  * manifest versions use ([[ManifestTable.casManifest]]: HDFS rename
  * semantics, or an atomic hard link on local `file://`), so exactly
  * one of two racing retrains wins and a reader NEVER resolves a
  * half-flipped state.
  *
  * Layout: `base/_gen/g<%012d>` marker files; the current generation
  * is the highest marker, and generation 0 (no marker at all) is the
  * legacy flat layout (tables directly under `base/`) — existing
  * tables keep working untouched. Generation data lives under
  * `base/gen-<%06d>/`.
  *
  * Crash analysis: a retrain that dies BEFORE its flip leaves an
  * orphaned gen dir and no pointer change — readers are unaffected
  * and the next retrain numbers PAST the orphan ([[next]] scans dirs
  * as well as markers), so it can never collide with a rival build in
  * progress. A retrain that dies AFTER its flip is simply complete
  * (retention of old generations just hasn't run). */
object GenPointer {

  private def ptrDir(base: String) = s"$base/_gen"

  /** The generation data root: gen 0 = the legacy flat layout. */
  def root(base: String, gen: Long): String =
    if (gen == 0L) base else f"$base/gen-$gen%06d"

  def fsOf(spark: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markers(fs: FileSystem, base: String): Seq[Long] = {
    val d = new Path(ptrDir(base))
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).map(_.getPath.getName).toSeq
      .filter(n => n.length == 13 && n.startsWith("g") &&
        n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).sorted
  }

  /** The CURRENT generation: highest flipped marker; 0 = legacy. */
  def current(fs: FileSystem, base: String): Long =
    markers(fs, base).lastOption.getOrElse(0L)

  /** `root` of the current generation — what every reader resolves. */
  def resolved(spark: SparkSession, base: String): String =
    root(base, current(fsOf(spark, base), base))

  /** The next build number: past every flipped marker AND every
    * existing gen dir (a crashed or rival in-flight build keeps its
    * dir; numbering past it means builds never collide). */
  def next(fs: FileSystem, base: String): Long = {
    val dirGens =
      if (!fs.exists(new Path(base))) Nil
      else fs.listStatus(new Path(base)).map(_.getPath.getName).toSeq
        .filter(n => n.length == 10 && n.startsWith("gen-") &&
          n.drop(4).forall(_.isDigit))
        .map(_.drop(4).toLong)
    (markers(fs, base) ++ dirGens :+ 0L).max + 1
  }

  /** CAS-flip the pointer to `gen`. Exactly one of two racing flips
    * to the same number wins; the loser gets an error (its built
    * generation dir survives for inspection). Refuses to flip
    * backwards — a stale retrain must not roll the pointer back. */
  def flip(fs: FileSystem, base: String, gen: Long): Unit = {
    val cur = current(fs, base)
    require(gen > cur,
      s"GenPointer.flip: generation $gen is not past the current $cur")
    val dest = new Path(f"${ptrDir(base)}/g$gen%012d")
    fs.mkdirs(dest.getParent)
    val tmp = new Path(f"${ptrDir(base)}/g$gen%012d-${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write(gen.toString.getBytes("UTF-8")) finally out.close()
    if (!ManifestTable.casManifest(fs, dest, tmp)) {
      fs.delete(tmp, false)
      sys.error(s"GenPointer.flip: generation $gen was already flipped by a rival")
    }
  }

  /** RETENTION: delete the data of flipped generations older than the
    * `keep` most recent (markers stay — the pointer history is the
    * audit trail; a deleted generation's marker resolves nothing and
    * [[current]] never returns it because newer markers exist). The
    * legacy generation 0 owns `legacyDirs` table subdirs directly
    * under `base/`, so those are what a retired gen 0 deletes. Never
    * touches un-flipped (in-flight or crashed) builds ABOVE the
    * current pointer. Returns the retired generation numbers.
    *
    * CONCURRENT-READER ORDERING (the [[graft.ops.ManifestTable]]
    * `retainVersions` contract transplanted): a reader RESOLVES its
    * generation once at plan time ([[resolved]]) and then reads that
    * root for the rest of its query. Retention never deletes the
    * CURRENT generation (`keep >= 1`), so the exposure window is a
    * reader that resolved BEFORE a flip and is still scanning when a
    * retire lands AFTER it — exactly the window a version expiry has
    * for a pinned old version. `keep = 2` (the retrain default:
    * current + previous) covers every reader that planned while the
    * previous generation was still current; pass a larger `keep` for
    * longer-running readers, the same dial `retainVersions` gives
    * time travel. */
  def retire(fs: FileSystem, base: String, keep: Int,
             legacyDirs: Seq[String]): Seq[Long] = {
    require(keep >= 1, s"GenPointer.retire: keep must be >= 1, got $keep")
    val flipped = markers(fs, base)
    // gen 0 exists iff any legacy table dir does
    val zero = legacyDirs.exists(d => fs.exists(new Path(s"$base/$d")))
    val all = (if (zero) Seq(0L) else Nil) ++ flipped
    // report only generations whose DATA was actually present — a
    // marker outlives its deleted dir (audit trail), so a second
    // retire must be an idempotent no-op, not a re-report
    val drop = all.dropRight(keep).filter { g =>
      if (g == 0L) zero else fs.exists(new Path(root(base, g)))
    }
    drop.foreach { g =>
      if (g == 0L) legacyDirs.foreach { d =>
        val p = new Path(s"$base/$d")
        if (fs.exists(p)) fs.delete(p, true)
      }
      else fs.delete(new Path(root(base, g)), true)
    }
    drop
  }

  /** What a [[vacuum]] removed: flipped generations retired past the
    * `keep` horizon, and un-flipped orphan builds deleted. */
  final case class VacuumResult(retired: Seq[Long], orphansDeleted: Seq[Long])

  /** Touch `gen-N/_heartbeat` — the liveness signal [[vacuum]]'s
    * orphan horizon reads as a FILE mtime. Directory mtimes are a
    * posix/HDFS notion: object stores (S3A and friends) synthesize
    * them and need not bump a parent when a file lands inside, so a
    * slow in-flight build whose only visible activity was directory
    * churn could look idle to [[newestMs]] and be vacuumed before its
    * flip. A build calls this at start (the store `retrainCommit`s
    * do) and may call it again between long phases; after the first
    * manifest commit the manifest files themselves (`<table>/manifest/
    * m*`, within the walk depth) carry file-mtime liveness. Overwrite,
    * not append — one tiny file per build, object-store friendly. */
  def heartbeat(fs: FileSystem, base: String, gen: Long): Unit = {
    val p = new Path(s"${root(base, gen)}/_heartbeat")
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** The newest modification time under `dir`, walked to a bounded
    * depth — enough to see a live build's activity as FILE mtimes:
    * the [[heartbeat]] file at the root, and manifest commits at
    * `<table>/manifest/m*` (3 levels) once the build starts landing
    * tables. Directory mtimes are consulted too but are a bonus, not
    * the contract — object stores synthesize them (see [[heartbeat]]).
    * Bounded: an index store is a handful of dirs, never the 100 TB
    * corpus. A path that VANISHES mid-walk (a rival build's task
    * commit renaming files out of `_temporary`) is itself proof of
    * live activity — it reports `now`, so the horizon protects the
    * build instead of the janitor crashing on the very dir it was
    * designed to spare. */
  private def newestMs(fs: FileSystem, dir: Path, depth: Int): Long =
    try {
      val self = fs.getFileStatus(dir).getModificationTime
      if (depth <= 0) self
      else (self +: fs.listStatus(dir).toSeq.map { st =>
        if (st.isDirectory) newestMs(fs, st.getPath, depth - 1)
        else st.getModificationTime
      }).max
    } catch {
      case _: java.io.FileNotFoundException => System.currentTimeMillis()
    }

  /** GC for the blue/green layout — [[retire]] plus the ORPHAN sweep
    * retire cannot do. Two orphan classes, adjudicated differently:
    *
    *   - An un-flipped gen dir BELOW (or at) the current pointer is
    *     DEAD WITH CERTAINTY: [[flip]] refuses non-forward flips, so
    *     no future commit can ever make it live — it is either a
    *     crashed build that a later retrain numbered past, or a
    *     racing build that already lost its CAS. Deleted
    *     unconditionally (a loser still writing just fails its own
    *     build job sooner; no reader ever resolved it).
    *   - An un-flipped dir ABOVE the current pointer may be a RIVAL
    *     BUILD IN FLIGHT that is about to win its flip — deleting it
    *     mid-write would fail a healthy retrain. It is deleted only
    *     when its newest modification time (bounded-depth walk) is
    *     older than `orphanHorizonMs` — no healthy build goes that
    *     long without landing a file. The default horizon (24 h)
    *     dwarfs any real training run; pass `Long.MaxValue` to
    *     protect in-flight builds unconditionally.
    *
    * Without this sweep, every crashed or CAS-losing retrain leaves
    * its full index footprint on disk forever — the one unbounded
    * growth path the flip protocol itself cannot close (the crashed
    * process is gone; only a later janitor can know it never won). */
  def vacuum(fs: FileSystem, base: String, keep: Int,
             legacyDirs: Seq[String],
             orphanHorizonMs: Long = 24L * 3600 * 1000): VacuumResult = {
    val retired = retire(fs, base, keep, legacyDirs)
    val cur = current(fs, base)
    val flipped = markers(fs, base).toSet
    val now = System.currentTimeMillis()
    val orphans =
      if (!fs.exists(new Path(base))) Nil
      else fs.listStatus(new Path(base)).toSeq
        .filter(st => st.isDirectory && {
          val n = st.getPath.getName
          n.length == 10 && n.startsWith("gen-") && n.drop(4).forall(_.isDigit)
        })
        .map(st => (st.getPath.getName.drop(4).toLong, st.getPath))
        .filterNot { case (g, _) => flipped(g) } // un-flipped only
        .filter { case (g, p) =>
          g <= cur || now - newestMs(fs, p, depth = 3) >= orphanHorizonMs
        }
    orphans.foreach { case (_, p) => fs.delete(p, true) }
    VacuumResult(retired, orphans.map(_._1).sorted)
  }
}
