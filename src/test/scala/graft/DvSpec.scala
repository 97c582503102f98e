package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ManifestTable

/** Merge-on-read deletion vectors (ManifestTable.deleteWhereMoR /
  * deleteByKeysMoR): the zero-rewrite delete path and every surface it
  * must stay consistent with — reads, time travel, fastCount, CDC,
  * compaction folding, upsert folding, fsck, deepClone, vacuum.
  */
class DvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dv_$tag").toString + "/t"

  /** 40 rows over 4 partitions p0..p3, key = id. */
  private def seed(path: String, statsful: Boolean = true): Unit = {
    val df = (0 until 40).map(i => (i.toLong, s"p${i % 4}", i * 10.0))
      .toDF("id", "part", "v")
    ManifestTable.merge(spark, path, df, keys = Seq("id"), partitionCol = "part",
      statsColumns = if (statsful) Seq("id") else Nil,
      bloomColumns = if (statsful) Seq("id") else Nil)
  }

  /** Relative data-dir set the latest manifest references. */
  private def liveDirs(path: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = ManifestTable.versions(fs, path).last
    scala.io.Source.fromFile(f"$path/_manifests/m$v%012d").getLines()
      .filterNot(_.startsWith("__")).map(_.split('\t')(1)).toSet
  }

  test("deleteWhereMoR deletes without rewriting any data dir") {
    val path = freshPath("basic")
    seed(path)
    val before = liveDirs(path)
    val r = ManifestTable.deleteWhereMoR(spark, path, "part", col("id") % 7 === 0)
    assert(r.committed && r.dirsRewritten == 0L)
    assert(r.rowsDeleted == (0 until 40).count(_ % 7 == 0))
    assert(liveDirs(path) == before, "a MoR delete must not touch data dirs")
    val got = ManifestTable.read(spark, path).select("id").as[Long].collect().toSet
    assert(got == (0 until 40).map(_.toLong).filterNot(_ % 7 == 0).toSet)
    // time travel still sees the pre-delete rows
    assert(ManifestTable.readVersion(spark, path, 1L).count() == 40L)
    // dvStats sees the pending vectors
    val (entries, rows) = ManifestTable.dvStats(spark, path)
    assert(entries > 0 && rows == r.rowsDeleted)
  }

  test("NULL-predicate rows are kept (SQL DELETE semantics)") {
    val path = freshPath("nullpred")
    val df = Seq((1L, "p0", Some(5.0)), (2L, "p0", None), (3L, "p0", Some(50.0)))
      .toDF("id", "part", "v")
    ManifestTable.merge(spark, path, df, keys = Seq("id"), partitionCol = "part")
    val r = ManifestTable.deleteWhereMoR(spark, path, "part", col("v") > 10.0)
    assert(r.rowsDeleted == 1L)
    assert(ManifestTable.read(spark, path).select("id").as[Long].collect().toSet
      == Set(1L, 2L))
  }

  test("second MoR delete merges into one DV; re-run is a no-op") {
    val path = freshPath("merge2")
    seed(path)
    val r1 = ManifestTable.deleteWhereMoR(spark, path, "part", col("id") < 8,
      retainVersions = 4)
    val r2 = ManifestTable.deleteWhereMoR(spark, path, "part",
      col("id") >= 8 && col("id") < 12, retainVersions = 4)
    assert(r1.rowsDeleted == 8L && r2.rowsDeleted == 4L)
    // re-running the first delete matches nothing (rows already gone)
    val r3 = ManifestTable.deleteWhereMoR(spark, path, "part", col("id") < 8,
      retainVersions = 4)
    assert(r3.rowsDeleted == 0L && !r3.committed)
    assert(ManifestTable.read(spark, path).count() == 28L)
    val (_, rows) = ManifestTable.dvStats(spark, path)
    assert(rows == 12L)
  }

  test("fastCount stays metadata-only and subtracts the DV") {
    val path = freshPath("fastcount")
    seed(path)
    ManifestTable.deleteWhereMoR(spark, path, "part", col("id") % 5 === 0)
    val c = ManifestTable.fastCount(spark, path)
    assert(c.metadataOnly, "rowcount - dv should answer without a scan")
    assert(c.rows == 40L - 8L)
  }

  test("deleteByKeysMoR prunes via blooms and deletes only the subjects") {
    val path = freshPath("bykeys")
    seed(path)
    val r = ManifestTable.deleteByKeysMoR(spark, path, "part", "id",
      Seq("3", "17", "999"))
    assert(r.op.rowsDeleted == 2L && r.op.dirsRewritten == 0L)
    assert(r.dirsProbed <= r.dirsTotal)
    val got = ManifestTable.read(spark, path).select("id").as[Long].collect().toSet
    assert(!got.contains(3L) && !got.contains(17L) && got.size == 38)
  }

  test("change feed shows DV deletes; compaction folds with a clean feed") {
    val path = freshPath("cdc")
    seed(path)
    ManifestTable.deleteWhereMoR(spark, path, "part", col("id") % 10 === 0,
      retainVersions = 4)
    val cdc = ManifestTable.changes(spark, path, Seq("id"), 1L, 2L)
    val dels = cdc.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet
    assert(dels == Set(0L, 10L, 20L, 30L))
    assert(cdc.count() == 4L, "a pure delete emits only delete rows")
    // compaction folds the DVs into rewritten files…
    val cr = ManifestTable.compact(spark, path, "part", targetBytes = 1L << 30,
      minDirs = 2, retainVersions = 4)
    assert(cr.committed)
    assert(ManifestTable.dvStats(spark, path) == ((0L, 0L)))
    assert(ManifestTable.read(spark, path).count() == 36L)
    // …and the fold itself is a no-op in the change feed
    assert(ManifestTable.changes(spark, path, Seq("id"), 2L, 3L).count() == 0L)
  }

  test("an upsert on a DV'd partition folds the DV for that partition") {
    val path = freshPath("upsert")
    seed(path)
    ManifestTable.deleteWhereMoR(spark, path, "part", col("id") === 4L) // p0
    val up = Seq((8L, "p0", 999.0)).toDF("id", "part", "v") // p0 rewrite
    ManifestTable.merge(spark, path, up, keys = Seq("id"), partitionCol = "part")
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 4L).count() == 0L, "fold must not resurrect")
    assert(got.filter(col("id") === 8L).select("v").as[Double].head() == 999.0)
    assert(ManifestTable.dvStats(spark, path) == ((0L, 0L)),
      "p0's rewrite folds its DV; no other partition had one")
  }

  test("fsck is clean after a DV commit; deepClone carries the DV") {
    val path = freshPath("fsck")
    seed(path)
    ManifestTable.deleteWhereMoR(spark, path, "part", col("id") % 3 === 0)
    assert(ManifestTable.fsck(spark, path).count() == 0L)
    val dst = freshPath("clone")
    ManifestTable.deepClone(spark, path, dst)
    assert(ManifestTable.read(spark, dst).count() ==
      ManifestTable.read(spark, path).count())
    assert(ManifestTable.fsck(spark, dst).count() == 0L)
    // incremental-view change detection sees the DV as a change
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids1 = ManifestTable.versions(fs, path)
    assert(ids1.size >= 2)
  }

  // ----- merge-on-read UPDATEs (updateWhereMoR: DV + __aux appendix) -----

  test("updateWhereMoR updates without rewriting any primary data dir") {
    val path = freshPath("upd")
    seed(path)
    val before = ManifestTable.dataDirs(spark, path, 1L)
    val r = ManifestTable.updateWhereMoR(spark, path, "part",
      col("id") % 7 === 0, Map("v" -> (col("v") + 0.5)))
    assert(r.committed && r.dirsRewritten == 0L)
    assert(r.rowsUpdated == (0 until 40).count(_ % 7 == 0))
    assert(ManifestTable.dataDirs(spark, path, 2L) == before,
      "a MoR update must not touch primary data dirs")
    val got = ManifestTable.read(spark, path).select("id", "v")
      .as[(Long, Double)].collect().toMap
    assert(got.size == 40, "an update changes values, never the row count")
    (0 until 40).foreach { i =>
      val want = if (i % 7 == 0) i * 10.0 + 0.5 else i * 10.0
      assert(got(i.toLong) == want, s"id=$i")
    }
    // time travel still sees the pre-update values
    assert(ManifestTable.readVersion(spark, path, 1L)
      .filter(col("id") === 0L).select("v").as[Double].head() == 0.0)
    // appendix + DV metadata sized exactly to the matched rows
    val (auxEntries, auxRows) = ManifestTable.auxStats(spark, path)
    assert(auxRows == r.rowsUpdated && auxEntries > 0)
    assert(ManifestTable.dvStats(spark, path)._2 == r.rowsUpdated)
    // fastCount: DV out, aux in — metadata-only and UNCHANGED
    val c = ManifestTable.fastCount(spark, path)
    assert(c.metadataOnly && c.rows == 40L)
  }

  test("updateWhereMoR assignment RHS sees the PRE-update row (swap)") {
    val path = freshPath("updswap")
    val df = Seq((1L, "p0", 10.0, 20.0), (2L, "p0", 30.0, 40.0))
      .toDF("id", "part", "a", "b")
    ManifestTable.merge(spark, path, df, keys = Seq("id"), partitionCol = "part")
    ManifestTable.updateWhereMoR(spark, path, "part", col("id") === 1L,
      Map("a" -> col("b"), "b" -> col("a")))
    val got = ManifestTable.read(spark, path).orderBy("id")
      .select("a", "b").as[(Double, Double)].collect().toSeq
    assert(got == Seq((20.0, 10.0), (30.0, 40.0)))
  }

  test("updateWhereMoR: NULL-predicate rows are unchanged; no match = no commit") {
    val path = freshPath("updnull")
    val df = Seq((1L, "p0", Some(5.0)), (2L, "p0", None), (3L, "p0", Some(50.0)))
      .toDF("id", "part", "v")
    ManifestTable.merge(spark, path, df, keys = Seq("id"), partitionCol = "part")
    val r = ManifestTable.updateWhereMoR(spark, path, "part", col("v") > 10.0,
      Map("v" -> lit(0.0)))
    assert(r.rowsUpdated == 1L)
    assert(ManifestTable.read(spark, path).filter(col("id") === 2L)
      .select("v").as[Option[Double]].head().isEmpty)
    val r2 = ManifestTable.updateWhereMoR(spark, path, "part", col("v") > 1e9,
      Map("v" -> lit(0.0)))
    assert(!r2.committed && r2.rowsUpdated == 0L)
  }

  test("second MoR update composes: DV may address appendix rows") {
    val path = freshPath("upd2")
    seed(path)
    ManifestTable.updateWhereMoR(spark, path, "part", col("id") === 4L,
      Map("v" -> lit(100.0)), retainVersions = 4)
    // matches the row the FIRST update wrote into its appendix
    ManifestTable.updateWhereMoR(spark, path, "part", col("v") === 100.0,
      Map("v" -> lit(200.0)), retainVersions = 4)
    val got = ManifestTable.read(spark, path)
    assert(got.count() == 40L)
    assert(got.filter(col("id") === 4L).select("v").as[Double].head() == 200.0)
    assert(got.filter(col("v") === 100.0).count() == 0L,
      "the first appendix's row must be DV'd away, not duplicated")
  }

  test("an __aux entry is exempt from zone-map and bloom pruning until folded") {
    val path = freshPath("updprune")
    seed(path) // stats + blooms on id, recorded pre-update
    // push a key OUTSIDE the committed bloom/zone bounds
    val r = ManifestTable.updateWhereMoR(spark, path, "part", col("id") === 5L,
      Map("id" -> lit(1005L)))
    assert(r.committed && r.rowsUpdated == 1L)
    // bloom probe for the NEW key: recorded blooms say absent, but the
    // aux'd entry must survive pruning and surface the row
    val eq = ManifestTable.readSkippingEquals(spark, path, "id", "1005")
    assert(eq.df.filter(col("id") === 1005L).count() == 1L)
    // zone-map range probe above every recorded max
    val rng = ManifestTable.readSkipping(spark, path, "id",
      BigDecimal(1000), BigDecimal(2000))
    assert(rng.df.filter(col("id") === 1005L).count() == 1L)
    // and deleteByKeysMoR still finds the moved subject
    val del = ManifestTable.deleteByKeysMoR(spark, path, "part", "id", Seq("1005"))
    assert(del.op.rowsDeleted == 1L)
  }

  test("update change feed is update_pre/post; compaction folds aux cleanly") {
    val path = freshPath("updcdc")
    seed(path)
    ManifestTable.updateWhereMoR(spark, path, "part", col("id") % 10 === 0,
      Map("v" -> (col("v") + 1.0)), retainVersions = 4)
    val cdc = ManifestTable.changes(spark, path, Seq("id"), 1L, 2L)
    val byType = cdc.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("update_preimage" -> 4L, "update_postimage" -> 4L),
      s"got $byType")
    val cr = ManifestTable.compact(spark, path, "part", targetBytes = 1L << 30,
      minDirs = 2, retainVersions = 4)
    assert(cr.committed)
    assert(ManifestTable.auxStats(spark, path) == ((0L, 0L)))
    assert(ManifestTable.dvStats(spark, path) == ((0L, 0L)))
    // the fold is logically invisible and content survives it
    assert(ManifestTable.changes(spark, path, Seq("id"), 2L, 3L).count() == 0L)
    assert(ManifestTable.read(spark, path)
      .filter(col("id") === 10L).select("v").as[Double].head() == 101.0)
    assert(ManifestTable.read(spark, path).count() == 40L)
  }

  test("a merge on an aux'd partition folds the appendix for that partition") {
    val path = freshPath("updfold")
    seed(path)
    ManifestTable.updateWhereMoR(spark, path, "part", col("id") === 4L, // p0
      Map("v" -> lit(777.0)))
    val up = Seq((8L, "p0", 999.0)).toDF("id", "part", "v") // p0 rewrite
    ManifestTable.merge(spark, path, up, keys = Seq("id"), partitionCol = "part")
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 4L).select("v").as[Double].head() == 777.0,
      "the fold must keep the updated value")
    assert(got.filter(col("id") === 8L).select("v").as[Double].head() == 999.0)
    assert(got.count() == 40L)
    assert(ManifestTable.auxStats(spark, path) == ((0L, 0L)),
      "p0's rewrite folds its appendix; no other partition had one")
  }

  test("fsck is clean after an update commit; deepClone carries the appendix") {
    val path = freshPath("updfsck")
    seed(path)
    ManifestTable.updateWhereMoR(spark, path, "part", col("id") % 3 === 0,
      Map("v" -> (col("v") * 2)))
    assert(ManifestTable.fsck(spark, path).count() == 0L)
    val dst = freshPath("updclone")
    ManifestTable.deepClone(spark, path, dst)
    assert(ManifestTable.fsck(spark, dst).count() == 0L)
    assert(ManifestTable.read(spark, dst).filter(col("id") === 3L)
      .select("v").as[Double].head() == 60.0)
    assert(ManifestTable.read(spark, dst).count() == 40L)
  }

  test("updateByKeysMoR prunes via blooms and rectifies only the subjects") {
    val path = freshPath("updbykeys")
    seed(path)
    val r = ManifestTable.updateByKeysMoR(spark, path, "part", "id",
      Seq("3", "17", "999"), Map("v" -> lit(-1.0)))
    assert(r.op.rowsUpdated == 2L && r.op.dirsRewritten == 0L)
    assert(r.dirsProbed <= r.dirsTotal)
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("v") === -1.0).select("id").as[Long].collect().toSet
      == Set(3L, 17L))
    assert(got.count() == 40L)
  }

  test("foldMoR rewrites only debt-carrying partitions; maybeFoldMoR is O(1) when healthy") {
    val path = freshPath("fold")
    seed(path)
    // p0 takes an update appendix, p1 a DV; p2/p3 stay debt-free
    ManifestTable.updateWhereMoR(spark, path, "part", col("id") === 4L, // p0
      Map("v" -> lit(777.0)), retainVersions = 6)
    ManifestTable.deleteWhereMoR(spark, path, "part", col("id") === 5L, // p1
      retainVersions = 6)
    // healthy threshold: 2 pending <= 2 -> no commit, metadata only
    assert(ManifestTable.maybeFoldMoR(spark, path, "part", maxPending = 2).isEmpty)
    val before = ManifestTable.entryDirs(spark, path, 3L)
    val r = ManifestTable.maybeFoldMoR(spark, path, "part", maxPending = 1,
      retainVersions = 6, statsColumns = Seq("id"), bloomColumns = Seq("id"))
    assert(r.contains(2L))
    val after = ManifestTable.entryDirs(spark, path, 4L)
    assert(after("p2") == before("p2") && after("p3") == before("p3"),
      "debt-free partitions must carry their dirs verbatim through the fold")
    assert(after("p0") != before("p0") && after("p1") != before("p1"))
    assert(ManifestTable.dvStats(spark, path) == ((0L, 0L)))
    assert(ManifestTable.auxStats(spark, path) == ((0L, 0L)))
    val got = ManifestTable.read(spark, path)
    assert(got.count() == 39L)
    assert(got.filter(col("id") === 4L).select("v").as[Double].head() == 777.0)
    assert(got.filter(col("id") === 5L).count() == 0L)
    // the fold restored prunability and re-recorded skipping metadata
    assert(ManifestTable.fastCount(spark, path).metadataOnly)
    assert(ManifestTable.fsck(spark, path).count() == 0L)
  }

  test("purgeDeletes physically removes DV'd bytes: rewritten dirs, expired " +
    "versions, dropped all-deleted entries, shared dirs rewritten whole") {
    val path = freshPath("purge")
    seed(path) // 40 rows, parts p0..p3, stats+bloom on id
    /** EVERY id physically present under data/, manifest-blind — the
      * bytes-on-disk view a DV can only mask, never remove. */
    def physicalIds(): Set[Long] = spark.read
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet") // skip the .dv sidecars
      .parquet(s"$path/data")
      .select("id").as[Long].collect().toSet
    // DV-delete ids 0 (p0) and 5 (p1); p2/p3 untouched
    val del = ManifestTable.deleteByKeysMoR(spark, path, "part",
      "id", Seq("0", "5"))
    assert(del.op.rowsDeleted == 2L && del.op.dirsRewritten == 0L)
    assert(physicalIds().contains(0L) && physicalIds().contains(5L),
      "a MoR delete leaves the bytes on disk — that is the caveat purge exists for")
    val logicalBefore = ManifestTable.read(spark, path)
      .select("id").as[Long].collect().toSet
    val p2dirBefore = ManifestTable.entryDirs(spark, path,
      ManifestTable.versions(new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration), path).last)("p2")
    val r = ManifestTable.purgeDeletes(spark, path,
      statsColumns = Seq("id"), bloomColumns = Seq("id"))
    assert(r.committed && r.dirsPurged == 2L &&
      r.entriesRewritten == 2L && r.entriesDropped == 0L, r.toString)
    // logical content unchanged; physical bytes GONE (prior versions
    // expired to 1, so the pre-purge dirs and sidecars are deleted)
    assert(ManifestTable.read(spark, path)
      .select("id").as[Long].collect().toSet == logicalBefore)
    val phys = physicalIds()
    assert(!phys.contains(0L) && !phys.contains(5L),
      s"purged ids must be physically absent from every surviving file")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ManifestTable.versions(fs, path).size == 1,
      "physical erasure expires prior versions (no time travel to the bytes)")
    val p2dirAfter = ManifestTable.entryDirs(spark, path,
      ManifestTable.versions(fs, path).last)("p2")
    assert(p2dirAfter == p2dirBefore, "an un-DV'd dir must not rewrite")
    // idempotent + no-op on a DV-free table: no version burned
    assert(!ManifestTable.purgeDeletes(spark, path).committed)
    // re-recorded skipping metadata still prunes + erase path works again
    assert(ManifestTable.fastCount(spark, path).metadataOnly)
    assert(ManifestTable.fsck(spark, path).count() == 0L)
    // an ALL-rows-deleted partition drops its entry on purge
    val ids2 = (0 until 40).filter(_ % 4 == 2).map(_.toString) // all of p2
    ManifestTable.deleteByKeysMoR(spark, path, "part", "id", ids2)
    val r2 = ManifestTable.purgeDeletes(spark, path,
      statsColumns = Seq("id"), bloomColumns = Seq("id"))
    assert(r2.committed && r2.entriesDropped == 1L, r2.toString)
    assert(ManifestTable.read(spark, path)
      .filter(col("part") === "p2").count() == 0L)
    assert(!physicalIds().exists(_ % 4 == 2), "dropped partition's bytes gone")
    // SHARED (compacted) dir: a DV on ONE co-tenant purges the dir
    // WHOLE — the other tenant's entry re-points, bytes still exact
    val cr = ManifestTable.compact(spark, path, "part", minDirs = 2)
    assert(cr.committed, "p0/p1/p3 should pack into one shared dir")
    ManifestTable.deleteByKeysMoR(spark, path, "part", "id", Seq("8")) // p0
    assert(physicalIds().contains(8L))
    val r3 = ManifestTable.purgeDeletes(spark, path,
      statsColumns = Seq("id"), bloomColumns = Seq("id"))
    assert(r3.committed && r3.entriesRewritten == 3L, r3.toString)
    assert(!physicalIds().contains(8L),
      "a shared dir rewrites whole — the co-tenant must not pin the purged bytes")
    assert(ManifestTable.read(spark, path).count() == 40L - 2 - 10 - 1)
    assert(ManifestTable.fsck(spark, path).count() == 0L)
  }

  test("MoR update and delete compose on a COMPACTED (shared-dir) layout") {
    val path = freshPath("updshared")
    seed(path)
    // pack all four partitions into one shared dir first
    val cr = ManifestTable.compact(spark, path, "part", targetBytes = 1L << 30,
      minDirs = 2, retainVersions = 6)
    assert(cr.committed)
    val r = ManifestTable.updateWhereMoR(spark, path, "part",
      col("id") % 10 === 4, Map("v" -> lit(555.0)), retainVersions = 6)
    assert(r.committed && r.dirsRewritten == 0L && r.rowsUpdated == 4L)
    val d = ManifestTable.deleteWhereMoR(spark, path, "part", col("id") === 9L,
      retainVersions = 6)
    assert(d.rowsDeleted == 1L)
    val got = ManifestTable.read(spark, path)
    assert(got.count() == 39L)
    assert(got.filter(col("v") === 555.0).select("id").as[Long].collect().toSet
      == Set(4L, 14L, 24L, 34L))
    assert(got.filter(col("id") === 9L).count() == 0L)
    // and the fold cleans it back to plain files
    assert(ManifestTable.foldMoR(spark, path, "part", retainVersions = 6) > 0L)
    assert(ManifestTable.dvStats(spark, path) == ((0L, 0L)))
    assert(ManifestTable.auxStats(spark, path) == ((0L, 0L)))
    assert(ManifestTable.read(spark, path).count() == 39L)
    assert(ManifestTable.fsck(spark, path).count() == 0L)
  }

  test("IncrementalAgg sees MoR deletes and updates as changes and refreshes exactly") {
    import graft.ops.IncrementalAgg
    val base = java.nio.file.Files.createTempDirectory("graft_dv_iagg").toString
    val (bPath, aPath) = (s"$base/b", s"$base/agg")
    def agg() = IncrementalAgg.read(spark, aPath).orderBy("g")
      .select("g", "n", "sum_v").as[(String, Long, Long)].collect().toSeq
    ManifestTable.merge(spark, bPath,
      Seq((1L, "p0", "a", 10L), (2L, "p0", "b", 5L), (3L, "p1", "a", 7L),
        (4L, "p1", "b", 2L)).toDF("id", "part", "g", "v"),
      Seq("id"), "part", retainVersions = 6)
    IncrementalAgg.refresh(spark, bPath, aPath, Seq("g"), Seq("v"))
    assert(agg() == Seq(("a", 2L, 17L), ("b", 2L, 7L)))
    // a MoR delete changes NO dir — the DV-qualified identity must
    // still register p0 as changed, or the view silently keeps id 2
    ManifestTable.deleteWhereMoR(spark, bPath, "part", col("id") === 2L,
      retainVersions = 6)
    IncrementalAgg.refresh(spark, bPath, aPath, Seq("g"), Seq("v"))
    assert(agg() == Seq(("a", 2L, 17L), ("b", 1L, 2L)),
      "the view must equal a full recompute after a merge-on-read delete")
    // a MoR update likewise: aux identity registers p1 as changed
    ManifestTable.updateWhereMoR(spark, bPath, "part", col("id") === 3L,
      Map("v" -> lit(100L)), retainVersions = 6)
    IncrementalAgg.refresh(spark, bPath, aPath, Seq("g"), Seq("v"))
    assert(agg() == Seq(("a", 2L, 110L), ("b", 1L, 2L)),
      "the view must equal a full recompute after a merge-on-read update")
  }

  test("updateWhereMoR refuses partition-column assignment and unknown columns") {
    val path = freshPath("updguard")
    seed(path)
    val e1 = intercept[IllegalArgumentException](
      ManifestTable.updateWhereMoR(spark, path, "part", lit(true),
        Map("part" -> lit("p9"))))
    assert(e1.getMessage.contains("partition column"))
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.updateWhereMoR(spark, path, "part", lit(true),
        Map("nope" -> lit(1))))
    assert(e2.getMessage.contains("not in the table"))
  }
}
