package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ManifestTable

/** Metadata-only column rename (ManifestTable.renameColumn): the
  * Iceberg-style name mapping — files keep their creation-time
  * (physical) names forever, the manifest maps current → physical,
  * and every read/write surface stays consistent across the rename.
  */
class RenameSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ren_$tag").toString + "/t"

  private def seed(path: String): Unit = {
    val df = (0 until 40).map(i => (i.toLong, s"p${i % 4}", i * 10.0))
      .toDF("id", "part", "v")
    ManifestTable.merge(spark, path, df, keys = Seq("id"), partitionCol = "part",
      statsColumns = Seq("id", "v"), bloomColumns = Seq("id"), retainVersions = 4)
  }

  test("rename is metadata-only: same dirs, new name reads, old version keeps old name") {
    val path = freshPath("basic")
    seed(path)
    val before = ManifestTable.dataDirs(spark, path, 1L)
    ManifestTable.renameColumn(spark, path, "v", "amount", retainVersions = 4)
    assert(ManifestTable.dataDirs(spark, path, 2L) == before,
      "a rename must not touch one data file")
    val got = ManifestTable.read(spark, path)
    assert(got.columns.toSeq == Seq("id", "part", "amount"))
    assert(got.filter(col("id") === 7L).select("amount").as[Double].head() == 70.0)
    // time travel: the pre-rename snapshot still reads under the old name
    val old = ManifestTable.readVersion(spark, path, 1L)
    assert(old.columns.toSeq == Seq("id", "part", "v"))
    assert(old.count() == 40L)
    // fastCount untouched (rowcounts carried verbatim)
    val c = ManifestTable.fastCount(spark, path)
    assert(c.metadataOnly && c.rows == 40L)
    // the rename commit is an EMPTY change-feed step
    assert(ManifestTable.changes(spark, path, Seq("id"), 1L, 2L).count() == 0L)
  }

  test("post-rename merges land under the mapping; skipping keeps pruning") {
    val path = freshPath("merge")
    seed(path)
    ManifestTable.renameColumn(spark, path, "v", "amount", retainVersions = 4)
    // new batch arrives under the CURRENT name
    ManifestTable.merge(spark, path,
      Seq((100L, "p0", 5000.0), (101L, "p1", 6000.0)).toDF("id", "part", "amount"),
      keys = Seq("id"), partitionCol = "part",
      statsColumns = Seq("id", "amount"), bloomColumns = Seq("id"), retainVersions = 4)
    val got = ManifestTable.read(spark, path)
    assert(got.count() == 42L)
    assert(got.filter(col("id") === 100L).select("amount").as[Double].head() == 5000.0)
    assert(got.filter(col("id") === 7L).select("amount").as[Double].head() == 70.0)
    // zone-map skipping on the RENAMED column prunes: old dirs' items
    // were re-keyed at rename, the new dir's were committed re-keyed
    val r = ManifestTable.readSkipping(spark, path, "amount",
      BigDecimal(4999), BigDecimal(7000))
    assert(r.dirsScanned < r.dirsTotal, s"expected pruning, scanned ${r.dirsScanned}/${r.dirsTotal}")
    assert(r.df.filter(col("amount") >= 4999).count() == 2L)
    // bloom probe on id still prunes too
    val eq = ManifestTable.readSkippingEquals(spark, path, "id", "100")
    assert(eq.df.filter(col("id") === 100L).count() == 1L)
  }

  test("chained renames compose; renaming back drops the mapping") {
    val path = freshPath("chain")
    seed(path)
    ManifestTable.renameColumn(spark, path, "v", "v2", retainVersions = 6)
    ManifestTable.renameColumn(spark, path, "v2", "v3", retainVersions = 6)
    assert(ManifestTable.readProps(spark, path)(ManifestTable.RenameMapProp) == "v3=v")
    assert(ManifestTable.read(spark, path).select(sum("v3")).as[Double].head()
      == (0 until 40).map(_ * 10.0).sum)
    ManifestTable.renameColumn(spark, path, "v3", "v", retainVersions = 6)
    assert(!ManifestTable.readProps(spark, path).contains(ManifestTable.RenameMapProp))
    assert(ManifestTable.read(spark, path).columns.toSeq == Seq("id", "part", "v"))
  }

  test("rename guards: partition column, existing names, physical collisions") {
    val path = freshPath("guards")
    seed(path)
    val e1 = intercept[IllegalArgumentException](
      ManifestTable.renameColumn(spark, path, "part", "part2"))
    assert(e1.getMessage.contains("partition column"))
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.renameColumn(spark, path, "v", "id"))
    assert(e2.getMessage.contains("already exists"))
    ManifestTable.renameColumn(spark, path, "v", "amount")
    // an additive column named like the physical file field of the
    // renamed column would make two current columns read one field
    val e3 = intercept[IllegalArgumentException](ManifestTable.merge(spark, path,
      Seq((1L, "p0", 1.0, 2.0)).toDF("id", "part", "amount", "v"),
      keys = Seq("id"), partitionCol = "part"))
    assert(e3.getMessage.contains("physical"))
  }

  test("MoR update and delete work across a rename; compact folds them") {
    val path = freshPath("mor")
    seed(path)
    ManifestTable.renameColumn(spark, path, "v", "amount", retainVersions = 4)
    val r = ManifestTable.updateWhereMoR(spark, path, "part",
      col("id") === 4L, Map("amount" -> lit(999.0)), retainVersions = 4)
    assert(r.committed && r.dirsRewritten == 0L)
    assert(ManifestTable.read(spark, path).filter(col("id") === 4L)
      .select("amount").as[Double].head() == 999.0)
    val d = ManifestTable.deleteWhereMoR(spark, path, "part", col("id") === 5L,
      retainVersions = 4)
    assert(d.rowsDeleted == 1L)
    val cr = ManifestTable.compact(spark, path, "part", targetBytes = 1L << 30,
      minDirs = 2, retainVersions = 4)
    assert(cr.committed)
    val folded = ManifestTable.read(spark, path)
    assert(folded.count() == 39L)
    assert(folded.filter(col("id") === 4L).select("amount").as[Double].head() == 999.0)
    assert(folded.columns.contains("amount"))
    assert(ManifestTable.fsck(spark, path).count() == 0L)
  }

  // ----- metadata-only type widening (widenColumn) -----

  test("widen int->long is metadata-only; out-of-int-range rows then merge in") {
    import org.apache.spark.sql.types._
    val path = freshPath("widen")
    val df = (0 until 20).map(i => (i.toLong, s"p${i % 2}", i * 100))
      .toDF("id", "part", "cents")
    ManifestTable.merge(spark, path, df, keys = Seq("id"), partitionCol = "part",
      statsColumns = Seq("cents"), bloomColumns = Seq("id"), retainVersions = 4)
    val before = ManifestTable.dataDirs(spark, path, 1L)
    ManifestTable.widenColumn(spark, path, "cents", LongType, retainVersions = 4)
    assert(ManifestTable.dataDirs(spark, path, 2L) == before,
      "a widening must not touch one data file")
    val got = ManifestTable.read(spark, path)
    assert(got.schema("cents").dataType == LongType)
    assert(got.select(sum("cents")).as[Long].head() == (0 until 20).map(_ * 100L).sum)
    // v1 still reads as int
    assert(ManifestTable.readVersion(spark, path, 1L).schema("cents").dataType
      == IntegerType)
    // widening is CDC-invisible
    assert(ManifestTable.changes(spark, path, Seq("id"), 1L, 2L).count() == 0L)
    // a batch with values no int can hold merges and reads back mixed
    ManifestTable.merge(spark, path,
      Seq((100L, "p0", 10000000000L)).toDF("id", "part", "cents"),
      keys = Seq("id"), partitionCol = "part", statsColumns = Seq("cents"),
      retainVersions = 4)
    val all = ManifestTable.read(spark, path)
    assert(all.count() == 21L)
    assert(all.filter(col("id") === 100L).select("cents").as[Long].head()
      == 10000000000L)
    assert(all.filter(col("id") === 3L).select("cents").as[Long].head() == 300L)
    // zone maps carried through the widening still prune
    val skip = ManifestTable.readSkipping(spark, path, "cents",
      BigDecimal(-100), BigDecimal(-1))
    assert(skip.dirsScanned == 0L && skip.dirsTotal > 0L)
    // fastCount stays metadata-only
    assert(ManifestTable.fastCount(spark, path).metadataOnly)
  }

  test("widen float->double drops that column's blooms; others survive") {
    import org.apache.spark.sql.types._
    val path = freshPath("widenf")
    val df = Seq((1L, "p0", 0.1f), (2L, "p0", 2.5f)).toDF("id", "part", "score")
    ManifestTable.merge(spark, path, df, keys = Seq("id"), partitionCol = "part",
      bloomColumns = Seq("id", "score"))
    ManifestTable.widenColumn(spark, path, "score", DoubleType)
    val got = ManifestTable.read(spark, path)
    assert(got.schema("score").dataType == DoubleType)
    // the float 0.1f upcasts to its exact double image
    assert(got.filter(col("id") === 1L).select("score").as[Double].head()
      == 0.1f.toDouble)
    // a probe for the double rendering must not be false-negatived by
    // a stale float-keyed bloom — the widening dropped it (fail-safe)
    val eq = ManifestTable.readSkippingEquals(spark, path, "score",
      0.1f.toDouble.toString)
    assert(eq.df.filter(col("id") === 1L).count() == 1L)
    // the id bloom is untouched and still prunes probes
    val idEq = ManifestTable.readSkippingEquals(spark, path, "id", "1")
    assert(idEq.df.filter(col("id") === 1L).count() == 1L)
  }

  test("widening guards: unsupported narrowing, partition and bucket columns") {
    import org.apache.spark.sql.types._
    val path = freshPath("widenguard")
    seed(path)
    val e1 = intercept[IllegalArgumentException](
      ManifestTable.widenColumn(spark, path, "v", FloatType)) // double->float narrows
    assert(e1.getMessage.contains("not a supported widening"))
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.widenColumn(spark, path, "part", LongType))
    assert(e2.getMessage.contains("not a supported widening") ||
      e2.getMessage.contains("partition column"))
    val pb = freshPath("widenbkt")
    ManifestTable.mergeBucketed(spark, pb,
      Seq((1, "p0", "x")).toDF("k", "part", "s"),
      keys = Seq("s"), partitionCol = "part", bucketCol = "k", nBuckets = 2)
    val e3 = intercept[IllegalArgumentException](
      ManifestTable.widenColumn(spark, pb, "k", LongType))
    assert(e3.getMessage.contains("bucket column"))
  }

  test("CDC after a rename emits rows under the new name") {
    val path = freshPath("cdc")
    seed(path)
    ManifestTable.renameColumn(spark, path, "v", "amount", retainVersions = 6)
    ManifestTable.merge(spark, path,
      Seq((0L, "p0", 12345.0)).toDF("id", "part", "amount"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 6)
    val cdc = ManifestTable.changes(spark, path, Seq("id"), 2L, 3L)
    assert(cdc.columns.contains("amount"))
    val post = cdc.filter(col("_change_type") === "update_postimage")
      .select("amount").as[Double].collect().toSeq
    assert(post == Seq(12345.0))
  }

  test("drop is metadata-only: same dirs, column gone live, old version keeps it") {
    val path = freshPath("drop")
    seed(path)
    val before = ManifestTable.dataDirs(spark, path, 1L)
    ManifestTable.dropColumn(spark, path, "v", retainVersions = 4)
    assert(ManifestTable.dataDirs(spark, path, 2L) == before,
      "a drop must not touch one data file")
    val got = ManifestTable.read(spark, path)
    assert(got.columns.toSeq == Seq("id", "part"))
    assert(got.count() == 40L)
    // time travel: the pre-drop snapshot still carries the column
    val old = ManifestTable.readVersion(spark, path, 1L)
    assert(old.columns.toSeq == Seq("id", "part", "v"))
    assert(old.filter(col("id") === 7L).select("v").as[Double].head() == 70.0)
    // fastCount untouched; the drop commit is an empty CDC step; the
    // surviving column's zone/bloom items still prune
    val c = ManifestTable.fastCount(spark, path)
    assert(c.metadataOnly && c.rows == 40L)
    assert(ManifestTable.changes(spark, path, Seq("id"), 1L, 2L).count() == 0L)
    val probe = ManifestTable.readSkippingEquals(spark, path, "id", "9999")
    assert(probe.dirsScanned == 0L && probe.dirsTotal > 0L)
    // post-drop merges carry the narrowed schema
    ManifestTable.merge(spark, path, Seq((100L, "p0")).toDF("id", "part"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 4)
    assert(ManifestTable.read(spark, path).count() == 41L)
  }

  test("re-adding a dropped column is refused; a different name resolves old dirs as null") {
    val path = freshPath("readd")
    seed(path)
    ManifestTable.dropColumn(spark, path, "v", retainVersions = 4)
    val e = intercept[IllegalArgumentException](
      ManifestTable.merge(spark, path,
        Seq((200L, "p0", 1.5)).toDF("id", "part", "v"),
        keys = Seq("id"), partitionCol = "part", retainVersions = 4))
    assert(e.getMessage.contains("previously DROPPED"), e.getMessage)
    // same data under a NEW name: additive evolution, old dirs read null
    ManifestTable.merge(spark, path,
      Seq((200L, "p0", 1.5)).toDF("id", "part", "v2"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 4)
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 200L).select("v2").as[Double].head() == 1.5)
    assert(got.filter(col("id") === 7L).select("v2").collect().head.isNullAt(0),
      "old rows must resolve the re-added-under-new-name column as null, " +
        "never as the dead physical values")
  }

  test("tombstones are DURABLE: re-add stays refused after later unrelated merges " +
    "(props carry forward across commits)") {
    val path = freshPath("durabledrop")
    seed(path)
    ManifestTable.dropColumn(spark, path, "v", retainVersions = 4)
    // two unrelated plain merges after the drop — each commit must
    // carry the tombstone forward, or the third merge would silently
    // resurrect the dead physical values from retained dirs
    ManifestTable.merge(spark, path, Seq((500L, "p0")).toDF("id", "part"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 4)
    ManifestTable.merge(spark, path, Seq((501L, "p1", 7.0)).toDF("id", "part", "w"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 4)
    val e = intercept[IllegalArgumentException](
      ManifestTable.merge(spark, path,
        Seq((502L, "p0", 2.0, 1.5)).toDF("id", "part", "w", "v"),
        keys = Seq("id"), partitionCol = "part", retainVersions = 4))
    assert(e.getMessage.contains("previously DROPPED"),
      s"tombstone lost after intervening merges: ${e.getMessage}")
    // old rows still resolve the additive column w as null, not as v
    assert(ManifestTable.read(spark, path)
      .filter(col("id") === 7L).select("w").collect().head.isNullAt(0))
  }

  test("dropping a RENAMED column tombstones the physical field; guards hold") {
    val path = freshPath("renamedrop")
    seed(path)
    ManifestTable.renameColumn(spark, path, "v", "amount", retainVersions = 4)
    ManifestTable.dropColumn(spark, path, "amount", retainVersions = 4)
    // the PHYSICAL field is v: re-adding v is refused, re-adding the
    // freed CURRENT name amount is fine (no old file stores 'amount')
    val e = intercept[IllegalArgumentException](
      ManifestTable.merge(spark, path, Seq((300L, "p0", 9.9)).toDF("id", "part", "v"),
        keys = Seq("id"), partitionCol = "part", retainVersions = 4))
    assert(e.getMessage.contains("previously DROPPED"))
    ManifestTable.merge(spark, path,
      Seq((300L, "p0", 9.9)).toDF("id", "part", "amount"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 4)
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 300L).select("amount").as[Double].head() == 9.9)
    assert(got.filter(col("id") === 7L).select("amount").collect().head.isNullAt(0))
    // guards: partition column and last-column drops refuse
    assert(intercept[IllegalArgumentException](
      ManifestTable.dropColumn(spark, path, "part")).getMessage.contains("partition"))
    ManifestTable.dropColumn(spark, path, "amount", retainVersions = 4)
    assert(intercept[IllegalArgumentException](
      ManifestTable.dropColumn(spark, path, "part")).getMessage.contains("partition"))
  }
}
