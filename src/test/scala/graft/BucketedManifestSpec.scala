package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bucketed, ManifestTable}

/** Bucket-specced manifest tables (ManifestTable.mergeBucketed /
  * registerBucketed): the SMB layout committed as table properties,
  * catalog-registered reads, the shuffle-free fact⋈fact join evidence,
  * and the writer guards that keep the layout honest.
  */
class BucketedManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mbkt_$tag").toString + "/t"

  private def facts(n: Int, tag: String) =
    (0 until n).map(i => (i.toLong % 50, s"p${i % 3}", s"$tag$i", i * 1.0))
      .toDF("user_id", "part", "payload", "v")

  test("co-bucketed manifest tables join with zero exchange") {
    val pa = freshPath("a"); val pb = freshPath("b")
    ManifestTable.mergeBucketed(spark, pa, facts(300, "a"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 8)
    ManifestTable.mergeBucketed(spark, pb, facts(200, "b"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 8)
    val ta = ManifestTable.registerBucketed(spark, pa, "mbkt_spec_a")
    val tb = ManifestTable.registerBucketed(spark, pb, "mbkt_spec_b")
    val j = ta.select("user_id", "v").hint("merge")
      .join(tb.select(col("user_id"), col("v").as("v2")).hint("merge"),
        Seq("user_id"))
    assert(Bucketed.isShuffleFree(j),
      "a co-bucketed manifest join must plan without a shuffle exchange:\n" +
        j.queryExecution.executedPlan.toString.take(2000))
    // content parity vs the plain (shuffling) manifest reads
    val plain = ManifestTable.read(spark, pa).select("user_id", "v")
      .join(ManifestTable.read(spark, pb)
        .select(col("user_id"), col("v").as("v2")), Seq("user_id"))
    assert(j.count() == plain.count() && j.count() > 0)
    assert(j.agg(sum(col("v") * col("v2"))).as[Double].head() ==
      plain.agg(sum(col("v") * col("v2"))).as[Double].head())
  }

  test("a second bucketed batch keeps the layout and the shuffle-free join") {
    val pa = freshPath("inc"); val pb = freshPath("incb")
    ManifestTable.mergeBucketed(spark, pa, facts(100, "x"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 4)
    // second batch: upserts into touched partitions, rewritten bucketed
    ManifestTable.mergeBucketed(spark, pa, facts(60, "y"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 4)
    ManifestTable.mergeBucketed(spark, pb, facts(50, "z"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 4)
    val ta = ManifestTable.registerBucketed(spark, pa, "mbkt_spec_inc_a")
    val tb = ManifestTable.registerBucketed(spark, pb, "mbkt_spec_inc_b")
    assert(ta.count() == 160L, "both batches' rows visible through the catalog read")
    val j = ta.select("user_id").hint("merge")
      .join(tb.select("user_id").hint("merge"), Seq("user_id"))
    assert(Bucketed.isShuffleFree(j))
    // the normal manifest read surface is unaffected by the spec
    assert(ManifestTable.read(spark, pa).count() == 160L)
    assert(ManifestTable.fastCount(spark, pa).rows == 160L)
  }

  test("versioned registration pins a snapshot; manifest⋈catalog SMB is shuffle-free") {
    val pa = freshPath("ver")
    ManifestTable.mergeBucketed(spark, pa, facts(100, "v1_"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 4, retainVersions = 4)
    ManifestTable.mergeBucketed(spark, pa, facts(40, "v2_"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 4, retainVersions = 4)
    // time travel: the v1 registration sees only the first batch
    val t1 = ManifestTable.registerBucketed(spark, pa, "mbkt_spec_v1", Some(1L))
    assert(t1.count() == 100L)
    val tLatest = ManifestTable.registerBucketed(spark, pa, "mbkt_spec_vl")
    assert(tLatest.count() == 140L)
    // cross-form SMB: a bucketed MANIFEST table joins a bucketed
    // CATALOG table with the same spec, still with zero exchange
    Bucketed.writeBucketed(facts(60, "cat_").select("user_id", "v"),
      "mbkt_spec_cat", "user_id", buckets = 4)
    val j = tLatest.select("user_id").hint("merge")
      .join(spark.table("mbkt_spec_cat").select("user_id").hint("merge"),
        Seq("user_id"))
    assert(Bucketed.isShuffleFree(j),
      "manifest⋈catalog co-bucketed join must plan without a shuffle:\n" +
        j.queryExecution.executedPlan.toString.take(2000))
    val e = intercept[IllegalArgumentException](
      ManifestTable.registerBucketed(spark, pa, "mbkt_spec_bad", Some(99L)))
    assert(e.getMessage.contains("not retained"))
  }

  test("non-bucketed DML refuses on a bucketed table; spec is fixed") {
    val pa = freshPath("guard")
    ManifestTable.mergeBucketed(spark, pa, facts(50, "g"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 4)
    val e1 = intercept[RuntimeException](ManifestTable.merge(spark, pa,
      facts(10, "g2"), keys = Seq("payload"), partitionCol = "part"))
    assert(e1.getMessage.contains("bucketed"))
    // deleteWhereMoR is ALLOWED: a position-delete sidecar preserves
    // the bucket layout (see the MoR-on-bucketed test below)
    val e3 = intercept[RuntimeException](ManifestTable.updateWhereMoR(
      spark, pa, "part", col("user_id") === 1L, Map("v" -> lit(0.0))))
    assert(e3.getMessage.contains("bucketed"))
    val e4 = intercept[RuntimeException](ManifestTable.compact(
      spark, pa, "part", targetBytes = 1L << 30))
    assert(e4.getMessage.contains("bucketed"))
    val e5 = intercept[IllegalArgumentException](ManifestTable.mergeBucketed(
      spark, pa, facts(10, "g3"), keys = Seq("payload"), partitionCol = "part",
      bucketCol = "user_id", nBuckets = 8))
    assert(e5.getMessage.contains("fixed at creation"))
    // a plain table refuses registerBucketed
    val pp = freshPath("plain")
    ManifestTable.merge(spark, pp, facts(10, "p"), keys = Seq("payload"),
      partitionCol = "part")
    val e6 = intercept[RuntimeException](
      ManifestTable.registerBucketed(spark, pp, "mbkt_spec_plain"))
    assert(e6.getMessage.contains("no bucket spec"))
  }

  test("MoR deletes on a bucketed table: zero rewrites, DV-aware registered " +
    "read stays shuffle-free, foldMoR re-lands through the bucketed writer") {
    val pa = freshPath("mor"); val pb = freshPath("morb")
    ManifestTable.mergeBucketed(spark, pa, facts(300, "a"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 8, retainVersions = 4)
    ManifestTable.mergeBucketed(spark, pb, facts(200, "b"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 8, retainVersions = 4)
    val dirsBefore = ManifestTable.dataDirs(spark, pa, 1L)
    // DV-delete every user_id == 7 row from the bucketed fact
    val del = ManifestTable.deleteWhereMoR(spark, pa, "part",
      col("user_id") === 7L, retainVersions = 4)
    assert(del.committed && del.rowsDeleted == 6L && del.dirsRewritten == 0L)
    assert(ManifestTable.dataDirs(spark, pa, 2L) == dirsBefore,
      "a DV commit must reference byte-identical data dirs")
    // the registered read folds the DV in and the SMB join stays free
    val ta = ManifestTable.registerBucketed(spark, pa, "mbkt_mor_a")
    val tb = ManifestTable.registerBucketed(spark, pb, "mbkt_mor_b")
    val j = ta.select("user_id", "v").hint("merge")
      .join(tb.select(col("user_id"), col("v").as("v2")).hint("merge"),
        Seq("user_id"))
    assert(Bucketed.isShuffleFree(j),
      "DV anti-join must not reintroduce a shuffle:\n" +
        j.queryExecution.executedPlan.toString.take(2000))
    assert(ta.filter(col("user_id") === 7L).count() == 0L,
      "DV'd rows must be invisible through the registered read")
    assert(ta.count() == 294L)
    // plain manifest read agrees with the registered read
    assert(ManifestTable.read(spark, pa).count() == 294L)
    // fold: only debt partitions rewrite, THROUGH the bucketed writer
    val folded = ManifestTable.foldMoR(spark, pa, "part", retainVersions = 4)
    assert(folded == 3L, s"user 7 hits all 3 partitions; folded $folded")
    assert(ManifestTable.dvStats(spark, pa)._1 == 0L)
    val ta2 = ManifestTable.registerBucketed(spark, pa, "mbkt_mor_a2")
    val j2 = ta2.select("user_id", "v").hint("merge")
      .join(tb.select(col("user_id"), col("v").as("v2")).hint("merge"),
        Seq("user_id"))
    assert(Bucketed.isShuffleFree(j2),
      "the folded table must still register as cleanly bucketed")
    assert(ta2.count() == 294L && ta2.filter(col("user_id") === 7L).count() == 0L)
    // the spec survives the fold as durable props
    assert(ManifestTable.readProps(spark, pa)(ManifestTable.BucketColProp) == "user_id")
  }

  test("purgeDeletes on a bucketed table re-lands through the bucketed writer: " +
    "bytes gone, SMB join still shuffle-free") {
    val pa = freshPath("purge"); val pb = freshPath("purgeb")
    ManifestTable.mergeBucketed(spark, pa, facts(300, "a"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 8, retainVersions = 4)
    ManifestTable.mergeBucketed(spark, pb, facts(200, "b"),
      keys = Seq("payload"), partitionCol = "part", bucketCol = "user_id",
      nBuckets = 8, retainVersions = 4)
    ManifestTable.deleteWhereMoR(spark, pa, "part", col("user_id") === 7L,
      retainVersions = 4)
    def physicalUsers(): Set[Long] = spark.read
      .option("recursiveFileLookup", "true").option("pathGlobFilter", "*.parquet")
      .parquet(s"$pa/data").select("user_id").as[Long].collect().toSet
    assert(physicalUsers().contains(7L), "pre-purge: masked bytes on disk")
    val r = ManifestTable.purgeDeletes(spark, pa)
    assert(r.committed && r.dirsPurged == 3L, r.toString)
    assert(!physicalUsers().contains(7L), "purged bytes must be gone")
    assert(ManifestTable.dvStats(spark, pa)._1 == 0L)
    // the purge re-landed BUCKETED: registration + SMB join still free
    val ta = ManifestTable.registerBucketed(spark, pa, "mbkt_purge_a")
    val tb = ManifestTable.registerBucketed(spark, pb, "mbkt_purge_b")
    val j = ta.select("user_id", "v").hint("merge")
      .join(tb.select(col("user_id"), col("v").as("v2")).hint("merge"),
        Seq("user_id"))
    assert(Bucketed.isShuffleFree(j),
      "a purge must not detach rows from their buckets:\n" +
        j.queryExecution.executedPlan.toString.take(2000))
    assert(ta.count() == 294L && ta.filter(col("user_id") === 7L).count() == 0L)
    assert(ManifestTable.readProps(spark, pa)(ManifestTable.BucketColProp) == "user_id")
  }
}
