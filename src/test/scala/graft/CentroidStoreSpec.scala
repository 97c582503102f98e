package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{CentroidStore, Cluster}
import graft.ops.ManifestTable

/** Persisted k-means (CentroidStore): committed centroids reproduce
  * the training session bit-exactly, appendBatch touches only the hit
  * cluster partitions, and the drift policy stays metadata-only.
  */
class CentroidStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshBase(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cstore_$tag").toString + "/km"

  /** Two tight 4-d blobs around (0,0,0,0) and (10,10,10,10). */
  private def blobs(ids: Range): DataFrame =
    ids.map { i =>
      val c = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Array(c + 0.001 * i, c, c - 0.001 * i, c))
    }.toDF("vec_id", "embedding")

  test("committed matrix == trained matrix; assignments reproduce kmeansQuantized") {
    val base = freshBase("exact")
    val corpus = blobs(0 until 40)
    CentroidStore.trainCommit(spark, base, corpus, k = 2, iters = 2)
    val direct = Cluster.trainQuantized(corpus, k = 2, iters = 2)
    assert(CentroidStore.committedCentroids(spark, base) == direct)
    val stored = ManifestTable.read(spark,
      CentroidStore.assignmentsPath(base)).select("vec_id", "cluster_id")
    val fresh = Cluster.kmeansQuantized(corpus, k = 2, iters = 2)
    assert(stored.exceptAll(fresh).unionAll(fresh.exceptAll(stored)).count() == 0L)
  }

  test("assignBatch: no retrain, only hit cluster partitions rewritten, LWW idempotent") {
    val base = freshBase("append")
    CentroidStore.trainCommit(spark, base, blobs(0 until 40), k = 2, iters = 2)
    val before = CentroidStore.committedCentroids(spark, base)
    val apath = CentroidStore.assignmentsPath(base)
    val d1 = ManifestTable.entryDirs(spark, apath, 1L)
    // an even-ids-only batch lands entirely in the low blob's cluster
    val batch = blobs(100 until 120).filter(col("vec_id") % 2 === 0)
    val res = CentroidStore.assignBatch(spark, base, batch)
    assert(res.rowsAssigned == 10L && res.clustersTouched.size == 1)
    assert(CentroidStore.committedCentroids(spark, base) == before,
      "appendBatch must not move the committed centroids")
    val d2 = ManifestTable.entryDirs(spark, apath, 2L)
    d1.foreach { case (k, v) =>
      if (!res.clustersTouched.contains(k))
        assert(d2.get(k).contains(v), s"untouched cluster $k was rewritten") }
    assert(ManifestTable.fastCount(spark, apath).rows == 50L)
    // re-delivering the same batch upserts by key: no growth
    CentroidStore.assignBatch(spark, base, batch)
    assert(ManifestTable.fastCount(spark, apath).rows == 50L)
  }

  test("balancedSampleCommitted caps per cluster; needsRetrain fires on growth") {
    val base = freshBase("policy")
    CentroidStore.trainCommit(spark, base, blobs(0 until 40), k = 2, iters = 2)
    val capped = CentroidStore.balancedSampleCommitted(spark, base, cap = 5)
    assert(capped.groupBy(col("cluster_id")).count()
      .select("count").as[Long].collect().forall(_ <= 5L))
    val calm = CentroidStore.needsRetrain(spark, base, growthFactor = 1.5)
    assert(!calm.retrain && calm.metadataOnly && calm.trainedRows == 40L)
    CentroidStore.assignBatch(spark, base, blobs(1000 until 1030))
    val grown = CentroidStore.needsRetrain(spark, base, growthFactor = 1.5)
    assert(grown.retrain && grown.metadataOnly && grown.indexedRows == 70L)
  }

  test("eraseKeys drops a subject's assignment rows (DV-only, centroids " +
    "untouched); samples no longer draw them") {
    val base = freshBase("erase")
    CentroidStore.trainCommit(spark, base, blobs(0 until 40), k = 2, iters = 2)
    val before = CentroidStore.committedCentroids(spark, base)
    val er = CentroidStore.eraseKeys(spark, base, Seq(4L, 5L))
    assert(er.rowsErased == 2L && er.dirsRewritten == 0L, s"got $er")
    assert(CentroidStore.committedCentroids(spark, base) == before,
      "erasure must not move the committed matrix")
    val left = ManifestTable.read(spark, CentroidStore.assignmentsPath(base))
      .filter(col("vec_id").isin(4L, 5L)).count()
    assert(left == 0L, "erased assignments still readable")
    val drawn = CentroidStore.balancedSampleCommitted(spark, base, cap = 100)
      .select("vec_id").as[Long].collect().toSet
    assert(!drawn.contains(4L) && !drawn.contains(5L) && drawn.size == 38)
  }
}
