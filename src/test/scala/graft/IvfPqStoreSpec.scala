package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{IvfStore, PqStore}
import graft.ops.ManifestTable

/** Erasure propagation into the persisted ANN stores (IvfStore /
  * PqStore `eraseKeys`): an erased vector disappears from committed
  * search results through a DV-only commit; the trained artifacts
  * (centroids / codebooks — whole-corpus aggregates) stay put.
  */
class IvfPqStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshBase(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ivfpq_$tag").toString + "/ix"

  /** Two tight 4-d blobs around 0 and 10; float embeddings. */
  private def blobs(ids: Range): DataFrame =
    ids.map { i =>
      val c = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(c + 0.001f * i, c, c - 0.001f * i, c))
    }.toDF("vec_id", "embedding")

  /** A query OUTSIDE the corpus id space (no self-exclusion confound)
    * carrying a low-blob vector. */
  private def query: DataFrame =
    Seq((999L, Array(0.01f, 0.0f, -0.01f, 0.0f))).toDF("vec_id", "embedding")

  test("IvfStore.eraseKeys: erased vectors leave committed search results; " +
    "DV-only; drift count reflects the erasure") {
    val base = freshBase("ivf")
    IvfStore.trainCommit(spark, base, blobs(0 until 40), k = 2)
    val pre = IvfStore.searchCommitted(spark, base, query, k = 40)
      .select("neighbor_id").as[Long].collect().toSet
    assert(pre.contains(4L) && pre.contains(6L) && pre.size == 40,
      s"all corpus vectors findable before erasure; got ${pre.size}")
    val er = IvfStore.eraseKeys(spark, base, Seq(4L, 6L))
    assert(er.rowsErased == 2L && er.dirsRewritten == 0L, s"got $er")
    val post = IvfStore.searchCommitted(spark, base, query, k = 40)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!post.contains(4L) && !post.contains(6L),
      "erased vectors must never be served again")
    assert(post.size == 38, s"survivors still serve; got ${post.size}")
    assert(IvfStore.needsRetrain(spark, base).indexedRows == 38L)
  }

  test("PqStore.eraseKeys: erased codes leave the shortlist; codebooks untouched") {
    val base = freshBase("pq")
    val corpus = blobs(0 until 40)
    PqStore.trainCommit(spark, base, corpus, m = 4, k = 4)
    val pre = PqStore.searchCommitted(spark, base, corpus, query, k = 40,
      shortlist = 60).select("neighbor_id").as[Long].collect().toSet
    assert(pre.contains(4L) && pre.contains(6L) && pre.size == 40,
      s"all corpus vectors findable before erasure; got ${pre.size}")
    val booksBefore = ManifestTable.read(spark, PqStore.codebooksPath(base))
      .orderBy("sub_id", "code_id").collect().toSeq
    val er = PqStore.eraseKeys(spark, base, Seq(4L, 6L))
    assert(er.rowsErased == 2L && er.dirsRewritten == 0L, s"got $er")
    val post = PqStore.searchCommitted(spark, base, corpus, query, k = 40,
      shortlist = 60).select("neighbor_id").as[Long].collect().toSet
    assert(!post.contains(4L) && !post.contains(6L),
      "erased codes must never shortlist again")
    assert(post.size == 38, s"survivors still serve; got ${post.size}")
    assert(ManifestTable.read(spark, PqStore.codebooksPath(base))
      .orderBy("sub_id", "code_id").collect().toSeq == booksBefore,
      "erasure must not touch the codebooks")
    assert(PqStore.needsRetrain(spark, base).indexedRows == 38L)
  }
}
