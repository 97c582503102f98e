package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Intermediates

/** Runs against its OWN `newSession()` (same SparkContext, distinct
  * session object): the registry is keyed per session, and the suite
  * pool shares one session — a concurrent suite's sweep would
  * otherwise race these assertions. Per-frame `storageLevel` is the
  * assertion primitive, not global cached-RDD counts, for the same
  * reason. */
class IntermediatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark.newSession()
  import spark.implicits._

  test("shared persists; sweep releases exactly this session's registrations, no more") {
    val a = Intermediates.shared(Seq(1, 2, 3).toDF("x"))
    val b = Intermediates.shared(Seq(4, 5).toDF("y"))
    // a sibling session's registration must SURVIVE this session's sweep
    val sibling = SparkTestSession.spark.newSession()
    val c = {
      import sibling.implicits._
      Intermediates.shared(Seq(7, 8).toDF("z"))
    }
    assert(a.count() == 3 && b.count() == 2 && c.count() == 2) // materialize the storage
    assert(a.storageLevel != StorageLevel.NONE && b.storageLevel != StorageLevel.NONE)
    assert(Intermediates.sweep(spark) == 2)
    assert(a.storageLevel == StorageLevel.NONE && b.storageLevel == StorageLevel.NONE,
      "sweep must unpersist what was registered")
    assert(c.storageLevel != StorageLevel.NONE,
      "sweep must not touch another session's registrations")
    assert(Intermediates.sweep(spark) == 0, "second sweep has nothing to release")
    assert(Intermediates.sweep(sibling) == 1)
  }

  test("a swept intermediate stays correct: persist keeps lineage, so re-access recomputes") {
    val df = Intermediates.shared(Seq(1, 2, 3).toDF("x"))
    assert(df.count() == 3)
    Intermediates.sweep(spark)
    // the frame (and plans built from it) must still evaluate — this
    // is the property that makes sweeping safe for S8-cached plans
    // whose blocks get evicted later
    assert(df.agg(org.apache.spark.sql.functions.sum($"x")).as[Long].head() == 6L)
  }

  test("release frees an eager localCheckpoint's blocks; no-op on ordinary plans") {
    val ck = Seq(1, 2, 3).toDF("x").localCheckpoint() // eager: blocks exist now
    val rdd = ck.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => fail(s"expected LogicalRDD, got ${other.getClass}")
    }
    assert(rdd.getStorageLevel != StorageLevel.NONE)
    Intermediates.release(ck)
    assert(rdd.getStorageLevel == StorageLevel.NONE,
      "release must free the checkpoint RDD's blocks")
    Intermediates.release(Seq(1).toDF("x")) // ordinary plan: must not throw
  }
}
