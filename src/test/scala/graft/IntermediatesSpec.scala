package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Intermediates

class IntermediatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cachedRddCount: Int = spark.sparkContext.getRDDStorageInfo.length

  test("shared persists once; sweep releases everything registered since the last sweep") {
    Intermediates.sweep(spark) // clean slate for the session
    val before = cachedRddCount
    val a = Intermediates.shared(Seq(1, 2, 3).toDF("x"))
    val b = Intermediates.shared(Seq(4, 5).toDF("y"))
    assert(a.count() == 3 && b.count() == 2) // materialize the storage
    assert(cachedRddCount >= before + 2, "both intermediates should hold blocks")
    assert(Intermediates.sweep(spark) == 2)
    assert(cachedRddCount == before, "sweep must free exactly what was registered")
    assert(Intermediates.sweep(spark) == 0, "second sweep has nothing to release")
  }

  test("a swept intermediate stays correct: persist keeps lineage, so re-access recomputes") {
    Intermediates.sweep(spark)
    val df = Intermediates.shared(Seq(1, 2, 3).toDF("x"))
    assert(df.count() == 3)
    Intermediates.sweep(spark)
    // the frame (and plans built from it) must still evaluate — this
    // is the property that makes sweeping safe for S8-cached plans
    // whose blocks get evicted later
    assert(df.agg(org.apache.spark.sql.functions.sum($"x")).as[Long].head() == 6L)
  }

  test("release frees an eager localCheckpoint's blocks; no-op on ordinary plans") {
    Intermediates.sweep(spark)
    val before = cachedRddCount
    val ck = Seq(1, 2, 3).toDF("x").localCheckpoint() // eager: blocks exist now
    assert(cachedRddCount == before + 1)
    Intermediates.release(ck)
    assert(cachedRddCount == before, "release must free the checkpoint RDD")
    Intermediates.release(Seq(1).toDF("x")) // ordinary plan: must not throw
  }
}
