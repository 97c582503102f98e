package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ManifestTable, ManifestTxn}

/** Multi-table atomic commit (ManifestTxn): all-or-nothing across
  * manifest tables via write-ahead journal + idempotent roll-forward.
  */
class TxnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_txn_$tag").toString

  private def rows(part: String, ids: Range) =
    ids.map(i => (i.toLong, part, i * 1.0)).toDF("id", "part", "v")

  private def mergeIn(path: String, df: org.apache.spark.sql.DataFrame): Unit =
    ManifestTable.merge(spark, path, df, keys = Seq("id"), partitionCol = "part",
      retainVersions = 4)

  test("a transaction commits two tables atomically; journal clears; cleanups run") {
    val d = freshDir("happy"); val t1 = s"$d/t1"; val t2 = s"$d/t2"
    mergeIn(t1, rows("p0", 0 until 10))
    mergeIn(t2, rows("q0", 0 until 5))
    ManifestTxn.run(spark, s"$d/_txn") {
      mergeIn(t1, rows("p1", 100 until 110))
      mergeIn(t2, rows("q1", 200 until 203))
    }
    assert(ManifestTable.read(spark, t1).count() == 20L)
    assert(ManifestTable.read(spark, t2).count() == 8L)
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ManifestTable.versions(fs, t1) == Seq(1L, 2L))
    assert(ManifestTable.versions(fs, t2) == Seq(1L, 2L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/_txn")) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$d/_txn")).isEmpty)
    // no stray tmp manifests
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$t1/_manifests"))
      .exists(_.getPath.getName.endsWith(".tmp")))
  }

  test("a failing body aborts wholesale: no table changes, tmps gone") {
    val d = freshDir("abort"); val t1 = s"$d/t1"; val t2 = s"$d/t2"
    mergeIn(t1, rows("p0", 0 until 10))
    mergeIn(t2, rows("q0", 0 until 5))
    val e = intercept[RuntimeException](
      ManifestTxn.run(spark, s"$d/_txn") {
        mergeIn(t1, rows("p1", 100 until 110))
        sys.error("boom after first staged write")
      })
    assert(e.getMessage.contains("boom"))
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ManifestTable.versions(fs, t1) == Seq(1L))
    assert(ManifestTable.read(spark, t1).count() == 10L)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$t1/_manifests"))
      .exists(_.getPath.getName.endsWith(".tmp")))
  }

  test("a rival commit between stage and promote aborts cleanly (pre-check)") {
    val d = freshDir("rival"); val t1 = s"$d/t1"
    mergeIn(t1, rows("p0", 0 until 10))
    val e = intercept[ManifestTxn.TxnConflictException](
      ManifestTxn.run(spark, s"$d/_txn") {
        mergeIn(t1, rows("p1", 100 until 105))
        // a NON-transactional rival on another thread takes m2 first
        val rival = new Thread(() => mergeIn(t1, rows("p9", 900 until 903)))
        rival.start(); rival.join()
      })
    assert(e.getMessage.contains("moved"))
    // the rival's commit stands; the transaction left no trace
    val got = ManifestTable.read(spark, t1)
    assert(got.count() == 13L)
    assert(got.filter(col("id") === 100L).count() == 0L)
  }

  test("crash between promotes rolls forward via recover(), idempotently") {
    val d = freshDir("crash"); val t1 = s"$d/t1"; val t2 = s"$d/t2"
    mergeIn(t1, rows("p0", 0 until 10))
    mergeIn(t2, rows("q0", 0 until 5))
    val staged = ManifestTxn.stageOnly(spark) {
      mergeIn(t1, rows("p1", 100 until 110))
      mergeIn(t2, rows("q1", 200 until 204))
    }
    assert(staged.map(_.path) == Seq(t1, t2))
    ManifestTxn.writeJournal(spark, s"$d/_txn", staged)
    ManifestTxn.promote(spark, staged.take(1)) // "crash" after table 1
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ManifestTable.versions(fs, t1) == Seq(1L, 2L))
    assert(ManifestTable.versions(fs, t2) == Seq(1L))
    assert(ManifestTxn.recover(spark, s"$d/_txn") == 1)
    assert(ManifestTable.versions(fs, t2) == Seq(1L, 2L))
    assert(ManifestTable.read(spark, t1).count() == 20L)
    assert(ManifestTable.read(spark, t2).count() == 9L)
    assert(ManifestTxn.recover(spark, s"$d/_txn") == 0) // idempotent
  }

  test("a foreign steal of a journaled slot surfaces as TxnBroken, not silent loss") {
    val d = freshDir("steal"); val t1 = s"$d/t1"
    mergeIn(t1, rows("p0", 0 until 10))
    val staged = ManifestTxn.stageOnly(spark) {
      mergeIn(t1, rows("p1", 100 until 105))
    }
    ManifestTxn.writeJournal(spark, s"$d/_txn", staged)
    mergeIn(t1, rows("p9", 900 until 902)) // foreign writer takes m2
    intercept[ManifestTxn.TxnBrokenException](
      ManifestTxn.recover(spark, s"$d/_txn"))
  }
}
