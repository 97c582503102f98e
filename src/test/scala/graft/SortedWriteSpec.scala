package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ManifestTable

/** Durable write sort order (`merge(sortWithinDirs = …)` →
  * `sort.cols`): rows sort by the declared columns within every
  * partition dir on every write, so row groups carry tight disjoint
  * footer ranges for row-group pushdown — the second level of the
  * skipping hierarchy under the dir-level zone maps.
  */
class SortedWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sw_$tag").toString + "/t"

  /** `v` values of one dir's single parquet file in FILE ORDER. */
  private def fileOrder(path: String, part: String): Seq[Long] = {
    val dirs = ManifestTable.entryDirs(spark, path,
      ManifestTable.versions(
        new org.apache.hadoop.fs.Path(path).getFileSystem(
          spark.sparkContext.hadoopConfiguration), path).max)
    val rel = dirs(part)
    val files = new java.io.File(s"$path/$rel").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    assert(files.size == 1, s"expected one file per dir, got ${files.size}")
    spark.read.parquet(files.head).select("v").as[Long].collect().toSeq
  }

  private def seedRows(n: Int): org.apache.spark.sql.DataFrame =
    (1 to n).map(i => ((i * 7919L) % n, (i % 3).toString, (i * 104729L) % 1000L))
      .toDF("id", "part", "v")

  test("declared once, the sort order applies to this and EVERY later " +
    "merge (durable prop); files land sorted within each dir") {
    val path = freshPath("basic")
    ManifestTable.merge(spark, path, seedRows(90), Seq("id"), "part",
      sortWithinDirs = Seq("v"))
    assert(ManifestTable.sortColsOf(ManifestTable.readProps(spark, path)) == Seq("v"))
    val o1 = fileOrder(path, "0")
    assert(o1 == o1.sorted, "first batch must land v-sorted")
    // a later merge WITHOUT the param keeps the contract
    ManifestTable.merge(spark, path,
      Seq((100000L, "0", 7L), (100001L, "0", 3L), (100002L, "0", 999L),
        (100003L, "0", 1L)).toDF("id", "part", "v"),
      Seq("id"), "part")
    val o2 = fileOrder(path, "0")
    assert(o2 == o2.sorted, "later merges must keep sorting (durable prop)")
    assert(ManifestTable.sortColsOf(ManifestTable.readProps(spark, path)) == Seq("v"))
  }

  test("rename carries the sort column; drop removes it from the order") {
    val path = freshPath("ren")
    ManifestTable.merge(spark, path, seedRows(30), Seq("id"), "part",
      sortWithinDirs = Seq("v"))
    ManifestTable.renameColumn(spark, path, "v", "w")
    assert(ManifestTable.sortColsOf(ManifestTable.readProps(spark, path)) == Seq("w"))
    // merging under the new name keeps sorting
    ManifestTable.merge(spark, path,
      Seq((200000L, "1", 5L), (200001L, "1", 2L)).toDF("id", "part", "w"),
      Seq("id"), "part")
    ManifestTable.dropColumn(spark, path, "w")
    assert(ManifestTable.sortColsOf(ManifestTable.readProps(spark, path)).isEmpty)
    // and a post-drop merge (schema without w) still lands
    ManifestTable.merge(spark, path,
      Seq((300000L, "1")).toDF("id", "part"), Seq("id"), "part")
  }

  test("guards: an unknown sort column is refused before anything writes") {
    val path = freshPath("guard")
    intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, path, seedRows(9), Seq("id"), "part",
        sortWithinDirs = Seq("nope"))
    }
  }
}
