package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GraftFileIndex, ManifestTable}

/** Catalyst-integrated automatic data skipping (GraftFileIndex): a
  * plain `ManifestTable.read(path).where(…)` must prune whole data
  * dirs through `FileSourceStrategy`'s `dataFilters`, with the same
  * conservative rules the explicit `readSkipping` forms follow — and
  * every pruned plan must return exactly the rows an unpruned scan
  * would.
  */
class GraftFileIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_gfi_$tag").toString + "/t"

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s + " 00:00:00")

  /** Three day-partitions with disjoint `v` ranges and id ranges:
    * day1 ids 1-2 v [1,5]; day2 ids 3-4 v [10,15]; day3 ids 5-6
    * v [100,200]. Stats on v+id, bloom on id. */
  private def seed(path: String): Unit = {
    val base = Seq(
      (1L, ts("2024-01-01"), 1.0, "a"), (2L, ts("2024-01-01"), 5.0, "b"),
      (3L, ts("2024-01-02"), 10.0, "c"), (4L, ts("2024-01-02"), 15.0, "d"),
      (5L, ts("2024-01-03"), 100.0, "e"), (6L, ts("2024-01-03"), 200.0, "f"))
      .toDF("id", "day", "v", "s")
    ManifestTable.merge(spark, path, base, Seq("id"), "day",
      statsColumns = Seq("v", "id"), bloomColumns = Seq("id"))
  }

  /** Run `df` to completion and return the summed `(kept, total)`
    * pruning evidence of every GraftFileIndex its scans consulted.
    * The index object lives on the shared HadoopFsRelation, so the
    * pre-AQE `sparkPlan` finds the same instance the executed scan
    * updated. */
  private def evidence(df: DataFrame): (Long, Long) = {
    df.collect()
    val prunes = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collect { case g: GraftFileIndex => g.lastPrune }.flatten
    assert(prunes.nonEmpty, "no GraftFileIndex recorded a filtered listFiles " +
      "(the filter never reached the scan as a dataFilter)")
    (prunes.map(_._1).sum, prunes.map(_._2).sum)
  }

  test("a plain read + range filter prunes dirs via committed zone maps") {
    val path = freshPath("range")
    seed(path)
    val df = ManifestTable.read(spark, path).where(col("v") >= 12.0 && col("v") <= 50.0)
    val (kept, total) = evidence(df)
    assert(total == 3L, s"3 day dirs expected, saw $total")
    assert(kept == 1L, s"[12,50] intersects only day2's [10,15]; kept $kept")
    assert(df.select("id").as[Long].collect().toSet == Set(4L),
      "the pruned scan still row-filters: only v=15 satisfies the predicate")
    // v > col literal-on-the-left shape
    val df2 = ManifestTable.read(spark, path).where(lit(8.0) > col("v"))
    val (k2, _) = evidence(df2)
    assert(k2 == 1L && df2.count() == 2L, "8 > v keeps only day1")
  }

  test("equality probes consult the bloom dir-index; misses prune to zero") {
    val path = freshPath("bloom")
    seed(path)
    val hit = ManifestTable.read(spark, path).where(col("id") === 5L)
    val (kh, th) = evidence(hit)
    assert(th == 3L && kh == 1L, s"id=5 lives in day3 only; kept $kh/$th")
    assert(hit.select("s").as[String].collect().toSeq == Seq("e"))
    // id outside every [min,max]: zone maps alone exclude all dirs
    val miss = ManifestTable.read(spark, path).where(col("id") === 99L)
    val (km, _) = evidence(miss)
    assert(km == 0L && miss.count() == 0L,
      "an impossible key must prune every dir yet return a schema'd empty frame")
    assert(miss.schema.fieldNames.toSeq == Seq("id", "day", "v", "s"))
  }

  test("AND prunes on either conjunct, OR needs both sides excluded") {
    val path = freshPath("bool")
    seed(path)
    val and = ManifestTable.read(spark, path)
      .where(col("v") > 12.0 && col("s") =!= "zz")
    val (ka, _) = evidence(and)
    assert(ka == 2L, s"v > 12 excludes day1 regardless of the statless s-conjunct; kept $ka")
    assert(and.count() == 3L)
    val or = ManifestTable.read(spark, path)
      .where(col("v") < 3.0 || col("v") > 150.0)
    val (ko, _) = evidence(or)
    assert(ko == 2L, s"only day2 [10,15] is excluded by BOTH disjuncts; kept $ko")
    assert(or.select("id").as[Long].collect().toSet == Set(1L, 6L))
  }

  test("conservative: statless columns and non-literal shapes never prune") {
    val path = freshPath("cons")
    seed(path)
    // s has no stats and no bloom
    val s1 = ManifestTable.read(spark, path).where(col("s") === "a")
    val (k1, _) = evidence(s1)
    assert(k1 == 3L && s1.count() == 1L, "statless column must scan every dir")
    // a function wraps the column: unknown shape, keep all
    val s2 = ManifestTable.read(spark, path).where(abs(col("v")) > 150.0)
    val (k2, _) = evidence(s2)
    assert(k2 == 3L && s2.count() == 1L, "abs(v) is not a col-op-literal; no pruning")
  }

  test("an aux-carrying entry is never pruned: updated values outside the " +
    "recorded bounds still surface") {
    val path = freshPath("aux")
    seed(path)
    // push row id=1 (day1, recorded v-range [1,5]) to v=999
    val r = ManifestTable.updateWhereMoR(spark, path, "day",
      col("id") === 1L, Map("v" -> lit(999.0)))
    assert(r.rowsUpdated == 1L && r.dirsRewritten == 0L)
    val hi = ManifestTable.read(spark, path).where(col("v") > 500.0)
    val (kept, total) = evidence(hi)
    assert(hi.select("id").as[Long].collect().toSet == Set(1L),
      "the appendix row v=999 must survive a filter its dir's stats exclude")
    assert(kept < total,
      s"day2/day3 still prune by zone map even with day1 unprunable ($kept/$total)")
    // MoR DELETE: dv'd rows stay invisible through the pruned scan
    ManifestTable.deleteWhereMoR(spark, path, "day", col("id") === 6L)
    val d = ManifestTable.read(spark, path).where(col("v") > 150.0)
    assert(d.select("id").as[Long].collect().toSet == Set(1L),
      "id=6 (v=200) is DV-deleted; only the 999-appendix row remains above 150")
  }

  test("a renamed column prunes under its current name (stats live under " +
    "the physical name)") {
    val path = freshPath("ren")
    seed(path)
    ManifestTable.renameColumn(spark, path, "v", "price")
    val df = ManifestTable.read(spark, path)
      .where(col("price") >= 12.0 && col("price") <= 50.0)
    val (kept, total) = evidence(df)
    assert(kept == 1L && total == 3L,
      s"rename is metadata-only: the physical zone map must still prune ($kept/$total)")
    assert(df.select("id").as[Long].collect().toSet == Set(4L),
      "within the kept dir only v=15 satisfies the range")
  }

  test("a compacted shared dir survives unless EVERY entry it holds is excluded") {
    val path = freshPath("comp")
    seed(path)
    ManifestTable.compact(spark, path, "day")
    // all three partitions now share one dir whose entries carry the
    // per-partition stats forward: v>=12 excludes only day1's ENTRY,
    // not the dir (day2/day3 entries still admit rows)
    val df = ManifestTable.read(spark, path).where(col("v") >= 12.0)
    assert(df.select("id").as[Long].collect().toSet == Set(4L, 5L, 6L))
    // but a predicate excluding every entry drops the shared dir whole
    val none = ManifestTable.read(spark, path).where(col("v") > 1000.0)
    val (k0, _) = evidence(none)
    assert(k0 == 0L && none.count() == 0L,
      "v > 1000 excludes all three entries, so the one shared dir is pruned")
  }
}
