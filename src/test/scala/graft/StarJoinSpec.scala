package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IncrementalJoin, ManifestTable}
import graft.plans.MvJoinRegistry

/** Star-join CHAINING through MvJoinRewriteRule: in
  * `fact ⋈ dim1 ⋈ dim2`, the inner join rewrites onto its maintained
  * view, and the outer join — whose fact side is now that VIEW's scan
  * — rewrites onto a second-level view registered over the first
  * (view-over-view, the lakehouse star schema's standard shape). The
  * whole star answers from ONE pre-joined scan; a commit on either
  * dim un-rewrites exactly as far as its level and the refresh
  * cascade (view1 from dim1, then view12 from its changed "fact"
  * view1) recovers bit-equal. */
class StarJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def roots(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.head.toString
      }
    }.toSet

  test("a two-dim star answers from the second-level view alone; per-dim " +
    "staleness unwinds exactly one level; the refresh cascade recovers") {
    val root = java.nio.file.Files.createTempDirectory("graft_star_").toString
    val (fact, dim1, dim2) = (root + "/fact", root + "/dim1", root + "/dim2")
    val (view1, view12) = (root + "/view1", root + "/view12")

    val factDf = (1L to 120L).map { i =>
      (i, s"d${i % 3}", i % 10, s"c${i % 5}", i * 3L)
    }.toDF("id", "day", "user_id", "cat", "v")
    val dim1Df = (0L to 9L).map(u => (u, s"seg-${u % 4}", "p0"))
      .toDF("user_id", "seg", "pd")
    val dim2Df = (0 to 4).map(c => (s"c$c", s"cat-$c", "p0"))
      .toDF("cat", "cname", "pd2")
    ManifestTable.merge(spark, fact, factDf, Seq("id"), "day")
    ManifestTable.merge(spark, dim1, dim1Df, Seq("user_id"), "pd")
    ManifestTable.merge(spark, dim2, dim2Df, Seq("cat"), "pd2")

    def refreshChain(): Unit = {
      IncrementalJoin.refresh(spark, fact, dim1, view1, Seq("id"), Seq("user_id"), "day")
      IncrementalJoin.refresh(spark, view1, dim2, view12, Seq("id"), Seq("cat"), "day")
    }
    refreshChain()
    MvJoinRegistry.register(spark, fact, dim1, view1, Seq("user_id"))
    MvJoinRegistry.register(spark, view1, dim2, view12, Seq("cat"))
    try {
      def q(): DataFrame = ManifestTable.read(spark, fact)
        .join(ManifestTable.read(spark, dim1), Seq("user_id"))
        .join(ManifestTable.read(spark, dim2), Seq("cat"))
        .groupBy(col("seg"), col("cname"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .orderBy(col("seg"), col("cname"))
      def rowsOf(df: DataFrame): Seq[String] = df.collect().map(_.toString).toSeq

      val q1 = q(); val rows1 = rowsOf(q1); val r1 = roots(q1)
      assert(r1.size == 1 && r1.head.endsWith("/view12"),
        s"the star must answer from view12 alone: $r1")

      // truth with the rewrite off
      spark.conf.set("spark.graft.mvRewrite.enabled", "false")
      val truth1 = try rowsOf(q()) finally
        spark.conf.set("spark.graft.mvRewrite.enabled", "true")
      assert(rows1 == truth1, "star view answer must equal the scan answer")

      // dim2 commit: outer level un-rewrites (view1 survives)
      ManifestTable.updateWhere(spark, dim2, "pd2", col("cat") === "c2",
        Map("cname" -> lit("cat-X")))
      val q2 = q(); val rows2 = rowsOf(q2); val r2 = roots(q2)
      assert(r2.exists(_.endsWith("/view1")) && r2.exists(_.endsWith("/dim2")) &&
        !r2.exists(_.endsWith("/fact")),
        s"a dim2 commit must unwind exactly the outer level: $r2")
      IncrementalJoin.refresh(spark, view1, dim2, view12, Seq("id"), Seq("cat"), "day")
      val q3 = q(); val r3 = roots(q3)
      assert(r3.size == 1 && r3.head.endsWith("/view12"),
        s"refreshing view12 must restore the full rewrite: $r3")
      assert(rowsOf(q3) == rows2, "recovered rows must equal the stale-scan rows")

      // dim1 commit: the whole star unwinds to base scans
      ManifestTable.updateWhere(spark, dim1, "pd", col("user_id") === 3L,
        Map("seg" -> lit("seg-X")))
      val q4 = q(); val rows4 = rowsOf(q4); val r4 = roots(q4)
      assert(r4.exists(_.endsWith("/fact")) && r4.exists(_.endsWith("/dim1")),
        s"a dim1 commit must unwind the inner level too: $r4")
      refreshChain()
      val q5 = q(); val r5 = roots(q5)
      assert(r5.size == 1 && r5.head.endsWith("/view12"),
        s"the refresh cascade must restore the full rewrite: $r5")
      assert(rowsOf(q5) == rows4, "recovered rows must equal the stale-scan rows")
    } finally {
      MvJoinRegistry.unregister(spark, fact, dim1)
      MvJoinRegistry.unregister(spark, view1, dim2)
    }
  }
}
