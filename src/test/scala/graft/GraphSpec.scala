package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pageRankE9 matches hand-computed fixed-point iterations on a 3-node star") {
    // 1↔2, 1↔3 (undirected as directed pairs): deg(1)=2, deg(2)=deg(3)=1.
    // r0 = 1e9 everywhere;
    // r1(1) = 15e7 + (85·(1e9 + 1e9)) div 100      = 1,850,000,000
    // r1(2) = r1(3) = 15e7 + (85·(1e9 div 2)) div 100 = 575,000,000
    // r2(1) = 15e7 + (85·(575e6 + 575e6)) div 100  = 1,127,500,000
    // r2(2) = r2(3) = 15e7 + (85·(185e7 div 2)) div 100 = 936,250,000
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRankE9(edges, iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1127500000L), (2L, 936250000L), (3L, 936250000L)))
    graft.ops.Intermediates.sweep(spark)
  }

  test("pageRankE9Converged stops early and equals the fixed-iteration run at that count") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    // the 1↔{2,3} star is bipartite: the rank exchange oscillates and
    // decays at damping^k, so a per-node tolerance of 2e5 (0.02% of
    // the initial rank) fires around iteration ~50
    val c = Graph.pageRankE9Converged(edges, maxIters = 60, tolPerNodeE9 = 200000L)
    assert(c.converged, s"expected convergence, lastDelta=${c.lastDeltaE9}")
    assert(c.itersRun < 60, "the stopping rule must fire before the budget")
    assert(c.lastDeltaE9 <= 200000L * 3)
    // determinism: the converged ranks ARE the fixed-iteration ranks
    // at the reported count — the property that lets an oracle unroll
    val fixedRun = Graph.pageRankE9(edges, iters = c.itersRun)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val got = c.ranks.orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == fixedRun)
    graft.ops.Intermediates.sweep(spark)
  }

  test("pageRankE9Converged reports non-convergence at an impossible tolerance") {
    // tol 0 on a graph whose integer iteration keeps moving within
    // maxIters=2 — the rule must NOT claim convergence
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val c = Graph.pageRankE9Converged(edges, maxIters = 2, tolPerNodeE9 = 0L)
    assert(!c.converged && c.itersRun == 2)
    graft.ops.Intermediates.sweep(spark)
  }

  test("pageRankE9Bucketed: edge scan bucketed, only rank-sized exchanges, ranks exact") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 4L))
    val edges = (pairs ++ pairs.map(_.swap)).distinct.toDF("src", "dst")
    graft.ops.Bucketed.writeBucketed(edges, "graphspec_edges", "src", buckets = 4)
    val r = graft.ext.Graph.pageRankE9Bucketed(spark, "graphspec_edges", iters = 2)
    assert(r.edgeScanBucketed, "edge scan must report Bucketed: true:\n" +
      r.probePlan.take(3000))
    assert(r.shuffleExchanges <= 2,
      s"expected <=2 rank-sized exchanges, got ${r.shuffleExchanges}:\n" +
        r.probePlan.take(3000))
    val want = graft.ext.Graph.pageRankE9(edges, iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val got = r.ranks.orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == want)
    graft.ops.Intermediates.sweep(spark)
  }

  test("pageRankE9: a sink node keeps base rank inflow only (dangling mass not redistributed)") {
    // 1 → 2 only: node 2 never emits, node 1 never receives.
    // r1(1) = 15e7; r1(2) = 15e7 + (85·1e9) div 100 = 1e9.
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = Graph.pageRankE9(edges, iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 150000000L), (2L, 1000000000L)))
    graft.ops.Intermediates.sweep(spark)
  }
}
