package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Intermediates

/** Link-analysis operators over edge lists — the graph family of a
  * large-scale data pipeline (duplicate-cluster centrality, source
  * authority for quality weighting, spam-farm detection).
  *
  * Everything here is the standard distributed PageRank shape: each
  * iteration is one (rank ⋈ out-degree) map, one fan-out join over
  * the edge list, and one destination-keyed hash aggregate. At 100 TB
  * the edge list is the big operand — write it bucketed on `src`
  * ([[graft.ops.Layout.writeBucketed]]) and every iteration's fan-out
  * join is shuffle-free on that side; ranks (one row per node) shuffle
  * on the node key only. Iteration count is a caller-fixed constant,
  * never data-dependent.
  */
object Graph {

  /** PageRank-style propagation, `iters` fixed iterations, in exact
    * 1e-9 fixed point (BIGINT end to end — float ranks would make a
    * cross-engine gate impossible, the q54/q66 argument):
    *
    *   rank'(v) = (1−d)·1e9 + d · Σ_{u→v} (rank(u) div outdeg(u))
    *
    * with d = dampingE2/100 applied as an integer cross-multiply
    * ((dampingE2 · Σ) div 100). Two documented simplifications vs
    * textbook PageRank, both deliberate for a bounded, engine-exact
    * gate: ranks are unnormalized (no division by N — scale-free,
    * ordering unchanged) and DANGLING MASS IS NOT REDISTRIBUTED
    * (sink nodes absorb it; callers who need the stochastic form add
    * reverse edges or self-loops — the q87 gate feeds an undirected
    * edge set, where no node is dangling).
    *
    * Iterative-plan hygiene is the [[Dedup.connectedComponents]]
    * pattern: eager localCheckpoint per iterate, previous iterate
    * released as soon as the next materializes.
    *
    * Input: (srcCol, dstCol) edge list; duplicates are collapsed.
    * Output: (node, rank_e9) for every node on either edge side. */
  def pageRankE9(edges: DataFrame, iters: Int,
                 srcCol: String = "src", dstCol: String = "dst",
                 dampingE2: Int = 85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingE2 >= 0 && dampingE2 <= 100, s"dampingE2 in [0,100], got $dampingE2")
    val e = Intermediates.shared(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")).distinct())
    val outdeg = Intermediates.shared(
      e.groupBy(col("__src")).agg(count(lit(1)).as("__deg")))
    // Node universe feeds every iteration's left join AND the init —
    // eager checkpoint, released after the loop (the returned iterate
    // is itself materialized, so it never re-reads this).
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct()
      .localCheckpoint()
    val baseE9 = (100 - dampingE2).toLong * 10000000L // (1−d)·1e9, exact

    var rank = nodes.withColumn("rank_e9", lit(1000000000L))
    for (_ <- 1 to iters) {
      val contrib = rank
        .join(outdeg, col("node") === col("__src"))
        .withColumn("__c", expr("rank_e9 div __deg"))
        .join(e, Seq("__src"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("__c")).as("__in"))
      val prev = rank
      rank = nodes.join(contrib, Seq("node"), "left")
        .withColumn("__in", coalesce(col("__in"), lit(0L)))
        .withColumn("rank_e9", lit(baseE9) + expr(s"($dampingE2 * __in) div 100"))
        .select(col("node"), col("rank_e9"))
        .localCheckpoint()
      Intermediates.release(prev)
    }
    Intermediates.release(nodes)
    rank
  }
}
