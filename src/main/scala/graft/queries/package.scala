package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Package-level helpers shared by the declared-query files.
  *
  * [[SortedResult.orderedShared]] — persist-before-global-sort (r20,
  * optimization round; guide §5 reuse rule): Spark plans a bare
  * `orderBy` as a range exchange, and a RANGE exchange SAMPLES its
  * child RDD to pick partition bounds before the real shuffle runs.
  * Shuffle outputs upstream are reused between the two traversals,
  * but everything in the FINAL stage — the narrow chain between the
  * last exchange (or the scan, for map-only plans) and the sort —
  * executes twice per action. For result frames whose final stage
  * carries real work (window evaluation, per-row text/media kernels,
  * broadcast-join probes), that is a structural 2× on the query's
  * tail; measured on q65_gap_fill: 3.12 s → 1.73 s median at sf0.1
  * from this change alone.
  *
  * `orderedShared` registers the pre-sort frame with
  * [[graft.ops.Intermediates.shared]] (MEMORY_AND_DISK, swept by the
  * harness at the query boundary), so the sampler reads the cached
  * rows instead of re-running the stage. Scale posture: the persisted
  * frame is the RESULT about to be globally sorted — result-sized by
  * construction, and a global sort only makes sense on result-sized
  * frames; plans whose final sort feeds a `limit` keep plain
  * `orderBy` (TakeOrderedAndProject never range-partitions, so there
  * is nothing to save).
  */
package object queries {

  private[queries] implicit final class SortedResult(private val df: DataFrame) {
    def orderedShared(cols: Column*): DataFrame =
      graft.ops.Intermediates.shared(df).orderBy(cols: _*)
  }
}
