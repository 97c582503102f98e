package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * coarse-quantizer alternative to sign-LSH (SURVEY.md §7.5; the
  * driver mandate names "IVF or LSH-bucketed" as the scale path, this
  * library ships both):
  *
  *   1. train: k centroids by Lloyd's iterations, expressed as
  *      DataFrame plans — centroids are always the broadcast side, the
  *      corpus never shuffles during assignment; each iteration is one
  *      broadcast-join + one hash aggregate. Init is the first k
  *      vectors by id (deterministic — reproducibility is a gate
  *      contract, see SparkEntry scaladoc).
  *   2. index: one pass assigns every corpus vector to its nearest
  *      centroid (a projection; at 100 TB this materializes as a
  *      `list_id`-partitioned table).
  *   3. search: each query probes its `nProbe` nearest centroids and
  *      scores only those lists — candidate volume is corpus/k ×
  *      nProbe instead of the full corpus.
  *
  * Centroids use mean-of-coordinates (cosine against unnormalized
  * means is fine for ranking lists), computed as posexplode +
  * per-(list, coordinate) avg — a plain hash aggregate whose state is
  * k·dim cells, never a collected vector list (an unbounded per-group
  * collect is exactly the scale-killer this library bans).
  */
object Ivf {

  /** Train `k` centroids with `iters` Lloyd's iterations. Returns
    * (list_id, centroid: array<float>). Deterministic: seeded by the
    * first-k-by-id init. Driver holds only k·dim floats. */
  def train(corpus: DataFrame, k: Int, iters: Int = 5,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))

    // Init: first k vectors by id, numbered on the driver. The k-row
    // collect is bounded (k·dim floats) and avoids the alternative —
    // row_number() over a partitionless global Window, the
    // single-partition pattern this codebase bans.
    val init = vecs.orderBy(col("__id")).limit(k)
      .select(col("__v")).as[Array[Float]].collect()
    var centroids = init.toSeq.zipWithIndex
      .map { case (v, i) => (i + 1, v.toSeq) }
      .toDF("list_id", "centroid")

    for (_ <- 1 to iters) {
      val assigned = assign(vecs, centroids, "__v")
      // localCheckpoint (eager, k rows) truncates the plan between
      // iterations: without it iteration N's centroids DataFrame
      // chains iterations 1..N-1 as sub-plans, so one evaluation
      // re-scans the corpus O(iters²/2) times instead of O(iters) —
      // the same iterative-plan hygiene as Dedup.connectedComponents.
      val prev = centroids
      centroids = assigned
        .select(col("list_id"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy(col("list_id"), col("__pos"))
        .agg(avg(col("__x")).as("__mean"))
        .groupBy(col("list_id"))
        .agg(sort_array(collect_list(struct(col("__pos"), col("__mean")))).as("__pm"))
        .select(col("list_id"),
          transform(col("__pm"), p => p.getField("__mean").cast("float")).as("centroid"))
        .localCheckpoint()
      // prev's blocks are dead once the new (eager) checkpoint exists;
      // no-op on iteration 1's un-checkpointed seed frame.
      graft.ops.Intermediates.release(prev)
    }
    centroids
  }

  /** Nearest-centroid assignment: broadcast the centroids, score with
    * the codegen cosine, keep rank-1 per vector — as a `min_by` hash
    * aggregate over the order key (−sim, list_id), NOT a window: the
    * window form sorts k rows per vector inside a sort exchange,
    * while the aggregate keeps one candidate per vector map-side and
    * shuffles exactly one row per vector with no sort (same
    * tie-break: highest sim, then lowest list id). */
  private def assign(vecs: DataFrame, centroids: DataFrame, vc: String): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("__sim", cosine(col(vc), col("centroid")))
      .groupBy(col("__id"))
      .agg(min_by(
        struct(col("list_id"), col(vc).as("__v")),
        struct((-col("__sim")).as("__negsim"), col("list_id"))).as("__w"))
      .select(col("__id"), col("__w.list_id").as("list_id"), col("__w.__v").as(vc))

  /** Build the inverted index: (list_id, vec_id, embedding). */
  def index(corpus: DataFrame, centroids: DataFrame,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(corpus.select(col(idCol).as("__id"), col(vecCol).as("__v")), centroids, "__v")
      .select(col("list_id"), col("__id").as(idCol), col("__v").as(vecCol))

  /** Approximate top-k: each query scores only the vectors in its
    * `nProbe` nearest centroid lists. Queries (and their probed list
    * ids) broadcast; the index side is a partition-local hash-join
    * probe. */
  def search(index: DataFrame, centroids: DataFrame, queries: DataFrame,
             k: Int, nProbe: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("__csim").desc, col("list_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__csim", cosine(col("__qv"), col("centroid")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("__qv"), col("list_id"))

    val scored = index
      .join(broadcast(probes), Seq("list_id"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("sim", cosine(col("__qv"), col(vecCol)))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
