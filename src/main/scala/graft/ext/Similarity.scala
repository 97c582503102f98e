package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (SURVEY.md §7.5; driver
  * mandate). Two paths:
  *
  *   - [[bruteForceTopK]]: exact — every (query, corpus) pair scored
  *     with the codegen'd cosine. The 100 TB shape: queries are the
  *     small side (broadcast), the corpus never shuffles for scoring,
  *     and top-k selection is two-phase so the final shuffle carries
  *     only `queries × partitions × k` rows, not `queries × corpus`.
  *   - [[lshTopK]]: approximate — sign-LSH (random-hyperplane)
  *     bucketing; only same-bucket pairs are scored. Linear scan
  *     becomes a bucket-equi-join, which is the standard
  *     shuffle-bounded ANN layout at scale. Recall is tunable via
  *     number of planes (specs measure it against brute force).
  */
object Similarity {

  /** Exact top-k neighbors per query vector.
    *
    * @param corpus  (idCol, vecCol) — the big side; scored in place
    * @param queries (idCol, vecCol) — the small side; broadcast
    * @param k       neighbors per query
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = corpus
      .join(broadcast(q), col(idCol) =!= col("query_id")) // self-match excluded
      .withColumn("sim", cosine(col("__qv"), col(vecCol)))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("sim"))

    // Phase 1: top-k within each scan partition (no shuffle yet);
    // Phase 2: top-k of the per-partition winners (tiny shuffle).
    val wLocal = Window.partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col("sim").desc, col("neighbor_id"))
    val wGlobal = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("__rl", row_number().over(wLocal)).filter(col("__rl") <= k)
      .withColumn("rank", row_number().over(wGlobal)).filter(col("rank") <= k)
      .drop("__rl")
  }

  /** Approximate top-k: score only pairs sharing an LSH bucket.
    * `numPlanes` trades recall for candidate count (each extra plane
    * halves the expected bucket size). Queries are broadcast; the
    * corpus-side bucket assignment is a projection, so the only wide
    * operation is the final per-query top-k. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int = 8,
              dim: Int = 64, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, numPlanes, seed)
    val c = corpus.withColumn("__bucket", lshBucket(col(vecCol), planes))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__bucket", lshBucket(col("__qv"), planes))
    val scored = c
      .join(broadcast(q), c("__bucket") === q("__bucket") && col(idCol) =!= col("query_id"))
      .withColumn("sim", cosine(col("__qv"), col(vecCol)))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold. Exact
    * variant scores all i<j pairs (quadratic — small corpora or
    * within-bucket use); `viaLsh` restricts to same-bucket pairs
    * first (the scale path). */
  def nearDupPairs(embeddings: DataFrame, threshold: Double, viaLsh: Boolean = false,
                   numPlanes: Int = 8, dim: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = if (viaLsh) {
      val planes = hyperplanes(dim, numPlanes)
      embeddings.withColumn("__bucket", lshBucket(col(vecCol), planes))
    } else embeddings.withColumn("__bucket", lit(0))
    val a = base.select(col("__bucket"), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = base.select(col("__bucket"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("__va"), col("__vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
