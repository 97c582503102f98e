package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine

/** Product quantization (PQ) — the memory-compression scale path for
  * embedding search (SURVEY.md §7.5's ANN family, completing
  * sign-LSH ([[Similarity.lshTopK]]) and IVF ([[Ivf]])): split each
  * vector into `m` subvectors, learn a small codebook per subspace
  * (k-means), and store each vector as `m` small code ids. With
  * m = 8, k = 16 a 64-dim float vector (256 B) becomes 8 bytes — at
  * 100 TB of raw embeddings the coded table is ~3 TB and FITS IN
  * CLUSTER MEMORY, which is the whole point: the scan side of ANN
  * stops being IO-bound.
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * un-quantized; per query one computes a distance table
  * d²(q_j, codeword) for every (subspace j, codeword) — m·k cells —
  * and the distance to ANY coded vector is then m table lookups
  * instead of `dim` multiplies. Here the per-query tables are a
  * broadcast map column and the lookup-sum is a codegen'd HOF over
  * the codes array: the corpus never shuffles, exactly like
  * [[Similarity.bruteForceTopK]] but with O(m) per-pair cost.
  *
  * Distances are L2² over UNIT-NORMALIZED vectors, where
  * ‖q−x‖² = 2 − 2·cos(q, x) — so ascending ADC distance is
  * descending approximate cosine and the shortlist ranks like the
  * cosine baselines. Callers normalize with [[Embeddings.unitNorm]]
  * (the search gate does); training on unnormalized input would
  * quantize a different geometry than the one searched.
  *
  * The full pipeline ([[search]]) is shortlist-then-rerank: ADC picks
  * `shortlist` candidates per query, exact cosine on the original
  * vectors re-ranks them, top-k survives — the standard IVF-PQ
  * posture where the compressed scan bounds IO and the exact pass
  * restores precision on a candidate set that is corpus/shortlist
  * smaller.
  *
  * Everything is DataFrame plans: codebooks are always the broadcast
  * side, Lloyd's updates are posexplode + per-coordinate avg hash
  * aggregates (state = m·k·dSub cells, never a collected vector
  * list), and the only driver-side data is the k-row init and the
  * m·k codebook — the same bounded-collect discipline as
  * [[Ivf.train]].
  */
object Pq {

  /** Squared L2 distance between two float-array columns, double-
    * accumulated in index order (deterministic given its inputs). */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** One row per (vector, subspace): (__id, sub_id, __sv) where __sv
    * is the dSub-wide slice of subspace sub_id. The explode is over a
    * literal m-element array — map-only, no shuffle. */
  private def subRows(vecs: DataFrame, m: Int, dSub: Int): DataFrame =
    vecs.select(col("__id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("sub_id"), slice(col("__v"), j * dSub + 1, dSub).as("__sv"))): _*)).as("__s"))
      .select(col("__id"), col("__s.sub_id").as("sub_id"), col("__s.__sv").as("__sv"))

  /** Nearest-codeword assignment per (vector, subspace): broadcast
    * codebook join + `min_by` hash aggregate (no sort exchange —
    * the [[Ivf]] assignment shape), tie-break lowest code_id. */
  private def assign(subs: DataFrame, codebooks: DataFrame): DataFrame =
    subs.join(broadcast(codebooks), Seq("sub_id"))
      .withColumn("__d2", l2sq(col("__sv"), col("codeword")))
      .groupBy(col("__id"), col("sub_id"))
      .agg(min_by(
        struct(col("code_id"), col("__sv")),
        struct(col("__d2"), col("code_id"))).as("__w"))
      .select(col("__id"), col("sub_id"),
        col("__w.code_id").as("code_id"), col("__w.__sv").as("__sv"))

  /** Train `m` codebooks of `k` codewords each with `iters` Lloyd's
    * iterations over L2 (mean-of-coordinates IS the exact Lloyd's
    * update for L2 — no cosine approximation needed at this layer).
    * Returns (sub_id, code_id, codeword: array<float>).
    *
    * Deterministic: init = the first `k` vectors by id, sliced — a
    * bounded k·dim collect, like [[Ivf.train]]. A codeword that loses
    * all members in some iteration drops out of that subspace's
    * codebook (classic empty-cluster shrinkage; encode/search only
    * ever read codebooks, so correctness is unaffected — the
    * effective k for that subspace is smaller). All m subspaces train
    * in the SAME per-iteration corpus pass (subspace is just an
    * aggregation key), so cost is O(iters) corpus scans, not
    * O(m·iters). */
  def train(corpus: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 3,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val dim = vecs.select(size(col("__v"))).as[Int].head()
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dSub = dim / m

    val init = vecs.orderBy(col("__id")).limit(k)
      .select(col("__v")).as[Array[Float]].collect()
    var codebooks = init.toSeq.zipWithIndex.flatMap { case (v, i) =>
      (0 until m).map(j => (j, i + 1, v.slice(j * dSub, (j + 1) * dSub).toSeq))
    }.toDF("sub_id", "code_id", "codeword")

    val subs = subRows(vecs, m, dSub)
    for (_ <- 1 to iters) {
      // localCheckpoint between iterations — without it iteration N
      // chains 1..N-1 as sub-plans (the Ivf.train hygiene).
      val prev = codebooks
      codebooks = assign(subs, codebooks)
        .select(col("sub_id"), col("code_id"), posexplode(col("__sv")).as(Seq("__pos", "__x")))
        .groupBy(col("sub_id"), col("code_id"), col("__pos"))
        .agg(avg(col("__x")).as("__mean"))
        .groupBy(col("sub_id"), col("code_id"))
        .agg(sort_array(collect_list(struct(col("__pos"), col("__mean")))).as("__pm"))
        .select(col("sub_id"), col("code_id"),
          transform(col("__pm"), p => p.getField("__mean").cast("float")).as("codeword"))
        .localCheckpoint()
      // prev's blocks are dead once the new (eager) checkpoint exists
      graft.ops.Intermediates.release(prev)
    }
    codebooks
  }

  /** Encode the corpus: (idCol, codes: array<int>) with codes(j) =
    * nearest codeword id in subspace j. This is the compressed
    * representation — at scale it is the table you persist (and the
    * only thing the ADC scan reads). */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).as[Int].head()
    val subs = subRows(corpus.select(col(idCol).as("__id"), col(vecCol).as("__v")), m, dim / m)
    assign(subs, codebooks)
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("sub_id"), col("code_id")))).as("__sc"))
      .select(col("__id").as(idCol),
        transform(col("__sc"), s => s.getField("code_id")).as("codes"))
  }

  /** ADC shortlist + exact re-rank top-k.
    *
    * `codes`/`corpus`/`queries` must be over the SAME (normalized)
    * vector space as the codebooks. Per query: build the m·k distance
    * table as one broadcast map keyed `sub_id·(k+1) + code_id`; scan
    * the codes table computing `aggregate(m lookups)` per row (no
    * shuffle, whole-stage codegen); keep the `shortlist` smallest by
    * two-phase top-k; re-rank those exactly by cosine on the original
    * vectors; emit (query_id, neighbor_id, sim, rank ≤ k). */
  def search(codes: DataFrame, codebooks: DataFrame, corpus: DataFrame,
             queries: DataFrame, k: Int, shortlist: Int = 50,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = queries.select(size(col(vecCol))).as[Int].head()
    val m = codes.select(size(col("codes"))).as[Int].head()
    val kCap = 1 + codebooks.agg(max(col("code_id"))).as[Int].head()

    // Per-query ADC table: m·k cells folded into one map column.
    val qsubs = subRows(queries.select(col(idCol).as("__id"), col(vecCol).as("__v")), m, dim / m)
    val qdist = qsubs.join(broadcast(codebooks), Seq("sub_id"))
      .withColumn("__d2", l2sq(col("__sv"), col("codeword")))
      .groupBy(col("__id"))
      .agg(map_from_entries(collect_list(
        struct((col("sub_id") * kCap + col("code_id")).as("key"), col("__d2").as("value")))).as("__dmap"))
      .select(col("__id").as("query_id"), col("__dmap"))

    // ADC scan: corpus codes × broadcast query maps; per pair the cost
    // is m map lookups. transform's index lambda recovers sub_id.
    val adc = codes.crossJoin(broadcast(qdist))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("__adc", aggregate(
        transform(col("codes"), (c, i) => element_at(col("__dmap"), i * kCap + c)),
        lit(0.0), (acc, v) => acc + v))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("__adc"))

    // Two-phase shortlist (partition-local then global — the
    // bruteForceTopK shape), ascending distance.
    val wLocal = Window.partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col("__adc"), col("neighbor_id"))
    val wGlobal = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc"), col("neighbor_id"))
    val short = adc
      .withColumn("__rl", row_number().over(wLocal)).filter(col("__rl") <= shortlist)
      .withColumn("__rg", row_number().over(wGlobal)).filter(col("__rg") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))

    // Exact re-rank of the shortlist (queries·shortlist rows —
    // broadcast side) against the original vectors.
    val reranked = short
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))), Seq("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__nv")))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    reranked
      .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }
}
