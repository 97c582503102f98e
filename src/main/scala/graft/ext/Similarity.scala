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
  *   - [[lshTopK]]: approximate — banded sign-LSH (random-hyperplane)
  *     bucketing with OR-amplification: `numBands` independent bands
  *     of `planesPerBand` planes each; a pair is a candidate if it
  *     collides in ANY band (candidate prob for cosine angle θ is
  *     1-(1-p^r)^b with p = 1-θ/π — the standard LSH S-curve). Only
  *     candidates are scored, so the linear scan becomes a
  *     bucket-equi-join. `SimilaritySpec` measures recall against
  *     [[bruteForceTopK]]; q16_lsh_recall reports it per query.
  */
object Similarity {

  val DefaultBands = 16
  val DefaultPlanesPerBand = 4

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

  /** Aggregation-form exact top-k (SURVEY.md §7.3's typed
    * `Aggregator` path): a bounded O(k) buffer accumulates per query,
    * with map-side partial aggregation — the exchange carries
    * `queries × partitions × k` pairs, like the window form but with
    * no sort and usable inside any `agg(...)`. Produces the identical
    * result to [[bruteForceTopK]] (spec-asserted). */
  def bruteForceTopKAgg(corpus: DataFrame, queries: DataFrame, k: Int,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = corpus
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .withColumn("sim", cosine(col("__qv"), col(vecCol)))
    val topk = udaf(new graft.functions.TopKAggregator(k), ExpressionEncoder[(Double, Long)]())
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("sim"), col(idCol)).as("__topk"))
      .select(col("query_id"), posexplode(col("__topk")).as(Seq("__pos", "__pair")))
      .select(col("query_id"),
        col("__pair._2").as("neighbor_id"),
        col("__pair._1").as("sim"),
        (col("__pos") + 1).cast("int").as("rank"))
  }

  /** Array of band-unique bucket longs for one vector column —
    * exploded by callers into the band-join key. Codegen'd single
    * pass (see [[graft.functions.SignLshBuckets]]); `planes` is the
    * seeded flat (numBands*planesPerBand) × dim matrix. */
  private def bandBuckets(v: Column, planes: Array[Array[Float]],
                          numBands: Int, r: Int): Column =
    lshBandBuckets(v, planes, numBands, r)

  /** Approximate top-k via banded sign-LSH. Queries broadcast; the
    * corpus-side band assignment is a projection + explode (numBands
    * rows per corpus row, map-side only — the broadcast join happens
    * before any exchange). Candidate (query, neighbor) pairs are
    * deduped across bands carrying only (ids, sim) — the wide ops
    * never carry vectors. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numBands: Int = DefaultBands, planesPerBand: Int = DefaultPlanesPerBand,
              dim: Int = 64, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, numBands * planesPerBand, seed)
    val c = corpus
      .select(col(idCol), col(vecCol))
      .withColumn("__b", explode(bandBuckets(col(vecCol), planes, numBands, planesPerBand)))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qb", explode(bandBuckets(col("__qv"), planes, numBands, planesPerBand)))
    val scored = c
      .join(broadcast(q),
        c("__b") === q("__qb") && col(idCol) =!= col("query_id"))
      .withColumn("sim", cosine(col("__qv"), col(vecCol)))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("sim"))
      .dropDuplicates("query_id", "neighbor_id") // collapse multi-band hits
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Below this threshold the banded path auto-routes to exact
    * all-pairs: sign-LSH's per-plane collision probability is
    * p(s) = 1 - acos(s)/π, so the gap between a qualifying pair at
    * s = 0.5 (p = 0.667) and a random pair at s = 0 (p = 0.5) is so
    * small that keeping recall ≈ 1 at the boundary while pruning the
    * bulk needs r ≳ 20 rows per band and ~10⁵ bands — more work than
    * scoring every pair. (Measured on the testdata: at threshold 0.4
    * the 64×4 banding admitted ~all pairs 4× over, the round-2
    * bench's slowest query; the exact path is both faster and
    * recall-1 by construction.) */
  val LshMinThreshold = 0.6

  /** Near-duplicate pairs by embedding cosine ≥ threshold. Two
    * strategies, chosen by the threshold:
    *
    *   - `threshold ≥` [[LshMinThreshold]] (the real dedup regime):
    *     banded sign-LSH candidates — band join carries ONLY (bucket,
    *     id), candidates dedup across bands, then vectors join back
    *     for exact-cosine verification. Same-bucket equi-join, never
    *     all-pairs: the only shape that survives 100 TB.
    *   - `threshold <` [[LshMinThreshold]] (or `allPairs = true`):
    *     exact blocked scoring of every (a, b) pair. LSH provably
    *     cannot prune this regime (see [[LshMinThreshold]]); at large
    *     scale a sub-0.6 cosine dedup is inherently ~quadratic and
    *     should run per-IVF-list ([[Ivf.index]] partitions, then this
    *     within each list) rather than corpus-wide. Recall is exactly
    *     1 — the q35 gate is deterministic, not probabilistic.
    */
  /** Sub-quadratic LOW-threshold near-dup via IVF coarse partitioning
    * — the scale path for the regime where sign-LSH provably cannot
    * prune (threshold < [[LshMinThreshold]]; see its scaladoc) and
    * corpus-wide all-pairs is inherently quadratic:
    *
    *   1. assign every vector to its `nProbe` nearest IVF lists
    *      (multi-probe membership; centroids from [[Ivf.train]],
    *      always the broadcast side);
    *   2. candidates = pairs sharing ≥1 list — the all-pairs scoring
    *      runs only WITHIN lists, cost ≈ Σ_list |members|² ≈
    *      N²·nProbe²/k instead of N². With k ~ √N lists this is
    *      O(N^1.5); at 100 TB the members table is written
    *      list_id-partitioned and each list's block never leaves its
    *      executor.
    *   3. exact-cosine verification of candidates (ids-only wide
    *      join, vectors join back after dedup — the q18/q35 shape).
    *
    * Precision is exactly 1 (every emitted pair is exact-verified);
    * recall is the probability a qualifying pair shares ≥1 of its
    * nProbe lists — (k, nProbe) is the recall/cost dial (measured in
    * PERF.md; driver-gated by q45 with an in-plan recall floor). */
  def nearDupPairsIvf(corpus: DataFrame, centroids: DataFrame, threshold: Double,
                      nProbe: Int = 4,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // `member` feeds BOTH sides of the candidate self-join below — as
    // a plain plan the corpus × centroids assignment pass (the
    // expensive scan) would be computed twice (the
    // connectedComponents lesson: self-joined frames must be
    // materialized, not re-planned). Swept at query end.
    val member = graft.ops.Intermediates.shared(corpus
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(centroids))
      .withColumn("__csim", cosine(col("__v"), col("centroid")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__csim").desc, col("list_id"))))
      .filter(col("__rn") <= nProbe)
      .select(col("list_id"), col("__id")))
    val candidates = member.as("a")
      .join(member.as("b"),
        col("a.list_id") === col("b.list_id") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(corpus.select(col(idCol).as("id_a"), col(vecCol).as("__va")), Seq("id_a"))
      .join(corpus.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), Seq("id_b"))
      .withColumn("sim", cosine(col("__va"), col("__vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** SemDeDup-style SEMANTIC deduplication: drop all but one
    * representative of every group of embedding-near-duplicate
    * documents (cosine ≥ threshold, chained transitively — A~B, B~C
    * dedups all three even when cos(A, C) < t, the same chain
    * argument as [[Dedup.connectedComponents]]'s scaladoc).
    *
    * Composition: per-IVF-list candidate pairs ([[nearDupPairsIvf]] —
    * exact-verified, so precision 1) → connected components → keep
    * the min-id member per component; vectors in no component are
    * their own representative. Because the IVF pair set is a SUBSET
    * of the exact ≥ t pair set, IVF components REFINE exact
    * components, and anything this drops the exact dedup drops too
    * (its component min is a genuine ≥ t-chain neighbor with a
    * smaller id) — false drops are impossible by construction; the
    * (k, nProbe) dial trades only recall of drops. Driver-gated by
    * q62 (no_false_drops theorem + recall floor vs the exact
    * components).
    *
    * Scale: candidate volume ~N²·nProbe²/k within lists (the q45
    * analysis), components O(log diameter) rounds over a pair list
    * that is near-dup-sized, not corpus-sized.
    *
    * Output: (idCol, component, kept) — total over the corpus. */
  def semanticDedup(corpus: DataFrame, centroids: DataFrame, threshold: Double,
                    nProbe: Int = 4,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pairs = nearDupPairsIvf(corpus, centroids, threshold, nProbe, idCol, vecCol)
      .select(col("id_a"), col("id_b"))
    val comps = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
    corpus.select(col(idCol))
      .join(comps, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("comp"), col(idCol)).as("component"),
        (col("comp").isNull || col("comp") === col(idCol)).as("kept"))
  }

  def nearDupPairs(embeddings: DataFrame, threshold: Double, allPairs: Boolean = false,
                   numBands: Int = DefaultBands, planesPerBand: Int = DefaultPlanesPerBand,
                   dim: Int = 64, seed: Long = 42L,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    if (allPairs || threshold < LshMinThreshold) {
      val a = embeddings.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
      val b = embeddings.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("sim", cosine(col("__va"), col("__vb")))
        .filter(col("sim") >= threshold)
        .select(col("id_a"), col("id_b"), col("sim"))
    } else {
      val planes = hyperplanes(dim, numBands * planesPerBand, seed)
      // Candidate generation carries (bucket, id) ONLY — vectors never
      // enter the wide self-join (the q18 minhash shape; carrying the
      // arrays through the band join was the round-2 q35 lesson).
      val banded = embeddings
        .select(col(idCol), explode(bandBuckets(col(vecCol), planes, numBands, planesPerBand)).as("__b"))
      val candidates = banded.as("a")
        .join(banded.as("b"),
          col("a.__b") === col("b.__b") && col(s"a.$idCol") < col(s"b.$idCol"))
        .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      candidates
        .join(embeddings.select(col(idCol).as("id_a"), col(vecCol).as("__va")), Seq("id_a"))
        .join(embeddings.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), Seq("id_b"))
        .withColumn("sim", cosine(col("__va"), col("__vb")))
        .filter(col("sim") >= threshold)
        .select(col("id_a"), col("id_b"), col("sim"))
    }
  }

  /** INT8 SCALAR QUANTIZATION — the ANN-serving compression step: a
    * per-vector symmetric scale (max |component|) and
    * q_i = round(v_i / scale · 127) ∈ [-127, 127], a 4× memory cut
    * (8× vs doubles) that typically costs ~1% recall@10. Returns
    * (idCol, `scale` DOUBLE, `q` ARRAY<INT> of int8-range values).
    * The scale is PROJECTED as its own column before the per-element
    * transform reads it — the q113 lesson: Catalyst does not CSE
    * expression trees, and an inlined max-reduction would re-run per
    * element, turning O(dim) into O(dim²). Map-only at any scale. */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), col(vecCol).as("__v"),
        array_max(transform(col(vecCol), x => abs(x.cast("double")))).as("scale"))
      .select(col(idCol), col("scale"),
        transform(col("__v"), x =>
          when(col("scale") === 0d, lit(0))
            .otherwise(round(x.cast("double") / col("scale") * lit(127d), 0))
            .cast("int")).as("q"))

  /** Exact top-k over the INT8-quantized corpus: the integer dot
    * product is exact in any engine (the floats only reappear in the
    * final norm division, from identical integer inputs), so the
    * quantized ranking is fully deterministic — what makes q153's
    * recall a hashable integer rather than a floor-pass. Same
    * broadcast + two-phase top-k shape as [[bruteForceTopK]]. */
  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def withNorm(df: DataFrame): DataFrame =
      df.withColumn("__n2", aggregate(
        zip_with(col("q"), col("q"), (a, b) => (a * b).cast("long")),
        lit(0L), (acc, x) => acc + x))
    val c = withNorm(quantizeInt8(corpus, idCol, vecCol))
    val q = withNorm(quantizeInt8(queries, idCol, vecCol))
      .select(col(idCol).as("query_id"), col("q").as("__qq"), col("__n2").as("__qn2"))
    val dot = aggregate(
      zip_with(col("q"), col("__qq"), (a, b) => (a * b).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val scored = c.join(broadcast(q), col(idCol) =!= col("query_id"))
      .withColumn("sim",
        when(col("__n2") > 0L && col("__qn2") > 0L,
          dot.cast("double") / sqrt((col("__n2") * col("__qn2")).cast("double")))
          .otherwise(lit(-2d))) // zero vector sorts last, never wins
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("sim"))
    val wLocal = Window.partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col("sim").desc, col("neighbor_id"))
    val wGlobal = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("__rl", row_number().over(wLocal)).filter(col("__rl") <= k)
      .withColumn("rank", row_number().over(wGlobal)).filter(col("rank") <= k)
      .drop("__rl")
  }
}
