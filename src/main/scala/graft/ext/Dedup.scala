package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication for LLM-training-data pipelines (driver
  * mandate; SURVEY.md §7.5): exact content-hash dedup and
  * minhash-banded near-duplicate detection over a text column.
  *
  * Everything is built-in Catalyst expressions (regexp/HOF/xxhash64)
  * — no UDFs, so every stage stays inside whole-stage codegen.
  *
  * Scale posture (100 TB):
  *   - exact dedup is one hash aggregate on a 64-char digest — map-side
  *     combine collapses most duplicates before the shuffle;
  *   - near-dup candidates come from a band equi-join carrying ONLY
  *     (band, bucket, id) — shingle arrays never enter the wide join;
  *     verification joins the small candidate set back to the corpus.
  *     There is no all-pairs path for text at all.
  */
object Dedup {

  /** Whitespace/case normalization before hashing or shingling:
    * lower, trim, collapse runs of whitespace. */
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** sha2-256 of the normalized content — the exact-dedup key. */
  def contentHash(text: Column): Column = sha2(normalized(text), 256)

  /** Exact dedup: one surviving row per distinct normalized content;
    * the winner is the row with the smallest `idCol` (deterministic).
    * Aggregation form (`min_by` over the packed row) rather than a
    * window so the shuffle carries one partial row per (partition,
    * hash), not every duplicate. */
  def exactDedup(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val cols = docs.columns.toSeq
    docs
      .withColumn("__h", contentHash(col(textCol)))
      .groupBy(col("__h"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__row"))
      .select((cols.map(c => col(s"__row.$c").as(c)) :+ col("__h").as("content_hash")): _*)
  }

  /** C4-style SEGMENT-level corpus dedup — the sub-document form of
    * [[exactDedup]]: the normalized text splits into consecutive
    * non-overlapping `segTokens`-token segments ("lines"/"paragraphs"
    * in a corpus that has them), every occurrence of a segment AFTER
    * its first — globally, by (idCol, position) order, including
    * repeats inside one document — is dropped, and each document
    * reassembles from its surviving segments in order. This is the
    * C4/CCNet "remove duplicated lines across the corpus" cleaning
    * step: boilerplate (headers, footers, navigation) disappears from
    * every copy but one while unique prose survives.
    *
    * Output: (idCol, n_segs, n_kept, text) — `text` is the
    * reassembled document (empty string when every segment was a
    * duplicate). Scale shape: one segment-hash-keyed exchange for the
    * first-occurrence rank (the q17 class) and one idCol-keyed
    * exchange to reassemble; segments move as ids+text once each. */
  def dedupSegments(docs: DataFrame, segTokens: Int,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    val k = segTokens
    val toks = split(normalized(col(textCol)), " ")
    // Shared: the segment frame feeds BOTH the per-segment keep window
    // and the per-doc total count — without the persist the
    // normalize→tokenize→segment Generate runs twice (r20, the q73
    // gram-frame argument; guide §1.2 step 2).
    val segs = graft.ops.Intermediates.shared(docs
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), ((size(toks) - 1) / lit(k)).cast("int")),
        i => array_join(slice(toks, i * k + 1, lit(k)), " ")))
        .as(Seq("seg_idx", "seg"))))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("seg"))
      .orderBy(col(idCol), col("seg_idx"))
    val kept = segs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          struct(col("seg_idx"), col("seg")))), s => s.getField("seg")), " ")
          .as("text"))
    segs.groupBy(col(idCol)).agg(count(lit(1)).as("n_segs"))
      .join(kept, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** Distinct word `n`-gram shingles of the normalized text. Documents
    * shorter than `n` tokens yield an empty set (they cannot
    * participate in shingle-based near-dup).
    *
    * Construction note (perf, load-bearing): the token array is only
    * ever an ARGUMENT of array functions (`zip_with`/`slice`), never
    * referenced inside a per-element lambda. A lambda-body reference
    * (`get(toks, i+j)`) re-evaluates the whole
    * `split(regexp_replace(...))` subtree PER ELEMENT — the round-2
    * bench measured that as minutes per 5k docs once an optimizer
    * inline put it inside another lambda. `zip_with` evaluates each
    * input array once and then iterates. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromToks(split(normalized(text), " "), n)

  /** [[shingles]] over an already-materialized token-array column.
    * Prefer this in corpus pipelines: the shingle construction
    * references its token array ~n+2 times, so handing it an INLINE
    * `split(regexp_replace(...))` tree re-runs the tokenizer that many
    * times per row (measured 3.7 s → 0.9 s on q52 at sf0.1); an
    * attribute reference is free. */
  def shinglesFromToks(toks: Column, n: Int = 3): Column = {
    // shingle_i = toks[i] ⧺ toks[i+1] ⧺ … built by zipping shifted
    // copies; zip_with pads the shorter side with null and concat
    // propagates it, so trailing partial shingles become null.
    val zipped = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), size(toks)), (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) >= n, array_distinct(filter(zipped, x => x.isNotNull)))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard over two shingle-set columns (the verification
    * predicate; integer set sizes, so the double division is exact and
    * engine-portable). */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))

  /** Per-seed minhash permutation hash — THE hash whose min over a
    * doc's shingle hashes is signature slot `seed`. Factored so the
    * batch aggregate form (`min(permHash(h, lit(s)))`) and the
    * streaming HOF form (`array_min(transform(hs, h => permHash(h,
    * s)))`) provably apply the same function with the same seed
    * type (int) — a seed- or type-drift between the two would
    * silently desynchronize stream and batch candidacy. */
  def permHash(shingleHash: Column, seed: Column): Column =
    xxhash64(shingleHash, seed)

  /** Band-bucket combiner shared by the batch band join
    * ([[nearDupText]]) and the streaming candidate operator
    * (`StreamingIngest.nearDupCandidates`): bucket of band `b` =
    * xxhash64(b, sig[b·r], …, sig[b·r+r-1]). `sigAt` adapts the two
    * signature layouts (named `__m<i>` columns vs one array column);
    * the band structure itself has exactly one definition. Returns
    * an array of (band, bucket) structs, one per band. */
  def bandBuckets(numBands: Int, r: Int)(sigAt: Int => Column): Column =
    array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((lit(b) +: (b * r until (b + 1) * r).map(sigAt)): _*).as("bucket"))
    }: _*)

  /** Minhash signatures as an explode + hash-aggregate plan: one row
    * per (doc, shingle-hash), then `numPerm` `min(xxhash64(h, seed))`
    * aggregates. This is the scalable minhash shape — everything is
    * codegen'd builtins; partial aggregation collapses each partition
    * to one row per doc before the shuffle, and no HOF lambda ever
    * re-evaluates an expensive subtree (minhash-inside-transform
    * re-evaluated the shingle construction once PER SEED after
    * optimizer inlining — the round-2 bench hang).
    *
    * Output: (__id, __m0 … __m{numPerm-1}).
    */
  def minhashSignatures(sh: DataFrame, numPerm: Int,
                        idCol: String = "__id", shCol: String = "__sh"): DataFrame = {
    val hashed = sh
      .select(col(idCol), explode(col(shCol)).as("__t"))
      .select(col(idCol), xxhash64(col("__t")).as("__h"))
    val aggs = (0 until numPerm).map(s => min(permHash(col("__h"), lit(s))).as(s"__m$s"))
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Connected components over a near-duplicate pair list — the
    * clustering step of a real dedup pipeline: pairs chain (A~B, B~C)
    * into groups, and one representative (the min id = the component
    * label) survives per group. Pair-wise dropping alone can't see
    * chains; components can.
    *
    * Algorithm: min-label propagation with pointer-jumping, as
    * DataFrame plans. Each iteration is (1) a neighbor-min step —
    * join + hash-aggregate, comp(v) := min(comp(v), min over
    * neighbors of comp(n)) — then (2) a path-compression step,
    * comp(v) := comp(comp(v)) (comp(v) is always the id of a node in
    * v's component, so the hop stays inside the component and is
    * monotone non-increasing). Plain propagation needs
    * diameter-many rounds — a 1000-link chain would need 1000 —
    * while the pointer jump doubles the propagation horizon each
    * round, so convergence is O(log diameter): maxIters = 20 covers
    * diameters up to ~2^20 regardless of shape. `localCheckpoint()`
    * per iteration truncates lineage (standard iterative-plan
    * hygiene); a convergence count stops early (near-dup clusters
    * are shallow — 2-3 rounds in practice).
    *
    * If the loop still hits `maxIters` without converging it THROWS
    * rather than returning partially-propagated labels (wrong answers
    * must be loud — round-3 advisory).
    *
    * Input: (aCol, bCol) edge list. Output: (id, comp) for every id
    * appearing in an edge, comp = min id of its component. */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
                          maxIters: Int = 20): DataFrame = {
    // Materialize the edge list ONCE — without this every iteration's
    // join AND convergence count would re-evaluate the upstream pair
    // computation (e.g. the whole minhash pipeline): measured 8.7 s →
    // 4.0 s at sf0.1 for the q44 clustering (the remainder is the
    // one-shot pair computation itself plus per-iteration job cost).
    val edges = pairs.select(col(aCol).as("__src"), col(bCol).as("__dst"))
      .unionByName(pairs.select(col(bCol).as("__src"), col(aCol).as("__dst")))
      .localCheckpoint()
    var labels = edges.select(col("__src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val nbr = edges
        .join(labels.select(col("id").as("__dst"), col("comp").as("__c")), Seq("__dst"))
        .groupBy(col("__src").as("id"))
        .agg(min(col("__c")).as("__nc"))
      // Materialized: the pointer-jump self-join below references this
      // plan twice, and exchange reuse dedups only the shuffle, not
      // the join+aggregate work above it.
      val stepped = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("__nc"), col("comp"))).as("comp"))
        .localCheckpoint()
      // Pointer jump: comp(v) := comp(comp(v)). comp(v) is always an
      // id present in `labels` (it starts as v's own id and only ever
      // takes other nodes' ids), so the self-join always matches; the
      // coalesce is defensive only.
      val next = stepped.as("l")
        .join(stepped.select(col("id").as("__cid"), col("comp").as("__cc")).as("p"),
          col("l.comp") === col("__cid"), "left")
        .select(col("l.id").as("id"),
          coalesce(col("__cc"), col("l.comp")).as("comp"))
        .localCheckpoint()
      // `next` is eagerly materialized, so `stepped`'s blocks are dead
      // the moment it exists; the old labels die once the convergence
      // count below has read them. Without these releases a bench
      // session accumulates ~3 checkpoint RDDs per iteration per
      // evaluation (the round-6 storage-pressure finding).
      graft.ops.Intermediates.release(stepped)
      changed = next.join(labels.select(col("id"), col("comp").as("__old")), Seq("id"))
        .filter(col("comp") =!= col("__old")).count()
      graft.ops.Intermediates.release(labels)
      labels = next
      i += 1
    }
    graft.ops.Intermediates.release(edges) // loop-only; returned labels never re-read it
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIters=$maxIters " +
        s"($changed labels still changing) — raise maxIters; labels would be " +
        "partially propagated and silently wrong")
    labels
  }

  /** Near-duplicate pairs by word-shingle Jaccard ≥ `threshold`.
    *
    * Pipeline: shingle → minhash signatures (explode + min-aggregates)
    * → per-band bucket = xxhash64 of that band's `r` signature slots →
    * band equi-join on (band, bucket) producing candidate id pairs
    * (id-only — no payloads in the wide join) → dedup across bands →
    * join back to the corpus for shingle sets → exact-Jaccard
    * verification.
    *
    * Band parameters default to b=16, r=4 (64 permutations): candidate
    * probability ≈ 1 for j ≥ 0.9, ≈ 0.97 at j = 0.8, falling fast
    * below — sized for `threshold` ≥ ~0.7.
    */
  /** (__id, __sh) distinct-shingle frame for a document set — tokens
    * staged as a named column so the shingle construction's ~n+2
    * references hit an attribute, not a re-run tokenizer. Shared by
    * the intra-corpus and incremental near-dup paths. */
  private[ext] def shingleFrame(docs: DataFrame, shingleN: Int,
                                textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("__id"), split(normalized(col(textCol)), " ").as("__toks"))
      .select(col("__id"), shinglesFromToks(col("__toks"), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)

  /** (__id, __b=(band,bucket)) exploded band-bucket frame over a
    * shingle frame — the band join's probe/build rows. */
  private[ext] def bandedFrame(sh: DataFrame, numBands: Int, r: Int): DataFrame =
    minhashSignatures(sh, numBands * r)
      .select(col("__id"), explode(bandBuckets(numBands, r)(s => col(s"__m$s"))).as("__b"))

  /** The shareable shingle pass: (__id, __sh) with one row per doc
    * that has ≥ 1 shingle. EVERY shingle-consuming operator has a
    * `...FromShingles` variant taking this frame, so a session that
    * runs several of them (near-dup, exact Jaccard join, incremental
    * near-dup, contamination) tokenizes and shingles the corpus ONCE
    * — cache it (S8) or persist it; at 100 TB this frame is the
    * artifact you materialize next to the corpus, not recompute per
    * job. The same cross-consumer argument as [[shinglesFromToks]],
    * one level up. */
  def shingled(docs: DataFrame, shingleN: Int = 3,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    shingleFrame(docs, shingleN, textCol, idCol)

  def nearDupText(docs: DataFrame, threshold: Double = 0.7,
                  shingleN: Int = 3, numBands: Int = 16, r: Int = 4,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    nearDupTextFromShingles(shingleFrame(docs, shingleN, textCol, idCol),
      threshold, numBands, r)

  /** [[nearDupText]] over a pre-shingled frame (see [[shingled]]). */
  def nearDupTextFromShingles(sh: DataFrame, threshold: Double = 0.7,
                              numBands: Int = 16, r: Int = 4): DataFrame = {
    val banded = bandedFrame(sh, numBands, r)
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.__b") === col("b.__b") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("__sha")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("__shb")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Sized gram rows: (__id, __sz, __g) — one row per (doc, distinct
    * gram), carrying the doc's gram-set size. The shared input of
    * both exact-join variants. */
  /** Count-based Jaccard from pair intersection counts: rows are
    * (id_a, id_b, __sza, __szb, __inter); J = ∩ / (|A|+|B|−∩) —
    * a ratio of integers, exact in double, no array ops anywhere. */
  private def jaccardFromCounts(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("jaccard", col("__inter").cast("double") /
        (col("__sza") + col("__szb") - col("__inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** EXACT n-gram Jaccard similarity join: every pair with
    * J(A, B) ≥ threshold — no probabilistic step, unlike
    * [[nearDupText]], whose banding misses a qualifying pair with
    * probability (1-(1-j^r))^b > 0 near the threshold. This is the
    * operator to reach for when the threshold is too low for LSH
    * banding to prune (sign-LSH can't prune jaccard < ~0.6 usefully)
    * or when the answer must be provably complete (dedup audits,
    * gate oracles).
    *
    * Shape: an inverted-index PAIR COUNT. Explode distinct grams,
    * self-join on the gram (size filter min ≥ t·max inline — a
    * necessary condition, since |A∩B| ≤ min and |A∪B| ≥ max), and
    * hash-aggregate the matches per pair: the count IS |A∩B|, and
    * J = ∩ / (|A|+|B|−∩) exactly. No shingle array ever crosses a
    * join and no array intersection is ever computed — the first cut
    * verified candidates with `array_intersect` over ~50-string
    * arrays and spent 17 of its 21 s there.
    *
    * Cost: Σ_g df(g)² pair events. Fine whenever no gram is shared
    * by a large fraction of the corpus (this corpus: max df 25 on
    * 5 k docs → 1.3 M events); real web text has STOP-GRAMS whose
    * df² explodes — that regime is [[jaccardJoinPrefix]], which
    * bounds candidate generation to each doc's rarest grams. At
    * 100 TB also hash grams to longs first (xxhash64) — same plan,
    * 8-byte keys — accepting a 2⁻⁶⁴-per-gram-pair collision risk;
    * the string-keyed form here keeps the oracle-equality exact.
    *
    * Output: (id_a, id_b, jaccard), id_a < id_b. */
  def jaccardJoinExact(docs: DataFrame, threshold: Double = 0.5,
                       shingleN: Int = 3,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    jaccardJoinExactFromShingles(shingleFrame(docs, shingleN, textCol, idCol), threshold)

  /** UNPRUNED inverted-index pair counts over a pre-shingled frame —
    * the shared expensive pass of the exact-similarity join family.
    * Output: (id_a, id_b, __sza, __szb, __inter), id_a < id_b, one
    * row per unordered pair sharing ≥ 1 gram. Feed it to
    * [[jaccardJoinExactFromPairCounts]] and/or
    * [[containmentJoinFromPairCounts]]: both metrics are pure
    * per-row arithmetic over these counts, so a caller running
    * several similarity joins over ONE corpus (the q59+q96 pairing)
    * caches this frame once and pays the Σ df² join once. */
  def pairCounts(sh: DataFrame): DataFrame = gramPairCounts(sh, prune = None)

  /** Shared inverted-index PAIR COUNT core of the exact-similarity
    * joins: explode grams (materialized once — feeds both self-join
    * sides; swept at query end), self-join on the gram under an
    * optional extra pruning predicate over the aliased sides, and
    * hash-aggregate the matches per pair. Output: (id_a, id_b, __sza,
    * __szb, __inter) with id_a < id_b — the 100 TB changes documented
    * on the callers (xxhash64 gram keys, stop-gram mitigations)
    * belong HERE, once. */
  private def gramPairCounts(sh: DataFrame,
                             prune: Option[org.apache.spark.sql.Column]): DataFrame = {
    val grams = graft.ops.Intermediates.shared(sh
      .select(col("__id"), size(col("__sh")).as("__sz"), explode(col("__sh")).as("__g")))
    val base = col("a.__g") === col("b.__g") && col("a.__id") < col("b.__id")
    grams.as("a")
      .join(grams.as("b"), prune.map(base && _).getOrElse(base))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__sz").as("__sza"), col("b.__sz").as("__szb"))
      .agg(count(lit(1)).as("__inter"))
  }

  /** [[jaccardJoinExact]] over a pre-shingled frame (see [[shingled]]). */
  def jaccardJoinExactFromShingles(sh: DataFrame, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    // inline size prune: necessary for J ≥ t, since |A∩B| ≤ min and
    // |A∪B| ≥ max
    jaccardFromCounts(gramPairCounts(sh, Some(
      least(col("a.__sz"), col("b.__sz")).cast("double") >=
        greatest(col("a.__sz"), col("b.__sz")) * threshold)), threshold)
  }

  /** [[jaccardJoinExact]] over an UNPRUNED [[pairCounts]] frame. The
    * size prune is a NECESSARY condition on (|A|, |B|) alone, so
    * re-applying it as a post-filter on the aggregated pair frame
    * keeps the answer identical to the inline-pruned form (a
    * ExtSpec theorem) — the point is sharing: when the unpruned
    * frame is already being paid for (a containment join over the
    * same corpus), this form adds only per-row arithmetic. */
  def jaccardJoinExactFromPairCounts(pairs: DataFrame, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    jaccardFromCounts(pairs.filter(
      least(col("__sza"), col("__szb")).cast("double") >=
        greatest(col("__sza"), col("__szb")) * threshold), threshold)
  }

  /** EXACT n-gram CONTAINMENT join: every DIRECTED pair with
    * C(A→B) = |A∩B| / |A| ≥ threshold — the near-SUBSET detector.
    * Jaccard structurally misses embedded duplication: a document
    * quoted whole inside one 4× its size has J ≤ 0.25 no matter the
    * threshold, while its containment is ~1. This is the metric for
    * "this doc is mostly a copy of part of that one" — licensing
    * boilerplate, quoted articles, chunk-of-a-document training leaks.
    *
    * Shape: the [[jaccardJoinExact]] inverted-index pair count,
    * MINUS its size-ratio prune (Jaccard-specific — containment
    * deliberately admits arbitrarily unequal sizes), PLUS an unpivot:
    * each unordered pair's single intersection count is tested in
    * both directions against the contained side's own size. Same
    * Σ df² cost model and the same stop-gram caveat (pair with
    * prefix-filter-style pruning at 100 TB; here the unpruned form
    * keeps oracle equality a theorem).
    *
    * Output: (contained_id, container_id, containment), one row per
    * qualifying DIRECTION (a near-identical pair emits both). */
  def containmentJoinFromShingles(sh: DataFrame, threshold: Double = 0.8): DataFrame =
    // no prune: containment deliberately admits unequal sizes, and no
    // pair-level size prune exists (one direction is always feasible)
    containmentJoinFromPairCounts(gramPairCounts(sh, prune = None), threshold)

  /** [[containmentJoinFromShingles]] over a [[pairCounts]] frame the
    * caller already has — per-row arithmetic only, so several
    * similarity joins over one corpus share one Σ df² pass. */
  def containmentJoinFromPairCounts(pairs: DataFrame, threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    pairs.select(col("id_a").as("contained_id"), col("id_b").as("container_id"),
        col("__sza").as("__csz"), col("__inter"))
      .unionByName(pairs.select(col("id_b").as("contained_id"), col("id_a").as("container_id"),
        col("__szb").as("__csz"), col("__inter")))
      .withColumn("containment", col("__inter").cast("double") / col("__csz").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("contained_id"), col("container_id"), col("containment"))
  }

  /** [[jaccardJoinExact]] for STOP-GRAM corpora: same exact answer,
    * but candidate generation touches only each document's rarest
    * grams — PREFIX FILTERING (the AllPairs/PPJoin family).
    *
    * Under one global total order on grams, sort each document's
    * gram set and index only its first p(x) = |x| - ⌈t·|x|⌉ + 1
    * grams. Any qualifying pair shares a gram in BOTH prefixes: let
    * g be the order-smallest common gram; the grams of x strictly
    * before g are all non-shared, and there are at most
    * |x| - |A∩B| ≤ |x| - ⌈t·|x|⌉ of them (J ≥ t forces
    * |A∩B| ≥ t·max(|A|,|B|) ≥ t·|x|), so g sits within the first
    * p(x) grams of each side — the prefix equi-join loses nothing.
    * The global order is rarest-first (df asc, gram asc), so
    * prefixes hold each document's LEAST common grams and corpus-
    * wide stop-grams never generate candidates — Σ df² over prefix
    * grams stays bounded where [[jaccardJoinExact]]'s full-gram form
    * explodes. Verification then counts the full intersection for
    * candidate pairs only (two joins over gram rows — still no
    * array ops).
    *
    * Output: (id_a, id_b, jaccard), id_a < id_b. */
  def jaccardJoinPrefix(docs: DataFrame, threshold: Double = 0.5,
                        shingleN: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    jaccardJoinPrefixFromShingles(shingleFrame(docs, shingleN, textCol, idCol), threshold)

  /** [[jaccardJoinPrefix]] over a pre-shingled frame (see
    * [[shingled]]) — e.g. the one cached corpus shingle pass that
    * also feeds the exact variant (the q59 gated-equality pairing). */
  def jaccardJoinPrefixFromShingles(sh: DataFrame, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    val grams = graft.ops.Intermediates.shared(sh
      .select(col("__id"), size(col("__sh")).as("__sz"), explode(col("__sh")).as("__g"))
    ) // feeds df, prefix, and both verify joins; swept at query end
    val dfreq = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__df"), col("__g"))
    // prefix feeds BOTH sides of the candidate self-join — as a plain
    // plan the df agg + rank window would run twice (the self-join/
    // recompute class).
    val prefix = graft.ops.Intermediates.shared(grams.join(dfreq, Seq("__g"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__sz") - ceil(col("__sz") * threshold) + 1)
      .select(col("__id"), col("__sz"), col("__g")))
    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.__g") === col("b.__g") && col("a.__id") < col("b.__id") &&
          least(col("a.__sz"), col("b.__sz")).cast("double") >=
            greatest(col("a.__sz"), col("b.__sz")) * threshold)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__sz").as("__sza"), col("b.__sz").as("__szb"))
      .dropDuplicates("id_a", "id_b")
    val pairs = candidates
      .join(grams.select(col("__id").as("id_a"), col("__g")), Seq("id_a"))
      .join(grams.select(col("__id").as("id_b"), col("__g")), Seq("id_b", "__g"))
      .groupBy(col("id_a"), col("id_b"), col("__sza"), col("__szb"))
      .agg(count(lit(1)).as("__inter"))
    jaccardFromCounts(pairs, threshold)
  }

  /** INCREMENTAL near-dup: new batch vs existing corpus — the
    * daily-ingest shape. [[nearDupText]] answers "which pairs inside
    * THIS corpus are near-dups"; continuous ingest needs "which of
    * today's documents near-duplicate anything already ingested"
    * WITHOUT re-banding the corpus per batch.
    *
    * Same hash chain as the batch band join ([[minhashSignatures]] +
    * [[bandBuckets]]), but candidates come from a band equi-join
    * BETWEEN the new batch's buckets and the corpus's buckets — cost
    * ∝ |new| · collision rate, never corpus². At 100 TB the corpus
    * banded frame is the persistent index: write it bucketed on
    * `__b` ([[graft.ops.Layout.writeBucketed]]'s shape) and each
    * day's join is shuffle-free on the corpus side; the new batch's
    * banded rows (small) broadcast. Verification is exact Jaccard on
    * the candidate pairs only, so precision is exactly 1 regardless
    * of banding.
    *
    * Output: (new_id, corpus_id, jaccard) for every cross pair with
    * jaccard ≥ threshold.
    *
    * Preconditions / lifetime notes:
    *   - ids must be DISJOINT between `newDocs` and `corpus`: an id
    *     present on both sides yields a (id, id, 1.0) self-pair —
    *     meaningless for the daily-ingest contract this models, where
    *     "new" means not-yet-ingested. Callers re-processing a batch
    *     should anti-join it out of `corpus` first.
    *   - the two shingle frames are persisted via
    *     [[graft.ops.Intermediates.shared]] (they each feed the band
    *     join AND the verification join); their blocks are freed at
    *     the harness's next `Intermediates.sweep` — long-lived
    *     services embedding the library should sweep at their own
    *     request boundaries. */
  def nearDupTextAgainst(newDocs: DataFrame, corpus: DataFrame, threshold: Double = 0.7,
                         shingleN: Int = 3, numBands: Int = 16, r: Int = 4,
                         textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    nearDupTextAgainstFromShingles(
      shingleFrame(newDocs, shingleN, textCol, idCol),
      shingleFrame(corpus, shingleN, textCol, idCol),
      threshold, numBands, r)

  /** [[nearDupTextAgainst]] over pre-shingled frames (see
    * [[shingled]]) — e.g. two filters of ONE cached corpus pass. */
  def nearDupTextAgainstFromShingles(newShingles: DataFrame, corpusShingles: DataFrame,
                                     threshold: Double = 0.7,
                                     numBands: Int = 16, r: Int = 4): DataFrame = {
    // Each shingle frame feeds its banded frame AND the verification
    // join — materialize once (the self-join/recompute class) instead
    // of re-running tokenize+shingle per consumer.
    val newSh = graft.ops.Intermediates.shared(newShingles)
    val corpusSh = graft.ops.Intermediates.shared(corpusShingles)
    val candidates = bandedFrame(newSh, numBands, r).as("a")
      .join(bandedFrame(corpusSh, numBands, r).as("b"), col("a.__b") === col("b.__b"))
      .select(col("a.__id").as("new_id"), col("b.__id").as("corpus_id"))
      .dropDuplicates("new_id", "corpus_id")
    candidates
      .join(newSh.select(col("__id").as("new_id"), col("__sh").as("__sha")), Seq("new_id"))
      .join(corpusSh.select(col("__id").as("corpus_id"), col("__sh").as("__shb")), Seq("corpus_id"))
      .withColumn("jaccard", jaccard(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
  }

  /** Train/eval CONTAMINATION check — the n-gram-overlap test every
    * LLM eval pipeline runs before trusting a benchmark number: an
    * eval document is contaminated if any of its word `shingleN`-grams
    * appears anywhere in the training corpus.
    *
    * Shape: distinct corpus grams (one hash-aggregate — the gram set
    * is the reusable artifact; at 100 TB persist it bucketed on the
    * gram and reuse across eval suites) inner-joined by the eval
    * docs' exploded grams, counted per doc, then left-joined back so
    * uncontaminated and too-short eval docs report 0. Grams join as
    * strings here for oracle parity; at scale hash them to longs
    * first (xxhash64) — same plan, 8-byte keys.
    *
    * Output: (doc_id, n_shared, contaminated) — n_shared = how many
    * of the eval doc's distinct grams occur in the corpus. */
  def contaminationReport(evalDocs: DataFrame, corpus: DataFrame, shingleN: Int = 3,
                          textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    contaminationReportFromShingles(
      evalDocs.select(col(idCol)),
      shingleFrame(evalDocs, shingleN, textCol, idCol),
      shingleFrame(corpus, shingleN, textCol, idCol), idCol)

  /** [[contaminationReport]] over pre-shingled frames (see
    * [[shingled]]). `evalIds` must hold EVERY eval doc id — shingle
    * frames drop sub-`shingleN`-token docs, and those must still
    * report 0 (the left-outer contract). */
  def contaminationReportFromShingles(evalIds: DataFrame, evalShingles: DataFrame,
                                      corpusShingles: DataFrame,
                                      idCol: String = "doc_id"): DataFrame = {
    val evalGrams = evalShingles
      .select(col("__id"), explode(col("__sh")).as("__gram"))
    // distinct BEFORE the join: partial aggregation collapses repeated
    // grams within each scan partition before the exchange, so the
    // shuffle carries each distinct gram ~once instead of every
    // occurrence (measured: semi-joining the raw exploded grams moves
    // more bytes than distinct+join at sf0.1). LEFT SEMI states the
    // intent (existence, never multiplication); eval gram rows are
    // already distinct per doc (shinglesFromToks), so the per-doc
    // count is exactly "distinct grams shared with the corpus".
    val corpusGrams = corpusShingles
      .select(explode(col("__sh")).as("__gram")).distinct()
    val hits = evalGrams
      .join(corpusGrams, Seq("__gram"), "left_semi")
      .groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    evalIds
      .join(hits.withColumnRenamed("__id", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_shared"),
        (coalesce(col("__n"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bounded EDIT-DISTANCE probe join — the entity-resolution /
    * fuzzy-contamination shape: which corpus documents does each of a
    * SMALL probe batch nearly match, where "nearly" is Levenshtein
    * distance ≤ `maxDist` over the first `prefixLen` chars of the
    * normalized text. Set similarity (Jaccard, [[jaccardJoinExact]])
    * is order-blind; edit distance catches character-level mutations
    * (typos, templated injections) that keep token sets intact.
    *
    * Shape: the probe side broadcasts (bounded batch by contract —
    * the q57/q58 incremental posture), the corpus NEVER shuffles, and
    * two pruning layers run before/inside the DP: the length
    * NECESSARY condition `|len(a)−len(b)| ≤ maxDist` (an edit can
    * change length by at most 1 — a theorem, so no qualifying pair is
    * lost), then Spark's threshold-banded Levenshtein (O(maxDist·n)
    * per pair, and -1-early-out past the band) instead of the full
    * O(n²) DP. At 100 TB this is a map-only corpus scan.
    *
    * Output: (probe_id, corpus_id, dist), dist ≤ maxDist. */
  def editDistanceProbe(probes: DataFrame, corpus: DataFrame, maxDist: Int,
                        prefixLen: Int = 64,
                        textCol: String = "text", idCol: String = "doc_id",
                        maxProbes: Long = 100000L): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    // The bounded-batch contract is ENFORCED, not assumed (the
    // pairwiseCorr pattern from round 6): an unbounded probe frame
    // under a forced broadcast is a driver OOM deep inside the join
    // instead of a precondition error here. The capped limit bounds
    // the guard's own work regardless of probe-side size, and the
    // guarded frame goes through [[graft.ops.Intermediates]] so ONE
    // materialization feeds both the guard count and the broadcast.
    val p = graft.ops.Intermediates.shared(
      probes.select(col(idCol).as("probe_id"),
        substring(normalized(col(textCol)), 1, prefixLen).as("__pt")))
    val nProbes = p.limit(math.min(maxProbes + 1, Int.MaxValue.toLong).toInt).count()
    require(nProbes <= maxProbes,
      s"editDistanceProbe broadcasts the probe side: got > $maxProbes probe rows — " +
        s"batch the probes, or raise maxProbes deliberately")
    val c = corpus.select(col(idCol).as("corpus_id"),
      substring(normalized(col(textCol)), 1, prefixLen).as("__ct"))
    c.join(broadcast(p),
        abs(length(col("__pt")) - length(col("__ct"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__pt"), col("__ct"), maxDist))
      .filter(col("dist") >= 0) // -1 = banded DP proved dist > maxDist
      .select(col("probe_id"), col("corpus_id"), col("dist"))
  }

  /** Cross-document duplicated-SUBSTRING spans — the exact-substring
    * dedup family (finding repeated boilerplate/quotes at token-span
    * granularity, which whole-document schemes like [[exactDedup]] and
    * set-similarity schemes like [[nearDupText]] both miss when the
    * shared run is a small fraction of each document).
    *
    * Shape (all built-ins, suffix-array-free):
    *   1. positioned token `k`-grams — one row per (doc, start
    *      position); the gram STRING is the join key (oracle-portable;
    *      at 100 TB key on a 128-bit hash of the gram instead — same
    *      plan, 16-byte keys, collision odds ~n²/2¹²⁸);
    *   2. "duplicated" grams = those whose distinct-doc count ≥ 2 (one
    *      hash aggregate; partial aggregation collapses within-doc
    *      repeats before the exchange). Stopword-like ubiquitous
    *      grams are naturally capped by `k`: a 5-gram shared by many
    *      docs IS the boilerplate being hunted;
    *   3. left-semi join the positioned grams against the duplicated
    *      set (existence, never multiplication);
    *   4. gaps-and-islands per document: hit positions whose starts
    *      are within `k` of each other merge into one maximal span
    *      (two hits at p < q overlap/adjoin as token spans iff
    *      q ≤ p + k). One doc-keyed window pass.
    *
    * Output: (doc_id, span_start, span_end, span_len) — 1-based
    * inclusive TOKEN positions of each maximal duplicated span,
    * the rows a curation pipeline would cut (or use to discount
    * quality scores) before training.
    *
    * Every stage is a hash aggregate, a semi join on the gram, or a
    * doc-keyed window — no all-pairs path, no global window; scales
    * like the q18 band join. */
  def dupSpans(docs: DataFrame, k: Int = 5,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // Shared: the positioned-gram frame feeds BOTH the distinct-doc
    // counting aggregate and the hit lookup — without the persist the
    // whole normalize→tokenize→gram-build Generate (the CPU-dominant
    // step: one regex pass + k-token slice/concat per position) runs
    // twice, once per consumer (r20, guide §1.2 step 2; measured two
    // separate scan+Generate subtrees in the q73 plan).
    val grams = graft.ops.Intermediates.shared(docs
      .select(col(idCol), split(normalized(col(textCol)), " ").as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("__toks")) - k),
          i => concat_ws(" ", slice(col("__toks"), i + 1, lit(k))))).as(Seq("__p", "__gram")))
      // 1-based start position (matches SQL/DuckDB list indexing)
      .select(col(idCol), (col("__p") + 1).cast("long").as("__i"), col("__gram")))
    val dup = grams.groupBy(col("__gram"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("__gram"))
    val hits = grams.join(dup, Seq("__gram"), "left_semi")
      .select(col(idCol), col("__i"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__i"))
    hits
      // break when this start is beyond the previous span's reach
      // (lag null on the first row → null > x is null → otherwise 0)
      .withColumn("__brk",
        when(col("__i") > lag(col("__i"), 1).over(w) + k, 1).otherwise(0))
      .withColumn("__isl",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__i")).as("span_start"),
        (max(col("__i")) + (k - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** CANONICAL SELECTION over near-dup clusters — the decision dedup
    * actually exists to make: which copy SURVIVES. Given cluster
    * membership (id, component) and per-doc quality, each cluster
    * keeps its best member — highest `qualityCol`, ties to the lowest
    * id (the deterministic rule a re-run must reproduce, or the
    * "same" corpus ships different survivors). Returns the membership
    * plus `is_canonical`; non-canonical rows are the redundant copies
    * a training export drops. One component-keyed window, no
    * self-join. */
  def canonicalPerCluster(clusters: DataFrame, docs: DataFrame,
                          qualityCol: String,
                          idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("component"))
      .orderBy(col(qualityCol).desc, col(idCol))
    clusters.join(docs.select(col(idCol), col(qualityCol)), Seq(idCol))
      .withColumn("__r", row_number().over(w))
      .withColumn("is_canonical", col("__r") === 1)
      .drop("__r")
  }
}
