package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Distinct word `n`-gram shingles of the normalized text. Documents
    * shorter than `n` tokens yield an empty set (they cannot
    * participate in shingle-based near-dup). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(normalized(text), " ")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => get(toks, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Minhash signature: for each of `numPerm` seeded xxhash64 families,
    * the minimum hash over the shingle set. One expression — stays in
    * codegen; cost is numPerm passes over the (small) shingle array. */
  def minhashSignature(sh: Column, numPerm: Int): Column =
    transform(sequence(lit(0), lit(numPerm - 1)), s =>
      array_min(transform(sh, t => xxhash64(t, s))))

  /** Banded buckets over an ALREADY-MATERIALIZED signature column:
    * `numBands` structs of (band, bucket) where bucket = xxhash64 of
    * that band's `r` signature slice. A pair is a candidate if it
    * collides in ANY band — the standard OR-amplification S-curve
    * (collision prob 1-(1-j^r)^b for Jaccard j).
    *
    * `sig` MUST be a plain column reference, not the signature
    * expression inline: this array mentions it `numBands` times, and
    * an inline expression would be recomputed per mention (the round-2
    * bench caught exactly that — 16× signature recompute put
    * q18_neardup_text at 93 s; Catalyst's CollapseProject keeps a
    * non-cheap multi-referenced alias in its own projection, so a
    * named column is computed once per row). */
  def minhashBandBuckets(sig: Column, numBands: Int, r: Int): Column =
    array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), slice(sig, b * r + 1, r)).as("bucket"))
    }: _*)

  /** Exact Jaccard over two shingle-set columns (the verification
    * predicate; integer set sizes, so the double division is exact and
    * engine-portable). */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))

  /** Near-duplicate pairs by word-shingle Jaccard ≥ `threshold`.
    *
    * Pipeline: shingle → minhash → band explode → band equi-join on
    * (band, bucket) producing candidate id pairs (id-only — no
    * payloads in the wide join) → dedup across bands → join back to
    * the corpus for shingle sets → exact-Jaccard verification.
    *
    * Band parameters default to b=16, r=4 (64 permutations): candidate
    * probability ≈ 1 for j ≥ 0.9, ≈ 0.97 at j = 0.8, falling fast
    * below — sized for `threshold` ≥ ~0.7.
    */
  def nearDupText(docs: DataFrame, threshold: Double = 0.7,
                  shingleN: Int = 3, numBands: Int = 16, r: Int = 4,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)

    val banded = sh
      .withColumn("__sig", minhashSignature(col("__sh"), numBands * r))
      .select(col("__id"), explode(minhashBandBuckets(col("__sig"), numBands, r)).as("__b"))
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
}
