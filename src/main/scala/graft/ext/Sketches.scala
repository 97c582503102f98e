package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as a DataFrame plan — the mergeable point-query
  * frequency sketch that completes the sketch family next to HLL
  * distinct counting (q42/q61), approx quantiles (q43) and the
  * Misra-Gries heavy-hitter aggregator (q64).
  *
  * The sketch is a `depth × width` counter matrix: each item
  * increments one counter per row, at column `h_j(item) % width`.
  * A point query reads its `depth` counters and takes the MIN. Two
  * guarantees (Cormode & Muthukrishnan 2005):
  *   - estimate ≥ true count, ALWAYS (counters only ever
  *     over-count — a theorem, which q74 gates);
  *   - estimate ≤ true + ε·N with probability 1−δ for
  *     width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉ (probabilistic; reported,
  *     not gated — same posture as q16's LSH recall floor).
  *
  * Representation: the matrix lives as a (j, bucket, cnt) frame —
  * ONE hash aggregate over the exploded (item × depth) stream, with
  * map-side partial aggregation collapsing heavy hitters before the
  * exchange. At most depth·width rows regardless of corpus size, so
  * the materialized sketch broadcasts to every probe — the point of
  * a sketch at 100 TB: counters this small can sit on the driver, be
  * unioned across shards (groupBy (j,bucket) sum — mergeability is
  * free in this representation), or serve point queries without
  * touching the corpus again.
  *
  * Hashing: [[Curate.hashBucket]]'s md5 idiom seeded per row
  * (`md5(j || '#' || item)`) — engine-portable (the DuckDB oracle
  * recomputes identical buckets), uniform, and seed-independent
  * across rows. xxhash64 would be cheaper per byte but is
  * Spark-private; the sketch hash must be stable across every engine
  * that reads the sketch.
  */
object Sketches {

  /** Bucket of `item` under hash row `j`: first 8 hex chars of
    * md5("j#item") as an integer, mod `width`. */
  def cmsBucket(item: Column, j: Int, width: Int): Column =
    conv(substring(md5(concat_ws("#", lit(j.toString), item.cast("string"))), 1, 8), 16, 10)
      .cast("long") % width

  private def bucketStructs(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { j =>
      struct(lit(j).as("j"), cmsBucket(item, j, width).as("bucket"))
    }: _*)

  /** Build the sketch: one (j, bucket, cnt) row per non-empty
    * counter. `items` is a one-column-of-interest frame (duplicates
    * = multiplicity). */
  def cmsCounters(items: DataFrame, itemCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame =
    items
      .select(explode(bucketStructs(col(itemCol), depth, width)).as("__jb"))
      .groupBy(col("__jb.j").as("j"), col("__jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-query `probes`' items against a counter frame: the min of
    * the item's `depth` counters. The counter frame is ≤ depth·width
    * rows → Spark broadcasts it; the probe side never shuffles. A
    * missing counter row means zero items hashed there — the probed
    * item's count is 0 (coalesce on the outer join). */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, itemCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame =
    probes
      .select(col(itemCol), explode(bucketStructs(col(itemCol), depth, width)).as("__jb"))
      .select(col(itemCol), col("__jb.j").as("j"), col("__jb.bucket").as("bucket"))
      .join(broadcast(counters), Seq("j", "bucket"), "left_outer")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  // ----------------------------------------------------------------
  // Bloom filter — packed-bitset membership sketch
  // ----------------------------------------------------------------

  /** Bit position of `item` under hash row `j`, in `[0, mBits)` —
    * the same engine-portable md5 idiom as [[cmsBucket]] (the DuckDB
    * oracle rebuilds identical positions). */
  def bloomPos(item: Column, j: Int, mBits: Int): Column =
    conv(substring(md5(concat_ws("#", lit(j.toString), item.cast("string"))), 1, 8), 16, 10)
      .cast("long") % mBits

  private def bloomPosArray(item: Column, k: Int, mBits: Int): Column =
    array((0 until k).map(j => bloomPos(item, j, mBits)): _*)

  /** Build a Bloom filter over `items` as a packed-word frame: one
    * (word, bits) row per non-empty 32-bit word of the m-bit array.
    * `k` hash rows set `k` bits per item; membership holds iff all
    * `k` bits are set ([[bloomMightContain]]).
    *
    * Two Bloom guarantees (Bloom 1970):
    *   - NO false negatives — an inserted item always probes
    *     present (a theorem: bit_or only ever sets bits — q100
    *     gates it);
    *   - false positives at rate ≈ (1 − e^{−k·n/m})^k
    *     (probabilistic; reported, not gated — the q74 posture).
    *
    * Why this exists next to the exact semi-join (q57): the filter
    * is ≤ m/32 rows REGARDLESS of corpus size — at 100 TB the
    * distinct-gram set is itself TB-scale and the exact
    * decontamination check shuffles the eval grams against it, while
    * this sketch broadcasts (mBits = 2^26 packs to 16 MB of longs),
    * turning the common all-clear probe into a map-only pass; only
    * maybe-hits (exact hits + the ε of false positives) ever need
    * the exact join. Mergeable for free: union two filters'
    * frames and `groupBy(word).agg(bit_or(bits))`.
    *
    * 32-bit packing (not 64): the shifted mask `1L << bit` stays a
    * POSITIVE BIGINT in both engines — bit 63 would be negative in
    * Spark's two's-complement shiftleft and an overflow hazard in
    * DuckDB's checked `<<`. */
  def bloomWords(items: DataFrame, itemCol: String,
                 k: Int = 4, mBits: Int = 1 << 20): DataFrame = {
    require(mBits % 32 == 0, s"mBits must be a multiple of 32, got $mBits")
    items
      .select(explode(bloomPosArray(col(itemCol), k, mBits)).as("__pos"))
      .select(floor(col("__pos") / 32).cast("long").as("word"),
        (col("__pos") % 32).cast("int").as("__bit"))
      .groupBy(col("word"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), __bit)")).as("bits"))
  }

  /** Probe `probes`' items against a packed-word filter frame:
    * present iff ALL `k` probed bits are set. The filter is ≤ m/32
    * rows → broadcast; the probe side never shuffles. A missing word
    * row means no bit in that word was ever set — every probe into
    * it misses (coalesce to 0). `k`/`mBits` must match the build. */
  def bloomMightContain(words: DataFrame, probes: DataFrame, itemCol: String,
                        k: Int = 4, mBits: Int = 1 << 20): DataFrame =
    probes
      .select(col(itemCol), explode(bloomPosArray(col(itemCol), k, mBits)).as("__pos"))
      .select(col(itemCol), floor(col("__pos") / 32).cast("long").as("word"),
        (col("__pos") % 32).cast("int").as("__bit"))
      .join(broadcast(words), Seq("word"), "left_outer")
      .select(col(itemCol),
        (coalesce(col("bits"), lit(0L))
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), __bit)")) =!= 0L).as("__hit"))
      .groupBy(col(itemCol))
      .agg((min(when(col("__hit"), lit(1)).otherwise(lit(0))) === 1).as("might_contain"))
}
