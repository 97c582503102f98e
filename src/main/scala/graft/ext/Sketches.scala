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
}
