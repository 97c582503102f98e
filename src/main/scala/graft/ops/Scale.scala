package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the 100 TB posture (SURVEY.md §1.3, §4):
  * the reference's btree access paths (`(asset_id, ts desc)` composite
  * indexes, `views.sql:45-46`) map to bucketed+sorted parquet tables —
  * co-located, co-sorted joins and aggregations on the bucket key then
  * need no exchange at all.
  */
object Layout {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table. Joins
    * and aggregations keyed on `keys` between tables bucketed the same
    * way run shuffle-free (verified by ScaleSpec: the join plan has no
    * shuffle exchange). `buckets` should be sized so one bucket's data
    * fits an executor's task comfortably — at 100 TB that means
    * thousands of buckets, set once at layout time. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
}

/** Skew mitigation utilities. AQE's skew-join handling (on by default)
  * covers sort-merge joins; these cover the aggregation side and
  * pre-planned salting when key skew is known ahead of time.
  */
object Skew {

  /** Two-stage salted aggregation: partial aggregate on (keys, salt),
    * final aggregate on keys. A single hot key's rows spread over
    * `salts` reducers in stage 1 instead of one. `sum`/`count`-style
    * reassociable aggregates only — the two-stage split must be exact.
    *
    * The salt is derived deterministically from `saltFrom` (pick a
    * row-varying column, e.g. the fact's unique id), so results are
    * reproducible run-to-run.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: Column,
                saltFrom: Column, salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("sum"))
  }

  /** Salted equi-join for a fact table with known hot keys: the fact
    * side gets a deterministic salt in [0, salts), the (small) dim
    * side is replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows land on `salts` tasks instead of
    * one. Use when the dim side is too big to broadcast outright but
    * small enough to replicate `salts`×. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFrom: Column, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
