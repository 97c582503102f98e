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

  /** Compact a small-files parquet dataset to ~`targetBytes`-sized
    * files — the housekeeping op every incremental sink needs: the
    * merge writer and streaming foreachBatch accrete a file per
    * (micro-)batch, and scan planning degrades with file count long
    * before data size is a problem. File count is computed from the
    * ACTUAL on-disk bytes, then the data is rewritten through one
    * `repartition` into a `__compact_tmp` sibling and committed with
    * a two-rename swap (`path → path__compact_old`, `tmp → path`):
    * the window a concurrent reader can observe is those two
    * metadata-only renames — the previous form's recursive delete
    * (O(files), the very thing compaction exists to shrink) sat
    * inside it. A crash between the renames is rolled back by
    * [[compactRecover]], which runs at the top of every compact;
    * crash states are ScaleSpec-tested. True atomicity needs a
    * manifest readers resolve — a table format's rewrite-commit, the
    * documented upgrade path. Returns the target file count. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20,
              partitionBy: Seq[String] = Nil): Int = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    compactRecover(fs, path)
    // A forgotten `partitionBy` on a partitioned dataset must fail
    // LOUDLY, not flatten the layout (round-7 advice): the path has
    // enough filesystem context to detect Hive-style `col=value`
    // partition dirs itself, so detect them and refuse a flat rewrite.
    val partDirs = fs.listStatus(hPath)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath.getName.takeWhile(_ != '='))
      .distinct
    require(partDirs.isEmpty || partitionBy.nonEmpty,
      s"compact: $path is partitioned (found ${partDirs.map(_ + "=*").mkString(", ")} " +
        s"dirs) but partitionBy is empty — a flat rewrite would silently destroy the " +
        s"layout and its pruning; pass partitionBy=Seq(${partDirs.map("\"" + _ + "\"").mkString(", ")})")
    val size = fs.getContentSummary(hPath).getLength
    val n = math.max(1, math.ceil(size.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    // A PARTITIONED dataset must be compacted with its partition
    // columns (pass `partitionBy`): a bare rewrite would read the
    // partition values as ordinary columns and write them back FLAT,
    // silently destroying the layout (and its pruning). Clustering by
    // the partition columns writes ONE file per partition value —
    // `n` and targetBytes then bound only write parallelism, not file
    // size; a caller with single partition values far above
    // targetBytes should cap file size via
    // spark.sql.files.maxRecordsPerFile (the per-file split knob that
    // composes with partitionBy) rather than this byte target.
    val rewritten =
      if (partitionBy.isEmpty) spark.read.parquet(path).repartition(n)
      else spark.read.parquet(path).repartition(n, partitionBy.map(col): _*)
    rewritten.write.mode("overwrite")
      .partitionBy(partitionBy: _*).parquet(tmp.toString)
    // HDFS rename signals failure via its return value, not an
    // exception — ignoring it can turn a failed rename (cross-fs tmp,
    // permissions) into silent data loss beyond the documented window.
    require(fs.rename(hPath, old), s"compact: rename $hPath -> $old failed; " +
      s"original intact, compacted copy at $tmp")
    require(fs.rename(tmp, hPath), s"compact: rename $tmp -> $hPath failed; " +
      s"original preserved at $old — next compact on this path rolls it back")
    fs.delete(old, true)
    n
  }

  /** Roll back the residue of a compact that crashed mid-swap:
    *   - `__compact_old` present with `path` MISSING → the crash hit
    *     between the two renames; restore the original;
    *   - `__compact_old` present with `path` live → the crash hit
    *     after commit, before cleanup; the compacted data wins;
    *   - a `__compact_tmp` dir is an uncommitted rewrite → dropped
    *     (recomputable). */
  private[ops] def compactRecover(fs: org.apache.hadoop.fs.FileSystem,
                                  path: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    if (fs.exists(old)) {
      if (!fs.exists(hPath))
        require(fs.rename(old, hPath), s"compact recovery: rename $old -> $hPath failed")
      else fs.delete(old, true)
    }
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** 2-D Z-order (Morton) value: interleave the low `bits` bits of
    * two non-negative integer columns (a at even positions, b at
    * odd). Pure shift/and/or tree — codegen'd, no UDF. 21 bits each
    * keeps the result in a positive long. Values are clamped into
    * range by masking; callers clustering wider domains should
    * pre-quantize (rank or bucketize) — standard practice, since
    * Z-order cares about ORDER, not magnitude. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { j =>
      Seq(
        shiftleft(shiftright(a, j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce[Column](_ bitwiseOR _)
  }

  /** Cluster `df` along the Z-order curve of two columns — the
    * multi-dimensional data-skipping layout: range-partitioning by
    * the interleaved value gives every output file a TIGHT min/max
    * range on BOTH columns (a linear sort gives tight ranges on its
    * leading column only), so parquet row-group/file pruning bites
    * for predicates on either dimension. This is the vanilla-parquet
    * form of the table-format Z-ORDER maintenance command; write the
    * result with `partitionBy`-free `.parquet(...)` and min/max
    * footer stats do the skipping. ScaleSpec measures the pruning
    * win against a linear layout. */
  def clusterZOrder(df: DataFrame, c1: String, c2: String,
                    partitions: Int, bits: Int = 21): DataFrame =
    df.withColumn("__z", zValue(col(c1).cast("long"), col(c2).cast("long"), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
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
