package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SORT-MERGE-BUCKET (SMB) layout — the shuffle-free join for tables
  * that are joined on the same key again and again: both sides are
  * written pre-hashed into the same number of buckets (and pre-sorted
  * within each bucket), so every subsequent equi-join on that key
  * needs NEITHER an exchange NOR a sort — bucket i joins bucket i in
  * place. At 100 TB this converts the single most expensive recurring
  * operation (the fact⋈fact shuffle, terabytes over the network per
  * run) into a local merge, paid for by one up-front bucketed write —
  * the same trade Hive SMB joins and Iceberg bucket transforms make.
  *
  * Mechanics: Spark's catalog carries the bucket spec (`bucketBy` +
  * `sortBy` through `saveAsTable`), and the planner drops the
  * exchange only when BOTH sides' bucket counts match the join key.
  * [[noShuffleJoin]] returns the join plus the plan-level evidence —
  * callers (and the q159 gate) assert the shuffle really vanished
  * rather than trusting the layout silently degraded to a plain join
  * (a changed bucket count, a renamed column or a disabled
  * `spark.sql.sources.bucketing.enabled` would all do that without
  * changing results).
  */
object Bucketed {

  /** Write `df` into the session catalog as bucketed table `name`:
    * `buckets` hash buckets on `key`, rows sorted by `key` within
    * each bucket (the sort half of SMB — merge-joins then need no
    * sort either). One shuffle at WRITE time (repartition by the
    * bucket hash so each bucket is one file), never again at read. */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit = {
    require(buckets >= 1, s"writeBucketed: need buckets >= 1, got $buckets")
    val spark = df.sparkSession
    // A managed table's warehouse dir can outlive the (in-memory)
    // catalog entry across JVMs; overwrite must clear BOTH or the
    // write refuses with LOCATION_ALREADY_EXISTS.
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite")
      .saveAsTable(name)
  }

  /** Equi-join two same-bucketed catalog tables on `key`, returning
    * the joined frame and whether the physical plan is genuinely
    * SHUFFLE-free (the SMB claim). The merge hint pins a
    * SortMergeJoin: at toy scale AQE would otherwise pick a broadcast
    * join — also shuffle-free, but proving nothing about the bucket
    * layout, and not what survives when BOTH sides are fact-sized. */
  def noShuffleJoin(spark: SparkSession, left: String, right: String,
                    key: String): (DataFrame, Boolean) = {
    val j = spark.table(left).hint("merge")
      .join(spark.table(right).hint("merge"), Seq(key))
    (j, isShuffleFree(j))
  }

  /** Plan-level evidence: true when the physical plan contains no
    * SHUFFLE exchange (broadcast exchanges don't move the big side
    * and don't count; initial adaptive plan — AQE cannot introduce a
    * shuffle that is not already planned). */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.linesIterator.exists(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
}
