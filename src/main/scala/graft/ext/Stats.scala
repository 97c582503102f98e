package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics at scale. Spark's own exact `percentile`
  * buffers every value per group and its `approx_percentile` trades
  * exactness away; for INTEGRAL (or pre-quantized) columns there is a
  * third way — aggregate per DISTINCT value first, then one
  * cumulative window over the reduced frame (the [[Eval]] AUC shape):
  * exact answers, one hash aggregate plus a window that is
  * O(distinct values), never a global per-row sort. Token counts,
  * document lengths, byte sizes, quality scores — the curation
  * columns this engine filters on — are all integral, so their
  * quantile cuts can be exact even at corpus scale. */
object Stats {

  /** Exact quantiles of integral `valueCol` at the given PERMILLE
    * ranks (250 = p25, 990 = p99, 1000 = max): one row per requested
    * permille, `value` = the smallest v whose inclusive cumulative
    * count reaches rank ⌈p·N/1000⌉ — the classic discrete
    * (type-1/lower) quantile, all integer arithmetic so any engine
    * agrees bit-for-bit. */
  def exactQuantilesPermille(df: DataFrame, valueCol: String,
                             permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty, "exactQuantilesPermille: no ranks")
    require(permille.forall(p => p >= 1 && p <= 1000),
      s"exactQuantilesPermille: permille out of (0, 1000]: $permille")
    val g = df.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.withColumn("cum", sum(col("n")).over(w))
    val total = df.agg(count(lit(1)).cast("long").as("total"))
    val ranks = df.sparkSession.range(1)
      .select(explode(lit(permille.toArray)).as("permille"))
    // cum >= ⌈p·N/1000⌉ ⟺ cum·1000 >= p·N for integer cum — no
    // float, no ceil; both 1-row/tiny sides broadcast.
    cum.crossJoin(broadcast(total))
      .crossJoin(broadcast(ranks))
      .filter(col("cum") * lit(1000L) >= col("permille").cast("long") * col("total"))
      .groupBy(col("permille").cast("long").as("permille"))
      .agg(min(col("v")).as("value"))
  }

  /** Per-GROUP exact quantiles — the per-language / per-source length
    * cuts a curriculum or filter threshold is set from: same
    * distinct-value + cumulative-window mechanics as
    * [[exactQuantilesPermille]], with the window partitioned by the
    * group and each group ranked against its own total. One row per
    * (group, permille). */
  def exactQuantilesPermilleBy(df: DataFrame, groupCol: String, valueCol: String,
                               permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty, "exactQuantilesPermilleBy: no ranks")
    require(permille.forall(p => p >= 1 && p <= 1000),
      s"exactQuantilesPermilleBy: permille out of (0, 1000]: $permille")
    val g = df.groupBy(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.withColumn("cum", sum(col("n")).over(w))
    val total = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).cast("long").as("total"))
    val ranks = df.sparkSession.range(1)
      .select(explode(lit(permille.toArray)).as("permille"))
    cum.join(total, Seq("g"))
      .crossJoin(broadcast(ranks))
      .filter(col("cum") * lit(1000L) >= col("permille").cast("long") * col("total"))
      .groupBy(col("g").as(groupCol), col("permille").cast("long").as("permille"))
      .agg(min(col("v")).as("value"))
  }
}
