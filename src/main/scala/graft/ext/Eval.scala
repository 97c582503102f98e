package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier / ranker evaluation for quality-filter pipelines — the
  * measurement half the training side ([[LogReg]]) needs before a
  * filter is allowed to gate a corpus: ROC/AUC and operating-point
  * confusion counts for a score column against a 0/1 label.
  *
  * Everything here is INTEGER-EXACT by construction: AUC is returned
  * as the rational pair (2·concordant + ties, 2·P·N) rather than a
  * float, so two engines agree bit-for-bit and the caller divides at
  * the precision it wants. The contract is an integral (or
  * pre-quantized) score column — quantize floats with
  * `floor(score * 1e6)` first; ROC statistics are invariant under any
  * monotone transform, so quantization only merges ties.
  *
  * Scale: AUC aggregates per DISTINCT score first (one hash
  * aggregate), then runs one cumulative window over the distinct
  * scores — O(distinct scores) after the aggregate, which is what
  * makes it safe at 100 TB where a global per-row rank (the textbook
  * Mann-Whitney formulation) would be a single-partition sort of the
  * corpus. Quantized scores bound the distinct domain by
  * construction. */
object Eval {

  /** Exact ROC statistics of `scoreCol` (integral) against `labelCol`
    * (0/1): one row — `pos`, `neg`, and AUC as the integer pair
    * `auc_num2` = 2·concordant + ties, `auc_den2` = 2·pos·neg, so
    * AUC = auc_num2 / auc_den2 (ties counted half, the Mann-Whitney
    * U convention). Each positive beats every negative with a lower
    * score twice and every tied negative once:
    * Σ_scores p(s)·(2·cumNeg(<s) + neg(s)). */
  def rocStats(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df.groupBy(col(scoreCol).cast("long").as("s"))
      .agg(sum(col(labelCol).cast("long")).as("p"),
        sum(lit(1L) - col(labelCol).cast("long")).as("n"))
    // One window over the DISTINCT-score frame (already reduced);
    // rowsBetween(-∞, -1) = negatives strictly below this score.
    val w = Window.orderBy(col("s")).rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum_n", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(sum(col("p")).as("pos"), sum(col("n")).as("neg"),
        sum(col("p") * (lit(2L) * col("cum_n") + col("n"))).as("auc_num2"))
      .select(col("pos"), col("neg"), col("auc_num2"),
        (lit(2L) * col("pos") * col("neg")).as("auc_den2"))
  }

  /** Confusion counts at each operating threshold (predict positive
    * when score ≥ t): one row per threshold with tp/fp/fn/tn — the
    * P/R curve points a filter's cutoff is chosen from. One pass
    * (each row fans out to the |thresholds| literal rows — keep the
    * list operating-point-sized, not a sweep of thousands). */
  def prAtThresholds(df: DataFrame, scoreCol: String, labelCol: String,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "prAtThresholds: no thresholds")
    val y = col(labelCol).cast("long")
    val s = col(scoreCol).cast("long")
    df.select(s.as("s"), y.as("y"),
        explode(lit(thresholds.toArray)).as("threshold"))
      .groupBy(col("threshold"))
      .agg(sum(when(col("s") >= col("threshold"), col("y")).otherwise(0L)).as("tp"),
        sum(when(col("s") >= col("threshold"), lit(1L) - col("y")).otherwise(0L)).as("fp"),
        sum(when(col("s") < col("threshold"), col("y")).otherwise(0L)).as("fn"),
        sum(when(col("s") < col("threshold"), lit(1L) - col("y")).otherwise(0L)).as("tn"))
  }
}
