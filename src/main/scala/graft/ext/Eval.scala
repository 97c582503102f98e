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

  /** CALIBRATION (reliability-diagram) bins: does "score 0.8" mean
    * 80% positive? Scores in [0, scaleMax] bucket into `bins`
    * equal-width bins (the top edge closes into the last bin); each
    * row carries the bin's row count, positive count, and score mass
    * — all integers, so the consumer computes mean-score vs
    * positive-rate per bin (and ECE) at whatever precision it wants
    * while two engines agree bit-for-bit on the sufficient
    * statistics. One hash aggregate. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int, scaleMax: Long): DataFrame = {
    require(bins >= 1, s"calibrationBins: bins must be >= 1, got $bins")
    require(scaleMax >= 1, s"calibrationBins: scaleMax must be >= 1")
    val s = col(scoreCol).cast("long")
    df.select(s.as("__s"), col(labelCol).cast("long").as("y"))
      // `div` (integer division), not `/` — Column./ is DOUBLE
      // division and would spray fractional bin ids
      .withColumn("bin",
        least(expr(s"__s * $bins div ${scaleMax}L"), lit(bins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("__s")).as("score_mass"))
  }

  /** JOIN-KEY SKEW REPORT — the diagnostic run before a big join:
    * per-key counts reduce to (distinct keys, total rows, max key
    * mass, the top-k heaviest keys) so the caller sees whether one
    * key holds 30% of the table (salt it / broadcast the other side)
    * before the shuffle discovers it the hard way. One hash aggregate
    * + a k-row top-k; the raw table never collects. */
  def skewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"skewReport: k must be >= 1")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
      max(col("n")).as("max_key_rows"))
    // orderBy+limit plans as TakeOrderedAndProject — per-partition
    // top-k then a k-row driver merge, never a global sort; the rank
    // window then runs over k rows only.
    val top = counts.orderBy(col("n").desc, col("key")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("key"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(stats))
      .select(col("rank"), col("key"), col("n"),
        col("n_keys"), col("n_rows"), col("max_key_rows"))
  }
}
