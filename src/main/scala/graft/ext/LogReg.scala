package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed full-batch logistic-regression training — the
  * quality-classifier shape (fasttext-style doc scoring) every
  * curation pipeline eventually trains over its own corpus — as
  * iterative Spark aggregates in DETERMINISTIC fixed point.
  *
  * Per round: ONE hash aggregate computes the full-batch gradient —
  * each row contributes floor(((p − y)·x_j)·1e6) per feature, a
  * BIGINT, so the cross-partition sum is exact integer arithmetic
  * and the learned trajectory does not depend on partitioning or
  * reduction order (double sums are association-dependent; quantized
  * contributions are the same discipline as the e6/e9 fixed-point
  * window sums elsewhere in this repo). Weights live as e9-fixed
  * BIGINTs on the driver (3 longs of driver traffic per round — the
  * q87/q101 bounded-collect posture) and enter the plan as double
  * literals `w_e9 / 1e9`.
  *
  * Determinism of the float part: the margin is a fixed
  * left-associated chain of IEEE adds/multiplies on identical
  * inputs, and
  * σ(m) = 1/(1+exp(−m)) evaluates through `java.lang.Math.exp` in
  * BOTH the codegen'd executor path and the sequential reference —
  * same JVM, same bits. That makes [[sequentialReference]] an exact
  * (not approximate) replica, which is what the q104 gate compares
  * against. CAVEAT: this exactness assumes a HOMOGENEOUS JVM fleet —
  * `Math.exp` is permitted 1-ulp implementation variance (platform
  * intrinsics), so on mixed CPU/JVM-version executors the distributed
  * gradient could differ from a driver replica by a quantization
  * bucket. Holds unconditionally in a single JVM (this harness); on a
  * heterogeneous cluster, pin the JVM or swap σ to a
  * `StrictMath.exp`-based custom expression for specified-bits
  * guarantees.
  *
  * At 100 TB: the feature frame is one narrow row per document (the
  * corpus never re-shuffles after featurization), each round is a
  * map-side-combinable aggregate — the classic "communication = one
  * gradient vector per partition" data-parallel GD — and rounds are
  * the only serialization. */
object LogReg {

  /** Integer update: w_e9 −= (g_e6 · 1000) / lrDiv — i.e. a learning
    * rate of 1/lrDiv applied in exact integer arithmetic (truncating
    * division toward zero, same on both the distributed and the
    * sequential path by construction). */
  final case class Trained(firstGradE6: Seq[Long], stepsE9: Seq[Seq[Long]])

  private def marginCol(featCols: Seq[String], wE9: Seq[Long]): Column =
    featCols.zip(wE9).map { case (c, w) => col(c) * lit(w / 1e9) }.reduce(_ + _)

  /** Train `iters` full-batch GD rounds over `feat` (one row per
    * example; `featCols` are exact-integer features, the first
    * conventionally a constant 1 bias; `labelCol` is 0/1). */
  def train(feat: DataFrame, featCols: Seq[String], labelCol: String,
            iters: Int, lrDiv: Long): Trained = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lrDiv >= 1, s"lrDiv must be >= 1, got $lrDiv")
    var w = Seq.fill(featCols.size)(0L)
    val steps = mutable.Buffer.empty[Seq[Long]]
    var firstGrad: Seq[Long] = Nil
    for (it <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-marginCol(featCols, w)))
      // coalesce: sum over an EMPTY feature frame is null, and a
      // zero gradient (w stays put) is the right read of "no data" —
      // the DataChecks.uniqueness lesson from round-7 advice
      val gcols = featCols.zipWithIndex.map { case (c, j) =>
        coalesce(sum(floor(((p - col(labelCol)) * col(c)) * lit(1e6)).cast("long")),
          lit(0L)).as(s"g$j")
      }
      val r = feat.agg(gcols.head, gcols.tail: _*).collect()(0)
      val g = featCols.indices.map(r.getLong)
      if (it == 1) firstGrad = g
      w = w.zip(g).map { case (we9, ge6) => we9 - (ge6 * 1000L) / lrDiv }
      steps += w
    }
    Trained(firstGrad, steps.toSeq)
  }

  /** The same rounds over a driver-side collection — the q104 gate's
    * independent replica (exact, see object scaladoc). Rows are
    * (label, features) with features in `featCols` order; `nf` is
    * the feature count, passed explicitly so the empty-input replica
    * still returns `nf`-sized zero gradients like [[train]] does
    * (inferring it from the first row would shrink them to zero
    * length and fail an == gate on exactly the no-data case). */
  def sequentialReference(rows: Seq[(Long, Seq[Long])], nf: Int,
                          iters: Int, lrDiv: Long): Trained = {
    var w = Seq.fill(nf)(0L)
    val steps = mutable.Buffer.empty[Seq[Long]]
    var firstGrad: Seq[Long] = Nil
    for (it <- 1 to iters) {
      val wd = w.map(_ / 1e9)
      val g = Array.fill(nf)(0L)
      rows.foreach { case (y, x) =>
        val m = x.zip(wd).map { case (xj, wj) => xj * wj }.reduce(_ + _)
        val p = 1.0 / (1.0 + math.exp(-m))
        var j = 0
        while (j < nf) { g(j) += math.floor(((p - y) * x(j)) * 1e6).toLong; j += 1 }
      }
      if (it == 1) firstGrad = g.toSeq
      w = w.zip(g).map { case (we9, ge6) => we9 - (ge6 * 1000L) / lrDiv }
      steps += w
    }
    Trained(firstGrad, steps.toSeq)
  }
}
