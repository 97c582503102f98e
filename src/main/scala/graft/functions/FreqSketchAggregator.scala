package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory heavy-hitter sketch: MISRA-GRIES with `k` counters
  * as a typed `Aggregator` — the frequencies member of the mergeable-
  * sketch family (HLL distinct = q42/q61, KLL quantiles = q43). The
  * exact top-tokens aggregation (q37) shuffles one row per DISTINCT
  * token; at 100 TB the token dictionary itself is shuffle-sized,
  * while this sketch's aggregation state is ≤ k counters per partial
  * regardless of input — the exchange carries `partitions × k`
  * entries, full stop.
  *
  * Guarantees (N = total items seen, any merge order/partitioning):
  *   - est(x) ≤ true(x) — counts only ever undercount;
  *   - true(x) − est(x) ≤ N/(k+1) — decrements are global;
  *   - every x with true(x) > N/(k+1) SURVIVES in the sketch.
  * The survivor SET and the exact estimates can vary with merge
  * order (Spark aggregation order is nondeterministic), but the
  * three properties above cannot — gates must assert the theorems,
  * never the raw sketch rows (the q42 sparse-HLL lesson).
  *
  * reduce: classic Misra-Gries — increment a held counter, else
  * claim a free one, else decrement ALL counters (dropping zeros).
  * merge: Agarwal et al. "Mergeable Summaries" — sum counts, then
  * subtract the (k+1)-th largest and drop non-positives; the error
  * bounds add, staying ≤ N/(k+1) for the combined stream.
  */
class FreqSketchAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        // decrement-all: one unit leaves every counter AND the
        // unaccounted new item — N/(k+1) total decrement events max
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
