package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k accumulator (SURVEY.md §7.3: "custom
  * `Aggregator[IN,BUF,OUT]` … e.g. similarity top-k accumulation") —
  * the aggregation-form alternative to the two-phase window in
  * `Similarity.bruteForceTopK`.
  *
  * Buffer = at most k (score, id) pairs, merged pairwise; Spark runs
  * it as partial aggregation, so each map task reduces its partition
  * to k pairs before the shuffle — the exchange carries
  * `keys × partitions × k` tuples, same asymptotics as the
  * WindowGroupLimit plan but with an O(k) buffer instead of a sort,
  * and usable in any `agg(...)` (grouped, rolled up, streaming).
  *
  * Ties break toward the smaller id, matching the window form's
  * `orderBy(sim desc, id)` — the spec asserts exact agreement.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Seq.empty

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (score, id) => (-score, id) }.take(k)

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
    // Hot path: buffer full and the incoming pair can't displace the
    // current worst → skip the O(k log k) re-sort entirely.
    if (buf.length >= k) {
      val worst = buf.last
      val beats = in._1 > worst._1 || (in._1 == worst._1 && in._2 < worst._2)
      if (!beats) return buf
    }
    trim(buf :+ in)
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
