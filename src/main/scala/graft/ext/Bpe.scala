package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Intermediates

/** Byte-pair-encoding tokenizer TRAINING as Spark plans — the
  * iterative pair-count-and-merge algorithm (Sennrich et al. 2016)
  * every subword tokenizer pipeline runs before a model sees a
  * token, expressed map-reduce-style:
  *
  *   - the corpus collapses ONCE to its distinct-word dictionary
  *     with counts (a hash aggregate — at 100 TB the dictionary is
  *     orders of magnitude smaller than the corpus, and it is the
  *     only frame the iteration ever touches);
  *   - each round counts adjacent symbol pairs weighted by word
  *     count (explode + one map-side-combinable hash aggregate),
  *     takes the global argmax under a DETERMINISTIC total order
  *     (count desc, then lexicographic (left, right) — ties must
  *     break identically on any cluster layout or the learned vocab
  *     is nondeterministic), and
  *   - rewrites every word's symbol array with the new merge as a
  *     codegen'd `aggregate` fold (greedy leftmost-first,
  *     non-overlapping — "aaa" under merge (a,a) becomes [aa, a]) —
  *     a map-only pass, no UDF.
  *
  * Per-round driver traffic is ONE argmax row (the q87/k-means
  * bounded-collect posture); the dictionary iterates under eager
  * localCheckpoint with the previous iterate released
  * ([[graft.ops.Intermediates.release]] hygiene — plan depth and
  * storage stay O(1) in the round number).
  *
  * Training stops after `nMerges` rounds, or earlier when no pair
  * occurs at least twice (merging a count-1 pair can never shrink
  * another occurrence). [[sequentialReference]] is the same
  * algorithm on driver-side collections — the q101 gate's
  * independent implementation, bounded by the dictionary like the
  * all-pairs oracles.
  *
  * Symbols are character strings over the normalized token alphabet
  * ([[TextAnalysis.tokenStream]] — ASCII in the testdata; a
  * byte-level variant would pre-map text to latin-1 single-byte
  * chars first, same plans). No end-of-word marker: words are
  * tokenized independently, so merges never cross a boundary.
  */
object Bpe {

  /** One learned merge: at `step` (1-based), the adjacent pair
    * (`left`, `right`) with weighted count `pairCount` was fused;
    * `tokensAfter` = Σ |syms|·cnt over the dictionary after the
    * rewrite (strictly decreasing in `step` — each applied fusion
    * removes exactly one symbol occurrence). */
  final case class MergeStep(step: Int, left: String, right: String,
                             pairCount: Long, tokensAfter: Long)

  /** Distinct-word dictionary with counts: (word, cnt). */
  def wordCounts(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    TextAnalysis.tokenStream(docs, idCol, textCol)
      .groupBy(col("tok").as("word")).agg(count(lit(1)).as("cnt"))

  /** `word` split to single-character symbols. `split(w, "")` keeps
    * a trailing zero-width match on some regex engines — filter the
    * empties rather than depending on that edge. */
  private def charSyms(word: Column): Column =
    filter(split(word, ""), s => length(s) > 0)

  /** Adjacent-pair counts over a (syms, cnt) dictionary:
    * (a, b, pc). zip_with of the array against its own tail — words
    * of one symbol contribute nothing (empty slice). */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("__p"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(sum(col("cnt")).as("pc"))

  /** Greedy leftmost-first rewrite of `syms` under merge (a, b) as a
    * codegen'd fold: state = (rewritten prefix, one-symbol
    * lookbehind). The carry matches `a` and the next symbol `b` →
    * emit the fused symbol and CLEAR the carry, so a fused symbol
    * never re-matches as the `a` of an overlapping pair — exactly
    * the non-overlapping semantics of the sequential algorithm. */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val fused = a + b
    aggregate(
      syms,
      struct(array().cast("array<string>").as("acc"), lit(null).cast("string").as("carry")),
      (st, s) =>
        when(st.getField("carry").isNull,
          struct(st.getField("acc").as("acc"), s.as("carry")))
        .when(st.getField("carry") === lit(a) && s === lit(b),
          struct(concat(st.getField("acc"), array(lit(fused))).as("acc"),
            lit(null).cast("string").as("carry")))
        .otherwise(
          struct(concat(st.getField("acc"), array(st.getField("carry"))).as("acc"),
            s.as("carry"))),
      st => when(st.getField("carry").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("carry")))))
  }

  /** Train `nMerges` rounds over a (word, cnt) dictionary.
    *
    * ONE aggregation job per round: the argmax (as
    * `min(struct(-pc, a, b))` — negation turns the desc-count,
    * asc-pair tiebreak into a single lexicographic min) and the
    * total pair mass come from the same pass, and the token total
    * needs no job of its own by the identity
    * Σ|syms|·cnt = Σpc + Σcnt (every word has one more symbol than
    * adjacent pairs) — round N's pair pass prices round N−1's
    * rewrite. */
  def train(wordCounts: DataFrame, nMerges: Int): Seq[MergeStep] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val out = mutable.Buffer.empty[MergeStep]
    // LAZY checkpoints throughout: each rewrite materializes inside
    // the NEXT round's survey job (one Spark job per round, not a
    // survey + a checkpoint write), and the superseded iterate is
    // released only after that survey has materialized its
    // successor — release-before-materialize would strand the
    // truncated lineage. This is the eager-checkpoint-and-release
    // hygiene of Graph.pageRankE9 with the materialization folded
    // into the job each round already pays.
    var words = wordCounts
      .select(charSyms(col("word")).as("syms"), col("cnt"))
      .localCheckpoint(eager = false)
    var pendingRelease: Option[DataFrame] = None
    // sum over an empty dictionary is null — an empty corpus trains
    // an empty merge list, it doesn't NPE
    val cntRow = words.agg(sum(col("cnt"))).collect()(0)
    val totalCnt = if (cntRow.isNullAt(0)) 0L else cntRow.getLong(0)

    // (best pair under the (count desc, left, right) order | None,
    //  total pair mass) of the CURRENT dictionary; materializes
    // `words` as a side effect, after which the superseded iterate
    // is safe to release
    def survey(): (Option[(String, String, Long)], Long) = {
      val r = pairCounts(words)
        .agg(min(struct((-col("pc")).as("npc"), col("a"), col("b"))).as("best"),
          sum(col("pc")).as("tpc")).collect()(0)
      pendingRelease.foreach(Intermediates.release)
      pendingRelease = None
      val tpc = if (r.isNullAt(1)) 0L else r.getLong(1)
      val best = if (r.isNullAt(0)) None else {
        val s = r.getStruct(0)
        Some((s.getString(1), s.getString(2), -s.getLong(0)))
      }
      (best, tpc)
    }

    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val (best, tpc) = survey()
      if (step > 0) // price the previous round's rewrite
        out(step - 1) = out(step - 1).copy(tokensAfter = tpc + totalCnt)
      if (best.isEmpty || best.get._3 < 2L) done = true
      else {
        step += 1
        val (a, b, pc) = best.get
        out += MergeStep(step, a, b, pc, tokensAfter = -1L) // priced next round
        pendingRelease = Some(words)
        words = words
          .select(applyMerge(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint(eager = false)
      }
    }
    if (!done && out.nonEmpty) { // loop left on step count: price the last rewrite
      val (_, tpc) = survey()
      out(step - 1) = out(step - 1).copy(tokensAfter = tpc + totalCnt)
    }
    Intermediates.release(words)
    out.toSeq
  }

  /** Initial token total Σ length(word)·cnt of a (word, cnt)
    * dictionary — the step-0 point of the [[MergeStep.tokensAfter]]
    * monotone chain. 0 for an empty dictionary. */
  def tokensInit(wordCounts: DataFrame): Long = {
    val r = wordCounts.agg(sum(length(col("word")) * col("cnt"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Tokenize a string column with a learned merge list: chars, then
    * every merge replayed in training order (the standard BPE encode
    * for text the trainer saw; rare-pair interactions on UNSEEN text
    * differ from priority-queue encoders, documented not gated).
    * Map-only — `nMerges` chained folds, no UDF, no shuffle. */
  def encodeCol(text: Column, merges: Seq[MergeStep]): Column =
    merges.foldLeft(charSyms(text)) { (c, m) => applyMerge(c, m.left, m.right) }

  /** Driver-side training-order replay encode — the sequential mirror
    * of [[encodeCol]] (chars, then one leftmost-greedy pass per merge
    * in training order). */
  def replayEncode(s: String, merges: Seq[MergeStep]): Vector[String] = {
    def applyM(v: Vector[String], a: String, b: String): Vector[String] = {
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) { buf += (a + b); i += 2 }
        else { buf += v(i); i += 1 }
      }
      buf.result()
    }
    merges.foldLeft(s.split("").filter(_.nonEmpty).toVector)((v, m) =>
      applyM(v, m.left, m.right))
  }

  /** Iterative lowest-rank-first encode — the canonical
    * priority-queue BPE encoder (GPT-2/HF shape): repeatedly merge
    * the LEFTMOST occurrence of the lowest-rank pair present, to
    * fixpoint. For a WELL-FORMED merge list (each side of merge i is
    * buildable from merges < i — what training produces) this equals
    * [[replayEncode]] on any text, seen or unseen: a merge application
    * only creates pairs involving the new symbol, whose ranks are
    * necessarily HIGHER, so a single pass per rank never leaves a
    * lower-rank pair behind. An ILL-ORDERED list (a pair referencing
    * a symbol formed by a LATER merge) breaks that invariant and the
    * two encoders diverge — q109 plants exactly that case and gates
    * the equality live for the trained table. */
  def priorityEncode(s: String, merges: Seq[MergeStep]): Vector[String] = {
    // reversed so the EARLIEST rank survives a duplicate pair
    val rank = merges.zipWithIndex.reverse.map { case (m, i) => (m.left, m.right) -> i }.toMap
    var syms = s.split("").filter(_.nonEmpty).toVector
    var done = false
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i + 1 < syms.length) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestPos = i }
        }
        i += 1
      }
      if (bestPos < 0) done = true
      else syms = syms.take(bestPos) ++
        Vector(syms(bestPos) + syms(bestPos + 1)) ++ syms.drop(bestPos + 2)
    }
    syms
  }

  /** Unsigned UTF-8 byte order — Spark compares strings as UTF-8
    * binary, while Java's `String.compareTo` is UTF-16 code-unit
    * order; the two DISAGREE between supplementary characters
    * (surrogates, 0xD800-0xDFFF code units) and U+E000..U+FFFF, so
    * the reference must tie-break in Spark's order or a tie between
    * such symbols would diverge on correct code. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The same training rounds on driver-side collections — the
    * gate's independent reference (bounded by the dictionary). */
  def sequentialReference(words: Seq[(String, Long)], nMerges: Int): Seq[MergeStep] = {
    def applyM(s: Vector[String], a: String, b: String): Vector[String] = {
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { buf += (a + b); i += 2 }
        else { buf += s(i); i += 1 }
      }
      buf.result()
    }
    var dict = words.map { case (w, c) => (w.split("").filter(_.nonEmpty).toVector, c) }
    val out = mutable.Buffer.empty[MergeStep]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val pc = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      dict.foreach { case (s, c) =>
        var i = 0
        while (i + 1 < s.length) { pc((s(i), s(i + 1))) += c; i += 1 }
      }
      val best = pc.toSeq.sortWith { case (((a1, b1), n1), ((a2, b2), n2)) =>
        if (n1 != n2) n1 > n2
        else if (a1 != a2) utf8Lt(a1, a2)
        else utf8Lt(b1, b2)
      }.headOption
      if (best.isEmpty || best.get._2 < 2L) done = true
      else {
        step += 1
        val ((a, b), n) = best.get
        dict = dict.map { case (s, c) => (applyM(s, a, b), c) }
        val tokensAfter = dict.map { case (s, c) => s.length * c }.sum
        out += MergeStep(step, a, b, n, tokensAfter)
      }
    }
    out.toSeq
  }
}
