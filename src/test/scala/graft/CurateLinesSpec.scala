package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-document line dedup (Curate.dropBoilerplateLines) and the
  * Gopher repetition signals (TextAnalysis.repetitionSignals) —
  * edge-case behavior the q217/q218 oracles don't single out.
  */
class CurateLinesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dropBoilerplateLines: furniture goes everywhere, unique lines " +
    "survive in order, all-boilerplate docs survive empty") {
    val docs = Seq(
      (1L, "HEADER\nalpha body\nfooter"),
      (2L, "header\nbeta body\nFOOTER"),   // case/space variants match
      (3L, "  header \ngamma body\nfooter"),
      (4L, "header\nfooter")               // nothing of its own
    ).toDF("doc_id", "text")
    val out = graft.ext.Curate.dropBoilerplateLines(docs, minDocs = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha body", 2L),
      (2L, "beta body", 2L),
      (3L, "gamma body", 2L),
      (4L, "", 2L)))
  }

  test("dropBoilerplateLines: empty lines never count as boilerplate; " +
    "repeats within ONE doc don't cross the distinct-docs threshold") {
    val docs = Seq(
      (1L, "same\nsame\nsame\n\nkeep me"), // 'same' repeats in one doc only
      (2L, "\n\nother\n")
    ).toDF("doc_id", "text")
    val out = graft.ext.Curate.dropBoilerplateLines(docs, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "same\nsame\nsame\n\nkeep me", 0L),
      (2L, "\n\nother\n", 0L)))
  }

  test("keyOnHash (the extreme-scale anti-join shape) produces identical " +
    "output to the text-keyed form") {
    val docs = Seq(
      (1L, "HEADER\nalpha body\nfooter\n"),
      (2L, "header\nbeta body\nFOOTER"),
      (3L, "  header \ngamma body\nfooter"))
      .toDF("doc_id", "text")
    val a = graft.ext.Curate.dropBoilerplateLines(docs, minDocs = 3)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val b = graft.ext.Curate.dropBoilerplateLines(docs, minDocs = 3, keyOnHash = true)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(a == b)
    assert(a.head._2 == "alpha body\n", "empty trailing line survives both forms")
  }

  test("top/dup n-gram fractions generalize the bigram math (n = 3)") {
    val docs = Seq((1L, "buy now buy now buy now")).toDF("doc_id", "text")
    // tokens [buy now]x3: den = 23; 3-grams "buy now buy" x2 and
    // "now buy now" x2 → top3 = (2*11*1e6) div 23; dup3 = (11+11)e6 div 23
    val top = graft.ext.TextAnalysis.topNgramCharFracE6(docs, 3)
      .as[(Long, Long)].head()
    assert(top == ((1L, 22000000L / 23L)))
    val dup = graft.ext.TextAnalysis.dupNgramCharFracE6(docs, 3)
      .as[(Long, Long)].head()
    assert(dup == ((1L, 22000000L / 23L)))
  }

  test("gopherFilter: clean text accepts; the cascade reports the FIRST " +
    "failed rule in order") {
    val bullets = (1 to 10).map(i => s"- item$i").mkString("\n")
    // NB doc 1 must be LONG: the top-n-gram fraction follows the
    // literal Gopher/NeMo definition (a unique n-gram still counts),
    // so a 14-word doc trips top4gram on one long unique 4-gram —
    // exactly why the paper's word_count floor runs first at 50.
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog while the sun is up " +
        "and seven noisy crows argue about one shiny spoon near the old barn " +
        "as two patient cats watch from a warm stone wall until dusk settles " +
        "gently across the quiet valley floor"),
      (2L, "one two three"),
      (3L, s"the quick brown fox jumps over a lazy dog again\n$bullets"))
      .toDF("doc_id", "text")
    val out = graft.ext.Curate.gopherFilter(docs, minWords = 10)
      .orderBy("doc_id").as[(Long, Boolean, String)].collect().toSeq
    assert(out == Seq(
      (1L, true, "ok"),
      (2L, false, "word_count"),
      (3L, false, "bullet_lines")))
  }

  test("repetitionSignals: clean text scores low; planted repetition " +
    "moves exactly the right dial") {
    val docs = Seq(
      (1L, "a quick brown fox\njumps over dogs"),          // clean
      (2L, "same line\nsame line\nsame line"),             // dup lines
      (3L, "buy now buy now buy now buy now"),             // top bigram
      (4L, "")                                             // empty
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.repetitionSignals(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 2L && byId(1L)._3 == 0L && byId(1L)._4 == 0L)
    // 3 lines, 1 distinct → dup_line_frac = 2/3; char frac = 2*9/27
    assert(byId(2L)._3 == 666666L && byId(2L)._4 == 666666L)
    // 'buy now' x4 of 7 bigrams, len 7 of 31 chars → 4*7*1e6 div 31
    assert(byId(3L)._5 == (4L * 7L * 1000000L) / 31L)
    assert(byId(4L) == ((4L, 0L, 0L, 0L, 0L)))
  }
}
