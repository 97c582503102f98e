package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dsir

/** DSIR importance selection: hashed-bigram log-ratio scoring must
  * rank target-like docs first, score exactly (integer micro-nats,
  * deterministic re-runs), and handle gramless docs. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val B = 4096

  test("target-like raw docs outrank off-distribution ones; scores are " +
    "deterministic and gramless docs score 0") {
    // target: cooking text; raw: two docs reusing target phrasing
    // (high hit-gram share), two fully disjoint legal docs, one empty
    val target = Seq(
      (100L, "stir the onion and garlic in warm olive oil"),
      (101L, "simmer the tomato sauce with basil and oregano"),
      (102L, "whisk the eggs and fold in the flour gently"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "stir the onion and garlic in warm olive oil slowly"),
      (2L, "whisk the eggs and fold in the flour gently now"),
      (3L, "party hereby waives claims against respondent forthwith"),
      (4L, "jurisdiction venue governing law binding arbitration clause"),
      (5L, "!!!"))
      .toDF("doc_id", "text")
    val corpus = target.unionByName(raw)
    val tg = Dsir.wordBigrams(target, "doc_id", "text")
    val rg = Dsir.wordBigrams(corpus, "doc_id", "text")
    val ratios = Dsir.fitLogRatios(tg, rg, B)
    val scored = Dsir.score(raw.select(col("doc_id")), "doc_id",
      Dsir.wordBigrams(raw, "doc_id", "text"), ratios, B)
    val rows = scored.collect()
    assert(rows.find(_.getLong(0) == 5L).exists(_.isNullAt(1)),
      "a gramless doc carries a NULL score (ranks last)")
    val byId = rows.filterNot(_.isNullAt(1))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cooking = Seq(byId(1L), byId(2L)).min
    val legal = Seq(byId(3L), byId(4L)).max
    assert(cooking > legal,
      s"every cooking doc must outrank every legal doc: $byId")
    // deterministic: a full re-run reproduces identical scores
    val again = Dsir.score(raw.select(col("doc_id")), "doc_id",
      Dsir.wordBigrams(raw, "doc_id", "text"),
      Dsir.fitLogRatios(tg, rg, B), B)
      .collect().filterNot(_.isNullAt(1))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == byId, "scores must be bit-reproducible")
    // top-k under (score DESC, id): both cooking docs selected at k=2
    val top = Dsir.selectTopK(scored, "doc_id", 2)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(top == Set(1L, 2L))
  }

  test("Gumbel resampling: deterministic under a seed, recovers top-k as " +
    "temperature → 0, admits the tail as it grows, excludes NULL scores") {
    val docs = (1L to 200L).map(i => (i, if (i <= 20) 0L else -2000000L))
      .toDF("doc_id", "dsir_score")
      .unionByName(Seq((999L, None: Option[Long])).toDF("doc_id", "dsir_score"))
    // tiny temperature: the 20 score-0 docs dominate every Gumbel draw
    val cold = Dsir.resampleGumbel(docs, "doc_id", 10, 1e-9, seed = 7L)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(cold.forall(_ <= 20L),
      "τ→0 must select only from the top score class (ties broken by Gumbel)")
    // same seed → same sample; different seed → (here) a different one
    val s1 = Dsir.resampleGumbel(docs, "doc_id", 25, 1.0, seed = 7L)
      .select(col("doc_id")).as[Long].collect().toSeq
    val s2 = Dsir.resampleGumbel(docs, "doc_id", 25, 1.0, seed = 7L)
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(s1 == s2, "a seeded resample must be bit-reproducible")
    val s3 = Dsir.resampleGumbel(docs, "doc_id", 25, 1.0, seed = 8L)
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(s1 != s3, "a different seed must draw a different sample")
    // at τ=1 the -2 nat gap no longer excludes the tail outright
    assert(s1.exists(_ > 20L), "a warm temperature admits tail docs")
    assert(!s1.contains(999L) && !cold.contains(999L),
      "NULL-scored docs never sample")
  }

  test("bucketOf matches the documented oracle form and stays in range") {
    val grams = Seq("alpha_beta", "beta_gamma", "x_1", "_", "αβ_γ")
      .toDF("gram")
    val rows = grams.select(col("gram"),
      Dsir.bucketOf(col("gram"), B).as("b")).collect()
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0 && b < B, s"bucket $b out of range for ${r.getString(0)}")
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(0).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      assert(b == java.lang.Long.parseLong(md5hex, 16) % B,
        s"bucket must be the md5-prefix hash: ${r.getString(0)}")
    }
  }
}
