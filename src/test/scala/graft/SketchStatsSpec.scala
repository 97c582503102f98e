package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ManifestTable

/** Metadata-only distinct counting over manifest tables: per-dir KMV
  * (bottom-k) sketches committed by `merge(kmvColumns = …)` and merged
  * by `ManifestTable.approxDistinct` — zero files read.
  */
class SketchStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_kmv_$tag").toString + "/t"

  private def seed(path: String, n: Int, mod: Int, k: Int = 256): Unit = {
    val df = (1 to n).map(i => (i.toLong, (i % 7).toString, (i % mod).toLong))
      .toDF("id", "part", "u")
    ManifestTable.merge(spark, path, df, Seq("id"), "part",
      kmvColumns = Seq("u"), kmvK = k)
  }

  test("below k the union is the complete hash set: exact count, flagged exact") {
    val path = freshPath("exact")
    seed(path, n = 500, mod = 97) // 97 distinct u values across 7 dirs
    val est = ManifestTable.approxDistinct(spark, path, "u")
    assert(est.exact, "97 < 256 per-dir sketches are complete")
    assert(est.estimate == 97L)
    assert(est.dirs == 7L)
  }

  test("above k the bottom-k estimator lands within its error class") {
    val path = freshPath("est")
    seed(path, n = 4000, mod = 3989, k = 256) // ~3048 distinct values
    val exact = ManifestTable.read(spark, path).select("u").distinct().count()
    val est = ManifestTable.approxDistinct(spark, path, "u")
    assert(!est.exact)
    val rel = math.abs(est.estimate.toDouble - exact) / exact
    // 1/sqrt(256) ≈ 6.3%; the data is fixed, so this is a
    // deterministic pin with slack, not a flaky statistical bound
    assert(rel < 0.25, s"estimate ${est.estimate} vs exact $exact (rel $rel)")
  }

  test("a later merge keeps the sketch union correct (touched dirs " +
    "re-sketch; untouched dirs carry verbatim)") {
    val path = freshPath("merge")
    seed(path, n = 500, mod = 97)
    // add 50 NEW distinct values, all landing in dirs part=0 and part=1
    val extra = (1 to 50).map(i => (10000L + i, (i % 2).toString, 1000L + i))
      .toDF("id", "part", "u")
    ManifestTable.merge(spark, path, extra, Seq("id"), "part",
      kmvColumns = Seq("u"), kmvK = 256)
    val est = ManifestTable.approxDistinct(spark, path, "u")
    assert(est.exact && est.estimate == 147L, s"97 + 50 new, got $est")
  }

  test("partition-filtered estimates merge only the selected dirs") {
    val path = freshPath("pf")
    seed(path, n = 500, mod = 97)
    val one = ManifestTable.approxDistinct(spark, path, "u", p => p == "0")
    val exact = ManifestTable.read(spark, path)
      .where(col("part") === "0").select("u").distinct().count()
    assert(one.exact && one.estimate == exact && one.dirs == 1L)
  }

  test("honesty refusals: missing sketch, pending MoR state") {
    val path = freshPath("ref")
    seed(path, n = 100, mod = 11)
    val e1 = intercept[RuntimeException] {
      ManifestTable.approxDistinct(spark, path, "id")
    }
    assert(e1.getMessage.contains("no committed KMV sketch"))
    // a MoR delete leaves a DV the sketches don't reflect — refuse
    ManifestTable.deleteWhereMoR(spark, path, "part", col("id") === 5L)
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.approxDistinct(spark, path, "u")
    }
    assert(e2.getMessage.contains("pending merge-on-read"))
  }

  test("a metadata-only rename re-keys the sketch: approxDistinct answers " +
    "under the new name") {
    val path = freshPath("ren")
    seed(path, n = 500, mod = 97)
    ManifestTable.renameColumn(spark, path, "u", "uid")
    val est = ManifestTable.approxDistinct(spark, path, "uid")
    assert(est.exact && est.estimate == 97L)
    intercept[RuntimeException] {
      ManifestTable.approxDistinct(spark, path, "u") // old name is gone
    }
  }

  test("history: retained versions audit oldest-first with commit time, " +
    "entries, metadata rows, and props (expired versions absent)") {
    val path = freshPath("hist")
    val mk = (lo: Int, hi: Int) => (lo to hi)
      .map(i => (i.toLong, (i % 3).toString, i.toLong)).toDF("id", "part", "u")
    ManifestTable.merge(spark, path, mk(1, 30), Seq("id"), "part",
      statsColumns = Seq("u"), retainVersions = 2)
    ManifestTable.merge(spark, path, mk(31, 40), Seq("id"), "part",
      statsColumns = Seq("u"), retainVersions = 2)
    ManifestTable.merge(spark, path, mk(41, 45), Seq("id"), "part",
      statsColumns = Seq("u"), retainVersions = 2)
    val h = ManifestTable.history(spark, path)
    assert(h.map(_.version) == Seq(2L, 3L), "retainVersions=2 keeps the last two")
    assert(h.forall(_.commitMs.isDefined))
    assert(h.map(_.entries) == Seq(3L, 3L))
    assert(h.map(_.rows) == Seq(Some(40L), Some(45L)),
      "metadata row counts track the upserts")
    ManifestTable.addConstraint(spark, path, "u_pos", "u > 0")
    val h2 = ManifestTable.history(spark, path)
    assert(h2.last.props.get("constraint.u_pos").contains("u > 0"),
      "props diffs surface constraint/layout changes")
  }

  test("compaction carries sketches verbatim; the union is insensitive " +
    "to dir re-grouping") {
    val path = freshPath("comp")
    seed(path, n = 500, mod = 97)
    val before = ManifestTable.approxDistinct(spark, path, "u")
    ManifestTable.compact(spark, path, "part")
    val after = ManifestTable.approxDistinct(spark, path, "u")
    assert(after.estimate == before.estimate && after.exact == before.exact)
  }

  test("approxDistinctWhere: a pcol =/IN/range SQL predicate folds only the " +
    "surviving entries' sketches — equal to a full rebuild on the same " +
    "subset — and every non-key-decidable shape refuses loudly") {
    val path = freshPath("adw")
    seed(path, n = 500, mod = 97) // keys "0".."6", integral
    // range: integral keys compare numerically
    val est = ManifestTable.approxDistinctWhere(spark, path, "u", "part >= 4")
    val manual = ManifestTable.approxDistinct(spark, path, "u",
      p => p.toLong >= 4L)
    assert(est == manual, s"$est != $manual")
    val exact = ManifestTable.read(spark, path)
      .where(col("part") >= "4").select("u").distinct().count()
    assert(est.exact && est.estimate == exact && est.dirs == 3L)
    // IN + equality + conjunction + IS NOT NULL
    val in2 = ManifestTable.approxDistinctWhere(spark, path, "u",
      "part IN ('1', '2') AND part IS NOT NULL")
    assert(in2.dirs == 2L)
    val eq1 = ManifestTable.approxDistinctWhere(spark, path, "u", "'3' = part")
    assert(eq1.dirs == 1L)
    // a FULL REBUILD on the same subset gives the identical estimate
    // (content-stable md5 sketches: same rows -> same union)
    val sub = freshPath("adw_sub")
    ManifestTable.merge(spark, sub,
      ManifestTable.read(spark, path).where(col("part").cast("long") >= 4L),
      Seq("id"), "part", kmvColumns = Seq("u"), kmvK = 256)
    val rebuilt = ManifestTable.approxDistinct(spark, sub, "u")
    assert(rebuilt.estimate == est.estimate && rebuilt.exact == est.exact)
    // equality adjudicates in the KEY FAMILY'S domain, like ranges:
    // an integer literal against integral keys compares NUMERICALLY
    // (the coercion a resolved engine would apply) — textual compare
    // would silently miss zero-padded keys
    val eqNum = ManifestTable.approxDistinctWhere(spark, path, "u", "part = 3")
    assert(eqNum.dirs == 1L, "integer-literal equality must coerce numerically")
    val padded = freshPath("adw_pad")
    ManifestTable.merge(spark, padded,
      (1 to 60).map(i => (i.toLong, f"${i % 3 + 1}%02d", (i % 7).toLong))
        .toDF("id", "part", "u"),
      Seq("id"), "part", kmvColumns = Seq("u"), kmvK = 256)
    // keys are "01".."03": `part = 3` (INTEGRAL literal) must match
    // "03" — the engine casts the STRING COLUMN to the numeric domain
    val eqPad = ManifestTable.approxDistinctWhere(spark, padded, "u", "part = 3")
    assert(eqPad.dirs == 1L,
      s"an integral literal against a string column must coerce: $eqPad")
    // …but `part = '3'` (STRING literal) is STRING EQUALITY — the
    // engine's '3' = '03' is FALSE, so the decidable answer is EMPTY,
    // never a numerically-coerced over-scoped subset
    val eqPadStr = ManifestTable.approxDistinctWhere(spark, padded, "u", "part = '3'")
    assert(eqPadStr.dirs == 0L && eqPadStr.estimate == 0L && eqPadStr.exact,
      s"a string literal against a string column must not coerce: $eqPadStr")
    // same on the unpadded table: 'x1' matches no key — decidably empty
    val eqNoKey = ManifestTable.approxDistinctWhere(spark, path, "u", "part = 'x1'")
    assert(eqNoKey.dirs == 0L && eqNoKey.estimate == 0L && eqNoKey.exact)
    // the compare domain comes from the COMMITTED SCHEMA's column
    // type, never key shape: over an INTEGRAL column with keys 1..12,
    // a STRING range literal compares NUMERICALLY (`part >= '9'`
    // keeps 9..12) — textual compare would silently exclude '10'..'12'
    val intCol = freshPath("adw_int")
    ManifestTable.merge(spark, intCol,
      (1 to 60).map(i => (i.toLong, (i % 12 + 1).toLong, (i % 7).toLong))
        .toDF("id", "part", "u"),
      Seq("id"), "part", kmvColumns = Seq("u"), kmvK = 256)
    val strRange = ManifestTable.approxDistinctWhere(spark, intCol, "u", "part >= '9'")
    assert(strRange.dirs == 4L,
      s"a string literal over an integral column must compare numerically: $strRange")
    val strEq = ManifestTable.approxDistinctWhere(spark, intCol, "u", "part = '11'")
    assert(strEq.dirs == 1L)
    // functions of the key and OR-combinations are decidable through
    // the per-key EVAL fallback (r18) — the structural refusal no
    // longer surfaces for pcol-only shapes
    val fn1 = ManifestTable.approxDistinctWhere(spark, path, "u",
      "substr(part, 1, 1) = '1'")
    assert(fn1 == ManifestTable.approxDistinct(spark, path, "u",
      _.startsWith("1")))
    val or1 = ManifestTable.approxDistinctWhere(spark, path, "u",
      "part = '1' OR part = '2'")
    assert(or1 == ManifestTable.approxDistinct(spark, path, "u",
      p => p == "1" || p == "2"))
    // refusals that remain: a non-key column, and key = column
    for (bad <- Seq("u > 5", "part = id")) {
      val e = intercept[RuntimeException] {
        ManifestTable.approxDistinctWhere(spark, path, "u", bad)
      }
      assert(e.getMessage.contains("not key-decidable"), s"$bad: ${e.getMessage}")
    }
    // an unparsable string literal on an integral column raises the
    // ENGINE'S OWN ANSI cast error through the eval fallback — exactly
    // what the equivalent scan would raise (r18; previously a blanket
    // structural refusal)
    val eInt = intercept[Exception] {
      ManifestTable.approxDistinctWhere(spark, intCol, "u", "part = 'x1'")
    }
    assert(eInt.getMessage.contains("CAST_INVALID_INPUT"), eInt.getMessage)
    // a string column whose keys don't all parse refuses an integral
    // literal (the scan's ANSI cast of the column would error)
    val strKeys = freshPath("adw_str")
    ManifestTable.merge(spark, strKeys,
      Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("id", "part", "u"),
      Seq("id"), "part", kmvColumns = Seq("u"), kmvK = 256)
    intercept[RuntimeException] {
      ManifestTable.approxDistinctWhere(spark, strKeys, "u", "part = 3")
    }
  }

  test("approxDistinctWhere EXPRESSION predicates: any deterministic " +
    "pcol-only predicate the structural adjudicator refuses falls back to " +
    "per-key eval — substr/OR/inequality fold; non-pcol shapes still refuse") {
    val path = freshPath("adw_expr")
    ManifestTable.merge(spark, path,
      (1 to 60).map { i =>
        val d = i % 6 + 1
        (i.toLong, s"2024-0${d / 4 + 1}-0${d % 4 + 1}", (i % 7).toLong)
      }.toDF("id", "part", "u"),
      Seq("id"), "part", kmvColumns = Seq("u"), kmvK = 256)
    // substr month selection — structurally refused, eval-decided
    val est = ManifestTable.approxDistinctWhere(spark, path, "u",
      "substr(part, 1, 7) = '2024-01'")
    val manual = ManifestTable.approxDistinct(spark, path, "u",
      p => p.startsWith("2024-01"))
    assert(est == manual, s"$est != $manual")
    // OR + inequality combinations
    val or = ManifestTable.approxDistinctWhere(spark, path, "u",
      "part = '2024-01-01' OR part >= '2024-02-02'")
    val orManual = ManifestTable.approxDistinct(spark, path, "u",
      p => p == "2024-01-01" || p >= "2024-02-02")
    assert(or == orManual)
    val ne = ManifestTable.approxDistinctWhere(spark, path, "u",
      "part != '2024-01-01'")
    assert(ne == ManifestTable.approxDistinct(spark, path, "u", _ != "2024-01-01"))
    // a non-pcol reference still refuses loudly
    val e = intercept[RuntimeException] {
      ManifestTable.approxDistinctWhere(spark, path, "u", "substr(part,1,4) = id")
    }
    assert(e.getMessage.contains("not key-decidable"), e.getMessage)
  }

  test("foldMoR re-sketches touched dirs at the COMMITTED k, not the call " +
    "default — the sketch family stays homogeneous and approxDistinct keeps " +
    "answering after maintenance") {
    val path = freshPath("foldk")
    seed(path, n = 500, mod = 50, k = 64) // non-default k; 50 distinct < 64
    ManifestTable.deleteWhereMoR(spark, path, "part", col("id") === 5L)
    // default kmvK=256 argument — the committed k=64 must win
    val folded = ManifestTable.foldMoR(spark, path, "part",
      kmvColumns = Seq("u"))
    assert(folded == 1L)
    val est = ManifestTable.approxDistinct(spark, path, "u")
    assert(est.k == 64, s"the committed k must survive the fold: $est")
    assert(est.exact && est.estimate == 50L,
      s"post-fold family must stay k=64-homogeneous and answer: $est")
  }

  test("a DV-folding compact DROPS the folded entry's sketch — refusal, " +
    "never an estimate that counts erased rows; a re-merge re-sketches") {
    val path = freshPath("dvfold")
    seed(path, n = 500, mod = 97)
    ManifestTable.deleteWhereMoR(spark, path, "part", col("id") === 5L)
    // pending DV → refusal (sketches don't reflect the delete)
    intercept[IllegalArgumentException] {
      ManifestTable.approxDistinct(spark, path, "u")
    }
    // the fold removes the rows physically; the sketch would now
    // OVERCOUNT, so it must be gone — missing-sketch refusal instead
    ManifestTable.compact(spark, path, "part")
    val e = intercept[RuntimeException] {
      ManifestTable.approxDistinct(spark, path, "u")
    }
    assert(e.getMessage.contains("no committed KMV sketch"))
    // a kmvColumns merge touching the folded partition re-sketches it
    ManifestTable.merge(spark, path,
      Seq((9999L, "5", 5L)).toDF("id", "part", "u"),
      Seq("id"), "part", kmvColumns = Seq("u"), kmvK = 256)
    val est = ManifestTable.approxDistinct(spark, path, "u")
    assert(est.exact && est.estimate == 97L)
  }

  test("time travel: approxDistinctAt / approxDistinctWhereAt answer from " +
    "the PINNED snapshot's sketches after later upserts rewrote the dirs, " +
    "survive a compaction (carried sketches), and refuse a dropped version") {
    val path = freshPath("asof")
    seed(path, n = 500, mod = 97) // v1: u ∈ 0..96
    val v1 = ManifestTable.history(spark, path).last.version
    val est1 = ManifestTable.approxDistinct(spark, path, "u")
    val est1w = ManifestTable.approxDistinctWhere(spark, path, "u", "part >= 4")
    assert(est1.exact && est1.estimate == 97L)
    // a second batch rewrites every dir with NEW distinct values
    val batch2 = (1 to 100).map(i => (10000L + i, (i % 7).toString, 1000L + i))
      .toDF("id", "part", "u")
    ManifestTable.merge(spark, path, batch2, Seq("id"), "part",
      kmvColumns = Seq("u"), kmvK = 256, retainVersions = 3)
    val cur = ManifestTable.approxDistinct(spark, path, "u")
    assert(cur.estimate == 197L && cur.exact,
      s"current snapshot sees both batches: $cur")
    // the pinned snapshot still answers with the OLD sketches
    assert(ManifestTable.approxDistinctAt(spark, path, "u", v1) == est1)
    assert(ManifestTable.approxDistinctWhereAt(spark, path, "u",
      "part >= 4", v1) == est1w)
    // the where-adjudication pins too: expression fallback at version
    assert(ManifestTable.approxDistinctWhereAt(spark, path, "u",
      "substr(part, 1, 1) IN ('4', '5', '6')", v1) == est1w)
    // a compaction re-groups dirs but carries sketches; the pinned
    // and current estimates both survive
    ManifestTable.compact(spark, path, "part", retainVersions = 4)
    val v3 = ManifestTable.history(spark, path).last.version
    assert(ManifestTable.approxDistinctAt(spark, path, "u", v1) == est1)
    assert(ManifestTable.approxDistinctAt(spark, path, "u", v3).estimate ==
      cur.estimate)
    // a version outside retention refuses loudly
    intercept[IllegalArgumentException] {
      ManifestTable.approxDistinctAt(spark, path, "u", 9999L)
    }
  }

  test("approxDistinctWhere over TIMESTAMP partition keys decodes the key " +
    "text under the writer-zone certificate; a zone-mismatched session " +
    "refuses loudly") {
    val path = freshPath("tsw")
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = (1 to 300).map { i =>
      (i.toLong, ts(s"2024-01-0${1 + i % 3} 0${i % 6}:00:00"), (i % 83).toLong)
    }.toDF("id", "hr", "u")
    ManifestTable.merge(spark, path, rows, Seq("id"), "hr",
      kmvColumns = Seq("u"), kmvK = 256)
    // structural shapes refuse on a timestamp column; the eval
    // fallback decodes per key under the certificate
    val est = ManifestTable.approxDistinctWhere(spark, path, "u",
      "hr >= '2024-01-02 00:00:00'")
    val exact = ManifestTable.read(spark, path)
      .where(col("hr") >= "2024-01-02 00:00:00")
      .select("u").distinct().count()
    assert(est.exact && est.estimate == exact,
      s"ts-keyed filtered estimate must be exact: $est vs $exact")
    // an expression of the key decodes too
    val estD = ManifestTable.approxDistinctWhere(spark, path, "u",
      "date_trunc('day', hr) = TIMESTAMP '2024-01-02 00:00:00'")
    val exactD = ManifestTable.read(spark, path)
      .where(date_trunc("day", col("hr")) === "2024-01-02 00:00:00")
      .select("u").distinct().count()
    assert(estD.exact && estD.estimate == exactD)
    // zone mismatch: the certificate fails → loud refusal, never a
    // silently mis-scoped subset
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[RuntimeException] {
        ManifestTable.approxDistinctWhere(spark, path, "u",
          "hr >= '2024-01-02 00:00:00'")
      }
      assert(e.getMessage.contains("not") || e.getMessage.contains("decid"),
        s"zone mismatch must refuse: ${e.getMessage}")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }
}
