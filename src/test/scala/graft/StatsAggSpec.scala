package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ManifestTable
import graft.plans.StatsAggRule

/** Automatic metadata-only aggregates (StatsAggRule): a global
  * count/count(col)/min/max over a bare manifest scan must collapse to
  * the committed footer stats — zero files opened — and every rewrite
  * must return exactly what the full scan would. Back-off cases
  * (filters, DVs, doubles, strings, kill switch) must fall back to a
  * real scan with unchanged results.
  */
class StatsAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sagg_$tag").toString + "/t"

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  /** Three day-partitions; x is long with nulls (day2 all-null),
    * d is double, s is string. Stats on x, ts, d, s. */
  private def seed(path: String): Unit = {
    val rows = Seq(
      (1L, ts("2024-01-01 03:00:00"), Some(10L), 1.5, "aa", "d1"),
      (2L, ts("2024-01-01 09:00:00"), Some(7L), 2.5, "bb", "d1"),
      (3L, ts("2024-01-02 00:30:00"), None, 3.5, "cc", "d2"),
      (4L, ts("2024-01-02 23:00:00"), None, 4.5, "dd", "d2"),
      (5L, ts("2024-01-03 12:00:00"), Some(42L), 5.5, "ee", "d3"),
      (6L, ts("2024-01-03 13:00:00"), None, 6.5, "ff", "d3"))
      .toDF("id", "t", "x", "d", "s", "day")
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("id", "t", "x", "d", "s"))
  }

  /** Execute and classify: (rewrites-counter delta, had a file scan). */
  private def run(df: DataFrame): (Int, Boolean, Seq[org.apache.spark.sql.Row]) = {
    val before = StatsAggRule.rewrites.get
    val rows = df.collect().toSeq
    val delta = StatsAggRule.rewrites.get - before
    val scanned = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }.nonEmpty
    (delta, scanned, rows)
  }

  test("global count/count(col)/min/max over a bare scan answer from metadata " +
    "— no file scan — and match a forced full scan exactly") {
    val path = freshPath("basic")
    seed(path)
    val agg = ManifestTable.read(spark, path).agg(
      count(lit(1)).as("n"), count(col("x")).as("nx"),
      min(col("id")).as("mn_id"), max(col("id")).as("mx_id"),
      min(col("x")).as("mn_x"), max(col("x")).as("mx_x"),
      min(col("t")).as("mn_t"), max(col("t")).as("mx_t"))
    val (delta, scanned, rows) = run(agg)
    assert(delta == 1, s"expected exactly one metadata rewrite, saw $delta")
    assert(!scanned, "the rewritten plan must not contain a file scan")
    assert(agg.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation]), "leaves must be LocalRelation")
    // ground truth from a real scan (rule disabled)
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try {
      val truth = ManifestTable.read(spark, path).agg(
        count(lit(1)), count(col("x")), min(col("id")), max(col("id")),
        min(col("x")), max(col("x")), min(col("t")), max(col("t"))).collect().toSeq
      assert(rows == truth, s"metadata answer $rows != scan answer $truth")
    } finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
  }

  test("the SQL surface rewrites too (temp view → SubqueryAlias walk)") {
    val path = freshPath("sql")
    seed(path)
    ManifestTable.read(spark, path).createOrReplaceTempView("sagg_t")
    val q = spark.sql("SELECT count(*) AS n, max(t) AS mx FROM sagg_t")
    val (delta, scanned, rows) = run(q)
    assert(delta == 1 && !scanned)
    assert(rows.head.getLong(0) == 6L)
    assert(rows.head.getTimestamp(1) == ts("2024-01-03 13:00:00"))
  }

  test("exactness back-offs: double and string min/max, filtered scans, " +
    "and non-pcol grouped aggregates all fall back to a real scan") {
    val path = freshPath("backoff")
    seed(path)
    val t = ManifestTable.read(spark, path)
    // double: NaN/±0.0 hazards — excluded type
    val (d1, s1, r1) = run(t.agg(min(col("d")).as("mn")))
    assert(d1 == 0 && s1 && r1.head.getDouble(0) == 1.5)
    // string: truncation hazard — excluded type
    val (d2, s2, r2) = run(t.agg(max(col("s")).as("mx")))
    assert(d2 == 0 && s2 && r2.head.getString(0) == "ff")
    // a Filter between aggregate and scan stops the walk
    val (d3, s3, r3) = run(t.where(col("id") > 2L).agg(count(lit(1)).as("n")))
    assert(d3 == 0 && s3 && r3.head.getLong(0) == 4L)
    // a NON-pcol grouping never rewrites (GROUP BY pcol does — its
    // own test below)
    val (d4, s4, _) = run(t.groupBy(col("s")).agg(count(lit(1))))
    assert(d4 == 0 && s4)
    // count distinct never rewrites
    val (d5, s5, r5) = run(t.agg(countDistinct(col("x")).as("nd")))
    assert(d5 == 0 && s5 && r5.head.getLong(0) == 3L)
  }

  test("a pending deletion vector composes out of the fast path by plan " +
    "shape (the DV anti-join is not a bare scan) — values stay right") {
    val path = freshPath("dv")
    seed(path)
    ManifestTable.deleteWhereMoR(spark, path, "day", col("id") === 5L)
    val agg = ManifestTable.read(spark, path).agg(
      count(lit(1)).as("n"), max(col("x")).as("mx"))
    val (delta, scanned, rows) = run(agg)
    assert(delta == 0 && scanned, "a DV'd table must not answer from footers " +
      "(pre-delete bounds would resurrect the deleted max)")
    assert(rows.head.getLong(0) == 5L && rows.head.getLong(1) == 10L,
      s"id=5 held the x=42 max; after its deletion max must be 10: $rows")
  }

  test("kill switch: spark.graft.statsAgg.enabled=false leaves the plan alone") {
    val path = freshPath("kill")
    seed(path)
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try {
      val (delta, scanned, rows) =
        run(ManifestTable.read(spark, path).agg(count(lit(1)).as("n")))
      assert(delta == 0 && scanned && rows.head.getLong(0) == 6L)
    } finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
  }

  test("a table written WITHOUT statsColumns backs off (no committed " +
    "rowcount), and min/max on a statless column backs off") {
    val path = freshPath("nostats")
    val rows = Seq((1L, "p1", 3L), (2L, "p2", 9L)).toDF("id", "p", "v")
    ManifestTable.merge(spark, path, rows, Seq("id"), "p")
    val (d1, s1, r1) = run(ManifestTable.read(spark, path).agg(count(lit(1)).as("n")))
    assert(d1 == 0 && s1 && r1.head.getLong(0) == 2L)
    val path2 = freshPath("partial")
    ManifestTable.merge(spark, path2, rows, Seq("id"), "p", statsColumns = Seq("id"))
    // id answers from metadata; v has no zone map → the WHOLE rewrite
    // backs off (one unanswerable aggregate poisons the rewrite)
    val (d2, s2, r2) = run(ManifestTable.read(spark, path2)
      .agg(min(col("id")).as("a"), max(col("v")).as("b")))
    assert(d2 == 0 && s2 && r2.head.getLong(0) == 1L && r2.head.getLong(1) == 9L)
    // id alone rewrites
    val (d3, s3, r3) = run(ManifestTable.read(spark, path2)
      .agg(min(col("id")).as("a"), max(col("id")).as("b")))
    assert(d3 == 1 && !s3 && r3.head.getLong(0) == 1L && r3.head.getLong(1) == 2L)
  }

  test("partition-key equality and IN filters stay metadata-only (entries " +
    "are kept whole-or-not-at-all); any other conjunct backs off") {
    val path = freshPath("pfilter")
    seed(path)
    val t = ManifestTable.read(spark, path)
    // day = 'd2': both its ids are x-null → count(x)=0, min/max null
    val one = t.where(col("day") === "d2").agg(
      count(lit(1)).as("n"), count(col("x")).as("nx"),
      min(col("id")).as("mn"), max(col("x")).as("mxx"))
    val (d1, s1, r1) = run(one)
    assert(d1 == 1 && !s1, "pcol equality must answer from metadata")
    assert(r1.head.getLong(0) == 2L && r1.head.getLong(1) == 0L &&
      r1.head.getLong(2) == 3L && r1.head.isNullAt(3), s"$r1")
    // IN over two days
    val two = t.where(col("day").isin("d1", "d3")).agg(
      count(lit(1)).as("n"), max(col("x")).as("mx"))
    val (d2, s2, r2) = run(two)
    assert(d2 == 1 && !s2 && r2.head.getLong(0) == 4L && r2.head.getLong(1) == 42L)
    // keys matching no entry select zero entries: count 0, max NULL
    val nil = t.where(col("day").isin("d8", "d9")).agg(
      count(lit(1)).as("n"), max(col("x")).as("mx"))
    val (d3, s3, r3) = run(nil)
    assert(d3 == 1 && !s3 && r3.head.getLong(0) == 0L && r3.head.isNullAt(1))
    // a non-partition conjunct poisons the whole rewrite
    val mixed = t.where(col("day") === "d1" && col("id") > 0L)
      .agg(count(lit(1)).as("n"))
    val (d4, s4, r4) = run(mixed)
    assert(d4 == 0 && s4 && r4.head.getLong(0) == 2L)
    // inequality on the partition column is key-decidable too — the
    // per-key eval fallback narrows it (r18)
    val neq = t.where(col("day") =!= "d1").agg(count(lit(1)).as("n"))
    val (d5, s5, r5) = run(neq)
    assert(d5 == 1 && !s5 && r5.head.getLong(0) == 4L,
      "pcol inequality narrows through the eval fallback")
    // and the explicit partitionFilter read-path composes the same way
    val pf = ManifestTable.read(spark, path, partitionFilter = _ == "d3")
      .agg(count(lit(1)).as("n"), max(col("x")).as("mx"))
    val (d6, s6, r6) = run(pf)
    assert(d6 == 1 && !s6 && r6.head.getLong(0) == 2L && r6.head.getLong(1) == 42L)
  }

  test("EXPRESSION filters of the partition key narrow by per-key Catalyst " +
    "eval: substr/LIKE/OR/nullif and DATE-typed literals all stay " +
    "metadata-only and bit-equal; an eval-erroring filter backs off") {
    val path = freshPath("efilter")
    val rows = (1L to 40L).map { i =>
      val d = (i - 1) % 8 + 1
      val month = if (d <= 4) "01" else "02"
      (i, Some(i * 3), f"2024-$month-0${(d - 1) % 4 + 1}%d")
    }.toDF("id", "x", "day")
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("id", "x"), sumColumns = Seq("x"))
    def check(df: => org.apache.spark.sql.DataFrame, what: String): Unit = {
      val (d, s, r) = run(df)
      assert(d == 1 && !s, s"$what must narrow by per-key eval: d=$d scanned=$s")
      spark.conf.set("spark.graft.statsAgg.enabled", "false")
      try assert(r == df.collect().toSeq, s"$what: eval narrow != scan")
      finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    }
    val t = ManifestTable.read(spark, path)
    check(t.where(substring(col("day"), 1, 7) === "2024-01")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx")), "substr-eq")
    check(t.where(col("day").like("2024-02-%"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn")), "LIKE prefix")
    check(t.where(col("day") === "2024-01-01" || col("day") >= "2024-02-03")
      .agg(count(lit(1)).as("n")), "OR of key predicates")
    // NULL excludes: nullif nulls one key's predicate — SQL WHERE
    // drops null rows, per-entry constant so whole-entry exclusion
    check(t.where(nullif(col("day"), lit("2024-01-02")) > "2024-01-01")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx")), "nullif-null-excludes")
    // composes with GROUPED rewrites (incl. expression groupings)
    check(t.where(substring(col("day"), 1, 7) === "2024-01")
      .groupBy(col("day")).agg(count(lit(1)).as("n")).orderBy(col("day")),
      "expression filter × grouped")
    // a DATE-typed pcol with a DATE literal narrows through eval
    // (strOf has no date form — only the eval path can decide it)
    val dpath = freshPath("efilter_date")
    ManifestTable.merge(spark, dpath,
      rows.select(col("id"), col("x"), col("day").cast("date").as("day")),
      Seq("id"), "day", statsColumns = Seq("x"), sumColumns = Seq("x"))
    check(ManifestTable.read(spark, dpath)
      .where(col("day") > lit(java.sql.Date.valueOf("2024-01-04")))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx")), "date literal")
    // an eval-ERRORING filter (ANSI cast of a non-numeric key) backs
    // off to the scan, which owns the error — plan-only, never run
    val before = StatsAggRule.rewrites.get
    val bad = t.where(col("day").cast("int") > 0).agg(count(lit(1)).as("n"))
    bad.queryExecution.executedPlan
    assert(StatsAggRule.rewrites.get == before,
      "an eval-erroring filter must not answer from metadata")
    assert(bad.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s }.nonEmpty)
  }

  test("range predicates on the partition key and count(distinct pcol) " +
    "answer from metadata; non-pcol distinct still backs off") {
    val path = freshPath("prange")
    seed(path)
    val t = ManifestTable.read(spark, path)
    // ASCII string range on the partition column keeps entries whole
    val r = t.where(col("day") >= "d2").agg(
      count(lit(1)).as("n"), countDistinct(col("day")).as("nd"),
      max(col("id")).as("mx"))
    val (d1, s1, r1) = run(r)
    assert(d1 == 1 && !s1, "pcol range + count(distinct pcol) must be metadata")
    assert(r1.head.getLong(0) == 4L && r1.head.getLong(1) == 2L &&
      r1.head.getLong(2) == 6L, s"$r1")
    // strict bound flipped literal-first
    val r2 = t.where(lit("d3") > col("day")).agg(count(lit(1)).as("n"))
    val (d2, s2, rr2) = run(r2)
    assert(d2 == 1 && !s2 && rr2.head.getLong(0) == 4L)
    // numeric partition keys compare as parsed longs, not strings:
    // keys "2" and "10" — a string order would call 10 < 2
    val p2 = freshPath("pnum")
    val rows = Seq((1L, 2L, 5L), (2L, 10L, 9L)).toDF("id", "pu", "v")
    ManifestTable.merge(spark, p2, rows, Seq("id"), "pu", statsColumns = Seq("v"))
    val r3 = ManifestTable.read(spark, p2).where(col("pu") > 2L)
      .agg(count(lit(1)).as("n"), max(col("v")).as("mx"))
    val (d3, s3, rr3) = run(r3)
    assert(d3 == 1 && !s3 && rr3.head.getLong(0) == 1L && rr3.head.getLong(1) == 9L,
      "pu > 2 must keep ONLY key 10 (numeric order, not string order)")
    // count(distinct <non-pcol>) still backs off
    val (d4, s4, rr4) = run(t.agg(countDistinct(col("id")).as("nd")))
    assert(d4 == 0 && s4 && rr4.head.getLong(0) == 6L)
  }

  test("metadata aggregates survive a metadata-only column RENAME (stats " +
    "re-key to physical names; the rename Project maps back) and a compact " +
    "falls back by plan shape with unchanged values") {
    val path = freshPath("rename")
    seed(path)
    ManifestTable.renameColumn(spark, path, "x", "x2")
    val agg = ManifestTable.read(spark, path).agg(
      count(lit(1)).as("n"), count(col("x2")).as("nx"),
      min(col("x2")).as("mn"), max(col("x2")).as("mx"))
    val (d1, s1, r1) = run(agg)
    assert(d1 == 1 && !s1, "renamed column must still answer from metadata")
    assert(r1.head.getLong(0) == 6L && r1.head.getLong(1) == 3L &&
      r1.head.getLong(2) == 7L && r1.head.getLong(3) == 42L, s"$r1")
    // compaction folds every partition into ONE shared dir; entries
    // carry their PER-KEY stats forward verbatim, and the reader's
    // shared-dir row filter is itself a pcol-IN conjunct — so the
    // single-branch compacted table STAYS metadata-only, exactly
    ManifestTable.compact(spark, path, "day")
    val (d2, s2, r2) = run(ManifestTable.read(spark, path).agg(
      count(lit(1)).as("n"), max(col("x2")).as("mx")))
    assert(d2 == 1 && !s2 && r2.head.getLong(0) == 6L && r2.head.getLong(1) == 42L,
      "a fully-compacted table keeps the fast path: per-key stats are " +
        "carried verbatim and stale co-tenant rows are not entries")
  }

  test("merges keep the fast path honest: new partitions and rewritten " +
    "partitions re-answer from the NEW snapshot's stats") {
    val path = freshPath("evolve")
    seed(path)
    def fast(): (Long, Long, Long) = {
      val agg = ManifestTable.read(spark, path).agg(
        count(lit(1)).as("n"), min(col("id")).as("mn"), max(col("id")).as("mx"))
      val (delta, scanned, rows) = run(agg)
      assert(delta == 1 && !scanned)
      (rows.head.getLong(0), rows.head.getLong(1), rows.head.getLong(2))
    }
    assert(fast() == ((6L, 1L, 6L)))
    // append a new day and rewrite day1 (id 1 gains a sibling id 99)
    val more = Seq(
      (99L, ts("2024-01-01 22:00:00"), Some(1L), 9.9, "zz", "d1"),
      (7L, ts("2024-01-04 01:00:00"), Some(3L), 7.7, "gg", "d4"))
      .toDF("id", "t", "x", "d", "s", "day")
    ManifestTable.merge(spark, path, more, Seq("id"), "day",
      statsColumns = Seq("id", "t", "x", "d", "s"))
    assert(fast() == ((8L, 1L, 99L)))
  }

  test("sum/avg from committed per-dir sums (merge(sumColumns)): global and " +
    "per-key answers fold exactly — nulls ignored by sum, avg under the " +
    "2^53 proof — and every honesty boundary backs off") {
    val path = freshPath("sums")
    val rows = Seq(
      (1L, Some(10L), 1.5, "d1"), (2L, Some(7L), 2.5, "d1"),
      (3L, None, 3.5, "d2"), (4L, Some(-4L), 4.5, "d2"),
      (5L, Some(42L), 5.5, "d3"), (6L, None, 6.5, "d3"))
      .toDF("id", "x", "d", "day")
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("id", "x"), sumColumns = Seq("id", "x"))
    def q = ManifestTable.read(spark, path).agg(
      sum(col("id")).as("si"), sum(col("x")).as("sx"),
      avg(col("id")).as("ai"), avg(col("x")).as("ax"))
    val (d1, s1, r1) = run(q)
    assert(d1 == 1 && !s1, "sum/avg must answer from metadata")
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(r1 == q.collect().toSeq, "metadata sum/avg must be BIT-equal")
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    assert(r1.head.getLong(1) == 55L && r1.head.getDouble(3) == 55.0 / 4.0,
      s"sum ignores nulls, avg divides by the non-null count: $r1")
    // grouped per day
    def g = ManifestTable.read(spark, path).groupBy(col("day"))
      .agg(sum(col("x")).as("sx"), avg(col("x")).as("ax")).orderBy(col("day"))
    val (d2, s2, r2) = run(g)
    assert(d2 == 1 && !s2)
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(r2 == g.collect().toSeq)
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    // a column with NO committed sum backs off (d is double anyway —
    // collectSums refuses float columns at write time)
    intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, path,
        Seq((9L, Some(1L), 9.9, "d1")).toDF("id", "x", "d", "day"),
        Seq("id"), "day", sumColumns = Seq("d"))
    }
    val (d3, s3, _) = run(ManifestTable.read(spark, path)
      .agg(sum(col("d")).as("sd")))
    assert(d3 == 0 && s3, "no committed sum -> scan")
    // a DV fold DROPS the sums AND the value-exactness certificate:
    // neither sum nor the stale zone-map max may answer post-fold
    ManifestTable.deleteWhereMoR(spark, path, "day", col("id") === 5L)
    ManifestTable.compact(spark, path, "day")
    def qf = ManifestTable.read(spark, path).agg(
      sum(col("x")).as("sx"), max(col("x")).as("mx"))
    val (d4, s4, r4) = run(qf)
    assert(d4 == 0 && s4,
      "post-DV-fold metadata is supersets, not values — must scan")
    assert(r4.head.getLong(0) == 13L && r4.head.getLong(1) == 10L,
      s"id=5 held x=42; after its deletion sum=13 max=10: $r4")
    // a statsful foldMoR RE-RECORDS the family: on a clean table, a
    // MoR delete then foldMoR(sumColumns) restores the global
    // metadata answer with post-delete values exact
    val path2 = freshPath("sumsfold")
    ManifestTable.merge(spark, path2, rows, Seq("id"), "day",
      statsColumns = Seq("id", "x"), sumColumns = Seq("id", "x"))
    ManifestTable.deleteWhereMoR(spark, path2, "day", col("id") === 5L)
    val folded = ManifestTable.foldMoR(spark, path2, "day",
      statsColumns = Seq("id", "x"), sumColumns = Seq("id", "x"))
    assert(folded == 1L)
    val (d5, s5, r5) = run(ManifestTable.read(spark, path2).agg(
      sum(col("x")).as("sx"), max(col("x")).as("mx")))
    assert(d5 == 1 && !s5,
      "a statsful foldMoR(sumColumns) must restore the metadata answer")
    assert(r5.head.getLong(0) == 13L && r5.head.getLong(1) == 10L,
      s"id=5 held x=42; after its deletion sum=13 max=10: $r5")
  }

  test("an overflowing folded sum backs off at plan time (the scan's " +
    "overflow behavior — ANSI error or legacy wrap — belongs to the scan)") {
    val path = freshPath("sumovf")
    val big = Long.MaxValue / 2 + 1
    ManifestTable.merge(spark, path,
      Seq((1L, big, "a"), (2L, big, "b")).toDF("id", "x", "day"),
      Seq("id"), "day", statsColumns = Seq("x"), sumColumns = Seq("x"))
    val before = StatsAggRule.rewrites.get
    val df = ManifestTable.read(spark, path).agg(sum(col("x")).as("sx"))
    df.queryExecution.executedPlan // force optimization, never execute
    assert(StatsAggRule.rewrites.get == before,
      "a Long-overflowing fold must not answer from metadata")
    assert(df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s }.nonEmpty)
  }

  test("DECIMAL sum/avg from committed per-dir sums: exact fixed-point fold " +
    "emitting the scan's own result types, avg through Spark's own " +
    "Divide/Cast tree — bit-equal to the scan — and a fold past the scan's " +
    "CheckOverflowInSum precision backs off at plan time") {
    val path = freshPath("decsums")
    val rows = Seq(
      (1L, Option(BigDecimal("12345.67891234")), "d1"),
      (2L, Option(BigDecimal("-0.00000001")), "d1"),
      (3L, Option.empty[BigDecimal], "d2"),
      (4L, Option(BigDecimal("77777777777.12345678")), "d2"),
      (5L, Option(BigDecimal("0.99999999")), "d3"),
      (6L, Option(BigDecimal("1.00000003")), "d3"),
      (7L, Option.empty[BigDecimal], "d4")) // an ALL-NULL partition
      .toDF("id", "p", "day")
      .select(col("id"), col("p").cast("decimal(20,8)").as("p"), col("day"))
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("id", "p"), sumColumns = Seq("p"))
    def q = ManifestTable.read(spark, path).agg(
      sum(col("p")).as("sp"), avg(col("p")).as("ap"))
    val (d1, s1, r1) = run(q)
    assert(d1 == 1 && !s1, "decimal sum/avg must answer from metadata")
    assert(q.schema("sp").dataType.sql == "DECIMAL(30,8)" &&
      q.schema("ap").dataType.sql == "DECIMAL(24,12)",
      s"the rewrite must keep the scan's Sum/Average result types: ${q.schema}")
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(r1 == q.collect().toSeq,
      "metadata decimal sum/avg must be BIT-equal to the scan")
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    // grouped per day — incl. the all-null day folding to SQL NULLs
    def g = ManifestTable.read(spark, path).groupBy(col("day"))
      .agg(sum(col("p")).as("sp"), avg(col("p")).as("ap")).orderBy(col("day"))
    val (d2, s2, r2) = run(g)
    assert(d2 == 1 && !s2)
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(r2 == g.collect().toSeq)
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    assert(r2.last.isNullAt(1) && r2.last.isNullAt(2),
      s"an all-null partition's sum and avg are SQL NULL: ${r2.last}")
    // a fold past the output precision backs off: decimal(38,0) caps
    // Sum's widening at 38 digits, so two near-max per-dir sums (each
    // committed fine at write time) overflow the FOLD — the plan must
    // fall back to the scan, which owns the overflow behavior
    val ovf = freshPath("decovf")
    val big = "9" * 38
    ManifestTable.merge(spark, ovf,
      Seq((1L, big, "a"), (2L, big, "b")).toDF("id", "p", "day")
        .select(col("id"), col("p").cast("decimal(38,0)").as("p"), col("day")),
      Seq("id"), "day", statsColumns = Seq("p"), sumColumns = Seq("p"))
    val before = StatsAggRule.rewrites.get
    val dfo = ManifestTable.read(spark, ovf).agg(sum(col("p")).as("sp"))
    dfo.queryExecution.executedPlan // force optimization, never execute
    assert(StatsAggRule.rewrites.get == before,
      "a precision-overflowing decimal fold must not answer from metadata")
    assert(dfo.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s }.nonEmpty)
  }

  test("GROUP BY pcol folds per-key count/count(col)/min/max from each " +
    "entry's metadata — no scan — incl. min/max of the key column itself " +
    "(strings exact: the key IS the value), matching the real scan") {
    val path = freshPath("grouped")
    seed(path)
    def q = ManifestTable.read(spark, path).groupBy(col("day")).agg(
      count(lit(1)).as("n"), count(col("x")).as("nx"),
      min(col("id")).as("mn_id"), max(col("t")).as("mx_t"),
      min(col("day")).as("mn_day"), max(col("day")).as("mx_day"))
      .orderBy(col("day"))
    val (delta, scanned, rows) = run(q)
    assert(delta == 1, s"expected one grouped metadata rewrite, saw $delta")
    assert(!scanned, "the grouped rewrite must not contain a file scan")
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(rows == q.collect().toSeq, "grouped metadata != scan answer")
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    // a pcol FILTER composes: surviving entries only
    def qf = ManifestTable.read(spark, path).where(col("day") >= "d2")
      .groupBy(col("day")).agg(count(lit(1)).as("n")).orderBy(col("day"))
    val (d2, s2, r2) = run(qf)
    assert(d2 == 1 && !s2)
    assert(r2.map(r => (r.getString(0), r.getLong(1))) == Seq(("d2", 2L), ("d3", 2L)))
    // bare DISTINCT-shaped grouping (no aggregates) answers too
    val (d3, s3, r3) = run(ManifestTable.read(spark, path)
      .groupBy(col("day")).agg(max(col("day")).as("mx")).select(col("day"))
      .orderBy(col("day")))
    assert(d3 == 1 && !s3 && r3.map(_.getString(0)) == Seq("d1", "d2", "d3"))
  }

  test("GROUP BY an EXPRESSION of pcol merges whole entries per evaluated " +
    "value — the month-rollup dashboard query scanless — with counts/sums " +
    "adding, min/max combining, and the key column folding from member keys") {
    val path = freshPath("gexpr")
    val rows = Seq(
      (1L, Some(10L), BigDecimal("1.5"), "2024-01-01"),
      (2L, Some(7L), BigDecimal("2.5"), "2024-01-02"),
      (3L, None, BigDecimal("3.25"), "2024-01-03"),
      (4L, Some(-4L), BigDecimal("4.5"), "2024-02-01"),
      (5L, Some(42L), BigDecimal("5.5"), "2024-02-02"),
      (6L, None, BigDecimal("6.5"), "2024-02-02"))
      .toDF("id", "x", "p", "day")
      .select(col("id"), col("x"), col("p").cast("decimal(20,8)").as("p"), col("day"))
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("id", "x", "p"), sumColumns = Seq("x", "p"))
    def q = ManifestTable.read(spark, path)
      .groupBy(substring(col("day"), 1, 7).as("month"))
      .agg(count(lit(1)).as("n"), count(col("x")).as("nx"),
        sum(col("x")).as("sx"), avg(col("x")).as("ax"),
        sum(col("p")).as("sp"),
        min(col("day")).as("mn_day"), max(col("day")).as("mx_day"),
        max(col("id")).as("mx_id"))
      .orderBy(col("month"))
    val (delta, scanned, rs) = run(q)
    assert(delta == 1 && !scanned,
      s"the expression grouping must fold from metadata: delta=$delta scanned=$scanned")
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(rs == q.collect().toSeq, "expression-grouped metadata != scan")
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    assert(rs.map(_.getString(0)) == Seq("2024-01", "2024-02"))
    assert(rs.map(_.getLong(1)) == Seq(3L, 3L) &&
      rs.map(_.getString(6)) == Seq("2024-01-01", "2024-02-01") &&
      rs.map(_.getString(7)) == Seq("2024-01-03", "2024-02-02"))
    // the SQL surface normalizes to the same _groupingexpression shape
    ManifestTable.read(spark, path).createOrReplaceTempView("gexpr_t")
    def qs = spark.sql(
      "SELECT substr(day, 1, 7) AS month, count(*) AS n, sum(x) AS sx " +
        "FROM gexpr_t GROUP BY substr(day, 1, 7) ORDER BY month")
    val (ds, ss, rsql) = run(qs)
    assert(ds == 1 && !ss)
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(rsql == qs.collect().toSeq)
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    // a pcol FILTER composes with the expression grouping
    def qf = ManifestTable.read(spark, path).where(col("day") >= "2024-02")
      .groupBy(substring(col("day"), 1, 7).as("month"))
      .agg(count(lit(1)).as("n"))
    val (df1, sf1, rf) = run(qf)
    assert(df1 == 1 && !sf1 &&
      rf.map(r => (r.getString(0), r.getLong(1))) == Seq(("2024-02", 3L)))
    // an expression whose driver-side eval THROWS on these keys (ANSI
    // cast of a non-numeric key) must back off to the scan — which
    // owns the error — not crash the planner; plan-only, never run
    val before = StatsAggRule.rewrites.get
    val bad = ManifestTable.read(spark, path)
      .groupBy((col("day").cast("int") + 1).as("g")).agg(count(lit(1)).as("n"))
    bad.queryExecution.executedPlan // force optimization
    assert(StatsAggRule.rewrites.get == before,
      "an eval-throwing grouping must not answer from metadata")
    assert(bad.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s }.nonEmpty)
  }

  test("MULTI-COLUMN groupings — several expressions of the one partition " +
    "key (the year/month rollup) — merge entries per evaluated TUPLE, " +
    "scanless and bit-equal; a tuple mixing in a data column backs off") {
    val path = freshPath("gmulti")
    val rows = (1L to 40L).map { i =>
      val d = (i - 1) % 8 + 1
      val month = if (d <= 4) "01" else "02"
      (i, Some(i * 3), f"2024-$month-0${(d - 1) % 4 + 1}%d")
    }.toDF("id", "x", "day")
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("id", "x"), sumColumns = Seq("x"))
    def q = ManifestTable.read(spark, path)
      .groupBy(substring(col("day"), 6, 2).as("month"),
        (substring(col("day"), 10, 1).cast("int") % 2).as("par"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        min(col("day")).as("mn_day"))
      .orderBy(col("month"), col("par"))
    val (d1, s1, rs) = run(q)
    assert(d1 == 1 && !s1, s"tuple grouping must fold from metadata: $d1 $s1")
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(rs == q.collect().toSeq, "tuple-grouped metadata != scan")
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    assert(rs.size == 4, s"two months × two parities: $rs")
    // bare pcol + an expression of it together
    def q2 = ManifestTable.read(spark, path)
      .groupBy(col("day"), substring(col("day"), 6, 2).as("month"))
      .agg(count(lit(1)).as("n")).orderBy(col("day"))
    val (d2, s2, rs2) = run(q2)
    assert(d2 == 1 && !s2)
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(rs2 == q2.collect().toSeq)
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    // a tuple with a NON-pcol member backs the whole rewrite off
    val (d3, s3, _) = run(ManifestTable.read(spark, path)
      .groupBy(substring(col("day"), 6, 2).as("month"), (col("id") % 2).as("g"))
      .agg(count(lit(1)).as("n")))
    assert(d3 == 0 && s3, "a non-pcol tuple member must back off")
  }

  test("a MULTI-BIN compacted table keeps the metadata fast path: the " +
    "union-of-branches read (bins + exclusive dirs) folds additively — " +
    "global, grouped, expression-grouped and pcol-filtered aggregates all " +
    "scanless and bit-equal — and a DV'd branch backs the whole union off") {
    val path = freshPath("unioncomp")
    val rows = (1L to 90L).map { i =>
      val d = (i - 1) % 9 + 1
      (i, if (i % 11 == 0) None else Some(i * 3),
        BigDecimal(i).setScale(2) * BigDecimal("0.25"), f"2024-01-0$d%d")
    }.toDF("id", "x", "p", "day")
      .select(col("id"), col("x"), col("p").cast("decimal(20,8)").as("p"), col("day"))
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("id", "x", "p"), sumColumns = Seq("x", "p"))
    // pack ~3 small dirs per bin; 9 dirs → ≥2 shared bins (+ possibly
    // an exclusive leftover under minDirs)
    val avgBytes = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val ds = ManifestTable.read(spark, path).inputFiles
        .map(f => fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)
      ds.sum / ds.length
    }
    val res = ManifestTable.compact(spark, path, "day",
      targetBytes = (avgBytes * 3.2).toLong, minDirs = 2)
    assert(res.committed && res.binsWritten >= 2,
      s"need a MULTI-bin layout for this pin: $res")
    // global over the union of branches
    def qg = ManifestTable.read(spark, path).agg(
      count(lit(1)).as("n"), count(col("x")).as("nx"),
      min(col("id")).as("mn"), max(col("id")).as("mx"),
      sum(col("x")).as("sx"), avg(col("x")).as("ax"),
      sum(col("p")).as("sp"), countDistinct(col("day")).as("nd"))
    val (d1, s1, r1) = run(qg)
    assert(d1 == 1 && !s1,
      s"a multi-bin compacted table must keep the metadata fast path: $d1 $s1")
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(r1 == qg.collect().toSeq, "union fold != scan")
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    // grouped by pcol and by an expression of it, across bins
    def qd = ManifestTable.read(spark, path).groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx")).orderBy(col("day"))
    val (d2, s2, r2) = run(qd)
    assert(d2 == 1 && !s2)
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(r2 == qd.collect().toSeq)
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    def qe = ManifestTable.read(spark, path)
      .groupBy((substring(col("day"), 10, 1).cast("int") % 2).as("g"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"),
        max(col("day")).as("mxd"))
      .orderBy(col("g"))
    val (d3, s3, r3) = run(qe)
    assert(d3 == 1 && !s3)
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    try assert(r3 == qe.collect().toSeq)
    finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    // a pcol filter composes per branch (some branches may empty out)
    def qf = ManifestTable.read(spark, path).where(col("day") >= "2024-01-07")
      .agg(count(lit(1)).as("n"))
    val (d4, s4, r4) = run(qf)
    assert(d4 == 1 && !s4 && r4.head.getLong(0) == 30L)
    // a DV on one branch poisons the whole union (plan shape: the
    // DV'd branch joins its sidecar) — fall back, values exact
    ManifestTable.deleteWhereMoR(spark, path, "day", col("id") === 7L)
    def qdv = ManifestTable.read(spark, path).agg(count(lit(1)).as("n"))
    val (d5, s5, r5) = run(qdv)
    assert(d5 == 0 && s5, "a DV'd branch must back the union off")
    assert(r5.head.getLong(0) == 89L)
  }

  test("grouped back-offs: non-pcol grouping, computed grouping, row filter " +
    "on a data column, count(distinct), string bounds of a non-key column, " +
    "and a pending DV all fall back to the scan with unchanged results") {
    val path = freshPath("gback")
    seed(path)
    val t = ManifestTable.read(spark, path)
    // non-pcol grouping
    val (d1, s1, _) = run(t.groupBy(col("s")).agg(count(lit(1)).as("n")))
    assert(d1 == 0 && s1)
    // computed grouping over a NON-pcol column
    val (d2, s2, _) = run(t.groupBy(substring(col("s"), 1, 1).as("g"))
      .agg(count(lit(1)).as("n")))
    assert(d2 == 0 && s2)
    // computed grouping mixing pcol with a data column
    val (d2b, s2b, _) = run(t.groupBy(concat(col("day"), col("s")).as("g"))
      .agg(count(lit(1)).as("n")))
    assert(d2b == 0 && s2b)
    // row filter on a data column
    val (d3, s3, _) = run(t.where(col("id") > 2L).groupBy(col("day"))
      .agg(count(lit(1)).as("n")))
    assert(d3 == 0 && s3)
    // count(distinct) per group is not metadata-derivable
    val (d4, s4, _) = run(t.groupBy(col("day")).agg(countDistinct(col("x"))))
    assert(d4 == 0 && s4)
    // string bounds of a NON-key column stay excluded (footer truncation)
    val (d5, s5, _) = run(t.groupBy(col("day")).agg(max(col("s")).as("mx")))
    assert(d5 == 0 && s5)
    // a pending DV poisons the bare scan (anti-join in the plan)
    ManifestTable.deleteWhereMoR(spark, path, "day", col("id") === 5L)
    def qdv = ManifestTable.read(spark, path).groupBy(col("day"))
      .agg(count(lit(1)).as("n")).orderBy(col("day"))
    val (d6, s6, r6) = run(qdv)
    assert(d6 == 0 && s6, "a DV'd table must fall back to the real scan")
    assert(r6.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("d1", 2L), ("d2", 2L), ("d3", 1L)), "post-delete groups exact")
  }

  test("COUNT(DISTINCT expr-of-pcol) answers from live entry keys — global, " +
    "grouped, alongside other aggregates — and non-pcol references back off") {
    val path = freshPath("cdexpr")
    seed(path)
    val t = ManifestTable.read(spark, path)
    // global: distinct prefixes of the key ('d' for all three days)
    def g1 = t.agg(countDistinct(substring(col("day"), 1, 1)).as("np"),
      countDistinct(col("day")).as("nd"), count(lit(1)).as("n"))
    val (d1, s1, r1) = run(g1)
    assert(d1 == 1 && !s1, s"global distinct-expr must be scanless: $d1 $s1")
    assert(r1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      Seq((1L, 3L, 6L)))
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    val truth1 = try g1.collect().toSeq
      finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    assert(r1 == truth1, "distinct-expr answer must equal the scan answer")

    // grouped: per prefix-group, distinct full keys
    def g2 = t.groupBy(substring(col("day"), 1, 1).as("p"))
      .agg(countDistinct(col("day")).as("nd"), count(lit(1)).as("n"))
    val (d2, s2, r2) = run(g2)
    assert(d2 == 1 && !s2, s"grouped distinct-expr must be scanless: $d2 $s2")
    assert(r2.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ==
      Seq(("d", 3L, 6L)))

    // a non-pcol reference inside the distinct expression backs off
    val (d3, s3, _) = run(t.agg(
      countDistinct(concat(col("day"), col("s"))).as("nc")))
    assert(d3 == 0 && s3, "a data-column reference must fall back to the scan")
    // a non-deterministic distinct expression backs off (rule-level:
    // the reference check never sees it because analysis rejects
    // nondeterministic agg args; pin the pcol-less shape instead)
    val (d4, s4, _) = run(t.agg(countDistinct(col("s")).as("ns")))
    assert(d4 == 0 && s4, "distinct over a data column must scan")
  }

  test("TIMESTAMP-keyed partitions take the grouped/expression fast paths " +
    "under the writer-zone certificate; a zone-mismatched session backs off " +
    "to the scan and a zone-mismatched writer refuses") {
    assert(spark.sessionState.conf.sessionLocalTimeZone == "UTC",
      "the test contract: session zone is UTC")
    val path = freshPath("tskey")
    // hourly partitions with a non-zero fraction key to exercise the
    // trailing-zero-trimmed rendering too
    val rows = Seq(
      (1L, ts("2024-01-01 03:00:00"), 10L),
      (2L, ts("2024-01-01 03:00:00"), 7L),
      (3L, ts("2024-01-01 09:00:00"), 5L),
      (4L, ts("2024-01-02 00:00:00"), 4L),
      (5L, ts("2024-01-02 23:30:00.5"), 42L),
      (6L, ts("2024-01-02 23:30:00.5"), 1L))
      .toDF("id", "hr", "x")
    ManifestTable.merge(spark, path, rows, Seq("id"), "hr",
      statsColumns = Seq("id", "x"), sumColumns = Seq("x"))
    assert(ManifestTable.readProps(spark, path)
      .get(ManifestTable.PartitionTzProp).contains("UTC"),
      "the writer zone certificate must be stamped")
    val t = ManifestTable.read(spark, path)
    // grouped by an expression of the timestamp key: the day rollup
    def g = t.groupBy(date_trunc("day", col("hr")).as("day"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        max(col("hr")).as("mx_hr"))
      .orderBy(col("day"))
    val (d1, s1, r1) = run(g)
    assert(d1 == 1 && !s1, s"day rollup over hourly ts keys must be scanless: $d1 $s1")
    spark.conf.set("spark.graft.statsAgg.enabled", "false")
    val truth = try g.collect().toSeq
      finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
    assert(r1 == truth, "rollup values must equal the scan's")
    // expression FILTER of the timestamp key + distinct expr
    def f = t.where(col("hr") >= "2024-01-02 00:00:00")
      .agg(count(lit(1)).as("n"),
        countDistinct(date_trunc("day", col("hr"))).as("ndays"))
    val (d2, s2, r2) = run(f)
    assert(d2 == 1 && !s2, s"ts-key filter + distinct-expr must be scanless: $d2 $s2")
    assert(r2.map(r => (r.getLong(0), r.getLong(1))) == Seq((3L, 1L)))
    // a session in a DIFFERENT zone than the writer: back off (the
    // key text would decode to different instants), values unchanged
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val (d3, s3, _) = run(t.groupBy(date_trunc("day", col("hr")).as("day"))
        .agg(count(lit(1)).as("n")))
      assert(d3 == 0 && s3, "a zone-mismatched reader must scan")
      // and a zone-mismatched WRITER refuses loudly
      val e = intercept[IllegalArgumentException] {
        ManifestTable.merge(spark, path,
          Seq((9L, ts("2024-01-03 00:00:00"), 1L)).toDF("id", "hr", "x"),
          Seq("id"), "hr")
      }
      assert(e.getMessage.contains("rendered in zone"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("a LEGACY timestamp-keyed table (written before the certificate) is " +
    "never stamped retroactively: merges leave it uncertified and the fast " +
    "paths scan, until certifyPartitionTz records the operator's attestation") {
    assert(spark.sessionState.conf.sessionLocalTimeZone == "UTC",
      "the test contract: session zone is UTC")
    val path = freshPath("tslegacy")
    val rows = Seq(
      (1L, ts("2024-02-01 03:00:00"), 10L),
      (2L, ts("2024-02-01 09:00:00"), 5L),
      (3L, ts("2024-02-02 00:00:00"), 4L)).toDF("id", "hr", "x")
    ManifestTable.merge(spark, path, rows, Seq("id"), "hr",
      statsColumns = Seq("id", "x"), sumColumns = Seq("x"))
    // simulate the pre-certificate table: strip the creating stamp
    ManifestTable.stripDurablePropForTest(spark, path, ManifestTable.PartitionTzProp)
    // a post-upgrade merge must NOT stamp the CURRENT session zone
    // retroactively — the legacy keys' rendering zone is unknowable,
    // and a wrong certificate would decode them to wrong instants
    // undetectably (the per-key round-trip holds in any fixed zone)
    ManifestTable.merge(spark, path,
      Seq((4L, ts("2024-02-03 00:00:00"), 7L)).toDF("id", "hr", "x"),
      Seq("id"), "hr", statsColumns = Seq("id", "x"), sumColumns = Seq("x"))
    assert(!ManifestTable.readProps(spark, path)
      .contains(ManifestTable.PartitionTzProp),
      "no retroactive certificate on a legacy table")
    def g = ManifestTable.read(spark, path)
      .groupBy(date_trunc("day", col("hr")).as("day"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .orderBy(col("day"))
    val (d0, s0, r0) = run(g)
    assert(d0 == 0 && s0, s"an uncertified ts-keyed table must scan: $d0 $s0")
    // a non-fixed-offset attestation refuses (no reader honors it)
    intercept[IllegalArgumentException] {
      ManifestTable.certifyPartitionTz(spark, path, "America/New_York")
    }
    // the operator attests the true writer zone → fast paths return
    ManifestTable.certifyPartitionTz(spark, path, "UTC")
    assert(ManifestTable.readProps(spark, path)
      .get(ManifestTable.PartitionTzProp).contains("UTC"))
    ManifestTable.certifyPartitionTz(spark, path, "UTC") // idempotent no-op
    val (d1, s1, r1) = run(g)
    assert(d1 == 1 && !s1, s"a certified legacy table takes the fast path: $d1 $s1")
    assert(r1 == r0, "certified metadata answers must equal the scan's")
    // a CONFLICTING re-attestation refuses loudly
    val e = intercept[RuntimeException] {
      ManifestTable.certifyPartitionTz(spark, path, "UTC+05:30")
    }
    assert(e.getMessage.contains("already certified"))
  }
}
