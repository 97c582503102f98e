package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GraftFileIndex, ManifestTable}

/** Catalyst-integrated automatic data skipping (GraftFileIndex): a
  * plain `ManifestTable.read(path).where(…)` must prune whole data
  * dirs through `FileSourceStrategy`'s `dataFilters`, with the same
  * conservative rules the explicit `readSkipping` forms follow — and
  * every pruned plan must return exactly the rows an unpruned scan
  * would.
  */
class GraftFileIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_gfi_$tag").toString + "/t"

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s + " 00:00:00")

  /** Three day-partitions with disjoint `v` ranges and id ranges:
    * day1 ids 1-2 v [1,5]; day2 ids 3-4 v [10,15]; day3 ids 5-6
    * v [100,200]. Stats on v+id, bloom on id. */
  private def seed(path: String): Unit = {
    val base = Seq(
      (1L, ts("2024-01-01"), 1.0, "a"), (2L, ts("2024-01-01"), 5.0, "b"),
      (3L, ts("2024-01-02"), 10.0, "c"), (4L, ts("2024-01-02"), 15.0, "d"),
      (5L, ts("2024-01-03"), 100.0, "e"), (6L, ts("2024-01-03"), 200.0, "f"))
      .toDF("id", "day", "v", "s")
    ManifestTable.merge(spark, path, base, Seq("id"), "day",
      statsColumns = Seq("v", "id"), bloomColumns = Seq("id"))
  }

  /** Run `df` to completion and return the summed `(kept, total)`
    * pruning evidence of every GraftFileIndex its scans consulted.
    * The index object lives on the shared HadoopFsRelation, so the
    * pre-AQE `sparkPlan` finds the same instance the executed scan
    * updated. */
  private def evidence(df: DataFrame): (Long, Long) = {
    df.collect()
    val prunes = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collect { case g: GraftFileIndex => g.lastPrune }.flatten
    assert(prunes.nonEmpty, "no GraftFileIndex recorded a filtered listFiles " +
      "(the filter never reached the scan as a dataFilter)")
    (prunes.map(_._1).sum, prunes.map(_._2).sum)
  }

  test("a plain read + range filter prunes dirs via committed zone maps") {
    val path = freshPath("range")
    seed(path)
    val df = ManifestTable.read(spark, path).where(col("v") >= 12.0 && col("v") <= 50.0)
    val (kept, total) = evidence(df)
    assert(total == 3L, s"3 day dirs expected, saw $total")
    assert(kept == 1L, s"[12,50] intersects only day2's [10,15]; kept $kept")
    assert(df.select("id").as[Long].collect().toSet == Set(4L),
      "the pruned scan still row-filters: only v=15 satisfies the predicate")
    // v > col literal-on-the-left shape
    val df2 = ManifestTable.read(spark, path).where(lit(8.0) > col("v"))
    val (k2, _) = evidence(df2)
    assert(k2 == 1L && df2.count() == 2L, "8 > v keeps only day1")
  }

  test("equality probes consult the bloom dir-index; misses prune to zero") {
    val path = freshPath("bloom")
    seed(path)
    val hit = ManifestTable.read(spark, path).where(col("id") === 5L)
    val (kh, th) = evidence(hit)
    assert(th == 3L && kh == 1L, s"id=5 lives in day3 only; kept $kh/$th")
    assert(hit.select("s").as[String].collect().toSeq == Seq("e"))
    // id outside every [min,max]: zone maps alone exclude all dirs
    val miss = ManifestTable.read(spark, path).where(col("id") === 99L)
    val (km, _) = evidence(miss)
    assert(km == 0L && miss.count() == 0L,
      "an impossible key must prune every dir yet return a schema'd empty frame")
    assert(miss.schema.fieldNames.toSeq == Seq("id", "day", "v", "s"))
  }

  test("AND prunes on either conjunct, OR needs both sides excluded") {
    val path = freshPath("bool")
    seed(path)
    val and = ManifestTable.read(spark, path)
      .where(col("v") > 12.0 && col("s") =!= "zz")
    val (ka, _) = evidence(and)
    assert(ka == 2L, s"v > 12 excludes day1 regardless of the statless s-conjunct; kept $ka")
    assert(and.count() == 3L)
    val or = ManifestTable.read(spark, path)
      .where(col("v") < 3.0 || col("v") > 150.0)
    val (ko, _) = evidence(or)
    assert(ko == 2L, s"only day2 [10,15] is excluded by BOTH disjuncts; kept $ko")
    assert(or.select("id").as[Long].collect().toSet == Set(1L, 6L))
  }

  test("conservative: statless columns and non-literal shapes never prune") {
    val path = freshPath("cons")
    seed(path)
    // s has no stats and no bloom
    val s1 = ManifestTable.read(spark, path).where(col("s") === "a")
    val (k1, _) = evidence(s1)
    assert(k1 == 3L && s1.count() == 1L, "statless column must scan every dir")
    // a function wraps the column: unknown shape, keep all
    val s2 = ManifestTable.read(spark, path).where(abs(col("v")) > 150.0)
    val (k2, _) = evidence(s2)
    assert(k2 == 3L && s2.count() == 1L, "abs(v) is not a col-op-literal; no pruning")
  }

  test("an aux-carrying entry is never pruned: updated values outside the " +
    "recorded bounds still surface") {
    val path = freshPath("aux")
    seed(path)
    // push row id=1 (day1, recorded v-range [1,5]) to v=999
    val r = ManifestTable.updateWhereMoR(spark, path, "day",
      col("id") === 1L, Map("v" -> lit(999.0)))
    assert(r.rowsUpdated == 1L && r.dirsRewritten == 0L)
    val hi = ManifestTable.read(spark, path).where(col("v") > 500.0)
    val (kept, total) = evidence(hi)
    assert(hi.select("id").as[Long].collect().toSet == Set(1L),
      "the appendix row v=999 must survive a filter its dir's stats exclude")
    assert(kept < total,
      s"day2/day3 still prune by zone map even with day1 unprunable ($kept/$total)")
    // MoR DELETE: dv'd rows stay invisible through the pruned scan
    ManifestTable.deleteWhereMoR(spark, path, "day", col("id") === 6L)
    val d = ManifestTable.read(spark, path).where(col("v") > 150.0)
    assert(d.select("id").as[Long].collect().toSet == Set(1L),
      "id=6 (v=200) is DV-deleted; only the 999-appendix row remains above 150")
  }

  test("a renamed column prunes under its current name (stats live under " +
    "the physical name)") {
    val path = freshPath("ren")
    seed(path)
    ManifestTable.renameColumn(spark, path, "v", "price")
    val df = ManifestTable.read(spark, path)
      .where(col("price") >= 12.0 && col("price") <= 50.0)
    val (kept, total) = evidence(df)
    assert(kept == 1L && total == 3L,
      s"rename is metadata-only: the physical zone map must still prune ($kept/$total)")
    assert(df.select("id").as[Long].collect().toSet == Set(4L),
      "within the kept dir only v=15 satisfies the range")
  }

  /** Three day-partitions for the r14 skipping shapes: day1 `v` ALL
    * null / s in [aa,bb]; day2 `v` non-null [10,15] / s in [cc,dd];
    * day3 `v` mixed-null / s in [ee,ff]. Stats on v+s+day. */
  private def seedNullStr(path: String): Unit = {
    val rows: Seq[(Long, java.sql.Timestamp, Option[Double], String)] = Seq(
      (1L, ts("2024-01-01"), None, "aa"), (2L, ts("2024-01-01"), None, "bb"),
      (3L, ts("2024-01-02"), Some(10.0), "cc"), (4L, ts("2024-01-02"), Some(15.0), "dd"),
      (5L, ts("2024-01-03"), Some(100.0), "ee"), (6L, ts("2024-01-03"), None, "ff"))
    ManifestTable.merge(spark, path, rows.toDF("id", "day", "v", "s"),
      Seq("id"), "day", statsColumns = Seq("v", "s", "day"))
  }

  test("IS NULL prunes zero-null dirs; IS NOT NULL prunes all-null dirs " +
    "(committed null counts)") {
    val path = freshPath("nulls")
    seedNullStr(path)
    val isNull = ManifestTable.read(spark, path).where(col("v").isNull)
    val (kN, tN) = evidence(isNull)
    assert(tN == 3L && kN == 2L, s"day2 has zero nulls in v; kept $kN/$tN")
    assert(isNull.select("id").as[Long].collect().toSet == Set(1L, 2L, 6L))
    val notNull = ManifestTable.read(spark, path).where(col("v").isNotNull)
    val (kV, _) = evidence(notNull)
    assert(kV == 2L, s"day1 is ALL-null in v (nulls == rowcount); kept $kV")
    assert(notNull.select("id").as[Long].collect().toSet == Set(3L, 4L, 5L))
  }

  test("string zone maps prune range and equality probes; non-ASCII literals " +
    "never prune") {
    val path = freshPath("str")
    seedNullStr(path)
    val range = ManifestTable.read(spark, path)
      .where(col("s") >= "cc" && col("s") <= "dz")
    val (kR, tR) = evidence(range)
    assert(tR == 3L && kR == 1L, s"[cc,dz] intersects only day2's [cc,dd]; kept $kR/$tR")
    assert(range.select("id").as[Long].collect().toSet == Set(3L, 4L))
    val miss = ManifestTable.read(spark, path).where(col("s") === "zz")
    val (kM, _) = evidence(miss)
    assert(kM == 0L && miss.count() == 0L, "zz is past every dir's max")
    // a non-ASCII literal must not prune (byte-order vs string-order)
    val uni = ManifestTable.read(spark, path).where(col("s") === "éé")
    val (kU, _) = evidence(uni)
    assert(kU == 3L && uni.count() == 0L, "non-ASCII probes scan everything")
  }

  test("LIKE 'prefix%' prunes via string zone maps (mx < p or mn >= succ(p)); " +
    "boundary prefixes keep their dir; non-ASCII prefixes never prune") {
    val path = freshPath("prefix")
    seedNullStr(path) // s bounds: day1 [aa,bb], day2 [cc,dd], day3 [ee,ff]
    val c = ManifestTable.read(spark, path).where(col("s").startsWith("c"))
    val (kC, tC) = evidence(c)
    assert(tC == 3L && kC == 1L, s"c% keeps only day2; kept $kC/$tC")
    assert(c.select("id").as[Long].collect().toSet == Set(3L), "only cc matches c%")
    // boundary: the prefix EQUALS a dir's max ("bb" starts with "b")
    val b = ManifestTable.read(spark, path).where(col("s").startsWith("b"))
    val (kB, _) = evidence(b)
    assert(kB == 1L && b.select("id").as[Long].collect().toSet == Set(2L),
      s"b% must keep day1 (its max bb matches); kept $kB")
    // boundary: the prefix EQUALS a dir's min
    val ee = ManifestTable.read(spark, path).where(col("s").startsWith("ee"))
    val (kE, _) = evidence(ee)
    assert(kE == 1L && ee.select("id").as[Long].collect().toSet == Set(5L))
    // between dirs: dz% sits past day2's max and before... succ bumps
    // past every day3 value? no — "ee" >= "d{", so day3 excludes too
    val dz = ManifestTable.read(spark, path).where(col("s").startsWith("dz"))
    val (kZ, _) = evidence(dz)
    assert(kZ == 0L && dz.count() == 0L, s"dz% excludes every dir; kept $kZ")
    // a non-ASCII prefix must not prune (byte order vs string order)
    val uni = ManifestTable.read(spark, path).where(col("s").startsWith("é"))
    val (kU, _) = evidence(uni)
    assert(kU == 3L && uni.count() == 0L, "non-ASCII prefixes scan everything")
  }

  test("decimal zone maps prune (unscaled INT32/INT64 footer stats re-scaled)") {
    val path = freshPath("dec")
    val rows = Seq(
      (1L, ts("2024-01-01"), BigDecimal("10.25")), (2L, ts("2024-01-01"), BigDecimal("20.50")),
      (3L, ts("2024-01-02"), BigDecimal("100.75")), (4L, ts("2024-01-02"), BigDecimal("200.00")))
      .toDF("id", "day", "amount")
      .withColumn("amount", col("amount").cast("decimal(12,2)"))
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("amount"))
    val df = ManifestTable.read(spark, path)
      .where(col("amount") > lit(BigDecimal("50.00")).cast("decimal(12,2)"))
    val (kept, total) = evidence(df)
    assert(total == 2L && kept == 1L,
      s"amount > 50.00 must prune day1 [10.25, 20.50]; kept $kept/$total")
    assert(df.select("id").as[Long].collect().toSet == Set(3L, 4L))
  }

  test("to_date(ts) comparisons range-translate against the timestamp zone map; " +
    "plain timestamp ranges prune too (micros footer stats)") {
    val path = freshPath("todate")
    seedNullStr(path)
    val eq = ManifestTable.read(spark, path)
      .where(to_date(col("day")) === lit(java.sql.Date.valueOf("2024-01-02")))
    val (kE, tE) = evidence(eq)
    assert(tE == 3L && kE == 1L, s"to_date(day) = 2024-01-02 keeps only day2 ($kE/$tE)")
    assert(eq.select("id").as[Long].collect().toSet == Set(3L, 4L))
    val ge = ManifestTable.read(spark, path)
      .where(to_date(col("day")) >= lit(java.sql.Date.valueOf("2024-01-03")))
    val (kG, _) = evidence(ge)
    assert(kG == 1L && ge.count() == 2L)
    val lt = ManifestTable.read(spark, path)
      .where(to_date(col("day")) < lit(java.sql.Date.valueOf("2024-01-02")))
    val (kL, _) = evidence(lt)
    assert(kL == 1L && lt.select("id").as[Long].collect().toSet == Set(1L, 2L))
    // plain timestamp comparison prunes off the same micros bounds
    val tsGe = ManifestTable.read(spark, path)
      .where(col("day") >= lit(ts("2024-01-03")))
    val (kT, _) = evidence(tsGe)
    assert(kT == 1L && tsGe.count() == 2L,
      s"timestamp range must prune via INT64-micros footer stats; kept $kT")
    // date_trunc('day', ts) = aligned TIMESTAMP: window-translates
    val tr = ManifestTable.read(spark, path)
      .where(date_trunc("day", col("day")) === lit(ts("2024-01-02")))
    val (kD, _) = evidence(tr)
    assert(kD == 1L && tr.select("id").as[Long].collect().toSet == Set(3L, 4L))
    // a NON-aligned literal makes the predicate unsatisfiable: every
    // dir prunes and the result is a schema'd empty frame
    val bad = ManifestTable.read(spark, path)
      .where(date_trunc("day", col("day")) ===
        lit(java.sql.Timestamp.valueOf("2024-01-02 13:30:00")))
    val (kB, _) = evidence(bad)
    assert(kB == 0L && bad.count() == 0L,
      "trunc-to-day can never equal a mid-day instant")
    // month window: every day of January collapses into one bucket
    val mo = ManifestTable.read(spark, path)
      .where(date_trunc("month", col("day")) === lit(ts("2024-01-01")))
    val (kM, tM) = evidence(mo)
    assert(kM == tM && mo.count() == 6L, "all dirs are inside 2024-01")
    // range comparisons on trunc: >= aligned keeps days 2-3; > keeps 3;
    // <= mid-day-unaligned T keeps days 1-2 (trunc <= T ⇔ ts < next)
    val tge = ManifestTable.read(spark, path)
      .where(date_trunc("day", col("day")) >= lit(ts("2024-01-02")))
    val (kGe, _) = evidence(tge)
    assert(kGe == 2L && tge.count() == 4L)
    val gt = ManifestTable.read(spark, path)
      .where(date_trunc("day", col("day")) > lit(ts("2024-01-02")))
    val (kGt, _) = evidence(gt)
    assert(kGt == 1L && gt.select("id").as[Long].collect().toSet == Set(5L, 6L))
    val le = ManifestTable.read(spark, path)
      .where(date_trunc("day", col("day")) <=
        lit(java.sql.Timestamp.valueOf("2024-01-02 13:30:00")))
    val (kLe, _) = evidence(le)
    assert(kLe == 2L && le.select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L), "trunc <= mid-day T admits all of day 2")
    val tlt = ManifestTable.read(spark, path)
      .where(date_trunc("day", col("day")) < lit(ts("2024-01-02")))
    val (kLt, _) = evidence(tlt)
    assert(kLt == 1L && tlt.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("a TIMESTAMP_MILLIS writer poisons timestamp stats instead of " +
    "recording bounds the micros-based pruning would misread 1000x off") {
    val path = freshPath("tsmillis")
    val conf = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "TIMESTAMP_MILLIS")
      seed(path) // stats on v+id record fine; `day` gets millis footers
      // explicitly ask for timestamp stats under the foreign unit too
      ManifestTable.merge(spark, path,
        Seq((7L, ts("2024-01-04"), 300.0, "g")).toDF("id", "day", "v", "s"),
        Seq("id"), "day", statsColumns = Seq("v", "id", "day"),
        bloomColumns = Seq("id"))
    } finally spark.conf.set(conf, prev)
    // a timestamp range filter: NO dir may be silently dropped (the
    // millis bounds, read as micros, would look 1000x too small) —
    // poisoned stats keep every dir and the rows come back complete
    val df = ManifestTable.read(spark, path).where(col("day") >= lit(ts("2024-01-03")))
    val (kept, total) = evidence(df)
    assert(total == 4L && kept == 4L,
      s"millis-written timestamp stats must be poisoned, never pruned ($kept/$total)")
    assert(df.select("id").as[Long].collect().toSet == Set(5L, 6L, 7L),
      "every matching row must survive a foreign-unit writer")
    // the same table's NUMERIC stats still prune — poisoning is per-column
    val dfv = ManifestTable.read(spark, path).where(col("v") >= 250.0)
    val (kv, tv) = evidence(dfv)
    assert(tv == 4L && kv == 1L, s"v stats must still prune ($kv/$tv)")
  }

  test("inputFiles returns percent-escaped URIs (PartitioningAwareFileIndex " +
    "contract) that parse and resolve over space/colon partition values") {
    val path = freshPath("uri")
    seed(path) // day partitions are timestamps → dirs carry ' ' and ':'
    val files = ManifestTable.read(spark, path).inputFiles
    assert(files.nonEmpty)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    files.foreach { f =>
      assert(!f.contains(" "), s"raw space leaked into inputFiles URI: $f")
      val uri = new java.net.URI(f) // must not throw URISyntaxException
      assert(fs.exists(new org.apache.hadoop.fs.Path(uri.getPath)),
        s"decoded inputFiles path must exist on disk: ${uri.getPath}")
    }
  }

  test("clusterZOrder: after re-clustering, selective probes on EITHER column " +
    "prune dirs; content is preserved exactly") {
    val path = freshPath("zorder")
    // 256 rows over (a, b) = a uniform 16x16 grid, day-partitioned
    // badly for both columns (the i*37%101 scramble gives every day the
    // FULL a and b ranges, so day zone maps cannot prune either probe)
    val rows = (0 until 256).map { i =>
      (i.toLong, ts(f"2024-01-${i * 37 % 101 % 4 + 1}%02d"),
        (i % 16).toDouble, (i / 16).toDouble)
    }.toDF("id", "day", "a", "b")
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("a", "b"))
    // badly-clustered baseline: an `a` probe keeps every day dir
    val pre = ManifestTable.read(spark, path).where(col("a") >= 14.0)
    val (kPre, tPre) = evidence(pre)
    assert(kPre == tPre && tPre == 4L, "day layout cannot prune an `a` probe")
    val dirs = ManifestTable.clusterZOrder(spark, path, Seq("a", "b"), bits = 2,
      retainVersions = 4)
    assert(dirs > 1L && dirs <= 16L, s"2-bit 2-col z-space has <= 16 dirs; got $dirs")
    val zread = ManifestTable.read(spark, path)
    assert(zread.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 256L), "re-clustering must preserve every row")
    // both single-column probes now prune through the zone maps
    val pa = zread.where(col("a") >= 14.0)
    val (ka, ta) = evidence(pa)
    assert(ka < ta, s"`a` probe must prune after z-order ($ka/$ta)")
    assert(pa.count() == 32L)
    val pb = ManifestTable.read(spark, path).where(col("b") < 2.0)
    val (kb, tb) = evidence(pb)
    assert(kb < tb, s"`b` probe must prune after z-order ($kb/$tb)")
    assert(pb.count() == 32L)
    // guards: one column refuses; oversize z-space refuses
    assert(intercept[IllegalArgumentException](
      ManifestTable.clusterZOrder(spark, path, Seq("a"))).getMessage.contains(">= 2"))
    assert(intercept[IllegalArgumentException](ManifestTable.clusterZOrder(
      spark, path, Seq("a", "b"), bits = 11)).getMessage.contains("20"))
  }

  test("z-order incremental lifecycle: committed splits drive cluster-on-write, " +
    "clusteringDebt is metadata-only, drift past the splits triggers maybeRecluster") {
    val path = freshPath("zinc")
    val rows = (0 until 256).map { i =>
      (i.toLong, ts("2024-01-01"), (i % 16).toDouble, (i / 16).toDouble)
    }.toDF("id", "day", "a", "b")
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("a", "b"))
    ManifestTable.clusterZOrder(spark, path, Seq("a", "b"), bits = 2,
      retainVersions = 2)
    // the spec is committed DURABLY: cols, bits, and the split points
    val props = ManifestTable.readProps(spark, path)
    assert(props(ManifestTable.ZOrderColsProp) == "a,b" &&
      props(ManifestTable.ZOrderBitsProp) == "2" &&
      props.contains(ManifestTable.ZOrderSplitsProp), props.toString)
    // healthy right after clustering: O(manifest) check, no recluster
    val d0 = ManifestTable.clusteringDebt(spark, path)
    assert(d0.metadataOnly && d0.rows == 256L && d0.debtFactor <= 2.0, d0.toString)
    assert(ManifestTable.maybeRecluster(spark, path).isEmpty,
      "a balanced table must not re-cluster")
    // CLUSTER-ON-WRITE: an in-domain batch lands in exactly the z-dirs
    // its values rank into (here: the one top-corner bucket)
    val corner = (1000 until 1008).map(i =>
      (i.toLong, ts("2024-01-01"), 15.0, 15.0)).toDF("id", "day", "a", "b")
    val touched = ManifestTable.mergeZOrdered(spark, path, corner, keys = Seq("id"))
    assert(touched.size == 1, s"a (15,15) batch hits ONE bucket; got $touched")
    val both = ManifestTable.read(spark, path)
      .where(col("a") >= 14.0 && col("b") >= 14.0)
    val (kb2, tb2) = evidence(both)
    assert(kb2 < tb2, s"corner probe must still prune after the merge ($kb2/$tb2)")
    assert(both.count() == 4L + 8L,
      "grid corner (4) + the cluster-on-write batch (8)")
    assert(ManifestTable.maybeRecluster(spark, path).isEmpty,
      "in-domain ingest does not erode clustering")
    // DRIFT: a domain-shifted batch ranks past every split — all of it
    // piles into the edge bucket, the stale-splits signature
    val shifted = (2000 until 2300).map(i =>
      (i.toLong, ts("2024-01-01"), 1000.0 + i, 1000.0 + (i * 7 % 300)))
      .toDF("id", "day", "a", "b")
    ManifestTable.mergeZOrdered(spark, path, shifted, keys = Seq("id"))
    val d1 = ManifestTable.clusteringDebt(spark, path)
    assert(d1.metadataOnly && d1.debtFactor > 4.0,
      s"300 rows in one bucket must show as debt: $d1")
    // the policy repairs it: fresh quantile splits, one rewrite
    val re = ManifestTable.maybeRecluster(spark, path)
    assert(re.nonEmpty, "debt past the factor must trigger a re-cluster")
    val d2 = ManifestTable.clusteringDebt(spark, path)
    assert(d2.debtFactor <= 4.0, s"re-clustering must clear the debt: $d2")
    assert(d2.rows == 256L + 8L + 300L)
    // content intact and the NEW splits prune the shifted domain
    val hi = ManifestTable.read(spark, path).where(col("a") >= 1000.0)
    val (kh, th) = evidence(hi)
    assert(kh < th, s"post-recluster probes prune under the new splits ($kh/$th)")
    assert(hi.count() == 300L)
  }

  test("JoinPruneRule: a PLAIN join against a broadcast dim prunes the scan " +
    "automatically; unsafe shapes and large dims leave the plan alone") {
    val path = freshPath("autoprune")
    seed(path) // ids 1-2/3-4/5-6 per day; stats v+id, bloom id
    val dim = Seq((2L, "x"), (5L, "y")).toDF("id", "seg")
    // zero API opt-in: read ⋈ broadcast(dim) — the rule narrows the index
    val joined = ManifestTable.read(spark, path).join(broadcast(dim), Seq("id"))
    val (kept, total) = evidence(joined)
    assert(total == 3L && kept == 2L,
      s"dim {2,5} must keep days 1+3 through the PLAIN join ($kept/$total)")
    assert(joined.select("id", "seg").as[(Long, String)].collect().toSet ==
      Set((2L, "x"), (5L, "y")), "zero false drops")
    // an EMPTY dim joins to nothing: every dir prunes, result is empty
    val none = ManifestTable.read(spark, path)
      .join(broadcast(dim.filter(col("seg") === "zz")), Seq("id"))
    assert(none.count() == 0L)
    val nonePrune = none.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collect { case g: GraftFileIndex => g.lastPrune }.flatten
    assert(nonePrune.map(_._1).sum == 0L, s"empty dim must prune all: $nonePrune")
    // a WINDOW between scan and join blocks the walk (pruning would
    // change row_number over pruned rows) — plan left alone, full scan
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
    val windowed = ManifestTable.read(spark, path)
      .withColumn("rn", row_number().over(w))
      .join(broadcast(dim), Seq("id"))
    windowed.collect()
    val wPrune = windowed.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collect { case g: GraftFileIndex => g.lastPrune }.flatten
    assert(wPrune.forall(p => p._1 == p._2),
      s"a window below the join must not prune: $wPrune")
    // rule disabled -> the scan keeps its full, un-narrowed index
    // (no data filter reaches the scan at all, so assert directly on
    // the index object rather than through the lastPrune channel)
    spark.conf.set("spark.graft.joinPrune.enabled", "false")
    try {
      val off = ManifestTable.read(spark, path).join(broadcast(dim), Seq("id"))
      off.collect()
      val offIdx = off.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s.relation.location
      }.collect { case g: GraftFileIndex => g }
      assert(offIdx.nonEmpty && offIdx.forall(!_.isNarrowed),
        "disabled rule must leave the index un-narrowed")
    } finally spark.conf.set("spark.graft.joinPrune.enabled", "true")
  }

  test("JoinPruneRule: unstable probe sides back off; two dims intersect their " +
    "narrowings; outer joins narrow only the build side; probes memoize") {
    val path = freshPath("autoprune2")
    seed(path) // day1 ids {1,2}, day2 {3,4}, day3 {5,6}
    val dim = Seq((2L, "xx"), (5L, "yy")).toDF("id", "seg")
    def narrowed(df: DataFrame): Seq[GraftFileIndex] = {
      df.collect()
      df.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s.relation.location
      }.collect { case g: GraftFileIndex if g.isNarrowed => g }
    }
    // --- repeat-unstable probe sides must back off (the probe runs at
    // planning AND run time; a drifting key set would drop join rows).
    // The dim must be FILE-backed: a LocalRelation dim is evaluated
    // eagerly by ConvertToLocalRelation, so its rand/sample/limit is
    // already materialized (repeat-stable) before the rule runs.
    val dimPath = freshPath("autoprune2dim")
    ManifestTable.merge(spark, dimPath,
      Seq((2L, "xx"), (5L, "yy")).toDF("id", "seg"), Seq("id"), "seg")
    def fdim = ManifestTable.read(spark, dimPath)
    val nd = ManifestTable.read(spark, path)
      .join(broadcast(fdim.where(rand() <= 0.999999)), Seq("id"))
    assert(narrowed(nd).isEmpty, "rand() in the dim must back off")
    val samp = ManifestTable.read(spark, path)
      .join(broadcast(fdim.sample(1.0)), Seq("id"))
    assert(narrowed(samp).isEmpty, "a Sample dim must back off")
    val lim = ManifestTable.read(spark, path)
      .join(broadcast(fdim.limit(2)), Seq("id"))
    assert(narrowed(lim).isEmpty, "Limit without Sort must back off")
    val slim = ManifestTable.read(spark, path)
      .join(broadcast(fdim.orderBy("id").limit(2)), Seq("id"))
    assert(narrowed(slim).nonEmpty, "Sort+Limit is repeat-stable — narrows")
    assert(slim.count() == 2L)
    // --- two selective dims INTERSECT their narrowings on one scan
    val dim2 = Seq((5L, 9.9), (6L, 8.8)).toDF("id", "w")
    val both = ManifestTable.read(spark, path)
      .join(broadcast(dim), Seq("id")).join(broadcast(dim2), Seq("id"))
    val (kb, tb) = evidence(both)
    assert(tb == 3L && kb == 1L,
      s"dim{2,5} keeps days 1+3, dim2{5,6} intersects to day3 only ($kb/$tb)")
    assert(both.select("id").as[Long].collect().toSeq == Seq(5L),
      "the doubly-narrowed scan still returns the exact join result")
    // --- LeftOuter narrows ONLY the build side: dim LEFT-joins the
    // fact → fact dirs holding no dim key can only yield unmatched
    // build rows, prunable; every dim row survives regardless
    val lo = dim.join(ManifestTable.read(spark, path), Seq("id"), "left")
    val (kl, tl) = evidence(lo)
    assert(tl == 3L && kl == 2L, s"left-outer build side must narrow ($kl/$tl)")
    assert(lo.count() == 2L && lo.where(col("v").isNull).count() == 0L)
    // ...and the PRESERVED side never loses a dir
    val pres = ManifestTable.read(spark, path)
      .join(broadcast(dim), Seq("id"), "left")
    pres.collect()
    assert(narrowed(pres).isEmpty,
      "a left-outer preserved side must keep every dir")
    assert(pres.count() == 6L)
    // --- probe memoization: the SAME canonical dim probe re-optimized
    // (new action / new DataFrame of the same shape) runs NO new job
    val dim3 = Seq((3L, "m"), (6L, "n")).toDF("id", "seg")
    val b0 = graft.plans.JoinPruneRule.probeExecutions.get
    val q1 = ManifestTable.read(spark, path).join(broadcast(dim3), Seq("id"))
    q1.queryExecution.optimizedPlan
    val b1 = graft.plans.JoinPruneRule.probeExecutions.get
    assert(b1 == b0 + 1, s"first probe of dim3 must execute once ($b0 -> $b1)")
    val q2 = ManifestTable.read(spark, path).join(broadcast(dim3), Seq("id"))
    q2.queryExecution.optimizedPlan
    assert(graft.plans.JoinPruneRule.probeExecutions.get == b1,
      "an identical canonical probe must hit the session memo")
    val (k2, t2) = evidence(q2)
    assert(t2 == 3L && k2 == 2L, s"memoized keys {3,6} keep days 2+3 ($k2/$t2)")
  }

  test("readJoinPruned probes a dim's key set against zone maps AND blooms; " +
    "empty dim prunes all, oversize dim refuses") {
    val path = freshPath("joinprune")
    seed(path) // ids 1-2/3-4/5-6 per day; stats v+id, bloom id
    // dim hits ids 2 and 5 -> days 1 and 3 survive, day2 prunes
    val dim = Seq((2L, "x"), (5L, "y")).toDF("id", "seg")
    val r = ManifestTable.readJoinPruned(spark, path, "id", dim, "id")
    assert(r.dirsTotal == 3L && r.dirsScanned == 2L, s"${r.dirsScanned}/${r.dirsTotal}")
    val joined = r.df.join(dim, Seq("id")).select("id", "seg")
      .as[(Long, String)].collect().toSet
    assert(joined == Set((2L, "x"), (5L, "y")), "zero false drops")
    // keys inside every [min,max] but absent from the data: the BLOOM
    // must prune where the zone map cannot (ids 1-6 exist; 7 doesn't,
    // but 7 > all maxes — use a bloom-only miss value INSIDE a range:
    // day3 holds 5,6; probe 5.5 is not an int key — instead rebuild
    // intuition with an id gap): merge a wide-range day so the zone
    // map alone cannot exclude, then probe a missing key
    ManifestTable.merge(spark, path,
      Seq((100L, ts("2024-01-04"), 0.0, "g"), (200L, ts("2024-01-04"), 0.0, "h"))
        .toDF("id", "day", "v", "s"),
      Seq("id"), "day", statsColumns = Seq("v", "id"), bloomColumns = Seq("id"))
    val missDim = Seq((150L, "z")).toDF("id", "seg") // inside day4's [100,200]
    val rm = ManifestTable.readJoinPruned(spark, path, "id", missDim, "id")
    assert(rm.dirsScanned == 0L,
      s"150 is inside day4's zone map but its bloom must exclude it; kept ${rm.dirsScanned}")
    // empty dim joins to nothing: every dir prunes, schema'd empty frame
    val re = ManifestTable.readJoinPruned(spark, path, "id",
      dim.filter(col("id") < 0L), "id")
    assert(re.dirsScanned == 0L && re.df.count() == 0L)
    assert(re.df.columns.nonEmpty)
    // a dim past maxKeys refuses loudly
    val big = spark.range(0, 50L).toDF("id").withColumn("seg", lit("s"))
    val e = intercept[IllegalArgumentException](
      ManifestTable.readJoinPruned(spark, path, "id", big, "id", maxKeys = 10))
    assert(e.getMessage.contains("distinct keys"))
  }

  test("a compacted shared dir survives unless EVERY entry it holds is excluded") {
    val path = freshPath("comp")
    seed(path)
    ManifestTable.compact(spark, path, "day")
    // all three partitions now share one dir whose entries carry the
    // per-partition stats forward: v>=12 excludes only day1's ENTRY,
    // not the dir (day2/day3 entries still admit rows)
    val df = ManifestTable.read(spark, path).where(col("v") >= 12.0)
    assert(df.select("id").as[Long].collect().toSet == Set(4L, 5L, 6L))
    // but a predicate excluding every entry drops the shared dir whole
    val none = ManifestTable.read(spark, path).where(col("v") > 1000.0)
    val (k0, _) = evidence(none)
    assert(k0 == 0L && none.count() == 0L,
      "v > 1000 excludes all three entries, so the one shared dir is pruned")
  }

  // ------------------------------------------------------------------
  // TOKEN BLOOM index (tokenBloomColumns → tokenMatch pruning)
  // ------------------------------------------------------------------

  /** Three day dirs with synthetic text: every day carries common
    * tokens; "zebra" appears ONLY on day2 (inside punctuation and
    * mixed case — the tokenizer must still hit it); each day carries
    * a unique `dayNtag` marker token. */
  private def seedTokens(path: String): Unit = {
    val rows = Seq(
      (1L, ts("2024-01-01"), "The quick brown fox, day1tag."),
      (2L, ts("2024-01-01"), "a common line; day1tag!"),
      (3L, ts("2024-01-02"), "Watch the ZeBrA, day2tag..."),
      (4L, ts("2024-01-02"), "another common line day2tag"),
      (5L, ts("2024-01-03"), "the common end (day3tag)"),
      (6L, ts("2024-01-03"), "closing line: day3tag"))
      .toDF("id", "day", "text")
    ManifestTable.merge(spark, path, rows, Seq("id"), "day",
      statsColumns = Seq("id"), tokenBloomColumns = Seq("text"),
      tokenBloomBits = 4096)
  }

  test("tokenMatch prunes dirs via committed token blooms; case- and " +
    "punctuation-insensitive; zero false drops") {
    val path = freshPath("tok")
    seedTokens(path)
    import graft.ext.TextAnalysis.tokenMatch
    // rare token, present only on day2 (as "ZeBrA," in the raw text)
    val zebra = ManifestTable.read(spark, path).where(tokenMatch(col("text"), "zebra"))
    val (kz, tz) = evidence(zebra)
    assert(tz == 3L && kz == 1L, s"zebra should keep exactly day2: kept $kz of $tz")
    assert(zebra.select("id").as[Long].collect().toSet == Set(3L))
    // per-day marker: exactly one dir survives, rows intact
    val d3 = ManifestTable.read(spark, path).where(tokenMatch(col("text"), "day3tag"))
    val (k3, _) = evidence(d3)
    assert(k3 == 1L)
    assert(d3.select("id").as[Long].collect().toSet == Set(5L, 6L))
    // ubiquitous token: nothing prunes, every matching row returned
    val common = ManifestTable.read(spark, path).where(tokenMatch(col("text"), "common"))
    val (kc, _) = evidence(common)
    assert(kc == 3L)
    assert(common.count() == 3L)
    // absent token: every dir pruned, empty result
    val gone = ManifestTable.read(spark, path).where(tokenMatch(col("text"), "unicorn"))
    val (kg, _) = evidence(gone)
    assert(kg == 0L && gone.count() == 0L)
    // ANY-of list: zebra|unicorn keeps only zebra's dir
    val any = ManifestTable.read(spark, path).where(
      graft.ext.TextAnalysis.tokenMatchAny(col("text"), Seq("zebra", "unicorn")))
    val (ka, _) = evidence(any)
    assert(ka == 1L)
    assert(any.select("id").as[Long].collect().toSet == Set(3L))
    // AND of two tokenMatch conjuncts prunes on either: zebra AND a
    // day3-only marker excludes every dir
    val andNone = ManifestTable.read(spark, path).where(
      tokenMatch(col("text"), "zebra") && tokenMatch(col("text"), "day3tag"))
    val (kn, _) = evidence(andNone)
    assert(kn == 0L && andNone.count() == 0L)
  }

  test("token blooms are conservative: non-token literals, unindexed " +
    "columns, and foreign split regexes never prune") {
    val path = freshPath("tokc")
    seedTokens(path)
    // a literal with a separator char can never be pruned on (the
    // bloom holds tokens only) — build the raw expression around
    // tokenMatch's guard
    val raw = ManifestTable.read(spark, path)
      .where(array_contains(split(lower(col("text")),
        graft.ext.TextAnalysis.TokenSplitRe), "no token"))
    val (kr, tr) = evidence(raw)
    assert(kr == tr, "non-token literal must not prune")
    // a different split regex is a different token stream — no pruning
    val foreign = ManifestTable.read(spark, path)
      .where(array_contains(split(lower(col("text")), "\\s+"), "zebra"))
    val (kf, tf) = evidence(foreign)
    assert(kf == tf, "foreign tokenizer must not consult the bloom")
    // tokenMatch over a table merged WITHOUT tokenBloomColumns keeps all
    val path2 = freshPath("tokn")
    val rows = Seq((1L, ts("2024-01-01"), "zebra here"),
      (2L, ts("2024-01-02"), "none here")).toDF("id", "day", "text")
    ManifestTable.merge(spark, path2, rows, Seq("id"), "day")
    val un = ManifestTable.read(spark, path2)
      .where(graft.ext.TextAnalysis.tokenMatch(col("text"), "zebra"))
    val (ku, tu) = evidence(un)
    assert(ku == tu && tu == 2L, "no committed token bloom → no pruning")
    assert(un.count() == 1L)
  }

  test("token blooms survive a metadata-only rename: tokenMatch on the " +
    "new name still prunes") {
    val path = freshPath("tokr")
    seedTokens(path)
    ManifestTable.renameColumn(spark, path, "text", "body")
    val zebra = ManifestTable.read(spark, path)
      .where(graft.ext.TextAnalysis.tokenMatch(col("body"), "zebra"))
    val (kz, tz) = evidence(zebra)
    assert(tz == 3L && kz == 1L, s"renamed column must keep pruning: $kz of $tz")
    assert(zebra.select("id").as[Long].collect().toSet == Set(3L))
  }

  test("token index follows the table: a later merge re-indexes touched " +
    "dirs and new days prune correctly") {
    val path = freshPath("tokm")
    seedTokens(path)
    import graft.ext.TextAnalysis.tokenMatch
    // append a new day carrying zebra, and rewrite day2 WITHOUT zebra
    val batch = Seq(
      // NB not "zebra-free": '-' is a separator, which would tokenize
      // right back to a `zebra` token — the index would be correct to
      // keep the dir
      (3L, ts("2024-01-02"), "rewritten, stripe free line day2tag"),
      (7L, ts("2024-01-04"), "a zebra returns; day4tag"))
      .toDF("id", "day", "text")
    ManifestTable.merge(spark, path, batch, Seq("id"), "day",
      statsColumns = Seq("id"), tokenBloomColumns = Seq("text"),
      tokenBloomBits = 4096)
    val zebra = ManifestTable.read(spark, path).where(tokenMatch(col("text"), "zebra"))
    val (kz, tz) = evidence(zebra)
    assert(tz == 4L && kz == 1L,
      s"day2's rewritten bloom no longer holds zebra; only day4 keeps: $kz of $tz")
    assert(zebra.select("id").as[Long].collect().toSet == Set(7L))
  }
}
