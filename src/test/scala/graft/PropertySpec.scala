package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Merge, Ops}

/** Property-style randomized laws (SURVEY.md §5.4) over the write-path
  * and time-series operators: seeded generators, many trials, laws
  * asserted wholesale per trial. Key spaces are deliberately tiny so
  * collisions (the interesting case) are dense.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Trials = 12
  private def rng(seed: Int) = new scala.util.Random(seed)

  private def randomTable(r: scala.util.Random, n: Int): DataFrame =
    Seq.fill(n)((
      s"k${r.nextInt(5)}",                        // key: 5-way collisions
      new Timestamp(1700000000000L + r.nextInt(1000) * 1000L),
      r.nextInt(1000).toDouble / 4.0,
      r.nextLong()
    )).toDF("k", "ts", "v", "tag")
      // unique PK per table, like the reference's (asset_id, ts)
      .dropDuplicates("k", "ts")

  test("law: DECIMAL metadata sum/avg is BIT-equal to the scan across " +
    "precisions, scales, signs, nulls and an all-null partition") {
    import graft.ops.ManifestTable
    import graft.plans.StatsAggRule
    val shapes = Seq((10, 2), (20, 8), (12, 0), (38, 10))
    for (((p, s), si) <- shapes.zipWithIndex) {
      val r = rng(4200 + si)
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_prop_dec$si").toString + "/t"
      val maxUnscaled = BigInt(10).pow(math.min(p, 15) - 1)
      val rows = (1 to 120).map { i =>
        val day = s"d${i % 6}"
        val v: Option[BigDecimal] =
          if (i % 6 == 5) None // d5: an ALL-NULL partition
          else if (r.nextInt(7) == 0) None // sprinkled nulls elsewhere
          else {
            val unscaled = BigInt(r.nextLong()) % maxUnscaled // signed
            Some(BigDecimal(unscaled) / BigDecimal(10).pow(s))
          }
        (i.toLong, day, v)
      }.toDF("id", "day", "dv")
        .select(col("id"), col("day"), col("dv").cast(s"decimal($p,$s)").as("dv"))
      ManifestTable.merge(spark, path, rows, Seq("id"), "day",
        statsColumns = Seq("dv"), sumColumns = Seq("dv"))
      def glob = ManifestTable.read(spark, path)
        .agg(sum(col("dv")).as("sd"), avg(col("dv")).as("ad"),
          count(col("dv")).as("nd"))
      def grouped = ManifestTable.read(spark, path).groupBy(col("day"))
        .agg(sum(col("dv")).as("sd"), avg(col("dv")).as("ad"))
        .orderBy(col("day"))
      for ((mk, what) <- Seq((() => glob, "global"), (() => grouped, "grouped"))) {
        val before = StatsAggRule.rewrites.get
        val viaMeta = mk().collect().toSeq
        assert(StatsAggRule.rewrites.get - before >= 1,
          s"decimal($p,$s) $what: the metadata rewrite must fire")
        spark.conf.set("spark.graft.statsAgg.enabled", "false")
        val viaScan =
          try mk().collect().toSeq
          finally spark.conf.set("spark.graft.statsAgg.enabled", "true")
        assert(viaMeta == viaScan,
          s"decimal($p,$s) $what: metadata answer must be BIT-equal to the scan")
      }
    }
  }

  test("law: upsert is idempotent and incoming wins on key collision") {
    for (t <- 1 to Trials) {
      val r = rng(t)
      val existing = randomTable(r, 30)
      val incoming = randomTable(r, 20)
      val once = Merge.upsert(existing, incoming, Seq("k", "ts"))
      val twice = Merge.upsert(once, incoming, Seq("k", "ts"))
      val onceS = once.orderBy("k", "ts").collect().toSeq
      assert(twice.orderBy("k", "ts").collect().toSeq == onceS, s"trial $t: not idempotent")

      // incoming rows all present verbatim; existing rows survive iff key free
      val incRows = incoming.collect().map(x => (x.getString(0), x.getTimestamp(1)) -> x).toMap
      val gotRows = once.collect().map(x => (x.getString(0), x.getTimestamp(1)) -> x).toMap
      incRows.foreach { case (k, row) => assert(gotRows(k) == row, s"trial $t: incoming lost $k") }
      existing.collect().foreach { x =>
        val key = (x.getString(0), x.getTimestamp(1))
        if (!incRows.contains(key)) assert(gotRows(key) == x, s"trial $t: existing lost $key")
      }
    }
  }

  test("law: preserveExisting carries the existing value through an update") {
    for (t <- 1 to Trials) {
      val r = rng(100 + t)
      val existing = randomTable(r, 25)
      val incoming = randomTable(r, 25).withColumn("tag", lit(-1L))
      val merged = Merge.upsert(existing, incoming, Seq("k", "ts"), preserveExisting = Seq("tag"))
      val existingTags = existing.collect()
        .map(x => (x.getString(0), x.getTimestamp(1)) -> x.getLong(3)).toMap
      merged.collect().foreach { x =>
        val key = (x.getString(0), x.getTimestamp(1))
        existingTags.get(key).foreach { tag =>
          assert(x.getLong(3) == tag, s"trial $t: preserved column overwritten at $key")
        }
      }
    }
  }

  test("law: dedupKeepLast keeps exactly the highest batch-order row per key") {
    for (t <- 1 to Trials) {
      val r = rng(200 + t)
      val batch = Seq.fill(40)((s"k${r.nextInt(6)}", r.nextInt(1000), r.nextDouble()))
        .toDF("k", "ord", "v").dropDuplicates("k", "ord")
      val got = Merge.dedupKeepLast(batch, Seq("k"), col("ord"))
        .select($"k", $"ord").as[(String, Int)].collect().toMap
      val expected = batch.select($"k", $"ord").as[(String, Int)].collect()
        .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).max }
      assert(got == expected, s"trial $t")
    }
  }

  test("law: OHLC invariants — low <= open/close <= high, n_points = group size") {
    for (t <- 1 to Trials) {
      val r = rng(300 + t)
      val df = randomTable(r, 50)
      val ohlc = Ops.ohlc(df, Seq("k"), to_date($"ts").as("d"), $"ts", $"v", $"tag")
      ohlc.collect().foreach { row =>
        val (o, h, l, c) = (row.getDouble(2), row.getDouble(3), row.getDouble(4), row.getDouble(5))
        assert(l <= o && o <= h && l <= c && c <= h, s"trial $t: OHLC violated $row")
      }
      assert(ohlc.agg(sum($"n_points")).as[Long].head() == df.count(), s"trial $t: lost rows")
    }
  }

  test("law: as-of returns the max ts at-or-before the cutoff, per key") {
    for (t <- 1 to Trials) {
      val r = rng(400 + t)
      val df = randomTable(r, 40)
      val cutoff = new Timestamp(1700000000000L + r.nextInt(1000) * 1000L)
      val got = Ops.asOfAtOrBefore(df, Seq("k"), $"ts", lit(cutoff))
        .select($"k", $"ts").as[(String, Timestamp)].collect().toMap
      val expected = df.select($"k", $"ts").as[(String, Timestamp)].collect()
        .filter(!_._2.after(cutoff)).groupBy(_._1)
        .map { case (k, rows) => k -> rows.map(_._2).maxBy(_.getTime) }
      assert(got == expected, s"trial $t")
    }
  }

  test("law: applyChangeFeed is idempotent, and delete+higher-version reinsert resurrects") {
    for (t <- 1 to Trials) {
      val r = rng(500 + t)
      val existing = randomTable(r, 30).select($"k", $"ts", $"v")
      // feed over the same dense key space; version = trial-local order
      val feed = Seq.fill(20)((
        s"k${r.nextInt(5)}",
        new Timestamp(1700000000000L + r.nextInt(1000) * 1000L),
        r.nextInt(1000).toDouble / 4.0,
        Seq("insert", "update", "delete")(r.nextInt(3)),
        r.nextInt(100).toLong
      )).toDF("k", "ts", "v", "op", "version")
        // unique (key, version) so highest-version-wins is unambiguous
        .dropDuplicates("k", "ts", "version")
      val once = Merge.applyChangeFeed(existing, feed, Seq("k", "ts"))
      val twice = Merge.applyChangeFeed(once, feed, Seq("k", "ts"))
      val onceS = once.orderBy("k", "ts", "v").collect().toSeq
      assert(twice.orderBy("k", "ts", "v").collect().toSeq == onceS,
        s"trial $t: not idempotent")
      // sequential reference: fold the feed per key by version order
      val winner = feed.collect()
        .map(x => ((x.getString(0), x.getTimestamp(1)), (x.getLong(4), x.getString(3), x.getDouble(2))))
        .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) }
      val expected = existing.collect()
        .map(x => (x.getString(0), x.getTimestamp(1)) -> x.getDouble(2)).toMap
        .filter { case (k, _) => !winner.contains(k) } ++
        winner.collect { case (k, (_, op, v)) if op != "delete" => k -> v }
      val got = once.collect()
        .map(x => (x.getString(0), x.getTimestamp(1)) -> x.getDouble(2)).toMap
      assert(got == expected, s"trial $t: diverges from sequential fold")
    }
  }

  test("law: asofJoin is left-preserving — exactly one output row per left row") {
    for (t <- 1 to Trials) {
      val r = rng(600 + t)
      val left = randomTable(r, 25).select($"k", $"ts", $"tag")
      val right = randomTable(r, 25).select($"k", $"ts", $"v")
      val got = Ops.asofJoin(left, right, "k", "ts", Seq("v"))
      assert(got.count() == left.count(), s"trial $t: row count changed")
      // and every carried value is genuinely at-or-before its left row
      val rightRows = right.as[(String, Timestamp, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3))).toMap
      got.select($"k", $"ts", $"v").as[(String, Timestamp, Option[Double])]
        .collect().foreach { case (k, lts, v) =>
          val eligible = rightRows.getOrElse(k, Array.empty)
            .filter(!_._1.after(lts))
          val expected = if (eligible.isEmpty) None
            else Some(eligible.maxBy(_._1.getTime)._2)
          assert(v == expected, s"trial $t: ($k,$lts) got $v expected $expected")
        }
    }
  }
}
