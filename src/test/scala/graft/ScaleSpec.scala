package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Layout, Skew}

/** Physical-layout and skew-mitigation checks: bucketed joins must
  * plan without shuffle exchanges; salted aggregation/join must be
  * exact. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join and aggregate without a shuffle exchange") {
    val prices = Seq.tabulate(1000)(i => (i % 20L, i.toLong, 100.0 + i))
      .toDF("asset_id", "seq", "price")
    val assets = Seq.tabulate(20)(i => (i.toLong, s"coin$i")).toDF("asset_id", "name")
    Layout.writeBucketed(prices, "b_prices", Seq("asset_id"), buckets = 8)
    Layout.writeBucketed(assets, "b_assets", Seq("asset_id"), buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable auto-broadcast so the join must pick sort-merge — the
      // co-located bucketed layout then needs NO exchange of any kind
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_prices").join(spark.table("b_assets"), "asset_id")
        .groupBy($"asset_id", $"name").agg(sum($"price").as("s"))
      assert(joined.count() == 20)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_prices")
      spark.sql("DROP TABLE IF EXISTS b_assets")
    }
  }

  test("partitioned write prunes partitions on a partition-key filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.mode("overwrite").partitionBy("lang").parquet(s"$dir/docs")
    val read = spark.read.parquet(s"$dir/docs").filter($"lang" === "en")
    assert(read.count() == docs.filter($"lang" === "en").count())
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(lang"),
      s"no partition pruning in:\n$plan")
  }

  test("salted aggregation equals the direct aggregate") {
    // heavy skew: 90% of rows on one key
    val df = Seq.tabulate(2000)(i => (if (i < 1800) 1L else i % 7L, i.toLong, i * 0.5))
      .toDF("k", "id", "v")
    val direct = df.groupBy($"k").agg(sum($"v").as("sum"))
      .as[(Long, Double)].collect().toMap
    val salted = Skew.saltedSum(df, Seq("k"), $"v", saltFrom = $"id")
      .as[(Long, Double)].collect().toMap
    assert(salted == direct)
  }

  test("salted join equals the direct join") {
    val fact = Seq.tabulate(500)(i => (if (i < 450) 1L else i % 5L, i.toLong)).toDF("k", "id")
    val dim = Seq.tabulate(5)(i => (i.toLong, s"d$i")).toDF("k", "name")
    val direct = fact.join(dim, "k").select($"id", $"name")
      .as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", saltFrom = $"id")
      .select($"id", $"name").as[(Long, String)].collect().toSet
    assert(salted == direct)
  }

  test("compact rewrites a many-small-files dataset to the computed file count, losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val df = Seq.tabulate(1000)(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(40).write.parquet(dir) // 40 tiny files
    def parquetFiles =
      new java.io.File(dir).listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles == 40)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    // huge target → everything fits one file
    val n = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(n == 1 && parquetFiles == 1, s"expected 1 file, got $parquetFiles")
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == before)
  }

  test("compact with partitionBy preserves the partition layout (and its pruning) losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-part").toString + "/t"
    val df = Seq.tabulate(300)(i => (i.toLong, i % 3L, s"row$i")).toDF("id", "part", "s")
    df.repartition(10).write.partitionBy("part").parquet(dir) // 10 files per partition dir
    val before = spark.read.parquet(dir)
      .select("id", "part", "s").as[(Long, Long, String)].collect().toSet
    Layout.compact(spark, dir, targetBytes = 1L << 30, partitionBy = Seq("part"))
    val partDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part=")).toSeq
    assert(partDirs.size == 3, s"partition dirs lost: ${partDirs.map(_.getName)}")
    partDirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${d.getName}: expected 1 compacted file, got $files")
    }
    assert(spark.read.parquet(dir)
      .select("id", "part", "s").as[(Long, Long, String)].collect().toSet == before)
  }

  test("compact commit: crash between the two renames rolls back; stale tmp is dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-crash").toString + "/t"
    val df = Seq.tabulate(100)(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(4).write.parquet(dir)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)

    // Simulate the worst crash point: original moved aside, compacted
    // copy never renamed in (reader would see ENOENT). The next
    // compact must first restore the original, then compact it.
    assert(fs.rename(hp(dir), hp(dir + "__compact_old")))
    fs.mkdirs(hp(dir + "__compact_tmp")) // stale uncommitted rewrite
    val n = Layout.compact(spark, dir, targetBytes = 1L << 30)
    assert(n == 1)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == before,
      "recovery + compact must be lossless")
    assert(!fs.exists(hp(dir + "__compact_old")) && !fs.exists(hp(dir + "__compact_tmp")))
  }

  test("zValue interleaves bits; Z-order clustering prunes on BOTH dims, linear sort only on one") {
    import graft.ops.Layout
    // zValue correctness on known interleavings
    val z = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(Layout.zValue($"a", $"b").as("z")).as[Long].collect().toSeq
    // interleave(3=0b11, 5=0b101): a bits at even positions (1,1,0),
    // b bits at odd (1,0,1) -> 0b100111 = 39
    assert(z == Seq(0L, 1L, 2L, 39L))

    // Pruning model: cluster a 64x64 grid into 16 partitions, record
    // per-partition min/max of both dims (what parquet footers hold),
    // and count partitions a point predicate on each dim would scan.
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def scanCount(clustered: org.apache.spark.sql.DataFrame, dim: String): Long = {
      val stats = clustered
        .withColumn("__p", spark_partition_id())
        .groupBy($"__p")
        .agg(min(col(dim)).as("lo"), max(col(dim)).as("hi"))
      // how many of the 16 "files" a predicate dim=17 must read
      stats.filter($"lo" <= 17 && $"hi" >= 17).count()
    }
    val zClustered = Layout.clusterZOrder(grid, "x", "y", partitions = 16, bits = 6)
      .localCheckpoint() // pin partitioning for spark_partition_id
    val linear = grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .localCheckpoint()
    val (zx, zy) = (scanCount(zClustered, "x"), scanCount(zClustered, "y"))
    val (lx, ly) = (scanCount(linear, "x"), scanCount(linear, "y"))
    // linear layout: perfect on x, useless on y (scans all 16)
    assert(lx <= 2 && ly == 16)
    // Z-order: strictly better than "scan everything" on BOTH dims
    assert(zx <= 8 && zy <= 8, s"z-order pruning too weak: x=$zx y=$zy")
  }
}
