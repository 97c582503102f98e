package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ManifestTable
import graft.streaming.StreamingIngest

/** Manifest tables as a streaming source (`format("graft-manifest")`,
  * ManifestStreamProvider): version offsets, snapshot-then-increments
  * batching, the strict append contract, cdf-mode replication of an
  * updating table, and the retention failure mode.
  */
class ManifestStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mstream_$tag").toString

  private def rows(part: String, ids: Range): DataFrame =
    ids.map(i => (i.toLong, part, i * 1.0)).toDF("id", "part", "v")

  /** Drain one stream run into `sink`, then stop. */
  private def drain(up: String, ckpt: String, sink: (DataFrame, Long) => Unit,
                    cdf: Boolean = false): Unit = {
    val reader = spark.readStream.format("graft-manifest").option("path", up)
    val src = (if (cdf) reader.option("mode", "cdf").option("keys", "id")
               else reader).load()
    val q = src.writeStream.foreachBatch(sink)
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
  }

  private def causeChain(t: Throwable): Iterator[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)

  test("append mode: snapshot batch, then ONLY newly-referenced dirs; empty steady state") {
    val d = freshDir("append"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 10), keys = Seq("id"),
      partitionCol = "part")
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val sink: (DataFrame, Long) => Unit = (b, id) => batches.synchronized {
      batches += ((id, b.count()))
    }
    drain(up, s"$d/ckpt", sink)
    assert(batches.toList == List((0L, 10L)), "first batch = full snapshot")
    // steady state: restart with no new commit delivers no batch
    drain(up, s"$d/ckpt", sink)
    assert(batches.toList == List((0L, 10L)))
    // two commits of new partitions -> ONE catch-up batch, new rows only
    ManifestTable.merge(spark, up, rows("p1", 100 until 120), keys = Seq("id"),
      partitionCol = "part", retainVersions = 4)
    ManifestTable.merge(spark, up, rows("p2", 200 until 205), keys = Seq("id"),
      partitionCol = "part", retainVersions = 4)
    drain(up, s"$d/ckpt", sink)
    assert(batches.toList == List((0L, 10L), (1L, 25L)),
      "restart consumed only the two new commits, as one batch")
  }

  test("append mode refuses non-append commits: partition rewrite and MoR DV") {
    val d = freshDir("strict"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 10), keys = Seq("id"),
      partitionCol = "part", retainVersions = 4,
      statsColumns = Seq("id"), bloomColumns = Seq("id"))
    val sink: (DataFrame, Long) => Unit = (_, _) => ()
    drain(up, s"$d/ckpt", sink)
    // upsert rewriting the existing partition
    ManifestTable.merge(spark, up, rows("p0", 0 until 3).withColumn("v", lit(9.9)),
      keys = Seq("id"), partitionCol = "part", retainVersions = 4,
      statsColumns = Seq("id"), bloomColumns = Seq("id"))
    val e1 = intercept[Throwable](drain(up, s"$d/ckpt", sink))
    assert(causeChain(e1).exists(c =>
      Option(c.getMessage).exists(_.contains("non-append"))), s"got: $e1")
    // a fresh stream from scratch snapshots fine; then a DV delete refuses too
    drain(up, s"$d/ckpt2", sink)
    ManifestTable.deleteByKeysMoR(spark, up, "part", "id", Seq("5"),
      retainVersions = 4)
    val e2 = intercept[Throwable](drain(up, s"$d/ckpt2", sink))
    assert(causeChain(e2).exists(c =>
      Option(c.getMessage).exists(_.contains("non-append"))), s"got: $e2")
  }

  test("widening a column under a RUNNING stream fails the stream instead of " +
    "silently downcasting; a restart re-pins the widened schema") {
    val d = freshDir("widen"); val up = s"$d/up"
    ManifestTable.merge(spark, up,
      (0 until 5).map(i => (i.toLong, "p0", i)).toDF("id", "part", "n"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink: (DataFrame, Long) => Unit = (b, _) => got.synchronized {
      got ++= b.select(col("n").cast("long")).as[Long].collect()
    }
    val q = spark.readStream.format("graft-manifest").option("path", up).load()
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$d/ckpt").start()
    try {
      q.processAllAvailable()
      assert(got.sorted.toList == (0L until 5L).toList, "snapshot under int schema")
      // widen int -> long while the stream is RUNNING (its schema is
      // pinned at int), then append a value past Int range: the batch
      // must FAIL the stream, never emit an overflowed int
      ManifestTable.widenColumn(spark, up, "n", org.apache.spark.sql.types.LongType,
        retainVersions = 8)
      ManifestTable.merge(spark, up, Seq((100L, "p1", 3000000000L)).toDF("id", "part", "n"),
        keys = Seq("id"), partitionCol = "part", retainVersions = 8)
      val e = intercept[Throwable](q.processAllAvailable())
      assert(causeChain(e).exists(c => Option(c.getMessage)
        .exists(_.contains("widened"))), s"got: $e")
      assert(!got.exists(_ < 0L), "no overflowed value may have been emitted")
    } finally q.stop()
    // restart on the same checkpoint: the new source pins the widened
    // schema; the failed batch replays and the long value arrives intact
    drain(up, s"$d/ckpt", sink)
    assert(got.contains(3000000000L),
      s"restarted stream must deliver the widened value; got ${got.toList}")
  }

  test("cdf mode replicates updates and MoR deletes exactly; update-then-delete nets") {
    val d = freshDir("cdf"); val up = s"$d/up"; val down = s"$d/down"
    ManifestTable.merge(spark, up, rows("p0", 0 until 10), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    val sink = StreamingIngest.cdfApplySink(down, Seq("id"), "part")
    drain(up, s"$d/ckpt", sink, cdf = true)
    assert(ManifestTable.read(spark, down).count() == 10L)
    // update ids 0-2, add p1, then MoR-delete id 2 (also just updated)
    ManifestTable.merge(spark, up,
      rows("p0", 0 until 3).withColumn("v", col("v") + lit(100.0))
        .unionByName(rows("p1", 50 until 55)),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    ManifestTable.deleteByKeysMoR(spark, up, "part", "id", Seq("2"),
      retainVersions = 8)
    drain(up, s"$d/ckpt", sink, cdf = true)
    val got = ManifestTable.read(spark, down)
    assert(got.count() == 14L)
    assert(got.filter(col("id") === 2L).count() == 0L,
      "update-then-delete of the same key must net to the delete")
    assert(got.filter(col("id") === 1L).select("v").as[Double].head() == 101.0)
    // replica == upstream, row for row
    val diff = ManifestTable.read(spark, up).exceptAll(got)
      .unionAll(got.exceptAll(ManifestTable.read(spark, up))).count()
    assert(diff == 0L)
  }

  test("maxVersionsPerTrigger bounds a live catch-up to one commit per batch") {
    val d = freshDir("admission"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 10), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val sink: (DataFrame, Long) => Unit = (b, id) => batches.synchronized {
      batches += ((id, b.count()))
    }
    val q = spark.readStream.format("graft-manifest").option("path", up)
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$d/ckpt").start()
    try {
      q.processAllAvailable() // batch 0: snapshot, floor = m1
      (1 to 3).foreach(i => ManifestTable.merge(spark, up,
        rows(s"p$i", i * 100 until i * 100 + 5), keys = Seq("id"),
        partitionCol = "part", retainVersions = 8))
      q.processAllAvailable() // three commits behind -> THREE capped batches
    } finally q.stop()
    assert(batches.toList ==
      List((0L, 10L), (1L, 5L), (2L, 5L), (3L, 5L)),
      s"each catch-up batch must cover exactly one version: $batches")
  }

  test("maxDirsPerTrigger splits ONE giant commit across triggers with an " +
    "identical final state; offsets survive a mid-version restart") {
    val d = freshDir("dirs"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 4), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink: (DataFrame, Long) => Unit = (b, _) => {
      val got = b.select("id").as[Long].collect()
      batches.synchronized { batches += got.length.toLong; ids ++= got }
    }
    def drainCapped(ckpt: String): Unit = {
      val q = spark.readStream.format("graft-manifest").option("path", up)
        .option("maxDirsPerTrigger", "2").load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    drainCapped(s"$d/ckpt")
    assert(batches.toList == List(4L), "initial snapshot is uncapped by design")
    // ONE commit adding 5 partitions -> 3 capped batches (2, 2, 1)
    ManifestTable.merge(spark, up,
      (1 to 5).map(i => (100L + i, s"p$i", i * 1.0)).toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    drainCapped(s"$d/ckpt")
    assert(batches.toList == List(4L, 2L, 2L, 1L),
      s"one 5-dir commit must land as 2+2+1 under maxDirsPerTrigger=2; got $batches")
    assert(ids.sorted.toList == ((0L until 4L) ++ (101L to 105L)).toList,
      "sliced catch-up must emit every row exactly once")
    // a restart mid-stream resumes from the checkpointed slice with no
    // duplicates: add another 3-dir commit, drain, restart, drain
    ManifestTable.merge(spark, up,
      (6 to 8).map(i => (100L + i, s"p$i", i * 1.0)).toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    drainCapped(s"$d/ckpt")
    drainCapped(s"$d/ckpt")
    assert(ids.sorted.toList == ((0L until 4L) ++ (101L to 108L)).toList,
      s"no duplicate or lost rows across capped restarts; got ${ids.sorted.toList}")
  }

  test("a mid-version checkpoint restarts cleanly after NEWER commits land: " +
    "one catch-up batch covers the slice remainder plus the new commits") {
    val d = freshDir("midrestart"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 4), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink: (DataFrame, Long) => Unit = (b, _) => {
      val got = b.select("id").as[Long].collect()
      ids.synchronized { ids ++= got }
    }
    def drainCapped(trigger: Option[org.apache.spark.sql.streaming.Trigger]): Unit = {
      val w = spark.readStream.format("graft-manifest").option("path", up)
        .option("maxDirsPerTrigger", "2").load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", s"$d/ckpt")
      trigger match {
        case Some(t) =>
          val q = w.trigger(t).start()
          assert(q.awaitTermination(120000L), "Trigger.Once run did not terminate")
        case None =>
          val q = w.start()
          try q.processAllAvailable() finally q.stop()
      }
    }
    drainCapped(None) // snapshot at m1
    assert(ids.sorted.toList == (0L until 4L).toList)
    // ONE commit adding 5 dirs, then exactly ONE capped microbatch
    // (Trigger.Once): the checkpoint now ENDS on a committed
    // mid-version offset (m2, 2 of 5 dirs emitted) with no pending
    // batch to replay
    ManifestTable.merge(spark, up,
      (1 to 5).map(i => (100L + i, s"p$i", i * 1.0)).toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    drainCapped(Some(org.apache.spark.sql.streaming.Trigger.Once()))
    assert(ids.size == 6, s"Trigger.Once must commit exactly one 2-dir slice; got $ids")
    // a NEWER commit lands before the restart. Delete the persisted
    // admission-floor sidecar to simulate an OLD (pre-sidecar)
    // checkpoint: the fresh engine then has no floor, so the restart
    // batch spans (mid-m2 -> m3) — this was a permanent crash loop
    // before the catch-up fallback existed
    ManifestTable.merge(spark, up,
      (6 to 8).map(i => (100L + i, s"p$i", i * 1.0)).toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    val floorFile = new java.io.File(s"$d/ckpt/sources/0/graft-admission-floor")
    assert(floorFile.exists, "commit must persist the admission floor sidecar")
    assert(floorFile.delete())
    drainCapped(None)
    assert(ids.sorted.toList == ((0L until 4L) ++ (101L to 108L)).toList,
      s"restart must emit the m2 remainder and m3 exactly once; got ${ids.sorted.toList}")
  }

  test("the persisted admission floor keeps a post-restart catch-up CAPPED: " +
    "slice remainder and newer commits drain as bounded batches") {
    val d = freshDir("floorpersist"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 4), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink: (DataFrame, Long) => Unit = (b, _) => {
      val got = b.select("id").as[Long].collect()
      batches.synchronized { batches += got.length.toLong; ids ++= got }
    }
    def drainCapped(trigger: Option[org.apache.spark.sql.streaming.Trigger]): Unit = {
      val w = spark.readStream.format("graft-manifest").option("path", up)
        .option("maxDirsPerTrigger", "2").load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", s"$d/ckpt")
      trigger match {
        case Some(t) =>
          val q = w.trigger(t).start()
          assert(q.awaitTermination(120000L), "Trigger.Once run did not terminate")
        case None =>
          val q = w.start()
          try q.processAllAvailable() finally q.stop()
      }
    }
    drainCapped(None) // snapshot at m1
    // ONE 5-dir commit; exactly ONE capped slice commits, then the
    // stream dies mid-version (Trigger.Once) with the floor persisted
    ManifestTable.merge(spark, up,
      (1 to 5).map(i => (100L + i, s"p$i", i * 1.0)).toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    drainCapped(Some(org.apache.spark.sql.streaming.Trigger.Once()))
    assert(ids.size == 6, s"one 2-dir slice committed before the stop; got $ids")
    // a newer 3-dir commit lands before the restart; the restored
    // floor keeps EVERY catch-up batch within the 2-dir admission cap
    // (the pre-sidecar behavior was one uncapped remainder batch)
    ManifestTable.merge(spark, up,
      (6 to 8).map(i => (100L + i, s"p$i", i * 1.0)).toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    drainCapped(None)
    val post = batches.toList.drop(2) // snapshot + the pre-stop slice
    assert(post.nonEmpty && post.forall(_ <= 2L),
      s"post-restart catch-up must stay capped at 2 dirs/batch; got $batches")
    assert(ids.sorted.toList == ((0L until 4L) ++ (101L to 108L)).toList,
      s"capped catch-up emits every row exactly once; got ${ids.sorted.toList}")
  }

  test("boundInitialSnapshot slices the INITIAL snapshot across triggers; a " +
    "mid-snapshot restart resumes from the persisted position; cdf snapshots " +
    "slice as insert rows") {
    val d = freshDir("boundsnap"); val up = s"$d/up"
    ManifestTable.merge(spark, up,
      (1 to 5).map(i => (i.toLong, s"p$i", i * 1.0)).toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink: (DataFrame, Long) => Unit = (b, _) => {
      val got = b.select("id").as[Long].collect()
      batches.synchronized { batches += got.length.toLong; ids ++= got }
    }
    def drainSnap(trigger: Option[org.apache.spark.sql.streaming.Trigger]): Unit = {
      val w = spark.readStream.format("graft-manifest").option("path", up)
        .option("maxDirsPerTrigger", "2")
        .option("boundInitialSnapshot", "true").load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", s"$d/ckpt")
      trigger match {
        case Some(t) =>
          val q = w.trigger(t).start()
          assert(q.awaitTermination(120000L), "Trigger.Once run did not terminate")
        case None =>
          val q = w.start()
          try q.processAllAvailable() finally q.stop()
      }
    }
    // exactly ONE 2-dir snapshot slice commits, then the stream stops
    drainSnap(Some(org.apache.spark.sql.streaming.Trigger.Once()))
    assert(batches.toList == List(2L),
      s"the FIRST snapshot batch must respect the dir bound; got $batches")
    // the restart resumes the snapshot from the persisted position,
    // still capped, no duplicates
    drainSnap(None)
    assert(batches.toList == List(2L, 2L, 1L),
      s"5 snapshot dirs must drain as 2+2+1 across the restart; got $batches")
    assert(ids.sorted.toList == (1L to 5L).toList,
      s"sliced snapshot emits every row exactly once; got ${ids.sorted.toList}")
    // post-snapshot commits flow through the normal sliced admission
    ManifestTable.merge(spark, up,
      (6 to 8).map(i => (i.toLong, s"p$i", i * 1.0)).toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    drainSnap(None)
    assert(ids.sorted.toList == (1L to 8L).toList &&
      batches.toList.drop(3).forall(_ <= 2L),
      s"post-snapshot commits stay capped; got $batches / ${ids.sorted.toList}")
    // cdf: a fresh checkpoint slices the snapshot as insert rows
    val types = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val csink: (DataFrame, Long) => Unit = (b, _) => types.synchronized {
      types ++= b.select(col("id"), col("_change_type")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
    }
    val q = spark.readStream.format("graft-manifest").option("path", up)
      .option("mode", "cdf").option("keys", "id")
      .option("maxDirsPerTrigger", "3")
      .option("boundInitialSnapshot", "true").load()
      .writeStream.foreachBatch(csink)
      .option("checkpointLocation", s"$d/ckpt_cdf").start()
    try q.processAllAvailable() finally q.stop()
    assert(types.sorted.toList == (1L to 8L).map(i => (i, "insert")).toList,
      s"cdf snapshot slices must be insert-tagged, exactly once; got $types")
  }

  test("cdf mode: maxDirsPerTrigger slices one giant UPDATE commit by changed " +
    "partition; the union of slices equals the full change feed") {
    val d = freshDir("cdfslice"); val up = s"$d/up"
    val base = (0 until 12).map(i => (i.toLong, s"p${i % 6}", i * 1.0))
      .toDF("id", "part", "v")
    ManifestTable.merge(spark, up, base, keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double, Long)]
    val sink: (DataFrame, Long) => Unit = (b, _) => {
      val rs = b.select(col("_change_type"), col("id"), col("v"),
        col("_commit_version")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      batches.synchronized { batches += rs.length.toLong; got ++= rs }
    }
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft-manifest").option("path", up)
        .option("mode", "cdf").option("keys", "id")
        .option("maxDirsPerTrigger", "2").load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", s"$d/ckpt").start()
      try q.processAllAvailable() finally q.stop()
    }
    drainCdf() // snapshot: 12 insert rows, never sliced
    assert(batches.toList == List(12L), s"snapshot uncapped by design; got $batches")
    got.clear()
    // a FULL-TABLE update commit: every one of the 6 partitions changes
    ManifestTable.merge(spark, up,
      (0 until 12).map(i => (i.toLong, s"p${i % 6}", i + 1000.0))
        .toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    drainCdf()
    assert(batches.toList.drop(1) == List(8L, 8L, 8L),
      "6 changed partitions x (2 rows -> pre+post) under maxDirsPerTrigger=2 " +
        s"= three 8-row slices; got $batches")
    // the sliced feed is EXACTLY the unsliced change feed
    val direct = ManifestTable.changes(spark, up, Seq("id"), 1L, 2L)
      .select(col("_change_type"), col("id"), col("v"), col("_commit_version"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.sorted.toList == direct.sorted.toList,
      "slicing must not lose, duplicate or alter any change row")
  }

  test("maxBytesPerTrigger bounds a batch by dir bytes (soft max, >= 1 dir)") {
    val d = freshDir("bytes"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 4), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink: (DataFrame, Long) => Unit = (b, _) => batches.synchronized {
      batches += b.count()
    }
    def drainBytes(bound: String): Unit = {
      val q = spark.readStream.format("graft-manifest").option("path", up)
        .option("maxBytesPerTrigger", bound).load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", s"$d/ckpt").start()
      try q.processAllAvailable() finally q.stop()
    }
    drainBytes("1") // snapshot is uncapped
    assert(batches.toList == List(4L))
    // ONE commit of 4 new partitions; a 1-byte bound forces ONE dir
    // (= 5 rows) per trigger — 4 batches
    ManifestTable.merge(spark, up,
      (1 to 4).flatMap(p => (0 until 5).map(i => (100L * p + i, s"q$p", i * 1.0)))
        .toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    drainBytes("1")
    assert(batches.toList == List(4L, 5L, 5L, 5L, 5L),
      s"1-byte bound must slice per dir; got $batches")
    // a huge bound drains one further commit as a single batch
    ManifestTable.merge(spark, up,
      (5 to 6).map(p => (100L * p, s"q$p", 0.0)).toDF("id", "part", "v"),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    drainBytes((1L << 30).toString)
    assert(batches.toList == List(4L, 5L, 5L, 5L, 5L, 2L),
      s"a 1 GiB bound must not slice; got $batches")
  }

  test("Trigger.AvailableNow drains to the current version and terminates") {
    val d = freshDir("availnow"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 10), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    ManifestTable.merge(spark, up, rows("p1", 100 until 105), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink: (DataFrame, Long) => Unit = (b, _) => batches.synchronized {
      batches += b.count()
    }
    def drainNow(): Unit = {
      val q = spark.readStream.format("graft-manifest").option("path", up).load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", s"$d/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000L), "AvailableNow run did not terminate")
    }
    drainNow() // snapshot at m2
    assert(batches.toList == List(15L))
    ManifestTable.merge(spark, up, rows("p2", 200 until 203), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    drainNow() // the cron-shaped catch-up: new commit only, then exit
    assert(batches.toList == List(15L, 3L))
  }

  test("startingVersion: first batch is increments since the pinned version, not a snapshot") {
    val d = freshDir("startv"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 10), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    ManifestTable.merge(spark, up, rows("p1", 100 until 104), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val sink: (DataFrame, Long) => Unit = (b, _) => {
      val ids = b.select(col("id")).as[Long].collect().toSet
      batches.synchronized { batches += ids }
    }
    val q = spark.readStream.format("graft-manifest").option("path", up)
      .option("startingVersion", "1").load()
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$d/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.toList == List((100L until 104L).toSet),
      s"expected only the m2 appends, got $batches")
  }

  test("skipChangeCommits streams around a rewrite commit, emitting append commits only") {
    val d = freshDir("skipch"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 10), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val sink: (DataFrame, Long) => Unit = (b, _) => {
      val ids = b.select(col("id")).as[Long].collect().toSet
      batches.synchronized { batches += ids }
    }
    def drain(): Unit = {
      val q = spark.readStream.format("graft-manifest").option("path", up)
        .option("skipChangeCommits", "true").load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", s"$d/ckpt").start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(batches.toList == List((0L until 10L).toSet))
    // m2 rewrites p0 (a change commit), m3 appends p1: the catch-up
    // must emit ONLY m3's rows — m2 skipped wholesale, no failure
    ManifestTable.merge(spark, up, rows("p0", 0 until 3).withColumn("v", lit(7.7)),
      keys = Seq("id"), partitionCol = "part", retainVersions = 8)
    ManifestTable.merge(spark, up, rows("p1", 200 until 206), keys = Seq("id"),
      partitionCol = "part", retainVersions = 8)
    drain()
    assert(batches.toList ==
      List((0L until 10L).toSet, (200L until 206L).toSet),
      s"m2's rewrite must be skipped, m3's appends emitted: $batches")
  }

  test("cdf mode requires keys; checkpoint past the retention horizon fails loudly") {
    val d = freshDir("guard"); val up = s"$d/up"
    ManifestTable.merge(spark, up, rows("p0", 0 until 5), keys = Seq("id"),
      partitionCol = "part", retainVersions = 1)
    val sink: (DataFrame, Long) => Unit = (_, _) => ()
    val eK = intercept[Throwable] {
      val q = spark.readStream.format("graft-manifest").option("path", up)
        .option("mode", "cdf").load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", s"$d/ckptK").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(causeChain(eK).exists(c =>
      Option(c.getMessage).exists(_.contains("requires the 'keys'"))), s"got: $eK")
    drain(up, s"$d/ckpt", sink)
    // retainVersions=1: two more commits expire the checkpointed m1
    ManifestTable.merge(spark, up, rows("p1", 10 until 15), keys = Seq("id"),
      partitionCol = "part", retainVersions = 1)
    ManifestTable.merge(spark, up, rows("p2", 20 until 25), keys = Seq("id"),
      partitionCol = "part", retainVersions = 1)
    val eR = intercept[Throwable](drain(up, s"$d/ckpt", sink))
    assert(causeChain(eR).exists(c =>
      Option(c.getMessage).exists(_.contains("no longer retained"))), s"got: $eR")
  }
}
