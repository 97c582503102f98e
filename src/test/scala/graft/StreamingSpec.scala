package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

case class Tick(asset_id: String, ts: Timestamp, price: Double,
                market_cap: Option[Double], volume: Option[Double])

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streamed hourly candles + merge sink equal the batch result; late data absorbed") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val sink = s"$dir/candles"

    val input = MemoryStream[Tick]
    val query = StreamingIngest.hourlyCandles(input.toDF())
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch(StreamingIngest.candleMergeSink(sink))
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    val batch1 = Seq(
      Tick("btc", ts("2024-01-01 01:05:00"), 100.0, Some(1000.0), Some(10.0)),
      Tick("btc", ts("2024-01-01 01:45:00"), 110.0, Some(1100.0), Some(11.0)),
      Tick("btc", ts("2024-01-01 02:05:00"), 105.0, None, Some(10.5)))
    input.addData(batch1: _*)
    query.processAllAvailable()

    // late tick for the 01:00 window, within watermark → window re-emitted,
    // merge overwrites the stale candle (overlap-and-upsert semantics)
    val late = Tick("btc", ts("2024-01-01 01:55:00"), 90.0, Some(900.0), Some(9.0))
    input.addData(late)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.read.parquet(sink)
      .select("asset_id", "ts", "open", "high", "low", "close", "n_ticks")
      .orderBy("ts")

    val batchResult = StreamingIngest.hourlyCandles((batch1 :+ late).toDF())
      .select("asset_id", "ts", "open", "high", "low", "close", "n_ticks")
      .orderBy("ts")

    assert(streamed.collect().toSeq == batchResult.collect().toSeq)
    // the late tick is reflected: 01:00 window low=90, close=90 (ts 01:55), 3 ticks
    val h1 = streamed.filter(col("ts") === ts("2024-01-01 01:00:00"))
      .select("low", "close", "n_ticks").as[(Double, Double, Long)].head()
    assert(h1 == ((90.0, 90.0, 3L)))
  }

  test("streaming session_window finalizes watermark-passed sessions; stream == batch") {
    // The q63 surface under a stream: session_window + watermark in
    // Append mode emits a (user, session) row exactly when the
    // watermark passes session end + gap — the unbounded-stream form
    // of gap sessionization. Finalized sessions must equal the batch
    // session_window aggregation over the same rows.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n_events"))
    val name = s"sw_sessions_${System.nanoTime()}"
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()

    val early = Seq(
      (1L, ts("2024-01-01 01:00:00")), (1L, ts("2024-01-01 01:10:00")),
      (2L, ts("2024-01-01 01:05:00")))
    val laterUser1 = (1L, ts("2024-01-01 03:00:00"))
    val farFuture = (2L, ts("2024-01-01 09:00:00"))
    input.addData(early: _*)
    q.processAllAvailable()
    input.addData(laterUser1) // watermark → 02:50: the 01:xx sessions close
    q.processAllAvailable()
    input.addData(farFuture) // watermark → 08:50: user 1's 03:00 session closes
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table(name)
      .as[(Long, Timestamp, Long)].collect().toSet
    // batch reference over the SAME rows; the final un-closed session
    // (user 2 at 09:00 — the watermark never passed it) is the one
    // row Append mode must still be holding back
    val all = (early :+ laterUser1 :+ farFuture).toDF("user_id", "ts")
    val batch = all
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n_events"))
      .as[(Long, Timestamp, Long)].collect().toSet
    val unclosed = (2L, ts("2024-01-01 09:00:00"), 1L)
    assert(batch.contains(unclosed))
    assert(streamed == batch - unclosed,
      s"streamed=$streamed\nbatch=$batch")
  }

  test("streaming exact dedup drops repeated content within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingIngest.dedupDocuments(
        input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName("dedup_out")
      .start()

    input.addData(
      (1L, ts("2024-01-01 00:00:00"), "alpha beta"),
      (2L, ts("2024-01-01 00:01:00"), "ALPHA   beta"), // same normalized content
      (3L, ts("2024-01-01 00:02:00"), "gamma delta"))
    query.processAllAvailable()
    input.addData((4L, ts("2024-01-01 00:30:00"), "alpha beta")) // still duplicate
    query.processAllAvailable()
    query.stop()

    val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L))
  }

  test("dedup-within-watermark semantics: late rows filter even for unseen keys, " +
    "post-eviction re-arrival re-emits, dropped dups do not extend expiry") {
    // The q118 oracle encodes exactly these rules; this test pins them
    // against the live operator so a Spark behavior change fails HERE
    // with a named assertion, not as an opaque gate hash mismatch.
    implicit val sqlCtx = spark.sqlContext
    def t(s: Long) = new Timestamp(s * 1000L)
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingIngest.dedupDocuments(
        input.toDF().toDF("doc_id", "ts", "text"), watermark = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_sem_out").start()
    // b1: k1, k2 at t=100 (expiry 110)
    input.addData((1L, t(100), "k1"), (2L, t(100), "k2"))
    query.processAllAvailable()
    // b2 (wm 90): dup k1@105 dropped (state alive; also must NOT
    // extend expiry); k3@200 advances the watermark; k4@50 is an
    // UNSEEN key below the watermark -> late-filtered
    input.addData((3L, t(105), "k1"), (4L, t(200), "k3"), (5L, t(50), "k4"))
    query.processAllAvailable()
    // b3 (wm 190): k1's expiry stayed 110 (not 115) < 190 -> evicted,
    // re-emits; k3's expiry 210 > 190 -> still deduped
    input.addData((6L, t(205), "k1"), (7L, t(205), "k3"))
    query.processAllAvailable()
    query.stop()
    val ids = spark.table("dedup_sem_out").select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L, 6L),
      s"got $ids: expected k1/k2 from b1, k3 from b2 (k1-dup dropped, k4 late-filtered), " +
        "and the post-eviction k1 re-emission from b3 (k3 still deduped)")
  }

  test("transformWithState sessionizer: gap closes at arrival, timer closes at " +
    "watermark, unclosed tail never emits, late rows are filtered") {
    // The q121 oracle encodes exactly these rules; pin them against
    // the live operator so a Spark behavior change fails HERE.
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{ClosedSession, SessionEvent}
    def t(s: Long) = new Timestamp(s * 1000L)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.get(provKey,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[SessionEvent]
      val query = StreamingIngest.sessionizeStream(input.toDS(),
          gapMs = 30000L, watermark = "10 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_sessions").start()
      // b1: u1 at 100,110 (one session); u2 at 100
      input.addData(SessionEvent(1L, t(100)), SessionEvent(1L, t(110)),
        SessionEvent(2L, t(100)))
      query.processAllAvailable()
      // b2 (wm 100): u1 at 300 — gap 190 > 30 closes [100,110] AT
      // ARRIVAL; u2 at 105 extends its open session (105 >= wm)
      input.addData(SessionEvent(1L, t(300)), SessionEvent(2L, t(105)))
      query.processAllAvailable()
      // b3 (wm 290): u2's timer (135) fires -> [100,105] emits; a TRUE
      // late row (u4 at 50 < wm) must never reach the processor; u3 at
      // 1000 advances the final watermark so u1's [300,300] closes by
      // timer in the trailing batch; u3's own session stays OPEN
      // (timer 1030 > final wm 990) and must not emit
      input.addData(SessionEvent(3L, t(1000)), SessionEvent(4L, t(50)))
      query.processAllAvailable()
      query.stop()
      val got = spark.table("tws_sessions").as[ClosedSession].collect()
        .map(s => (s.user_id, s.session_start.getTime / 1000,
          s.session_end.getTime / 1000, s.n_events)).toSet
      assert(got == Set(
        (1L, 100L, 110L, 2L),  // closed at arrival by the 300 event
        (1L, 300L, 300L, 1L),  // closed by timer under the final watermark
        (2L, 100L, 105L, 2L)), // extended across batches, closed by timer
        s"got $got — u3 must stay open (unclosed tail) and u4's late row filtered")
    } finally spark.conf.set(provKey, prevProv)
  }

  test("matchPattern: one B resolves all covered pending A's, timeouts fire at " +
    "watermark, open windows and late/uncovered B's emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{PatternEvent, PatternOutcome}
    def t(s: Long) = new Timestamp(s * 1000L)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.get(provKey,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[PatternEvent]
      val query = StreamingIngest.matchPattern(input.toDS(),
          horizonMs = 50000L, watermark = "10 seconds")
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_pattern").start()
      // b1: u1 has two pending A's resolved by ONE B in-batch; u2's A
      // never sees a B; u7's A will lose its B to the late filter
      input.addData(
        PatternEvent(1L, "A", t(100), 1L), PatternEvent(1L, "A", t(110), 2L),
        PatternEvent(1L, "B", t(120), 91L),
        PatternEvent(2L, "A", t(100), 3L),
        PatternEvent(7L, "A", t(120), 7L))
      query.processAllAvailable()
      // b2 (wm 110): u3's B has no pending A (ignored); advances wm to
      // 290 so u2's and u7's timers fire next; u4's A stays pending
      input.addData(PatternEvent(3L, "B", t(300), 92L),
        PatternEvent(4L, "A", t(285), 4L))
      query.processAllAvailable()
      // b3 (wm 290): u4's B matches across batches; u6 is the equal-ts
      // A/B pair (must match — A sorts first); u7's B arrives LATE
      // (140 < wm, filtered); u5's A advances the final wm but its own
      // window stays open (1050 > 990) and must not emit
      input.addData(PatternEvent(4L, "B", t(300), 93L),
        PatternEvent(6L, "A", t(600), 6L), PatternEvent(6L, "B", t(600), 94L),
        PatternEvent(7L, "B", t(140), 95L),
        PatternEvent(5L, "A", t(1000), 5L))
      query.processAllAvailable()
      query.stop()
      val got = spark.table("tws_pattern").as[PatternOutcome].collect()
        .map(o => (o.a_id, o.a_ts.getTime / 1000, o.b_ts.getTime / 1000, o.matched))
        .toSet
      assert(got == Set(
        (1L, 100L, 120L, true), (2L, 110L, 120L, true), // one B, both A's
        (3L, 100L, 0L, false),                          // timeout
        (4L, 285L, 300L, true),                         // cross-batch match
        (6L, 600L, 600L, true),                         // equal-ts pair
        (7L, 120L, 0L, false)),                         // its B was late-filtered
        s"got $got — id5's open window must not emit; uncovered/late B's resolve nothing")
    } finally spark.conf.set(provKey, prevProv)
  }

  test("manifestMergeSink is exactly-once per batch id: a re-delivered batch is " +
    "skipped wholesale, a fresh id merges") {
    import graft.ops.ManifestTable
    import graft.streaming.StreamingIngest
    val path = java.nio.file.Files.createTempDirectory("graft-eo-sink").toString + "/t"
    val sink = StreamingIngest.manifestMergeSink(path, keys = Seq("asset_id", "ts"))
    def frame(price: Double) =
      Seq(("btc", ts("2024-01-01 01:00:00"), price)).toDF("asset_id", "ts", "price")
    sink(frame(100.0), 0L)
    assert(ManifestTable.read(spark, path).select("price").as[Double].collect().toSeq
      == Seq(100.0))
    // crash-recovery re-delivery of batch 0 with DIFFERENT data: the
    // atomic batch-id property says it already committed -> skipped
    sink(frame(666.0), 0L)
    assert(ManifestTable.read(spark, path).select("price").as[Double].collect().toSeq
      == Seq(100.0), "a replayed batch id must leave no trace")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ManifestTable.versions(fs, path) == Seq(1L),
      "the skipped replay must not even commit a version")
    // the next batch id merges normally and advances the marker
    sink(frame(120.0), 1L)
    assert(ManifestTable.read(spark, path).select("price").as[Double].collect().toSeq
      == Seq(120.0))
    assert(ManifestTable.readProps(spark, path)(StreamingIngest.StreamBatchIdProp) == "1")
    // MAINTENANCE between commit and replay must not wipe the
    // exactly-once watermark: land eth (batch 2), MoR-delete it, FOLD
    // the debt, then replay batch 2 with poisoned data — still skipped
    sink(Seq(("eth", ts("2024-01-02 01:00:00"), 50.0)).toDF("asset_id", "ts", "price"), 2L)
    ManifestTable.deleteWhereMoR(spark, path, "day",
      org.apache.spark.sql.functions.col("asset_id") === "eth", retainVersions = 4)
    assert(ManifestTable.foldMoR(spark, path, "day", retainVersions = 4) > 0L)
    assert(ManifestTable.readProps(spark, path)(StreamingIngest.StreamBatchIdProp) == "2",
      "foldMoR must carry the durable stream watermark forward")
    sink(frame(666.0), 2L)
    assert(ManifestTable.read(spark, path).orderBy("asset_id")
      .select("price").as[Double].collect().toSeq == Seq(120.0),
      "a replayed batch after a fold must still be skipped (no 666, no eth)")
  }

  test("stream -> exactly-once manifest sink -> per-batch IncrementalAgg refresh " +
    "keeps a live aggregate view equal to a full recompute") {
    // The full composition a continuous ingest runs: micro-batches
    // land durably (exactly-once), and the maintained view follows
    // each commit by folding in only that batch's touched partitions.
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.{IncrementalAgg, ManifestTable}
    import graft.streaming.StreamingIngest
    val root = java.nio.file.Files.createTempDirectory("graft-live-agg").toString
    val (bPath, aPath) = (s"$root/base", s"$root/agg")
    val input = MemoryStream[(String, Timestamp, Long)]
    val sink = StreamingIngest.manifestMergeSink(bPath, keys = Seq("asset_id", "ts"))
    val query = input.toDF().toDF("asset_id", "ts", "v_e3")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink(df, id)
        IncrementalAgg.refresh(spark, bPath, aPath, Seq("asset_id"), Seq("v_e3"))
        ()
      }
      .option("checkpointLocation", s"$root/ckpt").start()
    def agg() = IncrementalAgg.read(spark, aPath).orderBy("asset_id")
      .select("asset_id", "n", "sum_v_e3").as[(String, Long, Long)].collect().toSeq
    input.addData(("btc", ts("2024-01-01 01:00:00"), 100L),
      ("btc", ts("2024-01-01 02:00:00"), 110L),
      ("eth", ts("2024-01-01 01:30:00"), 7L))
    query.processAllAvailable()
    assert(agg() == Seq(("btc", 2L, 210L), ("eth", 1L, 7L)))
    // batch 2: an UPSERT of an existing key (overlap refetch) plus a
    // new day — the view must retract the old value, not double-count
    input.addData(("btc", ts("2024-01-01 02:00:00"), 111L),
      ("eth", ts("2024-01-02 05:00:00"), 8L))
    query.processAllAvailable()
    query.stop()
    assert(agg() == Seq(("btc", 2L, 211L), ("eth", 2L, 15L)),
      "the per-batch maintained view must equal a full recompute after an upsert")
    assert(ManifestTable.read(spark, bPath).count() == 4)
  }

  test("nearDupCandidatesTtl: long TTL matches the unbounded form; expired buckets " +
    "are re-claimed and stop flagging") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{DocText, NearDupCandidate}
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.get(provKey,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // ProcessingTime TimeMode (which state TTL requires) triggers
      // micro-batches CONTINUOUSLY, so processAllAvailable never
      // settles — assertions POLL the memory sink for the expected
      // emission instead. Sentinel emissions make batch completion
      // visible; the batching of adjacent addData calls is immaterial
      // because in-batch processing sorts by doc_id and yields the
      // same candidate set either way.
      def await(cond: => Boolean, what: String): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(cond, s"timed out waiting for $what")
      }
      def dups(tbl: String): Set[(Long, Long)] =
        spark.table(tbl).as[NearDupCandidate].collect()
          .map(c => (c.doc_id, c.dup_of)).toSet
      val text = "the quick brown fox jumps over the lazy dog again and again"
      val in = MemoryStream[DocText]
      val q = StreamingIngest.nearDupCandidatesTtl(in.toDS(),
          ttl = java.time.Duration.ofSeconds(1))
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("ttl_dedup").start()
      try {
        // claim + an in-window duplicate (the sentinel making the
        // batch visibly processed before the TTL sleep)
        in.addData(DocText(10L, text), DocText(20L, text))
        await(dups("ttl_dedup").contains((20L, 10L)), "the in-window duplicate flag")
        assert(dups("ttl_dedup").forall(_ == (20L, 10L)))
        Thread.sleep(2500) // let every bucket's 1 s TTL lapse
        in.addData(DocText(11L, text)) // expired -> re-claims, must NOT flag vs 10
        in.addData(DocText(12L, text)) // flags against the RE-claimant
        await(dups("ttl_dedup").contains((12L, 11L)), "the post-expiry re-claim flag")
        val got = dups("ttl_dedup")
        assert(got == Set((20L, 10L), (12L, 11L)),
          s"post-expiry 11 must re-claim clean (no (11,10)) and 12 flags against 11: $got")
      } finally q.stop()
    } finally spark.conf.set(provKey, prevProv)
  }

  test("flatMapGroupsWithState high-watermark alerts carry state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{HighAlert, PriceTick}
    val input = MemoryStream[PriceTick]
    val query = StreamingIngest.highWatermarkAlerts(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("alerts_out").start()

    input.addData(
      PriceTick("btc", ts("2024-01-01 00:00:00"), 100.0),
      PriceTick("btc", ts("2024-01-01 01:00:00"), 90.0),   // below high → no alert
      PriceTick("btc", ts("2024-01-01 02:00:00"), 120.0))
    query.processAllAvailable()
    input.addData(
      PriceTick("btc", ts("2024-01-01 03:00:00"), 110.0),  // state survived: 120 still high
      PriceTick("btc", ts("2024-01-01 04:00:00"), 130.0))
    query.processAllAvailable()
    query.stop()

    val alerts = spark.table("alerts_out").as[HighAlert].collect().sortBy(_.ts.getTime)
    assert(alerts.map(_.price).toSeq == Seq(100.0, 120.0, 130.0))
    assert(alerts.last.prev_high == 120.0) // state crossed the batch boundary
  }

  test("streaming near-dup candidates flag cross-batch band collisions; stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{DocText, NearDupCandidate}
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "changed" else s"tok$i").mkString(" ")
    val unrelated = (100 to 160).map(i => s"zzz$i").mkString(" ")

    val input = MemoryStream[DocText]
    val q = StreamingIngest.nearDupCandidates(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("neardup_out").start()
    input.addData(DocText(1L, base), DocText(3L, unrelated))
    q.processAllAvailable()
    input.addData(DocText(2L, nearDup)) // later batch: must hit doc 1's band state
    q.processAllAvailable()
    q.stop()
    val streamPairs = spark.table("neardup_out").as[NearDupCandidate]
      .collect().map(c => (c.doc_id, c.dup_of)).toSet
    assert(streamPairs == Set((2L, 1L)))

    // batch execution of the same operator agrees (smallest id wins in-group)
    val batchPairs = StreamingIngest.nearDupCandidates(
        Seq(DocText(1L, base), DocText(2L, nearDup), DocText(3L, unrelated)).toDS())
      .collect().map(c => (c.doc_id, c.dup_of)).toSet
    assert(batchPairs == Set((2L, 1L)))
  }

  test("streaming candidacy equals candidates derived from the BATCH band join's buckets") {
    // Round-4 advisory: the scaladoc's stream==batch claim was only
    // checked against the streaming operator's own batch execution —
    // a seed/type drift in a duplicated hash chain would pass that.
    // The chain is now factored into Dedup.permHash/bandBuckets; this
    // spec additionally proves agreement end-to-end on real docs:
    // expected candidates recomputed from Dedup.minhashSignatures +
    // the shared band combiner (the batch band-join build side) must
    // equal the streaming operator's output exactly.
    import graft.ext.Dedup
    import graft.streaming.DocText
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(50)
    val sh = docs
      .select(col("doc_id").as("__id"),
        split(Dedup.normalized(col("text")), " ").as("__toks"))
      .select(col("__id"), Dedup.shinglesFromToks(col("__toks")).as("__sh"))
      .filter(size(col("__sh")) > 0)
    val sig = Dedup.minhashSignatures(sh, 64)
    val expected = sig
      .select(col("__id"), explode(Dedup.bandBuckets(16, 4)(s => col(s"__m$s"))).as("__b"))
      .groupBy(col("__b.band").as("band"), col("__b.bucket"))
      .agg(min(col("__id")).as("first"), collect_set(col("__id")).as("ids"))
      .select(col("band"), col("first"), explode(col("ids")).as("doc_id"))
      .filter(col("doc_id") =!= col("first"))
      .select(col("doc_id"), col("first").as("dup_of"), col("band"))
      .as[(Long, Long, Int)].collect().toSet
    val got = StreamingIngest.nearDupCandidates(docs.as[DocText])
      .collect().map(c => (c.doc_id, c.dup_of, c.band)).toSet
    assert(got == expected,
      s"stream and batch band buckets disagree: extra=${got -- expected} missing=${expected -- got}")
  }

  test("stream-stream interval join attributes clicks within the horizon; stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamingIngest.attributeClicks(
        imps.toDF().toDF("imp_id", "ad_id", "imp_ts"),
        clicks.toDF().toDF("click_id", "click_ad_id", "click_ts"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr_out").start()

    imps.addData(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 20L, ts("2024-01-01 00:00:00")))
    q.processAllAvailable()
    clicks.addData(
      (100L, 10L, ts("2024-01-01 00:05:00")), // within 10 min of imp 1 — match
      (101L, 10L, ts("2024-01-01 00:20:00")), // past the horizon — no match
      (102L, 20L, ts("2024-01-01 00:09:00")), // within horizon, ad 20 — match
      (103L, 30L, ts("2024-01-01 00:01:00"))) // no impression for ad 30
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("attr_out")
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(streamed == Set((1L, 100L), (2L, 102L)))

    // identical operator over batch frames (watermarks no-op) agrees
    val impB = Seq((1L, 10L, ts("2024-01-01 00:00:00")), (2L, 20L, ts("2024-01-01 00:00:00")))
      .toDF("imp_id", "ad_id", "imp_ts")
    val clkB = Seq(
      (100L, 10L, ts("2024-01-01 00:05:00")), (101L, 10L, ts("2024-01-01 00:20:00")),
      (102L, 20L, ts("2024-01-01 00:09:00")), (103L, 30L, ts("2024-01-01 00:01:00")))
      .toDF("click_id", "click_ad_id", "click_ts")
    val batch = StreamingIngest.attributeClicks(impB, clkB)
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(batch == streamed)
  }

  test("left-outer stream-stream join emits unmatched impressions with NULLs, " +
    "only after the watermark evicts them") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val name = s"attr_outer_${System.nanoTime()}"
    val q = StreamingIngest.attributeClicks(
        imps.toDF().toDF("imp_id", "ad_id", "imp_ts"),
        clicks.toDF().toDF("click_id", "click_ad_id", "click_ts"),
        watermark = "30 minutes", joinType = "left_outer")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()

    imps.addData(
      (1L, 10L, ts("2024-01-01 00:00:00")),  // will match
      (2L, 20L, ts("2024-01-01 00:00:00")))  // never clicks
    clicks.addData((100L, 10L, ts("2024-01-01 00:05:00")))
    q.processAllAvailable()
    def rows() = spark.table(name)
      .select(col("imp_id"), col("click_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // the match emits immediately; imp 2's window (10 min) is open and
    // a click may still arrive — NO null row yet
    assert(rows() == Set((1L, 100L)),
      "unmatched impression emitted before its window closed")
    // advance both watermarks far past imp 2's window; the eviction
    // batch emits the unmatched row with null click columns
    imps.addData((3L, 30L, ts("2024-01-01 02:00:00")))
    clicks.addData((101L, 30L, ts("2024-01-01 02:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = rows()
    assert(got.contains((2L, -1L)),
      s"closed unmatched impression never emitted its null row: $got")
    assert(got.contains((1L, 100L)) && got.contains((3L, 101L)))
    // and exactly once: no duplicate null emission for imp 2
    assert(spark.table(name).filter(col("imp_id") === 2L).count() == 1)
    // the null row's click columns really are NULL (the q114 gate
    // projects them to sentinels only for hash transport)
    val nullRow = spark.table(name).filter(col("imp_id") === 2L).collect()(0)
    assert(nullRow.isNullAt(nullRow.fieldIndex("click_id")) &&
      nullRow.isNullAt(nullRow.fieldIndex("click_ts")))
  }

  test("streaming hopping windows finalize behind the watermark; stream == batch") {
    // q84's operator under a stream: EventAnalytics.hoppingCounts is
    // the built-in window() generator, so the SAME function runs over
    // a streaming frame with a watermark — the batch/stream shared-
    // plan claim, asserted. Append mode emits a window exactly when
    // the watermark passes its end.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val counts = graft.ops.EventAnalytics.hoppingCounts(
      input.toDF().toDF("ts", "value").withWatermark("ts", "10 minutes"))
    val name = s"hop_out_${System.nanoTime()}"
    val q = counts.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()

    val early = Seq(
      (ts("2024-01-01 00:10:00"), 1.0), // windows 23:30 (prev day) and 00:00
      (ts("2024-01-01 00:40:00"), 2.0)) // windows 00:00 and 00:30
    val late = (ts("2024-01-01 03:00:00"), 4.0) // watermark → 02:50 closes all early windows
    input.addData(early: _*)
    q.processAllAvailable()
    input.addData(late)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table(name)
      .as[(Timestamp, Long, Long)].collect().toSet
    // batch over the same rows, minus the two windows holding the late
    // event — the watermark never passed them, Append must withhold
    val batch = graft.ops.EventAnalytics.hoppingCounts(
        (early :+ late).toDF("ts", "value"))
      .as[(Timestamp, Long, Long)].collect().toSet
    val withheld = Set(
      (ts("2024-01-01 02:30:00"), 1L, 4000L),
      (ts("2024-01-01 03:00:00"), 1L, 4000L))
    assert(withheld.subsetOf(batch))
    assert(streamed == batch -- withheld, s"streamed=$streamed\nbatch=$batch")
  }

  test("Jsonl.parseLines runs unchanged on a stream (map-only) and routes identically") {
    // the parser is a stateless projection, so the SAME call works on
    // a streaming frame — the property that makes the q102 ingest
    // shape deployable as a continuous tail -f of landing shards
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL("id BIGINT, text STRING")
    val input = MemoryStream[String]
    val query = graft.sources.Jsonl.parseLines(input.toDF().toDF("line"), "line", schema)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("jsonl_out").start()
    input.addData("""{"id":1,"text":"ok"}""", "broken {", """{"id":2,"text":"also ok"}""")
    query.processAllAvailable()
    input.addData("more garbage") // corrupt lines keep flowing batch over batch
    query.processAllAvailable()
    query.stop()
    val out = spark.table("jsonl_out")
    assert(out.count() == 4)
    assert(out.filter(!col("is_corrupt")).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(out.filter(col("is_corrupt")).select("_corrupt_record").as[String].collect().toSet ==
      Set("broken {", "more garbage"))
  }
}
