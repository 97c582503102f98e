package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{IvfStore, PqStore}
import graft.ops.ManifestTable

/** Erasure propagation into the persisted ANN stores (IvfStore /
  * PqStore `eraseKeys`): an erased vector disappears from committed
  * search results through a DV-only commit; the trained artifacts
  * (centroids / codebooks — whole-corpus aggregates) stay put.
  */
class IvfPqStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshBase(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ivfpq_$tag").toString + "/ix"

  /** Two tight 4-d blobs around 0 and 10; float embeddings. */
  private def blobs(ids: Range): DataFrame =
    ids.map { i =>
      val c = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(c + 0.001f * i, c, c - 0.001f * i, c))
    }.toDF("vec_id", "embedding")

  /** A query OUTSIDE the corpus id space (no self-exclusion confound)
    * carrying a low-blob vector. */
  private def query: DataFrame =
    Seq((999L, Array(0.01f, 0.0f, -0.01f, 0.0f))).toDF("vec_id", "embedding")

  test("IvfStore.eraseKeys: erased vectors leave committed search results; " +
    "DV-only; drift count reflects the erasure") {
    val base = freshBase("ivf")
    IvfStore.trainCommit(spark, base, blobs(0 until 40), k = 2)
    val pre = IvfStore.searchCommitted(spark, base, query, k = 40)
      .select("neighbor_id").as[Long].collect().toSet
    assert(pre.contains(4L) && pre.contains(6L) && pre.size == 40,
      s"all corpus vectors findable before erasure; got ${pre.size}")
    val er = IvfStore.eraseKeys(spark, base, Seq(4L, 6L))
    assert(er.rowsErased == 2L && er.dirsRewritten == 0L, s"got $er")
    val post = IvfStore.searchCommitted(spark, base, query, k = 40)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!post.contains(4L) && !post.contains(6L),
      "erased vectors must never be served again")
    assert(post.size == 38, s"survivors still serve; got ${post.size}")
    assert(IvfStore.needsRetrain(spark, base).indexedRows == 38L)
  }

  test("PqStore.eraseKeys: erased codes leave the shortlist; codebooks untouched") {
    val base = freshBase("pq")
    val corpus = blobs(0 until 40)
    PqStore.trainCommit(spark, base, corpus, m = 4, k = 4)
    val pre = PqStore.searchCommitted(spark, base, corpus, query, k = 40,
      shortlist = 60).select("neighbor_id").as[Long].collect().toSet
    assert(pre.contains(4L) && pre.contains(6L) && pre.size == 40,
      s"all corpus vectors findable before erasure; got ${pre.size}")
    val booksBefore = ManifestTable.read(spark, PqStore.codebooksPath(base))
      .orderBy("sub_id", "code_id").collect().toSeq
    val er = PqStore.eraseKeys(spark, base, Seq(4L, 6L))
    assert(er.rowsErased == 2L && er.dirsRewritten == 0L, s"got $er")
    val post = PqStore.searchCommitted(spark, base, corpus, query, k = 40,
      shortlist = 60).select("neighbor_id").as[Long].collect().toSet
    assert(!post.contains(4L) && !post.contains(6L),
      "erased codes must never shortlist again")
    assert(post.size == 38, s"survivors still serve; got ${post.size}")
    assert(ManifestTable.read(spark, PqStore.codebooksPath(base))
      .orderBy("sub_id", "code_id").collect().toSeq == booksBefore,
      "erasure must not touch the codebooks")
    assert(PqStore.needsRetrain(spark, base).indexedRows == 38L)
  }

  test("retrainCommit is BLUE/GREEN: side-by-side build, one-CAS flip, " +
    "retention, crash orphans skipped, backward flips refused") {
    import graft.ops.GenPointer
    val base = freshBase("bluegreen")
    val fs = GenPointer.fsOf(spark, base)
    // gen 0 (legacy flat layout)
    IvfStore.trainCommit(spark, base, blobs(0 until 40), k = 2)
    assert(IvfStore.currentGeneration(spark, base) == 0L)
    assert(IvfStore.searchCommitted(spark, base, query, k = 40, nProbe = 2)
      .count() == 40L)
    // drift fires; the retrain builds gen 1 side-by-side + flips once
    val g1 = IvfStore.retrainCommit(spark, base, blobs(0 until 60), k = 2)
    assert(g1 == 1L && IvfStore.currentGeneration(spark, base) == 1L)
    val post = IvfStore.searchCommitted(spark, base, query, k = 60, nProbe = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(post.size == 60 && post.contains(58L),
      s"post-flip searches must serve the NEW corpus; got ${post.size}")
    // the previous generation's tables are RETAINED (keepGenerations=2):
    // a search planned just before the flip finishes against intact dirs
    assert(fs.exists(new org.apache.hadoop.fs.Path(IvfStore.indexPath(base))),
      "the pre-flip generation must survive the default retention")
    assert(ManifestTable.fastCount(spark, IvfStore.indexPath(base)).rows == 40L)
    // maintenance routes to the CURRENT generation: append + erase land
    // in gen 1, the retired-soon legacy dirs stay untouched
    IvfStore.appendBatch(spark, base, blobs(60 until 64))
    val g1root = GenPointer.root(base, 1L)
    assert(ManifestTable.fastCount(spark, IvfStore.indexPath(g1root)).rows == 64L)
    assert(ManifestTable.fastCount(spark, IvfStore.indexPath(base)).rows == 40L)
    val dc = IvfStore.needsRetrain(spark, base)
    assert(dc.trainedRows == 60L && dc.indexedRows == 64L && !dc.retrain,
      s"drift must measure the CURRENT generation; got $dc")
    IvfStore.eraseKeys(spark, base, Seq(58L))
    assert(!IvfStore.searchCommitted(spark, base, query, k = 64, nProbe = 2)
      .select("neighbor_id").as[Long].collect().toSet.contains(58L))
    // a crashed rival left an orphan build dir: numbering skips PAST it
    fs.mkdirs(new org.apache.hadoop.fs.Path(GenPointer.root(base, 5L)))
    val g6 = IvfStore.retrainCommit(spark, base, blobs(0 until 70), k = 2,
      keepGenerations = 1)
    assert(g6 == 6L && IvfStore.currentGeneration(spark, base) == 6L,
      s"next build must number past the orphan; got $g6")
    // keepGenerations=1 retired BOTH older generations' data
    assert(!fs.exists(new org.apache.hadoop.fs.Path(IvfStore.indexPath(base))),
      "retiring gen 0 deletes the legacy table dirs")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(g1root)),
      "retiring gen 1 deletes its generation dir")
    assert(IvfStore.searchCommitted(spark, base, query, k = 70, nProbe = 2)
      .count() == 70L)
    // the pointer only moves FORWARD (a stale retrain cannot roll back)
    val err = intercept[RuntimeException](GenPointer.flip(fs, base, 3L))
    assert(err.getMessage.contains("not past"), err.getMessage)
  }

  test("searchFilteredCommitted: the keep set prunes list dirs through the " +
    "committed id blooms, only surviving vectors score, and with all lists " +
    "probed the result equals brute force over the kept subset") {
    import graft.ext.Similarity
    val base = freshBase("fann")
    // Train on two DIRECTION archetypes (k-means on 2 points with
    // k=2 is exactly those points — no init sensitivity), then append
    // 40 direction-blob vectors: cosine assignment routes evens → the
    // e1-list and odds → the e2-list deterministically, so the list
    // layout is blob-pure by construction (cosine clusters are
    // directions, not offsets — a zero or shared-direction seed would
    // degenerate).
    val seeds = Seq(
      (1001L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1003L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val dirBlobs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, Array(1.0f, 0.0001f * i, 0.0f, 0.0f))
      else (i.toLong, Array(0.0001f * i, 1.0f, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    IvfStore.trainCommit(spark, base, seeds, k = 2)
    IvfStore.appendBatch(spark, base, dirBlobs)
    val keep = (0 until 40 by 2).map(i => Tuple1(i.toLong)).toDF("doc_id")
    val dirQuery = Seq((999L, Array(1.0f, 0.01f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = IvfStore.searchFilteredCommitted(spark, base, dirQuery, k = 20,
      keep = keep, keepCol = "doc_id", nProbe = 2)
    val got = r.df.orderBy(col("rank"))
      .select(col("neighbor_id"), col("rank")).as[(Long, Int)].collect().toSeq
    assert(got.forall(_._1 % 2 == 0), s"only kept (even) ids may score: $got")
    assert(got.size == 20, "the kept blob has 20 vectors; k=20 fills exactly")
    // dir evidence: the odd-blob list holds NO kept id — bloom-pruned
    assert(r.dirsProbed < r.dirsTotal && r.dirsTotal == 2L,
      s"the non-kept list dir must be pruned: probed ${r.dirsProbed} of ${r.dirsTotal}")
    // nProbe covers every list → exact equality with brute force over
    // the kept subset (same cosine, same tie order)
    val brute = Similarity.bruteForceTopK(
      dirBlobs.join(keep.withColumnRenamed("doc_id", "vec_id"),
        Seq("vec_id"), "left_semi"), dirQuery, k = 20)
      .orderBy(col("rank"))
      .select(col("neighbor_id"), col("rank")).as[(Long, Int)].collect().toSeq
    assert(got == brute, "filtered ANN with full probe must equal brute force")
    // erasure composes: an erased id can never return, even when kept
    IvfStore.eraseKeys(spark, base, Seq(2L))
    val r2 = IvfStore.searchFilteredCommitted(spark, base, dirQuery, k = 20,
      keep = keep, keepCol = "doc_id", nProbe = 2)
    assert(!r2.df.select(col("neighbor_id")).as[Long].collect().contains(2L),
      "erased vectors stay erased under a keep filter")
    // refusal past the broadcast envelope
    val big = spark.range(0, 200).select(col("id").as("doc_id"))
    val e = intercept[IllegalArgumentException] {
      IvfStore.searchFilteredCommitted(spark, base, query, k = 5,
        keep = big, keepCol = "doc_id", maxKeepKeys = 100)
    }
    assert(e.getMessage.contains("distinct keys"))
  }

  test("PqStore.searchFilteredCommitted: the keep set prunes id-hash buckets " +
    "through the committed id blooms, only surviving codes reach the ADC, " +
    "and with a covering shortlist the result equals brute force over the " +
    "kept subset") {
    import graft.ext.Similarity
    val base = freshBase("pqfann")
    val corpus = blobs(0 until 40)
    PqStore.trainCommit(spark, base, corpus, m = 4, k = 4)
    val keepIds = Seq(0L, 4L, 8L, 12L, 16L) // a kept slice of the low blob
    val keep = keepIds.map(Tuple1(_)).toDF("doc_id")
    val r = PqStore.searchFilteredCommitted(spark, base, corpus, query, k = 5,
      keep = keep, keepCol = "doc_id", shortlist = 60)
    val got = r.df.orderBy(col("rank"))
      .select(col("neighbor_id"), col("rank")).as[(Long, Int)].collect().toSeq
    assert(got.map(_._1).forall(keepIds.contains), s"only kept ids may score: $got")
    assert(got.size == 5, "k=5 fills exactly from the 5 kept vectors")
    // bucket evidence: 5 kept ids hash into < all occupied buckets
    assert(r.dirsProbed < r.dirsTotal,
      s"buckets holding no kept id must be bloom-pruned: $r")
    // a covering shortlist re-ranks EVERY kept code exactly → equal to
    // brute-force cosine top-k over the kept subset (same tie order)
    val brute = Similarity.bruteForceTopK(
      corpus.join(keep.withColumnRenamed("doc_id", "vec_id"),
        Seq("vec_id"), "left_semi"), query, k = 5)
      .orderBy(col("rank"))
      .select(col("neighbor_id"), col("rank")).as[(Long, Int)].collect().toSeq
    assert(got == brute, "filtered PQ with covering shortlist must equal brute force")
    // erasure composes: an erased id can never return, even when kept
    PqStore.eraseKeys(spark, base, Seq(4L))
    val r2 = PqStore.searchFilteredCommitted(spark, base, corpus, query, k = 5,
      keep = keep, keepCol = "doc_id", shortlist = 60)
    assert(!r2.df.select(col("neighbor_id")).as[Long].collect().contains(4L),
      "erased codes stay erased under a keep filter")
    // refusal past the broadcast envelope
    val big = spark.range(0, 200).select(col("id").as("doc_id"))
    val e = intercept[IllegalArgumentException] {
      PqStore.searchFilteredCommitted(spark, base, corpus, query, k = 5,
        keep = big, keepCol = "doc_id", maxKeepKeys = 100)
    }
    assert(e.getMessage.contains("distinct keys"))
  }

  test("vacuumGenerations: retires flipped generations beyond keep, deletes " +
    "dead orphans (at-or-below the pointer) unconditionally, protects an " +
    "in-flight build above the pointer until the horizon, and the search " +
    "answer is bit-identical across the sweep") {
    import graft.ops.GenPointer
    import org.apache.hadoop.fs.Path
    val base = freshBase("vacuum")
    val fs = GenPointer.fsOf(spark, base)
    // gen 0 (legacy) then gen 1, both kept (keepGenerations high)
    IvfStore.trainCommit(spark, base, blobs(0 until 40), k = 2)
    IvfStore.retrainCommit(spark, base, blobs(0 until 50), k = 2,
      keepGenerations = 99)
    // a CRASHED build: trained side-by-side at the next number but
    // never flipped (the crash window before the CAS)
    val crashedGen = GenPointer.next(fs, base)
    IvfStore.trainCommit(spark, GenPointer.root(base, crashedGen),
      blobs(0 until 50), k = 2)
    // a later retrain numbers PAST the orphan and flips — the orphan
    // is now at-or-below the pointer: dead with certainty
    val g = IvfStore.retrainCommit(spark, base, blobs(0 until 60), k = 2,
      keepGenerations = 99)
    assert(g == crashedGen + 1)
    // a RIVAL-IN-FLIGHT simulation: an un-flipped dir ABOVE the pointer
    val inflight = GenPointer.root(base, g + 3)
    fs.mkdirs(new Path(s"$inflight/centroids"))
    val pre = IvfStore.searchCommitted(spark, base, query, k = 60, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    // keep=1: only the current generation's data survives; the dead
    // orphan goes; the in-flight build is inside the horizon — kept
    val r = IvfStore.vacuumGenerations(spark, base, keep = 1)
    assert(r.retired.sorted == Seq(0L, 1L), s"got $r")
    assert(r.orphansDeleted == Seq(crashedGen), s"got $r")
    assert(!fs.exists(new Path(IvfStore.indexPath(base))),
      "retired gen 0 legacy dirs must be gone")
    assert(!fs.exists(new Path(GenPointer.root(base, 1L))),
      "retired gen 1 dir must be gone")
    assert(!fs.exists(new Path(GenPointer.root(base, crashedGen))),
      "the dead orphan build must be gone")
    assert(fs.exists(new Path(inflight)),
      "an in-flight build above the pointer survives inside the horizon")
    assert(fs.exists(new Path(GenPointer.root(base, g))),
      "the CURRENT generation is never touched")
    // bit-identical post-vacuum answer (same generation, same dirs)
    val post = IvfStore.searchCommitted(spark, base, query, k = 60, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(post == pre, "vacuum must not change the served answer")
    // horizon 0: the stale in-flight dir is now adjudicated crashed
    val r2 = IvfStore.vacuumGenerations(spark, base, keep = 1,
      orphanHorizonMs = 0L)
    assert(r2.orphansDeleted == Seq(g + 3) && !fs.exists(new Path(inflight)))
    // idempotent: nothing left to do
    val r3 = IvfStore.vacuumGenerations(spark, base, keep = 1)
    assert(r3.retired.isEmpty && r3.orphansDeleted.isEmpty)
  }

  test("retrainCommit(vacuumOrphans = true): the janitor runs in-line with " +
    "the flip — dead orphans sweep, retention holds, and a rival build " +
    "racing ABOVE the new pointer survives the vacuum (heartbeat-fresh)") {
    import graft.ops.GenPointer
    import org.apache.hadoop.fs.Path
    val base = freshBase("autogc")
    val fs = GenPointer.fsOf(spark, base)
    IvfStore.trainCommit(spark, base, blobs(0 until 40), k = 2) // gen 0 legacy
    // a crashed build: trained side-by-side, never flipped — dead the
    // moment anything flips past it
    val crashed = GenPointer.next(fs, base)
    IvfStore.trainCommit(spark, GenPointer.root(base, crashed),
      blobs(0 until 40), k = 2)
    val mine = crashed + 1
    // a RIVAL racing us, the real above-the-pointer window: the moment
    // our build's heartbeat lands (the FIRST thing retrainCommit
    // writes), the rival numbers past our dir — its generation sits
    // ABOVE the pointer our flip is about to set, and only the
    // inactivity horizon (reading its fresh heartbeat FILE mtime, the
    // object-store-safe signal) stands between it and the janitor
    val rivalGen = mine + 1
    val rival = new Thread(() => {
      val hb = new Path(s"${GenPointer.root(base, mine)}/_heartbeat")
      while (!fs.exists(hb)) Thread.sleep(5)
      GenPointer.heartbeat(fs, base, rivalGen)
    })
    rival.start()
    val g = IvfStore.retrainCommit(spark, base, blobs(0 until 50), k = 2,
      keepGenerations = 1, vacuumOrphans = true)
    rival.join()
    assert(g == mine, s"retrain numbered past the crashed orphan: $g")
    // retention swept in-line: keep=1 retired gen 0's legacy dirs
    assert(!fs.exists(new Path(IvfStore.indexPath(base))),
      "retired legacy generation dirs must be gone")
    // the dead orphan (un-flipped, below the new pointer) swept in-line
    assert(!fs.exists(new Path(GenPointer.root(base, crashed))),
      "the crashed build must be vacuumed with the flip")
    // the racing rival above the new pointer is PROTECTED
    assert(fs.exists(new Path(s"${GenPointer.root(base, rivalGen)}/_heartbeat")),
      "an in-flight rival above the pointer must survive the in-line vacuum")
    // the new generation serves, its own heartbeat present (so a
    // symmetric rival's janitor could never adjudicate US idle either)
    assert(fs.exists(new Path(s"${GenPointer.root(base, g)}/_heartbeat")))
    assert(IvfStore.searchCommitted(spark, base, query, k = 50, nProbe = 2)
      .count() == 50L)
  }
}
