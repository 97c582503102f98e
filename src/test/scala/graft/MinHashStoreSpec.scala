package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.MinHashStore
import graft.ops.ManifestTable

/** Persisted MinHash-LSH dedup index (MinHashStore): committed band +
  * shingle tables, dir-pruned probes, exact-jaccard verification from
  * stored shingles, idempotent appends.
  */
class MinHashStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshBase(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mhs_$tag").toString + "/mh"

  /** 40 corpus docs of distinct random-ish text plus one planted
    * near-dup target; a 3-doc batch where doc 1000 near-dups the
    * planted corpus doc 7, and 1001/1002 are novel. */
  private def corpus: Seq[(Long, String)] =
    (0L until 40L).map { i =>
      (i, (0 until 30).map(j => s"w${(i * 31 + j * 7) % 997}").mkString(" "))
    }
  private def batch: Seq[(Long, String)] = {
    val near = corpus(7)._2.split(" ").toSeq.updated(29, "zzz").mkString(" ")
    Seq((1000L, near),
      (1001L, (0 until 30).map(j => s"n${j * 13 % 991}").mkString(" ")),
      (1002L, (0 until 30).map(j => s"m${j * 17 % 983}").mkString(" ")))
  }

  test("probe finds the planted near-dup from the committed index with " +
    "dir-pruned scans; appends are idempotent") {
    val base = freshBase("e2e")
    MinHashStore.buildCommit(spark, base, corpus.toDF("doc_id", "text"))
    val probe = MinHashStore.probeBatch(spark, base, batch.toDF("doc_id", "text"))
    val pairs = probe.pairs.select("new_id", "corpus_id").as[(Long, Long)]
      .collect().toSet
    assert(pairs == Set((1000L, 7L)),
      s"only the planted near-dup must verify; got $pairs " +
        s"(candidates=${probe.candidates}, bandPrune=${probe.bandPrune}, " +
        s"shinglePrune=${probe.shinglePrune})")
    assert(probe.pairs.select("jaccard").as[Double].head() >= 0.9)
    // both index scans pruned dirs (the probe's keys cannot touch all)
    assert(probe.bandPrune._1 < probe.bandPrune._2,
      s"band scan must prune: ${probe.bandPrune}")
    assert(probe.shinglePrune._1 < probe.shinglePrune._2,
      s"shingle fetch must prune: ${probe.shinglePrune}")
    // append twice: idempotent, and a re-probe now self-matches
    val app = MinHashStore.appendBatch(spark, base, batch.toDF("doc_id", "text"))
    assert(app.docRows == 3L && app.bandRows == 48L)
    val n1 = ManifestTable.fastCount(spark, MinHashStore.bandsPath(base))
    MinHashStore.appendBatch(spark, base, batch.toDF("doc_id", "text"))
    val n2 = ManifestTable.fastCount(spark, MinHashStore.bandsPath(base))
    assert(n1.rows == n2.rows && n2.metadataOnly,
      s"re-delivered append must not change the index (${n1.rows} vs ${n2.rows})")
    assert(n2.rows == (40L + 3L) * 16L)
    // the indexed batch doc now matches itself exactly
    val again = MinHashStore.probeBatch(spark, base,
      batch.take(1).toDF("doc_id", "text"), threshold = 0.99)
    assert(again.pairs.select("new_id", "corpus_id").as[(Long, Long)]
      .collect().toSet == Set((1000L, 1000L)))
  }

  test("a hot LSH bucket refuses loudly at maxCandidateDocs instead of " +
    "materializing the pair blow-up on the driver") {
    val base = freshBase("hot")
    // adversarial corpus: 30 docs of IDENTICAL boilerplate text — every
    // band bucket collides every doc, so ONE probe doc of the same text
    // is a candidate against the whole corpus
    val boiler = (0 until 30).map(j => s"same${j % 7}").mkString(" ")
    val hot = (0L until 30L).map(i => (i, boiler))
    MinHashStore.buildCommit(spark, base, hot.toDF("doc_id", "text"))
    val probeDf = Seq((5000L, boiler)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      MinHashStore.probeBatch(spark, base, probeDf, maxCandidateDocs = 5)
    }
    assert(e.getMessage.contains("distinct corpus candidates"), s"got: $e")
    // with an adequate cap the same probe verifies all 30, distributed
    val ok = MinHashStore.probeBatch(spark, base, probeDf, threshold = 0.99)
    assert(ok.candidates == 30L &&
      ok.pairs.select("corpus_id").distinct().count() == 30L)
  }

  test("probeBatch's large-candidate regime (ids stay distributed, partition-" +
    "level pruning only) returns exactly the small-regime pairs") {
    val base = freshBase("regime")
    MinHashStore.buildCommit(spark, base, corpus.toDF("doc_id", "text"))
    val b = batch.toDF("doc_id", "text")
    val small = MinHashStore.probeBatch(spark, base, b, threshold = 0.5)
    // maxInListDocs=1 forces the distributed shape on the same probe
    val large = MinHashStore.probeBatch(spark, base, b, threshold = 0.5,
      maxInListDocs = 1)
    def pairsOf(r: MinHashStore.ProbeResult): Seq[(Long, Long)] =
      r.pairs.select("new_id", "corpus_id").as[(Long, Long)].collect().sorted.toSeq
    val sp = pairsOf(small)
    assert(sp.nonEmpty && pairsOf(large) == sp,
      s"regimes must agree: small=$sp large=${pairsOf(large)}")
    assert(large.candidates == small.candidates)
  }

  test("eraseKeys removes a doc's band AND shingle rows in one txn with zero " +
    "rewrites; a re-probe of its exact text reports no dup") {
    val base = freshBase("erase")
    MinHashStore.buildCommit(spark, base, corpus.toDF("doc_id", "text"))
    // pre: an exact copy of doc 7's text is flagged against it
    val echo = Seq((9000L, corpus(7)._2)).toDF("doc_id", "text")
    val pre = MinHashStore.probeBatch(spark, base, echo, threshold = 0.99)
    assert(pre.pairs.select("corpus_id").as[Long].collect().toSet == Set(7L))
    val er = MinHashStore.eraseKeys(spark, base, Seq(7L))
    assert(er.bandRowsErased == 16L && er.shingleRowsErased == 1L,
      s"doc 7 carries 16 band rows and 1 shingle row; got $er")
    assert(er.dirsRewritten == 0L, s"erasure must be DV-only; got $er")
    assert(er.shingleDirsProbed < er.shingleDirsTotal,
      s"the shingle delete must bloom-prune: $er")
    // the subject is GONE: zero rows via the MoR read, and the echo
    // no longer matches anything (band_miss — it never candidates)
    assert(ManifestTable.read(spark, MinHashStore.bandsPath(base))
      .filter(col("doc_id") === 7L).count() == 0L)
    assert(ManifestTable.read(spark, MinHashStore.shinglesPath(base))
      .filter(col("doc_id") === 7L).count() == 0L)
    // (a random bucket collision with ANOTHER corpus doc may still
    // candidate — verification kills it; the erased doc itself cannot)
    val post = MinHashStore.probeBatch(spark, base, echo, threshold = 0.99)
    assert(post.pairs.count() == 0L,
      s"erased doc must not suppress its echo; got ${post.candidates} candidates")
    // the store still works: append the echo, self-probe finds it
    MinHashStore.appendBatch(spark, base, echo)
    val self = MinHashStore.probeBatch(spark, base, echo, threshold = 0.99)
    assert(self.pairs.select("corpus_id").as[Long].collect().toSet == Set(9000L),
      "post-erase appends must keep indexing")
  }

  test("eraseKeys(physical = true) leaves no subject bytes in either table's " +
    "surviving files, expires prior versions, and the store keeps working") {
    val base = freshBase("phys")
    MinHashStore.buildCommit(spark, base, corpus.toDF("doc_id", "text"))
    /** doc_ids physically present under a table's data/, manifest-
      * blind — what a DV can only mask and the purge must remove. */
    def physicalDocIds(table: String): Set[Long] = spark.read
      .option("recursiveFileLookup", "true").option("pathGlobFilter", "*.parquet")
      .parquet(s"$table/data").select("doc_id").as[Long].collect().toSet
    assert(physicalDocIds(MinHashStore.bandsPath(base)).contains(7L))
    val er = MinHashStore.eraseKeys(spark, base, Seq(7L), physical = true)
    assert(er.bandRowsErased == 16L && er.shingleRowsErased == 1L, er.toString)
    assert(!physicalDocIds(MinHashStore.bandsPath(base)).contains(7L),
      "the subject's band bytes must be physically gone")
    assert(!physicalDocIds(MinHashStore.shinglesPath(base)).contains(7L),
      "the subject's shingle bytes must be physically gone")
    // prior versions expired — no time travel back to the bytes
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ManifestTable.versions(fs, MinHashStore.bandsPath(base)).size == 1)
    assert(ManifestTable.versions(fs, MinHashStore.shinglesPath(base)).size == 1)
    // layout params survived the purge commits (maintenance must not
    // drop non-durable table props) — probe + append still run under
    // the committed params
    val echo = Seq((9000L, corpus(7)._2)).toDF("doc_id", "text")
    val post = MinHashStore.probeBatch(spark, base, echo, threshold = 0.99)
    assert(post.pairs.count() == 0L)
    MinHashStore.appendBatch(spark, base, echo)
    val self = MinHashStore.probeBatch(spark, base, echo, threshold = 0.99)
    assert(self.pairs.select("corpus_id").as[Long].collect().toSet == Set(9000L),
      "post-physical-erase appends must keep indexing")
  }

  test("rebandCommit is BLUE/GREEN: the re-parameterized index builds side-by-" +
    "side, one CAS flip, probes/appends/erasures resolve the new generation") {
    import graft.ops.GenPointer
    val base = freshBase("reband")
    MinHashStore.buildCommit(spark, base, corpus.toDF("doc_id", "text"),
      numBands = 8, r = 2)
    assert(MinHashStore.currentGeneration(spark, base) == 0L)
    val echo = Seq((9000L, corpus(7)._2)).toDF("doc_id", "text")
    assert(MinHashStore.probeBatch(spark, base, echo, threshold = 0.99)
      .pairs.select("corpus_id").as[Long].collect().toSet == Set(7L))
    // reband under TIGHTER parameters; the old generation keeps serving
    // until the flip, then survives retention for in-flight probes
    val g1 = MinHashStore.rebandCommit(spark, base, corpus.toDF("doc_id", "text"),
      numBands = 16, r = 4)
    assert(g1 == 1L && MinHashStore.currentGeneration(spark, base) == 1L)
    val fs = GenPointer.fsOf(spark, base)
    assert(fs.exists(new org.apache.hadoop.fs.Path(MinHashStore.bandsPath(base))),
      "the legacy generation must survive the default retention")
    // the flipped index carries the NEW params (16 bands) and still
    // finds the planted dup; appends and erasures land in gen 1
    val post = MinHashStore.probeBatch(spark, base, echo, threshold = 0.99)
    assert(post.pairs.select("corpus_id").as[Long].collect().toSet == Set(7L))
    MinHashStore.appendBatch(spark, base, echo)
    val g1root = GenPointer.root(base, 1L)
    assert(graft.ops.ManifestTable.read(spark, MinHashStore.shinglesPath(g1root))
      .filter(col("doc_id") === 9000L).count() == 1L,
      "appends must land in the current generation")
    assert(graft.ops.ManifestTable.read(spark, MinHashStore.shinglesPath(base))
      .filter(col("doc_id") === 9000L).count() == 0L,
      "the retired-soon legacy tables must stay untouched")
    val er = MinHashStore.eraseKeys(spark, base, Seq(7L))
    assert(er.bandRowsErased == 16L,
      s"erasure resolves gen 1 (16 band rows under the NEW numBands); got $er")
    assert(MinHashStore.probeBatch(spark, base,
      Seq((9100L, corpus(7)._2)).toDF("doc_id", "text"), threshold = 0.99)
      .pairs.select("corpus_id").as[Long].collect().toSet == Set(9000L),
      "post-erasure probes match only the appended echo, not the erased subject")
  }

  test("an empty or matchless batch probes to zero pairs; params survive appends") {
    val base = freshBase("none")
    MinHashStore.buildCommit(spark, base, corpus.toDF("doc_id", "text"),
      numBands = 8, r = 2, nBuckets = 4)
    val none = MinHashStore.probeBatch(spark, base,
      Seq((2000L, "totally unrelated fresh words only")).toDF("doc_id", "text"))
    assert(none.pairs.count() == 0L)
    MinHashStore.appendBatch(spark, base,
      Seq((2000L, "totally unrelated fresh words only")).toDF("doc_id", "text"))
    // params re-committed with the append: a later probe still works
    val p2 = MinHashStore.probeBatch(spark, base,
      Seq((2001L, "totally unrelated fresh words only")).toDF("doc_id", "text"),
      threshold = 0.99)
    assert(p2.pairs.select("corpus_id").as[Long].collect().toSeq == Seq(2000L),
      "the appended doc must be findable under the committed params")
  }
}
