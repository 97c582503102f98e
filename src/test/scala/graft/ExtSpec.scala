package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Curate, Dedup, Embeddings, Similarity, TextAnalysis}
import graft.functions.VectorFunctions

/** Extension-layer coverage (similarity, dedup, text analysis) — the
  * components the round-1 verdict found untested. Small in-memory
  * corpora with planted duplicates/neighbors, plus recall floors on
  * the sf0.001 testdata. */
class ExtSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // --- cosine expression ---------------------------------------------------

  test("codegen cosine agrees with the HOF form on real embeddings") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib"))
    val diffs = pairs.select(
        abs(VectorFunctions.cosine(col("va"), col("vb")) -
            VectorFunctions.cosineHof(col("va"), col("vb"))).as("d"))
      .agg(max("d")).as[Double].head()
    assert(diffs < 1e-9, s"codegen vs HOF max diff $diffs")
  }

  test("cosine handles zero vectors and identical vectors") {
    val df = Seq(
      (Array(0f, 0f), Array(1f, 1f)),
      (Array(3f, 4f), Array(3f, 4f)),
      (Array(1f, 0f), Array(0f, 1f))
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(got(2) == 0.0)
  }

  test("codegen LSH band buckets agree with the HOF plane-dot form") {
    val numBands = 2; val r = 4; val dim = 16
    val planes = VectorFunctions.hyperplanes(dim, numBands * r, seed = 42L)
    val rng = new scala.util.Random(3)
    val df = Seq.tabulate(20)(i => (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val got = df.select($"vec_id",
        VectorFunctions.lshBandBuckets($"embedding", planes, numBands, r).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    val expected = df.select(($"vec_id" +:
        (0 until numBands).map { b =>
          (VectorFunctions.lshBucket($"embedding", planes.slice(b * r, (b + 1) * r))
            + lit(b.toLong << r)).as(s"b$b")
        }): _*)
      .collect().map(row => row.getLong(0) -> (1 to numBands).map(row.getLong))
      .toMap
    assert(got.forall { case (id, bs) => bs == expected(id) })
  }

  // --- similarity search ---------------------------------------------------

  test("bruteForceTopK finds the planted nearest neighbor first") {
    val base = Array.tabulate(8)(i => math.sin(i * 1.7).toFloat)
    val near = base.map(x => x * 1.001f) // same direction
    val far = Array.tabulate(8)(i => math.cos(i * 2.3).toFloat)
    val corpus = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 1L)
    val top = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect()
    assert(top.head == 2L)
  }

  test("Aggregator top-k equals the window-form top-k exactly") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 5)
    val win = Similarity.bruteForceTopK(emb, queries, 10)
      .select($"query_id", $"neighbor_id", $"sim", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val agg = Similarity.bruteForceTopKAgg(emb, queries, 10)
      .select($"query_id", $"neighbor_id", $"sim", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(agg == win)
  }

  test("lshTopK recall vs brute force >= 0.7 on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"LSH recall $recall")
  }

  test("nearDupPairs: LSH path finds planted embedding near-dups and is a subset of all-pairs") {
    val rng = new scala.util.Random(7)
    val vecs = Seq.tabulate(30)(i => (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat)))
    // plant: 100 and 101 share vec 0's direction
    val planted = Seq((100L, vecs.head._2.map(_ * 2f)), (101L, vecs.head._2.map(_ * 3f)))
    val df = (vecs ++ planted).toDF("vec_id", "embedding")
    val lsh = Similarity.nearDupPairs(df, threshold = 0.99, dim = 16)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.nearDupPairs(df, threshold = 0.99, allPairs = true, dim = 16)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    // identical-direction vectors share every band bucket → always found
    assert(lsh.contains((0L, 100L)) && lsh.contains((0L, 101L)) && lsh.contains((100L, 101L)))
  }

  test("unitNorm yields norm-1 vectors where cosine degenerates to the dot product") {
    val emb = Tables.embeddings(spark, sf).limit(100)
    val n = emb.select($"vec_id", Embeddings.unitNorm($"embedding").as("embedding"))
    def sq(v: org.apache.spark.sql.Column) =
      aggregate(v, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double"))
    val normErr = n.select(max(abs(sqrt(sq($"embedding")) - 1.0d))).as[Double].head()
    assert(normErr < 1e-5, s"norms off by $normErr")
    val pairs = n.select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(n.select($"vec_id".as("ib"), $"embedding".as("vb")))
      .filter($"ia" < $"ib").limit(300)
    val dot = aggregate(
      zip_with($"va", $"vb", (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0d), (acc, x) => acc + x)
    val maxDiff = pairs
      .select(max(abs(VectorFunctions.cosine($"va", $"vb") - dot))).as[Double].head()
    assert(maxDiff < 1e-5, s"cosine != dot after normalization: $maxDiff")

    // pooling: every (group, coordinate) cell aggregates every group member
    val pooled = Embeddings.poolSumsE7(
      emb.withColumn("grp", $"vec_id" % 10), grpCol = "grp")
    val counts = pooled.groupBy($"grp").agg(countDistinct($"n_vecs").as("d"), max($"n_vecs").as("m"))
      .as[(Long, Long, Long)].collect()
    assert(counts.forall(_._2 == 1L)) // same member count at every coordinate
    assert(counts.map(_._3).sum == 100L)
  }

  test("nearDupPairsIvf: exact precision, recall >= 0.8, and fewer scored pairs than all-pairs") {
    val emb = Tables.embeddings(spark, sf)
    val centroids = ext.Ivf.train(emb, k = 16, iters = 3)
    val found = ext.Similarity.nearDupPairsIvf(emb, centroids, threshold = 0.4, nProbe = 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val exact = ext.Similarity.nearDupPairs(emb, threshold = 0.4) // routes to all-pairs
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert((found -- exact).isEmpty, s"false positives: ${found -- exact}") // precision theorem
    val recall = (found & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall < 0.8 (hit ${(found & exact).size}/${exact.size})")
  }

  test("IVF search recall vs brute force >= 0.5 on sf0.001 embeddings; assignment is total") {
    val emb = Tables.embeddings(spark, sf)
    val centroids = graft.ext.Ivf.train(emb, k = 8, iters = 3)
    assert(centroids.count() == 8)
    val index = graft.ext.Ivf.index(emb, centroids)
    assert(index.count() == emb.count()) // every vector lands in exactly one list
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = graft.ext.Ivf.search(index, centroids, queries, 10, nProbe = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  // --- dedup ---------------------------------------------------------------

  test("exactDedup keeps the smallest id per normalized content") {
    val docs = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other text"),
      (4L, "  HELLO WORLD  ")
    ).toDF("doc_id", "text")
    val got = Dedup.exactDedup(docs).select($"doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L))
  }

  test("nearDupText finds planted near-dup, skips unrelated, verifies with exact jaccard") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val unrelated = (100 to 140).map(i => s"zzz$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupText(docs, threshold = 0.7)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 > 0.8 && pairs.head._3 < 1.0)
  }

  test("connectedComponents labels chains, triangles and disjoint pairs correctly") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, disjoint pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a deep chain via pointer-jumping; cap overrun throws") {
    // A 64-link path has diameter 63: plain min-label propagation
    // would need 63 rounds (silently wrong at the old maxIters=20);
    // pointer-jumping needs ~log2 rounds.
    val chain = (1 until 64).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(chain, maxIters = 10).as[(Long, Long)].collect()
    assert(got.length == 64 && got.forall(_._2 == 1L))
    // Non-convergence must be an error, never partially-propagated labels.
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 2)
    }
  }

  test("nearDupText on sf0.001 equals the exact all-pairs jaccard answer") {
    val docs = Tables.documents(spark, sf)
    val viaLsh = Dedup.nearDupText(docs, threshold = 0.7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // exact all-pairs reference, built from the same shingle sets
    val sh = docs.select($"doc_id", Dedup.shingles($"text").as("sh"))
    val exact = sh.select($"doc_id".as("id_a"), $"sh".as("sa"))
      .crossJoin(sh.select($"doc_id".as("id_b"), $"sh".as("sb")))
      .filter($"id_a" < $"id_b")
      .withColumn("j", Dedup.jaccard($"sa", $"sb"))
      .filter($"j" >= 0.7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(viaLsh == exact, s"missed=${exact -- viaLsh} extra=${viaLsh -- exact}")
  }

  test("jaccardJoinExact and jaccardJoinPrefix equal all-pairs at thresholds LSH cannot prune") {
    val docs = Tables.documents(spark, sf)
    val sh = docs.select($"doc_id", Dedup.shingles($"text").as("sh"))
      .filter(size($"sh") > 0)
    for (t <- Seq(0.3, 0.5, 0.7)) {
      val exact = sh.select($"doc_id".as("id_a"), $"sh".as("sa"))
        .crossJoin(sh.select($"doc_id".as("id_b"), $"sh".as("sb")))
        .filter($"id_a" < $"id_b")
        .withColumn("j", Dedup.jaccard($"sa", $"sb"))
        .filter($"j" >= t)
        .select($"id_a", $"id_b", $"j").as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // both exact variants must EQUAL all-pairs at every threshold —
      // pair values included (integer-ratio jaccard is bit-portable)
      for ((name, join) <- Seq(
          "pairCount" -> Dedup.jaccardJoinExact(docs, threshold = t),
          "prefix" -> Dedup.jaccardJoinPrefix(docs, threshold = t))) {
        val got = join.select($"id_a", $"id_b", $"jaccard")
          .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
        assert(got.keySet == exact.keySet,
          s"$name t=$t missed=${exact.keySet -- got.keySet} extra=${got.keySet -- exact.keySet}")
        assert(got.forall { case (k, v) => v == exact(k) }, s"$name t=$t value drift")
      }
    }
  }

  test("FromPairCounts forms == inline forms over one shared unpruned pass (post-filter theorem)") {
    // The r8 sharing refactor rests on: the Jaccard size prune is a
    // necessary condition on (|A|, |B|) alone, so applying it as a
    // POST-filter on the unpruned pair frame yields the identical
    // answer to pruning inside the join — and containment is pure
    // per-row arithmetic over the same counts. Assert both against
    // the original single-purpose forms on real data.
    val docs = Tables.documents(spark, sf)
    val sh = Dedup.shingled(docs)
    val pairs = Dedup.pairCounts(sh)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    for (t <- Seq(0.3, 0.5, 0.7))
      assert(rows(Dedup.jaccardJoinExactFromPairCounts(pairs, t)) ==
        rows(Dedup.jaccardJoinExactFromShingles(sh, t)), s"jaccard post-filter t=$t")
    assert(rows(Dedup.containmentJoinFromPairCounts(pairs, 0.8)) ==
      rows(Dedup.containmentJoinFromShingles(sh, 0.8)), "containment from shared pass")
    graft.ops.Intermediates.sweep(spark)
  }

  test("containment join finds an embedded near-subset that Jaccard structurally misses") {
    // doc 1 is (a prefix slice of) doc 2, which is ~4x longer:
    // containment(1 -> 2) ~ 1 while J is capped near |A|/|B| ~ 0.25.
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // the embedded slice
      (2L, words),
      (3L, (100 to 140).map(i => s"v$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val sh = Dedup.shingled(docs)
    val contained = Dedup.containmentJoinFromShingles(sh, threshold = 0.9)
      .select($"contained_id", $"container_id").as[(Long, Long)].collect().toSet
    assert(contained == Set((1L, 2L)),
      s"expected exactly the embedded direction, got $contained")
    // the same pair is invisible to exact Jaccard at any useful threshold
    assert(Dedup.jaccardJoinExactFromShingles(sh, threshold = 0.5).count() == 0)
    graft.ops.Intermediates.sweep(spark)
  }

  test("PQ: codes are total and bounded; ADC+rerank recall@10 >= 0.8 on sf0.001") {
    import graft.ext.{Embeddings, Pq}
    val m = 16; val k = 16
    val norm = Tables.embeddings(spark, sf)
      .select($"vec_id", Embeddings.unitNorm($"embedding").as("embedding"))
    val books = Pq.train(norm, m = m, k = k, iters = 3)
    // every subspace kept a usable codebook (empty-cluster shrinkage
    // may drop codewords but never a whole subspace)
    val perSub = books.groupBy($"sub_id").count().as[(Int, Long)].collect().toMap
    assert(perSub.keySet == (0 until m).toSet && perSub.values.forall(c => c >= 2 && c <= k))

    val codes = Pq.encode(norm, books, m)
    assert(codes.count() == norm.count(), "every vector must be encoded")
    assert(codes.filter(size($"codes") =!= m).isEmpty, s"codes must have $m entries")

    val queries = norm.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(norm, queries, k = 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Pq.search(codes, books, norm, queries, k = 10, shortlist = 100)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      q -> ex.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / ex.size
    }
    // the q60 gate floor is 0.6; assert the stronger 0.8 here so the
    // driver gate keeps a 0.2 margin against codeword-boundary jitter
    assert(recalls.values.forall(_ >= 0.8),
      s"PQ recall@10 below 0.8: ${recalls.toSeq.sortBy(_._1)}")
  }

  test("semanticDedup: total, keeps component minima, never false-drops, recall >= 0.8") {
    val emb = Tables.embeddings(spark, sf)
    val centroids = ext.Ivf.train(emb, k = 16, iters = 3)
    val dedup = ext.Similarity.semanticDedup(emb, centroids, threshold = 0.4, nProbe = 4)
    assert(dedup.count() == emb.count(), "every vector must get a verdict")
    // each component keeps exactly its min id; singletons keep themselves
    val bad = dedup.groupBy($"component")
      .agg(min($"vec_id").as("mn"), sum(when($"kept", 1).otherwise(0)).as("nk"),
        min(when($"kept", $"vec_id")).as("keptId"))
      .filter($"nk" =!= 1 || $"keptId" =!= $"mn" || $"mn" =!= $"component")
    assert(bad.isEmpty, s"bad components: ${bad.collect().mkString(",")}")

    val ivfDropped = dedup.filter(!$"kept").select($"vec_id").as[Long].collect().toSet
    val exactDropped = Dedup.connectedComponents(
        ext.Similarity.nearDupPairs(emb, threshold = 0.4).select($"id_a", $"id_b"))
      .filter($"comp" =!= $"id").select($"id").as[Long].collect().toSet
    // theorem: IVF components refine exact components → no false drops
    assert((ivfDropped -- exactDropped).isEmpty,
      s"false drops: ${ivfDropped -- exactDropped}")
    val recall = ivfDropped.size.toDouble / exactDropped.size
    assert(recall >= 0.8, s"drop recall $recall (${ivfDropped.size}/${exactDropped.size})")
  }

  // --- text analysis -------------------------------------------------------

  test("token counts, ratios and quality score on a known string") {
    val df = Seq((1L, "The quick, brown fox! of speed")).toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.regexTokenCount($"text"),
      TextAnalysis.punctRatio($"text"),
      TextAnalysis.stopwordRatio($"text"),
      TextAnalysis.qualityScore($"text")).head()
    assert(r.getInt(0) == 6)        // the quick, brown fox! of speed
    assert(r.getInt(1) == 8)        // 6 words + ',' + '!'
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 0.2)
    assert(math.abs(r.getDouble(3) - 2.0 / 6.0) < 1e-12) // 'the', 'of'
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
  }

  test("withTextFeatures is bit-identical to the single-column scorers") {
    val docs = Tables.documents(spark, sf)
    val bundled = TextAnalysis.withTextFeatures(docs)
      .select($"doc_id", $"n_tokens", $"n_subtokens",
        $"punct_ratio", $"stopword_ratio", $"quality")
      .as[(Long, Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    val single = docs.select(
        $"doc_id",
        TextAnalysis.tokenCount($"text").cast("long"),
        TextAnalysis.regexTokenCount($"text").cast("long"),
        TextAnalysis.punctRatio($"text"),
        TextAnalysis.stopwordRatio($"text"),
        TextAnalysis.qualityScore($"text"))
      .as[(Long, Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    // exact equality on the doubles — the mean-token-len arithmetic
    // identity must not perturb a single bit
    assert(bundled.sameElements(single))
  }

  test("langId picks the language with most marker hits; en on ties/zero") {
    val df = Seq(
      (1L, "der hund und die katze ist da"),
      (2L, "le chat et la maison est grande"),
      (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.langId($"text")).as[(Long, String)].collect().toMap
    assert(got(1L) == "de" && got(2L) == "fr" && got(3L) == "en")

    // the materialized corpus form agrees with the one-expression form
    // on real documents (same argmax, different plan shape)
    val docs = Tables.documents(spark, sf).limit(200)
    val inline = docs.select($"doc_id", TextAnalysis.langId($"text").as("p"))
      .as[(Long, String)].collect().toMap
    val mat = TextAnalysis.withLangId(docs).select($"doc_id", $"pred_lang")
      .as[(Long, String)].collect().toMap
    assert(mat == inline)
  }

  test("topTermsTfIdf ranks rare terms first with deterministic ties; idf is smooth-log") {
    val df = Seq(
      // "apple" appears in 1 doc (rare), "common" in all 3 (df=3)
      (1L, "apple apple common zebra"),
      (2L, "common banana banana"),
      (3L, "common cherry")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.topTermsTfIdf(df, k = 2)
      .select($"doc_id", $"rank", $"term", $"tf", $"df", $"score_e6")
      .as[(Long, Long, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._6)).toList).toMap
    // doc 1: apple tf=2 df=1 → 2e6; zebra tf=1 df=1 → 1e6; common tf=1 df=3 → 333333
    assert(top(1L) == List(("apple", 2000000L), ("zebra", 1000000L)))
    // doc 2: banana tf=2 df=1 → 2e6; common 333333
    assert(top(2L) == List(("banana", 2000000L), ("common", 333333L)))
    // doc 3: cherry 1e6, common 333333
    assert(top(3L) == List(("cherry", 1000000L), ("common", 333333L)))

    // equal weights tie-break by term ascending
    val tie = TextAnalysis.topTermsTfIdf(Seq((9L, "bb aa")).toDF("doc_id", "text"), k = 2)
      .select($"rank", $"term").as[(Long, String)].collect().sortBy(_._1).toList
    assert(tie == List((1L, "aa"), (2L, "bb")))

    // the float idf helper: smooth log, positive even at df = n
    val v = df.sparkSession.range(1)
      .select(TextAnalysis.idf(lit(3), lit(3)).as("i")).as[Double].head()
    assert(math.abs(v - 1.0) < 1e-12) // ln((3+1)/(3+1)) + 1 = 1
  }

  test("contaminationReport counts shared grams; short and clean eval docs report 0") {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "completely unrelated corpus content here")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a sentence with the quick brown fox inside"), // shares grams
      (2L, "nothing in common at all with training data"), // clean
      (3L, "too short")                                    // < 3 tokens → no grams
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationReport(eval, corpus)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // eval doc 1 shares "the quick brown" and "quick brown fox" (2 distinct grams)
    assert(got(1L) == ((2L, true)))
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((0L, false)))
  }

  test("nearDupTextAgainst equals the cross-set slice of intra-corpus near-dup pairs") {
    val docs = Tables.documents(spark, sf)
    val newDocs = docs.filter($"doc_id" % 10 === 0)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val incremental = Dedup.nearDupTextAgainst(newDocs, corpus, threshold = 0.7)
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    // nearDupText emits (min, max) ordered pairs over the whole corpus;
    // the cross-set slice in either orientation must match exactly
    val all = Dedup.nearDupText(docs, threshold = 0.7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val expected = all.flatMap { case (a, b) =>
      (if (a % 10 == 0 && b % 10 != 0) Seq((a, b)) else Nil) ++
        (if (b % 10 == 0 && a % 10 != 0) Seq((b, a)) else Nil)
    }.toSet
    assert(incremental == expected,
      s"extra=${incremental -- expected} missing=${expected -- incremental}")
  }

  test("Curate: split is total/deterministic, samples are exact, chunks reassemble, redaction scrubs") {
    val docs = Tables.documents(spark, sf)
    // split: every row gets exactly one of train/val/test; assignment
    // is a pure function of doc_id (input order must not matter)
    val s1 = Curate.withSplit(docs).select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    val s2 = Curate.withSplit(docs.orderBy($"doc_id".desc)).select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    assert(s1 == s2 && s1.size == docs.count())
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
    val frac = s1.values.count(_ == "train").toDouble / s1.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac off the 0.8 target")

    // stratified sample: exactly n rows per stratum
    val perLang = Curate.stratifiedSample(docs, "lang", "doc_id", 5)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(perLang.nonEmpty && perLang.values.forall(_ == 5L), s"$perLang")

    // chunks reassemble to the original text; no empty chunks
    val chunks = Curate.chunk(docs, maxChars = 100)
    val rebuilt = chunks.groupBy($"doc_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct($"chunk_id", $"chunk"))),
        x => x.getField("chunk")), "").as("t"))
    assert(rebuilt.join(docs, Seq("doc_id")).filter($"t" =!= $"text").count() == 0)
    assert(chunks.filter(length($"chunk") === 0).count() == 0)

    // redaction scrubs every pattern; count sees both kinds
    val dirty = Seq((1L, "reach me at a.b-c@mail-x.io or 555-123-4567 ok")).toDF("doc_id", "text")
    val r = dirty.select(Curate.piiCount($"text"), Curate.redact($"text"))
      .as[(Long, String)].head()
    assert(r._1 == 2L && r._2 == "reach me at <EMAIL> or <PHONE> ok")
  }

  test("Curate: mixture subsamples only targeted keys; packing matches a sequential re-pack; repetition flags") {
    val docs = Tables.documents(spark, sf)
    // mixture: non-targeted keys untouched; targeted key roughly halved
    val mixed = Curate.mixture(docs, "lang", "doc_id", Seq("en" -> 50))
    val en = docs.filter($"lang" === "en").count()
    val enKept = mixed.filter($"lang" === "en").count()
    assert(enKept > en * 3 / 10 && enKept < en * 7 / 10, s"kept $enKept of $en en docs at 50%")
    assert(mixed.filter($"lang" =!= "en").count() == docs.filter($"lang" =!= "en").count())

    // packing: bin assignment equals a sequential driver-side re-pack
    val budget = 512
    val enToks = docs.filter($"lang" === "en")
      .withColumn("tokens", TextAnalysis.tokenCount($"text").cast("long"))
    val ordered = enToks.select($"doc_id", $"tokens").as[(Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    val expected = ordered.map { case (id, t) => val b = cum / budget; cum += t; id -> b }.toMap
    val got = Curate.packBins(enToks, "lang", "doc_id", "tokens", budget)
      .select($"doc_id", $"bin_id").as[(Long, Long)].collect().toMap
    assert(got == expected)

    // repetition rule: a looped text is >20% duplicate trigrams, varied text is not
    val rep = Seq(
      (1L, Seq.fill(30)("spam ham eggs").mkString(" ")),
      (2L, (1 to 90).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    val nTri = greatest(TextAnalysis.tokenCount($"text") - 2, lit(0)).cast("long")
    val flags = rep.select($"doc_id",
        ((nTri - size(Dedup.shingles($"text")).cast("long")) * 5 > nTri).as("f"))
      .as[(Long, Boolean)].collect().toMap
    assert(flags(1L) && !flags(2L))
  }

  test("simhash: near-dup texts land within small hamming distance, unrelated far") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i % 29 == 0) s"chg$i" else s"tok$i").mkString(" ")
    val unrelated = (200 to 260).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.simhash($"text").as("fp"))
    val fps = df.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(2L)) <= 12, s"near-dup hamming ${ham(fps(1L), fps(2L))}")
    assert(ham(fps(1L), fps(3L)) >= 16, s"unrelated hamming ${ham(fps(1L), fps(3L))}")

    // the corpus-scale aggregate form computes the identical fingerprint
    val docs2 = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val corpusFps = TextAnalysis.simhashCorpus(docs2).as[(Long, Long)].collect().toMap
    assert(corpusFps == fps)
  }

  test("winnowing fingerprints detect a local quote that global jaccard misses") {
    val quote = (1 to 20).map(i => s"quoted$i").mkString(" ")
    val docA = ((1 to 40).map(i => s"aaa$i").mkString(" ")) + " " + quote + " " +
      ((41 to 80).map(i => s"aaa$i").mkString(" "))
    val docB = ((1 to 40).map(i => s"bbb$i").mkString(" ")) + " " + quote + " " +
      ((41 to 80).map(i => s"bbb$i").mkString(" "))
    val df = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowCorpus(df)
      .as[(Long, Array[Long])].collect().toMap
    val shared = fps(1L).toSet & fps(2L).toSet
    assert(shared.nonEmpty, "20-token shared run must share a winnowing fingerprint")
    // while the documents' GLOBAL trigram jaccard is tiny
    val j = df.select(Dedup.shingles($"text").as("sh"))
      .as[Array[String]].collect()
    val jac = (j(0).toSet & j(1).toSet).size.toDouble / (j(0).toSet | j(1).toSet).size
    assert(jac < 0.2, s"global jaccard $jac should be small — that's the point")

    // excerpt-subset theorem on a synthetic doc (the q53 gate's core)
    val toks = (1 to 100).map(i => s"w$i")
    val src = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val exc = Seq((1L, toks.slice(10, 60).mkString(" "))).toDF("doc_id", "text")
    val fs = TextAnalysis.winnowCorpus(src).as[(Long, Array[Long])].head()._2.toSet
    val fe = TextAnalysis.winnowCorpus(exc).as[(Long, Array[Long])].head()._2.toSet
    assert(fe.nonEmpty && fe.subsetOf(fs))
  }

  test("simhashNearDup chunk join finds exactly the brute-force hamming pairs") {
    val docs = Tables.documents(spark, sf)
    val maxH = 3
    val got = TextAnalysis.simhashNearDup(docs, maxHamming = maxH)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val fps = TextAnalysis.simhashCorpus(docs).as[(Long, Long)].collect()
    val expected = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= maxH
    } yield (ia, ib)).toSet
    assert(got == expected, s"missed=${expected -- got} extra=${got -- expected}")
  }

  test("docFrequencyProfile: hand-computed df/hapax on a tiny corpus") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "delta delta")
    ).toDF("doc_id", "text")
    // df: alpha=2, beta=gamma=delta=1
    val got = TextAnalysis.docFrequencyProfile(docs)
      .select($"doc_id", $"n_distinct", $"sum_df", $"hapax_cnt", $"low_quality")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(1L) === ((2L, 3L, 1L, true)))   // {alpha(2), beta(1)}: 1·4 > 2
    assert(got(2L) === ((2L, 3L, 1L, true)))
    assert(got(3L) === ((1L, 1L, 1L, true)))   // dup tokens collapse to one distinct
  }

  test("unigramTvDrift: 0 on identical sides, 1 on disjoint sides") {
    val same = Seq((0L, "x y z"), (1L, "x y z")).toDF("doc_id", "text")
    val s = TextAnalysis.unigramTvDrift(same, side = $"doc_id" % 2 === 0)
      .select($"tv_num", $"tv_e9").as[(Long, Long)].head()
    assert(s === ((0L, 0L)))
    val disjoint = Seq((0L, "x x y"), (1L, "p q r s")).toDF("doc_id", "text")
    val d = TextAnalysis.unigramTvDrift(disjoint, side = $"doc_id" % 2 === 0)
      .select($"n_a", $"n_b", $"tv_num", $"tv_e9").as[(Long, Long, Long, Long)].head()
    // disjoint supports: Σ|aᵢ·N_b − bᵢ·Nₐ| = 2·Nₐ·N_b → TV = 1
    assert(d === ((3L, 4L, 24L, 1000000000L)))
  }

  test("dupSpans finds planted shared runs as maximal merged spans; separated runs stay separate") {
    // Docs 1 and 2 share a 6-token run (-> one span each, k=5 gives 2
    // overlapping gram hits that must merge); doc 3 shares nothing.
    // Doc 4 repeats the shared run at TWO separated offsets -> two spans.
    val shared = "one two three four five six"
    val docs = Seq(
      (1L, s"hello there $shared and more text here"),
      (2L, s"$shared entirely different tail content words"),
      (3L, "unrelated content with no overlap at all whatsoever"),
      (4L, s"$shared gap gap gap gap gap gap $shared")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpans(docs, k = 5)
      .select($"doc_id", $"span_start", $"span_end", $"span_len")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: shared run at tokens 3..8 (1-based)
    // doc 2: tokens 1..6
    // doc 4: tokens 1..6 and 13..18 — two islands, not one
    assert(got == Set(
      (1L, 3L, 8L, 6L),
      (2L, 1L, 6L, 6L),
      (4L, 1L, 6L, 6L),
      (4L, 13L, 18L, 6L)))
  }

  test("CMS estimates are exact-or-over for every token and the sketch is mergeable") {
    import graft.ext.Sketches
    val docs = Tables.documents(spark, sf)
    val toks = TextAnalysis.tokenStream(docs).select($"tok").localCheckpoint(eager = false)
    val counters = Sketches.cmsCounters(toks, "tok", depth = 4, width = 256)
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("exact_cnt"))
    val probed = Sketches.cmsEstimate(counters, exact, "tok", depth = 4, width = 256)
      .join(exact, Seq("tok"))
    // theorem: CMS never under-counts — for EVERY token in the corpus
    assert(probed.filter($"cms_est" < $"exact_cnt").count() == 0)
    // mergeability: sketch(all) == merge of per-half sketches
    val half1 = Sketches.cmsCounters(toks.filter(xxhash64($"tok") % 2 === 0), "tok", 4, 256)
    val half2 = Sketches.cmsCounters(toks.filter(xxhash64($"tok") % 2 =!= 0), "tok", 4, 256)
    val merged = half1.unionByName(half2)
      .groupBy($"j", $"bucket").agg(sum($"cnt").as("cnt"))
    val diff = counters.as("a").join(merged.as("b"), Seq("j", "bucket"), "full_outer")
      .filter(!(col("a.cnt") <=> col("b.cnt")))
    assert(diff.count() == 0)
  }

  test("BPE: hand-computed merges, greedy overlap, stop rule, encode roundtrip") {
    import graft.ext.Bpe
    // Sennrich's classic corpus. Adjacent-pair totals: (e,s)=9 and
    // (s,t)=9 tie — the (count desc, left, right) tiebreak picks
    // (e,s); after fusing, (es,t)=9 dominates.
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val merges = Bpe.train(wc, nMerges = 4)
    assert(merges.map(m => (m.left, m.right, m.pairCount)).take(2) ==
      Seq(("e", "s", 9L), ("es", "t", 9L)))
    // the distributed rounds equal the sequential algorithm exactly
    assert(merges == Bpe.sequentialReference(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 4))
    // tokensAfter strictly decreases: 16-token alphabet start shrinks
    val tokensInit = 3 * 5 + 5 * 2 + 6 * 6 + 6 * 3
    assert((tokensInit.toLong +: merges.map(_.tokensAfter))
      .sliding(2).forall(p => p(1) < p(0)))
    // greedy leftmost non-overlap: "aaa" under (a,a) -> [aa, a]
    val fold = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
      .select(Bpe.applyMerge($"syms", "a", "a").as("out"))
      .as[Seq[String]].head()
    assert(fold == Seq("aa", "a"))
    // stop rule: every pair unique -> no merge ever applies
    assert(Bpe.train(Seq(("ab", 1L), ("cd", 1L)).toDF("word", "cnt"), 3).isEmpty)
    // encode roundtrip on unseen words: concatenation is lossless
    val back = Seq("lowest", "wider", "x", "newnewest")
      .toDF("word")
      .select($"word", concat_ws("", Bpe.encodeCol($"word", merges)).as("rt"))
      .filter($"word" =!= $"rt").count()
    assert(back == 0)
  }

  test("bm25TopK: matches a sequential per-term reference; rare term dominates; k respected") {
    // corpus: 'rare' appears in exactly one doc, 'com' in all four
    val docs = Seq(
      (1L, "com com com com"),
      (2L, "com rare"),
      (3L, "com com alt alt"),
      (4L, "com alt")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, Seq("com", "rare"), topK = 3)
      .as[(Long, Long)].collect()
    // the identical formula in plain Scala doubles — same IEEE ops,
    // same order, so equality is exact, not approximate
    def contrib(tf: Long, df: Long, len: Long, nn: Long, total: Long): Long =
      math.floor(1000000.0 * ((((nn - df) + 0.5) / (df + 0.5)) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ((len * nn).toDouble / total)))))).toLong
    val (nn, total) = (4L, 12L)
    val expect = Map(
      1L -> contrib(4, 4, 4, nn, total),
      2L -> (contrib(1, 4, 2, nn, total) + contrib(1, 1, 2, nn, total)),
      3L -> contrib(2, 4, 4, nn, total),
      4L -> contrib(1, 4, 2, nn, total))
    assert(got.length == 3) // k respected
    assert(got.toMap == expect.toSeq.sortBy { case (id, s) => (-s, id) }.take(3).toMap)
    // the rare-term doc wins outright: its idf is (4-1+0.5)/(1+0.5)
    // vs the saturated common term's (4-4+0.5)/(4+0.5)
    assert(got.head._1 == 2L)
  }

  test("LogReg: closed-form first gradient, partition-independent trajectory, separates") {
    import graft.ext.LogReg
    // y = 1 iff the marker feature fires — linearly separable
    val rows = (1 to 40).map { i =>
      val y = i % 2L
      (y, 1L, if (y == 1) 5L else 0L, (i % 7).toLong)
    }
    val feat = rows.toDF("y", "x0", "x1", "x2")
    val t = LogReg.train(feat.repartition(7), Seq("x0", "x1", "x2"), "y",
      iters = 8, lrDiv = 100000L)
    // w = 0 ⇒ σ = 0.5 exactly ⇒ g_j = 500000·(Σ_{y=0}x_j − Σ_{y=1}x_j)
    def cf(sel: ((Long, Long, Long, Long)) => Long): Long =
      500000L * (rows.filter(_._1 == 0).map(sel).sum - rows.filter(_._1 == 1).map(sel).sum)
    assert(t.firstGradE6 == Seq(cf(_._2), cf(_._3), cf(_._4)))
    // the e6/e9 fixed point makes the trajectory independent of
    // partitioning AND bit-equal to the sequential replica
    val t1 = LogReg.train(feat.coalesce(1), Seq("x0", "x1", "x2"), "y",
      iters = 8, lrDiv = 100000L)
    val ref = LogReg.sequentialReference(
      rows.map { case (y, a, b, c) => (y, Seq(a, b, c)) }, nf = 3, iters = 8, lrDiv = 100000L)
    assert(t == t1 && t == ref)
    // after 8 rounds at this lr the learned margin separates the data
    val w = t.stepsE9.last.map(_ / 1e9)
    rows.foreach { case (y, a, b, c) =>
      val m = a * w(0) + b * w(1) + c * w(2)
      assert((m > 0) == (y == 1L), s"row ($y,$a,$b,$c) margin $m misclassified")
    }
  }

  test("Bloom filter: no false negatives ever, sane FP rate, mergeable by bit_or") {
    import graft.ext.Sketches
    val docs = Tables.documents(spark, sf)
    val toks = TextAnalysis.tokenStream(docs).select($"tok").distinct()
      .localCheckpoint(eager = false)
    val words = Sketches.bloomWords(toks, "tok", k = 4, mBits = 1 << 16)
    // theorem: an inserted item ALWAYS probes present
    val present = Sketches.bloomMightContain(words, toks, "tok", k = 4, mBits = 1 << 16)
    assert(present.filter(!$"might_contain").count() == 0)
    // never-inserted probes: the filter must not be saturated — the
    // FP rate at this load (k·n/m well under 1) is a fraction of a
    // percent; 10% is an astronomically safe ceiling
    val absent = spark.range(0, 1000)
      .select(concat(lit("__never_a_token_"), $"id").as("tok"))
    val fp = Sketches.bloomMightContain(words, absent, "tok", k = 4, mBits = 1 << 16)
      .filter($"might_contain").count()
    assert(fp < 100, s"Bloom FP rate implausibly high: $fp / 1000")
    // mergeability: bloom(all) == bit_or of per-half blooms
    val half1 = Sketches.bloomWords(toks.filter(xxhash64($"tok") % 2 === 0), "tok", 4, 1 << 16)
    val half2 = Sketches.bloomWords(toks.filter(xxhash64($"tok") % 2 =!= 0), "tok", 4, 1 << 16)
    val merged = half1.unionByName(half2)
      .groupBy($"word").agg(bit_or($"bits").as("bits"))
    val diff = words.as("a").join(merged.as("b"), Seq("word"), "full_outer")
      .filter(!(col("a.bits") <=> col("b.bits")))
    assert(diff.count() == 0)
  }

  test("ppsSystematicSample: picks sum to n, match a sequential reference, and favor weight") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"n_chars")
    val got = Curate.ppsSystematicSample(docs, "n_chars", n = 40)
      .select($"doc_id", $"n_picks").as[(Long, Long)].collect().toMap
    assert(got.values.sum == 40)  // telescoping: Σ n_picks = n exactly
    // sequential reference over the same (md5(id), id) order
    val ordered = docs.withColumn("__ord", md5($"doc_id".cast("string")))
      .orderBy($"__ord", $"doc_id")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    val total = ordered.map(_._2).sum
    var cum = 0L
    val expect = scala.collection.mutable.Map[Long, Long]()
    ordered.foreach { case (id, w) =>
      val prev = cum; cum += w
      val picks = (cum * 40) / total - (prev * 40) / total
      if (picks >= 1) expect(id) = picks
    }
    assert(got == expect.toMap)
  }

  test("ppsSystematicSample refuses non-positive weights loudly instead of " +
    "silently returning an empty or telescoped-wrong sample") {
    val zero = Seq((1L, 0L), (2L, 5L)).toDF("doc_id", "w")
    val e1 = intercept[IllegalArgumentException] {
      Curate.ppsSystematicSample(zero, "w", n = 2)
    }
    assert(e1.getMessage.contains("positive integers"))
    val neg = Seq((1L, -3L), (2L, 5L)).toDF("doc_id", "w")
    intercept[IllegalArgumentException] {
      Curate.ppsSystematicSample(neg, "w", n = 2)
    }
    val nul = Seq((1L, Some(4L)), (2L, None)).toDF("doc_id", "w")
    val e3 = intercept[IllegalArgumentException] {
      Curate.ppsSystematicSample(nul, "w", n = 2)
    }
    assert(e3.getMessage.contains("NULL"))
    // an EMPTY input is not a violation: per-stratum pipelines hit
    // empty cuts legitimately — empty in, empty sample out
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "w")
    val got = Curate.ppsSystematicSample(empty, "w", n = 5)
    assert(got.columns.toSeq == Seq("doc_id", "w", "n_picks") && got.count() == 0L)
  }

  test("stripHtml: blocks dropped whole, entity unescape order, adversarial fragments") {
    def strip(in: String): String =
      Seq(in).toDF("h").select(TextAnalysis.stripHtml(col("h"))).as[String].collect()(0)
    // &amp; must unescape LAST: &amp;lt; is the LITERAL text "&lt;"
    assert(strip("<p>a&amp;lt;b</p>") == "a&lt;b")
    // a script body containing '<' must not leak
    assert(strip("<script>if (a<b) {x}</script>hi") == "hi")
    // comments may contain tags; both go wholesale
    assert(strip("x<style>.a{}</style> <!-- <p>no</p> -->y") == "x y")
    assert(strip("<a href='z'>link</a>  text") == "link text")
    // all five predefined entities
    assert(strip("A&lt;B&gt;C&quot;D&#39;E&amp;F") == "A<B>C\"D'E&F")
    assert(strip("no tags") == "no tags")
    // raw-html profile counters: 8 tags, 2 anchors (case-insensitive)
    val h = "<html><a href=x>1</a><A >2</A><p>t</p></html>"
    assert(Seq(h).toDF("h").select(
      TextAnalysis.htmlTagCount(col("h")), TextAnalysis.htmlLinkCount(col("h")))
      .as[(Long, Long)].collect()(0) == ((8L, 2L)))
  }

  test("dedupSegments drops every post-first occurrence (cross-doc AND within-doc) " +
    "and reassembles survivors in order") {
    // 2-token segments. doc 1: [a b][c d]; doc 2: [c d][e f][c d] —
    // "c d" first occurs in doc 1 seg 1, so BOTH doc-2 copies drop;
    // doc 3 is entirely doc-1 boilerplate -> empty reassembly.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d e f c d"),
      (3L, "a b")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSegments(docs, segTokens = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "n_kept", "text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 3L, 1L, "e f"),
      (3L, 1L, 0L, "")))
  }

  test("kmeansQuantized follows the hand-computed integer Lloyd's trajectory, " +
    "with equal-distance ties to the lowest cluster id") {
    import graft.ext.Cluster
    // Five 2-d points; k=2, 1 iteration. Init: c1=(0,0), c2=(0,2e6)
    // (first two by id after e6 quantization). Assignment 1 sends
    // a,c,e -> 1 (e is EQUIDISTANT: 2.6e13 to both -> lowest id) and
    // b,d -> 2. Recompute: c1 = (5e6, floor(1e6/3)) = (5000000,
    // 333333) — the floor is the quantized-centroid signature —
    // c2 = (5e6, 2e6). Final assignment: {a,c,e} -> 1, {b,d} -> 2.
    val pts = Seq(
      (1L, Array(0f, 0f)),   // a
      (2L, Array(0f, 2f)),   // b
      (3L, Array(10f, 0f)),  // c
      (4L, Array(10f, 2f)),  // d
      (5L, Array(5f, 1f))    // e
    ).toDF("vec_id", "embedding")
    val got = Cluster.kmeansQuantized(pts, k = 2, iters = 1)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2, 5L -> 1))
    // iters = 0 is the pure init assignment (a,c,e with the tie rule)
    val zero = Cluster.kmeansQuantized(pts, k = 2, iters = 0)
      .as[(Long, Int)].collect().toMap
    assert(zero == Map(1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2, 5L -> 1))
  }

  test("Curate.domainCap: port stripped + subdomains folded, blocklist drops, kept " +
    "set is content-stable under corpus growth (eviction, never reshuffle)") {
    def urls(n: Int) = (1 to n).map { i =>
      val host = (i % 3) match {
        case 0 => "a.example.com"
        case 1 => "b.example.com:8443" // port must strip
        case 2 => "x.blocked.net"
      }
      (i.toLong, s"https://$host/p/$i")
    }.toDF("doc_id", "url")
    // registered-domain normalization: both subdomains fold to
    // example.com (port gone); the blocked domain vanishes outright
    val small = Curate.domainCap(urls(60), "url", maxPerDomain = 10,
      blockedDomains = Seq("blocked.net"), seed = "s")
    assert(small.select($"domain").distinct().as[String].collect().toSeq ==
      Seq("example.com"))
    val keptSmall = small.select($"doc_id").as[Long].collect().toSet
    assert(keptSmall.size == 10 && keptSmall.forall(i => i % 3 != 2))
    // growth: doubling the corpus may EVICT previously-kept docs but
    // never admits a previously-rejected one ahead of a kept one —
    // the kept set among the old ids is a subset of the old kept set
    val keptBig = Curate.domainCap(urls(120), "url", maxPerDomain = 10,
        blockedDomains = Seq("blocked.net"), seed = "s")
      .select($"doc_id").as[Long].collect().toSet
    assert(keptBig.size == 10)
    assert(keptBig.filter(_ <= 60).subsetOf(keptSmall))
    // an uncapped domain keeps everything
    val loose = Curate.domainCap(urls(60), "url", maxPerDomain = 1000,
      blockedDomains = Nil, seed = "s")
    assert(loose.count() == 60)
  }

  test("Eval: rocStats hand-case with a tie (Mann-Whitney half-credit); " +
    "prAtThresholds confusion counts at >= cutoffs") {
    import graft.ext.Eval
    // pairs: (2,1)✓ (2,2)tie (3,1)✓ (3,2)✓ -> concordant 3, ties 1
    val df = Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L)).toDF("s", "y")
    val r = Eval.rocStats(df, "s", "y")
      .select($"pos", $"neg", $"auc_num2", $"auc_den2")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((2L, 2L, 7L, 8L))) // AUC = 7/8
    val pr = Eval.prAtThresholds(df, "s", "y", Seq(2L, 3L))
      .orderBy($"threshold")
      .select($"threshold", $"tp", $"fp", $"fn", $"tn")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(pr == Seq((2L, 2L, 1L, 0L, 1L), (3L, 1L, 0L, 1L, 2L)))
    // a perfect ranker and a constant (all-tied) ranker bound the stat
    val perfect = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("s", "y")
    assert(Eval.rocStats(perfect, "s", "y").select($"auc_num2", $"auc_den2")
      .as[(Long, Long)].collect().head == ((8L, 8L)))
    val constant = Seq((5L, 0L), (5L, 1L), (5L, 0L), (5L, 1L)).toDF("s", "y")
    assert(Eval.rocStats(constant, "s", "y").select($"auc_num2", $"auc_den2")
      .as[(Long, Long)].collect().head == ((4L, 8L))) // AUC = 1/2
  }

  test("Curate.withEpochs: integer copies unconditional, fractional copy is a " +
    "deterministic md5 subset, x0 drops, epoch indices dense from 0") {
    val docs = (1L to 200L).map(i => (i, if (i <= 100) "hi" else "lo"))
      .toDF("doc_id", "k")
    val out = Curate.withEpochs(docs, "k", "doc_id",
      epochsPct = Seq("hi" -> 230, "lo" -> 0))
    // lo is dropped entirely; hi gets 2 full copies + ~30% a third
    val byEpoch = out.groupBy($"k", $"epoch").count()
      .as[(String, Int, Long)].collect()
      .map { case (k, e, n) => ((k, e), n) }.toMap
    assert(!byEpoch.keys.exists(_._1 == "lo"))
    assert(byEpoch(("hi", 0)) == 100L && byEpoch(("hi", 1)) == 100L)
    val frac = byEpoch.getOrElse(("hi", 2), 0L)
    assert(frac > 0L && frac < 100L) // the md5-chosen remainder subset
    // determinism + content-stability: same call, same rows; the
    // epoch-2 subset is exactly the docs whose salted bucket < 30
    val again = Curate.withEpochs(docs, "k", "doc_id",
      epochsPct = Seq("hi" -> 230, "lo" -> 0))
    assert(out.orderBy("doc_id", "epoch").collect().toSeq ==
      again.orderBy("doc_id", "epoch").collect().toSeq)
    val chosen = out.filter($"epoch" === 2).select($"doc_id").as[Long].collect().toSet
    val expected = docs.filter($"k" === "hi")
      .filter(Curate.hashBucketSalted($"doc_id", "#epoch", 100) < 30)
      .select($"doc_id").as[Long].collect().toSet
    assert(chosen == expected)
  }

  test("TextNormalize.nfc: composes decomposed sequences (codegen'd expression), " +
    "ASCII identity, null-safe") {
    import graft.functions.TextNormalize
    val df = Seq("café", "plain ascii", "Åbc", "mixéd ä")
      .toDF("s")
    val out = df.select(TextNormalize.nfc($"s").as("n")).as[String].collect().toSeq
    assert(out == Seq("café", "plain ascii", "Åbc", "mixéd ä"))
    // null in, null out (UnaryExpression null-safety)
    assert(df.select(TextNormalize.nfc(lit(null).cast("string"))).first().isNullAt(0))
    // the expression participates in whole-stage codegen (no
    // fallback) — over a codegen source (a local Seq collapses to a
    // LocalTableScan with no codegen stage regardless of expression)
    val ranged = spark.range(4)
      .select(TextNormalize.nfc(concat(lit("e"), lit("́"), $"id".cast("string"))))
    // "*(1)" is the whole-stage-codegen marker in the compact plan
    // string; a CodegenFallback expression would strip it
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(ranged.as[String].collect().forall(_.startsWith("é")))
  }

  test("Curate.canonicalUrl: fragments, default ports, tracking params and " +
    "trailing slashes normalize; real params and path case survive") {
    val cases = Seq(
      ("HTTP://Example.COM:80/A/b/", "http://example.com/A/b"),
      ("https://X.org:443/p?utm_source=a&id=7&utm_term=z#frag",
        "https://x.org/p?id=7"),
      ("https://x.org/p?futm=keepme", "https://x.org/p?futm=keepme"), // not utm_*
      ("https://x.org/p?utm_source=a", "https://x.org/p"),
      ("https://x.org/p?gclid=1&q=2", "https://x.org/p?q=2"),
      ("https://x.org:8443/p", "https://x.org:8443/p"), // non-default port stays
      ("http://x.org/", "http://x.org")
    ).toDF("url", "want")
    val got = cases.select(Curate.canonicalUrl($"url").as("got"), $"want")
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("GraphemeCount: combining sequences count as one user-perceived char; " +
    "ASCII equals codepoints; codegen'd") {
    import graft.functions.GraphemeCountFns.graphemeCount
    val df = Seq("plain", "éä", "x́̈", "").toDF("s")
    val got = df.select(length($"s").cast("long"), graphemeCount($"s"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((5L, 5L), (4L, 2L), (3L, 1L), (0L, 0L)))
    val ranged = spark.range(3).select(graphemeCount(concat(lit("é"), $"id".cast("string"))))
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(ranged.as[Long].collect().toSeq == Seq(2L, 2L, 2L))
  }

  test("Stats.exactQuantilesPermille: discrete lower-quantile hand-cases incl. " +
    "heavy duplicates and the exact-boundary rank") {
    import graft.ext.Stats
    def q(df: org.apache.spark.sql.DataFrame, ps: Int*) =
      Stats.exactQuantilesPermille(df, "v", ps).orderBy($"permille")
        .as[(Long, Long)].collect().toSeq
    val uniform = (1L to 10L).toDF("v")
    assert(q(uniform, 100, 500, 1000) == Seq((100L, 1L), (500L, 5L), (1000L, 10L)))
    // duplicates: [1,1,1,9] — p750 lands EXACTLY on cum=3 (3·1000 =
    // 750·4), so the boundary stays at 1; p751 crosses to 9
    val dup = Seq(1L, 1L, 1L, 9L).toDF("v")
    assert(q(dup, 500, 750, 751, 1000) ==
      Seq((500L, 1L), (750L, 1L), (751L, 9L), (1000L, 9L)))
  }

  test("Similarity.quantizeInt8: symmetric scale, away-from-zero rounding, zero " +
    "vector safe; int8TopK ranks by exact integer dots") {
    import graft.ext.Similarity
    val emb = Seq(
      (1L, Array(2.0f, -4.0f, 1.0f)),  // scale 4: q = [64, -127, 32]
      (2L, Array(0.0f, 0.0f, 0.0f)),   // zero vector: q = [0,0,0]
      (3L, Array(-1.0f, 2.0f, -0.5f))  // scale 2: q = [-64, 127, -32]
    ).toDF("vec_id", "embedding")
    val qz = Similarity.quantizeInt8(emb).orderBy($"vec_id")
      .select($"vec_id", $"scale", $"q").as[(Long, Double, Seq[Int])].collect().toSeq
    assert(qz == Seq((1L, 4.0, Seq(64, -127, 32)), (2L, 0.0, Seq(0, 0, 0)),
      (3L, 2.0, Seq(-64, 127, -32))))
    // 2.0/4*127 = 63.5 rounds AWAY FROM ZERO to 64 (and -63.5 to -64)
    // int8TopK: v3 = -v1/2 direction-ish; nearest to q1 among {2,3}
    // is ranked by the exact integer dot / norms — v3 anti-correlates
    // (sim < 0), zero vector sorts last with the -2 sentinel
    val top = Similarity.int8TopK(emb, emb.filter($"vec_id" === 1L), k = 2)
      .orderBy($"rank").select($"neighbor_id", $"rank").as[(Long, Int)].collect().toSeq
    assert(top == Seq((3L, 1), (2L, 2)))
  }
}
