package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards — the 100 TB posture invariants the
  * perf work established, asserted so they can't silently regress:
  * no cartesian products anywhere, predicate pushdown reaching the
  * parquet scans, column pruning keeping wide columns out of scans
  * that don't need them. Every query's plan is also BUILT here, which
  * doubles as a construction smoke test for the whole surface. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no query in the surface plans a CartesianProduct") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$p")
    }
  }

  test("intentionally quadratic check plans run as BroadcastNestedLoopJoin (q30, q35)") {
    // q30/q35 deliberately contain an all-pairs comparison — it is the
    // THEOREM being checked (banded join == brute force), not the
    // operator's scale path. The no-CartesianProduct guard above only
    // holds for them because the quadratic side is broadcast-bounded;
    // assert that strategy explicitly so a size/threshold change that
    // silently degrades it to a cartesian (or sort-merge) fails here
    // with intent attached rather than in the generic sweep.
    Seq("q30_simhash_neardup", "q35_embed_neardup").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"$name's quadratic check side is no longer broadcast-bounded:\n$p")
    }
    // q60's ADC scan is corpus × (10 broadcast query maps) by design —
    // the compressed-scan shape, not an accident; same intent pin.
    assert(plan("q60_pq_recall").contains("BroadcastNestedLoopJoin"),
      "q60's ADC crossJoin is no longer broadcast-bounded")
    // q82's edit-distance probe has NO equi key (length-band + banded
    // DP are both inequalities) — broadcast-bounded by the probe-batch
    // contract, like q60's ADC scan.
    assert(plan("q82_edit_distance").contains("BroadcastNestedLoopJoin"),
      "q82's probe join is no longer broadcast-bounded")
  }

  test("q88's SCD2 temporal join stays a hash join (equi key + residual interval)") {
    // The operator's contract: the dimension KEY is an equi condition,
    // so the interval test rides as a residual filter on a hash join —
    // if this ever degrades to a BNLJ the temporal join went
    // |facts| × |versions|.
    val p = plan("q88_scd2")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q88's SCD2 join fell back to a nested loop:\n$p")
    assert(p.contains("HashJoin"), s"expected a hash join in q88:\n$p")
  }

  test("q78's range join is an equi hash join, never a nested loop") {
    // The whole point of the bucketed interval-join decomposition is
    // that a pure range predicate becomes an EQUI join on the day
    // bucket — if this plan ever contains a BNLJ the operator has
    // regressed to |points| × |intervals|.
    val p = plan("q78_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q78's range join fell back to a nested loop:\n$p")
    assert(p.contains("HashJoin"), s"expected a hash equi-join in q78:\n$p")
  }

  test("time-series family plans no moving-lower/UNBOUNDED-FOLLOWING window frame (q65-q69)") {
    // The O(rows²) window shape: an upper bound of UNBOUNDED FOLLOWING
    // with a MOVING lower bound — Spark's UnboundedFollowingWindow-
    // FunctionFrame re-scans the remainder of the partition per row.
    // (UNBOUNDED PRECEDING, UNBOUNDED FOLLOWING) is exempt: whole-
    // partition frames are computed once. q65's first cut shipped the
    // bad shape at 47 s and was fixed by reversing the sort into a
    // growing frame (TimeSeries.scala:62-73); this pins that lesson
    // for the whole family, like the q24 RegExpReplace cap.
    val frame = """specifiedwindowframe\(\w+Frame, ([^,]*), unboundedfollowing\$\(\)\)""".r
    Seq("q65_gap_fill", "q66_rolling_avg", "q67_vwap", "q68_drawdown",
        "q69_anomaly").foreach { name =>
      val p = plan(name)
      frame.findAllMatchIn(p).foreach { m =>
        assert(m.group(1) == "unboundedpreceding$()",
          s"$name plans the O(rows²) window frame shape: ${m.matched}\n$p")
      }
    }
  }

  test("q70's watchlist self-join broadcasts (quadratic in the watchlist, never the corpus)") {
    // pairwiseCorr's runtime guard refuses a corpus-sized entity set;
    // this pins the plan half of the contract — the hour-keyed
    // self-join must stay a broadcast hash join, not degrade to a
    // shuffled sort-merge of the full series against itself.
    val p = plan("q70_corr")
    assert(p.contains("BroadcastHashJoin"),
      s"q70's self-join is no longer broadcast:\n$p")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffled join") {
    // The bloom-pruned join at 100 TB: a selective dim filter builds a
    // bloom filter that is pushed into the fact-side scan, so rows
    // that cannot join never enter the exchange. Spark's
    // InjectRuntimeFilter does this when enabled — the capability is
    // configuration + plan shape, not custom code; this test pins the
    // recipe (thresholds included, since the defaults assume TB-scale
    // scans) and that our session/plan shapes are eligible.
    import org.apache.spark.sql.functions.col
    val restore = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join regime
      val li = Tables.lineitem(spark, sf)
      val part = Tables.part(spark, sf).filter(col("p_size") <= 2)
      val joined = li.join(part, col("l_partkey") === col("p_partkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg") || p.contains("might_contain"),
        s"no runtime bloom filter injected:\n$p")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("equality predicates reach the parquet scan (q40 pushdown)") {
    val p = plan("q40_semi")
    assert(p.contains("EqualTo(event_type,purchase)"), s"filter not pushed:\n$p")
  }

  test("column pruning keeps text out of scans that don't read it (q38)") {
    val p = plan("q38_chars_hist")
    assert(p.contains("ReadSchema: struct<lang:string,n_chars:bigint>"),
      s"scan reads more than (lang, n_chars):\n$p")
    assert(!p.contains("text:string"), s"text column not pruned:\n$p")
  }

  test("q24 normalizes once per row: ≤2 RegExpReplace nodes in the plan") {
    // The whole class of "Column trees recompute shared subtrees" bugs
    // (round-3 verdict #2): q24 needs exactly one normalization
    // regexp_replace plus one punct-strip regexp_replace; any scorer
    // that re-derives normalized(text) adds more.
    import org.apache.spark.sql.catalyst.expressions.RegExpReplace
    val df = SparkEntry.queries("q24_quality")(spark, sf)
    val n = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect { case r: RegExpReplace => r }.size).sum
    }.sum
    assert(n <= 2, s"q24 plans $n RegExpReplace nodes — the normalize subtree is recomputed")
  }

  test("q25 tokenizes and scores once per row: ≤1 RegExpReplace, ≤5 ArrayFilter") {
    // Round-4 verdict #2: the inline langId(col) form referenced the
    // toks subtree once per language and each score in ~8 argmax
    // arms, recomputing the normalize/split tree ~25-40× per row.
    // withLangId materializes toks + the 5 scores as named columns:
    // exactly one tokenize and one marker-filter per language survive
    // optimization, however many comparison arms read them.
    import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, RegExpReplace}
    val plan = SparkEntry.queries("q25_langid")(spark, sf).queryExecution.optimizedPlan
    val nRe = plan.collect { case p =>
      p.expressions.map(_.collect { case r: RegExpReplace => r }.size).sum
    }.sum
    val nFilt = plan.collect { case p =>
      p.expressions.map(_.collect { case f: ArrayFilter => f }.size).sum
    }.sum
    assert(nRe <= 1, s"q25 plans $nRe RegExpReplace nodes — the tokenizer is recomputed")
    assert(nFilt <= graft.ext.TextAnalysis.LangMarkers.size,
      s"q25 plans $nFilt ArrayFilter nodes — per-language scores are recomputed")
  }

  test("q52 tokenizes once per row: ≤1 RegExpReplace node in the plan") {
    import org.apache.spark.sql.catalyst.expressions.RegExpReplace
    val df = SparkEntry.queries("q52_repetition")(spark, sf)
    val n = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect { case r: RegExpReplace => r }.size).sum
    }.sum
    assert(n <= 1, s"q52 plans $n RegExpReplace nodes — the tokenizer is recomputed")
  }

  test("curation row-ops are map-only (no Exchange); stratified sample uses WindowGroupLimit") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    // the scaladoc's zero-shuffle claim, asserted
    Seq(
      "withSplit" -> graft.ext.Curate.withSplit(docs),
      "chunk" -> graft.ext.Curate.chunk(docs, 500),
      "redact" -> docs.select(graft.ext.Curate.redact(col("text")))
    ).foreach { case (name, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
    }
    val samp = graft.ext.Curate.stratifiedSample(docs, "lang", "doc_id", 5)
    val sp = samp.queryExecution.executedPlan.toString
    assert(sp.contains("WindowGroupLimit"), s"per-stratum top-k not pruned map-side:\n$sp")
  }

  test("dimension joins broadcast; recall reports don't sort-merge (q16, q31)") {
    Seq("q16_lsh_recall", "q31_overview").foreach { name =>
      val p = plan(name)
      assert(!p.contains("SortMergeJoin"), s"$name sort-merges:\n$p")
    }
  }

  test("q59 and q96 split ONE gram pair-count pass (shared-pass invariant)") {
    // Round-8 refactor: both queries consume the same S8-cached
    // unpruned pair frame (q59 re-applies its size prune as a
    // post-filter), so the Σ df² gram self-join runs once per
    // session. Guard both halves of the invariant:
    //   1. per-plan: each query's formatted plan DEFINES at most the
    //      expected number of Generate (explode) nodes — one shared
    //      gram explode for q96; q59 adds only the prefix-gate's own
    //      (a second pipeline by design). The formatted mode lists
    //      each physical node once, so counting definition lines
    //      counts nodes, not the repeated references inline mode
    //      prints per join side.
    //   2. cross-plan: the two optimized plans reference the SAME
    //      cache entry (CachedRDDBuilder identity) — a regression
    //      that rebuilds the pair frame per query would cache two.
    // Fresh session: ResultCache keys embed the session, so this test
    // can't be satisfied by residue from other suites (they share the
    // outer session).
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val s = spark.newSession()
    val q59 = SparkEntry.queries("q59_jaccard_join")(s, sf)
    val q96 = SparkEntry.queries("q96_containment")(s, sf)
    def generateDefs(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        .linesIterator.count(_.matches("""\(\d+\) Generate.*"""))
    assert(generateDefs(q96) == 1,
      s"q96 should explode the gram frame exactly once, got ${generateDefs(q96)}")
    assert(generateDefs(q59) <= 2,
      s"q59 should add at most the prefix-gate explode, got ${generateDefs(q59)}")
    // Recursive: q59 wraps its exact rows in their own cached frame,
    // so the pair-frame relation sits INSIDE that entry's cached
    // physical plan — descend through InMemoryTableScans.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def descend(p: org.apache.spark.sql.execution.SparkPlan): Seq[AnyRef] = {
      // AdaptiveSparkPlanExec is a LEAF wrapper — collect stops at it,
      // so unwrap to its input plan by hand.
      val unwrapped = p.collect { case a: AdaptiveSparkPlanExec => a.inputPlan }
      (p +: unwrapped).flatMap(_.collect { case s: InMemoryTableScanExec => s.relation })
        .flatMap(r => r.cacheBuilder +: descend(r.cacheBuilder.cachedPlan))
    }
    def builders(df: org.apache.spark.sql.DataFrame): Seq[AnyRef] =
      df.queryExecution.optimizedPlan.collect { case m: InMemoryRelation => m }
        .flatMap(m => m.cacheBuilder +: descend(m.cacheBuilder.cachedPlan))
    assert(builders(q59).exists(a => builders(q96).exists(b => a eq b)),
      "q59 and q96 no longer share the cached pair-count frame")
  }

  test("q100's packed-word Bloom filter broadcasts; the probe side never sort-merges on it") {
    // The filter frame is ≤ m/32 rows by construction — at 100 TB it
    // is the ONLY part of the corpus-derived state small enough to
    // ship to every task, and shuffling the probe grams against it
    // instead would reintroduce exactly the exchange the sketch
    // exists to avoid.
    val p = plan("q100_bloom_decontam")
    assert(p.contains("BroadcastHashJoin"),
      s"q100's bloom probe join is no longer broadcast:\n$p")
    // attribution: q100's full plan also carries the exact semi-join,
    // which can broadcast on its own and mask a probe-side
    // regression — so pin the operator's OWN plan too: its single
    // join must be the broadcast, with no sort-merge anywhere
    import org.apache.spark.sql.functions.col
    val probe = spark.range(0, 100).select(col("id").cast("string").as("g"))
    val op = graft.ext.Sketches.bloomMightContain(
      graft.ext.Sketches.bloomWords(probe, "g"), probe, "g")
      .queryExecution.executedPlan.toString
    assert(op.contains("BroadcastHashJoin") && !op.contains("SortMergeJoin"),
      s"bloomMightContain's own join regressed from broadcast:\n$op")
  }

  test("q103's posting fetch broadcasts the query-term stats; top-k never global-sorts") {
    // The inverted-index contract at 100 TB: the per-term frame that
    // joins the corpus-sized tf stream is query ⋈ df — a handful of
    // rows — and MUST broadcast; k rows leave via TakeOrderedAndProject
    // (a per-partition heap + driver merge), never a full Sort of the
    // scored docs.
    val p = plan("q103_bm25_search")
    assert(p.contains("BroadcastHashJoin"),
      s"q103's posting fetch no longer broadcasts:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"q103's top-k no longer plans as TakeOrderedAndProject:\n$p")
  }

  test("q113's trigram model broadcasts; the corpus never sort-merge-joins") {
    // The LM-coverage contract at 100 TB: the top-4096 trigram model
    // is the ONLY thing that crosses executors for the coverage join —
    // the corpus-sized trigram stream must join it as a broadcast
    // build side, never re-shuffle into a SortMergeJoin.
    // Scoped to the MODEL join: the guarded invariant is that the
    // corpus-sized trigram stream joins the top-4096 model as a
    // BROADCAST build side. The final docs⋈cov doc_id join broadcasts
    // today (cov is tiny at the spec's scale factor) but is ALLOWED
    // to shuffle at scale — cov is doc-cardinality — so this test
    // deliberately does not ban SortMergeJoin plan-wide.
    val p = plan("q113_trigram_coverage")
    assert(p.contains("BroadcastHashJoin"),
      s"q113's model join no longer broadcasts:\n$p")
  }

  test("q119's LM model joins broadcast; the corpus trigram stream never sort-merges") {
    // Same contract as q113 at 100 TB: the model (≤ alphabet³ distinct
    // trigrams — bounded at any corpus size) and its marginal tables
    // are the only broadcast payloads; the corpus-sized trigram
    // stream must probe them as broadcast build sides. The final
    // docs⋈score doc_id join is doc-cardinality and MAY shuffle at
    // scale, so SortMergeJoin is not banned plan-wide — but the model
    // join path must show broadcast joins.
    val p = plan("q119_lm_score")
    assert(p.contains("BroadcastHashJoin"),
      s"q119's model join no longer broadcasts:\n$p")
  }

  test("k-means assignment is a pure projection: no join, no exchange in the plan") {
    // The operator's 100 TB contract: the centroid matrix rides into
    // the plan as a LITERAL, so assigning a corpus to clusters scans
    // it once with zero data movement — the expensive alternative
    // (crossJoin + min_by) would shuffle every vector per iteration.
    val spark = SparkTestSession.spark
    import spark.implicits._
    val pts = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 1f)), (3L, Array(2f, 0f)))
      .toDF("vec_id", "embedding")
    val p = graft.ext.Cluster.kmeansQuantized(pts, k = 2, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"k-means assignment is no longer a shuffle-free projection:\n$p")
  }
}
