package graft

/** Driver benchmark main: one JSON line with per-query medians.
  *
  * Measurement discipline (round-1 verdict finding #6, round-7 #1):
  *   - a full warmup pass first, so no query pays session/codegen/JIT
  *     warmup (round 1 charged ~8 s of warmup to whichever query ran
  *     first);
  *   - the timed action is a `noop`-format write — materializes every
  *     result row through the full plan (a bare `count()` lets
  *     EliminateSorts drop ORDER BYs and lets limits short-circuit);
  *   - `SPARK_GRAFT_BENCH_ITERS` (default 3) full INTERLEAVED passes
  *     over the whole suite, median per query taken ACROSS passes.
  *     Round 7's driver artifact showed nine rows inflated up to 36×
  *     by transient host load; with back-to-back iterations a stall
  *     lasting a few seconds poisons every iteration of one query.
  *     Interleaving separates a query's samples by a full suite pass
  *     (~25 s), so a transient can poison at most one sample and the
  *     median sheds it.
  *
  * Storage discipline (round-6 verdict finding #1): every evaluation
  * ends with an `Intermediates.sweep`, so materialize-once
  * intermediates never accumulate across the ~100-query × 4-pass
  * session (the driver-only q56/q66 blowups were storage-pool
  * eviction pressure from hundreds of orphaned checkpoint blocks),
  * and each row logs a storage line (live cached RDD count +
  * mem/disk bytes) so eviction pressure is visible in the driver
  * tail.
  *
  * Output contract: the FULL JSON line first (medians + mins +
  * per-pass raw times per query; also persisted to `BENCH_FULL.json`
  * in the working directory), then ten `[bench-diag]` lines — the 10
  * slowest queries with their per-pass times and per-pass storage
  * lines, so the surviving tail is self-diagnosing: an inflated
  * median shows its own spread (one bad pass among flat ones = host
  * noise; all passes slow = a real plan cost) — then a compact
  * summary as the LAST stdout line carrying the COMPLETE per-query
  * `[median,min]` map in centiseconds under qNN short keys (~1.8 KB,
  * sized to survive a 2 KB stdout-tail capture window). The sbt
  * `outputStrategy := StdoutOutput` setting in build.sbt keeps these
  * lines unprefixed — with the default LoggedOutput strategy every
  * line gained an "[info] " prefix and no stdout line started with
  * '{', which is why rounds 1-8 all produced `parsed: null` bench
  * artifacts.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = GraftSession.create(cpus, "graft-bench")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val sec = try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          // A failing query must scream, not silently vanish from the
          // total (round-2 verdict #5).
          System.err.println(s"[bench] $name FAILED: $e")
          -1.0
      }
      // Outside the timed region: free this evaluation's
      // materialize-once intermediates before the next one runs.
      graft.ops.Intermediates.sweep(spark)
      sec
    }

    def storageLine(): String = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum >> 20
      val disk = infos.map(_.diskSize).sum >> 20
      s"cached_rdds=${infos.length} mem_mb=$mem disk_mb=$disk"
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce) // warmup pass (untimed)

    // iters full interleaved passes: pass p runs EVERY query once, so
    // consecutive samples of the same query are a whole suite apart.
    val samples = scala.collection.mutable.Map.empty[String, Vector[(Double, String)]]
      .withDefaultValue(Vector.empty)
    for (p <- 1 to iters; name <- names) {
      val t = runOnce(name)
      val sl = storageLine()
      samples(name) = samples(name) :+ (t, sl)
      println(f"[bench] pass=$p $name $t%.3fs $sl")
    }

    // Per query: median across passes (the headline statistic) and the
    // per-pass MIN (the noise-exonerating statistic — a min near the
    // quiet-local time proves an inflated median was transient host
    // load; a uniformly-elevated min is a real cost). Round-8 verdict
    // asked for the min alongside the median in the artifact.
    val results = names.map { name =>
      val ok = samples(name).map(_._1).filter(_ >= 0).sorted
      val med = if (ok.isEmpty) -1.0 else ok(ok.length / 2)
      val min = if (ok.isEmpty) -1.0 else ok.head
      (name, med, min)
    }

    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, _, m) => "\"" + k + "\":" + fmt(m) }
      .mkString("{", ",", "}")
    val rawJson = names.map { name =>
      "\"" + name + "\":[" + samples(name).map(s => fmt(s._1)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val fullLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"mins":$mins,"raw_passes":$rawJson,"sf":"$sfDir"}"""
    println(fullLine)
    // Belt and braces against stdout-capture truncation: persist the
    // same full result next to the build so it is readable from the
    // working tree even when only a bounded tail of stdout survives.
    try {
      val p = java.nio.file.Paths.get("BENCH_FULL.json")
      java.nio.file.Files.write(p, (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Exception => System.err.println(s"[bench] BENCH_FULL.json write failed: $e") }

    // Diagnostic tail: the 10 slowest medians, each with its per-pass
    // spread and the storage line observed after each pass — enough to
    // adjudicate host noise vs plan cost from the tail alone.
    results.sortBy(-_._2).take(10).foreach { case (name, med, _) =>
      val passes = samples(name).map(s => fmt(s._1)).mkString("[", ",", "]")
      val storage = samples(name).map(_._2).distinct.mkString(" | ")
      println(s"[bench-diag] $name median=${fmt(med)}s passes=$passes storage: $storage")
    }

    // Compact summary LAST so tail capture always keeps a parseable
    // totals line even when the full line above is truncated. It now
    // carries the COMPLETE per-query map (round-8 verdict #1): keys are
    // shortened to the unique qNN prefix and values are
    // [median,min] in CENTISECONDS, which fits all ~105 entries in
    // ~1.8 KB — inside a 2 KB stdout-tail window.
    def cs(v: Double): String = if (v < 0) "-1" else Math.round(v * 100).toString
    val allCs = results.map { case (k, med, min) =>
      "\"" + k.takeWhile(_ != '_') + "\":[" + cs(med) + "," + cs(min) + "]"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"median_min_cs":$allCs,"sf":"$sfDir","note":"[median,min] centiseconds over $iters interleaved passes; full-name map+mins+raw on first JSON line and in BENCH_FULL.json"}""")
    spark.stop()
  }
}
