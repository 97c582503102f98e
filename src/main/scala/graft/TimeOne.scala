package graft

/** Single-query timing main — the development loop between full Bench
  * runs. Same measurement discipline as [[Bench]] in miniature: one
  * untimed warmup pass, then N timed passes of a `noop`-format write
  * (full materialization), median reported, Intermediates swept
  * between passes.
  *
  *   sbt "runMain graft.TimeOne /root/testdata/sf0.1 q106_manifest_etl [iters]"
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeOne <sfDir> <query> [iters]")
    val (dir, name) = (args(0), args(1))
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-timeone")
    def pass(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.ops.Intermediates.sweep(spark)
      sec
    }
    pass() // warmup
    val ts = (1 to iters).map { i =>
      val s = pass(); println(f"[timeone] pass=$i $name $s%.3fs"); s
    }.sorted
    println(f"[timeone] $name median=${ts(ts.length / 2)}%.3fs min=${ts.head}%.3fs")
    spark.stop()
  }
}
