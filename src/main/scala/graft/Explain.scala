package graft

/** Plan-inspection main: prints `explain("formatted")` for the named
  * queries (all of them by default) over a testdata dir. Used to
  * review scan pruning (`PushedFilters`/`ReadSchema`), join strategy
  * (broadcast vs shuffle), and whole-stage-codegen coverage — the
  * 100 TB posture checks.
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.001 q2_latest_per_key q11_revenue"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
