package graft

import org.apache.spark.sql.SparkSession

/** Smoke runner for the driver's flagship gate: builds a session the
  * way the driver does, runs SparkEntry.entry, prints the row count. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.create(cpus, "graft-entry-smoke")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"ENTRY_ROWS=${rows.length}")
    df.show(20, truncate = false)
    spark.stop()
  }
}
