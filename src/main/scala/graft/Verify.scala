package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd+ args: run only the named queries (local debugging;
    // the driver always passes exactly two args → full surface)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(cpus, "graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir) // gates build/write their internal
        // tables HERE, under the session default (INT64 micros — the
        // stats-capable layout the skipping gates rely on)
        // The RESULT dump is the one write the driver's comparator
        // reads back with naive-timestamp tooling (pandas/DuckDB):
        // INT64-micros timestamps are tagged isAdjustedToUTC=true and
        // surface tz-AWARE there, hash-mismatching every oracle's
        // naive timestamp. Dump results as INT96 (naive, what rounds
        // 1-13 shipped); internal tables keep micros.
        spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
        try df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        finally spark.conf.set("spark.sql.parquet.outputTimestampType",
          "TIMESTAMP_MICROS")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Free this query's materialize-once intermediates — the same
      // 78-query-session storage hygiene as Bench (round-6 verdict #1).
      graft.ops.Intermediates.sweep(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
