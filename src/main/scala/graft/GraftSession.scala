package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftExtensions

/** Single place every main/test builds its SparkSession from, so the
  * graft extension functions (e.g. `graft_cosine`) are always
  * registered and session-wide configs are consistent.
  *
  *   - `spark.sql.shuffle.partitions` = cores (local mode; a real
  *     cluster would size this to data volume — see SURVEY.md §7).
  *   - UTC session timezone (reference semantics, SURVEY.md §7.6).
  *   - `nanosAsLong`: `events.ts` is parquet TIMESTAMP(NANOS), which
  *     Spark has no native type for (SPARK-40819) — read as long and
  *     truncated in `Tables.events`. Set here, not inside a reader.
  */
object GraftSession {

  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write timestamps as INT64 micros, not legacy INT96: INT96
      // carries NO footer min/max stats (deprecated in parquet), so
      // every time-range zone map — the single most useful skipping
      // dimension at 100 TB — would be unrecordable; micros is also
      // what Delta/Iceberg/Trino interop expects. Readers handle both
      // layouts, so pre-existing INT96 dirs keep reading fine.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  /** Standard main-entry session (Verify/Bench/EntrySmoke). */
  def create(cpus: String, appName: String): SparkSession = {
    val spark = builder(cpus).appName(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
