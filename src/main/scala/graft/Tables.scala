package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * One parquet file per table under `dir`. Reads are plain
  * `spark.read.parquet` so Catalyst's column pruning and predicate
  * pushdown reach the scan (verified via `.explain`: `ReadSchema` /
  * `PushedFilters`). At 100 TB these would be partitioned datasets;
  * nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** `events.ts` has shipped in two physical parquet layouts across
    * testdata generations, so the reader adapts to the scanned dtype:
    *
    *   - TIMESTAMP(NANOS): Spark has no native type (SPARK-40819) and
    *     surfaces it as epoch-nanos `long` (via the `nanosAsLong` conf
    *     set in `GraftSession.builder`). Truncate ns→µs with integer
    *     `div` — double division loses precision above 2^53 and 2024
    *     epoch-nanos is ~1.7e18. DuckDB (the oracle) truncates the
    *     same way on CAST.
    *   - TIMESTAMP_MICROS with isAdjustedToUTC=false → Spark
    *     TIMESTAMP_NTZ. Cast to session-local TIMESTAMP: the session
    *     timezone is pinned to UTC (`GraftSession.builder`), so the
    *     wall-clock is preserved exactly, matching DuckDB's naive read.
    *   - TIMESTAMP_MICROS (UTC-adjusted) → already Spark TIMESTAMP;
    *     pass through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => raw
      case other => sys.error(s"Tables.events: events.ts has unsupported physical " +
        s"type ${other.simpleString} — this reader adapts epoch-nanos long, " +
        "TIMESTAMP_NTZ and TIMESTAMP; a regenerated testdata layout needs a new branch " +
        "(fail HERE with the dtype named, not 42 queries later with analysis errors)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
