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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for (SPARK-40819): read it as epoch-nanos long and truncate
    * to microseconds. Integer `div` is required — double division
    * loses precision above 2^53 and 2024 epoch-nanos is ~1.7e18.
    * DuckDB (the oracle) truncates ns→µs the same way on CAST.
    * The required `nanosAsLong` conf is set by `GraftSession.builder`
    * (session-level config belongs on the builder, not inside a reader).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
