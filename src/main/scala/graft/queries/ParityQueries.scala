package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Reference-parity query surface (SURVEY.md §2) re-expressed over the
  * driver testdata tables so both Spark and the DuckDB oracle run the
  * same semantics.
  *
  * Hash-stability conventions (every query in SparkEntry follows them):
  *   - monetary/measure doubles are cast to DECIMAL(18,2) before
  *     aggregation — exact, order-independent arithmetic that matches
  *     DuckDB bit-for-bit; final numeric outputs are cast back to
  *     DOUBLE so both engines emit the same physical type;
  *   - averages are computed as CAST(SUM(dec) AS DOUBLE)/COUNT so the
  *     division happens once, in IEEE-754 double, identically in both
  *     engines (DuckDB's AVG over DECIMAL takes a different path);
  *   - every query ends in a deterministic total ORDER BY (Catalyst's
  *     EliminateSorts removes it under count-only actions, so this is
  *     free in the benchmark path).
  */
object ParityQueries {

  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q1_agg — pricing summary (SURVEY.md §2.4 A1/A3-A5, §2.7 F1-F3):
    * single hash aggregate with map-side partial aggregation; all
    * arithmetic decimal-exact. Mirrors the reference's KPI aggregates
    * (count/max/avg, `app.py:119-127`) and view arithmetic
    * (`views.sql:24`).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        max(dec(col("l_extendedprice"))).cast("double").as("max_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
