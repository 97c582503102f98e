package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is an implemented operator from SURVEY.md §2
  * (or a driver-mandated extension); each `oracleSql` entry is the
  * equivalent DuckDB SQL over the same parquet tables. Column names
  * and types are aligned on both sides (see ParityQueries scaladoc for
  * the hash-stability conventions).
  */
object SparkEntry {
  import graft.queries._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (ParityQueries.q1Agg _),
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> ParityQueries.q1AggSql,
  )
}
