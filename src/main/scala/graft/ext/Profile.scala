package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-statistics profiler — the data-quality sweep every
  * training-data pipeline runs before/after curation: per-column null
  * count, distinct count, min/max. One aggregate pass over the scan
  * (all metrics fan out of a single `agg`), unpivoted to long format
  * so the output schema is stable regardless of the profiled column
  * set. min/max are stringified so heterogeneous column types share
  * one output column (callers profiling numerics can cast back).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_str"),
        col(s"__mx_$c").as("max_str"))
    }
    one.select(explode(array(entries: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}
