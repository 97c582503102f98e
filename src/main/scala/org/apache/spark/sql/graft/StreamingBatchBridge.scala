package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** The one `private[sql]` bridge the library needs: re-expose a batch
  * plan as a STREAMING leaf for a v1 [[org.apache.spark.sql.execution
  * .streaming.Source]]'s `getBatch` — the engine asserts
  * `isStreaming=true` on the returned frame, and
  * [[LogicalRDD.fromDataset]] (what Spark's own file stream source
  * family builds on) is `private[sql]`. Lives in an
  * `org.apache.spark.sql` subpackage solely to reach it; no Spark
  * internals are modified. Planning stays lazy — `toRdd` builds the
  * physical plan driver-side and no job runs until the sink consumes
  * the batch. */
object StreamingBatchBridge {
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    ClassicDataset.ofRows(cdf.sparkSession,
      LogicalRDD.fromDataset(cdf.queryExecution.toRdd, cdf, isStreaming = true))
  }
}
