package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** V1-sink micro-batch re-basing: the frame handed to `Sink.addBatch` is
 *  bound to the trigger's incremental physical plan and cannot be
 *  re-planned (the sink's repartition/sort would touch streaming
 *  internals). Re-base it on the computed rows — the same move Spark's
 *  own file sink makes. */
object StreamBatchUtil {
  def rebatch(data: Dataset[Row]): DataFrame = {
    val ds = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
