package org.apache.spark.sql.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/**
 * Per-task parquet writing for DSv2 `BatchWrite` paths (row-level
 * operations' staging files): the exact writer stack Spark's own
 * `FileFormatWriter` uses — `ParquetUtils.prepareWrite` configures the
 * write support (schema, legacy-format flags, compression) on the driver
 * into a serializable `OutputWriterFactory`; each task then opens one
 * `OutputWriter` and feeds it `InternalRow`s. Mirrors [[ParquetScanBridge]]
 * on the read side: delegate the bytes to Spark's parquet kernel, never
 * hand-roll the format.
 */
object ParquetWriteBridge {

  /** Driver-side: a serializable (factory, hadoopConf) pair for tasks. */
  def prepare(spark: SparkSession, schema: StructType)
      : (OutputWriterFactory, SerializableConfiguration) = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = ParquetUtils.prepareWrite(
      spark.sessionState.conf, job, schema,
      new ParquetOptions(Map.empty[String, String], spark.sessionState.conf))
    (factory, new SerializableConfiguration(job.getConfiguration))
  }

  /** Task-side: one parquet writer at `path` (caller owns close/cleanup). */
  def openWriter(
      factory: OutputWriterFactory,
      conf: Configuration,
      path: String,
      schema: StructType,
      partitionId: Int,
      taskId: Long): OutputWriter = {
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-rowlevel", 0), TaskType.MAP, partitionId),
      // TaskAttemptID's attempt field is an Int; fold the Spark task id in
      (taskId % Int.MaxValue).toInt)
    factory.newInstance(path, schema, new TaskAttemptContextImpl(conf, attempt))
  }

  type Row = InternalRow
}
