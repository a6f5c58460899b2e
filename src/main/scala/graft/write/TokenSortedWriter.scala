package graft.write

import graft.functions.graft_token
import graft.model.CqlSchema
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The bulk-write pipeline, re-expressed Spark-first (reference S11:
 * `CassandraBulkSourceRelation.insert():116-131` = tokenize → range-repartition
 * → sort-within-partitions → write sorted runs; SURVEY §2.9 W2-W4, §3.2).
 *
 * Pipeline:
 *   1. `_graft_token = graft_token(pk…)` — Cassandra-ring-compatible Murmur3
 *      token per row (W2, bit-compatible port).
 *   2. `repartitionByRange(N, _graft_token)` — the reference's
 *      `TokenPartitioner` ring split becomes Spark's range partitioner
 *      (sampled split points ≈ even token sub-ranges; W3). Exactly ONE
 *      shuffle, same as the reference ("write path = exactly one range+sort
 *      shuffle", SURVEY §4.2).
 *   3. `sortWithinPartitions(_graft_token, pk…, ck…)` — satisfies the sorted
 *      writer invariant (W4, `SortedSSTableWriter.addRow():132-142` requires
 *      monotonically non-decreasing tokens per output run). Spark folds the
 *      sort into the shuffle read (sort-based shuffle), so it is free-ish.
 *   4. parquet write with rolling file size via `maxRecordsPerFile` — the
 *      analog of `sstableDataSizeInMiB` size-capped SSTables.
 *
 * Mode semantics follow the reference sink: only Append is allowed unless
 * the caller opts into overwrite (`CassandraDataSink.java:96-99` rejects
 * Overwrite outright).
 *
 * Scale notes (100 TB):
 *  - Range partitioning samples split points on the driver (reservoir
 *    sampling per partition) — O(partitions) driver memory, not O(rows).
 *  - One shuffle keyed by an 8-byte long: minimal shuffle width; value
 *    payload is the row itself, unavoidable for a clustered write.
 *  - Output files are non-overlapping in token range ⇒ a later reader can
 *    plan one task per file with zero overlap (the property the reference's
 *    reader exploits via `SparkRangeFilter`, P4).
 */
object TokenSortedWriter {

  final case class WriteConf(
      numPartitions: Int = 0, // 0 = leave to spark.sql.shuffle.partitions
      maxRecordsPerFile: Long = 0L, // 0 = single file per task
      allowOverwrite: Boolean = false,
      keepTokenColumn: Boolean = false)

  val TokenCol = "_graft_token"

  /** Tokenize + range-partition + sort, without writing — the reusable
   *  logical prefix (also what the DSv2 sink delegates to). */
  def tokenSorted(df: DataFrame, schema: CqlSchema, conf: WriteConf = WriteConf()): DataFrame = {
    require(schema.partitionKeys.nonEmpty, s"table ${schema.table} has no partition key")
    val withToken = df.withColumn(TokenCol, graft_token(schema.partitionKeys.map(col): _*))
    val parted =
      if (conf.numPartitions > 0) withToken.repartitionByRange(conf.numPartitions, col(TokenCol))
      else withToken.repartitionByRange(col(TokenCol))
    parted.sortWithinPartitions(
      (TokenCol +: schema.primaryKey).map(col): _*)
  }

  /** Full write: returns the output path for read-back. */
  def write(
      df: DataFrame,
      schema: CqlSchema,
      path: String,
      mode: SaveMode = SaveMode.Append,
      conf: WriteConf = WriteConf()): Unit = {
    if (mode == SaveMode.Overwrite && !conf.allowOverwrite) {
      // Reference parity: CassandraDataSink.java:96-99 rejects Overwrite.
      throw new IllegalArgumentException(
        "SaveMode.Overwrite rejected (reference sink semantics); set allowOverwrite to opt in")
    }
    val sorted = tokenSorted(df, schema, conf)
    val out = if (conf.keepTokenColumn) sorted else sorted.drop(TokenCol)
    val writer = out.write.mode(mode)
    val w2 = if (conf.maxRecordsPerFile > 0)
      writer.option("maxRecordsPerFile", conf.maxRecordsPerFile) else writer
    w2.parquet(path)
  }

  /** Read back a previous [[write]] output with role metadata re-attached. */
  def read(spark: SparkSession, schema: CqlSchema, path: String): DataFrame =
    schema.annotate(spark.read.parquet(path))
}
