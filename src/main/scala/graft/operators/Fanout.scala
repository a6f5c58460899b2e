package graft.operators

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Scan-parallelism guard (optimization guide §2.5 "input skew: one huge
 * unsplittable file"): a parquet file with few row groups plans at most one
 * REAL map task per row group no matter how many cores the session has —
 * splits beyond row-group boundaries read nothing — so heavy per-row work
 * downstream (tokenize, shingle, hash, decode) serializes on one core.
 *
 * [[widen]] hash-repartitions on caller-supplied DETERMINISTIC keys (never
 * `rand()`/round-robin — retried map tasks must reproduce the same
 * row-to-partition assignment, SPARK-38388) to the session's default
 * parallelism, but ONLY when the physical plan is actually starved (fewer
 * than half the session's cores' worth of partitions). At 100 TB a scan
 * plans thousands of splits, the guard sees a wide plan, and this is the
 * identity — no extra exchange at scale; the fan-out self-tunes to the
 * `local[N]` the driver benches at because the target derives from the
 * session's own parallelism, not a constant.
 */
object Fanout {

  /** Repartition `df` by `keys` to the session default parallelism iff its
    * physical plan has fewer than half that many partitions. Streaming
    * frames pass through untouched (no RDD to inspect pre-execution). */
  def widen(df: DataFrame, keys: Seq[Column]): DataFrame = {
    if (df.isStreaming || keys.isEmpty) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    val n =
      try df.queryExecution.toRdd.getNumPartitions
      catch { case NonFatal(_) => return df }
    if (n * 2 <= target) df.repartition(target, keys: _*) else df
  }
}
