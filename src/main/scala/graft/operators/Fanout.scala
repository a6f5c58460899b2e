package graft.operators

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._

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
 * parallelism, but ONLY when the input is scan-shaped and backed by a
 * handful of files. Round-19 lessons baked in:
 *  - the guard is METADATA-ONLY: no `queryExecution.toRdd` (which ran a
 *    full physical-planning pass — DSv2 planInputPartitions, file listing,
 *    footer reads — only to read a partition count and throw the plan
 *    away). `inputFiles` reads the already-analyzed plan's leaves.
 *  - it is applied INSIDE the few operators whose per-row work justifies
 *    an exchange, never at a shared corpus accessor (the blanket docs()
 *    widen taxed ~150 light consumers to buy 5 wins — battery geomean
 *    0.82; driver-verified wins where the work is heavy: q133 4.2x,
 *    q151 2.0x).
 * At 100 TB a table is never one file, so the guard short-circuits to the
 * identity without planning anything.
 */
object Fanout {

  /** True iff every node between `p`'s leaves and the operator is a narrow
    * map (no shuffle, no join/aggregate/window/sort, no repartition): only
    * then does the leaf FILE count predict the scan's task count. Anything
    * else either already re-established parallelism or is beyond what file
    * metadata can reason about — skip the fan-out. */
  private def scanShaped(p: LogicalPlan): Boolean = p match {
    case _: Project | _: Filter | _: Union | _: SubqueryAlias | _: Generate =>
      p.children.forall(scanShaped)
    case _: LeafNode => true
    case _ => false
  }

  /** Repartition `df` by `keys` to the session default parallelism iff the
    * plan is scan-shaped over fewer than half that many files. Streaming
    * frames and frames with no file leaves (in-memory, pure-derived) pass
    * through untouched. */
  def widen(df: DataFrame, keys: Seq[Column]): DataFrame = {
    if (df.isStreaming || keys.isEmpty) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    val starved =
      try scanShaped(df.queryExecution.analyzed) && {
        val n = df.inputFiles.length
        n > 0 && n * 2 <= target
      } catch { case NonFatal(_) => false }
    if (starved) df.repartition(target, keys: _*) else df
  }
}
