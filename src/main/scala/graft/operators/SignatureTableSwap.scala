package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/**
 * The ONE copy of the crash-safe signature-state swap protocol, shared by
 * the batch signature table ([[Dedup.ingestWithSignatureTable]]) and the
 * streaming MinHash state
 * ([[graft.streaming.EventStreams.dedupIngestStream]]) so the two cannot
 * drift: compaction writes `<sigDir>.compact.tmp` (whose `_SUCCESS`
 * marker is the commit point), deletes the live dir, renames into place;
 * recovery at the next ingest completes a COMMITTED tmp or discards an
 * uncommitted one — at no point is the only copy of the state a partial
 * write. Hadoop `FileSystem.rename`/`delete` report many failures by
 * returning false rather than throwing, so every step is return-checked:
 * a failed swap must abort loudly, never leave the table silently gone.
 */
private[graft] object SignatureTableSwap {

  /** Complete or discard an interrupted swap. Call before reading the
   *  state dir. */
  def recover(fs: FileSystem, sigPath: Path, tmpPath: Path): Unit = {
    if (fs.exists(tmpPath)) {
      if (fs.exists(new Path(tmpPath, "_SUCCESS"))) {
        if (fs.exists(sigPath))
          require(fs.delete(sigPath, true), s"swap recovery: delete($sigPath) failed")
        require(fs.rename(tmpPath, sigPath),
          s"swap recovery: rename($tmpPath -> $sigPath) failed")
      } else
        require(fs.delete(tmpPath, true),
          s"swap recovery: discarding incomplete $tmpPath failed")
    }
  }

  /** Rewrite the state deduplicated on `dedupCols` via the two-phase
   *  swap. The tmp write materializes — and its `_SUCCESS` commit point
   *  is written by THIS protocol, not left to the committer config
   *  (deployments disable markers on object stores; without one, a crash
   *  between delete and rename would make recovery discard the only
   *  remaining copy as "incomplete") — BEFORE anything is deleted. */
  def compact(spark: SparkSession, fs: FileSystem, sigDir: String,
      sigPath: Path, tmpPath: Path, dedupCols: Seq[String]): Unit = {
    spark.read.parquet(sigDir)
      .dropDuplicates(dedupCols)
      .write.mode(SaveMode.Overwrite).parquet(tmpPath.toString)
    val marker = new Path(tmpPath, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker, true).close()
    require(fs.delete(sigPath, true), s"compaction: delete($sigPath) failed")
    require(fs.rename(tmpPath, sigPath),
      s"compaction: rename($tmpPath -> $sigPath) failed")
  }
}
