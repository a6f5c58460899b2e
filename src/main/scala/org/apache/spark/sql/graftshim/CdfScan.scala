package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/**
 * Change-data-capture partitions for the graft DSv2 source
 * (`changeFeedMode=rows`): every partition wraps a stock parquet
 * [[FilePartition]] and tags its rows with the CDC columns
 * (`_change_type`, `_commit_version`) requested by the projection.
 *
 *  - [[CdfTaggedPartition]]: rows of files a commit ADDED — delivered
 *    as-is, tagged `insert` (a merge-on-read UPDATE's re-insert
 *    generation is the postimage). Any split shape is fine: content is
 *    positional-agnostic.
 *  - [[CdfDeletePartition]]: the delete PREIMAGE — one WHOLE-FILE,
 *    filter-free partition per re-bound carrier (split/filtered reads
 *    would shift physical positions), emitting ONLY the positions the
 *    commit's new deletion vector hides beyond the previous binding.
 *    The partition ships the two DV paths, not the positions — O(1)
 *    task bytes; the executor reads both sidecars and walks a forward
 *    cursor, O(rows + |dv|) per file.
 *
 * CDC reads are row-based throughout (Spark requires partition
 * uniformity, and delete partitions are row-based by construction) —
 * the same documented read shape as merge-on-read scans; increments are
 * small by nature.
 */
final case class CdfTaggedPartition(
    inner: FilePartition,
    version: Long,
    emit: Seq[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

final case class CdfDeletePartition(
    inner: FilePartition,
    dvPath: String,
    prevDvPath: Option[String],
    version: Long,
    emit: Seq[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Rows of a commit's RECORDED change-data sidecar (copy-on-write DML
 *  with `changeFeedCow`): `_change_type` is a stored column of the file,
 *  so the reader appends only the version tag (when projected). */
final case class CdfStoredPartition(
    inner: FilePartition,
    version: Long,
    emitVersion: Boolean) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Dispatching factory over two row-based parquet inner factories
 *  (schema-bound, not file-set-bound): `inner` reads data files,
 *  `innerStored` reads CDC sidecars (data schema + `_change_type`). */
class CdfReaderFactory(
    inner: PartitionReaderFactory,
    innerStored: PartitionReaderFactory,
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case t: CdfTaggedPartition =>
      new CdfTagReader(inner.createReader(t.inner), "insert", t.version, t.emit)
    case s: CdfStoredPartition =>
      new CdfTagReader(innerStored.createReader(s.inner), "insert", s.version,
        if (s.emitVersion) Seq("version") else Nil)
    case d: CdfDeletePartition =>
      val fs = new Path(d.dvPath).getFileSystem(conf.value)
      val now = graft.write.DeletionVectors.read(fs, d.dvPath)
      val before = d.prevDvPath
        .map(graft.write.DeletionVectors.read(fs, _)).getOrElse(Array.empty[Long])
      val old = before.toSet
      val fresh = now.filterNot(old) // stays sorted: `now` is sorted by format
      new CdfDeleteReader(inner.createReader(d.inner), fresh, d.version, d.emit)
    case other =>
      throw new IllegalStateException(s"unexpected CDC partition: ${other.getClass}")
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    throw new IllegalStateException("graft CDC partitions are row-based by construction")

  override def supportColumnarReads(p: InputPartition): Boolean = false
}

/** Appends the requested CDC tag columns (`emit` tokens "type"/"version",
 *  in projection order) to every row of the wrapped reader. */
class CdfTagReader(
    inner: PartitionReader[InternalRow],
    changeType: String,
    version: Long,
    emit: Seq[String]) extends PartitionReader[InternalRow] {

  private val typeUtf8 = UTF8String.fromString(changeType)
  private val tagRow = new GenericInternalRow(emit.length)
  private val joined = new JoinedRow

  override def next(): Boolean = inner.next()

  override def get(): InternalRow =
    if (emit.isEmpty) inner.get()
    else {
      var i = 0
      emit.foreach { m =>
        if (m == "type") tagRow.update(i, typeUtf8) else tagRow.setLong(i, version)
        i += 1
      }
      joined(inner.get(), tagRow)
    }

  override def close(): Unit = inner.close()
}

/** Whole-file preimage reader: counts PHYSICAL positions and emits ONLY
 *  the freshly-deleted ones (sorted — a forward index replaces per-row
 *  search), tagged `delete`. */
class CdfDeleteReader(
    inner: PartitionReader[InternalRow],
    fresh: Array[Long],
    version: Long,
    emit: Seq[String]) extends PartitionReader[InternalRow] {

  private val typeUtf8 = UTF8String.fromString("delete")
  private val tagRow = new GenericInternalRow(emit.length)
  private val joined = new JoinedRow
  private var pos = -1L
  private var i = 0

  override def next(): Boolean = {
    while (i < fresh.length && inner.next()) {
      pos += 1
      if (fresh(i) == pos) { i += 1; return true }
    }
    false
  }

  override def get(): InternalRow =
    if (emit.isEmpty) inner.get()
    else {
      var j = 0
      emit.foreach { m =>
        if (m == "type") tagRow.update(j, typeUtf8) else tagRow.setLong(j, version)
        j += 1
      }
      joined(inner.get(), tagRow)
    }

  override def close(): Unit = inner.close()
}
