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
 * Position-aware reading for the graft DSv2 source: whole-file, row-based
 * partitions whose readers (a) SKIP positions listed in a deletion vector
 * and (b) optionally APPEND `_graft_file` / `_graft_pos` metadata columns
 * — the physical row coordinates merge-on-read DML deletes by.
 *
 * Positions are physical file coordinates: the wrapped partition must
 * cover EXACTLY one whole file with its splits in offset order (see
 * [[PositionAwareScanUtil.positionedPartitions]]), and the inner reader
 * must run with NO parquet row filters (a row-group or page skipped by a
 * pushed predicate would silently shift every later position). The graft
 * source guarantees both: positioned batches are built filter-free — all
 * graft filters are residual, so Spark re-applies them above the scan —
 * and partitions come from [[ClusteredScanUtil.wholeFilePartitions]].
 *
 * Files WITHOUT a DV keep Spark's stock split/vectorized path untouched;
 * the moment any positioned partition exists the whole scan reports
 * row-based reads (Spark requires partition uniformity), which is the
 * documented merge-on-read read tax until OPTIMIZE folds the DVs away.
 */
object PositionAwareScanUtil {

  /** One whole-file partition per file of `planned`, tagged with the
   *  file's path so the factory can bind its DV and metadata emission.
   *  `planned` must come from a batch over exactly the wanted files.
   *  `emitMeta` lists the coordinate columns to APPEND in the exact order
   *  the required schema requests them ("file"/"pos" tokens) — a query
   *  may select `_graft_pos, _graft_file` reversed, and emitting in a
   *  fixed order would swap the values. */
  def positionedPartitions(
      planned: Array[InputPartition],
      dvByFile: Map[String, String],
      emitMeta: Seq[String],
      rowIdBase: Map[String, Long] = Map.empty,
      storedRowIdTrails: Boolean = false): Array[InputPartition] = {
    require(emitMeta.forall(m => m == "file" || m == "pos" || m == "rowid"),
      s"unknown coordinate column token in $emitMeta")
    require(!emitMeta.contains("rowid") || storedRowIdTrails,
      "rowid emission needs the stored _graft_row_id column appended to the " +
        "parquet read (materialized ids of rewritten files take precedence)")
    ClusteredScanUtil.wholeFilePartitions(planned).map { p =>
      val fp = p.asInstanceOf[FilePartition]
      val path = fp.files.head.filePath.toPath.toString
      val base = if (!emitMeta.contains("rowid")) None else Some(
        rowIdBase.getOrElse(path, throw new IllegalStateException(
          s"row-tracked read: file $path has no base-row-id binding in the " +
            "snapshot log — it was written outside the tracked commit paths " +
            "(out-of-band file drop?); re-commit it through the log")))
      PositionedPartition(fp, path, dvByFile.get(path), emitMeta, base,
        storedRowIdTrails): InputPartition
    }
  }
}

/** A whole-file partition + the per-file context its reader needs. */
final case class PositionedPartition(
    inner: FilePartition,
    filePath: String,
    dvPath: Option[String],
    emitMeta: Seq[String],
    rowIdBase: Option[Long] = None,
    storedRowIdTrails: Boolean = false) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/**
 * Dispatching factory: [[PositionedPartition]]s read row-based through
 * `positionedInner` (built filter-free) wrapped with DV skip + metadata
 * append; every other partition goes straight to `plainInner`. When any
 * positioned partition exists the scan must be planned row-based
 * everywhere (`forceRowBased`) — Spark requires all partitions of one
 * scan to agree on columnar support.
 */
class PositionAwareReaderFactory(
    plainInner: PartitionReaderFactory,
    positionedInner: PartitionReaderFactory,
    conf: SerializableConfiguration,
    forceRowBased: Boolean) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case pp: PositionedPartition =>
      val dv = pp.dvPath
        .map(d => graft.write.DeletionVectors.read(
          new Path(d).getFileSystem(conf.value), d))
        .getOrElse(Array.empty[Long])
      new PositionAwareReader(
        positionedInner.createReader(pp.inner), dv, pp.filePath, pp.emitMeta,
        pp.rowIdBase, pp.storedRowIdTrails)
    case other => plainInner.createReader(other)
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    p match {
      case _: PositionedPartition =>
        throw new IllegalStateException(
          "positioned graft partitions are row-based by construction")
      case other => plainInner.createColumnarReader(other)
    }

  override def supportColumnarReads(p: InputPartition): Boolean =
    !forceRowBased && (p match {
      case _: PositionedPartition => false
      case other => plainInner.supportColumnarReads(other)
    })
}

/** Row reader over one whole file: counts PHYSICAL positions, skips the
 *  DV'd ones, optionally appends the coordinate columns in the REQUESTED
 *  order (`emitMeta` tokens). The deleted-position probe is a forward
 *  cursor — positions arrive non-decreasing, so the whole scan pays
 *  O(rows + |dv|), never a per-row search. */
class PositionAwareReader(
    inner: PartitionReader[InternalRow],
    deleted: Array[Long],
    filePath: String,
    emitMeta: Seq[String],
    rowIdBase: Option[Long] = None,
    storedRowIdTrails: Boolean = false) extends PartitionReader[InternalRow] {

  private val cursor = new graft.write.DeletionVectors.Cursor(deleted)
  private var pos = -1L
  private val fileUtf8 = UTF8String.fromString(filePath)
  private val metaRow = new GenericInternalRow(emitMeta.length)
  private val joined = new JoinedRow
  private var truncated: TruncatedRow = _

  override def next(): Boolean = {
    while (inner.next()) {
      pos += 1
      if (!cursor.deleted(pos)) return true
    }
    false
  }

  override def get(): InternalRow =
    if (emitMeta.isEmpty) inner.get()
    else {
      val row = inner.get()
      // when a stored `_graft_row_id` trails the parquet output it is an
      // INPUT to the rowid computation, not a data column — hide it from
      // the emitted row (the data prefix) and coalesce it into the meta
      val dataLen = if (storedRowIdTrails) row.numFields - 1 else row.numFields
      var i = 0
      emitMeta.foreach { m =>
        m match {
          case "file" => metaRow.update(i, fileUtf8)
          case "pos" => metaRow.setLong(i, pos)
          case "rowid" =>
            val stored = !row.isNullAt(dataLen)
            metaRow.setLong(i,
              if (stored) row.getLong(dataLen) else rowIdBase.get + pos)
        }
        i += 1
      }
      if (!storedRowIdTrails) joined(row, metaRow)
      else {
        if (truncated == null) truncated = new TruncatedRow(row, dataLen)
        joined(truncated.set(row), metaRow)
      }
    }

  override def close(): Unit = inner.close()
}

/** A zero-copy prefix view of an InternalRow — the trailing stored-rowid
 *  input column must not leak into the output layout. */
private[graftshim] class TruncatedRow(
    private var row: InternalRow, n: Int) extends InternalRow {
  def set(r: InternalRow): TruncatedRow = { row = r; this }
  override def numFields: Int = n
  override def setNullAt(i: Int): Unit = row.setNullAt(i)
  override def update(i: Int, value: Any): Unit = row.update(i, value)
  override def copy(): InternalRow = new TruncatedRow(row.copy(), n)
  override def isNullAt(i: Int): Boolean = row.isNullAt(i)
  override def getBoolean(i: Int): Boolean = row.getBoolean(i)
  override def getByte(i: Int): Byte = row.getByte(i)
  override def getShort(i: Int): Short = row.getShort(i)
  override def getInt(i: Int): Int = row.getInt(i)
  override def getLong(i: Int): Long = row.getLong(i)
  override def getFloat(i: Int): Float = row.getFloat(i)
  override def getDouble(i: Int): Double = row.getDouble(i)
  override def getDecimal(i: Int, precision: Int, scale: Int) =
    row.getDecimal(i, precision, scale)
  override def getUTF8String(i: Int): UTF8String = row.getUTF8String(i)
  override def getBinary(i: Int): Array[Byte] = row.getBinary(i)
  override def getInterval(i: Int) = row.getInterval(i)
  override def getStruct(i: Int, numFields: Int) = row.getStruct(i, numFields)
  override def getArray(i: Int) = row.getArray(i)
  override def getMap(i: Int) = row.getMap(i)
  override def get(i: Int, dataType: org.apache.spark.sql.types.DataType): AnyRef =
    row.get(i, dataType)
  override def getVariant(i: Int) = row.getVariant(i)
  override def getGeography(i: Int) = row.getGeography(i)
  override def getGeometry(i: Int) = row.getGeometry(i)
}
