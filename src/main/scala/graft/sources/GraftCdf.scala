package graft.sources

import scala.jdk.CollectionConverters._

import graft.write.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.graftshim.{CdfDeletePartition, CdfReaderFactory, CdfTaggedPartition, ClusteredScanUtil, ParquetScanBridge}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/**
 * Row-level change-data-capture table mode (`changeFeedMode=rows`): the
 * DSv2 surface over [[Snapshots.changeEvents]], delivering every
 * row-level event of a snapshot-logged table — inserts from files a
 * commit added, delete PREIMAGES from its deletion-vector deltas —
 * tagged with `_change_type` / `_commit_version`. The consumer for
 * merge-on-read DML, where the file-level feed (`changeFeed=true`)
 * refuses by design: an UPDATE here is its delete+insert pair, the
 * upsert shape downstream MERGEs apply directly.
 *
 *   spark.read.format("graft").option("path", dir)
 *     .option("changeFeedMode", "rows")
 *     .option("startingVersion", "2")          // feed starts AFTER v2
 *     .option("startingTimestamp", "2024-01-01 00:00:00") // or by time
 *     .option("endingVersion", "7")            // batch only; default head
 *     .load()
 *
 *   spark.readStream.format("graft")…           // same options, version
 *     .option("changeFeedMode", "rows").load()  // ledger offsets (O(1))
 *
 * Same contracts as the batch twin [[Snapshots.readChangesWithDeletes]]
 * (spec-proven equal): layout-only commits (OPTIMIZE, incl. DV folds)
 * deliver nothing, logical rewrites and vacuumed-past-retention ranges
 * fail loudly with the restart point. Scale shape: a micro-batch plans
 * IO proportional to the INCREMENT — added files plus re-bound carriers
 * — never a table rescan; delete partitions ship DV paths, not
 * positions (O(1) task bytes). Column pruning reaches the parquet scan;
 * filters stay ABOVE the scan (delete preimages are position-addressed,
 * a pushed row-group skip would shift positions — Spark re-applies
 * every predicate, correctness unaffected).
 */
object GraftCdf {

  val ModeOption = "changeFeedMode"

  /** Accepted values: `files` (the default listing/version file-level
   *  feeds) and `rows` (this CDC table). */
  def isRowMode(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get(ModeOption)).map(_.trim.toLowerCase) match {
      case Some("rows") => true
      case Some("files") | None => false
      case Some(other) => throw new IllegalArgumentException(
        s"unknown $ModeOption '$other' (want files or rows)")
    }

  val cdcFields: Array[StructField] = Array(
    StructField(Snapshots.ChangeTypeCol, StringType, nullable = false),
    StructField(Snapshots.CommitVersionCol, LongType, nullable = false))

  /** Split a pruned projection into (data columns, CDC emit tokens in
   *  projection order). CDC columns live at the TAIL of the table schema,
   *  so a pruned projection keeps them as a suffix — assert it. */
  private[sources] def splitRequired(required: StructType): (StructType, Seq[String]) = {
    val isCdc = Set(Snapshots.ChangeTypeCol, Snapshots.CommitVersionCol)
    val (data, cdc) = required.fields.partition(f => !isCdc(f.name))
    require(required.fields.drop(data.length).sameElements(cdc),
      s"CDC columns must be a projection suffix, got ${required.fieldNames.mkString(",")}")
    (StructType(data),
      cdc.toSeq.map(f => if (f.name == Snapshots.ChangeTypeCol) "type" else "version"))
  }

  /** The CDC partitions of `(from, to]`: tagged insert partitions over
   *  each event's added files, one whole-file delete partition per
   *  re-bound carrier. */
  private[sources] def planPartitions(
      spark: SparkSession,
      dir: String,
      from: Long,
      to: Long,
      physData: StructType,
      physRequired: StructType,
      emit: Seq[String]): Array[InputPartition] = {
    if (to <= from) return Array.empty
    val parts = Array.newBuilder[InputPartition]
    Snapshots.changeEvents(spark, dir, from, to).foreach { e =>
      if (e.added.nonEmpty) {
        // filter-free: all predicates re-apply above the scan
        ParquetScanBridge.parquetBatch(spark, e.added, physData, physRequired, Array.empty)
          .planInputPartitions()
          .foreach(p => parts += CdfTaggedPartition(
            p.asInstanceOf[FilePartition], e.version, emit))
      }
      if (e.dvDeltas.nonEmpty) {
        val byCarrier = e.dvDeltas.map(d => d.carrier -> d).toMap
        val planned = ParquetScanBridge.parquetBatch(
          spark, e.dvDeltas.map(_.carrier), physData, physRequired, Array.empty)
          .planInputPartitions()
        ClusteredScanUtil.wholeFilePartitions(planned).foreach { p =>
          val fp = p.asInstanceOf[FilePartition]
          val path = fp.files.head.filePath.toPath.toString
          val d = byCarrier.getOrElse(path, throw new IllegalStateException(
            s"CDC planning: carrier $path not in the event's DV deltas"))
          parts += CdfDeletePartition(fp, d.dv, d.prevDv, e.version, emit)
        }
      }
      if (e.cdcFiles.nonEmpty) {
        // recorded change-data sidecars (CoW DML): `_change_type` is a
        // stored column, any split shape is fine
        val (sData, sRequired) = storedSchemas(physData, physRequired, emit)
        ParquetScanBridge.parquetBatch(spark, e.cdcFiles, sData, sRequired, Array.empty)
          .planInputPartitions()
          .foreach(p => parts += org.apache.spark.sql.graftshim.CdfStoredPartition(
            p.asInstanceOf[FilePartition], e.version, emit.contains("version")))
      }
    }
    parts.result()
  }

  /** Sidecar file schema (data columns + stored `_change_type`) and its
   *  pruned read schema for the requested projection. */
  private def storedSchemas(
      physData: StructType,
      physRequired: StructType,
      emit: Seq[String]): (StructType, StructType) = {
    val typeField = cdcFields(0)
    val sData = StructType(physData.fields :+ typeField)
    val sRequired =
      if (emit.contains("type")) StructType(physRequired.fields :+ typeField)
      else physRequired
    (sData, sRequired)
  }

  private[sources] def readerFactory(
      spark: SparkSession,
      physData: StructType,
      physRequired: StructType,
      emit: Seq[String]): PartitionReaderFactory = {
    val (sData, sRequired) = storedSchemas(physData, physRequired, emit)
    new CdfReaderFactory(
      ParquetScanBridge.parquetBatch(spark, Seq.empty, physData, physRequired, Array.empty)
        .createReaderFactory(),
      ParquetScanBridge.parquetBatch(spark, Seq.empty, sData, sRequired, Array.empty)
        .createReaderFactory(),
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
  }
}

/** Read-only CDC table: the data schema plus the two CDC tag columns. */
class GraftCdfTable(
    dir: String,
    dataSchema: StructType,
    tableOptions: CaseInsensitiveStringMap) extends Table with SupportsRead {

  override def name(): String = s"graft-cdf:$dir"

  override def schema(): StructType =
    StructType(dataSchema.fields ++ GraftCdf.cdcFields)

  override def partitioning(): Array[Transform] = Array.empty

  override def properties(): java.util.Map[String, String] =
    tableOptions.asCaseSensitiveMap()

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def opt(key: String): Option[String] =
      Option(options.get(key)).orElse(Option(tableOptions.get(key))).map(_.trim)
    require(!(opt("startingVersion").isDefined && opt("startingTimestamp").isDefined),
      "changeFeedMode=rows: give startingVersion OR startingTimestamp, not both")
    // startingTimestamp (the Delta CDF option, INCLUSIVE at the boundary:
    // commits AT or after the timestamp deliver): the baseline is the
    // last version committed STRICTLY BEFORE the timestamp, and the feed
    // starts after it. Session-zone parsing, like every Spark timestamp.
    // A timestamp before the first retained commit starts from 0 (all).
    val startAfter = opt("startingTimestamp") match {
      case Some(ts) =>
        val millis = Snapshots.parseTimestampMillis(SparkSession.active, ts)
        try Snapshots.versionAsOf(SparkSession.active, dir, millis - 1L)
        catch { case _: IllegalArgumentException => 0L }
      case None => opt("startingVersion").map(_.toLong).getOrElse(0L)
    }
    require(!(opt("endingVersion").isDefined && opt("endingTimestamp").isDefined),
      "changeFeedMode=rows: give endingVersion OR endingTimestamp, not both")
    // endingTimestamp: the last commit at-or-before the wall-clock bounds
    // the batch range (inclusive) — the snapshot a time traveler reads
    val endingVersion = opt("endingTimestamp") match {
      case Some(ts) => Some(Snapshots.versionAsOf(SparkSession.active, dir,
        Snapshots.parseTimestampMillis(SparkSession.active, ts)))
      case None => opt("endingVersion").map(_.toLong)
    }
    new GraftCdfScanBuilder(dir, schema(), startAfter, endingVersion,
      GraftDataSource.colMapFrom(tableOptions))
  }
}

class GraftCdfScanBuilder(
    dir: String,
    fullSchema: StructType,
    startAfter: Long,
    endingVersion: Option[Long],
    colMap: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftCdfScan(dir, fullSchema, required, startAfter, endingVersion, colMap)
}

class GraftCdfScan(
    dir: String,
    fullSchema: StructType,
    required: StructType,
    startAfter: Long,
    endingVersion: Option[Long],
    colMap: Map[String, String]) extends Scan {

  private def spark = SparkSession.active
  private val (dataRequired, emit) = GraftCdf.splitRequired(required)
  // files store PHYSICAL names (rows are positional, output stays
  // logical); EXISTS_DEFAULT re-annotates from the table schema so CDC
  // events read from pre-evolution files fill added-with-DEFAULT columns
  private lazy val physRequired = GraftDataSource.renameStruct(
    ExistsDefaults.overlay(dataRequired, fullSchema), colMap)
  private lazy val physData = GraftDataSource.renameStruct(
    StructType(fullSchema.fields.dropRight(GraftCdf.cdcFields.length)), colMap)

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-cdf $dir after v$startAfter${endingVersion.fold("")(v => s" to v$v")}"

  override def toBatch: Batch = new Batch {
    private lazy val end: Long = {
      val head = Snapshots.latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(
          s"changeFeedMode=rows needs a snapshot log; $dir has none"))
      val e = endingVersion.getOrElse(head)
      require(e <= head, s"endingVersion $e is beyond the log head v$head")
      e
    }
    override def planInputPartitions(): Array[InputPartition] =
      GraftCdf.planPartitions(spark, dir, startAfter, end, physData, physRequired, emit)
    override def createReaderFactory(): PartitionReaderFactory =
      GraftCdf.readerFactory(spark, physData, physRequired, emit)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    endingVersion.foreach(v => throw new IllegalArgumentException(
      s"endingVersion=$v is a batch-read bound; a CDC stream tails the log head"))
    new GraftCdfStream(spark, dir, physData, physRequired, emit, startAfter)
  }
}

/** Snapshot-version offset ledger (O(1) offsets), CDC row delivery. */
class GraftCdfStream(
    spark: SparkSession,
    dir: String,
    physData: StructType,
    physRequired: StructType,
    emit: Seq[String],
    startAfter: Long) extends MicroBatchStream {

  private case class VersionOffset(version: Long) extends Offset {
    override def json(): String = s"""{"version":$version}"""
  }

  override def initialOffset(): Offset = VersionOffset(startAfter)

  override def latestOffset(): Offset = VersionOffset(
    Snapshots.latestVersion(spark, dir).getOrElse(startAfter))

  override def deserializeOffset(json: String): Offset = {
    val m = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
    require(m.isDefined, s"bad graft CDC offset: $json")
    VersionOffset(m.get.group(1).toLong)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VersionOffset].version
    val to = end.asInstanceOf[VersionOffset].version
    try GraftCdf.planPartitions(spark, dir, from, to, physData, physRequired, emit)
    catch {
      case e: IllegalStateException =>
        throw new IllegalStateException(
          s"CDC stream on $dir: ${e.getMessage}; restart the stream with " +
            s"startingVersion=$to after reconciling downstream state", e)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftCdf.readerFactory(spark, physData, physRequired, emit)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
