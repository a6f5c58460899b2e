package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/**
 * The "partition sizes without reading data" table — rebuild of the
 * reference's secondary read path S8 (SURVEY §2.1):
 * `PartitionSizeTableProvider` / `PartitionSizeIterator` / `IndexReader`
 * (spark3/…/PartitionSizeTableProvider.java:46-171, IndexReader.java:51-310)
 * stream ONLY the Index.db/Summary.db components, never Data.db, to report
 * per-partition byte sizes.
 *
 * The parquet-native analog of "the index component" is the file footer:
 * this source reads ONLY footers (a few KB per file) and emits one row per
 * row group with row counts, uncompressed/compressed byte sizes, and the
 * min/max `_graft_token` when the file was written by the token-sorted
 * writer. Usage:
 *
 * {{{
 *   spark.read.format("graft-metadata").option("path", dir).load()
 * }}}
 *
 * Scale design: one input partition per file; each task opens exactly one
 * footer — O(bytes read) is independent of data size, exactly the property
 * the reference's Index-only scan has (`DataLayer javadoc:233-243`). The
 * aggregate `groupBy(...).agg(sum(uncompressed_bytes))` over this table is
 * the partition-size query (battery q13-style) at metadata cost.
 *
 * This table reports PHYSICAL layout: rows hidden by merge-on-read
 * deletion vectors still occupy their bytes and row-group counts until
 * OPTIMIZE folds them — which is the number a capacity/layout audit
 * wants. Logical row counts come from the main table path (whose
 * metadata-count pushdown correctly disables itself while DVs exist).
 */
class GraftMetadataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-metadata"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftMetadataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-metadata requires a 'path' option")
    new MetadataTable(path)
  }
}

object GraftMetadataSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("row_group", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("uncompressed_bytes", LongType, nullable = false),
    StructField("compressed_bytes", LongType, nullable = false),
    StructField("min_token", LongType, nullable = true),
    StructField("max_token", LongType, nullable = true),
    /** manifest-recorded xxhash64 content digest (write-time fact — a
     *  footer read cannot recover it; null for pre-digest files) */
    StructField("digest", LongType, nullable = true)))
}

private[sources] class MetadataTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-metadata.`$dir`"
  override def schema(): StructType = GraftMetadataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      private val spark = SparkSession.active
      override def build(): Scan = this
      override def readSchema(): StructType = GraftMetadataSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        TokenPruner.listFiles(spark, dir)
          .map(f => FooterPartition(f.path, f.digest): InputPartition)
      override def createReaderFactory(): PartitionReaderFactory =
        new FooterReaderFactory(
          new SerializableConfiguration(spark.sessionState.newHadoopConf()))
    }
}

private[sources] final case class FooterPartition(
    path: String, digest: Option[Long] = None) extends InputPartition

/** Executor-side footer read: one footer per task, no data pages touched. */
private[sources] class FooterReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val fp = partition.asInstanceOf[FooterPartition]
    val path = fp.path
    new PartitionReader[InternalRow] {
      private val rows = FooterReaderFactory.footerRows(conf.value, path, fp.digest).iterator
      private var current: InternalRow = _
      override def next(): Boolean = { if (rows.hasNext) { current = rows.next(); true } else false }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

private[sources] object FooterReaderFactory {
  def footerRows(
      conf: Configuration, path: String, digest: Option[Long] = None): Seq[InternalRow] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf))
    try {
      reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map { case (b, i) =>
        val tokenStats = b.getColumns.asScala
          .find(_.getPath.toDotString == graft.write.TokenSortedWriter.TokenCol)
          .map(_.getStatistics)
          // random-ring layouts carry BINARY tokens: emit null min/max
          // rather than casting parquet Binary stats to Long
          .filter(s => s != null && s.hasNonNullValue &&
            s.genericGetMin.isInstanceOf[java.lang.Long])
        val vals = new Array[Any](8)
        vals(0) = UTF8String.fromString(path)
        vals(1) = i
        vals(2) = b.getRowCount
        vals(3) = b.getTotalByteSize
        vals(4) = b.getCompressedSize
        vals(5) = tokenStats.map(s => s.genericGetMin.asInstanceOf[java.lang.Long]).orNull
        vals(6) = tokenStats.map(s => s.genericGetMax.asInstanceOf[java.lang.Long]).orNull
        vals(7) = digest.map(Long.box).orNull
        new GenericInternalRow(vals)
      }
    } finally reader.close()
  }
}
