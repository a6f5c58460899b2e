package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Per-partition-key size estimation — the reference's partition-size read
 * path output shape (S8: `DataLayer.partitionSizeStructType():72-88` =
 * partition keys + `uncompressed`/`compressed` longs, fed by `IndexReader`
 * accumulating per-key byte counts from Index.db).
 *
 * Parquet keeps no per-key byte index, so the per-KEY variant is a data
 * scan: one hash aggregation on the partition key over a codegen'd per-row
 * byte-width expression (fixed widths for fixed-width types, `octet_length`
 * for strings/binary, element-width × cardinality for arrays). The
 * file/row-group-level variant at pure metadata cost is
 * `graft.sources.GraftMetadataSource`.
 *
 * The width model is exposed both as a Spark [[Column]] and as an ANSI SQL
 * expression generated from the SAME width table, so engine and oracle
 * cannot drift (battery q54).
 */
object PartitionSizes {

  /** Fixed serialized width of a type, or None for variable-width. */
  private def fixedWidth(dt: DataType): Option[Int] = dt match {
    case BooleanType | ByteType => Some(1)
    case ShortType => Some(2)
    case IntegerType | FloatType | DateType => Some(4)
    case LongType | DoubleType | TimestampType | TimestampNTZType => Some(8)
    case _: DecimalType => Some(16)
    case _ => None
  }

  /** Per-row byte estimate as a Column expression. */
  def rowBytes(schema: StructType): Column =
    schema.fields.map { f =>
      fixedWidth(f.dataType) match {
        case Some(w) => lit(w.toLong)
        case None => f.dataType match {
          // null variable-width values count 0 bytes (coalesced on BOTH the
          // Spark and the DuckDB side, so the oracle stays aligned) — a bare
          // null term would null the whole per-row sum
          case StringType | BinaryType =>
            coalesce(octet_length(col(f.name)).cast("long"), lit(0L))
          case ArrayType(et, _) =>
            coalesce(lit(fixedWidth(et).getOrElse(8).toLong) *
              size(col(f.name)).cast("long"), lit(0L))
          case _ => lit(8L) // opaque default
        }
      }
    }.reduce(_ + _)

  /** The same estimate as DuckDB SQL (strlen = BYTE length in DuckDB). */
  def rowBytesSql(schema: StructType): String =
    schema.fields.map { f =>
      fixedWidth(f.dataType) match {
        case Some(w) => w.toString
        case None => f.dataType match {
          case StringType | BinaryType => s"coalesce(strlen(${f.name}), 0)"
          case ArrayType(et, _) =>
            s"coalesce(${fixedWidth(et).getOrElse(8)} * len(${f.name}), 0)"
          case _ => "8"
        }
      }
    }.mkString(" + ")

  /** `groupBy(pk).agg(sum(bytes), count)` — one shuffle on the partition
   *  key with map-side partial aggregation; at 100 TB the output is one row
   *  per partition key, the same cardinality the reference's
   *  `PartitionSizeIterator` yields. */
  def estimate(df: DataFrame, pkCols: Seq[String]): DataFrame =
    df.groupBy(pkCols.map(col): _*).agg(
      sum(rowBytes(df.schema)).as("uncompressed"),
      count(lit(1)).as("n_rows"))
}
