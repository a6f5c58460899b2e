package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/**
 * Column-role model for a Cassandra-style table: every column is a partition
 * key, clustering key, static column, or regular value column.
 *
 * Mirrors the reference's `CqlField` role flags and its propagation of roles
 * into Spark `StructField.metadata` (reference: cassandra-analytics-core
 * `data/DataLayer.java:118-129` writes `isPartitionKey` / `isClusteringKey` /
 * `isStaticColumn` / `isValueColumn` / `position` into field metadata), so a
 * plain DataFrame "remembers" key roles across operators and the write path
 * can recover the partition key without out-of-band schema plumbing.
 *
 * Scale note: this is pure driver-side metadata — zero bytes per row, no
 * executor cost at any data size.
 */
object ColumnRole extends Enumeration {
  val PartitionKey, ClusteringKey, Static, Regular = Value
}

final case class CqlColumn(
    name: String,
    role: ColumnRole.Value,
    position: Int)

/**
 * Role-annotated schema for one table: ordered partition keys, ordered
 * clustering keys, everything else static/value. The analog of the
 * reference's `CqlTable` (cassandra-analytics-common `data/CqlTable.java:40`,
 * `partitionKeys()/clusteringKeys()/staticColumns()/valueColumns()` at
 * :119-162) re-expressed as an immutable Scala case class.
 */
final case class CqlSchema(
    table: String,
    partitionKeys: Seq[String],
    clusteringKeys: Seq[String] = Nil,
    staticColumns: Seq[String] = Nil) {

  def primaryKey: Seq[String] = partitionKeys ++ clusteringKeys

  def role(col: String): ColumnRole.Value =
    if (partitionKeys.contains(col)) ColumnRole.PartitionKey
    else if (clusteringKeys.contains(col)) ColumnRole.ClusteringKey
    else if (staticColumns.contains(col)) ColumnRole.Static
    else ColumnRole.Regular

  /** Metadata position for a column: its index WITHIN ITS ROLE GROUP for key
   *  columns (so [[CqlSchema.fromStruct]] recovers the DECLARED key order —
   *  composite-key token serialization is order-sensitive, and a recovery
   *  sorted by DataFrame column position would silently reorder
   *  `partitionKeys = Seq("b","a")` into ("a","b"), computing tokens that
   *  match no file), or the column index for the rest. */
  def positionOf(col: String, columnIndex: Int): Int = role(col) match {
    case ColumnRole.PartitionKey => partitionKeys.indexOf(col)
    case ColumnRole.ClusteringKey => clusteringKeys.indexOf(col)
    case ColumnRole.Static => staticColumns.indexOf(col)
    case _ => columnIndex
  }

  /** Annotate a DataFrame's StructFields with role metadata (lossless — data
   *  unchanged; only `StructField.metadata` is rewritten). Implemented as a
   *  projection with per-column alias metadata so the logical plan stays
   *  declarative: Catalyst still sees the original scan, so parquet column
   *  pruning / filter pushdown / whole-stage codegen are unaffected (an
   *  RDD round-trip here would sever the optimizer from the source). */
  def annotate(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.zipWithIndex.map { case (f, i) =>
      CqlSchema.qcol(f.name)
        .as(f.name, CqlSchema.roleMetadata(f.metadata, role(f.name), positionOf(f.name, i)))
    }
    df.select(cols.toIndexedSeq: _*)
  }
}

object CqlSchema {
  /** Column reference from a RAW column name (reference parity for quoted/
   *  exotic identifiers, `EndToEndTests.java:2408-2625`): `col("a.b")`
   *  parses dots as struct access and chokes on backticks, so every place a
   *  name crosses from schema metadata into an expression must quote. */
  def qcol(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col(quoted(name))

  def quoted(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Inverse: a pushed-filter attribute arrives back-quoted when the name
   *  needs quoting (`EqualTo(\`user id\`, 1)`); normalize for comparisons. */
  def unquoted(name: String): String =
    if (name.length >= 2 && name.head == '`' && name.last == '`')
      name.substring(1, name.length - 1).replace("``", "`")
    else name

  val PositionKey = "position"
  val IsPartitionKey = "isPartitionKey"
  val IsClusteringKey = "isClusteringKey"
  val IsStaticColumn = "isStaticColumn"
  val IsValueColumn = "isValueColumn"
  val IsPrimaryKey = "isPrimaryKey"

  def roleMetadata(base: Metadata, role: ColumnRole.Value, position: Int): Metadata = {
    import ColumnRole._
    new MetadataBuilder()
      .withMetadata(base)
      .putLong(PositionKey, position.toLong)
      .putBoolean(IsPartitionKey, role == PartitionKey)
      .putBoolean(IsClusteringKey, role == ClusteringKey)
      .putBoolean(IsStaticColumn, role == Static)
      .putBoolean(IsValueColumn, role == Regular)
      .putBoolean(IsPrimaryKey, role == PartitionKey || role == ClusteringKey)
      .build()
  }

  /** Recover the role-annotated schema from a DataFrame whose fields carry
   *  role metadata (inverse of [[CqlSchema.annotate]]). */
  def fromStruct(table: String, schema: StructType): CqlSchema = {
    def having(flag: String): Seq[String] =
      schema.fields.toSeq
        .filter(f => f.metadata.contains(flag) && f.metadata.getBoolean(flag))
        .sortBy(f => if (f.metadata.contains(PositionKey)) f.metadata.getLong(PositionKey) else 0L)
        .map(_.name)
    CqlSchema(table, having(IsPartitionKey), having(IsClusteringKey), having(IsStaticColumn))
  }

  def partitionKeys(schema: StructType): Seq[String] =
    fromStruct("", schema).partitionKeys
}
