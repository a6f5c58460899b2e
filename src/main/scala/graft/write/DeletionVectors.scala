package graft.write

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}

/**
 * Positional deletion vectors — the merge-on-read half of row-level DML
 * (the lakehouse deletion-vector / position-delete-file design Delta and
 * Iceberg converged on; the reference has no DML at all, SSTables being
 * immutable — `CassandraDataSink.java:96-99` rejects even Overwrite).
 *
 * A DV is a sidecar file holding the SORTED physical row positions of one
 * data file that are logically deleted. A point DELETE/UPDATE on a 100 TB
 * table then writes O(changed rows) bytes — the DV (8 B/row) plus, for
 * updates, the re-inserted rows — instead of rewriting every file whose
 * group matched (copy-on-write's write amplification). The snapshot log
 * binds (data file → DV) per VERSION, so time travel is exact: a pinned
 * pre-DML read sees no DV and every row, the post-DML head hides exactly
 * the deleted positions, and OPTIMIZE folds DVs away by rewriting the
 * carrier files with deletions materialized.
 *
 * Format (`_graft_dv/dv-*.bin`): magic "GDV1", int count, `count`
 * big-endian longs ascending. DVs are IMMUTABLE like data files — a
 * second DML on the same file writes a NEW dv holding the union, and the
 * old one stays referenced by older snapshots until vacuumed. Files are
 * small by construction (a DV carrying a large fraction of its file is a
 * compaction trigger, not a steady state), so readers load them whole.
 *
 * Position contract: a position counts PHYSICAL rows in file order,
 * 0-based, including rows already hidden by an older DV — positions are
 * layout coordinates, not logical row numbers, so they stay valid as the
 * DV set grows and can be produced either by the DSv2 whole-file readers
 * (`GraftDataSource`) or by Spark's own `_metadata.row_index`.
 */
object DeletionVectors {

  val Dir = "_graft_dv"
  private val Magic = 0x47445631 // "GDV1"

  /** New DV path under the table root (never reused — DVs are immutable). */
  def newDvPath(tableDir: String): String =
    s"$tableDir/$Dir/dv-${java.util.UUID.randomUUID().toString.take(16)}.bin"

  def write(fs: FileSystem, path: String, positions: Array[Long]): Unit = {
    val sorted = positions.distinct.sorted
    val out = new DataOutputStream(fs.create(new Path(path), false))
    try {
      out.writeInt(Magic)
      out.writeInt(sorted.length)
      sorted.foreach(out.writeLong)
    } finally out.close()
  }

  def read(fs: FileSystem, path: String): Array[Long] = {
    val in = new DataInputStream(fs.open(new Path(path)))
    try {
      require(in.readInt() == Magic, s"not a graft deletion vector: $path")
      val n = in.readInt()
      require(n >= 0, s"corrupt deletion vector $path: negative count")
      Array.fill(n)(in.readLong())
    } finally in.close()
  }

  /** Deleted-position COUNT from the 8-byte header alone — the cheap
   *  driver-side probe statistics and compaction triggers want (no
   *  position payload read). */
  def count(fs: FileSystem, path: String): Long = {
    val in = new DataInputStream(fs.open(new Path(path)))
    try {
      require(in.readInt() == Magic, s"not a graft deletion vector: $path")
      in.readInt().toLong
    } finally in.close()
  }

  /** Sorted-ascending membership cursor: rows arrive in position order, so
   *  one forward pointer replaces per-row binary search. */
  final class Cursor(positions: Array[Long]) {
    private var i = 0
    /** True iff `pos` is deleted. MUST be called with non-decreasing pos. */
    def deleted(pos: Long): Boolean = {
      while (i < positions.length && positions(i) < pos) i += 1
      i < positions.length && positions(i) == pos
    }
  }

  /**
   * Apply DVs to a multi-file parquet read OUTSIDE the DSv2 source — the
   * rewrite paths (OPTIMIZE bin-packing, compaction, per-file delete
   * rewrites) read carrier files with `spark.read.parquet` and must not
   * resurrect deleted rows. Implemented with Spark's own
   * `_metadata.row_index`/`file_path` plus one BROADCAST anti-join of the
   * (file, pos) delete set — the delete set is O(deleted rows of the
   * files being rewritten), the carrier side never shuffles.
   *
   * `dvByFile` keys must be the same qualified path spelling the
   * `_metadata.file_path` column produces (callers pass listing paths,
   * which match).
   */
  def applyToRead(
      spark: SparkSession,
      files: Seq[String],
      dvByFile: Map[String, String],
      raw0: Option[DataFrame] = None): DataFrame = {
    // raw0: callers reading an evolved table pass the exists-default-aware
    // frame ([[graft.sources.ExistsDefaults.read]]) so absent columns fill
    // with their recorded default instead of null
    val raw = raw0.getOrElse(spark.read.parquet(files: _*))
    val affected = files.filter(dvByFile.contains)
    if (affected.isEmpty) return raw
    val fs = new Path(files.head).getFileSystem(spark.sessionState.newHadoopConf())
    val deletes: Seq[(String, Long)] = affected.flatMap { f =>
      read(fs, dvByFile(f)).map(p => (f, p))
    }
    import spark.implicits._
    val delDf = deletes.toDF("__dv_file", "__dv_pos")
    raw
      .withColumn("__dv_file", col("_metadata.file_path"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
      .join(broadcast(delDf), Seq("__dv_file", "__dv_pos"), "left_anti")
      .drop("__dv_file", "__dv_pos")
  }

  /** The merged DV content for `file` given a possibly-present existing DV
   *  plus newly deleted positions. */
  def union(
      fs: FileSystem,
      existingDv: Option[String],
      fresh: Array[Long]): Array[Long] = {
    val old = existingDv.map(read(fs, _)).getOrElse(Array.empty[Long])
    (old ++ fresh).distinct.sorted
  }

  /** All positions of `file` logically deleted at the version that maps it
   *  to `dvPath` — loaded whole (DVs are trickle-sized by contract). */
  def positions(spark: SparkSession, dvPath: String): Array[Long] = {
    val p = new Path(dvPath)
    read(p.getFileSystem(spark.sessionState.newHadoopConf()), dvPath)
  }

  /** Validate a DV update set against a version's file set before commit:
   *  every carrier must be a live data file (a DV on a vanished file is a
   *  lost delete — fail the DML, never drop it silently). */
  def validateCarriers(dvUpdates: Map[String, String], live: Set[String]): Unit = {
    val orphaned = dvUpdates.keys.filterNot(live.contains)
    require(orphaned.isEmpty,
      s"deletion vectors reference file(s) not in the committed set: " +
        s"${orphaned.take(3).mkString(", ")} — concurrent rewrite? recompute the DML")
  }
}
