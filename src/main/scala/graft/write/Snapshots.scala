package graft.write

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Versioned snapshot log: time-travel reads and atomic multi-file commits
 * for graft table dirs (the lakehouse snapshot-isolation layer the
 * reference delegates to Cassandra's SSTable lifecycle — a bulk job there
 * reads "the SSTables of one repaired snapshot", `SSTableReader` set
 * resolution; here the analog is an explicit commit log so a 100 TB scan
 * never sees a half-landed write batch).
 *
 * Layout: `<table>/_graft_snapshots/v<000000000012>.txt`, one file per
 * committed version:
 *
 *   graft-snapshot <tab> 1 <tab> <version> <tab> <epochMillis> <tab> <parent|->
 *   <relative data file path>
 *   ...
 *
 * Each snapshot lists the COMPLETE live data-file set at that version
 * (relative paths — the log survives a table move, like the manifest).
 * Commit is an optimistic create-exclusive of the next version file: two
 * racing writers both compute v(N+1), the filesystem accepts exactly one
 * `create(overwrite = false)`, and the loser re-reads the winner's set and
 * retries on v(N+2) — appends therefore linearize without a lock service
 * on any store with atomic exclusive create (HDFS; object stores with
 * conditional put).
 *
 * Contracts:
 *  - the log is ADDITIVE metadata: a table without snapshots behaves
 *    exactly as before (reads plan from the live listing);
 *  - a snapshot read (`snapshotVersion` source option) plans from the
 *    recorded file set and FAILS LOUDLY if a recorded file has vanished
 *    (vacuumed past retention or deleted out-of-band) — silently returning
 *    fewer rows is the one unacceptable outcome;
 *  - data files are immutable once written (the writer never mutates a
 *    parquet file in place), so pinning a file set pins bytes;
 *  - logical rewrites ([[commitRewrite]] — compaction, dedup-in-place)
 *    leave replaced files on disk for older snapshots; [[vacuum]] later
 *    reconciles physical state to the retained log suffix.
 */
object Snapshots {

  val Dir = "_graft_snapshots"
  private val Magic = "graft-snapshot"
  private val MaxCommitAttempts = 20

  /** In-JVM commit mutex per table root. The exclusive create below is the
   *  cross-process guard, but it is only atomic on stores that implement it
   *  (HDFS; object stores with conditional put) — LocalFileSystem's
   *  check-then-create is racy, and the overwhelmingly common case of two
   *  committers is two jobs of ONE driver, which this stripe serializes. */
  private val commitLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private val VFile = """v(\d{12})\.txt""".r

  private def vPath(root: Path, version: Long): Path =
    new Path(root, f"$Dir/v$version%012d.txt")

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    (f, f.makeQualified(p))
  }

  /** Highest committed version, None for a table with no snapshot log. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (f, root) = fs(spark, dir)
    latest(f, root)
  }

  private def latest(f: FileSystem, root: Path): Option[Long] = {
    val d = new Path(root, Dir)
    if (!f.exists(d)) return None
    val vs = f.listStatus(d).iterator.flatMap(s => s.getPath.getName match {
      case VFile(n) => Some(n.toLong)
      case _ => None
    }).toSeq
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** The absolute data-file paths of one committed version.
   *  Throws for an unknown version — a typo'd pin must not fall back to
   *  "whatever is on disk". */
  def files(spark: SparkSession, dir: String, version: Long): Seq[String] = {
    val (f, root) = fs(spark, dir)
    readFiles(f, root, version)
  }

  private def readFiles(f: FileSystem, root: Path, version: Long): Seq[String] = {
    val p = vPath(root, version)
    if (!f.exists(p))
      throw new IllegalArgumentException(
        s"snapshot v$version does not exist under $root (latest: " +
          s"${latest(f, root).map(_.toString).getOrElse("none")}) — " +
          "it was never committed or was vacuumed past retention")
    val in = f.open(p)
    val text = try {
      val len = f.getFileStatus(p).getLen.toInt
      val bytes = new Array[Byte](len)
      in.readFully(0, bytes)
      new String(bytes, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.linesIterator.toSeq
    require(lines.nonEmpty && lines.head.startsWith(Magic + "\t"),
      s"corrupt snapshot file $p: missing header")
    lines.tail.filter(_.nonEmpty).map(rel => new Path(root, rel).toString)
  }

  /** Append-commit: next version = parent's files ∪ `added`. Retries the
   *  optimistic create against concurrent committers. Returns the committed
   *  version. */
  def commitAppend(spark: SparkSession, dir: String, added: Seq[String]): Long =
    commitLoop(spark, dir)(base => base ++ added.filterNot(base.toSet))

  /** Rewrite-commit: next version's file set is exactly `fileSet`
   *  (compaction / logical overwrite — replaced files stay on disk for
   *  older snapshots until [[vacuum]]). */
  def commitRewrite(spark: SparkSession, dir: String, fileSet: Seq[String]): Long =
    commitLoop(spark, dir)(_ => fileSet)

  private def commitLoop(spark: SparkSession, dir: String)(
      next: Seq[String] => Seq[String]): Long = {
    val (f, root) = fs(spark, dir)
    val lock = commitLocks.computeIfAbsent(root.toString, _ => new Object)
    lock.synchronized { commitLoopLocked(f, root, dir)(next) }
  }

  private def commitLoopLocked(f: FileSystem, root: Path, dir: String)(
      next: Seq[String] => Seq[String]): Long = {
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      attempt += 1
      val parent = latest(f, root)
      val base = parent.map(readFiles(f, root, _)).getOrElse(Nil)
      val version = parent.getOrElse(0L) + 1
      val body = new StringBuilder()
        .append(Magic).append('\t').append(1).append('\t').append(version)
        .append('\t').append(System.currentTimeMillis())
        .append('\t').append(parent.map(_.toString).getOrElse("-")).append('\n')
      // qualify before relativizing: callers hand in paths from different
      // producers (listings, inputFiles) whose URI spellings differ
      // (file:/ vs file:///) for the same file
      next(base).map(p => relativize(root, f.makeQualified(new Path(p)).toString))
        .distinct.sorted.foreach(r => body.append(r).append('\n'))
      try {
        // exclusive create IS the commit: exactly one writer wins a version
        val out = f.create(vPath(root, version), false)
        try out.write(body.toString.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        return version
      } catch {
        case _: FileAlreadyExistsException => () // lost the race — re-read, retry
        case e: java.io.IOException if attempt < MaxCommitAttempts &&
            Option(e.getMessage).exists(_.contains("already exists")) => ()
      }
    }
    throw new IllegalStateException(
      s"snapshot commit on $dir lost $MaxCommitAttempts consecutive races — " +
        "a runaway committer is monopolizing the log")
  }

  /**
   * Reconcile physical files to the retained log suffix: keep the last
   * `keepLast` snapshots, delete (a) older snapshot files and (b) data
   * files referenced ONLY by those dropped snapshots. Files never
   * referenced by any snapshot (out-of-band writes) are untouched — vacuum
   * must not eat data it was never told about. After a vacuum following a
   * [[commitRewrite]], the live listing equals the latest snapshot again,
   * so default (listing-driven) reads and snapshot reads agree.
   * Returns the deleted data-file paths.
   */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "vacuum must retain at least the latest snapshot")
    val (f, root) = fs(spark, dir)
    val last = latest(f, root).getOrElse(return Nil)
    val all = (1L to last).filter(v => f.exists(vPath(root, v)))
    val (drop, keep) = all.partition(_ <= last - keepLast)
    if (drop.isEmpty) return Nil
    val keptFiles = keep.flatMap(readFiles(f, root, _)).toSet
    val doomed = drop.flatMap(readFiles(f, root, _)).distinct
      .filterNot(keptFiles)
    doomed.foreach(p => f.delete(new Path(p), false))
    drop.foreach(v => f.delete(vPath(root, v), false))
    // stale listing signatures would resurrect deleted files from cache
    graft.sources.TokenPruner.invalidateListing(dir)
    doomed
  }

  /** File-level diff of two committed versions: (added, removed) absolute
   *  paths going `fromVersion` → `toVersion`. Version 0 = empty table, so
   *  `diff(spark, dir, 0, v)` is the full file set of v. */
  def diff(spark: SparkSession, dir: String, fromVersion: Long, toVersion: Long)
      : (Seq[String], Seq[String]) = {
    val (f, root) = fs(spark, dir)
    def setOf(v: Long): Set[String] =
      if (v == 0L) Set.empty else readFiles(f, root, v).toSet
    val from = setOf(fromVersion)
    val to = setOf(toVersion)
    ((to -- from).toSeq.sorted, (from -- to).toSeq.sorted)
  }

  /**
   * Change feed: the rows APPENDED between two snapshot versions, read from
   * exactly the files the later version added — the incremental-consumption
   * primitive. A nightly pipeline pass ("process the documents that arrived
   * since my last run") costs IO proportional to the INCREMENT, never a
   * rescan of the table: at 100 TB with a 0.1% daily append, that is a
   * thousandfold difference, and no "updated_at > ?" predicate or full
   * anti-join is involved — immutable files + the log make membership
   * exact.
   *
   * Append-lineage only: if any file was REMOVED across the range (a
   * rewrite/compaction landed in between), file-level provenance can no
   * longer equate "new files" with "new rows" — the call fails loudly
   * rather than double-count rows that compaction rewrote into fresh files.
   */
  def readChanges(
      spark: SparkSession, dir: String, fromVersion: Long, toVersion: Long)
      : org.apache.spark.sql.DataFrame = {
    require(fromVersion <= toVersion,
      s"readChanges: fromVersion $fromVersion > toVersion $toVersion")
    val (added, removed) = diff(spark, dir, fromVersion, toVersion)
    if (removed.nonEmpty)
      throw new IllegalStateException(
        s"readChanges $fromVersion→$toVersion crosses a rewrite commit " +
          s"(${removed.length} file(s) removed, e.g. ${removed.head}) — file-level " +
          "change capture is only sound over append lineage; consume up to the " +
          "rewrite, then restart from it")
    if (added.isEmpty) {
      // zero changed rows, but keep the TABLE schema on the empty frame
      val (f, root) = fs(spark, dir)
      val toFiles = if (toVersion == 0L) Nil else readFiles(f, root, toVersion)
      if (toFiles.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(toFiles: _*).limit(0)
    } else spark.read.parquet(added: _*)
  }

  /** Resolve a pinned version ("latest" or a number) against the log and
   *  restrict `all` (the live listing) to that snapshot's files. A recorded
   *  file missing from the listing fails the scan — a pin must never
   *  silently shrink. */
  def filterListing(
      spark: SparkSession,
      dir: String,
      pinned: String,
      all: Array[graft.sources.TokenPruner.FileMeta])
      : Array[graft.sources.TokenPruner.FileMeta] = {
    val (f, root) = fs(spark, dir)
    val version = pinned.trim.toLowerCase match {
      case "latest" => latest(f, root).getOrElse(throw new IllegalArgumentException(
        s"snapshotVersion=latest but $dir has no snapshot log"))
      case n => n.toLong
    }
    val want = readFiles(f, root, version).toSet
    val have = all.filter(m => want.contains(m.path))
    if (have.length != want.size) {
      val missing = (want -- have.map(_.path)).toSeq.sorted
      throw new IllegalStateException(
        s"snapshot v$version of $dir references ${missing.length} file(s) absent " +
          s"from the live listing (vacuumed past retention or deleted out-of-band); " +
          s"first missing: ${missing.head}")
    }
    have
  }

  private def relativize(root: Path, abs: String): String = {
    val rootStr = root.toString.stripSuffix("/") + "/"
    if (abs.startsWith(rootStr)) abs.substring(rootStr.length) else abs
  }
}
