package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/**
 * SQL-surface shard containers: `spark.read.format("graft-tar")` /
 * `("graft-zip")` DSv2 TableProviders over [[TarShards]] / [[ZipShards]]
 * semantics, so a WebDataset/npz lake is reachable from pure SQL like
 * every other graft surface — and, for tar, STREAMABLE:
 *
 *  - **Batch** (`graft-tar`): one input partition per shard, each task
 *    streaming its shard with O(member) memory through
 *    [[TarShards.members]]. **Column pruning is a payload pushdown**: a
 *    query that never selects `payload` gets the header-only walk
 *    (`withPayload = false` — 512 B reads through the decompressor,
 *    nothing allocated), so `SELECT member_name, member_size FROM tar`
 *    IS the inventory pass.
 *  - **Micro-batch** (`spark.readStream.format("graft-tar")`): the
 *    scale-true continuous-ingest path. The offset ledger is the
 *    ARRIVAL-FILE LIST (the [[GraftCdfStream]] version=offset pattern
 *    applied to files): each trigger lists the directory, admits new
 *    files in (modificationTime, path) order — capped by
 *    `maxFilesPerTrigger` — and appends them to a durable ledger under
 *    the checkpoint location (write-tmp-then-rename, the
 *    [[graft.operators.SignatureTableSwap]] commit discipline); the
 *    checkpointed offset is an index into that ledger, so replays plan
 *    the exact same files and a restart rebuilds the list by replaying
 *    ledger segments. Each admitted shard is then parsed by the SAME
 *    O(member) reader as the batch path — a standard 1-4 GB WebDataset
 *    shard streams through a task without ever existing in memory,
 *    which the previous `binaryFile`-based path (whole shard per row)
 *    could not do.
 *  - **FAILFAST / permissive** ([[Ingest]] discipline): a corrupt shard
 *    fails the task with path + member index by default — under
 *    streaming that batch replays against the same ledger range until
 *    the file is repaired (the documented poison-pill remediation).
 *    `permissive = true` quarantines instead: members parsed before the
 *    corruption are kept, the rest of THAT shard is dropped (logged),
 *    and the stream advances.
 *
 * `graft-zip` is the seekable twin: one task per archive, TWO positioned
 * reads (EOCD tail window + central-directory slice — payload bytes are
 * never touched), rows = the [[ZipShards.schema]] inventory. Pair with
 * [[ZipShards.fetchStored]] for the members a selection keeps.
 */
class TarShardSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-tar"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarShards.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-tar requires a path: spark.read.format(\"graft-tar\").load(dir)")
    new TarShardTable(path)
  }
}

/** Classifies a member-walk failure for the permissive quarantine:
 *  DATA-shaped = the BYTES are corrupt — malformed tar headers
 *  (IllegalArgumentException), gzip corruption (java.util.zip.ZipException
 *  incl. the constructor-time header check), zstd frame corruption
 *  (ZstdException / ZstdIOException), truncation (EOFException). A
 *  GENERIC IOException is INFRA (a transient s3/hdfs read failure on a
 *  healthy shard) and must fail the task for RETRY — quarantining it
 *  would permanently drop the rest of the shard once the stream
 *  advances past the ledger range (the zip reader's discipline). */
private[sources] object ShardQuarantine {
  def dataShaped(e: Throwable): Boolean = e match {
    // ZipException before EOFException/IOException: both are IOExceptions
    case _: java.util.zip.ZipException => true
    case _: com.github.luben.zstd.ZstdIOException => true
    case _: java.io.EOFException => true
    case _: IllegalArgumentException => true
    case _: com.github.luben.zstd.ZstdException => true
    case _ => false
  }
}

private[sources] object ShardFiles {

  /** Spark file-source convention: dot/underscore files are metadata
   *  (checkpoint tmp files, _SUCCESS markers), never shards. */
  def hidden(name: String): Boolean =
    name.startsWith(".") || name.startsWith("_")

  /** Directory recursion bound: dated layouts are 1-3 levels; a cycle or
   *  a pathological tree must not stall the driver. */
  val MaxListDepth = 32

  /** Past this many matched directories the per-directory listing RPCs
   *  move to EXECUTORS (the InMemoryFileIndex discipline): a 10^7-shard
   *  lake's planning must not serialize behind one driver thread. */
  val DistributedListingThreshold = 64

  def maxFileAgeMs(options: CaseInsensitiveStringMap): Long =
    Option(options.get("maxFileAge"))
      .map(ArrivalLedgerStream.parseDuration)
      .getOrElse(ArrivalLedgerStream.DefaultMaxFileAgeMs)

  def compactInterval(options: CaseInsensitiveStringMap): Int =
    options.getInt("ledgerCompactInterval",
      ArrivalLedgerStream.DefaultCompactInterval)

  /** Recursive walk of directories on whatever machine holds `fs` — the
   *  ONE walker behind both batch planning ([[list]]) and stream
   *  admission (`ArrivalLedgerStream.listArrivals`), so the two can
   *  never disagree on what a lake contains. Root directory names are
   *  NOT hidden-filtered (an explicitly-given `_staging` or `.work`
   *  root must still list); children are. */
  /** `keepDir` (when non-null) prunes SUBTREES from the walk — e.g. the
   *  stream's aged-out `date=` directories. Pruning is a promise that
   *  nothing admissible lives below the pruned dir, never an error. */
  def walkDirs(fs: org.apache.hadoop.fs.FileSystem, roots: Seq[Path],
      keepDir: org.apache.hadoop.fs.FileStatus => Boolean = null)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    val dirs = scala.collection.mutable.Queue(roots.map((_, 0)): _*)
    while (dirs.nonEmpty) {
      val (d, depth) = dirs.dequeue()
      fs.listStatus(d).foreach { s =>
        if (!hidden(s.getPath.getName)) {
          if (s.isFile) out += s
          else if (keepDir != null && !keepDir(s)) () // pruned subtree
          else if (depth < MaxListDepth) dirs.enqueue((s.getPath, depth + 1))
          else throw new IllegalStateException(
            s"directory nesting exceeds $MaxListDepth at ${s.getPath} — " +
              "a cycle or a pathological layout; refusing to SILENTLY " +
              "truncate the listing")
        }
      }
    }
    out.result()
  }

  /** Expand a file/dir/glob into (path, length) pairs, name-sorted for
   *  deterministic planning. Directories are walked RECURSIVELY (dated
   *  `date=...` producer layouts); when the glob matches more than
   *  [[DistributedListingThreshold]] directories, the per-directory
   *  listing runs on executors and only the (path, length) pairs come
   *  back to the driver. */
  def list(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val hp = new Path(path)
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val fs = hp.getFileSystem(conf.value)
    val statuses = fs.globStatus(hp)
    require(statuses != null && statuses.nonEmpty, s"no shards match $path")
    val (dirs, rootFiles) = statuses.toSeq.partition(_.isDirectory)
    val direct = rootFiles.filter(s => !hidden(s.getPath.getName))
      .map(s => (s.getPath.toString, s.getLen))
    val walked =
      if (dirs.size <= DistributedListingThreshold)
        walkDirs(fs, dirs.map(_.getPath))
          .map(s => (s.getPath.toString, s.getLen))
      else {
        val bc = spark.sparkContext.broadcast(conf)
        val names = dirs.map(_.getPath.toString)
        spark.sparkContext
          .parallelize(names, math.min(names.size,
            math.max(1, spark.sparkContext.defaultParallelism)))
          .flatMap { d =>
            val dp = new Path(d)
            walkDirs(dp.getFileSystem(bc.value.value), Seq(dp))
              .map(s => (s.getPath.toString, s.getLen))
          }
          .collect().toSeq
      }
    (direct ++ walked).sortBy(_._1)
  }
}

private[sources] class TarShardTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-tar.`$path`"
  override def schema(): StructType = TarShards.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarScanBuilder(path, options)
}

private[sources] class TarScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = TarShards.schema
  private var pushed: Array[sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // member_name/member_type predicates evaluate per HEADER inside the
  // walk, so non-matching payloads are skipped (seeked over on
  // uncompressed shards), never materialized: `SELECT payload WHERE
  // member_name LIKE '%.jpg'` costs jpg bytes only — the per-member twin
  // of the withPayload column-pruning pushdown
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val (accepted, rest) = filters.partition(TarMemberFilter.supported)
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[sources.Filter] = pushed
  override def build(): Scan = new TarScan(path, options, required, pushed)
}

/** The pushable member predicates and their executor-side evaluation —
 *  name equality/prefix/suffix/contains/IN and type equality (LIKE
 *  'x%' / '%x' / '%x%' arrive as StringStartsWith/EndsWith/Contains). */
private[sources] object TarMemberFilter {
  import org.apache.spark.sql.sources._

  def supported(f: Filter): Boolean = f match {
    case EqualTo("member_name", _: String) => true
    case EqualTo("member_type", _: String) => true
    case StringStartsWith("member_name", _) => true
    case StringEndsWith("member_name", _) => true
    case StringContains("member_name", _) => true
    case In("member_name", vs) => vs.forall(_.isInstanceOf[String])
    case In("member_type", vs) => vs.forall(_.isInstanceOf[String])
    // the columns are non-nullable; accept so the residual plan is clean
    case IsNotNull("member_name" | "member_type") => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  def eval(f: Filter, name: String, typ: String): Boolean = f match {
    case EqualTo("member_name", v: String) => name == v
    case EqualTo("member_type", v: String) => typ == v
    case StringStartsWith("member_name", v) => name.startsWith(v)
    case StringEndsWith("member_name", v) => name.endsWith(v)
    case StringContains("member_name", v) => name.contains(v)
    case In("member_name", vs) => vs.contains(name)
    case In("member_type", vs) => vs.contains(typ)
    case IsNotNull(_) => true
    case And(l, r) => eval(l, name, typ) && eval(r, name, typ)
    case Or(l, r) => eval(l, name, typ) || eval(r, name, typ)
    case Not(c) => !eval(c, name, typ)
    case _ => true
  }

  /** Conjunction of all pushed filters as the walk's `keep` predicate. */
  def keepFn(filters: Array[Filter]): (String, String) => Boolean =
    if (filters == null || filters.isEmpty) null
    else (name, typ) => filters.forall(eval(_, name, typ))
}

private[sources] class TarScan(
    path: String, options: CaseInsensitiveStringMap, required: StructType,
    pushed: Array[sources.Filter] = Array.empty)
    extends Scan {

  private def spark = SparkSession.active
  private val cap =
    options.getLong("maxMemberBytes", TarShards.maxMemberBytesDefault)
  // validated HERE, on the driver at plan time: the reader-side require
  // throws the same IllegalArgumentException shape as corrupt-data
  // failures, so under permissive a bad OPTION would quarantine every
  // shard (a silently-empty lake) instead of surfacing the config error
  require(cap > 0 && cap < Int.MaxValue,
    s"maxMemberBytes must fit a byte array, got $cap")
  private val permissive = options.getBoolean("permissive", false)
  private val maxFilesPerTrigger: Option[Int] =
    Option(options.get("maxFilesPerTrigger")).map(_.toInt)
  // the file-stream options callers relied on with the binaryFile-based
  // path keep working: name-glob admission filter + newest-first backlog
  private val pathGlobFilter: Option[String] =
    Option(options.get("pathGlobFilter"))
  private val latestFirst = options.getBoolean("latestFirst", false)
  // column pruning IS the payload pushdown: no payload column in the
  // required schema -> header-only walk, nothing allocated per member
  private val withPayload = required.fieldNames.contains("payload")

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-tar $path payload=$withPayload permissive=$permissive " +
      s"PushedMemberFilters: [${pushed.mkString(", ")}]"

  private def factory: PartitionReaderFactory =
    new TarMemberReaderFactory(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()),
      required, cap, withPayload, permissive, pushed)

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      ShardFiles.list(spark, path)
        .map(f => TarShardPartition(f._1, f._2): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory = factory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ArrivalLedgerStream(spark, path, checkpointLocation, "graft-tar",
      factory, (p, l) => TarShardPartition(p, l),
      maxFilesPerTrigger, pathGlobFilter, latestFirst,
      ShardFiles.maxFileAgeMs(options), ShardFiles.compactInterval(options),
      options.getBoolean("agePruneDirs", false))
}

/** `len` is the size frozen at planning/admission time (-1 = unknown):
 *  the reader never walks past it, so a ledger replay is bounded to the
 *  admitted bytes — post-admission growth is DETECTED (the walk ends at
 *  the bound, loudly if mid-member), never silently re-planned. */
private[sources] final case class TarShardPartition(path: String, len: Long = -1L)
    extends InputPartition

/** Caps reads at the frozen length — the replay-determinism bound. */
private[sources] final class BoundedInputStream(
    in: java.io.InputStream, limit: Long) extends java.io.InputStream {
  private var left = limit
  override def read(): Int =
    if (left <= 0) -1
    else { val b = in.read(); if (b >= 0) left -= 1; b }
  override def read(buf: Array[Byte], off: Int, n: Int): Int = {
    if (left <= 0) return -1
    val r = in.read(buf, off, math.min(n.toLong, left).toInt)
    if (r > 0) left -= r
    r
  }
  override def skip(n: Long): Long = {
    val s = in.skip(math.min(n, left))
    if (s > 0) left -= s
    s
  }
  override def close(): Unit = in.close()
}

/** Executor-side member walk: one shard per task, streamed off an FS
 *  handle with O(member) memory; `permissive` quarantines a mid-shard
 *  corruption (members before it are kept, the tail is dropped, logged)
 *  instead of failing the task. */
private[sources] class TarMemberReaderFactory(
    conf: SerializableConfiguration,
    required: StructType,
    cap: Long,
    withPayload: Boolean,
    permissive: Boolean,
    pushed: Array[sources.Filter] = Array.empty) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[TarShardPartition]
    val path = part.path
    new PartitionReader[InternalRow] {
      private val hp = new Path(path)
      // FS open failures are infra errors and fail the task even under
      // permissive — only corrupt DATA quarantines
      private val in = hp.getFileSystem(conf.value).open(hp)
      // honor the frozen length: replays plan exactly the admitted bytes
      private val stream: java.io.InputStream =
        if (part.len >= 0) new BoundedInputStream(in, part.len) else in
      // built lazily INSIDE the quarantine try: GZIPInputStream validates
      // the gzip header at construction, so a corrupt header must
      // quarantine exactly like mid-stream corruption, not poison the
      // micro-batch from the reader constructor. taskCleanup stays on so
      // the decompressor wrapper (zstd holds a native context) closes at
      // task completion even when iteration stops early (LIMIT, abort) —
      // close() below only reaches the raw FS handle
      private var members: Iterator[TarShards.TarMember] = _
      private val fieldIdx = required.fields.map(f =>
        TarShards.schema.fieldIndex(f.name))
      private var cur: TarShards.TarMember = _
      private var quarantined = false

      override def next(): Boolean =
        if (quarantined) false
        else try {
          if (members == null)
            members = TarShards.members(stream, path, cap, withPayload,
              keep = TarMemberFilter.keepFn(pushed))
          if (members.hasNext) { cur = members.next(); true } else false
        } catch {
          case scala.util.control.NonFatal(e)
              if permissive && ShardQuarantine.dataShaped(e) =>
            System.err.println(
              s"[graft] quarantined corrupt shard tail ($path): ${e.getMessage}")
            quarantined = true
            false
        }

      override def get(): InternalRow = {
        val vals = new Array[Any](fieldIdx.length)
        var i = 0
        while (i < fieldIdx.length) {
          vals(i) = fieldIdx(i) match {
            case 0 => UTF8String.fromString(cur.shard)
            case 1 => UTF8String.fromString(cur.name)
            case 2 => cur.size
            case 3 => cur.byteOff
            case 4 => UTF8String.fromString(cur.typ)
            case _ => cur.payload
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }

      override def close(): Unit =
        try in.close() catch { case _: java.io.IOException => }
    }
  }
}

/**
 * Arrival-ledger micro-batch stream: offsets are indices into a durable
 * list of admitted shard files. The ledger is written BEFORE the offset
 * is checkpointed, so `planInputPartitions(start, end)` can always
 * resolve a replayed range; admission order is (modificationTime, path)
 * and is frozen by the ledger, never re-derived from the directory.
 *
 * Producers must LAND FILES ATOMICALLY — write to a dot-temp name and
 * rename (dot/underscore names are never admitted): a file listed
 * mid-write would be admitted with its PARTIAL length frozen in the
 * ledger, and no later completion of the file can heal that batch.
 * Admitted files are IMMUTABLE (frozen lengths enforce it for content;
 * the age eviction below relies on it for mtimes too).
 *
 * BOUNDED at perpetual-ingest scale (the FileStreamSource discipline
 * applied to the repo's own ledger):
 *
 *  - **Recursive listing**: producers land shards in dated subdirectories
 *    (`date=2026-08-16/shard-*.tar`); each trigger walks the input
 *    path — which may itself be a glob — RECURSIVELY (depth-capped,
 *    hidden dirs skipped), so a dated layout is admissible continuously
 *    without per-day consumer globs.
 *  - **Age watermark** (`maxFileAge`, default 7d): a file whose mtime is
 *    older than (newest admitted mtime - maxFileAge) is never admitted,
 *    which makes evicting its `seen` entry SAFE — it cannot reappear as
 *    "new". Driver dedup state is therefore O(arrivals within the age
 *    window), not O(lifetime arrivals).
 *  - **Ledger compaction** (`ledgerCompactInterval` commits, default 10):
 *    at a commit point where the whole ledger is committed, the
 *    watermark-surviving seen-set is written as ONE `.compact` segment
 *    (tmp + rename) and the regular segments below it are deleted —
 *    restart replays one compact + a bounded tail instead of every
 *    segment ever written, and committed entries drop out of driver
 *    memory (`filesBase` advances).
 */
private[sources] class ArrivalLedgerStream(
    spark: SparkSession,
    dir: String,
    checkpointLocation: String,
    name: String,
    factory: PartitionReaderFactory,
    partitionOf: (String, Long) => InputPartition,
    maxFilesPerTrigger: Option[Int],
    pathGlobFilter: Option[String] = None,
    latestFirst: Boolean = false,
    maxFileAgeMs: Long = ArrivalLedgerStream.DefaultMaxFileAgeMs,
    compactInterval: Int = ArrivalLedgerStream.DefaultCompactInterval,
    agePruneDirs: Boolean = false)
    extends MicroBatchStream {

  require(compactInterval > 0, s"$name ledgerCompactInterval must be positive")
  require(maxFileAgeMs > 0, s"$name maxFileAge must be positive")

  private case class FilesOffset(n: Long) extends Offset {
    override def json(): String = s"""{"files":$n}"""
  }

  private val dirPath = new Path(dir)
  private val hadoopConf = spark.sessionState.newHadoopConf()
  private val fs = dirPath.getFileSystem(hadoopConf)
  private val ledgerDir = new Path(new Path(checkpointLocation), s"$name-ledger")
  // the input dir and the checkpoint may live on DIFFERENT filesystems
  // (s3a lake, hdfs/file checkpoint) — ledger IO must use the ledger's
  // own FS or Hadoop throws "Wrong FS" at the first trigger
  private val ledgerFs = ledgerDir.getFileSystem(hadoopConf)

  // ledger lines are "<length>\t<mtime>\t<path>": the length is frozen at
  // admission so a replay never reads past the admitted bytes — a shard
  // mutated after admission surfaces LOUDLY (tar append overwrites the
  // old trailer, so in-window bytes change and the bounded walk fails),
  // never as silently different rows. The mtime rebuilds the age
  // watermark and the evictable seen-set at restart.
  private var filesBase = 0L // ledger index of files(0): committed prefix dropped
  private var files = Vector.empty[(String, Long)] // (path, frozen length)
  private var seen = Map.empty[String, Long] // path -> admitted mtime (-1 unknown)
  private var maxSeenMtime = Long.MinValue
  private var commitsSinceCompact = 0
  // live regular segments as (startIndex, entryCount): compaction deletes
  // a segment only once ALL its entries are below the committed fold point
  private var segMeta = Vector.empty[(Long, Int)]
  replayLedger()

  // FileStreamSource's exact exemption: with latestFirst + a trigger cap
  // the stream drains NEWEST-first, so an age watermark chasing the
  // newest ADMITTED mtime would permanently reject the older, not-yet-
  // admitted backlog — silent data loss, not aging. Spark disables
  // maxFileAge in precisely this configuration; so do we (seen entries
  // then never evict, which is the price of newest-first draining).
  private val ageGateActive = !(latestFirst && maxFilesPerTrigger.isDefined)

  private def watermark: Long =
    if (!ageGateActive || maxSeenMtime == Long.MinValue) Long.MinValue
    else maxSeenMtime - maxFileAgeMs

  private def noteAdmitted(entries: Seq[(String, Long, Long)]): Unit = {
    files ++= entries.map { case (p, l, _) => (p, l) }
    entries.foreach { case (p, _, m) =>
      seen += (p -> m)
      if (m > maxSeenMtime) maxSeenMtime = m
    }
  }

  private def replayLedger(): Unit = {
    if (!ledgerFs.exists(ledgerDir)) return
    val all = ledgerFs.listStatus(ledgerDir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
    val compacts = all.filter(_.getPath.getName.endsWith(".compact"))
    if (compacts.nonEmpty) {
      val latest = compacts.maxBy(_.getPath.getName)
      val lines = readSegment(latest.getPath)
      require(lines.headOption.exists(_.startsWith("compact\t")),
        s"$name corrupt compact segment: ${latest.getPath}")
      filesBase = lines.head.split('\t')(1).toLong
      lines.tail.foreach { line =>
        val tab = line.indexOf('\t')
        val m = line.substring(0, tab).toLong
        seen += (line.substring(tab + 1) -> m)
        if (m > maxSeenMtime) maxSeenMtime = m
      }
    }
    val segments = all
      .filter(s => !s.getPath.getName.endsWith(".compact"))
      .sortBy(_.getPath.getName)
    for (seg <- segments) {
      val admitted = readSegment(seg.getPath).map(parseLine)
      val start = seg.getPath.getName.toLong
      val segEnd = start + admitted.size
      if (segEnd <= filesBase) {
        // fully below the compact fold point: superseded (a crash between
        // compact-rename and segment deletion leaves these behind) —
        // track it so the next compaction finishes the delete, but do NOT
        // re-add its entries (that would resurrect age-evicted seen rows)
        segMeta :+= ((start, admitted.size))
      } else {
        require(start <= filesBase + files.size,
          s"$name ledger gap: segment $start but ${filesBase + files.size} " +
            "files replayed")
        // a segment straddling the fold point replays only its tail
        noteAdmitted(admitted.drop((filesBase + files.size - start).toInt))
        segMeta :+= ((start, admitted.size))
      }
    }
  }

  private def readSegment(p: Path): Seq[String] = {
    val len = ledgerFs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = ledgerFs.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, UTF_8).split("\n").filter(_.nonEmpty).toSeq
  }

  /** (path, length, mtime) from a regular-segment line; earlier formats
   *  (bare path; "<len>\t<path>") stay replayable with -1 sentinels —
   *  unknown mtimes are never evicted and never move the watermark. */
  private def parseLine(line: String): (String, Long, Long) = {
    val t1 = line.indexOf('\t')
    if (t1 <= 0) return (line, -1L, -1L)
    val t2 = line.indexOf('\t', t1 + 1)
    if (t2 < 0) return (line.substring(t1 + 1), line.substring(0, t1).toLong, -1L)
    (line.substring(t2 + 1), line.substring(0, t1).toLong,
      line.substring(t1 + 1, t2).toLong)
  }

  override def initialOffset(): Offset = FilesOffset(0)

  private val globFilter =
    pathGlobFilter.map(new org.apache.hadoop.fs.GlobFilter(_))

  /** Recursive arrival walk: the input path may be a file, a directory
   *  (walked recursively — dated `date=...` layouts), or a glob over
   *  either. Hidden (dot/underscore) CHILDREN are metadata, never
   *  shards, but a hidden-named ROOT the user pointed the stream at
   *  (`load("/data/_ingest")`) still lists — the same root semantics as
   *  the batch planner, via the shared [[ShardFiles.walkDirs]] walker.
   *  `pathGlobFilter` gates file names. */
  private def listArrivals(): Seq[(String, Long, Long)] = {
    val roots = Option(fs.globStatus(dirPath)).map(_.toSeq).getOrElse(Seq.empty)
    // agePruneDirs: once the age watermark passes a directory's mtime,
    // nothing NEW can be inside it — adding (or renaming in) a file
    // always bumps the parent dir's mtime, so every file below is
    // either already admitted or age-rejected. Pruning turns the
    // per-trigger walk of a years-deep dated lake into a walk of the
    // ACTIVE window only (the difference between O(lake) and O(recent)
    // listing RPCs on a 10^7-shard lake). Opt-in: stores with synthetic
    // directories (s3) may not maintain dir mtimes — pruning there
    // would silently drop data, so the default walks everything.
    val keepDir: org.apache.hadoop.fs.FileStatus => Boolean = {
      val wm = watermark
      if (!agePruneDirs || wm == Long.MinValue) null
      else s => s.getModificationTime >= wm
    }
    val (rootDirs0, rootFiles) = roots.partition(_.isDirectory)
    val rootDirs = // glob-expanded date=* dirs arrive as ROOTS — same rule
      if (keepDir == null) rootDirs0 else rootDirs0.filter(keepDir)
    val directs = rootFiles.filter(s => !ShardFiles.hidden(s.getPath.getName))
    (directs ++ ShardFiles.walkDirs(fs, rootDirs.map(_.getPath), keepDir))
      .filter(s => globFilter.forall(_.accept(s.getPath)))
      .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
  }

  override def latestOffset(): Offset = {
    val wm = watermark
    val sorted = listArrivals()
      // the age gate makes seen-eviction sound: an evicted (old) file can
      // never re-enter as "new" because this filter rejects it by mtime
      .filter { case (p, _, m) => m >= wm && !seen.contains(p) }
      .sortBy { case (p, _, m) => (m, p) }
    val arrivals = if (latestFirst) sorted.reverse else sorted
    val admit = maxFilesPerTrigger.fold(arrivals)(n => arrivals.take(n))
    if (admit.nonEmpty) {
      appendLedger(filesBase + files.size, admit)
      segMeta :+= ((filesBase + files.size, admit.size))
      noteAdmitted(admit)
    }
    FilesOffset(filesBase + files.size)
  }

  /** Durable, atomic ledger append: tmp + rename commit point. */
  private def appendLedger(start: Long, admitted: Seq[(String, Long, Long)]): Unit = {
    ledgerFs.mkdirs(ledgerDir)
    val tmp = new Path(ledgerDir, f".$start%020d.tmp")
    val out = ledgerFs.create(tmp, true)
    try admitted.foreach { case (p, l, m) =>
      out.write(s"$l\t$m\t$p\n".getBytes(UTF_8))
    } finally out.close()
    val dst = new Path(ledgerDir, f"$start%020d")
    require(ledgerFs.rename(tmp, dst), s"$name ledger commit failed: $dst")
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """"files"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
    require(m.isDefined, s"bad $name offset: $json")
    FilesOffset(m.get.group(1).toLong)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[FilesOffset].n
    val to = end.asInstanceOf[FilesOffset].n
    require(to <= filesBase + files.size,
      s"$name offset $to beyond the arrival ledger " +
        s"(${filesBase + files.size} files) — checkpoint and ledger " +
        "disagree; was the checkpoint directory pruned?")
    require(from >= filesBase,
      s"$name offset $from below the compacted ledger base $filesBase — " +
        "a committed batch is being replanned after compaction; was the " +
        "offset log rolled back by hand?")
    files.slice((from - filesBase).toInt, (to - filesBase).toInt)
      .map { case (p, l) => partitionOf(p, l) }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = factory

  /** Engine commit of a completed batch (the engine delivers it one
   *  trigger late — at the NEXT batch's construction — so the ledger
   *  usually has an uncommitted tail here): every `compactInterval`
   *  commits, fold everything below the committed offset into one
   *  compact segment, drop those entries from driver memory, and delete
   *  the regular segments that fell entirely below the fold point. */
  override def commit(end: Offset): Unit = {
    val n = end.asInstanceOf[FilesOffset].n
    commitsSinceCompact += 1
    if (commitsSinceCompact >= compactInterval && n > filesBase) {
      val wm = watermark
      if (wm > Long.MinValue)
        seen = seen.filter { case (_, m) => m < 0 || m >= wm }
      val tmp = new Path(ledgerDir, f".$n%020d.compact.tmp")
      val out = ledgerFs.create(tmp, true)
      try {
        out.write(s"compact\t$n\n".getBytes(UTF_8))
        seen.foreach { case (p, m) => out.write(s"$m\t$p\n".getBytes(UTF_8)) }
      } finally out.close()
      val dst = new Path(ledgerDir, f"$n%020d.compact")
      require(ledgerFs.rename(tmp, dst), s"$name ledger compact failed: $dst")
      // regular segments ENTIRELY below the fold point are superseded, as
      // are older compacts; a segment straddling n must stay (its tail is
      // the uncommitted batch in flight). A crash mid-delete is healed at
      // replay (fully-below segments are skipped, not re-added).
      val (dead, live) = segMeta.partition { case (s, c) => s + c <= n }
      dead.foreach { case (s, _) =>
        try ledgerFs.delete(new Path(ledgerDir, f"$s%020d"), false)
        catch { case _: java.io.IOException => }
      }
      segMeta = live
      ledgerFs.listStatus(ledgerDir).foreach { s =>
        val sn = s.getPath.getName
        if (s.isFile && sn.endsWith(".compact") && sn < dst.getName)
          ledgerFs.delete(s.getPath, false)
      }
      files = files.drop((n - filesBase).toInt)
      filesBase = n
      commitsSinceCompact = 0
    }
  }

  override def stop(): Unit = ()
}

private[sources] object ArrivalLedgerStream {
  /** FileStreamSource's default: arrivals older than 7 days relative to
   *  the newest admitted file are ignored (and evictable). */
  val DefaultMaxFileAgeMs: Long = 7L * 24 * 3600 * 1000
  val DefaultCompactInterval: Int = 10

  /** "7d" / "12h" / "30m" / "45s" / "500ms" / bare milliseconds. */
  def parseDuration(s: String): Long = {
    val t = s.trim
    def num(suffix: String) = t.stripSuffix(suffix).trim.toLong
    if (t.endsWith("ms")) num("ms")
    else if (t.endsWith("d")) num("d") * 24 * 3600 * 1000
    else if (t.endsWith("h")) num("h") * 3600 * 1000
    else if (t.endsWith("m")) num("m") * 60 * 1000
    else if (t.endsWith("s")) num("s") * 1000
    else t.toLong
  }
}

/** `spark.read.format("graft-zip").load(lake)` — the seekable npz/zip
 *  inventory as a SQL table: one task per archive, two positioned reads,
 *  [[ZipShards.schema]] rows. */
class ZipShardSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-zip"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipShards.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-zip requires a path: spark.read.format(\"graft-zip\").load(lake)")
    new ZipShardTable(path)
  }
}

private[sources] class ZipShardTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-zip.`$path`"
  override def schema(): StructType = ZipShards.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      private def spark = SparkSession.active
      private val permissive = options.getBoolean("permissive", false)
      private def factory: PartitionReaderFactory =
        new ZipInventoryReaderFactory(
          new SerializableConfiguration(spark.sessionState.newHadoopConf()),
          permissive)
      override def build(): Scan = this
      override def readSchema(): StructType = ZipShards.schema
      override def description(): String = s"graft-zip $path (EOCD+CD positioned reads)"
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        ShardFiles.list(spark, path)
          .map(f => ZipArchivePartition(f._1, f._2): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory = factory
      // CONTINUOUS npz-lake ingest: each micro-batch is the INVENTORY of
      // newly-arrived bundles (two positioned reads per archive) under
      // the same arrival-ledger offsets as graft-tar — feed the rows into
      // ZipShards.fetchStored for the members a selection keeps
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ArrivalLedgerStream(spark, path, checkpointLocation, "graft-zip",
          factory, (p, l) => ZipArchivePartition(p, l),
          Option(options.get("maxFilesPerTrigger")).map(_.toInt),
          Option(options.get("pathGlobFilter")),
          options.getBoolean("latestFirst", false),
          ShardFiles.maxFileAgeMs(options), ShardFiles.compactInterval(options),
          options.getBoolean("agePruneDirs", false))
    }
}

private[sources] final case class ZipArchivePartition(path: String, len: Long)
    extends InputPartition

/** Per-archive inventory read; `permissive` quarantines a corrupt
 *  archive (inventory is all-or-nothing per bundle: a truncated CD must
 *  not surface a partial listing, so the WHOLE archive drops, logged). */
private[sources] class ZipInventoryReaderFactory(
    conf: SerializableConfiguration, permissive: Boolean = false)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ZipArchivePartition]
    new PartitionReader[InternalRow] {
      // FS open/stat failures are infra errors and fail the task even
      // under permissive — only corrupt DATA quarantines (the tar
      // reader's discipline): a transient s3 error on a healthy bundle
      // must RETRY, not silently drop the bundle forever
      private val hp = new Path(p.path)
      private val fs = hp.getFileSystem(conf.value)
      private val len = if (p.len >= 0) p.len else fs.getFileStatus(hp).getLen
      private var rows: Iterator[graft.functions.ZipHeaders.Entry] = _
      private var quarantined = false
      private var cur: graft.functions.ZipHeaders.Entry = _
      override def next(): Boolean =
        if (quarantined) false
        else try {
          if (rows == null) {
            val in = fs.open(hp)
            rows = try ZipShards.archiveEntries(in, p.path, len).iterator
                   finally in.close()
          }
          if (rows.hasNext) { cur = rows.next(); true } else false
        } catch {
          // data-shaped failures only: lying/corrupt structure
          // (IllegalArgumentException from the validation requires) or a
          // positioned read past the frozen length (EOFException —
          // truncated or partially-landed archive)
          case e @ (_: IllegalArgumentException | _: java.io.EOFException)
              if permissive =>
            System.err.println(
              s"[graft] quarantined corrupt archive (${p.path}): ${e.getMessage}")
            quarantined = true
            false
        }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(p.path), UTF8String.fromString(cur.name),
        cur.method, cur.compSize, cur.size, cur.localOff))
      override def close(): Unit = ()
    }
  }
}
