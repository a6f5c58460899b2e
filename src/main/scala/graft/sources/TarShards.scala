package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import graft.functions.TarHeaders
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * STREAMING tar / WebDataset shard source — the scale-true twin of the
 * in-row blob expressions ([[graft.functions.TarEntriesExpr]] /
 * [[graft.operators.Multimodal.webdatasetSamples]]). A Spark BinaryType
 * value is a Java byte array with a hard 2 GB cap, and the standard
 * WebDataset shard is sized 1-4 GB precisely so sequential shard reads
 * saturate storage — so whole-shard blobs cannot represent real shards
 * at all, and even sub-cap shards pay blob + decode copies per touched
 * expression. This source follows [[Warc]]'s shape instead:
 *
 *  - **File-level parallelism, streaming within a file.** One task
 *    streams one shard with O(member) memory — 512-byte header blocks
 *    are read off the (possibly decompressing) stream and only the ONE
 *    current member's payload is ever materialized. A lake of 10k x 2 GB
 *    shards runs 10k parallel tasks, none holding more than the largest
 *    member. Tar framing is header-offset-chained (not splittable
 *    mid-file, like WARC), so parallelism comes from shard count — which
 *    the WebDataset layout provides by construction.
 *  - **Compression by magic bytes, not extension**: plain, gzip
 *    (`.tar.gz`, multi-member streams decode natively) and zstd
 *    (`.tar.zst` via the zstd-jni already on the Spark classpath).
 *  - **FAILFAST** ([[Ingest]] discipline): a corrupt header or an
 *    over-cap member aborts with the shard path and member index. The
 *    blob EXPRESSIONS end the walk silently (a listing over untrusted
 *    bytes must not throw); a SOURCE feeding ingestion must not lose
 *    data silently — the [[Warc]] split exactly.
 *
 * Header semantics (checksum gate, POSIX-vs-old-GNU prefix handling,
 * octal/base-256 sizes, GNU 'L' longnames, PAX 'x' path overrides) are
 * shared with the blob walk through [[TarHeaders.headerAt]], so the two
 * surfaces cannot diverge — q242 proves streamed ≡ blob-based on the
 * same shards.
 */
object TarShards {

  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("member_name", StringType, nullable = false),
    StructField("member_size", LongType, nullable = false),
    StructField("byte_off", LongType, nullable = false),
    StructField("member_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** One streamed member; `byteOff` is the payload offset within the
   *  UNCOMPRESSED shard stream (identical to [[TarHeaders.entries]]'
   *  offsets); `payload` is null for non-file entries (dirs, links). */
  final case class TarMember(
      shard: String, name: String, size: Long, byteOff: Long,
      typ: String, payload: Array[Byte])

  /** Members larger than this abort the read: the per-task memory bound.
   *  WebDataset members are KB-MB; a multi-GB member inside a shard is a
   *  layout error, not a payload. */
  val maxMemberBytesDefault: Long = 1L << 30

  /** Read every tar member under `path` (files, dirs, globs — anything
   *  `binaryFiles` accepts). One task per shard; payloads stay binary.
   *  With `withPayload = false` the walk SKIPS every payload: an
   *  inventory pass over a shard lake costs header reads only (512 B per
   *  member through the decompressor), no payload copies — pair with
   *  [[fetchMembers]] to seek-read just the members a sample selection
   *  keeps. */
  def read(spark: SparkSession, path: String, minPartitions: Int = 0,
      maxMemberBytes: Long = maxMemberBytesDefault,
      withPayload: Boolean = true): DataFrame = {
    val parts = if (minPartitions > 0) minPartitions
                else spark.sparkContext.defaultMinPartitions
    val cap = maxMemberBytes
    val wp = withPayload
    val rows = spark.sparkContext.binaryFiles(path, parts).flatMap {
      case (file, stream) => members(stream.open(), file, cap, wp).map(m =>
        Row(m.shard, m.name, m.size, m.byteOff, m.typ, m.payload))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Payload-free member inventory — the 100 TB entry point: list every
   *  member of every shard reading only headers, then select samples and
   *  [[fetchMembers]] the survivors. */
  def inventory(spark: SparkSession, path: String,
      minPartitions: Int = 0): DataFrame =
    read(spark, path, minPartitions, withPayload = false)

  /**
   * Ranged member fetch: resolve (shard, byte_off, member_size) rows —
   * an [[inventory]] selection — to their payload bytes via positioned
   * FS reads, appending a `payload` column. Rows are co-located by shard
   * and ordered by offset inside each task, so one shard is opened once
   * and read near-sequentially; only the SELECTED members' bytes ever
   * move. Valid for UNCOMPRESSED shards only (byte_off addresses the
   * raw stream; gzip/zstd shards can't be seek-read — stream those with
   * [[read]] instead).
   */
  def fetchMembers(df: DataFrame, shardCol: String = "shard",
      offCol: String = "byte_off", sizeCol: String = "member_size",
      maxMemberBytes: Long = maxMemberBytesDefault,
      saltRangeBytes: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    // an inventory frame carries a null payload placeholder — replace it
    val base = if (df.columns.contains("payload")) df.drop("payload") else df
    val outSchema = StructType(base.schema.fields :+
      StructField("payload", BinaryType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val si = base.schema.fieldIndex(shardCol)
    val oi = base.schema.fieldIndex(offCol)
    val zi = base.schema.fieldIndex(sizeCol)
    val cap = maxMemberBytes
    // hot-shard salting: a selection concentrated in ONE giant shard
    // serializes behind one task when keyed by shard alone; an
    // offset-RANGE salt fans it across tasks while keeping each task's
    // reads contiguous and offset-ordered (open-per-salt-range is the
    // documented cost — pick ranges >= a few hundred MB). The partition
    // count is pinned explicitly: the shuffled rows are tiny METADATA
    // (payloads are fetched, not shuffled), so AQE would coalesce the
    // "small" partitions back into one task and defeat the salt
    val keyed =
      if (saltRangeBytes > 0)
        base.repartition(spark.sessionState.conf.numShufflePartitions,
          col(shardCol), floor(col(offCol) / lit(saltRangeBytes)))
      else base.repartition(col(shardCol))
    keyed.sortWithinPartitions(col(shardCol), col(offCol))
      .mapPartitions { rows =>
        var curPath: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          if (in != null) try in.close() catch { case _: java.io.IOException => }
        }
        rows.map { r =>
          val p = r.getString(si)
          val off = r.getLong(oi)
          val n = r.getLong(zi)
          require(n >= 0 && n <= cap && n <= Int.MaxValue,
            s"member of $n bytes exceeds cap $cap ($p @ $off)")
          if (p != curPath) {
            if (in != null) in.close()
            val hp = new org.apache.hadoop.fs.Path(p)
            in = hp.getFileSystem(bc.value.value).open(hp)
            curPath = p
            // byte_off addresses the UNCOMPRESSED stream; a positioned
            // read of a compressed shard would return garbage silently —
            // FAILFAST on the magic instead (stream those with read())
            val magic = new Array[Byte](4)
            in.readFully(0L, magic)
            require(!((magic(0) & 0xff) == 0x1f && (magic(1) & 0xff) == 0x8b) &&
              !graft.functions.ZstdBytes.isZstd(magic),
              s"fetchMembers needs UNCOMPRESSED shards (offsets address the " +
                s"raw stream); $p is gzip/zstd — use TarShards.read to stream it")
          }
          val buf = new Array[Byte](n.toInt)
          in.readFully(off, buf)
          Row.fromSeq(r.toSeq :+ buf)
        }
      }(enc)
  }

  /** WebDataset view: regular-file members with their sample key (the
   *  path up to the first dot after the last slash — WebDataset's
   *  base_plus_ext grouping rule, the same spelling as the blob-based
   *  [[graft.operators.Multimodal.webdatasetSamples]]) and extension.
   *  `groupBy(shard, sample_key)` assembles training samples without a
   *  shuffle of anything but the grouped columns. */
  def readWebDataset(spark: SparkSession, path: String, minPartitions: Int = 0,
      maxMemberBytes: Long = maxMemberBytesDefault): DataFrame =
    read(spark, path, minPartitions, maxMemberBytes)
      .filter(col("member_type") === "file")
      .withColumn("sample_key", regexp_extract(col("member_name"),
        graft.operators.Multimodal.SampleKeyRegex, 1))
      .withColumn("member_ext", regexp_extract(col("member_name"),
        graft.operators.Multimodal.MemberExtRegex, 1))

  /**
   * STRUCTURED STREAMING shard arrival: a micro-batch source over a
   * directory where WebDataset shards land (the continuous-ingest
   * deployment — new `.tar[.gz|.zst]` files arrive, each micro-batch
   * parses the new arrivals into member rows with sample keys). Rides
   * the `graft-tar` DSv2 source ([[ArrivalLedgerStream]]): the offset ledger
   * is the arrival-file list (durable under the checkpoint, the
   * [[GraftCdfStream]] version=offset pattern), so file tracking is
   * exactly-once and replays plan the exact same shards — and each shard
   * is parsed by the SAME O(member)-memory streaming walk as the batch
   * path, so standard 1-4 GB WebDataset shards are admissible on the
   * CONTINUOUS path too (no whole-shard row ever exists). Throttle
   * backlogs with `options = Map("maxFilesPerTrigger" -> ...)`. Feed the
   * result into [[graft.streaming.EventStreams.dedupIngestStream]]-style
   * loops for ingest-and-dedup (spec-proven composition).
   *
   * A corrupt shard under the default FAILFAST is a POISON PILL: the
   * failed micro-batch replays against the same ledger range on every
   * restart, so remediation means repairing the file in place.
   * `permissive = true` instead keeps each shard's members parsed up to
   * the first corruption — including decompressor-level gzip/zstd
   * corruption — and drops the rest of THAT shard (logged): the
   * quarantine mode a continuous-ingest deployment usually wants.
   */
  def readWebDatasetStream(spark: SparkSession, dir: String,
      maxMemberBytes: Long = maxMemberBytesDefault,
      options: Map[String, String] = Map.empty,
      permissive: Boolean = false): DataFrame =
    spark.readStream.format("graft-tar").options(options)
      .option("maxMemberBytes", maxMemberBytes.toString)
      .option("permissive", permissive.toString)
      .load(dir)
      .filter(col("member_type") === "file")
      .drop("member_type")
      .withColumn("sample_key", regexp_extract(col("member_name"),
        graft.operators.Multimodal.SampleKeyRegex, 1))
      .withColumn("member_ext", regexp_extract(col("member_name"),
        graft.operators.Multimodal.MemberExtRegex, 1))

  val manifestSchema: StructType = ShardExport.manifestSchema

  /**
   * WebDataset shard EXPORT — the write leg of the curation loop
   * (ingest → dedup/filter/sample → write the kept samples back as
   * size-capped `.tar` shards a training loader streams sequentially):
   *
   *  - **Sample integrity**: rows sharing `keyCol` are one training
   *    sample and NEVER split across shards — binning happens at sample
   *    boundaries only (WebDataset's grouping rule). A shard closes at
   *    the first sample boundary after `targetShardBytes`, so files run
   *    at most one sample past the target.
   *  - **One shuffle**: hash-repartition by sample key (`shardPartitions`
   *    tasks — size it so a partition's bytes / target ≈ a few shards per
   *    task), sort by (key, member name) within each, then each task
   *    streams its bins straight to `dir` with O(member) memory. Headers
   *    come from [[graft.functions.ArchiveCodec.tarHeader]] — the SAME
   *    ustar layout every graft parser is spec'd against; names past
   *    ustar's 100-byte field travel as PAX `path` overrides (URL-shaped
   *    sample keys), which the parsers honor.
   *  - **Deterministic + attempt-isolated**: shard file =
   *    `part-<partition>-<bin>.tar`, and the (partition, bin, content)
   *    assignment is a pure function of the input; each attempt writes to
   *    an attempt-unique dot-temp and RENAMES at close, so a speculative
   *    or zombie attempt can never surface a partially-written file under
   *    the final name — retries and speculation are idempotent.
   *
   * `compression` wraps each shard in gzip or zstd (`.tar.gz` /
   * `.tar.zst` — what [[read]] and the blob walks already sniff by
   * magic); the size target measures UNCOMPRESSED tar bytes, the stable
   * measure a loader's decompressor sees. Returns the write MANIFEST:
   * one row per shard (shard, n_members, n_samples, bytes) — `bytes` is
   * the exact ON-DISK file size.
   */
  def writeShards(df: DataFrame, dir: String,
      keyCol: String = "sample_key", nameCol: String = "member_name",
      payloadCol: String = "payload",
      targetShardBytes: Long = 1L << 30,
      shardPartitions: Int = 0,
      compression: String = "none",
      overwrite: Boolean = false): DataFrame = {
    require(targetShardBytes > 0, "targetShardBytes must be positive")
    val ext = compression match {
      case "none" => "tar"
      case "gzip" => "tar.gz"
      case "zstd" => "tar.zst"
      case other => throw new IllegalArgumentException(
        s"compression must be none/gzip/zstd, got $other")
    }
    val comp = compression
    ShardExport.writeParts(df, dir, keyCol, nameCol, payloadCol,
      targetShardBytes, shardPartitions, ext, overwrite,
      "writeShards")(() => new TarPartFormat(comp))
  }

  /** Tar member blocks over an optional gzip/zstd compressor; the
   *  binning measure is UNCOMPRESSED tar bytes (headers + payload +
   *  padding), the stable measure a loader's decompressor sees. */
  private final class TarPartFormat(compression: String)
      extends ShardExport.PartFormat {
    private var out: java.io.OutputStream = _
    private var bytes = 0L
    override def open(raw: org.apache.hadoop.fs.FSDataOutputStream,
        finalName: String): Unit = {
      bytes = 0L
      out = compression match {
        case "gzip" => new java.util.zip.GZIPOutputStream(raw, 1 << 16)
        case "zstd" => new java.io.BufferedOutputStream(
          new com.github.luben.zstd.ZstdOutputStreamNoFinalizer(raw), 1 << 16)
        case _ => raw
      }
    }
    override def append(name: String, payload: Array[Byte]): Unit = {
      // names past ustar's 100-byte field travel as a PAX 'x' extended
      // header with a `path` override — web-crawled sample keys (URLs)
      // routinely exceed 100 bytes, and truncation would collide
      // members; the graft parsers already honor PAX
      val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (nameBytes.length > 100) {
        val pax = graft.functions.ArchiveCodec.paxPayload(name)
        out.write(graft.functions.ArchiveCodec.tarHeader(
          "paxheader", pax.length, 'x'))
        out.write(pax)
        val paxPad = (512 - pax.length % 512) % 512
        if (paxPad > 0) out.write(new Array[Byte](paxPad))
        bytes += 512L + pax.length + paxPad
      }
      val baseName =
        if (nameBytes.length > 100)
          new String(nameBytes, 0, 100,
            java.nio.charset.StandardCharsets.ISO_8859_1)
        else name
      out.write(graft.functions.ArchiveCodec.tarHeader(
        baseName, payload.length, '0'))
      out.write(payload)
      val pad = (512 - payload.length % 512) % 512
      if (pad > 0) out.write(new Array[Byte](pad))
      bytes += 512L + payload.length + pad
    }
    override def measure: Long = bytes
    override def finish(): Unit = {
      out.write(new Array[Byte](1024)) // two zero end blocks
      out.close()
      out = null
    }
  }

  /**
   * STREAMING shard export — the write leg of the CONTINUOUS curation
   * loop (arrival ingest → dedup/filter → shard export, q247-style):
   * each micro-batch exports through [[writeShards]] into its own
   * `batch=<batchId>` subdirectory, so batch REPLAYS are idempotent by
   * construction — a replayed batch has identical input rows
   * (exactly-once source), lands in the same subdirectory with
   * `overwrite = true` (stale part files from a half-finished attempt
   * are cleared first), and deterministic (partition, bin) names
   * reproduce identical files. Readers take the whole lake with one
   * recursive listing (`spark.read.format("graft-tar").load(dir)` or
   * `readWebDataset(spark, dir + "/batch=STAR/STAR")` — STAR = asterisk) — `batch=` dirs are just
   * dated-layout subdirectories to every graft reader.
   *
   * Each batch's manifest persists as parquet under `dir/.manifests/
   * batch=<batchId>` (dot-prefixed: invisible to shard globs and the
   * recursive listers), mode=overwrite for the same replay idempotency.
   * Returns the started [[StreamingQuery]].
   */
  def writeShardsStream(df: DataFrame, dir: String, checkpointLocation: String,
      keyCol: String = "sample_key", nameCol: String = "member_name",
      payloadCol: String = "payload",
      targetShardBytes: Long = 1L << 30,
      shardPartitions: Int = 0,
      compression: String = "none"): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val manifest = writeShards(batch, s"$dir/batch=$batchId",
          keyCol, nameCol, payloadCol, targetShardBytes, shardPartitions,
          compression, overwrite = true)
        // writing the manifest EXECUTES the export (writeShards is lazy)
        // and persists it replay-idempotently in one stroke
        manifest.write.mode("overwrite")
          .parquet(s"$dir/.manifests/batch=$batchId")
      }
      .start()

  /** Streaming member iterator over one (possibly gzip/zstd-compressed)
   *  tar stream. O(member) memory; FAILFAST with `source` + member
   *  index. Exposed for direct use (and the multi-GB generator specs).
   *  `keep` is the PUSHED member predicate (null = keep all): evaluated
   *  on (resolved name, type) right after the header, BEFORE the payload
   *  is touched — a non-matching member's payload is `skip`ped (a real
   *  seek on uncompressed FS streams), so a pushed name filter costs
   *  only the selected members' bytes. The over-cap guard gates only
   *  payloads actually materialized. */
  def members(in0: InputStream, source: String,
      maxMemberBytes: Long = maxMemberBytesDefault,
      withPayload: Boolean = true,
      taskCleanup: Boolean = true,
      keep: (String, String) => Boolean = null): Iterator[TarMember] = {
    require(maxMemberBytes > 0 && maxMemberBytes < Int.MaxValue,
      s"maxMemberBytes must fit a byte array, got $maxMemberBytes")
    val buffered = new BufferedInputStream(in0, 1 << 16)
    buffered.mark(4)
    val m = new Array[Byte](4)
    val got = readAtMost(buffered, m, 4)
    buffered.reset()
    val in: InputStream =
      if (got >= 2 && (m(0) & 0xff) == 0x1f && (m(1) & 0xff) == 0x8b)
        new GZIPInputStream(buffered, 1 << 16)
      // the shared sniff accepts skippable-frame prefixes (pzstd) too
      else if (got >= 4 && graft.functions.ZstdBytes.isZstd(m))
        new BufferedInputStream(
          new com.github.luben.zstd.ZstdInputStreamNoFinalizer(buffered), 1 << 16)
      else buffered

    // a task that abandons the iterator mid-shard (limit/take pushdown)
    // or aborts on FAILFAST must not leak the FS handle + decompressor
    // until executor teardown — close at task completion. Callers whose
    // stream wraps an in-memory buffer (the micro-batch path) pass
    // taskCleanup = false: a completion listener would strongly pin
    // every parsed shard's byte array until task end, turning a
    // many-shard first batch into an OOM
    val tc = org.apache.spark.TaskContext.get()
    if (taskCleanup && tc != null) tc.addTaskCompletionListener[Unit] { _ =>
      try in.close() catch { case _: java.io.IOException => }
    }

    new Iterator[TarMember] {
      private val block = new Array[Byte](512)
      private var pos = 0L // uncompressed stream offset
      private var idx = 0
      private var pendingLongName: String = null
      private var pendingPaxPath: String = null
      private var nextRec: TarMember = _
      private var done = false

      private def fail(msg: String): Nothing = {
        try in.close() catch { case _: java.io.IOException => }
        throw new IllegalArgumentException(
          s"malformed tar ($source, member $idx): $msg")
      }

      private def advance(): Unit = {
        while (!done && nextRec == null) {
          val got = readAtMost(in, block, 512)
          if (got == 0) { done = true; in.close(); return } // clean EOF
          if (got < 512) fail(s"EOF inside header block at offset $pos")
          if (block(0) == 0) { done = true; in.close(); return } // end block
          val h = TarHeaders.headerAt(block, 0)
          if (h == null) fail(s"header checksum/size failed at offset $pos")
          val dataStart = pos + 512
          val pad = (512 - h.size % 512) % 512
          if (h.typ == 'L') {
            if (h.size > 4096) fail(s"longname of ${h.size} bytes")
            val nameB = new Array[Byte](h.size.toInt)
            readFully(in, nameB, fail)
            pendingLongName = TarHeaders.longName(nameB, 0, nameB.length)
            skipFully(in, pad, fail)
          } else if (h.typ == 'x' || h.typ == 'g') {
            if (h.size > (1 << 16)) fail(s"PAX header of ${h.size} bytes")
            val paxB = new Array[Byte](h.size.toInt)
            readFully(in, paxB, fail)
            if (h.typ == 'x')
              pendingPaxPath = TarHeaders.paxPathOf(paxB, 0, paxB.length)
            skipFully(in, pad, fail)
          } else {
            val name =
              if (pendingPaxPath != null) pendingPaxPath
              else if (pendingLongName != null) pendingLongName
              else h.name
            pendingLongName = null
            pendingPaxPath = null
            val typeName = TarHeaders.typeName(h.typ)
            val matches = keep == null || keep(name, typeName)
            // the cap is the per-task MEMORY bound, so it gates only
            // materialized payloads — an inventory pass (withPayload =
            // false) or a filtered-out member allocates nothing
            if (withPayload && matches && h.size > maxMemberBytes)
              fail(s"member of ${h.size} bytes exceeds cap $maxMemberBytes — " +
                "raise maxMemberBytes if the layout is intentional")
            val payload =
              if (typeName == "file" && withPayload && matches) {
                val p = new Array[Byte](h.size.toInt)
                readFully(in, p, fail)
                p
              } else { skipFully(in, h.size, fail); null }
            skipFully(in, pad, fail)
            if (name.nonEmpty && matches) {
              nextRec = TarMember(source, name, h.size, dataStart, typeName, payload)
              idx += 1
            }
          }
          pos = dataStart + h.size + pad
        }
      }

      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): TarMember = {
        advance()
        if (nextRec == null) throw new EOFException(s"no more tar members in $source")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Read up to `n` bytes (short only at EOF). */
  private def readAtMost(in: InputStream, buf: Array[Byte], n: Int): Int = {
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) return off
      off += r
    }
    off
  }

  private def readFully(in: InputStream, buf: Array[Byte],
      fail: String => Nothing): Unit = {
    val got = readAtMost(in, buf, buf.length)
    if (got < buf.length) fail(s"EOF in payload at byte $got of ${buf.length}")
  }

  private def skipFully(in: InputStream, n: Long, fail: String => Nothing): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else {
        // skip() may legally return 0 (gzip streams do); fall back to read
        if (in.read() < 0) fail(s"EOF while skipping $left of $n bytes")
        left -= 1
      }
    }
  }
}
