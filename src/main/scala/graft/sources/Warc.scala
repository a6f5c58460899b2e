package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * WARC / WET ingestion and export — the formats web-scale corpora actually
 * ship in (Common Crawl's raw crawls are WARC; its extracted-text releases
 * are WET, which is WARC with `WARC-Type: conversion` text records).
 *
 * At-scale contract (the Common Crawl layout is the design point):
 *
 *  - **File-level parallelism, streaming within a file.** A crawl is tens
 *    of thousands of ~1 GB `.warc.gz` files; one task streams one file
 *    with O(record) memory (`Content-Length`-framed reads — never a
 *    whole-file buffer). Record framing is NOT line-delimited, so a file
 *    cannot be split mid-stream the way JSONL can; parallelism comes from
 *    file count, which the crawl layout provides by construction. This is
 *    one of the rare genuinely imperative per-partition reads, hence
 *    `binaryFiles` + iterator rather than a DataFrame reader.
 *  - **Multi-member gzip.** Common Crawl gzips each record as its own
 *    member; `GZIPInputStream` consumes concatenated members natively, so
 *    the same code path reads per-record-gzip, whole-file-gzip, and plain
 *    files (gzip detected by magic bytes, not extension).
 *  - **FAILFAST** ([[Ingest]] discipline): a malformed record aborts with
 *    the file and record index in the error — at corpus scale, silently
 *    skipped records are unnoticed data loss.
 *
 * The payload is length-delimited, so record content containing
 * `WARC/1.0` lines, CRLFs, or arbitrary binary never confuses framing,
 * and `Content-Length` counts BYTES — multi-byte UTF-8 text round-trips
 * exactly (q124 pins this with an identity oracle).
 */
object Warc {

  /** One parsed WARC record; `payload` is the raw Content-Length bytes. */
  case class WarcRecord(
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      payload: Array[Byte])

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  /** Records larger than this abort the read: a Content-Length beyond it
   *  is a corrupt header, not a real payload (WET records are ~KB-MB). */
  val maxRecordBytes: Long = 1L << 30

  /** Read every WARC record under `path` (files, dirs, globs — anything
   *  `binaryFiles` accepts). One task per file; payload stays binary. */
  def read(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    val parts = if (minPartitions > 0) minPartitions
                else spark.sparkContext.defaultMinPartitions
    val rows = spark.sparkContext.binaryFiles(path, parts).flatMap {
      case (file, stream) => records(stream.open(), file).map(r =>
        Row(r.warc_type, r.record_id, r.target_uri, r.warc_date,
          r.content_type, r.payload))
    }
    spark.createDataFrame(rows, schema)
  }

  /** WET view: the `conversion` (extracted-text) records, payload decoded
   *  as UTF-8 — the Common Crawl WET contract. Non-text records
   *  (`warcinfo`, `request`, `response`, ...) are filtered out. */
  def readWet(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame =
    read(spark, path, minPartitions)
      .filter(col("warc_type") === "conversion")
      .selectExpr("record_id", "target_uri", "warc_date",
        "decode(payload, 'UTF-8') AS text")

  /**
   * Export a corpus as WET: one `part-NNNNN.wet[.gz]` file per non-empty
   * partition of `df`, written task-side through the Hadoop FileSystem API
   * (HDFS/S3/local all work). With `gzip = true` each record is its own
   * gzip member (the Common Crawl layout — Java's gzip header is
   * byte-deterministic, MTIME 0). `date` must be supplied by the caller so
   * output is deterministic; a null URI or text aborts the write (FAILFAST
   * — exporting a null document is data loss, not a formatting choice).
   */
  def writeWet(
      df: DataFrame,
      uriCol: String,
      textCol: String,
      dir: String,
      gzip: Boolean = true,
      date: String = "2026-01-01T00:00:00Z"): Unit = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(root)
    df.select(col(uriCol).cast("string"), col(textCol).cast("string"))
      .foreachPartition { it: Iterator[Row] =>
        if (it.hasNext) {
          val pid = TaskContext.getPartitionId()
          val ext = if (gzip) ".wet.gz" else ".wet"
          val p = new Path(dir, f"part-$pid%05d$ext")
          val out = p.getFileSystem(bc.value.value).create(p, true)
          try {
            it.foreach { row =>
              val uri = row.getString(0)
              val text = row.getString(1)
              require(uri != null && text != null,
                s"writeWet needs non-null $uriCol and $textCol: " +
                  s"got ($uri, ${if (text == null) "null" else "text"}) — " +
                  "filter or fill nulls explicitly before export")
              val body = text.getBytes(UTF_8)
              val header =
                ("WARC/1.0\r\n" +
                  "WARC-Type: conversion\r\n" +
                  s"WARC-Target-URI: $uri\r\n" +
                  s"WARC-Date: $date\r\n" +
                  s"WARC-Record-ID: <urn:graft:wet:$uri>\r\n" +
                  "Content-Type: text/plain\r\n" +
                  s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
              if (gzip) {
                val gz = new GZIPOutputStream(out, 1 << 16)
                gz.write(header); gz.write(body)
                gz.write("\r\n\r\n".getBytes(UTF_8))
                gz.finish()
              } else {
                out.write(header); out.write(body)
                out.write("\r\n\r\n".getBytes(UTF_8))
              }
            }
          } finally out.close()
        }
      }
  }

  /**
   * The HTTP body of a raw WARC `response` record payload: Common Crawl
   * response records wrap the fetched document in the full HTTP response
   * (status line + headers + CRLFCRLF + body); this splits at the FIRST
   * `\r\n\r\n` — later CRLF pairs belong to the body — and, when the
   * header block declares `Transfer-Encoding: chunked`, reassembles the
   * chunk-data spans (hex size lines and per-chunk CRLFs removed, trailers
   * dropped). A payload with no separator (already bare, or a header-only
   * 304) passes through whole. Codegen'd native expression
   * ([[graft.functions.HttpBodyExtract]] — the de-chunk walk is a
   * data-dependent loop no built-in composition expresses); compose with
   * [[graft.operators.TextAnalysis.stripHtml]] for the raw-crawl →
   * plain-text chain (q129 oracles the split+strip composition
   * closed-form; q135 oracles the de-chunk round trip). The walk runs on
   * the raw payload BYTES and decodes UTF-8 only after reassembly — chunk
   * sizes count bytes, and a codepoint split across chunks must rejoin
   * before decode.
   */
  def httpBody(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.HttpBodyExtract(payload)

  /**
   * Streaming WET ingestion: a Structured Streaming source over a
   * directory where WET shards arrive (the continuous-crawl deployment —
   * new `.wet.gz` files land, each micro-batch parses the new arrivals).
   * Built on Spark's `binaryFile` file-streaming source, so discovery,
   * exactly-once file tracking, and `maxFilesPerTrigger` throttling are
   * the engine's own; the parse is the same FAILFAST record walk as
   * [[read]]. Feed the result straight into
   * [[graft.streaming.EventStreams.dedupIngestStream]] for the full
   * ingest-and-dedup loop (spec-proven composition).
   *
   * One honest difference from the batch reader: `binaryFile` delivers a
   * whole file per row, so a shard is held in memory while parsed —
   * size streaming shards like micro-batches (MBs), not like the 1 GB
   * archival files the batch path streams through.
   */
  def readWetStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binarySchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(binarySchema).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        records(new java.io.ByteArrayInputStream(bytes), path)
          .filter(_.warc_type == "conversion")
          .map(r => (r.record_id, r.target_uri, r.warc_date,
            new String(r.payload, UTF_8)))
      }
      .toDF("record_id", "target_uri", "warc_date", "text")
  }

  /** Streaming record iterator over one (possibly multi-member-gzip) WARC
   *  stream. O(record) memory; FAILFAST with `source` + record index. */
  def records(in0: InputStream, source: String): Iterator[WarcRecord] = {
    val buffered = new BufferedInputStream(in0, 1 << 16)
    buffered.mark(2)
    val m1 = buffered.read(); val m2 = buffered.read()
    buffered.reset()
    val in: InputStream =
      if (m1 == 0x1f && m2 == 0x8b) new GZIPInputStream(buffered, 1 << 16)
      else buffered

    new Iterator[WarcRecord] {
      private var idx = 0
      private var nextRec: WarcRecord = _
      private var done = false

      private def fail(msg: String): Nothing =
        throw new IllegalArgumentException(
          s"malformed WARC ($source, record $idx): $msg")

      private def advance(): Unit = {
        if (done || nextRec != null) return
        // skip the \r\n\r\n record separators (empty lines) between records
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) { done = true; in.close(); return }
        if (!line.startsWith("WARC/")) fail(s"expected WARC/ version line, got '$line'")
        val headers = scala.collection.mutable.Map.empty[String, String]
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i < 0) fail(s"header line without ':': '$h'")
          headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
          h = readLine(in)
        }
        if (h == null) fail("EOF inside record headers")
        val len = headers.getOrElse("content-length", fail("missing Content-Length"))
        val n = try len.toLong catch {
          case _: NumberFormatException => fail(s"bad Content-Length '$len'")
        }
        if (n < 0 || n > maxRecordBytes) fail(s"unreasonable Content-Length $n")
        val payload = new Array[Byte](n.toInt)
        var off = 0
        while (off < payload.length) {
          val r = in.read(payload, off, payload.length - off)
          if (r < 0) fail(s"EOF in payload at byte $off of $n")
          off += r
        }
        nextRec = WarcRecord(
          headers.getOrElse("warc-type", null),
          headers.getOrElse("warc-record-id", null),
          headers.getOrElse("warc-target-uri", null),
          headers.getOrElse("warc-date", null),
          headers.getOrElse("content-type", null),
          payload)
        idx += 1
      }

      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new EOFException(s"no more WARC records in $source")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Read one header/content line as raw bytes up to `\n`, strip the
   *  trailing `\r`, decode UTF-8. Byte-level so a following binary payload
   *  is never consumed by a char decoder. Returns null at EOF. */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var b = in.read()
    if (b == -1) return null
    while (b != -1 && b != '\n') { buf.write(b); b = in.read() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
            else bytes.length
    new String(bytes, 0, n, UTF_8)
  }
}
