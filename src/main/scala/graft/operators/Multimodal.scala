package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with typed metadata; decode / feature-extraction steps
 * run per-partition over iterators (the Scala analog of `mapInPandas`
 * batch UDFs) so heavyweight decoders amortize initialization per partition,
 * not per row.
 *
 * Two layers with different honesty levels:
 *  - METADATA decode is REAL: container sniffing from magic bytes plus
 *    headers-only width/height/channels/format parsing of PNG/GIF/JPEG/BMP
 *    ([[graft.functions.ImageHeaders]], dependency-free, codegen'd).
 *  - PIXEL decode is REAL for PNG and BMP ([[graft.functions.ImagePixels]]:
 *    JDK Inflater, all five PNG filters, palette/gray/RGB/RGBA, both BMP
 *    row orders) — [[PixelDecoder]] is the default. Formats that genuinely
 *    need a codec library (JPEG/WebP entropy decode) stay behind the
 *    [[ImageDecoder]] seam: [[StubDecoder]] produces deterministic fake
 *    features for plumbing tests; swapping in a JNI/JavaCV decoder is a
 *    one-class change.
 *
 * Scale notes (100 TB of blobs):
 *  - Metadata extraction (length, hash, magic sniffing) is pure Column
 *    expression work: codegen, no shuffle.
 *  - Decode runs via `mapPartitions` with an iterator-to-iterator transform:
 *    no partition materialization, so memory is bounded by one blob at a
 *    time regardless of partition size.
 *  - Blob tables should be written with small row groups / `maxRecordsPerFile`
 *    so `spark.sql.files.maxPartitionBytes` yields balanced scan splits
 *    despite multi-MB rows.
 */
object Multimodal {

  /** Column-expression metadata over a binary column: byte length, sha256,
   *  and best-effort container sniffing from magic bytes. */
  def withBlobMetadata(df: DataFrame, blobCol: String): DataFrame = {
    val b = col(blobCol)
    val magic = hex(substring(b, 1, 4))
    df.withColumn("byte_len", length(b).cast("long"))
      .withColumn("sha256", sha2(b, 256))
      .withColumn("container",
        when(magic.startsWith("FFD8"), "jpeg")
          .when(magic.startsWith("89504E47"), "png")
          .when(magic.startsWith("47494638"), "gif")
          .when(magic.startsWith("424D"), "bmp")
          // RIFF splits by the form type at bytes 9-12: WEBP / WAVE / AVI<sp>
          .when(magic.startsWith("52494646"),
            when(hex(substring(b, 9, 4)) === "57454250", "webp")
              .when(hex(substring(b, 9, 4)) === "57415645", "wav")
              .when(hex(substring(b, 9, 4)) === "41564920", "avi")
              .otherwise("riff"))
          .when(magic.startsWith("494433"), "mp3_id3")
          .otherwise("unknown"))
  }

  /** REAL headers-only image dimensions over a binary column: adds
   *  width/height/channels/img_format parsed from PNG/GIF/JPEG/BMP leading
   *  bytes (null for unrecognized payloads) — no codec dependency, pure
   *  codegen ([[graft.functions.ImageDims]]). */
  def withImageDims(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("__dims", graft.functions.ImageDims(col(blobCol)))
      .withColumn("width", col("__dims.width"))
      .withColumn("height", col("__dims.height"))
      .withColumn("channels", col("__dims.channels"))
      .withColumn("img_format", col("__dims.format"))
      .drop("__dims")

  /** REAL headers-only WAV audio metadata over a binary column: adds
   *  channels/sample_rate/bits/n_frames/duration_ms parsed from the RIFF
   *  chunk walk (null for non-WAV payloads) — no codec dependency, pure
   *  codegen ([[graft.functions.AudioMeta]]). */
  def withAudioMeta(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("__am", graft.functions.AudioMeta(col(blobCol)))
      .withColumn("channels", col("__am.channels"))
      .withColumn("sample_rate", col("__am.sample_rate"))
      .withColumn("bits", col("__am.bits"))
      .withColumn("n_frames", col("__am.n_frames"))
      .withColumn("duration_ms", col("__am.duration_ms"))
      .drop("__am")

  /** REAL headers-only MP4 video metadata over a binary column: adds
   *  vbrand/vtimescale/vduration/vduration_ms from the ISO BMFF box walk
   *  (null for non-MP4 payloads) — [[graft.functions.VideoMeta]]. */
  def withVideoMeta(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("__vm", graft.functions.VideoMeta(col(blobCol)))
      .withColumn("vbrand", col("__vm.brand"))
      .withColumn("vtimescale", col("__vm.timescale"))
      .withColumn("vduration", col("__vm.duration"))
      .withColumn("vduration_ms", col("__vm.duration_ms"))
      .withColumn("vwidth", col("__vm.width"))
      .withColumn("vheight", col("__vm.height"))
      .drop("__vm")

  /** Decoded-image feature contract. */
  final case class ImageFeatures(width: Int, height: Int, channels: Int, meanLuma: Double)

  /** Pluggable decoder seam; null result = undecodable (rides along as
   *  null features, never an exception). */
  trait ImageDecoder extends Serializable {
    def decode(bytes: Array[Byte]): ImageFeatures
  }

  /** REAL decoder: PNG/BMP/GIF pixels via [[graft.functions.ImagePixels]]
   *  (JDK-only inflate + unfilter + LZW) and JPEG via the JDK's bundled
   *  ImageIO reader, channels from the container header, mean luma over
   *  the decoded grayscale. Null only for formats outside the JDK's
   *  reach (WebP/AVIF) — plug a codec-backed [[ImageDecoder]] for
   *  those. */
  object PixelDecoder extends ImageDecoder {
    override def decode(bytes: Array[Byte]): ImageFeatures = {
      val img = graft.functions.ImagePixels.decodeLuma(bytes)
      if (img == null) return null
      val dims = graft.functions.ImageHeaders.parse(bytes)
      var sum = 0L
      var i = 0
      while (i < img.luma.length) { sum += img.luma(i) & 0xff; i += 1 }
      ImageFeatures(img.width, img.height,
        if (dims == null) 1 else dims.channels,
        if (img.luma.isEmpty) 0.0 else sum.toDouble / img.luma.length / 255.0)
    }
  }

  /** Deterministic fake decoder: features derived from content bytes so
   *  plumbing tests are reproducible without any decodable payload.
   *  Clearly a stub — DO NOT ship. */
  object StubDecoder extends ImageDecoder {
    override def decode(bytes: Array[Byte]): ImageFeatures = {
      val h = graft.token.Murmur3Token.token(bytes)
      ImageFeatures(
        width = 64 + math.floorMod(h, 512).toInt,
        height = 64 + math.floorMod(h >> 9, 512).toInt,
        channels = 3,
        meanLuma = math.floorMod(h >> 18, 256).toDouble / 255.0)
    }
  }

  private val featSchema = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("mean_luma", DoubleType)))

  /**
   * Partition-wise decode: appends (width, height, channels, mean_luma).
   * Iterator-to-iterator (lazy) — constant memory per task.
   */
  def decodeImages(df: DataFrame, blobCol: String,
                   decoder: ImageDecoder = PixelDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ featSchema.fields)
    val idx = df.schema.fieldIndex(blobCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // null/undecodable blobs are data, not exceptions: null features
        val f = if (bytes == null) null else decoder.decode(bytes)
        if (f == null) Row.fromSeq(r.toSeq ++ Seq[Any](null, null, null, null))
        else {
          // Seq[Any] — a bare Seq(int, int, int, double) would widen the ints
          // to Double and break the encoder's INT fields
          Row.fromSeq(r.toSeq ++ Seq[Any](f.width, f.height, f.channels, f.meanLuma))
        }
      }
    }(enc)
  }

  /**
   * Frame sampling contract for video blobs: emit one row per sampled frame
   * index (0, stride, 2·stride, … capped at maxFrames). The decode of the
   * frame itself is the same stub seam. Explode happens AFTER metadata-only
   * planning so a 100 TB video table fans out without re-reading blobs.
   *
   * This variant is the container-agnostic FALLBACK: frame count
   * approximated from byte length. For MP4, [[sampleFramesMp4]] plans from
   * the REAL sample table.
   */
  def sampleFrames(df: DataFrame, blobCol: String, stride: Int, maxFrames: Int): DataFrame = {
    // Approximate frame count from byte length (container-agnostic fallback).
    val nFrames = least(greatest((length(col(blobCol)) / 1024).cast("int"), lit(1)), lit(10000))
    df.withColumn("frame_idx",
        explode(slice(sequence(lit(0), nFrames - 1, lit(stride)), 1, maxFrames)))
  }

  /**
   * REAL frame sampling for MP4 blobs: the frame count is the first video
   * track's `stsz` sample count ([[graft.functions.VideoFrames]] — the
   * codec-free fact the container itself records), so the sampled indexes
   * are exactly the frames a downstream decoder could seek. Non-MP4 /
   * video-less blobs contribute NO rows (null fan-out — undecodable is
   * data). Pure codegen expressions: zero shuffle, blobs read once.
   */
  def sampleFramesMp4(df: DataFrame, blobCol: String, stride: Int, maxFrames: Int): DataFrame = {
    require(stride > 0 && maxFrames > 0, s"need stride/maxFrames > 0")
    // cap the UNTRUSTED stsz count before sequence() materializes it: only
    // indexes below stride*maxFrames survive the slice anyway, and a lying
    // u32 count must not allocate a multi-GB array per row. least() skips
    // nulls, so guard it — a null (non-video) count must STAY null.
    val raw = graft.functions.VideoFrames(col(blobCol))
    val nFrames = when(raw.isNotNull, least(raw, lit(stride.toLong * maxFrames)))
    df.withColumn("frame_idx",
      explode(slice(
        when(nFrames > 0, sequence(lit(0L), nFrames - 1, lit(stride.toLong))),
        1, maxFrames)))
  }

  /**
   * Frame sampling by media TIME, not frame index: one row per `strideMs`
   * of playback, planned from the full sample tables — `stts` run-length
   * durations pick the sample playing at each stride boundary, `mdhd`
   * supplies the media timescale, and `stsc` + `stco`/`co64` +
   * `stsz`/`stz2` resolve each planned frame to the byte offset a decoder
   * would seek ([[graft.functions.VideoSamplePlan]]). Emits (frame_idx,
   * t_ms, byte_off) per sampled frame; byte_off is null when the offset
   * tables don't cover the sample. Non-MP4 / video-less blobs contribute
   * NO rows. Pure codegen planning — zero shuffle, blobs read once, cost
   * O(table runs + emitted frames) per blob regardless of claimed counts.
   */
  def sampleFramesMp4ByTime(
      df: DataFrame, blobCol: String, strideMs: Int, maxFrames: Int): DataFrame =
    df.withColumn("__fp",
        explode(graft.functions.VideoSamplePlan(col(blobCol), strideMs, maxFrames)))
      .withColumn("frame_idx", col("__fp.frame_idx"))
      .withColumn("t_ms", col("__fp.t_ms"))
      .withColumn("byte_off", col("__fp.byte_off"))
      .drop("__fp")

  /**
   * KEYFRAME sampling: one row per `stss` sync sample — the samples a
   * decoder can seek to without reading anything earlier, i.e. the real
   * "thumbnail per shot" / "split at keyframes" plan (arbitrary-time
   * extraction must decode forward from the preceding keyframe anyway).
   * When stss is absent every sample is a sync sample per ISO 14496-12
   * and the plan is the first `maxFrames` samples. Emits (frame_idx,
   * t_ms, byte_off) like [[sampleFramesMp4ByTime]]; non-MP4 / video-less
   * blobs contribute NO rows. Pure codegen planning — zero shuffle, cost
   * O(table runs + emitted frames) per blob.
   */
  def sampleKeyframesMp4(
      df: DataFrame, blobCol: String, maxFrames: Int): DataFrame =
    df.withColumn("__kf",
        explode(graft.functions.VideoKeyframes(col(blobCol), maxFrames)))
      .withColumn("frame_idx", col("__kf.frame_idx"))
      .withColumn("t_ms", col("__kf.t_ms"))
      .withColumn("byte_off", col("__kf.byte_off"))
      .drop("__kf")

  /**
   * KEYFRAME sampling for Matroska/WebM blobs — the Cues-index twin of
   * [[sampleKeyframesMp4]]: one row per CuePoint (t_ms, cluster_off),
   * the positions a player can seek to without scanning Clusters. Pure
   * codegen planning, zero shuffle; EBML documents without a Cues index
   * (and non-MKV blobs) contribute NO rows.
   */
  def sampleKeyframesMkv(
      df: DataFrame, blobCol: String, maxFrames: Int): DataFrame =
    df.withColumn("__kf",
        explode(graft.functions.MkvCuesExpr(col(blobCol), maxFrames)))
      .withColumn("t_ms", col("__kf.t_ms"))
      .withColumn("cluster_off", col("__kf.cluster_off"))
      .drop("__kf")

  /**
   * Silence-based audio segmentation (VAD-lite): one row per voiced
   * segment — a maximal sample run with no pause of `minSilenceMs` or
   * longer — with (seg_idx, start_ms, end_ms) boundaries. The ASR/TTS
   * pipeline step that turns hour-long recordings into trainable
   * utterances; pair with [[graft.functions.SubtitleCues]] to align
   * transcripts. Pure codegen per-row planning, zero shuffle; non-PCM16
   * blobs contribute NO rows.
   */
  def segmentAudio(df: DataFrame, blobCol: String, silenceBelow: Int,
      minSilenceMs: Int, maxSegments: Int): DataFrame =
    df.select(df.columns.map(col) :+
        posexplode(graft.functions.AudioSegmentsExpr(
          col(blobCol), silenceBelow, minSilenceMs, maxSegments))
          .as(Seq("seg_idx", "__seg")): _*)
      .withColumn("start_ms", col("__seg.start_ms"))
      .withColumn("end_ms", col("__seg.end_ms"))
      .drop("__seg")

  /**
   * WebDataset shard listing: one row per regular tar member with its
   * sample key (the basename up to the FIRST dot — WebDataset's grouping
   * rule: `000017.jpg` + `000017.cls` + `000017.json` are one training
   * sample) and extension. Pure header walk — no member is decompressed
   * or copied; pair with `groupBy(sample_key)` to validate shard
   * completeness or sample at the SAMPLE level before any decode.
   * Non-tar blobs contribute NO rows.
   */
  def webdatasetSamples(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("__e", explode(graft.functions.TarEntriesExpr(col(blobCol))))
      .filter(col("__e.type") === "file")
      .withColumn("sample_key",
        regexp_extract(col("__e.name"), SampleKeyRegex, 1))
      .withColumn("member_ext",
        regexp_extract(col("__e.name"), MemberExtRegex, 1))
      .withColumn("member_name", col("__e.name"))
      .withColumn("member_size", col("__e.size"))
      .drop("__e")

  /** WebDataset's base_plus_ext grouping rule, the ONE spelling shared by
   *  the blob-based [[webdatasetSamples]] and the streaming
   *  [[graft.sources.TarShards.readWebDataset]]: the sample key is the
   *  FULL path up to the first dot after the last slash (directories stay
   *  in the key — a/000001.jpg and b/000001.jpg are DIFFERENT samples),
   *  the extension is everything after that dot. */
  private[graft] val SampleKeyRegex = "^((?:.*/)?[^.]*)"
  private[graft] val MemberExtRegex = "^(?:.*/)?[^.]*\\.(.*)$"
}
