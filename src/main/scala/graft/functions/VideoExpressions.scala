package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Headers-only video container metadata: real, dependency-free parsing of
 * the PUBLIC ISO BMFF (MP4) box layout — top-level box walk to `moov`, then
 * `mvhd` (version 0 or 1) for timescale and duration — completing the
 * image/audio/video metadata trio ([[ImageHeaders]], [[AudioHeaders]]).
 * Frame/sample decode stays behind the multimodal seam.
 *
 * The box walk is bounds-checked; 64-bit extended sizes, lying sizes and
 * truncation all return null, never an exception or a loop.
 */
object Mp4Headers {

  /** width/height are the integer part of tkhd's 16.16 fixed-point fields
   *  from the FIRST track; -1 when the moov carries no trak/tkhd (surfaced
   *  as SQL null). */
  final case class Mp4Meta(
      brand: String, timescale: Long, duration: Long, durationMs: Long,
      width: Int, height: Int)

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def beU64(b: Array[Byte], i: Int): Long =
    (beU32(b, i) << 32) | beU32(b, i + 4)
  private def boxType(b: Array[Byte], i: Int): String =
    new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def parse(b: Array[Byte]): Mp4Meta = {
    if (b == null || b.length < 16) return null
    if (boxType(b, 0) != "ftyp") return null
    val brand = new String(b, 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // walk top-level boxes for moov
    var i = 0
    var moov = -1
    var moovEnd = -1L
    while (i + 8 <= b.length && moov < 0) {
      var size = beU32(b, i)
      var hdr = 8
      if (size == 1L) { // 64-bit extended size
        if (i + 16 > b.length) return null
        size = beU64(b, i + 8); hdr = 16
      } else if (size == 0L) size = b.length.toLong - i // box runs to EOF
      if (size < hdr) return null
      if (boxType(b, i) == "moov") { moov = i + hdr; moovEnd = math.min(i + size, b.length.toLong) }
      if (i + size > Int.MaxValue) { if (moov < 0) return null }
      else i += size.toInt
      if (size <= 0) return null
    }
    if (moov < 0) return null
    // walk moov children: mvhd is required (timescale/duration); the FIRST
    // trak's tkhd is optional and contributes width/height
    var j = moov
    var ts = -1L
    var dur = -1L
    var w = -1
    var h = -1
    while (j + 8 <= moovEnd) {
      var size = beU32(b, j)
      var hdr = 8
      if (size == 1L) {
        if (j + 16 > moovEnd) return null
        size = beU64(b, j + 8); hdr = 16
      } else if (size == 0L) size = moovEnd - j
      if (size < hdr) return null
      val bt = boxType(b, j)
      if (bt == "mvhd" && ts < 0) {
        val ver = b(j + hdr) & 0xff
        if (ver == 0) {
          if (j + hdr + 20 > b.length) return null
          ts = beU32(b, j + hdr + 12)
          dur = beU32(b, j + hdr + 16)
        } else if (ver == 1) {
          if (j + hdr + 32 > b.length) return null
          ts = beU32(b, j + hdr + 20)
          dur = beU64(b, j + hdr + 24)
        } else return null
        if (ts <= 0 || dur < 0) return null
      } else if (bt == "trak" && w < 0) {
        // child walk for tkhd; a malformed trak voids only the dimensions
        // (mvhd metadata stays valid), matching the null-on-garbage contract
        // at the finest granularity the format allows
        val trakEnd = math.min(j + size, moovEnd)
        var k = j + hdr
        var ok = true
        while (ok && w < 0 && k + 8 <= trakEnd) {
          var s2 = beU32(b, k)
          var h2 = 8
          if (s2 == 1L) {
            if (k + 16 > trakEnd) ok = false
            else { s2 = beU64(b, k + 8); h2 = 16 }
          } else if (s2 == 0L) s2 = trakEnd - k
          if (!ok || s2 < h2 || k + s2 > trakEnd) ok = false
          else {
            if (boxType(b, k) == "tkhd") {
              val ver = b(k + h2) & 0xff
              // tkhd payload: ver/flags(4) + creation/mod/track_ID/reserved/
              // duration (v0: 20 B, v1: 32 B) + reserved(8) + layer/alt/
              // volume/reserved(8) + matrix(36) + width(4) + height(4),
              // dimensions in 16.16 fixed point (integer part reported)
              val timesLen = if (ver == 0) 20 else if (ver == 1) 32 else -1
              if (timesLen > 0) {
                val dimOff = k + h2 + 4 + timesLen + 8 + 8 + 36
                if (dimOff + 8 <= trakEnd) {
                  w = (beU32(b, dimOff) >>> 16).toInt
                  h = (beU32(b, dimOff + 4) >>> 16).toInt
                }
              }
              ok = false // first tkhd decides, valid or not
            } else k += s2.toInt
          }
        }
      }
      if (j + size > moovEnd) return null
      j += size.toInt
    }
    if (ts <= 0) return null
    Mp4Meta(brand, ts, dur, dur * 1000L / ts, w, h)
  }

  val sparkType: StructType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Shared eval for interpreted and generated code paths. */
  def parseRow(bytes: Array[Byte]): InternalRow = {
    val m = parse(bytes)
    if (m == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.brand), m.timescale, m.duration, m.durationMs,
      if (m.width < 0) null else m.width,
      if (m.height < 0) null else m.height))
  }
}

/** `video_meta(blob)` → struct(brand, timescale, duration, duration_ms),
 *  null for non-MP4 bytes. Same codegen shape as [[ImageDims]]. */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Mp4Headers.sparkType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"video_meta needs a binary column, got $dt")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else Mp4Headers.parseRow(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cls = Mp4Headers.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      |${c.code}
      |InternalRow ${ev.value} = null;
      |boolean ${ev.isNull} = ${c.isNull};
      |if (!${ev.isNull}) {
      |  ${ev.value} = $cls.parseRow(${c.value});
      |  ${ev.isNull} = ${ev.value} == null;
      |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "video_meta"
}

object VideoMeta {
  def apply(col: Column): Column = GraftShims.column(new VideoMeta(GraftShims.expression(col)))
}

/**
 * REAL frame count from the ISO BMFF sample tables: the first `trak`
 * whose `mdia/hdlr` handler is 'vide' contributes its
 * `mdia/minf/stbl/stsz` sample_count — the codec-free fact that makes
 * frame-sample PLANNING honest (which frame indexes exist) even though
 * frame pixel decode stays behind a codec seam. Null for non-MP4 bytes
 * or MP4s with no video track.
 */
object Mp4Frames {

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def beU64(b: Array[Byte], i: Int): Long =
    (beU32(b, i) << 32) | beU32(b, i + 4)
  private def boxType(b: Array[Byte], i: Int): String =
    new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Children of the byte range [start, end): (type, payloadStart, boxEnd).
   *  Bounds-checked; a lying size terminates the walk (Nil tail). */
  private def children(b: Array[Byte], start: Long, end: Long)
      : Iterator[(String, Long, Long)] = new Iterator[(String, Long, Long)] {
    private var i = start
    override def hasNext: Boolean = i + 8 <= end
    override def next(): (String, Long, Long) = {
      var size = beU32(b, i.toInt)
      var hdr = 8
      if (size == 1L) {
        if (i + 16 > end) { i = end; return ("", end, end) }
        size = beU64(b, (i + 8).toInt); hdr = 16
      } else if (size == 0L) size = end - i
      if (size < hdr || i + size > end || size <= 0) { i = end; return ("", end, end) }
      val out = (boxType(b, i.toInt), i + hdr, i + size)
      i += size
      out
    }
  }

  private def child(b: Array[Byte], start: Long, end: Long, t: String)
      : Option[(Long, Long)] =
    children(b, start, end).collectFirst { case (`t`, s, e) => (s, e) }

  def frameCount(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 16 || boxType(b, 0) != "ftyp") return null
    val moov = child(b, 0, b.length, "moov").getOrElse(return null)
    for ((t, ts, te) <- children(b, moov._1, moov._2) if t == "trak") {
      child(b, ts, te, "mdia").foreach { case (ms, me) =>
        val isVideo = child(b, ms, me, "hdlr").exists { case (hs, he) =>
          // hdlr payload: ver/flags(4) + pre_defined(4) + handler_type(4);
          // bound by the box's OWN end — a truncated hdlr must not read
          // its sibling's bytes as a handler type
          hs + 12 <= he && boxType(b, (hs + 4).toInt) == "vide"
        }
        if (isVideo) {
          val count = for {
            (ns, ne) <- child(b, ms, me, "minf")
            (ss, se) <- child(b, ns, ne, "stbl")
            (zs, ze) <- child(b, ss, se, "stsz")
            // stsz payload: ver/flags(4) + sample_size(4) + sample_count(4)
            if zs + 12 <= ze
          } yield beU32(b, (zs + 8).toInt)
          count.foreach(c => return java.lang.Long.valueOf(c))
        }
      }
    }
    null
  }
}

/** `video_frames(blob)` → the first video track's stsz sample count
 *  (long), null for non-MP4 bytes or no video track. */
case class VideoFrames(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"video_frames needs a binary column, got $dt")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val n = Mp4Frames.frameCount(v.asInstanceOf[Array[Byte]])
      if (n == null) null else n.longValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cls = Mp4Frames.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("frameCount")
    ev.copy(code = code"""
      |${c.code}
      |long ${ev.value} = 0L;
      |boolean ${ev.isNull} = ${c.isNull};
      |if (!${ev.isNull}) {
      |  java.lang.Long $boxed = $cls.frameCount(${c.value});
      |  ${ev.isNull} = $boxed == null;
      |  if (!${ev.isNull}) ${ev.value} = $boxed.longValue();
      |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "video_frames"
}

object VideoFrames {
  def apply(col: Column): Column = GraftShims.column(new VideoFrames(GraftShims.expression(col)))
}

/** Minimal ISO-BMFF writer (ftyp + moov{mvhd, trak{tkhd, mdia{hdlr(vide),
 *  minf{stbl{stsz}}}}}) for derived-metadata pipelines and fixtures —
 *  every box a full-size spec layout, parseable by [[Mp4Headers]] and
 *  [[Mp4Frames]]. */
object Mp4Codec {

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    val size = out.length
    out(0) = (size >>> 24).toByte; out(1) = (size >>> 16).toByte
    out(2) = (size >>> 8).toByte; out(3) = size.toByte
    var i = 0
    while (i < 4) { out(4 + i) = typ.charAt(i).toByte; i += 1 }
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }
  private def be32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  def encode(timescale: Int, durationTicks: Long, width: Int, height: Int,
             nFrames: Long, tail: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++
      "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(durationTicks) ++ new Array[Byte](80))
    // unity matrix, 36 bytes: [a b u, c d v, x y w] row-major 16.16/2.30
    val matrix = be32(0x00010000L) ++ new Array[Byte](12) ++
      be32(0x00010000L) ++ new Array[Byte](12) ++ be32(0x40000000L)
    val tkhd = box("tkhd", be32(3) ++ be32(0) ++ be32(0) ++ be32(1) ++
      be32(0) ++ be32(durationTicks) ++ new Array[Byte](16) ++ matrix ++
      be32(width.toLong << 16) ++ be32(height.toLong << 16))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++
      "vide".getBytes("US-ASCII") ++ new Array[Byte](13))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(nFrames))
    val stbl = box("stbl", stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov ++ tail
  }
}
