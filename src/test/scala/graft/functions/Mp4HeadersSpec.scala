package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Headers-only MP4 parsing against hand-assembled ISO BMFF fixtures. */
class Mp4HeadersSpec extends SparkSpec {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ftyp(isom) + free box + moov[mvhd v0: timescale 1000, duration 5000]
  private val mp4v0 = hexBytes(
    "00000010 66747970 69736F6D 00000000" +
      " 0000000C 66726565 DEADBEEF" + // free box (12 bytes) between ftyp and moov
      " 00000074 6D6F6F76" +
      " 0000006C 6D766864 00000000 00000000 00000000 000003E8 00001388" +
      " " + "00" * 80)

  // mvhd VERSION 1: 64-bit times, timescale 90000, duration 450000 (5 s)
  private val mp4v1 = hexBytes(
    "00000010 66747970 6D703432 00000000" +
      " 00000080 6D6F6F76" +
      " 00000078 6D766864 01000000 0000000000000000 0000000000000000" +
      " 00015F90 000000000006DDD0" +
      " " + "00" * 80)

  private val unityMatrix =
    "00010000 00000000 00000000 00000000 00010000 00000000 00000000 00000000 40000000"

  // moov[mvhd v0 + trak[tkhd v0: 640x360 as 16.16 fixed point]]
  private val mp4Trak = hexBytes(
    "00000010 66747970 69736F6D 00000000" +
      " 000000D8 6D6F6F76" +
      " 0000006C 6D766864 00000000 00000000 00000000 000003E8 00001388" +
      " " + "00" * 80 +
      " 00000064 7472616B" +
      " 0000005C 746B6864 00000003 00000000 00000000 00000001 00000000 00001388" +
      " " + "00" * 16 + " " + unityMatrix +
      " 02800000 01680000")

  // tkhd VERSION 1 (64-bit times): 1920x1080
  private val mp4TrakV1 = hexBytes(
    "00000010 66747970 69736F6D 00000000" +
      " 000000E4 6D6F6F76" +
      " 0000006C 6D766864 00000000 00000000 00000000 000003E8 00001388" +
      " " + "00" * 80 +
      " 00000070 7472616B" +
      " 00000068 746B6864 01000007 0000000000000000 0000000000000000" +
      " 00000001 00000000 0000000000001388" +
      " " + "00" * 16 + " " + unityMatrix +
      " 07800000 04380000")

  test("mvhd v0 and v1 parse: brand, timescale, duration, derived ms; no trak → no dims") {
    assert(Mp4Headers.parse(mp4v0) == Mp4Headers.Mp4Meta("isom", 1000L, 5000L, 5000L, -1, -1))
    assert(Mp4Headers.parse(mp4v1) == Mp4Headers.Mp4Meta("mp42", 90000L, 450000L, 5000L, -1, -1))
  }

  test("tkhd v0 and v1 surface the 16.16 fixed-point dimensions' integer part") {
    assert(Mp4Headers.parse(mp4Trak) ==
      Mp4Headers.Mp4Meta("isom", 1000L, 5000L, 5000L, 640, 360))
    assert(Mp4Headers.parse(mp4TrakV1) ==
      Mp4Headers.Mp4Meta("isom", 1000L, 5000L, 5000L, 1920, 1080))
  }

  test("truncated tkhd voids only the dimensions, mvhd metadata survives") {
    // trak declaring a tkhd too short to hold the matrix + dims: the movie
    // metadata must still parse, dims must stay unset
    val shortTrak = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
        " 00000090 6D6F6F76" +
        " 0000006C 6D766864 00000000 00000000 00000000 000003E8 00001388" +
        " " + "00" * 80 +
        " 0000001C 7472616B" +
        " 00000014 746B6864 00000003 00000000 00000000")
    assert(Mp4Headers.parse(shortTrak) ==
      Mp4Headers.Mp4Meta("isom", 1000L, 5000L, 5000L, -1, -1))
  }

  test("garbage, truncation and lying sizes return null, never throw or loop") {
    assert(Mp4Headers.parse(null) == null)
    assert(Mp4Headers.parse("definitely not a movie file".getBytes) == null)
    assert(Mp4Headers.parse(mp4v0.take(30)) == null)
    // a moov claiming size 0 at EOF with no mvhd inside
    assert(Mp4Headers.parse(hexBytes(
      "00000010 66747970 69736F6D 00000000 00000000 6D6F6F76")) == null)
    def check(prop: org.scalacheck.Prop): Unit = {
      val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
      assert(res.passed, res.status.toString)
    }
    check(org.scalacheck.Prop.forAll { (bytes: Array[Byte]) =>
      Mp4Headers.parse(bytes); true
    })
    check(org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.choose(0, mp4v0.length - 1),
      org.scalacheck.Gen.choose(0, 255)) { (pos, v) =>
      val b = mp4v0.clone(); b(pos) = v.toByte
      Mp4Headers.parse(b); true
    })
    // single-byte mutations over the trak-bearing fixture: the tkhd child
    // walk must be as crash-free as the top-level walk
    check(org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.choose(0, mp4Trak.length - 1),
      org.scalacheck.Gen.choose(0, 255)) { (pos, v) =>
      val b = mp4Trak.clone(); b(pos) = v.toByte
      Mp4Headers.parse(b); true
    })
  }

  test("crafted 64-bit box sizes near Long.MaxValue cannot overflow the walk") {
    // size32 == 1 → 64-bit extended size; a value near Long.MaxValue made
    // the old `i + size > end` guard wrap negative and pass, walking
    // wrapped offsets into an uncaught IndexOutOfBounds
    def crafted(size64Hex: String): Array[Byte] = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
        " 00000001 6D6F6F76 " + size64Hex + // moov with lying ext size
        " 00000000")
    for (s <- Seq("7FFFFFFFFFFFFFF0", "FFFFFFFFFFFFFFFF", "8000000000000000")) {
      assert(Mp4Frames.frameCount(crafted(s)) == null)
      assert(Mp4Headers.parse(crafted(s)) == null)
    }
    // same lie one level down: a moov whose trak-child claims an
    // overflowing 64-bit size terminates the walk cleanly (null, no
    // wrapped-offset reads, no loop)
    val innerLie = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
        " 00000088 6D6F6F76" +
        " 0000006C 6D766864 00000000 00000000 00000000 000003E8 00001388" +
        " " + "00" * 80 +
        " 00000001 7472616B 7FFFFFFFFFFFFFF0 00000000")
    assert(Mp4Frames.frameCount(innerLie) == null)
    assert(Mp4Headers.parse(innerLie) == null)
  }

  test("video_meta expression evaluates in a plan") {
    import spark.implicits._
    val rows = Seq(("v0", mp4v0), ("trak", mp4Trak), ("txt", "nope".getBytes))
      .toDF("name", "blob")
      .withColumn("m", VideoMeta(col("blob")))
      .select(col("name"), col("m.brand"), col("m.timescale"), col("m.duration_ms"),
        col("m.width"), col("m.height"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getString(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1 else r.getInt(4), if (r.isNullAt(5)) -1 else r.getInt(5)))))
      .toMap
    assert(rows("v0").contains(("isom", 1000L, 5000L, -1, -1)))
    assert(rows("trak").contains(("isom", 1000L, 5000L, 640, 360)))
    assert(rows("txt").isEmpty)
  }

  test("Mp4Codec round-trips through Mp4Headers AND Mp4Frames; frame " +
      "sampling plans from the real stsz count") {
    import spark.implicits._
    val mp4 = Mp4Codec.encode(timescale = 600, durationTicks = 1800,
      width = 320, height = 240, nFrames = 23, tail = "garbage".getBytes)
    val m = Mp4Headers.parse(mp4)
    assert(m.timescale == 600L && m.durationMs == 3000L &&
      m.width == 320 && m.height == 240)
    assert(Mp4Frames.frameCount(mp4).longValue == 23L)
    // no video track (WAV), truncated mp4, foreign bytes: all null
    assert(Mp4Frames.frameCount(AudioCodec.encodeWavPcm16(8000, 1, Array(1))) == null)
    assert(Mp4Frames.frameCount(mp4.take(40)) == null)
    assert(Mp4Frames.frameCount("junk".getBytes) == null)
    // expression + honest sampler: stride-4 under count 23, cap 3 → 0,4,8;
    // the undecodable row fans out to NOTHING
    val df = Seq((1L, mp4), (2L, "junk".getBytes)).toDF("id", "blob")
    val out = graft.operators.Multimodal.sampleFramesMp4(df, "blob", 4, 3)
      .select("id", "frame_idx").as[(Long, Long)].collect().toSeq.sorted
    assert(out == Seq((1L, 0L), (1L, 4L), (1L, 8L)))
  }

  test("hostile sample tables: a lying u32 stsz count caps (no multi-GB " +
      "array per row); a truncated hdlr never reads its sibling's bytes") {
    import spark.implicits._
    // stsz sample_count = 4 billion: the fan-out must still be the sliced
    // stride set, materializing at most stride*maxFrames indexes
    val lying = Mp4Codec.encode(1000, 1000, 64, 64, nFrames = 4000000000L)
    assert(Mp4Frames.frameCount(lying).longValue == 4000000000L)
    val out = graft.operators.Multimodal
      .sampleFramesMp4(Seq((1L, lying)).toDF("id", "blob"), "blob", 5, 12)
      .select("frame_idx").as[Long].collect().toSeq
    assert(out == (0L until 60L by 5L).toSeq)
    // hdlr box shorter than the 12-byte handler offset, followed by a
    // sibling whose TYPE spells 'vide': must not classify as video
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val size = 8 + payload.length
      Array((size >>> 24).toByte, (size >>> 16).toByte, (size >>> 8).toByte,
        size.toByte) ++ t.getBytes("US-ASCII") ++ payload
    }
    val shortHdlr = box("hdlr", Array[Byte](0, 0, 0, 0)) // 4-byte payload
    val videSibling = box("vide", new Array[Byte](8))
    val stbl = box("stbl", box("stsz",
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 9)))
    val mdia = box("mdia", shortHdlr ++ videSibling ++ box("minf", stbl))
    val crafted = box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
      box("moov", box("mvhd",
        Array[Byte](0, 0, 0, 0) ++ new Array[Byte](8) ++
          Array[Byte](0, 0, 3, 0xE8.toByte) ++ new Array[Byte](84)) ++
        box("trak", mdia))
    assert(Mp4Frames.frameCount(crafted) == null,
      "a truncated hdlr must not read the sibling box's type as a handler")
  }
}
