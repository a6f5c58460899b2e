package graft.functions

import graft.SparkSpec

/** Ogg (Vorbis/Opus) and Matroska/WebM metadata parsers: field fidelity,
 *  duration math from granules / float durations, and the corrupt-bytes
 *  null contract. */
class ContainerMetaSpec extends SparkSpec {

  // ----------------------------------------------------------------- Ogg

  test("Ogg/Vorbis: ident fields + duration from the last granule") {
    val b = OggCodec.encodeVorbis(2, 44100, granule = 441000, dataPages = 3)
    val m = OggHeaders.parse(b)
    assert(m != null)
    assert(m.codec == "vorbis" && m.channels == 2 && m.sampleRate == 44100)
    assert(m.durationMs == 10000L)
  }

  test("Ogg/Opus: 48 kHz granule minus pre-skip (RFC 7845)") {
    val m = OggHeaders.parse(OggCodec.encodeOpus(1, preskip = 312,
      granule = 48312, dataPages = 2))
    assert(m != null)
    assert(m.codec == "opus" && m.channels == 1 && m.sampleRate == 48000)
    assert(m.durationMs == 1000L)
    // granule below preskip clamps to zero, never negative
    assert(OggHeaders.parse(OggCodec.encodeOpus(1, 9999, 10, 1)).durationMs == 0L)
  }

  test("Ogg: continuation pages with granule -1 don't clobber the duration") {
    // mids carry granule -1; only BOS (0) and EOS (n) count — EOS wins
    val m = OggHeaders.parse(OggCodec.encodeVorbis(1, 8000, 8000, dataPages = 5))
    assert(m.durationMs == 1000L)
  }

  test("Ogg corrupt bytes: null, never exceptions") {
    assert(OggHeaders.parse(null) == null)
    assert(OggHeaders.parse("OggX rest of it".getBytes) == null)
    assert(OggHeaders.parse("OggS".getBytes) == null)
    val good = OggCodec.encodeVorbis(2, 44100, 1000, 2)
    for (cut <- 0 until good.length) OggHeaders.parse(good.take(cut))
    val rnd = new scala.util.Random(9)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      OggHeaders.parseRow(b)
    }
  }

  // ------------------------------------------------------------ Matroska

  test("MKV: duration under timestamp scale, video dims, audio fields") {
    val b = MkvCodec.encode(durationTicks = 42000.0,
      video = Some((1920, 1080)), audio = Some((2, 48000.0)))
    val m = MkvHeaders.parse(b)
    assert(m != null)
    assert(m.durationMs == 42000L)
    assert(m.width == 1920 && m.height == 1080)
    assert(m.channels == 2 && m.sampleRate == 48000)
    // non-default scale: ticks are 2 ms each
    val m2 = MkvHeaders.parse(MkvCodec.encode(500.0, timestampScale = 2000000L))
    assert(m2.durationMs == 1000L && m2.width == -1 && m2.channels == -1)
  }

  test("MKV: unknown-size Segment (streamed files) parses to the buffer end") {
    val m = MkvHeaders.parse(MkvCodec.encode(7.0,
      video = Some((64, 48)), unknownSizeSegment = true))
    assert(m != null && m.durationMs == 7L && m.width == 64)
  }

  test("MKV: the FIRST track of a type wins even when a field is absent") {
    import MkvCodec.{elem, uintPayload, floatPayload}
    // first video track has PixelHeight but NO PixelWidth; a second video
    // track must not mix its dimensions in
    val v1 = elem(0xaeL, elem(0x83L, uintPayload(1)) ++
      elem(0xe0L, elem(0xbaL, uintPayload(111))))
    val v2 = elem(0xaeL, elem(0x83L, uintPayload(1)) ++
      elem(0xe0L, elem(0xb0L, uintPayload(640)) ++ elem(0xbaL, uintPayload(480))))
    // first audio track has SamplingFrequency but NO Channels (legal:
    // Matroska defaults channels); a later track must not clobber it
    val a1 = elem(0xaeL, elem(0x83L, uintPayload(2)) ++
      elem(0xe1L, elem(0xb5L, floatPayload(22050.0))))
    val a2 = elem(0xaeL, elem(0x83L, uintPayload(2)) ++
      elem(0xe1L, elem(0x9fL, uintPayload(6)) ++ elem(0xb5L, floatPayload(48000.0))))
    val seg = elem(0x18538067L,
      elem(0x1549a966L, elem(0x2ad7b1L, uintPayload(1000000L))) ++
        elem(0x1654ae6bL, v1 ++ v2 ++ a1 ++ a2))
    val b = elem(0x1a45dfa3L, Array.emptyByteArray) ++ seg
    val m = MkvHeaders.parse(b)
    assert(m != null)
    assert(m.width == -1 && m.height == 111, s"got $m") // track 1 only
    assert(m.channels == -1 && m.sampleRate == 22050, s"got $m")
  }

  test("MKV: oversized uint fields are rejected, not truncated to plausible values") {
    import MkvCodec.{elem, uintPayload}
    // a corrupt 5-byte PixelWidth of 0x100000010 would .toInt to 16 —
    // a plausible small dimension — unless range-checked to null
    def track(wPayload: Array[Byte], hPayload: Array[Byte]) =
      elem(0xaeL, elem(0x83L, uintPayload(1)) ++
        elem(0xe0L, elem(0xb0L, wPayload) ++ elem(0xbaL, hPayload)))
    def doc(t: Array[Byte]) =
      elem(0x1a45dfa3L, Array.emptyByteArray) ++ elem(0x18538067L,
        elem(0x1549a966L, elem(0x2ad7b1L, uintPayload(1000000L))) ++
          elem(0x1654ae6bL, t))
    val m = MkvHeaders.parse(doc(
      track(uintPayload(0x100000010L), uintPayload(480))))
    assert(m != null && m.width == -1 && m.height == 480, s"got $m")
    // same for an absurd channel count on the audio side
    val aud = elem(0xaeL, elem(0x83L, uintPayload(2)) ++
      elem(0xe1L, elem(0x9fL, uintPayload(0x7fffffff00L))))
    val ma = MkvHeaders.parse(doc(aud))
    assert(ma == null || ma.channels == -1, s"got $ma")
    // a zero dimension is equally a lie
    val z = MkvHeaders.parse(doc(track(uintPayload(0), uintPayload(480))))
    assert(z != null && z.width == -1 && z.height == 480, s"got $z")
  }

  test("MKV: audio-only and video-only tracks leave the other side null") {
    val a = MkvHeaders.parseRow(MkvCodec.encode(Double.NaN, audio = Some((1, 16000.0))))
    assert(a != null)
    assert(a.isNullAt(0) && a.isNullAt(1) && a.getInt(3) == 1 && a.getInt(4) == 16000)
    val v = MkvHeaders.parseRow(MkvCodec.encode(Double.NaN, video = Some((8, 6))))
    assert(v != null && v.isNullAt(3) && v.getInt(1) == 8)
  }

  test("MKV Cues: keyframe plan with TimestampScale conversion, caps and null contracts") {
    val b = MkvCodec.encode(9000.0, video = Some((64, 48)),
      cues = Seq((0L, 100L), (2000L, 5000L), (7000L, 22222L)))
    val cs = MkvHeaders.cues(b, 16)
    assert(cs.toSeq == Seq((0L, 100L), (2000L, 5000L), (7000L, 22222L)))
    // non-default scale: 2 ms ticks double the reported times
    val b2 = MkvCodec.encode(9000.0, timestampScale = 2000000L,
      cues = Seq((100L, 7L), (300L, 9L)))
    assert(MkvHeaders.cues(b2, 16).toSeq == Seq((200L, 7L), (600L, 9L)))
    // the planning cap takes the FIRST maxPoints cue points
    assert(MkvHeaders.cues(b, 2).toSeq == Seq((0L, 100L), (2000L, 5000L)))
    // no Cues element / non-EBML bytes: null
    assert(MkvHeaders.cues(MkvCodec.encode(9000.0, video = Some((64, 48))), 4) == null)
    assert(MkvHeaders.cues("not ebml".getBytes, 4) == null)
    assert(MkvHeaders.cues(null, 4) == null)
    // a cue point with an absurd timestamp is a lying index
    val lying = MkvCodec.encode(9000.0, cues = Seq((1L << 51, 5L)))
    assert(MkvHeaders.cues(lying, 4) == null)
    // ...as is one missing its CueTime: the WHOLE plan nulls — a silently
    // truncated prefix would be indistinguishable from a short plan
    val noTime = MkvCodec.elem(0xbbL,
      MkvCodec.elem(0xb7L, MkvCodec.elem(0xf1L, MkvCodec.uintPayload(5))))
    val goodCue = MkvCodec.elem(0xbbL,
      MkvCodec.elem(0xb3L, MkvCodec.uintPayload(10)) ++
        MkvCodec.elem(0xb7L, MkvCodec.elem(0xf1L, MkvCodec.uintPayload(7))))
    val mixed = MkvCodec.elem(0x1a45dfa3L, Array.emptyByteArray) ++
      MkvCodec.elem(0x18538067L,
        MkvCodec.elem(0x1549a966L,
          MkvCodec.elem(0x2ad7b1L, MkvCodec.uintPayload(1000000L))) ++
          MkvCodec.elem(0x1c53bb6bL, goodCue ++ noTime))
    assert(MkvHeaders.cues(mixed, 8) == null)
    // truncation/bit-flip fuzz never throws
    for (cut <- 0 until b.length) MkvHeaders.cuesArray(b.take(cut), 8)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val x = b.clone()
      x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
      MkvHeaders.cuesArray(x, 8)
    }
  }

  test("MKV corrupt bytes: null, never exceptions") {
    assert(MkvHeaders.parse(null) == null)
    assert(MkvHeaders.parse("not ebml".getBytes) == null)
    val good = MkvCodec.encode(123.0, video = Some((10, 20)), audio = Some((2, 8000.0)))
    for (cut <- 0 until good.length) MkvHeaders.parse(good.take(cut))
    val rnd = new scala.util.Random(10)
    for (_ <- 0 until 400) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      MkvHeaders.parseRow(b)
    }
  }

  // --------------------------------------------------------- expressions

  test("ogg_meta / mkv_meta columns dispatch by format, null on foreign bytes") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, OggCodec.encodeOpus(2, 0, 96000, 2)),
      (2L, MkvCodec.encode(1500.0, video = Some((320, 240)))),
      (3L, "plain".getBytes))
    val got = rows.toDF("id", "blob")
      .select(col("id"), OggMetaExpr(col("blob")).as("ogg"),
        MkvMetaExpr(col("blob")).as("mkv"))
      .orderBy("id").collect()
    assert(got(0).getStruct(1).getAs[Long]("duration_ms") == 2000L)
    assert(got(0).isNullAt(2))
    assert(got(1).isNullAt(1))
    assert(got(1).getStruct(2).getAs[Int]("width") == 320)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
  }
}
