package graft.functions

import graft.SparkSpec

/**
 * MP3 frame-header / Xing and FLAC STREAMINFO parsers: field fidelity
 * across the version/layer grid, ID3v2 skipping, false-sync rejection,
 * VBR headers, and the corrupt-bytes null contract.
 */
class CodedAudioSpec extends SparkSpec {

  // ---------------------------------------------------------------- MP3

  test("CBR field fidelity across the version x layer grid") {
    for {
      v <- Seq(10, 20, 25)
      l <- Seq(1, 2, 3)
      mono <- Seq(true, false)
    } {
      val b = CodedAudioCodec.encodeMp3(v, l, bitrateIdx = 5, srIdx = 1,
        mono = mono, nFrames = 7)
      val m = Mp3Headers.parse(b)
      assert(m != null, s"v=$v l=$l")
      assert(m.versionX10 == v && m.layer == l)
      assert(m.channels == (if (mono) 1 else 2))
      assert(m.frames == 7, s"v=$v l=$l frames=${m.frames}")
      assert(!m.vbr)
      val expectedSr = (v match {
        case 10 => Seq(44100, 48000, 32000)
        case 20 => Seq(22050, 24000, 16000)
        case _ => Seq(11025, 12000, 8000)
      })(1)
      assert(m.sampleRate == expectedSr)
      val spf =
        if (l == 1) 384 else if (l == 2) 1152 else if (v == 10) 1152 else 576
      assert(m.durationMs == 7L * spf * 1000 / expectedSr)
    }
  }

  test("ID3v2 prefix is skipped by its syncsafe size (with and without footer)") {
    val plain = CodedAudioCodec.encodeMp3(10, 3, 9, 0, mono = false, nFrames = 5)
    val withId3 = CodedAudioCodec.encodeMp3(10, 3, 9, 0, mono = false,
      nFrames = 5, id3PadBytes = 3000)
    val a = Mp3Headers.parse(plain)
    val b = Mp3Headers.parse(withId3)
    assert(a != null && b != null)
    assert(a.bitrateKbps == b.bitrateKbps && a.frames == b.frames &&
      a.durationMs == b.durationMs)
  }

  test("0xFF garbage before the stream does not false-sync") {
    val clean = CodedAudioCodec.encodeMp3(10, 3, 9, 0, mono = true, nFrames = 6)
    // 0xFF 0xFB would parse as a lone header, but the frame it implies is
    // garbage — the next-frame cross-check must reject it and find the
    // real stream
    val junk = Array[Byte](0xff.toByte, 0xfb.toByte, 0x10, 0x00, 0, 0, 0)
    val m = Mp3Headers.parse(junk ++ clean)
    assert(m != null)
    assert(m.frames == 6, s"frames=${m.frames}")
    assert(m.channels == 1)
  }

  test("Xing header overrides the CBR estimate and flags VBR; Info does not") {
    for ((isInfo, wantVbr) <- Seq((false, true), (true, false))) {
      val b = CodedAudioCodec.encodeMp3(10, 3, 9, 0, mono = false,
        nFrames = 4, xingFrames = 1234, xingIsInfo = isInfo)
      val m = Mp3Headers.parse(b)
      assert(m != null)
      assert(m.frames == 1234, s"isInfo=$isInfo frames=${m.frames}")
      assert(m.vbr == wantVbr)
      assert(m.durationMs == 1234L * 1152 * 1000 / 44100)
    }
  }

  test("Xing is found for MPEG2 mono too (side-info size 9)") {
    val b = CodedAudioCodec.encodeMp3(20, 3, 8, 2, mono = true,
      nFrames = 3, xingFrames = 99)
    val m = Mp3Headers.parse(b)
    assert(m != null && m.frames == 99 && m.vbr)
    assert(m.durationMs == 99L * 576 * 1000 / 16000)
  }

  test("corrupt MP3 bytes are null, never exceptions") {
    assert(Mp3Headers.parse(null) == null)
    assert(Mp3Headers.parse(Array.emptyByteArray) == null)
    assert(Mp3Headers.parse("not audio at all".getBytes) == null)
    // reserved version (verBits=1) and reserved layer and bad bitrate/sr
    assert(Mp3Headers.parse(Array(0xff, 0xeb, 0x90, 0x00).map(_.toByte)) == null)
    assert(Mp3Headers.parse(Array(0xff, 0xf9, 0x90, 0x00).map(_.toByte)) == null)
    assert(Mp3Headers.parse(Array(0xff, 0xfb, 0x00, 0x00).map(_.toByte)) == null)
    assert(Mp3Headers.parse(Array(0xff, 0xfb, 0xf0, 0x00).map(_.toByte)) == null)
    assert(Mp3Headers.parse(Array(0xff, 0xfb, 0x9c, 0x00).map(_.toByte)) == null)
    // every truncation of a valid stream stays exception-free
    val good = CodedAudioCodec.encodeMp3(10, 3, 5, 0, mono = true, nFrames = 2,
      id3PadBytes = 40)
    for (cut <- 0 until good.length) {
      Mp3Headers.parse(good.take(cut)) // must not throw
    }
    // and random bit flips stay exception-free
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Mp3Headers.parseRow(b) // must not throw
    }
  }

  // --------------------------------------------------------------- FLAC

  test("FLAC STREAMINFO field fidelity, including 36-bit totals") {
    val b = CodedAudioCodec.encodeFlac(44100, 2, 16, (1L << 35) + 123)
    val m = FlacHeaders.parse(b)
    assert(m != null)
    assert(m.sampleRate == 44100 && m.channels == 2 && m.bits == 16)
    assert(m.totalSamples == (1L << 35) + 123)
    assert(m.durationMs == ((1L << 35) + 123) * 1000 / 44100)
    val hiRes = FlacHeaders.parse(CodedAudioCodec.encodeFlac(192000, 8, 24, 960000))
    assert(hiRes.sampleRate == 192000 && hiRes.channels == 8 && hiRes.bits == 24)
    assert(hiRes.durationMs == 5000)
  }

  test("a leading non-STREAMINFO block is tolerated (sloppy writers)") {
    val m = FlacHeaders.parse(
      CodedAudioCodec.encodeFlac(48000, 1, 16, 48000, leadingPaddingBlock = true))
    assert(m != null && m.sampleRate == 48000 && m.durationMs == 1000)
  }

  test("corrupt FLAC bytes are null, never exceptions") {
    assert(FlacHeaders.parse(null) == null)
    assert(FlacHeaders.parse("fLaX rest".getBytes) == null)
    assert(FlacHeaders.parse("fLaC".getBytes) == null)
    val good = CodedAudioCodec.encodeFlac(44100, 2, 16, 1000)
    for (cut <- 0 until good.length) FlacHeaders.parse(good.take(cut))
    val rnd = new scala.util.Random(8)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      FlacHeaders.parseRow(b)
    }
  }

  // ------------------------------------------------- expressions on Spark

  test("mp3_meta / flac_meta as columns: format dispatch, nulls for foreign bytes") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, CodedAudioCodec.encodeMp3(10, 3, 9, 0, mono = false, nFrames = 10)),
      (2L, CodedAudioCodec.encodeFlac(22050, 1, 16, 44100)),
      (3L, AudioCodec.encodeWavPcm16(8000, 1, Array(1, 2, 3))),
      (4L, "neither".getBytes))
    val df = rows.toDF("id", "blob")
      .select(col("id"),
        Mp3MetaExpr(col("blob")).as("mp3"),
        FlacMetaExpr(col("blob")).as("flac"))
      .orderBy("id")
    val got = df.collect()
    assert(got(0).getStruct(1) != null && got(0).isNullAt(2))
    assert(got(0).getStruct(1).getAs[Int]("bitrate_kbps") == 128)
    assert(got(1).isNullAt(1) && got(1).getStruct(2) != null)
    assert(got(1).getStruct(2).getAs[Long]("duration_ms") == 2000L)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
    assert(got(3).isNullAt(1) && got(3).isNullAt(2))
  }
}
