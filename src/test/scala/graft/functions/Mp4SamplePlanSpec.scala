package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Media-time frame planning from real ISO BMFF sample tables: stts
 * run-length arithmetic, mdhd timescales, stsz/stz2 size tables,
 * stsc + stco/co64 chunk resolution, and the hostile-bytes contract.
 */
class Mp4SamplePlanSpec extends SparkSpec {

  private def plan(b: Array[Byte], strideMs: Int, maxFrames: Int) =
    Mp4Frames.samplePlan(b, strideMs, maxFrames)

  test("single stts run, constant size, one chunk: closed-form plan") {
    val mp4 = Mp4Codec.encode(1000, 1000, 64, 48, nFrames = 10,
      tables = Mp4Codec.SampleTables(
        mediaTimescale = 1000,
        sttsRuns = Seq((10L, 100L)), // 10 samples x 100 ms
        constSampleSize = 5,
        samplesPerChunk = 10,
        chunkOffsets = Seq(4096L)))
    val got = plan(mp4, 250, 10).toSeq
    // boundaries 0/250/500/750 -> samples 0,2,5,7; offset = 4096 + 5*idx
    assert(got == Seq(
      Mp4Frames.PlannedSample(0, 0, 4096),
      Mp4Frames.PlannedSample(2, 200, 4106),
      Mp4Frames.PlannedSample(5, 500, 4121),
      Mp4Frames.PlannedSample(7, 700, 4131)))
    // maxFrames truncates the same plan
    assert(plan(mp4, 250, 2).toSeq.map(_.idx) == Seq(0L, 2L))
  }

  test("two stts runs + stz2 8-bit sizes + co64 multi-chunk offsets") {
    val mp4 = Mp4Codec.encode(1000, 1400, 64, 48, nFrames = 10,
      tables = Mp4Codec.SampleTables(
        mediaTimescale = 1000,
        sttsRuns = Seq((4L, 50L), (6L, 200L)), // 200 + 1200 ms
        sampleSizes = (1L to 10L).toSeq,
        stz2FieldSize = 8,
        samplesPerChunk = 3,
        chunkOffsets = Seq(1000L, 2000L, 3000L, 4000L),
        co64 = true))
    val got = plan(mp4, 300, 10).toSeq
    assert(got == Seq(
      Mp4Frames.PlannedSample(0, 0, 1000), // chunk 0, first
      Mp4Frames.PlannedSample(4, 200, 2004), // chunk 1, after size(3)=4
      Mp4Frames.PlannedSample(6, 600, 3000), // chunk 2, first
      Mp4Frames.PlannedSample(7, 800, 3007), // chunk 2, after size(6)=7
      Mp4Frames.PlannedSample(9, 1200, 4000))) // chunk 3, first
    // stz2 count also drives video_frames (stsz absent)
    assert(Mp4Frames.frameCount(mp4).longValue == 10L)
  }

  test("stz2 4-bit and 16-bit field sizes resolve offsets") {
    def mk(fieldSize: Int, sizes: Seq[Long]) =
      Mp4Codec.encode(1000, 400, 8, 8, nFrames = sizes.length,
        tables = Mp4Codec.SampleTables(
          mediaTimescale = 1000,
          sttsRuns = Seq((sizes.length.toLong, 100L)),
          sampleSizes = sizes, stz2FieldSize = fieldSize,
          samplesPerChunk = sizes.length, chunkOffsets = Seq(100L)))
    // 4-bit: sizes 3,7,2,15 -> offsets 100,103,110,112
    val p4 = plan(mk(4, Seq(3L, 7L, 2L, 15L)), 100, 10).toSeq
    assert(p4.map(_.byteOff) == Seq(100L, 103L, 110L, 112L))
    // 16-bit: sizes 300,700 -> offsets 100,400
    val p16 = plan(mk(16, Seq(300L, 700L)), 100, 10).toSeq
    assert(p16.map(_.byteOff) == Seq(100L, 400L))
  }

  test("media timescale != 1000: tick arithmetic converts to ms exactly") {
    val mp4 = Mp4Codec.encode(600, 1800, 64, 48, nFrames = 6,
      tables = Mp4Codec.SampleTables(
        mediaTimescale = 600, // 600 ticks/s
        sttsRuns = Seq((6L, 300L)))) // 300 ticks = 500 ms per sample
    // stride 700 ms = 420 ticks: boundaries 0,420,840,1260,1680 ticks ->
    // samples 0,1,2,4,5; t_ms = idx*300*1000/600 = idx*500
    val got = plan(mp4, 700, 10).toSeq
    assert(got.map(_.idx) == Seq(0L, 1L, 2L, 4L, 5L))
    assert(got.map(_.tMs) == Seq(0L, 500L, 1000L, 2000L, 2500L))
    // no chunk tables -> no byte offsets
    assert(got.forall(_.byteOff == -1L))
  }

  test("null contract: non-video, missing stts, junk, truncation, mutations") {
    assert(plan(AudioCodec.encodeWavPcm16(8000, 1, Array(1, 2)), 100, 5) == null)
    assert(plan("junk".getBytes, 100, 5) == null)
    // legacy encode (no tables): stsz only, no stts -> null plan but a count
    val legacy = Mp4Codec.encode(1000, 5000, 64, 48, nFrames = 7)
    assert(plan(legacy, 100, 5) == null)
    assert(Mp4Frames.frameCount(legacy).longValue == 7L)
    val full = Mp4Codec.encode(1000, 1000, 64, 48, nFrames = 10,
      tables = Mp4Codec.SampleTables(1000, Seq((10L, 100L)),
        constSampleSize = 5, samplesPerChunk = 10, chunkOffsets = Seq(0L)))
    assert(plan(full.take(48), 100, 5) == null)
    def check(prop: org.scalacheck.Prop): Unit = {
      val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
      assert(res.passed, res.status.toString)
    }
    check(org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.choose(0, full.length - 1),
      org.scalacheck.Gen.choose(0, 255)) { (pos, v) =>
      val m = full.clone(); m(pos) = v.toByte
      plan(m, 100, 5); true // never throws, never hangs
    })
  }

  test("a stripped leading video trak falls through to the real stream") {
    // two video traks: the first (a thumbnail/preview shape) carries an
    // EMPTY stbl — no size table, no stts; the second is the real track.
    // Both frameCount and samplePlan must skip to the second.
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + payload.length)
      val size = out.length
      out(0) = (size >>> 24).toByte; out(1) = (size >>> 16).toByte
      out(2) = (size >>> 8).toByte; out(3) = size.toByte
      for (i <- 0 until 4) out(4 + i) = typ.charAt(i).toByte
      System.arraycopy(payload, 0, out, 8, payload.length)
      out
    }
    def be32(v: Long) = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val strippedTrak = box("trak", box("mdia",
      box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes("US-ASCII") ++
        new Array[Byte](13)) ++
      box("minf", box("stbl", Array.emptyByteArray))))
    val real = Mp4Codec.encode(1000, 1000, 64, 48, nFrames = 10,
      tables = Mp4Codec.SampleTables(1000, Seq((10L, 100L)),
        constSampleSize = 5, samplesPerChunk = 10, chunkOffsets = Seq(4096L)))
    // splice: ftyp ++ moov[mvhd ++ strippedTrak ++ realTrak]
    val ftypLen = 20 // Mp4Codec's ftyp: 8 header + 12 payload bytes
    val moovPayload = java.util.Arrays.copyOfRange(real, ftypLen + 8, real.length)
    val mvhdLen = 8 + 100 // Mp4Codec's mvhd: header + 20 + 80 payload
    val mvhd = moovPayload.take(mvhdLen)
    val realTrak = moovPayload.drop(mvhdLen)
    val spliced = real.take(ftypLen) ++
      box("moov", mvhd ++ strippedTrak ++ realTrak)
    assert(Mp4Frames.frameCount(spliced) != null &&
      Mp4Frames.frameCount(spliced).longValue == 10L,
      "frameCount must fall through the stripped video trak")
    val got = plan(spliced, 250, 10)
    assert(got != null && got.map(_.idx).toSeq == Seq(0L, 2L, 5L, 7L),
      "samplePlan must fall through the stripped video trak")
  }

  test("lying stts counts cannot stall: cost is bounded by emitted frames") {
    // a run claiming 2^32-1 samples of 1 tick each: the plan walks
    // closed-form per emitted frame, so maxFrames bounds the work
    val mp4 = Mp4Codec.encode(1000, 1000, 8, 8, nFrames = 1000000,
      tables = Mp4Codec.SampleTables(1000, Seq((0xffffffffL, 1L))))
    val t0 = System.nanoTime()
    val got = plan(mp4, 1, 100)
    assert(got.length == 100 && got.head.idx == 0 && got(99).idx == 99)
    assert((System.nanoTime() - t0) < 2e9, "plan walked per-sample, not per-frame")
  }

  test("sampleFramesMp4ByTime explodes plans; non-video rows vanish; codegen") {
    import spark.implicits._
    val mp4 = Mp4Codec.encode(1000, 1000, 64, 48, nFrames = 10,
      tables = Mp4Codec.SampleTables(1000, Seq((10L, 100L)),
        constSampleSize = 5, samplesPerChunk = 10, chunkOffsets = Seq(4096L)))
    val df = Seq((1L, mp4), (2L, "not video".getBytes))
      .toDF("id", "blob")
    val out = graft.operators.Multimodal.sampleFramesMp4ByTime(df, "blob", 250, 10)
      .select("id", "frame_idx", "t_ms", "byte_off")
    val rows = out.as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(rows == Seq((1L, 0L, 0L, 4096L), (1L, 2L, 200L, 4106L),
      (1L, 5L, 500L, 4121L), (1L, 7L, 700L, 4131L)))
    val planStr = out.queryExecution.executedPlan.toString
    assert(!planStr.contains("Exchange"), s"per-row planning must not shuffle:\n$planStr")
    // SQL registration
    df.createOrReplaceTempView("vids")
    val viaSql = spark.sql(
      "SELECT id, f.frame_idx FROM vids " +
        "LATERAL VIEW explode(video_sample_plan(blob, 250, 10)) t AS f")
      .collect().length
    assert(viaSql == 4)
  }
}
