package graft.functions

import graft.SparkSpec
import graft.functions.Mp4Codec.{FragSampleFx, SampleTables}

/** MP4 edit lists (trak/edts/elst): DASH packagers shift sample times by
 *  the first non-empty edit's media_time — presentation time = media
 *  time minus that shift, for BOTH moov-resident and fragmented files.
 *  No elst (or a lying one) keeps the composition-naive answer. */
class Mp4EditListSpec extends SparkSpec {

  // 4 samples x 100 ticks at 1000 ticks/s, 50-byte samples, syncs 1 & 3
  private def classic(elst: Seq[(Long, Long)],
      elstV1: Boolean = false): Array[Byte] =
    Mp4Codec.encode(1000, 4000, 64, 48, nFrames = 4,
      tables = SampleTables(1000, Seq((4L, 100L)),
        constSampleSize = 50, samplesPerChunk = 4, chunkOffsets = Seq(900L),
        syncSamples = Seq(1L, 3L)),
      elst = elst, elstV1 = elstV1)

  test("moov keyframe/stride times shift by the first non-empty edit") {
    val plain = Mp4Frames.keyframePlan(classic(Nil), 10)
    assert(plain.map(p => (p.idx, p.tMs)).toSeq == Seq((0L, 0L), (2L, 200L)))

    val shifted = Mp4Frames.keyframePlan(classic(Seq((0L, 100L))), 10)
    // sample 0 starts 100 ticks BEFORE the presentation origin (pre-roll):
    // the negative time is honest, not clamped
    assert(shifted.map(p => (p.idx, p.tMs)).toSeq ==
      Seq((0L, -100L), (2L, 100L)))
    // byte offsets are untouched by edits
    assert(shifted.map(_.byteOff).toSeq == plain.map(_.byteOff).toSeq)

    // stride boundaries are PRESENTATION times: with shift 100 the sample
    // playing at presentation 0 is media tick 100 = sample 1
    val sp = Mp4Frames.samplePlan(classic(Seq((0L, 100L))), 100, 10)
    assert(sp.map(p => (p.idx, p.tMs)).toSeq ==
      Seq((1L, 0L), (2L, 100L), (3L, 200L)))
    val sp0 = Mp4Frames.samplePlan(classic(Nil), 100, 10)
    assert(sp0.map(_.idx).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("empty edits are skipped; v1 parses; lying media_time means no shift") {
    // (dur=500, -1) is an empty edit (presentation delay) — the SECOND
    // entry carries the real media-time shift
    val kf = Mp4Frames.keyframePlan(
      classic(Seq((500L, -1L), (0L, 100L))), 10)
    assert(kf.map(_.tMs).toSeq == Seq(-100L, 100L))
    // version 1 (64-bit entries)
    val kf1 = Mp4Frames.keyframePlan(
      classic(Seq((0L, 100L)), elstV1 = true), 10)
    assert(kf1.map(_.tMs).toSeq == Seq(-100L, 100L))
    // a forged huge media_time (past MaxTicks) must not poison times
    val lying = Mp4Frames.keyframePlan(
      classic(Seq((0L, 1L << 60)), elstV1 = true), 10)
    assert(lying.map(_.tMs).toSeq == Seq(0L, 200L))
    // a negative non-(-1) media_time is lying too
    val neg = Mp4Frames.keyframePlan(classic(Seq((0L, -7L))), 10)
    assert(neg.map(_.tMs).toSeq == Seq(0L, 200L))
  }

  test("fragmented files shift by elst exactly like moov-resident ones") {
    val NonSync = 0x10000L
    val head = Mp4Codec.encode(1000, 0L, 64, 48, nFrames = 0,
      trex = (0L, 0L, NonSync), elst = Seq((0L, 100L)))
    val f = Mp4Codec.fragment(1, 1, baseDecodeTime = 100L, Seq(
      FragSampleFx(40, 100, 0), FragSampleFx(40, 110, NonSync),
      FragSampleFx(40, 120, 0)))
    val b = head ++ f
    val kf = Mp4Frames.keyframePlan(b, 10)
    // decode times 100,140,180 shift to presentation 0,40,80
    assert(kf.map(p => (p.idx, p.tMs)).toSeq == Seq((0L, 0L), (2L, 80L)))
    // stride plan: presentation boundaries 0 and 40 pick samples 0 and 1
    val sp = Mp4Frames.samplePlan(b, 40, 10)
    assert(sp.map(p => (p.idx, p.tMs)).toSeq ==
      Seq((0L, 0L), (1L, 40L), (2L, 80L)))
    // frame counts ignore edits
    assert(Mp4Frames.frameCount(b) == 3L)
  }
}
