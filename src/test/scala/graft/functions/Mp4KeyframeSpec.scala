package graft.functions

import graft.SparkSpec

/**
 * stss sync-sample (keyframe) planning: explicit tables, the spec's
 * absent-stss = all-sync rule, corrupt-table termination, and the
 * operator fan-out on Spark.
 */
class Mp4KeyframeSpec extends SparkSpec {

  private def mp4(n: Int, delta: Long, sync: Seq[Long],
                  spc: Int = 0, offs: Seq[Long] = Nil): Array[Byte] =
    Mp4Codec.encode(timescale = 1000, durationTicks = n * delta,
      width = 64, height = 48, nFrames = n,
      tables = Mp4Codec.SampleTables(
        mediaTimescale = 1000,
        sttsRuns = Seq((n.toLong, delta)),
        constSampleSize = 10,
        samplesPerChunk = spc,
        chunkOffsets = offs,
        syncSamples = sync))

  test("explicit stss: indexes, times, byte offsets") {
    val b = mp4(20, delta = 40, sync = Seq(1, 6, 11, 16),
      spc = 5, offs = Seq(1000, 2000, 3000, 4000))
    val plan = Mp4Frames.keyframePlan(b, maxFrames = 100)
    assert(plan != null)
    assert(plan.map(_.idx).toSeq == Seq(0L, 5L, 10L, 15L))
    assert(plan.map(_.tMs).toSeq == Seq(0L, 200L, 400L, 600L))
    // sample i sits in chunk i/5 at offset chunkOff + (i%5)*10
    assert(plan.map(_.byteOff).toSeq == Seq(1000L, 2000L, 3000L, 4000L))
  }

  test("keyframe times across multiple stts runs") {
    val b = Mp4Codec.encode(timescale = 1000, durationTicks = 0,
      width = 8, height = 8, nFrames = 10,
      tables = Mp4Codec.SampleTables(
        mediaTimescale = 1000,
        sttsRuns = Seq((4L, 100L), (6L, 10L)), // samples 0-3 slow, 4-9 fast
        constSampleSize = 1,
        syncSamples = Seq(1, 5, 9)))
    val plan = Mp4Frames.keyframePlan(b, 100)
    assert(plan.map(_.idx).toSeq == Seq(0L, 4L, 8L))
    assert(plan.map(_.tMs).toSeq == Seq(0L, 400L, 440L))
  }

  test("zero-duration stts runs keep index accounting (real muxers emit them)") {
    val b = Mp4Codec.encode(timescale = 1000, durationTicks = 0,
      width = 8, height = 8, nFrames = 10,
      tables = Mp4Codec.SampleTables(
        mediaTimescale = 1000,
        sttsRuns = Seq((1L, 0L), (9L, 100L)), // sample 0 zero-duration
        constSampleSize = 1,
        syncSamples = Seq(1, 6, 10)))
    val plan = Mp4Frames.keyframePlan(b, 100)
    assert(plan != null)
    assert(plan.map(_.idx).toSeq == Seq(0L, 5L, 9L))
    // sample 0 starts at 0; sample 5 is the 5th of the d=100 run -> 400;
    // sample 9 -> 800 — dropping the zero-duration run's index space
    // would misreport these as 500/past-the-table
    assert(plan.map(_.tMs).toSeq == Seq(0L, 400L, 800L))
    // the stride planner advances the same cursor
    val stride = Mp4Frames.samplePlan(b, strideMs = 250, maxFrames = 10)
    assert(stride.map(p => (p.idx, p.tMs)).toSeq ==
      Seq((1L, 0L), (3L, 200L), (6L, 500L), (8L, 700L)))
  }

  test("absent stss means every sample is a sync sample (capped)") {
    val b = mp4(50, delta = 20, sync = Nil)
    val plan = Mp4Frames.keyframePlan(b, maxFrames = 7)
    assert(plan != null)
    assert(plan.map(_.idx).toSeq == (0L until 7L))
    assert(plan.map(_.tMs).toSeq == (0L until 7L).map(_ * 20))
  }

  test("non-ascending or out-of-range stss entries end the plan, no throw") {
    val down = mp4(10, 5, sync = Seq(1, 7, 4))
    assert(Mp4Frames.keyframePlan(down, 100).map(_.idx).toSeq == Seq(0L, 6L))
    val past = mp4(10, 5, sync = Seq(2, 99))
    assert(Mp4Frames.keyframePlan(past, 100).map(_.idx).toSeq == Seq(1L))
  }

  test("maxFrames caps the plan; non-MP4 and no-video bytes are null") {
    val b = mp4(30, 10, sync = (1L to 30L))
    assert(Mp4Frames.keyframePlan(b, 4).length == 4)
    assert(Mp4Frames.keyframePlan("nope".getBytes, 4) == null)
    assert(Mp4Frames.keyframePlan(
      AudioCodec.encodeWavPcm16(8000, 1, Array(1, 2)), 4) == null)
  }

  test("truncation / bit-flip fuzz never throws") {
    val good = mp4(12, 30, sync = Seq(1, 4, 7, 10), spc = 3, offs = Seq(100, 200))
    for (cut <- 0 until good.length)
      Mp4Frames.keyframePlan(good.take(cut), 8)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 400) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Mp4KeyframeEval.keyframeArray(b, 8)
    }
  }

  test("sampleKeyframesMp4 fans out rows; audio blobs contribute none") {
    val spark = this.spark
    import spark.implicits._
    val df = Seq(
      (1L, mp4(9, 50, sync = Seq(1, 4, 7))),
      (2L, AudioCodec.encodeWavPcm16(8000, 1, Array(1)))).toDF("id", "blob")
    val out = graft.operators.Multimodal.sampleKeyframesMp4(df, "blob", 10)
      .select("id", "frame_idx", "t_ms").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 0L), (1L, 3L, 150L), (1L, 6L, 300L)))
  }
}
