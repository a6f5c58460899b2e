package graft.functions

import graft.SparkSpec

/** Silence-based segmentation: split/merge thresholds, trimming, channel
 *  interleave, caps, and the null contract. */
class AudioSegmentsSpec extends SparkSpec {

  private def segs(samples: Array[Int], rate: Int = 8000, ch: Int = 1,
      silenceBelow: Int = 100, minSilenceMs: Int = 30, cap: Int = 100)
      : Seq[(Long, Long)] = {
    val arr = AudioSegments.segmentsArray(
      AudioCodec.encodeWavPcm16(rate, ch, samples), silenceBelow, minSilenceMs, cap)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getLong(0), r.getLong(1))
    }
  }

  test("long pauses split; short pauses stay inside a segment") {
    // 8000 Hz, 30 ms gate = 240 samples
    val voiced = Array.fill(400)(5000)
    val shortGap = Array.fill(200)(0) // 25 ms < 30 -> no split
    val longGap = Array.fill(240)(0) // exactly 30 ms -> split
    val s = segs(voiced ++ shortGap ++ voiced ++ longGap ++ voiced)
    // first segment spans both voiced runs across the short gap,
    // trimmed at the last voiced sample (400+200+400 = 1000 samples)
    assert(s == Seq((0L, 125L), (155L, 205L)))
  }

  test("leading/trailing silence is trimmed away entirely") {
    val s = segs(Array.fill(800)(0) ++ Array.fill(400)(-3000) ++ Array.fill(800)(0))
    assert(s == Seq((100L, 150L)))
    assert(segs(Array.fill(500)(0)) == Seq.empty)
  }

  test("stereo: a frame is voiced when ANY channel is") {
    // interleaved L/R: left silent, right voiced for the first 400 frames
    val frames = Array.tabulate(800 * 2) { k =>
      if (k % 2 == 1 && k / 2 < 400) 4000 else 0
    }
    val s = segs(frames, ch = 2)
    assert(s == Seq((0L, 50L)))
  }

  test("maxSegments caps output; null for non-PCM bytes") {
    val burst = Array.fill(80)(2000) ++ Array.fill(240)(0)
    val many = Array.fill(10)(burst).flatten
    assert(segs(many, cap = 3).length == 3)
    assert(AudioSegments.segmentsArray("nope".getBytes, 100, 30, 10) == null)
  }

  test("segmentAudio operator fans out rows; foreign blobs contribute none") {
    val spark = this.spark
    import spark.implicits._
    val voiced = Array.fill(400)(5000)
    val gap = Array.fill(240)(0)
    val df = Seq(
      (1L, AudioCodec.encodeWavPcm16(8000, 1, voiced ++ gap ++ voiced)),
      (2L, "text".getBytes)).toDF("id", "blob")
    val out = graft.operators.Multimodal
      .segmentAudio(df, "blob", 100, 30, 10)
      .select("id", "seg_idx", "start_ms", "end_ms").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 0, 0L, 50L), (1L, 1, 80L, 130L)))
  }
}
