package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioStatsSpec extends SparkSpec {
  import spark.implicits._

  test("PCM16 sample stats: peak, exact sum of squares, clipped, silent") {
    val samples = Array(0, 100, -100, 32767, -32768, 999, -999, 1000, -1000, 5)
    val wav = AudioCodec.encodeWavPcm16(16000, 1, samples)
    val row = Seq(Tuple1(wav)).toDF("blob")
      .select(AudioStats(col("blob"), 1000).as("st")).select("st.*").head()
    assert(row.getLong(0) === samples.length.toLong) // n_samples
    assert(row.getLong(1) === 32768L) // peak |s|
    assert(row.getLong(2) === samples.map(s => s.toLong * s).sum) // sum_sq exact
    assert(row.getLong(3) === 2L) // both rails clipped
    assert(row.getLong(4) === 6L) // |s| < 1000: 0,±100,±999,5
  }

  test("non-PCM16 and foreign bytes are null data") {
    val wav = AudioCodec.encodeWavPcm16(8000, 2, Array(1, 2, 3, 4))
    val eightBit = wav.clone(); eightBit(34) = 8 // bits-per-sample 8
    val aLaw = wav.clone(); aLaw(20) = 6 // format code 6
    val df = Seq(("ok", wav), ("bits8", eightBit), ("alaw", aLaw),
      ("txt", "nope".getBytes)).toDF("name", "blob")
      .select(col("name"), AudioStats(col("blob"), 100).as("st"))
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(df("ok") === false)
    assert(df("bits8") === true && df("alaw") === true && df("txt") === true)
  }

  test("audio_ahash: envelope fingerprint is length- and amplitude-" +
      "invariant, plants the exact pattern, nulls on non-PCM16") {
    val p = 0x00FF_1234_5678_9AB0L
    def wav(samplesPerWin: Int, amp: Int, rate: Int) =
      AudioCodec.encodeWavPcm16(rate, 1, Array.tabulate(64 * samplesPerWin) { k =>
        val bit = ((p >>> (63 - k / samplesPerWin)) & 1L) == 1L
        if (bit) { if (k % 2 == 0) amp else -amp } else 0
      })
    // three byte-different encodings of the same envelope: identical hash
    val variants = Seq(wav(2, 5000, 8000), wav(5, 30000, 16000), wav(3, 1000, 44100))
    for (v <- variants)
      assert(AudioFingerprint.ahash64(v).longValue === p)
    assert(variants.map(_.length).distinct.size === 3)
    // all-silence: hash 0; junk and 8-bit: null
    assert(AudioFingerprint.ahash64(
      AudioCodec.encodeWavPcm16(8000, 1, new Array[Int](128))).longValue === 0L)
    assert(AudioFingerprint.ahash64("junk".getBytes) == null)
    val eightBit = wav(2, 100, 8000).clone(); eightBit(34) = 8
    assert(AudioFingerprint.ahash64(eightBit) == null)
    // expression path
    import org.apache.spark.sql.functions.col
    val got = Seq((1L, variants.head), (2L, "x".getBytes)).toDF("id", "blob")
      .select(col("id"), AudioAHash(col("blob")).as("h")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got(1L) === p && got(2L) == null)
  }

  test("round-trip: AudioMeta agrees with the writer's header") {
    val wav = AudioCodec.encodeWavPcm16(44100, 2, Array.fill(882)(7))
    val m = AudioHeaders.parse(wav)
    assert(m.channels === 2 && m.sampleRate === 44100 && m.bitsPerSample === 16)
    assert(m.nFrames === 441L && m.durationMs === 10L)
  }
}
