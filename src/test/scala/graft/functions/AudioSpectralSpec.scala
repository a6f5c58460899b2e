package graft.functions

import graft.SparkSpec

/**
 * Spectral dominant-bin fingerprint: planted square waves land in their
 * exact bins (harmonic margins make the argmax float-proof), silence and
 * DC windows read atonal, the hash is amplitude/length-invariant where it
 * should be, and foreign bytes are null.
 */
class AudioSpectralSpec extends SparkSpec {

  /** PCM16 blob of 16 windows x `m` samples; `f(w)` gives each window's
   *  planted frequency in cycles/window (0 = silence), `amp(w)` the
   *  square-wave amplitude. */
  private def blob(m: Int, f: Int => Int, amp: Int => Int): Array[Byte] = {
    val samples = Array.tabulate(16 * m) { k =>
      val w = k / m
      val j = k % m
      val fw = f(w)
      if (fw == 0) 0
      else {
        val p = m / fw
        if (j % p < p / 2) amp(w) else -amp(w)
      }
    }
    AudioCodec.encodeWavPcm16(16000, 1, samples)
  }

  test("planted square waves land in their exact bins") {
    val bins = Array(1, 2, 4, 0, 1, 4, 2, 0, 4, 1, 2, 4, 0, 2, 1, 4)
    val h = AudioSpectral.shash64(blob(64, bins, _ => 9000))
    assert(h != null)
    val expected = bins.zipWithIndex.map { case (b, w) => b.toLong << (4 * w) }.sum
    assert(h.longValue() == expected,
      s"got ${h.longValue().toHexString}, want ${expected.toHexString}")
  }

  test("amplitude and window-length changes keep every nibble") {
    val bins = Array(4, 2, 1, 0, 2, 4, 1, 2, 0, 4, 2, 1, 4, 0, 2, 1)
    val a = AudioSpectral.shash64(blob(64, bins, _ => 12000))
    val b = AudioSpectral.shash64(blob(64, bins, w => 300 + 700 * (w % 3)))
    val c = AudioSpectral.shash64(blob(32, bins, _ => 5000))
    assert(a != null && a == b && a == c)
  }

  test("pure-DC windows read atonal (nibble 0) like silence") {
    val m = 64
    val samples = Array.tabulate(16 * m) { k =>
      val w = k / m
      if (w % 2 == 0) 7000 // constant DC
      else 0 // silence
    }
    val h = AudioSpectral.shash64(AudioCodec.encodeWavPcm16(8000, 1, samples))
    assert(h != null && h.longValue() == 0L)
  }

  test("envelope hash vs spectral hash: pitch-preserving gain change") {
    // same pitches, wildly different amplitudes per window: spectral
    // nibbles identical; that's the complementary contract
    val bins = Array.tabulate(16)(w => Array(1, 2, 4)(w % 3))
    val x = AudioSpectral.shash64(blob(64, bins, _ => 20000))
    val y = AudioSpectral.shash64(blob(64, bins, w => 100 * (w + 1)))
    assert(x != null && x == y)
  }

  test("too-short streams and foreign bytes are null") {
    assert(AudioSpectral.shash64(
      AudioCodec.encodeWavPcm16(8000, 1, Array.fill(16 * 7)(5))) == null)
    assert(AudioSpectral.shash64("not wav".getBytes) == null)
    assert(AudioSpectral.shash64(null) == null)
  }

  test("audio_shash column + SQL registration") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.registerAll(spark)
    val bins = Array.tabulate(16)(w => if (w < 8) 2 else 0)
    val df = Seq((1L, blob(64, bins, _ => 4000))).toDF("id", "blob")
    df.createOrReplaceTempView("spectral_t")
    val viaCol = df.select(AudioSHash(col("blob"))).head.getLong(0)
    val viaSql = spark.sql("SELECT audio_shash(blob) FROM spectral_t").head.getLong(0)
    val expected = (0 until 8).map(w => 2L << (4 * w)).sum
    assert(viaCol == expected && viaSql == expected)
  }
}
