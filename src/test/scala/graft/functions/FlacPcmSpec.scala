package graft.functions

import graft.SparkSpec

/** FLAC sample decode: planted PCM through the real encoder (Rice coding,
 *  fixed/LPC predictors, stereo decorrelation) comes back bit-for-bit,
 *  and the decoded WAV feeds the whole PCM operator battery. */
class FlacPcmSpec extends SparkSpec {

  private def rndPcm(n: Int, seed: Int, amp: Int = 20000): Array[Int] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(2 * amp + 1) - amp)
  }

  private def roundTrip(samples: Array[Int], channels: Int, mode: String,
      stereo: String = "independent", blockSize: Int = 4096): Unit = {
    val flac = FlacCodec.encodePcm16(16000, channels, samples,
      blockSize = blockSize, mode = mode, stereo = stereo)
    val d = FlacPcm.decode(flac, 1 << 25)
    assert(d != null, s"mode=$mode stereo=$stereo failed to decode")
    assert(d.sampleRate == 16000 && d.channels == channels)
    assert(d.samples.toSeq == samples.toSeq,
      s"mode=$mode stereo=$stereo: samples differ")
  }

  test("round trip across subframe codings, block boundaries and odd tails") {
    val mono = rndPcm(10000, 1) // spans 3 blocks of 4096 with a 1808 tail
    for (mode <- Seq("fixed0", "fixed1", "fixed2", "fixed3", "fixed4",
        "verbatim", "lpc1"))
      roundTrip(mono, 1, mode)
    // a smooth ramp exercises small residuals / param-0 Rice
    roundTrip(Array.tabulate(5000)(i => (i % 3000) - 1500), 1, "fixed2")
    // constant runs hit the CONSTANT subframe
    roundTrip(Array.fill(4096 + 17)(1234), 1, "fixed2")
    // tiny stream (single short frame)
    roundTrip(Array(5, -7, 9), 1, "fixed2")
    roundTrip(Array(42), 1, "verbatim")
  }

  test("stereo decorrelation: left/side, right/side, mid/side reconstruct exactly") {
    val st = rndPcm(2 * 3000, 2)
    for (stereo <- Seq("independent", "leftside", "rightside", "midside"))
      for (mode <- Seq("fixed2", "verbatim"))
        roundTrip(st, 2, mode, stereo)
    // full-scale extremes through the side channel's 17th bit
    val rails = Array.tabulate(2 * 100)(i =>
      if (i % 4 < 2) 32767 else -32768)
    for (stereo <- Seq("leftside", "rightside", "midside"))
      roundTrip(rails, 2, "verbatim", stereo)
  }

  test("8/12/20/24-bit streams normalize to PCM16: high bits kept, noise bits dropped") {
    val s16 = rndPcm(5000, 7)
    // 24-bit: the 16-bit pattern in the high bits, NOISE in the low 8 —
    // the q222 16-bit-PNG discipline: low bits must not matter
    val s24 = s16.zipWithIndex.map { case (v, i) => v * 256 + (i % 251) }
    val d24 = FlacPcm.decode(
      FlacCodec.encodePcm16(16000, 1, s24, bits = 24), 1 << 25)
    assert(d24 != null && d24.samples.toSeq == s16.toSeq)
    // 8-bit scales UP by 256
    val s8 = Array.tabulate(3000)(i => (i % 200) - 100)
    val d8 = FlacPcm.decode(
      FlacCodec.encodePcm16(16000, 1, s8, bits = 8), 1 << 25)
    assert(d8 != null && d8.samples.toSeq == s8.map(_ * 16 * 16).toSeq)
    // 12 and 20 bits, stereo mid/side at 24-bit
    val s12 = Array.tabulate(2000)(i => (i % 4000) - 2000)
    val d12 = FlacPcm.decode(
      FlacCodec.encodePcm16(16000, 1, s12, bits = 12), 1 << 25)
    assert(d12 != null && d12.samples.toSeq == s12.map(_ << 4).toSeq)
    val s20 = s16.zipWithIndex.map { case (v, i) => v * 16 + (i % 13) }
    val d20 = FlacPcm.decode(
      FlacCodec.encodePcm16(16000, 1, s20, bits = 20), 1 << 25)
    assert(d20 != null && d20.samples.toSeq == s16.toSeq)
    val st24 = rndPcm(2 * 1000, 8).map(_ * 256 + 7)
    val dst = FlacPcm.decode(FlacCodec.encodePcm16(16000, 2, st24,
      bits = 24, stereo = "midside"), 1 << 25)
    assert(dst != null && dst.samples.toSeq == st24.map(v => v >> 8).toSeq)
  }

  test("decoded stats match the WAV twin bit-for-bit through audio_stats") {
    val samples = rndPcm(6000, 3)
    val flac = FlacCodec.encodePcm16(8000, 1, samples)
    val wav = AudioCodec.encodeWavPcm16(8000, 1, samples)
    val viaFlac = AudioSamples.statsRow(FlacPcm.toWav(flac, 1 << 25), 100)
    val viaWav = AudioSamples.statsRow(wav, 100)
    assert(viaFlac != null && viaWav != null)
    for (i <- 0 until 5)
      assert(viaFlac.getLong(i) == viaWav.getLong(i), s"stats field $i differs")
    // ...and the envelope fingerprint (the dedup signature) is identical
    assert(AudioFingerprint.ahash64(FlacPcm.toWav(flac, 1 << 25)) ==
      AudioFingerprint.ahash64(wav))
  }

  test("CRC gates, lying headers and caps decode to null, never throw") {
    val samples = rndPcm(2000, 4)
    val good = FlacCodec.encodePcm16(16000, 1, samples)
    // header CRC-8 flip: find the first frame (after fLaC + 4 + 34 header)
    val frameAt = 4 + 4 + 34
    val badH = good.clone()
    // flip a bit inside the frame header region (the sync byte's neighbor)
    badH(frameAt + 2) = (badH(frameAt + 2) ^ 1).toByte
    assert(FlacPcm.decode(badH, 1 << 25) == null)
    // payload corruption is caught by the frame CRC-16
    val badP = good.clone()
    badP(good.length - 40) = (badP(good.length - 40) ^ 0x10).toByte
    assert(FlacPcm.decode(badP, 1 << 25) == null)
    // sample cap: refuse, don't truncate
    assert(FlacPcm.decode(good, 1000) == null)
    assert(FlacPcm.decode(good, 2000) != null)
    // depths past 24 bits stay behind the seam
    assert(FlacPcm.decode(CodedAudioCodec.encodeFlac(16000, 1, 32, 100), 1 << 25) == null)
    // truncation / bit-flip fuzz: null or correct, never an exception
    for (cut <- 0 until good.length by 3) FlacPcm.decode(good.take(cut), 1 << 25)
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val d = FlacPcm.decode(b, 1 << 25)
      // any successful decode under corruption must still be sane-sized
      if (d != null) assert(d.samples.length == samples.length)
    }
    assert(FlacPcm.decode(null, 1 << 25) == null)
    assert(FlacPcm.decode("not flac".getBytes, 1 << 25) == null)
  }

  test("flac_pcm as a column composes with the PCM battery and SQL") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.registerAll(spark)
    val samples = rndPcm(3000, 6)
    val df = Seq((1L, FlacCodec.encodePcm16(16000, 1, samples)),
      (2L, "junk".getBytes)).toDF("id", "blob")
    val r = df.select(col("id"),
      AudioStats(FlacPcmExpr(col("blob")), 100).as("st"))
      .select(col("id"), col("st.n_samples")).collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(r(1L) == 3000L && r(2L) == -1L)
    df.createOrReplaceTempView("flac_t")
    val viaSql = spark.sql(
      "SELECT audio_stats(flac_pcm(blob, 1048576), 100).n_samples FROM flac_t WHERE id = 1")
      .head.getLong(0)
    assert(viaSql == 3000L)
  }
}
