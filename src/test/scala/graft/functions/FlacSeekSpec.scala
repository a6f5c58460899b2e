package graft.functions

import graft.SparkSpec

/** FLAC SEEKTABLE planning + offset-aware decode: plan rows name real
 *  frames, decodeFrom(seekpoint) ≡ the full decode's tail bit-for-bit,
 *  lying seekpoints cost a null — the audio twin of stss/Cues planning. */
class FlacSeekSpec extends SparkSpec {

  private def pattern(n: Int, amp: Int): Array[Int] =
    Array.tabulate(n)(j => if (j % 3 == 0) amp else if (j % 3 == 1) -amp else 0)

  test("seekpoints: planted table parses; offsets land on frame syncs") {
    val samples = pattern(100, 900)
    val b = FlacCodec.encodePcm16(16000, 1, samples, blockSize = 16, seekEvery = 2)
    val pts = FlacSeek.seekpoints(b, 64)
    // frames of 16 samples: 7 frames (6x16 + 4), points at frames 0,2,4,6
    assert(pts.map(p => (p._1, p._3)).toSeq ==
      Seq((0L, 16), (32L, 16), (64L, 16), (96L, 4)))
    // each absolute offset points at a frame sync (FF F8)
    for ((_, off, _) <- pts) {
      assert((b(off.toInt) & 0xff) == 0xff)
      assert((b(off.toInt + 1) & 0xf8) == 0xf8)
    }
    // maxPoints caps
    assert(FlacSeek.seekpoints(b, 2).length == 2)
    // a stream WITHOUT a seektable plans null (nothing to say)
    val plain = FlacCodec.encodePcm16(16000, 1, samples, blockSize = 16)
    assert(FlacSeek.seekpoints(plain, 64) == null)
  }

  test("decodeFrom(seekpoint) ≡ full decode tail, bit for bit — every point, mono + stereo + 24-bit") {
    val mono = FlacCodec.encodePcm16(16000, 1, pattern(100, 900),
      blockSize = 16, seekEvery = 2)
    val st = {
      val n = 60
      val inter = new Array[Int](n * 2)
      for (k <- 0 until n) { inter(2 * k) = k * 7 - 100; inter(2 * k + 1) = -k * 5 }
      FlacCodec.encodePcm16(8000, 2, inter, blockSize = 8, stereo = "midside",
        seekEvery = 3)
    }
    val deep = FlacCodec.encodePcm16(16000, 1,
      pattern(50, 70000), blockSize = 16, bits = 24, seekEvery = 2)
    for ((b, ch) <- Seq((mono, 1), (st, 2), (deep, 1))) {
      val full = FlacPcm.decode(b, 1 << 20)
      assert(full != null)
      for ((sOff, bOff, _) <- FlacSeek.seekpoints(b, 64)) {
        val tail = FlacPcm.decodeFrom(b, sOff, bOff, 1 << 20)
        assert(tail != null, s"decodeFrom failed at sample $sOff")
        assert(tail.samples.toSeq ==
          full.samples.drop((sOff * ch).toInt).toSeq,
          s"tail from $sOff diverges")
      }
    }
  }

  test("lying seekpoints are null, never misplaced audio") {
    val b = FlacCodec.encodePcm16(16000, 1, pattern(100, 900),
      blockSize = 16, seekEvery = 2)
    val pts = FlacSeek.seekpoints(b, 64)
    val (s1, o1, _) = pts(1)
    // right byte offset, wrong sample: the frame's coded number disagrees
    assert(FlacPcm.decodeFrom(b, s1 + 16, o1, 1 << 20) == null)
    assert(FlacPcm.decodeFrom(b, 0L, o1, 1 << 20) == null)
    // byte offset into the middle of a frame: no sync/CRC -> null
    assert(FlacPcm.decodeFrom(b, s1, o1 + 3, 1 << 20) == null)
    // out-of-range requests
    assert(FlacPcm.decodeFrom(b, -1L, o1, 1 << 20) == null)
    assert(FlacPcm.decodeFrom(b, 1000L, o1, 1 << 20) == null)
    // ascending violation in the TABLE ends the plan
    val mut = b.clone()
    // swap the sample numbers of points 1 and 2 (table starts after the
    // STREAMINFO block: 4 + 4 + 34 = 42, +4 header -> entries at 46)
    val t = 46
    for (k <- 0 until 8) {
      val tmp = mut(t + 18 + k)
      mut(t + 18 + k) = mut(t + 36 + k)
      mut(t + 36 + k) = tmp
    }
    val cut = FlacSeek.seekpoints(mut, 64)
    assert(cut.length == 2) // point 0, then the swapped-high point... then stop
    // placeholder points are skipped
    val ph = b.clone()
    for (k <- 0 until 8) ph(t + k) = 0xff.toByte
    assert(FlacSeek.seekpoints(ph, 64).map(_._1).toSeq == Seq(32L, 64L, 96L))
    // truncation / bit-flip fuzz never throws
    for (cutAt <- 0 until b.length by 11) {
      FlacSeek.seekpoints(b.take(cutAt), 8)
      FlacPcm.decodeFrom(b.take(cutAt), 32L, 60L, 1 << 16)
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val m = b.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      FlacSeek.seekpoints(m, 8)
      val p = FlacSeek.seekpoints(m, 8)
      if (p != null && p.nonEmpty) FlacPcm.decodeFrom(m, p(0)._1, p(0)._2, 1 << 16)
    }
  }

  test("SQL surface: flac_seekpoints + flac_pcm_from compose with audio_stats") {
    val spark = this.spark
    import spark.implicits._
    graft.functions.registerAll(spark)
    val b = FlacCodec.encodePcm16(16000, 1, pattern(100, 900),
      blockSize = 16, seekEvery = 2)
    val row = Seq(Tuple1(b)).toDF("blob").selectExpr(
      "size(flac_seekpoints(blob, 64)) AS n_points",
      """audio_stats(flac_pcm_from(blob,
        |  element_at(flac_seekpoints(blob, 64), -1).sample_off,
        |  element_at(flac_seekpoints(blob, 64), -1).byte_off, 1048576),
        |  50).n_samples AS tail_n""".stripMargin).head()
    assert(row.getInt(0) == 4)
    assert(row.getLong(1) == 4L) // 100 samples, last point at 96
  }
}
