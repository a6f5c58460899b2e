package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Headers-only WAV parsing against hand-assembled RIFF fixtures. */
class AudioHeadersSpec extends SparkSpec {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 44100 Hz stereo 16-bit, data = 4000 bytes => 1000 frames, 22 ms
  private val wav = hexBytes(
    "52494646 24100000 57415645" +
      " 666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
      " 64617461 A00F0000") ++ new Array[Byte](4000)

  // same, but a LIST chunk (odd size, testing even-padding) precedes fmt
  private val wavWithList = hexBytes(
    "52494646 33100000 57415645" +
      " 4C495354 05000000 49 4E 46 4F 58 00" + // LIST, size 5, padded to 6
      " 666D7420 10000000 0100 0100 803E0000 007D0000 0200 1000" +
      " 64617461 A00F0000") ++ new Array[Byte](4000)

  test("WAV fmt + data chunks parse; frame count and duration follow") {
    assert(AudioHeaders.parse(wav) ==
      AudioHeaders.WavMeta(2, 44100, 16, 1000L, 22L))
    // mono 16000 Hz: 4000 bytes / 2 = 2000 frames, 125 ms; the chunk walk
    // skipped the odd-sized LIST chunk with its pad byte
    assert(AudioHeaders.parse(wavWithList) ==
      AudioHeaders.WavMeta(1, 16000, 16, 2000L, 125L))
  }

  test("garbage, truncation and lying sizes return null, never throw or loop") {
    assert(AudioHeaders.parse(null) == null)
    assert(AudioHeaders.parse("RIFFnotawave".getBytes) == null)
    assert(AudioHeaders.parse(wav.take(40)) == null)
    // a data chunk size of 0 with no fmt must not loop
    assert(AudioHeaders.parse(hexBytes(
      "52494646 0C000000 57415645 64617461 00000000")) == null)
    def check(prop: org.scalacheck.Prop): Unit = {
      val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
      assert(res.passed, res.status.toString)
    }
    check(org.scalacheck.Prop.forAll { (bytes: Array[Byte]) =>
      AudioHeaders.parse(bytes); true
    })
    check(org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.choose(0, 43), org.scalacheck.Gen.choose(0, 255)) { (pos, v) =>
      val b = wav.clone(); b(pos) = v.toByte
      AudioHeaders.parse(b); true
    })
  }

  test("audio_meta expression evaluates in a plan") {
    import spark.implicits._
    val rows = Seq(("wav", wav), ("txt", "nope".getBytes)).toDF("name", "blob")
      .withColumn("m", AudioMeta(col("blob")))
      .select(col("name"), col("m.channels"), col("m.sample_rate"),
        col("m.n_frames"), col("m.duration_ms"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))))
      .toMap
    assert(rows("wav").contains((2, 44100, 1000L, 22L)))
    assert(rows("txt").isEmpty)
  }
}
