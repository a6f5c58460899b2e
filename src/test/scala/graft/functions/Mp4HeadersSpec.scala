package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Headers-only MP4 parsing against hand-assembled ISO BMFF fixtures. */
class Mp4HeadersSpec extends SparkSpec {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ftyp(isom) + free box + moov[mvhd v0: timescale 1000, duration 5000]
  private val mp4v0 = hexBytes(
    "00000010 66747970 69736F6D 00000000" +
      " 0000000C 66726565 DEADBEEF" + // free box (12 bytes) between ftyp and moov
      " 00000074 6D6F6F76" +
      " 0000006C 6D766864 00000000 00000000 00000000 000003E8 00001388" +
      " " + "00" * 80)

  // mvhd VERSION 1: 64-bit times, timescale 90000, duration 450000 (5 s)
  private val mp4v1 = hexBytes(
    "00000010 66747970 6D703432 00000000" +
      " 00000080 6D6F6F76" +
      " 00000078 6D766864 01000000 0000000000000000 0000000000000000" +
      " 00015F90 000000000006DDD0" +
      " " + "00" * 80)

  test("mvhd v0 and v1 parse: brand, timescale, duration, derived ms") {
    assert(Mp4Headers.parse(mp4v0) == Mp4Headers.Mp4Meta("isom", 1000L, 5000L, 5000L))
    assert(Mp4Headers.parse(mp4v1) == Mp4Headers.Mp4Meta("mp42", 90000L, 450000L, 5000L))
  }

  test("garbage, truncation and lying sizes return null, never throw or loop") {
    assert(Mp4Headers.parse(null) == null)
    assert(Mp4Headers.parse("definitely not a movie file".getBytes) == null)
    assert(Mp4Headers.parse(mp4v0.take(30)) == null)
    // a moov claiming size 0 at EOF with no mvhd inside
    assert(Mp4Headers.parse(hexBytes(
      "00000010 66747970 69736F6D 00000000 00000000 6D6F6F76")) == null)
    def check(prop: org.scalacheck.Prop): Unit = {
      val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
      assert(res.passed, res.status.toString)
    }
    check(org.scalacheck.Prop.forAll { (bytes: Array[Byte]) =>
      Mp4Headers.parse(bytes); true
    })
    check(org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.choose(0, mp4v0.length - 1),
      org.scalacheck.Gen.choose(0, 255)) { (pos, v) =>
      val b = mp4v0.clone(); b(pos) = v.toByte
      Mp4Headers.parse(b); true
    })
  }

  test("video_meta expression evaluates in a plan") {
    import spark.implicits._
    val rows = Seq(("v0", mp4v0), ("txt", "nope".getBytes)).toDF("name", "blob")
      .withColumn("m", VideoMeta(col("blob")))
      .select(col("name"), col("m.brand"), col("m.timescale"), col("m.duration_ms"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getString(1), r.getLong(2), r.getLong(3)))))
      .toMap
    assert(rows("v0").contains(("isom", 1000L, 5000L)))
    assert(rows("txt").isEmpty)
  }
}
