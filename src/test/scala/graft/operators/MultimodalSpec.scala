package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val jpegMagic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2, 3)
  private val pngMagic = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 9, 9)
  private val blobs = Seq(
    (1L, jpegMagic),
    (2L, pngMagic),
    (3L, Array[Byte](0, 1, 2, 3, 4)))
    .toDF("id", "blob")

  test("blob metadata: length, sha256, container sniffing") {
    val rows = Multimodal.withBlobMetadata(blobs, "blob")
      .select("id", "byte_len", "sha256", "container")
      .as[(Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(rows(1L)._2 === 7L && rows(1L)._4 === "jpeg")
    assert(rows(2L)._4 === "png")
    assert(rows(3L)._4 === "unknown")
    // sha256 matches JDK digest
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest(jpegMagic).map("%02x".format(_)).mkString
    assert(rows(1L)._3 === expect)
  }

  test("decodeImages appends deterministic stub features, preserves columns") {
    val out = Multimodal.decodeImages(blobs, "blob", Multimodal.StubDecoder)
    assert(out.columns.toSeq === Seq("id", "blob", "width", "height", "channels", "mean_luma"))
    val twice = Multimodal.decodeImages(blobs, "blob", Multimodal.StubDecoder)
      .select("id", "width", "height").as[(Long, Int, Int)].collect().toSet
    val once = out.select("id", "width", "height").as[(Long, Int, Int)].collect().toSet
    assert(once === twice)
    assert(once.forall { case (_, w, h) => w >= 64 && h >= 64 })
  }

  test("decodeImages default (real) decoder nulls out codec-less formats") {
    // the fake jpeg/png fragments are undecodable without an entropy codec
    val out = Multimodal.decodeImages(blobs, "blob")
      .select("id", "width").collect()
    assert(out.forall(_.isNullAt(1)))
  }

  test("sampleFrames fans out stride-sampled frame indexes per blob") {
    val big = Seq((1L, Array.fill[Byte](5000)(1))).toDF("id", "blob")
    val frames = Multimodal.sampleFrames(big, "blob", stride = 2, maxFrames = 3)
      .select("frame_idx").as[Int].collect().toSeq
    assert(frames === Seq(0, 2)) // nFrames = trunc(5000/1024) = 4 → stride-2 idx 0,2
  }
}
