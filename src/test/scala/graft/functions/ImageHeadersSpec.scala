package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Headers-only image parsing against hand-assembled format fixtures —
 *  real public container layouts, byte by byte, no codec involved. */
class ImageHeadersSpec extends SparkSpec {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 3x2 PNG, bit depth 8, color type 2 (rgb)
  private val png = hexBytes(
    "89504E470D0A1A0A 0000000D 49484452 00000003 00000002 08 02 000000")
  // 640x480 GIF89a (little-endian dims)
  private val gif = hexBytes("474946383961 8002 E001 F7")
  // JPEG: SOI, APP0 (16 bytes), COM segment, SOF0 257x65534, 3 components
  private val jpeg = hexBytes(
    "FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 0000" +
      " FFFE 0004 4849" + // COM segment 'HI' (len 4)
      " FFC0 0011 08 FFFE 0101 03 011100 021101 031101")
  // 7x9 BMP, 24 bpp
  private val bmp = hexBytes(
    "424D 46000000 00000000 36000000 28000000 07000000 09000000 0100 1800" +
      " 00000000 10000000 130B0000 130B0000 00000000 00000000")

  // WEBP VP8 (lossy): RIFF/WEBP, frame tag, sync 9D012A, 14-bit LE dims 550x368
  private val webpVp8 = hexBytes(
    "52494646 24000000 57454250 56503820 18000000 9A0100 9D012A 2602 7001 00")
  // WEBP VP8L (lossless): sig 2F, LE32 bits = (16-1) | (8-1)<<14 | 1<<28
  private val webpVp8l = hexBytes(
    "52494646 11000000 57454250 5650384C 05000000 2F 0FC00110")
  // WEBP VP8X (extended): alpha flag 0x10, 24-bit canvas 1023x511
  private val webpVp8x = hexBytes(
    "52494646 12000000 57454250 56503858 0A000000 10 000000 FF0300 FF0100")

  test("PNG / GIF / JPEG / BMP dimensions parse from real header bytes") {
    assert(ImageHeaders.parse(png) == ImageHeaders.Dims(3, 2, 3, "png"))
    assert(ImageHeaders.parse(gif) == ImageHeaders.Dims(640, 480, 1, "gif"))
    assert(ImageHeaders.parse(jpeg) == ImageHeaders.Dims(257, 65534, 3, "jpeg"))
    assert(ImageHeaders.parse(bmp) == ImageHeaders.Dims(7, 9, 3, "bmp"))
  }

  test("WEBP VP8 / VP8L / VP8X dimensions parse from real header bytes") {
    assert(ImageHeaders.parse(webpVp8) == ImageHeaders.Dims(550, 368, 3, "webp"))
    assert(ImageHeaders.parse(webpVp8l) == ImageHeaders.Dims(16, 8, 4, "webp"))
    assert(ImageHeaders.parse(webpVp8x) == ImageHeaders.Dims(1024, 512, 4, "webp"))
    // VP8X without the alpha flag: 3 channels
    val noAlpha = webpVp8x.clone(); noAlpha(20) = 0
    assert(ImageHeaders.parse(noAlpha).channels == 3)
    // broken VP8 sync code / VP8L signature / VP8L version bits -> null
    val badSync = webpVp8.clone(); badSync(23) = 0x11
    assert(ImageHeaders.parse(badSync) == null)
    val badSig = webpVp8l.clone(); badSig(20) = 0x30
    assert(ImageHeaders.parse(badSig) == null)
    val badVer = webpVp8l.clone(); badVer(24) = 0x21 // version bits != 0
    assert(ImageHeaders.parse(badVer) == null)
    // unknown first chunk in a WEBP RIFF -> null
    val badCc = webpVp8.clone(); badCc(15) = 'Z'
    assert(ImageHeaders.parse(badCc) == null)
  }

  test("png color types map to channel counts; gray png") {
    val gray = png.clone(); gray(25) = 0
    assert(ImageHeaders.parse(gray).channels == 1)
    val rgba = png.clone(); rgba(25) = 6
    assert(ImageHeaders.parse(rgba).channels == 4)
  }

  test("garbage, truncation and non-images return null, never throw") {
    assert(ImageHeaders.parse(null) == null)
    assert(ImageHeaders.parse(Array[Byte](1, 2, 3)) == null)
    assert(ImageHeaders.parse("just some text bytes here".getBytes) == null)
    assert(ImageHeaders.parse(png.take(20)) == null) // IHDR cut short
    assert(ImageHeaders.parse(jpeg.take(6)) == null) // marker scan runs dry
    // JPEG with a lying zero-length segment must not loop forever
    val evil = hexBytes("FFD8 FFE0 0000 FFC0")
    assert(ImageHeaders.parse(evil) == null)
  }

  test("parse never throws on arbitrary bytes or mutated valid headers") {
    def check(prop: org.scalacheck.Prop): Unit = {
      val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
      assert(res.passed, res.status.toString)
    }
    // pure fuzz: any byte soup parses to a Dims or null, never an exception
    check(org.scalacheck.Prop.forAll { (bytes: Array[Byte]) =>
      ImageHeaders.parse(bytes); true
    })
    // structured fuzz: flip one byte anywhere in a VALID header — the
    // marker scans must stay in-bounds and loop-free
    val fixtures = Seq(png, gif, jpeg, bmp, webpVp8, webpVp8l, webpVp8x)
    check(org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.choose(0, 6), org.scalacheck.Gen.choose(0, 255),
      org.scalacheck.Gen.choose(0, 255)) { (fi, pos, v) =>
      val b = fixtures(fi).clone()
      b(pos % b.length) = v.toByte
      ImageHeaders.parse(b); true
    })
  }

  test("image_dims expression evaluates in a plan (codegen path)") {
    import spark.implicits._
    val df = Seq(("png", png), ("gif", gif), ("jpeg", jpeg), ("txt", "nope".getBytes))
      .toDF("name", "blob")
      .withColumn("d", ImageDims(col("blob")))
      .select(col("name"), col("d.width"), col("d.height"), col("d.channels"), col("d.format"))
    val rows = df.collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))).toMap
    assert(rows("png").contains((3, 2, 3, "png")))
    assert(rows("gif").contains((640, 480, 1, "gif")))
    assert(rows("jpeg").contains((257, 65534, 3, "jpeg")))
    assert(rows("txt").isEmpty)
  }
}
