package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Hand-rolled GIF LZW codec: self round-trips, BOTH-direction
 * cross-validation against the JDK's own GIF reader/writer, interlace,
 * dictionary growth and clear-reset regimes, and the corrupt-bytes
 * null contract.
 */
class GifCodecSpec extends SparkSpec {

  private def decode(b: Array[Byte]) = ImagePixels.decodeLuma(b)

  test("encodeGif -> decodeLuma round-trips gray pixels exactly, both row orders") {
    val rnd = new scala.util.Random(1)
    for (_ <- 0 until 20; inter <- Seq(false, true)) {
      val w = 1 + rnd.nextInt(60); val h = 1 + rnd.nextInt(60)
      val px = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
      val g = decode(ImageCodec.encodeGif(w, h, px, inter))
      assert(g != null, s"decode failed w=$w h=$h inter=$inter")
      assert(g.width == w && g.height == h)
      assert(java.util.Arrays.equals(g.luma, px), s"pixel mismatch w=$w h=$h inter=$inter")
    }
  }

  test("dictionary growth + clear resets: images past 4096 codes round-trip") {
    val rnd = new scala.util.Random(2)
    val px = Array.fill[Byte](120 * 90)(rnd.nextInt(256).toByte)
    val g = decode(ImageCodec.encodeGif(120, 90, px))
    assert(g != null && java.util.Arrays.equals(g.luma, px))
  }

  test("our encoder is readable by the JDK GIF reader (pixels exact)") {
    // ImageIO's GIF reader mishandles interlaced images with h < 5 (it
    // walks an empty pass); restrict the interlaced cross-check to h >= 8
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 8; inter <- Seq(false, true)) {
      val w = 8 + rnd.nextInt(50); val h = 8 + rnd.nextInt(50)
      val px = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ImageCodec.encodeGif(w, h, px, inter)))
      assert(img != null)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          assert((img.getRGB(x, y) & 0xff) == (px(y * w + x) & 0xff),
            s"JDK reader disagrees at ($x,$y) w=$w h=$h inter=$inter")
          x += 1
        }
        y += 1
      }
    }
  }

  test("JDK-written GIFs decode through our LZW (real-world compressed streams)") {
    val rnd = new scala.util.Random(4)
    for (_ <- 0 until 8) {
      val w = 3 + rnd.nextInt(50); val h = 3 + rnd.nextInt(50)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val px = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = rnd.nextInt(256); px(y * w + x) = v.toByte
        img.getRaster.setSample(x, y, 0, v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", bos)
      val g = decode(bos.toByteArray)
      assert(g != null)
      assert(java.util.Arrays.equals(g.luma, px),
        s"LZW decode of a JDK-compressed stream diverged (w=$w h=$h)")
    }
  }

  test("JPEG decodes through the ImageIO arm: dims exact, luma near-lossless on flats") {
    val img = new java.awt.image.BufferedImage(
      16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0xc8c8c8 else 0x323232)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val g = decode(bos.toByteArray)
    assert(g != null && g.width == 16 && g.height == 12)
    // JPEG is lossy: check block means, not exact bytes (flat regions
    // survive DCT within a couple of codes)
    def mean(x0: Int, x1: Int): Double =
      (for (y <- 2 until 10; x <- x0 until x1) yield g.luma(y * 16 + x) & 0xff)
        .sum.toDouble / (8 * (x1 - x0))
    assert(math.abs(mean(1, 7) - 0xc8) < 6, s"bright half off: ${mean(1, 7)}")
    assert(math.abs(mean(9, 15) - 0x32) < 6, s"dark half off: ${mean(9, 15)}")
    // and a JPEG twin of a PNG lands within small aHash Hamming distance:
    // the dedup contract ImageIO decode buys us
    val pxGray = Array.tabulate[Byte](64)(i => if ((i / 8 + i % 8) % 2 == 0) 200.toByte else 40.toByte)
    val png = ImageCodec.encodePng(8, 8, 1, pxGray)
    val big = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = pxGray(y * 8 + x) & 0xff
      big.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "jpg", jb)
    import spark.implicits._
    val hashes = Seq(("png", png), ("jpg", jb.toByteArray)).toDF("fmt", "blob")
      .select(col("fmt"), graft.operators.Dedup.imageAHash(col("blob")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = java.lang.Long.bitCount(hashes("png") ^ hashes("jpg"))
    assert(d <= 3, s"JPEG re-encode drifted $d aHash bits from its PNG twin")
  }

  test("GIF twins collapse with PNG/BMP twins at Hamming 0 through the shared hash") {
    import spark.implicits._
    val px = Array.tabulate[Byte](64)(i => if (i % 3 == 0) 255.toByte else 0)
    val blobs = Seq(
      (1L, ImageCodec.encodePng(8, 8, 1, px)),
      (2L, ImageCodec.encodeBmpGray(8, 8, px)),
      (3L, ImageCodec.encodeGif(8, 8, px)),
      (4L, ImageCodec.encodeGif(8, 8, px, interlaced = true))
    ).toDF("id", "blob")
    val hs = blobs.select(graft.operators.Dedup.imageAHash(col("blob")).as("h"))
      .collect().map(_.getLong(0)).toSet
    assert(hs.size == 1, s"cross-format twins split: $hs")
  }

  test("hostile JPEGs: corruption never throws, lying headers never allocate") {
    val img = new java.awt.image.BufferedImage(
      32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) img.setRGB(x, y, (x * 8) << 16 | (y * 10))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val valid = bos.toByteArray
    assert(decode(valid) != null)
    // the JDK reader throws CMMException / IllegalArgumentException /
    // raw IndexOutOfBounds on real-world corrupt JPEGs — all must be
    // null data, never a task-killing escape
    val rnd = new scala.util.Random(6)
    for (_ <- 0 until 500) {
      val flip = valid.clone()
      for (_ <- 0 to rnd.nextInt(4))
        flip(rnd.nextInt(flip.length)) = rnd.nextInt(256).toByte
      decode(flip) // must not throw
      decode(java.util.Arrays.copyOf(valid, 3 + rnd.nextInt(valid.length - 3)))
    }
    // lying-but-valid dimensions: patch the SOF0 height/width to 65500 —
    // the header cap must reject BEFORE ImageIO allocates the raster
    val big = valid.clone()
    var sof = -1
    for (i <- 0 until big.length - 1)
      if (sof < 0 && (big(i) & 0xff) == 0xff && (big(i + 1) & 0xff) == 0xc0) sof = i
    assert(sof > 0, "no SOF0 marker in the fixture")
    big(sof + 5) = 0xff.toByte; big(sof + 6) = 0xdc.toByte // height 65500
    big(sof + 7) = 0xff.toByte; big(sof + 8) = 0xdc.toByte // width 65500
    val t0 = System.nanoTime()
    assert(decode(big) == null)
    assert(System.nanoTime() - t0 < 2e9, "giant-dims JPEG was decoded, not rejected")
  }

  test("corrupt GIF bytes decode to null, never throw") {
    val rnd = new scala.util.Random(5)
    val valid = ImageCodec.encodeGif(8, 8, Array.fill[Byte](64)(rnd.nextInt(256).toByte))
    // any decode that survives corruption must at least be shape-consistent
    def wellFormed(g: ImagePixels.Luma): Boolean =
      g == null || g.luma.length == g.width * g.height
    for (trial <- 0 until 500) {
      // truncations: null or a shape-consistent partial parse, never a throw
      assert(wellFormed(decode(java.util.Arrays.copyOf(valid, rnd.nextInt(valid.length)))))
      // bit flips: either null or a decoded image — never an exception
      val flip = valid.clone()
      flip(rnd.nextInt(flip.length)) = rnd.nextInt(256).toByte
      assert(wellFormed(decode(flip)))
      // random junk behind a GIF signature
      val junk = Array.fill[Byte](14 + rnd.nextInt(100))(rnd.nextInt(256).toByte)
      System.arraycopy("GIF89a".getBytes, 0, junk, 0, 6)
      assert(wellFormed(decode(junk)))
    }
  }
}
