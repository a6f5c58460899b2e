package graft.functions

import graft.SparkSpec

/**
 * The PNG corners round 15 left null: Adam7 interlacing and 16-bit
 * depth — now decoded, round-tripped against our encoder under all five
 * filters and cross-checked against the JDK PNG reader; the corners that
 * REMAIN null (sub-byte depths) are contract-pinned.
 */
class PngCornersSpec extends SparkSpec {

  private def decode(b: Array[Byte]) = ImagePixels.decodeLuma(b)
  private val rnd = new scala.util.Random(11)

  test("interlaced gray/RGB round-trip under all five filters") {
    for (filter <- 0 to 4; channels <- Seq(1, 3)) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val px = Array.fill[Byte](w * h * channels)(rnd.nextInt(256).toByte)
      val g = decode(ImageCodec.encodePng(w, h, channels, px,
        filterType = filter, interlaced = true))
      assert(g != null, s"filter $filter ch $channels w=$w h=$h")
      val want = ImagePixels.decodeLuma(
        ImageCodec.encodePng(w, h, channels, px, filterType = 0))
      assert(java.util.Arrays.equals(g.luma, want.luma),
        s"interlaced != sequential (filter $filter ch $channels w=$w h=$h)")
    }
  }

  test("16-bit gray and RGB reduce to the high byte, all filters") {
    for (filter <- 0 to 4; channels <- Seq(1, 3)) {
      val w = 2 + rnd.nextInt(20); val h = 2 + rnd.nextInt(20)
      val hi = Array.fill[Byte](w * h * channels)(rnd.nextInt(256).toByte)
      val px16 = new Array[Byte](w * h * channels * 2)
      for (i <- hi.indices) {
        px16(2 * i) = hi(i) // big-endian high byte
        px16(2 * i + 1) = rnd.nextInt(256).toByte // low byte must not matter
      }
      val g = decode(ImageCodec.encodePng(w, h, channels, px16,
        filterType = filter, bitDepth = 16))
      assert(g != null)
      val want = decode(ImageCodec.encodePng(w, h, channels, hi, filterType = 0))
      assert(java.util.Arrays.equals(g.luma, want.luma),
        s"16-bit high-byte reduction diverged (filter $filter ch $channels)")
    }
  }

  test("16-bit AND interlaced together") {
    val w = 13; val h = 9
    val hi = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    val px16 = new Array[Byte](w * h * 2)
    for (i <- hi.indices) { px16(2 * i) = hi(i); px16(2 * i + 1) = 0x5a }
    val g = decode(ImageCodec.encodePng(w, h, 1, px16,
      filterType = 4, bitDepth = 16, interlaced = true))
    assert(g != null && java.util.Arrays.equals(g.luma,
      decode(ImageCodec.encodePng(w, h, 1, hi)).luma))
  }

  test("the JDK PNG reader agrees with our interlaced and 16-bit encodes") {
    val w = 17; val h = 11
    val px = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    val interlacedBlob = ImageCodec.encodePng(w, h, 1, px,
      filterType = 2, interlaced = true)
    val img8 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(interlacedBlob))
    assert(img8 != null)
    // compare RAW raster samples throughout: getRGB on the JDK's
    // linear-gray PNG rasters applies a gamma conversion our byte-exact
    // contract deliberately does not
    for (y <- 0 until h; x <- 0 until w)
      assert(img8.getRaster.getSample(x, y, 0) == (px(y * w + x) & 0xff),
        s"JDK reader disagrees on interlace at ($x,$y)")
    val px16 = new Array[Byte](w * h * 2)
    for (i <- px.indices) px16(2 * i) = px(i)
    val img16 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      ImageCodec.encodePng(w, h, 1, px16, filterType = 1, bitDepth = 16)))
    assert(img16 != null)
    for (y <- 0 until h; x <- 0 until w)
      assert((img16.getRaster.getSample(x, y, 0) >> 8) == (px(y * w + x) & 0xff),
        s"JDK reader disagrees on 16-bit at ($x,$y)")
  }

  test("contract: the corners that stay null are pinned") {
    // sub-byte depths (1/2/4) stay null — lossless but rare in crawls
    def withDepth(depth: Int): Array[Byte] = {
      val b = ImageCodec.encodePng(8, 8, 1, new Array[Byte](64))
      b(24) = depth.toByte // corrupts the IHDR CRC too — still must be null, not throw
      b
    }
    for (d <- Seq(1, 2, 4, 32)) assert(decode(withDepth(d)) == null)
    // 16-bit palette is illegal per spec
    val pal16 = ImageCodec.encodePng(8, 8, 1, new Array[Byte](128), bitDepth = 16)
    pal16(25) = 3
    assert(decode(pal16) == null)
    // truncations and mutations of interlaced/16-bit blobs never throw
    val full = ImageCodec.encodePng(16, 16, 1,
      Array.fill[Byte](512)(rnd.nextInt(256).toByte), bitDepth = 16, interlaced = true)
    for (_ <- 0 until 300) {
      decode(java.util.Arrays.copyOf(full, rnd.nextInt(full.length)))
      val m = full.clone(); m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      decode(m)
    }
  }
}
