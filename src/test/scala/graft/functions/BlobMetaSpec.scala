package graft.functions

import graft.SparkSpec

/** id3_tags / npy_meta / image_stats: field fidelity, encodings, and the
 *  corrupt-bytes null contract. */
class BlobMetaSpec extends SparkSpec {

  // ----------------------------------------------------------------- ID3

  test("ID3v2.3 and v2.4 text frames in all four encodings") {
    for (major <- Seq(3, 4)) {
      val b = Id3Codec.encode(major, Seq(
        ("TIT2", "A Title", 0),
        ("TPE1", "Artist éü", 1), // Latin-1-unsafe, UTF-16+BOM
        ("TALB", "Album АБ", 2), // UTF-16BE
        ("TDRC", "2023-04-01", 3)))
      val tags = Id3Headers.parse(b).toMap
      assert(tags == Map(
        "TIT2" -> "A Title",
        "TPE1" -> "Artist éü",
        "TALB" -> "Album АБ",
        "TDRC" -> "2023-04-01"), s"major=$major got $tags")
    }
  }

  test("values trim at NUL; padding ends the walk; tag in front of MP3 parses") {
    val b = Id3Codec.encode(4, Seq(("TIT2", "keep\u0000drop", 3)), padding = 64)
    assert(Id3Headers.parse(b).toMap == Map("TIT2" -> "keep"))
    // duplicate frame ids keep the FIRST value (Spark maps need unique keys)
    val dup = Id3Headers.parse(Id3Codec.encode(3,
      Seq(("TIT2", "first", 0), ("TIT2", "second", 3))))
    assert(dup == Seq(("TIT2", "first")))
    val mp3 = Id3Codec.encode(3, Seq(("TCON", "Rock", 0))) ++
      CodedAudioCodec.encodeMp3(10, 3, 9, 0, mono = true, nFrames = 2)
    assert(Id3Headers.parse(mp3).toMap == Map("TCON" -> "Rock"))
    // ...and the frame parser still reads the stream behind the tag
    assert(Mp3Headers.parse(mp3) != null)
  }

  test("ID3 unsynchronisation: v2.3 whole-tag and v2.4 per-frame stuffing decode clean") {
    // 'ÿ' is 0xFF in Latin-1 — the byte unsync stuffing targets; common
    // on older v2.3 writers, previously decoded garbled
    val v23 = Id3Codec.encode(3,
      Seq(("TIT2", "aÿb", 0), ("TPE1", "Artist éü", 1)), unsync = true)
    assert((v23(5) & 0x80) != 0) // flag actually set on the fixture
    assert(Id3Headers.parse(v23).toMap ==
      Map("TIT2" -> "aÿb", "TPE1" -> "Artist éü"))
    // v2.4: per-frame format flag 0x02, frame size counts stuffed bytes;
    // the UTF-16 BOM (FE FF/FF FE) is itself a stuffing site
    val v24 = Id3Codec.encode(4,
      Seq(("TIT2", "xÿy", 0), ("TALB", "Альбом", 1)), unsync = true)
    assert(Id3Headers.parse(v24).toMap ==
      Map("TIT2" -> "xÿy", "TALB" -> "Альбом"))
    // stuffed multi-frame walk stays aligned: a frame AFTER an unsynced
    // one still parses (the size fields carry the walk, not the data)
    val multi = Id3Codec.encode(4,
      Seq(("TPE1", "ÿÿÿ", 0), ("TCON", "Rock", 3)), unsync = true)
    assert(Id3Headers.parse(multi).toMap ==
      Map("TPE1" -> "ÿÿÿ", "TCON" -> "Rock"))
    // control: the same frames without unsync are unchanged by the fix
    assert(Id3Headers.parse(Id3Codec.encode(3,
      Seq(("TIT2", "aÿb", 0)))).toMap == Map("TIT2" -> "aÿb"))
  }

  test("ID3 corrupt bytes: null for no tag, truncations never throw") {
    assert(Id3Headers.parse("no tag here".getBytes) == null)
    assert(Id3Headers.parse(null) == null)
    val good = Id3Codec.encode(4, Seq(("TIT2", "x", 3), ("TPE1", "y", 0)))
    for (cut <- 0 until good.length) Id3Headers.parseMap(good.take(cut))
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Id3Headers.parseMap(b)
    }
  }

  // ----------------------------------------------------------------- npy

  test("npy v1/v2 headers: dtype, order, shape, element count, payload size") {
    for (v2 <- Seq(false, true)) {
      val b = NpyCodec.encode("<f4", fortran = false, Seq(3L, 4L, 5L),
        dataBytes = 240, v2 = v2)
      val m = NpyHeaders.parse(b)
      assert(m != null, s"v2=$v2")
      assert(m.descr == "<f4" && !m.fortran)
      assert(m.shape.toSeq == Seq(3L, 4L, 5L) && m.nElems == 60)
      assert(b.length - m.headerLen == 240)
    }
    // scalar (0-d) and 1-d forms np.save emits
    assert(NpyHeaders.parse(NpyCodec.encode("<i8", false, Nil, 8)).nElems == 1)
    val one = NpyHeaders.parse(NpyCodec.encode("|u1", true, Seq(7L), 7))
    assert(one.fortran && one.shape.toSeq == Seq(7L) && one.nElems == 7)
  }

  test("npy corrupt bytes: null, never exceptions") {
    assert(NpyHeaders.parse("NUMPZ".getBytes("ISO-8859-1")) == null)
    assert(NpyHeaders.parse(null) == null)
    val good = NpyCodec.encode("<f4", false, Seq(2L, 2L), 16)
    for (cut <- 0 until good.length) NpyHeaders.parseRow(good.take(cut))
    val rnd = new scala.util.Random(14)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      NpyHeaders.parseRow(b)
    }
  }

  // --------------------------------------------------------- image stats

  test("image_stats fields are integer-exact on planted rasters") {
    // 4x2: rows [0,0,255,255] twice -> mean 127, 2 distinct, edges: the
    // 0->255 step once per row = 2 of 6 horizontal pairs -> 333 milli
    val px = Array[Byte](0, 0, -1, -1, 0, 0, -1, -1)
    val r = ImageStatsEval.statsRow(ImageCodec.encodePng(4, 2, 1, px))
    assert(r != null)
    assert(r.getInt(0) == 4 && r.getInt(1) == 2)
    assert(r.getInt(2) == 127 && r.getInt(3) == 0 && r.getInt(4) == 255)
    assert(r.getInt(5) == 2)
    assert(r.getInt(6) == 333)
    // flat image: 1 distinct value, zero edges -> the blank-filter case
    val flat = ImageStatsEval.statsRow(
      ImageCodec.encodeBmpGray(5, 5, Array.fill[Byte](25)(42)))
    assert(flat.getInt(5) == 1 && flat.getInt(6) == 0 && flat.getInt(2) == 42)
    assert(ImageStatsEval.statsRow("not an image".getBytes) == null)
  }
}
