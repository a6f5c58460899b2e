package graft.functions

import graft.SparkSpec

/** Ogg granule seek planning ([[OggSeek]] / `ogg_pagepoints`): the page
 *  walk IS the seek index — (granule, next-page byte offset) points,
 *  decimated evenly past maxPoints with the final point always kept. */
class OggSeekSpec extends SparkSpec {

  // vorbisPaged layout: BOS page = 27 + 1 + 30 = 58 bytes; each data
  // page = 27 + 1 + body bytes
  private val BosLen = 58L

  test("points are (granule, next page offset); -1 granules carry none") {
    val b = OggCodec.vorbisPaged(2, 44100, Seq(100L, -1L, 250L, 400L))
    val page = 27L + 1 + 16
    val pts = OggSeek.pagepoints(b, 64)
    assert(pts.toSeq == Seq(
      (0L, BosLen), // BOS page (granule 0): decode from the start
      (100L, BosLen + page),
      // the -1 page spans a packet: no point, but offsets keep counting
      (250L, BosLen + 3 * page),
      (400L, BosLen + 4 * page)))
    // the final point addresses the end of the stream exactly
    assert(pts.last._2 == b.length.toLong)
    // a tail selection: samples after granule 250 start at the last
    // planned offset before/at it
    val target = 300L
    val from = pts.filter(_._1 <= target).maxBy(_._1)
    assert(from == ((250L, BosLen + 3 * page)))
  }

  test("decimation keeps even spacing, the first point, and the FINAL point") {
    val granules = (1 to 200).map(_ * 10L)
    val b = OggCodec.vorbisPaged(1, 8000, granules)
    val pts = OggSeek.pagepoints(b, 8)
    assert(pts.length <= 8 && pts.length >= 4)
    assert(pts.map(_._1).toSeq == pts.map(_._1).sorted.toSeq)
    assert(pts.head._1 == 0L) // BOS point survives
    assert(pts.last == ((2000L, b.length.toLong)), "tail point must survive")
    // evenly spaced: consecutive granule gaps within 2x of each other
    val gaps = pts.map(_._1).sliding(2).map(p => p(1) - p(0)).toSeq.dropRight(1)
    if (gaps.size > 2)
      assert(gaps.max <= 2 * math.max(1L, gaps.min) + 10,
        s"uneven decimation: $gaps")
  }

  test("hostile bytes: null for non-ogg, truncation/lying granules end the plan") {
    assert(OggSeek.pagepoints(null, 8) == null)
    assert(OggSeek.pagepoints("not an ogg stream at all".getBytes, 8) == null)
    val good = OggCodec.vorbisPaged(2, 44100, Seq(100L, 200L, 300L))
    // truncation mid-page: the plan keeps completed pages, never throws
    for (cut <- 0 until good.length by 7) {
      val p = OggSeek.pagepoints(good.take(cut), 8)
      assert(p == null || p.forall(_._2 <= cut))
    }
    // a lying granule (negative, not -1) ends the plan at prior pages
    val bad = good.clone()
    val secondData = (58 + 44).toInt // page 2 header
    bad(secondData + 13) = 0x80.toByte // granule high byte -> negative
    val p = OggSeek.pagepoints(bad, 8)
    assert(p != null && p.map(_._1).toSeq == Seq(0L, 100L))
  }

  test("SQL + column surfaces agree; opus streams plan too") {
    graft.functions.registerAll(spark)
    val b = OggCodec.vorbisPaged(2, 44100, Seq(64L, 128L))
    val hexed = b.map("%02X".format(_)).mkString
    val viaSql = spark.sql(
      s"SELECT ogg_pagepoints(unhex('$hexed'), 16) AS pts").head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql == OggSeek.pagepoints(b, 16).toSeq)
    val opus = OggCodec.encodeOpus(2, 312, 48000L, dataPages = 2)
    val pts = OggSeek.pagepoints(opus, 8)
    assert(pts.last._1 == 48000L && pts.last._2 == opus.length.toLong)
  }
}
