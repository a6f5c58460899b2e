package graft.functions

import graft.SparkSpec

/** WebVTT/SRT cue extraction: stamp grammar, block structure, header
 *  contracts, and the malformed-input skip semantics. */
class SubtitleSpec extends SparkSpec {

  private def vtt(body: String) = SubtitleCues.parse("WEBVTT\n\n" + body, true)

  test("timestamp grammar: hours optional, . and , separators, short ms") {
    assert(SubtitleCues.parseStamp("00:00:01.500") == 1500L)
    assert(SubtitleCues.parseStamp("00:01,5") == 1500L) // MM:SS,ms form
    assert(SubtitleCues.parseStamp("01:02:03.45") == 3723450L)
    assert(SubtitleCues.parseStamp("12:34.567") == 754567L)
    assert(SubtitleCues.parseStamp("99:00:00.000") == 99L * 3600000)
    assert(SubtitleCues.parseStamp("bogus") == -1L)
    assert(SubtitleCues.parseStamp("00:99:00.000") == -1L) // minutes > 59
    assert(SubtitleCues.parseStamp("00:00:99.000") == -1L)
    assert(SubtitleCues.parseStamp("00:00:01") == -1L) // no ms part
  }

  test("VTT: identifiers, settings, multi-line payload, NOTE blocks") {
    val cues = vtt(
      """NOTE this is a comment
        |spanning lines
        |
        |intro
        |00:00.000 --> 00:02.500 align:start line:0
        |Hello
        |world
        |
        |00:00:03.000 --> 00:00:04.000
        |Second""".stripMargin)
    assert(cues.length == 2)
    assert(cues(0) == SubtitleCues.Cue(0, 2500, "Hello\nworld"))
    assert(cues(1) == SubtitleCues.Cue(3000, 4000, "Second"))
  }

  test("VTT header contract: missing signature is null; SRT mode ignores it") {
    assert(SubtitleCues.parse("00:00.000 --> 00:01.000\nx", true) == null)
    val srt = SubtitleCues.parse(
      "1\n00:00:00,000 --> 00:00:01,500\nHi there\n\n2\n00:00:02,000 --> 00:00:03,000\nBye",
      false)
    assert(srt.length == 2)
    assert(srt(0) == SubtitleCues.Cue(0, 1500, "Hi there"))
    assert(srt(1) == SubtitleCues.Cue(2000, 3000, "Bye"))
  }

  test("malformed blocks are skipped, never errors; CRLF handled") {
    val cues = SubtitleCues.parse(
      "WEBVTT\r\n\r\ngarbage --> block\r\nmore\r\n\r\n00:05.000 --> 00:06.000\r\nok",
      true)
    assert(cues.length == 1 && cues(0).text == "ok")
    assert(SubtitleCues.parse("", false).length == 0)
    assert(SubtitleCues.parse(null, false) == null)
    // fuzz: random text never throws
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 200) {
      val s = (0 until rnd.nextInt(200)).map(_ =>
        "0123456789:.,->\n\r WEBVTT"(rnd.nextInt(24))).mkString
      SubtitleCues.parse(s, rnd.nextBoolean())
    }
  }

  test("subtitle_cues column: explode + frame alignment join shape") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val doc = "WEBVTT\n\n00:00.000 --> 00:00.200\na\n\n00:00.200 --> 00:00.900\nb"
    val df = Seq((1L, doc)).toDF("id", "sub")
      .select(col("id"), explode(SubtitleCuesExpr(col("sub"), true)).as("cue"))
      .select(col("id"), col("cue.start_ms"), col("cue.end_ms"), col("cue.text"))
    val got = df.collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((0L, 200L, "a"), (200L, 900L, "b")))
  }
}
