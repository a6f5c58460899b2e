package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def record(
      typ: String, uri: String, body: Array[Byte],
      extraHeader: String = ""): Array[Byte] = {
    val header =
      (s"WARC/1.0\r\n" +
        s"WARC-Type: $typ\r\n" +
        (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
        "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"WARC-Record-ID: <urn:test:$uri>\r\n" +
        extraHeader +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    header ++ body ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("records: streaming parse of plain multi-record file, framing immune to payload") {
    // payload 2 contains a fake WARC version line + CRLFs: length framing
    // must carry the parser straight through it
    val evil = "WARC/1.0\r\nContent-Length: 999\r\n\r\nnot a record".getBytes(UTF_8)
    val bytes = record("conversion", "http://a", "hello wörld ✓".getBytes(UTF_8)) ++
      record("conversion", "http://b", evil) ++
      record("warcinfo", null, "robots: classic".getBytes(UTF_8))
    val rs = Warc.records(new ByteArrayInputStream(bytes), "mem").toList
    assert(rs.map(_.warc_type) === List("conversion", "conversion", "warcinfo"))
    assert(new String(rs(0).payload, UTF_8) === "hello wörld ✓")
    assert(rs(1).payload === evil)
    assert(rs(0).target_uri === "http://a" && rs(2).target_uri === null)
  }

  test("records: multi-member gzip (one member per record, the Common Crawl layout)") {
    val out = new java.io.ByteArrayOutputStream()
    Seq(record("conversion", "http://a", "first".getBytes(UTF_8)),
        record("conversion", "http://b", "second".getBytes(UTF_8))).foreach { r =>
      val gz = new GZIPOutputStream(out); gz.write(r); gz.finish()
    }
    val rs = Warc.records(new ByteArrayInputStream(out.toByteArray), "mem.gz").toList
    assert(rs.map(r => new String(r.payload, UTF_8)) === List("first", "second"))
  }

  test("records: FAILFAST on truncated payload, bad version line, missing Content-Length") {
    val truncated = record("conversion", "http://a", "full body".getBytes(UTF_8))
      .dropRight(8) // cut into the payload
    val e1 = intercept[IllegalArgumentException] {
      Warc.records(new ByteArrayInputStream(truncated), "t").toList
    }
    assert(e1.getMessage.contains("EOF in payload"))
    val e2 = intercept[IllegalArgumentException] {
      Warc.records(new ByteArrayInputStream("HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)), "t").toList
    }
    assert(e2.getMessage.contains("version line"))
    val noLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n\r\n").getBytes(UTF_8)
    val e3 = intercept[IllegalArgumentException] {
      Warc.records(new ByteArrayInputStream(noLen), "t").toList
    }
    assert(e3.getMessage.contains("Content-Length"))
  }

  test("records: empty payload and unicode byte-length round exactly") {
    val s = "héllo — ✓ 丗"
    val bytes = record("conversion", "http://u", s.getBytes(UTF_8)) ++
      record("conversion", "http://e", Array.emptyByteArray)
    val rs = Warc.records(new ByteArrayInputStream(bytes), "mem").toList
    assert(new String(rs(0).payload, UTF_8) === s)
    assert(rs(1).payload.length === 0)
  }

  test("writeWet/readWet: distributed round trip, gzip and plain") {
    val docs = Seq(
      (1L, "doc one text\nwith a line"),
      (2L, "zwëite — unicode ✓"),
      (3L, "")).toDF("id", "text")
      .select(concat(lit("http://t/"), col("id")).as("uri"), col("text"))
    for (gz <- Seq(true, false)) {
      val dir = tmpDir(s"graft_wet_$gz") + "/wet"
      Warc.writeWet(docs.repartition(2), "uri", "text", dir, gzip = gz)
      val back = Warc.readWet(spark, dir)
        .select("target_uri", "text").as[(String, String)].collect().toMap
      assert(back === Map("http://t/1" -> "doc one text\nwith a line",
        "http://t/2" -> "zwëite — unicode ✓", "http://t/3" -> ""))
    }
  }

  test("readWet filters non-conversion records; read keeps them") {
    val dir = tmpDir("graft_warc_mix")
    val bytes = record("warcinfo", null, "software: graft".getBytes(UTF_8)) ++
      record("conversion", "http://a", "kept".getBytes(UTF_8)) ++
      record("response", "http://a", "HTTP/1.1 200 OK\r\n\r\n<html/>".getBytes(UTF_8),
        extraHeader = "Content-Type: application/http; msgtype=response\r\n")
    Files.write(Paths.get(dir, "f.warc"), bytes)
    assert(Warc.read(spark, dir).count() === 3)
    val wet = Warc.readWet(spark, dir).select("text").as[String].collect()
    assert(wet.toList === List("kept"))
  }

  test("fuzz: arbitrary bytes either parse or fail loudly — never hang, loop, or OOM") {
    val rnd = new scala.util.Random(20260813)
    // pure-random buffers plus mutated valid records (the nastier class)
    val valid = record("conversion", "http://f", "fuzz seed body".getBytes(UTF_8))
    val cases = (1 to 200).map { i =>
      if (i % 3 == 0) {
        val b = valid.clone()
        val pos = rnd.nextInt(b.length)
        b(pos) = rnd.nextInt(256).toByte
        b
      } else {
        val b = new Array[Byte](rnd.nextInt(300))
        rnd.nextBytes(b); b
      }
    }
    cases.zipWithIndex.foreach { case (bytes, i) =>
      try {
        val rs = Warc.records(new ByteArrayInputStream(bytes), s"fuzz-$i").toList
        rs.foreach(r => assert(r.payload != null))
      } catch {
        case _: IllegalArgumentException => // the documented FAILFAST contract
        case _: java.io.IOException =>     // corrupt gzip magic-byte prefixes
      }
    }
  }

  test("httpBody splits at the FIRST CRLFCRLF only; separator-free payloads pass through") {
    def body(s: String): String =
      Seq(s).toDF("p")
        .select(Warc.httpBody(col("p").cast("binary"))).as[String].head()
    assert(body("HTTP/1.1 200 OK\r\nX: y\r\n\r\n<html>hi</html>") === "<html>hi</html>")
    // CRLF pairs INSIDE the body belong to the body
    assert(body("HTTP/1.1 200 OK\r\n\r\nline1\r\n\r\nline2") === "line1\r\n\r\nline2")
    assert(body("no separator at all") === "no separator at all")
    assert(body("HTTP/1.1 304 Not Modified\r\nX: y\r\n\r\n") === "")
  }

  test("httpBody reassembles Transfer-Encoding: chunked responses") {
    def body(s: String): String =
      Seq(s).toDF("p")
        .select(Warc.httpBody(col("p").cast("binary"))).as[String].head()
    // two chunks + terminator, CRLFs inside chunk data preserved
    assert(body("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "6\r\nhello \r\n7\r\nchunked\r\n0\r\n\r\n") === "hello chunked")
    // case-insensitive header + value, chunk extension ignored, hex > 9
    assert(body("HTTP/1.1 200 OK\r\ntransfer-encoding: ChUnKeD\r\n\r\n" +
      "b;ext=1\r\n0123456789a\r\n0\r\n\r\n") === "0123456789a")
    // trailers after the 0-chunk are dropped
    assert(body("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "1\r\na\r\n2\r\nbc\r\n0\r\nTrailer: x\r\n\r\n") === "abc")
    // truncated final chunk keeps the bytes that arrived
    assert(body("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "ff\r\ntruncated") === "truncated")
    // malformed size line falls back to the raw body, not null
    assert(body("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "zz\r\nraw") === "zz\r\nraw")
    // a body MENTIONING the header is not chunked (header block only)
    assert(body("HTTP/1.1 200 OK\r\nX: y\r\n\r\n" +
      "Transfer-Encoding: chunked\r\n5\r\nwords") ===
      "Transfer-Encoding: chunked\r\n5\r\nwords")
  }

  test("httpBody fuzz: arbitrary bytes never throw, hang, or return null for " +
    "non-null input") {
    val rnd = new scala.util.Random(97)
    val frames = Seq("\r\n", "\r\n\r\n", "Transfer-Encoding: chunked",
      "0\r\n", "ff\r\n", ";ext\r\n")
    val payloads = (1 to 200).map { i =>
      val base = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      // splice HTTP-ish framing into half the cases so the chunked walk
      // actually engages instead of bailing at the header check
      if (i % 2 == 0) {
        val f = frames(rnd.nextInt(frames.size)).getBytes("ISO-8859-1")
        val at = if (base.isEmpty) 0 else rnd.nextInt(base.length)
        base.take(at) ++ f ++ base.drop(at)
      } else base
    }
    val out = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "p")
      .select(col("id"), Warc.httpBody(col("p")).as("b"))
      .as[(Long, String)].collect()
    assert(out.length === 200)
    assert(out.forall(_._2 != null), "null output for non-null payload")
  }

  test("httpBody dechunks BEFORE decoding: split multi-byte codepoints rejoin") {
    // é is 0xC3 0xA9 in UTF-8; frame each byte as its own chunk — the
    // ASCII chunk framing sits BETWEEN the halves, so decode-then-dechunk
    // would yield U+FFFD twice. The walk must run on raw bytes.
    val head = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
      .getBytes("US-ASCII")
    val frame1 = "1\r\n".getBytes("US-ASCII")
    val crlf = "\r\n".getBytes("US-ASCII")
    val term = "0\r\n\r\n".getBytes("US-ASCII")
    val payload = head ++ frame1 ++ Array(0xC3.toByte) ++ crlf ++
      frame1 ++ Array(0xA9.toByte) ++ crlf ++ term
    val out = Seq(Tuple1(payload)).toDF("p")
      .select(Warc.httpBody(col("p"))).as[String].head()
    assert(out === "é")
  }

  test("writeWet: null text aborts the export (FAILFAST)") {
    val docs = Seq(("http://a", "ok"), ("http://b", null))
      .toDF("uri", "text")
    val dir = tmpDir("graft_wet_null") + "/wet"
    val e = intercept[Exception] {
      Warc.writeWet(docs, "uri", "text", dir)
    }
    assert(e.getMessage.contains("non-null") ||
      e.getCause != null && e.getCause.getMessage.contains("non-null"))
  }
}
