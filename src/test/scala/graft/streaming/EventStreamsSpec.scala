package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val evs = Seq(
    // user 1: two sessions split by a 20-min gap (gap threshold 10 min)
    Event(1L, 1L, "click", ts(0), 1.0),
    Event(1L, 2L, "click", ts(5), 2.0),
    Event(1L, 3L, "buy", ts(9), 3.0),
    Event(1L, 4L, "click", ts(30), 4.0),
    Event(1L, 5L, "click", ts(35), 5.0),
    // user 2: one session
    Event(2L, 6L, "view", ts(1), 10.0),
    Event(2L, 7L, "view", ts(8), 20.0))

  test("batch sessionization splits on the gap and aggregates per session") {
    import spark.implicits._
    val out = EventStreams.sessionizeBatch(evs.toDF(), gapSeconds = 600)
      .orderBy("user_id", "session_no")
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:09:00", 3L, 6.0),
      (1L, "2024-01-01 10:30:00", "2024-01-01 10:35:00", 2L, 9.0),
      (2L, "2024-01-01 10:01:00", "2024-01-01 10:08:00", 2L, 30.0)))
  }

  test("streaming sessionization emits the same sessions as batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionizeStream(mem.toDS(), gapSeconds = 600)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: first sessions' events
      mem.addData(evs.filter(_.event_id <= 3L) :+ evs(5): _*)
      q.processAllAvailable()
      // batch 2: later events push the watermark past session 1's gap
      mem.addData(evs.filter(e => e.event_id == 4L || e.event_id == 5L || e.event_id == 7L): _*)
      q.processAllAvailable()
      // batch 3: a far-future event closes everything still open
      mem.addData(Event(99L, 100L, "tick", Timestamp.valueOf("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData(Event(99L, 101L, "tick", Timestamp.valueOf("2024-01-01 14:00:00"), 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sessions_out")
        .filter(col("user_id") < 90L)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("s"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("e"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "s")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      val batch = EventStreams.sessionizeBatch(evs.toDF(), gapSeconds = 600)
        .orderBy("user_id", "session_start")
        .collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getLong(4), r.getDouble(5)))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("watermarked windowed counts over a stream match the batch plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.windowedTypeCounts(mem.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("windows_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // close all windows
      mem.addData(Event(99L, 100L, "tick", Timestamp.valueOf("2024-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("windows_out")
        .filter(col("event_type") =!= "tick")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val batch = EventStreams.windowedTypeCounts(evs.toDF(), "10 minutes")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("file micro-batch source: new parquet files flow through the windowed agg") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_").toString + "/events"
    // first file: all events before 10:10 (both users); later events arrive
    // in the second file so nothing lands behind the advancing watermark
    (evs.take(3) ++ evs.drop(5)).toDF().write.mode("append").parquet(dir)
    val stream = EventStreams.readEventStream(spark, dir, evs.toDF().schema)
    assert(stream.isStreaming)
    val q = EventStreams.windowedTypeCounts(stream, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("file_windows")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // second file arrives: watermark advances, earlier windows close
      (evs.slice(3, 5) :+ Event(99L, 100L, "tick", Timestamp.valueOf("2024-01-01 13:00:00"), 0.0))
        .toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("file_windows")
        .filter(col("event_type") =!= "tick")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val batch = EventStreams.windowedTypeCounts(evs.toDF(), "10 minutes")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("readStream.format(graft): micro-batches of arriving graft-written files") {
    import spark.implicits._
    import graft.model.CqlSchema
    import graft.write.TokenSortedWriter
    val dir = java.nio.file.Files.createTempDirectory("graft_mbs_").toString + "/events"
    val schema = CqlSchema("events", Seq("user_id"), Seq("ts", "event_id"))
    def write(batch: Seq[Event]): Unit =
      TokenSortedWriter.write(batch.toDF(), schema, dir,
        org.apache.spark.sql.SaveMode.Append,
        TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true))

    write(evs.take(3) ++ evs.drop(5))
    val stream = spark.readStream.format("graft")
      .option("path", dir).option("pk", "user_id").option("ck", "ts,event_id")
      .load()
    assert(stream.isStreaming)
    val q = EventStreams.windowedTypeCounts(stream, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("graft_mbs")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // a second graft append becomes the next micro-batch
      write(evs.slice(3, 5) :+
        Event(99L, 100L, "tick", Timestamp.valueOf("2024-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("graft_mbs")
        .filter(col("event_type") =!= "tick")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val batch = EventStreams.windowedTypeCounts(evs.toDF(), "10 minutes")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("writeGraftStream: streaming upsert ingestion, replay-idempotent via LWW") {
    import spark.implicits._
    import graft.model.CqlSchema
    import graft.write.TokenSortedWriter
    implicit val sqlCtx = spark.sqlContext
    val schema = CqlSchema("kv", Seq("k"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ssink_").toString
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.writeGraftStream(
      mem.toDF().toDF("k", "v"), schema, s"$dir/t", s"$dir/ckpt", numPartitions = 1)
    try {
      mem.addData((1L, "a1"), (2L, "b1"))
      q.processAllAvailable()
      mem.addData((2L, "b2"), (3L, "c1")) // k=2 upserted in a later batch
      q.processAllAvailable()
      val got = TokenSortedWriter.readNormalized(spark, schema, s"$dir/t")
        .as[(Long, String)].collect().toSet
      assert(got == Set((1L, "a1"), (2L, "b2"), (3L, "c1")))
      // replay simulation: re-write batch 1's content AT batch 1's writetime
      // (what a recovery re-delivery does) — the normalized view is unchanged
      TokenSortedWriter.write(Seq((2L, "b2"), (3L, "c1")).toDF("k", "v"), schema,
        s"$dir/t", org.apache.spark.sql.SaveMode.Append,
        TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = true,
          writetimeMicros = Some(1L)))
      val replayed = TokenSortedWriter.readNormalized(spark, schema, s"$dir/t")
        .as[(Long, String)].collect().toSet
      assert(replayed == got)
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch to the broadcast dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("user_id", "tier")
    val mem = MemoryStream[Event]
    val q = EventStreams.enrichWithDim(mem.toDF(), dim, Seq("user_id"))
      .select(col("event_id"), col("tier"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs.take(4): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(4): _*) // second batch re-joins the same static dim
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = EventStreams.enrichWithDim(evs.toDF(), dim, Seq("user_id"))
        .select(col("event_id"), col("tier"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batch && batch.size == evs.size)
    } finally q.stop()
  }

  test("stream-stream correlation join matches the batch band join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def split(e: Seq[Event]): (Seq[(Long, Timestamp, Long)], Seq[(Long, Timestamp, Long)]) = (
      e.filter(_.event_type == "click").map(x => (x.user_id, x.ts, x.event_id)),
      e.filter(_.event_type == "buy").map(x => (x.user_id, x.ts, x.event_id)))
    val (clicks, buys) = split(evs)
    val memL = MemoryStream[(Long, Timestamp, Long)]
    val memR = MemoryStream[(Long, Timestamp, Long)]
    val q = EventStreams.correlateStreams(
        memL.toDF().toDF("user_id", "click_ts", "click_id"),
        memR.toDF().toDF("user_id", "buy_ts", "buy_id"),
        "user_id", withinSeconds = 600L, "click_ts", "buy_ts",
        watermarkDelay = "10 minutes")
      .select(col("user_id"), col("click_id"), col("buy_id"))
      .writeStream.format("memory").queryName("corr_out")
      .outputMode(OutputMode.Append).start()
    try {
      // deliver out of phase: clicks first, buys in a later batch
      memL.addData(clicks: _*)
      q.processAllAvailable()
      memR.addData(buys: _*)
      q.processAllAvailable()
      val streamed = spark.table("corr_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = EventStreams.correlateStreams(
          clicks.toDF("user_id", "click_ts", "click_id"),
          buys.toDF("user_id", "buy_ts", "buy_id"),
          "user_id", withinSeconds = 600L, "click_ts", "buy_ts")
        .select(col("user_id"), col("click_id"), col("buy_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("dedupIngestStream: cross-batch near-dup dedup against the signature table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_dis_").toString
    val q = EventStreams.dedupIngestStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base/out", s"$base/sigs", s"$base/ckpt",
      shingleN = 3, numPerms = 32, bands = 16)
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely different content about spark engines and parquet files"))
      q.processAllAvailable()
      mem.addData(
        (10L, "the quick brown fox jumps over the lazy dog"), // dup of batch-1 doc
        (11L, "a genuinely novel document about distributed joins"))
      q.processAllAvailable()
      mem.addData(
        (20L, "a genuinely novel document about distributed joins"), // dup of batch-2 SURVIVOR
        (21L, "yet another fresh document mentioning bulk analytics reads"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$base/out")
        .select("doc_id").as[Long].collect().toSet
      assert(kept === Set(1L, 2L, 11L, 21L)) // cross-batch dups 10 and 20 dropped
      // the signature table carries exactly the survivors
      val sigIds = spark.read.parquet(s"$base/sigs")
        .select("id").as[Long].collect().toSet
      assert(sigIds === kept)
    } finally q.stop()
  }

  test("dedupIngestStream: compaction keeps dedup exact and leaves id-unique state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_disc_").toString
    // file: URI exercises the Hadoop-FS existence/recovery path end-to-end;
    // compactEvery = 2 rewrites the state between batch 2 and batch 3
    val q = EventStreams.dedupIngestStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base/out", s"file:$base/sigs", s"$base/ckpt",
      shingleN = 3, numPerms = 32, bands = 16, compactEvery = 2)
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely different content about spark engines and parquet files"))
      q.processAllAvailable()
      mem.addData(
        (10L, "the quick brown fox jumps over the lazy dog"), // dup of batch-1 doc
        (11L, "a genuinely novel document about distributed joins"))
      q.processAllAvailable() // batch id 1... batches are 0-indexed; add a third
      mem.addData(
        (20L, "a genuinely novel document about distributed joins"), // dup of batch-2 survivor
        (21L, "yet another fresh document mentioning bulk analytics reads"))
      q.processAllAvailable()
      mem.addData(
        (30L, "yet another fresh document mentioning bulk analytics reads"), // dup POST-compaction
        (31L, "and one more entirely new page about token range math"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$base/out")
        .select("doc_id").as[Long].collect().toSet
      assert(kept === Set(1L, 2L, 11L, 21L, 31L))
      // compaction left exactly one state row per survivor, no tmp debris
      val state = spark.read.parquet(s"$base/sigs")
      assert(state.select("id").as[Long].collect().toSet === kept)
      assert(state.count() === kept.size)
      assert(!new java.io.File(s"$base/sigs.compact.tmp").exists())
    } finally q.stop()
  }

  test("dedupIngestStream: dedupWithinBatch keeps one survivor per intra-batch group") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_disw_").toString
    val q = EventStreams.dedupIngestStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base/out", s"$base/sigs", s"$base/ckpt",
      shingleN = 3, numPerms = 32, bands = 16, dedupWithinBatch = true)
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"), // in-batch dup of 1
        (3L, "completely different content about spark engines and parquet files"))
      q.processAllAvailable()
      mem.addData(
        (10L, "the quick brown fox jumps over the lazy dog"),  // cross-batch dup
        (11L, "a genuinely novel document about distributed joins"),
        (12L, "a genuinely novel document about distributed joins")) // in-batch dup of 11
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$base/out")
        .select("doc_id").as[Long].collect().toSet
      // min-id survivor per in-batch group; cross-batch dups dropped
      assert(kept === Set(1L, 3L, 11L))
      val sigIds = spark.read.parquet(s"$base/sigs")
        .select("id").as[Long].collect().toSet
      assert(sigIds === kept)
    } finally q.stop()
  }

  test("streaming WET ingestion: arriving shards flow through cross-batch dedup") {
    import spark.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    import java.nio.file.{Files, Paths}
    def wetBytes(docs: (String, String)*): Array[Byte] =
      docs.flatMap { case (uri, text) =>
        val body = text.getBytes(UTF_8)
        (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
          s"WARC-Target-URI: $uri\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
          s"WARC-Record-ID: <urn:t:$uri>\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++
          body ++ "\r\n\r\n".getBytes(UTF_8)
      }.toArray
    val base = java.nio.file.Files.createTempDirectory("graft_wetstream_").toString
    val wetDir = s"$base/arrivals"; Files.createDirectories(Paths.get(wetDir))
    val q = EventStreams.dedupIngestStream(
      graft.sources.Warc.readWetStream(spark, wetDir)
        .select(col("target_uri"), col("text")),
      "target_uri", "text",
      s"$base/out", s"$base/sigs", s"$base/ckpt",
      shingleN = 3, numPerms = 32, bands = 16)
    try {
      Files.write(Paths.get(wetDir, "shard-0001.wet"), wetBytes(
        "http://a/1" -> "the quick brown fox jumps over the lazy dog",
        "http://a/2" -> "completely different content about spark engines and parquet files"))
      q.processAllAvailable()
      Files.write(Paths.get(wetDir, "shard-0002.wet"), wetBytes(
        "http://b/1" -> "the quick brown fox jumps over the lazy dog", // dup of shard-1 doc
        "http://b/2" -> "a genuinely novel document about distributed joins"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$base/out")
        .select("target_uri").as[String].collect().toSet
      assert(kept === Set("http://a/1", "http://a/2", "http://b/2"))
      val sigIds = spark.read.parquet(s"$base/sigs")
        .select("id").as[String].collect().toSet
      assert(sigIds === kept)
    } finally q.stop()
  }

  test("changeFeed stream: snapshot version = offset; exact, rewrite-aware increments") {
    import spark.implicits._
    import graft.model.CqlSchema
    import graft.write.{Snapshots, TokenSortedWriter}
    val dir = java.nio.file.Files.createTempDirectory("graft_cfs_").toString + "/docs"
    val schema = CqlSchema("docs", Seq("id"))
    def writeSnap(ids: Range): Unit =
      TokenSortedWriter.write(ids.map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
        schema, dir, org.apache.spark.sql.SaveMode.Append,
        TokenSortedWriter.WriteConf(numPartitions = 2, snapshot = true))

    writeSnap(0 until 5) // v1
    val stream = spark.readStream.format("graft")
      .option("path", dir).option("pk", "id")
      .option("changeFeed", "true").load()
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("cf_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cf_out").count() == 5L)
      // two more committed versions — each arrives exactly once
      writeSnap(5 until 9)  // v2
      writeSnap(9 until 12) // v3
      q.processAllAvailable()
      def got(): Seq[Long] =
        spark.table("cf_out").select("id").as[Long].collect().sorted.toSeq
      assert(got() == (0L until 12L))
      // batch twin: the one-shot change feed over the same version range
      // delivers the same rows
      assert(Snapshots.readChanges(spark, dir, 0L, 3L)
        .select("id").as[Long].collect().sorted.toSeq == got())
      // an out-of-band file (never committed to the log) stays invisible
      Seq((100L, "oob")).toDF("id", "payload")
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
      q.processAllAvailable()
      assert(got() == (0L until 12L))
      // a rewrite mid-stream fails LOUDLY instead of re-delivering
      Snapshots.commitRewrite(spark, dir, Snapshots.files(spark, dir, 3L).take(1))
      val e = intercept[Exception](q.processAllAvailable())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("rewrite")), messages(e).mkString(" | "))
    } finally q.stop()
  }

  test("changeFeed → dedupIngestStream: the incremental dedup loop on exact increments") {
    import spark.implicits._
    import graft.model.CqlSchema
    import graft.write.TokenSortedWriter
    val base = java.nio.file.Files.createTempDirectory("graft_cfdd_").toString
    val dir = s"$base/docs"
    val schema = CqlSchema("docs", Seq("doc_id"))
    def writeSnap(rows: Seq[(Long, String)]): Unit =
      TokenSortedWriter.write(rows.toDF("doc_id", "text"), schema, dir,
        org.apache.spark.sql.SaveMode.Append,
        TokenSortedWriter.WriteConf(numPartitions = 2, snapshot = true))
    writeSnap(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different content about spark engines and parquet files")))
    // the committed snapshot log drives the dedup loop: each version is one
    // exact micro-batch, so the signature table grows per COMMIT, never per
    // half-landed file
    val stream = spark.readStream.format("graft")
      .option("path", dir).option("pk", "doc_id")
      .option("changeFeed", "true").load()
      .select(col("doc_id"), col("text"))
    val q = EventStreams.dedupIngestStream(stream, "doc_id", "text",
      s"$base/out", s"$base/sigs", s"$base/ckpt",
      shingleN = 3, numPerms = 32, bands = 16)
    try {
      q.processAllAvailable()
      writeSnap(Seq(
        (10L, "the quick brown fox jumps over the lazy dog"), // dup of v1 doc
        (11L, "a genuinely novel document about distributed joins")))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$base/out")
        .select("doc_id").as[Long].collect().toSet
      assert(kept === Set(1L, 2L, 11L)) // cross-version dup 10 dropped
      assert(spark.read.parquet(s"$base/sigs")
        .select("id").as[Long].collect().toSet === kept)
    } finally q.stop()
  }

  test("changeFeed stream: startingVersion skips history, equals the batch feed") {
    import spark.implicits._
    import graft.model.CqlSchema
    import graft.write.{Snapshots, TokenSortedWriter}
    val dir = java.nio.file.Files.createTempDirectory("graft_cfsv_").toString + "/docs"
    val schema = CqlSchema("docs", Seq("id"))
    def writeSnap(ids: Range): Unit =
      TokenSortedWriter.write(ids.map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
        schema, dir, org.apache.spark.sql.SaveMode.Append,
        TokenSortedWriter.WriteConf(numPartitions = 2, snapshot = true))
    writeSnap(0 until 6)  // v1 — history the feed must skip
    writeSnap(6 until 9)  // v2
    writeSnap(9 until 10) // v3
    val q = spark.readStream.format("graft")
      .option("path", dir).option("pk", "id")
      .option("changeFeed", "true").option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("cf_sv_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("cf_sv_out").select("id").as[Long].collect().sorted.toSeq
      assert(got == (6L until 10L))
      assert(Snapshots.readChanges(spark, dir, 1L, 3L)
        .select("id").as[Long].collect().sorted.toSeq == got)
    } finally q.stop()
  }

  test("maintainAggStream: rollup tracks commits across restarts, replay-proof fold") {
    import spark.implicits._
    import graft.model.CqlSchema
    import graft.write.TokenSortedWriter
    val root = java.nio.file.Files.createTempDirectory("graft_magg_").toString
    val dir = root + "/docs"
    val down = root + "/rollup"
    val schema = CqlSchema("docs", Seq("id"))
    val aggSchema = CqlSchema("rollup", Seq("grp"))
    def writeSnap(rows: Seq[(Long, String, Long)]): Unit =
      TokenSortedWriter.write(rows.toDF("id", "grp", "n"),
        schema, dir, org.apache.spark.sql.SaveMode.Append,
        TokenSortedWriter.WriteConf(numPartitions = 2, snapshot = true))
    def run(): Unit = {
      val feed = spark.readStream.format("graft")
        .option("path", dir).option("pk", "id")
        .option("changeFeed", "true").option("startingVersion", "0").load()
      val q = EventStreams.maintainAggStream(feed, Seq("grp"), Seq("n"),
        aggSchema, down, root + "/ckpt",
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      try q.awaitTermination() finally q.stop()
    }
    def rollup(): Map[String, (Long, Long)] =
      TokenSortedWriter.readNormalized(spark, aggSchema, down)
        .select($"grp", $"n_rows", $"sum_n").as[(String, Long, Long)]
        .collect().map { case (g, a, b) => g -> ((a, b)) }.toMap

    writeSnap(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))) // v1
    writeSnap(Seq((4L, "b", 7L)))                                 // v2
    run()
    assert(rollup() === Map("a" -> ((2L, 30L)), "b" -> ((2L, 12L))))

    // a later commit + restart with the SAME checkpoint processes only the
    // increment and folds it into the persisted rollup
    writeSnap(Seq((5L, "a", 100L), (6L, "c", 1L)))                // v3
    run()
    assert(rollup() === Map(
      "a" -> ((3L, 130L)), "b" -> ((2L, 12L)), "c" -> ((1L, 1L))))
  }

  test("maintainAggStream compactEvery: history folds down, rollup stays exact across restarts") {
    import spark.implicits._
    import graft.model.CqlSchema
    import graft.write.TokenSortedWriter
    val root = java.nio.file.Files.createTempDirectory("graft_maggc_").toString
    val dir = root + "/docs"
    val down = root + "/rollup"
    val schema = CqlSchema("docs", Seq("id"))
    val aggSchema = CqlSchema("rollup", Seq("grp"))
    def writeSnap(rows: Seq[(Long, String, Long)]): Unit =
      TokenSortedWriter.write(rows.toDF("id", "grp", "n"),
        schema, dir, org.apache.spark.sql.SaveMode.Append,
        TokenSortedWriter.WriteConf(numPartitions = 2, snapshot = true))
    def run(): Unit = {
      val feed = spark.readStream.format("graft")
        .option("path", dir).option("pk", "id")
        .option("changeFeed", "true").option("startingVersion", "0").load()
      val q = EventStreams.maintainAggStream(feed, Seq("grp"), Seq("n"),
        aggSchema, down, root + "/ckpt", compactEvery = 1,
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      try q.awaitTermination() finally q.stop()
    }
    writeSnap(Seq((1L, "a", 10L), (2L, "b", 5L)))  // v1
    writeSnap(Seq((3L, "a", 1L)))                  // v2
    run()
    writeSnap(Seq((4L, "a", 100L), (5L, "c", 7L))) // v3 after a compaction ran
    run()
    val rollup = TokenSortedWriter.readNormalized(spark, aggSchema, down)
      .select($"grp", $"n_rows", $"sum_n").as[(String, Long, Long)]
      .collect().map { case (g, a, b) => g -> ((a, b)) }.toMap
    assert(rollup === Map(
      "a" -> ((3L, 111L)), "b" -> ((1L, 5L)), "c" -> ((1L, 7L))))
  }

  test("streaming dedup drops re-delivered events inside the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupeStream(mem.toDF(), Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      mem.addData(evs: _*) // exact redelivery
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == evs.size)
    } finally q.stop()
  }
}
