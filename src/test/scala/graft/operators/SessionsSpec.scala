package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sessionization: gap-split correctness, tie determinism, and the
 *  one-exchange plan shape. */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("gap-split: events within the gap share a session, a gap starts a " +
      "new one, sessions are per-user") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:10:00")),  // 10 min — same session
      (1L, 3L, ts("2024-01-01 11:00:00")),  // 50 min — new session
      (2L, 4L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_id", "ts")
    val out = Sessions.sessionize(events, "user_id", "ts", "event_id", lit(1800))
      .select("user_id", "event_id", "session_idx")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("boundary is strict: a gap of exactly gapSeconds stays in-session, " +
      "one microsecond more splits") {
    val base = ts("2024-01-01 10:00:00")
    val atGap = new java.sql.Timestamp(base.getTime + 1800 * 1000L)
    val past = new java.sql.Timestamp(base.getTime + 1800 * 1000L)
    past.setNanos(1000) // + 1 µs
    val out = Sessions.sessionize(
      Seq((1L, 1L, base), (1L, 2L, atGap), (2L, 1L, base), (2L, 2L, past))
        .toDF("user_id", "event_id", "ts"),
      "user_id", "ts", "event_id", lit(1800))
      .select("user_id", "event_id", "session_idx")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 1L), (1L, 2L, 1L), (2L, 1L, 1L), (2L, 2L, 2L)))
  }

  test("equal timestamps break ties by the tie column — session flags are " +
      "deterministic") {
    val t = ts("2024-01-01 10:00:00")
    val out = Sessions.sessionize(
      Seq((1L, 5L, t), (1L, 3L, t), (1L, 4L, t)).toDF("user_id", "event_id", "ts"),
      "user_id", "ts", "event_id", lit(60))
      .select("event_id", "session_idx", "is_session_start")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((3L, 1L, true), (4L, 1L, false), (5L, 1L, false)))
  }

  test("sessionStats rolls up per session with ONE exchange (the window's " +
      "user partitioning already satisfies the rollup's distribution)") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:10:00")),
      (1L, 3L, ts("2024-01-01 12:00:00")),
      (2L, 4L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "ts")
    val stats = Sessions.sessionStats(events, "user_id", "ts", "event_id", 1800L)
    val rows = stats.as[(Long, Long, Long, Long)].collect().toSet
    assert(rows == Set(
      (1L, 1L, 2L, 600L * 1000000L),
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
    val exchanges = stats.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected one exchange, plan had $exchanges")
  }

  test("sessionStatsStream over the graft change-feed stream: append mode " +
      "emits each closed session exactly once as the watermark passes it; " +
      "finals equal the batch session_window rollup") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sessstream_").toString + "/t"
    def wave(rows: Seq[(Long, Long, java.sql.Timestamp)]): Unit =
      rows.toDF("user_id", "event_id", "ts").write.format("graft")
        .option("pk", "event_id").option("partitions", "2")
        .option("snapshot", "true").mode("append").save(dir)
    wave(Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:10:00")),  // same session
      (1L, 3L, ts("2024-01-01 11:00:00")),  // 50 min → new session
      (2L, 4L, ts("2024-01-01 10:05:00"))))
    val stream = spark.readStream.format("graft").option("path", dir)
      .option("pk", "event_id").load()
      .select(col("user_id"), col("ts"))
    val q = Sessions.sessionStatsStream(stream, "user_id", "ts", 1800L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // wave 1's watermark (max ts) closes the EARLY sessions via the
      // no-data flush batch, but the session ending past it stays open —
      // a far-future sentinel wave closes everything wave 1 produced
      assert(spark.table("sess_out").count() < 3)
      wave(Seq((99L, 100L, ts("2024-01-02 10:00:00"))))
      q.processAllAvailable()
      wave(Seq((99L, 101L, ts("2024-01-03 10:00:00"))))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .filter(col("user_id") =!= 99L)
        .as[(Long, Long, Long, Long)].collect().toSet
      val expected = Sessions.sessionStatsStream(
        spark.read.format("graft").option("path", dir)
          .option("pk", "event_id").load()
          .filter(col("user_id") =!= 99L).select(col("user_id"), col("ts")),
        "user_id", "ts", 1800L).as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"stream $got vs batch $expected")
      assert(got.size == 3 && got.map(_._1) == Set(1L, 2L))
      // exactly-once emission in append mode: no session appears twice
      val all = spark.table("sess_out").filter(col("user_id") =!= 99L)
        .select("user_id", "session_us").as[(Long, Long)].collect()
      assert(all.length == all.distinct.length)
    } finally q.stop()
  }

  test("sessionStatsStream boundary matches the batch operator: exactly " +
      "the gap continues the session, one microsecond more splits") {
    val base = ts("2024-01-01 10:00:00")
    val atGap = new java.sql.Timestamp(base.getTime + 1800 * 1000L)
    val past = new java.sql.Timestamp(base.getTime + 1800 * 1000L)
    past.setNanos(1000) // + 1 µs
    val out = Sessions.sessionStatsStream(
      Seq((1L, base), (1L, atGap), (2L, base), (2L, past))
        .toDF("user_id", "ts"),
      "user_id", "ts", 1800L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out.size == 3, s"got $out")
    assert(out.filter(_._1 == 1L).map(r => (r._3, r._4)) ==
      Set((2L, 1800000000L)), s"user 1 must keep ONE session: $out")
    assert(out.count(_._1 == 2L) == 2, s"user 2 must split: $out")
  }
}
