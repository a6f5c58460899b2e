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
}
