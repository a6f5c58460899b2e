package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sessionization: split each user's event stream into sessions separated
 * by inactivity gaps — the standard first step for behavioral features,
 * conversation-thread reconstruction, and session-level quality signals
 * in web-log curation.
 *
 * Shape: ONE shuffle on the user key; everything else is two window
 * passes over the already-partitioned data (lag → strict-gap flag →
 * running sum), fully codegen'd. No driver state, no collect — at
 * 100 TB the cost is exactly one exchange of (user, ts, payload), and
 * a hot user is an ordinary skewed window key (salt upstream if one
 * user is a double-digit fraction of the corpus).
 *
 * Determinism: the gap test runs on INTEGER epoch micros (strict `>`),
 * and ordering ties on `tsCol` break by `tieCol`, so session indexes
 * are a pure function of the data — the battery oracle replays the
 * identical window algebra in SQL.
 *
 * Spark also ships `session_window` for the grouped-aggregate form
 * (batch + streaming); this operator keeps the per-EVENT session index,
 * which the aggregate form cannot return without a re-join.
 */
object Sessions {

  /** Tag every event with its session: adds `is_session_start` and
   *  `session_idx` (1-based per user, in (tsCol, tieCol) order). A new
   *  session starts when the micros since the previous event STRICTLY
   *  exceed `gapSeconds`. */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Column): DataFrame = {
    val order = Seq(col(tsCol).asc, col(tieCol).asc)
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val isStart = prev.isNull ||
      (unix_micros(col(tsCol)) - unix_micros(prev)) >
        gapSeconds.cast("long") * lit(1000000L)
    events
      .withColumn("is_session_start", isStart)
      .withColumn("session_idx",
        sum(when(col("is_session_start"), 1L).otherwise(0L)).over(
          Window.partitionBy(col(userCol)).orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /**
   * STREAMING per-session rollup: Spark's `session_window` aggregate over
   * a streaming frame — `(userCol, session_us [window start as epoch
   * micros], n_events, dur_us)`. State is bounded by the watermark:
   * a session closes (and, in Append mode, emits exactly once) when the
   * watermark passes its end, so late events within `watermarkDelay`
   * still merge while state stays O(open sessions), which is what makes
   * the operator run forever at 100 TB/day ingest.
   *
   * Boundary semantics match the batch [[sessionize]]: an event at
   * EXACTLY `gapSeconds` after the previous continues its session
   * (`session_window` merges on `next.start <= session.end`, the same
   * strict-`>`-splits rule — SessionsSpec pins it).
   *
   * Composes directly with the graft change-feed stream
   * (`spark.readStream.format("graft")` — appends only) and any other
   * streaming source; also runs on a batch frame (the grouping
   * expression is mode-agnostic), which is how the battery oracles it.
   */
  def sessionStatsStream(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    val marked =
      if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
      else events
    marked
      .groupBy(col(userCol),
        session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("dur_us"))
      .select(col(userCol),
        unix_micros(col("session_window.start")).as("session_us"),
        col("n_events"), col("dur_us"))
  }

  /** Per-session rollup on top of [[sessionize]]: `(userCol, session_idx,
   *  n_events, dur_us)`. The rollup's clustering keys start with the
   *  window's partition key, so the user-hash exchange already satisfies
   *  its distribution — one exchange total (SessionsSpec gates it). */
  def sessionStats(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long): DataFrame =
    sessionize(events, userCol, tsCol, tieCol, lit(gapSeconds))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("dur_us"))
}
