package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming over the event-log shape (`events` table: user_id,
 * ts, event_id, event_type, value, props).
 *
 * The reference advertises MICRO_BATCH_READ but ships no stream
 * implementation (SURVEY §1.1: capability constant only, no
 * `MicroBatchStream`, no CDC module) — so this layer is the Spark-native
 * extension of the engine, built entirely on public Structured Streaming
 * primitives: `readStream` file source → watermarked event-time windows →
 * `flatMapGroupsWithState` sessionization → `writeStream`.
 *
 * Scale design (100 TB/day event firehose):
 *  - Windowed aggregation state is bounded by the watermark: late rows
 *    beyond `delay` are dropped and window state older than
 *    `watermark - window` is evicted — state size is O(active windows ×
 *    groups), independent of stream length.
 *  - Sessionization state is one small case class per ACTIVE user (open
 *    session bounds + counters), keyed-state-partitioned across executors;
 *    `EventTimeTimeout` closes sessions exactly when the watermark passes
 *    `session_end + gap`, so emission is deterministic w.r.t. event time,
 *    not arrival time.
 *  - Everything here also runs in batch mode ([[sessionizeBatch]] /
 *    [[windowedTypeCounts]] over a static frame) — one code path per
 *    semantic, verified against each other in the spec and against the
 *    DuckDB oracle in the battery (q40/q41).
 */
object EventStreams {

  final case class Event(
      user_id: Long, event_id: Long, event_type: String, ts: Timestamp, value: Double)

  final case class SessionState(
      start: Long, end: Long, nEvents: Long, totalValue: Double)

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  /** File-based micro-batch source over a directory of event parquet. */
  def readEventStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /**
   * Watermarked tumbling-window counts per event type. Works identically on
   * a static DataFrame (the watermark is a no-op in batch) — the battery's
   * q40 runs exactly this plan in batch against the DuckDB oracle.
   */
  def windowedTypeCounts(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    wm.groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /**
   * Streaming sessionization: events within `gapSeconds` of each other (per
   * user) form one session; a session closes when the event-time watermark
   * passes `session_end + gap`. Custom keyed state via
   * `flatMapGroupsWithState` (the Spark primitive for reference-less
   * stateful operators; SURVEY §2.12 marks streaming as our extension).
   *
   * Cross-batch disorder: a late event (inside the watermark — older rows
   * are filtered by `withWatermark` before the state function) that lands
   * WITHIN the gap before the open session's start extends the session
   * backward (`start = min(start, t)`), matching batch semantics. An event
   * more than `gap` older than the open session's start belongs to an
   * earlier, possibly already-emitted session; with one-session-per-key
   * state it cannot re-split history, so it is emitted as its own singleton
   * session. The watermark delay (= gap) bounds how far this divergence
   * from [[sessionizeBatch]] can reach: only events within `gap` of the
   * max seen event time are accepted at all, so in-order-across-batches
   * input (the spec's fixture) is exactly batch-equivalent.
   */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          // MICROSECOND precision throughout — the batch twin compares
          // unix_micros, and ms-truncated gaps would split sessions
          // differently on sub-millisecond data (the events fixture carries
          // microsecond timestamps)
          def toMicros(ts: Timestamp): Long =
            Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000
          def toTs(us: Long): Timestamp = {
            val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
            t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
            t
          }
          def toSession(s: SessionState): Session =
            Session(userId, toTs(s.start), toTs(s.end), s.nEvents, s.totalValue)

          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed end+gap with no new events: close the session
            val out = state.getOption.map(toSession).toList
            state.remove()
            out.iterator
          } else {
            // micro-batch arrival order is arbitrary: order by event time
            val evs = batch.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            val gapUs = gapSeconds * 1000000L
            evs.foreach { e =>
              val t = toMicros(e.ts)
              cur match {
                case Some(s) if t >= s.start - gapUs && t - s.end <= gapUs =>
                  // in or adjacent to the open session — extend either end
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
                    s.nEvents + 1, s.totalValue + e.value))
                case Some(s) if t < s.start - gapUs =>
                  // late event from before the open session: can't re-split
                  // already-emitted history, emit as its own session (see doc)
                  closed ::= Session(userId, toTs(t), toTs(t), 1, e.value)
                case Some(s) =>
                  closed ::= toSession(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout API is epoch millis: round UP so the timeout never
              // fires before the microsecond-exact gap has fully elapsed
              state.setTimeoutTimestamp(
                Math.floorDiv(s.end + gapUs + 999L, 1000L))
            }
            closed.reverse.iterator
          }
      }
  }

  /**
   * Batch sessionization with identical semantics (gap-split by event time):
   * `lag` marks session starts, a running sum numbers sessions, one
   * aggregation per (user, session). Two shuffle-free window passes over the
   * same (user_id, ts) partitioning + one hash aggregate — at 100 TB this is
   * one shuffle on user_id total. Verified equal to [[sessionizeStream]] in
   * the spec and against DuckDB in the battery (q41).
   */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col(tsCol), 1).over(w)
    // microsecond-exact gap test (timestamp cast to long floors to seconds,
    // which would disagree with an exact-epoch oracle on sub-second data)
    val isNew = when(prevTs.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__new_sess", isNew)
      .withColumn("__sess_no", sum(col("__new_sess")).over(run))
      .groupBy(col(userCol), col("__sess_no").as("session_no"))
      .agg(
        date_format(min(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("total_value"))
  }

  /**
   * Stream-static enrichment join: the event stream (or a batch frame — one
   * code path, like every operator here) joined to a SMALL static dimension.
   * Structured Streaming plans this as a per-micro-batch join with no
   * streaming state at all, and the explicit `broadcast` keeps it a
   * broadcast hash join on every batch — at 100 TB/day the firehose never
   * shuffles; only the dimension moves, once per executor.
   */
  def enrichWithDim(
      events: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    events.join(broadcast(dim), keys, joinType)

  /**
   * Stream-stream event-time correlation join: pairs of rows sharing `key`
   * with the right timestamp inside `[left ts, left ts + withinSeconds]`.
   * Both sides carry watermarks and the join condition carries the time
   * band — exactly the two things Spark needs to EVICT join state: buffered
   * rows older than `watermark - band` can never match again and are
   * dropped, so state is bounded by the band, not the stream length.
   *
   * Callers pass frames whose non-key column names are disjoint (alias
   * before calling); the same call works on batch frames, where the
   * watermark is a no-op and Catalyst plans an ordinary equi-join with a
   * band post-filter.
   */
  def correlateStreams(
      left: DataFrame,
      right: DataFrame,
      key: String,
      withinSeconds: Long,
      leftTs: String,
      rightTs: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTs, watermarkDelay) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, watermarkDelay) else right
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $withinSeconds SECONDS"))
      .drop(r(key))
  }

  /** Streaming exact-dedup on a key within the watermark horizon — the
   *  streaming analog of `Dedup.exact`: KEY-ONLY semantics (a retried
   *  producer re-stamping ts must still collapse), with state bounded by
   *  the watermark via `dropDuplicatesWithinWatermark`. The old
   *  `dropDuplicates(keys :+ ts)` formulation silently deduped on
   *  (key, ts) and passed re-stamped duplicates through. */
  def dedupeStream(events: DataFrame, keyCols: Seq[String], watermarkDelay: String): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /**
   * Streaming INGESTION into the graft table format: each micro-batch runs
   * the full token-sorted write (tokenize → range → sort → manifest), with
   * `writetime = micro-batch id`.
   *
   * The batch-id writetime makes replays IDEMPOTENT end-to-end: after a
   * failure, Structured Streaming re-delivers a batch with the same id, the
   * rewrite lands byte-identical versions at the same writetime, and the
   * read path's LWW collapse (writetime + total value tie-break,
   * [[graft.write.TokenSortedWriter.readNormalized]]) resolves duplicates
   * deterministically — the classic foreachBatch exactly-once recipe,
   * expressed with the engine's own merge semantics instead of an external
   * transaction log. Monotonic batch ids also mean a key UPDATED in a later
   * batch wins, so the table is a streaming upsert view.
   */
  def writeGraftStream(
      events: DataFrame,
      schema: graft.model.CqlSchema,
      path: String,
      checkpointDir: String,
      numPartitions: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.write.TokenSortedWriter.write(
          batch.toDF(), schema, path, org.apache.spark.sql.SaveMode.Append,
          graft.write.TokenSortedWriter.WriteConf(
            numPartitions = numPartitions, keepTokenColumn = true,
            writetimeMicros = Some(id)))
      }
      .start()

  /**
   * Continuous downstream-aggregate maintenance: the change-feed stream
   * ([[graft.sources.GraftChangeFeedStream]], version = offset) feeds a
   * running per-key aggregate (`n_rows` + `sum_<col>` for each of
   * `sumCols`) materialized as an LWW graft table — the streaming twin of
   * the q148 batch pattern, closing the loop from "a batch landed on the
   * source table" to "the downstream rollup reflects it" with IO
   * proportional to the increment.
   *
   * Exactly-once folding under micro-batch replay: each batch folds its
   * delta into the PRIOR state — the LWW-resolved table restricted to
   * `writetime < batchId + 1`, so a replayed batch never sees its own
   * earlier (possibly partial) write — and writes the folded rows with
   * `writetime = batchId + 1`. A replay therefore recomputes bit-identical
   * rows at the same writetime, and the LWW read collapses the duplicates
   * deterministically. Sums must be over integral columns (exact,
   * order-free); double sums would be order-dependent — cast to decimal
   * upstream if needed.
   *
   * 100 TB shape: the delta aggregate is one map-side-combined pass over
   * the increment only; the prior state is one table read of the ROLLUP
   * (keys × versions, tiny next to the source); the fold shuffles only
   * (key, counters) rows. `compactEvery = N` folds the version history
   * down in place every N batches so prior reads stay O(keys) instead of
   * O(keys × batches) — the compaction runs at batch START and SKIPS
   * itself whenever a write from the replaying batch already landed
   * (body comment spells out the tie it would otherwise create).
   */
  def maintainAggStream(
      feed: DataFrame,
      keyCols: Seq[String],
      sumCols: Seq[String],
      schema: graft.model.CqlSchema,
      path: String,
      checkpointDir: String,
      numPartitions: Int = 1,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 0, s"compactEvery must be >= 0, got $compactEvery")
    val writer0 = feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
    val writer = trigger.fold(writer0)(writer0.trigger)
    val outCols = "n_rows" +: sumCols.map(c => s"sum_$c")
    writer.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
      val spark = batch.sparkSession
      val wt = id + 1L
      val firstAgg = count(lit(1)).as("n_rows")
      val restAgg = sumCols.map(c => sum(col(c)).as(s"sum_$c"))
      val delta = batch.toDF().groupBy(keyCols.map(col): _*)
        .agg(firstAgg, restAgg: _*)
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // compaction runs at batch START, and ONLY when no write from this
      // very batch already landed (a crash after the write but before the
      // checkpoint commit replays the batch): compacting then would fold
      // the replayed attempt's wt = id+1 rows into the single surviving
      // version, the `writetime < id+1` prior read would see NOTHING, and
      // the re-fold would write delta-only rows tying the cumulative ones
      // at the same writetime. Skipping costs one deferred compaction;
      // folding history whose winning writetimes are all ≤ id is safe.
      if (compactEvery > 0 && id > 0 && id % compactEvery == 0 && fs.exists(p)) {
        val wtCol = graft.write.TokenSortedWriter.WritetimeCol
        val maxWt = spark.read.format("graft")
          .option("path", path)
          .option("pk", schema.partitionKeys.mkString(","))
          .load()
          .agg(max(col(wtCol))).head()
        if (maxWt.isNullAt(0) || maxWt.getLong(0) < wt)
          graft.write.TokenSortedWriter.compactInPlace(spark, schema, path,
            graft.write.TokenSortedWriter.WriteConf(numPartitions = numPartitions))
      }
      val folded =
        if (!fs.exists(p)) delta
        else {
          val wtCol = graft.write.TokenSortedWriter.WritetimeCol
          // graft-source read, not a flat parquet read: it lists the
          // compacted gen-* layout, resolves the snapshot log if one
          // exists, and keeps the engine's writetime column exposed
          val raw = spark.read.format("graft")
            .option("path", path)
            .option("pk", schema.partitionKeys.mkString(","))
            .load()
          val prior = graft.operators.Normalize.latestWriteWinsAgg(
              raw.filter(col(wtCol) < wt),
              keyCols, Seq(wtCol))
            .select((keyCols ++ outCols).map(col): _*)
          prior.unionByName(delta).groupBy(keyCols.map(col): _*)
            .agg(sum(col("n_rows")).as("n_rows"),
              sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
        }
      // snapshot = true on EVERY fold write: compactEvery's rewrite gives
      // the rollup a snapshot log, and once a table has one, unpinned
      // graft reads resolve to its LATEST version — a non-snapshotted
      // append after a compaction would be invisible to the next batch's
      // prior-state read. Committing each fold keeps log and listing in
      // step (a replayed batch's duplicate version is benign: identical
      // rows at the same writetime, collapsed by LWW).
      graft.write.TokenSortedWriter.write(
        folded, schema, path, org.apache.spark.sql.SaveMode.Append,
        graft.write.TokenSortedWriter.WriteConf(
          numPartitions = numPartitions, keepTokenColumn = true,
          writetimeMicros = Some(wt), snapshot = true))
      ()
    }.start()
  }

  /**
   * Streaming corpus ingestion with CROSS-BATCH incremental near-dup
   * dedup: each micro-batch drops documents that near-duplicate anything
   * already accepted (via the persisted MinHash signature table,
   * [[graft.operators.Dedup.dropAgainstSignatures]]), writes the
   * survivors to `outDir`, and appends the survivors' signatures to
   * `sigDir` — so batch N+1 dedups against everything batches 1..N kept.
   * The signature table is exactly the artifact
   * [[graft.operators.Dedup.corpusSignatures]] persists for batch
   * pipelines: streaming and batch ingestion share one dedup state.
   *
   * Replay semantics — AT-LEAST-ONCE on the survivor parquet, exact on
   * the dedup state: a re-delivered micro-batch re-reads the signature
   * state as of before the batch (survivors write FIRST, so a crash
   * between the two writes replays against the old set), recomputes the
   * identical survivor rows, and re-appends them — accepted documents are
   * never lost and never admit their duplicates, but a crash replay can
   * land the same survivor rows twice in `outDir`. Consumers dedupe on
   * `idCol` at read (one `dropDuplicates`), or route the output through
   * [[writeGraftStream]]'s LWW table for exactly-once materialization.
   * State-side, a replayed batch can re-append its `(batch_id, id, sig)`
   * rows only when the crash fell between the two writes — so duplicate
   * state rows always share the HIGHEST persisted `batch_id`, and the
   * per-batch replay dedup is scoped to that tail batch alone: earlier
   * batches stream through the band probe untouched instead of the whole
   * table shuffling through a `dropDuplicates` every micro-batch.
   *
   * `dedupWithinBatch = true` additionally runs
   * [[graft.operators.Dedup.dropNearDuplicates]] on the batch BEFORE the
   * corpus probe — the daily-increment pipeline's new-vs-new pass — so
   * intra-batch duplicate groups keep their min-id document and only that
   * survivor is checked (and recorded) against the corpus. Default false:
   * the base contract matches `dropAgainstCorpus` (new-vs-old only).
   *
   * `compactEvery = N` rewrites the signature state id-deduped every N
   * batches, bounding the state-size growth that replayed tail batches
   * would otherwise accumulate forever. The rewrite is a two-phase swap
   * (write `<sigDir>.compact.tmp` with its `_SUCCESS` marker, delete the
   * old dir, rename into place) with crash recovery at the next batch
   * start: a complete tmp finishes the swap, an incomplete one is
   * discarded — at no point is the only copy of the state a partial
   * write. Compaction replay is idempotent (re-compacting a compacted
   * table is a no-op), and because a replayed batch's own signatures are
   * already in the compacted state, its documents self-match and the
   * replay appends nothing new — the same survivors-first argument as
   * the uncompacted path. Default 0: never compact.
   */
  def dedupIngestStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      outDir: String,
      sigDir: String,
      checkpointDir: String,
      shingleN: Int = 3,
      numPerms: Int = 64,
      bands: Int = 16,
      minEstJaccard: Double = 0.5,
      dedupWithinBatch: Boolean = false,
      compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    require(compactEvery >= 0, s"compactEvery must be >= 0, got $compactEvery")
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        // resolve through the Hadoop FS API: sigDir can be any Spark URI
        // (hdfs://, s3a://, file:) — a java.io.File check would be false
        // for every non-local scheme and silently disable cross-batch dedup
        val sigPath = new org.apache.hadoop.fs.Path(sigDir)
        val tmpPath = new org.apache.hadoop.fs.Path(sigDir + ".compact.tmp")
        val fs = sigPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // crash recovery for an interrupted compaction swap: a COMPLETE
        // tmp supersedes whatever the swap left behind, an incomplete one
        // is discarded (the shared protocol — see SignatureTableSwap)
        graft.operators.SignatureTableSwap.recover(fs, sigPath, tmpPath)
        val haveSigs = fs.exists(sigPath)
        val incoming =
          if (dedupWithinBatch)
            graft.operators.Dedup.dropNearDuplicates(
              batch.toDF(), idCol, textCol, shingleN, numPerms, bands, minEstJaccard)
          else batch.toDF()
        val clean =
          if (!haveSigs) incoming
          else {
            val state = spark.read.parquet(sigDir)
            // replayed rows always carry the max batch_id (batches commit in
            // order; only the uncommitted tail can re-append) — dedup THAT
            // batch only, the rest of the state streams through unshuffled
            val maxBatch = state.agg(max(col("batch_id"))).head.getLong(0)
            val sigs = state.filter(col("batch_id") < maxBatch)
              .unionByName(
                state.filter(col("batch_id") === maxBatch).dropDuplicates("id"))
              .select(col("id"), col("sig"))
            graft.operators.Dedup.dropAgainstSignatures(
              incoming, sigs, idCol, textCol,
              shingleN, numPerms, bands, minEstJaccard)
          }
        // write survivors first: if the job dies between the two writes,
        // the replay re-drops against the OLD signature set and rewrites
        // the same survivors — never loses accepted docs
        clean.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
        graft.operators.Dedup.corpusSignatures(clean, idCol, textCol, shingleN, numPerms)
          .withColumn("batch_id", lit(id))
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(sigDir)
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0) {
          // two-phase swap (shared protocol); the tmp write materializes
          // BEFORE anything is deleted, and the recovery call above
          // completes or discards it after a crash. batch_id is kept so
          // tail-scoping keeps working.
          graft.operators.SignatureTableSwap.compact(
            spark, fs, sigDir, sigPath, tmpPath, Seq("id"))
        }
        ()
      }
      .start()
  }
}
