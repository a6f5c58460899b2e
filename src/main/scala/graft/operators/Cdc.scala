package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Change-data-capture consumption: turn a row-level change feed
 * ([[graft.write.Snapshots.readChangesWithDeletes]], the DSv2
 * `changeFeedMode=rows` scan, or a CoW `changeFeedCow` sidecar feed —
 * all tagged `_change_type` ∈ insert|delete|update_preimage|
 * update_postimage with `_commit_version`) into downstream state.
 *
 * Two halves, composable:
 *
 *  - [[pairUpdates]] upgrades a delete+insert feed to the four-type
 *    vocabulary: a delete and an insert at the SAME commit version with
 *    the SAME identity (a stable row id on row-tracked tables, else the
 *    primary key) are one update — retag the pair. Pure increment-sized
 *    joins; the corpus is never touched.
 *  - [[applyChanges]] is the replication sink (the `APPLY CHANGES INTO` /
 *    CDC-merge pattern): collapse the increment to its LATEST event per
 *    key, then one `MERGE INTO` against the target — per-key upsert or
 *    delete. Cost is O(increment) for the collapse (one shuffle of the
 *    feed, never the target's table) plus MERGE's group-filtered rewrite
 *    (only target files holding matched keys move; see
 *    [[graft.sources.GraftRowLevel]]).
 *
 * Ordering contract: within one [[applyChanges]] call the winner per key
 * is max (sequence, event rank) where postimage/insert outranks
 * preimage/delete AT THE SAME sequence (an update collapses to its
 * postimage; a later delete still wins). ACROSS calls the feed must be
 * consumed in version order — exactly what snapshot-log range consumption
 * (`(from, to]` monotone) guarantees — because the target stores no
 * per-row sequence to reject stale replays with.
 */
object Cdc {

  import graft.write.Snapshots.{ChangeTypeCol, CommitVersionCol}

  /** Retag same-version delete+insert pairs that share `by` (all columns
   *  non-null) as update_preimage/update_postimage; everything else
   *  passes through. Identity choice: `_graft_row_id` on row-tracked
   *  feeds (ids survive updates by construction), the primary key
   *  otherwise. Rows with a null identity column never pair. */
  def pairUpdates(feed: DataFrame, by: Seq[String]): DataFrame = {
    require(by.nonEmpty, "pairUpdates needs at least one identity column")
    require((by :+ ChangeTypeCol :+ CommitVersionCol).forall(feed.columns.contains),
      s"pairUpdates: feed lacks ${(by :+ ChangeTypeCol :+ CommitVersionCol)
        .filterNot(feed.columns.contains).mkString(",")}")
    val keyCols = (CommitVersionCol +: by).map(col)
    def side(t: String) = feed.filter(col(ChangeTypeCol) === t)
      .select(keyCols: _*).na.drop(by).distinct()
    // O(increment): both sides are the feed's own rows, keyed slim
    val paired = side("delete").join(side("insert"), CommitVersionCol +: by)
      .withColumn("__cdc_paired", lit(true))
    feed.join(paired, CommitVersionCol +: by, "left_outer")
      .withColumn(ChangeTypeCol,
        when(col("__cdc_paired").isNull, col(ChangeTypeCol))
          .when(col(ChangeTypeCol) === "delete", lit("update_preimage"))
          .when(col(ChangeTypeCol) === "insert", lit("update_postimage"))
          .otherwise(col(ChangeTypeCol)))
      .drop("__cdc_paired")
      .select(feed.columns.map(col).toIndexedSeq: _*)
  }

  /** Apply a change feed into `targetTable` (a graft catalog table with a
   *  primary key): collapse to the latest event per `keys`, then MERGE —
   *  matched+deleted rows go away, matched postimages update, unmatched
   *  inserts land. `sequenceBy` defaults to the feed's commit version. */
  def applyChanges(
      spark: SparkSession,
      targetTable: String,
      feed: DataFrame,
      keys: Seq[String],
      sequenceBy: Seq[String] = Seq(CommitVersionCol)): Unit = {
    require(keys.nonEmpty, "applyChanges needs key columns")
    require((keys ++ sequenceBy :+ ChangeTypeCol).forall(feed.columns.contains),
      s"applyChanges: feed lacks ${(keys ++ sequenceBy :+ ChangeTypeCol)
        .filterNot(feed.columns.contains).mkString(",")}")
    val dataCols = spark.table(targetTable).columns.toIndexedSeq
    require(dataCols.forall(feed.columns.contains),
      s"applyChanges: feed lacks target column(s) " +
        s"${dataCols.filterNot(feed.columns.contains).mkString(",")}")

    // winner per key: latest sequence; postimage beats preimage at a tie
    // (an update collapses to its postimage) — one shuffle of the FEED
    val rank = when(col(ChangeTypeCol).isin("insert", "update_postimage"), 1)
      .otherwise(0)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((sequenceBy.map(col(_).desc) :+ rank.desc): _*)
    val winners = feed
      .withColumn("__cdc_rn", row_number().over(w))
      .filter(col("__cdc_rn") === 1)
      .select((dataCols :+ ChangeTypeCol).map(col): _*)

    val view = s"__graft_apply_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    winners.createOrReplaceTempView(view)
    try {
      val on = keys.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
      val sets = dataCols.map(c => s"t.`$c` = s.`$c`").mkString(", ")
      val ins = dataCols.map(c => s"`$c`").mkString(", ")
      val vals = dataCols.map(c => s"s.`$c`").mkString(", ")
      spark.sql(
        s"""MERGE INTO $targetTable t USING $view s ON $on
           |WHEN MATCHED AND s.`$ChangeTypeCol` IN ('delete', 'update_preimage')
           |  THEN DELETE
           |WHEN MATCHED THEN UPDATE SET $sets
           |WHEN NOT MATCHED AND s.`$ChangeTypeCol` NOT IN ('delete', 'update_preimage')
           |  THEN INSERT ($ins) VALUES ($vals)""".stripMargin)
    } finally spark.catalog.dropTempView(view)
  }

  /** Continuous replication: stream the source table's row-level change
   *  feed (`changeFeedMode=rows` — O(1) version-ledger offsets) and
   *  [[applyChanges]] each micro-batch into `targetTable`.
   *
   *  Delivery is effectively exactly-once: offsets checkpoint per batch,
   *  and a replayed batch is IDEMPOTENT through the MERGE — re-applied
   *  postimages update to the same values, re-applied deletes match
   *  nothing, re-applied inserts hit WHEN MATCHED and update in place —
   *  so at-least-once replay converges to the same replica state.
   *
   *  Within one micro-batch the collapse-to-latest handles multiple
   *  commits (sequenced by `_commit_version`); across batches the ledger
   *  delivers monotone version ranges — exactly [[applyChanges]]'s
   *  ordering contract. */
  def applyChangesStream(
      spark: SparkSession,
      sourceDir: String,
      targetTable: String,
      keys: Seq[String],
      checkpointLocation: String,
      startingVersion: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery = {
    val feed = spark.readStream.format("graft")
      .option("path", sourceDir)
      .option("changeFeedMode", "rows")
      .option("startingVersion", startingVersion.toString)
      .load()
    feed.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        if (!batch.isEmpty)
          applyChanges(batch.sparkSession, targetTable, batch.toDF(), keys)
      }
      .option("checkpointLocation", checkpointLocation)
      .start()
  }
}
