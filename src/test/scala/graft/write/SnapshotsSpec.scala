package graft.write

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkSpec {

  import spark.implicits._

  private val schema = CqlSchema("t", Seq("id"))

  private def rows(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "payload")

  private def freshDir(): String =
    Files.createTempDirectory("graft_snap_").toString + "/t"

  private def writeSnap(df: DataFrame, dir: String): Unit =
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, snapshot = true))

  private def readPin(dir: String, pin: String): DataFrame =
    spark.read.format("graft").option("path", dir).option("pk", "id")
      .option("snapshotVersion", pin).load()

  test("append commits version the batch atomically; pins see their version") {
    val dir = freshDir()
    writeSnap(rows(0 until 10), dir)
    writeSnap(rows(10 until 15), dir)
    assert(Snapshots.latestVersion(spark, dir).contains(2L))

    assert(readPin(dir, "1").count() == 10L)
    assert(readPin(dir, "2").count() == 15L)
    assert(readPin(dir, "latest").count() == 15L)
    // pinned content, not just count: v1 has exactly ids 0-9
    assert(readPin(dir, "1").select("id").as[Long].collect().sorted.toSeq ==
      (0L until 10L))
    // unpinned read = live listing (unchanged default behavior)
    val live = spark.read.format("graft").option("path", dir)
      .option("pk", "id").load()
    assert(live.count() == 15L)
  }

  test("unknown version and missing log fail loudly") {
    val dir = freshDir()
    writeSnap(rows(0 until 4), dir)
    val e = intercept[Exception](readPin(dir, "7").count())
    assert(e.getMessage.contains("v7"))

    val bare = freshDir()
    rows(0 until 3).write.parquet(bare) // no snapshot log at all
    val e2 = intercept[Exception] {
      spark.read.format("graft").option("path", bare).option("pk", "id")
        .option("snapshotVersion", "latest").load().count()
    }
    assert(e2.getMessage.contains("no snapshot log"))
  }

  test("snapshot mode rejects SaveMode.Overwrite") {
    val dir = freshDir()
    writeSnap(rows(0 until 4), dir)
    val e = intercept[IllegalArgumentException] {
      TokenSortedWriter.write(rows(4 until 8), schema, dir, SaveMode.Overwrite,
        TokenSortedWriter.WriteConf(snapshot = true, allowOverwrite = true))
    }
    assert(e.getMessage.contains("snapshot"))
  }

  test("metadata-only COUNT(*) respects the pin") {
    val dir = freshDir()
    writeSnap(rows(0 until 10), dir)
    writeSnap(rows(10 until 15), dir)
    val pinned = readPin(dir, "1").agg(count(lit(1)).as("n"))
    // the plan must still be the stats scan (zero data reads)...
    val planned = pinned.queryExecution.executedPlan.toString
    assert(planned.contains("GraftStatsScan"), s"expected stats scan in:\n$planned")
    // ...and must answer for the PINNED file set, not the live one
    assert(pinned.as[Long].head() == 10L)
  }

  test("commitRewrite + vacuum reconcile listing to the log; expired pins fail") {
    val dir = freshDir()
    writeSnap(rows(0 until 10), dir)   // v1
    writeSnap(rows(10 until 15), dir)  // v2
    // logical rewrite back to v1's file set (a compaction that decided the
    // second batch's files should be replaced by... nothing, for the test)
    val v1Files = Snapshots.files(spark, dir, 1L)
    assert(Snapshots.commitRewrite(spark, dir, v1Files) == 3L)
    assert(readPin(dir, "3").count() == 10L)
    // live listing still sees the logically-removed files
    assert(spark.read.format("graft").option("path", dir).option("pk", "id")
      .load().count() == 15L)

    // vacuum to the latest snapshot: v2-only files are deleted, old
    // snapshot files dropped
    val deleted = Snapshots.vacuum(spark, dir, keepLast = 1)
    assert(deleted.nonEmpty)
    assert(spark.read.format("graft").option("path", dir).option("pk", "id")
      .load().count() == 10L)
    assert(readPin(dir, "3").count() == 10L)
    val e = intercept[Exception](readPin(dir, "2").count())
    assert(e.getMessage.contains("v2"))
  }

  test("racing commitAppends linearize: distinct versions, union of both batches") {
    // Spark's own file committer cannot run two jobs against one output dir
    // (shared _temporary), so the parquet writes are sequential — the race
    // under test is the snapshot LOG protocol itself.
    val dir = freshDir()
    writeSnap(rows(0 until 4), dir) // v1 so both racers share a parent
    val before = Snapshots.files(spark, dir, 1L).toSet
    rows(100 until 104).write.mode(SaveMode.Append).parquet(dir)
    val afterA = spark.read.parquet(dir).inputFiles.toSet
    rows(200 until 204).write.mode(SaveMode.Append).parquet(dir)
    val afterB = spark.read.parquet(dir).inputFiles.toSet
    val addedA = (afterA -- before).toSeq
    val addedB = (afterB -- afterA).toSeq
    assert(addedA.nonEmpty && addedB.nonEmpty)

    val versions = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val t1 = new Thread(() => versions.add(Snapshots.commitAppend(spark, dir, addedA)))
    val t2 = new Thread(() => versions.add(Snapshots.commitAppend(spark, dir, addedB)))
    t1.start(); t2.start(); t1.join(); t2.join()
    import scala.jdk.CollectionConverters._
    assert(versions.asScala.toSet == Set(2L, 3L))
    assert(Snapshots.latestVersion(spark, dir).contains(3L))
    // the final snapshot carries every file of both racing commits
    assert(readPin(dir, "3").select("id").as[Long].collect().sorted.toSeq ==
      ((0L until 4L) ++ (100L until 104L) ++ (200L until 204L)))
  }

  test("compactInPlace: folds LWW generations + tombstones, reclaims old files") {
    val dir = freshDir()
    val base = (0 until 20).map(i => (i.toLong, s"old$i")).toDF("id", "payload")
    TokenSortedWriter.write(base, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true,
        writetimeMicros = Some(1000L)))
    TokenSortedWriter.write(
      base.filter($"id" % 2 === 0).withColumn("payload", concat(lit("new"), $"id")),
      schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true,
        writetimeMicros = Some(2000L)))
    TokenSortedWriter.writeDeletes(
      base.filter($"id" >= 15).select("id"), schema, dir,
      writetimeMicros = Some(3000L))

    val version = TokenSortedWriter.compactInPlace(spark, schema, dir,
      TokenSortedWriter.WriteConf(numPartitions = 2))
    assert(version == 2L) // v1 = pre-compaction census, v2 = rewrite

    // plain read of the compacted generation: LWW applied, deletes purged
    val got = spark.read.format("graft").option("path", dir).option("pk", "id")
      .load().select("id", "payload").as[(Long, String)].collect().toMap
    assert(got.size == 15)
    assert(got(3L) == "old3" && got(4L) == "new4")
    assert(!got.contains(16L))

    // physical reclamation: every live data file sits in the fresh generation
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files = graft.sources.TokenPruner.listDataFiles(fs, fs.makeQualified(p))
    assert(files.nonEmpty && files.forall(_.getPath.toString.contains("/gen-")))
    // pre-compaction pin is gone at retain 1
    intercept[Exception](readPin(dir, "1").count())
  }

  test("compactInPlace with vacuumRetain=2 keeps the pre-compaction pin") {
    val dir = freshDir()
    writeSnap(rows(0 until 8), dir) // v1
    TokenSortedWriter.compactInPlace(spark, schema, dir,
      TokenSortedWriter.WriteConf(numPartitions = 1), vacuumRetain = 2)
    // v1 still readable (its files survived), latest is the fold
    assert(readPin(dir, "1").count() == 8L)
    assert(readPin(dir, "latest").count() == 8L)
  }

  test("readChanges: exact increments, empty range, rewrite barrier") {
    val dir = freshDir()
    writeSnap(rows(0 until 5), dir)    // v1
    writeSnap(rows(5 until 9), dir)    // v2
    writeSnap(rows(9 until 12), dir)   // v3

    def ids(from: Long, to: Long): Seq[Long] =
      Snapshots.readChanges(spark, dir, from, to)
        .select("id").as[Long].collect().sorted.toSeq
    assert(ids(0L, 1L) == (0L until 5L))
    assert(ids(1L, 2L) == (5L until 9L))
    assert(ids(1L, 3L) == (5L until 12L))
    // empty range: zero rows but the table schema
    val none = Snapshots.readChanges(spark, dir, 2L, 2L)
    assert(none.count() == 0L)
    assert(none.columns.contains("id") && none.columns.contains("payload"))

    // a rewrite in the range breaks file-level provenance → loud failure
    val v3Files = Snapshots.files(spark, dir, 3L)
    Snapshots.commitRewrite(spark, dir, v3Files.take(1)) // v4 removes files
    val e = intercept[IllegalStateException](
      Snapshots.readChanges(spark, dir, 2L, 4L).count())
    assert(e.getMessage.contains("rewrite"))
  }

  test("streaming read rejects a snapshot pin") {
    val dir = freshDir()
    writeSnap(rows(0 until 4), dir)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").option("path", dir)
        .option("pk", "id").option("snapshotVersion", "1").load()
        .writeStream.format("memory").queryName("snap_pin_reject")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination(30000) finally q.stop()
    }
    assert(e.getMessage != null)
  }
}
