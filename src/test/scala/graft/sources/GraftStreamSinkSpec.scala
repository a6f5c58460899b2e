package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.write.{Snapshots, TokenSortedWriter}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Native streaming sink (`writeStream.format("graft")`): micro-batches
 *  through the bulk write pipeline, exactly-once under replay via txn
 *  progress markers committed atomically with each snapshot version. */
class GraftStreamSinkSpec extends SparkSpec {

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("writeStream.format(graft): batches land token-sorted with snapshot " +
      "versions; restart from the same checkpoint does not duplicate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tempDir("graft_sink_") + "/docs"
    val cp = tempDir("graft_sink_cp_")
    val mem = MemoryStream[(Long, String)]
    def start() = mem.toDS().toDF("id", "payload")
      .writeStream.format("graft")
      .option("path", dir).option("pk", "id")
      .option("snapshot", "true").option("partitions", "2")
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append).start()

    val q = start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      val read = spark.read.format("graft").option("path", dir).option("pk", "id").load()
      assert(read.count() == 3L)
      // one snapshot version per non-empty batch, txn marker at the head
      val head = Snapshots.latestVersion(spark, dir).get
      assert(head == 2L, s"expected 2 committed batches, head v$head")
      assert(Snapshots.streamTxn(spark, dir, cp.stripSuffix("/")).contains(1L))
    } finally q.stop()

    // restart from the same checkpoint: only NEW data lands
    val q2 = start()
    try {
      mem.addData((4L, "d"))
      q2.processAllAvailable()
      val ids = spark.read.format("graft").option("path", dir).option("pk", "id")
        .load().select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 4L), s"got $ids")
    } finally q2.stop()
  }

  test("replayed batch id is skipped exactly-once, even after maintenance " +
      "commits in between") {
    import spark.implicits._
    val dir = tempDir("graft_sink_replay_") + "/t"
    val cp = "/tmp/ckpt-replay-fixed"
    val sink = new GraftStreamSink(
      Map("path" -> dir, "pk" -> "id", "snapshot" -> "true",
        "partitions" -> "2", "checkpointLocation" -> cp),
      OutputMode.Append())
    val batch0 = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    sink.addBatch(0L, batch0)
    assert(spark.read.parquet(dir).count() == 2L)
    // crash-replay of the SAME batch: skipped, count unchanged
    sink.addBatch(0L, batch0)
    assert(spark.read.parquet(dir).count() == 2L)
    // a later batch lands
    sink.addBatch(1L, Seq((3L, 30L)).toDF("id", "v"))
    assert(Snapshots.streamTxn(spark, dir, cp).contains(1L))
    // maintenance between batches must not erase the replay guard:
    // OPTIMIZE commits a layout-only version — the txn marker inherits.
    // A FRESH sink instance (= restarted query) must see it in the LOG,
    // not an in-memory cache
    TokenSortedWriter.optimizeSmallFiles(spark, CqlSchema("t", Seq("id")), dir,
      smallBytes = 64L << 20, targetBytes = 64L << 20)
    val restarted = new GraftStreamSink(
      Map("path" -> dir, "pk" -> "id", "snapshot" -> "true",
        "partitions" -> "2", "checkpointLocation" -> cp),
      OutputMode.Append())
    restarted.addBatch(1L, Seq((3L, 30L)).toDF("id", "v")) // replay after OPTIMIZE
    val rows = spark.read.format("graft").option("path", dir).option("pk", "id")
      .load().select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(1L, 2L, 3L), s"replay after maintenance duplicated: $rows")
  }

  test("refusals: log-less target, missing checkpoint identity, non-append mode") {
    val e = intercept[IllegalArgumentException] {
      new GraftStreamSink(
        Map("path" -> "/tmp/x", "pk" -> "id", "checkpointLocation" -> "/tmp/c"),
        OutputMode.Append())
    }
    assert(e.getMessage.contains("snapshot"))
    val e2 = intercept[IllegalArgumentException] {
      new GraftStreamSink(
        Map("path" -> "/tmp/x", "pk" -> "id", "snapshot" -> "true"),
        OutputMode.Append())
    }
    assert(e2.getMessage.contains("checkpointLocation"))
    val e3 = intercept[IllegalArgumentException] {
      new GraftStreamSink(
        Map("path" -> "/tmp/x", "pk" -> "id", "snapshot" -> "true",
          "checkpointLocation" -> "/tmp/c"),
        OutputMode.Update())
    }
    assert(e3.getMessage.contains("Append"))
  }
}
