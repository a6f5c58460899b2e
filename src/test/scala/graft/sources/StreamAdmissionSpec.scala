package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.write.TokenSortedWriter
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.streaming.Trigger

/** Streaming admission control: `maxFilesPerTrigger` bounds every
 *  micro-batch, and Trigger.AvailableNow pins the backlog at start and
 *  drains it in bounded batches — the backfill-over-an-existing-table
 *  shape that must never become one table-sized batch. */
class StreamAdmissionSpec extends SparkSpec {
  import spark.implicits._

  test("bounded batches drain the pinned backlog, then stop") {
    val dir = Files.createTempDirectory("graft_adm_").toString + "/t"
    val schema = CqlSchema("t", Seq("id"))
    (0 until 6).foreach { b =>
      TokenSortedWriter.write(
        (1L to 10L).map(i => (b * 100L + i, i)).toDF("id", "v"),
        schema, dir, SaveMode.Append,
        TokenSortedWriter.WriteConf(numPartitions = 1))
    }
    val stream = spark.readStream.format("graft")
      .option("path", dir).option("pk", "id")
      .option("maxFilesPerTrigger", "2").load()
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("adm_counts")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("adm_counts").head().getLong(0) == 60L,
      "the whole backlog must drain")
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    assert(dataBatches.length == 3,
      s"6 files at 2/trigger must take 3 batches, got ${dataBatches.length}: " +
        dataBatches.map(_.numInputRows).mkString(","))
    assert(dataBatches.forall(_.numInputRows == 20L),
      "each batch carries exactly 2 files' rows")

    // a file landing after the drain is NOT part of the pinned target…
    TokenSortedWriter.write(Seq((9999L, 1L)).toDF("id", "v"),
      schema, dir, SaveMode.Append, TokenSortedWriter.WriteConf(numPartitions = 1))
    // …but the NEXT AvailableNow run (same checkpoint-free memory sink
    // restart) picks up exactly the increment plus nothing twice
    val q2 = spark.readStream.format("graft")
      .option("path", dir).option("pk", "id")
      .option("maxFilesPerTrigger", "2").load()
      .groupBy().count()
      .writeStream.format("memory").queryName("adm_counts2")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("adm_counts2").head().getLong(0) == 61L)
  }

  test("maxBytesPerTrigger bounds batches by size; an over-cap file still admits") {
    val dir = Files.createTempDirectory("graft_adm_b_").toString + "/t"
    val schema = CqlSchema("t", Seq("id"))
    (0 until 4).foreach { b =>
      TokenSortedWriter.write(
        (1L to 200L).map(i => (b * 1000L + i, s"payload-$i")).toDF("id", "v"),
        schema, dir, SaveMode.Append, TokenSortedWriter.WriteConf(numPartitions = 1))
    }
    val oneFile = TokenPruner.listFiles(spark, dir).map(_.sizeBytes).max
    // cap below a single file: each batch must still make progress (1 file)
    val q = spark.readStream.format("graft")
      .option("path", dir).option("pk", "id")
      .option("maxBytesPerTrigger", (oneFile / 2).toString).load()
      .groupBy().count()
      .writeStream.format("memory").queryName("adm_bytes")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("adm_bytes").head().getLong(0) == 800L)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 4,
      s"an under-file cap admits one file per batch, got ${batches.length}")
    // generous cap packs two files per batch
    val q2 = spark.readStream.format("graft")
      .option("path", dir).option("pk", "id")
      .option("maxBytesPerTrigger", (oneFile * 2).toString).load()
      .groupBy().count()
      .writeStream.format("memory").queryName("adm_bytes2")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("adm_bytes2").head().getLong(0) == 800L)
    assert(q2.recentProgress.count(_.numInputRows > 0) == 2)
  }

  test("without the option a single batch still delivers everything") {
    val dir = Files.createTempDirectory("graft_adm_all_").toString + "/t"
    val schema = CqlSchema("t", Seq("id"))
    (0 until 3).foreach { b =>
      TokenSortedWriter.write(Seq((b.toLong, b.toLong)).toDF("id", "v"),
        schema, dir, SaveMode.Append, TokenSortedWriter.WriteConf(numPartitions = 1))
    }
    val q = spark.readStream.format("graft")
      .option("path", dir).option("pk", "id").load()
      .groupBy().count()
      .writeStream.format("memory").queryName("adm_all")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("adm_all").head().getLong(0) == 3L)
    assert(q.recentProgress.count(_.numInputRows > 0) == 1)
  }
}
