package graft.write

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class SnapshotTagsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_tags_").toString + "/t"
    val schema = CqlSchema("t", Seq("id"))
    val conf = TokenSortedWriter.WriteConf(numPartitions = 2, snapshot = true)
    (1 to 3).foreach { b =>
      TokenSortedWriter.write(
        (1L to 100L).map(i => (b * 1000L + i, i)).toDF("id", "v"),
        schema, dir, SaveMode.Append, conf)
    }
    dir
  }

  private def pinnedCount(dir: String, pin: String): Long =
    spark.read.format("graft").option("path", dir).option("pk", "id")
      .option("snapshotVersion", pin).load().count()

  test("tag pins resolve; tags are immutable until deleted") {
    val dir = freshTable()
    Snapshots.tag(spark, dir, "corpus-v1", 1L)
    Snapshots.tag(spark, dir, "corpus-v2", 2L)
    assert(pinnedCount(dir, "tag:corpus-v1") == 100L)
    assert(pinnedCount(dir, "tag:corpus-v2") == 200L)
    intercept[IllegalStateException] { Snapshots.tag(spark, dir, "corpus-v1", 3L) }
    assert(Snapshots.deleteTag(spark, dir, "corpus-v1"))
    Snapshots.tag(spark, dir, "corpus-v1", 3L)
    assert(pinnedCount(dir, "tag:corpus-v1") == 300L)
    assert(Snapshots.tags(spark, dir).map(_._1) == Seq("corpus-v1", "corpus-v2"))
    // tag files never confuse version discovery
    assert(Snapshots.latestVersion(spark, dir).contains(3L))
  }

  test("vacuum never reclaims a tagged version; deleting the tag releases it") {
    val dir = freshTable()
    Snapshots.tag(spark, dir, "train-2024", 1L)
    val gone = Snapshots.vacuum(spark, dir, keepLast = 1)
    // v2 was reclaimable, v1 is tagged: its files must survive
    assert(pinnedCount(dir, "tag:train-2024") == 100L,
      s"tagged snapshot must survive vacuum (reclaimed: $gone)")
    intercept[Exception] { pinnedCount(dir, "2") }
    assert(Snapshots.deleteTag(spark, dir, "train-2024"))
    Snapshots.vacuum(spark, dir, keepLast = 1)
    intercept[Exception] { pinnedCount(dir, "tag:train-2024") }
    assert(pinnedCount(dir, "latest") == 300L)
  }

  test("bad tag names and unknown tags fail loudly") {
    val dir = freshTable()
    intercept[IllegalArgumentException] { Snapshots.tag(spark, dir, "Bad Name", 1L) }
    intercept[IllegalArgumentException] { Snapshots.tag(spark, dir, "", 1L) }
    intercept[IllegalArgumentException] { Snapshots.tag(spark, dir, "ok", 99L) }
    val e = intercept[Exception] { pinnedCount(dir, "tag:nope") }
    def causes(t: Throwable): Seq[Throwable] = if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null), e.toString)
  }
}
