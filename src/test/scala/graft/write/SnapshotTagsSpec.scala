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

  test("SQL time travel accepts tag pins through the catalog") {
    val dir = freshTable()
    Snapshots.tag(spark, dir, "release", 2L)
    val base = Files.createTempDirectory("graft_tagcat_").toString
    spark.conf.set("spark.sql.catalog.tcat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tcat.base", base)
    spark.sql("CREATE TABLE tcat.db.t (id BIGINT, v BIGINT) " +
      s"USING graft LOCATION '$dir' OPTIONS (pk 'id')")
    val n = spark.sql("SELECT count(*) FROM tcat.db.t VERSION AS OF 'tag:release'")
      .head().getLong(0)
    assert(n == 200L)
    assert(spark.sql("SELECT count(*) FROM tcat.db.t").head().getLong(0) == 300L)
  }

  test("vacuumOrphans removes unreferenced debris, never live or young files") {
    val dir = freshTable()
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    // plant debris: a parquet file no snapshot ever referenced
    val debris = new org.apache.hadoop.fs.Path(p, "part-debris-000.parquet")
    Seq((9999L, 9999L)).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(dir + "/.debris_tmp")
    val part = f.listStatus(new org.apache.hadoop.fs.Path(dir + "/.debris_tmp"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(f.rename(part, debris))
    f.delete(new org.apache.hadoop.fs.Path(dir + "/.debris_tmp"), true)

    // young debris is protected by the in-flight horizon
    assert(Snapshots.vacuumOrphans(spark, dir, olderThanMs = 3600000L).isEmpty)
    // dry run reports without deleting
    val would = Snapshots.vacuumOrphans(spark, dir, 0L, dryRun = true)
    assert(would == Seq(f.makeQualified(debris).toString))
    assert(f.exists(debris))
    // real run deletes exactly the debris; table content intact
    assert(Snapshots.vacuumOrphans(spark, dir, 0L) == would)
    assert(!f.exists(debris))
    assert(pinnedCount(dir, "latest") == 300L)
    assert(Snapshots.vacuumOrphans(spark, dir, 0L).isEmpty)
    // refused on log-less tables: everything would be an "orphan"
    val plain = Files.createTempDirectory("graft_orph_").toString + "/t"
    TokenSortedWriter.write(Seq((1L, 1L)).toDF("id", "v"),
      graft.model.CqlSchema.apply("t", Seq("id")), plain, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1))
    intercept[IllegalStateException] { Snapshots.vacuumOrphans(spark, plain, 0L) }
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
