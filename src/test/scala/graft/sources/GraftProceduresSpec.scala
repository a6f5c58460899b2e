package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.write.Snapshots
import org.apache.spark.sql.functions._

/** SQL maintenance procedures (`CALL cat.system.<proc>` on the DSv2
 *  ProcedureCatalog SPI): optimize/compact/vacuum/tags/restore as
 *  one-statement SQL, committing through the same guarded snapshot-log
 *  paths as the library calls. */
class GraftProceduresSpec extends SparkSpec {

  private lazy val catName: String = {
    val base = Files.createTempDirectory("graft_proc_").toString
    spark.conf.set("spark.sql.catalog.prc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.prc.base", base)
    "prc"
  }
  private def baseDir: String = spark.conf.get(s"spark.sql.catalog.$catName.base")

  private def createMor(name: String, appends: Int = 4, rows: Int = 200): String = {
    spark.sql(s"""CREATE TABLE $catName.db.$name (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true',
                 |dmlMode 'merge-on-read')""".stripMargin)
    (0 until appends).foreach(b => spark.sql(
      s"INSERT INTO $catName.db.$name SELECT id, id * 10 " +
        s"FROM range(1, ${rows + 1}) AS r(id) WHERE id % $appends = $b"))
    s"$baseDir/db/$name"
  }

  test("CALL system.optimize bin-packs small files and folds DVs; " +
      "result row carries the packed count and new version") {
    val dir = createMor("opt")
    spark.sql(s"DELETE FROM $catName.db.opt WHERE v % 90 = 0")
    val before = Snapshots.latestVersion(spark, dir).get
    assert(Snapshots.deletionVectors(spark, dir, before).nonEmpty)
    val res = spark.sql(
      s"CALL $catName.system.optimize(table => 'db.opt')").collect()
    assert(res.length == 1 && res.head.getLong(0) > 0L, s"packed: ${res.toSeq}")
    val v = res.head.getLong(1)
    assert(v > before)
    assert(Snapshots.deletionVectors(spark, dir, v).isEmpty, "DVs must fold")
    // logical rows unchanged
    assert(spark.table(s"$catName.db.opt").count() ==
      (1L to 200L).count(i => (i * 10) % 90 != 0))
  }

  test("CALL system.vacuum reclaims expired generations (and honors dry_run)") {
    val dir = createMor("vac", appends = 3)
    spark.sql(s"CALL $catName.system.optimize(table => 'db.vac')")
    val dry = spark.sql(s"CALL $catName.system.vacuum(table => 'db.vac', " +
      "keep_last => 1, dry_run => true)").collect().map(_.getString(0))
    assert(dry.nonEmpty)
    dry.foreach(p => assert(
      fsOf(dir).exists(new org.apache.hadoop.fs.Path(p)), s"dry_run deleted $p"))
    val real = spark.sql(s"CALL $catName.system.vacuum(table => 'db.vac', " +
      "keep_last => 1)").collect().map(_.getString(0))
    assert(real.sorted.toSeq == dry.sorted.toSeq)
    real.foreach(p => assert(
      !fsOf(dir).exists(new org.apache.hadoop.fs.Path(p)), s"vacuum kept $p"))
    assert(spark.table(s"$catName.db.vac").count() == 200L)
  }

  test("CALL system.create_tag pins the head by default; reads resolve the " +
      "tag; delete_tag releases it") {
    val dir = createMor("tag", appends = 1, rows = 50)
    val v1 = Snapshots.latestVersion(spark, dir).get
    val made = spark.sql(
      s"CALL $catName.system.create_tag(table => 'db.tag', name => 'train-v1')")
      .collect().head
    assert(made.getString(0) == "train-v1" && made.getLong(1) == v1)
    spark.sql(s"INSERT INTO $catName.db.tag VALUES (9001, 0)")
    val pinned = spark.read.format("graft").option("path", dir)
      .option("pk", "id").option("snapshotVersion", "tag:train-v1").load()
    assert(pinned.count() == 50L)
    assert(spark.sql(s"CALL $catName.system.delete_tag(table => 'db.tag', " +
      "name => 'train-v1')").collect().head.getBoolean(0))
    intercept[Exception] {
      spark.read.format("graft").option("path", dir)
        .option("pk", "id").option("snapshotVersion", "tag:train-v1").load().count()
    }
  }

  test("CALL system.restore rolls the head back via one metadata commit") {
    val dir = createMor("rst", appends = 1, rows = 30)
    val v1 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"INSERT INTO $catName.db.rst VALUES (777, 7)")
    assert(spark.table(s"$catName.db.rst").count() == 31L)
    val nv = spark.sql(s"CALL $catName.system.restore(table => 'db.rst', " +
      s"version => $v1)").collect().head.getLong(0)
    assert(nv > v1 + 1)
    assert(spark.table(s"$catName.db.rst").count() == 30L)
    // RESTORE TO TIMESTAMP: the wall-clock of the 31-row head restores it
    val t31 = Snapshots.history(spark, dir).find(_._1 == v1 + 1).get._2
    spark.sql(s"CALL $catName.system.restore(table => 'db.rst', " +
      s"timestamp => '${new java.sql.Timestamp(t31)}')")
    assert(spark.table(s"$catName.db.rst").count() == 31L)
    // neither or both selectors refuse
    val e = intercept[Exception] {
      spark.sql(s"CALL $catName.system.restore(table => 'db.rst')")
    }
    assert(e.getMessage.contains("exactly one"), e.getMessage)
  }

  test("CALL system.vacuum_orphans sweeps uncommitted debris (dry_run first)") {
    val dir = createMor("orp", appends = 1, rows = 20)
    // out-of-band debris: a parquet file the log never heard of
    spark.range(5).selectExpr("id", "id AS v").coalesce(1)
      .write.mode("append").parquet(dir)
    val swept = spark.sql(s"CALL $catName.system.vacuum_orphans(" +
      "table => 'db.orp', older_than_ms => 0)").collect().map(_.getString(0))
    assert(swept.nonEmpty)
    assert(spark.table(s"$catName.db.orp").count() == 20L)
  }

  test("CALL system.detail / system.history: the DESCRIBE analogs as SQL") {
    val dir = createMor("desc", appends = 2, rows = 40)
    spark.sql(s"DELETE FROM $catName.db.desc WHERE v % 40 = 0")
    val detail = spark.sql(
      s"CALL $catName.system.detail(table => 'db.desc')").collect()
    assert(detail.length == 1)
    val d = detail.head
    assert(d.getAs[Long]("version") == 3L)
    assert(d.getAs[Long]("n_rows") == (1L to 40L).count(i => (i * 10) % 40 != 0))
    assert(d.getAs[Long]("deleted_rows") == (1L to 40L).count(i => (i * 10) % 40 == 0))
    val hist = spark.sql(
      s"CALL $catName.system.history(table => 'db.desc')").collect()
    assert(hist.map(_.getAs[Long]("version")).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(hist.count(_.getAs[Int]("n_dvs") > 0) == 1)
  }

  test("unknown procedure and wrong namespace fail loudly; SHOW PROCEDURES lists") {
    createMor("meta", appends = 1, rows = 5)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e = intercept[Exception] {
      spark.sql(s"CALL $catName.system.frobnicate(table => 'db.meta')")
    }
    assert(messages(e).exists(_.contains("unknown procedure")), messages(e).mkString(" | "))
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $catName.db.optimize(table => 'db.meta')")
    }
    assert(messages(e2).exists(_.contains("system")), messages(e2).mkString(" | "))
    val listed = spark.sql(s"SHOW PROCEDURES IN $catName.system").collect()
    assert(listed.length >= GraftProcedures.list.length)
  }

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
}
