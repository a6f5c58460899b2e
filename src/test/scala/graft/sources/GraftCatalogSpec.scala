package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL-only table lifecycle through GraftCatalog: CREATE (with
 *  PARTITIONED BY → dir layout), INSERT (token-sorted write), SELECT
 *  (pruned graft scan + metadata-only aggregates), RENAME, DROP. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val catName: String = {
    val base = Files.createTempDirectory("graft_cat_").toString
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.base", base)
    "gcat"
  }

  test("CREATE + INSERT + SELECT + DROP, all in SQL") {
    spark.sql(s"""CREATE TABLE $catName.db.evts (id BIGINT, cat STRING, v BIGINT)
                 |USING graft PARTITIONED BY (cat) OPTIONS (pk 'id', partitions '2')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.evts " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10 " +
      "FROM range(1, 501) AS r(id)")
    // read back through the catalog: values, pruning, and layout all live
    assert(spark.sql(s"SELECT count(*) FROM $catName.db.evts").head().getLong(0) == 500L)
    assert(spark.sql(s"SELECT v FROM $catName.db.evts WHERE id = 7").head().getLong(0) == 70L)
    val evens = spark.sql(s"SELECT count(*) FROM $catName.db.evts WHERE cat = 'even'")
    assert(evens.head().getLong(0) == 250L)
    // PARTITIONED BY produced the dir layout; INSERT went through the tokenizer
    val dir = spark.conf.get(s"spark.sql.catalog.$catName.base") + "/db/evts"
    val files = TokenPruner.listFiles(spark, dir)
    assert(files.nonEmpty && files.forall(_.tokenRange.isDefined))
    assert(files.forall(f => TokenPruner.dirValues(f.path).contains("cat")))
    // metadata-only count plan through the catalog path
    val plan = spark.sql(s"SELECT count(*) FROM $catName.db.evts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftStatsScan"), s"expected metadata-only count:\n$plan")
    // lifecycle end: rename, then drop
    spark.sql(s"ALTER TABLE $catName.db.evts RENAME TO db.evts2")
    assert(spark.sql(s"SELECT count(*) FROM $catName.db.evts2").head().getLong(0) == 500L)
    spark.sql(s"DROP TABLE $catName.db.evts2")
    assert(spark.sql(s"SHOW TABLES IN $catName.db").count() == 0L)
  }

  test("readStream.table over a catalog table: appended inserts arrive as micro-batches") {
    spark.sql(s"""CREATE TABLE $catName.db.feed (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '2')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.feed SELECT id, id * 2 FROM range(1, 101) AS r(id)")
    val stream = spark.readStream.table(s"$catName.db.feed")
    assert(stream.isStreaming)
    val q = stream.groupBy().sum("v")
      .writeStream.format("memory").queryName("cat_feed")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cat_feed").head().getLong(0) == (1L to 100L).map(_ * 2).sum)
      spark.sql(s"INSERT INTO $catName.db.feed SELECT id, id * 2 FROM range(101, 201) AS r(id)")
      q.processAllAvailable()
      assert(spark.table("cat_feed").head().getLong(0) == (1L to 200L).map(_ * 2).sum)
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE $catName.db.feed")
    }
  }

  test("CREATE without pk fails fast; duplicate CREATE rejected") {
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $catName.db.nopk (id BIGINT) USING graft")
    }
    spark.sql(s"CREATE TABLE $catName.db.once (id BIGINT) USING graft OPTIONS (pk 'id')")
    try intercept[Exception] {
      spark.sql(s"CREATE TABLE $catName.db.once (id BIGINT) USING graft OPTIONS (pk 'id')")
    } finally spark.sql(s"DROP TABLE $catName.db.once")
  }

  test("SQL DELETE FROM: metadata pk deletes, group-based predicate deletes") {
    spark.sql(s"""CREATE TABLE $catName.db.del (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '4', snapshot 'true')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.del SELECT id, id * 2 FROM range(0, 100) AS r(id)")
    def cnt: Long =
      spark.sql(s"SELECT count(*) FROM $catName.db.del").head().getLong(0)
    assert(cnt == 100L)
    spark.sql(s"DELETE FROM $catName.db.del WHERE id = 7")
    assert(cnt == 99L)
    spark.sql(s"DELETE FROM $catName.db.del WHERE id IN (1, 2, 3, 7)") // 7 again: no-op
    assert(cnt == 96L)
    assert(spark.sql(s"SELECT id FROM $catName.db.del WHERE id <= 8 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(0L, 4L, 5L, 6L, 8L))
    // the pre-delete snapshot is still pinnable (copy-on-write, not erase)
    val dir = spark.conf.get(s"spark.sql.catalog.$catName.base") + "/db/del"
    val v1 = spark.read.format("graft").option("path", dir)
      .option("pk", "id").option("snapshotVersion", "1").load()
    assert(v1.count() == 100L)
    // non-pk and range predicates now route through the group-based
    // copy-on-write rewrite (RowLevelOpsSpec) instead of being refused
    spark.sql(s"DELETE FROM $catName.db.del WHERE v = 10") // id = 5
    assert(cnt == 95L)
    spark.sql(s"DELETE FROM $catName.db.del WHERE id < 50")
    assert(cnt == 50L)
    spark.sql(s"DROP TABLE $catName.db.del")

    // log-less table: same SQL, write-then-delete swap
    spark.sql(s"""CREATE TABLE $catName.db.del2 (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '2')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.del2 SELECT id, id FROM range(0, 50) AS r(id)")
    spark.sql(s"DELETE FROM $catName.db.del2 WHERE id IN (0, 49)")
    assert(spark.sql(s"SELECT count(*) FROM $catName.db.del2").head().getLong(0) == 48L)
    spark.sql(s"DROP TABLE $catName.db.del2")
  }

  test("SQL DELETE on a dir-partitioned table: replacements stay in their partition dirs") {
    spark.sql(s"""CREATE TABLE $catName.db.deld (id BIGINT, cat STRING, v BIGINT)
                 |USING graft PARTITIONED BY (cat)
                 |OPTIONS (pk 'id', partitions '2', snapshot 'true')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.deld " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id FROM range(0, 40) AS r(id)")
    spark.sql(s"DELETE FROM $catName.db.deld WHERE id IN (4, 5, 6)")
    assert(spark.sql(s"SELECT count(*) FROM $catName.db.deld").head().getLong(0) == 37L)
    assert(spark.sql(
      s"SELECT count(*) FROM $catName.db.deld WHERE cat = 'even'").head().getLong(0) == 18L)
    // every live file still sits under a graft_p_cat partition dir
    val dir = spark.conf.get(s"spark.sql.catalog.$catName.base") + "/db/deld"
    val files = TokenPruner.listFiles(spark, dir)
    assert(files.nonEmpty &&
      files.forall(f => TokenPruner.dirValues(f.path).contains("cat")))
    spark.sql(s"DROP TABLE $catName.db.deld")
  }

  test("SQL TRUNCATE TABLE: snapshotted tables keep pinnable history, log-less erase") {
    spark.sql(s"""CREATE TABLE $catName.db.tr (id BIGINT) USING graft
                 |OPTIONS (pk 'id', partitions '2', snapshot 'true')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.tr SELECT id FROM range(0, 30) AS r(id)")
    spark.sql(s"TRUNCATE TABLE $catName.db.tr")
    assert(spark.sql(s"SELECT count(*) FROM $catName.db.tr").head().getLong(0) == 0L)
    // INSERT after truncate works, and the pre-truncate version is pinnable
    spark.sql(s"INSERT INTO $catName.db.tr SELECT id FROM range(100, 105) AS r(id)")
    assert(spark.sql(s"SELECT count(*) FROM $catName.db.tr").head().getLong(0) == 5L)
    val dir = spark.conf.get(s"spark.sql.catalog.$catName.base") + "/db/tr"
    assert(spark.read.format("graft").option("path", dir).option("pk", "id")
      .option("snapshotVersion", "1").load().count() == 30L)
    spark.sql(s"DROP TABLE $catName.db.tr")

    spark.sql(s"CREATE TABLE $catName.db.tr2 (id BIGINT) USING graft OPTIONS (pk 'id')")
    spark.sql(s"INSERT INTO $catName.db.tr2 SELECT id FROM range(0, 10) AS r(id)")
    spark.sql(s"TRUNCATE TABLE $catName.db.tr2")
    assert(spark.sql(s"SELECT count(*) FROM $catName.db.tr2").head().getLong(0) == 0L)
    spark.sql(s"DROP TABLE $catName.db.tr2")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF through the catalog") {
    spark.sql(s"""CREATE TABLE $catName.db.tt (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.tt SELECT id, id FROM range(0, 10) AS r(id)")
    spark.sql(s"INSERT INTO $catName.db.tt SELECT id, id FROM range(10, 25) AS r(id)")
    val dir = spark.conf.get(s"spark.sql.catalog.$catName.base") + "/db/tt"
    assert(graft.write.Snapshots.latestVersion(spark, dir).contains(2L))

    def cnt(sql: String): Long = spark.sql(sql).head().getLong(0)
    assert(cnt(s"SELECT count(*) FROM $catName.db.tt VERSION AS OF 1") == 10L)
    assert(cnt(s"SELECT count(*) FROM $catName.db.tt VERSION AS OF 2") == 25L)
    assert(cnt(s"SELECT count(*) FROM $catName.db.tt") == 25L)
    // TIMESTAMP AS OF: pin at v1's commit instant (session tz is UTC)
    val t1 = graft.write.Snapshots.commitTimeMillis(spark, dir, 1L)
    val iso = java.time.Instant.ofEpochMilli(t1).toString.replace("T", " ").stripSuffix("Z")
    assert(cnt(
      s"SELECT count(*) FROM $catName.db.tt TIMESTAMP AS OF '$iso'") == 10L)
    // a pre-table timestamp fails loudly, never silently returns latest
    intercept[Exception] {
      cnt(s"SELECT count(*) FROM $catName.db.tt TIMESTAMP AS OF '1999-01-01 00:00:00'")
    }
    spark.sql(s"DROP TABLE $catName.db.tt")
  }
}
