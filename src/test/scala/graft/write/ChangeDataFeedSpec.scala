package graft.write

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.GraftCatalog
import org.apache.spark.sql.functions._

/** Row-level change-data feed over merge-on-read DML: the append-capture
 *  feed refuses UPDATE/MERGE delta commits (re-inserts must not masquerade
 *  as appends), while [[Snapshots.readChangesWithDeletes]] delivers both
 *  sides — delete preimages from deletion-vector deltas, insert postimages
 *  from added files — tagged with `_change_type` / `_commit_version`. */
class ChangeDataFeedSpec extends SparkSpec {

  private lazy val catName: String = {
    val base = Files.createTempDirectory("graft_cdf_").toString
    spark.conf.set("spark.sql.catalog.cdfc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdfc.base", base)
    "cdfc"
  }
  private def baseDir: String = spark.conf.get(s"spark.sql.catalog.$catName.base")

  /** MoR table with 200 rows: (id, cat, v = id * 10). */
  private def createMor(name: String, rows: Int = 200): String = {
    spark.sql(s"""CREATE TABLE $catName.db.$name (id BIGINT, cat STRING, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '4', snapshot 'true',
                 |dmlMode 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.$name " +
      s"SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10 " +
      s"FROM range(1, ${rows + 1}) AS r(id)")
    s"$baseDir/db/$name"
  }

  private def feed(dir: String, from: Long, to: Long): Array[(Long, Long, String, Long)] =
    Snapshots.readChangesWithDeletes(spark, dir, from, to)
      .select(col("id"), col("v"), col(Snapshots.ChangeTypeCol),
        col(Snapshots.CommitVersionCol))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("MoR UPDATE: append-capture feed refuses; CDF delivers the " +
      "delete preimage + insert postimage pair at the DML version") {
    val dir = createMor("upd")
    val v1 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"UPDATE $catName.db.upd SET v = v + 1000000 WHERE id % 10 = 3")
    val v2 = Snapshots.latestVersion(spark, dir).get
    assert(v2 == v1 + 1)
    assert(Snapshots.deletionVectors(spark, dir, v2).nonEmpty, "UPDATE must be MoR")

    // append capture refuses — delivering re-inserts as appends would be
    // a duplicate-producing feed
    val e = intercept[IllegalStateException] {
      Snapshots.readChanges(spark, dir, v1, v2).count()
    }
    assert(e.getMessage.contains("merge-on-read UPDATE/MERGE"))
    assert(e.getMessage.contains("readChangesWithDeletes"))
    // and the shared stream walk refuses identically
    val e2 = intercept[IllegalStateException] {
      Snapshots.changedFiles(spark, dir, v1, v2)
    }
    assert(e2.getMessage.contains("readChangesWithDeletes"))

    val rows = feed(dir, v1, v2)
    val touched = (1L to 200L).filter(_ % 10 == 3)
    val dels = rows.filter(_._3 == "delete")
    val ins = rows.filter(_._3 == "insert")
    assert(dels.map(_._1).sorted.toSeq == touched, "one delete per updated row")
    assert(ins.map(_._1).sorted.toSeq == touched, "one insert per updated row")
    // preimage vs postimage content
    dels.foreach { case (id, v, _, cv) => assert(v == id * 10 && cv == v2) }
    ins.foreach { case (id, v, _, cv) => assert(v == id * 10 + 1000000 && cv == v2) }
  }

  test("full-history CDF: initial appends tagged insert at their own version") {
    val dir = createMor("hist")
    val v1 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"UPDATE $catName.db.hist SET v = 0 WHERE id = 7")
    val v2 = Snapshots.latestVersion(spark, dir).get
    val rows = feed(dir, 0L, v2)
    assert(rows.count(r => r._3 == "insert" && r._4 == v1) == 200)
    assert(rows.count(r => r._4 == v2) == 2) // delete + insert pair for id 7
    assert(rows.length == 202)
  }

  test("MoR DELETE (DV-only commit): append feed is an empty increment, " +
      "CDF delivers the deleted rows as-of deletion time") {
    val dir = createMor("del")
    val v1 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"UPDATE $catName.db.del SET v = v + 5 WHERE id = 44")
    val v2 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"DELETE FROM $catName.db.del WHERE id % 10 = 4")
    val v3 = Snapshots.latestVersion(spark, dir).get

    // DV-only commit: nothing delivered, no failure (documented contract)
    assert(Snapshots.readChanges(spark, dir, v2, v3).count() == 0L)

    val rows = feed(dir, v2, v3)
    assert(rows.forall(r => r._3 == "delete" && r._4 == v3))
    assert(rows.map(_._1).sorted.toSeq == (1L to 200L).filter(_ % 10 == 4))
    // id 44 was updated at v2 — its delete preimage is the POST-update
    // content (the row version that actually died at v3)
    val r44 = rows.filter(_._1 == 44L)
    assert(r44.length == 1 && r44.head._2 == 445L)
    // the v2-updated-then-v3-deleted row shows all three events over the
    // full range (events within one commit are unordered — the version
    // column is the order)
    val all = feed(dir, v1, v3).filter(_._1 == 44L)
    assert(all.map(r => (r._3, r._4)).sortBy(r => (r._2, r._1)).toSeq ==
      Seq(("delete", v2), ("insert", v2), ("delete", v3)))
  }

  test("layout-only OPTIMIZE (incl. DV fold) yields no CDF events; " +
      "a logical rewrite refuses loudly") {
    val dir = createMor("opt")
    spark.sql(s"DELETE FROM $catName.db.opt WHERE id % 9 = 2")
    val vDel = Snapshots.latestVersion(spark, dir).get
    val schema = graft.model.CqlSchema("opt", Seq("id"))
    TokenSortedWriter.optimizeSmallFiles(spark, schema, dir,
      smallBytes = 64L << 20, targetBytes = 64L << 20)
    val vOpt = Snapshots.latestVersion(spark, dir).get
    assert(vOpt > vDel, "OPTIMIZE must have committed")
    assert(feed(dir, vDel, vOpt).isEmpty, "layout-only commit emits no changes")
    // CDF across delete + fold still attributes the deletes to the DML
    assert(feed(dir, vDel - 1, vOpt).forall(r => r._3 == "delete" && r._4 == vDel))

    // logical rewrite: drop one file from the set → provenance broken
    val files = Snapshots.files(spark, dir, vOpt)
    if (files.length > 1) {
      Snapshots.commitRewrite(spark, dir, files.tail, Some(vOpt))
      val vRw = Snapshots.latestVersion(spark, dir).get
      val e = intercept[IllegalStateException] { feed(dir, vOpt, vRw) }
      assert(e.getMessage.contains("logical rewrite"))
    }
  }

  test("vacuumed intermediate versions refuse with the retention knobs named") {
    val dir = createMor("vac")
    spark.sql(s"INSERT INTO $catName.db.vac VALUES (9001, 'even', 0)")
    spark.sql(s"INSERT INTO $catName.db.vac VALUES (9002, 'even', 0)")
    val head = Snapshots.latestVersion(spark, dir).get
    Snapshots.vacuum(spark, dir, keepLast = 1)
    val e = intercept[IllegalStateException] { feed(dir, 0L, head) }
    assert(e.getMessage.contains("vacuumed"))
    assert(e.getMessage.contains("keepLast"))
  }

  test("schema evolution mid-range: pre-evolution events read null for " +
      "the new column, post-evolution events carry values") {
    val dir = createMor("evo", rows = 20)
    spark.sql(s"ALTER TABLE $catName.db.evo ADD COLUMNS (tag STRING)")
    spark.sql(s"INSERT INTO $catName.db.evo VALUES (900, 'even', 0, 't9')")
    spark.sql(s"UPDATE $catName.db.evo SET v = 1, tag = 'u' WHERE id = 900")
    val head = Snapshots.latestVersion(spark, dir).get
    val rows = Snapshots.readChangesWithDeletes(spark, dir, 0L, head)
      .select(col("id"), col("tag"), col(Snapshots.ChangeTypeCol),
        col(Snapshots.CommitVersionCol))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2), r.getLong(3)))
    // the 20 pre-evolution inserts: null tag
    assert(rows.count(r => r._1 <= 20L && r._2.isEmpty && r._3 == "insert") == 20)
    // post-evolution: insert t9, then the update pair (preimage t9 → postimage u)
    val e900 = rows.filter(_._1 == 900L).sortBy(r => (r._4, r._3))
    assert(e900.map(r => (r._2, r._3)).toSeq ==
      Seq((Some("t9"), "insert"), (Some("t9"), "delete"), (Some("u"), "insert")),
      s"got ${e900.toSeq}")
    // the DSv2 source agrees (its data schema is the evolved table schema)
    val viaSource = spark.read.format("graft").option("path", dir)
      .option("changeFeedMode", "rows").load()
      .select(col("id"), col("tag"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2), r.getLong(3)))
    assert(viaSource.sorted.toSeq == rows.sorted.toSeq)
  }

  test("empty range and no-event range return the tagged empty frame " +
      "with the table schema") {
    val dir = createMor("empt")
    val v1 = Snapshots.latestVersion(spark, dir).get
    val df = Snapshots.readChangesWithDeletes(spark, dir, v1, v1)
    assert(df.count() == 0)
    assert(df.columns.toSeq ==
      Seq("id", "cat", "v", Snapshots.ChangeTypeCol, Snapshots.CommitVersionCol))
  }
}
