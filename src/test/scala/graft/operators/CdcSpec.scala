package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.write.Snapshots
import org.apache.spark.sql.functions._

/** CDC consumption: [[Cdc.pairUpdates]] (same-version delete+insert →
 *  update pair, identity = row id or key) and [[Cdc.applyChanges]]
 *  (collapse-to-latest + MERGE replication into a graft table). */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val T = Snapshots.ChangeTypeCol
  private val V = Snapshots.CommitVersionCol
  private val R = graft.sources.GraftDataSource.RowIdCol

  private def feedDf(rows: (Long, String, String, Long)*) =
    rows.toDF("id", "v", T, V)

  test("pairUpdates retags same-version delete+insert sharing the identity; " +
      "different versions and unpaired events pass through") {
    val feed = feedDf(
      (1L, "a", "insert", 1L),            // plain insert
      (2L, "b", "delete", 2L),            // paired → update_preimage
      (2L, "b2", "insert", 2L),           // paired → update_postimage
      (3L, "c", "delete", 2L),            // delete, no insert partner
      (4L, "d", "insert", 1L),            // same id across versions: no pair
      (4L, "d", "delete", 2L))
    val out = Cdc.pairUpdates(feed, Seq("id"))
      .select("id", "v", T).as[(Long, String, String)].collect().toSet
    assert(out == Set(
      (1L, "a", "insert"),
      (2L, "b", "update_preimage"),
      (2L, "b2", "update_postimage"),
      (3L, "c", "delete"),
      (4L, "d", "insert"),
      (4L, "d", "delete")))
  }

  test("pairUpdates: a null identity never pairs") {
    val feed = Seq[(java.lang.Long, String, String, Long)](
      (null, "x", "delete", 1L), (null, "y", "insert", 1L))
      .toDF("id", "v", T, V)
    val out = Cdc.pairUpdates(feed, Seq("id"))
      .select(T).as[String].collect().sorted
    assert(out.toSeq == Seq("delete", "insert"))
  }

  private def newCatalog(): (String, String) = {
    val cat = "gcdc" + java.util.UUID.randomUUID().toString.take(8)
    val base = Files.createTempDirectory("graft_cdcspec_").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    (cat, base)
  }

  test("applyChanges: insert, update, delete branches in one call; " +
      "an update's same-version pair collapses to its postimage") {
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 'old1'), (2, 'old2'), (3, 'old3')")
    val feed = feedDf(
      (1L, "pre1", "update_preimage", 5L), // pair: postimage must win the tie
      (1L, "new1", "update_postimage", 5L),
      (2L, "gone", "delete", 5L),
      (4L, "new4", "insert", 5L),
      (5L, "born", "insert", 4L),          // insert then delete: delete wins
      (5L, "born", "delete", 5L))
    Cdc.applyChanges(spark, s"$cat.db.t", feed, Seq("id"))
    val out = spark.table(s"$cat.db.t").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "new1"), (3L, "old3"), (4L, "new4")))
  }

  test("applyChanges across two monotone ranges replays a source table's " +
      "full DML history into an identical replica") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.src (id BIGINT, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true', dmlMode 'merge-on-read')")
    spark.sql(s"CREATE TABLE $cat.db.tgt (id BIGINT, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $cat.db.src SELECT id, CONCAT('v', id) " +
      "FROM RANGE(20) AS r(id)")
    spark.sql(s"UPDATE $cat.db.src SET v = CONCAT(v, '+') WHERE id % 3 = 0")
    spark.sql(s"DELETE FROM $cat.db.src WHERE id % 5 = 1")
    val dir = s"$base/db/src"
    val head = Snapshots.latestVersion(spark, dir).get
    Cdc.applyChanges(spark, s"$cat.db.tgt",
      Snapshots.readChangesWithDeletes(spark, dir, 0L, 1L), Seq("id"))
    Cdc.applyChanges(spark, s"$cat.db.tgt",
      Snapshots.readChangesWithDeletes(spark, dir, 1L, head), Seq("id"))
    val src = spark.table(s"$cat.db.src").as[(Long, String)].collect().toSet
    val tgt = spark.table(s"$cat.db.tgt").as[(Long, String)].collect().toSet
    assert(tgt == src)
    assert(src.contains((0L, "v0+")) && !src.exists(_._1 == 1L))
  }

  test("applyChanges refuses a feed missing target or key columns") {
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.t2 (id BIGINT, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    val bad = Seq((1L, "insert", 1L)).toDF("id", T, V) // no v column
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChanges(spark, s"$cat.db.t2", bad, Seq("id"))
    }
    assert(e.getMessage.contains("lacks target column"))
  }

  test("readChangesWithDeletes(withRowIds): a MoR UPDATE's delete+insert " +
      "share the row id, so rid-pairing yields exact update semantics") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.rt (id BIGINT, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true', " +
      "dmlMode 'merge-on-read', rowTracking 'true')")
    spark.sql(s"INSERT INTO $cat.db.rt SELECT id, CONCAT('v', id) " +
      "FROM RANGE(12) AS r(id)")
    val dir = s"$base/db/rt"
    val rid0 = spark.sql(s"SELECT id, $R FROM $cat.db.rt")
      .as[(Long, Long)].collect().toMap
    spark.sql(s"UPDATE $cat.db.rt SET v = 'upd' WHERE id % 4 = 2")
    val head = Snapshots.latestVersion(spark, dir).get
    val feed = Snapshots.readChangesWithDeletes(spark, dir, 1L, head,
      withRowIds = true)
    val typed = Cdc.pairUpdates(feed, Seq(R))
    val events = typed.select(col("id"), col(R), col(T))
      .as[(Long, Long, String)].collect()
    val updated = (0L until 12L).filter(_ % 4 == 2).toSet
    assert(events.count(_._3 == "update_preimage") == updated.size)
    assert(events.count(_._3 == "update_postimage") == updated.size)
    assert(events.length == 2 * updated.size, s"unexpected events: ${events.toSeq}")
    // both sides carry the row's ORIGINAL id — lineage across the update
    events.foreach { case (id, rid, _) => assert(rid == rid0(id)) }
  }

  test("readChangesWithDeletes(withRowIds) reads MATERIALIZED ids (stored " +
      "column beats base+pos) for preimages on packed files") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.pk (id BIGINT, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true', " +
      "dmlMode 'merge-on-read', rowTracking 'true')")
    spark.sql(s"INSERT INTO $cat.db.pk SELECT id, 'a' FROM RANGE(6) AS r(id)")
    spark.sql(s"INSERT INTO $cat.db.pk SELECT id + 100, 'b' FROM RANGE(6) AS r(id)")
    spark.sql(s"CALL $cat.system.optimize(table => 'db.pk')")
    val dir = s"$base/db/pk"
    val rid0 = spark.sql(s"SELECT id, $R FROM $cat.db.pk")
      .as[(Long, Long)].collect().toMap
    val vOpt = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"DELETE FROM $cat.db.pk WHERE v = 'b' AND id % 2 = 0")
    val head = Snapshots.latestVersion(spark, dir).get
    val feed = Snapshots.readChangesWithDeletes(spark, dir, vOpt, head,
      withRowIds = true)
    val dels = feed.filter(col(T) === "delete")
      .select(col("id"), col(R)).as[(Long, Long)].collect().toMap
    assert(dels.keySet == (0L until 6L).map(_ + 100).filter(_ % 2 == 0).toSet)
    dels.foreach { case (id, rid) => assert(rid == rid0(id)) }
  }

  test("applyChangesStream replicates continuously: the initial load, then " +
      "live UPDATE/DELETE increments, converge the replica to the source") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.ssrc (id BIGINT, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true', dmlMode 'merge-on-read')")
    spark.sql(s"CREATE TABLE $cat.db.stgt (id BIGINT, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $cat.db.ssrc SELECT id, CONCAT('v', id) " +
      "FROM RANGE(20) AS r(id)")
    val ckpt = Files.createTempDirectory("graft_cdcstream_ckpt_").toString
    val q = Cdc.applyChangesStream(spark, s"$base/db/ssrc", s"$cat.db.stgt",
      Seq("id"), ckpt)
    try {
      q.processAllAvailable()
      assert(spark.table(s"$cat.db.stgt").count() == 20L)
      spark.sql(s"UPDATE $cat.db.ssrc SET v = CONCAT(v, '+') WHERE id % 3 = 0")
      spark.sql(s"DELETE FROM $cat.db.ssrc WHERE id % 5 = 1")
      q.processAllAvailable()
      val src = spark.table(s"$cat.db.ssrc").as[(Long, String)].collect().toSet
      val tgt = spark.table(s"$cat.db.stgt").as[(Long, String)].collect().toSet
      assert(tgt == src && src.contains((0L, "v0+")) && !src.exists(_._1 == 1L))
    } finally q.stop()
    // restart from the SAME checkpoint: nothing new → replica unchanged
    val tgt0 = spark.table(s"$cat.db.stgt").as[(Long, String)].collect().toSet
    val q2 = Cdc.applyChangesStream(spark, s"$base/db/ssrc", s"$cat.db.stgt",
      Seq("id"), ckpt)
    try {
      q2.processAllAvailable()
      assert(spark.table(s"$cat.db.stgt")
        .as[(Long, String)].collect().toSet == tgt0)
    } finally q2.stop()
  }

  test("applyChanges replay is idempotent: re-applying an already-applied " +
      "range leaves the replica unchanged (the at-least-once safety net)") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.rsrc (id BIGINT, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true', dmlMode 'merge-on-read')")
    spark.sql(s"CREATE TABLE $cat.db.rtgt (id BIGINT, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $cat.db.rsrc SELECT id, CONCAT('v', id) " +
      "FROM RANGE(10) AS r(id)")
    spark.sql(s"UPDATE $cat.db.rsrc SET v = 'u' WHERE id % 2 = 0")
    spark.sql(s"DELETE FROM $cat.db.rsrc WHERE v = 'v3'") // non-key → MoR DV
    val dir = s"$base/db/rsrc"
    val head = Snapshots.latestVersion(spark, dir).get
    val feed = Snapshots.readChangesWithDeletes(spark, dir, 0L, head)
    Cdc.applyChanges(spark, s"$cat.db.rtgt", feed, Seq("id"))
    val once = spark.table(s"$cat.db.rtgt").as[(Long, String)].collect().toSet
    Cdc.applyChanges(spark, s"$cat.db.rtgt", feed, Seq("id")) // replay
    val twice = spark.table(s"$cat.db.rtgt").as[(Long, String)].collect().toSet
    assert(once == twice)
    assert(once == spark.table(s"$cat.db.rsrc").as[(Long, String)].collect().toSet)
  }

  test("readChangesWithDeletes(withRowIds) refuses an untracked table") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.ut (id BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    spark.sql(s"INSERT INTO $cat.db.ut VALUES (1)")
    val e = intercept[IllegalArgumentException] {
      Snapshots.readChangesWithDeletes(spark, s"$base/db/ut", 0L, 1L,
        withRowIds = true)
    }
    assert(e.getMessage.contains("row-tracked"))
  }
}
