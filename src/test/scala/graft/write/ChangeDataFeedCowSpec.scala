package graft.write

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.GraftCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Copy-on-write CDC (`changeFeedCow 'true'`): row-level DML derives and
 *  records its events as `_graft_cdc` sidecars in the same atomic
 *  commit, and the change feed rides across the rewrite delivering
 *  exactly those events — where a CDC-less CoW table must refuse. */
class ChangeDataFeedCowSpec extends SparkSpec {

  private lazy val catName: String = {
    val base = Files.createTempDirectory("graft_cdfw_").toString
    spark.conf.set("spark.sql.catalog.cdfw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdfw.base", base)
    "cdfw"
  }
  private def baseDir: String = spark.conf.get(s"spark.sql.catalog.$catName.base")

  private def createCow(name: String, rows: Int = 100): String = {
    spark.sql(s"""CREATE TABLE $catName.db.$name (id BIGINT, cat STRING, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '3', snapshot 'true',
                 |changeFeedCow 'true')""".stripMargin)
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

  test("CoW UPDATE records its delete+insert pairs; the feed rides across " +
      "the rewrite; append capture still refuses (naming the option)") {
    val dir = createCow("upd")
    val v1 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"UPDATE $catName.db.upd SET v = v + 500000 WHERE id % 10 = 4")
    val v2 = Snapshots.latestVersion(spark, dir).get
    assert(Snapshots.changeDataFiles(spark, dir, v2).nonEmpty, "cdc sidecar recorded")
    val rows = feed(dir, v1, v2)
    val touched = (1L to 100L).filter(_ % 10 == 4)
    assert(rows.filter(_._3 == "delete").map(_._1).sorted.toSeq == touched)
    assert(rows.filter(_._3 == "insert").map(_._1).sorted.toSeq == touched)
    rows.foreach { case (id, v, t, cv) =>
      assert(cv == v2)
      assert(v == (if (t == "delete") id * 10 else id * 10 + 500000))
    }
    // the DSv2 CDC source delivers the identical event set
    val viaSource = spark.read.format("graft").option("path", dir)
      .option("changeFeedMode", "rows").option("startingVersion", v1.toString).load()
      .select(col("id"), col("v"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(viaSource.sorted.toSeq == rows.sorted.toSeq)
    // file-level append capture cannot deliver deletes — still refuses
    val e = intercept[IllegalStateException] {
      Snapshots.readChanges(spark, dir, v1, v2).count()
    }
    assert(e.getMessage.contains("changeFeedCow"))
  }

  test("CoW DELETE and MERGE: the full event matrix, carried rows silent") {
    val dir = createCow("mrg", rows = 60)
    val v1 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"DELETE FROM $catName.db.mrg WHERE v % 70 = 0") // ids 7,14,...
    val v2 = Snapshots.latestVersion(spark, dir).get
    val dels = feed(dir, v1, v2)
    assert(dels.forall(r => r._3 == "delete" && r._4 == v2))
    assert(dels.map(_._1).sorted.toSeq == (1L to 60L).filter(_ % 7 == 0))

    spark.range(58, 66).selectExpr("id", "'merged' AS cat", "id AS nv")
      .createOrReplaceTempView("mrg_src")
    spark.sql(
      s"""MERGE INTO $catName.db.mrg t USING mrg_src s ON t.id = s.id
         |WHEN MATCHED AND s.id % 2 = 0 THEN UPDATE SET v = s.nv
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (id, cat, v) VALUES (s.id, s.cat, s.nv)""".stripMargin)
    val v3 = Snapshots.latestVersion(spark, dir).get
    val ev = feed(dir, v2, v3).toSeq
    // matched evens 58,60 updated (59 was… 58,59,60 exist; 61..65 inserted;
    // 56 deleted earlier? ids ≤ 60 exist minus multiples of 7)
    val existing = (1L to 60L).filterNot(_ % 7 == 0).toSet
    val matchedEven = (58L to 60L).filter(i => existing(i) && i % 2 == 0)
    val matchedOdd = (58L to 60L).filter(i => existing(i) && i % 2 == 1)
    val inserted = (61L to 65L)
    assert(ev.filter(r => r._3 == "insert" && r._1 > 60L).map(_._1).sorted == inserted,
      s"inserted: $ev")
    matchedEven.foreach { i =>
      assert(ev.contains((i, i * 10, "delete", v3)) && ev.contains((i, i, "insert", v3)),
        s"update pair for $i in $ev")
    }
    matchedOdd.foreach { i =>
      assert(ev.contains((i, i * 10, "delete", v3)) &&
        !ev.exists(r => r._1 == i && r._3 == "insert"), s"pure delete for $i")
    }
    // carried rows emit nothing
    assert(ev.forall(r => r._1 >= 58L))
  }

  test("a FULL-PK DELETE routes through the row-level path: the feed " +
      "records its deletes instead of breaking at the version") {
    val dir = createCow("pkdel", rows = 50)
    val v1 = Snapshots.latestVersion(spark, dir).get
    // a pk-covering predicate is exactly what the SupportsDelete
    // metadata fast path would accept — on a CDC table it must NOT,
    // because that path commits no sidecar and the feed would refuse
    // every later read as "crosses a logical rewrite"
    spark.sql(s"DELETE FROM $catName.db.pkdel WHERE id IN (3, 7, 11)")
    val v2 = Snapshots.latestVersion(spark, dir).get
    assert(Snapshots.changeDataFiles(spark, dir, v2).nonEmpty,
      "pk DELETE must record a cdc sidecar")
    val rows = feed(dir, v1, v2)
    assert(rows.map(r => (r._1, r._3)).sorted.toSeq ==
      Seq((3L, "delete"), (7L, "delete"), (11L, "delete")))
    assert(spark.read.format("graft").option("path", dir).load().count() == 47)
  }

  test("no-op UPDATE records an empty sidecar: zero events, no refusal") {
    val dir = createCow("noop", rows = 30)
    val v1 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"UPDATE $catName.db.noop SET v = v WHERE id % 3 = 0")
    val v2 = Snapshots.latestVersion(spark, dir).get
    assert(v2 == v1 + 1)
    assert(Snapshots.changeDataFiles(spark, dir, v2).nonEmpty,
      "even a no-op DML must reference a sidecar so the feed can ride across")
    assert(feed(dir, v1, v2).isEmpty)
    // and the range keeps flowing across it
    spark.sql(s"INSERT INTO $catName.db.noop VALUES (9001, 'even', 1)")
    val v3 = Snapshots.latestVersion(spark, dir).get
    assert(feed(dir, v1, v3).map(_._1).toSeq == Seq(9001L))
  }

  test("vacuum reclaims dropped versions' sidecars; a lagging feed refuses " +
      "with the retention knobs") {
    val dir = createCow("vac", rows = 20)
    spark.sql(s"UPDATE $catName.db.vac SET v = 0 WHERE id % 4 = 1")
    val vCdc = Snapshots.latestVersion(spark, dir).get
    val cdcFiles = Snapshots.changeDataFiles(spark, dir, vCdc)
    assert(cdcFiles.nonEmpty)
    spark.sql(s"INSERT INTO $catName.db.vac VALUES (901, 'odd', 1)")
    spark.sql(s"INSERT INTO $catName.db.vac VALUES (902, 'even', 2)")
    Snapshots.vacuum(spark, dir, keepLast = 1)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    cdcFiles.foreach(p => assert(
      !fs.exists(new org.apache.hadoop.fs.Path(p)), s"vacuum kept sidecar $p"))
    val e = intercept[IllegalStateException] {
      feed(dir, 0L, Snapshots.latestVersion(spark, dir).get)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("the CDC STREAM rides across a CoW DML rewrite, delivering the " +
      "recorded events at their version") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = createCow("stream", rows = 40)
    val q = spark.readStream.format("graft")
      .option("path", dir).option("changeFeedMode", "rows").load()
      .writeStream.format("memory").queryName("cow_cdc_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cow_cdc_out").count() == 40L)
      spark.sql(s"UPDATE $catName.db.stream SET v = v + 3 WHERE id % 8 = 2")
      q.processAllAvailable()
      val ev = spark.table("cow_cdc_out")
        .filter(col("_commit_version") === 2L)
        .select(col("id"), col("v"), col("_change_type"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val touched = (1L to 40L).filter(_ % 8 == 2)
      assert(ev == touched.flatMap(i =>
        Seq((i, i * 10, "delete"), (i, i * 10 + 3, "insert"))).toSet)
    } finally q.stop()
  }

  test("preimages apply the source version's deletion vectors: a row a " +
      "prior MoR-style delta hid must not resurrect into the CDC events") {
    val dir = createCow("mixdv", rows = 50)
    val v1 = Snapshots.latestVersion(spark, dir).get
    // hide one physical row via a directly-committed DV (the MoR primitive)
    val coord = spark.read.format("graft").option("path", dir).option("pk", "id")
      .load().select(col("id"), col("_graft_file"), col("_graft_pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .minBy(_._1)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(coord._3))
    Snapshots.commitDeltas(spark, dir, Map(coord._2 -> dv), Nil, Some(v1))
    val hiddenId = coord._1
    // a CoW UPDATE touching every group: the hidden row must appear in NO
    // event (it was already logically deleted before this DML)
    spark.sql(s"UPDATE $catName.db.mixdv SET v = v + 1 WHERE id % 2 = ${hiddenId % 2}")
    val head = Snapshots.latestVersion(spark, dir).get
    val ev = feed(dir, head - 1, head)
    assert(!ev.exists(_._1 == hiddenId),
      s"DV-hidden row $hiddenId resurrected into CDC events: " +
        ev.filter(_._1 == hiddenId).mkString(","))
    assert(ev.nonEmpty)
  }

  test("row-TRACKED CoW DML threads stable row ids into the sidecar: rid " +
      "pairing yields update semantics, ids survive the rewrite, and a " +
      "genuinely new MERGE insert carries a null (commit-allocated) id") {
    import graft.operators.Cdc
    val R = graft.sources.GraftDataSource.RowIdCol
    spark.sql(s"""CREATE TABLE $catName.db.rid (id BIGINT, cat STRING, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '3', snapshot 'true',
                 |changeFeedCow 'true', rowTracking 'true')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.rid SELECT id, 'c', id * 10 " +
      "FROM range(1, 21) AS r(id)")
    val dir = s"$baseDir/db/rid"
    val rid0 = spark.sql(s"SELECT id, $R FROM $catName.db.rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val v1 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"UPDATE $catName.db.rid SET v = v + 7 WHERE id % 5 = 2")
    val v2 = Snapshots.latestVersion(spark, dir).get
    val typed = Cdc.pairUpdates(
      Snapshots.readChangesWithDeletes(spark, dir, v1, v2, withRowIds = true),
      Seq(R))
    val ev = typed.select(col("id"), col(R), col(Snapshots.ChangeTypeCol))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val touched = (1L to 20L).filter(_ % 5 == 2).toSet
    assert(ev.count(_._3 == "update_preimage") == touched.size)
    assert(ev.count(_._3 == "update_postimage") == touched.size)
    assert(ev.length == 2 * touched.size, s"unexpected events: ${ev.toSeq}")
    // both sides carry the row's ORIGINAL id — lineage across the CoW rewrite
    ev.foreach { case (id, rid, _) => assert(rid == rid0(id), s"id=$id") }

    // delete + brand-new insert in one MERGE: rid identity must NOT pair
    // them even when values collide — old rid real, new rid null
    spark.range(30, 33).selectExpr("id", "'c' AS cat", "id * 10 AS nv")
      .createOrReplaceTempView("rid_src")
    spark.sql(
      s"""MERGE INTO $catName.db.rid t USING rid_src s ON t.id = s.id - 27
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (id, cat, v) VALUES (s.id, s.cat, s.nv)""".stripMargin)
    val v3 = Snapshots.latestVersion(spark, dir).get
    val feed2 = Snapshots.readChangesWithDeletes(spark, dir, v2, v3, withRowIds = true)
    val ev2 = Cdc.pairUpdates(feed2, Seq(R))
      .select(col("id"), col(R), col(Snapshots.ChangeTypeCol))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2)))
    assert(ev2.forall(e => e._3 == "delete" || e._3 == "insert"),
      s"rid pairing fabricated an update from delete+new-insert: ${ev2.toSeq}")
    val dels2 = ev2.filter(_._3 == "delete")
    assert(dels2.map(_._1).sorted.toSeq == Seq(3L, 4L, 5L))
    dels2.foreach { case (id, rid, _) => assert(rid.contains(rid0(id))) }
    // sidecar inserts: id allocated only at commit → null in the event
    assert(ev2.filter(_._3 == "insert").forall(_._2.isEmpty))
    // but the TABLE's committed rows did get fresh unique ids
    val after = spark.sql(s"SELECT id, $R FROM $catName.db.rid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(after.map(_._2).distinct.length == after.length)
    assert(after.filter(r => r._1 >= 30L).forall(r => !rid0.values.toSet(r._2)))
  }

  test("duplicate primary keys among the affected rows refuse (guard rides " +
      "inside the single derivation action)") {
    spark.sql(s"""CREATE TABLE $catName.db.dup (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '1', snapshot 'true',
                 |changeFeedCow 'true')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.dup SELECT id, id FROM range(1, 6) AS r(id)")
    spark.sql(s"INSERT INTO $catName.db.dup VALUES (3, 999)") // duplicate pk
    val e = intercept[Throwable] {
      spark.sql(s"UPDATE $catName.db.dup SET v = 0 WHERE id >= 1")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not unique per primary key")),
      s"unexpected failure: ${msgs(e).mkString(" | ")}")
    // the aborted derivation must not leave a partial sidecar stage
    // behind (vacuum only reclaims log-referenced files)
    val cdcDir = new org.apache.hadoop.fs.Path(s"$baseDir/db/dup", Snapshots.CdcDir)
    val fs = cdcDir.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(cdcDir) || fs.listStatus(cdcDir).isEmpty,
      "failed DML left a cdc stage dir behind")
  }

  test("without changeFeedCow a CoW DML rewrite still refuses the feed") {
    spark.sql(s"""CREATE TABLE $catName.db.plain (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $catName.db.plain SELECT id, id FROM range(1, 21) AS r(id)")
    val dir = s"$baseDir/db/plain"
    val v1 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"UPDATE $catName.db.plain SET v = 0 WHERE v % 5 = 3")
    val v2 = Snapshots.latestVersion(spark, dir).get
    assert(Snapshots.changeDataFiles(spark, dir, v2).isEmpty)
    val e = intercept[IllegalStateException] { feed(dir, v1, v2) }
    assert(e.getMessage.contains("logical rewrite"))
  }
}
