package graft.write

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.GraftCatalog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** SHALLOW CLONE (`CALL cat.system.clone`): metadata-only copy whose v1
 *  references the SOURCE's files by absolute path — zero data movement,
 *  clone-local writes/DML, vacuum ownership boundaries, and the loud
 *  source-vacuum failure mode. */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catName: String = {
    val base = Files.createTempDirectory("graft_clone_").toString
    spark.conf.set("spark.sql.catalog.cln", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cln.base", base)
    "cln"
  }
  private def baseDir: String = spark.conf.get(s"spark.sql.catalog.$catName.base")
  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
  private def dataFiles(dir: String): Set[String] = {
    val fs = fsOf(dir)
    graft.sources.TokenPruner
      .listDataFiles(fs, fs.makeQualified(new Path(dir)))
      .map(_.getPath.toString).toSet
  }

  test("clone equals the source at the cloned version (deletion vectors " +
      "included), moves zero data files, and later source writes do not " +
      "leak into it") {
    spark.sql(s"CREATE TABLE $catName.db.src (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '3', snapshot 'true', dmlMode 'merge-on-read')")
    spark.sql(s"INSERT INTO $catName.db.src SELECT id, id * 10 FROM range(1, 41) AS r(id)")
    spark.sql(s"DELETE FROM $catName.db.src WHERE v % 70 = 0") // MoR: DVs
    val srcState = spark.table(s"$catName.db.src").as[(Long, Long)].collect().toSet
    val out = spark.sql(s"CALL $catName.system.clone(" +
      s"source => 'db.src', target => 'db.copy')").collect().head
    assert(out.getLong(1) == 1L)
    // zero data movement: the clone dir holds no data files of its own
    assert(dataFiles(s"$baseDir/db/copy").isEmpty)
    assert(spark.table(s"$catName.db.copy").as[(Long, Long)].collect().toSet
      == srcState)
    // divergence: a later source write is invisible to the clone
    spark.sql(s"INSERT INTO $catName.db.src VALUES (900, 9000)")
    assert(spark.table(s"$catName.db.copy").count() == srcState.size)
    // pk pushdown prunes the clone's FOREIGN files like local ones
    // (manifest/footer stats admitted by planning)
    val all = graft.sources.TokenPruner.listFiles(spark, s"$baseDir/db/src")
    assert(spark.sql(s"SELECT v FROM $catName.db.copy WHERE id = 8").count() == 1)
    assert(all.length > 1, "fixture needs multiple files for the pruning claim")
  }

  test("DML on the clone materializes locally: the source's files and " +
      "content stay byte-identical; clone vacuum deletes nothing foreign") {
    spark.sql(s"CREATE TABLE $catName.db.s2 (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.s2 SELECT id, id FROM range(1, 31) AS r(id)")
    val srcDir = s"$baseDir/db/s2"
    val srcFiles = dataFiles(srcDir)
    spark.sql(s"CALL $catName.system.clone(source => 'db.s2', target => 'db.c2')")
    spark.sql(s"UPDATE $catName.db.c2 SET v = v + 1000 WHERE id % 3 = 0")
    val cloneDir = s"$baseDir/db/c2"
    // the rewrite landed clone-LOCAL generation files
    assert(dataFiles(cloneDir).nonEmpty)
    assert(dataFiles(srcDir) == srcFiles, "DML on the clone touched source files")
    val expect = (1L to 30L).map(i => (i, if (i % 3 == 0) i + 1000 else i)).toSet
    assert(spark.table(s"$catName.db.c2").as[(Long, Long)].collect().toSet == expect)
    assert(spark.table(s"$catName.db.s2").as[(Long, Long)].collect().toSet ==
      (1L to 30L).map(i => (i, i)).toSet)
    // vacuum the clone to 1 version: the pre-DML version's FOREIGN refs
    // are forgotten, never deleted — the source still reads
    Snapshots.vacuum(spark, cloneDir, keepLast = 1)
    assert(dataFiles(srcDir) == srcFiles, "clone vacuum deleted source files")
    assert(spark.table(s"$catName.db.s2").count() == 30L)
    assert(spark.table(s"$catName.db.c2").as[(Long, Long)].collect().toSet == expect)
  }

  test("OPTIMIZE on a clone packs only clone-local files; compactInPlace " +
      "refuses while foreign references remain") {
    spark.sql(s"CREATE TABLE $catName.db.s3 (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.s3 SELECT id, id FROM range(1, 21) AS r(id)")
    spark.sql(s"CALL $catName.system.clone(source => 'db.s3', target => 'db.c3')")
    val srcDir = s"$baseDir/db/s3"
    val cloneDir = s"$baseDir/db/c3"
    val srcFiles = dataFiles(srcDir)
    // two small clone-local appends → packable
    spark.sql(s"INSERT INTO $catName.db.c3 VALUES (100, 100)")
    spark.sql(s"INSERT INTO $catName.db.c3 VALUES (101, 101)")
    spark.sql(s"CALL $catName.system.optimize(table => 'db.c3', " +
      "small_bytes => 33554432, target_bytes => 134217728)")
    assert(dataFiles(srcDir) == srcFiles, "OPTIMIZE on the clone wrote into the source dir")
    assert(spark.table(s"$catName.db.c3").count() == 22L)
    val e = intercept[UnsupportedOperationException] {
      TokenSortedWriter.compactInPlace(spark,
        graft.model.CqlSchema("c3", Seq("id")), cloneDir)
    }
    assert(e.getMessage.contains("out-of-root"))
  }

  test("identity marks and row-tracking state carry: clone inserts allocate " +
      "PAST the source's marks, ids keep their source values") {
    spark.sql(s"CREATE TABLE $catName.db.s4 (" +
      "id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true', rowTracking 'true')")
    spark.sql(s"INSERT INTO $catName.db.s4 (v) VALUES ('a'), ('b'), ('c')")
    val R = graft.sources.GraftDataSource.RowIdCol
    val srcRids = spark.sql(s"SELECT id, $R FROM $catName.db.s4")
      .as[(Long, Long)].collect().toMap
    spark.sql(s"CALL $catName.system.clone(source => 'db.s4', target => 'db.c4')")
    val cloneRids = spark.sql(s"SELECT id, $R FROM $catName.db.c4")
      .as[(Long, Long)].collect().toMap
    assert(cloneRids == srcRids, "row ids must survive the clone")
    spark.sql(s"INSERT INTO $catName.db.c4 (v) VALUES ('d')")
    val ids = spark.sql(s"SELECT id FROM $catName.db.c4").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L),
      s"clone identity must continue from the source's mark: ${ids.toSeq}")
  }

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("vacuuming the SOURCE past the cloned version breaks the clone LOUDLY") {
    spark.sql(s"CREATE TABLE $catName.db.s5 (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.s5 SELECT id, id FROM range(1, 11) AS r(id)")
    spark.sql(s"CALL $catName.system.clone(source => 'db.s5', target => 'db.c5')")
    // a source rewrite + vacuum deletes the cloned generation
    spark.sql(s"CALL $catName.system.compact(table => 'db.s5')")
    Snapshots.vacuum(spark, s"$baseDir/db/s5", keepLast = 1)
    val e = intercept[Exception] { spark.table(s"$catName.db.c5").count() }
    assert(msgs(e).exists(m => m.contains("no longer exist") ||
      m.contains("vacuumed")), s"want a loud missing-file refusal, got: ${msgs(e)}")
  }

  test("a dir-partitioned source clones: partition values ride in the " +
      "foreign paths, pruning works on the partition axis, zero files move") {
    spark.sql(s"CREATE TABLE $catName.db.s6 (id BIGINT, etype STRING, v BIGINT) " +
      "USING graft PARTITIONED BY (etype) " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.s6 " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'click' ELSE 'view' END, id * 10 " +
      "FROM range(1, 41) AS r(id)")
    spark.sql(s"CALL $catName.system.clone(source => 'db.s6', target => 'db.c6')")
    assert(dataFiles(s"$baseDir/db/c6").isEmpty, "shallow clone must move zero files")
    val expect = (1L to 40L)
      .map(i => (i, if (i % 2 == 0) "click" else "view", i * 10)).toSet
    assert(spark.table(s"$catName.db.c6").as[(Long, String, Long)].collect().toSet
      == expect)
    // partition-axis pruning on the clone's FOREIGN files: the graft_p_*
    // path segments survive the absolute reference
    val foreign = graft.sources.TokenPruner
      .listFiles(spark, s"$baseDir/db/s6").map(_.path).toSeq
    val metas = graft.sources.TokenPruner
      .foreignMetas(spark, s"$baseDir/db/c6", foreign)
    val pruned = graft.sources.TokenPruner.prune(spark, metas.toArray,
      Array(org.apache.spark.sql.sources.EqualTo("etype", "click")),
      graft.model.CqlSchema("c6", Seq("id")))
    assert(pruned.nonEmpty && pruned.length < metas.length,
      s"partition pruning must drop whole foreign dirs: ${pruned.length}/${metas.length}")
    assert(pruned.forall(m =>
      graft.sources.TokenPruner.dirValues(m.path).get("etype").contains(Some("click"))))
    // filtered read through the table surface stays correct
    assert(spark.sql(s"SELECT count(*) FROM $catName.db.c6 WHERE etype = 'view'")
      .head().getLong(0) == 20L)
    // divergence both ways, dir-partitioned writes land clone-local
    spark.sql(s"UPDATE $catName.db.c6 SET v = 0 WHERE etype = 'click'")
    assert(dataFiles(s"$baseDir/db/c6").nonEmpty)
    assert(spark.table(s"$catName.db.s6").as[(Long, String, Long)].collect().toSet
      == expect, "clone DML leaked into the dir-partitioned source")
  }

  test("deep clone copies files digest-verified, preserves dir layout, and " +
      "survives a source vacuum that breaks the shallow clone") {
    spark.sql(s"CREATE TABLE $catName.db.s10 (id BIGINT, etype STRING, v BIGINT) " +
      "USING graft PARTITIONED BY (etype) " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.s10 " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, id " +
      "FROM range(1, 31) AS r(id)")
    val expect = (1L to 30L)
      .map(i => (i, if (i % 2 == 0) "a" else "b", i)).toSet
    spark.sql(s"CALL $catName.system.clone(source => 'db.s10', " +
      "target => 'db.shal10')")
    val out = spark.sql(s"CALL $catName.system.clone(source => 'db.s10', " +
      "target => 'db.deep10', deep => true)").collect().head
    assert(out.getLong(1) == 1L)
    val deepDir = s"$baseDir/db/deep10"
    val copied = dataFiles(deepDir)
    assert(copied.nonEmpty, "deep clone must copy data files")
    assert(copied == dataFiles(s"$baseDir/db/s10")
      .map(_.replace("/db/s10", "/db/deep10")),
      "deep clone must preserve the source-relative layout (incl. graft_p_* dirs)")
    assert(spark.table(s"$catName.db.deep10").as[(Long, String, Long)]
      .collect().toSet == expect)
    // rewrite + vacuum the source past the pin: the deep clone still
    // reads, the shallow one fails loudly
    spark.sql(s"CALL $catName.system.compact(table => 'db.s10')")
    Snapshots.vacuum(spark, s"$baseDir/db/s10", keepLast = 1)
    assert(spark.table(s"$catName.db.deep10").as[(Long, String, Long)]
      .collect().toSet == expect, "deep clone must survive a source vacuum")
    val e = intercept[Exception] { spark.table(s"$catName.db.shal10").count() }
    assert(msgs(e).exists(m => m.contains("no longer exist") ||
      m.contains("vacuumed")), s"got: ${msgs(e)}")
    // and the deep clone is digest-covered in its own manifest
    val fsd = fsOf(deepDir)
    val man = Manifest.read(fsd, fsd.makeQualified(new Path(deepDir)))
    assert(copied.forall(p => man.get(p).exists(_.digest.isDefined)),
      "deep-cloned files must carry manifest digests")
  }

  test("deep clone of an EMPTY snapshot (full-table delete) commits a " +
      "readable empty v1") {
    spark.sql(s"CREATE TABLE $catName.db.s12 (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.s12 VALUES (1, 1), (2, 2)")
    spark.sql(s"DELETE FROM $catName.db.s12 WHERE v > 0") // zero files remain
    assert(spark.table(s"$catName.db.s12").count() == 0L)
    spark.sql(s"CALL $catName.system.clone(source => 'db.s12', " +
      "target => 'db.deep12', deep => true)")
    assert(spark.table(s"$catName.db.deep12").count() == 0L)
    spark.sql(s"INSERT INTO $catName.db.deep12 VALUES (9, 9)")
    assert(spark.table(s"$catName.db.deep12").count() == 1L)
  }

  test("deep clone carries deletion vectors and row ids") {
    spark.sql(s"CREATE TABLE $catName.db.s11 (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true', " +
      "dmlMode 'merge-on-read', rowTracking 'true')")
    spark.sql(s"INSERT INTO $catName.db.s11 SELECT id, id * 10 FROM range(1, 41) AS r(id)")
    spark.sql(s"DELETE FROM $catName.db.s11 WHERE v % 70 = 0") // MoR: DVs
    val R = graft.sources.GraftDataSource.RowIdCol
    val srcState = spark.sql(s"SELECT id, v, $R FROM $catName.db.s11")
      .as[(Long, Long, Long)].collect().toSet
    spark.sql(s"CALL $catName.system.clone(source => 'db.s11', " +
      "target => 'db.deep11', deep => true)")
    assert(spark.sql(s"SELECT id, v, $R FROM $catName.db.deep11")
      .as[(Long, Long, Long)].collect().toSet == srcState,
      "DVs and row ids must survive a deep clone")
  }

  test("the clone's v1 feed spans mixed source generations: stored values " +
      "of a defaulted column survive (no single-footer inference), the " +
      "pre-evolution rows fill the default") {
    spark.sql(s"CREATE TABLE $catName.db.s9 (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.s9 SELECT id, id FROM range(1, 6) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.s9 ADD COLUMNS (tag STRING DEFAULT 'old')")
    spark.sql(s"INSERT INTO $catName.db.s9 VALUES (100, 100, 'new')")
    spark.sql(s"CALL $catName.system.clone(source => 'db.s9', target => 'db.c9')")
    val dir = s"$baseDir/db/c9"
    // the clone's v1 event set references BOTH generations in ONE commit
    val ev = Snapshots.readChangesWithDeletes(spark, dir, 0L, 1L)
      .select(col("id"), col("tag")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ev == ((1L to 5L).map(_ -> "old").toSet + (100L -> "new")),
      s"mixed-generation clone feed corrupted the defaulted column: $ev")
  }

  test("clone pins by VERSION or by TAG (release fork); both-given and " +
      "unknown tags refuse before creating anything") {
    spark.sql(s"CREATE TABLE $catName.db.s8 (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.s8 VALUES (1, 10), (2, 20)") // v1
    spark.sql(s"CALL $catName.system.create_tag(table => 'db.s8', name => 'rel')")
    spark.sql(s"INSERT INTO $catName.db.s8 VALUES (3, 30)")          // v2
    spark.sql(s"CALL $catName.system.clone(source => 'db.s8', " +
      "target => 'db.c8', tag => 'rel')")
    assert(spark.table(s"$catName.db.c8").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L)))
    spark.sql(s"CALL $catName.system.clone(source => 'db.s8', " +
      "target => 'db.c8v', version => 2)")
    assert(spark.table(s"$catName.db.c8v").count() == 3L)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      spark.sql(s"CALL $catName.system.clone(source => 'db.s8', " +
        "target => 'db.c8x', version => 1, tag => 'rel')")
    }
    assert(msgs(e).exists(_.contains("not both")))
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $catName.system.clone(source => 'db.s8', " +
        "target => 'db.c8y', tag => 'nope')")
    }
    assert(msgs(e2).exists(_.contains("no such tag")))
    // the refused clones left no descriptor behind
    assert(!spark.catalog.tableExists(s"$catName.db.c8x"))
    assert(!spark.catalog.tableExists(s"$catName.db.c8y"))
  }

  test("the clone's change feed starts at v1 = the full cloned content; " +
      "clone-side DML events flow from there") {
    spark.sql(s"CREATE TABLE $catName.db.s7 (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true', dmlMode 'merge-on-read')")
    spark.sql(s"INSERT INTO $catName.db.s7 SELECT id, id FROM range(1, 6) AS r(id)")
    spark.sql(s"CALL $catName.system.clone(source => 'db.s7', target => 'db.c7')")
    spark.sql(s"DELETE FROM $catName.db.c7 WHERE v = 3")
    val dir = s"$baseDir/db/c7"
    val head = Snapshots.latestVersion(spark, dir).get
    val ev = Snapshots.readChangesWithDeletes(spark, dir, 0L, head)
      .select(col("id"), col(Snapshots.ChangeTypeCol), col(Snapshots.CommitVersionCol))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(ev.filter(_._2 == "insert").map(_._1).sorted.toSeq == (1L to 5L))
    assert(ev.filter(_._2 == "insert").forall(_._3 == 1L))
    assert(ev.filter(_._2 == "delete").toSeq == Seq((3L, "delete", head)))
  }
}
