package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.write.{DeletionVectors, Snapshots}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Read-side deletion-vector semantics: position-exact row hiding, time
 *  travel, metadata-column coordinates, planning-shrink gating, vacuum
 *  reclamation, and restore re-installing historical bindings. */
class DeletionVectorSpec extends SparkSpec {

  private lazy val catName: String = {
    val base = Files.createTempDirectory("graft_dv_").toString
    spark.conf.set("spark.sql.catalog.dvc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvc.base", base)
    "dvc"
  }
  private def baseDir: String = spark.conf.get(s"spark.sql.catalog.$catName.base")

  private def createLogged(name: String, rows: Int = 200, parts: Int = 4): String = {
    spark.sql(s"""CREATE TABLE $catName.db.$name (id BIGINT, cat STRING, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '$parts', snapshot 'true')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $catName.db.$name " +
      s"SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10 " +
      s"FROM range(1, ${rows + 1}) AS r(id)")
    s"$baseDir/db/$name"
  }

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  test("metadata columns: _graft_pos is the dense 0-based per-file physical index") {
    val dir = createLogged("meta")
    val rows = spark.table(s"$catName.db.meta")
      .select(col("id"), col("_graft_file"), col("_graft_pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 200)
    // per file: positions are exactly 0..n-1, each exactly once
    rows.groupBy(_._2).foreach { case (f, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length.toLong).toSeq,
        s"positions of $f not dense: ${rs.map(_._3).sorted.mkString(",")}")
    }
    // ids unique across files
    assert(rows.map(_._1).distinct.length == 200)
    // REVERSED projection order: values must follow the requested order,
    // never a fixed emit order (a swap would put a path in a long column)
    val rev = spark.table(s"$catName.db.meta")
      .select(col("_graft_pos"), col("id"), col("_graft_file"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    rev.foreach { case (p, id, f) =>
      assert(byId(id) == ((f, p)), s"reversed projection swapped values for id=$id")
    }
  }

  test("a committed DV hides exactly its positions; time travel sees them all") {
    val dir = createLogged("hide")
    val v0 = Snapshots.latestVersion(spark, dir).get
    val coords = spark.table(s"$catName.db.hide")
      .select(col("id"), col("_graft_file"), col("_graft_pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (file, inFile) = coords.groupBy(_._2).maxBy(_._2.length)
    val doomed = inFile.filter(r => r._3 == 0L || r._3 == 2L)
    assert(doomed.length == 2)
    val fs = fsOf(dir)
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(0L, 2L))
    Snapshots.commitDeltas(spark, dir, Map(file -> dv), Nil, Some(v0))

    val after = spark.table(s"$catName.db.hide").select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(after.size == 198)
    doomed.foreach(d => assert(!after.contains(d._1), s"id ${d._1} must be hidden"))
    // aggregate pushdown must NOT answer from footer counts now
    assert(spark.table(s"$catName.db.hide").count() == 198L)
    // pre-DV pin: full content
    val pinned = spark.read.format("graft").option("path", dir)
      .option("pk", "id").option("snapshotVersion", v0.toString).load()
    assert(pinned.count() == 200L)
    // positions of surviving rows are unchanged physical coordinates
    val survivors = spark.table(s"$catName.db.hide")
      .filter(col("_graft_file") === file)
      .select(col("_graft_pos")).collect().map(_.getLong(0)).sorted
    assert(!survivors.contains(0L) && !survivors.contains(2L))
    assert(survivors.contains(1L) && survivors.length == inFile.length - 2)
  }

  test("a second DV on the same file replaces the binding with the union") {
    val dir = createLogged("union")
    val v0 = Snapshots.latestVersion(spark, dir).get
    val file = spark.table(s"$catName.db.union").select(col("_graft_file"))
      .distinct().collect().map(_.getString(0)).sorted.head
    val fs = fsOf(dir)
    val dv1 = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv1, Array(0L))
    val v1 = Snapshots.commitDeltas(spark, dir, Map(file -> dv1), Nil, Some(v0))
    val dv2 = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv2, DeletionVectors.union(fs, Some(dv1), Array(1L)))
    Snapshots.commitDeltas(spark, dir, Map(file -> dv2), Nil, Some(v1))

    val nAll = spark.read.format("graft").option("path", dir).option("pk", "id")
      .option("snapshotVersion", v0.toString).load().count()
    assert(spark.table(s"$catName.db.union").count() == nAll - 2)
    // intermediate version hides only the first position
    val mid = spark.read.format("graft").option("path", dir).option("pk", "id")
      .option("snapshotVersion", v1.toString).load()
    assert(mid.count() == nAll - 1)
    // DESCRIBE HISTORY shows the live binding count per version (the
    // merge-on-read debt OPTIMIZE is meant to clear)
    val dvCounts = Snapshots.historyDf(spark, dir)
      .orderBy(col("version"))
      .select(col("n_dvs")).collect().map(_.getInt(0)).toSeq
    assert(dvCounts == Seq(0, 1, 1), s"got $dvCounts")
  }

  test("restore re-installs the historical DV bindings") {
    val dir = createLogged("rest")
    val v0 = Snapshots.latestVersion(spark, dir).get
    val file = spark.table(s"$catName.db.rest").select(col("_graft_file"))
      .distinct().collect().map(_.getString(0)).sorted.head
    val fs = fsOf(dir)
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(0L, 1L, 2L))
    val v1 = Snapshots.commitDeltas(spark, dir, Map(file -> dv), Nil, Some(v0))
    val nWithDv = spark.table(s"$catName.db.rest").count()
    // append afterwards so the head moves past the DV commit
    spark.sql(s"INSERT INTO $catName.db.rest VALUES (9001, 'even', 0)")
    assert(spark.table(s"$catName.db.rest").count() == nWithDv + 1)
    // restore to the DV version: binding must come back exactly
    Snapshots.restore(spark, dir, v1)
    assert(spark.table(s"$catName.db.rest").count() == nWithDv)
    // and restore to v0 clears it
    Snapshots.restore(spark, dir, v0)
    assert(spark.table(s"$catName.db.rest").count() == 200L)
  }

  test("vacuum reclaims DV files bound only by dropped snapshots") {
    val dir = createLogged("vac")
    val v0 = Snapshots.latestVersion(spark, dir).get
    val file = spark.table(s"$catName.db.vac").select(col("_graft_file"))
      .distinct().collect().map(_.getString(0)).sorted.head
    val fs = fsOf(dir)
    val dv1 = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv1, Array(0L))
    val v1 = Snapshots.commitDeltas(spark, dir, Map(file -> dv1), Nil, Some(v0))
    val dv2 = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv2, DeletionVectors.union(fs, Some(dv1), Array(1L)))
    Snapshots.commitDeltas(spark, dir, Map(file -> dv2), Nil, Some(v1))

    val deleted = Snapshots.vacuum(spark, dir, keepLast = 1)
    assert(deleted.contains(fs.makeQualified(new Path(dv1)).toString),
      s"superseded dv must be reclaimed, got: ${deleted.mkString(",")}")
    assert(fs.exists(new Path(dv2)), "live dv must survive vacuum")
    assert(spark.table(s"$catName.db.vac").count() == 198L)
  }

  test("snapshot diff across a MoR delete reports the hidden rows as deletes") {
    val dir = createLogged("diff")
    val v0 = Snapshots.latestVersion(spark, dir).get
    val coords = spark.table(s"$catName.db.diff")
      .select(col("id"), col("_graft_file"), col("_graft_pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (file, inFile) = coords.groupBy(_._2).head
    val victims = inFile.filter(r => r._3 < 3L).map(_._1).toSet
    val fs = fsOf(dir)
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(0L, 1L, 2L))
    val v1 = Snapshots.commitDeltas(spark, dir, Map(file -> dv), Nil, Some(v0))
    // diffRows reads both pins through the source → DVs apply per version
    val d = graft.write.TokenSortedWriter.diffRows(
      spark, graft.model.CqlSchema("diff", Seq("id")), dir, v0, v1)
    val deleted = d.filter(col("op") === "delete")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(deleted == victims, s"expected $victims, got $deleted")
    assert(d.filter(col("op") =!= "delete").count() == 0L)
  }

  test("copy-on-write DML on a dv-carrying table does not resurrect hidden rows") {
    // default dmlMode (CoW) + a manually committed DV: the rewrite reads
    // the affected file with the DV applied, so the replacement file must
    // not contain the hidden row
    val dir = createLogged("cowdv", rows = 40, parts = 1)
    val v0 = Snapshots.latestVersion(spark, dir).get
    val coords = spark.table(s"$catName.db.cowdv")
      .select(col("id"), col("_graft_file"), col("_graft_pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (file, inFile) = coords.groupBy(_._2).head
    val hidden = inFile.find(_._3 == 0L).get._1
    val fs = fsOf(dir)
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(0L))
    Snapshots.commitDeltas(spark, dir, Map(file -> dv), Nil, Some(v0))
    assert(spark.table(s"$catName.db.cowdv").count() == 39L)

    spark.sql(s"UPDATE $catName.db.cowdv SET v = v + 1 WHERE cat = 'even'")

    val t = spark.table(s"$catName.db.cowdv")
    assert(t.count() == 39L, "CoW rewrite resurrected a DV-hidden row")
    assert(t.filter(col("id") === hidden).count() == 0L)
    // the rewrite replaced the dv-carrying file → binding dropped
    val head = Snapshots.latestVersion(spark, dir).get
    assert(Snapshots.deletionVectors(spark, dir, head).isEmpty)
  }

  test("vacuumOrphans reclaims DV files no retained version references") {
    val dir = createLogged("odv")
    val fs = fsOf(dir)
    val stray = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, stray, Array(5L)) // never committed
    val gone = Snapshots.vacuumOrphans(spark, dir, olderThanMs = 0L)
    assert(gone.contains(fs.makeQualified(new Path(stray)).toString),
      s"stray dv must be collected, got $gone")
    assert(!fs.exists(new Path(stray)))
    assert(spark.table(s"$catName.db.odv").count() == 200L)
  }

  test("read-tax contract: clean tables keep columnar scans; a DV positions " +
      "ONLY its carrier file") {
    val dir = createLogged("tax")
    // clean: the stock vectorized path (ColumnarToRow present in the plan)
    val clean = spark.table(s"$catName.db.tax")
    assert(clean.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "a table without DVs must keep the vectorized scan")
    val files = clean.select(col("_graft_file")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(files.length >= 4)
    val v0 = Snapshots.latestVersion(spark, dir).get
    val fs = fsOf(dir)
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(0L))
    Snapshots.commitDeltas(spark, dir, Map(files.head -> dv), Nil, Some(v0))
    // DV present: the scan is row-based (partition uniformity), but only
    // the carrier file becomes a whole-file positioned partition — clean
    // files keep their split partitions
    val scan = spark.read.format("graft").option("path", dir).option("pk", "id").load()
    val plan = scan.queryExecution.executedPlan
    assert(!plan.toString.contains("ColumnarToRow"),
      "a dv-carrying scan plans row-based partitions")
    val batchScan = plan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val positioned = batchScan.inputPartitions.collect {
      case p: org.apache.spark.sql.graftshim.PositionedPartition => p
    }
    assert(positioned.length == 1 && positioned.head.filePath == files.head,
      s"exactly the carrier file positions, got ${positioned.map(_.filePath)}")
    assert(batchScan.inputPartitions.length > 1,
      "clean files must keep their own (split) partitions")
    assert(scan.count() == 199L)
  }

  test("change feed across a DV-only commit: empty increment, no failure " +
      "(append-capture contract — deletes are not delivered)") {
    val dir = createLogged("feed")
    val v0 = Snapshots.latestVersion(spark, dir).get
    val file = spark.table(s"$catName.db.feed").select(col("_graft_file"))
      .distinct().collect().map(_.getString(0)).sorted.head
    val fs = fsOf(dir)
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(0L))
    val v1 = Snapshots.commitDeltas(spark, dir, Map(file -> dv), Nil, Some(v0))
    assert(Snapshots.readChanges(spark, dir, v0, v1).count() == 0L)
    // and a DV commit does NOT break later increments
    spark.sql(s"INSERT INTO $catName.db.feed VALUES (9001, 'even', 0)")
    val v2 = Snapshots.latestVersion(spark, dir).get
    assert(Snapshots.readChanges(spark, dir, v0, v2)
      .select(col("id")).collect().map(_.getLong(0)).toSeq == Seq(9001L))
  }

  test("file-tail streaming refuses dv-carrying plans loudly, naming the remediation") {
    val dir = createLogged("stream")
    val v0 = Snapshots.latestVersion(spark, dir).get
    val file = spark.table(s"$catName.db.stream").select(col("_graft_file"))
      .distinct().collect().map(_.getString(0)).sorted.head
    val fs = fsOf(dir)
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(0L))
    Snapshots.commitDeltas(spark, dir, Map(file -> dv), Nil, Some(v0))
    val e = intercept[IllegalStateException] {
      GraftMicroBatchStream.refuseDeletionVectors(spark, dir, Seq(file))
    }
    assert(e.getMessage.contains("deletion") && e.getMessage.contains("OPTIMIZE"))
    // files without a DV pass the guard
    GraftMicroBatchStream.refuseDeletionVectors(spark, dir,
      Seq(s"$dir/other-file.parquet"))
  }

  test("commitDeltas refuses a DV bound to a file outside the committed set") {
    val dir = createLogged("refu")
    val v0 = Snapshots.latestVersion(spark, dir).get
    val fs = fsOf(dir)
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(0L))
    val e = intercept[IllegalArgumentException] {
      Snapshots.commitDeltas(spark, dir,
        Map(s"$dir/no-such-file.parquet" -> dv), Nil, Some(v0))
    }
    assert(e.getMessage.contains("not in the committed set"))
  }

  test("tag pins resolve DV bindings of the tagged version") {
    val dir = createLogged("tagdv")
    val v0 = Snapshots.latestVersion(spark, dir).get
    Snapshots.tag(spark, dir, "pre-dml", v0)
    val file = spark.table(s"$catName.db.tagdv").select(col("_graft_file"))
      .distinct().collect().map(_.getString(0)).sorted.head
    val fs = fsOf(dir)
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(0L, 1L))
    val v1 = Snapshots.commitDeltas(spark, dir, Map(file -> dv), Nil, Some(v0))
    Snapshots.tag(spark, dir, "post-dml", v1)
    def read(pin: String) = spark.read.format("graft").option("path", dir)
      .option("pk", "id").option("snapshotVersion", pin).load().count()
    assert(read("tag:pre-dml") == 200L)
    assert(read("tag:post-dml") == 198L)
    assert(read("latest") == 198L)
  }

  test("pk-pruned reads still apply the DV (pruning and hiding compose)") {
    val dir = createLogged("prune")
    val v0 = Snapshots.latestVersion(spark, dir).get
    val coords = spark.table(s"$catName.db.prune")
      .select(col("id"), col("_graft_file"), col("_graft_pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (file, inFile) = coords.groupBy(_._2).head
    val victim = inFile.find(_._3 == 0L).get
    val fs = fsOf(dir)
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, Array(0L))
    Snapshots.commitDeltas(spark, dir, Map(file -> dv), Nil, Some(v0))
    // point lookup of the deleted pk: token pruning plans its file, the DV
    // hides the row — zero rows, not a resurrect
    assert(spark.table(s"$catName.db.prune")
      .filter(col("id") === victim._1).count() == 0L)
    // a surviving pk in the same file still resolves
    val alive = inFile.find(_._3 == 1L).get
    assert(spark.table(s"$catName.db.prune")
      .filter(col("id") === alive._1).count() == 1L)
  }
}
