package graft.write

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Row tracking: stable per-row ids (`_graft_row_id` = stored
 *  materialized id, else base-row-id + physical position) allocated at
 *  commit time from a log-carried high-water mark, never reused. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = CqlSchema("t", Seq("id"))
  private def conf = TokenSortedWriter.WriteConf(
    numPartitions = 3, snapshot = true, rowTracking = true)

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_rid_$tag").toString + "/t"

  private def readIds(dir: String) =
    spark.read.format("graft").option("path", dir).option("pk", "id")
      .option("rowTracking", "true").load()
      .select(col("id"), col(graft.sources.GraftDataSource.RowIdCol))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("appends allocate dense, never-reused ids: two generations cover " +
      "0..n-1 and the high-water mark advances past both") {
    val dir = freshDir("alloc")
    Seq.range(1L, 41L).map(i => (i, i * 2)).toDF("id", "v")
      .coalesce(1).write.format("graft").options(Map(
        "path" -> dir, "pk" -> "id", "partitions" -> "3",
        "snapshot" -> "true", "rowTracking" -> "true")).save()
    val first = readIds(dir)
    assert(first.length == 40)
    assert(first.map(_._2).sorted.toSeq == (0L until 40L),
      s"first generation ids must be dense 0..39, got ${first.map(_._2).sorted.take(5).mkString(",")}…")
    Seq.range(100L, 120L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.format("graft").mode(SaveMode.Append).options(Map(
        "path" -> dir, "pk" -> "id", "partitions" -> "3",
        "snapshot" -> "true", "rowTracking" -> "true")).save()
    val all = readIds(dir)
    assert(all.length == 60)
    assert(all.map(_._2).distinct.length == 60, "row ids must be unique")
    assert(all.map(_._2).sorted.toSeq == (0L until 60L))
    // ids are append-time properties: the first generation's pairs persist
    val firstAgain = readIds(dir).filter(p => first.exists(_._1 == p._1)).toMap
    assert(first.toMap == firstAgain.filter(kv => first.toMap.contains(kv._1)))
    val head = Snapshots.latestVersion(spark, dir).get
    assert(Snapshots.rowIdHighWaterMark(spark, dir, head).contains(60L))
    assert(Snapshots.rowIdBindings(spark, dir, head).size ==
      Snapshots.files(spark, dir, head).size, "every live file is bound")
  }

  test("INSERT OVERWRITE on a tracked table: the fresh generation gets " +
      "NEW ids past the mark (the staging write is log-less; allocation " +
      "happens in the rewrite commit)") {
    val dir = freshDir("ow")
    val cat = "grow" + java.util.UUID.randomUUID().toString.take(8)
    val base = Files.createTempDirectory("graft_ridow_").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true', rowTracking 'true')")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id FROM RANGE(10) AS r(id)")
    spark.sql(s"INSERT OVERWRITE $cat.db.t SELECT id + 100, id FROM RANGE(5) AS r(id)")
    val tdir = s"$base/db/t"
    val ids = spark.read.format("graft").option("path", tdir).option("pk", "id")
      .option("rowTracking", "true").load()
      .select(col(graft.sources.GraftDataSource.RowIdCol))
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (10L until 15L), s"overwrite generation must allocate " +
      s"fresh ids past the first generation's 0..9, got ${ids.toSeq}")
    val head = Snapshots.latestVersion(spark, tdir).get
    assert(Snapshots.rowIdHighWaterMark(spark, tdir, head).contains(15L))
  }

  test("tracking is self-perpetuating: a later PLAIN append (no option) " +
      "still allocates, because the parent carries the mark") {
    val dir = freshDir("perp")
    TokenSortedWriter.write(Seq((1L, 1L), (2L, 2L)).toDF("id", "v"),
      schema, dir, SaveMode.Append, conf)
    TokenSortedWriter.write(Seq((3L, 3L)).toDF("id", "v"),
      schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, snapshot = true))
    val ids = readIds(dir)
    assert(ids.map(_._2).sorted.toSeq == (0L until 3L))
  }

  test("rowTracking without snapshot refuses (the mark lives in the log); " +
      "an untracked table's scan refuses the metadata column usefully") {
    val dir = freshDir("guard")
    val e = intercept[IllegalArgumentException] {
      TokenSortedWriter.write(Seq((1L, 1L)).toDF("id", "v"), schema, dir,
        SaveMode.Append, TokenSortedWriter.WriteConf(rowTracking = true))
    }
    assert(e.getMessage.contains("snapshot"))
    // the refusal happens BEFORE any data lands: a log-less table's
    // listing reads must not see rows from a "failed" write
    val fsg = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fsg.exists(new org.apache.hadoop.fs.Path(dir)) ||
      !fsg.listStatus(new org.apache.hadoop.fs.Path(dir))
        .exists(_.getPath.getName.endsWith(".parquet")),
      "refused write left data files behind")
    // untracked table, option forced on read: files have no bindings
    TokenSortedWriter.write(Seq((1L, 1L)).toDF("id", "v"), schema, dir,
      SaveMode.Append, TokenSortedWriter.WriteConf(snapshot = true))
    val e2 = intercept[Exception] { readIds(dir) }
    assert(e2.getMessage.contains("base-row-id") ||
      Option(e2.getCause).exists(_.getMessage.contains("base-row-id")),
      s"got: ${e2.getMessage}")
  }

  test("ids are STABLE across OPTIMIZE: packing small generations " +
      "materializes each row's id into the replacement, physical " +
      "coordinates move, row ids do not") {
    val dir = freshDir("opt")
    Seq.range(1L, 31L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.format("graft").options(Map(
        "path" -> dir, "pk" -> "id", "partitions" -> "2",
        "snapshot" -> "true", "rowTracking" -> "true")).save()
    Seq.range(31L, 61L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.format("graft").mode(SaveMode.Append).options(Map(
        "path" -> dir, "pk" -> "id", "partitions" -> "2",
        "snapshot" -> "true", "rowTracking" -> "true")).save()
    val before = readIds(dir).toMap
    val beforeFiles = spark.read.format("graft").option("path", dir)
      .option("pk", "id").load()
      .select(col("id"), col("_graft_file")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val packed = TokenSortedWriter.optimizeSmallFiles(spark, schema, dir)
    assert(packed > 0L, "expected the small generations to pack")
    val after = readIds(dir).toMap
    assert(after == before, "row ids must survive OPTIMIZE bit-for-bit")
    val afterFiles = spark.read.format("graft").option("path", dir)
      .option("pk", "id").load()
      .select(col("id"), col("_graft_file")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(beforeFiles.exists { case (k, f) => afterFiles(k) != f },
      "packing must actually have moved rows (else the test is vacuous)")
    // a second pack over the MATERIALIZED file keeps the stored ids
    Seq((200L, 200L)).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Append).options(Map(
        "path" -> dir, "pk" -> "id", "partitions" -> "1",
        "snapshot" -> "true", "rowTracking" -> "true")).save()
    TokenSortedWriter.optimizeSmallFiles(spark, schema, dir)
    val again = readIds(dir).toMap
    assert(again.filter(_._1 != 200L) == before)
  }

  test("ids survive OPTIMIZE with deletion vectors folding: deleted rows " +
      "vanish, survivors keep their ids") {
    val dir = freshDir("optdv")
    Seq.range(1L, 21L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.format("graft").options(Map(
        "path" -> dir, "pk" -> "id", "partitions" -> "1",
        "snapshot" -> "true", "rowTracking" -> "true")).save()
    Seq.range(21L, 41L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.format("graft").mode(SaveMode.Append).options(Map(
        "path" -> dir, "pk" -> "id", "partitions" -> "1",
        "snapshot" -> "true", "rowTracking" -> "true")).save()
    val before = readIds(dir).toMap
    // hide ids 1..5 via a direct DV on their carrier
    val coords = spark.read.format("graft").option("path", dir).option("pk", "id")
      .load().select(col("id"), col("_graft_file"), col("_graft_pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._1 <= 5L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val byFile = coords.groupBy(_._2)
    val head = Snapshots.latestVersion(spark, dir)
    val dvs = byFile.map { case (f, cs) =>
      val dv = DeletionVectors.newDvPath(dir)
      DeletionVectors.write(fs, dv, cs.map(_._3).sorted)
      f -> dv
    }
    Snapshots.commitDeltas(spark, dir, dvs, Nil, head)
    TokenSortedWriter.optimizeSmallFiles(spark, schema, dir,
      maxDvFraction = 0.01)
    val after = readIds(dir).toMap
    assert(!after.keySet.exists(_ <= 5L), "DV'd rows must fold away")
    assert(after == before.filter(_._1 > 5L),
      "survivors keep their pre-pack ids")
  }

  test("ids are STABLE across copy-on-write DML: UPDATE moves whole file " +
      "groups, updated AND carried rows keep their ids; DELETE burns ids; " +
      "MERGE inserts mint fresh ones") {
    val base = Files.createTempDirectory("graft_ridcow_").toString
    spark.conf.set("spark.sql.catalog.rcow", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rcow.base", base)
    spark.sql("CREATE TABLE rcow.db.t (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true', rowTracking 'true')")
    spark.sql("INSERT INTO rcow.db.t SELECT id, id * 10 FROM range(1, 41) AS r(id)")
    def ids() = spark.sql("SELECT id, v, _graft_row_id FROM rcow.db.t")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val before = ids()
    spark.sql("UPDATE rcow.db.t SET v = v + 1 WHERE id % 4 = 2")
    val afterUpd = ids()
    assert(afterUpd.view.mapValues(_._2).toMap == before.view.mapValues(_._2).toMap,
      "CoW UPDATE must not move one row id (updated or carried)")
    assert(afterUpd(2L)._1 == 21L && afterUpd(4L)._1 == 40L)
    spark.sql("DELETE FROM rcow.db.t WHERE v >= 400")
    val afterDel = ids()
    assert(afterDel.keySet == (1L until 40L).toSet)
    assert(afterDel.view.mapValues(_._2).toMap ==
      before.view.mapValues(_._2).filter(kv => afterDel.contains(kv._1)).toMap)
    spark.sql("MERGE INTO rcow.db.t USING (SELECT 100 AS id, 5 AS nv) s " +
      "ON rcow.db.t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.nv " +
      "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)")
    val afterMerge = ids()
    assert(afterMerge(100L)._2 >= 40L, "a merged-in row mints a FRESH id")
    assert(afterMerge.view.filterKeys(_ != 100L).mapValues(_._2).toMap ==
      afterDel.view.mapValues(_._2).toMap)
  }

  test("compactInPlace refuses a tracked table (the LWW fold cannot " +
      "preserve ids) and points at optimizeSmallFiles") {
    val dir = freshDir("compactref")
    TokenSortedWriter.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), schema,
      dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(snapshot = true, rowTracking = true))
    val e = intercept[UnsupportedOperationException] {
      TokenSortedWriter.compactInPlace(spark, schema, dir)
    }
    assert(e.getMessage.contains("optimizeSmallFiles"), e.getMessage)
  }

  test("a FULL-PK DELETE on a tracked table keeps survivor ids: the " +
      "metadata fast path (which would renumber them) is refused") {
    val base = Files.createTempDirectory("graft_ridpkdel_").toString
    spark.conf.set("spark.sql.catalog.rpk", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rpk.base", base)
    spark.sql("CREATE TABLE rpk.db.t (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true', rowTracking 'true')")
    spark.sql("INSERT INTO rpk.db.t SELECT id, id * 10 FROM range(1, 41) AS r(id)")
    def ids() = spark.sql("SELECT id, _graft_row_id FROM rpk.db.t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val before = ids()
    // full-pk =/IN is what SupportsDelete's metadata path accepts; on a
    // tracked table it would rewrite survivors WITHOUT materializing
    // their ids — every survivor silently renumbered. The row-level
    // path must win instead.
    spark.sql("DELETE FROM rpk.db.t WHERE id IN (2, 4, 6)")
    val after = ids()
    assert(after.keySet == before.keySet -- Set(2L, 4L, 6L))
    assert(after == before.view.filterKeys(after.contains).toMap,
      "pk DELETE renumbered surviving rows")
  }

  test("ids are STABLE across merge-on-read DML: the re-insert generation " +
      "materializes the old id, deletes stay positional") {
    val base = Files.createTempDirectory("graft_ridmor_").toString
    spark.conf.set("spark.sql.catalog.rmor", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rmor.base", base)
    spark.sql("CREATE TABLE rmor.db.t (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true', rowTracking 'true', " +
      "dmlMode 'merge-on-read')")
    spark.sql("INSERT INTO rmor.db.t SELECT id, id * 10 FROM range(1, 41) AS r(id)")
    def ids() = spark.sql("SELECT id, v, _graft_row_id FROM rmor.db.t")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val before = ids()
    // non-key predicate: keeps the DV fast path off the pk metadata route
    spark.sql("UPDATE rmor.db.t SET v = v + 1 WHERE v % 40 = 20")
    val afterUpd = ids()
    assert(afterUpd.view.mapValues(_._2).toMap == before.view.mapValues(_._2).toMap,
      "MoR UPDATE must carry the old id into the re-insert generation")
    assert(afterUpd(2L)._1 == 21L)
    spark.sql("DELETE FROM rmor.db.t WHERE v > 350")
    val afterDel = ids()
    assert(afterDel.view.mapValues(_._2).toMap ==
      afterUpd.view.filterKeys(afterDel.contains).mapValues(_._2).toMap)
    // and OPTIMIZE folding the DML's DVs keeps everything stable
    TokenSortedWriter.optimizeSmallFiles(spark, schema,
      s"$base/db/t", maxDvFraction = 0.001)
    assert(ids() == afterDel)
  }

  test("catalog surface: CREATE TABLE with rowTracking exposes the " +
      "metadata column through SQL, ids stable across restore") {
    val base = Files.createTempDirectory("graft_ridcat_").toString
    spark.conf.set("spark.sql.catalog.ridc", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ridc.base", base)
    spark.sql("CREATE TABLE ridc.db.t (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true', rowTracking 'true')")
    spark.sql("INSERT INTO ridc.db.t SELECT id, id FROM range(1, 21) AS r(id)")
    val ids = spark.sql("SELECT id, _graft_row_id FROM ridc.db.t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ids.values.toSeq.sorted == (0L until 20L))
    spark.sql("INSERT INTO ridc.db.t SELECT id, id FROM range(21, 31) AS r(id)")
    val dir = s"$base/db/t"
    val v1 = 1L
    Snapshots.restore(spark, dir, v1)
    val after = spark.sql("SELECT id, _graft_row_id FROM ridc.db.t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after == ids, "restore must re-install the original bindings")
    // the mark stays monotone: the next insert reuses NO id from the
    // rolled-back generation
    spark.sql("INSERT INTO ridc.db.t SELECT id, id FROM range(50, 55) AS r(id)")
    val next = spark.sql("SELECT _graft_row_id FROM ridc.db.t")
      .collect().map(_.getLong(0))
    assert(next.distinct.length == next.length)
    assert(next.max >= 30L, "post-restore allocation must start past the burned ids")
  }
}
