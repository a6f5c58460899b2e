package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column DEFAULT values (`SUPPORT_COLUMN_DEFAULT_VALUE`): declared in
 *  CREATE TABLE or via ALTER COLUMN SET DEFAULT, stored in the schema
 *  JSON's field metadata, filled by stock `ResolveDefaultColumns` when
 *  an INSERT omits the column or writes the DEFAULT keyword. */
class GraftDefaultsSpec extends SparkSpec {

  private lazy val catName: String = {
    val base = Files.createTempDirectory("graft_defs_").toString
    spark.conf.set("spark.sql.catalog.defs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.defs.base", base)
    "defs"
  }

  test("CREATE TABLE with DEFAULT: an INSERT omitting the column and one " +
      "writing the DEFAULT keyword both land the declared value") {
    spark.sql(s"""CREATE TABLE $catName.db.t (id BIGINT, v BIGINT DEFAULT 42,
                 |  tag STRING DEFAULT 'fresh')
                 |USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $catName.db.t (id) VALUES (1)")
    spark.sql(s"INSERT INTO $catName.db.t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql(s"INSERT INTO $catName.db.t VALUES (3, 7, 'explicit')")
    val rows = spark.table(s"$catName.db.t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set((1L, 42L, "fresh"), (2L, 42L, "fresh"), (3L, 7L, "explicit")))
  }

  test("ALTER COLUMN SET DEFAULT applies to future writes only; DROP " +
      "DEFAULT reverts omitted columns to null") {
    spark.sql(s"""CREATE TABLE $catName.db.alt (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $catName.db.alt (id) VALUES (1)") // pre-default: null
    spark.sql(s"ALTER TABLE $catName.db.alt ALTER COLUMN v SET DEFAULT 9")
    spark.sql(s"INSERT INTO $catName.db.alt (id) VALUES (2)")
    // rows already written keep what they stored — no retroactive fill
    val got = spark.table(s"$catName.db.alt")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got == Set((1L, None), (2L, Some(9L))))
    spark.sql(s"ALTER TABLE $catName.db.alt ALTER COLUMN v DROP DEFAULT")
    spark.sql(s"INSERT INTO $catName.db.alt (id) VALUES (3)")
    assert(spark.table(s"$catName.db.alt").filter(col("id") === 3)
      .head.isNullAt(1))
  }

  test("defaults compose with the engine surface: CHECK constraints see " +
      "the filled value, and the descriptor round-trips defaults across " +
      "unrelated schema evolution") {
    spark.sql(s"""CREATE TABLE $catName.db.mix (id BIGINT, v BIGINT DEFAULT 5,
                 |  CONSTRAINT v_pos CHECK (v > 0))
                 |USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $catName.db.mix (id) VALUES (1)") // default 5 passes
    spark.sql(s"ALTER TABLE $catName.db.mix ALTER COLUMN v SET DEFAULT -1")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $catName.db.mix (id) VALUES (2)") // default -1 violates
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    assert(spark.table(s"$catName.db.mix").count() == 1L)
    // unrelated evolution leaves the default in place
    spark.sql(s"ALTER TABLE $catName.db.mix ADD COLUMNS (note STRING)")
    spark.sql(s"ALTER TABLE $catName.db.mix ALTER COLUMN v SET DEFAULT 6")
    spark.sql(s"INSERT INTO $catName.db.mix (id) VALUES (3)")
    assert(spark.table(s"$catName.db.mix").filter(col("id") === 3)
      .head.getLong(1) == 6L)
  }

  test("ADD COLUMNS … DEFAULT: rows already on disk read the exists-default " +
      "per file; stored values (including genuine nulls) are untouched; " +
      "new omitted-column inserts get the current-default") {
    spark.sql(s"""CREATE TABLE $catName.db.addc (id BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')"""
      .stripMargin)
    spark.sql(s"INSERT INTO $catName.db.addc SELECT id FROM range(1, 11) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.addc ADD COLUMNS (" +
      "w BIGINT DEFAULT 3, lang STRING DEFAULT 'und')")
    // pre-add files lack the columns physically → the recorded default
    val old = spark.table(s"$catName.db.addc").filter(col("id") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(old.length == 10 && old.forall(r => r._2 == 3L && r._3 == "und"))
    // post-add: omitted → current-default; explicit NULL stays null
    spark.sql(s"INSERT INTO $catName.db.addc (id) VALUES (20)")
    spark.sql(s"INSERT INTO $catName.db.addc VALUES (21, NULL, 'en'), (22, 9, NULL)")
    val got = spark.table(s"$catName.db.addc").filter(col("id") >= 20)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet
    assert(got == Set(
      (20L, Some(3L), Some("und")),
      (21L, None, Some("en")),
      (22L, Some(9L), None)), s"got $got")
    // filters evaluate against the filled value
    assert(spark.table(s"$catName.db.addc").filter(col("w") === 3L).count() == 11L)
    assert(spark.table(s"$catName.db.addc")
      .filter(col("lang") === "und").count() == 11L)
  }

  test("exists-defaults survive OPTIMIZE (packing materializes the fill) " +
      "and CoW DML (rewrites + CDC preimages read the default)") {
    spark.sql(s"""CREATE TABLE $catName.db.life (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true',
                 |changeFeedCow 'true')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.life SELECT id, id FROM range(1, 9) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.life ADD COLUMNS (tag STRING DEFAULT 'old')")
    spark.sql(s"INSERT INTO $catName.db.life VALUES (100, 100, 'new')")
    spark.sql(s"CALL $catName.system.optimize(table => 'db.life')")
    val packed = spark.table(s"$catName.db.life")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(packed == ((1L to 8L).map(_ -> "old").toSet + (100L -> "new")),
      s"got $packed")
    // CoW UPDATE across the fill: preimages carry the default, postimages
    // the (unchanged) filled value — and the rewrite materializes it
    val base = spark.conf.get(s"spark.sql.catalog.$catName.base")
    val dir = s"$base/db/life"
    val v1 = graft.write.Snapshots.latestVersion(spark, dir).get
    spark.sql(s"UPDATE $catName.db.life SET v = v + 1000 WHERE id % 4 = 2")
    val v2 = graft.write.Snapshots.latestVersion(spark, dir).get
    val ev = graft.write.Snapshots.readChangesWithDeletes(spark, dir, v1, v2)
      .select(col("id"), col("tag"), col(graft.write.Snapshots.ChangeTypeCol))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(ev.nonEmpty && ev.forall(e => e._2 == (if (e._1 == 100L) "new" else "old")),
      s"CDC events lost the exists-default: ${ev.toSeq}")
    assert(spark.table(s"$catName.db.life")
      .filter(col("tag") === "old").count() == 8L)
  }

  test("the change feed fills exists-defaults on pre-add insert events; " +
      "a non-constant ADD COLUMNS DEFAULT refuses") {
    spark.sql(s"""CREATE TABLE $catName.db.feed (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '1', snapshot 'true',
                 |dmlMode 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.feed SELECT id, id FROM range(1, 6) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.feed ADD COLUMNS (q BIGINT DEFAULT 42)")
    spark.sql(s"INSERT INTO $catName.db.feed VALUES (10, 10, 7)")
    spark.sql(s"DELETE FROM $catName.db.feed WHERE v = 3") // MoR DV preimage
    val base = spark.conf.get(s"spark.sql.catalog.$catName.base")
    val dir = s"$base/db/feed"
    val head = graft.write.Snapshots.latestVersion(spark, dir).get
    val ev = graft.write.Snapshots.readChangesWithDeletes(spark, dir, 0L, head)
      .select(col("id"), col("q"), col(graft.write.Snapshots.ChangeTypeCol))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2)))
    // replayed history reads through the CURRENT schema: pre-add inserts
    // and the DV delete preimage all fill 42; the post-add insert keeps 7
    assert(ev.filter(_._1 <= 5L).forall(_._2.contains(42L)), s"got ${ev.toSeq}")
    assert(ev.filter(_._1 == 10L).forall(_._2.contains(7L)))
    assert(ev.count(_._3 == "delete") == 1 &&
      ev.find(_._3 == "delete").get._2.contains(42L))
    // the DSv2 CDC source agrees (scan-side overlay)
    val viaSource = spark.read.format("graft").option("path", dir)
      .option("changeFeedMode", "rows").option("startingVersion", "0").load()
      .select(col("id"), col("q")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(viaSource.filter(_._1 <= 5L).forall(_._2.contains(42L)),
      s"CDC source lost the fill: ${viaSource.toSeq}")

    spark.sql(s"CREATE TABLE $catName.db.nc (id BIGINT) " +
      "USING graft OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $catName.db.nc ADD COLUMNS (r DOUBLE DEFAULT rand())")
    }
    assert(IdentityColumnsSpec.chain(e).exists(t => Option(t.getMessage).exists(m =>
      m.contains("constant") || m.contains("DEFAULT"))), s"got $e")
  }

  test("mixed-generation exists-default reads infer from cached driver " +
      "footer reads: ZERO Spark inference jobs, values identical to the " +
      "distributed mergeSchema path") {
    spark.sql(s"""CREATE TABLE $catName.db.gen (id BIGINT, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '1',
                 |snapshot 'true')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.gen SELECT id, id FROM range(1, 6) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.gen ADD COLUMNS (q BIGINT DEFAULT 42)")
    spark.sql(s"INSERT INTO $catName.db.gen VALUES (10, 10, 7)")
    spark.sql(s"INSERT INTO $catName.db.gen VALUES (11, 11, 8)")
    val base = spark.conf.get(s"spark.sql.catalog.$catName.base")
    val dir = s"$base/db/gen"
    val files = graft.sources.TokenPruner.listFiles(spark, dir).map(_.path).toSeq
    assert(files.length >= 3, "fixture needs a mixed-generation set")
    val defaults = ExistsDefaults.physicalForDir(spark, dir)
    assert(defaults.nonEmpty)
    val expect = ((1L to 5L).map(i => (i, 42L)) ++ Seq((10L, 7L), (11L, 8L))).toSet

    // warm the path cache, then count jobs across REPLAYED reads: schema
    // inference must not launch a single Spark job per event
    ExistsDefaults.read(spark, defaults, files)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val frames = (1 to 5).map(_ => ExistsDefaults.read(spark, defaults, files))
      // listener delivery is async; a job START would enqueue promptly —
      // give the bus a beat before asserting none arrived
      Thread.sleep(500)
      assert(jobs.get() == 0,
        s"schema inference launched ${jobs.get()} Spark job(s) over 5 replays")
      // and the values are exactly the mergeSchema semantics
      assert(frames.head.select("id", "q").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
