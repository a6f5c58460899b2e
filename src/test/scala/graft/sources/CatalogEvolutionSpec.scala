package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.write.TokenSortedWriter
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** SQL schema evolution (ALTER TABLE ADD/DROP COLUMN) and external
 *  LOCATION tables through GraftCatalog. */
class CatalogEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catName: String = {
    val base = Files.createTempDirectory("graft_evo_").toString
    spark.conf.set("spark.sql.catalog.evo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evo.base", base)
    "evo"
  }

  test("ADD COLUMNS: old rows read null, new inserts carry values") {
    spark.sql(s"CREATE TABLE $catName.db.ev (id BIGINT, v BIGINT) " +
      "USING graft OPTIONS (pk 'id', partitions '2')")
    spark.sql(s"INSERT INTO $catName.db.ev SELECT id, id FROM range(1, 51) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.ev ADD COLUMNS (tag STRING)")
    spark.sql(s"INSERT INTO $catName.db.ev " +
      "SELECT id, id, concat('t', id) FROM range(51, 101) AS r(id)")
    val t = spark.table(s"$catName.db.ev")
    assert(t.columns.toSeq == Seq("id", "v", "tag"))
    assert(t.filter(col("id") <= 50 && col("tag").isNotNull).count() == 0L)
    assert(t.filter(col("id") > 50 && col("tag").isNull).count() == 0L)
    assert(t.count() == 100L)
  }

  test("DROP COLUMN removes a non-key column; key drops/renames and type changes refuse") {
    spark.sql(s"CREATE TABLE $catName.db.dc (id BIGINT, a BIGINT, b STRING) " +
      "USING graft OPTIONS (pk 'id', partitions '2')")
    spark.sql(s"INSERT INTO $catName.db.dc SELECT id, id, 'x' FROM range(1, 21) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.dc DROP COLUMN a")
    assert(spark.table(s"$catName.db.dc").columns.toSeq == Seq("id", "b"))
    assert(spark.table(s"$catName.db.dc").count() == 20L)
    intercept[Exception] { spark.sql(s"ALTER TABLE $catName.db.dc DROP COLUMN id") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $catName.db.dc RENAME COLUMN id TO id2") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $catName.db.dc ALTER COLUMN b TYPE BIGINT")
    }
  }

  test("RENAME COLUMN: metadata-only — old data stays connected, filters and " +
      "writes translate, the physical name never moves") {
    spark.sql(s"CREATE TABLE $catName.db.rn (id BIGINT, v BIGINT, s STRING) " +
      "USING graft OPTIONS (pk 'id', partitions '2')")
    spark.sql(s"INSERT INTO $catName.db.rn SELECT id, id * 10, concat('s', id) " +
      "FROM range(1, 51) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.rn RENAME COLUMN v TO val")
    val t = spark.table(s"$catName.db.rn")
    assert(t.columns.toSeq == Seq("id", "val", "s"))
    // pre-rename data reads through the new logical name
    assert(t.filter(col("id") === 7L).select(col("val")).head().getLong(0) == 70L)
    // filters on the renamed column (translated pushdown) stay correct
    assert(t.filter(col("val") === 300L).select(col("id")).head().getLong(0) == 30L)
    // writes after the rename land under the STABLE physical name and read back
    spark.sql(s"INSERT INTO $catName.db.rn VALUES (1000, 9999, 'new')")
    val t2 = spark.table(s"$catName.db.rn")
    assert(t2.count() == 51L)
    assert(t2.filter(col("id") === 1000L).select(col("val")).head().getLong(0) == 9999L)
    // old AND new generations agree on the logical column
    assert(t2.agg(sum(col("val"))).head().getLong(0) ==
      (1L to 50L).map(_ * 10).sum + 9999L)
    // chained rename keeps the chain connected
    spark.sql(s"ALTER TABLE $catName.db.rn RENAME COLUMN val TO value")
    assert(spark.table(s"$catName.db.rn")
      .filter(col("value") === 70L).count() == 1L)
    // the files still store the ORIGINAL physical name
    val dir = spark.conf.get(s"spark.sql.catalog.$catName.base") + "/db/rn"
    val raw = spark.read.parquet(TokenPruner.listFiles(spark, dir).map(_.path): _*)
    assert(raw.columns.contains("v") && !raw.columns.contains("value"),
      s"physical name must never move, got ${raw.columns.mkString(",")}")
  }

  test("SQL DML on a renamed table: predicates and assignments translate " +
      "through the mapping (copy-on-write and merge-on-read)") {
    // copy-on-write
    spark.sql(s"CREATE TABLE $catName.db.dmlrn (id BIGINT, v BIGINT) " +
      "USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.dmlrn SELECT id, id * 10 FROM range(1, 41) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.dmlrn RENAME COLUMN v TO val")
    spark.sql(s"UPDATE $catName.db.dmlrn SET val = val + 5 WHERE val >= 300")
    spark.sql(s"DELETE FROM $catName.db.dmlrn WHERE val = 100")
    val got = spark.table(s"$catName.db.dmlrn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 39 && !got.contains(10L)) // val 100 = id 10 (update hit only >= 300)
    assert(got(30L) == 305L && got(29L) == 290L)
    // the physical name is still the original in every generation
    val dir = spark.conf.get(s"spark.sql.catalog.$catName.base") + "/db/dmlrn"
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(graft.write.Snapshots.files(spark, dir,
        graft.write.Snapshots.latestVersion(spark, dir).get): _*)
    assert(raw.columns.contains("v") && !raw.columns.contains("val"))

    // merge-on-read: deletes become DVs, re-inserts land under the
    // physical name, reads translate back
    spark.sql(s"CREATE TABLE $catName.db.dmlrn2 (id BIGINT, v BIGINT) " +
      "USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true', " +
      "dmlMode 'merge-on-read')")
    spark.sql(s"INSERT INTO $catName.db.dmlrn2 SELECT id, id * 10 FROM range(1, 41) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.dmlrn2 RENAME COLUMN v TO val")
    val dir2 = spark.conf.get(s"spark.sql.catalog.$catName.base") + "/db/dmlrn2"
    val before = graft.write.Snapshots.files(spark, dir2,
      graft.write.Snapshots.latestVersion(spark, dir2).get).toSet
    spark.sql(s"UPDATE $catName.db.dmlrn2 SET val = 1 WHERE val = 200")
    spark.sql(s"DELETE FROM $catName.db.dmlrn2 WHERE val = 300")
    val head2 = graft.write.Snapshots.latestVersion(spark, dir2).get
    assert(before.subsetOf(graft.write.Snapshots.files(spark, dir2, head2).toSet),
      "merge-on-read DML must keep base files on a renamed table too")
    assert(graft.write.Snapshots.deletionVectors(spark, dir2, head2).nonEmpty)
    val got2 = spark.table(s"$catName.db.dmlrn2").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2.size == 39 && !got2.contains(30L))
    assert(got2(20L) == 1L && got2(19L) == 190L)
  }

  test("rename CYCLE (column swap): writes rename simultaneously — a " +
      "sequential fold would collide on the {a->b, b->a} mapping") {
    spark.sql(s"CREATE TABLE $catName.db.swp (id BIGINT, a BIGINT, b BIGINT) " +
      "USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.swp SELECT id, id * 2, id * 3 FROM range(1, 21) AS r(id)")
    // the legal three-step swap: colmap ends as {a -> b, b -> a}
    spark.sql(s"ALTER TABLE $catName.db.swp RENAME COLUMN a TO tmp")
    spark.sql(s"ALTER TABLE $catName.db.swp RENAME COLUMN b TO a")
    spark.sql(s"ALTER TABLE $catName.db.swp RENAME COLUMN tmp TO b")
    // fields keep their physical ORDER; renames move names only — the
    // logical schema after the swap reads (id, b, a)
    assert(spark.table(s"$catName.db.swp").columns.toSeq == Seq("id", "b", "a"))
    val t1 = spark.table(s"$catName.db.swp").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("a"), r.getAs[Long]("b")))).toMap
    assert(t1(4L) == ((12L, 8L)), "logical a/b must read the swapped physicals")
    // a WRITE through the swapped mapping: the V1 sink renames the frame
    // before writing — simultaneous, or the intermediate duplicate column
    // poisons the insert
    spark.sql(s"INSERT INTO $catName.db.swp (id, a, b) VALUES (100, 5, 7)")
    // and a CoW UPDATE stages its rewrite through the same rename path
    spark.sql(s"UPDATE $catName.db.swp SET a = a + 1000 WHERE id = 100")
    val t2 = spark.table(s"$catName.db.swp").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("a"), r.getAs[Long]("b")))).toMap
    assert(t2(100L) == ((1005L, 7L)))
    assert(t2(4L) == ((12L, 8L)), "pre-swap generations stay connected")
    assert(t2.size == 21)
  }

  test("re-ADD of a dropped name gets a fresh physical name: old bytes never resurrect") {
    spark.sql(s"CREATE TABLE $catName.db.ra (id BIGINT, g BIGINT) " +
      "USING graft OPTIONS (pk 'id', partitions '2')")
    spark.sql(s"INSERT INTO $catName.db.ra SELECT id, id * 100 FROM range(1, 21) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.ra DROP COLUMN g")
    spark.sql(s"ALTER TABLE $catName.db.ra ADD COLUMNS (g BIGINT)")
    val t = spark.table(s"$catName.db.ra")
    // the 20 old rows must read NULL — not the dropped generation's values
    assert(t.filter(col("g").isNotNull).count() == 0L,
      "dropped bytes resurrected through a re-added name")
    spark.sql(s"INSERT INTO $catName.db.ra VALUES (100, 7)")
    assert(spark.table(s"$catName.db.ra")
      .filter(col("g").isNotNull).count() == 1L)
    // rename-after-readd keeps the severing intact
    spark.sql(s"ALTER TABLE $catName.db.ra RENAME COLUMN g TO h")
    val t2 = spark.table(s"$catName.db.ra")
    assert(t2.filter(col("h").isNotNull).count() == 1L)
    assert(t2.filter(col("h") === 7L).select(col("id")).head().getLong(0) == 100L)
  }

  test("ALTER COLUMN TYPE: value-preserving widenings are metadata-only; " +
      "narrowings, key columns and lossy changes refuse") {
    spark.sql(s"CREATE TABLE $catName.db.wd (id BIGINT, n INT, f FLOAT, d DATE) " +
      "USING graft OPTIONS (pk 'id', partitions '2')")
    spark.sql(s"INSERT INTO $catName.db.wd SELECT id, CAST(id AS INT), " +
      "CAST(id AS FLOAT) / 2, DATE'2020-01-01' FROM range(1, 31) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.wd ALTER COLUMN n TYPE BIGINT")
    spark.sql(s"ALTER TABLE $catName.db.wd ALTER COLUMN f TYPE DOUBLE")
    // old (narrow-stored) generation reads through the widened schema
    val t = spark.table(s"$catName.db.wd")
    assert(t.schema("n").dataType == org.apache.spark.sql.types.LongType)
    assert(t.schema("f").dataType == org.apache.spark.sql.types.DoubleType)
    assert(t.agg(sum(col("n"))).head().getLong(0) == (1L to 30L).sum)
    assert(t.filter(col("f") === 7.5d).select(col("id")).head().getLong(0) == 15L)
    // new generation writes wide; both read back together
    spark.sql(s"INSERT INTO $catName.db.wd VALUES (100, 5000000000, 1.25, DATE'2021-01-01')")
    val t2 = spark.table(s"$catName.db.wd")
    assert(t2.count() == 31L)
    assert(t2.filter(col("n") === 5000000000L).count() == 1L)
    // int→decimal(p,0) widening reads exactly
    spark.sql(s"CREATE TABLE $catName.db.wd2 (id BIGINT, n INT) " +
      "USING graft OPTIONS (pk 'id')")
    spark.sql(s"INSERT INTO $catName.db.wd2 VALUES (1, 123456789)")
    spark.sql(s"ALTER TABLE $catName.db.wd2 ALTER COLUMN n TYPE DECIMAL(12,0)")
    assert(spark.table(s"$catName.db.wd2").head().getDecimal(1).longValueExact == 123456789L)
    // refusals: narrowing, lossy, key column, undersized decimal
    intercept[Exception] { spark.sql(s"ALTER TABLE $catName.db.wd ALTER COLUMN n TYPE INT") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $catName.db.wd ALTER COLUMN f TYPE BIGINT") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $catName.db.wd ALTER COLUMN id TYPE DECIMAL(20,0)") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $catName.db.wd2 ALTER COLUMN n TYPE DECIMAL(8,0)") }
  }

  test("INSERT OVERWRITE: atomic logical overwrite on logged tables, refused log-less") {
    spark.sql(s"CREATE TABLE $catName.db.ow (id BIGINT, v BIGINT) " +
      "USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.ow SELECT id, id FROM range(1, 101) AS r(id)")
    val dir = spark.conf.get(s"spark.sql.catalog.$catName.base") + "/db/ow"
    val v0 = graft.write.Snapshots.latestVersion(spark, dir).get
    spark.sql(s"INSERT OVERWRITE $catName.db.ow SELECT id, -id FROM range(1, 11) AS r(id)")
    val t = spark.table(s"$catName.db.ow")
    assert(t.count() == 10L && t.agg(max(col("v"))).head().getLong(0) == -1L)
    // one commit; the pre-overwrite state is still pinnable
    assert(graft.write.Snapshots.latestVersion(spark, dir).contains(v0 + 1))
    val pinned = spark.read.format("graft").option("path", dir)
      .option("pk", "id").option("snapshotVersion", v0.toString).load()
    assert(pinned.count() == 100L)
    // log-less: Overwrite stays refused (reference sink parity)
    spark.sql(s"CREATE TABLE $catName.db.ow2 (id BIGINT, v BIGINT) " +
      "USING graft OPTIONS (pk 'id')")
    spark.sql(s"INSERT INTO $catName.db.ow2 VALUES (1, 1)")
    intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE $catName.db.ow2 VALUES (2, 2)")
    }
    assert(spark.table(s"$catName.db.ow2").count() == 1L)
  }

  test("CTAS: CREATE TABLE AS SELECT lands token-sorted through the catalog") {
    spark.sql(s"""CREATE TABLE $catName.db.ctas USING graft OPTIONS (pk 'id')
                 |AS SELECT id, id * 7 AS v FROM range(1, 201) AS r(id)""".stripMargin)
    val t = spark.table(s"$catName.db.ctas")
    assert(t.count() == 200L)
    assert(t.filter(col("id") === 3L).head().getLong(1) == 21L)
    val dir = spark.conf.get(s"spark.sql.catalog.$catName.base") + "/db/ctas"
    val files = TokenPruner.listFiles(spark, dir)
    assert(files.nonEmpty && files.forall(_.tokenRange.isDefined),
      "CTAS output must carry the token layout")
  }

  test("REPLACE TABLE swaps schema+content; CREATE OR REPLACE … AS SELECT " +
      "lands (overwriting a freshly-created EMPTY table is an append); " +
      "the physical-overwrite rejection still guards non-empty dirs") {
    spark.sql(s"CREATE TABLE $catName.db.rp (id BIGINT, v BIGINT) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    spark.sql(s"INSERT INTO $catName.db.rp VALUES (1, 10), (2, 20)")
    spark.sql(s"REPLACE TABLE $catName.db.rp (id BIGINT, w STRING) USING graft " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    assert(spark.table(s"$catName.db.rp").schema.fieldNames.toSeq == Seq("id", "w"))
    assert(spark.table(s"$catName.db.rp").count() == 0L)
    spark.sql(s"INSERT INTO $catName.db.rp VALUES (5, 'five')")
    assert(spark.table(s"$catName.db.rp").count() == 1L)

    spark.sql(s"""CREATE OR REPLACE TABLE $catName.db.rtas USING graft
                 |OPTIONS (pk 'id', partitions '2', snapshot 'true')
                 |AS SELECT id, id * 3 AS n FROM range(1, 11) AS r(id)""".stripMargin)
    assert(spark.table(s"$catName.db.rtas").count() == 10L)
    // replace-in-place: the second RTAS swaps content wholesale
    spark.sql(s"""CREATE OR REPLACE TABLE $catName.db.rtas USING graft
                 |OPTIONS (pk 'id', partitions '2', snapshot 'true')
                 |AS SELECT id, id AS n FROM range(1, 4) AS r(id)""".stripMargin)
    assert(spark.table(s"$catName.db.rtas")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (2L, 2L), (3L, 3L)))
    // a NON-empty log-less dir still refuses a physical overwrite
    val dir = java.nio.file.Files.createTempDirectory("graft_owrj_").toString + "/t"
    import spark.implicits._
    Seq((1L, 1L)).toDF("id", "v").write.format("graft")
      .option("pk", "id").mode("append").save(dir)
    val e = intercept[Exception] {
      Seq((2L, 2L)).toDF("id", "v").write.format("graft")
        .option("pk", "id").mode("overwrite").save(dir)
    }
    assert(e.getMessage.contains("allowOverwrite"), e.getMessage)
    // the empty→append relaxation holds its guard INSIDE the commit: a
    // version landing after the emptiness probe refuses instead of
    // silently unioning two "overwrites of nothing"
    val dir2 = java.nio.file.Files.createTempDirectory("graft_owee_").toString + "/t"
    graft.write.Snapshots.commitAppend(spark, dir2, Nil)
    val e2 = intercept[graft.write.Snapshots.ConcurrentCommitException] {
      graft.write.TokenSortedWriter.write(
        Seq((1L, 1L)).toDF("id", "v"), graft.model.CqlSchema("t", Seq("id")),
        dir2, org.apache.spark.sql.SaveMode.Append,
        graft.write.TokenSortedWriter.WriteConf(
          numPartitions = 1, snapshot = true, expectEmptyLog = true))
    }
    assert(e2.getMessage.contains("EMPTY log"), e2.getMessage)
  }

  test("SQL namespace DDL: CREATE/SHOW/DROP NAMESPACE over catalog dirs") {
    spark.sql(s"CREATE NAMESPACE $catName.marts")
    val shown = spark.sql(s"SHOW NAMESPACES IN $catName")
      .collect().map(_.getString(0)).toSet
    assert(shown.contains("marts"), s"got $shown")
    spark.sql(s"CREATE TABLE $catName.marts.t1 (id BIGINT, v BIGINT) " +
      "USING graft OPTIONS (pk 'id')")
    spark.sql(s"INSERT INTO $catName.marts.t1 VALUES (1, 10)")
    assert(spark.table(s"$catName.marts.t1").count() == 1L)
    // non-empty namespace refuses a plain drop, cascade removes it
    intercept[Exception] { spark.sql(s"DROP NAMESPACE $catName.marts") }
    spark.sql(s"DROP NAMESPACE $catName.marts CASCADE")
    assert(!spark.sql(s"SHOW NAMESPACES IN $catName")
      .collect().map(_.getString(0)).contains("marts"))
  }

  test("external LOCATION: register an existing graft dir; DROP keeps data") {
    val dataDir = Files.createTempDirectory("graft_ext_").toString + "/t"
    TokenSortedWriter.write((1L to 100L).map(i => (i, i * 5)).toDF("id", "v"),
      CqlSchema("t", Seq("id")), dataDir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2))
    spark.sql(s"CREATE TABLE $catName.db.ext (id BIGINT, v BIGINT) " +
      s"USING graft LOCATION '$dataDir' OPTIONS (pk 'id', partitions '2')")
    assert(spark.sql(s"SELECT sum(v) FROM $catName.db.ext").head().getLong(0) ==
      (1L to 100L).map(_ * 5).sum)
    // INSERT lands at the external location
    spark.sql(s"INSERT INTO $catName.db.ext VALUES (1000, 1)")
    assert(spark.table(s"$catName.db.ext").count() == 101L)
    // DROP removes the catalog entry, never the external data
    spark.sql(s"DROP TABLE $catName.db.ext")
    val still = spark.read.format("graft").option("path", dataDir)
      .option("pk", "id").load()
    assert(still.count() == 101L, "external data must survive DROP TABLE")
  }
}
