package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Table constraints (Spark 4 DSv2 `SUPPORT_TABLE_CONSTRAINT`): the
 *  catalog persists CHECK / PRIMARY KEY / UNIQUE through the descriptor,
 *  the table reports them, and STOCK Spark enforces the CHECKs on every
 *  V2 write path and validates existing data on ADD CONSTRAINT. */
class GraftConstraintsSpec extends SparkSpec {

  private lazy val catName: String = {
    val base = Files.createTempDirectory("graft_cons_").toString
    spark.conf.set("spark.sql.catalog.cons", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cons.base", base)
    "cons"
  }

  private def create(name: String, ddlTail: String = "", opts: String = ""): String = {
    spark.sql(s"""CREATE TABLE $catName.db.$name (id BIGINT, cat STRING, v BIGINT$ddlTail)
                 |USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true'$opts)"""
      .stripMargin)
    s"$catName.db.$name"
  }

  private def constraintNames(t: String): Seq[String] = {
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("db"), t)
    val cat = spark.sessionState.catalogManager.catalog(catName)
      .asInstanceOf[GraftCatalog]
    cat.loadTable(ident).constraints().map(_.name).toSeq
  }

  test("CREATE TABLE with an inline CHECK: conforming inserts pass, a " +
      "violating insert fails BEFORE commit and the table is unchanged") {
    val t = create("inline", ddlTail = ", CONSTRAINT v_pos CHECK (v > 0)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 10), (2, 'b', 20)")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $t VALUES (3, 'c', -5)")
    }
    assert(e.getMessage.contains("v_pos") || e.getMessage.contains("CHECK"),
      s"want a CHECK-constraint violation, got: ${e.getMessage}")
    assert(spark.table(t).count() == 2L, "failed insert must not commit rows")
    assert(constraintNames("inline") == Seq("v_pos"))
  }

  test("ALTER TABLE ADD CONSTRAINT validates existing data: clean data " +
      "admits (and then enforces), dirty data refuses and persists nothing") {
    val t = create("addc")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 5), (2, 'b', 6)")
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT v_small CHECK (v < 100)")
    assert(constraintNames("addc") == Seq("v_small"))
    intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (3, 'c', 500)") }
    assert(spark.table(t).count() == 2L)
    // dirty: v = 6 violates v < 6
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD CONSTRAINT v_tiny CHECK (v < 6)")
    }
    assert(e.getMessage.toLowerCase.contains("violate") ||
      e.getMessage.contains("v_tiny"), s"got: ${e.getMessage}")
    assert(constraintNames("addc") == Seq("v_small"),
      "a failed validation must persist nothing")
  }

  test("DROP CONSTRAINT lifts enforcement; dropping a missing constraint " +
      "refuses unless IF EXISTS") {
    val t = create("dropc", ddlTail = ", CONSTRAINT v_pos CHECK (v > 0)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1)")
    intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (2, 'b', -1)") }
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT v_pos")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', -1)") // now admitted
    assert(spark.table(t).count() == 2L)
    assert(constraintNames("dropc").isEmpty)
    intercept[Exception] { spark.sql(s"ALTER TABLE $t DROP CONSTRAINT nope") }
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT IF EXISTS nope") // silent
  }

  test("CHECKs guard the DML rewrites too: a violating UPDATE refuses on " +
      "copy-on-write AND merge-on-read, and MERGE is guarded") {
    for ((mode, name) <- Seq("copy-on-write" -> "dmlcow", "merge-on-read" -> "dmlmor")) {
      val t = create(name, ddlTail = ", CONSTRAINT v_cap CHECK (v <= 50)",
        opts = s", dmlMode '$mode'")
      spark.sql(s"INSERT INTO $t VALUES (1, 'a', 10), (2, 'b', 20)")
      val e = intercept[Exception] {
        spark.sql(s"UPDATE $t SET v = v + 45 WHERE id = 2")
      }
      assert(e.getMessage.contains("v_cap") || e.getMessage.contains("CHECK"),
        s"[$mode] got: ${e.getMessage}")
      assert(spark.table(t).select(sum(col("v"))).head.getLong(0) == 30L,
        s"[$mode] failed UPDATE must not change the table")
      spark.sql(s"UPDATE $t SET v = v + 30 WHERE id = 2") // 50 admits (<=)
      intercept[Exception] {
        spark.sql(s"MERGE INTO $t USING (SELECT 1 AS id, 99 AS nv) s ON $t.id = s.id " +
          s"WHEN MATCHED THEN UPDATE SET v = s.nv")
      }
      assert(spark.table(t).filter(col("id") === 1).head.getLong(2) == 10L)
    }
  }

  test("PRIMARY KEY and UNIQUE persist as informational constraints " +
      "(NOT ENFORCED + RELY round-trips through the descriptor)") {
    val t = create("info")
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT pk_id PRIMARY KEY (id) RELY")
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT uq_cat UNIQUE (cat)")
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "info")
    val cat = spark.sessionState.catalogManager.catalog(catName).asInstanceOf[GraftCatalog]
    val cs = cat.loadTable(ident).constraints()
    val pk = cs.collectFirst {
      case p: org.apache.spark.sql.connector.catalog.constraints.PrimaryKey => p }.get
    assert(!pk.enforced() && pk.rely())
    assert(pk.columns().map(_.fieldNames.mkString).toSeq == Seq("id"))
    val uq = cs.collectFirst {
      case u: org.apache.spark.sql.connector.catalog.constraints.Unique => u }.get
    assert(!uq.enforced())
    assert(uq.columns().map(_.fieldNames.mkString).toSeq == Seq("cat"))
    // informational ≠ enforced: a duplicate id still writes (documented)
    spark.sql(s"INSERT INTO $t VALUES (1, 'x', 1), (1, 'x', 2)")
    assert(spark.table(t).count() == 2L)
  }

  test("schema changes that would orphan a constraint refuse: rename/drop/" +
      "retype of a referenced column names the constraint; unrelated " +
      "columns still evolve and the predicate keeps enforcing") {
    val t = create("guard", ddlTail = ", CONSTRAINT v_pos CHECK (v > 0)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 1)")
    for (ddl <- Seq(
        s"ALTER TABLE $t RENAME COLUMN v TO w",
        s"ALTER TABLE $t DROP COLUMN v",
        s"ALTER TABLE $t ALTER COLUMN v TYPE DECIMAL(20,0)")) {
      val e = intercept[Exception] { spark.sql(ddl) }
      assert(e.getMessage.contains("v_pos"), s"$ddl → ${e.getMessage}")
    }
    // unreferenced column: free to evolve, constraint still live
    spark.sql(s"ALTER TABLE $t RENAME COLUMN cat TO category")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (note STRING)")
    intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (2, 'b', -2, NULL)") }
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', 2, 'ok')")
    assert(spark.table(t).count() == 2L)
    // after DROP CONSTRAINT the rename admits
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT v_pos")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO w")
    assert(spark.table(t).columns.contains("w"))
  }

  test("SQL-standard null semantics: a CHECK evaluating to NULL admits " +
      "the row (violation = definitely false only)") {
    val t = create("nulls", ddlTail = ", CONSTRAINT v_pos CHECK (v > 0)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', NULL)")
    assert(spark.table(t).count() == 1L)
  }

  test("FOREIGN KEY refuses loudly (a file-backed descriptor cannot keep " +
      "a cross-table reference honest)") {
    create("fkt")
    create("fks")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $catName.db.fkt ADD CONSTRAINT fk " +
        s"FOREIGN KEY (id) REFERENCES $catName.db.fks (id)")
    }
    assert(e.getMessage.contains("FOREIGN KEY"), e.getMessage)
  }
}
