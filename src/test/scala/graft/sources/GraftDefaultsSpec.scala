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

  test("ADD COLUMNS with a DEFAULT refuses, naming the two-step path") {
    spark.sql(s"""CREATE TABLE $catName.db.addc (id BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')"""
      .stripMargin)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $catName.db.addc ADD COLUMNS (w BIGINT DEFAULT 3)")
    }
    assert(e.getMessage.contains("SET DEFAULT"), e.getMessage)
    // the blessed two-step: add (nulls for old rows), then default new writes
    spark.sql(s"ALTER TABLE $catName.db.addc ADD COLUMNS (w BIGINT)")
    spark.sql(s"ALTER TABLE $catName.db.addc ALTER COLUMN w SET DEFAULT 3")
    spark.sql(s"INSERT INTO $catName.db.addc (id) VALUES (1)")
    assert(spark.table(s"$catName.db.addc").head.getLong(1) == 3L)
  }
}
