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

  test("DROP COLUMN removes a non-key column; key drops and renames refuse") {
    spark.sql(s"CREATE TABLE $catName.db.dc (id BIGINT, a BIGINT, b STRING) " +
      "USING graft OPTIONS (pk 'id', partitions '2')")
    spark.sql(s"INSERT INTO $catName.db.dc SELECT id, id, 'x' FROM range(1, 21) AS r(id)")
    spark.sql(s"ALTER TABLE $catName.db.dc DROP COLUMN a")
    assert(spark.table(s"$catName.db.dc").columns.toSeq == Seq("id", "b"))
    assert(spark.table(s"$catName.db.dc").count() == 20L)
    intercept[Exception] { spark.sql(s"ALTER TABLE $catName.db.dc DROP COLUMN id") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $catName.db.dc RENAME COLUMN b TO c") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $catName.db.dc ALTER COLUMN b TYPE BIGINT")
    }
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
