package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.write.TokenSortedWriter
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** `_graft_token` as a DSv2 metadata column: hidden from SELECT *,
 *  explicitly selectable, equal to the layout's stored token, null on
 *  token-less layouts. */
class MetadataColumnsSpec extends SparkSpec {
  import spark.implicits._

  test("hidden from star, selectable explicitly, equals graft_token(pk)") {
    val dir = Files.createTempDirectory("graft_meta_").toString + "/t"
    TokenSortedWriter.write((1L to 300L).map(i => (i, i * 2)).toDF("id", "v"),
      CqlSchema("t", Seq("id")), dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 3, keepTokenColumn = true))
    val read = spark.read.format("graft").option("path", dir).option("pk", "id").load()
    assert(read.columns.toSeq == Seq("id", "v"), "metadata column must stay hidden")
    graft.functions.registerAll(spark)
    val checked = read.select(col("id"), col("_graft_token").as("t"))
      .withColumn("expected", expr("graft_token(id)"))
    assert(checked.filter(col("t") =!= col("expected")).count() == 0L)
    assert(checked.count() == 300L)
  }

  test("SQL through the catalog sees the metadata column") {
    val base = Files.createTempDirectory("graft_meta_cat_").toString
    spark.conf.set("spark.sql.catalog.mcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mcat.base", base)
    spark.sql("CREATE TABLE mcat.db.t (id BIGINT, v BIGINT) " +
      "USING graft OPTIONS (pk 'id', partitions '2')")
    spark.sql("INSERT INTO mcat.db.t SELECT id, id FROM range(1, 101) AS r(id)")
    graft.functions.registerAll(spark)
    val bad = spark.sql(
      "SELECT count(*) FROM mcat.db.t WHERE _graft_token <> graft_token(id)")
    assert(bad.head().getLong(0) == 0L)
    assert(spark.sql("SELECT id, _graft_token FROM mcat.db.t").count() == 100L)
  }

  test("token-less layout reads null metadata") {
    val dir = Files.createTempDirectory("graft_meta_null_").toString + "/t"
    TokenSortedWriter.write((1L to 50L).map(i => (i, i)).toDF("id", "v"),
      CqlSchema("t", Seq("id")), dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = false))
    val read = spark.read.format("graft").option("path", dir).option("pk", "id").load()
    val toks = read.select(col("_graft_token")).collect()
    assert(toks.length == 50 && toks.forall(_.isNullAt(0)))
  }
}
